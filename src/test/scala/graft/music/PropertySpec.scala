package graft.music

import graft.TestSpark
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5): generated stream/song
  * tables of arbitrary shape must preserve the KPI dataflow's
  * cardinality contracts. Uses scalacheck generators sampled from
  * fixed seeds (the scalatest bridge artifact isn't available in
  * the offline cache).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator failed for seed $seed"))

  private val genreGen = Gen.oneOf("rock", "jazz", "pop", "77", "3.5")
  private val songsGen = Gen.listOfN(25,
    for {
      id <- Gen.choose(1, 12)
      g <- genreGen
    } yield (s"t$id", s"Song$id", g))
  private val streamsGen = Gen.listOfN(60,
    for {
      u <- Gen.choose(1, 8)
      t <- Gen.choose(1, 15) // some ids miss the songs table
      h <- Gen.choose(0, 23); m <- Gen.choose(0, 59)
      day <- Gen.oneOf("2024-06-25", "2024-06-26", "2024-06-27")
    } yield (s"u$u", s"t$t", f"$day $h%02d:$m%02d:00"))

  test("KPI invariants hold for arbitrary inputs") {
    import spark.implicits._
    for (seed <- 1L to 8L) {
      val songs = sample(songsGen, seed)
      val streams = sample(streamsGen, seed + 1000)
      val songsDf = songs.toDF("track_id", "track_name", "track_genre")
      val streamsDf = streams.toDF("user_id", "track_id", "listen_time")
      val kpi = MusicKpi(deterministic = true)
      val e = kpi.enriched(streamsDf, songsDf).cache()
      try {
        val enrichedCount = e.count()
        val kpis = kpi.genreKpis(e).collect()
        val sc = kpi.songCounts(e).cache()
        try {
          // Σ listen_count over genres == enriched stream count
          assert(kpis.map(_.getAs[Long]("listen_count")).sum == enrichedCount)
          // parity: unique_listeners == listen_count on every row
          assert(kpis.forall(r =>
            r.getAs[Long]("unique_listeners") == r.getAs[Long]("listen_count")))
          // dedup makes the join many-to-one: enriched ≤ cleaned streams
          assert(enrichedCount <= kpi.cleanStreams(streamsDf).count())
          // no numeric genre survives the filter
          assert(!kpis.exists(_.getAs[String]("track_genre").matches("^[0-9]+(\\.[0-9]+)?$")))
          // top-k bounds per partition
          val ts = kpi.topSongs(sc).collect()
          assert(ts.groupBy(r => (r.getAs[String]("date"), r.getAs[String]("track_genre")))
            .forall(_._2.length <= 3))
          val tg = kpi.topGenres(sc).collect()
          assert(tg.groupBy(_.getAs[String]("date")).forall(_._2.length <= 5))
          // ranks are 1..n dense within a partition
          assert(ts.groupBy(r => (r.getAs[String]("date"), r.getAs[String]("track_genre")))
            .forall { case (_, rs) =>
              rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length) })
        } finally sc.unpersist()
      } finally e.unpersist()
    }
  }
}
