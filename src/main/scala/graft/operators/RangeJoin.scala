package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join (point-in-interval): pair each point with every
  * interval of the same key that contains it.
  *
  * Spark plans a raw inequality join as a broadcast-nested-loop —
  * quadratic work. This implementation buckets time into
  * `bucketSeconds`-wide bins and turns the range predicate into an
  * equi-join on (key, bucket): each interval explodes into the
  * buckets it overlaps (≤ ceil(len/bucket)+1 rows), each point lands
  * in exactly one bucket, and the exact containment filter runs only
  * on same-bucket candidates. Pick `bucketSeconds` ≈ the typical
  * interval length: the explode factor stays ~2 and the equi-join
  * shuffles hash-partitioned like any other join — the 100 TB shape.
  */
object RangeJoin {

  /** `points` with `pointTs`; `intervals` with `[startTs, endTs)`.
    * Inner join semantics: points with no covering interval drop.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointKey: Column,
      pointTs: Column,
      intervalKey: Column,
      startTs: Column,
      endTs: Column,
      bucketSeconds: Long): DataFrame = {

    // bucket arithmetic in microseconds: unix_timestamp() truncates
    // to seconds, which loses the final partial bucket of an
    // interval whose end carries a sub-second fraction
    val bucketMicros = bucketSeconds * 1000000L
    val p = points
      .withColumn("__k", pointKey)
      .withColumn("__pt", pointTs)
      .withColumn("__bucket", floor(unix_micros(pointTs) / bucketMicros))

    val iv = intervals
      .withColumn("__k", intervalKey)
      .withColumn("__s", startTs)
      .withColumn("__e", endTs)
      // guard degenerate intervals: sequence(a, b) DESCENDS when
      // a > b, so one inverted row would explode into the whole
      // reversed bucket range
      .filter(endTs > startTs)
      .withColumn("__bucket", explode(sequence(
        floor(unix_micros(startTs) / bucketMicros),
        floor((unix_micros(endTs) - 1) / bucketMicros))))

    // caller must pre-rename colliding column names between sides
    p.join(iv, Seq("__k", "__bucket"))
      .filter(col("__pt") >= col("__s") && col("__pt") < col("__e"))
      .drop("__k", "__bucket", "__pt", "__s", "__e")
  }
}
