package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** A/B the q119/q92 emission stages: interpreted HOF lambdas vs the
  * native expressions. Usage: runMain graft.tools.ProfileSpans [sfDir] [cpus]
  */
object ProfileSpans {
  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[spans] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = GraftSession.local(cpus, "profile-spans")
    val W = 20
    val tokens = split(col("text"), " ")
    val base = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"), tokens.as("toks"))
      .filter(size(col("toks")) >= W)
      .repartition(cpus).localCheckpoint()
    println(s"[spans] docs=${base.count()}")
    def oldSpans = base.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("toks")) - (W - 1)),
        i => md5(concat_ws(" ", slice(col("toks"), i, lit(W)))))).as("g"))
    def newSpans = base.select(col("doc_id"),
      explode(GraftColumnBridge.column(
        graft.functions.expressions.ShingleHashes64(
          GraftColumnBridge.expression(col("text")), W, distinct = false)))
        .as("g"))
    def oldBg = base.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", element_at(col("toks"), i),
          element_at(col("toks"), i + 1)))).as("bigram"))
    def newBg = base.select(col("doc_id"),
      explode(GraftColumnBridge.column(
        graft.functions.expressions.AdjacentPairs(
          GraftColumnBridge.expression(col("toks"))))).as("bigram"))
    (1 to 3).foreach { _ =>
      timed("spans old (transform+md5)")(noop(oldSpans))
      timed("spans new (ShingleHashes64)")(noop(newSpans))
      timed("spans old grouped")(noop(oldSpans.groupBy("g").count()))
      timed("spans new grouped")(noop(newSpans.groupBy("g").count()))
      timed("bigrams old (transform)")(noop(oldBg))
      timed("bigrams new (AdjacentPairs)")(noop(newBg))
    }
    spark.stop()
  }
}
