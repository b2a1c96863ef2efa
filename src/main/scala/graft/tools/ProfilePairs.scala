package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B the q312 pair-emission stage: interpreted nested-transform
  * lambdas vs the native PackedPairs64 expression.
  * Usage: runMain graft.tools.ProfilePairs [sfDir] [cpus]
  */
object ProfilePairs {
  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[pairs] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = GraftSession.local(cpus, "profile-pairs")
    val sets = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey").as("bk"), col("l_partkey").as("part"))
      .repartition(col("bk"))
      .groupBy(col("bk"))
      .agg(sort_array(collect_set(col("part"))).as("ws"))
      .localCheckpoint()
    println(s"[pairs] baskets=${sets.count()}")
    def oldPairs = sets.select(explode(expr(
        "flatten(transform(ws, (x, i) -> " +
          "transform(slice(ws, i + 2, size(ws)), y -> " +
          "struct(x AS pa, y AS pb))))")).as("e"))
      .groupBy(shiftleft(col("e.pa"), 32).plus(col("e.pb")).as("pair"))
      .agg(count(lit(1)).as("n_co"))
    def newPairs = sets.select(explode(org.apache.spark.sql.GraftColumnBridge
        .column(graft.functions.expressions.PackedPairs64(
          org.apache.spark.sql.GraftColumnBridge.expression(col("ws")))))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_co"))
    (1 to 3).foreach { _ =>
      timed("old (nested transform)")(noop(oldPairs))
      timed("new (PackedPairs64)")(noop(newPairs))
    }
    spark.stop()
  }
}
