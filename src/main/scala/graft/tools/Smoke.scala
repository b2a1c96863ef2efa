package graft.tools

import graft.GraftSession

/** Dev-only smoke: verifies the testdata parquet (incl. nanosecond
  * timestamps) reads cleanly under this Spark build.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "smoke")
    val ev = graft.Tables(spark, "/root/testdata/sf0.001").events
    ev.printSchema()
    ev.show(3, truncate = false)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.printSchema()
    println("events=" + ev.count() + " lineitem=" + li.count())
    spark.stop()
  }
}
