package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-partition both fact tables on the join key at
  * write time so the fact–fact join needs NO shuffle exchange — the
  * co-location technique for repeated large joins (the 100 TB
  * answer to "this join shuffles both sides every day").
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    t.lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    t.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    // disable broadcast so the join would otherwise shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      // structured assertion on the FINAL adaptive plan: the
      // SortMergeJoin subtree must contain no shuffle exchange
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val finalPlan = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan // final stages only
        case p => p
      }).toString
      // (QueryStageExec nodes are leaves, so a typed collect cannot
      // see inside them — assert on the final-plan tree text, whose
      // join inputs print below the SortMergeJoin line)
      val idx = finalPlan.indexOf("SortMergeJoin")
      assert(idx >= 0, s"expected SortMergeJoin:\n$finalPlan")
      val belowJoin = finalPlan.substring(idx)
      assert(!belowJoin.contains("Exchange hashpartitioning(l_orderkey") &&
        !belowJoin.contains("Exchange hashpartitioning(o_orderkey"),
        s"join inputs shuffled:\n$finalPlan")

      // and the result matches the unbucketed join
      val expected = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
