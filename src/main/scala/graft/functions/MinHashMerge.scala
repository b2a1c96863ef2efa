package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` merging MinHash signatures element-wise-min —
  * the signature of a UNION of shingle sets is the element-wise min
  * of the members' signatures, so grouping documents and merging
  * signatures yields a near-dup sketch of whole groups (sources,
  * shards, crawls) without ever materializing their union.
  *
  * Mergeable sketches are what make group-level dedup feasible at
  * 100 TB: the shuffle carries k longs per group per partition,
  * combining map-side like any partial aggregate.
  */
class MinHashMerge(numPerm: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numPerm)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    // fail fast on a numPerm mismatch — silently tolerating a short
    // signature would leave MaxValue tail components that estimate()
    // counts as agreements
    require(sig.length == buf.length,
      s"signature length ${sig.length} != numPerm ${buf.length}")
    var i = 0
    while (i < buf.length) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashMerge {
  /** Estimated Jaccard between two groups from merged signatures:
    * fraction of agreeing components.
    */
  def estimate(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
}
