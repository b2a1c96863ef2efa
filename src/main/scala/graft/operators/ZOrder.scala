package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) encoding for multi-dimensional data layout —
  * the clustering key behind zone-map / data-skipping indexes
  * (Delta/Iceberg OPTIMIZE ZORDER, the classic Orenstein-Merrett
  * curve). Interleaving the bits of two sort dimensions makes rows
  * that are close in EITHER dimension land in the same file, so
  * per-file min/max stats prune scans on both columns — at 100 TB
  * the difference between reading every file for a selective
  * two-column predicate and reading a handful.
  *
  * The bit-spread is the standard mask cascade (Morton codes via
  * "Bit Twiddling Hacks"-style magic masks): five shift-and-mask
  * steps per dimension, all builtin integral expressions → stays
  * inside whole-stage codegen, and — deliberately — is expressible
  * verbatim in any engine with `<<`/`&`/`|`, which is what lets the
  * DuckDB oracle replay it bit for bit.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even bit positions (0,2,…,30). */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FFL))
    val c = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x33333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of the low 16 bits of (x, y): x on even
    * bits, y on odd.
    */
  def morton16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))
}
