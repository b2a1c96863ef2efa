package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-bit perceptual difference-hash (dHash) over a `binary` media
  * payload — the image-dedup fingerprint (Krawetz's dHash: resize to
  * a 9×8 grayscale grid, set bit (r,c) when the cell right of (r,c)
  * is brighter). Perceptually-close media differ in FEW gradient
  * signs, so near-dups land within a small Hamming distance — the
  * property byte digests (q32) and token shingles (q35) cannot give
  * an image corpus, where a re-encode changes every byte.
  *
  * The DECODE step is stubbed, as everywhere in [[graft.operators.Multimodal]]
  * (this container has no image codecs): "brightness" of grid cell i
  * is the byte sum of the payload's i-th contiguous stripe —
  * `[i·n/72, (i+1)·n/72)` — a pure deterministic function of the
  * bytes. Everything downstream of the decode is the REAL dHash:
  * 8 rows × 9 cells, bit (r,c) = cell(r,c+1) > cell(r,c), 64 bits
  * packed row-major. A real decoder swaps the stripe sums for pixel
  * averages; the gradient hash, the Hamming banding and the verify
  * join do not change.
  *
  * Locality: a byte edit perturbs only the stripe it lands in, and
  * a changed stripe flips at most its two adjacent gradient bits —
  * small edits ⇒ small Hamming distance (PerceptualDedupSpec pins
  * planted single-byte twins at distance ≤ 2). Payloads shorter
  * than 72 bytes leave trailing stripes empty (sum 0); an empty
  * payload hashes to 0; null payload → null.
  */
case class DHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "dhash64"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length
    val cells = new Array[Long](72)
    var i = 0
    while (i < 72) {
      val from = (i.toLong * n / 72).toInt
      val to = ((i + 1).toLong * n / 72).toInt
      var s = 0L
      var j = from
      while (j < to) { s += (bytes(j) & 0xff); j += 1 }
      cells(i) = s
      i += 1
    }
    var fp = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r * 9 + c + 1) > cells(r * 9 + c)) fp |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val n = ctx.freshName("n")
      val cells = ctx.freshName("cells")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val from = ctx.freshName("from")
      val to = ctx.freshName("to")
      val s = ctx.freshName("s")
      val fp = ctx.freshName("fp")
      val r = ctx.freshName("r")
      val c = ctx.freshName("c")
      s"""
        int $n = $b.length;
        long[] $cells = new long[72];
        for (int $i = 0; $i < 72; $i++) {
          int $from = (int) ((long) $i * $n / 72);
          int $to = (int) ((long) ($i + 1) * $n / 72);
          long $s = 0L;
          for (int $j = $from; $j < $to; $j++) { $s += ($b[$j] & 0xff); }
          $cells[$i] = $s;
        }
        long $fp = 0L;
        for (int $r = 0; $r < 8; $r++) {
          for (int $c = 0; $c < 8; $c++) {
            if ($cells[$r * 9 + $c + 1] > $cells[$r * 9 + $c]) $fp |= 1L << ($r * 8 + $c);
          }
        }
        ${ev.value} = $fp;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}
