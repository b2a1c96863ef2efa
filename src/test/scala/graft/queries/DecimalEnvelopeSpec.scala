package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r11 verdict item 8: the q454/q468 wide-decimal cross products
  * exceed DECIMAL(38,0) at ~10⁹-row segments. The envelope guard
  * must (a) be invisible inside the envelope, (b) fail LOUDLY with
  * an error that names the operator and the remedy — never the
  * generic ANSI ArithmeticException from deep inside codegen.
  */
class DecimalEnvelopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dec(vs: String*) =
    vs.toSeq.toDF("v").select(expr("CAST(v AS DECIMAL(38,0))").as("d"))

  test("values inside the 1e17 envelope pass through unchanged") {
    val got = dec("99999999999999999", "-99999999999999999", "0")
      .select(EtlOps.decimalEnvelope(col("d"), "spec").as("g"))
      .collect().map(_.getDecimal(0).toBigInteger.toString).sorted.toSeq
    assert(got == Seq("-99999999999999999", "0", "99999999999999999").sorted)
  }

  test("NULL factors pass through as null — never a misleading overflow error") {
    // r12 advice: assert_true throws on a NULL condition, so a null
    // sum from a degenerate/empty aggregation used to surface as the
    // envelope error; the guard must be null-transparent instead
    val got = dec("42").select(
      EtlOps.decimalEnvelope(expr("CAST(NULL AS DECIMAL(38,0))"), "spec").as("g"))
      .collect()
    assert(got.length == 1 && got(0).isNullAt(0),
      "a null factor must propagate null through the envelope")
  }

  test("a factor beyond 1e17 fails with the NAMED operator error") {
    val e = intercept[Exception] {
      dec("100000000000000001")
        .select(EtlOps.decimalEnvelope(col("d"), "q454_cuped_lift").as("g"))
        .collect()
    }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("DECIMAL(38,0) envelope"), s"unexpected error: $msg")
    assert(msg.contains("q454_cuped_lift"),
      s"error must name the operator: $msg")
    assert(msg.contains("gcd-reduce") || msg.contains("two 64-bit limbs"),
      s"error must state the remedy: $msg")
  }

  test("magnitudes whose PRODUCT would overflow are caught by the envelope first") {
    // 1e18 × 1e18 = 1e36 fits, but 1e19 factors push 1000·a·b past
    // DECIMAL(38,0): unguarded this is an ANSI ArithmeticException
    // mid-codegen; guarded, the envelope fires with the named
    // message before any multiplication happens
    val big = dec("10000000000000000000") // 1e19
      .withColumn("a", col("d")).withColumn("b", col("d"))
    val e = intercept[Exception] {
      big.select((EtlOps.decimalEnvelope(col("a"), "q468_mix_decomposition")
          * EtlOps.decimalEnvelope(col("b"), "q468_mix_decomposition"))
          .as("p"))
        .collect()
    }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("q468_mix_decomposition")
      && msg.contains("envelope"), s"expected the named guard, got: $msg")
  }
}
