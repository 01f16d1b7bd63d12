package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The cents-domain split-long money sums (r12) must be an EXACT twin of
  * dbl(sum(dec(x))) — including on NEGATIVE values (refunds/adjustments),
  * which the original floor(v/split) + (v % split) recombination mis-summed
  * by split/outUnits per negative row (r12 advisor finding; fixed r13 with
  * the floor-consistent pmod pair). These cases never occur in the driver
  * testdata (all money columns nonnegative), so the oracle cannot see the
  * contract — this spec pins it directly.
  */
class MoneySumSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  test("moneySum == dbl(sum(dec(x))) on mixed-sign 2dp values") {
    import spark.implicits._
    val vals = Seq(-0.13, -100.00, -0.01, 0.00, 0.01, 0.13, 99.99, -99.99,
      12345.67, -12345.67, 0.07, -0.07)
    val df = vals.toDF("x")
    val got = df.agg(Relational.moneySum(col("x"))).head().getDouble(0)
    val want = df.agg(sum(dec(col("x"))).cast("double")).head().getDouble(0)
    assert(got == want, s"moneySum=$got decimal=$want")
    // the r12 shape failed exactly here: each negative row added -split/out
    val neg = Seq(-0.13).toDF("x")
    assert(neg.agg(Relational.moneySum(col("x"))).head().getDouble(0) == -0.13)
  }

  test("moneySumTimes and moneySumProd match the decimal path under negatives") {
    import spark.implicits._
    val df = Seq((-10.00, 0.05), (10.00, 0.05), (-0.01, 0.99), (3.33, 0.10))
      .toDF("a", "b")
    val gotT = df.agg(Relational.moneySumTimes(col("a"), -1, col("b")))
      .head().getDouble(0)
    val wantT = df.agg(sum(dec(col("a")) * (lit(1).cast("decimal(18,2)") - dec(col("b"))))
      .cast("double")).head().getDouble(0)
    assert(gotT == wantT, s"moneySumTimes=$gotT decimal=$wantT")
    val gotP = df.agg(Relational.moneySumProd(col("a"), col("b"))).head().getDouble(0)
    val wantP = df.agg(sum(dec(col("a")) * dec(col("b"))).cast("double"))
      .head().getDouble(0)
    assert(gotP == wantP, s"moneySumProd=$gotP decimal=$wantP")
  }
}
