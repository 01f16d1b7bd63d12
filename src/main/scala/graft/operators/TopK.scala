package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Input row for [[TopKAgg]]: ordering value + payload id. */
final case class TopKIn(ord: Double, id: Long)

/** Bounded-state top-k as a typed Aggregator — the scale-correct alternative
  * to the `row_number() OVER (...) <= k` window for plain per-group top-k:
  * the window shuffles EVERY row to its group's partition and sorts there,
  * while an aggregator's partial state is a k-bounded sorted buffer, so each
  * map task ships at most k rows per group (classic map-side combine).
  * At 100 TB with k=3 that is the difference between shuffling the fact
  * table and shuffling ~k × groups × tasks rows. Strict total order
  * (ord DESC, id ASC — ids unique) keeps the result deterministic and ties
  * engine-independent.
  */
class TopKAgg(k: Int) extends Aggregator[TopKIn, Seq[TopKIn], Seq[TopKIn]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  private def better(a: TopKIn, b: TopKIn): Boolean =
    a.ord > b.ord || (a.ord == b.ord && a.id < b.id)

  // buffers stay sorted best-first and never exceed k entries
  private def insert(buf: Seq[TopKIn], x: TopKIn): Seq[TopKIn] =
    if (buf.length == k && better(buf.last, x)) buf
    else (x +: buf).sortWith(better).take(k)

  override def zero: Seq[TopKIn] = Nil
  override def reduce(buf: Seq[TopKIn], in: TopKIn): Seq[TopKIn] = insert(buf, in)
  override def merge(a: Seq[TopKIn], b: Seq[TopKIn]): Seq[TopKIn] =
    b.foldLeft(a)(insert)
  override def finish(r: Seq[TopKIn]): Seq[TopKIn] = r
  override def bufferEncoder: Encoder[Seq[TopKIn]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TopKIn]] = ExpressionEncoder()
}

object TopK {

  /** q163: top-3 orders by total price per priority through [[TopKAgg]] —
    * `.explain` shows partial_topkagg in the map stage before the exchange,
    * which is exactly what the window formulation (q10's shape) cannot do.
    * Output is integral/string only; the double ordering value stays
    * internal, so the oracle hash has no float surface.
    */
  def topKPerGroup(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val topk = udaf(new TopKAgg(k), ExpressionEncoder[TopKIn]())
    spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_orderpriority"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("o_orderkey"))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q163_topk_agg" -> ((s: SparkSession, d: String) => topKPerGroup(s, d)),
  )

  /** The oracle is the definitional window form — the aggregator must agree
    * with `row_number` exactly, ties and all.
    */
  def oracles: Map[String, String] = Map(
    "q163_topk_agg" ->
      """SELECT o_orderpriority, rk, o_orderkey FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3""".stripMargin,
  )
}
