package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pre-training data-quality audit: the constraint checks a pipeline runs
  * before a corpus (or fact table) feeds a training job — referential
  * integrity, key uniqueness, domain ranges, and emptiness — emitted as one
  * (check, n_checked, n_violations) row per rule so the gate is a single
  * small-table assertion ("all n_violations = 0") instead of a grep through
  * logs.
  *
  * Scale shape: every rule is either a scan-local aggregate (range/empty
  * checks fold map-side) or a broadcast-dimension anti-join (FK check
  * against the customer dimension); the per-rule results are 1-row frames
  * unioned at the end. Nothing shuffles more than the duplicate-key check,
  * which is a grouped count on the key — the same plan q30's exact dedup
  * rides on.
  */
object Audit {

  def dataQuality(spark: SparkSession, dir: String): DataFrame = {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val documents = spark.read.parquet(s"$dir/documents.parquet")

    def rule(name: String, checked: DataFrame, violations: DataFrame): DataFrame =
      checked.agg(count(lit(1)).as("n_checked"))
        .crossJoin(violations.agg(count(lit(1)).as("n_violations")))
        .select(lit(name).as("check"), col("n_checked"), col("n_violations"))

    // FK: every order's customer must exist (anti-join on the key). No
    // explicit broadcast hint: customer scales linearly with SF (150k rows
    // per SF), so at 100 TB it is NOT a broadcastable dimension — AQE
    // decides at runtime (broadcasts when small, shuffles when not).
    val fkOrphans = orders.join(
      customer.select(col("c_custkey").as("o_custkey")),
      Seq("o_custkey"), "left_anti")
    // PK: o_orderkey must be unique (rows beyond the first of each key)
    val dupKeys = orders.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
    // Domain: TPC-H quantities live in [1, 50]
    val qtyRange = lineitem.filter(col("l_quantity") < 1 || col("l_quantity") > 50)
    // Domain: extended price must be positive
    val negPrice = lineitem.filter(col("l_extendedprice") <= 0)
    // Emptiness: documents with no usable text
    val emptyDocs = documents.filter(trim(col("text")) === "")

    rule("fk_orders_customer", orders, fkOrphans)
      .unionByName(rule("pk_orders_unique", orders, dupKeys))
      .unionByName(rule("lineitem_qty_range", lineitem, qtyRange))
      .unionByName(rule("lineitem_price_positive", lineitem, negPrice))
      .unionByName(rule("documents_nonempty", documents, emptyDocs))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q176_data_quality" -> ((s: SparkSession, d: String) => dataQuality(s, d)),
  )

  def oracles: Map[String, String] = Map(
    "q176_data_quality" ->
      """SELECT 'fk_orders_customer' AS check, (SELECT count(*) FROM orders) AS n_checked,
        |  (SELECT count(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |   WHERE c.c_custkey IS NULL) AS n_violations
        |UNION ALL
        |SELECT 'pk_orders_unique', (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM
        |    (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1))
        |UNION ALL
        |SELECT 'lineitem_qty_range', (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
        |UNION ALL
        |SELECT 'lineitem_price_positive', (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0)
        |UNION ALL
        |SELECT 'documents_nonempty', (SELECT count(*) FROM documents),
        |  (SELECT count(*) FROM documents WHERE trim(text) = '')""".stripMargin,
  )
}
