package graft.queries

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: both fact tables saved with
  * `bucketBy(8, orderkey)` so Catalyst plans the join with NO shuffle exchange
  * on either side — the query-time payoff of the reference's hash-bucket
  * placement (src/partition.rs:28-38). At 100 TB this turns the biggest
  * shuffle in the workload (fact ⋈ fact on the bucket key) into a local
  * merge per bucket pair.
  */
object Bucketed {

  private val prepared = TrieMap.empty[String, Unit]

  private def prepare(spark: SparkSession, dir: String): Unit =
    prepared.getOrElseUpdate(dir, {
      val suffix = math.abs(dir.hashCode).toString
      // the in-memory catalog forgets managed tables across JVMs but their
      // warehouse directories persist — clear stale locations first
      val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
      for (t <- Seq(s"orders_b_$suffix", s"lineitem_b_$suffix")) {
        val p = java.nio.file.Paths.get(
          (if (wh.getScheme == null) java.nio.file.Paths.get(wh.toString)
           else java.nio.file.Paths.get(wh)).toString, t)
        if (java.nio.file.Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      }
      spark.read.parquet(s"$dir/orders.parquet")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"orders_b_$suffix")
      spark.read.parquet(s"$dir/lineitem.parquet")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"lineitem_b_$suffix")
    })

  /** orders ⋈ lineitem on the bucket key: per-order revenue for high-value
    * orders. The merge hint + matching bucket layout yields a SortMergeJoin
    * with zero Exchange operators (verify with graft.Explain).
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    prepare(spark, dir)
    val suffix = math.abs(dir.hashCode).toString
    val o = spark.table(s"orders_b_$suffix").filter(col("o_totalprice") > 400000.0)
    val li = spark.table(s"lineitem_b_$suffix")
    o.hint("merge")
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"),
        count(lit(1)).as("n_lines"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_bucketed_join" -> bucketedJoin _,
  )

  val oracles: Map[String, String] = Map(
    "q46_bucketed_join" ->
      """SELECT o_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty, count(*) AS n_lines
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_totalprice > 400000.0
        |GROUP BY o_orderkey""".stripMargin,
  )
}
