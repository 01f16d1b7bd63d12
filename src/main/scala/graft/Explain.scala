package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan of selected
  * queries so pushdown / pruning / join strategy / codegen coverage can be
  * audited (and regressions caught by eye). Usage:
  *   run_main.sh graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_scan_project", "q02_filter_scan", "q03_agg_q1",
        "q05_join_broadcast", "q06_join_shuffle", "q25_engine_partition_prune")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXPLAIN_BENCH=1 prints the plan Bench actually times
    // (the benchVariants stand-in when one exists) instead of the
    // oracle-verdict form — the form plan audits should be made against.
    val bench = sys.env.contains("SPARK_GRAFT_EXPLAIN_BENCH")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val q = if (bench) SparkEntry.benchVariants.getOrElse(n, SparkEntry.queries(n))
        else SparkEntry.queries(n)
      q(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
