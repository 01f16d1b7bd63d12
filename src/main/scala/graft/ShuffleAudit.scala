package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shuffle-volume audit: run queries and report actual shuffle-write /
  * shuffle-read bytes from task metrics (input sizes: the static table
  * bytes in TESTDATA/BASELINE — the local filesystem does not surface
  * per-task read bytes) — the measured form of every
  * "no corpus-sized shuffle" claim in the operator docs. A plan whose
  * shuffle-write is a tiny fraction of its input is map-dominated and scales
  * with added executors; one whose shuffle approaches its input re-pays the
  * network at every stage boundary.
  *
  * Usage: ShuffleAudit <sfDir> [q1,q2,...] → one JSON line per query:
  * {"query":name,"input_mb":…,"shuffle_write_mb":…,"shuffle_read_mb":…,"sec":…}
  */
object ShuffleAudit {

  private val input = new AtomicLong
  private val shuffleWrite = new AtomicLong
  private val shuffleRead = new AtomicLong

  private final class MetricsListener extends SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        input.addAndGet(m.inputMetrics.bytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        ()
      }
    }
  }


  /** Listener events are async; poll until the counters stop moving. */
  private def settle(): (Long, Long, Long) = {
    var last = (input.get, shuffleWrite.get, shuffleRead.get)
    var stable = 0
    while (stable < 3) {
      Thread.sleep(100)
      val now = (input.get, shuffleWrite.get, shuffleRead.get)
      if (now == last) stable += 1 else { stable = 0; last = now }
    }
    last
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q153_heavy_hitters", "q163_topk_agg", "q10_window_top3",
        "q30_dedup_exact", "q91_star_join", "q156_ewma", "q03_agg_q1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", FastTmp.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new MetricsListener)

    names.foreach { name =>
      // "variant:<q>" audits the Bench production stand-in instead of the
      // verdict form — the shape whose shuffle claims the docs make
      val fn = if (name.startsWith("variant:"))
        SparkEntry.benchVariants(name.stripPrefix("variant:"))
      else SparkEntry.queries(name)
      // warm-up run: index/cache builds and IO cache land outside the audit
      fn(spark, sfDir).count()
      settle()
      input.set(0); shuffleWrite.set(0); shuffleRead.set(0)
      val t0 = System.nanoTime()
      // drive THIS plan instance (df.count() would build a different
      // QueryExecution and leave these metrics untouched)
      val qe = fn(spark, sfDir).queryExecution
      qe.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val (_, sw, sr) = settle()
      def mb(b: Long) = math.round(b / 1048.576) / 1000.0 // MB, 3 decimals
      println(s"""{"query":"$name","shuffle_write_mb":${mb(sw)},"shuffle_read_mb":${mb(sr)},"sec":${math.round(sec * 1000) / 1000.0}}""")
    }
    spark.stop()
  }
}
