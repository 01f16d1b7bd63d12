package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe: replicate the driver tables N× with disjoint key ranges and
  * re-time representative queries on the bigger data — the reproducible form
  * of the BASELINE.md "would this plan survive a scale-up" check.
  *
  * Replication offsets every table's primary key per copy (doc_id, vec_id,
  * o_orderkey, l_orderkey, event_id) while leaving foreign keys into the
  * dimension tables (custkey, suppkey, user_id) untouched — dims do NOT grow,
  * so per-dim-key fan-out grows with the factor. That is deliberately HARDER
  * than proportional TPC-H scaling: a plan that stays near-linear here has no
  * hidden quadratic stage and no per-key state blowup.
  *
  * Usage: ScaleProbe <sfDir> <factor> [q1,q2,...]
  * Prints one JSON line: {"factor":N,"queries":{name:sec,...}} (median of 3
  * warm runs, same methodology as graft.Bench).
  */
object ScaleProbe {

  /** Tables that get replicated, with the key column to offset per copy. */
  private val keyed = Map(
    "documents" -> "doc_id",
    "embeddings" -> "vec_id",
    "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey",
    "events" -> "event_id")

  private val passthrough =
    Seq("region", "nation", "customer", "supplier", "part")

  private val KeyStride = 1000000000L // copies get key + i * stride (disjoint)

  def replicate(spark: SparkSession, sfDir: String, factor: Int): String = {
    val out = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(FastTmp.dir), "probe-")
    for ((tbl, key) <- keyed) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val base = spark.read.parquet(s"$sfDir/$tbl.parquet")
      val copies = (0 until factor).map(i =>
        base.withColumn(key, col(key) + lit(i * KeyStride)))
      copies.reduce(_ union _)
        .write.mode("overwrite").parquet(s"$out/$tbl.parquet")
    }
    for (tbl <- passthrough)
      java.nio.file.Files.createSymbolicLink(
        out.resolve(s"$tbl.parquet"),
        java.nio.file.Paths.get(s"$sfDir/$tbl.parquet"))
    out.toString
  }

  /** Probe-only query shapes beyond the driver surface: the dedup skew
    * guards ENGAGED (the driver-checked q31/q33 run uncapped to keep
    * exhaustive semantics; a 100 TB run sets a cap). Dup-heavy replication
    * makes every text a 100-member exact-dup cluster, so every LSH bucket /
    * Jaccard block is hot: uncapped pays the quadratic within-bucket pair
    * cost, capped drops the hot buckets whole (their pairs are exact dups a
    * linear groupBy already finds — see q30) — the probe quantifies exactly
    * that bound.
    */
  private val probeVariants: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the BENCHED q171 plan (within-source blocked, global df) — the form
    // whose growth curve BASELINE.md records across sf0.001→0.01→0.1
    "q171_blocked" ->
      ((s: SparkSession, d: String) =>
        graft.pipeline.Dedup.prefixFilterJoin(s, d, 0.8, Some("source"))),
    "q31_capped50" ->
      ((s: SparkSession, d: String) => graft.pipeline.Dedup.minhashLsh(s, d, maxBucket = Some(50))),
    "q33_capped50" ->
      ((s: SparkSession, d: String) => graft.pipeline.Dedup.ngramJaccard(s, d, maxBlock = Some(50))),
    // q146's 100 TB form: exact percentile state is O(group size); the
    // production sketch (percentile_approx) bounds it — same plan shape
    "q146_approx" ->
      ((s: SparkSession, d: String) => graft.pipeline.Corpus.madOutliers(s, d, approx = true)),
    // q145 timed WITHOUT the model cache: the cost of the 50-iteration GD
    // fit itself (the driver surface serves the cached model)
    "q145_train" ->
      ((s: SparkSession, d: String) => {
        graft.pipeline.Trainer.clear()
        graft.pipeline.Trainer.logregQuality(s, d)
      }),
    // q149 timed WITHOUT the model cache: one corpus-sized word count +
    // 10 vocab-sized merge rounds
    "q149_train" ->
      ((s: SparkSession, d: String) => {
        graft.pipeline.Corpus.clearBpeCache()
        graft.pipeline.Corpus.bpeMerges(s, d)
      }),
    // q157's production form (within-block pairs only — the driver query
    // additionally computes the O(n²) exact audit baseline) with the
    // hot-cell guard engaged: dup-heavy replication makes every k-means
    // cell a dup-cluster magnet, same quadratic hazard as LSH hot buckets
    "q157_pairs_capped200" ->
      ((s: SparkSession, d: String) =>
        graft.pipeline.Similarity.semanticDedupPairs(s, d, maxCell = Some(200))),
    "q157_pairs_uncapped" ->
      ((s: SparkSession, d: String) =>
        graft.pipeline.Similarity.semanticDedupPairs(s, d)),
    // q160's production shape: PageRank doesn't care where the pair table
    // came from — feed it the BLOCKED near-dup pairs (capped cells) instead
    // of the driver query's exact O(n²) audit edges
    // q171's production ORDER: exact dedup first (q30's groupBy), THEN the
    // prefix-filtered exact join over survivors. Dup-heavy replication makes
    // every text a factor-sized exact-dup cluster whose pairs all have
    // Jaccard 1.0 — any set-similarity join pays factor² for pairs a linear
    // groupBy already finds; running survivors-first makes the probe measure
    // the join's real work, and its timing should stay FLAT in the factor
    // (the survivor set does not grow under replication)
    "q171_survivors_blocked" ->
      ((s: SparkSession, d: String) => {
        val docs = s.read.parquet(s"$d/documents.parquet")
        val surv = docs.groupBy(col("text"))
          .agg(min(struct(col("doc_id"), col("source"))).as("m"))
          .select(col("m.doc_id").as("doc_id"), col("text"), col("m.source").as("source"))
        graft.pipeline.Dedup.prefixFilterJoinOf(surv, 0.8, Some("source"))
      }),
    "q160_blocked_edges" ->
      ((s: SparkSession, d: String) => {
        val pairs = graft.pipeline.Similarity
          .semanticDedupPairs(s, d, maxCell = Some(2000))
          .select(org.apache.spark.sql.functions.col("vec_a").as("src"),
            org.apache.spark.sql.functions.col("vec_b").as("dst"))
        graft.operators.Graph.pageRank(pairs)
      }),
    // q178's production ORDER under dup-heavy data, same survivors-first
    // move as q171_survivors_blocked: the exact tier (one linear groupBy)
    // collapses the factor-sized exact-dup clusters BEFORE the blocked
    // Jaccard + CC run, so the closure works on the constant-size survivor
    // set; docs then take their exact-survivor's near-dup rep through a
    // doc-keyed map-side join. Output ≡ the full closure (exact dups have
    // Jaccard 1.0, so quotienting through the exact tier preserves
    // components AND the component-min rep — the min doc of a component is
    // always the min of its own text group).
    "q178_survivors_split" ->
      ((s: SparkSession, d: String) => {
        val docs = s.read.parquet(s"$d/documents.parquet")
        val fp = docs.groupBy(col("text")).agg(min(col("doc_id")).as("surv"))
        val byDoc = docs.select(col("doc_id"), col("text"))
          .join(fp, Seq("text")).select(col("doc_id"), col("surv"))
        val survDocs = docs
          .join(fp.select(col("surv").as("doc_id")), Seq("doc_id"), "left_semi")
        val cc = graft.pipeline.Dedup.connectedComponents(
          graft.pipeline.Dedup.ngramJaccardOf(survDocs), "doc_a", "doc_b")
        val rep = byDoc
          .join(cc.withColumnRenamed("doc_id", "surv"), Seq("surv"), "left")
          .select(col("doc_id"),
            coalesce(col("survivor_id"), col("surv")).as("rep"))
        graft.pipeline.Dedup.splitOfReps(rep)
      }),
  )

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val defaults = Seq("q03_agg_q1", "q06_join_shuffle", "q30_dedup_exact",
      "q32_dedup_simhash", "q85_tfidf", "q87_profile", "q91_star_join",
      "q97_keep_first", "q98_inverted_index", "q100_doc_diversity")
    val names = if (args.length > 2) args(2).split(",").toSeq else defaults

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

    val dir = replicate(spark, sfDir, factor)
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      val q = probeVariants.getOrElse(name, SparkEntry.queries(name))
      // noop sink for the same reason as Bench: count() would let column
      // pruning delete the projections being probed
      q(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(runOnce) // warm-up
    val results = names.map { n =>
      val times = (1 to 3).map(_ => runOnce(n)).sorted
      n -> times(1)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"factor":$factor,"sf":"$sfDir","queries":$qs}""")
    spark.stop()
  }
}
