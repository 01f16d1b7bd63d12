package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.OlapEngine
import graft.pipeline.ClusterReps

/** Scale probe for the cluster_reps FOLD path (`ClusterReps.applyDelta`):
  * wall-time vs corpus factor at fixed delta, and vs delta factor at fixed
  * corpus. BASELINE.md records the table.
  *
  * Replication model: copies get disjoint doc_ids AND a per-copy text
  * PREFIX. The 20-char-prefix Jaccard block key then separates copies, so
  * block density stays CONSTANT as the corpus grows — the honest model of
  * "10× more data" (real corpora don't get denser as they grow; plain
  * replication would instead multiply every block's size by the factor and
  * probe the quadratic-hazard path, which the capped LSH probes already
  * cover — see BASELINE.md's round-4 notes on the synthetic corpus's
  * density pathology).
  *
  * Timed region: applyDelta only (bootstrap is the untimed offline build).
  * Each cell bootstraps a fresh engine, then times 3 folds of the same
  * delta (the fold is an idempotent upsert, so repeats do identical work)
  * and reports the median.
  */
object FoldProbe {

  private val Stride = 1000000000L

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")

  /** `factor` copies with disjoint ids and copy-distinct block prefixes. */
  private def repl(base: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { i =>
      base.select((col("doc_id") + lit(i * Stride)).as("doc_id"),
        concat(lit(f"cp$i%04d "), col("text")).as("text"))
    }.reduce(_ union _)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
                  else Seq(1, 10)
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

    val d = docs(spark, sfDir)
    // fixed pieces: the q123-style split of copy 0
    val corpus1 = repl(d.filter(col("doc_id") % 10 =!= 0), 1)
    val delta1 = repl(d.filter(col("doc_id") % 10 === 0), 1)

    def cell(corpus: DataFrame, delta: DataFrame): Double = {
      val c = corpus.localCheckpoint(true)
      val dl = delta.localCheckpoint(true)
      val eng = new OlapEngine(spark, Files.createTempDirectory("graft-foldprobe-"))
      ClusterReps.createIndexTable(eng)
      ClusterReps.bootstrap(eng, c) // untimed offline build (absorbs c)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        ClusterReps.applyDelta(eng, dl) // screens vs the engine's absorbed set
        (System.nanoTime() - t0) / 1e9
      }.sorted
      times(1)
    }

    cell(corpus1, delta1) // warm-up (JIT + engine machinery); discarded
    val corpusScaled = factors.map { f =>
      f -> cell(repl(d.filter(col("doc_id") % 10 =!= 0), f), delta1)
    }
    val deltaScaled = factors.map { f =>
      f -> cell(corpus1, repl(d.filter(col("doc_id") % 10 === 0), f))
    }
    def fmt(xs: Seq[(Int, Double)]) =
      xs.map { case (f, t) => "\"" + f + "\":" + t }.mkString("{", ",", "}")
    println(s"""{"probe":"cluster_reps_fold","sf":"$sfDir","corpus_scaled_fixed_delta":${fmt(corpusScaled)},"delta_scaled_fixed_corpus":${fmt(deltaScaled)}}""")
    spark.stop()
  }
}

/** Scale probe for the inverted-text-index engine tables (q190's machinery)
  * in the production shape: the index FOLDS at load time and BM25 merely
  * PROBES it at query time. Reports, per corpus factor f: the fold cost of
  * a fixed delta into an f×-sized index (should be flat — the fold touches
  * the delta's rows only), the table-served BM25 (grows with the probed
  * terms' postings, not the corpus text), and the q118 from-scratch
  * recompute on the same f× corpus (full tokenize every query — the cost
  * the index amortizes away). Copies get disjoint doc_ids and unchanged
  * text: posting lists grow linearly with f, the honest keyword-frequency
  * model.
  */
object TextProbe {

  private val Stride = 1000000000L

  def main(args: Array[String]): Unit = {
    import graft.pipeline.{TextIndex, TextAnalysis}
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
                  else Seq(1, 10, 100)
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

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    def copies(lo: Int, hi: Int): DataFrame =
      (lo until hi).map(i =>
        base.select((col("doc_id") + lit(i * Stride)).as("doc_id"), col("text")))
        .reduce(_ union _)
    // fixed delta: 10% of copy 0's ids, shifted into their own id range
    val delta = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(500L * Stride)).as("doc_id"), col("text"))
      .localCheckpoint(true)

    def median3(work: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)

    def cell(corpus0: DataFrame): (Double, Double, Double) = {
      val corpus = corpus0.localCheckpoint(true)
      val eng = new OlapEngine(
        spark, Files.createTempDirectory("graft-txtprobe-"))
      TextIndex.createTables(eng)
      TextIndex.bootstrap(eng, corpus) // untimed: load-time maintenance
      val foldSec = median3(TextIndex.applyDelta(eng, delta))
      // serve in the steady state: the scheduled compaction has run (the
      // serve cost is dominated by rowset-fragment count, not serve code)
      TextIndex.compactIndex(eng)
      val serveSec = median3(TextIndex.bm25FromTable(eng)
        .write.mode("overwrite").format("noop").save())
      // the recompute baseline reads a real parquet dir, like q118 does
      val tmp = Files.createTempDirectory("graft-txtprobe-docs-")
      corpus.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val scratchSec = median3(TextAnalysis.bm25TopK(spark, tmp.toString)
        .write.mode("overwrite").format("noop").save())
      (foldSec, serveSec, scratchSec)
    }

    cell(base) // warm-up (JIT + engine machinery); discarded
    val rows = factors.map(f => (f, cell(copies(0, f))))
    // the DOC-LENGTH axis, where the index's advantage is structural: the
    // recompute re-tokenizes every text byte per query, while the serve
    // reads fixed-width posting/doclen rows whose COUNT is unchanged (only
    // tf/dl values grow). Fixed 10x corpus, text repeated L times per doc.
    val lengths = Seq(1, 4, 16)
    val lenRows = lengths.map { l =>
      val scaled = copies(0, 10).select(col("doc_id"),
        concat_ws(" ", array_repeat(col("text"), l)).as("text"))
      l -> cell(scaled)
    }
    def fmt[K](rs: Seq[(K, (Double, Double, Double))],
               g: ((Double, Double, Double)) => Double) =
      rs.map { case (f, t) => "\"" + f + "\":" + g(t) }.mkString("{", ",", "}")
    println(s"""{"probe":"text_index","sf":"$sfDir","fold_sec_by_factor":${fmt(rows, _._1)},"serve_sec_by_factor":${fmt(rows, _._2)},"scratch_bm25_sec_by_factor":${fmt(rows, _._3)},"serve_sec_by_doclen":${fmt(lenRows, _._2)},"scratch_bm25_sec_by_doclen":${fmt(lenRows, _._3)}}""")
    spark.stop()
  }
}

/** Scale probe for the ANN engine-table index (q187's machinery) in its
  * production shape at scale: the quantizer/codebooks FIT ONCE on the base
  * corpus (re-fitting on 100× data is the scheduled re-bootstrap, not the
  * steady state), new embeddings FOLD in (`AnnIndex.applyDelta` — stateless
  * per-vector assignment), and probes SERVE from the table. Reports fold
  * wall-time vs folded-batch factor and serve wall-time vs indexed-corpus
  * factor. Copies get disjoint vec_ids; identical vectors across copies are
  * fine for timing (ties rank deterministically).
  */
object AnnProbe {

  private val Stride = 1000000000L

  def main(args: Array[String]): Unit = {
    import graft.pipeline.AnnIndex
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
                  else Seq(1, 10, 100)
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

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    def copies(lo: Int, hi: Int): DataFrame =
      (lo until hi).map(i =>
        emb.select((col("vec_id") + lit(i * Stride)).as("vec_id"), col("embedding")))
        .reduce(_ union _)

    def cell(f: Int): (Double, Double) = {
      val eng = new graft.engine.OlapEngine(
        spark, java.nio.file.Files.createTempDirectory("graft-annprobe-"))
      AnnIndex.createTables(eng)
      AnnIndex.bootstrap(eng, emb) // fixed 1x fit — the steady-state shape
      val extra = if (f > 1) Some(copies(1, f).localCheckpoint(true)) else None
      val foldSec = extra.fold(0.0) { d =>
        val t0 = System.nanoTime()
        AnnIndex.applyDelta(eng, d)
        (System.nanoTime() - t0) / 1e9
      }
      val full = extra.fold(emb)(emb.union(_)).localCheckpoint(true)
      val serveTimes = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        AnnIndex.topKFromTable(eng, full)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (foldSec, serveTimes(1))
    }

    cell(1) // warm-up; discarded
    val rows = factors.map(f => (f, cell(f)))
    def fmt(g: ((Int, (Double, Double))) => (Int, Double)) =
      rows.map(g).map { case (f, t) => "\"" + f + "\":" + t }.mkString("{", ",", "}")
    println(s"""{"probe":"ann_index","sf":"$sfDir","fold_sec_by_factor":${fmt { case (f, (a, _)) => (f, a) }},"serve_sec_by_factor":${fmt { case (f, (_, b)) => (f, b) }}}""")
    spark.stop()
  }
}

/** Fold-burst probe for the scheduled-compaction loop
  * (`OlapEngine.runScheduledCompaction`): serve cost of the ANN and
  * cluster_reps index tables BEFORE vs AFTER compaction, as fold count
  * grows. Each fold publishes one rowset fragment; merge-on-read unions
  * every visible fragment per serve, so pre-compaction serve cost grows
  * with burst size while post-compaction cost is flat — the measured
  * argument that the C1-C3 loop (not serve code) owns steady-state probe
  * latency. Folds replay the same delta (replay-safe upserts), so content
  * is identical at every burst size and the timing isolates fragment count.
  */
object CompactionProbe {

  def main(args: Array[String]): Unit = {
    import graft.pipeline.{AnnIndex, ClusterReps}
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val bursts = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
                 else Seq(1, 4, 16)
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

    def median3(work: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)

    // --- ANN: serve = table-served IVF-PQ top-k over the full corpus -----
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint(true)
    def annCell(k: Int): (Double, Double) = {
      val eng = new OlapEngine(spark, Files.createTempDirectory("graft-cprobe-ann-"))
      AnnIndex.createTables(eng)
      AnnIndex.bootstrap(eng, emb.filter(col("vec_id") % 10 =!= 0))
      val delta = emb.filter(col("vec_id") % 10 === 0)
      (1 to k).foreach(_ => AnnIndex.applyDelta(eng, delta))
      def serve(): Unit = AnnIndex.topKFromTable(eng, emb)
        .write.mode("overwrite").format("noop").save()
      val pre = median3(serve())
      eng.runScheduledCompaction()
      val post = median3(serve())
      (pre, post)
    }

    // --- cluster_reps: serve = full-corpus rep resolution ----------------
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").localCheckpoint(true)
    def crCell(k: Int): (Double, Double) = {
      val eng = new OlapEngine(spark, Files.createTempDirectory("graft-cprobe-cr-"))
      ClusterReps.createIndexTable(eng)
      val base = d.filter(col("doc_id") % 10 =!= 0)
      val delta = d.filter(col("doc_id") % 10 === 0)
      ClusterReps.bootstrap(eng, base)
      (1 to k).foreach(_ => ClusterReps.applyDelta(eng, delta))
      def serve(): Unit = d.select(col("doc_id"))
        .join(eng.scan(ClusterReps.Db, ClusterReps.Table)
          .select(col("doc_id"), col("rep").as("stored")), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("stored"), col("doc_id")).as("rep"))
        .write.mode("overwrite").format("noop").save()
      val pre = median3(serve())
      eng.runScheduledCompaction()
      val post = median3(serve())
      (pre, post)
    }

    annCell(1); crCell(1) // warm-up (JIT + engine machinery); discarded
    val ann = bursts.map(k => (k, annCell(k)))
    val cr = bursts.map(k => (k, crCell(k)))
    def fmt(rs: Seq[(Int, (Double, Double))], g: ((Double, Double)) => Double) =
      rs.map { case (f, t) => "\"" + f + "\":" + g(t) }.mkString("{", ",", "}")
    println(s"""{"probe":"scheduled_compaction","sf":"$sfDir","ann_serve_pre":${fmt(ann, _._1)},"ann_serve_post":${fmt(ann, _._2)},"cluster_reps_serve_pre":${fmt(cr, _._1)},"cluster_reps_serve_post":${fmt(cr, _._2)}}""")
    spark.stop()
  }
}

/** Scale probe for the round-9 retrieval family served from the inverted
  * index (q205 batch retrieval, q208 reverse search): the claim under test
  * is that a query WORKLOAD is a relation, so serving Q queries (or matching
  * N standing queries) is ONE join pass whose cost tracks the touched
  * postings — not Q (or N) corpus scans. Reports:
  *  - batch-serve wall-time vs batched query count Q (one plan, per-query
  *    top-k via WindowGroupLimit), next to the per-query LOOP baseline
  *    (bm25FromTable once per query — the shape the batch form replaces;
  *    capped at the smaller Q values, its cost is visibly linear);
  *  - reverse-search wall-time vs standing-query count N (one pass over the
  *    batch's postings however large N grows).
  * Queries are synthesized from the corpus vocabulary in descending-df
  * order (2 terms each, deterministic), so every query touches real
  * postings; beyond the vocabulary the terms cycle — shared terms across
  * queries are the realistic query-log shape.
  */
object RetrievalProbe {

  def main(args: Array[String]): Unit = {
    import graft.pipeline.TextIndex
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val qCounts = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
                  else Seq(3, 30, 300)
    val loopCounts = qCounts.filter(_ <= 30)
    val nCounts = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq
                  else Seq(3, 300, 3000)
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

    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val eng = new OlapEngine(
      spark, Files.createTempDirectory("graft-retrprobe-"))
    TextIndex.createTables(eng)
    TextIndex.bootstrap(eng, corpus)
    TextIndex.compactIndex(eng) // steady state: maintenance has run

    // vocabulary in descending document frequency (model-sized driver pull:
    // bounded by 2 * max workload size, and the vocab itself is tiny)
    val maxTerms = 2 * (qCounts ++ nCounts).max
    val vocab = eng.scan("graft_idx", "inv_postings")
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("word"))
      .limit(maxTerms).select(col("word")).collect().map(_.getString(0))
    def workload(q: Int): org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      (0 until q).flatMap { i =>
        val a = vocab((2 * i) % vocab.length)
        val bRaw = vocab((2 * i + 1) % vocab.length)
        val b = if (bRaw == a) vocab((2 * i + 2) % vocab.length) else bRaw
        Seq((i.toLong, a), (i.toLong, b))
      }.toDF("query_id", "w")
    }

    def median3(work: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)

    // warm-up (JIT, index file listing); discarded
    TextIndex.batchBm25FromTable(eng, workload(3), 5)
      .write.mode("overwrite").format("noop").save()

    val batch = qCounts.map { q =>
      val w = workload(q).localCheckpoint(true)
      q -> median3(TextIndex.batchBm25FromTable(eng, w, 5)
        .write.mode("overwrite").format("noop").save())
    }
    val loop = loopCounts.map { q =>
      q -> median3 {
        (0 until q).foreach { i =>
          val a = vocab((2 * i) % vocab.length)
          val bRaw = vocab((2 * i + 1) % vocab.length)
          val b = if (bRaw == a) vocab((2 * i + 2) % vocab.length) else bRaw
          TextIndex.bm25FromTable(eng, Seq(a, b), 5)
            .write.mode("overwrite").format("noop").save()
        }
      }
    }
    val reverse = nCounts.map { n =>
      val w = workload(n).localCheckpoint(true)
      n -> median3(TextIndex.reverseSearch(eng, w)
        .write.mode("overwrite").format("noop").save())
    }
    def fmt(xs: Seq[(Int, Double)]) =
      xs.map { case (f, t) => "\"" + f + "\":" + t }.mkString("{", ",", "}")
    println(s"""{"probe":"retrieval_batch","sf":"$sfDir","batch_serve_sec_by_q":${fmt(batch)},"loop_serve_sec_by_q":${fmt(loop)},"reverse_search_sec_by_n":${fmt(reverse)}}""")
    spark.stop()
  }
}

/** Scale probe for the doc-keyed FORWARD index paths (q215): the claim
  * under test is that refold and deleteDocs are DELTA-sized — their diff /
  * tombstone source is an IN-literal lookup over the doc-keyed `fwd_words`
  * table (bloom + row-group skip on the key), never a scan of the
  * word-bucketed postings. Measures, at growing corpus scale, the wall time
  * of a FIXED-size refold batch and a FIXED-size delete batch (three
  * disjoint batches per cell, median — re-using one batch would make the
  * second rep a cheap no-op and flatter the number). Growth beyond the
  * batch cost is file-count overhead (footers of a bigger index), reported
  * honestly rather than hidden.
  */
object FwdProbe {

  private val Stride = 1000000000L

  def main(args: Array[String]): Unit = {
    import graft.pipeline.TextIndex
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
                  else Seq(1, 10, 100)
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

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    def copies(n: Int): DataFrame =
      (0 until n).map(i =>
        base.select((col("doc_id") + lit(i * Stride)).as("doc_id"), col("text")))
        .reduce(_ union _)
    // three disjoint FIXED-size batches from copy 0 (~ |corpus@sf|/30 docs
    // each, constant across factors)
    def batch(k: Int): DataFrame = base.filter(col("doc_id") % 30 === k)
    // the refold edit: truncate to the first 5 tokens (words VANISH — the
    // tombstone-producing case)
    def edited(d: DataFrame): DataFrame = d.select(col("doc_id"),
      concat_ws(" ", slice(split(trim(lower(col("text"))), "\\s+"), 1, 5))
        .as("text"))

    def medianOf3(work: Int => Unit): Double =
      (1 to 3).map { k =>
        val t0 = System.nanoTime(); work(k); (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)

    def cell(f: Int): (Double, Double) = {
      val corpus = copies(f).localCheckpoint(true)
      val eng = new OlapEngine(
        spark, Files.createTempDirectory("graft-fwdprobe-"))
      TextIndex.createTables(eng)
      TextIndex.bootstrap(eng, corpus) // untimed: load-time maintenance
      TextIndex.compactIndex(eng)      // steady state
      val refoldSec = medianOf3(k =>
        TextIndex.refold(eng, edited(batch(k)).localCheckpoint(true)))
      val deleteSec = medianOf3(k =>
        TextIndex.deleteDocs(eng, batch(k).select("doc_id").localCheckpoint(true)))
      (refoldSec, deleteSec)
    }

    // the POSITIONAL family, same claim (round-9 verdict item 2): its
    // refold/delete now source doomed keys from the shared forward table,
    // so a fixed batch must stay flat as the positions index grows
    def cellPhrase(f: Int): (Double, Double) = {
      import graft.pipeline.PhraseIndex
      val corpus = copies(f).localCheckpoint(true)
      val eng = new OlapEngine(
        spark, Files.createTempDirectory("graft-phrprobe-"))
      PhraseIndex.createTables(eng)
      PhraseIndex.bootstrap(eng, corpus)
      eng.runScheduledCompaction()
      val refoldSec = medianOf3(k =>
        PhraseIndex.refold(eng, edited(batch(k)).localCheckpoint(true)))
      val deleteSec = medianOf3(k =>
        PhraseIndex.deleteDocs(eng, batch(k).select("doc_id").localCheckpoint(true)))
      (refoldSec, deleteSec)
    }

    cell(1) // warm-up (JIT + engine machinery); discarded
    val rows = factors.map(f => f -> cell(f))
    val phraseRows = factors.map(f => f -> cellPhrase(f))
    def fmtIn(rs: Seq[(Int, (Double, Double))], sel: ((Double, Double)) => Double) =
      rs.map { case (f, c) => "\"" + f + "\":" + sel(c) }
        .mkString("{", ",", "}")
    println(s"""{"probe":"fwd_index","sf":"$sfDir","refold_sec_by_factor":${fmtIn(rows, _._1)},"delete_sec_by_factor":${fmtIn(rows, _._2)},"phrase_refold_sec_by_factor":${fmtIn(phraseRows, _._1)},"phrase_delete_sec_by_factor":${fmtIn(phraseRows, _._2)}}""")
    spark.stop()
  }
}
