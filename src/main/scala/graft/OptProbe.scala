package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization A/B probe (round-12 optimization pass): times alternative
  * formulations of hot queries under the EXACT bench methodology (noop sink,
  * 1 warm-up + 3 timed runs, median, task-time attribution) so a rewrite is
  * adopted on measurement, not intuition. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.OptProbe [variantName ...]"
  * Variants are self-contained thunks; none is wired into the query surface —
  * the winning shape gets ported into the real operator and re-verified
  * against the oracle before it ships.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", FastTmp.dir)
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def dec(c: Column): Column = c.cast("decimal(18,2)")
    def dbl(c: Column): Column = c.cast("double")
    // cents-domain exact twin of sum(dec(x)): every money column is a 2dp
    // value, so round(x*100) is the exact integer of the decimal cast and
    // long sums are the decimal sums scaled by 100
    def cents(c: Column): Column = round(c * 100).cast("long")

    // the r13 bcast-df ordered-token build, shared by the stage probes —
    // EXACTLY the operator's current internals (tokenized serve, broadcast
    // dfreq, eager checkpoint)
    def r13Ordered(spark: SparkSession, sfDir: String): DataFrame = {
      val documents = graft.pipeline.TokenizedCorpus.withTokens(spark, sfDir)
      val threshold = 0.8
      val tok = documents.select(col("doc_id"), col("source").as("blk"),
        explode(array_distinct(col("toks"))).as("word"))
      val dfreq = tok.groupBy(col("word")).agg(count(lit(1)).as("df"))
      tok.join(broadcast(dfreq), Seq("word"))
        .groupBy(col("doc_id"), col("blk"))
        .agg(sort_array(collect_list(struct(col("df"), col("word")))).as("ts"))
        .select(col("doc_id"), col("blk"),
          transform(col("ts"), t => t.getField("word")).as("toks"),
          sort_array(transform(col("ts"), t => t.getField("word"))).as("stoks"),
          size(col("ts")).as("sz"))
        .withColumn("plen",
          col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)).cast("int") + 1)
        .localCheckpoint(true)
    }


    val variants: Map[String, () => DataFrame] = Map(
      "q03_base" -> (() => graft.queries.Relational.aggQ1(spark, sfDir)),
      "q03_nowiden" -> (() =>
        li.filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
            dbl(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
            dbl(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))))
              .as("sum_disc_price"),
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"),
            count(lit(1)).as("count_order"))),
      "q03_cents" -> (() =>
        graft.operators.MapWidth.widen(li)
          .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            (sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"),
            (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
            (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
              .as("sum_disc_price"),
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"),
            count(lit(1)).as("count_order"))),
      "q03_nowiden_cents" -> (() =>
        li.filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            (sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"),
            (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
            (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
              .as("sum_disc_price"),
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"),
            count(lit(1)).as("count_order"))),
      "q03_widen_first" -> (() =>
        graft.operators.MapWidth.widen(
          li.select(col("l_shipdate"), col("l_returnflag"), col("l_linestatus"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount")))
          .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
            dbl(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
            dbl(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))))
              .as("sum_disc_price"),
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"),
            count(lit(1)).as("count_order"))),
      // scale-safe exact twin: per-row arithmetic in the long (cents) domain,
      // accumulation in decimal whose backing stays a compact long until the
      // value genuinely exceeds 18 digits (then escalates instead of
      // overflowing) — the decimal cost in q03_base is the per-row
      // double->BigDecimal casts and the (18,2)x(18,2) multiply, not the adds
      "q03_cents_decsum" -> (() =>
        li.filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dbl(sum(cents(col("l_quantity")).cast("decimal(25,0)")) / 100).as("sum_qty"),
            dbl(sum(cents(col("l_extendedprice")).cast("decimal(25,0)")) / 100).as("sum_base_price"),
            dbl(sum((cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
              .cast("decimal(30,0)")) / 10000).as("sum_disc_price"),
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"),
            count(lit(1)).as("count_order"))),
      "q06_cents_decsum" -> (() => {
        val c = spark.read.parquet(s"$sfDir/customer.parquet")
        val o = spark.read.parquet(s"$sfDir/orders.parquet")
        val l = li
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(col("c_mktsegment"))
          .agg(dbl(sum((cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
            .cast("decimal(30,0)")) / 10000).as("revenue"),
            count(lit(1)).as("n"))
      }),
      // hi/lo split-long accumulation: per-row stays pure long codegen, the
      // two partial sums recombine EXACTLY in decimal on the handful of
      // output groups — overflow-safe to ~1e12 rows/group while costing
      // what plain long sums cost
      "q03_hilo" -> (() => {
        def hilo(v: Column, scaleDiv: Long, outDiv: Int): Column = {
          val hi = sum(floor(v / lit(scaleDiv)).cast("long"))
          val lo = sum(v % lit(scaleDiv))
          dbl((hi.cast("decimal(38,0)") * lit(scaleDiv) + lo.cast("decimal(38,0)")) / lit(outDiv))
        }
        li.filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            hilo(cents(col("l_quantity")), 10000L, 100).as("sum_qty"),
            hilo(cents(col("l_extendedprice")), 10000L, 100).as("sum_base_price"),
            hilo(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))),
              1000000L, 10000).as("sum_disc_price"),
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"),
            count(lit(1)).as("count_order"))
      }),
      "q06_shj" -> (() => {
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
        graft.queries.Relational.joinShuffle(spark, sfDir)
      }),
      "q147_base" -> (() => graft.pipeline.TextAnalysis.pmiCollocations(spark, sfDir)),
      "q88_nowiden" -> (() => {
        val pcts = expr("percentile_approx(l_extendedprice, array(0.05D, 0.95D), 10000)")
        val l = li.select(col("l_returnflag"), col("l_extendedprice"))
        val bounds = l.groupBy(col("l_returnflag"))
          .agg(pcts.as("ps"))
          .select(col("l_returnflag"),
            element_at(col("ps"), 1).cast("double").as("p05"),
            element_at(col("ps"), 2).cast("double").as("p95"))
        val clipped = round(least(greatest(col("l_extendedprice"), col("p05")), col("p95")), 2)
        l.join(broadcast(bounds), "l_returnflag")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("l_extendedprice") < col("p05"), 1L).otherwise(0L)).as("n_lo"),
            sum(when(col("l_extendedprice") > col("p95"), 1L).otherwise(0L)).as("n_hi"),
            sum(clipped.cast("decimal(18,2)")).cast("double").as("sum_clipped"))
      }),
      "q88_nowiden_cents" -> (() => {
        val pcts = expr("percentile_approx(l_extendedprice, array(0.05D, 0.95D), 10000)")
        val l = li.select(col("l_returnflag"), col("l_extendedprice"))
        val bounds = l.groupBy(col("l_returnflag"))
          .agg(pcts.as("ps"))
          .select(col("l_returnflag"),
            element_at(col("ps"), 1).cast("double").as("p05"),
            element_at(col("ps"), 2).cast("double").as("p95"))
        val clipped = round(least(greatest(col("l_extendedprice"), col("p05")), col("p95")), 2)
        l.join(broadcast(bounds), "l_returnflag")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("l_extendedprice") < col("p05"), 1L).otherwise(0L)).as("n_lo"),
            sum(when(col("l_extendedprice") > col("p95"), 1L).otherwise(0L)).as("n_hi"),
            graft.queries.Relational.sumUnits(
              graft.queries.Relational.centsL(clipped), 10000L, 100L).as("sum_clipped"))
      }),
      "q146_nowiden" -> (() => {
        def p50(c: String): Column =
          expr(s"percentile_approx($c, 0.5, 10000)").cast("double")
        val l = li.select(col("l_returnflag"), col("l_extendedprice").as("x"))
        val med = l.groupBy(col("l_returnflag")).agg(round(p50("x"), 4).as("med"))
        val dev = l.join(broadcast(med), "l_returnflag")
        val mad = dev.groupBy(col("l_returnflag"))
          .agg(round(p50("abs(x - med)"), 4).as("mad"))
        dev.join(broadcast(mad), "l_returnflag")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            min(col("med")).as("med"),
            min(col("mad")).as("mad"),
            sum(when(abs(col("x") - col("med")) > lit(3 * 1.4826) * col("mad"), 1L)
              .otherwise(0L)).as("n_outliers"))
      }),
      "q147_zip" -> (() => {
        val w = graft.operators.MapWidth.widen(
          graft.pipeline.TokenizedCorpus.withTokens(spark, sfDir))
          .select(col("toks").as("w"))
        val bg = w.filter(size(col("w")) >= 2)
          .select(explode(arrays_zip(
            slice(col("w"), lit(1), size(col("w")) - 1),
            slice(col("w"), lit(2), size(col("w")) - 1))).as("p"))
          .groupBy(col("p.0").as("w1"), col("p.1").as("w2"))
          .agg(count(lit(1)).as("n_ab"))
        bg.agg(sum(col("n_ab")))
      }),
      "q147_transform_only" -> (() => {
        val w = graft.operators.MapWidth.widen(
          graft.pipeline.TokenizedCorpus.withTokens(spark, sfDir))
          .select(col("toks").as("w"))
        val bg = w.filter(size(col("w")) >= 2)
          .select(
            explode(expr("transform(sequence(1, size(w)-1), i -> " +
              "struct(element_at(w, i) AS a, element_at(w, i+1) AS b))")).as("p"))
          .groupBy(col("p.a").as("w1"), col("p.b").as("w2"))
          .agg(count(lit(1)).as("n_ab"))
        bg.agg(sum(col("n_ab")))
      }),
      "q88_approx" -> (() => graft.pipeline.Corpus.winsorize(spark, sfDir, approx = true)),
      "q146_approx" -> (() => graft.pipeline.Corpus.madOutliers(spark, sfDir, approx = true)),
      "q160_bench" -> (() => graft.operators.Graph.pageRank(
        graft.pipeline.Similarity.semanticDedupPairs(spark, sfDir)
          .select(col("vec_a").as("src"), col("vec_b").as("dst")))),
      // r13 candidate: loop frames right-sized to an edge-count-derived
      // partition count (AQE's coalescing is parallelism-first, so it never
      // shrinks the 32 tiny partitions inside the checkpointed loop) + a
      // shuffled-hash join that builds on the rank side and STREAMS the
      // pre-partitioned edge table without re-sorting it every round
      "q160_parts" -> (() => {
        val edges = graft.pipeline.Similarity.semanticDedupPairs(spark, sfDir)
          .select(col("vec_a").as("src"), col("vec_b").as("dst"))
        val iters = 5; val damping = 0.85
        val sym = edges.select(col("src"), col("dst"))
          .union(edges.select(col("dst").as("src"), col("src").as("dst")))
          .localCheckpoint(true)
        val m = sym.count()
        val parts = math.max(2, math.min(
          spark.sparkContext.defaultParallelism, (m / 1000000L).toInt + 1))
        val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
        val nodes = deg.select(col("src").as("node"), col("deg")).persist()
        val n = nodes.count()
        val symd = sym
          .join(nodes.withColumnRenamed("node", "src"), "src")
          .select(col("src"), col("dst"), col("deg"))
          .repartition(parts, col("src"))
          .localCheckpoint(true)
        var rank = nodes.select(col("node"), (lit(1.0) / n).as("p"))
        for (_ <- 1 to iters) {
          val contribs = symd
            .join(rank.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
            .select(col("dst").as("node"), (col("p") / col("deg")).as("c"))
          rank = contribs.repartition(parts, col("node")).groupBy("node")
            .agg(round(lit((1.0 - damping) / n) + lit(damping) * sum(col("c")), 10).as("p"))
            .localCheckpoint()
        }
        rank
      }),
      "q06_base" -> (() => graft.queries.Relational.joinShuffle(spark, sfDir)),
      // the PRE-r13 q32 shape (explode + 60 conditional sums + doc_id
      // shuffle) kept for same-session A/B against the per-row expression
      "q32_explode" -> (() => {
        val d = graft.operators.MapWidth.widen(
          graft.pipeline.TokenizedCorpus.withTokens(spark, sfDir))
        val exploded = d.select(col("doc_id"), explode(col("toks")).as("__w"))
          .withColumn("__h", graft.functions.Md5Prefix60.md5Prefix60(col("__w")))
        val sums = (0 until 60).map(i =>
          sum(when(shiftright(col("__h"), i).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"__b$i"))
        exploded.groupBy(col("doc_id"))
          .agg(sums.head, sums.tail: _*)
          .select(col("doc_id"),
            (0 until 60).map(i =>
              when(col(s"__b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
              .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
          .withColumn("band", shiftrightunsigned(col("simhash"), 60 - 16))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n"), sort_array(collect_list(col("doc_id"))).as("mlist"))
          .filter(col("n") > 1)
          .select(col("band"), col("n"),
            concat_ws(",", col("mlist").cast("array<string>")).as("members"))
      }),
      "q270_base" -> (() => graft.pipeline.Dedup.repeatedSpans(spark, sfDir)),
      "q270_nockpt" -> (() => {
        val w = 8
        val documents = graft.pipeline.TokenizedCorpus.withTokens(spark, sfDir)
        val toksD = documents
          .select(col("doc_id"), col("toks").as("w"))
          .filter(size(col("w")) >= w)
        val grams = toksD.select(col("doc_id"),
          posexplode(expr(
            s"transform(sequence(1, size(w) - ${w - 1}), i -> concat_ws(' ', slice(w, i, $w)))"))
            .as(Seq("off", "gram")))
          .select(col("doc_id"), (col("off") + 1).cast("long").as("pos"),
            graft.functions.Md5Prefix60.md5Prefix60(col("gram")).as("fp"))
        val dup = grams.groupBy(col("fp"))
          .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
          .filter(col("mn") =!= col("mx")).select(col("fp"))
        val hits = grams.join(dup, "fp")
          .select(col("doc_id"), col("pos"), (col("pos") + (w - 1)).as("e"))
        val byDoc = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("pos"))
        hits
          .withColumn("pme", max(col("e")).over(byDoc.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
          .withColumn("ni",
            when(col("pme").isNull || col("pos") > col("pme") + 1, 1L).otherwise(0L))
          .withColumn("island", sum(col("ni")).over(byDoc.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy(col("doc_id"), col("island"))
          .agg(min(col("pos")).as("span_start"), max(col("e")).as("span_end"))
          .select(col("doc_id"), col("span_start"), col("span_end"),
            (col("span_end") - col("span_start") + 1).as("span_tokens"))
      }),
      "q185_base" -> (() => graft.pipeline.Frequency.crossCorpusLeakage(spark, sfDir)),
      // the PRE-r13 rm3FromTable shape (per-call doclen stats aggregate +
      // crossJoin(broadcast)) — same-session A/B against the stats-literal
      // form the operator now uses
      "q203_statsagg" -> (() => {
        val eng = graft.pipeline.TextIndex.engineFor(spark, sfDir)
        graft.GraftExtensions.register(spark)
        import spark.implicits._
        val seed = Seq("spark", "data", "join", "query")
        val stop = Seq("a", "the")
        val k1 = 1.2; val b = 0.75
        val post = eng.scan(graft.pipeline.TextIndex.Db, graft.pipeline.TextIndex.PostingsTable)
          .withColumnRenamed("word", "w")
        val dl = eng.scan(graft.pipeline.TextIndex.Db, graft.pipeline.TextIndex.DoclenTable)
        val g = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
        def bm25(terms: DataFrame): DataFrame = {
          val tf = post.join(broadcast(terms), "w")
          val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
          val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          val termScore = idf * col("tf") * (k1 + 1) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
          tf.join(broadcast(dfreq), "w")
            .join(dl, "doc_id")
            .crossJoin(broadcast(g))
            .select(col("doc_id"),
              round(termScore, 8).cast("decimal(18,8)").as("ts"))
            .groupBy(col("doc_id"))
            .agg(round(sum(col("ts")).cast("double"), 4).as("score"))
        }
        val fb = bm25(seed.toDF("w"))
          .orderBy(col("score").desc, col("doc_id")).limit(10)
        val wgt = post
          .join(broadcast(fb), "doc_id")
          .filter(!col("w").isin((seed ++ stop).map(_.asInstanceOf[Any]): _*))
          .join(dl, "doc_id")
          .select(col("w"),
            (round(col("tf") / col("dl"), 8).cast("decimal(18,8)") *
              col("score").cast("decimal(18,4)")).as("c"))
          .groupBy(col("w")).agg(sum(col("c")).as("wgt"))
        val expTerms = wgt.orderBy(col("wgt").desc, col("w")).limit(5)
          .select(col("w"))
        bm25(expTerms.union(seed.toDF("w")))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(10)
      }),
      "q175_bench" -> (() => graft.pipeline.Frequency.spanScrub(spark, sfDir)),
      // r13 candidate: duplicated-gram detection via groupBy(gram)+join
      // (partial-agg friendly, AQE-broadcastable dup side) instead of
      // min/max window over the gram partition (hot grams buffer in one
      // WindowExec task) — the q270 shape, gram STRINGS kept so the
      // declared string-equality semantics are untouched
      "q175_groupdup" -> (() => {
        val n = 3
        val documents = graft.pipeline.TokenizedCorpus.withTokens(spark, sfDir)
        val base = documents.select(col("doc_id"), col("toks").as("ws"))
        val words = base
          .select(col("doc_id"), size(col("ws")).cast("long").as("n_words"),
            posexplode(col("ws")))
          .select(col("doc_id"), col("n_words"), (col("pos") + 1).as("wpos"),
            col("col").as("word"))
        val grams = base
          .filter(size(col("ws")) >= n)
          .select(col("doc_id"), posexplode(
            transform(sequence(lit(1), size(col("ws")) - (n - 1)),
              i => array_join(slice(col("ws"), i, lit(n)), " "))))
          .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("gram"))
        // no materialization: the dup agg and the join shuffle grams by the
        // SAME key, so the exchange is planned once and reused
        val dup = grams.groupBy(col("gram"))
          .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
          .filter(col("mn") =!= col("mx")).select(col("gram"))
        val covered = grams.join(dup, Seq("gram"))
          .select(col("doc_id"),
            explode(sequence(col("pos"), col("pos") + (n - 1))).as("wpos"))
          .distinct()
        words.join(covered, Seq("doc_id", "wpos"), "left_anti")
          .groupBy(col("doc_id"))
          .agg(max(col("n_words")).as("n_words"),
            count(lit(1)).as("n_kept"),
            array_join(transform(
              array_sort(collect_list(struct(col("wpos"), col("word")))),
              x => x.getField("word")), " ").as("clean_text"))
          .select(col("doc_id"), col("n_words"), col("n_kept"),
            (col("n_words") - col("n_kept")).as("n_removed"), col("clean_text"))
      }),
      "q81_base" -> (() => graft.pipeline.TextAnalysis.repetition(spark, sfDir)),
      "q81_fold" -> (() => {
        val d = graft.operators.MapWidth.widen(
          graft.pipeline.TokenizedCorpus.withTokens(spark, sfDir))
          .filter(col("toks").isNotNull && size(col("toks")) >= 1)
        d.select(col("doc_id"),
            size(col("toks")).cast("long").as("n_words"),
            size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
            expr("""aggregate(array_sort(toks),
              struct(CAST(null AS STRING) AS prev, 0L AS run, 0L AS best),
              (s, x) -> struct(x,
                IF(s.prev <=> x, s.run + 1L, 1L),
                GREATEST(s.best, IF(s.prev <=> x, s.run + 1L, 1L))),
              s -> s.best)""").as("max_cnt"))
          .select(col("doc_id"), col("n_words"), col("n_distinct"),
            ((col("n_words") - col("n_distinct")).cast("double") / col("n_words"))
              .as("dup_ratio"),
            (col("max_cnt").cast("double") / col("n_words")).as("top_word_frac"))
      }),
      "q100_base" -> (() => graft.pipeline.TextAnalysis.diversity(spark, sfDir)),
      "q100_fold" -> (() => {
        val d = graft.operators.MapWidth.widen(
          graft.pipeline.TokenizedCorpus.withTokens(spark, sfDir))
          .filter(col("toks").isNotNull && size(col("toks")) >= 1)
        d.select(col("doc_id"),
            size(col("toks")).cast("long").as("n_words"),
            expr("""aggregate(array_sort(toks),
              struct(CAST(null AS STRING) AS prev, 0L AS run,
                     CAST(array() AS ARRAY<BIGINT>) AS acc),
              (s, x) -> struct(x AS prev,
                IF(s.prev <=> x, s.run + 1L, 1L) AS run,
                IF(s.prev IS NULL OR s.prev = x, s.acc,
                   array_append(s.acc, s.run)) AS acc),
              s -> IF(s.prev IS NULL, s.acc,
                      sort_array(array_append(s.acc, s.run))))""").as("cs"))
          .select(col("doc_id"), col("n_words"),
            size(col("cs")).cast("long").as("n_distinct"), col("cs"))
          .select(col("doc_id"), col("n_words"), col("n_distinct"),
            round(col("n_distinct").cast("double") / col("n_words").cast("double"), 4).as("ttr"),
            round(lit(1.0) - aggregate(col("cs"), lit(0.0), (acc, c) =>
              acc + (c.cast("double") / col("n_words").cast("double")) *
                (c.cast("double") / col("n_words").cast("double"))), 4).as("simpson"))
      }),
      "q171_bench" -> (() =>
        graft.pipeline.Dedup.prefixFilterJoin(spark, sfDir, 0.8, Some("source"))),
      // --- r13 stage attribution for the prefix-filter pipeline: each probe
      // cuts the plan at one stage boundary so deltas between consecutive
      // probes attribute the wall to (ordered build | candidate gen+distinct
      // | verify joins). The `ordered` build matches the current bcast-df
      // operator shape (tokenized-corpus serve + broadcast dfreq).
      "q171_s1_ordered" -> (() => r13Ordered(spark, sfDir)),
      "q171_s2_cand" -> (() => {
        val ordered = r13Ordered(spark, sfDir)
        val prefixes = ordered.select(col("doc_id"), col("blk"), col("sz"),
          explode(slice(col("toks"), lit(1), col("plen"))).as("word"))
        prefixes.select(col("doc_id").as("doc_a"), col("blk"),
            col("word"), col("sz").as("sz_a"))
          .join(prefixes.select(col("doc_id").as("doc_b"), col("blk"),
            col("word"), col("sz").as("sz_b")),
            Seq("word", "blk"))
          .filter(col("doc_a") < col("doc_b") &&
            least(col("sz_a"), col("sz_b")).cast("double") >=
              lit(0.8) * greatest(col("sz_a"), col("sz_b")).cast("double") - lit(1e-9))
          .select(col("doc_a"), col("doc_b")).distinct()
      }),
      "q260_bench" -> (() =>
        graft.pipeline.Dedup.containmentJoin(spark, sfDir, 0.9, Some("source"))),
      // the PRE-r12 shape (groupBy+join document frequency) kept for
      // same-session A/B against the adopted window form
      "q171_joindf" -> (() => {
        val documents = spark.read.parquet(s"$sfDir/documents.parquet")
        val threshold = 0.8
        val blk = col("source")
        val tok = documents
          .select(col("doc_id"), blk.as("blk"),
            explode(array_distinct(split(trim(lower(col("text"))), "\\s+"))).as("word"))
        val dfreq = tok.groupBy(col("word")).agg(count(lit(1)).as("df"))
        val ordered = tok.join(dfreq, Seq("word"))
          .groupBy(col("doc_id"), col("blk"))
          .agg(sort_array(collect_list(struct(col("df"), col("word")))).as("ts"))
          .select(col("doc_id"), col("blk"),
            transform(col("ts"), t => t.getField("word")).as("toks"),
            sort_array(transform(col("ts"), t => t.getField("word"))).as("stoks"),
            size(col("ts")).as("sz"))
          .withColumn("plen",
            col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)).cast("int") + 1)
          .localCheckpoint(true)
        val prefixes = ordered.select(col("doc_id"), col("blk"), col("sz"),
          explode(slice(col("toks"), lit(1), col("plen"))).as("word"))
        val cand = prefixes.select(col("doc_id").as("doc_a"), col("blk"),
            col("word"), col("sz").as("sz_a"))
          .join(prefixes.select(col("doc_id").as("doc_b"), col("blk"),
            col("word"), col("sz").as("sz_b")),
            Seq("word", "blk"))
          .filter(col("doc_a") < col("doc_b") &&
            least(col("sz_a"), col("sz_b")).cast("double") >=
              lit(threshold) * greatest(col("sz_a"), col("sz_b")).cast("double") - lit(1e-9))
          .select(col("doc_a"), col("doc_b")).distinct()
        val ratio = col("inter").cast("double") /
          (col("la") + col("lb") - col("inter")).cast("double")
        cand
          .join(ordered.select(col("doc_id").as("doc_a"), col("stoks").as("ta"),
            col("sz").as("la")), Seq("doc_a"))
          .join(ordered.select(col("doc_id").as("doc_b"), col("stoks").as("tb"),
            col("sz").as("lb")), Seq("doc_b"))
          .withColumn("inter", graft.functions.SortedIntersectCount
            .sortedIntersectCount(col("ta"), col("tb")))
          .filter(ratio >= threshold)
          .select(col("doc_a"), col("doc_b"), round(ratio, 4).as("jaccard"))
      }),
      // window-attached document frequency: count().over(partitionBy(word))
      // replaces the dfreq groupBy + word-keyed join — one corpus-wide
      // shuffle fewer in the ordered-token build
      "q171_windf" -> (() => {
        val documents = spark.read.parquet(s"$sfDir/documents.parquet")
        val threshold = 0.8
        val blk = col("source")
        val tok = documents
          .select(col("doc_id"), blk.as("blk"),
            explode(array_distinct(split(trim(lower(col("text"))), "\\s+"))).as("word"))
        val wdf = org.apache.spark.sql.expressions.Window.partitionBy(col("word"))
        val ordered = tok
          .withColumn("df", count(lit(1)).over(wdf))
          .groupBy(col("doc_id"), col("blk"))
          .agg(sort_array(collect_list(struct(col("df"), col("word")))).as("ts"))
          .select(col("doc_id"), col("blk"),
            transform(col("ts"), t => t.getField("word")).as("toks"),
            sort_array(transform(col("ts"), t => t.getField("word"))).as("stoks"),
            size(col("ts")).as("sz"))
          .withColumn("plen",
            col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)).cast("int") + 1)
          .localCheckpoint(true)
        val prefixes = ordered.select(col("doc_id"), col("blk"), col("sz"),
          explode(slice(col("toks"), lit(1), col("plen"))).as("word"))
        val cand = prefixes.select(col("doc_id").as("doc_a"), col("blk"),
            col("word"), col("sz").as("sz_a"))
          .join(prefixes.select(col("doc_id").as("doc_b"), col("blk"),
            col("word"), col("sz").as("sz_b")),
            Seq("word", "blk"))
          .filter(col("doc_a") < col("doc_b") &&
            least(col("sz_a"), col("sz_b")).cast("double") >=
              lit(threshold) * greatest(col("sz_a"), col("sz_b")).cast("double") - lit(1e-9))
          .select(col("doc_a"), col("doc_b")).distinct()
        val ratio = col("inter").cast("double") /
          (col("la") + col("lb") - col("inter")).cast("double")
        cand
          .join(ordered.select(col("doc_id").as("doc_a"), col("stoks").as("ta"),
            col("sz").as("la")), Seq("doc_a"))
          .join(ordered.select(col("doc_id").as("doc_b"), col("stoks").as("tb"),
            col("sz").as("lb")), Seq("doc_b"))
          .withColumn("inter", graft.functions.SortedIntersectCount
            .sortedIntersectCount(col("ta"), col("tb")))
          .filter(ratio >= threshold)
          .select(col("doc_a"), col("doc_b"), round(ratio, 4).as("jaccard"))
      }),
    )

    // --explain-ordered: print the ordered-token BUILD plans (join-df vs
    // window-df) that the eager localCheckpoint otherwise hides from
    // Explain — the plan evidence for the r12 df-attach rewrite.
    if (args.headOption.contains("--explain-ordered")) {
      val documents = spark.read.parquet(s"$sfDir/documents.parquet")
      val tok = documents.select(col("doc_id"), col("source").as("blk"),
        explode(array_distinct(split(trim(lower(col("text"))), "\\s+"))).as("word"))
      def orderedOf(withDf: DataFrame): DataFrame = withDf
        .groupBy(col("doc_id"), col("blk"))
        .agg(sort_array(collect_list(struct(col("df"), col("word")))).as("ts"))
        .select(col("doc_id"), col("blk"),
          transform(col("ts"), t => t.getField("word")).as("toks"),
          sort_array(transform(col("ts"), t => t.getField("word"))).as("stoks"),
          size(col("ts")).as("sz"))
      println("\n========== ordered_build_joindf (pre-r12) ==========")
      val dfreq = tok.groupBy(col("word")).agg(count(lit(1)).as("df"))
      orderedOf(tok.join(dfreq, Seq("word"))).explain("formatted")
      println("\n========== ordered_build_windf (r12) ==========")
      val wdf = org.apache.spark.sql.expressions.Window.partitionBy(col("word"))
      orderedOf(tok.withColumn("df", count(lit(1)).over(wdf))).explain("formatted")
      println("\n========== ordered_build_bcastdf (r13, adopted) ==========")
      orderedOf(tok.join(broadcast(dfreq), Seq("word"))).explain("formatted")
      println("\n========== verify_join_cached_ordered (r13, adopted) ==========")
      // the verify-stage plan over the PERSISTED ordered table — shows the
      // planner choosing the join strategy from real InMemoryRelation stats
      graft.pipeline.Dedup.prefixFilterJoin(spark, sfDir, 0.8, Some("source"))
        .explain("formatted")
      spark.stop()
      return
    }
    // any declared query (bench form when one exists) is probe-able by name:
    // "bench:q187_ann_index_served" times exactly what the bench times
    def benchThunk(q: String): () => DataFrame = () =>
      SparkEntry.benchVariants.getOrElse(q, SparkEntry.queries(q))(spark, sfDir)
    def resolve(n: String): () => DataFrame =
      if (n.startsWith("bench:")) benchThunk(n.stripPrefix("bench:"))
      else variants(n)

    val names = if (args.nonEmpty) args.toSeq else variants.keys.toSeq.sorted
    // conf snapshot/restore per variant: a thunk that twiddles session conf
    // (q06_shj's preferSortMergeJoin) must not contaminate the variants
    // timed after it — the whole point of the probe is trustworthy A/Bs
    val guarded = Seq("spark.sql.join.preferSortMergeJoin")
    names.foreach { n =>
      val q = resolve(n)
      val saved = guarded.map(k => k -> spark.conf.getOption(k))
      def once(): Double = {
        val t0 = System.nanoTime()
        q().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        once() // warm-up
        val ts = (1 to 3).map(_ => once()).sorted
        println(f"[optprobe] $n%-22s median=${ts(1)}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    spark.stop()
  }
}
