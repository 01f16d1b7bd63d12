package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Frequency-domain corpus operators: exact heavy hitters through a
  * Misra–Gries candidate sketch, duplicated-passage statistics, and
  * sketch-based set-intersection cardinality. All three are shapes a
  * training-data pipeline runs over the full corpus, so each is built to
  * keep the corpus-sized side map-local and shuffle only candidate- or
  * group-sized data.
  */
object Frequency {

  /** Token-array column — the ONE shared [[TokenizedCorpus.tokensOrSplit]]
    * helper (cache reuse or inline split).
    */
  private def tokArr(df: DataFrame) = TokenizedCorpus.tokensOrSplit(df)

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Exact heavy hitters (tokens with frequency > N/(cap+1)) in two scans,
    * no full-vocabulary shuffle.
    *
    * Pass 1 is a map-only Misra–Gries summary per partition (capacity
    * `cap`): any token with GLOBAL count > N/(cap+1) must exceed
    * n_p/(cap+1) in at least one partition (the thresholds sum to
    * N/(cap+1)), so the union of per-partition summaries is a guaranteed
    * superset of the heavy set — at most cap × numPartitions candidate
    * rows leave the mappers, never the vocabulary. The same pass folds the
    * partition token totals into sentinel rows, so N costs no extra scan.
    *
    * Pass 2 confirms exactly: a broadcast semi-join restricts the token
    * stream to candidates (map-side), then a grouped count + the N/(cap+1)
    * filter yields the TRUE heavy set with TRUE counts — output is
    * deterministic and partitioning-independent even though the sketch
    * isn't, which is what makes an exact SQL oracle possible for a sketch
    * algorithm. At 100 TB this is the standard shape: the vocabulary is
    * too big to groupBy, the heavy set is tiny, and two scans beat one
    * vocabulary-sized shuffle.
    */
  def heavyHitters(spark: SparkSession, dir: String, cap: Int = 29): DataFrame =
    heavyHittersOf(TokenizedCorpus.withTokens(spark, dir)
      .select(explode(col(TokenizedCorpus.TokCol)).as("word")), cap)

  /** Core of [[heavyHitters]] over any single-column `word` frame. */
  def heavyHittersOf(tokens: DataFrame, cap: Int): DataFrame = {
    import tokens.sparkSession.implicits._

    val summaries = tokens.as[String].mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      var total = 0L
      while (it.hasNext) {
        val w = it.next(); total += 1L
        counts.get(w) match {
          case Some(c) => counts.update(w, c + 1L)
          case None if counts.size < cap => counts.update(w, 1L)
          case None =>
            // decrement-all step: every tracked count drops by one, zeros
            // evicted — the classic O(cap) amortized-O(1) MG step
            counts.toList.foreach { case (k, c) =>
              if (c == 1L) counts.remove(k) else counts.update(k, c - 1L)
            }
        }
      }
      counts.keysIterator.map(w => (w, 0L)) ++ Iterator((null: String, total))
    }.toDF("word", "cnt").persist()

    val candidates = summaries.filter(col("word").isNotNull).select("word").distinct()
    val nTotal = summaries.filter(col("word").isNull).agg(sum(col("cnt")).as("n_total"))

    tokens.join(broadcast(candidates), Seq("word"), "left_semi")
      .groupBy(col("word")).agg(count(lit(1)).as("n_occurrences"))
      .crossJoin(broadcast(nTotal))
      .filter(col("n_occurrences") * (cap + 1) > col("n_total"))
      .select(col("word"), col("n_occurrences"))
  }

  /** Per-document duplicated-passage statistics: how many of a document's
    * distinct word n-grams also occur in at least one OTHER document. The
    * passage-level complement to whole-document dedup (q30) and bag-level
    * Jaccard (q33): boilerplate and templated spans show up here even when
    * no document pair is a near-duplicate.
    *
    * Within-doc gram dedup happens map-side (`array_distinct` BEFORE the
    * explode), so the gram stream carries one row per (doc, gram). Cross-doc
    * sharing is a count over a gram-partitioned window, then the per-doc
    * rollup — two grouped shuffles, no join and no gram-set broadcast
    * (the shared-gram set is corpus-sized at 100 TB; a window keeps it
    * distributed). Counts stay integral end-to-end, so the oracle hash has
    * no float surface.
    */
  def dupPassages(spark: SparkSession, dir: String, n: Int = 3): DataFrame =
    dupPassagesOf(TokenizedCorpus.withTokens(spark, dir), n)

  /** Core of [[dupPassages]] over any (doc_id, text) frame. */
  def dupPassagesOf(documents: DataFrame, n: Int): DataFrame = {
    val ws = tokArr(documents)
    val grams = documents
      .select(col("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("ws")) - n),
          i => array_join(slice(col("ws"), i + lit(1), lit(n)), " ")))).as("gram"))
    val perGram = Window.partitionBy(col("gram"))
    grams.withColumn("nd", count(lit(1)).over(perGram))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
  }

  /** Sketch-based set-intersection cardinality: |A ∩ B| estimated by
    * inclusion–exclusion over mergeable HLL sketches (est(A) + est(B) −
    * est(A ∪ B)) — the only way to intersect HLLs, since the sketch itself
    * only unions. At 100 TB the two key sets never co-shuffle: each side
    * folds to one lgK=14 sketch (16 KB) and the union is a sketch merge.
    * The query emits the EXACT intersection (hash-checked by the oracle)
    * plus the sketch verdict: the inclusion–exclusion estimate must land
    * within 15% of exact — wider than a single sketch's ~0.8% because
    * subtraction amplifies relative error when the intersection is small
    * against the union.
    */
  def hllIntersect(spark: SparkSession, dir: String): DataFrame = {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val a = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val exact = a.intersect(b).agg(count(lit(1)).as("exact_intersection"))
    val ests = o.filter(col("o_orderstatus").isin("O", "F"))
      .groupBy(col("o_orderstatus"))
      .agg(expr("hll_sketch_agg(o_custkey, 14)").as("sk"))
      .agg(sum(expr("hll_sketch_estimate(sk)")).as("sum_est"),
        expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_union"))
    exact.crossJoin(broadcast(ests))
      .select(lit("hll_intersect").as("metric"),
        col("exact_intersection"),
        (abs(col("sum_est") - col("est_union") - col("exact_intersection")) <=
          col("exact_intersection") * 0.15).as("ok"))
  }

  /** Count–Min sketch frequency estimation: a d×w counter matrix where
    * row i counts tokens by `md5_prefix60(i || ':' || token) mod w`, and a
    * key's estimate is the MIN over its d cells. The sketch is the
    * frequency-domain sibling of HLL (q131): fixed O(d·w) space no matter
    * the corpus size, mergeable by cell-wise addition, one-sided error
    * (estimate ≥ truth always; over-estimate ≤ εN with probability 1−δ for
    * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
    *
    * Scale shape: building the matrix is ONE token scan exploded ×d into a
    * grouped count — partial aggregation caps every mapper's shuffle output
    * at d·w rows (8 KB here) regardless of input size, and the finished
    * matrix broadcasts for probing. The probe set is the exact heavy set
    * (reusing [[heavyHittersOf]]'s two-scan shape), so the query emits
    * (exact, estimate) side by side with the one-sided-error verdict — and
    * because the hash is the portable md5 prefix, DuckDB replays the WHOLE
    * sketch cell-for-cell: the estimate column is hash-checked, not just
    * bounded.
    */
  def countMinSketch(spark: SparkSession, dir: String, d: Int = 4, w: Int = 512): DataFrame = {
    val tokens = TokenizedCorpus.withTokens(spark, dir)
      .select(explode(col(TokenizedCorpus.TokCol)).as("word"))
    countMinOf(tokens, heavyHittersOf(tokens, 29), d, w)
  }

  /** Core of [[countMinSketch]]: build the d×w matrix over `tokens` and
    * probe it with `probes` (word, n_occurrences).
    */
  def countMinOf(tokens: DataFrame, probes: DataFrame, d: Int, w: Int): DataFrame =
    cmsProbe(cmsCells(tokens, d, w), probes, d, w)

  private def cmsBucket(word: org.apache.spark.sql.Column,
                        i: org.apache.spark.sql.Column, w: Int) =
    pmod(graft.functions.Md5Prefix60.md5Prefix60(
      concat(i.cast("string"), lit(":"), word)), lit(w.toLong))

  /** The d×w CMS matrix of a token stream — also the per-load partial an
    * Aggregate-model engine table ingests (q184): CMS cells are counts, so
    * the matrix of a corpus = Sum-merge of its loads' matrices.
    */
  def cmsCells(tokens: DataFrame, d: Int, w: Int): DataFrame =
    tokens
      .select(col("word"), explode(sequence(lit(0), lit(d - 1))).as("i"))
      .select(col("i"), cmsBucket(col("word"), col("i"), w).as("bucket"))
      .groupBy(col("i"), col("bucket")).agg(count(lit(1)).as("cell"))

  /** Probe a CMS matrix (however it was built/merged/served) with
    * (word, n_occurrences) probes.
    */
  def cmsProbe(cells: DataFrame, probes: DataFrame, d: Int, w: Int): DataFrame =
    probes
      .select(col("word"), col("n_occurrences").as("n_exact"),
        explode(sequence(lit(0), lit(d - 1))).as("i"))
      .withColumn("bucket", cmsBucket(col("word"), col("i"), w))
      .join(broadcast(cells), Seq("i", "bucket"))
      .groupBy(col("word"), col("n_exact"))
      .agg(min(col("cell")).as("n_cms"))
      .select(col("word"), col("n_exact"), col("n_cms"),
        (col("n_cms") >= col("n_exact")).as("ok"))

  /** Maximal duplicated-span extraction — the substring-level exact dedup
    * of "Deduplicating Training Data Makes Language Models Better" (Lee et
    * al. 2022), re-expressed for Spark: instead of a suffix array, seed with
    * word n-grams that occur in MORE THAN ONE document, then merge runs of
    * consecutive duplicated gram positions into maximal spans per document
    * (the gaps-and-islands trick: pos − row_number is constant within a
    * run). q154 counts how MUCH of a doc is shared; this emits the actual
    * spans a dedup pass would cut — count, longest, and total span words
    * per doc.
    *
    * Scale shape: two shuffles — one gram-keyed window to decide
    * cross-doc sharing (min(doc)≠max(doc) over the gram partition stands in
    * for COUNT(DISTINCT doc)>1 at window cost), then one doc-keyed window +
    * grouped rollup for the islands. No joins, no gram-set broadcast; the
    * shared-gram set stays distributed (it is corpus-sized at 100 TB).
    * Adjacent spans closer than n−1 words overlap in word space;
    * span_word_sum counts both coverages by design (both engines compute
    * the same formula).
    */
  def dupSpans(spark: SparkSession, dir: String, n: Int = 3): DataFrame =
    dupSpansOf(TokenizedCorpus.withTokens(spark, dir), n)

  /** Core of [[dupSpans]] over any (doc_id, text) frame. */
  def dupSpansOf(documents: DataFrame, n: Int): DataFrame = {
    val ws = tokArr(documents)
    val grams = documents
      .select(col("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(1), size(col("ws")) - (n - 1)),
          i => array_join(slice(col("ws"), i, lit(n)), " "))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("gram"))

    val perGram = Window.partitionBy(col("gram"))
    val dup = grams
      .withColumn("mn", min(col("doc_id")).over(perGram))
      .withColumn("mx", max(col("doc_id")).over(perGram))
      .filter(col("mn") =!= col("mx"))
      .select(col("doc_id"), col("pos"))

    val perDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dup.withColumn("grp", col("pos") - row_number().over(perDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg((count(lit(1)) + (n - 1)).as("span_words"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        max(col("span_words")).as("longest_span"),
        sum(col("span_words")).as("span_word_sum"))
  }

  /** Cross-corpus duplicated-span detection (q185) — [[dupSpans]] pointed at
    * EVAL INTEGRITY: q79's decontamination asks "does a test n-gram appear
    * in train at all"; this asks the substring-level question the Lee et
    * al. pipeline raises — WHERE and HOW MUCH of each test document is
    * verbatim-covered by training text. Emits, per leaked test doc, the
    * maximal leaked spans (gaps-and-islands over positions whose n-gram
    * occurs anywhere in train) plus the EXACT leaked-word fraction
    * (distinct covered positions / doc words) — the number a benchmark
    * card should report.
    *
    * Scale shape: one gram-keyed window over the union of both sides'
    * gram streams (a conditional max stands in for the membership join —
    * the train gram set is corpus-sized at 100 TB and must never
    * broadcast), then doc-keyed islands + rollups on the test side only.
    * Same two-shuffle budget as [[dupSpans]].
    */
  def crossCorpusLeakage(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val d = TokenizedCorpus.withTokens(spark, dir)
    crossCorpusLeakageOf(
      d.filter(col("doc_id") % 10 =!= 0), d.filter(col("doc_id") % 10 === 0), n)
  }

  /** Core of [[crossCorpusLeakage]] over any (doc_id, text) frames. */
  def crossCorpusLeakageOf(train: DataFrame, test: DataFrame, n: Int): DataFrame = {
    def grams(df: DataFrame, side: Int) = df
      .select(col("doc_id"), tokArr(df).as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(1), size(col("ws")) - (n - 1)),
          i => array_join(slice(col("ws"), i, lit(n)), " "))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        col("col").as("gram"), lit(side).as("side"))

    val perGram = Window.partitionBy(col("gram"))
    // leaked feeds TWO consumers (the span islands and the distinct-coverage
    // count); without materialization each re-runs the corpus-wide gram
    // window above. The materialized form is the small test-side dup
    // position set (optimization r12). SIDE-EFFECTING BUILDER: the eager
    // checkpoint runs those jobs at construction time (see
    // TextAnalysis.pmiCollocations for the shared caveat).
    val leaked = grams(train, 0).unionByName(grams(test, 1))
      .withColumn("has_train",
        max(when(col("side") === 0, 1).otherwise(0)).over(perGram))
      .filter(col("side") === 1 && col("has_train") === 1)
      .select(col("doc_id"), col("pos"))
      .localCheckpoint(true)

    val perDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = leaked
      .withColumn("grp", col("pos") - row_number().over(perDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg((count(lit(1)) + (n - 1)).as("span_words"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), max(col("span_words")).as("longest_span"))
    // exact coverage: DISTINCT covered positions (span sums double-count
    // overlapping spans; a leak fraction must not)
    val covered = leaked
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("wpos"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("leaked_words"))

    test.select(col("doc_id"), size(tokArr(test)).cast("long").as("n_words"))
      .join(spans, Seq("doc_id"))
      .join(covered, Seq("doc_id"))
      .select(col("doc_id"), col("n_spans"), col("longest_span"),
        col("leaked_words"), col("n_words"),
        round(col("leaked_words").cast("double") /
          col("n_words").cast("double"), 4).as("leak_frac"))
  }

  /** Duplicated-span SCRUB — the cut step that completes [[dupSpans]]'s
    * detect step (together they are the Lee et al. 2022 substring-dedup
    * pipeline): every word position covered by a cross-doc-duplicated
    * n-gram is removed, and the surviving words reassemble into the
    * cleaned text in original order. Documents whose every word is covered
    * drop out entirely (nothing survives to emit), exactly like a dedup
    * pass that deletes the whole document.
    *
    * Scale shape: [[dupSpans]]'s gram-window shuffle decides coverage; the
    * covered-position set explodes n rows per dup gram and dedups by
    * (doc, pos) — doc-keyed, partial-agg friendly; removal is a doc+pos
    * anti-join (both sides already doc-keyed); reassembly is one grouped
    * collect over word positions, bounded by document length (the same
    * per-doc bound q89's chunk assembly rides on). No step is ever
    * corpus-quadratic — the scrub costs O(corpus + dup mass).
    */
  def spanScrub(spark: SparkSession, dir: String, n: Int = 3): DataFrame =
    spanScrubOf(TokenizedCorpus.withTokens(spark, dir), n)

  /** Core of [[spanScrub]] over any (doc_id, text) frame. */
  def spanScrubOf(documents: DataFrame, n: Int): DataFrame = {
    val ws = tokArr(documents)
    val base = documents.select(col("doc_id"), ws.as("ws"))
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
    val perGram = Window.partitionBy(col("gram"))
    val covered = grams
      .withColumn("mn", min(col("doc_id")).over(perGram))
      .withColumn("mx", max(col("doc_id")).over(perGram))
      .filter(col("mn") =!= col("mx"))
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
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q153_heavy_hitters" -> ((s: SparkSession, d: String) => heavyHitters(s, d)),
    "q154_dup_passages" -> ((s: SparkSession, d: String) => dupPassages(s, d)),
    "q155_hll_intersect" -> ((s: SparkSession, d: String) => hllIntersect(s, d)),
    "q169_count_min" -> ((s: SparkSession, d: String) => countMinSketch(s, d)),
    "q170_dup_spans" -> ((s: SparkSession, d: String) => dupSpans(s, d)),
    "q175_span_scrub" -> ((s: SparkSession, d: String) => spanScrub(s, d)),
    "q185_cross_corpus_leakage" ->
      ((s: SparkSession, d: String) => crossCorpusLeakage(s, d)),
  )

  /** q153's oracle is the definitionally-exact heavy set — the MG sketch is
    * candidate generation only, so a plain GROUP BY/HAVING reproduces the
    * output exactly. q154 keeps every column integral (the q32 lesson:
    * DuckDB widens sum() to HUGEINT, hence the CAST). q155 pins the exact
    * intersection value plus the sketch-accuracy verdict (the HLL fold
    * itself is not SQL-expressible, same contract pattern as q50/q151).
    */
  def oracles: Map[String, String] = Map(
    "q153_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        |           FROM documents)
        |SELECT word, count(*) AS n_occurrences FROM t GROUP BY word
        |HAVING count(*) * 30 > (SELECT count(*) FROM t)""".stripMargin,
    "q154_dup_passages" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
        |           FROM documents),
        |g AS (SELECT DISTINCT doc_id,
        |        unnest(list_transform(range(1, len(ws) - 1),
        |          i -> array_to_string(ws[i:i+2], ' '))) AS gram
        |      FROM w WHERE len(ws) >= 3),
        |d AS (SELECT doc_id, count(*) OVER (PARTITION BY gram) AS nd FROM g)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        |FROM d GROUP BY doc_id""".stripMargin,
    "q155_hll_intersect" ->
      """SELECT 'hll_intersect' AS metric,
        |  (SELECT count(*) FROM
        |    (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |     INTERSECT
        |     SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'))
        |    AS exact_intersection,
        |  true AS ok""".stripMargin,
    // q169: DuckDB replays the ENTIRE CMS matrix cell-for-cell (the hash is
    // the portable md5 prefix), so n_cms is hash-verified, not just bounded.
    "q169_count_min" -> countMinOracleSql,
  ) ++ moreOracles

  /** q169's oracle — shared verbatim by q184, whose Spark side serves the
    * SAME matrix from the engine's Aggregate-model table (Sum-merged across
    * two MVCC loads): one oracle, two derivations, like q178/q182/q183.
    */
  private[graft] val countMinOracleSql: String =
      """WITH t AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        |           FROM documents),
        |cells AS (
        |  SELECT i, CAST(('0x' || substr(md5(i::VARCHAR || ':' || word), 1, 15)) AS BIGINT) % 512 AS bucket,
        |         count(*) AS cell
        |  FROM t, range(0, 4) r(i) GROUP BY 1, 2),
        |probes AS (
        |  SELECT word, count(*) AS n_exact FROM t GROUP BY word
        |  HAVING count(*) * 30 > (SELECT count(*) FROM t)),
        |e AS (
        |  SELECT p.word, p.n_exact, min(c.cell) AS n_cms
        |  FROM probes p CROSS JOIN range(0, 4) r(i)
        |  JOIN cells c ON c.i = r.i
        |   AND c.bucket = CAST(('0x' || substr(md5(r.i::VARCHAR || ':' || p.word), 1, 15)) AS BIGINT) % 512
        |  GROUP BY 1, 2)
        |SELECT word, n_exact, n_cms, n_cms >= n_exact AS ok FROM e""".stripMargin

  private val moreOracles: Map[String, String] = Map(
    // q185: the train-gram membership is a plain IN-subquery in SQL; the
    // Spark side computes the same membership as a windowed conditional max
    // (the train gram set must never broadcast at scale). n = 3 unrolled.
    "q185_cross_corpus_leakage" ->
      """WITH w AS (SELECT doc_id, doc_id % 10 = 0 AS is_test,
        |             string_split_regex(trim(lower(text)), '\s+') AS ws
        |           FROM documents),
        |g AS (SELECT doc_id, is_test, unnest(range(1, len(ws) - 1)) AS pos, ws
        |      FROM w WHERE len(ws) >= 3),
        |g2 AS (SELECT doc_id, is_test, pos,
        |         ws[pos] || ' ' || ws[pos+1] || ' ' || ws[pos+2] AS gram FROM g),
        |l AS (SELECT doc_id, pos FROM g2
        |      WHERE is_test AND gram IN (SELECT gram FROM g2 WHERE NOT is_test)),
        |i AS (SELECT doc_id, pos,
        |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |      FROM l),
        |s AS (SELECT doc_id, grp, count(*) + 2 AS span_words FROM i GROUP BY 1, 2),
        |sp AS (SELECT doc_id, count(*) AS n_spans, max(span_words) AS longest_span
        |       FROM s GROUP BY doc_id),
        |c AS (SELECT DISTINCT doc_id, pos + o AS wpos FROM l, range(0, 3) r(o)),
        |cw AS (SELECT doc_id, count(*) AS leaked_words FROM c GROUP BY doc_id),
        |nw AS (SELECT doc_id, len(ws) AS n_words FROM w WHERE is_test)
        |SELECT sp.doc_id, sp.n_spans, sp.longest_span, cw.leaked_words,
        |  nw.n_words,
        |  round(CAST(cw.leaked_words AS DOUBLE) / nw.n_words, 4) AS leak_frac
        |FROM sp JOIN cw USING (doc_id) JOIN nw USING (doc_id)""".stripMargin,
    // q170: n = 3 unrolled (ws[pos..pos+2], count(*) + 2).
    "q170_dup_spans" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
        |           FROM documents),
        |g AS (SELECT doc_id, unnest(range(1, len(ws) - 1)) AS pos, ws
        |      FROM w WHERE len(ws) >= 3),
        |g2 AS (SELECT doc_id, pos, ws[pos] || ' ' || ws[pos+1] || ' ' || ws[pos+2] AS gram FROM g),
        |d AS (SELECT doc_id, pos,
        |        min(doc_id) OVER (PARTITION BY gram) AS mn,
        |        max(doc_id) OVER (PARTITION BY gram) AS mx
        |      FROM g2),
        |i AS (SELECT doc_id, pos,
        |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |      FROM d WHERE mn <> mx),
        |s AS (SELECT doc_id, grp, count(*) + 2 AS span_words FROM i GROUP BY 1, 2)
        |SELECT doc_id, count(*) AS n_spans, max(span_words) AS longest_span,
        |  CAST(sum(span_words) AS BIGINT) AS span_word_sum
        |FROM s GROUP BY doc_id""".stripMargin,
    // q175: n = 3 unrolled like q170; docs with every word covered drop out
    // of BOTH sides (no kept rows survive the anti join)
    "q175_span_scrub" ->
      """WITH w0 AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
        |            FROM documents),
        |wd AS (SELECT doc_id, len(ws) AS n_words, unnest(range(1, len(ws) + 1)) AS wpos, ws
        |       FROM w0),
        |words AS (SELECT doc_id, n_words, wpos, ws[wpos] AS word FROM wd),
        |g AS (SELECT doc_id, unnest(range(1, len(ws) - 1)) AS pos, ws
        |      FROM w0 WHERE len(ws) >= 3),
        |g2 AS (SELECT doc_id, pos, ws[pos] || ' ' || ws[pos+1] || ' ' || ws[pos+2] AS gram FROM g),
        |d AS (SELECT doc_id, pos,
        |        min(doc_id) OVER (PARTITION BY gram) AS mn,
        |        max(doc_id) OVER (PARTITION BY gram) AS mx
        |      FROM g2),
        |cov AS (SELECT DISTINCT doc_id, wpos FROM
        |          (SELECT doc_id, unnest(range(pos, pos + 3)) AS wpos
        |           FROM d WHERE mn <> mx)),
        |kept AS (SELECT w.doc_id, w.n_words, w.wpos, w.word FROM words w
        |         ANTI JOIN cov c ON w.doc_id = c.doc_id AND w.wpos = c.wpos)
        |SELECT doc_id, max(n_words) AS n_words, count(*) AS n_kept,
        |  max(n_words) - count(*) AS n_removed,
        |  string_agg(word, ' ' ORDER BY wpos) AS clean_text
        |FROM kept GROUP BY doc_id""".stripMargin,
  )
}
