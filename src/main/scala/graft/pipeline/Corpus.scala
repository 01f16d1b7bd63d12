package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-preparation operators for training-data pipelines, beyond the
  * per-document text statistics in [[TextAnalysis]]: deterministic dataset
  * splits, n-gram vocabulary mining, pattern scrub/redaction, length
  * binning, per-group top-k selection, blocked edit-distance pairing, and
  * distribution quantiles. Everything is codegen'd built-ins over the
  * `documents`/`part` tables — no UDFs, no driver-side data movement — so
  * each operator is a straight map/shuffle pipeline at 100 TB.
  */
object Corpus {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Token-array column for a documents frame — the ONE shared
    * [[TokenizedCorpus.tokensOrSplit]] helper (cache reuse or inline split).
    */
  private def tokArr(df: DataFrame): Column = TokenizedCorpus.tokensOrSplit(df)

  /** Deterministic train/val/test split: md5(doc_id) maps each document to a
    * stable bucket in [0,100) — 80/10/10. Hash-based (not random) splits are
    * the reproducibility contract of a data pipeline: re-runs, backfills and
    * incremental loads all route a given document identically, with no state
    * and no shuffle beyond the final tiny summary aggregate.
    */
  def hashSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket =
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    docs(spark, dir)
      .select(col("doc_id"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
          .as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
  }

  /** Corpus-wide top-k bigrams: per-document bigram generation is a pure map
    * (array transform over the word array, no join), then one count shuffle.
    * Ties at the cutoff break lexicographically so the result is total-order
    * deterministic.
    */
  def ngramTopK(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val d = TokenizedCorpus.withTokens(spark, dir)
      .select(col(TokenizedCorpus.TokCol).as("w"))
    val bigrams = when(size(col("w")) >= 2,
      expr("transform(sequence(1, size(w)-1), i -> concat(element_at(w, i), ' ', element_at(w, i+1)))"))
      .otherwise(array())
    d.select(explode(bigrams).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(k)
  }

  /** Pattern frequency per document: match counts and first occurrence for a
    * regex family — the shape of boilerplate/spam-marker scanning.
    */
  def regexpCounts(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      regexp_count(col("text"), lit("tab[a-z]*")).as("n_tab"),
      regexp_count(col("text"), lit("\\b(fast|slow)\\b")).as("n_speed"),
      regexp_extract(col("text"), "tab[a-z]*", 0).as("first_tab"))

  /** Scrub/redaction pass: replace a pattern family globally, emit the
    * fingerprint + length of the scrubbed text and how many characters were
    * removed — the PII-redaction shape (here aimed at stopwords, since the
    * synthetic corpus carries no emails/phones) with verifiable output.
    */
  def redactScrub(spark: SparkSession, dir: String): DataFrame = {
    val pat = "\\b(the|a|of|to)\\b"
    val scrubbed = regexp_replace(col("text"), pat, "_")
    docs(spark, dir).select(
      col("doc_id"),
      md5(scrubbed).as("scrub_md5"),
      length(scrubbed).as("scrub_len"),
      (length(col("text")) - length(regexp_replace(col("text"), pat, "")))
        .as("removed_chars"))
  }

  /** Document-length histogram: fixed-width 100-char bins. */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(floor(col("n_chars") / lit(100.0)).cast("long").as("bin"),
        col("n_chars"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))

  /** Top-5 documents per language by quality score — per-group selection is
    * one window over the (lang)-partitioned shuffle; the score reuses
    * [[TextAnalysis.qualityScore]] so ranking and filtering agree.
    */
  def langQualityTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    // quality is computed inline (shared Column expressions) — one scan, one
    // lang-partitioned window shuffle, no self-join back to the corpus
    val q = docs(spark, dir)
      .select(col("lang"), col("doc_id"), TextAnalysis.qualityCol.as("quality"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality").desc, col("doc_id"))
    q.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("lang"), col("doc_id"), col("quality"), col("rk"))
  }

  /** Near-identical name pairs by edit distance, blocked on (brand, size) so
    * the self-join is per-block quadratic instead of corpus-quadratic — the
    * fuzzy-matching analogue of the LSH-blocked near-dup joins in [[Dedup]].
    */
  def editDistancePairs(spark: SparkSession, dir: String,
                        maxDist: Int = 8): DataFrame = {
    val p = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
    p.as("a").join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_size") === col("b.p_size") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name")))
      .filter(col("dist") <= maxDist)
      .select(col("a.p_partkey").as("key_a"), col("b.p_partkey").as("key_b"),
        col("a.p_name").as("name_a"), col("b.p_name").as("name_b"), col("dist"))
  }

  /** Deterministic stratified sampling: per-language sampling rates applied
    * via the same md5-bucket trick as [[hashSplit]] (the strata key is salted
    * into the hash so a document's fate is independent across strata
    * definitions). Pure map-side filter — no shuffle, no RNG state — which is
    * what makes it reproducible across backfills at 100 TB.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket =
      conv(substring(md5(concat(col("lang"), lit(":"), col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 100
    val rate = when(col("lang") === "en", 60)
      .when(col("lang") === "de", 40)
      .when(col("lang") === "fr", 30)
      .when(col("lang") === "es", 20)
      .otherwise(10)
    docs(spark, dir)
      .filter(bucket < rate)
      .select(col("doc_id"), col("lang"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirtsis A-ES), k per
    * stratum: each doc draws key = ln(u)/w where u is an md5-derived uniform
    * and w its weight (n_chars here — longer docs proportionally likelier);
    * the k largest keys per stratum ARE a weighted sample without
    * replacement. One pass, one stratum-partitioned top-k window, no
    * rejection loop and no sequential state — the only WOR sampler that
    * distributes: each row's key is independent, so the reduction is just
    * per-stratum max-k. md5 (not rand()) keeps the draw reproducible across
    * engines and runs — the same determinism contract as q65/q74.
    */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    weightedSampleOf(docs(spark, dir), k)

  /** Core of [[weightedSample]] over any (lang, doc_id, n_chars) frame. */
  def weightedSampleOf(documents: DataFrame, k: Int): DataFrame = {
    // u = (h + 1) / 2^60 in (0, 1]: +1 dodges ln(0); the 60-bit numerator
    // makes key collisions practically impossible, doc_id breaks the rest
    val hu = conv(substring(md5(concat(lit("ws|"), col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val u = (hu + lit(1L)).cast("double") / lit(1152921504606846976.0)
    val key = log(u) / col("n_chars").cast("double")
    val w = Window.partitionBy(col("lang")).orderBy(col("key").desc, col("doc_id"))
    documents
      .withColumn("key", key)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("lang"), col("doc_id"), col("rk"))
  }

  /** Class-balanced undersampling: every language keeps exactly the
    * minority class's count, members chosen by md5-hash order — the
    * deterministic form of random undersampling (same contract as q65/q74:
    * reproducible across engines and runs, no RNG state). The per-class
    * quota is a 1-row broadcast; selection is one lang-partitioned top-n
    * window. The balanced-classes prep every classifier-training pipeline
    * runs before fitting.
    */
  def classBalance(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val nMin = d.groupBy(col("lang")).count()
      .agg(min(col("count")).as("n_min"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(concat(lit("bal|"), col("doc_id").cast("string"))), col("doc_id"))
    d.withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(nMin))
      .filter(col("rk") <= col("n_min"))
      .select(col("lang"), col("doc_id"))
  }

  /** Token-count distribution quantiles per language: exact interpolated
    * percentiles (partial-aggregating, single shuffle on lang).
    */
  def tokenQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val n = size(split(trim(col("text")), "\\s+")).cast("double")
    docs(spark, dir)
      .select(col("lang"), n.as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(expr("percentile(n_tok, 0.25)"), 4).as("q25"),
        round(expr("percentile(n_tok, 0.5)"), 4).as("q50"),
        round(expr("percentile(n_tok, 0.75)"), 4).as("q75"))
  }

  /** Benchmark decontamination: flag training documents sharing word n-grams
    * with a held-out benchmark set (every 97th document stands in for the
    * benchmark). N-gram generation is a pure per-document map; the benchmark
    * side collapses to a distinct n-gram set that BROADCASTS into the probe —
    * at 100 TB the corpus streams through map + broadcast-join + per-doc agg,
    * no corpus-sized shuffle. Trigrams here because the synthetic corpus is
    * short word-soup; a production run would use 8-13-grams, same plan.
    */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val grams = TokenizedCorpus.withTokens(spark, dir)
      .select(col("doc_id"), col(TokenizedCorpus.TokCol).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w)-2), i -> concat(element_at(w, i), ' ', element_at(w, i+1), ' ', element_at(w, i+2)))"))
        .as("gram"))
    val bench = grams.filter(col("doc_id") % 97 === 0).select(col("gram")).distinct()
    grams.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), "gram")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_shared"))
  }

  /** Token-budget sequence packing: documents are assigned to training chunks
    * by cumulative token count within each language shard (chunk = the
    * 512-token bin the document STARTS in). The running sum is a window
    * per-lang ordered by doc_id — packing is per-shard, never a global
    * order, so at 100 TB each shard packs independently (the natural unit is
    * whatever key the corpus is already partitioned by).
    */
  def sequencePack(spark: SparkSession, dir: String, budget: Int = 512): DataFrame = {
    val toks = size(split(trim(col("text")), "\\s+")).cast("long")
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(spark, dir)
      .select(col("lang"), col("doc_id"), toks.as("tokens"))
      .withColumn("cum", sum(col("tokens")).over(w))
      .select(col("lang"), col("doc_id"), col("tokens"),
        ((col("cum") - col("tokens")) / budget).cast("long").as("chunk_id"))
  }

  /** Winsorized aggregation: clip a value column at the per-group 5th/95th
    * percentiles before summing — the outlier-robust feature aggregation a
    * training pipeline applies to heavy-tailed signals. Two passes: the
    * per-group bounds are a tiny aggregate that BROADCASTS back into the
    * clipping scan, so the corpus streams through exactly twice with no
    * corpus-sized shuffle beyond the grouped partial aggs.
    *
    * Percentile state: the oracle form (`approx = false`) uses EXACT
    * `percentile`, whose per-group state is O(distinct values) — and the
    * group key here is `l_returnflag` (3 groups), so at 100 TB each of
    * three reducers would hold every distinct price. Production sets
    * `approx = true` ([[madOutliers]]'s q146 pattern, BenchVariant-pinned):
    * `percentile_approx`'s fixed-size sketch computes the CLIP BOUNDS,
    * which is exactly the tolerable kind of sketch error — the bounds are
    * thresholds, not reported statistics — with the identical plan shape.
    */
  def winsorize(spark: SparkSession, dir: String, approx: Boolean = false): DataFrame = {
    // BOTH bounds from ONE percentile state per group: percentile(_, array(q...))
    // builds the identical per-group state a single-quantile call builds and
    // reads it at each requested quantile, so the values are bit-identical to
    // two separate calls while the aggregate runs (and for the exact form,
    // stores O(distinct) state) once instead of twice.
    val pcts: Column =
      if (approx) expr("percentile_approx(l_extendedprice, array(0.05D, 0.95D), 10000)")
      else expr("percentile(l_extendedprice, array(0.05D, 0.95D))")
    // MapWidth.widen REMOVED (optimization r12): with the single-state
    // percentile and the cents-domain sum below, neither pass is CPU-dense
    // enough to pay for the round-robin repartition it rode on — measured
    // at sf0.1 the widen cost more than the single-row-group passes it
    // parallelized (1.15 s → 0.77 s without it). On production-width
    // inputs widen was a no-op, so only the local plan changes.
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val bounds = li.groupBy(col("l_returnflag"))
      .agg(pcts.as("ps"))
      .select(col("l_returnflag"),
        element_at(col("ps"), 1).cast("double").as("p05"),
        element_at(col("ps"), 2).cast("double").as("p95"))
    val clipped = round(least(greatest(col("l_extendedprice"), col("p05")), col("p95")), 2)
    li.join(broadcast(bounds), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") < col("p05"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("l_extendedprice") > col("p95"), 1L).otherwise(0L)).as("n_hi"),
        // clipped is an exact 2dp double → the cents-domain split-long sum
        // is bit-identical to sum(clipped::decimal(18,2))::double
        graft.queries.Relational.sumUnits(
          graft.queries.Relational.centsL(clipped), 10000L, 100L).as("sum_clipped"))
  }

  /** Chunk assembly: materialize [[sequencePack]]'s chunks by concatenating
    * member documents in doc_id order (newline-separated), emitting the md5
    * instead of the assembled text. The per-chunk collect_list is bounded by
    * the token budget — state never exceeds one chunk of text per group —
    * and the sort_array on (doc_id, text) structs makes the concatenation
    * order deterministic under any partitioning.
    */
  def chunkAssembly(spark: SparkSession, dir: String, budget: Int = 512): DataFrame = {
    val toks = size(split(trim(col("text")), "\\s+")).cast("long")
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val assembled = expr(
      "transform(sort_array(collect_list(struct(doc_id, text))), x -> x.text)")
    docs(spark, dir)
      .select(col("lang"), col("doc_id"), col("text"), toks.as("tokens"))
      .withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("chunk_id", ((col("cum") - col("tokens")) / budget).cast("long"))
      .groupBy(col("lang"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("total_tokens"),
        md5(array_join(assembled, "\n")).as("chunk_md5"))
  }

  /** Sliding-window chunking with overlap (window 100 words, stride 50) —
    * the standard LLM context-prep chunker, complementing q89's
    * budget-packing: q89 concatenates docs up to a token budget; this
    * SPLITS each doc into overlapping windows. Pure per-row explode (no
    * shuffle at all): chunk count and slices derive from the word array,
    * so the op is map-side embarrassing-parallel at any scale.
    */
  def slidingChunks(spark: SparkSession, dir: String,
                    window: Int = 30, stride: Int = 15): DataFrame = {
    val ws = split(trim(col("text")), "\\s+")
    // integer-exact chunk count: 1 + ceil((n - window)/stride) for n > window
    val nc = when(size(col("ws")) <= window, lit(1))
      .otherwise(floor((size(col("ws")) - window + stride - 1)
        .cast("double") / stride).cast("int") + 1)
    val sliced = slice(col("ws"), col("chunk_idx") * stride + 1, lit(window))
    docs(spark, dir)
      .select(col("doc_id"), ws.as("ws"))
      .withColumn("chunk_idx", explode(sequence(lit(0), nc - 1)))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(sliced).as("n_words"),
        md5(concat_ws(" ", sliced)).as("chunk_md5"))
  }

  /** Deterministic training-order materialization: every document gets a
    * (shard, position) from a seeded hash — the global shuffle a training run
    * consumes as its data order. The shard assignment is a pure map
    * (md5-bucket, no shuffle); the within-shard position is ONE window over
    * the shard-partitioned exchange, so at 100 TB each shard orders
    * independently and in parallel — there is never a global sort, and a new
    * seed ("epoch2|…") re-shuffles the corpus with zero state carried over.
    * Hash-ordered, not RNG-ordered: re-runs and backfills reproduce the
    * exact order, which is what makes a training run resumable.
    */
  def shuffleShard(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val h = md5(concat(lit("epoch1|"), col("doc_id").cast("string")))
    val shard = conv(substring(col("h"), 1, 8), 16, 10).cast("long") % nShards
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    docs(spark, dir)
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Importance sampling with inverse-probability weights: each document's
    * keep-probability scales with its length (the "sample long documents
    * more" lever), the keep decision is the same salted md5-bucket trick as
    * [[hashSplit]] (stateless, reproducible), and every survivor carries
    * w = 1/p so downstream weighted aggregates stay unbiased
    * (Horvitz-Thompson). Pure map-side filter — no shuffle, no RNG state —
    * and the weights make the sample USABLE for estimation, which is the
    * difference between subsampling and throwing data away at 100 TB.
    */
  def importanceSample(spark: SparkSession, dir: String): DataFrame = {
    val p = greatest(least(col("n_chars") / lit(500.0), lit(0.9)), lit(0.05))
    val bucket =
      conv(substring(md5(concat(lit("imp|"), col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 10000
    docs(spark, dir)
      .withColumn("p", p)
      .filter(bucket < col("p") * 10000)
      .select(col("doc_id"), col("lang"), col("p"), (lit(1.0) / col("p")).as("w"))
  }

  /** Robust outlier detection via median/MAD (the outlier-resistant cousin of
    * q90's mean/σ z-score): per-group median and median-absolute-deviation,
    * flag |x − med| > 3·1.4826·MAD. Two tiny per-group aggregates BROADCAST
    * back into the scan (the second pass exists because MAD is a percentile
    * OF deviations from the first pass's median — inherently two-phase), so
    * the fact table streams through with no fact-sized shuffle beyond the
    * grouped partials; the same shape as [[winsorize]]. Med/MAD are rounded
    * to 4 decimals BEFORE the threshold compare so the flag is
    * representation-stable across engines.
    *
    * The verdict form uses EXACT `percentile` for oracle fidelity; its
    * aggregation state is O(distinct values per group) — bounded on this
    * price-like column (probe: exact 26.6s vs approx 24.3s at 100× sf0.1,
    * comparable TIME because cardinality is capped), but unbounded on a
    * high-cardinality double at 100 TB. Production sets `approx=true`:
    * `percentile_approx` swaps in a fixed-size quantile sketch with the
    * identical plan shape, trading exactness for state that cannot grow
    * past the accuracy parameter regardless of cardinality.
    */
  def madOutliers(spark: SparkSession, dir: String, approx: Boolean = false): DataFrame = {
    def p50(c: String): Column =
      if (approx) expr(s"percentile_approx($c, 0.5, 10000)").cast("double")
      else expr(s"percentile($c, 0.5)")
    // widen removed, same measurement as [[winsorize]]: the three sketch
    // passes cost less than the repartition they rode on (1.25 s → 1.12 s
    // at sf0.1 without it; no-op on production-width inputs anyway)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice").as("x"))
    val med = li.groupBy(col("l_returnflag"))
      .agg(round(p50("x"), 4).as("med"))
    val dev = li.join(broadcast(med), "l_returnflag")
    val mad = dev.groupBy(col("l_returnflag"))
      .agg(round(p50("abs(x - med)"), 4).as("mad"))
    dev.join(broadcast(mad), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        min(col("med")).as("med"),
        min(col("mad")).as("mad"),
        sum(when(abs(col("x") - col("med")) > lit(3 * 1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Corpus mixing with fractional epoch weights: each source gets a
    * milli-copy weight (2300 = 2.3 epochs, 350 = 0.35 epochs); every document
    * deterministically receives floor(w/1000) copies plus one more iff its
    * salted md5 bucket falls under w%1000. This is the standard pretraining
    * data-mix lever (oversample curated sources, downsample crawl) — stateless,
    * reproducible across backfills, pure map-side (no shuffle, no RNG).
    */
  def corpusMix(spark: SparkSession, dir: String): DataFrame = {
    val bucket =
      conv(substring(md5(concat(col("source"), lit("|"), col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 1000
    val milli = when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 2300)
      .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 1000)
      .when(col("source").isin("src10", "src11", "src12", "src13", "src14"), 350)
      .otherwise(1500)
    docs(spark, dir)
      .withColumn("n_copies",
        floor(milli / lit(1000)).cast("long") +
          when(bucket < milli % 1000, 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"), col("n_copies"))
  }

  /** BPE tokenizer vocabulary training — real byte-pair-encoding merges,
    * exactly verifiable. The classic trainer shape: the CORPUS is touched
    * once (word → count aggregation); every merge round then runs over the
    * vocabulary-sized frequency table (the standard BPE optimization — at
    * 100 TB the corpus scan is one job and the 10/30k merge rounds iterate
    * on a table that is vocab-sized, not corpus-sized). Token boundaries are
    * encoded as `(tok)` wrappers so greedy left-to-right non-overlapping
    * merge application is a plain global `regexp_replace` — identical
    * semantics in Spark and DuckDB with no lookaround (which RE2 lacks):
    * adjacent occurrences share no characters, and runs like `(a)(a)(a)`
    * merge the first pair then resume, exactly BPE's greedy rule. Each
    * round's winning pair is an exact integer count with a lexicographic
    * tie-break, so the whole merge sequence is deterministic and the oracle
    * replays it by unrolling the rounds in SQL. The per-round driver fetch
    * is ONE (pair, count) row — the model lives on the driver, the counts
    * stay distributed (the [[Trainer]] parameter-server shape again).
    */
  def bpeMerges(spark: SparkSession, dir: String, nMerges: Int = 10): DataFrame =
    bpeCache.getOrElseUpdate((dir, nMerges),
      bpeMergesOf(TokenizedCorpus.withTokens(spark, dir), nMerges))

  /** The training pass itself, over any (text) frame — callable by the
    * model-store bootstrap ([[ModelStore]]) as well as the per-dir cache
    * wrapper above.
    */
  def bpeMergesOf(documents: DataFrame, nMerges: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    locally {
      val tokPat = lit("\\(([^)]*)\\)")
      var wc = documents
        .select(explode(tokArr(documents)).as("word"))
        .filter(col("word").rlike("^[a-z0-9]+$"))
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .select(regexp_replace(col("word"), "(.)", "($1)").as("enc"), col("cnt"))
        .cache()
      wc.count()
      val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
      var exhausted = false
      for (r <- 1 to nMerges if !exhausted) {
        val top = wc
          .select(regexp_extract_all(col("enc"), tokPat, lit(1)).as("ts"), col("cnt"))
          .filter(size(col("ts")) >= 2)
          .select(explode(expr("transform(sequence(1, size(ts)-1), " +
            "i -> struct(element_at(ts, i) AS a, element_at(ts, i+1) AS b))")).as("p"),
            col("cnt"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("a"), col("b"))
          .limit(1).collect().headOption.getOrElse {
            // every word is a single token: no pairs left. Stop — the oracle
            // does the same (an empty round contributes no UNION row).
            exhausted = true
            null
          }
        if (top != null) {
          val (a, b, n) = (top.getString(0), top.getString(1), top.getLong(2))
          merges += ((r, a, b, s"${a}_$b", n))
          // a, b ∈ [a-z0-9_]+ (base filter + "_" joiner) — regex-literal safe
          val next = wc
            .select(regexp_replace(col("enc"), s"\\($a\\)\\($b\\)", s"(${a}_$b)").as("enc"),
              col("cnt"))
            .cache()
          next.count()
          wc.unpersist()
          wc = next
        }
      }
      wc.unpersist()
      merges.toSeq.toDF("rank", "lhs", "rhs", "merged", "pair_count")
        .repartition(1)
    }
  }

  /** BPE tokenization — apply the learned merges (q149's model) to every
    * document and count the resulting tokens: the production token-counting
    * form with a REAL learned vocabulary rather than a regex heuristic
    * (q39). The 10 merges collect to the driver (the model, 10 rows) and
    * compile into a chain of literal `regexp_replace`es over the
    * boundary-encoded words — a pure map with ONE (doc_id) re-aggregation
    * shuffle of pre-counted integers; nothing grows with the vocabulary at
    * serve time. Words outside the trainer's `[a-z0-9]+` alphabet count as
    * one atomic token (enc stays NULL through the chain, coalesced to 1).
    */
  def bpeTokenize(spark: SparkSession, dir: String, nMerges: Int = 10): DataFrame = {
    val merges = bpeMerges(spark, dir, nMerges).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    tokenizeWithMerges(TokenizedCorpus.withTokens(spark, dir), merges.toSeq)
  }

  /** Apply an already-learned merge sequence (rank order) to any
    * (doc_id, text) frame — the serve half of BPE, shared by the per-JVM
    * cache path above and the table-served path ([[ModelStore]], which
    * reads the merges from a maintained engine table instead of re-training
    * in every new JVM).
    *
    * Dictionary-apply: the merge chain (10 chained regex passes over the
    * boundary-encoded word) runs once per DISTINCT word, not once per word
    * OCCURRENCE — under a Zipf corpus the occurrence/distinct ratio is
    * enormous, so this removes almost all of the serve-time regex CPU. The
    * per-doc-word counts shuffle as pre-combined ints; the tiny (word → token
    * length) dictionary joins back (AQE broadcasts it), and one final doc_id
    * re-aggregation of pre-counted ints produces the per-document totals —
    * no stage ever re-encodes a word twice.
    */
  def tokenizeWithMerges(documents: DataFrame,
                         merges: Seq[(String, String)]): DataFrame = {
    val enc0 = when(col("word").rlike("^[a-z0-9]+$"),
      regexp_replace(col("word"), "(.)", "($1)"))
    val enc = merges.foldLeft(enc0) { case (e, (a, b)) =>
      regexp_replace(e, s"\\($a\\)\\($b\\)", s"(${a}_$b)")
    }
    val occ = documents
      .select(col("doc_id"), explode(tokArr(documents)).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
    val dict = occ.select(col("word")).distinct()
      .select(col("word"),
        coalesce(size(regexp_extract_all(enc, lit("\\(([^)]*)\\)"), lit(1))), lit(1))
          .as("nt"))
    occ.join(dict, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * col("nt")).as("n_tokens"))
  }

  /** q150 oracle: replay the training chain (same CTEs as q149), then apply
    * the learned merges to every word with the identical boundary-wrapped
    * global replaces and count tokens.
    */
  private[pipeline] def bpeTokenizeOracleSql(nMerges: Int): String = {
    val training = bpeOracleSql(nMerges)
    val withEnd = training.substring(0, training.indexOf("\nSELECT 1 AS rank"))
    val applies = (1 to nMerges).map { r =>
      s"""e$r AS (SELECT doc_id, regexp_replace(enc, '\\(' || t$r.a || '\\)\\(' || t$r.b || '\\)',
         |         '(' || t$r.a || '_' || t$r.b || ')', 'g') AS enc FROM e${r - 1}, t$r)""".stripMargin
    }
    s"""$withEnd,
       |d AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word FROM documents),
       |e0 AS (SELECT doc_id, CASE WHEN regexp_matches(word, '^[a-z0-9]+$$')
       |         THEN regexp_replace(word, '(.)', '(\\1)', 'g') END AS enc FROM d),
       |${applies.mkString(",\n")},
       |tok AS (SELECT doc_id,
       |          COALESCE(CAST(len(regexp_extract_all(enc, '\\(([^)]*)\\)', 1)) AS INT), 1) AS nt
       |        FROM e$nMerges)
       |SELECT doc_id, count(*) AS n_words, CAST(sum(nt) AS BIGINT) AS n_tokens
       |FROM tok GROUP BY doc_id""".stripMargin
  }

  // (dir, nMerges) -> learned merge table (10 rows): train once per corpus
  // per JVM, serve repeats — same policy as Trainer.modelCache / q140's LM
  private val bpeCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int), DataFrame]

  /** Test/fixture hook: drop cached merge tables. */
  def clearBpeCache(): Unit = bpeCache.clear()

  /** The q149 oracle replays the identical training by unrolling the merge
    * rounds as a CTE chain: each round re-derives pair counts from the
    * previous round's vocabulary, picks the same (count DESC, pair ASC)
    * winner, and applies the same boundary-wrapped global regexp_replace.
    */
  private[pipeline] def bpeOracleSql(nMerges: Int): String = {
    val head =
      """WITH w AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word FROM documents),
        |wc0 AS (SELECT regexp_replace(word, '(.)', '(\1)', 'g') AS enc, count(*) AS cnt
        |        FROM w WHERE regexp_matches(word, '^[a-z0-9]+$') GROUP BY 1)""".stripMargin
    val rounds = (1 to nMerges).map { r =>
      s"""pc$r AS (SELECT ts[i] AS a, ts[i+1] AS b, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT regexp_extract_all(enc, '\\(([^)]*)\\)', 1) AS ts, cnt FROM wc${r - 1}),
         |       UNNEST(generate_series(1, len(ts) - 1)) t(i)
         |  WHERE len(ts) >= 2 GROUP BY 1, 2),
         |t$r AS (SELECT a, b, n FROM pc$r ORDER BY n DESC, a, b LIMIT 1),
         |wc$r AS (SELECT regexp_replace(enc, '\\(' || t$r.a || '\\)\\(' || t$r.b || '\\)',
         |                 '(' || t$r.a || '_' || t$r.b || ')', 'g') AS enc, cnt
         |         FROM wc${r - 1}, t$r)""".stripMargin
    }
    val union = (1 to nMerges).map { r =>
      s"SELECT $r AS rank, a AS lhs, b AS rhs, a || '_' || b AS merged, n AS pair_count FROM t$r"
    }.mkString("\nUNION ALL\n")
    (head +: rounds).mkString(",\n") + "\n" + union + "\nORDER BY rank"
  }

  /** Temperature-based mixture sampling: per-source selection quotas
    * proportional to n_s^α with α = 0.5 — the standard multilingual/
    * multi-source rebalancing (temperature sampling in mT5/XLM-R and every
    * data-mixture paper since): big sources are down-weighted, small
    * sources up-weighted, smoothly between proportional (α=1) and uniform
    * (α=0). q111 applies FIXED per-source mixing weights; this derives the
    * weights from the corpus itself.
    *
    * Determinism across engines is engineered at two float hazards: α=0.5
    * is computed as sqrt() (correctly-rounded in IEEE 754, unlike pow whose
    * last ulp is libm-specific), and the weight NORMALIZER is summed as
    * 6-dp DECIMAL so addition order cannot perturb the quotas (the
    * q118/q148 pattern) — floor() then snaps quota boundaries. Selection
    * within a source is the seeded-hash rank (md5 of doc_id, doc_id
    * tie-break), so the chosen set is a pure function of the corpus.
    *
    * Scale shape: quota derivation is one grouped count folded to a
    * source-cardinality table (mixture configs are at most thousands of
    * rows — broadcast); selection is one per-source window over (hash, id)
    * — at 100 TB the window sorts WITHIN sources in parallel, and a
    * quota-sized TakeOrderedAndProject per source would be the next
    * refinement if a single source dominated a partition.
    */
  def temperatureMix(spark: SparkSession, dir: String, nTarget: Int = 200): DataFrame = {
    val d = docs(spark, dir)
    val wts = d.groupBy(col("source"))
      .agg(count(lit(1)).as("ns"))
      .withColumn("w", round(sqrt(col("ns").cast("double")), 6).cast("decimal(18,6)"))
    val tot = wts.agg(sum(col("w")).as("wsum"))
    val targets = wts.crossJoin(broadcast(tot))
      .select(col("source"),
        floor(lit(nTarget) * col("w").cast("double") / col("wsum").cast("double"))
          .as("target"))
    val perSrc = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    d.select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(perSrc))
      .join(broadcast(targets), Seq("source"))
      .filter(col("rn") <= col("target"))
      .select(col("doc_id"), col("source"))
  }

  /** Join-consistent sampling: sample the fact AND its child table by the
    * SAME hash of the JOIN KEY, so the join of the samples IS a uniform
    * sample of the join — the trick that lets a 10% dev-scale copy of a
    * multi-table 100 TB schema keep referential integrity without ever
    * joining the full tables (independent row sampling would orphan ~90% of
    * child rows and bias the join sample quadratically). Emits the sampled
    * counts plus two hash-checked verdicts: no sampled child is orphaned,
    * and the sampled join's cardinality equals the filter-AFTER-join form
    * (the commutation law; the full join runs here only as the audit —
    * production ships just the two filtered tables).
    */
  def consistentSample(spark: SparkSession, dir: String, pct: Int = 10): DataFrame = {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    def keep(c: Column) =
      conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % 100 < pct
    val o = orders.filter(keep(col("o_orderkey")))
    val l = lineitem.filter(keep(col("l_orderkey")))
    val nO = o.agg(count(lit(1)).as("n_orders"))
    val nL = l.agg(count(lit(1)).as("n_items"))
    // inner-join count and orphan count from ONE left join (optimization
    // r12): o_orderkey is unique in orders, so each sampled item matches at
    // most once — counting matched rows equals the former inner-join count
    // and counting unmatched rows equals the former anti-join count, in a
    // single pass instead of two join jobs.
    val nJ = l.join(o, col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(col("o_orderkey")).as("n_joined"),
        coalesce(sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_orph"))
    val nPost = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .filter(keep(col("l_orderkey"))).agg(count(lit(1)).as("n_post"))
    nO.crossJoin(nL).crossJoin(nJ).crossJoin(nPost)
      .select(lit("consistent_sample").as("metric"),
        col("n_orders"), col("n_items"), col("n_joined"),
        (col("n_orph") === 0).as("no_orphans"),
        (col("n_joined") === col("n_post")).as("sample_commutes_with_join"))
  }

  /** q250: the CURATION FUNNEL — the end-to-end shape of a training-data
    * pipeline (length gate → language gate → repetition gate → near-dup
    * survivor election → token-budget cut) run as ONE composed job with
    * per-stage accounting, instead of five separate passes each re-reading
    * the corpus. Every stage's predicate is computed once per document in
    * a single flag projection (plus one token-frequency aggregate feeding
    * the repetition ratio); the funnel row for stage i counts documents
    * passing stages 1..i, so the output is the drop-accounting a data lead
    * actually reviews: where did the corpus go.
    *
    * Stages (all deterministic and fully SQL-replayable):
    *  1. length:      n_chars >= 150 (boilerplate/fragment floor);
    *  2. lang:        lang = 'en' (the target-language gate);
    *  3. repetition:  max token frequency / doc tokens <= 0.2 (the
    *                  Gopher-style degenerate-text gate, cf. q81);
    *  4. near_dup:    first-8-token prefix fingerprint, min doc_id wins
    *                  (the survivor-election shape of q47, one window);
    *  5. token_budget: keep documents in doc_id order while the cumulative
    *                  token count stays within 60% of the survivors' total
    *                  (the corpus-sizing cut; a two-pass DISTRIBUTED prefix
    *                  sum over the survivor set — [[tokenBudgetCut]] — so no
    *                  single task ever holds the whole survivor corpus).
    *
    * Scale shape: one corpus tokenize feeding one per-doc aggregate, one
    * fingerprint window, one cut window over survivors; the funnel counts
    * are six scalar aggregates. Nothing is re-read per stage.
    */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE tokenize + ONE frequency aggregate feed every stage: cached so
    // the three funnel actions below reuse it instead of re-reading the
    // corpus per action
    val flags = funnelFlags(TokenizedCorpus.withTokens(spark, dir)).cache()
    try {
      val head = headAggs(flags)
      val s4 = flags.filter(col("f1") && col("f2") && col("f3"))
        .withColumn("m", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
        .filter(col("doc_id") === col("m"))
        .cache()
      try {
        val c4 = s4.agg(count(lit(1)).as("n4"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("tok4")).collect()(0)
        // budget = floor(total * 0.6): total is already a driver scalar
        // (tok4), so the cut threshold costs nothing extra
        val budget = math.floor(c4.getLong(1).toDouble * 0.6).toLong
        val c5 = withTokenBudgetCut(
          s4.select(col("doc_id"), col("n_tokens")), budget) { s5 =>
          s5.agg(count(lit(1)).as("n5"),
            coalesce(sum(col("n_tokens")), lit(0L)).as("tok5")).collect()(0)
        }
        import spark.implicits._
        (headRows(head) ++ Seq(
          (4L, "near_dup", head.getLong(3), c4.getLong(0), c4.getLong(1)),
          (5L, "token_budget", c4.getLong(0), c5.getLong(0), c5.getLong(1))))
          .toDF("stage", "name", "rows_in", "rows_out", "tokens_out")
      } finally { s4.unpersist(); () }
    } finally { flags.unpersist(); () }
  }

  /** The token-budget cut as a two-pass DISTRIBUTED prefix sum: keep rows in
    * `doc_id` order while the running `n_tokens` total stays ≤ `budget`.
    *
    * A naive `sum over Window.orderBy(doc_id)` funnels every surviving row
    * through ONE task (an un-partitioned window is a single-partition sort) —
    * at 100 TB that task IS the corpus. Instead this runs the textbook
    * parallel scan:
    *   pass 1: range-partition by doc_id (order-compatible: every doc_id in
    *           partition i sorts before every doc_id in partition i+1), pin
    *           the partitioning with persist(), and aggregate ONE partial sum
    *           per partition (a numPartitions-row collect);
    *   pass 2: prefix-sum those partials on the driver (numPartitions longs),
    *           broadcast-join the per-partition starting offsets back, and
    *           finish with a window partitioned BY PARTITION ID — every task
    *           scans only its own range slice.
    * Parallelism is the shuffle-partition count end to end; no stage sees
    * more than 1/numPartitions of the survivors.
    *
    * The persist() is load-bearing: `spark_partition_id` must mean the same
    * assignment in both passes, and range boundaries are sampled — pinning
    * the materialized partitioning makes the two reads observe one layout.
    * Loan pattern: the pinned frame is unpersisted after `action` finishes,
    * so the cut frame must be fully consumed inside `action`.
    */
  private[graft] def withTokenBudgetCut[A](survivors: DataFrame, budget: Long)
                                          (action: DataFrame => A): A = {
    val spark = survivors.sparkSession
    import spark.implicits._
    val nP = spark.sessionState.conf.numShufflePartitions
    val parted = survivors
      .repartitionByRange(nP, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .persist()
    try {
      parted.count() // pin pid assignment for both passes
      val partials = parted.groupBy(col("pid"))
        .agg(sum(col("n_tokens")).as("psum"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      // running offset: tokens in all partitions strictly before this one
      val offsets = partials.scanLeft((0, 0L)) { case ((_, acc), (pid, psum)) =>
        (pid, acc + psum)
      }.init.zip(partials).map { case ((_, off), (pid, _)) => (pid, off) }
      val offDf = offsets.toSeq.toDF("pid", "off")
      val cut = parted
        .join(broadcast(offDf), Seq("pid"))
        .withColumn("cum", col("off") + sum(col("n_tokens")).over(
          Window.partitionBy(col("pid")).orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cum") <= lit(budget))
        .drop("pid", "off")
      action(cut)
    } finally { parted.unpersist(); () }
  }

  /** Per-document funnel flags — the shared gate definitions of the batch
    * funnel (q250) and the streaming partials (q252): one tokenize, one
    * token-frequency aggregate. The thresholds live HERE, once.
    */
  private[graft] def funnelFlags(docsDf: DataFrame): DataFrame = {
    val d = docsDf.select(col("doc_id"), col("lang"), col("n_chars"),
      tokArr(docsDf).as("arr"))
    val rep = d.select(col("doc_id"), explode(col("arr")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")) / sum(col("c"))).as("rep_ratio"))
    d.withColumn("n_tokens", size(col("arr")).cast("long"))
      .withColumn("fp", concat_ws(" ", slice(col("arr"), 1, 8)))
      .join(rep, "doc_id")
      .withColumn("f1", col("n_chars") >= 150)
      .withColumn("f2", col("lang") === "en")
      .withColumn("f3", col("rep_ratio") <= 0.2)
  }

  private def headAggs(flags: DataFrame): org.apache.spark.sql.Row =
    flags.agg(
      count(lit(1)).as("n0"),
      coalesce(sum(when(col("f1"), 1L).otherwise(0L)), lit(0L)).as("n1"),
      coalesce(sum(when(col("f1") && col("f2"), 1L).otherwise(0L)), lit(0L))
        .as("n2"),
      coalesce(sum(when(col("f1") && col("f2") && col("f3"), 1L)
        .otherwise(0L)), lit(0L)).as("n3"),
      coalesce(sum(when(col("f1"), col("n_tokens")).otherwise(0L)), lit(0L))
        .as("tok1"),
      coalesce(sum(when(col("f1") && col("f2"), col("n_tokens"))
        .otherwise(0L)), lit(0L)).as("tok2"),
      coalesce(sum(when(col("f1") && col("f2") && col("f3"), col("n_tokens"))
        .otherwise(0L)), lit(0L)).as("tok3")).collect()(0)

  private def headRows(h: org.apache.spark.sql.Row)
  : Seq[(Long, String, Long, Long, Long)] = Seq(
    (1L, "length", h.getLong(0), h.getLong(1), h.getLong(4)),
    (2L, "lang", h.getLong(1), h.getLong(2), h.getLong(5)),
    (3L, "repetition", h.getLong(2), h.getLong(3), h.getLong(6)))

  /** The 3-row per-doc-stage funnel partial over a document set —
    * Sum-mergeable by construction (counts add), which is what lets q252
    * fold per-micro-batch partials into the cumulative funnel table.
    */
  private[graft] def funnelPartial(spark: SparkSession,
                                   docsDf: DataFrame): DataFrame = {
    import spark.implicits._
    headRows(headAggs(funnelFlags(docsDf)))
      .toDF("stage", "name", "rows_in", "rows_out", "tokens_out")
  }

  /** q251: the MIX-BUDGET PLANNER — the inverse of [[corpusMix]]. corpusMix
    * APPLIES given epoch weights; this derives them: given a token target
    * (here 1.5× the corpus) and per-source repetition caps (curated sources
    * may repeat up to 4 epochs, mid-quality 2, crawl 1 — the standard
    * "don't memorize the crawl" discipline), waterfill a single scale
    * factor f so that Σ tokens_s · min(cap_s, f) = target: every uncapped
    * source repeats f epochs, capped sources sit at their cap, and if the
    * target exceeds total capacity everything caps. Exact and
    * deterministic end-to-end: the class table is cap-count-sized (the
    * collect is 3 rows — model-sized, the [[Trainer]] discipline), all
    * intermediate arithmetic stays exactly representable (long token
    * sums, caps of 4/2/1, one final division), so the DuckDB oracle
    * replays the waterfill — including WHICH caps bind — bit-for-bit.
    * Scale shape: one corpus tokenize → per-source sums; the plan itself
    * is arithmetic over a handful of classes.
    */
  def mixBudget(spark: SparkSession, dir: String, mult: Double = 1.5): DataFrame = {
    val capCol = when(col("source")
        .isin("src0", "src1", "src2", "src3", "src4"), 4.0)
      .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 2.0)
      .otherwise(1.0)
    val bySrc = TokenizedCorpus.withTokens(spark, dir)
      .select(col("source"),
        size(col(TokenizedCorpus.TokCol)).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("n_tokens"))
      .withColumn("cap", capCol)
    // class table: one row per distinct cap — 3 rows, model-sized
    val classes = bySrc.groupBy(col("cap"))
      .agg(sum(col("n_tokens")).as("tok")).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    val total = classes.map(_._2).sum
    val capacity = classes.map { case (c, t) => t * c }.sum // exact: caps 4/2/1
    val target = math.floor(mult * total).toLong
    // waterfill: k = number of fully capped classes (smallest caps first);
    // f_k = (target − Σ_{i≤k} tok_i·cap_i) / Σ_{i>k} tok_i; valid when
    // cap_k ≤ f_k ≤ cap_{k+1}; f is nondecreasing in k, take the first
    val f: Double =
      if (target >= capacity) classes.last._1
      else {
        var cumTokCap = 0.0
        var cumTok = 0L
        var found = Option.empty[Double]
        var k = 0
        while (found.isEmpty && k < classes.length) {
          val cand = (target - cumTokCap) / (total - cumTok).toDouble
          val okLo = k == 0 || cand >= classes(k - 1)._1
          val okHi = cand <= classes(k)._1
          if (okLo && okHi) found = Some(cand)
          else { cumTokCap += classes(k)._2 * classes(k)._1; cumTok += classes(k)._2; k += 1 }
        }
        found.getOrElse(classes.last._1)
      }
    bySrc.select(col("source"), col("n_tokens"), col("cap"),
      round(least(col("cap"), lit(f)), 6).as("epochs"),
      floor(col("n_tokens") * least(col("cap"), lit(f))).cast("long")
        .as("planned_tokens"),
      (col("cap") <= lit(f)).as("cap_bound"))
  }

  /** q258: the CORPUS DATACARD — the per-source summary a dataset release
    * ships (Datasheets-for-Datasets / dataset-card shape): document and
    * token counts, mean document length, language share, and the exact-dup
    * count, one row per source. The operational "what am I training on"
    * report every large-scale pipeline runs after curation.
    *
    * Scale shape: ONE grouped aggregate over the shared tokenized corpus
    * (every stat is a sum/count — partial aggregation collapses each
    * source on the map side) plus ONE fingerprint-first dup count (md5,
    * not text bodies, shuffles — the q30 discipline); the two 10-row
    * source tables join broadcast. Every emitted figure is exact integer
    * arithmetic or a single deterministic divide + round, so the oracle
    * replays it bit-for-bit.
    */
  def corpusDatacard(spark: SparkSession, dir: String): DataFrame = {
    val d = TokenizedCorpus.withTokens(spark, dir)
    datacardFinish(datacardBase(d), datacardDups(datacardFp(d)))
  }

  /** The datacard's per-source Sum partial over any documents frame — ONE
    * definition shared by the batch report (q258) and the stream-maintained
    * twin (q261, which Sum-folds these rows into an engine table), so the
    * two derivations cannot drift.
    */
  private[graft] def datacardBase(docsDf: DataFrame): DataFrame =
    docsDf.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(tokArr(docsDf)).cast("long")).as("n_tokens"),
      sum(col("n_chars")).as("sum_chars"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))

  /** Per-(source, fingerprint) occurrence counts — the dup-detection half
    * of the datacard; fingerprint-first (md5, never text bodies) shuffles.
    */
  private[graft] def datacardFp(docsDf: DataFrame): DataFrame =
    docsDf.select(col("source"), md5(col("text")).as("fp"))
      .groupBy(col("source"), col("fp")).agg(count(lit(1)).as("c"))

  /** Exact-dup count per source from merged fingerprint counts. */
  private[graft] def datacardDups(fpCounts: DataFrame): DataFrame =
    fpCounts.groupBy(col("source")).agg(sum(col("c") - 1).as("dup_docs"))

  /** The final datacard projection from the merged partials. */
  private[graft] def datacardFinish(base: DataFrame, dups: DataFrame): DataFrame =
    base.join(dups, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("sum_chars").cast("double") / col("n_docs"), 4).as("avg_chars"),
        round(col("n_en").cast("double") / col("n_docs"), 4).as("en_share"),
        col("dup_docs"))
      .orderBy(col("source"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q258_corpus_datacard" ->
      ((s: SparkSession, d: String) => corpusDatacard(s, d)),
    "q250_curation_funnel" ->
      ((s: SparkSession, d: String) => curationFunnel(s, d)),
    "q251_mix_budget" ->
      ((s: SparkSession, d: String) => mixBudget(s, d)),
    "q111_corpus_mix" -> ((s: SparkSession, d: String) => corpusMix(s, d)),
    "q181_consistent_sample" -> ((s: SparkSession, d: String) => consistentSample(s, d)),
    "q172_temperature_mix" -> ((s: SparkSession, d: String) => temperatureMix(s, d)),
    "q105_sliding_chunks" -> ((s: SparkSession, d: String) => slidingChunks(s, d)),
    "q89_chunk_assembly" -> ((s: SparkSession, d: String) => chunkAssembly(s, d)),
    "q84_sequence_pack" -> ((s: SparkSession, d: String) => sequencePack(s, d)),
    "q88_winsorize" -> ((s: SparkSession, d: String) => winsorize(s, d)),
    "q79_contamination" -> ((s: SparkSession, d: String) => contamination(s, d)),
    "q65_hash_split" -> ((s: SparkSession, d: String) => hashSplit(s, d)),
    "q66_ngram_topk" -> ((s: SparkSession, d: String) => ngramTopK(s, d)),
    "q67_regexp_counts" -> ((s: SparkSession, d: String) => regexpCounts(s, d)),
    "q68_redact_scrub" -> ((s: SparkSession, d: String) => redactScrub(s, d)),
    "q69_length_histogram" -> ((s: SparkSession, d: String) => lengthHistogram(s, d)),
    "q70_lang_quality_topk" -> ((s: SparkSession, d: String) => langQualityTopK(s, d)),
    "q71_edit_distance" -> ((s: SparkSession, d: String) => editDistancePairs(s, d)),
    "q72_token_quantiles" -> ((s: SparkSession, d: String) => tokenQuantiles(s, d)),
    "q74_stratified_sample" -> ((s: SparkSession, d: String) => stratifiedSample(s, d)),
    "q158_weighted_sample" -> ((s: SparkSession, d: String) => weightedSample(s, d)),
    "q165_class_balance" -> ((s: SparkSession, d: String) => classBalance(s, d)),
    "q143_shuffle_shard" -> ((s: SparkSession, d: String) => shuffleShard(s, d)),
    "q144_importance_sample" -> ((s: SparkSession, d: String) => importanceSample(s, d)),
    "q146_mad_outliers" -> ((s: SparkSession, d: String) => madOutliers(s, d)),
    "q149_bpe_merges" -> ((s: SparkSession, d: String) => bpeMerges(s, d)),
    "q150_bpe_tokenize" -> ((s: SparkSession, d: String) => bpeTokenize(s, d)),
  )

  val oracles: Map[String, String] = Map(
    // q258: every datacard figure recomputed from raw rows — counts and
    // sums exact, the two ratios via one divide + round(4) in both engines
    "q258_corpus_datacard" ->
      """WITH t AS (SELECT source, lang, n_chars, text,
        |             len(string_split_regex(trim(lower(text)), '\s+')) AS nt
        |           FROM documents),
        |base AS (SELECT source, count(*) AS n_docs,
        |           CAST(sum(nt) AS BIGINT) AS n_tokens,
        |           round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars,
        |           round(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
        |                 / count(*), 4) AS en_share
        |         FROM t GROUP BY source),
        |dups AS (SELECT source, CAST(sum(c - 1) AS BIGINT) AS dup_docs
        |         FROM (SELECT source, text, count(*) AS c
        |               FROM documents GROUP BY source, text)
        |         GROUP BY source)
        |SELECT base.source, n_docs, n_tokens, avg_chars, en_share, dup_docs
        |FROM base JOIN dups ON base.source = dups.source""".stripMargin,
    // q250: all five funnel stages replayed — the flag conjunctions, the
    // prefix-fingerprint survivor election, and the 60%-budget cumsum cut
    "q250_curation_funnel" ->
      """WITH d AS (SELECT doc_id, lang, n_chars,
        |    string_split_regex(trim(lower(text)), '\s+') AS arr FROM documents),
        |rep AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS rep_ratio FROM (
        |    SELECT doc_id, w, count(*) AS c FROM
        |      (SELECT doc_id, unnest(arr) AS w FROM d) GROUP BY 1, 2)
        |  GROUP BY 1),
        |f AS (SELECT d.doc_id, len(arr) AS n_tokens,
        |    array_to_string(arr[1:8], ' ') AS fp,
        |    (n_chars >= 150) AS f1, (lang = 'en') AS f2,
        |    (rep_ratio <= 0.2) AS f3
        |  FROM d JOIN rep USING (doc_id)),
        |c AS (SELECT count(*) AS n0,
        |    sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS n2,
        |    sum(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS n3,
        |    sum(CASE WHEN f1 THEN n_tokens ELSE 0 END) AS tok1,
        |    sum(CASE WHEN f1 AND f2 THEN n_tokens ELSE 0 END) AS tok2,
        |    sum(CASE WHEN f1 AND f2 AND f3 THEN n_tokens ELSE 0 END) AS tok3
        |  FROM f),
        |s4 AS (SELECT doc_id, n_tokens FROM (
        |    SELECT doc_id, n_tokens, min(doc_id) OVER (PARTITION BY fp) AS m
        |    FROM f WHERE f1 AND f2 AND f3) WHERE doc_id = m),
        |c4 AS (SELECT count(*) AS n4, sum(n_tokens) AS tok4 FROM s4),
        |s5 AS (SELECT doc_id, n_tokens FROM (
        |    SELECT doc_id, n_tokens,
        |      sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum,
        |      sum(n_tokens) OVER () AS total FROM s4)
        |  WHERE cum <= floor(total * 0.6)),
        |c5 AS (SELECT count(*) AS n5, sum(n_tokens) AS tok5 FROM s5)
        |SELECT CAST(stage AS BIGINT) AS stage, name,
        |  CAST(rows_in AS BIGINT) AS rows_in,
        |  CAST(rows_out AS BIGINT) AS rows_out,
        |  CAST(tokens_out AS BIGINT) AS tokens_out
        |FROM (
        |  SELECT 1 AS stage, 'length' AS name, n0 AS rows_in, n1 AS rows_out,
        |    tok1 AS tokens_out FROM c
        |  UNION ALL SELECT 2, 'lang', n1, n2, tok2 FROM c
        |  UNION ALL SELECT 3, 'repetition', n2, n3, tok3 FROM c
        |  UNION ALL SELECT 4, 'near_dup', n3, n4, tok4 FROM c, c4
        |  UNION ALL SELECT 5, 'token_budget', n4, n5, tok5 FROM c4, c5)""".stripMargin,
    // q251: the waterfill replayed in SQL — per-source token sums, the
    // cap classes, the k-capped candidate scan (window cumsums excluding
    // the current row), the boundary checks, and the final per-source
    // epochs/planned-tokens arithmetic. All intermediates are exactly
    // representable, so a different binding set or an off-by-one in the
    // candidate scan flips the hash.
    "q251_mix_budget" ->
      """WITH t AS (SELECT source,
        |    len(string_split_regex(trim(lower(text)), '\s+')) AS n FROM documents),
        |src AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens FROM t GROUP BY 1),
        |srcc AS (SELECT source, n_tokens,
        |    CAST(CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 4.0
        |         WHEN source IN ('src5','src6','src7','src8','src9') THEN 2.0
        |         ELSE 1.0 END AS DOUBLE) AS cap FROM src),
        |cls AS (SELECT cap, sum(n_tokens) AS tok FROM srcc GROUP BY 1),
        |g AS (SELECT sum(tok) AS total, sum(tok * cap) AS capacity,
        |    max(cap) AS maxcap FROM cls),
        |tgt AS (SELECT CAST(floor(1.5 * total) AS BIGINT) AS target,
        |    total, capacity, maxcap FROM g),
        |cum AS (SELECT cap, tok,
        |    coalesce(sum(tok * cap) OVER (ORDER BY cap
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_tokcap,
        |    coalesce(sum(tok) OVER (ORDER BY cap
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_tok,
        |    lag(cap) OVER (ORDER BY cap) AS prev_cap
        |  FROM cls),
        |cands AS (SELECT cap AS next_cap, prev_cap,
        |    (target - cum_tokcap) / (total - cum_tok) AS f
        |  FROM cum CROSS JOIN tgt),
        |valid AS (SELECT f FROM cands
        |  WHERE (prev_cap IS NULL OR f >= prev_cap) AND f <= next_cap
        |  ORDER BY next_cap LIMIT 1),
        |feff AS (SELECT CASE WHEN target >= capacity THEN maxcap
        |    ELSE coalesce((SELECT f FROM valid), maxcap) END AS f FROM tgt)
        |SELECT source, n_tokens, cap,
        |  round(least(cap, f), 6) AS epochs,
        |  CAST(floor(n_tokens * least(cap, f)) AS BIGINT) AS planned_tokens,
        |  (cap <= f) AS cap_bound
        |FROM srcc CROSS JOIN feff""".stripMargin,
    // q181's booleans are computed checks in BOTH engines (not pinned
    // constants): the oracle re-runs the orphan and commutation audits
    "q181_consistent_sample" ->
      """WITH o AS (SELECT * FROM orders
        |           WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 10),
        |l AS (SELECT * FROM lineitem
        |      WHERE CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 10),
        |j AS (SELECT count(*) AS n_joined FROM l JOIN o ON l_orderkey = o_orderkey),
        |orph AS (SELECT count(*) AS n_orph FROM l ANTI JOIN o ON l.l_orderkey = o.o_orderkey),
        |post AS (SELECT count(*) AS n_post
        |         FROM lineitem li JOIN orders oo ON li.l_orderkey = oo.o_orderkey
        |         WHERE CAST(('0x' || substr(md5(CAST(li.l_orderkey AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 10)
        |SELECT 'consistent_sample' AS metric,
        |  (SELECT count(*) FROM o) AS n_orders,
        |  (SELECT count(*) FROM l) AS n_items,
        |  (SELECT n_joined FROM j) AS n_joined,
        |  (SELECT n_orph FROM orph) = 0 AS no_orphans,
        |  (SELECT n_joined FROM j) = (SELECT n_post FROM post) AS sample_commutes_with_join""".stripMargin,
    "q172_temperature_mix" ->
      """WITH n AS (SELECT source, count(*) AS ns FROM documents GROUP BY source),
        |w AS (SELECT source, CAST(round(sqrt(CAST(ns AS DOUBLE)), 6) AS DECIMAL(18,6)) AS w FROM n),
        |t AS (SELECT source,
        |        CAST(floor(200 * CAST(w AS DOUBLE) /
        |          (SELECT CAST(sum(w) AS DOUBLE) FROM w)) AS BIGINT) AS target
        |      FROM w),
        |r AS (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY source
        |                           ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
        |      FROM documents)
        |SELECT r.doc_id, r.source FROM r JOIN t USING (source) WHERE rn <= t.target""".stripMargin,
    "q149_bpe_merges" -> bpeOracleSql(10),
    "q150_bpe_tokenize" -> bpeTokenizeOracleSql(10),
    "q143_shuffle_shard" ->
      """WITH b AS (SELECT doc_id,
        |    md5('epoch1|' || CAST(doc_id AS VARCHAR)) AS h,
        |    CAST(('0x' || substr(md5('epoch1|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 8 AS shard
        |  FROM documents)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INT) AS pos
        |FROM b""".stripMargin,
    "q144_importance_sample" ->
      """WITH b AS (SELECT doc_id, lang,
        |    greatest(least(n_chars / 500.0, 0.9), 0.05) AS p,
        |    CAST(('0x' || substr(md5('imp|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 10000 AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, p, 1.0 / p AS w FROM b WHERE bucket < p * 10000""".stripMargin,
    // the oracle redraws the identical md5 keys: the A-ES math is plain SQL,
    // so the sample is cross-engine reproducible (ln ulp differences cannot
    // flip an ordering whose key gaps are ~1/n² of the unit interval)
    "q158_weighted_sample" ->
      """WITH d AS (SELECT lang, doc_id,
        |    ln((CAST(('0x' || substr(md5('ws|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
        |       / 1152921504606846976.0) / n_chars AS key
        |  FROM documents),
        |r AS (SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id) AS rk
        |  FROM d)
        |SELECT lang, doc_id, rk FROM r WHERE rk <= 3""".stripMargin,
    // md5 hex strings compare identically in both engines, so the kept
    // set is reproducible; the quota is the minority class's exact count
    "q165_class_balance" ->
      """WITH r AS (SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('bal|' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents),
        |m AS (SELECT min(cnt) AS n_min FROM
        |      (SELECT count(*) AS cnt FROM documents GROUP BY lang))
        |SELECT lang, doc_id FROM r, m WHERE rk <= n_min""".stripMargin,
    "q146_mad_outliers" ->
      """WITH li AS (SELECT l_returnflag, l_extendedprice AS x FROM lineitem),
        |m AS (SELECT l_returnflag, round(quantile_cont(x, 0.5), 4) AS med
        |      FROM li GROUP BY l_returnflag),
        |d AS (SELECT li.l_returnflag, x, med FROM li JOIN m USING (l_returnflag)),
        |md AS (SELECT l_returnflag, round(quantile_cont(abs(x - med), 0.5), 4) AS mad
        |       FROM d GROUP BY l_returnflag)
        |SELECT d.l_returnflag, count(*) AS n, min(d.med) AS med, min(md.mad) AS mad,
        |  CAST(sum(CASE WHEN abs(x - med) > 3 * 1.4826 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN md USING (l_returnflag) GROUP BY d.l_returnflag""".stripMargin,
    "q111_corpus_mix" ->
      """WITH b AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5(source || '|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS bucket,
        |    CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 2300
        |         WHEN source IN ('src5','src6','src7','src8','src9') THEN 1000
        |         WHEN source IN ('src10','src11','src12','src13','src14') THEN 350
        |         ELSE 1500 END AS milli
        |  FROM documents),
        |c AS (SELECT doc_id, source,
        |        CAST(milli // 1000 + CASE WHEN bucket < milli % 1000 THEN 1 ELSE 0 END AS BIGINT) AS n_copies
        |      FROM b)
        |SELECT doc_id, source, n_copies FROM c WHERE n_copies > 0""".stripMargin,
    "q105_sliding_chunks" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
        |n AS (SELECT doc_id, ws, len(ws) AS n FROM d),
        |c AS (SELECT doc_id, ws, n,
        |        CASE WHEN n <= 30 THEN 1 ELSE (n - 30 + 14) // 15 + 1 END AS nc
        |      FROM n),
        |e AS (SELECT doc_id, ws, n, unnest(generate_series(0, nc - 1)) AS chunk_idx FROM c),
        |s AS (SELECT doc_id, chunk_idx,
        |        ws[chunk_idx*15 + 1 : least(chunk_idx*15 + 30, n)] AS cw
        |      FROM e)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |       CAST(len(cw) AS INT) AS n_words,
        |       md5(array_to_string(cw, ' ')) AS chunk_md5
        |FROM s""".stripMargin,
    "q89_chunk_assembly" ->
      """WITH packed AS (
        |  SELECT lang, doc_id, text, tokens,
        |    CAST(floor((cum - tokens) / 512) AS BIGINT) AS chunk_id
        |  FROM (
        |    SELECT lang, doc_id, text, tokens,
        |      sum(tokens) OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |    FROM (SELECT lang, doc_id, text,
        |            len(string_split_regex(trim(text), '\s+')) AS tokens
        |          FROM documents)))
        |SELECT lang, chunk_id, count(*) AS n_docs,
        |  CAST(sum(tokens) AS BIGINT) AS total_tokens,
        |  md5(string_agg(text, chr(10) ORDER BY doc_id)) AS chunk_md5
        |FROM packed GROUP BY lang, chunk_id""".stripMargin,
    "q84_sequence_pack" ->
      """SELECT lang, doc_id, tokens,
        |  CAST(floor((cum - tokens) / 512) AS BIGINT) AS chunk_id
        |FROM (
        |  SELECT lang, doc_id, tokens,
        |    sum(tokens) OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM (SELECT lang, doc_id,
        |          len(string_split_regex(trim(text), '\s+')) AS tokens
        |        FROM documents))""".stripMargin,
    "q88_winsorize" ->
      """WITH b AS (SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.05) AS p05,
        |    quantile_cont(l_extendedprice, 0.95) AS p95
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, count(*) AS n,
        |  CAST(sum(CASE WHEN l_extendedprice < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        |  CAST(sum(CASE WHEN l_extendedprice > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
        |  CAST(sum(CAST(round(least(greatest(l_extendedprice, p05), p95), 2) AS DECIMAL(18,2))) AS DOUBLE) AS sum_clipped
        |FROM lineitem l JOIN b USING (l_returnflag)
        |GROUP BY l.l_returnflag""".stripMargin,
    "q79_contamination" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS words FROM documents),
        |g AS (SELECT doc_id, array_to_string(words[i:i+2], ' ') AS gram
        |      FROM w, UNNEST(generate_series(1, len(words)-2)) AS t(i) WHERE len(words) >= 3),
        |b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
        |SELECT doc_id, count(DISTINCT gram) AS n_shared
        |FROM g JOIN b USING (gram) WHERE doc_id % 97 <> 0 GROUP BY doc_id""".stripMargin,
    "q65_hash_split" ->
      """WITH b AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS bucket
        |  FROM documents),
        |s AS (SELECT doc_id,
        |    CASE WHEN bucket < 80 THEN 'train'
        |         WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split FROM b)
        |SELECT split, count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM s GROUP BY split""".stripMargin,
    "q66_ngram_topk" ->
      """WITH w AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |g AS (SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
        |      FROM w WHERE len(w) >= 2)
        |SELECT bigram, count(*) AS n FROM g GROUP BY bigram
        |ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "q67_regexp_counts" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, 'tab[a-z]*')) AS INT) AS n_tab,
        |  CAST(len(regexp_extract_all(text, '\b(fast|slow)\b')) AS INT) AS n_speed,
        |  CASE WHEN regexp_matches(text, 'tab[a-z]*')
        |       THEN regexp_extract(text, 'tab[a-z]*') ELSE '' END AS first_tab
        |FROM documents""".stripMargin,
    "q68_redact_scrub" ->
      """SELECT doc_id,
        |  md5(regexp_replace(text, '\b(the|a|of|to)\b', '_', 'g')) AS scrub_md5,
        |  length(regexp_replace(text, '\b(the|a|of|to)\b', '_', 'g')) AS scrub_len,
        |  length(text) - length(regexp_replace(text, '\b(the|a|of|to)\b', '', 'g')) AS removed_chars
        |FROM documents""".stripMargin,
    "q69_length_histogram" ->
      """SELECT CAST(floor(n_chars / 100.0) AS BIGINT) AS bin,
        |  count(*) AS n_docs, min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1""".stripMargin,
    "q70_lang_quality_topk" ->
      """WITH d AS (SELECT doc_id, lang, text,
        |    string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents),
        |r AS (SELECT doc_id, lang,
        |    round(CAST(len(list_filter(ws, x ->
        |      x IN ('the','and','of','to','a','in','is','it'))) AS DOUBLE) /
        |      greatest(len(ws), 1), 4) AS stop_ratio,
        |    round(CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE) /
        |      greatest(length(text), 1), 4) AS punct_ratio,
        |    least(CAST(len(ws) AS DOUBLE) / 50.0, 1.0) AS len_score
        |  FROM d),
        |q AS (SELECT doc_id, lang,
        |    floor((len_score * 0.5 + stop_ratio * 2.0 * 0.25 +
        |           (1.0 - punct_ratio) * 0.25) * 10000.0) / 10000.0 AS quality
        |  FROM r),
        |rk AS (SELECT lang, doc_id, quality,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS INT) AS rk
        |  FROM q)
        |SELECT lang, doc_id, quality, rk FROM rk WHERE rk <= 5""".stripMargin,
    "q71_edit_distance" ->
      """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
        |  a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        | AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 8""".stripMargin,
    "q74_stratified_sample" ->
      """WITH b AS (SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS bucket,
        |    CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 40 WHEN 'fr' THEN 30
        |              WHEN 'es' THEN 20 ELSE 10 END AS rate
        |  FROM documents)
        |SELECT doc_id, lang FROM b WHERE bucket < rate""".stripMargin,
    "q72_token_quantiles" ->
      """WITH t AS (SELECT lang,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS n_tok
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  round(quantile_cont(n_tok, 0.25), 4) AS q25,
        |  round(quantile_cont(n_tok, 0.5), 4) AS q50,
        |  round(quantile_cont(n_tok, 0.75), 4) AS q75
        |FROM t GROUP BY lang""".stripMargin,
  )
}
