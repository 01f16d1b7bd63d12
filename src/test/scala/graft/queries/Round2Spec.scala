package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Invariants for the round-2 additions: Unique-model delete tombstones,
  * metadata-only count, and the corpus-preparation operators (q63-q72).
  */
class Round2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // --- engine: delete tombstones -------------------------------------------

  test("delete tombstones: %7 keys gone, %14 keys resurrected with new value") {
    val out = EngineQueries.deleteTombstones(spark, dir)
    val ids = out.select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(!ids.exists(id => id % 7 == 0 && id % 14 != 0), "tombstoned keys must vanish")
    val n14 = out.filter(col("event_id") % 14 === 0).count()
    assert(n14 > 0, "re-inserted keys must reappear")
    val resurrected = out.filter(col("event_id") % 14 === 0 && col("value") >= 5000.0).count()
    assert(resurrected == n14, "re-inserted keys carry the v3 value")
  }

  test("delete tombstones survive compaction (physical delete)") {
    val eng = EngineFixture.get(spark, dir)
    val before = eng.scan("graft", "events_del")
      .select(col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    eng.compact("graft", "events_del")
    val after = eng.scan("graft", "events_del")
      .select(col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(after == before, "compaction must preserve merge-on-read semantics")
  }

  test("countStar: metadata count equals scan count on Duplicate table") {
    val eng = EngineFixture.get(spark, dir)
    val meta = eng.countStar("graft", "orders_dup")
    val scanned = eng.scan("graft", "orders_dup").count()
    assert(meta == scanned)
  }

  // --- corpus operators ------------------------------------------------------

  test("hash split: buckets partition the corpus 80/10/10-ish and cover it") {
    val rows = graft.pipeline.Corpus.hashSplit(spark, dir).collect()
    val byName = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = byName.values.sum
    assert(total == spark.read.parquet(s"$dir/documents.parquet").count())
    assert(byName.keySet == Set("train", "val", "test"))
    assert(byName("train") > byName("val") && byName("train") > byName("test"))
  }

  test("bigram top-k: counts are positive, k rows, deterministic across runs") {
    val a = graft.pipeline.Corpus.ngramTopK(spark, dir).collect()
    val b = graft.pipeline.Corpus.ngramTopK(spark, dir).collect()
    assert(a.length == 20 && a.sameElements(b))
    assert(a.forall(_.getLong(1) > 0))
  }

  test("redact scrub: removed_chars is consistent with length delta") {
    val out = graft.pipeline.Corpus.redactScrub(spark, dir).collect()
    assert(out.forall(_.getInt(3) >= 0))
    assert(out.exists(_.getInt(3) > 0), "stopwords exist in the corpus")
  }

  test("length histogram: bin totals cover the corpus") {
    val n = graft.pipeline.Corpus.lengthHistogram(spark, dir)
      .agg(sum(col("n_docs"))).first().getLong(0)
    assert(n == spark.read.parquet(s"$dir/documents.parquet").count())
  }

  test("lang quality top-k: exactly k rows per language, ranks 1..k") {
    val out = graft.pipeline.Corpus.langQualityTopK(spark, dir).collect()
    val perLang = out.groupBy(_.getString(0))
    assert(perLang.values.forall(_.length == 5))
    assert(perLang.values.forall(_.map(_.getInt(3)).sorted.toSeq == (1 to 5)))
  }

  test("edit distance pairs: symmetric-free (a<b), distance within threshold") {
    val out = graft.pipeline.Corpus.editDistancePairs(spark, dir).collect()
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.forall(r => r.getInt(4) <= 8))
  }

  test("incremental read: exactly the v[2,3] rowset (odd order keys)") {
    val out = EngineQueries.incrementalRead(spark, dir)
    assert(out.filter(col("o_orderkey") % 2 === 0).count() == 0)
    val expected = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") % 2 === 1).count()
    assert(out.count() == expected)
  }

  test("stratified sample: rates are honored per language, deterministic") {
    val s = graft.pipeline.Corpus.stratifiedSample(spark, dir)
    val got = s.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en sampled at 60% must keep more of its stratum than es at 20%
    assert(got("en").toDouble / base("en") > got("es").toDouble / base("es"))
    val again = graft.pipeline.Corpus.stratifiedSample(spark, dir).count()
    assert(again == s.count(), "hash sampling is deterministic")
  }

  test("stream-static join: totals match the batch join") {
    val out = graft.streaming.StreamingQueries.streamStaticJoin(spark, dir)
    val streamTotal = out.agg(sum(col("n"))).first().getLong(0)
    val batchTotal = graft.queries.Tables.events(spark, dir)
      .join(spark.read.parquet(s"$dir/customer.parquet"),
        col("user_id") === col("c_custkey"))
      .count()
    assert(streamTotal == batchTotal)
  }

  test("token quantiles: q25 <= q50 <= q75 per language") {
    val out = graft.pipeline.Corpus.tokenQuantiles(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getDouble(2) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(4)))
  }

  test("stream-stream join: pair counts match the batch interval join") {
    val out = graft.streaming.StreamingQueries.streamStreamJoin(spark, dir)
    val streamTotal = out.agg(sum(col("n_pairs"))).first().getLong(0)
    val e = graft.queries.Tables.events(spark, dir)
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val batchTotal = c.join(p, expr(
      "cu = pu AND pts >= cts AND pts <= cts + INTERVAL 24 HOURS")).count()
    assert(streamTotal == batchTotal && streamTotal > 0)
  }

  test("sequence pack: chunk ids start at 0, are non-decreasing, bounded by total tokens") {
    val out = graft.pipeline.Corpus.sequencePack(spark, dir).collect()
    assert(out.length == spark.read.parquet(s"$dir/documents.parquet").count())
    val perLang = out.groupBy(_.getString(0))
    perLang.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.head.getLong(3) == 0L)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getLong(3) <= b.getLong(3); case _ => true })
      val total = rows.map(_.getLong(2)).sum
      assert(rows.map(_.getLong(3)).max <= total / 512)
    }
  }

  test("tfidf: at most k terms per doc, scores non-negative and descending") {
    val out = graft.pipeline.TextAnalysis.tfidf(spark, dir).collect()
    val perDoc = out.groupBy(_.getLong(0))
    assert(perDoc.nonEmpty && perDoc.values.forall(_.length <= 3))
    assert(out.forall(_.getDouble(2) >= 0.0))
  }

  test("stats agg: correlation within [-1,1], variances positive") {
    val out = graft.queries.Relational.statsAgg(spark, dir).collect()
    assert(out.length == 3)
    assert(out.forall(r => math.abs(r.getDouble(1)) <= 1.0))
    assert(out.forall(r => r.getDouble(3) > 0 && r.getDouble(4) > 0))
  }

  test("profile: one row per column, key column is unique and null-free") {
    val out = graft.queries.Relational.profileTable(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("o_orderkey", "o_orderstatus", "o_totalprice"))
    val k = out("o_orderkey")
    assert(k.getLong(2) == 0L && k.getLong(3) == k.getLong(1))
    assert(out.values.forall(r => r.getLong(3) <= r.getLong(1)))
  }

  test("winsorize: ~5% clipped each side, clipped sum within [n*p05, n*p95]") {
    val out = graft.pipeline.Corpus.winsorize(spark, dir).collect()
    val bounds = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.05)").as("p05"),
        expr("percentile(l_extendedprice, 0.95)").as("p95")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { r =>
      val n = r.getLong(1)
      assert(r.getLong(2) <= n * 6 / 100 && r.getLong(3) <= n * 6 / 100)
      val (p05, p95) = bounds(r.getString(0))
      assert(r.getDouble(4) >= n * p05 - 1 && r.getDouble(4) <= n * p95 + 1)
    }
  }

  test("chunk assembly: chunk doc counts and token totals reconcile with sequence pack") {
    val packed = graft.pipeline.Corpus.sequencePack(spark, dir)
      .groupBy(col("lang"), col("chunk_id"))
      .agg(count(lit(1)).as("n"), sum(col("tokens")).as("t")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val chunks = graft.pipeline.Corpus.chunkAssembly(spark, dir).collect()
    assert(chunks.nonEmpty && chunks.length == packed.size)
    chunks.foreach { r =>
      val (n, t) = packed((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) == n && r.getLong(3) == t)
      assert(r.getString(4).length == 32)
    }
  }

  test("zscore: group mean of z is ~0 over the full table") {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val m = o.groupBy(col("o_orderstatus"))
      .agg(avg(col("o_totalprice")).as("mu"),
        expr("stddev_pop(o_totalprice)").as("sd"))
    val z = o.join(broadcast(m), "o_orderstatus")
      .select(((col("o_totalprice") - col("mu")) / col("sd")).as("z"))
      .agg(avg(col("z"))).first().getDouble(0)
    assert(math.abs(z) < 1e-9)
    val out = graft.queries.Relational.zscore(spark, dir).collect()
    assert(out.length == 400 && out.forall(r => math.abs(r.getDouble(2)) < 20))
  }

  test("star join: broadcast dims, nonempty revenue, all rows from ASIA nations") {
    val out = graft.queries.Relational.starJoin(spark, dir)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
    val rows = out.collect()
    assert(rows.nonEmpty && rows.forall(_.getDouble(1) > 0))
    val asiaNations = spark.read.parquet(s"$dir/nation.parquet")
      .join(spark.read.parquet(s"$dir/region.parquet")
          .filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name")).collect().map(_.getString(0)).toSet
    assert(rows.forall(r => asiaNations.contains(r.getString(0))))
  }

  test("share of total: shares sum to ~1 and group revenues reconcile") {
    val out = graft.queries.Relational.shareOfTotal(spark, dir).collect()
    assert(out.length == 6)
    val shareSum = out.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
    assert(out.forall(r => r.getDouble(2) > 0 && r.getDouble(3) > 0))
  }

  test("media resize: fixed-size thumbnails, md5 matches a local recompute") {
    val out = graft.pipeline.Multimodal.resize(spark, dir).collect()
    assert(out.length == spark.read.parquet(s"$dir/documents.parquet").count())
    assert(out.forall(_.getInt(2) == 16))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.take(20).foreach { r =>
      val payload = docs(r.getLong(0)).getBytes("UTF-8")
      val local = graft.pipeline.Multimodal.resizeTo(
        graft.pipeline.Multimodal.MediaRow(r.getLong(0), payload, "text/plain"), 16)
      assert(r.getString(3) == local.resized_md5)
      assert(r.getLong(1) == payload.length.toLong)
    }
  }

  test("asof forward: next click is at-or-after the purchase, earliest such") {
    val ev = graft.queries.Tables.events(spark, dir)
    val clickTs = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("ts")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val purchaseTs = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val out = graft.operators.AsOfJoin.purchaseNextClick(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      if (!r.isNullAt(2)) {
        val pts = purchaseTs(r.getLong(0))
        assert(!clickTs(r.getLong(2)).before(pts))
      }
    }
    assert(out.exists(!_.isNullAt(2)))
  }

  test("map funcs: n_lines equals distinct linenumbers, probes match direct lookup") {
    val out = graft.queries.Relational.mapFuncs(spark, dir).collect()
    val base = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") < 300)
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_linenumber")).as("n"),
        max(col("l_linenumber")).as("mx")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, mx) = base(r.getLong(0))
      assert(r.getInt(1).toLong == n && r.getInt(4) == mx)
    }
  }

  test("global sort: plan uses range partitioning and output is totally ordered") {
    val df = graft.queries.Relational.globalSort(spark, dir)
    assert(df.queryExecution.executedPlan.toString.contains("rangepartitioning"))
    val prices = df.collect().map(_.getDouble(1))
    assert(prices.nonEmpty)
    assert(prices.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("keep first: one row per (user, type), each is that group's earliest event") {
    val out = graft.queries.Relational.keepFirst(spark, dir).collect()
    val groups = graft.queries.Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts")).as("mn")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getTimestamp(2)).toMap
    assert(out.length == groups.size)
    val ts = graft.queries.Tables.events(spark, dir)
      .select(col("event_id"), col("ts")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    out.foreach { r =>
      assert(ts(r.getLong(0)) == groups((r.getLong(1), r.getString(2))))
    }
  }

  test("posexplode: positions are 0..n-1 per doc and words match q56") {
    val out = graft.queries.Relational.posExplodeWords(spark, dir)
    val perDoc = out.groupBy(col("doc_id"))
      .agg(min(col("pos")).as("lo"), max(col("pos")).as("hi"),
        count(lit(1)).as("n")).collect()
    assert(perDoc.nonEmpty)
    assert(perDoc.forall(r => r.getInt(1) == 0 && r.getLong(3) == r.getInt(2) + 1L))
    assert(out.count() == graft.queries.Relational.explodeWords(spark, dir).count())
  }
}
