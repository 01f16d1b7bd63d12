package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.operators.TimeSeries

/** Invariants for the frequency/time-series operators: the Misra–Gries
  * candidate pass must never lose a true heavy hitter (whatever the
  * partitioning), the confirm pass must reproduce the exact heavy set, the
  * EWMA linear scan must equal the closed-form recurrence, and the
  * duplicated-passage counts must respect their set-algebra bounds.
  */
class FrequencySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("heavy hitters: exact heavy set on a skewed corpus, any partitioning") {
    import spark.implicits._
    // skewed stream: 'a' 40x, 'b' 25x, 'c' 10x, 60 distinct singletons
    val words = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c") ++
      (0 until 60).map(i => s"w$i")
    val n = words.size // 135
    for (cap <- Seq(2, 3, 5, 29); parts <- Seq(1, 3, 7)) {
      val tokens = spark.sparkContext.parallelize(words, parts).toDF("word")
      val got = Frequency.heavyHittersOf(tokens, cap)
        .as[(String, Long)].collect().toMap
      val expected = words.groupBy(identity).view
        .mapValues(_.size.toLong)
        .filter { case (_, c) => c * (cap + 1) > n }.toMap
      assert(got == expected, s"cap=$cap parts=$parts")
    }
  }

  test("heavy hitters property: random Zipf-ish corpora match exact GROUP BY") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val words = (0 until 500).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 30) "hot" else if (r < 45) "warm" else s"t${rnd.nextInt(200)}"
      }
      val cap = 9
      val tokens = spark.sparkContext.parallelize(words, 4).toDF("word")
      val got = Frequency.heavyHittersOf(tokens, cap)
        .as[(String, Long)].collect().toMap
      val expected = words.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * (cap + 1) > words.size }.toMap
      assert(got == expected, s"trial=$trial")
    }
  }

  test("ewma: linear scan equals the hand-computed recurrence") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      (1L, t(1), 10L, 1.0), (1L, t(2), 11L, 2.0), (1L, t(3), 12L, 3.0),
      (2L, t(5), 20L, 8.0),
      (3L, t(1), 30L, 4.0), (3L, t(1), 31L, 6.0) // same ts: event_id breaks tie
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.ewmaOf(ev, 0.5)
      .as[(Long, Long, Double)].collect().map { case (u, n, e) => u -> ((n, e)) }.toMap
    // user 1: e=1 -> 0.5*2+0.5*1=1.5 -> 0.5*3+0.5*1.5=2.25
    assert(got(1L) == ((3L, 2.25)))
    assert(got(2L) == ((1L, 8.0)))
    // user 3: e=4 -> 0.5*6+0.5*4=5.0 (event_id order, not input order)
    assert(got(3L) == ((2L, 5.0)))
  }

  test("ewma on the events table equals the closed-form window formulation") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, dir)
    // closed form: e_n = sum x_i * w_i, w_1 = (1-a)^(n-1), w_i = a*(1-a)^(n-i)
    val byUser = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val closed = ev
      .withColumn("rn", row_number().over(byUser.orderBy(col("ts"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(byUser))
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n_events"),
        round(sum(col("value") *
          when(col("rn") === 1, pow(lit(0.5), col("n") - 1))
            .otherwise(pow(lit(0.5), col("n") - col("rn") + 1))), 4).as("ewma"))
      .as[(Long, Long, Double)].collect().map { case (u, n, e) => u -> ((n, e)) }.toMap
    val got = TimeSeries.ewmaOf(ev, 0.5)
      .as[(Long, Long, Double)].collect().map { case (u, n, e) => u -> ((n, e)) }.toMap
    assert(got == closed)
  }

  test("cross-corpus leakage: spans, exact coverage, and clean docs absent") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated training words here")).toDF("doc_id", "text")
    val test = Seq(
      // words 3..7 ("brown fox jumps over the") covered via 3-grams at
      // positions 3,4,5 → one span of 5 words; 9 words total → frac 5/9
      (10L, "alpha beta brown fox jumps over the gamma delta"),
      // two DISJOINT leaked runs: "quick brown fox" (pos 1) and
      // "the lazy dog" (pos 7) → 2 spans of 3; distinct coverage 6 of 9
      (11L, "quick brown fox one two three the lazy dog"),
      (12L, "nothing shared with training at all honestly")).toDF("doc_id", "text")
    val got = Frequency.crossCorpusLeakageOf(train, test, 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(got.keySet === Set(10L, 11L), s"clean doc must be absent: $got")
    assert(got(10L) === ((1L, 5L, 5L, 9L, 0.5556)))
    // doc 11: 10 words ("quick brown fox one two three the lazy dog" = 9)…
    assert(got(11L)._1 === 2L, s"two disjoint spans: ${got(11L)}")
    assert(got(11L)._3 === 6L, s"distinct coverage 6: ${got(11L)}")
  }

  test("dup passages: shared counts bounded by totals; unique doc shares nothing") {
    import spark.implicits._
    val docsDf = Seq(
      (0L, "alpha beta gamma delta"),        // shares 'alpha beta gamma' with 1
      (1L, "alpha beta gamma epsilon"),
      (2L, "zeta eta theta iota kappa")      // entirely unique
    ).toDF("doc_id", "text")
    val got = Frequency.dupPassagesOf(docsDf, 3)
      .as[(Long, Long, Long)].collect().map { case (d, g, s) => d -> ((g, s)) }.toMap
    assert(got(0L) == ((2L, 1L))) // grams: 'a b g' (shared), 'b g d'
    assert(got(1L) == ((2L, 1L)))
    assert(got(2L) == ((3L, 0L)))
  }

  test("hll intersect: verdict holds and the exact count matches a plain join") {
    val dir = "/root/testdata/sf0.001"
    val row = Frequency.hllIntersect(spark, dir).collect().head
    assert(row.getAs[Boolean]("ok"),
      "inclusion-exclusion estimate drifted beyond 15% of exact")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val exact = o.filter(col("o_orderstatus") === "O").select("o_custkey")
      .intersect(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
      .count()
    assert(row.getAs[Long]("exact_intersection") == exact)
  }

  test("semantic dedup audit: within-block pairs clear the recall floor") {
    val row = graft.pipeline.Similarity
      .semanticDedupAudit(spark, "/root/testdata/sf0.001").collect().head
    assert(row.getAs[Boolean]("ok"), "multi-assign cell blocking lost recall")
  }

  test("weighted sample: WOR semantics, k per stratum, weight dominance") {
    import spark.implicits._
    // one overwhelming weight per stratum must always be drawn: its key
    // ln(u)/w ~ 0- beats any realistic competitor key
    val documents = (
      Seq(("en", 0L, 1000000000L), ("de", 100L, 1000000000L)) ++
        (1L to 50L).map(i => ("en", i, 10L)) ++
        (101L to 150L).map(i => ("de", i, 10L))
      ).toDF("lang", "doc_id", "n_chars")
    val got = Corpus.weightedSampleOf(documents, 3)
      .as[(String, Long, Int)].collect()
    assert(got.length == 6) // 3 per stratum
    assert(got.map(r => (r._1, r._2)).distinct.length == 6) // no replacement
    val top = got.filter(_._3 == 1).map(r => r._1 -> r._2).toMap
    assert(top("en") == 0L && top("de") == 100L,
      "the 10^8x-weight doc must win its stratum")
    // deterministic: a second evaluation draws the identical sample
    val again = Corpus.weightedSampleOf(documents, 3)
      .as[(String, Long, Int)].collect()
    assert(got.sortBy(r => (r._1, r._3)).toSeq == again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("sliding distinct: every window equals a brute-force range recount") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, dir)
    val got = TimeSeries.slidingDistinct(spark, dir)
      .select(col("win_start").cast("long"), col("ndv"))
      .as[(Long, Long)].collect().toMap
    // brute force: for each emitted window start, recount users in
    // [start, start + 1h) directly from the raw table
    val raw = ev.select(col("ts").cast("long").as("s"), col("user_id"))
      .as[(Long, Long)].collect()
    got.foreach { case (start, ndv) =>
      val brute = raw.filter { case (s, _) => s >= start && s < start + 3600 }
        .map(_._2).distinct.length
      assert(brute.toLong == ndv, s"window $start")
    }
    // overlap factor: total window memberships = 4x event count
    assert(raw.length * 4L ==
      ev.groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n")).agg(sum("n")).as[Long].head())
  }

  test("class balance: every language keeps exactly the minority count, deterministically") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val kept = Corpus.classBalance(spark, dir)
      .as[(String, Long)].collect()
    val perClass = kept.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perClass.values.toSet.size == 1, s"unbalanced: $perClass")
    val trueMin = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(col("lang")).count().agg(min("count")).as[Long].head()
    assert(perClass.values.head.toLong == trueMin)
    // kept docs are a subset of their class, and the draw is reproducible
    val again = Corpus.classBalance(spark, dir).as[(String, Long)].collect()
    assert(kept.sortBy(_._2).toSeq == again.sortBy(_._2).toSeq)
  }

  test("ewma anomalies: first events never flagged; stream drain == batch bit-for-bit") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batch = TimeSeries.ewmaAnomalies(spark, dir)
      .as[(Long, Long, Option[Double], Boolean)].collect().toSet
    // no user's first event can be an anomaly (no history to deviate from)
    val firstIds = graft.queries.Tables.events(spark, dir)
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") === 1).select("event_id").as[Long].collect().toSet
    batch.filter(r => firstIds(r._2)).foreach { r =>
      assert(r._3.isEmpty && !r._4, s"first event ${r._2} must be unflagged")
    }
    assert(batch.exists(_._4), "the band should flag at least one real deviation")
    // the streaming stateful form must reproduce the batch fold exactly
    val stream = graft.streaming.StreamingQueries.all("q162_stream_ewma_anomalies")(spark, dir)
      .as[(Long, Long, Option[Double], Boolean)].collect().toSet
    assert(stream == batch)
  }

  test("semantic dedup pairs with maxCell are a subset of the uncapped pairs") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toSet
    val uncapped = pairs(Similarity.semanticDedupPairs(spark, dir))
    val capped = pairs(Similarity.semanticDedupPairs(spark, dir, maxCell = Some(20)))
    assert(capped.subsetOf(uncapped))
    // a cap nothing exceeds reproduces the exhaustive answer exactly
    val lax = pairs(Similarity.semanticDedupPairs(spark, dir, maxCell = Some(1000000)))
    assert(lax == uncapped)
    assert(uncapped.nonEmpty)
  }

  test("count-min: estimates dominate exact counts; exact when w >> keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = (0 until 800).map(_ => s"t${rnd.nextInt(50)}")
    val tokens = spark.sparkContext.parallelize(words, 3).toDF("word")
    val probes = tokens.groupBy("word").agg(count(lit(1)).as("n_occurrences"))
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Frequency.countMinOf(tokens, probes, 4, 512)
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.length == exact.size)
    got.foreach { case (w, ne, nc, ok) =>
      assert(ne == exact(w), w)
      assert(nc >= ne && ok, s"$w: CMS estimate $nc below exact $ne")
    }
    // 50 keys in 4x512 cells: a key colliding in ALL 4 rows is ~1e-4
    // unlikely and deterministic given the md5 hashing — estimates are exact
    assert(got.forall { case (_, ne, nc, _) => nc == ne })
  }

  test("count-min: a tight matrix over-estimates but never under-estimates") {
    import spark.implicits._
    val words = (0 until 400).map(i => s"k${i % 40}")
    val tokens = spark.sparkContext.parallelize(words, 2).toDF("word")
    val probes = tokens.groupBy("word").agg(count(lit(1)).as("n_occurrences"))
    // 40 keys into 2x8 cells: collisions guaranteed
    val got = Frequency.countMinOf(tokens, probes, 2, 8)
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.forall { case (_, ne, nc, ok) => nc >= ne && ok })
    assert(got.exists { case (_, ne, nc, _) => nc > ne },
      "40 keys in 16 cells must collide somewhere")
  }

  test("dup spans: maximal cross-doc runs merge; within-doc repeats don't count") {
    import spark.implicits._
    val documents = Seq(
      (1L, "a b c d e x1 y1 z1"),        // shares "a b c d e" with doc 2
      (2L, "q a b c d e r s"),
      (3L, "m n o p"),                    // nothing shared
      (4L, "a b c 1 2 3 4 x y z 5"),      // two separated spans vs doc 5
      (5L, "a b c x y z"),
      (6L, "u v w u v w u v w")           // self-repeats only: no spans
    ).toDF("doc_id", "text")
    val got = Frequency.dupSpansOf(documents, 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // docs 1/2: one maximal 5-word span ("a b c d e" -> 3 consecutive grams)
    assert(got(1L) == ((1L, 5L, 5L)))
    assert(got(2L) == ((1L, 5L, 5L)))
    // doc 4: "a b c" and "x y z" spans; doc 5 the same two
    assert(got(4L) == ((2L, 3L, 6L)))
    assert(got(5L) == ((2L, 3L, 6L)))
    assert(!got.contains(3L) && !got.contains(6L))
  }

  test("span scrub: covered words removed, order kept, fully-dup docs drop") {
    import spark.implicits._
    val documents = Seq(
      (1L, "a b c d e x1 y1 z1"),   // "a b c d e" covered vs doc 2
      (2L, "q a b c d e r s"),
      (3L, "m n o p"),               // untouched
      (4L, "a b c d e")              // ENTIRELY covered -> drops out
    ).toDF("doc_id", "text")
    val got = Frequency.spanScrubOf(documents, 3)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((8L, 3L, 5L, "x1 y1 z1")))
    assert(got(2L) == ((8L, 3L, 5L, "q r s")))
    assert(got(3L) == ((4L, 4L, 0L, "m n o p")))
    assert(!got.contains(4L), "a fully-covered doc must drop out")
    // conservation: kept + removed = total, and scrubbing the scrubbed
    // corpus is a fixed point when nothing is shared anymore
    got.values.foreach { case (nw, nk, nr, _) => assert(nk + nr == nw) }
    val rescrub = Frequency.spanScrubOf(
      got.toSeq.map { case (id, (_, _, _, t)) => (id, t) }.toDF("doc_id", "text"), 3)
      .as[(Long, Long, Long, Long, String)].collect()
    rescrub.foreach { r => assert(r._4 == 0L, s"doc ${r._1} still shares spans") }
  }

  test("prefix-filter join: lossless vs brute force on random dense corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 3; t <- Seq(0.5, 0.8)) {
      val vocab = (0 until 20).map(i => s"w$i")
      val corpus = (0 until 30).map { id =>
        val n = 4 + rnd.nextInt(8)
        (id.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val documents = spark.sparkContext.parallelize(corpus, 3).toDF("doc_id", "text")
      val got = Dedup.prefixFilterJoinOf(documents, t)
        .as[(Long, Long, Double)].collect().toSet
      val sets = corpus.map { case (id, s) => id -> s.split("\\s+").toSet }.toMap
      val expected = (for {
        a <- sets.keys; b <- sets.keys if a < b
        inter = (sets(a) & sets(b)).size
        j = inter.toDouble / (sets(a).size + sets(b).size - inter)
        if j >= t
      } yield (a, b, BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
      assert(got == expected, s"trial=$trial t=$t")
      // blocked run = the unblocked join's same-block subset
      val blocked = Dedup.prefixFilterJoinOf(
        documents.withColumn("source", (col("doc_id") % 3).cast("string")),
        t, Some("source")).as[(Long, Long, Double)].collect().toSet
      assert(blocked == expected.filter { case (a, b, _) => a % 3 == b % 3 })
    }
  }

  test("containment join: lossless vs brute force on random dense corpora, " +
    "asymmetric direction + canonical orientation") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 3; t <- Seq(0.7, 0.9)) {
      val vocab = (0 until 20).map(i => s"w$i")
      val corpus = (0 until 30).map { id =>
        val n = 3 + rnd.nextInt(10)
        (id.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val documents = spark.sparkContext.parallelize(corpus, 3).toDF("doc_id", "text")
      val got = Dedup.containmentJoinOf(documents, t)
        .as[(Long, Long, Double)].collect().toSet
      val sets = corpus.map { case (id, s) => id -> s.split("\\s+").toSet }.toMap
      val expected = (for {
        a <- sets.keys; b <- sets.keys
        if sets(a).size < sets(b).size ||
          (sets(a).size == sets(b).size && a < b)
        c = (sets(a) & sets(b)).size.toDouble / sets(a).size
        if c >= t
      } yield (a, b, BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
      assert(got == expected, s"trial=$trial t=$t")
    }
    // the asymmetric case Jaccard misses: a short doc quoted whole inside a
    // long one — containment 1.0, Jaccard well under 0.8
    val quote = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentJoinOf(quote, 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs == Set((1L, 2L, 1.0)))
    assert(Dedup.prefixFilterJoinOf(quote, 0.8)
      .as[(Long, Long, Double)].collect().isEmpty,
      "Jaccard must miss the quotation pair containment exists to catch")
  }

  test("vocab coverage: known OOV counts with a deterministic top-k cut") {
    import spark.implicits._
    // corpus counts: 'hot' x6, 'warm' x4, 'cold' x2, 'rare' x1 -> top-2
    // vocab is {hot, warm}
    val documents = Seq(
      (1L, "hot hot warm cold"),        // 1 OOV (cold)
      (2L, "hot hot warm warm cold"),   // 1 OOV
      (3L, "hot hot warm rare"),        // 1 OOV
      (4L, "")                          // "" token: 1 token, 1 OOV
    ).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverageOf(documents, 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((4L, 1L, 0.25)))
    assert(got(2L) == ((5L, 1L, 0.2)))
    assert(got(3L) == ((4L, 1L, 0.25)))
    assert(got(4L) == ((1L, 1L, 1.0)))
    // tie at the cut: 'b' and 'c' both x2, k=2 -> vocab {a?, ...} word-asc
    // tie-break: counts a x3, b x2, c x2 -> vocab = {a, b}
    val tied = Seq((1L, "a a a b b c c")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabCoverageOf(tied, 2)
      .as[(Long, Long, Long, Double)].collect().head
    assert(r == ((1L, 7L, 2L, 0.2857))) // the two 'c's are OOV
  }

  test("source drift: KL is zero for identical sources, positive for skew") {
    import spark.implicits._
    // two sources with IDENTICAL word distributions: corpus blend equals
    // each source, so KL = 0 exactly for both
    val same = Seq(
      ("s1", "x x y"), ("s2", "x x y")
    ).toDF("source", "text")
    val kl0 = TextAnalysis.sourceDriftOf(same)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(kl0("s1") == 0.0 && kl0("s2") == 0.0)
    // a skewed source must have strictly positive KL (Gibbs), and the
    // floor-quantized value matches a hand fold
    val skew = Seq(
      ("s1", "x x x x"), ("s2", "y y y y")
    ).toDF("source", "text")
    val klS = TextAnalysis.sourceDriftOf(skew)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // each source: p_s(w)=1, p(w)=0.5 -> KL = ln 2 = 0.693147...
    assert(klS("s1") == 0.693147 && klS("s2") == 0.693147)
  }

  test("data quality audit: clean fixture passes; injected corruption caught") {
    import spark.implicits._
    val clean = Audit.dataQuality(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(clean.size == 5)
    clean.foreach { case (c, (checked, bad)) =>
      assert(checked > 0, c); assert(bad == 0L, s"$c flagged $bad on clean data")
    }
    // corrupt copies: an orphan FK, a duplicate PK, a zero quantity, a
    // negative price, an empty doc — each rule must count exactly its own
    val tmp = java.nio.file.Files.createTempDirectory("auditc").toString
    Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 99L)) // dup key 2; custkey 99 orphan
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$tmp/orders.parquet")
    Seq((10L, "a"), (11L, "b")).toDF("c_custkey", "c_name")
      .write.parquet(s"$tmp/customer.parquet")
    Seq((1L, 5.0, 100.0), (2L, 0.0, 50.0), (3L, 3.0, -1.0))
      .toDF("l_orderkey", "l_quantity", "l_extendedprice")
      .write.parquet(s"$tmp/lineitem.parquet")
    Seq((1L, "text here"), (2L, "   ")).toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val dirty = Audit.dataQuality(spark, tmp)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(dirty("fk_orders_customer") == ((4L, 1L)))
    assert(dirty("pk_orders_unique") == ((4L, 1L)))
    assert(dirty("lineitem_qty_range") == ((3L, 1L)))
    assert(dirty("lineitem_price_positive") == ((3L, 1L)))
    assert(dirty("documents_nonempty") == ((2L, 1L)))
  }

  test("group OLS: recovers exact lines and matches a hand least-squares fit") {
    import spark.implicits._
    // source A lies exactly on y = 2x + 1; source B on y = 3 (slope 0)
    def doc(words: Int): String = Seq.fill(words)("w").mkString(" ")
    val documents = Seq(
      ("A", 1L, doc(3)), ("A", 2L, doc(5)), ("A", 3L, doc(7)),
      ("B", 10L, doc(3)), ("B", 20L, doc(3)), ("B", 30L, doc(3))
    ).toDF("source", "n_chars", "text")
    val got = Trainer.groupOlsOf(documents)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("A") == ((3L, 2.0, 1.0)))
    assert(got("B") == ((3L, 0.0, 3.0)))
    // noisy case against an explicit normal-equation fold
    val xs = Seq(1L, 2L, 4L, 7L); val ys = Seq(2L, 3L, 3L, 9L)
    val noisy = xs.zip(ys).map { case (x, y) => ("N", x, doc(y.toInt)) }
      .toDF("source", "n_chars", "text")
    val n = xs.size.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val icept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gotN = Trainer.groupOlsOf(noisy)
      .as[(String, Long, Double, Double)].collect().head
    assert(gotN == (("N", n, r6(slope), r6(icept))))
  }

  test("leakage-safe split: clusters intact, totals conserved, naive split would leak") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = Dedup.leakageSafeSplit(spark, dir)
      .as[(String, Long, Long, Boolean)].collect()
    assert(rows.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
    assert(rows.map(_._2).sum == 500L)
    rows.foreach(r => assert(r._4, s"${r._1}: cluster spans splits"))
    // the guarantee is non-vacuous on this corpus: the NAIVE per-doc hash
    // split (q65's rule) would place members of at least one near-dup
    // cluster into different splits
    val naiveLeaks = Dedup.dedupSurvivors(spark, dir)
      .withColumn("b",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100)
      .withColumn("split",
        when(col("b") < 80, "train").when(col("b") < 90, "val").otherwise("test"))
      .groupBy(col("survivor_id"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(naiveLeaks > 0, "fixture has no cluster that a naive split separates")
  }

  test("random projection: one-hot exactness, linearity, JL norm preservation") {
    import spark.implicits._
    // one-hot e_k projects to exactly the sign row s(k, j) = ±1
    val oneHot = Seq((0L, Array.fill(64)(0f).updated(5, 1f)))
      .toDF("vec_id", "embedding")
    val s5 = Similarity.projectOf(oneHot, 16)
      .as[(Long, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(s5.size == 16 && s5.values.forall(v => v == 1.0 || v == -1.0))
    // linearity on integer vectors (exact fp): P(a+b) = P(a) + P(b)
    val rnd = new scala.util.Random(5)
    val a = Array.fill(64)(rnd.nextInt(7).toFloat)
    val b = Array.fill(64)(rnd.nextInt(7).toFloat)
    val ab = a.zip(b).map { case (x, y) => x + y }
    val proj = Similarity.projectOf(
      Seq((1L, a), (2L, b), (3L, ab)).toDF("vec_id", "embedding"), 16)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    (0L until 16L).foreach { j =>
      assert(proj(3L)(j) == proj(1L)(j) + proj(2L)(j), s"dim $j")
    }
    // JL property on the real embeddings: E[|P(v)|^2 / k] = |v|^2 for ±1
    // signs, so the mean norm ratio over the corpus must sit near 1
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val ratio = Similarity.projectOf(e, 16)
      .groupBy("vec_id").agg(sum(col("y") * col("y")).as("p2"))
      .join(e.select(col("vec_id"),
        aggregate(col("embedding").cast("array<double>"), lit(0.0),
          (acc, x) => acc + x * x).as("v2")), Seq("vec_id"))
      .agg(avg(col("p2") / (col("v2") * 16.0))).as[Double].head()
    assert(ratio > 0.8 && ratio < 1.2, s"mean JL norm ratio $ratio")
  }

  test("consistent sample: integrity holds; independent sampling would orphan") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val row = Corpus.consistentSample(spark, dir).collect().head
    assert(row.getAs[Boolean]("no_orphans"))
    assert(row.getAs[Boolean]("sample_commutes_with_join"))
    val nOrders = spark.read.parquet(s"$dir/orders.parquet").count()
    val frac = row.getAs[Long]("n_orders").toDouble / nOrders
    assert(frac > 0.05 && frac < 0.15, s"sampled fraction $frac far from 10%")
    // negative control: sampling lineitem by its own ROW key (l_linenumber
    // mixed in) instead of the join key orphans most sampled children
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .filter(conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100 < 10)
    val lIndep = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(conv(substring(md5(concat(col("l_orderkey").cast("string"), lit("#"),
        col("l_linenumber").cast("string"))), 1, 8), 16, 10).cast("long") % 100 < 10)
    val orphans = lIndep.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphans > lIndep.count() / 2,
      "independent sampling should orphan most children — fixture too small?")
  }

  test("temperature mix: sqrt-quota per source, deterministic selection") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = Corpus.temperatureMix(spark, dir)
      .as[(Long, String)].collect()
    val bySrc = got.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ns = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val w = ns.view.mapValues(n =>
      BigDecimal(math.sqrt(n.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP)).toMap
    val wsum = w.values.sum.toDouble
    ns.keys.foreach { s =>
      val quota = math.floor(200 * w(s).toDouble / wsum).toLong
      assert(bySrc.getOrElse(s, 0L) == quota, s"source $s")
    }
    // selection is a pure function of the corpus
    val again = Corpus.temperatureMix(spark, dir).as[(Long, String)].collect()
    assert(got.toSet == again.toSet)
    // and every selected doc belongs to its claimed source
    val srcOf = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source")).as[(Long, String)].collect().toMap
    got.foreach { case (id, s) => assert(srcOf(id) == s) }
  }
}
