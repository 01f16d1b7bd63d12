package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Invariants for the round-2 operators (q53-q62) beyond the DuckDB oracle:
  * structural properties that should hold at any scale factor.
  */
class NewOperatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("outer join: one row per nation, counts conserved") {
    val out = Relational.joinOuter(spark, dir).collect()
    assert(out.length == 25) // every nation survives the left join
    val totalCust = out.map(_.getLong(1)).sum
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(totalCust == nCust) // full-outer + coalesce loses nobody
  }

  test("pivot: status columns partition the order count") {
    val p = Relational.pivotAgg(spark, dir)
    val total = p.select(sum(col("n_f") + col("n_o") + col("n_p"))).first().getLong(0)
    assert(total == spark.read.parquet(s"$dir/orders.parquet").count())
  }

  test("unpivot: two measure rows per flag, values match the wide aggregate") {
    val long = Relational.unpivotAgg(spark, dir)
    val flags = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_returnflag")).distinct().count()
    assert(long.count() == 2 * flags)
    assert(long.groupBy(col("l_returnflag")).count().collect().forall(_.getLong(1) == 2))
  }

  test("explode emits one row per whitespace word") {
    val doc0Words = Relational.explodeWords(spark, dir)
      .filter(col("doc_id") === 0).count()
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") === 0)
      .select(size(split(trim(lower(col("text"))), "\\s+"))).first().getInt(0)
    assert(doc0Words == expected)
  }

  test("json extraction covers every event exactly once") {
    val j = Relational.jsonExtract(spark, dir).collect()
    assert(j.map(_.getLong(1)).sum == 1000) // sf0.001 events row count
    assert(j.forall(r => !r.isNullAt(2)))   // $.k present in every props blob
  }

  test("schema evolution: v1 rows surface NULL for the added column") {
    val evo = Relational.schemaEvolution(spark, dir)
    val v1Nulls = evo.filter(col("o_orderkey") < 500 && col("o_totalprice").isNull).count()
    val v1All = evo.filter(col("o_orderkey") < 500).count()
    assert(v1Nulls == v1All && v1All > 0)
    assert(evo.filter(col("o_orderkey") >= 500 && col("o_totalprice").isNull).count() == 0)
  }

  test("quality score components are ratios in [0,1]; blend is quantized to 1e-4") {
    val q = graft.pipeline.TextAnalysis.qualityScore(spark, dir).collect()
    assert(q.nonEmpty)
    for (r <- q; i <- 1 to 3) {
      val v = r.getDouble(i)
      assert(v >= 0.0 && v <= 1.0, s"ratio col $i out of range: $v")
    }
    // floor(x*1e4)/1e4 leaves no residue beyond the 4th decimal (up to one
    // double ulp from the division back by 1e4)
    assert(q.forall { r =>
      val scaled = r.getDouble(4) * 10000.0
      math.abs(scaled - math.rint(scaled)) < 1e-9
    })
  }

  test("vector ops: unit-norm corpus, bounded first component") {
    val v = graft.pipeline.Similarity.vectorOps(spark, dir).collect()
    assert(v.length == 100)
    assert(v.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-3)) // embeddings are L2-normalized
    assert(v.forall(r => math.abs(r.getDouble(4)) <= 1.0))       // |unit0| <= 1
  }

  test("streaming dedup collapses the doubled stream back to source counts") {
    val n = graft.streaming.StreamingQueries.streamDedup(spark, dir)
      .select(sum(col("n"))).first().getLong(0)
    assert(n == 1000)
  }

  test("gap-fill: dense hour grid, counts conserved, zero-fill present") {
    val g = Relational.gapFill(spark, dir)
    val types = g.select(col("event_type")).distinct().count()
    val hours = g.select(col("h")).distinct().count()
    assert(g.count() == types * hours)          // grid is dense: every type × every hour
    val total = g.select(sum(col("n"))).first().getLong(0)
    assert(total == 1000)                       // fill adds zeros, never rows
    assert(g.filter(col("n") === 0).count() > 0) // sf0.001 has empty hours
  }

  test("range frame: trailing-30-day count grows only via in-window peers") {
    val r = Relational.windowRangeFrame(spark, dir).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getLong(3) >= 1)) // frame always includes current row's peers
    // a row's 30d count can never exceed its partition's total rows
    val byStatus = r.groupBy(_.getString(1)).view.mapValues(_.length)
    assert(r.forall(row => row.getLong(3) <= byStatus(row.getString(1))))
  }

  test("contamination: benchmark docs never flag themselves; counts positive") {
    val c = graft.pipeline.Corpus.contamination(spark, dir).collect()
    assert(c.nonEmpty)
    assert(c.forall(_.getLong(0) % 97 != 0)) // benchmark docs excluded from probe side
    assert(c.forall(_.getLong(1) >= 1))      // inner join: only shared-gram docs emitted
  }

  test("window ranks: dense_rank contiguous from 1; cume_dist ends at 1") {
    val r = Relational.windowRanks(spark, dir).collect()
    val byStatus = r.groupBy(_.getString(1))
    for ((_, rows) <- byStatus) {
      val dranks = rows.map(_.getInt(2)).distinct.sorted
      assert(dranks.head == 1 && dranks.last == dranks.length) // no gaps
      assert(math.abs(rows.map(_.getDouble(4)).max - 1.0) < 1e-12)
      assert(rows.map(_.getDouble(3)).min == 0.0) // percent_rank of the first row
    }
  }

  test("repetition: ratios bounded, distinct never exceeds total") {
    val r = graft.pipeline.TextAnalysis.repetition(spark, dir).collect()
    assert(r.length == 500)
    for (row <- r) {
      assert(row.getLong(2) <= row.getLong(1))
      val dup = row.getDouble(3); val top = row.getDouble(4)
      assert(dup >= 0.0 && dup < 1.0)
      assert(top > 0.0 && top <= 1.0)
      // pigeonhole: the top word's count is at least the mean count
      assert(top >= 1.0 / row.getLong(2).toDouble - 1e-12)
    }
  }

  test("sketches: HLL++ NDV within 3 sigma of exact; approx quantiles rank-correct") {
    // q51 emits the accuracy contract as verdict columns (the driver oracle
    // pins them to true); this re-checks the exact NDVs independently and
    // that every verdict holds at this SF.
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val rows = Relational.sketches(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("ndv_o"),
        countDistinct(col("l_partkey")).as("ndv_p"))
      .collect()
    assert(exact.nonEmpty)
    for (e <- exact) {
      val a = rows(e.getString(0))
      assert(a.getLong(1) == e.getLong(1)) // exact NDV columns really exact
      assert(a.getLong(2) == e.getLong(2))
      assert(a.getBoolean(3), "ndv_orders within HLL++ 3-sigma bound")
      assert(a.getBoolean(4), "ndv_parts within HLL++ 3-sigma bound")
      assert(a.getBoolean(5), "approx p50 within rank-error bound")
      assert(a.getBoolean(6), "approx p95 within rank-error bound")
    }
  }

  test("frame sample: stride-2 sampling halves the frame count (ceil)") {
    val s = graft.pipeline.Multimodal.frameSample(spark, dir)
    val d = graft.pipeline.Multimodal.decodeFeatures(spark, dir)
      .withColumnRenamed("n_frames", "full256")
    val joined = s.join(d, "doc_id").collect()
    assert(joined.length == 500)
    for (r <- joined) {
      val len = r.getAs[Long]("byte_len")
      val n64 = len / 64 + 1
      assert(r.getAs[Long]("n_sampled") == (n64 - 1) / 2 + 1)
      assert(r.getAs[Long]("checksum") >= 0)
    }
  }
}
