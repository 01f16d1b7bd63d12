package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The bench-variant contract (ADVICE r5): Bench times sketch-only stand-ins
  * for q51/q131/q134 while Verify checks the verdict forms — so nothing
  * would notice if the two drifted apart and the bench started timing a
  * plan nobody verifies. The estimate expressions are single-sourced in the
  * query modules; this spec pins the RUNTIME agreement: each variant's
  * estimates must reproduce the verdict form's accuracy booleans against
  * the verdict form's own exact baselines, and every verdict must hold.
  */
class BenchVariantSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q51: sketchesOnly estimates reproduce the verdict form's booleans") {
    val verdict = Relational.sketches(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val est = Relational.sketchesOnly(spark, dir).collect()
    assert(est.nonEmpty && est.length == verdict.size)
    // exact percentile bounds, recomputed the way the verdict form does
    val bounds = graft.queries.Tables.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.498)").as("p50lo"),
        expr("percentile(l_extendedprice, 0.502)").as("p50hi"),
        expr("percentile(l_extendedprice, 0.948)").as("p95lo"),
        expr("percentile(l_extendedprice, 0.952)").as("p95hi"))
      .collect().map(r => r.getString(0) -> r).toMap
    est.foreach { e =>
      val flag = e.getString(0)
      val v = verdict(flag)
      val b = bounds(flag)
      assert(v.getAs[Boolean]("ndv_orders_ok") ==
        (math.abs(e.getLong(1) - v.getAs[Long]("ndv_orders")) <=
          v.getAs[Long]("ndv_orders") * 0.15), s"ndv_orders drift at $flag")
      assert(v.getAs[Boolean]("ndv_parts_ok") ==
        (math.abs(e.getLong(2) - v.getAs[Long]("ndv_parts")) <=
          v.getAs[Long]("ndv_parts") * 0.15), s"ndv_parts drift at $flag")
      assert(v.getAs[Boolean]("p50_ok") ==
        (e.getDouble(3) >= b.getDouble(1) && e.getDouble(3) <= b.getDouble(2)),
        s"p50 drift at $flag")
      assert(v.getAs[Boolean]("p95_ok") ==
        (e.getDouble(4) >= b.getDouble(3) && e.getDouble(4) <= b.getDouble(4)),
        s"p95 drift at $flag")
      // and the verdicts themselves hold (the oracle pins this too)
      Seq("ndv_orders_ok", "ndv_parts_ok", "p50_ok", "p95_ok")
        .foreach(c => assert(v.getAs[Boolean](c), s"$c false at $flag"))
    }
  }

  test("q87: profileTableSketch matches the exact profile except sketched NDV") {
    val exact = Relational.profileTable(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val est = Relational.profileTableSketch(spark, dir).collect()
    assert(est.length == exact.size)
    est.foreach { e =>
      val v = exact(e.getString(0))
      // everything but ndv is the same single-pass computation — exact match
      assert(e.getAs[Long]("n") == v.getAs[Long]("n"), "n drift")
      assert(e.getAs[Long]("nulls") == v.getAs[Long]("nulls"), "nulls drift")
      assert(e.getAs[String]("min_v") == v.getAs[String]("min_v"), "min drift")
      assert(e.getAs[String]("max_v") == v.getAs[String]("max_v"), "max drift")
      // HLL++ at default rsd 0.05: pin the estimate inside 3σ = 15%
      val ex = v.getAs[Long]("ndv")
      assert(math.abs(e.getAs[Long]("ndv") - ex) <= math.max(1L, (ex * 0.15).toLong),
        s"ndv estimate drift at ${e.getString(0)}: ${e.getAs[Long]("ndv")} vs $ex")
    }
    // and the variant's plan is Expand-free (the point of the substitution)
    val plan = Relational.profileTableSketch(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "sketch profile must not Expand")
    assert(Relational.profileTable(spark, dir)
      .queryExecution.executedPlan.toString.contains("Expand"),
      "exact profile is the Expand form this variant replaces")
  }

  test("q159: slidingDistinctSketchOnly estimates clear the verdict's own bound") {
    val verdict = graft.operators.TimeSeries.slidingDistinct(spark, dir)
      .collect().map(r => r.get(0) -> r).toMap
    val est = graft.operators.TimeSeries.slidingDistinctSketchOnly(spark, dir)
      .collect()
    assert(est.nonEmpty && est.length == verdict.size)
    est.foreach { e =>
      val v = verdict(e.get(0))
      val exact = v.getAs[Long]("ndv")
      // the verdict's bound: within max(10%, 3) per window — and the
      // verdict itself must hold
      assert(math.abs(e.getAs[Long]("ndv_est") - exact) <=
        math.max(exact * 0.1, 3.0), s"estimate drift at ${e.get(0)}")
      assert(v.getAs[Boolean]("approx_ok"))
    }
  }

  test("q146: approx MAD reproduces the exact medians and outlier counts " +
    "within the sketch tolerance") {
    val exact = graft.pipeline.Corpus.madOutliers(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = graft.pipeline.Corpus.madOutliers(spark, dir, approx = true)
      .collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { a =>
      val e = exact(a.getString(0))
      assert(a.getAs[Long]("n") == e.getAs[Long]("n"))
      // percentile_approx at accuracy 10000 over ~15k rows/group: the
      // median lands within 1% of exact, and the outlier count (a tail
      // property, robust to a slightly-shifted center) within 10%
      def close(col: String, tol: Double) = {
        val x = a.getAs[Double](col); val y = e.getAs[Double](col)
        assert(math.abs(x - y) <= math.abs(y) * tol, s"$col: $x vs $y")
      }
      close("med", 0.01); close("mad", 0.01)
      val (no, ne) = (a.getAs[Long]("n_outliers"), e.getAs[Long]("n_outliers"))
      assert(math.abs(no - ne) <= math.max(2L, (ne * 0.1).toLong),
        s"n_outliers: $no vs $ne at ${a.getString(0)}")
    }
  }

  test("q131: hllDistinctSketchOnly estimate matches the verdict's accuracy bound") {
    val verdict = EngineQueries.hllDistinct(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val est = EngineQueries.hllDistinctSketchOnly(spark, dir).collect()
    assert(est.nonEmpty && est.length == verdict.size)
    est.foreach { e =>
      val v = verdict(e.getString(0))
      val exact = v.getAs[Long]("ndv_cust")
      assert(v.getAs[Boolean]("hll_ok") ==
        (math.abs(e.getLong(1) - exact) <= exact * 0.05),
        s"q131 estimate drift at ${e.getString(0)}")
      assert(v.getAs[Boolean]("hll_ok"))
    }
  }

  test("q134: hllColumnSketchOnly estimate matches the verdict's accuracy bound") {
    val verdict = EngineQueries.hllColumn(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = EngineQueries.hllColumnSketchOnly(spark, dir).collect()
    assert(est.nonEmpty && est.length == verdict.size)
    est.foreach { e =>
      val t = e.getString(0)
      assert(verdict(t).getAs[Boolean]("ndv_ok") ==
        (math.abs(e.getLong(2) - exact(t)) <= exact(t) * 0.05),
        s"q134 estimate drift at $t")
      assert(verdict(t).getAs[Boolean]("ndv_ok"))
    }
  }
}
