package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.catalog._
import graft.engine.{MergeView, OlapEngine}
import graft.manifest.{Version, VersionGraph}
import graft.model._

/** ScalaCheck property tests — the SURVEY.md §5 commitments the reference
  * never had: write→read roundtrip over the full 8-type parity surface,
  * VersionGraph covering/hole laws over arbitrary partitions, and
  * Aggregate-model merge idempotence (merge(merge(x)) == merge(x)).
  * Spark-heavy properties run few cases (each is a real write+scan);
  * driver-side properties run hundreds.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def check(prop: Prop, cases: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("property: Zorder.interleave is a bijection on 32-bit pairs") {
    val g = Gen.chooseNum(0L, 0xFFFFFFFFL)
    check(Prop.forAll(g, g) { (x, y) =>
      val z = graft.functions.Zorder.interleave(x, y)
      val rx = (0 until 32).map(i => ((z >>> (2 * i)) & 1L) << i).sum
      val ry = (0 until 32).map(i => ((z >>> (2 * i + 1)) & 1L) << i).sum
      rx == x && ry == y
    }, 500)
  }

  test("property: any contiguous partition of [0,n] covers; dropping any piece opens a hole") {
    val partGen: Gen[(Long, Seq[(Long, Long)])] = for {
      n <- Gen.chooseNum(1L, 40L)
      cuts <- Gen.someOf(1L until n)
    } yield {
      val bounds = (Seq(0L) ++ cuts.sorted :+ (n + 1)).distinct
      (n, bounds.sliding(2).map(b => (b.head, b(1) - 1)).toSeq)
    }
    check(Prop.forAll(partGen) { case (n, pieces) =>
      val g = new VersionGraph
      pieces.foreach { case (lo, hi) => g.addEdge(Version(lo, hi)) }
      val covered = g.findCoveringPath(0, n).isDefined
      val holesAfterDrop = pieces.forall { case (lo, hi) =>
        g.removeEdge(Version(lo, hi))
        val hole = g.findCoveringPath(0, n).isEmpty
        g.addEdge(Version(lo, hi))
        hole
      }
      covered && holesAfterDrop
    }, 200)
  }

  test("property: batch manifest ops equal their sequential forms") {
    import graft.manifest.{RowsetMeta, TableManifest}
    // arbitrary contiguous version chains with an arbitrary stale subset:
    // publishAll + markStaleAll must land the exact state the one-at-a-time
    // ops produce (visible set, maxVersion, covering resolution)
    val gen = for {
      n <- Gen.chooseNum(1, 30)
      stale <- Gen.someOf(1 to n)
    } yield (n, stale.toSet)
    check(Prop.forAll(gen) { case (n, stale) =>
      def metas = (1 to n).map(i =>
        RowsetMeta(i.toLong, Version(i.toLong, i.toLong), s"r$i", 10L))
      val seqRoot = java.nio.file.Files.createTempDirectory("graft-prop-seq-")
      val batRoot = java.nio.file.Files.createTempDirectory("graft-prop-bat-")
      val seq = new TableManifest(seqRoot)
      metas.foreach(seq.publish)
      stale.foreach(i => seq.markStale(i.toLong))
      val bat = new TableManifest(batRoot)
      bat.publishAll(metas)
      bat.markStaleAll(stale.toSeq.map(_.toLong))
      def state(m: TableManifest) = (
        m.maxVersion,
        m.visibleRowsets.map(_.rowsetId).sorted,
        if (stale.isEmpty) m.captureConsistentVersions(1L, n.toLong).map(_.rowsetId).sorted
        else Seq.empty[Long])
      state(seq) == state(bat) &&
        state(new TableManifest(seqRoot)) == state(new TableManifest(batRoot))
    }, 60)
  }

  /** The reference's 8-type parity surface (SURVEY.md §1.2): Int8..Int64,
    * Float32/64, Varchar, Date — random rows incl. nulls survive a routed
    * engine write and merge-free scan exactly.
    */
  test("property: engine write→read roundtrip over all 8 parity types") {
    import spark.implicits._
    val rowGen: Gen[(Long, Option[Byte], Option[Short], Option[Int],
        Option[Float], Option[Double], Option[String], Option[Int])] = for {
      b <- Gen.option(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      s <- Gen.option(Gen.chooseNum(Short.MinValue, Short.MaxValue))
      i <- Gen.option(Gen.chooseNum(Int.MinValue, Int.MaxValue))
      f <- Gen.option(Gen.chooseNum(-1e6f, 1e6f))
      d <- Gen.option(Gen.chooseNum(-1e12, 1e12))
      str <- Gen.option(Gen.alphaNumStr.map(_.take(20)))
      day <- Gen.option(Gen.chooseNum(0, 20000))
    } yield (0L, b, s, i, f, d, str, day)
    val rowsGen = Gen.listOfN(60, rowGen)
      .map(_.zipWithIndex.map { case (r, idx) => r.copy(_1 = idx.toLong) })

    check(Prop.forAll(rowsGen) { rows =>
      val eng = new OlapEngine(spark,
        java.nio.file.Files.createTempDirectory("graft-prop-wh-"))
      eng.createDatabase("p")
      eng.createTable(TableDef(
        db = "p", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
          ColumnSpec.key("k", LongType),
          ColumnSpec.value("c_i8", ByteType),
          ColumnSpec.value("c_i16", ShortType),
          ColumnSpec.value("c_i32", IntegerType),
          ColumnSpec.value("c_f32", FloatType),
          ColumnSpec.value("c_f64", DoubleType),
          ColumnSpec.value("c_str", StringType),
          ColumnSpec.value("c_date", DateType))),
        bucketColumn = Some("k"), numBuckets = 3))
      val df = rows.toDF("k", "c_i8", "c_i16", "c_i32", "c_f32", "c_f64", "c_str", "c_day")
        .withColumn("c_date", date_add(lit("1970-01-01").cast("date"), col("c_day")))
        .drop("c_day")
      eng.ingest("p", "t", df, Some(Version(1, 1)))
      val back = eng.scan("p", "t").collect()
        .map(r => (0 until r.length).map(i => r.get(i)).toList).toSet
      val sent = df.select("k", "c_i8", "c_i16", "c_i32", "c_f32", "c_f64", "c_str", "c_date")
        .collect().map(r => (0 until r.length).map(i => r.get(i)).toList).toSet
      back == sent
    }, 3)
  }


  test("property: distributed BigDecimal-checked EWMA over random series") {
    import spark.implicits._
    // the linear fold must match an exact-rational reference: with α = 1/2
    // every step is (x + e)/2 in rationals; BigDecimal at high scale is an
    // exact stand-in (inputs are 2-decimal, so denominators are powers of 2)
    val serie = Gen.nonEmptyListOf(Gen.chooseNum(0, 50000).map(_ / 100.0))
    check(Prop.forAll(Gen.listOfN(3, serie)) { series =>
      val rows = series.zipWithIndex.flatMap { case (xs, u) =>
        xs.zipWithIndex.map { case (x, i) =>
          (u.toLong, new java.sql.Timestamp(1000L * i), i.toLong, x)
        }
      }
      val got = graft.operators.TimeSeries
        .ewmaOf(rows.toDF("user_id", "ts", "event_id", "value"), 0.5)
        .as[(Long, Long, Double)].collect()
        .map { case (u, n, e) => u -> ((n, e)) }.toMap
      series.zipWithIndex.forall { case (xs, u) =>
        val exact = xs.tail.foldLeft(BigDecimal(xs.head)) { (e, x) =>
          (BigDecimal(x) + e) / 2
        }
        val (n, e) = got(u.toLong)
        // e is the double fold rounded to the 1e-4 grid; exact is the
        // unrounded rational of the binary inputs — they can differ by up
        // to one grid step when the true value sits on a .00005 boundary
        n == xs.length.toLong && math.abs(e - exact.toDouble) <= 1.0001e-4
      }
    }, 10)
  }

  test("property: PageRank conserves probability mass on random graphs") {
    import spark.implicits._
    val edgeGen = for {
      n <- Gen.chooseNum(4, 24)
      m <- Gen.chooseNum(n, 3 * n)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
        if a != b
      } yield (a.toLong, b.toLong))
    } yield es.distinct
    check(Prop.forAll(edgeGen) { es =>
      es.isEmpty || {
        val ranks = graft.operators.Graph
          .pageRank(es.toDF("src", "dst"), iters = 6)
          .as[(Long, Double)].collect()
        // symmetric edges -> no dangling nodes -> mass conserved; and no
        // node's rank may fall below the teleport floor (1-d)/n
        val n = ranks.length
        math.abs(ranks.map(_._2).sum - 1.0) < 1e-6 &&
          ranks.forall(_._2 >= (1.0 - 0.85) / n - 1e-9)
      }
    }, 8)
  }

  test("property: Aggregate-model merge is idempotent (merge ∘ merge = merge)") {
    import spark.implicits._
    val td = TableDef(
      db = "p", name = "agg", schema = TableSchema(KeysType.Aggregate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("s", LongType, AggType.Sum),
        ColumnSpec.value("mx", DoubleType, AggType.Max),
        ColumnSpec.value("mn", DoubleType, AggType.Min),
        ColumnSpec.value("r", StringType, AggType.Replace))))
    val rowGen = for {
      k <- Gen.chooseNum(0L, 8L)          // few keys => many collisions
      s <- Gen.chooseNum(-1000L, 1000L)
      mx <- Gen.chooseNum(-1e4, 1e4)
      r <- Gen.alphaStr.map(_.take(5))
      v <- Gen.chooseNum(1L, 5L)
    } yield (k, s, mx, -mx, r, v)
    check(Prop.forAll(Gen.listOfN(80, rowGen)) { rows =>
      val raw = rows.zipWithIndex
        .map { case ((k, s, mx, mn, r, v), i) => (k, s, mx, mn, r, v, i.toLong) }
        .toDF("k", "s", "mx", "mn", "r", "__v", "__q")
      val once = MergeView(td, raw, "__v", "__q")
      val twice = MergeView(td,
        once.withColumn("__v", lit(99L)).withColumn("__q", lit(0L)), "__v", "__q")
      val a = once.collect().map(_.toSeq.toList).toSet
      val b = twice.collect().map(_.toSeq.toList).toSet
      a == b
    }, 4)
  }
}
