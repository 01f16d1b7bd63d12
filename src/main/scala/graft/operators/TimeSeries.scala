package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequential time-series operators that need in-order per-key scans.
  * Spark's window functions cover frame-local aggregates, but a recurrence
  * like EWMA (state feeding forward row-to-row) has no bounded-frame form —
  * the closed-form rewrite (sum of value·(1−α)^(n−i)) overflows/underflows
  * double past ~1000 steps, so it cannot be the 100 TB plan. The scale-safe
  * shape is the same one [[AsOfJoin]] uses: repartition by key, sort within
  * partitions, one linear pass per partition — O(1) state per key, no
  * global sort, no driver involvement.
  */
/** Row shape for [[TimeSeries.ewma]]'s typed scan (public: Spark's generated
  * encoder projections cannot touch non-public classes).
  */
final case class TsEvent(user_id: Long, ts: java.sql.Timestamp,
                         event_id: Long, value: Double)

object TimeSeries {

  /** Per-user exponentially-weighted moving average of event values
    * (e_1 = x_1; e_t = α·x_t + (1−α)·e_{t−1}), emitting the final smoothed
    * value per user. α = 0.5 keeps every decay weight an exact power of two
    * (scaling a double by 2^-k shifts only the exponent), so the only FP
    * rounding is in the additions — the 4-decimal round then hashes
    * identically against the oracle's closed-form sum.
    *
    * One shuffle (repartition on user_id), in-partition sort, then a
    * streaming fold over contiguous user runs — per-partition memory is one
    * accumulator, not a user's history, so a key with 10^9 events costs
    * nothing beyond its scan.
    */
  def ewma(spark: SparkSession, dir: String, alpha: Double = 0.5): DataFrame =
    ewmaOf(graft.queries.Tables.events(spark, dir), alpha)

  /** Core of [[ewma]] over any (user_id, ts, event_id, value) frame. */
  def ewmaOf(events: DataFrame, alpha: Double): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[TsEvent]
    val folded = ev.repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts", "event_id")
      .mapPartitions { it =>
        new Iterator[(Long, Long, Double)] {
          private val in = it.buffered
          def hasNext: Boolean = in.hasNext
          def next(): (Long, Long, Double) = {
            val head = in.next()
            var user = head.user_id
            var n = 1L
            var e = head.value
            while (in.hasNext && in.head.user_id == user) {
              val r = in.next()
              n += 1L
              e = alpha * r.value + (1.0 - alpha) * e
            }
            (user, n, e)
          }
        }
      }
    folded.toDF("user_id", "n_events", "ewma_raw")
      .select(col("user_id"), col("n_events"),
        round(col("ewma_raw"), 4).as("ewma"))
  }

  /** Per-event anomaly flags against the running EWMA: an event is anomalous
    * when its value deviates from the user's smoothed history (the EWMA of
    * all PRIOR events) by more than `relBand`·|history| + `absBand`. The
    * same single-shuffle linear fold as [[ewma]], but emitting one row per
    * event with O(1) carried state — the shape that turns into streaming
    * state (q162) unchanged. First event per user has no history and is
    * never flagged.
    *
    * Cross-engine float contract: the oracle replays the IDENTICAL
    * sequential fold (recursive CTE, same `0.5·x + 0.5·e` op order), so the
    * prev-EWMA doubles are bit-identical — which is what makes the raw
    * anomaly comparison safe without rounding, and the emitted column uses
    * FLOOR-quantization, not round(): with 2-decimal inputs and
    * power-of-two decay, the smoothed values land exactly on .00005
    * rounding ties all the time (the q59 quality-blend lesson), where
    * Spark's BigDecimal HALF_UP and DuckDB's scaled-nearbyint disagree.
    */
  def ewmaAnomalies(spark: SparkSession, dir: String, alpha: Double = 0.5,
                    relBand: Double = 0.5, absBand: Double = 10.0): DataFrame =
    ewmaAnomaliesOf(graft.queries.Tables.events(spark, dir), alpha, relBand, absBand)

  /** Core of [[ewmaAnomalies]] over any (user_id, ts, event_id, value) frame. */
  def ewmaAnomaliesOf(events: DataFrame, alpha: Double,
                      relBand: Double, absBand: Double): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[TsEvent]
    val scored = ev.repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts", "event_id")
      .mapPartitions { it =>
        var user = Long.MinValue
        var have = false
        var e = 0.0
        it.map { r =>
          if (r.user_id != user) { user = r.user_id; have = false }
          val prev = if (have) e else Double.NaN
          e = if (have) alpha * r.value + (1.0 - alpha) * e else r.value
          have = true
          (r.user_id, r.event_id, prev, r.value)
        }
      }
    scored.toDF("user_id", "event_id", "prev_raw", "value")
      .select(col("user_id"), col("event_id"),
        when(col("prev_raw").isNaN, lit(null))
          .otherwise(floor(col("prev_raw") * 10000).cast("double") / 10000.0)
          .as("ewma_prev"),
        // NOT coalesce-on-null: Spark orders NaN as the LARGEST double, so
        // a NaN prev would silently flag every first event true
        when(col("prev_raw").isNaN, lit(false))
          .otherwise(abs(col("value") - col("prev_raw")) >
            abs(col("prev_raw")) * relBand + absBand).as("anomaly"))
  }

  /** Distinct users per 1-hour SLIDING window (15-minute slide): the
    * overlapping-window form of q42's tumbling aggregate. Spark's `window`
    * generator replicates each event into its 4 covering windows map-side
    * (overlap factor = size/slide — the explode is the cost model, and it
    * is linear, not windowed-state), then one grouped distinct per window.
    * Beside the exact NDV the row carries the approx_count_distinct verdict:
    * within max(10%, 3) per window — the nominal rsd is 2%, but tiny windows
    * (ndv ≈ 10) quantize, so the bound needs an absolute floor (measured
    * worst deviation across 2,883 sf0.01 windows: 2). At 100 TB the
    * production form ships the HLL partials (fixed bytes per (window,
    * sketch)) instead of shuffling every (window, user) pair, same contract
    * pattern as q134.
    */
  def slidingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.queries.Tables.events(spark, dir)
    ev.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(countDistinct(col("user_id")).as("ndv"),
        approx_count_distinct(col("user_id"), 0.02).as("ndv_est"))
      .select(col("window.start").as("win_start"),
        col("ndv"),
        (abs(col("ndv_est") - col("ndv")) <=
          greatest(col("ndv") * 0.1, lit(3.0))).as("approx_ok"))
  }

  /** Production form of [[slidingDistinct]] (the Bench-timed variant, same
    * pattern as q51/q131/q134): the verdict form co-locates every
    * (window, user) pair for the exact NDV baseline; at 100 TB the sliding
    * windows ship HLL partials — fixed bytes per (window, sketch) — and the
    * exact side exists only so the oracle can pin the sketch's accuracy.
    * [[graft.queries.BenchVariantSpec]] pins the estimates to the verdict
    * form's own bound.
    */
  def slidingDistinctSketchOnly(spark: SparkSession, dir: String): DataFrame =
    graft.queries.Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("ndv_est"))
      .select(col("window.start").as("win_start"), col("ndv_est"))

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q156_ewma" -> ((s: SparkSession, d: String) => ewma(s, d)),
    "q159_sliding_distinct" -> ((s: SparkSession, d: String) => slidingDistinct(s, d)),
    "q161_ewma_anomalies" -> ((s: SparkSession, d: String) => ewmaAnomalies(s, d)),
  )

  /** The oracle computes the SAME recurrence in closed form (safe in SQL at
    * sf-test series lengths; the Spark side deliberately does not, see
    * [[ewma]]): e_n = Σ_{i≥2} x_i·α·(1−α)^{n−i} + x_1·(1−α)^{n−1}.
    */
  def oracles: Map[String, String] = Map(
    "q156_ewma" ->
      """WITH r AS (SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events)
        |SELECT user_id, max(n) AS n_events,
        |  round(sum(value * CASE WHEN rn = 1 THEN pow(0.5, n - 1)
        |                         ELSE pow(0.5, n - rn + 1) END), 4) AS ewma
        |FROM r GROUP BY user_id""".stripMargin,
    // each event belongs to the 4 slide-aligned windows at and before its
    // 15-min bucket; ts − wstart ∈ [15k, 15k+15) ⊂ [0, 60) min, so the
    // containment predicate is implied by construction. Exact NDV is
    // hash-pinned; the sketch accuracy is a verdict (q134 pattern).
    "q159_sliding_distinct" ->
      """WITH w AS (SELECT user_id,
        |    time_bucket(INTERVAL 15 MINUTE, ts) - k * (INTERVAL 15 MINUTE) AS win_start
        |  FROM events, (SELECT unnest(range(4)) AS k))
        |SELECT win_start, count(DISTINCT user_id) AS ndv, true AS approx_ok
        |FROM w GROUP BY win_start""".stripMargin,
    // the oracle replays the IDENTICAL sequential fold via a recursive
    // CTE — same 0.5·x + 0.5·e operation order as the JVM scan, so every
    // intermediate double is bit-identical and the un-rounded anomaly
    // comparison plus the floor-quantized emission match exactly
    "q161_ewma_anomalies" ->
      """WITH RECURSIVE r AS (SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |e AS (
        |  SELECT user_id, event_id, rn, value, CAST(NULL AS DOUBLE) AS praw,
        |         value AS e
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.event_id, r.rn, r.value, e.e AS praw,
        |         0.5 * r.value + 0.5 * e.e AS e
        |  FROM r JOIN e ON r.user_id = e.user_id AND r.rn = e.rn + 1)
        |SELECT user_id, event_id,
        |  floor(praw * 10000) / 10000 AS ewma_prev,
        |  CASE WHEN praw IS NULL THEN false
        |       ELSE abs(value - praw) > abs(praw) * 0.5 + 10
        |  END AS anomaly
        |FROM e""".stripMargin,
  )
}
