package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral analytics aggregates — the Doris/StarRocks/ClickHouse
  * event-funnel family (`window_funnel`, `retention`), re-expressed
  * Spark-first.
  *
  * `window_funnel(window, ts, cond1..condN)` semantics implemented (the
  * greedy earliest-chain rule, deterministic and oracle-checkable):
  *   t1 = earliest cond1 event; tk = earliest cond_k event at-or-after
  *   t_{k-1} and within `window` of t1; level = deepest k reached.
  *
  * Scale shape: ONE shuffle — funnel-relevant events (map-side filtered to
  * the step conditions) are collected per user, then the chain is computed
  * with array expressions (filter/transform/array_min) inside codegen, no
  * joins, no window sort. This is exactly how the native engines implement
  * it (an aggregate whose state is the user's step events); per-user state
  * is bounded by the user's FUNNEL events, not all events.
  */
object Behavior {

  /** 24h funnel over the canonical view → click → purchase chain. */
  def windowFunnel(spark: SparkSession, dir: String): DataFrame = {
    val W = 86400000000L // 24h in micros
    val steps = Tables.events(spark, dir).select(
      col("user_id"),
      unix_micros(col("ts")).as("tsu"),
      when(col("event_type") === "view", 1)
        .when(col("event_type") === "click", 2)
        .when(col("event_type") === "purchase", 3).as("step"))
      .filter(col("step").isNotNull)
    steps.groupBy(col("user_id"))
      .agg(collect_list(struct(col("tsu"), col("step"))).as("evs"))
      .withColumn("t1",
        expr("array_min(transform(filter(evs, e -> e.step = 1), e -> e.tsu))"))
      .withColumn("t2", expr(
        s"array_min(transform(filter(evs, e -> e.step = 2 AND e.tsu >= t1 AND e.tsu <= t1 + ${W}L), e -> e.tsu))"))
      .withColumn("t3", expr(
        s"array_min(transform(filter(evs, e -> e.step = 3 AND e.tsu >= t2 AND e.tsu <= t1 + ${W}L), e -> e.tsu))"))
      .select(col("user_id"),
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1)
          .otherwise(0).as("funnel_level"))
  }

  /** Doris `retention(cond1..condN)`: per user, arr[0] = cond1 ever held,
    * arr[i] = cond1 AND cond_i both held (no ordering between them — that is
    * the documented semantics; ordered chains are [[windowFunnel]]). One
    * hash aggregate, map-side partial max.
    */
  def retention(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "signup", 1).otherwise(0)).as("c1"),
        max(when(col("event_type") === "click", 1).otherwise(0)).as("c2"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("c3"))
      .select(col("user_id"),
        col("c1").as("r_signup"),
        (col("c1") * col("c2")).as("r_click"),
        (col("c1") * col("c3")).as("r_purchase"))

  /** Doris/ClickHouse `sequence_match('(?1)(?2)', ts, cond1, cond2)`: did a
    * cond2 event happen strictly AFTER the user's first cond1 event (no
    * window bound)? `exists e2 > first(e1)` ⟺ `max(cond2 ts) > min(cond1 ts)`
    * — ONE hash aggregate with conditional min/max partials, no event list,
    * no join. NULL (no such event) compares to false on both engines.
    */
  def sequenceMatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", unix_micros(col("ts")))).as("first_view"),
        max(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("last_purchase"),
        min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("first_signup"),
        max(when(col("event_type") === "error", unix_micros(col("ts")))).as("last_error"))
      .select(col("user_id"),
        coalesce(col("last_purchase") > col("first_view"), lit(false))
          .cast("int").as("m_view_purchase"),
        coalesce(col("last_error") > col("first_signup"), lit(false))
          .cast("int").as("m_signup_error"))

  /** Conversion-latency distribution: per click, the NEXT purchase by the
    * same user within 7 days (the forward as-of shape, here as a bounded
    * range join + grouped min — [[graft.operators.AsOfJoin]] is the
    * sort-merge form for unbounded horizons), then exact percentiles over
    * the microsecond latencies. The range bound is what keeps the join
    * state finite at scale: every click pairs with at most a week of one
    * user's purchases. Percentile convention = q146 (round(·,4) over the
    * interpolated exact percentile).
    */
  def conversionLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    // the window predicate must live IN the join condition: filtering after
    // a plain left join would drop a click entirely when its user's only
    // purchases are out-of-window (it must surface as unconverted instead)
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 7 DAY"),
        "left")
      .groupBy(col("event_id"), col("c_ts"))
      .agg(min(col("p_ts")).as("p_ts"))
      .select((unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lat"))
      .agg(count(lit(1)).as("n_clicks"),
        count(col("lat")).as("n_converted"),
        round(expr("percentile(lat, 0.5)"), 4).as("p50_us"),
        round(expr("percentile(lat, 0.9)"), 4).as("p90_us"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q129_window_funnel" -> windowFunnel _,
    "q130_retention" -> retention _,
    "q132_sequence_match" -> sequenceMatch _,
    "q168_conversion_latency" -> conversionLatency _,
  )

  val oracles: Map[String, String] = Map(
    "q168_conversion_latency" ->
      """WITH c AS (SELECT event_id, user_id, ts AS c_ts FROM events
        |           WHERE event_type = 'click'),
        |p AS (SELECT user_id AS p_user, ts AS p_ts FROM events
        |      WHERE event_type = 'purchase'),
        |m AS (SELECT c.event_id, c.c_ts, min(p.p_ts) AS p_ts
        |      FROM c LEFT JOIN p
        |        ON c.user_id = p.p_user AND p.p_ts >= c.c_ts
        |           AND p.p_ts <= c.c_ts + INTERVAL 7 DAY
        |      GROUP BY c.event_id, c.c_ts),
        |l AS (SELECT epoch_us(p_ts) - epoch_us(c_ts) AS lat FROM m)
        |SELECT count(*) AS n_clicks, count(lat) AS n_converted,
        |  round(quantile_cont(lat, 0.5), 4) AS p50_us,
        |  round(quantile_cont(lat, 0.9), 4) AS p90_us
        |FROM l""".stripMargin,
    // the same greedy chain, computed relationally: earliest cond1, then
    // earliest in-window cond2 at-or-after it, then cond3
    "q129_window_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type IN ('view','click','purchase')),
        |t1s AS (SELECT u.user_id,
        |  (SELECT min(epoch_us(ts)) FROM events e
        |   WHERE e.user_id = u.user_id AND e.event_type = 'view') AS t1 FROM u),
        |t2s AS (SELECT t1s.user_id, t1,
        |  (SELECT min(epoch_us(ts)) FROM events e
        |   WHERE e.user_id = t1s.user_id AND e.event_type = 'click'
        |     AND epoch_us(ts) >= t1 AND epoch_us(ts) <= t1 + 86400000000) AS t2
        |  FROM t1s),
        |t3s AS (SELECT t2s.user_id, t1, t2,
        |  (SELECT min(epoch_us(ts)) FROM events e
        |   WHERE e.user_id = t2s.user_id AND e.event_type = 'purchase'
        |     AND epoch_us(ts) >= t2 AND epoch_us(ts) <= t1 + 86400000000) AS t3
        |  FROM t2s)
        |SELECT user_id,
        |  CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS funnel_level
        |FROM t3s""".stripMargin,
    "q130_retention" ->
      """SELECT user_id,
        |  max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r_signup,
        |  max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS r_click,
        |  max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    * max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r_purchase
        |FROM events GROUP BY user_id""".stripMargin,
    "q132_sequence_match" ->
      """SELECT user_id,
        |  CAST(coalesce(
        |    max(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) >
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END),
        |    false) AS INT) AS m_view_purchase,
        |  CAST(coalesce(
        |    max(CASE WHEN event_type = 'error' THEN epoch_us(ts) END) >
        |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END),
        |    false) AS INT) AS m_signup_error
        |FROM events GROUP BY user_id""".stripMargin,
  )
}
