package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each probe row, the latest build row with the same key and
  * `buildTime <= probeTime`.
  *
  * Spark has no native as-of join; the scalable composition is the
  * union + partitioned-window trick: tag both sides, union, then one window
  * (partitionBy key, orderBy time) carrying `last(build_value, ignoreNulls)`
  * forward. Cost = ONE shuffle on the key + a per-partition sort — no range
  * cross-join blowup, no per-key collect; this is the plan that survives
  * 100 TB (a backward-looking join over event time is linear after the sort).
  * At equal timestamps the build row sorts first (tag 0 < tag 1), making
  * `buildTime <= probeTime` inclusive; build-side timestamp ties break by the
  * ordered extra columns.
  */
object AsOfJoin {

  /** Generic as-of: returns `probe` rows + `asof_<c>` for each requested build
    * column (null when no earlier build row exists).
    */
  def asOf(probe: DataFrame, build: DataFrame, key: String, time: String,
           buildCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    val tagged = probe
      .withColumn("__tag", lit(1))
      .select(probeCols.map(col) ++ Seq(col("__tag")) ++
        buildCols.map(c => lit(null).cast(build.schema(c).dataType).as(s"__b_$c")): _*)
    val buildTagged = build
      .withColumn("__tag", lit(0))
      .select(probeCols.map(c =>
        if (c == key || c == time) col(c) else lit(null).cast(probe.schema(c).dataType).as(c)) ++
        Seq(col("__tag")) ++ buildCols.map(c => col(c).as(s"__b_$c")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy((Seq(col(time), col("__tag")) ++ buildCols.map(c => col(s"__b_$c"))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.unionByName(buildTagged)
      .select((probeCols.map(col) :+ col("__tag")) ++
        buildCols.map(c => last(col(s"__b_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
      .filter(col("__tag") === 1)
      .drop("__tag")
  }

  /** Forward as-of: for each probe row, the EARLIEST build row with the same
    * key and `buildTime >= probeTime` — same single-shuffle union+window
    * composition as [[asOf]], with the frame looking forward. At equal
    * timestamps the probe sorts first (tag 0 < tag 1) so the bound is
    * inclusive; build-side ties at the matched timestamp resolve to the
    * smallest ordered extra column (ascending order + `first`).
    */
  def asOfForward(probe: DataFrame, build: DataFrame, key: String, time: String,
                  buildCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    val tagged = probe
      .withColumn("__tag", lit(0))
      .select(probeCols.map(col) ++ Seq(col("__tag")) ++
        buildCols.map(c => lit(null).cast(build.schema(c).dataType).as(s"__b_$c")): _*)
    val buildTagged = build
      .withColumn("__tag", lit(1))
      .select(probeCols.map(c =>
        if (c == key || c == time) col(c) else lit(null).cast(probe.schema(c).dataType).as(c)) ++
        Seq(col("__tag")) ++ buildCols.map(c => col(c).as(s"__b_$c")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy((Seq(col(time), col("__tag")) ++ buildCols.map(c => col(s"__b_$c"))): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tagged.unionByName(buildTagged)
      .select((probeCols.map(col) :+ col("__tag")) ++
        buildCols.map(c => first(col(s"__b_$c"), ignoreNulls = true).over(w).as(s"next_$c")): _*)
      .filter(col("__tag") === 0)
      .drop("__tag")
  }

  /** Query: for each purchase event, the user's next (or simultaneous) click
    * event — the forward-looking "time to next action" join.
    */
  def purchaseNextClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.queries.Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    asOfForward(purchases, clicks, key = "user_id", time = "ts",
      buildCols = Seq("click_id"))
      .select(col("event_id"), col("user_id"), col("next_click_id"))
  }

  /** Query: for each purchase event, the user's most recent prior (or
    * simultaneous) click event.
    */
  def purchaseAsofClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.queries.Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    asOf(purchases, clicks, key = "user_id", time = "ts", buildCols = Seq("click_id"))
      .select(col("event_id"), col("user_id"), col("asof_click_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_asof_join" -> ((s: SparkSession, d: String) => purchaseAsofClick(s, d)),
    "q94_asof_forward" -> ((s: SparkSession, d: String) => purchaseNextClick(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "q44_asof_join" ->
      """SELECT p.event_id, p.user_id, c.event_id AS asof_click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    // Spelled without ASOF so the build-side tie-break (min click_id at the
    // matched timestamp) is explicit and engine-independent.
    "q94_asof_forward" ->
      """WITH j AS (
        |  SELECT p.event_id, p.user_id, c.event_id AS cid,
        |    row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts, c.event_id) AS rk
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND c.ts >= p.ts)
        |SELECT event_id, user_id, cid AS next_click_id
        |FROM j WHERE rk = 1""".stripMargin,
  )
}
