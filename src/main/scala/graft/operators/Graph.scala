package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph computation over pair tables — the generalization of the
  * dedup connected-components loop (q47) from label propagation to weighted
  * propagation. Used here for canonical-document selection: in a near-dup
  * graph, the highest-centrality member of each duplicate cluster is the
  * best "keep" candidate (most-connected ≈ most-representative), which is
  * a real training-data decision once dedup stops being pairwise.
  */
object Graph {

  /** PageRank over an undirected pair table, `iters` synchronous Jacobi
    * rounds: p' = (1−d)/n + d·Σ_in p/deg. Each round is one join of the
    * edge table with the current rank vector (both partitioned by node
    * key) + one grouped sum — the loop never touches the driver, and state
    * is one double per node. Per-round `round(…, 10)` quantization makes
    * the float result independent of aggregation order — the same
    * cross-engine determinism contract as the dedup fingerprints — at an
    * error (1e-10/round) far below the final 6-decimal emission.
    *
    * `localCheckpoint` every round truncates the lineage exactly like the
    * q47 CC loop: without it the plan doubles per iteration.
    *
    * The symmetrized edge table is itself eagerly `localCheckpoint(true)`'d
    * BEFORE the loop — the other half of the CC-loop idiom
    * ([[graft.pipeline.Dedup]]'s CC does the same): `sym` is referenced by
    * the degree pass, every Jacobi round, and the final emission, so without
    * materialization each of those re-executes the full upstream pair
    * generation (for q160 that is the k-means cell join) ~iters+2 times.
    * `GraphSpec` pins the contract: the edge source is evaluated exactly
    * once per pageRank call.
    */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85)
  : DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = deg.select(col("src").as("node"), col("deg")).persist()
    val n = nodes.count()
    // empty graph -> empty ranks (not a 1/0): a fully-capped pair source
    // (every cell hot) legitimately produces zero edges
    if (n == 0) return nodes.select(col("node"), lit(0.0).as("p"))
    // Loop partition count derived from the EDGE volume (~1M edge rows per
    // task, floor 2, capped at the cluster's parallelism) instead of
    // inheriting spark.sql.shuffle.partitions: every frame inside the loop
    // is rank/contrib-sized, and AQE cannot right-size them here — its
    // partition coalescing is parallelism-first, so it never shrinks the 32
    // near-empty partitions each checkpointed round re-creates. At audit
    // scale this collapses ~128 tiny tasks/round to ~4; at 100 TB the same
    // formula yields thousands of full tasks (optimization r13: exec
    // 19 → ~2.5 core-sec, wall 2.1 → 1.3 s at sf0.1/local[32]).
    val m = sym.count()
    val parts = math.max(2, math.min(
      sym.sparkSession.sparkContext.defaultParallelism, (m / 1000000L).toInt + 1))
    // sym ⋈ deg is LOOP-INVARIANT: attach each edge's source degree once,
    // materialized before the loop, so every Jacobi round is ONE join
    // (edges ⋈ rank) + one grouped sum instead of two joins — the per-round
    // arithmetic (p/deg per edge, then the damped rounded sum) is unchanged.
    // Pre-partitioned by src (localCheckpoint preserves the partitioning),
    // so the per-round join only ever moves the RANK side.
    val symd = sym
      .join(nodes.withColumnRenamed("node", "src"), "src")
      .select(col("src"), col("dst"), col("deg"))
      .repartition(parts, col("src"))
      .localCheckpoint(true)
    var rank = nodes.select(col("node"), (lit(1.0) / n).as("p"))
    for (_ <- 1 to iters) {
      // SHUFFLED-HASH join, build side = rank (§3.1 deliberate strategy):
      // the streamed symd side is already hash(src)-partitioned, so SMJ
      // would only add a full sort of the edge table EVERY round; the hash
      // build is one double per node per partition. rank cannot broadcast
      // at corpus scale (it is node-count-sized), so the hint — not an
      // autoBroadcast threshold — is the scale-safe choice.
      val contribs = symd
        .join(rank.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .select(col("dst").as("node"), (col("p") / col("deg")).as("c"))
      // repartition(node) BEFORE the groupBy: the agg then runs complete in
      // the exchange's reduce stage at `parts` tasks (hashpartitioning(node,
      // parts) satisfies the agg's distribution), instead of a 32-partition
      // partial+final pair of near-empty stages. Double-sum order changes
      // are absorbed by the per-round round(…, 10) quantization — the same
      // order-independence contract the partial+final shape relied on.
      rank = contribs.repartition(parts, col("node")).groupBy("node")
        .agg(round(lit((1.0 - damping) / n) + lit(damping) * sum(col("c")), 10).as("p"))
        .localCheckpoint()
    }
    rank
  }

  /** q160: centrality-based canonical selection over the embedding near-dup
    * graph. Edges are the exact cosine-threshold pairs (audit-scale here;
    * production feeds [[graft.pipeline.Similarity.semanticDedupPairs]] or
    * the q36 LSH pairs — PageRank doesn't care where the pair table came
    * from). Emits each node's 6-decimal rank; the top rank inside each
    * dup cluster is the keep candidate.
    */
  def nearDupRank(spark: SparkSession, dir: String,
                  threshold: Double = 0.25, iters: Int = 5): DataFrame = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorDot.vecDot(col("v"), col("v"))))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(graft.functions.VectorDot.vecDot(col("a.v"), col("b.v")) /
        (col("a.nrm") * col("b.nrm")) >= threshold)
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
    pageRank(pairs, iters)
      .select(col("node").as("vec_id"), round(col("p"), 6).as("rank"))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q160_neardup_pagerank" -> ((s: SparkSession, d: String) => nearDupRank(s, d)),
  )

  /** The oracle unrolls the identical 5 Jacobi rounds as chained CTEs with
    * the same per-round 10-decimal quantization, so the float path is
    * engine-order-independent end-to-end.
    */
  def oracles: Map[String, String] = {
    val base =
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p0 AS (SELECT a.vec_id AS src, b.vec_id AS dst FROM e a JOIN e b
        |       ON a.vec_id < b.vec_id
        |       WHERE list_cosine_similarity(a.v, b.v) >= 0.25),
        |sym AS (SELECT src, dst FROM p0 UNION ALL SELECT dst, src FROM p0),
        |deg AS (SELECT src AS node, count(*) AS deg FROM sym GROUP BY src),
        |nn AS (SELECT count(*) AS n FROM deg),
        |r0 AS (SELECT node, 1.0 / n AS p FROM deg, nn)""".stripMargin
    val iter = (k: Int) =>
      s"""r$k AS (SELECT sym.dst AS node,
         |  round((1 - 0.85) / nn.n + 0.85 * sum(r${k - 1}.p / deg.deg), 10) AS p
         |  FROM sym JOIN deg ON deg.node = sym.src
         |  JOIN r${k - 1} ON r${k - 1}.node = sym.src, nn
         |  GROUP BY sym.dst, nn.n)""".stripMargin
    Map("q160_neardup_pagerank" ->
      (base + ",\n" + (1 to 5).map(iter).mkString(",\n") +
        "\nSELECT node AS vec_id, round(p, 6) AS rank FROM r5"))
  }
}
