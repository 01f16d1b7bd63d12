package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: BM25 keyword ranking fused with embedding-cosine
  * ranking by reciprocal-rank fusion (RRF, Cormack et al. 2009:
  * score(d) = Σ 1/(K + rank_i(d)), K = 60) — the standard first-stage
  * retriever of a RAG/data-curation stack, and the payoff of maintaining
  * BOTH index families: the text side serves from the inverted-index engine
  * tables (q190) and the vector side from the IVF-PQ engine tables (q187).
  * RRF is rank-only, so the two scoring scales never need calibration —
  * which is also what makes it ORACLE-EXACT: ranks are integers, the fused
  * score is a 2-term rational sum, and DuckDB replays both rankings
  * (BM25's decimal-summed formula; the cosine's left-to-right fold).
  *
  * Scale shape: each side reduces to its top-`pool` list BEFORE ranking
  * (TakeOrderedAndProject — no global row_number over the corpus; the
  * window that assigns ranks runs over `pool` rows), and the fusion is a
  * pool-sized full-outer join. The corpus is touched only through the two
  * index serves.
  *
  * The query: the default probe terms on the text side and document 0's
  * embedding on the vector side (the corpus-with-embeddings model — vec_id
  * aligns with doc_id in the fixture tables; the probe doc itself is
  * excluded from its own vector ranking, as in q34).
  */
object Retrieval {

  /** RRF dampening constant (the value of Cormack et al. and every search
    * engine since).
    */
  val RrfK = 60

  private def rankedPool(scored: DataFrame, scoreCol: String, idCol: String,
                         rankAs: String, pool: Int): DataFrame = {
    val top = scored.orderBy(col(scoreCol).desc, col(idCol)).limit(pool)
    top.withColumn(rankAs,
      row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol))))
      .select(col(idCol).as("doc_id"), col(rankAs))
  }

  private def fuse(text: DataFrame, vec: DataFrame, k: Int): DataFrame =
    text.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("r_text")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("r_vec")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("r_text"), col("r_vec"), col("rrf"))

  /** The table-served BM25 side: q190's engine, top-`pool` ranked. */
  private def textRanks(spark: SparkSession, dir: String, pool: Int): DataFrame =
    rankedPool(
      TextIndex.bm25FromTable(TextIndex.engineFor(spark, dir), k = pool),
      "score", "doc_id", "r_text", pool)

  /** Verdict form (q200): the vector side uses EXACT cosine ranks for
    * document 0's embedding — fully SQL-replayable, so the driver hashes
    * the whole fusion. [[hybridRrfServed]] is the production/bench form
    * with the vector side served from the ANN index.
    */
  def hybridRrf(spark: SparkSession, dir: String,
                k: Int = 10, pool: Int = 50): DataFrame = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val q0 = e.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val sims = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q0))
      .withColumn("sim",
        Similarity.dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .select(col("vec_id"), col("sim"))
    fuse(textRanks(spark, dir, pool),
      rankedPool(sims, "sim", "vec_id", "r_vec", pool), k)
  }

  /** Production/bench form: the vector ranks come from the MAINTAINED
    * IVF-PQ index (q187's engine; exact re-rank of the routed+ADC candidate
    * pool), so both retrieval legs serve from engine tables and no leg ever
    * scans the corpus exhaustively. Approximate where the index is
    * (routing recall), which is why the VERDICT form pins exact ranks.
    */
  def hybridRrfServed(spark: SparkSession, dir: String,
                      k: Int = 10, pool: Int = 50): DataFrame = {
    val eng = AnnIndex.engineFor(spark, dir)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val vec = AnnIndex.topKFromTable(eng, emb, nProbes = 1, k = pool,
        nprobe = 8, rerank = pool * 2)
      .select(col("neighbor_id").as("doc_id"), col("rk").as("r_vec"))
    fuse(textRanks(spark, dir, pool), vec, k)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q200_hybrid_retrieval" ->
      ((s: SparkSession, d: String) => hybridRrf(s, d)),
  )

  val oracles: Map[String, String] = Map(
    // full replay: BM25 formula (q118's decimal route) + exact cosine fold
    // (q109's left-to-right route) + integer-rank RRF — every layer of the
    // fusion is hash-checked
    "q200_hybrid_retrieval" ->
      """WITH w AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY 1),
        |g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM w
        |       WHERE w IN ('spark','data','join','query') GROUP BY 1, 2),
        |df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
        |s AS (SELECT tf.doc_id,
        |        CAST(round(
        |          ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        |            * tf.tf * (1.2 + 1) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)),
        |          8) AS DECIMAL(18,8)) AS ts
        |      FROM tf JOIN df USING (w) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN g),
        |bmt AS (SELECT doc_id, round(CAST(sum(ts) AS DOUBLE), 4) AS score
        |        FROM s GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 50),
        |bmr AS (SELECT doc_id,
        |          CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS r_text
        |        FROM bmt),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x*x)),
        |             (a,b) -> a + b)) AS nrm
        |      FROM e),
        |q AS (SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = 0),
        |c AS (SELECT vec_id,
        |        list_reduce(list_prepend(0.0, list_transform(range(0, len(qv)),
        |          j -> qv[j+1] * v[j+1])), (a,b) -> a + b) / (qn * nrm) AS sim
        |      FROM n, q WHERE vec_id <> 0),
        |vt AS (SELECT vec_id, sim FROM c ORDER BY sim DESC, vec_id LIMIT 50),
        |vr AS (SELECT vec_id AS doc_id,
        |         CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INT) AS r_vec
        |       FROM vt),
        |f AS (SELECT COALESCE(bmr.doc_id, vr.doc_id) AS doc_id, r_text, r_vec,
        |        round(COALESCE(1.0/(60 + r_text), 0.0) +
        |              COALESCE(1.0/(60 + r_vec), 0.0), 6) AS rrf
        |      FROM bmr FULL OUTER JOIN vr ON bmr.doc_id = vr.doc_id)
        |SELECT doc_id, r_text, r_vec, rrf FROM f
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
  )
}
