package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table (vec_id, embedding:
 * array<float>, label): brute-force cosine top-k as the exact baseline and
 * an LSH-bucketed variant as the scale path. Dot products cast each float to
 * double BEFORE multiplying and fold left-to-right, so DuckDB reproduces the
 * exact IEEE sequence.
 */
object Vector {

  private def emb(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/embeddings.parquet")

  // left-to-right fold of double products — deterministic on both engines
  private val dotExpr =
    "aggregate(zip_with(embedding, q, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
  private val normExpr =
    "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
  private val qnormExpr =
    "sqrt(aggregate(transform(q, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- L2 norms --
    "q50_embedding_norm" -> ((s, d) =>
      emb(s, d).select(col("vec_id"),
        round(expr(normExpr), 4).as("l2_norm"),
        col("label"))),

    // -- brute-force cosine top-20 against the vec_id=0 query vector --
    "q51_cosine_topk" -> ((s, d) => {
      val q = emb(s, d).filter(col("vec_id") === 0)
        .select(col("embedding").as("q"))
      emb(s, d).crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(expr(dotExpr) / (expr(normExpr) * expr(qnormExpr)), 4)
            .as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(20)
    }),

    // -- centroid distance per label class (round-trip of aggregate +
    //    element-wise array math) --
    "q52_label_centroid_norm" -> ((s, d) =>
      emb(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(avg(col("x").cast("double")).as("mean_x"))
        .groupBy("label")
        .agg(round(sqrt(sum(col("mean_x") * col("mean_x"))), 4)
          .as("centroid_norm"),
          count(lit(1)).as("dims")))
  )

  val oracles: Map[String, String] = Map(
    "q50_embedding_norm" ->
      """SELECT vec_id,
        |  round(sqrt(list_aggregate(
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |    'sum')), 4) AS l2_norm,
        |  label
        |FROM embeddings""".stripMargin,
    "q51_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT e.vec_id,
        |    round(
        |      list_aggregate(list_transform(
        |        generate_series(1, len(e.embedding)),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), 'sum')
        |      / (sqrt(list_aggregate(list_transform(e.embedding,
        |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
        |         * sqrt(list_aggregate(list_transform(q.qe,
        |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4)
        |      AS cosine
        |  FROM embeddings e, q WHERE e.vec_id <> 0)
        |SELECT vec_id, cosine FROM scored
        |ORDER BY cosine DESC, vec_id ASC LIMIT 20""".stripMargin,
    "q52_label_centroid_norm" ->
      """WITH flat AS (
        |  SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM (SELECT label, embedding,
        |          unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings)),
        |m AS (SELECT label, pos, avg(x) AS mean_x FROM flat GROUP BY label, pos)
        |SELECT label, round(sqrt(sum(mean_x * mean_x)), 4) AS centroid_norm,
        |  count(*) AS dims
        |FROM m GROUP BY label""".stripMargin
  )
}
