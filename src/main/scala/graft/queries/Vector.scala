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

  // ---- LSH scale path: 6 random-hyperplane sign bits -> 64 buckets ----
  // Hyperplane weights are pseudo-random +-1 from pure integer arithmetic
  // ((p*1000003 + i*7919) mod 97 < 48), so BOTH engines derive bit-identical
  // planes with no shipped state. Per-plane sign = left-to-right fold of
  // +-x_i doubles (float-parity recipe).
  private val nPlanes = 6

  private def sigTermSpark(p: Int): String =
    s"CASE WHEN aggregate(transform(embedding, (x, i) -> " +
      s"CASE WHEN pmod($p*1000003 + i*7919, 97) < 48 THEN CAST(x AS DOUBLE) " +
      s"ELSE -CAST(x AS DOUBLE) END), CAST(0.0 AS DOUBLE), " +
      s"(acc, v) -> acc + v) > 0.0 THEN ${1 << p} ELSE 0 END"

  private val bucketSpark: String =
    (0 until nPlanes).map(sigTermSpark).mkString(" + ")

  private def sigTermDuck(p: Int): String =
    s"CASE WHEN list_aggregate(list_transform(generate_series(1, len(embedding)), " +
      s"i -> CASE WHEN (($p*1000003 + (i-1)*7919) % 97) < 48 " +
      s"THEN CAST(embedding[i] AS DOUBLE) ELSE -CAST(embedding[i] AS DOUBLE) END), " +
      s"'sum') > 0.0 THEN ${1 << p} ELSE 0 END"

  private val bucketDuck: String =
    (0 until nPlanes).map(sigTermDuck).mkString(" + ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- ANN, LSH-bucketed: candidates share the query's hyperplane-sign
    //    bucket; exact cosine only over candidates. At scale the bucket
    //    column is precomputed at write time and the probe is a pruned
    //    bucket-equality join, not a cross join. --
    "q53_ann_lsh" -> ((s, d) => {
      val b = emb(s, d).withColumn("bkt", expr(bucketSpark))
      val q = b.filter(col("vec_id") === 0)
        .select(col("bkt").as("qbkt"), col("embedding").as("q"))
      b.join(broadcast(q), col("bkt") === col("qbkt"))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("bkt"),
          round(expr(dotExpr) / (expr(normExpr) * expr(qnormExpr)), 4)
            .as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(10)
    }),

    // -- ANN, IVF-style: coarse cells = labels with mean centroids; probe
    //    assigns the query to its nearest centroid (nprobe=1), exact cosine
    //    only within that cell. --
    "q54_ann_ivf" -> ((s, d) => {
      val e = emb(s, d)
      val cent = e
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(avg(col("x").cast("double")).as("mean_x"))
      val qflat = e.filter(col("vec_id") === 0)
        .select(posexplode(col("embedding")).as(Seq("pos", "qx")))
      val cell = cent.join(broadcast(qflat), "pos")
        .groupBy("label")
        .agg(sum((col("mean_x") - col("qx").cast("double")) *
          (col("mean_x") - col("qx").cast("double"))).as("d2"))
        .orderBy(col("d2").asc, col("label").asc)
        .limit(1)
        .select("label")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))
      e.join(broadcast(cell), "label")
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          round(expr(dotExpr) / (expr(normExpr) * expr(qnormExpr)), 4)
            .as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(10)
    }),
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
    "q53_ann_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding, $bucketDuck AS bkt FROM embeddings),
         |q AS (SELECT bkt AS qbkt, embedding AS qe FROM b WHERE vec_id = 0),
         |cand AS (
         |  SELECT b.vec_id, b.bkt,
         |    round(
         |      list_aggregate(list_transform(
         |        generate_series(1, len(b.embedding)),
         |        i -> CAST(b.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), 'sum')
         |      / (sqrt(list_aggregate(list_transform(b.embedding,
         |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
         |         * sqrt(list_aggregate(list_transform(q.qe,
         |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4)
         |      AS cosine
         |  FROM b, q WHERE b.bkt = q.qbkt AND b.vec_id <> 0)
         |SELECT vec_id, bkt, cosine FROM cand
         |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,
    "q54_ann_ivf" ->
      """WITH flat AS (
        |  SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM (SELECT label, embedding,
        |          unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings)),
        |cent AS (SELECT label, pos, avg(x) AS mean_x FROM flat GROUP BY label, pos),
        |qflat AS (
        |  SELECT i AS pos, CAST(embedding[i] AS DOUBLE) AS qx
        |  FROM (SELECT embedding,
        |          unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings WHERE vec_id = 0)),
        |cell AS (
        |  SELECT c.label FROM cent c JOIN qflat f ON c.pos = f.pos
        |  GROUP BY c.label
        |  ORDER BY sum((c.mean_x - f.qx) * (c.mean_x - f.qx)) ASC, c.label ASC
        |  LIMIT 1),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, e.label,
        |  round(
        |    list_aggregate(list_transform(
        |      generate_series(1, len(e.embedding)),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), 'sum')
        |    / (sqrt(list_aggregate(list_transform(e.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
        |       * sqrt(list_aggregate(list_transform(q.qe,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4)
        |    AS cosine
        |FROM embeddings e JOIN cell USING (label), q
        |WHERE e.vec_id <> 0
        |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,
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
