package graft.queries

import graft.functions.VecExprs
import graft.ops.VecIndex
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

  /** See Text.fanOut: the test corpus is one parquet split, and per-row
   * 384-dim dot products must not run on one task because the FILE count is
   * one. Round-robin repartition decouples map parallelism from layout. */
  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  // expression fragments shared with the write-time index builder
  // (graft.functions.VecExprs / graft.ops.VecIndex)
  private val dotExpr = VecExprs.dotExpr
  private val normExpr = VecExprs.normExpr
  private val qnormExpr = VecExprs.qnormExpr

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- ANN, LSH-bucketed: the bucket assignment lives in the PERSISTED
    //    write-time index (graft.ops.VecIndex); the probe is a pruned
    //    bucket-equality join against the stored index, then an embedding
    //    fetch for the (small) candidate list only — no corpus-wide bucket
    //    recompute per query. --
    "q53_ann_lsh" -> ((s, d) => {
      val idx = VecIndex.buckets(s, VecIndex.ensure(s, s"$d/embeddings.parquet"))
      val qb = idx.filter(col("vec_id") === 0).select(col("bkt").as("qbkt"))
      val cand = idx.join(broadcast(qb), col("bkt") === col("qbkt"))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("bkt"))
      val q = emb(s, d).filter(col("vec_id") === 0)
        .select(col("embedding").as("q"))
      emb(s, d).join(cand, "vec_id")
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("bkt"),
          round(expr(dotExpr) / (expr(normExpr) * expr(qnormExpr)), 4)
            .as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(10)
    }),

    // -- embedding-cosine near-dup DEDUP: planted duplicate vectors are
    //    found via LSH bucket-equality candidates (per-row bucket expr, no
    //    corpus cross join), confirmed by exact cosine >= 0.99. The
    //    embedding analog of q46's text LSH dedup. --
    "q49_embedding_dedup" -> ((s, d) => {
      // Plane count from the corpus size (VecExprs.dedupPlanes integer
      // ladder, 10 planes at the sf0.1 anchor, +1 per row-doubling): the
      // within-bucket candidate join is quadratic in bucket occupancy, so a
      // FIXED plane count turns a 10x corpus into ~100x pairs (measured
      // 17.5x wall in the r5 superlinearity audit). Finer buckets than the
      // 64-bucket ANN index either way — identical vectors collide in ALL
      // buckets, so planted-dup recall is unaffected.
      val planes = VecExprs.dedupPlanes(2L * emb(s, d).count())
      val doubled = fanOut(emb(s, d)
        .unionAll(emb(s, d).withColumn("vec_id", col("vec_id") + 100000)))
        .select(col("vec_id"), col("embedding"),
          expr(VecExprs.bucketSparkN(planes)).as("bkt"))
      val a = doubled.select(col("vec_id").as("id_a"),
        col("embedding").as("ea"), col("bkt"))
      val b = doubled.select(col("vec_id").as("id_b"),
        col("embedding").as("eb"), col("bkt"))
      a.join(b, Seq("bkt"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(expr(VecExprs.dot("ea", "eb")) /
            (expr(VecExprs.norm("ea")) * expr(VecExprs.norm("eb"))), 4)
            .as("cosine"))
        .filter(col("cosine") >= 0.99)
    }),

    // -- persisted-index audit: stored buckets vs a fresh recompute; n_stale
    //    must be 0 after any source rewrite because VecIndex.ensure
    //    fingerprints the source and rebuilds on change. Oracle: DuckDB
    //    reads the PERSISTED index parquet itself and recomputes every
    //    bucket from the embeddings with its own hyperplane expression. --
    "q57_ann_index_persisted" -> ((s, d) => {
      val indexDir = VecIndex.ensure(s, s"$d/embeddings.parquet")
      // snapshot-PIN the oracle's view of the index: the live index dir is
      // mutable shared state (q53/q54 call ensure on the same source; a tmp
      // cleaner can touch it), and the driver's DuckDB reads the oracle
      // AFTER all queries ran — so both engines consume a fixture copy of
      // the bucket table frozen at this query's execution. The integer sum
      // is CAST to BIGINT: DuckDB's sum() over integers yields HUGEINT,
      // which pandas renders as float ("59.0") and the driver's hash then
      // diverges from Spark's int64 even when every value matches.
      // plane count: the oracle RE-DERIVES it from count(*) via the same
      // integer ladder the build used — legitimate for this source-path
      // index because ensure() fingerprint-validates against the current
      // parquet, so count-at-build == count-now by construction
      val idx = OracleFixtures.stage(s, "q57_ann_index_persisted", "q57_idx",
        d, VecIndex.buckets(s, indexDir))(fx =>
        s"""WITH cnt AS (SELECT ${VecExprs.annPlanesSql("count(*)")} AS planes
           |  FROM embeddings),
           |idx AS (SELECT vec_id, bkt
           |  FROM read_parquet('$fx/*.parquet')),
           |fresh AS (SELECT vec_id,
           |    ${VecExprs.bucketDuckDyn(16, "planes")} AS bkt_fresh
           |  FROM embeddings, cnt)
           |SELECT idx.bkt, count(*) AS n_vecs,
           |  CAST(sum(CASE WHEN idx.bkt = fresh.bkt_fresh THEN 0 ELSE 1 END)
           |    AS BIGINT) AS n_stale
           |FROM idx JOIN fresh USING (vec_id)
           |GROUP BY idx.bkt""".stripMargin)
      val fresh = emb(s, d)
        .select(col("vec_id"),
          expr(VecExprs.bucketSparkN(VecIndex.planesOf(indexDir)))
            .as("bkt_fresh"))
      idx.join(fresh, "vec_id")
        .groupBy("bkt")
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("bkt") === col("bkt_fresh"), 0L).otherwise(1L))
            .as("n_stale"))
    }),

    // -- INCREMENTAL index maintenance audit: a MetaStore-backed embeddings
    //    table is appended twice; the first ensureForStore builds the full
    //    era, the second extends it with ONLY the appended rows (parent era
    //    hard-linked — the streaming-ingest shape where a per-commit O(table)
    //    rebuild would dominate). Output: per-era vector count + staleness
    //    vs a fresh recompute. Oracle: DuckDB reads the persisted era
    //    parquet itself (filename=true exposes the era) and recomputes every
    //    bucket from the embeddings table with its own hyperplane SQL. --
    "q107_ann_incremental" -> ((s, d) => {
      val dir = OracleFixtures.freshDir("q107_store", d)
      val store = new graft.table.MetaStore(dir, Seq("vec_id", "label"))
      val all = emb(s, d)
      graft.ops.Append.run(s, store, all.filter(col("vec_id") % 2 === 0))
      VecIndex.ensureForStore(s, store) // snapshot 1: full era
      graft.ops.Append.run(s, store, all.filter(col("vec_id") % 2 === 1))
      val idx = VecIndex.ensureForStore(s, store) // snapshot 2: +inc era
      // plane count from the index's OWN planes.csv sidecar, in both
      // engines: an incremental index pins its planes at first build (here:
      // the half-corpus era), so count(*)-re-derivation would diverge once
      // the corpus crosses a ladder step — the pinned param is part of the
      // artifact under audit, and the oracle reads the same one-row CSV
      OracleFixtures.register("q107_ann_incremental",
        s"""WITH p AS (SELECT planes FROM read_csv('$idx/planes.csv')),
           |idx AS (SELECT vec_id, bkt,
           |    regexp_extract(filename, 'eras/([^/]+)/', 1) AS era
           |  FROM read_parquet('$idx/eras/*/buckets/*.parquet', filename=true)),
           |fresh AS (SELECT vec_id,
           |    ${VecExprs.bucketDuckDyn(16, "planes")} AS bkt_fresh
           |  FROM embeddings, p)
           |SELECT era, count(*) AS n_vecs,
           |  CAST(sum(CASE WHEN bkt = bkt_fresh THEN 0 ELSE 1 END) AS BIGINT)
           |    AS n_stale
           |FROM idx JOIN fresh USING (vec_id)
           |GROUP BY era""".stripMargin)
      VecIndex.buckets(s, idx)
        .withColumn("era",
          regexp_extract(input_file_name(), "eras/([^/]+)/", 1))
        .join(all.select(col("vec_id"),
          expr(VecExprs.bucketSparkN(VecIndex.planesOf(idx)))
            .as("bkt_fresh")), "vec_id")
        .groupBy("era")
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("bkt") === col("bkt_fresh"), 0L).otherwise(1L))
            .as("n_stale"))
    }),

    // -- ANN, IVF-style: coarse cells = labels with mean centroids FROM THE
    //    PERSISTED INDEX; probe assigns the query to its nearest centroid
    //    (nprobe=1), exact cosine only within that cell. --
    "q54_ann_ivf" -> ((s, d) => {
      val e = emb(s, d)
      val cent = VecIndex.centroids(s,
        VecIndex.ensure(s, s"$d/embeddings.parquet"))
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
    // -- int8 symmetric quantization (vector compression before serving /
    //    index build): per-vector absmax scale, q_i = round(x_i * 127 /
    //    absmax). Output carries the scale + a digest of the quantized
    //    array (the array itself hashes engine-dependently) + range probes.
    //    Map-only per row; at 100 TB this is the pass that shrinks the
    //    embedding column 4x before the ANN index rebuild. --
    "q76_embedding_quantize" -> ((s, d) => {
      val absmax = "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
      val quant = s"transform(embedding, x -> " +
        s"CAST(round(CAST(x AS DOUBLE) * 127.0 / $absmax) AS INT))"
      fanOut(emb(s, d)).select(
        col("vec_id"), col("label"),
        round(expr(absmax), 6).as("scale"),
        expr(s"md5(concat_ws(',', $quant))").as("quant_md5"),
        expr(s"array_min($quant)").as("q_min"),
        expr(s"array_max($quant)").as("q_max"))
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
      fanOut(emb(s, d)).crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(expr(dotExpr) / (expr(normExpr) * expr(qnormExpr)), 4)
            .as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(20)
    }),

    // -- embedding quality gate: cosine of every vector to its OWN label
    //    centroid — mislabeled / corrupted embeddings sit far from their
    //    class center and get flagged. Centroids are a 10-row broadcast;
    //    the scoring pass is per-row array math, no corpus self-join. The
    //    vector-modality analog of the q42/q97 text quality filters. --
    "q99_embedding_outliers" -> ((s, d) => {
      val cent = emb(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy("label")
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
          .as("q"))
      fanOut(emb(s, d)).join(broadcast(cent), "label")
        .select(col("vec_id"), col("label"),
          round(expr(dotExpr) / (expr(normExpr) * expr(qnormExpr)), 4)
            .as("cosine_to_centroid"))
        .withColumn("is_outlier", col("cosine_to_centroid") < 0.2)
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
    "q76_embedding_quantize" ->
      """WITH b AS (SELECT vec_id, label, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS am
        |  FROM embeddings),
        |q AS (SELECT vec_id, label, am,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / am) AS INT)) AS qv
        |  FROM b)
        |SELECT vec_id, label, round(am, 6) AS scale,
        |  md5(array_to_string(qv, ',')) AS quant_md5,
        |  list_min(qv) AS q_min, list_max(qv) AS q_max
        |FROM q""".stripMargin,
    "q49_embedding_dedup" ->
      s"""WITH doubled AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + 100000, embedding FROM embeddings),
         |cnt AS (SELECT ${VecExprs.dedupPlanesSql("count(*)")} AS planes
         |  FROM doubled),
         |b AS (SELECT vec_id, embedding,
         |    ${VecExprs.bucketDuckDyn(16, "planes")} AS bkt
         |  FROM doubled, cnt),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
         |    round(
         |      list_aggregate(list_transform(
         |        generate_series(1, len(a.embedding)),
         |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b2.embedding[i] AS DOUBLE)), 'sum')
         |      / (sqrt(list_aggregate(list_transform(a.embedding,
         |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
         |         * sqrt(list_aggregate(list_transform(b2.embedding,
         |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4)
         |      AS cosine
         |  FROM b a JOIN b b2 ON a.bkt = b2.bkt AND a.vec_id < b2.vec_id)
         |SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.99""".stripMargin,
    "q53_ann_lsh" ->
      s"""WITH cnt AS (SELECT ${VecExprs.annPlanesSql("count(*)")} AS planes
         |  FROM embeddings),
         |b AS (SELECT vec_id, embedding,
         |    ${VecExprs.bucketDuckDyn(16, "planes")} AS bkt
         |  FROM embeddings, cnt),
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
    "q99_embedding_outliers" ->
      """WITH flat AS (
        |  SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM (SELECT label, embedding,
        |          unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings)),
        |m AS (SELECT label, pos, avg(x) AS m FROM flat GROUP BY label, pos),
        |c AS (SELECT label, list(m ORDER BY pos) AS q FROM m GROUP BY label),
        |scored AS (
        |  SELECT e.vec_id, e.label,
        |    round(
        |      list_aggregate(list_transform(generate_series(1, len(e.embedding)),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * c.q[i]), 'sum')
        |      / (sqrt(list_aggregate(list_transform(e.embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
        |         * sqrt(list_aggregate(list_transform(c.q, x -> x * x), 'sum'))),
        |      4) AS cosine_to_centroid
        |  FROM embeddings e JOIN c USING (label))
        |SELECT vec_id, label, cosine_to_centroid,
        |  cosine_to_centroid < 0.2 AS is_outlier
        |FROM scored""".stripMargin,
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
