package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Training-data text pipeline operators over the `documents` table:
 * exact dedup, MinHash near-dup, SimHash, n-gram Jaccard, language-ID,
 * quality scoring, token counting, fingerprinting. Every hash is md5-based
 * so the DuckDB oracle computes bit-identical values.
 *
 * The 500-doc corpus has no natural duplicates, so near-dup queries verify
 * against PLANTED duplicates (self-union with offset ids) — the planted pair
 * set is the expected output, in both engines.
 */
object Text {

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")

  /** CPU-dense per-row work (md5 shingle minhash ≈ 1000 digests/row) must
   * not inherit parallelism from the file count: the test corpus is ONE
   * parquet split, which would pin the whole map stage to one task. A
   * round-robin repartition costs one tiny-row shuffle and buys
   * cores-wide parallelism for the expensive projection; at production
   * scale the scan already has splits and the same plan stays balanced
   * even when a few huge files dominate. */
  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  private val words: Column = split(trim(lower(col("text"))), "\\s+")

  /** Shingle body, hoisted to its own column: referencing the lowered
   * substring INSIDE the transform lambda would recompute it once per
   * shingle (~250x redundant string work per row, measured 25x wall). */
  private val bodyCol: Column = lower(substring(col("text"), 1, 256))

  /** Per-shingle md5 digests for hash-stream family `j`, map-side (a
   * transform — no explode, no shuffle), hoisted to a `_d$j` column. ONE
   * digest serves FOUR minhash streams: each stream is a non-overlapping
   * 8-hex slice of the digest ("less hashing, same performance" — one
   * strong hash, many projections), so the md5 work per row drops 4x vs
   * independently-keyed streams; md5 dominated the whole LSH stage wall
   * (25.5s -> ~3s for q48 at sf0.1). */
  private def digestsCol(j: Int): Column = expr(
    "transform(sequence(1, greatest(length(_body) - 7, 1)), " +
      s"i -> md5(concat('$j', substring(_body, i, 8))))")

  /** Minhash stream = min over shingles of one 8-hex digest slice. */
  private def sliceMin(j: Int, slice: Int): Column = expr(
    s"array_min(transform(_d$j, d -> substring(d, ${slice * 8 + 1}, 8)))")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- exact dedup: canonical row per content hash --
    "q40_dedup_exact" -> ((s, d) =>
      docs(s, d)
        .unionAll(docs(s, d).withColumn("doc_id", col("doc_id") + 100000))
        .groupBy(md5(col("text")).as("content_md5"))
        .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))),

    // -- token counting: whitespace + alpha/num token classes --
    "q41_token_count" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        size(words).as("n_tokens"),
        length(col("text")).as("n_chars_measured"),
        size(expr("regexp_extract_all(text, '[A-Za-z]+', 0)")).as("n_alpha_tokens"),
        size(expr("regexp_extract_all(text, '[0-9]+', 0)")).as("n_num_tokens"))),

    // -- quality scoring: length / punctuation / caps / mean token length --
    "q42_quality" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        length(col("text")).as("len"),
        size(words).as("n_tokens"),
        round(length(col("text")).cast("double") / size(words), 4)
          .as("chars_per_token"),
        round(length(regexp_replace(col("text"), "[^.,!?;:]", ""))
          .cast("double") / length(col("text")), 4).as("punct_ratio"),
        round(length(regexp_replace(col("text"), "[^A-Z]", ""))
          .cast("double") / length(col("text")), 4).as("upper_ratio"))),

    // -- language-ID: stopword-hit heuristic with deterministic tie-break --
    "q43_langid" -> ((s, d) => {
      def hits(ws: Seq[String]): Column =
        size(filter(words, w => w.isInCollection(ws)))
      val en = hits(Seq("the", "and", "of", "to", "in", "is"))
      val de = hits(Seq("der", "die", "das", "und", "ist", "nicht"))
      val fr = hits(Seq("le", "la", "et", "les", "des", "est"))
      docs(s, d).select(col("doc_id"),
          en.as("en_hits"), de.as("de_hits"), fr.as("fr_hits"))
        .withColumn("lang_guess",
          when(col("en_hits") >= col("de_hits") &&
               col("en_hits") >= col("fr_hits"), "en")
            .when(col("de_hits") >= col("fr_hits"), "de")
            .otherwise("fr"))
    }),

    // -- BPE-style pre-tokenization count (the GPT-2 split regex, ASCII
    //    classes so Java regex and DuckDB RE2 agree byte-for-byte):
    //    contractions | space?letters | space?digits | space?other | space
    //    runs. The count a pipeline budgets context length with BEFORE the
    //    expensive real tokenizer pass. --
    "q78_bpe_tokens" -> ((s, d) => {
      val pat = "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+" +
        "| ?[^A-Za-z0-9 \\t\\n\\r]+|[ \\t\\n\\r]+"
      docs(s, d).select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0)))
          .as("n_bpe_tokens"),
        size(regexp_extract_all(col("text"), lit(" ?[^A-Za-z0-9 \\t\\n\\r]+"),
          lit(0))).as("n_other_tokens"))
    }),

    // -- sequence packing: greedy-fill documents into 256-token training
    //    windows, per salt group (doc_id % 16) in doc_id order —
    //    the context-window packing pass an LLM pipeline runs before
    //    batching. flatMapSortedGroups streams each group's docs through a
    //    running accumulator (constant memory per group, no per-group
    //    collect); the group count is the parallelism knob at scale. A doc
    //    longer than the budget gets its own window. Oracle: the SAME greedy
    //    recurrence as a DuckDB recursive CTE over row_number order. --
    "q91_sequence_packing" -> ((s, d) => {
      import s.implicits._
      val toks = docs(s, d).select(col("doc_id"), size(words).as("n_tokens"))
        .as[(Long, Int)]
      toks.groupByKey(_._1 % 16)
        .flatMapSortedGroups(col("doc_id")) { (g, it) =>
          val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
          var pack = 0L
          var acc = 0L
          var n = 0L
          it.foreach { case (_, t) =>
            if (n > 0 && acc + t > 256) {
              out += ((g, pack, n, acc)); pack += 1; acc = 0; n = 0
            }
            acc += t; n += 1
          }
          if (n > 0) out += ((g, pack, n, acc))
          out.iterator
        }.toDF("group_id", "pack_idx", "n_docs", "pack_tokens")
    }),

    // -- deterministic train/val/test split: the first md5 byte of the doc
    //    id buckets each doc into ~80/10/10 (hex compare: < 'cc' = 204/256
    //    train, < 'e6' = 230/256 val, else test) — stable under reruns,
    //    reshuffles, and table growth, because membership depends only on
    //    the id. The split-assignment pass every training pipeline runs;
    //    DuckDB reproduces the identical md5 bucketing. --
    "q96_split_assign" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), col("lang"),
        substring(md5(col("doc_id").cast("string")), 1, 2).as("h"))
        .withColumn("split",
          when(col("h") < "cc", "train")
            .when(col("h") < "e6", "val")
            .otherwise("test"))
        .drop("h")),

    // -- repetition quality filter (the Gopher/MassiveText-style rule):
    //    fraction of duplicate word 3-grams and duplicate words inside each
    //    doc — boilerplate/spam detectors every LLM corpus pass applies.
    //    Pure per-row array math (transform + array_distinct), no shuffle;
    //    DuckDB mirrors it with list_transform/list_distinct. --
    "q97_repetition" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), words.as("ts"))
        .withColumn("n", size(col("ts")))
        // CASE guard: Spark's sequence(1, 0) counts DOWN ([1,0]) where
        // DuckDB's range(1, 1) is empty — short docs must be empty-gram in
        // both engines
        .withColumn("grams", expr(
          "CASE WHEN n >= 3 THEN transform(sequence(1, n - 2), i -> " +
            "concat_ws(' ', element_at(ts, i), element_at(ts, i + 1), " +
            "element_at(ts, i + 2))) ELSE array() END"))
        .select(col("doc_id"), col("n").as("n_tokens"),
          round(lit(1.0) - size(array_distinct(col("ts"))).cast("double") /
            greatest(col("n"), lit(1)), 4).as("dup_word_frac"),
          // a doc too short to HAVE 3-grams is not repetitive — guard the
          // empty-gram case to 0.0 (1 - 0/1 would flag every short doc)
          when(size(col("grams")) === 0, lit(0.0))
            .otherwise(round(lit(1.0) -
              size(array_distinct(col("grams"))).cast("double") /
                greatest(size(col("grams")), lit(1)), 4))
            .as("dup_3gram_frac"))
        .withColumn("flagged",
          col("dup_word_frac") > 0.7 || col("dup_3gram_frac") > 0.2)),

    // -- document fingerprint: md5 of the canonical text form --
    "q44_fingerprint" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        md5(trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          " +", " "))).as("fingerprint"))),

    // -- MinHash signatures: 4 hash streams (digest slices) over 8-char
    //    shingles of the first 256 chars. Computed PER ROW with
    //    array_min/transform — an explode + groupBy would shuffle one row
    //    per shingle (~250x the corpus); this form is map-only, no shuffle
    //    at all. --
    "q45_minhash" -> ((s, d) =>
      fanOut(docs(s, d)).withColumn("_body", bodyCol)
        .withColumn("_d0", digestsCol(0))
        .select(col("doc_id"), sliceMin(0, 0).as("mh0"),
          sliceMin(0, 1).as("mh1"), sliceMin(0, 2).as("mh2"),
          sliceMin(0, 3).as("mh3"))),

    // -- MinHash LSH dedup: planted duplicates must collide on the full
    //    signature; per-row signatures (no explode shuffle), then ONE
    //    groupBy on the band bucket --
    "q46_minhash_dedup" -> ((s, d) => {
      val doubled = fanOut(docs(s, d)
        .unionAll(docs(s, d).withColumn("doc_id", col("doc_id") + 100000)))
      doubled.withColumn("_body", bodyCol)
        .withColumn("_d0", digestsCol(0))
        .select(col("doc_id"), sliceMin(0, 0).as("mh0"), sliceMin(0, 1).as("mh1"))
        .groupBy("mh0", "mh1")
        .agg(count(lit(1)).as("n_members"), min("doc_id").as("canonical_id"))
        .filter(col("n_members") > 1)
    }),

    // -- SimHash (16-bit, md5-hex-digit votes per word occurrence) --
    "q47_simhash" -> ((s, d) => {
      val perWord = fanOut(docs(s, d))
        .select(col("doc_id"), explode(words).as("w"))
        .filter(length(col("w")) > 0)
        .withColumn("h", md5(col("w")))
      val bitVotes = (1 to 16).map { j =>
        sum(when(substring(col("h"), j, 1).isInCollection(
          Seq("8", "9", "a", "b", "c", "d", "e", "f")), 1)
          .otherwise(-1)).as(s"v$j")
      }
      val voted = perWord.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
      val sim = (1 to 16).map { j =>
        when(col(s"v$j") > 0, lit(1L << (j - 1))).otherwise(0L)
      }.reduce(_ + _)
      voted.select(col("doc_id"), sim.as("simhash16"))
    }),

    // -- n-gram (word-set) Jaccard near-dup pairs: LSH band join generates
    //    the candidates, exact Jaccard confirms. Band strength matters as
    //    much as band count: a single-minhash band collides with probability
    //    s (any two docs sharing ONE hot min-shingle bucket together — on
    //    templated corpora that made one bucket hold ~20% of the corpus, a
    //    quadratic candidate blowup). Bands of r=2 minhashes collide with
    //    probability s^2, and b=4 × r=2 puts the LSH S-curve threshold at
    //    (1/b)^(1/r) = 0.5 — exactly this query's Jaccard cutoff. Measured
    //    at sf0.1: 5.78M candidate pair-expansions (max bucket 1982) with
    //    r=1 vs 238k (max 324) with r=2. --
    "q48_jaccard_pairs" -> ((s, d) => jaccardPairs(s, d)),

    // -- transitive near-dup CLUSTERS: pairs say A~B and B~C, but the dedup
    //    pipeline keeps ONE canonical doc per {A,B,C} — connected components
    //    (ops/Components min-label propagation) over the q48 pair graph,
    //    cross-checked against a recursive-CTE fixpoint in DuckDB. --
    "q77_dup_clusters" -> ((s, d) =>
      graft.ops.Components.minLabel(jaccardPairs(s, d).select("id_a", "id_b"))
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_doc_id")))
  )

  /** q48 body, shared with q77: LSH band candidates + exact-Jaccard confirm. */
  private def jaccardPairs(s: SparkSession, d: String): DataFrame = {
      val doubled = fanOut(docs(s, d)
        .unionAll(docs(s, d).withColumn("doc_id", col("doc_id") + 100000)))
      val base = doubled.withColumn("_body", bodyCol)
        .withColumn("_d0", digestsCol(0)).withColumn("_d1", digestsCol(1))
        .select(
          Seq(col("doc_id"), array_distinct(words).as("ws")) ++
            (0 to 7).map(k => sliceMin(k / 4, k % 4).as(s"mh$k")): _*)
      val bands = base.select(col("doc_id"), explode(array(
          (0 to 3).map(b => struct(lit(b).as("band"),
            md5(concat(col(s"mh${2 * b}"), col(s"mh${2 * b + 1}"))).as("h"))): _*))
          .as("bh"))
        .select(col("doc_id"), col("bh.band").as("band"), col("bh.h").as("h"))
      // ONE groupBy materializes the band buckets (a self-join would
      // re-evaluate the whole signature subtree per side); candidate pairs
      // expand from each bucket's member list with a combinations
      // expression — bucket sizes are near-dup-group sized, so the
      // expansion is bounded and the shuffle moves only (band, hash, ids)
      val pairsExpr = expr(
        "flatten(transform(sequence(1, size(ids) - 1), i -> " +
          "transform(slice(ids, i + 1, size(ids) - i), x -> " +
          "struct(least(element_at(ids, i), x) AS a, " +
          "greatest(element_at(ids, i), x) AS b))))")
      val cand = bands.groupBy("band", "h")
        .agg(collect_list("doc_id").as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(pairsExpr).as("p"))
        .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
        .distinct()
      val ws = doubled.select(col("doc_id"), array_distinct(words).as("ws"))
      cand
        .join(ws.select(col("doc_id").as("id_a"), col("ws").as("ws_a")), "id_a")
        .join(ws.select(col("doc_id").as("id_b"), col("ws").as("ws_b")), "id_b")
        .withColumn("inter",
          size(array_intersect(col("ws_a"), col("ws_b"))).cast("double"))
        .withColumn("jac", round(col("inter") /
          (size(col("ws_a")) + size(col("ws_b")) - col("inter")), 4))
        .filter(col("jac") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jac"))
  }

  val oracles: Map[String, String] = Map(
    "q97_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ts,
        |    len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, ts, n,
        |    list_transform(range(1, greatest(n - 2, 0) + 1), i ->
        |      concat_ws(' ', ts[i], ts[i + 1], ts[i + 2])) AS grams
        |  FROM t),
        |fr AS (
        |  SELECT doc_id, CAST(n AS INT) AS n_tokens,
        |    round(1.0 - CAST(len(list_distinct(ts)) AS DOUBLE) /
        |      greatest(n, 1), 4) AS dup_word_frac,
        |    CASE WHEN len(grams) = 0 THEN 0.0
        |         ELSE round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) /
        |           greatest(len(grams), 1), 4) END AS dup_3gram_frac
        |  FROM g)
        |SELECT doc_id, n_tokens, dup_word_frac, dup_3gram_frac,
        |  (dup_word_frac > 0.7 OR dup_3gram_frac > 0.2) AS flagged
        |FROM fr""".stripMargin,
    "q96_split_assign" ->
      """SELECT doc_id, lang,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
        |         THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "q91_sequence_packing" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |    len(regexp_split_to_array(trim(lower(text)), '\s+')) AS t,
        |    doc_id % 16 AS g
        |  FROM documents),
        |ord AS (
        |  SELECT g, t, row_number() OVER (PARTITION BY g ORDER BY doc_id) AS rn
        |  FROM toks),
        |rec(g, rn, t, acc, pack_idx) AS (
        |  SELECT g, rn, t, CAST(t AS BIGINT), CAST(0 AS BIGINT)
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.g, o.rn, o.t,
        |    CASE WHEN r.acc + o.t > 256 THEN CAST(o.t AS BIGINT)
        |         ELSE r.acc + o.t END,
        |    CASE WHEN r.acc + o.t > 256 THEN r.pack_idx + 1
        |         ELSE r.pack_idx END
        |  FROM rec r JOIN ord o ON o.g = r.g AND o.rn = r.rn + 1)
        |SELECT g AS group_id, pack_idx,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(t) AS BIGINT) AS pack_tokens
        |FROM rec GROUP BY g, pack_idx""".stripMargin,
    "q78_bpe_tokens" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text,
        |    '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r]+|[ \t\n\r]+'))
        |    AS n_bpe_tokens,
        |  len(regexp_extract_all(text, ' ?[^A-Za-z0-9 \t\n\r]+'))
        |    AS n_other_tokens
        |FROM documents""".stripMargin,
    "q40_dedup_exact" ->
      """WITH doubled AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents)
        |SELECT md5(text) AS content_md5, min(doc_id) AS keep_doc_id,
        |  count(*) AS n_copies
        |FROM doubled GROUP BY md5(text)""".stripMargin,
    "q41_token_count" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens,
        |  length(text) AS n_chars_measured,
        |  len(regexp_extract_all(text, '[A-Za-z]+')) AS n_alpha_tokens,
        |  len(regexp_extract_all(text, '[0-9]+')) AS n_num_tokens
        |FROM documents""".stripMargin,
    "q42_quality" ->
      """SELECT doc_id, length(text) AS len,
        |  len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens,
        |  round(length(text)*1.0 /
        |    len(regexp_split_to_array(trim(lower(text)), '\s+')), 4)
        |    AS chars_per_token,
        |  round(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))*1.0
        |    / length(text), 4) AS punct_ratio,
        |  round(length(regexp_replace(text, '[^A-Z]', '', 'g'))*1.0
        |    / length(text), 4) AS upper_ratio
        |FROM documents""".stripMargin,
    "q43_langid" ->
      """WITH w AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |h AS (SELECT doc_id,
        |  len(list_filter(ws, x -> x IN ('the','and','of','to','in','is'))) AS en_hits,
        |  len(list_filter(ws, x -> x IN ('der','die','das','und','ist','nicht'))) AS de_hits,
        |  len(list_filter(ws, x -> x IN ('le','la','et','les','des','est'))) AS fr_hits
        |FROM w)
        |SELECT doc_id, en_hits, de_hits, fr_hits,
        |  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
        |       WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS lang_guess
        |FROM h""".stripMargin,
    "q44_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |    ' +', ' ', 'g'))) AS fingerprint
        |FROM documents""".stripMargin,
    "q45_minhash" ->
      """WITH t AS (SELECT doc_id, lower(substr(text, 1, 256)) AS s FROM documents),
        |sh AS (SELECT doc_id,
        |    substr(s, CAST(i AS INTEGER), 8) AS g
        |  FROM (SELECT doc_id, s,
        |          unnest(generate_series(1, greatest(len(s) - 7, 1))) AS i
        |        FROM t))
        |SELECT doc_id,
        |  min(substr(md5('0' || g), 1, 8)) AS mh0,
        |  min(substr(md5('0' || g), 9, 8)) AS mh1,
        |  min(substr(md5('0' || g), 17, 8)) AS mh2,
        |  min(substr(md5('0' || g), 25, 8)) AS mh3
        |FROM sh GROUP BY doc_id""".stripMargin,
    "q46_minhash_dedup" ->
      """WITH doubled AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents),
        |t AS (SELECT doc_id, lower(substr(text, 1, 256)) AS s FROM doubled),
        |sh AS (SELECT doc_id, substr(s, CAST(i AS INTEGER), 8) AS g
        |  FROM (SELECT doc_id, s,
        |          unnest(generate_series(1, greatest(len(s) - 7, 1))) AS i
        |        FROM t)),
        |sigs AS (SELECT doc_id,
        |    min(substr(md5('0' || g), 1, 8)) AS mh0,
        |    min(substr(md5('0' || g), 9, 8)) AS mh1
        |  FROM sh GROUP BY doc_id)
        |SELECT mh0, mh1, count(*) AS n_members, min(doc_id) AS canonical_id
        |FROM sigs GROUP BY mh0, mh1 HAVING count(*) > 1""".stripMargin,
    "q47_simhash" ->
      """WITH pw AS (
        |  SELECT doc_id, md5(w) AS h
        |  FROM (SELECT doc_id,
        |          unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |        FROM documents)
        |  WHERE length(w) > 0),
        |v AS (SELECT doc_id,
        |  {VOTES}
        |FROM pw GROUP BY doc_id)
        |SELECT doc_id, {SIM} AS simhash16 FROM v"""
        .stripMargin
        .replace("{VOTES}", (1 to 16).map(j =>
          s"sum(CASE WHEN substr(h, $j, 1) IN ('8','9','a','b','c','d','e','f') " +
            s"THEN 1 ELSE -1 END) AS v$j").mkString(",\n  "))
        .replace("{SIM}", (1 to 16).map(j =>
          s"(CASE WHEN v$j > 0 THEN ${1L << (j - 1)} ELSE 0 END)").mkString(" + ")),
    "q48_jaccard_pairs" ->
      s"WITH $jaccardCtes\nSELECT id_a, id_b, jac FROM j WHERE jac >= 0.5",
    "q77_dup_clusters" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |pairs AS (SELECT id_a, id_b FROM j WHERE jac >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
         |lab AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id)
         |SELECT cluster_id, count(*) AS n_members, max(id) AS max_doc_id
         |FROM lab GROUP BY cluster_id""".stripMargin
  )

  /** Shared CTE chain of the q48 oracle (doubled corpus → shingles → 8
   * minhash streams → r=2 bands → candidates → exact Jaccard `j`). */
  private lazy val jaccardCtes: String =
    """doubled AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 100000, text FROM documents),
      |t AS (SELECT doc_id, lower(substr(text, 1, 256)) AS s,
      |    list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS ws
      |  FROM doubled),
      |sh AS (SELECT doc_id, substr(s, CAST(i AS INTEGER), 8) AS g
      |  FROM (SELECT doc_id, s,
      |          unnest(generate_series(1, greatest(len(s) - 7, 1))) AS i
      |        FROM t)),
      |sigs AS (SELECT doc_id,
      |    min(substr(md5('0' || g), 1, 8)) AS mh0,
      |    min(substr(md5('0' || g), 9, 8)) AS mh1,
      |    min(substr(md5('0' || g), 17, 8)) AS mh2,
      |    min(substr(md5('0' || g), 25, 8)) AS mh3,
      |    min(substr(md5('1' || g), 1, 8)) AS mh4,
      |    min(substr(md5('1' || g), 9, 8)) AS mh5,
      |    min(substr(md5('1' || g), 17, 8)) AS mh6,
      |    min(substr(md5('1' || g), 25, 8)) AS mh7
      |  FROM sh GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, 0 AS band, md5(mh0 || mh1) AS h FROM sigs
      |  UNION ALL SELECT doc_id, 1, md5(mh2 || mh3) FROM sigs
      |  UNION ALL SELECT doc_id, 2, md5(mh4 || mh5) FROM sigs
      |  UNION ALL SELECT doc_id, 3, md5(mh6 || mh7) FROM sigs),
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id),
      |j AS (SELECT c.id_a, c.id_b,
      |    round(len(list_intersect(ta.ws, tb.ws))*1.0 /
      |      (len(ta.ws) + len(tb.ws) - len(list_intersect(ta.ws, tb.ws))), 4)
      |      AS jac
      |  FROM cand c
      |  JOIN t ta ON ta.doc_id = c.id_a
      |  JOIN t tb ON tb.doc_id = c.id_b)""".stripMargin
}
