package graft.functions

/**
 * Shared SQL expression fragments for embedding math, kept engine-parity-safe:
 * dot products cast each float to double BEFORE multiplying and fold strictly
 * left-to-right, so the DuckDB oracle reproduces the exact IEEE sequence
 * (float-parity recipe). The LSH hyperplanes are pseudo-random +-1 signs from
 * pure integer arithmetic, so both engines derive bit-identical planes with
 * no shipped state.
 */
object VecExprs {

  /** dot(a, b) over two array columns — the ONE parity-safe recipe
   * (cast-before-multiply, strict left fold); every dot in the engine
   * derives from this so a parity fix reaches all of them. */
  def dot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  /** ||c|| over an array column, same recipe. */
  def norm(c: String): String =
    s"sqrt(aggregate(transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"

  /** dot(embedding, q) — the fixed-name fragments most queries use. */
  val dotExpr: String = dot("embedding", "q")

  /** ||embedding|| */
  val normExpr: String = norm("embedding")

  /** ||q|| */
  val qnormExpr: String = norm("q")

  /** Random-hyperplane sign bits -> 2^nPlanes buckets (default index width;
   * callers needing finer buckets pass their own plane count — more planes =
   * smaller buckets = fewer candidate pairs, lower recall for non-identical
   * near-dups). */
  val nPlanes = 6

  private def sigTermSpark(p: Int): String =
    s"CASE WHEN aggregate(transform(embedding, (x, i) -> " +
      s"CASE WHEN pmod($p*1000003 + i*7919, 97) < 48 THEN CAST(x AS DOUBLE) " +
      s"ELSE -CAST(x AS DOUBLE) END), CAST(0.0 AS DOUBLE), " +
      s"(acc, v) -> acc + v) > 0.0 THEN ${1 << p} ELSE 0 END"

  /** LSH bucket id over column `embedding` (Spark SQL dialect). */
  val bucketSpark: String =
    (0 until nPlanes).map(sigTermSpark).mkString(" + ")

  def bucketSparkN(n: Int): String =
    (0 until n).map(sigTermSpark).mkString(" + ")

  /** Dedup wants expected bucket occupancy ~constant as the corpus grows:
   * with a FIXED plane count the within-bucket candidate join is quadratic
   * in bucket size, so a 10x corpus costs ~100x pairs (measured in the r5
   * superlinearity audit: q49 17.5x wall on 10x rows at 10 planes). One
   * extra plane per row-doubling past the 4k anchor keeps occupancy ~4.
   * Integer CASE ladder, NOT log2: both engines evaluate the same integer
   * comparisons, so there is no FP boundary where ceil(log2(x)) could
   * round differently. Capped at 16 planes = 65536 buckets (the ladder's
   * 6 steps). Recall note: exact dups collide in ALL buckets at any plane
   * count; only non-identical near-dup recall decays with planes, and the
   * oracle derives the SAME buckets, so parity holds by construction. */
  private val dedupPlaneSteps: Seq[Long] =
    Seq(4000L, 8000L, 16000L, 32000L, 64000L, 128000L)

  def dedupPlanes(rows: Long): Int = 10 + dedupPlaneSteps.count(rows > _)

  /** The same ladder in SQL over a scalar row-count expression `cntExpr`. */
  def dedupPlanesSql(cntExpr: String): String =
    "10 + " + dedupPlaneSteps
      .map(t => s"(CASE WHEN $cntExpr > $t THEN 1 ELSE 0 END)")
      .mkString(" + ")

  /** DuckDB bucket id with a RUNTIME plane count `planesExpr` (≤ maxPlanes):
   * plane p contributes its sign bit only when p < planesExpr, so the same
   * static SQL adapts to the corpus size the ladder derives. */
  def bucketDuckDyn(maxPlanes: Int, planesExpr: String): String =
    (0 until maxPlanes)
      .map(p => s"(CASE WHEN $p < $planesExpr THEN ${sigTermDuck(p)} ELSE 0 END)")
      .mkString(" + ")

  /** The ANN-index analog of [[dedupPlanes]]: the persisted bucket index
   * probes ONE bucket per query, so a fixed 2^6-bucket layout makes the
   * candidate list grow linearly with the corpus. Same integer-ladder
   * discipline (+1 plane per row-doubling past the 4k anchor, 6-plane base
   * preserved at every current test scale, cap 16 = 65536 buckets). Pinned
   * at index BUILD time and persisted beside the eras ([[graft.ops.VecIndex]]
   * planes.csv): incremental era appends must keep the parent's plane count
   * or eras would disagree on bucket ids — params are part of the index
   * artifact, re-tuned only by a full rebuild (standard ANN practice). */
  private val annPlaneSteps: Seq[Long] =
    Seq(4000L, 8000L, 16000L, 32000L, 64000L, 128000L,
      256000L, 512000L, 1024000L, 2048000L)

  def annPlanes(rows: Long): Int = nPlanes + annPlaneSteps.count(rows > _)

  /** The same ladder in SQL over a scalar row-count expression. */
  def annPlanesSql(cntExpr: String): String =
    s"$nPlanes + " + annPlaneSteps
      .map(t => s"(CASE WHEN $cntExpr > $t THEN 1 ELSE 0 END)")
      .mkString(" + ")

  private def sigTermDuck(p: Int): String =
    s"CASE WHEN list_aggregate(list_transform(generate_series(1, len(embedding)), " +
      s"i -> CASE WHEN (($p*1000003 + (i-1)*7919) % 97) < 48 " +
      s"THEN CAST(embedding[i] AS DOUBLE) ELSE -CAST(embedding[i] AS DOUBLE) END), " +
      s"'sum') > 0.0 THEN ${1 << p} ELSE 0 END"

  /** Same bucket id in DuckDB dialect (for the oracle). */
  val bucketDuck: String =
    (0 until nPlanes).map(sigTermDuck).mkString(" + ")

  def bucketDuckN(n: Int): String =
    (0 until n).map(sigTermDuck).mkString(" + ")
}
