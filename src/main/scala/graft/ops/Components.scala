package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components by min-label propagation, for near-duplicate
 * clustering: LSH + exact-confirm emits PAIRS, but a dedup pipeline keeps
 * one canonical document per transitive CLUSTER (A~B, B~C ⇒ {A,B,C}).
 *
 * Each iteration is one shuffle (neighbor-min groupBy); the loop runs to the
 * component diameter, with `localCheckpoint` truncating lineage so plans
 * don't nest per iteration. Near-dup graphs are short-diameter (dup groups
 * are near-cliques), so convergence is a handful of passes. For DEEP graphs
 * (diameter >> log n) [[starContract]] implements the two-phase
 * star-contraction algorithm (Kiveris et al., "Connected Components in
 * MapReduce and Beyond", alternating large-star/small-star), which converges
 * in O(log n) rounds regardless of diameter; [[minLabel]] falls back to it
 * automatically when it fails to converge within its round budget.
 */
object Components {

  /** Edge-count bound under which [[minLabel]] solves components on the
   * DRIVER with union-find instead of iterating Spark jobs — the same
   * small-side escape hatch as a broadcast join. A near-dup edge set is
   * usually tiny relative to its corpus (dup groups are rare and small), so
   * a 100 TB dedup often lands here, and union-find is O(E α(E)) vs
   * diameter× (join+groupBy+checkpoint+count) jobs whose per-iteration
   * fixed cost dominates at small sizes (measured: the loop costs
   * ~1 s/iteration on a 2k-edge graph). */
  var localSolveMaxEdges: Long = 2000000L

  /** BYTE bound on the same escape hatch: edge ids can be arbitrarily wide
   * strings (urls, content hashes), so an edge-count bound alone could
   * collect gigabytes of driver objects on a SHARED driver. The estimate
   * charges each edge its string payload (×2: JVM chars) plus ~96 B of
   * boxed-key + HashMap-entry overhead; either bound failing routes to the
   * distributed loop. 64 MB default ≈ a comfortable slice of a 1-4 GB
   * driver heap. */
  var localSolveMaxBytes: Long = 64L * 1024 * 1024

  /** Label every node of the undirected edge list with the minimum node id
   * of its component. Returns (id, cluster_id); only nodes that appear in
   * an edge are labeled. */
  def minLabel(edges: DataFrame, a: String = "id_a", b: String = "id_b",
               maxIter: Int = 20): DataFrame = {
    // materialize the (possibly expensive) edge pipeline ONCE before the
    // symmetric union — both union branches read the checkpointed rows
    // instead of re-running the upstream plan per branch
    val e0 = edges.select(col(a).as("src"), col(b).as("dst")).localCheckpoint()
    val nEdges = e0.count()
    if (nEdges <= localSolveMaxEdges && nEdges > 0) {
      // one cheap aggregate over the checkpointed rows (no rescan of the
      // upstream pipeline) sizes the would-be driver copy before collecting
      // octet_length of the UTF-8 bytes, charged ×2: every UTF-8 byte maps
      // to AT MOST one JVM char (ASCII 1:1, multi-byte sequences to fewer),
      // so bytes×2 ≥ chars×2 — a conservative bound where length() would
      // under-charge supplementary characters (ADVICE r4)
      val payload = e0.select(
        sum(coalesce(octet_length(col("src").cast("string")), lit(0)) +
            coalesce(octet_length(col("dst").cast("string")), lit(0)))
          .cast("long").as("bytes")).first().getLong(0)
      val estBytes = payload * 2 + nEdges * 96L
      if (estBytes <= localSolveMaxBytes) return localSolve(e0)
      System.err.println(s"[components] $nEdges edges ≈ $estBytes B " +
        s"> localSolveMaxBytes=$localSolveMaxBytes; using distributed loop")
    }
    if (nEdges == 0) return localSolve(e0)
    val sym = e0
      .unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint()
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      // one neighbor-min hop per checkpoint round. Measured dead ends at
      // this scale: pointer-jumping (lbl<-lbl(lbl)) re-evaluates the
      // un-materialized groupBy per self-join side (1.8x slower), and
      // unrolling two hops per round halves the rounds but doubles each
      // round's plan (net wash). The simple loop wins until components get
      // deep enough for star-contraction (see scaladoc).
      val nbrMin = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val merged = labels.unionAll(nbrMin)
        .groupBy("id").agg(min("lbl").as("nl"))
      // ONE checkpoint per iteration: `labels` re-reads the same
      // materialized rows (a select over a checkpointed plan is
      // lineage-free); a second checkpoint would re-materialize.
      val t0 = System.nanoTime()
      val joined = labels.withColumnRenamed("lbl", "ol").join(merged, "id")
        .localCheckpoint()
      changed = joined.filter(col("nl") < col("ol")).count()
      labels = joined.select(col("id"), col("nl").as("lbl"))
      System.err.println(f"[components] iter=$iter changed=$changed " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      iter += 1
    }
    sym.unpersist()
    if (changed > 0) {
      // round budget exhausted before convergence: the graph is deeper than
      // a near-dup clique forest. Returning half-propagated labels would be
      // WRONG (two nodes of one component could keep different labels), so
      // switch to the diameter-independent algorithm instead.
      System.err.println(s"[components] min-label not converged after " +
        s"$maxIter rounds; falling back to star contraction")
      return starContract(edges, a, b)
    }
    labels.withColumnRenamed("lbl", "cluster_id")
  }

  /** Driver-side union-find with path compression over a collected edge
   * list; cluster label = component minimum under the column's own ordering
   * (ids may be numeric or string — both are Comparable). Same contract as
   * the distributed loop; only reached below [[localSolveMaxEdges]]. */
  private def localSolve(e0: DataFrame): DataFrame = {
    val spark = e0.sparkSession
    val idType = e0.schema("src").dataType
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    e0.collect().foreach { row =>
      val (s, d) = (row.get(0), row.get(1))
      if (s != null && d != null) {
        if (!parent.containsKey(s)) parent.put(s, s)
        if (!parent.containsKey(d)) parent.put(d, d)
        val (rs, rd) = (find(s), find(d))
        if (rs != rd) parent.put(rs, rd)
      }
    }
    val minOf = new java.util.HashMap[Any, Any]()
    parent.keySet().forEach { id =>
      val r = find(id)
      val cur = minOf.get(r)
      if (cur == null ||
        id.asInstanceOf[Comparable[Any]].compareTo(cur) < 0) minOf.put(r, id)
    }
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    parent.keySet().forEach { id =>
      rows.add(org.apache.spark.sql.Row(id, minOf.get(find(id))))
    }
    System.err.println(s"[components] local union-find: ${rows.size} nodes")
    spark.createDataFrame(rows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("cluster_id", idType))))
  }

  /**
   * Connected components by alternating large-star / small-star contraction
   * (Kiveris et al. 2014): each round hangs every node off the minimum of a
   * local neighborhood, halving tree heights, so convergence is O(log n)
   * ROUNDS REGARDLESS OF DIAMETER — a 10k-node path labels in ~a dozen
   * rounds where min-label propagation needs 10k. Per round: two groupBy
   * shuffles over the (shrinking) edge set. Same contract as [[minLabel]]:
   * returns (id, cluster_id) with cluster_id = component minimum, for every
   * node appearing in an edge.
   */
  def starContract(edges: DataFrame, a: String = "id_a", b: String = "id_b",
                   maxIter: Int = 50): DataFrame =
    starContractWithRounds(edges, a, b, maxIter)._1

  /** [[starContract]] exposing the round count (spec evidence for the
   * O(log n) convergence bound). */
  def starContractWithRounds(edges: DataFrame, a: String = "id_a",
                             b: String = "id_b",
                             maxIter: Int = 50): (DataFrame, Int) = {
    // ids keep their OWN type: greatest/least/min/compare all work on any
    // orderable column, and a cast("long") would turn string ids (clip_id)
    // into NULLs — every edge silently dropped, every node self-labeled
    val nodes = edges.select(col(a).as("id"))
      .unionAll(edges.select(col(b).as("id")))
      .distinct().localCheckpoint()
    // canonical direction u > v; self-loops carry no connectivity
    var e = edges.select(col(a).as("x"), col(b).as("y"))
      .filter(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("u"), least(col("x"), col("y")).as("v"))
      .distinct().localCheckpoint()

    // large-star: every neighbor v > u links to min(Γ(u) ∪ {u});
    // small-star: every smaller neighbor (and u itself) links to the min of
    // u's smaller neighborhood. Both preserve connectivity and monotonically
    // lower each node's attachment point.
    def largeStar(ed: DataFrame): DataFrame = {
      val sym = ed.unionAll(ed.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).distinct()
    }
    def smallStar(ed: DataFrame): DataFrame = {
      val mins = ed.groupBy("u").agg(min("v").as("m"))
      ed.unionAll(ed.select(col("u"), col("u").as("v")))
        .join(mins, "u").filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v")).distinct()
    }
    def signature(ed: DataFrame): (Long, Long) = {
      // bit_xor is order-independent and cannot overflow (sum of hashes
      // trips ANSI long-overflow checks)
      val r = ed.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var iter = 0
    var sig = signature(e)
    var converged = e.isEmpty
    while (!converged && iter < maxIter) {
      val t0 = System.nanoTime()
      e = smallStar(largeStar(e)).localCheckpoint()
      val s2 = signature(e)
      converged = s2 == sig
      sig = s2
      iter += 1
      System.err.println(f"[components] star round=$iter edges=${s2._1} " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    require(converged, s"star contraction did not converge in $maxIter rounds")
    // fixed point is a star forest: every non-root points at its component
    // min; roots (and isolated self-loop nodes) label themselves
    val labeled = e.select(col("u").as("id"), col("v").as("cluster_id"))
    val roots = nodes.join(labeled, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster_id"))
    (labeled.unionAll(roots), iter)
  }
}
