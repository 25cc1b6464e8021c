package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * `queries` is the operator-coverage surface: one entry per implemented
 * operator family from SURVEY.md §2 plus the training-data-pipeline ops.
 * Every SQL-expressible query carries a DuckDB oracle in `oracleSql` with
 * IDENTICAL output column names; audio/maintenance queries over the
 * synthesized clip table are rows-only (no DuckDB view of that table).
 */
object SparkEntry {

  /** Flagship: full maintenance pass (append -> compact -> Z-order cluster ->
   * scan-equality verify) on a small synthetic clip table; every returned row
   * is a per-clip verification verdict. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q63_maintenance_e2e")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Text.queries ++
      graft.queries.Vector.queries ++
      graft.queries.Audio.queries ++
      graft.queries.Extra.queries

  /** Static oracles plus the run-time registry: fixture-backed queries
   * (decoded-PCM audio, maintenance stores) register their oracle SQL WHILE
   * running, embedding the absolute fixture paths only known then — so this
   * must be read AFTER the queries have executed (graft.Verify does). */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Text.oracles ++
      graft.queries.Vector.oracles ++
      graft.queries.Audio.oracles ++
      graft.queries.Extra.oracles ++
      graft.queries.OracleFixtures.oracles
}
