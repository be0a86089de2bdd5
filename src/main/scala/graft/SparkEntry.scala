package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every implemented operator
  * from SURVEY.md §2 (plus the Track-B LLM-pipeline extensions) has an
  * entry in `queries`; entries that are ANSI-SQL-expressible also have a
  * DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Events.queries ++
      graft.ops.TextAnalysis.queries ++
      graft.ops.Dedup.queries ++
      graft.ops.Similarity.queries ++
      graft.ops.Multimodal.queries ++
      graft.queries.Ingest.queries ++
      graft.queries.Extras.queries ++
      graft.queries.Pipeline.queries ++
      graft.ops.Bucketing.queries ++
      graft.ops.Skew.queries ++
      graft.ops.Graph.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Events.oracle ++
      graft.ops.TextAnalysis.oracle ++
      graft.ops.Dedup.oracle ++
      graft.ops.Similarity.oracle ++
      graft.ops.Multimodal.oracle ++
      graft.queries.Ingest.oracle ++
      graft.queries.Extras.oracle ++
      graft.queries.Pipeline.oracle ++
      graft.ops.Bucketing.oracle ++
      graft.ops.Skew.oracle ++
      graft.ops.Graph.oracle
}
