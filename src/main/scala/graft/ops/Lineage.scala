package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative-state tables (BFS frontiers, BPE
  * symbol tables): the logical plan of round i references round i−1, so
  * without truncation the tree doubles per round and the driver drowns
  * in re-analysis (measured in Graph.bfsHops: 3755 InMemoryTableScan
  * nodes, 9.2 s, mostly driver time). Persist alone does not help —
  * Catalyst still walks the full tree even when the DATA is cached. */
object Lineage {

  /** Truncate `df`'s plan to a scan of materialized partitions: a
    * RELIABLE checkpoint when the session has a checkpoint directory
    * configured (`SparkContext.setCheckpointDir` — survives executor
    * loss, the cluster deployment), else an eager local checkpoint
    * (the local[*] form; local checkpoints die with their executors,
    * which a single-JVM test session cannot lose). */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
}
