package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** The one Lloyd iteration skeleton shared by the float trainer
  * (KMeans, ss03's IVF coarse quantizer) and the integer-exact
  * clustering query (Similarity emb03) — same scaffolding, different
  * numeric kernel, so the two implementations cannot drift apart
  * structurally (they previously duplicated the assign/mean shape
  * inline with different numerics).
  *
  * Scale shape per round, identical for every kernel:
  *   - assignment is MAP-ONLY: the centroids are in-plan literals
  *     (k×dim, tiny by construction) and `assignId` computes the argmin
  *     per row — no crossJoin, no exploded k× rows, no shuffle;
  *   - the mean step is one posexplode + partial-aggregated
  *     groupBy(cluster, dim) whose output is k×dim CELLS — the only
  *     shuffle, and the only collect (bounded by k×dim, never by data).
  *
  * Centroids carry explicit ids (cid, vector) because the two callers
  * disagree on empty clusters: the float trainer KEEPS an empty
  * cluster's previous centroid (`fillEmpty = true` — k is a contract
  * with the IVF index), while the integer query DROPS it
  * (`fillEmpty = false` — its oracle replays exactly that).
  */
object Lloyd {

  /** One assign→mean round, `rounds` times.
    *
    * @param assignId (vecCol, centroids) => Int cluster-id column; must
    *                 be a pure map-side expression over in-plan literals
    * @param meanExpr aggregate expression over the exploded value column
    *                 `v` producing the per-(cluster, dim) mean cell `m`
    * @param decode   reads the mean cell from the (c_id, dim, m) row
    */
  def iterate[T](df: DataFrame, vecCol: String,
      init: Seq[(Int, Seq[T])], rounds: Int,
      assignId: (Column, Seq[(Int, Seq[T])]) => Column,
      meanExpr: Column, decode: Row => T,
      fillEmpty: Boolean): Seq[(Int, Seq[T])] = {
    var cs = init
    for (_ <- 1 to rounds) {
      val cells = df
        .select(assignId(col(vecCol), cs).as("c_id"), col(vecCol))
        .select(col("c_id"), posexplode(col(vecCol)))
        .toDF("c_id", "dim", "v")
        .groupBy(col("c_id"), col("dim"))
        .agg(meanExpr.as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.toSeq.sortBy(_.getInt(1)).map(decode)
        }
      cs =
        if (fillEmpty) cs.map { case (i, old) => i -> cells.getOrElse(i, old) }
        else cells.toSeq.sortBy(_._1)
    }
    cs
  }
}
