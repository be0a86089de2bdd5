package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join helpers.
  *
  * A shuffle hash/sort-merge join sends every row of a key to one
  * reducer; a hot key (one user with 1% of a 100 TB event log) turns
  * that reducer into the job's critical path. AQE's skew-join split
  * handles this at runtime for sort-merge joins; `saltedJoin` is the
  * explicit, planner-independent form: the large side gets a
  * deterministic salt in [0, salts), the small side is replicated
  * salts× with every salt value, and the join key becomes
  * (key, salt) — a hot key now spreads over `salts` reducers.
  *
  * Semantically identical to the unsalted inner join (each left row
  * matches exactly the replica carrying its salt), which is what the
  * sk01 oracle checks. The salt is derived from a high-cardinality
  * column via xxhash64 rather than rand() so results are deterministic
  * and retries/speculative tasks can't observe different salts.
  *
  * Cost model: replicating the small side salts× is the price; use it
  * when small×salts ≪ shuffle of the large side — the same regime
  * where a broadcast would be almost-but-not-quite possible.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Inner equi-join of `large` to `small` on `cond`, salted `salts`
    * ways. `saltBy` must be a high-cardinality column of `large`
    * (e.g. a row id) — it only seeds the salt, it does not affect
    * which rows match. */
  def saltedJoin(large: DataFrame, small: DataFrame, cond: Column,
      saltBy: Column, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val l = large.withColumn(SaltCol, pmod(xxhash64(saltBy), lit(salts)).cast("int"))
    // shuffle_hash hint: salting only exists for the regime where the
    // build side is too big to broadcast — without the hint Catalyst
    // broadcasts the replicated side at test scale and the salt never
    // reaches a shuffle, which is not the plan being modeled
    val r = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
      .hint("shuffle_hash")
    l.join(r, cond && l(SaltCol) === r(SaltCol))
      .drop(SaltCol)
  }
}
