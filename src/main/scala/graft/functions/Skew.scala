package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted joins.
  *
  * AQE's skew-join splitting (enabled in our sessions) handles most skew
  * at runtime; explicit salting remains the tool for EXTREME hot keys
  * (one key ≫ one executor's memory) or for deterministic layout control.
  *
  * Shape: the big side gets a deterministic salt in [0, saltFactor) —
  * derived by hashing the full row, so replicas of one hot key spread
  * over saltFactor reducers; the small side is replicated saltFactor
  * times. Join key becomes (key, salt). Result set identical to the
  * unsalted join; the hot key's work fans out saltFactor-wide.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor.toLong)).cast("int"))
    val smallSalted = small.withColumn("_salt",
      explode(typedlit((0 until saltFactor).toArray)))
    bigSalted.join(smallSalted, keys :+ "_salt").drop("_salt")
  }
}
