package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership as an O(bits) broadcastable predicate.
  *
  * The scale problem it solves: a semi-join against a large key set
  * either broadcasts the full key STRINGS (executor memory ∝ set size —
  * the tx09-class OOM pattern) or shuffles the entire probe side. A
  * bloom filter ships a fixed `-log(fpp)·n/ln2²` BITS instead and is
  * applied map-side, before any shuffle, so the probe side shrinks to
  * `|true matches| + fpp·|probe|` rows. Exactness is restored by the
  * caller with a plain equi-join on the survivors (the false positives
  * fall out there) — the same two-step Spark itself uses for runtime
  * row-level join pruning.
  *
  * Both halves speak the same sketch: the builder inserts
  * `putLong(xxhash64(v))` (`DataFrameStatFunctions.bloomFilter` over a
  * LongType column) and the probe is Spark's codegen'd
  * `BloomFilterMightContain`, which calls `mightContainLong` on the
  * deserialized filter — deserialized once per task, not per row.
  */
object Bloom {

  /** Build a bloom filter over `xxhash64(c)` of `df`'s rows. Runs as a
    * distributed tree-aggregate; the driver holds ONE filter of
    * `numBits(expectedItems, fpp)` bits (~1.2 MB at 1M items / 1% fpp),
    * bounded by the parameters, never by the data. */
  def build(df: DataFrame, c: Column, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    val h = df.select(xxhash64(c).as("_h"))
    // zero-row input: DataFrameStatFunctions.bloomFilter yields a
    // filter whose probe NPEs at execution — build the well-defined
    // empty filter instead (every might_contain = false), so an empty
    // benchmark/standing corpus degrades to "nothing matches" rather
    // than killing the query
    val bf =
      if (h.isEmpty) org.apache.spark.util.sketch.BloomFilter
        .create(expectedItems, fpp)
      else h.stat.bloomFilter("_h", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain(bloom, xxhash64(c))` — evaluates in whole-stage
    * codegen, embedding the serialized filter as a binary literal. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    GraftBridge.toColumn(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftBridge.toExpression(xxhash64(c))))
}
