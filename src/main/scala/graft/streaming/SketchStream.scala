package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming count-min sketch — the streaming twin of batch ev16's
  * CmsAggregate: maintain the d×w cell array incrementally as event
  * files land, so heavy-hitter estimates are available mid-stream
  * without ever re-scanning history.
  *
  * State design for 100 TB: the ONLY state is the sketch itself — d
  * keyed groups (one per hash row), each holding its w-cell Long array.
  * Total state = d·w·8 bytes (32 KB at 4×1024) regardless of how many
  * events ever flowed; per-trigger cost is one bucket update per
  * (event, seed). That is the CMS's defining mergeability property in
  * streaming form: state(batch₁ ∪ … ∪ batchₙ) accumulates cell-wise,
  * so after any prefix of triggers the cells equal the batch aggregate
  * over exactly the events seen so far — SketchStreamSpec pins that
  * parity cell-for-cell against functions.CmsAggregate, which the
  * DuckDB oracle already replays (ev16).
  *
  * Keying by seed shards the state d ways (each hash row updates
  * independently); the ×d row fan-out is bounded by depth, not data.
  * Each trigger emits the full nonzero cell set for every seed that saw
  * data — cells only grow, so a consumer (or the parity spec) takes the
  * latest (max) emission per cell.
  */
object SketchStream {

  final case class Cell(seed: Int, b: Long, n: Long)

  /** Incremental CMS cells over a stream of events (needs `user_id`). */
  def cmsCells(spark: SparkSession, events: DataFrame,
      depth: Int = 4, width: Int = 1024): Dataset[Cell] = {
    import spark.implicits._
    val exploded = events
      .select(explode(sequence(lit(1), lit(depth))).as("seed"),
        col("user_id").cast("long").as("id"))
      .as[(Int, Long)]
    exploded.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], Cell](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (seed, rows, state) =>
          val cells = state.getOption.getOrElse(new Array[Long](width))
          rows.foreach { case (_, id) =>
            cells(graft.functions.CmsAggregate.bucket(seed, id, width)) += 1L
          }
          state.update(cells)
          cells.iterator.zipWithIndex
            .collect { case (n, b) if n > 0 => Cell(seed, b.toLong, n) }
            .toSeq.iterator
      }
  }

  final case class Bin(b: Int, n: Long)

  /** Incremental histogram bins over a stream of longs (column `x`) —
    * the streaming twin of q19d's HistAggregate, same floor-division
    * bin derivation (Hist.bin), additive cell state. Rank/percentile
    * estimates are available after any trigger prefix; state is nBins
    * longs total regardless of rows seen. Like the CMS (additive, NOT
    * idempotent) and unlike the HLL, replayed files double counts —
    * the delivery-semantics contrast the three-sketch family
    * documents: exactly-once sources for counting sketches,
    * at-least-once suffices for max-merge ones. Single state key like
    * the HLL: one bin array per trigger update. */
  def histBins(spark: SparkSession, xs: DataFrame,
      lo: Long = 0L, binWidth: Long = 16384L, nBins: Int = 1024): Dataset[Bin] = {
    import spark.implicits._
    // null (or uncastable) x rows are SKIPPED, matching the batch
    // HistAggregate's null check — without the filter, .as[Long] on a
    // null primitive throws inside the trigger and kills the query
    xs.select(col("x").cast("long").as("x"))
      .filter(col("x").isNotNull).as[Long]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Array[Long], Bin](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          val bins = state.getOption.getOrElse(new Array[Long](nBins))
          rows.foreach { x =>
            bins(graft.functions.Hist.bin(x, lo, binWidth, nBins)) += 1L
          }
          state.update(bins)
          bins.iterator.zipWithIndex
            .collect { case (n, b) if n > 0 => Bin(b, n) }
            .toSeq.iterator
      }
  }

  final case class SCell(i: Int, j: Int, s: Long, seq: Long)

  /** Incremental scatter matrix over a stream of int vectors (column
    * `c`, array<int> of fixed `dim`) — the streaming twin of emb05's
    * ScatterAggregate: PCA/covariance sufficient statistics maintained
    * as embedding batches land, so a principal-axis refresh reads the
    * standing triangle instead of re-scanning every vector ever seen.
    * State = the d(d+1)/2 Long triangle (~16 KB at d=64) plus a
    * trigger counter, regardless of rows; the fold is the SAME kernel
    * as the batch aggregate (Scatter.accumulate), so the cells cannot
    * drift from emb05's. Additive like the CMS/Hist (NOT idempotent):
    * exactly-once source semantics required — the three-sketch
    * delivery-contrast note applies.
    *
    * Unlike CMS counts, scatter cells are NOT monotone (products can
    * be negative), so "latest emission wins" cannot be expressed as a
    * max over cell values; every emission therefore carries the
    * trigger sequence number and the FULL triangle (d(d+1)/2 rows —
    * constant-sized, like the state), and a consumer keeps the
    * max-seq row per cell. */
  def scatterCells(spark: SparkSession, vecs: DataFrame,
      dim: Int): Dataset[SCell] = {
    import spark.implicits._
    val tri = dim * (dim + 1) / 2
    vecs.select(col("c")).filter(col("c").isNotNull)
      .as[Seq[Int]]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Array[Long], SCell](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          // slot `tri` holds the trigger counter
          val buf = state.getOption.getOrElse(new Array[Long](tri + 1))
          rows.foreach { c =>
            require(c.length == dim,
              s"scatter stream: expected $dim components, got ${c.length}")
            graft.functions.Scatter.accumulate(buf, c(_), dim)
          }
          buf(tri) += 1L
          state.update(buf)
          val out = Seq.newBuilder[SCell]
          var i = 0
          while (i < dim) {
            val base = graft.functions.Scatter.rowBase(i, dim)
            var j = i
            while (j < dim) {
              out += SCell(i, j, buf(base + j), buf(tri))
              j += 1
            }
            i += 1
          }
          out.result().iterator
      }
  }

  final case class Register(bucket: Int, m: Int)

  final case class KeyedRegister(k: String, bucket: Int, m: Int)

  /** Per-key HLL registers over a stream of (k, key) rows — the
    * streaming feed for q08e's window algebra: each group (e.g. a
    * month) maintains its own m-byte register state, and any
    * overlapping window over groups is answered downstream by
    * register-wise max of the member groups' emissions, never by
    * re-scanning history. State = m bytes per DISTINCT GROUP (time
    * groups are calendar-bounded, not data-bounded), max-merge
    * idempotent per group — the same at-least-once-safe contract as
    * the single-key form. */
  def hllRegistersByKey(spark: SparkSession, rows: DataFrame,
      p: Int = 8): Dataset[KeyedRegister] = {
    import spark.implicits._
    val m = 1 << p
    rows.select(col("k").cast("string"), col("key").cast("string"))
      .filter(col("k").isNotNull && col("key").isNotNull)
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], KeyedRegister](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (k, it, state) =>
          val regs = state.getOption.getOrElse(new Array[Byte](m))
          it.foreach { case (_, key) =>
            val (b, rho) = graft.functions.Hll.bucketRho(key, m)
            if (rho > regs(b)) regs(b) = rho.toByte
          }
          state.update(regs)
          regs.iterator.zipWithIndex
            .collect { case (r, b) if r > 0 => KeyedRegister(k, b, r.toInt) }
            .toSeq.iterator
      }
  }

  /** Incremental HLL registers over a stream of string keys (column
    * `key`) — the streaming twin of q08c's HllAggregate, same
    * md5-derived bucket/rho, register-wise MAX state. Distinct-count
    * estimates are available after any trigger prefix; state is m
    * bytes total, and because max-merge is idempotent AND commutative,
    * replayed or reordered files cannot drift the registers (the spec
    * pins replay-invariance — the property that makes the sketch safe
    * under at-least-once delivery). Single state key: the whole
    * register array is one m-byte blob, updated once per trigger —
    * sharding it d-ways like the CMS would buy nothing at m = 256. */
  def hllRegisters(spark: SparkSession, keys: DataFrame,
      p: Int = 8): Dataset[Register] = {
    import spark.implicits._
    val m = 1 << p
    keys.select(col("key").cast("string")).as[String]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Array[Byte], Register](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          val regs = state.getOption.getOrElse(new Array[Byte](m))
          rows.foreach { k =>
            val (b, rho) = graft.functions.Hll.bucketRho(k, m)
            if (rho > regs(b)) regs(b) = rho.toByte
          }
          state.update(regs)
          regs.iterator.zipWithIndex
            .collect { case (r, b) if r > 0 => Register(b, r.toInt) }
            .toSeq.iterator
      }
  }
}
