package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming incremental dedup — the streaming twin of dd02/dd07: as
  * document batches land in a drop directory, emit only docs whose
  * normalized content fingerprint has not been seen before ("dedup the
  * crawl as it lands").
  *
  * State design for 100 TB: the keyed state holds ONE small record per
  * DISTINCT fingerprint (the 32-hex-char key plus the keeper's id) — no
  * document text ever enters state, and duplicates add nothing. That is
  * the bounded-state analog of dd07's batch anti-join against the
  * standing fingerprint table; a production deployment would back the
  * same shape with state TTL (GroupStateTimeout) or an external
  * fingerprint store once the distinct-corpus cardinality outgrows the
  * state backend, and run dd07 as the batch backfill.
  *
  * Semantics per trigger: within a trigger the smallest doc_id for a
  * fingerprint wins (matching batch keep-first determinism); across
  * triggers the FIRST trigger containing the fingerprint wins. With
  * sources whose files are ordered by doc_id (the monotone-source
  * assumption every streaming twin here documents), this equals batch
  * keep-first exactly — DedupStreamSpec pins that parity, including a
  * late-file replay where every duplicate must be dropped.
  */
object DedupStream {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  final case class Kept(doc_id: Long, fp: String)

  /** Streaming read of a documents parquet drop-directory. */
  def readDocs(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .select(col("doc_id"), col("text"))

  private val fpCol =
    md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")))

  /** Keep-first exact dedup over the stream: one state entry per
    * distinct normalized fingerprint (same normalization as dd07). */
  def dedupKeepFirst(spark: SparkSession, docs: DataFrame): Dataset[Kept] = {
    import spark.implicits._
    stateKeepFirst(spark, docs.select(col("doc_id"), fpCol.as("fp")))
  }

  /** The streaming twin of dd11: dedup the incoming crawl against a
    * STANDING fingerprint corpus (bloom-routed) AND against itself
    * (keyed state keep-first).
    *
    * Routing per micro-batch, before any state lookup: a bloom filter
    * over the standing fingerprints has no false negatives, so a doc
    * the filter rejects is DEFINITELY not in the standing corpus and
    * skips the confirm join entirely — map-side, O(bits) executor
    * memory (dd11's argument, Dedup.scala). Only the "maybe seen"
    * sliver (true dupes + fpp of the new) enters the stream-static
    * anti-join against the standing table. Survivors of either branch
    * still go through the keyed state, which handles IN-STREAM
    * duplicates (two new docs with the same fingerprint in the same or
    * different triggers) — the bloom bounds the static check, the
    * state stays one record per distinct NEW fingerprint, and at
    * steady state (crawl mostly new) the hot path is a scan, not a
    * join. Exactness: the bloom is routing, not semantics — dd11's
    * oracle story; DedupStreamSpec pins stream==batch parity. */
  def dedupWithStanding(spark: SparkSession, docs: DataFrame,
      standing: DataFrame, expectedItems: Option[Long] = None,
      fpp: Double = 0.01): Dataset[Kept] = {
    val standingFps = standing.select(fpCol.as("fp")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // Size the bloom from the ACTUAL standing cardinality by default —
    // one count() on the just-persisted table (the build scan below
    // reuses it, so the extra action is a cache read). A fixed default
    // silently saturates on a larger corpus: at 10^9 fps a 10^6-sized
    // bloom has fpp ≈ 1, every doc routes "maybe seen", and the filter
    // degrades to the plain anti-join with no error telling anyone.
    val items = bloomItems(standingFps.count(), expectedItems)
    val bloom = graft.functions.Bloom.build(standingFps, col("fp"),
      items, fpp)
    val batch = docs.select(col("doc_id"), fpCol.as("fp"))
    val definitelyNew =
      batch.filter(!graft.functions.Bloom.mightContain(bloom, col("fp")))
    val maybeSeen =
      batch.filter(graft.functions.Bloom.mightContain(bloom, col("fp")))
        .join(standingFps, Seq("fp"), "left_anti") // stream-static
    stateKeepFirst(spark, definitelyNew.unionByName(maybeSeen))
  }

  /** The bloom's item capacity: the caller's estimate when it covers
    * the actual standing cardinality (LOUD require otherwise — an
    * undersized bloom is a silent performance bug, not a correctness
    * one, which is exactly why it must fail fast), else the actual
    * count. */
  private[streaming] def bloomItems(actual: Long,
      estimate: Option[Long]): Long = estimate match {
    case Some(e) =>
      require(e >= actual,
        s"dedupWithStanding: expectedItems=$e is below the standing " +
          s"corpus's actual $actual distinct fingerprints — the bloom " +
          "would saturate (fpp → 1) and silently degrade to the plain " +
          "anti-join; pass a covering estimate or omit it to derive")
      e
    case None => math.max(actual, 1L)
  }

  /** Shared state stage: first trigger wins per fingerprint; within a
    * trigger the smallest doc_id wins (batch keep-first determinism). */
  private def stateKeepFirst(spark: SparkSession,
      fps: DataFrame): Dataset[Kept] = {
    import spark.implicits._
    fps
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (fp: String, it: Iterator[(Long, String)], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            val keeper = it.map(_._1).min
            state.update(keeper)
            Iterator.single(Kept(keeper, fp))
          }
      }
  }
}
