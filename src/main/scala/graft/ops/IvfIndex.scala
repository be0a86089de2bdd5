package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps._

/** Persisted IVF (inverted-file) index: build once, probe many.
  *
  * Build trains the coarse quantizer, assigns every vector to its
  * nearest cell (map-only — centroids are plan-time literals), and
  * materializes the assignment table as parquet PARTITIONED BY cell id.
  * That partition layout IS the inverted file: a probe lists the
  * `nprobe` cells nearest each query and scans only those partitions
  * (static partition pruning — the scan's selected partitions and file
  * count are ~nprobe/ncells of the table, which IvfIndexSpec pins via
  * FileSourceScanExec metrics).
  *
  * The coarse quantizer is the INTEGER one the whole ss03 family
  * shares (ss05's per-vector int8 grid + emb03's hash-seeded
  * truncating-integer-mean Lloyd + integer-L2 argmin, ties to the
  * lower cid): cell membership and the probed-cell lists are exact
  * integer decisions a cross-engine oracle replays bit-for-bit, while
  * the REPORTED score stays the exact double cosine over the original
  * float vectors (ss01's replayed kernel). That is what moved ss03
  * from `no_oracle` (the float-k-means trainer was deterministic
  * run-to-run but not practically replayable) to hash-exact, without
  * giving up the persisted-index architecture.
  *
  * At 100 TB this is the separation that matters: index build is a
  * one-time job whose cost amortizes over every query, and a probe's
  * IO is proportional to the probed posting lists, not the corpus.
  */
object IvfIndex {

  /** Built index: on-disk location + the trained integer centroids
    * (cid → int8-space vector, ordered by cid). */
  final case class Index(dir: String, centroids: Seq[(Int, Seq[Int])]) {
    def k: Int = centroids.size
  }

  // one build per (session, source dir) — probes (bench reps, repeated
  // query construction) reuse the materialized index
  private val indexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Index]
  graft.SessionCaches.registerEvictor(s =>
    indexCache.keySet.toSeq.filter(_._1 eq s).foreach(indexCache.remove))

  /** Assign with FIXED centroids and write the cell-partitioned
    * postings (vec_id, embedding, c_id) — the float vector rides along
    * so probes can score exactly without a corpus join. */
  private def writeAssigned(df: DataFrame, cents: Seq[(Int, Seq[Int])],
      out: String, overwrite: Boolean): Unit =
    Similarity.quantize(df)
      .select(col("vec_id"), col("embedding"),
        Similarity.int8Assign(cents).getField("cid").as("c_id"))
      .write.mode(if (overwrite) "overwrite" else "append")
      .partitionBy("c_id").parquet(out)

  /** Train + assign + write the cell-partitioned assignment table. */
  def build(s: SparkSession, df: DataFrame, out: String,
      k: Int = 16): Index = {
    val trained = Similarity.int8LloydTrain(
      Similarity.quantize(df).select(col("vec_id"), col("q")), k)
    require(trained.nonEmpty,
      "IVF build over an empty corpus — nothing to train a quantizer on")
    writeAssigned(df, trained, out, overwrite = true)
    Index(out, trained)
  }

  /** Append new vectors to an existing index: assign with the SAME
    * trained centroids (an IVF index's centroids are fixed at build
    * time; re-training would invalidate every posting list) and append
    * only the affected cell partitions — dynamic partition append, no
    * rewrite of existing posting lists. This is the incremental-ingest
    * path: today's crawl lands in the index without touching the
    * standing 100 TB of postings. Quantization is per-vector (ss05's
    * grid), so new vectors quantize identically to a full rebuild. */
  def append(s: SparkSession, index: Index, df: DataFrame): Unit =
    writeAssigned(df, index.centroids, index.dir, overwrite = false)

  /** Shared IndexStore resolution for a trained-centroids + postings
    * index (builtFor and builtForAppend differ only in store name and
    * build closure): Unmanaged → temp-dir build; Fresh → reconstruct
    * the Index from the stored centroids parquet; Build → build into
    * the store, persist the centroids, commit (abort on any failure so
    * a half-written index is never published). */
  private def resolveIndex(s: SparkSession, d: String, store: String,
      tmpPrefix: String)(buildShared: String => Index): Index =
    graft.IndexStore.resolve(s, d, store, "embeddings") match {
      case graft.IndexStore.Unmanaged =>
        buildShared(
          java.nio.file.Files.createTempDirectory(tmpPrefix).toString)
      case graft.IndexStore.Fresh(base) =>
        val cents = s.read.parquet(base + "/centroids").collect()
          .sortBy(_.getInt(0))
          .map(r => (r.getInt(0), r.getSeq[Int](1).toSeq)).toSeq
        Index(graft.IndexStore.dataPath(base), cents)
      case graft.IndexStore.Build(base, commit) =>
        try {
          val idx = buildShared(graft.IndexStore.dataPath(base))
          import s.implicits._
          idx.centroids.toDF("c_id", "c")
            .write.mode("overwrite").parquet(base + "/centroids")
          commit()
          idx
        } catch { case t: Throwable =>
          graft.IndexStore.abortBuild(s, base); throw t
        }
    }

  /** Memoized build over the `embeddings` table of a testdata dir.
    * With an index root configured (IndexStore), the cell-partitioned
    * postings land under the store (they are ALREADY the index's
    * on-disk form — build() writes them; resolve() only decides where
    * and whether) plus a small `centroids` parquet, so a later session
    * reconstructs the Index from storage instead of re-training.
    * Trains through [[Similarity.ivfInt8Centroids]] — the SAME memoized
    * K=16 centroid set ss03b/ss03c use, so all three queries probe one
    * coarse quantizer. */
  def builtFor(s: SparkSession, d: String): Index = {
    graft.SessionCaches.track(s)
    indexCache.getOrElseUpdate((s, d), {
      def all = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      def buildShared(out: String): Index = {
        val cents = Similarity.ivfInt8Centroids(s, d)
        require(cents.nonEmpty,
          "IVF build over an empty corpus — nothing to train a quantizer on")
        writeAssigned(all, cents, out, overwrite = true)
        Index(out, cents)
      }
      // "ivf8", not the old "ivf": the store format changed with the
      // trainer (INT centroid arrays, int8-assigned postings) — a new
      // name keeps a pre-rewrite persisted index from being read back
      // as the wrong schema
      resolveIndex(s, d, "ivf8", "graft_ivf")(buildShared)
    })
  }

  /** ss11's memoized standing-corpus + appended-batch index: the
    * standing 90% (vec_id % 10 != 0) trains the frozen quantizer and
    * writes the initial posting lists, then the remaining 10% lands
    * through [[append]] — the dd07/dd11 standing-corpus pattern
    * applied to ANN: today's crawl is absorbed by dynamic partition
    * append, no retrain, no rewrite of existing posting lists. Store
    * name "ivf8a" keeps its lineage separate from the full-corpus
    * ivf8 index; qa11 audits the merged index's recall against the
    * exact brute force. */
  def builtForAppend(s: SparkSession, d: String): Index = {
    graft.SessionCaches.track(s)
    indexCache.getOrElseUpdate((s, d + "#append"), {
      def all = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      def standing = all.filter(col("vec_id") % 10 =!= 0)
      def batch = all.filter(col("vec_id") % 10 === 0)
      def buildShared(out: String): Index = {
        val cents = Similarity.ivfAppendCentroids(s, d)
        require(cents.nonEmpty,
          "IVF append-build over an empty standing corpus")
        writeAssigned(standing, cents, out, overwrite = true)
        val idx = Index(out, cents)
        append(s, idx, batch)
        idx
      }
      resolveIndex(s, d, "ivf8a", "graft_ivfa")(buildShared)
    })
  }

  /** Top-k probe: assign each query vector to its `nprobe` nearest
    * cells (exact integer L2 in int8 space — the replayable decision),
    * collect the bounded probed-cell set (|queries| × nprobe ids — the
    * posting lists to open), scan ONLY those partitions of the index,
    * and rank candidates by the EXACT double cosine over the original
    * float vectors. */
  def probe(s: SparkSession, index: Index, queries: DataFrame,
      nprobe: Int = 3, topk: Int = 10): DataFrame = {
    val probes = Similarity.quantize(queries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        explode(Similarity.nearestCellsInt8(index.centroids, nprobe))
          .as("cell"))
      .select(col("q_id"), col("q_vec"), col("cell.cid").as("c_id"))
    // bounded collect: the distinct probed cell ids become literals, so
    // the parquet scan below prunes partitions statically
    val cellIds = probes.select(col("c_id")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val posting = s.read.parquet(index.dir)
      .filter(col("c_id").isin(cellIds: _*))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    posting.join(broadcast(probes), Seq("c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_vec"), col("vec_id"), col("embedding"))
      .distinct()
      .withColumn("cos", cosine(col("embedding"), col("q_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topk)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank"))
  }
}
