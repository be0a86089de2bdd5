package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps._

/** Persisted IVF (inverted-file) index: build once, probe many.
  *
  * Build trains the coarse quantizer (deterministic DataFrame k-means),
  * assigns every vector to its nearest cell (map-only — centroids are
  * plan-time literals), and materializes the assignment table as parquet
  * PARTITIONED BY cell id. That partition layout IS the inverted file: a
  * probe lists the `nprobe` cells nearest each query and scans only those
  * partitions (static partition pruning — the scan's selected partitions
  * and file count are ~nprobe/ncells of the table, which IvfIndexSpec
  * pins via FileSourceScanExec metrics).
  *
  * At 100 TB this is the separation that matters: index build is a
  * one-time job whose cost amortizes over every query, and a probe's IO
  * is proportional to the probed posting lists, not the corpus. The
  * previous ss03 shape recomputed assignment of the full table per run.
  */
object IvfIndex {

  /** Built index: on-disk location + the trained centroids. */
  final case class Index(dir: String, centroids: Seq[Seq[Double]], k: Int)

  // one build per (session, source dir) — probes (bench reps, repeated
  // query construction) reuse the materialized index
  private val indexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Index]
  graft.SessionCaches.registerEvictor(s =>
    indexCache.keySet.toSeq.filter(_._1 eq s).foreach(indexCache.remove))

  /** Train + assign + write the cell-partitioned assignment table. */
  def build(s: SparkSession, df: DataFrame, out: String,
      k: Int = 20, iters: Int = 3): Index = {
    val trained = KMeans.fit(s, df, "vec_id", "embedding", k, iters)
    df.select(col("vec_id"), col("embedding"),
        element_at(KMeans.nearestCells(col("embedding"), trained, 1), 1)
          .getField("c_id").as("c_id"))
      .write.mode("overwrite").partitionBy("c_id").parquet(out)
    Index(out, trained, k)
  }

  /** Append new vectors to an existing index: assign with the SAME
    * trained centroids (an IVF index's centroids are fixed at build
    * time; re-training would invalidate every posting list) and append
    * only the affected cell partitions — dynamic partition append, no
    * rewrite of existing posting lists. This is the incremental-ingest
    * path: today's crawl lands in the index without touching the
    * standing 100 TB of postings. */
  def append(s: SparkSession, index: Index, df: DataFrame): Unit =
    df.select(col("vec_id"), col("embedding"),
        element_at(KMeans.nearestCells(col("embedding"), index.centroids, 1), 1)
          .getField("c_id").as("c_id"))
      .write.mode("append").partitionBy("c_id").parquet(index.dir)

  /** Memoized build over the `embeddings` table of a testdata dir.
    * With an index root configured (IndexStore), the cell-partitioned
    * postings land under the store (they are ALREADY the index's
    * on-disk form — build() writes them; resolve() only decides where
    * and whether) plus a small `centroids` parquet, so a later session
    * reconstructs the Index from storage instead of re-training. */
  def builtFor(s: SparkSession, d: String): Index = {
    graft.SessionCaches.track(s)
    indexCache.getOrElseUpdate((s, d), {
      def all = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      graft.IndexStore.resolve(s, d, "ivf", "embeddings") match {
        case graft.IndexStore.Unmanaged =>
          val out = java.nio.file.Files.createTempDirectory("graft_ivf").toString
          build(s, all, out)
        case graft.IndexStore.Fresh(base) =>
          val cents = s.read.parquet(base + "/centroids").collect()
            .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toSeq).toSeq
          Index(graft.IndexStore.dataPath(base), cents, cents.size)
        case graft.IndexStore.Build(base, commit) =>
          try {
            val idx = build(s, all, graft.IndexStore.dataPath(base))
            import s.implicits._
            idx.centroids.zipWithIndex.map { case (c, i) => (i, c) }
              .toDF("c_id", "c")
              .write.mode("overwrite").parquet(base + "/centroids")
            commit()
            idx
          } catch { case t: Throwable =>
            graft.IndexStore.abortBuild(s, base); throw t
          }
      }
    })
  }

  /** Top-k probe: assign each query vector to its `nprobe` nearest cells,
    * collect the bounded probed-cell set (|queries| × nprobe ids — the
    * posting lists to open), and scan ONLY those partitions of the index.
    */
  def probe(s: SparkSession, index: Index, queries: DataFrame,
      nprobe: Int = 3, topk: Int = 10): DataFrame = {
    val probes = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        explode(KMeans.nearestCells(col("embedding"), index.centroids, nprobe))
          .as("cell"))
      .select(col("q_id"), col("q_vec"), col("cell.c_id").as("c_id"))
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
