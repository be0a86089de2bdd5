package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage profile of the dd03 LSH pipeline (dev aid). */
object DD03Prof {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = spark.read.parquet(s"$d/documents.parquet").select(col("doc_id"), col("text"))
    t("scan only")(noop(docs))
    val corpus = docs.union(docs.select((col("doc_id") + 1000000L).as("doc_id"),
      array_join(filter(split(col("text"), " "), (_, i) => i % 7 =!= 0), " ").as("text")))
    t("corpus")(noop(corpus))
    val sh = corpus.withColumn("sh",
      graft.functions.MinHash.shingleHashes(split(col("text"), " "), 3))
    t("shingles")(noop(sh))
    val sig = sh.withColumn("sig", graft.functions.MinHash.minhashSig(col("sh")))
      .select(col("doc_id"), col("sh"), col("sig"))
    t("shingles+sig")(noop(sig))
    val p = sig.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    t("persist write")(p.count())
    t("persist read")(noop(p))
    val bands = p.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(31)),
          j => xxhash64(concat_ws(",", slice(col("sig"), j * 2 + 1, lit(2))), j))))
      .toDF("doc_id", "band_id", "band_hash")
    t("bands")(noop(bands))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    t("cand join")(noop(cand))
    val ver = cand
      .join(p.select(col("doc_id").as("a"), col("sh").as("sh_a")), "a")
      .join(p.select(col("doc_id").as("b"), col("sh").as("sh_b")), "b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= 0.4)
    t("verify")(noop(ver))
    spark.stop()
  }
}
