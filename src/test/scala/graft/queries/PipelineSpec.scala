package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("pp02 near-dedup eliminates planted copies and keeps originals") {
    val survivors = Pipeline.queries("pp02_near_dedup_corpus")(spark, sf).cache()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    // most originals survive — a few are genuine near-dups of OTHER
    // originals and are correctly deduped among themselves
    val keptOriginals = survivors.filter(col("doc_id") < 1000000L).count()
    assert(keptOriginals >= (nDocs * 0.9).toLong && keptOriginals <= nDocs)
    // the overwhelming majority of planted copies are dropped (bounded by
    // LSH recall, gated >= 0.8 in DedupSpec)
    val keptCopies = survivors.filter(col("doc_id") >= 1000000L).count()
    assert(keptCopies <= nDocs / 5, s"too many near-dup copies survived: $keptCopies")
  }

  test("mm03 resize: constant output size, correct kept-byte accounting") {
    val df = graft.ops.Multimodal.queries("mm03_resize_payload")(spark, sf).cache()
    assert(df.filter(col("resized_bytes") =!= 1024).count() == 0)
    val bad = df.filter(
      col("kept_bytes") =!= least(col("orig_bytes"), lit(1024))).count()
    assert(bad == 0)
  }
}
