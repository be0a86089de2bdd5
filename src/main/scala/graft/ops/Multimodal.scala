package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * processed per-partition in batches.
  *
  * The real decode (image/audio libraries) is STUBBED — this container
  * has no codec libs — behind [[FakeDecode]], a clearly-marked
  * deterministic fake. Everything Spark-side is real and tested: the
  * binary column representation, the `Dataset.mapPartitions` batch shape
  * (the Scala analog of `mapInPandas`), the output schema, and partition
  * preservation (narrow op — no shuffle).
  *
  * At 100 TB: binary payloads ride in their own column so parquet column
  * pruning skips them unless the decode stage runs; decode is a narrow
  * per-partition pass sized by `spark.sql.files.maxPartitionBytes`.
  */
object Multimodal {

  /** Raw multimodal record: id + opaque payload. */
  final case class BinRecord(doc_id: Long, payload: Array[Byte])

  /** Extracted metadata record (decode output schema). */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, channels: Int)

  /** STUB decoder — deterministic fake standing in for an image decode.
    * Replace with a real codec when the runtime has one. */
  object FakeDecode {
    def apply(r: BinRecord): MediaMeta = {
      val n = r.payload.length.toLong
      // ??? real decode goes here; the fake derives dims from byte length
      MediaMeta(r.doc_id, n, 64 + (n % 1920).toInt, 64 + ((n * 7) % 1080).toInt, 3)
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = resizeQueries ++ Map(
    // Binary ingestion + per-partition batch "decode" (stubbed kernel,
    // real Spark plumbing: binary column → mapPartitions → typed schema).
    "mm01_binary_meta" -> { (s, d) =>
      import s.implicits._
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[BinRecord]
        .mapPartitions(_.map(FakeDecode(_)))
        .toDF()
    }
  )

  // The fake decode is pure arithmetic on byte length → SQL-expressible;
  // strlen() = byte length (text is ASCII word soup, but strlen is the
  // faithful mirror of payload.length either way... strlen counts bytes).
  /** "Resize" analog on opaque payloads: normalize every payload to a
    * fixed byte budget — truncate long ones, zero-pad short ones (real
    * binary ops; the pixel-resample kernel itself would live inside the
    * stubbed decoder). Output proves the transform: constant size, plus
    * the preserved prefix length. */
  private val ResizeTo = 1024

  def resizeQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm03_resize_payload" -> { (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .withColumn("resized",
          expr(s"""rpad(substring(payload, 1, $ResizeTo), $ResizeTo, X'00')"""))
        .select(col("doc_id"),
          length(col("payload")).cast("int").as("orig_bytes"),
          length(col("resized")).cast("int").as("resized_bytes"),
          least(length(col("payload")), lit(ResizeTo)).cast("int").as("kept_bytes"))
    }
  )

  def oracle: Map[String, String] = Map(
    "mm03_resize_payload" ->
      s"""SELECT doc_id,
         |  CAST(strlen(text) AS INT) AS orig_bytes,
         |  $ResizeTo AS resized_bytes,
         |  CAST(LEAST(strlen(text), $ResizeTo) AS INT) AS kept_bytes
         |FROM documents""".stripMargin,
    "mm01_binary_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(64 + strlen(text) % 1920 AS INT) AS width,
        |  CAST(64 + (strlen(text) * 7) % 1080 AS INT) AS height,
        |  3 AS channels
        |FROM documents""".stripMargin
  )
}
