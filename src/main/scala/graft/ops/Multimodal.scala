package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * processed per-partition in batches.
  *
  * Image decode is REAL ([[ImageDecode]], JDK ImageIO — PNG/BMP/GIF/JPEG,
  * no extra dependency), with a clearly-marked deterministic fallback
  * ([[FakeDecode]]) for payloads that aren't a decodable image, so the
  * operator is total over arbitrary binary columns. The Spark side is
  * the production shape: binary column representation, the
  * `Dataset.mapPartitions` batch shape (the Scala analog of
  * `mapInPandas`), typed output schema, partition preservation (narrow
  * op — no shuffle). Audio/video codecs stay out of scope (none in the
  * JRE); their plumbing would be this same shape.
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

  /** Deterministic fallback for payloads that are not a decodable image
    * (dims derived from byte length) — keeps the operator total over
    * arbitrary binary columns. */
  object FakeDecode {
    def apply(r: BinRecord): MediaMeta = {
      val n = r.payload.length.toLong
      MediaMeta(r.doc_id, n, 64 + (n % 1920).toInt, 64 + ((n * 7) % 1080).toInt, 3)
    }
  }

  /** Real image decode via the JDK's ImageIO (PNG/BMP/GIF/JPEG readers
    * ship with the JRE — no extra dependency). Width/height/channels
    * come from the actual decoded pixels; non-image payloads fall back
    * to [[FakeDecode]]. Runs inside the same mapPartitions batch shape,
    * so the 100 TB plumbing (binary column pruning, narrow per-partition
    * pass) is identical for the real and fallback paths. */
  object ImageDecode {
    def apply(r: BinRecord): MediaMeta = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case _: java.io.IOException => null }
      if (img == null) FakeDecode(r)
      else MediaMeta(r.doc_id, r.payload.length.toLong, img.getWidth,
        img.getHeight, img.getColorModel.getNumComponents)
    }
  }

  /** Ingest a directory of binary files (images/audio/video) via Spark's
    * `binaryFile` source and decode each payload. This is the real
    * multimodal ingestion shape: the source yields (path, length,
    * content) with partition-parallel reads, `pathGlobFilter` prunes by
    * extension BEFORE bytes are read, and decode stays the same narrow
    * mapPartitions pass as mm01. doc_id is derived from the file name
    * (stable across runs and cluster sizes). */
  def readBinaryDir(spark: SparkSession, dir: String,
      glob: String = "*.png"): org.apache.spark.sql.Dataset[MediaMeta] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        abs(xxhash64(element_at(split(col("path"), "/"), -1))).as("doc_id"),
        col("content").as("payload"))
      .as[BinRecord]
      .mapPartitions(_.map(ImageDecode(_)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = resizeQueries ++ Map(
    // Binary ingestion + per-partition batch decode. The decode kernel
    // is REAL (JDK ImageIO) — MultimodalSpec drives it with synthetic
    // PNGs and checks actual pixel dimensions; the documents payloads
    // here are text bytes, so they take the deterministic fallback,
    // which is what the SQL oracle mirrors.
    "mm01_binary_meta" -> { (s, d) =>
      import s.implicits._
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[BinRecord]
        .mapPartitions(_.map(ImageDecode(_)))
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
