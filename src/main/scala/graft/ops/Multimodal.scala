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
  * op — no shuffle). Audio decode is REAL for PCM containers
  * ([[AudioDecode]], javax.sound.sampled — WAV/AIFF/AU ship with the
  * JRE); compressed audio (MP3/AAC) and video codecs stay out of scope
  * (no JRE support) — their plumbing would be this same shape.
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

  /** Decoded audio metadata (all integer-exact header/frame fields). */
  final case class AudioMeta(doc_id: Long, n_bytes: Long, sample_rate: Int,
      channels: Int, bits: Int, n_frames: Long)

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

  /** Real audio decode via the JDK's javax.sound.sampled (PCM WAV/AIFF/AU
    * readers ship with the JRE — no extra dependency; compressed codecs
    * like MP3/AAC and all video stay out of scope). Every output field is
    * an integer header/frame-count value, so the decode is exactly
    * replayable by a pinned oracle. Non-audio payloads map to a
    * deterministic all-zero fallback, keeping the operator total. */
  object AudioDecode {
    def apply(r: BinRecord): AudioMeta = {
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
      if (in == null) AudioMeta(r.doc_id, r.payload.length.toLong, 0, 0, 0, 0L)
      else {
        val f = in.getFormat
        AudioMeta(r.doc_id, r.payload.length.toLong,
          math.round(f.getSampleRate), f.getChannels,
          f.getSampleSizeInBits, in.getFrameLength)
      }
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
    binSource(spark, dir, glob).mapPartitions(_.map(ImageDecode(_)))
  }

  /** Audio twin of [[readBinaryDir]]: binaryFile source + PCM decode. */
  def readAudioDir(spark: SparkSession, dir: String,
      glob: String = "*.wav"): org.apache.spark.sql.Dataset[AudioMeta] = {
    import spark.implicits._
    binSource(spark, dir, glob).mapPartitions(_.map(AudioDecode(_)))
  }

  private def binSource(spark: SparkSession, dir: String,
      glob: String): org.apache.spark.sql.Dataset[BinRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        abs(xxhash64(element_at(split(col("path"), "/"), -1))).as("doc_id"),
        col("content").as("payload"))
      .as[BinRecord]
  }

  // _v1 pins the fixture definition: if the pixel function or sizes ever
  // change, bump the suffix so a stale directory from an older build
  // cannot poison the pinned-golden oracle
  private val Mm04Dir = new java.io.File(
    System.getProperty("java.io.tmpdir"), "graft_mm04_pngs_v1")

  /** Deterministic PNG fixture directory for mm04: 8 images with fixed
    * sizes and a fixed pixel function (so the JDK PNG encoder emits
    * byte-identical files on every run), plus one `notes.txt` that the
    * binaryFile `pathGlobFilter` must prune. Built once per host,
    * atomically (write to a temp dir, rename into place). */
  private def ensurePngDir(): String = Mm04Dir.synchronized {
    if (!Mm04Dir.exists()) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_mm04_build").toFile
      (0 until 8).foreach { i =>
        val w = 13 + 7 * i; val h = 17 + 5 * i
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w)
          img.setRGB(x, y, (((x * 31 + y * 17 + i * 7) * 2654435761L) & 0xffffff).toInt)
        javax.imageio.ImageIO.write(img, "png", new java.io.File(tmp, f"img_$i%02d.png"))
      }
      java.nio.file.Files.writeString(
        new java.io.File(tmp, "notes.txt").toPath, "not an image")
      if (!tmp.renameTo(Mm04Dir)) {
        // another process won the race; its directory has identical bytes
        org.apache.commons.io.FileUtils.deleteQuietly(tmp)
      }
    }
    Mm04Dir.getAbsolutePath
  }

  private val Mm05Dir = new java.io.File(
    System.getProperty("java.io.tmpdir"), "graft_mm05_wavs_v1")

  /** Deterministic WAV fixture directory for mm05: four 16-bit PCM clips
    * with fixed rates/channels/frame counts and a fixed byte-ramp
    * payload (WAV headers are a pure function of format + length, so the
    * files are byte-identical on every run), plus a readme.txt that the
    * glob must prune. Same atomic-build pattern as [[ensurePngDir]];
    * _v1 pins the fixture definition. */
  private def ensureWavDir(): String = Mm05Dir.synchronized {
    if (!Mm05Dir.exists()) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_mm05_build").toFile
      val configs = Seq((8000, 1, 800), (16000, 2, 1600), (22050, 1, 2205), (44100, 2, 4410))
      configs.zipWithIndex.foreach { case ((rate, ch, frames), i) =>
        val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, ch, true, false)
        val bytes = new Array[Byte](frames * ch * 2)
        var b = 0
        while (b < bytes.length) { bytes(b) = ((b * 31 + i * 7) % 251).toByte; b += 1 }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(bytes), fmt, frames.toLong)
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE,
          new java.io.File(tmp, f"clip_$i%02d.wav"))
      }
      java.nio.file.Files.writeString(
        new java.io.File(tmp, "readme.txt").toPath, "not audio")
      if (!tmp.renameTo(Mm05Dir)) {
        org.apache.commons.io.FileUtils.deleteQuietly(tmp)
      }
    }
    Mm05Dir.getAbsolutePath
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = resizeQueries ++ Map(
    // The REAL file-ingest path: binaryFile source over a directory of
    // on-disk PNGs (glob-pruned before bytes are read), ImageIO decode of
    // actual pixels. The fixture directory is deterministic, so the
    // decoded dimensions, byte counts, and filename-hash doc_ids are
    // constants — pinned as a golden VALUES oracle (the in03 technique).
    // Input is SF-independent by design: what's under test is the
    // source + decode plumbing, not the corpus.
    // n_bytes (the ENCODED png size) is deliberately dropped from the
    // gated output: it is a function of the JDK's deflate encoder, not
    // of this engine, and pinning it would break the golden on a JDK
    // upgrade. The decode-derived fields (dimensions, channels) and the
    // glob-pruned doc_id set are the engine's actual behavior. mm05
    // keeps n_bytes — WAV sizes are header math, JDK-independent.
    "mm04_read_binary_dir" -> { (s, _) =>
      readBinaryDir(s, ensurePngDir()).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("channels"))
    },

    // REAL audio decode: binaryFile source over deterministic 16-bit PCM
    // WAV fixtures, javax.sound.sampled header+frame decode. Same pinned
    // golden gating as mm04; the readme.txt in the directory must be
    // glob-pruned before bytes are read.
    "mm05_read_audio_dir" -> { (s, _) =>
      readAudioDir(s, ensureWavDir()).toDF()
    },
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
    // Pinned golden, same technique as mm04: WAV fixtures are
    // byte-deterministic, so ids, file sizes, and every decoded header
    // field are constants.
    "mm05_read_audio_dir" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(n_bytes AS BIGINT) AS n_bytes,
        |  CAST(sample_rate AS INT) AS sample_rate,
        |  CAST(channels AS INT) AS channels, CAST(bits AS INT) AS bits,
        |  CAST(n_frames AS BIGINT) AS n_frames
        |FROM (VALUES
        |  (641884699350418128, 4454, 22050, 1, 16, 2205),
        |  (3495848985726114929, 6444, 16000, 2, 16, 1600),
        |  (5553672774880568373, 17684, 44100, 2, 16, 4410),
        |  (8964301213061517769, 1644, 8000, 1, 16, 800)
        |) AS t(doc_id, n_bytes, sample_rate, channels, bits, n_frames)""".stripMargin,
    // Pinned golden (the in03 technique): the fixture PNGs have fixed
    // sizes and a fixed pixel function, so doc_id (xxhash64 of the file
    // name) and the ImageIO-DECODED dimensions are constants. Encoded
    // byte sizes are deliberately absent — they belong to the JDK's
    // encoder, not to this engine (see the query comment). Captured from
    // a verified run; any drift in the source, glob pruning, or decode
    // path breaks the hash compare.
    "mm04_read_binary_dir" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(width AS INT) AS width, CAST(height AS INT) AS height,
        |  CAST(channels AS INT) AS channels
        |FROM (VALUES
        |  (384472395053026361, 13, 17, 3),
        |  (1429101628652043534, 27, 27, 3),
        |  (3042147841009488751, 34, 32, 3),
        |  (3491708837997856539, 55, 47, 3),
        |  (4934656547558975274, 41, 37, 3),
        |  (7320648961403027498, 62, 52, 3),
        |  (7918536170619129311, 48, 42, 3),
        |  (8065729218023443145, 20, 22, 3)
        |) AS t(doc_id, width, height, channels)""".stripMargin,
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
