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

  /** Frame-level audio features (windowed energy / zero-crossing rate /
    * peak), all INTEGER-EXACT over the decoded 16-bit PCM samples:
    * energy = Σ s² (long), zero crossings = per-channel sign-change
    * count within the window, peak = max |s|. No floats anywhere, so
    * the features are a pure function of the PCM payload — pinned-golden
    * replayable, the audio analog of mm06's integer aHash. */
  final case class AudioFrameFeat(doc_id: Long, frame_id: Int,
      n_samples: Int, energy: Long, zero_crossings: Int, peak: Int)

  object AudioFrames {
    /** Window size in PCM frames (per-channel sample positions). */
    val Window = 400

    def apply(r: BinRecord): Iterator[AudioFrameFeat] = {
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
      if (in == null || in.getFormat.getSampleSizeInBits != 16) Iterator.empty
      else {
        val ch = in.getFormat.getChannels
        val bytes = in.readAllBytes() // raw PCM, little-endian 16-bit
        val nFrames = bytes.length / (2 * ch)
        (0 until nFrames by Window).iterator.map { f0 =>
          val fEnd = math.min(f0 + Window, nFrames)
          var energy = 0L; var zc = 0; var peak = 0
          var c = 0
          while (c < ch) {
            var prev = 0; var first = true; var t = f0
            while (t < fEnd) {
              val idx = (t * ch + c) * 2
              val s = ((bytes(idx + 1) << 8) | (bytes(idx) & 0xff)).toShort.toInt
              energy += s.toLong * s
              val a = if (s < 0) -s else s
              if (a > peak) peak = a
              if (!first && ((s < 0) != (prev < 0))) zc += 1
              prev = s; first = false; t += 1
            }
            c += 1
          }
          AudioFrameFeat(r.doc_id, f0 / Window, (fEnd - f0) * ch, energy, zc, peak)
        }
      }
    }
  }

  /** Windowed feature extraction over a directory of PCM audio files:
    * same narrow binaryFile shape as [[readAudioDir]], flatMapped to one
    * row per analysis window. */
  def audioFrameFeatures(spark: SparkSession, dir: String,
      glob: String = "*.wav"): org.apache.spark.sql.Dataset[AudioFrameFeat] = {
    import spark.implicits._
    binSource(spark, dir, glob).mapPartitions(_.flatMap(AudioFrames(_)))
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

  /** 64-bit average hash (aHash) of a decoded image: 8×8 block-mean
    * luminance thresholded against the global mean. Deliberately
    * INTEGER-EXACT — integer luma weights (299/587/114), block-vs-global
    * comparison by cross-multiplication instead of division, and no
    * resampling filter (blocks are pixel index ranges `x*8/w`) — so the
    * hash is a pure function of the decoded pixels. PNG decode is
    * lossless, which makes mm06's output a JDK-independent constant
    * (the lesson of the mm04 n_bytes golden: never pin encoder output,
    * only decode-derived values). Near-duplicate images differ in a few
    * bits; unrelated images differ in ~32. */
  private[ops] def aHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 8 / w
        val rgb = img.getRGB(x, y)
        val luma = 299L * ((rgb >> 16) & 0xff) +
          587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
        sums(by * 8 + bx) += luma
        counts(by * 8 + bx) += 1
        x += 1
      }
      y += 1
    }
    val total = sums.sum
    val totalN = w.toLong * h
    var hash = 0L
    var i = 0
    while (i < 64) {
      // block mean > global mean ⟺ sum·totalN > total·count (exact)
      if (sums(i) * totalN > total * counts(i)) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** (doc_id, ahash) for every image in `dir` — binaryFile source with
    * glob pruning, per-partition decode+hash, nothing but 16 bytes per
    * image leaves the scan. */
  def imageHashes(spark: SparkSession, dir: String,
      glob: String = "*.png"): DataFrame = {
    import spark.implicits._
    binSource(spark, dir, glob).mapPartitions(_.map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      (r.doc_id, aHash64(img))
    }).toDF("doc_id", "ahash")
  }

  private val Mm06Dir = new java.io.File(
    System.getProperty("java.io.tmpdir"), "graft_mm06_pngs_v4")

  /** Fixture for mm06: 8 base images plus near-duplicate variants of the
    * first three, and a readme.txt the glob must prune. Pixels have
    * BLOCK-level structure (each 8×8-grid block pseudorandomly dark ~50
    * or bright ~195, plus 4-bit noise): real images have low-frequency
    * content, and without it every aHash bit is a borderline coin flip.
    * Variants get +2 per channel (the classic levels tweak — provably
    * invariant for aHash: block and global means shift equally, so
    * hamming 0) and, for the first (whose block (0,0) is dark), a +150
    * patch over exactly that block — a localized edit that flips
    * precisely one block bit (hamming 1), exercising the nonzero path.
    * Same atomic build and version-suffix pinning as [[ensurePngDir]]. */
  private def ensureMm06Dir(): String = Mm06Dir.synchronized {
    if (!Mm06Dir.exists()) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_mm06_build").toFile
      def write(name: String, w: Int, h: Int, i: Int, delta: Int,
          patch: Boolean): Unit = {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) {
          val bx = x * 8 / w; val by = y * 8 / h
          val base =
            if ((((bx * 73 + by * 151 + i * 7) * 2654435761L >>> 8) & 1L) == 0L) 50
            else 195
          val noise = ((((x * 31 + y * 17 + i * 7) * 2654435761L) >>> 16) & 0xf).toInt
          val d = delta + (if (patch && bx == 0 && by == 0) 150 else 0)
          val v = math.min(255, base + noise + d)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        javax.imageio.ImageIO.write(img, "png", new java.io.File(tmp, name))
      }
      (0 until 8).foreach { i =>
        write(f"img_$i%02d.png", 24 + 9 * i, 21 + 6 * i, i, 0, patch = false)
      }
      (0 until 3).foreach { i =>
        write(f"img_$i%02d_dup.png", 24 + 9 * i, 21 + 6 * i, i, 2, patch = i == 0)
      }
      java.nio.file.Files.writeString(
        new java.io.File(tmp, "readme.txt").toPath, "not an image")
      if (!tmp.renameTo(Mm06Dir)) {
        org.apache.commons.io.FileUtils.deleteQuietly(tmp)
      }
    }
    Mm06Dir.getAbsolutePath
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = resizeQueries ++ Map(
    // Image near-duplicate detection: perceptual aHash over REAL decoded
    // pixels, then dd04's block-LSH shape — the 64-bit hash split into
    // 4×16-bit bands, candidates generated by band-bucket equi-join
    // (pigeonhole: any pair within hamming ≤ 3 shares an untouched
    // band — the candidate set is COMPLETE, never all-pairs), hamming
    // verified on the full hash via bit_count. At 100 TB of images the
    // shuffle moves (doc_id, 8-byte hash) tuples, never pixels.
    "mm06_image_near_dup" -> { (s, _) =>
      val imgs = imageHashes(s, ensureMm06Dir())
      val banded = imgs.select(col("doc_id"), col("ahash"),
          posexplode(array((0 until 4).map(j =>
            shiftright(col("ahash"), j * 16).bitwiseAND(lit(0xffffL))): _*)))
        .toDF("doc_id", "ahash", "band_id", "band_val")
      banded.as("a").join(banded.as("b"),
          col("a.band_id") === col("b.band_id") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.ahash").as("ha"), col("b.ahash").as("hb"))
        .distinct()
        .select(col("doc_a"), col("doc_b"),
          expr("bit_count(ha ^ hb)").cast("int").as("hamming"))
        .filter(col("hamming") <= 3)
    },
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
    // Frame-level audio analysis over the same WAV fixtures: windowed
    // energy / zero-crossing / peak, every value integer arithmetic on
    // the decoded PCM samples (see AudioFrames) — so the golden pins
    // decode-derived constants only, JDK-independent by construction.
    "mm07_audio_frames" -> { (s, _) =>
      audioFrameFeatures(s, ensureWavDir()).toDF()
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
    // Pinned golden: every value is DECODE-derived (PNG decode is
    // lossless and the aHash kernel is integer-exact — no encoder
    // bytes, no floating point, no resampling filter), so the pairs
    // are JDK-independent constants. The three planted near-dup pairs
    // surface with their exact hamming distances: the two global
    // brightenings at 0 (provably invariant), the patched variant at 1
    // (exactly the edited block's bit); no cross-image false pair
    // clears hamming ≤ 3.
    "mm06_image_near_dup" ->
      """SELECT CAST(doc_a AS BIGINT) AS doc_a,
        |  CAST(doc_b AS BIGINT) AS doc_b,
        |  CAST(hamming AS INT) AS hamming
        |FROM (VALUES
        |  (384472395053026361, 3961586856995111358, 1),
        |  (1429101628652043534, 8111554924071869481, 0),
        |  (2888137664963620139, 8065729218023443145, 0)
        |) AS t(doc_a, doc_b, hamming)""".stripMargin,
    // Pinned golden: every feature is integer arithmetic over the
    // decoded PCM samples of byte-deterministic fixtures (see
    // AudioFrames) — no floats, no encoder output, JDK-independent.
    // MultimodalSpec additionally recomputes these from the raw ramp
    // definition with javax-free code.
    "mm07_audio_frames" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(frame_id AS INT) AS frame_id,
        |  CAST(n_samples AS INT) AS n_samples,
        |  CAST(energy AS BIGINT) AS energy,
        |  CAST(zero_crossings AS INT) AS zero_crossings,
        |  CAST(peak AS INT) AS peak
        |FROM (VALUES
        |  (641884699350418128, 0, 400, 145792225230, 197, 32671),
        |  (641884699350418128, 1, 400, 145102350143, 198, 32671),
        |  (641884699350418128, 2, 400, 145158396940, 197, 32671),
        |  (641884699350418128, 3, 400, 145733961806, 197, 32671),
        |  (641884699350418128, 4, 400, 145940943909, 197, 32671),
        |  (641884699350418128, 5, 205, 74379402005, 101, 32608),
        |  (3495848985726114929, 0, 800, 291266482688, 783, 32671),
        |  (3495848985726114929, 1, 800, 290441916255, 782, 32671),
        |  (3495848985726114929, 2, 800, 291936338690, 782, 32671),
        |  (3495848985726114929, 3, 800, 290205129093, 783, 32671),
        |  (5553672774880568373, 0, 800, 290820778655, 783, 32671),
        |  (5553672774880568373, 1, 800, 291107600723, 782, 32671),
        |  (5553672774880568373, 2, 800, 290977073978, 783, 32671),
        |  (5553672774880568373, 3, 800, 291335724546, 780, 32671),
        |  (5553672774880568373, 4, 800, 290784944058, 783, 32671),
        |  (5553672774880568373, 5, 800, 291401699823, 783, 32671),
        |  (5553672774880568373, 6, 800, 290923610915, 782, 32671),
        |  (5553672774880568373, 7, 800, 290878390514, 783, 32671),
        |  (5553672774880568373, 8, 800, 291803862986, 780, 32671),
        |  (5553672774880568373, 9, 800, 290014551002, 783, 32671),
        |  (5553672774880568373, 10, 800, 292109845423, 782, 32671),
        |  (5553672774880568373, 11, 20, 6898456406, 18, 26503),
        |  (8964301213061517769, 0, 400, 146134293001, 197, 32671),
        |  (8964301213061517769, 1, 400, 145530903944, 197, 32671)
        |) AS t(doc_id, frame_id, n_samples, energy, zero_crossings, peak)""".stripMargin,
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
