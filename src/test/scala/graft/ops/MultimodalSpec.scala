package graft.ops

import graft.SparkSpec

/** The decode kernel itself: real PNGs in, actual pixel dimensions out
  * (mm01's oracle covers the fallback arithmetic; this spec covers the
  * ImageIO path the oracle can't express). */
class MultimodalSpec extends SparkSpec {

  private def png(w: Int, h: Int, rgba: Boolean = false): Array[Byte] = {
    val t =
      if (rgba) java.awt.image.BufferedImage.TYPE_INT_ARGB
      else java.awt.image.BufferedImage.TYPE_INT_RGB
    val img = new java.awt.image.BufferedImage(w, h, t)
    img.setRGB(0, 0, 0xff00ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("binaryFile ingestion: a directory of PNGs decodes to real dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("png_ingest")
    java.nio.file.Files.write(dir.resolve("a.png"), png(33, 21))
    java.nio.file.Files.write(dir.resolve("b.png"), png(48, 12))
    java.nio.file.Files.write(dir.resolve("ignore.txt"), "not an image".getBytes)
    val out = Multimodal.readBinaryDir(spark, dir.toString).collect()
    assert(out.length == 2, "pathGlobFilter must prune the non-png file")
    assert(out.map(m => (m.width, m.height)).toSet == Set((33, 21), (48, 12)))
    assert(out.forall(_.channels == 3))
  }

  test("ImageDecode reads real PNG pixel dimensions inside mapPartitions") {
    import spark.implicits._
    val recs = Seq(
      Multimodal.BinRecord(1L, png(17, 9)),
      Multimodal.BinRecord(2L, png(256, 128, rgba = true)),
      Multimodal.BinRecord(3L, "not an image".getBytes("UTF-8")))
    val out = spark.createDataset(recs)
      .mapPartitions(_.map(Multimodal.ImageDecode(_)))
      .collect().sortBy(_.doc_id)
    assert(out(0).width == 17 && out(0).height == 9 && out(0).channels == 3)
    assert(out(1).width == 256 && out(1).height == 128 && out(1).channels == 4)
    // non-image payload falls back to the deterministic fake
    assert(out(2) == Multimodal.FakeDecode(recs(2)))
    assert(out(2).n_bytes == "not an image".getBytes("UTF-8").length.toLong)
  }

  test("AudioDecode reads real PCM WAV headers; non-audio falls back to zeros") {
    val fmt = new javax.sound.sampled.AudioFormat(12000f, 16, 2, true, false)
    val frames = 120
    val pcm = Array.tabulate[Byte](frames * 2 * 2)(i => (i % 100).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = Multimodal.AudioDecode(Multimodal.BinRecord(1L, bos.toByteArray))
    assert(wav.sample_rate == 12000 && wav.channels == 2 &&
      wav.bits == 16 && wav.n_frames == frames.toLong)
    val notAudio = Multimodal.AudioDecode(
      Multimodal.BinRecord(2L, "just text".getBytes("UTF-8")))
    assert(notAudio == Multimodal.AudioMeta(2L, 9L, 0, 0, 0, 0L))
  }
}
