package graft.ingest

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** EP1-as-a-stream: drop the fixture into a watched dir, flatten lands in
  * the sink, source file is archived. */
class StreamingIngestSpec extends SparkSpec {

  test("drop-dir json stream flattens to 20 rows and archives the input") {
    val root = Files.createTempDirectory("stream_ingest")
    val in = Files.createDirectories(root.resolve("in"))
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    val archive = root.resolve("archive").toString
    Files.copy(Paths.get("/root/reference/test-loader.json"),
      in.resolve("batch1.json"))

    val df = StreamingIngest.jsonStream(spark, in.toString,
      archiveDir = Some(archive))
    val q = StreamingIngest.startParquetSink(df, out, ckpt)
    try {
      q.processAllAvailable()
      // the source archives batch N's files when a later batch commits —
      // drop a second file to close out batch 0
      Files.copy(Paths.get("/root/reference/test-loader.json"),
        in.resolve("batch2.json"))
      q.processAllAvailable()
    } finally q.stop()

    val landed = spark.read.parquet(out)
    assert(landed.count() == 40)
    assert(landed.columns.toSeq == IngestSchema.sinkColumns)
    assert(landed.filter(col("ast_name").isNull).count() > 0)
    // cleanSource=archive moves the consumed file under archiveDir via an
    // async cleaner thread — poll up to 15s
    def archived(): Boolean = Files.exists(Paths.get(archive)) &&
      Files.walk(Paths.get(archive)).toArray.map(_.toString)
        .exists(_.endsWith("batch1.json"))
    val deadline = System.nanoTime() + 15L * 1000000000L
    var ok = archived()
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(500); ok = archived() }
    assert(ok, "consumed input should be archived")
  }

  test("second file appends incrementally (exactly-once checkpointing)") {
    val root = Files.createTempDirectory("stream_ingest2")
    val in = Files.createDirectories(root.resolve("in"))
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    Files.copy(Paths.get("/root/reference/test-loader.json"), in.resolve("a.json"))
    val df = StreamingIngest.jsonStream(spark, in.toString)
    val q1 = StreamingIngest.startParquetSink(df, out, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 20)

    Files.copy(Paths.get("/root/reference/test-loader.json"), in.resolve("b.json"))
    val q2 = StreamingIngest.startParquetSink(df, out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    // a.json not reprocessed; b.json adds 20 more
    assert(spark.read.parquet(out).count() == 40)
  }

  test("streaming into the transactional JDBC sink: per-batch atomic loads") {
    val url = "jdbc:derby:memory:streamdb;create=true"
    val props = new java.util.Properties()
    val c = java.sql.DriverManager.getConnection(url, props)
    try {
      try c.createStatement().execute("DROP TABLE stream_tgt") catch { case _: Exception => }
      val cols = IngestSchema.sinkColumns.map(x => s""""$x" VARCHAR(255)""")
        .updated(1, """"dt_created" BIGINT""").updated(2, """"dt_submitted" BIGINT""")
      c.createStatement().execute(s"CREATE TABLE stream_tgt (${cols.mkString(", ")})")
    } finally c.close()

    val root = Files.createTempDirectory("stream_jdbc")
    val in = Files.createDirectories(root.resolve("in"))
    Files.copy(Paths.get("/root/reference/test-loader.json"), in.resolve("a.json"))
    val df = StreamingIngest.jsonStream(spark, in.toString)
    val q = StreamingIngest.startJdbcSink(df, url, props, "stream_tgt",
      root.resolve("ckpt").toString)
    try {
      q.processAllAvailable()
      Files.copy(Paths.get("/root/reference/test-loader.json"), in.resolve("b.json"))
      q.processAllAvailable()
    } finally q.stop()

    val c2 = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = c2.createStatement().executeQuery("SELECT COUNT(*) FROM stream_tgt")
      rs.next()
      assert(rs.getLong(1) == 40, s"expected 40 rows, got ${rs.getLong(1)}")
    } finally c2.close()
  }
}
