package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden tests against the reference's own fixtures (SURVEY.md §5):
  * test-loader.json → 20 flattened rows, test-loader.xml → 16. */
class IngestSpec extends SparkSpec {

  private val jsonFixture = "/root/reference/test-loader.json"
  private val xmlFixture = "/root/reference/test-loader.xml"

  private def pipeline(raw: org.apache.spark.sql.DataFrame) =
    JsonIngest.projectWhitelist(Flatten(raw), IngestSchema.sinkColumns,
      IngestSchema.flattened.fields.map(f => f.name -> f.dataType).toMap)

  test("JSON fixture flattens to 20 golden rows with duplicated base fields") {
    val df = pipeline(JsonIngest.read(spark, jsonFixture)).cache()
    assert(df.count() == 20)
    assert(df.columns.toSeq == IngestSchema.sinkColumns)
    // each record has 2 fnumbers → base fields duplicated across siblings
    val g = df.groupBy(col("json_hash")).count().collect()
    assert(g.forall(_.getLong(1) % 2 == 0))
  }

  test("JSON nulls survive: ast_name/local_id nullable per fixture") {
    val df = pipeline(JsonIngest.read(spark, jsonFixture))
    assert(df.filter(col("ast_name").isNull).count() > 0)
    assert(df.filter(col("local_id").isNull).count() > 0)
  }

  test("epoch fields are typed long, not float (the Go float64 hazard)") {
    val df = pipeline(JsonIngest.read(spark, jsonFixture))
    assert(df.schema("dt_created").dataType == LongType)
    assert(df.filter(col("dt_created") > 1600000000L).count() == 20)
  }

  test("XML fixture flattens to 16 golden rows via the StAX reader") {
    val df = pipeline(XmlRecordReader.read(spark, xmlFixture, "Record", IngestSchema.raw)).cache()
    assert(df.count() == 16)
    assert(df.filter(col("fnumber").startsWith("FN")).count() == 16)
    assert(df.schema("dt_created").dataType == LongType)
  }

  test("XML repeated-tag promotion produces the fnumbers array") {
    val raw = XmlRecordReader.read(spark, xmlFixture, "Record", IngestSchema.raw)
    val sizes = raw.select(size(col("fnumbers"))).collect().map(_.getInt(0))
    assert(sizes.forall(_ == 2), "every fixture record has 2 fnumbers groups")
  }

  test("XML and JSON paths converge on identical schemas") {
    val x = XmlRecordReader.read(spark, xmlFixture, "Record", IngestSchema.raw)
    val j = JsonIngest.read(spark, jsonFixture)
    assert(x.schema == j.schema)
  }

  test("whitelist projection warns-and-drops unknown columns, null-fills missing") {
    import spark.implicits._
    val df = Seq(("u1", "rogue")).toDF("user", "unmapped_col")
    val out = JsonIngest.projectWhitelist(df, IngestSchema.sinkColumns,
      IngestSchema.flattened.fields.map(f => f.name -> f.dataType).toMap)
    assert(out.columns.toSeq == IngestSchema.sinkColumns)
    assert(!out.columns.contains("unmapped_col"))
    assert(out.select(col("dt_created")).schema.head.dataType == LongType)
    assert(out.filter(col("fnumber").isNull).count() == 1)
  }

  test("data-schema.json mapping loads and applies renames") {
    val m = IngestSchema.mappingFromJson("/root/reference/data-schema.json", "Record")
    assert(m("dateCreated") == "dt_created")
    import spark.implicits._
    val renamed = JsonIngest.applyMapping(Seq(("x", 5L)).toDF("fileName", "dateCreated"), m)
    assert(renamed.columns.toSet == Set("filename", "dt_created"))
  }

  test("xlsx template reader extracts the 11 sink columns from row 3") {
    val cols = IngestSchema.columnsFromXlsx("/root/reference/db-template.xlsx")
    assert(cols == IngestSchema.sinkColumns)
  }

  test("JSONL path: envelope records re-written as lines parse identically") {
    val env = pipeline(JsonIngest.read(spark, jsonFixture)).cache()
    // rewrite the fixture's records as JSON-Lines
    val lines = JsonIngest.read(spark, jsonFixture).toJSON.collect()
    val f = java.nio.file.Files.createTempFile("recs", ".jsonl")
    java.nio.file.Files.writeString(f, lines.mkString("\n"))
    val jl = pipeline(JsonIngest.readJsonl(spark, f.toString))
    assert(jl.collect().map(_.toString).sorted.toSeq ==
      env.collect().map(_.toString).sorted.toSeq)
  }

  test("xlsx writer round-trips through the xlsx reader") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("b", 2L)).toDF("name", "v")
    val path = java.nio.file.Files.createTempDirectory("xlsx").resolve("out.xlsx").toString
    Sinks.xlsx(df, path)
    // row 1 = header per our writer; read it back
    val cols = IngestSchema.columnsFromXlsx(path, line = 1)
    assert(cols == Seq("name", "v"))
  }
}
