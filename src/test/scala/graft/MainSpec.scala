package graft

import graft.ingest.{IngestSchema, Sinks}

/** Drives Main.run the way the CLI does: declarative template-driven
  * projection (reference main.go:65) and -model rename-map dispatch
  * (data-schema.json intent, SURVEY.md §1.2). */
class MainSpec extends SparkSpec {

  private val jsonFixture = "/root/reference/test-loader.json"

  test("default run: reference fixture → 20 rows on the built-in whitelist") {
    val (df, n) = Main.run(spark, Main.Args(file = jsonFixture, table = "t"))
    assert(n == 20)
    assert(df.columns.toSeq == IngestSchema.sinkColumns)
  }

  test("--template with the reference db-template.xlsx reproduces the whitelist") {
    val (df, _) = Main.run(spark, Main.Args(file = jsonFixture, table = "t",
      template = "/root/reference/db-template.xlsx"))
    assert(df.columns.toSeq == IngestSchema.sinkColumns)
  }

  test("editing the template changes the projection with no code change") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("tmpl")
      .resolve("template.xlsx").toString
    // reference template shape: row 1 display names, row 2
    // REQUIRED/OPTIONAL, row 3 DB column names (the row Main reads)
    Sinks.xlsx(
      Seq(("REQUIRED", "REQUIRED", "OPTIONAL"), ("status", "user", "fnumber"))
        .toDF("Status", "User", "F Number").coalesce(1),
      path)
    val (df, n) = Main.run(spark, Main.Args(file = jsonFixture, table = "t",
      template = path))
    assert(df.columns.toSeq == Seq("status", "user", "fnumber"))
    assert(n == 20)
  }

  test("-model Record applies the data-schema.json rename map end-to-end") {
    // source-named fixture per the mapping's FROM side
    val f = java.nio.file.Files.createTempFile("src", ".json")
    java.nio.file.Files.writeString(f,
      """{"Records": [
        |  {"user": "u1", "dateCreated": 1700000001, "dateSubmitted": 1700000002,
        |   "assetName": "a1", "location": "loc", "status": "ok",
        |   "jsonHash": "h1", "localId": "l1", "fileName": "x.json",
        |   "fnumbers": [{"fNumber": "FN-1", "scanTime": "2024-01-01T00:00:00Z"},
        |                {"fNumber": "FN-2", "scanTime": "2024-01-02T00:00:00Z"}]}
        |]}""".stripMargin)
    val (df, n) = Main.run(spark, Main.Args(file = f.toString, table = "t",
      model = "Record", schemaMap = "/root/reference/data-schema.json"))
    assert(n == 2)
    assert(df.columns.toSeq == IngestSchema.sinkColumns)
    val rows = df.orderBy("fnumber").collect()
    assert(rows(0).getAs[Long]("dt_created") == 1700000001L)
    assert(rows(0).getAs[String]("ast_name") == "a1")
    assert(rows(0).getAs[String]("fnumber") == "FN-1")
    assert(rows(1).getAs[String]("scan_time") == "2024-01-02T00:00:00Z")
  }

  test("unknown model name degrades to an empty mapping (no renames)") {
    assert(IngestSchema.mappingFromJson(
      "/root/reference/data-schema.json", "NoSuchModel").isEmpty)
  }
}
