package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ingest.{Flatten, IngestSchema, JsonIngest, XmlRecordReader}

/** Ingest-pipeline operators surfaced as verifiable queries.
  *
  * in01 runs the flatten/explode shape on driver testdata (DuckDB-
  * checkable); in02/in03/in04 run the FULL reference ingest pipeline —
  * typed read → flatten → whitelist projection — on the reference's own
  * fixtures (golden row counts 20 / 16, SURVEY.md §5). in02 is fully
  * oracle-checked (DuckDB read_json replays the flatten with an
  * explicit schema so scan_time stays VARCHAR); the XML paths stay
  * rows-only (DuckDB has no XML reader) backed by golden specs.
  */
object Ingest {

  private val fixtureJson = "/root/reference/test-loader.json"
  private val fixtureXml = "/root/reference/test-loader.xml"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Explode/flatten demo over testdata: one row per token.
    "in01_flatten_words" -> { (s, d) =>
      Tables.load(s, d, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    },

    // Full JSON ingest parity path on the reference fixture (20 rows).
    "in02_reference_json_flatten" -> { (s, _) =>
      val flat = Flatten(JsonIngest.read(s, fixtureJson))
      JsonIngest.projectWhitelist(flat, IngestSchema.sinkColumns,
        IngestSchema.flattened.fields.map(f => f.name -> f.dataType).toMap)
    },

    // Full XML ingest parity path on the reference fixture (16 rows).
    "in03_reference_xml_flatten" -> { (s, _) =>
      val flat = Flatten(XmlRecordReader.read(s, fixtureXml, "Record", IngestSchema.raw))
      JsonIngest.projectWhitelist(flat, IngestSchema.sinkColumns,
        IngestSchema.flattened.fields.map(f => f.name -> f.dataType).toMap)
    },

    // Same pipeline through the DataSource V2 XML connector (16 rows;
    // column pruning reaches the parse — see ingest.xml.XmlDataSource).
    "in04_reference_xml_dsv2" -> { (s, _) =>
      val raw = s.read.format("graft.ingest.xml.XmlDataSource")
        .schema(IngestSchema.raw)
        .option("rowTag", "Record")
        .load(fixtureXml)
      JsonIngest.projectWhitelist(Flatten(raw), IngestSchema.sinkColumns,
        IngestSchema.flattened.fields.map(f => f.name -> f.dataType).toMap)
    }
  )

  def oracle: Map[String, String] = Map(
    "in01_flatten_words" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |FROM documents WHERE doc_id < 50""".stripMargin,

    "in02_reference_json_flatten" ->
      s"""WITH src AS (
         |  SELECT unnest(Records) AS r FROM read_json('$fixtureJson',
         |    columns={'Records': 'STRUCT("user" VARCHAR, dt_created BIGINT,
         |      dt_submitted BIGINT, ast_name VARCHAR, location VARCHAR,
         |      status VARCHAR, json_hash VARCHAR, local_id VARCHAR,
         |      filename VARCHAR,
         |      fnumbers STRUCT(fnumber VARCHAR, scan_time VARCHAR)[])[]'})
         |)
         |SELECT r."user" AS "user", r.dt_created, r.dt_submitted, r.ast_name,
         |       r.location, r.status, r.json_hash, r.local_id, r.filename,
         |       f.fnumber, f.scan_time
         |FROM src, unnest(r.fnumbers) AS u(f)""".stripMargin,

    // DuckDB cannot parse XML, so the XML paths pin the GOLDEN flattened
    // result (hand-verified against the reference's semantics in round 1,
    // SURVEY §5) as a literal table — converting both XML ingest queries
    // from rows-only to full schema+hash checks. Both the StAX path
    // (in03) and the DataSource V2 path (in04) must reproduce it.
    "in03_reference_xml_flatten" -> xmlGolden,
    "in04_reference_xml_dsv2" -> xmlGolden
  )

  private val xmlGolden: String =
    """SELECT "user", CAST("dt_created" AS BIGINT) AS "dt_created",
      |  CAST("dt_submitted" AS BIGINT) AS "dt_submitted", "ast_name",
      |  "location", "status", "json_hash", "local_id", "filename",
      |  "fnumber", "scan_time" FROM (VALUES
      |  ('Jim Brown', 1698413100, 1698499500, 'AssetD', 'Branch2', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN00172', '2024-12-05T11:00:00Z'),
      |  ('Jim Brown', 1698413100, 1698499500, 'AssetD', 'Branch2', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN01128', '2024-12-05T11:30:00Z'),
      |  ('John Brown', 1698413100, 1698499500, 'AssetA', 'Branch2', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN01190', '2024-12-05T11:00:00Z'),
      |  ('John Brown', 1698413100, 1698499500, 'AssetA', 'Branch2', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN03100', '2024-12-05T11:30:00Z'),
      |  ('John Smalls', 1698413100, 1698499500, 'AssetD', 'Branch2', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN0130', '2024-12-05T11:00:00Z'),
      |  ('John Smalls', 1698413100, 1698499500, 'AssetD', 'Branch2', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN0139', '2024-12-05T11:30:00Z'),
      |  ('Mark Brown', 1698413100, 1698499500, 'AssetD', 'Branch2', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN01318', '2024-12-05T11:30:00Z'),
      |  ('Mark Brown', 1698413100, 1698499500, 'AssetD', 'Branch2', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN01731', '2024-12-05T11:00:00Z'),
      |  ('Michael Smith', 1698413100, 1698499500, 'AssetD', 'Branch2', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN008013', '2024-12-05T11:30:00Z'),
      |  ('Michael Smith', 1698413100, 1698499500, 'AssetD', 'Branch2', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN0310', '2024-12-05T11:00:00Z'),
      |  ('Scott Tey', 1698413100, 1698499500, 'AssetD', 'Branch2', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN01309', '2024-12-05T11:30:00Z'),
      |  ('Scott Tey', 1698413100, 1698499500, 'AssetD', 'Branch2', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN01313', '2024-12-05T11:00:00Z'),
      |  ('Timothy Brown', 1698413100, 1698499500, 'AssetC', 'Branch1', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN0109', '2024-12-05T11:30:00Z'),
      |  ('Timothy Brown', 1698413100, 1698499500, 'AssetC', 'Branch1', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN0393', '2024-12-05T11:00:00Z'),
      |  ('Timothy Brown', 1698413100, 1698499500, 'AssetD', 'Branch2', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN00152', '2024-12-05T11:00:00Z'),
      |  ('Timothy Brown', 1698413100, 1698499500, 'AssetD', 'Branch2', 'Pending', 'hash101', 'local789', 'fileD.txt', 'FN0201', '2024-12-05T11:30:00Z')
      |) AS t("user", "dt_created", "dt_submitted", "ast_name", "location",
      |  "status", "json_hash", "local_id", "filename", "fnumber", "scan_time")""".stripMargin
}
