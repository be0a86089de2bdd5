package graft

import java.util.Properties
import org.apache.logging.log4j.LogManager
import org.apache.logging.log4j.message.StringMapMessage
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ingest._

/** CLI entry point mirroring the reference pipeline (main.go:24-151):
  * required flags `-file`, `-model`, `-table` (main.go:40-50), plus
  * export/archival options made explicit (the reference runs the
  * CSV/Excel export unconditionally on the XML path — SURVEY.md EP2 notes
  * that as a wart; here `--export-dir` opts in).
  *
  * Pipeline: detect format by extension (fileloader.go:246-253) → typed
  * read → flatten → whitelist projection → optional file sinks →
  * optional atomic JDBC load → archive input.
  */
object Main {

  // log4j2 (ships with Spark) with key=value fields — the reference logs
  // the same run summary through zap's structured fields (main.go:132-138)
  private val log = LogManager.getLogger("graft.ingest")

  final case class Args(file: String = null, model: String = "MistAMS",
      table: String = null, exportDir: String = null, jdbc: Boolean = false,
      archive: Boolean = false, configPath: String = null,
      jdbcUrl: String = null, template: String = null, schemaMap: String = null)

  def main(argv: Array[String]): Unit = {
    val args = parse(argv)
    if (args.file == null || args.model == null || args.table == null) {
      // all three flags are required, as in main.go:44-50
      System.err.println(
        "usage: graft.Main -file <path> -model <name> -table <table> " +
          "[--template <xlsx>] [--schema-map <json>] [--export-dir <dir>] " +
          "[--jdbc] [--archive] [--config <path>]")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-ingest")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val result = run(spark, args)
      println(s"[graft] flattened rows: ${result._2}")
    } finally spark.stop()
  }

  /** Runs the pipeline; returns (flattened df, row count) for testability. */
  def run(spark: SparkSession, args: Args): (DataFrame, Long) = {
    // Declarative schema acquisition, as in the reference's startup
    // (main.go:65 loads db-template.xlsx row 3 as the column whitelist):
    // edit the template → the projection changes, no code change.
    val whitelist =
      if (args.template != null) IngestSchema.columnsFromXlsx(args.template)
      else IngestSchema.sinkColumns
    // -model selects the rename block in data-schema.json (the
    // reference's declared-but-dead mapping, honored here as intent —
    // SURVEY.md §1.2 / fileloader-schema.go:25-58 model dispatch). The
    // read schema uses SOURCE field names so mapped fields are captured.
    val mapping: Map[String, String] =
      if (args.schemaMap != null) IngestSchema.mappingFromJson(args.schemaMap, args.model)
      else Map.empty
    val readSchema = IngestSchema.sourceSchema(mapping)
    val raw = detectFileType(args.file) match {
      case "json" => JsonIngest.read(spark, args.file, readSchema)
      case "xml" => XmlRecordReader.read(spark, args.file, "Record", readSchema)
      case other => throw new IllegalArgumentException(s"unsupported file type: $other")
    }
    val flat = JsonIngest.applyMapping(Flatten(raw), mapping)
    val projected = JsonIngest.projectWhitelist(flat, whitelist,
      IngestSchema.flattened.fields.map(f => f.name -> f.dataType).toMap)
    val n = projected.count()

    if (args.exportDir != null) {
      Sinks.csv(projected, s"${args.exportDir}/csv")
      Sinks.json(projected, s"${args.exportDir}/json")
      Sinks.xlsx(projected, s"${args.exportDir}/export.xlsx")
    }
    if (args.jdbc) {
      // --jdbc-url overrides the config-derived DSN (e.g. embedded Derby
      // for local runs); otherwise config.yaml assembles the URL exactly
      // like the reference (main.go:162)
      val props = new Properties()
      val (url, fileDest) = if (args.jdbcUrl != null) {
        (args.jdbcUrl, "/tmp/graft-archive")
      } else {
        val cfgPath = Option(args.configPath).getOrElse(IngestConfig.discover())
        val cfg = IngestConfig.load(cfgPath)
        props.setProperty("user", cfg.database.user)
        props.setProperty("password", cfg.database.password)
        (cfg.database.jdbcUrl, cfg.runtime.fileDestination)
      }
      val res = JdbcTransactionalSink.write(projected, url, props, args.table)
      // the reference logs total/succeeded/errors at main.go:132-138
      log.info(new StringMapMessage()
        .`with`("event", "ingest_complete")
        .`with`("file", args.file)
        .`with`("model", args.model)
        .`with`("table", args.table)
        .`with`("total", res.total.toString)
        .`with`("succeeded", res.succeeded.toString)
        .`with`("errors", res.errors.toString)
        .`with`("committed", res.committed.toString))
      println(s"[graft] table=${args.table} total=${res.total} " +
        s"succeeded=${res.succeeded} errors=${res.errors} committed=${res.committed}")
      if (args.archive && res.committed)
        Archive.moveInputFile(args.file, fileDest)
    }
    (projected, n)
  }

  /** Extension-based format dispatch (fileloader.go:246-253). */
  def detectFileType(path: String): String =
    path.substring(path.lastIndexOf('.') + 1).toLowerCase

  private def parse(argv: Array[String]): Args = {
    var a = Args()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "-file" => a = a.copy(file = argv(i + 1)); i += 2
        case "-model" => a = a.copy(model = argv(i + 1)); i += 2
        case "-table" => a = a.copy(table = argv(i + 1)); i += 2
        case "--export-dir" => a = a.copy(exportDir = argv(i + 1)); i += 2
        case "--config" => a = a.copy(configPath = argv(i + 1)); i += 2
        case "--template" => a = a.copy(template = argv(i + 1)); i += 2
        case "--schema-map" => a = a.copy(schemaMap = argv(i + 1)); i += 2
        case "--jdbc-url" => a = a.copy(jdbcUrl = argv(i + 1)); i += 2
        case "--jdbc" => a = a.copy(jdbc = true); i += 1
        case "--archive" => a = a.copy(archive = true); i += 1
        case other => System.err.println(s"[graft] unknown flag: $other"); i += 1
      }
    }
    a
  }
}
