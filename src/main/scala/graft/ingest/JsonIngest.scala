package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON ingest source + the shared projection/validation stage.
  *
  * Reference: fileloader/fileloader-schema.go:71-128 — decode top level,
  * iterate `topLevel["Records"]`, skip non-object elements with a warn.
  * The hard-coded "Records" envelope key is a flagged FIXME (:95); here it
  * is a parameter with the same default.
  */
object JsonIngest {

  /** Read an envelope JSON file into raw typed records. PERMISSIVE mode
    * keeps malformed records as nulls rather than failing the batch —
    * the reference's skip-with-warn (:104-107). */
  def read(spark: SparkSession, path: String,
      schema: StructType = IngestSchema.raw,
      envelopeKey: String = "Records"): DataFrame = {
    val envelope = StructType(Seq(
      StructField(envelopeKey, ArrayType(schema), nullable = true)))
    spark.read
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .schema(envelope)
      .json(path)
      .select(explode(col(envelopeKey)).as("r"))
      .select(col("r.*"))
  }

  /** JSON-Lines read (one record per line, no envelope): the at-scale
    * JSON layout — line-splittable, so ONE huge file parallelizes across
    * tasks natively (unlike the multiLine envelope form). Same schema,
    * same PERMISSIVE semantics. */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType = IngestSchema.raw): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .json(path)

  /** Rename source fields to sink columns per the declarative mapping
    * (data-schema.json intent — SURVEY.md §1.2). */
  def applyMapping(df: DataFrame, mapping: Map[String, String]): DataFrame =
    mapping.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from) && from != to) d.withColumnRenamed(from, to) else d
    }

  /** "Permissive parse, strict project": keep only whitelisted columns,
    * warn-and-drop unknown ones (fileloader-schema.go:351-360, :486-505),
    * null-fill declared-but-absent ones (DB nullable semantics). */
  def projectWhitelist(df: DataFrame, whitelist: Seq[String],
      types: Map[String, DataType] = Map.empty): DataFrame = {
    val present = df.columns.toSet
    val unknown = df.columns.filterNot(whitelist.contains)
    if (unknown.nonEmpty) {
      // warn-and-drop, never fail (fileloader-schema.go:352-359)
      org.apache.logging.log4j.LogManager.getLogger("graft.ingest").warn(
        new org.apache.logging.log4j.message.StringMapMessage()
          .`with`("event", "unmapped_columns_dropped")
          .`with`("columns", unknown.mkString(",")))
      System.err.println(
        s"[ingest] dropping unmapped columns: ${unknown.mkString(", ")}")
    }
    df.select(whitelist.map { c =>
      if (present.contains(c)) col(c)
      else lit(null).cast(types.getOrElse(c, StringType)).as(c)
    }: _*)
  }
}
