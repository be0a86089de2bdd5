package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}

/** Nested repeated group (models/models.go:22-25). */
final case class FNumber(fnumber: String, scan_time: String)

/** The reference's statically-typed record (models/models.go:6-19):
  * 9 scalars + one repeated group; `ast_name`/`local_id` are the
  * *string-pointer nullable fields (models/models.go:10,14) → Option. */
final case class MistAms(
    user: String, dt_created: Long, dt_submitted: Long,
    ast_name: Option[String], location: String, status: String,
    json_hash: String, local_id: Option[String], filename: String,
    fnumbers: Seq[FNumber])

/** Flattened sink row (db-template row 3 / README DDL). */
final case class MistAmsFlat(
    user: String, dt_created: Long, dt_submitted: Long,
    ast_name: Option[String], location: String, status: String,
    json_hash: String, local_id: Option[String], filename: String,
    fnumber: Option[String], scan_time: Option[String])

/** The legacy typed-struct path (SURVEY.md EP3): where the reference
  * walks struct tags by reflection (dbtransposer/dbtransposer.go:181-279),
  * Spark derives the schema from the case-class Encoder. Kept as the
  * type-safe secondary API; the DataFrame path is primary (and faster —
  * typed flatMap crosses the serialization boundary), exactly as the
  * reference keeps EP3 latent. */
object TypedPath {

  def readJson(spark: SparkSession, path: String): Dataset[MistAms] = {
    import spark.implicits._
    JsonIngest.read(spark, path).as[MistAms]
  }

  def readXml(spark: SparkSession, path: String): Dataset[MistAms] = {
    import spark.implicits._
    XmlRecordReader.read(spark, path, "Record", IngestSchema.raw).as[MistAms]
  }

  /** Typed flatten: slice fields → row per element; empty slice → one row
    * (dbtransposer.go:224-253 + the k=0 rule). */
  def flatten(ds: Dataset[MistAms]): Dataset[MistAmsFlat] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val base = MistAmsFlat(r.user, r.dt_created, r.dt_submitted, r.ast_name,
        r.location, r.status, r.json_hash, r.local_id, r.filename, None, None)
      if (r.fnumbers == null || r.fnumbers.isEmpty) Seq(base)
      else r.fnumbers.map(f =>
        base.copy(fnumber = Option(f.fnumber), scan_time = Option(f.scan_time)))
    }
  }
}
