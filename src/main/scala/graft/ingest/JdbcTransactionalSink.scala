package graft.ingest

import java.sql.{Connection, DriverManager, PreparedStatement}
import java.util.Properties
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.apache.spark.util.LongAccumulator

/** Whole-file-atomic JDBC sink with per-record error isolation.
  *
  * Reference guarantee (SURVEY.md §2.8): every record of the input lands
  * or none do; per-record failures are counted and skipped mid-stream,
  * and ANY record error causes the reduce phase to roll back every
  * worker's transaction (mapreduce/mapreduce.go:44-50, :97-104;
  * dbtransposer/dbtransposer.go:290-364). We implement the *intended*
  * semantics, not the stale-err reporting bug (SURVEY.md §2.7).
  *
  * Spark's stock `df.write.jdbc` commits per partition with no global
  * transaction, so atomicity uses the STAGING-TABLE pattern:
  *   1. executors append to `<table>_stg_<uuid>` in parallel
  *      (`foreachPartition`, batched PreparedStatement — the multi-row
  *      VALUES batching of dbtransposer-schema.go:58-87);
  *   2. the driver promotes staging → target in ONE transaction
  *      (`INSERT INTO target SELECT * FROM staging`), then drops staging.
  * Scales to any executor count (parallel load) while the commit point
  * stays a single metadata-cheap statement — unlike a single-partition
  * write (no parallelism) or 2PC (coordination).
  *
  * Success/error counters are Spark `LongAccumulator`s — the distributed
  * mirror of util/utils.go:10-40's mutexed Counter.
  */
object JdbcTransactionalSink {

  final case class IngestResult(total: Long, succeeded: Long, errors: Long,
      committed: Boolean, stagingTable: String, replayed: Boolean = false)

  /** Staging-only bookkeeping column tagging each row with the Spark
    * partition that wrote it (never promoted to the target). */
  private val PartCol = "_graft_part"

  /** If true (reference behavior), any record error rolls back the whole
    * file; if false, good records commit and bad ones are only counted.
    * `numWriters` mirrors RUNTIME.WORKER_COUNT / SetMaxOpenConns
    * (main.go:173): it caps concurrent DB connections by repartitioning
    * before the write. None = keep the upstream partitioning. */
  final case class Options(allOrNothing: Boolean = true, batchSize: Int = 500,
      numWriters: Option[Int] = None)

  def write(df: DataFrame, url: String, props: Properties, table: String,
      opts: Options = Options()): IngestResult =
    write0(df, url, props, table, opts, marker = None)

  /** Effectively-once micro-batch write for Structured Streaming.
    *
    * `foreachBatch` re-delivers a batch id after a crash between the sink
    * commit and the checkpoint commit — the sink, not the engine, owns
    * that last idempotence step (Spark's own foreachBatch contract). The
    * commit marker makes the promote idempotent per (table, batchId):
    *   - marker already present ⇒ the batch landed in a previous attempt;
    *     skip WITHOUT executing the batch DataFrame at all;
    *   - otherwise the marker row is inserted in the SAME transaction as
    *     the staging→target promote, so "promoted" and "marked" are
    *     atomic — a crash at any point leaves either both or neither,
    *     and a concurrent duplicate attempt loses on the marker's
    *     primary key and rolls its promote back.
    */
  def writeBatch(df: DataFrame, url: String, props: Properties, table: String,
      batchId: Long, opts: Options = Options()): IngestResult = {
    ensureBatchLog(url, props, table)
    val already = withConnection(url, props) { c =>
      batchCommitted(c, table, batchId)
    }
    if (already)
      IngestResult(0, 0, 0, committed = true, stagingTable = "", replayed = true)
    else write0(df, url, props, table, opts, marker = Some(batchId))
  }

  /** Per-target commit log of promoted streaming batch ids. */
  def batchLogTable(table: String): String = s"${table}_graft_batches"

  private def ensureBatchLog(url: String, props: Properties, table: String): Unit =
    withConnection(url, props) { c =>
      // no portable CREATE TABLE IF NOT EXISTS — "already exists" is fine
      try exec(c,
        s"CREATE TABLE ${batchLogTable(table)} (batch_id BIGINT PRIMARY KEY)")
      catch { case _: java.sql.SQLException => }
    }

  private def batchCommitted(c: Connection, table: String, batchId: Long): Boolean = {
    val ps = c.prepareStatement(
      s"SELECT 1 FROM ${batchLogTable(table)} WHERE batch_id = ?")
    try { ps.setLong(1, batchId); ps.executeQuery().next() } finally ps.close()
  }

  private def write0(df: DataFrame, url: String, props: Properties, table: String,
      opts: Options, marker: Option[Long]): IngestResult = {
    val spark = df.sparkSession
    val schema = df.schema
    val staging = s"${table}_stg_${java.util.UUID.randomUUID().toString.replace("-", "").take(10)}"
    val ok = spark.sparkContext.longAccumulator("ingest.succeeded")
    val err = spark.sparkContext.longAccumulator("ingest.errors")

    // Staging mirrors the TARGET's column types (not the DataFrame's),
    // so per-record type/length violations surface at staging-insert time
    // — the reference's per-record insert error point (mapreduce.go:44-50)
    // — and the promote statement can never fail on data.
    //
    // Staging rows are tagged with the Spark partition id and each task
    // DELETEs its partition's rows before inserting, so a retried task
    // (the write commits per batch, which a plain retry would otherwise
    // double-insert) leaves staging exactly as if it ran once. Two
    // CONCURRENT attempts of one partition (speculation) can still
    // interleave delete/insert — run with spark.speculation=false (the
    // default) for the strict all-or-nothing guarantee.
    withConnection(url, props) { c =>
      val ddl = targetDdl(c, table, schema).getOrElse(ddlColumns(schema))
      exec(c, s"CREATE TABLE $staging ($ddl, ${quoteId(PartCol)} INTEGER)")
    }
    try {
      val insertSql =
        s"""INSERT INTO $staging (${schema.fieldNames.map(quoteId).mkString(", ")}, ${quoteId(PartCol)})
           |VALUES (${schema.fields.map(_ => "?").mkString(", ")}, ?)""".stripMargin
      val fields = schema.fields
      val batchSize = opts.batchSize
      val writeDf = opts.numWriters.map(df.repartition(_)).getOrElse(df)
      writeDf.foreachPartition { rows: Iterator[Row] =>
        if (rows.nonEmpty) {
          val partId = org.apache.spark.TaskContext.getPartitionId()
          val conn = DriverManager.getConnection(url, props)
          try {
            conn.setAutoCommit(false)
            // idempotency on retry: clear anything a failed prior attempt
            // of THIS partition already committed into staging
            val del = conn.prepareStatement(
              s"DELETE FROM $staging WHERE ${quoteId(PartCol)} = ?")
            try { del.setInt(1, partId); del.executeUpdate(); conn.commit() }
            finally del.close()
            val ps = conn.prepareStatement(insertSql)
            def bindRow(r: Row): Unit = {
              bind(ps, r, fields)
              ps.setInt(fields.length + 1, partId)
            }
            val pending = new scala.collection.mutable.ArrayBuffer[Row](batchSize)
            def flush(): Unit = if (pending.nonEmpty) {
              try {
                ps.executeBatch()
                ok.add(pending.length)
              } catch {
                case _: java.sql.SQLException =>
                  // batch poisoned: replay row-by-row so one bad record
                  // doesn't take down its batch (skip-and-continue,
                  // mapreduce.go:44-50)
                  conn.rollback()
                  pending.foreach { r =>
                    try {
                      bindRow(r); ps.executeUpdate(); conn.commit()
                      ok.add(1)
                    } catch {
                      case _: java.sql.SQLException => conn.rollback(); err.add(1)
                    }
                  }
              }
              ps.clearBatch()
              pending.clear()
            }
            rows.foreach { r =>
              bindRow(r)
              ps.addBatch()
              pending += r
              if (pending.length >= batchSize) { flush(); conn.commit() }
            }
            flush()
            conn.commit()
          } finally conn.close()
        }
      }

      val total = ok.value + err.value
      val commit = err.value == 0 || !opts.allOrNothing
      var lostRace = false
      if (commit) {
        val cols = schema.fieldNames.map(quoteId).mkString(", ")
        withConnection(url, props) { c =>
          c.setAutoCommit(false)
          // marker first: a duplicate attempt fails HERE (primary key) and
          // never reaches the promote — zero duplicate rows under replay
          marker.foreach { id =>
            val ps = c.prepareStatement(
              s"INSERT INTO ${batchLogTable(table)} (batch_id) VALUES (?)")
            try { ps.setLong(1, id); ps.executeUpdate() }
            catch { case _: java.sql.SQLException => lostRace = true }
            finally ps.close()
          }
          if (lostRace) c.rollback()
          else {
            exec(c, s"INSERT INTO $table ($cols) SELECT $cols FROM $staging")
            c.commit()
          }
        }
      }
      IngestResult(total, ok.value, err.value,
        committed = commit && !lostRace, staging, replayed = lostRace)
    } finally {
      withConnection(url, props) { c =>
        try exec(c, s"DROP TABLE $staging") catch { case _: java.sql.SQLException => }
      }
    }
  }

  /** DDL for the df's columns copied from the target table's metadata
    * (column type + length), so staging enforces identical constraints. */
  private def targetDdl(c: Connection, table: String,
      schema: StructType): Option[String] = {
    try {
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT * FROM $table WHERE 1=0")
        val md = rs.getMetaData
        val byName = (1 to md.getColumnCount).map { i =>
          val tn = md.getColumnTypeName(i)
          val sized = md.getColumnType(i) match {
            case java.sql.Types.VARCHAR | java.sql.Types.CHAR |
                 java.sql.Types.NVARCHAR | java.sql.Types.NCHAR =>
              s"$tn(${md.getPrecision(i)})"
            case java.sql.Types.DECIMAL | java.sql.Types.NUMERIC =>
              s"$tn(${md.getPrecision(i)},${md.getScale(i)})"
            case _ => tn
          }
          md.getColumnName(i).toLowerCase -> sized
        }.toMap
        val cols = schema.fieldNames.map { n =>
          byName.get(n.toLowerCase).map(t => s"${quoteId(n)} $t")
        }
        if (cols.forall(_.isDefined)) Some(cols.flatten.mkString(", ")) else None
      } finally st.close()
    } catch { case _: java.sql.SQLException => None }
  }

  /** Spark → ANSI DDL type mapping (README.md:85-97 DDL shape). */
  private def ddlColumns(schema: StructType): String =
    schema.fields.map { f =>
      val t = f.dataType match {
        case LongType => "BIGINT"
        case IntegerType => "INTEGER"
        case DoubleType => "DOUBLE PRECISION"
        case BooleanType => "BOOLEAN"
        case TimestampType => "TIMESTAMP"
        case _ => "VARCHAR(255)"
      }
      s"${quoteId(f.name)} $t"
    }.mkString(", ")

  private def quoteId(name: String): String = "\"" + name + "\""

  private def sqlType(dt: DataType): Int = dt match {
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case DoubleType => java.sql.Types.DOUBLE
    case BooleanType => java.sql.Types.BOOLEAN
    case TimestampType => java.sql.Types.TIMESTAMP
    case _ => java.sql.Types.VARCHAR
  }

  private def bind(ps: PreparedStatement, r: Row, fields: Array[StructField]): Unit = {
    var i = 0
    while (i < fields.length) {
      val v = if (r.isNullAt(i)) null else r.get(i)
      if (v == null) {
        // Types.NULL is not portable (Derby rejects it) — use the column type
        ps.setNull(i + 1, sqlType(fields(i).dataType))
      } else fields(i).dataType match {
        case LongType => ps.setLong(i + 1, r.getLong(i))
        case IntegerType => ps.setInt(i + 1, r.getInt(i))
        case DoubleType => ps.setDouble(i + 1, r.getDouble(i))
        case BooleanType => ps.setBoolean(i + 1, r.getBoolean(i))
        case TimestampType => ps.setTimestamp(i + 1, r.getTimestamp(i))
        case _ => ps.setString(i + 1, String.valueOf(v))
      }
      i += 1
    }
  }

  private def exec(c: Connection, sql: String): Unit = {
    val st = c.createStatement()
    try st.execute(sql) finally st.close()
  }

  private def withConnection[T](url: String, props: Properties)(f: Connection => T): T = {
    val c = DriverManager.getConnection(url, props)
    try f(c) finally {
      // a failed statement can leave an aborted txn open (Derby refuses to
      // close then) — roll it back before closing
      try if (!c.getAutoCommit) c.rollback() catch { case _: java.sql.SQLException => }
      try c.rollback() catch { case _: java.sql.SQLException => }
      try c.close() catch { case _: java.sql.SQLException => }
    }
  }
}
