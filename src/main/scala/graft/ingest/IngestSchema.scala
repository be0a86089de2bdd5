package graft.ingest

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable
import org.apache.spark.sql.types._

/** The ingest schema system: externally-declared column whitelist,
  * dynamically-parsed data ("permissive parse, strict project").
  *
  * Mirrors the reference's schema sources:
  *   - Excel template row 3 = DB column names
  *     (reference: dbtransposer/dbtransposer-schema.go:160-200, invoked
  *     with ("db-template.xlsx","Sheet1","A3:K3",3) at main.go:65);
  *   - data-schema.json source-field→column rename map (declared but dead
  *     in the reference — see SURVEY.md §1.2; honored here as intent).
  *
  * The declared STRUCT fixes the JSON-number-fidelity hazard the Go code
  * has (epoch seconds decoded as float64): dt_created/dt_submitted are
  * LongType by schema (models/models.go:8-9, README DDL BIGINT).
  */
object IngestSchema {

  /** Raw pre-flatten record shape (models/models.go:6-25). */
  val raw: StructType = StructType(Seq(
    StructField("user", StringType),
    StructField("dt_created", LongType),
    StructField("dt_submitted", LongType),
    StructField("ast_name", StringType, nullable = true),
    StructField("location", StringType),
    StructField("status", StringType),
    StructField("json_hash", StringType),
    StructField("local_id", StringType, nullable = true),
    StructField("filename", StringType),
    StructField("fnumbers", ArrayType(StructType(Seq(
      StructField("fnumber", StringType),
      StructField("scan_time", StringType)))), nullable = true)))

  /** Flattened sink columns (db-template.xlsx row 3; README.md:85-97). */
  val sinkColumns: Seq[String] = Seq("user", "dt_created", "dt_submitted",
    "ast_name", "location", "status", "json_hash", "local_id", "filename",
    "fnumber", "scan_time")

  /** Flattened sink schema (post-explode row). */
  val flattened: StructType = StructType(
    raw.fields.dropRight(1) ++ Seq(
      StructField("fnumber", StringType),
      StructField("scan_time", StringType)))

  /** Raw schema with field names translated to SOURCE names via the
    * inverse of a source→column mapping (so a mapped read captures the
    * source-named fields, which [[JsonIngest.applyMapping]] then renames
    * back to sink columns). Array-of-struct inner fields translate too
    * (fNumber/scanTime in data-schema.json). */
  def sourceSchema(mapping: Map[String, String], base: StructType = raw): StructType = {
    if (mapping.isEmpty) return base
    val inv = mapping.map(_.swap)
    def rename(n: String): String = inv.getOrElse(n, n)
    StructType(base.fields.map { f =>
      f.dataType match {
        case ArrayType(st: StructType, n) =>
          f.copy(name = rename(f.name), dataType = ArrayType(
            StructType(st.fields.map(g => g.copy(name = rename(g.name)))), n))
        case _ => f.copy(name = rename(f.name))
      }
    })
  }

  /** Read column names from row `line` of an xlsx sheet — a dependency-free
    * xlsx reader (xlsx = zip of XML; shared strings + sheet parsed with
    * StAX). Driver-side only: schema acquisition is metadata, not data. */
  def columnsFromXlsx(path: String, sheet: String = "Sheet1", line: Int = 3): Seq[String] = {
    val zip = new ZipFile(path)
    try {
      val shared = readSharedStrings(zip)
      val in = zip.getInputStream(zip.getEntry(sheetPathFor(zip, sheet)))
      val rd = XMLInputFactory.newInstance().createXMLStreamReader(in)
      val out = mutable.ArrayBuffer[(Int, String)]()
      var inTargetRow = false
      var rowCounter = 0
      var cellCounter = 0
      var cellIdx = -1
      var cellType: String = null
      var inV = false
      val sb = new StringBuilder
      while (rd.hasNext) {
        rd.next() match {
          case XMLStreamConstants.START_ELEMENT => rd.getLocalName match {
            case "row" =>
              rowCounter += 1
              // honor the r attribute when present, fall back to ordinal
              val r = Option(rd.getAttributeValue(null, "r"))
                .map(_.toInt).getOrElse(rowCounter)
              inTargetRow = r == line
              cellCounter = 0
            case "c" if inTargetRow =>
              cellIdx = Option(rd.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(cellCounter)
              cellCounter += 1
              cellType = rd.getAttributeValue(null, "t")
            case "v" | "t" if inTargetRow => inV = true; sb.clear()
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS if inV => sb.append(rd.getText)
          case XMLStreamConstants.END_ELEMENT => rd.getLocalName match {
            case "v" | "t" if inTargetRow && inV =>
              inV = false
              val v = if (cellType == "s") shared(sb.toString.trim.toInt) else sb.toString
              if (v.nonEmpty && cellIdx >= 0) out += ((cellIdx, v))
              cellIdx = -1
            case _ =>
          }
          case _ =>
        }
      }
      rd.close()
      out.sortBy(_._1).map(_._2).toSeq
    } finally zip.close()
  }

  /** Resolve a sheet NAME to its worksheet zip entry via workbook.xml
    * (name → r:id) and workbook.xml.rels (r:id → target path). A
    * multi-sheet workbook thus reads the sheet asked for, not whichever
    * entry the zip happens to list last. Falls back to the first
    * worksheets/sheet*.xml entry when the lookup can't resolve (e.g.
    * our own minimal xlsx writer emits no workbook part). */
  private def sheetPathFor(zip: ZipFile, sheet: String): String = {
    def fallback: String = {
      val entry = zip.entries().asIterator()
      var p: String = "xl/worksheets/sheet1.xml"
      var found = false
      while (entry.hasNext && !found) {
        val e = entry.next()
        if (e.getName.matches("xl/worksheets/sheet\\d+\\.xml")) { p = e.getName; found = true }
      }
      p
    }
    val wb = zip.getEntry("xl/workbook.xml")
    val rels = zip.getEntry("xl/_rels/workbook.xml.rels")
    if (wb == null || rels == null) return fallback
    var rid: String = null
    val rd = XMLInputFactory.newInstance().createXMLStreamReader(zip.getInputStream(wb))
    while (rd.hasNext) {
      if (rd.next() == XMLStreamConstants.START_ELEMENT && rd.getLocalName == "sheet" &&
          rid == null && sheet.equalsIgnoreCase(rd.getAttributeValue(null, "name"))) {
        var i = 0
        while (i < rd.getAttributeCount) {
          if (rd.getAttributeLocalName(i) == "id") rid = rd.getAttributeValue(i)
          i += 1
        }
      }
    }
    rd.close()
    if (rid == null) return fallback
    var target: String = null
    val rr = XMLInputFactory.newInstance().createXMLStreamReader(zip.getInputStream(rels))
    while (rr.hasNext) {
      if (rr.next() == XMLStreamConstants.START_ELEMENT &&
          rr.getLocalName == "Relationship" && rid == rr.getAttributeValue(null, "Id"))
        target = rr.getAttributeValue(null, "Target")
    }
    rr.close()
    if (target == null) fallback
    else if (target.startsWith("/")) target.substring(1)
    else "xl/" + target
  }

  private def readSharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val e = zip.getEntry("xl/sharedStrings.xml")
    if (e == null) return IndexedSeq.empty
    val rd = XMLInputFactory.newInstance().createXMLStreamReader(zip.getInputStream(e))
    val out = mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var inSi = false
    while (rd.hasNext) {
      rd.next() match {
        case XMLStreamConstants.START_ELEMENT if rd.getLocalName == "si" =>
          inSi = true; sb.clear()
        case XMLStreamConstants.CHARACTERS if inSi => sb.append(rd.getText)
        case XMLStreamConstants.END_ELEMENT if rd.getLocalName == "si" =>
          inSi = false; out += sb.toString
        case _ =>
      }
    }
    rd.close()
    out.toIndexedSeq
  }

  /** "A3" → 0, "K3" → 10. */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  /** Load the source-field→column mapping (data-schema.json intent: the
    * reference declares it for model "Record" but never reads it —
    * SURVEY.md §1.2; we honor it as a rename map). */
  def mappingFromJson(path: String, model: String): Map[String, String] = {
    val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    // dependency-free parse of the flat {model: {from: to, ...}} shape
    val modelBlock = ("\"" + java.util.regex.Pattern.quote(model) + "\"\\s*:\\s*\\{([^}]*)\\}").r
    modelBlock.findFirstMatchIn(txt).map { m =>
      val pair = "\"([^\"]+)\"\\s*:\\s*\"([^\"]+)\"".r
      pair.findAllMatchIn(m.group(1)).map(p => p.group(1) -> p.group(2)).toMap
    }.getOrElse(Map.empty)
  }
}
