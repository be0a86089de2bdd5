package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** The signature operator: flatten nested repeated groups into
  * denormalized rows (SURVEY.md §2.4).
  *
  * Reference semantics (fileloader/fileloader-schema.go:297-363 JSON,
  * :377-510 XML), reproduced exactly:
  *   - one repeated group with k ≥ 1 elements → k rows, each = base ∪
  *     element; element fields OVERWRITE base fields on name collision
  *     (:332-339 nested-after-base copy);
  *   - k = 0 (or null) for every repeated group → 1 row of base fields
  *     unchanged (:113-116, :477-480);
  *   - multiple distinct repeated keys → UNION of per-array expansions,
  *     NOT a cross product (:316-344).
  *
  * Spark-first: each expansion is `filter(size>0) + explode` (narrow,
  * codegen'd, no shuffle); the all-empty base case is a disjoint filter;
  * the union is a zero-cost plan union. Catalyst prunes unused columns
  * through the explode.
  */
object Flatten {

  def apply(df: DataFrame): DataFrame = {
    val arrayFields = df.schema.fields.filter(_.dataType.isInstanceOf[ArrayType])
    if (arrayFields.isEmpty) return df
    val arrayNames = arrayFields.map(_.name).toSet
    val baseCols = df.schema.fieldNames.filterNot(arrayNames.contains)

    val expansions = arrayFields.map { f =>
      val nonEmpty = df.filter(coalesce(size(col(f.name)), lit(0)) > 0)
        .select(baseCols.map(col) :+ explode(col(f.name)).as("_elem"): _*)
      f.dataType.asInstanceOf[ArrayType].elementType match {
        case st: StructType =>
          val nested = st.fieldNames
          // overwrite-on-collision: keep base cols not shadowed by nested
          val kept = baseCols.filterNot(nested.contains)
          nonEmpty.select(kept.map(col) ++ nested.map(n => col(s"_elem.$n").as(n)): _*)
        case _ =>
          nonEmpty.withColumnRenamed("_elem", f.name)
      }
    }

    val allEmpty = arrayFields.map(f => coalesce(size(col(f.name)), lit(0)) <= 0)
      .reduce(_ && _)
    val baseRows = df.filter(allEmpty).select(baseCols.map(col): _*)

    (expansions :+ baseRows).reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
