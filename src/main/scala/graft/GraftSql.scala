package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-first facade: the engine's query surface through `spark.sql`.
  *
  * Registers every testdata table as a temp view plus every custom SQL
  * function (`vec_dot`, `minhash_sig`, `shingle_hashes`,
  * `char_gram_hashes`, `simhash64`, `winnow_fingerprint`,
  * `char_entropy` — see functions.Registry), so a user can drive the
  * full engine with plain SQL — the reference's whole query surface
  * (and more) without touching the DataFrame API.
  */
object GraftSql {

  def createViews(spark: SparkSession, sfDir: String): Unit = {
    Tables.all.foreach { n =>
      Tables.load(spark, sfDir, n).createOrReplaceTempView(n)
    }
    graft.functions.Registry.register(spark)
  }

  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    createViews(spark, sfDir)
    spark.sql(query)
  }
}
