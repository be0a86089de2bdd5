package graft

import org.apache.spark.sql.functions._

/** Tables.spread (round 16) contract: repartition ONLY a scan-starved
  * DataFrame; a scan that already has at least half the session's
  * parallelism in input partitions comes back UNCHANGED — the at-scale
  * no-op guarantee the helper's 100 TB story rests on. */
class TablesSpreadSpec extends SparkSpec {

  test("starved single-row-group scan is spread to session parallelism") {
    val docs = Tables.load(spark, sf, "documents")
    assert(docs.rdd.getNumPartitions * 2 <=
      spark.sparkContext.defaultParallelism,
      "precondition: the testdata scan must be starved for this test")
    val out = Tables.spread(docs)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // round-robin spread must be row-preserving
    assert(out.count() == docs.count())
  }

  test("already-parallel input is returned unchanged (no added shuffle)") {
    val parallel = spark.range(1000)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("id"))
    val out = Tables.spread(parallel)
    assert(out eq parallel, "spread must be the identity on a healthy scan")
  }

  test("aggregation results are placement-independent under spread") {
    val docs = Tables.load(spark, sf, "documents")
    val a = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Tables.spread(docs).groupBy(col("source"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
