package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  // events.parquet is TIMESTAMP(NANOS) — must load via Tables.load
  private def events = graft.Tables.load(spark, sf, "events")
    .select(col("user_id"), col("event_id"))
  private def cust = spark.read.parquet(s"$sf/customer.parquet")
    .select(col("c_custkey"), col("c_nationkey"))

  test("saltedJoin equals the plain inner join row-for-row") {
    val salted = Skew.saltedJoin(events, cust,
        col("user_id") === col("c_custkey"), saltBy = col("event_id"), salts = 8)
      .select("event_id", "user_id", "c_nationkey")
    val plain = events.join(cust, col("user_id") === col("c_custkey"))
      .select("event_id", "user_id", "c_nationkey")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin spreads a key across salt partitions and drops the salt column") {
    val out = Skew.saltedJoin(events, cust,
      col("user_id") === col("c_custkey"), saltBy = col("event_id"), salts = 4)
    assert(!out.columns.exists(_.contains("salt")), out.columns.mkString(","))
    // the physical join key must include the salt: with 4 salts and a
    // high-cardinality saltBy, one user's rows hash to >1 salt value
    val salts = events.filter(col("user_id") === events
        .groupBy("user_id").count().orderBy(col("count").desc)
        .first().getLong(0))
      .withColumn("s", pmod(xxhash64(col("event_id")), lit(4)))
      .select("s").distinct().count()
    assert(salts > 1, s"hot user landed on $salts salt(s)")
  }
}
