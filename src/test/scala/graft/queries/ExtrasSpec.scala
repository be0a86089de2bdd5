package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtrasSpec extends SparkSpec {

  test("q19b approx percentiles within 10% of exact q19") {
    val exact = Extras.queries("q19_quantity_percentiles")(spark, sf)
      .select(col("l_returnflag"), col("p50"), col("p90")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Extras.queries("q19b_approx_percentiles")(spark, sf)
      .select(col("l_returnflag"), col("p50_approx"), col("p90_approx")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (p50, p90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - p50) / p50 <= 0.10, s"$k p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 <= 0.10, s"$k p90: $a90 vs $p90")
    }
  }
}
