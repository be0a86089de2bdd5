package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic sample-record generator — parity with the reference's
  * `GenerateSampleRecords(count)` (util/utils.go:44-65), used to seed
  * tests and demos without fixture files. */
object SampleData {

  def generate(spark: SparkSession, count: Int): Dataset[MistAms] = {
    import spark.implicits._
    spark.range(count).map { i =>
      MistAms(
        user = s"user$i",
        dt_created = 1698412800L + i * 100,
        dt_submitted = 1698499200L + i * 100,
        ast_name = if (i % 5 == 4) None else Some(s"Asset${i % 7}"),
        location = if (i % 2 == 0) "HQ" else s"Branch${i % 3}",
        status = Seq("Pending", "Approved", "Rejected")((i % 3).toInt),
        json_hash = f"hash$i%05d",
        local_id = if (i % 4 == 3) None else Some(s"local$i"),
        filename = s"file$i.txt",
        fnumbers = (0L until (i % 3)).map(j =>
          FNumber(f"FN$i%04d-$j", s"2024-12-05T0$j:00:00Z")))
    }
  }
}
