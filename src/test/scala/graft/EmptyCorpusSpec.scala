package graft

/** Degenerate-input gate: EVERY registered query must run (not throw)
  * against an empty-but-schema'd corpus — the "empty partition day" a
  * 100 TB pipeline hits whenever a source goes quiet. Before this gate
  * six operators crashed on empty input (null bloom buffers, zero-seed
  * k-means building a malformed zero-arm array_min, a null-maxima
  * z-layout); each now degrades to an empty result of the right shape.
  * Index-building ops return empty assignments/search results rather
  * than erroring: empty-in → empty-out composes in a pipeline where a
  * loud failure on a quiet day does not. */
class EmptyCorpusSpec extends SparkSpec {

  test("every registered query runs on an empty corpus") {
    val d = java.nio.file.Files.createTempDirectory("graft_empty").toString
    Tables.all.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    val failed = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, d).collect(); None }
        catch {
          case e: Throwable => Some(name -> (e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString))
        }
    }
    assert(failed.isEmpty,
      s"${failed.length} queries crash on an empty corpus:\n" +
        failed.map { case (n, m) => s"  $n -> $m" }.mkString("\n"))
  }
}
