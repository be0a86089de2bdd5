package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The persisted IVF index must (a) return the same results as the inline
  * assign-per-run formulation and (b) actually prune: a probe's parquet
  * scan over the index reads only the probed cells' partitions, not the
  * whole table. */
class IvfIndexSpec extends SparkSpec {

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
    case _ => p +: p.children.flatMap(walk)
  }

  private def emb = graft.Tables.load(spark, sf, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("probe scans only the probed cells' partitions") {
    val index = IvfIndex.builtFor(spark, sf)
    val out = IvfIndex.probe(spark, index, emb.filter(col("vec_id") < 10))
    val scans = walk(out.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(index.dir)) => f
    }
    assert(scans.nonEmpty, "no parquet scan over the index dir in the probe plan")
    val selected = scans.map(_.selectedPartitions.partitionCount).max
    // 10 queries x nprobe 3 gives at most 30 (deduped, usually ~6-10)
    // probed cells out of k=20; the scan must not touch all k partitions
    assert(selected < index.k,
      s"probe scan touches $selected of ${index.k} cells — no partition pruning")
    val totalCells = spark.read.parquet(index.dir)
      .select(col("c_id")).distinct().count()
    assert(selected < totalCells,
      s"probe reads every populated cell ($selected of $totalCells)")
  }

  test("append adds new vectors to their cells without rebuilding; probes see them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_append").toString
    val first = emb.filter(col("vec_id") % 2 === 0)
    val second = emb.filter(col("vec_id") % 2 === 1)
    val index = IvfIndex.build(spark, first, dir)
    IvfIndex.append(spark, index, second)
    // the index now holds the full corpus, assigned with the ORIGINAL
    // centroids (no retrain — posting lists stay valid)
    assert(spark.read.parquet(index.dir).count() == emb.count())
    val out = IvfIndex.probe(spark, index, emb.filter(col("vec_id") < 10))
    assert(out.filter(col("vec_id") % 2 === 1).count() > 0,
      "probe never sees the appended vectors")
  }

  test("persisted-index probe equals the inline assign-per-run formulation") {
    val index = IvfIndex.builtFor(spark, sf)
    val persisted = IvfIndex.probe(spark, index, emb.filter(col("vec_id") < 10))
    // the pre-index ss03 shape: assign the full table inline, same
    // (integer) centroids, same candidate semantics
    val cells = Similarity.quantize(emb)
      .select(col("vec_id"), col("embedding"),
        Similarity.int8Assign(index.centroids).getField("cid").as("c_id"))
    val probes = Similarity.quantize(emb.filter(col("vec_id") < 10))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        explode(Similarity.nearestCellsInt8(index.centroids, 3)).as("cell"))
      .select(col("q_id"), col("q_vec"), col("cell.cid").as("c_id"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    val inline = cells.join(probes, Seq("c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_vec"), col("vec_id"), col("embedding"))
      .distinct()
      .withColumn("cos", graft.functions.VectorOps.cosine(col("embedding"), col("q_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank"))
    assert(persisted.exceptAll(inline).isEmpty && inline.exceptAll(persisted).isEmpty,
      "persisted-index probe diverged from the inline formulation")
  }
}
