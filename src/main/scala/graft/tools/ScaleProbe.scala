package graft.tools

import org.apache.spark.sql.SparkSession

/** Run N store-free ER passes at a given core count and print each wall
  * time — the isolation harness for scaling-noise diagnosis.
  * Usage: runMain graft.tools.ScaleProbe <cores> <nClusters> [passes]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nClusters = args(1).toLong
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val partitions = args.lift(3).map(_.toInt).getOrElse(cores)
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.default.parallelism", partitions.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // measured unit = the north rule's (read table -> cluster); corpus is
    // materialized once, outside the timed region (matches graft.Bench)
    val corpusDir = graft.util.Scratch.unique("probe_corpus") + "/webpages"
    graft.sources.WebPagesGen.webpages(spark, nClusters)
      .repartition(48).write.mode("overwrite").parquet(corpusDir)
    (1 to passes).foreach { i =>
      val (docs, sec) = graft.pipeline.EntityResolution.runOnTable(spark, corpusDir)
      println(f"[scaleprobe] cores=$cores pass=$i docs=$docs sec=$sec%.2f")
    }
    spark.stop()
  }
}
