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
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.default.parallelism", partitions.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to passes).foreach { i =>
      val (docs, sec) = graft.pipeline.EntityResolution.runOnce(spark, nClusters)
      println(f"[scaleprobe] cores=$cores pass=$i docs=$docs sec=$sec%.2f")
    }
    spark.stop()
  }
}
