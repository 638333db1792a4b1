package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual catalog queries under the Bench catalog session
  * (same configs: Kryo, AQE on, 3x shuffle partitions, vectored parquet
  * IO off), printing every pass — the per-query iteration loop Bench's
  * min-of-2 summary is too coarse for. Usage:
  *   SPARK_GRAFT_SF_DIR=... runMain graft.tools.QTime q53_pagerank [q54_...] [passes]
  * A trailing integer argument sets the pass count (default 3).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val (names, passes) = args.lastOption.flatMap(_.toIntOption) match {
      case Some(n) => (args.dropRight(1).toSeq, n)
      case None => (args.toSeq, 3)
    }
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .appName("graft-qtime")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (3 * cpus).toString)
      .config("spark.default.parallelism", (3 * cpus).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val q = graft.Queries.all.getOrElse(name,
        sys.error(s"unknown query $name; known: ${graft.Queries.all.keys.toSeq.sorted.mkString(", ")}"))
      for (p <- 1 to passes) {
        val t0 = System.nanoTime()
        val n = q(spark, sfDir).count()
        println(f"[qtime] $name pass $p: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
