package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query repeat timer under the EXACT bench catalog session shape
  * (local[32], 96 shuffle partitions, AQE on, Kryo, vectored IO off):
  *   runMain graft.tools.QTime <q1,q2,...> [passes] [sfDir]
  * Prints each pass and the min — the bench's min-of-k estimator with
  * more k, for isolating a query's warm floor from window noise. */
object QTime {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q53_pagerank").split(",").toSeq
    val passes = args.lift(1).getOrElse("4").toInt
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "96")
      .config("spark.default.parallelism", "96")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qtime] $name%-28s min ${ts.min}%6.3f  " +
        ts.map(t => f"$t%5.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
