package graft

import org.apache.spark.sql.SparkSession

/** Extra (non-frozen) benchmark: noop-sink isolation per optimization
  * guide §1.4 — times each named catalog query by computing EVERY column
  * of every row into the built-in noop data source, so the measurement
  * is the computation, not the sink or a count-pruned subtree. The
  * frozen driver bench (graft.Bench) is untouched; this main exists for
  * OPTIMIZATION_r07.md's isolation numbers.
  *
  *   runMain graft.BenchExtra [q1,q2,... | all] [passes] [sfDir]
  *
  * Prints one line per query: min + all passes (same min-of-k estimator
  * as the frozen bench, default 3 passes), plus a total line.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.filterNot(_ == "all")
      .map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val passes = args.lift(1).getOrElse("3").toInt
    val dir = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (3 * cpus).toString)
      .config("spark.default.parallelism", (3 * cpus).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mins = names.map { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"noop:$name")
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(null)
      println(f"[benchextra] $name%-28s min ${ts.min}%6.3f  " +
        ts.map(t => f"$t%5.3f").mkString("[", ",", "]"))
      ts.min
    }
    println(f"[benchextra] TOTAL(min) ${mins.sum}%.3f s over ${names.size} queries")
    spark.stop()
  }
}
