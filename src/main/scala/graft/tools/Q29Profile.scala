package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-by-stage wall profile of catalog q29 (the 300-doc end-to-end ER
  * query) under the EXACT bench catalog session config (local[32], 96
  * shuffle partitions, AQE on) — the measurement loop behind the q29
  * fixed-cost trims. Two passes so JIT/first-touch cost is visible.
  * Usage: runMain graft.tools.Q29Profile
  */
object Q29Profile {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
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
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q29] $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    (1 to 2).foreach { pass =>
      println(s"[q29] ---- pass $pass ----")
      val total0 = System.nanoTime()
      val pages = graft.sources.WebPagesGen.webpages(spark, 150L, numPartitions = 8)
      val extracted = graft.pipeline.EntityResolution.extract(spark, pages)
      val featsDir = graft.util.Scratch.dir(s"q29p_feats$pass")
      time("features+write") {
        graft.operators.Blocking.features(spark, extracted)
          .write.mode("overwrite").parquet(featsDir)
      }
      val feats = spark.read.parquet(featsDir)
        .as[graft.operators.Blocking.DocFeatures]
      val blocks = graft.operators.Blocking.blockEntries(spark, feats)
      val pairs = time("pairs") {
        val p = graft.operators.Blocking.candidatePairs(spark, blocks, persistSizes = false).pairs
        p.count(); p
      }
      val scored = graft.operators.PairScoring.score(spark, pairs, feats)
      val edges = time("score") {
        val e = scored.where(col("isDuplicate"))
          .select(col("src"), col("dst")).as[graft.model.Edge]
        e.count(); e
      }
      val assigned = time("cc") {
        graft.operators.ConnectedComponents.assign(
          spark, edges, feats.select(col("id")), dedupEdges = false)
      }
      time("final") {
        feats.select(col("id"), col("url")).join(assigned, "id")
          .withColumn("canonical", min("url").over(Window.partitionBy("comp")))
          .select(col("url"), col("canonical"))
          .orderBy("url")
          .count()
      }
      println(f"[q29] TOTAL          ${(System.nanoTime() - total0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}

/** Times q29 exactly as the bench does: one count() per pass in a warm
  * catalog-shaped session. Usage: runMain graft.tools.Q29Bench [passes] */
object Q29Bench {
  def main(args: Array[String]): Unit = {
    val passes = args.headOption.getOrElse("4").toInt
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "96")
      .config("spark.default.parallelism", "96")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries("q29_er_clusters")
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      q(spark, "/root/testdata/sf0.1")
      println(f"[q29bench] pass $i build-only ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      val t1 = System.nanoTime()
      q(spark, "/root/testdata/sf0.1").count()
      println(f"[q29bench] pass $i count      ${(System.nanoTime() - t1) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}

/** Isolates q29's post-build cost: builds once, counts the SAME DataFrame
  * three times. Usage: runMain graft.tools.Q29Tail */
object Q29Tail {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "96")
      .config("spark.default.parallelism", "96")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries("q29_er_clusters")
    q(spark, "x").count() // warm everything
    val df = q(spark, "x")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      df.count()
      println(f"[q29tail] count $i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
