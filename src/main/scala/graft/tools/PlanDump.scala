package graft.tools

import org.apache.spark.sql.SparkSession

/** Print compact physical plans for selected catalog queries (plan-pin
  * authoring aid). Usage: runMain graft.tools.PlanDump q55_fingerprint ... */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("plan").master("local[4]")
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- args) {
      println(s"[plan] ===== $name =====")
      val p = graft.Queries.all(name)(spark, dir).queryExecution.sparkPlan
      p.toString.split("\n").foreach(l => println("[plan] " + l.take(160)))
    }
    spark.stop()
  }
}
