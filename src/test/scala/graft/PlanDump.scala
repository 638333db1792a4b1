package graft

/** One-off diagnostic (Test/runMain graft.PlanDump <outDir> <suffix>
  * [sfDir] [q1,q2,...]): writes each catalog query's
  * `.explain("formatted")` output to `<outDir>/<query>_<suffix>.txt` —
  * the plan artifacts OPTIMIZATION_r07.md's before/after claims are
  * checked against. Defaults to every catalog query at sf0.01. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r07")
    val suffix = args.lift(1).getOrElse("after")
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.01")
    val names = args.lift(3)
      .map(_.split(",").toSeq)
      .getOrElse(Queries.all.keys.toSeq)
      .sorted
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = SparkTestSession.spark
    names.foreach { name =>
      try {
        val df = Queries.all(name)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote $name")
      } catch {
        case e: Throwable => println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
