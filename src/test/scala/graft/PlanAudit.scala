package graft

/** One-off diagnostic (run via Test/runMain graft.PlanAudit): prints which
  * catalog queries contain plan shapes the guard spec polices. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "BNLJ" -> p.contains("BroadcastNestedLoopJoin"),
          "SinglePartition" -> p.contains("Exchange SinglePartition"),
          "BroadcastHashJoin" -> p.contains("BroadcastHashJoin")
        ).collect { case (f, true) => f }
        println(s"$name: ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"$name: ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
