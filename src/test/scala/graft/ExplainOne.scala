package graft

/** One-off diagnostic (Test/runMain graft.ExplainOne <query> [sfDir]):
  * prints the formatted physical plan of one catalog query. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q25_ngram_jaccard")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkTestSession.spark
    val df = Queries.all(name)(spark, dir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
