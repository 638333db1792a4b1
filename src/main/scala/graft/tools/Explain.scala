package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for catalog queries — the iteration loop
  * for pushdown/broadcast/codegen checks. Usage:
  *   runMain graft.tools.Explain <sfDir> <queryName> [<queryName>...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else graft.Queries.all.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      graft.Queries.all(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
