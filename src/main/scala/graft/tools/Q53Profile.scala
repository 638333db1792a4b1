package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-by-phase wall profile of catalog q53 (integer PageRank) under the
  * bench catalog session shape, warm (3 passes). Mirrors Queries.q53's
  * exact phases so the round loop's cost structure is visible:
  * edges build / deg+links / 5 rounds / takeOrdered.
  * Usage: runMain graft.tools.Q53Profile [sfDir]
  */
object Q53Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q53] $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    (1 to 3).foreach { pass =>
      println(s"[q53] ---- pass $pass ----")
      val t0 = System.nanoTime()
      val pairs = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(
          (col("l_orderkey").cast("long") * 2).as("o"),
          (col("l_partkey").cast("long") * 2 + 1).as("p"))
      val n = 2L * graft.util.ParquetMeta.rowCount(spark, s"$dir/lineitem.parquet")
      val hp = graft.operators.IterativeLoop.roundPartitioner(
        n, spark.sparkContext.defaultParallelism, rowsPerTask = 32768L)
      println(s"[q53] partitions=${hp.numPartitions} directedEdges=$n")
      val edges = pairs.as[(Long, Long)].rdd
        .flatMap { case (o, p) => Iterator((o, p), (p, o)) }
        .partitionBy(hp)
        .mapPartitions({ it =>
          val seen = new java.util.HashSet[(Long, Long)]()
          it.filter(e => seen.add(e))
        }, preservesPartitioning = true)
      val deg = edges.mapValues(_ => 1L).reduceByKey(hp, _ + _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val links = graft.operators.IterativeLoop
        .lookupJoin(edges, deg, hp) { (e, dm) =>
          Iterator((e._1, e._2, dm.getOrDefault(e._1, 0L)))
        }
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      time("edges+deg+links")(links.count())
      // per-round persist so each round's count forces ONLY that round
      // (the real q53 runs the whole loop in one action; this isolates
      // per-round cost at the price of extra persists)
      var ranks = deg.mapValues(_ => 1000000L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      ranks.count()
      (1 to 5).foreach { r =>
        val prev = ranks
        time(s"round$r") {
          val sums = graft.operators.IterativeLoop
            .lookupJoin(links, prev, hp) { (l, rk) =>
              Iterator((l._2, rk.getOrDefault(l._1, 0L) / l._3))
            }
            .reduceByKey(hp, _ + _)
          ranks = graft.operators.IterativeLoop
            .lookupJoinSameKey(deg, sums, hp) { (dn, sm) =>
              Iterator((dn._1, 150000L + (850000L * sm.getOrDefault(dn._1, 0L)) / 1000000L))
            }
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
          ranks.count()
        }
        prev.unpersist(blocking = true)
      }
      time("takeOrdered") {
        ranks.takeOrdered(20)(Ordering.by { case (node, pr) => (-pr, node) })
      }
      links.unpersist(blocking = true)
      deg.unpersist(blocking = true)
      println(f"[q53] TOTAL            ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
