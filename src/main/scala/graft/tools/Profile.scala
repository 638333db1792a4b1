package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Stage-by-stage wall-time profile of the ER pipeline (each stage forced
  * with a count) — the measurement loop behind the partitioning/scaling
  * decisions recorded in BASELINE.md. Usage:
  *   runMain graft.tools.Profile <cores> <nClusters>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("16").toInt
    val nClusters = args.lift(1).getOrElse("30000").toLong
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val pages = graft.sources.WebPagesGen.webpages(spark, nClusters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("generate")(pages.count())
    val extracted = graft.pipeline.EntityResolution.extract(spark, pages)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("extract")(extracted.count())
    val feats = time("features") {
      val f = graft.operators.Blocking.features(spark, extracted,
        onTruncation = n => println(s"[profile] idfTruncatedTokens=$n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      f.count()
      f
    }
    val blocks = time("blocks") {
      val b = graft.operators.Blocking.blockEntries(spark, feats)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      b.count()
      b
    }
    // fold-coverage observability: how many code units survive asciiFold
    // non-ASCII across the corpus (0 = every script folded; >0 quantifies
    // the documented CJK/Arabic/Indic passthrough vs unidecode's total
    // transliteration)
    val residue = extracted.map(doc =>
      graft.functions.TextFunctions.foldResidue(doc.title) +
        graft.functions.TextFunctions.foldResidue(doc.text))
      .reduce(_ + _)
    println(s"[profile] asciiFoldResidueChars=$residue")
    val pairs = time("pairs") {
      val gen = graft.operators.Blocking.candidatePairs(spark, blocks)
      val pp = gen.pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[profile] numPairs=${pp.count()} hotBlocksDropped=${gen.hotBlocks()}")
      gen.release()
      pp
    }
    val scored = time("score") {
      val sc = graft.operators.PairScoring.score(spark, pairs, feats)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sc.count()
      sc
    }
    time("cluster") {
      val edges = scored.where(col("isDuplicate"))
        .select(col("src"), col("dst")).as[graft.model.Edge]
      graft.operators.ConnectedComponents.assign(spark, edges, feats.select(col("id"))).count()
    }
    spark.stop()
  }
}
