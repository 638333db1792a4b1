package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFeatures, MediaRow}

/** Multimodal plumbing: the decode is a marked stub, but schema, batch
  * shape, partitioning, null handling, and the frame-sample plan are real. */
class MultimodalSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def corpus(n: Int): Seq[MediaRow] = {
    val modalities = Seq("image", "audio", "video", "text")
    (0 until n).map { i =>
      MediaRow(i.toLong, modalities(i % 4),
        Array.tabulate(100 + i)(b => ((b * 31 + i) % 256 - 128).toByte))
    }
  }

  test("feature extraction is deterministic, typed, and total") {
    import spark.implicits._
    val rows = spark.createDataset(corpus(300)).repartition(7)
    val feats = Multimodal.extractFeatures(spark, rows).collect()
    assert(feats.length == 300)
    val byId = feats.map(f => f.id -> f).toMap
    assert(byId(0L).modality == "image" && byId(0L).width > 0 && byId(0L).durationMs == 0)
    assert(byId(1L).modality == "audio" && byId(1L).durationMs > 0 && byId(1L).width == 0)
    assert(byId(2L).modality == "video" && byId(2L).frameCount > 0)
    assert(byId(3L).modality == "text" && byId(3L).contentHash != 0)
    // deterministic across reruns and partitionings
    val again = Multimodal.extractFeatures(
      spark, spark.createDataset(corpus(300)).repartition(3)).collect()
    assert(feats.sortBy(_.id).toSeq == again.sortBy(_.id).toSeq)
  }

  test("null/empty bytes do not crash the batch path") {
    import spark.implicits._
    val rows = spark.createDataset(Seq(
      MediaRow(1L, "image", Array.empty[Byte]),
      MediaRow(2L, "audio", null)))
    val feats = Multimodal.extractFeatures(spark, rows).collect()
    assert(feats.map(_.byteLen).toSet == Set(0L))
    // md5 of the empty payload, for both empty and null bytes
    assert(feats.map(_.contentMd5).toSet == Set("d41d8cd98f00b204e9800998ecf8427e"))
  }

  test("frame-sample plan is evenly spaced within duration") {
    import spark.implicits._
    val feats = spark.createDataset(Seq(
      MediaFeatures(7L, "video", 10L, 1L, "d41d8cd9", 640, 360, 10000L, 20),
      MediaFeatures(8L, "image", 10L, 1L, "d41d8cd9", 640, 360, 0L, 0)))
    val plan = Multimodal.sampleFramePlan(spark, feats, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(plan.forall(_._1 == 7L)) // images excluded
    assert(plan.length == 4)
    assert(plan.map(_._3).toSeq.sorted == Seq(1250L, 3750L, 6250L, 8750L))
  }
}
