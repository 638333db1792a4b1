package graft.operators

import scala.reflect.ClassTag

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD

/** Shared machinery for the engine's partitioner-reused iterative RDD
  * loops — [[ConnectedComponents]] (large-star/small-star rounds) and the
  * q53 PageRank loop grew the same hand-rolled idiom independently
  * (VERDICT r05 #4): a HashPartitioner sized to data volume, co-partitioned
  * zipPartitions hash-map lookup joins (measured 5-10× over RDD cogroup
  * joins, which churn ExternalAppendOnlyMap), and the
  * `preservesPartitioning` discipline.
  *
  * The discipline matters because the failure mode is SILENT: if a zip
  * output is keyed by a different column than the claimed partitioner
  * (e.g. dst-keyed contributions claiming the src-hash layout), a
  * downstream `reduceByKey(samePartitioner)` elides its shuffle and
  * mis-aggregates with no error — caught only by a value-level oracle.
  * [[lookupJoinSameKey]] therefore VALIDATES the claim per emitted row
  * (one hash + branch, on the claiming call sites only): a lie fails the
  * task loudly instead of corrupting the answer. [[IterativeLoopSpec]]
  * pins both directions — an honest claim preserves the partitioner and
  * the values; a dst-keyed lie throws.
  */
object IterativeLoop {

  /** Round-partitioner sizing by DATA VOLUME, not session width (the CC
    * rule, unified here per VERDICT r05 #8): one round task per
    * ~`rowsPerTask` rows, at least 1, capped by `maxWidth` (the session
    * width). At scale (rows ≫ maxWidth·rowsPerTask) this is the session
    * width — unchanged behavior; at catalog scale an O(log n) loop does
    * not pay a sea of empty 96-partition rounds whose scheduling latency
    * is pure serial floor (measured: most of the 307-doc pipeline's wall
    * time, and +35% on q53 at 96 vs 32). */
  def roundPartitioner(rows: Long, maxWidth: Int, rowsPerTask: Long): HashPartitioner =
    new HashPartitioner(
      math.max(1L, math.min(maxWidth.toLong, rows / rowsPerTask + 1L)).toInt)

  private def requireLayout(
      side: String, rdd: RDD[_], hp: HashPartitioner, keyed: Boolean): Unit = {
    // a pair RDD must CARRY the partitioner (plain co-numbered partitions
    // are not enough — values could be laid out by anything); a non-pair
    // big side (e.g. q53's (src,dst,deg) triples) cannot carry one, so the
    // caller vouches via the partition count, which zipPartitions enforces
    if (keyed)
      require(rdd.partitioner.contains(hp),
        s"$side side is not partitioned by the round partitioner " +
          s"(${rdd.partitioner} vs $hp)")
    else
      require(rdd.getNumPartitions == hp.numPartitions,
        s"$side side has ${rdd.getNumPartitions} partitions, " +
          s"round partitioner has ${hp.numPartitions}")
  }

  /** Co-partitioned hash-map lookup join whose output does NOT follow the
    * input key layout (e.g. PageRank contributions re-keyed by dst, star
    * rounds re-keyed by the neighbor): streams `big` through a
    * per-partition HashMap of `small`. The result claims NO partitioner —
    * the next keyed op pays its (semantically required) shuffle.
    *
    * `small` must be hp-partitioned with exactly one row per key (an
    * upstream reduceByKey(hp) output); `big` must be laid out by hp on
    * whatever key `f` looks up. */
  def lookupJoin[B: ClassTag, W, R: ClassTag](
      big: RDD[B], small: RDD[(Long, W)], hp: HashPartitioner)(
      f: (B, java.util.HashMap[Long, W]) => Iterator[R]): RDD[R] = {
    requireLayout("big", big, hp, keyed = big.partitioner.isDefined)
    requireLayout("small", small, hp, keyed = true)
    big.zipPartitions(small, preservesPartitioning = false) { (bIt, sIt) =>
      val m = new java.util.HashMap[Long, W]()
      sIt.foreach { case (k, w) => m.put(k, w) }
      bIt.flatMap(b => f(b, m))
    }
  }

  /** Like [[lookupJoin]] but the output rows stay keyed by the SAME hash
    * layout as the inputs (e.g. a per-node state update), so the result
    * CLAIMS hp and downstream same-partitioner ops skip their shuffle.
    * The claim is validated per emitted row: a key that does not hash to
    * the current partition fails the task — the partitioner-lie trap
    * surfaces as an error instead of a silent mis-aggregation. */
  def lookupJoinSameKey[B: ClassTag, W, V: ClassTag](
      big: RDD[B], small: RDD[(Long, W)], hp: HashPartitioner)(
      f: (B, java.util.HashMap[Long, W]) => Iterator[(Long, V)]): RDD[(Long, V)] = {
    requireLayout("big", big, hp, keyed = big.partitioner.isDefined)
    requireLayout("small", small, hp, keyed = true)
    // preservesPartitioning propagates the FIRST parent's partitioner, so
    // the claim requires big to be an hp-keyed pair RDD — the claiming
    // call sites are per-key state updates where it always is
    require(big.partitioner.contains(hp),
      "lookupJoinSameKey requires an hp-partitioned pair RDD as the big " +
        "side — a partitioner-less big side cannot carry the claim")
    big.zipPartitions(small, preservesPartitioning = true) { (bIt, sIt) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val m = new java.util.HashMap[Long, W]()
      sIt.foreach { case (k, w) => m.put(k, w) }
      bIt.flatMap(b => f(b, m)).map { kv =>
        if (hp.getPartition(kv._1) != pid)
          throw new IllegalStateException(
            s"partitioner lie: emitted key ${kv._1} belongs to partition " +
              s"${hp.getPartition(kv._1)}, not $pid — the output is not keyed " +
              "by the claimed layout; use lookupJoin (non-claiming) instead")
        kv
      }
    }
  }
}
