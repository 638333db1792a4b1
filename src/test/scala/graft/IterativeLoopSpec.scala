package graft

import org.apache.spark.{HashPartitioner, SparkException}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IterativeLoop

/** The shared iterative-loop machinery (VERDICT r05 #4), and above all the
  * PARTITIONER-LIE TRAP: a zipPartitions output keyed differently from the
  * claimed layout makes a downstream reduceByKey(samePartitioner) elide
  * its shuffle and silently mis-aggregate — no error, caught historically
  * only by the DuckDB value oracle. lookupJoinSameKey validates the claim
  * per emitted row, so this spec pins that a dst-keyed output claiming the
  * src partitioner FAILS the job loudly. */
class IterativeLoopSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val sc = spark.sparkContext

  test("roundPartitioner sizes by volume, bounded by [1, session width]") {
    assert(IterativeLoop.roundPartitioner(0L, 96, 8192L).numPartitions == 1)
    assert(IterativeLoop.roundPartitioner(20000L, 96, 8192L).numPartitions == 3)
    assert(IterativeLoop.roundPartitioner(Long.MaxValue / 2, 96, 8192L).numPartitions == 96)
    assert(IterativeLoop.roundPartitioner(1200000L, 96, 32768L).numPartitions == 37)
  }

  // a tiny graph state: node -> value, plus (src, dst) links laid out by src
  private def fixture(hp: HashPartitioner) = {
    val state = sc.parallelize((1L to 40L).map(n => (n, n * 10L))).partitionBy(hp)
    val links = sc.parallelize((1L to 40L).map(n => (n, 41L - n))).partitionBy(hp)
    (state, links)
  }

  test("lookupJoin: non-claiming output + reduceByKey matches a plain join") {
    val hp = new HashPartitioner(4)
    val (state, links) = fixture(hp)
    val got = IterativeLoop.lookupJoin(links, state, hp) { case ((src, dst), m) =>
      Iterator((dst, m.getOrDefault(src, 0L)))
    }.reduceByKey(_ + _).collect().toMap
    val want = links.join(state).map { case (_, (dst, v)) => (dst, v) }
      .reduceByKey(_ + _).collect().toMap
    assert(got == want)
    assert(got(40L) == 10L) // dst 40 <- src 1, value 10
  }

  test("lookupJoinSameKey: honest claim keeps the partitioner and the values") {
    val hp = new HashPartitioner(4)
    val (state, links) = fixture(hp)
    val delta = links.reduceByKey(hp, (a: Long, b: Long) => math.max(a, b)) // one row per key, hp-laid
    val updated = IterativeLoop.lookupJoinSameKey(state, delta, hp) {
      case ((n, v), m) => Iterator((n, v + m.getOrDefault(n, 0L)))
    }
    assert(updated.partitioner.contains(hp),
      "honest same-key output must carry the claimed partitioner")
    // downstream same-partitioner reduce elides its shuffle AND is correct
    val got = updated.reduceByKey(hp, _ + _).collect().toMap
    assert(got == (1L to 40L).map(n => (n, n * 10L + (41L - n))).toMap)
  }

  test("TRAP: a dst-keyed output claiming the src partitioner fails loudly") {
    val hp = new HashPartitioner(4)
    val (state, links) = fixture(hp)
    val delta = links.reduceByKey(hp, (a: Long, b: Long) => math.max(a, b))
    // the lie: emit rows keyed by the VALUE (dst-style re-key) while the
    // helper claims the src layout — without validation a downstream
    // reduceByKey(hp) would elide its shuffle and mis-aggregate silently
    val lying = IterativeLoop.lookupJoinSameKey(state, delta, hp) {
      case ((n, v), _) => Iterator((v, n)) // keyed by v: wrong layout
    }
    val e = intercept[SparkException] { lying.count() }
    def chain(t: Throwable): List[Throwable] =
      Option(t).map(x => x :: chain(x.getCause)).getOrElse(Nil)
    assert(chain(e).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("partitioner lie")),
      s"expected the partitioner-lie failure, got: $e")
  }

  test("layout preconditions are rejected up front") {
    val hp = new HashPartitioner(4)
    val (state, _) = fixture(hp)
    val unpartitioned = sc.parallelize(Seq((1L, 2L)), 4) // right width, no partitioner
    intercept[IllegalArgumentException] {
      IterativeLoop.lookupJoin(state, unpartitioned, hp)((_, _) => Iterator.empty[Long])
    }
    intercept[IllegalArgumentException] {
      IterativeLoop.lookupJoinSameKey(unpartitioned, state, hp)((kv, _) => Iterator(kv))
    }
  }
}
