package graft.functions

/** Minimal open-addressing Long→Long count map (linear probing, power-of-2
  * capacity, no boxing) for per-partition pre-aggregation in hot paths —
  * the map-side combine done in plain primitive arrays instead of
  * per-row Tungsten encoding. Key 0 is handled via a separate slot. */
final class LongCountMap(initialCapacity: Int = 1 << 12) {
  private var cap = Integer.highestOneBit(math.max(16, initialCapacity - 1)) << 1
  private var mask = cap - 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[Long](cap)
  private var used = 0
  private var zeroCount = 0L // key == 0 sentinel slot

  def add(key: Long, delta: Long): Unit = {
    if (key == 0L) { zeroCount += delta; return }
    var i = (Hashing.mix64(key) & mask).toInt
    while (true) {
      val k = keys(i)
      if (k == key) { vals(i) += delta; return }
      if (k == 0L) {
        keys(i) = key; vals(i) = delta
        used += 1
        if (used * 4 > cap * 3) grow()
        return
      }
      i = (i + 1) & mask
    }
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals
    cap <<= 1; mask = cap - 1
    keys = new Array[Long](cap); vals = new Array[Long](cap)
    used = 0
    var i = 0
    while (i < ok.length) {
      if (ok(i) != 0L) add(ok(i), ov(i))
      i += 1
    }
  }

  /** Iterate (key, count) pairs, including the zero key if counted. */
  def iterator: Iterator[(Long, Long)] = {
    val base = keys.indices.iterator.filter(i => keys(i) != 0L)
      .map(i => (keys(i), vals(i)))
    if (zeroCount != 0L) base ++ Iterator((0L, zeroCount)) else base
  }
}
