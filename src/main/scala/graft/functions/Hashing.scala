package graft.functions

/** Deterministic 64-bit hashing primitives used for ids, blocking keys,
  * MinHash permutations and the synthetic generator's counter-based RNG.
  * Everything is a pure function of its inputs (no wall clock, no global
  * RNG) so every pipeline stage is replayable — required by the north
  * rule's checkpoint-resumability and by deterministic salting.
  */
object Hashing {

  /** splitmix64 finalizer — a well-known public-domain mixing function
    * (Steele et al., "Fast Splittable Pseudorandom Number Generators"). */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Combine an arbitrary number of longs into one 64-bit hash. */
  def hash64(parts: Long*): Long = {
    var h = 0x2545f4914f6cdd1dL
    parts.foreach { p => h = mix64(h ^ p) }
    h
  }

  /** 64-bit hash of a string (FNV-1a over UTF-8 bytes, then mixed). */
  def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** All Rabin-Karp `n`-gram polynomial hashes of `s`, winnowed to
    * `h % keepMod == 0` — the same per-gram
    * `((h * 257 + codepoint) % 2147483647)` fold the DuckDB oracle (and
    * q55's SQL mirror) spell out as nested `ascii(substring(...))`
    * arithmetic, so the two paths are value-identical by construction
    * (asserted per-document in GraftExpressionsSpec). One pass over the
    * codepoint array with primitive ops: the exploded-SQL form pays a
    * per-gram UTF8String substring (an O(position) codepoint scan when
    * the predicate pushdown inlines it below the projection) — measured
    * ~12 s for 5k docs at sf0.1 vs ~0.3 s for this expression. */
  def rollingFingerprints(s: String, n: Int, keepMod: Int): Array[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < n) return Array.emptyLongArray
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    val last = cps.length - n
    while (i <= last) {
      var h = cps(i).toLong
      var k = 1
      while (k < n) { h = (h * 257 + cps(i + k)) % 2147483647L; k += 1 }
      if (h % keepMod == 0) out += h
      i += 1
    }
    out.toArray
  }

  /** Deterministic uniform double in [0, 1) from a seed tuple. */
  def uniform(parts: Long*): Double =
    ((hash64(parts: _*) >>> 11).toDouble) / (1L << 53).toDouble

  /** Deterministic int in [0, n) from a seed tuple. */
  def uniformInt(n: Int, parts: Long*): Int = {
    require(n > 0)
    ((hash64(parts: _*) >>> 1) % n).toInt
  }
}
