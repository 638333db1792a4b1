package graft.functions

/** MD5-derived 32-bit hashing shared bit-for-bit with the DuckDB oracle.
  *
  * The production sketches (Blocking/Similarity) hash with splitmix64-class
  * mixers no SQL engine reproduces, so their catalog queries could only get
  * rows-only checks. This object defines a hash family BOTH engines
  * evaluate identically — `h32(s)` = the first 8 hex chars of `md5(s)`
  * parsed as an integer (DuckDB: `('0x' || substring(md5(s),1,8))::BIGINT`)
  * — which gives the MinHash / SimHash / sign-LSH *algorithms* real
  * value-level oracles (catalog q25/q27/q28/q34) with the hash function
  * swapped in, while production paths keep the fast mixers.
  *
  * All arithmetic stays in [0, 2^32) with multipliers < 2^31, so every
  * intermediate fits a signed 64-bit integer in both engines (DuckDB
  * raises on BIGINT overflow — nothing may wrap).
  */
object OracleHash {

  /** Hash-value modulus: results live in [0, 2^32). */
  val Mod: Long = 1L << 32

  /** Polynomial multiplier for band-key folding (prime, < 2^20 so
    * key*mult < 2^52 never overflows). */
  val BandMult: Long = 1000003L

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 bytes (8 hex chars) of md5(s), big-endian, in [0, 2^32). */
  def h32(s: String): Long = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
      ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
  }

  /** Affine MinHash multiplier for permutation p: odd, < 2^31. */
  def minHashA(p: Int): Long = (h32(s"minhash-a:$p") % (1L << 30)) * 2 + 1

  /** Affine MinHash offset for permutation p: < 2^32. */
  def minHashB(p: Int): Long = h32(s"minhash-b:$p")

  /** ±1 hyperplane sign for (plane, dim) — md5 parity. */
  def planeSign(p: Int, d: Int): Long =
    if (h32(s"plane:$p:$d") % 2 == 0) 1L else -1L

  /** The DuckDB expression equivalent to [[h32]], for oracle-SQL authoring
    * (kept next to the Scala so they can't drift). */
  def sqlH32(expr: String): String =
    s"(('0x' || substring(md5($expr), 1, 8))::BIGINT)"
}
