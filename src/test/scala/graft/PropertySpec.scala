package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Hashing, HtmlExtract}
import graft.model.Mention
import graft.operators.{Blocking, PageProcessing}
import graft.sources.WebPagesGen

/** Seeded property sweeps (SURVEY §5 item 3). Deterministic generators via
  * counter-based hashing — reproducible without a ScalaCheck shrink cycle. */
class PropertySpec extends AnyFunSuite {

  private def randomMentions(trial: Int): Vector[Mention] = {
    val n = 5 + Hashing.uniformInt(40, 1L, trial)
    (0 until n).map { i =>
      val off = Hashing.uniformInt(300, 2L, trial, i)
      val len = 1 + Hashing.uniformInt(12, 3L, trial, i)
      Mention(s"e${i % 7}", "x" * len, None, off, "P", s"e${i % 7}")
    }.toVector
  }

  test("overlap suppression always yields a pairwise non-overlapping set") {
    for (trial <- 0 until 50) {
      val contexts = new PageProcessing.Contexts
      randomMentions(trial).foreach { m =>
        contexts.update(m.entity, contexts.getOrElse(m.entity, Vector.empty) :+ m)
      }
      val kept = PageProcessing.dropOverlappingMentions(contexts)
        .valuesIterator.flatten.toVector
      for (a <- kept; b <- kept if a != b) {
        assert(!PageProcessing.mentionOverlaps(Seq(a), b),
          s"trial $trial: $a overlaps $b")
      }
      // greedy keeps at least the first mention
      assert(kept.nonEmpty)
    }
  }

  test("fused ASCII token-hash path == reference composition (fold/tokenize/hash)") {
    val alphabets = Seq(
      "abcdefghij XYZ 0123456789 .,;!? \t\n", // pure ASCII incl. upper + punct
      "àéöüí ñ ç ß æ œ abc 42", // fold-range diacritics (slow path)
      "mixed ASCII täil 007 end-case") // mixed
    for (trial <- 0 until 200) {
      val alpha = alphabets(trial % alphabets.length)
      val len = Hashing.uniformInt(80, 7L, trial)
      val s = (0 until len)
        .map(i => alpha.charAt(Hashing.uniformInt(alpha.length, 8L, trial, i)))
        .mkString
      assert(Blocking.tokenHashesOf(s).toSeq == Blocking.tokenHashesSlow(s).toSeq,
        s"trial $trial drift on '$s'")
    }
    assert(Blocking.tokenHashesOf("").isEmpty)
    assert(Blocking.tokenHashesOf(null).isEmpty)
  }

  test("LongCountMap == java HashMap under random add storms (incl. 0 and MinValue keys)") {
    for (trial <- 0 until 20) {
      val m = new graft.functions.LongCountMap(16)
      val ref = new java.util.HashMap[Long, Long]()
      val n = 200 + Hashing.uniformInt(3000, 21L, trial)
      for (i <- 0 until n) {
        val key = Hashing.uniformInt(64, 22L, trial, i) match {
          case 0 => 0L
          case 1 => Long.MinValue
          case k => Hashing.hash64(23L, trial, k.toLong)
        }
        val delta = 1L + Hashing.uniformInt(5, 24L, trial, i)
        m.add(key, delta)
        ref.merge(key, delta, _ + _)
      }
      import scala.jdk.CollectionConverters._
      assert(m.iterator.toMap == ref.asScala.toMap, s"trial $trial")
    }
  }

  test("every cluster variant shares >=1 blocking key with its base (blocking recall)") {
    for (c <- 0L until 150L) {
      val docs = (0 until WebPagesGen.clusterSize(c)).map { v =>
        val p = WebPagesGen.genPage(c, v).page
        val html = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
        Blocking.ExtractedDoc(
          Blocking.docId(p.url), p.url,
          HtmlExtract.extractTitle(html), p.text, p.lang)
      }
      if (docs.length > 1) {
        def keys(d: Blocking.ExtractedDoc): Set[Long] = {
          val norm = graft.functions.TextFunctions.cleanEntity(d.title)
          val titleKey =
            if (norm.nonEmpty) Set(Hashing.hashString("title:" + norm)) else Set.empty[Long]
          titleKey // the guaranteed-shared family (LSH bands add recall)
        }
        val base = keys(docs.head)
        docs.tail.foreach { d =>
          assert(keys(d).intersect(base).nonEmpty, s"cluster $c variant ${d.url}")
        }
      }
    }
  }

  test("extraction is a pure function (100 random pages, double-extracted)") {
    for (trial <- 0 until 100) {
      val c = Hashing.uniformInt(5000, 7L, trial).toLong
      val v = Hashing.uniformInt(3, 8L, trial)
      if (v < WebPagesGen.clusterSize(c)) {
        val p1 = WebPagesGen.genPage(c, v).page
        val p2 = WebPagesGen.genPage(c, v).page
        assert(p1.url == p2.url)
        assert(java.util.Arrays.equals(p1.html, p2.html))
        assert(HtmlExtract.extractText(p1.html) == HtmlExtract.extractText(p2.html))
        assert(p1.text == HtmlExtract.extractText(p1.html))
      }
    }
  }

  test("matchAll offsets are valid, ordered, non-overlapping") {
    import graft.functions.TextFunctions.matchAll
    for (trial <- 0 until 80) {
      val alphabet = "abc"
      val len = 5 + Hashing.uniformInt(60, 20L, trial)
      val s = (0 until len)
        .map(i => alphabet(Hashing.uniformInt(3, 21L, trial, i))).mkString
      val patLen = 1 + Hashing.uniformInt(3, 22L, trial)
      val pat = (0 until patLen)
        .map(i => alphabet(Hashing.uniformInt(3, 23L, trial, i))).mkString
      val offs = matchAll(pat, s)
      assert(offs == offs.sorted)
      offs.foreach(o => assert(s.regionMatches(o, pat, 0, pat.length)))
      offs.sliding(2).foreach {
        case Seq(a, b) => assert(b >= a + pat.length) // non-overlapping
        case _ =>
      }
    }
  }

  test("asciiFold is total ASCII over every Hangul syllable + covered tables") {
    import graft.functions.TextFunctions.{asciiFold, foldResidue}
    // the ENTIRE 11,172-syllable Hangul block folds to non-empty ASCII
    var c = 0xac00
    while (c <= 0xd7a3) {
      val folded = asciiFold(c.toChar.toString)
      assert(folded.nonEmpty && folded.forall(_ < 128), s"U+${c.toHexString}")
      c += 1
    }
    // Greek/Cyrillic/Arabic/Hebrew letter ranges leave zero residue
    // (classical Arabic letters; 0x63b-0x640 are later extensions, uncovered)
    for (r <- Seq(0x0391 to 0x03c9, 0x0410 to 0x044f, 0x0621 to 0x063a, 0x0641 to 0x064a, 0x05d0 to 0x05ea);
         cp <- r if Character.isLetter(cp))
      assert(foldResidue(cp.toChar.toString) == 0, s"U+${cp.toHexString}")
    // BOTH kana blocks fold letterwise to ASCII, including the voiced
    // rows that NFD decomposes into base + combining voicing mark
    for (r <- Seq(0x3041 to 0x3096, 0x30a1 to 0x30f6); cp <- r) {
      val folded = asciiFold(cp.toChar.toString)
      assert(folded.nonEmpty && folded.forall(_ < 128), s"kana U+${cp.toHexString}")
    }
  }

  test("CJK fold coverage is bounded and its residue counter is exact") {
    import graft.functions.TextFunctions.{asciiFold, foldResidue}
    // the frequent-ideograph table folds to "Pinyin " (ASCII letters + one
    // trailing space), zero residue
    val covered = "的一是不了人中国國大来來上京东東北南海山水王市"
    covered.foreach { c =>
      val f = asciiFold(c.toString)
      assert(f.length >= 2 && f.last == ' ' && f.forall(_ < 128), s"U+${c.toInt.toHexString}")
      assert(foldResidue(c.toString) == 0)
    }
    // OUTSIDE the bounded table the passthrough must stay VISIBLE: the
    // residue counter equals exactly the number of uncovered ideographs —
    // a regression here (counter diluted or table silently shrunk) fails
    val rare = "麤鱻龘齉" // low-frequency ideographs, deliberately uncovered
    assert(foldResidue(rare) == rare.length)
    assert(foldResidue(covered + rare) == rare.length)
    // mixed CJK/Latin text: only the uncovered ideographs count
    assert(foldResidue(s"Tokyo 東京 $rare tower") == rare.length)
  }
}
