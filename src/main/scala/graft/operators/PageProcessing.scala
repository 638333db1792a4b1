package graft.operators

import scala.collection.mutable

import graft.functions.TextFunctions._
import graft.model._

/** Per-page mention extraction — the pure core of the reference's
  * `process_page` (/root/reference/src/process_pages.py:197-209), including
  * cleaning (data_cleaners.py), link-context extraction, the exact-match
  * heuristics, and greedy overlap suppression.
  *
  * Everything here is a pure function of (page, redirects lookup), which is
  * what makes it a correct unit of per-partition parallelism: the Dataset
  * layer simply maps it over pages. Ordering semantics are load-bearing —
  * the greedy overlap suppression walks mentions in entity-insertion-major
  * order (process_pages.py:173-188), pinned by the parade goldens — so the
  * internal accumulator is an insertion-ordered multimap.
  */
object PageProcessing {

  type Contexts = mutable.LinkedHashMap[String, Vector[Mention]]

  /** /root/reference/src/process_pages.py:9-17 */
  def isValidPage(page: Page): Boolean = {
    val hasContent = page.plaintext != null && page.plaintext.trim.length > 5
    hasContent && page.title != null && !titleHasInvalidFlag(page.title)
  }

  /** /root/reference/src/process_pages.py:19-29 — requires a target page,
    * rejects image targets/anchors. */
  def isValidLink(link: Link): Boolean = link.page match {
    case None => false
    case Some(p) =>
      !textHasImageFlag(p) && link.text.forall(t => !textHasImageFlag(t))
  }

  /** /root/reference/src/data_cleaners.py:16-24 — validity of a cleaned
    * link against its cleaned sentence. */
  private def cleanedLinkIsValid(sentenceText: String, link: Link): Boolean = {
    val textInPage = link.text.exists(t => sentenceText.contains(t))
    val pageInPage = link.page.exists(p => sentenceText.contains(p))
    val mentionInPage = textInPage || (pageInPage && link.text.isEmpty)
    val mentionBlank = link.text.exists(_.trim.isEmpty)
    val pageBlank = link.page.exists(_.trim.isEmpty)
    !pageBlank && !mentionBlank && mentionInPage
  }

  /** /root/reference/src/data_cleaners.py:26-39 — anchor text gets the same
    * cleaning as page text (then strip); target page is stripped. */
  private def cleanLink(link: Link): Link =
    Link(
      page = link.page.map(_.trim),
      text = link.text.map(t => cleanPageContent(t).trim))

  /** /root/reference/src/data_cleaners.py:41-59 */
  def cleanSentence(sentence: Sentence): Sentence = {
    val cleanedText = cleanPageContent(sentence.text)
    val cleanedLinks = sentence.links.map { links =>
      links.iterator.flatMap { link =>
        if (link.text.isEmpty && link.page.isEmpty) Iterator.empty
        else {
          val cleaned = cleanLink(link)
          if (cleanedLinkIsValid(cleanedText, cleaned)) Iterator.single(cleaned)
          else Iterator.empty
        }
      }.toVector
    }
    Sentence(cleanedText, cleanedLinks)
  }

  /** /root/reference/src/data_cleaners.py:61-81 — note only `tables(0)` is
    * kept, mirroring `_clean_tables` returning `[[...tables[0]...]]`. */
  def cleanSection(section: Section): Section = {
    val cleanedSentences = section.sentences.map(_.map(cleanSentence))
    val cleanedTables = section.tables.collect {
      case ts if ts.nonEmpty =>
        Seq(ts.head.map(cell => TableCell(cell.data.map(cleanSentence))))
    }.orElse(section.tables)
    section.copy(sentences = cleanedSentences, tables = cleanedTables)
  }

  /** /root/reference/src/data_cleaners.py:83-89 */
  def cleanPage(page: Page): Page =
    page.copy(
      plaintext = cleanPageContent(page.plaintext),
      sections = page.sections.map(cleanSection))

  /** /root/reference/src/process_pages.py:72-81 — offset of a mention in
    * the page: first occurrence of the sentence, plus first occurrence of
    * the mention within the sentence. None (skip link) when either lookup
    * fails. */
  def mentionOffset(pageText: String, sentenceText: String, mention: String): Option[Int] = {
    val sentenceOffset = pageText.indexOf(sentenceText)
    if (sentenceOffset < 0) return None
    val mentionInSentence = sentenceText.indexOf(mention)
    if (mentionInSentence < 0) return None
    Some(sentenceOffset + mentionInSentence)
  }

  /** /root/reference/src/process_pages.py:83-86 — follow one redirect hop
    * then upper-first. Blank redirect targets fall through to the raw
    * destination (Python `or` semantics). */
  def resolveEntity(redirects: String => Option[String], linkPage: String): String = {
    val followed = redirects(linkPage).filter(_.nonEmpty)
    upperFirst(followed.getOrElse(linkPage))
  }

  /** /root/reference/src/process_pages.py:129-138 — interval overlap with
    * INCLUSIVE boundaries (adjacent mentions count as overlapping), plus the
    * containment case pinned by the Mandela test
    * (test/process_pages_test.py:33-47). */
  def mentionOverlaps(mentions: Iterable[Mention], m: Mention): Boolean = {
    val start = m.offset
    val end = m.offset + m.text.length
    mentions.exists { o =>
      val s = o.offset
      val e = o.offset + o.text.length
      (start >= s && start <= e) || (end >= s && end <= e) || (start <= s && end >= e)
    }
  }

  /** G1+G2: all sentences of a page (sections then first-table cells,
    * /root/reference/src/process_pages.py:118-124) folded into an ordered
    * entity -> mentions multimap (process_pages.py:88-127). */
  def getLinkContexts(redirects: String => Option[String], page: Page): Contexts = {
    val contexts = new Contexts
    val sectionSentences = page.sections.iterator.flatMap(_.sentences.getOrElse(Nil))
    val tableSentences = page.sections.iterator
      .filter(s => s.tables.exists(_.nonEmpty))
      .flatMap(_.tables.get.head.iterator.flatMap(_.data))
    (sectionSentences ++ tableSentences).foreach { sentence =>
      sentence.links.getOrElse(Nil).foreach { link =>
        if (isValidLink(link)) {
          val linkPage = link.page.get
          // Python `link.get('text') or link['page']`: empty anchor text
          // falls back to the target name (process_pages.py:94).
          val linkText = link.text.filter(_.nonEmpty).getOrElse(linkPage)
          mentionOffset(page.plaintext, sentence.text, linkText).foreach { off =>
            val entity = resolveEntity(redirects, linkPage)
            val m = Mention(
              entity = entity,
              text = linkText,
              sentence = Some(sentence.text),
              offset = off,
              pageTitle = page.title,
              preredirect = upperFirst(linkPage))
            contexts.update(entity, contexts.getOrElse(entity, Vector.empty) :+ m)
          }
        }
      }
    }
    contexts
  }

  /** G3 exact-match heuristic (/root/reference/src/process_pages.py:140-156):
    * all non-overlapping occurrences of `entity` in the plaintext become
    * synthetic mentions (no sentence), filtered against every existing
    * mention, merged with per-entity offset-dedup. Mutates `contexts`. */
  def applyExactMatchHeuristic(page: Page, contexts: Contexts, entity: String): Unit = {
    val matches = matchAll(entity, page.plaintext)
    if (matches.isEmpty) return
    val existing = contexts.valuesIterator.flatten.toVector
    val candidates = matches.map { idx =>
      Mention(
        entity = entity,
        text = entity,
        sentence = None,
        offset = idx,
        pageTitle = page.title,
        preredirect = upperFirst(entity))
    }
    val filtered = candidates.filterNot(m => mentionOverlaps(existing, m))
    if (filtered.nonEmpty) {
      contexts.get(entity) match {
        case Some(dest) =>
          // concat + uniq-by-offset keeping first (process_pages.py:149)
          val merged = (dest ++ filtered)
            .foldLeft((Vector.empty[Mention], Set.empty[Int])) {
              case ((acc, seen), m) =>
                if (seen(m.offset)) (acc, seen) else (acc :+ m, seen + m.offset)
            }._1
          contexts.update(entity, merged)
        case None => contexts.update(entity, filtered.toVector)
      }
    }
  }

  /** W2 greedy overlap suppression
    * (/root/reference/src/process_pages.py:173-188): walk (entity, mention)
    * pairs in entity-insertion-major order, keep a mention iff it does not
    * overlap anything kept so far. */
  def dropOverlappingMentions(contexts: Contexts): Contexts = {
    val kept = mutable.ArrayBuffer.empty[Mention]
    val out = new Contexts
    contexts.foreach { case (entity, mentions) =>
      mentions.foreach { m =>
        if (!mentionOverlaps(kept, m)) {
          kept += m
          out.update(entity, out.getOrElse(entity, Vector.empty) :+ m)
        }
      }
    }
    out
  }

  /** Full heuristic pipeline
    * (/root/reference/src/process_pages.py:190-195): base contexts → page
    * title heuristic → per-known-entity anchor heuristic (key snapshot,
    * accumulating) → overlap suppression → guarantee a (possibly empty)
    * entry for the page's own title, ordered first
    * (process_pages.py:169-171). */
  def linkContextsWithHeuristics(redirects: String => Option[String], page: Page): Contexts = {
    val contexts = getLinkContexts(redirects, page)
    applyExactMatchHeuristic(page, contexts, page.title)
    contexts.keysIterator.toVector.foreach { entity =>
      applyExactMatchHeuristic(page, contexts, entity)
    }
    val suppressed = dropOverlappingMentions(contexts)
    val out = new Contexts
    out.update(page.title, suppressed.getOrElse(page.title, Vector.empty))
    suppressed.foreach { case (k, v) => out.update(k, v) }
    out
  }

  /** /root/reference/src/process_pages.py:197-209 with the entity->mentions
    * dict exploded to ordered rows. */
  def processPage(
      redirects: String => Option[String],
      page: Page,
      isSeedPage: Boolean = false): ProcessedPage = {
    val cleaned = cleanPage(page)
    val info = DocumentInfo(
      sourceId = cleaned.pageID,
      title = cleaned.title,
      text = cleaned.plaintext,
      categories = cleaned.categories.getOrElse(Nil),
      isDisambiguationPage = cleaned.isDisambiguation.getOrElse(false),
      isSeedPage = isSeedPage)
    val contexts = linkContextsWithHeuristics(redirects, cleaned)
    ProcessedPage(
      documentInfo = info,
      mentions = contexts.valuesIterator.flatten.toVector,
      entities = contexts.keysIterator.toVector)
  }
}
