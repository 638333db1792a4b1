package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.model._

/** Loads the reference golden fixtures (ported verbatim from
  * /root/reference/test/fixtures/ — they are the behavioral spec, SURVEY §5)
  * into the engine's typed model. Jackson ships with the Spark jars and
  * preserves JSON object field order, which the ordered goldens rely on. */
object Fixtures {
  private val mapper = new ObjectMapper()

  def readTree(resource: String): JsonNode = {
    val in = getClass.getResourceAsStream(s"/fixtures/$resource")
    require(in != null, s"missing fixture $resource")
    try mapper.readTree(in)
    finally in.close()
  }

  private def optText(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filter(!_.isNull).map(_.asText)

  def parseLink(n: JsonNode): Link =
    Link(page = optText(n, "page"), text = optText(n, "text"))

  def parseSentence(n: JsonNode): Sentence =
    Sentence(
      text = n.get("text").asText,
      links = Option(n.get("links")).map(_.elements.asScala.map(parseLink).toSeq))

  def parseSection(n: JsonNode): Section =
    Section(
      title = optText(n, "title"),
      depth = Option(n.get("depth")).map(_.asInt),
      sentences = Option(n.get("sentences"))
        .map(_.elements.asScala.map(parseSentence).toSeq),
      tables = Option(n.get("tables")).map(_.elements.asScala.map { row =>
        row.elements.asScala.map { cell =>
          TableCell(Option(cell.get("data")).map(parseSentence))
        }.toSeq
      }.toSeq))

  def parsePage(resource: String): Page = {
    val n = readTree(resource)
    Page(
      title = n.get("title").asText,
      pageID = optText(n, "pageID"),
      categories = Option(n.get("categories"))
        .map(_.elements.asScala.map(_.asText).toSeq),
      isDisambiguation = Option(n.get("isDisambiguation")).map(_.asBoolean),
      plaintext = n.get("plaintext").asText,
      sections = n.get("sections").elements.asScala.map(parseSection).toSeq)
  }

  def parseMention(entity: String, pageTitleDefault: String, n: JsonNode): Mention =
    Mention(
      entity = entity,
      text = n.get("text").asText,
      sentence = optText(n, "sentence"),
      offset = n.get("offset").asInt,
      pageTitle = optText(n, "page_title").getOrElse(pageTitleDefault),
      preredirect = optText(n, "preredirect").getOrElse(""))

  /** Top-level key order of a JSON object fixture, via the streaming parser
    * (the tree API does not guarantee insertion order here, and the goldens
    * are order-sensitive). */
  private def topLevelKeyOrder(resource: String): Vector[String] = {
    import com.fasterxml.jackson.core.JsonToken
    val in = getClass.getResourceAsStream(s"/fixtures/$resource")
    require(in != null, s"missing fixture $resource")
    val parser = mapper.getFactory.createParser(in)
    try {
      val keys = Vector.newBuilder[String]
      var depth = 0
      var tok = parser.nextToken()
      while (tok != null) {
        tok match {
          case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depth += 1
          case JsonToken.END_OBJECT | JsonToken.END_ARRAY => depth -= 1
          case JsonToken.FIELD_NAME if depth == 1 => keys += parser.currentName()
          case _ =>
        }
        tok = parser.nextToken()
      }
      keys.result()
    } finally { parser.close(); in.close() }
  }

  /** Ordered (entity -> mentions) golden, e.g. parade_page_contexts.json. */
  def parseContexts(resource: String): Vector[(String, Vector[Mention])] = {
    val n = readTree(resource)
    topLevelKeyOrder(resource).map { entity =>
      entity -> n.get(entity).elements.asScala
        .map(m => parseMention(entity, "", m)).toVector
    }
  }
}
