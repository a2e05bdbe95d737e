package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.jdk.CollectionConverters._

/** Minimal JSON/YAML access layer over Jackson (ships with Spark).
  * The engine's config language is YAML/JSON, same surface as the
  * reference (mercari/pipeline `config/Config.java`), parsed here into
  * Jackson `JsonNode` trees that the compilers walk.
  */
object Json {
  val mapper = new ObjectMapper()
  private val yamlMapper = new ObjectMapper(new YAMLFactory())

  /** Parse config text as JSON, falling back to YAML. */
  def parse(text: String): JsonNode = {
    val t = text.trim
    if (t.startsWith("{") || t.startsWith("[")) mapper.readTree(t)
    else yamlMapper.readTree(t)
  }

  def obj(): ObjectNode = mapper.createObjectNode()
  def arr(): ArrayNode = mapper.createArrayNode()

  implicit class NodeOps(val node: JsonNode) extends AnyVal {
    def apply(field: String): Option[JsonNode] = {
      val v = node.get(field)
      if (v == null || v.isNull) None else Some(v)
    }
    def str(field: String): Option[String] = apply(field).map(_.asText)
    def int(field: String): Option[Int] = apply(field).map(_.asInt)
    def long(field: String): Option[Long] = apply(field).map(_.asLong)
    def dbl(field: String): Option[Double] = apply(field).map(_.asDouble)
    def bool(field: String): Option[Boolean] = apply(field).map(_.asBoolean)
    def elems: Seq[JsonNode] =
      if (node == null || !node.isArray) Seq.empty
      else node.asScala.toSeq
    def arrOf(field: String): Seq[JsonNode] =
      apply(field).map(_.elems).getOrElse(Seq.empty)
    def strArr(field: String): Seq[String] = apply(field) match {
      case Some(n) if n.isArray => n.elems.map(_.asText)
      case Some(n) => Seq(n.asText)
      case None => Seq.empty
    }
    def names: Seq[String] =
      if (node == null || !node.isObject) Seq.empty
      else node.fieldNames.asScala.toSeq
  }

  /** Scala value for a scalar JsonNode (for literals in configs). */
  def scalar(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else if (n.isBoolean) n.asBoolean
    else if (n.isIntegralNumber) n.asLong
    else if (n.isFloatingPointNumber) n.asDouble
    else n.asText
}
