package graft.functions

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Minimal JSONPath evaluator for matcher expressions (F28): the reference
  * runs jayway json-path for configs like `$.inventory.issn[*]` and
  * `$.marc.fields[*].001` with string-collection results
  * (ModuleJsonPath.java:42-64, MatchKeyJsonPath.java:33-50).
  *
  * Supported: `$`, `.name`, `['name']`, `[*]`, `[n]`, `..name` (recursive
  * descent). Results: scalar leaves stringified; arrays flattened; objects
  * skipped — matching executeAsCollection's strings-only contract.
  */
object JsonPathLite {

  private val mapper = new ObjectMapper()

  sealed trait Step
  final case class Field(name: String) extends Step
  final case class Deep(name: String) extends Step
  case object Wildcard extends Step
  final case class Index(i: Int) extends Step

  final case class JsonPath(steps: Seq[JsonPathLite.Step]) {
    def strings(json: String): Seq[String] =
      try evalNode(mapper.readTree(json))
      catch { case _: Exception => Nil }

    def evalNode(root: JsonNode): Seq[String] = {
      var current: Seq[JsonNode] = Seq(root)
      steps.foreach { step =>
        current = current.flatMap(n => applyStep(n, step))
      }
      current.flatMap(leafString)
    }
  }

  private def applyStep(n: JsonNode, s: Step): Seq[JsonNode] = s match {
    case Field(name) => Option(n.get(name)).toSeq
    case Index(i) => if (n.isArray && i < n.size) Seq(n.get(i)) else Nil
    case Wildcard => n.elements.asScala.toSeq
    case Deep(name) => deep(n, name)
  }

  private def deep(n: JsonNode, name: String): Seq[JsonNode] = {
    val here = Option(n.get(name)).toSeq
    val below = n.elements.asScala.toSeq.flatMap(deep(_, name))
    here ++ below
  }

  private def leafString(n: JsonNode): Option[String] =
    if (n.isTextual) Some(n.asText)
    else if (n.isNumber || n.isBoolean) Some(n.asText)
    else None

  def compile(path: String): JsonPath = {
    require(path.startsWith("$"), s"JSONPath must start with $$: $path")
    val steps = Seq.newBuilder[Step]
    var i = 1
    while (i < path.length) {
      path(i) match {
        case '.' if i + 1 < path.length && path(i + 1) == '.' =>
          val (name, next) = readName(path, i + 2)
          steps += Deep(name); i = next
        case '.' =>
          val (name, next) = readName(path, i + 1)
          steps += Field(name); i = next
        case '[' =>
          val close = path.indexOf(']', i)
          require(close > 0, s"unclosed [ in $path")
          val inner = path.substring(i + 1, close).trim
          if (inner == "*") steps += Wildcard
          else if (inner.startsWith("'") && inner.endsWith("'"))
            steps += Field(inner.substring(1, inner.length - 1))
          else steps += Index(inner.toInt)
          i = close + 1
        case c =>
          throw new IllegalArgumentException(s"unexpected '$c' in JSONPath $path")
      }
    }
    JsonPath(steps.result())
  }

  private def readName(path: String, from: Int): (String, Int) = {
    var i = from
    while (i < path.length && path(i) != '.' && path(i) != '[') i += 1
    (path.substring(from, i), i)
  }

  /** one-shot evaluation: all string values at `path` within `json` */
  def strings(json: String, path: String): Seq[String] =
    compile(path).strings(json)
}
