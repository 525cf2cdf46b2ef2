package graft.cql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CQL (Contextual Query Language) front-end: parses the reference's query
  * surface (typed fields with =, ==, <>, <, >, <=, >= relations, and/or/not
  * boolean operators, parentheses, `cql.allRecords=1`, and a trailing
  * `sortBy field/sort.ascending|descending` clause) into Catalyst `Column`
  * expressions (reference: ReservoirService.java:98-117 via pgCQL;
  * CqlFields.java:3-15; order-by at ReservoirService.java:138-139).
  *
  * Translating to `Column` instead of SQL text means Catalyst pushes the
  * resulting predicates straight into the parquet scans — the engine's
  * "query language" costs nothing at plan time.
  */
object Cql {

  sealed trait FieldType
  case object TextField extends FieldType
  case object NumberField extends FieldType
  case object UuidField extends FieldType
  case object TimestampField extends FieldType

  final case class Parsed(where: Option[Column], orderBy: Seq[Column],
      referenced: Set[String] = Set.empty) {
    def apply(df: DataFrame): DataFrame = {
      val filtered = where.map(df.filter).getOrElse(df)
      if (orderBy.nonEmpty) filtered.orderBy(orderBy: _*) else filtered
    }
  }

  final class CqlException(msg: String) extends IllegalArgumentException(msg)

  /** Parse a CQL query against a typed field set. A `null`/empty query means
    * match-all (the reference treats an absent query param the same way).
    */
  def parse(query: String, fields: Map[String, FieldType]): Parsed = {
    if (query == null || query.trim.isEmpty) return Parsed(None, Nil)
    new Parser(query, fields).parseQuery()
  }

  // ---------------- lexer/parser ----------------

  private final class Parser(input: String, fields: Map[String, FieldType]) {
    private var pos = 0
    private val referenced = scala.collection.mutable.Set.empty[String]

    def parseQuery(): Parsed = {
      val expr = parseOr()
      skipWs()
      val sorts =
        if (peekWord().exists(_.equalsIgnoreCase("sortBy"))) { nextWord(); parseSorts() }
        else Nil
      skipWs()
      if (pos < input.length)
        throw new CqlException(s"unexpected input at $pos: '${input.substring(pos)}'")
      Parsed(Some(expr), sorts, referenced.toSet)
    }

    private def parseSorts(): Seq[Column] = {
      val sorts = Seq.newBuilder[Column]
      var more = true
      while (more) {
        skipWs()
        nextWord() match {
          case Some(w) =>
            val parts = w.split("/", 2)
            val name = parts(0)
            if (!fields.contains(name))
              throw new CqlException(s"unsupported sort field: $name")
            referenced += name
            val c = col(name)
            sorts += (if (parts.length > 1 && parts(1) == "sort.descending") c.desc
                      else c.asc)
          case None => more = false
        }
      }
      sorts.result()
    }

    private def parseOr(): Column = {
      var left = parseAnd()
      var more = true
      while (more) {
        skipWs()
        if (peekWord().exists(_.equalsIgnoreCase("or"))) {
          nextWord(); left = left || parseAnd()
        } else more = false
      }
      left
    }

    private def parseAnd(): Column = {
      var left = parseAtom()
      var more = true
      while (more) {
        skipWs()
        peekWord() match {
          case Some(w) if w.equalsIgnoreCase("and") =>
            nextWord(); left = left && parseAtom()
          case Some(w) if w.equalsIgnoreCase("not") =>
            // CQL 'not' is binary: a not b ≡ a AND NOT b
            nextWord(); left = left && !parseAtom()
          case _ => more = false
        }
      }
      left
    }

    private def parseAtom(): Column = {
      skipWs()
      if (pos < input.length && input(pos) == '(') {
        pos += 1
        val inner = parseOr()
        skipWs()
        if (pos >= input.length || input(pos) != ')')
          throw new CqlException("expected ')'")
        pos += 1
        inner
      } else {
        val field = nextWord().getOrElse(throw new CqlException("expected field"))
        if (field.equalsIgnoreCase("cql.allRecords")) {
          skipWs(); expectRelation() // consume '='
          nextTerm()
          lit(true)
        } else {
          val ftype = fields.getOrElse(field,
            throw new CqlException(s"unsupported CQL index: $field"))
          referenced += field
          skipWs()
          val rel = expectRelation()
          skipWs()
          val term = nextTerm()
          buildPredicate(field, ftype, rel, term)
        }
      }
    }

    private def buildPredicate(field: String, ftype: FieldType, rel: String,
        term: String): Column = {
      val c = col(field)
      val v: Column = ftype match {
        case NumberField => lit(term).cast("double")
        case TimestampField => lit(term).cast("timestamp")
        case _ => lit(term)
      }
      val cc = ftype match {
        case NumberField => c.cast("double")
        case _ => c
      }
      rel match {
        case "=" | "==" => cc === v
        case "<>" => cc =!= v
        case "<" => cc < v
        case ">" => cc > v
        case "<=" => cc <= v
        case ">=" => cc >= v
        case other => throw new CqlException(s"unsupported relation: $other")
      }
    }

    private def expectRelation(): String = {
      val rels = Seq("==", "<>", "<=", ">=", "=", "<", ">")
      rels.find(r => input.startsWith(r, pos)) match {
        case Some(r) => pos += r.length; r
        case None => throw new CqlException(s"expected relation at $pos")
      }
    }

    private def nextTerm(): String = {
      skipWs()
      if (pos < input.length && input(pos) == '"') {
        pos += 1
        val sb = new StringBuilder
        while (pos < input.length && input(pos) != '"') {
          if (input(pos) == '\\' && pos + 1 < input.length) pos += 1
          sb.append(input(pos)); pos += 1
        }
        if (pos >= input.length) throw new CqlException("unterminated string")
        pos += 1
        sb.toString
      } else {
        val w = nextWord().getOrElse(throw new CqlException("expected term"))
        w
      }
    }

    private def wordEnd(from: Int): Int = {
      var i = from
      while (i < input.length && !" \t\n\r()=<>\"".contains(input(i))) i += 1
      i
    }

    private def peekWord(): Option[String] = {
      val save = pos
      skipWs()
      val e = wordEnd(pos)
      val w = if (e > pos) Some(input.substring(pos, e)) else None
      pos = save
      w
    }

    private def nextWord(): Option[String] = {
      skipWs()
      val e = wordEnd(pos)
      if (e > pos) { val w = input.substring(pos, e); pos = e; Some(w) }
      else None
    }

    private def skipWs(): Unit =
      while (pos < input.length && input(pos).isWhitespace) pos += 1
  }
}
