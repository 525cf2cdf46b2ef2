package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-pattern blocklist screening — the profanity/PII-keyword/spam-phrase
  * filter pass every production corpus goes through before training.
  *
  * The scale story is the whole point: the pattern dictionary is broadcast
  * ONCE and compiled into an Aho–Corasick automaton ONCE PER EXECUTOR (a
  * JVM-local memo keyed by the pattern list), so screening is a single pass
  * over each document at O(len + matches) REGARDLESS of dictionary size —
  * where the naive plan (one `contains`/`regexp` per pattern) re-scans the
  * corpus |patterns| times and a 10k-phrase blocklist at 100 TB becomes 10k
  * corpus scans. A UDF is justified here because Spark has no multi-pattern
  * built-in (`contains`/`locate` are single-needle; a `|`-joined regexp is
  * NFA backtracking, not a trie, and loses per-pattern counts).
  *
  * Match semantics: ALL occurrences, overlapping included (standard
  * Aho–Corasick match-end counting; "able" is found inside every "table").
  * Case-sensitive; callers fold case upstream if wanted.
  */
object Blocklist {

  /** Aho–Corasick automaton: goto trie + BFS-computed failure links, with
    * the per-node pattern-end lists closed over the failure chain at build
    * time so matching never walks suffix links.
    */
  final class AhoCorasick private (patterns: IndexedSeq[String]) extends Serializable {
    private val gotoMaps = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    private val ends = mutable.ArrayBuffer(List.empty[Int])

    patterns.zipWithIndex.foreach { case (p, pid) =>
      require(p.nonEmpty, "empty blocklist pattern")
      var node = 0
      p.foreach { ch =>
        node = gotoMaps(node).getOrElseUpdate(ch, {
          gotoMaps += mutable.HashMap.empty[Char, Int]
          ends += Nil
          gotoMaps.size - 1
        })
      }
      ends(node) ::= pid
    }

    private val fail = new Array[Int](gotoMaps.size)
    // outputs(node) = every pattern ending at node OR at any suffix of it
    private val outputs: Array[Array[Int]] = {
      val out = new Array[List[Int]](gotoMaps.size)
      out(0) = ends(0)
      val queue = mutable.Queue.empty[Int]
      gotoMaps(0).valuesIterator.foreach { c => fail(c) = 0; out(c) = ends(c); queue += c }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        gotoMaps(u).foreach { case (ch, v) =>
          var f = fail(u)
          while (f != 0 && !gotoMaps(f).contains(ch)) f = fail(f)
          fail(v) = gotoMaps(f).get(ch).filter(_ != v).getOrElse(0)
          out(v) = ends(v) ++ out(fail(v))
          queue += v
        }
      }
      out.map(_.toArray)
    }

    /** per-pattern occurrence counts over `text` in one left-to-right pass */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.size)
      var node = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (node != 0 && !gotoMaps(node).contains(ch)) node = fail(node)
        node = gotoMaps(node).getOrElse(ch, 0)
        val out = outputs(node)
        var j = 0
        while (j < out.length) { counts(out(j)) += 1L; j += 1 }
        i += 1
      }
      counts
    }
  }

  object AhoCorasick {
    // one compiled automaton per executor JVM per distinct pattern list
    private val cache = new java.util.concurrent.ConcurrentHashMap[Seq[String], AhoCorasick]()
    def forPatterns(patterns: Seq[String]): AhoCorasick =
      cache.computeIfAbsent(patterns, p => new AhoCorasick(p.toIndexedSeq))
  }

  /** (doc_id, pattern, hits) for every document × matched pattern (hits > 0),
    * one corpus scan total. `patterns` is driver-side and small (a
    * dictionary, not data) — it rides the closure; the automaton is built
    * lazily executor-side via the JVM memo above.
    */
  def screenCounts(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val pats = patterns.toIndexedSeq
    val countsUdf = udf { text: String =>
      if (text == null) new Array[Long](pats.size)
      else AhoCorasick.forPatterns(pats).countAll(text)
    }
    val patArr: Column = array(pats.map(lit): _*)
    graft.operators.Parallelism.ensure(
        df.select(col(idCol).as("doc_id"), col(textCol).as("_graft_text")))
      .select(col("doc_id"), posexplode(countsUdf(col("_graft_text"))).as(Seq("_i", "hits")))
      .filter(col("hits") > 0)
      .select(col("doc_id"), element_at(patArr, col("_i") + 1).as("pattern"), col("hits"))
  }
}
