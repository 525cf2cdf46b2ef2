package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GoldRush

/** Byte-for-byte golden tests against the reference's GoldRush corpus
  * (js/test/records → js/test/assertions-goldrush2024.json).
  * The harness wraps each bare MARC-in-JSON record as {"marc": ...}
  * (js/test/goldrush2024.mjs:29-32).
  */
class GoldRushGoldenSpec extends AnyFunSuite {

  private val refBase = "/root/reference/js"
  private val mapper = new ObjectMapper()

  private lazy val assertions: Map[String, String] = {
    val node = mapper.readTree(
      Files.readString(Paths.get(s"$refBase/test/assertions-goldrush2024.json")))
    node.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap
  }

  private def payloadFor(file: String): String =
    s"""{"marc":${Files.readString(Paths.get(s"$refBase/$file"))}}"""

  for ((file, expected) <- Seq(
      "test/records/one.json" -> true,
      "test/records/spec-example-1.json" -> true,
      "test/records/spec-example-2.json" -> true,
      "test/records/three.json" -> true,
      "test/records/blinky-nutsy-gutenberg.json" -> true,
      "test/records/blinky-nutsy-nla.json" -> true)) {
    test(s"golden: $file") {
      val got = GoldRush.matchkeyFromPayload(payloadFor(file))
      assert(got == assertions(file))
    }
  }

  test("golden: invalid-2-no-fields.json error message") {
    val e = intercept[IllegalArgumentException] {
      GoldRush.matchkeyFromPayload(payloadFor("test/records/invalid-2-no-fields.json"))
    }
    assert(e.getMessage == assertions("test/records/invalid-2-no-fields.json"))
  }

  test("golden: invalid-1-broken-json.json raises a parse error") {
    // the reference asserts V8's engine-specific JSON error string; we assert
    // only that parsing fails
    assertThrows[Exception] {
      GoldRush.matchkeyFromPayload(payloadFor("test/records/invalid-1-broken-json.json"))
    }
  }
}
