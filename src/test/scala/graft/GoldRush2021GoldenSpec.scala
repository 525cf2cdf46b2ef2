package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GoldRush2021

/** Golden tests for the 2021 GoldRush variant
  * (js/test/assertions-goldrush2021.json).
  */
class GoldRush2021GoldenSpec extends AnyFunSuite {

  private val refBase = "/root/reference/js"
  private val mapper = new ObjectMapper()

  private lazy val assertions: Map[String, String] = {
    val node = mapper.readTree(
      Files.readString(Paths.get(s"$refBase/test/assertions-goldrush2021.json")))
    node.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap
  }

  private def payloadFor(file: String): String =
    s"""{"marc":${Files.readString(Paths.get(s"$refBase/$file"))}}"""

  for (file <- Seq(
      "test/records/one.json",
      "test/records/spec-example-1.json",
      "test/records/spec-example-2.json",
      "test/records/three.json",
      "test/records/blinky-nutsy-gutenberg.json",
      "test/records/blinky-nutsy-nla.json")) {
    test(s"golden 2021: $file") {
      assert(GoldRush2021.matchkeyFromPayload(payloadFor(file)) == assertions(file))
    }
  }

  test("golden 2021: invalid-2-no-fields.json error message") {
    val e = intercept[IllegalArgumentException] {
      GoldRush2021.matchkeyFromPayload(
        payloadFor("test/records/invalid-2-no-fields.json"))
    }
    assert(e.getMessage == assertions("test/records/invalid-2-no-fields.json"))
  }
}
