package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.marc.{Indicator, Iso2709, MarcField, MarcJson, MarcRecord, MarcXml, Subfield}

/** Property tests: the three codecs must round-trip arbitrary structurally
  * valid records losslessly (fixtures only cover happy shapes).
  */
class MarcRoundtripPropertySpec extends AnyFunSuite {

  private val textGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(20)),
    Gen.oneOf("a & b <c>", "\"quoted\"", "ümläut ß", "汉字 テスト",
      "spaces   inside", "tab\tand\nnewline", ""))

  private val tagGen: Gen[String] = Gen.oneOf(
    "001", "005", "008", "010", "100", "245", "500", "856", "999")

  private val subfieldGen: Gen[Subfield] = for {
    code <- Gen.oneOf("a", "b", "c", "z", "1", "9")
    value <- textGen
  } yield Subfield(code, value)

  private val fieldGen: Gen[MarcField] = for {
    tag <- tagGen
    // MARC semantics: tags below 010 are always control fields (a data field
    // with zero subfields under a control tag would be indistinguishable in
    // ISO 2709)
    field <-
      if (tag < "010") textGen.map(v => MarcField(tag, Some(v), Nil, Nil))
      else for {
        n <- Gen.chooseNum(0, 4)
        sfs <- Gen.listOfN(n, subfieldGen)
        i1 <- Gen.oneOf(" ", "0", "1")
        i2 <- Gen.oneOf(" ", "0", "9")
      } yield MarcField(tag, None,
        Seq(Indicator("ind1", i1), Indicator("ind2", i2)), sfs)
  } yield field

  private val recordGen: Gen[MarcRecord] = for {
    nf <- Gen.chooseNum(1, 12)
    fields <- Gen.listOfN(nf, fieldGen)
  } yield MarcRecord(Some("00000nam a22000000a 4500"), fields)

  private def samples(n: Int): Seq[MarcRecord] =
    (0 until n).flatMap(i =>
      recordGen.apply(Gen.Parameters.default, Seed(1000L + i)))

  test("MARC-in-JSON roundtrip is lossless") {
    samples(80).foreach { r =>
      assert(MarcJson.parse(MarcJson.toJson(r)) == r, MarcJson.toJson(r))
    }
  }

  test("MARCXML roundtrip preserves structure (control chars become U+FFFD)") {
    samples(80).foreach { r =>
      val again = MarcXml.parseCollection(
        MarcXml.toCollectionXml(Seq(r))).head
      // XML cannot carry raw control chars: writer substitutes U+FFFD
      def normalize(rec: MarcRecord): MarcRecord = {
        def fix(s: String) =
          s.map(c => if (c < 0x20 && c != '\t' && c != '\n' && c != '\r') '�' else c)
        rec.copy(
          leader = rec.leader.map(fix),
          fields = rec.fields.map(f => f.copy(
            value = f.value.map(fix),
            indicators = f.indicators.map(i => i.copy(value = fix(i.value))),
            subfields = f.subfields.map(s => Subfield(fix(s.code), fix(s.value))))))
      }
      assert(again == normalize(r))
    }
  }

  test("ISO2709 roundtrip preserves fields (delimiter-free content)") {
    // ISO2709 reserves 0x1D-0x1F; generated text contains none of them
    samples(80).foreach { r =>
      val again = Iso2709.parseRecord(Iso2709.write(r))
      assert(again.fields == r.fields, r.toString)
    }
  }
}
