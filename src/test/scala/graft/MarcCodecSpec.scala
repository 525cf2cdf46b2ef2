package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.marc.{Iso2709, MarcJson, MarcXml}
import graft.model.IngestMapper

/** Parser/codec tests against the reference's own fixture files
  * (util/src/test/resources, SURVEY.md §5.2).
  */
class MarcCodecSpec extends AnyFunSuite {

  private val res = "/root/reference/util/src/test/resources"
  private def bytes(f: String) = Files.readAllBytes(Paths.get(s"$res/$f"))
  private def text(f: String) = Files.readString(Paths.get(s"$res/$f"))

  test("marc3.xml parses to 3 records with expected fields") {
    val recs = MarcXml.parseCollection(text("marc3.xml"))
    assert(recs.length == 3)
    val r = recs.head
    assert(r.leader.contains("00942nam a22002531a 4504"))
    assert(r.firstValue("001", None).contains("   73209622 //r823"))
    assert(r.firstSubfield("245", "a").contains("The Computer Bible /"))
    assert(r.fieldsWithTag("040").head.subfields.map(_.code) == Seq("a", "c", "d"))
    assert(r.fieldsWithTag("010").head.indicators.map(_.name) == Seq("ind1", "ind2"))
  }

  test("empty collection parses to 0 records") {
    assert(MarcXml.parseCollection(text("small.xml")).isEmpty)
  }

  test("MARCXML roundtrips losslessly through the normalized model") {
    val recs = MarcXml.parseCollection(text("marc3.xml"))
    val again = MarcXml.parseCollection(MarcXml.toCollectionXml(recs))
    assert(again == recs)
  }

  test("MARC-in-JSON roundtrips losslessly") {
    val recs = MarcXml.parseCollection(text("marc3.xml"))
    recs.foreach { r =>
      assert(MarcJson.parse(MarcJson.toJson(r)) == r)
    }
  }

  test("marc3.marc (ISO 2709) parses to the same 3 records' content") {
    val bin = Iso2709.parseAll(bytes("marc3.marc"))
    val xml = MarcXml.parseCollection(text("marc3.xml"))
    assert(bin.length == 3)
    bin.zip(xml).foreach { case (b, x) =>
      assert(b.firstValue("001", None) == x.firstValue("001", None))
      assert(b.firstSubfield("245", "a") == x.firstSubfield("245", "a"))
      assert(b.fields.map(_.tag) == x.fields.map(_.tag))
    }
  }

  test("MARC-8 diacritics decode to the reference XML's Unicode") {
    // marc3.marc record 3 is a MARC-8 exercise sheet: every ANSEL spacing
    // character, every combining diacritic (preceding its base 'o'), and
    // greek-symbol escapes; marc3.xml is the reference's Unicode parallel of
    // the same records, so full subfield equality proves the MARC-8 mapping
    val bin = Iso2709.parseAll(bytes("marc3.marc"))
    val xml = MarcXml.parseCollection(text("marc3.xml"))
    bin.zip(xml).foreach { case (b, x) =>
      val bs = b.fields.map(f => (f.tag, f.value, f.subfields))
      val xs = x.fields.map(f => (f.tag, f.value, f.subfields))
      bs.zip(xs).foreach { case (bf, xf) => assert(bf == xf) }
    }
  }

  test("MARC-8 decoder handles escapes, reordering, and fallback") {
    import graft.marc.Marc8
    def d(bs: Int*): String = Marc8.decode(bs.map(_.toByte).toArray)
    // combining diacritic precedes base in MARC-8, follows it in Unicode
    assert(d(0xE2, 'e') == "e\u0301")
    // stacked diacritics keep their order after the base
    assert(d(0xE2, 0xF0, 'c') == "c\u0301\u0327")
    // ANSEL spacing characters
    assert(d(0xB2) == "\u00F8" && d(0xA5) == "\u00C6" && d(0xC8) == "\u20AC")
    // greek symbol / subscript / superscript escapes, back to ASCII with ESC s
    assert(d(0x1B, 'g', 'a', 0x1B, 's', 'x') == "\u03B1x")
    assert(d(0x1B, 'b', '2', 0x1B, 's') == "\u2082")
    assert(d(0x1B, 'p', '2', 0x1B, 's') == "\u00B2")
    // unsupported set designation → Latin-1 passthrough, ESC (B restores
    assert(d(0x1B, '(', 'N', 'a', 0x1B, '(', 'B', 'b') == "ab")
    // plain ASCII is identity
    assert(d('h', 'i', '!') == "hi!")
  }

  test("ISO 2709 roundtrips losslessly") {
    val recs = Iso2709.parseAll(bytes("marc3.marc"))
    recs.foreach { r =>
      val again = Iso2709.parseRecord(Iso2709.write(r))
      assert(again.fields == r.fields)
      // leader lengths and the charset mark are recomputed; record
      // status/type/bib-level survive
      assert(again.leader.get.substring(5, 9) == r.leader.get.substring(5, 9))
    }
  }

  test("mfhd.marc groups holdings under the preceding bib (F10)") {
    val recs = Iso2709.parseAll(bytes("mfhd.marc"))
    val grouped = IngestMapper.group(recs.iterator).toSeq
    assert(grouped.nonEmpty)
    val withHoldings = grouped.filter(_.holdings.nonEmpty)
    assert(withHoldings.nonEmpty, "fixture contains holdings records")
    withHoldings.foreach { g =>
      assert(!IngestMapper.isHolding(g.bib))
      g.holdings.foreach(h => assert(IngestMapper.isHolding(h)))
    }
    // payload JSON carries marcHoldings
    assert(withHoldings.head.payloadJson.contains("\"marcHoldings\""))
  }

  test("mfhd-no-parent.marc rejects a leading holdings record") {
    val recs = Iso2709.parseAll(bytes("mfhd-no-parent.marc"))
    assertThrows[IllegalArgumentException] {
      IngestMapper.group(recs.iterator).toSeq
    }
  }

  test("XML fixer repairs bad entities so the document parses") {
    val raw = bytes("small-bad-entities.xml")
    assertThrows[Exception] {
      MarcXml.parseCollection(new String(raw, "UTF-8"))
    }
    val fixed = new String(graft.sources.XmlFixer.fix(raw), "UTF-8")
    MarcXml.parseCollection(fixed) // must not throw
  }
}
