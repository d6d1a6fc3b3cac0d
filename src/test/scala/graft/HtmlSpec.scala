package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.Html
import graft.functions.Extract
import graft.sites.Sites

/** HTML fixtures reproducing the reference's DOM-scoping assertions
  * (synonyms_test.go:119-167, ar_synonyms_test.go:122-173,
  * counties_test.go:139-231) without network: stored documents whose
  * filtered text and link sets are pinned (FIXTURES.md §4).
  */
class HtmlSpec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes("UTF-8")

  test("a[href] extraction preserves document order (crawler.go:89-96)") {
    val html =
      """<html><body>
        |<a href="/wiki/First">1</a>
        |<div><a href="/wiki/Second">2</a></div>
        |<a href="/wiki/Third">3</a>
        |<a>no href</a>
        |</body></html>""".stripMargin
    val got = Extract.links(bytes(html), "wikipedia")
    assert(got == Seq("/wiki/First", "/wiki/Second", "/wiki/Third"))
  }

  test("synonyms scope: only links inside .syns are extracted") {
    val html =
      """<html><body>
        |<div class="nav"><a href="/synonym/out1">o</a></div>
        |<div class="syns"><a href="/synonym/in1">a</a>
        |<span><a href="/synonym/in2">b</a></span></div>
        |<a href="/synonym/out2">o2</a>
        |<div class="syns"><a href="/synonym/in3">c</a></div>
        |</body></html>""".stripMargin
    val got = Extract.links(bytes(html), "synonyms")
    assert(got == Seq("/synonym/in1", "/synonym/in2", "/synonym/in3"))
  }

  test("ar_synonyms scope: .word-opt subtree only; UTF-8 text survives") {
    val html =
      """<html><body>
        |<div class="word-opt"><a href="/synonym/ar/%D8%AD%D9%8A%D9%86">حين</a></div>
        |<a href="/synonym/ar/outside">x</a>
        |</body></html>""".stripMargin
    val ex = Extract.extractPage(bytes(html), "synonyms-ar")
    assert(ex.links == Seq("/synonym/ar/%D8%AD%D9%8A%D9%86"))
    assert(ex.text == "حين")
  }

  test("counties slice: sibling block after Adjacent_counties heading, minus <p> (counties.go:63-72)") {
    val html =
      """<html><body>
        |<h2>C0_County,_Alabama</h2>
        |<p>Intro <a href="/wiki/Early_County,_Georgia">early</a></p>
        |<h3><span id="Adjacent_counties_1">Adjacent counties</span></h3>
        |<div><a href="/wiki/A_County,_Alabama">A</a> and
        |<a href="/wiki/B_County,_Texas">B</a></div>
        |<p>excluded <a href="/wiki/P_County,_Ohio">p</a></p>
        |<ul><li><a href="/wiki/C_County,_Iowa">C</a></li></ul>
        |<h3><span id="Other_section">Other</span></h3>
        |<div><a href="/wiki/D_County,_Maine">D</a></div>
        |</body></html>""".stripMargin
    val ex = Extract.extractPage(bytes(html), "us_counties")
    // early link (before heading), <p> links, and post-next-h3 links excluded
    assert(ex.links == Seq("/wiki/A_County,_Alabama", "/wiki/B_County,_Texas",
      "/wiki/C_County,_Iowa"))
    // text: included block text only — mirrors counties_test.go:170-177
    assert(ex.text.contains("A"))
    assert(!ex.text.contains("excluded"))
    assert(!ex.text.contains("Intro"))
    assert(!ex.text.contains("D"))
  }

  test("wikipedia filter is identity: whole page (wiki.go:78-80)") {
    val html = """<html><body><p>hello <b>world</b></p><a href="/wiki/X">x</a></body></html>"""
    val ex = Extract.extractPage(bytes(html), "wikipedia")
    assert(ex.links == Seq("/wiki/X"))
    assert(ex.text == "hello worldx")
  }

  test("entity decoding in attrs and text") {
    val html = """<html><body><a href="/wiki/A&amp;B">A &amp; B &#233; &#x41;</a></body></html>"""
    val ex = Extract.extractPage(bytes(html), "wikipedia")
    assert(ex.links == Seq("/wiki/A&B"))
    assert(ex.text == "A & B é A")
  }

  test("parser robustness: void elements, self-close, script, comments, misnesting") {
    val html =
      """<!doctype html><html><head><script>var x = "<a href='/wiki/NotALink'>";</script>
        |<meta charset="utf-8"><!-- <a href="/wiki/Comment">c</a> --></head>
        |<body><br><img src="x.png"/><a href="/wiki/Real">r</a><div><b>bold</div></b></body></html>""".stripMargin
    val ex = Extract.extractPage(bytes(html), "wikipedia")
    assert(ex.links == Seq("/wiki/Real"))
  }

  test("filter errors tolerated with partial output (crawler.go:84-87)") {
    val ex = Extract.extractPage(null, "wikipedia")
    assert(ex.err != null)
    assert(ex.links.isEmpty)
  }

  test("synthetic corpus pages parse back to their generated link sets") {
    import graft.sites.SyntheticWeb
    val spec = SyntheticWeb.Spec("wikipedia", numPages = 20)
    val html = SyntheticWeb.htmlFor(spec, 3L)
    val links = Extract.links(bytes(html), "wikipedia")
    // decoys present in raw hrefs but valid targets appear in order
    val expectedTargets = SyntheticWeb.targets(spec, 3L).map(j => s"/wiki/Node_$j")
    assert(links.filter(_.startsWith("/wiki/Node_")).filterNot(_.contains("#"))
      == expectedTargets)
    assert(links.contains("/wiki/Main_Page")) // decoy present pre-filter
  }

  test("decodeBytes: BOM, meta charset sniffing, replacement fallbacks") {
    // UTF-8 BOM stripped
    val u8 = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "héllo".getBytes("UTF-8")
    assert(Html.decodeBytes(u8) == "héllo")
    // UTF-16 byte-order marks
    val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++
      "héllo".getBytes("UTF-16BE")
    assert(Html.decodeBytes(be) == "héllo")
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++
      "héllo".getBytes("UTF-16LE")
    assert(Html.decodeBytes(le) == "héllo")
    // meta-declared latin-1: byte 0xE9 must become é, not U+FFFD
    val latin = ("<html><head><meta charset=\"iso-8859-1\"></head>" +
      "<body>café</body></html>").getBytes("ISO-8859-1")
    assert(Html.decodeBytes(latin).contains("café"))
    // http-equiv form + windows-1252 curly quote (byte 0x93)
    val w1252 = ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
      "charset=windows-1252\">a“b").getBytes("windows-1252")
    assert(Html.decodeBytes(w1252).contains("a“b"))
    // unknown charset name falls back to UTF-8
    val unk = "<meta charset=\"no-such-charset-zz\">plain".getBytes("UTF-8")
    assert(Html.decodeBytes(unk).contains("plain"))
    // malformed UTF-8 replaces, never throws
    val bad = "ok ".getBytes("UTF-8") ++ Array[Byte](0xC3.toByte)
    assert(Html.decodeBytes(bad).startsWith("ok "))
    // end-to-end: fullText of a latin-1 page extracts the accent
    val page = ("<html><head><meta charset=\"iso-8859-1\"><title>t</title>" +
      "</head><body>résumé</body></html>").getBytes("ISO-8859-1")
    assert(graft.functions.Extract.fullText(page).contains("résumé"))
    // HTML5: a meta-DECLARED utf-16 maps to UTF-8 (a BOM-less UTF-16
    // page could not contain an ASCII meta tag) — the bytes ARE ascii
    val metaU16 = "<meta charset=\"utf-16\">hi there".getBytes("UTF-8")
    assert(Html.decodeBytes(metaU16).contains("hi there"))
    val metaXud = "<meta charset=\"x-user-defined\">raw ok".getBytes("UTF-8")
    assert(Html.decodeBytes(metaXud).contains("raw ok"))
    // WHATWG maps x-user-defined to windows-1252 in the meta prescan:
    // high bytes must decode as single-byte characters, not U+FFFD
    val xudHigh = "<meta charset=\"x-user-defined\">caf".getBytes("UTF-8") ++
      Array(0xE9.toByte)
    val gotXud = Html.decodeBytes(xudHigh)
    assert(gotXud.contains("café"), gotXud)
    assert(!gotXud.contains("�"))
  }

  test("extractLinksOnly: UTF-16 BOM pages bypass the byte-scan fast path") {
    val doc = "<html><body><a href=\"/wiki/Target_1\">t</a></body></html>"
    val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++ doc.getBytes("UTF-16BE")
    // wikipedia is a wholePage profile — the raw-byte scan would see
    // NUL-interleaved ASCII and find nothing; the BOM sniff must
    // route this capture through decode+DOM instead
    val got = graft.functions.Extract.extractLinksOnly(be, "wikipedia")
    assert(got.err == null, s"err=${got.err}")
    assert(got.links == Seq("/wiki/Target_1"), got.links)
    // and the two paths agree on a plain UTF-8 capture
    val plain = graft.functions.Extract.extractLinksOnly(
      doc.getBytes("UTF-8"), "wikipedia")
    assert(plain.links == Seq("/wiki/Target_1"))
  }
}
