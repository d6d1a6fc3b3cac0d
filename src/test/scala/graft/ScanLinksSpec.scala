package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.html.Html
import graft.sites.SyntheticWeb

/** The allocation-light scanner must be behaviorally identical to the
  * DOM parse + a[href] walk for whole-page extraction.
  */
class ScanLinksSpec extends AnyFunSuite {

  private def domLinks(html: String): Seq[String] =
    Html.links(Seq(Html.parse(html)))

  private def bytes(html: String): Array[Byte] =
    html.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** all three implementations must agree */
  private def assertAll(html: String, clue: String = ""): Unit = {
    val want = domLinks(html)
    assert(Html.scanLinks(html) === want, s"scanLinks $clue")
    assert(Html.scanLinksBytes(bytes(html)) === want, s"scanLinksBytes $clue")
  }

  test("scanners == DOM links on every synthetic profile's pages") {
    for (site <- Seq("wikipedia", "web", "synonyms", "synonyms-ar", "us_counties")) {
      val spec = SyntheticWeb.Spec(site, numPages = 20L, seed = 5L)
      (0L until 20L).foreach { i =>
        assertAll(SyntheticWeb.htmlFor(spec, i), s"$site page $i")
      }
    }
  }

  test("scanners agree on attribute/tag edge cases") {
    Seq(
      """<a href="/one" href="/two">dup attr: map keeps last</a>""",
      """<a/ href="/no">name is 'a/' — not an anchor</a>""",
      """<a-x href="/no">hyphen name</a-x>""",
      """<a = href="/x">stray equals</a>""",
      """<a href="/self"/>""",
      """<a href="/sp"  />""",
      """<a href='/unterminated""",
      """<a href='/untermin / """,
      """<a HREF=/caps>t</a>""",
      """<a data-href="/decoy" href="/real">t</a>""",
      """<a hrefs="/not-href">t</a>""",
      """<a href>bare</a>""",
      """<a href = "/spaced">t</a>""",
      "<a\nhref=\"/nl\">t</a>",
      """<a title="x > y" href="/gt-in-attr">quote-guard</a>""",
      """<área href="/utf8-tagname">t</área>""",
      """<a href="/ünïcode/ページ">t</a>""")
      .foreach(h => assertAll(h, h))
  }

  test("self-closed script/style is STILL raw text (HTML5: flag ignored)") {
    // Browsers ignore the self-closing flag on raw-text elements:
    // `<script/>` swallows everything until the next </script>. All
    // three implementations must agree on that — with and without
    // trailing whitespace before the '>', closed and unclosed.
    Seq(
      """<script/><a href="/swallowed">t</a></script><a href="/seen">t</a>""",
      """<script/ ><a href="/swallowed">t</a></script><a href="/seen">t</a>""",
      """<script / ><a href="/swallowed">t</a></script><a href="/seen">t</a>""",
      """<style/	><a href="/swallowed">t</a></style><a href="/seen">t</a>""",
      """<script/ >no close: everything below is swallowed <a href="/gone">t</a>""")
      .foreach(h => assertAll(h, h))
    assert(Html.scanLinks(
      """<script/><a href="/x">t</a></script><a href="/seen">t</a>""") === Seq("/seen"))
  }

  test("scanLinks handles comments, script/style raw text, doctype, entities") {
    val html =
      """<!doctype html><html><body>
        |<!-- <a href="/commented">no</a> -->
        |<script>var s = '<a href="/in-script">no</a>';</script>
        |<STYLE>a { color: red } /* <a href="/in-style">no</a> */</STYLE>
        |<a href="/first">1</a>
        |<A HREF="/upper">2</A>
        |<a class="x" href="/a&amp;b">3</a>
        |<a href='/single'>4</a>
        |<a href=/unquoted>5</a>
        |<a name="anchor-no-href">6</a>
        |<a href="">7</a>
        |<abbr href="/not-an-anchor">8</abbr>
        |<area href="/void-not-a"/>
        |</body></html>""".stripMargin
    val want = Seq("/first", "/upper", "/a&b", "/single", "/unquoted", "")
    assert(Html.scanLinks(html) === want)
    assert(Html.scanLinksBytes(html.getBytes("UTF-8")) === want)
    assert(domLinks(html) === want)
  }

  test("scanLinks truncated/malformed inputs never throw, match DOM") {
    val cases = Seq("", "<", "<a", "<a href=", "<a href=\"x", "plain text",
      "<script>", "<script>never closed", "<!-- unclosed", "<a href='x'>t",
      "a < b > c", "<a href=\"ok\">t</a><")
    cases.foreach(h => assertAll(h, s"input: $h"))
  }
}
