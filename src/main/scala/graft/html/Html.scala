package graft.html

import scala.collection.mutable.ArrayBuffer

/** Minimal, deterministic HTML DOM used by the link-extraction UDFs.
  *
  * The environment ships no HTML library (no jsoup jar), so this is a
  * small hand-rolled parser that covers the constructs the reference's
  * extraction pipeline exercises (see /root/reference):
  *   - `a[href]` descendant scan in document order
  *     (crawler/crawler.go:89-96 — goquery iterates in DOM order)
  *   - class-scoped subtree selection `.syns` / `.word-opt`
  *     (synonyms/synonyms.go:58-61, ar_synonyms/ar_synonyms.go:62-65)
  *   - `[id^='Adjacent_counties']` → Parent → NextUntil("h3") →
  *     Not("p") sibling-walk (counties/counties.go:63-72)
  *   - `.Text()` — concatenated descendant text, entity-decoded
  *
  * Pure and allocation-light: safe inside codegen'd UDF hot paths.
  */
final class Node(
    val tag: String, // "" for text nodes
    val attrs: Map[String, String],
    val text: String // text-node payload, already entity-decoded
) {
  var parent: Node = _
  val children: ArrayBuffer[Node] = new ArrayBuffer[Node](4)
  def isText: Boolean = tag.isEmpty

  def attr(name: String): Option[String] = attrs.get(name)

  def classes: Array[String] =
    attrs.getOrElse("class", "").split("\\s+").filter(_.nonEmpty)

  /** Descendant text concatenated in document order (goquery .Text()). */
  def textContent: String = {
    val sb = new java.lang.StringBuilder
    def walk(n: Node): Unit = {
      if (n.isText) sb.append(n.text)
      else n.children.foreach(walk)
    }
    walk(this)
    sb.toString
  }

  /** All descendant elements (not self), document order. */
  def descendants: Iterator[Node] = {
    val out = new ArrayBuffer[Node]
    def walk(n: Node): Unit = n.children.foreach { c =>
      if (!c.isText) { out += c; walk(c) }
    }
    walk(this)
    out.iterator
  }
}

object Html {

  private val voidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  private val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          if (name.startsWith("#x") || name.startsWith("#X")) {
            try { sb.appendCodePoint(Integer.parseInt(name.substring(2), 16)); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else if (name.startsWith("#")) {
            try { sb.appendCodePoint(Integer.parseInt(name.substring(1))); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else namedEntities.get(name) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val metaCharsetRe =
    "(?i)<meta[^>]*charset\\s*=\\s*[\"']?([A-Za-z0-9_\\-]+)".r

  /** Decode raw page bytes to a String honoring the HTML5 encoding
    * sniffing order a real web corpus needs (a few percent of crawled
    * pages are not UTF-8): (1) byte-order mark (UTF-8 / UTF-16 BE /
    * LE); (2) a `<meta charset=…>` or `<meta http-equiv …
    * charset=…>` declaration inside the first 2048 bytes (scanned
    * through the byte-transparent latin-1 view, per the spec's
    * ASCII-compatible-prefix assumption); (3) UTF-8. Every path
    * decodes with malformed/unmappable → U+FFFD replacement — a
    * mis-declared page degrades, never throws — and unknown or
    * unsupported charset names fall back to UTF-8.
    */
  def decodeBytes(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
        bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return decodeWith(bytes, 3, "UTF-8")
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return decodeWith(bytes, 2, "UTF-16BE")
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return decodeWith(bytes, 2, "UTF-16LE")
    val head = new String(bytes, 0, math.min(bytes.length, 2048),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val declared = metaCharsetRe.findFirstMatchIn(head).map(_.group(1)).map { n =>
      // HTML5 §13.2.3.3: a meta-DECLARED utf-16 maps to UTF-8 (a
      // BOM-less UTF-16 page could not contain an ASCII meta tag).
      // x-user-defined maps to windows-1252 per the same spec's meta
      // prescan — a single-byte decode that PRESERVES high bytes as
      // characters (mapping it to UTF-8 turned every high byte into
      // U+FFFD replacement noise)
      val l = n.toLowerCase
      if (l.startsWith("utf-16") || l.startsWith("utf16")) "UTF-8"
      else if (l == "x-user-defined") "windows-1252"
      else n
    }
    decodeWith(bytes, 0, declared.getOrElse("UTF-8"))
  }

  private def decodeWith(bytes: Array[Byte], offset: Int,
      name: String): String = {
    import java.nio.charset.{Charset, CodingErrorAction}
    val cs =
      try Charset.forName(name)
      catch { case _: Exception => Charset.forName("UTF-8") }
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, offset,
      bytes.length - offset)).toString
  }

  /** Parse an HTML document; returns the synthetic root node. */
  def parse(html: String): Node = {
    val root = new Node("#root", Map.empty, "")
    var cur = root
    var i = 0
    val n = html.length

    def pushText(end: Int, start: Int): Unit =
      if (end > start) {
        val t = new Node("", Map.empty, decodeEntities(html.substring(start, end)))
        t.parent = cur
        cur.children += t
      }

    var textStart = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { pushText(n, textStart); i = n }
      else {
        pushText(lt, textStart)
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
          textStart = i
        } else if (lt + 1 < n && html.charAt(lt + 1) == '!') { // doctype etc.
          val end = html.indexOf('>', lt)
          i = if (end < 0) n else end + 1
          textStart = i
        } else if (lt + 1 < n && html.charAt(lt + 1) == '/') { // close tag
          val end = html.indexOf('>', lt)
          if (end < 0) { i = n; textStart = n }
          else {
            val name = html.substring(lt + 2, end).trim.toLowerCase
            // pop to the matching open tag if one exists on the stack
            var p = cur
            while (p != root && p.tag != name) p = p.parent
            if (p != root && p.tag == name) cur = p.parent
            i = end + 1
            textStart = i
          }
        } else { // open tag
          val end = findTagEnd(html, lt)
          if (end < 0) { pushText(n, lt); i = n; textStart = n }
          else {
            val (name, attrs, selfClosed) = parseTag(html.substring(lt + 1, end))
            if (name.isEmpty) { i = end + 1; textStart = i }
            else {
              val el = new Node(name, attrs, "")
              el.parent = cur
              cur.children += el
              i = end + 1
              if (name == "script" || name == "style") {
                // raw-text elements: scan to the literal close tag
                val close = indexOfIgnoreCase(html, "</" + name, i)
                val stop = if (close < 0) n else close
                if (stop > i) {
                  val t = new Node("", Map.empty, html.substring(i, stop))
                  t.parent = el
                  el.children += t
                }
                val gt = html.indexOf('>', stop)
                i = if (close < 0 || gt < 0) n else gt + 1
              } else if (!selfClosed && !voidTags.contains(name)) {
                cur = el
              }
              textStart = i
            }
          }
        }
      }
    }
    root
  }

  // ---- byte-level scanner -------------------------------------------
  // Equivalent to scanLinks but over raw UTF-8 bytes: no document-wide
  // decode, no char[] doubling — the parse stage's memory traffic is
  // what saturates a wide executor, so hrefs are the only bytes that
  // ever become Strings.

  private def lower(b: Byte): Int =
    if (b >= 'A' && b <= 'Z') b + 32 else b & 0xFF

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'

  /** ASCII letter/digit; multi-byte UTF-8 lead/continuation bytes are
    * treated as letters (Character.isLetterOrDigit is true for nearly
    * all of them in tag-name position)
    */
  private def isNameByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || (b & 0x80) != 0

  private def regionEqIgnoreCase(h: Array[Byte], at: Int, needle: String): Boolean = {
    if (at + needle.length > h.length) return false
    var i = 0
    while (i < needle.length) {
      if (lower(h(at + i)) != needle.charAt(i).toInt) return false
      i += 1
    }
    true
  }

  private def indexOfBytesIgnoreCase(h: Array[Byte], needle: String, from: Int): Int = {
    var i = math.max(from, 0)
    val last = h.length - needle.length
    while (i <= last) {
      if (regionEqIgnoreCase(h, i, needle)) return i
      i += 1
    }
    -1
  }

  private def findTagEndBytes(h: Array[Byte], lt: Int): Int = {
    var i = lt + 1
    var quote: Int = 0
    while (i < h.length) {
      val c = h(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i
      i += 1
    }
    -1
  }

  private def utf8(h: Array[Byte], from: Int, until: Int): String =
    new String(h, from, until - from, java.nio.charset.StandardCharsets.UTF_8)

  /** scan an open tag's body (past the name) for its href attribute;
    * mirrors parseTag exactly: body trimmed, one trailing "/" dropped
    * then re-trimmed, LAST href wins (Map overwrite), entity-decoded.
    * Returns null when absent.
    */
  private def hrefOfTagBody(h: Array[Byte], from: Int, until: Int): String = {
    // parseTag: body.trim → drop trailing "/" → trim again
    var end = until
    while (end > from && isWs(h(end - 1))) end -= 1
    if (end > from && h(end - 1) == '/') {
      end -= 1
      while (end > from && isWs(h(end - 1))) end -= 1
    }
    var i = from
    var found: String = null
    while (i < end) {
      while (i < end && isWs(h(i))) i += 1
      if (i < end) {
        val keyStart = i
        while (i < end && !isWs(h(i)) && h(i) != '=') i += 1
        val isHref = i - keyStart == 4 &&
          lower(h(keyStart)) == 'h' && lower(h(keyStart + 1)) == 'r' &&
          lower(h(keyStart + 2)) == 'e' && lower(h(keyStart + 3)) == 'f'
        while (i < end && isWs(h(i))) i += 1
        if (i < end && h(i) == '=') {
          i += 1
          while (i < end && isWs(h(i))) i += 1
          if (i < end && (h(i) == '"' || h(i) == '\'')) {
            val q = h(i)
            val vStart = i + 1
            var vEnd = vStart
            while (vEnd < end && h(vEnd) != q) vEnd += 1
            if (isHref) found = decodeEntities(utf8(h, vStart, vEnd))
            i = if (vEnd < end) vEnd + 1 else end
          } else {
            val vStart = i
            while (i < end && !isWs(h(i))) i += 1
            if (isHref) found = decodeEntities(utf8(h, vStart, i))
          }
        } else if (isHref) found = "" // bare `href` attr: empty value
      }
    }
    found
  }

  /** Byte-level twin of scanLinks — same outputs for the same
    * document bytes (asserted by ScanLinksSpec across profiles and
    * malformed inputs).
    */
  def scanLinksBytes(h: Array[Byte]): Seq[String] = {
    val out = new ArrayBuffer[String](16)
    val n = h.length
    var i = 0
    while (i < n) {
      while (i < n && h(i) != '<') i += 1
      if (i < n) {
        val lt = i
        if (regionEqIgnoreCase(h, lt, "<!--")) {
          val end = indexOfBytesIgnoreCase(h, "-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && h(lt + 1) == '!') {
          var j = lt
          while (j < n && h(j) != '>') j += 1
          i = if (j >= n) n else j + 1
        } else {
          val end = findTagEndBytes(h, lt)
          if (end < 0) i = n
          else {
            val c1 = if (lt + 1 < n) lower(h(lt + 1)) else ' '.toInt
            // after "a": whitespace (attrs follow) or an immediate ">"
            // — anything else makes parseTag's name ≠ "a" (e.g. "a/",
            // "a-x", "a=") and the DOM walk emits nothing
            if (c1 == 'a' && (lt + 2 == end || isWs(h(lt + 2)))) {
              val href = hrefOfTagBody(h, lt + 2, end)
              if (href != null) out += href
              i = end + 1
            } else if (c1 == 's') {
              val isScript = regionEqIgnoreCase(h, lt + 1, "script") &&
                (lt + 7 >= n || !isNameByte(h(lt + 7)))
              val isStyle = !isScript && regionEqIgnoreCase(h, lt + 1, "style") &&
                (lt + 6 >= n || !isNameByte(h(lt + 6)))
              // NOTE: no self-closing exemption — HTML5 ignores the
              // self-closing flag on raw-text elements, so `<script/>`
              // still swallows everything to the next </script>,
              // exactly as the DOM parser does
              if (isScript || isStyle) {
                val name = if (isScript) "script" else "style"
                val close = indexOfBytesIgnoreCase(h, "</" + name, end + 1)
                if (close < 0) i = n
                else {
                  var j = close
                  while (j < n && h(j) != '>') j += 1
                  i = if (j >= n) n else j + 1
                }
              } else i = end + 1
            } else i = end + 1
          }
        }
      }
    }
    out.toSeq
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      if (s.regionMatches(true, i, needle, 0, m)) return i
      i += 1
    }
    -1
  }

  /** index of the '>' closing this tag, respecting quoted attr values */
  private def findTagEnd(html: String, lt: Int): Int = {
    var i = lt + 1
    var quote: Char = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i
      i += 1
    }
    -1
  }

  private def parseTag(s: String): (String, Map[String, String], Boolean) = {
    val body = s.trim
    val selfClosed = body.endsWith("/")
    val inner = if (selfClosed) body.dropRight(1).trim else body
    var i = 0
    while (i < inner.length && !Character.isWhitespace(inner.charAt(i))) i += 1
    val name = inner.substring(0, i).toLowerCase
    if (!name.forall(c => c.isLetterOrDigit || c == '-')) return ("", Map.empty, selfClosed)
    var attrs = Map.empty[String, String]
    while (i < inner.length) {
      while (i < inner.length && Character.isWhitespace(inner.charAt(i))) i += 1
      if (i < inner.length) {
        val keyStart = i
        while (i < inner.length && !Character.isWhitespace(inner.charAt(i)) &&
          inner.charAt(i) != '=') i += 1
        val key = inner.substring(keyStart, i).toLowerCase
        while (i < inner.length && Character.isWhitespace(inner.charAt(i))) i += 1
        if (i < inner.length && inner.charAt(i) == '=') {
          i += 1
          while (i < inner.length && Character.isWhitespace(inner.charAt(i))) i += 1
          if (i < inner.length && (inner.charAt(i) == '"' || inner.charAt(i) == '\'')) {
            val q = inner.charAt(i)
            val vStart = i + 1
            val vEnd = inner.indexOf(q, vStart)
            val v = if (vEnd < 0) inner.substring(vStart) else inner.substring(vStart, vEnd)
            if (key.nonEmpty) attrs += key -> decodeEntities(v)
            i = if (vEnd < 0) inner.length else vEnd + 1
          } else {
            val vStart = i
            while (i < inner.length && !Character.isWhitespace(inner.charAt(i))) i += 1
            if (key.nonEmpty) attrs += key -> decodeEntities(inner.substring(vStart, i))
          }
        } else if (key.nonEmpty) attrs += key -> ""
      }
    }
    (name, attrs, selfClosed)
  }

  // ---- goquery-shaped selection ops (document-order, deterministic) ----

  /** Find(".cls") / Find("tag") / Find("[id^='p']") on a selection:
    * descendants of any selected node matching the simple selector.
    */
  def find(sel: Seq[Node], selector: String): Seq[Node] = {
    val pred = predicateFor(selector)
    val seen = new java.util.IdentityHashMap[Node, Boolean]
    val out = new ArrayBuffer[Node]
    sel.foreach(_.descendants.foreach { d =>
      if (pred(d) && !seen.containsKey(d)) { seen.put(d, true); out += d }
    })
    out.toSeq
  }

  /** goquery Parent() */
  def parentOf(sel: Seq[Node]): Seq[Node] = {
    val seen = new java.util.IdentityHashMap[Node, Boolean]
    sel.flatMap(n => Option(n.parent)).filter { p =>
      if (seen.containsKey(p)) false else { seen.put(p, true); true }
    }
  }

  /** goquery NextUntil(selector): following element siblings up to (not
    * including) the first matching the selector.
    */
  def nextUntil(sel: Seq[Node], selector: String): Seq[Node] = {
    val pred = predicateFor(selector)
    val out = new ArrayBuffer[Node]
    sel.foreach { n =>
      val p = n.parent
      if (p != null) {
        val sibs = p.children.filter(!_.isText)
        val idx = sibs.indexWhere(_ eq n)
        if (idx >= 0) {
          var j = idx + 1
          var stop = false
          while (j < sibs.length && !stop) {
            if (pred(sibs(j))) stop = true
            else { out += sibs(j); j += 1 }
          }
        }
      }
    }
    out.toSeq
  }

  /** goquery Not(selector): drop matching nodes from the selection. */
  def not(sel: Seq[Node], selector: String): Seq[Node] = {
    val pred = predicateFor(selector)
    sel.filterNot(pred)
  }

  /** simple selector predicates: "tag", ".class", "#id", "[attr^='v']",
    * "tag[attr]"
    */
  def predicateFor(selector: String): Node => Boolean = {
    val s = selector.trim
    if (s.startsWith(".")) { val cls = s.substring(1); n => n.classes.contains(cls) }
    else if (s.startsWith("#")) { val id = s.substring(1); n => n.attrs.get("id").contains(id) }
    else if (s.startsWith("[")) attrPredicate(s, _ => true)
    else {
      val br = s.indexOf('[')
      if (br >= 0) {
        val tag = s.substring(0, br).toLowerCase
        attrPredicate(s.substring(br), n => n.tag == tag)
      } else { val tag = s.toLowerCase; n => n.tag == tag }
    }
  }

  private def attrPredicate(s: String, also: Node => Boolean): Node => Boolean = {
    // forms: [attr], [attr='v'], [attr^='v']
    val inner = s.stripPrefix("[").stripSuffix("]")
    val caret = inner.indexOf("^=")
    val eq = inner.indexOf('=')
    if (caret >= 0) {
      val attr = inner.substring(0, caret).trim.toLowerCase
      val v = stripQuotes(inner.substring(caret + 2).trim)
      n => also(n) && n.attrs.get(attr).exists(_.startsWith(v))
    } else if (eq >= 0) {
      val attr = inner.substring(0, eq).trim.toLowerCase
      val v = stripQuotes(inner.substring(eq + 1).trim)
      n => also(n) && n.attrs.get(attr).contains(v)
    } else {
      val attr = inner.trim.toLowerCase
      n => also(n) && n.attrs.contains(attr)
    }
  }

  private def stripQuotes(v: String): String =
    if (v.length >= 2 && (v.head == '\'' || v.head == '"') && v.last == v.head)
      v.substring(1, v.length - 1)
    else v

  /** Text of a selection: per-node descendant text concatenated in
    * selection order (goquery Selection.Text()).
    */
  def textOf(sel: Seq[Node]): String = sel.map(_.textContent).mkString

  /** hrefs of `a[href]` under the selection, document order per
    * selected node (crawler/crawler.go:89-96).
    */
  def links(sel: Seq[Node]): Seq[String] =
    find(sel, "a[href]").flatMap(_.attr("href"))

  /** (href, anchor text) of `a[href]` under the selection, document
    * order. Text is the anchor's full descendant text (nested markup
    * flattened, entities already decoded by the parser), whitespace-
    * normalized: runs collapse to one space, ends trimmed — the form
    * every anchor-text corpus pipeline aggregates on.
    */
  def anchors(sel: Seq[Node]): Seq[(String, String)] =
    find(sel, "a[href]").flatMap(n =>
      n.attr("href").map(h =>
        (h, n.textContent.replaceAll("\\s+", " ").trim)))

  /** Allocation-light whole-document link scan — behaviorally identical
    * to `links(Seq(parse(html)))` for the identity page filter (no DOM
    * tree built; comments, doctype, and script/style raw text skipped
    * exactly as the parser does). The crawl hot path at corpus scale:
    * parsing garbage, not CPU, is what stops a 32-thread executor from
    * scaling, so the scanner only allocates for actual <a> tags.
    */
  def scanLinks(html: String): Seq[String] = {
    val out = new ArrayBuffer[String](16)
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) i = n
      else if (html.startsWith("<!--", lt)) {
        val end = html.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else if (lt + 1 < n && html.charAt(lt + 1) == '!') {
        val end = html.indexOf('>', lt)
        i = if (end < 0) n else end + 1
      } else {
        val end = findTagEnd(html, lt)
        if (end < 0) i = n
        else {
          val c1 = if (lt + 1 < n) html.charAt(lt + 1) else ' '
          if ((c1 == 'a' || c1 == 'A') &&
            (lt + 2 >= n || !Character.isLetterOrDigit(html.charAt(lt + 2)))) {
            val (name, attrs, _) = parseTag(html.substring(lt + 1, end))
            if (name == "a") attrs.get("href").foreach(out += _)
            i = end + 1
          } else if (c1 == 's' || c1 == 'S') {
            // script/style raw text: anchors inside never become DOM.
            // The self-closing flag is deliberately ignored (HTML5
            // ignores it on raw-text elements; the DOM parser does too)
            val (name, _, _) = parseTag(html.substring(lt + 1, end))
            if (name == "script" || name == "style") {
              val close = indexOfIgnoreCase(html, "</" + name, end + 1)
              val gt = if (close < 0) -1 else html.indexOf('>', close)
              i = if (close < 0 || gt < 0) n else gt + 1
            } else i = end + 1
          } else i = end + 1
        }
      }
    }
    out.toSeq
  }
}
