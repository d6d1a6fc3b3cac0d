package graft.functions

/** Byte-exact Scala port of the canonicalization kernel used by the
  * reference site adapters (CleanUrl), built from public Go stdlib
  * semantics.
  *
  * Reference behavior (see /root/reference):
  *   - wikipedia/wiki.go:63-75  — TrimPrefix(base) → TrimPrefix(prefix)
  *     → ToLower → ReplaceAll("_"," ") → url.QueryUnescape; on
  *     unescape error the *empty string* is returned (Go's
  *     QueryUnescape returns ("", err); the caller keeps that value).
  *   - synonyms/synonyms.go:40-55 and ar_synonyms/ar_synonyms.go:44-59
  *     additionally strip the https variant of the base endpoint.
  *
  * Two subtleties that make built-in Spark functions unusable here:
  *   1. Go lowercases the *encoded* form before decoding, so escapes
  *      arrive with lowercase hex (`%c3%b8`); the decoder must accept
  *      lowercase hex (Go's does).
  *   2. Spark's `url_decode` throws on a malformed escape and
  *      `try_url_decode` yields NULL — the contract here is "" .
  */
object GoUrl {

  /** Port of Go `strings.ToLower`: per-rune simple case mapping.
    * (Java's `String.toLowerCase` applies locale-sensitive *full*
    * mappings — e.g. U+0130 expands to two chars — which Go does not.)
    */
  def goToLower(s: String): String = {
    var i = 0
    val n = s.length
    // fast path: ASCII, nothing to change
    var needs = false
    while (i < n && !needs) {
      val c = s.charAt(i)
      if (c >= 'A') needs = true else i += 1
    }
    if (!needs) return s
    val sb = new java.lang.StringBuilder(n)
    i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Port of Go `net/url.QueryUnescape`. Decodes `%XX` (hex, either
    * case) and `+` → space; a `%` not followed by two hex digits is an
    * error → None. Operates on UTF-8 bytes like Go does.
    */
  def queryUnescape(s: String): Option[String] = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == '%') {
        if (i + 2 >= bytes.length) return None
        val h1 = hexVal(bytes(i + 1).toChar)
        val h2 = hexVal(bytes(i + 2).toChar)
        if (h1 < 0 || h2 < 0) return None
        out.write((h1 << 4) | h2)
        i += 3
      } else if (b == '+') {
        out.write(' ')
        i += 1
      } else {
        out.write(b)
        i += 1
      }
    }
    Some(new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
  }

  private def trimPrefix(s: String, p: String): String =
    if (p.nonEmpty && s.startsWith(p)) s.substring(p.length) else s

  /** The full CleanUrl chain shared by all four site adapters.
    *
    * @param base     base endpoint stripped first (e.g. "https://en.wikipedia.org")
    * @param altBase  second base to strip ("" = none); the synonyms
    *                 adapters strip the https-upgraded base too
    * @param prefix   path prefix stripped next (e.g. "/wiki/")
    */
  def cleanName(link: String, base: String, altBase: String, prefix: String): String = {
    if (link == null) return null
    var s = trimPrefix(link, base)
    if (altBase.nonEmpty) s = trimPrefix(s, altBase)
    s = trimPrefix(s, prefix)
    s = goToLower(s)
    s = s.replace("_", " ")
    queryUnescape(s).getOrElse("")
  }

  // --- north_rule full-URL canonicalization (beyond the reference) ---

  /** Canonical URL per BASELINE.json north_rule: lowercase scheme+host,
    * strip fragment, strip default ports (http:80 / https:443), sort
    * query params, drop trailing "?" for empty query, keep path as-is
    * ("" path with a host → "/").
    */
  def canonicalUrl(url: String): String = {
    if (url == null) return null
    val noFrag = { val h = url.indexOf('#'); if (h >= 0) url.substring(0, h) else url }
    val schemeEnd = noFrag.indexOf("://")
    if (schemeEnd < 0) return noFrag // relative URL: fragment-strip only
    val scheme = goToLower(noFrag.substring(0, schemeEnd))
    val rest = noFrag.substring(schemeEnd + 3)
    val pathStart = { val i = rest.indexOf('/'); val q = rest.indexOf('?'); if (i < 0 && q < 0) rest.length else if (i < 0) q else if (q >= 0 && q < i) q else i }
    var host = goToLower(rest.substring(0, pathStart))
    if (scheme == "http" && host.endsWith(":80")) host = host.dropRight(3)
    if (scheme == "https" && host.endsWith(":443")) host = host.dropRight(4)
    var pathAndQuery = rest.substring(pathStart)
    val qIdx = pathAndQuery.indexOf('?')
    if (qIdx >= 0) {
      val path = pathAndQuery.substring(0, qIdx)
      val query = pathAndQuery.substring(qIdx + 1)
      if (query.isEmpty) pathAndQuery = path
      else {
        val sorted = query.split("&", -1).sorted.mkString("&")
        pathAndQuery = path + "?" + sorted
      }
    }
    if (pathAndQuery.isEmpty) pathAndQuery = "/"
    scheme + "://" + host + pathAndQuery
  }

  /** Host component of an absolute URL, lowercased, port stripped;
    * "" for relative URLs.
    */
  def hostOf(url: String): String = {
    if (url == null) return null
    val schemeEnd = url.indexOf("://")
    if (schemeEnd < 0) return ""
    val rest = url.substring(schemeEnd + 3)
    var end = rest.length
    var i = 0
    var found = false
    while (i < rest.length && !found) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') { end = i; found = true }
      i += 1
    }
    val hostPort = rest.substring(0, end)
    val colon = hostPort.lastIndexOf(':')
    goToLower(if (colon >= 0) hostPort.substring(0, colon) else hostPort)
  }
}
