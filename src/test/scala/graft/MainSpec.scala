package graft

import java.nio.file.Files

import graft.sites.{Sites, SyntheticWeb}

/** Env-surface parity with the reference (main.go:20-48,
  * util/util.go:15-44, counties/counties.go:31-46): per-site word-list
  * env names, per-site lowercase rules, counties fatal-on-missing —
  * the Spark analogue of main_test.go:14-82.
  */
class MainSpec extends SparkSpec {

  private def wordFile(words: String*): String = {
    val f = Files.createTempFile("graft-words", ".txt")
    Files.write(f, words.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  private def spec(site: String) = SyntheticWeb.Spec(site, numPages = 10L)

  test("STARTING_ENDPOINT beats any word list (crawler.go:30-39)") {
    val url = Main.resolveSeedUrl(spark, Sites.synonyms, spec("synonyms"),
      Map("STARTING_ENDPOINT" -> "http://www.synonyms.com/synonym/pinned",
        "ENGLISH_WORD_LIST_PATH" -> wordFile("ignored")))
    assert(url === "http://www.synonyms.com/synonym/pinned")
  }

  test("synonyms reads ENGLISH_WORD_LIST_PATH and LOWERCASES the word") {
    val url = Main.resolveSeedUrl(spark, Sites.synonyms, spec("synonyms"),
      Map("ENGLISH_WORD_LIST_PATH" -> wordFile("FooBar")))
    assert(url === "http://www.synonyms.com/synonym/foobar")
  }

  test("synonyms-ar reads ARABIC_WORD_LIST_PATH and does NOT lowercase") {
    val url = Main.resolveSeedUrl(spark, Sites.synonymsAr, spec("synonyms-ar"),
      Map("ARABIC_WORD_LIST_PATH" -> wordFile("KalimaX")))
    assert(url === "https://synonyms.reverso.net/synonym/ar/KalimaX")
  }

  test("us_counties seeds from COUNTIES_LIST (same file as allow-list)") {
    val url = Main.resolveSeedUrl(spark, Sites.usCounties, spec("us_counties"),
      Map("COUNTIES_LIST" -> wordFile("C2_County,_Texas")))
    assert(url === "https://en.wikipedia.org/wiki/C2_County,_Texas")
  }

  test("each site's env var is its own: wrong-site vars are ignored") {
    // generic WORD_LIST_PATH is honored as a fallback; another site's
    // var is not
    val url = Main.resolveSeedUrl(spark, Sites.synonyms, spec("synonyms"),
      Map("ARABIC_WORD_LIST_PATH" -> wordFile("wrong")))
    assert(url === SyntheticWeb.pageUrl(spec("synonyms"), 0L)) // default seed
    val url2 = Main.resolveSeedUrl(spark, Sites.synonyms, spec("synonyms"),
      Map("WORD_LIST_PATH" -> wordFile("Generic")))
    assert(url2 === "http://www.synonyms.com/synonym/generic")
  }

  test("missing COUNTIES_LIST is fatal for us_counties (counties.go:34-38)") {
    val e = intercept[RuntimeException] {
      Main.resolveAllowList(spark, Sites.usCounties, spec("us_counties"), Map.empty)
    }
    assert(e.getMessage.contains("COUNTIES_LIST"))
    // sentinel uses the synthetic fixture list
    val syn = Main.resolveAllowList(spark, Sites.usCounties, spec("us_counties"),
      Map("COUNTIES_LIST" -> "synthetic"))
    assert(syn.get.count() === 5) // even page ids of 10
    // a real file loads as (name) rows
    val real = Main.resolveAllowList(spark, Sites.usCounties, spec("us_counties"),
      Map("COUNTIES_LIST" -> wordFile("A_County,_Ohio", "B_County,_Iowa")))
    assert(real.get.columns.toSeq === Seq("name"))
    assert(real.get.count() === 2)
    // non-allowlist sites never load one
    assert(Main.resolveAllowList(spark, Sites.wikipedia, spec("wikipedia"),
      Map.empty).isEmpty)
  }

  test("numeric env validation mirrors parseEnv (main.go:37-47)") {
    assert(Main.envLong(Map("MAX_APPROX_NODES" -> "-1"), "MAX_APPROX_NODES", 5L) === -1L)
    assert(Main.envLong(Map("PARALLELISM" -> "8"), "PARALLELISM", 1L) === 8L)
    assert(Main.envLong(Map.empty, "PARALLELISM", 4L) === 4L)
    intercept[RuntimeException] {
      Main.envLong(Map("MAX_APPROX_NODES" -> "abc"), "MAX_APPROX_NODES", 1L)
    }
    intercept[IllegalArgumentException] {
      Main.envLong(Map("MAX_APPROX_NODES" -> "0"), "MAX_APPROX_NODES", 1L)
    }
  }
}
