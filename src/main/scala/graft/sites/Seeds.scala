package graft.sites

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seed sources (SURVEY S7/S8).
  *
  * The reference picks a uniformly random line from a newline word
  * list (util/util.go:15-44) or calls a random-article API
  * (wikipedia/wiki.go:33-60). Randomness is replaced by a
  * deterministic digest order so runs are reproducible: the "random"
  * line is the one whose md5(word, salt) sorts first — uniform over
  * the file for any fixed salt, different salt ⇒ different pick.
  */
object Seeds {

  /** read a word list file: one word per line, blanks dropped */
  def readWordList(spark: SparkSession, path: String,
      toLower: Boolean = false): DataFrame = {
    val raw = spark.read.text(path)
      .select(trim(col("value")).as("word"))
      .filter(col("word") =!= "")
    if (toLower) raw.select(lower(col("word")).as("word")) else raw
  }

  /** deterministic "random" pick; mirrors ReadRandomLineFromFile's
    * contract (non-empty result or error) — empty list is a hard
    * failure like the reference's fatal path
    */
  def pickSeed(words: DataFrame, salt: String = "42"): String = {
    val row = words
      .orderBy(md5(concat(col("word"), lit(salt))), col("word"))
      .limit(1).collect()
    require(row.nonEmpty, "seed word list is empty")
    row(0).getString(0)
  }

  /** seed URL for a site profile: base + prefix + word */
  def seedUrl(profile: SiteProfile, word: String): String =
    s"${profile.base}${profile.prefix}$word"
}
