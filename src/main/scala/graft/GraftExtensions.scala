package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.SqlFunctions

/** Session-extension entry point: set
  * `spark.sql.extensions=graft.GraftExtensions` and every graft
  * custom expression (shingle_hash64, nfc_normalize,
  * repetition_stats, min_md5_shingle, dot_product, clean_name,
  * canonical_url, host_of) is available to plain `spark.sql` — the standard way a
  * deployed cluster picks the library up without code changes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    SqlFunctions.all.foreach(extensions.injectFunction)
}
