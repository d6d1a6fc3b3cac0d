package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe exact per-host politeness cap (SURVEY A4, north_rule
  * hot-domain skew).
  *
  * Three phases, all exact:
  *   1. salted pre-cap: row_number over (host, salt) keeps at most
  *      `budget` rows per salt bucket — the hot host's backlog splits
  *      into `salt` parallel sorts, so no task ever sorts a whole
  *      hot-host backlog;
  *   2. host classification: one 8-byte-key aggregation finds hosts
  *      still over budget after phase 1 (at 10^10 scale this set is
  *      tiny — only genuinely hot hosts);
  *   3. exact cap: ONLY over-budget hosts take the per-host window,
  *      and each sees at most salt×budget rows. Everything else
  *      passes through untouched — the common case costs zero
  *      window work beyond phase 1.
  */
object Politeness {

  def capPerHost(df: DataFrame, budget: Int, salt: Int,
      ordering: Seq[Column]): DataFrame = {
    if (budget == Int.MaxValue) return df
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col("host"), col("url")), lit(salt)))
    val w1 = Window.partitionBy(col("host"), col("__salt")).orderBy(ordering: _*)
    val pre = salted
      .withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") <= budget)
      .drop("__salt", "__rn1")

    val hot = pre.groupBy(col("host")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > budget)
      .select(col("host"))

    val pass = pre.join(broadcast(hot), Seq("host"), "left_anti")
    val w2 = Window.partitionBy(col("host")).orderBy(ordering: _*)
    val capped = pre.join(broadcast(hot), Seq("host"), "left_semi")
      .withColumn("__rn2", row_number().over(w2))
      .filter(col("__rn2") <= budget)
      .drop("__rn2")
    pass.unionByName(capped)
  }
}
