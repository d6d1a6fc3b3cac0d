package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe exact per-host politeness cap (SURVEY A4, north_rule
  * hot-domain skew).
  *
  * Two window phases, both exact, one pass each — no branch ever
  * re-reads the frontier:
  *   1. salted pre-cap: row_number over (host, salt) keeps at most
  *      `budget` rows per salt bucket. The hot host's backlog splits
  *      into `salt` parallel sorts, so no task ever sorts a whole
  *      hot-host backlog (the 10^10-frontier skew bomb). Exact
  *      because each host's true top-`budget` rows are distributed
  *      among the salt buckets, and every bucket keeps its own
  *      top-`budget` — a superset of the global winners.
  *   2. exact cap: one per-host window over phase 1's survivors.
  *      Phase 1 bounds every host to ≤ salt×budget rows, so this
  *      window's per-partition work is bounded by salt×budget
  *      regardless of frontier size or skew — it is NOT a window
  *      over the raw frontier.
  *
  * Rows shuffled: phase 1 moves the frontier once by (host, salt);
  * phase 2 moves only the ≤ hosts×salt×budget survivors by host.
  * No driver-side state, no broadcasts, no recomputation.
  */
object Politeness {

  def capPerHost(df: DataFrame, budget: Int, salt: Int,
      ordering: Seq[Column]): DataFrame = {
    if (budget == Int.MaxValue) return df
    val w1 = Window.partitionBy(col("host"), col("__salt")).orderBy(ordering: _*)
    val pre = df
      .withColumn("__salt", pmod(xxhash64(col("host"), col("url")), lit(math.max(salt, 1))))
      .withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") <= budget)
    if (salt <= 1) return pre.drop("__salt", "__rn1")
    val w2 = Window.partitionBy(col("host")).orderBy(ordering: _*)
    pre
      .withColumn("__rn2", row_number().over(w2))
      .filter(col("__rn2") <= budget)
      .drop("__salt", "__rn1", "__rn2")
  }

  /** Per-batch budgets from robots `Crawl-delay` values: a batch
    * models a `windowSec`-second scheduling window, so a host that
    * asks for `d` seconds between fetches gets
    * clamp(floor(windowSec / d), 1, maxBudget) slots per batch.
    * Output (host, budget) for [[capPerHostBudgets]].
    */
  def budgetsFromDelays(delays: DataFrame, windowSec: Double,
      maxBudget: Int): DataFrame =
    delays.select(col("host"),
      greatest(lit(1), least(lit(maxBudget),
        floor(lit(windowSec) / col("crawl_delay")).cast("int"))).as("budget"))

  /** [[capPerHost]] with PER-HOST budgets (host, budget) — hosts
    * absent from the table fall back to `defaultBudget`. Same
    * two-phase exactness argument: phase 1 keeps each (host, salt)
    * bucket's top budget_h rows — a superset of host h's global top
    * budget_h under `ordering` — and phase 2's exact window runs over
    * ≤ salt×budget_h rows per host regardless of frontier skew. The
    * budgets join is a plain equi join (Catalyst broadcasts it when
    * the table is small; rule-bearing hosts are a dimension, not a
    * corpus).
    */
  def capPerHostBudgets(df: DataFrame, budgets: DataFrame,
      defaultBudget: Int, salt: Int, ordering: Seq[Column]): DataFrame = {
    val withB = df
      .join(budgets.select(col("host"), col("budget")), Seq("host"), "left")
      .withColumn("__budget",
        coalesce(col("budget"), lit(defaultBudget))).drop("budget")
    val w1 = Window.partitionBy(col("host"), col("__salt")).orderBy(ordering: _*)
    val pre = withB
      .withColumn("__salt",
        pmod(xxhash64(col("host"), col("url")), lit(math.max(salt, 1))))
      .withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") <= col("__budget"))
    if (salt <= 1) return pre.drop("__salt", "__rn1", "__budget")
    val w2 = Window.partitionBy(col("host")).orderBy(ordering: _*)
    pre
      .withColumn("__rn2", row_number().over(w2))
      .filter(col("__rn2") <= col("__budget"))
      .drop("__salt", "__rn1", "__rn2", "__budget")
  }
}
