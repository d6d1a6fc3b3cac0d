package graft

import org.apache.spark.sql.functions._

import graft.ops.Classifier

/** Hashed-feature logistic regression: distributed full-batch GD must
  * match a serial reference implementation of the same recurrence,
  * learn a separable corpus, and keep gram strings out of every
  * shuffle.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // en-ish (label 1) vs de-ish (label 0) — separable by vocabulary
  private val docsSeq = Seq(
    (0L, "the cat sat on the mat with the dog", 1.0),
    (1L, "the dog ran to the park and the cat", 1.0),
    (2L, "a cat and a dog sat with the mat", 1.0),
    (3L, "the park and the mat with a dog", 1.0),
    (4L, "der hund und die katze auf der matte", 0.0),
    (5L, "die katze lief zu der wiese und der hund", 0.0),
    (6L, "ein hund und eine katze auf der matte", 0.0),
    (7L, "die wiese und die matte mit einem hund", 0.0))
  private lazy val docs = docsSeq.toDF("doc_id", "text", "y")

  /** serial reference: identical grams, md5 buckets, GD recurrence */
  private def serialTrain(rows: Seq[(Long, String, Double)], buckets: Int,
      iters: Int, lr: Double): Map[Long, Double] = {
    def bucketOf(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      val hex = d.take(3).map(b => f"$b%02x").mkString.take(5)
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    def feats(t: String): Map[Long, Double] = {
      val toks = t.split("\\s+").toSeq
      val grams = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val cnt = grams.map(bucketOf).groupBy(identity)
        .view.mapValues(_.size.toDouble).toMap
      val n = cnt.values.sum
      cnt.view.mapValues(_ / n).toMap
    }
    val f = rows.map { case (id, t, y) => (id, feats(t), y) }
    val n = rows.size.toDouble
    var w = Map.empty[Long, Double].withDefaultValue(0.0)
    val allBuckets = f.flatMap(_._2.keys).distinct
    for (it <- 0 until iters) {
      val grads = collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      f.foreach { case (_, x, y) =>
        val m = x.map { case (b, v) => v * w(b) }.sum
        val p = if (it == 0) 0.5 else 1.0 / (1.0 + math.exp(-m))
        x.foreach { case (b, v) => grads(b) += (p - y) * v }
      }
      w = allBuckets.map(b => b -> (w(b) - lr / n * grads(b))).toMap
        .withDefaultValue(0.0)
    }
    w
  }

  private def serialScore(rows: Seq[(Long, String, Double)], buckets: Int,
      w: Map[Long, Double]): Map[Long, Double] = {
    def bucketOf(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      val hex = d.take(3).map(b => f"$b%02x").mkString.take(5)
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    rows.map { case (id, t, _) =>
      val toks = t.split("\\s+").toSeq
      val grams = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val cnt = grams.map(bucketOf).groupBy(identity)
        .view.mapValues(_.size.toDouble).toMap
      val n = cnt.values.sum
      val m = cnt.map { case (b, c) => c / n * w.getOrElse(b, 0.0) }.sum
      id -> 1.0 / (1.0 + math.exp(-m))
    }.toMap
  }

  test("trainLogistic matches the serial GD recurrence (3 iters)") {
    val got = Classifier.trainLogistic(docs, col("y"), buckets = 4096,
      iters = 3, lr = 10.0).as[(Long, Double)].collect().toMap
    val exp = serialTrain(docsSeq, 4096, 3, 10.0)
    // every corpus bucket gets a weight row; values match to FP-sum
    // reordering tolerance
    assert(got.keySet == exp.keySet.filter(exp(_) != 0.0) ||
      got.keySet == exp.keySet, (got.keySet -- exp.keySet).toString)
    got.foreach { case (b, w) =>
      assert(math.abs(w - exp(b)) < 1e-9, s"bucket $b: $w vs ${exp(b)}")
    }
  }

  test("scoreLogistic matches the serial sigmoid and separates classes") {
    val w = Classifier.trainLogistic(docs, col("y"), buckets = 4096,
      iters = 5, lr = 10.0)
    val got = Classifier.scoreLogistic(docs, w, buckets = 4096)
      .as[(Long, Double)].collect().toMap
    val exp = serialScore(docsSeq, 4096, serialTrain(docsSeq, 4096, 5, 10.0))
    got.foreach { case (id, p) =>
      assert(math.abs(p - exp(id)) < 1e-9, s"doc $id: $p vs ${exp(id)}")
    }
    // the separable corpus separates: every positive outscores every negative
    val pos = (0L to 3L).map(got)
    val neg = (4L to 7L).map(got)
    assert(pos.min > neg.max, got.toString)
    // and training moved probabilities off the 0.5 prior in the right direction
    assert(pos.forall(_ > 0.5) && neg.forall(_ < 0.5), got.toString)
  }

  test("training is stable under repartitioning (hash features, exact batch)") {
    val a = Classifier.trainLogistic(docs, col("y"), buckets = 4096,
      iters = 2, lr = 10.0).as[(Long, Double)].collect().toMap
    val b = Classifier.trainLogistic(docs.repartition(7), col("y"),
      buckets = 4096, iters = 2, lr = 10.0).as[(Long, Double)].collect().toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12, k.toString) }
  }

  test("plan: gram strings never shuffle; weight table broadcasts") {
    val w = Classifier.trainLogistic(docs, col("y"), buckets = 1024,
      iters = 2, lr = 1.0)
    val scored = Classifier.scoreLogistic(docs, w, buckets = 1024)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    plan.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains("gram"), l))
  }
}
