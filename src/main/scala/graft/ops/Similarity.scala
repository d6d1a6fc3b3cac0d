package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-similarity operators (ARRAY<FLOAT> columns).
  *
  * Brute-force top-k is the exactness baseline: broadcast the (small)
  * query set against the corpus — one corpus scan, no shuffle of the
  * corpus, a partial per-partition top-k before the global one.
  * The scale path is hyperplane-LSH bucketing: candidates come from an
  * equi-join on bucket ids, so the corpus shuffles once by bucket and
  * each query probes only its own buckets.
  */
object Similarity {

  /** dot product of two ARRAY<numeric> columns in index order —
    * deterministic FP summation (left-to-right). Backed by the
    * single-pass DotProduct Catalyst expression (unsafe-array reads,
    * no per-invocation products array) — value-identical to the
    * zip_with/aggregate formulation it replaces, ~65× faster on the
    * pair-scoring paths where it runs once per candidate pair.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.vecmath.dot_product(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** zero-norm vectors get similarity 0 (CASE short-circuits, so the
    * ANSI divide-by-zero path is never evaluated)
    */
  def cosine(a: Column, b: Column): Column = {
    val n = l2norm(a) * l2norm(b)
    when(n === 0.0, lit(0.0)).otherwise(dot(a, b) / n)
  }

  /** Exact top-k neighbors per query vector (brute force).
    *
    * @param queries  (query_id BIGINT, embedding ARRAY<FLOAT>) — small,
    *                 broadcast side
    * @param corpus   (vec_id BIGINT, embedding ARRAY<FLOAT>)
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val joined = corpus.as("c")
      .join(broadcast(queries.as("q")),
        col("q.query_id") =!= col("c.vec_id")) // exclude self-match
      .select(
        col("q.query_id"),
        col("c.vec_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
  }

  /** Deterministic random hyperplanes: nBits × dim, seeded splitmix64
    * mapped to [-1, 1). Tiny (nBits·dim doubles) ⇒ literal in the plan.
    */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { d =>
        val h = graft.sites.SyntheticWeb.mix(seed, b.toLong, d.toLong)
        (h.toDouble / Long.MaxValue.toDouble) // in (-1, 1)
      }
    }

  /** md5-arithmetic hyperplanes (foreign-verifiable mode): component
    * [b][d] of table `table` is md5Int20("h:table:b:d") / 2¹⁹ − 1.0 in
    * [−1, 1) — the first-5-md5-hex-digits integer the repo's oracle
    * family (Curation.md5Bucket, the MinHash signature mode) already
    * uses, divided by an exact power of two so the double is
    * bit-exact on any engine. An ANSI oracle recomputes every plane
    * component, every sign-bit bucket and the exact cosine verify —
    * which makes the hyperplane-LSH chain hash-verifiable end to end.
    * The splitmix64 family above stays the production default (20-bit
    * granularity is coarser than 64-bit mixing, though for sign-bucket
    * LSH only the direction distribution matters; recall stays
    * OpsSpec-pinned for both).
    */
  def hyperplanesMd5(nBits: Int, dim: Int, table: Int): Array[Array[Double]] =
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { d =>
        md5Int20(s"h:$table:$b:$d") / 524288.0 - 1.0
      }
    }

  /** first 5 md5 hex digits as an integer — the driver-side twin of
    * conv(substring(md5(s), 1, 5), 16, 10) (shared with the synthetic
    * near-dup image pattern, which must be oracle-recomputable too)
    */
  private[ops] def md5Int20(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 12) | ((d(1) & 0xffL) << 4) | ((d(2) & 0xffL) >>> 4)
  }

  /** sign-bit bucket id of an embedding under the given hyperplanes */
  def lshBucket(embedding: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(embedding, planeCol) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF coarse quantizer init: `k` centroids picked deterministically
    * from the corpus (hash-ordered sample), collected to the driver
    * and broadcast. Refined by [[ivfCentroidsLloyd]].
    */
  def ivfCentroids(corpus: DataFrame, k: Int): Array[Array[Double]] =
    corpus
      .orderBy(md5(concat_ws(",", col("vec_id"))), col("vec_id"))
      .limit(k)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** Lloyd refinement of the sample-init centroids: each iteration is
    * one assignment pass over the corpus (centroids inlined as plan
    * literals, no shuffle of embeddings) and one per-(bucket, dim)
    * mean — the explode shuffles (bucket, idx) 12-byte keys with
    * map-side partial aggregation collapsing each partition to
    * ≤ k·dim rows, so the shuffle is O(partitions · k · dim), never
    * O(corpus). Empty buckets keep their previous centroid, making
    * the refinement deterministic for a given corpus.
    *
    * Each mean is ROUNDED to 6 decimals before becoming a centroid
    * component: a floating-point mean's last ulps depend on the
    * partial-sum merge order (Spark's shuffle fetch order, another
    * engine's aggregation order), and the centroid feeds distance
    * comparisons whose argmin must reproduce bit-identically across
    * runs AND across engines for the driver's DuckDB oracle to refit
    * the whole quantizer (q_knn_ivf). On the 1e-6 grid both engines'
    * rounds land on the same decimal, hence the same double; the
    * quantization perturbs each component by ≤ 5e-7, far below any
    * meaningful centroid separation.
    */
  def ivfCentroidsLloyd(corpus: DataFrame, k: Int, iters: Int = 1): Array[Array[Double]] = {
    var cents = ivfCentroids(corpus, k)
    for (_ <- 0 until iters) {
      val means = corpus
        .select(assignBucket(col("embedding"), cents).as("bucket"),
          col("embedding"))
        .select(col("bucket"), posexplode(col("embedding")).as(Seq("idx", "v")))
        .groupBy(col("bucket"), col("idx"))
        .agg(round(avg(col("v")), 6).as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      cents = next
    }
    cents
  }

  /** Per-centroid distance scores as `array<struct<d, i>>`, built from
    * codegen'd [[dot]] products (argmin of |c|² − 2·v·c ≡ argmin of
    * ‖v − c‖², the |v|² term is constant per row). A Scala UDF here
    * boxed every embedding into a Seq and sorted k tuples per CALL —
    * and the Lloyd pass evaluated it per exploded element (dim× per
    * row) inside a single input task: 7.7 s for 2000×64 floats. The
    * expression form stays in whole-stage codegen: 0.6 s.
    */
  private def centScores(embedding: Column,
      cents: Array[Array[Double]]): Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      struct(
        (lit(c2) - lit(2.0) * dot(embedding, array(c.map(lit): _*))).as("d"),
        lit(i).as("i"))
    }: _*)

  /** nearest-centroid bucket id (ties → lowest index, via struct order) */
  def assignBucket(embedding: Column, cents: Array[Array[Double]]): Column =
    array_min(centScores(embedding, cents)).getField("i")

  /** the `nprobe` nearest centroid ids, nearest first */
  def probeBuckets(embedding: Column, cents: Array[Array[Double]],
      nprobe: Int): Column =
    transform(slice(array_sort(centScores(embedding, cents)), 1, nprobe),
      s => s.getField("i"))

  /** Approximate top-k via IVF: corpus rows live in their nearest
    * centroid's bucket (one shuffle-free assignment pass + one
    * bucket-partitioned layout at scale); each query probes its
    * `nprobe` nearest buckets and exact cosine ranks the candidates.
    * Complement to LSH: data-adaptive buckets vs oblivious hashes.
    *
    * @param lloydIters Lloyd refinement passes over the sample-init
    *   quantizer (0 = raw sample init)
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int = 16, nprobe: Int = 4, lloydIters: Int = 1): DataFrame = {
    val cents = ivfCentroidsLloyd(corpus, nCentroids, lloydIters)
    ivfTopKIndexed(queries, ivfIndex(corpus, cents), cents, k, nprobe)
  }

  /** Build-once IVF index artifact: the corpus with its centroid
    * assignment attached — (vec_id, bucket, embedding), meant to be
    * persisted PARTITIONED BY bucket so a query's `nprobe` buckets
    * prune at the scan. Pair it with [[centroidsDf]] (the quantizer
    * itself, a ≤-nCentroids-row table) and the build cost — sampling,
    * Lloyd refinement, one assignment pass over the corpus — is paid
    * once instead of per query.
    */
  def ivfIndex(corpus: DataFrame, cents: Array[Array[Double]]): DataFrame =
    corpus.select(col("vec_id"), col("embedding"),
      assignBucket(col("embedding"), cents).as("bucket"))

  /** the quantizer as a persistable (bucket, centroid) table */
  def centroidsDf(spark: org.apache.spark.sql.SparkSession,
      cents: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("bucket", "centroid")
  }

  /** load the quantizer back (inverse of [[centroidsDf]], bit-exact) */
  def centroidsOf(df: DataFrame): Array[Array[Double]] =
    df.select(col("bucket"), col("centroid"))
      .collect()
      .sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)

  /** [[ivfTopK]] over the PRE-BUILT artifacts: no sampling, no Lloyd
    * pass, no corpus-wide assignment at query time — the query side
    * picks its `nprobe` buckets against the loaded quantizer and
    * joins only those buckets of the index (partition pruning under a
    * bucket-partitioned layout). Bit-identical to [[ivfTopK]] for the
    * same quantizer (OpsSpec pins it).
    */
  def ivfTopKIndexed(queries: DataFrame, index: DataFrame,
      cents: Array[Array[Double]], k: Int, nprobe: Int = 4): DataFrame = {
    val probed = queries.select(col("query_id"), col("embedding"),
      explode(probeBuckets(col("embedding"), cents, nprobe)).as("bucket"))

    val cands = index.as("c")
      .join(broadcast(probed.as("q")),
        col("q.bucket") === col("c.bucket") &&
          col("q.query_id") =!= col("c.vec_id"))
      .select(col("q.query_id"), col("c.vec_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("sim"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
  }

  /** Embedding-cosine near-duplicate PAIRS, exact: all (a, b) with
    * a < b and cosine ≥ threshold. Quadratic — the small-side oracle
    * and the final verify stage; the corpus-scale path is
    * [[cosineNearDups]].
    */
  def cosinePairsExact(emb: DataFrame, threshold: Double): DataFrame = {
    // norms are per-VECTOR, so compute them below the join (n rows),
    // not per pair (n²/2) — the projection can't be collapsed across
    // the join boundary
    val e = emb.select(col("vec_id"), col("embedding"),
      l2norm(col("embedding")).as("nrm"))
    e.as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        when(col("a.nrm") * col("b.nrm") === 0.0, lit(0.0))
          .otherwise(dot(col("a.embedding"), col("b.embedding")) /
            (col("a.nrm") * col("b.nrm"))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Embedding-cosine near-dup pairs at scale: multi-table hyperplane
    * LSH buckets generate candidate pairs (the shuffles move 8-byte
    * ids; embeddings are joined back only for surviving candidates),
    * exact cosine verifies — the same two-phase contract as
    * minhashNearDups, so output ⊆ cosinePairsExact at the same
    * threshold. Buckets above `maxBucket` are dropped (B²/2 skew
    * bomb), mirroring Dedup.lshCandidates' cap.
    */
  def cosineNearDups(emb: DataFrame, threshold: Double, nBits: Int = 4,
      tables: Int = 8, maxBucket: Int = 10000, seed: Long = 42L): DataFrame = {
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    cosineNearDupsCore(emb, threshold,
      Array.tabulate(tables)(t => hyperplanes(nBits, dim, seed + t)), maxBucket)
  }

  /** [[cosineNearDups]] over md5-mode hyperplanes — the variant the
    * driver's DuckDB gate hash-verifies (see [[hyperplanesMd5]])
    */
  def cosineNearDupsMd5(emb: DataFrame, threshold: Double, nBits: Int = 4,
      tables: Int = 8, maxBucket: Int = 10000): DataFrame = {
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    cosineNearDupsCore(emb, threshold,
      Array.tabulate(tables)(t => hyperplanesMd5(nBits, dim, t)), maxBucket)
  }

  private def cosineNearDupsCore(emb: DataFrame, threshold: Double,
      allPlanes: Array[Array[Array[Double]]], maxBucket: Int): DataFrame = {
    val bucketed = emb.select(
      col("vec_id"),
      posexplode(array(allPlanes.map(p => lshBucket(col("embedding"), p)): _*))
        .as(Seq("table_id", "bucket")))
    val pairs = bucketed
      .groupBy(col("table_id"), col("bucket"))
      .agg(collect_list(col("vec_id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(expr(
        """flatten(transform(ids, (a, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1), b ->
          |    struct(least(a, b) AS vec_a, greatest(a, b) AS vec_b))))"""
          .stripMargin)).as("p"))
      .select(col("p.vec_a"), col("p.vec_b"))
      .distinct()
    pairs
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
      .select(col("vec_a"), col("vec_b"), cosine(col("ea"), col("eb")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Approximate top-k via multi-table hyperplane LSH: `tables`
    * independent bucketings of `nBits` each; a query's candidates are
    * the union of its buckets across tables, then exact cosine ranks
    * them. Recall grows with `tables`, candidate count shrinks with
    * `nBits` — both stay equi-joins at corpus scale.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nBits: Int = 8, tables: Int = 4, seed: Long = 42L): DataFrame = {
    val dim = corpus.select(size(col("embedding"))).first().getInt(0)
    lshTopKCore(queries, corpus, k,
      Array.tabulate(tables)(t => hyperplanes(nBits, dim, seed + t)))
  }

  /** [[lshTopK]] over md5-mode hyperplanes — the variant the driver's
    * DuckDB gate hash-verifies (see [[hyperplanesMd5]])
    */
  def lshTopKMd5(queries: DataFrame, corpus: DataFrame, k: Int,
      nBits: Int = 8, tables: Int = 4): DataFrame = {
    val dim = corpus.select(size(col("embedding"))).first().getInt(0)
    lshTopKCore(queries, corpus, k,
      Array.tabulate(tables)(t => hyperplanesMd5(nBits, dim, t)))
  }

  private def lshTopKCore(queries: DataFrame, corpus: DataFrame, k: Int,
      allPlanes: Array[Array[Array[Double]]]): DataFrame = {
    def bucketed(df: DataFrame, idCol: String): DataFrame =
      df.select(
        col(idCol), col("embedding"),
        posexplode(array(allPlanes.zipWithIndex.map { case (p, t) =>
          lshBucket(col("embedding"), p)
        }: _*)).as(Seq("table_id", "bucket")))

    val cands = bucketed(corpus, "vec_id").as("c")
      .join(broadcast(bucketed(queries, "query_id").as("q")),
        col("q.table_id") === col("c.table_id") &&
          col("q.bucket") === col("c.bucket") &&
          col("q.query_id") =!= col("c.vec_id"))
      .select(col("q.query_id"), col("c.vec_id"),
        col("q.embedding").as("qe"), col("c.embedding").as("ce"))
      .distinct()
    val scored = cands.select(
      col("query_id"), col("vec_id"), cosine(col("qe"), col("ce")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
  }

  /** Axis-sign coarse quantizer: bit j (MSB-first) set iff
    * `embedding[j] > 0` — `nBits` axis-aligned hyperplanes through the
    * origin. The cheapest deterministic semantic bucketing (no learned
    * centroids, no seeded planes), and exactly re-expressible in ANSI
    * SQL, which makes it the foreign-verifiable cluster assignment for
    * [[semDeDup]]'s driver oracle; production runs pass k-means
    * buckets instead (see [[semDeDupKMeans]]).
    */
  def axisSignBucket(embedding: Column, nBits: Int = 4): Column =
    (0 until nBits).map { j =>
      when(embedding.getItem(j) > 0.0f, lit(1 << (nBits - 1 - j)))
        .otherwise(lit(0))
    }.reduce(_ + _)

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering embeddings and pruning within-cluster
    * near-duplicates — pairwise cosine is computed ONLY inside a
    * cluster, turning the O(n²) all-corpus pair problem into Σ|cluster|²
    * with the cluster size as the tuning knob. Keep rule here is
    * deterministic keep-lowest-id: a vector is dropped iff some
    * lower-id vector in the same cluster has cosine ≥ `threshold`
    * with it (the paper keeps the member farthest from the centroid;
    * id order makes the result corpus-stable and oracle-checkable —
    * the kept SET differs only in which representative survives).
    *
    * Returns the kept rows `(vec_id, cluster)`.
    *
    * Scale shape: embeddings shuffle ONCE keyed by cluster on each
    * side of the self-join; clusters larger than `maxCluster` are
    * excluded from pairing (B² skew bomb — same cap contract as
    * lshCandidates/cosineNearDups) and their members are all KEPT;
    * the blast radius of the cap is surfaced by
    * [[semDeDupClusterStats]]. With k-means clusters, k scales so
    * that |cluster| ≈ corpus/k stays under the cap.
    */
  def semDeDup(emb: DataFrame, cluster: Column, threshold: Double,
      maxCluster: Int = 10000): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"),
      cluster.cast("int").as("cluster"))
    val sizes = e.groupBy(col("cluster")).agg(count(lit(1)).as("cn"))
    // norms are per-VECTOR: compute them below the self-join (n rows),
    // not per pair — same layout as cosinePairsExact
    val pairable = e.join(sizes.filter(col("cn") <= maxCluster)
      .select(col("cluster")), Seq("cluster"))
      .withColumn("nrm", l2norm(col("embedding")))
    val dropped = pairable
      .select(col("cluster"), col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("nrm").as("na"))
      .join(pairable.select(col("cluster"), col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("nrm").as("nb")), Seq("cluster"))
      .filter(col("vec_a") < col("vec_b") &&
        when(col("na") * col("nb") === 0.0, lit(0.0))
          .otherwise(dot(col("ea"), col("eb")) /
            (col("na") * col("nb"))) >= threshold)
      .select(col("vec_b").as("vec_id"))
      .distinct()
    e.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cluster"))
  }

  /** Cap blast-radius report for [[semDeDup]]: per-cluster size and
    * whether the cap excluded it from pairing (its members bypass
    * dedup). Run before committing a (clustering, maxCluster) choice.
    */
  def semDeDupClusterStats(emb: DataFrame, cluster: Column,
      maxCluster: Int = 10000): DataFrame =
    emb.select(cluster.cast("int").as("cluster"))
      .groupBy(col("cluster")).agg(count(lit(1)).as("cn"))
      .select(col("cluster"), col("cn"),
        (col("cn") > maxCluster).as("capped"))

  /** Paper-faithful SemDeDup: k-means clusters (sample init + Lloyd
    * refinement, both deterministic) drive [[semDeDup]]. k is the
    * scale lever — the paper uses k ≈ corpus/1e4; centroids broadcast
    * as plan literals, so cluster assignment adds no shuffle.
    */
  def semDeDupKMeans(emb: DataFrame, k: Int, threshold: Double,
      lloydIters: Int = 1, maxCluster: Int = 10000): DataFrame = {
    val cents = ivfCentroidsLloyd(emb, k, lloydIters)
    semDeDup(emb, assignBucket(col("embedding"), cents), threshold,
      maxCluster)
  }
}
