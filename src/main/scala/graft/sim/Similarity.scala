package graft.sim

import graft.text.TextHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  *
  *  - brute-force cosine top-k (the correctness baseline): broadcast the
  *    (small) query set, one codegen'd pass over the corpus, per-query
  *    top-k via window rank — no all-pairs shuffle;
  *  - LSH-bucketed ANN (the scale path): sign-random-projection bit
  *    signatures from seeded hash planes, equi-join on signature prefix
  *    buckets, exact cosine re-rank inside buckets. At 100 TB the bucket
  *    join shuffles only colliding candidates, not the cross product.
  *
  * Dot products run in a native Catalyst expression
  * (graft.functions.CosineSimilarity): its `doGenCode` splices one static
  * kernel call into whole-stage codegen and reads `ArrayData` in place —
  * no UDF bridge, no per-element boxing, no codegen boundary. (A tight
  * JVM loop had already measured ~100× faster than Catalyst's
  * interpreted higher-order functions, `zip_with` + `aggregate`; the
  * native expression removes the remaining ScalaUDF conversion cost.)
  * Results are bit-identical to the old UDF kernel, so the DuckDB
  * oracles hash-compare unchanged.
  */
object Similarity {

  /** Cosine similarity of two float-array columns (native codegen'd
    * expression — see graft.functions.CosineSimilarity).
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Brute-force cosine top-k: for each query vector (small set,
    * broadcast), the k nearest corpus vectors.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10)
      : DataFrame = {
    val c = graft.core.SparkUtil.spread(corpus)
      .select(col("vec_id").as("corpus_id"),
        col("embedding").as("corpus_vec"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("query_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("corpus_vec"), col("query_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }

  /** Sign-random-projection signature: `bits` pseudo-hyperplanes with
    * deterministic ±1 weights; bit-packed long. Native codegen'd
    * expression (graft.functions.SrpSignature) — the signature pass is
    * bits × dim multiply-adds per row, the hot loop of every LSH query,
    * and the UDF bridge's per-element boxing measured 16× slower on
    * array inputs. Bit-identical to the `TextHash.srpSignature` kernel.
    */
  def srpSignature(vec: Column, bits: Int = 16, seed: Long = 42L): Column =
    srpSignatureExpr(vec, bits, lit(seed))

  private def srpSignatureExpr(vec: Column, bits: Int, seed: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.SrpSignature(
      GraftColumnBridge.expression(vec),
      GraftColumnBridge.expression(seed.cast("long")), bits))
  }

  /** Signature width targeting ~`perBucket` corpus vectors per bucket, so
    * expected candidates per query stay ≈ tables · perBucket no matter the
    * corpus size (constant per-query work; total candidate volume grows
    * linearly with queries, never quadratically with the corpus). Clamped
    * to [6, 24]: beyond ~24 bits the per-table recall of a θ = 60°
    * neighbor, (1 − θ/π)^bits, drops below ~2·10⁻⁶ — at that corpus scale
    * raise `tables` (or multiprobe) rather than widening signatures.
    */
  def autoBits(corpusSize: Long, perBucket: Long = 16L): Int = {
    val buckets = math.max(1L, corpusSize / perBucket)
    val ceilLog2 =
      if (buckets <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1)
    math.min(24, math.max(6, ceilLog2))
  }

  /** LSH ANN: candidates share one of `tables` independent SRP signatures,
    * re-ranked by exact cosine. `bits <= 0` (default) derives the
    * signature width from the corpus size via `autoBits` — one count()
    * job, negligible next to the signature scan.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      bits: Int = -1, tables: Int = 4): DataFrame = {
    val cands = lshCandidates(corpus, queries, bits, tables)
      .withColumn("cos", cosine(col("corpus_vec"), col("query_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (the training-data dedup
    * operator over embeddings): unordered pairs with cosine ≥ threshold.
    *
    *  - `exact = true`: all-pairs with one side broadcast — the
    *    correctness baseline (O(n²) JIT'd dot products; fine to ~10⁵
    *    vectors, and the DuckDB-oracle-able form);
    *  - `exact = false`: SRP-LSH bucketed candidates verified by exact
    *    cosine — the corpus-scale path (candidate volume bounded via
    *    `autoBits`; recall < 1, the standard LSH dedup tradeoff).
    */
  def cosineNearDups(embeddings: DataFrame, threshold: Double,
      exact: Boolean = true, tables: Int = 4): DataFrame = {
    val pairs =
      if (exact) {
        val a = graft.core.SparkUtil.spread(embeddings)
          .select(col("vec_id").as("vec_a"), col("embedding").as("va"))
        val b = embeddings.select(col("vec_id").as("vec_b"),
          col("embedding").as("vb"))
        a.crossJoin(broadcast(b)).filter(col("vec_a") < col("vec_b"))
      } else
        lshCandidates(embeddings, embeddings, -1, tables)
          .filter(col("query_id") < col("corpus_id"))
          .select(col("query_id").as("vec_a"), col("query_vec").as("va"),
            col("corpus_id").as("vec_b"), col("corpus_vec").as("vb"))
    pairs.withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
  }

  /** IVF (inverted-file) ANN — the second scale path beside SRP-LSH: a
    * deterministic, training-free coarse quantizer. `nlist` centroids are
    * the corpus rows with the smallest id hash (stable under any
    * partitioning/order); every corpus vector joins its single nearest
    * centroid's inverted list (one broadcast argmin pass, JIT kernel);
    * a query probes its `nprobe` nearest lists and re-ranks by exact
    * cosine. Per-query candidates ≈ n·nprobe/nlist — with the
    * auto default nlist ≈ √n that is ≈ nprobe·√n, sub-linear per query —
    * and the inverted-list lookup is an equi-join on cell id, never a
    * cartesian. The centroid table is collect+broadcast: nlist ≈ √n
    * keeps it driver-sized at any corpus scale (10⁹ vectors → ~31.6 k
    * centroids ≈ 8 MB at dim 64).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      nlist: Int = -1, nprobe: Int = 4, refineIters: Int = 0): DataFrame = {
    val cands = ivfCandidates(corpus, queries, nlist, nprobe, refineIters)
      .withColumn("cos", cosine(col("corpus_vec"), col("query_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }

  /** IVF candidate pairs with embeddings attached (`private[graft]` for
    * the candidate-volume scaling test).
    */
  private[graft] def ivfCandidates(corpus: DataFrame, queries: DataFrame,
      nlist: Int, nprobe: Int, refineIters: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    val centroids = coarseCentroids(corpus, nlist, refineIters)
    val bc = spark.sparkContext.broadcast(centroids)
    val cell1 = udf((v: Seq[Float]) =>
      TextHash.nearestCentroids(v, bc.value, 1).head)
    val cellP = udf((v: Seq[Float]) =>
      TextHash.nearestCentroids(v, bc.value, nprobe))
    val c = graft.core.SparkUtil.spread(corpus)
      .select(col("vec_id").as("corpus_id"), col("embedding").as("corpus_vec"))
      .withColumn("cell", cell1(col("corpus_vec")))
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .withColumn("cell", explode(cellP(col("query_vec"))))
    c.join(q, Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .drop("cell")
  }

  /** The IVF coarse quantizer's centroid table: `nlist` hash-sampled
    * seed rows (stable under any partitioning/order — the corpus rows
    * with the smallest id hash), optionally sharpened by spherical Lloyd
    * rounds. Driver-sized by construction (nlist ≈ √n default).
    */
  private[graft] def coarseCentroids(corpus: DataFrame, nlist: Int,
      refineIters: Int): Array[Array[Float]] = {
    val n = corpus.count()
    val lists =
      if (nlist > 0) nlist
      else math.max(1, math.round(math.sqrt(n.toDouble)).toInt)
    val seeds: Array[Array[Float]] = corpus
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")).asc, col("vec_id").asc)
      .limit(lists)
      .collect()
      .map(r => r.getSeq[Float](1).toArray)
    if (refineIters > 0) refineCentroids(corpus, seeds, refineIters)
    else seeds
  }

  /** SemDeDup semantic near-duplicate pairs (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540): cluster the embeddings with a
    * k-means coarse quantizer, then compare pairs ONLY within a
    * cluster. The published method's observation is that semantic
    * duplicates land in the same k-means cell, so candidate volume
    * drops from n² to Σ_c |cell_c|² ≈ n²/nlist — with the default
    * nlist ≈ √n, O(n^1.5) dot products instead of O(n²), and the
    * within-cell self-join is an equi-join on cell id (shuffle both
    * sides by cell), never a cartesian.
    *
    * The quantizer is the SAME deterministic coarse quantizer as the
    * IVF index (hash-sampled seeds + spherical Lloyd rounds), and
    * cosines run through the same native expression as the exact arm —
    * bit-identical scores, so the pair set is witnessed as a subset of
    * `cosineNearDups(exact = true)` with recall reported (the standard
    * SemDeDup tradeoff: a cross-cell duplicate pair is missed; raise
    * `refineIters` or lower `nlist` to trade recall against volume).
    *
    * @return (vec_a, vec_b, cos) unordered pairs, vec_a < vec_b.
    */
  def semDedupPairs(embeddings: DataFrame, threshold: Double,
      nlist: Int = -1, refineIters: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    val cents = coarseCentroids(embeddings, nlist, refineIters)
    val bc = spark.sparkContext.broadcast(cents)
    val cell1 = udf((v: Seq[Float]) =>
      TextHash.nearestCentroids(v, bc.value, 1).head)
    // assignment is one kernel pass consumed by BOTH self-join sides —
    // materialize once so the scan + argmin don't run twice
    val c = graft.core.SparkUtil.spread(embeddings)
      .select(col("vec_id"), col("embedding"))
      .withColumn("cell", cell1(col("embedding")))
      .localCheckpoint(true)
    val a = c.select(col("cell"), col("vec_id").as("vec_a"),
      col("embedding").as("va"))
    val b = c.select(col("cell"), col("vec_id").as("vec_b"),
      col("embedding").as("vb"))
    a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
  }

  /** Spherical Lloyd refinement of the IVF coarse quantizer (the standard
    * trained-IVF design, e.g. the published FAISS IVF family and
    * spherical k-means): assign every corpus vector to its nearest seed
    * by cosine, recompute each cell's mean vector, repeat. Raises recall
    * on clustered corpora where hash-sampled seeds land unevenly; the
    * training-free seeds remain the default (refineIters = 0) because a
    * weakly-clustered corpus gains little for the extra passes.
    *
    * Deterministic at any parallelism: assignment ties break on centroid
    * index, per-cell sums run in vec_id order, and an empty cell keeps
    * its previous centroid. Each iteration is ONE shuffle of
    * (cell, vector) rows — grouping by cell, never all-pairs — and the
    * collected centroid table stays driver-sized (nlist ≈ √n). Cosine is
    * scale-invariant, so the un-normalized cell mean acts as the
    * spherical mean direction.
    */
  private[graft] def refineCentroids(corpus: DataFrame,
      seeds: Array[Array[Float]], iters: Int): Array[Array[Float]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var cents = seeds
    (0 until iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(cents)
      val assign = udf((v: Seq[Float]) =>
        TextHash.nearestCentroids(v, bc.value, 1).head)
      val means = graft.core.SparkUtil.spread(corpus)
        .select(col("vec_id"), assign(col("embedding")).as("cell"),
          col("embedding"))
        .as[(Long, Int, Array[Float])]
        .groupByKey(_._2)
        .mapGroups { (cell, it) =>
          val rows = it.toArray.sortBy(_._1)
          val dim = rows.head._3.length
          val sum = new Array[Double](dim)
          rows.foreach { r =>
            val v = r._3
            var d = 0; while (d < dim) { sum(d) += v(d); d += 1 }
          }
          val mean = new Array[Float](dim)
          var d = 0
          while (d < dim) { mean(d) = (sum(d) / rows.length).toFloat; d += 1 }
          (cell, mean)
        }
        .collect()
      val next = cents.clone()
      means.foreach { case (cell, mean) => next(cell) = mean }
      cents = next
    }
    cents
  }

  /** Distinct (query, corpus) candidate pairs sharing a table signature,
    * with both embeddings attached for the exact re-rank
    * (`private[graft]` for the scaling test).
    *
    * Scale shape (same rules as the minhash banding): the ×tables explode
    * and the band join carry ONLY (id, table, sig) — shuffling embeddings
    * through the band replicas would move the corpus `tables`× — and the
    * (rare) surviving pairs join the vectors back. Signatures are
    * materialized once: the band join's sides are independent subtrees
    * (no-CSE Catalyst), so without the boundary every vector would be
    * SRP-hashed twice; in near-dup mode (`queries eq corpus`) both sides
    * read the one materialized table.
    */
  private[graft] def lshCandidates(corpus: DataFrame, queries: DataFrame,
      bits: Int, tables: Int): DataFrame = {
    val b = if (bits > 0) bits else autoBits(corpus.count())
    def sigTable(df: DataFrame, idAlias: String): DataFrame =
      graft.core.SparkUtil.spread(df)
        .select(col("vec_id").as(idAlias), col("embedding").as("__v"))
        .withColumn("table", explode(sequence(lit(0), lit(tables - 1))))
        .withColumn("sig", srpTableSig(col("__v"), b))
        .drop("__v")
        .localCheckpoint(true)
    val cs = sigTable(corpus, "corpus_id")
    val qs =
      if (queries eq corpus)
        cs.select(col("corpus_id").as("query_id"), col("table"), col("sig"))
      else sigTable(queries, "query_id")
    cs.join(qs, Seq("table", "sig"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select("query_id", "corpus_id")
      .dropDuplicates("query_id", "corpus_id")
      .join(corpus.select(col("vec_id").as("corpus_id"),
        col("embedding").as("corpus_vec")), Seq("corpus_id"))
      .join(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec")), Seq("query_id"))
  }

  /** Table-seeded SRP signature (seed derived from the `table` column —
    * the seed child of the native expression, so one codegen'd kernel
    * serves every table replica).
    */
  private def srpTableSig(vec: Column, bits: Int): Column =
    srpSignatureExpr(vec, bits, lit(7700L) + col("table"))
}
