package graft.sim

import graft.text.TextHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ approximate nearest neighbor — the third ANN family beside
  * SRP-LSH and plain IVF, after the published inverted-file +
  * product-quantization design (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011; the FAISS
  * `IVF*,PQ*` index family): vectors are compressed to `m` one-byte
  * subspace codes, candidate lists are pruned by an IVF coarse quantizer,
  * and candidates are ranked in the COMPRESSED domain via asymmetric
  * distance computation (ADC) — a per-query lookup table of
  * query-subvector × codeword dot products — before a small exact
  * re-rank.
  *
  * Why this matters at 100 TB: a dim-64 float vector is 256 bytes; its PQ
  * code is `m` = 8 bytes — a 32× reduction in what the candidate join
  * shuffles and the scoring scan reads. The plan never moves raw
  * embeddings except (a) the driver-sized training sample and (b) the
  * final `refine·k` rows per query joined back for the exact re-rank.
  *
  * Structure (all deterministic, any partitioning):
  *  - codebooks: trained driver-side with fixed-iteration Lloyd k-means
  *    per subspace on a hash-sampled, hash-ordered corpus sample
  *    (driver-sized by construction: `sampleN` rows ≤ a few MB) —
  *    matching FAISS's train-on-sample practice; vectors are L2
  *    normalized first so dot products ARE cosines (PQ on raw normalized
  *    vectors, not IVF residuals — residual encoding is a recall
  *    refinement orthogonal to the plan shape, documented deviation);
  *  - codes table: ONE pass over the corpus computing (id, cell, codes),
  *    materialized (both the inverted-list join and nothing else read
  *    it, but the pass is referenced per-query-batch — no-CSE rule);
  *  - candidates: queries explode `nprobe` nearest cells and equi-join
  *    the codes table on cell — 9 bytes of payload per candidate row;
  *  - ADC scoring: per-query LUT (m·ks floats) built once on the driver
  *    from the (small, broadcast-sized by contract — same assumption as
  *    `bruteForceTopK`) query set and broadcast as a map; scoring is one
  *    lookup-add per subspace per candidate;
  *  - re-rank: top `refine·k` per query by ADC score join back their true
  *    embeddings for exact cosine; emitted `cos` values are bit-exact
  *    cosines (same kernel as the brute-force baseline), so recall
  *    witnesses compare directly.
  */
object Pq {

  /** Deterministic per-subspace Lloyd k-means over an L2-normalized
    * sample. Subspace widths distribute `dim` over `m` like chunk widths
    * (no divisibility requirement). Ties break on the lowest centroid
    * index; per-cluster means accumulate in sample order (f64); an empty
    * cluster keeps its previous centroid.
    *
    * @return codebooks(j)(c) = centroid c of subspace j
    */
  def trainCodebooks(sample: Array[Array[Float]], m: Int, ks: Int,
      iters: Int): Array[Array[Array[Float]]] = {
    require(sample.nonEmpty, "PQ training sample is empty")
    require(ks >= 1 && ks <= 256, s"ks must be in [1,256], got $ks")
    val dim = sample.head.length
    val widths = subWidths(dim, m)
    val offsets = widths.scanLeft(0)(_ + _)
    val normed = sample.map(normalize)
    widths.indices.toArray.map { j =>
      val off = offsets(j); val w = widths(j)
      val subs = normed.map(v => java.util.Arrays.copyOfRange(v, off, off + w))
      kmeans(subs, math.min(ks, subs.length), iters)
    }
  }

  private def subWidths(dim: Int, m: Int): Array[Int] = {
    val mm = math.min(m, dim)
    Array.tabulate(mm)(j => dim / mm + (if (j < dim % mm) 1 else 0))
  }

  private def normalize(v: Array[Float]): Array[Float] = {
    var ss = 0.0; var i = 0
    while (i < v.length) { ss += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0.0) v.clone()
    else {
      val out = new Array[Float](v.length)
      i = 0; while (i < v.length) { out(i) = (v(i) / n).toFloat; i += 1 }
      out
    }
  }

  private def kmeans(points: Array[Array[Float]], ks: Int, iters: Int)
      : Array[Array[Float]] = {
    var cents = points.take(ks).map(_.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cents.length)(new Array[Double](points.head.length))
      val counts = new Array[Long](cents.length)
      var i = 0
      while (i < points.length) {
        val p = points(i)
        val c = argminL2(p, cents)
        val s = sums(c); counts(c) += 1
        var d = 0; while (d < p.length) { s(d) += p(d); d += 1 }
        i += 1
      }
      cents = cents.indices.toArray.map { c =>
        if (counts(c) == 0L) cents(c)
        else {
          val mean = new Array[Float](sums(c).length)
          var d = 0
          while (d < mean.length) {
            mean(d) = (sums(c)(d) / counts(c)).toFloat; d += 1
          }
          mean
        }
      }
      it += 1
    }
    cents
  }

  private def argminL2(p: Array[Float], cents: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0.0; var i = 0
      while (i < p.length) {
        val diff = p(i).toDouble - cent(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Encode an (un-normalized) vector: normalize, then per-subspace
    * argmin-L2 codeword index, packed as bytes (ks ≤ 256).
    */
  def encode(v: Array[Float], books: Array[Array[Array[Float]]])
      : Array[Byte] = {
    val normed = normalize(v)
    val out = new Array[Byte](books.length)
    var off = 0; var j = 0
    while (j < books.length) {
      val w = books(j)(0).length
      val sub = java.util.Arrays.copyOfRange(normed, off, off + w)
      out(j) = argminL2(sub, books(j)).toByte
      off += w; j += 1
    }
    out
  }

  /** Per-query ADC lookup table: lut(j*ks + c) = dot(q̂_subspace_j,
    * codeword c). Entries for c ≥ |books(j)| stay 0 (never indexed).
    */
  def adcLut(q: Array[Float], books: Array[Array[Array[Float]]], ks: Int)
      : Array[Float] = {
    val normed = normalize(q)
    val lut = new Array[Float](books.length * ks)
    var off = 0; var j = 0
    while (j < books.length) {
      val w = books(j)(0).length
      var c = 0
      while (c < books(j).length) {
        val cent = books(j)(c)
        var dot = 0.0; var i = 0
        while (i < w) { dot += normed(off + i).toDouble * cent(i); i += 1 }
        lut(j * ks + c) = dot.toFloat
        c += 1
      }
      off += w; j += 1
    }
    lut
  }

  /** ADC score: approximate cosine(q, v) from v's codes and q's LUT. */
  def adcScore(codes: Array[Byte], lut: Array[Float], ks: Int): Float = {
    var s = 0.0; var j = 0
    while (j < codes.length) {
      s += lut(j * ks + (codes(j) & 0xff)); j += 1
    }
    s.toFloat
  }

  /** IVF-PQ top-k. Output matches the other ANN operators:
    * (query_id, corpus_id, cos, rank) with `cos` the EXACT cosine of the
    * re-ranked survivors.
    *
    * @param m       subspaces (bytes per code)
    * @param ks      codewords per subspace (≤ 256)
    * @param sampleN training-sample size (driver-sized)
    * @param iters   Lloyd iterations per subspace
    * @param refine  exact re-rank depth factor: top refine·k ADC
    *                candidates per query get true-cosine re-ranked
    * @param nlist   IVF cells (≤ 0 → √n); nprobe probed cells per query
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      m: Int = 8, ks: Int = 16, sampleN: Int = 2048, iters: Int = 5,
      refine: Int = 4, nlist: Int = -1, nprobe: Int = 4,
      refineIters: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    val n = corpus.count()
    val lists =
      if (nlist > 0) nlist
      else math.max(1, math.round(math.sqrt(n.toDouble)).toInt)

    // hash-ordered sample: deterministic under any partitioning; doubles
    // as the IVF seed list (its prefix), exactly like Similarity.ivfTopK
    val sampleRows = corpus.select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")).asc, col("vec_id").asc)
      .limit(math.max(sampleN, lists))
      .collect()
      .map(r => r.getSeq[Float](1).toArray)
    val seeds = sampleRows.take(lists)
    val centroids =
      if (refineIters > 0) Similarity.refineCentroids(corpus, seeds, refineIters)
      else seeds
    val books = trainCodebooks(sampleRows, m, ks, iters)

    val bcCents = spark.sparkContext.broadcast(centroids)
    val bcBooks = spark.sparkContext.broadcast(books)

    // ONE corpus pass → (corpus_id, cell, codes); 9 bytes of payload per
    // row downstream, materialized once (read per query batch; no-CSE)
    val cell1 = udf((v: Seq[Float]) =>
      TextHash.nearestCentroids(v, bcCents.value, 1).head)
    val enc = udf((v: Seq[Float]) => encode(v.toArray, bcBooks.value))
    val codes = graft.core.SparkUtil.spread(corpus)
      .select(col("vec_id").as("corpus_id"),
        cell1(col("embedding")).as("cell"),
        enc(col("embedding")).as("codes"))
      .localCheckpoint(true)

    // per-query ADC LUTs: the query set is small by the operator's
    // contract (same as bruteForceTopK's broadcast side) — collect once,
    // broadcast the id → LUT map
    val luts: Map[Long, Array[Float]] = queries
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> adcLut(r.getSeq[Float](1).toArray,
        books, ks)).toMap
    val bcLuts = spark.sparkContext.broadcast(luts)
    val score = udf((qid: Long, c: Array[Byte]) =>
      adcScore(c, bcLuts.value(qid), ks))

    val cellP = udf((v: Seq[Float]) =>
      TextHash.nearestCentroids(v, bcCents.value, nprobe))
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .withColumn("cell", explode(cellP(col("query_vec"))))

    // inverted-list probe: equi-join on cell, scored in the compressed
    // domain; ADC ties break on corpus_id for determinism
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("corpus_id").asc)
    val shortlist = codes.join(broadcast(q.select("query_id", "cell")), Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("adc", score(col("query_id"), col("codes")))
      .withColumn("arank", row_number().over(w))
      .filter(col("arank") <= k * refine)
      .select("query_id", "corpus_id")

    // exact re-rank: only refine·k rows per query rejoin true embeddings
    val reranked = shortlist
      .join(corpus.select(col("vec_id").as("corpus_id"),
        col("embedding").as("corpus_vec")), Seq("corpus_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"))), Seq("query_id"))
      .withColumn("cos", Similarity.cosine(col("corpus_vec"), col("query_vec")))
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    reranked.withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }
}
