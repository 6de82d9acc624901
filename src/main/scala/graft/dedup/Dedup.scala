package graft.dedup

import graft.text.{TextHash, TextOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each scaling to
  * shuffle-partitioned corpora:
  *
  *  - exact: hash-groupBy on normalized content;
  *  - MinHash + LSH: word-shingle min-hash signatures banded into buckets,
  *    candidate pairs only within buckets (no all-pairs);
  *  - SimHash: 64-bit hyperplane-free simhash from token hashes, near-dup
  *    when Hamming distance ≤ k (banded into k+1 chunks — pigeonhole
  *    guarantees full recall at the requested distance);
  *  - n-gram Jaccard: verification metric on candidate pairs;
  *  - embedding cosine: see graft.sim.Similarity.
  *
  * All column-expression based (codegen); the only shuffles are the
  * bucket joins and group-bys, each keyed to spread uniformly.
  */
object Dedup {

  private def norm(c: Column) =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Exact dedup: canonical row per distinct normalized text. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(norm(col("text")).as("text_norm"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))

  /** Word shingles of length k. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(norm(text), " ")
    array_distinct(filter(
      transform(sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
        i => array_join(slice(toks, i, lit(k)), " ")),
      s => length(s) > 0))
  }

  /** MinHash signature: `perms` min-hashes of the shingle set. JIT'd
    * Scala kernel (graft.text.TextHash) — the arithmetic is the work, so
    * a UDF beats interpreted higher-order expressions by orders of
    * magnitude; the surrounding joins stay declarative.
    */
  def minhashSignature(text: Column, perms: Int = 32, k: Int = 3): Column = {
    val f = udf((t: String) => TextHash.minhash(t, perms, k))
    f(text)
  }

  /** LSH candidate pairs: signatures split into `bands` bands of
    * `perms/bands` rows; docs sharing any band bucket become candidates;
    * verified by shingle Jaccard ≥ `threshold`. Returns (doc_a, doc_b,
    * jaccard) with doc_a < doc_b.
    *
    * Scale shape: the ×bands explode and the bucket self-join carry ONLY
    * (band, bucket, doc_id) — never the text. At corpus scale shuffling
    * the text through 8 band replicas would move the whole corpus 8×;
    * instead the (rare) surviving candidate pairs semi-join the text back
    * for the exact-Jaccard verification.
    */
  def minhashNearDups(documents: DataFrame, perms: Int = 32, bands: Int = 8,
      k: Int = 3, threshold: Double = 0.7): DataFrame = {
    val rows = perms / bands
    val sigs = documents.select(col("doc_id"),
      minhashSignature(col("text"), perms, k).as("sig"))
    val banded = sigs.withColumn("band",
      explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("bucket",
        xxhash64(col("band"),
          array_join(slice(col("sig"), col("band") * rows + 1, lit(rows)), ",")))
      .select(col("doc_id"), col("band"), col("bucket"))

    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    val pairs = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")

    val texts = documents.select(col("doc_id"), col("text"))
    pairs
      .join(texts.select(col("doc_id").as("doc_a"), col("text").as("text_a")),
        Seq("doc_a"))
      .join(texts.select(col("doc_id").as("doc_b"), col("text").as("text_b")),
        Seq("doc_b"))
      .withColumn("jaccard", jaccardUdf(k)(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Shingle Jaccard similarity of two texts. */
  def jaccardUdf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: String, b: String) => TextHash.jaccardShingles(a, b, k))

  def jaccard(a: Column, b: Column, k: Int = 3): Column = jaccardUdf(k)(a, b)

  /** 64-bit SimHash from token hashes: bit i of the result is the sign of
    * the sum over tokens of (bit i of hash(token) ? +1 : -1). JIT'd
    * kernel, same rationale as `minhashSignature`.
    */
  def simhash(text: Column): Column = {
    val f = udf((t: String) => TextHash.simhash64(t))
    f(text)
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b)).cast("long")

  /** SimHash near-dups: band the 64-bit hash into `maxHamming + 1` chunks
    * (widths as even as possible); by pigeonhole a pair within Hamming
    * distance ≤ maxHamming differs in at most maxHamming chunks, so it
    * shares at least one chunk EXACTLY — full recall with an equi-key
    * join, never all-pairs. Only (chunk, chunk_val, doc_id, sig) rides
    * the explode; the Hamming verify needs no text.
    */
  def simhashNearDups(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 63], got $maxHamming")
    val nChunks = maxHamming + 1
    val widths = Array.tabulate(nChunks)(i =>
      64 / nChunks + (if (i < 64 % nChunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val chunkVals = array((0 until nChunks).map { i =>
      val mask = if (widths(i) >= 64) -1L else (1L << widths(i)) - 1L
      call_function("shiftrightunsigned", col("sig"), lit(offsets(i)))
        .bitwiseAND(lit(mask))
    }: _*)

    val withSig = documents.select(col("doc_id"),
      simhash(col("text")).as("sig"))
    val chunked = withSig
      .select(col("doc_id"), col("sig"),
        posexplode(chunkVals).as(Seq("chunk", "chunk_val")))
    val a = chunked.select(col("chunk"), col("chunk_val"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk"), col("chunk_val"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", hamming(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Canonical-survivor selection after near-dup clustering: keep the
    * lowest doc_id of each connected dup-group (union by repeated min —
    * one window pass suffices for pairwise near-dup output).
    */
  def survivors(documents: DataFrame, dups: DataFrame): DataFrame = {
    val loser = dups.select(col("doc_b").as("doc_id")).distinct()
    documents.join(loser, Seq("doc_id"), "left_anti")
  }
}
