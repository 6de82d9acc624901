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
  *    when Hamming distance ≤ k (banded on two-chunk combinations of k+2
  *    chunks — pigeonhole guarantees full recall at the requested
  *    distance with wide join keys);
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
  def minhashNearDups(documentsIn: DataFrame, perms: Int = 32, bands: Int = 8,
      k: Int = 3, threshold: Double = 0.7): DataFrame = {
    val rows = perms / bands
    // the minhash signature pass is the compute-heavy stage — spread it
    // when the input's file layout under-parallelizes (see SparkUtil)
    val documents = graft.core.SparkUtil.spread(documentsIn)
    // materialize the signatures: the banding table self-joins below, and
    // Catalyst plans each join side as an independent subtree (no CSE) —
    // without the boundary every document is shingled and min-hashed
    // TWICE. 32 longs/doc materialized vs ~16k hash mixes re-run.
    val sigs = documents.select(col("doc_id"),
      minhashSignature(col("text"), perms, k).as("sig"))
      .localCheckpoint(true)
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

  /** Persisted MinHash-LSH index of a corpus snapshot: the
    * (doc_id, band, bucket) banding table of `minhashNearDups`, exposed
    * so a continuously-growing corpus can write it once (bucketed
    * Parquet by (band, bucket) at scale) and dedup every later increment
    * against it WITHOUT re-hashing a byte of old text — the pattern that
    * keeps crawl-refresh dedup linear in the increment, not the corpus.
    */
  def minhashIndex(documentsIn: DataFrame, perms: Int = 32, bands: Int = 8,
      k: Int = 3): DataFrame = {
    val rows = perms / bands
    val documents = graft.core.SparkUtil.spread(documentsIn)
    val sigs = documents.select(col("doc_id"),
      minhashSignature(col("text"), perms, k).as("sig"))
    sigs.withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("bucket",
        xxhash64(col("band"),
          array_join(slice(col("sig"), col("band") * rows + 1, lit(rows)), ",")))
      .select(col("doc_id"), col("band"), col("bucket"))
  }

  /** Incremental near-dup detection: all near-duplicate pairs with AT
    * LEAST ONE side in the new batch — (new × old) via the persisted
    * `index`, plus (new × new) via a self-join — without re-banding the
    * old corpus. Banding is deterministic, so the result EQUALS the
    * full-corpus `minhashNearDups(old ∪ new)` restricted to pairs
    * touching the batch (the committed witness asserts exactly that).
    *
    * Scale shape: the old corpus contributes only its (band, bucket,
    * doc_id) index rows — at 100 TB the index equi-join prunes to the
    * buckets the batch actually hits (partition pruning on a bucketed
    * index table), old TEXT is touched only for verified candidates via
    * the final semi-join on `corpusTexts`, and the batch itself is
    * hashed once. Output (doc_a, doc_b, jaccard) with doc_a < doc_b,
    * exactly like `minhashNearDups`.
    *
    * @param index       `minhashIndex` of the snapshot (old docs only)
    * @param corpusTexts (doc_id, text) of the snapshot — the corpus
    *                    table itself; only candidate ids read it
    * @param newDocs     the increment (ids disjoint from the snapshot)
    */
  def minhashNearDupsIncremental(index: DataFrame, corpusTexts: DataFrame,
      newDocs: DataFrame, perms: Int = 32, bands: Int = 8, k: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    // new-batch banding, materialized: it feeds BOTH the index join and
    // its own self-join (no-CSE rule)
    val newBanded = minhashIndex(newDocs, perms, bands, k)
      .localCheckpoint(true)
    val newSide = newBanded.select(col("band"), col("bucket"),
      col("doc_id").as("new_id"))
    val oldPairs = newSide
      .join(index.select(col("band"), col("bucket"),
        col("doc_id").as("old_id")), Seq("band", "bucket"))
      .filter(col("old_id") =!= col("new_id")) // guard: overlapping ids
      .select(least(col("old_id"), col("new_id")).as("doc_a"),
        greatest(col("old_id"), col("new_id")).as("doc_b"))
    val newPairs = newSide
      .join(newBanded.select(col("band"), col("bucket"),
        col("doc_id").as("doc_b")), Seq("band", "bucket"))
      .filter(col("new_id") < col("doc_b"))
      .select(col("new_id").as("doc_a"), col("doc_b"))
    val pairs = oldPairs.unionByName(newPairs)
      .dropDuplicates("doc_a", "doc_b")
    val texts = corpusTexts.select(col("doc_id"), col("text"))
      .unionByName(newDocs.select(col("doc_id"), col("text")))
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

  /** SimHash near-dups: band the 64-bit hash into `maxHamming + 2` chunks
    * (widths as even as possible); by pigeonhole a pair within Hamming
    * distance ≤ maxHamming differs in at most maxHamming chunks, so at
    * least TWO chunks match EXACTLY — the pair shares at least one of the
    * C(m,2) two-chunk combination keys. Full recall with an equi-key
    * join, never all-pairs, and the join key carries 2·⌊64/m⌋ bits of
    * signature (both chunk values packed into one long) instead of the
    * single-chunk ⌊64/(k+1)⌋ bits: at maxHamming = 8 that is ~12.8-bit
    * values spread over 45 disjoint combination keys, vs the degenerate
    * 7-bit single-chunk keys whose buckets grow as n/128 and turn the
    * verify quadratic at corpus scale. Only (combo, key, doc_id, sig)
    * rides the explode; the Hamming verify needs no text.
    *
    * Candidate-volume envelope (uniform-hash worst case): E[candidates] ≈
    * C(m,2)·n²/2^(2·⌊64/m⌋); at maxHamming = 8 the coefficient is ~155×
    * smaller than the single-chunk scheme's (k+1)/2^⌊64/(k+1)⌋. For
    * guarantees much beyond ~10 bits on a 64-bit simhash the right scale
    * move is a wider (128-bit) simhash, not more chunks.
    */
  def simhashNearDups(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val (nChunks, widths, offsets, joined, _) =
      simhashComboJoin(documents, maxHamming)
    // canonical-route + Hamming verify in ONE map-side filter: a pair at
    // distance d matches through C(m−d, 2) ≥ 1 combination keys; keeping
    // only the row whose combo is the lexicographically-first clean
    // (error-free) chunk pair makes each pair survive exactly once, so no
    // pair-dedup shuffle follows the join at all. Pure codegen'd integer
    // ops — a Scala UDF here costs ~2× the whole join (measured 11.8M
    // candidate rows: 3 s join, +5.5 s UDF filter, +0.3 s this filter).
    val x = col("sig_a").bitwiseXOR(col("sig_b"))
    // bit i of cm = 1 iff chunk i of the xor is all-zero (clean)
    val cm = (0 until nChunks).map { i =>
      val mask = if (widths(i) >= 64) -1L else (1L << widths(i)) - 1L
      when(call_function("shiftrightunsigned", x, lit(offsets(i)))
        .bitwiseAND(lit(mask)) === 0L, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    joined
      .filter(call_function("bit_count", x) <= maxHamming &&
        col("combo") === canonicalCombo(cm, nChunks))
      .withColumn("hamming", call_function("bit_count", x).cast("long"))
      .select("doc_a", "doc_b", "hamming")
  }

  /** Canonical combo as a function of the m-bit clean mask: the
    * lexicographically-first clean chunk pair, encoded i·m + j. Catalyst
    * inlines aliased subtrees into every reference (no CSE), so deriving
    * first/second-set-bit indexes arithmetically from `cm` replicates
    * the m-CASE mask tree ~6× into the join condition (measured ~600
    * int ops per candidate row); a 2^m lookup-table literal references
    * `cm` exactly once. The measured win was at m = 10 (1 KB table);
    * capped at 2^14 (64 KB) — beyond that the table bloats plan
    * serialization and task binaries for no measured benefit, so larger
    * maxHamming falls back to the arithmetic bit-trick form.
    */
  private def canonicalCombo(cm: Column, nChunks: Int): Column =
    if (nChunks <= 14) {
      val table = Array.tabulate(1 << nChunks) { cmv =>
        val rest = cmv & (cmv - 1)
        if (cmv == 0 || rest == 0) -1 // < 2 clean chunks: never matches
        else Integer.numberOfTrailingZeros(cmv) * nChunks +
          Integer.numberOfTrailingZeros(rest)
      }
      element_at(lit(table), cm.cast("int") + 1)
    } else {
      // lowest set bit b: bit_count((b & -b) - 1); clearing it
      // (cm & (cm-1)) yields the second-lowest. On rejected rows the
      // -1 underflow just yields a never-matching 64.
      def lowestIdx(c: Column): Column =
        call_function("bit_count", c.bitwiseAND(-c) - 1)
      lowestIdx(cm) * nChunks + lowestIdx(cm.bitwiseAND(cm - 1))
    }

  /** 128-bit SimHash near-dups — the documented scale move past the
    * 64-bit hash: same C(m,2) two-chunk combination banding and
    * canonical-route filter (full recall at Hamming ≤ maxHamming by
    * pigeonhole, exactly-once per pair, no pair-dedup shuffle), but the
    * combo keys carry 2·⌊128/m⌋ signature bits — double the width — so
    * the uniform-collision candidate floor drops quadratically and
    * Hamming budgets past ~10 bits stay usable. Kernel returns
    * (lo, hi, combo, key) in one pass; signatures materialized before
    * the self-join (each join side is an independent subtree).
    */
  def simhashNearDups128(documentsIn: DataFrame, maxHamming: Int = 12): DataFrame = {
    // 62 keeps the clean mask in one long (m = maxHamming + 2 ≤ 64) —
    // far past any useful near-dup Hamming budget on a 128-bit simhash
    require(maxHamming >= 0 && maxHamming <= 62,
      s"maxHamming must be in [0, 62], got $maxHamming")
    val documents = graft.core.SparkUtil.spread(documentsIn)
    val nChunks = maxHamming + 2
    val widths = TextHash.chunkWidths(nChunks, 128)
    val offsets = widths.scanLeft(0)(_ + _)
    val bands = udf((t: String) => TextHash.simhashBands128(t, maxHamming))

    val sigRows = documents
      .select(col("doc_id"), bands(col("text")).as("bands"))
      .localCheckpoint(true)
    val chunked = sigRows
      .select(col("doc_id"), explode(col("bands")).as("ck"))
      .select(col("doc_id"), col("ck._1").as("lo"), col("ck._2").as("hi"),
        col("ck._3").as("combo"), col("ck._4").as("key"))
    val a = chunked.select(col("combo"), col("key"),
      col("doc_id").as("doc_a"), col("lo").as("lo_a"), col("hi").as("hi_a"))
    val b = chunked.select(col("combo"), col("key"),
      col("doc_id").as("doc_b"), col("lo").as("lo_b"), col("hi").as("hi_b"))
    val joined = a.join(b, Seq("combo", "key"))
      .filter(col("doc_a") < col("doc_b"))

    val xlo = col("lo_a").bitwiseXOR(col("lo_b"))
    val xhi = col("hi_a").bitwiseXOR(col("hi_b"))
    // bit i of cm = 1 iff chunk i of the 128-bit xor is all-zero; chunks
    // may straddle the word boundary — pure Column shift/mask arithmetic
    val cm = (0 until nChunks).map { i =>
      val off = offsets(i); val w = widths(i)
      val mask = if (w >= 64) -1L else (1L << w) - 1L
      val v: Column =
        if (off + w <= 64) call_function("shiftrightunsigned", xlo, lit(off))
        else if (off >= 64) call_function("shiftrightunsigned", xhi, lit(off - 64))
        else call_function("shiftrightunsigned", xlo, lit(off))
          .bitwiseOR(call_function("shiftleft", xhi, lit(64 - off)))
      when(v.bitwiseAND(lit(mask)) === 0L, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val hamming = (call_function("bit_count", xlo) +
      call_function("bit_count", xhi)).cast("long")
    joined
      .filter(hamming <= maxHamming && col("combo") === canonicalCombo(cm, nChunks))
      .withColumn("hamming", hamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Distinct candidate pairs sharing a two-chunk combination key, before
    * the exact-Hamming verify. `private[graft]` so the key-cardinality
    * scale test can assert the candidate volume directly.
    */
  private[graft] def simhashCandidatePairs(documents: DataFrame,
      maxHamming: Int): DataFrame =
    simhashComboJoin(documents, maxHamming)._4
      .dropDuplicates("doc_a", "doc_b")

  private[graft] def simhashRawJoinCount(documents: DataFrame,
      maxHamming: Int): Long =
    simhashComboJoin(documents, maxHamming)._4.count()

  private[graft] def simhashBuckets(documents: DataFrame,
      maxHamming: Int): DataFrame =
    simhashComboJoin(documents, maxHamming)._5

  /** Shared banding core: explode each doc's C(m,2) two-chunk combination
    * band keys (m = maxHamming + 2, single-pass JIT'd kernel) and
    * self-equi-join on (combo, value bucket).
    */
  private def simhashComboJoin(documentsIn: DataFrame, maxHamming: Int)
      : (Int, Array[Int], Array[Int], DataFrame, DataFrame) = {
    require(maxHamming >= 0 && maxHamming <= 62,
      s"maxHamming must be in [0, 62], got $maxHamming")
    val documents = graft.core.SparkUtil.spread(documentsIn)
    val nChunks = maxHamming + 2
    val widths = TextHash.simhashChunkWidths(nChunks)
    val offsets = widths.scanLeft(0)(_ + _)
    val bands = udf((t: String) => TextHash.simhashBands(t, maxHamming))

    // ONE text hash per doc: the kernel returns (sig, combo, key) triples
    // and rides in a single projection (a separate sig UDF would
    // tokenize+hash every text a second time — no-CSE Catalyst cannot
    // share it), MATERIALIZED before the explode because the banding
    // table self-joins below and each join side would otherwise re-run
    // the kernel over the corpus. ~1 KB/doc materialized vs re-tokenizing
    // the text; the post-boundary explode is pure array iteration.
    val sigRows = documents
      .select(col("doc_id"), bands(col("text")).as("bands"))
      .localCheckpoint(true)
    val chunked = sigRows
      .select(col("doc_id"), explode(col("bands")).as("ck"))
      .select(col("doc_id"), col("ck._1").as("sig"),
        col("ck._2").as("combo"), col("ck._3").as("key"))
    val a = chunked.select(col("combo"), col("key"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("combo"), col("key"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val joined = a.join(b, Seq("combo", "key"))
      .filter(col("doc_a") < col("doc_b"))
    (nChunks, widths, offsets, joined, chunked)
  }

  /** Exact n-gram Jaccard near-dup join via AllPairs/PPJoin-style prefix
    * filtering (public algorithm family: Bayardo et al., "Scaling Up All
    * Pairs Similarity Search", WWW'07; Xiao et al., "Efficient Similarity
    * Joins for Near Duplicate Detection", WWW'08): every document pair
    * whose word-k-gram shingle-set Jaccard reaches `threshold`, found
    * WITHOUT an all-pairs comparison and with full recall —
    *
    *  - order every set by global shingle rarity (document frequency asc,
    *    hash asc: one total order for the whole corpus);
    *  - prefix of a size-n set = its first n − ⌈t·n⌉ + 1 elements. If
    *    J(A,B) ≥ t then the FIRST common element in the global order lies
    *    inside BOTH prefixes (were it outside A's, the ≥ ⌈t·n_A⌉ ordered
    *    predecessors in A would all be non-shared, capping the overlap at
    *    ⌈t·n_A⌉ − 1 < t·n_A ≤ t/(1+t)·(n_A+n_B), the minimum overlap
    *    J ≥ t demands given the size bound n_B ≥ t·n_A) — so the
    *    equi-join on PREFIX shingles alone misses nothing;
    *  - candidates then verify with the exact merge-count Jaccard kernel.
    *
    * Scale shape: every shuffle carries (doc_id, shingle_hash) longs —
    * never text or shingle strings; prefix shingles are by construction
    * the globally RAREST elements of each set, so the self-join's bucket
    * sizes are bounded by rare-key document frequencies rather than
    * stop-shingle frequencies (the failure mode of a naive inverted-index
    * join), and the length filter n_b ∈ [t·n_a, n_a/t] prunes before the
    * pair-dedup. The exploded shingle table is materialized once — it
    * feeds the frequency count, the prefix window and both join sides,
    * and Catalyst re-executes unmaterialized branches (no cross-branch
    * CSE); ~16 B/shingle stored vs re-tokenizing the corpus three times.
    *
    * Output (doc_a, doc_b, jaccard), doc_a < doc_b — jaccard is
    * |A∩B| / |A∪B| over distinct shingle sets, so the whole operator is
    * ANSI-SQL-expressible and oracle-checked exactly (the one near-dup
    * operator where that is possible; minhash/simhash are hash-seeded).
    * Documents with an EMPTY shingle set (blank text) pair with nothing —
    * a pair must share at least one shingle, matching the SQL definition.
    */
  def ngramJaccardNearDups(documentsIn: DataFrame, k: Int = 3,
      threshold: Double = 0.5,
      materializeShingles: Boolean = true): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val documents = graft.core.SparkUtil.spread(documentsIn)
    val shSet = udf((t: String) => TextHash.shingleHashSet(t, k))
    // the shingle table feeds two branches (document frequency AND the
    // prefix build) — Catalyst has no cross-branch CSE, so either
    // materialize it once (default: ~8 B/token to executor disk, the
    // right trade below ~TB inputs) or recompute it per branch
    // (materializeShingles = false: two tokenize passes, ZERO
    // intermediate storage — the right trade at crawl scale, where the
    // shingle table rivals the corpus itself; same rationale as
    // decontaminateFuzzy's documented 3-pass design). Results identical.
    val sh0 = documents
      .select(col("doc_id"), explode(shSet(col("text"))).as("sh"))
    val sh = if (materializeShingles) sh0.localCheckpoint(true) else sh0
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy("doc_id")
    val order = byDoc.orderBy(col("df").asc, col("sh").asc)
    // one exchange by doc_id serves both window functions (set size and
    // rarity rank); ceil guarded an ulp low so FP can only LENGTHEN the
    // prefix (extra candidates), never shorten it (lost recall)
    // df >= 2 prefilter is LOSSLESS for the pair join below: a shingle
    // shared by docs a and b has document frequency >= 2 by definition,
    // so a df=1 prefix entry joins with nothing (it can only meet its own
    // doc, which doc_a < doc_b discards). Dropping those rows AFTER the
    // prefix positions (n, rn) are fixed cuts the self-join input by the
    // unique-shingle mass — the dominant fraction on real corpora — while
    // p_a/p_b keep their full-prefix positions, so the PPJoin positional
    // bound is unchanged and every true pair still survives through its
    // first shared element.
    val prefix = graft.core.SparkUtil.materializeOnce(
      sh.join(dfreq, "sh")
        .withColumn("n", count(lit(1)).over(byDoc))
        .withColumn("rn", row_number().over(order))
        .filter(col("rn") <= col("n") - ceil(col("n") * threshold - 1e-9) + 1)
        .filter(col("df") >= 2L)
        .select(col("sh"), col("doc_id"), col("n"), col("rn")))
    val a = prefix.select(col("sh"), col("doc_id").as("doc_a"),
      col("n").as("n_a"), col("rn").as("p_a"))
    val b = prefix.select(col("sh"), col("doc_id").as("doc_b"),
      col("n").as("n_b"), col("rn").as("p_b"))
    // PPJoin positional filter (lossless): at a pair's FIRST shared
    // element — positions p_a, p_b in the global sort — everything
    // earlier on each side is non-shared, so the overlap is at most
    // 1 + min(n_a − p_a, n_b − p_b); J ≥ t needs overlap ≥
    // ⌈t/(1+t)·(n_a+n_b)⌉, so rows whose positional bound falls short
    // cannot be a first match and a true pair always survives through
    // its first-match row. Cuts candidate volume before the pair-dedup.
    val overlapBound = lit(1.0) +
      least(col("n_a") - col("p_a"), col("n_b") - col("p_b"))
    val requiredOverlap =
      (col("n_a") + col("n_b")) * (threshold / (1.0 + threshold)) - 1e-9
    // n_a/n_b ride along (identical for every row of a pair, so the
    // pair-keyed dedup is unaffected) — the verify below needs only the
    // intersection size once the set sizes are known
    val cand = a.join(b, Seq("sh"))
      .filter(col("doc_a") < col("doc_b") &&
        col("n_b") >= col("n_a") * threshold - 1e-9 &&
        col("n_a") >= col("n_b") * threshold - 1e-9 &&
        overlapBound >= requiredOverlap)
      .select("doc_a", "doc_b", "n_a", "n_b")
      .dropDuplicates("doc_a", "doc_b")
    // Verify against each doc's PRECOMPUTED distinct shingle set instead
    // of re-tokenizing both texts per candidate pair (the old jaccardUdf
    // re-ran the shingle kernel 2× per candidate; candidates outnumber
    // true pairs by orders of magnitude, so tokenization dominated the
    // verify stage — guide §1.2 "per-task work"). One tokenize pass over
    // the corpus, then a codegen'd array_intersect per pair. Bit-identical
    // result: both sets are the same distinct shingle sets the UDF built
    // internally, n_x equals the set size (the window count over the
    // exploded distinct set), and inter/(n_a+n_b-inter) divides the same
    // exactly-representable integers — a candidate's sets are never empty
    // (it has at least one prefix row), so the UDF's empty-set branches
    // cannot fire on this path.
    val docSets = documents.select(col("doc_id"), shSet(col("text")).as("shs"))
    cand
      .join(docSets.select(col("doc_id").as("doc_a"), col("shs").as("sa")),
        Seq("doc_a"))
      .join(docSets.select(col("doc_id").as("doc_b"), col("shs").as("sb")),
        Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Repeated-span detection — the substring-level dedup primitive from
    * the published training-data literature (suffix-array substring dedup,
    * e.g. Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", ACL'22), re-expressed for Spark: every word-k-gram span
    * (with positions — NOT the distinct shingle set) that occurs in at
    * least `minDocs` distinct documents, with its document and occurrence
    * counts. Downstream pipelines cut or down-weight the flagged spans.
    *
    * Two arms:
    *  - `hashOnly = false` (default, the oracle arm): group by the span
    *    STRING — ANSI-SQL-expressible, so the driver's DuckDB oracle
    *    checks it exactly; the shuffle carries ~k tokens per position,
    *    the honest cost the suffix-array literature exists to avoid on
    *    one node.
    *  - `hashOnly = true` (the 100 TB arm): group by `xxhash64(span)` —
    *    8-byte shuffle keys instead of ×k text amplification, plus a
    *    `min(span)` exemplar per group; counts are exact modulo 64-bit
    *    hash collisions.
    *
    * Documents with fewer than k tokens contribute no spans (substring
    * dedup wants full-length spans only — unlike `shingles`, which falls
    * back to the whole-text shingle for short docs).
    */
  def duplicateSpans(documentsIn: DataFrame, k: Int = 10, minDocs: Int = 2,
      hashOnly: Boolean = false): DataFrame = {
    require(k >= 1 && minDocs >= 2,
      s"need k >= 1 and minDocs >= 2, got k=$k minDocs=$minDocs")
    val documents = graft.core.SparkUtil.spread(documentsIn)
    val toks = split(norm(col("text")), " ")
    val spans = transform(sequence(lit(1), size(toks) - (k - 1)),
      i => array_join(slice(toks, i, lit(k)), " "))
    val sp = documents
      .filter(size(toks) >= k)
      .select(col("doc_id"), explode(spans).as("span"))
    if (hashOnly)
      sp.groupBy(xxhash64(col("span")).as("span_hash"))
        .agg(min("span").as("span"),
          countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .filter(col("n_docs") >= minDocs)
        .select("span", "n_docs", "n_occurrences")
    else
      sp.groupBy("span")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .filter(col("n_docs") >= minDocs)
  }

  /** Per-document duplication coverage — the decision signal built on
    * `duplicateSpans`: for every document, the fraction of its token
    * positions covered by at least one repeated span (a span occurring in
    * ≥ `minDocs` distinct documents). Pipelines drop or down-weight
    * documents above a coverage threshold; boilerplate-heavy documents
    * score near 1.0, unique text scores 0.
    *
    * One positional-span table feeds both the repeated-span aggregation
    * and the coverage join (materialized once — no-CSE rule); position
    * coverage is the distinct-count of exploded span offsets, an exact
    * interval union. Output (doc_id, n_tokens, covered_tokens, coverage)
    * for EVERY document — short and unique docs included with coverage 0
    * — and `coverage` is an exact integer ratio, so the whole operator is
    * SQL-expressible and DuckDB-oracled.
    */
  def spanCoverage(documentsIn: DataFrame, k: Int = 10,
      minDocs: Int = 2, hashKeys: Boolean = false): DataFrame = {
    require(k >= 1 && minDocs >= 2,
      s"need k >= 1 and minDocs >= 2, got k=$k minDocs=$minDocs")
    val documents = graft.core.SparkUtil.spread(documentsIn)
    val toksCol = filter(split(norm(col("text")), " "), t => length(t) > 0)
    // tokens tokenized once; the table feeds the span explode AND the
    // final every-document join (no-CSE rule)
    val base = documents
      .select(col("doc_id"), toksCol.as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .localCheckpoint(true)
    // hashKeys: the positional table carries xxhash64(span) — 8 bytes
    // instead of ~k tokens of TEXT per position. The string form is a
    // ~k× amplification of the corpus materialized to disk: fine at
    // bench scale and the DuckDB-oracle-exact arm, ruinous at crawl
    // scale. Counts identical modulo 64-bit collisions (the
    // duplicateSpans hashOnly argument).
    val keyExpr =
      if (hashKeys) xxhash64(col("col")) else col("col")
    val sp = graft.core.SparkUtil.materializeOnce(
      base.filter(col("n_tokens") >= k)
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(1), size(col("toks")) - (k - 1)),
          i => array_join(slice(col("toks"), i, lit(k)), " "))))
        .select(col("doc_id"), (col("pos") + 1).as("start"),
          keyExpr.as("span")))
    val dup = sp.groupBy("span")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= minDocs)
      .select("span")
    val covered = sp.join(dup, "span")
      .select(col("doc_id"),
        explode(sequence(col("start"), col("start") + (k - 1))).as("pos"))
      .groupBy("doc_id")
      .agg(countDistinct("pos").as("covered_tokens"))
    base.select("doc_id", "n_tokens")
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .withColumn("coverage",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("covered_tokens").cast("double") / col("n_tokens")))
  }

  /** Duplicated-span REMOVAL — the surgery that `duplicateSpans` /
    * `spanCoverage` only measure: rewrite every document with the token
    * positions covered by a repeated span (≥ `minDocs` distinct
    * documents) cut out, in original order — the substring-dedup write
    * path of Lee et al. ACL'22, re-expressed as relational ops. Output
    * one row per document: (doc_id, n_tokens, removed_tokens,
    * clean_text); untouched documents keep their full (normalized)
    * token stream, fully-covered documents come back empty.
    *
    * Plan shape: the positional span table is built once (materialized —
    * it feeds both the repeated-span aggregation and the covered-position
    * explode; no-CSE rule); covered positions are a distinct (doc_id,
    * pos) set; the rewrite is posexplode → anti-join covered →
    * re-assemble per doc via sort_array(collect_list(struct(pos, tok)))
    * — pos is unique per document, so the struct sort is a total order
    * and the result is deterministic under any partitioning. The only
    * text-bearing shuffle is the per-document re-assembly groupBy, which
    * any rewrite must pay; spans and positions shuffle as slim keys.
    * Every step is ANSI-SQL-expressible (ordered string_agg over the
    * anti-joined position table), so the operator is DuckDB-oracled
    * end-to-end including the rewritten text.
    */
  def removeDuplicateSpans(documentsIn: DataFrame, k: Int = 10,
      minDocs: Int = 2, hashKeys: Boolean = false): DataFrame = {
    require(k >= 1 && minDocs >= 2,
      s"need k >= 1 and minDocs >= 2, got k=$k minDocs=$minDocs")
    val documents = graft.core.SparkUtil.spread(documentsIn)
    val toksCol = filter(split(norm(col("text")), " "), t => length(t) > 0)
    val base = documents
      .select(col("doc_id"), toksCol.as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .localCheckpoint(true)
    // hashKeys: 8-byte span keys instead of span TEXT in the
    // materialized positional table — see spanCoverage
    val keyExpr =
      if (hashKeys) xxhash64(col("col")) else col("col")
    val sp = graft.core.SparkUtil.materializeOnce(
      base.filter(col("n_tokens") >= k)
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(1), size(col("toks")) - (k - 1)),
          i => array_join(slice(col("toks"), i, lit(k)), " "))))
        .select(col("doc_id"), (col("pos") + 1).as("start"),
          keyExpr.as("span")))
    val dup = sp.groupBy("span")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= minDocs)
      .select("span")
    val covered = sp.join(dup, "span")
      .select(col("doc_id"),
        explode(sequence(col("start"), col("start") + (k - 1))).as("pos"))
      .distinct()
    val tokPos = base
      .select(col("doc_id"), col("n_tokens"), posexplode(col("toks")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
    val kept = tokPos.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x("tok")), " ").as("clean_text"))
    base.select("doc_id", "n_tokens")
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("kept_tokens"), lit(0L)))
          .as("removed_tokens"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Benchmark decontamination — the evaluation-set n-gram-overlap scan
    * from the published LM training-data methodology (GPT-3's 13-gram
    * test-set filter, Brown et al. 2020 appendix C; Dodge et al. 2021's
    * C4 benchmark-overlap audit): flag every corpus document that shares
    * at least one word-k-gram with any benchmark document, with exact
    * per-document overlap counts and the contaminated fraction of its
    * distinct shingle set.
    *
    * Scale shape: the benchmark side is tiny relative to the corpus
    * (evaluation suites are megabytes against a 100 TB crawl), so its
    * DISTINCT shingle-hash set is broadcast — the corpus is never
    * shuffled by shingle. The corpus side is one projection (a single
    * shingle-kernel pass, k 8-byte hashes per position), a map-side
    * broadcast probe, and one groupBy(doc_id) whose partial aggregation
    * collapses each document's rows to one before the exchange, so the
    * only shuffle carries ~n_docs count rows. Output (doc_id, n_ngrams,
    * n_shared, contamination) for contaminated documents only; both
    * counts are over the document's distinct shingle set and
    * `contamination` is an exact integer-ratio double, so the operator is
    * ANSI-SQL-expressible and DuckDB-oracled exactly (shingle-hash
    * equality ≡ shingle-string equality: the chained-FNV shingle hash is
    * injective on the corpus modulo 2⁻⁶⁴ collisions, and the ' '-join of
    * whitespace-free tokens is injective — same argument as
    * `ngramJaccardNearDups`'s oracle).
    */
  /** Flag-only arm of benchmark decontamination: (doc_id) rows for the
    * documents sharing ≥ 1 `k`-gram with the benchmark — EXACTLY the
    * doc set `decontaminate` emits (its n_shared ≥ 1 filter), without
    * the per-doc counts. The benchmark's distinct shingle hashes are
    * collected and broadcast as a flat sorted array (8 B/shingle —
    * eval suites are small by construction; the crawl-vs-everything
    * direction keeps the Bloom arm) and each corpus document answers
    * with one map-side binary-searched exists() — no corpus-shingle
    * explode, no per-doc aggregation exchange (guide §2.4/§3.2: the
    * consumer that only needs the decision shuffles nothing). Used by
    * the curation funnel's stage 4, whose decision column is the only
    * thing it consumes; DecontaminateSpec pins set-equality with the
    * counting arm.
    */
  def contaminatedDocs(corpusIn: DataFrame, benchmark: DataFrame,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"need k >= 1, got k=$k")
    val spark = corpusIn.sparkSession
    val corpus = graft.core.SparkUtil.spread(corpusIn)
    val shSet = udf((t: String) => TextHash.shingleHashSet(t, k))
    import spark.implicits._
    val bench: Array[Long] = benchmark
      .select(explode(shSet(col("text"))).as("sh")).distinct()
      .as[Long].collect().sorted
    val bc = spark.sparkContext.broadcast(bench)
    val hit = udf { (t: String) =>
      val arr = bc.value
      TextHash.shingleHashSet(t, k)
        .exists(h => java.util.Arrays.binarySearch(arr, h) >= 0)
    }
    corpus.filter(hit(col("text"))).select(col("doc_id"))
  }

  def decontaminate(corpusIn: DataFrame, benchmark: DataFrame,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"need k >= 1, got k=$k")
    val corpus = graft.core.SparkUtil.spread(corpusIn)
    val shSet = udf((t: String) => TextHash.shingleHashSet(t, k))
    val benchSh = benchmark
      .select(explode(shSet(col("text"))).as("sh")).distinct()
      .withColumn("hit", lit(1))
    val corpSh = corpus
      .select(col("doc_id"), explode(shSet(col("text"))).as("sh"))
    corpSh.join(broadcast(benchSh), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ngrams"), count(col("hit")).as("n_shared"))
      .filter(col("n_shared") >= 1)
      .withColumn("contamination",
        col("n_shared").cast("double") / col("n_ngrams"))
  }

  /** Bloom-filter arm of benchmark decontamination — the shape that holds
    * when the benchmark side outgrows a raw broadcast set. The exact arm
    * above broadcasts the benchmark's distinct shingle hashes as a hashed
    * relation: 8 bytes a shingle plus join-map overhead, fine for
    * evaluation suites but not for the other standard use of the same
    * scan — filtering a new crawl against EVERYTHING already trained on,
    * where the "benchmark" is billions of shingles. A Bloom filter at
    * `fpp` compresses that to ~1.44·log2(1/fpp) BITS per shingle (~10 bits
    * at 1%: 1.2 GB per 10⁹ shingles vs tens of GB hashed), still one
    * broadcast + a map-side probe — the corpus is never shuffled by
    * shingle, same as the exact arm.
    *
    * Semantics: no false negatives — every truly contaminated document is
    * flagged and every true shared shingle counted (`mightContain` never
    * misses an inserted value), so the flagged set is a SUPERSET of the
    * exact arm's and per-doc `n_shared` is an upper bound, inflated only
    * by false positives at ~`fpp` per clean shingle. That one-sidedness is
    * the property pipelines need: decontamination may over-drop slightly,
    * never under-drop. Note the doc-level consequence: a clean document of
    * n distinct shingles is spuriously flagged with probability
    * 1-(1-fpp)^n, so `fpp` must be sized against DOCUMENT shingle counts,
    * not wished at 1% — the 1e-4 default holds spurious flags under ~5%
    * for 500-shingle documents; pipelines filtering on the `contamination`
    * fraction rather than n_shared ≥ 1 are insensitive to fpp entirely.
    * Both one-sidedness properties are asserted against the exact arm in
    * DedupSpec.
    *
    * The filter is built by Spark's native `stat.bloomFilter` aggregate
    * (tree-aggregated `putLong`s, one pass over the benchmark) and shipped
    * once as a broadcast variable; the probe is a Long→Boolean UDF —
    * string-free, so the ScalaUDF bridge costs no boxing on the hot path.
    */
  def decontaminateBloom(corpusIn: DataFrame, benchmark: DataFrame,
      k: Int = 3, fpp: Double = 1e-4,
      expectedShingles: Long = 0L): DataFrame = {
    require(k >= 1, s"need k >= 1, got k=$k")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val corpus = graft.core.SparkUtil.spread(corpusIn)
    val shSet = udf((t: String) => TextHash.shingleHashSet(t, k))
    val benchSh = benchmark
      .select(explode(shSet(col("text"))).as("sh")).distinct()
    // sizing: caller-provided estimate at real scale (a count() over 100 TB
    // of benchmark just to size a filter is wasteful — pipelines know their
    // suite sizes); fall back to an exact count at test/bench scale
    val n = if (expectedShingles > 0L) expectedShingles
      else math.max(benchSh.count(), 1L)
    val bf = benchSh.stat.bloomFilter("sh", n, fpp)
    val bfB = corpus.sparkSession.sparkContext.broadcast(bf)
    val hit = udf((sh: Long) => bfB.value.mightContainLong(sh))
    corpus
      .select(col("doc_id"), explode(shSet(col("text"))).as("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(hit(col("sh")), 1L).otherwise(0L)).as("n_shared"))
      .filter(col("n_shared") >= 1)
      .withColumn("contamination",
        col("n_shared").cast("double") / col("n_ngrams"))
  }

  /** Fuzzy (near-match) benchmark decontamination — the containment arm
    * the exact scan above cannot express: a benchmark item lightly
    * paraphrased or EMBEDDED inside a long document shares a large
    * fraction of ITS OWN shingles while contributing a tiny fraction of
    * the document's, so both the doc-level `contamination` ratio and any
    * symmetric Jaccard stay low. Real pipelines therefore also run an
    * asymmetric overlap pass per benchmark ITEM (the methodology family
    * of GPT-3's eval dedup, Brown et al. 2020 appendix C, and Dodge et
    * al. 2021): emit every (document, benchmark item) pair whose
    * containment |A∩B| / |B| ≥ `threshold` (A = document's distinct
    * word-k-gram set, B = the item's), with exact counts.
    *
    * Full recall without all-pairs, via a prefix filter on the BENCHMARK
    * side: under any fixed total order of an item's n_b shingles, if a
    * document shares ≥ ⌈t·n_b⌉ of them, the shared elements cannot all
    * fit in the suffix of size ⌈t·n_b⌉ − 1 — so the item's first
    * n_b − ⌈t·n_b⌉ + 1 shingles (its prefix) contain at least one shared
    * element, and an equi-join of benchmark PREFIXES against ALL corpus
    * shingles misses no qualifying pair. The order is chosen rarest-in-
    * corpus-first (corpus document frequency asc, hash asc), so prefix
    * keys are the corpus-rarest shingles of each item and candidate
    * volume is bounded by rare-key document frequencies.
    *
    * Scale shape: the benchmark side is tiny (evaluation suites vs a
    * 100 TB crawl) — its shingle table, the df lookup for it, and the
    * final prefix table all BROADCAST; the corpus is never shuffled by
    * shingle. Three linear corpus passes, no corpus-sized shuffle:
    * (1) df of benchmark shingles only — a broadcast semi-probe whose
    * partial aggregation ships one count per matched shingle; (2) the
    * candidate probe against the broadcast prefix; (3) the text fetch
    * that joins the (small) deduped candidate set back for verification
    * with the exact merge-count kernel. Re-scanning beats materializing
    * a 100 TB tokenization, and the rare-prefix candidate bound is worth
    * the extra tokenize pass over a hash-ordered single-pass prefix.
    * Counts are over
    * distinct shingle sets and `containment` is an integer-ratio double,
    * so the operator is ANSI-SQL-expressible and DuckDB-oracled exactly
    * (same hash/string injectivity argument as `ngramJaccardNearDups`).
    *
    * @return (doc_id, bench_id, n_bench, n_shared, containment), one row
    *         per qualifying pair; items with empty shingle sets pair
    *         with nothing (a pair must share at least one shingle)
    */
  def decontaminateFuzzy(corpusIn: DataFrame, benchmark: DataFrame,
      k: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(k >= 1, s"need k >= 1, got k=$k")
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val corpus = graft.core.SparkUtil.spread(corpusIn)
    val shSet = udf((t: String) => TextHash.shingleHashSet(t, k))
    val benchSh = graft.core.SparkUtil.materializeOnce(benchmark
      .select(col("doc_id").as("bench_id"), explode(shSet(col("text"))).as("sh")))
    val corpSh = corpus
      .select(col("doc_id"), explode(shSet(col("text"))).as("sh"))
    // corpus document frequency, computed for benchmark shingles only;
    // a shingle absent from the corpus keeps df 0 (sorts first, matches
    // nothing — recall unaffected: the prefix argument holds under ANY
    // total order)
    val dfreq = corpSh
      .join(broadcast(benchSh.select("sh").distinct()), Seq("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
    val byItem = Window.partitionBy("bench_id")
    val order = byItem.orderBy(col("df").asc, col("sh").asc)
    // ceil guarded an ulp low, mirroring ngramJaccardNearDups: FP error
    // can only LENGTHEN the prefix, never cost recall
    val prefix = benchSh.join(dfreq, Seq("sh"), "left")
      .na.fill(0L, Seq("df"))
      .withColumn("n_b", count(lit(1)).over(byItem))
      .withColumn("rn", row_number().over(order))
      .filter(col("rn") <= col("n_b") - ceil(col("n_b") * threshold - 1e-9) + 1)
      .select(col("sh"), col("bench_id"), col("n_b"))
    val cand = corpSh.join(broadcast(prefix), Seq("sh"))
      .select("doc_id", "bench_id", "n_b")
      .dropDuplicates("doc_id", "bench_id")
    // verify against PRECOMPUTED distinct shingle sets (same rewrite as
    // ngramJaccardNearDups): one tokenize pass per side instead of
    // re-running the shingle kernel twice per candidate pair; the
    // benchmark arrays broadcast like the texts did. size(array_intersect)
    // over the distinct sets equals shingleIntersectCount exactly.
    val benchSets = benchmark
      .select(col("doc_id").as("bench_id"), shSet(col("text")).as("sb"))
    cand
      .join(corpus.select(col("doc_id"), shSet(col("text")).as("sa")),
        Seq("doc_id"))
      .join(broadcast(benchSets), Seq("bench_id"))
      .withColumn("n_shared",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("containment",
        col("n_shared").cast("double") / col("n_b"))
      .filter(col("containment") >= threshold)
      .select(col("doc_id"), col("bench_id"), col("n_b").as("n_bench"),
        col("n_shared"), col("containment"))
  }

  /** Canonical-survivor selection after near-dup clustering: keep the
    * lowest doc_id of each connected dup-group (union by repeated min —
    * one window pass suffices for pairwise near-dup output).
    */
  def survivors(documents: DataFrame, dups: DataFrame): DataFrame = {
    val loser = dups.select(col("doc_b").as("doc_id")).distinct()
    documents.join(loser, Seq("doc_id"), "left_anti")
  }

  /** The complete near-dup deduplication decision over a pair list:
    * cluster the pairs with connected components, label EVERY document
    * with its cluster (documents in no pair are their own singleton
    * cluster), and keep the minimum doc_id of each cluster as its
    * representative. This is the flow a training-data pipeline actually
    * applies downstream of any pair generator (minhash / simhash /
    * n-gram Jaccard): transitive closure first — unlike `survivors`'
    * anti-join, a chain a~b, b~c keeps only a, never both endpoints.
    *
    * Scale shape: CC iterates over the pair set only (never the corpus)
    * and the cluster-size aggregate stays on CC's output. The final
    * label attach carries NO broadcast hint: at crawl scale near-dup
    * cluster membership is routinely 30-50% of all documents, so a
    * forced broadcast of the label table is a driver/executor OOM at
    * 100x — let AQE pick broadcast when the labels actually fit (same
    * call `Curation.curate` makes on its label join, and for the same
    * reason).
    *
    * @param pairs near-dup pairs with `doc_a` < `doc_b` columns
    * @return one row per input document:
    *         (doc_id, cluster, n_members, keep)
    */
  def nearDupDedup(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val labels = graft.graph.Components.connectedComponents(edges)
      .select(col("node").as("doc_id"), col("comp").as("cluster"))
    val sizes = labels.groupBy("cluster")
      .agg(count(lit(1)).as("n_members"))
    val labeled = labels.join(sizes, "cluster")
    val cluster = coalesce(col("cluster"), col("doc_id"))
    documents.select(col("doc_id"))
      .join(labeled, Seq("doc_id"), "left")
      .select(col("doc_id"), cluster.as("cluster"),
        coalesce(col("n_members"), lit(1L)).as("n_members"),
        (cluster === col("doc_id")).as("keep"))
  }
}
