package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistics operators for training-data pipelines —
  * the profiling passes run before filtering decisions (what is the
  * corpus made of, what is salient per document). Pure declarative
  * column expressions + aggregations: Catalyst's partial aggregation
  * and TakeOrderedAndProject are exactly the distributed shapes these
  * classic corpus-stat jobs need, so no custom kernels are involved.
  */
object CorpusStats {

  private def norm(c: Column) =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  private[text] def toks(c: Column) =
    filter(split(norm(c), " "), t => length(t) > 0)

  /** (doc_id, term, tf) term-frequency table, the shared substrate of
    * tfidfTopTerms and keywordSearch: tokenize → optional map-side term
    * filter BELOW the explode (before any shuffle) → groupBy with
    * partial aggregation. Materialized once — it always feeds at least
    * two branches (a df derivation + a join), and Catalyst has no
    * cross-branch CSE.
    */
  private def tfTable(documents: DataFrame,
      termFilter: Option[Seq[String]]): DataFrame = {
    val tok = documents
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
    val kept = termFilter match {
      case Some(ts) => tok.filter(col("term").isin(ts: _*))
      case None => tok
    }
    graft.core.SparkUtil.materializeOnce(
      kept.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
  }

  /** Global top-N most frequent word-k-grams with exact occurrence
    * counts (positional n-grams — repeats inside one document count; a
    * document shorter than k tokens contributes none). The classic
    * corpus-profiling job: boilerplate discovery, stop-phrase lists,
    * quick duplication smell tests.
    *
    * Scale shape: one explode + one groupBy(ngram). Heavy hitters — the
    * rows this operator exists to find — collapse in the map-side
    * partial aggregate, so the exchange carries per-partition distinct
    * ngrams, not corpus positions. The global top-N is
    * `orderBy(...).limit(N)`, which Spark plans as
    * TakeOrderedAndProject: each task keeps its local top N and the
    * driver merges N-row heaps — no global sort, no single-partition
    * shuffle. The (count desc, ngram asc) order makes the selected SET
    * deterministic under ties, so the result is DuckDB-oracled exactly.
    */
  def topNgrams(documentsIn: DataFrame, k: Int = 3,
      topN: Int = 100): DataFrame = {
    require(k >= 1 && topN >= 1, s"need k >= 1, topN >= 1; got $k, $topN")
    val documents = graft.core.SparkUtil.spread(documentsIn)
    val t = toks(col("text"))
    val spans = transform(sequence(lit(1), size(t) - (k - 1)),
      i => array_join(slice(t, i, lit(k)), " "))
    documents
      .filter(size(t) >= k)
      .select(explode(spans).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram").asc)
      .limit(topN)
  }

  /** Per-document salient terms by TF-IDF rank: the top `topPerDoc`
    * terms of every document under score = tf · (N / df) — term
    * frequency times inverse document frequency. The idf factor is the
    * LINEAR ratio N/df rather than the textbook log(N/df): both are
    * strictly decreasing in df, so per-document term RANKINGS are
    * related but not identical (log compresses high-tf/common-term
    * scores harder); the linear form is chosen because tf·N/df is a
    * single exact integer-ratio double — bit-identical across engines —
    * making the whole operator DuckDB-oracle-checkable, which log()'s
    * last-ulp library differences would break. Ties break on term
    * (score desc, term asc), so output is fully deterministic.
    *
    * Scale shape: tokenize once → groupBy(doc_id, term) for tf (partial
    * agg collapses repeats map-side) → df derived FROM the tf table
    * (its (doc_id, term) rows are distinct, so df = row count per term
    * — no second pass over the corpus) → join tf⋈df on term (AQE
    * broadcasts the dictionary-sized df side when it fits) → per-doc
    * top-k via a row_number window partitioned BY doc_id — millions of
    * small partitions, never a global sort. The tf table feeds two
    * branches (df aggregation + the score join), so it is materialized
    * once (Catalyst has no cross-branch CSE). N is one count() scalar
    * of the input — a driver constant, not a per-row collect.
    */
  def tfidfTopTerms(documentsIn: DataFrame, topPerDoc: Int = 3): DataFrame = {
    require(topPerDoc >= 1, s"need topPerDoc >= 1, got $topPerDoc")
    // count the PRE-spread input: a parquet count is answered from
    // row-group metadata, while counting the repartitioned frame would
    // execute the spread shuffle just to throw the rows away
    val nDocs = documentsIn.count()
    val documents = graft.core.SparkUtil.spread(documentsIn)
    val tf = tfTable(documents, None)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("score", (col("tf") * nDocs).cast("double") / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topPerDoc)
      .select("doc_id", "term", "tf", "score", "rank")
  }

  /** Corpus vocabulary summary — one row of (n_docs, total_tokens,
    * distinct_tokens): the first numbers any corpus report leads with
    * (type/token ratio, vocabulary growth between crawl snapshots).
    *
    * Two arms, same schema:
    *  - `approximate = false` (oracle arm): exact `count_distinct` —
    *    Spark plans the mixed distinct/non-distinct aggregate as an
    *    Expand (×2 rows) + two-phase aggregation whose exchange carries
    *    every per-partition-distinct TOKEN. Exactly right at bench scale
    *    and DuckDB-checkable, but the shuffled token dictionary grows
    *    with the corpus.
    *  - `approximate = true` (100 TB arm): HyperLogLog++ via
    *    `approx_count_distinct(rsd)` — each task folds its tokens into a
    *    fixed-size HLL sketch and the exchange carries ONE sketch per
    *    partition regardless of corpus size; error is a tunable ~rsd
    *    (asserted < 3·rsd in CorpusStatsSpec against the exact arm).
    *    This is the difference between a bounded-size shuffle and a
    *    vocabulary-sized one — the sketch arm's cost is O(1) in distinct
    *    tokens.
    */
  def vocabStats(documentsIn: DataFrame, approximate: Boolean = false,
      rsd: Double = 0.01): DataFrame = {
    val documents = graft.core.SparkUtil.spread(documentsIn)
    val tok = documents.select(explode(toks(col("text"))).as("term"),
      col("doc_id"))
    // the sketch arm sketches BOTH distincts — one exact count_distinct
    // would reintroduce the Expand + value-sized exchange the arm exists
    // to avoid (n_docs error is the same tunable ~rsd)
    def dct(c: Column) =
      if (approximate) approx_count_distinct(c, rsd) else count_distinct(c)
    tok.agg(dct(col("doc_id")).as("n_docs"),
      count(lit(1)).as("total_tokens"),
      dct(col("term")).as("distinct_tokens"))
  }

  /** Per-source curation profile over `documents(source, ...)`: document
    * counts, exact token totals, and the source's distinct content
    * fingerprints — `1 - distinct/docs` is its internal duplication rate,
    * the signal that gets boilerplate-heavy sources down-weighted or cut.
    * `approximate = true` swaps the exact fingerprint count_distinct for
    * the HLL sketch (same trade as `vocabStats`: the exchange carries one
    * sketch per (partition, source) instead of every distinct
    * fingerprint). The exact arm is DuckDB-oracled (md5 fingerprints are
    * engine-identical).
    */
  def sourceStats(documentsIn: DataFrame, approximate: Boolean = false,
      rsd: Double = 0.01): DataFrame = {
    val documents = graft.core.SparkUtil.spread(documentsIn)
    val fp = TextOps.fingerprint(col("text"))
    val distinctFp =
      if (approximate) approx_count_distinct(fp, rsd)
      else count_distinct(fp)
    documents
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col("text")).cast("long")).as("total_tokens"),
        distinctFp.as("distinct_fingerprints"))
      .withColumn("dup_rate",
        lit(1.0) - col("distinct_fingerprints").cast("double") / col("n_docs"))
  }

  /** Corpus-statistics quality score: each document's mean corpus
    * frequency of its tokens (total occurrences across the corpus,
    * averaged over the document's token positions). The integer-ratio
    * stand-in for a unigram-LM score — documents of common,
    * well-distributed words score high; gibberish and boilerplate-ID
    * strings score near 1 — chosen over mean log-probability because
    * log()'s last ulp differs across engines while sum(freq)/n
    * hash-compares exactly.
    *
    * Scale shape: the unigram table derives from the same token explode
    * it scores with (one pass, one groupBy(term)); the score join is
    * token→freq on the term key — Zipf makes the vocab side small enough
    * to broadcast in practice, and the per-doc partial agg collapses the
    * exploded rows straight back down.
    */
  def tokenFreqScore(documentsIn: DataFrame): DataFrame = {
    val documents = graft.core.SparkUtil.spread(documentsIn)
    // explicit checkpoint: the explode is a Project in the UNANALYZED
    // logical plan (Generate appears only after analysis), so
    // materializeOnce's node heuristic cannot see it — without the
    // boundary the scan+explode re-executes on both join branches
    val tok = documents
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .localCheckpoint(true)
    val freq = tok.groupBy("term").agg(count(lit(1)).as("freq"))
    tok.join(freq, "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("freq").as("sum_freq"))
      .withColumn("mean_token_freq",
        col("sum_freq").cast("double") / col("n_tokens"))
  }
  /** Per-source token-length quantiles — the length-distribution report
    * behind truncation budgets, packing sequence lengths, and per-source
    * length filters. Quantile definition is pinned deterministically:
    * the q-quantile of a source with n documents is the token count of
    * the document at rank ⌈q·n⌉ in (tokens asc, doc_id asc) order —
    * every engine computing this definition agrees bit-exactly (both
    * sides evaluate ⌈q·n⌉ on the same IEEE doubles), unlike
    * interpolating quantile functions whose conventions differ.
    *
    * Two arms, same schema (source, q, n_docs, tokens_at_q):
    *  - `approximate = false` (oracle arm): exact — a row_number window
    *    per source. A skewed source means one big per-group sort
    *    (spillable, but the sort IS the cost of exactness).
    *  - `approximate = true` (100 TB arm): `percentile_approx` — each
    *    task folds its rows into a fixed-size KLL-style sketch and the
    *    exchange carries one sketch per (partition, source): no
    *    per-source sort, cost O(1) in documents per source. Rank error
    *    is bounded by 1/accuracy; asserted against the exact arm in
    *    CorpusStatsSpec.
    */
  def lengthQuantiles(documentsIn: DataFrame,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99),
      approximate: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    val documents = graft.core.SparkUtil.spread(documentsIn)
    // null text counts as 0 tokens: unguarded, a null count would sort
    // NULLS FIRST in Spark but LAST in DuckDB (rank shift), and the
    // sketch arm's percentile_approx would skip it while n_docs counts
    // it — both arms and both engines must see the same value
    val counts = documents.select(col("source"), col("doc_id"),
      coalesce(TextOps.tokenCount(col("text")).cast("long"), lit(0L))
        .as("tokens"))
    if (approximate) {
      val qArr = array(qs.map(lit): _*)
      counts.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          percentile_approx(col("tokens"), qArr, lit(accuracy)).as("ts"))
        .select(col("source"), explode(arrays_zip(qArr.as("q"),
          col("ts").as("tokens_at_q"))).as("z"), col("n_docs"))
        .select(col("source"), col("z.q").as("q"), col("n_docs"),
          col("z.tokens_at_q").as("tokens_at_q"))
    } else {
      val w = Window.partitionBy("source")
      val ranked = counts
        .withColumn("n_docs", count(lit(1)).over(w))
        .withColumn("rn", row_number().over(
          w.orderBy(col("tokens").asc, col("doc_id").asc)).cast("long"))
      ranked
        .select(col("source"), col("n_docs"), col("rn"), col("tokens"),
          explode(array(qs.map(lit): _*)).as("q"))
        .filter(col("rn") === ceil(col("q") * col("n_docs")).cast("long"))
        .select(col("source"), col("q"), col("n_docs"),
          col("tokens").as("tokens_at_q"))
    }
  }

  /** Bigram language-model quality score — the LM-perplexity filter of
    * CCNet/FineWeb pipelines (Wenzek et al., LREC 2020 filter documents
    * by LM score), as an engine-portable integer-ratio stand-in: each
    * document scores the mean scaled conditional frequency of its
    * bigrams, cond(w1→w2) = ⌊scale · count(w1 w2) / count(w1)⌋ —
    * fluent text chains high-conditional bigrams, token soup scores
    * near zero. Every per-position contribution is exact integer
    * arithmetic and the final mean is one IEEE division of exact
    * integers, so the operator hash-matches a SQL oracle (a log-prob
    * sum would differ in the last ulp by summation order).
    *
    * Scale shape: ONE bigram explode feeds both the count table and the
    * scoring join (materialized once — no cross-branch CSE); the
    * unigram table derives from its own explode. Count tables are
    * dictionary-sized (Zipf collapses repeats in the map-side partial
    * agg); the scoring joins are key-dictionary lookups AQE broadcasts
    * when they fit. Documents under 2 tokens carry n_bigrams = 0 and
    * score 0.
    */
  def bigramLmScore(documentsIn: DataFrame,
      scale: Long = 1000000L): DataFrame = {
    require(scale >= 1L, s"need scale >= 1, got $scale")
    val documents = graft.core.SparkUtil.spread(documentsIn)
    val t = toks(col("text"))
    val bigramArr = transform(sequence(lit(1), size(t) - 1),
      i => struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2")))
    // explicit boundary: Generate is invisible to materializeOnce
    // pre-analysis (same note as tokenFreqScore)
    val big = documents
      .filter(size(t) >= 2)
      .select(col("doc_id"), explode(bigramArr).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .localCheckpoint(true)
    val bc = big.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val uc = documents
      .select(explode(t).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cu"))
    val scored = big
      .join(bc, Seq("w1", "w2"))
      .join(uc, Seq("w1"))
      .select(col("doc_id"),
        expr(s"($scale * cb) div cu").as("cond"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("cond").as("sum_cond"))
    documents.select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_cond"), lit(0L)).as("sum_cond"),
        when(col("n_bigrams").isNull, lit(0.0))
          .otherwise(col("sum_cond").cast("double") / col("n_bigrams"))
          .as("lm_score"))
  }

  /** Per-source length-outlier trim: keep each document iff its rank in
    * the source's character-length distribution lies inside the
    * [loPermille, hiPermille] band — the distribution-tail filter that
    * cuts truncated fragments and concatenation blobs per source
    * without a global length cutoff (a threshold right for web prose is
    * wrong for code or reference tables).
    *
    * Determinism: ranks order by (length, doc_id) — a strict total
    * order, so row_number is reproducible — and the band test is pure
    * integer arithmetic, (rank−1)·1000 vs permille·(n−1): no float
    * ratio ever forms, so the keep bit hash-compares across engines.
    * Null text ranks as length 0 (same coalesce rationale as
    * [[lengthQuantiles]]: Spark sorts NULL first, DuckDB last).
    *
    * Scale shape: one window pass partitioned by source — exact ranks
    * need the per-source sort (spillable; the sort IS the cost of
    * exactness, as in `lengthQuantiles`' oracle arm). At 100 TB the
    * sketch path is the `lengthQuantiles(approximate = true)` band +
    * a shuffle-free length comparison; this exact arm is the
    * oracle-checkable twin.
    */
  def lengthOutlierTrim(documentsIn: DataFrame, loPermille: Int = 20,
      hiPermille: Int = 980): DataFrame = {
    require(0 <= loPermille && loPermille <= hiPermille && hiPermille <= 1000,
      s"need 0 <= lo <= hi <= 1000 permille, got $loPermille, $hiPermille")
    val documents = graft.core.SparkUtil.spread(documentsIn)
    val w = Window.partitionBy("source")
    val ranked = documents
      .select(col("doc_id"), col("source"),
        coalesce(length(col("text")).cast("long"), lit(0L)).as("n"))
      .withColumn("n_src", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(
        w.orderBy(col("n").asc, col("doc_id").asc)).cast("long"))
    ranked.select(col("doc_id"), col("source"), col("n"), col("rn"),
      col("n_src"),
      ((col("rn") - 1L) * 1000L >= lit(loPermille.toLong) * (col("n_src") - 1L)
        && (col("rn") - 1L) * 1000L <=
          lit(hiPermille.toLong) * (col("n_src") - 1L)).as("keep"))
  }

  /** Count-min-sketch heavy hitters: estimated frequency of every
    * candidate term from a depth×width CMS (Cormode & Muthukrishnan,
    * J. Algorithms 2005), keeping terms whose estimate clears `minFreq`.
    *
    * Scale shape — the point of the sketch: the CMS build is one token
    * explode ×depth followed by groupBy(row, bucket), whose key space is
    * depth·width — BOUNDED, so map-side partial aggregation collapses
    * every partition to at most depth·width rows no matter how many
    * tokens flow through (contrast the exact `tokenFreqScore` vocabulary
    * table, whose exchange grows with distinct terms). The probe side
    * joins candidates×depth against the sketch on (row, bucket) and
    * takes the min across rows. Candidates here are the corpus's own
    * distinct terms (the demo probe set — distinct-collapse is also
    * map-side partial); a production run probes an external watch list
    * and never materializes the vocabulary.
    *
    * Determinism: buckets are md5-derived (same `conv(substr(md5))`
    * kernel as `modelQualityScore`), so the sketch — and therefore every
    * ESTIMATE, not just the underlying truth — is a pure function of the
    * corpus: the operator carries an exact DuckDB oracle. The one-sided
    * CMS guarantee (estimate ≥ true frequency; overestimate ≤ e·N/width
    * w.h.p.) is witnessed against exact counts in CorpusStatsSpec.
    */
  def cmsHeavyHitters(documentsIn: DataFrame, depth: Int = 4,
      width: Int = 8192, minFreq: Long = 64L): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 16 && width <= (1 << 24), s"width out of range: $width")
    require(minFreq >= 1L, s"need minFreq >= 1, got $minFreq")
    val documents = graft.core.SparkUtil.spread(documentsIn)
    def bucket(term: Column, row: Int): Column =
      pmod(conv(substring(md5(concat(term, lit(s":cms$row"))), 1, 8),
        16, 10).cast("long"), lit(width.toLong))
    // explicit boundary: the token explode feeds both the sketch build
    // and the candidate set, and Generate is invisible to materializeOnce
    // pre-analysis (same note as tokenFreqScore)
    val tok = documents.select(explode(toks(col("text"))).as("term"))
      .localCheckpoint(true)
    val rows = (0 until depth)
    val cms = tok
      .select(explode(array(rows.map(i =>
        struct(lit(i).as("row"), bucket(col("term"), i).as("bucket"))): _*))
        .as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val candidates = tok.distinct()
      .select(col("term"), explode(array(rows.map(i =>
        struct(lit(i).as("row"), bucket(col("term"), i).as("bucket"))): _*))
        .as("rb"))
      .select(col("term"), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
    candidates.join(cms, Seq("row", "bucket"))
      .groupBy("term")
      .agg(min("cnt").as("est_freq"))
      .filter(col("est_freq") >= minFreq)
  }

  /** Keyword search: top-k documents for a whitespace query string by
    * summed tf·idf of its distinct terms — the retrieval shape (inverted
    * scoring + global top-k) over the same linear-idf family as
    * `tfidfTopTerms`. Term weights are INTEGER-scaled:
    * w(t) = ⌊N·scale / df(t)⌋ and score = Σ_t tf(t)·w(t) is an exact
    * integer sum — order-free, so the operator hash-compares across
    * engines (an FP Σ tf·(N/df) would differ in the last ulp with
    * summation order). `scale` trades idf resolution against headroom:
    * score ≤ maxTf·nTerms·N·scale must fit a long, so trillion-doc
    * corpora drop scale toward 1 while bench corpora keep full
    * resolution (the default suits N ≲ 10⁹).
    *
    * Scale shape: the query's distinct terms are a literal isin set, so
    * the token explode filters map-side BEFORE any shuffle — only
    * positions of query terms survive (a vanishing fraction of the
    * corpus). One groupBy(doc_id, term) for tf (partial agg), df of the
    * query terms derived from that tf table, a dictionary-sized
    * broadcast join of ≤ |query| df rows, and the global top-k is
    * (score desc, doc_id asc) + limit = TakeOrderedAndProject: per-task
    * heaps, no global sort.
    */
  def keywordSearch(documentsIn: DataFrame, query: String, topK: Int = 10,
      scale: Long = 1000000L): DataFrame = {
    require(topK >= 1, s"need topK >= 1, got $topK")
    require(scale >= 1L, s"need scale >= 1, got $scale")
    val terms = query.trim.toLowerCase(java.util.Locale.ROOT) // locale-independent, the TextOps:261 precedent
      .split("\\s+").filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "query has no terms")
    val documents = graft.core.SparkUtil.spread(documentsIn)
    val nDocs = documentsIn.count() // pre-spread: metadata-only on parquet
    // the integer-scaled idf weight floor(nDocs*scale/df) is exact only
    // while nDocs*scale fits a Long — enforce the documented headroom
    // constraint ("drop scale toward 1 for huge corpora") instead of
    // silently wrapping into negative weights past ~9.2e18/scale docs
    require(nDocs <= Long.MaxValue / scale,
      s"nDocs ($nDocs) * scale ($scale) overflows Long — lower `scale`")
    val tf = tfTable(documents, Some(terms.toSeq))
    val weights = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("w", floor(lit(nDocs * scale) / col("df")).cast("long"))
    tf.join(broadcast(weights), "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("tf") * col("w")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
      .select(col("doc_id"), col("n_terms"), col("score"))
  }

}
