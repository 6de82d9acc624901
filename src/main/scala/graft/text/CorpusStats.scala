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

  private def toks(c: Column) =
    filter(split(norm(c), " "), t => length(t) > 0)

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
    val documents = graft.core.SparkUtil.spread(documentsIn)
    val nDocs = documents.count()
    val tf = graft.core.SparkUtil.materializeOnce(
      documents
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf")))
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
}
