package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Term co-occurrence lift mining — the KG-construction edge miner that
  * turns a document corpus into weighted (term_a, term_b) association
  * edges: for every unordered pair of top-vocabulary terms, the number of
  * documents containing BOTH, and the pair's lift (observed co-document
  * count over the count independence predicts) in integer permille.
  * lift_pm > 1000 means the terms attract (collocation / related-entity
  * candidate edge); < 1000 means they repel. This is PMI's argument
  * before the log — kept as an exact integer ratio so the whole edge
  * table hash-matches a SQL oracle (log()'s last-ulp differences would
  * break that, same call as tfidfTopTerms' linear idf).
  *
  * Document frequency is SET semantics (a term counts once per doc), so
  * lift is a pure document-cooccurrence statistic, insensitive to
  * within-doc repetition — the form used for entity-association mining.
  *
  * Scale shape: tokenize → per-doc `array_distinct` (kernel map) → the
  * doc-frequency aggregate (ONE exchange on the term key, partial aggs
  * collapse Zipf-head terms map-side) → the top-K vocabulary is K rows,
  * a driver-sized list BROADCAST back as a semi filter, so the pair
  * stage only ever sees vocabulary terms. Pairs are generated MAP-SIDE
  * from each doc's sorted vocab-term array (index-nested `transform`,
  * no self-join shuffle of the token table) and collapse through one
  * partial agg into the pair matrix, whose size is bounded by C(K, 2)
  * regardless of corpus size — the aggregate state, not the corpus, is
  * the memory bound, exactly what a 100 TB run needs. Per-doc work is
  * bounded by C(min(K, distinct-terms-in-doc), 2).
  *
  * @param topK vocabulary size; ties at the df boundary break (df desc,
  *             term asc) so the selected SET is deterministic
  * @param minPairCount drop pairs seen in fewer docs (noise floor)
  * @return (term_a, term_b, n_ab, df_a, df_b, lift_pm), term_a < term_b
  */
object Collocations {

  def mine(documentsIn: DataFrame, topK: Int = 200,
      minPairCount: Int = 5): DataFrame = {
    require(topK >= 2, s"need topK >= 2, got $topK")
    require(minPairCount >= 1, s"need minPairCount >= 1, got $minPairCount")
    // metadata-served parquet count (same call as tfidfTopTerms): N is a
    // scalar of the lift formula, not a per-row collect
    val nDocs = documentsIn.count()
    val documents = graft.core.SparkUtil.spread(documentsIn)

    // checkpoint the exploded token table: it feeds BOTH the df aggregate
    // and the pair path, and Catalyst has no cross-branch CSE — without
    // the boundary the corpus is scanned and tokenized twice (the same
    // trap tokenFreqScore documents; the explode is a Project in the
    // unanalyzed plan, invisible to materializeOnce's node heuristic)
    val docTerms = documents
      .select(col("doc_id"),
        explode(array_distinct(CorpusStats.toks(col("text")))).as("term"))
      .localCheckpoint(true)
    // (doc_id, term) rows are distinct post-array_distinct, so df is a
    // plain count per term — one exchange, map-side partials. The K-row
    // vocab is consumed three times (semi filter + both df joins);
    // materialize it so the df aggregate runs once, not thrice
    val dfreq = docTerms.groupBy("term").agg(count(lit(1)).as("df"))
    val vocab = graft.core.SparkUtil.materializeOnce(
      dfreq.orderBy(col("df").desc, col("term").asc).limit(topK))

    // vocab-filtered per-doc term sets, sorted so pair order (a < b) is
    // positional; broadcast join = map-side filter, no token-table shuffle
    val docVocabTerms = docTerms
      .join(broadcast(vocab.select("term")), Seq("term"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("term"))).as("ts"))
    // map-side pair generation: for each i < j emit (ts[i], ts[j]); the
    // partial agg collapses these into the ≤ C(topK, 2) pair matrix
    val pairs = docVocabTerms
      .select(explode(flatten(transform(col("ts"), (x, i) =>
        transform(slice(col("ts"), i + lit(2), size(col("ts"))),
          y => struct(x.as("term_a"), y.as("term_b")))))).as("p"))
      .groupBy(col("p.term_a").as("term_a"), col("p.term_b").as("term_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)

    // decimal(38) intermediates: n_ab·1000·N and df_a·df_b both overflow
    // long once corpora pass ~3e6 docs; DIV on decimals is still exact
    // integer floor division and lands back in a long
    pairs
      .join(broadcast(vocab.select(col("term").as("term_a"),
        col("df").as("df_a"))), Seq("term_a"))
      .join(broadcast(vocab.select(col("term").as("term_b"),
        col("df").as("df_b"))), Seq("term_b"))
      .select(col("term_a"), col("term_b"), col("n_ab"), col("df_a"),
        col("df_b"),
        expr(s"cast(n_ab as decimal(38,0)) * 1000 * ${nDocs}L" +
          " div (cast(df_a as decimal(38,0)) * df_b)").as("lift_pm"))
  }
}
