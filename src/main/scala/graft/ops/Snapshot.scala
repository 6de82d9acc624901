package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Crawl-snapshot diff — the refresh-audit step of a continuously
  * re-crawled corpus: classify every document id across two snapshots as
  * `added` / `removed` / `changed` / `unchanged` by CONTENT fingerprint
  * (normalized-text md5, the same fingerprint the exact-dedup and
  * source-stats operators key on), so a pipeline report can say how much
  * of the corpus actually moved and downstream incremental operators
  * (`Dedup.minhashNearDupsIncremental`, re-curation) can run on exactly
  * the `added ∪ changed` slice instead of the whole corpus.
  *
  * Scale shape: each side collapses to (doc_id, 32-char fp) before the
  * full-outer join — the only shuffle carries ~40 bytes per document,
  * never text; the classification is a codegen'd projection. Fully
  * ANSI-SQL-expressible → DuckDB-oracled exactly.
  */
object Snapshot {

  def diff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = graft.core.SparkUtil.spread(oldDocs)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp_old"))
    val n = newDocs
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Tiny per-status rollup of `diff` output (≤ 4 rows). */
  def diffStats(diffed: DataFrame): DataFrame =
    diffed.groupBy("status").agg(count(lit(1)).as("n"))
}
