package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines over a
  * `documents(doc_id, text, lang, source, n_chars)` table: token counting,
  * quality scoring, n-gram-heuristic language ID, document fingerprinting.
  *
  * All pure `functions._` column expressions (whole-stage codegen, no UDF),
  * and each has an ANSI-SQL-expressible twin for the DuckDB oracle.
  */
object TextOps {

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Occurrences of a literal substring (portable length/replace trick). */
  def occurrences(text: Column, pat: String): Column =
    ((length(text) - length(replace(text, lit(pat), lit("")))) / pat.length)
      .cast("long")

  /** Quality score 0..10 (integer-valued, so the DuckDB oracle compares
    * exactly): length band (0/2/4) + punctuation balance (1/3) + stopword
    * presence (1/3) — the standard cheap pre-filter for web/chat corpora.
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text)
    val nTokens = tokenCount(text)
    val nPeriods = occurrences(text, ".")
    val nStop = occurrences(lower(text), " the ") +
      occurrences(lower(text), " and ") + occurrences(lower(text), " of ")
    val lenScore = when(nChars >= 50 && nChars <= 5000, 4)
      .when(nChars >= 20, 2).otherwise(0)
    val punctScore = when(nPeriods > 0 && nPeriods <= nTokens / lit(3) + 1, 3)
      .otherwise(1)
    val stopScore = when(nStop > 0, 3).otherwise(1)
    (lenScore + punctScore + stopScore).cast("long")
  }

  /** n-gram/stopword-heuristic language ID over a fixed marker set;
    * deterministic tie-break by the CASE order (en > de > fr > es).
    */
  def langId(text: Column): Column = {
    val t = concat(lit(" "), lower(text), lit(" "))
    val en = occurrences(t, " the ") + occurrences(t, " and ") +
      occurrences(t, " is ")
    val de = occurrences(t, " der ") + occurrences(t, " und ") +
      occurrences(t, " ist ")
    val fr = occurrences(t, " le ") + occurrences(t, " et ") +
      occurrences(t, " est ")
    val es = occurrences(t, " el ") + occurrences(t, " y ") +
      occurrences(t, " es ")
    when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  /** Content fingerprint: md5 of the normalized text (md5 is available and
    * identical in Spark and DuckDB, so the oracle can verify it exactly).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** BPE-ish subword count: whitespace tokens plus an extra unit per 6
    * characters of long tokens — a cheap, deterministic proxy for tokenizer
    * load estimation at corpus scale.
    */
  def subwordCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(
      aggregate(split(trim(text), "\\s+"), lit(0L),
        (acc, w) => acc + greatest(lit(1L),
          ceil(length(w) / lit(6.0)).cast("long"))))

  def analyzed(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      subwordCount(col("text")).as("n_subwords"),
      qualityScore(col("text")).as("quality"),
      langId(col("text")).as("lang_pred"),
      fingerprint(col("text")).as("fingerprint"))
}
