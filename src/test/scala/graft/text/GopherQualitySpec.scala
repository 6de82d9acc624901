package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Gopher lexical-quality rules: hand-computed kernel values and the
  * keep conjunction over the published thresholds.
  */
class GopherQualitySpec extends SparkSpec {
  import spark.implicits._

  test("kernel: exact lexical statistics") {
    val (n, mean, alpha, sym, stop) =
      TextHash.gopherQualityStats("The cat and 42 sat... on # the mat")
    // tokens: the cat and 42 sat... on # the mat → 9 words
    assert(n == 9)
    // lengths: 3+3+3+2+6+2+1+3+3 = 26
    assert(mean == 26.0 / 9)
    // alphabetic words: all but "42" and "#" → 7/9
    assert(alpha == 7.0 / 9)
    // symbols: one '...' + one '#' → 2/9
    assert(sym == 2.0 / 9)
    // stop words present: the, and → 2
    assert(stop == 2)
  }

  test("kernel: ellipsis runs count non-overlapping; empty text safe") {
    val (_, _, _, sym, _) = TextHash.gopherQualityStats("a .... b ......")
    // '....' → 1, '......' → 2; 4 tokens
    assert(sym == 3.0 / 4)
    assert(TextHash.gopherQualityStats("  ") == (0, 0.0, 0.0, 0.0, 0))
  }

  test("gopherQuality: keep requires every rule to pass") {
    // 60 words incl. 'the' and 'and', mean length in [3,10], no symbols
    val good = ((1 to 58).map(i => s"word$i") ++ Seq("the", "and"))
      .mkString(" ")
    val short = "the and tiny"                        // < 50 words
    val numeric = (1 to 60).map(_.toString).mkString(" ") // frac_alpha 0
    val out = Seq((1L, good), (2L, short), (3L, numeric))
      .toDF("doc_id", "text")
    val rows = TextOps.gopherQuality(out).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(6))).toMap
    assert(rows(1L)._1 == 60L && rows(1L)._2)
    assert(rows(2L)._1 == 3L && !rows(2L)._2)
    assert(rows(3L)._1 == 60L && !rows(3L)._2)
  }
}
