package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Witnesses for the compression-ratio quality signal (deflate is not
  * SQL-expressible, so no DuckDB oracle): shape ordering, edge cases,
  * determinism, and the band-pass decision.
  */
class CompressionRatioSpec extends SparkSpec {
  import spark.implicits._

  private def ratios(texts: Seq[(String, String)],
      band: (Long, Long) = (200L, 900L)): Map[String, (Long, Boolean)] =
    texts.toDF("id", "text")
      .select(col("id") +:
        TextOps.compressionRatio(col("text"), band._1, band._2): _*)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(2))).toMap

  test("repetitive << natural prose < high-entropy, and the band-pass " +
      "keeps only the middle") {
    val repetitive = "spam ham " * 400
    // genuinely non-repeating prose (deflate ~559‰; an 8×-repeated
    // paragraph would compress to ~97‰ — block repetition IS the signal
    // the low cut catches)
    val prose = "it was a bright cold day in april and the clocks were " +
      "striking thirteen winston smith his chin nuzzled into his breast " +
      "in an effort to escape the vile wind slipped quickly through the " +
      "glass doors of victory mansions though not quickly enough to " +
      "prevent a swirl of gritty dust from entering along with him the " +
      "hallway smelt of boiled cabbage and old rag mats at one end of it " +
      "a coloured poster too large for indoor display had been tacked to " +
      "the wall it depicted simply an enormous face more than a metre " +
      "wide the face of a man of about forty five with a heavy black " +
      "moustache and ruggedly handsome features"
    // deterministic pseudo-random hex soup (LCG), barely compressible
    var state = 7L
    val entropy = (1 to 400).map { _ =>
      state = state * 6364136223846793005L + 1442695040888963407L
      java.lang.Long.toHexString(state)
    }.mkString(" ")
    val got = ratios(
      Seq(("rep", repetitive), ("prose", prose), ("hex", entropy)),
      band = (200L, 570L))
    assert(got("rep")._1 < got("prose")._1 && got("prose")._1 < got("hex")._1,
      s"ordering violated: $got")
    assert(!got("rep")._2, "repetitive soup must be dropped (below band)")
    assert(got("prose")._2, "prose must pass the band")
    assert(!got("hex")._2, "entropy soup must be dropped (above band)")
  }

  test("empty and null text pin ratio 1000 and drop") {
    val got = ratios(Seq(("empty", ""), ("nul", null)))
    assert(got("empty") == ((1000L, false)) && got("nul") == ((1000L, false)))
  }

  test("deterministic across partitionings") {
    val docs = (1 to 200).map(i => (i.toString, s"doc body $i " * (i % 17 + 1)))
    val a = docs.toDF("id", "text").repartition(7)
      .select(col("id") +: TextOps.compressionRatio(col("text")): _*)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = docs.toDF("id", "text").repartition(2)
      .select(col("id") +: TextOps.compressionRatio(col("text")): _*)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
