package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic inputs for the KG-construction pipeline
  * (BASELINE.json input_hint): a transcript table
  * (conv_id, turn_idx, role, text, tool, ts) and a CURIE-prefixed concept
  * dictionary. Fully distributed generation from `spark.range` — content is
  * a pure function of (seed, ids): no RNG state, no wall clock, so any
  * scale factor regenerates identically on any cluster layout.
  */
object Synthetic {

  /** Cheap splittable hash (xorshift-multiply) as a Column expr. */
  private def mix(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    abs(xxhash64(c))

  /** 240 deterministic pseudo-words (syllable product) — a vocabulary wide
    * enough that distinct concepts rarely share surface tokens, like a real
    * term dictionary; a tiny pool would make every label a near-dup of
    * every other and flood the fuzzy linker with structural collisions.
    */
  private val wordPool: Seq[String] = {
    val a = Seq("bar", "cor", "del", "fen", "gal", "hur", "jin", "kel",
      "lom", "mar", "nov", "pel", "qua", "ris", "sol", "tam", "ulm", "ver",
      "wex", "yor")
    val b = Seq("adon", "ebel", "ivar", "olec", "umor", "antis", "ertol",
      "imnal", "ovex", "urdin", "aslom", "endir")
    for (x <- a; y <- b) yield x + y
  }

  /** Concept dictionary: `nConcepts` rows of
    * (concept_id, label, synonyms) where label = two pool words + id suffix
    * and one synonym variant. CURIE prefix `kb:`.
    */
  def dictionary(spark: SparkSession, nConcepts: Long, seed: Long = 42L): DataFrame = {
    val pool = typedLit(wordPool)
    val id = col("id")
    val h1 = mix(concat(lit(seed), lit("w1"), id))
    val h2 = mix(concat(lit(seed), lit("w2"), id))
    val w1 = element_at(pool, (h1 % wordPool.size).cast("int") + 1)
    val w2 = element_at(pool, (h2 % wordPool.size).cast("int") + 1)
    spark.range(nConcepts).select(
      concat(lit("kb:C"), format_string("%07d", id)).as("concept_id"),
      concat(w1, lit(" "), w2, lit(" "), id % 97).as("label"),
      // synonym: reversed word order — a realistic lexical variant
      concat(w2, lit(" "), w1, lit(" "), id % 97).as("synonyms"))
  }

  /** Transcript table: `nConv` conversations × `turnsPerConv` turns.
    * Roughly half the turns embed a dictionary mention (label or synonym
    * of a deterministic concept) inside filler text; the rest are filler
    * only. Role alternates user/assistant; ~20% of assistant turns carry a
    * tool tag.
    */
  def transcripts(spark: SparkSession, nConv: Long, turnsPerConv: Int,
      nConcepts: Long, seed: Long = 42L): DataFrame = {
    val total = nConv * turnsPerConv
    val id = col("id")
    val conv = (id / turnsPerConv).cast("long")
    val turn = (id % turnsPerConv).cast("int")
    val pool = typedLit(wordPool)

    val h = mix(concat(lit(seed), lit("t"), id))
    val conceptIdx = mix(concat(lit(seed), lit("c"), id)) % nConcepts
    // skew: 10% of turns reference one of the 16 "head" concepts — the
    // reconcile aggregation has real skew to absorb
    val skewed = (h % 10) === 0
    val mentionConcept = when(skewed, conceptIdx % 16).otherwise(conceptIdx)

    val w1 = element_at(pool, (mix(concat(lit(seed), lit("a"), id)) % wordPool.size).cast("int") + 1)
    val w2 = element_at(pool, (mix(concat(lit(seed), lit("b"), id)) % wordPool.size).cast("int") + 1)

    val cw1 = element_at(pool, (mix(concat(lit(seed), lit("w1"), mentionConcept)) % wordPool.size).cast("int") + 1)
    val cw2 = element_at(pool, (mix(concat(lit(seed), lit("w2"), mentionConcept)) % wordPool.size).cast("int") + 1)
    val useSynonym = (h % 4) === 1
    val mention = when(useSynonym,
      concat(cw2, lit(" "), cw1, lit(" "), mentionConcept % 97))
      .otherwise(concat(cw1, lit(" "), cw2, lit(" "), mentionConcept % 97))

    val hasMention = (h % 2) === 0
    val text = when(hasMention,
      concat(lit("the "), w1, lit(" of "), mention, lit(" near the "), w2))
      .otherwise(concat(lit("a "), w1, lit(" without any "), w2, lit(" here")))

    spark.range(total).select(
      concat(lit("conv"), format_string("%010d", conv)).as("conv_id"),
      turn.as("turn_idx"),
      when(turn % 2 === 0, "user").otherwise("assistant").as("role"),
      text.as("text"),
      when(turn % 2 === 1 && h % 5 === 0, "search").otherwise("").as("tool"),
      // deterministic timestamps: 2026-01-01 epoch seconds + conv hour + turn minute
      (lit(1767225600L) + conv * 3600L + turn.cast("long") * 60L)
        .cast("timestamp").as("ts"))
  }
}
