package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relation-candidate mining over linked transcripts — the KG step
  * after entity linking: concepts that are mentioned in the SAME
  * conversation form a candidate relation edge, weighted by how many
  * conversations co-mention them and by lift (observed co-conversation
  * count over what concept-frequency independence predicts, in integer
  * permille — PMI's argument before the log, the same exact-ratio form
  * as [[graft.text.Collocations]], kept log-free so the edge table is
  * engine-exact). lift_pm > 1000 = the concepts attract (a relation
  * candidate for the KG); < 1000 = they repel.
  *
  * Co-mention is CONVERSATION-set semantics: a concept counts once per
  * conversation however many turns mention it, so the weight is a pure
  * conversation-co-occurrence statistic.
  *
  * Scale shape (mirrors Collocations.mine, which bounds the same pair
  * explosion by vocabulary): distinct (conv, concept) → per-conv sorted
  * concept set CAPPED at `maxPerConv` (the lexicographically smallest —
  * deterministic, and the cap bounds per-conv pair work at C(cap, 2)
  * even for a degenerate conversation linking thousands of concepts) →
  * pairs generated MAP-SIDE from each conversation's sorted array (no
  * self-join of the link table on conv_id) → ONE partial-agg exchange
  * into the pair matrix, bounded by C(|concepts|, 2) regardless of
  * corpus size. Concept conv-frequencies ride a second small aggregate
  * and attach by broadcast. Decimal(38) lift intermediates (n_ab·1000·N
  * overflows long past ~9e15 conv·pairs).
  *
  * @param links     entity-link rows; needs `convCol` and `conceptCol`
  * @param minConvs  drop pairs co-mentioned in fewer conversations
  * @param maxPerConv cap on distinct concepts per conversation that
  *                   enter the pair stage (deterministic smallest-first)
  * @return (concept_a, concept_b, n_ab, cf_a, cf_b, lift_pm) with
  *         concept_a < concept_b; cf_* are conv frequencies AFTER the
  *         cap, so n_ab ≤ min(cf_a, cf_b) always holds.
  */
object CoMention {

  def mine(links: DataFrame, minConvs: Int = 2, maxPerConv: Int = 64,
      convCol: String = "conv_id", conceptCol: String = "concept_id")
      : DataFrame = {
    require(minConvs >= 1, s"need minConvs >= 1, got $minConvs")
    require(maxPerConv >= 2, s"need maxPerConv >= 2, got $maxPerConv")
    // per-conv capped concept set: one exchange on conv_id; the
    // collect_set state is bounded by distinct concepts per conv, the
    // slice makes the downstream pair work C(maxPerConv, 2)-bounded
    val convSets = links
      .select(col(convCol).as("conv_id"), col(conceptCol).as("concept_id"))
      .groupBy("conv_id")
      .agg(slice(sort_array(collect_set(col("concept_id"))),
        1, maxPerConv).as("cs"))
      .localCheckpoint(true) // feeds cf, N, and the pair path (no CSE)
    val nConv = convSets.count()
    // conv frequency AFTER the cap (so lift's independence baseline uses
    // the same universe the pairs were generated from)
    val cf = convSets
      .select(explode(col("cs")).as("concept_id"))
      .groupBy("concept_id").agg(count(lit(1)).as("cf"))
    val pairs = convSets
      .select(explode(flatten(transform(col("cs"), (x, i) =>
        transform(slice(col("cs"), i + lit(2), size(col("cs"))),
          y => struct(x.as("concept_a"), y.as("concept_b")))))).as("p"))
      .groupBy(col("p.concept_a").as("concept_a"),
        col("p.concept_b").as("concept_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minConvs)
    pairs
      .join(broadcast(cf.select(col("concept_id").as("concept_a"),
        col("cf").as("cf_a"))), Seq("concept_a"))
      .join(broadcast(cf.select(col("concept_id").as("concept_b"),
        col("cf").as("cf_b"))), Seq("concept_b"))
      .select(col("concept_a"), col("concept_b"), col("n_ab"),
        col("cf_a"), col("cf_b"),
        expr(s"cast(n_ab as decimal(38,0)) * 1000 * ${nConv}L" +
          " div (cast(cf_a as decimal(38,0)) * cf_b)").as("lift_pm"))
  }
}
