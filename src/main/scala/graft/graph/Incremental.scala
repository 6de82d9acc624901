package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental canonicalization: fold a delta batch of equivalence edges
  * into an existing component labeling WITHOUT re-running connected
  * components over the full graph.
  *
  * The operational flow at 10^12-turn scale: the nightly transcript
  * delta yields new exactMatch edges touching a vanishing fraction of
  * existing components, but a full CC pass re-shuffles every edge ever
  * seen. Components are equivalence classes, so an existing component's
  * internal edges are irrelevant to future merges — its LABEL is a
  * complete connectivity summary. The delta therefore only needs CC on a
  * "super-graph" whose vertices are touched component labels plus brand
  * new nodes, which is delta-sized, not corpus-sized.
  *
  * Full-corpus cost: ONE hint-free equi-join (old comp → new comp) that
  * AQE turns into a broadcast when the touched-comp remap table is small
  * (the common case) — no full-graph shuffle, no re-hash of old edges.
  *
  * Label invariant preserved: [[Components.connectedComponents]] labels
  * a component with its minimum member id. A super-node is either an old
  * label (= min of its old members) or a new raw id, so the min over
  * connected super-nodes equals the min over all underlying members —
  * `mergeDelta(cc(e0), delta)` is row-identical to `cc(e0 ∪ delta)`
  * (asserted by `IncrementalSpec` and the `q_kg_cc_incremental` oracle,
  * which closes over the FULL union).
  */
object Incremental {

  /** @param labels     existing (node, comp) labeling, comp = min member
    * @param deltaEdges new undirected edges (src, dst)
    * @return updated (node, comp) covering old nodes ∪ delta nodes
    */
  def mergeDelta(labels: DataFrame, deltaEdges: DataFrame): DataFrame = {
    // 1. lift delta endpoints to their existing component label (new
    //    nodes stand for themselves); both joins are delta ⋈ corpus on
    //    the node id — delta-sized probe, AQE picks the strategy
    val lbl = labels.select(col("node"), col("comp"))
    val lifted = deltaEdges
      .join(lbl.withColumnRenamed("node", "src")
        .withColumnRenamed("comp", "src_comp"), Seq("src"), "left")
      .join(lbl.withColumnRenamed("node", "dst")
        .withColumnRenamed("comp", "dst_comp"), Seq("dst"), "left")
      .select(coalesce(col("src_comp"), col("src")).as("src"),
        coalesce(col("dst_comp"), col("dst")).as("dst"))
    // 2. CC on the delta-sized super-graph
    val superLabels = Components.connectedComponents(lifted)
      .localCheckpoint(true)
    // 3. remap touched components across the corpus: left join on comp,
    //    untouched rows pass through. No broadcast hint — the remap side
    //    is usually tiny but a backfill delta can touch half the graph
    //    (the Dedup.nearDupDedup r4 lesson).
    val remap = superLabels
      .withColumnRenamed("comp", "new_comp")
      .withColumnRenamed("node", "comp")
    val relabeled = lbl.join(remap, Seq("comp"), "left")
      .select(col("node"),
        coalesce(col("new_comp"), col("comp")).as("comp"))
    // 4. label brand-new nodes (delta endpoints absent from the corpus):
    //    they sit in the super-graph under their own id
    val deltaNodes = deltaEdges.select(col("src").as("node"))
      .union(deltaEdges.select(col("dst").as("node"))).distinct()
    val newNodes = deltaNodes
      .join(lbl.select("node"), Seq("node"), "left_anti")
      .join(superLabels, Seq("node"), "left")
      .select(col("node"), coalesce(col("comp"), col("node")).as("comp"))
    relabeled.unionByName(newNodes)
  }
}
