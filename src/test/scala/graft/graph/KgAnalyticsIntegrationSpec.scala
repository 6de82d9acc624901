package graft.graph

import graft.SparkSpec
import graft.core.Schema
import graft.kg.KgPipeline
import org.apache.spark.sql.functions._

/** The materialized Iceberg-layout graph feeds the analytics family
  * directly: read the edge table back from disk, run degree / PageRank /
  * CC over it, and cross-check against the node table the pipeline wrote
  * alongside (its `component` labels and `degree` counts were computed
  * independently, inside materialize).
  */
class KgAnalyticsIntegrationSpec extends SparkSpec {

  test("degrees, components and PageRank over the materialized edge table " +
      "agree with the pipeline's own node table") {
    val out = java.nio.file.Files.createTempDirectory("kgan").toString
    val cfg = KgPipeline.Config(outDir = out, nConv = 200L,
      turnsPerConv = 6, nConcepts = 150L, buckets = 8, resumeGroups = 2)
    KgPipeline.run(spark, cfg)

    val edges = spark.read.parquet(s"$out/edges")
      .select(col(Schema.SubjectId).as("src"), col(Schema.ObjectId).as("dst"))
    val nodesTable = spark.read.parquet(s"$out/nodes")

    // degree parity: the node table's `degree` counts edge endpoints per
    // (node, bucket); summed over buckets it equals Analytics.degrees' deg
    val want = nodesTable.groupBy("node")
      .agg(sum("degree").as("deg")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val got = Analytics.degrees(edges).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    assert(got == want, s"degree mismatch: ${got.size} vs ${want.size} nodes")

    // node/edge-table consistency: the node table's component per node is
    // the min over the components of the edges it touches (object rows
    // inherit the subject's label by construction)
    val edgeTable = spark.read.parquet(s"$out/edges")
    val fromEdges = edgeTable
      .select(col(Schema.SubjectId).as("node"), col("component"))
      .union(edgeTable.select(col(Schema.ObjectId).as("node"),
        col("component")))
      .groupBy("node").agg(min("component").as("component")).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    val written = nodesTable.groupBy("node")
      .agg(min("component").as("component")).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(written == fromEdges)

    // canonicalization parity: every exactMatch edge row carries the
    // fresh-CC label of its subject
    val exact = edgeTable
      .filter(col(Schema.PredicateId) === Schema.SkosExactMatch)
    val cc = Components.connectedComponents(
      exact.select(col(Schema.SubjectId).as("src"),
        col(Schema.ObjectId).as("dst")))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    exact.select(col(Schema.SubjectId), col("component")).distinct()
      .collect().foreach { r =>
        assert(cc(r.getString(0)) == r.getString(1),
          s"component of ${r.getString(0)}: " +
            s"${cc(r.getString(0))} vs ${r.getString(1)}")
      }

    // PageRank runs over the same table; mass sanity only (fixed-point
    // exactness is AnalyticsSpec's job)
    val pr = Analytics.pageRankFixedPoint(edges, iters = 5)
    val base = 1000000000L * 15L / 100L
    assert(pr.filter(col("rank") < base).isEmpty)
    assert(pr.count() == got.size)

    // k-core over the same table: the 2-core's nodes must all have
    // total degree >= 2 in the FULL graph (necessary condition), and
    // peeling a k above the max degree leaves nothing
    val core2 = Analytics.kCore(edges, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    core2.keys.foreach { n =>
      assert(want(n) >= 2L, s"2-core node $n has full-graph degree ${want(n)}")
    }
    val maxDeg = want.values.max
    assert(Analytics.kCore(edges, k = (maxDeg + 1L).toInt).isEmpty)
  }
}
