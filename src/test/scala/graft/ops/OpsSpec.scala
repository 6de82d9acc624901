package graft.ops

import graft.SparkSpec
import graft.core._
import graft.graph.Components
import graft.io.SssomTsv
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  lazy val basic = SssomTsv.read(spark, fixture("basic.tsv"))

  // --- cliques / components (reference tests/test_scc.py:17-21) ---
  test("component mapping counts match SCC sizes [38,36,5,8,8,10,14,8,8,2,4]") {
    val assigned = Components.assignComponents(basic.df)
    val sizes = assigned.groupBy("component").count()
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(sizes == Seq(2L, 4L, 5L, 8L, 8L, 8L, 8L, 10L, 14L, 36L, 38L))
  }

  test("clique summary has one row per component with sane stats") {
    val summary = Components.summarizeCliques(basic.df)
    assert(summary.count() == 11)
    val r = summary.agg(sum("num_mappings")).collect()(0).getLong(0)
    assert(r == 141)
  }

  // --- ptable (reference tests/test_collapse.py:48-51) ---
  test("ptable basic.tsv: 91 rows, probabilities sum to 1") {
    val pt = Ptable.toPtable(basic.df)
    assert(pt.count() == 91)
    val bad = pt.filter(abs(col("p_subclass") + col("p_superclass") +
      col("p_equivalent") + col("p_sibling") - 1.0) > 1e-9).count()
    assert(bad == 0)
  }

  // --- cardinality (fixture carries the expected column) ---
  test("infer_cardinality matches fixture expected values") {
    val msdf = SssomTsv.read(spark, fixture("cardinality.sssom.tsv"))
    val withExpected = msdf.df
      .withColumnRenamed("mapping_cardinality", "expected")
    val computed = Cardinality.inferCardinality(withExpected)
    val mismatches = computed
      .filter(col("mapping_cardinality") =!= col("expected")).count()
    assert(mismatches == 0)
  }

  test("infer_cardinality handles NoTermFound (0:1 / 1:0)") {
    val msdf = SssomTsv.read(spark, fixture("cardinality-with-NoTermFound.sssom.tsv"))
    val withExpected = msdf.df
      .withColumnRenamed("mapping_cardinality", "expected")
    val computed = Cardinality.inferCardinality(withExpected)
    val mismatches = computed
      .filter(col("mapping_cardinality") =!= col("expected")).count()
    assert(mismatches == 0)
  }

  test("infer_cardinality handles literal mappings") {
    val msdf = SssomTsv.read(spark,
      fixture("cardinality-with-literal-mappings.sssom.tsv"))
    val withExpected = msdf.df
      .withColumnRenamed("mapping_cardinality", "expected")
    val computed = Cardinality.inferCardinality(withExpected)
    val mismatches = computed
      .filter(col("mapping_cardinality") =!= col("expected")).count()
    assert(mismatches == 0)
  }

  // --- inversion (reference util.py:1727-1812, constants.py:176-198) ---
  test("invert_mappings swaps ids and maps predicate, sets justification") {
    // the returned frame also carries non-invertible and Not-modified rows
    // unchanged (reference util.py:1797-1803); check the inverted subset
    val inverted = Invert.invertMappings(basic.df, mergeInverted = false)
      .filter(col("mapping_justification") === "semapv:MappingInversion")
    val orig = basic.df.select("subject_id", "object_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val inv = inverted.select("subject_id", "object_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(inv.nonEmpty)
    assert(inv.forall { case (s, o) => orig.contains((o, s)) })
  }

  test("inversion is an involution on symmetric predicates (triple level)") {
    val invertibleOnly = basic.df
      .filter(col("predicate_id").isin(Schema.predicateInvertMap.keys.toSeq: _*))
      .filter(col("predicate_modifier") === "")
    val once = Invert.invertMappings(invertibleOnly, mergeInverted = false,
      updateJustification = false)
    val twice = Invert.invertMappings(once, mergeInverted = false,
      updateJustification = false)
    val a = invertibleOnly
      .select("subject_id", "predicate_id", "object_id").distinct()
    val b = twice.select("subject_id", "predicate_id", "object_id").distinct()
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("invert by subject_prefix only flips rows with that object prefix") {
    val out = Invert.invertMappings(basic.df, subjectPrefix = Some("x"),
      mergeInverted = false)
    assert(out.filter(!col("subject_id").startsWith("x:")).count() == 0)
  }

  // --- prefix filters (reference util.py:1484-1539) ---
  test("filterPrefixes keeps only rows fully inside the prefix set") {
    // features = the triple id columns (the default KEY_FEATURES includes
    // predicate_modifier, whose empty value has no prefix — same in the
    // reference, util.py:1536-1538)
    val kept = Normalize.filterPrefixes(basic.df,
      Set("x", "y", "owl", "rdfs"), features = Schema.TripleIds,
      requireAll = true)
    val pfx = (c: String) => split(col(c), ":", 2).getItem(0)
    val inSet = (c: String) => pfx(c).isin("x", "y", "owl", "rdfs")
    assert(kept.count() ==
      basic.df.filter(inSet("subject_id") && inSet("predicate_id") &&
        inSet("object_id")).count())
    val out = Normalize.filterOutPrefixes(basic.df, Set("z"))
    assert(out.count() == basic.df.filter(
      !col("object_id").startsWith("z:") &&
      !col("subject_id").startsWith("z:")).count())
  }

  // --- triple emission (reference rdf_internal.py:946-970) ---
  test("triple emission excludes Not rows and expands CURIEs") {
    val triples = TripleEmit.emit(basic.df, basic.prefixes)
    // 141 rows, 1 Not row, distinct (s,p,o) after Not removal
    val expected = basic.df.filter(col("predicate_modifier") =!= "Not")
      .select("subject_id", "predicate_id", "object_id").distinct().count()
    assert(triples.count() == expected)
    assert(triples.filter(!col("subject").startsWith("http")).count() == 0)
    assert(triples.filter(col("predicate") ===
      "http://www.w3.org/2002/07/owl#equivalentClass").count() > 0)
  }

  test("triple emission excludes literal mappings") {
    val lit = SssomTsv.read(spark, fixture("literals.sssom.tsv"))
    val triples = TripleEmit.emit(lit.df, lit.prefixes)
    assert(triples.count() == 0 ||
      lit.df.filter(col("object_type") =!= "rdfs literal").count() ==
        triples.count())
  }

  // --- misc ---
  test("removeUnmatched drops noMatch predicates") {
    val df = basic.df.limit(5)
      .withColumn("predicate_id", lit("noMatch"))
      .unionByName(basic.df.limit(3))
    assert(Normalize.removeUnmatched(df).count() == 3)
  }

  test("standardizeReferences normalizes via converter round-trip") {
    val std = Normalize.standardizeReferences(basic.df, basic.prefixes)
    // idempotent on already-standard CURIEs
    assert(std.select("subject_id").exceptAll(
      basic.df.select("subject_id")).count() == 0)
  }

  test("likeFilter: per-column OR, across-column AND") {
    val kept = Normalize.likeFilter(basic.df,
      Map("subject_id" -> Seq("x:%"), "object_id" -> Seq("y:%", "z:%")))
    assert(kept.count() == basic.df.filter(
      col("subject_id").like("x:%") &&
      (col("object_id").like("y:%") || col("object_id").like("z:%"))).count())
  }
}
