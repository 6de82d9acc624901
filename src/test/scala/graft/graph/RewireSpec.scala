package graft.graph

import graft.SparkSpec
import graft.io.SssomTsv
import graft.ops.TripleEmit

class RewireSpec extends SparkSpec {
  import spark.implicits._

  test("rewire replaces equivalent ids across all triple positions") {
    val mappings = Seq(
      ("x:a", "owl:equivalentClass", "y:a"),
      ("x:b", "owl:equivalentClass", "y:b"))
      .toDF("subject_id", "predicate_id", "object_id")
    val triples = Seq(
      ("x:a", "rdfs:subClassOf", "x:b"),
      ("x:b", "rdfs:subClassOf", "z:c"),
      ("z:c", "rdfs:seeAlso", "z:d"))
      .toDF("subject", "predicate", "object")
    val (out, changed) = Rewire.rewire(triples, mappings)
    assert(changed == 2)
    val rows = out.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows.contains(("y:a", "rdfs:subClassOf", "y:b")))
    assert(rows.contains(("y:b", "rdfs:subClassOf", "z:c")))
    assert(rows.contains(("z:c", "rdfs:seeAlso", "z:d")))
  }

  test("ambiguous rewiring errors without precedence, resolves with it") {
    val mappings = Seq(
      ("x:a", "owl:equivalentClass", "y:a"),
      ("x:a", "owl:equivalentClass", "z:a"))
      .toDF("subject_id", "predicate_id", "object_id")
    val triples = Seq(("x:a", "rdfs:seeAlso", "q:q"))
      .toDF("subject", "predicate", "object")
    intercept[IllegalArgumentException] {
      Rewire.rewire(triples, mappings)
    }
    val (out, _) = Rewire.rewire(triples, mappings,
      precedence = Seq("z", "y"))
    assert(out.collect()(0).getString(0) == "z:a")
  }

  test("external metadata companion file is honored (basic-meta-external)") {
    val msdf = SssomTsv.read(spark, fixture("basic-meta-external.tsv"),
      metaPath = Some(fixture("basic-meta-external.yml")))
    assert(msdf.metaMap.get("mapping_set_id").exists(
      _.asString == "https://w3id.org/sssom/sssompy/tests/basic-test"))
    assert(msdf.df.count() > 0)
  }

  test("gzip input transparently handled") {
    // gzip a fixture into a temp dir and read it back
    val src = java.nio.file.Paths.get(fixture("basic3.tsv"))
    val dir = java.nio.file.Files.createTempDirectory("gz")
    val gz = dir.resolve("basic3.tsv.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gz))
    out.write(java.nio.file.Files.readAllBytes(src)); out.close()
    val msdf = SssomTsv.read(spark, gz.toString)
    assert(msdf.df.count() == 11)
    assert(msdf.prefixes.expand("a:x").isDefined)
  }

  test("determinism: same pipeline twice → identical emitted triple sets") {
    val a = TripleEmit.emit(
      SssomTsv.read(spark, fixture("basic.tsv")).df,
      SssomTsv.read(spark, fixture("basic.tsv")).prefixes)
    val b = TripleEmit.emit(
      SssomTsv.read(spark, fixture("basic.tsv")).df,
      SssomTsv.read(spark, fixture("basic.tsv")).prefixes)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
