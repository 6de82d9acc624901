package graft.ops

import graft.SparkSpec
import graft.core._
import graft.io.SssomTsv
import org.apache.spark.sql.functions._

/** Round-2 parity gaps: extract_iris predicate filter, metadata
  * standardization, raw-string / file:// input forms.
  */
class ParityGapsSpec extends SparkSpec {

  test("extractIris resolves CURIEs, IRIs and files-of-CURIEs (io.py:206-231)") {
    val prefixes = PrefixMap.builtIn
    val f = java.nio.file.Files.createTempFile("preds", ".txt")
    java.nio.file.Files.write(f,
      "skos:exactMatch\nowl:equivalentClass\n".getBytes)
    val iris = Normalize.extractIris(
      Seq(f.toString, "skos:closeMatch",
        "http://www.w3.org/2004/02/skos/core#broadMatch",
        "unknownprefix"), prefixes)
    assert(iris == Seq(
      "http://www.w3.org/2002/07/owl#equivalentClass",
      "http://www.w3.org/2004/02/skos/core#broadMatch",
      "http://www.w3.org/2004/02/skos/core#closeMatch",
      "http://www.w3.org/2004/02/skos/core#exactMatch"))
  }

  test("predicate filter at parse keeps only requested predicates") {
    val msdf = SssomTsv.read(spark, fixture("basic.tsv"))
    val kept = Normalize.filterByPredicates(msdf.df,
      Seq("owl:equivalentClass"), msdf.prefixes)
    assert(kept.count() > 0)
    assert(kept.select("predicate_id").distinct().count() == 1)
    val multi = Normalize.filterByPredicates(msdf.df,
      Seq("owl:equivalentClass", "skos:exactMatch"), msdf.prefixes)
    assert(multi.count() >= kept.count())
    assert(Normalize.filterByPredicates(msdf.df, Seq("skos:relatedMatch"),
      msdf.prefixes).count() == 0)
  }

  test("standardizeMetadata: EntityReference set slots go through the converter") {
    val df = spark.range(1).toDF("i")
    val prefixes = PrefixMap.builtIn.chain(PrefixMap(Vector(
      "orcid" -> "https://orcid.org/")))
    val msdf = Msdf(df, Vector(
      "creator_id" -> MetaString("https://orcid.org/0000-0001|orcid:0000-0002"),
      "mapping_set_id" -> MetaString("https://example.org/set"),
      "empty_slot" -> MetaString(""),
      "license" -> MetaString("https://example.org/license")), prefixes)
    val std = msdf.standardizeMetadata()
    // IRIs of known prefixes compress; multivalued split element-wise
    assert(std.metaMap("creator_id") ==
      MetaList(Vector("orcid:0000-0001", "orcid:0000-0002")))
    // falsy values dropped (util.py:603-605)
    assert(!std.metaMap.contains("empty_slot"))
    // non-EntityReference slots untouched
    assert(std.metaMap("mapping_set_id").asString == "https://example.org/set")
  }

  test("invert with subjectPrefix keeps predicate-modified rows when no row already carries the prefix") {
    import spark.implicits._
    // no row has subject prefix "T:"; one Not-modified row exists
    val df = Seq(
      ("a:1", "skos:narrowMatch", "T:9", ""),
      ("a:2", "skos:exactMatch", "T:8", "Not"))
      .toDF("subject_id", "predicate_id", "object_id", "predicate_modifier")
    val out = Invert.invertMappings(df, subjectPrefix = Some("T"),
      mergeInverted = false, updateJustification = false)
    // reference empty-prefixed_subjects branch (util.py:1806-1810):
    // inverted row + the predicate-modified row survive
    val rows = out.select("subject_id", "predicate_id", "object_id",
      "predicate_modifier").as[(String, String, String, String)]
      .collect().toSet
    assert(rows == Set(
      ("T:9", "skos:broadMatch", "a:1", ""),
      ("a:2", "skos:exactMatch", "T:8", "Not")))
  }

  test("ptable raises on unhandled predicates (util.py:1009-1010)") {
    import spark.implicits._
    val df = Seq(("a:1", "madeUp:predicate", "b:1", 0.9))
      .toDF("subject_id", "predicate_id", "object_id", "confidence")
    val err = intercept[IllegalArgumentException] {
      Ptable.toPtable(df).count()
    }
    assert(err.getMessage.contains("madeUp:predicate"))
  }

  test("version ladder: getCompatibleVersion + enforceVersion enum blanking") {
    import spark.implicits._
    val base = Seq(("a:1", "skos:exactMatch", "b:1", "owl class"))
      .toDF("subject_id", "predicate_id", "object_id", "subject_type")
    val v10 = Msdf(base, Vector.empty, PrefixMap.builtIn)
    assert(SqlOps.getCompatibleVersion(v10) == "1.0")
    // a 1.1-only slot forces 1.1
    val withSlot = v10.withDf(base.withColumn("record_id", lit("r1")))
    assert(SqlOps.getCompatibleVersion(withSlot) == "1.1")
    // a 1.1-only enum value in a 1.0 slot forces 1.1
    val withEnum = v10.withDf(base.withColumn("subject_type",
      lit("composed entity expression")))
    assert(SqlOps.getCompatibleVersion(withEnum) == "1.1")
    // enforcing 1.0 drops the slot and blanks the enum value
    val enforced = SqlOps.enforceVersion(
      withSlot.withDf(withSlot.df.withColumn("subject_type",
        lit("composed entity expression"))), "1.0")
    assert(!enforced.df.columns.contains("record_id"))
    assert(enforced.df.filter(col("subject_type") === "").count() == 1)
    // strict mode drops unknown columns; non-strict keeps them
    val unknown = v10.withDf(base.withColumn("my_extension", lit("x")))
    assert(SqlOps.enforceVersion(unknown, "1.1", strict = true)
      .df.columns.toSet == Set("subject_id", "predicate_id", "object_id",
        "subject_type"))
    assert(SqlOps.enforceVersion(unknown, "1.1")
      .df.columns.contains("my_extension"))
    // unparseable / unknown versions raise (reference parse_sssom_version
    // rejects via SssomVersionEnum, constants.py:367-378)
    for (bad <- Seq("2.0", "0.9", "1", "1.0.1", "", "garbage"))
      intercept[IllegalArgumentException](SqlOps.enforceVersion(v10, bad))
    assert(SqlOps.parseSssomVersion("1.1") == ((1, 1)))
  }

  test("raw-string and file:// inputs parse like paths (parsers.py:104-141)") {
    val path = fixture("basic.tsv")
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    val fromString = SssomTsv.read(spark, content)
    assert(fromString.df.count() == 141)
    assert(fromString.prefixes.contains("x"))
    val fromUrl = SssomTsv.read(spark, "file://" + path)
    assert(fromUrl.df.count() == 141)
    val err = intercept[UnsupportedOperationException] {
      SssomTsv.read(spark, "https://example.org/basic.tsv")
    }
    assert(err.getMessage.contains("offline"))
  }

  test("http(s) input parses through an injected fetcher (parsers.py:116-120)") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture("basic.tsv")))
    var fetched: String = null
    val fetcher = (url: String) => {
      fetched = url
      new java.io.ByteArrayInputStream(bytes): java.io.InputStream
    }
    val msdf = SssomTsv.read(spark, "https://example.org/basic.tsv",
      fetcher = Some(fetcher))
    assert(fetched == "https://example.org/basic.tsv")
    assert(msdf.df.count() == 141)
    assert(msdf.prefixes.contains("x"))
    // gzipped URL content is transparently decompressed
    val gz = new java.io.ByteArrayOutputStream()
    locally {
      val o = new java.util.zip.GZIPOutputStream(gz)
      o.write(bytes); o.close()
    }
    val gzMsdf = SssomTsv.read(spark, "https://example.org/basic.tsv.gz",
      fetcher = Some(_ => new java.io.ByteArrayInputStream(gz.toByteArray)))
    assert(gzMsdf.df.count() == 141)
  }
}
