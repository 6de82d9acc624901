package graft.core

import org.scalatest.funsuite.AnyFunSuite

class PrefixMapSpec extends AnyFunSuite {
  val pm = PrefixMap.builtIn.chain(PrefixMap(Vector(
    "x" -> "http://example.org/x/",
    "HP" -> "http://purl.obolibrary.org/obo/HP_"
  )))

  test("expand known curie") {
    assert(pm.expand("x:appendage").contains("http://example.org/x/appendage"))
    assert(pm.expand("skos:exactMatch")
      .contains("http://www.w3.org/2004/02/skos/core#exactMatch"))
  }

  test("compress longest prefix wins") {
    assert(pm.compress("http://purl.obolibrary.org/obo/HP_0001").contains("HP:0001"))
  }

  test("standardize passthrough on unknown") {
    assert(pm.standardize("unknown:thing") == "unknown:thing")
    assert(pm.standardize("not a curie") == "not a curie")
  }

  test("standardize compresses iri") {
    assert(pm.standardize("http://example.org/x/y") == "x:y")
  }

  test("builtin priority on chain conflicts") {
    val conflicted = PrefixMap.builtIn.chain(PrefixMap(Vector(
      "owl" -> "http://evil.example/owl#")))
    assert(conflicted.expand("owl:Thing")
      .contains("http://www.w3.org/2002/07/owl#Thing"))
  }

  test("expand/compress round trip") {
    for (c <- Seq("x:a", "HP:123", "owl:Thing", "sssom:NoTermFound"))
      assert(pm.expand(c).flatMap(pm.compress).contains(c))
  }

  test("subMap prunes") {
    val sub = pm.subMap(Set("x"))
    assert(sub.prefixes == Set("x"))
  }
}
