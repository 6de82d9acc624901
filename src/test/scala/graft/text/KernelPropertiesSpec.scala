package graft.text

import graft.functions.ArrayKernels
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties over the pure kernels — the invariants every
  * operator built on them assumes, exercised across generated inputs
  * rather than fixtures.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val word: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val text: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val floats: Gen[Array[Float]] =
    Gen.chooseNum(0, 32).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000, 1000).map(_ / 250.0f)))
      .map(_.toArray)

  test("jaccardShingles: symmetric, bounded, identity on self") {
    check(Prop.forAll(text, text) { (a, b) =>
      val j = TextHash.jaccardShingles(a, b, 3)
      j == TextHash.jaccardShingles(b, a, 3) && j >= 0.0 && j <= 1.0
    })
    check(Prop.forAll(text) { a =>
      TextHash.jaccardShingles(a, a, 3) == 1.0
    })
  }

  test("cosine: symmetric, |cos| bounded, ~1 on self for nonzero vectors") {
    check(Prop.forAll(floats, floats) { (a, b) =>
      val c = TextHash.cosine(a.toSeq, b.toSeq)
      c == TextHash.cosine(b.toSeq, a.toSeq) && math.abs(c) <= 1.0 + 1e-9
    })
    check(Prop.forAll(floats.suchThat(_.exists(_ != 0.0f))) { a =>
      math.abs(TextHash.cosine(a.toSeq, a.toSeq) - 1.0) < 1e-9
    })
  }

  test("native ArrayKernels.cosineF is bit-equal to the Seq kernel") {
    check(Prop.forAll(floats, floats) { (a, b) =>
      ArrayKernels.cosineF(
        new GenericArrayData(a.map(x => x: Any)),
        new GenericArrayData(b.map(x => x: Any))) ==
        TextHash.cosine(a.toSeq, b.toSeq)
    })
    check(Prop.forAll(floats) { a =>
      ArrayKernels.l2NormF(new GenericArrayData(a.map(x => x: Any))) ==
        math.sqrt(a.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
    })
  }

  test("native ArrayKernels.srpSigF is bit-equal to the Seq kernel for " +
      "any bits/seed") {
    val bits = Gen.chooseNum(1, 64)
    val seed = Gen.chooseNum(-100000L, 100000L)
    check(Prop.forAll(floats, bits, seed) { (a, b, s) =>
      ArrayKernels.srpSigF(
        new GenericArrayData(a.map(x => x: Any)), b, s) ==
        TextHash.srpSignature(a.toSeq, b, s)
    })
  }

  test("chunkWidths: positive, as even as possible, sums to the hash width") {
    val mGen = Gen.chooseNum(2, 64)
    check(Prop.forAll(mGen) { m =>
      val w = TextHash.chunkWidths(m, 128)
      w.length == m && w.sum == 128 && w.forall(_ >= 1) &&
        (w.max - w.min) <= 1
    })
    check(Prop.forAll(Gen.chooseNum(2, 60)) { m =>
      val w = TextHash.simhashChunkWidths(m)
      w.length == m && w.sum == 64 && w.forall(_ >= 1) && (w.max - w.min) <= 1
    })
  }

  test("minhash: deterministic, perms-long, equal texts share signatures") {
    check(Prop.forAll(text, Gen.chooseNum(4, 64)) { (t, perms) =>
      val s1 = TextHash.minhash(t, perms, 3)
      val s2 = TextHash.minhash(t, perms, 3)
      s1.length == perms && s1.sameElements(s2)
    })
  }

  test("simhash: zero Hamming on self; bands cover C(m,2) combinations") {
    check(Prop.forAll(text) { t =>
      java.lang.Long.bitCount(
        TextHash.simhash64(t) ^ TextHash.simhash64(t)) == 0
    })
    check(Prop.forAll(text.suchThat(_.nonEmpty), Gen.chooseNum(1, 10)) {
      (t, maxH) =>
        val m = maxH + 2
        TextHash.simhashBands(t, maxH).length == m * (m - 1) / 2
    })
  }

  test("AllPairs prefix length: always >= 1, shrinks as threshold rises") {
    check(Prop.forAll(Gen.chooseNum(1, 10000),
        Gen.chooseNum(1, 99).map(_ / 100.0)) { (n, t) =>
      val p = n - math.ceil(n * t - 1e-9).toLong + 1
      p >= 1 && p <= n
    })
  }

  test("PrefixMap: expand∘compress round-trips IRIs under distinct URI " +
      "prefixes; standardize is idempotent") {
    val pm = graft.core.PrefixMap(Vector(
      "A" -> "http://example.org/a/", "B" -> "http://example.org/b#",
      "C" -> "http://example.org/a/c/"))
    val local: Gen[String] =
      Gen.chooseNum(1, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
    val iri: Gen[String] = for {
      base <- Gen.oneOf("http://example.org/a/", "http://example.org/b#",
        "http://example.org/a/c/")
      l <- local
    } yield base + l
    check(Prop.forAll(iri) { i =>
      // longest-prefix-wins compression must expand back to the same IRI
      pm.compress(i).flatMap(pm.expand).contains(i)
    })
    check(Prop.forAll(iri) { i =>
      val once = pm.standardize(i)
      pm.standardize(once) == once
    })
  }

  test("shingleHashSet: sorted, distinct, and the set jaccardShingles uses") {
    check(Prop.forAll(text) { t =>
      val s = TextHash.shingleHashSet(t, 3)
      val sorted = s.zip(s.drop(1)).forall { case (x, y) => x < y }
      sorted && s.length == s.distinct.length
    })
  }
}
