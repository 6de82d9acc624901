package graft.graph

import graft.SparkSpec
import graft.text.TextHash
import org.apache.spark.sql.functions._

/** Large-star/small-star CC must agree exactly with min-label
  * propagation — including on deep chains where the star algorithm's
  * O(log² n) round bound is the point.
  */
class ComponentsStarSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, String)].collect().toMap

  test("star CC equals min-label CC on chains, cliques, rings and randoms") {
    def n(i: Int) = f"n$i%04d"
    val chain = (0 until 60).map(i => (n(i), n(i + 1)))         // deep path
    val clique = for { i <- 100 until 110; j <- 100 until 110; if i < j }
      yield (n(i), n(j))
    val ring = (200 until 220).map(i =>
      (n(i), n(if (i == 219) 200 else i + 1)))
    val random = (0 until 80).map { k =>
      val a = 300 + math.floorMod(TextHash.mix(7L, k.toLong), 40L).toInt
      val b = 300 + math.floorMod(TextHash.mix(11L, k.toLong), 40L).toInt
      (n(a), n(b))
    }.filter(e => e._1 != e._2)
    val edges = (chain ++ clique ++ ring ++ random).toDF("src", "dst")

    // the 60-deep chain needs ~60 min-label rounds — past the default
    // cap, which is exactly the regime the star algorithm exists for
    val byProp = labelsOf(Components.connectedComponents(edges, maxIter = 200))
    val byStar = labelsOf(Components.connectedComponentsStar(edges))
    assert(byStar.keySet == byProp.keySet)
    assert(byStar == byProp)
    // the deep chain really is one component rooted at its minimum
    assert(byStar(n(60)) == n(0))
  }

  test("star CC labels every endpoint and uses the min member as root") {
    val edges = Seq(("b", "a"), ("c", "b"), ("x", "y")).toDF("src", "dst")
    val got = labelsOf(Components.connectedComponentsStar(edges))
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }
}
