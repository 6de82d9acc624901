package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: key "hot" carries 80% of rows
  private lazy val skewed = (0L until 2000L).map { i =>
    val key = if (i % 5 != 0) "hot" else s"cold_${i % 37}"
    (i, key, i % 100)
  }.toDF("id", "key", "v")

  test("keyStats: exact counts and shares, hottest first, deterministic " +
      "ties") {
    val out = Skew.keyStats(skewed, "key", topN = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val exact = skewed.collect().map(_.getString(1))
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    assert(out.head._1 == "hot" && out.head._2 == exact("hot"))
    assert(out.head._3 == exact("hot").toDouble / 2000L)
    // descending, key-asc on ties
    assert(out.sortBy(r => (-r._2, r._1)).toSeq == out.toSeq)
    out.foreach { case (k, n, share) =>
      assert(n == exact(k) && share == n.toDouble / 2000L)
    }
  }

  test("saltedAggregate equals the direct aggregation bit-exactly") {
    val direct = skewed.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(skewed, "key", Seq("v"), salts = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
    // two-stage shape: partials on (key, salt) — both aggregate stages
    // present, and the first exchange is keyed by key AND salt
    val plan = Skew.saltedAggregate(skewed, "key", Seq("v"), salts = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan.take(800))
  }

  test("property: salted ops equal their unsalted forms on generated " +
      "data and salt counts") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val dataGen = for {
      n <- Gen.chooseNum(1, 300)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "hot", "hot", "hot", "c")
        v <- Gen.chooseNum(0L, 1000L)
      } yield (k, v))
    } yield rows
    val saltGen = Gen.oneOf(1, 2, 7, 16, 64)
    val p = Prop.forAll(dataGen, saltGen) { (rows, salts) =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (i.toLong, k, v) }
        .toDF("id", "key", "v")
      val direct = df.groupBy("key")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      val salted = Skew.saltedAggregate(df, "key", Seq("v"), salts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      salted == direct
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(r.passed, r.status.toString)
  }

  test("saltedJoin returns exactly the plain join's rows") {
    val probe = skewed.select(col("key"), col("id"), col("v"))
    val build = Seq(("hot", 1), ("cold_3", 2), ("cold_7", 3), ("absent", 9))
      .toDF("key", "tag")
    val plain = probe.join(build, "key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    val salted = Skew.saltedJoin(probe, build, "key", salts = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(salted == plain && salted.nonEmpty)
    // the join key is (key, __salt), never the raw skewed key alone
    val plan = Skew.saltedJoin(probe, build, "key", salts = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan.take(800))
    // deterministic under repartitioning (hash salts, no RNG)
    val again = Skew.saltedJoin(probe.repartition(7), build, "key", 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(again == plain)
  }
}
