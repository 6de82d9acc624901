package graft.functions

import graft.SparkSpec
import graft.text.TextHash
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Long, dim: Int): Array[Float] =
    Array.tabulate(dim)(d =>
      ((TextHash.mix(seed, d.toLong) % 2001) - 1000) / 1000.0f)

  test("native expression is bit-identical to the UDF kernel, including " +
      "edge shapes") {
    val pairs: Seq[(Array[Float], Array[Float])] =
      (0L until 50L).map(i => (vec(i, 16), vec(i + 1000, 16))) ++ Seq(
        (vec(1, 16), vec(2, 8)),          // unequal lengths: min-zip
        (Array.fill(4)(0.0f), vec(3, 4)), // zero norm -> 0.0
        (Array.empty[Float], vec(4, 4)),  // empty -> 0.0
        (vec(5, 16), vec(5, 16)))         // self-similarity ~ 1.0
    val df = pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
        graft.sim.Similarity.cosine(col("a"), col("b")).as("cos"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      val expect = TextHash.cosine(a.toSeq, b.toSeq)
      assert(got(i) == expect, s"pair $i: ${got(i)} != $expect (bit-exact)")
    }
  }

  test("expression runs inside whole-stage codegen (no UDF boundary)") {
    // repartition defeats ConvertToLocalRelation, which would otherwise
    // constant-fold the projection via eval() and hide the codegen path
    val df = (0L until 100L).map(i => (i, vec(i, 16), vec(i + 7, 16)))
      .toDF("id", "a", "b").repartition(2)
      .select(graft.sim.Similarity.cosine(col("a"), col("b")).as("cos"))
    assert(df.collect().length == 100)
    // AQE prints codegen spans only in the finalized plan — read it
    // after execution
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen span in the compact form
    assert(plan.contains("*(1) Project [graft_cosine"), plan.take(600))
    assert(!plan.contains("ScalaUDF"), "native path must not fall back to UDF")
  }

  test("L2Norm native expression matches the interpreted HOF form " +
      "bit-exactly") {
    val rows = (0L until 50L).map(i => (i, vec(i, 16))) ++
      Seq((100L, Array.empty[Float]), (101L, Array.fill(4)(0.0f)))
    val df = rows.toDF("id", "v").repartition(2)
    val native = df.select(col("id"),
        org.apache.spark.sql.GraftColumnBridge.column(
          L2Norm(org.apache.spark.sql.GraftColumnBridge.expression(col("v"))))
          .as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hof = df.select(col("id"),
        sqrt(aggregate(
          transform(col("v"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, _) =>
      assert(native(id) == hof(id), s"id $id: ${native(id)} != ${hof(id)}")
    }
  }

  test("GraftExtensions registers graft_cosine for SQL users") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))
        |""".stripMargin).collect().head.getDouble(0)
    assert(r == 1.0)
    // double arrays implicit-cast to float arrays (ImplicitCastInputTypes)
    val r2 = spark.sql("SELECT graft_cosine(array(1.0, 0.0), array(0.0, 1.0))")
      .collect().head.getDouble(0)
    assert(r2 == 0.0)
    val r3 = spark.sql("SELECT graft_l2_norm(array(3.0, 4.0))")
      .collect().head.getDouble(0)
    assert(r3 == 5.0)
  }

  test("SrpSignature native expression is bit-identical to the kernel, " +
      "column-seeded, codegen'd, and SQL-registered") {
    val rows = (0L until 60L).map(i => (i, vec(i, 24)))
    val df = rows.toDF("id", "v").repartition(2)
    // literal seed path (Similarity.srpSignature public API)
    val got = df.select(col("id"),
        graft.sim.Similarity.srpSignature(col("v"), bits = 16, seed = 42L)
          .as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (i, v) =>
      val expect = TextHash.srpSignature(v.toSeq, 16, 42L)
      assert(got(i) == expect, s"row $i: ${got(i)} != $expect")
    }
    // column-derived seed (the banded multi-table path): one expression,
    // per-row seeds
    import org.apache.spark.sql.GraftColumnBridge
    def srpCol(vec: org.apache.spark.sql.Column,
        seed: org.apache.spark.sql.Column) =
      GraftColumnBridge.column(SrpSignature(
        GraftColumnBridge.expression(vec),
        GraftColumnBridge.expression(seed.cast("long")), 12))
    val banded = df.withColumn("table", explode(sequence(lit(0), lit(2))))
      .select(col("id"), col("table"),
        srpCol(col("v"), lit(7700L) + col("table")).as("sig"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(banded.size == 180)
    rows.take(10).foreach { case (i, v) =>
      (0 to 2).foreach { t =>
        val expect = TextHash.srpSignature(v.toSeq, 12, 7700L + t)
        assert(banded((i, t)) == expect, s"row $i table $t")
      }
    }
    val plan = df.repartition(2)
      .select(graft.sim.Similarity.srpSignature(col("v"), 16, 42L).as("s"))
    plan.collect()
    val p = plan.queryExecution.executedPlan.toString
    assert(p.contains("graft_srp_sig") && !p.contains("ScalaUDF"),
      p.take(600))
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_srp_sig(array(1.0, -2.0, 0.5), 16, 42)")
      .collect().head.getLong(0)
    assert(r == TextHash.srpSignature(Seq(1.0f, -2.0f, 0.5f), 16, 42L))
  }
}
