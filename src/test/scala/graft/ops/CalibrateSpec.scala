package graft.ops

import graft.SparkSpec

class CalibrateSpec extends SparkSpec {
  import spark.implicits._

  private def run(df: org.apache.spark.sql.DataFrame) =
    Calibrate.permilleRankBySource(df, scoreCol = "score")
      .as[(Long, String, Long, Long)].collect().toSet

  private def brute(rows: Seq[(Long, String, Long)]) =
    rows.groupBy(_._2).flatMap { case (_, rs) =>
      rs.map { r =>
        val below = rs.count(_._3 < r._3).toLong
        val pct = if (rs.length > 1) below * 1000L / (rs.length - 1) else 0L
        (r._1, r._2, r._3, pct)
      }
    }.toSet

  test("hand-computed ranks: ties share the min-rank permille, " +
      "single-doc source is 0, extremes hit 0 and 1000") {
    val rows = Seq(
      // source a: scores 1,5,5,9 -> below = 0,1,1,3 over n-1=3
      (1L, "a", 1L), (2L, "a", 5L), (3L, "a", 5L), (4L, "a", 9L),
      // source b: one document
      (5L, "b", 7L))
    val got = run(rows.toDF("doc_id", "source", "score"))
    assert(got == Set(
      (1L, "a", 1L, 0L), (2L, "a", 5L, 333L), (3L, "a", 5L, 333L),
      (4L, "a", 9L, 1000L), (5L, "b", 7L, 0L)))
  }

  test("equals per-source brute force on random scores; " +
      "partition-invariant") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(800) { i =>
      (i.toLong, s"s${rnd.nextInt(5)}", rnd.nextInt(200).toLong)
    }
    val df = rows.toDF("doc_id", "source", "score")
    val got = run(df)
    assert(got == brute(rows))
    assert(run(df.repartition(13)) == got)
  }

  test("calibration is scale-free: any monotone score transform leaves " +
      "pct_pm unchanged") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.tabulate(300) { i =>
      (i.toLong, s"s${rnd.nextInt(3)}", rnd.nextInt(50).toLong)
    }
    val raw = run(rows.toDF("doc_id", "source", "score"))
      .map(r => (r._1, r._4))
    val scaled = run(rows.map(r => (r._1, r._2, r._3 * 7L + 100L))
      .toDF("doc_id", "source", "score")).map(r => (r._1, r._4))
    assert(raw == scaled)
  }

  test("rejects reserved __cal_ columns") {
    val df = Seq((1L, "a", 1L, 0L))
      .toDF("doc_id", "source", "score", "__cal_n")
    intercept[IllegalArgumentException] {
      Calibrate.permilleRankBySource(df, scoreCol = "score")
    }
  }
}
