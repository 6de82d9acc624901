package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  // event in hour-bucket h (hours since epoch anchor)
  private def ts(h: Long, i: Long) =
    new Timestamp(1767225600000L + h * 3600000L + i * 1000L)

  private def mk(perBucket: Seq[(String, Long, Int)]) =
    perBucket.flatMap { case (tpe, h, n) =>
      (0 until n).map(i => (tpe, ts(h, i.toLong)))
    }.toDF("event_type", "ts")

  private def run(df: org.apache.spark.sql.DataFrame, k: Long = 2000L) =
    Anomaly.eventRateOutliers(df, bucketSeconds = 3600L, kPermille = k)
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet

  test("spike against a flat baseline is the only flagged bucket; " +
      "MAD floors at 1") {
    // a: 10,10,10,100 -> lower med 10 (rank (4+1)//2 = 2), ads 0,0,0,90
    // -> MAD 0 -> floor 1 -> only the spike clears 2000/1000 x 1
    val df = mk(Seq(("a", 0L, 10), ("a", 1L, 10), ("a", 2L, 10),
      ("a", 3L, 100)))
    val got = run(df)
    val anchor = 1767225600L / 3600L
    assert(got.map(t => (t._2 - anchor, t._3, t._4, t._5, t._6)) == Set(
      (0L, 10L, 10L, 0L, false), (1L, 10L, 10L, 0L, false),
      (2L, 10L, 10L, 0L, false), (3L, 100L, 10L, 0L, true)))
  }

  test("lower median: even bucket count takes the smaller middle " +
      "element, never an interpolated average") {
    // counts 2,4,6,8 -> med = 4 (rank 2), not 5
    val df = mk(Seq(("a", 0L, 2), ("a", 1L, 4), ("a", 2L, 6), ("a", 3L, 8)))
    assert(run(df).forall(_._4 == 4L))
  }

  test("equals brute force on random buckets; types independent; " +
      "partition-invariant") {
    val rnd = new scala.util.Random(23)
    val spec = for {
      tpe <- Seq("x", "y", "z"); h <- 0L until 24L
    } yield (tpe, h, 1 + rnd.nextInt(40))
    val df = mk(spec)
    val k = 1500L
    val got = run(df, k)
    val expect = spec.groupBy(_._1).flatMap { case (tpe, rows) =>
      def lowerMed(xs: Seq[(Long, Long)]): Long = { // (value, bucket)
        val sorted = xs.sortBy(identity)
        sorted(((sorted.length + 1) / 2) - 1)._1
      }
      val anchor = 1767225600L / 3600L
      val counts = rows.map(r => (anchor + r._2, r._3.toLong))
      val med = lowerMed(counts.map { case (b, n) => (n, b) })
      val mad = lowerMed(counts.map { case (b, n) => (math.abs(n - med), b) })
      counts.map { case (b, n) =>
        (tpe, b, n, med, mad,
          math.abs(n - med) * 1000L > k * math.max(mad, 1L))
      }
    }.toSet
    assert(got == expect)
    assert(run(df.repartition(11), k) == got)
  }

  test("kPermille = 0 flags every bucket off the median") {
    val df = mk(Seq(("a", 0L, 3), ("a", 1L, 5), ("a", 2L, 9)))
    val got = run(df, 0L)
    assert(got.count(_._6) == 2) // med = 5; buckets 3 and 9 deviate
  }
}
