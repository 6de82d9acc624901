package graft.streaming

import graft.SparkSpec
import graft.ops.Attribution
import org.apache.spark.sql.streaming.Trigger

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(1767225600000L + s * 1000L)

  private def runStream(in: String, name: String, windowSeconds: Long) = {
    val q = EventStream.attributionStream(
      EventStream.readEventStream(spark, in),
      windowSeconds = windowSeconds, watermark = "10 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"cp_$name").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.sql(s"SELECT * FROM $name")
      .as[(Long, Long, Long, String, Long)].collect().toSet
  }

  private def batch(rows: Seq[(Long, Long, String, java.sql.Timestamp)],
      windowSeconds: Long) =
    Attribution.lastTouch(
      rows.toDF("event_id", "user_id", "event_type", "ts"),
      windowSeconds = windowSeconds)
      .as[(Long, Long, Long, String, Long)].collect().toSet

  test("single micro-batch equals the batch operator bit for bit") {
    val rnd = new scala.util.Random(31)
    val types = Array("click", "view", "purchase", "error")
    val rows = Seq.tabulate(400) { i =>
      (i.toLong, rnd.nextInt(8).toLong, types(rnd.nextInt(types.length)),
        ts(rnd.nextInt(300).toLong))
    }
    val in = java.nio.file.Files.createTempDirectory("evs1").toString
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .coalesce(1).write.mode("append").parquet(in)
    assert(runStream(in, "attr_one", 100L) == batch(rows, 100L))
  }

  test("event-time-ordered micro-batches equal the batch operator; " +
      "touch state carries across batches") {
    val rnd = new scala.util.Random(37)
    val types = Array("click", "view", "purchase")
    val rows = Seq.tabulate(300) { i =>
      (i.toLong, rnd.nextInt(6).toLong, types(rnd.nextInt(types.length)),
        ts(rnd.nextInt(240).toLong))
    }
    val in = java.nio.file.Files.createTempDirectory("evs2").toString
    // three sequential appends split on event-time thirds ->
    // maxFilesPerTrigger=1 replays them as ordered micro-batches
    // (file-source ordering follows modification time)
    Seq(rows.filter(_._4.getTime < ts(80).getTime),
        rows.filter(r => r._4.getTime >= ts(80).getTime &&
          r._4.getTime < ts(160).getTime),
        rows.filter(_._4.getTime >= ts(160).getTime))
      .foreach { part =>
        part.toDF("event_id", "user_id", "event_type", "ts")
          .coalesce(1).write.mode("append").parquet(in)
        Thread.sleep(1100) // distinct mod-times -> deterministic order
      }
    assert(runStream(in, "attr_multi", 100L) == batch(rows, 100L))
  }

  test("expired touch cannot attribute; equal-ts cross-batch touch " +
      "stays strictly-before") {
    val rows = Seq(
      (1L, 1L, "click", ts(0)),        // batch 1
      (2L, 1L, "purchase", ts(500)),   // batch 2: gap 500 > 100 -> direct
      (3L, 2L, "view", ts(400)),       // batch 2
      (4L, 2L, "purchase", ts(400)),   // equal ts -> direct
      (5L, 2L, "purchase", ts(450)))   // gap 50 -> view
    val in = java.nio.file.Files.createTempDirectory("evs3").toString
    Seq(rows.take(1), rows.drop(1)).zipWithIndex.foreach { case (part, i) =>
      // distinct file mod-times so maxFilesPerTrigger=1 replays batch 1
      // before batch 2 deterministically (ADVICE r5; same idiom as the
      // cross-batch test above)
      if (i > 0) Thread.sleep(1100)
      part.toDF("event_id", "user_id", "event_type", "ts")
        .coalesce(1).write.mode("append").parquet(in)
    }
    val got = runStream(in, "attr_expiry", 100L)
    assert(got == Set(
      (2L, 1L, -1L, "direct", -1L),
      (4L, 2L, -1L, "direct", -1L),
      (5L, 2L, 3L, "view", 50L)))
    assert(got == batch(rows, 100L))
  }
}
