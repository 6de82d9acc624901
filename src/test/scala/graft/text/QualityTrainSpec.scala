package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Witnesses for the quality-classifier training loop: gradient descent
  * over hashed BoW is float (no DuckDB oracle), so correctness is
  * evidenced by a planted-signal recovery, monotone loss, and inference
  * parity through the same plumbing.
  */
class QualityTrainSpec extends SparkSpec {
  import spark.implicits._

  private val filler = Array("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  /** n deterministic docs: half carry the positive signal token. */
  private def planted(n: Int): Seq[(Long, String, Int)] = {
    var state = 42L
    def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; state }
    (0 until n).map { i =>
      val words = (0 until 12).map(_ =>
        filler(math.floorMod(next(), filler.length.toLong).toInt))
      val y = i % 2
      val signal = if (y == 1) "goodstuff" else "junkstuff"
      (i.toLong, (words :+ signal).mkString(" "), y)
    }
  }

  test("planted signal is recovered: training accuracy 1.0, loss falls") {
    val docs = planted(300).toDF("doc_id", "text", "y")
    val model = QualityTrain.train(docs, "text", "y",
      dim = 512, iters = 60, lr = 5.0)
    assert(model.lossPerEpoch.head > 0.6, // ~log(2) at w=0
      s"first-epoch loss should start near ln 2: ${model.lossPerEpoch.head}")
    // full-batch GD at a smooth (non-oscillatory) lr: strictly monotone
    assert(model.lossPerEpoch.sliding(2).forall(p => p(1) < p(0)),
      s"loss must fall monotonically: ${model.lossPerEpoch}")
    assert(model.lossPerEpoch.last < 0.55,
      s"loss must fall: ${model.lossPerEpoch.head} -> ${model.lossPerEpoch.last}")
    val scored = QualityTrain.scoreWith(docs, model, "text")
    val acc = scored.join(docs.select("doc_id", "y"), "doc_id")
      .select(avg((col("keep") === (col("y") === 1)).cast("double")))
      .as[Double].head()
    assert(acc == 1.0, s"planted signal must separate perfectly, got $acc")
  }

  test("distributed epoch loop (localCutoff = 0) recovers the planted " +
      "signal like the driver fast path; losses agree to float-reduce " +
      "tolerance") {
    val docs = planted(120).toDF("doc_id", "text", "y")
    val dist = QualityTrain.train(docs, "text", "y",
      dim = 256, iters = 25, lr = 5.0, localCutoff = 0)
    val fast = QualityTrain.train(docs, "text", "y",
      dim = 256, iters = 25, lr = 5.0)
    // both paths: monotone loss and perfect separation on the plant
    assert(dist.lossPerEpoch.sliding(2).forall(p => p(1) < p(0)))
    val acc = QualityTrain.scoreWith(docs, dist, "text")
      .join(docs.select("doc_id", "y"), "doc_id")
      .select(avg((col("keep") === (col("y") === 1)).cast("double")))
      .as[Double].head()
    assert(acc == 1.0, s"distributed path must separate the plant, got $acc")
    // same arithmetic up to float summation order: per-epoch losses agree
    dist.lossPerEpoch.zip(fast.lossPerEpoch).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"loss diverged: $a vs $b")
    }
  }

  test("signal tokens carry the extreme weights") {
    val docs = planted(200).toDF("doc_id", "text", "y")
    val model = QualityTrain.train(docs, "text", "y",
      dim = 512, iters = 60, lr = 5.0)
    val good = model.weights(QualityTrain.bucketOf("goodstuff", model.salt, model.dim))
    val junk = model.weights(QualityTrain.bucketOf("junkstuff", model.salt, model.dim))
    assert(good == model.weights.max && junk == model.weights.min,
      s"signal buckets must dominate: good=$good junk=$junk")
  }

  test("empty and null docs score 0.5 and are never kept") {
    val docs = planted(50).toDF("doc_id", "text", "y")
    val model = QualityTrain.train(docs, "text", "y",
      dim = 256, iters = 5, lr = 2.0)
    val edge = Seq((900L, ""), (901L, "   "), (902L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = QualityTrain.scoreWith(edge, model, "text")
      .as[(Long, Double, Boolean)].collect().sortBy(_._1)
    assert(got.forall(r => r._2 == 0.5 && !r._3))
  }

  test("headline composition is deterministic in its DECISIONS on the " +
      "testdata (row count and keep set stable across two runs)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    def run() = graft.SparkEntry
      .queries("q_doc_model_quality_trained")(spark, dir)
      .as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    val a = run()
    assert(a.nonEmpty)
    // decisions sit far from the 0.5 threshold for the planted token
    // label, so float-reduce jitter cannot flip them run-to-run
    assert(a == run())
  }
}
