package graft

import graft.kg.KgPipeline
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the headline queries on
  * SPARK_GRAFT_SF_DIR at SPARK_GRAFT_CPUS threads and prints ONE JSON line.
  *
  * Additionally measures the north rule's N→4N scaling efficiency: the KG
  * pipeline (extract → link → reconcile → canonicalize) runs on identical
  * input at local[2] and local[8]; efficiency =
  * (throughput_4N / throughput_N) / 4 (BASELINE.md protocol — a real
  * multi-executor cluster is not available in this sandbox).
  */
object Bench {

  private val headline = Seq(
    "q_collapse_agg", "q_window_max_filter", "q_reconcile_sssom",
    "q_cardinality", "q_anti_remove", "q_sessionize", "q_top3_per_flag",
    "q_doc_token_count", "q_doc_exact_dedup", "q_doc_quality", "q_doc_lang",
    "q_doc_minhash_neardup", "q_doc_simhash_neardup",
    "q_embed_topk", "q_embed_ann_lsh", "q_multimodal_features",
    "q_cc_small", "q_kg_triples")

  private def session(threads: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-bench-$threads")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** KG pipeline workload for the scaling runs: returns (triples, seconds). */
  private def kgRun(spark: SparkSession, scale: Long): (Long, Double) = {
    val cfg = KgPipeline.Config(outDir = "", nConv = scale,
      turnsPerConv = 8, nConcepts = 2000L)
    val t0 = System.nanoTime()
    val n = KgPipeline.buildGraph(KgPipeline.extractMappings(spark, cfg)).count()
    (n, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scale = sys.env.getOrElse("SPARK_GRAFT_KG_CONV", "12000").toLong

    // --- headline query timings at the driver-requested parallelism ---
    val spark = session(cpus)
    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    spark.stop()

    // --- scaling: same job, two parallelism levels (N=2, 4N=8) ---
    // This sandbox is a Firecracker microVM with visible CPU steal, so a
    // single wall-clock sample is unreliable. Protocol: per level, one
    // small warmup (codegen/classloading), then interleaved measured runs
    // (N, 4N, N, 4N) taking the MIN per level — the min approximates the
    // un-stolen capacity at that parallelism.
    def runOnce(threads: Int, warm: Boolean): (Long, Double) = {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val s = session(threads)
      if (warm) kgRun(s, scale / 8)
      val r = kgRun(s, scale)
      s.stop()
      r
    }
    val n1 = runOnce(2, warm = true)
    val f1 = runOnce(8, warm = true)
    val n2 = runOnce(2, warm = false)
    val f2 = runOnce(8, warm = false)
    val (triplesN, secN) = if (n1._2 <= n2._2) n1 else n2
    val (triples4N, sec4N) = if (f1._2 <= f2._2) f1 else f2

    val thrN = triplesN / secN
    val thr4N = triples4N / sec4N
    val efficiency = (thr4N / thrN) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scaling =
      f"""{"n_threads":2,"n4_threads":8,"triples":$triplesN,""" +
      f""""sec_n":$secN%.2f,"sec_4n":$sec4N%.2f,""" +
      f""""triples_per_sec_n":$thrN%.1f,"triples_per_sec_4n":$thr4N%.1f,""" +
      f""""efficiency":$efficiency%.3f}"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec",""" +
      s""""queries":$qs,"scaling":$scaling,"sf":"$sfDir"}""")
  }
}
