package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver for end-to-end verification runs — edit freely, keep
  * `main` runnable.
  */
object Drive {
  private def session(threads: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val master =
      if (sys.env.contains("DRIVE_CLUSTER"))
        s"local-cluster[$threads,1,3072]"
      else s"local[$threads]"
    val s = SparkSession.builder().master(master)
      .config("spark.executor.memory", "2g")
      .config("spark.executor.extraClassPath",
        "/root/repo/target/scala-2.13/classes")
      .appName(s"drive-$threads")
      .config("spark.sql.shuffle.partitions",
        (threads * sys.env.getOrElse("DRIVE_PARTS_MULT", "1").toInt).toString)
      .config("spark.default.parallelism",
        (threads * sys.env.getOrElse("DRIVE_PARTS_MULT", "1").toInt).toString)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("DRIVE_AQE", "true"))
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("DRIVE_CODEGEN", "false"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    if (sys.env.contains("DRIVE_SMOKE")) { smoke(); return }
    if (sys.env.contains("DRIVE_STREAM")) { streamCheck(); return }
    if (sys.env.contains("DRIVE_DOCSTREAM")) { docStreamCheck(); return }
    if (sys.env.contains("DRIVE_IVF")) { ivfCheck(); return }
    if (sys.env.contains("DRIVE_NGRAM")) { ngramCheck(); return }
    if (sys.env.contains("DRIVE_EXPR")) { exprCheck(); return }
    if (sys.env.contains("DRIVE_SIMHASH")) { simhashCheck(); return }
    if (sys.env.contains("DRIVE_RECONCILE")) { reconcileCheck(); return }
    if (sys.env.contains("DRIVE_CORPUS")) { corpusCheck(); return }
    if (sys.env.contains("DRIVE_S8")) { session8Check(); return }
    if (sys.env.contains("DRIVE_PLANS")) { planCostCheck(); return }
    if (sys.env.contains("DRIVE_1T")) { oneThreadProbe(); return }
    if (sys.env.contains("DRIVE_SAMPLING")) { samplingCheck(); return }
    if (sys.env.contains("DRIVE_QTIME")) { qtimeCheck(); return }
    if (sys.env.contains("DRIVE_LPPROBE")) {
      val s = session(32)
      val dir = sys.env.getOrElse("DRIVE_SF", "/root/testdata/sf0.1")
      import org.apache.spark.sql.functions._
      val li0 = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
        .filter(col("l_partkey") % 5 === 0)
      val pairs = li0.groupBy("l_orderkey")
        .agg(collect_set(col("l_partkey")).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> " +
            "transform(slice(ps, i + 2, size(ps)), " +
            "y -> struct(x AS src, y AS dst))))")).as("p"))
        .select(col("p.src"), col("p.dst"))
      val canon = pairs.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
      for (pass <- 1 to 3) {
        var t0 = System.nanoTime()
        val probe = canon.take(2000001)
        println(f"[$pass] take: ${(System.nanoTime()-t0)/1e9}%.3f s, rows=${probe.length}")
        t0 = System.nanoTime()
        val out = graft.graph.Analytics.linkPredict(pairs, minCommon = 2L)
        println(f"[$pass] linkPredict build (incl fast path): ${(System.nanoTime()-t0)/1e9}%.3f s")
        t0 = System.nanoTime()
        println(s"[$pass] rows=${out.count()}")
        println(f"[$pass] count: ${(System.nanoTime()-t0)/1e9}%.3f s")
      }
      s.stop(); return
    }
    if (sys.env.contains("DRIVE_FINALPLAN")) {
      // executes via the dataset's own QueryExecution (collect), so the
      // printed plan is the AQE-final one incl. ReusedExchange/QueryStage
      val s = session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      val df = graft.SparkEntry.queries(sys.env("DRIVE_FINALPLAN"))(
        s, sys.env.getOrElse("DRIVE_SF", "/root/testdata/sf0.1"))
      val n = df.collect().length
      val plan = df.queryExecution.executedPlan.toString
      println(plan)
      println(s"rows=$n scans=${"(?m)^\\s*[+:]?-? *\\**\\(?\\d*\\)? *(?:Reused)?Exchange".r.findAllIn(plan).length}")
      s.stop(); return
    }
    if (sys.env.contains("DRIVE_EXPLAIN")) {
      val s = session(4)
      println(graft.SparkEntry.queries(sys.env("DRIVE_EXPLAIN"))(
        s, sys.env.getOrElse("DRIVE_SF", "/root/testdata/sf0.001"))
        .queryExecution.executedPlan.toString)
      s.stop(); return
    }
    if (sys.env.contains("DRIVE_REPPACK")) { repPackCheck(); return }
    if (sys.env.contains("DRIVE_NGRAM_CAND")) {
      import org.apache.spark.sql.functions._
      // candidate-volume probe for the PPJoin pipeline at a given SF:
      // docs, shingle rows, df>=2 shingle rows, prefix rows, raw join
      // rows, candidates after positional filter + dedup, verified pairs
      val s = session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
      val dir = sys.env.getOrElse("DRIVE_SF", "/root/testdata/sf0.1")
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val shSet = udf((t: String) => graft.text.TextHash.shingleHashSet(t, 3))
      val sh = docs.select(col("doc_id"), explode(shSet(col("text"))).as("sh"))
        .localCheckpoint(true)
      println(s"docs=${docs.count()} shingleRows=${sh.count()}")
      val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df")).localCheckpoint(true)
      println(s"distinctShingles=${dfreq.count()} df2=${dfreq.filter(col("df") >= 2).count()}")
      import org.apache.spark.sql.expressions.Window
      val byDoc = Window.partitionBy("doc_id")
      val order = byDoc.orderBy(col("df").asc, col("sh").asc)
      val threshold = 0.5
      val prefix = sh.join(dfreq, "sh")
        .withColumn("n", count(lit(1)).over(byDoc))
        .withColumn("rn", row_number().over(order))
        .filter(col("rn") <= col("n") - ceil(col("n") * threshold - 1e-9) + 1)
        .localCheckpoint(true)
      println(s"prefixRows=${prefix.count()} prefixDf2=${prefix.filter(col("df") >= 2).count()}")
      val p2 = prefix.filter(col("df") >= 2)
      val a = p2.select(col("sh"), col("doc_id").as("doc_a"), col("n").as("n_a"), col("rn").as("p_a"))
      val b = p2.select(col("sh"), col("doc_id").as("doc_b"), col("n").as("n_b"), col("rn").as("p_b"))
      val joined = a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
      println(s"rawJoinRows=${joined.count()}")
      val overlapBound = lit(1.0) + least(col("n_a") - col("p_a"), col("n_b") - col("p_b"))
      val requiredOverlap = (col("n_a") + col("n_b")) * (threshold / (1.0 + threshold)) - 1e-9
      val cand = joined
        .filter(col("n_b") >= col("n_a") * threshold - 1e-9 &&
          col("n_a") >= col("n_b") * threshold - 1e-9 && overlapBound >= requiredOverlap)
        .select("doc_a", "doc_b").dropDuplicates("doc_a", "doc_b")
      println(s"candidates=${cand.count()}")
      s.stop(); return
    }
    if (sys.env.contains("DRIVE_S5NEW")) { session5NewOps(); return }
    val scale = sys.env.getOrElse("SPARK_GRAFT_KG_CONV", "3000").toLong
    import graft.kg.KgPipeline
    import graft.ops.{MergeReconcile, TripleEmit}
    import graft.core.Schema
    import org.apache.spark.sql.functions._
    def profiled(spark: SparkSession): Unit = {
      val cfg = KgPipeline.Config(outDir = "", nConv = scale,
        turnsPerConv = 8, nConcepts = 2000L)
      var t0 = System.nanoTime()
      def lap(name: String): Unit = {
        println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        t0 = System.nanoTime()
      }
      val m = KgPipeline.extractMappings(spark, cfg).localCheckpoint(true)
      lap("extract+ckpt")
      val reconciled = MergeReconcile.filterRedundantRows(m)
      val triples = TripleEmit.emit(reconciled, KgPipeline.prefixes, expand = false)
        .withColumnRenamed("subject", Schema.SubjectId)
        .withColumnRenamed("predicate", Schema.PredicateId)
        .withColumnRenamed("object", Schema.ObjectId)
        .localCheckpoint(true)
      lap("reconcile+emit+ckpt")
      val exactOnly = triples.filter(col(Schema.PredicateId) === Schema.SkosExactMatch)
      val labels = graft.graph.Components.componentLabels(exactOnly, assumeUndirected = true)
      lap("cc")
      val n = triples
        .join(labels.withColumnRenamed("node", Schema.SubjectId)
          .withColumnRenamed("comp", "component"), Seq(Schema.SubjectId), "left")
        .withColumn("component", coalesce(col("component"), col(Schema.SubjectId)))
        .count()
      lap(s"join+count n=$n")
    }
    sys.env.getOrElse("DRIVE_LEVELS","4,4,1").split(",").toSeq.map(_.trim.toInt).zipWithIndex.foreach { case (th, i) =>
      val s = session(th)
      println(s"threads=$th warm=run0")
      // warm THIS session's executors (fresh JVMs in local-cluster mode)
      locally {
        val cfg = KgPipeline.Config(outDir = "", nConv = scale / 8,
          turnsPerConv = 8, nConcepts = 2000L)
        KgPipeline.buildGraph(KgPipeline.extractMappings(s, cfg)).count()
      }
      profiled(s)
      s.stop()
    }
  }

  /** Timing + plan-shape diagnosis for headline queries at sf0.1 (headline
    * config: local[32], AQE on; 4 timed runs after a warm run, plus
    * exchange/scan counts from the executed plan). Query names from
    * DRIVE_RECONCILE (comma-separated; "1" = q_reconcile_sssom).
    */
  def reconcileCheck(): Unit = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[32]")
      .appName("drive-reconcile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("DRIVE_SF", "/root/testdata/sf0.1")
    val names = sys.env("DRIVE_RECONCILE") match {
      case "1" => Seq("q_reconcile_sssom")
      case csv => csv.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    }
    names.foreach { name =>
      def q = graft.SparkEntry.queries(name)(s, dir)
      val warm = q.count()
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); val n = q.count()
        assert(n == warm); (System.nanoTime() - t0) / 1e9
      }
      val plan = q.queryExecution.executedPlan.toString
      def cnt(p: String, needle: String) = needle.r.findAllIn(p).length
      println(f"$name%s rows=$warm min=${times.min}%.2f " +
        s"all=[${times.map(t => f"$t%.2f").mkString(",")}] " +
        s"exchanges=${cnt(plan, "Exchange")} scans=${cnt(plan, "Scan parquet")} " +
        s"aggs=${cnt(plan, "HashAggregate")} joins=${cnt(plan, "Join")} " +
        s"rdds=${cnt(plan, "Scan ExistingRDD")}")
    }
    s.stop()
  }

  /** Timing + row-parity check for the rewritten simhash banding:
    * A/B sort-merge vs shuffled-hash join for the banding self-join.
    */
  def simhashCheck(): Unit = {
    for (preferSmj <- Seq("true", "false")) {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val s = SparkSession.builder().master("local[32]")
        .appName(s"drive-sim-$preferSmj")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.join.preferSortMergeJoin", preferSmj)
        .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
      def time(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime(); val n = f
        (n, (System.nanoTime() - t0) / 1e9)
      }
      println(s"scan partitions=${docs.rdd.getNumPartitions} " +
        s"join out partitions=${graft.dedup.Dedup.simhashNearDups(docs, 8).rdd.getNumPartitions}")
      val pairs = (1 to 4).map(_ =>
        time(graft.dedup.Dedup.simhashNearDups(docs, maxHamming = 8).count()))
      assert(pairs.head._1 == 88051L)
      println(f"sf0.1 preferSMJ=$preferSmj nearDups min=${pairs.map(_._2).min}%.2f " +
        s"all=[${pairs.map(t => f"${t._2}%.2f").mkString(",")}]")
      s.stop()
    }
  }

  /** End-to-end drive of the streaming sessionizers: synthetic transcript
    * file drops → flatMapGroupsWithState ordinals + session_window stats
    * → memory sink; prints both result sets.
    */
  def streamCheck(): Unit = {
    import graft.streaming.TranscriptStream
    import org.apache.spark.sql.streaming.Trigger
    val s = session(4)
    val base = java.nio.file.Files.createTempDirectory("drivestream").toString
    val in = s"$base/in"
    graft.kg.Synthetic.transcripts(s, 40, 6, 30)
      .write.mode("append").parquet(in)
    val stateful = TranscriptStream.sessionizeStateful(
      TranscriptStream.readTranscriptStream(s, in), gapMs = 1800000L,
      watermark = "10 minutes")
    val q1 = stateful.writeStream.format("memory").queryName("ds_stateful")
      .outputMode("append").option("checkpointLocation", s"$base/cp1")
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000)
    val w = TranscriptStream.sessionStats(
      TranscriptStream.readTranscriptStream(s, in), watermark = "10 minutes")
    val q2 = w.writeStream.format("memory").queryName("ds_window")
      .outputMode("append").option("checkpointLocation", s"$base/cp2")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val a = s.sql("SELECT conv_id, session_id, n_turns FROM ds_stateful")
    val b = s.sql("SELECT conv_id, n_turns FROM ds_window")
    println(s"stateful sessions=${a.count()} window sessions=${b.count()}")
    a.show(10, truncate = false)
    b.show(10, truncate = false)
    s.stop()
  }

  /** End-to-end drive of the streaming document-curation tier: three
    * file drops at maxFilesPerTrigger=1 → gopher + repetition gates +
    * PII scrub → memory sink; prints per-batch progress and the
    * batch-parity check on the same rows.
    */
  def docStreamCheck(): Unit = {
    import graft.streaming.DocStream
    import graft.text.TextOps
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val s = session(4)
    val base = java.nio.file.Files.createTempDirectory("drivedoc").toString
    val in = s"$base/in"
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    (0 until 3).foreach(i => docs.filter(col("doc_id") % 3 === i)
      .coalesce(1).write.mode("append").parquet(in))
    val q = DocStream.curate(DocStream.readDocumentStream(s, in),
        minWords = 10L, minStopHits = 0)
      .writeStream.format("memory").queryName("drv_curate")
      .outputMode("append").option("checkpointLocation", s"$base/cp")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    println(s"micro-batches=${q.recentProgress.count(_.numInputRows > 0)}")
    val streamed = s.sql("SELECT * FROM drv_curate")
    streamed.show(3, truncate = 60)
    val batch = docs.filter(TextOps.gopherKeepCol(col("text"),
        minWords = 10L, minStopHits = 0) &&
      TextOps.repetitionKeepCol(col("text")))
      .select(col("doc_id") +: col("source") +:
        TextOps.redactPii(col("text")): _*)
    println(s"in=${docs.count()} streamed=${streamed.count()} " +
      s"batch=${batch.count()} parity=${
        streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty}")
    // streaming near-dup pairs over the same drops (bounded drain mode)
    val nd = DocStream.nearDupPairStream(
        DocStream.readDocumentStream(s, in).select("doc_id", "text"),
        threshold = 0.5, stateTtlMs = 0L)
      .writeStream.format("memory").queryName("drv_neardup")
      .outputMode("append").option("checkpointLocation", s"$base/cpnd")
      .trigger(Trigger.AvailableNow()).start()
    nd.awaitTermination(120000)
    val pairs = s.sql("SELECT * FROM drv_neardup")
    println(s"near-dup pairs streamed=${pairs.count()}")
    pairs.orderBy(col("est_jaccard").desc).show(5, truncate = false)
    s.stop()
  }

  /** IVF refinement drive: recall at nprobe=1 on the testdata embeddings
    * with and without Lloyd iterations, plus per-iteration timing.
    */
  def ivfCheck(): Unit = {
    import graft.sim.Similarity
    import org.apache.spark.sql.functions.col
    val s = session(8)
    val dir = sys.env.getOrElse("DRIVE_SF", "/root/testdata/sf0.01")
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(0, 2).foreach { iters =>
      val t0 = System.nanoTime()
      val ann = Similarity.ivfTopK(emb, queries, k = 10, nprobe = 8,
        refineIters = iters)
        .select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (ann & brute).size.toDouble / brute.size
      println(f"refineIters=$iters recall=$recall%.3f " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    s.stop()
  }

  /** A/B microbench: ScalaUDF cosine kernel vs the native codegen'd
    * CosineSimilarity expression on 2M dim-64 pairs.
    */
  def exprCheck(): Unit = {
    import graft.text.TextHash
    import org.apache.spark.sql.functions._
    val s = session(8)
    import s.implicits._
    val n = 2000000L
    val gen = udf((i: Long) => Array.tabulate(64)(d =>
      ((TextHash.mix(i, d.toLong) % 2001) - 1000) / 1000.0f))
    val df = s.range(n)
      .select(col("id"), gen(col("id")).as("a"), gen(col("id") + 7).as("b"))
      .localCheckpoint(true)
    val udfCos = udf((x: Seq[Float], y: Seq[Float]) => TextHash.cosine(x, y))
    def time(name: String, c: org.apache.spark.sql.Column): Double = {
      val r = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.select(sum(c)).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"  $name min=${r.min}%.2f all=[${r.map(t => f"$t%.2f").mkString(",")}]")
      r.min
    }
    val u = time("scala-udf ", udfCos(col("a"), col("b")))
    val e = time("native    ", graft.sim.Similarity.cosine(col("a"), col("b")))
    println(f"  speedup=${u / e}%.2fx")
    s.stop()
    // extensions path end-to-end: a session BUILT with GraftExtensions
    // (the spark.sql.extensions route) must resolve graft_* in SQL
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[2]")
      .appName("drive-ext")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.ui.enabled", "false").getOrCreate()
    s2.sparkContext.setLogLevel("ERROR")
    val viaExt = s2.sql(
      "SELECT graft_cosine(array(1.0, 0.0), array(1.0, 0.0)), " +
      "graft_l2_norm(array(3.0, 4.0))").collect().head
    println(s"  extensions-injected: cosine=${viaExt.getDouble(0)} " +
      s"l2=${viaExt.getDouble(1)}")
    s2.stop()
  }

  /** Stage-cost diagnosis of the n-gram Jaccard join at sf0.1. */
  def ngramCheck(): Unit = {
    import graft.text.TextHash
    import org.apache.spark.sql.functions._
    val s = session(32)
    val dir = sys.env.getOrElse("DRIVE_SF", "/root/testdata/sf0.1")
    val docs = graft.core.SparkUtil.spread(
      s.read.parquet(s"$dir/documents.parquet"))
    var t0 = System.nanoTime()
    def lap(name: String): Unit = {
      println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    println(s"  docs=${docs.count()}")
    lap("docs count")
    val shSet = udf((t: String) => TextHash.shingleHashSet(t, 3))
    val shPlain = docs.select(col("doc_id"), explode(shSet(col("text"))).as("sh"))
    println(s"  sh rows=${shPlain.count()}")
    lap("shingle explode count (no ckpt)")
    println(s"  sh rows again=${shPlain.count()}")
    lap("shingle explode count (warm)")
    val sh = shPlain.localCheckpoint(true)
    lap("eager localCheckpoint")
    println(s"  distinct=${sh.select("sh").distinct().count()}")
    lap("distinct count from ckpt")
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id")
    val ord = byDoc.orderBy(col("df").asc, col("sh").asc)
    val prefix = sh.join(dfreq, "sh")
      .withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("rn", row_number().over(ord))
      .filter(col("rn") <= col("n") - ceil(col("n") * 0.5 - 1e-9) + 1)
      .select(col("sh"), col("doc_id"), col("n"), col("rn"))
      .localCheckpoint(true)
    println(s"  prefix rows=${prefix.count()}")
    lap("df+window+prefix")
    val a = prefix.select(col("sh"), col("doc_id").as("doc_a"), col("n").as("n_a"))
    val b = prefix.select(col("sh"), col("doc_id").as("doc_b"), col("n").as("n_b"))
    val raw = a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b") &&
      col("n_b") >= col("n_a") * 0.5 - 1e-9 &&
      col("n_a") >= col("n_b") * 0.5 - 1e-9)
    println(s"  raw candidate rows=${raw.count()}")
    lap("prefix self-join")
    // with the PPJoin positional bound (mirrors the library filter)
    val ap = prefix.select(col("sh"), col("doc_id").as("doc_a"),
      col("n").as("n_a"), col("rn").as("p_a"))
    val bp = prefix.select(col("sh"), col("doc_id").as("doc_b"),
      col("n").as("n_b"), col("rn").as("p_b"))
    val pos = ap.join(bp, Seq("sh")).filter(col("doc_a") < col("doc_b") &&
      col("n_b") >= col("n_a") * 0.5 - 1e-9 &&
      col("n_a") >= col("n_b") * 0.5 - 1e-9 &&
      lit(1.0) + least(col("n_a") - col("p_a"), col("n_b") - col("p_b")) >=
        (col("n_a") + col("n_b")) * (0.5 / 1.5) - 1e-9)
    println(s"  positional-filtered rows=${pos.count()} " +
      s"distinct=${pos.select("doc_a", "doc_b").distinct().count()}")
    lap("positional filter")
    val cand = raw.select("doc_a", "doc_b").dropDuplicates("doc_a", "doc_b")
    println(s"  distinct candidates=${cand.count()}")
    lap("pair dedup")
    val full = graft.dedup.Dedup.ngramJaccardNearDups(docs, 3, 0.5)
    println(s"  final pairs=${full.count()}")
    lap("full operator end-to-end")
    s.stop()
  }

  /** Drive of the corpus-stats + decontamination operators at sf0.1:
    * timings, result shapes, and the broadcast/TakeOrdered plan evidence.
    */
  def corpusCheck(): Unit = {
    import org.apache.spark.sql.functions._
    val s = session(32)
    val dir = sys.env.getOrElse("DRIVE_SF", "/root/testdata/sf0.1")
    val docs = graft.core.SparkUtil.spread(
      s.read.parquet(s"$dir/documents.parquet"))
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val decon = graft.dedup.Dedup.decontaminate(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0), k = 3)
    time("decontaminate count")(println(s"  contaminated=${decon.count()}"))
    decon.orderBy(col("contamination").desc).show(5, truncate = false)
    println("  broadcast in plan: " +
      decon.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val top = graft.text.CorpusStats.topNgrams(docs, k = 3, topN = 10)
    time("topNgrams")(top.show(10, truncate = false))
    println("  TakeOrdered in plan: " +
      top.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val tfidf = graft.text.CorpusStats.tfidfTopTerms(docs, topPerDoc = 3)
    time("tfidf count")(println(s"  rows=${tfidf.count()}"))
    tfidf.filter(col("doc_id") === 1).show(5, truncate = false)
    s.stop()
  }

  /** Single-thread window probe — the pre-flight check for scaling-bench
    * launches. The 32-thread barometer (DRIVE_RECONCILE) misses the 1t
    * failure mode: sustained co-tenant load depresses single-core BOOST
    * clocks while 4-thread base clocks stay at their floor, so whole
    * bench runs land `converged_1t: false` with a quiet barometer. This
    * probe runs the scaling workload itself at 1 thread at 1/8 scale
    * (~20 s quiet) plus a 1-thread spin, printing both; launch the bench
    * only when the probe sits at its observed floor.
    */
  def oneThreadProbe(): Unit = {
    val t0s = System.nanoTime()
    var h = 0L; var i = 0L
    while (System.nanoTime() - t0s < 1000000000L) {
      h = graft.text.TextHash.mix(h, i); i += 1
    }
    println(f"  spin_1t: ${i / 1000.0 / 1000.0}%.1f Mmix/s (h=${h != 0})")
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[1]")
      .appName("probe-1t")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.default.parallelism", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.wholeStage", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.kg.KgPipeline
    val scale = sys.env.getOrElse("SPARK_GRAFT_KG_CONV", "28000").toLong / 8
    val cfg = KgPipeline.Config(outDir = "", nConv = scale,
      turnsPerConv = 8, nConcepts = 2000L)
    KgPipeline.buildGraph(KgPipeline.extractMappings(s, cfg)).count() // warm
    val t0 = System.nanoTime()
    val n = KgPipeline.buildGraph(KgPipeline.extractMappings(s, cfg)).count()
    println(f"  kg_1t @$scale conv: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      s"(triples=$n)")
    s.stop()
  }

  /** Executed-plan cost diagnostics for the most expensive headline
    * queries at sf0.1: wall time plus parquet re-scan and exchange
    * counts (the no-CSE blowup detector — 18 re-scans once hid inside a
    * 3-branch reconcile).
    */
  def planCostCheck(): Unit = {
    val s = session(32)
    val dir = sys.env.getOrElse("DRIVE_SF", "/root/testdata/sf0.1")
    val names = sys.env.get("DRIVE_PLANS").filter(_ != "1")
      .map(_.split(",").toSeq)
      .getOrElse(Seq("q_doc_curation", "q_doc_neardup_dedup",
        "q_doc_ngram_jaccard", "q_doc_decontaminate_fuzzy",
        "q_doc_split_leakfree", "q_doc_pack_seqs"))
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(s, dir).count() // warm pass (JIT + codegen)
      // time construction + execution together: eager localCheckpoints
      // inside operators run at construction, exactly as the bench times
      val t0 = System.nanoTime()
      val df = fn(s, dir)
      val cnt = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllIn(plan).length
      val exch = "Exchange".r.findAllIn(plan).length
      println(f"  $n%-28s $sec%6.2f s rows=$cnt%-8d scans=$scans exchanges=$exch (post-ckpt plan)")
    }
    s.stop()
  }

  /** Session-8 drive at sf0.1: IVF-PQ ANN end-to-end (recall vs brute
    * force, compression plan evidence), span removal (volume + invariant),
    * and the training-order permutation (balance + determinism).
    */
  def session8Check(): Unit = {
    import org.apache.spark.sql.functions._
    val s = session(32)
    val dir = sys.env.getOrElse("DRIVE_SF", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val brute = graft.sim.Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = time("pqTopK")(graft.sim.Pq.pqTopK(emb, queries, k = 10,
      nprobe = sys.env.getOrElse("DRIVE_NPROBE", "8").toInt,
      refine = sys.env.getOrElse("DRIVE_REFINE", "4").toInt,
      refineIters = 2))
    val got = pq.select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"  pq rows=${got.size} recall=${
      (got & brute).size.toDouble / brute.size}")
    pq.show(5, truncate = false)
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val cleaned = time("removeDuplicateSpans")(
      graft.dedup.Dedup.removeDuplicateSpans(docs, k = 10, minDocs = 2))
    val agg = cleaned.agg(sum("removed_tokens"), sum("n_tokens"),
      count(lit(1))).collect()(0)
    println(s"  removed=${agg.getLong(0)} of ${agg.getLong(1)} tokens " +
      s"across ${agg.getLong(2)} docs")
    cleaned.filter(col("removed_tokens") > 0)
      .select("doc_id", "n_tokens", "removed_tokens").show(3)
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val fresh = docs.filter(col("doc_id") % 5 === 0)
    val inc = time("minhashNearDupsIncremental")(
      graft.dedup.Dedup.minhashNearDupsIncremental(
        graft.dedup.Dedup.minhashIndex(old), old, fresh, threshold = 0.5))
    println(s"  incremental pairs=${inc.count()}")
    val order = time("trainOrder")(
      graft.ops.Sampling.trainOrder(docs, nShards = 8))
    order.groupBy("shard").agg(count(lit(1)).as("n"), max("pos").as("maxp"))
      .orderBy("shard").show()
    s.stop()
  }

  /** Drive of the sampling/split + Bloom-decontamination operators at
    * sf0.1: split counts, sample determinism across sessions, exact-vs-
    * bloom agreement, timings, and the no-shuffle/no-join plan evidence.
    */
  def samplingCheck(): Unit = {
    import org.apache.spark.sql.functions._
    val dir = sys.env.getOrElse("DRIVE_SF", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val firstKept = {
      val s = session(32)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val split = graft.ops.Sampling.assignSplit(docs)
      time("assignSplit counts") {
        split.groupBy("split").count().orderBy("split").show()
      }
      println("  exchanges in split plan: " +
        "Exchange".r.findAllIn(split.queryExecution.executedPlan.toString).length)
      val kept = time("hashSample 10%")(
        graft.ops.Sampling.hashSample(docs, 0.1)
          .select("doc_id").collect().map(_.getLong(0)).toSet)
      println(s"  kept=${kept.size} of ${docs.count()}")
      val exact = graft.dedup.Dedup.decontaminate(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0), k = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val bloomDf = graft.dedup.Dedup.decontaminateBloom(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0), k = 3, fpp = 1e-4)
      val bloom = time("decontaminateBloom")(
        bloomDf.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap)
      val missed = exact.count { case (id, n) => bloom.getOrElse(id, 0L) < n }
      println(s"  exact flagged=${exact.size} bloom flagged=${bloom.size} " +
        s"false-negatives=$missed (must be 0)")
      println("  joins in bloom plan: " + "Join".r.findAllIn(
        bloomDf.queryExecution.executedPlan.toString).length)
      s.stop()
      kept
    }
    // determinism across a fresh session and a different parallelism
    val s2 = session(8)
    val again = graft.ops.Sampling.hashSample(
      s2.read.parquet(s"$dir/documents.parquet"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    println(s"  cross-session sample identical: ${again == firstKept}")
    s2.stop()
  }

  /** Drive of the repetition-filter + sequence-packing operators at
    * sf0.1: timings, keep-rate, packing invariants (full sequences,
    * conservation of tokens), and shuffle/scan counts from the plans.
    */
  def repPackCheck(): Unit = {
    import org.apache.spark.sql.functions._
    val s = session(32)
    val dir = sys.env.getOrElse("DRIVE_SF", "/root/testdata/sf0.1")
    val docs = graft.core.SparkUtil.spread(
      s.read.parquet(s"$dir/documents.parquet"))
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val rep = graft.text.TextOps.repetitionMetrics(docs)
    time("repetitionMetrics warm")(rep.count())
    time("repetitionMetrics")(rep.count())
    rep.agg(count(lit(1)).as("docs"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("kept"),
      avg("dup10_frac").as("avg_dup10"),
      avg("top2_frac").as("avg_top2")).show(truncate = false)
    println("  exchanges in repetition plan: " + "Exchange".r.findAllIn(
      rep.queryExecution.executedPlan.toString).length)
    val pack = graft.text.Packing.concatChunk(docs, seqLen = 2048L)
    time("concatChunk warm")(pack.count())
    val n = time("concatChunk")(pack.count())
    val seqs = pack.groupBy("seq_id").agg(sum("len").as("filled"))
    val nSeq = seqs.count()
    val full = seqs.filter(col("filled") === 2048L).count()
    val toks = pack.agg(sum("len")).collect()(0).getLong(0)
    println(s"  placements=$n sequences=$nSeq full=$full (all but last) " +
      s"tokens=$toks")
    println("  exchanges in pack plan: " + "Exchange".r.findAllIn(
      pack.queryExecution.executedPlan.toString).length)
    s.stop()
  }

  /** End-to-end smoke over the public API surfaces changed this round. */
  def smoke(): Unit = {
    val s = session(4)
    def fixture(n: String) = getClass.getResource(s"/sssom/$n").getPath
    val json = graft.io.SssomJson.readJson(s,
      "/root/repo/src/test/resources/sssom/basic.json")
    println(s"readJson rows=${json.df.count()} orphanet=${json.prefixes.contains("Orphanet")}")
    val obo = graft.io.SssomJson.readObographs(s,
      "/root/repo/src/test/resources/sssom/obographs-mixed.json",
      graft.core.PrefixMap.builtIn.chain(graft.core.PrefixMap(Vector(
        "HP" -> "http://example/obo/HP_", "UMLS" -> "http://example/umls/",
        "SCT" -> "http://example/sct/"))))
    println(s"obographs rows=${obo.df.count()}")
    val inv = graft.ops.Invert.invertMappings(obo.df, mergeInverted = false)
    println(s"inverted rows=${inv.count()}")
    val tsv = graft.io.SssomTsv.read(s,
      "/root/repo/src/test/resources/sssom/basic.tsv")
    val owlPath = java.nio.file.Files.createTempDirectory("drv").toString + "/basic.owl"
    graft.io.SssomOwl.write(tsv, owlPath)
    val owlText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(owlPath)))
    println(s"owl write: ${owlText.linesIterator.count(_.contains("a owl:Axiom"))} axioms, " +
      s"${owlText.linesIterator.count(_.contains("a owl:Class"))} class typings, " +
      s"ontology=${owlText.contains("a owl:Ontology")}")
    val scan = graft.io.SparqlScan.queryMappings(s,
      graft.io.SparqlScan.EndpointConfig(url = "http://e/sparql",
        prefixes = graft.core.PrefixMap.builtIn.chain(
          graft.core.PrefixMap(Vector("g" -> "http://g/")))),
      executor = Some(_ => Seq(Map(
        "subject_id" -> "http://www.w3.org/2004/02/skos/core#X",
        "subject_label" -> "x",
        "predicate_id" -> "http://www.w3.org/2004/02/skos/core#exactMatch",
        "object_id" -> "http://www.w3.org/2004/02/skos/core#Y",
        "mapping_provider" -> "http://g/m"))))
    println(s"sparql scan rows=${scan.df.count()} " +
      s"first=${scan.df.collect()(0).getString(0)}")
    val entry = graft.SparkEntry.entry(s).count()
    println(s"entry rows=$entry")
    s.stop()
  }

  /** Time a comma-separated DRIVE_QTIME query list at DRIVE_SF (bench
    * shape: warm pass at sf0.001, then two timed passes, per-query min).
    */
  def qtimeCheck(): Unit = {
    val names = sys.env("DRIVE_QTIME").split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("DRIVE_SF", "/root/testdata/sf0.1")
    val s = session(32)
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(s, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => println(s"$n warm FAILED: ${e.getMessage}") }
    }
    def pass(): Seq[(String, Double)] = names.toSeq.map { n =>
      val t0 = System.nanoTime()
      val rows = try graft.SparkEntry.queries(n)(s, sfDir).count()
        catch { case e: Throwable =>
          println(s"$n FAILED: ${e.getMessage}"); -1L }
      n -> (System.nanoTime() - t0) / 1e9
    }
    val p1 = pass(); val p2 = pass()
    p1.zip(p2).foreach { case ((n, a), (_, b)) =>
      println(f"$n%-28s ${math.min(a, b)}%.2f s  (p1=$a%.2f p2=$b%.2f)")
    }
    s.stop()
  }

  /** Session-5 additions driven end-to-end through the public API:
    * link prediction, label propagation, SemDeDup pairs + composed
    * decision, BPE encode. DRIVE_SF picks the testdata scale.
    */
  private def session5NewOps(): Unit = {
    val s = session(8)
    val dir = sys.env.getOrElse("DRIVE_SF", "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions._
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_partkey") % 5 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val co = li.as("x").join(li.as("y"),
      col("x.l_orderkey") === col("y.l_orderkey") &&
        col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
    val lp = graft.graph.Analytics.linkPredict(co, minCommon = 2L)
    println(s"linkPredict rows=${lp.count()}")
    lp.orderBy(col("jaccard_pm").desc, col("a"), col("b")).show(5, false)
    val capped = graft.graph.Analytics.linkPredict(co, minCommon = 2L,
      maxPivotDeg = 20)
    println(s"linkPredict capped(20) rows=${capped.count()}")
    val sup = s.read.parquet(s"$dir/supplier.parquet").select(
      concat(lit("s"), col("s_suppkey")).as("src"),
      concat(lit("n"), col("s_nationkey")).as("dst"))
    val nat = s.read.parquet(s"$dir/nation.parquet").select(
      concat(lit("n"), col("n_nationkey")).as("src"),
      concat(lit("r"), col("n_regionkey")).as("dst"))
    val lpa = graft.graph.Analytics.labelPropagation(
      sup.unionByName(nat), rounds = 4)
    println(s"labelPropagation rows=${lpa.count()} " +
      s"communities=${lpa.select("label").distinct().count()}")
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val sem = graft.sim.Similarity.semDedupPairs(emb, threshold = 0.4)
    println(s"semDedupPairs rows=${sem.count()}")
    sem.orderBy(col("cos").desc).show(3, false)
    val dec = graft.dedup.Dedup.nearDupDedup(
      emb.select(col("vec_id").as("doc_id")),
      sem.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
    println(s"semDedup decision keep=${dec.filter(col("keep")).count()}" +
      s"/${dec.count()}")
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val merges = graft.text.BpeTrain.train(docs, nMerges = 10)
    val seg = graft.text.BpeTrain.segment(docs, merges)
    seg.agg(sum("n_words"), sum("n_bpe_tokens")).show(false)
    s.stop()
  }
}
