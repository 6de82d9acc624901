package graft.kg

import graft.core.{PrefixMap, Schema}
import graft.graph.Components
import graft.ops.{MergeReconcile, TripleEmit}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

/** End-to-end KG construction over transcript tables (the north rule):
  * mention detection → exact + MinHash-blocked fuzzy linking → SSSOM
  * reconcile (window-max dedup) → connected-component canonicalization on
  * exactMatch edges → Iceberg-layout node/edge Parquet tables with
  * per-partition lineage rows, triple-count metrics, a snapshot manifest,
  * and a processed-partition ledger for checkpoint resume.
  *
  * "Iceberg-layout" because no Iceberg runtime jar exists offline (SURVEY
  * §7.0): we write `data/bucket=<k>/…parquet` plus JSON snapshot metadata
  * carrying the schema, partition list and per-partition counts — the table
  * contract the north rule exercises.
  *
  * Scale notes: the dictionary side of both joins is broadcast (no shuffle
  * on the mention side); hot head-entity keys are absorbed by map-side
  * partial aggregation + AQE skew-join in the reconcile; the CC loop
  * localCheckpoints per round; buckets are processed in
  * `resumeGroups` independent jobs so a restart skips completed groups via
  * the ledger.
  */
object KgPipeline {

  final case class Config(
      outDir: String,
      nConv: Long = 1000L,
      turnsPerConv: Int = 8,
      nConcepts: Long = 500L,
      buckets: Int = 16,
      resumeGroups: Int = 4,
      seed: Long = 42L,
      // candidate-link blocking family: "minhash" (LSH bands) or "tfidf"
      // (rarest-token blocks) — the north rule names both
      blocking: String = "minhash")

  final case class Result(
      triples: Long, nodes: Long, edges: Long, components: Long,
      groupsRun: Int, groupsSkipped: Int)

  def prefixes: PrefixMap = PrefixMap.builtIn.chain(PrefixMap(Vector(
    "kb" -> "https://example.org/kb/",
    "txt" -> "https://example.org/text/")))

  /** Mapping rows from transcripts (stages 1-3). */
  def extractMappings(spark: SparkSession, cfg: Config): DataFrame = {
    val transcripts = Synthetic.transcripts(spark, cfg.nConv, cfg.turnsPerConv,
      cfg.nConcepts, cfg.seed)
    // the dictionary feeds two join branches (exact broadcast + fuzzy band
    // broadcast) — materialize its tiny generation plan once instead of
    // re-running it per branch
    val dict = Synthetic.dictionary(spark, cfg.nConcepts, cfg.seed)
      .localCheckpoint(true)
    // mentions feed both link branches; recomputing the cheap explode in
    // each branch beats an extra materialization job (the expensive band
    // signatures live only in the fuzzy branch)
    val mentions = Linker.detectMentions(transcripts)
    val exact = Linker.linkExact(mentions, dict)
    val fuzzy = cfg.blocking match {
      case "minhash" => Linker.linkFuzzy(mentions, dict)
      case "tfidf"   => Linker.linkFuzzyTfidf(mentions, dict)
      case other => throw new IllegalArgumentException(
        s"unknown blocking family '$other' (minhash | tfidf)")
    }
    Linker.toSssomRows(exact.unionByName(fuzzy))
  }

  /** Reconciled, canonicalized edge set with component labels. */
  def buildGraph(mappings: DataFrame): DataFrame = {
    // materialize the extraction once: the reconcile plan references its
    // input from several join branches (Catalyst does not CSE across
    // joins), which would re-run the whole mention/link DAG per branch
    val m = mappings.localCheckpoint(true)
    val reconciled = MergeReconcile.filterRedundantRows(m)
    // cut the extract→link→reconcile lineage once: the CC loop and the
    // final label join would otherwise recompute the whole upstream DAG
    // several times over
    val triples = TripleEmit.emit(reconciled, prefixes, expand = false)
      .withColumnRenamed("subject", Schema.SubjectId)
      .withColumnRenamed("predicate", Schema.PredicateId)
      .withColumnRenamed("object", Schema.ObjectId)
      .localCheckpoint(true)
    // canonicalize on exactMatch edges only (north rule)
    val exactOnly = triples
      .filter(col(Schema.PredicateId) === Schema.SkosExactMatch)
    val labels = Components.componentLabels(exactOnly, assumeUndirected = true)
    triples
      .join(labels.withColumnRenamed("node", Schema.SubjectId)
        .withColumnRenamed("comp", "component"), Seq(Schema.SubjectId), "left")
      .withColumn("component", coalesce(col("component"), col(Schema.SubjectId)))
  }

  // ---------- Iceberg-layout materialization with resume ----------

  private def ledgerPath(outDir: String) = Paths.get(outDir, "_ledger.jsonl")

  private def groupOf(line: String): Option[Int] =
    "\"group\":(\\d+)".r.findFirstMatchIn(line).map(_.group(1).toInt)

  /** Completed groups + crash hygiene. A group counts as complete ONLY on
    * its `"status":"complete"` marker — the per-bucket lineage lines are
    * appended BEFORE the marker, so a kill mid-append must not make the
    * rerun skip a group whose lineage is half-written (matching any
    * `"group":N` line here was exactly that bug). Orphaned lines of
    * incomplete groups (metrics from a crashed attempt) are compacted
    * away atomically, so a rerun's fresh lineage is exactly-once rather
    * than appended after stale duplicates.
    */
  private def completedGroups(outDir: String): Set[Int] = {
    val p = ledgerPath(outDir)
    if (!Files.exists(p)) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      val lines = Files.readAllLines(p).asScala.toSeq
      val done = lines.filter(_.contains("\"status\":\"complete\""))
        .flatMap(groupOf).toSet
      val kept = lines.filter(l => groupOf(l).exists(done.contains))
      if (kept.size != lines.size) {
        val tmp = Paths.get(outDir, "_ledger.jsonl.tmp")
        Files.write(tmp, (kept.mkString("\n") +
          (if (kept.isEmpty) "" else "\n")).getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      }
      done
    }
  }

  private def appendLedger(outDir: String, line: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    Files.write(ledgerPath(outDir), (line + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Materialize node + edge tables partitioned by subject-hash bucket.
    * Buckets are grouped into `resumeGroups` jobs; each group is written
    * atomically (job success → ledger entry), so a relaunch only runs
    * missing groups.
    */
  def materialize(spark: SparkSession, edges: DataFrame, cfg: Config): Result = {
    val bucketed = edges
      .withColumn("bucket", pmod(xxhash64(col(Schema.SubjectId)),
        lit(cfg.buckets)).cast("int"))
      .withColumn("group", pmod(col("bucket"), lit(cfg.resumeGroups)))
      .localCheckpoint(true) // compute extraction once across group jobs

    val done = completedGroups(cfg.outDir)
    var run = 0; var skipped = 0
    (0 until cfg.resumeGroups).foreach { g =>
      if (done.contains(g)) skipped += 1
      else {
        val part = bucketed.filter(col("group") === g)
        part.drop("group")
          .repartition(col("bucket"))
          .write.mode(SaveMode.Overwrite)
          .partitionBy("bucket")
          .parquet(s"${cfg.outDir}/edges/group=$g")
        // nodes for this group: subjects in its buckets + their objects
        val nodes = part.select(col(Schema.SubjectId).as("node"),
            col("component"), col("bucket"))
          .union(part.select(col(Schema.ObjectId).as("node"),
            col("component"), col("bucket")))
          .groupBy("node", "bucket")
          .agg(min("component").as("component"), count(lit(1)).as("degree"))
        nodes.repartition(col("bucket"))
          .write.mode(SaveMode.Overwrite)
          .partitionBy("bucket")
          .parquet(s"${cfg.outDir}/nodes/group=$g")
        // per-partition lineage + metrics
        val metrics = part.groupBy("bucket")
          .agg(count(lit(1)).as("n_triples"),
            countDistinct(col("component")).as("n_components"))
          .collect()
          .map(r => s"""{"group":$g,"bucket":${r.getInt(0)},""" +
            s""""n_triples":${r.getLong(1)},"n_components":${r.getLong(2)},""" +
            s""""seed":${cfg.seed}}""")
        metrics.foreach(appendLedger(cfg.outDir, _))
        appendLedger(cfg.outDir,
          s"""{"group":$g,"status":"complete","n_buckets":${cfg.buckets / cfg.resumeGroups}}""")
        run += 1
      }
    }

    // snapshot manifest (atomic via temp + move). Two passes over the
    // checkpointed edge table, not three: triple + component counts fuse
    // into one aggregate; the node count needs its own explode-distinct
    // (subjects ∪ objects is a different row domain)
    val tc = bucketed.agg(count(lit(1)).as("t"),
      countDistinct(col("component")).as("c")).first()
    val (nTriples, nComponents) = (tc.getLong(0), tc.getLong(1))
    val nNodes = bucketed.select(explode(array(
        col(Schema.SubjectId), col(Schema.ObjectId))).as("n"))
      .distinct().count()
    val manifest =
      s"""{"format":"iceberg-layout-v1","schema":["subject_id","predicate_id","object_id","component","bucket"],
         |"partition_spec":"bucket(${cfg.buckets}, xxhash64(subject_id))",
         |"n_triples":$nTriples,"n_nodes":$nNodes,"n_components":$nComponents,
         |"groups":${cfg.resumeGroups},"seed":${cfg.seed}}""".stripMargin
    val tmp = Paths.get(cfg.outDir, "_manifest.json.tmp")
    Files.createDirectories(Paths.get(cfg.outDir))
    Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(cfg.outDir, "_manifest.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)

    Result(nTriples, nNodes, nTriples, nComponents, run, skipped)
  }

  /** Full pipeline. */
  def run(spark: SparkSession, cfg: Config): Result = {
    val mappings = extractMappings(spark, cfg)
    val graph = buildGraph(mappings)
    materialize(spark, graph, cfg)
  }
}
