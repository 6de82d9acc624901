package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting for
  * training-data pipelines: every decision is a pure function of the row's
  * id and a salt string, so the assignment is (a) reproducible across runs,
  * engines, and cluster sizes, (b) stable under corpus growth — adding new
  * documents never moves an existing document's split, the property that
  * keeps eval sets uncontaminated across crawl refreshes — and (c) a
  * narrow map with NO shuffle and NO random-number state: at 100 TB it
  * costs one codegen'd projection fused into the scan.
  *
  * The hash is the first 8 hex digits of md5 (a 32-bit uniform value),
  * chosen over xxhash64 because md5 is bit-identical in every engine the
  * oracle runs (DuckDB recipe: `('0x' || substr(md5(x),1,8))::UBIGINT`),
  * so split assignment itself is DuckDB-oracle-checkable exactly. The
  * modulo-100 bucket is biased by 2^32 mod 100 = 96 parts in 4 billion
  * (~2e-8 relative) — irrelevant against percent-granularity splits.
  */
object Sampling {

  /** 32-bit uniform hash of (id, salt) as a non-negative long column. */
  def bucketHash(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8),
      16, 10).cast("long")

  /** Percent bucket 0..99 — the unit of split assignment. */
  def bucket(id: Column, salt: String): Column = bucketHash(id, salt) % 100

  /** Assign every row to train/val/test by hashed percent bucket:
    * [0, trainPct) → train, [trainPct, trainPct+valPct) → val, rest →
    * test. Output (idCol, bucket, split) — disjoint and exhaustive by
    * construction. Changing `salt` re-deals the whole assignment;
    * keeping it fixed pins every id's split forever.
    */
  def assignSplit(df: DataFrame, idCol: String = "doc_id",
      trainPct: Int = 80, valPct: Int = 10,
      salt: String = "v1"): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = bucket(col(idCol), salt)
    df.select(col(idCol), b.as("bucket"),
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Leakage-safe split: near-duplicate documents must never straddle a
    * train/eval boundary — a paraphrase of a test document inside the
    * training set is contamination that document-level splitting cannot
    * see. Given pairwise near-dup output (`doc_a`, `doc_b` — from any of
    * the minhash/simhash/n-gram/embedding detectors), documents are
    * grouped into duplicate clusters with distributed connected
    * components, and the WHOLE cluster is assigned by the hash of its
    * canonical (minimum) member id. Unpaired documents hash by their own
    * id, so their assignment is identical to `assignSplit` — adding a
    * near-dup detector to a pipeline only ever MOVES documents that were
    * provably entangled.
    *
    * Output (idCol, split_key, bucket, split): `split_key` is the cluster
    * canonical id (= own id for singletons) — exposed because audits want
    * to group by it. Scale shape: CC runs over the PAIR graph only
    * (near-dup output is a small fraction of the corpus), and the final
    * join of corpus to cluster labels is a dictionary-sized broadcast in
    * practice; the split itself stays a pure projection.
    */
  def leakageSafeSplit(df: DataFrame, dupPairs: DataFrame,
      idCol: String = "doc_id", trainPct: Int = 80, valPct: Int = 10,
      salt: String = "v1"): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val comps = graft.graph.Components.connectedComponents(
      dupPairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .withColumnRenamed("node", idCol)
    val keyed = df.join(comps, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("comp"), col(idCol)))
    val b = bucket(col("split_key"), salt)
    keyed.select(col(idCol), col("split_key"), b.as("bucket"),
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Source-mix sampling — the "data mixing" step that turns per-source
    * weights (wiki × 3 epochs worth, common-crawl × 0.3, …, capped at 1.0
    * here: up-sampling is repetition, a writer concern) into a
    * deterministic kept-set. Each stratum keeps the rows whose (id, salt)
    * hash falls under its own fraction, so (a) kept sets are NESTED as a
    * stratum's fraction grows — raising web from 0.3 to 0.4 only ADDS
    * documents, it never swaps them — and (b) strata are independent:
    * retuning one source's weight leaves every other source's kept-set
    * untouched. Still a pure shuffle-free projection (the fraction→cut
    * CASE chain is codegen'd; for thousands of strata broadcast-join a
    * fraction dimension instead).
    */
  def stratifiedSample(df: DataFrame, fractions: Map[String, Double],
      strataCol: String = "source", idCol: String = "doc_id",
      defaultFraction: Double = 0.0, salt: String = "v1"): DataFrame = {
    (fractions.values ++ Seq(defaultFraction)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction must be in [0,1], got $f"))
    def cutOf(f: Double) = lit((f * 4294967296.0).toLong)
    // sorted for a deterministic expression tree (Map order is not)
    val cut = fractions.toSeq.sortBy(_._1)
      .foldLeft(cutOf(defaultFraction): Column) { case (acc, (k, f)) =>
        when(col(strataCol) === k, cutOf(f)).otherwise(acc)
      }
    df.filter(bucketHash(col(idCol), salt) < cut)
  }

  /** Importance sampling: keep each row with probability `weight` (a
    * per-row column in [0, 1], clamped), decided by the same (id, salt)
    * hash as `hashSample` — so the decision is deterministic,
    * shuffle-free, and MONOTONE in the weight: a document kept at weight
    * w stays kept at any w' ≥ w (re-tuning a weighting function only
    * adds/removes the rows whose weight actually crossed their hash
    * point, it never re-deals the sample). This is the resampling step
    * that turns a quality/score column into a weighted corpus
    * (quality-weighted subsampling; length-proportional weights
    * approximate uniform-over-tokens sampling).
    *
    * Engine-portable exactly: the hash is a 32-bit integer (exact as a
    * double) and `weight × 2^32` is one IEEE multiply of
    * identically-derived doubles, so the kept set is bit-reproducible in
    * any engine that computes the same weight expression.
    */
  def importanceSample(df: DataFrame, weight: Column,
      idCol: String = "doc_id", salt: String = "v1"): DataFrame = {
    val w = least(greatest(weight, lit(0.0)), lit(1.0))
    df.filter(
      bucketHash(col(idCol), salt).cast("double") < w * 4294967296.0)
  }

  /** Per-source document cap — the "at most N pages per domain" rule of
    * web-corpus curation (a handful of boilerplate-heavy domains
    * otherwise dominate the token budget). Keeps the `cap` rows of each
    * source whose (id, salt) hash sorts lowest (doc_id tie-break), so the
    * selection is (a) uniform within the source rather than biased toward
    * low ids, (b) deterministic and engine-portable like every sampler
    * here, and (c) NESTED in the cap: raising N only adds documents.
    *
    * Scale shape — the naive form is one window over EVERY row, which
    * shuffles the full corpus by source and sorts inside the giant
    * domains (exactly the skewed keys). Instead, a two-phase plan: a
    * partial-agg count finds the sources over cap (a tiny set in web
    * corpora); under-cap sources pass through with NO shuffle at all via
    * a left-anti join on that dictionary; only the over-cap slice — the
    * skewed tail, a corpus fraction — shuffles into the row_number
    * window. Output: input columns, over-cap rows filtered to the cap.
    */
  def capPerSource(df: DataFrame, cap: Int, sourceCol: String = "source",
      idCol: String = "doc_id", salt: String = "v1"): DataFrame = {
    require(cap >= 1, s"need cap >= 1, got $cap")
    import org.apache.spark.sql.expressions.Window
    // referenced from both join branches → materialize the tiny
    // dictionary once (Catalyst has no cross-branch CSE)
    val overCap = graft.core.SparkUtil.materializeOnce(
      df.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > cap).select(sourceCol))
    val pass = df.join(overCap, Seq(sourceCol), "left_anti")
    val capped = df.join(overCap, Seq(sourceCol), "left_semi")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(sourceCol)
          .orderBy(bucketHash(col(idCol), salt).asc, col(idCol).asc)))
      .filter(col("__rn") <= cap).drop("__rn")
    pass.unionByName(capped).select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Deterministic global training order — the "shuffle the corpus before
    * training" step, made reproducible and cluster-shaped: every row gets
    * a shard (its output file) and a position within the shard, both pure
    * functions of (id, salt). Readers stream shard files in shard order
    * and rows in position order and see the same permutation on any
    * engine, any partitioning, any re-run — `ORDER BY rand()` gives none
    * of that.
    *
    * Scale shape: a GLOBAL row_number would be one giant window (a
    * single-partition sort — the classic scale trap). Instead the
    * permutation is hierarchical: shard = hash % nShards (uniform, so
    * shards are balanced), position = row_number within shard ordered by
    * (hash, id) — a window PARTITIONED BY shard, i.e. nShards
    * independent sorts that scale out. Hash-ordering within shards means
    * document order is decorrelated from ingest order (the point of
    * shuffling), and the (hash, id) tie-break makes the permutation
    * total. Fully ANSI-SQL-expressible → DuckDB-oracled exactly.
    */
  def trainOrder(df: DataFrame, nShards: Int, idCol: String = "doc_id",
      salt: String = "v1"): DataFrame = {
    require(nShards >= 1, s"need nShards >= 1, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val h = bucketHash(col(idCol), salt)
    df.select(col(idCol), h.as("__h"))
      .withColumn("shard", (col("__h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("__h").asc, col(idCol).asc)).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Deterministic subsample at full 32-bit granularity: keep rows whose
    * hash falls under fraction × 2^32. Unlike `df.sample` (seeded RNG over
    * a partition iterator — resolution-dependent and engine-private), the
    * kept SET is a pure function of (id, salt): stable across engines,
    * partitionings, and re-runs, which is what makes downsampled corpora
    * reproducible.
    */
  def hashSample(df: DataFrame, fraction: Double, idCol: String = "doc_id",
      salt: String = "v1"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    val cut = (fraction * 4294967296.0).toLong
    df.filter(bucketHash(col(idCol), salt) < cut)
  }

  /** Quality-ranked corpus selection under a global token budget: rank
    * documents by (score desc, id asc) and keep the maximal prefix whose
    * cumulative token count stays within `tokenBudget` — the standard
    * "best data first" curation step when a training run has a fixed
    * token budget. Deterministic: the kept SET is a pure function of
    * (score, id, budget).
    *
    * Scale shape: the global rank needs one ordered pass, done as the
    * same DISTRIBUTED PREFIX SUM as `Packing.concatChunk` — range-
    * repartition the slim (id, score, n_tokens) projection (24 B/row,
    * never text) by the rank key, per-partition token totals to the
    * driver (one long per partition), prefix offsets broadcast back,
    * then one parallel pass emits the within-budget prefix. Partitions
    * whose start offset already exceeds the budget emit nothing. A
    * `sum() OVER (ORDER BY ...)` window would express this but plans an
    * un-partitioned global window = one task.
    */
  def selectByBudget(df: DataFrame, tokenBudget: Long, score: Column,
      idCol: String = "doc_id", textCol: String = "text",
      parts: Int = 0): DataFrame = {
    require(tokenBudget >= 0, s"tokenBudget must be >= 0, got $tokenBudget")
    val spark = df.sparkSession
    val slim = graft.core.SparkUtil.spread(df).select(
      col(idCol).cast("long").as("doc_id"),
      score.cast("long").as("score"),
      graft.text.TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val p = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    val sorted = graft.core.SparkUtil.materializeOnce(
      slim.repartitionByRange(p, col("score").desc, col("doc_id"))
        .sortWithinPartitions(col("score").desc, col("doc_id")))
    val rows = sorted.rdd.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val totals = rows.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L; it.foreach(s += _._3); Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(totals.scanLeft(0L)(_ + _))
    val kept = rows.mapPartitionsWithIndex { (pid, it) =>
      val start = offsets.value(pid)
      if (start > tokenBudget) Iterator.empty
      else {
        var cum = start
        it.flatMap { case (id, sc, nt) =>
          cum += nt
          if (cum <= tokenBudget)
            Some(org.apache.spark.sql.Row(id, sc, nt, cum))
          else None
        }
      }
    }
    spark.createDataFrame(kept, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cum_tokens",
        org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
