package graft.tools
import org.apache.spark.sql.SparkSession
import graft.kg._
import graft.ops._
import graft.graph.Components
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions","2")
      .config("spark.ui.enabled","false")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name%-22s ${(System.nanoTime()-t0)/1e9}%8.2fs"); r
    }
    val cfg = KgPipeline.Config(outDir="", nConv=1500L, turnsPerConv=8, nConcepts=2000L)
    val tr = time("transcripts"){ val x = Synthetic.transcripts(spark, cfg.nConv, cfg.turnsPerConv, cfg.nConcepts).localCheckpoint(true); println("  turns="+x.count()); x }
    val dict = time("dict"){ Synthetic.dictionary(spark, cfg.nConcepts).localCheckpoint(true) }
    val men = time("mentions"){ val x = Linker.detectMentions(tr).localCheckpoint(true); println("  mentions="+x.count()); x }
    val ex = time("linkExact"){ val x = Linker.linkExact(men, dict).localCheckpoint(true); println("  exact="+x.count()); x }
    val fz = time("linkFuzzy"){ val x = Linker.linkFuzzy(men, dict).localCheckpoint(true); println("  fuzzy="+x.count()); x }
    val m = time("toSssom"){ Linker.toSssomRows(ex.unionByName(fz)).localCheckpoint(true) }
    val r = time("reconcile"){ val x = MergeReconcile.filterRedundantRows(m).localCheckpoint(true); println("  reconciled="+x.count()); x }
    val tpl = time("emit"){ val x = TripleEmit.emit(r, KgPipeline.prefixes, expand=false).localCheckpoint(true); println("  triples="+x.count()); x }
    val lbl = time("components"){ val x = Components.componentLabels(tpl.withColumnRenamed("subject","subject_id").withColumnRenamed("predicate","predicate_id").withColumnRenamed("object","object_id")); println("  labels="+x.count()); x }
    spark.stop()
  }
}
