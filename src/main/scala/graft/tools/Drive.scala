package graft.tools
import org.apache.spark.sql.SparkSession
import graft.kg._
object Drive {
  def main(args: Array[String]): Unit = {
    def run(label: String, threads: Int, codegen: Boolean, aqe: Boolean): Unit = {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val spark = SparkSession.builder().master(s"local[$threads]")
        .config("spark.sql.shuffle.partitions", threads.toString)
        .config("spark.sql.codegen.wholeStage", codegen.toString)
        .config("spark.sql.adaptive.enabled", aqe.toString)
        .config("spark.ui.enabled","false")
        .config("spark.sql.session.timeZone","UTC").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val cfg = KgPipeline.Config(outDir="", nConv=8000L, turnsPerConv=8, nConcepts=2000L)
      KgPipeline.buildGraph(KgPipeline.extractMappings(spark, cfg.copy(nConv=500L))).count()
      val t0 = System.nanoTime()
      val n = KgPipeline.buildGraph(KgPipeline.extractMappings(spark, cfg)).count()
      println(f"RUN $label threads=$threads codegen=$codegen aqe=$aqe  ${(System.nanoTime()-t0)/1e9}%6.1fs triples=$n")
      spark.stop()
    }
    run("a", 4, true, true)
    run("b", 4, false, true)
    run("c", 4, false, false)
    run("d", 1, false, true)
  }
}
