package graft.tools
import org.apache.spark.sql.SparkSession
import graft.graph.Rewire
import graft.io.SssomTsv
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // rewire an external triple table through basic.tsv equivalences
    val basic = SssomTsv.read(spark, "src/test/resources/sssom/basic.tsv")
    val ext = Seq(("x:appendage","rdfs:subClassOf","x:organ"),
                  ("q:other","rdfs:seeAlso","x:heart")).toDF("subject","predicate","object")
    try {
      val (out, n) = Rewire.rewire(ext, basic.df)
      println("REWIRED n_changed=" + n); out.show(false)
    } catch { case e: IllegalArgumentException => println("REWIRE_AMBIGUOUS: " + e.getMessage.take(80)) }
    // with precedence
    val (out2, n2) = Rewire.rewire(ext, basic.df, precedence = Seq("y","z"))
    println("REWIRED_PREC n_changed=" + n2); out2.show(false)
    // external metadata + gz through the public reader
    val m = SssomTsv.read(spark, "src/test/resources/sssom/basic-meta-external.tsv",
      metaPath = Some("src/test/resources/sssom/basic-meta-external.yml"))
    println("EXT_META mapping_set_id=" + m.metaMap("mapping_set_id").asString + " rows=" + m.df.count())
    spark.stop()
  }
}
