package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.Components
import graft.io.SssomTsv
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val basic = SssomTsv.read(spark, "src/test/resources/sssom/basic.tsv")
    val sizes = Components.assignComponents(basic.df).groupBy("component").count()
      .orderBy(desc("count")).collect().map(_.getLong(1)).mkString(",")
    println("SCC_SIZES=" + sizes)
    // probe: directed 2-cycle merge (a subClassOf b AND b subClassOf a)
    import spark.implicits._
    val cyc = Seq(("a:1","rdfs:subClassOf","a:2"),("a:2","rdfs:subClassOf","a:1"),
                  ("a:3","rdfs:subClassOf","a:4")).toDF("subject_id","predicate_id","object_id")
    Components.componentLabels(cyc).orderBy("node").collect()
      .foreach(r => println("CYCLE " + r.getString(0) + " -> " + r.getString(1)))
    spark.stop()
  }
}
