package graft.tools
import org.apache.spark.sql.SparkSession
import graft.io.SssomTsv
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val msdf = SssomTsv.read(spark, "src/test/resources/sssom/basic.tsv")
    println("ROWS=" + msdf.df.count())
    msdf.df.select("subject_id","predicate_id","object_id","confidence").show(5, false)
    println("PREFIX x -> " + msdf.prefixes.expand("x:appendage"))
    println("META creator_id = " + msdf.metaMap("creator_id").asString)
    SssomTsv.write(msdf, "/tmp/out_basic.tsv")
    val back = SssomTsv.read(spark, "/tmp/out_basic.tsv")
    println("ROUNDTRIP_ROWS=" + back.df.count())
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/nohdr.tsv"),
      "subject_id\tpredicate_id\tobject_id\na:1\tskos:exactMatch\tb:2\n".getBytes)
    val nh = SssomTsv.read(spark, "/tmp/nohdr.tsv")
    println("NOHDR_ROWS=" + nh.df.count() + " cols=" + nh.df.columns.mkString(","))
    try { SssomTsv.read(spark, "/tmp/definitely_missing.tsv"); println("MISSING -> no error!") }
    catch { case e: Exception => println("MISSING -> " + e.getClass.getSimpleName) }
    spark.stop()
  }
}
