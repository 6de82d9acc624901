package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._
import graft.io.{SssomJson, SssomTsv}
import graft.ops.{SqlOps, Validators}
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val j = SssomJson.readJson(spark, "src/test/resources/sssom/basic.json")
    println("JSON_ROWS=" + j.df.count() + " meta=" + j.metaMap("license").asString)
    val x = SssomJson.readAlignmentXml(spark, "src/test/resources/sssom/oaei-ordo-hp.rdf",
      PrefixMap.builtIn.chain(PrefixMap(Vector("Orphanet" -> "http://www.orpha.net/ORDO/Orphanet_", "HP" -> "http://purl.obolibrary.org/obo/HP_"))))
    println("XML_ROWS=" + x.df.count()); x.df.show(3, false)
    val fhir = SssomJson.toFhirJson(SssomTsv.read(spark, "src/test/resources/sssom/basic3.tsv"))
    println("FHIR_HEAD=" + fhir.linesIterator.take(6).mkString("~"))
    val basic = SssomTsv.read(spark, "src/test/resources/sssom/basic.tsv")
    println("VALIDATE=" + Validators.validate(basic))
    println("CHI2=" + SqlOps.chiSquared(basic.df, "predicate_id", "mapping_justification"))
    // probes
    try { SssomJson.readObographs(spark, "src/test/resources/sssom/basic.json", PrefixMap.builtIn); println("OBO_WRONG_FORMAT -> no error!") }
    catch { case e: Exception => println("OBO_WRONG_FORMAT -> " + e.getClass.getSimpleName + ": " + e.getMessage.take(60)) }
    val badSql = try { SqlOps.dosql(spark, "SELECT nope FROM df1", Map("t" -> basic.df)); "no error" }
      catch { case e: Exception => e.getClass.getSimpleName }
    println("BAD_SQL -> " + badSql)
    spark.stop()
  }
}
