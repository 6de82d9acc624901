package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.SssomTsv
import graft.ops._
import graft.graph.Components
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val basic = SssomTsv.read(spark, "src/test/resources/sssom/basic.tsv")
    // clique pipeline: components → summary
    val sizes = Components.assignComponents(basic.df).groupBy("component").count()
      .orderBy(desc("count"))
    println("COMPONENT_SIZES:"); sizes.show(12, false)
    // triple emission over the reconciled set
    val triples = TripleEmit.emit(MergeReconcile.filterRedundantRows(basic.df), basic.prefixes)
    println("TRIPLES=" + triples.count()); triples.show(3, false)
    // cardinality on its fixture
    val card = SssomTsv.read(spark, "src/test/resources/sssom/cardinality.sssom.tsv")
    Cardinality.inferCardinality(card.df.drop("mapping_cardinality"))
      .select("subject_id","object_id","mapping_cardinality").show(6, false)
    // invert + ptable
    println("INVERTED=" + Invert.invertMappings(basic.df, mergeInverted=false).count())
    Ptable.toPtable(basic.df).show(3, false)
    // probe: components on an empty frame
    println("EMPTY_CC=" + Components.assignComponents(basic.df.filter(lit(false))).count())
    // probe: inversion with a predicate not in the invert map only
    val sub = basic.df.filter(col("predicate_id") === "rdfs:subClassOf")
    println("SUBCLASS_INVERT(no-op rows kept)=" + Invert.invertMappings(sub, mergeInverted=false).count() + " of " + sub.count())
    // probe: triple emission when object_id column missing entirely
    println("NO_OBJ_TRIPLES=" + TripleEmit.emit(basic.df.drop("object_id"), basic.prefixes).count())
    spark.stop()
  }
}
