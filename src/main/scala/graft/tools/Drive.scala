package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.SssomTsv
import graft.ops.MergeReconcile
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val b3 = SssomTsv.read(spark, "src/test/resources/sssom/basic3.tsv")
    val b7 = SssomTsv.read(spark, "src/test/resources/sssom/basic7.tsv")
    val merged = MergeReconcile.merge(Seq(b3, b7), reconcile = true)
    println("RECONCILED_MERGE_ROWS=" + merged.df.count())
    merged.df.select("subject_id","predicate_id","predicate_modifier","object_id","confidence","mapping_justification")
      .orderBy("subject_id","object_id").show(20, false)
    // write the reconciled set back out as SSSOM TSV (full round trip)
    SssomTsv.write(merged, "/tmp/merged_reconciled.tsv")
    println("WROTE /tmp/merged_reconciled.tsv")
    // probe: merge a set with itself → idempotent row count
    println("SELF_MERGE=" + MergeReconcile.merge(Seq(b3, b3)).df.count() + " vs " + b3.df.count())
    // probe: diff of disjoint sets → zero common
    val d = MergeReconcile.diff(b3.df, SssomTsv.read(spark, "src/test/resources/sssom/basic.tsv").df)
    println(s"DIFF u1=${d.nUnique1} u2=${d.nUnique2} common=${d.nCommon}")
    // probe: collapse of empty-filter input
    println("COLLAPSE_EMPTY=" + MergeReconcile.collapse(b3.df.filter(col("subject_id") === "nope")).count())
    spark.stop()
  }
}
