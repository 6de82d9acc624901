package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver for end-to-end verification runs (see
  * .claude/skills/verify/SKILL.md) — edit freely, keep `main` runnable.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry: $n rows")
    spark.stop()
  }
}
