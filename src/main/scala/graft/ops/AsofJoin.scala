package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the temporal-alignment operator Spark
  * has no builtin for (attribution, feature lookup at event time,
  * slowly-changing-dimension reads). Not present in the reference
  * (sssom-py has only equi/anti/semi joins on the S/P/O keys); built
  * for the events surface of the training-data pipeline tier.
  */
object AsofJoin {

  /** For every left row, attach the payload of the LATEST right row
    * with the same key and `right.timeCol <= left.timeCol` (equal
    * timestamps included), or nulls when no such right row exists —
    * left-join point-in-time semantics.
    *
    * Built as the union + ordered carry-forward, NOT a range join: tag
    * sides, union by key, sort each key partition by (time, side, tie)
    * with right rows ordered before left at equal times, then propagate
    * the last non-null right payload down the partition
    * (`last(_, ignoreNulls).over(rowsBetween(unboundedPreceding,
    * currentRow))`). One shuffle by key + one per-partition sort +
    * a linear scan — vs a time-range join whose candidate set is
    * quadratic in events per key. This is the standard scalable
    * as-of shape on sorted engines.
    *
    * Correctness details:
    *  - the payload is carried as ONE struct, so all attached columns
    *    come from the SAME right row even if some payload values are
    *    null;
    *  - ties among right rows at one (key, time) resolve to the row
    *    with the greatest `tieCol` (the sort is ascending and the LAST
    *    non-null wins) — a total, engine-portable order;
    *  - left rows never affect each other: their payload slot is null,
    *    which `ignoreNulls` skips.
    *
    * @param payloadCols right columns to attach, renamed `prefix+name`
    * @param tieCol      right column breaking ties at equal timestamps
    *                    (e.g. an event id); must be non-null on right
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, payloadCols: Seq[String], tieCol: String,
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(payloadCols.nonEmpty, "need at least one payload column")
    val reserved = Seq("__t", "__tie", "__pay", "__side", "__asof")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"input columns collide with reserved names $reserved")
    val clashes = payloadCols.map(prefix + _).filter(left.columns.contains)
    require(clashes.isEmpty,
      s"output columns $clashes already exist on the left side — " +
        "pick another prefix")
    // a null time matches nothing: "null <= t" is never true, so
    // null-time right rows are dropped (unfiltered they would sort
    // NULLS FIRST and be attached to everything); a null-time LEFT row
    // symmetrically has no preceding right row and gets null payload
    val r = right.filter(col(timeCol).isNotNull).select(
      keys.map(col) :+ col(timeCol).as("__t") :+ col(tieCol).as("__tie") :+
        struct(payloadCols.map(col): _*).as("__pay"): _*)
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__t", col(timeCol))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried =
      u.withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
    val leftCols = left.columns.toSeq.map(col)
    val payOut = payloadCols.map(c => col(s"__asof.$c").as(prefix + c))
    carried.filter(col("__side") === 1)
      .select(leftCols ++ payOut: _*)
  }
}
