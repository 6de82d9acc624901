package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-user event sequences:
  * for every ordered pair of consecutive events of one user, count the
  * (prev_type → next_type) transition and report its per-source
  * probability in integer permille — the user-path model behind
  * next-action prediction, funnel-drop diagnosis, and bot detection
  * (a user whose transition rows concentrate on one self-loop is a
  * scraper, not a person).
  *
  * Ordering is (ts, tieCol) per user — the same stable order the
  * sessionizer and funnel use, so a timestamp tie cannot flip a
  * transition between engines. Probabilities are integer permille via
  * long floor-division (n × 1000 div row-total), deterministic across
  * partitionings and engines, so the matrix hash-matches a SQL oracle.
  *
  * Scale shape: ONE exchange — the user-keyed window that computes
  * `lag(type)`; the (prev, next) count that follows is a partial
  * aggregate whose output is bounded by |event types|², a few hundred
  * rows for any real taxonomy, and the per-source total rides a window
  * over THAT tiny table (no second pass over the events). A hot user
  * serializes only that user's lag computation — the window state is one
  * row of look-behind, not a buffered partition, so even a million-event
  * user streams through in O(events-of-user) with O(1) memory.
  */
object Transitions {

  def matrix(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val counts = events
      .select(col(userCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    // per-source row total over the ≤|types|² matrix — a window here costs
    // one exchange of a few hundred rows, never a rescan of the input
    val totals = Window.partitionBy(col("prev_type"))
    counts
      .withColumn("row_total", sum(col("n")).over(totals))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("n * 1000 div row_total").as("p_pm"))
  }
}
