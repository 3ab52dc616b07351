package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / product analytics over event streams: ordered conversion
  * funnels and Markov-style transition counts — the session-analytics
  * family (what fraction of users who viewed went on to click, then
  * purchase; which step bleeds users; what follows what).
  */
object Funnel {

  /** Ordered conversion funnel: for each user, the earliest time each
    * step was reached GIVEN the previous step had been reached first —
    * step i counts only at `ts ≥ ts(step i−1)`, the semantics that make a
    * funnel a funnel (a purchase before the first view is not a
    * conversion). Emits one row per user who completed step 1:
    * `(user, ts1 … tsk, depth)` with NULL past the drop-off point.
    *
    * Implementation: step 1 is a plain min-aggregate; each later step is
    * an equi-join on the user key with the `ts ≥ prev` bound as a
    * residual condition, then another partial-aggregable min. Every
    * shuffle in the chain hashes on the SAME user key, so the exchanges
    * after the first reuse the partitioning (and on a user-bucketed
    * table the whole funnel is shuffle-free). No windows over full event
    * history, no per-user arrays — state per user is k timestamps.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    val base = events.select(col(userCol).as("user"), col(tsCol).as("ts"),
      col(typeCol).as("et"))
    var out = base.filter(col("et") === steps.head)
      .groupBy("user").agg(min("ts").as("ts1"))
    var i = 2
    while (i <= steps.length) {
      val se = base.filter(col("et") === steps(i - 1))
        .select(col("user").as("u"), col("ts"))
      val reached = out.select(col("user"), col(s"ts${i - 1}"))
        .join(se, col("user") === col("u") && col("ts") >= col(s"ts${i - 1}"))
        .groupBy("user").agg(min("ts").as(s"ts$i"))
      out = out.join(reached, Seq("user"), "left")
      i += 1
    }
    val depth = (1 to steps.length).map(j =>
      when(col(s"ts$j").isNotNull, 1).otherwise(0)).reduce(_ + _)
    out.withColumn("depth", depth.cast("long"))
  }

  /** Event-type transition counts (the first-order Markov matrix):
    * consecutive event pairs per user in `(ts, tieCol)` order, counted by
    * (from, to). One window pass over the user-partitioned stream + one
    * partial-aggregable count — `lead` keeps no history beyond one row.
    * `tieCol` makes the order total (equal timestamps are real in event
    * data; an ambiguous order would make the count nondeterministic).
    */
  def transitionCounts(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
  }
}
