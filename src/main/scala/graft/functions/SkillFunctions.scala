package graft.functions

import graft.nlp.SkillMatcher
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** E2 — gazetteer skills extraction (`/root/reference/main.py:132-139`,
  * Spark-native precedent `/root/reference/etl/transform.py:47-49`).
  *
  * The reference runs spaCy in Python workers (Arrow IPC per batch); here
  * the matcher is an in-JVM broadcast trie consumed by a Scala UDF —
  * codegen-opaque but with no serialization boundary. The matcher
  * (~100 KB for the full 2,412-pattern gazetteer) is broadcast once and
  * shared by every task, so at 1000 executors the cost is one trie build +
  * one torrent broadcast, not a per-task rebuild.
  */
object SkillFunctions {

  /** Broadcast the matcher once per job; reuse the returned handle across
    * all columns/queries in the session.
    */
  def broadcastMatcher(spark: SparkSession, matcher: SkillMatcher): Broadcast[SkillMatcher] =
    spark.sparkContext.broadcast(matcher)

  /** `extract_skills(text)` as a Column: distinct lowercase skill phrases,
    * first-occurrence order, `array<string>`.
    */
  def extractSkills(bcast: Broadcast[SkillMatcher])(text: Column): Column = {
    val fn = udf((s: String) => if (s == null) null else bcast.value.extract(s))
    fn(text)
  }

  /** One-shot convenience for small gazetteers (builds + broadcasts). */
  def extractSkillsWith(spark: SparkSession, phrases: Seq[String])(text: Column): Column =
    extractSkills(broadcastMatcher(spark, SkillMatcher.fromPhrases(phrases)))(text)

  /** v1 — the native Catalyst expression path
    * ([[graft.expr.ExtractSkillsExpr]]): registers `name` on the session
    * and returns the Column. Same semantics as the UDF path (both are
    * under the oracle gate); cleaner plans + SQL availability.
    */
  def extractSkillsNative(spark: SparkSession, matcher: SkillMatcher,
      name: String = "extract_skills")(text: Column): Column = {
    graft.expr.ExtractSkillsExpr.register(spark, matcher, name)
    org.apache.spark.sql.functions.call_function(name, text)
  }
}
