package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession config for the engine. Keep every entry point
  * (Verify, Bench, tests, user apps) on this builder so plans are
  * comparable and the parquet/timezone/AQE settings stay consistent.
  */
object GraftSession {

  /** Engine-required settings, applied on top of any user builder:
    *   - UTC session timezone (oracle parity)
    *   - AQE on (runtime re-plan: skew joins, partition coalescing — the
    *     100 TB posture; harmless locally)
    *   - nanosAsLong: the `events` table carries parquet TIMESTAMP(NANOS),
    *     which Spark only reads via this flag ([[graft.io.Tables.events]]
    *     converts back to TimestampType)
    *   - hugeMethodLimit=8000: HotSpot refuses to JIT methods over ~8 KB
    *     bytecode, so wide whole-stage-codegen'd aggregates (e.g. the k
    *     min-hash mins) otherwise run INTERPRETED bytecode — measured as a
    *     2–20× erratic slowdown on the minhash query shape. At 8000 Spark
    *     falls back to the interpreted-expression path for just those
    *     stages, which is faster and stable.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.codegen.hugeMethodLimit", "8000")
    // Aggregates whose buffer is not fixed-width (min/max over strings,
    // collect_*) run on ObjectHashAggregateExec, which by default abandons
    // hashing after 128 distinct keys and SORTS the whole input instead —
    // a silent 40× cliff on string-keyed sketch aggregations. Keep it
    // hashing; spill safety still comes from the memory manager.
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "67108864")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")

  /** Local session for tests/tools: `local[cores]` with shuffle
    * parallelism matched to cores (not the 200 default — right-size for
    * one machine; on a real cluster leave it to AQE + explicit conf).
    */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = configure(SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.VecExpressions.register(spark)
    spark
  }
}
