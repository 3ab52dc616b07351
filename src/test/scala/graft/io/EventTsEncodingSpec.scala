package graft.io

import graft.SparkSpec
import graft.streaming.EventsStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The event-time decode CONTRACT (`Tables.normalizeEventTs`): the driver's
  * testdata generator has shipped `events.ts` under more than one physical
  * parquet encoding — int64 nanoseconds (TIMESTAMP(NANOS) surfaced as
  * LongType under the nanosAsLong flag), then TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (surfaced as TIMESTAMP_NTZ) — and may change
  * again. This spec writes the SAME events under all three encodings the
  * normalizer supports (int64-nanos, MICROS-NTZ, MICROS-UTC) and asserts
  * bit-identical query output over each, through both the batch loader
  * (`Tables.events`) and the stream reader (`EventsStream.readEvents`).
  * A regression here is exactly the round-8 incident: a hard-coded decode
  * silently collapsing event time 1000× when the encoding moved.
  */
class EventTsEncodingSpec extends SparkSpec {

  private def writeFixtures(): (String, String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft-ts-enc").toString
    val src = Tables.events(spark, sf0001) // canonical TimestampType frame
    val cols = src.columns

    // micros-UTC: TimestampType written as TIMESTAMP(MICROS, adjustedToUTC=true).
    // The outputTimestampType override is scoped: the shared test session must
    // not leak it into later specs writing timestamp parquet in this JVM.
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val prior = spark.conf.getOption(tsKey)
    val utcDir = s"$base/utc"
    try {
      spark.conf.set(tsKey, "TIMESTAMP_MICROS")
      writeSingleEventsFile(src.select(cols.map(col): _*), utcDir)

      // micros-NTZ: same wall-clock instants as TIMESTAMP(MICROS,
      // adjustedToUTC=false) (exact under the UTC session timezone
      // GraftSession pins)
      val ntzDir = s"$base/ntz"
      writeSingleEventsFile(
        src.withColumn("ts", col("ts").cast(TimestampNTZType)).select(cols.map(col): _*), ntzDir)

      // int64-nanos: the legacy generator encoding as the nanosAsLong flag
      // surfaces it — a plain long column of epoch nanoseconds
      val nanosDir = s"$base/nanos"
      writeSingleEventsFile(
        src.withColumn("ts", (unix_micros(col("ts")) * lit(1000L)).cast(LongType))
          .select(cols.map(col): _*), nanosDir)

      (nanosDir, ntzDir, utcDir)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(tsKey, v)
        case None    => spark.conf.unset(tsKey)
      }
    }
  }

  /** Land exactly `events.parquet` in `dir` (the sf-dir layout both the
    * batch loader and the glob-filtered stream source expect).
    */
  private def writeSingleEventsFile(df: DataFrame, dir: String): Unit = {
    val tmp = s"$dir-stage"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dest = new java.io.File(dir)
    dest.mkdirs()
    java.nio.file.Files.move(part.toPath, new java.io.File(dest, "events.parquet").toPath)
  }

  private def batchDigest(dir: String): Seq[org.apache.spark.sql.Row] = {
    val e = Tables.events(spark, dir)
    assert(e.schema("ts").dataType == TimestampType,
      s"normalizeEventTs must yield TimestampType, got ${e.schema("ts").dataType} for $dir")
    e.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(unix_micros(col("ts"))).as("ts_us_sum"))
      .orderBy("hour", "event_type").collect().toSeq
  }

  private def streamDigest(dir: String, name: String): Seq[org.apache.spark.sql.Row] =
    EventsStream.runToMemory(spark,
        EventsStream.hourlyAgg(EventsStream.readEvents(spark, dir)), name)
      .orderBy("hour", "event_type").collect().toSeq

  test("batch + stream reads agree bit-for-bit across all three ts encodings") {
    val (nanosDir, ntzDir, utcDir) = writeFixtures()
    try {
      val ref = batchDigest(utcDir)
      assert(ref.nonEmpty)
      assert(batchDigest(ntzDir) == ref, "NTZ batch decode diverged from UTC")
      assert(batchDigest(nanosDir) == ref, "int64-nanos batch decode diverged from UTC")

      val sref = streamDigest(utcDir, "enc_utc")
      assert(sref.nonEmpty)
      assert(streamDigest(ntzDir, "enc_ntz") == sref, "NTZ stream decode diverged from UTC")
      assert(streamDigest(nanosDir, "enc_nanos") == sref, "nanos stream decode diverged from UTC")
    } finally {
      val root = new java.io.File(nanosDir).getParentFile
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(root)
    }
  }

  test("normalizeEventTs rejects an encoding it does not understand") {
    val bogus = spark.range(1).select(col("id").cast("string").as("ts"))
    val e = intercept[IllegalArgumentException](Tables.normalizeEventTs(bogus))
    assert(e.getMessage.contains("unsupported physical type"))
  }
}
