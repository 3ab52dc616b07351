package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-supplied parquet layout
  * (`TESTDATA.md`: one parquet per table under an sf dir) plus the
  * reference's CSV conventions (SURVEY.md §2.1 S3/S5:
  * `;`-separated, header row).
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** Canonical event-time decode — the ONE place that knows how `ts` may
    * arrive physically. The driver's generator has shipped `events.ts` as
    * parquet TIMESTAMP(NANOS) (surfaced by Spark only as a nanosecond
    * long under `spark.sql.legacy.parquet.nanosAsLong`, set by
    * [[graft.GraftSession]]) and later as TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (surfaced as TIMESTAMP_NTZ); either way the
    * stored value is the same UTC wall-clock instant DuckDB reads as a
    * plain TIMESTAMP. Normalize every physical encoding to session-tz
    * TimestampType so downstream `unix_micros`/window/watermark code sees
    * one type:
    *   - LongType            → nanos; truncate ns→µs (DuckDB does the same)
    *   - TimestampNTZType    → exact wall-clock reinterpretation via
    *                           `cast(TimestampType)` under the UTC session
    *                           timezone (GraftSession pins it)
    *   - TimestampType       → already canonical
    * Works on batch and streaming frames alike (pure column rewrite).
    * Every events consumer MUST come through here (or [[events]] /
    * [[graft.streaming.EventsStream.readEvents]], which do) rather than
    * decode `ts` ad hoc — the generator has changed encoding once already.
    */
  def normalizeEventTs(df: DataFrame, tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(tsCol).dataType match {
      case LongType          => df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case TimestampNTZType  => df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case TimestampType     => df
      case other => throw new IllegalArgumentException(
        s"events.$tsCol has unsupported physical type $other " +
          "(expected int64 nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }

  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEventTs(table(spark, sfDir, "events"))
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** S3 — the reference's CSV read (`/root/reference/etl/transform.py:62`):
    * header, `;` separator, inferred schema.
    */
  def readRefCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("sep", ";")
      .option("inferSchema", "true").csv(path)

  /** S5 — the reference's CSV write (`/root/reference/etl/job_scrape.py:64`). */
  def writeRefCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").option("sep", ";").csv(path)
}
