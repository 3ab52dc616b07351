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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader only
    * surfaces as a nanosecond long (`spark.sql.legacy.parquet.nanosAsLong`,
    * set by [[graft.GraftSession]]); convert to a microsecond timestamp on
    * read (matching DuckDB's ns→µs truncation) so downstream code sees a
    * plain TimestampType column.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }
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
