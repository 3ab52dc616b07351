package org.apache.spark.sql.graft

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.datasources.{FileFormat, FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** `private[sql]` bridge for the DSv2 BATCH scan
  * (`graft.sources.SnapshotBatchScan`): executing a snapshot table as a
  * genuine V2 `Batch` — the shape Spark's runtime filtering
  * (`SupportsRuntimeFiltering`, dynamic partition pruning) requires —
  * needs Spark's own vectorized parquet reader as the per-partition
  * row source, and `ParquetFileFormat.buildReaderWithPartitionValues`
  * / `FilePartition.getFilePartitions` / `PartitionedFile` are all
  * scoped to Spark's package. Reusing them (exactly what
  * `FileSourceScanExec` executes) beats re-implementing a parquet
  * row reader; the same extension technique as [[DatasetShim]] (cf.
  * the public Delta/Iceberg connector codebases, which ship their own
  * readers for the same seam).
  */
object ParquetScanShim {

  private def cs(spark: SparkSession): classic.SparkSession =
    spark.asInstanceOf[classic.SparkSession]

  /** Spark's own parquet reader function over one file split —
    * vectorized when the schema allows, footer-level filter pushdown
    * from `filters`, missing requested columns NULL-filled (the
    * additive-evolution read semantics). `OPTION_RETURNING_BATCH =
    * false` makes the vectorized path yield ROWS (the caller is a
    * row-based `PartitionReader`); the closure broadcasts its Hadoop
    * conf internally and is executor-serializable, and it registers
    * task-completion close on its readers (SPARK-23457), so early
    * termination never leaks file handles.
    */
  def parquetReadFunc(spark: SparkSession, dataSchema: StructType,
      requiredSchema: StructType, filters: Seq[Filter],
      partitionSchema: StructType = new StructType())
      : PartitionedFile => Iterator[InternalRow] =
    new ParquetFileFormat().buildReaderWithPartitionValues(
      cs(spark), dataSchema, partitionSchema, requiredSchema, filters,
      Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
      cs(spark).sessionState.newHadoopConf())

  /** A whole-file split (parquet row groups make sub-file splits a
    * reader-internal concern; directory-level pruning already bounded
    * the file set). */
  def partitionedFile(absPath: String, length: Long, modTime: Long,
      partitionValues: InternalRow = InternalRow.empty): PartitionedFile =
    PartitionedFile(partitionValues, SparkPath.fromPathString(absPath),
      0L, length, Array.empty, modTime, length)

  /** Parse a Hive-layout path fragment (`grp=2/band=x%20y`) into the
    * INTERNAL partition values of `partSchema`, through Spark's OWN
    * unescape + cast (`PartitioningUtils.castPartValueToDesiredType` —
    * the `__HIVE_DEFAULT_PARTITION__` sentinel maps to null, strings
    * stay verbatim with no type inference, temporals parse in the
    * session zone). Loud when a spec'd column is missing from the
    * fragment: that is layout corruption, not a prunable unknown.
    */
  def partitionValuesOf(spark: SparkSession, fragment: String,
      partSchema: StructType): Seq[Any] = {
    import org.apache.spark.sql.execution.datasources.PartitioningUtils
    val kv = PartitioningUtils.parsePathFragment(fragment)
    val zone = java.time.ZoneId.of(
      cs(spark).sessionState.conf.sessionLocalTimeZone)
    partSchema.fields.toSeq.map { f =>
      val raw = kv.getOrElse(f.name, throw new IllegalStateException(
        s"partitioned data dir: fragment '$fragment' carries no value " +
          s"for spec column '${f.name}' — layout corruption"))
      PartitioningUtils.castPartValueToDesiredType(f.dataType, raw, zone)
    }
  }

  def internalRow(values: Seq[Any]): InternalRow =
    InternalRow.fromSeq(values)

  /** Spark's own bin-packing of files into input partitions —
    * `maxPartitionBytes` / `openCostInBytes` / default-parallelism
    * aware, identical to the file-source scan's task shaping. */
  def filePartitions(spark: SparkSession,
      files: Seq[PartitionedFile]): Seq[FilePartition] = {
    val open = cs(spark).sessionState.conf.filesOpenCostInBytes
    val total = files.map(_.length + open).sum
    val maxSplit = FilePartition.maxSplitBytes(cs(spark), total)
    FilePartition.getFilePartitions(cs(spark), files, maxSplit)
  }
}
