package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ColumnChunkMetaData
import scala.jdk.CollectionConverters._

/** Parquet ROW-GROUP BLOOM FILTER audit — the file-level complement of
  * the join-side Bloom prefilter (d16) and the manifest min/max stats
  * (io22/io24). Min/max stats prune RANGE predicates; a point lookup on
  * a column whose values are scattered (unsorted ingest order — the
  * normal case for a key that is not the layout key) is admitted by
  * EVERY row group's [min, max] even when the value occurs in none of
  * them. The parquet bloom filter (enabled per column at write time via
  * `parquet.bloom.filter.enabled#<col>`) answers "definitely absent" per
  * row group from footer-adjacent metadata, so the reader skips the row
  * group without touching its pages — at 100 TB the difference between
  * a footer read and a full-column scan for needle-in-haystack lookups.
  *
  * [[audit]] reads ONLY footers + bloom headers (KB per file, driver- or
  * task-side) and reports, for a LONG column and a probe value, how many
  * row groups min/max stats admit vs how many the bloom filter admits —
  * the "recorded row-groups drop" assertion io25 gates. No data pages
  * are read; the audit cost is independent of table size.
  */
object ParquetBloom {

  /** Per-file row-group audit for a LONG column `colName` probed with
    * `value`.
    *
    * @return (rowGroupsTotal, withBloom, statsAdmit, bloomAdmit) summed
    *         over every `.parquet` part file under `dir` — where
    *         `statsAdmit` counts row groups whose min/max interval
    *         contains `value`, and `bloomAdmit` counts row groups whose
    *         bloom filter cannot rule `value` out (missing bloom ⇒
    *         admits, pruning is advisory exactly as manifest stats are).
    */
  def audit(conf: Configuration, dir: String, colName: String,
      value: Long): (Long, Long, Long, Long) = {
    val p = new Path(dir)
    val fs = FileSystem.get(p.toUri, conf)
    val parts = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    var total = 0L; var withBloom = 0L; var statsAdmit = 0L; var bloomAdmit = 0L
    parts.foreach { part =>
      val reader = ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(part, conf))
      try {
        reader.getRowGroups.asScala.foreach { block =>
          val col = block.getColumns.asScala
            .find(_.getPath.toDotString == colName)
            .getOrElse(sys.error(s"io25: column $colName missing in $part"))
          total += 1
          val bloom = Option(
            reader.getBloomFilterDataReader(block).readBloomFilter(col))
          if (bloom.isDefined) withBloom += 1
          if (statsContain(col, value)) {
            statsAdmit += 1
            // the reader consults bloom only for stats-admitted groups
            bloomAdmit += (bloom match {
              case Some(b) => if (b.findHash(b.hash(value))) 1L else 0L
              case None => 1L // no filter -> cannot rule out -> admit
            })
          }
        }
      } finally reader.close()
    }
    (total, withBloom, statsAdmit, bloomAdmit)
  }

  private def statsContain(col: ColumnChunkMetaData, value: Long): Boolean = {
    val st = col.getStatistics
    if (st == null || !st.hasNonNullValue) true // no stats -> admit
    else {
      val mn = st.genericGetMin.asInstanceOf[Number].longValue
      val mx = st.genericGetMax.asInstanceOf[Number].longValue
      mn <= value && value <= mx
    }
  }
}
