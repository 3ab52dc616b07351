package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media (image/audio/video) carried as opaque
  * `binary` columns with typed metadata structs, decoded/feature-extracted
  * via partition-local batch processing.
  *
  * The Spark-side plumbing here is real and tested — schema, partition
  * batching, deterministic output — but the actual codec is a STUB: this
  * container has no image/audio libraries, so [[decodeStub]] derives fake
  * "decoded" metadata deterministically from the bytes (documented below).
  * Swapping in a real decoder (javacv/ImageIO/JNI) changes only the body
  * of `decodeBatch`; the distributed shape — mapPartitions over batched
  * binary payloads, no driver round-trip, columnar-friendly output — is
  * what matters at 100 TB (media bytes never leave the executor that read
  * them).
  */
object Multimodal {

  /** Output schema of the decode step: input id + typed media metadata. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("checksum", StringType, nullable = false)))

  /** STUB decode of one media payload. Deterministic fake in place of a
    * real codec: dimensions from the first two bytes, md5 as the content
    * checksum. (A real implementation decodes the header/frames here.)
    */
  private def decodeOne(id: Long, bytes: Array[Byte]): Row = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val checksum = md.digest(bytes).map("%02x".format(_)).mkString
    val w = 16 + (if (bytes.length > 0) (bytes(0) & 0xff) % 16 else 0)
    val h = 16 + (if (bytes.length > 1) (bytes(1) & 0xff) % 16 else 0)
    Row(id, bytes.length, w, h, checksum)
  }

  /** Decode a binary media column partition-by-partition. Expects columns
    * `(idCol: long, binCol: binary)`; emits [[decodedSchema]]. Batching is
    * per-partition (the iterator never materializes the partition), so
    * executor memory holds one payload at a time regardless of media size.
    */
  def decodeStub(df: DataFrame, idCol: String = "doc_id", binCol: String = "media"): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      rows.map(r => decodeOne(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(RowEncoder.encoderFor(decodedSchema))
  }

  /** Attach a binary media payload column. For the synthetic corpus the
    * payload is the utf-8 text bytes standing in for encoded media.
    */
  def withMedia(df: DataFrame, textCol: String = "text", binCol: String = "media"): DataFrame =
    df.withColumn(binCol, col(textCol).cast("binary"))
}
