package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-structured (VARIANT) ingestion — the schema-on-read front door
  * of a training-data pipeline. Raw crawl dumps, API payloads, and
  * telemetry land as JSON text whose shape drifts faster than any
  * declared schema; Spark 4's VARIANT type (`parse_json` /
  * `variant_get`, binary-encoded, path access without re-parsing the
  * text per field) is the engine-native answer, replacing the
  * string-column + `get_json_object`-per-field pattern that re-parses
  * the full document for every extracted path.
  *
  * Design rules, mirroring the io6 bad-records posture:
  *   - NEVER drop malformed payloads silently: [[parseWithQuarantine]]
  *     parses with `try_parse_json` (null on malformed instead of an
  *     ANSI runtime throw) and carries an explicit `is_malformed` flag,
  *     so the caller can route the quarantine channel to a dead-letter
  *     sink and the good channel onward — corrupt-input RATE is a
  *     monitored quantity, not an exception trace.
  *   - typed path extraction via [[typedPath]] (`variant_get` with an
  *     explicit target type) — the cast happens INSIDE the variant
  *     decoder, once, instead of string-extract + SQL cast.
  *
  * Scale shape: both are narrow codegen'd projections — no shuffle, no
  * driver action; the VARIANT binary encoding decodes each path in
  * O(depth) without re-tokenizing the JSON text, which at 100 TB of
  * raw payloads is the difference between one parse per row and one
  * parse per row PER FIELD.
  */
object Semistructured {

  /** Parse `rawCol` (JSON text) into a VARIANT column `variant`, with
    * `is_malformed` true exactly when the text was present but
    * unparseable (a NULL input is absent, not malformed — the same
    * distinction PERMISSIVE CSV draws between a missing field and a
    * corrupt record).
    */
  def parseWithQuarantine(df: DataFrame, rawCol: String): DataFrame =
    df.withColumn("variant", try_parse_json(col(rawCol)))
      .withColumn("is_malformed",
        col("variant").isNull && col(rawCol).isNotNull)

  /** Typed path extraction from a VARIANT column: `variant_get` with an
    * explicit SQL target type (`"long"`, `"string"`, `"double"`, …).
    * Null-safe — a missing path or a null variant yields null, never a
    * throw — so extraction composes with aggregation directly.
    */
  def typedPath(variant: Column, path: String, sqlType: String): Column =
    try_variant_get(variant, path, sqlType)

  /** SHRED a VARIANT column into declared typed columns — the
    * schema-on-read → schema-on-disk transition (the Parquet variant-
    * shredding idea at the logical level): hot paths become first-class
    * typed columns that downstream filters/aggregates touch WITHOUT any
    * variant decode, while the variant column stays alongside as the
    * lossless residual for paths nobody declared. Each field is
    * `(columnName, variantPath, sqlType)`; extraction is null-safe per
    * [[typedPath]], so rows missing a path shred to NULL (presence is
    * queryable, never a throw). One narrow codegen'd projection — the
    * variant binary decodes each declared path in O(depth), once.
    */
  def shred(df: DataFrame, variantCol: String,
      fields: Seq[(String, String, String)]): DataFrame = {
    require(fields.nonEmpty, "shred: no fields declared")
    fields.foldLeft(df) { case (d, (name, path, t)) =>
      d.withColumn(name, typedPath(col(variantCol), path, t))
    }
  }

  /** SHAPE PROFILE of a VARIANT column: per inferred payload schema
    * (`schema_of_variant` — the merged-type DDL of each value), the
    * row count. This is the drift monitor a schema-on-read pipeline
    * runs before committing to a shred list: new shapes show up as new
    * rows here, not as silent NULL columns downstream. Partial-
    * aggregable groupBy on a codegen'd projection.
    */
  def shapeProfile(df: DataFrame, variantCol: String): DataFrame =
    df.groupBy(schema_of_variant(col(variantCol)).as("shape"))
      .agg(count(lit(1)).as("n"))
}
