package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality profiling — the ingest-time health check a 100 TB
  * lakehouse runs before anything else touches a new drop: per-column row
  * counts, null counts, and EXACT distinct cardinalities, in ONE pass
  * over the data.
  *
  * Scale shape: all columns' aggregates ride a single scan. Multiple
  * `count(DISTINCT col)` in one aggregate plan through Spark's Expand
  * operator — the input is replicated once per distinct-column with a
  * gid, partially de-duplicated map-side, and the final aggregate sees
  * one stream — so k profiled columns cost one scan + one shuffle of the
  * expanded-but-combined rows, not k jobs (the naive per-column loop is
  * k full scans). For web-scale cardinalities where exact distinct is
  * not worth its shuffle, swap `countDistinct` for
  * `approx_count_distinct` (HLL++, fixed-size sketch, no expand) — same
  * output schema, sketch-accuracy contract; the exact form is the gated
  * one because HLL estimates are not engine-portable.
  */
object Profile {

  /** SCHEMA-CONTRACT drift report between two batches of "the same"
    * table — the data-contract audit that catches a producer change at
    * the boundary instead of in a downstream reader's stack trace:
    * per column, whether it was kept / dropped / added / RETYPED (the
    * silent killer), plus each side's null fraction for kept columns
    * (a column that keeps its type but goes 90% null is a contract
    * break too, and schema comparison alone cannot see it — this is
    * the reason the report is not pure metadata). Column identity is
    * by name; types compare as Catalyst `simpleString`. One aggregate
    * pass per side for the null counts; the schema walk is driver-side
    * metadata.
    *
    * @return one row per column name in either schema:
    *         (column, status, type_old, type_new, null_frac_old,
    *         null_frac_new) — fracs 6-rounded, NULL on the absent side
    */
  def schemaDrift(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val s = oldDf.sparkSession
    import s.implicits._
    val oldTypes = oldDf.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val newTypes = newDf.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    def nullFracs(df: DataFrame, names: Seq[String]): Map[String, Double] = {
      if (names.isEmpty) return Map.empty
      val aggs = count(lit(1)).as("__n") +:
        names.map(c => count(col(c)).as(s"__nn_$c"))
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      val n = r.getLong(0).toDouble
      names.zipWithIndex.map { case (c, i) =>
        c -> (if (n == 0) 0.0
              else BigDecimal(1.0 - r.getLong(i + 1) / n)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toMap
    }
    val oldNames = oldDf.schema.fieldNames.toSeq
    val newNames = newDf.schema.fieldNames.toSeq
    val ofr = nullFracs(oldDf, oldNames)
    val nfr = nullFracs(newDf, newNames)
    val all = (oldNames ++ newNames.filterNot(oldNames.contains)).toSeq
    val rows = all.map { c =>
      val (to, tn) = (oldTypes.get(c), newTypes.get(c))
      val status = (to, tn) match {
        case (Some(a), Some(b)) if a == b => "kept"
        case (Some(_), Some(_)) => "retyped"
        case (Some(_), None) => "dropped"
        case _ => "added"
      }
      (c, status, to, tn, ofr.get(c), nfr.get(c))
    }
    rows.toDF("column", "status", "type_old", "type_new",
      "null_frac_old", "null_frac_new")
  }

  /** One row per profiled column: `(column, n_rows, n_null, n_distinct)`
    * — `n_distinct` counts distinct non-null values (SQL `count(DISTINCT
    * col)` semantics on both engines).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"), countDistinct(col(c)).as(s"__nd_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single aggregate row into the per-column layout: a
    // driver-free stack over the 1-row frame (the heavy work is done)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"))
    }
    one.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.column").as("column"), col("p.n_rows").as("n_rows"),
        col("p.n_null").as("n_null"), col("p.n_distinct").as("n_distinct"))
  }

  /** MAD-based robust outlier screen — the median/median-absolute-
    * deviation twin of q33's rolling z-score: mean/stddev screens are
    * themselves dragged by the outliers they hunt (one 1000× row shifts
    * the mean AND inflates sigma until nothing flags), medians are not.
    * Flags `|x − median| > k·MAD` per group.
    *
    * Exactness: Spark's `percentile` and the oracle's `quantile_cont`
    * share the same rank definition (`p·(n−1)`, linear interpolation);
    * over integer-valued inputs the p=0.5 interpolation lands on the
    * exact 0.5 grid in doubles (midpoints of integers ≤ 2⁵¹), so med,
    * MAD, and every flag decision replay bit-for-bit. The groupwise
    * exact percentile is sort-based per group — the documented swap at
    * corpus scale is [[graft.ops.Sketch]]'s DDSketch quantiles (t66),
    * which trade the sort for α-relative error.
    *
    * Scale shape: two grouped aggregates + one broadcast-joined flag
    * pass, all keyed on the (vocab-bounded) group column.
    *
    * @return (group, n, med, mad, n_outliers)
    */
  def madOutlierStats(df: DataFrame, groupCol: String, valCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"MAD multiplier must be positive: $k")
    val v = df.select(col(groupCol).as("g"), col(valCol).cast("double").as("x"))
    val med = v.groupBy("g").agg(expr("percentile(x, 0.5)").as("med"))
    val dev = v.join(broadcast(med), Seq("g"))
      .select(col("g"), col("x"), col("med"), abs(col("x") - col("med")).as("d"))
    val mad = dev.groupBy("g").agg(expr("percentile(d, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("g"))
      .groupBy(col("g"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("d") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("g"), col("n"), col("med"), col("mad"), col("n_outliers"))
  }

  /** Key-skew profile for a prospective shuffle/join/groupBy key — the
    * diagnostic that decides WHICH mitigation a 100 TB plan needs
    * (nothing / AQE skew split / explicit salting / broadcast): one row
    * of `(key_col, n_rows, n_null_rows, n_keys, max_n, top1_share,
    * gini)` where `top1_share` is the hottest key's row fraction (the
    * straggler-task bound: one reducer gets at least this share) and
    * `gini` is the Gini coefficient of the per-key count distribution
    * (0 = uniform, →1 = one key owns everything).
    *
    * Scale shape: per-key counts are ONE partial-aggregable shuffle over
    * the data; everything after runs on the COUNT table (bounded by key
    * cardinality, the vocab-not-corpus contract). The Gini rank is a
    * global `row_number` over that table — a single-task sort of n_keys
    * rows, same bound as t20's global index; swap in a range-partitioned
    * rank when key cardinality itself is web-scale. Null keys are
    * counted separately and excluded from the distribution (engines
    * disagree on NULL sort placement, and a null join key never matches
    * anyway — its rows drop, not route, in an equi-join).
    *
    * Determinism: counts and the rank·count moment are exact integers
    * (DECIMAL(38) — rank·count can pass 2⁶³ near 10⁹ keys × 10⁹ rows);
    * the two ratios are ONE double formula each, 6-rounded, identical
    * operation order in the oracle:
    * `G = 2·Σ(rank·c) / (n_keys·n_rows) − (n_keys+1)/n_keys` with ranks
    * ascending by (count, key).
    */
  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame = {
    val keyed = df.select(col(keyCol).cast("string").as("k"))
    val counts = keyed.filter(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("c"))
    val nNull = keyed.filter(col("k").isNull)
      .agg(count(lit(1)).as("n_null_rows"))
    val ranked = counts.withColumn("rk",
      row_number().over(Window.orderBy(col("c"), col("k"))))
    val nk = col("n_keys").cast("double")
    val nr = col("n_rows").cast("double")
    ranked.agg(
        count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"),
        max(col("c")).as("max_n"),
        sum(col("rk").cast("decimal(38,0)") * col("c")).as("rc"))
      .crossJoin(nNull)
      .select(
        lit(keyCol).as("key_col"),
        col("n_rows"), col("n_null_rows"), col("n_keys"), col("max_n"),
        round(col("max_n").cast("double") / nr, 6).as("top1_share"),
        round(lit(2.0) * col("rc").cast("double") / (nk * nr)
          - (nk + lit(1.0)) / nk, 6).as("gini"))
  }

  /** Declarative data-quality expectations (the Deequ/Great-Expectations
    * contract shape): a constraint suite verified in as close to ONE
    * pass as the constraints allow, emitting one verdict row per check —
    * the machine-readable gate a lakehouse ingest job publishes next to
    * its snapshot commit. Null policy is the standard one: `NotNull`
    * alone counts nulls; the value-shape checks (`InRange`/`InSet`/
    * `MatchesRegex`) pass nulls through uncounted, so each violation is
    * attributable to exactly one rule.
    */
  sealed trait Expectation
  object Expectation {
    /** Column must hold no nulls. */
    case class NotNull(column: String) extends Expectation
    /** Non-null tuples of `columns` must be unique (violations = the
      * surplus rows beyond the first of each duplicate tuple). */
    case class Unique(columns: Seq[String]) extends Expectation
    /** Non-null values must fall in `[lo, hi]` — bounds are DECIMAL
      * string literals compared at DECIMAL(38,6), never doubles, so the
      * boundary decision is engine-exact. */
    case class InRange(column: String, lo: String, hi: String) extends Expectation
    /** Non-null values must be one of `values` (string compare). */
    case class InSet(column: String, values: Seq[String]) extends Expectation
    /** Non-null values must match `pattern` — keep patterns in the
      * Java∩RE2 common dialect (classes, anchors, quantifiers), the
      * same rule the engine-portable regexes elsewhere follow. */
    case class MatchesRegex(column: String, pattern: String) extends Expectation
    /** Every non-null value must exist in `ref.refColumn` (referential
      * integrity; violations count ROWS, not distinct orphan values). */
    case class ForeignKey(column: String, ref: DataFrame,
        refColumn: String) extends Expectation
  }

  /** Run an expectation suite. Scale shape: ONE scan of `df`, ONE
    * aggregate — every check folds into it. Foreign keys pre-join the
    * (distinct, broadcast) reference keys onto the scan, so an FK
    * violation is just another row-local conditional sum — the star-
    * schema shape, no anti-join legs, no second fact scan; uniqueness
    * rides the same aggregate through Catalyst's distinct rewrite
    * (two-level keyed aggregate for one distinct, Expand for several).
    * No driver round-trips — the verdict frame is the 1-row aggregate
    * explode-unpivoted, exactly [[profile]]'s layout trick.
    *
    * @return (check, column, n_rows, n_violations, pass), one row per
    *         expectation (sort on emit — check+column is the natural
    *         key).
    */
  def expectationAudit(df: DataFrame,
      expectations: Seq[Expectation]): DataFrame = {
    import Expectation._
    require(expectations.nonEmpty, "expectationAudit: empty suite")
    val fks = expectations.zipWithIndex.collect {
      case (fk: ForeignKey, i) => (fk, s"__fk_$i")
    }
    val withFk = fks.foldLeft(df) { case (acc, (ForeignKey(c, ref, refC), m)) =>
      acc.join(broadcast(ref.select(col(refC).as(m)).distinct()),
        col(c) === col(m), "left")
    }
    val rowLocal: Seq[(String, String, org.apache.spark.sql.Column)] =
      expectations.collect {
        case NotNull(c) =>
          ("not_null", c, when(col(c).isNull, 1L).otherwise(0L))
        case InRange(c, lo, hi) =>
          ("in_range", c, when(col(c).isNull
            || col(c).cast("decimal(38,6)").between(
                 lit(new java.math.BigDecimal(lo)),
                 lit(new java.math.BigDecimal(hi))), 0L).otherwise(1L))
        case InSet(c, vs) =>
          ("in_set", c, when(col(c).isNull
            || col(c).cast("string").isin(vs: _*), 0L).otherwise(1L))
        case MatchesRegex(c, p) =>
          ("matches_regex", c, when(col(c).isNull
            || col(c).cast("string").rlike(p), 0L).otherwise(1L))
      } ++ fks.map { case (ForeignKey(c, _, _), m) =>
        ("foreign_key", c,
          when(col(c).isNotNull && col(m).isNull, 1L).otherwise(0L))
      }
    val uniques = expectations.collect { case Unique(cs) => cs }
    val aggs = (count(lit(1)).as("__n") +:
      rowLocal.zipWithIndex.map { case ((_, _, v), i) => sum(v).as(s"__v_$i") }) ++
      uniques.zipWithIndex.flatMap { case (cs, i) =>
        val allNonNull = cs.map(col(_).isNotNull).reduce(_ && _)
        Seq(sum(when(allNonNull, 1L).otherwise(0L)).as(s"__un_$i"),
          countDistinct(col(cs.head), cs.tail.map(col): _*).as(s"__ud_$i"))
      }
    val one = withFk.agg(aggs.head, aggs.tail: _*)
    val structs = rowLocal.zipWithIndex.map { case ((name, c, _), i) =>
      struct(lit(name).as("check"), lit(c).as("column"),
        col("__n").as("n_rows"), col(s"__v_$i").as("n_violations"))
    } ++ uniques.zipWithIndex.map { case (cs, i) =>
      struct(lit("unique").as("check"), lit(cs.mkString(",")).as("column"),
        col("__n").as("n_rows"),
        (col(s"__un_$i") - col(s"__ud_$i")).as("n_violations"))
    }
    one.select(explode(array(structs: _*)).as("r"))
      .select(col("r.check").as("check"), col("r.column").as("column"),
        col("r.n_rows").as("n_rows"), col("r.n_violations").as("n_violations"))
      .withColumn("pass", col("n_violations") === 0L)
  }
}
