package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.functions.{EtlFunctions, SkillFunctions, TextFunctions, VectorFunctions}
import graft.io.Tables
import graft.nlp.SkillMatcher

/** Driver contract (see SURVEY.md §2/§7): one query per implemented
  * operator, each with an exactly-equivalent DuckDB oracle in [[oracleSql]].
  *
  * Oracle-parity rules used throughout (keep when adding queries):
  *   - aggregated monetary/double sums go through `decimal(18,2)` casts so
  *     the arithmetic is exact in both engines (float sums depend on
  *     accumulation order and would flake the hash compare)
  *   - every result has a total ORDER BY (unique key in the sort)
  *   - synthetic derived columns (titles, salaries) are built from `doc_id`
  *     arithmetic duplicated verbatim in the SQL text
  *   - aliases match column-for-column between Spark and SQL
  */
object SparkEntry {

  /** Shared decimal type for exact money arithmetic. */
  private val Dec = "decimal(18,2)"
  private def dec(c: Column): Column = c.cast(Dec)

  /** Mini-gazetteer used by the oracle-checked skills query (single tokens
    * plus one two-token phrase; "hash join" overlaps the single "join" so
    * the query also exercises longest-match span filtering).
    */
  private val MiniGazetteer = Seq("spark", "filter", "window", "stream", "join", "hash join")

  /** Synthetic job-posting frame derived deterministically from the
    * `documents` table: title by `doc_id % 7` (hits every seniority branch,
    * the "Software" filter, and null-title three-valued logic), description
    * = text plus a salary suffix by `doc_id % 5` (hits every E1 pay edge:
    * `£..K`, `NNNNN GBP`, last-match-wins + K-before-comma ordering,
    * comma+space, no-match→null), nulled entirely when `doc_id % 11 = 0`
    * (exercises the dropna path).
    */
  private def jobsFrame(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val title = expr(
      """CASE CAST(doc_id % 7 AS INT)
        | WHEN 0 THEN 'Senior Data Engineer' WHEN 1 THEN 'junior developer'
        | WHEN 2 THEN 'Head of Data' WHEN 3 THEN 'Principal Engineer'
        | WHEN 4 THEN 'Graduate Analyst' WHEN 5 THEN 'Software Tester'
        | ELSE NULL END""".stripMargin)
    val salary = expr(
      """CASE CAST(doc_id % 5 AS INT)
        | WHEN 0 THEN ' salary £55K' WHEN 1 THEN ' pay 60000 GBP'
        | WHEN 2 THEN ' £50K then £1,5K' WHEN 3 THEN ' rate 3,000 GBP monthly'
        | ELSE '' END""".stripMargin)
    d.select(
      col("doc_id"),
      title.as("title"),
      when(col("doc_id") % 11 === 0, lit(null).cast("string"))
        .otherwise(concat(col("text"), salary)).as("description"))
  }

  /** The identical frame as DuckDB SQL, used as a CTE by several oracles. */
  private val JobsFrameSql =
    """jobs AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 7 AS INT)
      |      WHEN 0 THEN 'Senior Data Engineer' WHEN 1 THEN 'junior developer'
      |      WHEN 2 THEN 'Head of Data' WHEN 3 THEN 'Principal Engineer'
      |      WHEN 4 THEN 'Graduate Analyst' WHEN 5 THEN 'Software Tester'
      |      ELSE NULL END AS title,
      |    CASE WHEN doc_id % 11 = 0 THEN NULL ELSE text ||
      |      CASE CAST(doc_id % 5 AS INT)
      |        WHEN 0 THEN ' salary £55K' WHEN 1 THEN ' pay 60000 GBP'
      |        WHEN 2 THEN ' £50K then £1,5K' WHEN 3 THEN ' rate 3,000 GBP monthly'
      |        ELSE '' END END AS description
      |  FROM documents)""".stripMargin

  /** Flagship query (driver smoke-checks rows>0 on sf0.001): top in-demand
    * skills — the reference pipeline's reason to exist, Spark-first.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val skills = SkillFunctions.extractSkillsWith(spark, MiniGazetteer) _
    Tables.documents(spark, dir)
      .select(explode(skills(col("text"))).as("skill"))
      .groupBy("skill").agg(count("*").as("n_docs"))
      .orderBy(desc("n_docs"), col("skill"))
  }

  // ---------------------------------------------------------------------
  // Standard SQL tier (joins / aggregates / windows — Catalyst built-ins)
  // ---------------------------------------------------------------------

  /** TPC-H-Q1-shaped pricing summary: groupBy + decimal aggregates. */
  private def q1PricingAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount")))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Join + top-k: highest-revenue orders (broadcast-friendly dims, exact
    * decimal revenue so the ORDER BY is engine-stable).
    */
  private def q2TopOrders(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    li.groupBy("l_orderkey")
      .agg(sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount")))).as("revenue"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  /** Three-way join through the dimension chain with broadcast hints:
    * revenue by nation (customer ⋈ nation ⋈ region are small dims — at
    * 100 TB the fact table shuffles once on o_custkey and the dims ship
    * broadcast).
    */
  private def q3NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(count(lit(1)).as("n_orders"), sum(dec(col("o_totalprice"))).as("total_price"))
      .orderBy("region_name", "nation_name")
  }

  /** Semi/anti join: customers with vs without orders per market segment. */
  private def q4SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val ok = Tables.orders(s, dir).select(col("o_custkey"))
    val withO = c.join(ok, c("c_custkey") === ok("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with_orders"))
    val withoutO = c.join(ok, c("c_custkey") === ok("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without_orders"))
    withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
      .orderBy("c_mktsegment")
  }

  /** Tumbling-window aggregation over the event stream (batch mirror of the
    * Structured Streaming query in `graft.streaming`): hourly counts + exact
    * decimal totals per event type.
    */
  private def q5EventsHourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(dec(col("value"))).as("total_value"))
      .orderBy("hour", "event_type")

  /** JSON extraction from the `props` payload column + aggregate. */
  private def q6EventsJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("k")).as("n_distinct_k"),
        sum(col("k").cast("long")).as("sum_k"))
      .orderBy("event_type")

  /** Window function: top-3 customers by account balance per segment
    * (rank ties broken by key so both engines agree).
    */
  private def q7WindowTopk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(desc("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("rn"), col("c_custkey"), dec(col("c_acctbal")).as("acctbal"))
      .orderBy("c_mktsegment", "rn")
  }

  // ---------------------------------------------------------------------
  // Reference-parity tier (the scraped-jobs transform, SURVEY §2.2/2.3)
  // ---------------------------------------------------------------------

  /** E1 — pay extraction over descriptions with every salary edge case. */
  private def p1Pay(s: SparkSession, dir: String): DataFrame =
    jobsFrame(s, dir)
      .select(col("doc_id"), EtlFunctions.extractPay(col("description")).as("pay"))
      .orderBy("doc_id")

  /** E3 — cascaded seniority CASE WHEN, aggregated per class. */
  private def p2Seniority(s: SparkSession, dir: String): DataFrame =
    jobsFrame(s, dir)
      .select(EtlFunctions.seniority(col("title")).as("seniority"))
      .groupBy("seniority").agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("seniority"))

  /** E2 — gazetteer skills extraction (real trie matcher, mini gazetteer so
    * the oracle can replicate longest-match span semantics in SQL).
    */
  private def p3SkillsMini(s: SparkSession, dir: String): DataFrame = {
    val skills = SkillFunctions.extractSkillsWith(s, MiniGazetteer) _
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(skills(col("text"))).as("skill"))
      .orderBy("doc_id", "skill")
  }

  /** P1+P3+P5+U1+U2+U3 — dropna on description, negated-contains filter
    * (three-valued logic drops null titles), column drop, unionByName of
    * two disjoint slices, deterministic order+limit, array_distinct.
    */
  private def p4CleanUnion(s: SparkSession, dir: String): DataFrame = {
    val jobs = jobsFrame(s, dir)
      .na.drop(Seq("description"))
      .filter(!col("title").contains("Software"))
      .withColumn("n_unique_tokens", size(array_distinct(TextFunctions.tokens(col("description")))))
      .drop("description")
    val lo = jobs.filter(col("doc_id") < 100)
    val hi = jobs.filter(col("doc_id") >= 100)
    lo.unionByName(hi)
      .orderBy("doc_id")
      .limit(40)
  }

  /** EP1 — the full reference transform chain in one lazily-composed plan:
    * dropna → pay → skills → seniority → constant run date → drop
    * (`/root/reference/main.py:152-175`), with the run timestamp injected
    * as a literal for determinism (SURVEY §7 deviation E4).
    */
  private def p5FullPipeline(s: SparkSession, dir: String): DataFrame = {
    val skills = SkillFunctions.extractSkillsWith(s, MiniGazetteer) _
    jobsFrame(s, dir)
      .na.drop(Seq("description"))
      .withColumn("pay", EtlFunctions.extractPay(col("description")))
      .withColumn("skills", skills(col("description")))
      .withColumn("seniority", EtlFunctions.seniority(col("title")))
      .withColumn("run_date", to_timestamp(lit("2026-01-01 00:00:00")))
      .drop("title", "description")
      .withColumn("n_skills", size(col("skills")))
      .withColumn("skills", array_sort(col("skills")))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_agg" -> q1PricingAgg _,
    "q2_top_orders" -> q2TopOrders _,
    "q3_nation_revenue" -> q3NationRevenue _,
    "q4_semi_anti" -> q4SemiAnti _,
    "q5_events_hourly" -> q5EventsHourly _,
    "q6_events_json" -> q6EventsJson _,
    "q7_window_topk" -> q7WindowTopk _,
    "p1_pay" -> p1Pay _,
    "p2_seniority" -> p2Seniority _,
    "p3_skills_mini" -> p3SkillsMini _,
    "p4_clean_union" -> p4CleanUnion _,
    "p5_full_pipeline" -> p5FullPipeline _,
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        | sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
        | sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_top_orders" ->
      """SELECT o_orderkey, o_orderpriority, revenue FROM (
        | SELECT l_orderkey AS o_orderkey2, sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS revenue
        | FROM lineitem GROUP BY l_orderkey) li
        |JOIN orders ON o_orderkey2 = o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q3_nation_revenue" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        | count(*) AS n_orders, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY region_name, nation_name""".stripMargin,
    "q4_semi_anti" ->
      """WITH f AS (SELECT c_mktsegment, c_custkey IN (SELECT o_custkey FROM orders) AS has_o FROM customer)
        |SELECT c_mktsegment,
        | sum(CASE WHEN has_o THEN 1 ELSE 0 END) AS n_with_orders,
        | sum(CASE WHEN has_o THEN 0 ELSE 1 END) AS n_without_orders
        |FROM f GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q5_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        | count(*) AS n_events, sum(CAST(value AS DECIMAL(18,2))) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q6_events_json" ->
      """SELECT event_type, count(*) AS n,
        | count(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS n_distinct_k,
        | sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q7_window_topk" ->
      """SELECT c_mktsegment, rn, c_custkey, acctbal FROM (
        | SELECT c_mktsegment, c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal,
        |  row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
        | FROM customer) t
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "p1_pay" ->
      s"""WITH $JobsFrameSql,
        |m AS (SELECT doc_id, regexp_extract_all(description, '£[\\d,]+K?|[\\d,]+ ?GBP') AS l FROM jobs)
        |SELECT doc_id,
        | try_cast(replace(replace(replace(replace(replace(
        |   CASE WHEN len(l) = 0 THEN NULL ELSE l[len(l)] END,
        |   '£',''),'GBP',''),'K','000'),',',''),' ','') AS DOUBLE) AS pay
        |FROM m ORDER BY doc_id""".stripMargin,
    "p2_seniority" ->
      s"""WITH $JobsFrameSql
        |SELECT CASE
        |  WHEN regexp_matches(title, '(?i)senior') THEN 'Senior'
        |  WHEN regexp_matches(title, '(?i)junior|graduate') THEN 'Junior'
        |  WHEN regexp_matches(title, '(?i)manager|head') THEN 'Manager'
        |  WHEN regexp_matches(title, '(?i)principal|lead') THEN 'Lead'
        |  ELSE NULL END AS seniority, count(*) AS n
        |FROM jobs GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "p3_skills_mini" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |big AS (
        |  SELECT a.doc_id, 'hash join' AS skill FROM t a JOIN t b
        |   ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |  WHERE a.tok = 'hash' AND b.tok = 'join'),
        |sing AS (
        |  SELECT a.doc_id, a.tok AS skill FROM t a LEFT JOIN t p
        |   ON p.doc_id = a.doc_id AND p.pos = a.pos - 1
        |  WHERE a.tok IN ('spark','filter','window','stream')
        |     OR (a.tok = 'join' AND coalesce(p.tok, '') <> 'hash'))
        |SELECT DISTINCT doc_id, skill
        |FROM (SELECT * FROM big UNION ALL SELECT * FROM sing)
        |ORDER BY doc_id, skill""".stripMargin,
    "p4_clean_union" ->
      s"""WITH $JobsFrameSql
        |SELECT doc_id, title,
        | len(list_distinct(list_filter(string_split_regex(lower(description), '[^a-z0-9]+'), x -> x <> ''))) AS n_unique_tokens
        |FROM jobs
        |WHERE description IS NOT NULL AND NOT contains(title, 'Software')
        |ORDER BY doc_id LIMIT 40""".stripMargin,
    "p5_full_pipeline" ->
      s"""WITH $JobsFrameSql,
        |clean AS (SELECT * FROM jobs WHERE description IS NOT NULL),
        |t AS (
        |  SELECT doc_id, unnest(string_split(description, ' ')) AS tok,
        |         generate_subscripts(string_split(description, ' '), 1) AS pos
        |  FROM clean),
        |big AS (
        |  SELECT a.doc_id, 'hash join' AS skill FROM t a JOIN t b
        |   ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |  WHERE a.tok = 'hash' AND b.tok = 'join'),
        |sing AS (
        |  SELECT a.doc_id, a.tok AS skill FROM t a LEFT JOIN t p
        |   ON p.doc_id = a.doc_id AND p.pos = a.pos - 1
        |  WHERE a.tok IN ('spark','filter','window','stream')
        |     OR (a.tok = 'join' AND coalesce(p.tok, '') <> 'hash')),
        |sk AS (SELECT doc_id, list_sort(list(DISTINCT skill)) AS skills
        |       FROM (SELECT * FROM big UNION ALL SELECT * FROM sing) GROUP BY doc_id),
        |m AS (SELECT doc_id, regexp_extract_all(description, '£[\\d,]+K?|[\\d,]+ ?GBP') AS l FROM clean)
        |SELECT c.doc_id,
        | try_cast(replace(replace(replace(replace(replace(
        |   CASE WHEN len(m.l) = 0 THEN NULL ELSE m.l[len(m.l)] END,
        |   '£',''),'GBP',''),'K','000'),',',''),' ','') AS DOUBLE) AS pay,
        | coalesce(sk.skills, []) AS skills,
        | CASE
        |  WHEN regexp_matches(c.title, '(?i)senior') THEN 'Senior'
        |  WHEN regexp_matches(c.title, '(?i)junior|graduate') THEN 'Junior'
        |  WHEN regexp_matches(c.title, '(?i)manager|head') THEN 'Manager'
        |  WHEN regexp_matches(c.title, '(?i)principal|lead') THEN 'Lead'
        |  ELSE NULL END AS seniority,
        | TIMESTAMP '2026-01-01 00:00:00' AS run_date,
        | coalesce(len(sk.skills), 0) AS n_skills
        |FROM clean c JOIN m ON c.doc_id = m.doc_id
        |LEFT JOIN sk ON c.doc_id = sk.doc_id
        |ORDER BY c.doc_id""".stripMargin,
  )
}
