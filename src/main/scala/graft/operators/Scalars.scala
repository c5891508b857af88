package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function surface — SURVEY.md §2.8 (string / date / math / array /
  * higher-order / json). The reference's scalar ops are trim, substring,
  * contains, concat (`/root/reference/main.py:110,129,157`); the rest is the
  * [S] capability set exercised over the typed testdata columns.
  *
  * Everything here is a narrow per-row projection: embarrassingly parallel,
  * whole-stage-codegen'd, no shuffle except the final deterministic ORDER BY
  * (which exists only for the oracle hash-compare; a production pipeline
  * would drop it). Only engine-agreeing functions appear in oracle-checked
  * queries: exact IEEE ops (sqrt, abs, floor), integer arithmetic, and
  * string ops with identical semantics in Spark and DuckDB.
  */
object Scalars extends QueryModule {

  /** q50: string-function battery on part names (F1/F3/F5 analogs). */
  private def q50(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey").as("partkey"),
        upper(col("p_name")).as("uc"),
        lower(col("p_brand")).as("lc"),
        length(col("p_name")).cast(LongType).as("name_len"),
        substring(col("p_name"), 1, 8).as("prefix"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        lpad(col("p_brand"), 12, "#").as("padded"),
        reverse(col("p_type")).as("rev_type"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        trim(lit("  x  ")).as("trimmed")
      )
      .filter(col("partkey") % 7 === 0)
      .orderBy(col("partkey"))

  private val q50Sql =
    """SELECT p_partkey AS partkey,
      |  UPPER(p_name) AS uc, LOWER(p_brand) AS lc,
      |  CAST(LENGTH(p_name) AS BIGINT) AS name_len,
      |  SUBSTRING(p_name, 1, 8) AS prefix,
      |  REPLACE(p_name, ' ', '_') AS snake,
      |  LPAD(p_brand, 12, '#') AS padded,
      |  REVERSE(p_type) AS rev_type,
      |  p_brand || '|' || p_type AS brand_type,
      |  TRIM('  x  ') AS trimmed
      |FROM part WHERE p_partkey % 7 = 0
      |ORDER BY partkey""".stripMargin

  /** q51: regexp extraction/normalization — the DOI-normalization shape
    * (SURVEY.md §2.8 F7: strip a varying prefix down to a canonical id).
    */
  private def q51(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey").as("custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("id_digits"),
        regexp_replace(col("c_name"), "^Customer#", "").as("bare_id"),
        col("c_name").rlike("[0-9]{3,}").as("has_long_num")
      )
      .orderBy(col("custkey"))

  private val q51Sql =
    """SELECT c_custkey AS custkey,
      |  regexp_extract(c_name, '([0-9]+)', 1) AS id_digits,
      |  regexp_replace(c_name, '^Customer#', '') AS bare_id,
      |  regexp_matches(c_name, '[0-9]{3,}') AS has_long_num
      |FROM customer ORDER BY custkey""".stripMargin

  /** q52: date/timestamp functions over order dates. */
  private def q52(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey").as("orderkey"),
        to_date(col("o_orderdate")).as("od")
      )
      .select(
        col("orderkey"),
        col("od"),
        year(col("od")).cast(LongType).as("y"),
        month(col("od")).cast(LongType).as("m"),
        dayofmonth(col("od")).cast(LongType).as("dom"),
        datediff(lit("1996-01-01").cast(DateType), col("od")).cast(LongType).as("days_to_96"),
        date_add(col("od"), 30).as("plus30"),
        last_day(col("od")).as("eom")
      )
      .filter(col("orderkey") % 11 === 0)
      .orderBy(col("orderkey"))

  private val q52Sql =
    """SELECT o_orderkey AS orderkey,
      |  CAST(o_orderdate AS DATE) AS od,
      |  CAST(YEAR(o_orderdate) AS BIGINT) AS y,
      |  CAST(MONTH(o_orderdate) AS BIGINT) AS m,
      |  CAST(DAY(o_orderdate) AS BIGINT) AS dom,
      |  CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1996-01-01') AS BIGINT) AS days_to_96,
      |  CAST(o_orderdate AS DATE) + 30 AS plus30,
      |  LAST_DAY(CAST(o_orderdate AS DATE)) AS eom
      |FROM orders WHERE o_orderkey % 11 = 0
      |ORDER BY orderkey""".stripMargin

  /** q53: math functions — restricted to the IEEE-exact subset (sqrt is
    * correctly rounded per IEEE-754, integer ops are exact) so the
    * hash-compare cannot pick up libm drift (SURVEY.md §7.3).
    */
  private def q53(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey").as("partkey"),
        abs(col("p_size") - 25).cast(LongType).as("dist25"),
        sqrt(col("p_size").cast(DoubleType)).as("sqrt_size"),
        floor(col("p_retailprice")).cast(LongType).as("price_floor"),
        ceil(col("p_retailprice")).cast(LongType).as("price_ceil"),
        pmod(col("p_partkey"), lit(13)).cast(LongType).as("mod13"),
        pow(lit(2.0), col("p_size") % 10).as("pow2"),
        greatest(col("p_size"), lit(20)).cast(LongType).as("gmax"),
        least(col("p_size"), lit(20)).cast(LongType).as("gmin")
      )
      .filter(col("partkey") % 5 === 0)
      .orderBy(col("partkey"))

  private val q53Sql =
    """SELECT p_partkey AS partkey,
      |  CAST(ABS(p_size - 25) AS BIGINT) AS dist25,
      |  SQRT(CAST(p_size AS DOUBLE)) AS sqrt_size,
      |  CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
      |  CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
      |  CAST(p_partkey % 13 AS BIGINT) AS mod13,
      |  POWER(2.0, p_size % 10) AS pow2,
      |  CAST(GREATEST(p_size, 20) AS BIGINT) AS gmax,
      |  CAST(LEAST(p_size, 20) AS BIGINT) AS gmin
      |FROM part WHERE p_partkey % 5 = 0
      |ORDER BY partkey""".stripMargin

  /** q54: array + higher-order functions over tokenized document text —
    * size/sort/distinct plus transform/filter/aggregate lambdas, all inside
    * whole-stage codegen (no UDFs, SURVEY.md §2.10 policy).
    */
  private def q54(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast(LongType).as("n_tokens"),
        size(array_distinct(col("toks"))).cast(LongType).as("n_uniq"),
        array_join(slice(array_sort(array_distinct(col("toks"))), 1, 3), ",").as("first3"),
        size(filter(col("toks"), t => length(t) > 5)).cast(LongType).as("n_long"),
        aggregate(transform(col("toks"), t => length(t)),
          lit(0L), (acc, x) => acc + x).as("sum_len"),
        array_contains(col("toks"), "spark").as("has_spark")
      )
      .orderBy(col("doc_id"))

  private val q54Sql =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
      |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS first3,
      |  CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 5)) AS BIGINT) AS n_long,
      |  CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS sum_len,
      |  list_contains(string_split(text, ' '), 'spark') AS has_spark
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q55: JSON extraction from the events props payload (§2.8 F8), then a
    * numeric aggregation over the extracted field.
    */
  private def q55(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k")
      )
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k")
      )
      .orderBy(col("event_type"))

  private val q55Sql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q56: split + explode + count — the author-unnest flagship shape
    * (SURVEY.md §2.8 F6) applied to document tokens: global top-20 terms.
    * Explode fans out, the count is a partial-agg shuffle of O(vocab) rows,
    * top-k is TakeOrderedAndProject — the whole thing is the canonical
    * word-count plan that scales linearly.
    */
  private def q56(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token"))
      .limit(20)

  private val q56Sql =
    """SELECT token, COUNT(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
      |) WHERE length(token) > 0
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  /** q57: conditional expressions — CASE WHEN ladder, if, nested coalesce
    * (the reference's or-chain P5 generalized).
    */
  private def q57(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey").as("custkey"),
        when(col("c_acctbal") < 0, "overdrawn")
          .when(col("c_acctbal") < 1000, "low")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("band"),
        (col("c_acctbal") > 0).cast("string").as("positive"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("(redacted)")).as("seg")
      )
      .orderBy(col("custkey"))

  private val q57Sql =
    """SELECT c_custkey AS custkey,
      |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
      |       WHEN c_acctbal < 1000 THEN 'low'
      |       WHEN c_acctbal < 5000 THEN 'mid'
      |       ELSE 'high' END AS band,
      |  CAST(c_acctbal > 0 AS VARCHAR) AS positive,
      |  COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), '(redacted)') AS seg
      |FROM customer ORDER BY custkey""".stripMargin

  /** q58: map functions — build a map from aligned key/value arrays, look
    * up keys, enumerate sorted keys (F8 map_* surface). DuckDB's
    * map_extract returns a single-element list; [1] unwraps it.
    */
  private def q58(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .select(
        col("n_nationkey").cast(LongType).as("nationkey"),
        map_from_arrays(
          array(lit("name"), lit("region")),
          array(col("n_name"), col("n_regionkey").cast(StringType))).as("m"))
      .select(
        col("nationkey"),
        element_at(col("m"), "name").as("name"),
        element_at(col("m"), "region").as("region_id"),
        array_join(map_keys(col("m")), ",").as("keys"),
        size(col("m")).cast(LongType).as("m_size"))
      .orderBy(col("nationkey"))

  private val q58Sql =
    """SELECT nationkey,
      |  m['name'][1] AS name,
      |  m['region'][1] AS region_id,
      |  array_to_string(map_keys(m), ',') AS keys,
      |  CAST(cardinality(m) AS BIGINT) AS m_size
      |FROM (
      |  SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
      |         map(['name', 'region'], [n_name, CAST(n_regionkey AS VARCHAR)]) AS m
      |  FROM nation
      |) ORDER BY nationkey""".stripMargin

  /** q59: schema-driven JSON parsing — from_json with an explicit schema
    * into a struct column, field access, null quarantine for unparseable
    * payloads (the typed alternative to q55's path extraction).
    */
  private def q59(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", LongType)))
    Tables.events(s, d)
      .select(col("event_id"), from_json(col("props"), schema).as("p"))
      .select(
        col("event_id"),
        col("p.k").as("k"),
        col("p").isNull.as("unparsed"))
      .filter(col("event_id") % 17 === 0)
      .orderBy(col("event_id"))
  }

  private val q59Sql =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  props IS NULL OR json_valid(props) = false AS unparsed
      |FROM events WHERE event_id % 17 = 0
      |ORDER BY event_id""".stripMargin

  /** q116: URL parsing — the web-corpus normalization scalar (hostname for
    * per-site grouping, path for route analysis, one query parameter). The
    * URL is assembled from part attributes, then decomposed with Spark's
    * `parse_url` — while the oracle re-derives the pieces from the SAME
    * assembled string with regexes, so the compare genuinely checks the
    * parser, not the inputs. Per-row scalar work, map-only at any scale.
    */
  private def q116(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"), concat(
        lit("https://"),
        regexp_replace(lower(substring_index(col("p_type"), " ", 1)), "[^a-z]", ""),
        lit(".example.org/catalog/"),
        // '#' would start a URL FRAGMENT (p_brand is 'Brand#NN') — sanitize
        // it like the space, or parse_url truncates PATH and loses QUERY
        regexp_replace(col("p_brand"), "[ #]", "-"),
        lit("?partkey="), col("p_partkey"),
        lit("&size="), col("p_size")).as("url"))
      .select(
        col("p_partkey"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("size")).as("size_param"))
      .filter(col("p_partkey") % 7 === 0)
      .orderBy(col("p_partkey"))

  private val q116Sql =
    """SELECT p_partkey,
      |  regexp_extract(url, 'https://([^/]+)/', 1) AS host,
      |  regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
      |  regexp_extract(url, '[?&]size=([^&]*)', 1) AS size_param
      |FROM (
      |  SELECT p_partkey,
      |    'https://' || regexp_replace(lower(string_split(p_type, ' ')[1]), '[^a-z]', '', 'g')
      |      || '.example.org/catalog/' || regexp_replace(p_brand, '[ #]', '-', 'g')
      |      || '?partkey=' || p_partkey || '&size=' || p_size AS url
      |  FROM part)
      |WHERE p_partkey % 7 = 0 ORDER BY p_partkey""".stripMargin

  /** q128: VARIANT ingestion — the Spark 4 semi-structured type: props
    * parses once into the binary VARIANT encoding, fields come out through
    * typed `variant_get` paths (missing paths are NULL, not errors). The
    * scale rationale over per-path `get_json_object` (q55): one parse per
    * row feeding any number of path extractions, with shredded columnar
    * access — the open-lakehouse answer to schemaless event payloads.
    * The oracle re-derives the same fields with DuckDB's JSON reader.
    */
  private def q128(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        parse_json(col("props")).as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("variant_get(v, '$.absent', 'bigint')").as("absent"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        count(when(col("k") > 50, 1)).as("n_over_50"),
        count(col("absent")).as("n_absent"))
      .orderBy(col("event_type"))

  private val q128Sql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
      |             THEN 1 END) AS BIGINT) AS n_over_50,
      |  CAST(COUNT(json_extract_string(props, '$.absent')) AS BIGINT) AS n_absent
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q135: error-safe arithmetic — the `try_` function family returns
    * NULL where the strict spelling would throw (divide by zero, overflow,
    * bad cast), which is what lets a 100 TB batch job survive the one
    * poisoned row in shard 974 instead of dying eight hours in. Summary
    * stats stay order-independent (counts + min/max only — no float sums).
    */
  private def q135(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderpriority").as("prio"),
        expr("try_divide(o_totalprice, o_custkey % 7)").as("ratio"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("pnum"),
        expr("try_add(o_orderkey, 9223372036854775807)").as("ovf"))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n"),
        count(col("ratio")).as("n_ratio"),
        min(col("ratio")).as("min_ratio"),
        max(col("ratio")).as("max_ratio"),
        max(col("pnum")).as("prio_digit"),
        count(col("ovf")).as("n_add_ok"))
      .orderBy(col("prio"))

  private val q135Sql =
    """SELECT o_orderpriority AS prio, COUNT(*) AS n,
      |  CAST(COUNT(CASE WHEN o_custkey % 7 <> 0 THEN 1 END) AS BIGINT) AS n_ratio,
      |  MIN(CASE WHEN o_custkey % 7 <> 0 THEN o_totalprice / (o_custkey % 7) END) AS min_ratio,
      |  MAX(CASE WHEN o_custkey % 7 <> 0 THEN o_totalprice / (o_custkey % 7) END) AS max_ratio,
      |  CAST(MAX(TRY_CAST(substr(o_orderpriority, 1, 1) AS INT)) AS INT) AS prio_digit,
      |  CAST(COUNT(CASE WHEN o_orderkey <= 0 THEN 1 END) AS BIGINT) AS n_add_ok
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** q136: collation-aware grouping — a mixed-case tag groups under the
    * UTF8_LCASE collation (Spark 4 COLLATE), so 'BUILDING' and 'Building'
    * land in one group without a lowercase projection; the emitted key is
    * lower()ed only to make the group representative deterministic. The
    * oracle groups by lower(tag). At scale, collation rides the grouping
    * key's hash/compare — no extra column, no double grouping pass.
    */
  private def q136(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .withColumn("tag",
        when(col("c_custkey") % 2 === 0, col("c_mktsegment"))
          .otherwise(initcap(lower(col("c_mktsegment")))))
      .groupBy(expr("tag COLLATE UTF8_LCASE").as("ctag"))
      .agg(count(lit(1)).as("n"),
        min(col("tag")).as("min_variant"),
        countDistinct(col("tag")).as("n_variants"))
      .select(lower(col("ctag")).as("segment"), col("n"),
        col("min_variant"), col("n_variants"))
      .orderBy(col("segment"))

  private val q136Sql =
    """WITH t AS (
      |  SELECT CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment
      |              ELSE upper(substr(lower(c_mktsegment), 1, 1))
      |                   || substr(lower(c_mktsegment), 2) END AS tag
      |  FROM customer)
      |SELECT lower(tag) AS segment, COUNT(*) AS n,
      |  MIN(tag) AS min_variant,
      |  CAST(COUNT(DISTINCT tag) AS BIGINT) AS n_variants
      |FROM t GROUP BY lower(tag) ORDER BY segment""".stripMargin

  /** q137: XML ingestion — each order renders to an XML fragment and
    * parses back through `from_xml` with an explicit schema (the typed
    * XML sibling of q59's from_json), then aggregates the PARSED fields;
    * matching the oracle computed from the raw columns proves the
    * render→parse round trip lossless. Money survives because %.2f of a
    * 2-decimal double is exact; the sum is decimal as everywhere else.
    */
  private def q137(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(format_string(
        "<o><id>%d</id><prio>%s</prio><total>%.2f</total></o>",
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice")).as("xml"))
      .select(expr("from_xml(xml, 'id BIGINT, prio STRING, total DOUBLE')").as("o"))
      .groupBy(col("o.prio").as("prio"))
      .agg(count(col("o.id")).as("n"),
        sum(graft.Exact.money(col("o.total"))).cast(DoubleType).as("total"))
      .orderBy(col("prio"))

  private val q137Sql =
    s"""SELECT o_orderpriority AS prio, COUNT(o_orderkey) AS n,
       |  ${graft.Exact.sqlSumMoney("o_totalprice")} AS total
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_from_json" -> q59,
    "q128_variant_json" -> q128,
    "q135_safe_arithmetic" -> q135,
    "q137_xml_ingest" -> q137,
    "q136_collation_group" -> q136,
    "q116_parse_url" -> q116,
    "q58_map_funcs" -> q58,
    "q50_string_funcs" -> q50,
    "q51_regexp" -> q51,
    "q52_date_funcs" -> q52,
    "q53_math_funcs" -> q53,
    "q54_array_hof" -> q54,
    "q55_json_extract" -> q55,
    "q56_explode_tokens" -> q56,
    "q57_conditionals" -> q57
  )

  override def oracles: Map[String, String] = Map(
    "q59_from_json" -> q59Sql,
    "q128_variant_json" -> q128Sql,
    "q135_safe_arithmetic" -> q135Sql,
    "q137_xml_ingest" -> q137Sql,
    "q136_collation_group" -> q136Sql,
    "q116_parse_url" -> q116Sql,
    "q58_map_funcs" -> q58Sql,
    "q50_string_funcs" -> q50Sql,
    "q51_regexp" -> q51Sql,
    "q52_date_funcs" -> q52Sql,
    "q53_math_funcs" -> q53Sql,
    "q54_array_hof" -> q54Sql,
    "q55_json_extract" -> q55Sql,
    "q56_explode_tokens" -> q56Sql,
    "q57_conditionals" -> q57Sql
  )
}
