package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.functions.GeoMean

/** Window functions, grouping variants, statistical aggregates, scalar
  * function families, and the UDF/UDAF/UDTF surface
  * (SURVEY.md §2.4 A4–A10, §2.5 W1–W6, §2.8 F1–F9, §2.12 X1–X3).
  *
  * Window specs always carry a unique tiebreaker in ORDER BY (§5.3);
  * double aggregates are rounded to 4 decimals on both sides.
  */
object WindowsFuncs extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- windows (W1–W6) ----

  /** W1: ranking family over one partition spec. */
  val w1RankFuncs: Q = (s, d) => {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d)
      .select(
        col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
      .where(col("rn") <= 50)
      .orderBy("o_orderpriority", "rn")
  }

  /** W8: distribution functions — percent_rank / cume_dist. Value-based,
    * so ties in o_totalprice produce identical results on both engines;
    * doubles go through the house floor-rounding. */
  val w8DistFuncs: Q = (s, d) => {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice").asc)
    orders(s, d)
      .select(
        col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        r4(percent_rank().over(w)).as("pr"),
        r4(cume_dist().over(w)).as("cd"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** W2: lag / lead across a customer's order history. */
  val w2LagLead: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        col("o_totalprice"),
        r4(lag("o_totalprice", 1).over(w)).as("prev_price"),
        r4(lead("o_totalprice", 1).over(w)).as("next_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** W3: running total (unbounded preceding → current row). */
  val w3RunningTotal: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        r4(sum("o_totalprice").over(w)).as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** W4: moving average over a 4-row window. */
  val w4MovingAvg: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(-3, Window.currentRow)
    orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        r4(avg("o_totalprice").over(w)).as("moving_avg4"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** W5: RANGE frame — value-based window over totalprice. */
  val w5RangeFrame: Q = (s, d) => {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").asc)
      .rangeBetween(-1000, Window.currentRow)
    orders(s, d)
      .select(
        col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        count(lit(1)).over(w).as("n_within_1000"))
      .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
  }

  /** W6: first/last value over the full partition frame. */
  val w6FirstLast: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        first("o_orderkey").over(w).as("first_order"),
        last("o_orderkey").over(w).as("last_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // ---- grouping variants + stats (A4, A6, A7, A8, A10) ----

  /** A4: GROUPING SETS with grouping-id disambiguation. */
  val a4GroupingSets: Q = (s, d) => {
    val v = "graft_li_gs"
    lineitem(s, d).createOrReplaceTempView(v)
    s.sql(
      s"""SELECT l_returnflag, l_linestatus,
         | round(sum(l_quantity), 4) AS sum_qty, count(*) AS n_rows,
         | grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status
         |FROM $v
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
         |""".stripMargin)
  }

  /** A6: cube over two dims. */
  val a6Cube: Q = (s, d) =>
    lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(r4(sum("l_extendedprice")).as("sum_price"), count(lit(1)).as("n_rows"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** A7: statistical aggregates. */
  val a7Stats: Q = (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        r4(stddev_samp(col("l_quantity"))).as("sd_qty"),
        r4(var_samp(col("l_quantity"))).as("var_qty"),
        r4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
        r4(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("covar_qp"))
      .orderBy("l_returnflag")

  /** A8: exact percentiles + median (linear interpolation both engines). */
  val a8Percentile: Q = (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        r4(expr("percentile(l_quantity, 0.5)")).as("p50"),
        r4(expr("percentile(l_quantity, 0.9)")).as("p90"),
        r4(median(col("l_extendedprice"))).as("med_price"))
      .orderBy("l_returnflag")

  /** A10: ordered collect_list rendered as a string (engine-portable). */
  val a10CollectList: Q = (s, d) =>
    nation(s, d)
      .groupBy("n_regionkey")
      .agg(expr(
        "array_join(transform(sort_array(collect_list(n_nationkey)), x -> cast(x as string)), ',')")
        .as("nation_keys"))
      .orderBy("n_regionkey")

  // ---- scalar function families (F1–F9) ----

  /** F1: string functions. */
  val f1StringFuncs: Q = (s, d) =>
    customer(s, d)
      .select(
        col("c_custkey"),
        concat(lit("cust:"), lower(col("c_name"))).as("tagged"),
        substring(col("c_name"), 10, 9).as("id_part"),
        length(col("c_name")).as("name_len"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        trim(lit("  x  ")).as("trimmed"))
      .orderBy("c_custkey")

  /** F2: regex extract / replace / rlike. */
  val f2Regex: Q = (s, d) =>
    customer(s, d)
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "Customer#(\\d+)", 1).as("digits"),
        regexp_replace(col("c_name"), "0+", "0").as("squeezed"),
        when(col("c_name").rlike("00[1-4]$"), lit(1)).otherwise(lit(0)).as("ends_low"))
      .orderBy("c_custkey")

  /** F3: date/time functions. */
  val f3Datetime: Q = (s, d) =>
    orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        unix_timestamp(date_trunc("month", col("o_orderdate"))).as("month_start_s"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).as("days_since_95"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date"))
      .orderBy("o_orderkey")

  /** F4: math functions. */
  val f4Math: Q = (s, d) =>
    lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // round-to-1-decimal via explicit IEEE ops (mul, add, floor, div)
        // so both engines compute bit-identical doubles; Spark's
        // round(double, 1) goes through BigDecimal HALF_UP on the
        // shortest decimal repr, which diverges from DuckDB at
        // representation-boundary values (ADVICE r01).
        (floor(col("l_extendedprice") * 10 + 0.5) / 10).as("price_r1"),
        floor(col("l_quantity")).as("qty_floor"),
        ceil(col("l_discount") * 100).as("disc_pct_ceil"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        r4(pow(col("l_tax") + 1, 2)).as("tax_sq"),
        r4(sqrt(col("l_quantity"))).as("qty_sqrt"),
        r4(log(col("l_extendedprice"))).as("price_ln"),
        r4(log10(col("l_extendedprice"))).as("price_log10"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"))
      // (l_orderkey, l_linenumber) is NOT unique in the fixtures — a total
      // order needs EVERY output column as a sort key (rows tied on a
      // 1-decimal price_r1 can still differ in price_ln; r02 ADVICE).
      .orderBy("l_orderkey", "l_linenumber", "price_r1", "qty_floor",
        "qty_dev", "disc_pct_ceil", "tax_sq", "qty_sqrt", "price_ln",
        "price_log10", "key_mod7")

  /** F10: map functions — construction, element access, keys/values
    * (rendered as strings for engine-portable comparison). */
  val f10Map: Q = (s, d) =>
    nation(s, d)
      .withColumn("m", map_from_arrays(
        array(lit("key"), lit("region")),
        array(col("n_nationkey"), col("n_regionkey"))))
      .select(
        col("n_nationkey"),
        element_at(col("m"), "region").as("region_v"),
        size(col("m")).as("m_size"),
        array_join(map_keys(col("m")), ",").as("m_keys"),
        array_join(transform(map_values(col("m")), v => v.cast("string")), ",").as("m_vals"))
      .orderBy("n_nationkey")

  /** F11: to_json over a struct (Spark and DuckDB both emit compact
    * `{"k":v}` with insertion-ordered keys; stick to BIGINT + STRING
    * fields — double rendering differs between engines). */
  val f11ToJson: Q = (s, d) =>
    nation(s, d)
      .select(
        col("n_nationkey"),
        to_json(struct(
          col("n_nationkey").as("k"),
          col("n_name").as("s"))).as("j"))
      .orderBy("n_nationkey")

  /** F12: bitwise functions. */
  val f12Bits: Q = (s, d) =>
    part(s, d)
      .select(
        col("p_partkey"),
        (col("p_partkey").bitwiseAND(col("p_size"))).as("band"),
        (col("p_partkey").bitwiseOR(col("p_size"))).as("bor"),
        (col("p_partkey").bitwiseXOR(col("p_size"))).as("bxor"),
        shiftleft(col("p_size"), 2).as("shl"),
        shiftright(col("p_partkey"), 1).as("shr"))
      .orderBy("p_partkey")

  /** F5: conditional expressions. */
  val f5Conditional: Q = (s, d) =>
    customer(s, d)
      .select(
        col("c_custkey"),
        when(col("c_acctbal") > 5000, "high")
          .when(col("c_acctbal") > 0, "mid")
          .otherwise("neg").as("band"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("<bldg>")).as("seg_masked"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_pos"),
        r4(least(col("c_acctbal"), lit(1000.0))).as("bal_cap"))
      .orderBy("c_custkey")

  /** F6: array functions over tokenized text (arrays rendered as strings
    * for engine-portable comparison). */
  val f6Array: Q = (s, d) =>
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_toks"),
        array_contains(col("toks"), "spark").cast("int").as("has_spark"),
        array_join(slice(col("toks"), 1, 3), " ").as("first3"),
        size(array_distinct(col("toks"))).as("n_uniq"),
        array_join(sort_array(array_distinct(slice(col("toks"), 1, 5))), ",").as("first5_sorted"))
      .orderBy("doc_id")

  /** F7: higher-order functions — sum of squares via transform+aggregate
    * (double accumulation to mirror the oracle). */
  val f7HigherOrder: Q = (s, d) =>
    embeddings(s, d)
      .select(
        col("vec_id"),
        r4(expr(
          "aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), cast(0.0 as double), (acc, x) -> acc + x)"))
          .as("sum_sq"),
        size(expr("filter(embedding, x -> x > 0)")).as("n_pos"))
      .orderBy("vec_id")

  /** F8: structured JSON parse via from_json (q6 covers get_json_object). */
  val f8FromJson: Q = (s, d) =>
    events(s, d)
      .select(
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"),
        col("event_type"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), countDistinct(col("event_type")).as("n_types"))
      .orderBy("k")

  /** F9: deterministic hash functions (hex strings match DuckDB). */
  val f9Hash: Q = (s, d) =>
    documents(s, d)
      .select(
        col("doc_id"),
        md5(col("text")).as("md5_hex"),
        sha2(col("text"), 256).as("sha256_hex"))
      .orderBy("doc_id")

  // ---- UDF / UDAF / UDTF (X1–X3) ----

  /** X1: scalar Scala UDF (SQL-expressible for the oracle). Prefer
    * built-ins in production paths — this demos the extension surface. */
  val x1ScalarUdf: Q = (s, d) => {
    val band = udf((bal: Double) =>
      if (bal > 7500) "platinum" else if (bal > 2500) "gold" else "base")
    customer(s, d)
      .select(col("c_custkey"), band(col("c_acctbal")).as("tier"))
      .orderBy("c_custkey")
  }

  /** X2: typed UDAF — geometric mean by brand. */
  val x2UdafGeomean: Q = (s, d) =>
    part(s, d)
      .groupBy("p_brand")
      .agg(r4(GeoMean.column(col("p_retailprice"))).as("geo_price"))
      .orderBy("p_brand")

  /** X3: generator / UDTF surface — posexplode of tokens. */
  val x3Posexplode: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .where(col("pos") < 5)
      .orderBy("doc_id", "pos")

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "w1_rank_funcs" -> w1RankFuncs,
    "w2_lag_lead" -> w2LagLead,
    "w3_running_total" -> w3RunningTotal,
    "w4_moving_avg" -> w4MovingAvg,
    "w5_range_frame" -> w5RangeFrame,
    "w6_first_last" -> w6FirstLast,
    "a4_grouping_sets" -> a4GroupingSets,
    "a6_cube" -> a6Cube,
    "a7_stats" -> a7Stats,
    "a8_percentile" -> a8Percentile,
    "w8_dist_funcs" -> w8DistFuncs,
    "a10_collect_list" -> a10CollectList,
    "f1_string_funcs" -> f1StringFuncs,
    "f2_regex" -> f2Regex,
    "f3_datetime" -> f3Datetime,
    "f4_math" -> f4Math,
    "f10_map" -> f10Map,
    "f11_to_json" -> f11ToJson,
    "f12_bits" -> f12Bits,
    "f5_conditional" -> f5Conditional,
    "f6_array" -> f6Array,
    "f7_higher_order" -> f7HigherOrder,
    "f8_from_json" -> f8FromJson,
    "f9_hash" -> f9Hash,
    "x1_scalar_udf" -> x1ScalarUdf,
    "x2_udaf_geomean" -> x2UdafGeomean,
    "x3_posexplode" -> x3Posexplode,
  )

  val oracleSql: Map[String, String] = Map(
    "w1_rank_funcs" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        | CAST(rn AS INT) AS rn, CAST(rnk AS INT) AS rnk,
        | CAST(drnk AS INT) AS drnk, CAST(quartile AS INT) AS quartile FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER w AS rn, rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile
        | FROM orders
        | WINDOW w AS (PARTITION BY o_orderpriority
        |              ORDER BY o_totalprice DESC, o_orderkey ASC)) t
        |WHERE rn <= 50
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "w2_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | round(lag(o_totalprice, 1) OVER w, 4) AS prev_price,
        | round(lead(o_totalprice, 1) OVER w, 4) AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "w3_running_total" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate ASC, o_orderkey ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "w4_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
        | round(avg(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate ASC, o_orderkey ASC
        |   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg4
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "w5_range_frame" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        | count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC
        |   RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1000
        |FROM orders
        |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin,
    "w6_first_last" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_orderkey) OVER w AS first_order,
        | last_value(o_orderkey) OVER w AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "a4_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 4) AS sum_qty, count(*) AS n_rows,
        | CAST(grouping(l_returnflag) AS TINYINT) AS g_flag,
        | CAST(grouping(l_linestatus) AS TINYINT) AS g_status
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "a6_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_extendedprice), 4) AS sum_price, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "a7_stats" ->
      """SELECT l_returnflag,
        | round(stddev_samp(l_quantity), 4) AS sd_qty,
        | round(var_samp(l_quantity), 4) AS var_qty,
        | round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        | round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "w8_dist_funcs" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        | round(percent_rank() OVER w, 4) AS pr,
        | round(cume_dist() OVER w, 4) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "a8_percentile" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        | round(quantile_cont(l_quantity, 0.9), 4) AS p90,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS med_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a10_collect_list" ->
      """SELECT n_regionkey,
        | array_to_string(list(n_nationkey ORDER BY n_nationkey), ',') AS nation_keys
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "f1_string_funcs" ->
      """SELECT c_custkey,
        | concat('cust:', lower(c_name)) AS tagged,
        | substring(c_name, 10, 9) AS id_part,
        | CAST(length(c_name) AS INT) AS name_len,
        | lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        | trim('  x  ') AS trimmed
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f2_regex" ->
      """SELECT c_custkey,
        | regexp_extract(c_name, 'Customer#(\d+)', 1) AS digits,
        | regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
        | CASE WHEN regexp_matches(c_name, '00[1-4]$') THEN 1 ELSE 0 END AS ends_low
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f3_datetime" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        | CAST(day(o_orderdate) AS INT) AS dom,
        | CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start_s,
        | CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since_95,
        | CAST(o_orderdate AS DATE) + 30 AS due_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f4_math" ->
      """SELECT l_orderkey, l_linenumber,
        | floor(l_extendedprice * 10 + 0.5) / 10 AS price_r1,
        | CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        | CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
        | abs(l_quantity - 25) AS qty_dev,
        | round(pow(l_tax + 1, 2), 4) AS tax_sq,
        | round(sqrt(l_quantity), 4) AS qty_sqrt,
        | round(ln(l_extendedprice), 4) AS price_ln,
        | round(log10(l_extendedprice), 4) AS price_log10,
        | l_orderkey % 7 AS key_mod7
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, price_r1, qty_floor, qty_dev,
        |         disc_pct_ceil, tax_sq, qty_sqrt, price_ln, price_log10,
        |         key_mod7""".stripMargin,
    "f10_map" ->
      """SELECT n_nationkey,
        | m['region'][1] AS region_v,
        | CAST(cardinality(m) AS INT) AS m_size,
        | array_to_string(map_keys(m), ',') AS m_keys,
        | array_to_string(list_transform(map_values(m), v -> CAST(v AS VARCHAR)), ',') AS m_vals
        |FROM (SELECT n_nationkey,
        |        map(['key','region'], [n_nationkey, n_regionkey]) AS m
        |      FROM nation) t
        |ORDER BY n_nationkey""".stripMargin,
    "f11_to_json" ->
      """SELECT n_nationkey,
        | CAST(to_json(struct_pack(k := n_nationkey, s := n_name)) AS VARCHAR) AS j
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "f12_bits" ->
      """SELECT p_partkey,
        | p_partkey & p_size AS band,
        | p_partkey | p_size AS bor,
        | xor(p_partkey, p_size) AS bxor,
        | p_size << 2 AS shl,
        | p_partkey >> 1 AS shr
        |FROM part ORDER BY p_partkey""".stripMargin,
    "f5_conditional" ->
      """SELECT c_custkey,
        | CASE WHEN c_acctbal > 5000 THEN 'high'
        |      WHEN c_acctbal > 0 THEN 'mid' ELSE 'neg' END AS band,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), '<bldg>') AS seg_masked,
        | greatest(c_acctbal, 0.0) AS bal_pos,
        | round(least(c_acctbal, 1000.0), 4) AS bal_cap
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f6_array" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS INT) AS n_toks,
        | CAST(list_contains(string_split(text, ' '), 'spark') AS INT) AS has_spark,
        | array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
        | CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
        | array_to_string(list_sort(list_distinct(string_split(text, ' ')[1:5])), ',') AS first5_sorted
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f7_higher_order" ->
      """SELECT vec_id,
        | round(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum'), 4) AS sum_sq,
        | CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "f8_from_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        | count(*) AS n, count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,
    "f9_hash" ->
      """SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x1_scalar_udf" ->
      """SELECT c_custkey,
        | CASE WHEN c_acctbal > 7500 THEN 'platinum'
        |      WHEN c_acctbal > 2500 THEN 'gold' ELSE 'base' END AS tier
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "x2_udaf_geomean" ->
      """SELECT p_brand, round(exp(avg(ln(p_retailprice))), 4) AS geo_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "x3_posexplode" ->
      """SELECT doc_id, CAST(pos AS INT) AS pos, tok FROM (
        | SELECT doc_id,
        |  unnest(range(len(string_split(text, ' ')))) AS pos,
        |  unnest(string_split(text, ' ')) AS tok
        | FROM documents) t
        |WHERE pos < 5
        |ORDER BY doc_id, pos""".stripMargin,
  )
}
