package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-12 surface batch 10: file-size layout control and online
  * drift detection —
  *
  *  - s32 MAX-RECORDS-PER-FILE: at 100 TB the #1 operational layout
  *    knob after partitioning is FILE SIZING — too-large files break
  *    task granularity, too-small files melt the namenode/listing.
  *    `maxRecordsPerFile` + `sortWithinPartitions` gives deterministic
  *    sorted rolls; the query writes, reads back, and verifies the
  *    file census (count, fill, remainder) against the closed form
  *    ⌈n/5000⌉ AND the data checksum — a writer that dropped or
  *    duplicated a roll boundary fails the hash. s6/s13/s24/s29 cover
  *    partitioning/overwrite/codec/bloom; this is the sizing axis.
  *  - lt84 PAGE–HINKLEY: lt13's CUSUM is OFFLINE (argmax over the
  *    whole series, after the fact); Page–Hinkley is the ONLINE form —
  *    a fold that maintains mₜ = Σ(xₛ − x̄ₛ − δ) and alarms the FIRST
  *    day the excursion m − min m exceeds λ, i.e. "when would the
  *    monitor have paged". Integer state throughout: the only division
  *    (running mean) is quantized per step onto the 1e-6 grid, the
  *    excursion/alarm logic is pure integer compares, and the oracle
  *    replays the identical recursion.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.1 (sinks/layout), §2.13 (drift/monitoring).
  */
object SurfaceR12j extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** S32: per-partition-key write streams rolled every 5000 records.
    * `repartition(l_returnflag)` sends each flag's rows to exactly one
    * task, so each flag directory is ONE sorted stream and its file
    * census has the closed form ⌈n_flag/5000⌉ the oracle can state.
    * (Production adds a salt sub-key to parallelize within hot
    * partitions; the sizing knob and the census logic are unchanged.) */
  val s32MaxRecordsPerFile: Q = (s, d) => {
    val dir = java.nio.file.Files.createTempDirectory("graft_s32_roll_").toString
    graft.QueryGuard.deleteRecOnExit(new java.io.File(dir))
    lineitem(s, d)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        expr("CAST(floor(l_extendedprice * 1e4 + 5e-1) AS BIGINT)").as("qprice"))
      .repartition(col("l_returnflag"))
      .sortWithinPartitions("l_returnflag", "l_orderkey", "l_linenumber")
      .write.partitionBy("l_returnflag")
      .option("maxRecordsPerFile", 5000).mode("overwrite").parquet(dir)
    val back = s.read.parquet(dir)
      .select(col("l_returnflag"), col("qprice"), input_file_name().as("f"))
    back.groupBy("l_returnflag", "f")
      .agg(count(lit(1)).as("rows_in_file"), sum("qprice").as("qf"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_files"),
        sum("rows_in_file").as("n_rows"),
        max("rows_in_file").as("max_fill"),
        min("rows_in_file").as("min_fill"),
        Orc.r4(sum("qf").cast("double") / 1e4).as("revenue_checksum"))
      .orderBy("l_returnflag")
  }

  /** LT84: Page–Hinkley first-alarm over each type's daily means
    * (δ = 0.005, λ = 0.05 in value units → 5 000 / 50 000 on the 1e-6
    * grid). Readout keeps the max excursion and final statistic so the
    * row is informative even when no alarm fires on a stable series. */
  val lt84PageHinkley: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(floor(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))" +
        " AS DOUBLE) / count(*) + 0.5) AS BIGINT)").as("qv"))
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("qv")))).as("sv"),
        count(lit(1)).as("n_days"))
      .select(col("event_type"), col("n_days"),
        expr("""aggregate(sv,
            named_struct('k', CAST(0 AS BIGINT), 's', CAST(0 AS BIGINT),
              'm', CAST(0 AS BIGINT), 'mmin', CAST(0 AS BIGINT),
              'exc', CAST(0 AS BIGINT), 'alarm', CAST(0 AS BIGINT)),
            (acc, x) -> named_struct(
              'k', acc.k + 1,
              's', acc.s + x.qv,
              'm', acc.m + CAST(floor(CAST((acc.k + 1) * x.qv - (acc.s + x.qv)
                     AS DOUBLE) / (acc.k + 1) - 5000 + 0.5) AS BIGINT),
              'mmin', least(acc.mmin,
                acc.m + CAST(floor(CAST((acc.k + 1) * x.qv - (acc.s + x.qv)
                  AS DOUBLE) / (acc.k + 1) - 5000 + 0.5) AS BIGINT)),
              'exc', greatest(acc.exc,
                acc.m + CAST(floor(CAST((acc.k + 1) * x.qv - (acc.s + x.qv)
                  AS DOUBLE) / (acc.k + 1) - 5000 + 0.5) AS BIGINT) - acc.mmin),
              'alarm', CASE WHEN acc.alarm > 0 THEN acc.alarm
                WHEN acc.m + CAST(floor(CAST((acc.k + 1) * x.qv - (acc.s + x.qv)
                  AS DOUBLE) / (acc.k + 1) - 5000 + 0.5) AS BIGINT) - acc.mmin
                  > 50000 THEN acc.k + 1
                ELSE CAST(0 AS BIGINT) END))""").as("ph"))
      .select(col("event_type"), col("n_days"),
        Orc.r4(col("ph.exc").cast("double") / 1000000.0d).as("max_excursion"),
        col("ph.alarm").as("alarm_day"),
        (col("ph.alarm") > 0).as("alarmed"))
      .orderBy("event_type")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "s32_max_records_per_file" -> s32MaxRecordsPerFile,
    "lt84_page_hinkley" -> lt84PageHinkley)

  val oracleSql: Map[String, String] = Map(
    // file census closed form: a single sorted stream rolls every 5000
    // records, so n_files = ceil(n/5000), every file except possibly
    // the last is FULL, and the minimum fill is the remainder (or 5000
    // when it divides exactly)
    "s32_max_records_per_file" ->
      """SELECT l_returnflag,
        |  CAST((count(*) + 4999) // 5000 AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(least(count(*), 5000) AS BIGINT) AS max_fill,
        |  CAST(CASE WHEN count(*) % 5000 = 0 THEN least(count(*), 5000)
        |       ELSE count(*) % 5000 END AS BIGINT) AS min_fill,
        |  round(CAST(sum(CAST(floor(l_extendedprice * 1e4 + 5e-1) AS BIGINT))
        |    AS DOUBLE) / 1e4, 4) AS revenue_checksum
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "lt84_page_hinkley" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |    CAST(floor(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
        |      AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS qv
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, qv,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS k,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM daily),
        |rec AS (
        |  SELECT event_type, k, n, qv AS s,
        |    CAST(floor(CAST(1 * qv - qv AS DOUBLE) / 1 - 5000 + 0.5)
        |      AS BIGINT) AS m,
        |    least(CAST(0 AS BIGINT),
        |      CAST(floor(CAST(1 * qv - qv AS DOUBLE) / 1 - 5000 + 0.5)
        |        AS BIGINT)) AS mmin,
        |    greatest(CAST(0 AS BIGINT),
        |      CAST(floor(CAST(1 * qv - qv AS DOUBLE) / 1 - 5000 + 0.5)
        |        AS BIGINT)
        |      - least(CAST(0 AS BIGINT),
        |          CAST(floor(CAST(1 * qv - qv AS DOUBLE) / 1 - 5000 + 0.5)
        |            AS BIGINT))) AS exc,
        |    CASE WHEN CAST(floor(CAST(1 * qv - qv AS DOUBLE) / 1 - 5000 + 0.5)
        |        AS BIGINT)
        |      - least(CAST(0 AS BIGINT),
        |          CAST(floor(CAST(1 * qv - qv AS DOUBLE) / 1 - 5000 + 0.5)
        |            AS BIGINT)) > 50000
        |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS alarm
        |  FROM idx WHERE k = 1
        |  UNION ALL
        |  SELECT i.event_type, i.k, i.n, r.s + i.qv,
        |    r.m + CAST(floor(CAST(i.k * i.qv - (r.s + i.qv) AS DOUBLE) / i.k
        |      - 5000 + 0.5) AS BIGINT),
        |    least(r.mmin,
        |      r.m + CAST(floor(CAST(i.k * i.qv - (r.s + i.qv) AS DOUBLE) / i.k
        |        - 5000 + 0.5) AS BIGINT)),
        |    greatest(r.exc,
        |      r.m + CAST(floor(CAST(i.k * i.qv - (r.s + i.qv) AS DOUBLE) / i.k
        |        - 5000 + 0.5) AS BIGINT) - r.mmin),
        |    CASE WHEN r.alarm > 0 THEN r.alarm
        |      WHEN r.m + CAST(floor(CAST(i.k * i.qv - (r.s + i.qv) AS DOUBLE)
        |          / i.k - 5000 + 0.5) AS BIGINT) - r.mmin > 50000
        |      THEN i.k ELSE CAST(0 AS BIGINT) END
        |  FROM rec r JOIN idx i
        |    ON i.event_type = r.event_type AND i.k = r.k + 1),
        |fin AS (
        |  SELECT event_type, max(n) AS n_days, max_by(exc, k) AS exc,
        |    max_by(alarm, k) AS alarm
        |  FROM rec GROUP BY 1)
        |SELECT event_type, n_days,
        |  round(CAST(exc AS DOUBLE) / 1000000.0, 4) AS max_excursion,
        |  alarm AS alarm_day, alarm > 0 AS alarmed
        |FROM fin ORDER BY event_type""".stripMargin)
}
