package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.operators.PrefixSum

/** Round-10 surface batch 93: deterministic Luby maximal independent
  * set over the kNN graph, and the vocabulary coverage cut.
  *
  * Contrast with near-siblings: lg5/lc find GROUPS (communities,
  * components) and lg8 extracts a dense CORE; an MIS is the opposite
  * primitive — a maximal set of mutually NON-adjacent vertices — the
  * symmetry-breaking step behind conflict-free scheduling (e.g. "which
  * near-dup cluster representatives can be re-embedded in one batch
  * when neighbors must not co-occur"). Luby's round: a vertex joins
  * when its priority beats every active neighbor's, then it and its
  * neighbors retire — derandomized here with md5(vertex∥round), so
  * the classic randomized algorithm replays exactly. lt26 (Heaps) and
  * lt20 (Good–Turing) describe vocabulary GROWTH and unseen mass;
  * lt57 answers the engineering question they don't: the SMALLEST
  * head vocabulary covering 99% of running tokens, i.e. where to cut
  * a tokenizer's vocab, with the OOV rate that cut buys.
  *
  * Float discipline: MIS is pure hex-string comparison and integer
  * counting; the coverage cut is exact integers (target = ⌈0.99·N⌉
  * via integer arithmetic) with one final division per readout.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.9 (graph ops) and §2.8 (text/tokenizer ops); siblings
  * lg5/lg8, lt26/lt20, lp5 md5 idiom.
  */
object SurfaceR10co extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val ROUNDS = 4

  /** LG11: LUBY MIS — per round: winners = active vertices whose
    * md5(v:round) priority is strictly below every active neighbor's
    * (isolated-in-active vertices win unconditionally), then winners
    * and their neighbors retire. Trajectory readout: (round,
    * mis_total, n_active) — 4 rounds retire the fixture graph fully;
    * the spec asserts independence and maximality, not just counts.
    *
    * Scale shape: each round is two equi-joins keyed by vertex (edge ⋈
    * active ⋈ active), a per-vertex min, and an anti-join — the lg8
    * bounded-chain shape with eager checkpoints; rounds are fixed, and
    * at 100 TB the same loop runs on LSH-candidate edges.
    */
  val lg11Mis: Q = (s, d) => {
    val e0 = SurfaceR6h.knnEdges(s, d).localCheckpoint(true)
    val und = e0.union(e0.select(col("t").as("s"), col("s").as("t")))
      .localCheckpoint(true)
    var active = und.select(col("s").as("v")).distinct().localCheckpoint(true)
    var misTotal = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for (r <- 1 to ROUNDS) {
      val pri = active.withColumn("p",
        md5(concat_ws(":", col("v"), lit(r)).cast("binary")))
      val eact = und
        .join(pri.select(col("v").as("s"), col("p").as("ps")), "s")
        .join(pri.select(col("v").as("t"), col("p").as("pt")), "t")
      val minN = eact.groupBy("s").agg(min("pt").as("mn"))
      val winners = pri
        .join(minN.select(col("s").as("v"), col("mn")), Seq("v"), "left")
        .where(col("mn").isNull || col("p") < col("mn"))
        .select("v").localCheckpoint(true)
      val retired = winners.union(
        und.join(winners.select(col("v").as("s")), "s").select(col("t").as("v")))
        .distinct()
      misTotal += winners.count()
      active = active.join(retired, Seq("v"), "left_anti").localCheckpoint(true)
      out += ((r.toLong, misTotal, active.count()))
    }
    val s2 = s
    import s2.implicits._
    out.toSeq.toDF("round", "mis_total", "n_active").orderBy("round")
  }

  private val COV = 99 // coverage target, percent

  /** LT57: VOCAB COVERAGE CUT — order terms by (count desc, term),
    * find the smallest k whose cumulative token share reaches 99%,
    * and report that k, the exact coverage it buys, and the OOV rate.
    * Head/tail economics for choosing a tokenizer vocab size.
    *
    * Scale shape: explode → term hash agg (the only data-scaling
    * stage), then PrefixSum's range exchange over the distinct-term
    * relation in (−count, term) order; the readout is three scalar
    * aggregates off the swept relation.
    */
  val lt57VocabCoverage: Q = (s, d) => {
    val counts = documents(s, d)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .withColumn("negc", -col("c"))
    val swept = PrefixSum.withRunningTotal(counts, Seq("negc", "term"), "c",
      outCol = "cum")
    val tot = counts.agg(sum("c").as("n"), count(lit(1)).as("vocab"))
    swept.crossJoin(broadcast(tot))
      .withColumn("target", expr(s"($COV * n + 99) DIV 100"))
      .agg(
        max("n").as("total_tokens"), max("vocab").as("vocab_total"),
        sum(when(col("cum") - col("c") < col("target"), 1L).otherwise(0L))
          .as("k_cut"),
        min(when(col("cum") >= col("target"), col("cum"))).as("cov_at_k"),
        max("target").as("tgt"))
      .select(col("total_tokens"), col("vocab_total"), col("k_cut"),
        r4(expr("CAST(cov_at_k AS DOUBLE) / total_tokens")).as("coverage"),
        r4(expr("1.0 - CAST(cov_at_k AS DOUBLE) / total_tokens")).as("oov_rate"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lg11_mis" -> lg11Mis,
    "lt57_vocab_coverage" -> lt57VocabCoverage)

  /** Unrolled Luby rounds (a0..a4, w1..w4), all MATERIALIZED (each
    * round references its predecessor several times — the lg8 CTE
    * re-expansion lesson). */
  private def misSql: String = {
    val edges = SurfaceR6h.knnEdgesCte
      .replace("e AS (", "e AS MATERIALIZED (")
    val header =
      s"""WITH $edges,
         |und AS MATERIALIZED (
         |  SELECT s, t FROM e UNION ALL SELECT t AS s, s AS t FROM e),
         |a0 AS MATERIALIZED (SELECT DISTINCT s AS v FROM und)""".stripMargin
    val rounds = (1 to ROUNDS).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT v, md5(CAST(v AS VARCHAR) || ':' || '$r') AS p
         |  FROM a${r - 1}),
         |mn$r AS MATERIALIZED (
         |  SELECT und.s AS v, min(pt.p) AS mn
         |  FROM und JOIN p$r ps ON und.s = ps.v JOIN p$r pt ON und.t = pt.v
         |  GROUP BY 1),
         |w$r AS MATERIALIZED (
         |  SELECT p$r.v FROM p$r LEFT JOIN mn$r ON p$r.v = mn$r.v
         |  WHERE mn$r.mn IS NULL OR p$r.p < mn$r.mn),
         |a$r AS MATERIALIZED (
         |  SELECT v FROM a${r - 1}
         |  WHERE v NOT IN (SELECT v FROM w$r)
         |    AND v NOT IN (SELECT und.t FROM und JOIN w$r ON und.s = w$r.v))""".stripMargin
    }.mkString(",\n")
    val readouts = (1 to ROUNDS).map { r =>
      val misCte = (1 to r).map(i => s"SELECT v FROM w$i").mkString(" UNION ALL ")
      s"""SELECT CAST($r AS BIGINT) AS round,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ($misCte)) AS mis_total,
         |  (SELECT CAST(count(*) AS BIGINT) FROM a$r) AS n_active""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"$header,\n$rounds\n$readouts\nORDER BY round"
  }

  val oracleSql: Map[String, String] = Map(
    "lg11_mis" -> misSql,
    "lt57_vocab_coverage" ->
      s"""WITH counts AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
         |  GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS n,
         |    CAST(count(*) AS BIGINT) AS vocab,
         |    CAST(($COV * sum(c) + 99) // 100 AS BIGINT) AS target
         |  FROM counts),
         |swept AS (
         |  SELECT c,
         |    CAST(sum(c) OVER (ORDER BY -c, term
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM counts)
         |SELECT n AS total_tokens, vocab AS vocab_total,
         |  CAST(sum(CASE WHEN cum - c < target THEN 1 ELSE 0 END) AS BIGINT)
         |    AS k_cut,
         |  round(CAST(min(CASE WHEN cum >= target THEN cum END) AS DOUBLE)
         |    / n, 4) AS coverage,
         |  round(1.0 - CAST(min(CASE WHEN cum >= target THEN cum END)
         |    AS DOUBLE) / n, 4) AS oov_rate
         |FROM swept CROSS JOIN tot
         |GROUP BY n, vocab""".stripMargin)
}
