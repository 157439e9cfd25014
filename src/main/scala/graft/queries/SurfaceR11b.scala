package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 surface batch 2: the transposition-aware edit distance and
  * the simhash hamming band join — the two fuzzy-matching capabilities
  * the lf/ls families still lacked.
  *
  * Contrast with near-siblings: lf2 verifies with plain Levenshtein
  * (counts a swap as 2 edits), lf4 with its banded threshold form; lf5
  * uses the UNRESTRICTED Damerau–Levenshtein (swap = 1 edit) and emits
  * both distances so the oracle checks the transposition discount
  * itself. ls2 COMPUTES simhash signatures but nothing joined on them:
  * lf6 is the missing pairing step — pigeonhole banding over signature
  * chunks (the simhash analogue of l2b's MinHash band buckets), never
  * all-pairs.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.10 (near-dup/fuzzy matching), §4.2 (custom kernels).
  */
object SurfaceR11b extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LF5: Damerau–Levenshtein fuzzy pairs ----

  /** LF5: DAMERAU–LEVENSHTEIN PAIRS — lf2's blocked entity-resolution
    * shape with the transposition-aware verifier: DISTINCT names first,
    * last-token blocking equi-join, then the codegen
    * `damerau_levenshtein` kernel (never all-pairs). Emits BOTH
    * distances per pair; `lev - dl` is exactly the number of edits the
    * Levenshtein metric overcharges on adjacent swaps, so the oracle
    * hash-checks the kernel's transposition semantics cell-by-cell
    * against DuckDB's `damerau_levenshtein`, not just the pair set.
    * Integer distances — no rounding surface anywhere. */
  val lf5DamerauPairs: Q = (s, d) => {
    val names = part(s, d).select(col("p_name")).distinct()
      .select(col("p_name"), element_at(split(col("p_name"), " "), -1).as("blk"))
    names.as("a").join(names.as("b"),
        col("a.blk") === col("b.blk") && col("a.p_name") < col("b.p_name"))
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        expr("damerau_levenshtein(a.p_name, b.p_name)").as("dl"),
        levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("lev"))
      .where(col("dl").between(1, 3))
      .orderBy("name_a", "name_b")
  }

  // ---- LF6: simhash hamming band join ----

  /** 60-bit md5 simhash agg terms — ls2's 16-bit construction widened
    * to 60 bits (bits 0..59 from the first 15 hex chars of md5(tok), 4
    * bits each; 60 so the BIGINT sum of weights stays far from the
    * sign bit in both engines). IDENTICAL text on both sides; the
    * instr fold is BIGINT-seeded (the ANSI overflow idiom). */
  private def sig60Terms: String = (0 until 60).map { j =>
    val p = j / 4 + 1
    val k = j % 4
    val bit = s"CAST(floor((instr('0123456789abcdef', substr(md5(tok), $p, 1)) - 1)" +
      s" / power(2, $k)) AS BIGINT) % 2"
    s"(CASE WHEN sum(CASE WHEN $bit = 1 THEN 1 ELSE -1 END) >= 0" +
      s" THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
  }.mkString(" +\n  ")

  /** Shared tokenizer text (ls2's): distinct lowercased word tokens. */
  private val sparkToksCte =
    """toks AS (
      |  SELECT DISTINCT doc_id, tok FROM (
      |    SELECT doc_id,
      |      explode(split(regexp_replace(lower(text), '^\\W+|\\W+$', ''),
      |        '\\W+')) AS tok
      |    FROM graft_documents)
      |  WHERE length(tok) > 0)""".stripMargin

  /** LF6: SIMHASH HAMMING BAND JOIN — the pairing step ls2's signatures
    * exist for: two documents are near-dup candidates when their
    * simhash signatures differ in ≤ 2 of 60 bits. The scale shape is
    * the pigeonhole band trick: hamming ≤ 2 forces AT LEAST ONE of
    * three disjoint 20-bit chunks to match exactly, so candidates come
    * from three equi-joins on (band, chunk) — the simhash analogue of
    * l2b's MinHash banding; random non-dups collide on a 20-bit chunk
    * with p ≈ 1e-6, so candidate volume tracks true dups, never n².
    * Verification is one codegen `bit_count(a ^ b)` per candidate.
    * The ORACLE is the naive all-pairs filter (DuckDB at sf0.01), so a
    * hash match PROVES the banding lost no pair — recall 1.0 by
    * construction, checked, not claimed. Hamming 0 pairs (identical
    * token sets) are included: they are the exact-dup clusters a dedup
    * pass canonicalizes first. */
  val lf6SimhashHamming: Q = (s, d) => {
    documents(s, d).createOrReplaceTempView("graft_documents")
    val sig = s.sql(
      s"""WITH $sparkToksCte
         |SELECT doc_id, $sig60Terms AS sig
         |FROM toks GROUP BY doc_id""".stripMargin)
    val chunks = sig.select(col("doc_id"), col("sig"),
      posexplode(array(
        col("sig").bitwiseAND(lit(0xFFFFFL)),
        shiftright(col("sig"), 20).bitwiseAND(lit(0xFFFFFL)),
        shiftright(col("sig"), 40).bitwiseAND(lit(0xFFFFFL)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val cand = chunks.as("a").join(chunks.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
    cand
      .select(col("a_id"), col("b_id"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long").as("ham"))
      .where(col("ham") <= 2)
      .orderBy("a_id", "b_id")
  }

  /** Test-only accessor: the spec's naive reference must hash the SAME
    * signature construction the query under test uses. */
  private[graft] def sig60TermsForTest: String = sig60Terms

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lf5_damerau_pairs" -> lf5DamerauPairs,
    "lf6_simhash_hamming" -> lf6SimhashHamming)

  val oracleSql: Map[String, String] = Map(
    "lf5_damerau_pairs" ->
      """WITH p AS (
        |  SELECT DISTINCT p_name, string_split(p_name, ' ')[-1] AS blk
        |  FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(damerau_levenshtein(a.p_name, b.p_name) AS BIGINT) AS dl,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev
        |FROM p a JOIN p b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE damerau_levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
        |ORDER BY name_a, name_b""".stripMargin,
    // naive all-pairs on the oracle side ON PURPOSE: a hash match
    // proves the Spark banding dropped no hamming-<=2 pair
    "lf6_simhash_hamming" ->
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, tok FROM (
         |    SELECT doc_id,
         |      unnest(string_split_regex(
         |        regexp_replace(lower(text), '^\\W+|\\W+$$', '', 'g'),
         |        '\\W+')) AS tok
         |    FROM documents)
         |  WHERE length(tok) > 0),
         |sig AS MATERIALIZED (
         |  SELECT doc_id, $sig60Terms AS sig
         |  FROM toks GROUP BY doc_id)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS ham
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 2
         |ORDER BY a_id, b_id""".stripMargin)
}
