package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.operators.{BandJoin, Components, Packing, Similarity, Upsert}

/** Round-5 pipeline operators: duplicate-cluster closure (connected
  * components), recursive CTE, binned band join (the J9 scale path),
  * MERGE-style upsert, deterministic hash sampling/sharding, and
  * sequence packing.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.3 (J9 scale path), §2.10 (dedup/pipeline family), §2.6
  * (recursive query surface).
  */
object PipelineOps extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- duplicate clusters: near-dup pairs -> connected components ----

  /** Edges = exact near-dup pairs (recall-1.0 bucketed route, cos >= 0.95
    * on original vectors); closure via hash-min label propagation. The
    * oracle recomputes the same edge set in SQL and closes it with a
    * recursive CTE — so BOTH the pair generation and the clustering are
    * cross-checked end to end.
    */
  val lcDupClusters: Q = (s, d) => {
    val e = embeddings(s, d)
    val edges = Similarity
      .exactNearDupPairs(e, threshold = 0.95, nlist = 8)
      .select(col("a_id"), col("b_id"))
    Components.connectedComponents(e.select(col("vec_id")), edges)
      .select(col("id").as("vec_id"), col("lbl").as("cluster_id"))
      .orderBy("vec_id")
  }

  /** LP24: near-dup-aware train/test split — the leakage guard: a plain
    * per-doc hash split can put two near-duplicates on opposite sides
    * of the train/test boundary, and the model then "generalizes" to
    * its own training data. Assigning the split by the CLUSTER label
    * (hash-gated md5 on the component's canonical id, the lp10 idiom)
    * makes straddling impossible BY CONSTRUCTION: every member of a
    * component shares the label, so it shares the split. Output is the
    * full assignment; the oracle recomputes clusters with the shared
    * recursive CTE and applies the identical gate. */
  val lp24ClusterSafeSplit: Q = (s, d) => {
    val e = embeddings(s, d)
    val edges = Similarity
      .exactNearDupPairs(e, threshold = 0.95, nlist = 8)
      .select(col("a_id"), col("b_id"))
    Components.connectedComponents(e.select(col("vec_id")), edges)
      .select(col("id").as("vec_id"), col("lbl").as("cluster_id"))
      .withColumn("split",
        when(expr(
          "(instr('0123456789abcdef', substr(md5(cluster_id || 'csplit'), 1, 1)) - 1)") < 13,
          "train").otherwise("test"))
      .orderBy("vec_id")
  }

  /** Cluster-level dedup stats: one representative (the min id) per
    * component; everything else is a drop candidate. Unlike ld (pairwise
    * b-side drop), this is transitive-closure-correct: A~B~C collapses
    * to one survivor even when A~C is below threshold.
    */
  val lc2ClusterDedup: Q = (s, d) => {
    val e = embeddings(s, d)
    val edges = Similarity
      .exactNearDupPairs(e, threshold = 0.95, nlist = 8)
      .select(col("a_id"), col("b_id"))
    Components.connectedComponents(e.select(col("vec_id")), edges)
      .agg(
        countDistinct("lbl").as("n_clusters"),
        count(when(col("id") =!= col("lbl"), 1)).as("n_dropped"),
        count(lit(1)).as("n_total"))
  }

  // ---- recursive CTE (same SQL text on both engines) ----

  /** WITH RECURSIVE over a parent chain synthesized from nation
    * (parent(n) = floor(n/2)): descendants of node 0 with depth. The
    * identical text runs on Spark (graft_ views) and DuckDB (fixture
    * views) — `P` is the only difference.
    */
  private def q13Sql(p: String): String =
    s"""WITH RECURSIVE tree(nk, depth) AS (
       |  SELECT CAST(n_nationkey AS BIGINT), 0 FROM ${p}nation WHERE n_nationkey = 0
       |  UNION ALL
       |  SELECT CAST(n.n_nationkey AS BIGINT), t.depth + 1
       |  FROM ${p}nation n JOIN tree t
       |    ON CAST(floor(n.n_nationkey / 2.0) AS BIGINT) = t.nk
       |  WHERE n.n_nationkey > 0
       |)
       |SELECT t.nk, t.depth, n.n_name
       |FROM tree t JOIN ${p}nation n ON CAST(n.n_nationkey AS BIGINT) = t.nk
       |ORDER BY t.nk""".stripMargin

  val q13RecursiveCte: Q = (s, d) => {
    Tables.nation(s, d).createOrReplaceTempView("graft_nation")
    s.sql(q13Sql("graft_"))
  }

  // ---- J9 scale path: pure band join as a binned equi-join ----

  /** Orders self-joined on |Δ totalprice| ≤ 0.5 with NO equi key — the
    * shape that would plan BNLJ/cartesian naively; BandJoin bins it into
    * a shuffled equi-join (plan-asserted in PipelineOpsSpec).
    */
  val j9bBandJoinBinned: Q = (s, d) => {
    val o = orders(s, d)
    val a = o.select(col("o_orderkey").as("a_key"), col("o_totalprice").as("a_price"))
    val b = o.select(col("o_orderkey").as("b_key"), col("o_totalprice").as("b_price"))
    BandJoin.banded(a, b, "a_price", "b_price", delta = 0.5)
      .where(col("a_key") < col("b_key"))
      .select(col("a_key"), col("b_key"),
        r4(abs(col("a_price") - col("b_price"))).as("diff4"))
      .orderBy("a_key", "b_key")
  }

  // ---- MERGE-style upsert ----

  /** Correction batch over orders: keys ≡ 0 (mod 100) get a repriced
    * update, keys ≡ 0 (mod 97) come back as fresh inserts under a
    * shifted key. Aggregated by priority so the updated/inserted rows are
    * separately visible in the output.
    */
  val lp3Upsert: Q = (s, d) => {
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    val mods = base.where(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") * 1.1).as("o_totalprice"),
        lit("0-UPDATED").as("o_orderpriority"))
    val ins = base.where(col("o_orderkey") % 97 === 0)
      .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
        col("o_totalprice"),
        lit("0-INSERTED").as("o_orderpriority"))
    Upsert.upsert(base, mods.unionAll(ins), Seq("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"), r4(sum("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  // ---- deterministic hash sampling / sharding (portable: md5) ----

  /** Uniform deterministic sample: rank by md5(text), take the k
    * smallest. Unlike rand()-based sampling this is reproducible across
    * engines, partitionings, and re-ingestions — and it plans as a
    * distributed top-k (TakeOrderedAndProject), not a global sort.
    */
  val lp5HashSample: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("rk"))
      .orderBy(col("rk"), col("doc_id"))
      .limit(50)

  /** Deterministic 16-way content sharding + manifest (count, id range,
    * char volume per shard) — the shard-writer bookkeeping a training
    * pipeline needs to audit a materialized dataset. Shard id is the
    * first md5 nibble, so assignment is stable under repartitioning and
    * incremental ingestion.
    */
  val lp6ShardManifest: Q = (s, d) =>
    documents(s, d)
      .withColumn("shard", substring(md5(col("text").cast("binary")), 1, 1))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        min("doc_id").as("min_id"),
        max("doc_id").as("max_id"),
        sum(length(col("text"))).as("n_chars_sum"))
      .orderBy("shard")

  // ---- sequence packing (rows-only: bin layout is partitioner-local) ----

  /** Pack documents (token count ≈ chars/4) into 512-token bins with
    * first-fit-decreasing per partition; output per-partition packing
    * stats. Laws (each doc exactly once, bins ≤ capacity, ≤ 1 under-half
    * bin per partition) live in PipelineOpsSpec.
    */
  val lp4PackSequences: Q = (s, d) => {
    val docs = documents(s, d).select(col("doc_id"),
      greatest(lit(1), (col("n_chars") / 4).cast("int")).as("n_tok"))
    Packing.packSequences(docs, "doc_id", "n_tok", capacity = 512, numPartitions = 8)
      .groupBy("part_id")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct("bin_id").as("n_bins"),
        sum(col("n_tokens").cast("long")).as("tok_sum"))
      .orderBy("part_id")
  }

  /** LP8: document chunking — split each document into overlapping
    * fixed-size character windows (size 256, stride 200) for embedding /
    * context assembly. Fully declarative: explode(sequence(...)) +
    * substring, so it stays inside whole-stage codegen, needs no UDF,
    * and parallelizes per document with zero shuffles before the sink.
    * Oversize handling for lp4's singleton bins starts here.
    */
  val lp8ChunkDocs: Q = (s, d) =>
    documents(s, d)
      // Guard empty documents: Spark's sequence(0, -1, 200) throws
      // (start > stop with positive step) while DuckDB's generate_series
      // yields no rows — filter them out on both sides and clamp the
      // upper bound so the expression can never see a negative stop.
      .where(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L),
          greatest(length(col("text")) - 1, lit(0)).cast("long"),
          lit(200L))).as("start"))
      .select(col("doc_id"), col("start"),
        expr("substring(text, CAST(start + 1 AS INT), 256)").as("chunk"))
      .withColumn("chunk_len", length(col("chunk")))
      .orderBy("doc_id", "start")

  /** LP9: small-files compaction — the table-maintenance pass every
    * long-lived ingestion needs. Rewrites a fragmented directory (50
    * files here) into a few large files with `coalesce` (NO shuffle:
    * partitions are concatenated, not redistributed); read-back is
    * oracle-checked against the base table so compaction provably
    * changes layout, not content. At scale, drive the target count from
    * bytes (desired file size) and compact per partition-directory.
    */
  val lp9Compact: Q = (s, d) => {
    val frag = new java.io.File("target/tmp/lp9_frag").getAbsolutePath
    val comp = new java.io.File("target/tmp/lp9_compact").getAbsolutePath
    documents(s, d).repartition(50).write.mode("overwrite").parquet(frag)
    s.read.parquet(frag).coalesce(4).write.mode("overwrite").parquet(comp)
    s.read.parquet(comp).select("doc_id", "n_chars").orderBy("doc_id")
  }

  /** S11: schema-evolution read — two parquet batches written with
    * different schemas (a column added later), unified by mergeSchema;
    * early rows surface the new column as NULL. The drift case every
    * append-only corpus hits.
    */
  val s11SchemaEvolution: Q = (s, d) => {
    val base = new java.io.File("target/tmp/s11_evo").getAbsolutePath
    val n = nation(s, d)
    n.where(col("n_nationkey") < 10).select("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$base/batch1")
    n.where(col("n_nationkey") >= 10)
      .select("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$base/batch2")
    s.read.option("mergeSchema", "true")
      .parquet(s"$base/batch1", s"$base/batch2")
      .orderBy("n_nationkey")
  }

  /** Q15: relational division — customers whose orders span EVERY
    * priority class. Two hash aggregates + a broadcast one-row divisor;
    * no correlated per-row work.
    */
  val q15RelationalDivision: Q = (s, d) => {
    val o = orders(s, d)
    val divisor = o.select(countDistinct("o_orderpriority").as("tot"))
    o.groupBy("o_custkey")
      .agg(countDistinct("o_orderpriority").as("np"))
      .crossJoin(broadcast(divisor))
      .where(col("np") === col("tot"))
      .select(col("o_custkey").as("c_custkey"))
      .orderBy("c_custkey")
  }

  /** L2b: ORACLE-CHECKED MinHash banding — the same signature→band→
    * bucket-join pipeline as the xxhash64 route (TextOps), but over
    * 3-word shingles with an md5-derived hash family both engines can
    * compute, so the CANDIDATE SET itself is cross-checked, not just its
    * recall. 8 hash functions, 2 bands × 4 rows (P[candidate] ≈ 0.93 at
    * Jaccard 0.9, ≈ 0.02 at 0.3); min over hex strings (lexicographic
    * in both engines). Candidates come from an equi-join on (band, key)
    * — never all-pairs — which is the whole scale story of LSH.
    */
  val l2bMinhashBanding: Q = (s, d) =>
    md5BandCandidates(s, d).orderBy("a_id", "b_id")

  /** The md5-banding candidate-pair set WITHOUT the presentation sort —
    * shared by l2b (the oracle-checked registry row) and lg_pagerank
    * (which runs centrality over this same candidate graph), kept as one
    * body so the two can never drift. Pairs come from an equi-join on
    * (band, key) — never all-pairs. */
  private[queries] def md5BandCandidates(
      s: SparkSession, d: String): DataFrame = {
    // strip boundary non-word chars BEFORE splitting: Java split drops
    // trailing empty fields while the oracle dialect keeps them, so the
    // word arrays only agree when neither side produces boundary empties.
    val words = documents(s, d)
      .select(col("doc_id"),
        split(regexp_replace(lower(col("text")), "^\\W+|\\W+$", ""), "\\W+").as("w"))
    val shingles = words
      .where(size(col("w")) >= 3) // sequence(1, n-2) must not descend
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("w")) - 2)).as("i"), col("w"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), col("i"), lit(3))).as("tok"))
      .distinct()
    val hashed = shingles.select(col("doc_id"), explode(array(
      (0 until 8).map(i => struct(lit(i).as("h"),
        md5(concat_ws(":", lit(i.toString), col("tok")).cast("binary")).as("hv"))): _*)).as("e"))
    val sigs = hashed.groupBy(col("doc_id"), col("e.h").as("h"))
      .agg(min("e.hv").as("sig"))
    val bandKeys = sigs
      .groupBy(col("doc_id"), floor(col("h") / 4).as("band"))
      .agg(concat_ws("|",
        max(when(col("h") % 4 === 0, col("sig"))),
        max(when(col("h") % 4 === 1, col("sig"))),
        max(when(col("h") % 4 === 2, col("sig"))),
        max(when(col("h") % 4 === 3, col("sig")))).as("bkey"))
    bandKeys.as("x")
      .join(bandKeys.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  /** The 16 simhash bit terms, generated ONCE and embedded verbatim in
    * both engines' SQL: bit j is the sign of Σ_tokens (±1) on bit j of
    * the token's md5 (nibble extracted by hex-char position, bit by
    * floor/power arithmetic — no engine-specific bit operators). Ties
    * (Σ = 0) set the bit, deterministically on both sides.
    */
  private def simhashTerms: String = (0 until 16).map { j =>
    val p = j / 4 + 1 // 1-based hex char holding bit j
    val k = j % 4     // bit index inside the nibble
    val bit = s"CAST(floor((instr('0123456789abcdef', substr(md5(tok), $p, 1)) - 1)" +
      s" / power(2, $k)) AS INT) % 2"
    s"(CASE WHEN sum(CASE WHEN $bit = 1 THEN 1 ELSE -1 END) >= 0 THEN ${1 << j} ELSE 0 END)"
  }.mkString(" +\n  ")

  /** LS2: ORACLE-CHECKED SimHash — 16-bit signature from md5 token
    * hashes, the cross-engine-checkable twin of the xxhash64 ls_simhash.
    * One hash-aggregate per document (16 conditional sums fused in a
    * single agg), so it scales exactly like a groupBy count.
    */
  val ls2SimhashMd5: Q = (s, d) => {
    documents(s, d).createOrReplaceTempView("graft_documents")
    s.sql(
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, tok FROM (
         |    SELECT doc_id,
         |      explode(split(regexp_replace(lower(text), '^\\\\W+|\\\\W+$$', ''),
         |        '\\\\W+')) AS tok
         |    FROM graft_documents)
         |  WHERE length(tok) > 0
         |)
         |SELECT doc_id,
         |  $simhashTerms AS simhash16
         |FROM toks GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  }

  /** The shared md5 split expression: bucket in [0,100) from the first
    * two hex chars of md5(doc_id), thresholds 80/10/10. Pure function of
    * the id — membership survives repartitioning, re-ingestion, and
    * engine choice, and unlike the xxhash64 route (lp_hash_split) it is
    * reproducible in the oracle dialect, so the PER-ROW membership is
    * hash-compared, not just law-tested.
    */
  private val splitSql: String =
    """SELECT doc_id,
      |  CASE WHEN bucket < 80 THEN 'train'
      |       WHEN bucket < 90 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (
      |  SELECT doc_id,
      |    ((instr('0123456789abcdef', substr(md5(doc_id || ''), 1, 1)) - 1) * 16 +
      |     (instr('0123456789abcdef', substr(md5(doc_id || ''), 2, 1)) - 1)) % 100
      |      AS bucket
      |  FROM {T})
      |ORDER BY doc_id""".stripMargin

  /** LP10: oracle-checked deterministic dataset split (md5 route). */
  val lp10SplitMd5: Q = (s, d) => {
    documents(s, d).createOrReplaceTempView("graft_documents")
    s.sql(splitSql.replace("{T}", "graft_documents"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lc_dup_clusters" -> lcDupClusters,
    "lp24_cluster_safe_split" -> lp24ClusterSafeSplit,
    "lc2_cluster_dedup" -> lc2ClusterDedup,
    "q13_recursive_cte" -> q13RecursiveCte,
    "j9b_band_join_binned" -> j9bBandJoinBinned,
    "lp3_upsert" -> lp3Upsert,
    "lp5_hash_sample" -> lp5HashSample,
    "lp6_shard_manifest" -> lp6ShardManifest,
    "lp4_pack_sequences" -> lp4PackSequences,
    "lp8_chunk_docs" -> lp8ChunkDocs,
    "lp9_compact" -> lp9Compact,
    "s11_schema_evolution" -> s11SchemaEvolution,
    "q15_relational_division" -> q15RelationalDivision,
    "l2b_minhash_banding" -> l2bMinhashBanding,
    "ls2_simhash_md5" -> ls2SimhashMd5,
    "lp10_split_md5" -> lp10SplitMd5)

  /** The shared recursive closure over the near-dup edge set (DuckDB
    * side). Kept as one text so lc and lc2 cannot drift apart.
    */
  private val ccOracleCtes: String =
    """WITH RECURSIVE edges AS (
      |  SELECT a.vec_id AS s, b.vec_id AS t
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
      |                         CAST(a.embedding AS DOUBLE[])) > 0
      |    AND list_dot_product(CAST(b.embedding AS DOUBLE[]),
      |                         CAST(b.embedding AS DOUBLE[])) > 0
      |    AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                               CAST(b.embedding AS DOUBLE[])) >= 0.95
      |),
      |sym AS (SELECT s, t FROM edges UNION ALL SELECT t, s FROM edges),
      |reach(id, lbl) AS (
      |  SELECT vec_id, vec_id FROM embeddings
      |  UNION
      |  SELECT sym.t, reach.lbl FROM reach JOIN sym ON sym.s = reach.id
      |),
      |comp AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id)""".stripMargin

  /** Oracle-side md5-banding candidate CTE chain (ends in `cand`
    * (a_id, b_id)) — the DuckDB twin of [[md5BandCandidates]], shared by
    * the l2b registry row and lg_pagerank's replay so the two orbits of
    * the same graph cannot drift. `mat = true` pins every CTE AS
    * MATERIALIZED for consumers that re-reference `cand` repeatedly
    * (the 10-round pagerank replay) — DuckDB inlines plain CTEs and the
    * re-expansion of the banding pipeline per round would be ruinous.
    */
  private[queries] def md5CandCteSql(mat: Boolean = false): String = {
    val m = if (mat) "MATERIALIZED " else ""
    s"""words AS $m(
       |  SELECT doc_id, string_split_regex(
       |    regexp_replace(lower(text), '^\\W+|\\W+$$', '', 'g'), '\\W+') AS w
       |  FROM documents
       |),
       |toks AS $m(
       |  SELECT DISTINCT doc_id,
       |    array_to_string(list_slice(w, i, i + 2), ' ') AS tok
       |  FROM (SELECT doc_id, w,
       |          unnest(range(1, len(w) - 1)) AS i FROM words)
       |),
       |h AS $m(
       |  SELECT doc_id, i, min(md5(CAST(i AS VARCHAR) || ':' || tok)) AS sig
       |  FROM toks CROSS JOIN (SELECT unnest(range(8)) AS i)
       |  GROUP BY doc_id, i
       |),
       |b AS $m(
       |  SELECT doc_id, CAST(floor(i / 4) AS BIGINT) AS band,
       |    max(CASE WHEN i % 4 = 0 THEN sig END) || '|' ||
       |    max(CASE WHEN i % 4 = 1 THEN sig END) || '|' ||
       |    max(CASE WHEN i % 4 = 2 THEN sig END) || '|' ||
       |    max(CASE WHEN i % 4 = 3 THEN sig END) AS bkey
       |  FROM h GROUP BY doc_id, band
       |),
       |cand AS $m(
       |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
       |  FROM b x JOIN b y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
       |)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "lc_dup_clusters" ->
      s"""$ccOracleCtes
         |SELECT id AS vec_id, lbl AS cluster_id FROM comp ORDER BY vec_id""".stripMargin,
    // identical cluster closure + identical md5 gate on the label; a
    // split that could straddle a component cannot match this oracle
    "lp24_cluster_safe_split" ->
      s"""$ccOracleCtes
         |SELECT id AS vec_id, lbl AS cluster_id,
         |  CASE WHEN (instr('0123456789abcdef', substr(md5(lbl || 'csplit'), 1, 1)) - 1) < 13
         |       THEN 'train' ELSE 'test' END AS split
         |FROM comp ORDER BY vec_id""".stripMargin,
    "lc2_cluster_dedup" ->
      s"""$ccOracleCtes
         |SELECT count(DISTINCT lbl) AS n_clusters,
         |  count(CASE WHEN id <> lbl THEN 1 END) AS n_dropped,
         |  count(*) AS n_total
         |FROM comp""".stripMargin,
    "q13_recursive_cte" -> q13Sql(""),
    "j9b_band_join_binned" ->
      """SELECT a.o_orderkey AS a_key, b.o_orderkey AS b_key,
        |  round(abs(a.o_totalprice - b.o_totalprice), 4) AS diff4
        |FROM orders a JOIN orders b
        |  ON a.o_orderkey < b.o_orderkey
        |  AND abs(a.o_totalprice - b.o_totalprice) <= 0.5
        |ORDER BY a_key, b_key""".stripMargin,
    "lp3_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |),
        |upd AS (
        |  SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice,
        |         '0-UPDATED' AS o_orderpriority
        |  FROM base WHERE o_orderkey % 100 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_totalprice, '0-INSERTED'
        |  FROM base WHERE o_orderkey % 97 = 0
        |),
        |merged AS (
        |  SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
        |    CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
        |         ELSE b.o_totalprice END AS o_totalprice,
        |    CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderpriority
        |         ELSE b.o_orderpriority END AS o_orderpriority
        |  FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
        |)
        |SELECT o_orderpriority, count(*) AS n_rows,
        |  round(sum(o_totalprice), 4) AS sum_price
        |FROM merged GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "lp5_hash_sample" ->
      """SELECT doc_id, md5(text) AS rk FROM documents
        |ORDER BY rk, doc_id LIMIT 50""".stripMargin,
    "lp6_shard_manifest" ->
      """SELECT substr(md5(text), 1, 1) AS shard, count(*) AS n_docs,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars_sum
        |FROM documents GROUP BY shard ORDER BY shard""".stripMargin,
    "lp9_compact" ->
      """SELECT doc_id, n_chars FROM documents ORDER BY doc_id""",
    "lp10_split_md5" -> splitSql.replace("{T}", "documents"),
    "ls2_simhash_md5" ->
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, tok FROM (
         |    SELECT doc_id,
         |      unnest(string_split_regex(
         |        regexp_replace(lower(text), '^\\W+|\\W+$$', '', 'g'), '\\W+')) AS tok
         |    FROM documents)
         |  WHERE length(tok) > 0
         |)
         |SELECT doc_id,
         |  $simhashTerms AS simhash16
         |FROM toks GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "l2b_minhash_banding" ->
      ("WITH " + md5CandCteSql() +
        "\nSELECT a_id, b_id FROM cand ORDER BY a_id, b_id"),
    "s11_schema_evolution" ->
      """SELECT n_nationkey, n_name,
        |  CASE WHEN n_nationkey >= 10 THEN n_regionkey END AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q15_relational_division" ->
      """SELECT o_custkey AS c_custkey FROM orders
        |GROUP BY o_custkey
        |HAVING count(DISTINCT o_orderpriority) =
        |  (SELECT count(DISTINCT o_orderpriority) FROM orders)
        |ORDER BY c_custkey""".stripMargin,
    "lp8_chunk_docs" ->
      """SELECT doc_id, start,
        |  substr(text, CAST(start + 1 AS INTEGER), 256) AS chunk,
        |  CAST(length(substr(text, CAST(start + 1 AS INTEGER), 256)) AS INTEGER)
        |    AS chunk_len
        |FROM (
        |  SELECT doc_id, text,
        |    unnest(generate_series(CAST(0 AS BIGINT),
        |      CAST(length(text) AS BIGINT) - 1, CAST(200 AS BIGINT))) AS start
        |  FROM documents WHERE length(text) > 0)
        |ORDER BY doc_id, start""".stripMargin)
}
