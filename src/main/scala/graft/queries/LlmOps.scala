package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.functions.VectorFunctions
import graft.operators.{Multimodal, Similarity, TextOps}

/** LLM-data-pipeline operators (SURVEY.md §2.10): dedup (exact, MinHash,
  * SimHash, n-gram Jaccard), similarity search (brute force + LSH ANN),
  * text analysis (language ID, quality, token counting, fingerprinting,
  * TF-IDF), and multimodal column plumbing.
  *
  * Randomised ops (MinHash/LSH/SimHash) are rows-only checked here and
  * property-tested in the spec suite; everything else carries a DuckDB
  * oracle.
  */
object LlmOps extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** L1: exact dedup by content hash (representative + multiplicity). */
  val l1ExactDedup: Q = (s, d) =>
    TextOps.exactDedup(documents(s, d), "doc_id", "text")
      .orderBy("content_sha256")

  /** L2 (no-oracle): from-scratch MinHash banding candidates. */
  val l2MinhashCandidates: Q = (s, d) =>
    TextOps.minHashCandidates(documents(s, d), "doc_id", "text")
      .orderBy("a_id", "b_id")

  /** L3: value-bearing cosine pairs at a low threshold (validates kernel
    * numerics; q9 is the same shape at the headline 0.9 threshold). */
  val l3CosinePairs: Q = (s, d) => {
    val e = embeddings(s, d).where(col("vec_id") < 100)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", VectorFunctions.cosineSim(col("a_emb"), col("b_emb")))
      .where(col("cos") > 0.2)
      .select(col("a_id"), col("b_id"), r4(col("cos")).as("cos4"))
      .orderBy("a_id", "b_id")
  }

  /** L3 primary at-scale route: the SAME pair set as l3_cosine_pairs but
    * through the bucketed IVF-multiprobe candidate generator
    * (Similarity.exactNearDupPairs — recall 1.0 by triangle inequality,
    * candidates via plain equi-join on `cell`, never a broadcast
    * nested-loop over all pairs). The brute-force l3 stays registered as
    * the verification shape; this is the route a 100 TB corpus runs. */
  val l3bCosineBucketed: Q = (s, d) => {
    val e = embeddings(s, d).where(col("vec_id") < 100)
    Similarity.exactNearDupPairs(e, threshold = 0.2, nlist = 8)
      .where(col("cos") > 0.2)
      .select(col("a_id"), col("b_id"), r4(col("cos")).as("cos4"))
      .orderBy("a_id", "b_id")
  }

  /** L4: exact top-3 neighbours per query vector. */
  val l4TopkNeighbors: Q = (s, d) => {
    val e = embeddings(s, d)
    Similarity.bruteForceTopK(e.where(col("vec_id") < 100), e, 3)
      .select(col("q_id"), col("c_id"), r4(col("cos")).as("cos4"), col("rn"))
      .orderBy("q_id", "rn")
  }

  /** L4b: identical top-k semantics through the bounded-heap aggregate —
    * shuffle carries k entries per query vector, not every scored pair. */
  val l4bTopkAgg: Q = (s, d) => {
    val e = embeddings(s, d)
    Similarity.bruteForceTopKAgg(e.where(col("vec_id") < 100), e, 3)
      .select(col("q_id"), col("c_id"), r4(col("cos")).as("cos4"), col("rn"))
      .orderBy("q_id", "rn")
  }

  /** L4 primary at-scale route: IVF-bucketed top-k through the
    * bounded-heap aggregate — equi-join candidates, no corpus broadcast,
    * map-side-bounded shuffle. nprobe = nlist makes it exact, so it
    * hash-checks against the same brute-force oracle as l4/l4b. */
  val l4cTopkBucketed: Q = (s, d) => {
    val e = embeddings(s, d)
    Similarity.ivfTopKAgg(e.where(col("vec_id") < 100), e, 3, nlist = 8, nprobe = 8)
      .select(col("q_id"), col("c_id"), r4(col("cos")).as("cos4"), col("rn"))
      .orderBy("q_id", "rn")
  }

  /** L5 (no-oracle): LSH ANN top-3; recall is property-tested. */
  val l5AnnLsh: Q = (s, d) =>
    Similarity.annTopK(embeddings(s, d).where(col("vec_id") < 50), 3)
      .orderBy("q_id", "rn")

  /** L6: tokenization (SQL route; RegexTokenizer covered in ML specs). */
  val l6Tokenize: Q = (s, d) =>
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        element_at(col("toks"), 1).as("first_tok"),
        element_at(col("toks"), -1).as("last_tok"))
      .orderBy("doc_id")

  /** L7: corpus word count. */
  val l7Wordcount: Q = (s, d) =>
    documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .where(col("n") >= 20)
      .orderBy("tok")

  /** L8: bigram counts. */
  val l8Ngrams: Q = (s, d) =>
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .where(col("n") >= 5)
      .orderBy("bigram")

  /** X3 full-custom tier: the same bigram counts as L8 but through the
    * custom Catalyst Generator `explode_ngrams` (a real UDTF, not a
    * composition of transform+explode) — the oracle is identical to
    * l8_ngrams, so the Generate mechanism itself is hash-checked. */
  val lxExplodeNgrams: Q = (s, d) => {
    org.apache.spark.sql.graft.GraftExtensions.register(s)
    documents(s, d).createOrReplaceTempView("graft_docs_ngram")
    s.sql(
      """SELECT ngram AS bigram, count(*) AS n
        |FROM (SELECT explode_ngrams(text, 2) AS ngram FROM graft_docs_ngram) t
        |GROUP BY ngram HAVING count(*) >= 5 ORDER BY bigram""".stripMargin)
  }

  /** L9: TF-IDF with the explicit (oracle-checkable) formula
    * tfidf = tf * (ln((N + 1) / (df + 1)) + 1). */
  val l9TfidfSql: Q = (s, d) => {
    val docs = documents(s, d)
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    // df derives from tf — one row per (doc_id, tok) after the groupBy,
    // so count(*) per tok ≡ count(DISTINCT doc_id); saves the second
    // explode+distinct corpus pass (same rewrite as ls3Weights)
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .where(col("doc_id") < 20)
      .select(
        col("doc_id"), col("tok"),
        r4(col("tf") * (log((col("n_docs") + 1) / (col("df") + 1.0)) + 1)).as("tfidf"))
      .orderBy("doc_id", "tok")
  }

  /** L10: per-language corpus stats. */
  val l10TextStats: Q = (s, d) =>
    documents(s, d)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        r4(avg("n_chars")).as("avg_chars"),
        r4(avg(size(split(col("text"), " ")))).as("avg_tokens"),
        r4(avg(array_contains(split(col("text"), " "), "spark").cast("int"))).as("spark_rate"))
      .orderBy("lang")

  /** L11: multimodal join — text table ⋈ embedding table by id. */
  val l11MultimodalJoin: Q = (s, d) =>
    documents(s, d)
      .join(embeddings(s, d), col("doc_id") === col("vec_id"))
      .select(
        col("doc_id"), col("n_chars"), col("label"),
        r4(VectorFunctions.l2Norm(col("embedding"))).as("emb_norm"))
      .orderBy("doc_id")

  /** Language-ID heuristic (stopword hit argmax). */
  val lgLangid: Q = (s, d) =>
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"), col("lang"),
        TextOps.langIdHits(col("toks"), "en").as("hits_en"),
        TextOps.langIdPredict(col("toks")).as("predicted"))
      .orderBy("doc_id")

  /** Quality score pre-filter. */
  val lqQualityScore: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"), TextOps.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** Token counting: whitespace + BPE-ish regex segmentation. */
  val ltTokenCount: Q = (s, d) =>
    TextOps.tokenCounts(documents(s, d), "text")
      .select("doc_id", "n_ws_tokens", "n_bpe_tokens")
      .orderBy("doc_id")

  /** Rolling-hash document fingerprint. */
  val lfFingerprint: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** N-gram Jaccard near-dup scores between same-language docs. */
  val ljNgramJaccard: Q = (s, d) => {
    val docs = documents(s, d).where(col("doc_id") < 40)
      .withColumn("grams", array_distinct(expr(
        "transform(sequence(0, size(split(text, ' ')) - 2), " +
        "i -> concat(split(text, ' ')[i], ' ', split(text, ' ')[i + 1]))")))
    val a = docs.select(col("doc_id").as("a_id"), col("lang"), col("grams").as("a_g"))
    val b = docs.select(col("doc_id").as("b_id"), col("lang"), col("grams").as("b_g"))
    a.join(b, Seq("lang")).where(col("a_id") < col("b_id"))
      .select(
        col("a_id"), col("b_id"),
        r4(size(array_intersect(col("a_g"), col("b_g"))).cast("double") /
           size(array_union(col("a_g"), col("b_g")))).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** Embedding-cosine near-dup dedup: vectors with a near-duplicate at
    * cos >= threshold keep only the lowest id as representative.
    * Candidates come from the bucketed IVF-multiprobe route (recall 1.0
    * by triangle inequality — see Similarity.exactNearDupPairs), then the
    * exact codegen cosine verifies on the original vectors, so the result
    * is identical to all-pairs without an O(n²) broadcast nested-loop. */
  val ldEmbeddingDedup: Q = (s, d) => {
    val e = embeddings(s, d)
    val dropped = Similarity.exactNearDupPairs(e, threshold = 0.95, nlist = 8)
      .select(col("b_id").as("vec_id")).distinct()
    e.join(dropped, Seq("vec_id"), "left_anti")
      .agg(count(lit(1)).as("n_kept"))
  }

  /** Deterministic hash split counts (rows-only: xxhash64 is engine-
    * specific so DuckDB can't recompute membership; the stability and
    * disjointness laws live in LlmOpsSpec). */
  val lpHashSplit: Q = (s, d) =>
    TextOps.hashSplit(documents(s, d), "doc_id")
      .groupBy("split").agg(count(lit(1)).as("n_docs"))
      .orderBy("split")

  /** Stratified sample counts (rows-only: Bernoulli draws are engine-
    * specific; the proportion and determinism laws live in LlmOpsSpec).
    * sampleBy draws per-stratum Bernoulli — the class-rebalancing
    * primitive; for split assignment that must survive reprocessing use
    * TextOps.hashSplit instead. */
  val lp2StratifiedSample: Q = (s, d) => {
    val docs = documents(s, d)
    val langs = Seq("en", "de", "fr", "es", "zh") // fixture strata
    val fractions = langs.map(l => l -> 0.5).toMap
    // driver-verified via the pinned-flag pattern: exact stratum totals
    // bit-checked, and the seeded draw's fraction pinned inside a
    // 4-sigma binomial band around the target 0.5 (plus 2% absolute
    // slack for tiny strata) — deterministic for a fixed seed, so the
    // flag cannot flake
    val sampled = docs.stat.sampleBy("lang", fractions, 42L)
      .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
    docs.where(col("lang").isin(langs: _*))
      .groupBy("lang").agg(count(lit(1)).as("n_total"))
      .join(sampled, Seq("lang"), "left")
      .select(col("lang"), col("n_total"),
        (abs(coalesce(col("n_sampled"), lit(0L)) / col("n_total") - 0.5d) <=
          lit(4.0) * sqrt(lit(0.25) / col("n_total")) + lit(0.02)).as("frac_ok"))
      .orderBy("lang")
  }

  /** Heavy-hitter vocabulary via the Misra-Gries TypedImperativeAggregate
    * (X4). With capacity far above the distinct-token count the sketch is
    * exact, so the oracle is plain top-k word count. */
  val lhHeavyHitters: Q = (s, d) =>
    documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(org.apache.spark.sql.graft.HeavyHitters.topK(col("tok"), 4096, 10).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term").as("term"), col("e.min_count").as("n"))
      .orderBy("term")

  /** IVF ANN (rows-only): KMeans coarse quantizer + nprobe cell search.
    * All-queries form — the kNN-GRAPH construction workload (l4c is the
    * bounded-query serving twin). nlist grows with corpus size so cells
    * stay ~512 vectors and candidate volume is O(n·nprobe·512), LINEAR
    * in n — a fixed nlist makes cells O(n) and the search O(n²), which
    * is exactly the r13 sf1 slope breach (5.4 s → 193 s on 10×). The
    * quantizer fit is bounded the same way: a seeded ≤8192-row sample,
    * so KMeans cost is O(nlist·8192·dim), never O(nlist·n). Below
    * n = 4096 both knobs hit their floors (nlist = 8, full fit), so
    * every driver-checked SF (≤2000 vectors) is bit-identical to the
    * fixed-constant form. */
  val liIvfAnn: Q = (s, d) => {
    val e = embeddings(s, d)
    val n = math.max(1L, e.count()) // metadata-only count
    val nlist = math.max(8L, (n + 511L) / 512L).toInt
    val fitFrac = math.min(1.0, 8192.0 / n)
    Similarity.ivfTopK(e, 3, nlist = nlist, nprobe = 3,
      fitSampleFraction = fitFrac)
      .orderBy("q_id", "rn")
  }

  /** SimHash signatures (no-oracle: xxhash64 seeds are engine-specific). */
  val lsSimhash: Q = (s, d) =>
    TextOps.simHash(documents(s, d), "doc_id", "text")
      .orderBy("_id")

  /** Multimodal feature extraction through the mapPartitions decode
    * boundary (stub decoder = byte stats, so SQL can oracle it). */
  val lmMultimodalFeatures: Q = (s, d) => {
    val withBin = documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    Multimodal.withMediaFeatures(withBin, "content")
      .select(
        col("doc_id"),
        element_at(col("media_features"), 1).cast("long").as("n_bytes"),
        Orc.rN(element_at(col("media_features"), 2).cast("double"), 2).as("mean_byte"),
        element_at(col("media_features"), 3).cast("int").as("min_byte"),
        element_at(col("media_features"), 4).cast("int").as("max_byte"))
      .orderBy("doc_id")
  }

  /** L11b: a REAL BinaryType column end-to-end — deterministic binary
    * payloads (sha256 digests of the fixture text) written to parquet,
    * read back, and pushed through the mapPartitions decoder boundary.
    * Unlike lm_multimodal_features (binary built in-query), this
    * exercises BinaryType through the parquet sink/source round-trip,
    * which is the storage path a 100 TB media corpus lives on. The
    * oracle recomputes the digest bytes from hex in DuckDB, so the
    * decode plumbing is hash-checked, not just row-counted. */
  val l11bMediaFeatures: Q = (s, d) => {
    val out = new java.io.File("target/tmp/l11b_bin").getAbsolutePath
    documents(s, d)
      .select(col("doc_id"), unhex(sha2(col("text"), 256)).as("content"))
      .write.mode("overwrite").parquet(out)
    Multimodal.withMediaFeatures(s.read.parquet(out), "content")
      .select(
        col("doc_id"),
        element_at(col("media_features"), 1).cast("long").as("n_bytes"),
        Orc.rN(element_at(col("media_features"), 2).cast("double"), 2).as("mean_byte"),
        element_at(col("media_features"), 3).cast("int").as("min_byte"),
        element_at(col("media_features"), 4).cast("int").as("max_byte"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "l1_exact_dedup" -> l1ExactDedup,
    "l2_minhash_candidates" -> l2MinhashCandidates,
    "l3_cosine_pairs" -> l3CosinePairs,
    "l3b_cosine_pairs_bucketed" -> l3bCosineBucketed,
    "l4_topk_neighbors" -> l4TopkNeighbors,
    "l4b_topk_agg" -> l4bTopkAgg,
    "l4c_topk_bucketed" -> l4cTopkBucketed,
    "l5_ann_lsh" -> l5AnnLsh,
    "li_ivf_ann" -> liIvfAnn,
    "ld_embedding_dedup" -> ldEmbeddingDedup,
    "lh_heavy_hitters" -> lhHeavyHitters,
    "l6_tokenize" -> l6Tokenize,
    "l7_wordcount" -> l7Wordcount,
    "l8_ngrams" -> l8Ngrams,
    "lx_explode_ngrams" -> lxExplodeNgrams,
    "l9_tfidf_sql" -> l9TfidfSql,
    "l10_text_stats" -> l10TextStats,
    "l11_multimodal_join" -> l11MultimodalJoin,
    "lg_langid" -> lgLangid,
    "lq_quality_score" -> lqQualityScore,
    "lt_token_count" -> ltTokenCount,
    "lf_fingerprint" -> lfFingerprint,
    "lj_ngram_jaccard" -> ljNgramJaccard,
    "ls_simhash" -> lsSimhash,
    "lp_hash_split" -> lpHashSplit,
    "lp2_stratified_sample" -> lp2StratifiedSample,
    "lm_multimodal_features" -> lmMultimodalFeatures,
    "l11b_media_features" -> l11bMediaFeatures,
  )

  val oracleSql: Map[String, String] = Map(
    // exact stratum totals bit-checked; the seeded draw's fraction flag
    // is pinned to literal TRUE (a29 pattern)
    "lp2_stratified_sample" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_total, true AS frac_ok
        |FROM documents WHERE lang IN ('en', 'de', 'fr', 'es', 'zh')
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "l1_exact_dedup" ->
      """SELECT sha256(text) AS content_sha256, min(doc_id) AS keep_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY content_sha256""".stripMargin,
    "ld_embedding_dedup" ->
      """SELECT count(*) AS n_kept FROM embeddings
        |WHERE vec_id NOT IN (
        |  SELECT DISTINCT b.vec_id
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])) >= 0.95)""".stripMargin,
    "lh_heavy_hitters" ->
      """SELECT tok AS term, CAST(n AS BIGINT) AS n FROM (
        | SELECT tok, count(*) AS n,
        |  row_number() OVER (ORDER BY count(*) DESC, tok ASC) AS rn
        | FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        | GROUP BY tok) s
        |WHERE rn <= 10 ORDER BY term""".stripMargin,
    "l3_cosine_pairs" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                              CAST(b.embedding AS DOUBLE[])), 4) AS cos4
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 100 AND b.vec_id < 100
        |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) > 0.2
        |ORDER BY a_id, b_id""".stripMargin,
    "l3b_cosine_pairs_bucketed" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                              CAST(b.embedding AS DOUBLE[])), 4) AS cos4
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 100 AND b.vec_id < 100
        |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) > 0.2
        |ORDER BY a_id, b_id""".stripMargin,
    "l4c_topk_bucketed" ->
      """SELECT q_id, c_id, round(cos, 4) AS cos4, CAST(rn AS INT) AS rn FROM (
        | SELECT a.vec_id AS q_id, b.vec_id AS c_id,
        |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                         CAST(b.embedding AS DOUBLE[])) AS cos,
        |  row_number() OVER (PARTITION BY a.vec_id
        |    ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])) DESC,
        |             b.vec_id ASC) AS rn
        | FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        | WHERE a.vec_id < 100) t
        |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin,
    "l4_topk_neighbors" ->
      """SELECT q_id, c_id, round(cos, 4) AS cos4, CAST(rn AS INT) AS rn FROM (
        | SELECT a.vec_id AS q_id, b.vec_id AS c_id,
        |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                         CAST(b.embedding AS DOUBLE[])) AS cos,
        |  row_number() OVER (PARTITION BY a.vec_id
        |    ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])) DESC,
        |             b.vec_id ASC) AS rn
        | FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        | WHERE a.vec_id < 100) t
        |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin,
    "l4b_topk_agg" ->
      """SELECT q_id, c_id, round(cos, 4) AS cos4, CAST(rn AS INT) AS rn FROM (
        | SELECT a.vec_id AS q_id, b.vec_id AS c_id,
        |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                         CAST(b.embedding AS DOUBLE[])) AS cos,
        |  row_number() OVER (PARTITION BY a.vec_id
        |    ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])) DESC,
        |             b.vec_id ASC) AS rn
        | FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        | WHERE a.vec_id < 100) t
        |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin,
    "l6_tokenize" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        | string_split(text, ' ')[1] AS first_tok,
        | string_split(text, ' ')[len(string_split(text, ' '))] AS last_tok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "l7_wordcount" ->
      """SELECT tok, count(*) AS n FROM (
        | SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        |GROUP BY tok HAVING count(*) >= 20 ORDER BY tok""".stripMargin,
    "l8_ngrams" ->
      """SELECT bigram, count(*) AS n FROM (
        | SELECT unnest(list_transform(range(len(string_split(text, ' ')) - 1),
        |   i -> string_split(text, ' ')[CAST(i + 1 AS INT)] || ' ' ||
        |        string_split(text, ' ')[CAST(i + 2 AS INT)])) AS bigram
        | FROM documents) t
        |GROUP BY bigram HAVING count(*) >= 5 ORDER BY bigram""".stripMargin,
    "lx_explode_ngrams" ->
      """SELECT bigram, count(*) AS n FROM (
        | SELECT unnest(list_transform(range(len(string_split(text, ' ')) - 1),
        |   i -> string_split(text, ' ')[CAST(i + 1 AS INT)] || ' ' ||
        |        string_split(text, ' ')[CAST(i + 2 AS INT)])) AS bigram
        | FROM documents) t
        |GROUP BY bigram HAVING count(*) >= 5 ORDER BY bigram""".stripMargin,
    "l9_tfidf_sql" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT tok, count(*) AS df
        |          FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, tok,
        | round(tf * (ln((n_docs + 1) / (df + 1.0)) + 1), 4) AS tfidf
        |FROM tf JOIN dfreq USING (tok) CROSS JOIN n
        |WHERE doc_id < 20
        |ORDER BY doc_id, tok""".stripMargin,
    "l10_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | round(avg(n_chars), 4) AS avg_chars,
        | round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
        | round(avg(CAST(list_contains(string_split(text, ' '), 'spark') AS INT)), 4) AS spark_rate
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "l11_multimodal_join" ->
      """SELECT doc_id, n_chars, label,
        | round(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
        |   x -> x * x), 'sum')), 4) AS emb_norm
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id""".stripMargin,
    "lg_langid" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |h AS (SELECT doc_id, lang,
        |  len(list_intersect(toks, ['the','a','of','and','to'])) AS h_en,
        |  len(list_intersect(toks, ['der','die','das','und','zu'])) AS h_de,
        |  len(list_intersect(toks, ['el','la','de','y','que'])) AS h_es,
        |  len(list_intersect(toks, ['le','la','de','et','que'])) AS h_fr
        | FROM t)
        |SELECT doc_id, lang, CAST(h_en AS INT) AS hits_en,
        | CASE WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
        |      WHEN h_en = greatest(h_en, h_de, h_es, h_fr) THEN 'en'
        |      WHEN h_de = greatest(h_en, h_de, h_es, h_fr) THEN 'de'
        |      WHEN h_es = greatest(h_en, h_de, h_es, h_fr) THEN 'es'
        |      ELSE 'fr' END AS predicted
        |FROM h ORDER BY doc_id""".stripMargin,
    "lq_quality_score" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id,
        |  least(length(text) / 200.0, 1.0) AS len_score,
        |  (length(text) - (len(toks) - 1)) / CAST(len(toks) AS DOUBLE) AS mean_tok_len,
        |  len(list_intersect(toks, ['the','a','of','and','to'])) / CAST(len(toks) AS DOUBLE) AS stop_ratio
        | FROM t)
        |SELECT doc_id,
        | round(len_score * 0.4 +
        |       (CASE WHEN mean_tok_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3 +
        |       least(stop_ratio * 10.0, 1.0) * 0.3, 4) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
    "lt_token_count" ->
      """SELECT doc_id,
        | CAST(len(string_split_regex(text, '\s+')) AS INT) AS n_ws_tokens,
        | CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "lf_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(range(length(text)),
        |     i -> CAST(ascii(substring(text, CAST(i + 1 AS INT), 1)) AS BIGINT))),
        |   (h, c) -> (h * 31 + c) % 2147483647) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "lj_ngram_jaccard" ->
      """WITH g AS (
        | SELECT doc_id, lang,
        |  list_distinct(list_transform(range(len(string_split(text, ' ')) - 1),
        |   i -> string_split(text, ' ')[CAST(i + 1 AS INT)] || ' ' ||
        |        string_split(text, ' ')[CAST(i + 2 AS INT)])) AS grams
        | FROM documents WHERE doc_id < 40)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        | round(len(list_intersect(a.grams, b.grams)) /
        |       CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE), 4) AS jaccard
        |FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |ORDER BY a_id, b_id""".stripMargin,
    "l11b_media_features" ->
      """WITH h AS (SELECT doc_id, sha256(text) AS hex FROM documents),
        |c AS (SELECT doc_id,
        |  list_transform(range(32), i ->
        |    (strpos('0123456789abcdef', substring(hex, CAST(2*i + 1 AS INT), 1)) - 1) * 16 +
        |    (strpos('0123456789abcdef', substring(hex, CAST(2*i + 2 AS INT), 1)) - 1)) AS codes
        | FROM h)
        |SELECT doc_id,
        | CAST(32 AS BIGINT) AS n_bytes,
        | round(CAST(CAST(list_aggregate(codes, 'sum') / 32.0 AS FLOAT) AS DOUBLE), 2) AS mean_byte,
        | CAST(list_aggregate(codes, 'min') AS INT) AS min_byte,
        | CAST(list_aggregate(codes, 'max') AS INT) AS max_byte
        |FROM c ORDER BY doc_id""".stripMargin,
    "lm_multimodal_features" ->
      """WITH c AS (SELECT doc_id, text,
        |  list_transform(range(length(text)),
        |    i -> ascii(substring(text, CAST(i + 1 AS INT), 1))) AS codes
        | FROM documents)
        |SELECT doc_id,
        | CAST(length(text) AS BIGINT) AS n_bytes,
        | round(CAST(CAST(list_aggregate(codes, 'sum') / CAST(length(text) AS DOUBLE) AS FLOAT) AS DOUBLE), 2) AS mean_byte,
        | list_aggregate(codes, 'min') AS min_byte,
        | list_aggregate(codes, 'max') AS max_byte
        |FROM c ORDER BY doc_id""".stripMargin,
  )
}
