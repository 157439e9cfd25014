package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.operators.{GlobalRowId, ProductQuantizer}

/** Round-8 additions: the two scale paths the registry still lacked —
  * distributed global row numbering (no single-partition window) and
  * product-quantization ANN (the memory-compressed embedding search).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.10 (pipeline utilities, similarity search).
  */
object SurfaceR8 extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** LP19: global 0-based example ids over the corpus by doc_id —
    * result identical to `row_number() OVER (ORDER BY doc_id) − 1`
    * (the oracle) but computed with range partitions + per-partition
    * offsets; the only single-partition funnel is the numPartitions-row
    * offset cumsum (asserted by SurfaceR8Spec). */
  val lp19GlobalRowid: Q = (s, d) =>
    GlobalRowId.withRowId(
      documents(s, d).select("doc_id"), "doc_id", numPartitions = 8)
      .select(col("doc_id"), col("rowid"))
      .orderBy("doc_id")

  /** LPQ: PQ-ADC shortlist + exact re-rank, top-10 for a deterministic
    * 8-query batch — the production ANN shape over compressed codes.
    * No SQL oracle (k-means model family); the seeded fits make the
    * result stable, and SurfaceR8Spec bounds recall@10 against the
    * exact brute-force baseline for both the raw ADC ranking and this
    * re-ranked route. Exact cosine scores round through r4 like every
    * other emitted double. */
  val lpqPqAnn: Q = (s, d) => {
    val corpus = embeddings(s, d)
    val queries = corpus.where(col("vec_id") % 67 === 0)
    ProductQuantizer.pqTopKRerank(queries, corpus, k = 10)
      .select(col("q_id"), col("c_id"), col("rn"), Orc.r4(col("cos")).as("cos"))
      .orderBy("q_id", "rn")
  }

  /** L13b: contamination with a BLOOM-FILTER prefilter — the shape l13's
    * doc-comment promises for when the eval-gram set outgrows the
    * broadcast threshold. Spark ships distributed bloom build/probe
    * expressions for its internal runtime filtering but leaves them
    * unregistered; GraftExtensions surfaces them as `bloom_agg` /
    * `bloom_might_contain`. The filter is built by a partial-merged
    * aggregate over the bench grams (scalar subquery → embedded literal,
    * effectively broadcast at a fraction of the hash-set size), probed as
    * a pushed-down scan predicate on the corpus grams, and the EXACT join
    * behind it removes the false positives — so the result is
    * bit-identical to l13 (same DuckDB oracle) while the join's shuffle
    * only carries rows the bloom let through. SurfaceR8Spec asserts the
    * probe actually sits in the physical plan. */
  val l13bContaminationBloom: Q = (s, d) => {
    documents(s, d).createOrReplaceTempView("graft_r8_docs")
    s.sql(
      """WITH words AS (
        |  SELECT doc_id, split(text, ' ') AS w FROM graft_r8_docs
        |  WHERE length(text) > 0 AND size(split(text, ' ')) >= 3
        |),
        |grams AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id, explode(transform(sequence(0, size(w) - 3),
        |      i -> array_join(slice(w, i + 1, 3), ' '))) AS g
        |    FROM words)
        |),
        |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
        |SELECT t.doc_id, count(DISTINCT t.g) AS n_shared_grams
        |FROM grams t JOIN bench b ON t.g = b.g
        |WHERE t.doc_id % 97 <> 0
        |  AND bloom_might_contain(
        |        (SELECT bloom_agg(xxhash64(g), 100000L) FROM bench),
        |        xxhash64(t.g))
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin)
  }

  /** DQ: Deequ-style data-quality constraint suite as ONE aggregation
    * pass — completeness, key uniqueness, bounds, and accepted-values
    * checks computed together (shared scan, partial-aggregated), then
    * unpivoted to one row per constraint. At 100 TB the whole suite costs
    * a single corpus scan regardless of how many constraints it carries —
    * the property that makes per-ingest validation affordable. */
  val dqConstraints: Q = (s, d) =>
    lineitem(s, d)
      .agg(
        count(lit(1)).as("n"),
        count(col("l_quantity")).as("n_qty"),
        countDistinct(col("l_orderkey") * 10 + col("l_linenumber")).as("n_key"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        sum(when(col("l_returnflag").isin("A", "N", "R"), 0L).otherwise(1L)).as("bad_flag"),
        sum(when(col("l_extendedprice") < 0, 1L).otherwise(0L)).as("neg_price"))
      .selectExpr(
        """stack(5,
          |  'completeness_l_quantity', CAST(n_qty AS DOUBLE) / n, n_qty = n,
          |  'uniqueness_order_line',   CAST(n_key AS DOUBLE) / n, n_key = n,
          |  'min_l_quantity_ge_1',     CAST(min_qty AS DOUBLE),   min_qty >= 1,
          |  'accepted_returnflags',    CAST(bad_flag AS DOUBLE),  bad_flag = 0,
          |  'nonneg_extendedprice',    CAST(neg_price AS DOUBLE), neg_price = 0
          |) AS (check_name, metric, passed)""".stripMargin)
      .select(col("check_name"), Orc.r4(col("metric")).as("metric"), col("passed"))
      .orderBy("check_name")

  /** LF2: fuzzy duplicate-key detection by BLOCKED edit distance — the
    * entity-resolution shape, in the order that scales: (1) canonicalize
    * to DISTINCT keys first (distinct names ≪ rows — here 64 vs 2000;
    * at 100 TB, millions vs trillions), (2) fuzzy-match the distinct
    * keys under a blocking equi-join (last name token) so the O(len²)
    * Levenshtein verifier never runs all-pairs, (3) map member counts
    * back per key. Exact-equal names are excluded (dist ≥ 1 — exact
    * dedup is l1's job); the output is the candidate merge table a
    * curation pass reviews. SurfaceR8Spec asserts no cartesian/BNLJ. */
  val lf2FuzzyPairs: Q = (s, d) => {
    val counts = part(s, d).groupBy("p_name").agg(count(lit(1)).as("n"))
    val names = counts.select(col("p_name"), col("n"),
      element_at(split(col("p_name"), " "), -1).as("blk"))
    names.as("a").join(names.as("b"),
        col("a.blk") === col("b.blk") &&
        col("a.p_name") < col("b.p_name"))
      .where(levenshtein(col("a.p_name"), col("b.p_name")).between(1, 3))
      .select(
        col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("dist"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .orderBy("name_a", "name_b")
  }

  /** LF3: Jaro–Winkler fuzzy pairs — the second entity-resolution
    * verifier next to lf2's Levenshtein: where edit distance counts
    * keystrokes, Jaro–Winkler rewards shared prefixes, the right metric
    * for catalog names ("aromatic azure" vs "aromatic beige"). The
    * kernel is the custom codegen expression `jaro_winkler` (no Scala
    * UDF — the verifier stays inside whole-stage codegen), semantics
    * pinned to DuckDB's `jaro_winkler_similarity` so the oracle compares
    * the actual similarity values, not just the pair set. Same scale
    * order as lf2: DISTINCT keys first, then a first-token blocking
    * equi-join (prefix similarity needs a shared prefix, so the block
    * key and the metric agree) — never all-pairs. Both engines filter on
    * the r8-ROUNDED similarity so the threshold cut is knife-edge-free
    * (§5.3). */
  val lf3JaroPairs: Q = (s, d) => {
    val names = part(s, d).select(col("p_name")).distinct()
      .select(col("p_name"), element_at(split(col("p_name"), " "), 1).as("blk"))
    names.as("a").join(names.as("b"),
        col("a.blk") === col("b.blk") && col("a.p_name") < col("b.p_name"))
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        Orc.rN(expr("jaro_winkler(a.p_name, b.p_name)"), 8).as("jw"))
      .where(col("jw") >= 0.8)
      .orderBy("name_a", "name_b")
  }

  /** M28: MAD outlier report — the robust z-score in aggregate form:
    * med = median(value), mad = median(|value − med|) per group, rows
    * flagged when |value − med| > 3·mad. The robust cousin of a
    * mean/stddev gate: one extreme value moves a mean arbitrarily but
    * moves a median at most one rank, so the fence itself cannot be
    * dragged by the outliers it is meant to catch. Two grouped exact
    * percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`) with the
    * group stats broadcast back; med/mad pass through the r8 grid BEFORE
    * the fence compare so both engines cut on identical values (§5.3). */
  val m28MadOutliers: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("event_type"), col("value"))
    val med = e.groupBy("event_type")
      .agg(Orc.rN(expr("percentile(value, 0.5D)"), 8).as("med"))
    // dev feeds TWO sequential aggregates (the mad percentile, then the
    // fence counts) — one eager materialization instead of re-running
    // the events scan + broadcast join per consumer (guide §5)
    val dev = e.join(broadcast(med), "event_type")
      .select(col("event_type"), col("med"),
        abs(col("value") - col("med")).as("adev"))
      .localCheckpoint(true)
    val mad = dev.groupBy("event_type")
      .agg(Orc.rN(expr("percentile(adev, 0.5D)"), 8).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("adev") > lit(3.0) * col("mad"), 1L).otherwise(0L)).as("n_outliers"),
        Orc.r4(min("med")).as("med"), Orc.r4(min("mad")).as("mad"))
      .orderBy("event_type")
  }

  /** LS3: sparse TF-IDF cosine top-k via an inverted-index join — the
    * at-scale TEXT similarity path, complementing the dense-embedding
    * family (l3/l4/l5/lpq): docs become (doc_id, term, weight) postings;
    * candidate pairs arise ONLY from the term-postings equi-join, so
    * docs sharing no term never meet — the inverted index IS the
    * blocking structure, no all-pairs stage exists at any scale. High-df
    * terms are pruned RELATIVE to corpus size (df ≤ 90% of docs, as
    * integer arithmetic — §5.3 decimal trap) exactly as production
    * inverted indexes drop stopwords: they contribute near-0 idf weight
    * but quadratic join fanout. (The synthetic fixture's 31-token
    * vocabulary keeps every term under that cutoff — the prune is
    * load-bearing on a Zipfian corpus, vacuous here, and an absolute
    * cutoff like df ≤ 100 empties this fixture entirely: its LEAST
    * common token appears in >100 docs.) Per-pair dot products are one
    * partial-agg sum over shared terms; norms are a per-doc agg joined
    * back. Weight formula text identical to l9 (same smoothed idf).
    * Ranking cuts on the r8-rounded cosine with an id tiebreak (§5.3). */
  val ls3TfidfTopk: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
    // the postings table feeds THREE consumers (norms, query side,
    // corpus side); without a materialization Catalyst re-derives the
    // whole explode→tf→idf pipeline per consumer (24 scans of
    // documents in the static plan). One eager localCheckpoint pins a
    // single computation — guide §5's persist-when-reused rule, same
    // mechanism as Components/PrefixSum.
    val wts = ls3Weights(s, d).localCheckpoint(true)
    val norms = wts.groupBy("doc_id").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    // Pair generation is arranged so NOTHING pair-scale ever crosses an
    // exchange (guide §2.3/§2.4): the QUERY postings (1/53 of docs)
    // broadcast; the corpus postings cluster by doc_id ONCE (a
    // postings-scale shuffle that replaces the old tok-keyed join
    // exchange — 31 hot keys, skew by construction). The join output is
    // then already clustered by c.doc_id, which satisfies
    // groupBy(q_id, c_id)'s distribution, so the per-pair dot aggregate
    // runs WITHOUT re-shuffling the ~8.4M fanout rows (the old plan
    // exchanged the pair-scale partials).
    //
    // The broadcast hint is SIZE-GATED (VERDICT r17 "what's wrong" #1 /
    // ADVICE r17): the query side is 1/53 of ALL postings — it grows
    // with the corpus, so an unconditional hint would force the build at
    // any scale, bypassing autoBroadcastJoinThreshold (~2 TB of build
    // side at 100 TB → driver OOM). wts is already materialized by the
    // localCheckpoint, so counting the query side is one cheap
    // column-pruned pass; 128 bytes/posting deliberately over-estimates
    // the in-memory relation (long + short token + double) so the gate
    // errs toward NOT broadcasting. Under the session threshold → the
    // r17 plan exactly (broadcast + doc_id clustering, zero pair-scale
    // exchange). Over it → no hint: the planner's shuffle join on tok is
    // the scale-safe fallback (the pair aggregate then pays its own
    // exchange — slower, never OOM).
    val qSide = wts.where(col("doc_id") % 53 === 0)
    val bcLimit = broadcastThresholdBytes(s)
    val qFits = bcLimit > 0 && qSide.count() * 128L <= bcLimit
    def gated(df: DataFrame): DataFrame = if (qFits) broadcast(df) else df
    val dots = gated(qSide).as("q")
      .join(wts.repartition(col("doc_id")).as("c"),
        col("q.tok") === col("c.tok") && col("q.doc_id") =!= col("c.doc_id"))
      .groupBy(col("q.doc_id").as("q_id"), col("c.doc_id").as("c_id"))
      .agg(sum(col("q.w") * col("c.w")).as("dot"))
    dots
      // query-side norms: pre-filtered to the query batch (doc_id % 53 —
      // the same predicate that defines qSide, so the inner join on q_id
      // is unchanged) and gated by the SAME decision: norm rows are one
      // per doc ≤ query postings rows, so qFits implies they fit too.
      // Corpus-side norms join on c_id, which reuses dots' doc_id
      // clustering (only the doc-scale norms table exchanges, never the
      // pair-scale dots).
      .join(gated(norms.where(col("doc_id") % 53 === 0)
        .select(col("doc_id").as("q_id"), col("nrm").as("nrm_q"))), "q_id")
      .join(norms.select(col("doc_id").as("c_id"), col("nrm").as("nrm_c")), "c_id")
      .select(col("q_id"), col("c_id"),
        Orc.rN(col("dot") / (col("nrm_q") * col("nrm_c")), 8).as("cos8"))
      .withColumn("rn", row_number().over(
        w.partitionBy("q_id").orderBy(col("cos8").desc, col("c_id").asc)).cast("long"))
      .where(col("rn") <= 3)
      .select(col("q_id"), col("c_id"), col("rn"), Orc.r4(col("cos8")).as("cos"))
      .orderBy("q_id", "rn")
  }

  /** The session's broadcast-join threshold in bytes — the size-gate
    * bound for [[ls3TfidfTopk]]'s query-side hint. Read from the same
    * conf the planner honours so an operator-forced broadcast can never
    * exceed what the deployment already allows for planner-chosen ones
    * (-1 = broadcasts disabled → the gate never fires). */
  private def broadcastThresholdBytes(s: SparkSession): Long = {
    val v = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try v.toLong catch {
      case _: NumberFormatException =>
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)
    }
  }

  /** Shared postings builder for [[ls3TfidfTopk]] and its fanout
    * diagnostic — one definition so the diagnostic cannot drift from
    * the plan it explains. */
  private def ls3Weights(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    // df per token derives from tf — (doc_id, tok) is unique after the
    // tf groupBy, so count(*) per tok ≡ count(DISTINCT doc_id). The old
    // toks.distinct() pipeline re-scanned and re-shuffled the whole
    // corpus to recompute what tf already holds (guide §1.2: don't
    // compute things twice); values are identical by construction.
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "tok").crossJoin(broadcast(n))
      .where(col("df") * 10 <= col("n_docs") * 9)
      .select(col("doc_id"), col("tok"),
        (col("tf") * (log((col("n_docs") + 1) / (col("df") + 1.0)) + 1)).as("w"))
  }

  /** Bench self-diagnosis (VERDICT r11 item 1b): ls3's cost driver is
    * the inverted-index join fanout — the number of (query-posting,
    * corpus-posting) rows the term equi-join emits before the per-pair
    * aggregate. Computed in CLOSED FORM from per-token posting counts
    * (Σ_tok nq·n − |query postings|, since (doc, tok) is unique after
    * the tf groupBy), so the diagnostic costs two narrow aggregates and
    * a vocabulary-sized join — never the quadratic join itself. */
  private[graft] def ls3PostingsFanout(s: SparkSession, d: String): Long = {
    val wts = ls3Weights(s, d)
    val perTok = wts.groupBy("tok").agg(
      count(lit(1)).as("n_post"),
      sum(when(col("doc_id") % 53 === 0, 1L).otherwise(0L)).as("nq_post"))
    val r = perTok.agg(
      sum(col("nq_post") * col("n_post")).as("cross"),
      sum(col("nq_post")).as("self")).collect()(0)
    (if (r.isNullAt(0)) 0L else r.getLong(0)) -
      (if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** LS4: BM25 ranking — the standard retrieval scorer on top of ls3's
    * inverted index: idf = ln((N − df + 0.5)/(df + 0.5) + 1) (Lucene's
    * positive-floored form), tf saturation k1 = 1.2, length
    * normalization b = 0.75 against the average doc length. The query
    * is data-derived deterministically (the two RAREST tokens — df
    * asc, token asc — so the probe is discriminative on any corpus);
    * scoring touches only the postings of those terms, never the
    * corpus. Every fractional constant is written CAST-to-DOUBLE-safe
    * (§5.3 decimal trap); ranking cuts on the r8-rounded score with a
    * doc_id tiebreak. */
  val ls4Bm25Topk: Q = (s, d) => {
    val docs = documents(s, d)
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    // df derives from tf — one row per (doc_id, tok) after the groupBy,
    // so count(*) per tok ≡ count(DISTINCT doc_id); saves the second
    // explode+distinct corpus pass (same rewrite as ls3Weights)
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      avg(size(split(col("text"), " "))).as("avgdl"))
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val qterms = dfreq.orderBy(col("df").asc, col("tok").asc).limit(2)
      .select(col("tok"), col("df"))
    val scored = tf.join(broadcast(qterms), "tok")
      .join(dl, "doc_id").crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + 0.5d) / (col("df") + 0.5d) + 1.0d) *
          (col("tf") * 2.2d) /
          (col("tf") + ((col("dl") / col("avgdl")) * 0.75d + 0.25d) * 1.2d))
          .as("term_score"))
      .groupBy("doc_id").agg(Orc.rN(sum("term_score"), 8).as("score"))
    // Global top-20 via sort+limit (TakeOrderedAndProject: per-partition
    // heaps + driver merge), NOT a single-partition ranking window over
    // the scored set — the scored set scales with the corpus. The rank
    // is then assigned on the bounded 20-row result.
    scored.orderBy(col("score").desc, col("doc_id").asc).limit(20)
      .withColumn("rk", row_number().over(
        graft.Windows.bounded(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("score"), col("rk"))
      .orderBy("rk")
  }

  /** Q21: gaps-and-islands — longest run of consecutive active days per
    * user, plus the island count. The classic streak analysis: distinct
    * (user, day) grid, then `day − row_number()` is constant within a
    * consecutive run (the island key), so streaks reduce to two hash
    * aggs after one per-user window — no self-join, no recursion. Day
    * arithmetic on integer epoch-day numbers (µs div 86400e6), as q20. */
  val q21Streaks: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
    val days = Tables.events(s, d)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    days
      .withColumn("grp",
        col("day") - row_number().over(w.partitionBy("user_id").orderBy("day")))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max("len").as("longest"), count(lit(1)).as("n_streaks"))
      .orderBy("user_id")
  }

  /** A29: pre-aggregated sketch cube — the 100 TB "compute daily, query
    * any window" idiom: per-day HLL sketches of the user set are built
    * once and PERSISTED (binary sketch column in parquet), then any
    * later window query merges stored sketches instead of rescanning
    * raw events — a distinct count over an arbitrary day range costs
    * O(days), not O(rows). This query exercises the full lifecycle:
    * build → write → read back → per-day estimate AND cross-day
    * `hll_union_agg` merge. Output carries the EXACT counts (oracle-
    * checkable) plus `est_ok` bound flags the oracle pins to literal
    * TRUE — so the driver verifies the sketch estimates stay within 5%
    * without needing DuckDB to reproduce datasketches internals. The
    * merged row rides day = -1. Tmpdir lifecycle follows s18 (unique
    * path, JVM-exit cleanup — the returned frame reads lazily). */
  val a29SketchRollup: Q = (s, d) => {
    val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_a29_cube_${java.util.UUID.randomUUID().toString.take(8)}")
    graft.QueryGuard.deleteRecOnExit(dir.toFile)
    val days = Tables.events(s, d)
      .select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
    days.groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("n_exact"))
      .write.mode("overwrite").parquet(dir.toString)
    val cube = s.read.parquet(dir.toString)
    val okCol = (est: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =>
      abs(est.cast("double") - exact) <= exact * 0.05d
    val perDay = cube.select(col("day"), col("n_exact"),
      okCol(hll_sketch_estimate(col("sk")), col("n_exact")).as("est_ok"))
    val merged = cube.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
      lit(1).as("one"))
    val totalExact = days.agg(countDistinct(col("user_id")).as("n_exact"))
    val total = merged.crossJoin(totalExact)
      .select(lit(-1L).as("day"), col("n_exact"),
        okCol(col("est"), col("n_exact")).as("est_ok"))
    perDay.unionAll(total).orderBy("day")
  }

  /** M27: RobustScaler in column form — (x − median) / IQR per group,
    * the outlier-insensitive cousin of m2/m10's scalers. Exact
    * percentiles on both engines (Spark `percentile` ≡ DuckDB
    * `quantile_cont`), group stats broadcast back to the rows, output on
    * a deterministic row subset. MLlib's RobustScaler (approxQuantile)
    * is the at-scale variant; the column form is the oracle-checkable
    * contract for its math. */
  val m27RobustScaler: Q = (s, d) => {
    val li = lineitem(s, d)
    val stats = li.groupBy("l_returnflag").agg(
      expr("percentile(l_quantity, 0.5D)").as("med"),
      (expr("percentile(l_quantity, 0.75D)") -
        expr("percentile(l_quantity, 0.25D)")).as("iqr"))
    li.where(col("l_orderkey") % 199 === 0)
      .join(broadcast(stats), "l_returnflag")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"),
        Orc.r4((col("l_quantity") - col("med")) / col("iqr")).as("scaled"))
      // (l_orderkey, l_linenumber) is NOT unique in the fixture (45,832
      // distinct of 60,000 at sf0.01) — order by every output column so
      // the order is total up to fully-identical rows (§5.3)
      .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "scaled")
  }

  /** LPQ2: IVF-PQ ANN — the full IVFADC composition (coarse inverted
    * file × product quantization × exact re-rank): candidates shrink by
    * ~nprobe/nlist AND scoring runs over 16×-compressed codes; only the
    * final shortlist touches raw vectors. No SQL oracle (two model
    * families); seeded fits make it stable, and SurfaceR8Spec bounds
    * recall@10 and asserts the candidate-set reduction is real. */
  val lpq2IvfPqAnn: Q = (s, d) => {
    val corpus = embeddings(s, d)
    val queries = corpus.where(col("vec_id") % 67 === 0)
    ProductQuantizer.ivfPqTopK(queries, corpus, k = 10, nlist = 16, nprobe = 8)
      .select(col("q_id"), col("c_id"), col("rn"), Orc.r4(col("cos")).as("cos"))
      .orderBy("q_id", "rn")
  }

  /** T17: incremental aggregation via `foreachBatch` — the micro-batch
    * MERGE pattern: each batch folds its partial aggregate into a
    * persisted state table. Every merged quantity is associative AND
    * exact (long count, long epoch-micros min/max, value pre-quantized
    * to integer 1e-4 units before the long sum), so the final state
    * provably equals the one-shot batch aggregate REGARDLESS of how the
    * input was split into batches — the law SurfaceR8Spec checks by
    * forcing one-file-per-trigger. The oracle is that batch aggregate.
    * At 100 TB the state rewrite becomes a partitioned upsert (lp3) —
    * the merge algebra is the part that must be exact, and is. */
  val t17ForeachBatchMerge: Q = (s, d) => {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_t17_").toString
    graft.QueryGuard.deleteRecOnExit(new java.io.File(dir))
    // land the (nanos-shimmed) events as several files so AvailableNow
    // actually exercises multi-batch merging on the oracle path
    Tables.events(s, d).repartition(4)
      .write.mode("overwrite").parquet(s"$dir/landing")
    val stream = s.readStream
      .schema(Tables.events(s, d).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/landing")
    var statePath: Option[String] = None
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val agg = b.groupBy("user_id").agg(
          count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("first_us"),
          max(unix_micros(col("ts"))).as("last_us"),
          sum(floor(col("value") * 1e4 + 0.5).cast("long")).as("v4"))
        val merged = statePath match {
          case None => agg
          case Some(p) => s.read.parquet(p).unionByName(agg)
            .groupBy("user_id").agg(
              sum("n_events").as("n_events"), min("first_us").as("first_us"),
              max("last_us").as("last_us"), sum("v4").as("v4"))
        }
        val next = s"$dir/state_$id"
        merged.write.mode("overwrite").parquet(next)
        statePath = Some(next)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(180000)) { q.stop(); sys.error("t17 drain expired") }
    s.read.parquet(statePath.getOrElse(sys.error("t17: no batch ran")))
      .select(col("user_id"), col("n_events"), col("first_us"), col("last_us"),
        Orc.r4(col("v4") / 10000.0).as("sum_value4"))
      .orderBy("user_id")
  }

  /** T18: idempotent foreachBatch — exactly-once OUTPUT on top of
    * foreachBatch's at-least-once delivery contract. A restart replays
    * the in-flight micro-batch with the SAME batchId; a sink that
    * applies it twice double-counts. The fix is the standard ledger
    * gate: the sink records applied batchIds next to the state (in
    * production, in the same transaction — a Delta/JDBC txn table;
    * here, alongside the state files) and drops re-offered ids. After
    * the drain, this query SIMULATES the restart replay — re-offering
    * an already-applied batchId carrying the full landing data — and
    * the final state must still equal the one-shot batch aggregate
    * (same oracle as t17), which it cannot if the gate is broken: the
    * replay would double-merge every row. */
  val t18IdempotentMerge: Q = (s, d) => {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_t18_").toString
    graft.QueryGuard.deleteRecOnExit(new java.io.File(dir))
    Tables.events(s, d).repartition(4)
      .write.mode("overwrite").parquet(s"$dir/landing")
    var statePath: Option[String] = None
    val applied = scala.collection.mutable.Set[Long]()
    def applyBatch(b: DataFrame, id: Long): Unit = {
      if (applied.contains(id)) return // replayed batch: exactly-once gate
      val agg = b.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"),
        sum(floor(col("value") * 1e4 + 0.5).cast("long")).as("v4"))
      val merged = statePath match {
        case None => agg
        case Some(p) => s.read.parquet(p).unionByName(agg)
          .groupBy("user_id").agg(
            sum("n_events").as("n_events"), min("first_us").as("first_us"),
            max("last_us").as("last_us"), sum("v4").as("v4"))
      }
      val next = s"$dir/state_$id"
      merged.write.mode("overwrite").parquet(next)
      statePath = Some(next)
      applied += id
    }
    val q = s.readStream
      .schema(Tables.events(s, d).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/landing")
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) => applyBatch(b, id) }
      .trigger(Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(180000)) { q.stop(); sys.error("t18 drain expired") }
    // the restart replay: batch 0 re-offered, here carrying the WHOLE
    // landing set — if the ledger gate is broken the state double-counts
    // every row and the oracle compare fails loudly
    applyBatch(s.read.parquet(s"$dir/landing"), 0L)
    s.read.parquet(statePath.getOrElse(sys.error("t18: no batch ran")))
      .select(col("user_id"), col("n_events"), col("first_us"), col("last_us"),
        Orc.r4(col("v4") / 10000.0).as("sum_value4"))
      .orderBy("user_id")
  }

  /** Q23: A/B experiment readout — deterministic hash assignment (the
    * same md5-nibble uniform as lp10/lp20: variant is a pure function
    * of user_id, so assignment survives reprocessing and joins across
    * days without an assignment table) + per-user conversion + the
    * two-proportion pooled z statistic. The u < 0.5 cut can never sit
    * on the hash grid (u = (k+0.5)/4096), so the split is knife-edge-
    * free by construction. Conversion = FIRST-DAY purchase (within 24h
    * of the user's first event): "ever purchased" is degenerate on this
    * fixture — every sf0.01 user has a purchase, making p = 1 and the
    * pooled variance 0 (found as an ANSI DIVIDE_BY_ZERO, not a wrong
    * number). The z denominator is guarded to NULL when a degenerate
    * p ∈ {0,1} ever recurs, on BOTH engines, so the readout degrades
    * loudly-but-validly instead of erroring. One groupBy per user + one
    * scalar agg. */
  val q23AbTest: Q = (s, d) => {
    val u = expr(hashUniformSql("user_id", "ab"))
    val conv = Tables.events(s, d)
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "purchase",
          unix_micros(col("ts")))).as("pt"),
        min(unix_micros(col("ts"))).as("t0"))
      .select(col("user_id"),
        when(col("pt").isNotNull &&
          col("pt") - col("t0") <= 86400000000L, 1L).otherwise(0L).as("conv"))
      .withColumn("va", u < 0.5d)
    val p = (col("c_a") + col("c_b")) / (col("n_a") + col("n_b"))
    val se = sqrt(p * (lit(1.0) - p) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    conv.agg(
        sum(when(col("va"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("va"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("va"), col("conv")).otherwise(0L)).as("c_a"),
        sum(when(!col("va"), col("conv")).otherwise(0L)).as("c_b"))
      .select(col("n_a"), col("n_b"), col("c_a"), col("c_b"),
        Orc.rN(col("c_a") / col("n_a"), 6).as("rate_a"),
        Orc.rN(col("c_b") / col("n_b"), 6).as("rate_b"),
        Orc.r4(when(se > 0.0d,
          (col("c_a") / col("n_a") - col("c_b") / col("n_b")) / se)).as("z"))
  }

  /** LT7: OHLC resample bars — the time-series downsampling shape
    * (open/high/low/close per instrument per bucket): one hash agg,
    * no window, no self-join. Open/close need a TOTAL event order;
    * ties at the same truncated µs are broken by event_id via a
    * zero-padded string key (`%020d%020d`) — lexicographic order on
    * fixed-width decimal strings equals numeric order on the (tu,
    * event_id) pair, and min_by/arg_min take one scalar key on both
    * engines (DuckDB arg_min has no composite-key overload — found at
    * design time, §5.3). */
  val lt7OhlcBars: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("event_type"),
      unix_micros(col("ts")).as("tu"), col("event_id"), col("value"))
      .withColumn("hr", expr("tu div 3600000000"))
      .withColumn("k", format_string("%020d%020d", col("tu"), col("event_id")))
    e.groupBy("event_type", "hr").agg(
        count(lit(1)).as("n"),
        Orc.r4(min_by(col("value"), col("k"))).as("open"),
        Orc.r4(max("value")).as("high"),
        Orc.r4(min("value")).as("low"),
        Orc.r4(max_by(col("value"), col("k"))).as("close"),
        Orc.r4(avg("value")).as("avg_value"))
      .orderBy("event_type", "hr")
  }

  /** W11: moving median — `percentile` as a WINDOW aggregate over a
    * 5-row trailing frame: the robust smoother (one spike moves a
    * moving average arbitrarily, a moving median at most one rank).
    * Spark window-izes any aggregate expression, so this is the same
    * exact-percentile kernel as a8/m27 inside a running frame; DuckDB
    * mirrors it with `quantile_cont(...) OVER`. Frame membership is
    * pinned by the (tu, event_id) total order (§5.3). */
  val w11MovingMedian: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("tu").asc, col("event_id").asc)
      .rowsBetween(-4, 0)
    Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("tu"),
        col("event_id"), col("value"))
      .where(col("user_id") < 30)
      .withColumn("mov_med", Orc.r4(expr("percentile(value, 0.5D)").over(w)))
      .select(col("user_id"), col("tu"), col("event_id"),
        Orc.r4(col("value")).as("value4"), col("mov_med"))
      .orderBy("user_id", "tu", "event_id")
  }

  /** LT8: time-weighted average (TWAP) — each observation weighted by
    * how long it remained current (lead(tu) − tu), the standard guard
    * against irregular sampling: a sensor that reports once an hour and
    * once a second must not let the chatty second dominate. One window
    * for the durations + one hash agg; the last observation per user
    * has no forward duration and is excluded on both engines. */
  val lt8Twap: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("tu").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("tu"),
        col("event_id"), col("value"))
      .withColumn("dur", lead(col("tu"), 1).over(w) - col("tu"))
      .where(col("dur").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        Orc.r4(sum(col("value") * col("dur")) / sum(col("dur"))).as("twap"),
        Orc.r4(avg(col("value"))).as("avg_value"))
      .orderBy("user_id")
  }

  /** LP23: token-budget corpus selection — the curation endgame: given
    * a training-token budget, keep the highest-quality documents that
    * fit. Quality = lexical diversity (distinct words / words, the
    * simplest non-degenerate per-doc score both engines compute
    * identically); selection = greedy by (score desc, doc_id) with a
    * running token cumsum capped at the budget — the knapsack-greedy
    * that data curation actually ships. The cumsum and ordinal run
    * through [[graft.operators.PrefixSum]]'s range-partitioned offsets
    * (one range exchange + a numPartitions-row offset cumsum) — no
    * single-partition window over the corpus. Desc order is expressed
    * as range-partitioning on the NEGATED score (PrefixSum sorts
    * ascending); (neg score, doc_id) is a total order so ties are
    * deterministic. Score rides the r8 grid BEFORE ranking so both
    * engines cut the same prefix (§5.3). */
  val lp23TokenBudgetSelect: Q = (s, d) => {
    val base = documents(s, d)
      .where(col("n_chars") > 0)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        Orc.rN(size(array_distinct(split(col("text"), " "))) /
          size(split(col("text"), " ")), 8).as("score"))
      .withColumn("_neg", -col("score"))
      .withColumn("_one", lit(1L))
    graft.operators.PrefixSum.withRunningTotals(
        base, Seq("_neg", "doc_id"),
        Seq("n_tokens" -> "cum_tokens", "_one" -> "rk"))
      .where(col("cum_tokens") <= 5000L)
      .drop("_neg", "_one")
      .orderBy("rk")
  }

  /** Q22: last-touch attribution — every purchase credited to the
    * user's most recent click at-or-before it. The as-of semantics (J8)
    * restated as ONE forward-fill window instead of a join: clicks and
    * purchases interleave on the per-user event-time order and
    * `last(click_id) IGNORE NULLS` carries the latest click forward, so
    * the cost is one shuffle on user_id + an O(n) running frame — no
    * band join, no per-purchase probe. Ties at the same truncated µs
    * resolve clicks-first then event_id (the total order is explicit on
    * both engines — §5.3); purchases with no prior click keep NULL
    * attribution (never silently dropped). */
  val q22Attribution: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("tu").asc, col("k").asc, col("event_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.events(s, d)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"),
        when(col("event_type") === "click", 0).otherwise(1).as("k"))
      .withColumn("attr_click",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("attr_tu",
        last(when(col("event_type") === "click", col("tu")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("tu").as("purchase_us"), col("attr_click"),
        (col("tu") - col("attr_tu")).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** J15: as-of NEAREST join — completes the j8 family (backward /
    * forward / tolerance / native) with the bidirectional variant:
    * every purchase pairs with the click MINIMIZING |Δt|, ties to the
    * backward side. Same window-only shape as q22 (no band join): one
    * backward forward-fill + one forward backward-fill per user, then a
    * three-way CASE on the two gaps. A same-µs click sorts before the
    * purchase (k-order), so it is caught by the backward fill at gap 0
    * — which the tie rule would pick anyway. */
  val j15AsofNearest: Q = (s, d) => {
    val W = org.apache.spark.sql.expressions.Window
    val base = W.partitionBy("user_id")
      .orderBy(col("tu").asc, col("k").asc, col("event_id").asc)
    val wb = base.rowsBetween(W.unboundedPreceding, 0)
    val wf = base.rowsBetween(0, W.unboundedFollowing)
    val clickId = when(col("event_type") === "click", col("event_id"))
    val clickTu = when(col("event_type") === "click", col("tu"))
    Tables.events(s, d)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"),
        when(col("event_type") === "click", 0).otherwise(1).as("k"))
      .withColumn("b_click", last(clickId, ignoreNulls = true).over(wb))
      .withColumn("b_tu", last(clickTu, ignoreNulls = true).over(wb))
      .withColumn("f_click", first(clickId, ignoreNulls = true).over(wf))
      .withColumn("f_tu", first(clickTu, ignoreNulls = true).over(wf))
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        when(col("b_click").isNotNull &&
            (col("f_click").isNull ||
             col("tu") - col("b_tu") <= col("f_tu") - col("tu")), col("b_click"))
          .otherwise(col("f_click")).as("nearest_click"),
        when(col("b_click").isNotNull &&
            (col("f_click").isNull ||
             col("tu") - col("b_tu") <= col("f_tu") - col("tu")),
            col("tu") - col("b_tu"))
          .otherwise(col("f_tu") - col("tu")).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** M29: chi-square test of independence — event_type × weekday
    * contingency table, the classic "is behavior day-dependent" gate.
    * χ² = Σ (O−E)²/E with E = row·col/N, built from ONE groupBy count
    * plus broadcast-sized marginal re-aggs; weekday from pure integer
    * epoch-day arithmetic ((day + 4) mod 7 — 1970-01-01 was a Thursday),
    * no date-type crossings (§5.3). MlChi2Spec cross-checks the
    * statistic against MLlib's ChiSquareTest. */
  val m29Chi2: Q = (s, d) => {
    val obs = Tables.events(s, d)
      .select(col("event_type"),
        expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("wd"))
      .groupBy("event_type", "wd").agg(count(lit(1)).as("o"))
    val rowTot = obs.groupBy("event_type").agg(sum("o").as("rt"))
    val colTot = obs.groupBy("wd").agg(sum("o").as("ct"))
    val n = obs.agg(sum("o").as("n"))
    obs.join(broadcast(rowTot), "event_type").join(broadcast(colTot), "wd")
      .crossJoin(broadcast(n))
      .select((col("o") - col("rt") * col("ct") / col("n")).as("dev"),
        (col("rt") * col("ct") / col("n")).as("e"))
      .agg(Orc.r4(sum(col("dev") * col("dev") / col("e"))).as("chi2"),
        count(lit(1)).as("n_cells"))
  }

  /** The md5-nibble hash-uniform in (0,1): bucket 0..4095 from three
    * hex nibbles (the same portable-SQL idiom as lp10/l14), shifted by
    * +0.5 so u is never 0 or 1. Identical text runs on both engines.
    * The numerator and divisor are CAST to DOUBLE explicitly: Spark
    * parses bare `0.5`/`4096.0` literals as DECIMAL and would divide at
    * 7-digit decimal scale (u = 0.9334717 ≠ 0.9334716796875), shifting
    * ln(u) by ~2e-8 and flipping rounded sort keys vs DuckDB's double
    * math — found by an actual oracle mismatch at sf0.01. */
  private def hashUniformSql(idCol: String, salt: String): String = {
    def nib(k: Int) =
      s"(instr('0123456789abcdef', substr(md5($idCol || '$salt'), $k, 1)) - 1)"
    s"((CAST(${nib(1)} * 256 + ${nib(2)} * 16 + ${nib(3)} AS DOUBLE) + 0.5)" +
      " / CAST(4096 AS DOUBLE))"
  }

  /** LP20: deterministic weighted sampling without replacement —
    * Efraimidis–Spirakis exponential keys: rank by ln(u)/w descending
    * (monotone-equivalent to u^(1/w)), where u is a pure hash function
    * of (id, salt) and w the sampling weight (n_chars: longer docs
    * proportionally likelier). Probability-proportional-to-weight with
    * NO RNG state: membership survives repartitioning, retries and
    * re-ingestion, and the whole draw is one narrow projection + one
    * per-group top-k — the 100 TB training-mix sampler. Keys are
    * rounded (r8) before ranking with an id tiebreak so the order is
    * identical across engines (§5.3). */
  val lp20WeightedSample: Q = (s, d) => {
    val key = Orc.rN(
      log(expr(hashUniformSql("doc_id", "wsample"))) / col("n_chars"), 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("skey").desc, col("doc_id").asc)
    documents(s, d)
      .where(col("n_chars") > 0)
      .select(col("lang"), col("doc_id"), col("n_chars"), key.as("skey"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 5)
      .select(col("lang"), col("doc_id"), col("n_chars"), col("skey"), col("rn"))
      .orderBy("lang", "rn")
  }

  /** Q19: ordered funnel analysis — users who did view, THEN click,
    * THEN purchase (strict event-time order, each step's clock starting
    * at the previous step's first qualifying instant). The classic
    * product-analytics query, expressed as three cascaded min-aggregates
    * with inequality joins on per-user scalars — each stage is a
    * groupBy + broadcast-joinable (one row per user) probe, no window
    * over the raw stream. Timestamps compare as epoch MICROS on both
    * engines (the fixture is ns-precision parquet; Spark's shim
    * truncates to µs, so comparing raw ns on the oracle side could
    * diverge — §5.3). */
  val q19Funnel: Q = (s, d) => {
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tu"))
    val v = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("tu").as("t1"))
    val c = e.join(v, "user_id")
      .where(col("event_type") === "click" && col("tu") > col("t1"))
      .groupBy("user_id").agg(min("tu").as("t2"))
    val p = e.join(c, "user_id")
      .where(col("event_type") === "purchase" && col("tu") > col("t2"))
      .groupBy("user_id").agg(min("tu").as("t3"))
    v.agg(count(lit(1)).as("n_users")).select(lit("f1_view").as("step"), col("n_users"))
      .unionAll(c.agg(count(lit(1)).as("n_users"))
        .select(lit("f2_view_click").as("step"), col("n_users")))
      .unionAll(p.agg(count(lit(1)).as("n_users"))
        .select(lit("f3_view_click_purchase").as("step"), col("n_users")))
      .orderBy("step")
  }

  /** Q20: retention cohorts — users grouped by first-seen day, counted
    * on each subsequent activity day-offset (0..7). Day arithmetic on
    * integer epoch-day numbers (µs div 86400e6), no timezone/date-type
    * crossings; two hash aggs + one broadcast-sized join (one row per
    * user on the cohort side). */
  val q20Retention: Q = (s, d) => {
    val e = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
    val f = e.groupBy("user_id").agg(min("day").as("cohort"))
    e.join(f, "user_id")
      .select(col("user_id"), col("cohort"), (col("day") - col("cohort")).as("day_offset"))
      .where(col("day_offset") <= 7)
      .distinct()
      .groupBy("cohort", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort", "day_offset")
  }

  /** X13: join-key skew diagnostic — the per-key row histogram that
    * decides whether a shuffle join needs salting (x4) or AQE skew
    * splitting before it runs. One groupBy + one scalar-sized re-agg;
    * at 100 TB this runs on a sample or on `orders` stats, but the
    * report shape is the same. */
  val x13SkewStats: Q = (s, d) =>
    orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_keys"),
        avg("n").as("avg_n"),
        expr("percentile(n, 0.5D)").as("p50_n"),
        expr("percentile(n, 0.99D)").as("p99_n"),
        max("n").as("max_n"))
      .select(col("n_keys"), Orc.r4(col("avg_n")).as("avg_rows"),
        Orc.r4(col("p50_n")).as("p50"), Orc.r4(col("p99_n")).as("p99"),
        col("max_n").as("max_rows"),
        Orc.r4(col("max_n") / col("avg_n")).as("skew_ratio"))

  val queries: Map[String, Q] = Map(
    "lp19_global_rowid" -> lp19GlobalRowid,
    "lpq_pq_ann" -> lpqPqAnn,
    "l13b_contamination_bloom" -> l13bContaminationBloom,
    "dq_constraints" -> dqConstraints,
    "lf2_fuzzy_pairs" -> lf2FuzzyPairs,
    "lf3_jaro_pairs" -> lf3JaroPairs,
    "m28_mad_outliers" -> m28MadOutliers,
    "ls3_tfidf_topk" -> ls3TfidfTopk,
    "ls4_bm25_topk" -> ls4Bm25Topk,
    "q21_streaks" -> q21Streaks,
    "a29_sketch_rollup" -> a29SketchRollup,
    "m27_robust_scaler" -> m27RobustScaler,
    "lpq2_ivfpq_ann" -> lpq2IvfPqAnn,
    "lp20_weighted_sample" -> lp20WeightedSample,
    "q19_funnel" -> q19Funnel,
    "q20_retention" -> q20Retention,
    "t17_foreach_batch_merge" -> t17ForeachBatchMerge,
    "t18_idempotent_merge" -> t18IdempotentMerge,
    "lt7_ohlc_bars" -> lt7OhlcBars,
    "w11_moving_median" -> w11MovingMedian,
    "lt8_twap" -> lt8Twap,
    "lp23_token_budget_select" -> lp23TokenBudgetSelect,
    "q22_attribution" -> q22Attribution,
    "j15_asof_nearest" -> j15AsofNearest,
    "q23_ab_test" -> q23AbTest,
    "m29_chi2" -> m29Chi2,
    "x13_skew_stats" -> x13SkewStats)

  val oracleSql: Map[String, String] = Map(
    "lp19_global_rowid" ->
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY doc_id) - 1 AS rowid
        |FROM documents ORDER BY doc_id""".stripMargin,
    // identical semantics to l13: the bloom is a prefilter, the exact
    // join behind it makes the result equal to the no-bloom query
    "l13b_contamination_bloom" ->
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE length(text) > 0 AND len(string_split(text, ' ')) >= 3
        |),
        |g AS (
        |  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS g
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM words)
        |),
        |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0)
        |SELECT t.doc_id, CAST(count(DISTINCT t.g) AS BIGINT) AS n_shared_grams
        |FROM g t JOIN bench b ON t.g = b.g
        |WHERE t.doc_id % 97 <> 0
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,
    "dq_constraints" ->
      """WITH m AS (
        |  SELECT count(*) AS n, count(l_quantity) AS n_qty,
        |    count(DISTINCT l_orderkey * 10 + l_linenumber) AS n_key,
        |    min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |    sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END) AS bad_flag,
        |    sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS neg_price
        |  FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'completeness_l_quantity' AS check_name,
        |    round(CAST(n_qty AS DOUBLE) / n, 4) AS metric, n_qty = n AS passed FROM m
        |  UNION ALL SELECT 'uniqueness_order_line',
        |    round(CAST(n_key AS DOUBLE) / n, 4), n_key = n FROM m
        |  UNION ALL SELECT 'min_l_quantity_ge_1',
        |    round(CAST(min_qty AS DOUBLE), 4), min_qty >= 1 FROM m
        |  UNION ALL SELECT 'accepted_returnflags',
        |    round(CAST(bad_flag AS DOUBLE), 4), bad_flag = 0 FROM m
        |  UNION ALL SELECT 'nonneg_extendedprice',
        |    round(CAST(neg_price AS DOUBLE), 4), neg_price = 0 FROM m
        |) ORDER BY check_name""".stripMargin,
    "lf2_fuzzy_pairs" ->
      """WITH p AS (
        |  SELECT p_name, count(*) AS n,
        |    string_split(p_name, ' ')[-1] AS blk
        |  FROM part GROUP BY p_name)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
        |  a.n AS n_a, b.n AS n_b
        |FROM p a JOIN p b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
        |ORDER BY name_a, name_b""".stripMargin,
    // the custom codegen jaro_winkler pins DuckDB's exact semantics;
    // both engines filter on the r8-rounded value so the 0.8 cut is
    // knife-edge-free
    "lf3_jaro_pairs" ->
      """WITH p AS (
        |  SELECT DISTINCT p_name, string_split(p_name, ' ')[1] AS blk
        |  FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  round(jaro_winkler_similarity(a.p_name, b.p_name), 8) AS jw
        |FROM p a JOIN p b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 8) >= 0.8
        |ORDER BY name_a, name_b""".stripMargin,
    // weight formula text identical to l9's oracle (proven bit-exact);
    // ranking cuts on the r8-rounded cosine with an id tiebreak
    "ls3_tfidf_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT tok, count(*) AS df
        |          FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |w AS (SELECT doc_id, tok, tf * (ln((n_docs + 1) / (df + 1.0)) + 1) AS w
        |      FROM tf JOIN dfreq USING (tok) CROSS JOIN n WHERE df * 10 <= n_docs * 9),
        |norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
        |dots AS (SELECT q.doc_id AS q_id, c.doc_id AS c_id, sum(q.w * c.w) AS dot
        |         FROM w q JOIN w c ON q.tok = c.tok AND q.doc_id != c.doc_id
        |         WHERE q.doc_id % 53 = 0 GROUP BY 1, 2),
        |scored AS (SELECT q_id, c_id, round(dot / (nq.nrm * nc.nrm), 8) AS cos8
        |           FROM dots JOIN norms nq ON dots.q_id = nq.doc_id
        |                     JOIN norms nc ON dots.c_id = nc.doc_id),
        |ranked AS (SELECT q_id, c_id, cos8,
        |             row_number() OVER (PARTITION BY q_id
        |                                ORDER BY cos8 DESC, c_id ASC) AS rn
        |           FROM scored)
        |SELECT q_id, c_id, CAST(rn AS BIGINT) AS rn, round(cos8, 4) AS cos
        |FROM ranked WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin,
    // every fractional constant CAST to DOUBLE on the DuckDB side too:
    // bare 2.2/1.2 literals would multiply at exact DECIMAL precision
    // there while Spark rounds to double first (the 5.3 trap mirrored)
    "ls4_bm25_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT tok, count(*) AS df
        |          FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
        |stats AS (SELECT count(*) AS n_docs,
        |            avg(len(string_split(text, ' '))) AS avgdl FROM documents),
        |dl AS (SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
        |q AS (SELECT tok, df FROM dfreq ORDER BY df ASC, tok ASC LIMIT 2),
        |scored AS (
        |  SELECT tf.doc_id,
        |    ln((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))
        |       + CAST(1 AS DOUBLE)) *
        |    (tf * CAST(2.2 AS DOUBLE)) /
        |    (tf + CAST(1.2 AS DOUBLE) *
        |      (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl)) AS term_score
        |  FROM tf JOIN q USING (tok) JOIN dl ON tf.doc_id = dl.doc_id
        |  CROSS JOIN stats),
        |agg AS (SELECT doc_id, round(sum(term_score), 8) AS score
        |        FROM scored GROUP BY doc_id),
        |ranked AS (SELECT doc_id, score,
        |             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
        |           FROM agg)
        |SELECT doc_id, score, rk FROM ranked WHERE rk <= 20 ORDER BY rk""".stripMargin,
    "q21_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |g AS (SELECT user_id, day,
        |        day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM days),
        |runs AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(max(len) AS BIGINT) AS longest,
        |  CAST(count(*) AS BIGINT) AS n_streaks
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,
    // percentile == quantile_cont inside identical ROWS frames
    "w11_moving_median" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tu, event_id, value
        |  FROM events WHERE user_id < 30)
        |SELECT user_id, tu, event_id, round(value, 4) AS value4,
        |  round(quantile_cont(value, 0.5) OVER (
        |    PARTITION BY user_id ORDER BY tu, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS mov_med
        |FROM e ORDER BY user_id, tu, event_id""".stripMargin,
    // last observation per user carries no forward duration: excluded
    // on both engines
    "lt8_twap" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tu, event_id, value,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) - epoch_us(ts) AS dur
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value * dur) / sum(dur), 4) AS twap,
        |  round(avg(value), 4) AS avg_value
        |FROM e WHERE dur IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // identical r8-rounded score and (score desc, doc_id) greedy order
    "lp23_token_budget_select" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    round(len(list_distinct(string_split(text, ' '))) /
        |          len(string_split(text, ' ')), 8) AS score
        |  FROM documents WHERE n_chars > 0),
        |ranked AS (
        |  SELECT doc_id, n_tokens, score,
        |    CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
        |  FROM scored)
        |SELECT doc_id, n_tokens, score, cum_tokens, rk
        |FROM ranked WHERE cum_tokens <= 5000 ORDER BY rk""".stripMargin,
    // the same zero-padded (tu, event_id) string key on both engines;
    // avg is the only order-sensitive double sum and rides the r4 grid
    "lt7_ohlc_bars" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS tu, event_id, value,
        |    epoch_us(ts) // 3600000000 AS hr,
        |    printf('%020d%020d', epoch_us(ts), event_id) AS k
        |  FROM events)
        |SELECT event_type, hr, CAST(count(*) AS BIGINT) AS n,
        |  round(arg_min(value, k), 4) AS open,
        |  round(max(value), 4) AS high,
        |  round(min(value), 4) AS low,
        |  round(arg_max(value, k), 4) AS close,
        |  round(avg(value), 4) AS avg_value
        |FROM e GROUP BY event_type, hr
        |ORDER BY event_type, hr""".stripMargin,
    // same clicks-first-then-event_id total order inside the window as
    // the Spark side; purchases without a prior click keep NULLs
    "q22_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tu,
        |    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS k
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT event_id, user_id, event_type, tu,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tu, k, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr_click,
        |    last_value(CASE WHEN event_type = 'click' THEN tu END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tu, k, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr_tu
        |  FROM e)
        |SELECT event_id AS purchase_id, user_id, tu AS purchase_us,
        |  attr_click, tu - attr_tu AS gap_us
        |FROM w WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin,
    // the same hash-uniform fragment (DOUBLE-cast per §5.3); BIGINT/
    // BIGINT divides as double on both engines
    "q23_ab_test" ->
      s"""WITH per AS (
         |  SELECT user_id,
         |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS pt,
         |    min(epoch_us(ts)) AS t0
         |  FROM events GROUP BY user_id),
         |conv AS (
         |  SELECT user_id,
         |    CASE WHEN pt IS NOT NULL AND pt - t0 <= 86400000000
         |         THEN 1 ELSE 0 END AS conv,
         |    ${hashUniformSql("user_id", "ab")} < 0.5 AS va
         |  FROM per),
         |agg AS (
         |  SELECT
         |    CAST(sum(CASE WHEN va THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN NOT va THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN va THEN conv ELSE 0 END) AS BIGINT) AS c_a,
         |    CAST(sum(CASE WHEN NOT va THEN conv ELSE 0 END) AS BIGINT) AS c_b
         |  FROM conv),
         |stat AS (
         |  SELECT *,
         |    sqrt(((c_a + c_b) / (n_a + n_b)) *
         |         (1.0 - (c_a + c_b) / (n_a + n_b)) *
         |         (1.0 / n_a + 1.0 / n_b)) AS se
         |  FROM agg)
         |SELECT n_a, n_b, c_a, c_b,
         |  round(c_a / n_a, 6) AS rate_a,
         |  round(c_b / n_b, 6) AS rate_b,
         |  round(CASE WHEN se > 0 THEN (c_a / n_a - c_b / n_b) / se END, 4) AS z
         |FROM stat""".stripMargin,
    // same window pair; the CASE mirrors Spark's tie-to-backward rule
    "j15_asof_nearest" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tu,
        |    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS k
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT event_id, user_id, event_type, tu,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tu, k, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b_click,
        |    last_value(CASE WHEN event_type = 'click' THEN tu END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tu, k, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b_tu,
        |    first_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tu, k, event_id
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_click,
        |    first_value(CASE WHEN event_type = 'click' THEN tu END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tu, k, event_id
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_tu
        |  FROM e)
        |SELECT event_id AS purchase_id, user_id,
        |  CASE WHEN b_click IS NOT NULL
        |         AND (f_click IS NULL OR tu - b_tu <= f_tu - tu)
        |       THEN b_click ELSE f_click END AS nearest_click,
        |  CASE WHEN b_click IS NOT NULL
        |         AND (f_click IS NULL OR tu - b_tu <= f_tu - tu)
        |       THEN tu - b_tu ELSE f_tu - tu END AS gap_us
        |FROM w WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin,
    // integer weekday arithmetic, double division on both engines
    "m29_chi2" ->
      """WITH obs AS (
        |  SELECT event_type, (epoch_us(ts) // 86400000000 + 4) % 7 AS wd,
        |    count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, sum(o) AS rt FROM obs GROUP BY 1),
        |ct AS (SELECT wd, sum(o) AS ct FROM obs GROUP BY 1),
        |n AS (SELECT sum(o) AS n FROM obs)
        |SELECT round(sum((o - rt * ct / n) * (o - rt * ct / n) / (rt * ct / n)), 4) AS chi2,
        |  CAST(count(*) AS BIGINT) AS n_cells
        |FROM obs JOIN rt USING (event_type) JOIN ct USING (wd) CROSS JOIN n""".stripMargin,
    // exact counts compared directly; est_ok pinned to literal TRUE —
    // the driver thereby verifies Spark's sketch estimates stay within
    // the 5% bound without DuckDB reproducing datasketches internals
    "a29_sketch_rollup" ->
      """WITH d AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, user_id FROM events)
        |SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  true AS est_ok
        |FROM d GROUP BY day
        |UNION ALL
        |SELECT -1, CAST(count(DISTINCT user_id) AS BIGINT), true FROM d
        |ORDER BY day""".stripMargin,
    // med/mad pass through the r8 grid BEFORE the 3*mad fence on both
    // engines, so the outlier count compares identical values
    "m28_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, round(quantile_cont(value, 0.5), 8) AS med
        |  FROM events GROUP BY event_type),
        |dev AS (
        |  SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, round(quantile_cont(adev, 0.5), 8) AS mad
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN d.adev > 3.0 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(min(d.med), 4) AS med, round(min(m.mad), 4) AS mad
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    // the one-shot batch aggregate the incremental merge must equal;
    // value pre-quantized to integer 1e-4 units exactly as Spark does,
    // so the sum is associative and batch-boundary-independent
    "t17_foreach_batch_merge" ->
      """SELECT user_id, count(*) AS n_events,
        |  epoch_us(min(ts)) AS first_us, epoch_us(max(ts)) AS last_us,
        |  round(sum(CAST(floor(value * 1e4 + 0.5) AS BIGINT)) / 10000.0, 4) AS sum_value4
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // identical target state to t17: the replayed batch must be a no-op
    "t18_idempotent_merge" ->
      """SELECT user_id, count(*) AS n_events,
        |  epoch_us(min(ts)) AS first_us, epoch_us(max(ts)) AS last_us,
        |  round(sum(CAST(floor(value * 1e4 + 0.5) AS BIGINT)) / 10000.0, 4) AS sum_value4
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "lp20_weighted_sample" ->
      s"""WITH keyed AS (
         |  SELECT lang, doc_id, n_chars,
         |    round(ln(${hashUniformSql("doc_id", "wsample")}) / n_chars, 8) AS skey
         |  FROM documents WHERE n_chars > 0
         |),
         |ranked AS (
         |  SELECT lang, doc_id, n_chars, skey,
         |    row_number() OVER (PARTITION BY lang ORDER BY skey DESC, doc_id ASC) AS rn
         |  FROM keyed
         |)
         |SELECT lang, doc_id, n_chars, skey, CAST(rn AS BIGINT) AS rn
         |FROM ranked WHERE rn <= 5 ORDER BY lang, rn""".stripMargin,
    "q19_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
        |v AS (SELECT user_id, min(tu) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.tu) AS t2 FROM e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.tu > v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.tu) AS t3 FROM e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.tu > c.t2 GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 'f1_view' AS step, CAST(count(*) AS BIGINT) AS n_users FROM v
        |  UNION ALL SELECT 'f2_view_click', CAST(count(*) AS BIGINT) FROM c
        |  UNION ALL SELECT 'f3_view_click_purchase', CAST(count(*) AS BIGINT) FROM p
        |) ORDER BY step""".stripMargin,
    "q20_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT e.user_id, f.cohort, e.day - f.cohort AS day_offset
        |      FROM e JOIN f USING (user_id) WHERE e.day - f.cohort <= 7)
        |SELECT cohort, day_offset, CAST(count(*) AS BIGINT) AS n_users
        |FROM a GROUP BY cohort, day_offset ORDER BY cohort, day_offset""".stripMargin,
    "x13_skew_stats" ->
      """WITH per AS (
        |  SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
        |SELECT count(*) AS n_keys, round(avg(n), 4) AS avg_rows,
        |  round(quantile_cont(n, 0.5), 4) AS p50,
        |  round(quantile_cont(n, 0.99), 4) AS p99,
        |  max(n) AS max_rows, round(max(n) / avg(n), 4) AS skew_ratio
        |FROM per""".stripMargin,
    "m27_robust_scaler" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_quantity, 0.5) AS med,
        |    quantile_cont(l_quantity, 0.75) - quantile_cont(l_quantity, 0.25) AS iqr
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_orderkey, l_linenumber, li.l_returnflag, l_quantity,
        |  round((l_quantity - med) / iqr, 4) AS scaled
        |FROM lineitem li JOIN s ON li.l_returnflag = s.l_returnflag
        |WHERE l_orderkey % 199 = 0
        |ORDER BY l_orderkey, l_linenumber, li.l_returnflag, l_quantity, scaled""".stripMargin)
}
