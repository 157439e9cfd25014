package graft.operators

import graft.Orc
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-pipeline operators for large-scale training-data preparation
  * (SURVEY.md §2.10): exact and near dedup, fingerprinting, language ID,
  * quality scoring, token counting.
  *
  * Scale posture: everything is expressed as DataFrame transformations
  * (explode + hash-aggregate + equi-join) so Catalyst plans partial
  * aggregation and AQE handles skew; no operator collects to the driver.
  */
object TextOps {

  /** L1: exact dedup by content hash. Returns one representative row id
    * per distinct text plus the duplicate count. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_sha256"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** L2: MinHash + LSH banding candidate pairs, built from scratch on
    * DataFrame ops (MLlib's MinHashLSH also exists — see Similarity):
    *   shingle -> per-seed min-hash signature (one hash-aggregate pass:
    *   all `numHashes` minima computed in a single groupBy) -> band keys
    *   -> equi-join on (band, bandKey) buckets.
    * One shuffle for the signature, one for the bucket join; candidate
    * volume is controlled by bands x rows-per-bucket, never by n².
    */
  def minHashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleSize: Int = 2): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val toks = df.select(
      col(idCol).as("_id"),
      explode(expr(
        s"transform(sequence(0, greatest(size(split($textCol, ' ')) - $shingleSize, 0)), " +
        s"i -> array_join(slice(split($textCol, ' '), i + 1, $shingleSize), ' '))"))
        .as("shingle"))
      .distinct()
    val minAggs = (0 until numHashes).map(h =>
      min(xxhash64(lit(h), col("shingle"))).as(s"h$h"))
    val sigs = toks.groupBy("_id").agg(minAggs.head, minAggs.tail: _*)
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(i => col(s"h${b * rowsPerBand + i}"))
      struct(lit(b).as("band"), xxhash64(slice: _*).as("key"))
    }
    // banded feeds BOTH sides of the bucket self-join — one eager
    // materialization instead of running the shingle→signature→band
    // pipeline twice (guide §5)
    val banded = sigs
      .select(col("_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      .localCheckpoint(true)
    val a = banded.select(col("_id").as("a_id"), col("band"), col("key"))
    val b = banded.select(col("_id").as("b_id"), col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
  }

  /** SimHash (64-bit) per document: per-token 64-bit hashes vote bit-wise,
    * weighted by term frequency; near-duplicate texts land within a small
    * Hamming distance. One explode + one hash-aggregate (64 partial sums).
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = df.select(
      col(idCol).as("_id"),
      explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$i"))
    val voted = tokens.groupBy("_id").agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 64).map(i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    voted.select(col("_id"), simhash.as("simhash"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** L-fingerprint: deterministic polynomial rolling hash of the raw
    * characters, mod 2^31-1 (stays exact in 64-bit arithmetic; matches a
    * plain SQL list_reduce, so it is oracle-checkable cross-engine). */
  def fingerprint(textCol: Column): Column =
    aggregate(
      split(textCol, ""),
      lit(0L),
      (h, c) => (h * 31 + ascii(c)) % 2147483647L)

  /** Language-ID heuristic: stopword-list hit counting per language.
    * Pure column expression — no shuffle, codegen-friendly. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "zu"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "de", "et", "que"),
  )

  def langIdHits(toks: Column, lang: String): Column =
    size(array_intersect(toks, array(stopwords(lang).map(lit): _*)))

  /** Predicted language = argmax of stopword hits, 'und' (undetermined)
    * when no list scores above zero. Deterministic tie-break by language
    * code order en > de > es > fr. */
  def langIdPredict(toks: Column): Column = {
    val langs = Seq("en", "de", "es", "fr")
    val hits = langs.map(l => langIdHits(toks, l))
    val best = hits.reduce((a, b) => when(b > a, b).otherwise(a))
    langs.zip(hits).foldRight(lit("und"): Column) { case ((l, h), acc) =>
      when(best > 0 && h === best, lit(l)).otherwise(acc)
    }
  }

  /** Quality score in [0,1]: blends length, mean token length, stopword
    * ratio, and alpha-character ratio — the standard cheap pre-filter
    * before expensive pipeline stages. All plain column arithmetic. */
  def qualityScore(textCol: Column): Column = {
    val toks = split(textCol, " ")
    val nToks = size(toks).cast("double")
    val lenScore = least(length(textCol).cast("double") / 200.0, lit(1.0))
    val meanTokLen = (length(textCol).cast("double") - (nToks - 1)) / nToks
    val tokScore = when(meanTokLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    val stopRatio = langIdHits(toks, "en").cast("double") / nToks
    val stopScore = least(stopRatio * 10.0, lit(1.0))
    Orc.r4((lenScore * 0.4) + (tokScore * 0.3) + (stopScore * 0.3))
  }

  /** Token counts: whitespace tokens and a BPE-ish regex segmentation
    * (word pieces + standalone punctuation). */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_ws_tokens", size(split(col(textCol), "\\s+")))
      .withColumn("n_bpe_tokens",
        size(expr(s"regexp_extract_all($textCol, '\\\\w+|[^\\\\w\\\\s]', 0)")))

  /** Deterministic hash-based train/val/test assignment — the training-
    * pipeline split primitive. Membership depends ONLY on the id (and
    * seed), never on partitioning, row order, or which subset of the
    * corpus is present — so incremental ingestion can never move a
    * document across splits (the property random `df.sample` lacks).
    * Fractions are percentage points of the 100-bucket hash space. */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      trainPct: Int = 80,
      valPct: Int = 10,
      seed: Long = 42L): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split: train=$trainPct val=$valPct")
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(100))
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
