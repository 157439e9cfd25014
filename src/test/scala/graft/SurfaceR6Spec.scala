package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR6

/** Round-6 curation surface: repetition scoring, contamination detection,
  * deterministic mixing — semantics + plan-shape assertions.
  */
class SurfaceR6Spec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("l12: known-repetition doc scores as expected") {
    val dir = new java.io.File("target/tmp/l12_known").getAbsolutePath
    // "a a a a b": 5 words, 2 uniq, top share 4/5; 2-grams are
    // [a a, a a, a a, a b] -> 4 total, 2 distinct -> dup ratio 0.5
    Seq((1L, "a a a a b", "en", "srcX", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SurfaceR6.l12Repetition(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 5 && row.getLong(2) == 2)
    assert(row.getDouble(3) == 0.4 && row.getDouble(4) == 0.8 &&
      row.getDouble(5) == 0.5, s"ratios: $row")
  }

  test("l13: benchmark gram set joins via broadcast, not shuffle") {
    val p = plan(SurfaceR6.l13Contamination(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"no broadcast in contamination join plan:\n$p")
  }

  test("l14: membership is a pure function of doc_id — stable under repartition") {
    val base = SurfaceR6.l14MixSample(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // recompute from a differently-partitioned scan; same rows must survive
    val docs = Tables.documents(spark, sfDir).repartition(17, col("lang"))
    val dir = new java.io.File("target/tmp/l14_repart").getAbsolutePath
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val re = SurfaceR6.l14MixSample(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(base == re, "mix membership changed under repartitioning")
  }

  test("l14: kept fraction tracks the per-lang weight") {
    val docs = Tables.documents(spark, sfDir)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SurfaceR6.l14MixSample(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = Map("en" -> 1.0, "de" -> 0.6, "fr" -> 0.5,
      "es" -> 0.4, "zh" -> 0.25)
    weights.foreach { case (lang, w) =>
      val frac = kept.getOrElse(lang, 0L).toDouble / total(lang)
      assert(math.abs(frac - w) < 0.25,
        s"$lang kept $frac, want ~$w (n=${total(lang)})")
    }
  }

  test("x6: observed metrics equal the relational aggregates") {
    val got = SurfaceR6.x6Observe(spark, sfDir).collect().head
    val want = Tables.lineitem(spark, sfDir).agg(
      count(lit(1)), Orc.r4(sum(col("l_quantity"))),
      count(when(col("l_discount") > lit(0.05), 1))).collect().head
    assert(got.getLong(0) == want.getLong(0) &&
      got.getDouble(1) == want.getDouble(1) &&
      got.getLong(2) == want.getLong(2), s"observe $got != agg $want")
  }

  test("s14b: XML file roundtrip preserves the table") {
    val src = Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name", "n_regionkey")
    val got = graft.queries.SurfaceR6b.s14bXmlFile(spark, sfDir)
    assert(got.count() == src.count())
    assert(got.except(src).isEmpty && src.except(got).isEmpty,
      "XML roundtrip changed rows")
  }

  test("s15: binaryFile rows carry the expected deterministic payload hashes") {
    val cs = "abcdefghijklmnop"
    val want = (0 until 8).map { id =>
      val content = s"file-$id:" +
        (0 until 64).map(j => cs((id * 31 + j * 7) % 16)).mkString
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(content.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (f"bin_$id%02d.bin", content.length.toLong, md)
    }.toSet
    val got = graft.queries.SurfaceR6b.s15Binaryfile(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want, s"binaryFile scan mismatch: $got")
  }

  test("m17: PCA components are orthonormal with descending variance") {
    val emb = Tables.embeddings(spark, sfDir).select(
      org.apache.spark.ml.functions.array_to_vector(col("embedding")).as("v"))
    val model = new org.apache.spark.ml.feature.PCA()
      .setK(2).setInputCol("v").setOutputCol("pc").fit(emb)
    val pc = model.pc // 64 x 2, column-major
    val colv = (k: Int) => Array.tabulate(pc.numRows)(i => pc(i, k))
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(colv(0), colv(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(colv(1), colv(1)) - 1.0) < 1e-9)
    assert(math.abs(dot(colv(0), colv(1))) < 1e-9, "components not orthogonal")
    val ev = model.explainedVariance.toArray
    assert(ev(0) >= ev(1) && ev(1) > 0, s"variance not descending: ${ev.toSeq}")
  }

  test("m18: emitted correlations agree with df.stat.corr") {
    val got = graft.queries.SurfaceR6b.m18CorrMatrix(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.size == 6 && got.values.forall(v => v >= -1.0 && v <= 1.0))
    val li = Tables.lineitem(spark, sfDir)
    val direct = li.stat.corr("l_quantity", "l_extendedprice")
    val mine = got(("l_quantity", "l_extendedprice"))
    assert(math.abs(direct - mine) < 1e-3, s"corr $mine vs stat.corr $direct")
  }

  test("t13: chained streaming agg equals the batch ladder under the same cutoff") {
    val streamed = graft.queries.StreamingQueries.t13ChainedAgg(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val e = Tables.events(spark, sfDir)
    val maxTs = e.agg(max(col("ts"))).head.getTimestamp(0).toInstant
    val wm = maxTs.minusSeconds(30 * 60)
    val batch = e
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .where(col("window.end") <= lit(java.sql.Timestamp.from(wm)))
      .select(unix_timestamp(col("window.start")).as("s"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty, "chained agg emitted nothing")
    assert(streamed == batch,
      s"stream minus batch: ${streamed -- batch}; batch minus stream: ${batch -- streamed}")
  }

  test("lp12: kept chunks are exactly the distinct chunk population") {
    val r = graft.queries.SurfaceR6c.lp12ChunkDedup(spark, sfDir)
      .agg(sum(col("n_chunks")).as("total"), sum(col("n_dropped")).as("dropped"))
      .head
    val docs = Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("w")).where(size(col("w")) >= 3)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 3, 3), i -> array_join(slice(w, i + 1, 3), ' '))"))
        .as("chunk"))
    val distinctChunks = docs.select("chunk").distinct().count()
    assert(r.getLong(0) - r.getLong(1) == distinctChunks,
      s"kept ${r.getLong(0) - r.getLong(1)} != distinct $distinctChunks")
    assert(r.getLong(1) > 0, "dedup is vacuous: zero dropped chunks")
  }

  test("m19: summarizer stats match a direct aggregate on dim 0") {
    val got = graft.queries.SurfaceR6c.m19VectorStats(spark, sfDir)
      .where(col("dim") === 0).head
    val want = Tables.embeddings(spark, sfDir)
      .select(col("embedding").getItem(0).cast("double").as("x"))
      .agg(Orc.r4(avg(col("x"))).as("m"), Orc.r4(var_samp(col("x"))).as("v"))
      .head
    assert(got.getDouble(1) == want.getDouble(0) &&
      got.getDouble(2) == want.getDouble(1),
      s"dim0 stats $got != direct $want")
  }

  test("lg: pagerank conserves mass and fixes isolated nodes at 1-d") {
    val ranks = graft.queries.SurfaceR6c.lgPagerank(spark, sfDir).cache()
    val n = ranks.count()
    val total = ranks.agg(sum("rank")).head.getDouble(0)
    // round-half-up integer contributions can overshoot true mass by at
    // most half a micro-unit per directed edge per round — absorb that
    assert(total <= n + 0.01, s"rank mass $total exceeds node count $n")
    assert(ranks.where(col("rank") < 0.15 - 1e-4).isEmpty,
      "rank below the (1-d) floor")
    // candidate graph is non-empty on the fixtures, so some node must
    // accumulate inflow above the floor
    assert(ranks.where(col("rank") > 0.15 + 1e-4).count() > 0,
      "no node above the floor: graph vacuous?")
    // micro-unit and rounded readouts must agree
    assert(ranks.where(
      Orc.r4(col("rank_micro").cast("double") / 1000000L) =!= col("rank"))
      .isEmpty, "rank_micro/rank readouts disagree")
  }

  test("f17: every source maps to exactly one parsed host") {
    val hosts = graft.queries.SurfaceR6d.f17UrlFuncs(spark, sfDir)
      .select("host").distinct().count()
    val sources = Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(hosts == sources, s"$hosts hosts != $sources sources")
  }

  test("m20: chi-square dof matches the category cardinalities") {
    val r = graft.queries.SurfaceR6d.m20Chisquare(spark, sfDir).head
    val li = Tables.lineitem(spark, sfDir)
    val nf = li.select("l_returnflag").distinct().count()
    val nl = li.select("l_linestatus").distinct().count()
    assert(r.getLong(1) == (nf - 1) * (nl - 1), s"dof ${r.getLong(1)}")
    assert(r.getDouble(0) > 0.0)
  }

  test("q17: the shared aggregate's exchange is computed once and reused") {
    // AQE resolves exchange reuse at stage materialization, so inspect
    // the FINAL adaptive plan (after execution), not the initial one.
    val df = graft.queries.SurfaceR6d.q17ExchangeReuse(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"no exchange reuse in final plan:\n$p")
  }

  test("lt2: interpolation fills real gaps and stays inside the neighbor envelope") {
    val rows = graft.queries.SurfaceR6e.lt2LinearInterp(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))
    assert(rows.exists(_._4), "no filled cells: interpolation vacuous at this sf")
    // every filled interior cell lies within [min, max] of its type's
    // observed values (linear interpolation can't overshoot neighbors)
    val byType = rows.groupBy(_._1)
    byType.foreach { case (t, rs) =>
      val obs = rs.filter(!_._4).flatMap(_._3)
      if (obs.nonEmpty) {
        val (lo, hi) = (obs.min, obs.max)
        rs.filter(_._4).flatMap(_._3).foreach { v =>
          assert(v >= lo - 1e-9 && v <= hi + 1e-9,
            s"type $t interpolated $v outside [$lo, $hi]")
        }
      }
    }
  }

  test("m22: isotonic calibration is monotone non-decreasing in the feature") {
    val pts = graft.queries.SurfaceR6f.m22Isotonic(spark, sfDir)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(pts.length > 1)
    pts.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(x1 < x2 && y1 <= y2 + 1e-9,
        s"calibration not monotone: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("s16: _metadata.row_index is dense and unique within each file") {
    val dir = new java.io.File("target/tmp/s16_meta").getAbsolutePath
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
    val meta = spark.read.parquet(dir)
      .select(col("_metadata.file_path").as("f"),
        col("_metadata.row_index").as("i"))
    val perFile = meta.groupBy("f")
      .agg(count(lit(1)).as("n"), countDistinct("i").as("d"),
        min("i").as("lo"), max("i").as("hi"))
      .collect()
    perFile.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) && r.getLong(3) == 0L &&
        r.getLong(4) == r.getLong(1) - 1,
        s"row_index not dense/unique in ${r.getString(0)}: $r")
    }
  }

  test("a21: GROUP BY ALL matches the explicit grouping list") {
    val all = SurfaceR6.a21GroupByAll(spark, sfDir).collect().toSeq
    val explicit = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"), Orc.r4(sum(col("l_quantity"))).as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus", "n_rows", "sum_qty")
      .collect().toSeq
    assert(all == explicit)
  }
}
