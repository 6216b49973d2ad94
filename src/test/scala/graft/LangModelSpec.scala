package graft

import org.apache.spark.sql.functions._
import graft.operators.LangModel

/** Hand-computed pins for the bigram-LM / cross-entropy family (q93/q94/
  * q95). Train corpus: d1 = "a b a c", d2 = "b a b" →
  * c2: (a,b)=2, (b,a)=2, (a,c)=1; prefix counts c1: a=3, b=2; V=3.
  * Laplace: p(b|a)=3/6, p(c|a)=2/6, p(a|b)=3/5; unseen a=1/6, b=1/5;
  * OOV=1/3. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val train =
    Seq((1L, "a b a c"), (2L, "b a b")).toDF("doc_id", "text")
  private lazy val lm = LangModel.bigramLm(train, col("text"), col("doc_id"))

  test("bigramLm: hand-computed Laplace rows, unseen and OOV sentinels") {
    val rows = lm.collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows.size === 6, "3 observed + 2 unseen + 1 OOV")
    assert(rows(("a", "b"))._1 === 2L)
    assert(rows(("a", "b"))._2 === -1.0, "p(b|a)=3/6 → exactly -1 bit")
    assert(rows(("a", "c"))._1 === 1L)
    assert(math.abs(rows(("a", "c"))._2 - -1.584962501) < 2e-9, "log2(2/6)")
    assert(math.abs(rows(("b", "a"))._2 - -0.736965594) < 2e-9, "log2(3/5)")
    assert(math.abs(rows(("a", ""))._2 - -2.584962501) < 2e-9, "log2(1/6)")
    assert(math.abs(rows(("b", ""))._2 - -2.321928095) < 2e-9, "log2(1/5)")
    assert(math.abs(rows(("", ""))._2 - -1.584962501) < 2e-9, "OOV log2(1/3)")
  }

  test("bigramLm: probability mass per prefix sums to 1 (obs + unseen·rest)") {
    val rows = lm.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    val vocab = 3
    for (w1 <- Seq("a", "b")) {
      val obs = rows.filter(r => r._1 == w1 && r._2.nonEmpty)
      val unseen = rows.find(r => r._1 == w1 && r._2.isEmpty).get._3
      val mass = obs.map(r => math.pow(2, r._3)).sum +
        (vocab - obs.size) * math.pow(2, unseen)
      assert(math.abs(mass - 1.0) < 1e-6, s"mass($w1) = $mass")
    }
  }

  test("crossEntropy: hand-computed totals, kept no-bigram doc, OOV path") {
    // d3 scores an unseen bigram (c,c) — prefix c absent → OOV fallback;
    // d4 has no bigram at all → n=0, total 0, NULL bits_per_token.
    val score = Seq((1L, "a b a c"), (2L, "b a b"), (3L, "c c"), (4L, "solo"))
      .toDF("doc_id", "text")
    val got = LangModel.crossEntropy(score, lm, col("text"), col("doc_id"))
      .orderBy("doc_id").collect()
    assert(got.length === 4, "every input doc emits exactly one row")
    val d1 = got(0); val d2 = got(1); val d3 = got(2); val d4 = got(3)
    assert(d1.getLong(1) === 3L)
    // −(lp(a,b)+lp(b,a)+lp(a,c)) = 1 + 0.736965594 + 1.584962501
    assert(math.abs(d1.getDouble(2) - 3.321928) < 2e-6)
    assert(math.abs(d1.getDouble(3) - 1.107309) < 2e-6)
    assert(d2.getLong(1) === 2L)
    assert(math.abs(d2.getDouble(2) - 1.736966) < 2e-6)
    assert(math.abs(d2.getDouble(3) - 0.868483) < 2e-6)
    assert(d3.getLong(1) === 1L)
    assert(math.abs(d3.getDouble(3) - 1.584963) < 2e-6, "OOV bits")
    assert(d4.getLong(1) === 0L)
    assert(d4.getDouble(2) === 0.0)
    assert(d4.isNullAt(3), "no bigram → undefined bits_per_token")
  }

  test("crossEntropy is deterministic across runs (ordered IEEE fold)") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val m = LangModel.bigramLm(docs, col("text"), col("doc_id"))
    def run() = LangModel.crossEntropy(docs, m, col("text"), col("doc_id"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run() === run())
  }

  test("ceBands: exact terciles on hand scores; approx variant agrees") {
    val score = Seq((1L, "a b a c"), (2L, "b a b"), (3L, "c c"), (4L, "solo"))
      .toDF("doc_id", "text")
    val scored = LangModel.crossEntropy(score, lm, col("text"), col("doc_id"))
    val exact = LangModel.ceBands(scored, 3).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    // ascending bits: d2 (0.868) < d1 (1.107) < d3 (1.585); d4 excluded
    assert(exact.toSeq === Seq((1L, 2), (2L, 1), (3L, 3)))
    val approx = LangModel.ceBandsApprox(scored, 3, relativeError = 1e-6)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(approx.toSeq === exact.toSeq,
      "approxQuantile banding matches exact ntile on distinct scores")
  }

  test("ceBandsScalable is bit-identical to the exact ntile (incl. ties)") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val scored = LangModel.crossEntropy(docs,
      LangModel.bigramLm(docs, col("text"), col("doc_id")),
      col("text"), col("doc_id"))
    val exact = LangModel.ceBands(scored, 3).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    // sweep partition counts around/above the row count so empty
    // partitions, single-row partitions, and degenerate one-cut layouts
    // all exercise the prefix-offset arithmetic
    for (parts <- Seq(1, 2, 7, 32, 1000)) {
      val got = LangModel.ceBandsScalable(scored, 3, parts = parts)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      assert(got === exact, s"parts=$parts")
    }
    // tie-heavy frame: every score equal → bands split purely by doc_id
    val flat = spark.range(10).selectExpr("id AS doc_id", "5L AS n_bigrams",
      "50.0 AS total_bits", "2.5 AS bits_per_token")
    val e = LangModel.ceBands(flat, 4).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(2))).toSeq
    val g = LangModel.ceBandsScalable(flat, 4, parts = 8)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    assert(g === e, "all-tied scores band identically")
  }

  test("bigramLm on fixture: scalar columns only, sentinel invariants") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val m = LangModel.bigramLm(docs, col("text"), col("doc_id"))
    assert(m.schema.fields.forall(f =>
      !f.dataType.typeName.matches("array|map|struct")), "driver-sortable")
    val counts = m.groupBy(col("w1") === "", col("w2") === "").count().collect()
      .map(r => ((r.getBoolean(0), r.getBoolean(1)), r.getLong(2))).toMap
    assert(counts((true, true)) === 1L, "exactly one OOV row")
    assert(!counts.contains((true, false)), "'' never a real prefix")
    val nPrefixes = m.filter(col("w1") =!= "" && col("w2") === "").count()
    val nDistinctW1 = m.filter(col("w1") =!= "").select("w1").distinct().count()
    assert(nPrefixes === nDistinctW1, "one unseen row per prefix")
  }

  test("bigramLmPair is bit-identical to two separate bigramLm trainings") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val cond = col("lang") === "en"
    val (pairT, pairS) = LangModel.bigramLmPair(
      docs, col("text"), col("doc_id"), cond)
    val sepT = LangModel.bigramLm(docs.filter(cond), col("text"), col("doc_id"))
    val sepS = LangModel.bigramLm(docs, col("text"), col("doc_id"))
    for ((pair, sep, tag) <- Seq((pairT, sepT, "target"), (pairS, sepS, "source"))) {
      // full-outer join on the (w1, w2) key: any row in one but not the
      // other, or any cnt/logp bit difference, is a mismatch
      val a = pair.select(col("w1"), col("w2"),
        col("cnt").as("cnt_a"), col("logp").as("lp_a"))
      val b = sep.select(col("w1"), col("w2"),
        col("cnt").as("cnt_b"), col("logp").as("lp_b"))
      val mism = a.join(b, Seq("w1", "w2"), "full_outer")
        .filter(not(col("cnt_a") <=> col("cnt_b")) ||
          not(col("lp_a") <=> col("lp_b"))).count()
      assert(mism === 0L, s"$tag LM diverged from separate training")
    }
  }

  test("minKProb: k=1 is the full mean; smaller k selects the worst tokens") {
    val docs = graft.sources.Tables(spark, sfDir).documents.limit(80)
    val m = LangModel.bigramLm(docs, col("text"), col("doc_id"))
    // k = 1 keeps everything: mink_logp == -bits_per_token (the full
    // mean, same 6dp rounding — HALF_UP is sign-symmetric)
    val full = LangModel.crossEntropy(docs, m, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    val k1 = LangModel.minKProb(docs, m, col("text"), col("doc_id"), k = 1.0)
      .collect()
    k1.foreach { r =>
      val (n, bpt) = full(r.getLong(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === (if (n == 0) 0L else n))
      val got = Option(r.get(3)).map(_.asInstanceOf[Double])
      assert(got === bpt.map(b => r6(-b)), s"doc ${r.getLong(0)}")
    }
    // smaller k means a worse (lower) selected mean, monotonically
    val k20 = LangModel.minKProb(docs, m, col("text"), col("doc_id"), k = 0.2)
      .collect().map(r => r.getLong(0) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    k1.foreach { r =>
      (k20(r.getLong(0)), Option(r.get(3)).map(_.asInstanceOf[Double])) match {
        case (Some(lo), Some(all)) =>
          assert(lo <= all + 1e-9, s"doc ${r.getLong(0)}: min-20% above mean")
        case _ => ()
      }
    }
    // and m is the documented max(1, floor(0.2 n))
    LangModel.minKProb(docs, m, col("text"), col("doc_id"), k = 0.2)
      .filter(col("n_bigrams") > 0).collect().foreach { r =>
        assert(r.getLong(2) === math.max(1L, math.floor(0.2 * r.getLong(1)).toLong))
      }
  }
}
