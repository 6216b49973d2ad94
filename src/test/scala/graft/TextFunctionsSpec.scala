package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row = {
    spark.range(1).select(c).head()
  }

  test("repetitionStats: hand-computed duplicate lines and 2-gram dominance") {
    import graft.plans.NativeExprs.repetitionStats
    // 4 lines: "ab cd" ×2 (dup), "x", "ab cd x" — duplicate copies beyond
    // first: one "ab cd" (5 chars). line chars total 5+5+1+7 = 18.
    // tokens: ab cd ab cd x ab cd x → 2-grams: "ab cd"×3, "cd ab", "cd x"×2,
    // "x ab" → top=3 of 7 total
    val r = one(repetitionStats(lit("ab cd\nab cd\nx\nab cd x"), 2)).getStruct(0)
    assert(r.getLong(0) === 4L, "n_lines")
    assert(r.getLong(1) === 1L, "n_dup_lines")
    assert(r.getLong(2) === 5L, "dup_line_chars")
    assert(r.getLong(3) === 18L, "line_chars")
    assert(r.getLong(4) === 3L, "top_ngram_count")
    assert(r.getLong(5) === 7L, "n_ngrams")
    // trailing newline keeps its empty line (split limit -1 — the DuckDB
    // string_split parity the oracle depends on); two empties are a dup
    val t = one(repetitionStats(lit("a\n\n"), 2)).getStruct(0)
    assert(t.getLong(0) === 3L, "a + two empties")
    assert(t.getLong(1) === 1L, "second empty line is a duplicate copy")
    // empty text: one empty line, no tokens, all denominators guarded
    val e = one(repetitionStats(lit(""), 2)).getStruct(0)
    assert(e.getLong(0) === 1L)
    assert((1 to 5).map(e.getLong) === Seq(0L, 0L, 0L, 0L, 0L))
  }

  test("fingerprint is whitespace/case invariant") {
    val a = one(fingerprint(lit("Hello   World\n"))).getString(0)
    val b = one(fingerprint(lit("hello world"))).getString(0)
    assert(a === b)
    val c = one(fingerprint(lit("hello worlds"))).getString(0)
    assert(a !== c)
  }

  test("tokenCount counts non-whitespace runs") {
    assert(one(tokenCount(lit("a  b\tc\nd"))).getLong(0) === 4L)
    assert(one(tokenCount(lit(""))).getLong(0) === 0L)
  }

  test("shingles: fewer tokens than n gives empty array") {
    assert(one(size(shingles(lit("a b"), 3))).getInt(0) === 0)
    assert(one(shingles(lit("a b c d"), 3)).getSeq[String](0) === Seq("a b c", "b c d"))
  }

  test("simhash identical inputs -> hamming 0; different -> > 0") {
    val r = spark.range(1).select(
      hamming64(simhash64(lit("the quick brown fox")), simhash64(lit("the quick brown fox"))).as("same"),
      hamming64(simhash64(lit("the quick brown fox")), simhash64(lit("entirely different words here"))).as("diff"))
      .head()
    assert(r.getInt(0) === 0)
    assert(r.getInt(1) > 0)
  }

  test("jaccard: identical=1, disjoint=0") {
    val r = spark.range(1).select(
      jaccard(array(lit("a"), lit("b")), array(lit("a"), lit("b"))).as("same"),
      jaccard(array(lit("a")), array(lit("b"))).as("disj")).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 0.0)
  }

  test("langPredict ties resolve in fixed order") {
    assert(one(langPredict(lit("xyz qqq zzz"))).getString(0) === "en")
    assert(one(langPredict(lit("el que la y los"))).getString(0) === "es")
  }

  test("quality score bounded [0,1]") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val mm = docs.agg(min(qualityScore(col("text"))), max(qualityScore(col("text")))).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("native simhash expression matches composed-Column reference") {
    val docs = graft.sources.Tables(spark, sfDir).documents.limit(50)
    val mism = docs.select(
      simhash64(col("text")).as("native"),
      simhash64ViaColumns(col("text")).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(mism === 0L)
  }

  test("simhash parity holds on degenerate strings (empty, whitespace-only)") {
    import spark.implicits._
    val rows = Seq("", "   ", "\t\n", "x", "  x  ").toDF("text")
      .select(col("text"),
        simhash64(col("text")).as("native"),
        simhash64ViaColumns(col("text")).as("composed"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"parity broke on ${r.getString(0).map(_.toInt)}")
    }
    // empty input means zero tokens — signature must be 0, not xxhash64("")
    assert(rows.filter(r => r.getString(0).trim.isEmpty).forall(_.getLong(1) === 0L))
  }

  test("sequence packing: distributed cumsum == naive global window, bins bounded") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
    val budget = 512L
    val packed = graft.operators.Packing.sequencePack(
      docs, col("doc_id"), col("n_tokens"), budget, partitions = 7)
    val naive = docs.withColumn("cum",
      coalesce(sum(col("n_tokens")).over(
        Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val a = packed.select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = naive.select("doc_id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b, "two-phase cumsum must equal the single-partition window")
    // every bin except possibly the last stays within budget + one doc
    val bins = graft.operators.Packing.packedBins(
        docs, col("doc_id"), col("n_tokens"), budget)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val maxDoc = docs.agg(max(col("n_tokens"))).head().getLong(0)
    assert(bins.forall { case (_, t) => t <= budget + maxDoc })
    assert(bins.length > 1)
  }

  test("mixture resampling: deterministic, subset, and near the target shares") {
    import graft.operators.Sampling
    val docs = graft.sources.Tables(spark, sfDir).documents
    val target = Seq("en", "es", "de", "fr").map(_ -> 0.25).toMap
    val a = Sampling.resampleToMixture(docs, col("lang"), col("doc_id"), target)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.resampleToMixture(docs, col("lang"), col("doc_id"), target)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b, "hash-gated sampling must be deterministic")
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(all) && a.nonEmpty && a.size < all.size)
    // realized shares within a loose Bernoulli tolerance of the target
    val byLang = Sampling.resampleToMixture(docs, col("lang"), col("doc_id"), target)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = byLang.values.sum.toDouble
    byLang.foreach { case (lang, n) =>
      assert(math.abs(n / total - 0.25) < 0.12, s"$lang share ${n / total}")
    }
    // a different seed draws a different (same-sized-ish) sample
    val c = Sampling.resampleToMixture(docs, col("lang"), col("doc_id"), target, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(c !== a)
    // an infeasible target (stratum with no rows) fails loudly
    intercept[IllegalArgumentException] {
      Sampling.mixtureFractions(docs, col("lang"),
        Map("en" -> 0.5, "klingon" -> 0.5))
    }
  }

  test("temperature mixture: α=1 keeps natural shares, lower α flattens " +
      "toward uniform, and the shares are the exact √c rule at α=0.5") {
    import graft.operators.Sampling
    val docs = graft.sources.Tables(spark, sfDir).documents
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    val natural = counts.map { case (s, c) =>
      s -> c.toDouble / counts.map(_._2).sum }.toMap
    val s1 = Sampling.temperatureShares(docs, col("lang"), alpha = 1.0)
    natural.foreach { case (lang, share) =>
      assert(math.abs(s1(lang) - share) < 1e-12, s"α=1 natural share $lang") }
    // α=0.5: exactly √c/Σ√c with the ascending-lang fold order
    val pows = counts.map { case (s, c) => s -> math.sqrt(c.toDouble) }
    val z = pows.foldLeft(0.0)(_ + _._2)
    val s05 = Sampling.temperatureShares(docs, col("lang"), alpha = 0.5)
    pows.foreach { case (lang, p) =>
      assert(s05(lang) === p / z, s"α=0.5 sqrt share $lang") }
    // flattening: the max/min share ratio strictly shrinks as α falls
    def spread(m: Map[String, Double]) = m.values.max / m.values.min
    assert(spread(s05) < spread(s1), "lower α must flatten the mixture")
    // resample composes: output is a deterministic non-trivial subset
    val a = Sampling.resampleToTemperature(docs, col("lang"), col("doc_id"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.resampleToTemperature(docs, col("lang"), col("doc_id"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b && a.nonEmpty)
    intercept[IllegalArgumentException] {
      Sampling.temperatureShares(docs, col("lang"), alpha = 0.0)
    }
  }

  test("PII redaction masks planted emails/URLs/phones and counts them") {
    import spark.implicits._
    val planted = Seq(
      (1L, "contact alice@example.com or visit https://ex.com/a?b=1 now"),
      (2L, "call +1 (555) 123-4567 about the order"),
      (3L, "no pii in this sentence at all")
    ).toDF("id", "text")
    val out = planted.select(col("id"),
      redactPii(col("text")).as("r"), piiCounts(col("text")).as("c"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getStruct(2).getLong(0), r.getStruct(2).getLong(1),
          r.getStruct(2).getLong(2)))).toMap
    assert(out(1L)._1 === "contact <EMAIL> or visit <URL> now")
    assert((out(1L)._2, out(1L)._3, out(1L)._4) === ((1L, 1L, 0L)))
    assert(out(2L)._1 === "call <PHONE> about the order")
    assert((out(2L)._2, out(2L)._3, out(2L)._4) === ((0L, 0L, 1L)))
    assert(out(3L)._1 === "no pii in this sentence at all")
    // counts agree with the tags the redaction chain emits: an email
    // swallowed by a URL is a URL, and phones split by a URL stay two
    val tricky = Seq(
      (10L, "go to https://api.x.com/send?to=bob@mail.com please"),
      (11L, "call 555-123-9876 https://x.com 555-678-1234 now")
    ).toDF("id", "text")
    val t = tricky.select(col("id"), piiCounts(col("text")).as("c"))
      .collect().map(r => r.getLong(0) ->
        ((r.getStruct(1).getLong(0), r.getStruct(1).getLong(1), r.getStruct(1).getLong(2)))).toMap
    assert(t(10L) === ((0L, 1L, 0L)), s"url-embedded email miscounted: ${t(10L)}")
    assert(t(11L) === ((0L, 1L, 2L)), s"url-separated phones miscounted: ${t(11L)}")
    // char-class ratios sum to ~1
    val prof = planted.select(charClassProfile(col("text")).as("p"))
      .select(expr("p.alpha_ratio + p.digit_ratio + p.space_ratio + p.other_ratio"))
      .collect().map(_.getDouble(0))
    assert(prof.forall(s => math.abs(s - 1.0) < 0.001))
  }

  test("gopherQuality: each rule isolated on planted docs") {
    import spark.implicits._
    // base: 10 lines × "the of abcde fghij klmno pqrst" = 60 words, mean
    // 25/6 ≈ 4.17, 2 stopwords, all-alpha → passes every rule
    val line = "the of abcde fghij klmno pqrst"
    val good = Array.fill(10)(line).mkString("\n")
    val bullets = Array.fill(10)("• " + line).mkString("\n")  // only bullet rule
    val ellipsis = (Array.fill(4)(line + " ...") ++ Array.fill(6)(line))
      .mkString("\n")                                          // only ellipsis rule
    val symbols = good + " # # # # # # #"                      // only symbol rule
    val numeric = ("the of " + Array.fill(28)("abcde").mkString(" ") + " " +
      Array.fill(30)("12345").mkString(" "))                   // only alpha rule
    val noStops = Array.fill(60)("abcde").mkString(" ")        // only stopword rule
    val docs = Seq(
      (1L, good), (2L, bullets), (3L, ellipsis), (4L, symbols),
      (5L, numeric), (6L, noStops), (7L, "the of abcde"), (8L, ""))
      .toDF("doc_id", "text")
    val g = docs.select(col("doc_id"), gopherQuality(col("text")).as("g"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(g(1L).getAs[Long]("passes") === 1L)
    assert(g(1L).getAs[Long]("n_words") === 60L)
    assert(g(1L).getAs[Double]("mean_word_len") === 4.1667)
    assert(g(1L).getAs[Long]("stopword_distinct") === 2L)
    assert(g(2L).getAs[Double]("bullet_line_frac") === 1.0)
    assert(g(2L).getAs[Long]("passes") === 0L)
    assert(g(3L).getAs[Double]("ellipsis_line_frac") === 0.4)
    assert(g(3L).getAs[Double]("symbol_ratio") <= 0.1, "rule isolation")
    assert(g(3L).getAs[Long]("passes") === 0L)
    assert(g(4L).getAs[Double]("symbol_ratio") === 0.1045, "7/67")
    assert(g(4L).getAs[Long]("passes") === 0L)
    assert(g(5L).getAs[Double]("alpha_word_frac") === 0.5)
    assert(g(5L).getAs[Long]("passes") === 0L)
    assert(g(6L).getAs[Long]("stopword_distinct") === 0L)
    assert(g(6L).getAs[Long]("passes") === 0L)
    assert(g(7L).getAs[Long]("passes") === 0L, "word-count rule")
    assert(g(8L).getAs[Long]("n_words") === 0L)
    assert(g(8L).getAs[Double]("mean_word_len") === 0.0)
    assert(g(8L).getAs[Long]("passes") === 0L)
  }
}
