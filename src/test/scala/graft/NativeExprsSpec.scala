package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.plans.NativeExprs

class NativeExprsSpec extends SparkSpec {

  test("native minhash signature matches composed reference") {
    val docs = Tables(spark, sfDir).documents.limit(50)
      .select(array_distinct(elementHashes(tokens(col("text")))).as("wh"))
    val mism = docs.select(
      minhashFromHashes(col("wh"), 16).as("native"),
      minhashFromHashesViaColumns(col("wh"), 16).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(mism === 0L)
  }

  test("native shingle stats match composed shingles") {
    val docs = Tables(spark, sfDir).documents.limit(100)
    val mism = docs.select(
      NativeExprs.shingleStats(col("text"), 3).as("st"),
      size(shingles(col("text"), 3)).cast("long").as("n_comp"),
      size(array_distinct(shingles(col("text"), 3))).cast("long").as("d_comp"))
      .filter(col("st.n_shingles") =!= col("n_comp") ||
        col("st.n_distinct_shingles") =!= col("d_comp"))
      .count()
    assert(mism === 0L)
  }

  test("native shingles are bit-identical to the composed form, incl. whitespace edges and null") {
    import spark.implicits._
    val fixture = Tables(spark, sfDir).documents.limit(200).select(col("text"))
    val weird = Seq("\ta b c d", "  a b  c   d  ", "a\nb c\td", "ab", "",
      null.asInstanceOf[String]).toDF("text")
    for (df <- Seq(fixture, weird); n <- Seq(2, 8)) {
      val mism = df.select(
        shingles(col("text"), n).as("native"),
        shinglesViaColumns(col("text"), n).as("composed"))
        .filter(not(col("native") <=> col("composed"))).count()
      assert(mism === 0L, s"shingle parity broke at n=$n")
    }
  }

  test("ordered_sum is bit-identical to the composed array_sort fold, incl. edges") {
    import spark.implicits._
    // fixture-shaped: per-doc folds over real token positions
    val lp = graft.operators.LangModel.bigramRows(
        Tables(spark, sfDir).documents.limit(200), col("text"), col("doc_id"))
      .select(col("doc_id"), col("pos"),
        (col("pos").cast("double") * 0.1 - hash(col("w1"), col("w2")).cast("double") / 1e12).as("v"))
    // edges: null value poisons the group; scrambled pos; single row
    val edges = Seq(
      (1L, 2, Some(0.5)), (1L, 0, Some(-0.25)), (1L, 1, Some(1e-17)),
      (2L, 0, Some(0.1)), (2L, 1, None),
      (3L, 7, Some(0.3))).toDF("doc_id", "pos", "v")
    for (df <- Seq(lp, edges)) {
      val mism = df.groupBy(col("doc_id")).agg(
        graft.plans.OrderedFold.orderedSum(col("pos"), col("v")).as("native"),
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("v")))),
            s => s.getField("v")),
          lit(0.0), _ + _).as("composed"))
        .filter(not(col("native") <=> col("composed"))).count()
      assert(mism === 0L)
    }
    // merge-order independence: 1 vs 32 shuffle partitions, same doubles
    val a = lp.coalesce(1).groupBy(col("doc_id"))
      .agg(graft.plans.OrderedFold.orderedSum(col("pos"), col("v")).as("s"))
    val b = lp.repartition(32, col("pos")).groupBy(col("doc_id"))
      .agg(graft.plans.OrderedFold.orderedSum(col("pos"), col("v")).as("s"))
    assert(a.join(b, Seq("doc_id")).filter(not(a("s") <=> b("s"))).count() === 0L)
  }

  test("native cosine is bitwise-identical to composed cosine") {
    val e = Tables(spark, sfDir).embeddings.limit(30)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    val mism = pairs.select(
      cosine(col("ea"), col("eb")).as("native"),
      cosineViaColumns(col("ea"), col("eb")).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(mism === 0L)
  }

  test("sorted-merge jaccard matches composed jaccard on hash sets") {
    val docs = Tables(spark, sfDir).documents.limit(80)
      .select(col("doc_id"),
        array_sort(array_distinct(elementHashes(tokens(col("text"))))).as("wh"))
    val a = docs.select(col("doc_id").as("ia"), col("wh").as("wa"))
    val b = docs.select(col("doc_id").as("ib"), col("wh").as("wb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    val mism = pairs.select(
      NativeExprs.jaccardSorted(col("wa"), col("wb")).as("native"),
      jaccard(col("wa"), col("wb")).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(mism === 0L)
  }

  test("winnowing: shared long substrings yield common fingerprints") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog near the river bank"
    val docs = Seq(
      (1L, s"prefix words here $shared and a different tail"),
      (2L, s"another opening $shared with other closing words"),
      (3L, "completely unrelated content about spark query planning engines")
    ).toDF("id", "text")
    val fps = docs.select(col("id"),
      NativeExprs.winnowFingerprints(col("text"), 5, 4).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val overlap12 = (fps(1L) intersect fps(2L)).size
    val overlap13 = (fps(1L) intersect fps(3L)).size
    assert(overlap12 > 0, "docs sharing a long phrase must share fingerprints")
    assert(overlap12 > overlap13 * 3 || overlap13 == 0)
    // deterministic
    val again = docs.select(NativeExprs.winnowFingerprints(col("text"), 5, 4))
      .collect().map(_.getSeq[Long](0).toSet)
    assert(again(0) === fps(1L))
  }

  test("native LSH signature matches composed hyperplane-bit reference") {
    val planes = graft.operators.Similarity.hyperplanes(nbits = 8, dim = 64)
    val e = Tables(spark, sfDir).embeddings.limit(100)
    val mism = e.select(
      graft.operators.Similarity.lshSignature(col("embedding"), planes).as("native"),
      graft.operators.Similarity.lshSignatureViaColumns(col("embedding"), planes).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(mism === 0L)
  }

  test("native expressions survive codegen-strict mode (no interpreted fallback)") {
    // with fallback disabled, a broken doGenCode throws instead of silently
    // degrading to nullSafeEval — this pins the generated-code path
    withSQLConf(
      "spark.sql.codegen.fallback" -> "false",
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      val docs = Tables(spark, sfDir).documents.limit(20)
        .select(col("doc_id"), col("text"),
          array_sort(array_distinct(elementHashes(tokens(col("text"))))).as("wh"))
      val out = docs.select(
        graft.functions.TextFunctions.simhash64(col("text")).as("sh"),
        NativeExprs.minhashSignature(col("wh"), 8).as("mh"),
        NativeExprs.shingleStats(col("text"), 3).as("st"),
        NativeExprs.winnowFingerprints(col("text"), 5, 4).as("wf"),
        NativeExprs.jaccardSorted(col("wh"), col("wh")).as("jac"),
        NativeExprs.cosineSim(array(lit(1.0), lit(2.0)), array(lit(2.0), lit(4.0))).as("cos"),
        NativeExprs.lshSignature(array(lit(1.0), lit(-1.0)),
          Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))).as("lsh"))
        .collect()
      assert(out.length === 20)
      assert(out.forall(_.getDouble(4) === 1.0))
      assert(out.forall(r => math.abs(r.getDouble(5) - 1.0) < 1e-12))
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("native expressions are callable from SQL after registration") {
    graft.plans.GraftFunctions.register(spark)
    Tables(spark, sfDir).documents.limit(20).createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, simhash64(text) AS s,
                shingle_stats(text, 3).n_shingles AS ns,
                size(winnow_fingerprints(text, 5, 4)) AS nf
         FROM docs_sql ORDER BY doc_id""").collect()
    assert(viaSql.length === 20)
    val viaCols = Tables(spark, sfDir).documents.limit(20)
      .select(col("doc_id"), graft.functions.TextFunctions.simhash64(col("text")).as("s"))
      .orderBy(col("doc_id")).collect()
    assert(viaSql.map(_.getLong(1)).toSeq === viaCols.map(_.getLong(1)).toSeq)
    val cs = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D))").head().getDouble(0)
    assert(cs === 1.0)
  }

  test("nfc_normalize: composes decomposed sequences, identity on NFC text") {
    import spark.implicits._
    val rows = Seq(
      (1L, "cafe\u0301"), //           e + combining acute -> \u00e9
      (2L, "caf\u00e9"), //             already composed    -> unchanged
      (3L, "man\u0303ana mixed"), //    n + combining tilde -> \u00f1
      (4L, "plain ascii"), //          identity fast path
      (5L, null.asInstanceOf[String])) // null-safe
      .toDF("id", "s")
    val got = rows.select(col("id"),
        graft.plans.NfcExpr.nfcNormalize(col("s")).as("n"),
        length(col("s")).as("lb"), length(col("n")).as("la"))
      .orderBy(col("id")).collect()
    assert(got(0).getString(1) === "caf\u00e9" && got(0).getInt(3) === 4
      && got(0).getInt(2) === 5)
    assert(got(1).getString(1) === "caf\u00e9")
    assert(got(2).getString(1) === "ma\u00f1ana mixed")
    assert(got(3).getString(1) === "plain ascii")
    assert(got(4).isNullAt(1))
    // and the SQL registration
    graft.plans.GraftFunctions.register(spark)
    assert(spark.sql("SELECT nfc_normalize('cafe\u0301')").head().getString(0)
      === "caf\u00e9")
  }

  test("sketch aggregates resolve from SQL text (kmv_minima, misra_gries)") {
    import spark.implicits._
    (0L until 100L).map(v => (v, s"i${v % 7}")).toDF("v", "s")
      .createOrReplaceTempView("agg_sql_probe")
    val kmv = spark.sql(
      "SELECT kmv_minima(xxhash64(v), 8) FROM agg_sql_probe")
      .head().getSeq[Long](0)
    val api = (0L until 100L).map(v => Tuple1(v)).toDF("v")
      .agg(graft.plans.Kmv.kmvMinima(xxhash64(col("v")), 8))
      .head().getSeq[Long](0)
    assert(kmv === api, "SQL and Column API must agree")
    val mg = spark.sql(
      "SELECT misra_gries(s, 16) FROM agg_sql_probe").head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(mg.length === 7)
    assert(mg.map(_.getLong(1)).sum === 100L, "capacity > distinct \u21d2 exact")
    // grouped from SQL, too
    val grouped = spark.sql(
      "SELECT s, kmv_minima(xxhash64(v), 4) AS m FROM agg_sql_probe GROUP BY s")
      .collect()
    assert(grouped.length === 7)
    assert(grouped.forall(_.getSeq[Long](1).length === 4))
  }
}
