package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Dedup, LangModel, Similarity}
import graft.functions.TextFunctions.gopherQuality

/** Test-scope scaling probe for the text/LLM-pipeline families (the
  * ScaleProbe pattern on documents instead of embeddings): replicates
  * the corpus reps× (doc_id remapped, so every doc gains reps-1 exact
  * twins — deliberately the WORST case for the dedup/span families) and
  * times each operator warm through a noop write. Run:
  * sbt "Test/runMain graft.TextScaleProbe [sfDir] [reps]"
  */
object TextScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.sources.Tables(spark, dir).documents
    val big = base
      .crossJoin(spark.range(reps.toLong).select(col("id").as("rep")))
      .select((col("doc_id") * reps + col("rep")).as("doc_id"),
        col("text"), col("lang"), col("source"))
      .repartition(32).localCheckpoint(eager = true)
    val n = big.count()

    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[scale] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (corpus $n docs)")
    }

    time("gopher_scan") {
      big.select(col("doc_id"), gopherQuality(col("text")).as("g"))
    }
    time("duplicate_spans (strings)") {
      Dedup.duplicateSpans(big, col("text"), col("doc_id"), n = 8)
    }
    time("duplicate_spans (hashGrams)") {
      Dedup.duplicateSpans(big, col("text"), col("doc_id"), n = 8,
        hashGrams = true)
    }
    time("span_scrub") {
      Dedup.scrubDuplicateSpans(big, col("text"), col("doc_id"), n = 8)
    }
    time("bigram_lm") {
      LangModel.bigramLm(big, col("text"), col("doc_id"))
    }
    time("cross_entropy (lm incl.)") {
      LangModel.crossEntropy(big,
        LangModel.bigramLm(big, col("text"), col("doc_id")),
        col("text"), col("doc_id"))
    }
    time("bpe_merges (6 rounds)") {
      Bpe.mergeTable(big, col("text"), 6)
    }
    time("decon (explode both)") {
      Dedup.contamination(
        big.filter(col("doc_id") % 10 =!= 0),
        big.filter(col("doc_id") % 10 === 0),
        col("text"), col("doc_id"), n = 8)
    }
    time("decon (scan-first)") {
      Dedup.contaminationScanFirst(
        big.filter(col("doc_id") % 10 =!= 0),
        big.filter(col("doc_id") % 10 === 0),
        col("text"), col("doc_id"), n = 8)
    }
    time("nb_train") {
      graft.operators.Classifier.naiveBayes(
        big, col("text"), col("doc_id"), col("lang"))
    }
    time("nb_score (train incl.)") {
      graft.operators.Classifier.nbScores(big,
        graft.operators.Classifier.naiveBayes(
          big, col("text"), col("doc_id"), col("lang")),
        col("text"), col("doc_id"))
    }
    time("dsir_weights (pair-trained)") {
      val (lmT, lmS) = LangModel.bigramLmPair(
        big, col("text"), col("doc_id"), col("lang") === "en")
      graft.operators.Dsir.importanceWeights(
        big, lmT, lmS, col("text"), col("doc_id"))
    }
    time("heavy_hitters_2gram") {
      big.select(explode(graft.functions.TextFunctions.shingles(col("text"), 2)).as("item"))
        .agg(graft.plans.HeavyHitters.misraGries(col("item"), 2048).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item"), col("e.est"))
    }
    time("dhash_pairs") {
      graft.operators.Multimodal.dhashNearDupPairs(
        graft.operators.Multimodal.dhashTable(
          graft.operators.Multimodal.ingestFromDocuments(big)))
    }
    time("incremental_dedup") {
      Dedup.dedupAgainstSignatureIndex(
        big.filter(col("doc_id") % 2 === 1),
        Dedup.signatureTable(big.filter(col("doc_id") % 2 === 0),
          col("text"), col("doc_id")),
        col("text"), col("doc_id"))
    }
    spark.stop()
  }
}
