package graft

import org.apache.spark.sql.functions._
import graft.operators.Cleaning

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def clean(rows: (Long, String)*) =
    Cleaning.c4Clean(rows.toDF("doc_id", "text"), col("text"), col("doc_id"),
        minLines = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  test("line rules: terminal punctuation, three words, javascript") {
    val page = Seq(
      "This line is properly terminated.",   // kept
      "so is this one, with a question?",    // kept
      "no terminal punctuation here",        // dropped: punct
      "Too short.",                          // dropped: < 3 words
      "please enable javascript to view.",   // dropped: javascript
      "Quoted ending works fine.\"",         // kept
      "").mkString("\n")                     // dropped: empty
    val Seq((_, text, keptN, dropN, pageKept)) = clean((1L, page)).toSeq
    assert(keptN === 3L && dropN === 4L && pageKept === 1L)
    assert(text === Seq("This line is properly terminated.",
      "so is this one, with a question?",
      "Quoted ending works fine.\"").mkString("\n"))
  }

  test("page rules: min surviving lines, lorem ipsum, curly brace") {
    val goodLine = "A perfectly reasonable sentence."
    val short = clean((1L, goodLine))                      // 1 kept < 2
    assert(short(0)._5 === 0L && short(0)._2 === "")
    assert(short(0)._3 === 1L, "kept_lines still reports the survivors")
    val lorem = clean((2L, s"$goodLine\n$goodLine\nLorem Ipsum dolor sit."))
    assert(lorem(0)._5 === 0L, "lorem ipsum pages discarded (ci)")
    val brace = clean((3L, s"$goodLine\n$goodLine\nvar x = { a: 1 };"))
    assert(brace(0)._5 === 0L, "curly-brace pages discarded")
    val fine = clean((4L, s"$goodLine\n$goodLine"))
    assert(fine(0)._5 === 1L && fine(0)._2 === s"$goodLine\n$goodLine")
  }

  test("fixture corpus degenerates honestly: no punctuation, nothing kept") {
    val got = Cleaning.c4Clean(
      graft.sources.Tables(spark, sfDir).documents, col("text"), col("doc_id"))
    assert(got.filter(col("kept_lines") > 0).count() === 0L)
    assert(got.count() ===
      graft.sources.Tables(spark, sfDir).documents.count(), "docs never dropped")
  }
}
