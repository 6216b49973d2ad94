package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Tripwires on the driver-generated fixtures themselves. The winnowing
  * (q42-q44) and media-feature (q71) oracles hash text per UTF-16 code
  * unit / UTF-8 octet on the Spark side but per DuckDB codepoint on the
  * oracle side — identical only while every fixture character is
  * single-byte ASCII. That held for every driver SF so far; if a future
  * fixture regeneration introduces multi-byte text, these fail by NAME
  * instead of the driver's correctness hashes failing inscrutably.
  */
class FixtureSpec extends SparkSpec {

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"$sf: documents.text is pure single-byte ASCII (oracle prerequisite)") {
      val docs = Tables(spark, s"/root/testdata/$sf").documents
      val nonAscii = docs.filter(
        length(col("text")) =!= octet_length(col("text"))).count()
      assert(nonAscii === 0L,
        s"$nonAscii documents carry multi-byte chars — the q42-q44/q71 " +
          "oracles' char-vs-byte lanes diverge; re-derive the oracles " +
          "before trusting driver hashes")
    }
  }
}
