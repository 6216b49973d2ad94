package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

/** Test-scope scaling probe (not part of the API): replicates the
  * embeddings corpus `reps`× (vec_id remapped to stay unique) and times
  * the four ANN search paths warm, so NOTES can carry MEASURED evidence
  * for the scale narrative instead of asserted plan shapes alone —
  * brute force is quadratic in corpus × queries, the bucketed/coded
  * paths should grow sublinearly in wall time on the same data.
  * Run: sbt "Test/runMain graft.ScaleProbe [sfDir] [reps]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(50)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.sources.Tables(spark, dir).embeddings
    // repartition: the raw crossJoin collapses to ONE partition, and a
    // single giant partition turns the refine window's per-partition
    // group-limit into a one-task straggler (~40µs/row measured) — the
    // realistic shape of a big corpus is many partitions
    val big = base
      .crossJoin(spark.range(reps.toLong).select(col("id").as("rep")))
      .select((col("vec_id") * reps + col("rep")).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(32)
      .localCheckpoint(true)
    val n = big.count()
    val queries = big.filter(col("vec_id").isin(0L, 1000L, 50000L))

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val rows = f
      println(f"[scale] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows, corpus $n)")
    }

    time("bruteforce_topk") {
      Similarity.bruteForceTopK(big, queries, 5).count()
    }
    time("lsh_topk") {
      Similarity.lshTopK(big, queries, k = 5, nbits = 8).count()
    }
    time("ivf_topk (training incl.)") {
      Similarity.ivfTopK(big, queries, k = 5, nlist = 8, nprobe = 3,
        corpusRows = Some(n)).count()
    }
    val books = Pq.pqCodebooks(big, m = 8, ksub = 16, iters = 3, corpusRows = Some(n))
    time("pq_encode (map-only)") {
      Pq.pqEncode(big, books).count()
    }
    time("pq_adc_topk (books given)") {
      Pq.pqAdcTopK(big, queries, k = 5, books, refine = 50).count()
    }
    // the residual IVF×PQ composition: model trained once (the deployment
    // shape), search scans only nprobe of nlist lists — should sit well
    // under the flat ADC number above on the same corpus
    val (centroids, rBooks, codes) = Pq.ivfPqModel(
      big, nlist = 8, iters = 3, m = 8, ksub = 16,
      idCol = "vec_id", embCol = "embedding", dim = 64,
      trainCap = 65536L, corpusRows = Some(n), residual = true)
    val codesCp = codes.localCheckpoint(true)
    time("pqivf_residual (model given)") {
      Pq.ivfPqSearch(codesCp, big, queries, centroids, rBooks,
        residual = true, dim = 64, k = 5, nprobe = 3, refine = 50,
        idCol = "vec_id", embCol = "embedding").count()
    }
    // all-corpus kNN graph: the expression path embeds nlist literal
    // cosines per projection; the joined path meets a broadcast centroid
    // TABLE — same output (parity-pinned in SimilaritySpec), and the one
    // that must stay flat per row as nlist grows toward √N
    val gModel = Similarity.kmeansCentroids(
      big, 8, 3, trainCap = 65536L, corpusRows = Some(n))
    time("knn_graph (expr, nlist=8)") {
      Similarity.knnGraph(big, k = 3, nlist = 8, nprobe = 2,
        model = Some(gModel)).count()
    }
    time("knn_graph (join, nlist=8)") {
      Similarity.knnGraphJoined(big, k = 3, nlist = Some(8), nprobe = 2,
        model = Some(gModel)).count()
    }
    time("knn_graph (join, nlist=√N)") {
      Similarity.knnGraphJoined(big, k = 3, nprobe = 2,
        corpusRows = Some(n)).count()
    }
    spark.stop()
  }
}
