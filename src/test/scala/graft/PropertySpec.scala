package graft

import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.migration._

/** Property-based invariants (SURVEY §5): conservation, caps, the
  * all-or-nothing email rule, fingerprint invariance — on ScalaCheck
  * generators, not just the curated fixtures. (Plain Gen sampling; the
  * scalatestplus bridge isn't in the offline dependency cache.) */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val p = Gen.Parameters.default.withSize(20)
    (0 until n * 4).iterator
      .flatMap(i => g.apply(p, org.scalacheck.rng.Seed(42L + i)))
      .take(n).toSeq
  }

  private val nameGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 4)
    parts <- Gen.listOfN(n, Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(30)))
  } yield parts.mkString(" ")

  private val emailGen: Gen[String] = for {
    user <- Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(10))
    dom <- Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(10))
  } yield s"$user@$dom.com"

  private val multiEmailGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 4)
    emails <- Gen.listOfN(n, emailGen)
    sep <- Gen.oneOf(" ", ";", ",")
  } yield emails.mkString(sep)

  test("customer transform: conservation + caps hold on generated input") {
    import spark.implicits._
    val rows = samples(Gen.zip(multiEmailGen, nameGen), 60)
    val df = rows.map { case (e, n) =>
      Schemas.GrooveCustomer(e, n, None, None, None, None, None, None, None, None)
    }.toDF()
    val out = CustomerTransform.toHelpScout(df)
    assert(ErrorChannel.conserves(out))
    val okRows = ErrorChannel.ok(out).collect()
    assert(okRows.length === rows.length)
    assert(okRows.forall { r =>
      val fn = r.getAs[String]("first_name")
      val org = r.getAs[String]("organization")
      (fn == null || fn.length <= 40) && (org == null || org.length <= 60)
    })
    // all generated parts are valid emails => primary is the first part,
    // never the unsplit blob
    assert(okRows.forall(r => !r.getAs[String]("primary_email").contains(";")))
  }

  test("email split all-or-nothing: any invalid part falls back to whole string") {
    val lists = samples(Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, emailGen)), 10)
    val inputs = lists.map(emails => (emails :+ "not an email !").mkString(";"))
    import spark.implicits._
    val got = inputs.toDF("email")
      .select(MigrationFunctions.primaryEmail(col("email")).as("p"), col("email"))
      .collect()
    assert(got.forall(r => r.getString(0) === r.getString(1)))
    // and with only valid parts, primary == head
    val clean = lists.map(_.mkString(";"))
    val gotClean = clean.toDF("email")
      .select(MigrationFunctions.primaryEmail(col("email")).as("p"), col("email"))
      .collect()
    assert(gotClean.forall(r => r.getString(0) === r.getString(1).split(";").head))
  }

  test("asof join conserves left rows and never matches a later right row") {
    import spark.implicits._
    val evGen = Gen.zip(Gen.chooseNum(1L, 6L), Gen.chooseNum(0L, 100000L))
    val leftRows = samples(evGen, 80).zipWithIndex
      .map { case ((k, t), i) => (k, t, i.toLong) }
    val rightRows = samples(evGen, 50).map { case (k, t) => (k, t) }
    val left = leftRows.toDF("k", "t", "tag")
      .select(col("k"), timestamp_seconds(col("t")).as("ts"), col("tag"))
    val right = rightRows.toDF("k", "t")
      .select(col("k"), timestamp_seconds(col("t")).as("ts"))
    val out = graft.operators.Temporal.asofJoin(left, right, Seq("k"), "ts", "ts")
      .select(col("k"), col("ts").cast("long").as("t"),
        col("tag"), col("ts_asof").cast("long").as("m"))
      .collect()
    assert(out.length === leftRows.length, "as-of must conserve left rows")
    // matched ts is the max right ts <= left ts for the key (brute force)
    val byKey = rightRows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    out.foreach { r =>
      val expect = byKey.getOrElse(r.getLong(0), Nil).filter(_ <= r.getLong(1))
      val got = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(got === (if (expect.isEmpty) None else Some(expect.max)),
        s"row ${r.getLong(2)}: got $got want ${expect.sorted}")
    }
  }

  test("connected components: labels are cluster minima, closed under edges") {
    import spark.implicits._
    val pairGen = Gen.zip(Gen.chooseNum(1L, 30L), Gen.chooseNum(1L, 30L))
      .suchThat { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val pairs = samples(pairGen, 40).distinct
    val labels = graft.operators.Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // closure: both endpoints of every edge share a label
    pairs.foreach { case (a, b) =>
      assert(labels(a) === labels(b), s"edge ($a,$b) crosses clusters")
    }
    // minimality: each label is the smallest member of its cluster,
    // and idempotence: re-clustering the labeled pairs changes nothing
    labels.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min === label)
    }
    val again = graft.operators.Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === labels)
  }

  test("fingerprint: whitespace and case never change the dedup key") {
    import spark.implicits._
    val words = samples(Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(20)), 30)
    val variants = words.flatMap(s =>
      Seq((s, s), (s, s.toUpperCase), (s, s"  $s "), (s, s + " ")))
    val distinctPerKey = variants.toDF("key", "variant")
      .groupBy(col("key"))
      .agg(countDistinct(graft.functions.TextFunctions.fingerprint(col("variant"))).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(distinctPerKey === 1L)
  }

  test("chunking: coverage, overlap, bounds on generated documents") {
    import spark.implicits._
    val texts = samples(Gen.alphaStr.map(_.take(700)), 40) ++ Seq("", "x", "y" * 200)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val chunks = graft.operators.Packing.chunkDocuments(
        df, col("text"), col("doc_id"), chunkChars = 200, overlapChars = 50)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val cs = chunks.getOrElse(i.toLong, Array.empty)
      if (t.isEmpty) assert(cs.isEmpty, s"doc $i: empty doc must emit no chunks")
      else {
        // chunk_ids are 0..n-1; stitched with 150-char stride they rebuild
        // the document exactly (overlap regions agree by construction)
        assert(cs.map(_.getInt(1)).toSeq === cs.indices)
        val rebuilt = cs.map(_.getString(2)).zipWithIndex.map {
          case (c, 0) => c
          case (c, _) => c.drop(50)
        }.mkString
        assert(rebuilt === t, s"doc $i: chunks must cover the text exactly")
        assert(cs.forall(_.getString(2).length <= 200))
        assert(cs.init.forall(_.getString(2).length === 200))
      }
    }
  }

  test("split assignment: exhaustive, disjoint, deterministic, near-target") {
    import spark.implicits._
    val df = (0L until 4000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = graft.operators.Sampling.assignSplits(df, col("id"), splits)
    val counts = labeled.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 4000L, "every row gets exactly one label")
    assert(counts.keySet === Set("train", "val", "test"))
    // hash-gated fractions land near target (±4% absolute at n=4000)
    assert(math.abs(counts("train") / 4000.0 - 0.8) < 0.04, counts.toString)
    assert(math.abs(counts("val") / 4000.0 - 0.1) < 0.04, counts.toString)
    // deterministic: identical assignment on re-run, different under a
    // different seed (the salt actually matters)
    val again = graft.operators.Sampling.assignSplits(df, col("id"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = labeled.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === first)
    val reseeded = graft.operators.Sampling.assignSplits(df, col("id"), splits, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reseeded !== first)
    // malformed fractions are rejected, not renormalized
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.assignSplits(df, col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.2))
    }
  }

  test("shard assignment: exhaustive, contiguous in-shard positions, " +
      "deterministic, seed-sensitive") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val out = graft.operators.Sampling.shardAssignment(df, col("id"), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 2000 && out.map(_._1).distinct.length === 2000,
      "every row exactly once")
    assert(out.forall(t => t._2 >= 0 && t._2 < 8))
    // positions are a contiguous 1..n ranking inside each shard
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    // hash spreads rows across shards roughly evenly (±40% of uniform)
    val sizes = out.groupBy(_._2).values.map(_.length)
    assert(sizes.min > 2000 / 8 * 0.6 && sizes.max < 2000 / 8 * 1.4)
    val again = graft.operators.Sampling.shardAssignment(df, col("id"), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
    val reseeded = graft.operators.Sampling
      .shardAssignment(df, col("id"), 8, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(reseeded.sortBy(_._1).toSeq !== out.sortBy(_._1).toSeq)
  }

  test("bottom-k sample: exact ground truth, stratum sizes, coordination") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")
    val k = 7
    val got = graft.operators.Sampling
      .bottomKSample(df, col("stratum"), col("id"), k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // ground truth: the same unit hash computed as a column, sorted in
    // Scala — the sample IS the k smallest (u, id) per stratum
    val hashes = df.select(col("id"), col("stratum"),
        (pmod(xxhash64(col("id"), lit(42L)), lit(1000000000L))
          .cast("double") / 1e9).as("u"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val truth = hashes.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(t => (t._3, t._1)).take(k).zipWithIndex
        .map { case ((id, str, _), i) => (id, str, (i + 1).toLong) }
    }.toSet
    assert(got.toSet === truth)
    assert(got.groupBy(_._2).values.forall(_.length == k))
    // coordination: dropping non-sampled docs leaves the sample intact
    // (a doc is displaced only by a smaller hash, never by a re-roll)
    val sampledIds = got.map(_._1).toSet
    val shrunk = df.filter(col("id").isin(
      (sampledIds ++ (0L until 50L)).toSeq.map(Long.box): _*))
    val again = graft.operators.Sampling
      .bottomKSample(shrunk, col("stratum"), col("id"), k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.toSet === got.toSet,
      "sample must be stable when only non-sampled docs are removed")
    // small stratum: returns the whole stratum, ranked
    val tiny = Seq((1L, "t"), (2L, "t")).toDF("id", "stratum")
    val tinyGot = graft.operators.Sampling
      .bottomKSample(tiny, col("stratum"), col("id"), k)
      .collect()
    assert(tinyGot.length === 2)
  }

  test("token budget mix: hand-computed allocation, caps and leftover") {
    import spark.implicits._
    // two sources: A has 10 tokens, B has 100; budget 120, repeat cap 2x
    // target = 60 each; A caps at 20 (epochs 2), B takes 60 (epochs 0.6);
    // leftover = 120 - 80 = 40
    val docs = Seq(
      ("a1", "t1 t2 t3 t4 t5", "A"), ("a2", "t1 t2 t3 t4 t5", "A"),
      ("b1", ("x " * 100).trim, "B"))
      .toDF("id", "text", "source")
    val out = graft.operators.Sampling
      .tokenBudgetMix(docs, col("text"), col("source"),
        budget = 120L, maxRepeat = 2.0)
      .orderBy("source").collect()
    assert(out.length === 2)
    val a = out(0); val b = out(1)
    assert(a.getString(0) === "A" && a.getLong(1) === 10L)
    assert(a.getDouble(2) === 20.0 && a.getDouble(3) === 2.0 &&
      a.getLong(4) === 1L)
    assert(b.getString(0) === "B" && b.getLong(1) === 100L)
    assert(b.getDouble(2) === 60.0 && b.getDouble(3) === 0.6 &&
      b.getLong(4) === 0L)
    assert(a.getDouble(5) === 40.0 && b.getDouble(5) === 40.0)
  }

  test("weightedBottomK: brute-force parity, weight bias, zero-weight exclusion") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (0L until 2000L).map(id => (id, (id % 9).toInt)).toDF("id", "w")
    val got = graft.operators.Sampling
      .weightedBottomK(df, col("id"), col("w"), k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute force: min over j < w of xxhash64(id, j), bottom 50
    val keyed = df.filter(col("w") > 0)
      .withColumn("j", explode(sequence(lit(0L), col("w").cast("long") - 1)))
      .select(col("id"), col("w").cast("long").as("w"),
        xxhash64(col("id"), col("j")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case ((id, w), hs) =>
        (id, w, hs.map(_._3).min) }
      .toSeq.sortBy(t => (t._3, t._1)).take(50)
    assert(got.toSeq === keyed)
    // every id with w == 0 is excluded; determinism across re-runs
    assert(got.forall(_._2 > 0))
    val again = graft.operators.Sampling
      .weightedBottomK(df.repartition(7), col("id"), col("w"), k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === got.toSeq, "sample must not depend on layout")
    // bias: across many ids, mean weight of winners exceeds corpus mean
    // (weight-8 ids hold 8 tickets to weight-1's one)
    val meanW = got.map(_._2).sum.toDouble / got.length
    val corpusMeanPositive = (1 to 8).sum.toDouble / 8 // weights 1..8 uniform
    assert(meanW > corpusMeanPositive,
      s"winners' mean weight $meanW should exceed corpus mean $corpusMeanPositive")
    // an id appearing with SEVERAL weights wins at most one slot, at the
    // max-weight semantics (ticket sets j < w are nested)
    val dup = Seq((1L, 3), (1L, 5), (2L, 4)).toDF("id", "w")
    val d = graft.operators.Sampling
      .weightedBottomK(dup, col("id"), col("w"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(d.length === 2, "duplicate id must occupy one slot")
    assert(d.find(_._1 == 1L).get._2 === 5L, "max weight competes")
    val only5 = graft.operators.Sampling
      .weightedBottomK(Seq((1L, 5), (2L, 4)).toDF("id", "w"),
        col("id"), col("w"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(d.toSeq === only5.toSeq, "dup weights ≡ the max weight alone")
  }

  test("advised range join: salted execution == brute force on generated " +
    "skewed fixtures, across bucket widths") {
    import spark.implicits._
    // generated operating points: random points, random intervals with a
    // deliberate pile-up on one hour (the salt hazard), random width —
    // the single-fixture TemporalSpec case generalized. Brute force is
    // the ground truth; the advisory MUST pick salt (thresholds forced)
    // and the salted result must match exactly, every draw.
    val caseGen = for {
      nPts <- Gen.chooseNum(50, 200)
      nIvs <- Gen.chooseNum(20, 60)
      width <- Gen.oneOf(7L, 100L, 3600L)
      ptTs <- Gen.listOfN(nPts, Gen.chooseNum(0L, 10000L))
      ivs <- Gen.listOfN(nIvs, for {
        pile <- Gen.prob(0.7) // 70% of intervals fold onto [0, width)
        f <- if (pile) Gen.chooseNum(0L, 5L)
             else Gen.chooseNum(0L, 9000L)
        len <- Gen.chooseNum(0L, if (pile) 50L else 2000L)
      } yield (f, f + len))
    } yield (ptTs, ivs, width)
    samples(caseGen, 6).zipWithIndex.foreach {
      case ((ptTs, ivs, width), i) =>
        val pts = ptTs.zipWithIndex.map { case (t, j) => (t, j.toLong) }
          .toDF("ts", "pid")
        val ivDf = ivs.zipWithIndex.map { case ((f, t), j) =>
          (j.toLong, f, t) }.toDF("wid", "f", "t")
        val want = (for {
          (t, j) <- ptTs.zipWithIndex
          ((f, to), w) <- ivs.zipWithIndex
          if t >= f && t <= to
        } yield (w.toLong, j.toLong)).sorted
        // maxHotShare lifted: the generated pile-ups concentrate most
        // rows on few buckets, so the hot share can exceed the default
        // demotion ceiling — this property grades salted-execution
        // EXACTNESS, not the crossover economics
        val (advice, df) = graft.operators.Temporal.rangeJoinAdvised(
          pts, col("ts"), ivDf, col("f"), col("t"), bucketWidth = width,
          broadcastMaxRows = 0L, skewFactor = 1.2, minSaltOutputRows = 1L,
          maxSaltBuckets = 8, targetPartitions = Some(2000000),
          maxHotShare = 1.0)
        assert(advice.strategy === "salt",
          s"draw $i (width $width): pile-up must salt, got $advice")
        val got = df.select(col("wid"), col("pid")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(got === want, s"draw $i (width $width) diverged")
    }
  }
}
