package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar surface for the training-data pipeline: tokenizing,
  * fingerprinting, quality scoring, language ID, shingling, MinHash and
  * SimHash signatures.
  *
  * Everything here is composed from built-in codegen'd expressions
  * (`split`/`transform`/`aggregate`/`xxhash64`/…) — no Scala UDFs — so the
  * whole surface stays inside WholeStageCodegen and scales linearly across
  * executors at 100 TB. Deterministic by construction (no rand(), fixed
  * hash salts).
  */
object TextFunctions {

  /** lower-case, collapse all whitespace runs to single spaces, trim. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Content fingerprint — md5 of the normalized text. The distributed
    * dedup key (reference analog: dedup probe TicketProcessor.php:353-373,
    * generalized to content hashing). */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** Whitespace tokens of the raw text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = regexp_count(c, lit("\\S+")).cast("long")

  def punctCount(c: Column): Column = regexp_count(c, lit("[.,;:!?]")).cast("long")

  /** BPE-ish subword tokens: letter runs, digit runs, single punctuation. */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  private val stopwordSets: Seq[(String, String)] = Seq(
    "en" -> "the|and|of|to|in|is|a",
    "es" -> "el|la|de|que|y|en|los",
    "de" -> "der|die|und|das|ist|ein|zu",
    "fr" -> "le|la|et|les|des|un|une")

  /** Per-language stopword hit count (word-boundary regex). */
  def stopwordHits(c: Column, lang: String): Column = {
    val pat = stopwordSets.toMap.apply(lang)
    regexp_count(lower(c), lit(s"\\b($pat)\\b")).cast("long")
  }

  /** n-gram-heuristic language ID: argmax of stopword-set hits with a fixed
    * tie order (en > es > de > fr). */
  def langPredict(c: Column): Column = {
    val Seq(en, es, de, fr) = Seq("en", "es", "de", "fr").map(stopwordHits(c, _))
    when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** Composite document quality score in [0,1]: token volume, stopword
    * density, punctuation noise. Mirrors the SQL oracle term-for-term so the
    * float expression trees evaluate identically. */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val stopRatio = stopwordHits(c, "en").cast("double") / greatest(nTok, lit(1.0))
    val punctRatio = punctCount(c).cast("double") / greatest(nTok, lit(1.0))
    round(
      least(lit(1.0), nTok / 200.0) * 0.5 +
      least(lit(1.0), stopRatio * 4.0) * 0.3 +
      (lit(1.0) - least(lit(1.0), punctRatio * 10.0)) * 0.2, 4)
  }

  /** Word n-gram shingles ("a b c" strings). Empty array when the document
    * has fewer than n tokens OR the text is null (the coalesce preserves
    * the composed form's []-for-null contract over the null-propagating
    * native expression). Delegates to ShinglesExpr — one loop per row;
    * [[shinglesViaColumns]] below is the bit-parity oracle. */
  def shingles(c: Column, n: Int): Column =
    coalesce(graft.plans.NativeExprs.shingles(c, n),
      array().cast("array<string>"))

  /** The composed-Column form of [[shingles]] (interpreted `transform`
    * lambda per gram — kept as the parity reference; guard needed:
    * sequence(0, negative) reverses). */
  def shinglesViaColumns(c: Column, n: Int): Column = {
    val words = tokens(c)
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - lit(n)),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** xxhash64 of each set element — computed ONCE; the k minhash functions
    * re-hash this base long with the slot index as seed material, so
    * signature cost is one string hash + k long-hashes per element instead
    * of k string hashes. (Affine wrap-around mixing would be cheaper still
    * but ANSI mode — Spark 4 default — rejects overflowing multiplies.) */
  def elementHashes(set: Column): Column = transform(set, w => xxhash64(w))

  /** MinHash signature from pre-hashed elements: slot k is min over
    * elements of xxhash64(h, k). Delegates to the native expression (one
    * loop per row); the composed form below is the parity oracle. */
  def minhashFromHashes(hashes: Column, numHashes: Int): Column =
    graft.plans.NativeExprs.minhashSignature(hashes, numHashes)

  /** Composed-Column reference for the minhash signature (64 interpreted
    * transform+array_min passes — parity spec only). */
  def minhashFromHashesViaColumns(hashes: Column, numHashes: Int): Column =
    array((0 until numHashes).map { k =>
      array_min(transform(hashes, h => xxhash64(h, lit(k))))
    }: _*)

  /** MinHash signature over a set column (convenience composition). */
  def minhashSignature(set: Column, numHashes: Int): Column =
    minhashFromHashes(elementHashes(set), numHashes)

  /** LSH band hashes of a minhash signature: `bands` hashes, each over
    * `rows = numHashes/bands` consecutive signature slots. Docs sharing any
    * band hash are candidate near-duplicates.
    *
    * Chained with Spark's multi-argument xxhash64 over the RAW LONG slots
    * (seed 42; each slot's 8-byte lane feeds the next seed, band index
    * folded in last to salt the bands apart): pure long-lane arithmetic —
    * no per-row string materialization (an earlier form hashed a
    * comma-joined decimal rendering of the band) and exactly restatable
    * in SQL by the closed-formula XXH64 device, which is what lets the
    * q77 signature export carry a full DuckDB oracle. */
  def lshBandHashes(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(((0 until rows).map(r => element_at(sig, b * rows + r + 1))
        :+ lit(b.toLong)): _*)
    }: _*)

  /** 64-bit SimHash — delegates to the native Catalyst expression
    * (graft.plans.SimHash64Expr); the composed-Column reference below is
    * kept for the parity spec. */
  def simhash64(c: Column): Column = graft.plans.SimHashExpr.simhash64(c)

  /** Reference SimHash built only from higher-order functions: per bit, a
    * majority vote of token-hash bits. 64 interpreted array passes per row
    * — parity oracle for the native expression, not the production path. */
  def simhash64ViaColumns(c: Column): Column = {
    // drop zero-length tokens: split("") yields [""], and hashing it would
    // make the empty document's signature xxhash64("") while the native
    // kernel (which skips empties) returns 0 — parity must hold on
    // degenerate input too
    val th = transform(
      filter(array_distinct(tokens(c)), w => length(w) > 0), w => xxhash64(w))
    val n = size(th)
    (0 until 64).map { i =>
      val votes = size(filter(th, h => shiftright(h, i).bitwiseAND(lit(1L)) === lit(1L)))
      when(votes * 2 > n, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("int")

  /** Exact set Jaccard between two array columns (used to verify LSH
    * candidates — the verify step of MinHash dedup). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  // PII patterns shared by redaction and counting (training-data scrubbing:
  // emails, URLs, and phone-ish digit runs are the standard first pass
  // before text enters a corpus). Order matters: URLs before phones so a
  // port/path number isn't double-masked.
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val PhonePattern = "\\+?[0-9][0-9()\\[\\]. -]{6,}[0-9]"

  /** Mask emails/URLs/phone-like runs with typed tags. */
  def redactPii(c: Column): Column = {
    val noUrl = regexp_replace(c, UrlPattern, "<URL>")
    val noEmail = regexp_replace(noUrl, EmailPattern, "<EMAIL>")
    regexp_replace(noEmail, PhonePattern, "<PHONE>")
  }

  /** Per-kind PII hit counts — counted on the SAME progressively-masked
    * text the redaction chain sees, so each count equals the number of
    * tags redactPii emits for that kind (an email inside a URL is a URL,
    * not an email; two phones separated only by a URL stay two phones
    * because the '<URL>' tag's letters break the digit run). */
  def piiCounts(c: Column): Column = {
    val noUrl = regexp_replace(c, UrlPattern, "<URL>")
    val noEmail = regexp_replace(noUrl, EmailPattern, "<EMAIL>")
    struct(
      regexp_count(noUrl, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(c, lit(UrlPattern)).cast("long").as("n_urls"),
      regexp_count(noEmail, lit(PhonePattern)).cast("long").as("n_phones"))
  }

  /** Character-class profile: alpha/digit/space/other ratios (4dp) — the
    * cheap quality signals a corpus filter cuts on. */
  def charClassProfile(c: Column): Column = {
    val len = greatest(length(c).cast("double"), lit(1.0))
    struct(
      round(regexp_count(c, lit("[A-Za-z]")).cast("double") / len, 4).as("alpha_ratio"),
      round(regexp_count(c, lit("[0-9]")).cast("double") / len, 4).as("digit_ratio"),
      round(regexp_count(c, lit("\\s")).cast("double") / len, 4).as("space_ratio"),
      round(regexp_count(c, lit("[^A-Za-z0-9\\s]")).cast("double") / len, 4).as("other_ratio"))
  }

  /** Gopher's required "stop words" (Rae et al. 2021 §A1.1 — distinct
    * from the lang-ID stopword sets above, which exist to discriminate
    * languages, not to gate quality). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The full Gopher document-level quality rule set (Rae et al. 2021
    * §A1.1) as one map-only struct — signals plus the composed gate:
    *   - n_words in [50, 100000]
    *   - mean word length in [3, 10]
    *   - symbol-to-word ratio ('#' or '...'/'…') ≤ 0.1
    *   - ≤ 90% of lines bullet-started, ≤ 30% ellipsis-ended
    *   - ≥ 80% of words contain an alphabetic character
    *   - ≥ 2 distinct [[GopherStopwords]] present
    * Complements the repetition rules (§A1.2), which live in the native
    * `repetitionStats` kernel (q85/q86).
    *
    * Gate comparisons run on the UNROUNDED ratios — each is an exact IEEE
    * division of two integer-valued doubles, so any SQL restatement lands
    * on the identical double and the identical verdict; the emitted
    * fractions are 4dp for display stability. Empty/whitespace docs fail
    * the word-count rule with all ratios 0. One whole-stage-codegen scan,
    * no explode, no shuffle. */
  def gopherQuality(c: Column): Column = {
    val nWords = tokenCount(c)
    val wordChars = length(regexp_replace(c, "\\s+", ""))
    val meanLen = wordChars.cast("double") / nWords.cast("double")
    val nSymbols = regexp_count(c, lit("#")) + regexp_count(c, lit("\\.\\.\\.|…"))
    val symbolRatio = nSymbols.cast("double") / nWords.cast("double")
    val lines = split(c, "\n", -1)
    val nLines = size(lines).cast("double")
    val bulletFrac =
      size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("double") / nLines
    val ellipsisFrac =
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("double") / nLines
    val alphaFrac = regexp_count(c, lit("[^\\s]*[A-Za-z][^\\s]*")).cast("double") /
      nWords.cast("double")
    val toks = tokens(c)
    val stopDistinct = GopherStopwords
      .map(w => when(array_contains(toks, w), 1L).otherwise(0L))
      .reduce(_ + _)
    val passes = nWords >= 50L && nWords <= 100000L &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      symbolRatio <= 0.1 &&
      bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
      alphaFrac >= 0.8 &&
      stopDistinct >= 2L
    val guarded = (r: Column) => when(nWords > 0, round(r, 4)).otherwise(0.0)
    struct(
      nWords.as("n_words"),
      guarded(meanLen).as("mean_word_len"),
      guarded(symbolRatio).as("symbol_ratio"),
      round(bulletFrac, 4).as("bullet_line_frac"),
      round(ellipsisFrac, 4).as("ellipsis_line_frac"),
      guarded(alphaFrac).as("alpha_word_frac"),
      stopDistinct.as("stopword_distinct"),
      when(passes, 1L).otherwise(0L).as("passes"))
  }
}
