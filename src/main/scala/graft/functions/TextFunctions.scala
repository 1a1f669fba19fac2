package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis primitives for LLM-data-pipeline operators.
  *
  * Everything here is composed from codegen'd built-in functions (split /
  * higher-order array functions / xxhash64) — no Scala UDFs — so the
  * expressions stay inside whole-stage codegen and scale linearly with
  * input size on a cluster. All constants are deterministic: same input
  * row → same output on any partitioning.
  *
  * ANSI-safety note: Spark 4 runs with spark.sql.ansi.enabled=true by
  * default, where Long arithmetic overflow THROWS. The MinHash
  * permutations therefore mask hashes to 32 bits and use coefficients
  * < 2^30 so `a*h + b < 2^62 + 2^30` never overflows.
  */
object TextFunctions {

  /** Whitespace tokens, empty strings dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** BPE-ish subword tokens: letter runs, single digits, single
    * punctuation marks (the usual pre-tokenizer shape). */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    call_function("regexp_count", text, lit(BpeTokenPattern)).cast("long")

  /** Word n-gram shingles as strings ("w1 w2 w3"). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct xxhash64 values of the n-gram shingle set — the universe
    * for Jaccard similarity and the MinHash input. */
  def shingleHashes(text: Column, n: Int): Column =
    array_distinct(transform(shingles(tokens(text), n), s => xxhash64(s)))

  // ---------------------------------------------------------------- MinHash

  /** k-wide MinHash signature over a column of shingle hashes: slot j is
    * the min over shingles of xxhash64(shingle_hash, j) — one independent
    * well-mixed hash family per slot. (A linear (a*x+b) mod p family with
    * p ≥ the product range is a trap here: it wraps at most once, stays
    * order-preserving, and collapses every slot onto the same minimum —
    * measured detection probability degraded to ≈ Jaccard itself.)
    * Empty docs get a MaxValue signature so they never collide. */
  def minhashSignature(hashes: Column, k: Int): Column =
    when(size(hashes) > 0,
      transform(sequence(lit(0), lit(k - 1)), j =>
        array_min(transform(hashes, h => xxhash64(h, j)))))
      .otherwise(array_repeat(lit(Long.MaxValue), k))

  /** LSH band keys: the signature split into `bands` rows-of-r, each band
    * hashed to one long. Docs sharing any band key are candidate pairs. */
  def minhashBands(signature: Column, k: Int, bands: Int): Column = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    transform(sequence(lit(0), lit(bands - 1)),
      i => xxhash64(slice(signature, i * lit(r) + 1, lit(r)), i))
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over whitespace tokens: bit i is set iff the sum over
    * tokens of ±1 (per bit i of xxhash64(token)) is positive. Built from
    * one hash per token plus shift/mask folds; low-bits-first summation
    * never overflows. */
  def simhash64(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    val counts = aggregate(hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(63)), i =>
          when(call_function("shiftrightunsigned", h, i.cast("int")).bitwiseAND(lit(1L)) === 1L, 1L)
            .otherwise(-1L)),
        (a, c) => a + c))
    aggregate(sequence(lit(0), lit(63)), lit(0L),
      (acc, i) => acc + when(element_at(counts, i.cast("int") + 1) > 0,
        call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(0L))
  }

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming64(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b)).cast("long")

  /** 16-bit sub-bands of a SimHash: pairs with hamming distance ≤ 3 share
    * at least one identical band (pigeonhole) — the blocking key that
    * avoids an all-pairs comparison at scale. */
  def simhashBands(sim: Column): Column =
    transform(sequence(lit(0), lit(3)), i =>
      call_function("shiftrightunsigned", sim, (i * 16).cast("int"))
        .bitwiseAND(lit(0xFFFFL)) * 4 + i)

  // ----------------------------------------------------------- text quality

  val EnStopwords: Seq[String] = Seq("the", "a", "an", "and", "of", "to",
    "in", "is", "that", "it", "for", "on", "with", "as", "this")
  val DeStopwords: Seq[String] = Seq("der", "die", "das", "und", "ist",
    "nicht", "mit", "ein", "eine", "zu", "den", "von", "im", "auf", "für")
  val FrStopwords: Seq[String] = Seq("le", "la", "les", "et", "est", "un",
    "une", "pour", "dans", "que", "des", "du", "pas", "sur", "avec")
  val EsStopwords: Seq[String] = Seq("el", "los", "las", "y", "es", "un",
    "una", "para", "con", "del", "se", "no", "por", "como", "más")

  /** Fraction of tokens found in `words` (counts duplicates). */
  def stopwordRatio(toks: Column, words: Seq[String]): Column = {
    val hits = size(filter(toks, t => array_contains(typedlit(words), t)))
    when(size(toks) > 0, hits.cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Punctuation chars / total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      call_function("regexp_count", text, lit("[^A-Za-z0-9\\s]")).cast("double") /
        length(text).cast("double"))
      .otherwise(lit(0.0))

  /** Heuristic document quality in [0,1]: length saturation × word shape
    * × low punctuation × stopword presence (the usual pre-training
    * quality gates, cf. C4/Gopher-style rules — public recipes). */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val meanTokLen = when(size(toks) > 0,
      aggregate(toks, lit(0L), (s, t) => s + length(t)).cast("double") /
        size(toks).cast("double")).otherwise(lit(0.0))
    val shapeScore = when(meanTokLen.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.5))
    val punctScore = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    val stopScore = least(stopwordRatio(toks, EnStopwords) * 5.0, lit(1.0))
    lenScore * 0.4 + shapeScore * 0.2 + punctScore * 0.2 + stopScore * 0.2
  }

  // ---------------------------------------------------------------- lang id

  /** CJK chars / total chars. */
  def cjkRatio(text: Column): Column =
    when(length(text) > 0,
      call_function("regexp_count", text, lit("[\\x{4e00}-\\x{9fff}]")).cast("double") /
        length(text).cast("double"))
      .otherwise(lit(0.0))

  /** Stopword-profile language guess over {en,de,fr,es,zh,und}.
    * Deterministic tie-break order en > de > fr > es. */
  def langId(text: Column): Column = {
    val toks = transform(tokens(text), t => lower(t))
    val en = stopwordRatio(toks, EnStopwords)
    val de = stopwordRatio(toks, DeStopwords)
    val fr = stopwordRatio(toks, FrStopwords)
    val es = stopwordRatio(toks, EsStopwords)
    when(cjkRatio(text) > 0.25, "zh")
      .when(greatest(en, de, fr, es) === 0.0, "und")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  // ------------------------------------------------------------ fingerprint

  /** Winnowing-style document fingerprint (Schleimer et al., SIGMOD'03 —
    * public algorithm): minima of each w-window over the ordered shingle
    * hash sequence, deduplicated and hashed to one 64-bit value. Robust
    * to small local edits; equal fingerprints ⇒ near-identical docs. */
  def fingerprint(text: Column, n: Int = 3, w: Int = 4): Column = {
    val hs = transform(shingles(tokens(text), n), s => xxhash64(s))
    val minima =
      when(size(hs) >= w,
        transform(sequence(lit(0), size(hs) - w), i => array_min(slice(hs, i + 1, lit(w)))))
        .when(size(hs) > 0, array(array_min(hs)))
        .otherwise(array().cast("array<bigint>"))
    xxhash64(sort_array(array_distinct(minima)))
  }
}
