package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis primitives for LLM-data-pipeline operators.
  *
  * Everything here is composed from built-in functions (split /
  * higher-order array functions / xxhash64) — no Scala UDFs. All
  * constants are deterministic: same input row → same output on any
  * partitioning.
  *
  * PERFORMANCE CONTRACT — two rules keep per-row work linear:
  *
  * 1. Spark's higher-order functions re-evaluate any non-attribute
  *    expression referenced inside a lambda on EVERY lambda invocation
  *    (and they run interpreted — `SimpleHigherOrderFunction` is
  *    CodegenFallback). Nesting pipelines inside lambdas (fingerprint
  *    windows over shingles over tokens) turns a linear scan into
  *    O(windows × shingles × tokens) regex work per row — measured as a
  *    single 400 s task at sf0.1. Operators therefore stage each level
  *    as a projected column (`select` chains — free, no shuffle).
  *
  * 2. Staged projections only survive if Catalyst's CollapseProject
  *    cannot inline them: it inlines a projected column referenced ONCE
  *    by the consumer (lambda bodies count as one reference), undoing
  *    the staging — including during `.cache()` materialization.
  *    Functions below are therefore written so expensive staged inputs
  *    appear either ≥2 times textually (e.g. `when(size(c)>0, ...c...)`
  *    blocks collapsing) or as the direct INPUT of an HoF (evaluated
  *    once regardless of inlining — the zip_with/aggregate-input
  *    pattern). When adding functions, keep one of the two properties.
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

  /** Word n-gram shingles as strings ("w1 w2 w3"). `toks` MUST be an
    * attribute — it is referenced inside the lambda. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct xxhash64 values of a shingle column (attribute or not —
    * the array is the lambda input itself, evaluated once). */
  def hashedDistinct(sgl: Column): Column =
    array_distinct(transform(sgl, s => xxhash64(s)))

  /** Native n-gram shingle hashing straight from a token-hash array
    * (ordered, non-distinct) — see [[graft.plans.ShingleHashes]]. The
    * fast path for dedup/fingerprint pipelines: skips shingle-string
    * materialization entirely. */
  def shingleHashesNative(tokenHashCol: Column, n: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.ShingleHashes(
        org.apache.spark.sql.graft.bridge.expression(tokenHashCol), n))

  // ---------------------------------------------------------------- MinHash

  /** k-wide MinHash signature over a column of shingle hashes: slot j is
    * the min over shingles of xxhash64(shingle_hash, j) — one independent
    * well-mixed hash family per slot. (A linear (a*x+b) mod p family with
    * p ≥ the product range is a trap here: it wraps at most once, stays
    * order-preserving, and collapses every slot onto the same minimum —
    * measured detection probability degraded to ≈ Jaccard itself.)
    * Empty docs get a MaxValue signature so they never collide.
    * Backed by the native [[graft.plans.MinHashSignature]] codegen
    * expression (the HoF formulation was the sf0.1 bench bottleneck). */
  def minhashSignature(hashes: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.MinHashSignature(
        org.apache.spark.sql.graft.bridge.expression(hashes), k))

  /** LSH band keys: the signature split into `bands` rows-of-r, each band
    * hashed to one long. Docs sharing any band key are candidate pairs. */
  def minhashBands(signature: Column, k: Int, bands: Int): Column = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    transform(sequence(lit(0), lit(bands - 1)),
      i => xxhash64(slice(signature, i * lit(r) + 1, lit(r)), i))
  }

  // ---------------------------------------------------------------- SimHash

  /** Per-token xxhash64 array (stage 1 of SimHash). */
  def tokenHashes(toks: Column): Column = transform(toks, t => xxhash64(t))

  /** Per-bit ±1 vote counts over a token-hash array (stage 2; the hash
    * array is the aggregate input, evaluated once). */
  def simhashCounts(hashes: Column): Column =
    aggregate(hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(63)), i =>
          when(call_function("shiftrightunsigned", h, i.cast("int")).bitwiseAND(lit(1L)) === 1L, 1L)
            .otherwise(-1L)),
        (a, c) => a + c))

  /** Fold the vote counts into the 64-bit SimHash (stage 3).
    * COLLAPSE-PROOF by construction: `counts` is the zip_with INPUT
    * (evaluated exactly once) rather than a column referenced inside a
    * fold lambda — Catalyst's CollapseProject inlines single-reference
    * projected columns into consumers, and a lambda-body reference would
    * then re-evaluate the whole vote aggregate per bit (measured 64×
    * blowup, 150 s at sf0.1). Low-to-high summation of bit weights never
    * overflows (partial sums are valid longs). */
  def simhashFromCounts(counts: Column): Column = {
    val powers = typedlit((0 until 64).map(i => 1L << i))
    aggregate(
      zip_with(counts, powers, (c, p) => when(c > 0, p).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Native 64-bit SimHash straight from a token-hash array — see
    * [[graft.plans.SimHash64]]. Bit-identical to
    * `simhashFromCounts(simhashCounts(hashes))`, which stays as the
    * reference formulation for the parity spec. */
  def simhash64Native(hashes: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.SimHash64(
        org.apache.spark.sql.graft.bridge.expression(hashes)))

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

  /** Fraction of tokens found in `words` (counts duplicates). `toks`
    * should be an attribute (read inside the filter lambda). */
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
    * quality gates, cf. C4/Gopher-style rules — public recipes).
    * `toks` must be the materialized tokens attribute for `text`. */
  def qualityScore(text: Column, toks: Column): Column =
    qualityScoreFromParts(text, punctRatio(text),
      stopwordRatio(toks, EnStopwords), meanTokLen(toks))

  /** Mean token length (0.0 for no tokens) — an `aggregate` scan of the
    * token array; stage it as an attribute when reused. */
  def meanTokLen(toks: Column): Column =
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (s, t) => s + length(t)).cast("double") /
        size(toks).cast("double")).otherwise(lit(0.0))

  /** [[qualityScore]] over pre-staged parts. Hot paths that also OUTPUT
    * the ratios should stage (punct, stop, mean-tok-len) as attributes
    * and call this — the composite's `when(mtl.between(..))` references
    * its input twice in a conditional, outside codegen subexpression
    * elimination (same class of waste as langId's decision chain). The
    * arithmetic is identical to [[qualityScore]], so staged and inline
    * forms produce bit-equal doubles. */
  def qualityScoreFromParts(
      text: Column, punct: Column, stop: Column, mtl: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val shapeScore = when(mtl.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.5))
    val punctScore = lit(1.0) - least(punct * 4.0, lit(1.0))
    val stopScore = least(stop * 5.0, lit(1.0))
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
    * Deterministic tie-break order en > de > fr > es. `lowerToks` must
    * be the materialized lower-cased tokens attribute for `text`.
    *
    * PERFORMANCE: inline use re-evaluates each ratio tree (a
    * filter+array_contains scan of every token) at every `when` branch
    * that mentions it — conditional branches are outside codegen's
    * common-subexpression elimination. Callers on a hot path must stage
    * the four ratios as attributes and use [[langIdFromRatios]]
    * (measured 1.5× on t04). */
  def langId(text: Column, lowerToks: Column): Column =
    langIdFromRatios(text,
      stopwordRatio(lowerToks, EnStopwords), stopwordRatio(lowerToks, DeStopwords),
      stopwordRatio(lowerToks, FrStopwords), stopwordRatio(lowerToks, EsStopwords))

  /** [[langId]]'s decision chain over pre-staged ratio attributes: each
    * ratio is referenced ~4× below, so the inputs must be attributes for
    * the evaluation to stay once-per-row. */
  def langIdFromRatios(
      text: Column, en: Column, de: Column, fr: Column, es: Column): Column =
    when(cjkRatio(text) > 0.25, "zh")
      .when(greatest(en, de, fr, es) === 0.0, "und")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")

  // ------------------------------------------------------------ fingerprint

  /** Winnowing-style document fingerprint (Schleimer et al., SIGMOD'03 —
    * public algorithm): minima of each w-window over the ordered shingle
    * hash sequence, deduplicated and hashed to one 64-bit value. Robust
    * to small local edits; equal fingerprints ⇒ near-identical docs.
    * `hs` (ordered, NON-distinct shingle hashes) MUST be an attribute —
    * it is sliced inside the window lambda. */
  def fingerprintFromHashes(hs: Column, w: Int = 4): Column =
    xxhash64(winnowMinima(hs, w))

  /** The sorted distinct window minima behind [[fingerprintFromHashes]] —
    * exposed so t21's oracle gate can check the selected-count bounds
    * (1 ≤ count ≤ max(n_shingles − w + 1, 1) for non-empty input). */
  def winnowMinima(hs: Column, w: Int = 4): Column = {
    val minima =
      when(size(hs) >= w,
        transform(sequence(lit(0), size(hs) - w), i => array_min(slice(hs, i + 1, lit(w)))))
        .when(size(hs) > 0, array(array_min(hs)))
        .otherwise(array().cast("array<bigint>"))
    sort_array(array_distinct(minima))
  }
}
