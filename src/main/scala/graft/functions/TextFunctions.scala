package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column programs for large-scale training-data
  * pipelines (SURVEY.md §2.D8–D11). Pure `functions._` — everything
  * stays inside whole-stage codegen; no UDFs, no driver round-trips.
  *
  * Portability: the md5-based hashes and integer-ratio arithmetic are
  * chosen so the identical computation is expressible in ANSI SQL for
  * the DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace tokens (testdata is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish word/number pieces: runs of letters or digits. */
  def roughBpePieces(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+"), lit(0))

  /** Distinct n-word shingles from a pre-materialized words column;
    * empty array when the doc is shorter than n words (Spark's
    * `sequence` would otherwise descend).
    *
    * IMPORTANT: `ws` must be a plain attribute (projected in a prior
    * select), not `split(...)` inline — lambda bodies re-evaluate
    * their subexpressions per element, so an inline split would run
    * once per element_at: quadratic per row. CollapseProject keeps the
    * two-step projection because the alias is referenced n times.
    */
  def shinglesFromWords(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      array_distinct(transform(sequence(lit(0), size(ws) - lit(n)),
        i => concat_ws(" ", (1 to n).map(k => element_at(ws, i + lit(k))): _*))))
      .otherwise(array().cast("array<string>"))

  /** Salted md5 of a shingle — the portable minhash hash family.
    * Lexicographic min over hex strings is identical in every engine.
    */
  def saltedMd5(seed: Int, value: Column): Column =
    md5(concat(lit(s"$seed:"), value).cast("binary"))

  /** MinHash signature: array of `numHashes` minima. Computed entirely
    * inside one projection (nested higher-order functions) — zero
    * shuffle, scales linearly with corpus size.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleArr,
        s => md5(concat(i.cast("string"), lit(":"), s).cast("binary")))))

  /** Rolling-fingerprint from a words attribute: the minimal shingle
    * hash (MinHash with one hash function) — stable under small edits.
    */
  def fingerprintFromWords(ws: Column, n: Int = 5): Column =
    array_min(transform(shinglesFromWords(ws, n), s => md5(s.cast("binary"))))

  /** 16-bit SimHash from a pre-materialized token-hash attribute (see
    * `tokenHashes`): per bit, majority vote of token md5 bits (+1/-1).
    * Engine-portable — SQL-expressible for the oracle.
    */
  def tokenHashes(ws: Column): Column =
    transform(ws, w => conv(substring(md5(w.cast("binary")), 1, 4), 16, 10).cast("int"))

  def simhash16FromHashes(tokHash: Column): Column =
    (0 until 16).map { b =>
      when(aggregate(tokHash, lit(0),
        (acc, th) => acc + when(shiftright(th, b).bitwiseAND(lit(1)) === 1, 1).otherwise(-1)) > 0,
        lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)

  /** 48-bit md5-prefix token hashes — the widest engine-portable
    * simhash input that stays positive in a signed BIGINT on both
    * engines (DuckDB hex-cast replays it exactly). The codegen'd
    * Murmur3 [[graft.functions.SimHash64]] is the production-width
    * variant; this one exists so the INDEX family can be oracle-gated
    * bit-for-bit.
    */
  def tokenHashes48(ws: Column): Column =
    transform(ws, w => conv(substring(md5(w.cast("binary")), 1, 12), 16, 10).cast("long"))

  def simhash48FromHashes(tokHash: Column): Column =
    (0 until 48).map { b =>
      when(aggregate(tokHash, lit(0L),
        (acc, th) => acc + when(shiftright(th, b).bitwiseAND(lit(1L)) === 1, 1L).otherwise(-1L)) > 0,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Repetition signals (the "duplicate n-gram fraction" family of
    * quality filters from the large-LM data literature): total vs
    * distinct n-gram counts and their ratio. High ratio = boilerplate
    * or looping text.
    */
  def repetitionSignals(ws: Column, n: Int): Seq[(String, Column)] = {
    val total = greatest(size(ws) - lit(n - 1), lit(0))
    val distinctN = size(shinglesFromWords(ws, n))
    Seq(
      "n_ngrams" -> total,
      "n_distinct" -> distinctN,
      "dup_ngram_ratio" -> when(total > 0,
        lit(1.0) - distinctN.cast("double") / total.cast("double")).otherwise(lit(0.0)))
  }

  /** PII redaction: emails then digit runs → typed placeholders.
    * Pattern set is deliberately conservative/portable (same regex
    * semantics in DuckDB with the 'g' flag).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
  val numberRe = "[0-9]+"

  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, lit(emailRe), lit("<EMAIL>")),
      lit(numberRe), lit("<NUM>"))

  /** Quality signals: token count, mean word length, punctuation
    * ratio, stopword ratio — all exact-integer ratios so the composite
    * double is engine-portable.
    */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def qualitySignals(text: Column): Seq[(String, Column)] = {
    val ws = tokens(text)
    val nTok = size(ws)
    val nChar = length(text)
    val nStop = size(filter(ws, w => w.isin(stopwords: _*)))
    val nPunct = regexp_count(text, lit("[^a-z0-9 ]"))
    Seq(
      "n_tokens" -> nTok,
      "n_stop" -> nStop,
      "n_punct" -> nPunct,
      "mean_word_len" -> (nChar - (nTok - lit(1))).cast("double") / nTok.cast("double"),
      "stop_ratio" -> nStop.cast("double") / nTok.cast("double"),
      "quality_score" -> (nStop.cast("double") / nTok.cast("double")
        - nPunct.cast("double") / nChar.cast("double")
        + least(nTok, lit(100)).cast("double") / lit(100.0)))
  }

  /** Marker-set language ID: count hits per language marker set, take
    * the argmax with a fixed priority order on ties. (The testdata
    * vocabulary is English-ish word salad, so the honest output is the
    * scoring structure, not real language recovery.)
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "code" -> Seq("spark", "agg", "hash", "query", "scan"),
    "data" -> Seq("table", "row", "column", "value"))

  def langId(text: Column): Column = {
    val ws = tokens(text)
    val scores = langMarkers.map { case (lang, ms) =>
      lang -> size(filter(ws, w => w.isin(ms: _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("unknown"): Column) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }
}
