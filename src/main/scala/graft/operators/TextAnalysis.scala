package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: token
  * counting, language-ID, quality scoring, fingerprinting. All pure
  * built-in column expressions (codegen'd, no UDFs) so they run at
  * full scan speed over 100 TB of documents.
  */
object TextAnalysis {

  /** Whitespace tokenization of lowercased text. The shared token
    * definition for every text op (dedup, jaccard, quality). */
  def tokens(text: Column): Column = split(lower(trim(text)), " +")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: word-chunks plus digit runs and
    * punctuation each count — a cheap, deterministic proxy for
    * tokenizer cost used for budget accounting at corpus scale. */
  def subwordCountEstimate(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"))

  /** Language-ID marker words per language — tiny n-gram/stopword
    * heuristic. Counts are regex word-boundary matches on lowered
    * text; argmax with alphabetical tie-break picks the language. */
  val langMarkers: Seq[(String, String)] = Seq(
    "de" -> "(der|die|das|und|ist)",
    "en" -> "(the|and|is|of|to)",
    "es" -> "(el|la|los|y|es)",
    "fr" -> "(le|la|les|et|est)",
    "zh" -> "(de|shi|le|he|zai)")

  def langScore(text: Column, markerRe: String): Column =
    regexp_count(lower(text), lit("\\b" + markerRe + "\\b"))

  /** Detected language = argmax marker count, ties broken by
    * alphabetical language code (deterministic). Implemented as a
    * greatest-of-structs trick so it stays one codegen'd expression. */
  def detectLang(text: Column): Column = {
    // struct(score, negRank, lang): greatest() picks max score, then
    // LOWEST lang code on ties via negated rank ordering.
    val scored = langMarkers.zipWithIndex.map { case ((lang, re), i) =>
      struct(langScore(text, re).as("s"), lit(-i).as("r"), lit(lang).as("l"))
    }
    greatest(scored: _*).getField("l")
  }

  /** Quality-score features (length, punctuation ratio, stopword
    * ratio, digit ratio) and a weighted 0..1 score — the
    * reference-style DQ gate generalized to document quality. */
  def punctCount(text: Column): Column = regexp_count(text, lit("[^A-Za-z0-9\\s]"))
  def digitCount(text: Column): Column = regexp_count(text, lit("[0-9]"))
  def stopwordCount(text: Column): Column =
    regexp_count(lower(text), lit("\\b(the|and|is|of|to|a|in|it)\\b"))

  /** PII scrub kernel (Dolma §2.3 / FineWeb anonymization): match
    * patterns + fixed-order mask cascade, shared verbatim by the
    * batch query (q236) and the ingest-edge stream
    * ([[graft.streaming.PiiScrubStream]]). Pure codegen'd regex
    * projections — stateless, scan-speed. */
  val EmailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  val PhoneRe = "\\+1[0-9]{10}"
  val IpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))
  def ipCount(text: Column): Column = regexp_count(text, lit(IpRe))

  /** The mask cascade: email → phone → IP (fixed order; the typed
    * mask tokens contain no digits/@, so later passes never re-match
    * earlier replacements). */
  def piiMask(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IpRe, "<IP>")

  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val toks = tokenCount(text).cast("double")
    val lengthScore = least(len / 500.0, lit(1.0))
    val punctRatio = punctCount(text).cast("double") / greatest(len, lit(1.0))
    val stopRatio = stopwordCount(text).cast("double") / greatest(toks, lit(1.0))
    ((lengthScore * 0.4) + ((lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.3) +
      (least(stopRatio * 5.0, lit(1.0)) * 0.3)).cast("double")
  }

  /** Word n-grams of a PRE-MATERIALIZED token-array column (pass an
    * attribute, not a computed Column — the lambda references it per
    * element). Documents shorter than n yield an empty array; the
    * guard also keeps `sequence` ascending. Used for substring-level
    * duplicate-span detection (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better", ACL 2022 — their exact
    * substring match, expressed over word n-grams so the operator
    * stays a declarative scan-speed projection).
    */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Overlapping fixed-size token windows over a PRE-MATERIALIZED
    * token-array column — the retrieval/context chunker every RAG or
    * long-document ingestion pipeline runs before embedding. One
    * struct per chunk (chunk_id, token_start, n_tokens, chunk_text);
    * the final chunk may be shorter. A pure scan-speed projection:
    * explode downstream and the shuffle (if any) carries chunks, not
    * documents. */
  def tokenChunks(toks: Column, chunkLen: Int, stride: Int): Column = {
    require(chunkLen > 0 && stride > 0, "chunkLen and stride must be positive")
    // empty token arrays yield NO chunks (not one phantom empty
    // chunk — the sequence lower bound would otherwise still emit
    // start 0); mirrors the oracle's range(0, len, stride) semantics
    when(size(toks) >= 1,
      transform(
        sequence(lit(0), size(toks) - 1, lit(stride)),
        st => struct(
          (st / stride).cast("int").as("chunk_id"),
          st.as("token_start"),
          least(lit(chunkLen), size(toks) - st).as("n_tokens"),
          array_join(slice(toks, st + lit(1), lit(chunkLen)), " ").as("chunk_text"))))
      .otherwise(array().cast(
        "array<struct<chunk_id:int,token_start:int,n_tokens:int,chunk_text:string>>"))
  }

  /** Canonical-form fingerprint: md5 over lowercased,
    * whitespace-collapsed, trimmed text — the exact-dedup key that
    * survives formatting noise. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit content fingerprint via xxhash64 of the canonical form —
    * cheaper join key than md5 strings at 100 TB (8 bytes vs 32). */
  def fingerprint64(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))
}
