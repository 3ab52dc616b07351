package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis expressions for large-scale training-data pipelines:
  * language-ID, quality scoring, token counting, fingerprinting. All are
  * compositions of codegen'd built-ins (no UDFs) so they stay inside
  * whole-stage codegen and scale as narrow maps — no shuffle, no state.
  *
  * Every function has an exactly-equivalent DuckDB SQL form (used by the
  * oracle harness); keep the two in sync when editing.
  */
object TextFunctions {

  /** The `call_function` forms below resolve names from the session's
    * function registry at analysis time. On a session built outside
    * `GraftSession.local` / the `GraftExtensions` path the engine functions
    * wouldn't exist — so register them on the active session (if any)
    * before handing back a Column that references them. Idempotent and
    * cheap (existence check per name); same defensive pattern as
    * [[graft.ops.Dedup]] / [[graft.ops.Similarity]].
    */
  private def ensureRegistered(): Unit =
    SparkSession.getActiveSession.foreach(graft.expr.VecExpressions.register)

  /** Word tokens: lowercase, split on runs of non-alphanumerics, drop
    * empties. The deliberately simple spec (vs the spaCy-like
    * [[graft.nlp.Tokenizer]]) keeps it expressible in any SQL engine.
    *
    * Implementation note — `array_remove(split(...), "")`, NOT
    * `filter(split(...), _ =!= "")`: higher-order functions like
    * ArrayFilter have no codegen (CodegenFallback) and force the whole
    * Generate stage into per-row interpreted expression eval — profiled
    * as a 33 s single task on the tokenize kernel that every dedup/text
    * query shares. array_remove is a plain codegen'd expression with
    * identical semantics (drops every "" element).
    */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), "[^a-z0-9]+"), "")

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** Fraction of characters that are neither alphanumeric nor space
    * (computed on the lowercased text); 0.0 for empty strings.
    */
  def punctRatio(text: Column): Column = {
    val low = lower(text)
    val punct = length(regexp_replace(low, "[a-z0-9 ]", ""))
    when(length(text) === 0, 0.0).otherwise(punct.cast("double") / length(text))
  }

  val Stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for",
    "with", "by", "at", "as", "it", "that", "this", "are", "was")

  /** Fraction of word tokens that are English stopwords; 0.0 when there are
    * no tokens.
    */
  def stopwordRatio(text: Column): Column = {
    ensureRegistered()
    val toks = tokens(text)
    // native codegen'd membership count (graft.expr.CountInSet) — the HOF
    // filter form is CodegenFallback and interprets per row
    val hits = call_function("count_in_set", toks, array(Stopwords.map(lit): _*))
    when(size(toks) === 0, 0.0).otherwise(hits.cast("double") / size(toks))
  }

  /** BPE-ish subword-count estimate: count matches of a GPT-2-style
    * pre-tokenization regex (letter runs, digit runs, punctuation runs,
    * whitespace runs — each with an optional leading space). Good enough
    * for cost estimation without a real BPE vocab.
    */
  val BpeishRegex = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+"

  def bpeTokenCountEstimate(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishRegex), lit(0)))

  /** Heuristic document quality score in [0,1]:
    * length signal × (1 − punctuation penalty) × stopword signal.
    * Deterministic and cheap; meant for bulk corpus filtering.
    */
  def qualityScore(text: Column): Column = {
    val lenSignal = least(lit(1.0), tokenCount(text).cast("double") / 50.0)
    val punctPenalty = lit(1.0) - least(lit(1.0), punctRatio(text) * 4.0)
    val stopSignal = least(lit(1.0), stopwordRatio(text) * 4.0)
    lenSignal * punctPenalty * (lit(0.5) + stopSignal * 0.5)
  }

  /** Language-ID by marker-word voting (n-gram-free heuristic, exactly
    * SQL-expressible): count token occurrences from each language's marker
    * set; argmax with fixed precedence en > de > es > fr; no hits → "und"
    * (undetermined).
    */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "por"),
    "fr" -> Seq("le", "les", "est", "et", "une", "dans", "pour", "qui"))

  def langId(text: Column): Column = {
    ensureRegistered()
    val toks = tokens(text)
    val scores = Markers.map { case (lang, words) =>
      lang -> call_function("count_in_set", toks, array(words.map(lit): _*))
    }
    val Seq(en, de, es, fr) = scores.map(_._2)
    when(en + de + es + fr === 0, "und")
      .when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Content fingerprint: md5 of the whitespace-normalized lowercased text.
    * Identical across engines (md5 is md5) → the exact-dedup key.
    */
  def fingerprintMd5(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")).cast("binary"))

  /** Rolling polynomial hash over word tokens, mod 2^40 (kept well under
    * 2^63 so the fold never overflows in engines that trap on overflow):
    * acc = (acc * 31 + (h(tok) mod P)) mod P, where h(tok) = first 15 hex
    * chars of md5(tok) as an integer. Order-sensitive (unlike the md5
    * fingerprint) → detects token reorderings.
    */
  val RollingHashMod: Long = 1L << 40

  def rollingTokenHash(text: Column): Column = {
    ensureRegistered()
    // native fold (graft.expr.RollingTokenHash) — identical to
    // aggregate(tokens, 0L, (acc, t) => (acc*31 + conv(substring(md5(t),
    // 1,15),16,10) % M) % M) but a single codegen'd static call instead of
    // an interpreted per-token lambda fold
    call_function("rolling_token_hash", tokens(text))
  }
}
