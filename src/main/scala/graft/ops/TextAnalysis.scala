package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines (SURVEY.md §2.11): token
 * counting, quality scoring, language-ID heuristic, fingerprinting.
 * All pure builtin expressions — whole-stage codegen, no UDFs.
 */
object TextAnalysis {

  /** Whitespace tokens (trimmed). */
  def tokens(text: Column): Column = split(trim(text), " +")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-piece estimate: word-chunks + digits + punctuation
    * runs, the usual pre-tokenizer shape. */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, """(?=[^\p{L}\p{N}])|(?<=[^\p{L}\p{N}])"""), t => length(t) > 0))

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "for", "on", "with",
    "that", "as", "at", "by", "it", "from", "or", "be", "are")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / size(toks)
  }

  /** Fraction of non-space chars that are punctuation. */
  def punctRatio(text: Column): Column = {
    val nospace = regexp_replace(text, " ", "")
    (length(nospace) - length(regexp_replace(nospace, """[\p{Punct}]""", ""))).cast("double") /
      greatest(length(nospace), lit(1))
  }

  /** Composite quality score in [0,1]: length band + stopword presence −
    * punctuation noise. Deterministic arithmetic (SQL-oracle-able). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punct = punctRatio(text)
    (lenScore * 0.4 + stopScore * 0.4 + (lit(1.0) - punct) * 0.2)
  }

  /** Per-language stopword marker sets for the lang-ID heuristic. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est", "un", "une", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "de", "y", "es", "un", "una", "en", "para"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "in", "für", "mit"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "他", "这", "中"))

  /**
   * Language-ID: argmax over marker-hit counts, 'und' when nothing hits.
   * A fold over a literal map — no UDF, executes in one projection.
   */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(size(filter(toks, t => t.isin(markers: _*))).as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** 64-bit content fingerprint of normalized text (case/space folded). */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), """\s+""", " "))
}
