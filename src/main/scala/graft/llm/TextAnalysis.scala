package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines (north-star extension;
 * no analog in the reference SDK — its `documents`-shaped workloads delegate
 * everything past scan to the client).
 *
 * All operators are pure column expressions (whole-stage codegen'd, no UDFs),
 * so they scale linearly with no shuffle: at 100 TB these run map-side in the
 * same stage as the parquet scan.
 */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word-piece regex token count (BPE-ish pre-tokenization: letter runs,
    * digit runs, single punctuation — the GPT-2 pre-tokenizer shape without
    * the merges table). */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  /** BPE-ish subword-count estimate: word-piece regex split + a chars/4
    * correction for long words (the standard fast approximation when a real
    * tokenizer isn't available executor-side). */
  def bpeTokenEstimate(text: Column): Column =
    greatest(ceil(length(text) / 4).cast("long"), tokenCount(text).cast("long"))

  /** Punctuation character ratio (0..1, 6-dp rounded for stability). */
  def punctRatio(text: Column): Column =
    round(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
        / greatest(length(text), lit(1)), 6)

  private val stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    round(
      size(filter(toks, w => w.isin(stopwords.map(lit): _*))).cast("double")
        / greatest(size(toks), lit(1)), 6)
  }

  /** Composite quality score in [0,1] from length/punct/stopword signals.
    * The weighted blend runs in exact decimal arithmetic (weights are
    * decimal literals), so any engine computing the same formula gets a
    * bit-identical double — a 6-dp-rounded double blend would diverge at
    * rounding boundaries. */
  def qualityScore(text: Column): Column = {
    val dec = "decimal(18,6)"
    val lenNorm = (least(length(text), lit(500)).cast("double") / 500.0).cast(dec)
    val d3 = lit(new java.math.BigDecimal("0.3"))
    val d2 = lit(new java.math.BigDecimal("0.2"))
    val d5 = lit(new java.math.BigDecimal("0.5"))
    (lenNorm * d3 + (lit(1.0) - punctRatio(text)).cast(dec) * d2 +
      stopwordRatio(text).cast(dec) * d5).cast("double")
  }

  /** Language-ID by stopword-profile voting: score each language by how many
    * of its characteristic function words appear; argmax wins, 'und'
    * (undetermined) when no profile matches. Deterministic n-gram-free
    * heuristic — swap profiles for character n-grams per language as needed. */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por", "con", "para", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est", "dans", "pour", "que"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "个"))

  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(lower(text)))
    val scored = langProfiles.map { case (lang, words) =>
      struct(
        size(array_intersect(toks, array(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // array_max on struct(score, lang): lexicographic, ties broken by lang
    // name descending replaced with stable smallest-lang order via sort_array
    val best = element_at(
      sort_array(array(scored: _*), asc = false), 1)
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** Order-sensitive document fingerprint: rolling hash chaining each word
    * into the accumulator (Karp-Rabin shape, overflow-free under ANSI mode).
    * Same text → same 64-bit fingerprint; any reordering changes it
    * (unlike set-based minhash). */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, w) => xxhash64(acc, w))
  /** All analysis columns for a documents-like table. */
  def analyze(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_tokens_bpe_est", bpeTokenEstimate(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("quality_score", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
