package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TokenStats.tokenStats

/**
 * Text-analysis operators for training-data pipelines (north-star extension;
 * no analog in the reference SDK — its `documents`-shaped workloads delegate
 * everything past scan to the client).
 *
 * All operators are pure column expressions (no UDFs), so they scale linearly
 * with no shuffle: at 100 TB these run map-side in the same stage as the
 * parquet scan. Anything that iterates tokens goes through the native
 * single-pass `TokenStats` expression (graft/functions/TokenStats.scala) —
 * interpreted higher-order-function lambdas cost ~1µs each, which made the
 * token loops a 50s bench outlier at sf0.1.
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
    punctRatioFrom(tokenStats(text), text)

  private def punctRatioFrom(st: Column, text: Column): Column =
    round(st.getField("n_punct").cast("double")
      / greatest(length(text), lit(1)), 6)

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column =
    stopwordRatioFrom(tokenStats(text))

  private def stopwordRatioFrom(st: Column): Column =
    round(st.getField("n_stop").cast("double")
      / greatest(st.getField("n_tokens"), lit(1)), 6)

  /** Composite quality score in [0,1] from length/punct/stopword signals.
    * The weighted blend runs in exact decimal arithmetic (weights are
    * decimal literals), so any engine computing the same formula gets a
    * bit-identical double — a 6-dp-rounded double blend would diverge at
    * rounding boundaries. */
  def qualityScore(text: Column): Column =
    qualityScoreFrom(tokenStats(text), text)

  private def qualityScoreFrom(st: Column, text: Column): Column = {
    val dec = "decimal(18,6)"
    val lenNorm = (least(length(text), lit(500)).cast("double") / 500.0).cast(dec)
    val d3 = lit(new java.math.BigDecimal("0.3"))
    val d2 = lit(new java.math.BigDecimal("0.2"))
    val d5 = lit(new java.math.BigDecimal("0.5"))
    (lenNorm * d3 + (lit(1.0) - punctRatioFrom(st, text)).cast(dec) * d2 +
      stopwordRatioFrom(st).cast(dec) * d5).cast("double")
  }

  /** Language-ID by stopword-profile voting: score each language by how many
    * of its characteristic function words appear (distinct matches); argmax
    * wins with ties broken toward the lexicographically larger code, 'und'
    * (undetermined) when no profile matches. Profiles live in
    * `TokenStats.langProfiles`. */
  def langId(text: Column): Column = tokenStats(text).getField("lang")

  /** Order-sensitive document fingerprint: rolling hash chaining each word
    * into the accumulator (Karp-Rabin shape, overflow-free under ANSI mode).
    * Same text → same 64-bit fingerprint; any reordering changes it
    * (unlike set-based minhash). */
  def fingerprint(text: Column): Column =
    tokenStats(text).getField("fingerprint")

  /** All analysis columns for a documents-like table — the TokenStats struct
    * is materialized ONCE per row and every token-derived column reads from
    * it (CollapseProject keeps the multi-referenced non-cheap alias in its
    * own Project, so the pass isn't duplicated). */
  def analyze(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val ts = col("__token_stats")
    df.withColumn("__token_stats", tokenStats(t))
      .withColumn("n_tokens", ts.getField("n_tokens"))
      .withColumn("n_tokens_bpe_est",
        greatest(ceil(length(t) / 4).cast("long"),
          ts.getField("n_tokens").cast("long")))
      .withColumn("punct_ratio", punctRatioFrom(ts, t))
      .withColumn("stopword_ratio", stopwordRatioFrom(ts))
      .withColumn("quality_score", qualityScoreFrom(ts, t))
      .withColumn("lang_pred", ts.getField("lang"))
      .withColumn("fingerprint", ts.getField("fingerprint"))
      .drop("__token_stats")
  }

  /** Corpus-wide top-k n-grams by DOCUMENT frequency (how many documents
    * contain the gram at least once) — the survey step behind boilerplate
    * thresholds and contamination audits: the grams that show up in
    * thousands of documents are the nav bars and license footers.
    *
    * 100 TB shape: per-document distinct shingles explode map-side, the
    * count is one hash aggregation with map-side partial combine (hot grams
    * collapse before the shuffle — the wordcount shape), and top-k plans as
    * `TakeOrderedAndProject`, never a global sort. */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    df.select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("gram").asc)
      .limit(k)

  /** Per-document repetition signals (Gopher-style quality filters):
    * duplicate-word fraction and the most-frequent-bigram share. One native
    * single-pass expression per row (`RepetitionStats`) — no per-token
    * shuffle, no interpreted lambdas; a repetitive (low-quality) document
    * scores high on both. */
  def repetitionStats(df: DataFrame, idCol: String,
                      textCol: String = "text"): DataFrame = {
    val r = graft.functions.RepetitionStats.repetitionStats(col(textCol))
    df.withColumn("__rep", r)
      .select(col(idCol),
        col("__rep.n_words").as("n_words"),
        round(lit(1.0) - col("__rep.n_distinct").cast("double")
          / col("__rep.n_words"), 6).as("dup_word_frac"),
        round(col("__rep.top_bigram").cast("double")
          / col("__rep.n_bigrams"), 6).as("top_bigram_frac"))
  }
}
