package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data selection via importance resampling (DSIR — Xie et al., "Data
 * Selection for Language Models via Importance Resampling", NeurIPS
 * 2023): score every raw document by how much more likely its hashed
 * n-gram bag is under a TARGET distribution (the high-quality corpus you
 * want more of) than under the RAW distribution it came from, then keep
 * the top-k — deterministically, or Gumbel-perturbed to SAMPLE with
 * probability ∝ exp(weight) as the paper prescribes.
 *
 * The model is two bag-of-buckets multinomials with add-λ smoothing over
 * `buckets` hashed unigram+bigram features:
 *
 *   log w(doc) = Σ_{grams g} [ ln p̂_target(b(g)) − ln p̂_raw(b(g)) ]
 *   p̂(b)      = (n_b + λ) / (T + λ·B)
 *
 * Every per-bucket log term rounds to 6 dp into DECIMAL before the
 * per-document sum (the [[TextAnalysis.unigramLogProb]] contract), so
 * weights are exact, partition-order independent, and engine-reproducible
 * — the selection a dual-engine oracle can recompute value-for-value.
 *
 * 100-TB shape: gram extraction is map-side array work; both count
 * tables aggregate to ≤ `buckets` rows (map-side combine) and broadcast
 * back onto the document stream; one id-keyed shuffle sums the weights;
 * ranking is [[Curation.scalableRank]]'s bucketed two-phase rank (the
 * cost class of a global sort, which is the floor for an exact global
 * top-k) — no corpus-wide window, no collect, no cross join.
 *
 * The reference engine (/root/reference/vastdb) has no selection
 * operator; this extends the training-data surface past it.
 */
object Selection {

  /** Production gram hash: codegen'd xxhash64. Gate queries inject the
    * md5-based spelling DuckDB can recompute (`SparkEntry.md5Hash60`). */
  val defaultGramHash: Column => Column = (c: Column) => xxhash64(c)

  /** Global 0-based `_rank` over `order`, truncated to the top `k` rows.
    * Two regimes, picked by Spark's own top-k planning threshold
    * (`spark.sql.execution.topKSortFallbackThreshold`, default 10000 —
    * the same bound under which the engine compiles ORDER BY + LIMIT to
    * `TakeOrderedAndProject`):
    *
    *  - `k` within the threshold: `orderBy(...).limit(k)` — per-partition
    *    heap top-k merged on one reducer, ONE pass over the input, no
    *    range shuffle, no boundary-sampling re-read; the final rank is a
    *    window over the ≤ k survivors (bounded single bucket — the
    *    partitionBy(lit(0)) contract).
    *  - larger `k`: [[Curation.rankBySort]]'s range-bucketed two-phase
    *    rank — the cost class of a global sort, which is the floor for
    *    an exact global rank of unbounded k.
    *
    * Both produce the identical ranking for a TOTAL `order` (spec-pinned).
    */
  private def topKRanked(df: DataFrame, order: Seq[Column], k: Long)
      : DataFrame = {
    val threshold = df.sparkSession.conf
      .get("spark.sql.execution.topKSortFallbackThreshold", "10000").toLong
    if (k <= threshold && k <= Int.MaxValue) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(0)).orderBy(order: _*)
      df.orderBy(order: _*).limit(k.toInt)
        .withColumn("_rank", row_number().over(w).cast("long") - 1L)
    } else
      Curation.rankBySort(df, order).filter(col("_rank") < k)
  }

  /** Unigrams plus space-joined bigrams of a whitespace-tokenized text —
    * the DSIR hashed-ngram feature set, map-side (no shuffle). */
  def gramStrings(text: Column): Column = {
    val toks = split(text, " ")
    val n = greatest(size(toks) - 1, lit(0))
    val bg = zip_with(slice(toks, lit(1), n), slice(toks, lit(2), n),
      (a, b) => concat(a, lit(" "), b))
    concat(toks, bg)
  }

  /** Bucket ids of [[gramStrings]]: `pmod(hash(gram), buckets)`.
    *
    * The default-hash path runs the fused native
    * [[graft.functions.TextHashes.gramBucketHashes]] pass — element-for-
    * element equal to the declarative spelling (spec-pinned in
    * SelectionSpec), but one expression call per row instead of two
    * interpreted lambdas per gram and six `split()` re-evaluations per row
    * inside a Generate (the dominant cost of the three corpus-wide DSIR
    * gram passes). An injected `gramHash` (the md5 spelling the dual-engine
    * gates use) keeps the declarative path. */
  def gramBuckets(text: Column, buckets: Int,
                  gramHash: Column => Column = defaultGramHash): Column =
    if (gramHash eq defaultGramHash)
      graft.functions.TextHashes.gramBucketHashes(split(text, " "),
        buckets.toLong)
    else
      transform(gramStrings(text), g => pmod(gramHash(g), lit(buckets.toLong)))

  /** The `buckets`-row smoothed log-ratio table ln p̂_t(b) − ln p̂_r(b),
    * one row per bucket in [0, buckets) (missing buckets get the pure
    * smoothing mass) — metadata-sized, built to be broadcast. Both log
    * terms round to 6 dp DECIMAL independently so the difference is exact
    * and each side matches a DuckDB recomputation bit-for-bit. */
  private def logRatioTable(raw: DataFrame, target: DataFrame,
                            textCol: String, buckets: Int, lambda: Double,
                            gramHash: Column => Column): DataFrame = {
    // coalesce: a NULL text contributes the empty-gram bucket (one ""
    // unigram), matching what the per-row scoring fold sees — without it
    // the explode silently drops NULL rows and the two paths diverge
    def bucketCounts(df: DataFrame): DataFrame =
      df.select(explode(gramBuckets(coalesce(col(textCol), lit("")),
          buckets, gramHash)).as("_b"))
        .groupBy("_b").agg(count(lit(1)).as("_n"))
    def total(counts: DataFrame, name: String): DataFrame =
      counts.agg(coalesce(sum(col("_n")), lit(0L)).as(name))
    val rawC = bucketCounts(raw)
    val tgtC = bucketCounts(target)
    val dom = raw.sparkSession.range(buckets).select(col("id").as("_b"))
    def smoothedLogP(n: Column, t: Column): Column =
      round(log((coalesce(n, lit(0L)).cast("double") + lit(lambda))
        / (t.cast("double") + lit(lambda * buckets))), 6)
        .cast("decimal(18,6)")
    // no broadcast hint on the outer joins: Catalyst swaps the sides
    // (tiny dom becomes the build side of a right-outer, which build-right
    // can't serve) and logs a hint error; both count tables are ≤ buckets
    // rows, so AQE broadcasts them unhinted
    dom
      .join(rawC.withColumnRenamed("_n", "_nr"), Seq("_b"), "left")
      .join(tgtC.withColumnRenamed("_n", "_nt"), Seq("_b"), "left")
      .crossJoin(broadcast(total(rawC, "_tr")))
      .crossJoin(broadcast(total(tgtC, "_tt")))
      .select(col("_b"),
        (smoothedLogP(col("_nt"), col("_tt"))
          - smoothedLogP(col("_nr"), col("_tr"))).as("_lr"))
  }

  /**
   * FIT the DSIR importance model: the persisted form is the full
   * `(bucket, log_ratio)` table — `buckets` rows of DECIMAL(18,6), small
   * enough to live in a catalog table and reload per ingest batch. The
   * "fit once, score everywhere" entry: persist this, then
   * [[dsirScoreFromModel]] scores any batch map-side with NO access to
   * the original corpora. [[dsirWeights]]`(raw, target, …)` ≡
   * [[dsirScoreFromModel]]`(raw, dsirFit(raw, target, …), …)` exactly
   * (both sum the same DECIMAL terms).
   */
  def dsirFit(raw: DataFrame, target: DataFrame, textCol: String = "text",
              buckets: Int = 4096, lambda: Double = 1.0,
              gramHash: Column => Column = defaultGramHash): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(lambda > 0.0, "lambda must be positive (add-λ smoothing)")
    logRatioTable(raw, target, textCol, buckets, lambda, gramHash)
      .select(col("_b").as("bucket"), col("_lr").as("log_ratio"))
  }

  /**
   * Score rows against a PERSISTED DSIR model (a [[dsirFit]] table) —
   * adds `dsir_logweight`, computed entirely MAP-SIDE: the model's
   * `buckets` log-ratios collapse to a literal lookup array riding the
   * plan (one metadata-sized collect here, the same shape as reloading a
   * classifier model), and each row folds its gram buckets through it
   * with exact DECIMAL addition — identical to the [[dsirWeights]]
   * groupBy sum term-for-term, but with NO shuffle and NO join, so an
   * ingest micro-batch pays a projection only. Null text scores the
   * empty-gram weight of `""` (one gram, like the explode path sees).
   */
  def dsirScoreFromModel(df: DataFrame, model: DataFrame,
                         textCol: String = "text",
                         gramHash: Column => Column = defaultGramHash)
      : DataFrame = {
    val rows = model.select(col("bucket").cast("int"),
      col("log_ratio").cast("decimal(18,6)")).collect()
    val buckets = rows.length
    require(buckets > 0, "empty DSIR model table")
    val lr = new Array[java.math.BigDecimal](buckets)
    rows.foreach { r =>
      val b = r.getInt(0)
      require(b >= 0 && b < buckets,
        s"model bucket $b outside [0, $buckets) — not a dense dsirFit table")
      lr(b) = r.getDecimal(1)
    }
    require(lr.forall(_ != null), "model table is missing buckets")
    // default-hash path: the fused native gram+fold expression — one call
    // per row at hash speed (see graft.functions.DsirModelScore; the HOF
    // fold below pays an interpreted lambda per gram). Exact same DECIMAL
    // sum, spec-pinned in SelectionSpec; injected hashes (the md5 gate
    // spelling) keep the declarative fold.
    val w =
      if (gramHash eq defaultGramHash)
        graft.functions.TextHashes.dsirModelScore(
          split(coalesce(col(textCol), lit("")), " "),
          lr.map(d => org.apache.spark.sql.types.Decimal(d)))
      else {
        val lut = array(lr.toSeq.map(d => lit(d).cast("decimal(18,6)")): _*)
        aggregate(
          gramBuckets(coalesce(col(textCol), lit("")), buckets, gramHash),
          lit(java.math.BigDecimal.ZERO).cast("decimal(28,6)"),
          (acc, b) => (acc + element_at(lut, (b + lit(1L)).cast("int")))
            .cast("decimal(28,6)"))
      }
    df.withColumn("dsir_logweight", w.cast("double"))
  }

  /**
   * Per-document DSIR log importance weight of every `raw` row against
   * the `target` corpus. Returns `(idCol, n_grams, _wdec, dsir_logweight)`
   * where `_wdec` is the exact DECIMAL(28,6) sum ([[dsirSelect]] ranks on
   * it) and `dsir_logweight` is its double rendering.
   */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String = "text", buckets: Int = 4096,
                  lambda: Double = 1.0,
                  gramHash: Column => Column = defaultGramHash): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(lambda > 0.0, "lambda must be positive (add-λ smoothing)")
    val tbl = logRatioTable(raw, target, textCol, buckets, lambda, gramHash)
    raw
      .select(col(idCol),
        // coalesce: NULL-text rows keep a row in the output (the
        // empty-gram weight), exactly like [[dsirScoreFromModel]] — see
        // that method's null-text contract
        explode(gramBuckets(coalesce(col(textCol), lit("")),
          buckets, gramHash)).as("_b"))
      .join(broadcast(tbl), Seq("_b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(col("_lr")).as("_wdec"))
      .withColumn("dsir_logweight", col("_wdec").cast("double"))
  }

  /**
   * Select `k` documents from `raw` by DSIR weight. `gumbelSeed = None`
   * is the deterministic top-k (greedy selection); `Some(seed)` adds a
   * seeded Gumbel(0,1) perturbation `−ln(−ln u)` per document — the
   * paper's importance RESAMPLING, drawing k docs with probability
   * ∝ exp(weight) without replacement (Gumbel-top-k), yet still fully
   * deterministic given the seed: `u = (2·h + 1) / 2^53` from the gram
   * hash of `seed|id` is an exact dyadic rational both engines agree on,
   * and the perturbation rounds to 6 dp DECIMAL like every other term.
   *
   * Returns the selected rows as `(idCol, n_grams, dsir_logweight,
   * sel_rank)` with `sel_rank` ∈ [0, k). Ranking is [[topKRanked]]:
   * heap top-k (`TakeOrderedAndProject` regime) when k is within the
   * engine's own top-k threshold, else [[Curation.rankBySort]] — weights
   * are NOT md5-uniform (they cluster in a narrow band), so the rank
   * buckets come from the engine's range sampling, not a hex prefix;
   * ties break on ascending id. No unbounded single-partition window at
   * any size.
   */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String = "text", k: Long = 1000L,
                 buckets: Int = 4096, lambda: Double = 1.0,
                 gumbelSeed: Option[Long] = None,
                 gramHash: Column => Column = defaultGramHash): DataFrame = {
    require(k > 0, "k must be positive")
    val w = dsirWeights(raw, target, idCol, textCol, buckets, lambda, gramHash)
    val selKey = gumbelSeed match {
      case None => col("_wdec")
      case Some(seed) =>
        // h ∈ [0, 2^52): u = (2h+1)/2^53 ∈ (0,1) is an EXACT dyadic
        // rational (inside double's integer range, so every engine
        // computes the identical u); −ln(−ln u) is the Gumbel(0,1)
        // inverse-CDF draw, rounded to 6 dp DECIMAL like every other
        // term so the perturbed key stays exact and order-stable.
        val h = pmod(gramHash(concat(lit(seed.toString), lit("|"),
          col(idCol).cast("string"))), lit(1L << 52))
        val u = (h.cast("double") * 2d + 1d) / lit(Math.pow(2, 53))
        (col("_wdec") + round(-log(-log(u)), 6).cast("decimal(18,6)"))
          .cast("decimal(28,6)")
    }
    val keyed = w.withColumn("_selkey", selKey)
    topKRanked(keyed, Seq(col("_selkey").desc, col(idCol).asc), k)
      .select(col(idCol), col("n_grams"), col("dsir_logweight"),
        col("_rank").as("sel_rank"))
  }

  /**
   * Weighted sampling WITHOUT replacement: draw `k` rows with inclusion
   * probability ∝ `weightCol` (Efraimidis & Spirakis 2006 A-Res — the
   * quality-weighted subset draw between [[dsirSelect]]'s two modes,
   * which sample ∝ exp(weight)). Each row gets the race key
   * `ln(u) / w` (u ~ U(0,1); all keys negative, heavier rows rise toward
   * 0) and the k LARGEST keys win — one map-side expression plus
   * [[Curation.rankBySort]], no corpus-wide window, no collect.
   *
   * Fully deterministic given `seed`: u = (2·h + 1) / 2^53 from the hash
   * of `seed|id` is an exact dyadic rational, and the key rounds to 6-dp
   * DECIMAL (id tiebreak), so any engine recomputes the identical draw.
   *
   * Rows whose weight is NULL or ≤ 0 are excluded from the draw — that IS
   * the semantics (P ∝ w = 0) — so `k ≥ #positive` returns exactly the
   * positive-weight rows. Returns the sampled rows (all input columns)
   * plus `sample_rank` ∈ [0, k).
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
                     k: Long, seed: Long,
                     hash: Column => Column = defaultGramHash): DataFrame = {
    require(k > 0, "k must be positive")
    // !isnan too: Spark's ordering places NaN above every double, so
    // `NaN > 0` is TRUE — without the guard a NaN weight slips into the
    // draw (its race key nulls out and it wins whenever k exceeds the
    // real-weight count)
    val wd = weightCol.cast("double")
    val pos = df.filter(wd > 0d && !isnan(wd))
    val h = pmod(hash(concat(lit(seed.toString), lit("|"),
      col(idCol).cast("string"))), lit(1L << 52))
    val u = (h.cast("double") * 2d + 1d) / lit(Math.pow(2, 53))
    val key = round(log(u) / weightCol.cast("double"), 6)
      .cast("decimal(18,6)")
    // rank a NARROW (id, key) frame — the slow path pins its input with
    // a local checkpoint, so the materialized copy must not carry the
    // full row — then join the k winners back by the (unique) id
    val ranked = topKRanked(
      pos.select(col(idCol).as("__ws_id"), key.as("_skey")),
      Seq(col("_skey").desc, col("__ws_id").asc), k)
    df.join(ranked.select(col("__ws_id"),
        col("_rank").as("sample_rank")),
      col(idCol) === col("__ws_id"))
      .drop("__ws_id")
  }

  /**
   * STRATIFIED per-domain uniform sample: up to `k` rows from EVERY
   * distinct value of `domainCol` (a bounded eyeball/export sample per
   * source for the dataset-report path — the per-domain sibling of
   * [[weightedSample]]'s global draw). Deterministic given `seed`: each
   * row races on the exact integer hash of `seed|id` (the same
   * dyadic-uniform construction as [[weightedSample]] — ordering by the
   * integer hash IS ordering by u, no float in the key at all), id
   * tiebreak, so any engine recomputes the identical per-domain draw.
   *
   * 100-TB shape: the race runs over a NARROW (id, domain, hash) frame;
   * the rank-≤-k filter over `row_number` triggers Spark's
   * InferWindowGroupLimit, so every map task keeps only a k-heap per
   * domain BEFORE the shuffle (WindowGroupLimit — plan-audited in
   * SelectionSpec) and the exchange carries O(partitions × domains × k)
   * rows, not the corpus; winners semi-join back by unique id. A NULL
   * domain is its own stratum; `idCol` must be non-null and unique (the
   * join-back contract, same as [[weightedSample]]).
   */
  def samplePerDomain(df: DataFrame, idCol: String, domainCol: String,
                      k: Int, seed: Long,
                      hash: Column => Column = defaultGramHash): DataFrame = {
    require(k > 0, "k must be positive")
    // `sample_rank` is this operator's OUTPUT column (same reserved-name
    // contract as weightedSample's outputs): joining it back onto a frame
    // that already has one would yield a duplicate/ambiguous column
    require(!df.columns.contains("sample_rank"),
      "input already has a 'sample_rank' column — it is samplePerDomain's " +
        "reserved output name; rename or drop it first")
    val race = pmod(hash(concat(lit(seed.toString), lit("|"),
      col(idCol).cast("string"))), lit(1L << 52))
    val narrow = df.select(col(idCol).as("__sd_id"),
      col(domainCol).as("__sd_dom"), race.as("_race"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__sd_dom"))
      .orderBy(col("_race").asc, col("__sd_id").asc)
    val picked = narrow.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
    df.join(picked.select(col("__sd_id"),
        (col("_rn") - 1).cast("long").as("sample_rank")),
      col(idCol) === col("__sd_id"))
      .drop("__sd_id")
  }
}
