package graft

import org.apache.spark.sql.functions._

import graft.llm.Selection

/**
 * DSIR importance resampling (Selection.scala): planted-distribution
 * recovery, layout determinism, Gumbel resampling semantics, and the
 * degenerate envelopes.
 */
class SelectionSpec extends SparkSpec {

  import spark.implicits._

  /** A raw pool mixing two vocabularies: even ids speak "code" tokens,
    * odd ids speak "web" tokens; the target corpus is pure code-speak. */
  private def corpora = {
    val code = Seq("def", "class", "val", "match", "case", "object")
    val web = Seq("click", "buy", "sale", "offer", "free", "now")
    def doc(words: Seq[String], salt: Int): String =
      (0 until 30).map(i => words((i * 7 + salt) % words.size)).mkString(" ")
    val raw = (0 until 200)
      .map(i => (i.toLong, doc(if (i % 2 == 0) code else web, i)))
      .toDF("id", "text")
    val target = (0 until 40)
      .map(i => (1000L + i, doc(code, i * 3)))
      .toDF("id", "text")
    (raw, target)
  }

  test("dsir weights separate target-like from off-target docs") {
    val (raw, target) = corpora
    val w = Selection.dsirWeights(raw, target, "id", buckets = 256)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("dsir_logweight"))
      .toMap
    assert(w.size == 200)
    val codeW = w.filter(_._1 % 2 == 0).values
    val webW = w.filter(_._1 % 2 == 1).values
    // every code doc outweighs every web doc — the vocabularies are disjoint
    assert(codeW.min > webW.max,
      s"code min ${codeW.min} should exceed web max ${webW.max}")
  }

  test("dsir select takes exactly the target-like half; rank is dense") {
    val (raw, target) = corpora
    val sel = Selection.dsirSelect(raw, target, "id", k = 100, buckets = 256)
      .collect()
    assert(sel.length == 100)
    assert(sel.forall(_.getAs[Long]("id") % 2 == 0), "only code docs selected")
    assert(sel.map(_.getAs[Long]("sel_rank")).sorted.toSeq == (0L until 100L))
  }

  test("weights are bit-identical under repartition and k >= n selects all") {
    val (raw, target) = corpora
    def run(df: org.apache.spark.sql.DataFrame) =
      Selection.dsirWeights(df, target, "id", buckets = 128)
        .select("id", "dsir_logweight").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(run(raw) == run(raw.repartition(7)))
    val all = Selection.dsirSelect(raw, target, "id", k = 10000, buckets = 128)
    assert(all.count() == 200)
  }

  test("gumbel resampling: seeded-deterministic, seed-sensitive, weight-biased") {
    val (raw, target) = corpora
    def sel(seed: Long) =
      Selection.dsirSelect(raw, target, "id", k = 60, buckets = 256,
          gumbelSeed = Some(seed))
        .collect().map(_.getAs[Long]("id")).toSet
    val a1 = sel(42L); val a2 = sel(42L); val b = sel(7L)
    assert(a1 == a2, "same seed must reproduce the same sample")
    assert(a1 != b, "different seeds should draw different samples")
    // still biased toward the target distribution: code docs dominate
    assert(a1.count(_ % 2 == 0) > 45,
      s"expected heavy code-doc majority, got ${a1.count(_ % 2 == 0)}/60")
  }

  test("degenerate envelopes: invalid params throw; empty target still scores") {
    val (raw, target) = corpora
    intercept[IllegalArgumentException] {
      Selection.dsirWeights(raw, target, "id", buckets = 0)
    }
    intercept[IllegalArgumentException] {
      Selection.dsirWeights(raw, target, "id", lambda = 0.0)
    }
    intercept[IllegalArgumentException] {
      Selection.dsirSelect(raw, target, "id", k = 0)
    }
    // empty target: p̂_t is the uniform smoothing mass — weights finite,
    // every doc still scored
    val w = Selection.dsirWeights(raw, target.filter(lit(false)), "id",
      buckets = 64)
    assert(w.count() == 200)
    assert(w.filter(col("dsir_logweight").isNull ||
      isnan(col("dsir_logweight"))).count() == 0)
  }

  test("persisted-model scoring equals the corpus-weights path bit-for-bit") {
    val (raw, target) = corpora
    val model = Selection.dsirFit(raw, target, buckets = 128)
    assert(model.count() == 128, "model must cover the full bucket domain")
    def asMap(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "dsir_logweight").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val scored = asMap(Selection.dsirScoreFromModel(raw, model))
    val weights = asMap(Selection.dsirWeights(raw, target, "id", buckets = 128))
    assert(scored == weights,
      "LUT fold and groupBy sum must agree on every document")
    // null text scores like empty text; a sparse model table is refused
    val edge = Seq((500L, null.asInstanceOf[String]), (501L, ""))
      .toDF("id", "text")
    val ns = asMap(Selection.dsirScoreFromModel(edge, model))
    assert(ns(500L) == ns(501L))
    intercept[IllegalArgumentException] {
      Selection.dsirScoreFromModel(raw, model.filter(col("bucket") =!= 5))
    }
  }

  test("weightedSample: P ∝ weight, seeded-deterministic, non-positive excluded") {
    // one heavyweight among featherweights: with w=5000 vs 199×1, the
    // heavy row's inclusion probability in ANY k=20 draw is ≈ 1
    val df = (0 until 200)
      .map(i => (i.toLong, if (i == 77) 5000.0 else 1.0))
      .toDF("id", "w")
    def draw(seed: Long) =
      Selection.weightedSample(df, "id", col("w"), k = 20, seed = seed)
        .collect().map(_.getAs[Long]("id")).toSet
    val seeds = (1L to 8L)
    val draws = seeds.map(draw)
    assert(draws.forall(_.contains(77L)),
      "the 5000x-weight row must appear in every draw")
    assert(draws.forall(_.size == 20))
    assert(draws.distinct.size > 1, "different seeds draw different samples")
    assert(draw(3L) == draw(3L), "same seed reproduces the same sample")
    // ranks are dense 0..k-1
    val ranked = Selection.weightedSample(df, "id", col("w"), 20, 1L)
      .collect().map(_.getAs[Long]("sample_rank")).sorted.toSeq
    assert(ranked == (0L until 20L))
  }

  test("top-k regimes agree: heap fast path ≡ rankBySort slow path") {
    val (raw, target) = corpora
    val key = "spark.sql.execution.topKSortFallbackThreshold"
    def withThreshold[T](v: String)(body: => T): T = {
      val old = spark.conf.get(key, "10000")
      spark.conf.set(key, v)
      try body finally spark.conf.set(key, old)
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "sel_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).toSeq
    def sampRows(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).toSeq
    // plan regime is chosen at BUILD time, so toggling the conf around
    // construction pins each path; results must be identical
    val fastSel = withThreshold("10000")(rows(
      Selection.dsirSelect(raw, target, "id", k = 60, buckets = 128)))
    val slowSel = withThreshold("1")(rows(
      Selection.dsirSelect(raw, target, "id", k = 60, buckets = 128)))
    assert(fastSel == slowSel)
    val fastW = withThreshold("10000")(sampRows(Selection.weightedSample(
      raw.withColumn("w", (col("id") % 7 + 1).cast("double")),
      "id", col("w"), k = 40, seed = 11L)))
    val slowW = withThreshold("1")(sampRows(Selection.weightedSample(
      raw.withColumn("w", (col("id") % 7 + 1).cast("double")),
      "id", col("w"), k = 40, seed = 11L)))
    assert(fastW == slowW)
  }

  test("weightedSample: zero/null/NaN weights never drawn; k >= positives returns all") {
    // NaN included: Spark's ordering puts NaN above every double, so a
    // bare `w > 0` filter would admit it — pinned here
    val rows = Seq((1L, Some(2.0)), (2L, Some(0.0)), (3L, None),
      (4L, Some(-1.0)), (5L, Some(1.0)), (6L, Some(Double.NaN)))
    val df = rows.toDF("id", "w")
    val all = Selection.weightedSample(df, "id", col("w"), k = 100, seed = 9L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(all == Set(1L, 5L), s"only positive-weight rows drawable: $all")
    intercept[IllegalArgumentException] {
      Selection.weightedSample(df, "id", col("w"), k = 0, seed = 9L)
    }
  }

  test("weightedSample equals a driver-side brute-force draw on random inputs") {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(120)
      val rows = (0 until n).map { i =>
        val w = rnd.nextInt(5) match {
          case 0 => 0.0
          case 1 => -rnd.nextDouble()
          case _ => rnd.nextDouble() * math.pow(10, rnd.nextInt(4))
        }
        (i.toLong, w)
      }
      val k = 1 + rnd.nextInt(n)
      val seed = rnd.nextLong()
      val got = Selection.weightedSample(rows.toDF("id", "w"), "id",
          col("w"), k, seed)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("sample_rank")))
        .sortBy(_._2).toSeq
      // independent recomposition of the whole draw: xxhash64(seed|id,
      // seed 42) → pmod 2^52 → exact dyadic u → ln(u)/w → 6-dp HALF_UP
      // key → (key desc, id asc) top-k
      val expect = rows.filter(r => r._2 > 0 && !r._2.isNaN)
        .map { case (id, w) =>
          val h0 = XxHash64Function.hash(
            UTF8String.fromString(s"$seed|$id"), StringType, 42L)
          val m = 1L << 52
          val h = ((h0 % m) + m) % m
          val u = (h.toDouble * 2d + 1d) / math.pow(2, 53)
          val key = BigDecimal(java.math.BigDecimal.valueOf(math.log(u) / w)
            .setScale(6, java.math.RoundingMode.HALF_UP))
          (id, key)
        }
        .sortBy { case (id, key) => (-key, id) }
        .take(k).zipWithIndex.map { case ((id, _), r) => (id, r.toLong) }
      assert(got == expect, s"trial $trial (n=$n k=$k seed=$seed)")
    }
  }

  test("bigram features are real: scrambled token order changes the weight") {
    val target = Seq((1L, "alpha beta alpha beta alpha beta alpha beta"))
      .toDF("id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha beta alpha beta"), // target-ordered bigrams
      (2L, "beta alpha beta alpha beta alpha")) // same unigrams, flipped order
      .toDF("id", "text")
    val w = Selection.dsirWeights(raw, target, "id", buckets = 512)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("dsir_logweight"))
      .toMap
    assert(w(1L) > w(2L),
      "matching bigram order must outweigh scrambled order")
  }

  test("samplePerDomain: ≤k per stratum, deterministic, null-domain stratum") {
    import org.apache.spark.sql.functions.{col, count}
    val df = ((0L until 40L).map(i => (i, if (i % 3 == 0) "a"
        else if (i % 3 == 1) "b" else null)) :+ (100L, "tiny"))
      .toDF("id", "dom")
    def run() = Selection.samplePerDomain(df, "id", "dom", k = 4, seed = 9L)
    val got = run().collect()
    // per-stratum caps: a/b/null have ≥4 members → exactly 4; "tiny" has 1
    val byDom = got.groupBy(r => Option(r.getString(1)).getOrElse("∅"))
      .view.mapValues(_.length).toMap
    assert(byDom == Map("a" -> 4, "b" -> 4, "∅" -> 4, "tiny" -> 1))
    // ranks are dense 0..n-1 within each stratum
    got.groupBy(r => Option(r.getString(1))).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("sample_rank")).sorted.toSeq ==
        (0L until rows.length.toLong))
    }
    // same seed → identical draw; this seed pair → different draw
    // (deterministic: both draws are pure functions of (ids, seed))
    assert(run().collect().map(_.toSeq).toSet == got.map(_.toSeq).toSet)
    val other = Selection.samplePerDomain(df, "id", "dom", k = 4, seed = 10L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(other != got.map(_.getLong(0)).toSet)
    // k ≥ stratum size returns every row exactly once
    val all = Selection.samplePerDomain(df, "id", "dom", k = 1000, seed = 1L)
    assert(all.count() == df.count())
    assert(all.select("id").distinct().count() == df.count())
  }

  test("samplePerDomain equals a driver-side brute-force draw on random inputs") {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(120)
      val nDoms = 1 + rnd.nextInt(6)
      val rows = (0 until n).map { i =>
        val dom = if (rnd.nextInt(8) == 0) null else s"d${rnd.nextInt(nDoms)}"
        (i.toLong, dom)
      }
      val k = 1 + rnd.nextInt(12)
      val seed = rnd.nextLong()
      val got = Selection.samplePerDomain(rows.toDF("id", "dom"), "id",
          "dom", k, seed)
        .collect()
        .map(r => (Option(r.getString(1)), r.getAs[Long]("id"),
          r.getAs[Long]("sample_rank"))).toSet
      // independent recomposition: xxhash64(seed|id, seed 42) → pmod 2^52
      // race key, (race asc, id asc) within each stratum (null its own),
      // ranks 0..min(k,|stratum|)-1
      val expect = rows.groupBy(_._2).flatMap { case (dom, members) =>
        members.map { case (id, _) =>
          val h0 = XxHash64Function.hash(
            UTF8String.fromString(s"$seed|$id"), StringType, 42L)
          val m = 1L << 52
          (id, ((h0 % m) + m) % m)
        }.sortBy { case (id, h) => (h, id) }
          .take(k).zipWithIndex
          .map { case ((id, _), r) => (Option(dom), id, r.toLong) }
      }.toSet
      assert(got == expect, s"trial $trial (n=$n domains=$nDoms k=$k seed=$seed)")
    }
  }

  test("samplePerDomain plan: WindowGroupLimit heap runs before the shuffle") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Selection.samplePerDomain(df, "doc_id", "source", 5, 7L)
      .queryExecution.executedPlan.toString
    // InferWindowGroupLimit must kick in: every map task keeps a k-heap
    // per domain BEFORE the exchange, so the shuffle carries
    // O(tasks × domains × k) narrow rows, not the corpus
    assert(plan.contains("WindowGroupLimit"),
      s"rank-≤-k filter did not trigger WindowGroupLimit:\n$plan")
  }

  test("gramBuckets: native fused pass equals the declarative HOF spelling") {
    import org.apache.spark.sql.functions._
    // the pre-r14 declarative path, inlined: the optimization contract is
    // element-for-element equality (order AND multiplicity), so the fused
    // native expression can replace it under any downstream consumer
    def legacy(text: org.apache.spark.sql.Column, buckets: Int) = {
      val toks = split(text, " ")
      val n = greatest(size(toks) - 1, lit(0))
      val bg = zip_with(slice(toks, lit(1), n), slice(toks, lit(2), n),
        (a, b) => concat(a, lit(" "), b))
      transform(concat(toks, bg), g => pmod(xxhash64(g), lit(buckets.toLong)))
    }
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (900001L, ""), (900002L, "one"), (900003L, "a  b   c"),
        (900004L, " lead trail "), (900005L, "x\ty unicode \u00e9 mix\u00e9"),
        (900006L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val cmp = docs.select(col("doc_id"),
        legacy(coalesce(col("text"), lit("")), 4096).as("h"),
        graft.llm.Selection.gramBuckets(coalesce(col("text"), lit("")), 4096)
          .as("n"))
    assert(cmp.filter(!(col("h") <=> col("n"))).count() === 0)
    // null array propagates as null through both paths
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(legacy(col("text"), 64).as("h"),
        graft.llm.Selection.gramBuckets(col("text"), 64).as("n"))
      .head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
    // null ELEMENTS (unreachable via split(), but the contract must hold):
    // xxhash64(NULL) is the SEED (42), never NULL, so a null token's
    // unigram and both adjacent bigrams bucket to pmod(42, b) on BOTH
    // paths — the fused expression must mirror that, not emit nulls
    def legacyArr(toks: org.apache.spark.sql.Column, buckets: Int) = {
      val n = greatest(size(toks) - 1, lit(0))
      val bg = zip_with(slice(toks, lit(1), n), slice(toks, lit(2), n),
        (a, b) => concat(a, lit(" "), b))
      transform(concat(toks, bg), g => pmod(xxhash64(g), lit(buckets.toLong)))
    }
    val withNulls = Seq(Tuple1(Array("a", null, "b", "c")),
        Tuple1(Array(null.asInstanceOf[String])),
        Tuple1(Array[String]()))
      .toDF("toks")
      .select(legacyArr(col("toks"), 97).as("h"),
        graft.functions.TextHashes.gramBucketHashes(col("toks"), 97).as("n"))
    assert(withNulls.filter(!(col("h") <=> col("n"))).count() === 0)
  }

  test("gramBuckets native path plans with zero lambda functions") {
    import org.apache.spark.sql.functions._
    // parquet-backed input: a LocalTableScan constant-folds the projection
    // away and the plan would show nothing to assert on
    val df = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(graft.llm.Selection.gramBuckets(col("text"), 256).as("b"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("gram_bucket_hashes"), plan)
    assert(!plan.contains("lambdafunction"), plan)
  }

  test("dsirScoreFromModel: fused native fold equals the HOF fold and dsirWeights") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val target = docs.filter(col("doc_id") < 120)
    val model = graft.llm.Selection.dsirFit(docs, target, buckets = 256)
    // native (default hash) vs the pre-r14 HOF fold, inlined
    val rows = model.select(col("bucket").cast("int"),
      col("log_ratio").cast("decimal(18,6)")).collect()
    val lr = new Array[java.math.BigDecimal](rows.length)
    rows.foreach(r => lr(r.getInt(0)) = r.getDecimal(1))
    val lut = array(lr.toSeq.map(d => lit(d).cast("decimal(18,6)")): _*)
    val hof = aggregate(
      graft.llm.Selection.gramBuckets(coalesce(col("text"), lit("")), 256),
      lit(java.math.BigDecimal.ZERO).cast("decimal(28,6)"),
      (acc, b) => (acc + element_at(lut, (b + lit(1L)).cast("int")))
        .cast("decimal(28,6)"))
    val scored = graft.llm.Selection.dsirScoreFromModel(docs, model)
      .withColumn("__hof", hof.cast("double"))
    assert(scored.filter(!(col("dsir_logweight") <=> col("__hof"))).count() === 0)
    // and the fit→score path still equals the one-shot weights path exactly
    val viaWeights = graft.llm.Selection.dsirWeights(docs, target, "doc_id",
      buckets = 256).select(col("doc_id"), col("dsir_logweight").as("__w"))
    val joined = scored.select(col("doc_id"), col("dsir_logweight"))
      .join(viaWeights, Seq("doc_id"))
    assert(joined.filter(!(col("dsir_logweight") <=> col("__w"))).count() === 0)
    // plan shape: one expression call, zero lambdas on the default path
    val plan = graft.llm.Selection.dsirScoreFromModel(docs, model)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dsir_model_score"), plan)
    assert(!plan.contains("lambdafunction"), plan)
  }
}
