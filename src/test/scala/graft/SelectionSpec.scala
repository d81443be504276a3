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
}
