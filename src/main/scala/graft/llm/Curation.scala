package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Dataset-curation operators for training-data pipelines: deterministic
 * splitting and balanced subsampling. Both are pure map-side/windowed
 * shapes — no collect, no cross joins — and deterministic across runs and
 * cluster layouts (hash- and key-ordered, never RNG-state-dependent).
 */
object Curation {

  /** Deterministic train/test assignment: split = hash(id) bucket, so the
    * SAME row lands in the SAME split on every run, any partitioning, and
    * any engine that persists the assignment — the property that keeps a
    * test set leak-free across pipeline re-runs. Pure map-side. */
  def hashSplit(df: DataFrame, idCol: String,
                testPermille: Int = 100): DataFrame = {
    require(testPermille >= 0 && testPermille <= 1000, "testPermille in [0,1000]")
    df.withColumn("split",
      when(pmod(xxhash64(col(idCol)), lit(1000L)) < testPermille, "test")
        .otherwise("train"))
  }

  /** Balanced per-group subsample: the first `perGroup` rows of each group
    * in `orderCol` order — caps any group's contribution (e.g. per-language
    * balancing) with ONE key-partitioned window, no shuffle beyond the
    * group key. Deterministic given a total order column. */
  def balancedSample(df: DataFrame, groupCol: String, orderCol: String,
                     perGroup: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(orderCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= perGroup)
      .drop("_rn")
  }

  /** Quality-gated filter: keep rows whose score column clears `minScore` —
    * trivially composable with TextAnalysis.qualityScore; exists so the
    * curation surface is enumerable as an operator. */
  def qualityGate(df: DataFrame, scoreCol: Column, minScore: Double): DataFrame =
    df.filter(scoreCol >= minScore)

  /** Benchmark DECONTAMINATION: drop corpus documents sharing ≥ `minShared`
    * distinct word n-grams with ANY benchmark document — the step that keeps
    * eval sets out of training data.
    *
    * Candidate generation is an equi-join on the 64-bit n-gram hash: the
    * shuffle carries (gram_hash, id), never gram text and never the
    * corpus × benchmark product; the benchmark side (distinct hashes of a
    * small eval set) broadcasts. A 64-bit hash collision could flag one
    * clean doc per ~10¹² distinct-gram pairs — the standard trade at corpus
    * scale, and the conservative direction (never leaks contamination). */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    n: Int = 8, minShared: Int = 1): DataFrame = {
    val cGrams = corpus.select(col(idCol).as("_cid"),
      explode(Dedup.shingles(col(textCol), n)).as("_g"))
      .select(col("_cid"), xxhash64(col("_g")).as("_gh"))
    val bGrams = benchmark
      .select(explode(Dedup.shingles(col(benchTextCol), n)).as("_g"))
      .select(xxhash64(col("_g")).as("_gh"))
      .distinct()
    val contaminated = cGrams.join(bGrams, Seq("_gh"))
      .groupBy("_cid")
      .agg(count_distinct(col("_gh")).as("_shared"))
      .filter(col("_shared") >= minShared)
      .select(col("_cid").as(idCol))
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }
}
