package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/**
 * Hybrid retrieval: fuse lexical (BM25) and dense (vector) rankings with
 * Reciprocal Rank Fusion (Cormack et al. 2009) — `score(d) =
 * Σ_r 1/(k0 + rank_r(d))`, the standard zero-tuning fusion that needs no
 * score normalization across heterogeneous retrievers.
 *
 * Scale shape: each retriever already returns a BOUNDED top-N (its own
 * distributed top-k), so fusion operates on ≤ Σ N rows — a metadata-scale
 * union + one tiny aggregation, regardless of corpus size. Determinism:
 * ranks are ints, each doc receives at most one contribution per
 * retriever, and IEEE addition of the ≤2 contributions is
 * order-independent — any engine computing the same formula agrees
 * bit-for-bit.
 */
object Search {

  /** Attach a dense 1-based `rank` to an ordered bounded result. The
    * single-partition window is fine BY CONSTRUCTION: input is a top-N.
    * `partitionBy(lit(0))` = same semantics, explicit partition spec (no
    * WindowExec warning; plan-pin-able). */
  def ranked(df: DataFrame, orderCols: org.apache.spark.sql.Column*): DataFrame =
    df.withColumn("rank",
      row_number().over(Window.partitionBy(lit(0)).orderBy(orderCols: _*)))

  /** RRF-fuse rankings (each `(id, rank)`): top-k by fused score. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame =
    rankings.map(_.select(col("id"),
        (lit(1.0) / (lit(k0) + col("rank"))).as("contrib")))
      .reduce(_.unionByName(_))
      .groupBy("id").agg(sum(col("contrib")).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("id").asc)
      .limit(k)

  /**
   * One-call hybrid search over a corpus carrying both text and an
   * embedding: BM25 for the term bag, exact (or caller-prepared) kNN for
   * the query vector, RRF on the two bounded rankings.
   */
  def hybridSearch(docs: DataFrame, idCol: String, textCol: String,
                   vecCol: String, terms: Seq[String],
                   queryVec: Seq[Float], k: Int,
                   perRetriever: Int = 50, k0: Int = 60): DataFrame = {
    val lexical = ranked(
      TextAnalysis.bm25Search(docs, idCol, textCol, terms, perRetriever)
        .withColumnRenamed(idCol, "id"),
      col("bm25").desc, col("id").asc).select("id", "rank")
    val dense = ranked(
      docs.select(col(idCol).as("id"),
          Distances.l2sq(col(vecCol), lit(queryVec.toArray)).as("_d"))
        .orderBy(col("_d").asc, col("id").asc).limit(perRetriever),
      col("_d").asc, col("id").asc).select("id", "rank")
    rrfFuse(Seq(lexical, dense), k, k0)
  }
}
