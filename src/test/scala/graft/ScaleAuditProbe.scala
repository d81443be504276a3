package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleAuditProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def audit(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val checks = Seq(
        "BroadcastHashJoin" -> plan.contains("BroadcastHashJoin"),
        "SortMergeJoin" -> plan.contains("SortMergeJoin"),
        "TakeOrderedAndProject" -> plan.contains("TakeOrderedAndProject"),
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "PushedFilters-nonempty" -> "PushedFilters: \\[[A-Z]".r.findFirstIn(plan).isDefined,
        "Exchange-count" -> false)
      val exchanges = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
        .findAllIn(plan).size
      println(f"$name%-22s exch=$exchanges " + checks.filter(_._2).map(_._1).mkString(","))
    }
    Seq("q_tpch_q3", "q_tpch_q5", "q_tpch_q17", "q_tpch_q20", "q_tpch_q18",
      "q_tpch_q21", "ev4_asof_join",
      "ev6_range_join", "dd2_minhash_lsh", "ss1_knn_join", "v1_vector_topk_l2sq",
      "v3_vector_ivf", "w1_window_rank", "a1_agg_groupby", "l3_topk",
      "s1_scan_project",
      // round-10 additions: retrieval, PQ, semantic dedup, LM scoring
      "fts1_bm25_search", "fts3_hybrid_rrf", "ss3_ann_pq",
      "dd9_semantic_dedup", "ta7_unigram_logprob", "ta10_bigram_logprob",
      "mm9_phash_pairs",
      // round-11 additions: training export, mixing, line dedup, report
      "cu5_shard_export", "cu6_domain_mix", "dd10_line_dedup",
      "cu7_contamination_report", "cu8_token_shards",
      // round-12 additions: DSIR selection (weights join must broadcast
      // the bucket table; model scoring must add ZERO exchanges over a
      // scan), weighted sampling, keep-best clusters
      "se1_dsir_weights", "se2_dsir_select", "se4_weighted_sample",
      "se5_dsir_score_model", "dd11_keep_best",
      // rule filters must stay pure map-side: only the gate's orderBy
      // exchange is acceptable
      "ta15_gopher_rules", "ta16_c4_clean",
      // round-12b: span removal (hash-keyed shuffles only, no cartesian,
      // no single-partition window) and CCNet bucketing (LM tables must
      // BROADCAST; ranking exchanges are range/hash, bounded count)
      "dd12_span_dedup", "ta18_ccnet_buckets",
      // round-13: duplicate-passage detection — hint-free since r13 (the
      // candidate set is O(corpus) on boilerplate-heavy crawls; AQE may
      // still broadcast when actually small, which is the point) — and
      // the stratified per-domain draw (narrow race frame; the rank
      // filter's WindowGroupLimit heap is asserted in SelectionSpec)
      "dd8_dup_passages", "cu13_sample_per_domain").foreach(audit)
    spark.stop()
  }
}
