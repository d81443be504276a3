package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage wall-clock breakdown of the `curate_pipeline` bench entry —
  * measurement tooling for the optimization rounds (guide §1: find where the
  * time goes before touching anything). Each stage is timed in isolation
  * against the PREVIOUS stage's checkpointed output, mirroring what
  * curateCorpus's LocalCheckpointStore boundaries pay. */
object CurateStageProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    // warm up
    docs.limit(1).write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      println(s"--- pass $i ---")
      val input = time("count_input")(docs.count())
      val normalized = docs.withColumn("text",
        graft.llm.TextAnalysis.normalizeText(col("text")))
      val quality = time("quality_ckpt") {
        val q = graft.llm.Curation.qualityGate(normalized,
          graft.llm.TextAnalysis.qualityScore(col("text")), 0.3)
          .localCheckpoint(true)
        q.count(); q
      }
      val exact = time("exact_ckpt") {
        val e = graft.llm.Dedup.exactKeepFirst(quality, "text", "doc_id")
          .localCheckpoint(true)
        e.count(); e
      }
      val pairs = time("minhash_pairs_ckpt") {
        val p = graft.llm.Dedup.minhashPairs(exact, "doc_id", "text",
          threshold = 0.7).localCheckpoint(true)
        p.count(); p
      }
      val near = time("clusters_reps_ckpt") {
        val n = graft.llm.Dedup.keepClusterRepresentatives(exact, "doc_id",
          pairs).localCheckpoint(true)
        n.count(); n
      }
      val bench = docs.filter(col("doc_id") < 50).select("text")
      val clean = time("decontaminate_ckpt") {
        val c = graft.llm.Curation.decontaminate(near, "doc_id", "text",
          bench, "text", n = 5).localCheckpoint(true)
        c.count(); c
      }
      time("final_mat")(clean.write.format("noop").mode("overwrite").save())
      println(s"input=$input")
    }
    spark.stop()
  }
}
