package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off forensics main for the recurring ccnet_bucket bench-drift
  * question (VERDICT r13 "what's wrong" #3): executes the EXACT bench
  * query at the bench SF, then prints exchange count, broadcast exchange
  * lines, and the final executed plan's per-node metrics-bearing lines so
  * a round-over-round diff has concrete numbers (exchange count +
  * broadcast build sizes) instead of plan-shape adjectives. */
object CcnetPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder().master("local[8]"), 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val df = graft.llm.TextAnalysis.ccnetBuckets(
      docs.filter(col("doc_id") % 10 === 0), docs, "doc_id",
      groupCol = Some("lang"))
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)"
      .r.findAllIn(plan).size
    println(s"exchanges=$exchanges")
    plan.linesIterator.filter(l =>
      l.contains("Broadcast") || l.contains("Exchange"))
      .foreach(l => println(l.trim.take(160)))
  }
}
