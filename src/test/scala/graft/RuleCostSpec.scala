package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The catalog self-registers [[org.apache.spark.sql.graftglue.AggProjectionRewrite]]
  * and [[graft.sources.GraftStreamFilterPushdown]] into EVERY session's
  * optimizer, so their guard paths run on every query the session ever
  * plans — including plans with no graft tables at all. That no-op path
  * must be O(plan-size) cheap and do ZERO catalog I/O: a manifest read per
  * query would tax the whole workload for a feature it doesn't use. */
class RuleCostSpec extends SparkSpec {

  test("no-op path: zero manifest reads and sub-ms rule time on non-graft plans") {
    org.apache.spark.sql.graftglue.AggProjectionRewrite.register(spark)
    graft.sources.GraftStreamFilterPushdown.register(spark)

    // a non-graft plan in the bench's hot shape: parquet scan + filter +
    // GROUP BY (an Aggregate node, so AggProjectionRewrite's matcher runs)
    val dir = Files.createTempDirectory("graft-rulecost").toString
    spark.range(0, 10000)
      .selectExpr("id", "id % 7 AS k", "id * 2 AS v")
      .write.mode("overwrite").parquet(dir)

    val ruleNames = Set(
      "org.apache.spark.sql.graftglue.AggProjectionRewrite",
      "graft.sources.GraftStreamFilterPushdown")
    val readsBefore = graft.api.Manifest.readCount.get()
    val perQueryNs = (1 to 20).map { _ =>
      val df = spark.read.parquet(dir).filter(col("v") > 100)
        .groupBy("k").agg(sum("v").as("s"))
      df.queryExecution.optimizedPlan // force optimization under the tracker
      val rules = df.queryExecution.tracker.rules
      val hits = rules.filter { case (name, _) => ruleNames(name) }
      assert(hits.nonEmpty,
        s"graft rules never ran — tracker keys: ${rules.keys.toSeq.sorted.take(5)}…")
      hits.values.map(_.totalTimeNs).sum
    }
    assert(graft.api.Manifest.readCount.get() == readsBefore,
      "optimizer rules read a manifest while planning a non-graft query")
    // generous CI bound; the measured median is recorded in PROGRESS.jsonl
    // (sub-ms). A manifest read or file listing in the guard would cost
    // milliseconds per query and trip this.
    val medianNs = perQueryNs.sorted.apply(perQueryNs.size / 2)
    assert(medianNs < 2000000L,
      s"no-op rule cost ${medianNs / 1e6} ms/query — guard must stay O(plan)")
    info(f"median graft-rule time on non-graft plans: ${medianNs / 1e6}%.3f ms/query")
  }
}
