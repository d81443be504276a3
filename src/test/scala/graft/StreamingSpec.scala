package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Events

/**
 * Structured Streaming execution of the events operators: the same transform
 * applied to a readStream source must, after processing all available input,
 * agree with the batch run (streaming/batch parity — SURVEY §7.4).
 */
class StreamingSpec extends SparkSpec {

  private def eventsBatch = {
    // ns-long or naive-µs timestamps → µs TimestampType (same handling as
    // SparkEntry: NTZ casts are wall-clock identity under the UTC session)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(sf("sf0.001") + "/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  test("streaming tumbling window agrees with batch") {
    val batchDf = eventsBatch
    val dir = Files.createTempDirectory("ev-stream")
    batchDf.write.parquet(dir.toString + "/in")

    val stream = spark.readStream
      .schema(batchDf.schema)
      .parquet(dir.toString + "/in")
    val q = Events.tumblingStats(stream, "1 hour", watermark = "1 minute")
      .writeStream.outputMode("complete")
      .format("memory").queryName("ev_tumbling")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("ev_tumbling")
      .orderBy("window_start", "event_type").collect()
    val want = Events.tumblingStats(batchDf, "1 hour")
      .orderBy("window_start", "event_type").collect()
    assert(got.length == want.length && got.length > 0)
    assert(got.toSeq == want.toSeq)
  }

  test("streaming trending terms agree with batch; top-k finisher ranks") {
    val batchDf = eventsBatch.withColumn("text",
      concat_ws(" ", col("event_type"), col("event_type"), lit("x")))
    val dir = Files.createTempDirectory("ev-trend")
    batchDf.write.parquet(dir.toString + "/in")
    val stream = spark.readStream.schema(batchDf.schema)
      .parquet(dir.toString + "/in")
    val q = Events.trendingTerms(stream, "text", "1 hour",
        watermark = "1 minute")
      .writeStream.outputMode("complete")
      .format("memory").queryName("ev_trending")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("ev_trending")
      .orderBy("window_start", "term").collect()
    val want = Events.trendingTerms(batchDf, "text", "1 hour")
      .orderBy("window_start", "term").collect()
    assert(got.length == want.length && got.length > 0)
    assert(got.toSeq == want.toSeq)
    // finisher: per window, at most k rows, ranks dense from 1, and the
    // rank-1 term carries that window's maximum count
    val top = Events.topTermsPerWindow(spark.table("ev_trending"), 2)
    val perWin = top.groupBy("window_start")
      .agg(count(lit(1)).as("rows"), min("term_rank").as("minr"))
      .collect()
    assert(perWin.nonEmpty &&
      perWin.forall(r => r.getLong(1) <= 2 && r.getInt(2) == 1))
    val maxes = spark.table("ev_trending").groupBy("window_start")
      .agg(max("n").as("maxn"))
      .select(col("window_start").as("ws"), col("maxn"))
    val bad = top.filter(col("term_rank") === 1)
      .join(maxes, col("window_start") === col("ws"))
      .filter(col("n") =!= col("maxn")).count()
    assert(bad == 0, "rank-1 term must carry the window's max count")
  }

  test("streaming dedup-within-watermark emits one row per key") {
    val batchDf = eventsBatch
    val dir = Files.createTempDirectory("ev-dedup")
    batchDf.write.parquet(dir.toString + "/in")
    val stream = spark.readStream.schema(batchDf.schema)
      .parquet(dir.toString + "/in")
    val q = Events.dedupWithinWatermark(stream, "10 minutes",
        Seq("user_id", "event_type"))
      .select("user_id", "event_type")
      .writeStream.outputMode("append")
      .format("memory").queryName("ev_dedup")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val n = spark.table("ev_dedup").distinct().count()
    val keys = spark.table("ev_dedup").count()
    // every emitted row is a distinct key (dedup held within watermark)
    assert(n == keys && n > 0)
  }

  test("flatMapGroupsWithState per-user running stats match batch aggregation") {
    val batchDf = eventsBatch
    val dir = Files.createTempDirectory("ev-state")
    batchDf.write.parquet(dir.toString + "/in")
    val stream = spark.readStream.schema(batchDf.schema)
      .parquet(dir.toString + "/in")
    val q = Events.userRunningStats(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("ev_state")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // last update per user must equal the batch per-user aggregate
    val got = spark.table("ev_state")
      .groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"))
    val want = batchDf.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    assert(got.join(want, Seq("user_id", "n_events")).count() == want.count())
  }

  test("running stats stay correct for a skewed hot user (no group buffering)") {
    // one user owns ~100k of 100.2k events in a single micro-batch: the old
    // rows.toSeq.sortBy materialized that whole group in one task's heap;
    // the single-pass fold must produce identical output
    val ev = spark.range(0, 100200).select(
      col("id").as("event_id"),
      expr("timestamp_micros(id * 1000000)").as("ts"),
      when(col("id") < 100000, lit(1L)).otherwise(col("id") % 50 + 100).as("user_id"),
      concat(lit("t"), col("id") % 7).as("event_type"),
      (col("id") % 100).cast("double").as("value"))
    val dir = Files.createTempDirectory("ev-hot")
    ev.write.parquet(dir.toString + "/in")
    val stream = spark.readStream.schema(ev.schema).parquet(dir.toString + "/in")
    val q = Events.userRunningStats(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("ev_hot")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    // final state per user (row with max n_events) vs batch ground truth:
    // count, exact sum, and the event_type of the (ts, event_id)-max row
    val got = spark.table("ev_hot")
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("n_events").desc)))
      .filter(col("_rk") === 1)
      .select("user_id", "n_events", "total_value", "last_type")
    val want = ev
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"),
        max(when(col("_rk") === 1, col("event_type"))).as("last_type"))
    assert(want.count() == 51)
    assert(got.join(want, Seq("user_id", "n_events", "last_type")).count() == 51,
      "per-user (count, last_type) diverged from batch ground truth")
    // totals compared with a tolerance: the fold accumulates doubles in
    // stream order, batch sum in partition order
    val diff = got.select(col("user_id"), col("total_value").as("g"))
      .join(want.select(col("user_id"), col("total_value").as("w")), "user_id")
      .filter(abs(col("g") - col("w")) > 1e-3).count()
    assert(diff == 0)
  }

  test("streaming session windows run end-to-end") {
    val batchDf = eventsBatch
    val dir = Files.createTempDirectory("ev-sess")
    batchDf.write.parquet(dir.toString + "/in")
    val stream = spark.readStream.schema(batchDf.schema)
      .parquet(dir.toString + "/in")
    val q = Events.sessionStats(stream, "30 minutes", watermark = "1 minute")
      .writeStream.outputMode("complete")
      .format("memory").queryName("ev_sessions")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("ev_sessions").count() > 0)
  }

  test("stream-stream time-range join agrees with its batch application") {
    val batchDf = eventsBatch.filter(col("user_id") < 30)
    val dir = Files.createTempDirectory("ev-ssj")
    batchDf.write.parquet(dir.toString + "/in")
    def split(df: org.apache.spark.sql.DataFrame) =
      (df.filter(col("event_type") === "view"),
        df.filter(col("event_type") === "purchase"))
    val stream = spark.readStream.schema(batchDf.schema)
      .parquet(dir.toString + "/in")
    val (sv, sp) = split(stream)
    val q = Events.viewsWithinPurchaseWindow(sv, sp, "2 hours",
        watermark = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("ev_ssj")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val (bv, bp) = split(batchDf)
    val want = Events.viewsWithinPurchaseWindow(bv, bp, "2 hours")
      .orderBy("p_id", "v_id").collect()
    val got = spark.table("ev_ssj").orderBy("p_id", "v_id").collect()
    assert(got.length == want.length && want.nonEmpty,
      s"${got.length} vs ${want.length}")
    assert(got.toSeq == want.toSeq)
  }

  test("sinkToTable commits micro-batches transactionally, exactly once") {
    import graft.api._
    import org.apache.spark.sql.types._
    val batchDf = eventsBatch.select("event_id", "user_id", "event_type")
      .limit(200)
    val dir = Files.createTempDirectory("ev-sink")
    batchDf.write.parquet(dir.toString + "/in")

    val root = Files.createTempDirectory("graft-sink").toString
    val vs = VastSession(spark, root)
    vs.createBucket("b")
    vs.transaction(tx => tx.bucket("b").createSchema("m").createTable("sunk",
      StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType)))))

    val stream = spark.readStream.schema(batchDf.schema)
      .parquet(dir.toString + "/in")
    val q = Events.sinkToTable(stream, vs, "b", "m", "sunk",
      dir.toString + "/ckpt")
    q.processAllAvailable()
    q.stop()

    vs.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("sunk")
      assert(t.select().count() == 200)
      // high-water mark recorded in the SAME commit as the insert
      assert(t.properties.get("graft.stream.lastBatchId").exists(_.toLong >= 0))
    }
  }
}
