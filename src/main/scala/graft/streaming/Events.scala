package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Streaming operators over the `events` table (net-new vs the reference —
 * it has no streaming abstractions, SURVEY §1.1 last row; its closest shape
 * is the paginated record-batch result stream).
 *
 * Each transform is written against an unbounded DataFrame: applied to
 * `spark.readStream` input it runs under Structured Streaming with
 * watermark-bounded state; applied to a batch DataFrame it computes the same
 * answer (used by the correctness oracle). Batch-only variants (window
 * functions over event-time) live in the *Batch methods.
 */
object Events {

  /** Tumbling-window counts/sums per event type. Streaming-safe: watermark
    * bounds state; append mode emits closed windows only. */
  def tumblingStats(events: DataFrame, width: String,
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding-window counts. */
  def slidingCounts(events: DataFrame, width: String, slide: String,
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Streaming trending terms: per tumbling window, token counts of a text
    * column — the corpus-drift monitor for an ingest feed (a vocabulary
    * shift or spam burst shows up as new terms spiking window-over-window).
    * Tokens explode map-side BEFORE the windowed aggregation, so state is
    * bounded by (windows-in-watermark × distinct terms), never by rows;
    * append mode emits closed windows only. Rank with [[topTermsPerWindow]]
    * on the sink (per-window top-k needs the closed window's full counts —
    * a ranking inside the stream would be a result-updating query). */
  def trendingTerms(events: DataFrame, textCol: String, width: String,
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(split(col(textCol), " ")).as("term"))
      .groupBy(window(col("ts"), width), col("term"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("term"), col("n"))

  /** Batch finisher over the trending-terms sink: top-k terms per window,
    * (n desc, term) total-ordered. */
  def topTermsPerWindow(counts: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("window_start")
      .orderBy(col("n").desc, col("term").asc)
    counts.withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
  }

  /** Session windows per user (gap-based), streaming-native. */
  def sessionStats(events: DataFrame, gap: String,
                   watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Streaming dedup within the watermark horizon. */
  def dedupWithinWatermark(events: DataFrame, watermark: String,
                           keys: Seq[String]): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Typed event row for stateful processing. */
  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
                            user_id: Long, event_type: String, value: Double)
  /** Per-user running state for `userRunningStats`. */
  final case class UserState(n: Long, total: Double, lastType: String)
  final case class UserUpdate(user_id: Long, n_events: Long,
                              total_value: Double, last_type: String)

  /**
   * Custom-state streaming operator: per-user running aggregates via
   * `flatMapGroupsWithState` (the KeyValueGroupedDataset path for semantics
   * windows/aggs can't express). State is one small record per user —
   * at scale, backed by the RocksDB state store.
   *
   * The group iterator is folded in ONE pass with O(1) memory: `n` and
   * `total` are order-independent, and `last_type` only needs the
   * (ts, event_id)-maximal row, tracked inline. No `toSeq`/sort — a hot
   * user with millions of events in a batch never materializes in a task's
   * heap. Idle users are evicted by a processing-time timeout (streaming
   * runs only; Spark never fires timeouts in batch execution).
   */
  def userRunningStats(events: DataFrame,
                       idleTimeout: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("event_id"), col("ts").cast("timestamp"),
        col("user_id"), col("event_type"), col("value"))
      .as[EventRow]
    def update(user: Long, rows: Iterator[EventRow],
               state: GroupState[UserState]): Iterator[UserUpdate] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var st = state.getOption.getOrElse(UserState(0L, 0.0, ""))
      var bestTs = Long.MinValue
      var bestId = Long.MinValue
      var bestType = st.lastType
      var any = false
      rows.foreach { r =>
        any = true
        st = UserState(st.n + 1, st.total + r.value, st.lastType)
        val t = r.ts.getTime
        if (t > bestTs || (t == bestTs && r.event_id > bestId)) {
          bestTs = t; bestId = r.event_id; bestType = r.event_type
        }
      }
      if (any) {
        st = st.copy(lastType = bestType)
        state.update(st)
        state.setTimeoutDuration(idleTimeout)
      }
      Iterator.single(UserUpdate(user, st.n, st.total, st.lastType))
    }
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.ProcessingTimeTimeout())(update)
      .toDF()
  }

  /** Batch sessionization with explicit session ids (gap > `gapMinutes`
    * starts a new session) — the window-function formulation, exact and
    * oracle-checkable; the streaming path uses session_window above. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("_prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("_prev_ts")) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("_new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev_ts", "_new_session")
  }

  /** Batch keep-first dedup by key ordered by event time. */
  def dedupKeepFirstBatch(events: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("ts"), col("event_id"))
    events.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /**
   * Stream-stream inner join: views matched to purchases of the same user
   * within [purchase ts, purchase ts + window]. Both sides carry watermarks
   * and the join condition bounds event-time distance, so each side's state
   * store only buffers `watermark + window` worth of rows — the
   * Structured-Streaming-native formulation of the range join (batch
   * equivalent: `ops.Relational.rangeJoin`). Applied to batch DataFrames it
   * computes the same answer (used by the parity spec).
   */
  def viewsWithinPurchaseWindow(views: DataFrame, purchases: DataFrame,
                                window: String,
                                watermark: String = "10 minutes"): DataFrame = {
    val v = views
      .select(col("event_id").as("v_id"), col("user_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    val p = purchases
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    v.join(p, col("user_id") === col("p_user") &&
        col("v_ts") >= col("p_ts") &&
        col("v_ts") <= col("p_ts") + expr(s"INTERVAL $window"))
      .select("p_id", "v_id", "user_id", "p_ts", "v_ts")
  }

  /**
   * Structured-Streaming sink into a catalog table: each micro-batch inserts
   * and advances a batch-id high-water mark in table props inside ONE
   * transaction, whose manifest CAS makes the pair atomic. foreachBatch
   * redelivers batches at-least-once on recovery; the high-water-mark skip
   * turns that into exactly-once table contents — the classic transactional
   * sink, expressed through the engine's own commit protocol.
   */
  def sinkToTable(stream: DataFrame, session: graft.api.VastSession,
                  bucket: String, schemaPath: String, table: String,
                  checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        session.transaction { tx =>
          val t = tx.bucket(bucket).schema(schemaPath).table(table)
          val last = t.properties.get("graft.stream.lastBatchId")
            .map(_.toLong).getOrElse(-1L)
          if (id > last) {
            t.insert(batch)
            t.setProperties(Map("graft.stream.lastBatchId" -> id.toString))
          }
        }
        ()
      }
      .start()
}
