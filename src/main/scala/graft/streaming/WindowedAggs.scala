package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming windowed aggregation — the capability superset of the
  * reference's `TimeSeriesStream` tumbling range facets (SURVEY.md
  * §2.9): event-time tumbling/sliding/session windows with watermarked
  * late-data handling (the reference has no true stream-window
  * operator; its nearest is a repeated range facet).
  *
  * The same aggregation shape as the batch `time_series` entry
  * ([[graft.operators.Relational.timeSeries]]) — streaming and batch
  * answers agree for fully-arrived windows.
  */
object WindowedAggs {

  final case class Event(ts: java.sql.Timestamp, event_type: String, value: Double)

  /** Tumbling 1-day counts+sums with a watermark: late events beyond
    * `lateness` are dropped from finalized windows.
    */
  def tumblingDaily(events: Dataset[Event], lateness: String = "1 hour"): DataFrame =
    events.toDF()
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("value_cents"))

  /** Sliding windows (1 day, sliding 6h) — same watermark semantics. */
  def slidingCounts(events: Dataset[Event], lateness: String = "1 hour"): DataFrame =
    events.toDF()
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 day", "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Custom keyed state via flatMapGroupsWithState (the brief's
    * KeyValueGroupedDataset custom-state path): per event_type, a
    * running (count, sum_cents, max_cents) accumulated ACROSS
    * micro-batches in GroupState. The fold is commutative/associative,
    * so the final state is identical for any batch split or intra-batch
    * order; each trigger emits the running snapshot, and the final
    * snapshot per key (the max-count row — all three fields are
    * monotone) equals the batch aggregate exactly. At scale the state
    * store is hash-partitioned by key across executors (RocksDB-backed)
    * and a timeout/watermark bounds it; the finite AvailableNow run
    * keeps every key, which the oracle compare requires.
    */
  /** Half-away-from-zero cents quantization, matching SQL round()
    * (Java math.round is half-toward-+inf and differs on negative
    * exact-.5 ties — e.g. −0.005 must become −1 cent, not 0).
    */
  def cents(value: Double): Long =
    if (value >= 0) math.floor(value * 100 + 0.5).toLong
    else -math.floor(-value * 100 + 0.5).toLong

  def runningState(events: Dataset[Event]): Dataset[(String, Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[(Long, Long, Long), (String, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Event], state: GroupState[(Long, Long, Long)]) =>
          // max seeded from the first event, not 0: all-negative values
          // must yield a negative max, exactly as SQL max(round(v*100))
          var (n, sm, mx) = state.getOption.getOrElse((0L, 0L, Long.MinValue))
          it.foreach { e =>
            val c = cents(e.value)
            n += 1; sm += c; mx = math.max(mx, c)
          }
          state.update((n, sm, mx))
          Iterator((key, n, sm, mx))
      }
  }

  /** Session windows keyed by event_type with a 30-minute gap. */
  def sessions(events: Dataset[Event], lateness: String = "1 hour"): DataFrame =
    events.toDF()
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("event_type"), col("n"))
}
