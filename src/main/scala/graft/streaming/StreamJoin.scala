package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — a capability superset of
  * the reference (Solr has no streaming join; its nearest batch analogs
  * are HashJoinStream/FetchStream, both implemented). The canonical
  * attribution primitive of a 100 TB event pipeline: attribute each
  * click to the SAME user's views in the preceding `window`, as two
  * live streams.
  *
  * Scale shape: Spark keys both sides' state stores by the join key
  * (user_id) — a hash-partitioned stateful shuffle on each side — and
  * the watermark + interval condition bound state: a buffered view is
  * evictable once the click-side watermark passes `view.ts + window`.
  * INNER join emits eagerly on match, so results stream out without
  * waiting for window finalization; on finished input with a lateness
  * covering the input's out-of-orderness, the result set equals the
  * batch interval join exactly (the entry's oracle).
  */
object StreamJoin {

  /** (click event_id, view event_id) pairs for same-user views within
    * [click.ts − window, click.ts]. Input must carry (event_id, ts,
    * user_id, event_type) with TIMESTAMP ts; `window` is an interval
    * literal body like "2 hours".
    *
    * `lateness` is the watermark delay on BOTH sides: an event more
    * than `lateness` behind the observed max event-time is dropped as
    * late. Batch-equivalence on finished input therefore requires
    * `lateness` ≥ the input's out-of-orderness across micro-batches
    * (the entry passes a delay longer than the whole data span, so the
    * equivalence holds for ANY batch split; a production deployment
    * sets its real lateness tolerance and trades completeness for
    * bounded state).
    */
  def clickViewAttribution(events: DataFrame, window: String,
                           lateness: String = "0 seconds"): DataFrame = {
    val clicks = events
      .where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("user_id").as("c_user_id"))
      .withWatermark("click_ts", lateness)
    val views = events
      .where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("user_id").as("v_user_id"))
      .withWatermark("view_ts", lateness)
    clicks.join(views,
      col("c_user_id") === col("v_user_id") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $window") &&
        col("view_ts") <= col("click_ts"))
      .select(col("click_id"), col("view_id"))
  }
}
