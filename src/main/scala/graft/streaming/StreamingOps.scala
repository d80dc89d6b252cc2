package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY §2.8).
  *
  * The reference is batch-only; these are the streaming-native versions of
  * its semantically-streaming operators: event-time windowed aggregation
  * with watermark, gap sessionization via native session_window, and the
  * early-classification predict loop as flatMapGroupsWithState (classify a
  * growing prefix, emit as soon as the stopping rule fires).
  */
object StreamingOps {

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double, event_type: String)
  case class EarlyDecision(user_id: Long, decided_at: Int, label: Int, cost: Double)

  /** Event-time tumbling window agg with late-data watermark. */
  def hourlyCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_v"))

  /** Gap-based sessionization with the native session_window (30-min gap,
    * same semantics as the batch ts_sessionize query). */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        (unix_millis(max(col("ts"))) - unix_millis(min(col("ts")))).as("duration_ms"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("duration_ms"))

  /** Early classification over growing prefixes, keyed by series id —
    * the streaming form of NonMyopicEarlyClassifier.predict
    * (`early_classification/early_classification.py:350-359`): buffer the
    * prefix in state; when the classifier's stopping rule fires (or the
    * stream ends for the key), emit one decision.
    *
    * `classify`: prefix → (label, confidence). `minLen`/`tau`: emit once
    * confidence ≥ tau (or at maxLen). State is the O(prefix) buffer only.
    */
  def earlyClassify(events: Dataset[Event],
                    classify: Array[Double] => (Int, Double),
                    minLen: Int, maxLen: Int, tau: Double): Dataset[EarlyDecision] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Double], EarlyDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[Array[Double]]) =>
          // empty buffer is the "already decided" sentinel (a live buffer
          // always has >= 1 value; null state values are rejected by Spark)
          if (state.exists && state.get.isEmpty) Iterator.empty
          else {
            var buf = state.getOption.getOrElse(Array.empty[Double])
            var decision: Option[EarlyDecision] = None
            val sorted = batch.toArray.sortBy(e => (e.ts.getTime, e.value))
            var i = 0
            while (i < sorted.length && decision.isEmpty) {
              buf = buf :+ sorted(i).value
              if (buf.length >= minLen) {
                val (label, conf) = classify(buf)
                if (conf >= tau || buf.length >= maxLen)
                  decision = Some(EarlyDecision(uid, buf.length, label, 1.0 - conf))
              }
              i += 1
            }
            decision match {
              case Some(d) => state.update(Array.empty[Double]); Iterator.single(d)
              case None => state.update(buf); Iterator.empty
            }
          }
      }
  }
}
