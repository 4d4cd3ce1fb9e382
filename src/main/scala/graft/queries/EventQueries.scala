package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import Det._

/** Event-stream analytics over the `events` table. The raw column is an
  * epoch-nanosecond timestamp read as LongType (see Tables.events); DuckDB
  * sees the same column µs-truncated, so every derived time value here is
  * integer arithmetic that is invariant under that truncation (bucket sizes
  * are multiples of 1ms).
  */
object EventQueries {

  private val HourNs = 3600L * 1000 * 1000 * 1000
  private val SessionGapUs = 30L * 60 * 1000 * 1000 // 30 min in µs

  val defs: Seq[QueryDef] = Seq(

    // ---- hourly rollup per event type ----
    QueryDef(
      "q30_events_hourly",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(expr(s"ts div $HourNs").as("hour_bucket"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            dsum(col("value")).as("total_value"),
            count(when(col("value") > lit(50.0), lit(1))).as("n_high"))
      },
      Some(s"""SELECT CAST(epoch_ns(ts) // $HourNs AS BIGINT) AS hour_bucket, event_type,
          COUNT(*) AS n_events, ${sqlSum("value")} AS total_value,
          COUNT(CASE WHEN value > 50.0 THEN 1 END) AS n_high
        FROM events GROUP BY 1, 2"""),
      headline = true),

    // ---- sessionization: gaps-and-islands via window lag ----
    QueryDef(
      "q31_events_sessions",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_id"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        e.withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
          .withColumn("new_session",
            when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > lit(SessionGapUs), lit(1)).otherwise(lit(0)))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            count(when(col("new_session") === 1, lit(1))).as("n_sessions"))
      },
      Some(s"""SELECT user_id, COUNT(*) AS n_events,
          COUNT(CASE WHEN new_session = 1 THEN 1 END) AS n_sessions
        FROM (
          SELECT user_id,
            CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > $SessionGapUs THEN 1 ELSE 0 END AS new_session
          FROM (
            SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id,
              LAG(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
                ORDER BY epoch_ns(ts) // 1000, event_id) AS prev_ts
            FROM events))
        GROUP BY user_id"""),
      headline = true),

    // ---- built-in session_window batch sessionization (complements the
    // lag-based q31 and the streaming mapGroupsWithState variant) ----
    // Oracle: gaps-and-islands over the same µs timestamps. Note the gap
    // comparison is `>=`, not `>`: Spark merges sessions only while the
    // next event starts strictly before session_end = last + gap.
    QueryDef(
      "q57_session_window",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("event_time"), col("value"))
        e.groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"),
            max(col("n_events")).as("max_session_events"))
      },
      Some(s"""SELECT user_id, COUNT(*) AS n_sessions, MAX(cnt) AS max_session_events FROM (
          SELECT user_id, session_id, COUNT(*) AS cnt FROM (
            SELECT user_id,
              SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS UNBOUNDED PRECEDING) AS session_id
            FROM (
              SELECT user_id, ts_us, event_id,
                CASE WHEN prev_ts IS NULL OR ts_us - prev_ts >= $SessionGapUs THEN 1 ELSE 0 END AS new_session
              FROM (
                SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id,
                  LAG(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
                    ORDER BY epoch_ns(ts) // 1000, event_id) AS prev_ts
                FROM events)))
          GROUP BY user_id, session_id)
        GROUP BY user_id"""),
      headline = true),

    // ---- t-digest-style sketch percentiles, rank-ε threshold oracle ----
    // approx_percentile with accuracy 1000 guarantees rank error ≤
    // n/1000; the query brackets each estimate between the EXACT
    // interpolated percentiles at q∓0.05 (a 50x margin) computed in the
    // same plan, and emits booleans DuckDB pins to TRUE per group — the
    // sketch's values stay engine-specific, the rank-correctness claim
    // hash-checks.
    QueryDef(
      "q58_approx_percentile",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val approx = e.groupBy(col("event_type"))
          .agg(expr("approx_percentile(value, array(0.5, 0.95, 0.99), 1000)").as("pcts"))
          .select(col("event_type"),
            element_at(col("pcts"), 1).as("p50"),
            element_at(col("pcts"), 2).as("p95"),
            element_at(col("pcts"), 3).as("p99"))
        val exact = e.groupBy(col("event_type")).agg(
          expr("percentile(value, 0.45)").as("lo50"), expr("percentile(value, 0.55)").as("hi50"),
          expr("percentile(value, 0.90)").as("lo95"), expr("percentile(value, 1.0)").as("hi95"),
          expr("percentile(value, 0.94)").as("lo99"), expr("percentile(value, 1.0)").as("hi99"))
        approx.join(exact, "event_type").select(col("event_type"),
          (col("p50") >= col("lo50") && col("p50") <= col("hi50")).as("p50_ok"),
          (col("p95") >= col("lo95") && col("p95") <= col("hi95")).as("p95_ok"),
          (col("p99") >= col("lo99") && col("p99") <= col("hi99")).as("p99_ok"))
      },
      Some("""SELECT event_type, TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
        FROM events GROUP BY event_type""")),

    // ---- exact interpolated median (split out of q58 so it hash-checks;
    // Spark percentile() and DuckDB quantile_cont share the formula) ----
    QueryDef(
      "q60_events_median",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5)").as("exact_median"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT event_type, quantile_cont(value, 0.5) AS exact_median,
          COUNT(*) AS n
        FROM events GROUP BY event_type""")),

    // ---- per-user, per-type pivot-style aggregation ----
    QueryDef(
      "q32_events_user_stats",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_events"),
            count(when(col("event_type") === "purchase", lit(1))).as("n_purchase"),
            count(when(col("event_type") === "click", lit(1))).as("n_click"),
            count(when(col("event_type") === "error", lit(1))).as("n_error"),
            dsum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))).as("purchase_value"))
      },
      Some(s"""SELECT user_id, COUNT(*) AS n_events,
          COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
          COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
          COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
          ${sqlSum("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END")} AS purchase_value
        FROM events GROUP BY user_id""")),

    // ---- Structured Streaming, driver-visible: a REAL micro-batch job ----
    // (file source -> watermark -> windowed agg -> AvailableNow -> memory
    // sink), not a batch query dressed up. Append mode emits only windows
    // the final watermark closed, so the oracle reproduces the emission
    // rule: hour windows whose end <= max event time (watermark delay 0).
    // Value sums ride the decimal(38,10) route inside the streaming agg —
    // state merge order cannot perturb them. The hour bucket is ns-integer
    // arithmetic invariant under DuckDB's µs view (bucket ends are
    // ms-aligned; checked: no fixture's max ts sits on a boundary).
    QueryDef(
      "q78_stream_windowed_agg",
      (s, dir) => {
        val ckpt = java.nio.file.Files.createTempDirectory("q78-ckpt").toString
        val sink = "q78_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
        // the file stream source wants a DIRECTORY of drops; link the
        // static fixture in (the stream then sees it as one arriving file)
        val streamDir = java.nio.file.Files.createTempDirectory("q78-in")
        java.nio.file.Files.createSymbolicLink(
          streamDir.resolve("events.parquet"),
          java.nio.file.Paths.get(dir, "events.parquet").toAbsolutePath)
        val agg = graft.streaming.StreamOps.eventFileStream(s, streamDir.toString)
          .withWatermark("event_time", "0 seconds")
          .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(38, 10))).as("total_dec"))
        val q = agg.writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(sink)
          .select(
            expr("unix_micros(window.start) div 3600000000").cast(LongType).as("hour_bucket"),
            col("event_type"), col("n_events"),
            col("total_dec").cast(DoubleType).as("total_value"))
      },
      Some(s"""WITH agg AS (
          SELECT CAST(epoch_ns(ts) // $HourNs AS BIGINT) AS hour_bucket, event_type,
            COUNT(*) AS n_events, ${sqlSum("value")} AS total_value
          FROM events GROUP BY 1, 2)
        SELECT * FROM agg
        WHERE (hour_bucket + 1) * 3600000000 <= (SELECT MAX(epoch_us(ts)) FROM events)"""))
  )
}
