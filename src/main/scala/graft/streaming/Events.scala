package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream operators over the `events` table (`event_id, ts,
  * user_id, event_type, value, props`). Every operator assumes `ts` is
  * BIGINT nanoseconds; the read boundaries normalize whatever the lake
  * physically stores to that convention
  * ([[graft.sources.Tables.normalizeEventTs]] for batch,
  * [[eventStream]] for streams).
  *
  * Both a batch form (oracle-verifiable) and a Structured Streaming form
  * (watermark + windowed aggregation) are provided; the streaming form is
  * the incremental execution of the same logical aggregation.
  */
object Events {

  val NanosPerHour: Long = 3600L * 1000 * 1000 * 1000

  /** The events parquet as a stream with `ts` already normalized to
    * BIGINT nanoseconds (the engine-wide convention), whatever the
    * lake's physical timestamp type. Structured Streaming requires an
    * explicit source schema, so the batch footer is probed once at
    * PLAN time (no data read) to learn the stored type — `ts` arrives
    * as BIGINT for TIMESTAMP(NANOS) lakes (`nanosAsLong`, set by every
    * harness entry point) and as TIMESTAMP/TIMESTAMP_NTZ for µs lakes
    * (the r13 testdata switched to the latter) — and the stream
    * converts exactly as [[graft.sources.Tables.normalizeEventTs]]
    * does for batch.
    */
  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val tsType = spark.read.parquet(dir).schema
      .find(_.name == "ts").map(_.dataType).getOrElse(LongType)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    graft.sources.Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(dir))
  }

  /** Row/state shapes for [[streamingSessionize]] (top-level so Spark can
    * derive Encoders).
    */
  case class Ev(user_id: Long, ts: Long, value: Double)
  case class Sess(start: Long, end: Long, n: Long, sum: Double)
  case class SessOut(user_id: Long, session_start: Long, session_end: Long,
    n_events: Long, value_sum: Double)

  /** Tumbling-hour aggregation (batch): exact integer bucketing on the
    * nanosecond timestamp — `ts div 1h`. One shuffle on
    * (hour_id, event_type) with map-side partial aggregation.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events.groupBy(
        expr(s"ts div ${NanosPerHour}L").as("hour_id"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("value_sum"))

  /** Approximate distinct users per hour — the sketch form of "hourly
    * active users": one register table per hour
    * ([[graft.operators.Sketches.hllRegistersBy]] keyed on the hour id)
    * and the exact-integer estimator on top. At telemetry scale an
    * exact `count(distinct user_id)` per window re-shuffles every event
    * on (hour, user); the register form bounds the exchange at 2^p
    * combined rows per partition per hour, and hourly register tables
    * MERGE across reruns/backfills by the max law. Output one row per
    * hour `(hour_id, m, v_zero, raw_estimate, estimate)`, doubles raw.
    */
  def hourlyDistinctUsers(events: DataFrame, p: Int = 12): DataFrame =
    graft.operators.Sketches.hllEstimateBy(
      graft.operators.Sketches.hllRegistersBy(
        events.withColumn("hour_id", expr(s"ts div ${NanosPerHour}L")),
        Seq("hour_id"), col("user_id"), p),
      Seq("hour_id"), p)

  /** Streaming half of [[hourlyDistinctUsers]]: the per-hour register
    * AGGREGATION on the event stream (one Complete-mode aggregation —
    * chained aggregations are unsupported on streams, so the estimator
    * runs downstream of the sink on the ≤ hours·2^p register rows).
    * Registers, not counts, are the streaming state: bounded per hour
    * regardless of user cardinality, and the emitted table max-merges
    * with any batch backfill's registers.
    */
  def streamingHourlyUserRegisters(
      spark: SparkSession, dir: String, p: Int = 12): DataFrame =
    graft.operators.Sketches.hllRegistersBy(
      eventStream(spark, dir)
        .withColumn("hour_id", expr(s"ts div ${NanosPerHour}L")),
      Seq("hour_id"), col("user_id"), p)

  /** Gap-based sessionization (batch): a new session starts when the gap
    * to the previous event of the same user exceeds `gapNanos`. Windowed
    * lag + running sum — one shuffle on user_id, sorted within
    * partitions; then the session aggregation reuses the same
    * partitioning (no second shuffle of the full data).
    *
    * Timestamps are truncated to microseconds (`ts div 1000`) — the
    * common portable resolution (DuckDB and most engines store µs).
    */
  def sessionize(events: DataFrame, gapNanos: Long): DataFrame = {
    val evs = events.withColumn("ts", expr("ts div 1000"))
    val gapMicros = gapNanos / 1000
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val flagged = evs.withColumn("__new_session",
      when(col("ts") - lag(col("ts"), 1).over(byUser) > gapMicros, 1)
        .when(lag(col("ts"), 1).over(byUser).isNull, 1)
        .otherwise(0))
    flagged
      .withColumn("session_idx",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("value_sum"))
  }

  val NanosPerDay: Long = 24L * NanosPerHour

  /** Cohort retention triangle — the standard product-analytics rollup:
    * users are cohorted by the UTC day of their first event, and cell
    * `(cohort_day, day_offset)` counts how many of them were active
    * `day_offset` days later.
    *
    * Scale shape: the raw event volume collapses FIRST into distinct
    * (user, day) pairs (partial-aggregable — map-side combine absorbs a
    * chatty user's millions of events); the per-user window that finds
    * the cohort day then runs over rows bounded by the observation range
    * in days, so no window partition can be hot; the final count is
    * another partial-aggregable groupBy. Day ids are `ts div 24h` over
    * the nanosecond timestamp, matching [[hourlyAgg]]'s convention.
    */
  def retention(events: DataFrame, maxOffsetDays: Int = 30): DataFrame = {
    val days = events
      .select(col("user_id"), expr(s"ts div ${NanosPerDay}L").as("day_id"))
      .distinct()
    val w = Window.partitionBy(col("user_id"))
    days
      .withColumn("cohort_day", min(col("day_id")).over(w))
      .select(col("cohort_day"),
        (col("day_id") - col("cohort_day")).as("day_offset"))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered-step funnel: for each user, the earliest time each step was
    * reached *after* the previous step, and the number of steps
    * completed in order. Built as a fold of conditional min-aggregations
    * (one groupBy on user_id per step, all joined on user_id —
    * broadcast-sized intermediate per step at any scale since it is one
    * row per user). Timestamps are µs (`ts div 1000`).
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val evs = events.select(col("user_id"),
      expr("ts div 1000").as("ts"), col("event_type"))
    // step 1: unconditional earliest occurrence
    var acc = evs.filter(col("event_type") === steps.head)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as(s"t_${steps.head}"))
    // step k: earliest occurrence strictly after step k-1
    steps.sliding(2).foreach {
      case Seq(prev, next) =>
        val nxt = evs.filter(col("event_type") === next)
          .join(acc.select(col("user_id"), col(s"t_$prev")), Seq("user_id"))
          .filter(col("ts") > col(s"t_$prev"))
          .groupBy(col("user_id"))
          .agg(min(col("ts")).as(s"t_$next"))
        acc = acc.join(nxt, Seq("user_id"), "left")
      case _ => ()
    }
    val reached = steps.zipWithIndex.map { case (st, i) =>
      when(col(s"t_$st").isNotNull, i + 1).otherwise(0)
    }.reduce((a, b) => greatest(a, b))
    acc.withColumn("steps_reached", reached)
  }

  /** Stateful streaming sessionization: the incremental form of
    * [[sessionize]] via `flatMapGroupsWithState`. State per user is just
    * (session start, last seen, count, sum); a session is emitted when
    * the gap to the next event exceeds `gapMicros` or the group times out.
    * State is bounded per key (O(1)), the canonical pattern for
    * unbounded-stream sessionization.
    */
  def streamingSessionize(
      spark: SparkSession,
      dir: String,
      gapMicros: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._

    def step(user: Long, evs: Iterator[Ev], state: GroupState[Sess]): Iterator[SessOut] = {
      val sorted = evs.toSeq.sortBy(_.ts)
      var cur = state.getOption
      val out = Seq.newBuilder[SessOut]
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts - s.end <= gapMicros =>
            cur = Some(Sess(s.start, e.ts, s.n + 1, s.sum + e.value))
          case Some(s) =>
            out += SessOut(user, s.start, s.end, s.n, s.sum)
            cur = Some(Sess(e.ts, e.ts, 1, e.value))
          case None =>
            cur = Some(Sess(e.ts, e.ts, 1, e.value))
        }
      }
      cur.foreach(state.update)
      out.result().iterator
    }

    eventStream(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("ts"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
      .toDF()
  }

  /** Per-user funnel state for [[streamingFunnel]]: earliest time each
    * ordered step was reached strictly after the previous one.
    */
  case class FunnelEv(user_id: Long, ts: Long, event_type: String)
  case class FunnelState(times: Seq[Option[Long]])
  case class FunnelOut(user_id: Long, steps_reached: Int, step_times: Seq[Long])

  /** Stateful streaming funnel: the incremental form of [[funnel]].
    * State per user is one Option[Long] per step (earliest in-order
    * completion time) — O(#steps) per key, updated as events arrive in
    * any batch pattern; each update emits the user's current funnel
    * progress (Update-mode semantics).
    *
    * Within a micro-batch events are processed in timestamp order;
    * across batches the monotone earliest-time update keeps the result
    * independent of batch boundaries for in-order arrivals (a
    * late-arriving earlier event can only improve a step time, and
    * downstream steps are re-derived from state on every update).
    */
  def streamingFunnel(
      spark: SparkSession,
      dir: String,
      steps: Seq[String]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    require(steps.nonEmpty)

    def step(user: Long, evs: Iterator[FunnelEv],
        state: GroupState[FunnelState]): Iterator[FunnelOut] = {
      val times = state.getOption
        .map(_.times.toArray)
        .getOrElse(Array.fill[Option[Long]](steps.size)(None))
      evs.toSeq.sortBy(_.ts).foreach { e =>
        val i = steps.indexOf(e.event_type)
        if (i >= 0) {
          val prevOk = i == 0 || times(i - 1).exists(_ < e.ts)
          if (prevOk && times(i).forall(_ > e.ts)) times(i) = Some(e.ts)
        }
      }
      state.update(FunnelState(times.toSeq))
      val reached = times.takeWhile(_.isDefined).size
      Iterator.single(
        FunnelOut(user, reached, times.take(reached).map(_.get).toSeq))
    }

    eventStream(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("ts"), col("event_type"))
      .as[FunnelEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(step)
      .toDF()
  }

  /** Per-user retention state for [[streamingRetention]]: cohort day,
    * the in-horizon active days, and a per-user emission sequence so a
    * sink can identify each user's LATEST emission (a late event can
    * move the cohort EARLIER, which re-indexes every offset — rows from
    * older emissions must be superseded wholesale, not merged).
    */
  case class RetEv(user_id: Long, day_id: Long)
  case class RetState(cohort: Long, days: Seq[Long], emitSeq: Long)
  case class RetOut(user_id: Long, emit_seq: Long, cohort_day: Long,
    day_offset: Long)

  /** Stateful streaming retention: the incremental form of [[retention]]
    * via `flatMapGroupsWithState`. State per user is the cohort day plus
    * the distinct active days within `maxOffsetDays` of it — O(horizon)
    * per key, the streaming analog of the batch shape's
    * distinct-(user, day) collapse. Each update emits the user's FULL
    * current (cohort_day, day_offset) set tagged with an emission
    * sequence (Update-mode semantics; the consumer keeps each user's
    * max-sequence rows and counts users per cell).
    *
    * Horizon discipline is monotone-safe: offsets are re-derived from
    * raw day ids on every update, and a late event can only move the
    * cohort EARLIER — which only increases offsets — so a day discarded
    * as beyond-horizon can never become in-horizon later.
    */
  def streamingRetention(
      spark: SparkSession,
      dir: String,
      maxOffsetDays: Int = 30): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._

    def step(user: Long, evs: Iterator[RetEv],
        state: GroupState[RetState]): Iterator[RetOut] = {
      val prev = state.getOption
      var cohort = prev.map(_.cohort).getOrElse(Long.MaxValue)
      val days = scala.collection.mutable.SortedSet.empty[Long]
      prev.foreach(p => days ++= p.days)
      evs.foreach { e =>
        if (e.day_id < cohort) cohort = e.day_id
        days += e.day_id
      }
      val kept = days.iterator.filter(d => d - cohort <= maxOffsetDays).toSeq
      val seq = prev.map(_.emitSeq + 1).getOrElse(0L)
      state.update(RetState(cohort, kept, seq))
      kept.iterator.map(d => RetOut(user, seq, cohort, d - cohort))
    }

    eventStream(spark, dir)
      .select(col("user_id"), expr(s"ts div ${NanosPerDay}L").as("day_id"))
      .as[RetEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(step)
      .toDF()
  }

  /** Sessionization via Spark's BUILT-IN `session_window` — the
    * idiomatic form next to [[streamingSessionize]]'s
    * `flatMapGroupsWithState`: the engine owns session merge, state,
    * and watermark eviction, so this variant gets Photon-class native
    * state handling for free where the custom-state form pays typed
    * (de)serialization per key per batch. A session's window is
    * [first event, last event + gap); a session is EMITTED (Append
    * mode) once the watermark passes its window end — sessions still
    * inside the watermark horizon at the end of an AvailableNow run
    * remain open, exactly like the custom-state twin's un-emitted
    * final states. The output re-derives `session_end` (= last event
    * ts) from the window end minus the gap, matching [[sessionize]]'s
    * µs fields.
    */
  def streamingSessionizeWindow(
      spark: SparkSession,
      dir: String,
      gapMicros: Long,
      delay: String = "30 minutes"): DataFrame = {
    eventStream(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", delay)
      .groupBy(
        // the interval carries the FULL micros value: "$g seconds" via
        // integer division would silently truncate sub-second gaps (a
        // 500ms gap became "0 seconds") while session_end still
        // subtracted the full gapMicros
        session_window(col("event_time"), s"$gapMicros microseconds"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start"),
        (unix_micros(col("session_window.end")) - lit(gapMicros))
          .as("session_end"),
        col("n_events"), col("value_sum"))
  }

  /** Structured Streaming form of [[hourlyAgg]]: parquet source →
    * event-time window + watermark → windowed counts. Late data beyond
    * the watermark is dropped; state is bounded by the watermark horizon.
    * Convert the nano longs to timestamps for event-time semantics.
    */
  def streamingHourlyAgg(spark: SparkSession, dir: String): DataFrame = {
    eventStream(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("value_sum"))
  }
}
