package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Det._

/** Event-time operators over the stored `events` stream — SURVEY.md §2.9.
  *
  * Batch-first: each operator is checked against the DuckDB oracle here;
  * the Structured Streaming twins (readStream + watermark + the same
  * window/session specs, mapGroupsWithState for the running state) live in
  * graft.streaming and are proven batch/stream-parity in StreamingSpec.
  *
  * Windows are epoch-aligned (Spark default), so window starts are pure
  * integer arithmetic on epoch seconds — reproduced literally in the
  * oracle SQL. All ts output as epoch seconds (ns/µs divide, §7.3).
  *
  * Scale: tumbling/sliding/session/dedup/stateful all shuffle once on
  * (window‑|user‑)keys — the standard streaming-agg shape. The watermark
  * mirror is the one deliberately sequential op (global arrival order is
  * its semantics); its streaming twin distributes naturally.
  */
object Events {

  /** ev_tumbling — 1-hour tumbling window: count + sum(value) per type. */
  val evTumbling: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), r4(sum("value")).as("sum_value"))
      .select(epochS(col("window.start")).as("win_s"), col("event_type"),
              col("n"), col("sum_value"))
      .orderBy("event_type", "win_s")

  /** ev_sliding — 1h window every 15m: every event lands in exactly 4
    * windows (grid-aligned), counts per window start. */
  val evSliding: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), r4(sum("value")).as("sum_value"))
      .select(epochS(col("window.start")).as("win_s"), col("n"), col("sum_value"))
      .orderBy("win_s")

  /** ev_session — 30-min-gap sessionization per user. Spark session_window
    * extends while ts < prev_max_ts + gap (half-open [start, end)); the
    * oracle's gaps-and-islands uses the same strict-< convention
    * (SessionParitySpec proves the boundary). */
  val evSession: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), r4(sum("value")).as("sum_value"))
      .select(col("user_id"), epochS(col("session_window.start")).as("sess_start"),
              col("n_events"), col("sum_value"))
      .orderBy("user_id", "sess_start")

  /** ev_dedup — first event per (user, type) by (ts, event_id); the
    * deterministic row_number=1 form of dropDuplicates. */
  val evDedup: Q = (s, d) => {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
              epochS(col("ts")).as("ts_s"))
      .orderBy("user_id", "event_type")
  }

  /** ev_cdc_apply — apply an event changelog as a latest-wins upsert and
    * derive the current entity snapshot (the SCD-1 / CDC-merge shape: a
    * MERGE INTO with ONLY the newest change per key surviving, plus
    * tombstone deletes): per user the last event under the (ts,
    * event_id) arrival order wins; a user whose LAST event is an
    * 'error' is a tombstoned entity and drops from the snapshot
    * entirely (an earlier error is superseded by the later state — the
    * standard changelog-compaction rule). n_events carries the
    * changelog depth per surviving key (how many changes compacted into
    * the one snapshot row — the amplification a CDC consumer plans
    * around).
    *
    * Scale shape: ONE shuffle on user_id serves both window functions
    * (same partition spec; the row_number adds the in-partition sort),
    * so the 100 TB changelog compaction is a single exchange + sort —
    * exactly the shape a MERGE materializes — and the snapshot never
    * exists as a second copy before the rn = 1 filter. Determinism: the
    * (ts desc, event_id desc) order is strict (event_id unique), counts
    * are exact longs, and the one double in the output is r4'd. */
  val evCdcApply: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_events", count(lit(1)).over(Window.partitionBy("user_id")))
      .where(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), epochS(col("ts")).as("last_ts_s"),
        col("event_type").as("last_type"), r4(col("value")).as("last_value"),
        col("n_events"))
      .orderBy("user_id")
  }

  /** ev_late_watermark — batch mirror of a 10-minute watermark: arrival
    * order = event_id; a row is late (dropped) if its ts is more than 10
    * minutes behind the max event-time seen so far. Deliberately a global
    * ordered window: arrival order IS the semantics (the distributed
    * streaming twin is graft.streaming.EventStreams.withLateDrop). */
  val evLateWatermark: Q = (s, d) => {
    val w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("wm", max("ts").over(w) - expr("INTERVAL 10 MINUTES"))
      .where(col("wm").isNull || col("ts") >= col("wm"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_kept"), r4(sum("value")).as("sum_value"))
      .orderBy("event_type")
  }

  /** ev_stateful — running per-user state at each event: purchases so far
    * and cumulative value (batch twin of mapGroupsWithState). */
  val evStateful: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(
        col("event_id"), col("user_id"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(w).as("n_purch"),
        r4(sum("value").over(w)).as("cum_value"))
      .orderBy("event_id")
  }

  /** ev_funnel — ordered conversion funnel per user: first view, first
    * click strictly after that view, first purchase strictly after that
    * click. Timestamps compared at µs precision on both engines (Spark
    * reads the ns fixture as µs; the oracle casts TIMESTAMP_NS →
    * TIMESTAMP), output as epoch seconds. Scale shape: three shuffles on
    * user_id, each stage pruned by the previous one's survivors — the
    * standard product-analytics funnel as relational algebra, no
    * per-user event-log replay. */
  val evFunnel: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    // materialize each stage once: v is referenced by c AND the final
    // join, c by p AND the final join — without the cut each reference
    // re-runs its filtered scan of events (6 scans instead of 3 at scale)
    val v = graft.ops.Lineage.cut(
      e.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("tv")))
    val c = graft.ops.Lineage.cut(
      e.where(col("event_type") === "click").join(v, "user_id")
        .where(col("ts") > col("tv"))
        .groupBy("user_id").agg(min("ts").as("tc")))
    val p = e.where(col("event_type") === "purchase").join(c, "user_id")
      .where(col("ts") > col("tc"))
      .groupBy("user_id").agg(min("ts").as("tp"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        epochS(col("tv")).as("view_s"),
        epochS(col("tc")).as("click_s"),
        epochS(col("tp")).as("purchase_s"),
        col("tp").isNotNull.cast("int").as("converted"))
      .orderBy("user_id")
  }

  /** ev_retention — day-grain cohort retention: users grouped by the day
    * of their first event; distinct active users per (cohort, day
    * offset ≤ 7). Two shuffles (first-day per user, then cohort×offset
    * agg) — the standard warehouse retention query, fully relational. */
  val evRetention: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("user_id"), to_date(col("ts")).as("day"))
    val first = e.groupBy("user_id").agg(min("day").as("cohort"))
    e.join(first, "user_id")
      .withColumn("offset", datediff(col("day"), col("cohort")).cast("long"))
      .where(col("offset") <= 7)
      .groupBy("cohort", "offset")
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort", "offset")
  }

  /** ev_cohort_ltv — the value analogue of ev_retention: per signup
    * cohort (first-seen day) and day offset ≤ 7, the purchase revenue
    * earned that day, the cohort's CUMULATIVE revenue through the
    * offset, and LTV per cohort user — the growth-analytics curve every
    * subscription/commerce report draws. Scale: two bounded aggs
    * (cohort assignment + per-(cohort, offset) revenue) and the running
    * sum over the AGGREGATED ≤8-rows-per-cohort frame (a per-cohort
    * 8-row window, not an all-events window); day_value is r4-rounded
    * BEFORE the cumulative sum so both engines accumulate identical
    * summands. Offsets with zero purchases produce no row (the report
    * is over observed revenue days; cum_value still carries across the
    * gap). */
  val evCohortLtv: Q = (s, d) => {
    val e = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type"), col("value"))
    val first = e.groupBy("user_id").agg(min("day").as("cohort"))
    val sz = first.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
    val rev = e.join(first, "user_id")
      .withColumn("offset", datediff(col("day"), col("cohort")).cast("long"))
      .where(col("offset") <= 7 && col("event_type") === "purchase")
      .groupBy("cohort", "offset")
      .agg(r4(sum("value")).as("day_value"))
    val wc = Window.partitionBy("cohort").orderBy("offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.withColumn("cum_value", r4(sum("day_value").over(wc)))
      .join(sz, "cohort")
      .select(col("cohort"), col("offset"), col("day_value"), col("cum_value"),
        col("cohort_users"),
        r4(col("cum_value") / col("cohort_users")).as("ltv_per_user"))
      .orderBy("cohort", "offset")
  }

  /** ev_user_path — top-20 event-type trigrams across per-user ordered
    * event sequences (ties broken by event_id; counts desc, then path).
    * The sequence-mining shape: lead windows per user, then a global
    * top-k via TakeOrderedAndProject — no per-user collect. */
  val evUserPath: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t1", lead("event_type", 1).over(w))
      .withColumn("t2", lead("event_type", 2).over(w))
      .where(col("t2").isNotNull)
      .groupBy(col("event_type").as("e0"), col("t1").as("e1"), col("t2").as("e2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e0"), col("e1"), col("e2"))
      .limit(20)
  }

  /** ev_markov — the first-order behavioral transition matrix: for every
    * (previous event type → event type) adjacency in per-user ordered
    * sequences, the transition count and row-normalized probability —
    * the Markov-chain model ev_user_path's top-k trigrams sample from,
    * materialized in full (|types|² rows, bounded by the type domain,
    * not the corpus). The session-modeling / next-event-prediction
    * baseline every behavioral pipeline starts with.
    *
    * Scale shape: one user_id window (the same single-exchange lag
    * shape as ev_user_path), one map-side-combined count agg down to
    * the |types|² frame, then the per-source normalizer is a bounded
    * agg broadcast back. p = n/tot is a single IEEE division of two
    * exact longs — engine-deterministic before the r4 grain. */
  val evMarkov: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // cut: the |types|² count frame feeds both the normalizer agg and
    // the scoring join — without it each reference re-runs the full
    // events scan + window (the ev_anomaly precedent)
    val counts = graft.ops.Lineage.cut(Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n")))
    val totals = counts.groupBy("prev_type").agg(sum("n").as("tot"))
    counts.join(broadcast(totals), "prev_type")
      .select(col("prev_type"), col("event_type"), col("n"),
        r4(col("n") * lit(1.0) / col("tot")).as("p"))
      .orderBy("prev_type", "event_type")
  }

  /** ev_gap_fill — calendar densification: the per-(event type, day)
    * activity series with MISSING days materialized (n = 0), the
    * carried-forward last active day's volume, and the gap flag — the
    * time-series regularization every downstream window/forecast op
    * assumes (a raw groupBy emits no row for a silent day, so a 7-day
    * moving average silently spans gaps; the dense grid is the fix).
    *
    * Scale shape: ONE corpus-sized scan (the daily groupBy, map-side
    * combined, |types|×|days| rows out); the calendar span, the type
    * roster, and the dense grid all derive from that bounded frame —
    * the cross join is bounded×bounded by construction (sequence() over
    * the global [min, max] day span × distinct types), never
    * corpus-sized, and the left join back is grid-sized. Forward fill
    * is one window over the grid, partitioned by type — day is unique
    * per type, so the default RANGE frame is deterministic. Types that
    * begin after the global start carry 0 until first activity
    * (documented convention; the oracle mirrors the coalesce). */
  /** Shared densification core for ev_gap_fill / ev_forecast_sn: the
    * per-(type, day) daily counts over the DENSE global calendar, with
    * `n` left NULLABLE (null = silent day) so each consumer picks its
    * own gap convention. One corpus-sized scan (the daily aggregate,
    * Lineage.cut); span, type roster and the grid all derive from that
    * bounded frame — the cross join is bounded×bounded. */
  private def denseDaily(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame = {
    val daily = graft.ops.Lineage.cut(Tables.events(s, d)
      .select(col("event_type"), col("ts").cast("date").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n")))
    val days = daily.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    daily.select("event_type").distinct()
      .crossJoin(broadcast(days))
      .join(daily, Seq("event_type", "day"), "left")
  }

  val evGapFill: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("day")
    denseDaily(s, d)
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(last(col("n"), ignoreNulls = true).over(w), lit(0L))
          .as("last_seen_n"),
        col("n").isNull.as("is_gap"))
      .orderBy("event_type", "day")
  }

  /** ev_forecast_sn — the seasonal-naive forecast baseline + its error
    * census: predict each (type, day) count with the count 7 days
    * earlier and report per-type MAE and mean bias — the benchmark
    * every real forecasting model must beat, and the first thing a
    * volume-monitoring pipeline computes. Composes ev_gap_fill's dense
    * grid semantics inline (a lag-7 over a SPARSE daily frame would
    * silently skip silent days and compare wrong weekdays — exactly
    * the bug the densification exists to prevent).
    *
    * Scale shape: identical to ev_gap_fill — one corpus scan to the
    * cut daily frame, bounded grid, then ONE type-partitioned window
    * (lag 7 over the grid) and a bounded per-type agg. Errors are
    * |long − long| exact integers; MAE/bias r4 a single exact-int
    * ratio. */
  val evForecastSn: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("day")
    denseDaily(s, d)
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"))
      .withColumn("pred", lag("n", 7).over(w))
      .where(col("pred").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
           r4(sum(abs(col("n") - col("pred"))) / count(lit(1))).as("mae"),
           r4(sum(col("n") - col("pred")) / count(lit(1))).as("bias"))
      .orderBy("event_type")
  }

  /** ev_anomaly — hourly volume anomalies per event type: z-score of
    * each hour's event count against that type's own hourly mean/stddev,
    * hours with |z| ≥ 2 flagged. The ops-monitoring shape of an event
    * pipeline (spike/drop detection) as pure relational algebra: one
    * (type, hour) count agg, one tiny per-type stats agg broadcast back —
    * no per-event window, shuffle width = types × hours, never rows.
    * z is r4-rounded BEFORE thresholding so both engines flag the same
    * boundary hours; a type with < 2 hours (sd NULL) or constant counts
    * (sd = 0) defines z = 0 rather than inherit either engine's x/0. */
  val evAnomaly: Q = (s, d) => {
    // cut: the hourly frame (types × hours rows, tiny) feeds both the
    // stats agg and the scoring join — without it each reference re-scans
    // the full events table (the expensive subtree at scale)
    val hourly = graft.ops.Lineage.cut(Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), epochS(col("window.start")).as("win_s"), col("n")))
    val stats = hourly.groupBy("event_type")
      .agg(avg("n").as("mu"), stddev_samp(col("n")).as("sd"))
    hourly.join(broadcast(stats), "event_type")
      .withColumn("z",
        when(col("sd").isNull || col("sd") === 0, lit(0.0))
          .otherwise(r4((col("n") - col("mu")) / col("sd"))))
      .where(abs(col("z")) >= 2.0)
      .select(col("event_type"), col("win_s"), col("n"), col("z"))
      .orderBy("event_type", "win_s")
  }

  /** ev_inter_arrival — per-type inter-arrival-gap profile (the event-
    * pipeline health check beside ev_anomaly's volume z-scores: a rising
    * p90 gap means a stalling producer even while hourly counts look
    * fine). One lag window partitioned by event_type (partition width =
    * rows/type, never the whole stream) + one bounded agg (rows = types).
    * Cross-engine determinism: gaps are computed on EPOCH-SECOND
    * truncated timestamps — `events.ts` is ns in the fixture and Spark
    * reads µs, so sub-second gap math would diverge; truncation is
    * monotone, so each engine's own ts sort yields the same per-type
    * multiset of second-granularity gaps regardless of intra-second
    * order, and avg/percentile/max over a multiset are order-free.
    * avg_gap is an exact integer-sum division; percentiles interpolate
    * over sorted integers (identical both engines, r4 for the division
    * ulps). */
  val evInterArrival: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("event_type"), col("ts"), col("event_id"))
      .withColumn("es", epochS(col("ts")))
      .withColumn("gap", col("es") - lag("es", 1).over(w))
      .where(col("gap").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
           r4(sum("gap") / count(lit(1))).as("avg_gap"),
           r4(expr("percentile(gap, 0.5)")).as("p50_gap"),
           r4(expr("percentile(gap, 0.9)")).as("p90_gap"),
           max("gap").as("max_gap"))
      .orderBy("event_type")
  }

  /** ev_active_users — daily actives + trailing-7-day actives per
    * observed day (DAU / WAU and their ratio, the stickiness report
    * every product pipeline publishes). Relational rolling-distinct:
    * the distinct (user, day) frame is computed ONCE, then each active
    * user-day covers the seven report days [day, day+6] via a bounded
    * explode — WAU of a day = distinct covering users. The 7× fan-out
    * runs on the already-distinct user-DAY frame (users × days rows),
    * never on raw events, and the inner join back to DAU keeps only
    * observed days. A per-day distinct-over-range window would instead
    * drag every event into one range frame per day — this shape is the
    * one that survives a year of events at 100 TB. */
  val evActiveUsers: Q = (s, d) => {
    // cut: the distinct user-day frame feeds DAU, the coverage fan-out
    // and (via the join) the observed-day restriction — one distinct
    // shuffle instead of three
    val ud = graft.ops.Lineage.cut(
      Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct())
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .withColumn("asof", explode(expr("sequence(day, date_add(day, 6))")))
      .groupBy(col("asof").as("day")).agg(countDistinct("user_id").as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        r4(col("dau") * lit(1.0) / col("wau")).as("stickiness"))
      .orderBy("day")
  }

  /** ev_attribution — last-touch attribution: every purchase is credited
    * to the user's most recent PRECEDING non-purchase event (the
    * marketing-analytics standard; first-touch is the symmetric
    * first-value). One per-user window with a conditional
    * last(..., ignoreNulls) over the preceding frame — no self-join, no
    * per-user collect; partition width = events/user. Purchases with no
    * preceding touch credit '<none>' (the direct bucket), so the report
    * always partitions all purchases. Report: purchases and value per
    * crediting event type. */
  val evAttribution: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true)
          .over(w))
      .where(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("<none>")).as("touch"))
      .agg(count(lit(1)).as("n_purchases"), r4(sum("value")).as("sum_value"))
      .orderBy("touch")
  }

  /** ev_interval_join — per-user event-time interval join: every
    * purchase joined to the SAME user's clicks in the preceding 10
    * minutes (strictly before the purchase instant; window-closed at
    * -10 min inclusive). The batch form of a stream-stream interval
    * join — Structured Streaming runs the identical predicate with
    * watermarks bounding both buffers (streaming/EventStreams twin).
    * Plan shape: equi-join on user_id (SMJ, both sides shuffled once on
    * the key) with the time predicate as a join filter — per-user
    * bounded work, never a time-cross-product; the left join keeps
    * zero-click purchases (direct conversions) in the report. */
  val evIntervalJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("pts"),
        col("value").as("purchase_value"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("value").as("cval"))
    p.join(c, p("user_id") === c("user_id") &&
        col("cts") < col("pts") &&
        col("cts") >= col("pts") - expr("INTERVAL 10 MINUTES"), "left")
      .groupBy(col("event_id"), p("user_id").as("user_id"), col("pts"),
        col("purchase_value"))
      .agg(count(col("cts")).as("n_clicks"),
        r4(coalesce(sum("cval"), lit(0.0))).as("click_value"))
      .select(col("event_id"), col("user_id"), col("pts"),
        r4(col("purchase_value")).as("purchase_value"),
        col("n_clicks"), col("click_value"))
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "ev_interval_join"  -> evIntervalJoin,
    "ev_attribution"    -> evAttribution,
    "ev_active_users"   -> evActiveUsers,
    "ev_inter_arrival"  -> evInterArrival,
    "ev_retention"      -> evRetention,
    "ev_cohort_ltv"     -> evCohortLtv,
    "ev_anomaly"        -> evAnomaly,
    "ev_user_path"      -> evUserPath,
    "ev_markov"         -> evMarkov,
    "ev_gap_fill"       -> evGapFill,
    "ev_forecast_sn"    -> evForecastSn,
    "ev_tumbling"       -> evTumbling,
    "ev_sliding"        -> evSliding,
    "ev_session"        -> evSession,
    "ev_dedup"          -> evDedup,
    "ev_cdc_apply"      -> evCdcApply,
    "ev_late_watermark" -> evLateWatermark,
    "ev_stateful"       -> evStateful,
    "ev_funnel"         -> evFunnel,
  )

  val oracle: Map[String, String] = Map(
    "ev_interval_join" ->
      s"""SELECT p.event_id, p.user_id, p.ts AS pts,
        | ${r4Sql("p.value")} AS purchase_value,
        | count(c.ts) AS n_clicks,
        | ${r4Sql("coalesce(sum(c.value), 0)")} AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        | ON c.user_id = p.user_id
        | AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 10 MINUTE
        |GROUP BY p.event_id, p.user_id, p.ts, p.value
        |ORDER BY p.event_id""".stripMargin,
    "ev_attribution" ->
      s"""WITH t AS (
        | SELECT event_type, value,
        |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        | FROM events)
        |SELECT coalesce(touch, '<none>') AS touch, count(*) AS n_purchases,
        | ${r4Sql("sum(value)")} AS sum_value
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_active_users" ->
      s"""WITH ud AS (
        | SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
        |cov AS (
        | SELECT user_id,
        |  CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
        |    CAST(day + 6 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        | FROM ud),
        |wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM cov GROUP BY day)
        |SELECT d.day, d.dau, w.wau, ${r4Sql("d.dau * 1.0 / w.wau")} AS stickiness
        |FROM dau d JOIN wau w ON w.day = d.day ORDER BY d.day""".stripMargin,
    "ev_tumbling" ->
      s"""SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS win_s, event_type,
        | count(*) AS n, ${r4Sql("sum(value)")} AS sum_value
        |FROM events GROUP BY win_s, event_type
        |ORDER BY event_type, win_s""".stripMargin,
    "ev_sliding" ->
      s"""SELECT win_s, count(*) AS n, ${r4Sql("sum(value)")} AS sum_value FROM (
        | SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900 - 900 * k AS win_s, value
        | FROM events, (VALUES (0),(1),(2),(3)) t(k))
        |GROUP BY win_s ORDER BY win_s""".stripMargin,
    "ev_session" ->
      s"""WITH marked AS (
        | SELECT user_id, ts, event_id, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS new_sess
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        | SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM marked)
        |SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
        | count(*) AS n_events, ${r4Sql("sum(value)")} AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, sess_start""".stripMargin,
    "ev_dedup" ->
      """SELECT user_id, event_type, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts, event_id) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "ev_cdc_apply" ->
      s"""SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS last_ts_s,
        | event_type AS last_type, ${r4Sql("value")} AS last_value, n_events
        |FROM (SELECT *,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n_events FROM events)
        |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,
    "ev_late_watermark" ->
      s"""SELECT event_type, count(*) AS n_kept, ${r4Sql("sum(value)")} AS sum_value
        |FROM (SELECT *, max(ts) OVER (ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx FROM events)
        |WHERE mx IS NULL OR ts >= mx - INTERVAL 10 MINUTE
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ev_stateful" ->
      s"""SELECT event_id, user_id,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER w AS BIGINT) AS n_purch,
        | ${r4Sql("sum(value) OVER w")} AS cum_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "ev_retention" ->
      """WITH e AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |first AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY user_id)
        |SELECT f.cohort, CAST(date_diff('day', f.cohort, e.day) AS BIGINT) AS "offset",
        | count(DISTINCT e.user_id) AS n_active
        |FROM e JOIN first f ON e.user_id = f.user_id
        |WHERE date_diff('day', f.cohort, e.day) <= 7
        |GROUP BY f.cohort, "offset" ORDER BY f.cohort, "offset" """.stripMargin,
    "ev_cohort_ltv" ->
      s"""WITH e AS (
        | SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type, value
        | FROM events),
        |first AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY user_id),
        |sz AS (SELECT cohort, count(*) AS cohort_users FROM first GROUP BY cohort),
        |rev AS (
        | SELECT f.cohort, CAST(date_diff('day', f.cohort, e.day) AS BIGINT) AS "offset",
        |  ${r4Sql("sum(e.value)")} AS day_value
        | FROM e JOIN first f ON e.user_id = f.user_id
        | WHERE date_diff('day', f.cohort, e.day) <= 7 AND e.event_type = 'purchase'
        | GROUP BY f.cohort, "offset"),
        |cum AS (
        | SELECT cohort, "offset", day_value,
        |  ${r4Sql("sum(day_value) OVER (PARTITION BY cohort ORDER BY \"offset\" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS cum_value
        | FROM rev)
        |SELECT cum.cohort, cum."offset", cum.day_value, cum.cum_value,
        | sz.cohort_users, ${r4Sql("cum.cum_value / sz.cohort_users")} AS ltv_per_user
        |FROM cum JOIN sz ON sz.cohort = cum.cohort
        |ORDER BY cum.cohort, cum."offset" """.stripMargin,
    "ev_user_path" ->
      """SELECT e0, e1, e2, n FROM (
        | SELECT event_type AS e0, t1 AS e1, t2 AS e2, count(*) AS n FROM (
        |  SELECT event_type,
        |   lead(event_type, 1) OVER w AS t1,
        |   lead(event_type, 2) OVER w AS t2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id))
        | WHERE t2 IS NOT NULL GROUP BY e0, e1, e2)
        |ORDER BY n DESC, e0, e1, e2 LIMIT 20""".stripMargin,
    "ev_markov" ->
      s"""WITH adj AS (
        | SELECT prev_type, event_type, count(*) AS n FROM (
        |  SELECT event_type,
        |   lag(event_type, 1) OVER
        |    (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
        |  FROM events)
        | WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type),
        |tot AS (SELECT prev_type, sum(n) AS tot FROM adj GROUP BY prev_type)
        |SELECT prev_type, event_type, n,
        | ${r4Sql("n * 1.0 / tot")} AS p
        |FROM adj JOIN tot USING (prev_type)
        |ORDER BY prev_type, event_type""".stripMargin,
    "ev_forecast_sn" ->
      s"""WITH daily AS (
        | SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        | FROM events GROUP BY 1, 2),
        |days AS (
        | SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        | FROM (SELECT min(day) AS d0, max(day) AS d1 FROM daily)),
        |grid AS (
        | SELECT t.event_type, days.day, coalesce(n, 0) AS n
        | FROM (SELECT DISTINCT event_type FROM daily) t
        | CROSS JOIN days
        | LEFT JOIN daily d ON t.event_type = d.event_type AND days.day = d.day),
        |p AS (
        | SELECT event_type, n,
        |  lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS pred
        | FROM grid)
        |SELECT event_type, count(*) AS n_days,
        | ${r4Sql("sum(abs(n - pred)) / count(*)")} AS mae,
        | ${r4Sql("sum(n - pred) / count(*)")} AS bias
        |FROM p WHERE pred IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ev_gap_fill" ->
      """WITH daily AS (
        | SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        | FROM events GROUP BY 1, 2),
        |days AS (
        | SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        | FROM (SELECT min(day) AS d0, max(day) AS d1 FROM daily)),
        |grid AS (
        | SELECT t.event_type, days.day
        | FROM (SELECT DISTINCT event_type FROM daily) t, days)
        |SELECT g.event_type, g.day,
        | coalesce(n, 0) AS n,
        | coalesce(last_value(n IGNORE NULLS)
        |   OVER (PARTITION BY g.event_type ORDER BY g.day), 0) AS last_seen_n,
        | (n IS NULL) AS is_gap
        |FROM grid g LEFT JOIN daily d
        |  ON g.event_type = d.event_type AND g.day = d.day
        |ORDER BY g.event_type, g.day""".stripMargin,
    "ev_inter_arrival" ->
      s"""WITH g AS (
        | SELECT event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT)
        |   - lag(CAST(floor(epoch(ts)) AS BIGINT))
        |     OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap
        | FROM events)
        |SELECT event_type, count(*) AS n_gaps,
        | ${r4Sql("sum(gap) * 1.0 / count(*)")} AS avg_gap,
        | ${r4Sql("percentile_cont(0.5) WITHIN GROUP (ORDER BY gap)")} AS p50_gap,
        | ${r4Sql("percentile_cont(0.9) WITHIN GROUP (ORDER BY gap)")} AS p90_gap,
        | max(gap) AS max_gap
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ev_anomaly" ->
      s"""WITH hourly AS (
        | SELECT event_type, (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS win_s,
        |  count(*) AS n
        | FROM events GROUP BY 1, 2),
        |stats AS (
        | SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd FROM hourly GROUP BY 1)
        |SELECT event_type, win_s, n, z FROM (
        | SELECT h.event_type, h.win_s, h.n,
        |  CASE WHEN s.sd IS NULL OR s.sd = 0 THEN 0.0
        |   ELSE ${r4Sql("(h.n - s.mu) / s.sd")} END AS z
        | FROM hourly h JOIN stats s ON h.event_type = s.event_type)
        |WHERE abs(z) >= 2.0
        |ORDER BY event_type, win_s""".stripMargin,
    "ev_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events),
        |v AS (SELECT user_id, min(t) AS tv FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.t) AS tc FROM e JOIN v ON e.user_id = v.user_id
        |       AND e.t > v.tv WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.t) AS tp FROM e JOIN c ON e.user_id = c.user_id
        |       AND e.t > c.tc WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT v.user_id, CAST(floor(epoch(v.tv)) AS BIGINT) AS view_s,
        | CAST(floor(epoch(c.tc)) AS BIGINT) AS click_s,
        | CAST(floor(epoch(p.tp)) AS BIGINT) AS purchase_s,
        | CAST(p.tp IS NOT NULL AS INT) AS converted
        |FROM v LEFT JOIN c ON c.user_id = v.user_id LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id""".stripMargin,
  )
}
