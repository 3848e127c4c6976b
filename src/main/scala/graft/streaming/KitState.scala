package graft.streaming

import org.apache.spark.sql.{Dataset, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-kit streaming state machine — the Spark shape of the reference's
  * KitCache (lib/MyMQTTclient.py:606-934) plus the three stateful checks
  * that ride on it:
  *
  *   - throttle (A13): running mean interval `(i·n + Δ)/(n+1)` capped at
  *     30 min; drop telegrams while the estimated interval is below the
  *     configured rate (reference MyDatacollector.py:937-968, rate 480 s
  *     at :208), auto-reset after 4 h of throttling.
  *   - static-value detection (P4): consecutive identical values counted
  *     per kit; flagged past the threshold (FluctCheck,
  *     MyDatacollector.py:813-843, default 40 — configurable here).
  *   - geofence (J8): first location becomes home; a location differing
  *     in the first `geoPrefix` geohash chars (≈ the reference's 118 m
  *     radius, MyDatacollector.py:1095-1204) flips the kit to "moved".
  *
  * Scale notes: state is one small case class per kit key, managed by the
  * state store (RocksDB-backed on a cluster) — thousands of kits cost KBs
  * per executor. Events are sorted by ts inside each group invocation, so
  * within-batch disorder is tolerated; cross-batch late data follows
  * watermark policy upstream.
  */
object KitState {

  case class KitEvent(kit: String, ts: Long, value: Double, geohash: String)

  case class State(count: Long, lastSeen: Long, intervalEst: Double,
                   throttledSince: Long, staticRun: Int, lastValue: Double,
                   home: String, moved: Boolean)

  case class Output(kit: String, ts: Long, value: Double, accepted: Boolean,
                    reason: String, intervalEst: Double, staticRun: Int,
                    moved: Boolean)

  val DefaultRateS = 480L       // MyDatacollector.py:208 (8*60)
  val IntervalCapS = 1800.0     // :950-952 cap 30 min
  val ThrottleResetS = 4 * 3600L // :960-962
  val StaticThreshold = 5       // FluctCheck dflt 40; tests use lower

  def update(rateS: Long, staticThreshold: Int, geoPrefix: Int, ttlMs: Long)(
      kit: String, events: Iterator[KitEvent],
      state: GroupState[State]): Iterator[Output] = {
    // KitCache TTL (lib/MyMQTTclient.py:608, ReDoCache 24 h): expired
    // state is dropped, the next telegram re-registers the kit.
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var st = state.getOption.getOrElse(
      State(0L, 0L, 0.0, 0L, 0, Double.NaN, "", moved = false))
    val out = events.toSeq.sortBy(e => (e.ts, e.value)).map { e =>
      // --- interval estimate + throttle (A13)
      var accepted = true
      var reason = "ok"
      if (st.count > 0) {
        val dt = (e.ts - st.lastSeen).toDouble
        val est = math.min(
          (st.intervalEst * st.count + dt) / (st.count + 1), IntervalCapS)
        st = st.copy(intervalEst = est)
        if (est < rateS) {
          if (st.throttledSince == 0L) st = st.copy(throttledSince = e.ts)
          else if (e.ts - st.throttledSince > ThrottleResetS)
            st = st.copy(throttledSince = 0L, intervalEst = rateS.toDouble)
          if (st.throttledSince != 0L) { accepted = false; reason = "throttle" }
        } else st = st.copy(throttledSince = 0L)
      }
      // --- static-value run (P4)
      val run = if (e.value == st.lastValue) st.staticRun + 1 else 1
      st = st.copy(staticRun = run, lastValue = e.value)
      if (accepted && run >= staticThreshold) { accepted = false; reason = "static" }
      // --- geofence (J8)
      if (st.home.isEmpty) st = st.copy(home = e.geohash)
      else if (e.geohash.take(geoPrefix) != st.home.take(geoPrefix) && !st.moved)
        st = st.copy(moved = true)
      st = st.copy(count = st.count + 1, lastSeen = e.ts)
      Output(kit, e.ts, e.value, accepted, reason, st.intervalEst,
        st.staticRun, st.moved)
    }
    state.update(st)
    if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
    out.iterator
  }

  /** Wire the state machine onto a keyed stream (works identically for a
    * batch Dataset grouped the same way — used for batch/stream parity
    * testing). */
  def apply(grouped: KeyValueGroupedDataset[String, KitEvent],
            rateS: Long = DefaultRateS,
            staticThreshold: Int = StaticThreshold,
            geoPrefix: Int = 6,
            ttlMs: Long = 0L): Dataset[Output] = {
    implicit val stEnc: org.apache.spark.sql.Encoder[State] =
      org.apache.spark.sql.Encoders.product[State]
    implicit val outEnc: org.apache.spark.sql.Encoder[Output] =
      org.apache.spark.sql.Encoders.product[Output]
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    grouped.flatMapGroupsWithState(OutputMode.Append(), timeout)(
      update(rateS, staticThreshold, geoPrefix, ttlMs))
  }
}
