package graft.ops

import graft.core.{Num, QueryDef, Tables, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Ordered-window time-series operators over the `events` stream table.
  *
  * The reference's time-series post-processing is pandas-side (month-over-
  * month inspection and series plots in
  * /root/reference/notebooks/validation_northern_capitals.ipynb cells 3-5,
  * fed by the per-month frames built in
  * scripts/process_climate_amazon_monthly.py:443-478); a user of the engine
  * needs the same analytics as distributed operators. Each query here is a
  * per-key Catalyst window — `Window.partitionBy(key).orderBy(...)` — so the
  * work distributes across executors by key and no global ordered window
  * exists anywhere (a global window would serialize 100 TB through one
  * task).
  *
  * Cross-engine determinism rules (see graft.core.Num):
  *  - every window ORDER BY ends in the unique `event_id` tiebreak
  *    ((user_id, ts) ties would otherwise make lag/row_number ambiguous);
  *  - windowed sums accumulate DECIMAL(18,2), never DOUBLE — Spark's frame
  *    walk and DuckDB's segment-tree evaluation sum in different orders,
  *    which is only safe when the accumulation is exact;
  *  - frames are explicit ROWS (DuckDB's default with ORDER BY is RANGE).
  */
object Windows {
  private val Dec = DecimalType(18, 2)

  /** Per-key ordered delta: value minus previous value in the key's
    * timeline (`lag`). The month-over-month change a climate analyst reads
    * off the monthly series. One shuffle on user_id, sort within partitions.
    */
  val lagDelta: QueryDef = QueryDef(
    "lag_delta",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("delta", col("value") - col("prev_value"))
        .select(col("event_id"), col("user_id"), col("value"),
          col("prev_value"), col("delta"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, value,
             lag(value) OVER w AS prev_value,
             value - lag(value) OVER w AS delta
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id
    """),
    doc = "lag(1) per-key delta; first row of each key NULL")

  /** 3-month rolling mean of the per-type monthly sums. Two stages: the
    * usual partial+final monthly agg (exact decimal sums), then a tiny
    * per-type ROWS [-2, 0] window over the monthly series — the window input
    * is months × types, already reduced, so the sort is negligible at any
    * scale. Rolling mean = exact windowed decimal sum / frame row count,
    * rounded with the midpoint-free floor form (Num.avg2 rationale).
    */
  val rollingAvg: QueryDef = QueryDef(
    "rolling_avg",
    (s, d) => {
      val monthly = Tables.events(s, d)
        .groupBy(col("event_type"),
          year(col("ts")).cast("int").as("yr"),
          month(col("ts")).cast("int").as("mo"))
        .agg(sum(col("value").cast(Dec)).as("dsum"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("yr"), col("mo")).rowsBetween(-2, 0)
      monthly
        .withColumn("msum", col("dsum").cast(DoubleType))
        .withColumn("roll_avg",
          floor(sum(col("dsum")).over(w).cast(DoubleType) * lit(100.0)
            / count(lit(1)).over(w) + lit(0.5)) / lit(100.0))
        .select(col("event_type"), col("yr"), col("mo"), col("msum"), col("roll_avg"))
        .orderBy(col("event_type"), col("yr"), col("mo"))
    },
    Some("""
      WITH m AS (
        SELECT event_type, CAST(year(ts) AS INTEGER) AS yr,
               CAST(month(ts) AS INTEGER) AS mo,
               sum(CAST(value AS DECIMAL(18,2))) AS dsum
        FROM events GROUP BY 1, 2, 3)
      SELECT event_type, yr, mo, CAST(dsum AS DOUBLE) AS msum,
             floor(CAST(sum(dsum) OVER w AS DOUBLE) * 100.0
                   / (count(*) OVER w) + 0.5) / 100.0 AS roll_avg
      FROM m
      WINDOW w AS (PARTITION BY event_type ORDER BY yr, mo
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY event_type, yr, mo
    """),
    doc = "3-month rolling mean over the monthly series (agg first, window after)")

  /** Per-key running total (cumulative sum) — cumulative rainfall/degree-day
    * style. Exact decimal accumulation under a ROWS UNBOUNDED PRECEDING
    * frame; distributes by user_id.
    */
  val runningTotal: QueryDef = QueryDef(
    "running_total",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("cum_value", sum(col("value").cast(Dec)).over(w).cast(DoubleType))
        .select(col("event_id"), col("user_id"), col("value"), col("cum_value"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, value,
             CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS cum_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY event_id
    """),
    doc = "per-key cumulative sum, exact decimal accumulation")

  /** Top-3 rows by value within each group via row_number (deterministic
    * tiebreak on event_id). At 100 TB with few groups, Catalyst plans this
    * as a rank-limit window (AQE inserts a per-partition top-k before the
    * shuffle when it can prove the filter bound — the classic
    * partial-then-final top-k); with high-cardinality keys the window
    * distributes by key as usual.
    */
  val topkPerGroup: QueryDef = QueryDef(
    "topk_per_group",
    (s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("event_type"), col("rk"), col("event_id"), col("value"))
        .orderBy(col("event_type"), col("rk"))
    },
    Some("""
      SELECT event_type, CAST(rk AS INTEGER) AS rk, event_id, value FROM (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value DESC, event_id ASC) AS rk
        FROM events) WHERE rk <= 3
      ORDER BY event_type, rk
    """),
    doc = "top-3 per group, row_number rank-limit")

  /** Z-score anomaly detection: flag events more than 3 sample standard
    * deviations from their group mean. Deliberately NOT a window: the
    * per-group moments (n, Σx, Σx²) are a tiny partial+final agg, broadcast
    * back onto the fact — the two-pass form that scales regardless of group
    * cardinality (a whole-partition window over 5 groups would funnel
    * 100 TB through 5 tasks). Moments are exact decimal sums; z is then a
    * chain of IEEE double ops bit-identical on both engines (Num.std4
    * rationale).
    */
  val anomalyZscore: QueryDef = QueryDef(
    "anomaly_zscore",
    (s, d) => {
      val dec = col("value").cast(Dec)
      val stats = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          sum(dec).cast(DoubleType).as("s1"),
          sum(dec * dec).cast(DoubleType).as("s2"),
          count(lit(1)).cast(DoubleType).as("n"))
      val z = (col("value") - col("s1") / col("n")) /
        sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - lit(1.0)))
      Tables.events(s, d)
        .join(broadcast(stats), Seq("event_type"))
        .withColumn("z", z)
        .filter(abs(col("z")) > 3.0)
        .select(col("event_id"), col("event_type"), col("value"),
          bround(col("z"), 4).as("z"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH s AS (
        SELECT event_type,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
               CAST(sum(CAST(value AS DECIMAL(18,2))
                        * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2,
               CAST(count(*) AS DOUBLE) AS n
        FROM events GROUP BY 1)
      SELECT event_id, event_type, value,
             round_even((value - s1/n) / sqrt((s2 - s1*s1/n) / (n - 1.0)), 4) AS z
      FROM events JOIN s USING (event_type)
      WHERE abs((value - s1/n) / sqrt((s2 - s1*s1/n) / (n - 1.0))) > 3.0
      ORDER BY event_id
    """),
    doc = "|z| > 3 outliers; moments agg + broadcast back (no giant window)")

  /** Per-group min-max feature scaling: x' = (x - min)/(max - min), the
    * normalization step before a feature lands in a training set. Same
    * two-pass shape as anomalyZscore — per-group extrema are a tiny agg
    * broadcast back onto the fact. No rounding anywhere: min/max of 2-dp
    * inputs are exact doubles and the subtract/divide chain is one IEEE op
    * each over identical operands on both engines.
    */
  val minmaxScale: QueryDef = QueryDef(
    "minmax_scale",
    (s, d) => {
      val ext = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
      Tables.events(s, d)
        .join(broadcast(ext), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("value"),
          ((col("value") - col("mn")) / (col("mx") - col("mn"))).as("scaled"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH ext AS (
        SELECT event_type, min(value) AS mn, max(value) AS mx
        FROM events GROUP BY 1)
      SELECT event_id, event_type, value, (value - mn) / (mx - mn) AS scaled
      FROM events JOIN ext USING (event_type)
      ORDER BY event_id
    """),
    doc = "per-group min-max scaling; extrema agg + broadcast back")

  /** Forward-fill gap repair (`last ... IGNORE NULLS`): the standard
    * sensor-dropout treatment — nulls (here: error events' readings,
    * synthesized deterministically) take the key's most recent non-null
    * value. Per-key window, growing ROWS frame; the filled value is
    * carried verbatim (no arithmetic), so parity is bit-exact.
    */
  val forwardFill: QueryDef = QueryDef(
    "forward_fill",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("v_gappy",
          when(col("event_type") === "error", lit(null)).otherwise(col("value")))
        .withColumn("v_filled", last(col("v_gappy"), ignoreNulls = true).over(w))
        .select(col("event_id"), col("user_id"), col("v_gappy"), col("v_filled"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v_gappy,
             last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
      FROM events ORDER BY event_id
    """),
    doc = "forward-fill nulls per key (last ignore-nulls, growing frame)")

  /** Linear time-interpolation gap repair — forward_fill's better-behaved
    * sibling for continuous sensor series: each null takes the value
    * interpolated between the key's previous and next non-null readings,
    * weighted by TIME position (epoch microseconds, so unequal gap
    * spacing interpolates correctly). Two per-key windows (growing /
    * shrinking frame) fetch both anchors in one pass each — no self-join,
    * no spine. Edge discipline: leading nulls take the next anchor,
    * trailing nulls the previous, and a zero-width time gap (both
    * anchors in the same microsecond) degenerates to the previous value
    * — every branch guarded identically in both engines. Parity: the
    * anchors and epoch deltas are exact (verbatim doubles / BIGINTs), so
    * the interpolation is a chain of IEEE ops on identical operands,
    * hround'd to 4 dp.
    */
  val linearInterpFill: QueryDef = QueryDef(
    "linear_interp_fill",
    (s, d) => {
      val wPrev = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val base = Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("v_gappy",
          when(col("event_type") === "error", lit(null)).otherwise(col("value")))
        .withColumn("anchor_us",
          when(col("v_gappy").isNotNull, col("us")))
      val anchored = base
        .withColumn("pv", last(col("v_gappy"), ignoreNulls = true).over(wPrev))
        .withColumn("pu", last(col("anchor_us"), ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("v_gappy"), ignoreNulls = true).over(wNext))
        .withColumn("nu", first(col("anchor_us"), ignoreNulls = true).over(wNext))
      anchored.withColumn("v_interp", Text.hround(
          when(col("v_gappy").isNotNull, col("v_gappy"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .when(col("nu") === col("pu"), col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((col("us") - col("pu")).cast("double") /
                (col("nu") - col("pu")).cast("double"))), 4))
        .select(col("event_id"), col("user_id"), col("v_gappy"),
          col("v_interp"))
        .orderBy(col("event_id"))
    },
    Some(s"""
      WITH b AS (
        SELECT event_id, user_id, epoch_us(ts) AS us, ts,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v_gappy,
               CASE WHEN event_type = 'error' THEN NULL ELSE epoch_us(ts) END AS anchor_us
        FROM events),
      a AS (
        SELECT *,
          last_value(v_gappy IGNORE NULLS) OVER wp AS pv,
          last_value(anchor_us IGNORE NULLS) OVER wp AS pu,
          first_value(v_gappy IGNORE NULLS) OVER wn AS nv,
          first_value(anchor_us IGNORE NULLS) OVER wn AS nu
        FROM b
        WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT event_id, user_id, v_gappy,
             ${Text.sqlHround(
        """CASE WHEN v_gappy IS NOT NULL THEN v_gappy
               WHEN pv IS NULL THEN nv
               WHEN nv IS NULL THEN pv
               WHEN nu = pu THEN pv
               ELSE pv + (nv - pv) *
                 (CAST(us - pu AS DOUBLE) / CAST(nu - pu AS DOUBLE)) END""", 4)}
               AS v_interp
      FROM a ORDER BY event_id
    """),
    doc = "per-key linear time-interpolation of null readings (two window passes)")

  /** Time-RANGE trailing window: per-user 7-day trailing event count and
    * exact-decimal sum — the frame is defined by the TIME interval, not a
    * row count (RANGE, not ROWS: irregular event spacing means row frames
    * are wrong for "last 7 days"). Both engines order by truncated epoch
    * seconds so the frame boundary is identical; ties (same second) are
    * peers and share a frame, so no tiebreak is needed for determinism.
    * TRUNCATION TRAP: Spark's cast(ts AS LONG) FLOORS to seconds, but
    * DuckDB's date_part('epoch') is a DOUBLE carrying the fractional
    * second and CAST(DOUBLE AS BIGINT) ROUNDS — a frac ≥ .5 row lands in
    * the next second and can straddle a 7-day frame edge (one row at
    * sf0.1, invisible at sf0.01). The oracle must floor() before casting.
    */
  val trailing7d: QueryDef = QueryDef(
    "trailing_7d_range",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-7L * 86400, 0)
      Tables.events(s, d)
        .withColumn("n_7d", count(lit(1)).over(w))
        .withColumn("sum_7d",
          bround(sum(col("value").cast(Dec)).over(w).cast(DoubleType), 2))
        .select(col("event_id"), col("user_id"), col("n_7d"), col("sum_7d"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id,
             count(*) OVER w AS n_7d,
             round_even(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 2) AS sum_7d
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(date_part('epoch', ts)) AS BIGINT)
                   RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
      ORDER BY event_id
    """),
    doc = "7-day trailing count/sum via RANGE interval frame on epoch seconds")

  /** Decile bucketing within groups — ntile(10) over price with a unique
    * tie-break key (o_orderkey) so bucket assignment is total-order
    * deterministic, then per-bucket stats. One shuffle on the partition
    * key + in-partition sort — the quantile-bucketing shape that holds at
    * scale (contrast: a global percent_rank would force a global sort).
    */
  val ntileBucket: QueryDef = QueryDef(
    "ntile_bucket",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("decile", ntile(10).over(w).cast("int"))
        .groupBy(col("o_orderpriority"), col("decile"))
        .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("o_orderpriority"), col("decile"))
    },
    Some("""
      SELECT o_orderpriority, CAST(decile AS INTEGER) AS decile,
             count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
      FROM (SELECT o_orderpriority, o_totalprice,
                   ntile(10) OVER (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey) AS decile
            FROM orders)
      GROUP BY 1, 2 ORDER BY 1, 2
    """),
    doc = "decile bucketing per group (ntile window), per-bucket count/min/max")

  /** The SCD2 validity-interval frame (user_id, ver, event_type,
    * valid_from, valid_to, n_events) — shared by `scd2_history` (which
    * just orders it) and `pit_join_scd2` (which probes it).
    */
  private def scd2Frame(s: SparkSession, d: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("event_type"), 1).over(ord)
    val r = Tables.events(s, d)
      .withColumn("chg",
        when(prev.isNull || prev =!= col("event_type"), 1).otherwise(0))
      .withColumn("ver", sum(col("chg")).over(cum))
    r.groupBy(col("user_id"), col("ver"), col("event_type"))
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1)
        .over(Window.partitionBy(col("user_id")).orderBy(col("ver"))))
      .select(col("user_id"), col("ver"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"))
  }

  /** SCD type-2 history build — the warehouse pattern for "what was this
    * entity's state, and when": collapse each user's event stream into
    * versioned validity intervals. A new version opens whenever the
    * event_type differs from the previous event (lag-based change flag →
    * running sum = version id, the gap-islands construction); the
    * interval closes at the NEXT version's start (lead over versions;
    * null = current). Everything is keyed by user_id, so the change
    * detection, the per-version collapse, and the interval close all ride
    * user-key shuffles — no global sort, no driver state, version counts
    * bounded by each user's own history. Ordering ties broken by
    * event_id (unique), so versions are deterministic.
    */
  val scd2History: QueryDef = QueryDef(
    "scd2_history",
    (s, d) =>
      scd2Frame(s, d)
        .orderBy(col("user_id"), col("ver")),
    Some("""
      WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      r AS (
        SELECT user_id, event_type, ts,
               CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ver
        FROM o),
      g AS (SELECT user_id, ver, event_type, min(ts) AS valid_from,
                   count(*) AS n_events
            FROM r GROUP BY 1, 2, 3)
      SELECT user_id, ver, event_type, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY ver)
               AS valid_to,
             n_events
      FROM g ORDER BY user_id, ver
    """),
    doc = "SCD type-2 validity intervals per user (gap-islands versions, lead-closed)")

  /** Point-in-time (PIT) join against the SCD2 history — the "as the
    * dimension stood THEN" probe that makes SCD2 useful: each purchase
    * event joins the version whose [valid_from, valid_to) interval
    * covers its timestamp (valid_to NULL = still open), then rolls up
    * purchase count and exact cents per version. The join is an
    * EQUI-join on user_id with the interval test as a residual
    * conjunct — at 100 TB both sides shuffle once on the entity key and
    * each probe scans only that entity's (history-bounded) versions;
    * never a time-range cross product. Interval attribution is by
    * timestamp only (boundary events with identical ts tie-break into
    * the LATER version on both engines — half-open interval semantics),
    * matching the oracle exactly.
    */
  val pitJoinScd2: QueryDef = QueryDef(
    "pit_join_scd2",
    (s, d) => {
      val hist = scd2Frame(s, d)
      val purch = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("pts"),
          col("value").cast("decimal(18,2)").as("pv"))
      purch.join(hist,
          col("pu") === col("user_id") && col("pts") >= col("valid_from") &&
            (col("valid_to").isNull || col("pts") < col("valid_to")))
        .groupBy(col("user_id"), col("ver"), col("event_type"))
        .agg(count(lit(1)).as("n_purch"),
          (sum(col("pv")) * lit(100)).cast("long").as("cents"))
        .orderBy(col("user_id"), col("ver"))
    },
    Some("""
      WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      r AS (
        SELECT user_id, event_type, ts,
               CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ver
        FROM o),
      g AS (SELECT user_id, ver, event_type, min(ts) AS valid_from,
                   count(*) AS n_events
            FROM r GROUP BY 1, 2, 3),
      hist AS (
        SELECT user_id, ver, event_type, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY ver)
                 AS valid_to
        FROM g),
      p AS (SELECT user_id AS pu, ts AS pts,
                   CAST(value AS DECIMAL(18,2)) AS pv
            FROM events WHERE event_type = 'purchase')
      SELECT h.user_id, h.ver, h.event_type, count(*) AS n_purch,
             CAST(sum(pv) * 100 AS BIGINT) AS cents
      FROM p JOIN hist h ON p.pu = h.user_id AND p.pts >= h.valid_from
        AND (h.valid_to IS NULL OR p.pts < h.valid_to)
      GROUP BY 1, 2, 3 ORDER BY h.user_id, h.ver
    """),
    doc = "point-in-time join of purchases to SCD2 versions (equi + interval residual)")

  /** Merged-interval coverage — total ACTIVE time per user when every
    * event projects a [ts, ts+15min) activity interval and overlaps must
    * not double-count (the union-of-intervals problem; billing and SLA
    * pipelines live on it). Classic sweep: an interval starts a new
    * island when its start exceeds the running max of previous ends
    * (cummax window), islands then sum (max(end) − min(start)) each —
    * all EXACT integer epoch-microsecond arithmetic, no floats at all.
    * Everything is user-partitioned windows (the Windows.scala rule: the
    * sweep distributes by user; state per partition is one running
    * max), then a two-level grouped collapse. Ties order by event_id.
    */
  val intervalCoverage: QueryDef = QueryDef(
    "interval_coverage",
    (s, d) => {
      val SpanUs = 15L * 60 * 1000000
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("st"), col("event_id"))
      val prevMax = Window.partitionBy(col("user_id"))
        .orderBy(col("st"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val iv = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("st"))
        .withColumn("en", col("st") + lit(SpanUs))
      iv
        .withColumn("pmax", max(col("en")).over(prevMax))
        .withColumn("new_island",
          when(col("pmax").isNull || col("st") > col("pmax"), 1L)
            .otherwise(0L))
        .withColumn("island",
          sum(col("new_island")).over(
            ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("st")).as("ist"), max(col("en")).as("ien"),
          count(lit(1)).as("n_events"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"), sum(col("n_events")).as("n_events"),
          sum(col("ien") - col("ist")).as("covered_us"))
        .select(col("user_id"), col("n_islands"), col("n_events"),
          expr("covered_us div 1000000").as("covered_s"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH iv AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS st, epoch_us(ts) + 900000000 AS en
        FROM events),
      mx AS (
        SELECT user_id, event_id, st, en,
               max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        FROM iv),
      isl AS (
        SELECT user_id, st, en,
               CAST(sum(CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY st, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
        FROM mx),
      g AS (SELECT user_id, island, min(st) AS ist, max(en) AS ien,
                   count(*) AS n_events
            FROM isl GROUP BY 1, 2)
      SELECT user_id, count(*) AS n_islands,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             CAST(CAST(sum(ien - ist) AS BIGINT) // 1000000 AS BIGINT)
               AS covered_s
      FROM g GROUP BY 1 ORDER BY user_id
    """),
    doc = "union-of-intervals active time per user (cummax sweep, exact epoch ints)")

  /** Daily p10/p50/p90 revenue bands — the SLO-dashboard percentile
    * ribbon, computed EXACTLY per day by the value-count recipe
    * (`grouped_median_exact` at three ranks): for rank k_q =
    * ⌈n·q/100⌉ the band value is the one whose cumulative interval
    * covers k_q, picked with a conditional min inside the per-day
    * collapse — so one pass over the (day, cents) count frame yields
    * all three bands, no row sort and no percentile_approx error bars.
    * All integer compares on exact cents; windows partitioned by day.
    */
  val dailyPercentileBands: QueryDef = QueryDef(
    "daily_percentile_bands",
    (s, d) => {
      val vc = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"),
          (col("value").cast("decimal(18,2)") * lit(100)).cast("long")
            .as("cents"))
        .agg(count(lit(1)).as("cnt"))
      val wLess = Window.partitionBy(col("day")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.partitionBy(col("day"))
      def pick(q: Int) = {
        val k = expr(s"(nt * $q + 99) div 100")
        min(when(col("cum_less") < k &&
          k <= col("cum_less") + col("cnt"), col("cents")))
      }
      vc
        .withColumn("cum_less", coalesce(sum(col("cnt")).over(wLess), lit(0L)))
        .withColumn("nt", sum(col("cnt")).over(wAll))
        .groupBy(col("day"))
        .agg(max(col("nt")).as("n_purch"), pick(10).as("p10_cents"),
          pick(50).as("p50_cents"), pick(90).as("p90_cents"))
        .orderBy(col("day"))
    },
    Some("""
      WITH vc AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               count(*) AS cnt
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      c AS (SELECT day, cents, cnt,
              coalesce(CAST(sum(cnt) OVER (PARTITION BY day ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                0) AS cum_less,
              CAST(sum(cnt) OVER (PARTITION BY day) AS BIGINT) AS nt
            FROM vc)
      SELECT day, max(nt) AS n_purch,
             min(CASE WHEN cum_less < (nt * 10 + 99) // 100
                       AND (nt * 10 + 99) // 100 <= cum_less + cnt
                      THEN cents END) AS p10_cents,
             min(CASE WHEN cum_less < (nt * 50 + 99) // 100
                       AND (nt * 50 + 99) // 100 <= cum_less + cnt
                      THEN cents END) AS p50_cents,
             min(CASE WHEN cum_less < (nt * 90 + 99) // 100
                       AND (nt * 90 + 99) // 100 <= cum_less + cnt
                      THEN cents END) AS p90_cents
      FROM c GROUP BY day ORDER BY day
    """),
    doc = "exact daily p10/p50/p90 bands from the (day, cents) count frame")

  /** Batch sessionization — the gap-island construction as an ENGINE
    * operator (the streaming twin is `session_window_agg`, whose oracle
    * uses this same construction in SQL). A session breaks on a gap
    * >= 30 minutes, matching Spark `session_window`'s end-EXCLUSIVE
    * [start, last + gap) semantics, so the two formulations partition
    * the event stream identically (asserted in AnalyticsSpec). Change
    * flag, running-sum session id, and per-session collapse all ride one
    * user_id-key shuffle — no global sort, state bounded per user;
    * ordering ties broken by event_id (unique) for determinism.
    */
  val sessionizeBatch: QueryDef = QueryDef(
    "sessionize_batch",
    (s, d) => {
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prevTs = lag(col("ts"), 1).over(ord)
      Tables.events(s, d)
        .withColumn("new_sess",
          when(prevTs.isNull ||
            col("ts") >= prevTs + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(cum))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"),
          count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"))
        .orderBy(col("user_id"), col("sess_id"))
    },
    Some("""
      WITH g AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL OR
                         ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (SELECT user_id, ts, event_type,
                   CAST(sum(new_sess) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS sess_id
            FROM g)
      SELECT user_id, sess_id, min(ts) AS sess_start, max(ts) AS sess_end,
             count(*) AS n_events,
             count(DISTINCT event_type) AS n_types
      FROM s GROUP BY 1, 2 ORDER BY user_id, sess_id
    """),
    doc = "batch gap-island sessionization (30m, end-exclusive; = session_window partition)")

  /** Markov transition matrix over per-user event sequences: lag(1) pairs
    * (prev_type → event_type) counted, then row-normalized into transition
    * probabilities. One user-key shuffle for the ordered lag, one tiny
    * (|types|²) aggregate; the probability divides identical BIGINTs on
    * both engines. The first event per user (no predecessor) is excluded —
    * a transition needs both endpoints.
    */
  val markovTransitions: QueryDef = QueryDef(
    "markov_transitions",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val wRow = Window.partitionBy(col("prev_type"))
      pairs
        .withColumn("row_n", sum(col("n")).over(wRow))
        .select(col("prev_type"), col("event_type"), col("n"),
          Text.hround(col("n").cast("double") / col("row_n").cast("double"), 6)
            .as("p"))
        .orderBy(col("prev_type"), col("event_type"))
    },
    Some(s"""
      WITH t AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type,
               event_type
        FROM events),
      g AS (SELECT prev_type, event_type, count(*) AS n
            FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      r AS (SELECT prev_type, event_type, n,
                   CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS row_n
            FROM g)
      SELECT prev_type, event_type, n,
             ${Text.sqlHround("CAST(n AS DOUBLE) / CAST(row_n AS DOUBLE)", 6)} AS p
      FROM r ORDER BY 1, 2
    """),
    doc = "per-user event-sequence Markov transition counts + probabilities")

  /** EWMA smoothing with an explicit 5-term halving kernel (16,8,4,2,1),
    * renormalized over the lags actually present near sequence starts.
    * Written as a FIXED expression tree of per-row lags — not an
    * aggregate — so the IEEE op order is identical in both engines
    * (a windowed double sum would accumulate in engine-specific order).
    * One user-key shuffle; the 5 lags share a single window sort.
    */
  val ewmaSmooth: QueryDef = QueryDef(
    "ewma_smooth",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wts = Seq(16.0, 8.0, 4.0, 2.0, 1.0)
      val withLags = wts.indices.foldLeft(Tables.events(s, d)) { (df, k) =>
        df.withColumn(s"l$k",
          if (k == 0) col("value") else lag(col("value"), k).over(w))
      }
      val num = wts.indices.map(k =>
        when(col(s"l$k").isNull, lit(0.0)).otherwise(lit(wts(k)) * col(s"l$k")))
        .reduce(_ + _)
      val den = wts.indices.map(k =>
        when(col(s"l$k").isNull, lit(0.0)).otherwise(lit(wts(k))))
        .reduce(_ + _)
      withLags
        .select(col("event_id"), col("user_id"), col("value"),
          Text.hround(num / den, 4).as("ewma"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some {
      val wts = Seq(16.0, 8.0, 4.0, 2.0, 1.0)
      val lags = wts.indices.map { k =>
        if (k == 0) "value AS l0"
        else s"lag(value, $k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l$k"
      }.mkString(", ")
      val num = wts.indices.map(k =>
        s"CASE WHEN l$k IS NULL THEN 0.0 ELSE ${wts(k)} * l$k END").mkString(" + ")
      val den = wts.indices.map(k =>
        s"CASE WHEN l$k IS NULL THEN 0.0 ELSE ${wts(k)} END").mkString(" + ")
      s"""
      WITH t AS (SELECT event_id, user_id, value, $lags FROM events)
      SELECT event_id, user_id, value,
             ${Text.sqlHround(s"($num) / ($den)", 4)} AS ewma
      FROM t ORDER BY user_id, event_id
      """
    },
    doc = "5-term halving-kernel EWMA as a fixed lag expression tree")

  /** Monthly climatology + anomaly — the canonical climate-science
    * post-processing over the reference's monthly output (what the
    * validation notebook eyeballs per capital,
    * /root/reference/scripts/validation_northern_capitals.ipynb cells 3-5):
    * climatology = the across-years mean of each (station, calendar-month)
    * monthly mean; anomaly = monthly value − its climatology. Two levels:
    * ONE groupBy shuffle builds the monthly means (partial+final hash agg),
    * then the climatology is a whole-partition window over
    * (station, month-of-year) — at 100 TB the window state per partition is
    * bounded by #years, and the key space (stations × 12) distributes.
    * Parity: the monthly mean is avg2 (exact-decimal, half-up); the
    * climatology re-averages those 2-dp values through DECIMAL(18,2)
    * (already AT scale 2, so both engines' double→decimal casts agree —
    * see CLAUDE.md decimal-cast gotcha) in the same floor form; the
    * anomaly is a difference of identical doubles, hround'd.
    */
  val climatologyAnomaly: QueryDef = QueryDef(
    "climatology_anomaly",
    (s, d) => {
      val monthly = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey").as("supp_id"),
          year(col("l_shipdate")).as("yr"), month(col("l_shipdate")).as("mo"))
        .agg(Num.avg2(col("l_quantity")).as("avg_qty"))
      val w = Window.partitionBy(col("supp_id"), col("mo"))
      val clim = floor(
        sum(col("avg_qty").cast(Dec)).over(w).cast(DoubleType) * lit(100.0) /
          count(lit(1)).over(w) + lit(0.5)) / lit(100.0)
      monthly
        .withColumn("climatology", clim)
        .withColumn("anomaly",
          Text.hround(col("avg_qty") - col("climatology"), 2))
        .orderBy(col("supp_id"), col("yr"), col("mo"))
    },
    Some(s"""
      WITH m AS (
        SELECT l_suppkey AS supp_id, CAST(year(l_shipdate) AS INTEGER) AS yr,
               CAST(month(l_shipdate) AS INTEGER) AS mo,
               ${Num.sqlAvg2("l_quantity")} AS avg_qty
        FROM lineitem GROUP BY 1, 2, 3),
      c AS (
        SELECT supp_id, yr, mo, avg_qty,
               floor(CAST(sum(CAST(avg_qty AS DECIMAL(18,2)))
                            OVER (PARTITION BY supp_id, mo) AS DOUBLE) * 100.0
                     / count(*) OVER (PARTITION BY supp_id, mo) + 0.5) / 100.0
                 AS climatology
        FROM m)
      SELECT supp_id, yr, mo, avg_qty, climatology,
             ${Text.sqlHround("(avg_qty - climatology)", 2)} AS anomaly
      FROM c ORDER BY supp_id, yr, mo
    """),
    doc = "monthly climatology (across-years mean) + anomaly per station")

  /** Rolling 6-month Pearson correlation between two monthly series
    * (quantity vs price per supplier) — the moving-association diagnostic
    * a climate analyst runs between two variables (e.g. precipitation vs
    * temperature). All five moment sums accumulate EXACT DECIMALS over
    * the ROWS frame (x,y are 2-dp ⇒ products are exact 4-dp decimals), so
    * the frame-walk order doesn't matter; r is then a fixed chain of IEEE
    * ops on identical operands, hround(4), null when the frame is
    * degenerate (n<3 or zero variance — nullif guards both engines).
    */
  val rollingCorr: QueryDef = QueryDef(
    "rolling_corr",
    (s, d) => {
      val monthly = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey").as("supp_id"),
          year(col("l_shipdate")).as("yr"), month(col("l_shipdate")).as("mo"))
        .agg(Num.sum2(col("l_quantity")).as("x"),
          Num.sum2(col("l_extendedprice")).as("y"))
      val w = Window.partitionBy(col("supp_id"))
        .orderBy(col("yr"), col("mo")).rowsBetween(-5, 0)
      val xd = col("x").cast(Dec); val yd = col("y").cast(Dec)
      val n   = count(lit(1)).over(w).cast(DoubleType)
      val sx  = sum(xd).over(w).cast(DoubleType)
      val sy  = sum(yd).over(w).cast(DoubleType)
      val sxx = sum(xd * xd).over(w).cast(DoubleType)
      val syy = sum(yd * yd).over(w).cast(DoubleType)
      val sxy = sum(xd * yd).over(w).cast(DoubleType)
      val den = sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)
      val r = (n * sxy - sx * sy) / nullif(den, lit(0.0))
      monthly
        .select(col("supp_id"), col("yr"), col("mo"),
          when(n >= 3, Text.hround(r, 4)).as("corr6"))
        .orderBy(col("supp_id"), col("yr"), col("mo"))
    },
    Some(s"""
      WITH m AS (
        SELECT l_suppkey AS supp_id, CAST(year(l_shipdate) AS INTEGER) AS yr,
               CAST(month(l_shipdate) AS INTEGER) AS mo,
               ${Num.sqlSum2("l_quantity")} AS x,
               ${Num.sqlSum2("l_extendedprice")} AS y
        FROM lineitem GROUP BY 1, 2, 3),
      s AS (
        SELECT supp_id, yr, mo,
          CAST(count(*) OVER w AS DOUBLE) AS n,
          CAST(sum(CAST(x AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sx,
          CAST(sum(CAST(y AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sy,
          CAST(sum(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sxx,
          CAST(sum(CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) OVER w AS DOUBLE) AS syy,
          CAST(sum(CAST(x AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sxy
        FROM m
        WINDOW w AS (PARTITION BY supp_id ORDER BY yr, mo
                     ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
      SELECT supp_id, yr, mo,
             CASE WHEN n >= 3 THEN ${Text.sqlHround(
        "(n * sxy - sx * sy) / nullif(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0.0)", 4)}
             END AS corr6
      FROM s ORDER BY supp_id, yr, mo
    """),
    doc = "rolling 6-month Pearson r from exact decimal moment sums")

  /** Exact trailing-7-day DISTINCT user count per day — the windowed
    * COUNT(DISTINCT) no engine's window functions support directly, in
    * the formulation that scales: each event CONTRIBUTES itself to the 7
    * window-days it falls in (row-local sequence+explode, x7 fanout),
    * then ONE groupBy(window_day) count-distinct shuffle. The naive
    * alternatives both die at 100 TB: a per-day correlated re-scan is
    * O(days x corpus) (the oracle below does exactly that — fine for
    * DuckDB at sf0.01, never for Spark at scale), and collect_set over a
    * RANGE window holds every distinct user of every open window in
    * state simultaneously. Semi join restricts output to days that
    * actually occur (the explode also manufactures the 6 days past each
    * event).
    */
  val rollingDistinct7d: QueryDef = QueryDef(
    "rolling_distinct_7d",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val days = ev.select(col("day")).distinct()
      ev.withColumn("wday",
          explode(expr("sequence(day, date_add(day, 6))")))
        .join(broadcast(days).withColumnRenamed("day", "wday"),
          Seq("wday"), "left_semi")
        .groupBy(col("wday"))
        .agg(countDistinct(col("user_id")).as("n_users_7d"))
        .orderBy(col("wday"))
    },
    Some("""
      WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
      SELECT d.day AS wday,
             (SELECT count(DISTINCT e2.user_id) FROM events e2
              WHERE CAST(e2.ts AS DATE) BETWEEN d.day - 6 AND d.day) AS n_users_7d
      FROM days d ORDER BY wday
    """),
    doc = "exact trailing-7d distinct via contribution explode + one shuffle")

  /** Classical additive decomposition of the per-nation monthly revenue
    * series: value = trend + seasonal + residual. Trend is the centered
    * 12-row moving mean (ROWS 5 PRECEDING..6 FOLLOWING — row-based, so
    * month gaps in a sparse series shift the window identically on both
    * engines); seasonal is the month-of-year mean of the detrended
    * series. Determinism: the trend mean divides an exact DECIMAL window
    * sum by the frame count; the detrended doubles are then quantized to
    * 1e-4 longs BEFORE the seasonal average, so the per-month sum is an
    * order-free integer (double summation over a partition is
    * order-dependent — the same micro-quantization trick as the
    * clustering family). At 100 TB: one shuffle to (nation, month)
    * groups, then windows over the ~|nations|×|months| AGGREGATE — the
    * corpus never enters a window.
    */
  val trendSeasonal: QueryDef = QueryDef(
    "trend_seasonal_decompose",
    (s, d) => {
      val series = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"),
          year(col("l_shipdate")).cast("int").as("yr"),
          month(col("l_shipdate")).cast("int").as("mo"))
        .agg(Num.sum2(col("l_extendedprice")).as("rev"))
      val wT = Window.partitionBy(col("n_name"))
        .orderBy(col("yr"), col("mo")).rowsBetween(-5, 6)
      val detr = series
        .withColumn("trend",
          sum(col("rev").cast(Dec)).over(wT).cast(DoubleType) /
            count(lit(1)).over(wT).cast(DoubleType))
        .withColumn("detr", col("rev") - col("trend"))
        .withColumn("dq",
          floor(col("detr") * lit(1e4) + lit(0.5)).cast("long"))
      val wS = Window.partitionBy(col("n_name"), col("mo"))
      detr
        .withColumn("seasonal",
          sum(col("dq")).over(wS).cast(DoubleType) /
            count(lit(1)).over(wS).cast(DoubleType) / lit(1e4))
        .select(col("n_name"), col("yr"), col("mo"), col("rev"),
          Text.hround(col("trend"), 4).as("trend"),
          Text.hround(col("seasonal"), 4).as("seasonal"),
          Text.hround(col("detr") - col("seasonal"), 4).as("resid"))
        .orderBy(col("n_name"), col("yr"), col("mo"))
    },
    Some(s"""
      WITH series AS (
        SELECT n_name, CAST(year(l_shipdate) AS INTEGER) AS yr,
               CAST(month(l_shipdate) AS INTEGER) AS mo,
               ${Num.sqlSum2("l_extendedprice")} AS rev
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1, 2, 3),
      t AS (
        SELECT *,
          CAST(sum(CAST(rev AS DECIMAL(18,2))) OVER wt AS DOUBLE) /
            CAST(count(*) OVER wt AS DOUBLE) AS trend
        FROM series
        WINDOW wt AS (PARTITION BY n_name ORDER BY yr, mo
                      ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)),
      q AS (
        SELECT *, rev - trend AS detr,
               CAST(floor((rev - trend) * 1e4 + 0.5) AS BIGINT) AS dq
        FROM t),
      z AS (
        SELECT *,
          CAST(sum(dq) OVER ws AS DOUBLE) /
            CAST(count(*) OVER ws AS DOUBLE) / 1e4 AS seasonal
        FROM q
        WINDOW ws AS (PARTITION BY n_name, mo))
      SELECT n_name, yr, mo, rev,
             ${Text.sqlHround("trend", 4)} AS trend,
             ${Text.sqlHround("seasonal", 4)} AS seasonal,
             ${Text.sqlHround("detr - seasonal", 4)} AS resid
      FROM z ORDER BY n_name, yr, mo
    """),
    doc = "additive trend/seasonal/residual decomposition of monthly revenue")

  /** Consecutive-spell runs — the climate-index shape (CDD/CWD:
    * consecutive dry/wet days, reference domain's standard extreme-event
    * index) over the daily event series: per type, the number of
    * below-average runs, total low days, and the LONGEST consecutive run
    * with its start date. "Low" is strictly-below-the-mean decided by
    * integer cross-multiplication (n·n_days < total — no division, no
    * float boundary); runs come from the classic gap-islands key
    * (day − row_number over the filtered low days). Scale: the heavy
    * collapse (raw events → daily) shuffles on the FINE (type, day) key;
    * the per-type windows then run over calendar-bounded series (≤
    * thousands of rows per key however big the corpus), so the coarse
    * partition key is never a skew risk.
    */
  val spellRuns: QueryDef = QueryDef(
    "spell_runs",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val tot = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("n")).as("total"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val low = daily.join(broadcast(tot), Seq("event_type"))
        .filter(col("n") * col("n_days") < col("total"))
        .withColumn("island", date_sub(col("day"), row_number().over(w)))
      val runs = low.groupBy(col("event_type"), col("island"))
        .agg(count(lit(1)).as("run_len"), min(col("day")).as("run_start"))
      val wb = Window.partitionBy(col("event_type"))
        .orderBy(col("run_len").desc, col("run_start"))
      val best = runs.withColumn("rr", row_number().over(wb))
        .filter(col("rr") === 1)
        .select(col("event_type"), col("run_len"), col("run_start"))
      val agg = runs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_runs"), sum(col("run_len")).as("n_low"))
      tot.join(agg, Seq("event_type"), "left")
        .join(best, Seq("event_type"), "left")
        .select(col("event_type"), col("n_days"),
          coalesce(col("n_runs"), lit(0L)).as("n_runs"),
          coalesce(col("n_low"), lit(0L)).as("n_low_days"),
          coalesce(col("run_len"), lit(0L)).as("max_run"),
          col("run_start").as("max_run_start"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                     CAST(sum(n) AS BIGINT) AS total FROM daily GROUP BY 1),
      low AS (
        SELECT d.event_type, d.day,
               d.day - CAST(row_number() OVER (PARTITION BY d.event_type
                                               ORDER BY d.day) AS INTEGER) AS island
        FROM daily d JOIN tot t USING (event_type)
        WHERE d.n * t.n_days < t.total),
      runs AS (
        SELECT event_type, island, CAST(count(*) AS BIGINT) AS run_len,
               min(day) AS run_start
        FROM low GROUP BY 1, 2),
      best AS (
        SELECT event_type, run_len, run_start,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY run_len DESC, run_start) AS rr
        FROM runs)
      SELECT t.event_type, t.n_days,
             CAST(coalesce(r.n_runs, 0) AS BIGINT) AS n_runs,
             CAST(coalesce(r.n_low, 0) AS BIGINT) AS n_low_days,
             CAST(coalesce(b.run_len, 0) AS BIGINT) AS max_run,
             b.run_start AS max_run_start
      FROM tot t
      LEFT JOIN (SELECT event_type, count(*) AS n_runs, sum(run_len) AS n_low
                 FROM runs GROUP BY 1) r USING (event_type)
      LEFT JOIN (SELECT event_type, run_len, run_start FROM best WHERE rr = 1) b
        USING (event_type)
      ORDER BY t.event_type
    """),
    doc = "consecutive below-average spell runs per series (CDD-style gap-islands index)")

  /** Annual block maxima — the first step of extreme-value analysis
    * (GEV fitting starts from per-block maxima; in the climate domain
    * this is the hottest-day-per-year series): per (flag, year), the
    * peak daily total and the day it occurred (ties → earliest day,
    * deterministic). Daily totals stay EXACT INTEGER CENTS end-to-end —
    * no float ever exists in the plan. Two shuffles total: the fine
    * (flag, day) daily collapse, then the per-(flag, year) rank-1
    * window, which WindowGroupLimit prunes to the top row per block at
    * the scan side of the window sort.
    */
  val annualMaxima: QueryDef = QueryDef(
    "annual_maxima",
    (s, d) => {
      val daily = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), to_date(col("l_shipdate")).as("day"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .multiply(lit(100)).cast("long").as("cents"))
      val w = Window.partitionBy(col("l_returnflag"), year(col("day")))
        .orderBy(col("cents").desc, col("day"))
      daily.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), year(col("day")).as("yr"),
          col("day").as("peak_day"), col("cents").as("peak_cents"))
        .orderBy(col("l_returnflag"), col("yr"))
    },
    Some("""
      WITH daily AS (
        SELECT l_returnflag, CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        FROM lineitem GROUP BY 1, 2),
      r AS (
        SELECT l_returnflag, day, cents,
               row_number() OVER (PARTITION BY l_returnflag, year(day)
                                  ORDER BY cents DESC, day) AS rn
        FROM daily)
      SELECT l_returnflag, CAST(year(day) AS INTEGER) AS yr,
             day AS peak_day, cents AS peak_cents
      FROM r WHERE rn = 1 ORDER BY l_returnflag, yr
    """),
    doc = "annual block maxima: peak day per (flag, year), exact integer cents")

  /** Extreme-day count above the exact per-series p90 — the R90p-style
    * percentile-threshold index completing the climate-extremes trio
    * (spell_runs = duration, annual_maxima = magnitude, this =
    * frequency). The p90 is an EXACT order statistic: rank
    * ⌈0.9·n⌉ computed as (n·90 + 99) div 100 — pure integer arithmetic,
    * no float ceil — picked from the (cents ASC, day ASC) row_number,
    * so the threshold is a real observed value and both engines select
    * the identical row. Daily totals are exact integer cents; the count
    * of strictly-above days is then float-free end-to-end. The rank
    * window runs per type over calendar-bounded daily rows (never
    * corpus-bounded), like the rest of the daily-series family.
    */
  val extremeDaysP90: QueryDef = QueryDef(
    "extreme_days_p90",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)"))
          .multiply(lit(100)).cast("long").as("cents"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("cents"), col("day"))
      val ranked = daily
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n_days",
          count(lit(1)).over(Window.partitionBy(col("event_type"))))
      val p90 = ranked
        .filter(col("rn") === expr("(n_days * 90 + 99) div 100"))
        .select(col("event_type"), col("cents").as("p90_cents"))
      daily.join(p90, Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          max(col("p90_cents")).as("p90_cents"),
          sum(when(col("cents") > col("p90_cents"), 1L).otherwise(0L))
            .as("n_extreme"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        FROM events GROUP BY 1, 2),
      ranked AS (
        SELECT event_type, cents,
               CAST(row_number() OVER (PARTITION BY event_type
                                       ORDER BY cents, day) AS BIGINT) AS rn,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days
        FROM daily),
      p90 AS (
        SELECT event_type, cents AS p90_cents
        FROM ranked WHERE rn = (n_days * 90 + 99) // 100)
      SELECT d.event_type, count(*) AS n_days,
             max(p.p90_cents) AS p90_cents,
             CAST(sum(CASE WHEN d.cents > p.p90_cents THEN 1 ELSE 0 END) AS BIGINT)
               AS n_extreme
      FROM daily d JOIN p90 p USING (event_type)
      GROUP BY 1 ORDER BY 1
    """),
    doc = "R90p-style extreme-day count above the exact per-series p90 (integer-exact)")

  /** Threshold-excess accumulation — the growing-degree-day (GDD) index
    * form (Σ max(0, x − base) per block), fourth member of the climate
    * index family (duration / magnitude / frequency / ACCUMULATION).
    * Base 25 sits at the median of the integral 1..50 quantity domain,
    * so the hinge discriminates every year. The fixture's quantities
    * are integral doubles (asserted: zero fractional values), so every
    * partial sum is an exact small integer in IEEE — summation order
    * cannot matter and the final BIGINT cast is exact on both engines.
    * Shape: one map-side-combined groupBy on (flag, year) — a pure
    * partial-agg scan at any scale.
    */
  val degreeDayAccum: QueryDef = QueryDef(
    "degree_day_accum",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), year(col("l_shipdate")).as("yr"))
        .agg(sum(greatest(lit(0.0), col("l_quantity") - lit(25.0)))
          .cast("long").as("gdd"),
          sum(when(col("l_quantity") > 25.0, 1L).otherwise(0L))
            .as("n_excess"))
        .orderBy(col("l_returnflag"), col("yr")),
    Some("""
      SELECT l_returnflag, CAST(year(l_shipdate) AS INTEGER) AS yr,
             CAST(sum(greatest(0.0, l_quantity - 25.0)) AS BIGINT) AS gdd,
             CAST(sum(CASE WHEN l_quantity > 25.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_excess
      FROM lineitem
      GROUP BY 1, 2 ORDER BY 1, 2
    """),
    doc = "threshold-excess accumulation per (flag, year) — the GDD climate-index form")

  /** Weekly OHLC resample per event type — the canonical downsample of a
    * tick stream into bars (open/high/low/close + exact volume sum). The
    * open/close are `min_by`/`max_by` over the (ts, event_id) struct
    * ordering, which both engines resolve deterministically because
    * event_id is unique — no window, no sort of the corpus: one hash
    * aggregate (partial+final, map-side combined) whose output is bounded
    * by types × weeks, i.e. the calendar, not the data volume. Both
    * engines truncate weeks to Monday. open/close carry RAW input values
    * (no float summation → no parity surface); the only sum is the exact
    * decimal Num.sum2.
    */
  val ohlcBars: QueryDef = QueryDef(
    "ohlc_bars",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .agg(min_by(col("value"), struct(col("ts"), col("event_id"))).as("open_v"),
          max(col("value")).as("high_v"),
          min(col("value")).as("low_v"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("close_v"),
          Num.sum2(col("value")).as("sum_v"),
          count(lit(1)).as("n_ev"))
        .orderBy(col("event_type"), col("wk")),
    Some(s"""
      SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS wk,
             first(value ORDER BY ts, event_id) AS open_v,
             max(value) AS high_v, min(value) AS low_v,
             last(value ORDER BY ts, event_id) AS close_v,
             ${Num.sqlSum2("value")} AS sum_v,
             count(*) AS n_ev
      FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """),
    doc = "weekly OHLC bars per event type (first/last by time, exact decimal volume)")

  /** Fixed-bin histogram quantile estimates per event type — the BATCH
    * TWIN of [[graft.streaming.EventStream.histQuantileState]], so the
    * streaming sketch's estimator is oracle-checked cross-engine, not
    * just spec-checked: identical bins (60 × width 10 over [0, 600),
    * clamped edges), identical crossing-bin rule (first bin with c > 0
    * whose cumulative count reaches p·n), identical interpolation
    * (both engines divide the same integer-derived operands, then
    * hround). The histogram is a single groupBy over (type, bin) —
    * at scale the only corpus pass — and the quantile walk is a window
    * over the ≤ 60-row-per-type bin table.
    */
  val histQuantiles: QueryDef = QueryDef(
    "hist_quantiles",
    (s, d) => {
      // both edges clamped (greatest 0 / least 59) to match the streaming
      // sketch's documented [0, 600) clamped-edge contract — value is
      // >= 0 at every fixture SF, so the lower clamp is latent, but a
      // negative value must land in bin 0 on BOTH engines, not bin -k
      val hb = Tables.events(s, d)
        .select(col("event_type"),
          greatest(lit(0),
            least(lit(59), floor(col("value") / 10).cast("int"))).as("b"))
        .groupBy(col("event_type"), col("b")).agg(count(lit(1)).as("c"))
      val cum = hb
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy(col("event_type")).orderBy(col("b"))))
        .withColumn("n", sum(col("c")).over(
          Window.partitionBy(col("event_type"))))
      def est(p: Double, name: String) = cum
        .filter(col("c") > 0 && col("cum") >= lit(p) * col("n") &&
          col("cum") - col("c") < lit(p) * col("n"))
        .select(col("event_type"), col("n"),
          Text.hround(col("b") * 10 + lit(10.0) *
            (lit(p) * col("n") - (col("cum") - col("c"))) / col("c"), 4)
            .as(name))
      est(0.5, "p50_est")
        .join(est(0.95, "p95_est").drop("n"), Seq("event_type"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH hb AS (SELECT event_type,
               greatest(0, least(59, CAST(floor(value / 10) AS INT))) AS b,
               count(*) AS c
             FROM events GROUP BY 1, 2),
      cum AS (SELECT event_type, b, CAST(c AS BIGINT) AS c,
               CAST(sum(c) OVER (PARTITION BY event_type ORDER BY b)
                 AS BIGINT) AS cum,
               CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
             FROM hb),
      p50 AS (SELECT event_type, n,
               floor((b * 10 + 10e0 * (0.5e0 * n - (cum - c)) / c) * 1e4 + 0.5e0) / 1e4
                 AS p50_est
             FROM cum
             WHERE c > 0 AND cum >= 0.5e0 * n AND cum - c < 0.5e0 * n),
      p95 AS (SELECT event_type,
               floor((b * 10 + 10e0 * (0.95e0 * n - (cum - c)) / c) * 1e4 + 0.5e0) / 1e4
                 AS p95_est
             FROM cum
             WHERE c > 0 AND cum >= 0.95e0 * n AND cum - c < 0.95e0 * n)
      SELECT p50.event_type, p50.n, p50.p50_est, p95.p95_est
      FROM p50 JOIN p95 USING (event_type) ORDER BY 1
    """),
    doc = "fixed-bin histogram p50/p95 per event type (batch twin of the streaming sketch)")

  val all: Seq[QueryDef] =
    Seq(lagDelta, rollingAvg, runningTotal, topkPerGroup, anomalyZscore,
      minmaxScale, forwardFill, linearInterpFill, trailing7d, ntileBucket,
      scd2History, pitJoinScd2, intervalCoverage, dailyPercentileBands,
      sessionizeBatch,
      markovTransitions, ewmaSmooth,
      climatologyAnomaly, rollingCorr, rollingDistinct7d, trendSeasonal,
      spellRuns, annualMaxima, extremeDaysP90, degreeDayAccum, ohlcBars,
      histQuantiles)
}
