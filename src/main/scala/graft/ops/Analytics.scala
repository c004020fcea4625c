package graft.ops

import graft.core.{Num, QueryDef, Tables, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical / set-algebra analytics beyond the reference's surface
  * (engine extensions in the SURVEY.md §2 "available free" spirit): the
  * describe-style stats a data scientist reaches for right after the
  * reference's summary block, plus the relational set operators the
  * reference approximates with pandas boolean masks.
  *
  * Numeric discipline: every accumulation is an EXACT decimal sum (the
  * Num.scala rule — order-independent, identical across Spark partial/final
  * aggregation and DuckDB), and every derived statistic is computed in
  * DOUBLE from those identical operands, so the IEEE op chain matches
  * bit-for-bit cross-engine. Deterministic half-up rounding (Text.hround)
  * absorbs the final-digit ulp.
  */
object Analytics {

  /** Per-group Pearson correlation + OLS slope/intercept of
    * (x = l_quantity, y = l_extendedprice), built from the five mergeable
    * moments (n, Σx, Σy, Σxy, Σx², Σy²) as exact DECIMAL(12,2)-operand
    * sums: ONE partial+final hash aggregation, no second pass, no
    * centering pass — the only correlation formulation that runs at
    * 100 TB without a mean-broadcast round-trip. (Built-in `corr`/
    * `regr_slope` accumulate centered doubles in partition order →
    * cross-engine last-ulp drift; the moment form is order-independent.)
    */
  val corrRegr: QueryDef = QueryDef(
    "corr_regr",
    (s, d) => {
      val x = col("l_quantity").cast("decimal(12,2)")
      val y = col("l_extendedprice").cast("decimal(12,2)")
      val agged = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(x).cast("double").as("sx"),
          sum(y).cast("double").as("sy"),
          sum(x * y).cast("double").as("sxy"),
          sum(x * x).cast("double").as("sxx"),
          sum(y * y).cast("double").as("syy"))
      val covN  = col("n") * col("sxy") - col("sx") * col("sy")
      val varXN = col("n") * col("sxx") - col("sx") * col("sx")
      val varYN = col("n") * col("syy") - col("sy") * col("sy")
      agged.select(col("l_returnflag"),
          col("n").cast("long").as("n"),
          Text.hround(covN / sqrt(varXN * varYN), 6).as("corr_xy"),
          Text.hround(covN / varXN, 6).as("slope"),
          Text.hround((col("sy") - (covN / varXN) * col("sx")) / col("n"), 4)
            .as("intercept"))
        .orderBy(col("l_returnflag"))
    },
    Some {
      val sx  = "CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)"
      val sy  = "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)"
      val sxy = "CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)"
      val sxx = "CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)"
      val syy = "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)"
      s"""
      WITH m AS (
        SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
               $sx AS sx, $sy AS sy, $sxy AS sxy, $sxx AS sxx, $syy AS syy
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, CAST(n AS BIGINT) AS n,
             ${Text.sqlHround("(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))", 6)} AS corr_xy,
             ${Text.sqlHround("(n * sxy - sx * sy) / (n * sxx - sx * sx)", 6)} AS slope,
             ${Text.sqlHround("(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n", 4)} AS intercept
      FROM m ORDER BY 1
      """
    },
    doc = "Pearson corr + OLS fit from exact decimal moments, one agg pass")

  /** Fixed-width histogram of l_extendedprice: 12 buckets of 5000, top
    * bucket open-ended. Bucketing is exact floor arithmetic (no float
    * binning ambiguity), the shape is a single partial+final count agg —
    * the 100 TB histogram plan.
    */
  val histogram: QueryDef = QueryDef(
    "histogram_fixed",
    (s, d) =>
      Tables.lineitem(s, d)
        .withColumn("bucket",
          least(floor(col("l_extendedprice") / lit(5000.0)), lit(11.0))
            .cast("int"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
        .orderBy(col("bucket")),
    Some("""
      SELECT CAST(least(floor(l_extendedprice / 5000.0), 11) AS INTEGER) AS bucket,
             count(*) AS n, min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
      FROM lineitem GROUP BY 1 ORDER BY 1
    """),
    doc = "fixed-width histogram via exact floor bucketing, one agg pass")

  /** Relational INTERSECT / EXCEPT (the set operators the reference
    * emulates with index-mask subtraction): customers ordering in BOTH
    * 1995 and 1996 vs ONLY 1995. Catalyst plans set-ops as aggregated
    * joins on the hashed row — same one-shuffle shape as a distinct.
    */
  val setOps: QueryDef = QueryDef(
    "intersect_except",
    (s, d) => {
      val o = Tables.orders(s, d)
      def custs(yr: Int) = o.filter(year(col("o_orderdate")) === yr)
        .select(col("o_custkey"))
      val both = custs(1995).intersect(custs(1996))
        .select(lit("both").as("mode"), col("o_custkey"))
      val only95 = custs(1995).except(custs(1996))
        .select(lit("only_1995").as("mode"), col("o_custkey"))
      both.unionAll(only95).orderBy(col("mode"), col("o_custkey"))
    },
    Some("""
      WITH c95 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
      c96 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
      u AS (
        SELECT 'both' AS mode, o_custkey FROM (SELECT * FROM c95 INTERSECT SELECT * FROM c96)
        UNION ALL
        SELECT 'only_1995' AS mode, o_custkey FROM (SELECT * FROM c95 EXCEPT SELECT * FROM c96))
      SELECT mode, o_custkey FROM u ORDER BY mode, o_custkey
    """),
    doc = "INTERSECT / EXCEPT set operators (distinct semantics)")

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the join
    * form where NULL keys MATCH each other instead of dropping — the
    * standard trap when an enrichment dimension carries a NULL-keyed
    * default row. Key is nullif(o_orderstatus, 'O'), so a third of the
    * rows carry a genuine NULL key that must land in the default group.
    */
  val nullSafeJoin: QueryDef = QueryDef(
    "nullsafe_join",
    (s, d) => {
      val dim = s.createDataFrame(Seq(
          (Option.empty[String], "open_default"),
          (Some("F"), "finished"),
          (Some("P"), "pending"))).toDF("k", "grp")
      Tables.orders(s, d)
        .withColumn("k", nullif(col("o_orderstatus"), lit("O"))).as("o")
        .join(broadcast(dim.as("dm")), col("o.k") <=> col("dm.k"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("grp"))
    },
    Some("""
      WITH dim(k, grp) AS (VALUES (NULL, 'open_default'), ('F', 'finished'), ('P', 'pending')),
      o AS (SELECT nullif(o_orderstatus, 'O') AS k FROM orders)
      SELECT d.grp, count(*) AS n_orders
      FROM o JOIN dim d ON o.k IS NOT DISTINCT FROM d.k
      GROUP BY 1 ORDER BY 1
    """),
    doc = "null-safe equality join: NULL keys match the NULL dim row")

  /** Funnel conversion — the canonical product-analytics reduction: of the
    * users who signed up, how many made their first purchase AFTER signup,
    * and how many within the 3-day window. Shape: two user-keyed aggs
    * (first signup, first qualifying purchase) joined on user_id — the
    * signup agg's partitioning is REUSED by the join and the purchase agg
    * (one user-key shuffle serves all three), then a single global
    * roll-up. The conversion rate divides the exact counts in double and
    * half-up rounds, so both engines render the identical IEEE quotient.
    */
  val funnel: QueryDef = QueryDef(
    "funnel_conversion",
    (s, d) => {
      val ev = Tables.events(s, d)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(su, Seq("user_id"))
        .filter(col("ts") > col("t0"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"), min(col("t0")).as("t0k"))
      val conv = pu.filter(col("t1") <= col("t0k") + expr("INTERVAL 3 DAYS"))
      su.agg(count(lit(1)).as("n_signup"))
        .crossJoin(broadcast(pu.agg(count(lit(1)).as("n_purchased"))))
        .crossJoin(broadcast(conv.agg(count(lit(1)).as("n_converted_3d"))))
        .select(col("n_signup"), col("n_purchased"), col("n_converted_3d"),
          Text.hround(col("n_converted_3d").cast("double") /
            col("n_signup").cast("double"), 4).as("conv_rate"))
    },
    Some(s"""
      WITH su AS (SELECT user_id, min(ts) AS t0 FROM events
                  WHERE event_type = 'signup' GROUP BY 1),
      pu AS (SELECT e.user_id, min(e.ts) AS t1, min(su.t0) AS t0k
             FROM events e JOIN su USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > su.t0 GROUP BY 1),
      conv AS (SELECT * FROM pu WHERE t1 <= t0k + INTERVAL 3 DAY)
      SELECT (SELECT count(*) FROM su) AS n_signup,
             (SELECT count(*) FROM pu) AS n_purchased,
             (SELECT count(*) FROM conv) AS n_converted_3d,
             ${Text.sqlHround(
               "CAST((SELECT count(*) FROM conv) AS DOUBLE) / (SELECT count(*) FROM su)", 4)}
               AS conv_rate
    """),
    doc = "signup→purchase funnel with a 3-day conversion window, one user-key shuffle")

  /** Cohort retention — users grouped by first-seen period (hour at
    * fixture scale; week in production — constants only), counted as
    * active in each subsequent period offset. The first-seen table is a
    * per-user agg (user-dim scale, far smaller than the event log at
    * 100 TB) joined back to events on user_id, then one (cohort, offset)
    * aggregation with count(DISTINCT user) — the matrix every retention
    * dashboard renders. Offsets capped at 5 to bound the output, not the
    * work.
    */
  val cohortRetention: QueryDef = QueryDef(
    "cohort_retention",
    (s, d) => {
      val ev = Tables.events(s, d)
      val f = ev.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("cohort"))
      ev.select(col("user_id"), date_trunc("hour", col("ts")).as("acth"))
        .join(f, Seq("user_id"))
        .withColumn("offset",
          ((unix_timestamp(col("acth")) - unix_timestamp(col("cohort"))) / 3600L)
            .cast("int"))
        .filter(col("offset").between(0, 5))
        .groupBy(col("cohort"), col("offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort"), col("offset"))
    },
    Some("""
      WITH f AS (SELECT user_id,
                        CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS cohort
                 FROM events GROUP BY 1),
      a AS (SELECT e.user_id, f.cohort,
                   CAST((date_part('epoch', CAST(date_trunc('hour', e.ts) AS TIMESTAMP))
                       - date_part('epoch', f.cohort)) / 3600 AS INTEGER) AS "offset"
            FROM events e JOIN f USING (user_id))
      SELECT cohort, "offset", count(DISTINCT user_id) AS n_users
      FROM a WHERE "offset" BETWEEN 0 AND 5
      GROUP BY 1, 2 ORDER BY 1, 2
    """),
    doc = "first-seen-period cohorts x activity offset, count-distinct retention matrix")

  /** Robust statistics per group — median, MAD (median absolute
    * deviation), IQR, and the classic 1.5×IQR outlier count. Two passes
    * by necessity (MAD needs the median first): pass 1 aggregates the
    * per-group quantiles, pass 2 re-scans with the tiny quantile table
    * broadcast back. Parity discipline: the median/quartiles are ROUNDED
    * (bround 4) before re-entering arithmetic, so |x − med| and the
    * 1.5×IQR threshold compare identical doubles on both engines.
    * `percentile` (Spark) and `quantile_cont` (DuckDB) share linear
    * interpolation — proven in `summary_stats`.
    */
  val robustStats: QueryDef = QueryDef(
    "robust_stats",
    (s, d) => {
      val q = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(bround(expr("percentile(l_extendedprice, 0.5)"), 4).as("med"),
          bround(expr("percentile(l_extendedprice, 0.25)"), 4).as("q25"),
          bround(expr("percentile(l_extendedprice, 0.75)"), 4).as("q75"))
        .withColumn("iqr", col("q75") - col("q25"))
      Tables.lineitem(s, d)
        .join(broadcast(q), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          min(col("med")).as("median"),
          min(col("iqr")).as("iqr"),
          bround(expr("percentile(abs(l_extendedprice - med), 0.5)"), 4)
            .as("mad"),
          sum(when(abs(col("l_extendedprice") - col("med")) >
            lit(1.5) * col("iqr"), 1L).otherwise(0L)).as("n_outliers"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      WITH q AS (
        SELECT l_returnflag,
               round_even(quantile_cont(l_extendedprice, 0.5), 4) AS med,
               round_even(quantile_cont(l_extendedprice, 0.75), 4)
                 - round_even(quantile_cont(l_extendedprice, 0.25), 4) AS iqr
        FROM lineitem GROUP BY 1)
      SELECT l.l_returnflag, count(*) AS n,
             min(q.med) AS median, min(q.iqr) AS iqr,
             round_even(quantile_cont(abs(l.l_extendedprice - q.med), 0.5), 4) AS mad,
             CAST(sum(CASE WHEN abs(l.l_extendedprice - q.med) > 1.5 * q.iqr
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM lineitem l JOIN q USING (l_returnflag)
      GROUP BY 1 ORDER BY 1
    """),
    doc = "median/MAD/IQR + 1.5*IQR outlier count, quantiles broadcast back")

  /** 2-D Pareto skyline (minimize price, maximize size) WITHOUT the
    * O(N²) dominance anti-join: aggregate to one row per distinct price
    * (the first shuffle collapses the corpus), then a single ordered pass
    * keeps prices whose best size strictly beats the running max over all
    * cheaper prices — exactly the dominance rule. The global window runs
    * over the DISTINCT-PRICE table (domain-bounded, not corpus-sized).
    * Ties on (price, size) are all on the frontier (neither strictly
    * dominates), which the equi-join back to parts preserves.
    */
  val skylinePareto: QueryDef = QueryDef(
    "skyline_pareto",
    (s, d) => {
      val dpr = Tables.part(s, d)
        .groupBy(col("p_retailprice").as("price"))
        .agg(max(col("p_size")).as("best"))
      val w = Window.orderBy(col("price"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val frontier = dpr.withColumn("pm", max(col("best")).over(w))
        .filter(col("pm").isNull || col("best") > col("pm"))
      Tables.part(s, d)
        .join(broadcast(frontier),
          col("p_retailprice") === col("price") && col("p_size") === col("best"))
        .select(col("p_partkey"), col("price"), col("p_size").as("sz"))
        .orderBy(col("price"), col("p_partkey"))
    },
    Some("""
      WITH d AS (SELECT p_retailprice AS price, max(p_size) AS best
                 FROM part GROUP BY 1),
      f AS (SELECT price, best,
                   max(best) OVER (ORDER BY price
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
            FROM d)
      SELECT p.p_partkey, f.price, p.p_size AS sz
      FROM part p
      JOIN f ON f.price = p.p_retailprice AND f.best = p.p_size
      WHERE f.pm IS NULL OR f.best > f.pm
      ORDER BY f.price, p.p_partkey
    """),
    doc = "Pareto frontier via distinct-value running max, never all-pairs")

  /** Relational division — "customers whose orders cover EVERY priority
    * class" — the classic operator with no SQL keyword. The scalable
    * formulation: per-customer distinct-coverage count (one shuffle over
    * (custkey, priority) pairs), the divisor cardinality as a one-row
    * aggregate attached in-plan (scalar cross join, broadcast-free),
    * equality filter. Never the textbook double-NOT-EXISTS, which plans
    * as nested correlated anti-joins.
    */
  val relationalDivision: QueryDef = QueryDef(
    "relational_division",
    (s, d) => {
      val o = Tables.orders(s, d)
      val nPri = o.agg(countDistinct(col("o_orderpriority")).as("n_pri"))
      o.groupBy(col("o_custkey"))
        .agg(countDistinct(col("o_orderpriority")).as("n_cov"),
          count(lit(1)).as("n_orders"))
        .crossJoin(nPri) // one-row side: in-plan scalar, no hint needed
        .filter(col("n_cov") === col("n_pri"))
        .select(col("o_custkey"), col("n_orders"))
        .orderBy(col("o_custkey"))
    },
    Some("""
      WITH n AS (SELECT count(DISTINCT o_orderpriority) AS n_pri FROM orders)
      SELECT o_custkey, count(*) AS n_orders
      FROM orders, n
      GROUP BY o_custkey, n.n_pri
      HAVING count(DISTINCT o_orderpriority) = n.n_pri
      ORDER BY o_custkey
    """),
    doc = "relational division: coverage count == divisor count, one shuffle")

  /** The higher-order-function family as explicit API surface —
    * transform / filter / aggregate / exists over an array column, all
    * row-local (zero extra shuffles; codegen'd lambda evaluation, no
    * UDFs). DuckDB mirrors with list_transform / list_filter /
    * list_aggregate semantics via a list comprehension.
    */
  val arrayHof: QueryDef = QueryDef(
    "array_hof_pipeline",
    (s, d) =>
      Tables.documents(s, d)
        // Column-DSL lambdas, not expr(): an expr() string would pass
        // '\\s+' through TWO escape layers (Scala then the SQL parser,
        // which drops unknown backslash escapes) — the DSL hands the
        // regex to split() verbatim
        .select(col("doc_id"),
          filter(split(trim(col("text")), "\\s+"),
            w => length(w) > 3).as("ws"))
        .select(col("doc_id"),
          size(col("ws")).as("n_long_words"),
          aggregate(transform(col("ws"), w => length(w)),
            lit(0), (a, x) => a + x).as("chars_in_long_words"),
          exists(col("ws"), w => length(w) >= 10).as("has_10plus"))
        .orderBy(col("doc_id")),
    Some("""
      WITH w AS (
        SELECT doc_id,
               [x FOR x IN string_split_regex(trim(text), '\s+') IF length(x) > 3] AS ws
        FROM documents)
      SELECT doc_id,
             CAST(length(ws) AS INTEGER) AS n_long_words,
             CAST(coalesce(list_sum([length(x) FOR x IN ws]), 0) AS INTEGER) AS chars_in_long_words,
             coalesce(list_max([length(x) >= 10 FOR x IN ws]), false) AS has_10plus
      FROM w ORDER BY doc_id
    """),
    doc = "array HOFs: filter/transform/aggregate/exists, row-local codegen")

  /** Pearson chi-square test of independence (event_type x user-parity
    * contingency): observed cell counts from ONE groupBy shuffle, then
    * marginals/expecteds via window sums over the |types| x 2 CELL table
    * (the corpus collapsed in the first shuffle — the windows, including
    * the one global-partition window, run over ~10 rows at any data
    * size). Per-cell contributions are quantized to micro-units and
    * summed as integers: a double chi2 sum is summation-order-dependent
    * across engines; the quantized sum is exact and order-free.
    */
  val chiSquare: QueryDef = QueryDef(
    "chi_square_independence",
    (s, d) => {
      val cells = Tables.events(s, d)
        .groupBy(col("event_type"), (col("user_id") % 2).as("grp"))
        .agg(count(lit(1)).as("o"))
      val wr = Window.partitionBy(col("event_type"))
      val wc = Window.partitionBy(col("grp"))
      val wa = Window.partitionBy()
      cells
        .withColumn("rt", sum(col("o")).over(wr))
        .withColumn("ct", sum(col("o")).over(wc))
        .withColumn("n", sum(col("o")).over(wa))
        .withColumn("e", col("rt").cast("double") * col("ct") / col("n"))
        .withColumn("cq",
          floor((col("o") - col("e")) * (col("o") - col("e")) / col("e")
            * lit(1e6) + lit(0.5)).cast("long"))
        .agg(
          (sum(col("cq")).cast("double") / lit(1e6)).as("chi2"),
          ((countDistinct(col("event_type")) - 1) *
            (countDistinct(col("grp")) - 1)).cast("int").as("dof"))
    },
    Some("""
      WITH cells AS (
        SELECT event_type, user_id % 2 AS grp, count(*) AS o
        FROM events GROUP BY 1, 2),
      m AS (
        SELECT event_type, grp, o,
               sum(o) OVER (PARTITION BY event_type) AS rt,
               sum(o) OVER (PARTITION BY grp) AS ct,
               sum(o) OVER () AS n
        FROM cells),
      c AS (SELECT *, CAST(rt AS DOUBLE) * ct / n AS e FROM m)
      SELECT CAST(sum(CAST(floor((o - e) * (o - e) / e * 1e6 + 0.5) AS BIGINT))
                  AS DOUBLE) / 1e6 AS chi2,
             CAST((count(DISTINCT event_type) - 1) *
                  (count(DISTINCT grp) - 1) AS INTEGER) AS dof
      FROM c
    """),
    doc = "chi-square independence: one shuffle to cells, windows over cells only")

  /** Market-basket association mining over order baskets (items = the
    * distinct part BRANDS in one order): pair co-occurrence count,
    * support, and lift per unordered brand pair. The scale-critical
    * choice is the PAIR ENUMERATION: baskets are grouped once per order
    * and pairs expand IN-PLAN from the sorted basket array (the
    * groupBy+pair-expand house shape — no items-side self-join, which
    * would re-execute the item derivation under stacked broadcasts).
    * Per-basket expansion is O(k²) with k bounded by lines-per-order
    * (~7), so the blowup is a small constant × lineitem — at 100 TB the
    * heavy shuffle keys are (order) then (brand,brand), both equi-keyed
    * with map-side combine, and the brand-count dim (≤25 rows) plus the
    * one-row basket total ride as broadcasts (ScaleSpec-intended scalar
    * shape). Parity: support/lift are single IEEE divisions of exact
    * integer operands, hround'd.
    */
  val marketBasket: QueryDef = QueryDef(
    "market_basket_lift",
    (s, d) => {
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand"))
        .distinct()
      val baskets = items.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
      val totals = baskets.agg(count(lit(1)).as("nb"))
      val brandN = items.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_one"))
      val pairs = baskets
        .select(explode(expr(
          "flatten(transform(bs, (x, i) -> transform(" +
            "slice(bs, i + 2, size(bs) - i - 1), y -> " +
            "struct(x AS a, y AS b))))")).as("p"))
        .select(col("p.a").as("brand_a"), col("p.b").as("brand_b"))
        .groupBy(col("brand_a"), col("brand_b"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(brandN.select(col("p_brand").as("brand_a"),
          col("n_one").as("n_a"))), Seq("brand_a"))
        .join(broadcast(brandN.select(col("p_brand").as("brand_b"),
          col("n_one").as("n_b"))), Seq("brand_b"))
        .crossJoin(broadcast(totals))
        .select(col("brand_a"), col("brand_b"), col("n_ab"),
          col("n_a"), col("n_b"),
          Text.hround(col("n_ab").cast("double") / col("nb"), 6)
            .as("support"),
          Text.hround((col("nb") * col("n_ab")).cast("double") /
            (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
        .orderBy(col("brand_a"), col("brand_b"))
    },
    Some(s"""
      WITH items AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      t AS (SELECT count(DISTINCT l_orderkey) AS nb FROM items),
      ba AS (SELECT p_brand, count(*) AS n_one FROM items GROUP BY 1),
      pr AS (
        SELECT i1.p_brand AS brand_a, i2.p_brand AS brand_b,
               count(*) AS n_ab
        FROM items i1 JOIN items i2
          ON i1.l_orderkey = i2.l_orderkey AND i1.p_brand < i2.p_brand
        GROUP BY 1, 2)
      SELECT p.brand_a, p.brand_b, p.n_ab, a.n_one AS n_a, b.n_one AS n_b,
             ${Text.sqlHround("CAST(p.n_ab AS DOUBLE) / t.nb", 6)} AS support,
             ${Text.sqlHround(
        "CAST(t.nb * p.n_ab AS DOUBLE) / CAST(a.n_one * b.n_one AS DOUBLE)",
        6)} AS lift
      FROM pr p
      CROSS JOIN t
      JOIN ba a ON a.p_brand = p.brand_a
      JOIN ba b ON b.p_brand = p.brand_b
      ORDER BY brand_a, brand_b
    """),
    doc = "brand-pair co-occurrence with support/lift; in-plan pair expansion")

  /** Welch's unequal-variance t-test between two deterministic user
    * cohorts (user_id parity — chi_square_independence's split) on
    * purchase value: the A/B-test primitive. ONE partial+final moment
    * aggregation (n, Σx, Σx² as exact decimals per cohort — the
    * corr_regr discipline) then a 2-row pivot; mean/variance/t/df are
    * IEEE chains on identical operands, so the statistic matches DuckDB
    * bit-for-bit before the final hround. At 100 TB this is a single
    * map-side-combining scan — the only shuffle carries 2 rows.
    */
  val abTestWelch: QueryDef = QueryDef(
    "ab_test_welch",
    (s, d) => {
      val dec = col("value").cast("decimal(18,2)")
      val m = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy((col("user_id") % 2).as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(dec).cast("double").as("s1"),
          sum(dec * dec).cast("double").as("s2"))
      val p = m.agg(
        max(when(col("grp") === 0, col("n"))).as("n_a"),
        max(when(col("grp") === 0, col("s1"))).as("s1a"),
        max(when(col("grp") === 0, col("s2"))).as("s2a"),
        max(when(col("grp") === 1, col("n"))).as("n_b"),
        max(when(col("grp") === 1, col("s1"))).as("s1b"),
        max(when(col("grp") === 1, col("s2"))).as("s2b"))
      val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
      val va = (col("s2a") - col("s1a") * col("s1a") / na) / (na - lit(1.0))
      val vb = (col("s2b") - col("s1b") * col("s1b") / nb) / (nb - lit(1.0))
      val se2 = va / na + vb / nb
      p.select(col("n_a"), col("n_b"),
          Text.hround(col("s1a") / na, 4).as("mean_a"),
          Text.hround(col("s1b") / nb, 4).as("mean_b"),
          Text.hround((col("s1a") / na - col("s1b") / nb) / sqrt(se2), 4)
            .as("t_stat"),
          Text.hround(se2 * se2 / ((va / na) * (va / na) / (na - lit(1.0)) +
            (vb / nb) * (vb / nb) / (nb - lit(1.0))), 2).as("dof"))
    },
    Some {
      val na = "CAST(n_a AS DOUBLE)"; val nb = "CAST(n_b AS DOUBLE)"
      val va = s"((s2a - s1a * s1a / $na) / ($na - 1.0))"
      val vb = s"((s2b - s1b * s1b / $nb) / ($nb - 1.0))"
      val se2 = s"($va / $na + $vb / $nb)"
      s"""
      WITH m AS (
        SELECT user_id % 2 AS grp, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
               CAST(sum(CAST(value AS DECIMAL(18,2))
                        * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      p AS (
        SELECT max(CASE WHEN grp = 0 THEN n END) AS n_a,
               max(CASE WHEN grp = 0 THEN s1 END) AS s1a,
               max(CASE WHEN grp = 0 THEN s2 END) AS s2a,
               max(CASE WHEN grp = 1 THEN n END) AS n_b,
               max(CASE WHEN grp = 1 THEN s1 END) AS s1b,
               max(CASE WHEN grp = 1 THEN s2 END) AS s2b
        FROM m)
      SELECT n_a, n_b,
             ${Text.sqlHround(s"s1a / $na", 4)} AS mean_a,
             ${Text.sqlHround(s"s1b / $nb", 4)} AS mean_b,
             ${Text.sqlHround(s"(s1a / $na - s1b / $nb) / sqrt($se2)", 4)}
               AS t_stat,
             ${Text.sqlHround(s"$se2 * $se2 / (($va / $na) * ($va / $na) / ($na - 1.0) + ($vb / $nb) * ($vb / $nb) / ($nb - 1.0))", 2)}
               AS dof
      FROM p
    """
    },
    doc = "Welch unequal-variance t-test from one exact-moment aggregation")

  /** First/last-touch marketing attribution: every purchase credits the
    * user's FIRST and most-RECENT preceding touch event ('click'/'view'),
    * falling back to 'none' when the user converted cold. One per-user
    * ordered window pass (growing frame, ignore-nulls first/last — the
    * forward_fill machinery) carries both touch channels to each
    * conversion row; the credit rollup is then two tiny grouped
    * aggregates full-outer-merged on channel (a channel can be a last
    * touch without ever being a first touch, so neither side's key set
    * covers the other). Revenue credit is an exact decimal sum. At
    * 100 TB: ONE shuffle to user partitions for the window, then
    * ≤|channels| rows — the classic "sessionize then reduce" shape.
    */
  val attributionTouch: QueryDef = QueryDef(
    "attribution_touch",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val touch =
        when(col("event_type").isin("click", "view"), col("event_type"))
      val marked = Tables.events(s, d)
        .withColumn("last_t", last(touch, ignoreNulls = true).over(w))
        .withColumn("first_t", first(touch, ignoreNulls = true).over(w))
      val conv = marked.filter(col("event_type") === "purchase")
        .select(coalesce(col("last_t"), lit("none")).as("ch_last"),
          coalesce(col("first_t"), lit("none")).as("ch_first"),
          col("value"))
      val lastAgg = conv.groupBy(col("ch_last").as("channel"))
        .agg(count(lit(1)).as("n_last"),
          Num.sum2(col("value")).as("rev_last"))
      val firstAgg = conv.groupBy(col("ch_first").as("channel"))
        .agg(count(lit(1)).as("n_first"))
      lastAgg.join(firstAgg, Seq("channel"), "full_outer")
        .select(col("channel"),
          coalesce(col("n_first"), lit(0L)).as("n_first"),
          coalesce(col("n_last"), lit(0L)).as("n_last"),
          coalesce(col("rev_last"), lit(0.0)).as("rev_last"))
        .orderBy(col("channel"))
    },
    Some(s"""
      WITH marked AS (
        SELECT *,
          last_value(CASE WHEN event_type IN ('click', 'view')
                          THEN event_type END IGNORE NULLS) OVER w AS last_t,
          first_value(CASE WHEN event_type IN ('click', 'view')
                           THEN event_type END IGNORE NULLS) OVER w AS first_t
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      conv AS (
        SELECT coalesce(last_t, 'none') AS ch_last,
               coalesce(first_t, 'none') AS ch_first, value
        FROM marked WHERE event_type = 'purchase'),
      la AS (SELECT ch_last AS channel, count(*) AS n_last,
                    ${Num.sqlSum2("value")} AS rev_last
             FROM conv GROUP BY 1),
      fa AS (SELECT ch_first AS channel, count(*) AS n_first
             FROM conv GROUP BY 1)
      SELECT coalesce(la.channel, fa.channel) AS channel,
             coalesce(fa.n_first, 0) AS n_first,
             coalesce(la.n_last, 0) AS n_last,
             coalesce(la.rev_last, 0.0e0) AS rev_last
      FROM la FULL OUTER JOIN fa ON la.channel = fa.channel
      ORDER BY channel
    """),
    doc = "first/last-touch conversion attribution via one ordered window pass")

  /** Mann-Whitney U rank-sum test (the non-parametric sibling of
    * `ab_test_welch`, robust to the heavy-tailed revenue distributions a
    * t-test mishandles) between the same even/odd user split. The engine
    * never ranks ROWS: it aggregates to the DISTINCT-VALUE frame first
    * (one shuffle with map-side combine), and computes midranks from a
    * cumulative count over that frame — 2·midrank = 2·cum_less + t + 1
    * stays an exact integer, so rank sums, U, and the tie-correction term
    * Σ(t³−t) are all exact 64-bit integer aggregates; the ONLY float ops
    * are the final normal approximation (tie-corrected variance) and one
    * sqrt, mirrored operand-for-operand in the oracle before hround. The
    * distinct-value cumsum is a single-partition window over the (already
    * tiny, value-cardinality-sized) aggregate — the documented
    * small-frame-window trade-off (PLANS.md); at true 100 TB cardinality
    * you'd range-partition the cumulative count first.
    */
  val mannWhitneyU: QueryDef = QueryDef(
    "mann_whitney_u",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("grp"), col("value"))
      val byV = ev.groupBy(col("value"))
        .agg(count(lit(1)).as("t"),
          sum(when(col("grp") === 0, 1L).otherwise(0L)).as("t_a"))
      val wLess = Window.orderBy(col("value"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val mr = byV
        .withColumn("mr2",
          lit(2L) * coalesce(sum(col("t")).over(wLess), lit(0L)) +
            col("t") + lit(1L))
      val m = mr.agg(
        sum(col("t_a")).as("n_a"),
        sum(col("t") - col("t_a")).as("n_b"),
        sum(col("t_a") * col("mr2")).as("r2a"),
        sum(col("t") * col("t") * col("t") - col("t")).as("tt"))
      val nA = col("n_a"); val nB = col("n_b"); val n = nA + nB
      val u2 = col("r2a") - nA * (nA + lit(1L))
      val variance = (nA * nB).cast("double") / lit(12.0) *
        ((n + lit(1L)).cast("double") -
          col("tt").cast("double") / (n * (n - lit(1L))).cast("double"))
      m.select(nA, nB,
        (u2.cast("double") / lit(2.0)).as("u_a"),
        Text.hround((u2 - nA * nB).cast("double") /
          (lit(2.0) * sqrt(variance)), 6).as("z6"))
    },
    Some(s"""
      WITH ev AS (SELECT user_id % 2 AS grp, value FROM events
                  WHERE event_type = 'purchase'),
      bv AS (SELECT value, count(*) AS t,
               CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t_a
             FROM ev GROUP BY 1),
      mr AS (SELECT t, t_a,
               2 * coalesce(CAST(sum(t) OVER (ORDER BY value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                 0) + t + 1 AS mr2
             FROM bv),
      m AS (SELECT CAST(sum(t_a) AS BIGINT) AS n_a,
                   CAST(sum(t - t_a) AS BIGINT) AS n_b,
                   CAST(sum(t_a * mr2) AS BIGINT) AS r2a,
                   CAST(sum(t * t * t - t) AS BIGINT) AS tt FROM mr)
      SELECT n_a, n_b,
             CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2e0 AS u_a,
             ${Text.sqlHround(
      "CAST(r2a - n_a * (n_a + 1) - n_a * n_b AS DOUBLE) / " +
        "(2e0 * sqrt(CAST(n_a * n_b AS DOUBLE) / 12e0 * " +
        "(CAST(n_a + n_b + 1 AS DOUBLE) - CAST(tt AS DOUBLE) / " +
        "CAST((n_a + n_b) * (n_a + n_b - 1) AS DOUBLE))))", 6)} AS z6
      FROM m
    """),
    doc = "Mann-Whitney U rank-sum test, tie-corrected, exact-integer midranks")

  /** CUSUM mean-shift changepoint detection (Page 1954) on the daily
    * purchase-revenue series: S_t = Σ_{i≤t}(x_i − x̄) peaks at the point
    * where the series mean shifts, so the argmax |S_t| day is flagged as
    * the changepoint. The whole statistic stays EXACT: daily revenue is
    * an exact decimal sum converted to integer cents, and the mean is
    * never divided out — the engine scales to S_t·n = n·cum_t − t·total
    * (pure 64-bit integers, ≤ ~7e9 at sf0.1), so there is no float
    * anywhere and the argmax flag is an integer comparison; |S| ties
    * flag every tied day identically on both engines. Shape: one
    * corpus-sized aggregate to ≤|days| rows, then windows over that tiny
    * frame only (the trend_seasonal discipline — a global window is fine
    * BECAUSE it runs on the aggregate, never the events).
    */
  val cusumChangepoint: QueryDef = QueryDef(
    "cusum_changepoint",
    (s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_ev"),
          (sum(col("value").cast("decimal(18,2)")) * lit(100))
            .cast("long").as("xc"))
      val wCum = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFull = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      daily
        .withColumn("t", row_number().over(Window.orderBy(col("day"))).cast("long"))
        .withColumn("cum", sum(col("xc")).over(wCum))
        .withColumn("tot", sum(col("xc")).over(wFull))
        .withColumn("nd", count(lit(1)).over(wFull))
        .withColumn("cusum_n", col("nd") * col("cum") - col("t") * col("tot"))
        .withColumn("is_cp",
          abs(col("cusum_n")) === max(abs(col("cusum_n"))).over(wFull))
        .select(col("day"), col("n_ev"), col("xc"), col("cusum_n"),
          col("is_cp"))
        .orderBy(col("day"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n_ev,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS xc
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      c AS (
        SELECT day, n_ev, xc,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
               CAST(sum(xc) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum,
               CAST(sum(xc) OVER () AS BIGINT) AS tot,
               CAST(count(*) OVER () AS BIGINT) AS nd
        FROM daily),
      x AS (SELECT day, n_ev, xc, nd * cum - t * tot AS cusum_n FROM c)
      SELECT day, n_ev, xc, cusum_n,
             abs(cusum_n) = max(abs(cusum_n)) OVER () AS is_cp
      FROM x ORDER BY day
    """),
    doc = "CUSUM mean-shift changepoint on daily revenue (all-integer, argmax flag)")

  /** Autocorrelation function of daily purchase revenue at lags 1..7 —
    * the seasonality detector feeding `trend_seasonal_decompose`'s
    * period choice. De-meaning is kept EXACT by scaling instead of
    * dividing: d_t = n·x_t − T (integer cents·n), so every ACF term is a
    * product of two exact integers; products run in DECIMAL(19,0)² →
    * DECIMAL(38,0) sums (both engines' exact decimal lattice — a double
    * sum would be frame-walk-order-dependent, the Windows.scala rule),
    * and the single float op is the final num/den division under hround.
    * The 7 lags come from ONE ordered window pass (7 lag columns,
    * stacked in-plan) — no series self-join; all windows run over the
    * ≤|days| daily aggregate. The one-row denominator frame rides as a
    * broadcast scalar (ScaleSpec-intended BNLJ).
    */
  val autocorrDaily: QueryDef = QueryDef(
    "autocorr_daily",
    (s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg((sum(col("value").cast("decimal(18,2)")) * lit(100))
          .cast("long").as("xc"))
      val wFull = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val wDay = Window.orderBy(col("day"))
      val dm = daily
        .withColumn("tot", sum(col("xc")).over(wFull))
        .withColumn("nd", count(lit(1)).over(wFull))
        .withColumn("dn", (col("nd") * col("xc") - col("tot"))
          .cast("decimal(19,0)"))
      val den = dm.agg(sum(col("dn") * col("dn")).as("den"))
      val lags = (1 to 7).map(k => lag(col("dn"), k).over(wDay).as(s"l$k"))
      val stacked = dm.select(col("day") +: col("dn") +: lags: _*)
        .select(col("dn"), expr(
          s"stack(7, ${(1 to 7).map(k => s"${k}L, l$k").mkString(", ")}) AS (k, dl)"))
        .filter(col("dl").isNotNull)
      stacked
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("dn") * col("dl")).as("num"))
        .crossJoin(broadcast(den))
        .select(col("k"), col("n_pairs"),
          Text.hround(col("num").cast("double") / col("den").cast("double"), 6)
            .as("acf6"))
        .orderBy(col("k"))
    },
    Some(s"""
      WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS xc
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      c AS (SELECT day, xc,
              CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
              CAST(sum(xc) OVER () AS BIGINT) AS tot,
              CAST(count(*) OVER () AS BIGINT) AS nd
            FROM daily),
      dm AS (SELECT t, CAST(nd * xc - tot AS DECIMAL(19,0)) AS dn FROM c),
      den AS (SELECT sum(dn * dn) AS den FROM dm)
      SELECT k, count(*) AS n_pairs,
             ${Text.sqlHround(
      "CAST(sum(a.dn * b.dn) AS DOUBLE) / CAST(any_value(den.den) AS DOUBLE)",
      6)} AS acf6
      FROM range(1, 8) kk(k), dm a, dm b, den
      WHERE b.t = a.t - kk.k
      GROUP BY k ORDER BY k
    """),
    doc = "daily-revenue ACF lags 1-7 (exact decimal moments, one window pass)")

  /** Benford first-significant-digit conformance test on purchase
    * amounts — the classic fraud/data-quality screen. The digit is
    * extracted EXACTLY: value → integer cents (exact 2-dp decimal cast ×
    * 100), then the first character of the cents' decimal string — no
    * float log10 anywhere near the digit. A 1..9 spine left-join makes
    * absent digits an explicit 0 row. Expected counts n·log10(1+1/d) and
    * the χ² terms are floats from exact integers (operand-mirrored);
    * each digit's χ² contribution is micro-quantized to a long BEFORE
    * the cross-digit total so the 9-term sum is order-free (the
    * Windows.scala double-window-sum rule), and the total rides on every
    * row from a full-frame window over the 9-row spine. Shape: one
    * map-side-combining aggregate to 9 rows; everything after is
    * constant-sized.
    */
  val benfordDigits: QueryDef = QueryDef(
    "benford_digit_test",
    (s, d) => {
      val cents = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select((col("value").cast("decimal(18,2)") * lit(100))
          .cast("long").as("c"))
        .filter(col("c") >= 1L)
      val obs = cents
        .select(substring(col("c").cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("o"))
      val spine = (s.range(1, 10)).select(col("id").cast("int").as("digit"))
      val wFull = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val joined = spine.join(obs, Seq("digit"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
        .withColumn("n", sum(col("o")).over(wFull))
      val e = col("n").cast("double") *
        log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
      val contribU = floor((col("o").cast("double") - e) *
        (col("o").cast("double") - e) / e * lit(1e6) + lit(0.5)).cast("long")
      joined
        .withColumn("e4", Text.hround(e, 4))
        .withColumn("cu", contribU)
        .withColumn("chi2q",
          sum(col("cu")).over(wFull).cast("double") / lit(1e6))
        .select(col("digit"), col("o"), col("e4"), col("chi2q"))
        .orderBy(col("digit"))
    },
    Some(s"""
      WITH cents AS (
        SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM events WHERE event_type = 'purchase'),
      obs AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit,
                     count(*) AS o
              FROM cents WHERE c >= 1 GROUP BY 1),
      sp AS (SELECT CAST(k AS INTEGER) AS digit, coalesce(o, 0) AS o
             FROM range(1, 10) kk(k) LEFT JOIN obs ON obs.digit = kk.k),
      wn AS (SELECT digit, o, CAST(sum(o) OVER () AS BIGINT) AS n FROM sp),
      ct AS (SELECT digit, o, n,
               CAST(n AS DOUBLE) * log10(1e0 + 1e0 / CAST(digit AS DOUBLE)) AS e,
               CAST(floor((CAST(o AS DOUBLE) -
                 CAST(n AS DOUBLE) * log10(1e0 + 1e0 / CAST(digit AS DOUBLE))) *
                 (CAST(o AS DOUBLE) -
                 CAST(n AS DOUBLE) * log10(1e0 + 1e0 / CAST(digit AS DOUBLE))) /
                 (CAST(n AS DOUBLE) * log10(1e0 + 1e0 / CAST(digit AS DOUBLE))) *
                 1000000e0 + 0.5e0) AS BIGINT) AS cu
             FROM wn)
      SELECT digit, o, ${Text.sqlHround("e", 4)} AS e4,
             CAST(CAST(sum(cu) OVER () AS BIGINT) AS DOUBLE) / 1000000e0
               AS chi2q
      FROM ct ORDER BY digit
    """),
    doc = "Benford first-digit chi-square screen (exact digit, micro-quantized terms)")

  /** Join-key skew diagnostics for `l_partkey` — the planning input for
    * salting/AQE-skew decisions (`salted_skew_join`): key count, max and
    * top-1 share, and the Gini coefficient of the per-key count
    * distribution. Never sorts keys: the per-key counts collapse to the
    * COUNT HISTOGRAM (42 distinct counts at sf0.1 vs 20k keys), and the
    * sorted-index Gini formula Σ(2i−n−1)c_i telescopes per histogram run
    * to c·m·(2·i0 + m − 1 − n − 1) — exact 64-bit integers with i0 from
    * a cumulative window over the tiny histogram. Two-level aggregation
    * (fact → key counts → histogram) keeps every shuffle key-bounded;
    * windows touch only the ≤|distinct-counts| frame. Float = the two
    * final ratios under hround.
    */
  val skewProfile: QueryDef = QueryDef(
    "skew_profile",
    (s, d) => {
      val keyCnt = Tables.lineitem(s, d)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      val hist = keyCnt.groupBy(col("cnt")).agg(count(lit(1)).as("m"))
      val wCum = Window.orderBy(col("cnt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wFull = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val runs = hist
        .withColumn("i0", coalesce(sum(col("m")).over(wCum), lit(0L)) + lit(1L))
        .withColumn("nk", sum(col("m")).over(wFull))
        .withColumn("nr", sum(col("cnt") * col("m")).over(wFull))
        .withColumn("gnum",
          col("cnt") * col("m") *
            (lit(2L) * col("i0") + col("m") - lit(1L) - col("nk") - lit(1L)))
      runs.agg(
          max(col("nk")).as("n_keys"), max(col("nr")).as("n_rows"),
          max(col("cnt")).as("max_cnt"),
          sum(col("gnum")).as("gn"))
        .select(col("n_keys"), col("n_rows"), col("max_cnt"),
          Text.hround(col("max_cnt").cast("double") /
            col("n_rows").cast("double"), 6).as("top1_share6"),
          Text.hround(col("gn").cast("double") /
            (col("n_keys") * col("n_rows")).cast("double"), 6).as("gini6"))
    },
    Some(s"""
      WITH kc AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
      hist AS (SELECT cnt, count(*) AS m FROM kc GROUP BY 1),
      runs AS (
        SELECT cnt, m,
               coalesce(CAST(sum(m) OVER (ORDER BY cnt
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                 0) + 1 AS i0,
               CAST(sum(m) OVER () AS BIGINT) AS nk,
               CAST(sum(cnt * m) OVER () AS BIGINT) AS nr
        FROM hist),
      g AS (SELECT nk, nr, cnt,
              cnt * m * (2 * i0 + m - 1 - nk - 1) AS gnum
            FROM runs)
      SELECT max(nk) AS n_keys, max(nr) AS n_rows, max(cnt) AS max_cnt,
             ${Text.sqlHround(
      "CAST(max(cnt) AS DOUBLE) / CAST(max(nr) AS DOUBLE)", 6)}
               AS top1_share6,
             ${Text.sqlHround(
      "CAST(CAST(sum(gnum) AS BIGINT) AS DOUBLE) / " +
        "CAST(max(nk) * max(nr) AS DOUBLE)", 6)} AS gini6
      FROM g
    """),
    doc = "l_partkey skew profile: top-1 share + histogram-telescoped exact Gini")

  /** Sequential-pattern mining: the top-25 event-type TRIGRAMS across
    * user journeys (the order-3 sibling of `markov_transitions`'
    * bigrams — "view>click>purchase" beats any bag-of-events signal for
    * funnel design). Each user's journey is assembled ONCE with the
    * deterministic (ts, event_id) sort inside the grouped collect, and
    * trigram expansion is the doc_chunks transform-over-sequence shape —
    * entirely in-plan, no self-joins, no windows. Per-user journeys are
    * the one genuinely unbounded collect (a power user's events must fit
    * an executor row — same bound `pack_sequences` documents); the
    * trigram aggregate itself is 5³-bounded here and
    * vocabulary-bounded in general. Counts are exact integers; the
    * top-25 cut orders (n DESC, trigram) on both engines.
    */
  val eventTrigrams: QueryDef = QueryDef(
    "event_trigrams",
    (s, d) => {
      val seqs = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))).as("evs"))
        .select(col("user_id"),
          expr("transform(evs, x -> x.event_type)").as("seq"))
        .filter(size(col("seq")) >= 3)
      seqs
        .select(col("user_id"), explode(expr(
          "transform(sequence(1, size(seq) - 2), " +
            "i -> concat_ws('>', slice(seq, i, 3)))")).as("trigram"))
        .groupBy(col("trigram"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("n").desc, col("trigram"))
        .limit(25)
        .orderBy(col("trigram"))
    },
    Some("""
      WITH seqs AS (
        SELECT user_id, list(event_type ORDER BY ts, event_id) AS seq
        FROM events GROUP BY 1),
      tg AS (
        SELECT user_id,
               unnest([array_to_string(seq[i:i+2], '>')
                 FOR i IN generate_series(1, len(seq) - 2)]) AS trigram
        FROM seqs WHERE len(seq) >= 3)
      SELECT trigram, n, n_users FROM (
        SELECT trigram, count(*) AS n, count(DISTINCT user_id) AS n_users
        FROM tg GROUP BY 1
        ORDER BY n DESC, trigram LIMIT 25)
      ORDER BY trigram
    """),
    doc = "top-25 event-type trigrams across user journeys (in-plan expansion)")

  /** Theil-Sen robust trend estimator over the daily revenue series —
    * the median of all pairwise slopes (x_j−x_i)/(j−i), insensitive to
    * the outlier days that wreck OLS (`corr_regr`'s slope). Slopes are
    * doubles computed from identical exact-integer operands on both
    * engines (one correctly-rounded division), so the slope ORDER — and
    * therefore the lower-median pick by row_number — matches
    * cross-engine exactly; ties order by (i, j). The pair expansion is
    * an inequality join between two copies of the ≤|days| aggregate
    * (30 rows → 435 pairs) — an intended broadcast nested-loop on a
    * CONSTANT-sized frame (ScaleSpec-listed), nothing corpus-sized; at
    * a million-point series you would switch to the O(n log n)
    * randomized median-of-slopes selection, which this formulation's
    * sort-and-pick generalizes to.
    */
  val theilSenSlope: QueryDef = QueryDef(
    "theil_sen_slope",
    (s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg((sum(col("value").cast("decimal(18,2)")) * lit(100))
          .cast("long").as("xc"))
        .withColumn("t", row_number().over(Window.orderBy(col("day")))
          .cast("long"))
      val a = daily.select(col("t").as("ta"), col("xc").as("xa"))
      val b = daily.select(col("t").as("tb"), col("xc").as("xb"))
      val pairs = a.join(b, col("tb") > col("ta"))
        .select(col("ta"), col("tb"),
          ((col("xb") - col("xa")).cast("double") /
            (col("tb") - col("ta")).cast("double")).as("slp"))
      val wFull = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      pairs
        .withColumn("rn", row_number()
          .over(Window.orderBy(col("slp"), col("ta"), col("tb"))).cast("long"))
        .withColumn("np", count(lit(1)).over(wFull))
        .filter(col("rn") === expr("(np + 1) div 2"))
        .select(col("np").as("n_pairs"), Text.hround(col("slp"), 6).as("slope6"))
    },
    Some(s"""
      WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS xc
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      c AS (SELECT xc, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
            FROM daily),
      p AS (SELECT a.t AS ta, b.t AS tb,
              CAST(b.xc - a.xc AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slp
            FROM c a, c b WHERE b.t > a.t),
      r AS (SELECT slp,
              CAST(row_number() OVER (ORDER BY slp, ta, tb) AS BIGINT) AS rn,
              CAST(count(*) OVER () AS BIGINT) AS np
            FROM p)
      SELECT np AS n_pairs, ${Text.sqlHround("slp", 6)} AS slope6
      FROM r WHERE rn = (np + 1) // 2
    """),
    doc = "Theil-Sen median-of-slopes robust trend over daily revenue")

  /** Mann-Kendall trend test per event-type daily series — the classic
    * companion to `theil_sen_slope` (the standard pairing in climate
    * trend analysis: MK decides IF a monotonic trend exists, Theil-Sen
    * estimates its magnitude). S = Σ_{i<j} sign(x_j − x_i) over the
    * time-ordered series; the ENTIRE statistic is integer arithmetic
    * here (daily sums as exact integer cents, sign of a LONG
    * difference), so there is zero float-parity surface — ties
    * contribute exactly 0 on both engines. One groupBy collapses days,
    * one collects the bounded series (≤ a few thousand days — the
    * series length is bounded by the calendar, not the corpus, so the
    * per-group array never grows with data volume), and the pairwise
    * sign fold is a row-local codegen'd HOF — no self-join, no
    * pair-expand shuffle. Kendall's tau = S / (n(n-1)/2), half-up 4 dp.
    */
  val mannKendall: QueryDef = QueryDef(
    "mann_kendall_trend",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((sum(col("value").cast("decimal(18,2)")) * lit(100))
          .cast("long").as("xc"))
      daily.groupBy(col("event_type"))
        .agg(expr(
          "transform(array_sort(collect_list(struct(day, xc))), t -> t.xc)")
          .as("vs"))
        .select(col("event_type"),
          size(col("vs")).cast("long").as("n_days"),
          expr("aggregate(flatten(transform(vs, (x, i) -> " +
            "transform(slice(vs, i + 2, size(vs)), " +
            "y -> CAST(sign(y - x) AS BIGINT)))), 0L, (a, sgn) -> a + sgn)")
            .as("s_stat"))
        .withColumn("n_pairs", expr("(n_days * (n_days - 1)) div 2"))
        // a single-day series has zero pairs: 0/0 would surface as NaN on
        // both engines (latent with the current fixtures, which span many
        // days per type) — define tau as NULL there instead
        .withColumn("tau",
          when(col("n_pairs") > 0,
            Text.hround(col("s_stat") / col("n_pairs"), 4))
            .otherwise(lit(null).cast("double")))
        .withColumn("direction",
          when(col("s_stat") > 0, "increasing")
            .when(col("s_stat") < 0, "decreasing").otherwise("none"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS xc
        FROM events GROUP BY 1, 2),
      ser AS (SELECT event_type, list(xc ORDER BY day) AS vs FROM daily GROUP BY 1),
      mk AS (
        SELECT event_type, CAST(len(vs) AS BIGINT) AS n_days,
               CAST(coalesce(list_sum(flatten(list_transform(vs, (x, i) ->
                 list_transform(vs[i+1:], y -> CAST(sign(y - x) AS BIGINT))))), 0)
                 AS BIGINT) AS s_stat
        FROM ser)
      SELECT event_type, n_days, s_stat,
             (n_days * (n_days - 1)) // 2 AS n_pairs,
             CASE WHEN (n_days * (n_days - 1)) // 2 > 0
                  THEN ${Text.sqlHround("s_stat / ((n_days * (n_days - 1)) // 2)", 4)}
                  ELSE CAST(NULL AS DOUBLE) END AS tau,
             CASE WHEN s_stat > 0 THEN 'increasing'
                  WHEN s_stat < 0 THEN 'decreasing' ELSE 'none' END AS direction
      FROM mk ORDER BY event_type
    """),
    doc = "Mann-Kendall monotonic-trend test per series (integer-exact S, Kendall tau)")

  /** Pareto/ABC inventory classification — parts ranked by revenue,
    * classed A while cumulative share ≤ 80%, B to 95%, C beyond (the
    * 80/20 warehouse staple). Revenue is exact integer cents; the class
    * boundary test is the INTEGRAL cross-multiplication cum·100 ≤ tot·80
    * (≈2.3e14 at sf0.1, well inside 64-bit) so no float touches the
    * classification; the only floats are the two reported shares under
    * hround. The cumulative sum runs over the per-part AGGREGATE
    * (key-cardinality-sized, 20k rows at sf0.1 — never the fact table),
    * ordered (revenue DESC, partkey) for a total cross-engine order; at
    * a billion-key catalog this one window is the piece to
    * range-partition, which the classification (a monotone threshold on
    * the cumsum) survives unchanged.
    */
  val paretoAbc: QueryDef = QueryDef(
    "pareto_abc",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) * lit(100))
          .cast("long").as("rc"))
      val wCum = Window.orderBy(col("rc").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFull = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      rev
        .withColumn("cum", sum(col("rc")).over(wCum))
        .withColumn("tot", sum(col("rc")).over(wFull))
        .withColumn("abc_class",
          when(col("cum") * 100 <= col("tot") * 80, "A")
            .when(col("cum") * 100 <= col("tot") * 95, "B")
            .otherwise("C"))
        .groupBy(col("abc_class"))
        .agg(count(lit(1)).as("n_parts"), sum(col("rc")).as("rev_cents"),
          max(col("tot")).as("tot"))
        .select(col("abc_class"), col("n_parts"), col("rev_cents"),
          Text.hround(col("rev_cents").cast("double") /
            col("tot").cast("double"), 6).as("share6"))
        .orderBy(col("abc_class"))
    },
    Some(s"""
      WITH rev AS (
        SELECT l_partkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                 AS rc
        FROM lineitem GROUP BY 1),
      c AS (SELECT l_partkey, rc,
              CAST(sum(rc) OVER (ORDER BY rc DESC, l_partkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS cum,
              CAST(sum(rc) OVER () AS BIGINT) AS tot
            FROM rev),
      k AS (SELECT rc, tot,
              CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                   WHEN cum * 100 <= tot * 95 THEN 'B'
                   ELSE 'C' END AS abc_class
            FROM c)
      SELECT abc_class, count(*) AS n_parts,
             CAST(sum(rc) AS BIGINT) AS rev_cents,
             ${Text.sqlHround(
      "CAST(CAST(sum(rc) AS BIGINT) AS DOUBLE) / CAST(max(tot) AS DOUBLE)", 6)}
               AS share6
      FROM k GROUP BY 1 ORDER BY abc_class
    """),
    doc = "Pareto/ABC revenue classification (integral 80/95 boundaries, exact cents)")

  /** RFM (recency / frequency / monetary) customer segmentation — the
    * CRM staple: per purchasing user, days since last purchase (against
    * the corpus max day, computed in-plan), purchase count, and exact
    * cents spent, each scored into quintiles with ntile(5) so that 5 =
    * best (most recent / most frequent / highest spend). Every input to
    * the scoring is an exact integer, and each ntile ORDER BY ends in
    * the user_id tiebreak so bucket assignment is total-order
    * deterministic cross-engine (ntile's n/k±1 bucket-size rule is the
    * same SQL semantics in both engines). The quintile windows run over
    * the per-USER aggregate (150 → 15k rows at the fixture SFs, never
    * events); at a billion-user table each global ntile is the
    * documented range-partition point — the same trade `pareto_abc`
    * carries.
    */
  val rfmSegmentation: QueryDef = QueryDef(
    "rfm_segmentation",
    (s, d) => {
      val wFull = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(to_date(col("ts"))).as("last_day"),
          count(lit(1)).as("n_purch"),
          (sum(col("value").cast("decimal(18,2)")) * lit(100))
            .cast("long").as("cents"))
        .withColumn("recency_days",
          datediff(max(col("last_day")).over(wFull), col("last_day"))
            .cast("long"))
        .withColumn("r_score",
          ntile(5).over(Window.orderBy(col("recency_days").desc,
            col("user_id"))))
        .withColumn("f_score",
          ntile(5).over(Window.orderBy(col("n_purch").asc, col("user_id"))))
        .withColumn("m_score",
          ntile(5).over(Window.orderBy(col("cents").asc, col("user_id"))))
        .select(col("user_id"), col("recency_days"), col("n_purch"),
          col("cents"), col("r_score"), col("f_score"), col("m_score"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH p AS (
        SELECT user_id, max(CAST(date_trunc('day', ts) AS DATE)) AS last_day,
               count(*) AS n_purch,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      r AS (
        SELECT user_id,
               CAST(date_diff('day', last_day, max(last_day) OVER ())
                 AS BIGINT) AS recency_days,
               n_purch, cents
        FROM p)
      SELECT user_id, recency_days, n_purch, cents,
             CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id)
               AS INTEGER) AS r_score,
             CAST(ntile(5) OVER (ORDER BY n_purch ASC, user_id)
               AS INTEGER) AS f_score,
             CAST(ntile(5) OVER (ORDER BY cents ASC, user_id)
               AS INTEGER) AS m_score
      FROM r ORDER BY user_id
    """),
    doc = "RFM quintile segmentation over the per-user purchase aggregate")

  /** Chi-square post-hoc cell diagnosis — `chi_square_independence`
    * says WHETHER the contingency table deviates; this says WHERE:
    * per-cell expected counts and Haberman adjusted standardized
    * residuals (o−e)/√(e·(1−rt/n)·(1−ct/n)), the quantity that is
    * ~N(0,1) under independence so |res| > 2 flags the driving cells.
    * Same shape as the parent test: one shuffle to the contingency
    * cells, windows over the ≤|types|×|groups| cell frame only; the
    * residual is an IEEE chain on exact integer marginals mirrored
    * operand-for-operand, under hround.
    */
  val chiSquareResiduals: QueryDef = QueryDef(
    "chi_square_residuals",
    (s, d) => {
      val cells = Tables.events(s, d)
        .groupBy(col("event_type"), (col("user_id") % 2).as("grp"))
        .agg(count(lit(1)).as("o"))
      val wr = Window.partitionBy(col("event_type"))
      val wc = Window.partitionBy(col("grp"))
      val wa = Window.partitionBy()
      cells
        .withColumn("rt", sum(col("o")).over(wr))
        .withColumn("ct", sum(col("o")).over(wc))
        .withColumn("n", sum(col("o")).over(wa))
        .withColumn("e", col("rt").cast("double") * col("ct") / col("n"))
        .select(col("event_type"), col("grp"), col("o"),
          Text.hround(col("e"), 4).as("e4"),
          Text.hround((col("o") - col("e")) /
            sqrt(col("e") *
              (lit(1.0) - col("rt").cast("double") / col("n")) *
              (lit(1.0) - col("ct").cast("double") / col("n"))), 4)
            .as("std_res4"))
        .orderBy(col("event_type"), col("grp"))
    },
    Some(s"""
      WITH cells AS (
        SELECT event_type, user_id % 2 AS grp, count(*) AS o
        FROM events GROUP BY 1, 2),
      m AS (
        SELECT event_type, grp, o,
               sum(o) OVER (PARTITION BY event_type) AS rt,
               sum(o) OVER (PARTITION BY grp) AS ct,
               sum(o) OVER () AS n
        FROM cells),
      c AS (SELECT *, CAST(rt AS DOUBLE) * ct / n AS e FROM m)
      SELECT event_type, grp, o,
             ${Text.sqlHround("e", 4)} AS e4,
             ${Text.sqlHround(
      "(o - e) / sqrt(e * (1e0 - CAST(rt AS DOUBLE) / n) * " +
        "(1e0 - CAST(ct AS DOUBLE) / n))", 4)} AS std_res4
      FROM c ORDER BY event_type, grp
    """),
    doc = "chi-square adjusted standardized residuals per contingency cell")

  /** Forecast-accuracy scorecard for the 4-lag halving-kernel EWMA
    * one-step-ahead forecast of daily revenue — the backtest every
    * forecasting deployment needs. The forecast f_t = (8x_{t-1} +
    * 4x_{t-2} + 2x_{t-3} + x_{t-4})/15 is kept RATIONAL: err·15 =
    * 15·x_t − (8l1+4l2+2l3+l4) is an exact 64-bit integer in cents, so
    * MAE and WAPE reduce to exact integer sums with one final division
    * chain; sMAPE's per-day term is irreducibly float, so each term is
    * micro-quantized to a long before the cross-day mean (the
    * order-free-sum discipline). Scoring windows run over the ≤|days|
    * daily aggregate; days without the full 4-lag history are excluded
    * on both engines.
    */
  val forecastAccuracy: QueryDef = QueryDef(
    "forecast_accuracy",
    (s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg((sum(col("value").cast("decimal(18,2)")) * lit(100))
          .cast("long").as("xc"))
      val w = Window.orderBy(col("day"))
      val withLags = (1 to 4).foldLeft(daily) { (df, k) =>
        df.withColumn(s"l$k", lag(col("xc"), k).over(w))
      }
      val f15 = lit(8L) * col("l1") + lit(4L) * col("l2") +
        lit(2L) * col("l3") + col("l4")
      val scored = withLags.filter(col("l4").isNotNull)
        .withColumn("err15", lit(15L) * col("xc") - f15)
        .withColumn("smq",
          floor(lit(2.0) * abs(col("err15")).cast("double") /
            (lit(15.0) * col("xc").cast("double") + f15.cast("double")) *
            lit(1e6) + lit(0.5)).cast("long"))
      scored.agg(
          count(lit(1)).as("n_days"),
          sum(abs(col("err15"))).as("sae15"),
          sum(col("xc")).as("sx"),
          sum(col("smq")).as("ssmq"))
        .select(col("n_days"),
          Text.hround(col("sae15").cast("double") / lit(15.0) /
            col("n_days").cast("double") / lit(100.0), 2).as("mae2"),
          Text.hround(col("sae15").cast("double") /
            (lit(15.0) * col("sx").cast("double")), 6).as("wape6"),
          (col("ssmq").cast("double") / col("n_days").cast("double") /
            lit(1e6)).as("smape_q"))
    },
    Some(s"""
      WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS xc
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      lg AS (SELECT day, xc,
               lag(xc, 1) OVER (ORDER BY day) AS l1,
               lag(xc, 2) OVER (ORDER BY day) AS l2,
               lag(xc, 3) OVER (ORDER BY day) AS l3,
               lag(xc, 4) OVER (ORDER BY day) AS l4
             FROM daily),
      sc AS (SELECT xc,
               15 * xc - (8 * l1 + 4 * l2 + 2 * l3 + l4) AS err15,
               8 * l1 + 4 * l2 + 2 * l3 + l4 AS f15
             FROM lg WHERE l4 IS NOT NULL),
      q AS (SELECT xc, err15,
              CAST(floor(2e0 * CAST(abs(err15) AS DOUBLE) /
                (15e0 * CAST(xc AS DOUBLE) + CAST(f15 AS DOUBLE)) *
                1000000e0 + 0.5e0) AS BIGINT) AS smq
            FROM sc)
      SELECT count(*) AS n_days,
             ${Text.sqlHround(
      "CAST(CAST(sum(abs(err15)) AS BIGINT) AS DOUBLE) / 15e0 / " +
        "CAST(count(*) AS DOUBLE) / 100e0", 2)} AS mae2,
             ${Text.sqlHround(
      "CAST(CAST(sum(abs(err15)) AS BIGINT) AS DOUBLE) / " +
        "(15e0 * CAST(CAST(sum(xc) AS BIGINT) AS DOUBLE))", 6)} AS wape6,
             CAST(CAST(sum(smq) AS BIGINT) AS DOUBLE) /
               CAST(count(*) AS DOUBLE) / 1000000e0 AS smape_q
      FROM q
    """),
    doc = "EWMA one-step-ahead backtest: exact-integer MAE/WAPE, micro-quantized sMAPE")

  /** Time-bounded funnel — `funnel_conversion` with a deadline: a user
    * converts only if the first click lands within 24h of their FIRST
    * view, and the first purchase within 24h of that click (the
    * attribution-window semantics ad platforms bill on; the unbounded
    * funnel overstates conversion). Three chained per-user min
    * aggregates, each an equi-join on user_id with the deadline as a
    * residual interval test — never a window over raw events and never
    * a time cross product; the final scorecard is one count row. All
    * comparisons are exact timestamp arithmetic (ts + INTERVAL 24H on
    * both engines); counts exact, rates hround'd.
    */
  val funnelWindow: QueryDef = QueryDef(
    "funnel_window",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("tv"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("tv") &&
          col("ts") <= col("tv") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("tc"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts") > col("tc") &&
          col("ts") <= col("tc") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("tp"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .agg(count(col("tv")).as("n_view"),
          count(col("tc")).as("n_click_24h"),
          count(col("tp")).as("n_purch_24h"))
        .select(col("n_view"), col("n_click_24h"), col("n_purch_24h"),
          Text.hround(col("n_click_24h") / col("n_view"), 4).as("view_click4"),
          Text.hround(col("n_purch_24h") / col("n_click_24h"), 4)
            .as("click_purch4"))
    },
    Some(s"""
      WITH v AS (SELECT user_id, min(ts) AS tv FROM events
                 WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(e.ts) AS tc
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > v.tv
              AND e.ts <= v.tv + INTERVAL 24 HOUR
            GROUP BY 1),
      p AS (SELECT e.user_id, min(e.ts) AS tp
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.tc
              AND e.ts <= c.tc + INTERVAL 24 HOUR
            GROUP BY 1),
      j AS (SELECT v.user_id, v.tv, c.tc, p.tp
            FROM v LEFT JOIN c ON c.user_id = v.user_id
            LEFT JOIN p ON p.user_id = v.user_id)
      SELECT count(tv) AS n_view, count(tc) AS n_click_24h,
             count(tp) AS n_purch_24h,
             ${Text.sqlHround("count(tc) / count(tv)", 4)} AS view_click4,
             ${Text.sqlHround("count(tp) / count(tc)", 4)} AS click_purch4
      FROM j
    """),
    doc = "24h-deadline funnel: chained per-user min joins, one scorecard row")

  /** Linear multi-touch attribution — every touch before a conversion
    * shares the credit equally (first/last-touch's fairer sibling). The
    * scalable trick: the per-purchase channel credit is
    * cum_clicks/(cum_clicks+cum_views) from RUNNING per-channel counts
    * in the same ordered window pass `attribution_touch` uses — never a
    * purchase×touch pair expansion (events² per user at worst). Each
    * purchase's two channel credits are micro-quantized to longs before
    * the cross-purchase sum (the order-free discipline; credits are
    * ratios of exact integer counts), and cold conversions (no touches)
    * fall into an explicit 'none' bucket. One user-key shuffle, then a
    * ≤|channels|-row aggregate.
    */
  val attributionLinear: QueryDef = QueryDef(
    "attribution_linear",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val marked = Tables.events(s, d)
        .withColumn("nc", coalesce(sum(
          when(col("event_type") === "click", 1L).otherwise(0L)).over(w),
          lit(0L)))
        .withColumn("nv", coalesce(sum(
          when(col("event_type") === "view", 1L).otherwise(0L)).over(w),
          lit(0L)))
      val conv = marked.filter(col("event_type") === "purchase")
        .withColumn("nt", col("nc") + col("nv"))
      def credit(cnt: org.apache.spark.sql.Column) =
        floor(cnt.cast("double") / col("nt").cast("double") * lit(1e6) +
          lit(0.5)).cast("long")
      val touchedIn = conv.filter(col("nt") > 0)
        .withColumn("cq", credit(col("nc")))
        .withColumn("vq", credit(col("nv")))
        .select(explode(expr("array(" +
          "struct('click' AS channel, cq AS cu), " +
          "struct('view' AS channel, vq AS cu))")).as("e"))
        .select(col("e.channel").as("channel"), col("e.cu").as("cu"))
      val cold = conv.filter(col("nt") === 0)
        .select(lit("none").as("channel"), lit(1000000L).as("cu"))
      touchedIn.unionByName(cold)
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touched"), sum(col("cu")).as("scu"))
        .select(col("channel"), col("n_touched"),
          (col("scu").cast("double") / lit(1e6)).as("credit_q"))
        .orderBy(col("channel"))
    },
    Some("""
      WITH marked AS (
        SELECT *,
          coalesce(CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            OVER w AS BIGINT), 0) AS nc,
          coalesce(CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            OVER w AS BIGINT), 0) AS nv
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      conv AS (SELECT nc, nv, nc + nv AS nt FROM marked
               WHERE event_type = 'purchase'),
      t AS (
        SELECT 'click' AS channel,
               CAST(floor(CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE) * 1000000e0
                 + 0.5e0) AS BIGINT) AS cu
        FROM conv WHERE nt > 0
        UNION ALL
        SELECT 'view',
               CAST(floor(CAST(nv AS DOUBLE) / CAST(nt AS DOUBLE) * 1000000e0
                 + 0.5e0) AS BIGINT)
        FROM conv WHERE nt > 0
        UNION ALL
        SELECT 'none', 1000000 FROM conv WHERE nt = 0)
      SELECT channel, count(*) AS n_touched,
             CAST(CAST(sum(cu) AS BIGINT) AS DOUBLE) / 1000000e0 AS credit_q
      FROM t GROUP BY 1 ORDER BY channel
    """),
    doc = "linear multi-touch attribution from running channel counts (no pair expand)")

  /** Deterministic subsample (block-bootstrap-style) confidence interval
    * for mean purchase value: purchases split into 10 disjoint
    * hash-buckets (the sampling family's deterministic id-hash — a
    * reproducible stand-in for random resampling), per-bucket means from
    * exact integer cents, and the CI from the spread of bucket means
    * (mean ± 2·sd/√10). Each bucket mean is micro-quantized to a long
    * BEFORE any cross-bucket aggregation, so the 10-term sums (and the
    * variance numerator, exact integer squares ≤ ~1e17) are order-free
    * integers; the only floats are the final scale-back and one sqrt
    * under hround. Shape: one map-side-combining shuffle to 10 rows,
    * then constant-size math — the cheapest possible uncertainty
    * estimate at any scale.
    */
  val subsampleCi: QueryDef = QueryDef(
    "subsample_ci",
    (s, d) => {
      val b = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy((expr(
          "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) " +
            "AS BIGINT)") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"),
          (sum(col("value").cast("decimal(18,2)")) * lit(100))
            .cast("long").as("c"))
        .select(col("bucket"),
          floor(col("c").cast("double") / col("n").cast("double") *
            lit(1e4) + lit(0.5)).cast("long").as("mq"))
      val agg = b.agg(count(lit(1)).as("k"), sum(col("mq")).as("smq"),
        sum(col("mq") * col("mq")).as("smq2"))
      val kd = col("k").cast("double")
      val mean = col("smq").cast("double") / kd
      val varN = (col("k") * col("smq2") - col("smq") * col("smq")).cast("double") /
        (kd * (kd - lit(1.0)))
      agg.select(col("k").as("n_buckets"),
        Text.hround(mean / lit(1e4), 4).as("mean_cents4"),
        Text.hround((mean - lit(2.0) * sqrt(varN) / sqrt(kd)) / lit(1e4), 4)
          .as("ci_lo4"),
        Text.hround((mean + lit(2.0) * sqrt(varN) / sqrt(kd)) / lit(1e4), 4)
          .as("ci_hi4"))
    },
    Some(s"""
      WITH b AS (
        SELECT CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                 AS UBIGINT)::BIGINT % 10 AS bucket,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS c
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      q AS (SELECT bucket,
              CAST(floor(CAST(c AS DOUBLE) / CAST(n AS DOUBLE) * 10000e0
                + 0.5e0) AS BIGINT) AS mq
            FROM b),
      m AS (SELECT count(*) AS k, CAST(sum(mq) AS BIGINT) AS smq,
              CAST(sum(mq * mq) AS BIGINT) AS smq2 FROM q)
      SELECT k AS n_buckets,
             ${Text.sqlHround(
      "CAST(smq AS DOUBLE) / CAST(k AS DOUBLE) / 10000e0", 4)} AS mean_cents4,
             ${Text.sqlHround(
      "(CAST(smq AS DOUBLE) / CAST(k AS DOUBLE) - 2e0 * " +
        "sqrt(CAST(k * smq2 - smq * smq AS DOUBLE) / " +
        "(CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0))) / " +
        "sqrt(CAST(k AS DOUBLE))) / 10000e0", 4)} AS ci_lo4,
             ${Text.sqlHround(
      "(CAST(smq AS DOUBLE) / CAST(k AS DOUBLE) + 2e0 * " +
        "sqrt(CAST(k * smq2 - smq * smq AS DOUBLE) / " +
        "(CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0))) / " +
        "sqrt(CAST(k AS DOUBLE))) / 10000e0", 4)} AS ci_hi4
      FROM m
    """),
    doc = "deterministic 10-bucket subsample CI for mean purchase (micro-quantized)")

  /** CUPED variance-reduced A/B readout (Deng et al. 2013, "Improving
    * the sensitivity of online controlled experiments"): each user's
    * experiment-period spend y (days 16+) is adjusted by their
    * PRE-period spend x (days 1-15), y* = y − θ(x − x̄) with θ =
    * cov(x,y)/var(x) — the industry-standard trick that shrinks arm
    * variance without biasing the diff. Everything upstream of θ is
    * exact: per-user x/y are conditional integer-cents sums from ONE
    * user-keyed pass, and all five pooled moments (n, Σx, Σy, Σxy, Σx²)
    * are exact 64-bit sums (user cents ~1e5, xy « 2^63). θ and the
    * per-arm adjusted means are mirrored float chains under hround. The
    * one-row moment frame rides as a broadcast scalar
    * (ScaleSpec-intended); arms aggregate |users|-keyed then 2 rows.
    */
  val cupedAdjustedAb: QueryDef = QueryDef(
    "cuped_adjusted_ab",
    (s, d) => {
      val u = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(
          coalesce((sum(when(to_date(col("ts")) < lit("2024-01-16").cast("date"),
            col("value")).otherwise(lit(null)).cast("decimal(18,2)")) * lit(100))
            .cast("long"), lit(0L)).as("x"),
          coalesce((sum(when(to_date(col("ts")) >= lit("2024-01-16").cast("date"),
            col("value")).otherwise(lit(null)).cast("decimal(18,2)")) * lit(100))
            .cast("long"), lit(0L)).as("y"))
        .withColumn("grp", (col("user_id") % 2).cast("int"))
      val mom = u.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      val theta = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
      val xbar = col("sx").cast("double") / col("n").cast("double")
      u.groupBy(col("grp"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("x")).as("sxa"), sum(col("y")).as("sya"))
        .crossJoin(broadcast(mom))
        .select(col("grp"), col("n_users"),
          Text.hround(col("sya").cast("double") /
            col("n_users").cast("double") / lit(100.0), 4).as("mean_y4"),
          Text.hround((col("sya").cast("double") / col("n_users").cast("double") -
            theta * (col("sxa").cast("double") / col("n_users").cast("double") -
              xbar)) / lit(100.0), 4).as("mean_adj4"),
          Text.hround(theta, 6).as("theta6"))
        .orderBy(col("grp"))
    },
    Some(s"""
      WITH u AS (
        SELECT user_id,
               coalesce(CAST(sum(CAST(value AS DECIMAL(18,2)))
                 FILTER (CAST(date_trunc('day', ts) AS DATE) < DATE '2024-01-16')
                 * 100 AS BIGINT), 0) AS x,
               coalesce(CAST(sum(CAST(value AS DECIMAL(18,2)))
                 FILTER (CAST(date_trunc('day', ts) AS DATE) >= DATE '2024-01-16')
                 * 100 AS BIGINT), 0) AS y,
               CAST(user_id % 2 AS INTEGER) AS grp
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      mom AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx FROM u),
      arms AS (SELECT grp, count(*) AS n_users,
                 CAST(sum(x) AS BIGINT) AS sxa,
                 CAST(sum(y) AS BIGINT) AS sya
               FROM u GROUP BY 1)
      SELECT grp, n_users,
             ${Text.sqlHround(
      "CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE) / 100e0", 4)} AS mean_y4,
             ${Text.sqlHround(
      "(CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE) - " +
        "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)" +
        " * (CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE) - " +
        "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 100e0", 4)} AS mean_adj4,
             ${Text.sqlHround(
      "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)",
      6)} AS theta6
      FROM arms, mom ORDER BY grp
    """),
    doc = "CUPED variance-reduced A/B means (exact moments, one-row broadcast)")

  /** Exact audience overlap between event types — the segment-overlap
    * matrix ad/analytics products ship ("how many clickers also
    * purchase"): per unordered type pair, the intersection, each side's
    * audience, and the audience Jaccard. The (type, user) DISTINCT
    * frame self-joins on user_id — per-user fanout is bounded by
    * |types|² (25 here), NEVER user², so at 100 TB this is one distinct
    * aggregate plus a user-keyed equi-join with constant fanout (the
    * source_similarity shape on the user axis). Counts exact; one
    * hround ratio.
    */
  val audienceOverlap: QueryDef = QueryDef(
    "audience_overlap",
    (s, d) => {
      val tu = Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
      val aud = tu.groupBy(col("event_type")).agg(count(lit(1)).as("n_aud"))
      tu.select(col("user_id"), col("event_type").as("ta"))
        .join(tu.select(col("user_id"), col("event_type").as("tb")),
          Seq("user_id"))
        .filter(col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb"))
        .agg(count(lit(1)).as("n_both"))
        .join(broadcast(aud.select(col("event_type").as("ta"),
          col("n_aud").as("n_a"))), Seq("ta"))
        .join(broadcast(aud.select(col("event_type").as("tb"),
          col("n_aud").as("n_b"))), Seq("tb"))
        .select(col("ta"), col("tb"), col("n_a"), col("n_b"), col("n_both"),
          Text.hround(col("n_both").cast("double") /
            (col("n_a") + col("n_b") - col("n_both")).cast("double"), 6)
            .as("jaccard6"))
        .orderBy(col("ta"), col("tb"))
    },
    Some(s"""
      WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
      aud AS (SELECT event_type, count(*) AS n_aud FROM tu GROUP BY 1),
      pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n_both
        FROM tu a JOIN tu b ON a.user_id = b.user_id
          AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT ta, tb, na.n_aud AS n_a, nb.n_aud AS n_b, n_both,
             ${Text.sqlHround(
      "CAST(n_both AS DOUBLE) / CAST(na.n_aud + nb.n_aud - n_both AS DOUBLE)",
      6)} AS jaccard6
      FROM pairs
      JOIN aud na ON na.event_type = pairs.ta
      JOIN aud nb ON nb.event_type = pairs.tb
      ORDER BY ta, tb
    """),
    doc = "audience Jaccard per event-type pair (user-keyed join, |types|^2 fanout)")

  /** Kaplan-Meier survival curve for time-to-first-purchase with right
    * censoring — the estimator that handles "hasn't converted YET"
    * correctly where a naive mean drops censored users. Durations are
    * exact day counts (first purchase − first seen; non-converters
    * censored at the corpus horizon); the risk set n(k) is a suffix
    * cumulative count over the ≤|days| duration histogram, and the
    * product Π(1 − d_i/n_i) runs in LOG space with per-step micro-
    * quantization (ln of an exact integer ratio → long; cumulative sum
    * over the tiny ordered frame; exp back under hround) — the
    * order-free float discipline. The one duration where everyone
    * remaining converts (d = n) pins S = 0 explicitly rather than
    * ln(0). Shape: one user aggregate, one histogram, windows over
    * ≤|durations| rows.
    */
  val kaplanMeier: QueryDef = QueryDef(
    "kaplan_meier",
    (s, d) => {
      val u = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("first_day"),
          min(when(col("event_type") === "purchase", to_date(col("ts"))))
            .as("conv_day"),
          max(to_date(col("ts"))).as("last_day"))
      val horizon = u.agg(max(col("last_day")).as("hday"))
      val durs = u.crossJoin(broadcast(horizon))
        .select(
          when(col("conv_day").isNotNull,
            datediff(col("conv_day"), col("first_day")))
            .otherwise(datediff(col("hday"), col("first_day")))
            .cast("long").as("dur"),
          when(col("conv_day").isNotNull, 1L).otherwise(0L).as("ev"))
      val hist = durs.groupBy(col("dur"))
        .agg(count(lit(1)).as("n_at"), sum(col("ev")).as("d_ev"))
      val wSuffix = Window.orderBy(col("dur"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val wCum = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("n_risk", sum(col("n_at")).over(wSuffix))
        .withColumn("lu", when(col("d_ev") < col("n_risk"),
          floor(log(lit(1.0) - col("d_ev").cast("double") /
            col("n_risk").cast("double")) * lit(1e6) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)))
        .withColumn("slu", sum(col("lu")).over(wCum))
        .withColumn("dead", max(when(col("d_ev") === col("n_risk"), 1L)
          .otherwise(0L)).over(wCum))
        .select(col("dur"), col("n_risk"), col("d_ev"),
          when(col("dead") === 1L, lit(0.0)).otherwise(
            Text.hround(exp(col("slu").cast("double") / lit(1e6)), 6))
            .as("s6"))
        .orderBy(col("dur"))
    },
    Some(s"""
      WITH u AS (
        SELECT user_id,
               min(CAST(date_trunc('day', ts) AS DATE)) AS first_day,
               min(CASE WHEN event_type = 'purchase'
                   THEN CAST(date_trunc('day', ts) AS DATE) END) AS conv_day,
               max(CAST(date_trunc('day', ts) AS DATE)) AS last_day
        FROM events GROUP BY 1),
      h AS (SELECT max(last_day) AS hday FROM u),
      durs AS (
        SELECT CASE WHEN conv_day IS NOT NULL
                 THEN CAST(date_diff('day', first_day, conv_day) AS BIGINT)
                 ELSE CAST(date_diff('day', first_day, hday) AS BIGINT) END
                 AS dur,
               CASE WHEN conv_day IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM u, h),
      hist AS (SELECT dur, count(*) AS n_at, CAST(sum(ev) AS BIGINT) AS d_ev
               FROM durs GROUP BY 1),
      r AS (SELECT dur, d_ev,
              CAST(sum(n_at) OVER (ORDER BY dur
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
                AS n_risk
            FROM hist),
      l AS (SELECT dur, n_risk, d_ev,
              CASE WHEN d_ev < n_risk
                THEN CAST(floor(ln(1e0 - CAST(d_ev AS DOUBLE) /
                  CAST(n_risk AS DOUBLE)) * 1000000e0 + 0.5e0) AS BIGINT)
                ELSE 0 END AS lu
            FROM r),
      c AS (SELECT dur, n_risk, d_ev,
              CAST(sum(lu) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS slu,
              max(CASE WHEN d_ev = n_risk THEN 1 ELSE 0 END)
                OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS dead
            FROM l)
      SELECT dur, n_risk, d_ev,
             CASE WHEN dead = 1 THEN 0.0e0
                  ELSE ${Text.sqlHround(
      "exp(CAST(slu AS DOUBLE) / 1000000e0)", 6)} END AS s6
      FROM c ORDER BY dur
    """),
    doc = "Kaplan-Meier time-to-first-purchase with censoring (log-space micro-sums)")

  /** Spearman rank correlation between document length (n_chars) and
    * whitespace token count — EXACT even under ties: both variables get
    * 2×midranks from their value-count frames (the mann_whitney_u
    * construction, so rank sums never touch a row sort), and Spearman is
    * then Pearson over exact integer midranks — five exact 64-bit
    * moments ((2n)²·n « 2^63 at every fixture SF) and one float chain
    * under hround. Shape: two tiny value-count frames with cumulative
    * windows, two value-keyed join-backs, one moment aggregate. The
    * distinct-value cumsums are the documented small-frame global
    * windows.
    */
  val rankCorrelation: QueryDef = QueryDef(
    "rank_correlation",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars").as("x"),
          size(Text.words(col("text"))).cast("long").as("y"))
      def mr2(df: org.apache.spark.sql.DataFrame, v: String) = {
        val byV = df.groupBy(col(v)).agg(count(lit(1)).as("t"))
        val w = Window.orderBy(col(v))
          .rowsBetween(Window.unboundedPreceding, -1)
        byV.withColumn("mr2",
          lit(2L) * coalesce(sum(col("t")).over(w), lit(0L)) +
            col("t") + lit(1L))
          .select(col(v), col("mr2"))
      }
      val ranked = docs
        .join(mr2(docs, "x").withColumnRenamed("mr2", "rx"), Seq("x"))
        .join(mr2(docs, "y").withColumnRenamed("mr2", "ry"), Seq("y"))
      val m = ranked.agg(count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"))
      m.select(col("n").as("n_docs"),
        Text.hround(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double")) *
              sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                .cast("double"))), 6).as("spearman6"))
    },
    Some(s"""
      WITH docs AS (
        SELECT doc_id, n_chars AS x,
               CAST(len(${Text.sqlWords("text")}) AS BIGINT) AS y
        FROM documents),
      rxv AS (SELECT x, 2 * coalesce(CAST(sum(t) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                0) + t + 1 AS rx
              FROM (SELECT x, count(*) AS t FROM docs GROUP BY 1)),
      ryv AS (SELECT y, 2 * coalesce(CAST(sum(t) OVER (ORDER BY y
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                0) + t + 1 AS ry
              FROM (SELECT y, count(*) AS t FROM docs GROUP BY 1)),
      r AS (SELECT rx, ry FROM docs JOIN rxv USING (x) JOIN ryv USING (y)),
      m AS (SELECT count(*) AS n, CAST(sum(rx) AS BIGINT) AS sx,
              CAST(sum(ry) AS BIGINT) AS sy,
              CAST(sum(rx * ry) AS BIGINT) AS sxy,
              CAST(sum(rx * rx) AS BIGINT) AS sxx,
              CAST(sum(ry * ry) AS BIGINT) AS syy FROM r)
      SELECT n AS n_docs,
             ${Text.sqlHround(
      "CAST(n * sxy - sx * sy AS DOUBLE) / " +
        "(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * " +
        "sqrt(CAST(n * syy - sy * sy AS DOUBLE)))", 6)} AS spearman6
      FROM m
    """),
    doc = "exact tie-aware Spearman (midranks from value counts, integer moments)")

  /** Mutual-information feature ranking against the `lang` label — the
    * feature-selection pass before training a cheap classifier: for
    * each candidate feature (source, a 100-char length bucket, a
    * 20-token count bucket), I(F; lang) = Σ p(f,l)·log2(p(f,l)/(p(f)p(l)))
    * over the (feature, lang) contingency cells. Every probability is a
    * ratio of exact integer counts (c·N and cf·cl ≤ ~2.5e7, double-
    * exact), each cell's term is micro-quantized to a long before the
    * per-feature sum (order-free), and marginals come from windows over
    * the tiny cell frame — one grouped count per feature, zero joins.
    * Higher MI = the feature explains more of the label.
    */
  val featureInfoGain: QueryDef = QueryDef(
    "feature_info_gain",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("lang"), col("source"), col("n_chars"),
          size(Text.words(col("text"))).cast("long").as("toks"))
      def mi(name: String, f: org.apache.spark.sql.Column) = {
        val wf = Window.partitionBy(col("fv"))
        val wl = Window.partitionBy(col("lang"))
        val wa = Window.partitionBy()
        docs.groupBy(f.cast("string").as("fv"), col("lang"))
          .agg(count(lit(1)).as("c"))
          .withColumn("cf", sum(col("c")).over(wf))
          .withColumn("cl", sum(col("c")).over(wl))
          .withColumn("n", sum(col("c")).over(wa))
          .withColumn("mu",
            floor(col("c").cast("double") / col("n").cast("double") *
              log2((col("c") * col("n")).cast("double") /
                (col("cf") * col("cl")).cast("double")) * lit(1e6) +
              lit(0.5)).cast("long"))
          .agg(count(lit(1)).as("n_cells"), sum(col("mu")).as("smu"))
          .select(lit(name).as("feature"), col("n_cells"),
            (col("smu").cast("double") / lit(1e6)).as("mi_q"))
      }
      mi("len_bucket", expr("n_chars div 100"))
        .unionByName(mi("source", col("source")))
        .unionByName(mi("tok_bucket", expr("toks div 20")))
        .orderBy(col("feature"))
    },
    Some(s"""
      WITH docs AS (
        SELECT lang, source, n_chars,
               CAST(len(${Text.sqlWords("text")}) AS BIGINT) AS toks
        FROM documents),
      feats AS (
        SELECT 'len_bucket' AS feature, CAST(n_chars // 100 AS VARCHAR) AS fv,
               lang FROM docs
        UNION ALL
        SELECT 'source', source, lang FROM docs
        UNION ALL
        SELECT 'tok_bucket', CAST(toks // 20 AS VARCHAR), lang FROM docs),
      cells AS (SELECT feature, fv, lang, count(*) AS c
                FROM feats GROUP BY 1, 2, 3),
      m AS (SELECT feature, c,
              CAST(sum(c) OVER (PARTITION BY feature, fv) AS BIGINT) AS cf,
              CAST(sum(c) OVER (PARTITION BY feature, lang) AS BIGINT) AS cl,
              CAST(sum(c) OVER (PARTITION BY feature) AS BIGINT) AS n
            FROM cells),
      q AS (SELECT feature,
              CAST(floor(CAST(c AS DOUBLE) / CAST(n AS DOUBLE) *
                log2(CAST(c * n AS DOUBLE) / CAST(cf * cl AS DOUBLE)) *
                1000000e0 + 0.5e0) AS BIGINT) AS mu
            FROM m)
      SELECT feature, count(*) AS n_cells,
             CAST(CAST(sum(mu) AS BIGINT) AS DOUBLE) / 1000000e0 AS mi_q
      FROM q GROUP BY feature ORDER BY feature
    """),
    doc = "mutual information of 3 features vs lang (micro-quantized cell terms)")

  /** Popularity-recommender backtest — the cold-start baseline every
    * recsys ships first, evaluated with a TIME split (train on orders
    * before 1999, test after; random splits leak future popularity):
    * recommend the train-period top-10 revenue brands to everyone, and
    * measure the fraction of test-period customers who actually bought
    * a recommended brand (hit-rate@10). The top-10 comes from one
    * aggregate + TakeOrdered and is BROADCAST into a semi-join against
    * the test purchases — at 100 TB the eval is one fact pass per
    * period with a 10-row build side. Counts exact; one hround rate.
    */
  val popularityHitRate: QueryDef = QueryDef(
    "popularity_hit_rate",
    (s, d) => {
      val cut = lit("1999-01-01 00:00:00").cast("timestamp")
      val fact = Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
      val top10 = fact.filter(col("o_orderdate") < cut)
        .groupBy(col("p_brand"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
        .orderBy(col("rev").desc, col("p_brand"))
        .limit(10)
        .select(col("p_brand"))
      val testCust = fact.filter(col("o_orderdate") >= cut)
        .select(col("o_custkey"), col("p_brand"))
      val hits = testCust.join(broadcast(top10), Seq("p_brand"), "left_semi")
        .select(col("o_custkey")).distinct()
      val all_ = testCust.select(col("o_custkey")).distinct()
      all_.join(hits.withColumn("hit", lit(1)), Seq("o_custkey"), "left")
        .agg(count(lit(1)).as("n_test_customers"),
          count(col("hit")).as("n_hit"))
        .select(col("n_test_customers"), col("n_hit"),
          Text.hround(col("n_hit") / col("n_test_customers"), 6)
            .as("hit_rate6"))
    },
    Some(s"""
      WITH fact AS (
        SELECT o.o_custkey, o.o_orderdate, p.p_brand, l.l_extendedprice
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey),
      top10 AS (
        SELECT p_brand FROM (
          SELECT p_brand, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
          FROM fact WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
          GROUP BY 1 ORDER BY rev DESC, p_brand LIMIT 10)),
      test AS (SELECT DISTINCT o_custkey FROM fact
               WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'),
      hits AS (SELECT DISTINCT f.o_custkey
               FROM fact f JOIN top10 t ON f.p_brand = t.p_brand
               WHERE f.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      SELECT count(*) AS n_test_customers,
             CAST(count(h.o_custkey) AS BIGINT) AS n_hit,
             ${Text.sqlHround(
      "count(h.o_custkey) / count(*)", 6)} AS hit_rate6
      FROM test LEFT JOIN hits h ON h.o_custkey = test.o_custkey
    """),
    doc = "top-10-brand popularity recommender hit-rate on a time split")

  /** k-anonymity / l-diversity audit — the privacy-governance gate a
    * training-data pipeline runs before release: group the table by its
    * quasi-identifier combination (nation, market segment, account-balance
    * band — the attributes an attacker could link externally) and report
    * the table's k (smallest equivalence class), the class count, how many
    * classes fall under the k=3 disclosure threshold, the rows exposed in
    * them, and the minimum l-diversity of a sensitive attribute (is the
    * account in debt) across classes. One exact groupBy + one global
    * aggregate — at 100 TB it is a single shuffle on the quasi-id tuple
    * with partial aggregation, and the summary is a one-row reduce. The
    * k=3 threshold discriminates at the gate SFs (simulated across ALL
    * band widths before tuning, per the round-4 rule: at the 500-unit
    * balance band, 1099/1147 classes violate at sf0.01 and 244/2732 at
    * sf0.1 — both sides comfortably populated; the round-9 verdict
    * flagged the earlier 1000-unit band's 4/1375 as near-vacuous at
    * sf0.1. At sf0.001 every class violates under ANY quasi-id split
    * dense enough to discriminate at the larger SFs — 500 customers
    * across 125+ classes — so the small-SF gate's signal is k/l/count
    * values, not the violation split; no single banding can populate
    * both sides at a 100× density range).
    */
  val kAnonymity: QueryDef = QueryDef(
    "k_anonymity",
    (s, d) => {
      val cls = Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / lit(500)).as("bal_band"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("c_acctbal") < 0).as("ndv_sens"))
      cls.agg(
        min(col("cnt")).as("k_anonymity"),
        count(lit(1)).as("n_classes"),
        sum(when(col("cnt") < 3, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("cnt") < 3, col("cnt")).otherwise(0L)).as("rows_at_risk"),
        min(col("ndv_sens")).as("l_diversity"))
    },
    Some("""
      WITH cls AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 500) AS BIGINT) AS bal_band,
               count(*) AS cnt,
               CAST(count(DISTINCT c_acctbal < 0) AS BIGINT) AS ndv_sens
        FROM customer GROUP BY 1, 2, 3)
      SELECT min(cnt) AS k_anonymity,
             count(*) AS n_classes,
             CAST(sum(CASE WHEN cnt < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
             CAST(sum(CASE WHEN cnt < 3 THEN cnt ELSE 0 END) AS BIGINT) AS rows_at_risk,
             min(ndv_sens) AS l_diversity
      FROM cls
    """),
    doc = "k-anonymity / l-diversity privacy audit over quasi-identifier classes")

  /** Randomized-response differential privacy — the local-DP release
    * primitive (Warner 1965; the RAPPOR core): each document reports its
    * sensitive bit (lang = 'en') TRUTHFULLY with probability p = 3/4 and
    * INVERTED otherwise, giving every individual report ε = ln(p/(1−p))
    * = ln 3 local DP; the per-source true count is then debiased from
    * the noisy tally as T̂ = (obs − (1−p)·n)/(2p−1) = (4·obs − n)/2.
    * The coin is the DETERMINISTIC h32('rr1-' ‖ doc_id) % 4 < 3 —
    * seeded-hash randomness, the only kind an exact cross-engine oracle
    * can check (both engines flip identical coins; the ESTIMATOR's
    * unbiasedness is what the query demonstrates: est_en tracks true_en
    * within ~±2σ = ±√n at every SF). Everything is exact integer
    * arithmetic until one final division by 2e0 (halves are exactly
    * representable — no rounding discipline needed, unlike the ln-based
    * Laplace mechanism, whose libm ulp drift is the round-10
    * curation_pipeline bug class; the geometric/Laplace variant is the
    * production path for counts ≫ per-user sensitivity, and swaps in
    * without changing the plan). Plan: one row-local projection + one
    * groupBy(source) with map-side combine — the same single-shuffle
    * shape as any grouped count at 100 TB; true_en rides along only to
    * exhibit estimator error and would be DROPPED from a real release.
    */
  val dpRandomizedResponse: QueryDef = QueryDef(
    "dp_randomized_response",
    (s, d) => {
      val b = when(col("lang") === "en", 1L).otherwise(0L)
      val c1 = Text.h32(concat(lit("rr1-"), col("doc_id").cast("string"))) % 4
      Tables.documents(s, d)
        .select(col("source"), b.as("b"),
          when(c1 < 3, b).otherwise(lit(1L) - b).as("obs"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("obs")).as("rr_yes"),
          sum(col("b")).as("true_en"))
        .withColumn("est_en",
          (lit(4L) * col("rr_yes") - col("n_docs")) / lit(2.0))
        .select(col("source"), col("n_docs"), col("rr_yes"),
          col("true_en"), col("est_en"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH d AS (
        SELECT source,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS b,
               ${Text.sqlH32("'rr1-' || CAST(doc_id AS VARCHAR)")} % 4 AS c1
        FROM documents)
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN c1 < 3 THEN b ELSE 1 - b END) AS BIGINT)
               AS rr_yes,
             CAST(sum(b) AS BIGINT) AS true_en,
             CAST(4 * sum(CASE WHEN c1 < 3 THEN b ELSE 1 - b END)
                  - count(*) AS DOUBLE) / 2.0 AS est_en
      FROM d GROUP BY 1 ORDER BY 1
    """),
    doc = "Warner randomized-response local-DP release with debiased estimator")

  /** Laplace-mechanism DP histogram (ε = 1, sensitivity 1) over the
    * event-type counts — the CENTRAL-DP release beside
    * [[dpRandomizedResponse]]'s local mechanism. Noise is DETERMINISTIC
    * seeded Laplace (the only kind an exact oracle can check): a 20-bit
    * uniform from the corpus-shared h32 of the salted group key, mapped
    * through the inverse Laplace CDF −sgn(u−½)·ln(1−2|u−½|). Both
    * engines evaluate the IDENTICAL float expression on identical
    * operands (the holt_linear IEEE-chain argument); the true count
    * rides along as the test artifact that certifies the debias (a real
    * release would drop it). One map-side-combined aggregate; noise is
    * a per-GROUP expression, never per-row work.
    */
  val dpLaplaceHistogram: QueryDef = QueryDef(
    "dp_laplace_histogram",
    (s, d) => {
      val u = (Text.h32(concat(lit("lap-"), col("event_type"))) % 1048576L
        + lit(0.5)) / lit(1048576.0)
      val v = u - lit(0.5)
      val sgn = when(v < 0, lit(-1.0)).otherwise(lit(1.0))
      val lap = lit(-1.0) * sgn * log(lit(1.0) - lit(2.0) * abs(v))
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_true"))
        .select(col("event_type"), col("n_true"),
          Text.hround(lap, 4).as("noise4"),
          Text.hround(col("n_true").cast("double") + lap, 4).as("noisy4"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
                 FROM events GROUP BY 1),
      n AS (SELECT event_type, n_true,
              (${Text.sqlH32("'lap-' || event_type")} % 1048576 + 0.5e0)
                / 1048576e0 - 0.5e0 AS v
            FROM c)
      SELECT event_type, n_true,
             ${Text.sqlHround(
        "-1e0 * (CASE WHEN v < 0 THEN -1e0 ELSE 1e0 END) " +
          "* ln(1e0 - 2e0 * abs(v))", 4)} AS noise4,
             ${Text.sqlHround(
        "CAST(n_true AS DOUBLE) + -1e0 * " +
          "(CASE WHEN v < 0 THEN -1e0 ELSE 1e0 END) " +
          "* ln(1e0 - 2e0 * abs(v))", 4)} AS noisy4
      FROM n ORDER BY event_type
    """),
    doc = "Laplace-mechanism DP histogram (ε=1) with seeded inverse-CDF noise, exact-parity")

  /** Population Stability Index per event type — THE ml-ops drift gate
    * (is this week's value distribution still the one the model saw?):
    * decile edges fitted on the REFERENCE half (first half of the time
    * range), both halves binned against those same edges, PSI =
    * Σ (p−q)·ln(p/q) over the 10 bins. Time split at the exact integer
    * micros midpoint (one-row frame broadcast — scalar-subquery shape,
    * ScaleSpec `intended`); decile edges are per-type percentile
    * aggregates bround(4)-stabilized (the robust_stats contract) and
    * broadcast back, so binning is one codegen'd comparison chain — two
    * corpus passes total (edges, then binning+counts), no window. Parity:
    * p and q are integer-count divisions (identical operands), each
    * nonneg PSI term is floor-quantized to 1e-9 fixed point BEFORE the
    * final sum (order-free BIGINT addition across partitions — the zipf
    * discipline), and zero-count bins clamp fractions at 1e-4 (the
    * standard PSI floor) so ln never sees 0 on either engine.
    */
  val psiValueDrift: QueryDef = QueryDef(
    "psi_value_drift",
    (s, d) => {
      val ev0 = Tables.events(s, d)
        .select(col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
      val mid = ev0.agg(
        expr("(min(us) + max(us)) div 2").as("m"))
      val ev = ev0.crossJoin(broadcast(mid))
        .withColumn("is_ref", col("us") <= col("m"))
        .select(col("event_type"), col("value"), col("is_ref"))
      val es = (1 to 9).map(i =>
        bround(expr(s"percentile(value, 0.$i)"), 4).as(s"e$i"))
      val edges = ev.filter(col("is_ref"))
        .groupBy(col("event_type"))
        .agg(es.head, es.tail: _*)
      val binExpr = (1 to 9).map(i =>
        when(col("value") > col(s"e$i"), 1).otherwise(0))
        .foldLeft(lit(1))(_ + _)
      val cnt = ev.join(broadcast(edges), Seq("event_type"))
        .withColumn("bin", binExpr)
        .groupBy(col("event_type"), col("bin"))
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("cr"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cc"))
      val tot = cnt.groupBy(col("event_type"))
        .agg(sum(col("cr")).as("tr"), sum(col("cc")).as("tc"))
      val p = greatest(col("cr").cast("double") / col("tr"), lit(1e-4))
      val q = greatest(col("cc").cast("double") / col("tc"), lit(1e-4))
      cnt.join(broadcast(tot), Seq("event_type"))
        .withColumn("t9",
          floor((p - q) * log(p / q) * lit(1e9) + lit(0.5)).cast("long"))
        .groupBy(col("event_type"))
        .agg(min(col("tr")).as("n_ref"), min(col("tc")).as("n_cur"),
          sum(col("t9")).as("s9"))
        .select(col("event_type"), col("n_ref"), col("n_cur"),
          Text.hround(col("s9").cast("double") / lit(1e9), 6).as("psi6"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH mid AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS m
                   FROM events),
      ev AS (SELECT event_type, value,
               epoch_us(ts) <= (SELECT m FROM mid) AS is_ref FROM events),
      edges AS (SELECT event_type,
          ${(1 to 9).map(i =>
        s"round_even(quantile_cont(value, 0.$i), 4) AS e$i").mkString(", ")}
        FROM ev WHERE is_ref GROUP BY 1),
      binned AS (SELECT v.event_type, v.is_ref,
          1 ${(1 to 9).map(i =>
        s"+ CAST(v.value > e.e$i AS INT)").mkString(" ")} AS bin
        FROM ev v JOIN edges e USING (event_type)),
      cnt AS (SELECT event_type, bin,
                CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cr,
                CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cc
              FROM binned GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(sum(cr) AS BIGINT) AS tr,
                CAST(sum(cc) AS BIGINT) AS tc FROM cnt GROUP BY 1),
      qt AS (SELECT c.event_type, t.tr, t.tc,
               CAST(floor((greatest(CAST(c.cr AS DOUBLE) / t.tr, 1e-4)
                           - greatest(CAST(c.cc AS DOUBLE) / t.tc, 1e-4))
                 * ln(greatest(CAST(c.cr AS DOUBLE) / t.tr, 1e-4)
                      / greatest(CAST(c.cc AS DOUBLE) / t.tc, 1e-4))
                 * 1e9 + 0.5) AS BIGINT) AS t9
             FROM cnt c JOIN tot t USING (event_type))
      SELECT event_type, min(tr) AS n_ref, min(tc) AS n_cur,
             ${Text.sqlHround("CAST(sum(t9) AS BIGINT) / 1e9", 6)} AS psi6
      FROM qt GROUP BY 1 ORDER BY 1
    """),
    doc = "PSI value-drift per type: decile bins from the reference half, exact terms")

  /** Kolmogorov-Smirnov two-sample test between the even/odd-user purchase
    * splits — the distribution-shape sibling of `mann_whitney_u` (which only
    * sees location shifts; KS reacts to any ECDF divergence, the test a
    * data-drift monitor wants beside `psi_value_drift`'s binned
    * approximation). Same discipline as mann_whitney_u: aggregate to the
    * DISTINCT-VALUE frame first (one map-side-combined shuffle), then
    * D = max |F_a − F_b| is computed on the EXACT-integer numerator
    * |fa·n_b − fb·n_a| (cumulative counts × opposite totals — sup of an
    * order-independent integer set), with the only float ops being the two
    * final divisions and one sqrt on identical operands in both engines.
    * The distinct-value cumsum is a single-partition window over the
    * value-cardinality frame — the documented small-frame trade-off
    * (PLANS.md); at 100 TB cardinality you'd range-partition it first.
    * Output: split sizes, D (6 dp) and the scaled statistic
    * D·sqrt(n_a·n_b/(n_a+n_b)) (6 dp; ≥ ~1.36 rejects at α=0.05).
    */
  /** The even/odd-user purchase-value split both KS queries test. */
  private[graft] def ksSplit(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).as("grp"), col("value"))

  /** Exact two-sample KS core: one row (n_a, n_b, dnum) with the
    * integer sup-gap numerator max|fa·n_b − fb·n_a| over the
    * distinct-value frame (shared by ks_two_sample and the sketch
    * twin's certification leg).
    */
  private[graft] def ksExact(ev: DataFrame): DataFrame = {
    val byV = ev.groupBy(col("value"))
      .agg(sum(when(col("grp") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("cb"))
    val wCum = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byV
      .select(
        sum(col("ca")).over(wCum).as("fa"),
        sum(col("cb")).over(wCum).as("fb"),
        sum(col("ca")).over(wAll).as("na"),
        sum(col("cb")).over(wAll).as("nb"))
      .agg(max(abs(col("fa") * col("nb") - col("fb") * col("na")))
          .as("dnum"),
        max(col("na")).as("n_a"), max(col("nb")).as("n_b"))
  }

  val ksTwoSample: QueryDef = QueryDef(
    "ks_two_sample",
    (s, d) => {
      val m = ksExact(ksSplit(s, d))
      val dD = col("dnum").cast("double") /
        (col("n_a") * col("n_b")).cast("double")
      m.select(col("n_a"), col("n_b"),
        Text.hround(dD, 6).as("d6"),
        Text.hround(dD * sqrt((col("n_a") * col("n_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double")), 6).as("ks6"))
    },
    Some(s"""
      WITH ev AS (SELECT user_id % 2 AS grp, value
                  FROM events WHERE event_type = 'purchase'),
      byv AS (SELECT value,
                CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
              FROM ev GROUP BY 1),
      cum AS (SELECT
                CAST(sum(ca) OVER w AS BIGINT) AS fa,
                CAST(sum(cb) OVER w AS BIGINT) AS fb,
                CAST(sum(ca) OVER () AS BIGINT) AS na,
                CAST(sum(cb) OVER () AS BIGINT) AS nb
              FROM byv
              WINDOW w AS (ORDER BY value
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      m AS (SELECT CAST(max(abs(fa * nb - fb * na)) AS BIGINT) AS dnum,
                   max(na) AS n_a, max(nb) AS n_b FROM cum)
      SELECT n_a, n_b,
             ${Text.sqlHround(
        "CAST(dnum AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)", 6)} AS d6,
             ${Text.sqlHround(
        "CAST(dnum AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) * " +
          "sqrt(CAST(n_a * n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))",
        6)} AS ks6
      FROM m
    """),
    doc = "two-sample KS test: exact-integer ECDF sup-gap on the distinct-value frame")

  /** KS drift from two KLL SKETCHES — `ks_two_sample`'s single-pass
    * scale path and the drift-monitor composition the mergeable rank
    * sketch exists for: at 100 TB the monitor never re-scans history;
    * it keeps one KllSummary per side (per day/shard, merged via
    * KllMerge) and compares CDFs sketch-to-sketch. D_sketch is the same
    * exact-integer sup-gap machinery as the exact query, run over the
    * two summaries' (value, weight) items (≤ ~1k rows per side — the
    * union window is sketch-sized, not data-sized); the KLL rank
    * certificate makes each sketch CDF uniformly within
    * ε = (err + maxw)/n of its true ECDF, so
    * |D_sketch − D_exact| ≤ ε_a + ε_b — emitted as the hash-checked
    * `within_sketch_eps` contract (oracle recomputes D_exact and emits
    * literal TRUE, the approx_count_distinct treatment: the sketch
    * internals are engine-side, the BOUND is the cross-engine claim).
    * The exact leg (one corpus pass) exists here only to certify; the
    * production monitor ships the sketch leg alone. k=256/floor=64
    * forces real compaction (err > 0) from sf0.01 up, so the bound is
    * exercised, not vacuous exactness.
    */
  val ksSketchDrift: QueryDef = QueryDef(
    "ks_sketch_drift",
    (s, d) => {
      val ev = ksSplit(s, d)
      val kll = udaf(new graft.functions.KllSketch(256, 64),
        org.apache.spark.sql.Encoders.scalaDouble)
      val sk = ev.groupBy(col("grp")).agg(kll(col("value")).as("sk"))
      // Aggregate merged sketch items PER DISTINCT VALUE before the
      // cumulative window (mirroring ksExact's byV): a value present in
      // BOTH sketches must contribute both weights at once, or the sup
      // gets evaluated at the mixed point F_a(v) vs F_b(v-) — inflating
      // D_sketch by sketch-b's jump at v, which the emitted eps_a+eps_b
      // certificate does NOT cover (spurious within_sketch_eps=false on
      // tied-value data).
      val items = sk.select(col("grp"),
          posexplode(arrays_zip(col("sk.vs"), col("sk.ws"))))
        .select(col("grp"),
          col("col.vs").as("v"), col("col.ws").as("w"))
        .groupBy(col("v"))
        .agg(sum(when(col("grp") === 0, col("w")).otherwise(0L)).as("wa"),
          sum(when(col("grp") === 1, col("w")).otherwise(0L)).as("wb"))
      val wCum = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val mSk = items
        .select(sum(col("wa")).over(wCum).as("fa"),
          sum(col("wb")).over(wCum).as("fb"),
          sum(col("wa")).over(wAll).as("na"),
          sum(col("wb")).over(wAll).as("nb"))
        .agg(max(abs(col("fa") * col("nb") - col("fb") * col("na")))
            .as("dnum_sk"),
          max(col("na")).as("na"), max(col("nb")).as("nb"))
      val eps = sk.agg(
        max(when(col("grp") === 0,
          (col("sk.err") + col("sk.maxw")).cast("double") / col("sk.n")))
          .as("eps_a"),
        max(when(col("grp") === 1,
          (col("sk.err") + col("sk.maxw")).cast("double") / col("sk.n")))
          .as("eps_b"))
      val m = ksExact(ev)
      val dExact = col("dnum").cast("double") /
        (col("n_a") * col("n_b")).cast("double")
      val dSk = col("dnum_sk").cast("double") /
        (col("na") * col("nb")).cast("double")
      m.crossJoin(broadcast(mSk)).crossJoin(broadcast(eps))
        .select(col("n_a"), col("n_b"),
          Text.hround(dExact, 6).as("d_exact6"),
          (abs(dSk - dExact) <= col("eps_a") + col("eps_b"))
            .as("within_sketch_eps"))
    },
    Some(s"""
      WITH ev AS (SELECT user_id % 2 AS grp, value
                  FROM events WHERE event_type = 'purchase'),
      byv AS (SELECT value,
                CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
              FROM ev GROUP BY 1),
      cum AS (SELECT
                CAST(sum(ca) OVER w AS BIGINT) AS fa,
                CAST(sum(cb) OVER w AS BIGINT) AS fb,
                CAST(sum(ca) OVER () AS BIGINT) AS na,
                CAST(sum(cb) OVER () AS BIGINT) AS nb
              FROM byv
              WINDOW w AS (ORDER BY value
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      m AS (SELECT CAST(max(abs(fa * nb - fb * na)) AS BIGINT) AS dnum,
                   max(na) AS n_a, max(nb) AS n_b FROM cum)
      SELECT n_a, n_b,
             ${Text.sqlHround(
        "CAST(dnum AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)", 6)} AS d_exact6,
             TRUE AS within_sketch_eps
      FROM m
    """),
    doc = "KS drift from two KLL sketches: certified |D_sketch - D_exact| <= eps_a + eps_b")

  /** Holt's linear (double-exponential) smoothing per nation over the
    * monthly revenue series — the trend-aware sibling of `ewma_smooth`
    * (level only) and `trend_seasonal_decompose` (fixed season):
    * l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1}),
    * b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}, init l_1 = x_1,
    * b_1 = x_2 − x_1; report the final level/trend and the 3-step-ahead
    * forecast l_T + 3·b_T. The recursion is inherently sequential, so it
    * runs as ONE codegen'd `aggregate` fold per nation over the
    * (ym-sorted) bounded monthly series — a per-group array never longer
    * than the calendar, after the fact table has already collapsed to
    * the |nation|×|month| aggregate (the only corpus-sized work). Parity
    * is the deterministic-IEEE-chain argument: both engines execute the
    * IDENTICAL float expression tree in the identical sequential order
    * on identical inputs (exact-decimal month sums cast to double), so
    * every intermediate is bit-equal; the DuckDB side replays the
    * recurrence as a recursive CTE stepping the month index — an
    * independent implementation of the same machine (the cep_funnel
    * oracle discipline). Smoothing constants are e-notation literals in
    * both engines (3e-1 …) — plain 0.3 parses as DECIMAL in both SQL
    * dialects and drags the whole chain into decimal math.
    */
  /** Shared Holt fold: per nation, the final (t, l, b, x1, sae, sape, n)
    * state of the sequential recurrence over the ym-sorted monthly
    * revenue series — consumed by [[holtLinear]] (level/trend/forecast)
    * and [[holtBacktest]] (the rolling 1-step error accumulators sae =
    * Σ|l+b − x| and sape = Σ|err|/x, counted from t = 3 where the
    * forecast uses no lookahead). One frame, two registered views.
    */
  private def holtFoldFrame(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("int").as("ym"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1.0) - col("l_discount")).cast("decimal(8,2)"))
        .cast("double").as("x"))
    rev.groupBy(col("n_name"))
      .agg(sort_array(collect_list(struct(col("ym"), col("x")))).as("ser"))
      .filter(size(col("ser")) >= 2)
      .select(col("n_name"), size(col("ser")).as("n_months"),
        expr("""aggregate(ser,
          named_struct('t', 0, 'l', CAST(0 AS DOUBLE),
                       'b', CAST(0 AS DOUBLE), 'x1', CAST(0 AS DOUBLE),
                       'sae', CAST(0 AS DOUBLE), 'sape', CAST(0 AS DOUBLE),
                       'n', 0),
          (acc, e) -> CASE
            WHEN acc.t = 0 THEN
              named_struct('t', 1, 'l', e.x, 'b', CAST(0 AS DOUBLE),
                           'x1', e.x, 'sae', CAST(0 AS DOUBLE),
                           'sape', CAST(0 AS DOUBLE), 'n', 0)
            WHEN acc.t = 1 THEN
              named_struct('t', 2,
                'l', 3e-1 * e.x + 7e-1 * (acc.l + (e.x - acc.x1)),
                'b', 2e-1 * ((3e-1 * e.x + 7e-1 * (acc.l + (e.x - acc.x1)))
                       - acc.l) + 8e-1 * (e.x - acc.x1),
                'x1', acc.x1, 'sae', CAST(0 AS DOUBLE),
                'sape', CAST(0 AS DOUBLE), 'n', 0)
            ELSE
              named_struct('t', acc.t + 1,
                'l', 3e-1 * e.x + 7e-1 * (acc.l + acc.b),
                'b', 2e-1 * ((3e-1 * e.x + 7e-1 * (acc.l + acc.b)) - acc.l)
                       + 8e-1 * acc.b,
                'x1', acc.x1,
                'sae', acc.sae + abs((acc.l + acc.b) - e.x),
                'sape', acc.sape + CASE WHEN e.x <> 0e0
                  THEN abs((acc.l + acc.b) - e.x) / e.x
                  ELSE CAST(0 AS DOUBLE) END,
                'n', acc.n + 1)
          END)""").as("st"))
  }

  /** Oracle mirror of [[holtFoldFrame]]: the Holt recurrence WITH the
    * backtest error accumulators, as a recursive CTE stepping the month
    * index — shared by both Holt oracles.
    */
  private val sqlHoltCtes: String = """rev AS (
        SELECT n.n_name, CAST(year(o.o_orderdate) * 100 +
                 month(o.o_orderdate) AS INTEGER) AS ym,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                        CAST(1.0 - l.l_discount AS DECIMAL(8,2)))
                 AS DOUBLE) AS x
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2),
      ser AS (SELECT n_name, x,
                CAST(row_number() OVER (PARTITION BY n_name ORDER BY ym)
                  AS INTEGER) AS t
              FROM rev),
      nm AS (SELECT n_name, CAST(count(*) AS INTEGER) AS n_months
             FROM ser GROUP BY 1 HAVING count(*) >= 2),
      rec AS (
        WITH RECURSIVE h(n_name, t, l, b, sae, sape, n) AS (
          SELECT s1.n_name, 2,
                 3e-1 * s2.x + 7e-1 * (s1.x + (s2.x - s1.x)),
                 2e-1 * ((3e-1 * s2.x + 7e-1 * (s1.x + (s2.x - s1.x)))
                   - s1.x) + 8e-1 * (s2.x - s1.x),
                 CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS INTEGER)
          FROM ser s1 JOIN ser s2
            ON s2.n_name = s1.n_name AND s1.t = 1 AND s2.t = 2
          UNION ALL
          SELECT h.n_name, h.t + 1,
                 3e-1 * s.x + 7e-1 * (h.l + h.b),
                 2e-1 * ((3e-1 * s.x + 7e-1 * (h.l + h.b)) - h.l)
                   + 8e-1 * h.b,
                 h.sae + abs((h.l + h.b) - s.x),
                 h.sape + CASE WHEN s.x <> 0e0
                   THEN abs((h.l + h.b) - s.x) / s.x
                   ELSE CAST(0 AS DOUBLE) END,
                 h.n + 1
          FROM h JOIN ser s ON s.n_name = h.n_name AND s.t = h.t + 1)
        SELECT * FROM h)"""

  val holtLinear: QueryDef = QueryDef(
    "holt_linear",
    (s, d) =>
      holtFoldFrame(s, d)
        .select(col("n_name"), col("n_months"),
          Text.hround(col("st.l"), 2).as("level2"),
          Text.hround(col("st.b"), 2).as("trend2"),
          Text.hround(col("st.l") + lit(3.0) * col("st.b"), 2).as("fcast3_2"))
        .orderBy(col("n_name")),
    Some(s"""
      WITH $sqlHoltCtes
      SELECT nm.n_name, nm.n_months,
             ${Text.sqlHround("r.l", 2)} AS level2,
             ${Text.sqlHround("r.b", 2)} AS trend2,
             ${Text.sqlHround("r.l + 3.0e0 * r.b", 2)} AS fcast3_2
      FROM nm JOIN rec r ON r.n_name = nm.n_name AND r.t = nm.n_months
      ORDER BY nm.n_name
    """),
    doc = "Holt linear trend smoothing per nation: sequential fold, recursive-CTE oracle, 3-step forecast")

  /** Rolling-origin 1-step backtest for [[holtLinear]] — the forecasting
    * analog of the in-plan-learner evaluation rule (score_calibration,
    * community_conductance): parity on the smoother's output cannot
    * reveal a useless model, the error against held-out next months can.
    * At every t ≥ 3 the PRIOR state's one-step forecast l+b (no
    * lookahead — b₁ uses x₂, so t = 2 is excluded) is scored against the
    * arriving actual; MAE and MAPE accumulate INSIDE the same sequential
    * fold (identical IEEE chain in both engines, the holt_linear parity
    * argument extended to the error terms). Also reports the naive
    * random-walk baseline ratio implicitly via mape — a smoother worse
    * than ~20-30 % MAPE on this series is a red flag.
    */
  val holtBacktest: QueryDef = QueryDef(
    "holt_backtest",
    (s, d) =>
      holtFoldFrame(s, d)
        .filter(col("st.n") > 0)
        .select(col("n_name"), col("st.n").as("n_eval"),
          Text.hround(col("st.sae") / col("st.n").cast("double"), 2)
            .as("mae2"),
          Text.hround(col("st.sape") / col("st.n").cast("double"), 4)
            .as("mape4"))
        .orderBy(col("n_name")),
    Some(s"""
      WITH $sqlHoltCtes
      SELECT nm.n_name, r.n AS n_eval,
             ${Text.sqlHround("r.sae / CAST(r.n AS DOUBLE)", 2)} AS mae2,
             ${Text.sqlHround("r.sape / CAST(r.n AS DOUBLE)", 4)} AS mape4
      FROM nm JOIN rec r ON r.n_name = nm.n_name AND r.t = nm.n_months
      WHERE r.n > 0
      ORDER BY nm.n_name
    """),
    doc = "Holt smoother rolling 1-step backtest: in-fold MAE/MAPE per nation")

  /** Time-to-convert distribution: for every view event, the delay to the
    * user's NEXT purchase (forward as-of semantics via a min-over-
    * FOLLOWING-frame window — no self-join), kept when within 7 days;
    * then the EXACT per-cohort median and p90 of the delay in whole
    * minutes. Complements `funnel_window` (which counts conversions —
    * this measures how long they take, the number an SLA or attribution
    * model consumes). Exactness discipline: delays are integer
    * microseconds floored to minutes (DIV — identical in both engines),
    * and the quantiles are rank selections over the per-cohort
    * value-count frame (the grouped_median_exact machinery: cum_less <
    * k ≤ cum_less + cnt), never an interpolating percentile. Scale: one
    * user-partitioned window over the event stream, then aggregates on
    * the (cohort, minute) value-count frame.
    */
  val timeToConvert: QueryDef = QueryDef(
    "time_to_convert",
    (s, d) => {
      val SevenDaysUs = 604800000000L
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
          col("event_id"), col("event_type"))
      val wNext = Window.partitionBy(col("user_id"))
        .orderBy(col("tsu"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      val delays = ev
        .withColumn("next_p",
          min(when(col("event_type") === "purchase", col("tsu"))).over(wNext))
        .filter(col("event_type") === "view" && col("next_p").isNotNull &&
          col("next_p") - col("tsu") <= SevenDaysUs)
        .select((col("user_id") % 4).as("cohort"),
          expr("(next_p - tsu) DIV 60000000").as("delay_min"))
      val vc = delays.groupBy(col("cohort"), col("delay_min"))
        .agg(count(lit(1)).as("cnt"))
      val wLess = Window.partitionBy(col("cohort")).orderBy(col("delay_min"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.partitionBy(col("cohort"))
      vc
        .withColumn("cum_less", coalesce(sum(col("cnt")).over(wLess), lit(0L)))
        .withColumn("nt", sum(col("cnt")).over(wAll))
        .withColumn("kmed", expr("(nt + 1) DIV 2"))
        .withColumn("k90", expr("(9 * nt + 9) DIV 10"))
        .groupBy(col("cohort"))
        .agg(max(col("nt")).as("n_conv"),
          min(when(col("cum_less") < col("kmed") &&
            col("kmed") <= col("cum_less") + col("cnt"), col("delay_min")))
            .as("median_min"),
          min(when(col("cum_less") < col("k90") &&
            col("k90") <= col("cum_less") + col("cnt"), col("delay_min")))
            .as("p90_min"))
        .orderBy(col("cohort"))
    },
    Some("""
      WITH ev AS (SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type
                  FROM events WHERE event_type IN ('view', 'purchase')),
      nx AS (SELECT user_id, tsu, event_type,
               min(CASE WHEN event_type = 'purchase' THEN tsu END)
                 OVER (PARTITION BY user_id ORDER BY tsu, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_p
             FROM ev),
      dl AS (SELECT user_id % 4 AS cohort,
               CAST((next_p - tsu) // 60000000 AS BIGINT) AS delay_min
             FROM nx
             WHERE event_type = 'view' AND next_p IS NOT NULL
               AND next_p - tsu <= 604800000000),
      vc AS (SELECT cohort, delay_min, count(*) AS cnt FROM dl GROUP BY 1, 2),
      c AS (SELECT cohort, delay_min, cnt,
              coalesce(CAST(sum(cnt) OVER (PARTITION BY cohort
                ORDER BY delay_min
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                0) AS cum_less,
              CAST(sum(cnt) OVER (PARTITION BY cohort) AS BIGINT) AS nt
            FROM vc)
      SELECT cohort, CAST(max(nt) AS BIGINT) AS n_conv,
             CAST(min(CASE WHEN cum_less < (nt + 1) // 2
                            AND (nt + 1) // 2 <= cum_less + cnt
                           THEN delay_min END) AS BIGINT) AS median_min,
             CAST(min(CASE WHEN cum_less < (9 * nt + 9) // 10
                            AND (9 * nt + 9) // 10 <= cum_less + cnt
                           THEN delay_min END) AS BIGINT) AS p90_min
      FROM c GROUP BY 1 ORDER BY cohort
    """),
    doc = "view→next-purchase delay: exact per-cohort median/p90 minutes via rank selection")

  /** Kendall's tau-b between per-supplier total quantity and total
    * revenue — the tie-corrected PAIRWISE rank statistic completing the
    * monotone-association family (rank_correlation is Spearman — rank
    * transform then moments; mann_kendall_trend is tau against TIME;
    * this is the general two-variable tau with both tie corrections).
    * Exact integer inputs (quantity is integral; revenue as half-up
    * integer cents via floor(x·100+0.5) per line — the same formula on
    * both engines, because Spark's cast-to-long TRUNCATES while
    * DuckDB's CAST ROUNDS), concordant/discordant/tie counts accumulated by
    * ONE row-local nested fold over the sorted per-supplier array —
    * legal because the supplier domain is DIM-SIZED (1000 at sf0.1;
    * the score_calibration bounded-domain rule). The O(|S|²) pair fold
    * caps at ~10⁴ entities (10⁸ row-local ops); past that use the
    * aggregate-first Spearman or a sampled tau — scaladoc'd, not
    * silent. tau_b = (C−D)/√((n0−n1)(n0−n2)) divides identical
    * integers under one correctly-rounded sqrt on both engines.
    */
  val kendallTau: QueryDef = QueryDef(
    "kendall_tau",
    (s, d) => {
      val sup = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey").as("sk"))
        .agg(sum(col("l_quantity").cast("long")).as("x"),
          // exact-cents discipline: floor(x*100+0.5) per line on BOTH
          // engines (Spark cast truncates, DuckDB's rounds — the
          // round-9 trunc-vs-round class; r14 ADVICE)
          sum(floor(col("l_extendedprice") * lit(100) + lit(0.5)))
            .as("y"))
      val folded = sup
        .agg(count(lit(1)).as("n"),
          expr("array_sort(collect_list(struct(sk, x, y)))").as("a"))
        .select(col("n"), expr(
          """aggregate(sequence(1, size(a) - 1),
               named_struct('c', CAST(0 AS BIGINT), 'd', CAST(0 AS BIGINT),
                 'tx', CAST(0 AS BIGINT), 'ty', CAST(0 AS BIGINT)),
               (s0, i) -> aggregate(sequence(i + 1, size(a)), s0,
                 (s1, j) -> named_struct(
                   'c', s1.c + IF((element_at(a, i).x < element_at(a, j).x AND
                        element_at(a, i).y < element_at(a, j).y) OR
                       (element_at(a, i).x > element_at(a, j).x AND
                        element_at(a, i).y > element_at(a, j).y),
                     CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
                   'd', s1.d + IF((element_at(a, i).x < element_at(a, j).x AND
                        element_at(a, i).y > element_at(a, j).y) OR
                       (element_at(a, i).x > element_at(a, j).x AND
                        element_at(a, i).y < element_at(a, j).y),
                     CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
                   'tx', s1.tx + IF(element_at(a, i).x = element_at(a, j).x,
                     CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
                   'ty', s1.ty + IF(element_at(a, i).y = element_at(a, j).y,
                     CAST(1 AS BIGINT), CAST(0 AS BIGINT)))))""").as("k"))
      folded.select(col("n"),
        col("k.c").as("n_conc"), col("k.d").as("n_disc"),
        col("k.tx").as("ties_x"), col("k.ty").as("ties_y"),
        Text.hround(
          (col("k.c") - col("k.d")).cast("double") /
            sqrt(expr("""CAST(((n * (n - 1)) DIV 2 - k.tx)
                 * ((n * (n - 1)) DIV 2 - k.ty) AS DOUBLE)""")), 4)
          .as("tau_b4"))
    },
    Some(s"""
      WITH sup AS (
        SELECT l_suppkey AS sk,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5e0) AS BIGINT)) AS BIGINT) AS y
        FROM lineitem GROUP BY 1),
      p AS (
        SELECT CAST(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
                   OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
                   OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END) AS BIGINT) AS d,
               CAST(sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
               CAST(sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS ty
        FROM sup a JOIN sup b ON a.sk < b.sk),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sup)
      SELECT nn.n, p.c AS n_conc, p.d AS n_disc,
             p.tx AS ties_x, p.ty AS ties_y,
             ${Text.sqlHround(
               """CAST(p.c - p.d AS DOUBLE)
                  / sqrt(CAST((nn.n * (nn.n - 1) // 2 - p.tx)
                    * (nn.n * (nn.n - 1) // 2 - p.ty) AS DOUBLE))""", 4)}
               AS tau_b4
      FROM p, nn
    """),
    doc = "Kendall tau-b (tie-corrected) of supplier quantity vs revenue totals")

  /** One-way ANOVA F-test of l_quantity across return flags — the k-group
    * generalization of [[abTestWelch]]'s two-sample comparison (does ANY
    * group mean differ?). One corpus pass collects exact per-group
    * INTEGER moments (n, Σx, Σx²): l_quantity is an integral DOUBLE
    * fixture column, so both engines cast each value to BIGINT before
    * summing — the moments are exact by construction (not by the
    * unstated integral-double-under-2^53 accident; r14 ADVICE), and the
    * squares stay far under 2^63. The grand totals ride an
    * UNPARTITIONED WINDOW over the 7-row group frame (bounded domain —
    * the round-11 fixed-domain-window rule, no one-row crossJoin
    * needed); per-group SSB/SSW terms are computed in identical double
    * chains from those exact operands and re-quantized to 1e-4 BIGINT
    * units BEFORE the cross-group sum (the zipf_fit addition-order
    * discipline), so F divides identical integers-scaled-by-1e4 — the
    * 1e4 cancels in the ratio. eta² = SSB/(SSB+SSW) from the same
    * quantized units.
    */
  val anovaOneway: QueryDef = QueryDef(
    "anova_oneway",
    (s, d) => {
      val g = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("grp"))
        .agg(count(lit(1)).as("n_g"),
          sum(col("l_quantity").cast("long")).as("s_g"),
          sum(col("l_quantity").cast("long")
            * col("l_quantity").cast("long")).as("q_g"))
      val w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val t = g
        .withColumn("n", sum(col("n_g")).over(w))
        .withColumn("st", sum(col("s_g")).over(w))
        .withColumn("m_g", col("s_g").cast("double") / col("n_g"))
        .withColumn("m", col("st").cast("double") / col("n"))
        .select(col("n"),
          floor(col("n_g") * (col("m_g") - col("m")) * (col("m_g") - col("m"))
            * lit(1e4) + lit(0.5)).cast("long").as("ssb_t"),
          floor((col("q_g").cast("double") -
            col("n_g") * col("m_g") * col("m_g")) * lit(1e4) + lit(0.5))
            .cast("long").as("ssw_t"))
      t.groupBy(col("n"))
        .agg(count(lit(1)).as("k"),
          sum(col("ssb_t")).as("ssb_u4"), sum(col("ssw_t")).as("ssw_u4"))
        .select(col("k"), col("n"), col("ssb_u4"), col("ssw_u4"),
          Text.hround(
            (col("ssb_u4").cast("double") / (col("k") - lit(1L))) /
              (col("ssw_u4").cast("double") / (col("n") - col("k"))), 4)
            .as("f4"),
          Text.hround(col("ssb_u4").cast("double") /
            (col("ssb_u4") + col("ssw_u4")), 4).as("eta4"))
    },
    Some(s"""
      WITH g AS (SELECT l_returnflag AS grp, CAST(count(*) AS BIGINT) AS n_g,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s_g,
                   CAST(sum(CAST(l_quantity AS BIGINT)
                     * CAST(l_quantity AS BIGINT)) AS BIGINT) AS q_g
                 FROM lineitem GROUP BY 1),
      t AS (SELECT CAST(sum(n_g) OVER () AS BIGINT) AS n,
              CAST(floor(n_g * (CAST(s_g AS DOUBLE) / n_g
                  - CAST(sum(s_g) OVER () AS DOUBLE) / sum(n_g) OVER ())
                * (CAST(s_g AS DOUBLE) / n_g
                  - CAST(sum(s_g) OVER () AS DOUBLE) / sum(n_g) OVER ())
                * 1e4 + 0.5e0) AS BIGINT) AS ssb_t,
              CAST(floor((CAST(q_g AS DOUBLE)
                  - n_g * (CAST(s_g AS DOUBLE) / n_g)
                    * (CAST(s_g AS DOUBLE) / n_g)) * 1e4 + 0.5e0)
                AS BIGINT) AS ssw_t
            FROM g)
      SELECT CAST(count(*) AS BIGINT) AS k, n,
             CAST(sum(ssb_t) AS BIGINT) AS ssb_u4,
             CAST(sum(ssw_t) AS BIGINT) AS ssw_u4,
             ${Text.sqlHround(
               """(CAST(sum(ssb_t) AS BIGINT) / CAST(count(*) - 1 AS DOUBLE))
                  / (CAST(sum(ssw_t) AS BIGINT) / CAST(n - count(*) AS DOUBLE))""",
               4)} AS f4,
             ${Text.sqlHround(
               """CAST(CAST(sum(ssb_t) AS BIGINT) AS DOUBLE)
                  / (CAST(sum(ssb_t) AS BIGINT) + CAST(sum(ssw_t) AS BIGINT))""",
               4)} AS eta4
      FROM t GROUP BY n
    """),
    doc = "one-way ANOVA F + eta-squared of l_quantity across return flags (exact moments)")

  val all: Seq[QueryDef] =
    Seq(corrRegr, histogram, setOps, nullSafeJoin, funnel, cohortRetention,
      robustStats, skylinePareto, relationalDivision, arrayHof, chiSquare,
      marketBasket, abTestWelch, attributionTouch, mannWhitneyU,
      cusumChangepoint, autocorrDaily, benfordDigits, skewProfile,
      eventTrigrams, theilSenSlope, mannKendall, paretoAbc, rfmSegmentation,
      chiSquareResiduals, forecastAccuracy, funnelWindow,
      attributionLinear, subsampleCi, cupedAdjustedAb, audienceOverlap,
      kaplanMeier, rankCorrelation, featureInfoGain, popularityHitRate,
      kAnonymity, psiValueDrift, dpRandomizedResponse, ksTwoSample,
      ksSketchDrift,
      holtLinear, holtBacktest, timeToConvert, dpLaplaceHistogram,
      anovaOneway, kendallTau)
}
