package graft.ops

import graft.core.{Num, QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Filter / predicate operators (SURVEY.md §2 F1-F5, X1).
  *
  * All predicates are declarative `Column` expressions so Catalyst pushes
  * them into the parquet scan (row-group pruning + `PushedFilters`) — the
  * Spark-native form of the reference's clip-before-read
  * (/root/reference/scripts/process_climate_amazon_monthly.py:219-236).
  */
object Filters {

  /** F1 — IN-list filter (the 7-state Northern filter, monthly.py:157). */
  val inList: QueryDef = QueryDef(
    "inlist_filter",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("A", "R") && col("l_linestatus") === "F")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixture — sort on
        // the full output tuple for cross-engine determinism.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag")),
    Some("""
      SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
      WHERE l_returnflag IN ('A','R') AND l_linestatus = 'F'
      ORDER BY l_orderkey, l_linenumber, l_returnflag
    """),
    doc = "F1 IN-list + F2 equality, pushed to parquet scan")

  /** F4 + X1 — 2-D range predicate with driver-round-tripped bounds: the
    * reference computes the region bounding box, collects it to the driver,
    * and parameterizes the raster clip with it (monthly.py:173-186 → 219-236).
    * Identical pattern: a 4-value agg collect, then literal predicates that
    * Catalyst pushes to the scan. One of the two sanctioned collect()
    * sites in the engine (the other is the CC convergence-sum loop in
    * Extended.ccOverEdges — a documented driver-coordinated iteration).
    */
  val boxRange: QueryDef = QueryDef(
    "box_range_filter",
    (s, d) => {
      val ev = Tables.events(s, d)
      val Array(row) = ev.agg(min(col("value")).as("mn"), max(col("value")).as("mx")).collect()
      val (mn, mx) = (row.getDouble(0), row.getDouble(1))
      val (lo, hi) = (mn + 0.25 * (mx - mn), mn + 0.75 * (mx - mn))
      ev.filter(col("value").between(lo, hi) &&
          dayofmonth(col("ts")).between(5, 20))
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH b AS (SELECT min(value) AS mn, max(value) AS mx FROM events)
      SELECT event_id, user_id, value FROM events, b
      WHERE value BETWEEN b.mn + 0.25*(b.mx-b.mn) AND b.mn + 0.75*(b.mx-b.mn)
        AND day(ts) BETWEEN 5 AND 20
      ORDER BY event_id
    """),
    doc = "F4 box clip + X1 bounds round-trip (the engine's only collect)")

  /** F5/X5 — null-guard / error-quarantine as anti-join: keys that fail to
    * produce complete rows are quarantined, the pipeline continues
    * (monthly.py:290-291, 332-333). Here: orders whose customer is missing
    * from a filtered dimension (acctbal > 0) — LEFT ANTI, no row-level
    * exceptions, fully distributed.
    */
  val antiQuarantine: QueryDef = QueryDef(
    "anti_join_quarantine",
    (s, d) => {
      val goodCust = Tables.customer(s, d).filter(col("c_acctbal") > 0)
        .select(col("c_custkey"))
      Tables.orders(s, d)
        .join(goodCust, col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_quarantined"),
          Num.sum2(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    },
    Some(s"""
      SELECT o_orderstatus, count(*) AS n_quarantined,
             ${Num.sqlSum2("o_totalprice")} AS sum_price
      FROM orders WHERE NOT EXISTS (
        SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_acctbal > 0)
      GROUP BY 1 ORDER BY 1
    """),
    doc = "F5/X5 error-quarantine via LEFT ANTI join")

  /** Semi-join complement of the quarantine (the rows that DO survive). */
  val semiKeep: QueryDef = QueryDef(
    "semi_join_keep",
    (s, d) => {
      val goodCust = Tables.customer(s, d).filter(col("c_acctbal") > 0)
        .select(col("c_custkey"))
      Tables.orders(s, d)
        .join(goodCust, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""
      SELECT o_orderstatus, count(*) AS n_kept
      FROM orders WHERE EXISTS (
        SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_acctbal > 0)
      GROUP BY 1 ORDER BY 1
    """),
    doc = "LEFT SEMI complement of the quarantine")

  /** F2 + F3 — standalone equality / conjunctive-equality predicate (the
    * reference's per-state slice `df[df['UF']==state]` split_by_state.py:54
    * and the notebook's `(CD_MUN==code) & (year==2015)` spot-check). Both
    * predicates push to the parquet scan.
    */
  val equality: QueryDef = QueryDef(
    "equality_filter",
    (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F" &&
          year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_orderstatus = 'F' AND year(o_orderdate) = 1995
      ORDER BY o_orderkey
    """),
    doc = "F2/F3 equality + conjunctive predicate, pushed to scan")

  val all: Seq[QueryDef] =
    Seq(inList, equality, boxRange, antiQuarantine, semiKeep)
}
