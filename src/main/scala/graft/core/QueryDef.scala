package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort}
import org.apache.spark.sql.graft.Bridge

/** One named engine capability: a Spark query over the fixture tables plus,
  * when SQL-expressible, a DuckDB oracle with IDENTICAL output column names
  * (the driver sorts columns by name before hashing — SparkEntry contract).
  * `oracle = None` → the driver records a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "") {

  /** The PRODUCTION variant of [[fn]]: the same plan minus the top-level
    * global ORDER BY. Every registered query ends in a global sort so the
    * oracle hash is deterministic — pure verification plumbing that at
    * 100 TB would be the single worst operator in the plan (a
    * RangePartitioning pass over the full result). This strips exactly
    * that top-level Sort (including under a trailing Project) from the
    * ANALYZED plan and leaves everything else — window sorts, sorts under
    * limits (TakeOrderedAndProject is a scale-safe real operator), and
    * any interior ordering a query semantically needs — untouched.
    * ProductionSortSpec asserts the stripped plan executes with no global
    * Sort/RangePartitioning at the root and returns the same bag of rows;
    * Verify/Bench keep using [[fn]], so oracle hashing is unaffected.
    */
  def production(s: SparkSession, d: String): DataFrame = {
    val df = fn(s, d)
    val plan = Bridge.analyzed(df)
    val stripped = QueryDef.stripTopSort(plan)
    if (stripped eq plan) df else Bridge.ofRows(s, stripped)
  }
}

object QueryDef {
  /** Oracle table names: the driver binds each fixture parquet under its
    * plain table name; oracle SQL references them directly (e.g. `lineitem`).
    */
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Remove a top-level global Sort (optionally under a trailing Project —
    * the `.orderBy(...).select(...)` shape). Anything else (Limit over
    * Sort = top-k, window-internal sorts, joins) is left alone: only the
    * result-presentation sort is plumbing.
    */
  private[core] def stripTopSort(p: LogicalPlan): LogicalPlan = p match {
    case s: Sort if s.global => s.child
    case pr @ Project(_, s: Sort) if s.global => pr.copy(child = s.child)
    case _ => p
  }
}
