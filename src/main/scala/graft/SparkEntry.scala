package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.core.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator family registers its QueryDefs here; the
  * driver runs `queries` at sf0.01 and compares against `oracleSql` in
  * DuckDB (columns sorted by name before hashing — hence every computed
  * column is identically aliased on both sides).
  */
object SparkEntry {

  /** All engine capabilities, one QueryDef per SURVEY.md §2 row (plus the
    * LLM-data-pipeline extensions). Order is stable for reporting.
    */
  val defs: Seq[QueryDef] =
    ops.Filters.all ++ ops.Scalars.all ++ ops.Joins.all ++
      ops.Aggregates.all ++ ops.Windows.all ++ ops.Extended.all ++
      ops.Analytics.all ++ ops.Relational.all ++ ops.Graph.all ++
      ops.Clustering.all ++ ops.Learn.all ++
      ops.Multimodal.all ++ ops.Typed.all ++
      streaming.EventStream.all ++ pipeline.Climate.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The fused EP2 monthly plan (filter → multi-agg → broadcast dim join →
    * project/round → sort) — the reference's flagship pipeline.
    */
  def entry(spark: SparkSession): DataFrame =
    pipeline.Climate.monthly.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
