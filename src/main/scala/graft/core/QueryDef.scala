package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark query over the fixture tables plus,
  * when SQL-expressible, a DuckDB oracle with IDENTICAL output column names
  * (the driver sorts columns by name before hashing — SparkEntry contract).
  * `oracle = None` → the driver records a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {
  /** Oracle table names: the driver binds each fixture parquet under its
    * plain table name; oracle SQL references them directly (e.g. `lineitem`).
    */
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")
}
