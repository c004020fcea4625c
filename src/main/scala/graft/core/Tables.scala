package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers over the harness fixtures (TESTDATA.md).
  *
  * Models the reference's sources (SURVEY.md §2 SRC1/SRC2): every read is a
  * lazy, partitioned, column-pruned parquet scan — the Spark-native analog of
  * the reference's chunked-lazy NetCDF open
  * (reference scripts/process_climate_amazon_monthly.py:189-241) and
  * shapefile load (:137). Laziness/pushdown/pruning come from Catalyst; no
  * custom scan machinery is needed or wanted.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
