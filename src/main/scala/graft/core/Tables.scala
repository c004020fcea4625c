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
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet is TIMESTAMP(NANOS); without this flag Spark 4 fails
    // the read at analysis time ([PARQUET_TYPE_ILLEGAL]). Harmless for the
    // other tables (no nanos columns anywhere else).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events.parquet stores TIMESTAMP(NANOS), which Spark 4 rejects at
    * analysis time ([PARQUET_TYPE_ILLEGAL]). Read the nanos as LONG via the
    * legacy flag and rebuild a proper µs timestamp — DuckDB reads the same
    * file natively at ns and truncates to µs in epoch_us, so oracle parity
    * holds. The cast is a codegen'd scalar; pushdown on the other columns
    * is unaffected.
    */
  private def eventsRaw(s: SparkSession, d: String): DataFrame = {
    // Integer division, NOT `/` (which is double division and can be off
    // by 1 µs at 1.7e18-ns magnitudes — DuckDB's epoch_us truncates exactly).
    table(s, d, "events").withColumn(
      "ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
