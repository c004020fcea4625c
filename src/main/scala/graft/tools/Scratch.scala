package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling experiments (dev only). Current experiment:
  * which malformed CSV line shapes does PERMISSIVE + corrupt-record
  * column actually quarantine?
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val out = "target/scratch_csv"
    Seq("1,Good Row,10.5", "2,Also Good,20.0").toDS()
      .write.mode("overwrite").text(out)
    Seq("notanint,Torn Row,12.5",
      "42,Wrong Arity,1.0,extra,fields",
      "7,Bad Balance,notadouble",
      "99",
      "\"unterminated,quote,3.0").toDS()
      .write.mode("append").text(out)
    val df = spark.read
      .schema("s_suppkey BIGINT, s_name STRING, s_acctbal DOUBLE, _bad STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv(out)
    df.orderBy(col("s_name")).show(20, false)
  }
}
