package graft.tools

import graft.streaming.EventStream
import graft.streaming.EventStream.{TypeCounts, TypedEv}
import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Dev probe: drive the MapState+TTL processor outside ScalaTest.
  *
  * NOTE (the hard-won bit): in TimeMode.ProcessingTime,
  * TransformWithStateExec.shouldRunAnotherBatch is ALWAYS true, so the
  * query triggers continuously (empty batches advance the TTL clock) —
  * processAllAvailable() never observes an idle query and blocks
  * forever, and Trigger.AvailableNow never terminates either. Tests
  * must POLL the sink for expected rows instead of awaiting idleness.
  */
object TtlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Long) = new Timestamp(m * 60000L)
    val mem = MemoryStream[TypedEv](
      org.apache.spark.sql.Encoders.product[TypedEv], sqlCtx)
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[TypeCounts]()
    val q = EventStream.rollingDistinctState(mem.toDS(),
        java.time.Duration.ofMillis(1000))
      .writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (b: Dataset[TypeCounts], _: Long) =>
        b.collect().foreach(buf.add)
      }
      .start()
    def await(what: String, p: () => Boolean): Unit = {
      val deadline = System.currentTimeMillis + 60000
      while (!p() && System.currentTimeMillis < deadline) Thread.sleep(100)
      println(s"$what: ${if (p()) "OK" else "TIMEOUT"}  buf=" +
        buf.toArray.mkString(", "))
    }
    try {
      mem.addData(TypedEv(1L, ts(0), "click"), TypedEv(1L, ts(1), "view"),
        TypedEv(1L, ts(2), "click"), TypedEv(2L, ts(3), "purchase"))
      await("B1", () => buf.contains(TypeCounts(1L, 2L, 3L)) &&
        buf.contains(TypeCounts(2L, 1L, 1L)))
      Thread.sleep(3000)
      buf.clear()
      mem.addData(TypedEv(1L, ts(10), "purchase"))
      await("B2", () => buf.contains(TypeCounts(1L, 1L, 1L)))
    } finally { q.stop(); spark.stop() }
  }
}
