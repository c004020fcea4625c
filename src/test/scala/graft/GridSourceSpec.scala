package graft

import java.io.File
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThan}
import graft.sources.{GridPartition, GridScan, GridSource}

/** The custom DataSourceV2 grid source (SRC1's native-ingestion analog):
  * chunk-file skipping, column pruning, and full read-back fidelity.
  * grid_source_roundtrip hash-gates the end-to-end numbers against the
  * DuckDB oracle; this spec pins the CONNECTOR mechanics that the hash
  * can't see (which files the planner keeps, what the reader
  * materializes).
  */
class GridSourceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = {
    val d = new File("target/ggrid_spec_" +
      ProcessHandle.current().pid()).getAbsolutePath
    GridSource.writeGrid(Seq(
      (0, 0, 19000, 100L), (0, 1, 19000, 200L),
      (1, 0, 19001, 300L), (1, 1, 19002, 400L), (1, 2, 19003, 500L),
      (2, 0, 19004, 600L)), d)
    d
  }

  private def read() = spark.read.format("graft.sources.GridSource").load(dir)

  test("writer emits one chunk file per lat band; full read-back is exact") {
    val files = new File(dir).listFiles((f: File) => f.getName.endsWith(".ggrid"))
    assert(files.map(_.getName).sorted.toSeq ===
      Seq("lat=0.ggrid", "lat=1.ggrid", "lat=2.ggrid"))
    val got = read().as[(Int, Int, Int, Long)].collect().toSet
    assert(got === Set(
      (0, 0, 19000, 100L), (0, 1, 19000, 200L),
      (1, 0, 19001, 300L), (1, 1, 19002, 400L), (1, 2, 19003, 500L),
      (2, 0, 19004, 600L)))
  }

  test("lat_idx comparisons skip chunk files at planning") {
    // Planner-level: survives() is the skip predicate.
    assert(!GridSource.survives(0, Array(GreaterThanOrEqual("lat_idx", 1))))
    assert(GridSource.survives(1, Array(GreaterThanOrEqual("lat_idx", 1))))
    assert(GridSource.survives(1, Array(EqualTo("lat_idx", 1))))
    assert(!GridSource.survives(2, Array(LessThan("lat_idx", 2))))
    // Scan-level: the plan keeps only surviving files.
    val scan = GridScan(dir, GridSource.Schema,
      Array(GreaterThanOrEqual("lat_idx", 1)))
    val parts = scan.planInputPartitions()
    assert(parts.length === 2)
    assert(parts.map(_.asInstanceOf[GridPartition].file)
      .forall(f => f.endsWith("lat=1.ggrid") || f.endsWith("lat=2.ggrid")))
    // End-to-end: result is correct AND the filter still applies post-scan.
    val got = read().filter(col("lat_idx") >= 1)
      .agg(sum(col("cents"))).head().getLong(0)
    assert(got === 300L + 400L + 500L + 600L)
  }

  test("column pruning reaches the reader (pruned scan schema)") {
    val df = read().select(col("cents"))
    // The V2 scan's read schema must carry ONLY the pruned column.
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("cents"))
    assert(df.as[Long].collect().sorted.toSeq ===
      Seq(100L, 200L, 300L, 400L, 500L, 600L))
  }
}
