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

  test("corrupt chunk files fail with file context, not a leaked stream") {
    import graft.sources.GridReader
    val bad = new File("target/ggrid_bad_" + ProcessHandle.current().pid())
    bad.mkdirs()
    // wrong magic
    val magicF = new File(bad, "lat=0.ggrid")
    val o1 = new java.io.DataOutputStream(new java.io.FileOutputStream(magicF))
    o1.writeInt(0xDEADBEEF); o1.writeInt(1); o1.close()
    val e1 = intercept[IllegalArgumentException](
      new GridReader(magicF.getAbsolutePath, Array("cents")))
    assert(e1.getMessage.contains(magicF.getName))
    // truncated header (magic only, no count)
    val truncH = new File(bad, "lat=1.ggrid")
    val o2 = new java.io.DataOutputStream(new java.io.FileOutputStream(truncH))
    o2.writeInt(GridSource.Magic); o2.close()
    val e2 = intercept[java.io.EOFException](
      new GridReader(truncH.getAbsolutePath, Array("cents")))
    assert(e2.getMessage.contains(truncH.getName))
    // mid-row truncation: header says 2 rows, file holds 1.5
    val truncR = new File(bad, "lat=2.ggrid")
    val o3 = new java.io.DataOutputStream(new java.io.FileOutputStream(truncR))
    o3.writeInt(GridSource.Magic); o3.writeInt(2)
    o3.writeInt(2); o3.writeInt(0); o3.writeInt(19000); o3.writeLong(7L)
    o3.writeInt(2); o3.close()
    val r = new GridReader(truncR.getAbsolutePath, Array("cents"))
    assert(r.next())
    val e3 = intercept[java.io.EOFException](r.next())
    assert(e3.getMessage.contains("row 2/2") && e3.getMessage.contains(truncR.getName))
    r.close()
    // an unknown pruned column fails at construction, not per-row
    val okF = new File(dir, "lat=0.ggrid")
    val e4 = intercept[IllegalArgumentException](
      new GridReader(okF.getAbsolutePath, Array("nope")))
    assert(e4.getMessage.contains("nope"))
  }

  test("user-specified schema is rejected, not silently replaced") {
    // Read path: Spark itself refuses (supportsExternalMetadata is false
    // for this provider), so a caller's .schema(...) can never silently
    // replace the fixed layout.
    val e = intercept[Exception] {
      spark.read.format("graft.sources.GridSource")
        .schema("lat_idx INT, wrong STRING").load(dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m =>
      m.contains("user-specified schema") || m.contains("fixed schema")))
    // Direct-call path (defense in depth): getTable rejects a foreign
    // schema instead of ignoring it.
    val provider = new graft.sources.GridSource
    val e2 = intercept[IllegalArgumentException] {
      provider.getTable(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("wrong",
            org.apache.spark.sql.types.StringType))),
        Array.empty, new java.util.HashMap[String, String]())
    }
    assert(e2.getMessage.contains("fixed schema"))
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
