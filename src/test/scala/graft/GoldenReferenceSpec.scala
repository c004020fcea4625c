package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Industrializes the reference's committed golden outputs — the one
  * correctness leg it validates only by eyeball
  * (reference scripts/validation_northern_capitals.ipynb cell 2; goldens at
  * processed_output_data/Climate_Amazon_North_2001-2024.csv and
  * by_state/Climate_*_{Annual,Monthly}_2001-2024.csv) — as mechanical
  * SURVEY.md §5 invariants:
  *
  *  1. the per-state split is a LOSSLESS PARTITION of the consolidated
  *     annual output (no row lost, none duplicated, every row in the
  *     state file its UF says);
  *  2. the annual pipeline equals the re-aggregated monthly pipeline
  *     (sums for the flux variables, day-weighted means for the state
  *     variables) within monthly 2-dp rounding tolerance — the
  *     cross-pipeline consistency the notebook spot-checks by hand;
  *  3. the notebook's capital/2015 point assertions hold bit-for-bit.
  *
  * Tolerances are derived, not guessed: each monthly value is rounded to
  * 2 dp, so a 12-month sum drifts ≤ 12·0.005 = 0.06 from the annual
  * (computed from dailies). Measured max drift for FULL years: 0.04 for
  * sums, 0.008 for day-weighted means — asserted at 0.1 / 0.02. The
  * goldens' final PARTIAL year (3 months) reconciles sums tightly
  * (≤ 0.01) but its means drift to 0.53 (the reference weights the
  * partial range differently) — characterized separately at 0.6 so a
  * real pipeline break still fails.
  */
class GoldenReferenceSpec extends SparkSpec {

  private val refDir = "/root/reference/processed_output_data"

  private val annualSchema =
    "CD_MUN BIGINT, NM_MUN STRING, UF STRING, year INT, pr DOUBLE, " +
      "ETo DOUBLE, Tmax DOUBLE, Tmin DOUBLE, RH DOUBLE, VPD DOUBLE, " +
      "u2 DOUBLE, Rs DOUBLE"
  private val monthlySchema =
    "CD_MUN BIGINT, NM_MUN STRING, UF STRING, year INT, month INT, " +
      "pr DOUBLE, ETo DOUBLE, Tmax DOUBLE, Tmin DOUBLE, RH DOUBLE, " +
      "VPD DOUBLE, u2 DOUBLE, Rs DOUBLE"

  /** Explicit schema (never inferred) also sidesteps the BOM on the
    * goldens' first header cell — with a schema, header row is skipped
    * by position, not matched by name.
    */
  private def csv(path: String, schema: String): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  private def consolidated = csv(s"$refDir/Climate_Amazon_North_2001-2024.csv", annualSchema)
  private def stateAnnual  = csv(s"$refDir/by_state/Climate_*_Annual_2001-2024.csv", annualSchema)
  private def stateMonthly = csv(s"$refDir/by_state/Climate_*_Monthly_2001-2024.csv", monthlySchema)

  test("golden: by_state annual is a lossless partition of the consolidated output") {
    val cons = consolidated
    val split = stateAnnual
    assert(cons.count() === 10800L, "consolidated golden changed shape")
    assert(split.count() === 10800L, "by_state union changed shape")
    // set-equality with multiplicity: both directions of exceptAll empty
    assert(cons.exceptAll(split).isEmpty, "rows in consolidated missing from split")
    assert(split.exceptAll(cons).isEmpty, "rows in split missing from consolidated")
    // every row lives in the file its UF column says (keyed correctly)
    val misfiled = stateMonthly
      .withColumn("file_uf",
        regexp_extract(input_file_name(), "Climate_([A-Z]{2})_Monthly", 1))
      .filter(col("file_uf") =!= col("UF")).count()
    assert(misfiled === 0L, s"$misfiled monthly rows filed under the wrong state")
  }

  test("golden: annual pipeline == re-aggregated monthly pipeline (cross-pipeline consistency)") {
    val m = stateMonthly.withColumn("dd",
      dayofmonth(last_day(make_date(col("year"), col("month"), lit(1)))))
    def wmean(c: String) = (sum(col(c) * col("dd")) / sum(col("dd"))).as(s"${c}_w")
    val re = m.groupBy(col("CD_MUN"), col("year"))
      .agg(count(lit(1)).as("nm"),
        sum("pr").as("pr_s"), sum("ETo").as("ETo_s"), sum("Rs").as("Rs_s"),
        wmean("Tmax"), wmean("Tmin"), wmean("RH"), wmean("VPD"), wmean("u2"))
    val j = consolidated.join(re, Seq("CD_MUN", "year"))
    assert(j.count() === 10800L, "monthly goldens don't cover every (mun, year)")
    def maxDiffs(df: DataFrame) = df.select(
      max(abs(col("pr") - col("pr_s"))).as("pr"),
      max(abs(col("ETo") - col("ETo_s"))).as("ETo"),
      max(abs(col("Rs") - col("Rs_s"))).as("Rs"),
      max(abs(col("Tmax") - col("Tmax_w"))).as("Tmax"),
      max(abs(col("Tmin") - col("Tmin_w"))).as("Tmin"),
      max(abs(col("RH") - col("RH_w"))).as("RH"),
      max(abs(col("VPD") - col("VPD_w"))).as("VPD"),
      max(abs(col("u2") - col("u2_w"))).as("u2")).head()
    def check(d: org.apache.spark.sql.Row, sumTol: Double, meanTol: Double,
        regime: String): Unit = {
      Seq(0, 1, 2).foreach { i =>
        assert(d.getDouble(i) <= sumTol,
          s"$regime sum-variable ${d.schema(i).name} drifts ${d.getDouble(i)}")
      }
      Seq(3, 4, 5, 6, 7).foreach { i =>
        assert(d.getDouble(i) <= meanTol,
          s"$regime mean-variable ${d.schema(i).name} drifts ${d.getDouble(i)}")
      }
    }
    check(maxDiffs(j.filter(col("nm") === 12)), 0.1, 0.02, "full-year")
    check(maxDiffs(j.filter(col("nm") < 12)), 0.05, 0.6, "partial-year")
  }

  test("golden: the notebook's capital/2015 spot checks hold bit-for-bit") {
    // validation_northern_capitals.ipynb cell 2 (Belém 1501402,
    // Manaus 1302603); values also cited in README.md:147-154.
    val caps = consolidated
      .filter(col("year") === 2015 && col("CD_MUN").isin(1501402L, 1302603L))
      .select(col("CD_MUN"), col("pr"), col("Tmax"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(caps(1501402L) === ((2380.78, 32.87)), "Belém 2015 drifted")
    assert(caps(1302603L)._1 === 1874.09, "Manaus 2015 drifted")
  }

  test("golden: CSV sink writes the reference's utf-8-sig BOM, round-trips") {
    // The reference exports with encoding='utf-8-sig' (monthly.py:461,
    // annual.py:506) so Excel detects UTF-8. SNK1 parity: every part CSV
    // must start with EF BB BF, and the BOM must not perturb re-reading.
    // Own temp dir (not the registered query's sink): suites run in
    // parallel and other specs construct split_partitioned_write, which
    // rewrites its shared sink dir mid-test.
    val out = java.nio.file.Files
      .createTempDirectory("graft_bom").toFile.getAbsolutePath
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    src.write.mode("overwrite").option("header", "true")
      .partitionBy("o_orderstatus").csv(out)
    pipeline.Climate.stampUtf8Bom(out)
    pipeline.Climate.stampUtf8Bom(out) // idempotent: no double BOM
    def csvs(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(csvs)
      else if (f.getName.endsWith(".csv")) Seq(f) else Nil
    val files = csvs(new java.io.File(out))
    assert(files.nonEmpty, s"no part CSVs under $out")
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      assert(bytes.take(3).sameElements(
        Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)),
        s"${f.getName} missing the utf-8-sig BOM")
      assert(!bytes.slice(3, 6).sameElements(
        Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)),
        s"${f.getName} double-stamped")
    }
    // read-through: the BOM rides the skipped header line, so the data
    // round-trips losslessly
    val back = spark.read.option("header", "true")
      .schema("o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING")
      .csv(out)
    assert(back.count() === src.count())
    assert(back.agg(sum(col("o_orderkey"))).head().getLong(0) ===
      src.agg(sum(col("o_orderkey"))).head().getLong(0))
  }
}
