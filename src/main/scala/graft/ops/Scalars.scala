package graft.ops

import graft.core.{QueryDef, Tables, Text}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar / projection operators (SURVEY.md §2 P1-P6).
  *
  * Everything here is pure Catalyst `Column` algebra — zero UDFs, so every
  * expression stays inside whole-stage codegen (the reference's only scalar
  * candidate, the VPD formula, is vectorized numpy:
  * /root/reference/scripts/process_climate_amazon_monthly.py:103-125).
  */
object Scalars {

  /** ANSI-safe arithmetic surface: Spark 4 runs ANSI mode by default, so
    * division by zero / overflowing casts / malformed parses THROW — the
    * right default for correctness, but a 100 TB batch job must not die
    * on row 3 trillion. The `try_*` family is the per-expression
    * escape hatch: errors become NULLs, counted and quarantined instead
    * of fatal. Here: value/(value-value) forces /0 on every row
    * (try_divide → NULL), a cast to TINYINT overflows for most user_ids
    * (try_cast → NULL), and props parses as JSON where valid.
    */
  val safeMath: QueryDef = QueryDef(
    "safe_math",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr("try_divide(value, value - value)").as("div0"),
          expr("try_cast(user_id AS TINYINT)").as("tiny"),
          expr("try_cast(substr(props, 1, 1) AS INT)").as("badparse"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(col("div0")).as("n_div_ok"),
          count(col("tiny")).as("n_tiny_ok"),
          count(col("badparse")).as("n_parse_ok"))
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type, count(*) AS n,
             count(value / nullif(value - value, 0)) AS n_div_ok,
             count(CASE WHEN user_id BETWEEN -128 AND 127
                        THEN user_id END) AS n_tiny_ok,
             count(TRY_CAST(substr(props, 1, 1) AS INTEGER)) AS n_parse_ok
      FROM events GROUP BY 1 ORDER BY 1
    """),
    doc = "ANSI-safe try_divide/try_cast: errors -> NULL, counted not fatal")

  /** Spark 4 VARIANT — the semi-structured column type that replaces
    * string-JSON + get_json_object at scale: `parse_json` shreds once
    * into a binary-encoded tree, every `variant_get` is then a direct
    * path read (no re-parse per extraction — with string JSON, N
    * extractions = N full parses of every row). `try_variant_get` is
    * the missing-path-safe read (NULL, not error). The oracle mirrors
    * with DuckDB's native JSON extraction.
    */
  val variantShred: QueryDef = QueryDef(
    "variant_shred_agg",
    (s, d) =>
      Tables.events(s, d)
        .select(parse_json(col("props")).as("v"))
        .select(
          variant_get(col("v"), "$.k", "int").as("k"),
          try_variant_get(col("v"), "$.absent", "int").as("miss"))
        .groupBy((col("k") % 5).as("k_mod"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          count(col("miss")).as("n_miss"))
        .orderBy(col("k_mod").asc_nulls_first),
    Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 5 AS k_mod,
             count(*) AS n,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
             count(CAST(json_extract_string(props, '$.absent') AS INTEGER)) AS n_miss
      FROM events GROUP BY 1 ORDER BY 1 NULLS FIRST
    """),
    doc = "VARIANT shred-once + path reads (parse_json/variant_get/try_variant_get)")

  /** P2 — the reference's VPD (vapor-pressure deficit) formula
    * (monthly.py:121-125, README.md:169-173):
    *   tmean = (tmax+tmin)/2
    *   es    = 0.6108 * exp(17.27*tmean / (tmean+237.3))
    *   ea    = es * rh/100
    *   vpd   = es - ea
    * Pure built-in math → codegen'd, no UDF.
    */
  def vpd(tmax: Column, tmin: Column, rh: Column): Column = {
    val tmean = (tmax + tmin) / lit(2.0)
    val es    = lit(0.6108) * exp(lit(17.27) * tmean / (tmean + lit(237.3)))
    val ea    = es * rh / lit(100.0)
    es - ea
  }

  def sqlVpd(tmax: String, tmin: String, rh: String): String = {
    val tmean = s"(($tmax + $tmin) / 2.0)"
    val es    = s"(0.6108 * exp(17.27 * $tmean / ($tmean + 237.3)))"
    s"($es - $es * $rh / 100.0)"
  }

  /** P2 applied to the fixture schema: tmax≅l_quantity, tmin≅l_quantity-10,
    * rh≅l_tax*1000 (∈[0,80]) — same algebra, same shape.
    */
  val vpdQuery: QueryDef = QueryDef(
    "vpd_scalar",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          bround(vpd(col("l_quantity"), col("l_quantity") - lit(10.0),
            col("l_tax") * lit(1000.0)), 4).as("vpd"))
        // full-tuple sort: (l_orderkey, l_linenumber) is not unique
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("vpd")),
    Some(s"""
      SELECT l_orderkey, l_linenumber,
             round_even(${sqlVpd("l_quantity", "(l_quantity - 10.0)", "(l_tax * 1000.0)")}, 4) AS vpd
      FROM lineitem ORDER BY l_orderkey, l_linenumber, vpd
    """),
    doc = "P2 VPD column algebra (no UDF)")

  /** P1 — projection with fixed column order (monthly.py:446-449). */
  val projection: QueryDef = QueryDef(
    "project_reorder",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_linestatus"), col("l_quantity")),
    Some("""
      SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_quantity
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
    """),
    doc = "P1 column projection/reorder; prunes scan to 5 columns")

  /** P3 — date-part derivation (monthly.py:312-313). */
  val dateparts: QueryDef = QueryDef(
    "date_parts",
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("year"),
          quarter(col("o_orderdate")).as("quarter"),
          month(col("o_orderdate")).as("month"),
          dayofmonth(col("o_orderdate")).as("day"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS year,
             CAST(quarter(o_orderdate) AS INTEGER) AS quarter,
             CAST(month(o_orderdate) AS INTEGER) AS month,
             CAST(day(o_orderdate) AS INTEGER) AS day
      FROM orders ORDER BY o_orderkey
    """),
    doc = "P3 year/quarter/month/day derivation")

  /** P4 — half-even rounding parity: pandas round(2) is banker's rounding
    * (monthly.py:452-455); Spark `bround` == DuckDB `round` == numpy.
    */
  val rounding: QueryDef = QueryDef(
    "round_half_even",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          bround(col("l_extendedprice") / lit(7.0), 2).as("p7"),
          bround(col("l_quantity") / lit(4.0), 1).as("q4"),
          bround(col("l_discount") * lit(50.0), 0).as("d50"))
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("p7"), col("q4"), col("d50")),
    Some("""
      SELECT l_orderkey, l_linenumber,
             round_even(l_extendedprice / 7.0, 2) AS p7,
             round_even(l_quantity / 4.0, 1) AS q4,
             round_even(l_discount * 50.0, 0) AS d50
      FROM lineitem ORDER BY l_orderkey, l_linenumber, p7, q4, d50
    """),
    doc = "P4 banker's rounding (bround) parity incl. .5 boundaries")

  /** P6 — substring + dictionary map (UF from CD_MUN prefix,
    * monthly.py:147-154): first digit of the customer key mapped through a
    * small broadcast lookup (the Spark-native form of a dict `.map()`).
    */
  val substrMap: QueryDef = QueryDef(
    "substr_dict_map",
    (s, d) => {
      val lookup = s.createDataFrame(
        (0 to 9).map(i => (i.toString, s"G${i % 3}"))
      ).toDF("prefix", "grp")
      Tables.customer(s, d)
        .withColumn("prefix", substring(col("c_custkey").cast("string"), 1, 1))
        .join(broadcast(lookup), Seq("prefix"))
        .select(col("c_custkey"), col("prefix"), col("grp"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, substr(CAST(c_custkey AS VARCHAR), 1, 1) AS prefix,
             'G' || (CAST(substr(CAST(c_custkey AS VARCHAR), 1, 1) AS INT) % 3) AS grp
      FROM customer ORDER BY c_custkey
    """),
    doc = "P6 substring + broadcast dictionary map")

  /** P5 — literal/constant column attach (the reference tags each
    * municipality's agg frame with `CD_MUN`/`NM_MUN`/`UF` constants,
    * monthly.py:328,421-427): per-key agg rows with literal run metadata.
    */
  val literalAttach: QueryDef = QueryDef(
    "literal_attach",
    (s, d) =>
      Tables.supplier(s, d)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"))
        .withColumn("region_tag", lit("NORTH"))
        .withColumn("run_year", lit(2024))
        .select(col("s_nationkey"), col("n_supp"), col("region_tag"), col("run_year"))
        .orderBy(col("s_nationkey")),
    Some("""
      SELECT s_nationkey, count(*) AS n_supp, 'NORTH' AS region_tag,
             2024 AS run_year
      FROM supplier GROUP BY 1 ORDER BY 1
    """),
    doc = "P5 literal/constant column attach on agg rows")

  /** Semi-structured: parse the events.props JSON-string column with an
    * explicit schema (from_json — codegen'd Jackson parse, row-local, no
    * UDF) and aggregate on the extracted field. The engine treatment for
    * sidecar JSON payloads at scale: parse AFTER pushdown-able filters,
    * with a typed schema so downstream stays columnar.
    */
  val jsonProps: QueryDef = QueryDef(
    "json_props_agg",
    (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") =!= "error")
        .withColumn("k",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"),
          graft.core.Num.sum2(col("value")).as("sum_value"))
        // explicit NULLS FIRST on both sides: Spark ASC defaults to nulls
        // first, DuckDB to nulls last — an unparseable props row would
        // otherwise flip the positional row order between engines
        .orderBy(col("k_mod").asc_nulls_first),
    Some(s"""
      SELECT CAST(props->>'k' AS INTEGER) % 10 AS k_mod, count(*) AS n,
             ${graft.core.Num.sqlSum2("value")} AS sum_value
      FROM events WHERE event_type <> 'error'
      GROUP BY 1 ORDER BY k_mod ASC NULLS FIRST
    """),
    doc = "semi-structured: from_json typed parse of a JSON-string column + agg")

  /** Haversine great-circle distance — the geodesic scalar the reference's
    * domain implies everywhere (its grids are lat/lon; nearest-cell
    * selection at the equator-ish Amazon is fine on snapped degrees, but
    * any distance REPORTING needs km). Pure built-in trig → codegen'd, no
    * UDF (a custom Expression would buy nothing: every op here is already
    * a codegen'd intrinsic). The scoring arithmetic is ONE shared SQL text
    * evaluated by both engines (the BM25 trick) so every IEEE rounding
    * step is identical; trig intrinsics may differ in the last ulp between
    * the JVM and libm, so the km result is hround'd to 3 dp (meter
    * precision) — a mismatch would need a value within an ulp of a
    * .0005 m boundary. `least(1, ·)` clamps the asin operand against
    * float drift past 1 on antipodal-ish pairs. Coordinates are fabricated
    * deterministically from customer columns (fixture has no geo columns);
    * the algebra is the real thing.
    */
  private val sqlLat = "(abs(c_acctbal) % 120e0 - 60e0)"
  private val sqlLon = "(abs(CAST(c_custkey AS DOUBLE) * 7.3e0) % 360e0 - 180e0)"
  private[graft] def sqlHaversineKm(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"2e0 * 6371.0088e0 * asin(sqrt(least(1e0, " +
      s"pow(sin(radians(($lat2 - ($lat1)) / 2e0)), 2e0) + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * " +
      s"pow(sin(radians(($lon2 - ($lon1)) / 2e0)), 2e0))))"

  val haversine: QueryDef = QueryDef(
    "haversine_dist",
    (s, d) => {
      // fixed reference point: Manaus (the reference's region centroid-ish)
      val dist = sqlHaversineKm(sqlLat, sqlLon, "(-3.119e0)", "(-60.0217e0)")
      Tables.customer(s, d)
        .select(col("c_custkey"),
          Text.hround(expr(sqlLat), 4).as("lat"),
          Text.hround(expr(sqlLon), 4).as("lon"),
          Text.hround(expr(dist), 3).as("dist_km"))
        .orderBy(col("c_custkey"))
    },
    Some(s"""
      SELECT c_custkey,
             ${Text.sqlHround(sqlLat, 4)} AS lat,
             ${Text.sqlHround(sqlLon, 4)} AS lon,
             ${Text.sqlHround(
        sqlHaversineKm(sqlLat, sqlLon, "(-3.119e0)", "(-60.0217e0)"), 3)} AS dist_km
      FROM customer ORDER BY c_custkey
    """),
    doc = "great-circle km via haversine (shared-text IEEE algebra, 3dp)")

  val all: Seq[QueryDef] =
    Seq(vpdQuery, projection, dateparts, rounding, substrMap, literalAttach,
      jsonProps, haversine, safeMath, variantShred)
}
