package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Fixture-drift canary (round-7 verdict, next-round item #5).
  *
  * The 2026-08-13 harness fixture regeneration silently broke 55 round-6
  * queries (events TIMESTAMP encoding change) and collapsed the ANN
  * operating point (LSH recall@5 0.92 → 0.20) — a full round went into
  * diagnosing it at the bench. This spec pins integer-exact fingerprints
  * of every fixture the engine's data-dependent parameters were tuned
  * against, at ALL THREE SFs, so the NEXT regeneration fails HERE, in
  * minutes, with a checklist, not downstream.
  *
  * If this suite is red and others are green: the fixtures changed.
  * Do NOT chase query bugs. Retune checklist:
  *   1. re-measure ANN recall at all three SFs and retune
  *      AnnBits/AnnBands + IVF nprobe (parameter scaladoc in
  *      ops/Extended.scala) until the 0.6 recall@5 floors clear;
  *   2. re-check the data-dependent cuts for non-vacuous, DISCRIMINATING
  *      output (embed_near_dup ≥0.2, paraphrase_pairs ≥0.35,
  *      semantic_dedup ≥0.35, embed_outliers p5, heavy-hitter k) at
  *      sf0.01 AND sf0.1;
  *   3. full `scripts/check.py` pass at sf0.01;
  *   4. refresh bench_baseline.json from a calm run;
  *   5. update the fingerprints below LAST.
  */
class FixtureCanarySpec extends SparkSpec {

  private val hint = "fixtures changed — run the FixtureCanarySpec retune " +
    "checklist (scaladoc), then update the pinned fingerprints"

  /** Integer-exact profile of one SF directory (no float compares). */
  private def profile(d: String): Map[String, Long] = {
    val counts = Seq(
      "region" -> Tables.region(spark, d), "nation" -> Tables.nation(spark, d),
      "customer" -> Tables.customer(spark, d),
      "supplier" -> Tables.supplier(spark, d), "part" -> Tables.part(spark, d),
      "orders" -> Tables.orders(spark, d)
    ).map { case (n, df) => s"n_$n" -> df.count() }
    val li = Tables.lineitem(spark, d)
      .agg(count(lit(1)), sum(col("l_orderkey"))).head()
    val ev = Tables.events(spark, d)
      .agg(count(lit(1)), min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).head()
    val doc = Tables.documents(spark, d)
      .agg(count(lit(1)), sum(col("n_chars")), countDistinct(col("lang")),
        sum(col("doc_id"))).head()
    val emb = Tables.embeddings(spark, d)
      .agg(count(lit(1)),
        sum(when(element_at(col("embedding"), 1) >= 0, 1L).otherwise(0L)),
        sum(expr("size(filter(embedding, x -> x >= 0))").cast("long")),
        sum(col("vec_id")), countDistinct(col("label")),
        max(size(col("embedding"))), min(size(col("embedding")))).head()
    (counts ++ Seq(
      "n_lineitem" -> li.getLong(0), "sum_okey" -> li.getLong(1),
      "n_events" -> ev.getLong(0), "ev_min_us" -> ev.getLong(1),
      "ev_max_us" -> ev.getLong(2),
      "n_documents" -> doc.getLong(0), "sum_nchars" -> doc.getLong(1),
      "n_langs" -> doc.getLong(2), "sum_docid" -> doc.getLong(3),
      "n_embeddings" -> emb.getLong(0), "emb_pos_first" -> emb.getLong(1),
      "emb_pos_all" -> emb.getLong(2), "sum_vecid" -> emb.getLong(3),
      "n_labels" -> emb.getLong(4), "emb_dim_max" -> emb.getInt(5).toLong,
      "emb_dim_min" -> emb.getInt(6).toLong)).toMap
  }

  private def check(sf: String, expected: Map[String, Long]): Unit = {
    val got = profile(s"/root/testdata/$sf")
    val drift = (expected.keySet ++ got.keySet).toSeq.sorted.flatMap { k =>
      (expected.get(k), got.get(k)) match {
        case (Some(e), Some(g)) if e == g => None
        case (e, g) => Some(s"$k: expected ${e.getOrElse("?")} got ${g.getOrElse("?")}")
      }
    }
    assert(drift.isEmpty, s"[$sf] $hint\n  ${drift.mkString("\n  ")}")
  }

  // Fingerprints captured 2026-08-13 (post-regeneration fixtures the
  // round-8 parameters are tuned against).
  test("sf0.001 fixtures match the tuned-against fingerprint") {
    check("sf0.001", Map(
      "n_region" -> 5L, "n_nation" -> 25L, "n_customer" -> 150L,
      "n_supplier" -> 10L, "n_part" -> 200L, "n_orders" -> 1500L,
      "n_lineitem" -> 6000L, "sum_okey" -> 4489525L,
      "n_events" -> 1000L, "ev_min_us" -> 1704067798778549L,
      "ev_max_us" -> 1706657176220708L,
      "n_documents" -> 500L, "sum_nchars" -> 153156L, "n_langs" -> 5L,
      "sum_docid" -> 124750L,
      "n_embeddings" -> 500L, "emb_pos_first" -> 245L,
      "emb_pos_all" -> 15771L, "sum_vecid" -> 124750L, "n_labels" -> 10L,
      "emb_dim_max" -> 64L, "emb_dim_min" -> 64L))
  }

  test("sf0.01 fixtures match the tuned-against fingerprint") {
    check("sf0.01", Map(
      "n_region" -> 5L, "n_nation" -> 25L, "n_customer" -> 1500L,
      "n_supplier" -> 100L, "n_part" -> 2000L, "n_orders" -> 15000L,
      "n_lineitem" -> 60000L, "sum_okey" -> 451230286L,
      "n_events" -> 10000L, "ev_min_us" -> 1704067207179575L,
      "ev_max_us" -> 1706659032194062L,
      "n_documents" -> 500L, "sum_nchars" -> 149174L, "n_langs" -> 5L,
      "sum_docid" -> 124750L,
      "n_embeddings" -> 500L, "emb_pos_first" -> 254L,
      "emb_pos_all" -> 15955L, "sum_vecid" -> 124750L, "n_labels" -> 10L,
      "emb_dim_max" -> 64L, "emb_dim_min" -> 64L))
  }

  test("sf0.1 fixtures match the tuned-against fingerprint") {
    check("sf0.1", Map(
      "n_region" -> 5L, "n_nation" -> 25L, "n_customer" -> 15000L,
      "n_supplier" -> 1000L, "n_part" -> 20000L, "n_orders" -> 150000L,
      "n_lineitem" -> 600000L, "sum_okey" -> 44987812788L,
      "n_events" -> 100000L, "ev_min_us" -> 1704067211172425L,
      "ev_max_us" -> 1706659165261702L,
      "n_documents" -> 5000L, "sum_nchars" -> 1485576L, "n_langs" -> 5L,
      "sum_docid" -> 12497500L,
      "n_embeddings" -> 2000L, "emb_pos_first" -> 995L,
      "emb_pos_all" -> 63938L, "sum_vecid" -> 1999000L, "n_labels" -> 10L,
      "emb_dim_max" -> 64L, "emb_dim_min" -> 64L))
  }
}
