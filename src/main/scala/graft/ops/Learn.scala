package graft.ops

import graft.core.{Pin, QueryDef, Tables, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned quality/filter models trained IN-PLAN — the CCNet/fastText
  * slot of a real curation stack: the rule-based scorers (gopher_rules,
  * quality_score) catch boilerplate, a LEARNED classifier catches
  * distributional junk. Here: a hashed-bag-of-words logistic scorer
  * (hash words into a fixed bucket vector, train a weight per bucket by
  * full-batch gradient descent for a fixed round count, score every
  * document) — the feature hashing + linear-model recipe fastText-style
  * filters use, expressed as one lazy Catalyst plan.
  *
  * Scale shape (the kmeans/kcenter unrolled-loop discipline): the
  * per-document feature vector is built ONCE (row-local transform over
  * the word array; the frame is Pin.tagged-pinned, so the K training
  * rounds + final scoring pass cost K+1 corpus passes, not (K+1)²/2).
  * Each GD round is: one-row weight frame broadcast into a row-local
  * dot product (no join, no corpus shuffle), then a posexplode +
  * groupBy(bucket) gradient aggregate whose shuffle domain is the
  * FIXED bucket count (D+1 = 17 keys — map-side combine collapses every
  * partition to the domain first, the bpe_pair_merges shape), collapsed
  * back to the next one-row weight frame. Weight frames are Pin.pin'd
  * one-row scalar-subquery broadcasts (ScaleSpec `intended`).
  *
  * Cross-engine float discipline (the zipf_fit/curation_pipeline
  * integer-requantization rule — every quantity that crosses an
  * addition-order boundary is fixed-point):
  *  - weights live in 1e-6 integer units (BIGINT), features are raw
  *    token counts (BIGINT) → the logit dot product is EXACT integer
  *    arithmetic, order-independent;
  *  - the sigmoid is the RATIONAL squash 0.5 + z/(2(1+|z|)) — only
  *    +,-,*,/,abs on identical operands, bit-identical IEEE on both
  *    engines (exp-based logistic differs in the last ulp between libm
  *    implementations, which the round-10 sf0.001 sweep showed can flip
  *    a rounded digit at an exact boundary);
  *  - per-document gradient residuals are quantized to 1e-6 BIGINT
  *    units BEFORE the bucket sum, so the gradient aggregate is exact
  *    integer addition in any order; the learning-rate update
  *    floor(g/(50·n) + 0.5) divides identical operands.
  *
  * Label = (count of the token 'spark' ≥ 2) — a WEAK-SUPERVISION target
  * of the fastText-filter kind (keyword-derived, like CCNet's
  * URL-derived labels), chosen because it is genuinely LEARNABLE from
  * the hashed features yet not a function of them: the 16-bucket
  * projection collapses 'spark' with its hash colliders ('stream',
  * 'order', 'key' share bucket 10), so collider-heavy negatives are
  * irreducible hard cases and the model must trade them off. The first
  * candidate label (lang = 'en') was MEASURED unlearnable and dropped:
  * the fixtures draw every language's text from one shared vocabulary
  * (per-language bucket profiles identical to 3 decimals), so any model
  * sits at AUC ≈ 0.5 — a well-trained scorer on it is indistinguishable
  * from a diverged one, the vacuous-gate rule applied to ML. On the
  * keyword label the trained model reaches AUC 0.83/0.85/0.85 at
  * sf0.001/0.01/0.1 with mean p ≈ 0.71 (pos) vs 0.63 (neg) — modest
  * separation is the honest ceiling under hash collisions.
  *
  * LR/rounds (5 rounds, g/(50n)) were tuned in an offline fixed-point
  * simulation replaying the EXACT integer algorithm at all three SFs
  * (the round-8 numpy-first rule): g/(20n) oscillates into collapse
  * (AUC 0.47 at sf0.1 by round 5), g/(2n) — the original setting —
  * diverges to z ≈ −30 where the rational squash saturates at 0.016
  * for EVERY document. Full-batch GD on count features has no
  * per-dataset-size invariance; re-tune LR at a new corpus scale.
  *
  * Output: per (y, source) document count, predicted-positive count at
  * the p ≥ 0.65 cut (tuned to split the learned score range 0.45-0.75
  * at every SF; the conventional 0.5 cut captures every document here),
  * and the 4-dp mean score (integer-exact sum of 1e-6 fixed-point
  * scores, one final division).
  */
object Learn {

  /** Hashed feature buckets; slot D is the bias (constant 1 feature). */
  private val D = 16

  /** Fixed full-batch GD rounds (unrolled in-plan, kcenter discipline). */
  private val Rounds = 5

  /** Spark-side SQL for Text.h32 (md5-prefix 32-bit hash, BIGINT). */
  private def sparkH32(x: String): String =
    s"CAST(conv(substr(md5($x), 1, 8), 16, 10) AS BIGINT)"

  /** Rational sigmoid on a 1e-6 fixed-point logit `zu` — identical IEEE
    * op chain in both engines (see object scaladoc).
    */
  private def pExpr(zu: String): String =
    s"(0.5e0 + ((($zu)) / 1000000e0) / (2e0 * (1e0 + abs((($zu)) / 1000000e0))))"

  /** Row-local exact-integer dot product of the feature vector `x` with
    * the broadcast weight vector `wu` (both BIGINT arrays of length D+1).
    */
  private val dotExpr =
    s"aggregate(sequence(0, $D), CAST(0 AS BIGINT), " +
      "(acc, i) -> acc + element_at(x, i + 1) * element_at(wu, i + 1))"

  /** Shared core: train the scorer (`Rounds` unrolled GD rounds, see object
    * scaladoc) and return every document scored by the FINAL weights —
    * (doc_id, lang, source, y, pq) with pq the 1e-6 fixed-point
    * predicted probability. Used by [[qualityLogit]] (per-group means)
    * and [[scoreCalibration]] (reliability bins); the Pin'd frames are
    * the same data + shape in both, the sanctioned sharing class.
    */
  private[graft] def scoredDocs(s: SparkSession, d: String): DataFrame = {
    // per-doc dense feature vector: bucket b = count of words with
    // h32(word) % D == b; slot D = bias 1. Built once, tagged-pinned.
    val xdocs = Pin.tagged(
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          Text.words(col("text")).as("w"))
        .select(col("doc_id"), col("lang"), col("source"), col("w"),
          when(expr("size(filter(w, t -> t = 'spark'))") >= 2, 1)
            .otherwise(0).as("y"))
        .select(col("doc_id"), col("lang"), col("source"), col("y"),
          expr(s"transform(w, t -> ${sparkH32("t")} % $D)").as("hb"))
        .select(col("doc_id"), col("lang"), col("source"), col("y"),
          expr(s"""transform(sequence(0, $D),
              b -> CASE WHEN b = $D THEN CAST(1 AS BIGINT)
                   ELSE CAST(size(filter(hb, h -> h = b)) AS BIGINT)
                   END)""").as("x")))
    val nn = Pin.pin(xdocs.agg(count(lit(1)).as("n")))
    var w: DataFrame = Pin.pin(s.range(1).select(
      expr(s"transform(sequence(0, $D), b -> CAST(0 AS BIGINT))").as("wu")))
    for (_ <- 1 to Rounds) {
      // residuals quantized to 1e-6 BIGINT before the bucket sum
      val scored = xdocs.crossJoin(broadcast(w))
        .select(col("x"), expr(
          s"""CAST(floor((y - ${pExpr(dotExpr)}) * 1000000e0 + 0.5e0)
              AS BIGINT)""").as("eq"))
      // gradient: domain-bounded shuffle (D+1 keys, map-side combined)
      val g = scored
        .select(posexplode(expr("transform(x, c -> eq * c)"))
          .as(Seq("i", "gi")))
        .groupBy(col("i")).agg(sum(col("gi")).as("g"))
      w = Pin.pin(
        g.agg(expr(
            "transform(array_sort(collect_list(struct(i, g))), s -> s.g)")
            .as("garr"))
          .crossJoin(broadcast(w))
          .crossJoin(broadcast(nn))
          .select(expr(
            """zip_with(wu, garr, (wv, gv) ->
               wv + CAST(floor(gv / (50e0 * n) + 0.5e0) AS BIGINT))""")
            .as("wu")))
    }
    xdocs.crossJoin(broadcast(w))
      .select(col("doc_id"), col("lang"), col("source"), col("y"), expr(
        s"""CAST(floor(${pExpr(dotExpr)} * 1000000e0 + 0.5e0)
            AS BIGINT)""").as("pq"))
  }

  /** DuckDB CTE chain replaying the identical training fixed point,
    * ending in `sc(doc_id, pq)`; both oracles append their own final
    * SELECT (join documents back for lang/source/y).
    */
  private def oracleScoredCtes: String = {
    def sqlP(zu: String) =
      s"(0.5e0 + ((($zu)) / 1000000e0) / (2e0 * (1e0 + abs((($zu)) / 1000000e0))))"
    val ctes = scala.collection.mutable.ArrayBuffer(
      s"""ws AS (SELECT doc_id, lang, source,
            CASE WHEN len(list_filter(w, t -> t = 'spark')) >= 2
                 THEN 1 ELSE 0 END AS y, w
            FROM (SELECT doc_id, lang, source,
                    ${Text.sqlWords("text")} AS w FROM documents))""",
      s"""tok AS (SELECT doc_id, y, CAST(${Text.sqlH32("t")} % $D AS INT) AS b
            FROM (SELECT doc_id, y, unnest(w) AS t FROM ws))""",
      s"""xb AS (SELECT doc_id, y, b, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY 1, 2, 3
            UNION ALL
            SELECT doc_id, y, $D AS b, CAST(1 AS BIGINT) AS c FROM ws)""",
      "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ws)",
      s"w0 AS (SELECT CAST(b AS INT) AS b, CAST(0 AS BIGINT) AS wu FROM range(${D + 1}) t(b))")
    for (r <- 1 to Rounds) ctes ++= Seq(
      s"""z$r AS (SELECT x.doc_id, x.y, CAST(sum(x.c * w.wu) AS BIGINT) AS zu
            FROM xb x JOIN w${r - 1} w USING (b) GROUP BY 1, 2)""",
      s"""e$r AS (SELECT doc_id,
            CAST(floor((y - ${sqlP("zu")}) * 1000000e0 + 0.5e0) AS BIGINT) AS eq
            FROM z$r)""",
      s"""g$r AS (SELECT x.b, CAST(sum(e.eq * x.c) AS BIGINT) AS g
            FROM xb x JOIN e$r e USING (doc_id) GROUP BY 1)""",
      s"""w$r AS (SELECT w.b,
            w.wu + CAST(floor(coalesce(g.g, 0) / (50e0 * nn.n) + 0.5e0) AS BIGINT) AS wu
            FROM w${r - 1} w LEFT JOIN g$r g USING (b), nn)""")
    s"""${ctes.mkString(",\n")},
      zf AS (SELECT x.doc_id, CAST(sum(x.c * w.wu) AS BIGINT) AS zu
             FROM xb x JOIN w$Rounds w USING (b) GROUP BY 1),
      sc AS (SELECT z.doc_id,
               CAST(floor(${sqlP("zu")} * 1000000e0 + 0.5e0) AS BIGINT) AS pq
             FROM zf z)"""
  }

  val qualityLogit: QueryDef = QueryDef(
    "quality_logit",
    (s, d) =>
      scoredDocs(s, d)
        .groupBy(col("y"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pq") >= 650000, 1).otherwise(0)).as("n_pred_pos"),
          (floor(sum(col("pq")) / count(lit(1)) / lit(1000000e0)
            * lit(10000e0) + lit(0.5)) / lit(10000e0)).as("mean_p4"))
        .orderBy(col("y"), col("source")),
    Some(s"""
      WITH $oracleScoredCtes
      SELECT ws.y, ws.source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN sc.pq >= 650000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pred_pos,
             floor((CAST(sum(sc.pq) AS BIGINT) / count(*) / 1000000e0)
               * 10000e0 + 0.5e0) / 10000e0 AS mean_p4
      FROM sc JOIN ws USING (doc_id)
      GROUP BY 1, 2 ORDER BY 1, 2
    """),
    doc = "hashed-bag-of-words logistic scorer trained in-plan (5 GD rounds, fixed-point)")

  /** Reliability diagram + Expected Calibration Error for the learned
    * scorer — the ml-eval step that decides whether [[qualityLogit]]'s
    * p ≥ 0.5 cut can be trusted as a probability (a well-separated
    * classifier can still be badly calibrated; a filtering pipeline
    * that KEEPS top-p% by score needs calibration, not just ranking).
    * Predicted probabilities land in 10 fixed [0.1) bins (integer
    * division of the 1e-6 fixed-point score — no float binning); each
    * bin reports its size, mean predicted probability (confidence) and
    * empirical positive rate (accuracy), and every row carries the
    * global ECE = Σ_b (n_b/N)·|acc_b − conf_b|.
    *
    * Parity: conf/acc are single divisions of exact BIGINT sums
    * (identical operands → identical IEEE doubles); the ECE sum crosses
    * an addition-order boundary, so each bin's term is floor-quantized
    * to a 1e-6-unit BIGINT FIRST (the zipf_fit/curation_pipeline
    * discipline) and only the exact integer sum is divided at the end.
    * Plan: the shared scored frame → one groupBy on the FIXED 10-bin
    * domain (map-side combine) → ECE via an unpartitioned window over
    * the ≤ 10-row bin frame. The window (not an agg + one-row
    * crossJoin) is deliberate: the frame would otherwise be referenced
    * TWICE, and each reference embeds the whole unrolled 5-round
    * training subtree — Catalyst re-analyzes the duplicated tree and
    * the query planned at 4.6 s steady-state vs quality_logit's 1.8
    * (measured, BenchOne sf0.1); single-reference + window is ~2×
    * cheaper with an identical result. An unpartitioned window is
    * normally the 100 TB anti-pattern, but here its input is the
    * fixed 10-bin domain, same class as heavy_hitters' candidate list.
    */
  val scoreCalibration: QueryDef = QueryDef(
    "score_calibration",
    (s, d) => {
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy().rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      scoredDocs(s, d)
        .select(col("y"), col("pq"), least(lit(9),
          expr("pq div 100000")).cast("int").as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("pq")).as("spq"),
          sum(col("y")).as("sy"))
        .select(col("bin"), col("n_docs"),
          (floor(col("spq").cast("double") * lit(10000e0) / col("n_docs")
            / lit(1000000e0) + lit(0.5e0)) / lit(10000e0)).as("conf4"),
          (floor(col("sy").cast("double") * lit(10000e0) / col("n_docs")
            + lit(0.5e0)) / lit(10000e0)).as("acc4"),
          expr("""CAST(floor(n_docs * abs(CAST(sy AS DOUBLE) / n_docs
                  - CAST(spq AS DOUBLE) / n_docs / 1000000e0) * 1000000e0
                  + 0.5e0) AS BIGINT)""").as("tq"))
        .select(col("bin"), col("n_docs"), col("conf4"), col("acc4"),
          (floor(sum(col("tq")).over(wAll).cast("double")
            / sum(col("n_docs")).over(wAll)
            + lit(0.5e0)) / lit(1000000e0)).as("ece6"))
        .orderBy(col("bin"))
    },
    Some(s"""
      WITH $oracleScoredCtes,
      db AS (SELECT ws.doc_id, ws.y, sc.pq,
                    CAST(least(9, sc.pq // 100000) AS INTEGER) AS bin
             FROM sc JOIN ws USING (doc_id)),
      bins AS (
        SELECT bin, count(*) AS n_docs,
               CAST(sum(pq) AS BIGINT) AS spq, CAST(sum(y) AS BIGINT) AS sy
        FROM db GROUP BY 1),
      pres AS (
        SELECT bin, n_docs,
               floor(CAST(spq AS DOUBLE) * 10000e0 / n_docs / 1000000e0
                     + 0.5e0) / 10000e0 AS conf4,
               floor(CAST(sy AS DOUBLE) * 10000e0 / n_docs + 0.5e0)
                 / 10000e0 AS acc4,
               CAST(floor(n_docs * abs(CAST(sy AS DOUBLE) / n_docs
                    - CAST(spq AS DOUBLE) / n_docs / 1000000e0) * 1000000e0
                    + 0.5e0) AS BIGINT) AS tq
        FROM bins)
      SELECT bin, n_docs, conf4, acc4,
             floor(CAST(sum(tq) OVER () AS DOUBLE)
                   / CAST(sum(n_docs) OVER () AS BIGINT) + 0.5e0)
               / 1000000e0 AS ece6
      FROM pres ORDER BY bin
    """),
    doc = "reliability bins + ECE for the learned scorer (fixed-point parity)")

  /** In-plan DISCRIMINATION evaluation for the learned scorer — the AUC
    * companion to [[scoreCalibration]]'s calibration axis (the round-11
    * lesson: oracle parity replays broken training identically in both
    * engines, so each failure axis of an in-plan learner needs its own
    * registered evaluation; calibration caught the diverged model,
    * but a model can be calibrated-on-average yet rank no better than
    * chance). AUC is computed as the tie-aware Mann-Whitney rank-sum
    * statistic (the `mann_whitney_u` machinery): aggregate the scored
    * docs to the DISTINCT-SCORE frame first, midranks from a cumulative
    * count over it (2·midrank = 2·cum_less + t + 1 — exact integers),
    * then AUC = U⁺/(n₊·n₋) with U⁺ from the positive-class rank sum.
    * Everything up to the single final division is exact 64-bit integer
    * arithmetic — no addition-order hazard, hround(·,4) on identical
    * operands in both engines. The cumulative count is an unpartitioned
    * window, safe BECAUSE its input is the distinct-score aggregate:
    * scores are 1e-6 fixed-point probabilities, so the domain is
    * bounded by 10⁶+1 keys at ANY corpus size (same class as
    * score_calibration's 10-bin frame, vs mann_whitney_u's
    * value-cardinality caveat).
    *
    * A dead model (all scores collapsed to one value, the round-11
    * failure) yields a single all-ties bucket → U⁺ = n₊·n₋/2 → AUC
    * exactly 0.5000 — the signature this query exists to expose. The
    * trained scorer sits at 0.83-0.85 across SFs (object scaladoc).
    */
  val qualityAuc: QueryDef = QueryDef(
    "quality_auc",
    (s, d) => {
      val byScore = scoredDocs(s, d)
        .groupBy(col("pq"))
        .agg(count(lit(1)).as("t"), sum(col("y")).cast("long").as("tp"))
      val wLess = org.apache.spark.sql.expressions.Window
        .orderBy(col("pq"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val m = byScore
        .withColumn("mr2",
          lit(2L) * coalesce(sum(col("t")).over(wLess), lit(0L)) +
            col("t") + lit(1L))
        .agg(sum(col("tp")).as("n_pos"),
          sum(col("t") - col("tp")).as("n_neg"),
          sum(col("tp") * col("mr2")).as("r2p"))
      // 2·R⁺ = Σ tp·mr2; U⁺ = R⁺ − n₊(n₊+1)/2; AUC = U⁺/(n₊·n₋)
      //      = (Σ tp·mr2 − n₊(n₊+1)) / (2·n₊·n₋) — one exact division.
      m.select(col("n_pos"), col("n_neg"),
        Text.hround(
          (col("r2p") - col("n_pos") * (col("n_pos") + lit(1L)))
            .cast("double") /
            (lit(2e0) * (col("n_pos") * col("n_neg")).cast("double")), 4)
          .as("auc4"))
    },
    Some(s"""
      WITH $oracleScoredCtes,
      sy AS (SELECT sc.pq, ws.y FROM sc JOIN ws USING (doc_id)),
      bv AS (SELECT pq, CAST(count(*) AS BIGINT) AS t,
               CAST(sum(y) AS BIGINT) AS tp
             FROM sy GROUP BY 1),
      mr AS (SELECT t, tp,
               2 * coalesce(CAST(sum(t) OVER (ORDER BY pq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) + t + 1 AS mr2
             FROM bv),
      m AS (SELECT CAST(sum(tp) AS BIGINT) AS n_pos,
                   CAST(sum(t - tp) AS BIGINT) AS n_neg,
                   CAST(sum(tp * mr2) AS BIGINT) AS r2p FROM mr)
      SELECT n_pos, n_neg,
             ${Text.sqlHround(
        "CAST(r2p - n_pos * (n_pos + 1) AS DOUBLE) / " +
          "(2e0 * CAST(n_pos * n_neg AS DOUBLE))", 4)} AS auc4
      FROM m
    """),
    doc = "tie-aware rank-sum AUC of the learned scorer (discrimination eval; 0.5 = dead model)")

  val all: Seq[QueryDef] = Seq(qualityLogit, scoreCalibration, qualityAuc)
}
