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
  *    floor(0.5·g/n + 0.5) divides identical operands.
  *
  * Label = (lang = 'en'): a deterministic, fixture-derivable target that
  * makes the scorer a learned language-ID filter — the model separates
  * cleanly at every SF (mean score ~0.98 for en vs ~0.02 for de/es/fr/pt
  * groups after 3 rounds), so the gate discriminates (round-4 rule).
  * Output: per (lang, source) document count, predicted-English count at
  * the p ≥ 0.5 cut, and the 4-dp mean score (integer-exact sum of 1e-6
  * fixed-point scores, one final division).
  */
object Learn {

  /** Hashed feature buckets; slot D is the bias (constant 1 feature). */
  private val D = 16

  /** Fixed full-batch GD rounds (unrolled in-plan, kcenter discipline). */
  private val Rounds = 3

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

  val qualityLogit: QueryDef = QueryDef(
    "quality_logit",
    (s, d) => {
      // per-doc dense feature vector: bucket b = count of words with
      // h32(word) % D == b; slot D = bias 1. Built once, tagged-pinned.
      val xdocs = Pin.tagged(
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"),
            when(col("lang") === "en", 1).otherwise(0).as("y"),
            Text.words(col("text")).as("w"))
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
                 wv + CAST(floor(0.5e0 * gv / n + 0.5e0) AS BIGINT))""")
              .as("wu")))
      }
      xdocs.crossJoin(broadcast(w))
        .select(col("lang"), col("source"), expr(
          s"""CAST(floor(${pExpr(dotExpr)} * 1000000e0 + 0.5e0)
              AS BIGINT)""").as("pq"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pq") >= 500000, 1).otherwise(0)).as("n_pred_en"),
          (floor(sum(col("pq")) / count(lit(1)) / lit(1000000e0)
            * lit(10000e0) + lit(0.5)) / lit(10000e0)).as("mean_p4"))
        .orderBy(col("lang"), col("source"))
    },
    Some {
      def sqlP(zu: String) =
        s"(0.5e0 + ((($zu)) / 1000000e0) / (2e0 * (1e0 + abs((($zu)) / 1000000e0))))"
      val ctes = scala.collection.mutable.ArrayBuffer(
        s"""ws AS (SELECT doc_id, lang, source,
              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
              ${Text.sqlWords("text")} AS w FROM documents)""",
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
              w.wu + CAST(floor(0.5e0 * coalesce(g.g, 0) / nn.n + 0.5e0) AS BIGINT) AS wu
              FROM w${r - 1} w LEFT JOIN g$r g USING (b), nn)""")
      s"""
      WITH ${ctes.mkString(",\n")},
      zf AS (SELECT x.doc_id, CAST(sum(x.c * w.wu) AS BIGINT) AS zu
             FROM xb x JOIN w$Rounds w USING (b) GROUP BY 1),
      sc AS (SELECT z.doc_id,
               CAST(floor(${sqlP("zu")} * 1000000e0 + 0.5e0) AS BIGINT) AS pq
             FROM zf z)
      SELECT d.lang, d.source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN sc.pq >= 500000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pred_en,
             floor((CAST(sum(sc.pq) AS BIGINT) / count(*) / 1000000e0)
               * 10000e0 + 0.5e0) / 10000e0 AS mean_p4
      FROM sc JOIN documents d USING (doc_id)
      GROUP BY 1, 2 ORDER BY 1, 2
    """
    },
    doc = "hashed-bag-of-words logistic scorer trained in-plan (3 GD rounds, fixed-point)")

  val all: Seq[QueryDef] = Seq(qualityLogit)
}
