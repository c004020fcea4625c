package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Pin, QueryDef, Tables, Text}

/** Embedding-space clustering and classification for corpus curation:
  * distributed k-means (diversity bucketing / semantic sharding), global
  * centroid-distance outlier filtering (drop broken or off-distribution
  * embeddings before training), and kNN label propagation (extend sparse
  * labels to the whole corpus).
  *
  * Cross-engine determinism discipline (see graft.core.Num): every
  * aggregate whose float summation order varies across partitions is
  * quantized to integer MICRO-UNITS first — `floor(x·1e6 + 0.5)` as
  * BIGINT — so the sum is exact long arithmetic (order-free, identical
  * in DuckDB), and the only float ops are single IEEE
  * divisions/multiplications of identical operands on both engines.
  * Dot products use the codegen'd graft_dot expression, whose
  * left-to-right summation matches DuckDB's list_dot_product
  * term-for-term (functions/DotProduct.scala).
  */
object Clustering {

  /** embeddings → (vec_id, label, v: array<double>, nrm). Double-cast
    * BEFORE any arithmetic so both engines operate on identical values.
    */
  private def base(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
  }

  private val sqlBase =
    "SELECT vec_id, label, embedding::DOUBLE[] AS v, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm " +
      "FROM embeddings"

  // ---- k-means ----------------------------------------------------------

  /** Cluster count. Seeds are the k lowest vec_ids — deterministic and
    * present at every SF (fixtures are 500-2000 vectors; production
    * would seed by k-means|| but any deterministic seed keeps the
    * oracle exact).
    */
  private val K = 8

  /** Lloyd iterations: 2 centroid updates + a final assignment. Fixed
    * (not convergence-tested) so the oracle unrolls to the same depth.
    */
  private val Iters = 2

  /** One assignment pass: nearest centroid by squared L2 distance,
    * rounded to 6 dp (hround) so ties break identically cross-engine,
    * then by cid. dist² = v·v − 2·v·c + c·c — three deterministic dots.
    * The argmin is `min(struct(d6, cid, …))` — ONE shuffle by vec_id
    * with partial aggregation, no window. Centroids ride as an explicit
    * broadcast (K rows): the BNLJ expansion is K-bounded by construction
    * (ScaleSpec intends it), the distributed-k-means shape at any scale.
    */
  private def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .withColumn("d6", Text.hround(
        expr("graft_dot(v, v) - 2 * graft_dot(v, c) + graft_dot(c, c)"), 6))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d6"), col("cid"), col("v"))).as("m"))
      .select(col("vec_id"), col("m.d6").as("d6"), col("m.cid").as("cid"),
        col("m.v").as("v"))

  /** One update pass: per-dimension mean of the member vectors, computed
    * on micro-quantized components (exact long sums — order-free), then
    * one division per dimension. Rebuilt into an array ordered by
    * dimension index. Shuffle keys are (cid, pos) then cid — N·D rows,
    * map-side combined; never wider than the corpus itself.
    */
  private def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .withColumn("q", expr("CAST(floor(x * 1000000e0 + 0.5e0) AS BIGINT)"))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      .select(col("cid"), col("pos"),
        (col("sq").cast("double") / col("n").cast("double") / lit(1e6)).as("m"))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
        .as("c"))

  /** DuckDB mirror of one assign+update round; `prev` names the centroid
    * CTE feeding the round. generate_series is 1-based where Spark's
    * posexplode is 0-based — irrelevant, pos only orders the rebuild.
    */
  private def sqlRound(i: Int, prev: String): String = s"""
      d$i AS (SELECT n.vec_id, n.v, c.cid,
               ${Text.sqlHround(
      "list_dot_product(n.v, n.v) - 2 * list_dot_product(n.v, c.c)" +
        " + list_dot_product(c.c, c.c)", 6)} AS d6
             FROM n, $prev c),
      a$i AS (SELECT vec_id, v, cid, d6 FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY d6, cid) AS rn FROM d$i) WHERE rn = 1),
      u$i AS (SELECT cid, unnest(generate_series(1, len(v))) AS pos,
               unnest([CAST(floor(x * 1000000e0 + 0.5e0) AS BIGINT) FOR x IN v]) AS q
             FROM a$i),
      m$i AS (SELECT cid, pos,
               CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000e0 AS m
             FROM u$i GROUP BY 1, 2),
      c$i AS (SELECT cid, list(m ORDER BY pos) AS c FROM m$i GROUP BY 1)"""

  /** Distributed k-means over the embedding corpus — the curation
    * primitive behind semantic sharding, diversity-balanced sampling,
    * and cluster-then-filter quality passes. K seed centroids, `Iters`
    * Lloyd rounds, final assignment; emits per-cluster size, mean
    * (rounded) squared distance, and centroid norm. Every round is one
    * broadcast of K centroid rows + two corpus-sized shuffles
    * (vec_id argmin; (cid,pos) means) — the canonical distributed
    * k-means; no collect, the whole loop is one lazy plan.
    */
  val kmeansEmbed: QueryDef = QueryDef(
    "kmeans_embed",
    (s, d) => {
      val vecs = base(s, d).select(col("vec_id"), col("v"))
      val c0 = vecs.filter(col("vec_id") < K)
        .select(col("vec_id").cast("int").as("cid"), col("v").as("c"))
      val cN = (1 to Iters).foldLeft(c0)((c, _) => update(assign(vecs, c)))
      val aF = assign(vecs, cN)
      val agg = aF.groupBy(col("cid")).agg(
        count(lit(1)).as("n_vecs"),
        expr("sum(CAST(floor(d6 * 1000000e0 + 0.5e0) AS BIGINT))").as("sq"))
        .select(col("cid"), col("n_vecs"), Text.hround(
          col("sq").cast("double") / col("n_vecs").cast("double") / lit(1e6), 6)
          .as("mean_d6"))
      agg.join(cN.select(col("cid"),
          Text.hround(sqrt(expr("graft_dot(c, c)")), 6).as("cnorm6")),
        Seq("cid"))
        .orderBy(col("cid"))
    },
    Some {
      val rounds = (1 to Iters).map(i =>
        sqlRound(i, if (i == 1) "c0" else s"c${i - 1}")).mkString(",")
      val f = Iters + 1
      s"""
      WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS c FROM n WHERE vec_id < $K),
      $rounds,
      d$f AS (SELECT n.vec_id, c.cid,
               ${Text.sqlHround(
        "list_dot_product(n.v, n.v) - 2 * list_dot_product(n.v, c.c)" +
          " + list_dot_product(c.c, c.c)", 6)} AS d6
             FROM n, c$Iters c),
      a$f AS (SELECT vec_id, cid, d6 FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY d6, cid) AS rn FROM d$f) WHERE rn = 1),
      ag AS (SELECT cid, count(*) AS n_vecs,
               ${Text.sqlHround(
        "CAST(sum(CAST(floor(d6 * 1000000e0 + 0.5e0) AS BIGINT)) AS DOUBLE)" +
          " / CAST(count(*) AS DOUBLE) / 1000000e0", 6)} AS mean_d6
             FROM a$f GROUP BY 1),
      cn AS (SELECT cid, ${Text.sqlHround("sqrt(list_dot_product(c, c))", 6)}
               AS cnorm6 FROM c$Iters)
      SELECT cid, n_vecs, mean_d6, cnorm6 FROM ag JOIN cn USING (cid)
      ORDER BY cid
    """
    },
    doc = s"distributed k-means (K=$K, $Iters Lloyd rounds) over embeddings")

  // ---- centroid-distance outlier filter ---------------------------------

  /** Flag the ~5% of embeddings least aligned with the corpus centroid —
    * the cheap first-pass filter for corrupt or off-distribution vectors
    * before they poison training. Global mean vector via micro-quantized
    * per-dimension means (one (pos)-keyed shuffle, exact long sums), then
    * cosine-to-centroid per vector and an exact interpolated 5th
    * percentile as the cut. Threshold parity: the percentile interpolates
    * between two adjacent sorted INTEGER micro-cosines with fractional
    * weight 0.95 at every fixture SF (N=500/500/2000 → (N−1)·0.05 ends
    * in .95), so a last-ulp formula difference between engines sits
    * ≥0.05·gap from either neighbor and can never move a row across the
    * cut. Scale shape: two one-row broadcast scalars (mean vector,
    * threshold — ScaleSpec-intended BNLJs), no global sort anywhere; the
    * scored subtree is referenced twice (threshold + filter) but column
    * pruning reduces the threshold branch to the micro-cosine alone.
    */
  val embedOutliers: QueryDef = QueryDef(
    "embed_outliers",
    (s, d) => {
      val vecs = base(s, d).select(col("vec_id"), col("v"), col("nrm"))
      val g = vecs.select(posexplode(col("v")).as(Seq("pos", "x")))
        .withColumn("q", expr("CAST(floor(x * 1000000e0 + 0.5e0) AS BIGINT)"))
        .groupBy(col("pos"))
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
        .select(col("pos"),
          (col("sq").cast("double") / col("n").cast("double") / lit(1e6)).as("m"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
          .as("g"))
        .withColumn("gn", sqrt(expr("graft_dot(g, g)")))
      val scored = vecs.crossJoin(broadcast(g))
        .withColumn("cos6",
          Text.hround(expr("graft_dot(v, g)") / (col("nrm") * col("gn")), 6))
        .withColumn("qc", expr("CAST(floor(cos6 * 1000000e0 + 0.5e0) AS BIGINT)"))
      val thr = scored.agg(expr("percentile(qc, 0.05e0)").as("thr"))
      scored.crossJoin(broadcast(thr))
        .filter(col("qc") <= col("thr"))
        .select(col("vec_id"), col("cos6"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
                 FROM embeddings),
      u AS (SELECT unnest(generate_series(1, len(v))) AS pos,
              unnest([CAST(floor(x * 1000000e0 + 0.5e0) AS BIGINT) FOR x IN v]) AS q
            FROM n),
      m AS (SELECT pos, CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000e0 AS m
            FROM u GROUP BY 1),
      g AS (SELECT list(m ORDER BY pos) AS g FROM m),
      gg AS (SELECT g, sqrt(list_dot_product(g, g)) AS gn FROM g),
      sc AS (SELECT vec_id,
               ${Text.sqlHround("list_dot_product(n.v, gg.g) / (n.nrm * gg.gn)", 6)} AS cos6
             FROM n, gg),
      sq AS (SELECT vec_id, cos6,
               CAST(floor(cos6 * 1000000e0 + 0.5e0) AS BIGINT) AS qc FROM sc),
      t AS (SELECT quantile_cont(qc, 0.05e0) AS thr FROM sq)
      SELECT vec_id, cos6 FROM sq, t WHERE qc <= thr ORDER BY vec_id
    """),
    doc = "bottom-5% cosine-to-corpus-centroid embedding outliers")

  // ---- kNN label propagation --------------------------------------------

  /** kNN classification of the held-out query set (vec_id % 100 == 0)
    * from the labeled rest of the corpus: 10 nearest neighbors by
    * cosine, majority label (ties → smaller label). The per-query
    * accuracy bit is the curation metric (label-propagation fidelity).
    * Query side is tiny and broadcast (the embed_cosine_topk shape,
    * ScaleSpec-intended BNLJ); at production fan-out the brute-force
    * scoring swaps for the embed_ann_lsh candidate join — same
    * vote/rank tail.
    */
  val knnClassify: QueryDef = QueryDef(
    "knn_classify",
    (s, d) => {
      val all = base(s, d)
      val q = all.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("label").as("true_label"),
          col("v").as("qv"), col("nrm").as("qn"))
      val train = all.filter(col("vec_id") % 100 =!= 0)
      val cand = train.crossJoin(broadcast(q))
        .withColumn("cos6",
          Text.hround(expr("graft_dot(qv, v)") / (col("qn") * col("nrm")), 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id"))
        .orderBy(col("cos6").desc, col("vec_id").asc)
      val nn = cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      val votes = nn.groupBy(col("q_id"), col("true_label"), col("label"))
        .agg(count(lit(1)).as("n_votes"))
      val wv = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id"))
        .orderBy(col("n_votes").desc, col("label").asc)
      votes.withColumn("vr", row_number().over(wv)).filter(col("vr") === 1)
        .select(col("q_id"), col("true_label"),
          col("label").as("pred_label"),
          (col("label") === col("true_label")).as("correct"))
        .orderBy(col("q_id"))
    },
    Some(s"""
      WITH n AS ($sqlBase),
      q AS (SELECT vec_id AS q_id, label AS true_label, v AS qv, nrm AS qn
            FROM n WHERE vec_id % 100 = 0),
      tr AS (SELECT * FROM n WHERE vec_id % 100 <> 0),
      cand AS (SELECT q.q_id, q.true_label, tr.vec_id, tr.label,
                 ${Text.sqlHround("list_dot_product(q.qv, tr.v) / (q.qn * tr.nrm)", 6)} AS cos6
               FROM q, tr),
      nn AS (SELECT * FROM (
               SELECT *, row_number() OVER (PARTITION BY q_id
                 ORDER BY cos6 DESC, vec_id) AS rn FROM cand) WHERE rn <= 10),
      votes AS (SELECT q_id, true_label, label, count(*) AS n_votes
                FROM nn GROUP BY 1, 2, 3)
      SELECT q_id, true_label, label AS pred_label,
             label = true_label AS correct
      FROM (SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY n_votes DESC, label) AS vr FROM votes)
      WHERE vr = 1 ORDER BY q_id
    """),
    doc = "10-NN majority-vote label propagation for the held-out query set")

  /** kNN label propagation at production fan-out — the swap the
    * knn_classify scaladoc promises: candidate generation is the
    * embed_ann_lsh band machinery (Extended.annBands — AnnBands
    * sign-LSH tables, query buckets broadcast, candidates from a BAND
    * EQUI-JOIN on (band, code)), then the exact cosine ranking and
    * majority-vote tail are identical to the brute-force twin. At 100 TB
    * the brute-force NLJ scores Q·N pairs; this scores
    * Q·bands·N/2^AnnBits — the constant that makes label propagation
    * affordable at corpus scale, with ann_recall quantifying the recall
    * cost on the same data. Neighbors the LSH tables miss can shrink a
    * query's vote pool below 10 (or to zero — such queries are not
    * emitted, like near-dup singletons); the oracle mirrors the candidate
    * generation exactly, so the vote is hash-checked cross-engine.
    */
  val knnClassifyAnn: QueryDef = QueryDef(
    "knn_classify_ann",
    (s, d) => {
      val all = base(s, d)
      val bands = Extended.annBands(all.select(col("vec_id"), col("v")))
      val qb = bands.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("band"), col("code"))
      val cand = bands.filter(col("vec_id") % 100 =!= 0)
        .join(broadcast(qb), Seq("band", "code"))
        .select(col("q_id"), col("vec_id")).distinct()
      val scored = cand
        .join(all.select(col("vec_id").as("q_id"), col("label").as("true_label"),
          col("v").as("qv"), col("nrm").as("qn")).hint("shuffle_hash"), Seq("q_id"))
        .join(all.hint("shuffle_hash"), Seq("vec_id"))
        .withColumn("cos6",
          Text.hround(expr("graft_dot(qv, v)") / (col("qn") * col("nrm")), 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id"))
        .orderBy(col("cos6").desc, col("vec_id").asc)
      val nn = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      val votes = nn.groupBy(col("q_id"), col("true_label"), col("label"))
        .agg(count(lit(1)).as("n_votes"))
      val wv = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id"))
        .orderBy(col("n_votes").desc, col("label").asc)
      votes.withColumn("vr", row_number().over(wv)).filter(col("vr") === 1)
        .select(col("q_id"), col("true_label"),
          col("label").as("pred_label"),
          (col("label") === col("true_label")).as("correct"))
        .orderBy(col("q_id"))
    },
    Some(s"""
      WITH vsrc AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      ebands AS (${Extended.sqlAnnBands}),
      n AS ($sqlBase),
      qb AS (SELECT vec_id AS q_id, band, code FROM ebands WHERE vec_id % 100 = 0),
      cand AS (
        SELECT DISTINCT q.q_id, e.vec_id
        FROM qb q JOIN ebands e
          ON e.band = q.band AND e.code = q.code AND e.vec_id % 100 <> 0),
      sc AS (
        SELECT c.q_id, a.label AS true_label, c.vec_id, b.label,
               ${Text.sqlHround("list_dot_product(a.v, b.v) / (a.nrm * b.nrm)", 6)} AS cos6
        FROM cand c
        JOIN n a ON a.vec_id = c.q_id
        JOIN n b ON b.vec_id = c.vec_id),
      nn AS (SELECT * FROM (
               SELECT *, row_number() OVER (PARTITION BY q_id
                 ORDER BY cos6 DESC, vec_id) AS rn FROM sc) WHERE rn <= 10),
      votes AS (SELECT q_id, true_label, label, count(*) AS n_votes
                FROM nn GROUP BY 1, 2, 3)
      SELECT q_id, true_label, label AS pred_label,
             label = true_label AS correct
      FROM (SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY n_votes DESC, label) AS vr FROM votes)
      WHERE vr = 1 ORDER BY q_id
    """),
    doc = "kNN label propagation over sign-LSH band candidates (the scale path)")

  /** Greedy k-center coreset — farthest-point diversity sampling, the
    * standard coreset/seed-selection primitive for training-data pruning
    * (pick the K most mutually-distant embeddings; 2-approximation of the
    * k-center objective, Gonzalez 1985). Seed = min vec_id (the
    * conventional arbitrary-start), then 7 unrolled greedy steps in ONE
    * lazy plan: step k broadcasts the (k−1)-row selected set AS ONE ARRAY
    * (KB-scale — a one-row crossJoin, the tfidf scalar-subquery shape,
    * ScaleSpec `intended`), computes each vector's min squared distance
    * ROW-LOCALLY (array_min over a transform — no k-fold row expansion,
    * no groupBy), and takes the argmax with a single max_by aggregate
    * (partial+final — never a corpus-wide window). K passes over the
    * corpus is the honest cost of exact greedy k-center at any scale.
    * Parity: squared distances expand to three graft_dot /
    * list_dot_product calls (identical left-to-right float chains) and
    * are hround(6)-quantized BEFORE min/argmax, so both engines compare
    * identical doubles; all ties break on vec_id. The reported d6 is the
    * k-center coverage radius at each step — monotone non-increasing by
    * the greedy invariant (OperatorSpec asserts it).
    */
  val kcenterCoreset: QueryDef = {
    val K = 8
    val distSql = "floor((graft_dot(v, v) - 2 * graft_dot(v, c) " +
      "+ graft_dot(c, c)) * 1000000e0 + 0.5e0) / 1000000e0"
    QueryDef(
      "kcenter_coreset",
      (s, d) => {
        val vecs = base(s, d).select(col("vec_id"), col("v"))
        val sel1 = vecs
          .agg(min_by(struct(col("vec_id").as("cid"), col("v").as("cv")),
            col("vec_id")).as("m"))
          .select(lit(1).as("sel_order"), col("m.cid").as("cid"),
            col("m.cv").as("cv"), lit(null).cast("double").as("d6"))
          // each one-row selection is a subtree of EVERY later step's
          // plan (step k embeds steps 1..k−1): pin them so the union
          // evaluates K corpus passes, not K²/2 (lazy; populated during
          // the one action — the pagerank edge-pin discipline, now via
          // the Pin registry so Verify can release after the action)
          .transform(Pin.pin)
        val sels = (2 to K).foldLeft(Vector(sel1)) { (acc, k) =>
          val centers = acc.zipWithIndex
            .map { case (f, i) => f.select(col("cv").as(s"cv$i")) }
            .reduce((a, b) => a.crossJoin(broadcast(b)))
            .select(array((0 until acc.size).map(i => col(s"cv$i")): _*)
              .as("cs"))
          val sk = vecs.crossJoin(broadcast(centers))
            .select(col("vec_id"), col("v"),
              expr(s"array_min(transform(cs, c -> $distSql))").as("dmin"))
            .agg(
              max_by(struct(col("vec_id").as("cid"), col("v").as("cv")),
                struct(col("dmin"), (-col("vec_id")).as("nid"))).as("m"),
              max(struct(col("dmin"), (-col("vec_id")).as("nid"))).as("mo"))
            .select(lit(k).as("sel_order"), col("m.cid").as("cid"),
              col("m.cv").as("cv"), col("mo.dmin").as("d6"))
            .transform(Pin.pin)
          acc :+ sk
        }
        sels.map(_.select(col("sel_order"), col("cid"), col("d6")))
          .reduce(_ unionAll _)
          .orderBy(col("sel_order"))
      },
      Some {
        def hr(x: String) = s"floor(($x) * 1000000 + 0.5) / 1000000"
        val dist = hr("list_dot_product(s.v, s.v) " +
          "- 2 * list_dot_product(s.v, c) + list_dot_product(c, c)")
        val ctes = scala.collection.mutable.ArrayBuffer(
          "vs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
          "c1 AS (SELECT vec_id AS cid, v AS cv FROM vs ORDER BY vec_id LIMIT 1)")
        val sel = scala.collection.mutable.ArrayBuffer(
          "SELECT 1 AS sel_order, cid, CAST(NULL AS DOUBLE) AS d6 FROM c1")
        for (k <- 2 to K) {
          val prev = (1 until k).map(i => s"c$i").mkString(", ")
          val arr = "[" + (1 until k).map(i => s"c$i.cv").mkString(", ") + "]"
          ctes += s"l$k AS (SELECT $arr AS cs FROM $prev)"
          ctes += (s"s$k AS (SELECT s.vec_id, s.v, list_min(list_transform(" +
            s"(SELECT cs FROM l$k), c -> $dist)) AS dmin FROM vs s)")
          ctes += (s"c$k AS (SELECT vec_id AS cid, v AS cv, dmin FROM s$k " +
            "ORDER BY dmin DESC, vec_id ASC LIMIT 1)")
          sel += s"SELECT $k AS sel_order, cid, dmin AS d6 FROM c$k"
        }
        "WITH " + ctes.mkString(",\n") +
          "\nSELECT * FROM (" + sel.mkString(" UNION ALL ") +
          ") ORDER BY sel_order"
      },
      doc = "greedy k-center coreset (farthest-point diversity sampling, 8 picks)")
  }

  val all: Seq[QueryDef] =
    Seq(kmeansEmbed, embedOutliers, knnClassify, knnClassifyAnn,
      kcenterCoreset)
}
