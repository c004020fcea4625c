package graft.ops

import graft.core.{Pin, QueryDef, Tables, Text}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over relationally-derived edge lists — the pattern for
  * iterative graph compute WITHOUT a graph framework: aggregate the fact
  * table down to a (src, dst, weight) edge list once, then express each
  * iteration as join + groupBy message passing. Complements the
  * connected-components loop in [[Extended]] (`dup_clusters`), which
  * iterates to a data-dependent fixpoint; PageRank here is a FIXED
  * iteration count, so the whole computation stays one lazy Catalyst plan
  * (no driver coordination at all).
  *
  * Numeric discipline: ranks are scaled BIGINTs (1e9 = rank 1.0) and every
  * step is integer multiply / integer floor-division — bit-identical in
  * both engines regardless of aggregation order, where a double-valued
  * PageRank would drift in the sum order. Spark `DIV` and DuckDB `//`
  * agree on non-negative operands (both floor).
  */
object Graph {

  private val Iters = 3
  private val Scale = 1000000000L // rank 1.0

  /** Trade-graph PageRank: nations as vertices, customer-nation →
    * supplier-nation order flow as weighted edges, 3 damped iterations
    * (d = 0.85 as integer 85/100).
    *
    * Scale shape: the ONLY big work is the one-time edge aggregation
    * (lineitem ⋈ orders fact join, then two dim joins — all equi-joins,
    * partial agg collapses to ≤ |V|² edge rows before the shuffle). Each
    * iteration then joins the ≤ |V|² edge table with the |V|-row rank
    * table: message passing whose cost is EDGE-list-sized, never
    * corpus-sized. The thrice-referenced edge subtree is pinned with
    * `persist()`: all three iteration joins read the same
    * InMemoryRelation, so the fact-join subtree runs exactly once
    * STRUCTURALLY — round 3 relied on AQE stage-cache reuse for this,
    * which is best-effort and was the suspected source of the 5×
    * driver-bench drift. persist (not localCheckpoint: even the lazy
    * variant plans via AdaptiveSparkPlanExec.getFinalPhysicalPlan, which
    * materializes every shuffle stage AT CONSTRUCTION — measured as 5
    * construction-time jobs in ScaleSpec's laziness guard) keeps the
    * whole query one lazy plan; the first action populates the cache and
    * the other two references scan it.
    *
    * The pin goes through [[graft.core.Pin.tagged]] (round 11): the query
    * fn returns a lazy DataFrame, so there is no "after the action" point
    * inside the fn to release it — instead the Pin registry lets the
    * HARNESS release after the action (Verify does, per query), the
    * cache_tag marker keeps the edge subtree from being silently
    * substituted into other trade-graph queries' plans, and CacheManager
    * still dedups the identical tagged plan to one InMemoryRelation per
    * sfDir (edge list ≤ |V|² = 625 rows here; nation count, not
    * corpus-sized, at any SF).
    */
  val pagerank: QueryDef = QueryDef(
    "pagerank_trade",
    (s, d) => {
      val e0 = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey").as("src")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey").as("dst")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      val edges = e0.withColumn("wout",
          sum(col("w")).over(Window.partitionBy(col("src"))))
        .transform(Pin.tagged)
      val nodes = Tables.nation(s, d)
        .select(col("n_nationkey").cast("long").as("node"), col("n_name"))

      def step(r: DataFrame): DataFrame = {
        val contrib = edges
          .join(r, col("node") === col("src"))
          .select(col("dst").as("node"), expr("(pr * w) DIV wout").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("sc"))
        nodes.select(col("node"))
          .join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(Scale * 15 / 100) +
              expr("(85 * coalesce(sc, CAST(0 AS BIGINT))) DIV 100")).as("pr"))
      }

      val r0 = nodes.select(col("node"), lit(Scale).as("pr"))
      val rN = (1 to Iters).foldLeft(r0)((r, _) => step(r))
      rN.join(nodes, Seq("node"))
        .select(col("n_name"), col("pr"))
        .orderBy(col("pr").desc, col("n_name"))
    },
    Some {
      val iterCtes = (1 to Iters).map { i =>
        s"""c$i AS (SELECT e.dst AS node,
                    CAST(sum((r.pr * e.w) // e.wout) AS BIGINT) AS sc
             FROM e JOIN r${i - 1} r ON r.node = e.src GROUP BY 1),
         r$i AS (SELECT n.node,
                    CAST(${Scale * 15 / 100} + (85 * coalesce(c.sc, 0)) // 100 AS BIGINT) AS pr
             FROM n LEFT JOIN c$i c USING (node))"""
      }.mkString(",\n      ")
      s"""
      WITH e0 AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2),
      e AS (SELECT src, dst, w,
                   CAST(sum(w) OVER (PARTITION BY src) AS BIGINT) AS wout
            FROM e0),
      n AS (SELECT CAST(n_nationkey AS BIGINT) AS node, n_name FROM nation),
      r0 AS (SELECT node, CAST($Scale AS BIGINT) AS pr FROM n),
      $iterCtes
      SELECT n.n_name, r.pr
      FROM r$Iters r JOIN n USING (node)
      ORDER BY pr DESC, n_name
      """
    },
    doc = s"integer-exact damped PageRank, $Iters fixed join+agg iterations on the trade graph")

  /** Per-node triangle participation on the undirected trade graph —
    * the clustering-coefficient numerator, and the classic test that a
    * relational engine can do multi-hop graph patterns without a graph
    * framework. Edges are DIRECTION-COLLAPSED (least/greatest, distinct)
    * then ORIENTED low→high, which makes the two-hop wedge join
    * (a<b ⋈ b<c) enumerate each candidate triangle exactly once and
    * bounds the wedge count by Σ d²(v) of the ORIENTED degree — the
    * standard trick that keeps intermediate size survivable on
    * power-law graphs at scale (every hub's edges point INTO it, so its
    * oriented out-degree stays small). The closing (a,c) probe and both
    * hops are plain equi-joins; the thrice-referenced oriented edge list
    * is pinned with persist() exactly like pagerank's (same deliberate
    * session-lifetime cache, same rationale — see pagerank scaladoc).
    * Pure integer compute; nodes outside any triangle report 0 via the
    * left join to the nation dim.
    */
  val triangleCount: QueryDef = QueryDef(
    "triangle_count",
    (s, d) => {
      val raw = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey").as("src")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey").as("dst")),
          col("l_suppkey") === col("s_suppkey"))
        .filter(col("src") =!= col("dst"))
      val edges = raw
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
        .transform(Pin.tagged)
      val wedges = edges.select(col("a"), col("b").as("m"))
        .join(edges.select(col("a").as("m"), col("b").as("c")), Seq("m"))
      val tris = wedges.join(edges.select(col("a"), col("b").as("c")),
        Seq("a", "c"))
        .select(col("a"), col("m").as("b"), col("c"))
      val perNode = tris
        .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
      Tables.nation(s, d)
        .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
        .join(perNode, Seq("node"), "left")
        .select(col("n_name"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"))
        .orderBy(col("n_name"))
    },
    Some("""
      WITH raw AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey),
      e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM raw),
      tris AS (
        SELECT e1.a, e1.b AS m, e2.b AS c
        FROM e e1 JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      pn AS (SELECT node, count(*) AS n_tri FROM (
               SELECT unnest([a, m, c]) AS node FROM tris) GROUP BY 1)
      SELECT n.n_name, coalesce(pn.n_tri, 0) AS n_tri
      FROM nation n LEFT JOIN pn ON pn.node = n.n_nationkey
      ORDER BY n.n_name
    """),
    doc = "oriented-wedge triangle counting per nation on the trade graph")

  /** Single-source BFS shortest paths on the bipartite customer–supplier
    * trade graph (high-value orders only, o_totalprice > 450000 — the
    * graph stays sparse enough at every fixture SF that hop distances
    * span 0–5, not a trivial all-ones star). Six FIXED min-plus
    * relaxation rounds, each round one equi-join of the reached-distance
    * frame with the symmetric edge list plus a min-groupBy — the whole
    * search is ONE lazy plan (pagerank's discipline; no driver loop, no
    * collect). Supplier node ids live at 1e9 + s_suppkey so the two key
    * spaces never collide. The seed is the min customer key IN-PLAN (a
    * one-row aggregate UNIONed into the frame — no scalar cross join).
    * The 6-round cap is mirrored exactly by the oracle's `dd < 6`
    * recursion guard, so nodes farther than 6 hops are -1 on BOTH
    * engines by construction. At 100 TB: the edge list is the distinct
    * (custkey, suppkey) projection of the filtered fact join — partial
    * agg collapses it before the shuffle — and each round's join is
    * edge-list-sized, never fact-sized; the six-times-referenced edge
    * frame is persist()-pinned like pagerank's (same deliberate
    * session-lifetime cache, same rationale).
    */
  val shortestPathBfs: QueryDef = QueryDef(
    "shortest_path_bfs",
    (s, d) => {
      val e0 = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d)
          .filter(col("o_totalprice") > 450000.0)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cn"),
          (lit(1000000000L) + col("l_suppkey")).as("sn"))
        .distinct()
      val edges = e0.select(col("cn").as("a"), col("sn").as("b"))
        .union(e0.select(col("sn").as("a"), col("cn").as("b")))
        .transform(Pin.tagged)
      var dist = e0.agg(min(col("cn")).as("node"))
        .select(col("node"), lit(0).as("d"))
      for (_ <- 1 to 6) {
        val next = dist.join(edges, col("node") === col("a"))
          .select(col("b").as("node"), (col("d") + lit(1)).as("d"))
        dist = dist.union(next).groupBy(col("node"))
          .agg(min(col("d")).as("d"))
      }
      val nodes = Tables.customer(s, d)
        .select(col("c_custkey").as("node"), lit("cust").as("kind"))
        .union(Tables.supplier(s, d)
          .select((lit(1000000000L) + col("s_suppkey")).as("node"),
            lit("supp").as("kind")))
      nodes.join(dist, Seq("node"), "left")
        .select(col("node"), col("kind"),
          coalesce(col("d"), lit(-1)).cast("int").as("dist"))
        .orderBy(col("node"))
    },
    Some("""
      WITH e0 AS (
        SELECT DISTINCT o.o_custkey AS cn, 1000000000 + l.l_suppkey AS sn
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice > 450000.0),
      src AS (SELECT min(cn) AS sk FROM e0),
      e AS (SELECT cn AS a, sn AS b FROM e0
            UNION SELECT sn, cn FROM e0),
      w AS (
        WITH RECURSIVE w(node, dd) AS (
          SELECT sk, 0 FROM src
          UNION
          SELECT e.b, w.dd + 1 FROM w JOIN e ON e.a = w.node WHERE w.dd < 6)
        SELECT node, min(dd) AS md FROM w GROUP BY 1),
      nodes AS (
        SELECT c_custkey AS node, 'cust' AS kind FROM customer
        UNION ALL
        SELECT 1000000000 + s_suppkey, 'supp' FROM supplier)
      SELECT n.node, n.kind,
             CAST(coalesce(w.md, -1) AS INTEGER) AS dist
      FROM nodes n LEFT JOIN w ON w.node = n.node
      ORDER BY n.node
    """),
    doc = "single-source BFS hop distance (6 fixed rounds, one lazy plan)")

  /** Neighbor-set Jaccard similarity — the classic link-prediction /
    * role-similarity score — for every wedge-connected nation pair on
    * the undirected trade graph: J(a,c) = |N(a)∩N(c)| / |N(a)∪N(c)|.
    * Common neighbors are counted as WEDGES through the symmetric edge
    * list (the `triangle_count` machinery: two equi-joins on the middle
    * vertex, a<c to emit each pair once) — candidate pairs are only
    * those with ≥1 common neighbor, never the quadratic all-pairs set;
    * the union size telescopes to deg(a)+deg(c)−common from the degree
    * frame, so everything is exact integers until the final ratio under
    * hround. At 100 TB the wedge join needs the standard hub cap
    * (bound the middle-vertex degree, as `dup_clusters`' star contraction
    * does); the nation graph's max degree is 24, so the cap is a no-op
    * here and is omitted. The edge frame is persist()-pinned — same
    * deliberate session-lifetime cache as pagerank's, same rationale.
    */
  val nodeJaccard: QueryDef = QueryDef(
    "node_jaccard",
    (s, d) => {
      val raw = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey").as("src")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey").as("dst")),
          col("l_suppkey") === col("s_suppkey"))
        .filter(col("src") =!= col("dst"))
      val sym = raw
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
        .select(explode(array(
          struct(col("a").as("u"), col("b").as("v")),
          struct(col("b").as("u"), col("a").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .transform(Pin.tagged)
      val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      val common = sym.select(col("v").as("m"), col("u").as("a"))
        .join(sym.select(col("v").as("m"), col("u").as("c")), Seq("m"))
        .filter(col("a") < col("c"))
        .groupBy(col("a"), col("c")).agg(count(lit(1)).as("common"))
      common
        .join(deg.select(col("u").as("a"), col("deg").as("deg_a")), Seq("a"))
        .join(deg.select(col("u").as("c"), col("deg").as("deg_c")), Seq("c"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").cast("long").as("a"),
            col("n_name").as("a_name"))), Seq("a"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").cast("long").as("c"),
            col("n_name").as("c_name"))), Seq("c"))
        .select(col("a_name"), col("c_name"), col("common"),
          col("deg_a"), col("deg_c"),
          Text.hround(col("common").cast("double") /
            (col("deg_a") + col("deg_c") - col("common")).cast("double"), 6)
            .as("jac6"))
        .orderBy(col("a_name"), col("c_name"))
    },
    Some(s"""
      WITH raw AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey),
      e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM raw),
      sym AS (SELECT a AS u, b AS v FROM e
              UNION ALL SELECT b AS u, a AS v FROM e),
      deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY 1),
      cm AS (SELECT s1.u AS a, s2.u AS c, count(*) AS common
             FROM sym s1 JOIN sym s2 ON s1.v = s2.v AND s1.u < s2.u
             GROUP BY 1, 2)
      SELECT na.n_name AS a_name, nc.n_name AS c_name, cm.common,
             da.deg AS deg_a, dc.deg AS deg_c,
             ${Text.sqlHround(
      "CAST(cm.common AS DOUBLE) / CAST(da.deg + dc.deg - cm.common AS DOUBLE)",
      6)} AS jac6
      FROM cm
      JOIN deg da ON da.u = cm.a
      JOIN deg dc ON dc.u = cm.c
      JOIN nation na ON na.n_nationkey = cm.a
      JOIN nation nc ON nc.n_nationkey = cm.c
      ORDER BY a_name, c_name
    """),
    doc = "neighbor-set Jaccard for wedge-connected nation pairs (exact ints, hround ratio)")

  /** Degree assortativity of the high-value trade graph — Newman's r
    * (Pearson correlation of endpoint degrees over directed edge
    * copies): positive = hubs trade with hubs, negative = hub-and-spoke.
    * Runs on `shortest_path_bfs`'s sparse bipartite customer–supplier
    * graph (the nation graph is COMPLETE at sf≥0.01 — zero degree
    * variance makes r undefined there, the measured degenerate case this
    * query deliberately avoids). Over the symmetric edge list the x/y
    * moment sums are mirror-equal, so r reduces to exact 64-bit integer
    * moments (Σx, Σxy, Σx²; degrees ≤ |V|, products « 2^63) with ONE
    * float division chain under hround. Shape: degree frame = one
    * groupBy over edges; moment sums = one aggregate over the
    * degree-joined edge list — two edge-list-sized shuffles, constant
    * output; the same discipline at any scale.
    */
  val graphAssortativity: QueryDef = QueryDef(
    "graph_assortativity",
    (s, d) => {
      val e = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d)
          .filter(col("o_totalprice") > 450000)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("a"),
          (lit(1000000000L) + col("l_suppkey")).as("b"))
        .distinct()
      val sym = e
        .select(explode(array(
          struct(col("a").as("u"), col("b").as("v")),
          struct(col("b").as("u"), col("a").as("v")))).as("ed"))
        .select(col("ed.u").as("u"), col("ed.v").as("v"))
      val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      val m = sym
        .join(deg.select(col("u"), col("deg").as("dx")), Seq("u"))
        .join(deg.select(col("u").as("v"), col("deg").as("dy")), Seq("v"))
        .agg(count(lit(1)).as("m"),
          sum(col("dx")).as("sx"), sum(col("dx") * col("dy")).as("sxy"),
          sum(col("dx") * col("dx")).as("sxx"))
      m.select(col("m").as("n_dir_edges"),
        Text.hround(
          (col("m") * col("sxy") - col("sx") * col("sx")).cast("double") /
            (col("m") * col("sxx") - col("sx") * col("sx")).cast("double"),
          6).as("assortativity6"))
    },
    Some(s"""
      WITH e AS (
        SELECT DISTINCT o.o_custkey AS a, 1000000000 + l.l_suppkey AS b
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice > 450000),
      sym AS (SELECT a AS u, b AS v FROM e
              UNION ALL SELECT b AS u, a AS v FROM e),
      deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY 1),
      m AS (SELECT count(*) AS m,
              CAST(sum(dx.deg) AS BIGINT) AS sx,
              CAST(sum(dx.deg * dy.deg) AS BIGINT) AS sxy,
              CAST(sum(dx.deg * dx.deg) AS BIGINT) AS sxx
            FROM sym
            JOIN deg dx ON dx.u = sym.u
            JOIN deg dy ON dy.u = sym.v)
      SELECT m AS n_dir_edges,
             ${Text.sqlHround(
      "CAST(m * sxy - sx * sx AS DOUBLE) / CAST(m * sxx - sx * sx AS DOUBLE)",
      6)} AS assortativity6
      FROM m
    """),
    doc = "Newman degree assortativity on the sparse bipartite trade graph")

  /** (p,q)-core peeling on the bipartite customer–supplier graph — the
    * bipartite form of k-core decomposition (dense-subgraph extraction /
    * spam-cluster mining): iteratively delete customers with fewer than p
    * distinct supplier partners and suppliers with fewer than q customer
    * partners, and report the surviving edge/node counts per round. Three
    * FIXED peel rounds, fully unrolled into ONE lazy plan (pagerank's
    * discipline — no driver loop): each round is two count-aggregates on
    * the shrinking edge list plus two shuffle-hash joins back, all
    * edge-list-sized, never fact-sized. Thresholds are 3/4 of each side's
    * mean degree + 1, computed IN-PLAN as exact integer floor-division
    * (one-row frame, broadcast-crossed — the tfidf scalar-subquery shape,
    * ScaleSpec `intended`): a fixed absolute threshold is vacuous across
    * SFs (degrees scale with corpus size; mean+1 peels to empty by round
    * 2 at every SF, measured), while 3/4-mean discriminates everywhere —
    * sf0.1 keeps peeling through round 3 (503315→502876→502557 edges),
    * the smaller SFs reach their fixpoint after one round. Each round's
    * edge frame is persist()-pinned (three consumers: two degree aggs +
    * the stats row) — lazy, populated on first action.
    */
  val kcorePeel: QueryDef = QueryDef(
    "kcore_peel",
    (s, d) => {
      val e0 = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct().transform(Pin.tagged)
      val kk = e0
        .agg(count(lit(1)).as("m"), countDistinct(col("c")).as("nc"),
          countDistinct(col("s")).as("ns"))
        .select(expr("3 * m div (4 * nc) + 1").as("p"),
          expr("3 * m div (4 * ns) + 1").as("q"))
      def peel(e: DataFrame): DataFrame = {
        val dc = e.groupBy(col("c")).agg(count(lit(1)).as("dc"))
        val dsup = e.groupBy(col("s")).agg(count(lit(1)).as("ds"))
        e.join(dc.hint("shuffle_hash"), Seq("c"))
          .join(dsup.hint("shuffle_hash"), Seq("s"))
          .crossJoin(broadcast(kk))
          .filter(col("dc") >= col("p") && col("ds") >= col("q"))
          .select(col("c"), col("s")).transform(Pin.tagged)
      }
      val all4 = Iterator.iterate(e0)(peel).take(4).toSeq
      val stats = all4.zipWithIndex.map { case (e, r) =>
        e.agg(count(lit(1)).as("n_edges"),
          countDistinct(col("c")).as("n_cust"),
          countDistinct(col("s")).as("n_supp"))
          .select(lit(r).as("round"), col("n_edges"), col("n_cust"),
            col("n_supp"))
      }
      stats.reduce(_ unionAll _).orderBy(col("round"))
    },
    Some("""
      WITH e0 AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
                  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      kk AS (SELECT 3 * count(*) // (4 * count(DISTINCT c)) + 1 AS p,
                    3 * count(*) // (4 * count(DISTINCT s)) + 1 AS q FROM e0),
      d1 AS (SELECT e.*, cd.dc, sd.ds FROM e0 e
             JOIN (SELECT c, count(*) AS dc FROM e0 GROUP BY 1) cd USING (c)
             JOIN (SELECT s, count(*) AS ds FROM e0 GROUP BY 1) sd USING (s)),
      e1 AS (SELECT c, s FROM d1, kk WHERE dc >= p AND ds >= q),
      d2 AS (SELECT e.*, cd.dc, sd.ds FROM e1 e
             JOIN (SELECT c, count(*) AS dc FROM e1 GROUP BY 1) cd USING (c)
             JOIN (SELECT s, count(*) AS ds FROM e1 GROUP BY 1) sd USING (s)),
      e2 AS (SELECT c, s FROM d2, kk WHERE dc >= p AND ds >= q),
      d3 AS (SELECT e.*, cd.dc, sd.ds FROM e2 e
             JOIN (SELECT c, count(*) AS dc FROM e2 GROUP BY 1) cd USING (c)
             JOIN (SELECT s, count(*) AS ds FROM e2 GROUP BY 1) sd USING (s)),
      e3 AS (SELECT c, s FROM d3, kk WHERE dc >= p AND ds >= q)
      SELECT 0 AS round, count(*) AS n_edges,
             count(DISTINCT c) AS n_cust, count(DISTINCT s) AS n_supp FROM e0
      UNION ALL
      SELECT 1, count(*), count(DISTINCT c), count(DISTINCT s) FROM e1
      UNION ALL
      SELECT 2, count(*), count(DISTINCT c), count(DISTINCT s) FROM e2
      UNION ALL
      SELECT 3, count(*), count(DISTINCT c), count(DISTINCT s) FROM e3
      ORDER BY round
    """),
    doc = "bipartite (p,q)-core peel: 3 unrolled rounds, adaptive integer thresholds")

  /** Deterministic weighted random walks on the customer–supplier
    * bipartite trade graph — the node2vec/item2vec PAIR-GENERATION step
    * of embedding training, as one lazy plan: every customer starts one
    * 2-hop walk (customer → supplier → customer), each hop choosing ONE
    * out-edge by a weighted draw. The draw is inverse-CDF over the
    * node's cumulative out-weights: edges carry a per-src running sum
    * (window partitioned by the node — edge-list-sized, never global),
    * the walker draws u = h32(seed ‖ walk-id) % out-weight, and the
    * join+filter `cw − w ≤ u < cw` keeps EXACTLY one edge per walker.
    * Seeded-hash randomness (the dp_randomized_response discipline — the
    * only randomness an exact cross-engine oracle can check), with the
    * hop-2 seed keyed by (origin, current) so walks through the same
    * supplier diverge.
    *
    * Scale shape: the edge aggregation is the only fact-sized work (one
    * orders ⋈ lineitem join, partial-agg to distinct (c,s) pairs); the
    * pair frame is Pin.tagged (referenced by BOTH hop directions); each
    * hop is an equi-join on the current node whose pre-filter output is
    * Σ degree(frontier) — the standard cost of CDF-sampling without
    * per-node alias tables (the alias-table build is itself an
    * edge-list-sized groupBy and pays off only for many walks per
    * node; scaladoc'd trade-off, one walk per node here). Output
    * collapses to the 5×5 market-segment transition matrix plus
    * distinct-destination counts — bounded domain, discriminating at
    * every SF.
    */
  /** Per-node cumulative out-weight CDF over an edge frame — `part` is
    * the node column, `ord` the (unique-within-node) neighbor column
    * that fixes the interval order. Split out (with [[pick]]) for the
    * property spec, the round-9 exact-machinery discipline.
    */
  private[graft] def cdf(edges: DataFrame, part: String,
      ord: String): DataFrame =
    edges
      .withColumn("cw", sum(col("w")).over(Window.partitionBy(col(part))
        .orderBy(col(ord))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("wout", sum(col("w")).over(Window.partitionBy(col(part))))

  /** Inverse-CDF edge choice: reduce the raw hash draw modulo the
    * node's total out-weight and keep the ONE edge whose half-open
    * weight interval [cw−w, cw) contains it. Totality: u ∈ [0, wout)
    * and the intervals exactly tile [0, wout), so every walker matches
    * exactly one edge for ANY weight shape (the property spec plants
    * boundary draws to hold this).
    */
  private[graft] def pick(df: DataFrame, hash: Column): DataFrame =
    df.withColumn("u", hash % col("wout"))
      .filter(col("u") >= col("cw") - col("w") && col("u") < col("cw"))

  /** Pinned forward/backward inverse-CDF frames over the trade pair
    * graph — shared machinery of [[randomWalkPairs]] and
    * [[randomWalkLen4]] (SAME data and plan shape, the sanctioned
    * Pin-sharing class: in a multi-query session the tagged plans
    * dedup to one cache fill). Pinning the WINDOWED frames, not just
    * the pair aggregate, is what pays: the fact-sized aggregation AND
    * both per-node cumulative windows compute once per session
    * (measured on random_walk_pairs: 4.7 → 2.9 s isolated at sf0.1
    * when the pin moved from the pair frame to the CDF frames).
    */
  private def tradeCdfs(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val pairs = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
      .agg(count(lit(1)).as("w"))
    (Pin.tagged(cdf(pairs, "c", "sp")), Pin.tagged(cdf(pairs, "sp", "c")))
  }

  val randomWalkPairs: QueryDef = QueryDef(
    "random_walk_pairs",
    (s, d) => {
      val (fwd, bwd) = tradeCdfs(s, d)
      val hop1 = pick(fwd,
        Text.h32(concat(lit("rw1-"), col("c").cast("string"))))
        .select(col("c").as("origin"), col("sp"))
      // the hop-2 seed hash depends only on WALKER state (origin, sp):
      // computed on the |frontier| rows BEFORE the edge join, not on the
      // Σ degree(frontier)-expanded join output (guide §2.3 "project
      // before the exchange", applied to an md5 per row — the expanded
      // frame is ~600× the frontier here). Identical expression on
      // identical inputs; only the evaluation site moves.
      val h2 = hop1.withColumn("hs",
        Text.h32(concat(lit("rw2-"), col("origin").cast("string"),
          lit("-"), col("sp").cast("string"))))
      val hop2 = pick(h2.join(bwd, Seq("sp")), col("hs"))
        .select(col("origin"), col("c").as("dest"))
      val seg = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      hop2
        .join(seg.withColumnRenamed("c_mktsegment", "src_seg"),
          col("origin") === col("c_custkey")).drop("c_custkey")
        .join(seg.withColumnRenamed("c_mktsegment", "dst_seg"),
          col("dest") === col("c_custkey"))
        .groupBy(col("src_seg"), col("dst_seg"))
        .agg(count(lit(1)).as("n_walks"),
          countDistinct(col("dest")).as("n_dst"))
        .orderBy(col("src_seg"), col("dst_seg"))
    },
    Some(s"""
      WITH pairs AS (
        SELECT o.o_custkey AS c, l.l_suppkey AS sp, count(*) AS w
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2),
      fwd AS (
        SELECT c, sp, w,
               CAST(sum(w) OVER (PARTITION BY c ORDER BY sp
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
               CAST(sum(w) OVER (PARTITION BY c) AS BIGINT) AS wout
        FROM pairs),
      bwd AS (
        SELECT c, sp, w,
               CAST(sum(w) OVER (PARTITION BY sp ORDER BY c
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
               CAST(sum(w) OVER (PARTITION BY sp) AS BIGINT) AS wout
        FROM pairs),
      hop1 AS (
        SELECT c AS origin, sp FROM (
          SELECT c, sp, w, cw, wout,
                 ${Text.sqlH32("'rw1-' || CAST(c AS VARCHAR)")} % wout AS u
          FROM fwd)
        WHERE u >= cw - w AND u < cw),
      hop2 AS (
        SELECT origin, dest FROM (
          SELECT h1.origin, b.c AS dest, b.w, b.cw,
                 ${Text.sqlH32(
      "'rw2-' || CAST(h1.origin AS VARCHAR) || '-' || CAST(h1.sp AS VARCHAR)")}
                   % b.wout AS u
          FROM hop1 h1 JOIN bwd b ON b.sp = h1.sp)
        WHERE u >= cw - w AND u < cw)
      SELECT cs.c_mktsegment AS src_seg, cd.c_mktsegment AS dst_seg,
             count(*) AS n_walks,
             CAST(count(DISTINCT h.dest) AS BIGINT) AS n_dst
      FROM hop2 h
      JOIN customer cs ON cs.c_custkey = h.origin
      JOIN customer cd ON cd.c_custkey = h.dest
      GROUP BY 1, 2 ORDER BY 1, 2
    """),
    doc = "2-hop weighted random walks (seeded-hash inverse-CDF), segment transition matrix")

  /** Length-4 weighted random walks (c → sp → c → sp → c) — the walk
    * LENGTH leg node2vec corpora actually need (L ≈ 10-80;
    * [[randomWalkPairs]] proves the 2-hop mechanism, this proves the
    * chain composes): the same seeded-hash inverse-CDF draw
    * ([[cdf]]/[[pick]]), one hop per join, walk state carried as
    * COLUMNS (origin rides along; the sql_recursive_spine lesson — no
    * per-hop re-derivation of anything data-dependent). The two CDF
    * frames are built ONCE and Pin.tagged: fwd (per-customer intervals)
    * feeds hops 1 and 3, bwd (per-supplier) hops 2 and 4 — without the
    * pin each reference re-runs the fact-sized edge aggregation + its
    * window. Hop seeds are keyed by (hop, origin, current node), so
    * walks crossing the same node diverge and no hop reuses another's
    * draw. Each hop stays an equi-join on the current node with
    * Σ degree(frontier) pre-filter output — the documented CDF-sampling
    * cost (alias tables pay off only at many walks per node; one walk
    * per customer here). Output: 5×5 segment transition matrix of the
    * 4-hop endpoints + distinct-destination and returned-home counts —
    * bounded domain, discriminating at every SF.
    */
  val randomWalkLen4: QueryDef = QueryDef(
    "random_walk_len4",
    (s, d) => {
      val (fwd, bwd) = tradeCdfs(s, d)
      def seed(h: Int, origin: Column, cur: Column): Column =
        Text.h32(concat(lit(s"w4h$h-"), origin.cast("string"),
          lit("-"), cur.cast("string")))
      val hop1 = pick(fwd,
        Text.h32(concat(lit("w4h1-"), col("c").cast("string"))))
        .select(col("c").as("origin"), col("sp"))
      // per-hop seed hashes depend only on WALKER state (hop, origin,
      // current node): computed on the |frontier| rows BEFORE each edge
      // join, not on the Σ degree(frontier)-expanded join output (guide
      // §2.3; the expanded frame is ~600× the frontier at sf0.1, and
      // the hash is an md5 — this was the dominant per-hop cost).
      // Identical expressions on identical inputs; only the site moves.
      val hop2 = pick(hop1.withColumn("hs", seed(2, col("origin"), col("sp")))
          .join(bwd, Seq("sp")), col("hs"))
        .select(col("origin"), col("c").as("c2"))
      val hop3 = pick(hop2.withColumn("hs", seed(3, col("origin"), col("c2")))
          .join(fwd, col("c") === col("c2")), col("hs"))
        .select(col("origin"), col("sp").as("sp2"))
      val hop4 = pick(hop3.withColumn("hs", seed(4, col("origin"), col("sp2")))
          .join(bwd, col("sp") === col("sp2")), col("hs"))
        .select(col("origin"), col("c").as("dest"))
      val seg = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      hop4
        .join(seg.withColumnRenamed("c_mktsegment", "src_seg"),
          col("origin") === col("c_custkey")).drop("c_custkey")
        .join(seg.withColumnRenamed("c_mktsegment", "dst_seg"),
          col("dest") === col("c_custkey"))
        .groupBy(col("src_seg"), col("dst_seg"))
        .agg(count(lit(1)).as("n_walks"),
          countDistinct(col("dest")).as("n_dst"),
          sum(when(col("dest") === col("origin"), 1L).otherwise(0L))
            .as("n_home"))
        .orderBy(col("src_seg"), col("dst_seg"))
    },
    Some(s"""
      WITH pairs AS (
        SELECT o.o_custkey AS c, l.l_suppkey AS sp, count(*) AS w
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2),
      fwd AS (
        SELECT c, sp, w,
               CAST(sum(w) OVER (PARTITION BY c ORDER BY sp
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
               CAST(sum(w) OVER (PARTITION BY c) AS BIGINT) AS wout
        FROM pairs),
      bwd AS (
        SELECT c, sp, w,
               CAST(sum(w) OVER (PARTITION BY sp ORDER BY c
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
               CAST(sum(w) OVER (PARTITION BY sp) AS BIGINT) AS wout
        FROM pairs),
      h1 AS (
        SELECT c AS origin, sp FROM (
          SELECT c, sp, w, cw, wout,
                 ${Text.sqlH32("'w4h1-' || CAST(c AS VARCHAR)")} % wout AS u
          FROM fwd)
        WHERE u >= cw - w AND u < cw),
      h2 AS (
        SELECT origin, c2 FROM (
          SELECT h.origin, b.c AS c2, b.w, b.cw,
                 ${Text.sqlH32(
        "'w4h2-' || CAST(h.origin AS VARCHAR) || '-' || CAST(h.sp AS VARCHAR)")}
                   % b.wout AS u
          FROM h1 h JOIN bwd b ON b.sp = h.sp)
        WHERE u >= cw - w AND u < cw),
      h3 AS (
        SELECT origin, sp2 FROM (
          SELECT h.origin, f.sp AS sp2, f.w, f.cw,
                 ${Text.sqlH32(
        "'w4h3-' || CAST(h.origin AS VARCHAR) || '-' || CAST(h.c2 AS VARCHAR)")}
                   % f.wout AS u
          FROM h2 h JOIN fwd f ON f.c = h.c2)
        WHERE u >= cw - w AND u < cw),
      h4 AS (
        SELECT origin, dest FROM (
          SELECT h.origin, b.c AS dest, b.w, b.cw,
                 ${Text.sqlH32(
        "'w4h4-' || CAST(h.origin AS VARCHAR) || '-' || CAST(h.sp2 AS VARCHAR)")}
                   % b.wout AS u
          FROM h3 h JOIN bwd b ON b.sp = h.sp2)
        WHERE u >= cw - w AND u < cw)
      SELECT cs.c_mktsegment AS src_seg, cd.c_mktsegment AS dst_seg,
             count(*) AS n_walks,
             CAST(count(DISTINCT h.dest) AS BIGINT) AS n_dst,
             CAST(sum(CASE WHEN h.dest = h.origin THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_home
      FROM h4 h
      JOIN customer cs ON cs.c_custkey = h.origin
      JOIN customer cd ON cd.c_custkey = h.dest
      GROUP BY 1, 2 ORDER BY 1, 2
    """),
    doc = "length-4 weighted random walks (pinned CDF frames, per-hop seeded draws)")

  /** Synchronous weighted label propagation (Raghavan et al. 2007) —
    * community detection as fixed-round message passing, the
    * deterministic variant an oracle can check: labels init to the node
    * id, and each half-round every node adopts the label with the
    * LARGEST incident edge weight (ties broken by SMALLEST label — the
    * argmax is a per-node row_number over (cnt DESC, lab ASC), exact
    * integers, no randomness). Two full alternating rounds
    * (customer→part→customer ×2) on the REPEAT-trade bipartite graph
    * (customer–part edges with weight ≥ 2): the full trade graph
    * funnels through too few hub nodes and collapses to one community
    * at sf0.001 (measured — the vacuous-gate rule applied to graph
    * shape), while repeat-trade keeps real cluster structure at every
    * SF (47/385/620 communities, max sizes 15/3/3). Plan: the edge
    * aggregation is the only fact-sized work (Pin.tagged — all four
    * half-rounds join it); each half-round is one edge-keyed join +
    * one (node, lab) aggregate + one node-partitioned window — no
    * global window, no driver loop, one lazy plan (the pagerank
    * discipline). Output: per-community size, min member and member-id
    * checksum.
    */
  /** Repeat-trade bipartite edge list + the 2-round LPA label frames —
    * the shared machinery of [[labelPropagation]] and its
    * [[communityConductance]] evaluation (same data, same pinned shape:
    * the sanctioned deliberate-sharing class). Returns (e, c2, p2):
    * weighted edges and the final customer/part label assignments.
    */
  private def lpaLabels(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val e = Pin.tagged(
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2))
    def adopt(edgesWithLab: DataFrame, to: String): DataFrame =
      edgesWithLab
        .groupBy(col(to), col("lab"))
        .agg(sum(col("w")).as("cnt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col(to))
            .orderBy(col("cnt").desc, col("lab").asc)))
        .filter(col("rn") === 1)
        .select(col(to), col("lab"))
    val c0 = e.select(col("c")).distinct().withColumn("lab", col("c"))
    val p1 = adopt(e.join(c0, Seq("c")), "p")
    val c1 = adopt(e.join(p1, Seq("p")), "c")
    val p2 = adopt(e.join(c1, Seq("c")), "p")
    val c2 = adopt(e.join(p2, Seq("p")), "c")
    (e, c2, p2)
  }

  /** Oracle mirror of [[lpaLabels]], shared by the LPA query and its
    * conductance evaluation.
    */
  private val sqlLpaCtes: String = """e AS (SELECT c, p, w FROM (
             SELECT o.o_custkey AS c, l.l_partkey AS p, count(*) AS w
             FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             GROUP BY 1, 2) WHERE w >= 2),
      c0 AS (SELECT DISTINCT c, c AS lab FROM e),
      p1 AS (SELECT p, lab FROM (
        SELECT e.p, x.lab, row_number() OVER (PARTITION BY e.p
          ORDER BY sum(e.w) DESC, x.lab ASC) AS rn
        FROM e JOIN c0 x USING (c) GROUP BY e.p, x.lab) WHERE rn = 1),
      c1 AS (SELECT c, lab FROM (
        SELECT e.c, x.lab, row_number() OVER (PARTITION BY e.c
          ORDER BY sum(e.w) DESC, x.lab ASC) AS rn
        FROM e JOIN p1 x USING (p) GROUP BY e.c, x.lab) WHERE rn = 1),
      p2 AS (SELECT p, lab FROM (
        SELECT e.p, x.lab, row_number() OVER (PARTITION BY e.p
          ORDER BY sum(e.w) DESC, x.lab ASC) AS rn
        FROM e JOIN c1 x USING (c) GROUP BY e.p, x.lab) WHERE rn = 1),
      c2 AS (SELECT c, lab FROM (
        SELECT e.c, x.lab, row_number() OVER (PARTITION BY e.c
          ORDER BY sum(e.w) DESC, x.lab ASC) AS rn
        FROM e JOIN p2 x USING (p) GROUP BY e.c, x.lab) WHERE rn = 1)"""

  val labelPropagation: QueryDef = QueryDef(
    "label_propagation",
    (s, d) => {
      val (_, c2, _) = lpaLabels(s, d)
      c2.groupBy(col("lab"))
        .agg(count(lit(1)).as("n_members"), min(col("c")).as("member_min"),
          sum(col("c")).as("member_sum"))
        .orderBy(col("lab"))
    },
    Some(s"""
      WITH $sqlLpaCtes
      SELECT lab, count(*) AS n_members,
             CAST(min(c) AS BIGINT) AS member_min,
             CAST(sum(c) AS BIGINT) AS member_sum
      FROM c2 GROUP BY 1 ORDER BY 1
    """),
    doc = "deterministic weighted label propagation (2 alternating rounds, repeat-trade graph)")

  /** Partition-quality evaluation for [[labelPropagation]] — the
    * round-11 in-plan-learner rule applied to community detection:
    * oracle parity on the LABELS cannot see a degenerate clustering
    * (both engines replay the same propagation), so this registers the
    * metric that can. Reports the weighted boundary fraction
    * Σw(cross-community edges) / Σw — the volume-weighted mean
    * conductance of the partition — for the LPA labels AND for a
    * 32-bucket hash partition of the same graph (the null baseline). A
    * healthy LPA sits far below the baseline (sf0.001: 0.21 vs ~0.97;
    * at sf0.1 the w≥2 graph shatters into pure components and LPA
    * reaches exactly 0 — a real finding, and the CONTRAST row keeps the
    * gate discriminating at every SF per the round-4 rule). A broken
    * propagation drifts toward the baseline row. Both legs are single
    * aggregates over the shared pinned edge list; exact integer sums,
    * one hround'd ratio.
    */
  val communityConductance: QueryDef = QueryDef(
    "community_conductance",
    (s, d) => {
      val (e, c2, p2) = lpaLabels(s, d)
      val lpa = e
        .join(c2.select(col("c"), col("lab").as("lc")), Seq("c"))
        .join(p2.select(col("p"), col("lab").as("lp")), Seq("p"))
        .agg(lit("lpa").as("method"),
          countDistinct(col("lc")).as("n_comm"),
          sum(when(col("lc") =!= col("lp"), col("w")).otherwise(0L))
            .as("cut_w"),
          sum(col("w")).as("tot_w"))
      val hsh = e
        .select(col("w"),
          (Text.h32(concat(lit("c"), col("c").cast("string"))) % 32).as("lc"),
          (Text.h32(concat(lit("p"), col("p").cast("string"))) % 32).as("lp"))
        .agg(lit("hash32").as("method"),
          countDistinct(col("lc")).as("n_comm"),
          sum(when(col("lc") =!= col("lp"), col("w")).otherwise(0L))
            .as("cut_w"),
          sum(col("w")).as("tot_w"))
      lpa.unionAll(hsh)
        .select(col("method"), col("n_comm"), col("cut_w"), col("tot_w"),
          Text.hround(col("cut_w").cast("double") /
            col("tot_w").cast("double"), 4).as("phi4"))
        .orderBy(col("method"))
    },
    Some(s"""
      WITH $sqlLpaCtes,
      e2 AS (SELECT e.w, cc.lab AS lc, pp.lab AS lp
             FROM e JOIN c2 cc USING (c) JOIN p2 pp USING (p)),
      lpa AS (SELECT 'lpa' AS method,
                CAST(count(DISTINCT lc) AS BIGINT) AS n_comm,
                CAST(sum(CASE WHEN lc <> lp THEN w ELSE 0 END) AS BIGINT)
                  AS cut_w,
                CAST(sum(w) AS BIGINT) AS tot_w
              FROM e2),
      eh AS (SELECT w,
               ${Text.sqlH32("'c' || CAST(c AS VARCHAR)")} % 32 AS lc,
               ${Text.sqlH32("'p' || CAST(p AS VARCHAR)")} % 32 AS lp
             FROM e),
      hsh AS (SELECT 'hash32' AS method,
                CAST(count(DISTINCT lc) AS BIGINT) AS n_comm,
                CAST(sum(CASE WHEN lc <> lp THEN w ELSE 0 END) AS BIGINT)
                  AS cut_w,
                CAST(sum(w) AS BIGINT) AS tot_w
              FROM eh),
      u AS (SELECT * FROM lpa UNION ALL SELECT * FROM hsh)
      SELECT method, n_comm, cut_w, tot_w,
             ${Text.sqlHround(
        "CAST(cut_w AS DOUBLE) / CAST(tot_w AS DOUBLE)", 4)} AS phi4
      FROM u ORDER BY method
    """),
    doc = "LPA partition quality: weighted boundary fraction vs 32-bucket hash-partition null baseline")

  /** SECOND-ORDER (node2vec p/q-biased) random walk — the bias the
    * first-order walkers ([[randomWalkPairs]]/[[randomWalkLen4]]) can't
    * express: the hop-2 edge choice depends on the PREVIOUS node
    * (Grover & Leskovec 2016 — return edges reweighted by 1/p, outward
    * by 1/q). On a bipartite graph every non-return candidate from the
    * current node is exactly distance-2 from the previous node, so the
    * full three-case bias collapses to return-vs-out: integer factors
    * 1 (return, p=2) vs 2 (outward, q=1), keeping every weight an exact
    * BIGINT. The cost that kills naive second-order walkers — a CDF per
    * DIRECTED EDGE, Σ deg² precompute — is avoided by building the
    * biased CDF only for VISITED states: hop-1's one-state-per-origin
    * frontier joins the current node's out-edges (Σ deg over frontier
    * rows — the first-order hop cost times the bias arithmetic), and
    * the per-walker window partitions by origin (one live walk per
    * origin). Graph = repeat-trade customer–part (the label_propagation
    * graph; part degrees are bounded ~30, so the frontier join stays
    * frontier×deg-sized — on the supplier graph the hub degrees would
    * make the same join frontier×6000 at sf0.1, scaladoc'd trade-off).
    * Output: segment transition matrix + per-cell return counts — the
    * n_return column is the bias's observable (the unbiased walker
    * returns ~2× as often, and the spec-free proof is the oracle
    * replaying the identical biased draw).
    */
  val randomWalkNode2vec: QueryDef = QueryDef(
    "random_walk_node2vec",
    (s, d) => {
      val e = Pin.tagged(
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"))
          .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("c"), col("l_partkey").as("p"))
          .agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2))
      val hop1 = pick(cdf(e, "c", "p"),
        Text.h32(concat(lit("n2v1-"), col("c").cast("string"))))
        .select(col("c").as("origin"), col("p"))
      // biased per-walker CDF: current part's out-edges, return edge
      // (c2 == origin) at weight w·1, outward at w·2; intervals ordered
      // by candidate id within the (one-walk-per-origin) partition
      val cand = hop1
        .join(e.select(col("p"), col("c").as("c2"), col("w")), Seq("p"))
        .withColumn("wb", col("w") *
          when(col("c2") === col("origin"), 1L).otherwise(2L))
      val wOrd = Window.partitionBy(col("origin")).orderBy(col("c2"))
      val hop2 = cand
        .withColumn("cw", sum(col("wb")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("wout", sum(col("wb")).over(
          Window.partitionBy(col("origin"))))
        .withColumn("u", Text.h32(concat(lit("n2v2-"),
          col("origin").cast("string"), lit("-"), col("p").cast("string")))
          % col("wout"))
        .filter(col("u") >= col("cw") - col("wb") && col("u") < col("cw"))
        .select(col("origin"), col("c2").as("dest"))
      val seg = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      hop2
        .join(seg.withColumnRenamed("c_mktsegment", "src_seg"),
          col("origin") === col("c_custkey")).drop("c_custkey")
        .join(seg.withColumnRenamed("c_mktsegment", "dst_seg"),
          col("dest") === col("c_custkey"))
        .groupBy(col("src_seg"), col("dst_seg"))
        .agg(count(lit(1)).as("n_walks"),
          sum(when(col("dest") === col("origin"), 1L).otherwise(0L))
            .as("n_return"))
        .orderBy(col("src_seg"), col("dst_seg"))
    },
    Some(s"""
      WITH e AS (SELECT c, p, w FROM (
             SELECT o.o_custkey AS c, l.l_partkey AS p, count(*) AS w
             FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             GROUP BY 1, 2) WHERE w >= 2),
      fwd AS (
        SELECT c, p, w,
               CAST(sum(w) OVER (PARTITION BY c ORDER BY p
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
               CAST(sum(w) OVER (PARTITION BY c) AS BIGINT) AS wout
        FROM e),
      h1 AS (
        SELECT c AS origin, p FROM (
          SELECT c, p, w, cw, wout,
                 ${Text.sqlH32("'n2v1-' || CAST(c AS VARCHAR)")} % wout AS u
          FROM fwd)
        WHERE u >= cw - w AND u < cw),
      cand AS (
        SELECT h.origin, h.p, e.c AS c2,
               e.w * CASE WHEN e.c = h.origin THEN 1 ELSE 2 END AS wb
        FROM h1 h JOIN e ON e.p = h.p),
      h2 AS (
        SELECT origin, c2 AS dest FROM (
          SELECT origin, p, c2, wb,
                 CAST(sum(wb) OVER (PARTITION BY origin ORDER BY c2
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
                 CAST(sum(wb) OVER (PARTITION BY origin) AS BIGINT) AS wout
          FROM cand)
        WHERE ${Text.sqlH32(
      "'n2v2-' || CAST(origin AS VARCHAR) || '-' || CAST(p AS VARCHAR)")}
          % wout >= cw - wb
          AND ${Text.sqlH32(
      "'n2v2-' || CAST(origin AS VARCHAR) || '-' || CAST(p AS VARCHAR)")}
          % wout < cw)
      SELECT cs.c_mktsegment AS src_seg, cd.c_mktsegment AS dst_seg,
             count(*) AS n_walks,
             CAST(sum(CASE WHEN h.dest = h.origin THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_return
      FROM h2 h
      JOIN customer cs ON cs.c_custkey = h.origin
      JOIN customer cd ON cd.c_custkey = h.dest
      GROUP BY 1, 2 ORDER BY 1, 2
    """),
    doc = "node2vec second-order biased walk (return 1/p vs out 1/q, per-walker integer CDF)")

  /** Adamic-Adar link-prediction index for the same wedge-connected
    * nation pairs as [[nodeJaccard]]: AA(a,c) = Σ_{m∈N(a)∩N(c)} 1/ln deg(m)
    * — common neighbors weighted by how UN-hub-like they are (sharing a
    * rare partner is stronger evidence than sharing a hub). Same wedge
    * join (two equi-joins on the middle vertex, a<c), but the middle
    * vertex m now rides along so each wedge joins deg(m) and contributes
    * a per-wedge term. That term sum crosses an addition-order boundary,
    * so it is floor-quantized to 1e-9-unit BIGINT per wedge FIRST
    * (identical /ln operands → identical IEEE doubles → identical
    * integers on both engines; the zipf_fit discipline) and only the
    * exact integer sum is divided at the end. deg(m) ≥ 2 for any wedge
    * middle (it neighbors both a and c), so ln never hits 0. The sym
    * edge frame is the SAME data+shape nodeJaccard pins — the sanctioned
    * deliberate-sharing class (dup_span_runs precedent); at 100 TB the
    * wedge join takes the identical hub cap noted there.
    */
  val adamicAdar: QueryDef = QueryDef(
    "adamic_adar",
    (s, d) => {
      val raw = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey").as("src")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey").as("dst")),
          col("l_suppkey") === col("s_suppkey"))
        .filter(col("src") =!= col("dst"))
      val sym = raw
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
        .select(explode(array(
          struct(col("a").as("u"), col("b").as("v")),
          struct(col("b").as("u"), col("a").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .transform(Pin.tagged)
      val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      sym.select(col("v").as("m"), col("u").as("a"))
        .join(sym.select(col("v").as("m"), col("u").as("c")), Seq("m"))
        .filter(col("a") < col("c"))
        .join(deg.select(col("u").as("m"), col("deg").as("deg_m")), Seq("m"))
        .select(col("a"), col("c"),
          floor(lit(1e9) / log(col("deg_m").cast("double")) + lit(0.5))
            .cast("long").as("t9"))
        .groupBy(col("a"), col("c"))
        .agg(count(lit(1)).as("common"), sum(col("t9")).as("s9"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").cast("long").as("a"),
            col("n_name").as("a_name"))), Seq("a"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").cast("long").as("c"),
            col("n_name").as("c_name"))), Seq("c"))
        .select(col("a_name"), col("c_name"), col("common"),
          Text.hround(col("s9").cast("double") / lit(1e9), 6).as("aa6"))
        .orderBy(col("a_name"), col("c_name"))
    },
    Some(s"""
      WITH raw AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey),
      e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM raw),
      sym AS (SELECT a AS u, b AS v FROM e
              UNION ALL SELECT b AS u, a AS v FROM e),
      deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY 1),
      wedge AS (
        SELECT s1.u AS a, s2.u AS c,
               CAST(floor(1e9 / ln(CAST(dm.deg AS DOUBLE)) + 0.5) AS BIGINT)
                 AS t9
        FROM sym s1
        JOIN sym s2 ON s1.v = s2.v AND s1.u < s2.u
        JOIN deg dm ON dm.u = s1.v),
      aa AS (SELECT a, c, count(*) AS common,
               CAST(sum(t9) AS BIGINT) AS s9
             FROM wedge GROUP BY 1, 2)
      SELECT na.n_name AS a_name, nc.n_name AS c_name, aa.common,
             ${Text.sqlHround("CAST(s9 AS DOUBLE) / 1e9", 6)} AS aa6
      FROM aa
      JOIN nation na ON na.n_nationkey = aa.a
      JOIN nation nc ON nc.n_nationkey = aa.c
      ORDER BY a_name, c_name
    """),
    doc = "Adamic-Adar link prediction on wedge pairs (fixed-point 1/ln(deg) terms)")

  private val HitsIters = 3
  private val HScale = 1000000L // hub/auth score 1.0

  /** HITS hubs-and-authorities on the DIRECTED trade graph (customer
    * nation → supplier nation, weighted by order-line count): the second
    * classic eigenvector-style ranking beside [[pagerank]], and the one
    * that distinguishes the two ROLES a vertex can play — a hub routes
    * demand to many strong suppliers, an authority receives demand from
    * many strong buyers (Kleinberg's mutual-reinforcement recursion:
    * a = normalize(Mᵀh), h = normalize(Ma), fixed $HitsIters rounds).
    *
    * Numeric discipline = pagerank's, plus the normalization step HITS
    * needs and PageRank doesn't: scores are 1e6-fixed-point BIGINTs and
    * each half-round rescales by the CURRENT MAX — computed as an
    * unpartitioned window max over the |V|-row score frame (bounded
    * domain, the round-11 window-over-agg+crossJoin rule), so every op
    * is integer multiply / floor-div and bit-identical in both engines
    * in any aggregation order. Overflow bound: Σ_u w·score ≤
    * |V|·w_max·$HScale must fit int64 — at fixture SFs w_max is order
    * 1e4 (bound ~1e12); a 100 TB edge list pre-buckets w (w DIV c) to
    * keep the invariant, which rescales both scores uniformly and so
    * cancels in the normalization.
    *
    * Scale shape: the one fact-sized job is the same edge aggregation
    * every trade-graph query does (pinned via [[graft.core.Pin.tagged]],
    * referenced by all 2·$HitsIters message-passing joins); each
    * half-round is an edge-list-sized join + |V|-row agg + |V|-row
    * window. Dangling nations (no in- or out-edges in the filtered
    * graph) are kept by the left join at score 0, exactly like
    * pagerank's coalesce.
    */
  val hitsScores: QueryDef = QueryDef(
    "hits_scores",
    (s, d) => {
      val edges = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey").as("src")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey").as("dst")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
        .transform(Pin.tagged)
      val nodes = Tables.nation(s, d)
        .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)

      // One normalized half-round: raw = Σ_in w·score, then ×HScale DIV max.
      def halfRound(score: DataFrame, scoreCol: String, from: String,
          to: String, outCol: String): DataFrame = {
        val raw = edges
          .join(score, col("node") === col(from))
          .select(col(to).as("node"),
            (col("w") * col(scoreCol)).as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("raw"))
        nodes.select(col("node"))
          .join(raw, Seq("node"), "left")
          .select(col("node"), coalesce(col("raw"), lit(0L)).as("raw"))
          .withColumn("mx", greatest(lit(1L), max(col("raw")).over(wAll)))
          .select(col("node"),
            expr(s"(raw * $HScale) DIV mx").as(outCol))
      }

      val h0 = nodes.select(col("node"), lit(HScale).as("h"))
      val (hN, aN) = (1 to HitsIters).foldLeft(
        (h0, h0.select(col("node"), col("h").as("a")))) { case ((h, _), _) =>
        val a = halfRound(h, "h", "src", "dst", "a")
        val h2 = halfRound(a, "a", "dst", "src", "h")
        (h2, a)
      }
      nodes.join(hN, Seq("node")).join(aN, Seq("node"))
        .select(col("n_name"), col("h").as("hub"), col("a").as("auth"))
        .orderBy(col("hub").desc, col("auth").desc, col("n_name"))
    },
    Some {
      val iterCtes = (1 to HitsIters).map { i =>
        s"""ar$i AS (SELECT e.dst AS node, CAST(sum(e.w * h.h) AS BIGINT) AS raw
             FROM e JOIN h${i - 1} h ON h.node = e.src GROUP BY 1),
         a$i AS (SELECT node, CAST((raw * $HScale) //
                    greatest(1, max(raw) OVER ()) AS BIGINT) AS a
             FROM (SELECT n.node, coalesce(ar.raw, 0) AS raw
                   FROM n LEFT JOIN ar$i ar USING (node))),
         hr$i AS (SELECT e.src AS node, CAST(sum(e.w * a.a) AS BIGINT) AS raw
             FROM e JOIN a$i a ON a.node = e.dst GROUP BY 1),
         h$i AS (SELECT node, CAST((raw * $HScale) //
                    greatest(1, max(raw) OVER ()) AS BIGINT) AS h
             FROM (SELECT n.node, coalesce(hr.raw, 0) AS raw
                   FROM n LEFT JOIN hr$i hr USING (node)))"""
      }.mkString(",\n      ")
      s"""
      WITH e AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2),
      n AS (SELECT CAST(n_nationkey AS BIGINT) AS node, n_name FROM nation),
      h0 AS (SELECT node, CAST($HScale AS BIGINT) AS h FROM n),
      $iterCtes
      SELECT n.n_name, h.h AS hub, a.a AS auth
      FROM n JOIN h$HitsIters h USING (node) JOIN a$HitsIters a USING (node)
      ORDER BY hub DESC, auth DESC, n_name
      """
    },
    doc = s"HITS hubs/authorities: $HitsIters integer-exact mutual-reinforcement rounds with window-max normalization")

  /** Personalized PageRank — [[pagerank]] with the teleport mass pinned
    * to a SEED SET (ASIA's five nations) instead of spread uniformly:
    * the relevance ranking a recommender/fraud neighborhood query wants
    * ("importance AS SEEN FROM these nodes"). Same integer fixed-point
    * discipline and pinned edge list as pagerank; the two deltas are
    * (a) the restart term Scale·15% ÷ |S| lands only on seeds — |S| is
    * carried as a column (window count over the 5-row seed frame, never
    * a driver-side scalar), and (b) r0 starts all mass on the seeds, so
    * every iterate is a proper PPR approximation with exact integer
    * arithmetic (DIV floor on non-negative operands in both engines).
    * Nations unreachable in 3 hops report rank 0 — kept by the left
    * join, and the seeds-vs-distant contrast is the de-vacuation check.
    */
  val pprSeeded: QueryDef = QueryDef(
    "ppr_seeded",
    (s, d) => {
      val e0 = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey").as("src")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey").as("dst")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      val edges = e0.withColumn("wout",
          sum(col("w")).over(Window.partitionBy(col("src"))))
        .transform(Pin.tagged)
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val seeds = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").cast("long").as("node"))
        .withColumn("ns", count(lit(1)).over(wAll))
      val nodes = Tables.nation(s, d)
        .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
      // per-node restart mass: Scale*15/100 DIV |S| on seeds, 0 elsewhere
      val restart = nodes.select(col("node"))
        .join(seeds, Seq("node"), "left")
        .select(col("node"), coalesce(
          expr(s"${Scale * 15 / 100} DIV ns"), lit(0L)).as("rst"))
        .transform(Pin.tagged)

      def step(r: DataFrame): DataFrame = {
        val contrib = edges
          .join(r, col("node") === col("src"))
          .select(col("dst").as("node"), expr("(pr * w) DIV wout").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("sc"))
        restart
          .join(contrib, Seq("node"), "left")
          .select(col("node"),
            (col("rst") +
              expr("(85 * coalesce(sc, CAST(0 AS BIGINT))) DIV 100")).as("pr"))
      }

      val r0 = restart.select(col("node"),
        expr(s"(rst * 100) DIV 15").as("pr")) // all mass on seeds: Scale/|S|
      val rN = (1 to Iters).foldLeft(r0)((r, _) => step(r))
      rN.join(nodes, Seq("node"))
        .select(col("n_name"), col("pr"))
        .orderBy(col("pr").desc, col("n_name"))
    },
    Some {
      val iterCtes = (1 to Iters).map { i =>
        s"""c$i AS (SELECT e.dst AS node,
                    CAST(sum((r.pr * e.w) // e.wout) AS BIGINT) AS sc
             FROM e JOIN r${i - 1} r ON r.node = e.src GROUP BY 1),
         r$i AS (SELECT t.node,
                    CAST(t.rst + (85 * coalesce(c.sc, 0)) // 100 AS BIGINT) AS pr
             FROM rs t LEFT JOIN c$i c USING (node))"""
      }.mkString(",\n      ")
      s"""
      WITH e0 AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2),
      e AS (SELECT src, dst, w,
                   CAST(sum(w) OVER (PARTITION BY src) AS BIGINT) AS wout
            FROM e0),
      n AS (SELECT CAST(n_nationkey AS BIGINT) AS node, n_name, n_regionkey
            FROM nation),
      sd AS (SELECT node, CAST(count(*) OVER () AS BIGINT) AS ns
             FROM n JOIN region r ON n.n_regionkey = r.r_regionkey
             WHERE r.r_name = 'ASIA'),
      rs AS (SELECT n.node,
               CAST(coalesce(${Scale * 15 / 100} // sd.ns, 0) AS BIGINT) AS rst
             FROM n LEFT JOIN sd USING (node)),
      r0 AS (SELECT node, CAST((rst * 100) // 15 AS BIGINT) AS pr FROM rs),
      $iterCtes
      SELECT n.n_name, r.pr
      FROM r$Iters r JOIN n USING (node)
      ORDER BY pr DESC, n_name
      """
    },
    doc = s"personalized PageRank from the ASIA seed set: $Iters integer-exact iterations, seed-pinned teleport")

  /** Per-node ECCENTRICITY + graph diameter/radius on the STRONG trade
    * backbone — the all-pairs metric [[shortestPathBfs]]'s single-source
    * hop count doesn't give. The full nation trade graph is complete at
    * sf ≥ 0.01 (every ecc = 1, a vacuous gate), so the metric runs on
    * the top-15 % edges by weight — the threshold is the k-th largest
    * weight SELECTED IN-PLAN (k = max(1, 3·|E| div 20); rank selection
    * over the ≤ |V|² edge frame, value-based so weight ties are
    * engine-identical) — which keeps the backbone connected with varied
    * eccentricities at all three SFs (probed: 2-3 / 2-3 / 1-2). APSP by
    * 4 min-plus relaxation rounds (one hop per round ≥ the probed
    * diameter 3), each a join+groupBy-min over the ≤ |V|²-row distance
    * frame — bounded work after the one fact-sized edge aggregation.
    * Unreachable pairs are simply absent, so ecc is over the reachable
    * set (the surviving backbone is connected at every fixture SF).
    */
  val graphEccentricity: QueryDef = QueryDef(
    "graph_eccentricity",
    (s, d) => {
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val e = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey").as("src")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey").as("dst")),
          col("l_suppkey") === col("s_suppkey"))
        .filter(col("src") =!= col("dst"))
        .groupBy(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .agg(count(lit(1)).as("w"))
      val kept = e
        .withColumn("ne", count(lit(1)).over(wAll))
        .withColumn("rn", row_number().over(Window
          .orderBy(col("w").desc, col("a"), col("b"))))
        .withColumn("k", greatest(lit(1L), expr("(3 * ne) DIV 20")))
        .withColumn("thr",
          max(when(col("rn") === col("k"), col("w"))).over(wAll))
        .filter(col("w") >= col("thr"))
        .select(col("a"), col("b"))
      val sym = kept
        .select(explode(array(
          struct(col("a").as("u"), col("b").as("v")),
          struct(col("b").as("u"), col("a").as("v")))).as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
        .transform(Pin.tagged)

      def relax(dist: DataFrame): DataFrame =
        dist.unionAll(
          dist.select(col("u"), col("v").as("m"), col("d"))
            .join(sym.select(col("u").as("m"), col("v").as("v2")), Seq("m"))
            .filter(col("u") =!= col("v2"))
            .select(col("u"), col("v2").as("v"), (col("d") + 1).as("d")))
          .groupBy(col("u"), col("v")).agg(min(col("d")).as("d"))

      val d1 = sym.select(col("u"), col("v"), lit(1).as("d"))
      val dN = (1 to 3).foldLeft(d1)((dd, _) => relax(dd))
      dN.groupBy(col("u")).agg(max(col("d")).as("ecc"))
        .withColumn("diameter", max(col("ecc")).over(wAll))
        .withColumn("radius", min(col("ecc")).over(wAll))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").cast("long").as("u"), col("n_name"))),
          Seq("u"))
        .select(col("n_name"), col("ecc"), col("diameter"), col("radius"))
        .orderBy(col("ecc").desc, col("n_name"))
    },
    Some {
      val rounds = (2 to 4).map { i =>
        s"""d$i AS (SELECT u, v, CAST(min(d) AS INTEGER) AS d FROM (
               SELECT u, v, d FROM d${i - 1}
               UNION ALL
               SELECT a.u, b.v, a.d + 1
               FROM d${i - 1} a JOIN sym b ON b.u = a.v WHERE a.u <> b.v)
             GROUP BY 1, 2)"""
      }.mkString(",\n      ")
      s"""
      WITH e AS (
        SELECT least(c.c_nationkey, s.s_nationkey) AS a,
               greatest(c.c_nationkey, s.s_nationkey) AS b,
               count(*) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
        GROUP BY 1, 2),
      -- MATERIALIZED + one-row threshold cross join: as an inlined CTE
      -- with a scalar subquery, DuckDB re-planned the whole fact join
      -- per edge row (the sql_recursive_spine re-scan class) and the
      -- sf0.1 oracle ran minutes instead of seconds
      r AS MATERIALIZED (SELECT a, b, w,
              CAST(count(*) OVER () AS BIGINT) AS ne,
              row_number() OVER (ORDER BY w DESC, a, b) AS rn
            FROM e),
      thr AS (SELECT w AS thr FROM r
              WHERE rn = greatest(1, (3 * ne) // 20)),
      kept AS (SELECT a, b FROM r, thr WHERE r.w >= thr.thr),
      sym AS (SELECT a AS u, b AS v FROM kept
              UNION ALL SELECT b, a FROM kept),
      d1 AS (SELECT u, v, CAST(1 AS INTEGER) AS d FROM sym),
      $rounds,
      ec AS (SELECT u, CAST(max(d) AS INTEGER) AS ecc FROM d4 GROUP BY 1)
      SELECT n.n_name, ec.ecc,
             CAST(max(ecc) OVER () AS INTEGER) AS diameter,
             CAST(min(ecc) OVER () AS INTEGER) AS radius
      FROM ec JOIN nation n ON n.n_nationkey = ec.u
      ORDER BY ecc DESC, n_name
      """
    },
    doc = "eccentricity/diameter/radius of the top-15% trade backbone (in-plan threshold, 4 min-plus rounds)")

  val all: Seq[QueryDef] = Seq(pagerank, triangleCount, shortestPathBfs,
    nodeJaccard, graphAssortativity, kcorePeel, randomWalkPairs,
    randomWalkLen4, labelPropagation, randomWalkNode2vec, adamicAdar,
    hitsScores, pprSeeded, communityConductance, graphEccentricity)
}
