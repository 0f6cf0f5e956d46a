package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edge-list graph analytics in the message-passing-by-join style: rank
  * state joins the edge list, per-destination aggregation is the message
  * combine, and the driver loop is the superstep barrier — the Pregel
  * shape expressed in plain DataFrames, so it scales exactly like any
  * other join+aggregate (hash-partitioned by vertex, map-side combined).
  * (Connected components live in DedupOps' dedup-cluster machinery; this
  * file holds the rank/centrality side.)
  */
object GraphOps {

  /** Deterministic integer PageRank over an UNDIRECTED edge list, damping
    * 0.85, fixed iteration count.  All arithmetic is integer (ranks carry
    * `scale` total mass; per-edge contribution is `r div deg`, the update
    * is `(15·init + 85·Σcontrib) div 100`), so the result is bit-identical
    * under any partitioning/merge order AND replayable in an exact SQL
    * oracle — no float drift after 10 supersteps, which a double-typed
    * rank cannot promise across engines.
    *
    * Each superstep is one join + one combinable aggregate on (vertex)
    * keys.  Lineage is truncated every 5 supersteps (`localCheckpoint`) so
    * the plan does not grow unboundedly — the standard iterative-Spark
    * discipline.  Isolated vertices cannot occur (vertices are derived
    * from the edge list); dangling mass is impossible for the same
    * reason. */
  def pageRank(edges: DataFrame, src: Column, dst: Column, iters: Int,
      scale: Long = 1000000000000L,
      maxDriverEdges: Long = 3000000L): DataFrame = {
    require(iters > 0, "iters must be positive")
    val spark = edges.sparkSession
    val e = graft.core.CacheScope.persist(
      edges.select(src.cast("long").as("src"), dst.cast("long").as("dst")),
      eager = false)
    val nEdges = e.count()
    if (nEdges <= maxDriverEdges) {
      // catalog-sized graphs (the common case for item/co-click analytics)
      // run the identical integer recurrence on the driver: ten tiny
      // Spark jobs become one collect — the same dual-plan gate
      // discipline as DedupOps' cluster machinery, and the spec asserts
      // path agreement (integer math ⇒ bit-equal)
      val raw = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      val both = raw ++ raw.map(p => (p._2, p._1))
      val deg = both.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      val items = deg.keys.toArray.sorted
      val init = scale / items.length
      var ranks = items.map(_ -> init).toMap
      val inEdges = both.groupBy(_._2)
      (1 to iters).foreach { _ =>
        ranks = items.map { v =>
          val s = inEdges.getOrElse(v, Array.empty[(Long, Long)])
            .foldLeft(0L) { case (acc, (u, _)) => acc + ranks(u) / deg(u) }
          v -> (15L * init + 85L * s) / 100L
        }.toMap
      }
      import spark.implicits._
      return items.map(v => (v, ranks(v))).toSeq.toDF("item", "r")
    }
    val both = e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst")))
    val deg = both.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = deg.select(col("src").as("item")).cache()
    val n = nodes.count()
    val init = scale / n
    val edgesDeg = both.join(deg, "src").cache()
    var ranks = nodes.select(col("item"), lit(init).as("r"))
    (1 to iters).foreach { i =>
      val contrib = edgesDeg
        .join(ranks, edgesDeg("src") === ranks("item"))
        .select(col("dst").as("item"), expr("r div deg").as("c"))
        .groupBy("item").agg(sum("c").as("s"))
      ranks = nodes.join(contrib, Seq("item"), "left")
        .select(col("item"),
          expr(s"(${15L * init} + 85 * coalesce(s, 0)) div 100").as("r"))
      if (i % 5 == 0) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Exact triangle census over an undirected edge list given as ordered
    * pairs (src < dst): the number of closed triangles, the number of
    * wedges (open two-paths, Σ deg·(deg−1)/2), and the global clustering
    * coefficient 3·T / W — the "how cliquey is the co-engagement graph"
    * card.
    *
    * Counting uses the COMPACT-FORWARD orientation: every edge is pointed
    * at its higher-(degree, id) endpoint, a wedge is two out-edges at one
    * vertex, and a triangle is a wedge closed by an oriented edge —
    * each triangle found exactly once at its lowest-(degree, id) corner.
    * The wedge join's fan-out is Σ outdeg², and compact-forward bounds
    * outdeg by O(√E) REGARDLESS of skew: a 10⁴-degree hub has out-degree
    * ~√E because all its edges point AWAY from it toward rarer, higher-
    * rank endpoints.  The naive id-ordered (a,b)⋈(b,c) formulation is
    * Σ deg² and melts on exactly that hub.  Everything is integer until
    * the one final double division. */
  def triangleCensus(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    // the ordered edge list feeds the degree table and the orientation;
    // persist it once instead of recomputing its lineage per branch
    // (registered with CacheScope; the caller releases)
    val e = graft.core.CacheScope.persist(
      edges.select(src.cast("long").as("a"), dst.cast("long").as("b"))
        .where(col("a") < col("b")).distinct(), eager = false)
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient: (a,b) becomes u→w with u ≺ w in (degree, id) order; carry
    // the destination's rank so the wedge join can order out-neighbors
    // without another degree join
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    val fwd = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = graft.core.CacheScope.persist(
      withDeg.select(
        when(fwd, col("a")).otherwise(col("b")).as("u"),
        when(fwd, col("b")).otherwise(col("a")).as("w"),
        when(fwd, col("db")).otherwise(col("da")).as("dw")), eager = false)
    // wedge at u between out-neighbors x ≺ y, closed by oriented (x, y)
    val o2 = o.select(col("u").as("u2"), col("w").as("w2"),
      col("dw").as("dw2"))
    val wedgePairs = o.join(o2, col("u") === col("u2") &&
        (col("dw") < col("dw2") ||
          (col("dw") === col("dw2") && col("w") < col("w2"))))
      .select(col("w").as("x"), col("w2").as("y"))
    val tri = wedgePairs
      .join(o.select(col("u").as("x"), col("w").as("y")),
        Seq("x", "y"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val wedges = deg.agg(sum(col("d") * (col("d") - 1) / 2).cast("long")
      .as("n_wedges"))
    tri.crossJoin(wedges)
      .select(col("n_triangles"), col("n_wedges"),
        // a wedge-less graph (all degrees <= 1) has nothing to close:
        // define clustering as 0 rather than dividing by zero (ANSI)
        when(col("n_wedges") === 0L, lit(0.0))
          .otherwise(round(lit(3.0) * col("n_triangles") / col("n_wedges"), 9))
          .as("clustering"))
  }

  /** k-hop reachability census: for every vertex, the size of its ≤1, ≤2,
    * …, ≤`hops` hop neighborhood (self excluded) over the undirected edge
    * list — the audience-expansion / influence-radius card.
    *
    * Each hop is one join + distinct on (seed, v) pairs — the standard
    * BFS-by-joins frontier expansion, hash-partitioned by vertex.  The
    * materialized reach set is O(Σ |N_k(v)|), which is fine for
    * catalog-sized graphs (items, segments); for social-scale graphs swap
    * the exact distinct for HLL sketches per seed — same plan shape,
    * bounded state (documented, not built: the catalogs here are small).
    */
  def kHopReach(edges: DataFrame, src: Column, dst: Column,
      hops: Int): DataFrame = {
    val e = edges.select(src.cast("long").as("a"), dst.cast("long").as("b"))
      .where(col("a") =!= col("b"))
    // the directed edge list is probed once per hop — persist it so hop k
    // doesn't replay the symmetrize+distinct (CacheScope-tracked)
    val dir = graft.core.CacheScope.persist(
      e.unionAll(e.select(col("b").as("a"), col("a").as("b"))).distinct(),
      eager = false)
    // FRONTIER BFS with min-hop labels (the textbook delta expansion):
    // hop k expands only the rows FIRST reached at hop k-1 — not the whole
    // accumulated reach set — and the census falls out of ONE conditional
    // aggregate over the labeled union instead of one groupBy per hop
    // joined back together.  reach_k = Σ_{h<=k} frontier_h by the BFS
    // invariant, so counts are identical to the old whole-set recurrence;
    // per-hop join/distinct input shrinks from O(|reach_k|) to
    // O(|frontier_k|), which is what survives at social scale.
    // dir is already (a, b)-distinct, so hop-1 rows need no dedup.
    var frontier = graft.core.CacheScope.persist(
      dir.select(col("a").as("seed"), col("b").as("v")), eager = false)
    var seenParts = List(frontier.withColumn("__h", lit(1)))
    (2 to hops).foreach { k =>
      val seen = seenParts.map(_.select("seed", "v")).reduce(_ unionAll _)
      val expanded = frontier.join(dir, col("v") === col("a"))
        .select(col("seed"), col("b").as("v"))
        .where(col("v") =!= col("seed")).distinct()
      frontier = graft.core.CacheScope.persist(
        expanded.join(seen, Seq("seed", "v"), "left_anti"), eager = false)
      seenParts = seenParts :+ frontier.withColumn("__h", lit(k))
    }
    val labeled = seenParts.reduce(_ unionAll _)
    val aggs = (1 to hops).map { k =>
      sum(when(col("__h") <= k, 1L).otherwise(0L)).as(s"n$k")
    }
    labeled.groupBy("seed").agg(aggs.head, aggs.tail: _*)
      .orderBy("seed")
  }

  /** Approximate k-hop reachability census with BOUNDED state — the
    * HyperANF formulation (Boldi, Rosa & Vigna, WWW'11): every vertex
    * carries one mergeable HLL sketch of its ≤k-hop ball, and a hop is
    * `ball_k(v) = ball_{k-1}(v) ∪ ⋃_{u∈N(v)} ball_{k-1}(u)` — one edge
    * join + one sketch-union aggregate.  State is O(V · 2^lgK) BYTES no
    * matter how dense the graph: on a small-diameter social graph where
    * the exact [[kHopReach]]'s materialized (seed, v) reach set
    * approaches O(V²) rows, the sketch path's per-hop work stays O(E)
    * sketch merges.  This is the documented scale path for the exact
    * operator; [[kHopReachAuto]] gates between them.
    *
    * Output schema matches [[kHopReach]] (seed, n1..nk); counts are HLL
    * estimates (self excluded), within the sketch's standard error
    * (~1.04/√2^lgK ≈ 2.6% at the default lgK=12) of the exact census.
    * Deterministic: DataSketches HLL hashing and register-max merging are
    * order-independent, so the result is stable under any partitioning. */
  def kHopReachSketch(edges: DataFrame, src: Column, dst: Column,
      hops: Int, lgK: Int = 12): DataFrame = {
    val e = edges.select(src.cast("long").as("a"), dst.cast("long").as("b"))
      .where(col("a") =!= col("b"))
    val dir = graft.core.CacheScope.persist(
      e.unionAll(e.select(col("b").as("a"), col("a").as("b"))).distinct(),
      eager = false)
    // ball_1(v) = {v} ∪ N(v): seeding the ball with v itself makes the
    // recurrence pure union (no per-hop self-filter a sketch can't do);
    // the final estimate subtracts the self member back out
    var balls = graft.core.CacheScope.persist(
      dir.select(col("a").as("v"), col("b").as("m"))
        .unionAll(dir.select(col("a").as("v"), col("a").as("m")).distinct())
        .groupBy("v").agg(hll_sketch_agg(col("m"), lit(lgK)).as("sk")),
      eager = false)
    def census(k: Int) = balls.select(col("v").as("seed"),
      (hll_sketch_estimate(col("sk")) - 1L).as(s"n$k"))
    val counts = (1 to hops).map { k =>
      if (k > 1) {
        balls = graft.core.CacheScope.persist(
          dir.join(balls, dir("b") === balls("v"))
            .select(dir("a").as("v"), col("sk"))
            .unionByName(balls)
            .groupBy("v").agg(hll_union_agg(col("sk")).as("sk")),
          eager = false)
      }
      census(k)
    }
    counts.reduce { (l, r) => l.join(r, "seed") }.orderBy("seed")
  }

  /** Dual-plan gate for the k-hop census, mirroring the dedupClusters
    * discipline: the exact distinct-pairs BFS while the (cheap, already-
    * computed) directed edge count stays under `maxExactEdges`, the
    * bounded-state HLL sketch path beyond it.  Both paths share the same
    * output schema, so callers swap transparently at the crossover. */
  def kHopReachAuto(edges: DataFrame, src: Column, dst: Column, hops: Int,
      maxExactEdges: Long = 5000000L, lgK: Int = 12): DataFrame = {
    val e = graft.core.CacheScope.persist(
      edges.select(src.cast("long").as("a"), dst.cast("long").as("b"))
        .where(col("a") =!= col("b")), eager = false)
    if (e.count() <= maxExactEdges)
      kHopReach(e, col("a"), col("b"), hops)
    else kHopReachSketch(e, col("a"), col("b"), hops, lgK)
  }

  /** Community detection by synchronous label propagation (Raghavan,
    * Albert & Kumara 2007), made DETERMINISTIC: `iters` synchronous
    * rounds where every node adopts the most frequent label among its
    * neighbors, ties to the SMALLEST label (classic LPA breaks ties
    * randomly — fine for exploration, useless for an oracle-gated
    * engine; the min-label rule also guarantees convergence behaviour
    * is reproducible across partitionings).  Edges are treated as
    * undirected; self-loops dropped; isolated-by-filter nodes never
    * appear (no edges → no community evidence).
    *
    * Physical shape per round: ONE shuffle join (neighbor labels) and
    * TWO map-side-combined aggregations — the per-node argmax is
    * `max(struct(cnt, -label))`, NOT a per-node window (a window would
    * sort every adjacency list; the struct-max is a plain codegen'd
    * agg).  State between rounds is the (node, label) table, O(V).
    * Output: (v, label). */
  def labelPropagation(edges: DataFrame, src: Column, dst: Column,
      iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(src.cast("long").as("a"), dst.cast("long").as("b"))
      .where(col("a") =!= col("b"))
    val und = graft.core.CacheScope.persist(
      e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
        .distinct(), eager = false)
    var labels = und.select(col("a").as("v")).distinct()
      .select(col("v"), col("v").as("label"))
    (1 to iters).foreach { _ =>
      val counts = und
        .join(labels.select(col("v").as("b"), col("label")), Seq("b"))
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      labels = counts.groupBy(col("a"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("a").as("v"), (-col("m.nl")).as("label"))
    }
    labels
  }

  /** k-core decomposition (Seidman 1983): iteratively peel vertices whose
    * degree in the SURVIVING subgraph is < k until fixpoint; what remains
    * is the maximal subgraph with minimum degree ≥ k — the dense-cluster
    * extractor (spam rings, tight co-engagement cliques).
    *
    * Per round: one degree aggregation + two keyed semi-joins (drop edges
    * touching a peeled endpoint) — no global stage; peeling is MONOTONE,
    * so rounds after the fixpoint are no-ops and the oracle can replay
    * exactly `maxRounds` rounds as a generated CTE chain (the
    * ml_kmeans_lloyd discipline).  FAILS LOUDLY if `maxRounds` rounds do
    * not converge — an unconverged core silently reported would be a
    * wrong answer, and the oracle's fixed-round replay would diverge.
    * One bounded driver count per round (the convergence probe).
    *
    * Dual-plan gate (the pageRank discipline): graphs at or under
    * `maxDriverEdges` symmetric edges run the identical synchronized peel
    * on the driver — one collect instead of maxRounds × (3 shuffles +
    * checkpoint + count) materialization barriers, which dominate wall
    * time on catalog-sized graphs.  Same rounds, same maxRounds
    * enforcement, bit-equal result (R16KcoreSpec asserts agreement at
    * the boundary).
    *
    * Output: (v, degree) of the k-core, every degree ≥ k. */
  def kCore(edges: DataFrame, src: Column, dst: Column, k: Int,
      maxRounds: Int = 8, maxDriverEdges: Long = 3000000L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges.sparkSession
    val e = edges.select(src.cast("long").as("a"), dst.cast("long").as("b"))
      .where(col("a") =!= col("b"))
    // each round references the previous frontier TWICE (via keep), so
    // without lineage truncation the logical plan grows 3^rounds —
    // localCheckpoint per round (the pageRank superstep discipline)
    // keeps it O(1)
    var cur = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(true)
    var nEdges = cur.count()
    if (nEdges <= maxDriverEdges) {
      // catalog-sized graphs run the IDENTICAL synchronized peel on the
      // driver (the pageRank/kHopReachAuto dual-plan gate): up to 16
      // distributed rounds × (3 shuffles + checkpoint + count) collapse
      // into one collect.  Rounds stay synchronized and maxRounds stays
      // enforced — the oracle replays exactly maxRounds rounds, so a
      // driver peel that silently ran past the bound would diverge from
      // it on non-converged inputs.  Spec asserts path agreement at the
      // gate boundary (R16KcoreSpec).
      var adj = cur.collect().map(r => (r.getLong(0), r.getLong(1)))
      var n = adj.length
      var round = 0
      var converged = false
      while (round < maxRounds && !converged) {
        val deg = adj.groupBy(_._1).map { case (v, es) => v -> es.length }
        val keep = deg.filter(_._2 >= k).keySet
        val next = adj.filter(p => keep(p._1) && keep(p._2))
        converged = next.length == n || next.isEmpty
        adj = next
        n = next.length
        round += 1
      }
      require(converged,
        s"kCore(k=$k) did not converge in $maxRounds rounds — raise " +
          "maxRounds (the oracle replays exactly that many rounds)")
      import spark.implicits._
      return adj.groupBy(_._1).toSeq
        .map { case (v, es) => (v, es.length.toLong) }.toDF("v", "degree")
    }
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val keep = cur.groupBy("a").agg(count(lit(1)).as("__d"))
        .where(col("__d") >= k).select(col("a"))
      val next = cur.join(keep, Seq("a"), "left_semi")
        .join(keep.select(col("a").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b")).localCheckpoint(true)
      val n2 = next.count()
      // n2 == 0 is as final as a fixpoint: an empty graph cannot peel
      // further, so a run whose LAST allowed round empties the graph is
      // converged, not a failure
      converged = n2 == nEdges || n2 == 0
      cur = next
      nEdges = n2
      round += 1
    }
    require(converged,
      s"kCore(k=$k) did not converge in $maxRounds rounds — raise " +
        "maxRounds (the oracle replays exactly that many rounds)")
    cur.groupBy(col("a").as("v")).agg(count(lit(1)).as("degree"))
  }
}
