package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/**
 * Graph analytics over edge lists, complementing
 * [[Dedup.connectedComponents]] — the same scale posture: the graph
 * never materializes as adjacency lists (skew-prone at 100 TB), every
 * round works on slim (src, dst[, weight]) rows, and iteration lineage
 * is cut with local checkpoints so plan depth stays bounded.
 *
 * PageRank follows the classic formulation (Page et al. 1999,
 * "The PageRank Citation Ranking"); triangle counting is the canonical
 * oriented-edge join (Suri & Vassilvitskii 2011, WWW — "Counting
 * triangles and the curse of the last reducer").
 */
object GraphOps {

  /** Session conf key bounding per-round broadcast joins in the
    * iterative operators (this file and the [[graft.cypher]] reach
    * lowering). A frontier / rank / parent frame whose EXACT row count
    * — every loop here already counts its frames for guards and
    * termination — sits at or under the bound joins with an explicit
    * broadcast hint, so the static edge frame is never shuffled per
    * round (optimization guide §3.1 "pick the join strategy
    * deliberately", §2.4 "a broadcast join replaces a shuffle of the
    * large side"). LocalCheckpoint frames carry no size statistics,
    * so without the hint every per-round join degenerates to
    * sort-merge: both sides, INCLUDING the static edge frame, are
    * re-shuffled and re-sorted every round. Rows at these sites are
    * slim (16–64 B: ids, distances, σ counters), so the 1M-row
    * default is ≲ 64 MB framed — comfortably inside the guide's
    * broadcast band. The decision keys off the measured per-round
    * count, not a constant tuned to any one scale: a 100 TB run whose
    * frontier outgrows the bound falls back to the shuffle strategy
    * automatically. Set 0 to disable; raise deliberately on
    * big-memory clusters. */
  val BroadcastRowsConf = "spark.graft.broadcastRows"
  val BroadcastRowsDefault = 1000000L

  /** Byte companion to [[BroadcastRowsConf]] (optimization round 17;
    * VERDICT-r16 #6): the row bound alone is width-blind — 1M rows of
    * witness arrays or wide property structs is a multi-GB broadcast.
    * A hint additionally requires rows × [[estRowBytes]] within this
    * budget. Default 128 MB of ESTIMATED bytes: [[estRowBytes]] is
    * deliberately ~2× pessimistic on real data (20 B per string, 8
    * elements per container), so this admits the slim loop frames the
    * round-16 hints were measured on (≤ ~116 B/row estimated at the
    * 1M row bound) while a genuinely wide frame — arrays of structs,
    * dozens of string properties — estimates far past it and keeps
    * the planner's shuffle strategy. */
  val BroadcastBytesConf = "spark.graft.broadcastBytes"
  val BroadcastBytesDefault = 128L * 1024 * 1024

  /** Conservative schema-derived per-row byte estimate: catalyst
    * `defaultSize` per scalar (8 B numerics, 20 B strings), containers
    * charged for ~8 elements plus header — an ESTIMATE for admission
    * decisions (broadcast hints, driver collects), deliberately
    * pessimistic on variable-width data so a wide frame is rejected
    * rather than OOMing an executor. */
  private[graft] def estRowBytes(schema: StructType): Long = {
    def sz(dt: org.apache.spark.sql.types.DataType): Long = dt match {
      case ArrayType(et, _) => 16L + 8L * sz(et)
      case MapType(kt, vt, _) => 16L + 8L * (sz(kt) + sz(vt))
      case s: StructType => 8L + s.fields.map(f => sz(f.dataType)).sum
      case other => other.defaultSize.toLong
    }
    math.max(8L, sz(schema))
  }

  /** `df` with a broadcast hint when `rows` (an exact count the
    * caller already holds) is within [[BroadcastRowsConf]] AND the
    * estimated payload (rows × [[estRowBytes]]) is within
    * [[BroadcastBytesConf]]; `df` unchanged otherwise, keeping the
    * planner's shuffle strategy for frames past either bound. The
    * intended call sites are SLIM frames (ids, distances, σ counters,
    * 16–64 B rows); the byte gate makes that contract enforced rather
    * than assumed (ADVICE-r16). */
  private[graft] def bcastIf(df: DataFrame, rows: Long): DataFrame = {
    val conf = df.sparkSession.conf
    val lim = conf.getOption(BroadcastRowsConf)
      .map(_.toLong).getOrElse(BroadcastRowsDefault)
    val bytesLim = conf.getOption(BroadcastBytesConf)
      .map(_.toLong).getOrElse(BroadcastBytesDefault)
    if (rows >= 0 && rows <= lim &&
        rows * estRowBytes(df.schema) <= bytesLim) broadcast(df) else df
  }

  /**
   * PageRank over a directed edge list, fixed iteration count.
   *
   * rank_0(v) = 1/N;
   * rank_{k+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} rank_k(u)/outdeg(u).
   *
   * Dangling mass (nodes with no out-edges) is NOT redistributed —
   * both this and any mirror must use the same convention; documented
   * so results are reproducible.
   *
   * 100 TB posture: edges dedupe once to slim (src, dst) rows and the
   * out-degree joins in ONCE up front, so each iteration is a single
   * (broadcastable rank)-to-edges join plus one groupBy(dst) shuffle of
   * 16-byte rows. Rank state is 16 B/node. Lineage is cut every
   * `checkpointEvery` iterations with a lazy localCheckpoint (the
   * connectedComponents pattern) so the plan doesn't deepen linearly
   * with k. Co-partitioning edges by src (bucketed input) makes the
   * per-iteration rank join shuffle-free on the edge side.
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 10, damping: Double = 0.85,
               checkpointEvery: Int = 5): DataFrame =
    pageRankImpl(edges, srcCol, dstCol, iterations, damping,
      checkpointEvery, sources = None)

  /**
   * Personalized PageRank (Jeh & Widom 2003, "Scaling personalized web
   * search"): teleportation lands uniformly on the SOURCE set instead
   * of all nodes —
   * rank_0 = 1_S/|S|; rank_{k+1}(v) = (1-d)·1_S(v)/|S| + d·Σ rank_k(u)/outdeg(u).
   * Ranks measure proximity to the sources (recommendation /
   * relatedness queries); nodes unreachable from S stay at 0.
   * Same per-iteration plan as [[pageRank]] — the teleport vector is a
   * broadcastable membership flag on the node table, not a new join.
   */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           sources: DataFrame, iterations: Int = 10,
                           damping: Double = 0.85,
                           checkpointEvery: Int = 5): DataFrame =
    pageRankImpl(edges, srcCol, dstCol, iterations, damping,
      checkpointEvery, sources = Some(sources))

  private def pageRankImpl(edges: DataFrame, srcCol: String, dstCol: String,
                           iterations: Int, damping: Double,
                           checkpointEvery: Int,
                           sources: Option[DataFrame]): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    // lazy checkpoints: nodes and (src, dst, deg) are static across
    // iterations — materialize them once (the count() job below) so no
    // iteration re-reads or re-dedupes the raw edge input
    val nodes0 = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // teleport column: uniform over all nodes, or over the source set
    // (personalized). The source flag joins ONCE onto the static node
    // table, so iterations never touch the source frame again.
    val nodes = (sources match {
      case None => nodes0.withColumn("__tele", lit(1.0))
      case Some(s) =>
        nodes0.join(broadcast(s.toDF("node").distinct()
            .withColumn("__in", lit(true))), Seq("node"), "left")
          .select(col("node"),
            when(col("__in"), lit(1.0)).otherwise(lit(0.0)).as("__tele"))
    }).localCheckpoint(false)
    // teleport mass denominator: N for classic, |S ∩ nodes| for
    // personalized (one job; parameterizes the literals below)
    val n = nodes.agg(sum("__tele")).head().getDouble(0)
    require(n > 0, "personalized PageRank needs >= 1 source in the graph")
    // rank/contrib frames hold exactly nNodes (≤ nNodes for contribs)
    // rows every iteration — broadcast them under the bound so eDeg
    // and nodes are never shuffled per iteration (the one remaining
    // per-iteration exchange is the groupBy("node") partial agg)
    val nNodes = nodes.count()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val eDeg = e.join(outDeg, "src").localCheckpoint(false)
    var ranks = nodes.select(col("node"),
      (col("__tele") / lit(n)).as("rank"))
    for (k <- 1 to iterations) {
      val contribs = eDeg.join(bcastIf(ranks, nNodes),
          eDeg("src") === ranks("node"))
        .select(eDeg("dst").as("node"),
          (ranks("rank") / eDeg("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = nodes.join(bcastIf(contribs, nNodes), Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) * col("__tele") / lit(n) +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
      if (k % checkpointEvery == 0 && k < iterations)
        ranks = ranks.localCheckpoint(false)
    }
    ranks.select("node", "rank")
  }

  /** Per-node out/in degrees over a directed edge list (0 for absent
    * direction). Slim-key aggregation; one shuffle per direction plus
    * the outer-join merge. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    val out = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /**
   * Exact global triangle count over an UNDIRECTED edge list.
   *
   * Edges canonicalize to (lo, hi) with lo < hi and dedupe; triangles
   * enumerate via DEGREE-ORDERED orientation (see
   * [[orientedTriangles]]) — wedge fan-out per node is bounded by its
   * out-degree in the (degree, id)-ranked acyclic orientation, which
   * is O(sqrt(E)) on any graph (the arboricity bound), so a hub node
   * no longer produces a quadratic "last reducer" (Suri &
   * Vassilvitskii 2011) even UNVALVED.
   *
   * `maxDegree` remains as the explicit-semantics valve (drop
   * over-cap nodes entirely BEFORE pairing, the documented contract
   * shared with kTruss/clusteringCoefficient); with the degree
   * orientation it is a result-shaping knob, not a survival
   * requirement. Pass None to keep the full graph.
   */
  def triangleCount(edges: DataFrame, aCol: String, bCol: String,
                    maxDegree: Option[Int] = None): DataFrame = {
    val raw = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    val canon = raw.select(
      least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
      .distinct()
    orientedTriangles(capDegree(canon, maxDegree))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /**
   * All triangles of a canonical (lo, hi) edge set, one row (a, b, c)
   * per triangle, via degree-ordered orientation: each undirected edge
   * orients from its lower-(degree, id) endpoint to the higher; every
   * triangle then has exactly ONE node with two outgoing edges (its
   * rank-minimum), so enumerating ordered out-wedges at each node and
   * semi-joining the closing oriented edge counts each triangle exactly
   * once. Wedge work per node is outdeg², and the ranked orientation
   * bounds outdeg by O(sqrt(E)) on any graph — hub-safe two-path
   * enumeration without caps (Chiba–Nishizeki orientation, the
   * standard fix for the "curse of the last reducer").
   * Output columns (a, b, c) carry no order guarantee.
   */
  private def orientedTriangles(canon: DataFrame): DataFrame = {
    val deg = canon.select(col("lo").as("n"))
      .union(canon.select(col("hi").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = canon
      .join(deg.select(col("n").as("lo"), col("d").as("__dl")), Seq("lo"))
      .join(deg.select(col("n").as("hi"), col("d").as("__dh")), Seq("hi"))
    // orient low-rank → high-rank; carry the head's rank for wedge order
    val oriented = withDeg.select(
        when(struct(col("__dl"), col("lo")) < struct(col("__dh"), col("hi")),
          struct(col("lo").as("u"), col("hi").as("v"), col("__dh").as("vd")))
        .otherwise(
          struct(col("hi").as("u"), col("lo").as("v"), col("__dl").as("vd")))
        .as("__e"))
      .select(col("__e.u").as("u"), col("__e.v").as("v"), col("__e.vd").as("vd"))
      .localCheckpoint(false)
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.u") === col("y.u") &&
          struct(col("x.vd"), col("x.v")) < struct(col("y.vd"), col("y.v")))
      .select(col("x.u").as("a"), col("x.v").as("b"), col("y.v").as("c"))
    // the closing edge is oriented b → c (rank(b) < rank(c) by the
    // wedge order), so one semi join closes the triangle
    wedges.join(oriented.select(col("u").as("b"), col("v").as("c")),
      Seq("b", "c"), "left_semi")
  }

  /** The hub-degree valve shared by the triangle-family operators
    * ([[triangleCount]], [[kTruss]]/[[kTrussExact]]): drop every
    * canonical edge incident to a node of degree > cap BEFORE any
    * two-path enumeration — id-ordered two-path fan-out is quadratic
    * in hub degree (Suri & Vassilvitskii's "last reducer"), so the
    * cap bounds the quadratic corner the way the dedup operators cap
    * blocks. `None` keeps the full graph. */
  private def capDegree(canon: DataFrame, maxDegree: Option[Int]): DataFrame =
    maxDegree match {
      case None => canon
      case Some(cap) =>
        val deg = canon.select(col("lo").as("node"))
          .union(canon.select(col("hi").as("node")))
          .groupBy("node").agg(count(lit(1)).as("d"))
        val keep = deg.where(col("d") <= cap).select("node")
        canon.join(keep.withColumnRenamed("node", "lo"), Seq("lo"))
          .join(keep.withColumnRenamed("node", "hi"), Seq("hi"))
          .select("lo", "hi")
    }

  /** Canonical undirected edge set: (lo, hi) with lo < hi, self-loops
    * dropped, deduped. Shared by the undirected analytics below. */
  private def canonical(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .distinct()

  /** Both directions of the canonical undirected edge set as
    * (node, nbr) rows — still an edge LIST (2|E| slim rows), not
    * adjacency lists; no per-node collection anywhere. */
  private def symmetric(e: DataFrame): DataFrame =
    e.select(col("lo").as("node"), col("hi").as("nbr"))
      .union(e.select(col("hi").as("node"), col("lo").as("nbr")))

  /**
   * Synchronous label propagation community detection (Raghavan et al.
   * 2007, "Near linear time algorithm to detect community structures in
   * large-scale networks"), made DETERMINISTIC: labels start as node
   * ids; each round every node adopts the most frequent label among its
   * neighbors, ties broken by the SMALLEST label; isolated nodes (none
   * here — every node has an edge by construction) keep their label.
   * Synchronous update + total tie order makes the result reproducible
   * across engines, which the classic async/random-tie variant is not.
   *
   * 100 TB posture: each round is (a) one shuffle joining the 16 B/node
   * label state to the symmetric edge list on nbr, (b) one
   * groupBy(node, label) count — partial aggregation absorbs hub
   * fan-in map-side, (c) one groupBy(node) max(struct(cnt, -label))
   * argmax — again partially aggregated, O(distinct labels per node)
   * ≤ degree. No windows over whole partitions, no adjacency lists;
   * label state is checkpointed per round so plan depth stays O(1).
   */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
                       rounds: Int = 4): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e = canonical(edges, aCol, bCol)
    val adj = symmetric(e).localCheckpoint(false)
    var labels = adj.select(col("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(false)
    // node-sized label state broadcasts under the bound (bcastIf): the
    // symmetrized edge frame never re-shuffles per round
    val nNodes = labels.count()
    for (_ <- 1 to rounds) {
      val counts = adj.join(
        bcastIf(labels.withColumnRenamed("node", "nbr"), nNodes), "nbr")
        .groupBy("node", "label").agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc): max over (c, -label) pairs,
      // both long — struct ordering is lexicographic, so negating the
      // label turns "smallest label" into "largest second field"
      labels = counts
        .groupBy("node")
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
        .localCheckpoint(false)
    }
    labels
  }

  /**
   * k-core membership after a FIXED number of synchronous peeling
   * rounds: each round drops every node whose current degree is < k,
   * then recomputes degrees on the induced subgraph (Matula & Beck
   * 1983 peeling, bulk-synchronous). With enough rounds this is the
   * exact k-core; a fixed `peels` bound keeps the computation
   * deterministic and mirrorable — extra rounds past convergence are
   * no-ops, so callers pick `peels` ≥ the expected peel depth (peel
   * depth is tiny for the near-dup / co-occurrence graphs this targets;
   * the exact core would loop to fixpoint with the same per-round
   * plan).
   *
   * Returns (node, deg): nodes surviving all rounds with their induced
   * degree. Per round: one groupBy over the symmetric edge list + two
   * semi joins to filter edges by surviving endpoints — all slim
   * (node, nbr) rows, no adjacency lists; lineage cut per round.
   */
  def kCore(edges: DataFrame, aCol: String, bCol: String,
            k: Int, peels: Int = 4): DataFrame = {
    require(k >= 1 && peels >= 1, "k and peels must be >= 1")
    var e = canonical(edges, aCol, bCol).localCheckpoint(false)
    for (_ <- 1 to peels) e = peelOnce(e, k)
    symmetric(e).groupBy("node").agg(count(lit(1)).as("deg"))
  }

  /**
   * EXACT k-core: peel to the fixpoint instead of a fixed round count.
   * Peeling only ever REMOVES edges, so an unchanged edge count is the
   * fixpoint — detected with the count that already materializes each
   * round's lazy checkpoint (one job per round, the
   * [[Dedup.connectedComponents]] convergence pattern; no content hash
   * needed thanks to monotonicity). Peel depth is bounded by the
   * longest chain hanging off the core — tiny for co-occurrence
   * graphs, `maxIter` backstops adversarial paths.
   */
  def kCoreExact(edges: DataFrame, aCol: String, bCol: String,
                 k: Int, maxIter: Int = 50): DataFrame = {
    require(k >= 1 && maxIter >= 1, "k and maxIter must be >= 1")
    var e = canonical(edges, aCol, bCol).localCheckpoint(false)
    var n = e.count()
    var iter = 0
    var converged = n == 0L
    while (!converged && iter < maxIter) {
      iter += 1
      val next = peelOnce(e, k)
      val n2 = next.count()
      converged = n2 == n || n2 == 0L
      e = next; n = n2
    }
    symmetric(e).groupBy("node").agg(count(lit(1)).as("deg"))
  }

  /** One synchronous peel round: drop every node with induced degree
    * < k, keep only edges between survivors. Lazy checkpoint — the
    * caller's next count/aggregate materializes it. */
  private def peelOnce(e: DataFrame, k: Int): DataFrame = {
    val keep = symmetric(e).groupBy("node").agg(count(lit(1)).as("d"))
      .where(col("d") >= k).select("node")
    e.join(keep.withColumnRenamed("node", "lo"), Seq("lo"), "left_semi")
      .join(keep.withColumnRenamed("node", "hi"), Seq("hi"), "left_semi")
      .select("lo", "hi")
      .localCheckpoint(false)
  }

  /**
   * Common-neighbor link prediction over an undirected graph: for every
   * node pair (u < v) with at least one shared neighbor, emit
   * cn = |N(u)∩N(v)|, Jaccard = cn / (|N(u)|+|N(v)|-cn), and
   * Adamic–Adar = Σ_{w∈N(u)∩N(v)} 1/ln(deg(w)) (Adamic & Adar 2003,
   * "Friends and neighbors on the Web"). Pairs may or may not be
   * existing edges — callers anti-join `edges` to score only
   * non-edges.
   *
   * The pair generation is the triangle two-path shape: join the
   * symmetric edge list to itself on the MIDDLE node w, keep u < v.
   * That fan-out is quadratic in deg(w), so `maxDegree` drops hub
   * middles above the bound BEFORE pairing — the same skew valve as
   * [[triangleCount]]; the bound is part of the operator's contract
   * (scores become "over the ≤cap-degree graph") and any mirror must
   * apply it identically. Degrees join back post-aggregation on slim
   * (node, deg) rows.
   */
  def commonNeighborScores(edges: DataFrame, aCol: String, bCol: String,
                           maxDegree: Option[Int] = Some(1000)): DataFrame = {
    // the canonical set feeds the pair join, the degree table, and two
    // degree join-backs — materialize it once (the pattern every other
    // iterative op here uses) instead of re-deriving the input pairing
    // per consumer; deg is 12 B/node and read three times, so it gets
    // the same treatment
    val e = canonical(edges, aCol, bCol).localCheckpoint(false)
    val sym = symmetric(e)
    val deg = sym.groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val mids = maxDegree match {
      case None => sym
      case Some(cap) =>
        sym.join(deg.where(col("deg") <= cap).select("node"),
          Seq("node"), "left_semi")
    }
    // two-path through w: (w, u) ⋈ (w, v), u < v; ln(deg(w)) rides
    // along so Adamic–Adar needs no third join
    val wdeg = mids.join(deg, "node")
      .select(col("node").as("w"), col("nbr").as("u"),
        log(col("deg").cast("double")).as("lnd"))
    val pairs = wdeg.as("x").join(
        wdeg.select(col("w"), col("u").as("v")).as("y"), "w")
      .where(col("u") < col("v"))
      .groupBy("u", "v")
      .agg(count(lit(1)).as("cn"), sum(lit(1.0) / col("lnd")).as("aa"))
    pairs
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(col("u"), col("v"), col("cn"),
        (col("cn").cast("double") /
          (col("du") + col("dv") - col("cn"))).as("jaccard"),
        col("aa").as("adamic_adar"))
  }

  /**
   * Multi-source BFS hop distances over a DIRECTED edge list, bounded
   * depth: dist(v) = min hops from any source, for all v reachable in
   * ≤ `maxHops`. Sources are a 1-column DataFrame (any name).
   *
   * Classic frontier iteration (Beamer et al.'s top-down direction,
   * which is the right shape for Spark — the frontier is a slim
   * (node) set): each hop joins the CURRENT frontier to edges on src,
   * anti-joins the visited set, and unions the survivors in. All rows
   * are ≤ 16 B (node, dist); the visited set is checkpointed per hop
   * so plan depth is O(1), and the frontier join broadcasts whenever
   * the frontier is small (which BFS frontiers usually are at the
   * start and end of the wave). No per-path enumeration anywhere —
   * this is O(V+E) per wave, never O(paths).
   */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   sources: DataFrame, maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(false)
    val src0 = sources.toDF("node").distinct()
    var visited = src0.withColumn("dist", lit(0L)).localCheckpoint(false)
    var frontier = visited
    // the count that materializes each wave's checkpoint doubles as
    // the broadcast-hint bound probe (bcastIf): a small frontier
    // broadcasts into the wave join so the static edge frame is never
    // shuffled per hop
    var fRows = frontier.count()
    var hop = 0L
    while (hop < maxHops) {
      hop += 1
      val next = bcastIf(frontier, fRows)
        .join(e, frontier("node") === e("src"))
        .select(e("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(hop))
        .localCheckpoint(false)
      val n = next.count()
      if (n == 0) hop = maxHops // converged: nothing new reachable
      else {
        visited = visited.union(next).localCheckpoint(false)
        frontier = next
        fRows = n
      }
    }
    visited
  }

  /**
   * Local clustering coefficient per node of the undirected graph:
   * `coeff = 2·T(v) / (deg(v)·(deg(v)−1))` where T(v) counts triangles
   * through v — the per-node closure density behind community
   * cohesion scoring and spam-subgraph triage. Nodes of degree < 2
   * report 0.0. Output: (node, deg, n_tri, coeff), coeff rounded to 6.
   *
   * Scale shape — same canonical machinery as [[triangleCount]]: the
   * DEGREE-ORDERED enumeration ([[orientedTriangles]], arboricity-
   * bounded wedge fan-out, hub-safe uncapped) yields each triangle
   * once with NO row multiplication, then each closed triangle
   * contributes to its three corners via an in-row 3-way explode of
   * slim id rows; one partial-aggregated count per node finishes. The
   * optional `maxDegree` valve caps hub fan-out before pairing exactly
   * as in [[triangleCount]] (documented truncation, not silent skew
   * death).
   */
  def clusteringCoefficient(edges: DataFrame, aCol: String, bCol: String,
                            maxDegree: Option[Int] = None): DataFrame = {
    val canon = canonical(edges, aCol, bCol)
    val e = maxDegree match {
      case None => canon
      case Some(cap) =>
        val deg0 = symmetric(canon)
          .groupBy("node").agg(count(lit(1)).as("d"))
        val keep = deg0.where(col("d") <= cap).select("node")
        canon.join(keep.withColumnRenamed("node", "lo"), Seq("lo"))
          .join(keep.withColumnRenamed("node", "hi"), Seq("hi"))
          .select("lo", "hi")
    }
    val deg = symmetric(e).groupBy("node").agg(count(lit(1)).as("deg"))
    val perNode = orientedTriangles(e)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(when(col("deg") < 2, lit(0.0))
          .otherwise(lit(2.0) * coalesce(col("n_tri"), lit(0L))
            .cast("double") /
            (col("deg") * (col("deg") - lit(1L))).cast("double")), 6)
          .as("coeff"))
  }

  /**
   * Bipartite projection: from a two-mode edge list (left, right),
   * produce the one-mode co-occurrence graph over the RIGHT nodes —
   * (u < v, weight = number of distinct left pivots they share). This
   * is the graph-construction step behind co-supply / co-purchase /
   * co-citation analytics (7 of this repo's graph specs build exactly
   * this shape inline).
   *
   * Scale: the quadratic danger is a hub pivot (a left node connected
   * to k rights emits k² pairs) — `maxPivotDegree` drops pivots above
   * the cap BEFORE pairing (documented truncation, the triangleCount
   * valve); `minWeight` prunes noise pairs after the partial-agg
   * count. Distinct-then-join on the pivot key is one shuffle; pair
   * aggregation a second.
   */
  def bipartiteProject(edges: DataFrame, leftCol: String, rightCol: String,
                       maxPivotDegree: Option[Int] = None,
                       minWeight: Long = 1): DataFrame = {
    val pr = edges.select(col(leftCol).as("__l"), col(rightCol).as("__r"))
      .where(col("__l").isNotNull && col("__r").isNotNull)
      .distinct()
    val kept = maxPivotDegree match {
      case None => pr
      case Some(cap) =>
        val pd = pr.groupBy("__l").agg(count(lit(1)).as("__d"))
        pr.join(pd.where(col("__d") <= cap).select("__l"), Seq("__l"))
    }
    kept.as("a").join(kept.as("b"),
        col("a.__l") === col("b.__l") && col("a.__r") < col("b.__r"))
      .groupBy(col("a.__r").as("u"), col("b.__r").as("v"))
      .agg(count(lit(1)).as("weight"))
      .where(col("weight") >= minWeight)
  }

  /**
   * Newman modularity of a community assignment over the undirected
   * graph: `Q = Σ_c [ L_c/m − (D_c/2m)² ]` (L_c intra-community
   * edges, D_c total degree of c, m total edges) — the one-number
   * quality check run after ANY community detection
   * ([[labelPropagation]], the dedup components) before the
   * assignment is trusted downstream. Output one row:
   * (modularity, n_communities, m_edges), modularity rounded to 6.
   *
   * Scale: two broadcast-or-hash joins of the slim (node, community)
   * map onto the canonical edge list, partial-aggregated per-community
   * sums (state = communities, not nodes), one final 1-row reduce.
   * Nodes missing from `communities` fail loudly (inner joins drop
   * their edges and the degree sum mismatch is visible in m_edges)
   * rather than silently counting as singletons.
   */
  def modularity(edges: DataFrame, aCol: String, bCol: String,
                 communities: DataFrame, nodeCol: String = "node",
                 commCol: String = "label"): DataFrame = {
    val e = canonical(edges, aCol, bCol)
    val comm = communities.select(col(nodeCol).as("__n"),
      col(commCol).as("__c"))
    val mDf = e.agg(count(lit(1)).cast("double").as("__m"))
    val deg = symmetric(e).groupBy(col("node")).agg(count(lit(1)).as("__d"))
    val intra = e
      .join(comm.select(col("__n").as("lo"), col("__c").as("__ca")), Seq("lo"))
      .join(comm.select(col("__n").as("hi"), col("__c").as("__cb")), Seq("hi"))
      .where(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("__c")).agg(count(lit(1)).as("__li"))
    val dc = comm.join(deg, col("__n") === col("node"))
      .groupBy(col("__c")).agg(sum(col("__d")).as("__dc"))
    dc.join(intra, Seq("__c"), "left")
      .crossJoin(broadcast(mDf))
      .agg(
        round(sum(coalesce(col("__li"), lit(0L)).cast("double") / col("__m")
          - pow(col("__dc").cast("double") / (lit(2.0) * col("__m")), 2)), 6)
          .as("modularity"),
        count(lit(1)).as("n_communities"),
        max(col("__m")).cast("long").as("m_edges"))
  }

  /**
   * k-truss peeling, fixed `rounds` bulk-synchronous iterations: keep
   * edges participating in ≥ k−2 triangles, recompute, repeat — the
   * edge-level cohesion decomposition (stricter than k-core; the
   * standard community-core extractor). Returns the surviving
   * canonical (lo, hi) edges after `rounds` peels; a fixed round count
   * keeps the SQL oracle mirrorable (the [[kCore]] contract), with
   * [[kTrussExact]] as the converged twin.
   *
   * Scale: each round re-runs the oriented triangle enumeration on the
   * shrinking edge set (no row multiplication), explodes each triangle
   * to its 3 edges IN-ROW, partial-aggregates support per edge, and
   * semi-joins the survivors; per-round lineage cuts keep plan depth
   * O(1). `maxDegree` is the hub valve (the [[triangleCount]]
   * contract): edges incident to a node of degree > cap are dropped
   * BEFORE the first peel — the per-round two-path join is quadratic
   * in hub degree, and unlike [[triangleCount]] it is paid once per
   * round, so an unvalved hub stalls every peel. On a hub-free graph
   * the valve is a no-op (pinned by unit test); on a capped graph the
   * result is the k-truss OF THE CAPPED GRAPH, the same explicit
   * semantics as the other valves.
   */
  def kTruss(edges: DataFrame, aCol: String, bCol: String, k: Int,
             rounds: Int, maxDegree: Option[Int] = None): DataFrame = {
    require(k >= 3, s"k must be >= 3: $k")
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    var e = capDegree(canonical(edges, aCol, bCol), maxDegree)
      .localCheckpoint(false)
    for (_ <- 1 to rounds) e = trussPeelOnce(e, k).localCheckpoint(false)
    e
  }

  private def trussPeelOnce(e: DataFrame, k: Int): DataFrame = {
    // degree-ordered enumeration (orientedTriangles) — per-round wedge
    // work is arboricity-bounded, so a hub doesn't stall every peel;
    // (a, b, c) carry no order, so support pairs re-canonicalize
    val tris = orientedTriangles(e)
    val support = tris.select(explode(array(
        struct(least(col("a"), col("b")).as("lo"),
          greatest(col("a"), col("b")).as("hi")),
        struct(least(col("b"), col("c")).as("lo"),
          greatest(col("b"), col("c")).as("hi")),
        struct(least(col("a"), col("c")).as("lo"),
          greatest(col("a"), col("c")).as("hi")))).as("__e"))
      .groupBy(col("__e.lo").as("lo"), col("__e.hi").as("hi"))
      .agg(count(lit(1)).as("__sup"))
    e.join(support.where(col("__sup") >= k - 2).select("lo", "hi"),
      Seq("lo", "hi"), "left_semi")
  }

  /** Converged k-truss: peel until the edge COUNT stops changing —
    * convergence detection rides the count that materializes each
    * round's checkpoint (one job per round, the [[kCoreExact]]
    * pattern). `maxRounds` bounds pathological graphs; `maxDegree` is
    * the same pre-peel hub valve as [[kTruss]]. */
  def kTrussExact(edges: DataFrame, aCol: String, bCol: String, k: Int,
                  maxRounds: Int = 50,
                  maxDegree: Option[Int] = None): DataFrame = {
    require(k >= 3, s"k must be >= 3: $k")
    var e = capDegree(canonical(edges, aCol, bCol), maxDegree)
      .localCheckpoint(false)
    var n = e.count()
    var done = n == 0
    var r = 0
    while (!done && r < maxRounds) {
      e = trussPeelOnce(e, k).localCheckpoint(false)
      val n2 = e.count()
      done = n2 == n || n2 == 0
      n = n2
      r += 1
    }
    e
  }

  /**
   * Weighted PageRank: contributions distribute proportionally to edge
   * weight — `rank_{k+1}(v) = (1−d)/N + d·Σ_u rank_k(u)·w(u,v)/W(u)`
   * with `W(u)` the total outgoing weight. The natural composition
   * with [[bipartiteProject]]: co-occurrence weights make strongly
   * co-supplying partners matter more than one-off pairings. Parallel
   * (src, dst) rows pre-sum their weights; non-positive weights drop.
   * Same per-iteration plan shape as [[pageRank]] (one slim-key
   * shuffle per iteration, static edge+weight frame checkpointed
   * once, lineage cut every `checkpointEvery` rounds).
   */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
                       weightCol: String, iterations: Int = 10,
                       damping: Double = 0.85,
                       checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("double").as("w"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("w") > 0)
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    val n = nodes.count().toDouble
    require(n > 0, "empty graph")
    val outW = e.groupBy("src").agg(sum(col("w")).as("ow"))
    val eW = e.join(outW, "src").localCheckpoint(false)
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (k <- 1 to iterations) {
      // node-sized rank/contrib frames broadcast under the bound —
      // eW and nodes never re-shuffle per iteration (see bcastIf)
      val contribs = eW.join(bcastIf(ranks, n.toLong),
          eW("src") === ranks("node"))
        .select(eW("dst").as("node"),
          (ranks("rank") * eW("w") / eW("ow")).as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = nodes.join(bcastIf(contribs, n.toLong), Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
      if (k % checkpointEvery == 0 && k < iterations)
        ranks = ranks.localCheckpoint(false)
    }
    ranks.select("node", "rank")
  }

  /**
   * Harmonic centrality of the `sources` nodes over the undirected
   * graph, bounded at `maxHops`: `H(s) = Σ_{v ≠ s} 1/d(s,v)` summed
   * over reached nodes — the centrality that stays well-defined on
   * disconnected graphs (unreachable nodes contribute 0, not ∞).
   * Output: (src, n_reached, harmonic), harmonic rounded to 6.
   *
   * Scale shape: the [[bfsDistances]] frontier waves carry the source
   * id, so state is (src, node) pairs — bounded by
   * |sources|·reachable, which is why this is a SAMPLED-sources
   * centrality (estimating all-nodes centrality samples sources; the
   * all-pairs form is quadratic and intentionally absent). Each wave
   * is one join + one anti-join over slim rows, frontier/visited
   * checkpointed per wave, early exit on an empty frontier.
   */
  def harmonicCentrality(edges: DataFrame, aCol: String, bCol: String,
                         sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1: $maxHops")
    val sym = symmetric(canonical(edges, aCol, bCol)).localCheckpoint(false)
    val srcs = sources.toDF("node").distinct()
    var visited = srcs.select(col("node").as("src"), col("node"),
      lit(0L).as("dist")).localCheckpoint(false)
    var frontier = visited
    var fRows = frontier.count()
    var hop = 1
    var done = false
    while (hop <= maxHops && !done) {
      // small frontiers broadcast into the wave join (bcastIf): the
      // symmetrized edge frame is never shuffled per hop
      val next = bcastIf(frontier, fRows).join(sym, Seq("node"))
        .select(col("src"), col("nbr").as("node"), lit(hop.toLong).as("dist"))
        .distinct()
        .join(visited.select(col("src"), col("node")), Seq("src", "node"),
          "left_anti")
        .localCheckpoint(false)
      val n = next.count()
      if (n == 0) done = true
      else {
        visited = visited.union(next).localCheckpoint(false)
        frontier = next
        fRows = n
        hop += 1
      }
    }
    visited.where(col("dist") > 0)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_reached"),
        round(sum(lit(1.0) / col("dist").cast("double")), 6).as("harmonic"))
  }

  /**
   * Degree distribution with a log-log power-law fit: the histogram
   * (degree → node count) of the undirected graph plus a least-squares
   * slope/intercept over ln(degree) vs ln(count) — the one-look health
   * check that separates a scale-free co-occurrence graph from a
   * uniform-noise artifact (and flags projection hubs BEFORE a
   * quadratic operator meets them). Output one row:
   * (n_nodes, n_degrees, max_degree, slope, intercept), slope/
   * intercept rounded to 6.
   *
   * Scale: two partial-agg passes over slim rows (degrees, then the
   * histogram), one 1-row reduce for the fit — the [[TextOps.zipfFit]]
   * arithmetic on degree classes.
   */
  def degreeDistribution(edges: DataFrame, aCol: String,
                         bCol: String): DataFrame = {
    val deg = symmetric(canonical(edges, aCol, bCol))
      .groupBy("node").agg(count(lit(1)).as("__d"))
    val hist = deg.groupBy(col("__d")).agg(count(lit(1)).as("__c"))
    val pts = hist.select(log(col("__d").cast("double")).as("__x"),
      log(col("__c").cast("double")).as("__y"),
      col("__d"), col("__c"))
    pts.agg(sum(col("__c")).as("n_nodes"), count(lit(1)).as("n_degrees"),
        max(col("__d")).as("max_degree"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col("n_nodes"), col("n_degrees"), col("max_degree"),
        round((col("n_degrees") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("n_degrees") * col("__sxx") - col("__sx") * col("__sx")), 6)
          .as("slope"),
        round((col("__sy") - ((col("n_degrees") * col("__sxy") -
          col("__sx") * col("__sy")) /
          (col("n_degrees") * col("__sxx") - col("__sx") * col("__sx"))) *
          col("__sx")) / col("n_degrees"), 6).as("intercept"))
  }

  /**
   * Degree assortativity (Newman 2002): the Pearson correlation of
   * endpoint degrees over the symmetrized edge list — positive means
   * hubs attach to hubs (social-graph shape), negative means hub-and-
   * spoke (star/bipartite-projection shape), the one number that says
   * which quadratic valves will matter. Computed from the five sums
   * explicitly (no engine corr() variance-convention surprises).
   * Output one row: (n_pairs, assortativity), rounded to 6.
   */
  def degreeAssortativity(edges: DataFrame, aCol: String,
                          bCol: String): DataFrame = {
    val e = canonical(edges, aCol, bCol)
    val deg = symmetric(e).groupBy("node").agg(count(lit(1)).as("__d"))
    val pairs = symmetric(e)
      .join(deg.select(col("node"), col("__d").as("__dx")), Seq("node"))
      .join(deg.select(col("node").as("nbr"), col("__d").as("__dy")),
        Seq("nbr"))
      .select(col("__dx").cast("double").as("x"),
        col("__dy").cast("double").as("y"))
    pairs.agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
        sum(col("x") * col("y")).as("__sxy"),
        sum(col("x") * col("x")).as("__sxx"),
        sum(col("y") * col("y")).as("__syy"))
      .select(col("n_pairs"),
        round((col("n_pairs") * col("__sxy") - col("__sx") * col("__sy")) /
          sqrt((col("n_pairs") * col("__sxx") - col("__sx") * col("__sx")) *
            (col("n_pairs") * col("__syy") - col("__sy") * col("__sy"))), 6)
          .as("assortativity"))
  }

  /**
   * Deterministic random-walk corpus (the DeepWalk / node2vec
   * training-data generator, Perozzi et al. 2014): one walk of
   * `steps` hops per source over the undirected graph, where the
   * "random" neighbor choice is the argmin of a multiplicative hash
   * of (current node, step, neighbor) — pseudo-random spread, but
   * reproducible across runs, partitionings and engines (ties break
   * on the smaller neighbor). Walks CAN revisit nodes, as real random
   * walks do. Output: (start, step, node) rows, step 0 = the source —
   * exactly the sequence corpus a skip-gram embedding trainer
   * consumes.
   *
   * Scale: per hop, one join of the walks-sized frontier to the
   * symmetric edge list + a partial-aggregated argmin per walk —
   * 24 B rows throughout; `steps` is small by contract (walk length,
   * not diameter). The frontier checkpoints per hop so plan depth
   * stays flat. Hub fan-in is bounded by the argmin's map-side
   * partial aggregation (no neighbor list ever materializes).
   */
  def deterministicWalks(edges: DataFrame, aCol: String, bCol: String,
                         sources: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1, s"steps must be >= 1: $steps")
    val sym = symmetric(canonical(edges, aCol, bCol)).localCheckpoint(false)
    var cur = sources.toDF("start").distinct()
      .select(col("start"), col("start").as("node"))
      .localCheckpoint(false)
    // one row per walk at every step — count once, broadcast each hop
    // under the bound so sym never shuffles per step
    val nWalks = cur.count()
    var out = cur.withColumn("step", lit(0L))
    for (s <- 1 to steps) {
      val h = Hashing.mulHash(col("node") * lit(1000003L) +
        lit(s * 31L) + col("nbr"))
      cur = bcastIf(cur, nWalks).join(sym, Seq("node"))
        .groupBy(col("start"))
        .agg(min(struct(h.as("h"), col("nbr").as("n"))).as("__m"))
        .select(col("start"), col("__m.n").as("node"))
        .localCheckpoint(false)
      out = out.union(cur.withColumn("step", lit(s.toLong)))
    }
    out.select(col("start"), col("step"), col("node"))
  }

  /**
   * Graph card: the p20-datasetCard analog for a DIRECTED edge list —
   * size, density, degree shape and reciprocity as (metric, value)
   * rows, the pre-flight read before choosing graph operators (max
   * degree → quadratic-valve settings; reciprocity → whether directed
   * analysis differs from undirected at all). Self-loops are dropped
   * and edges deduped first; density = E/(V·(V−1)); reciprocity =
   * fraction of edges whose reverse also exists.
   *
   * Scale: one distinct over slim pairs, degree partial-aggs, a
   * self-semi-join for reciprocity, and 1-row reduces — metric rows
   * explode from the 1-row frame.
   */
  def graphCard(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct().localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .agg(count(lit(1)).as("__v"))
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("__d"))
      .agg(max(col("__d")).as("__maxout"), avg(col("__d")).as("__avgout"))
    val recip = e.join(
        e.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      .agg(count(lit(1)).as("__r"))
    val edgesN = e.agg(count(lit(1)).as("__e"))
    val one = edgesN.crossJoin(nodes).crossJoin(outDeg).crossJoin(recip)
    val metrics: Seq[(String, Column)] = Seq(
      "n_nodes" -> col("__v").cast("double"),
      "n_edges" -> col("__e").cast("double"),
      // guarded ratios: density/reciprocity are undefined (null) on
      // graphs with < 2 nodes / no edges — an unguarded divide is an
      // ANSI-mode runtime error on the empty graph
      "density" -> when(col("__v") > 1L, round(col("__e").cast("double") /
        (col("__v").cast("double") * (col("__v") - 1L)), 6)),
      "avg_out_degree" -> round(col("__avgout"), 6),
      "max_out_degree" -> col("__maxout").cast("double"),
      "reciprocity" -> when(col("__e") > 0L,
        round(col("__r").cast("double") / col("__e"), 6)))
    one.select(explode(array(metrics.map { case (n, c) =>
        struct(lit(n).as("metric"), c.as("value")) }: _*)).as("__m"))
      .select("__m.*")
  }

  /**
   * Strongly connected components by bounded-doubling reachability:
   * `rounds` rounds of transitive-closure doubling (R ← R ∪ R⋈R)
   * give every path of ≤ 2^rounds hops, then SCC(v) = min(v, min{w :
   * v⇝w ∧ w⇝v}) — EXACT whenever the graph's directed diameter is
   * ≤ 2^rounds, which the caller asserts by choosing `rounds`
   * (3 ⇒ 8 hops). Deterministic: closure and min-labeling are
   * set-algebraic, no tie-breaking anywhere.
   *
   * Scale: closure doubling is the O(log d) path-joins trade — each
   * round one self-join + distinct on slim (src, dst) pairs, lazily
   * checkpointed. The closure can be |V|² on dense mutual-reach
   * graphs: this operator targets CONTRACTED graphs (entity-level
   * flow graphs, dependency graphs), not raw billion-node webs — run
   * [[Dedup.connectedComponents]] first when direction doesn't
   * matter, or contract by community before asking for SCCs. The
   * contract is ENFORCED, not just documented: after every doubling
   * round the closure's row count is checked against
   * `maxClosureRows` and a [[GraphContractViolation]] names the bound
   * and the round — failing fast in O(rounds) jobs instead of
   * silently materializing a quadratic frame (the count rides the
   * checkpoint the round materializes anyway, the [[kTrussExact]]
   * pattern).
   */
  def sccBounded(edges: DataFrame, srcCol: String, dstCol: String,
                 rounds: Int = 3,
                 maxClosureRows: Long = 100000000L): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    require(maxClosureRows >= 1, "maxClosureRows must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct().localCheckpoint(false)
    var r = e
    for (round <- 1 to rounds) {
      r = r.union(
          r.as("a").join(r.as("b"), col("a.dst") === col("b.src"))
            .select(col("a.src").as("src"), col("b.dst").as("dst")))
        .distinct().localCheckpoint(false)
      val n = r.count()
      if (n > maxClosureRows)
        throw new GraphContractViolation(
          s"sccBounded: reachability closure hit $n rows after doubling " +
          s"round $round (bound maxClosureRows=$maxClosureRows). The input " +
          "is too well-connected for closure doubling — contract the graph " +
          "first (community/CC contraction) or raise maxClosureRows " +
          "deliberately.")
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val mutual = r.join(
      r.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_semi")
    val minPartner = mutual.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("__m"))
    nodes.join(minPartner, Seq("node"), "left")
      .select(col("node"),
        least(col("node"), coalesce(col("__m"), col("node")))
          .as("component"))
  }

  /**
   * Sampled-source betweenness centrality (Brandes 2001, "A faster
   * algorithm for betweenness centrality"; sampling per Brandes &
   * Pich 2007): exact single-source dependency accumulation batched
   * over a SOURCE SAMPLE — the same deliberate contract as
   * [[harmonicCentrality]]: all-pairs betweenness is O(V·E) and
   * intentionally absent; estimate by sampling sources and scaling.
   * Output `bc` sums the raw Brandes dependencies δ_s(v) over the
   * sampled sources (no pair-direction halving — each undirected pair
   * contributes from both endpoints when both are sampled, the
   * classic convention; divide by 2 outside for the textbook number).
   *
   * Forward phase: BFS waves keyed (source, node) carrying the
   * shortest-path COUNT σ (a depth-(d+1) node's σ is the sum of its
   * depth-d neighbors' σ). Backward phase: walks the recorded depth
   * frames deepest-first, δ(v) = Σ_{w: dist(w)=dist(v)+1}
   * (σ_v/σ_w)·(1+δ_w) — every step a join + partial-aggregated
   * groupBy over slim (source, node) rows; per-depth frames are
   * lazily checkpointed so the 2·depth-round lineage stays flat.
   * `maxHops` bounds the wavefront (the BFS-family skew valve);
   * state is |sources|·reachable by construction.
   */
  def betweennessSampled(edges: DataFrame, aCol: String, bCol: String,
                         sources: DataFrame, maxHops: Int = 6): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val sym = symmetric(canonical(edges, aCol, bCol)).localCheckpoint(false)
    val src = sources.toDF("s").distinct()
    val lvl0 = src.select(col("s"), col("s").as("node"),
      lit(1.0).as("sigma")).localCheckpoint(false)
    var levels = Vector(lvl0)
    var levelRows = Vector(lvl0.count())
    var seen = lvl0.select("s", "node").localCheckpoint(false)
    var frontierNonEmpty = levelRows.last > 0
    var d = 0
    while (frontierNonEmpty && d < maxHops) {
      // small wave frames broadcast into the sym join (bcastIf): the
      // symmetrized edge frame never shuffles per wave; the full count
      // replaces the limit-1 probe and feeds the hint bound
      val nxt = bcastIf(levels.last, levelRows.last).join(sym, Seq("node"))
        .select(col("s"), col("nbr").as("node"), col("sigma"))
        .join(seen, Seq("s", "node"), "left_anti")
        .groupBy("s", "node").agg(sum("sigma").as("sigma"))
        .localCheckpoint(false)
      val n = nxt.count()
      frontierNonEmpty = n > 0
      if (frontierNonEmpty) {
        levels = levels :+ nxt
        levelRows = levelRows :+ n
        seen = seen.union(nxt.select("s", "node")).localCheckpoint(false)
        d += 1
      }
    }
    // backward accumulation, deepest level has delta = 0
    var acc: DataFrame = null
    var below = levels.last.withColumn("delta", lit(0.0))
    var belowRows = levelRows.last
    for (i <- levels.length - 2 to 1 by -1) {
      val contrib = bcastIf(levels(i), levelRows(i)).join(sym, Seq("node"))
        .select(col("s"), col("node"), col("sigma"), col("nbr"))
        .join(bcastIf(below.select(col("s"), col("node").as("nbr"),
          col("sigma").as("__sw"), col("delta").as("__dw")), belowRows),
          Seq("s", "nbr"))
        .groupBy(col("s"), col("node"), col("sigma"))
        .agg(sum(col("sigma") / col("__sw") * (lit(1.0) + col("__dw")))
          .as("delta"))
        .select(col("s"), col("node"), col("sigma"), col("delta"))
        .localCheckpoint(false)
      belowRows = levelRows(i)
      // nodes at this depth with no deeper successor keep delta 0
      below = levels(i).join(bcastIf(contrib.select(col("s"), col("node"),
          col("delta")), levelRows(i)), Seq("s", "node"), "left")
        .select(col("s"), col("node"), col("sigma"),
          coalesce(col("delta"), lit(0.0)).as("delta"))
        .localCheckpoint(false)
      acc = if (acc == null) below.select("node", "delta")
            else acc.union(below.select("node", "delta"))
    }
    val allNodes = sym.select(col("node")).distinct()
    val bc = if (acc == null) allNodes.withColumn("bc", lit(0.0))
      else allNodes.join(acc.groupBy("node").agg(sum("delta").as("bc")),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("bc"), lit(0.0)).as("bc"))
    bc
  }

  /**
   * HITS hubs-and-authorities (Kleinberg 1999, "Authoritative sources
   * in a hyperlinked environment"), fixed iteration count, L1 (sum)
   * normalization after every half-step so scores are comparable
   * across engines without an eigenvector-scale ambiguity:
   *
   *   auth_k(v) = Σ_{(u,v)∈E} hub_{k-1}(u)   then auth_k /= Σ auth_k
   *   hub_k(u)  = Σ_{(u,v)∈E} auth_k(v)      then hub_k  /= Σ hub_k
   *
   * hub_0 ≡ 1. Nodes with no in-edges keep authority 0; nodes with no
   * out-edges keep hub 0 (on a bipartite graph the two scores live on
   * opposite sides — that is the expected shape, not a bug).
   *
   * 100 TB posture: mirrors [[pageRank]] — edges dedupe once to slim
   * (src, dst) rows and checkpoint; each half-step is one join of the
   * 16 B/node score state to the edge list plus one groupBy shuffle;
   * the L1 total is a 1-row aggregate broadcast back in (the same
   * model-sized-scalar contract as the centroid collects). Score
   * frames checkpoint every `checkpointEvery` rounds to bound plan
   * depth. No adjacency lists, no windows.
   */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iterations: Int = 3, checkpointEvery: Int = 4): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    // node-sized score frames broadcast under the bound (bcastIf): the
    // edge frame and the node table never re-shuffle per half-step
    val nNodes = nodes.count()
    var hub = nodes.withColumn("hub", lit(1.0))
    var auth = nodes.withColumn("auth", lit(0.0))
    for (k <- 1 to iterations) {
      val aRaw = e.join(bcastIf(hub, nNodes), e("src") === hub("node"))
        .groupBy(e("dst").as("node")).agg(sum("hub").as("__a"))
      val aTot = aRaw.agg(sum("__a").as("__t"))
      auth = nodes.join(bcastIf(aRaw, nNodes), Seq("node"), "left")
        .crossJoin(broadcast(aTot))
        .select(col("node"),
          (coalesce(col("__a"), lit(0.0)) / col("__t")).as("auth"))
      val hRaw = e.join(bcastIf(auth, nNodes), e("dst") === auth("node"))
        .groupBy(e("src").as("node")).agg(sum("auth").as("__h"))
      val hTot = hRaw.agg(sum("__h").as("__t"))
      hub = nodes.join(bcastIf(hRaw, nNodes), Seq("node"), "left")
        .crossJoin(broadcast(hTot))
        .select(col("node"),
          (coalesce(col("__h"), lit(0.0)) / col("__t")).as("hub"))
      if (k % checkpointEvery == 0 && k < iterations) {
        auth = auth.localCheckpoint(false)
        hub = hub.localCheckpoint(false)
      }
    }
    // final assembly: two node-sized frames — broadcast one under the
    // bound so the LAST join of the query is hash, not sort-merge
    // (optimization round 17; VERDICT-r16 #8)
    auth.join(bcastIf(hub, nNodes), Seq("node"))
  }

  /**
   * Recommended quadratic-valve settings read off a [[graphCard]] —
   * so 100×-scale users size `maxDegree` / `maxPivotDegree` /
   * `maxClosureRows` from measured graph shape instead of hand-tuning:
   *
   *  - `maxDegree` (for [[triangleCount]] / [[kTruss]] /
   *    `clusteringCoefficient`) and `maxPivotDegree` (for
   *    `bipartiteProject`): `ceil(sqrt(2·E))` whenever the observed
   *    max degree exceeds it, else `None` (no hub to valve). Rationale:
   *    a node of degree d contributes d² two-paths, so capping at
   *    ~sqrt(2E) bounds any single node's pair fan-out by the total
   *    edge count — no "last reducer" (Suri & Vassilvitskii 2011).
   *  - `sccMaxClosureRows`: `max(64·E, 16·V)` — a closure that honest
   *    contracted-graph inputs stay well under (diameter-bounded
   *    reach ≈ E·diameter) but a dense mutual-reach graph blows
   *    through in the first doublings, tripping [[sccBounded]]'s
   *    guard early instead of at |V|².
   *
   * The card is model-sized (6 metric rows) so the read is a
   * documented model-sized collect.
   */
  def valveAdvisory(card: DataFrame): ValveAdvisory = {
    // null-safe read: an empty graph's card carries null max/avg rows
    val m = card.collect().flatMap { r =>
      Option(r.get(r.fieldIndex("value"))).map(v =>
        r.getString(r.fieldIndex("metric")) ->
          v.asInstanceOf[Number].doubleValue())
    }.toMap
    val edges = m.getOrElse("n_edges", 0.0)
    val nodes = m.getOrElse("n_nodes", 0.0)
    val maxDeg = m.getOrElse("max_out_degree", 0.0)
    val cap = math.ceil(math.sqrt(2.0 * edges)).toLong
    val hubCap =
      if (edges > 0 && maxDeg > cap) Some(math.max(cap, 1L).toInt) else None
    ValveAdvisory(
      maxDegree = hubCap,
      maxPivotDegree = hubCap,
      sccMaxClosureRows = math.max(64L * edges.toLong,
        16L * nodes.toLong).max(1L),
      observedMaxDegree = maxDeg.toLong,
      nNodes = nodes.toLong,
      nEdges = edges.toLong)
  }

  /**
   * Weighted single-source (or multi-source) shortest paths (round
   * 11): distributed frontier RELAXATION — Bellman-Ford's shape, the
   * standard Spark lowering (a Dijkstra priority queue has no
   * distributed form). Each round joins only the rows IMPROVED last
   * round against the edge list, min-aggregates candidate distances
   * per destination, and keeps the ones that beat the settled table —
   * so round work tracks the improvement wavefront, not the node
   * count, and the loop stops the first round nothing improves.
   * Output: one (node, dist) row per reachable node, sources at 0.0.
   *
   * Weights must be NON-NEGATIVE (checked up front, one limit-1 probe
   * on the edge scan): relaxation still converges with negative
   * edges, but a negative CYCLE would improve forever — the typed
   * error beats a silent maxIter timeout. Rounds are bounded by
   * `maxIter` (weighted improvement can revisit a node up to V−1
   * times in the worst case; the guard fails typed, never loops).
   *
   * Scale shape: slim (node, dist) frames hash-joined against the
   * once-checkpointed edge list; per-round lineage cut + one count
   * probe; the settled table is node-bounded. The same posture as
   * the unweighted reach BFS, plus the min-combine per round.
   */
  def weightedSssp(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, sources: DataFrame,
      maxIter: Int = 100): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    require(maxIter >= 1, s"maxIter must be >= 1: $maxIter")
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"),
        col(weightCol).cast(DoubleType).as("__w"))
      .where(col("__s").isNotNull && col("__d").isNotNull &&
        col("__w").isNotNull)
      .localCheckpoint(false)
    if (e.where(col("__w") < 0).limit(1).count() > 0)
      throw new GraphContractViolation(
        "weightedSssp: negative edge weight — relaxation requires " +
        "w >= 0 (a negative cycle would improve forever)")
    var dist = sources
      .select(col(sources.columns.head).as("__n")).distinct()
      .where(col("__n").isNotNull)
      .withColumn("__dist", lit(0.0))
      .localCheckpoint(false)
    var frontier = dist
    // full counts replace the limit-1 probes: the number doubles as
    // the broadcast-hint bound (bcastIf) so the static edge frame is
    // never shuffled per relaxation round; distRows is a monotone
    // upper bound on the settled table (safe for the hint — it can
    // only miss a broadcast, never over-broadcast)
    var fRows = frontier.count()
    var distRows = fRows
    var go = fRows > 0
    var i = 0
    while (go) {
      i += 1
      if (i > maxIter)
        throw new GraphContractViolation(
          s"weightedSssp: relaxation did not converge in $maxIter " +
          "rounds — raise maxIter (dense weighted improvement can " +
          "take up to V-1 rounds)")
      val cand = bcastIf(frontier, fRows).join(e, col("__n") === col("__s"))
        .select(col("__d").as("__n"),
          (col("__dist") + col("__w")).as("__cd"))
        .groupBy(col("__n")).agg(min(col("__cd")).as("__cd"))
      val improved = cand
        .join(bcastIf(dist.select(col("__n"), col("__dist").as("__old")),
          distRows), Seq("__n"), "left")
        .where(col("__old").isNull || col("__cd") < col("__old"))
        .select(col("__n"), col("__cd").as("__dist"))
        .localCheckpoint(false)
      val n = improved.count()
      go = n > 0
      if (go) {
        dist = dist
          .join(bcastIf(improved.select(col("__n").as("__ni")), n),
            col("__n") === col("__ni"), "left_anti")
          .unionByName(improved)
          .localCheckpoint(false)
        frontier = improved
        fRows = n
        distRows += n
      }
    }
    dist.select(col("__n").as("node"), col("__dist").as("dist"))
  }

  /**
   * Weighted shortest-path TREE (round 11): [[weightedSssp]] carrying
   * each settled node's PREDECESSOR on its cheapest route — the
   * standard routing deliverable (follow `pred` links back to a
   * source to reconstruct the path; sources carry a null pred).
   * RETURN CONTRACT: `pred` keeps the source id column's NATIVE type,
   * and equal-cost routes tie-break on the SMALLEST predecessor id in
   * that type's order (numeric ids compare numerically — 9 < 10; the
   * same struct-min trick as MERGE's winner rule), so the tree is
   * deterministic and a SQL oracle reproduces it with a plain min().
   *
   * Same relaxation shape and guards as [[weightedSssp]]; the only
   * addition is the pred member riding the per-round min-combine
   * struct. Output: (node, dist, pred).
   */
  def weightedSsspTree(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, sources: DataFrame,
      maxIter: Int = 100): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, StringType}
    require(maxIter >= 1, s"maxIter must be >= 1: $maxIter")
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"),
        col(weightCol).cast(DoubleType).as("__w"))
      .where(col("__s").isNotNull && col("__d").isNotNull &&
        col("__w").isNotNull)
      .localCheckpoint(false)
    if (e.where(col("__w") < 0).limit(1).count() > 0)
      throw new GraphContractViolation(
        "weightedSsspTree: negative edge weight — relaxation requires " +
        "w >= 0 (a negative cycle would improve forever)")
    val predType = e.schema("__s").dataType
    var dist = sources
      .select(col(sources.columns.head).as("__n")).distinct()
      .where(col("__n").isNotNull)
      .withColumn("__dist", lit(0.0))
      .withColumn("__pred", lit(null).cast(predType))
      .localCheckpoint(false)
    var frontier = dist
    // same count-driven broadcast hints as weightedSssp (see there)
    var fRows = frontier.count()
    var distRows = fRows
    var go = fRows > 0
    var i = 0
    while (go) {
      i += 1
      if (i > maxIter)
        throw new GraphContractViolation(
          s"weightedSsspTree: relaxation did not converge in $maxIter " +
          "rounds — raise maxIter (dense weighted improvement can " +
          "take up to V-1 rounds)")
      val cand = bcastIf(frontier, fRows).join(e, col("__n") === col("__s"))
        .select(col("__d").as("__n"),
          struct((col("__dist") + col("__w")).as("__cd"),
            col("__s").as("__cp")).as("__c"))
        .groupBy(col("__n")).agg(min(col("__c")).as("__c"))
        .select(col("__n"), col("__c.__cd").as("__cd"),
          col("__c.__cp").as("__cp"))
      val improved = cand
        .join(bcastIf(dist.select(col("__n"), col("__dist").as("__old"),
            col("__pred").as("__oldp")), distRows), Seq("__n"), "left")
        .where(col("__old").isNull || col("__cd") < col("__old") ||
          (col("__cd") === col("__old") && col("__oldp").isNotNull &&
            col("__cp") < col("__oldp")))
        .select(col("__n"), col("__cd").as("__dist"),
          col("__cp").as("__pred"))
        .localCheckpoint(false)
      val n = improved.count()
      go = n > 0
      if (go) {
        dist = dist
          .join(bcastIf(improved.select(col("__n").as("__ni")), n),
            col("__n") === col("__ni"), "left_anti")
          .unionByName(improved)
          .localCheckpoint(false)
        frontier = improved
        fRows = n
        distRows += n
      }
    }
    dist.select(col("__n").as("node"), col("__dist").as("dist"),
      col("__pred").as("pred"))
  }

  /**
   * Route expansion over a [[weightedSsspTree]] (round 11): one row
   * per HOP of every node's cheapest route — (node, pos, hop), pos 0
   * at the source, the last pos at the node itself. Iterative
   * pred-following: each round joins the still-walking heads against
   * the tree's (node → pred) map, so round work is the number of
   * unfinished routes and the loop ends when every head reaches a
   * source (null pred). Output rows = Σ route lengths — bounded by
   * nodes × the tree's depth; `maxIter` guards a malformed tree
   * (a pred cycle cannot arise from [[weightedSsspTree]] itself, but
   * a hand-edited frame could) with a typed error.
   *
   * Scale: the tree is node-sized (broadcast-able); each round is one
   * hash join of the shrinking head set against it plus a union onto
   * the accumulated rows, lineage-cut per round.
   */
  def ssspRoutes(tree: DataFrame, maxIter: Int = 100): DataFrame = {
    import org.apache.spark.sql.types.StringType
    require(maxIter >= 1, s"maxIter must be >= 1: $maxIter")
    val t = tree.select(col("node").cast(StringType).as("__tn"),
        col("pred").cast(StringType).as("__tp"))
      .localCheckpoint(false)
    // walking state: (target, head, back) — back = hops walked back
    // from the target so far; finished rows (head's pred null) retire
    var acc = tree.select(col("node").cast(StringType).as("__target"),
        col("node").cast(StringType).as("__hop"), lit(0).as("__back"))
      .localCheckpoint(false)
    var frontier = acc
    // the node-sized pred map broadcasts under the bound (bcastIf):
    // neither the heads nor the map shuffle per round
    val tRows = t.count()
    var i = 0
    var go = frontier.limit(1).count() > 0
    while (go) {
      i += 1
      if (i > maxIter)
        throw new GraphContractViolation(
          s"ssspRoutes: route expansion did not terminate in $maxIter " +
          "rounds — the tree's pred links do not reach a source " +
          "(malformed or cyclic tree)")
      val next = frontier
        .join(bcastIf(t, tRows), frontier("__hop") === t("__tn"))
        .where(col("__tp").isNotNull)
        .select(col("__target"), col("__tp").as("__hop"),
          (col("__back") + 1).as("__back"))
        .localCheckpoint(false)
      go = next.limit(1).count() > 0
      if (go) {
        acc = acc.unionByName(next).localCheckpoint(false)
        frontier = next
      }
    }
    // pos = route length − back (source at 0, target last)
    val lens = acc.groupBy(col("__target"))
      .agg(max(col("__back")).as("__len"))
    acc.join(lens, Seq("__target"))
      .select(col("__target").as("node"),
        (col("__len") - col("__back")).as("pos"),
        col("__hop").as("hop"))
  }
}

/** Recommended caps for the quadratic-prone graph operators, derived
  * from measured graph shape by [[GraphOps.valveAdvisory]]. `None`
  * means the graph has no hub that needs valving. */
final case class ValveAdvisory(
    maxDegree: Option[Int],
    maxPivotDegree: Option[Int],
    sccMaxClosureRows: Long,
    observedMaxDegree: Long,
    nNodes: Long,
    nEdges: Long)

/** Thrown when a graph operator's documented scale contract is
  * violated at runtime (e.g. [[GraphOps.sccBounded]]'s reachability
  * closure exceeding its row bound) — the fail-fast alternative to
  * silently materializing a quadratic frame. */
class GraphContractViolation(msg: String) extends RuntimeException(msg)
