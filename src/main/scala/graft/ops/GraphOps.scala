package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
               checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    // lazy checkpoints: nodes and (src, dst, deg) are static across
    // iterations — materialize them once (the count() job below) so no
    // iteration re-reads or re-dedupes the raw edge input
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    val n = nodes.count() // one job; the node count parameterizes ranks
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val eDeg = e.join(outDeg, "src").localCheckpoint(false)
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (k <- 1 to iterations) {
      val contribs = eDeg.join(ranks, eDeg("src") === ranks("node"))
        .select(eDeg("dst").as("node"),
          (ranks("rank") / eDeg("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
      if (k % checkpointEvery == 0 && k < iterations)
        ranks = ranks.localCheckpoint(false)
    }
    ranks
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
   * Edges canonicalize to (lo, hi) with lo < hi and dedupe; the count
   * is the oriented two-path closed by a third edge:
   * (a,b) ⋈ (b,c) ⋈ (a,c) with a<b<c — each triangle counted exactly
   * once, and the closing check is a semi join (no row multiplication).
   * The orientation here is value-ordered; `maxDegree` is the skew
   * valve (Suri & Vassilvitskii's "last reducer" is a hub node whose
   * two-path fan-out is quadratic — cap it or pre-order by degree).
   *
   * `maxDegree` drops nodes above the bound BEFORE pairing (both
   * endpoints), capping the quadratic corner the way the dedup
   * operators cap blocks; pass None to keep the full graph.
   */
  def triangleCount(edges: DataFrame, aCol: String, bCol: String,
                    maxDegree: Option[Int] = None): DataFrame = {
    val raw = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    val canon = raw.select(
      least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
      .distinct()
    val e = maxDegree match {
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
    val ab = e.select(col("lo").as("a"), col("hi").as("b"))
    val bc = e.select(col("lo").as("b2"), col("hi").as("c"))
    val ac = e.select(col("lo").as("a3"), col("hi").as("c3"))
    ab.join(bc, col("b") === col("b2"))
      .join(ac, col("a") === col("a3") && col("c") === col("c3"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }
}
