package graft.cypher

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import ast._

/**
 * Unbounded variable-length `[*]` / `[*1..]` → REACHABLE-PAIR lowering
 * (extension; the reference rejects all var-length,
 * reference: CypherVisitor.cs:2035-2039).
 *
 * Semantics — deliberately the recursive-CTE `UNION` (distinct)
 * contract, the only shape that scales: the match set contains ONE row
 * per distinct (source, destination) pair connected by a path of
 * length ≥ 1, not one row per path (unbounded per-path enumeration is
 * factorially large on cyclic graphs; bounded `[*lo..hi]` keeps the
 * per-path branch-union semantics). The pair set is computed by an
 * iterate-to-fixpoint frontier BFS — the [[graft.ops.GraphOps]]
 * posture: slim (src, dst) rows only, per-round lineage cuts, the
 * frontier anti-joins the seen set so every round shrinks to genuinely
 * new pairs and the loop terminates in ≤ diameter rounds.
 *
 * The lowering SPLICES the reach frame back into the ordinary join
 * DAG as a synthetic one-hop edge (`__REACH_<n>_<verb>` over table
 * `__reach_<n>`), so everything around it — other rels, WHERE,
 * OPTIONAL MATCH, aggregation, projections — compiles unchanged.
 *
 * Contract (typed rejections otherwise):
 *  - explicit single verb whose schema edge is SELF-TYPE
 *    (fromLabel == toLabel) — multi-hop chains of one verb need one id
 *    namespace; heterogeneous chains must be written hop by hop;
 *  - directed pattern (`->` / `<-`) — an undirected self-type hop is
 *    ambiguous (the analyzer's single-hop rule, LogicalPlan.cs:603-612);
 *  - no per-path observation: named paths (`length(p)`),
 *    shortestPath/allShortestPaths keep the BOUNDED contract (their
 *    results need per-path lengths, which reachable pairs erase);
 *  - lower bound 1 (parser-enforced): "exists a path of length ≥ k" is
 *    not min-distance ≥ k on cyclic graphs, so [*k..] has no honest
 *    reachability lowering.
 */
private[cypher] object Reach {

  /** Fixpoint-round guard: rounds = graph diameter, so hitting this
    * means a pathological chain, not a real query. */
  val MaxRounds = 1024

  private def isUnbounded(r: RelPat): Boolean =
    r.varLength.exists(_._2 == Parser.Unbounded)

  def hasUnbounded(matches: Seq[MatchClause]): Boolean =
    matches.exists(_.parts.exists(_.rels.exists(isUnbounded)))

  /** Rewrites every unbounded var-length rel to a synthetic reach edge;
    * returns the rewritten clauses plus a catalog that can serve the
    * synthetic tables. No-op (same instances) when nothing is unbounded. */
  def rewrite(matches: Seq[MatchClause], catalog: GraphCatalog)
      : (Seq[MatchClause], GraphCatalog) = {
    if (!hasUnbounded(matches)) return (matches, catalog)
    val extra = Vector.newBuilder[(EdgeDef, DataFrame)]
    var n = 0
    val out = matches.map { m =>
      m.copy(parts = m.parts.map { pp =>
        if (!pp.rels.exists(isUnbounded)) pp
        else {
          if (pp.pathVar.isDefined)
            throw new CypherNotSupportedException(
              "length(path) over an unbounded variable-length " +
              "relationship (reachable pairs erase path lengths) — " +
              "bound the range [*lo..hi]")
          if (pp.shortest || pp.allShortest)
            throw new CypherNotSupportedException(
              "shortestPath()/allShortestPaths() over an unbounded " +
              "variable-length — bound the range [*lo..hi]")
          val rels2 = pp.rels.map { r =>
            if (!isUnbounded(r)) r
            else {
              if (r.alts.nonEmpty)
                throw new CypherNotSupportedException(
                  "relationship type alternation with an unbounded " +
                  "variable-length — chains would mix property-less " +
                  "namespaces; bound the range or pick one type")
              val verb = r.verb.getOrElse(
                throw new CypherNotSupportedException(
                  "unbounded variable-length requires an explicit " +
                  "relationship type, e.g. [:NEXT*]"))
              if (r.dir == Direction.Both)
                throw new CypherNotSupportedException(
                  "undirected unbounded variable-length — an undirected " +
                  "self-type hop is ambiguous; direct the pattern")
              val selfDefs = catalog.graph.edgesByVerb(verb)
                .filter(e => e.fromLabel == e.toLabel)
              if (selfDefs.isEmpty)
                throw new CypherBindingException(
                  s"unbounded variable-length over '$verb': no self-type " +
                  "edge (fromLabel == toLabel) in the schema — multi-hop " +
                  "chains of one verb need the same label on both ends; " +
                  "bound the range [*lo..hi] for heterogeneous chains")
              if (selfDefs.size > 1)
                throw new CypherBindingException(
                  s"unbounded variable-length over '$verb' is ambiguous: " +
                  s"${selfDefs.map(_.fromLabel).sorted.mkString(", ")} all " +
                  "carry a self-type edge of that verb")
              val e = selfDefs.head
              val reach =
                reachablePairs(catalog.edgeDf(e), e.srcIdColumn, e.sinkIdColumn)
              val synthVerb = s"__REACH_${n}_$verb"
              val synth = EdgeDef(synthVerb, e.fromLabel, e.toLabel,
                "__src", "__dst", Seq.empty, s"__reach_$n")
              extra += ((synth, reach))
              n += 1
              RelPat(None, Some(synthVerb), r.dir)
            }
          }
          pp.copy(rels = rels2)
        }
      })
    }
    (out, catalog.withExtraEdges(extra.result()))
  }

  /**
   * All (src, dst) pairs connected by a directed path of length ≥ 1.
   *
   * Frontier BFS, not closure doubling: each round joins only the NEW
   * pairs of the previous round to the base edges (slim keys), dedupes,
   * and anti-joins the accumulated seen set — so round work is bounded
   * by the undiscovered pair count and the loop stops the first round
   * nothing new appears (≤ diameter rounds, each one job via the lazy
   * localCheckpoint the emptiness probe materializes). At cluster scale
   * every frame here is (src, dst) pairs — 16 B rows hash-partitioned
   * on the join key; the output is closure-sized, which the CALLER
   * constrains by joining endpoints down (the synthetic edge splices
   * into the normal join DAG, so endpoint filters semi-join the reach
   * frame before anything wide happens).
   */
  private[cypher] def reachablePairs(edges: DataFrame, srcCol: String,
                                     dstCol: String): DataFrame = {
    // self-loop edges stay: (a)→(a) is a legitimate length-1 path, and
    // cycle pairs (a, a) via longer loops arise from the BFS naturally
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
      .distinct().localCheckpoint(false)
    var seen = e
    var frontier = e
    var rounds = 0
    var go = frontier.limit(1).count() > 0
    while (go) {
      rounds += 1
      if (rounds > MaxRounds)
        throw new CypherBindingException(
          s"unbounded variable-length: reachability did not converge in " +
          s"$MaxRounds rounds — the edge set's diameter exceeds the guard")
      val next = frontier
        .join(e.select(col("__src").as("__mid"), col("__dst").as("__d2")),
          col("__dst") === col("__mid"))
        .select(col("__src"), col("__d2").as("__dst")).distinct()
        .join(seen, Seq("__src", "__dst"), "left_anti")
        .localCheckpoint(false)
      go = next.limit(1).count() > 0
      if (go) {
        seen = seen.union(next).localCheckpoint(false)
        frontier = next
      }
    }
    seen
  }
}
