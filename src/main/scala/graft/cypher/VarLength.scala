package graft.cypher

import java.util.concurrent.atomic.AtomicLong

import ast._

/**
 * AST-level unrolling of bounded variable-length relationships
 * `[*lo..hi]` — a flagged EXTENSION (the reference rejects var-length,
 * reference: CypherVisitor.cs:2035-2039 and README.md:61).
 *
 * A var-length relationship between two pattern nodes expands into one
 * branch per length L ∈ [lo, hi]: the relationship is replaced by L
 * single-hop copies (same verb, same direction) threaded through L−1
 * fresh anonymous interior nodes. Each branch is then an ordinary
 * fixed-length pattern: the analyzer's label-inference fixpoint types
 * the interior nodes, its same-edge-type pairing applies Cypher's
 * per-path relationship uniqueness, and the compiler's join builder /
 * scan-merge work unchanged. The compiler UNION ALLs the branches
 * (paths of different lengths are distinct matches).
 *
 * Zero-length branches (round 11, `[*0..k]`): the L = 0 branch is the
 * identity — both endpoints bind the SAME node. It unrolls to a
 * single hop over a synthetic IDENTITY edge (one (id, id) row per
 * node of the endpoint label — the [*0..] reflexive-closure trick
 * composed with the bounded union), so the analyzer and join builder
 * see an ordinary fixed pattern and both endpoint variables stay
 * bound. The marker verb is unique per occurrence (never paired by
 * the analyzer's same-verb uniqueness rule — a zero-hop has no
 * relationship entity) and counts as ZERO hops for `length(p)` and
 * the shortestPath reduction. The endpoint label comes from either
 * endpoint's explicit label, else the verb's sole self-type edge
 * definition; a conflicting explicit label pair skips the branch
 * (one node cannot carry both).
 *
 * The fan-out is the product over all var-length rels of their range
 * widths, capped at [[VarLength.MaxBranches]]; the parser separately
 * caps each hi at [[Parser.MaxVarHops]].
 */
object VarLength {

  /** Upper bound on the branch product — 64 covers e.g. three
   *  independent [*1..4] rels; beyond that the plan is a fan-out
   *  mistake, not a query. */
  val MaxBranches = 64

  private val ZeroHopPrefix = "__ZERO_"
  private val zeroCounter = new AtomicLong(0)

  /** Is this verb a zero-hop identity marker? (Counts as 0 hops in
   *  path lengths and the shortestPath reduction.) */
  def isZeroHop(verb: String): Boolean = verb.startsWith(ZeroHopPrefix)

  /** Relationship count of a pattern part EXCLUDING zero-hop identity
   *  markers — the `length(p)` contract. */
  def hopCount(pp: PatternPart): Int =
    pp.rels.count(r => !r.verb.exists(isZeroHop))

  /** True when any rel needs branch expansion: bounded var-length
   *  `[*lo..hi]` or a type alternation `[:A|B]`. */
  def hasVarLength(matches: Seq[MatchClause]): Boolean =
    matches.exists(_.parts.exists(_.rels.exists(r =>
      r.varLength.isDefined || r.alts.nonEmpty)))

  /** All unrollings of one query part's MATCH clauses (cartesian across
   *  multiple var-length rels), in ascending-length order — plus the
   *  (marker verb → node label) identity edges any zero-length
   *  branches need; the caller registers each as a synthetic edge
   *  frame before resolution. */
  def expand(matches: Seq[MatchClause], graph: GraphSchema)
      : (Seq[Seq[MatchClause]], Seq[(String, String)]) = {
    val zeros = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val out = matches.foldLeft(Seq(Vector.empty[MatchClause])) { (acc, m) =>
      for (prefix <- acc; e <- expandClause(m, graph, zeros))
        yield prefix :+ e
    }
    if (out.size > MaxBranches)
      throw new CypherNotSupportedException(
        s"variable-length unrolling produces ${out.size} branches " +
        s"(max $MaxBranches) — narrow the [*lo..hi] ranges")
    (out, zeros.toSeq.distinct)
  }

  private def expandClause(m: MatchClause, graph: GraphSchema,
      zeros: scala.collection.mutable.ArrayBuffer[(String, String)]): Seq[MatchClause] =
    m.parts.foldLeft(Seq(Vector.empty[PatternPart])) { (acc, pp) =>
      for (prefix <- acc; e <- expandPart(pp, graph, zeros))
        yield prefix :+ e
    }.map(ps => m.copy(parts = ps))

  private def expandPart(pp: PatternPart, graph: GraphSchema,
      zeros: scala.collection.mutable.ArrayBuffer[(String, String)]): Seq[PatternPart] = {
    // type alternations expand first (one branch per verb — the hops
    // of a var-length alternation then all carry the branch's verb)
    val ai = pp.rels.indexWhere(_.alts.nonEmpty)
    if (ai >= 0) {
      val r = pp.rels(ai)
      return (r.verb.toSeq ++ r.alts).flatMap { v =>
        expandPart(pp.copy(rels =
          pp.rels.updated(ai, r.copy(verb = Some(v), alts = Seq.empty))),
          graph, zeros)
      }
    }
    val i = pp.rels.indexWhere(_.varLength.isDefined)
    if (i < 0) Seq(pp)
    else {
      val r = pp.rels(i)
      val (lo, hi) = r.varLength.get
      // unbounded rels are rewritten away by Reach.rewrite before any
      // expansion — reaching here is a compiler-internal ordering bug
      require(hi != Parser.Unbounded,
        "internal: unbounded var-length must be lowered by Reach.rewrite")
      val expanded = (lo to hi).flatMap { len =>
        if (len == 0) zeroHopPart(pp, i, r, graph, zeros).toSeq.flatten
        else {
          val hop = r.copy(varLength = None) // alias None (parser-enforced)
          val interior = Seq.fill(len - 1)(NodePat(None, None))
          expandPart(pp.copy(
            nodes = pp.nodes.take(i + 1) ++ interior ++
              pp.nodes.drop(i + 1),
            rels = pp.rels.take(i) ++ Seq.fill(len)(hop) ++
              pp.rels.drop(i + 1)), graph, zeros)
        }
      }
      if (expanded.isEmpty)
        throw new CypherBindingException(
          "zero-length variable-length: the endpoints' explicit labels " +
          "differ — one node cannot satisfy both, and no other length " +
          "is in range")
      expanded
    }
  }

  /** The L = 0 branch: replace the var-length rel with one hop over a
    * fresh identity marker verb (registered by the compiler as an
    * (id, id) frame of the endpoint label). None when the endpoints'
    * explicit labels conflict — that branch matches nothing. */
  private def zeroHopPart(pp: PatternPart, i: Int, r: RelPat,
      graph: GraphSchema, zeros: scala.collection.mutable.ArrayBuffer[(String, String)])
      : Option[Seq[PatternPart]] = {
    val a = pp.nodes(i)
    val b = pp.nodes(i + 1)
    Seq(a, b).foreach { np =>
      if (np.labelAlts.nonEmpty || np.extraLabels.nonEmpty ||
          np.negLabels.nonEmpty)
        throw new CypherNotSupportedException(
          "zero-length variable-length with a label alternation, " +
          "negation or multi-label endpoint — give the endpoint one " +
          "label")
    }
    if (a.label.isDefined && b.label.isDefined && a.label != b.label)
      return None
    val label = a.label.orElse(b.label).getOrElse {
      val verb = r.verb.getOrElse(throw new CypherNotSupportedException(
        "zero-length variable-length without a relationship type — " +
        "label an endpoint to type the zero-hop row"))
      val selfDefs = graph.edgesByVerb(verb)
        .filter(e => e.fromLabel == e.toLabel).map(_.fromLabel).distinct
      selfDefs match {
        case Seq(one) => one
        case _ => throw new CypherNotSupportedException(
          s"zero-length variable-length over '$verb': the zero-hop " +
          "row's label is ambiguous — label an endpoint")
      }
    }
    val marker = s"$ZeroHopPrefix${zeroCounter.getAndIncrement()}_$label"
    zeros += ((marker, label))
    // the rel-list variable (round 15) rides the marker so the L = 0
    // branch still binds it — to the EMPTY relationship list
    Some(expandPart(pp.copy(rels = pp.rels.updated(i,
      RelPat(None, Some(marker), Direction.Out,
        listAlias = r.listAlias, srcListAlias = r.srcListAlias,
        dstListAlias = r.dstListAlias))), graph, zeros))
  }
}
