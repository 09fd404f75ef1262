package graft.cypher

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
 * The fan-out is the product over all var-length rels of their range
 * widths, capped at [[VarLength.MaxBranches]]; the parser separately
 * caps each hi at [[Parser.MaxVarHops]].
 */
object VarLength {

  /** Upper bound on the branch product — 64 covers e.g. three
   *  independent [*1..4] rels; beyond that the plan is a fan-out
   *  mistake, not a query. */
  val MaxBranches = 64

  /** True when any rel needs branch expansion: bounded var-length
   *  `[*lo..hi]` or a type alternation `[:A|B]`. */
  def hasVarLength(matches: Seq[MatchClause]): Boolean =
    matches.exists(_.parts.exists(_.rels.exists(r =>
      r.varLength.isDefined || r.alts.nonEmpty)))

  /** All unrollings of one query part's MATCH clauses (cartesian across
   *  multiple var-length rels), in ascending-length order. */
  def expand(matches: Seq[MatchClause]): Seq[Seq[MatchClause]] = {
    val out = matches.foldLeft(Seq(Vector.empty[MatchClause])) { (acc, m) =>
      for (prefix <- acc; e <- expandClause(m)) yield prefix :+ e
    }
    if (out.size > MaxBranches)
      throw new CypherNotSupportedException(
        s"variable-length unrolling produces ${out.size} branches " +
        s"(max $MaxBranches) — narrow the [*lo..hi] ranges")
    out
  }

  private def expandClause(m: MatchClause): Seq[MatchClause] =
    m.parts.foldLeft(Seq(Vector.empty[PatternPart])) { (acc, pp) =>
      for (prefix <- acc; e <- expandPart(pp)) yield prefix :+ e
    }.map(ps => m.copy(parts = ps))

  private def expandPart(pp: PatternPart): Seq[PatternPart] = {
    // type alternations expand first (one branch per verb — the hops
    // of a var-length alternation then all carry the branch's verb)
    val ai = pp.rels.indexWhere(_.alts.nonEmpty)
    if (ai >= 0) {
      val r = pp.rels(ai)
      return (r.verb.toSeq ++ r.alts).flatMap { v =>
        expandPart(PatternPart(pp.nodes,
          pp.rels.updated(ai, r.copy(verb = Some(v), alts = Seq.empty)),
          pp.pathVar, pp.shortest, pp.allShortest))
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
      (lo to hi).flatMap { len =>
        val hop = r.copy(varLength = None) // alias is None (parser-enforced)
        val interior = Seq.fill(len - 1)(NodePat(None, None))
        expandPart(PatternPart(
          pp.nodes.take(i + 1) ++ interior ++ pp.nodes.drop(i + 1),
          pp.rels.take(i) ++ Seq.fill(len)(hop) ++ pp.rels.drop(i + 1),
          pp.pathVar, pp.shortest, pp.allShortest))
      }
    }
  }
}
