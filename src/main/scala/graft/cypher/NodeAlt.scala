package graft.cypher

import ast._

/**
 * AST-level expansion of CROSS-TABLE node-label alternation `(n:A|B)` —
 * a flagged EXTENSION (the reference rejects every multi-label pattern,
 * reference: CypherVisitor.cs:1119-1127).
 *
 * Same-table alternation (every alternative backed by ONE owning schema
 * node — the primary label and/or its declared sub-labels) resolves in
 * the Analyzer to an OR of discriminator conjuncts on a single scan
 * (Analyzer.scala, round 8). When the alternatives live in DIFFERENT
 * tables a single scan cannot express the union, so the pattern expands
 * here into one branch per owning node — the same branch-union pipeline
 * the compiler already runs for var-length unrolling and relationship
 * type alternation: each branch resolves, scan-merges and joins as an
 * ordinary single-label pattern, and the compiler UNION ALLs the
 * branches, null-filling the union property namespace and deriving a
 * synthetic tagged id (`__nid` = "label:id") so entity identity —
 * DISTINCT n, count(DISTINCT n), implicit grouping — never conflates
 * ids from different tables' namespaces.
 *
 * Expansion is consistent per NAMED alias (every occurrence of `n`
 * takes the same alternative in a branch); each ANONYMOUS alternation
 * node branches independently. The branch product shares
 * [[VarLength.MaxBranches]] with var-length unrolling.
 */
object NodeAlt {

  /** The synthetic id column of a merged cross-table binding — present
   *  in every branch as "label:id", it IS the entity's identity after
   *  the union. Bindings carrying it cannot be re-matched in a later
   *  pattern (their alternatives live in different tables). */
  val MergedIdColumn = "__nid"

  /** Substitution choice for one alternation occurrence: the (label,
   *  labelAlts) pair to stamp on the pattern. `(Some(owner), Nil)` when
   *  the alternative IS a primary label; `(None, subs)` routes the
   *  owner's sub-label subset through the Analyzer's same-table
   *  alternation (OR of discriminator conjuncts). */
  private type Choice = (Option[String], Seq[String])

  private def ownersOf(schema: GraphSchema, l: String): Seq[NodeDef] =
    schema.nodes.filter(nd => nd.label == l || nd.subLabels.contains(l))

  /** Per-owner substitution choices for an alternation pattern, or None
   *  when the set is same-table (one owning node backs every
   *  alternative — the Analyzer's path). Throws the Analyzer's own
   *  typed errors for unknown / ambiguous alternatives. */
  private def choicesFor(schema: GraphSchema, np: NodePat): Option[Seq[Choice]] = {
    if (np.labelAlts.isEmpty) return None
    val alts = (np.label.toSeq ++ np.labelAlts).distinct
    val ownerSets = alts.map(l => l -> ownersOf(schema, l))
    ownerSets.collectFirst { case (l, os) if os.isEmpty => l }.foreach(l =>
      throw new CypherBindingException(
        s"label alternation (${alts.mkString("|")}): unknown label '$l'"))
    val common = ownerSets.map(_._2.map(_.label).toSet).reduce(_ intersect _)
    if (common.nonEmpty) return None // same-table — Analyzer resolves it
    ownerSets.collectFirst { case (l, os) if os.size > 1 => (l, os) }
      .foreach { case (l, os) =>
        throw new CypherBindingException(
          s"label alternation (${alts.mkString("|")}): alternative '$l' is " +
          s"ambiguous across tables (${os.map(_.label).sorted.mkString(", ")} " +
          "each declare it)")
      }
    // group alternatives by their single owner, preserving written order
    val ownerOf: Map[String, String] =
      ownerSets.map { case (l, os) => l -> os.head.label }.toMap
    val owners = alts.map(ownerOf).distinct
    Some(owners.map { o =>
      val group = alts.filter(l => ownerOf(l) == o)
      if (group == Seq(o)) (Some(o), Seq.empty[String])
      else (None, group)
    })
  }

  /** True when any node pattern carries a cross-table alternation —
   *  routes the part into the compiler's branch-union path. */
  def hasCross(schema: GraphSchema, matches: Seq[MatchClause]): Boolean =
    matches.exists(_.parts.exists(_.nodes.exists(
      choicesFor(schema, _).isDefined)))

  /** Expands every cross-table alternation in `branches` (the var-length
   *  unrolling output), consistently per named alias, independently per
   *  anonymous occurrence. Returns the widened branch set plus the NAMED
   *  aliases that branched — the compiler merges those bindings over the
   *  tagged [[MergedIdColumn]] after the union. */
  def expand(schema: GraphSchema, branches: Seq[Seq[MatchClause]])
      : (Seq[Seq[MatchClause]], Set[String]) = {
    val altAliases = scala.collection.mutable.LinkedHashSet[String]()
    val out = branches.flatMap { ms =>
      // named aliases: one choice set per alias, every occurrence agrees
      val namedChoices =
        scala.collection.mutable.LinkedHashMap[String, Seq[Choice]]()
      ms.foreach(_.parts.foreach(_.nodes.foreach { np =>
        np.alias.foreach { a =>
          choicesFor(schema, np).foreach { cs =>
            namedChoices.get(a) match {
              case Some(prev) if prev != cs =>
                throw new CypherBindingException(
                  s"alias '$a' carries two different label alternations")
              case _ => namedChoices(a) = cs
            }
          }
        }
      }))
      altAliases ++= namedChoices.keys
      // cartesian over named aliases' choices
      val assignments: Seq[Map[String, Choice]] =
        namedChoices.foldLeft(Seq(Map.empty[String, Choice])) {
          case (acc, (a, cs)) =>
            for (m <- acc; c <- cs) yield m + (a -> c)
        }
      assignments.flatMap { asg =>
        // substitute named occurrences, then branch each anonymous one
        def subst(np: NodePat, c: Choice): NodePat =
          np.copy(label = c._1, labelAlts = c._2)
        val withNamed = ms.map(m => m.copy(parts = m.parts.map(pp =>
          pp.copy(nodes = pp.nodes.map { np =>
            np.alias.flatMap(asg.get) match {
              case Some(c) if choicesFor(schema, np).isDefined => subst(np, c)
              case _ => np
            }
          }))))
        // anonymous cross-table alternations: independent branch per
        // occurrence (each is its own entity — a pure branch filter)
        def expandAnon(msx: Seq[MatchClause]): Seq[Seq[MatchClause]] = {
          var acc: Seq[Seq[MatchClause]] = Seq(Seq.empty)
          msx.foreach { m =>
            var clauseAcc: Seq[Seq[PatternPart]] = Seq(Seq.empty)
            m.parts.foreach { pp =>
              var partAcc: Seq[Seq[NodePat]] = Seq(Seq.empty)
              pp.nodes.foreach { np =>
                val opts: Seq[NodePat] =
                  if (np.alias.isEmpty)
                    choicesFor(schema, np) match {
                      case Some(cs) => cs.map(subst(np, _))
                      case None => Seq(np)
                    }
                  else Seq(np)
                partAcc = for (p <- partAcc; o <- opts) yield p :+ o
              }
              clauseAcc = for (c <- clauseAcc; nodes <- partAcc)
                yield c :+ pp.copy(nodes = nodes)
            }
            acc = for (a <- acc; parts <- clauseAcc)
              yield a :+ m.copy(parts = parts)
          }
          acc
        }
        expandAnon(withNamed)
      }
    }
    if (out.size > VarLength.MaxBranches)
      throw new CypherNotSupportedException(
        s"label alternation expansion produces ${out.size} branches " +
        s"(max ${VarLength.MaxBranches}) — narrow the alternation sets")
    (out, altAliases.toSet)
  }
}
