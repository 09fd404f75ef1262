package graft.cypher

import ast._

/**
 * Binds pattern aliases to graph-schema entities: label inference for
 * unlabeled nodes, edge resolution by (fromLabel, verb, toLabel) triple,
 * direction validation, and the rejection checks the reference applies
 * at plan time (reference: CypherVisitor.cs:644-788 alias/label
 * propagation; LogicalPlan.cs:596-667 edge direction + rel-var reuse;
 * LogicalPlan.cs:603-612 undirected self-type rejection).
 */
object Analyzer {

  /** What an in-scope alias is bound to during compilation. */
  sealed trait Binding
  final case class NodeBinding(node: NodeDef) extends Binding
  final case class EdgeBinding(edge: EdgeDef) extends Binding
  /** A plain value column (projected by a WITH). */
  case object ValueBinding extends Binding
  /** A named path `p = (...)` (extension). The alias's physical column
   *  holds the pattern's relationship count (BIGINT, materialized per
   *  var-length branch before any union), and the ONLY legal use of the
   *  variable is length(p)/size(p). */
  case object PathBinding extends Binding

  /** A relationship resolved against the schema; srcNode/snkNode are the
   *  node aliases on the edge's *schema* source/sink ends (pattern
   *  direction already normalized away). */
  final case class ResolvedRel(alias: String, edge: EdgeDef,
                               srcNode: String, snkNode: String)

  final case class ResolvedMatch(
      nodeLabels: Map[String, String],   // every node alias in this clause
      nodeOrder: Seq[String],            // pattern order, deduped
      rels: Seq[ResolvedRel],
      optional: Boolean,
      where: Option[Expr],
      /** rel-alias pairs of the same edge type in this clause — Cypher
       *  relationship-uniqueness (reference: LogicalPlan.cs:969-1017). */
      inequalityPairs: Seq[(ResolvedRel, ResolvedRel)],
      /** named-path aliases of this clause with their length source:
       *  Left(relationship count) for ordinary patterns (extension;
       *  concrete per var-length branch since expansion precedes
       *  resolution), Right(column) when the part is a `shortestPath`
       *  over an unbounded range — Reach's lowering exposes the
       *  min-distance as a property column of its synthetic rel. */
      pathVars: Seq[(String, Either[Int, String])] = Seq.empty,
      /** path alias → (node aliases, rel aliases) in traversal order —
       *  the per-branch witnesses backing nodes(p)/relationships(p).
       *  Zero-hop identity markers contribute neither a rel nor their
       *  duplicate right endpoint (a length-0 path has ONE node); paths
       *  lowered through a Reach pair frame (unbounded ranges) have no
       *  per-hop witnesses and are absent from this map. Round 15:
       *  rel-LIST variables (`[rs:R*1..3]`) also live here, with an
       *  EMPTY node list — the compiler materializes their rel array
       *  directly under the variable's own column name. */
      pathWitness: Map[String, (Seq[String], Seq[String])] = Map.empty,
      /** Rel-list variable names of this clause (round 15) — the
       *  pathWitness keys above that bind a relationship LIST value
       *  rather than a named path. */
      relLists: Seq[String] = Seq.empty,
      /** Group NODE variable names (round 15, late) — pathWitness
       *  keys binding a node LIST value (per-repetition endpoints of
       *  a single-rel quantified group). */
      nodeLists: Seq[String] = Seq.empty)

  private final class AliasGen {
    private var n = 0
    def next(): String = { val a = s"__unnamed_$n"; n += 1; a }
  }

  /** Resolve all MATCH clauses of one query part against the schema,
   *  given the aliases inherited from the previous part. */
  def resolvePart(
      schema: GraphSchema,
      inherited: Map[String, Binding],
      matches: Seq[MatchClause]): Seq[ResolvedMatch] = {
    val gen = new AliasGen

    // name anonymous entities; reject reserved prefix on user aliases
    // (reference: MatchClause.cs:53-73)
    final case class NamedPart(nodes: Seq[NodePat], rels: Seq[RelPat],
                               pathVar: Option[String])
    final case class NamedMatch(parts: Seq[NamedPart], m: MatchClause)
    // user-written aliases may not enter the engine's internal `__`
    // namespace (`__unnamed_N`, `__{alias}_{prop}`, `__item_N` …).
    // Exactly `__pm<digits>` (parser-made: anonymous map-bearing
    // pattern entities) and `__rd<digits>` (Reach-made: the
    // min-distance rel of an unbounded shortestPath) are exempt: the
    // parser rejects every user-typed `__`-prefixed pattern alias and
    // path var itself, so these shapes can only arrive engine-made.
    def exemptSynth(a: String, prefix: String): Boolean =
      a.startsWith(prefix) && a.length > prefix.length &&
        a.drop(prefix.length).forall(_.isDigit)
    def checkUserAlias(a: String): Unit =
      if (a.startsWith("__") &&
          !exemptSynth(a, "__pm") && !exemptSynth(a, "__rd"))
        throw new CypherNotSupportedException(
          s"alias '$a' — names starting with __ are reserved")
    val named = matches.map { m =>
      NamedMatch(m.parts.map { pp =>
        NamedPart(
          pp.nodes.map { np =>
            np.alias.foreach(checkUserAlias)
            np.copy(alias = Some(np.alias.getOrElse(gen.next())))
          },
          pp.rels.map { rp =>
            rp.alias.foreach(checkUserAlias)
            rp.listAlias.foreach(checkUserAlias)
            rp.copy(alias = Some(rp.alias.getOrElse(gen.next())))
          },
          { pp.pathVar.foreach(checkUserAlias); pp.pathVar })
      }, m)
    }

    // a cross-table alternation binding (n:A|B across tables) has a
    // synthetic tagged identity and NO single backing table — it cannot
    // be re-matched in a later pattern (no scan to join back to, and
    // its id values are "label:id" strings, not edge keys)
    named.foreach(_.parts.foreach(_.nodes.foreach { np =>
      np.alias.filter(a => inherited.get(a).exists {
        case NodeBinding(nd) => nd.idColumn == NodeAlt.MergedIdColumn
        case _ => false
      }).foreach(a => throw new CypherNotSupportedException(
        s"'$a' is bound by a cross-table label alternation — it cannot " +
        "appear in a later MATCH/EXISTS pattern (its alternatives live " +
        "in different tables); project the properties you need through " +
        "WITH instead"))
    }))

    // ----- label inference fixpoint over the whole part ----------------
    val labels = scala.collection.mutable.Map[String, String]()
    inherited.foreach {
      case (a, NodeBinding(nd)) => labels(a) = nd.label
      case _ =>
    }
    def assign(alias: String, label: String): Boolean = labels.get(alias) match {
      case Some(l) if l == label => false
      case Some(l) =>
        throw new CypherBindingException(
          s"alias '$alias' bound to two labels: $l and $label")
      case None => labels(alias) = label; true
    }

    // explicit labels. A multi-label set `(n:A:B)` (extension; parser
    // gates the syntax) resolves to the ONE schema node that declares
    // every other label in the set as a sub-label; each extra lowers to
    // a discriminator WHERE conjunct on that clause. Anything else is a
    // precise binding rejection naming the unsupported schema shape.
    val subConjuncts: Array[scala.collection.mutable.Builder[Expr, Vector[Expr]]] =
      Array.fill(named.size)(Vector.newBuilder[Expr])
    named.zipWithIndex.foreach { case (nmm, mi) =>
      nmm.parts.foreach(_.nodes.foreach { np =>
        // label alternation `(n:A|B)` (extension; parser gates the
        // syntax and its exclusivity with `:A:B`): union semantics —
        // every alternative must resolve to ONE owning node (the
        // primary itself, or a declared sub-label of it), because a
        // single binding cannot range over different id namespaces.
        // Lowers to an OR of discriminator conjuncts; an alternative
        // that IS the primary covers the whole table (no conjunct).
        if (np.labelAlts.nonEmpty) {
          val alts = (np.label.toSeq ++ np.labelAlts).distinct
          def ownersOf(l: String): Seq[NodeDef] =
            schema.nodes.filter(nd =>
              nd.label == l || nd.subLabels.contains(l))
          val ownerSets = alts.map(l => l -> ownersOf(l))
          ownerSets.collectFirst { case (l, os) if os.isEmpty => l }
            .foreach(l => throw new CypherBindingException(
              s"label alternation (${alts.mkString("|")}): unknown " +
              s"label '$l'"))
          val common = ownerSets.map(_._2.map(_.label).toSet)
            .reduce(_ intersect _)
          if (common.isEmpty)
            throw new CypherBindingException(
              s"label alternation (${alts.mkString("|")}): the " +
              "alternatives are backed by different tables — their ids " +
              "live in different namespaces, so one binding cannot " +
              "range over them; alternation needs one primary label " +
              "and/or its declared sub-labels")
          if (common.size > 1)
            throw new CypherBindingException(
              s"label alternation (${alts.mkString("|")}) is ambiguous: " +
              s"${common.toSeq.sorted.mkString(", ")} each back the set")
          val nd = schema.node(common.head)
          assign(np.alias.get, nd.label)
          if (!alts.contains(nd.label)) {
            val ors = alts.map { sl =>
              val (prop, v) = nd.subLabels(sl)
              Bin(BinOp.Eq, Ref(np.alias.get, Some(prop)), Lit(v)): Expr
            }
            subConjuncts(mi) += ors.reduce(Bin(BinOp.Or, _, _))
          }
        } else {
        val ls = (np.label.toSeq ++ np.extraLabels).distinct
        if (ls.size == 1) { schema.node(ls.head); assign(np.alias.get, ls.head) }
        else if (ls.size > 1) {
          val owners = ls.flatMap(schema.nodeOpt).filter(nd =>
            (ls.toSet - nd.label).forall(nd.subLabels.contains))
          owners match {
            case Seq(nd) =>
              assign(np.alias.get, nd.label)
              (ls.toSet - nd.label).toSeq.sorted.foreach { sl =>
                val (prop, v) = nd.subLabels(sl)
                subConjuncts(mi) +=
                  Bin(BinOp.Eq, Ref(np.alias.get, Some(prop)), Lit(v))
              }
            case Seq() =>
              throw new CypherBindingException(
                s"multi-label (${ls.mkString(":")}): no schema backing — " +
                "exactly one label must be a node whose declared subLabels " +
                "cover the rest (same table + discriminator property); " +
                "labels backed by different tables cannot intersect")
            case more =>
              throw new CypherBindingException(
                s"multi-label (${ls.mkString(":")}) is ambiguous: " +
                s"${more.map(_.label).sorted.mkString(", ")} each back the " +
                "full set")
          }
        }
        }
        // label negation `!L` (round 13; Cypher 5 label expressions):
        // against the node's resolved primary — own label folds false,
        // a declared sub-label negates its discriminator (an ABSENT
        // property is "not labeled", so null ORs in), a label of some
        // other table never applies to this table's rows (drops)
        if (np.negLabels.nonEmpty) {
          val owner = labels.getOrElse(np.alias.get,
            throw new CypherNotSupportedException(
              "label negation (n:!A) requires a positive label on the " +
              "same node"))
          val nd = schema.node(owner)
          np.negLabels.distinct.foreach { nl =>
            if (nl == nd.label) subConjuncts(mi) += Lit(false)
            else nd.subLabels.get(nl) match {
              case Some((prop, v)) =>
                subConjuncts(mi) += Bin(BinOp.Or,
                  IsNull(Ref(np.alias.get, Some(prop)), not = false),
                  Not(Bin(BinOp.Eq, Ref(np.alias.get, Some(prop)),
                    Lit(v))))
              case None => () // no row here carries that label
            }
          }
        }
      })
    }

    // traversal triples (leftAlias, rel, rightAlias)
    val traversals: Seq[(String, RelPat, String)] = named.flatMap(_.parts.flatMap {
      pp => pp.rels.indices.map { i =>
        (pp.nodes(i).alias.get, pp.rels(i), pp.nodes(i + 1).alias.get)
      }
    })

    var changed = true
    while (changed) {
      changed = false
      traversals.foreach { case (la, rp, ra) =>
        val cands = candidateEdges(schema, rp, labels.get(la), labels.get(ra))
        if (cands.nonEmpty) {
          // (edge, leftIsSource); infer endpoint labels all candidates agree on
          val leftLabels = cands.map { case (e, lSrc) =>
            if (lSrc) e.fromLabel else e.toLabel }.distinct
          val rightLabels = cands.map { case (e, lSrc) =>
            if (lSrc) e.toLabel else e.fromLabel }.distinct
          if (!labels.contains(la) && leftLabels.size == 1)
            changed |= assign(la, leftLabels.head)
          if (!labels.contains(ra) && rightLabels.size == 1)
            changed |= assign(ra, rightLabels.head)
        }
      }
    }

    named.foreach(_.parts.foreach(_.nodes.foreach { np =>
      val a = np.alias.get
      if (!labels.contains(a))
        throw new CypherBindingException(
          s"cannot infer a label for node '$a' — annotate it, e.g. ($a:Label)")
    }))

    // ----- per-clause resolution ---------------------------------------
    // rel aliases are unique across the WHOLE part (all chained MATCH
    // clauses — reference LogicalPlan.cs:660-667), and may not collide
    // with node aliases (both would claim the same column namespace)
    val relSeen = scala.collection.mutable.Set[String]()
    val allNodeAliases: Set[String] =
      named.flatMap(_.parts.flatMap(_.nodes.flatMap(_.alias))).toSet
    val allRelAliases: Set[String] =
      named.flatMap(_.parts.flatMap(_.rels.flatMap(_.alias))).toSet
    val pathSeen = scala.collection.mutable.Set[String]()
    val listSeen = scala.collection.mutable.Set[String]()
    named.zipWithIndex.map { case (nm, mi) =>
      val rels = Vector.newBuilder[ResolvedRel]
      val nodeOrder = Vector.newBuilder[String]
      val nodeLabels = scala.collection.mutable.Map[String, String]()
      val paths = Vector.newBuilder[(String, Either[Int, String])]
      val witnesses = Map.newBuilder[String, (Seq[String], Seq[String])]
      val relListsB = Vector.newBuilder[String]
      val nodeListsB = Vector.newBuilder[String]

      nm.parts.foreach { pp =>
        // rel-LIST variables (round 15): the var-length expansion
        // stamped each generated hop (and any zero-hop marker) with
        // its list alias — collect the real hops per variable into a
        // rel-only witness entry (empty node list); the L = 0 branch
        // contributes an empty rel list
        pp.rels.flatMap(_.listAlias).distinct.foreach { lv =>
          if (allNodeAliases(lv) || allRelAliases(lv) ||
              inherited.contains(lv) || pathSeen(lv) || !listSeen.add(lv))
            throw new CypherBindingException(
              s"rel-list alias '$lv' collides with another variable")
          val wr = pp.rels.filter(_.listAlias.contains(lv))
            .filterNot(_.verb.exists(VarLength.isZeroHop))
            .map(_.alias.get)
          witnesses += ((lv, (Seq.empty, wr)))
          relListsB += lv
        }
        // group NODE variables (round 15, late): the expansion stamped
        // the hop copies with the group's endpoint names — collect the
        // hop's left/right node aliases per variable into a NODE-only
        // witness entry (empty on the zero branch)
        Seq(true, false).foreach { isSrc =>
          val get: RelPat => Option[String] =
            if (isSrc) _.srcListAlias else _.dstListAlias
          pp.rels.flatMap(get(_)).distinct.foreach { nv =>
            if (allNodeAliases(nv) || allRelAliases(nv) ||
                inherited.contains(nv) || pathSeen(nv) ||
                !listSeen.add(nv))
              throw new CypherBindingException(
                s"group variable '$nv' collides with another variable")
            val wn = pp.rels.indices
              .filter(i => get(pp.rels(i)).contains(nv) &&
                !pp.rels(i).verb.exists(VarLength.isZeroHop))
              .map(i => pp.nodes(if (isSrc) i else i + 1).alias.get)
            witnesses += ((nv, (wn, Seq.empty)))
            nodeListsB += nv
          }
        }
        // chain-QPP group variables (round 15, late): a composite
        // chain def carries (group var, struct column) entries —
        // collect the repetition hop aliases per variable; two
        // different chains may not share one name
        locally {
          val byVar = scala.collection.mutable.LinkedHashMap
            .empty[String, (String, Vector[String])]
          pp.rels.foreach { rp =>
            rp.verb.foreach { v =>
              schema.edgesByVerb(v).foreach { e =>
                e.hopLists.foreach { case (gv, _) =>
                  byVar.get(gv) match {
                    case Some((v0, as)) if v0 == v =>
                      byVar(gv) = (v0, as :+ rp.alias.get)
                    case Some(_) =>
                      throw new CypherBindingException(
                        s"group variable '$gv' is bound by two " +
                        "different quantified groups")
                    case None =>
                      byVar(gv) = (v, Vector(rp.alias.get))
                  }
                }
              }
            }
          }
          byVar.foreach { case (gv, (_, wr)) =>
            if (allNodeAliases(gv) || allRelAliases(gv) ||
                inherited.contains(gv) || pathSeen(gv) ||
                !listSeen.add(gv))
              throw new CypherBindingException(
                s"group variable '$gv' collides with another variable")
            witnesses += ((gv, (Seq.empty, wr)))
            relListsB += gv
          }
        }
        pp.pathVar.foreach { pv =>
          // a Reach-made dist rel (`__rd<n>`, shortestPath over an
          // unbounded range) binds the path var to its min-distance
          // property column instead of a literal relationship count
          val distRel = pp.rels.collectFirst {
            case rp if rp.alias.exists(Reach.isDistRel) => rp.alias.get
          }
          // named paths in OPTIONAL MATCH (round 12): the length
          // column (literal per branch, or the unbounded-shortestPath
          // dist column) and any witness arrays ride the OPTIONAL
          // side and null-fill through the left join — Cypher's
          // null-on-unmatched contract
          if (allNodeAliases(pv) || allRelAliases(pv) ||
              inherited.contains(pv) || listSeen(pv) || !pathSeen.add(pv))
            throw new CypherBindingException(
              s"path alias '$pv' collides with another variable")
          paths += ((pv, distRel match {
            case Some(ra) => Right(Compiler.pref(ra, "__dist"))
            // zero-hop identity markers count as 0 relationships
            case None => Left(pp.rels.count(r =>
              !r.verb.exists(VarLength.isZeroHop)))
          }))
          // per-hop witnesses: only when every hop is a real edge row
          // (a Reach pair frame compresses the interior away)
          val reachLowered = distRel.isDefined ||
            pp.rels.exists(_.verb.exists(_.startsWith("__REACH_")))
          if (!reachLowered) {
            val wn = Vector.newBuilder[String]
            val wr = Vector.newBuilder[String]
            wn += pp.nodes.head.alias.get
            pp.rels.indices.foreach { i =>
              if (!pp.rels(i).verb.exists(VarLength.isZeroHop)) {
                wr += pp.rels(i).alias.get
                wn += pp.nodes(i + 1).alias.get
              }
            }
            witnesses += ((pv, (wn.result(), wr.result())))
          }
        }
        pp.nodes.foreach { np =>
          val a = np.alias.get
          nodeOrder += a
          nodeLabels(a) = labels(a)
          inherited.get(a) match {
            case Some(ValueBinding) | Some(EdgeBinding(_)) =>
              throw new CypherBindingException(
                s"alias '$a' is not a node variable")
            case _ =>
          }
        }
        pp.rels.indices.foreach { i =>
          val rp = pp.rels(i)
          val la = pp.nodes(i).alias.get
          val ra = pp.nodes(i + 1).alias.get
          val a = rp.alias.get
          if (!relSeen.add(a))
            throw new CypherNotSupportedException(
              s"relationship variable '$a' reused across patterns " +
              "(within one MATCH or chained MATCH clauses)")
          if (allNodeAliases(a))
            throw new CypherBindingException(
              s"alias '$a' is used for both a node and a relationship")
          if (inherited.contains(a))
            throw new CypherBindingException(
              s"relationship alias '$a' already bound in an earlier part")
          rels += resolveRel(schema, rp, la, ra, labels(la), labels(ra))
        }
      }
      val rs = rels.result()
      // relationship-uniqueness pairing: same edge definition — a
      // composite QPP chain (round 14) stands for its UNDERLYING defs
      // (EdgeDef.hopKeys), so a chain pairs with a plain rel of a def
      // it contains, and two chains pair when their def sets overlap
      def fam(e: EdgeDef): Set[(String, String, String)] =
        if (e.hopKeys.nonEmpty) e.hopKeys.map(_._1).toSet else Set(e.key)
      val pairs = for {
        i <- rs.indices; j <- (i + 1) until rs.size
        if fam(rs(i).edge).intersect(fam(rs(j).edge)).nonEmpty
      } yield (rs(i), rs(j))

      // multi-label discriminator conjuncts AND into this clause's WHERE
      // (pattern-time semantics — OPTIONAL MATCH keeps left rows)
      val where = (nm.m.where.toSeq ++ subConjuncts(mi).result())
        .reduceOption(Bin(BinOp.And, _, _))
      ResolvedMatch(nodeLabels.toMap, nodeOrder.result().distinct, rs,
        nm.m.optional, where, pairs, paths.result(), witnesses.result(),
        relListsB.result(), nodeListsB.result())
    }
  }

  /** Candidate (edge, leftIsSource) pairs consistent with the pattern
   *  direction and whatever endpoint labels are already known. */
  private def candidateEdges(
      schema: GraphSchema, rp: RelPat,
      leftLabel: Option[String], rightLabel: Option[String])
      : Seq[(EdgeDef, Boolean)] = {
    val byVerb = rp.verb match {
      case Some(v) => schema.edgesByVerb(v)
      case None    => schema.edges
    }
    def ok(e: EdgeDef, leftIsSource: Boolean): Boolean = {
      val (ll, rl) = if (leftIsSource) (e.fromLabel, e.toLabel)
                     else (e.toLabel, e.fromLabel)
      leftLabel.forall(_ == ll) && rightLabel.forall(_ == rl)
    }
    rp.dir match {
      case Direction.Out  => byVerb.filter(ok(_, leftIsSource = true)).map((_, true))
      case Direction.In   => byVerb.filter(ok(_, leftIsSource = false)).map((_, false))
      case Direction.Both =>
        byVerb.flatMap { e =>
          val out = if (ok(e, leftIsSource = true)) Seq((e, true)) else Nil
          val in  = if (ok(e, leftIsSource = false)) Seq((e, false)) else Nil
          out ++ in
        }
    }
  }

  private def resolveRel(
      schema: GraphSchema, rp: RelPat, la: String, ra: String,
      ll: String, rl: String): ResolvedRel = {
    val cands = candidateEdges(schema, rp, Some(ll), Some(rl))
    if (cands.isEmpty)
      throw new CypherBindingException(
        s"no edge ${rp.verb.getOrElse("(any)")} between $ll and $rl " +
        "matches the pattern direction")
    // undirected with identical src/sink labels matches both ways —
    // rejected like the reference (LogicalPlan.cs:603-612)
    if (rp.dir == Direction.Both && cands.size == 2 &&
        cands.map(_._1.key).distinct.size == 1)
      throw new CypherNotSupportedException(
        s"undirected relationship between two '$ll' nodes is ambiguous")
    if (cands.map(_._1.key).distinct.size > 1)
      throw new CypherBindingException(
        s"ambiguous relationship ${rp.verb.getOrElse("(any)")} between $ll and $rl")
    val (edge, leftIsSource) = cands.head
    if (leftIsSource) ResolvedRel(rp.alias.get, edge, la, ra)
    else ResolvedRel(rp.alias.get, edge, ra, la)
  }
}
