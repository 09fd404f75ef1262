package graft.cypher

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import ast._
import Analyzer.{EdgeBinding, NodeBinding}

/**
 * Per-hop predicates on variable-length relationships (extension,
 * round 10; the reference rejects all var-length,
 * reference: CypherVisitor.cs:2035-2039): `[:T* {p: v}]` — every
 * traversed relationship must satisfy the map equalities (Neo4j's
 * var-length property-map semantics) — and the engine's
 * `[r:T*1..3 WHERE r.p > 0]` spelling, where the alias names ONE hop,
 * is visible only inside the predicate, and is consumed by it (it is
 * never bound downstream: a var-length match aggregates many hops).
 *
 * Lowering: the predicate references exactly one edge row at a time,
 * so it compiles ONCE against the verb's edge frame and the rel is
 * rewritten to a SYNTHETIC VERB backed by the FILTERED frame
 * (`__HF_<n>_<verb>`, the [[Reach]] synthetic-edge discipline). Every
 * downstream path then composes unchanged — bounded `[*lo..hi]`
 * unrolling scans the filtered frame per hop, the unbounded reach BFS
 * iterates it, shortestPath/allShortestPaths count over it, and
 * `[*0..]` identity rows bypass it (zero hops traverse no edge).
 *
 * Scale shape: the filter is a map-side predicate pushed at the scan
 * (one `where` on the edge frame before any join or BFS round) — the
 * cheapest possible placement; nothing else in the plan changes.
 *
 * Contract (typed rejections otherwise):
 *  - explicit single-definition verb — a type alternation or a verb
 *    spanning several label pairs has no single property namespace to
 *    predicate over;
 *  - the predicate reads ONLY the hop relationship (other pattern
 *    variables are not in scope for a per-hop test — those belong in
 *    the clause WHERE);
 *  - no aggregates.
 */
private[cypher] object HopPred {

  private val nameCounter = new AtomicLong(0)

  def hasHopPred(matches: Seq[MatchClause]): Boolean =
    matches.exists(_.parts.exists(_.rels.exists(r =>
      r.hopPred.isDefined || r.qpp.isDefined)))

  /** Rewrites every hop-predicated var-length rel to the same pattern
    * over a synthetic verb backed by the filtered edge frame. No-op
    * (same instances) when nothing carries a predicate. */
  def rewrite(matches0: Seq[MatchClause], catalog0: GraphCatalog)
      : (Seq[MatchClause], GraphCatalog) = {
    // var-length type alternations desugar FIRST (round 17;
    // [[AltRel]]): the synthetic union-verb rel then rides every
    // later pass — this one, Reach.rewrite, bounded unrolling —
    // as an ordinary single-verb rel. Chained here so all three
    // pre-lower call sites (MATCH parts, EXISTS probes, pattern
    // comprehensions) pick it up without repeating the plumbing.
    val (matches, catalog) = AltRel.rewrite(matches0, catalog0)
    if (!hasHopPred(matches)) return (matches, catalog)
    val extra = Vector.newBuilder[(EdgeDef, DataFrame)]
    val out = matches.map { m =>
      m.copy(parts = m.parts.map { pp =>
        pp.copy(rels = pp.rels.map { r =>
          if (r.qpp.isDefined) rewriteQpp(r, catalog, extra)
          else r.hopPred match {
            case None => r
            case Some((hopAlias, pred)) =>
              if (Compiler.containsAgg(pred))
                throw new CypherNotSupportedException(
                  "aggregate inside a per-hop relationship predicate")
              val verb = r.verb.getOrElse(
                throw new CypherNotSupportedException(
                  "per-hop predicate on a variable-length relationship " +
                  "requires an explicit relationship type, e.g. " +
                  "[:NEXT* {p: v}]"))
              if (r.alts.nonEmpty)
                throw new CypherNotSupportedException(
                  "per-hop predicate on a relationship type " +
                  "alternation — the alternatives have different " +
                  "property namespaces")
              val defs = catalog.graph.edgesByVerb(verb)
              if (defs.isEmpty)
                throw new CypherBindingException(
                  s"variable-length over '$verb': no edge of that type " +
                  "in the schema")
              if (defs.size > 1)
                throw new CypherNotSupportedException(
                  s"per-hop predicate on '$verb', which spans multiple " +
                  "edge definitions (" +
                  defs.map(d => s"${d.fromLabel}→${d.toLabel}")
                    .mkString(", ") +
                  ") — the definitions have different property " +
                  "namespaces; predicate a single-definition type")
              val e = defs.head
              val edf = catalog.edgeDf(e)
              // compile the predicate against the edge frame alone:
              // the hop alias is the ONLY binding in scope, so a
              // reference to any other pattern variable fails with the
              // ordinary unknown-variable error
              val prefd = edf.select(edf.columns.toSeq.map(cn =>
                col(cn).as(Compiler.pref(hopAlias, cn))): _*)
              val ec = new ExprCompiler(
                Map(hopAlias -> EdgeBinding(e)), prefd)
              val filtered = prefd.where(ec.compile(pred))
                .select(edf.columns.toSeq.map(cn =>
                  col(Compiler.pref(hopAlias, cn)).as(cn)): _*)
              val id = nameCounter.getAndIncrement()
              val synthVerb = s"__HF_${id}_$verb"
              extra += ((e.copy(verb = synthVerb,
                table = s"__hf_${id}_$verb"), filtered))
              r.copy(verb = Some(synthVerb), hopPred = None)
          }
        })
      })
    }
    (out, catalog.withExtraEdges(extra.result()))
  }

  /**
   * Quantified path pattern lowering (round 13): the group's
   * per-repetition predicate compiles over ONE hop's (src, rel, dst)
   * row — the edge frame joined (only when referenced) with its
   * endpoint node frames — and the rel rewrites to a synthetic verb
   * over the filtered frame, exactly the hopPred discipline. Labels
   * on the group nodes validate against the verb's endpoints; a
   * declared sub-label becomes its discriminator conjunct.
   *
   * Scale shape: the node joins touch the slim (id, referenced-prop)
   * node frames once, BEFORE any unroll or BFS — at 100 TB this is
   * one broadcast-able semi-filter per endpoint, not a per-hop join.
   */
  private def rewriteQpp(r: RelPat, catalog: GraphCatalog,
      extra: scala.collection.mutable.Builder[(EdgeDef, DataFrame),
        Vector[(EdgeDef, DataFrame)]]): RelPat = {
    val q = r.qpp.get
    val plain = r.copy(qpp = None)
    if (q.tail.nonEmpty) return rewriteQppChain(r, q, catalog, extra)
    // a label-less, predicate-less group is pure [*lo..hi] sugar
    if (q.pred.isEmpty && emptyLbl(q.srcLabel) && emptyLbl(q.dstLabel))
      return plain
    val verb = r.verb.getOrElse(
      throw new CypherNotSupportedException(
        "a quantified path pattern with predicates requires an " +
        "explicit relationship type, e.g. ((a)-[:NEXT]->(b) WHERE …)" +
        "{1,3}"))
    if (r.alts.nonEmpty)
      throw new CypherNotSupportedException(
        "predicates on a quantified relationship type alternation — " +
        "the alternatives have different property namespaces")
    if (r.dir == Direction.Both)
      throw new CypherNotSupportedException(
        "predicates on an undirected quantified path pattern — give " +
        "the group's relationship a direction")
    val defs = catalog.graph.edgesByVerb(verb)
    if (defs.isEmpty)
      throw new CypherBindingException(
        s"quantified path pattern over '$verb': no edge of that type " +
        "in the schema")
    if (defs.size > 1)
      throw new CypherNotSupportedException(
        s"predicates on '$verb', which spans multiple edge " +
        "definitions (" +
        defs.map(d => s"${d.fromLabel}→${d.toLabel}").mkString(", ") +
        ") — predicate a single-definition type")
    val e = defs.head
    val (leftL, rightL) =
      if (r.dir == Direction.In) (e.toLabel, e.fromLabel)
      else (e.fromLabel, e.toLabel)
    val leftN = catalog.graph.node(leftL)
    val rightN = catalog.graph.node(rightL)
    val conj = qppLabelConj(q.srcAlias, q.srcLabel, leftN) ++
      qppLabelConj(q.dstAlias, q.dstLabel, rightN) ++ q.pred.toSeq
    if (conj.isEmpty) return plain
    val pred = conj.reduce((x, y) => Bin(BinOp.And, x, y))
    if (Compiler.containsAgg(pred))
      throw new CypherNotSupportedException(
        "aggregate inside a quantified path pattern predicate")
    val edf = catalog.edgeDf(e)
    val eCols = edf.columns.toSeq
    var frame = edf.select(eCols.map(cn =>
      col(cn).as(Compiler.pref(q.relAlias, cn))): _*)
    val leftKey = if (r.dir == Direction.In) e.sinkIdColumn
      else e.srcIdColumn
    val rightKey = if (r.dir == Direction.In) e.srcIdColumn
      else e.sinkIdColumn
    def joinNode(alias: String, n: NodeDef, key: String): Unit =
      if (Compiler.refersTo(pred, alias)) {
        val cols = (n.idColumn +: n.properties).distinct
        val nf = catalog.nodeDf(n.label).select(cols.map(cn =>
          col(cn).as(Compiler.pref(alias, cn))): _*)
        frame = frame.join(nf,
          col(Compiler.pref(q.relAlias, key)) ===
            col(Compiler.pref(alias, n.idColumn)), "inner")
      }
    joinNode(q.srcAlias, leftN, leftKey)
    joinNode(q.dstAlias, rightN, rightKey)
    val scope: Map[String, Analyzer.Binding] = Map(
      q.relAlias -> EdgeBinding(e),
      q.srcAlias -> NodeBinding(leftN),
      q.dstAlias -> NodeBinding(rightN))
    val ec = new ExprCompiler(scope, frame)
    val filtered = frame.where(ec.compile(pred))
      .select(eCols.map(cn =>
        col(Compiler.pref(q.relAlias, cn)).as(cn)): _*)
    val id = nameCounter.getAndIncrement()
    val synthVerb = s"__QF_${id}_$verb"
    extra += ((e.copy(verb = synthVerb, table = s"__qf_${id}_$verb"),
      filtered))
    plain.copy(verb = Some(synthVerb))
  }

  private def emptyLbl(l: QppLbl): Boolean =
    l.label.isEmpty && l.extras.isEmpty && l.alts.isEmpty

  /** Static label predicate for one quantified-group node — the
    * HasLabel lowering: own label true, declared sub-label =
    * discriminator equality, foreign label false (alternation) /
    * typed mismatch (bare or intersected). Folded conjuncts drop. */
  private def qppLabelConj(alias: String, lbl: QppLbl, nd: NodeDef)
      : Seq[Expr] = {
    def one(l: String, inAlt: Boolean): Expr =
      if (l == nd.label) Lit(true)
      else nd.subLabels.get(l) match {
        case Some((prop, v)) =>
          Bin(BinOp.Eq, Ref(alias, Some(prop)), Lit(v))
        case None =>
          if (inAlt) Lit(false)
          else throw new CypherBindingException(
            s"quantified path pattern node ':$l' does not match the " +
            s"relationship's endpoint label '${nd.label}'")
      }
    if (lbl.alts.nonEmpty) {
      val arms = (lbl.label.toSeq ++ lbl.alts).map(one(_, inAlt = true))
      if (arms.contains(Lit(true))) Seq.empty
      else Seq(arms.filterNot(_ == Lit(false))
        .reduceOption((x, y) => Bin(BinOp.Or, x, y): Expr)
        .getOrElse(Lit(false)))
    } else (lbl.label.toSeq ++ lbl.extras)
      .map(one(_, inAlt = false)).filterNot(_ == Lit(true))
  }

  /**
   * Multi-relationship quantified path pattern group (round 13):
   * `((a)-[:R]->(b)-[:S]->(c)){m,n}` — the chain composes into ONE
   * synthetic (src, dst) edge frame (interior labels / inline maps /
   * the group WHERE applied while composing; a repeated node alias
   * inside the group becomes an equality, supporting cycles), and the
   * quantifier then rides the ordinary [*lo..hi] unroll over the
   * composite verb. Repetitions chain on the juncture node exactly as
   * Cypher 5 defines.
   *
   * Scale shape: the composite is built ONCE before any unroll — each
   * hop joins a slim key-projected edge frame; node frames join only
   * when the predicate (or a declared sub-label) reads them. At 100 TB
   * the composite frame is the same asymptotic size as the narrowest
   * hop after filters, and the unroll scans IT per repetition instead
   * of re-joining the chain per hop.
   *
   * Relationship uniqueness (round 14 — exact per-edge contract):
   *  - WITHIN one repetition, hops sharing an edge definition get a
   *    same-row exclusion conjunct while composing (so
   *    `((x)-[:R]->(y)<-[:R]-(z)){…}` never binds one R edge as both
   *    hops, and out-out self-loop chains cannot reuse an edge);
   *  - ACROSS repetitions, the composite frame exports each hop's
   *    underlying (src, snk) key as `__h<i>_src`/`__h<i>_snk` and the
   *    synthetic [[EdgeDef.hopKeys]] records them — the compiler's
   *    `inequalityCond` then emits pairwise per-underlying-edge
   *    inequality conjuncts between unrolled repetition copies instead
   *    of the (weaker) per-composite-row inequality.
   * Group variables (collected per-repetition lists) are not bound
   * for multi-relationship chains — the composite frame compresses
   * the hops away; SINGLE-relationship groups bind them through the
   * round-15 rel-list machinery (RelPat.listAlias, set at parse).
   */
  private def rewriteQppChain(r: RelPat, q: QppSpec, catalog: GraphCatalog,
      extra: scala.collection.mutable.Builder[(EdgeDef, DataFrame),
        Vector[(EdgeDef, DataFrame)]]): RelPat = {
    val plain = r.copy(qpp = None)
    if (r.alts.nonEmpty || q.tail.exists(_.verb.isEmpty) || r.verb.isEmpty)
      throw new CypherNotSupportedException(
        "every hop of a multi-relationship quantified path pattern " +
        "group needs exactly one explicit relationship type")
    def resolve(verb: String): EdgeDef = {
      val defs = catalog.graph.edgesByVerb(verb)
      if (defs.isEmpty) throw new CypherBindingException(
        s"quantified path pattern over '$verb': no edge of that type " +
        "in the schema")
      if (defs.size > 1) throw new CypherNotSupportedException(
        s"multi-relationship quantified group over '$verb', which " +
        "spans multiple edge definitions (" +
        defs.map(d => s"${d.fromLabel}→${d.toLabel}").mkString(", ") +
        ") — use single-definition types")
      defs.head
    }
    // hop table: (relAlias, edge, out, leftNodeAlias, rightNodeAlias)
    case class Hop(relAlias: String, e: EdgeDef, out: Boolean,
                   left: String, right: String)
    val hops: Seq[Hop] =
      Hop(q.relAlias, resolve(r.verb.get), r.dir == Direction.Out,
        q.srcAlias, q.dstAlias) +:
      q.tail.zipWithIndex.map { case (h, i) =>
        Hop(h.relAlias, resolve(h.verb.get), h.out,
          if (i == 0) q.dstAlias else q.tail(i - 1).nodeAlias,
          h.nodeAlias)
      }
    def leftLabel(h: Hop) = if (h.out) h.e.fromLabel else h.e.toLabel
    def rightLabel(h: Hop) = if (h.out) h.e.toLabel else h.e.fromLabel
    def leftKey(h: Hop) = if (h.out) h.e.srcIdColumn else h.e.sinkIdColumn
    def rightKey(h: Hop) = if (h.out) h.e.sinkIdColumn else h.e.srcIdColumn
    // juncture continuity: hop i's right schema label must be hop
    // i+1's left schema label — otherwise no node can sit between them
    hops.sliding(2).foreach {
      case Seq(h1, h2) =>
        if (rightLabel(h1) != leftLabel(h2))
          throw new CypherBindingException(
            "quantified path pattern chain mismatch: " +
            s"'${h1.e.verb}' ends at :${rightLabel(h1)} but " +
            s"'${h2.e.verb}' starts at :${leftLabel(h2)}")
      case _ =>
    }
    // declared node labels: own label folds away, a declared sub-label
    // becomes its discriminator conjunct (OR'd under alternation,
    // AND'd under intersection), a foreign label folds false in an
    // alternation and stays typed otherwise
    val declared: Seq[(String, QppLbl, NodeDef)] =
      ((q.srcAlias, q.srcLabel, catalog.graph.node(leftLabel(hops.head))) +:
        ((q.dstLabel +: q.tail.map(_.nodeLabel)).zip(hops).map {
          case (lbl, h) => (h.right, lbl, catalog.graph.node(rightLabel(h)))
        }))
    val labelConjs = declared.flatMap { case (al, lbl, nd) =>
      qppLabelConj(al, lbl, nd) }
    val predOpt = (labelConjs ++ q.pred.toSeq)
      .reduceOption((x, y) => Bin(BinOp.And, x, y))
    predOpt.foreach { pr =>
      if (Compiler.containsAgg(pr))
        throw new CypherNotSupportedException(
          "aggregate inside a quantified path pattern predicate")
    }
    // compose: first edge frame, then one equi-join per further hop on
    // the juncture key; a node alias seen twice adds an equality
    // (cycles inside the repetition)
    def edgeFrame(h: Hop): DataFrame = {
      val edf = catalog.edgeDf(h.e)
      edf.select(edf.columns.toSeq.map(cn =>
        col(cn).as(Compiler.pref(h.relAlias, cn))): _*)
    }
    var frame = edgeFrame(hops.head)
    val nodeKey = scala.collection.mutable.LinkedHashMap[String, String](
      hops.head.left -> Compiler.pref(hops.head.relAlias,
        leftKey(hops.head)),
      hops.head.right -> Compiler.pref(hops.head.relAlias,
        rightKey(hops.head)))
    hops.tail.foreach { h =>
      frame = frame.join(edgeFrame(h),
        col(nodeKey(h.left)) ===
          col(Compiler.pref(h.relAlias, leftKey(h))), "inner")
      val rk = Compiler.pref(h.relAlias, rightKey(h))
      nodeKey.get(h.right) match {
        case Some(existing) => // repeated alias = same node (cycle)
          frame = frame.where(col(existing) === col(rk))
        case None => nodeKey(h.right) = rk
      }
    }
    // relationship uniqueness WITHIN one repetition: two hops over the
    // same edge definition may not bind the same underlying edge row
    // (compared on the table's (src, snk) key — row identity is
    // direction-independent)
    for {
      i <- hops.indices; j <- (i + 1) until hops.size
      if hops(i).e.key == hops(j).e.key
    } frame = frame.where(
      col(Compiler.pref(hops(i).relAlias, hops(i).e.srcIdColumn)) =!=
        col(Compiler.pref(hops(j).relAlias, hops(j).e.srcIdColumn)) ||
      col(Compiler.pref(hops(i).relAlias, hops(i).e.sinkIdColumn)) =!=
        col(Compiler.pref(hops(j).relAlias, hops(j).e.sinkIdColumn)))
    // node frames join only when the predicate reads that alias
    val nodeOf: Map[String, NodeDef] =
      declared.map(d => d._1 -> d._3).toMap
    predOpt.foreach { pr =>
      nodeKey.foreach { case (al, keyCol) =>
        if (Compiler.refersTo(pr, al)) {
          val nd = nodeOf(al)
          val cols = (nd.idColumn +: nd.properties).distinct
          val nf = catalog.nodeDf(nd.label).select(cols.map(cn =>
            col(cn).as(Compiler.pref(al, cn))): _*)
          frame = frame.join(nf,
            col(keyCol) === col(Compiler.pref(al, nd.idColumn)), "inner")
        }
      }
    }
    val scope: Map[String, Analyzer.Binding] =
      hops.map(h => h.relAlias -> (EdgeBinding(h.e): Analyzer.Binding))
        .toMap ++
      nodeOf.map { case (al, nd) =>
        al -> (NodeBinding(nd): Analyzer.Binding) }
    val filtered = predOpt match {
      case Some(pr) =>
        val ec = new ExprCompiler(scope, frame)
        frame.where(ec.compile(pr))
      case None => frame
    }
    // export each hop's underlying edge key — the per-edge uniqueness
    // columns the compiler's cross-repetition inequality compares
    val hopKeyCols = hops.zipWithIndex.flatMap { case (h, i) =>
      Seq(col(Compiler.pref(h.relAlias, h.e.srcIdColumn))
            .as(s"__h${i}_src"),
          col(Compiler.pref(h.relAlias, h.e.sinkIdColumn))
            .as(s"__h${i}_snk"))
    }
    // chain GROUP VARIABLES (round 15): a USER-NAMED hop of a BOUNDED
    // 1+-quantified chain exports its full edge row as a struct
    // column — the per-repetition element of the group variable's
    // list (an anonymous `__pm<n>` hop stays predicate-local). Under
    // an unbounded or zero-lower-bound quantifier the names stay
    // PREDICATE-LOCAL instead (the reach lowering / zero-hop identity
    // branch keep no hop rows to read the struct from — reading one
    // outside is then the ordinary unknown-variable error).
    val bindable = r.varLength.exists { case (lo, hi) =>
      lo >= 1 && hi != Parser.Unbounded }
    val named =
      if (!bindable) Seq.empty
      else hops.zipWithIndex.filter { case (h, _) =>
        !(h.relAlias.startsWith("__pm") &&
          h.relAlias.drop(4).forall(_.isDigit))
      }
    val hopStructCols = named.map { case (h, i) =>
      val eCols = (Seq(h.e.srcIdColumn, h.e.sinkIdColumn) ++
        h.e.properties).distinct
      struct(eCols.map(c2 =>
        col(Compiler.pref(h.relAlias, c2)).as(c2)): _*)
        .as(s"__h${i}_rel")
    }
    val composite = filtered.select(
      col(nodeKey(hops.head.left)).as("__src") +:
      col(nodeKey.getOrElse(hops.last.right,
        Compiler.pref(hops.last.relAlias, rightKey(hops.last))))
        .as("__dst") +: (hopKeyCols ++ hopStructCols): _*)
    val id = nameCounter.getAndIncrement()
    val verbs = hops.map(_.e.verb).mkString("_")
    val synthVerb = s"__QC_${id}_$verbs"
    extra += ((EdgeDef(synthVerb, leftLabel(hops.head),
      rightLabel(hops.last), "__src", "__dst", Seq.empty,
      s"__qc_${id}_$verbs",
      hopKeys = hops.zipWithIndex.map { case (h, i) =>
        (h.e.key, s"__h${i}_src", s"__h${i}_snk") },
      hopLists = named.map { case (h, i) =>
        (h.relAlias, s"__h${i}_rel") }), composite))
    plain.copy(verb = Some(synthVerb), dir = Direction.Out,
      alts = Seq.empty)
  }
}
