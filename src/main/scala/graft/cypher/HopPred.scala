package graft.cypher

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import ast._
import Analyzer.EdgeBinding

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
    matches.exists(_.parts.exists(_.rels.exists(_.hopPred.isDefined)))

  /** Rewrites every hop-predicated var-length rel to the same pattern
    * over a synthetic verb backed by the filtered edge frame. No-op
    * (same instances) when nothing carries a predicate. */
  def rewrite(matches: Seq[MatchClause], catalog: GraphCatalog)
      : (Seq[MatchClause], GraphCatalog) = {
    if (!hasHopPred(matches)) return (matches, catalog)
    val extra = Vector.newBuilder[(EdgeDef, DataFrame)]
    val out = matches.map { m =>
      m.copy(parts = m.parts.map { pp =>
        pp.copy(rels = pp.rels.map { r =>
          r.hopPred match {
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
}
