package graft.cypher

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import ast._

/**
 * Var-length relationship type alternation `[:A|B*lo..hi]` / `[:A|B*]`
 * → synthetic UNION-VERB desugar (round 17; previously the bounded
 * form expanded one branch per verb — single-verb chains only — and
 * the unbounded form was a typed rejection).
 *
 * Neo4j lets EVERY traversed hop independently match any alternative,
 * so a chain may MIX verbs (reference scope: the reference rejects all
 * var-length, CypherVisitor.cs:2035-2039 — this whole surface is an
 * extension). The lowering makes mixing the one-frame case: the
 * alternatives' edge definitions are pooled and grouped by
 * (fromLabel, toLabel); each group becomes ONE synthetic edge
 * definition (`__ALT_<n>` verb) whose frame is the UNION ALL of the
 * group's frames over the merged, null-filled property namespace (the
 * round-8 bound-alternation namespace contract, now per hop). The
 * rewritten rel carries the synthetic verb alone, so everything
 * downstream — bounded branch unrolling, the unbounded reach /
 * k-level / walk-enumeration lowerings, witnesses, rel-list
 * variables, `[*0..]`, path selectors — composes unchanged. An edge
 * row present under two alternatives is two parallel relationships
 * (two distinct paths — the q158 multiplicity contract; witness rel
 * snapshots keep the deterministic min-struct rule).
 *
 * Contract (typed rejections):
 *  - a group's definitions must agree on the src/sink id COLUMN NAMES
 *    (the bound single-hop alternation rule — witness rel structs key
 *    their endpoint fields by name);
 *  - a property stored under two different types across alternatives
 *    cannot merge (the pathShapes mixing rule).
 *
 * Scale posture: the union frame is a UNION ALL of the member scans —
 * no shuffle is added, per-member column pruning still reaches each
 * parquet scan, and the downstream reach/k-level row guards see the
 * pooled edge count (the alternation can only grow the frame
 * linearly in the number of alternatives).
 */
private[cypher] object AltRel {

  /** Process-global counter (the Reach/HopPred convention) so nested
    * rewrites can never collide on a synthetic verb/table name. */
  private val nameCounter = new AtomicLong(0)

  private def needs(r: RelPat): Boolean =
    r.varLength.isDefined && r.alts.nonEmpty && r.qpp.isEmpty

  def rewrite(matches: Seq[MatchClause], catalog: GraphCatalog)
      : (Seq[MatchClause], GraphCatalog) = {
    if (!matches.exists(_.parts.exists(_.rels.exists(needs))))
      return (matches, catalog)
    val extra = Vector.newBuilder[(EdgeDef, DataFrame)]
    val out = matches.map { m =>
      m.copy(parts = m.parts.map { pp =>
        pp.copy(rels = pp.rels.map { r =>
          if (!needs(r)) r
          else {
            val verbs = (r.verb.toList ++ r.alts).distinct
            val defs = verbs.flatMap { v =>
              val ds = catalog.graph.edgesByVerb(v)
              if (ds.isEmpty)
                throw new CypherBindingException(
                  s"variable-length over '$v': no edge of that type " +
                  "in the schema")
              ds
            }
            val id = nameCounter.getAndIncrement()
            val synthVerb = s"__ALT_${id}_${verbs.mkString("_")}"
            defs.groupBy(e => (e.fromLabel, e.toLabel)).toSeq
              .sortBy(_._1).foreach { case ((fl, tl), ds) =>
                extra += build(synthVerb, fl, tl, ds, catalog, id)
              }
            r.copy(verb = Some(synthVerb), alts = Seq.empty)
          }
        })
      })
    }
    (out, catalog.withExtraEdges(extra.result()))
  }

  /** One label pair's synthetic definition: the UNION ALL of the
    * member frames over the merged null-filled property namespace. */
  private def build(synthVerb: String, fl: String, tl: String,
      ds: Seq[EdgeDef], catalog: GraphCatalog, id: Long)
      : (EdgeDef, DataFrame) = {
    val srcC = ds.head.srcIdColumn
    val dstC = ds.head.sinkIdColumn
    ds.foreach { e =>
      if (e.srcIdColumn != srcC || e.sinkIdColumn != dstC)
        throw new CypherNotSupportedException(
          "variable-length alternation over " +
          s"'${ds.map(_.verb).distinct.mkString("|")}' ($fl→$tl): the " +
          "definitions disagree on src/sink id columns " +
          s"('${e.srcIdColumn}'/'${e.sinkIdColumn}' vs '$srcC'/'$dstC')" +
          " — witness structs key endpoint fields by name")
    }
    // merged property namespace (first-appearance order); a property
    // stored under two types across alternatives is typed
    val frames = ds.map(e => (e, catalog.edgeDf(e)))
    val types = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    frames.foreach { case (e, df) =>
      (Seq(srcC, dstC) ++ e.properties).distinct.foreach { c =>
        val t = df.schema(c).dataType
        types.get(c) match {
          case Some(t0) if t0 != t =>
            throw new CypherNotSupportedException(
              s"variable-length alternation: property '$c' is stored " +
              s"as ${t0.simpleString} and ${t.simpleString} across " +
              "alternatives — one merged namespace cannot cover both")
          case _ => types(c) = t
        }
      }
    }
    val cols = types.keys.toSeq
    val union = frames.map { case (e, df) =>
      val own = (Seq(srcC, dstC) ++ e.properties).distinct.toSet
      df.select(cols.map { c =>
        (if (own(c)) col(c) else lit(null).cast(types(c))).as(c)
      }: _*)
    }.reduce(_ unionByName _)
    val props = cols.filterNot(c => c == srcC || c == dstC)
    (EdgeDef(synthVerb, fl, tl, srcC, dstC, props,
      s"__alt_${id}_${fl}_$tl"), union)
  }
}
