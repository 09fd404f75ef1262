package graft.cypher

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.DataType

/**
 * Property-graph schema over relational (parquet) tables.
 *
 * Mirrors the capability surface of the reference's schema provider
 * (reference: src/Common/GraphSchema/IGraphSchemaProvider.cs:15-34,
 * NodeSchema.cs:9-19, EdgeSchema.cs:9-43) re-expressed as plain Scala
 * case classes. An edge type is identified by the (fromLabel, verb,
 * toLabel) triple, not verb alone (reference: EdgeSchema.cs:13-16).
 *
 * Backing storage is one DataFrame per entity — a parquet file, a temp
 * view, or any DataFrame the caller supplies. Multiple entities may be
 * views over the same table (e.g. an edge is any table exposing a
 * source-id and sink-id column).
 */
final case class NodeDef(
    label: String,
    idColumn: String,
    properties: Seq[String],
    table: String,
    /** Declared property types (reference: EntityProperty.cs:13-29
      * carries a .NET DataType per property). Empty = trust the backing
      * schema; declared entries are validated against the backing table
      * at bind time. */
    propertyTypes: Map[String, DataType] = Map.empty,
    /** Schema-declared SECONDARY labels (extension; the reference's
      * schema model carries a `Label` property role —
      * EntityProperty.cs:13-29 — but its visitor rejects multi-label
      * patterns, CypherVisitor.cs:1119-1127): sub-label name →
      * (discriminator property, required value). A pattern
      * `(n:Primary:Sub)` lowers to a WHERE conjunct
      * `n.property = value` on the primary's table — same table, one
      * discriminator, no second scan. The discriminator must be one of
      * `properties`. */
    subLabels: Map[String, (String, Any)] = Map.empty)

final case class EdgeDef(
    verb: String,
    fromLabel: String,
    toLabel: String,
    srcIdColumn: String,
    sinkIdColumn: String,
    properties: Seq[String],
    table: String,
    propertyTypes: Map[String, DataType] = Map.empty,
    /** Composite-QPP-chain provenance (round 14): for a synthetic edge
      * composed from a multi-relationship quantified group, one entry
      * per underlying hop — (underlying edge key, composite-frame src
      * column, sink column). Empty for ordinary edges. Drives Cypher's
      * PER-EDGE relationship uniqueness across repetitions: the
      * compiler's inequality conjuncts compare these hop keys instead
      * of the composite (src, dst) row. */
    hopKeys: Seq[((String, String, String), String, String)] = Seq.empty,
    /** Chain-QPP GROUP VARIABLES (round 15): for a synthetic
      * composite edge whose user named a hop (`((a)-[r:R]->(b)-[s:S]
      * ->(c)){m,n}`), one entry per named hop — (group variable name,
      * composite-frame STRUCT column carrying that hop's full edge
      * row). The var-length unroll repeats the composite; the
      * analyzer collects the repetition aliases per group variable
      * and the compiler materializes `r` as the array of the struct
      * column across repetitions (task-1 rel-list machinery with a
      * struct-column element source). Empty for ordinary edges. */
    hopLists: Seq[(String, String)] = Seq.empty,
    /** Optional per-ROW key column (round 15; VERDICT-r14 #4): a
      * physical column that discriminates PARALLEL rows of this verb
      * on one (src, sink) pair — e.g. a surrogate id or sequence
      * number a map-keyed MERGE pipeline stamps. When declared,
      * `elementId(r)` appends it, restoring Neo4j's per-relationship
      * uniqueness under parallel edges; without it the documented
      * (verb, src, sink) collision stands. The column reads like any
      * declared column (keys()/properties() include it). */
    rowKeyColumn: Option[String] = None) {
  def key: (String, String, String) = (fromLabel, verb, toLabel)
}

final case class GraphSchema(nodes: Seq[NodeDef], edges: Seq[EdgeDef]) {
  private val nodeByLabel: Map[String, NodeDef] =
    nodes.map(n => n.label -> n).toMap
  // sub-label sanity: a secondary label may not shadow a primary label,
  // and its discriminator must be a declared property of its owner
  nodes.foreach { n =>
    n.subLabels.foreach { case (sl, (prop, _)) =>
      if (nodeByLabel.contains(sl))
        throw new CypherBindingException(
          s"sub-label '$sl' of node '${n.label}' shadows a primary label")
      if (!n.properties.contains(prop) && prop != n.idColumn)
        throw new CypherBindingException(
          s"sub-label '$sl' of node '${n.label}': discriminator '$prop' " +
          "is not a declared property")
    }
  }
  private val edgeByTriple: Map[(String, String, String), EdgeDef] =
    edges.map(e => e.key -> e).toMap

  def node(label: String): NodeDef =
    nodeByLabel.getOrElse(label,
      throw new CypherBindingException(s"Unknown node label: $label"))

  def nodeOpt(label: String): Option[NodeDef] = nodeByLabel.get(label)

  def edge(from: String, verb: String, to: String): Option[EdgeDef] =
    edgeByTriple.get((from, verb, to))

  /** All edge defs with the given verb (any endpoint labels). */
  def edgesByVerb(verb: String): Seq[EdgeDef] =
    edges.filter(_.verb == verb)
}

/** Resolves an entity's backing table to a DataFrame.
 *  `dir` is the dataset directory (e.g. /root/testdata/sf0.01). */
final class GraphCatalog(
    schema: GraphSchema,
    loader: String => DataFrame) {

  /** Declared-vs-backing type check (reference raises a binding error on
    * schema/storage divergence instead of reading through it). Declared
    * decimal accepts any backing precision/scale; everything else must
    * match exactly — an undeclared widening (int declared, long stored)
    * is a real schema drift signal at 100 TB, not a convenience. */
  private def validated(df: DataFrame, kind: String, name: String,
                        declared: Map[String, DataType]): DataFrame = {
    declared.foreach { case (p, t) =>
      df.schema.fields.find(_.name == p) match {
        case None => throw new CypherBindingException(
          s"$kind '$name': declared property '$p' is missing from the backing table")
        case Some(f) =>
          val ok = (t, f.dataType) match {
            case (_: org.apache.spark.sql.types.DecimalType,
                  _: org.apache.spark.sql.types.DecimalType) => true
            case (a, b) => a == b
          }
          if (!ok) throw new CypherBindingException(
            s"$kind '$name': property '$p' declared ${t.simpleString} " +
            s"but the backing table stores ${f.dataType.simpleString}")
      }
    }
    df
  }

  def nodeDf(label: String): DataFrame = {
    val n = schema.node(label)
    validated(loader(n.table), "node", label, n.propertyTypes)
  }
  def edgeDf(e: EdgeDef): DataFrame =
    validated(loader(e.table), "edge", e.verb, e.propertyTypes)
  def graph: GraphSchema = schema

  /** Same catalog plus SYNTHETIC edges bound to in-memory DataFrames —
    * the compiler's hook for data-dependent rewrites (unbounded
    * variable-length lowers to a reachability frame spliced in as a
    * one-hop edge). Synthetic table names live in the reserved `__`
    * namespace so they can never shadow a real table. */
  def withExtraEdges(extra: Seq[(EdgeDef, DataFrame)]): GraphCatalog =
    if (extra.isEmpty) this
    else {
      val byTable = extra.map(x => x._1.table -> x._2).toMap
      new GraphCatalog(
        schema.copy(edges = schema.edges ++ extra.map(_._1)),
        t => byTable.getOrElse(t, loader(t)))
    }
}

object GraphCatalog {
  // One DataFrame (lazy logical plan) per (session, path): avoids
  // re-reading parquet footers / re-inferring schemas on every query
  // against the same tables. Keyed by session so a stopped session's
  // plans are never reused; bounded so a long-lived service iterating
  // many sessions/datasets can't grow it without limit.
  private val MaxCacheEntries = 256
  private val dfCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Session-cached lazy DataFrame for a parquet path. */
  def cachedParquet(spark: SparkSession, path: String): DataFrame = {
    if (dfCache.size > MaxCacheEntries) {
      // evict dead sessions' entries first; drop one arbitrary entry if
      // everything is still live (never wipe the hot working set)
      val it = dfCache.keySet.iterator
      var evicted = false
      while (it.hasNext) {
        val k = it.next()
        if (k._1.sparkContext.isStopped) { it.remove(); evicted = true }
      }
      if (!evicted) {
        val i2 = dfCache.keySet.iterator
        if (i2.hasNext) { i2.next(); i2.remove() }
      }
    }
    dfCache.computeIfAbsent((spark, path), _ => spark.read.parquet(path))
  }

  /** Catalog whose tables are `<dir>/<table>.parquet`. */
  def parquet(schema: GraphSchema, spark: SparkSession, dir: String): GraphCatalog =
    new GraphCatalog(schema, t => cachedParquet(spark, s"$dir/$t.parquet"))
}

class CypherException(msg: String) extends RuntimeException(msg)
/** Query constructs outside the supported subset
 *  (reference: TranspilerNotSupportedException). */
class CypherNotSupportedException(msg: String)
  extends CypherException(s"Not supported: $msg")
/** Schema binding failures (reference: TranspilerBindingException). */
class CypherBindingException(msg: String) extends CypherException(msg)
/** Lexer/parser failures (reference: TranspilerSyntaxErrorException). */
class CypherSyntaxException(msg: String) extends CypherException(msg)
