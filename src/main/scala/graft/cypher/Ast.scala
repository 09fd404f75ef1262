package graft.cypher

/**
 * AST for the openCypher subset the reference accepts.
 *
 * Shape-equivalent to the reference's AST (reference:
 * src/openCypherParser/AST — QueryNode/PartialQueryNode/SingleQueryNode,
 * QueryExpression*), reduced to immutable Scala case classes. Constructs
 * the reference rejects (SURVEY.md §2.6) are rejected in our parser or
 * analyzer rather than modeled here.
 */
object ast {

  // ----- expressions --------------------------------------------------

  sealed trait Expr

  /** Literal value. `value` is null for the NULL literal. */
  final case class Lit(value: Any) extends Expr

  /** `alias` or `alias.prop`; prop=None means a bare entity/value ref. */
  final case class Ref(alias: String, prop: Option[String]) extends Expr

  /** Type predicate `x IS [NOT] :: TYPE` (round 13, extension;
   *  Cypher 5 / GQL). Decided against the STATIC column type — the
   *  engine's values are schema-typed, so the check folds to a
   *  constant per expression, except the null row: a NULL conforms to
   *  every type, so both the positive and negated forms read true on
   *  null (Neo4j's contract). */
  final case class TypeIs(expr: Expr, neg: Boolean, tpe: String)
    extends Expr

  /** Label predicate `n:Label[:Label2 …]` as a boolean expression
   *  (round 13, extension; Neo4j's everyday WHERE idiom). Lowered
   *  against the STATIC schema: the node's own label folds to true, a
   *  declared sub-label becomes its discriminator equality, any other
   *  label folds to false (a row of one table can never carry another
   *  table's label — Neo4j's dynamic check, decided at compile time).
   *  Multiple labels conjoin. */
  final case class HasLabel(alias: String, labels: Seq[String])
    extends Expr

  sealed trait BinOp
  object BinOp {
    case object Add extends BinOp;  case object Sub extends BinOp
    case object Mul extends BinOp;  case object Div extends BinOp
    case object Mod extends BinOp;  case object Pow extends BinOp
    case object And extends BinOp;  case object Or  extends BinOp
    case object Xor extends BinOp
    case object Lt  extends BinOp;  case object Le  extends BinOp
    case object Gt  extends BinOp;  case object Ge  extends BinOp
    case object Eq  extends BinOp;  case object Neq extends BinOp
    case object In  extends BinOp;  case object Regex extends BinOp
  }
  final case class Bin(op: BinOp, l: Expr, r: Expr) extends Expr

  final case class Not(e: Expr) extends Expr
  final case class Neg(e: Expr) extends Expr        // unary minus
  final case class IsNull(e: Expr, not: Boolean) extends Expr
  final case class ListLit(items: Seq[Expr]) extends Expr

  /** Scalar function call (registry mirrors reference
   *  src/openCypherParser/Common/Function.cs:13-46). */
  final case class Func(name: String, args: Seq[Expr]) extends Expr

  /** Aggregation function (reference:
   *  src/openCypherParser/Common/AggregationFunction.cs:11-85).
   *  `percentile` is set only for percentileCont/percentileDisc — the
   *  reference parses these but throws at render (SQLRenderer.cs:659-664);
   *  we implement them. */
  final case class Agg(name: String, distinct: Boolean, arg: Option[Expr],
                       percentile: Option[Double] = None) extends Expr

  /** Searched CASE only; `CASE <expr> WHEN` is rejected at parse time
   *  (reference: CypherVisitor.cs:1776-1781). */
  final case class CaseExpr(whens: Seq[(Expr, Expr)], otherwise: Option[Expr])
    extends Expr

  // ----- list surface (flagged EXTENSIONS — the reference rejects
  // comprehensions/quantifiers, CypherVisitor.cs via §2.6; these lower
  // to Spark higher-order functions, staying in codegen) ---------------

  /** `[v IN list WHERE where | proj]` — filter and/or transform. */
  final case class ListComp(variable: String, list: Expr,
                            where: Option[Expr], proj: Option[Expr])
    extends Expr

  /** `any/all/none/single(v IN list WHERE pred)`. */
  final case class QuantPred(kind: String, variable: String, list: Expr,
                             pred: Expr) extends Expr

  /** `reduce(acc = init, v IN list | step)`. */
  final case class ReduceExpr(acc: String, init: Expr, variable: String,
                              list: Expr, step: Expr) extends Expr

  /** `xs[i]` (0-based, negative = from end) or `xs[a..b]` (end-exclusive,
   *  open ends allowed). `isSlice` disambiguates `xs[i]` from `xs[i..]`. */
  final case class ListIndex(list: Expr, from: Option[Expr], to: Option[Expr],
                             isSlice: Boolean) extends Expr

  /** Postfix dot access `expr.key` on a VALUE expression — a flagged
   *  EXTENSION generalizing Neo4j's map/temporal dot access beyond an
   *  alias root: `properties(n).name`, `{a: {b: 1}}.a.b`,
   *  `collect(x)[0].f`, `m.when.year`. Dispatch is static at compile
   *  time on the operand's inferred type: struct → field read,
   *  date/timestamp → temporal component, day-time interval →
   *  clock component. The reference rejects every nested lookup
   *  (CypherVisitor.cs:2040-2044). */
  final case class DotAccess(expr: Expr, key: String) extends Expr

  /** Rows of a schema procedure (`CALL db.labels()` …) — a flagged
   *  EXTENSION. The graph schema is static configuration, so the
   *  procedure's result is a compile-time LITERAL array of structs;
   *  the parser emits this leaf only as an UNWIND source and the
   *  compiler expands it against the catalog (no scan, no shuffle —
   *  schema-sized). The reference rejects CALL outright
   *  (CypherVisitor.cs — procedures). */
  final case class ProcRows(proc: String) extends Expr

  /** `EXISTS((a)-[:R]->(b))` pattern predicate, or the subquery form
   *  `EXISTS { [MATCH] pattern[, pattern…] [WHERE pred] }` — a flagged
   *  EXTENSION (the reference rejects EXISTS outright, §2.6). Only
   *  legal as a top-level (optionally NOT-ed) AND-conjunct of a MATCH
   *  WHERE; the compiler lowers it to a left-semi / left-anti join
   *  correlated on the node aliases shared with the outer scope — a
   *  join, not a per-row value, hence the placement restriction. The
   *  inner WHERE sees the subquery's own bindings (shared aliases read
   *  the subquery's copy — equivalent under unique-id correlation). */
  final case class ExistsPat(parts: Seq[PatternPart], where: Option[Expr])
    extends Expr

  /** Map literal `{k: expr, …}` — a flagged EXTENSION (the reference
   *  rejects map literals, §2.6). Lowers to a named struct; fields
   *  read back with ordinary dot access (`m.k`). */
  final case class MapLit(fields: Seq[(String, Expr)]) extends Expr

  /** Map projection `alias {.prop, key: expr, var, .*}` (round 13) — a
   *  flagged EXTENSION (Neo4j's everyday RETURN idiom; the reference
   *  has no map support at all, CypherVisitor.cs:2040-2044). The
   *  parser desugars `.prop` to `(prop, Ref(alias, Some(prop)))` and a
   *  bare variable selector `v` to `(v, Ref(v, None))`; `star` records
   *  `.*` (all declared properties / map fields — expanded at compile
   *  time where the schema is known). Lowers to a named struct like
   *  [[MapLit]]; a NULL entity/map projects to NULL, not a struct of
   *  nulls. */
  final case class MapProjection(alias: String, items: Seq[(String, Expr)],
                                 star: Boolean) extends Expr

  /** Pattern comprehension `[(a)-[:R]->(b) [WHERE pred] | proj]` — a
   *  flagged EXTENSION. Collects `proj` over every match of the
   *  pattern, correlated per outer row on the node aliases shared with
   *  the outer scope (no match → empty list). Only legal inside
   *  WITH/RETURN projection items: the compiler lowers it to a
   *  group-by + collect_list + left join, not a per-row value. The
   *  WHERE and projection see the subquery's own bindings. */
  final case class PatternComp(parts: Seq[PatternPart], where: Option[Expr],
                               proj: Expr,
      /** per-list paging (round 13, set only by COLLECT { } with a
       *  subquery tail): sort items over the subquery's bindings, a
       *  DISTINCT-before-ordering flag, and SKIP/LIMIT row bounds —
       *  lowered to a per-correlation-key window rank filter
       *  (WindowGroupLimit) before the collect. */
      ordering: Seq[SortItem] = Seq.empty,
      distinct: Boolean = false,
      skip: Option[Long] = None,
      limit: Option[Long] = None) extends Expr

  // ----- patterns -----------------------------------------------------

  sealed trait Direction
  object Direction {
    case object Out  extends Direction   // (a)-[r]->(b)
    case object In   extends Direction   // (a)<-[r]-(b)
    case object Both extends Direction   // (a)-[r]-(b)
  }

  /** `extraLabels` carries the 2nd..nth labels of a multi-label pattern
   *  `(n:A:B)` — a flagged EXTENSION (the reference rejects,
   *  CypherVisitor.cs:1119-1127); the analyzer resolves the set to the
   *  ONE schema node whose declared sub-labels back the rest and lowers
   *  each extra to a discriminator WHERE conjunct. */
  /** `labelAlts` carries the alternatives of a label alternation
   *  `(n:A|B)` — a flagged EXTENSION: the analyzer requires every
   *  alternative to resolve to ONE owning schema node (a primary
   *  label and/or its declared sub-labels — same table, same id
   *  namespace) and lowers the set to an OR of discriminator
   *  conjuncts; labels backed by different tables are a typed
   *  rejection (their ids live in different namespaces, so one
   *  binding cannot range over both). Mutually exclusive with
   *  `extraLabels` (`:A:B` intersection vs `:A|B` union). */
  final case class NodePat(alias: Option[String], label: Option[String],
                           extraLabels: Seq[String] = Seq.empty,
                           labelAlts: Seq[String] = Seq.empty,
      /** negated labels `!L` (round 13; Cypher 5 label expressions):
       *  resolved against the node's primary label — own label folds
       *  false, a declared sub-label negates its discriminator (an
       *  absent property = not labeled), a foreign label drops. */
                           negLabels: Seq[String] = Seq.empty)
  /** `varLength = Some((lo, hi))` marks a bounded variable-length
   *  relationship `[*lo..hi]` — a flagged EXTENSION (the reference
   *  rejects var-length, CypherVisitor.cs:2035-2039); the compiler
   *  unrolls it into one fixed chain per length, UNION ALL'd.
   *  `alts` carries the extra verbs of a type alternation `[:A|B]`
   *  (also an EXTENSION) — expanded to one branch per verb, UNION
   *  ALL'd through the same machinery; anonymous rels only (a bound
   *  variable would need one property namespace across different edge
   *  tables). */
  /** `hopPred` (round 10, var-length only): a PER-HOP predicate from an
   *  inline property map `[:T* {p: v}]` (every traversed relationship
   *  must satisfy the equalities — Neo4j's var-length map semantics)
   *  or an inline `[r:T* WHERE r.p > 0]` (the alias names ONE hop and
   *  is consumed by the predicate — it is NOT bound downstream, a pair
   *  row aggregates many hops). Lowered by [[graft.cypher.HopPred]] to
   *  a pre-filtered edge frame behind a synthetic verb, so bounded
   *  unrolling, reach BFS, shortestPath and allShortestPaths all
   *  compose unchanged. */
  /** Quantified path pattern `((a)-[r:R]->(b) WHERE pred){m,n}`
   *  (round 13; Cypher 5 / GQL — the modern replacement for
   *  `[*m..n]`). The group's inline node/rel predicates and the
   *  group-level WHERE conjoin into `pred`, applied PER REPETITION
   *  over the hop's (src, rel, dst) row — an interior node is `dst`
   *  of one repetition and `src` of the next, so predicates on either
   *  group variable apply to it, exactly GQL's semantics. Labels on
   *  the group nodes validate against the verb's endpoints (declared
   *  sub-labels become discriminator conjuncts). Lowered by
   *  [[graft.cypher.HopPred]] to a filtered edge frame behind a
   *  synthetic verb; group variables bind NOTHING downstream. */
  /** One additional hop of a multi-relationship quantified path
   *  pattern group (round 13): `((a)-[r:R]->(b)-[s:S]->(c)){m,n}` —
   *  hop 2..N each adds a relationship and its right-hand node. */
  /** Labels declared on one quantified-group node (round 13):
   *  `label` + `extras` is the intersection form `:A:B`, `alts` the
   *  alternation form `:A|B` (mutually exclusive, parser-enforced).
   *  Lowered statically like [[HasLabel]]: own label folds true, a
   *  declared sub-label becomes its discriminator equality, a foreign
   *  label folds false inside an alternation (and stays the typed
   *  mismatch error as a bare/intersected label). */
  final case class QppLbl(label: Option[String],
                          extras: Seq[String] = Seq.empty,
                          alts: Seq[String] = Seq.empty)
  final case class QppHop(relAlias: String, verb: Option[String],
                          out: Boolean, nodeAlias: String,
                          nodeLabel: QppLbl)
  final case class QppSpec(srcAlias: String, relAlias: String,
                           dstAlias: String,
                           srcLabel: QppLbl,
                           dstLabel: QppLbl,
                           pred: Option[Expr],
      /** hops 2..N of a multi-relationship group; empty = the
       *  single-relationship form. The compiler composes the chain
       *  into ONE synthetic (src, dst) edge frame — predicates and
       *  interior labels applied while composing — and quantifies
       *  that composite with the ordinary [*lo..hi] machinery. */
                           tail: Seq[QppHop] = Seq.empty)
  final case class RelPat(alias: Option[String], verb: Option[String],
                          dir: Direction,
                          varLength: Option[(Int, Int)] = None,
                          alts: Seq[String] = Seq.empty,
                          hopPred: Option[(String, Expr)] = None,
                          qpp: Option[QppSpec] = None,
      /** Rel-LIST variable of a BOUNDED var-length rel (round 15;
       *  Neo4j's `(a)-[rs:R*1..3]->(b)` binds `rs` to the list of
       *  traversed relationships). Var-length expansion copies it
       *  onto every generated hop (and the zero-hop marker), marking
       *  which hops belong to the list; the analyzer collects them
       *  per branch into a rel-only witness entry and the compiler
       *  binds the alias to the materialized array<struct> VALUE.
       *  None on fixed-length rels and on the per-hop-WHERE form
       *  (there the alias names one traversed hop instead —
       *  the round-10 extension contract). */
                          listAlias: Option[String] = None,
      /** GQL group NODE variables (round 15, late): for a
       *  single-relationship quantified group `((x)-[r:R]->(y)){m,n}`
       *  with USER-NAMED endpoints, `x`/`y` bind the per-path lists
       *  of the repetitions' left/right nodes — the same two-level
       *  contract as the rel group variable (inside the group
       *  predicate the names are per-repetition). Ride the hop copies
       *  like [[listAlias]]; the analyzer collects the hop endpoint
       *  node aliases per branch into node-only witness entries. */
                          srcListAlias: Option[String] = None,
                          dstListAlias: Option[String] = None)
  /** Linear pattern: nodes.size == rels.size + 1. `pathVar` names the
   *  pattern's path (`p = (...)`) — a flagged EXTENSION (the reference
   *  rejects named paths, CypherVisitor.cs:998-1002) supporting exactly
   *  `length(p)`/`size(p)` (the relationship count, per-branch under
   *  var-length expansion); any other use of the variable is rejected.
   *  Only top-level MATCH patterns may carry one. */
  /** `shortest = true` wraps the part in `shortestPath(...)` (extension):
   *  the var-length branch union reduces to the MINIMUM relationship
   *  count per distinct binding of everything else in scope — which also
   *  collapses same-length paths through different (anonymous) interior
   *  nodes to one row, Cypher's one-shortest-path-per-binding contract.
   *  Requires a var-length rel inside (the only useful form) and must be
   *  its clause's sole pattern.
   *
   *  `allShortest = true` is `allShortestPaths(...)` (extension): keep
   *  EVERY row of the branch union whose relationship count equals the
   *  per-binding minimum — one row per minimal path, so same-length
   *  paths through different interior nodes stay distinct rows (the
   *  plain var-length match convention). Same restrictions as
   *  `shortest`. */
  /** GQL path selector (round 14; Cypher 5.21 `SHORTEST k` /
    * `SHORTEST k GROUPS` / `ANY k` prefixes). The k = 1 spellings map
    * onto the existing booleans at parse (`ANY SHORTEST`/`SHORTEST 1`
    * → shortest, `ALL SHORTEST`/`SHORTEST 1 GROUPS` → allShortest);
    * only k > 1 selectors survive to the compiler, which ranks the
    * bounded branch union per binding. kind ∈ shortest | groups | any. */
  final case class PathSelector(kind: String, k: Int)

  final case class PatternPart(nodes: Seq[NodePat], rels: Seq[RelPat],
                               pathVar: Option[String] = None,
                               shortest: Boolean = false,
                               allShortest: Boolean = false,
                               selector: Option[PathSelector] = None)

  final case class MatchClause(
      parts: Seq[PatternPart],
      optional: Boolean,
      where: Option[Expr])

  // ----- query structure ----------------------------------------------

  final case class RetItem(expr: Expr, alias: Option[String])
  /** `nullsFirst`: Cypher 2025 `NULLS FIRST|LAST` (round 14) — None
    * keeps the engine default (Spark: nulls first ASC, last DESC). */
  final case class SortItem(expr: Expr, desc: Boolean,
                            nullsFirst: Option[Boolean] = None)

  /** WITH ... [ORDER BY ... LIMIT ...] [WHERE ...] or terminal RETURN.
   *  `skip` is a flagged EXTENSION (the reference has no oC_Skip
   *  visitor, CypherVisitor.cs:2076-2086) — same int32 contract as
   *  LIMIT, lowered to `Dataset.offset`. `star` is the flagged
   *  EXTENSION `WITH * [, item…]` / `RETURN *` — expanded by the
   *  compiler to every named in-scope variable (alphabetical), before
   *  any explicit items; explicit names shadow the expansion. */
  final case class Projection(
      items: Seq[RetItem],
      distinct: Boolean,
      orderBy: Seq[SortItem],
      limit: Option[Long],
      where: Option[Expr],   // post-WITH WHERE; never set on RETURN
      skip: Option[Long] = None,
      star: Boolean = false,
      /** True when this projection desugared from a LET clause
        * (round 14): items must bind NEW names — Cypher 2025 LET
        * forbids redefining an existing variable, unlike WITH's
        * masking. */
      fromLet: Boolean = false)

  /** `CALL { [WITH imports] subquery }` — a flagged EXTENSION.
   *  `imports` are node variables from the outer scope; the compiler
   *  threads them through every subquery projection as grouping keys
   *  and joins the result back on their unique ids, which reproduces
   *  Neo4j's per-invocation semantics in one flat plan. Empty imports
   *  = uncorrelated (runs once, cross-joins the incoming rows). */
  /** `optional` (round 13; Neo4j 5.24 OPTIONAL CALL): a zero-row
   *  subquery result null-fills instead of dropping the outer row —
   *  LEFT-join semantics on both the correlated and uncorrelated
   *  forms. */
  final case class CallSub(imports: Seq[String], sub: Query,
                           optional: Boolean = false)

  /** One query part: MATCH clauses followed by a WITH (or the terminal
   *  RETURN for the last part). Mirrors reference PartialQueryNode.
   *  `unwinds` — flagged EXTENSION (reference roadmap README.md:57):
   *  `UNWIND <listExpr> AS <alias>` clauses between the matches and the
   *  projection, each lowered to `explode`. `calls` — flagged
   *  EXTENSION: CALL subqueries between the matches and the unwinds. */
  final case class QueryPart(matches: Seq[MatchClause], proj: Projection,
                             unwinds: Seq[(Expr, String)] = Seq.empty,
                             calls: Seq[CallSub] = Seq.empty)

  sealed trait Query
  final case class SingleQuery(parts: Seq[QueryPart]) extends Query

  /** `MERGE (n:L {idProp: expr}) [ON MATCH SET n.p = e, …]
   *  [ON CREATE SET n.p = e, …]` — a flagged EXTENSION (the reference
   *  is read-only by design, CypherVisitor.cs:486-489,887-890; parity
   *  mode keeps the rejection). The result is a NEW SNAPSHOT DataFrame of the
   *  target node's table (never a mutation): the preceding parts'
   *  rows form a change feed keyed by the node's unique id — the
   *  property map must bind EXACTLY the id property (the graph
   *  model's identity; anything else belongs in ON CREATE SET) — and
   *  the lowering is [[graft.ops.ChangeData.applyChangeFeed]]'s
   *  shape: deterministic per-key winner, matched rows get the ON
   *  MATCH assignments (rhs may read the old `n`), absent keys insert
   *  a fresh row from ON CREATE SET, untouched snapshot rows pass
   *  through. Terminal clause of a non-UNION query. */
  final case class MergeClause(alias: String, label: String,
      keyProp: String, keyExpr: Expr,
      onMatch: Seq[(String, Expr)], onCreate: Seq[(String, Expr)],
      /** map entries beyond the first (round 13): the whole map is the
       *  match key — the id property must appear somewhere in it; the
       *  other entries join the match condition and stamp created
       *  rows (Neo4j's match-on-map semantics, the node twin of
       *  [[MergeRelClause]]'s keyProps). */
      keyProps: Seq[(String, Expr)] = Seq.empty)

  /** Query whose terminal clause is a [[MergeClause]]; `parts` are the
   *  ordinary MATCH/WITH parts feeding it (each ends in a WITH — a
   *  trailing bare MATCH gets an implicit `WITH *`). */
  final case class MergeQuery(parts: Seq[QueryPart], merge: MergeClause)
    extends Query

  /** Terminal `SET` (extension; the reference is read-only): updates
   *  properties of ONE bound entity variable — a node or a
   *  relationship — and the query result IS the target's new snapshot
   *  (never a mutation). Matched rows take the assigned values
   *  (rhs may read the old entity and anything else in scope),
   *  untouched snapshot rows pass through; multiple pattern rows
   *  hitting the same entity reduce to one deterministic winner
   *  (greatest assigned-value struct, [[MergeClause]]'s rule).
   *  `assigns` are (property, rhs) pairs, all on `alias`. */
  /** `fullReplace` (round 11): `SET a = {…}` — Neo4j's full map
   *  replacement. The listed keys assign; EVERY other declared non-key
   *  property of the target nulls (the compiler expands the clause
   *  against the schema, so "silent nulling" becomes the explicit,
   *  documented contract). Mixing with further assignments in the
   *  same SET stays a parse rejection. */
  final case class SetClause(alias: String, assigns: Seq[(String, Expr)],
      fullReplace: Boolean = false,
      /** `SET n:Label` / `REMOVE n:Label` (round 12): labels resolved
       *  against the target node's schema-declared SUB-LABELS at
       *  compile — SET writes the discriminator value, REMOVE nulls it
       *  (conditionally: only rows currently carrying the value);
       *  anything not a declared sub-label stays a typed rejection
       *  (primary labels are table-backed). */
      setLabels: Seq[String] = Seq.empty,
      removeLabels: Seq[String] = Seq.empty)

  /** Query whose terminal clause is a [[SetClause]]. */
  final case class SetQuery(parts: Seq[QueryPart], set: SetClause)
    extends Query

  /** Terminal `DELETE` (extension): `DELETE r` over a bound
   *  relationship removes every edge row keyed by a matched
   *  (src, snk) pair from the edge snapshot; `DETACH DELETE n` over a
   *  bound node removes matched ids from the node snapshot (the
   *  companion edge snapshots are separate frames — produce them with
   *  explicit relationship DELETE queries). Plain node DELETE is a
   *  typed rejection: Neo4j's dangling-relationship check is
   *  data-dependent and this engine plans lazily. */
  final case class DeleteClause(alias: String, detach: Boolean)

  /** Query whose terminal clause is a [[DeleteClause]]. */
  final case class DeleteQuery(parts: Seq[QueryPart], del: DeleteClause)
    extends Query

  /** `[DETACH] DELETE a RETURN items` (extension, round 10): the
   *  RETURN reads the DELETED rows — the match rows whose entity key
   *  is non-null (exactly the rows the delete removes; OPTIONAL MATCH
   *  misses delete nothing and do not appear), with the entity's
   *  PRE-DELETE values (Neo4j's captured-properties read). The result
   *  is the RETURN projection, NOT the snapshot-minus rows — "show me
   *  what this deletes" as one query; the plan is the match plus a
   *  null-key filter, the snapshot is never anti-joined. */
  final case class DeleteReturnQuery(parts: Seq[QueryPart],
      del: DeleteClause, ret: Projection) extends Query

  /** `SET a.p = e, … RETURN items` (extension, round 10): mid-query
   *  SET — the RETURN reads the UPDATED entity. Scoped to a single
   *  entity and a directly-following terminal RETURN (no further
   *  WITH/MATCH parts). The result is the RETURN projection over the
   *  match rows with the entity's assigned columns replaced PER ROW
   *  (each row reads its own write; every rhs reads the OLD entity,
   *  simultaneous-assignment semantics) — NOT the snapshot union,
   *  which is what terminal [[SetQuery]] is for. */
  final case class SetReturnQuery(parts: Seq[QueryPart], set: SetClause,
      ret: Projection) extends Query

  /** `SET a.p = e, … WITH … [MATCH …] RETURN items` (extension, round
   *  11): update chaining — the pipeline CONTINUES over the per-row
   *  updated frame ([[SetReturnQuery]]'s read-back), so downstream
   *  WITH/MATCH/RETURN clauses read the query's own writes. The
   *  backing snapshot is untouched: a downstream MATCH over the SAME
   *  table re-reads the ORIGINAL store (reads-own-writes flows only
   *  through the carried frame — the documented contract; Neo4j's
   *  transactional visibility has no flat-snapshot equivalent). `rest`
   *  is the continuation starting at the WITH (or directly at the next
   *  updating keyword — implicit `WITH *`). Round 12: `rest` may
   *  itself terminate in ANOTHER updating clause (`MATCH … SET … MERGE
   *  … RETURN` ingest pipelines) — each folds over the previous
   *  clause's read-back frame; two clauses targeting the SAME backing
   *  table stay a typed rejection (one snapshot per entity). */
  final case class SetChainQuery(parts: Seq[QueryPart], set: SetClause,
      rest: Query) extends Query

  /** Update chaining for the other updating clauses (round 11, the
   *  [[SetChainQuery]] pattern): `MERGE/CREATE/DELETE … WITH …`
   *  continues the pipeline over the clause's READ-BACK frame — the
   *  post-merge entity per winner-deduped feed row, the created rows,
   *  or the pre-delete match rows respectively (exactly what the
   *  directly-following-RETURN forms read). The result is the chain's
   *  terminal RETURN; the snapshot is NOT produced (run the terminal
   *  form for it). Round 12: `rest` may terminate in another updating
   *  clause — see [[SetChainQuery]]. */
  final case class MergeChainQuery(parts: Seq[QueryPart],
      merge: MergeClause, rest: Query) extends Query
  final case class MergeRelChainQuery(parts: Seq[QueryPart],
      merge: MergeRelClause, rest: Query) extends Query
  final case class CreateChainQuery(parts: Seq[QueryPart],
      create: CreateClause, rest: Query) extends Query
  final case class CreateRelChainQuery(parts: Seq[QueryPart],
      create: CreateRelClause, rest: Query) extends Query
  final case class DeleteChainQuery(parts: Seq[QueryPart],
      del: DeleteClause, rest: Query) extends Query

  /** Terminal `CREATE (n:L {p: e, …})` (extension; completes the
   *  update triad over the reference's read-only boundary,
   *  CypherVisitor.cs:486-489; parity keeps the rejection): an
   *  UNCONDITIONAL append — every feed row (or ONE literal row for a
   *  standalone CREATE) builds a fresh node row from the property
   *  map, which MUST bind the node's id property (identity in a
   *  table-backed graph) and may bind any other declared properties;
   *  unassigned properties are null, null ids drop (no identity, no
   *  row). Unlike MERGE there is no match branch, no per-key winner
   *  and no anti-join: id uniqueness against the existing snapshot is
   *  the caller's contract, exactly as with SQL INSERT — which keeps
   *  the lowering append-only (zero joins, zero shuffles of the
   *  snapshot). The result is the node table's NEW snapshot. */
  final case class CreateClause(alias: String, label: String,
      assigns: Seq[(String, Expr)])

  /** Query whose terminal clause is a [[CreateClause]]. */
  final case class CreateQuery(parts: Seq[QueryPart], create: CreateClause)
    extends Query

  /** `CREATE (n:L {…}) RETURN items` (extension, round 10): the RETURN
   *  reads the CREATED rows — one result row per created row (per feed
   *  row with a non-null id), the alias bound to the NEW entity's
   *  values plus everything else in the feed scope. The result is the
   *  RETURN projection, NOT the snapshot union (that is what terminal
   *  [[CreateQuery]] is for) — so the plan stays map-only on the feed
   *  and the snapshot is never read at all. */
  final case class CreateReturnQuery(parts: Seq[QueryPart],
      create: CreateClause, ret: Projection) extends Query

  /** `MERGE (n:L {id: …}) [ON MATCH SET …] [ON CREATE SET …] RETURN
   *  items` (extension, round 10): the RETURN reads the RESULTING
   *  entity per winner-deduped feed row — matched keys see the ON
   *  MATCH-updated values, absent keys see the ON CREATE row (Neo4j's
   *  post-merge read). The result is the RETURN projection over the
   *  matched ∪ created branches, NOT the snapshot union — untouched
   *  snapshot rows never enter the result, so the plan adds nothing
   *  over the merge's own matched/created joins. */
  final case class MergeReturnQuery(parts: Seq[QueryPart],
      merge: MergeClause, ret: Projection) extends Query
  /** Terminal `CREATE (a)-[r:T {p: e, …}]->(b)` (extension, round 10):
   *  appends one edge row per feed row to the verb's EDGE snapshot —
   *  `a`/`b` must be node variables bound by the preceding parts, the
   *  edge resolves by the (label(a), verb, label(b)) schema triple,
   *  endpoint key columns take the bound nodes' ids, map-assigned
   *  properties are declared edge properties (unassigned → null), rows
   *  with a null endpoint drop (OPTIONAL MATCH misses create nothing).
   *  Unconditional append like node CREATE: no match branch, no
   *  winner-dedup, no anti-join — (src, snk) uniqueness is the
   *  caller's contract. `ret` (CREATE … RETURN) reads the created
   *  edge rows per feed row instead of the snapshot union; the
   *  relationship alias is optional and only needed to read the edge
   *  itself (the endpoints stay in scope either way). */
  /** `srcSpec`/`dstSpec` (round 11): an endpoint may carry the
   *  [[MergeEndpoint]] id-map shape — `CREATE (a:L {id: e})-[:T {…}]->
   *  (b:L2 {id: e2})` — keying the appended edge per feed row without
   *  a bound variable (the ingest idiom, same as relationship MERGE's
   *  lift). The map binds ONLY the id: the node row is NOT created
   *  (one query, one snapshot — create nodes with their own CREATEs),
   *  so any other property would be silently dropped and is a typed
   *  parse rejection instead. */
  final case class CreateRelClause(srcAlias: String, verb: String,
      dstAlias: String, assigns: Seq[(String, Expr)],
      relAlias: Option[String],
      srcSpec: Option[MergeEndpoint] = None,
      dstSpec: Option[MergeEndpoint] = None)

  final case class CreateRelQuery(parts: Seq[QueryPart],
      create: CreateRelClause, ret: Option[Projection]) extends Query

  /** Terminal `MERGE (a)-[r:T]->(b) [ON MATCH SET r.p = e, …]
   *  [ON CREATE SET r.p = e, …]` (extension, round 10): edge upsert
   *  keyed by the (src, snk) pair — the relationship twin of node
   *  MERGE. The feed is the preceding parts' rows with both endpoint
   *  ids non-null, winner-deduped per pair ([[MergeClause]]'s
   *  struct-max rule); matched pairs take the ON MATCH assignments
   *  (rhs reads the OLD edge), absent pairs insert a fresh edge row
   *  from ON CREATE SET, untouched edge rows anti-join through. Edge
   *  identity is the (src, snk) pair, the engine-wide relationship
   *  contract (same as SET/DELETE on rels) — duplicate snapshot rows
   *  on a matched pair collapse to the one updated row. `ret` reads
   *  the post-merge edge per feed pair. */
  /** Inline endpoint of a relationship MERGE's MATCH-less form (round
   *  11): `(a:Label {idProp: expr})` — the node-MERGE id-map shape.
   *  The key expression evaluates per feed row and BECOMES the
   *  endpoint's id: the edge is keyed by it whether or not a node row
   *  with that id exists (the standard Neo4j ingest idiom `MERGE
   *  node; MERGE node; MERGE edge` decomposed — the node-table
   *  upserts are their own one-snapshot queries, this engine's
   *  one-query-one-snapshot contract). A RETURN after the MERGE reads
   *  the endpoint's post-merge face: matched ids see the stored node
   *  row, absent ids see id-only (other properties null). */
  final case class MergeEndpoint(label: String, keyProp: String,
      keyExpr: Expr,
      /** map entries beyond the first (round 13): a terminal NODE
       *  MERGE accepts extra entries as part of the match key (Neo4j
       *  matches on the whole map); relationship endpoints keep the
       *  id-only contract and reject extras. */
      extra: Seq[(String, Expr)] = Seq.empty)

  final case class MergeRelClause(srcAlias: String, relAlias: Option[String],
      verb: String, dstAlias: String,
      onMatch: Seq[(String, Expr)], onCreate: Seq[(String, Expr)],
      srcSpec: Option[MergeEndpoint] = None,
      dstSpec: Option[MergeEndpoint] = None,
      /** `{k: v, …}` on the relationship pattern (round 12): the map
       *  JOINS the match key — Neo4j matches an existing edge on
       *  (src, snk) AND every map entry, and stamps the map values on
       *  the created row. Null map values drop the feed row (no
       *  identity — the endpoint-key rule). */
      keyProps: Seq[(String, Expr)] = Seq.empty)

  final case class MergeRelQuery(parts: Seq[QueryPart],
      merge: MergeRelClause, ret: Option[Projection]) extends Query

  /** UNION / UNION ALL — implemented correctly end-to-end (the
   *  reference's visitor drops it, SURVEY.md §2.1). */
  final case class UnionQuery(left: Query, right: Query, all: Boolean)
    extends Query

  /** Bottom-up structural transform over an expression tree (round
   *  15): children first, then `f` on the rebuilt node. Pattern
   *  INTERIORS (ExistsPat / PatternComp parts) are not descended —
   *  they carry their own binding scopes; only their value-level
   *  `where`/`proj` subtrees transform, matching how the compiler's
   *  presence analysis reads them. */
  def transformUp(e: Expr)(f: Expr => Expr): Expr = {
    def go(x: Expr): Expr = f(x match {
      case Bin(op, l, r)   => Bin(op, go(l), go(r))
      case Not(a)          => Not(go(a))
      case Neg(a)          => Neg(go(a))
      case IsNull(a, n)    => IsNull(go(a), n)
      case TypeIs(a, n, t) => TypeIs(go(a), n, t)
      case ListLit(xs)     => ListLit(xs.map(go))
      case Func(nm, as)    => Func(nm, as.map(go))
      case a: Agg          => a.copy(arg = a.arg.map(go))
      case CaseExpr(ws, o) =>
        CaseExpr(ws.map { case (c, v) => (go(c), go(v)) }, o.map(go))
      case ListComp(v, l, w, m) =>
        ListComp(v, go(l), w.map(go), m.map(go))
      case QuantPred(k, v, l, pr)   => QuantPred(k, v, go(l), go(pr))
      case ReduceExpr(a, i, v, l, s) =>
        ReduceExpr(a, go(i), v, go(l), go(s))
      case ListIndex(l, fr, t, s) =>
        ListIndex(go(l), fr.map(go), t.map(go), s)
      case DotAccess(a, k) => DotAccess(go(a), k)
      case MapLit(fs)      => MapLit(fs.map { case (k, v) => (k, go(v)) })
      case MapProjection(a, its, st) =>
        MapProjection(a, its.map { case (k, v) => (k, go(v)) }, st)
      case ep: ExistsPat   => ep.copy(where = ep.where.map(go))
      case pc: PatternComp =>
        pc.copy(where = pc.where.map(go), proj = go(pc.proj))
      case other => other
    })
    go(e)
  }
}
