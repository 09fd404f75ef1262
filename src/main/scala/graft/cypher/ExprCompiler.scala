package graft.cypher

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import ast._
import Analyzer._

/**
 * Compiles a Cypher expression tree to a Catalyst `Column`.
 *
 * Replaces the reference's expression renderer
 * (reference: SQLRenderer.cs:563-848). Everything lowers to built-in
 * `org.apache.spark.sql.functions` so the whole expression stays inside
 * whole-stage codegen — no UDFs. Operand types, where Cypher semantics
 * diverge from Catalyst's defaults (string `+` concatenation, integral
 * division), come from the static [[TypeInference]] pass over the
 * probe's schema — no per-operator Catalyst analysis, and statically
 * illegal combinations raise typed Cypher errors at compile time.
 *
 * @param aliasCols extra value-alias → physical-column mappings, used
 *   while ORDER BY/WHERE ride on a widened intermediate projection
 *   (reference: LogicalPlan.cs:216-288).
 */
final class ExprCompiler(
    scope: Map[String, Binding],
    probe: DataFrame,
    aliasCols: Map[String, String] = Map.empty,
    entitySrc: Map[String, String] = Map.empty) {

  import Compiler.pref

  /** Physical column prefix for an entity alias: renamed entities
   *  (`WITH n AS m`) still read their source alias's columns until the
   *  projection trims/renames (reference: LogicalPlan.cs:216-288). */
  private def physAlias(alias: String): String =
    entitySrc.getOrElse(alias, alias)

  // Static typing over the probe's schema (no Catalyst analysis per
  // operator): physical column name -> type, resolved through the same
  // alias indirections as compilation.
  private lazy val colTypes: Map[String, DataType] =
    probe.schema.fields.map(f => f.name -> f.dataType).toMap

  private val types = new TypeInference({
    case ast.Ref(a, Some(p)) =>
      colTypes.get(pref(physAlias(a), p)).orElse(structFieldType(a, p))
    case ast.Ref(a, None) =>
      aliasCols.get(a).flatMap(colTypes.get).orElse(colTypes.get(a))
  }, {
    case ast.Ref(a, None) => scope.get(a).contains(PathBinding)
    case _ => false
  }, a => scope.get(a) match {
    // entity alias → its property struct shape (collect(n) typing)
    case Some(b @ (NodeBinding(_) | EdgeBinding(_))) =>
      Some(StructType(Compiler.entityCols(b).map(c2 =>
        StructField(c2,
          colTypes.getOrElse(pref(physAlias(a), c2), NullType)))))
    case _ => None
  }, a => scope.get(a) match {
    // entity alias → its PROPERTY column types (dynamic-subscript
    // common typing; the id/src/sink keys stay out — ADVICE-r14)
    case Some(NodeBinding(n)) => Some(n.properties.distinct.map(c2 =>
      colTypes.getOrElse(pref(physAlias(a), c2), NullType)))
    case Some(EdgeBinding(ed)) => Some(ed.properties.distinct.map(c2 =>
      colTypes.getOrElse(pref(physAlias(a), c2), NullType)))
    case _ => None
  })

  /** Dot access into a struct-typed VALUE (map literals, properties());
    * None for entity refs (their single-column lookup misses). */
  private def structFieldType(a: String, p: String): Option[DataType] =
    aliasCols.get(a).flatMap(colTypes.get).orElse(colTypes.get(a)) match {
      case Some(StructType(fs)) => fs.find(_.name == p).map(_.dataType)
      case _ => None
    }

  private def typeOf(e: Expr): Option[DataType] = types.infer(e)

  /** Statically inferred type of an expression (None = unknown) — used
   *  by the compiler for UNWIND's list check. */
  def staticType(e: Expr): Option[DataType] = typeOf(e)

  private def isStringy(e: Expr): Boolean = typeOf(e).contains(StringType)
  private def isIntegral(e: Expr): Boolean = typeOf(e).exists {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  def colOf(alias: String, p: String): Column = scope.get(alias) match {
    case Some(b @ (NodeBinding(_) | EdgeBinding(_))) =>
      if (!Compiler.entityCols(b).contains(p))
        throw new CypherBindingException(
          s"entity '$alias' has no property '$p'")
      col(pref(physAlias(alias), p))
    case Some(PathBinding) =>
      throw new CypherBindingException(
        s"path '$alias' has no properties - only length($alias) is supported")
    case Some(ValueBinding) =>
      // struct-typed values (map literals, properties()) support dot
      // access into their fields; temporal values support the Cypher
      // component accessors `d.year` etc. (both extensions)
      val phys = aliasCols.getOrElse(alias, alias)
      val comp = p.toLowerCase(java.util.Locale.ROOT)
      colTypes.get(phys) match {
        case Some(StructType(fs)) if fs.exists(_.name == p) =>
          col(phys).getField(p)
        case Some(StructType(_)) => throw new CypherBindingException(
          s"map '$alias' has no key '$p'")
        case Some(dt @ (DateType | TimestampType))
            if Parser.TemporalComponents(comp) =>
          temporalComponent(comp, col(phys), dt == DateType)
        case Some(DateType | TimestampType) =>
          throw new CypherBindingException(
            s"temporal value '$alias' has no component '$p' (supported: " +
            Parser.TemporalComponents.toSeq.sorted.mkString(", ") + ")")
        // time-of-day values (round 13): day-time intervals expose the
        // clock components
        case Some(_: DayTimeIntervalType) if Parser.TimeComponents(comp) =>
          intervalComponent(comp, col(phys))
        case Some(_: DayTimeIntervalType) =>
          throw new CypherBindingException(
            s"time value '$alias' has no component '$p' (supported: " +
            Parser.TimeComponents.toSeq.sorted.mkString(", ") + ")")
        case _ => throw new CypherBindingException(
          s"'$alias' is a value, not an entity — cannot access .$p")
      }
    case None =>
      throw new CypherBindingException(s"unknown variable '$alias'")
  }

  /** One temporal component as a Column. `dayofweek` is ISO
    * (1 = Monday … 7 = Sunday, Neo4j's convention; Spark's builtin is
    * 1 = Sunday, hence the shift). */
  private def temporalComponent(name: String, c: Column,
                                isDate: Boolean = false): Column =
    name match {
      case "year"      => year(c)
      case "quarter"   => quarter(c)
      case "month"     => month(c)
      case "week"      => weekofyear(c)
      case "day"       => dayofmonth(c)
      case "dayofweek" => ((dayofweek(c) + lit(5)) % lit(7)) + lit(1)
      case "hour"      => hour(c)
      case "minute"    => minute(c)
      case "second"    => second(c)
      // epoch accessors (round 12): BIGINT since the Unix epoch.
      // DATE promotes to midnight UTC via day arithmetic — a plain
      // TIMESTAMP cast would read the date as midnight in the SESSION
      // timezone and shift the epoch value by the tz offset (round-13
      // advice); timestamps are instants already, no tz involved.
      case "epochmillis" =>
        if (isDate) unix_date(c).cast(LongType) * lit(86400000L)
        else unix_millis(c.cast(TimestampType))
      case "epochseconds" =>
        if (isDate) unix_date(c).cast(LongType) * lit(86400L)
        else unix_seconds(c.cast(TimestampType))
    }

  def compile(e: Expr): Column = {
    typeOf(e) // static check: illegal operand types raise Cypher errors
    build(e)
  }

  private def build(e: Expr): Column = e match {
    case Lit(null) => lit(null)
    case Lit(v)    => lit(v)

    // dot access on a lambda-bound element: nodes(p)/relationships(p)
    // elements are entity structs, map-literal elements are structs,
    // temporal elements expose the component accessors — field
    // existence is validated by the TypeInference pass in compile()
    case Ref(a, Some(p)) if lambdaCols.contains(a) =>
      typeOf(Ref(a, None)) match {
        case Some(dt @ (DateType | TimestampType)) =>
          temporalComponent(p.toLowerCase(java.util.Locale.ROOT),
            lambdaCols(a), dt == DateType)
        case Some(_: DayTimeIntervalType) =>
          intervalComponent(p.toLowerCase(java.util.Locale.ROOT),
            lambdaCols(a))
        case _ => lambdaCols(a).getField(p)
      }
    case Ref(a, Some(p)) => colOf(a, p)

    // type predicate (round 13): decided against the static column
    // type; a NULL value conforms to every type (both forms true)
    case TypeIs(Lit(null), _, _) => lit(true) // null conforms to all
    case TypeIs(x, neg, tn) =>
      // list/map literals type permissively — recognize syntactically
      val dt = typeOf(x)
        .orElse(x match {
          case _: ListLit => Some(ArrayType(NullType))
          case _: MapLit | _: MapProjection => Some(StructType(Nil))
          case _ => None
        })
        .getOrElse(throw new CypherTypeException(
          s"IS :: $tn on an expression whose type cannot be inferred " +
          "statically"))
      def m(t: DataType): Boolean = tn match {
        case "INTEGER" => t match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }
        case "FLOAT" => t == DoubleType || t == FloatType ||
          t.isInstanceOf[DecimalType]
        case "STRING"  => t == StringType
        case "BOOLEAN" => t == BooleanType
        case "DATE"    => t == DateType
        case "DATETIME" | "LOCALDATETIME" | "TIMESTAMP" =>
          t == TimestampType || t == TimestampNTZType
        // the engine lowers time-of-day AND duration to intervals —
        // the three names are indistinguishable at the storage level
        case "DURATION" | "TIME" | "LOCALTIME" =>
          t.isInstanceOf[DayTimeIntervalType] ||
            t.isInstanceOf[YearMonthIntervalType]
        case "LIST" => t.isInstanceOf[ArrayType]
        case "MAP"  => t.isInstanceOf[StructType]
        case "ANY"  => true
      }
      val c2 = build(x)
      when(c2.isNull, lit(true)).otherwise(lit(m(dt) ^ neg))

    // label predicate (round 13): static-schema decision — own label
    // true, declared sub-label = discriminator equality, anything
    // else false (one table's row never carries another's label)
    case HasLabel(a, labels) =>
      scope.get(a) match {
        case Some(NodeBinding(nd)) =>
          labels.map { l =>
            if (l == nd.label) lit(true)
            else nd.subLabels.get(l) match {
              case Some((prop, v)) =>
                col(pref(physAlias(a), prop)) === lit(v)
              case None => lit(false)
            }
          }.reduce(_ && _)
        case Some(EdgeBinding(_)) => throw new CypherBindingException(
          s"label predicate on relationship '$a' — relationships have " +
          "a type, compare type($a)")
        case Some(_) => throw new CypherBindingException(
          s"label predicate on '$a', which is not a node variable")
        case None =>
          throw new CypherBindingException(s"unknown variable '$a'")
      }
    case Ref(a, None) if lambdaCols.contains(a) => lambdaCols(a)
    case Ref(a, None) =>
      aliasCols.get(a).map(col).getOrElse {
        scope.get(a) match {
          case Some(ValueBinding) => col(a)
          case Some(PathBinding) => throw new CypherNotSupportedException(
            s"path variable '$a' supports only length($a), nodes($a) " +
            s"and relationships($a)")
          case Some(_) => throw new CypherNotSupportedException(
            s"entity variable '$a' used as a value — project a property")
          case None =>
            throw new CypherBindingException(s"unknown variable '$a'")
        }
      }

    // boolean positions cast their operand: a NULL literal is VOID-typed
    // in Catalyst (analysis error) but legal, null-valued boolean input
    // in Cypher; the cast is a no-op for well-typed operands
    case _: ExistsPat =>
      throw new CypherNotSupportedException(
        "EXISTS pattern predicate is not supported in this position — " +
        "use it in a plain MATCH WHERE clause (any boolean position), " +
        "a WITH/RETURN projection item, or an OPTIONAL MATCH WHERE as " +
        "a TOP-LEVEL AND-conjunct (deeper positions there — under OR, " +
        "CASE, size() — have no pre-left-join lowering)")

    case _: PatternComp =>
      throw new CypherNotSupportedException(
        "pattern comprehension is not supported in this position — " +
        "use it in a WITH/RETURN projection item or a MATCH WHERE " +
        "clause")

    case Not(x)    => !build(x).cast(BooleanType)
    case Neg(x)    => negate(compile(x))
    case IsNull(x, false) => compile(x).isNull
    case IsNull(x, true)  => compile(x).isNotNull
    case ListLit(items)   => array(items.map(compile): _*)
    case MapLit(fields)   =>
      struct(fields.map { case (k, v) => compile(v).as(k) }: _*)

    // map projection (round 13, extension): `.*` expands to the
    // declared properties (entities) or struct fields (map values) in
    // declared order, minus keys an explicit item overrides; explicit
    // items follow in written order. A NULL entity (OPTIONAL MATCH
    // miss) or NULL map projects to NULL, not a struct of nulls —
    // Neo4j's contract. Everything stays one in-row named_struct
    // under a null guard: no join, no shuffle, codegen throughout.
    case MapProjection(alias, items, star) =>
      val explicit = items.map(_._1).toSet
      def entity(b: Binding, guard: String): (Seq[(String, Column)], Column) =
        ((if (star) Compiler.entityCols(b).filterNot(explicit)
            .map(c2 => c2 -> col(pref(physAlias(alias), c2))) else Nil),
          col(pref(physAlias(alias), guard)).isNull)
      val (starFields, nullGuard) = scope.get(alias) match {
        case Some(b @ NodeBinding(n)) => entity(b, n.idColumn)
        case Some(b @ EdgeBinding(e)) => entity(b, e.srcIdColumn)
        case Some(ValueBinding) =>
          val phys = aliasCols.getOrElse(alias, alias)
          colTypes.get(phys) match {
            case Some(StructType(fs2)) =>
              ((if (star) fs2.toSeq.filterNot(f2 => explicit(f2.name))
                  .map(f2 => f2.name -> col(phys).getField(f2.name))
                else Nil),
                col(phys).isNull)
            case Some(other) => throw new CypherTypeException(
              s"map projection: '$alias' is a ${other.simpleString} " +
              "value, not a map or entity")
            case None if star => throw new CypherBindingException(
              s"map projection '$alias {.*}' — '$alias' has no " +
              "statically known fields")
            case None => (Nil, col(aliasCols.getOrElse(alias, alias)).isNull)
          }
        case Some(PathBinding) => throw new CypherBindingException(
          s"map projection: '$alias' is a path, not a map or entity")
        case None =>
          throw new CypherBindingException(s"unknown variable '$alias'")
      }
      val fields = starFields.map { case (k, c2) => c2.as(k) } ++
        items.map { case (k, v) => build(v).as(k) }
      when(nullGuard, lit(null)).otherwise(struct(fields: _*))

    case Bin(op, l, r) => compileBin(op, l, r)
    case f: Func       => compileFunc(f)
    case a: Agg        => compileAgg(a)

    case CaseExpr(whens, other) =>
      // searched CASE; missing ELSE yields NULL
      // (reference: QueryExpressionCaseExpression.cs:88-90). Branch
      // values are cast to the statically merged type — the reference
      // renders explicit CONVERTs per branch (SQLRenderer.cs:338-363),
      // which is what lets e.g. a boolean branch merge with a numeric
      // one (bit→int, 1/0) where raw Catalyst coercion would fail.
      val target = typeOf(e)
      def branch(v: Expr): Column = {
        val c = build(v)
        target.map(c.cast).getOrElse(c)
      }
      def cond(c: Expr): Column = build(c).cast(BooleanType)
      val head = when(cond(whens.head._1), branch(whens.head._2))
      val chained = whens.tail.foldLeft(head) { case (acc, (c, v)) =>
        acc.when(cond(c), branch(v))
      }
      other.map(o => chained.otherwise(branch(o))).getOrElse(chained)

    // ----- list surface (extensions) — all lower to Spark higher-order
    // functions (filter/transform/exists/forall/aggregate/get/slice),
    // which evaluate per-row inside codegen without UDF boundaries ------
    case ListComp(v, l, w, m) =>
      val lc = compile(l)
      val et = types.elemType(l, "list comprehension")
      val filtered = w.fold(lc)(wx =>
        filter(lc, x => lambdaBody(v, et, x)(build(wx).cast(BooleanType))))
      m.fold(filtered)(mx =>
        transform(filtered, x => lambdaBody(v, et, x)(build(mx))))

    case QuantPred(kind, v, l, pred) =>
      val lc = compile(l)
      val et = types.elemType(l, "any/all/none/single")
      def p(x: Column): Column =
        lambdaBody(v, et, x)(build(pred).cast(BooleanType))
      kind match {
        case "any"  => exists(lc, p)
        case "all"  => forall(lc, p)
        case "none" => !exists(lc, p)
        // single = exactly one element satisfies; filter() drops
        // null-valued predicates, so unknowns don't count as matches
        case "single" => size(filter(lc, p(_))) === lit(1)
      }

    case ReduceExpr(acc, init, v, l, step) =>
      val initT = typeOf(init)
      val initC = compile(init)
      val lc = compile(l)
      val et = types.elemType(l, "reduce")
      // Catalyst's aggregate() requires the merge to preserve the
      // accumulator's type — cast the step back to the init type (the
      // same contract the reference's CASE rendering uses per branch)
      aggregate(lc, initC, (a, x) =>
        types.bound(acc, initT) {
          lambdaBody(v, et, x) {
            withLambdaCol(acc, a) {
              val s = build(step)
              initT.map(s.cast).getOrElse(s)
            }
          }
        })

    // procedure rows only ever appear as an UNWIND source (parser
    // contract) and are expanded by the compiler against the catalog
    case ProcRows(proc) => throw new CypherNotSupportedException(
      s"procedure $proc(...) outside a CALL clause")

    // generic dot access (round 13, extension): static dispatch on the
    // operand's inferred type — struct field read (nested maps,
    // properties(), map projections, collect(n)[i]), temporal
    // component, or time-of-day (day-time interval) clock component.
    // All three stay in-row codegen expressions.
    case DotAccess(x, key) =>
      val comp = key.toLowerCase(java.util.Locale.ROOT)
      typeOf(x) match {
        case Some(StructType(fs2)) =>
          if (!fs2.exists(_.name == key))
            throw new CypherBindingException(
              s"map has no key '$key' (keys: " +
              fs2.map(_.name).mkString(", ") + ")")
          compile(x).getField(key)
        case Some(dt @ (DateType | TimestampType | TimestampNTZType)) =>
          if (!Parser.TemporalComponents(comp))
            throw new CypherBindingException(
              s"temporal value has no component '$key' (supported: " +
              Parser.TemporalComponents.toSeq.sorted.mkString(", ") + ")")
          temporalComponent(comp, compile(x), dt == DateType)
        case Some(_: DayTimeIntervalType) =>
          if (!Parser.TimeComponents(comp))
            throw new CypherBindingException(
              s"time value has no component '$key' (supported: " +
              Parser.TimeComponents.toSeq.sorted.mkString(", ") + ")")
          intervalComponent(comp, compile(x))
        case Some(other) => throw new CypherTypeException(
          s".$key access on ${other.simpleString} — requires a map, " +
          "temporal, or time value")
        case None => throw new CypherTypeException(
          s".$key access on an expression whose type cannot be " +
          "inferred statically")
      }

    case ListIndex(l, from, to, isSlice) =>
      // dynamic property access n['key'] on an ENTITY with a literal
      // string key (round 13; Neo4j's n[expr], restricted to static
      // keys — schema columns are static, not runtime lookups):
      // exactly n.key, same validation
      l match {
        case Ref(a2, None) if scope.get(a2).exists {
            case NodeBinding(_) | EdgeBinding(_) => true
            case _ => false } =>
          if (isSlice) throw new CypherTypeException(
            "slice on an entity — entities subscript by property key: " +
            "n['key']")
          return from.get match {
            case Lit(k: String) => colOf(a2, k)
            case keyExpr =>
              // dynamic key (round 14; Neo4j's n[expr]): the schema is
              // static, so the runtime key resolves through a BOUNDED
              // CASE chain over the declared columns — null on an
              // unknown key. One relational result type required:
              // TypeInference's commonSubscriptType (equal types pass,
              // integral mixes widen to long, numeric to double,
              // anything else is typed).
              val common = typeOf(ListIndex(l, from, to, isSlice))
                .getOrElse(throw new CypherTypeException(
                  "dynamic entity subscript with an un-inferable key"))
              val kc = compile(keyExpr)
              // round 15 (ADVICE-r14): the common type is the PROPERTY
              // columns'; id/src/sink key columns stay in the dispatch
              // chain only when their type already matches it (so e.g.
              // a string-keyed edge still answers f['_sink'], while a
              // numeric node id no longer rejects an all-string entity)
              def fits(c2: String): Boolean =
                colTypes.get(pref(physAlias(a2), c2)).contains(common)
              val props = scope(a2) match {
                case NodeBinding(n) =>
                  (Seq(n.idColumn).filter(fits) ++ n.properties).distinct
                case EdgeBinding(ed) =>
                  (Seq(ed.srcIdColumn, ed.sinkIdColumn).filter(fits) ++
                    ed.properties).distinct
                case _ => Seq.empty
              }
              props.foldLeft(when(lit(false),
                  lit(null).cast(common))) { (acc, pr) =>
                acc.when(kc === lit(pr), colOf(a2, pr).cast(common))
              }.otherwise(lit(null).cast(common))
          }
        case _ => ()
      }
      val lc = compile(l)
      // map subscript m['key'] (round 13; Neo4j): a struct-typed
      // operand with a LITERAL string key reads the field (unknown
      // key / dynamic key / slice stay typed — struct fields are
      // static schema, not runtime lookups)
      typeOf(l) match {
        case Some(StructType(fs2)) =>
          if (isSlice) throw new CypherTypeException(
            "slice on a map — maps subscript by key: m['key']")
          from.get match {
            case Lit(k: String) =>
              if (!fs2.exists(_.name == k))
                throw new CypherBindingException(
                  s"map has no key '$k' (keys: " +
                  fs2.map(_.name).mkString(", ") + ")")
              return lc.getField(k)
            case keyExpr =>
              // dynamic map key (round 14): same bounded CASE-chain
              // dispatch as the entity form — struct fields are the
              // static dispatch set, null on unknown key
              val common = typeOf(ListIndex(l, from, to, isSlice))
                .getOrElse(throw new CypherTypeException(
                  "dynamic map subscript with an un-inferable key"))
              val kc = compile(keyExpr)
              return fs2.foldLeft(when(lit(false),
                  lit(null).cast(common))) { (acc, f2) =>
                acc.when(kc === lit(f2.name),
                  lc.getField(f2.name).cast(common))
              }.otherwise(lit(null).cast(common))
          }
        case _ =>
      }
      if (!isSlice) {
        // 0-based; negative = from the end; out of range → null (get()
        // is the total accessor — element_at would throw under ANSI)
        val i = compile(from.get).cast(IntegerType)
        get(lc, when(i < 0, size(lc) + i).otherwise(i))
      } else {
        // end-exclusive slice with Cypher's graceful clamping; slice()
        // interprets NEGATIVE starts as from-the-end, so clamp into
        // [0, size] BEFORE handing it the 1-based start
        val sz = size(lc)
        val f0 = from.map(x => compile(x).cast(IntegerType)).getOrElse(lit(0))
        val t0 = to.map(x => compile(x).cast(IntegerType)).getOrElse(sz)
        val f1 = when(f0 < 0, sz + f0).otherwise(f0)
        val t1 = when(t0 < 0, sz + t0).otherwise(t0)
        val s = greatest(least(f1, sz), lit(0))
        val e = greatest(least(t1, sz), lit(0))
        slice(lc, s + lit(1), greatest(e - s, lit(0)))
      }
  }

  /** Lambda-scoped variables for higher-order-function bodies:
   *  name → the HOF-supplied element Column. */
  private var lambdaCols: Map[String, Column] = Map.empty

  private def withLambdaCol[A](name: String, c: Column)(f: => A): A = {
    val saved = lambdaCols
    lambdaCols = lambdaCols + (name -> c)
    try f finally lambdaCols = saved
  }

  /** Binds `name` in BOTH the type scope and the column scope while
   *  building a lambda body — typing decisions inside the body (string
   *  `+`, integral division) see the element type. */
  private def lambdaBody(name: String, et: Option[DataType], x: Column)
                        (body: => Column): Column =
    types.bound(name, et)(withLambdaCol(name, x)(body))

  /** Component columns of a temporal MAP constructor: `year` is
    * required, the remaining calendar fields default to their floor
    * (month/day → 1, time-of-day → 0); unknown keys are typed
    * errors. Values may be any numeric expressions — columns
    * compose. */
  /** Parses a time-of-day literal to its duration-since-midnight
    * (round 13). An offset suffix (`±hh[:mm]` or `Z`) is legal for
    * time() only and normalizes to the UTC time of day, wrapped into
    * [0, 24h); malformed literals are compile-time Cypher errors. */
  private def parseTimeLit(fn: String, s: String): java.time.Duration = {
    val offRe = "^(.*?)([+-]\\d{2}(?::?\\d{2})?|Z)$".r
    val (body, off) = s match {
      case offRe(b, o) => (b, Some(o))
      case _ => (s, None)
    }
    if (fn == "localtime" && off.isDefined)
      throw new CypherSyntaxException(
        "localtime() does not take a zone offset — use time()")
    val lt = try java.time.LocalTime.parse(body)
      catch { case _: java.time.format.DateTimeParseException =>
        throw new CypherSyntaxException(
          s"$fn(): malformed time literal '$s'") }
    val base = java.time.Duration.ofNanos(lt.toNanoOfDay)
    off match {
      case None => base
      case Some(o) =>
        val offset = try java.time.ZoneOffset.of(o)
          catch { case _: java.time.DateTimeException =>
            throw new CypherSyntaxException(
              s"$fn(): malformed zone offset in '$s'") }
        val day = 24L * 3600 * 1000000000L
        val n = base.toNanos - offset.getTotalSeconds * 1000000000L
        java.time.Duration.ofNanos(((n % day) + day) % day)
    }
  }

  /** Component accessors over a DAY-TIME INTERVAL time-of-day value
    * (round 13): date_part over the interval, seconds floored to the
    * integer component (millisecond reads the fraction). */
  private def intervalComponent(name: String, c: Column): Column =
    name match {
      case "hour"   => date_part(lit("HOUR"), c).cast(IntegerType)
      case "minute" => date_part(lit("MINUTE"), c).cast(IntegerType)
      case "second" =>
        floor(date_part(lit("SECOND"), c)).cast(IntegerType)
      case "millisecond" =>
        floor(date_part(lit("SECOND"), c) * 1000)
          .cast(IntegerType) % lit(1000)
      case other => throw new CypherBindingException(
        s"time value has no component '$other' (supported: hour, " +
        "minute, second, millisecond)")
    }

  private def temporalMapFields(fn: String,
      fields: Seq[(String, Expr)], allowed: Seq[String])
      : Map[String, Column] = {
    val norm = fields.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v }
    norm.groupBy(_._1).collectFirst { case (k, vs) if vs.size > 1 => k }
      .foreach(k => throw new CypherSyntaxException(
        s"$fn({…}) binds '$k' twice"))
    norm.map(_._1).find(!allowed.contains(_)).foreach(k =>
      throw new CypherSyntaxException(
        s"$fn({…}) has no component '$k' (supported: " +
        allowed.mkString(", ") + ")"))
    if (!norm.exists(_._1 == "year"))
      throw new CypherSyntaxException(s"$fn({…}) requires a year")
    val m = norm.toMap
    allowed.map { k =>
      val default = if (k == "month" || k == "day") 1 else 0
      k -> m.get(k).map(e => compile(e).cast(IntegerType))
        .getOrElse(lit(default))
    }.toMap
  }

  private def compileBin(op: BinOp, le: Expr, re: Expr): Column = {
    lazy val l = build(le)
    lazy val r = build(re)
    op match {
      case BinOp.Add =>
        // string + anything concatenates (reference:
        // TypeCoersionTables.cs:30,44,58 → SQLRenderer string concat)
        if (isStringy(le) || isStringy(re))
          concat(l.cast(StringType), r.cast(StringType))
        else l + r
      case BinOp.Sub => l - r
      case BinOp.Mul => l * r
      case BinOp.Div =>
        // Cypher/T-SQL integer division truncates. Spark's `/` is always
        // floating (a double round-trip corrupts longs above 2^53), so
        // integral operands use the native integral-divide expression.
        if (isIntegral(le) && isIntegral(re))
          org.apache.spark.sql.GraftSqlBridge.integralDivide(l, r)
        else l / r
      case BinOp.Mod => l % r
      case BinOp.Pow => pow(l.cast(DoubleType), r.cast(DoubleType))
      // boolean operands cast like Not's (NULL literal = VOID in Catalyst)
      case BinOp.And => l.cast(BooleanType) && r.cast(BooleanType)
      case BinOp.Or  => l.cast(BooleanType) || r.cast(BooleanType)
      case BinOp.Xor => l.cast(BooleanType) =!= r.cast(BooleanType) // null-propagating XOR
      case BinOp.Lt  => l < r
      case BinOp.Le  => l <= r
      case BinOp.Gt  => l > r
      case BinOp.Ge  => l >= r
      case BinOp.Eq  => l === r
      case BinOp.Neq => l =!= r
      case BinOp.In => re match {
        case ListLit(items) if items.forall(_.isInstanceOf[Lit]) =>
          l.isin(items.collect { case Lit(v) => v }: _*)
        case ListLit(items) =>
          items.map(i => l === compile(i)).reduce(_ || _)
        // arbitrary list-typed right side (round 13; Neo4j `x IN xs`,
        // `x IN range(…)`, `x IN collect(…)`): Cypher's 3-valued IN —
        // found ⇒ true; else a null element (or null operand) ⇒ null;
        // else false. All in-row higher-order ops, stays codegen.
        case _ if le == Lit(null) => lit(null).cast(BooleanType)
        case _ if typeOf(re).forall(_.isInstanceOf[ArrayType]) =>
          val arr = compile(re)
          when(l.isNull || arr.isNull, lit(null).cast(BooleanType))
            .when(array_contains(arr, l), lit(true))
            .otherwise(when(exists(arr, x2 => x2.isNull),
              lit(null).cast(BooleanType)).otherwise(lit(false)))
        case _ => throw new CypherTypeException(
          s"IN requires a list, got " +
          typeOf(re).map(_.simpleString).getOrElse("?"))
      }
      case BinOp.Regex =>
        // Cypher `=~` is a FULL match (java.util.regex matches()); Spark
        // rlike is a find — anchor the pattern. The reference renders
        // PATINDEX, which is wrong and untested (SQLRenderer.cs:50).
        re match {
          case Lit(s: String) => l.rlike(s"^(?:$s)$$")
          case _ => regexp_like(l,
            concat(lit("^(?:"), r.cast(StringType), lit(")$")))
        }
    }
  }

  /** Scalar function registry (reference: Function.cs:13-46, rendering
   *  SQLRenderer.cs:563-629). T-SQL `float` is 8-byte, so toFloat maps
   *  to DoubleType like the reference's CAST AS float. */
  private def compileFunc(f: Func): Column = {
    def a0 = compile(f.args.head)
    def a1 = compile(f.args(1))
    def arity(n: Int): Unit =
      if (f.args.size != n)
        throw new CypherSyntaxException(s"${f.name} expects $n argument(s)")
    f.name match {
      // try_cast, not cast: Cypher yields null on a failed conversion
      // (the reference wraps CAST in null-preserve, SQLRenderer.cs:
      // 317-336); ANSI-mode Spark cast would throw instead
      // the Neo4j 5 `…OrNull` spellings alias the plain casts —
      // try_cast already nulls on failure (round 13)
      case "tofloat" | "tofloatornull" =>
        arity(1); a0.try_cast(DoubleType)
      case "todouble"  => arity(1); a0.try_cast(DoubleType)
      case "tostring" | "tostringornull" =>
        arity(1); a0.try_cast(StringType)
      case "toboolean" | "tobooleanornull" =>
        arity(1); a0.try_cast(BooleanType)
      // openCypher toInteger is 64-bit — a 32-bit mapping would turn
      // legal big values into silent try_cast nulls
      case "tointeger" | "tointegerornull" =>
        arity(1); a0.try_cast(LongType)
      case "tolong"    => arity(1); a0.try_cast(LongType)
      // `a || b` (round 13; Cypher 5 / GQL concatenation): lists
      // concatenate, anything else concatenates as strings —
      // null-propagating either way (Spark concat)
      case "__pipeconcat" =>
        // list literals type as None statically — recognize them
        // syntactically so [..] || [..] concatenates arrays
        def isList(e2: Expr): Boolean = e2.isInstanceOf[ast.ListLit] ||
          typeOf(e2).exists(_.isInstanceOf[ArrayType])
        if (isList(f.args(0)) || isList(f.args(1))) concat(a0, a1)
        else concat(a0.cast(StringType), a1.cast(StringType))
      case "not"       => arity(1); !a0
      case "startswith" => arity(2); a0.startsWith(a1)
      case "endswith"   => arity(2); a0.endsWith(a1)
      case "contains"   => arity(2); a0.contains(a1)
      case "left"  => arity(2); substring(a0, lit(1), a1)
      case "right" => arity(2); substring(a0, negate(a1), a1)
      case "trim"  => arity(1); trim(a0)
      // Neo4j isNaN(): null in → null out (Spark's isnan reads null
      // as false, hence the guard)
      case "isnan" =>
        arity(1)
        when(a0.isNull, lit(null).cast(BooleanType))
          .otherwise(isnan(a0.cast(DoubleType)))
      // Cypher 5 trim specifier forms (round 13):
      // trim([BOTH|LEADING|TRAILING] [ch] FROM input); the trim
      // character must be a literal (Spark's trimString overloads are
      // literal-only — a runtime character would need a UDF)
      case "__trim_both" | "__trim_leading" | "__trim_trailing" =>
        val side = f.name.stripPrefix("__trim_")
        val (chOpt, input) = f.args match {
          case Seq(x) => (None, compile(x))
          case Seq(ast.Lit(c: String), x) => (Some(c), compile(x))
          case _ => throw new CypherNotSupportedException(
            "the trim character in trim(… FROM …) must be a literal " +
            "string")
        }
        (side, chOpt) match {
          case ("both", None)        => trim(input)
          case ("both", Some(c))     => trim(input, c)
          case ("leading", None)     => ltrim(input)
          case ("leading", Some(c))  => ltrim(input, c)
          case ("trailing", None)    => rtrim(input)
          case ("trailing", Some(c)) => rtrim(input, c)
          case _ => throw new IllegalStateException
        }
      case "ltrim" => arity(1); ltrim(a0)
      case "rtrim" => arity(1); rtrim(a0)
      // Neo4j 2025 string pads (round 14): lpad/rpad(input, length
      // [, padString]) — padString defaults to one space; a negative
      // length yields the empty string (Spark's contract). btrim is
      // the callable trim-BOTH; trim characters literal-only (the
      // __trim_both contract — Spark's trimString overloads).
      case "lpad" | "rpad" =>
        if (f.args.size != 2 && f.args.size != 3)
          throw new CypherSyntaxException(
            s"${f.name}(input, length[, padString])")
        val pad = if (f.args.size == 3) compile(f.args(2)) else lit(" ")
        call_function(f.name, a0, a1.cast(IntegerType), pad)
      // Neo4j 5.17 normalize() (round 14): unicode normalization —
      // NFC default; the form may be Neo4j's bare-keyword spelling
      // (normalize(s, NFD)) or a literal string. Static-kernel
      // codegen over java.text.Normalizer.
      case "normalize" =>
        val forms = Set("NFC", "NFD", "NFKC", "NFKD")
        val form = f.args match {
          case Seq(_) => "NFC"
          case Seq(_, second) =>
            val m = second match {
              case Ref(nm, None)  => nm.toUpperCase(java.util.Locale.ROOT)
              case Lit(s: String) => s.toUpperCase(java.util.Locale.ROOT)
              case _ => ""
            }
            if (!forms(m)) throw new CypherSyntaxException(
              "normalize(s, form): form must be NFC, NFD, NFKC or NFKD")
            m
          case _ => throw new CypherSyntaxException(
            "normalize(input[, form])")
        }
        graft.functions.NativeExpressions.unicodeNormalize(a0, form)
      case "btrim" =>
        f.args match {
          case Seq(_)                     => trim(a0)
          case Seq(_, ast.Lit(c: String)) => trim(a0, c)
          case Seq(_, _) => throw new CypherNotSupportedException(
            "btrim's trim characters must be a literal string")
          case _ => throw new CypherSyntaxException(
            "btrim(input[, trimCharacters])")
        }
      // Neo4j list casts (round 14): per-element conversion, null on
      // a failed ELEMENT (the toXOrNull contract, element-wise); a
      // null list stays null
      case "tointegerlist" | "tofloatlist" | "tobooleanlist" |
          "tostringlist" =>
        arity(1)
        val et = f.name match {
          case "tointegerlist" => LongType
          case "tofloatlist"   => DoubleType
          case "tobooleanlist" => BooleanType
          case _               => StringType
        }
        transform(a0, x => x.try_cast(et))
      // Neo4j 5 GenAI vector similarity (round 14): scores follow the
      // VECTOR INDEX scoring formulas Neo4j documents — cosine →
      // (1 + cos)/2 ∈ [0, 1], euclidean → 1/(1 + d²) — so function
      // values match index scores. Mismatched lengths yield null
      // (zip_with's null padding poisons the fold) and a zero-norm
      // side yields null (no direction), surfacing malformed vectors
      // instead of a fake score. In-row higher-order folds, codegen.
      case "vector.similarity.cosine" | "vector.similarity.euclidean" =>
        arity(2)
        val va = transform(a0, x => x.cast(DoubleType))
        val vb = transform(a1, x => x.cast(DoubleType))
        def fsum(c: Column): Column =
          aggregate(c, lit(0.0), (acc, x) => acc + x)
        if (f.name.endsWith("cosine")) {
          val dot = fsum(zip_with(va, vb, (x, y) => x * y))
          val nn = sqrt(fsum(zip_with(va, va, (x, y) => x * y))) *
            sqrt(fsum(zip_with(vb, vb, (x, y) => x * y)))
          when(nn === 0.0, lit(null).cast(DoubleType))
            .otherwise((lit(1.0) + dot / nn) / lit(2.0))
        } else {
          val d2 = fsum(zip_with(va, vb, (x, y) => (x - y) * (x - y)))
          lit(1.0) / (lit(1.0) + d2)
        }
      case "toupper" | "upper" => arity(1); upper(a0)
      case "tolower" | "lower" => arity(1); lower(a0)
      case "size" | "length"   =>
        arity(1)
        f.args.head match {
          case ast.Ref(a, None) if scope.get(a).contains(PathBinding) =>
            col(a) // the materialized per-branch relationship count
          case h => typeOf(h) match {
            case Some(ArrayType(_, _)) => size(a0)
            case _ => length(a0)
          }
        }
      // SQL-standard string-length aliases (round 13; Neo4j 5)
      case "char_length" | "character_length" =>
        arity(1); length(a0)
      // Neo4j 5 valueType(): the value's Cypher type name — decided
      // against the STATIC column type (the engine's typing model, the
      // IS :: vocabulary); a NULL value still reports "NULL" per
      // Neo4j. LIST/MAP carry no inner-type suffix (divergence:
      // Neo4j prints LIST<INTEGER> etc.).
      case "valuetype" =>
        arity(1)
        val dt = typeOf(f.args.head).getOrElse(
          f.args.head match {
            case _: ListLit => ArrayType(NullType)
            case _: MapLit | _: MapProjection => StructType(Nil)
            case Lit(null) => NullType
            case _ => throw new CypherTypeException(
              "valueType() on an expression whose type cannot be " +
              "inferred statically")
          })
        val nm = dt match {
          case ByteType | ShortType | IntegerType | LongType => "INTEGER"
          case DoubleType | FloatType | (_: DecimalType) => "FLOAT"
          case StringType => "STRING"
          case BooleanType => "BOOLEAN"
          case DateType => "DATE"
          case TimestampType => "DATETIME"
          case TimestampNTZType => "LOCALDATETIME"
          case _: DayTimeIntervalType | _: YearMonthIntervalType =>
            "DURATION"
          case _: ArrayType => "LIST"
          case _: StructType => "MAP"
          case NullType => "NULL"
          case other => other.simpleString.toUpperCase(
            java.util.Locale.ROOT)
        }
        when(a0.isNull, lit("NULL")).otherwise(lit(nm))
      case "abs"   => arity(1); abs(a0)
      // Extensions beyond the reference's registry (Function.cs:13-46):
      // math helpers needed for deterministic floating-point comparisons
      // and analytics. Flagged as extensions, not parity (SURVEY §7).
      case "round" =>
        // 1-arg form (round 12; Neo4j's everyday round(x) — HALF_UP to
        // a whole double), the 2-arg literal-scale form, or the 3-arg
        // rounding-mode form (round 14; Neo4j's java.math modes).
        // Modes lower to scaled double arithmetic (ceil/floor/bround
        // over x·10^d) — ulp-edge ties can differ from Neo4j's exact
        // BigDecimal.setScale by one last-place digit, the same class
        // of divergence every double-vs-decimal engine pair carries.
        val scale: Int =
          if (f.args.size == 1) 0
          else f.args(1) match {
            case Lit(n: Long) => n.toInt
            case Lit(n: Int)  => n
            case _ => throw new CypherSyntaxException(
              "round(x, d) requires a literal integer scale")
          }
        if (f.args.size <= 2) round(a0, scale)
        else {
          arity(3)
          val mode = f.args(2) match {
            case Lit(m: String) => m.toUpperCase(java.util.Locale.ROOT)
            case _ => throw new CypherSyntaxException(
              "round(x, d, mode) requires a literal mode string")
          }
          val s = math.pow(10.0, scale)
          val xs = a0.cast(DoubleType) * s
          val mag = abs(xs)
          val sg = when(a0 < 0, lit(-1.0)).otherwise(lit(1.0))
          val scaled = mode match {
            case "HALF_UP"   => round(xs, 0)
            case "HALF_EVEN" => bround(xs, 0)
            case "HALF_DOWN" => sg * ceil(mag - lit(0.5))
            case "UP"        => sg * ceil(mag)
            case "DOWN"      => sg * floor(mag)
            case "CEILING"   => ceil(xs)
            case "FLOOR"     => floor(xs)
            case other => throw new CypherSyntaxException(
              s"round mode '$other' (supported: UP, DOWN, CEILING, " +
              "FLOOR, HALF_UP, HALF_DOWN, HALF_EVEN)")
          }
          scaled.cast(DoubleType) / s
        }
      case "floor" => arity(1); floor(a0)
      case "ceil"  => arity(1); ceil(a0)
      case "sqrt"  => arity(1); sqrt(a0)
      // openCypher standard-library extensions (reference registry
      // Function.cs:13-46 lacks all of these; typed in TypeInference):
      // null-handling, string/list utilities, math. coalesce() merges
      // its arguments under the CASE-branch unifier, so illegal type
      // mixes fail at compile time, not as runtime coercion surprises.
      case "coalesce" =>
        if (f.args.isEmpty)
          throw new CypherSyntaxException("coalesce() needs at least one argument")
        coalesce(f.args.map(compile): _*)
      case "replace" => arity(3); replace(a0, a1, compile(f.args(2)))
      case "split" =>
        arity(2)
        // Cypher splits on a LITERAL delimiter — or, round 14, a
        // literal LIST of delimiters (Neo4j 5: any of them splits).
        // Spark's split takes a regex, so quote at compile time
        // (column delimiters would need a runtime quote — rejected,
        // not silently regexed); the list form compiles to a quoted
        // alternation
        f.args(1) match {
          case Lit(d: String) => split(a0, java.util.regex.Pattern.quote(d))
          case ListLit(ds) if ds.nonEmpty && ds.forall {
              case Lit(_: String) => true; case _ => false } =>
            split(a0, ds.map { case Lit(d: String) =>
              java.util.regex.Pattern.quote(d) }.mkString("|"))
          case _ => throw new CypherNotSupportedException(
            "split() requires a literal string delimiter (or a " +
            "literal list of them)")
        }
      case "substring" =>
        // Cypher substring(s, start[, len]) is 0-based; Spark is 1-based
        if (f.args.size == 2) a0.substr(a1.cast(IntegerType) + lit(1), length(a0))
        else if (f.args.size == 3)
          a0.substr(a1.cast(IntegerType) + lit(1),
            compile(f.args(2)).cast(IntegerType))
        else throw new CypherSyntaxException("substring expects 2 or 3 arguments")
      case "reverse" => arity(1); reverse(a0) // string or list
      // isEmpty(x) (round 12; Neo4j): size = 0 over strings and lists,
      // null-propagating like size itself
      case "isempty" =>
        arity(1)
        typeOf(f.args.head) match {
          case Some(ArrayType(_, _)) => size(a0) === lit(0)
          case Some(NullType) => lit(null).cast(BooleanType)
          case None if f.args.head.isInstanceOf[ast.ListLit] =>
            size(a0) === lit(0)
          case Some(StringType) => length(a0) === lit(0)
          // un-inferable argument: keep the typed rejection instead of
          // length(x), which would let Spark implicitly stringify a
          // numeric (isEmpty(42) = false) — round-13 advice
          case _ => throw new CypherTypeException(
            "isEmpty() requires a string or list; the argument type " +
            "could not be inferred - wrap it in toString() if it is " +
            "a string")
        }
      // tail(list) (round 12; Neo4j): everything after the head —
      // tail([]) is [] (slice clamps), tail(null) null
      case "tail" => arity(1); slice(a0, lit(2), greatest(
        size(a0) - lit(1), lit(0)))
      case "head" =>
        // get() is 0-based and null (never an error) out of bounds —
        // head([]) is null per openCypher
        arity(1); get(a0, lit(0))
      case "last" => arity(1); get(a0, size(a0) - lit(1))
      case "range" =>
        if (f.args.size < 2 || f.args.size > 3)
          throw new CypherSyntaxException("range expects 2 or 3 arguments")
        // sequence() is end-INCLUSIVE, matching Cypher's range()
        sequence(a0.cast(LongType), a1.cast(LongType),
          if (f.args.size == 3) compile(f.args(2)).cast(LongType) else lit(1L))
      case "sign" => arity(1); signum(a0).cast(IntegerType)
      case "exp"   => arity(1); exp(a0)
      case "log"   => arity(1); log(a0)
      case "log10" => arity(1); log10(a0)
      case "e"  => arity(0); lit(math.E)
      case "pi" => arity(0); lit(math.Pi)
      // openCypher trigonometric registry (deterministic libm maps)
      case "sin"  => arity(1); sin(a0)
      case "cos"  => arity(1); cos(a0)
      case "tan"  => arity(1); tan(a0)
      case "asin" => arity(1); asin(a0)
      case "acos" => arity(1); acos(a0)
      case "atan" => arity(1); atan(a0)
      case "atan2" => arity(2); atan2(a0, a1)
      case "radians" => arity(1); radians(a0)
      case "degrees" => arity(1); degrees(a0)
      // haversin(x) = (1 - cos(x)) / 2, openCypher's spelling
      case "haversin" => arity(1); (lit(1.0) - cos(a0)) / lit(2.0)
      // temporal components (also reachable as dot accessors —
      // `x.prop.year` on columns, `d.year` on temporal values; Cypher
      // temporal component access, extension)
      case n if Parser.TemporalComponents(n) || Parser.TimeComponents(n) =>
        arity(1)
        typeOf(f.args.head) match {
          case Some(_: DayTimeIntervalType) => intervalComponent(n, a0)
          case t2 if Parser.TemporalComponents(n) =>
            temporalComponent(n, a0, t2.contains(DateType))
          case _ => throw new CypherTypeException(
            s"$n() requires a time value (day-time interval)")
        }
      // namespaced temporal functions (round 12, extensions —
      // Neo4j's date.truncate/datetime.truncate/duration.between):
      // both truncates lower to Spark's codegen'd date_trunc over a
      // timestamp; date.truncate casts back to DATE and rejects
      // sub-day units. duration.between is EXACT timestamp
      // subtraction — a day-time interval (Neo4j normalizes to a
      // months+days+seconds composite; Spark cannot mix year-month
      // and day-time intervals, so the exact form is the contract).
      case "date.truncate" | "datetime.truncate" =>
        arity(2)
        val unit = f.args.head match {
          case ast.Lit(u: String) => u.toLowerCase(java.util.Locale.ROOT)
          case _ => throw new CypherSyntaxException(
            s"${f.name}(unit, x): the unit must be a literal string")
        }
        val dateUnits = Set("year", "quarter", "month", "week", "day")
        val tsUnits = dateUnits ++ Set("hour", "minute", "second")
        val allowed = if (f.name == "date.truncate") dateUnits else tsUnits
        if (!allowed(unit))
          throw new CypherSyntaxException(
            s"${f.name} unit '$unit' (supported: " +
            allowed.toSeq.sorted.mkString(", ") + ")")
        val truncated = date_trunc(unit, a1.cast(TimestampType))
        if (f.name == "date.truncate") truncated.cast(DateType)
        else truncated
      case "duration.between" =>
        arity(2)
        a1.cast(TimestampType) - a0.cast(TimestampType)
      // duration.inSeconds (round 13; Neo4j): everything expressed in
      // seconds + fraction — at this engine's storage level a day-time
      // interval IS exact seconds, so the value equals
      // duration.between (Neo4j differs only in component
      // normalization, which Spark's interval type doesn't carry)
      case "duration.inseconds" =>
        arity(2)
        a1.cast(TimestampType) - a0.cast(TimestampType)
      // duration.inDays (round 13; Neo4j): WHOLE days between,
      // truncated toward zero
      case "duration.indays" =>
        arity(2)
        val days = ((unix_seconds(a1.cast(TimestampType)) -
          unix_seconds(a0.cast(TimestampType))) / lit(86400.0))
          .cast(LongType)
        make_dt_interval(days, lit(0), lit(0), lit(0))
      // duration.inMonths (round 13; Neo4j): WHOLE months between,
      // truncated toward zero — a year-month interval
      case "duration.inmonths" =>
        arity(2)
        make_ym_interval(lit(0),
          months_between(a1.cast(TimestampType), a0.cast(TimestampType))
            .cast(IntegerType))
      // openCypher temporal constructors (the reference's value node
      // carries typed DateTime literals, QueryExpressionValue.cs:43-55).
      // A literal argument becomes a TYPED literal at compile time —
      // comparisons against temporal columns are then native, with no
      // string coercion — and a malformed literal is a compile-time
      // Cypher error, not a runtime null.
      case "datetime" | "localdatetime" =>
        arity(1)
        f.args.head match {
          case Lit(s: String) =>
            lit(java.sql.Timestamp.from(parseDateTime(f.name, s)))
          case MapLit(fields0) =>
            // named timezone in the map form (round 14; Neo4j
            // datetime({…, timezone: '…'})): the calendar components
            // are the WALL TIME in that zone — to_utc_timestamp
            // converts to the stored UTC instant (DST resolved by the
            // session's zone rules, same as the literal form). The
            // zone may be any string expression. localdatetime has no
            // zone by definition.
            val (tzFs, fields) = fields0.partition(
              _._1.toLowerCase(java.util.Locale.ROOT) == "timezone")
            if (tzFs.size > 1)
              throw new CypherSyntaxException(
                s"${f.name}({…}) binds 'timezone' twice")
            if (tzFs.nonEmpty && f.name == "localdatetime")
              throw new CypherSyntaxException(
                "localdatetime({…}) takes no timezone — use datetime()")
            val tz = tzFs.headOption.map(kv => compile(kv._2))
            // epoch constructors (round 13; Neo4j
            // datetime({epochSeconds: …}) / ({epochMillis: …})): the
            // instant arrives as a number — timestamp_seconds /
            // timestamp_millis, exclusive of calendar components. A
            // timezone entry is accepted and IGNORED here: an instant
            // is zone-independent (the zone only affects Neo4j's
            // presentation, which this engine stores as UTC).
            if (fields.exists(kv => Set("epochseconds", "epochmillis")(
                kv._1.toLowerCase(java.util.Locale.ROOT)))) {
              val norm = fields.map { case (k, v) =>
                k.toLowerCase(java.util.Locale.ROOT) -> v }
              if (norm.size != 1)
                throw new CypherSyntaxException(
                  s"${f.name}({epochSeconds|epochMillis: …}) takes the " +
                  "epoch value alone — calendar components cannot mix " +
                  "with an instant")
              norm.head match {
                case ("epochseconds", e2) =>
                  timestamp_seconds(compile(e2).cast(LongType))
                case (_, e2) =>
                  timestamp_millis(compile(e2).cast(LongType))
              }
            } else {
              // map constructor (round 12; Neo4j datetime({year: …})):
              // make_timestamp over the component expressions —
              // columns compose, absent calendar fields default to
              // their floor
              val c2 = temporalMapFields(f.name, fields,
                Seq("year", "month", "day", "hour", "minute", "second"))
              val naive = make_timestamp(c2("year"), c2("month"),
                c2("day"), c2("hour"), c2("minute"), c2("second"))
              tz.map(to_utc_timestamp(naive, _)).getOrElse(naive)
            }
          case _ => to_timestamp(a0)
        }
      case "date" =>
        arity(1)
        f.args.head match {
          case Lit(s: String) => lit(java.sql.Date.valueOf(parseDate(s)))
          case MapLit(fields) =>
            val c2 = temporalMapFields("date", fields,
              Seq("year", "month", "day"))
            make_date(c2("year"), c2("month"), c2("day"))
          case _ => to_date(a0)
        }
      // time('13:45:06[.sss][±hh:mm|Z]') / localtime('13:45:06') and
      // the component-map forms (round 13; Neo4j's time-of-day
      // types): Spark has no TIME type, so both lower to a DAY-TIME
      // INTERVAL measuring the duration since midnight — ordering,
      // equality and duration arithmetic are then Spark-native
      // codegen'd interval ops, and the component accessors read
      // date_part over the interval. time() with a zone offset
      // normalizes to the UTC time of day (local value minus offset,
      // wrapped into [0, 24h)); localtime rejects offsets. The map
      // form takes arbitrary component expressions via
      // make_dt_interval (values outside their calendar range are the
      // caller's contract, like Spark's own make_dt_interval).
      case "time" | "localtime" =>
        arity(1)
        f.args.head match {
          case Lit(s: String) => lit(parseTimeLit(f.name, s))
          case MapLit(fields) =>
            val allowed = Seq("hour", "minute", "second")
            val norm = fields.map { case (k, v) =>
              k.toLowerCase(java.util.Locale.ROOT) -> v }
            norm.groupBy(_._1).collectFirst {
              case (k, vs) if vs.size > 1 => k }
              .foreach(k => throw new CypherSyntaxException(
                s"${f.name}({…}) binds '$k' twice"))
            norm.map(_._1).find(!allowed.contains(_)).foreach(k =>
              throw new CypherSyntaxException(
                s"${f.name}({…}) has no component '$k' (supported: " +
                allowed.mkString(", ") + ")"))
            if (!norm.exists(_._1 == "hour"))
              throw new CypherSyntaxException(
                s"${f.name}({…}) requires an hour")
            val m = norm.toMap
            def comp(k: String): Column =
              m.get(k).map(e2 => compile(e2).cast(IntegerType))
                .getOrElse(lit(0))
            make_dt_interval(lit(0), comp("hour"), comp("minute"),
              comp("second"))
          case _ => throw new CypherNotSupportedException(
            s"${f.name}() requires a literal time string or a " +
            "component map")
        }
      // duration('P30D') — a TYPED ANSI interval literal; +/- with
      // date/timestamp columns then lowers to Spark's native interval
      // arithmetic (DateAddYMInterval / TimeAdd), still codegen'd
      case "duration" =>
        arity(1)
        f.args.head match {
          case Lit(s: String) => DurationLit.parse(s) match {
            case Left(p)  => lit(p)
            case Right(d) => lit(d)
          }
          case _ => throw new CypherNotSupportedException(
            "duration() requires a literal ISO-8601 string")
        }
      // graph introspection (extensions; openCypher stdlib): the
      // argument is an ENTITY variable, resolved against the schema at
      // compile time — labels/type/keys fold to literals (the schema is
      // static), id/properties read the bound columns. No runtime
      // dispatch, so everything below stays inside codegen.
      case "id" =>
        entityArg(f, "id") match {
          case (al, NodeBinding(n)) => col(pref(physAlias(al), n.idColumn))
          case (_, EdgeBinding(_)) => throw new CypherNotSupportedException(
            "id() on a relationship — this schema keys edges by " +
            "(src, sink); project those columns instead")
          case _ => throw new IllegalStateException
        }
      // Neo4j 5 elementId(): a STRING identity — label-qualified so ids
      // stay unique across node tables (id() is the raw key); edges
      // stringify their (src, sink) pair under the verb's table, plus
      // the schema's optional per-row key column (round 15; VERDICT-
      // r14 #4) when one is declared — which restores Neo4j's
      // per-relationship uniqueness under PARALLEL edges. Without a
      // declared row key the documented DIVERGENCE stands (like
      // valueType's LIST/MAP note): several rows of one verb between
      // the same (src, sink) pair share an element id — the
      // relational model carries no per-row edge key to qualify with.
      case "elementid" =>
        entityArg(f, "elementId") match {
          case (al, NodeBinding(n)) =>
            concat_ws(":", lit(n.label),
              col(pref(physAlias(al), n.idColumn)).cast(StringType))
          case (al, EdgeBinding(e2)) =>
            concat_ws(":",
              lit(e2.verb) +:
              col(pref(physAlias(al), e2.srcIdColumn)).cast(StringType) +:
              col(pref(physAlias(al), e2.sinkIdColumn)).cast(StringType) +:
              e2.rowKeyColumn.toSeq.map { rk =>
                // a PRESENT edge row (non-null endpoint) with a NULL
                // row key raises (round 16; ADVICE-r15 #5): concat_ws
                // silently skips nulls, so the id would degrade to
                // the (verb, src, snk) spelling — aliasing a
                // sibling's elementId, the exact collision the row
                // key exists to prevent. An OPTIONAL-miss row (all
                // columns null) stays the null-skipping shape.
                val rkc = col(pref(physAlias(al), rk))
                val srcc = col(pref(physAlias(al), e2.srcIdColumn))
                when(assert_true(srcc.isNull || rkc.isNotNull,
                  lit(s"elementId(): null row-key column '$rk' on a " +
                    s"'${e2.verb}' row — a null key would alias " +
                    "another edge's elementId; backfill the row key " +
                    "column")).isNull,
                  rkc.cast(StringType))
              }: _*)
          case _ => throw new IllegalStateException
        }
      case "labels" =>
        entityArg(f, "labels") match {
          case (al, NodeBinding(n)) =>
            // round 12: schema-declared SUB-LABELS the row actually
            // matches join the primary (Neo4j's multi-label read
            // face) — one when() per declared sub-label over its
            // discriminator column, nulls compacted away; sorted for
            // a deterministic order after the primary
            val subs = n.subLabels.toSeq.sortBy(_._1).map {
              case (sl, (prop, v)) =>
                when(col(pref(physAlias(al), prop)) === lit(v), lit(sl))
            }
            if (subs.isEmpty) array(lit(n.label))
            else array_compact(array(lit(n.label) +: subs: _*))
          case _ => throw new CypherBindingException(
            "labels() expects a node variable (type() for relationships)")
        }
      case "type" =>
        entityArg(f, "type") match {
          case (_, EdgeBinding(e)) => lit(e.verb)
          case _ => throw new CypherBindingException(
            "type() expects a relationship variable (labels() for nodes)")
        }
      // startNode/endNode (extensions): Neo4j returns the node entity;
      // this engine's value surface is key-valued (the id() convention),
      // so these read the edge row's endpoint id columns — no join, the
      // keys already ride the edge frame
      case "startnode" | "endnode" =>
        entityArg(f, f.name) match {
          case (al, EdgeBinding(e)) =>
            col(pref(physAlias(al),
              if (f.name == "startnode") e.srcIdColumn else e.sinkIdColumn))
          case _ => throw new CypherBindingException(
            s"${f.name}() expects a relationship variable")
        }
      // nodes(p)/relationships(p) (extensions; the reference has no
      // paths at all — CypherVisitor.cs:998-1002): read the witness
      // array the compiler materialized at MATCH time for this path —
      // array<struct> of the hops' entity columns, composing with the
      // whole higher-order-function surface ([n IN nodes(p) | n.prop],
      // quantifiers, reduce, indexing)
      case "nodes" | "relationships" =>
        arity(1)
        f.args.head match {
          case ast.Ref(a, None) if scope.get(a).contains(PathBinding) =>
            val cn = pref(physAlias(a),
              if (f.name == "nodes") "__nodes" else "__rels")
            if (!colTypes.contains(cn))
              throw new CypherNotSupportedException(
                s"${f.name}($a) — this path binds only a length: " +
                "bounded [*lo..hi] paths and unbounded shortestPath " +
                "over a homogeneous chain carry both accessors " +
                "(round 13); heterogeneous-chain and allShortestPaths " +
                "witnesses stay unsupported")
            col(cn)
          case _ => throw new CypherNotSupportedException(
            s"${f.name}() expects a named-path variable")
        }
      case "keys" =>
        // entity → declared columns; struct-typed VALUE (map literal,
        // properties(), map projection) → its field names (round 13)
        arity(1)
        typeOf(f.args.head) match {
          case Some(StructType(fs2)) =>
            array(fs2.map(f2 => lit(f2.name)): _*)
          case _ =>
            val (_, b) = entityArg(f, "keys")
            array(Compiler.entityCols(b).map(lit): _*)
        }
      case "properties" =>
        val (al, b) = entityArg(f, "properties")
        struct(Compiler.entityCols(b).map(c =>
          col(pref(physAlias(al), c)).as(c)): _*)

      case other =>
        throw new CypherNotSupportedException(s"function $other(...)")
    }
  }

  /** Resolves a one-argument entity-variable call (id/labels/type/
    * keys/properties) to its (alias, binding). */
  private def entityArg(f: Func, fn: String): (String, Binding) = {
    if (f.args.size != 1)
      throw new CypherSyntaxException(s"$fn() expects 1 argument")
    f.args.head match {
      case Ref(al, None) => scope.get(al) match {
        case Some(b @ (NodeBinding(_) | EdgeBinding(_))) => (al, b)
        case Some(ValueBinding) => throw new CypherBindingException(
          s"$fn() expects a node/relationship variable, '$al' is a value")
        case Some(PathBinding) => throw new CypherBindingException(
          s"$fn() expects a node/relationship variable, '$al' is a path")
        case None =>
          throw new CypherBindingException(s"unknown variable '$al'")
      }
      case _ => throw new CypherSyntaxException(
        s"$fn() expects an entity variable argument")
    }
  }

  /** ISO-8601 datetime literal (`2015-07-21T21:40:32[.ssss]`), with a
    * bare date accepted as midnight — openCypher temporal literal
    * forms. Round 14: zoned forms (`…Z`, `…±hh:mm`, and the named
    * `…[America/New_York]` with or without an explicit offset) are
    * legal for datetime() and convert to their UTC instant (the
    * engine's storage zone — Verify/Bench/tests pin the session to
    * UTC); java.time resolves DST gaps/overlaps by the ISO rules
    * (gap shifts forward, overlap takes the earlier offset), the same
    * resolution Neo4j uses. localdatetime() rejects any zone.
    * Round 15 (ADVICE-r14): returns the INSTANT, not a wall-time
    * LocalDateTime — the call site builds the literal with
    * java.sql.Timestamp.from, which is JVM-default-zone-independent
    * (Timestamp.valueOf(LocalDateTime) would re-interpret the wall
    * time in the JVM zone and shift the stored instant on any
    * non-UTC JVM). Unzoned forms are the UTC wall time by the
    * engine's storage convention. */
  private def parseDateTime(fn: String, s: String)
      : java.time.Instant = {
    import java.time._
    def bad(): Nothing =
      throw new CypherSyntaxException(s"invalid $fn literal '$s'")
    def noZone(x: String): LocalDateTime =
      try {
        if (x.contains("T")) LocalDateTime.parse(x)
        else LocalDate.parse(x).atStartOfDay()
      } catch { case _: format.DateTimeParseException => bad() }
    val zoned: Option[ZonedDateTime] =
      try Some(ZonedDateTime.parse(s))
      catch {
        case _: format.DateTimeParseException =>
          val b = s.indexOf('[')
          if (b >= 0 && s.endsWith("]"))
            try Some(noZone(s.substring(0, b)).atZone(
              ZoneId.of(s.substring(b + 1, s.length - 1))))
            catch { case _: DateTimeException =>
              throw new CypherSyntaxException(
                s"unknown timezone in $fn literal '$s'") }
          else None
      }
    zoned match {
      case Some(z) =>
        if (fn == "localdatetime") throw new CypherSyntaxException(
          "localdatetime() takes no timezone or offset — use datetime()")
        z.toInstant
      case None => noZone(s).toInstant(ZoneOffset.UTC)
    }
  }

  private def parseDate(s: String): java.time.LocalDate =
    try java.time.LocalDate.parse(s)
    catch { case _: java.time.format.DateTimeParseException =>
      throw new CypherSyntaxException(s"invalid date literal '$s'")
    }

  /** Aggregations (reference: AggregationFunction.cs:11-85, semantics
   *  SQLRenderer.cs:655-714). `first`→min / `last`→max follows the
   *  reference's own rendering (SQLRenderer.cs:98-99), which also makes
   *  them deterministic. count(entity) counts the entity's id key;
   *  count(DISTINCT edge) distinct-counts the (src, sink) pair — the
   *  reference rejects that case because src alone under-keys an edge
   *  (SQLRenderer.cs:675-679); we key it correctly instead. */
  private def compileAgg(a: Agg): Column = {
    val entity: Option[(String, Binding)] = a.arg match {
      case Some(Ref(al, None)) => scope.get(al) match {
        case Some(b @ (NodeBinding(_) | EdgeBinding(_))) => Some((al, b))
        case _ => None
      }
      case _ => None
    }
    entity match {
      case Some((al, b)) =>
        if (a.name == "collect") {
          // collect(n) over a whole entity (round 12): an array of the
          // entity's property STRUCT — the properties() shape per
          // element — so `UNWIND collect(n) AS x … x.prop` round-trips
          // rows and the higher-order surface composes. DISTINCT
          // dedups whole structs (node rows are id-unique anyway;
          // parallel edges with equal properties collapse).
          val st = struct(Compiler.entityCols(b).map(c2 =>
            col(pref(physAlias(al), c2)).as(c2)): _*)
          return if (a.distinct) collect_set(st) else collect_list(st)
        }
        if (a.name != "count")
          throw new CypherNotSupportedException(
            s"${a.name}() over an entity — aggregate a property instead")
        b match {
          case NodeBinding(n) =>
            val k = col(pref(physAlias(al), n.idColumn))
            if (a.distinct) countDistinct(k) else count(k)
          case EdgeBinding(e) =>
            val s = col(pref(physAlias(al), e.srcIdColumn))
            val k = col(pref(physAlias(al), e.sinkIdColumn))
            if (a.distinct) countDistinct(s, k) else count(s)
          case ValueBinding | PathBinding => throw new IllegalStateException
        }
      case None if a.arg.isEmpty =>
        if (a.name == "count") count(lit(1)) // count(*), extension
        else throw new CypherSyntaxException(s"${a.name}() needs an argument")
      case None =>
        val c = compile(a.arg.get)
        a.name match {
          case "count" => if (a.distinct) countDistinct(c) else count(c)
          // DISTINCT variants (extension): dedup-before-buffer via the
          // isDistinct AggregateExpression flag (partial distinct on
          // (group keys, value), map-side combinable); min/max over a
          // set equal min/max over the bag, so DISTINCT is a no-op
          case "sum"   => if (a.distinct) sum_distinct(c) else sum(c)
          case "avg"   =>
            if (a.distinct)
              org.apache.spark.sql.GraftSqlBridge.avgDistinct(c)
            else avg(c)
          case "min"   => min(c)
          case "max"   => max(c)
          case "first" => min(c)
          case "last"  => max(c)
          case "stdev"  =>
            if (a.distinct)
              org.apache.spark.sql.GraftSqlBridge.stddevSampDistinct(c)
            else stddev_samp(c)
          case "stdevp" =>
            if (a.distinct)
              org.apache.spark.sql.GraftSqlBridge.stddevPopDistinct(c)
            else stddev_pop(c)
          // extension: list aggregate (order is row order, unspecified
          // across partitions — like Cypher's)
          case "collect" =>
            if (a.distinct) collect_set(c) else collect_list(c)
          case "percentilecont" => percentile(c, lit(a.percentile.get))
          case "percentiledisc" =>
            // engine-native exact discrete percentile: buffers
            // (value -> count), merged map-side — a giant single group
            // costs #distinct values, not #rows (a collect_list
            // formulation OOMs on a 100 TB global percentile)
            org.apache.spark.sql.GraftSqlBridge
              .percentileDisc(c, a.percentile.get)
          case other =>
            throw new CypherNotSupportedException(s"aggregate $other")
        }
    }
  }
}

/** Cypher `duration('ISO-8601')` literals (extension). Spark ANSI
  * intervals keep year-month and day-time apart, so the literal parses
  * to either a [[java.time.Period]] (Y/M → year-month interval) or a
  * [[java.time.Duration]] (W/D/T → day-time interval); a literal mixing
  * the two granularities is rejected — write two durations. */
private[cypher] object DurationLit {
  private val Pat = ("^(-?)P(?:(\\d+)Y)?(?:(\\d+)M)?(?:(\\d+)W)?" +
    "(?:(\\d+)D)?(?:T(?:(\\d+)H)?(?:(\\d+)M)?(?:(\\d+(?:\\.\\d+)?)S)?)?$").r

  def parse(s: String): Either[java.time.Period, java.time.Duration] =
    s match {
      case Pat(sign, y, mo, w, d, h, mi, sec) =>
        val neg = sign == "-"
        def i(x: String): Int = if (x == null) 0 else x.toInt
        val hasYm = y != null || mo != null
        val hasDt = w != null || d != null || h != null || mi != null ||
          sec != null
        if (hasYm && hasDt)
          throw new CypherNotSupportedException(
            s"duration '$s' mixes year/month with day/time components — " +
            "Spark ANSI intervals keep them apart; use two durations")
        if (!hasYm && !hasDt)
          throw new CypherSyntaxException(s"empty duration literal '$s'")
        if (hasYm) {
          val p = java.time.Period.of(i(y), i(mo), 0)
          Left(if (neg) p.negated() else p)
        } else {
          var dur = java.time.Duration.ofDays(7L * i(w) + i(d))
            .plusHours(i(h)).plusMinutes(i(mi))
          if (sec != null) {
            val secs = BigDecimal(sec)
            dur = dur.plusNanos((secs * 1000000000L).toLongExact)
          }
          Right(if (neg) dur.negated() else dur)
        }
      case _ =>
        throw new CypherSyntaxException(s"invalid duration literal '$s'")
    }
}
