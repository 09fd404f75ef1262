package graft.cypher

import org.apache.spark.sql.types._

import ast._

/**
 * Static expression typing over the physical schema — the role of the
 * reference's coercion tables (reference:
 * src/openCypherParser/AST/LookupTables/TypeCoersionTables.cs:17,1197,
 * 1397), which type every expression at plan time. Statically illegal
 * operand combinations raise a typed [[CypherTypeException]] at compile
 * time instead of surfacing later as Catalyst `AnalysisException`s,
 * and the compiler's coercion decisions (string `+` → concat, integral
 * division) read inferred types instead of probing Catalyst with an
 * empty-relation `select` per operator (the round-1 compile-time cost).
 *
 * `None` means statically unknown (NULL literal, list literals, or a
 * column the scope cannot see) — unknown operands are permissive, like
 * the reference's Unknown type, and fail at bind time elsewhere if
 * genuinely unresolvable.
 */
final class TypeInference(refType: Ref => Option[DataType],
                          pathRef: Ref => Boolean = _ => false,
                          entityStruct: String => Option[StructType] =
                            _ => None,
                          entityPropTypes: String => Option[Seq[DataType]] =
                            _ => None) {

  /** Lambda-scoped variables (list comprehension / quantifier / reduce
   *  bodies): name → element type. Shadows outer refs for bare names.
   *  A stack discipline via save/restore keeps nesting correct. */
  private var lambdaEnv: Map[String, Option[DataType]] = Map.empty

  /** Runs `f` with `name` bound to `dt` in the lambda scope. Public so
   *  the expression compiler can keep typing and compilation in the
   *  same scope while it builds higher-order-function bodies. */
  def bound[A](name: String, dt: Option[DataType])(f: => A): A = {
    val saved = lambdaEnv
    lambdaEnv = lambdaEnv + (name -> dt)
    try f finally lambdaEnv = saved
  }

  /** Element type of a list-typed expression; typed failure on a known
   *  non-list. */
  def elemType(listE: Expr, what: String): Option[DataType] =
    infer(listE) match {
      case Some(ArrayType(e, _)) => Some(e)
      case Some(other) =>
        fail(s"$what requires a list, got ${other.simpleString}")
      case None => None
    }

  private def isNumeric(t: DataType): Boolean = t match {
    case _: NumericType => true
    case _ => false
  }
  private def isIntegralT(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def isTemporal(t: DataType): Boolean = t match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Numeric widening (Spark's binary-arithmetic result shape).
    * Decimal-aware: decimal×decimal/integral widens to the covering
    * decimal — collapsing to double would silently round values beyond
    * 2^53 (CASE branches are cast to this type). */
  private def widen(a: DataType, b: DataType): DataType = {
    def asDec(t: DataType): Option[DecimalType] = t match {
      case d: DecimalType => Some(d)
      case ByteType       => Some(DecimalType(3, 0))
      case ShortType      => Some(DecimalType(5, 0))
      case IntegerType    => Some(DecimalType(10, 0))
      case LongType       => Some(DecimalType(20, 0))
      case _              => None
    }
    if (a == b) a
    else if (a == DoubleType || b == DoubleType) DoubleType
    else if (a == FloatType || b == FloatType)
      if (isIntegralT(a) || isIntegralT(b)) DoubleType
      else DoubleType // float × decimal
    else if (a.isInstanceOf[DecimalType] || b.isInstanceOf[DecimalType])
      (asDec(a), asDec(b)) match {
        case (Some(x), Some(y)) =>
          val scale = math.max(x.scale, y.scale)
          val intDigits = math.max(x.precision - x.scale, y.precision - y.scale)
          DecimalType(math.min(intDigits + scale, DecimalType.MAX_PRECISION), scale)
        case _ => DoubleType
      }
    else LongType // mixed integrals
  }

  private def fail(msg: String): Nothing = throw new CypherTypeException(msg)

  private def requireNumeric(t: Option[DataType], where: String): Unit =
    t.foreach(x => if (!isNumeric(x)) fail(s"$where requires a numeric operand, got ${x.simpleString}"))
  private def requireBoolean(t: Option[DataType], where: String): Unit =
    t.foreach(x => if (x != BooleanType) fail(s"$where requires a boolean operand, got ${x.simpleString}"))
  private def requireString(t: Option[DataType], where: String): Unit =
    t.foreach(x => if (x != StringType) fail(s"$where requires a string operand, got ${x.simpleString}"))

  /** Common result type of a DYNAMIC subscript (round 14): equal types
    * pass through; integral mixes widen to long, numeric mixes to
    * double; anything else is typed — a static engine needs ONE column
    * type where Neo4j's n[expr] returns Any. */
  private def commonSubscriptType(ts: Seq[DataType], what: String)
      : DataType = {
    val ds = ts.distinct
    if (ds.size == 1) ds.head
    else if (ds.forall(d => d == LongType || d == IntegerType ||
        d == ShortType || d == ByteType)) LongType
    else if (ds.forall(_.isInstanceOf[NumericType])) DoubleType
    else fail(s"dynamic $what subscript over a heterogeneous namespace " +
      s"(${ds.map(_.simpleString).mkString(", ")}) — use a literal key " +
      "or align the property types")
  }

  def infer(e: Expr): Option[DataType] = e match {
    case Lit(null)       => None
    case Lit(_: String)  => Some(StringType)
    case Lit(_: Boolean) => Some(BooleanType)
    case Lit(_: Long)    => Some(LongType)
    case Lit(_: Int)     => Some(IntegerType)
    case Lit(_: Double)  => Some(DoubleType)
    case Lit(_: java.sql.Timestamp) => Some(TimestampType)
    case Lit(_: java.time.Instant)  => Some(TimestampType)
    case Lit(_: java.sql.Date)      => Some(DateType)
    case Lit(_: java.time.LocalDate) => Some(DateType)
    case Lit(_)          => None

    case Ref(a, None) if lambdaEnv.contains(a) => lambdaEnv(a)
    // dot access on a lambda-bound element: struct fields (entity
    // structs from nodes(p)/relationships(p), map literals) and
    // temporal component accessors; unknown element types stay
    // permissive
    case Ref(a, Some(p)) if lambdaEnv.contains(a) =>
      lambdaEnv(a) match {
        case Some(StructType(fs)) =>
          Some(fs.find(_.name == p).map(_.dataType).getOrElse(
            fail(s"list element '$a' has no field '$p' (fields: " +
              fs.map(_.name).mkString(", ") + ")")))
        case Some(DateType | TimestampType)
            if Parser.TemporalComponents(
              p.toLowerCase(java.util.Locale.ROOT)) =>
          val comp = p.toLowerCase(java.util.Locale.ROOT)
          Some(if (comp.startsWith("epoch")) LongType else IntegerType)
        case Some(other) =>
          fail(s"'$a.$p' — element type ${other.simpleString} has no " +
            "fields")
        case None => None
      }
    case r: Ref => refType(r)

    // procedure rows are expanded by the compiler before any
    // expression ever compiles; permissive here for safety
    case ProcRows(_) => None

    // generic dot access (round 13): struct → the field's type
    // (missing key is a typed error here — the compiler mirrors it);
    // temporal/interval components type like the lambda-bound case;
    // an un-inferable operand stays permissive (the compiler raises
    // the typed rejection)
    case DotAccess(x, key) =>
      val comp = key.toLowerCase(java.util.Locale.ROOT)
      infer(x) match {
        case Some(StructType(fs)) =>
          // missing key degrades to None — the compiler raises the
          // typed CypherBindingException (same split as ListIndex)
          fs.find(_.name == key).map(_.dataType)
        case Some(DateType | TimestampType | TimestampNTZType)
            if Parser.TemporalComponents(comp) =>
          Some(if (comp.startsWith("epoch")) LongType else IntegerType)
        case Some(_: DayTimeIntervalType)
            if Parser.TimeComponents(comp) =>
          Some(IntegerType)
        case _ => None
      }

    // label predicate (round 13): always boolean
    case HasLabel(_, _) => Some(BooleanType)

    // type predicate (round 13): always boolean
    case TypeIs(x, _, _) => infer(x); Some(BooleanType)

    case Not(x) =>
      requireBoolean(infer(x), "NOT"); Some(BooleanType)
    case Neg(x) =>
      val t = infer(x)
      if (!t.exists(isIntervalT)) requireNumeric(t, "unary -/+")
      t
    case IsNull(x, _) =>
      infer(x); Some(BooleanType)
    case ListLit(items) =>
      items.foreach(infer); None

    case Bin(op, le, re) => inferBin(op, le, re)

    case f: Func => inferFunc(f)
    case a: Agg  => inferAgg(a)

    case CaseExpr(whens, otherwise) =>
      whens.foreach { case (c, _) => requireBoolean(infer(c), "CASE WHEN condition") }
      val branches = (whens.map(_._2) ++ otherwise.toSeq).flatMap(infer)
      // Cross-branch legality at PAIR granularity, following the
      // reference end to end: branch types are unified by the `Plus`
      // coercion row (QueryExpressionCaseExpression.cs:88-117 over
      // TypeCoersionTables.cs), and only then is each branch→target
      // conversion checked against the SQL matrix (SQLRenderer.cs:
      // 112-236, applied at 338-363). The unifier is STRICTER than the
      // matrix and decides reachability, so pair rules come from it:
      //  - string + anything-in-table → string (the matrix's X→NVarChar
      //    rows are all legal, incl. Bit, Decimal, DateTime2);
      //  - boolean + numeric → Invalid (Plus(bool, int..decimal) =
      //    default ⇒ throws BEFORE the matrix's Bit→Int Cast is
      //    reachable — the family rule previously accepted this);
      //  - decimal + double/float → Invalid (Plus(decimal, double/
      //    Single) = default), while decimal + integral → decimal;
      //  - byte[]/Guid are ABSENT from the Plus table: any mixed CASE
      //    branch with binary throws — including binary + string, which
      //    a string-merges-with-anything rule would wrongly accept;
      //  - temporal + numeric/boolean → Invalid (Plus(DateTime, n) =
      //    default; matrix agrees: DateTime2↔numeric is Invalid).
      // Extension (documented): .NET has a single DateTime type, so
      // date×timestamp never mixes in the reference; we widen to the
      // wider temporal rather than reject.
      unifyBranches(branches, "CASE branches")

    // ----- list surface (extensions) ----------------------------------
    case ListComp(v, l, w, m) =>
      val lt = infer(l)
      val et = lt match {
        case Some(ArrayType(e, _)) => Some(e)
        case Some(other) =>
          fail(s"list comprehension requires a list, got ${other.simpleString}")
        case None => None
      }
      bound(v, et) {
        w.foreach(x => requireBoolean(infer(x), "comprehension WHERE"))
        m match {
          case Some(mx) => infer(mx).map(t => ArrayType(t): DataType)
          case None     => lt // pure filter preserves the list type
        }
      }
    case QuantPred(_, v, l, pred) =>
      val et = elemType(l, "any/all/none/single")
      bound(v, et)(requireBoolean(infer(pred), "quantifier predicate"))
      Some(BooleanType)
    case ReduceExpr(acc, init, v, l, step) =>
      val initT = infer(init)
      val et = elemType(l, "reduce")
      // the step is cast back to the accumulator type at compile time
      // (Catalyst's aggregate() needs a stable accumulator type), so the
      // expression's type IS the initial value's type
      bound(acc, initT)(bound(v, et)(infer(step)))
      initT
    case ListIndex(l, from, to, isSlice) =>
      // entity subscript n['key'] (round 13): typed via the entity's
      // property struct; the compiler validates key and form
      l match {
        case Ref(a, None) if entityStruct(a).isDefined && !isSlice =>
          return from match {
            case Some(Lit(k: String)) =>
              entityStruct(a).get.fields.find(_.name == k)
                .map(_.dataType)
            case Some(k) =>
              // dynamic key (round 14): bounded CASE-chain dispatch —
              // result = the PROPERTY columns' common type (round 15,
              // ADVICE-r14: the id/src/sink key columns no longer
              // poison the common shape of numeric-id + uniform-string-
              // property entities; the compiler keeps a key column in
              // the dispatch chain only when its type already matches)
              requireString(infer(k), "dynamic property key")
              val ts = entityPropTypes(a).filter(_.nonEmpty).getOrElse(
                entityStruct(a).get.fields.toSeq.map(_.dataType))
              Some(commonSubscriptType(ts, "property"))
            case _ => None
          }
        case _ =>
      }
      val lt = infer(l)
      // map subscript m['key'] (round 13): struct operand + literal
      // string key → the field's type (the compiler validates the key)
      lt match {
        case Some(StructType(fs)) if !isSlice =>
          return from match {
            case Some(Lit(k: String)) => fs.find(_.name == k).map(_.dataType)
            case Some(k) =>
              requireString(infer(k), "dynamic map key")
              Some(commonSubscriptType(fs.map(_.dataType), "map"))
            case _ => None // compiler raises the typed rejection
          }
        case _ =>
      }
      lt.foreach {
        case ArrayType(_, _) =>
        case _: StructType =>
        case other => fail(s"index/slice requires a list, got ${other.simpleString}")
      }
      from.foreach(x => requireNumeric(infer(x), "list index"))
      to.foreach(x => requireNumeric(infer(x), "list slice end"))
      if (isSlice) lt
      else lt.collect { case ArrayType(e, _) => e }

    // boolean-valued, but only compilable as a MATCH WHERE conjunct —
    // ExprCompiler rejects it with a placement error everywhere else
    case _: ExistsPat => Some(BooleanType)

    // list-valued; rewritten to a Ref over the joined column before
    // compilation — only reaches here in rejected placements
    case _: PatternComp => None

    // struct-typed when every field types statically; partial
    // knowledge degrades to None (permissive) rather than a bad schema
    case MapLit(fields) =>
      val ts = fields.map { case (k, v) => infer(v).map(t => StructField(k, t)) }
      if (ts.forall(_.isDefined)) Some(StructType(ts.map(_.get)))
      else None

    // map projection (round 13): star fields from the entity's declared
    // property struct (or a struct-typed value's fields), explicit
    // items typed like a map literal; any unknown degrades to None
    case MapProjection(alias, items, star) =>
      val explicit = items.map(_._1).toSet
      val starFs: Option[Seq[StructField]] =
        if (!star) Some(Nil)
        else entityStruct(alias)
          .orElse(refType(Ref(alias, None)) match {
            case Some(st: StructType) => Some(st)
            case _ => None
          })
          .map(_.fields.toSeq.filterNot(f => explicit(f.name)))
      val itemFs = items.map { case (k, v) => infer(v).map(StructField(k, _)) }
      if (starFs.isDefined && itemFs.forall(_.isDefined))
        Some(StructType(starFs.get ++ itemFs.map(_.get)))
      else None
  }

  /** Pair-granular branch unifier (the `Plus` coercion row) — shared
    * by CASE branch typing and coalesce(), which merges its arguments
    * under the same legality rules. */
  private def unifyBranches(branches: Seq[DataType],
                            what: String): Option[DataType] = {
    def isFloating(t: DataType): Boolean = t == DoubleType || t == FloatType
    def isDecimalT(t: DataType): Boolean = t.isInstanceOf[DecimalType]
    branches.reduceOption { (a, b) =>
      def mix = fail(s"$what mix ${a.simpleString} and ${b.simpleString}")
      if (a == b) a
      else if (a == BinaryType || b == BinaryType) mix
      else if (a == StringType || b == StringType) StringType
      else if (a == BooleanType || b == BooleanType) mix
      else if ((isDecimalT(a) && isFloating(b)) || (isFloating(a) && isDecimalT(b))) mix
      else if (isNumeric(a) && isNumeric(b)) widen(a, b)
      else if (isTemporal(a) && isTemporal(b))
        // wider temporal wins: a date-first CASE must not truncate
        // timestamp branches to date
        if (a == TimestampType || b == TimestampType) TimestampType
        else if (a == TimestampNTZType || b == TimestampNTZType) TimestampNTZType
        else a
      else mix
    }
  }

  private def inferBin(op: BinOp, le: Expr, re: Expr): Option[DataType] = {
    val l = infer(le)
    val r = infer(re)
    op match {
      case BinOp.Add =>
        if (l.contains(StringType) || r.contains(StringType)) Some(StringType)
        else if (l.exists(isIntervalT) || r.exists(isIntervalT))
          for (a <- l; b <- r) yield intervalArith(a, b, "+", commute = true)
        else {
          requireNumeric(l, "+"); requireNumeric(r, "+")
          for (a <- l; b <- r) yield widen(a, b)
        }
      case BinOp.Sub if r.exists(isIntervalT) =>
        for (a <- l; b <- r) yield intervalArith(a, b, "-", commute = false)
      // interval scaling (round 13; Neo4j duration * n / duration ÷ n):
      // Spark's Multiply/DivideDTInterval — interval on either side of
      // *, the LEFT of /
      case BinOp.Mul
          if l.exists(isIntervalT) != r.exists(isIntervalT) =>
        val (iv, num) = if (l.exists(isIntervalT)) (l, r) else (r, l)
        requireNumeric(num, "interval scaling")
        iv
      case BinOp.Div if l.exists(isIntervalT) =>
        requireNumeric(r, "interval scaling")
        l
      case BinOp.Sub | BinOp.Mul | BinOp.Mod =>
        requireNumeric(l, "arithmetic"); requireNumeric(r, "arithmetic")
        for (a <- l; b <- r) yield widen(a, b)
      case BinOp.Div =>
        requireNumeric(l, "/"); requireNumeric(r, "/")
        // integral operands lower to IntegralDivide, whose result type
        // is always LONG (not the widened operand type)
        for (a <- l; b <- r)
          yield if (isIntegralT(a) && isIntegralT(b)) LongType else DoubleType
      case BinOp.Pow =>
        requireNumeric(l, "^"); requireNumeric(r, "^"); Some(DoubleType)
      case BinOp.And | BinOp.Or | BinOp.Xor =>
        requireBoolean(l, "AND/OR/XOR"); requireBoolean(r, "AND/OR/XOR")
        Some(BooleanType)
      case BinOp.Lt | BinOp.Le | BinOp.Gt | BinOp.Ge | BinOp.Eq | BinOp.Neq =>
        // comparisons: boolean only compares with boolean; everything
        // else follows engine coercion (string↔temporal is the q22 path)
        for (a <- l; b <- r)
          if ((a == BooleanType) != (b == BooleanType))
            fail(s"cannot compare ${a.simpleString} with ${b.simpleString}")
        Some(BooleanType)
      case BinOp.In =>
        infer(le); infer(re); Some(BooleanType)
      case BinOp.Regex =>
        requireString(l, "=~"); Some(BooleanType)
    }
  }

  private def isIntervalT(t: DataType): Boolean = t match {
    case _: DayTimeIntervalType | _: YearMonthIntervalType => true
    case _ => false
  }

  /** Temporal ± interval result types, following Spark's
    * ResolveBinaryArithmetic: date ± year-month stays date, any
    * day-time operand promotes a date to timestamp, timestamps keep
    * their type; same-kind intervals combine. Anything else is a
    * static type error. */
  private def intervalArith(a: DataType, b: DataType, op: String,
                            commute: Boolean): DataType = {
    def combine(t: DataType, iv: DataType): Option[DataType] = (t, iv) match {
      case (DateType, _: YearMonthIntervalType) => Some(DateType)
      case (DateType, _: DayTimeIntervalType)   => Some(TimestampType)
      case (tt @ (TimestampType | TimestampNTZType),
            _: YearMonthIntervalType | _: DayTimeIntervalType) => Some(tt)
      case (_: YearMonthIntervalType, _: YearMonthIntervalType) =>
        Some(YearMonthIntervalType.DEFAULT)
      case (_: DayTimeIntervalType, _: DayTimeIntervalType) =>
        Some(DayTimeIntervalType.DEFAULT)
      case _ => None
    }
    (if (isIntervalT(b)) combine(a, b) else None)
      .orElse(if (commute && isIntervalT(a)) combine(b, a) else None)
      .getOrElse(fail(
        s"cannot apply $op to ${a.simpleString} and ${b.simpleString}"))
  }

  private def inferFunc(f: Func): Option[DataType] = {
    def t(i: Int): Option[DataType] =
      if (f.args.isDefinedAt(i)) infer(f.args(i)) else None
    f.name match {
      case "tofloat" | "todouble" | "tofloatornull" =>
        t(0); Some(DoubleType)
      case "tostring" | "tostringornull" => t(0); Some(StringType)
      case "toboolean" | "tobooleanornull" => t(0); Some(BooleanType)
      case "tointeger" | "tolong" | "tointegerornull" =>
        t(0); Some(LongType)
      // `a || b` (round 13): list ++ list, or string concat; two
      // known non-string scalars are a typed error. List LITERALS
      // type as None, so recognize them syntactically (the result
      // then stays permissively None — the compiler still emits the
      // array concat).
      case "__pipeconcat" =>
        val (a2, b2) = (t(0), t(1))
        val listy = f.args.exists(_.isInstanceOf[ListLit]) ||
          a2.exists(_.isInstanceOf[ArrayType]) ||
          b2.exists(_.isInstanceOf[ArrayType])
        def litArr(e2: Expr): Option[DataType] = e2 match {
          case ListLit(items) if items.nonEmpty =>
            val ts = items.map(infer)
            if (ts.forall(_ == ts.head)) ts.head.map(ArrayType(_))
            else None
          case _ => None
        }
        if (listy)
          a2.collect { case x: ArrayType => (x: DataType) }
            .orElse(b2.collect { case x: ArrayType => (x: DataType) })
            .orElse(litArr(f.args(0))).orElse(litArr(f.args(1)))
        else (a2, b2) match {
          case (Some(x), Some(y))
              if x != StringType && y != StringType =>
            fail("|| concatenates strings and lists, got " +
              s"${x.simpleString} and ${y.simpleString}")
          case _ => Some(StringType)
        }
      case "not" => requireBoolean(t(0), "not()"); Some(BooleanType)
      case "startswith" | "endswith" | "contains" =>
        requireString(t(0), f.name); requireString(t(1), f.name)
        Some(BooleanType)
      case "left" | "right" =>
        requireString(t(0), f.name); requireNumeric(t(1), f.name)
        Some(StringType)
      case "trim" | "ltrim" | "rtrim" | "toupper" | "upper" | "tolower" | "lower" =>
        requireString(t(0), f.name); Some(StringType)
      // trim-specifier forms: last arg is the input string
      case "__trim_both" | "__trim_leading" | "__trim_trailing" =>
        requireString(t(f.args.size - 1), "trim(… FROM …)")
        Some(StringType)
      case "char_length" | "character_length" =>
        requireString(t(0), f.name); Some(IntegerType)
      case "lpad" | "rpad" =>
        requireString(t(0), f.name); requireNumeric(t(1), f.name)
        if (f.args.size > 2) requireString(t(2), f.name)
        Some(StringType)
      case "btrim" =>
        requireString(t(0), "btrim")
        if (f.args.size > 1) requireString(t(1), "btrim")
        Some(StringType)
      case "normalize" =>
        // the form argument may be Neo4j's bare keyword (an unbound
        // Ref) — the compiler validates it; only the input types here
        requireString(t(0), "normalize"); Some(StringType)
      case "tointegerlist" | "tofloatlist" | "tobooleanlist" |
          "tostringlist" =>
        t(0).foreach {
          case ArrayType(_, _) | NullType =>
          case other =>
            fail(s"${f.name}() requires a list, got ${other.simpleString}")
        }
        Some(ArrayType(f.name match {
          case "tointegerlist" => LongType
          case "tofloatlist"   => DoubleType
          case "tobooleanlist" => BooleanType
          case _               => StringType
        }))
      case "vector.similarity.cosine" | "vector.similarity.euclidean" =>
        if (f.args.size != 2)
          fail(s"${f.name}() takes exactly 2 vector arguments, got " +
            f.args.size)
        // literal lists type as None statically — check their items
        def chkVec(e: Expr): Unit = e match {
          case ListLit(xs) =>
            xs.foreach(x => requireNumeric(infer(x), f.name))
          case _ => infer(e).foreach {
            case ArrayType(el, _) => requireNumeric(Some(el), f.name)
            case NullType         =>
            case other => fail(
              s"${f.name}() requires numeric lists, got " +
              other.simpleString)
          }
        }
        Seq(0, 1).foreach(i => chkVec(f.args(i)))
        Some(DoubleType)
      case "valuetype" => t(0); Some(StringType)
      case "size" | "length" =>
        // size() covers strings AND lists (the collect()/split() output)
        // - and named paths (extension), whose length is the BIGINT
        // relationship-count column
        f.args.headOption match {
          case Some(r: Ref) if pathRef(r) => Some(LongType)
          case _ => t(0) match {
            case Some(ArrayType(_, _)) => Some(IntegerType)
            case other => requireString(other, f.name); Some(IntegerType)
          }
        }
      case "abs" =>
        val a = t(0); requireNumeric(a, "abs"); a
      case "isnan" =>
        requireNumeric(t(0), "isNaN"); Some(BooleanType)
      case "round" =>
        requireNumeric(t(0), "round"); t(1)
        if (f.args.size > 2) requireString(t(2), "round mode")
        Some(DoubleType)
      case "isempty" =>
        t(0).foreach {
          case StringType | ArrayType(_, _) | NullType =>
          case other => fail(
            s"isEmpty() requires a string or list, got ${other.simpleString}")
        }
        Some(BooleanType)
      case "tail" =>
        t(0) match {
          case Some(a2 @ ArrayType(_, _)) => Some(a2)
          case Some(NullType) => None
          case Some(other) =>
            fail(s"tail() requires a list, got ${other.simpleString}")
          case None => None
        }
      case "floor" | "ceil" => requireNumeric(t(0), f.name); Some(LongType)
      case "sqrt" => requireNumeric(t(0), "sqrt"); Some(DoubleType)
      // -------- extension functions (see ExprCompiler.compileFunc) ----
      case "coalesce" =>
        if (f.args.isEmpty) fail("coalesce() needs at least one argument")
        unifyBranches(f.args.flatMap(infer), "coalesce() arguments")
      case "replace" =>
        Seq(0, 1, 2).foreach(i => requireString(t(i), "replace"))
        Some(StringType)
      case "split" =>
        requireString(t(0), "split"); requireString(t(1), "split")
        Some(ArrayType(StringType))
      case "substring" =>
        requireString(t(0), "substring")
        requireNumeric(t(1), "substring")
        if (f.args.size > 2) requireNumeric(t(2), "substring")
        Some(StringType)
      case "reverse" =>
        t(0) match {
          case Some(a @ ArrayType(_, _)) => Some(a)
          case other => requireString(other, "reverse"); Some(StringType)
        }
      case "head" | "last" =>
        t(0) match {
          case Some(ArrayType(e, _)) => Some(e)
          case Some(other) =>
            fail(s"${f.name}() requires a list, got ${other.simpleString}")
          case None => None
        }
      case "range" =>
        f.args.indices.foreach(i => requireNumeric(t(i), "range"))
        Some(ArrayType(LongType))
      case "sign" => requireNumeric(t(0), "sign"); Some(IntegerType)
      case "exp" | "log" | "log10" | "sin" | "cos" | "tan" | "asin" |
           "acos" | "atan" | "radians" | "degrees" | "haversin" =>
        requireNumeric(t(0), f.name); Some(DoubleType)
      case "atan2" =>
        requireNumeric(t(0), "atan2"); requireNumeric(t(1), "atan2")
        Some(DoubleType)
      case "e" | "pi" => Some(DoubleType)
      case "hour" | "minute" | "second" =>
        // clock components read timestamps AND time-of-day values
        // (day-time intervals, round 13)
        t(0).foreach(x => if (!isTemporal(x) && x != StringType &&
            !x.isInstanceOf[DayTimeIntervalType])
          fail(s"${f.name}() requires a date/timestamp or time, got " +
            x.simpleString))
        Some(IntegerType)
      case "millisecond" =>
        t(0).foreach(x => if (!x.isInstanceOf[DayTimeIntervalType])
          fail(s"millisecond() requires a time value, got ${x.simpleString}"))
        Some(IntegerType)
      case "year" | "month" | "day" | "quarter" | "week" | "dayofweek" =>
        t(0).foreach(x => if (!isTemporal(x) && x != StringType)
          fail(s"${f.name}() requires a date/timestamp, got ${x.simpleString}"))
        Some(IntegerType)
      case "epochmillis" | "epochseconds" =>
        t(0).foreach(x => if (!isTemporal(x) && x != StringType)
          fail(s"${f.name}() requires a date/timestamp, got ${x.simpleString}"))
        Some(LongType)
      case "date.truncate" | "datetime.truncate" =>
        t(0).foreach(x => if (x != StringType)
          fail(s"${f.name} unit must be a string, got ${x.simpleString}"))
        t(1).foreach(x => if (!isTemporal(x))
          fail(s"${f.name}() requires a date/timestamp, got ${x.simpleString}"))
        Some(if (f.name == "date.truncate") DateType else TimestampType)
      case "duration.between" | "duration.inseconds"
         | "duration.indays" | "duration.inmonths" =>
        Seq(0, 1).foreach(i => t(i).foreach(x => if (!isTemporal(x))
          fail(s"${f.name}() requires dates/timestamps, got " +
            x.simpleString)))
        if (f.name == "duration.inmonths")
          Some(YearMonthIntervalType.DEFAULT)
        else Some(DayTimeIntervalType.DEFAULT)
      case "datetime" | "localdatetime" =>
        // string literal/column, an existing temporal (identity/
        // widening via to_timestamp), or a component MAP constructor
        if (!f.args.headOption.exists(_.isInstanceOf[MapLit]))
          t(0).foreach(x => if (x != StringType && !isTemporal(x))
            fail(s"${f.name}() requires a string, date/timestamp or " +
              s"component map, got ${x.simpleString}"))
        Some(TimestampType)
      case "date" =>
        if (!f.args.headOption.exists(_.isInstanceOf[MapLit]))
          t(0).foreach(x => if (x != StringType && !isTemporal(x))
            fail(s"date() requires a string, timestamp or component " +
              s"map, got ${x.simpleString}"))
        Some(DateType)
      // time-of-day constructors (round 13): lowered to day-time
      // intervals since midnight — see ExprCompiler's contract note
      case "time" | "localtime" =>
        f.args.headOption match {
          case Some(_: MapLit) | Some(Lit(_: String)) =>
          case _ => fail(s"${f.name}() requires a literal time string " +
            "or component map")
        }
        Some(DayTimeIntervalType.DEFAULT)
      case "duration" => f.args match {
        case Seq(Lit(s: String)) => Some(DurationLit.parse(s).fold(
          _ => YearMonthIntervalType.DEFAULT: DataType,
          _ => DayTimeIntervalType.DEFAULT: DataType))
        case _ => fail("duration() requires a literal ISO-8601 string")
      }
      // graph introspection (extensions): entity-argument calls; the
      // schema-dependent ones (id, properties) are typed by the
      // compiler. Entity refs themselves infer to None, so no arg walk.
      case "labels" | "keys" => Some(ArrayType(StringType))
      // path witness arrays: typed from the materialized column (the
      // compiler names them __{path}___nodes / __{path}___rels); an
      // unmaterialized path (unbounded range) stays None and the
      // compiler raises the typed rejection
      case "nodes" | "relationships" => f.args match {
        case Seq(r @ Ref(a, None)) if pathRef(r) =>
          refType(Ref(a,
            Some(if (f.name == "nodes") "__nodes" else "__rels")))
        case _ => f.args.foreach(infer); None
      }
      case "type" | "elementid" => Some(StringType)
      // properties(n) over an entity: its property struct (typed so
      // generic dot access `properties(n).f` composes statically)
      case "properties" => f.args match {
        case Seq(Ref(a, None)) => entityStruct(a)
        case Seq(x) => infer(x) match {
          case Some(st: StructType) => Some(st)
          case _ => None
        }
        case _ => None
      }
      case "id" | "startnode" | "endnode" => None
      case _ => f.args.foreach(infer); None
    }
  }

  private def inferAgg(a: Agg): Option[DataType] = {
    // entity arguments (count(n)) are typed by the aggregate compiler
    val argT: Option[DataType] = a.arg match {
      case Some(Ref(_, None)) => None
      case Some(x) => infer(x)
      case None => None
    }
    a.name match {
      case "count" => Some(LongType)
      // collect(n) over a whole entity: array of its property struct
      // (typed so size()/lambda dot access compose statically)
      case "collect" if a.arg.exists {
            case Ref(al, None) => entityStruct(al).isDefined
            case _ => false } =>
        a.arg.collect { case Ref(al, None) => al }
          .flatMap(entityStruct).map(st => ArrayType(st): DataType)
      case "sum" =>
        requireNumeric(argT, "sum")
        argT.map(t => if (isIntegralT(t)) LongType else DoubleType)
      case "avg" | "stdev" | "stdevp" =>
        requireNumeric(argT, a.name); Some(DoubleType)
      case "percentilecont" | "percentiledisc" =>
        requireNumeric(argT, a.name); Some(DoubleType)
      case "min" | "max" | "first" | "last" => argT
      // extension: collect(x) → array of the element type
      case "collect" => argT.map(t => ArrayType(t))
      case _ => None
    }
  }
}

/** Statically illegal operand types (reference: the coercion tables
  * reject the combination at plan time). */
class CypherTypeException(msg: String)
  extends CypherException(s"Type error: $msg")
