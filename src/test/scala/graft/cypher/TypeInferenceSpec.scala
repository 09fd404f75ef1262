package graft.cypher

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import ast._
import Analyzer.{Binding, NodeBinding}

/**
 * Property test for the static type pass: on randomly generated
 * expression trees, whenever [[TypeInference]] infers a type WITHOUT
 * raising, compiling the same tree through [[ExprCompiler]] must
 * analyze successfully AND produce exactly the inferred Catalyst type.
 * (The reverse — inference raising — is by construction consistent,
 * since the compiler runs inference first.)
 */
class TypeInferenceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val movieDef = NodeDef("Movie", "id",
    Seq("Title", "Released", "Rating", "Seen"), "movie")

  private lazy val probe: DataFrame = {
    import spark.implicits._
    Seq(("m1", "Apollo 13", 1995, 7.5, true))
      .toDF(Compiler.pref("m", "id"), Compiler.pref("m", "Title"),
        Compiler.pref("m", "Released"), Compiler.pref("m", "Rating"),
        Compiler.pref("m", "Seen"))
  }
  private lazy val scope: Map[String, Binding] =
    Map("m" -> NodeBinding(movieDef))

  private def leafPool: Seq[Expr] = Seq(
    Lit(1L), Lit(3), Lit(2.5), Lit("txt"), Lit(true), Lit(null),
    Ref("m", Some("Title")), Ref("m", Some("Released")),
    Ref("m", Some("Rating")), Ref("m", Some("Seen")))

  private val binOps = Seq(BinOp.Add, BinOp.Sub, BinOp.Mul, BinOp.Div,
    BinOp.Mod, BinOp.Pow, BinOp.And, BinOp.Or, BinOp.Xor, BinOp.Lt,
    BinOp.Le, BinOp.Gt, BinOp.Ge, BinOp.Eq, BinOp.Neq, BinOp.Regex)
  private val funcs = Seq("tostring", "tointeger", "tofloat", "toboolean",
    "toupper", "tolower", "trim", "size", "abs", "floor", "ceil", "sqrt",
    "year", "month", "datetime", "date", "not")

  private def gen(rnd: scala.util.Random, depth: Int): Expr =
    if (depth == 0 || rnd.nextInt(100) < 25)
      leafPool(rnd.nextInt(leafPool.size))
    else rnd.nextInt(10) match {
      case 0 | 1 | 2 | 3 | 4 =>
        Bin(binOps(rnd.nextInt(binOps.size)),
          gen(rnd, depth - 1), gen(rnd, depth - 1))
      case 5 | 6 =>
        Func(funcs(rnd.nextInt(funcs.size)), Seq(gen(rnd, depth - 1)))
      case 7 =>
        CaseExpr(Seq((gen(rnd, depth - 1), gen(rnd, depth - 1))),
          if (rnd.nextBoolean()) Some(gen(rnd, depth - 1)) else None)
      case 8 => Not(gen(rnd, depth - 1))
      case _ => Neg(gen(rnd, depth - 1))
    }

  test("CASE cross-branch legality is pair-level (reference Plus row + matrix)") {
    // reference: TypeCoersionTables.cs Plus rows decide CASE-branch
    // unification (QueryExpressionCaseExpression.cs:88-117) BEFORE the
    // SQL conversion matrix (SQLRenderer.cs:112-236) sees the branches —
    // pairs the unifier marks default(Type) throw even when the matrix
    // has a legal Cast for them (e.g. Bit→Int).
    val types = Map(
      "dec" -> DecimalType(20, 4), "dbl" -> DoubleType, "flt" -> FloatType,
      "i" -> IntegerType, "l" -> LongType, "b" -> BooleanType,
      "s" -> StringType, "bin" -> BinaryType, "ts" -> TimestampType,
      "dt" -> DateType)
    val ti = new TypeInference({ case Ref(a, _) => types.get(a) })
    def kase(a: Expr, b: Expr) = CaseExpr(Seq((Lit(true), a)), Some(b))
    def r(n: String) = Ref(n, Some("p"))
    // rejected at pair level — the old family rule accepted the first four:
    intercept[CypherTypeException](ti.infer(kase(r("b"), r("i"))))     // bool × int (Plus default)
    intercept[CypherTypeException](ti.infer(kase(r("dec"), r("dbl")))) // decimal × double (Plus default)
    intercept[CypherTypeException](ti.infer(kase(r("flt"), r("dec")))) // float × decimal (Plus default)
    intercept[CypherTypeException](ti.infer(kase(r("bin"), r("s"))))   // byte[] absent from Plus table
    intercept[CypherTypeException](ti.infer(kase(r("ts"), r("l"))))    // temporal × numeric
    // still legal per the same tables:
    assert(ti.infer(kase(r("b"), r("s"))).contains(StringType))   // Plus(bool,string)=string
    assert(ti.infer(kase(r("dec"), r("s"))).contains(StringType)) // Plus(decimal,string)=string
    assert(ti.infer(kase(r("ts"), r("s"))).contains(StringType))  // Plus(DateTime,string)=string
    assert(ti.infer(kase(r("dec"), r("l"))).exists(_.isInstanceOf[DecimalType])) // decimal×integral
    assert(ti.infer(kase(r("dt"), r("ts"))).contains(TimestampType)) // documented extension
  }

  test("inferred type == Catalyst analyzed type on 2000 random expressions") {
    val colTypes = probe.schema.fields.map(f => f.name -> f.dataType).toMap
    val ti = new TypeInference({
      case Ref(a, Some(p)) => colTypes.get(Compiler.pref(a, p))
      case _ => None
    })
    val rnd = new scala.util.Random(20260812L)
    var inferredOk = 0
    var typedRejects = 0
    for (trial <- 1 to 2000) {
      val e = gen(rnd, 3)
      val inferred =
        try Right(ti.infer(e))
        catch { case t: CypherTypeException => Left(t) }
      inferred match {
        case Left(_) =>
          // compiler must raise the same typed error, never something raw
          intercept[CypherException] {
            val ec = new ExprCompiler(scope, probe)
            probe.select(ec.compile(e)).schema
          }
          typedRejects += 1
        case Right(None) => // statically unknown — no claim to check
        case Right(Some(t)) =>
          // compiling may still raise a typed Cypher error (e.g. syntax
          // checks), but if it analyzes, the type must match exactly.
          // Known permissiveness gap: a NULL literal is statically
          // unknown, so functions over null-derived operands can reach
          // Catalyst and fail analysis there — tolerated ONLY when the
          // tree actually contains a null literal.
          def hasNull(x: Expr): Boolean = x match {
            case Lit(null) => true
            case Lit(_) | Ref(_, _) => false
            case Bin(_, l, r) => hasNull(l) || hasNull(r)
            case Not(y) => hasNull(y)
            case Neg(y) => hasNull(y)
            case IsNull(y, _) => hasNull(y)
            case ListLit(items) => items.exists(hasNull)
            case Func(_, args) => args.exists(hasNull)
            case Agg(_, _, arg, _) => arg.exists(hasNull)
            case CaseExpr(ws, o) =>
              ws.exists(w => hasNull(w._1) || hasNull(w._2)) || o.exists(hasNull)
          }
          val ec = new ExprCompiler(scope, probe)
          val compiled =
            try Some(probe.select(ec.compile(e).as("v")).schema("v").dataType)
            catch {
              case _: CypherException => None
              case _: org.apache.spark.sql.AnalysisException if hasNull(e) => None
            }
          compiled.foreach { actual =>
            assert(actual == t,
              s"trial $trial: inferred ${t.simpleString} but Catalyst " +
                s"produced ${actual.simpleString} for $e")
          }
          if (compiled.isDefined) inferredOk += 1
      }
    }
    // the generator must actually exercise both paths
    assert(inferredOk > 300, s"only $inferredOk analyzed expressions")
    assert(typedRejects > 300, s"only $typedRejects typed rejections")
  }
}
