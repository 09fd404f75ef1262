package graft.cypher

import Lexer._
import ast._

/**
 * Recursive-descent parser for the openCypher subset accepted by the
 * reference (reference: src/openCypherParser/AST/CypherVisitor.cs; the
 * operator-precedence chain mirrors CypherVisitor.cs:1348-1691 —
 * Or > Xor > And > Not > Comparison > AddSub > MulDivMod > Power >
 * Unary > StringListNull > PropertyLookup > Atom).
 *
 * Constructs the reference rejects (SURVEY.md §2.6) raise
 * CypherNotSupportedException with a message naming the construct.
 * Unlike the reference, UNION / UNION ALL is parsed and kept
 * (the reference's visitor silently drops it — CypherVisitor.cs:626-641).
 *
 * With `extensions = true` (opt-in; see [[CypherSession.extended]])
 * constructs the reference lacks are ACCEPTED instead of rejected:
 * SKIP, `$param` query parameters (bound from `params` as typed
 * literals at parse time), UNWIND + collect(), bounded
 * variable-length relationships `[*lo..hi]` (hi ≤ [[Parser.MaxVarHops]]),
 * and inline property maps `(n:L {k: v})` / `-[r:T {k: v}]-` (desugared
 * at parse time to WHERE conjuncts on the enclosing MATCH / EXISTS /
 * COUNT{} / pattern comprehension; rejected on var-length rels and
 * type alternations, whose hops have no single property namespace).
 * Parity mode (`extensions = false`, the default) rejects all of them
 * with the reference's messages.
 */
final class Parser(tokens: Vector[Tok], extensions: Boolean = false,
                   params: Map[String, Any] = Map.empty) {
  private var p = 0

  // ----- inline property maps (extension) -----------------------------
  // `(n:L {k: v, …})` / `-[r:T {k: v}]-` desugar AT PARSE TIME to WHERE
  // conjuncts `n.k = v` on the enclosing pattern consumer (MATCH /
  // EXISTS / COUNT{} / pattern comprehension) — the reference rejects
  // the form outright (CypherVisitor.cs:1094-1097,1173-1176). Anonymous
  // map-bearing entities get a parser-synthesized `__pm<N>` alias to
  // hang the conjunct on (the `__` namespace is reserved — user aliases
  // starting with `__` are rejected below, so no collision is possible).
  // Conjuncts buffer here; each consumer marks the buffer before
  // parsing its patterns and drains only its own suffix, so nested
  // pattern expressions (EXISTS inside a MATCH WHERE) stay scoped.
  private val propConjuncts = scala.collection.mutable.ArrayBuffer[Expr]()
  private def pcMark(): Int = propConjuncts.length
  private def pcDrain(m: Int): Seq[Expr] = {
    val r = propConjuncts.drop(m).toSeq
    propConjuncts.remove(m, propConjuncts.length - m)
    r
  }
  private def andAll(base: Option[Expr], extra: Seq[Expr]): Option[Expr] =
    (base.toSeq ++ extra).reduceOption(Bin(BinOp.And, _, _))
  private var pmN = 0
  private def nextPm(): String = { val a = s"__pm$pmN"; pmN += 1; a }

  private def cur: Tok = tokens(p)
  private def advance(): Tok = { val t = tokens(p); p += 1; t }

  private def syntaxErr(msg: String): Nothing =
    throw new CypherSyntaxException(s"$msg (at offset ${cur.pos})")
  private def notSupported(msg: String): Nothing =
    throw new CypherNotSupportedException(msg)

  private def isKw(s: String): Boolean = cur match {
    case Kw(k, _, _) => k == s; case _ => false }
  private def isPunct(s: String): Boolean = cur match {
    case Punct(k, _) => k == s; case _ => false }
  private def eatKw(s: String): Unit =
    if (isKw(s)) p += 1 else syntaxErr(s"Expected $s")
  private def eatPunct(s: String): Unit =
    if (isPunct(s)) p += 1 else syntaxErr(s"Expected '$s'")
  private def tryKw(s: String): Boolean =
    if (isKw(s)) { p += 1; true } else false
  /** Next token opens an updating clause (multi-updating chaining). */
  private def isUpdatingKw: Boolean = cur match {
    case Kw(k, _, _) =>
      Set("MERGE", "SET", "REMOVE", "CREATE", "DELETE", "DETACH")(k)
    case _ => false
  }
  private def tryPunct(s: String): Boolean =
    if (isPunct(s)) { p += 1; true } else false

  private def ident(): String = cur match {
    case Ident(s, _) => p += 1; s
    // non-reserved words usable as identifiers in practice
    case Kw(k, raw, _) if k == "ALL" || k == "ANY" || k == "CONTAINS" =>
      p += 1; raw
    case _ => syntaxErr("Expected identifier")
  }

  /** Identifier in a position where keywords are unambiguous — node
   *  labels, relationship types, property names (e.g. a label `Order`).
   *  Returns the original spelling. */
  private def name(): String = cur match {
    case Ident(s, _) => p += 1; s
    case Kw(_, raw, _) => p += 1; raw
    case _ => syntaxErr("Expected name")
  }

  // ----- entry --------------------------------------------------------

  def parseQuery(): Query = {
    val q = parseUnion()
    tryPunct(";")
    cur match {
      case EOF(_) => q
      case t => syntaxErr(s"Unexpected trailing input: $t")
    }
  }

  private def parseUnion(): Query = {
    def checkUpdating(q: Query): Unit = q match {
      case _: MergeQuery | _: MergeReturnQuery | _: MergeRelQuery |
           _: MergeChainQuery | _: MergeRelChainQuery =>
        notSupported("MERGE in a UNION branch — " +
        "an updating clause must be the query's terminal clause")
      case _: SetQuery | _: SetReturnQuery | _: SetChainQuery =>
        notSupported("SET in a UNION branch — " +
        "an updating clause must be the query's terminal clause")
      case _: DeleteQuery | _: DeleteReturnQuery | _: DeleteChainQuery =>
        notSupported("DELETE in a UNION branch — " +
        "an updating clause must be the query's terminal clause")
      case _: CreateQuery | _: CreateReturnQuery | _: CreateRelQuery |
           _: CreateChainQuery | _: CreateRelChainQuery =>
        notSupported("CREATE in a UNION branch — " +
        "an updating clause must be the query's terminal clause")
      case _ =>
    }
    var left: Query = parseTop()
    while (isKw("UNION")) {
      checkUpdating(left)
      p += 1
      val all = tryKw("ALL")
      val right = parseTop()
      checkUpdating(right)
      left = UnionQuery(left, right, all)
    }
    left
  }

  /** A single query that may terminate in an updating clause —
    * MERGE / SET / DELETE (extensions). */
  private def parseTop(): Query = assembleUpdating(parseSingle())

  /** Assemble the pending updating-clause slots [[parseSingle]] filled
    * into the typed query shape (or return the single query unchanged
    * when none fired). Shared by [[parseTop]] and the update-chain
    * continuation, which since round 12 may itself terminate in an
    * updating clause. */
  private def assembleUpdating(sq: SingleQuery): Query = {
    def takeChain(): Option[Query] = {
      val c = pendingUpdateChain; pendingUpdateChain = None; c
    }
    // fold the 2nd..nth CREATE / DELETE clauses (round 13) into a
    // nested update chain — each clause runs over the previous one's
    // read-back frame; the query's RETURN / explicit chain attaches
    // to the INNERMOST clause
    def foldCreates(extra: Seq[Either[CreateClause, CreateRelClause]],
        r: Option[Projection], rest: Option[Query]): Query = {
      val innermost = extra.last match {
        case Right(cr2) => rest match {
          case Some(q) => CreateRelChainQuery(Seq.empty, cr2, q)
          case None    => CreateRelQuery(Seq.empty, cr2, r)
        }
        case Left(c2) => (r, rest) match {
          case (_, Some(q))  => CreateChainQuery(Seq.empty, c2, q)
          case (Some(r2), _) => CreateReturnQuery(Seq.empty, c2, r2)
          case _             => CreateQuery(Seq.empty, c2)
        }
      }
      extra.init.foldRight(innermost) {
        case (Right(cr2), inner) => CreateRelChainQuery(Seq.empty, cr2, inner)
        case (Left(c2), inner)   => CreateChainQuery(Seq.empty, c2, inner)
      }
    }
    // the 2nd..nth variable groups of a multi-variable SET/REMOVE
    // (round 16) nest the same way — each group runs over the previous
    // group's per-row updated read-back frame; the query's RETURN /
    // explicit chain attaches to the INNERMOST clause (whose snapshot
    // is the terminal result, the multi-variable DELETE contract)
    def foldSets(extra: Seq[SetClause], r: Option[Projection],
        rest: Option[Query]): Query = {
      val innermost = rest match {
        case Some(q) => SetChainQuery(Seq.empty, extra.last, q)
        case None => r match {
          case Some(r2) => SetReturnQuery(Seq.empty, extra.last, r2)
          case None     => SetQuery(Seq.empty, extra.last)
        }
      }
      extra.init.foldRight(innermost)((s2, inner) =>
        SetChainQuery(Seq.empty, s2, inner))
    }
    def foldDeletes(extra: Seq[DeleteClause], r: Option[Projection],
        rest: Option[Query]): Query = {
      val innermost = rest match {
        case Some(q) => DeleteChainQuery(Seq.empty, extra.last, q)
        case None => r match {
          case Some(r2) => DeleteReturnQuery(Seq.empty, extra.last, r2)
          case None     => DeleteQuery(Seq.empty, extra.last)
        }
      }
      extra.init.foldRight(innermost)((d2, inner) =>
        DeleteChainQuery(Seq.empty, d2, inner))
    }
    if (pendingMergeRel.isDefined) {
      val mr = pendingMergeRel.get; pendingMergeRel = None
      val r = pendingMergeReturn; pendingMergeReturn = None
      return takeChain() match {
        case Some(rest) => MergeRelChainQuery(sq.parts, mr, rest)
        case None       => MergeRelQuery(sq.parts, mr, r)
      }
    }
    if (pendingCreateRel.isDefined) {
      val cr = pendingCreateRel.get; pendingCreateRel = None
      val r = pendingCreateReturn; pendingCreateReturn = None
      val extra = pendingCreateExtra; pendingCreateExtra = Seq.empty
      val rest0 = takeChain()
      return (if (extra.isEmpty) rest0
        else Some(foldCreates(extra, r, rest0))) match {
        case Some(rest) => CreateRelChainQuery(sq.parts, cr, rest)
        case None       => CreateRelQuery(sq.parts, cr, r)
      }
    }
    (pendingMerge, pendingSet, pendingDelete, pendingCreate) match {
      case (Some(m), _, _, _) =>
        pendingMerge = None
        (pendingMergeReturn, takeChain()) match {
          case (Some(r), _) => pendingMergeReturn = None
            MergeReturnQuery(sq.parts, m, r)
          case (_, Some(rest)) => MergeChainQuery(sq.parts, m, rest)
          case _ => MergeQuery(sq.parts, m)
        }
      case (_, Some(s), _, _) =>
        pendingSet = None
        val extraS = pendingSetExtra; pendingSetExtra = Seq.empty
        if (extraS.nonEmpty) {
          val r = pendingSetReturn; pendingSetReturn = None
          SetChainQuery(sq.parts, s, foldSets(extraS, r, takeChain()))
        } else (pendingSetReturn, takeChain()) match {
          case (Some(r), _) => pendingSetReturn = None
            SetReturnQuery(sq.parts, s, r)
          case (_, Some(rest)) => SetChainQuery(sq.parts, s, rest)
          case _ => SetQuery(sq.parts, s)
        }
      case (_, _, Some(d), _) =>
        pendingDelete = None
        val extraD = pendingDeleteExtra; pendingDeleteExtra = Seq.empty
        if (extraD.nonEmpty) {
          val r = pendingDeleteReturn; pendingDeleteReturn = None
          DeleteChainQuery(sq.parts, d, foldDeletes(extraD, r, takeChain()))
        } else (pendingDeleteReturn, takeChain()) match {
          case (Some(r), _) => pendingDeleteReturn = None
            DeleteReturnQuery(sq.parts, d, r)
          case (_, Some(rest)) => DeleteChainQuery(sq.parts, d, rest)
          case _ => DeleteQuery(sq.parts, d)
        }
      case (_, _, _, Some(c)) =>
        pendingCreate = None
        val extraC = pendingCreateExtra; pendingCreateExtra = Seq.empty
        if (extraC.nonEmpty) {
          val r = pendingCreateReturn; pendingCreateReturn = None
          CreateChainQuery(sq.parts, c, foldCreates(extraC, r, takeChain()))
        } else (pendingCreateReturn, takeChain()) match {
          case (Some(r), _) => pendingCreateReturn = None
            CreateReturnQuery(sq.parts, c, r)
          case (_, Some(rest)) => CreateChainQuery(sq.parts, c, rest)
          case _ => CreateQuery(sq.parts, c)
        }
      case _                  => sq
    }
  }

  /** Out-channels for a terminal MERGE / SET / DELETE parsed inside
    * [[parseSingle]] (CALL-subquery calls to parseSingle reject each
    * instead). */
  private var pendingMerge: Option[MergeClause] = None
  private var pendingMergeRel: Option[MergeRelClause] = None
  private var pendingMergeReturn: Option[Projection] = None
  private var pendingSet: Option[SetClause] = None
  private var pendingSetReturn: Option[Projection] = None
  /** 2nd..nth per-variable groups of a multi-variable SET/REMOVE
    * (round 16) — folded into a nested update chain like
    * [[pendingDeleteExtra]]. */
  private var pendingSetExtra: Seq[SetClause] = Seq.empty
  private var pendingUpdateChain: Option[Query] = None

  /** Parse the continuation of an update chain (starting at its WITH,
    * or directly at the next updating keyword — implicit `WITH *`).
    * Round 12: the continuation may itself terminate in another
    * updating clause — it assembles recursively into a nested updating
    * query that the compiler folds over the previous clause's
    * read-back frame. The current clause's pending slots (and RETURN
    * slots) are saved around the recursive parse so the nested
    * assembly consumes only what the CONTINUATION set. */
  private def parseUpdateChain(kw: String): Query = {
    val saved = (pendingMerge, pendingMergeRel, pendingSet,
      pendingDelete, pendingCreate, pendingCreateRel)
    val savedRets = (pendingMergeReturn, pendingSetReturn,
      pendingDeleteReturn, pendingCreateReturn)
    val savedChain = pendingUpdateChain
    val savedInChain = inUpdateChain
    val savedExtra = (pendingCreateExtra, pendingDeleteExtra,
      pendingSetExtra)
    pendingMerge = None; pendingMergeRel = None; pendingSet = None
    pendingDelete = None; pendingCreate = None; pendingCreateRel = None
    pendingMergeReturn = None; pendingSetReturn = None
    pendingDeleteReturn = None; pendingCreateReturn = None
    pendingUpdateChain = None
    pendingCreateExtra = Seq.empty; pendingDeleteExtra = Seq.empty
    pendingSetExtra = Seq.empty
    inUpdateChain = true
    val rest = assembleUpdating(parseSingle())
    inUpdateChain = savedInChain
    pendingMerge = saved._1; pendingMergeRel = saved._2
    pendingSet = saved._3; pendingDelete = saved._4
    pendingCreate = saved._5; pendingCreateRel = saved._6
    pendingMergeReturn = savedRets._1; pendingSetReturn = savedRets._2
    pendingDeleteReturn = savedRets._3; pendingCreateReturn = savedRets._4
    pendingUpdateChain = savedChain
    pendingCreateExtra = savedExtra._1; pendingDeleteExtra = savedExtra._2
    pendingSetExtra = savedExtra._3
    rest
  }

  /** Inside an update-chain continuation: SET/DELETE may open the
    * continuation without a fresh MATCH (their target binds through
    * the carried read-back frame). */
  private var inUpdateChain: Boolean = false
  private var pendingDelete: Option[DeleteClause] = None
  private var pendingDeleteReturn: Option[Projection] = None
  private var pendingCreate: Option[CreateClause] = None
  private var pendingCreateRel: Option[CreateRelClause] = None
  private var pendingCreateReturn: Option[Projection] = None
  /** 2nd..nth clauses of a multi-pattern / path CREATE and of a
    * multi-variable DELETE (round 13) — folded into a nested update
    * chain by [[assembleUpdating]]. */
  private var pendingCreateExtra: Seq[Either[CreateClause, CreateRelClause]] =
    Seq.empty
  private var pendingDeleteExtra: Seq[DeleteClause] = Seq.empty
  private var inSubquery: Boolean = false

  private def rejectUpdating(): Unit = cur match {
    // MERGE / SET / DELETE / CREATE have extended lowerings (terminal
    // snapshot-producing clauses); REMOVE stays rejected in both
    // modes — its semantics are covered by SET (read-only engine,
    // reference CypherVisitor.cs:486-489)
    case Kw(k, _, _)
        if Set("MERGE", "SET", "DELETE", "DETACH", "CREATE")(k)
        && !extensions =>
      notSupported(s"updating clause $k (read-only engine; a terminal " +
        s"snapshot-producing $k is supported with extensions enabled)")
    case Kw("REMOVE", _, _) if !extensions =>
      notSupported("updating clause REMOVE (read-only engine; a " +
        "terminal snapshot-producing REMOVE is supported with " +
        "extensions enabled)")
    case Kw("UNWIND", _, _) if !extensions =>
      notSupported("UNWIND (supported with extensions enabled)")
    case Kw("CALL", _, _)
        if !(extensions &&
          (peek1 match { case Punct("{" | "(", _) => true
                         case Ident(_, _) => true; case _ => false })) =>
      notSupported("CALL / procedures" +
        (if (!extensions) " (CALL { subquery } and schema procedures " +
          "supported with extensions enabled)" else ""))
    case _ =>
  }

  private def parseSingle(): SingleQuery = {
    val parts = Vector.newBuilder[QueryPart]
    var done = false
    var isFirstPart = true
    var foreachClose = 0
    while (!done) {
      rejectUpdating()
      val matches = Vector.newBuilder[MatchClause]
      var sawMatch = false
      var prevOptional = false
      var matchAfterOptional = false
      // `OPTIONAL CALL` (round 13) belongs to the CALL loop below, not
      // the match loop
      def optionalCallAhead: Boolean = extensions &&
        isKw("OPTIONAL") && (peek1 match {
          case Kw("CALL", _, _) => true; case _ => false })
      while (!matchAfterOptional && !optionalCallAhead &&
          (isKw("MATCH") || isKw("OPTIONAL"))) {
        val optional = isKw("OPTIONAL")
        if (!optional && prevOptional) {
          // MATCH directly after OPTIONAL MATCH (round 10, extensions):
          // Neo4j keeps the piped rows and inner-joins the new pattern
          // per row — null bindings from a missed optional never equi-
          // join, so those rows drop, exactly `WITH * MATCH …`. Splice
          // the implicit part boundary below; parity keeps the rejection.
          if (!extensions)
            notSupported("MATCH cannot directly follow OPTIONAL MATCH")
          matchAfterOptional = true
        } else {
          if (optional) p += 1
          eatKw("MATCH")
          if (!extensions && optional && isFirstPart && !sawMatch)
            notSupported("first clause cannot be OPTIONAL MATCH")
          matches += parseMatchBody(optional)
          prevOptional = optional
          sawMatch = true
          rejectUpdating()
        }
      }
      val ms = matches.result()
      // CALL { subquery } (extension): zero or more between the matches
      // and the unwinds. The optional leading `WITH a, b` lists imported
      // node variables — plain identifiers only (Neo4j's importing-WITH
      // contract), then the subquery proper starts at its first MATCH.
      val callsB = Vector.newBuilder[CallSub]
      var sawCall = false
      // schema procedure call (round 13, extension): `CALL db.labels()
      // [YIELD col [AS a], … | YIELD *]` — the procedure's rows are a
      // compile-time literal frame over the graph schema ([[ProcRows]]
      // expanded by the compiler), so the whole clause desugars onto
      // the UNWIND machinery plus a synthetic WITH projecting the
      // yielded fields. One procedure per query part (the YIELD closes
      // the part; further CALLs open new parts naturally).
      var procYield: Option[(String, Seq[(String, String)])] = None
      var procUnwind: Option[(Expr, String)] = None
      while (isKw("CALL") && procYield.isEmpty &&
          (peek1 match { case Ident(_, _) => true; case _ => false })) {
        p += 1
        val nmParts = Vector.newBuilder[String]
        nmParts += ident()
        while (isPunct(".")) { p += 1; nmParts += name() }
        val nmRaw = nmParts.result().mkString(".")
        val proc = nmRaw.toLowerCase(java.util.Locale.ROOT)
        val cols = Parser.Procedures.getOrElse(proc,
          notSupported(s"procedure $nmRaw(...) (supported: " +
            Parser.Procedures.keys.toSeq.sorted.mkString(", ") + ")"))
        eatPunct("(")
        if (!isPunct(")"))
          notSupported(s"procedure arguments — $nmRaw takes none")
        eatPunct(")")
        def isIdentCI(s: String): Boolean = cur match {
          case Ident(x, _) => x.equalsIgnoreCase(s); case _ => false
        }
        val yields: Seq[(String, String)] =
          if (isIdentCI("YIELD")) {
            p += 1
            if (tryPunct("*")) cols.map(c2 => c2 -> c2)
            else {
              val b = Vector.newBuilder[(String, String)]
              def one(): Unit = {
                val c2 = ident()
                val canon = cols.find(_.equalsIgnoreCase(c2)).getOrElse(
                  syntaxErr(s"procedure $nmRaw yields no column '$c2' " +
                    s"(columns: ${cols.mkString(", ")})"))
                b += ((canon, if (tryKw("AS")) ident() else c2))
              }
              one(); while (tryPunct(",")) one()
              b.result()
            }
          } else cols.map(c2 => c2 -> c2) // no YIELD = yield-all
        procYield = Some((nextPm(), yields))
        procUnwind = Some((ProcRows(proc), procYield.get._1))
      }
      while ((isKw("CALL") || optionalCallAhead) && procYield.isEmpty) {
        // OPTIONAL CALL (round 13; Neo4j 5.24): LEFT-join semantics —
        // a zero-row subquery null-fills instead of dropping the row
        val optional = isKw("OPTIONAL")
        if (optional) p += 1
        p += 1 // CALL: extensions + '{'/'(' guaranteed by the guards
        if (optional && (cur match {
            case Ident(_, _) => true; case _ => false }))
          notSupported("OPTIONAL CALL on a schema procedure — " +
            "procedure frames are schema-sized and never empty; drop " +
            "the OPTIONAL")
        val imports = Vector.newBuilder[String]
        var scoped = false
        if (isPunct("(")) {
          // Neo4j 5.23 variable scope clause: CALL (a, b) { … } — the
          // modern spelling of the importing WITH; CALL () { … } is
          // the explicit uncorrelated form
          scoped = true
          p += 1
          if (isPunct("*"))
            notSupported("CALL (*) import-all scope clause — list the " +
              "imported variables: CALL (a, b) { … }")
          if (!isPunct(")")) {
            imports += ident()
            while (tryPunct(",")) imports += ident()
          }
          eatPunct(")")
        }
        eatPunct("{")
        if (!scoped && isKw("WITH")) {
          p += 1
          imports += ident()
          while (tryPunct(",")) imports += ident()
          if (!isKw("MATCH") && !isKw("OPTIONAL"))
            notSupported("CALL importing WITH must list plain variables " +
              "followed by MATCH")
        }
        val wasSub = inSubquery
        inSubquery = true
        // CALL { … UNION [ALL] … } (round 12): an uncorrelated union
        // runs once and cross-joins its value rows like any other
        // CALL; a CORRELATED union (round 14) threads the imports
        // through each branch and unions the keyed branch outputs
        // before the one join-back (aggregating branches stay typed)
        var subq: Query =
          try {
            var q: Query = parseSingle()
            while (isKw("UNION")) {
              p += 1
              val all = tryKw("ALL")
              q = UnionQuery(q, parseSingle(), all)
            }
            q
          } finally inSubquery = wasSub
        eatPunct("}")
        callsB += CallSub(imports.result(), subq, optional)
        sawCall = true
      }
      if (!extensions && sawCall && (isKw("MATCH") || isKw("OPTIONAL")))
        notSupported("MATCH after CALL — chain it through a WITH")
      val calls = callsB.result()
      // UNWIND (extension): zero or more clauses between the matches and
      // the part's projection; a MATCH after UNWIND must chain through a
      // WITH (keeps the join builder's scope model untouched)
      val unwinds = Vector.newBuilder[(Expr, String)]
      procUnwind.foreach(unwinds += _)
      var sawUnwind = false
      while (isKw("UNWIND") && procYield.isEmpty) {
        p += 1 // extensions guaranteed: parity mode rejected it above
        val e = parseExpr()
        eatKw("AS")
        val al = ident()
        unwinds += ((e, al))
        sawUnwind = true
      }
      if (!extensions && sawUnwind && (isKw("MATCH") || isKw("OPTIONAL")))
        notSupported("MATCH after UNWIND — chain it through a WITH")
      if (!extensions && sawUnwind && ms.isEmpty && calls.isEmpty &&
          isFirstPart)
        notSupported("standalone UNWIND without a preceding MATCH")
      val uw = unwinds.result()
      if (procYield.isDefined) {
        // close the procedure part with the YIELD projection (a
        // synthetic WITH over the proc row's fields); an optional
        // WHERE right after YIELD filters the yielded values (Neo4j's
        // CALL … YIELD … WHERE … form). If the query ends here the
        // projection is terminal; otherwise RETURN/MATCH/… continue
        // as new parts over the yielded scope.
        val (al, ys) = procYield.get
        val w = if (tryKw("WHERE")) Some(parseExpr()) else None
        val items = ys.map { case (c2, a2) =>
          RetItem(DotAccess(Ref(al, None), c2), Some(a2)) }
        // star = true: the yielded columns ADD to the row (outer
        // variables stay in scope through the CALL, Neo4j's contract)
        parts += QueryPart(ms,
          Projection(items, distinct = false, Seq.empty, None, w,
            star = true), uw, calls)
        cur match {
          case EOF(_) | Punct(";", _) => done = true
          case Kw("UNION", _, _)      => done = true
          case Punct("}", _)          => done = true // inside CALL { }
          case _ => isFirstPart = false
        }
      } else if ((sawUnwind || sawCall || matchAfterOptional) &&
          (isKw("MATCH") || isKw("OPTIONAL"))) {
        // MATCH directly after UNWIND / CALL / OPTIONAL MATCH (round
        // 10, extensions guaranteed — parity rejected above): Neo4j
        // chains freely;
        // splice an implicit `WITH *` so the next clause opens a new
        // part over the full scope — per-row semantics unchanged (the
        // generated rows join the new MATCH exactly as through a
        // spelled-out WITH *)
        parts += QueryPart(ms, Projection(Seq.empty, distinct = false,
          Seq.empty, None, None, None, star = true), uw, calls)
        isFirstPart = false
      } else if (isKw("FOREACH")) {
        // FOREACH (x IN list | <updating clause>) — extension (round
        // 12; parity keeps the rejection): in this snapshot-producing
        // engine the inner clause IS the query's terminal clause and
        // its result is the new table snapshot, so the iteration
        // desugars EXACTLY to `UNWIND list AS x <clause>` — feed
        // multiplicity is winner-deduped / distinct-keyed per clause
        // contract, and an empty/null list unwinds to zero feed rows
        // (the snapshot passes through unchanged, Neo4j's no-op).
        // Neo4j's cardinality preservation only matters for clauses
        // AFTER the FOREACH, which is why only the TERMINAL position
        // is supported: nothing may follow the closing paren. Nested
        // FOREACH composes (one more UNWIND part per level).
        if (!extensions)
          notSupported("updating clause FOREACH (a terminal " +
            "snapshot-producing FOREACH is supported with extensions " +
            "enabled)")
        if (inSubquery)
          notSupported("FOREACH inside a CALL subquery — FOREACH must " +
            "be the query's terminal clause")
        if (isFirstPart && ms.isEmpty && uw.isEmpty && calls.isEmpty &&
            !inUpdateChain)
          notSupported(
            "FOREACH without a preceding MATCH binding its scope")
        p += 1
        eatPunct("(")
        val fv = ident()
        eatKw("IN")
        val fl = parseExpr()
        eatPunct("|")
        if (!isUpdatingKw && !isKw("FOREACH"))
          notSupported("FOREACH body must be a single updating clause " +
            "(SET / REMOVE / CREATE / MERGE / DELETE / nested FOREACH)")
        // open a new part carrying the desugared UNWIND; the updating
        // branch fires on the loop's next iteration
        parts += QueryPart(ms, Projection(Seq.empty, distinct = false,
          Seq.empty, None, None, None, star = true),
          uw :+ ((fl, fv)), calls)
        isFirstPart = false
        foreachClose += 1
      } else if (isKw("MERGE")) {
        // terminal MERGE (extension; parity rejected in rejectUpdating).
        // A trailing bare MATCH/UNWIND/CALL part gets an implicit
        // `WITH *` so the merge sees its scope.
        if (inSubquery)
          notSupported("MERGE inside a CALL subquery — MERGE must be " +
            "the query's terminal clause")
        p += 1
        if (ms.nonEmpty || uw.nonEmpty || calls.nonEmpty)
          parts += QueryPart(ms, Projection(Seq.empty, distinct = false,
            Seq.empty, None, None, None, star = true), uw, calls)
        parseMergeClause() match {
          case Left(m)   => pendingMerge = Some(m)
          case Right(mr) => pendingMergeRel = Some(mr)
        }
        if (isKw("RETURN")) {
          // MERGE … RETURN (round 10): the RETURN reads the RESULTING
          // entity per feed row — the projection, not the snapshot
          p += 1
          pendingMergeReturn = Some(parseProjection(isWith = false))
        } else if (isKw("WITH")) {
          // update chaining (round 11): the pipeline continues over
          // the post-merge read-back frame (the RETURN form's view)
          pendingUpdateChain = Some(parseUpdateChain("MERGE"))
        } else if (isUpdatingKw) {
          // multi-updating pipeline (round 12): implicit WITH * — the
          // next updating clause reads this clause's read-back frame
          pendingUpdateChain = Some(parseUpdateChain("MERGE"))
        } else if (isKw("MATCH") || isKw("OPTIONAL"))
          notSupported("MATCH directly after MERGE — continue the " +
            "pipeline through a WITH: MERGE … WITH … MATCH …")
        done = true
      } else if (isKw("SET") || isKw("REMOVE")) {
        // terminal SET / REMOVE (extension; parity rejected in
        // rejectUpdating): the result is the target entity's NEW
        // snapshot. REMOVE a.p is parse sugar for SET a.p = null.
        // Unlike MERGE, both need a bound target — a first-clause
        // SET/REMOVE has nothing to update.
        val remove = isKw("REMOVE")
        val kw = if (remove) "REMOVE" else "SET"
        if (inSubquery)
          notSupported(s"$kw inside a CALL subquery — $kw must be the " +
            "query's terminal clause")
        if (isFirstPart && ms.isEmpty && uw.isEmpty && calls.isEmpty &&
            !inUpdateChain)
          notSupported(s"$kw without a preceding MATCH binding its target")
        p += 1
        if (ms.nonEmpty || uw.nonEmpty || calls.nonEmpty)
          parts += QueryPart(ms, Projection(Seq.empty, distinct = false,
            Seq.empty, None, None, None, star = true), uw, calls)
        locally {
          val ss = if (remove) parseRemoveClause() else parseSetClause()
          pendingSet = Some(ss.head)
          pendingSetExtra = ss.tail
        }
        if (isKw("RETURN")) {
          // mid-query SET (round 10): `SET … RETURN items` reads the
          // UPDATED entity per row — the result is the projection,
          // not the snapshot
          p += 1
          pendingSetReturn = Some(parseProjection(isWith = false))
        } else if (isKw("WITH")) {
          // update chaining (round 11): `SET … WITH …` continues the
          // pipeline over the per-row UPDATED frame — downstream
          // WITH/MATCH/RETURN read the query's own writes (the
          // snapshot is untouched; re-matching the same table reads
          // the original store)
          pendingUpdateChain = Some(parseUpdateChain(kw))
        } else if (isUpdatingKw) {
          // multi-updating pipeline (round 12): implicit WITH *
          pendingUpdateChain = Some(parseUpdateChain(kw))
        } else if (isKw("MATCH") || isKw("OPTIONAL"))
          notSupported(s"MATCH directly after $kw — continue the " +
            s"pipeline through a WITH: $kw … WITH … MATCH …")
        done = true
      } else if (isKw("DELETE") || isKw("DETACH")) {
        // terminal [DETACH] DELETE (extension; parity rejected in
        // rejectUpdating): the result is the target entity's NEW
        // snapshot minus the matched rows.
        if (inSubquery)
          notSupported("DELETE inside a CALL subquery — DELETE must be " +
            "the query's terminal clause")
        if (isFirstPart && ms.isEmpty && uw.isEmpty && calls.isEmpty &&
            !inUpdateChain)
          notSupported("DELETE without a preceding MATCH binding its " +
            "target")
        val detach = tryKw("DETACH")
        eatKw("DELETE")
        if (ms.nonEmpty || uw.nonEmpty || calls.nonEmpty)
          parts += QueryPart(ms, Projection(Seq.empty, distinct = false,
            Seq.empty, None, None, None, star = true), uw, calls)
        locally {
          val ds = parseDeleteClause(detach)
          pendingDelete = Some(ds.head)
          pendingDeleteExtra = ds.tail
        }
        if (isKw("RETURN")) {
          // DELETE … RETURN (round 10): the RETURN reads the DELETED
          // rows' pre-delete values — the projection, not the snapshot
          p += 1
          pendingDeleteReturn = Some(parseProjection(isWith = false))
        } else if (isKw("WITH")) {
          // update chaining (round 11): continues over the deleted
          // rows' PRE-delete values (the RETURN form's view)
          pendingUpdateChain = Some(parseUpdateChain("DELETE"))
        } else if (isUpdatingKw) {
          // multi-updating pipeline (round 12): implicit WITH *
          pendingUpdateChain = Some(parseUpdateChain("DELETE"))
        } else if (isKw("MATCH") || isKw("OPTIONAL"))
          notSupported("MATCH directly after DELETE — continue the " +
            "pipeline through a WITH: DELETE … WITH … MATCH …")
        done = true
      } else if (isKw("CREATE")) {
        // terminal CREATE (extension; parity rejected in
        // rejectUpdating): unconditional append — the result is the
        // node table's NEW snapshot with one fresh row per feed row
        // (or one literal row when standalone).
        if (inSubquery)
          notSupported("CREATE inside a CALL subquery — CREATE must " +
            "be the query's terminal clause")
        p += 1
        if (ms.nonEmpty || uw.nonEmpty || calls.nonEmpty)
          parts += QueryPart(ms, Projection(Seq.empty, distinct = false,
            Seq.empty, None, None, None, star = true), uw, calls)
        locally {
          val cs = parseCreateClause()
          cs.head match {
            case Left(c)   => pendingCreate = Some(c)
            case Right(cr) => pendingCreateRel = Some(cr)
          }
          pendingCreateExtra = cs.tail
        }
        if (isKw("RETURN")) {
          // CREATE … RETURN (round 10): the RETURN reads the CREATED
          // rows — the projection, not the snapshot
          p += 1
          pendingCreateReturn = Some(parseProjection(isWith = false))
        } else if (isKw("WITH")) {
          // update chaining (round 11): continues over the created
          // rows (the RETURN form's view)
          pendingUpdateChain = Some(parseUpdateChain("CREATE"))
        } else if (isUpdatingKw) {
          // multi-updating pipeline (round 12): implicit WITH *
          pendingUpdateChain = Some(parseUpdateChain("CREATE"))
        } else if (isKw("MATCH") || isKw("OPTIONAL"))
          notSupported("MATCH directly after CREATE — continue the " +
            "pipeline through a WITH: CREATE … WITH … MATCH …")
        done = true
      } else if (isKw("WITH")) {
        p += 1
        if (!extensions && ms.isEmpty && uw.isEmpty && calls.isEmpty &&
            isFirstPart)
          notSupported("standalone RETURN/WITH")
        parts += QueryPart(ms, parseProjection(isWith = true), uw, calls)
        isFirstPart = false
      } else if (cur match {
          case Ident(s, _)     => s.equalsIgnoreCase("LET")
          case Kw("LET", _, _) => true
          case _               => false }) {
        // Cypher 2025 LET (round 14, extension): `LET v = e [, …]` is
        // sugar for `WITH *, e AS v` — ONE part PER ITEM (round 15,
        // ADVICE-r14), so later items read earlier bindings of the
        // same clause, Cypher 2025's sequential-binding contract
        // (`LET a = 1, b = a + 1`). Aggregates are rejected (LET
        // binds PER-ROW values; the WITH desugar would silently turn
        // one into an implicit GROUP BY and collapse rows); duplicate
        // aliases within one LET are a parse error, and the compiler
        // rejects redefining any other in-scope variable (Cypher
        // 2025's contract, unlike WITH's masking).
        if (!extensions)
          notSupported("LET (supported with extensions enabled)")
        p += 1
        def hasAgg(x: Any): Boolean = x match {
          case _: Agg         => true
          case s: Iterable[_] => s.exists(hasAgg)
          case pr: Product    => pr.productIterator.exists(hasAgg)
          case _              => false
        }
        val letSeen = scala.collection.mutable.Set.empty[String]
        def oneLet(): RetItem = {
          val nm = cur match {
            case Ident(s, _) => p += 1; s
            case _ => syntaxErr("LET expects `name = expression`")
          }
          if (!letSeen.add(nm))
            syntaxErr(s"LET binds `$nm` twice in one clause")
          eatPunct("=")
          val e = parseExpr()
          if (hasAgg(e))
            notSupported("an aggregate inside LET — LET binds per-row " +
              "values; aggregate in a WITH instead")
          RetItem(e, Some(nm))
        }
        // the first item's part carries this part's matches/unwinds/
        // calls; each further item opens a bare follow-on part
        parts += QueryPart(ms, Projection(Seq(oneLet()),
          distinct = false, Seq.empty, None, None, None, star = true,
          fromLet = true), uw, calls)
        while (tryPunct(","))
          parts += QueryPart(Seq.empty, Projection(Seq(oneLet()),
            distinct = false, Seq.empty, None, None, None, star = true,
            fromLet = true), Seq.empty, Seq.empty)
        isFirstPart = false
      } else if (cur match {
          case Ident(s, _)        => s.equalsIgnoreCase("FILTER")
          case Kw("FILTER", _, _) => true
          case _                  => false }) {
        // Cypher 2025 FILTER (round 14, extension): `FILTER pred` is
        // sugar for `WITH * WHERE pred`
        if (!extensions)
          notSupported("FILTER (supported with extensions enabled)")
        p += 1
        val w = parseExpr()
        parts += QueryPart(ms, Projection(Seq.empty, distinct = false,
          Seq.empty, None, Some(w), None, star = true), uw, calls)
        isFirstPart = false
      } else if (isKw("RETURN")) {
        p += 1
        if (!extensions && ms.isEmpty && uw.isEmpty && calls.isEmpty &&
            isFirstPart)
          notSupported("standalone RETURN without MATCH")
        parts += QueryPart(ms, parseProjection(isWith = false), uw, calls)
        done = true
      } else if (ms.isEmpty && uw.isEmpty && calls.isEmpty) {
        syntaxErr("Expected MATCH, WITH or RETURN")
      } else {
        syntaxErr("Query part must end with WITH or RETURN")
      }
    }
    // close any FOREACH wrappers; the desugared form is terminal, so
    // nothing may follow the last paren
    (1 to foreachClose).foreach { _ =>
      if (pendingSetReturn.isDefined || pendingMergeReturn.isDefined ||
          pendingDeleteReturn.isDefined || pendingCreateReturn.isDefined ||
          pendingUpdateChain.isDefined)
        notSupported("RETURN/WITH inside FOREACH — the terminal " +
          "snapshot-producing form takes one updating clause only")
      eatPunct(")")
    }
    if (foreachClose > 0) cur match {
      case EOF(_) => ()
      case Punct(";", _) => ()
      case t => notSupported(s"clauses after FOREACH ($t) — the " +
        "terminal snapshot-producing form supports nothing after the " +
        "closing paren")
    }
    SingleQuery(parts.result())
  }

  /** `(n:Label {idProp: expr}) [ON MATCH SET n.p = e, …]
    * [ON CREATE SET n.p = e, …]` — the MERGE keyword is consumed by
    * the caller. `ON` is not a lexer keyword, so it arrives as an
    * identifier. */
  /** Shared `[ON MATCH SET t.p = e, …] [ON CREATE SET t.p = e, …]`
    * tail of a node or relationship MERGE. `target` is the merged
    * entity's alias (None = anonymous relationship — any ON clause is
    * then a typed rejection, there is nothing to assign through);
    * `kind` names the entity in error messages. */
  private def parseOnSets(target: Option[String], kind: String)
      : (Seq[(String, Expr)], Seq[(String, Expr)]) = {
    var onMatch: Seq[(String, Expr)] = Seq.empty
    var onCreate: Seq[(String, Expr)] = Seq.empty
    def isIdentCI(s: String): Boolean = cur match {
      case Ident(x, _) => x.equalsIgnoreCase(s)
      case _ => false
    }
    def setList(): Seq[(String, Expr)] = {
      val tgt = target.getOrElse(notSupported(
        s"ON MATCH/ON CREATE SET on an anonymous merged $kind — name " +
        "the variable to assign through it"))
      val b = Vector.newBuilder[(String, Expr)]
      def one(): Unit = {
        val a = ident()
        if (a != tgt) syntaxErr(
          s"SET target must be the merged $kind '$tgt', got '$a'")
        eatPunct(".")
        val pr = cur match {
          case Ident(s, _)   => p += 1; s
          case Kw(_, raw, _) => p += 1; raw
          case _ => syntaxErr("expected a property name after '.'")
        }
        eatPunct("=")
        b += ((pr, parseExpr()))
      }
      one(); while (tryPunct(",")) one()
      b.result()
    }
    while (isIdentCI("ON")) {
      p += 1
      if (tryKw("MATCH")) {
        eatKw("SET")
        if (onMatch.nonEmpty) syntaxErr("duplicate ON MATCH SET")
        onMatch = setList()
      } else if (tryKw("CREATE")) {
        eatKw("SET")
        if (onCreate.nonEmpty) syntaxErr("duplicate ON CREATE SET")
        onCreate = setList()
      } else syntaxErr("expected MATCH or CREATE after ON")
    }
    (onMatch, onCreate)
  }

  /** `-[r:T]->` / `<-[r:T]-` between two bare endpoints of a
    * relationship MERGE/CREATE. Returns (relAlias, verb, incoming).
    * `allowMap` admits an inline property map (CREATE's assignments);
    * MERGE rejects it (the merge key IS the endpoint pair). */
  private def parseBareRel(allowMap: Boolean, kw: String)
      : (Option[String], String, Boolean, Seq[(String, Expr)]) = {
    val leftArrow = isPunct("<-")
    if (!leftArrow && !isPunct("-")) syntaxErr(
      s"expected a relationship pattern after the $kw endpoint")
    p += 1
    eatPunct("[")
    val rAlias: Option[String] = cur match {
      case Ident(s, _) =>
        if (s.startsWith("__"))
          notSupported(s"alias '$s' — names starting with __ are reserved")
        p += 1; Some(s)
      case _ => None
    }
    eatPunct(":")
    val verb = name()
    if (isPunct("|"))
      notSupported(s"relationship type alternation in $kw — one verb, " +
        "one edge snapshot")
    if (isPunct("*"))
      notSupported(s"variable-length relationship in $kw — one hop, " +
        "one edge row")
    val props: Seq[(String, Expr)] =
      if (isPunct("{")) {
        if (!allowMap)
          notSupported(s"property map on a $kw relationship")
        parsePropMap()
      } else Seq.empty
    eatPunct("]")
    val incoming =
      if (leftArrow) { eatPunct("-"); true }
      else if (tryPunct("->")) false
      else notSupported(s"undirected relationship in $kw — an edge row " +
        "has a fixed (src, snk) orientation; direct the pattern")
    (rAlias, verb, incoming, props)
  }

  /** Bare `(x)` endpoint of a relationship MERGE/CREATE — a bound
    * node variable reference, consumed after the opening paren and
    * alias were read by the caller's dispatcher. */
  private def bareEndpoint(): String = {
    val a = cur match {
      case Ident(s, _) =>
        if (s.startsWith("__"))
          notSupported(s"alias '$s' — names starting with __ are reserved")
        p += 1; s
      case _ => syntaxErr("expected a bound node variable in '(…)'")
    }
    eatPunct(")")
    a
  }

  private def parseMergeClause(): Either[MergeClause, MergeRelClause] = {
    // one MERGE endpoint: `(a)` — a bound node reference — or
    // `(a:Label {id: expr})` — the node-MERGE id-map shape, declaring
    // a NEW variable keyed per feed row (round 11: this form is legal
    // on relationship-MERGE endpoints too, the MATCH-less ingest idiom)
    def endpoint(): (String, Option[MergeEndpoint]) = {
      eatPunct("(")
      val alias = cur match {
        case Ident(s, _) =>
          if (s.startsWith("__"))
            notSupported(s"alias '$s' — names starting with __ are reserved")
          p += 1; s
        case _ => syntaxErr(
          "MERGE requires a named node — MERGE (n:Label {id: …}) — or a " +
          "relationship between endpoints — MERGE (a)-[r:T]->(b)")
      }
      if (isPunct(")")) { p += 1; (alias, None) }
      else {
        eatPunct(":")
        val label = name()
        if (!isPunct("{")) syntaxErr(
          "MERGE node requires a property map binding its id, e.g. {id: …}")
        eatPunct("{")
        val keyProp = cur match {
          case Ident(s, _)  => p += 1; s
          case Kw(_, raw, _) => p += 1; raw
          case _ => syntaxErr("expected the id property name in the MERGE map")
        }
        eatPunct(":")
        val keyExpr = parseExpr()
        // further map entries (round 13): legal on a terminal NODE
        // MERGE (the whole map is the match key, Neo4j semantics);
        // relationship endpoints reject them below
        val extras = Vector.newBuilder[(String, Expr)]
        while (tryPunct(",")) {
          val k2 = cur match {
            case Ident(s, _)   => p += 1; s
            case Kw(_, raw, _) => p += 1; raw
            case _ => syntaxErr("expected a property name in the MERGE map")
          }
          eatPunct(":")
          extras += (k2 -> parseExpr())
        }
        eatPunct("}")
        eatPunct(")")
        (alias, Some(MergeEndpoint(label, keyProp, keyExpr, extras.result())))
      }
    }
    val (alias, spec) = endpoint()
    if (isPunct("-") || isPunct("<-")) {
      // relationship MERGE (round 10; id-map endpoints round 11;
      // property-map match key round 12): edge upsert keyed by the
      // (src, snk) pair PLUS any `{k: v}` map entries — Neo4j's
      // match-on-pair-and-map semantics
      val (rAlias, verb, incoming, props) =
        parseBareRel(allowMap = true, kw = "MERGE")
      val (other, oSpec) = endpoint()
      val (srcA, srcS, dstA, dstS) =
        if (incoming) (other, oSpec, alias, spec)
        else (alias, spec, other, oSpec)
      if (Seq(srcS, dstS).flatten.exists(_.extra.nonEmpty))
        notSupported("MERGE relationship endpoint map beyond the id " +
          "property — endpoint identity is the unique node id; the " +
          "relationship's own map keys the edge")
      val (om, oc) = parseOnSets(rAlias, "relationship")
      return Right(MergeRelClause(srcA, rAlias, verb, dstA, om, oc,
        srcS, dstS, props))
    }
    val ep = spec.getOrElse(syntaxErr(
      "MERGE node requires a property map binding its id, e.g. {id: …}"))
    val (onMatch, onCreate) = parseOnSets(Some(alias), "node")
    Left(MergeClause(alias, ep.label, ep.keyProp, ep.keyExpr, onMatch,
      onCreate, ep.extra))
  }

  /** `SET a.p = e [, a.q = e2 …]` and the map-sugar form
    * `SET a += {p: e, q: e2, …}` (each key desugars to an ordinary
    * assignment — the compiler checks keys against the declared
    * properties exactly as it does spelled-out ones) — terminal,
    * every assignment on ONE bound entity variable (one query, one
    * new snapshot). `SET a = {…}` (round 11) is Neo4j's full map
    * replacement: listed keys assign, every OTHER declared non-key
    * property nulls (the compiler expands against the schema — the
    * nulling is explicit contract, not silence); it must be the SET's
    * only item. The SET keyword is consumed by the caller. */
  private def parseSetClause(): Seq[SetClause] = {
    // multi-variable SET (round 16; VERDICT-r15 #1): items group PER
    // VARIABLE in first-appearance order — each group desugars to one
    // SetClause and assembleUpdating folds the 2nd..nth into a nested
    // update chain (the multi-variable DELETE convention). Later
    // variables' rhs read earlier variables' UPDATED values through
    // the carried read-back frame (the documented chain contract);
    // the one-snapshot-per-entity guard still rejects two variables
    // backed by the SAME table.
    import scala.collection.mutable
    val assigns = mutable.LinkedHashMap
      .empty[String, mutable.ArrayBuffer[(String, Expr)]]
    val labels = mutable.LinkedHashMap
      .empty[String, mutable.ArrayBuffer[String]]
    var fullReplace: Option[String] = None
    var items = 0
    def bufs(a: String): mutable.ArrayBuffer[(String, Expr)] = {
      labels.getOrElseUpdate(a, mutable.ArrayBuffer.empty)
      assigns.getOrElseUpdate(a, mutable.ArrayBuffer.empty)
    }
    def propName(where: String): String = cur match {
      case Ident(s, _)   => p += 1; s
      case Kw(_, raw, _) => p += 1; raw
      case _ => syntaxErr(s"expected a property name $where")
    }
    def one(): Unit = {
      val a = ident()
      val b = bufs(a)
      items += 1
      if (isPunct(":")) {
        // `SET a:Label[:Label2]` (round 12): resolved at compile
        // against the node's declared sub-labels (discriminator write)
        while (tryPunct(":")) labels(a) += name()
        return
      }
      if (isPunct("+")) {
        // `SET a += {k: e, …}` — parse the map inline (keys are
        // property names, taken verbatim) and emit one assignment per
        // key; duplicate keys collapse to the SetClause duplicate check
        p += 1
        eatPunct("=")
        if (!isPunct("{")) syntaxErr("expected a map literal after '+='")
        eatPunct("{")
        def entry(): Unit = {
          val pr = propName("in the SET += map")
          eatPunct(":")
          b += ((pr, parseExpr()))
        }
        entry(); while (tryPunct(",")) entry()
        eatPunct("}")
      } else if (isPunct("=")) {
        // full map replacement (round 11): listed keys assign, the
        // compiler nulls every other declared non-key property
        if (items > 1) notSupported(
          "a SET = {…} full replacement must be the SET's only item")
        p += 1
        if (!isPunct("{")) syntaxErr(
          s"expected a map literal after 'SET $a =' (full replacement)")
        eatPunct("{")
        if (!isPunct("}")) {
          def entry(): Unit = {
            val pr = propName("in the SET = map")
            eatPunct(":")
            b += ((pr, parseExpr()))
          }
          entry(); while (tryPunct(",")) entry()
        }
        eatPunct("}")
        fullReplace = Some(a)
      } else {
        eatPunct(".")
        val pr = propName("after '.'")
        eatPunct("=")
        b += ((pr, parseExpr()))
      }
    }
    one()
    while (tryPunct(",")) {
      if (fullReplace.isDefined) notSupported(
        "further assignments after a SET = {…} full replacement — the " +
        "map already determines every property")
      one()
    }
    assigns.keysIterator.map { a =>
      SetClause(a, assigns(a).toVector, fullReplace.contains(a),
        setLabels = labels(a).toVector)
    }.toVector
  }

  /** `REMOVE a.p [, a.q …]` — parse sugar for `SET a.p = null, …`
    * (property removal IS a null write in a table-backed graph; the
    * compiler path, winner-dedup and snapshot union are shared with
    * SET). Label removal `REMOVE a:L` is a typed rejection. The
    * REMOVE keyword is consumed by the caller. */
  private def parseRemoveClause(): Seq[SetClause] = {
    // multi-variable REMOVE (round 16): grouped per variable in
    // first-appearance order, one clause each — parseSetClause's
    // desugar with null writes
    import scala.collection.mutable
    val assigns = mutable.LinkedHashMap
      .empty[String, mutable.ArrayBuffer[(String, Expr)]]
    val labels = mutable.LinkedHashMap
      .empty[String, mutable.ArrayBuffer[String]]
    def bufs(a: String): mutable.ArrayBuffer[(String, Expr)] = {
      labels.getOrElseUpdate(a, mutable.ArrayBuffer.empty)
      assigns.getOrElseUpdate(a, mutable.ArrayBuffer.empty)
    }
    def one(): Unit = {
      val a = ident()
      val b = bufs(a)
      if (isPunct(":")) {
        // `REMOVE a:Label` (round 12): conditional discriminator null
        // at compile (only rows currently carrying the value)
        while (tryPunct(":")) labels(a) += name()
        return
      }
      eatPunct(".")
      val pr = cur match {
        case Ident(s, _)   => p += 1; s
        case Kw(_, raw, _) => p += 1; raw
        case _ => syntaxErr("expected a property name after '.'")
      }
      b += ((pr, Lit(null)))
    }
    one(); while (tryPunct(",")) one()
    assigns.keysIterator.map { a =>
      SetClause(a, assigns(a).toVector,
        removeLabels = labels(a).toVector)
    }.toVector
  }

  /** `CREATE (n:Label {p1: e1, p2: e2, …})` — terminal, unconditional
    * append; the map may bind any declared properties (the compiler
    * checks the id property is among them). The CREATE keyword is
    * consumed by the caller. */
  private def parseCreateClause(): Seq[Either[CreateClause, CreateRelClause]] = {
    // one CREATE endpoint/node: `(a)` bound reference, or
    // `(a:Label {p: e, …})` with its property map
    def endpoint(): (String, Option[String], Seq[(String, Expr)]) = {
      eatPunct("(")
      val alias = cur match {
        case Ident(s, _) =>
          if (s.startsWith("__"))
            notSupported(s"alias '$s' — names starting with __ are reserved")
          p += 1; s
        case _ => syntaxErr(
          "CREATE requires a named node — CREATE (n:Label {id: …, …}) — " +
          "or a relationship between endpoints — CREATE (a)-[:T {…}]->(b)")
      }
      if (isPunct(")")) { p += 1; (alias, None, Seq.empty) }
      else {
        eatPunct(":")
        val label = name()
        if (isPunct(":"))
          notSupported("CREATE with multiple labels — one node table, " +
            "one label")
        if (!isPunct("{")) syntaxErr(
          "CREATE node requires a property map binding at least its id, " +
          "e.g. {id: …}")
        eatPunct("{")
        val b = Vector.newBuilder[(String, Expr)]
        def one(): Unit = {
          val pr = cur match {
            case Ident(s, _)   => p += 1; s
            case Kw(_, raw, _) => p += 1; raw
            case _ => syntaxErr("expected a property name in the CREATE map")
          }
          eatPunct(":")
          b += ((pr, parseExpr()))
        }
        one(); while (tryPunct(",")) one()
        eatPunct("}")
        eatPunct(")")
        (alias, Some(label), b.result())
      }
    }
    // id-map endpoint of a relationship CREATE (round 11): the map
    // must bind EXACTLY one property (the id — the compiler checks
    // which); the node row is NOT created, so any other property
    // would silently drop
    def toSpec(alias: String, label: Option[String],
        props: Seq[(String, Expr)]): Option[MergeEndpoint] =
      label.map { l =>
        if (props.size != 1)
          notSupported(s"CREATE relationship endpoint ($alias:$l {…}) " +
            "map beyond the id property — the node row is not created " +
            "here (one query, one snapshot); create it with its own " +
            "CREATE and bind only the id on the endpoint")
        MergeEndpoint(l, props.head._1, props.head._2)
      }
    // multi-pattern / path CREATE (round 13): `CREATE (a)-[:R]->(b)
    // -[:S]->(c), (d:L {id: …})` desugars into one clause per edge /
    // node, chained over each other's read-back frames (implicit
    // WITH * — the q103 multi-updating plumbing). A path's interior
    // endpoint carries its id map on its FIRST edge only; the next
    // edge references the read-back binding. One snapshot per backing
    // table still holds — two creates into the SAME table stay the
    // typed guardTarget rejection.
    val out = Vector.newBuilder[Either[CreateClause, CreateRelClause]]
    def onePart(): Unit = {
      var (alias, label, props) = endpoint()
      var firstHop = true
      var isRel = false
      while (isPunct("-") || isPunct("<-")) {
        isRel = true
        val (rAlias, verb, incoming, rProps) =
          parseBareRel(allowMap = true, kw = "CREATE")
        val (other, oLabel, oProps) = endpoint()
        val spec = if (firstHop) toSpec(alias, label, props) else None
        firstHop = false
        val oSpec = toSpec(other, oLabel, oProps)
        val (srcA, srcS, dstA, dstS) =
          if (incoming) (other, oSpec, alias, spec)
          else (alias, spec, other, oSpec)
        out += Right(CreateRelClause(srcA, verb, dstA, rProps, rAlias,
          srcS, dstS))
        // a longer path continues from the far endpoint, now bound
        alias = other; label = oLabel; props = oProps
      }
      if (!isRel) {
        val l = label.getOrElse(syntaxErr(
          "CREATE node requires a label and a property map binding at " +
          "least its id, e.g. CREATE (n:Label {id: …})"))
        out += Left(CreateClause(alias, l, props))
      }
    }
    onePart()
    while (tryPunct(",")) onePart()
    out.result()
  }

  /** `[DETACH] DELETE a` — terminal, ONE bound entity variable. The
    * DELETE keyword is consumed by the caller. */
  private def parseDeleteClause(detach: Boolean): Seq[DeleteClause] = {
    // DELETE n, r (round 13): one clause per variable, chained over
    // the PRE-delete read-back frames (each variable stays bound for
    // the later clauses); one snapshot per backing table still holds
    val b = Vector.newBuilder[DeleteClause]
    b += DeleteClause(ident(), detach)
    while (tryPunct(",")) b += DeleteClause(ident(), detach)
    b.result()
  }

  private def parseMatchBody(optional: Boolean): MatchClause = {
    val m0 = pcMark()
    val pats = Vector.newBuilder[PatternPart]
    pats += parsePatternPart(allowPath = true)
    while (tryPunct(",")) pats += parsePatternPart(allowPath = true)
    // drain the pattern's property-map conjuncts BEFORE parsing the
    // WHERE: a pattern expression inside it (EXISTS { … }) scopes its
    // own maps
    val mapConj = pcDrain(m0)
    val where = if (tryKw("WHERE")) Some(parseExpr()) else None
    MatchClause(pats.result(), optional, andAll(where, mapConj))
  }

  /** Safe one-token lookahead: EOF past the end (the token vector always
    * ends in EOF, but `p + 1` may still step past it mid-error). */
  private def peek1: Tok =
    if (p + 1 < tokens.length) tokens(p + 1) else tokens.last

  private def parsePatternPart(allowPath: Boolean = false): PatternPart = {
    // named path `x = (...)` — reference rejects (CypherVisitor.cs:
    // 998-1002); with extensions enabled a TOP-LEVEL MATCH pattern may
    // bind one, supporting length(p) only (see Ast.PatternPart)
    val pathVar: Option[String] = (cur, peek1) match {
      case (Ident(s, _), Punct("=", _)) =>
        if (!extensions || !allowPath)
          notSupported("named path variables" +
            (if (extensions && !allowPath) " outside a top-level MATCH"
             else " (supported with extensions enabled)"))
        // same reserved-namespace rule as patAlias(): a user path var
        // may not collide with parser-synthesized `__pm<N>` names
        if (s.startsWith("__"))
          notSupported(s"alias '$s' — names starting with __ are reserved")
        p += 2
        Some(s)
      case _ => None
    }
    // GQL path selectors (round 14; Cypher 5.21): `ALL SHORTEST` /
    // `ANY SHORTEST` / `SHORTEST k [GROUPS]` / `ANY [k]` prefixes —
    // the k = 1 spellings map onto the function-form booleans, k > 1
    // survives as a selector the compiler ranks. Only in top-level
    // MATCH, like the function forms.
    def word(t: Tok): Option[String] = t match {
      case Ident(s, _)  => Some(s.toUpperCase(java.util.Locale.ROOT))
      case Kw(k, _, _)  => Some(k)
      case _            => None
    }
    def selGate(what: String): Unit =
      if (!extensions || !allowPath)
        notSupported(what +
          (if (extensions && !allowPath) " outside a top-level MATCH"
           else " (supported with extensions enabled)"))
    var selShortest = false
    var selAll = false
    var selector: Option[ast.PathSelector] = None
    word(cur) match {
      case Some("ALL") if word(peek1).contains("SHORTEST") =>
        selGate("ALL SHORTEST"); p += 2; selAll = true
      case Some("ANY") if word(peek1).contains("SHORTEST") =>
        selGate("ANY SHORTEST"); p += 2; selShortest = true
      case Some("SHORTEST") => peek1 match {
        case NumLit(_, false, _) =>
          selGate("SHORTEST k")
          p += 1
          val k = cur match {
            case NumLit(v, false, _) if v.length <= 4 && v.toInt >= 1 &&
                v.toInt <= 1000 => p += 1; v.toInt
            case _ => syntaxErr(
              "SHORTEST k: k must be an integer in [1, 1000]")
          }
          val groups = word(cur).contains("GROUPS") && { p += 1; true }
          if (k == 1 && groups) selAll = true
          else if (k == 1 && !groups) selShortest = true
          else selector = Some(ast.PathSelector(
            if (groups) "groups" else "shortest", k))
        case _ =>
      }
      case Some("ANY") => peek1 match {
        case NumLit(_, false, _) =>
          selGate("ANY k")
          p += 1
          val k = cur match {
            case NumLit(v, false, _) if v.length <= 4 && v.toInt >= 1 &&
                v.toInt <= 1000 => p += 1; v.toInt
            case _ => syntaxErr("ANY k: k must be an integer in [1, 1000]")
          }
          // ANY 1 = one arbitrary path: the deterministic shortest
          // witness is a valid (and the engine's) choice — fold onto
          // the k = 1 lowering so unbounded ranges work like
          // SHORTEST 1
          if (k == 1) selShortest = true
          else selector = Some(ast.PathSelector("any", k))
        case _ =>
      }
      case _ =>
    }
    // shortestPath( pattern ) / allShortestPaths( pattern ) —
    // extensions; the reference has no shortest-path support at all.
    // Only in top-level MATCH, like path vars.
    val (fnShortest, fnAllShortest): (Boolean, Boolean) =
      (cur, peek1) match {
        case (Ident(s, _), Punct("(", _))
            if s.equalsIgnoreCase("shortestPath") &&
              !selShortest && !selAll && selector.isEmpty =>
          if (!extensions || !allowPath)
            notSupported("shortestPath()" +
              (if (extensions && !allowPath) " outside a top-level MATCH"
               else " (supported with extensions enabled)"))
          p += 2
          (true, false)
        case (Ident(s, _), Punct("(", _))
            if s.equalsIgnoreCase("allShortestPaths") &&
              !selShortest && !selAll && selector.isEmpty =>
          if (!extensions || !allowPath)
            notSupported("allShortestPaths()" +
              (if (extensions && !allowPath) " outside a top-level MATCH"
               else " (supported with extensions enabled)"))
          p += 2
          (false, true)
        case _ => (false, false)
      }
    val shortest = fnShortest || selShortest
    val allShortest = fnAllShortest || selAll
    val nodes = Vector.newBuilder[NodePat]
    val rels = Vector.newBuilder[RelPat]
    nodes += parseNodePat()
    var more = true
    while (more) {
      // a '(' in relationship position opens a quantified path
      // pattern group `((a)-[:R]->(b) WHERE …){m,n}` (round 13)
      if (isPunct("(")) {
        rels += parseQpp()
        nodes += parseNodePat()
      } else parseRelPatOpt() match {
        case Some(r) => rels += r; nodes += parseNodePat()
        case None => more = false
      }
    }
    if (fnShortest || fnAllShortest) eatPunct(")")
    if (shortest || allShortest || selector.isDefined) {
      if (!rels.result().exists(_.varLength.isDefined))
        notSupported((if (selector.isDefined) "a path selector"
          else if (shortest) "shortestPath()"
          else "allShortestPaths()") + " requires a variable-length " +
          "relationship [*lo..hi] inside the pattern")
    }
    PatternPart(nodes.result(), rels.result(), pathVar, shortest,
      allShortest, selector)
  }

  /** `{k: expr, …}` in a pattern position. Keys may be identifiers,
   *  strings, or keywords-as-names (`{contains: 1}`); duplicates are a
   *  syntax error; an empty map is legal and contributes nothing. */
  private def parsePropMap(): Seq[(String, Expr)] = {
    eatPunct("{")
    val fields = Vector.newBuilder[(String, Expr)]
    def one(): Unit = {
      val k = cur match {
        case Ident(s, _)  => p += 1; s
        case StrLit(s, _) => p += 1; s
        case Kw(_, raw, _) => p += 1; raw
        case _ => syntaxErr("expected a property name in property map")
      }
      eatPunct(":")
      fields += (k -> parseExpr())
    }
    if (!isPunct("}")) { one(); while (tryPunct(",")) one() }
    eatPunct("}")
    val fs = fields.result()
    val dup = fs.groupBy(_._1).collectFirst { case (k, vs) if vs.size > 1 => k }
    dup.foreach(k => syntaxErr(s"duplicate property '$k' in property map"))
    fs
  }

  /** Pattern-alias reader: user aliases may not enter the engine's
   *  reserved `__` namespace (keeps parser-synthesized `__pm<N>`
   *  collision-free; the analyzer enforces the same rule for
   *  everything it names). */
  private def patAlias(): Option[String] = cur match {
    case Ident(s, _) =>
      if (s.startsWith("__"))
        notSupported(s"alias '$s' — names starting with __ are reserved")
      p += 1; Some(s)
    case _ => None
  }

  private def parseNodePat(): NodePat = {
    eatPunct("(")
    val alias = patAlias()
    val (label, extraLabels, labelAlts, negLabels) = if (tryPunct(":")) {
      // Cypher 5 label expressions (round 13): `&` is a synonym of the
      // `:` intersection separator, `!L` negates a label
      val negs = Vector.newBuilder[String]
      var sawAny = false // `%` wildcard (Cypher 5: any label)
      def posOrNeg(): Option[String] =
        if (tryPunct("!")) {
          if (!extensions)
            notSupported("label negation (n:!A) " +
              "(supported with extensions enabled)")
          negs += name(); None
        } else if (isPunct("%")) {
          if (!extensions)
            notSupported("any-label wildcard (n:%) " +
              "(supported with extensions enabled)")
          p += 1; sawAny = true; None // no constraint — inference decides
        } else Some(name())
      var first = posOrNeg()
      val extras = Vector.newBuilder[String]
      while (isPunct(":") || isPunct("&")) {
        if (!extensions)
          notSupported("multiple node labels in one pattern " +
            "(supported with extensions enabled)")
        p += 1
        posOrNeg().foreach { n2 =>
          if (first.isEmpty) first = Some(n2) else extras += n2
        }
      }
      if (first.isEmpty && negs.result().nonEmpty && !sawAny)
        notSupported(
          "label negation (n:!A) without a positive label on the same " +
          "node — anchor the pattern with a primary label (or :%)")
      if (first.isEmpty && negs.result().nonEmpty && sawAny)
        notSupported("label negation over the any-label wildcard " +
          "(n:%&!A) — the negated label's table is undetermined; " +
          "anchor with a primary label")
      val l = first.getOrElse("") // "" only when pure `%` (no constraint)
      // label alternation `(n:A|B)` (extension) — union semantics,
      // mutually exclusive with the `:A:B` intersection form
      val alts = Vector.newBuilder[String]
      if (isPunct("|")) {
        if (first.isEmpty)
          notSupported("label alternation over the any-label " +
            "wildcard (n:%|A)")
        if (!extensions)
          notSupported("node label alternation (n:A|B) " +
            "(supported with extensions enabled)")
        if (extras.result().nonEmpty)
          notSupported("mixing label intersection (:A:B) with label " +
            "alternation (:A|B) in one pattern")
        while (tryPunct("|")) alts += name()
        if (isPunct(":"))
          notSupported("mixing label alternation (:A|B) with label " +
            "intersection (:A:B) in one pattern")
      }
      if (alts.result().nonEmpty && negs.result().nonEmpty)
        notSupported("mixing label negation (!A) with label " +
          "alternation (:A|B) in one pattern")
      (first, extras.result(), alts.result().distinct.filterNot(_ == l),
        negs.result().distinct)
    } else (None, Vector.empty[String], Vector.empty[String],
      Vector.empty[String])
    val props = if (isPunct("{")) {
      if (!extensions)
        notSupported("inline property map in node pattern " +
          "(supported with extensions enabled)")
      parsePropMap()
    } else Seq.empty
    // Cypher 5 pattern predicate `(n:L WHERE n.x > 1)` — same
    // parse-time desugar as the property map: the predicate becomes a
    // conjunct of the enclosing pattern consumer's WHERE
    val patWhere = if (isKw("WHERE")) {
      if (!extensions)
        notSupported("WHERE inside a node pattern " +
          "(supported with extensions enabled)")
      p += 1
      Some(parseExpr())
    } else None
    eatPunct(")")
    val bound = if (props.nonEmpty && alias.isEmpty) Some(nextPm()) else alias
    props.foreach { case (k, v) =>
      propConjuncts += Bin(BinOp.Eq, Ref(bound.get, Some(k)), v) }
    patWhere.foreach(propConjuncts += _)
    NodePat(bound, label, extraLabels, labelAlts, negLabels)
  }

  /** Quantified path pattern (round 13; Cypher 5 / GQL):
    * `((a)-[r:R]->(b) [WHERE pred]){m,n}` — also `{n}`, `{m,}`,
    * `{,n}`, `+` (= {1,}) and `*` (= {0,}). Lowers onto the existing
    * var-length machinery: the quantifier becomes the `[*lo..hi]`
    * range (the same bounds contract — unbounded lower > 1 and upper
    * > MaxVarHops stay rejected), and every group predicate (inline
    * maps, pattern WHEREs, the group WHERE) conjoins into a
    * per-repetition predicate carried by [[QppSpec]]. The caller is
    * positioned ON the group's '('. */
  private def parseQpp(): RelPat = {
    if (!extensions)
      notSupported("quantified path patterns ((a)-[:R]->(b)){m,n} " +
        "(supported with extensions enabled)")
    eatPunct("(")
    val m0 = pcMark()
    val a = parseNodePat()
    val rel = parseRelPatOpt().getOrElse(syntaxErr(
      "expected a relationship inside the quantified path pattern group"))
    if (rel.varLength.isDefined)
      notSupported("variable-length relationship inside a quantified " +
        "path pattern group — quantify the group instead")
    val b = parseNodePat()
    // multi-relationship group (round 13): hops 2..N chain on — the
    // compiler composes the chain into one synthetic edge frame and
    // quantifies the composite
    val tailB = Vector.newBuilder[(RelPat, NodePat)]
    while (isPunct("-") || isPunct("<-")) {
      val r2 = parseRelPatOpt().getOrElse(syntaxErr(
        "expected a relationship inside the quantified path pattern " +
        "group"))
      if (r2.varLength.isDefined)
        notSupported("variable-length relationship inside a quantified " +
          "path pattern group — quantify the group instead")
      tailB += ((r2, parseNodePat()))
    }
    val tailRaw = tailB.result()
    val groupWhere = if (tryKw("WHERE")) Some(parseExpr()) else None
    eatPunct(")")
    def intLit(): Int = cur match {
      case NumLit(s, false, _) =>
        val v = try s.toLong
          catch { case _: NumberFormatException =>
            syntaxErr(s"quantifier bound out of range: $s") }
        if (v < 0 || v > Int.MaxValue)
          syntaxErr(s"quantifier bound out of range: $s")
        p += 1; v.toInt
      case _ => syntaxErr("expected an integer quantifier bound")
    }
    val (lo, hi) =
      if (tryPunct("+")) (1, Parser.Unbounded)
      else if (tryPunct("*")) (0, Parser.Unbounded)
      else if (tryPunct("{")) {
        val loO = cur match {
          case NumLit(_, false, _) => Some(intLit())
          case _ => None
        }
        val r2 = if (tryPunct(",")) {
          cur match {
            case NumLit(_, false, _) => (loO.getOrElse(0), intLit())
            case _ => (loO.getOrElse(0), Parser.Unbounded)
          }
        } else (loO.getOrElse(syntaxErr("expected a quantifier bound")),
          loO.getOrElse(0))
        eatPunct("}")
        r2
      } else syntaxErr(
        "expected a quantifier ({m,n}, + or *) after the quantified " +
        "path pattern group")
    // `{lo,}` with lo > 1 (round 17): accepted — it reaches Reach as
    // [*lo..] (possibly over a HopPred-filtered or composite frame)
    // and lowers through the k-level DP, DAG-exact, typed on cycles
    if (hi != Parser.Unbounded && hi < lo)
      syntaxErr(s"quantifier range {$lo,$hi} is empty")
    if (hi != Parser.Unbounded && hi > Parser.MaxVarHops)
      notSupported(s"quantifier upper bound $hi exceeds the supported " +
        s"maximum ${Parser.MaxVarHops}")
    // the group's inline predicates (node/rel property maps, pattern
    // WHEREs) landed in propConjuncts — they belong to the REPETITION,
    // not the enclosing clause; drain them into the per-hop predicate
    val inline = pcDrain(m0)
    val aA = a.alias.getOrElse(nextPm())
    val bA = b.alias.getOrElse(nextPm())
    val rA = rel.alias.getOrElse(nextPm())
    // label alternation `:A|B` / intersection `:A:B` on group nodes
    // (round 13) lower statically like HasLabel — carried through
    def lblOf(np: NodePat): QppLbl = {
      if (np.negLabels.nonEmpty)
        notSupported("label negation (!A) on a quantified path " +
          "pattern group node")
      QppLbl(np.label, np.extraLabels, np.labelAlts)
    }
    val tail = tailRaw.map { case (r2, n2) =>
      if (r2.dir == Direction.Both)
        notSupported("undirected relationship inside a " +
          "multi-relationship quantified path pattern group — give " +
          "every hop a direction")
      QppHop(r2.alias.getOrElse(nextPm()), r2.verb,
        out = r2.dir == Direction.Out,
        n2.alias.getOrElse(nextPm()), lblOf(n2))
    }
    if (tail.nonEmpty && rel.dir == Direction.Both)
      notSupported("undirected relationship inside a " +
        "multi-relationship quantified path pattern group — give " +
        "every hop a direction")
    // GQL group variables (round 15, VERDICT-r14 #8 + late): the
    // USER-NAMED rel and endpoints of a SINGLE-relationship group
    // bind per-path lists of the repetitions' relationships / nodes —
    // task 1's list machinery over the (possibly predicate-filtered)
    // hop frame. Inside the group predicate the same names are the
    // per-repetition iteration variables, GQL's two-level reading.
    // UNBOUNDED quantifiers keep the names PREDICATE-LOCAL instead of
    // binding (the transitive-reach lowering keeps no per-hop rows —
    // reading one outside is then the ordinary unknown-variable
    // error); multi-rel chains bind their named hops through the
    // composite's exported structs (HopPred.rewriteQppChain).
    val bindable = tail.isEmpty && hi != Parser.Unbounded
    RelPat(None, rel.verb, rel.dir, varLength = Some((lo, hi)),
      alts = rel.alts,
      qpp = Some(QppSpec(aA, rA, bA, lblOf(a), lblOf(b),
        andAll(groupWhere, inline), tail)),
      listAlias = if (bindable) rel.alias else None,
      srcListAlias = if (bindable) a.alias else None,
      dstListAlias = if (bindable) b.alias else None)
  }

  /** Parses one relationship pattern if the next tokens start one. */
  private def parseRelPatOpt(): Option[RelPat] = {
    val leftArrow = isPunct("<-")
    if (!leftArrow && !isPunct("-")) return None
    p += 1
    if (tryPunct("[")) {
      val alias = patAlias()
      var alts: Seq[String] = Seq.empty
      val verb = if (tryPunct(":")) {
        val v = name()
        if (isPunct("|")) {
          if (!extensions)
            notSupported("multiple relationship types " +
              "(supported with extensions enabled)")
          val b = Vector.newBuilder[String]
          while (tryPunct("|")) b += name()
          alts = b.result().distinct.filterNot(_ == v)
          // a BOUND alternation `[r:A|B]` is allowed (round 8): the
          // compiler unions the branches over the UNION of the
          // alternatives' property namespaces, null-filling per
          // branch (openCypher's missing-property-is-null rule);
          // the branch endpoints must still agree on labels
        }
        Some(v)
      } else None
      val varLength = if (isPunct("*")) {
        if (!extensions)
          notSupported("variable-length relationships [*..] " +
            "(bounded [*lo..hi] supported with extensions enabled)")
        p += 1
        // alias check deferred: `[r:T* WHERE r.p > 0]` consumes the
        // alias as the per-hop predicate's name; a LEFTOVER alias (no
        // predicate to consume it) is still the typed rejection below
        def intLit(): Int = cur match {
          case NumLit(s, false, _) =>
            val v = try s.toLong
              catch { case _: NumberFormatException =>
                syntaxErr(s"variable-length bound out of range: $s") }
            if (v < 0 || v > Int.MaxValue)
              syntaxErr(s"variable-length bound out of range: $s")
            p += 1; v.toInt
          case _ => syntaxErr("Expected an integer variable-length bound")
        }
        val lo = cur match {
          case NumLit(_, false, _) => Some(intLit())
          case _ => None
        }
        // unbounded forms `[*]` / `[*1..]` are accepted (extension) and
        // lowered to reachability via an iterate-to-fixpoint BFS — hi =
        // [[Parser.Unbounded]] marks them; `[*lo..]` with lo > 1
        // (round 17) lowers through the k-level DP instead (no BFS
        // lowering exists: min-distance ≠ exists-longer-path on
        // cyclic graphs — the DP is DAG-exact, typed on cycles)
        val range = if (tryPunct("..")) {
          cur match {
            case NumLit(_, false, _) => (lo.getOrElse(1), intLit())
            case _ => (lo.getOrElse(1), Parser.Unbounded)
          }
        } else lo match {
          case Some(k) => (k, k)
          case None => (1, Parser.Unbounded)
        }
        // zero-length lower bounds: `[*0..]` lowers to the unbounded
        // reflexive closure (identity rows in the reach frame);
        // `[*0..k]` (round 11) unrolls a zero-hop identity branch into
        // the bounded union (VarLength.zeroHopPart). A lower bound > 1
        // (round 17) is accepted and lowered through the k-level DP —
        // DAG-exact, typed on cyclic graphs (Reach.rewrite).
        if (range._2 < range._1)
          syntaxErr(s"variable-length range ${range._1}..${range._2} is empty")
        if (range._2 != Parser.Unbounded && range._2 > Parser.MaxVarHops)
          notSupported(s"variable-length upper bound ${range._2} exceeds " +
            s"the supported maximum ${Parser.MaxVarHops}")
        Some(range)
      } else None
      val props = if (isPunct("{")) {
        if (!extensions)
          notSupported("inline property map in rel pattern " +
            "(supported with extensions enabled)")
        if (alts.nonEmpty)
          notSupported("inline property map on a relationship type " +
            "alternation (the alternatives have different property " +
            "namespaces)")
        parsePropMap()
      } else Seq.empty
      // Cypher 5 pattern predicate `[r:T WHERE r.x > 0]` — desugars
      // like the node form on single hops; on a VAR-LENGTH rel (round
      // 10) the map/WHERE become a PER-HOP predicate: every traversed
      // relationship must satisfy it (Neo4j's var-length map
      // semantics), the alias naming one hop and consumed by it
      val patWhere = if (isKw("WHERE")) {
        if (!extensions)
          notSupported("WHERE inside a relationship pattern " +
            "(supported with extensions enabled)")
        if (varLength.isDefined && alts.nonEmpty)
          notSupported("WHERE inside a variable-length type " +
            "alternation (the alternatives have different property " +
            "namespaces)")
        p += 1
        Some(parseExpr())
      } else None
      eatPunct("]")
      val dir =
        if (leftArrow) { eatPunct("-"); Direction.In }
        else if (tryPunct("->")) Direction.Out
        else { eatPunct("-"); Direction.Both }
      if (varLength.isDefined) {
        // alias semantics (round 15, VERDICT-r14 #1): a bare or
        // map-propertied alias binds the LIST of traversed
        // relationships (Neo4j's `[rs:R*1..3]` / `[rs:R* {k: v}]` —
        // the map stays a per-hop predicate over a SYNTHETIC hop
        // alias); only the explicit per-hop WHERE form keeps the
        // round-10 extension contract where the alias names one
        // traversed hop and is consumed by the predicate. Unbounded
        // ranges can't bind a list (the reach lowering compresses
        // the interior away — no per-hop witnesses).
        val hopAlias =
          if (patWhere.isDefined) alias.getOrElse(nextPm()) else nextPm()
        val listAlias = if (patWhere.isDefined) None else alias
        if (listAlias.isDefined &&
            varLength.exists(_._2 == Parser.Unbounded))
          notSupported("binding an UNBOUNDED variable-length " +
            "relationship to a list variable — the transitive-reach " +
            "lowering keeps no per-hop relationship rows; bound the " +
            "range ([*1..k]) or read the path's relationships(p)")
        val conj: Seq[Expr] =
          props.map { case (k, v) =>
            Bin(BinOp.Eq, Ref(hopAlias, Some(k)), v): Expr } ++
          patWhere.toSeq
        val hp: Option[(String, Expr)] =
          if (conj.isEmpty) None
          else Some((hopAlias,
            conj.reduce((a, b) => Bin(BinOp.And, a, b))))
        Some(RelPat(None, verb, dir, varLength, alts, hp,
          listAlias = listAlias))
      } else {
        val bound =
          if (props.nonEmpty && alias.isEmpty) Some(nextPm()) else alias
        props.foreach { case (k, v) =>
          propConjuncts += Bin(BinOp.Eq, Ref(bound.get, Some(k)), v) }
        patWhere.foreach(propConjuncts += _)
        Some(RelPat(bound, verb, dir, varLength, alts))
      }
    } else {
      // bare arrows: --, -->, <--
      val dir =
        if (leftArrow) { eatPunct("-"); Direction.In }
        else if (tryPunct("->")) Direction.Out
        else { eatPunct("-"); Direction.Both }
      Some(RelPat(None, None, dir))
    }
  }

  /** WITH|RETURN items; clause order inside a WITH part is
   *  `WITH … ORDER BY … LIMIT … WHERE …` (reference e2e
   *  SQLRendererTest.cs:529-539). SKIP is unsupported (§2.6). */
  private def parseProjection(isWith: Boolean): Projection = {
    val distinct = tryKw("DISTINCT")
    val star = if (isPunct("*")) {
      if (!extensions)
        notSupported("RETURN/WITH * (supported with extensions enabled)")
      p += 1
      true
    } else false
    val items = Vector.newBuilder[RetItem]
    if (star) {
      // `WITH *, extra AS x` — explicit items after the star
      if (tryPunct(",")) {
        items += parseRetItem()
        while (tryPunct(",")) items += parseRetItem()
      }
    } else {
      items += parseRetItem()
      while (tryPunct(",")) items += parseRetItem()
    }
    val orderBy = if (isKw("ORDER")) {
      p += 1; eatKw("BY")
      val ss = Vector.newBuilder[SortItem]
      def one(): SortItem = {
        val e = parseExpr()
        val desc = if (tryKw("DESC") || tryKw("DESCENDING")) true
          else { tryKw("ASC"); tryKw("ASCENDING"); false }
        // Cypher 2025 NULLS FIRST|LAST (round 14, extension)
        val nf: Option[Boolean] = cur match {
          case Ident(s, _) if s.equalsIgnoreCase("NULLS") =>
            if (!extensions)
              notSupported("NULLS FIRST/LAST (supported with " +
                "extensions enabled)")
            p += 1
            cur match {
              case Ident(x, _) if x.equalsIgnoreCase("FIRST") =>
                p += 1; Some(true)
              case Ident(x, _) if x.equalsIgnoreCase("LAST") =>
                p += 1; Some(false)
              case _ => syntaxErr("NULLS must be followed by FIRST or LAST")
            }
          case _ => None
        }
        SortItem(e, desc, nf)
      }
      ss += one()
      while (tryPunct(",")) ss += one()
      ss.result()
    } else Vector.empty
    // shared int32 contract for SKIP and LIMIT counts
    def countLit(what: String): Long = cur match {
      case NumLit(s, false, _) =>
        // validate before advancing so syntaxErr points at the literal
        val v = try s.toLong
          catch { case _: NumberFormatException =>
            syntaxErr(s"$what literal out of range: $s") }
        if (v < 0 || v > Int.MaxValue)
          syntaxErr(s"$what must be in [0, ${Int.MaxValue}], got $s")
        p += 1
        v
      case _ => syntaxErr(s"$what expects an integer literal")
    }
    // OFFSET (round 14; GQL/Cypher 2025) is SKIP's synonym
    val isOffset = cur match {
      case Ident(s, _) => s.equalsIgnoreCase("OFFSET")
      case _           => false
    }
    val skip = if (isKw("SKIP") || isOffset) {
      if (!extensions)
        notSupported("SKIP/OFFSET (supported with extensions enabled)")
      p += 1
      Some(countLit("SKIP"))
    } else None
    val limit = if (tryKw("LIMIT")) Some(countLit("LIMIT")) else None
    val where = if (isWith && tryKw("WHERE")) Some(parseExpr()) else None
    val its = items.result()
    val seen = scala.collection.mutable.Set[String]()
    its.foreach { it =>
      it.alias.orElse(inferAlias(it.expr)).foreach { a =>
        if (!seen.add(a))
          throw new CypherNotSupportedException(s"duplicate alias '$a' in projection")
      }
    }
    Projection(its, distinct, orderBy, limit, where, skip, star)
  }

  /** Alias inference for bare `p.Name` / bare variable refs
   *  (reference: CypherVisitor.cs:1307-1320). */
  def inferAlias(e: Expr): Option[String] = e match {
    case Ref(a, None) => Some(a)
    case Ref(_, Some(prop)) => Some(prop)
    case _ => None
  }

  private def parseRetItem(): RetItem = {
    val e = parseExpr()
    val alias = if (tryKw("AS")) Some(ident()) else None
    RetItem(e, alias)
  }

  // ----- expressions ---------------------------------------------------

  // recursion-depth guard: the recursive-descent chain would otherwise
  // turn a pathologically nested expression into a StackOverflowError
  // instead of a typed syntax error
  private var exprDepth = 0
  private val MaxExprDepth = 200

  def parseExpr(): Expr = {
    exprDepth += 1
    if (exprDepth > MaxExprDepth)
      syntaxErr(s"expression nested deeper than $MaxExprDepth levels")
    try parseOr() finally exprDepth -= 1
  }

  private def parseOr(): Expr = {
    var l = parseXor()
    while (tryKw("OR")) l = Bin(BinOp.Or, l, parseXor())
    l
  }
  private def parseXor(): Expr = {
    var l = parseAnd()
    while (tryKw("XOR")) l = Bin(BinOp.Xor, l, parseAnd())
    l
  }
  private def parseAnd(): Expr = {
    var l = parseNot()
    while (tryKw("AND")) l = Bin(BinOp.And, l, parseNot())
    l
  }
  private def parseNot(): Expr =
    if (tryKw("NOT")) Not(parseNot()) else parseComparison()

  private def parseComparison(): Expr = {
    var l = parseAddSub()
    var go = true
    while (go) {
      val op = cur match {
        case Punct("=", _)  => Some(BinOp.Eq)
        case Punct("<>", _) => Some(BinOp.Neq)
        case Punct("!=", _) =>
          // Neo4j spelling — extension only (the reference grammar
          // carries '<>' alone)
          if (!extensions) notSupported(
            "'!=' (use '<>'; '!=' is supported with extensions enabled)")
          Some(BinOp.Neq)
        case Punct("<", _)  => Some(BinOp.Lt)
        case Punct("<=", _) => Some(BinOp.Le)
        case Punct(">", _)  => Some(BinOp.Gt)
        case Punct(">=", _) => Some(BinOp.Ge)
        case _ => None
      }
      op match {
        case Some(o) => p += 1; l = Bin(o, l, parseAddSub())
        case None => go = false
      }
    }
    l
  }

  private def parseAddSub(): Expr = {
    // `a || b` (round 13; Cypher 5 / GQL concatenation): two ADJACENT
    // '|' tokens — a single '|' stays the comprehension / alternation
    // separator of the enclosing construct
    def isConcat: Boolean = (cur, peek1) match {
      case (Punct("|", p0), Punct("|", p1)) => p1 == p0 + 1
      case _ => false
    }
    var l = parseMulDiv()
    var go = true
    while (go) {
      if (tryPunct("+")) l = Bin(BinOp.Add, l, parseMulDiv())
      else if (tryPunct("-")) l = Bin(BinOp.Sub, l, parseMulDiv())
      else if (isConcat) {
        if (!extensions)
          notSupported("|| concatenation " +
            "(supported with extensions enabled)")
        p += 2
        l = Func("__pipeconcat", Seq(l, parseMulDiv()))
      }
      else go = false
    }
    l
  }
  private def parseMulDiv(): Expr = {
    var l = parsePower()
    var go = true
    while (go) {
      if (tryPunct("*")) l = Bin(BinOp.Mul, l, parsePower())
      else if (tryPunct("/")) l = Bin(BinOp.Div, l, parsePower())
      else if (tryPunct("%")) l = Bin(BinOp.Mod, l, parsePower())
      else go = false
    }
    l
  }
  private def parsePower(): Expr = {
    val l = parseUnary()
    if (tryPunct("^")) Bin(BinOp.Pow, l, parsePower())  // right-assoc
    else l
  }
  private def parseUnary(): Expr =
    if (tryPunct("-")) Neg(parseUnary())
    else if (tryPunct("+")) parseUnary()
    else parsePostfix()

  /** String/list/null postfix operators (reference:
   *  CypherVisitor.cs:1584-1619). */
  private def parsePostfix(): Expr = {
    var e = parseAtom()
    var go = true
    while (go) {
      if (tryKw("IN")) e = Bin(BinOp.In, e, parseAtom())
      else if (isKw("STARTS")) { p += 1; eatKw("WITH")
        e = Func("startswith", Seq(e, parseAddSub())) }
      else if (isKw("ENDS")) { p += 1; eatKw("WITH")
        e = Func("endswith", Seq(e, parseAddSub())) }
      else if (tryKw("CONTAINS")) e = Func("contains", Seq(e, parseAddSub()))
      else if (tryPunct("=~")) e = Bin(BinOp.Regex, e, parseAddSub())
      else if (isKw("IS")) {
        p += 1
        val not = tryKw("NOT")
        // `IS [NOT] :: TYPE` (round 13; Cypher 5 / GQL type predicate)
        val dcolon = (cur, peek1) match {
          case (Punct(":", p0), Punct(":", p1)) => p1 == p0 + 1
          case _ => false
        }
        if (dcolon) {
          if (!extensions)
            notSupported("IS :: type predicate " +
              "(supported with extensions enabled)")
          p += 2
          val tn = name().toUpperCase(java.util.Locale.ROOT)
          if (!Parser.TypeNames(tn))
            syntaxErr(s"unknown type '$tn' in IS :: (supported: " +
              Parser.TypeNames.toSeq.sorted.mkString(", ") + ")")
          e = TypeIs(e, not, tn)
        } else if (cur match {
            case Ident(s, _) => s.equalsIgnoreCase("NORMALIZED")
            case _ => false }) {
          // `IS [NOT] NORMALIZED [form]` (round 14; Cypher 5.17's
          // normalize() companion): true iff the string equals its
          // unicode normalization — null in, null out (3-valued,
          // like Neo4j). Desugars to x = normalize(x[, form]),
          // negated via <>.
          if (!extensions)
            notSupported("IS NORMALIZED " +
              "(supported with extensions enabled)")
          p += 1
          val form: Seq[Expr] = cur match {
            case Ident(s, _) if Set("NFC", "NFD", "NFKC", "NFKD")(
                s.toUpperCase(java.util.Locale.ROOT)) =>
              p += 1; Seq(Lit(s.toUpperCase(java.util.Locale.ROOT)))
            case _ => Seq.empty
          }
          e = Bin(if (not) BinOp.Neq else BinOp.Eq, e,
            Func("normalize", e +: form))
        } else {
          eatKw("NULL")
          e = IsNull(e, not)
        }
      }
      else if (isPunct(".") && (peek1 match {
        case Ident(_, _) | Kw(_, _, _) => true; case _ => false })) {
        // generic dot access `expr.key` (round 13, extension): nested
        // map fields, temporal components on computed values,
        // `properties(n).name`, `xs[0].f` — dispatch is static at
        // compile time on the operand's inferred type. The reference
        // rejects all nested lookups (CypherVisitor.cs:2040-2044).
        if (!extensions)
          notSupported("nested property lookup a.b.c")
        p += 1
        e = DotAccess(e, name())
      }
      else if (isPunct("[")) {
        if (!extensions)
          notSupported("list index / slice access " +
            "(supported with extensions enabled)")
        p += 1
        // xs[..b] — open start
        if (tryPunct("..")) {
          val to = if (isPunct("]")) None else Some(parseExpr())
          eatPunct("]")
          e = ListIndex(e, None, to, isSlice = true)
        } else {
          val from = parseExpr()
          if (tryPunct("..")) {
            val to = if (isPunct("]")) None else Some(parseExpr())
            eatPunct("]")
            e = ListIndex(e, Some(from), to, isSlice = true)
          } else {
            eatPunct("]")
            e = ListIndex(e, Some(from), None, isSlice = false)
          }
        }
      }
      else go = false
    }
    e
  }

  /** `$param` value → typed literal at parse time. A Seq becomes a list
   *  literal (usable with IN); Float widens to Double (Cypher floats are
   *  64-bit). Everything else flows through [[ast.Lit]] as-is and is
   *  typed by [[TypeInference]]/`lit`. */
  private def paramLit(v: Any): Expr = v match {
    case s: Seq[_]  => ListLit(s.map(paramLit))
    case f: Float   => Lit(f.toDouble)
    case other      => Lit(other)
  }

  private val aggNames = Set("avg", "sum", "count", "max", "min", "first",
    "last", "percentilecont", "percentiledisc", "stdev", "stdevp")

  private def parseAtom(): Expr = cur match {
    case NumLit(s, isFloat, _) =>
      if (isFloat) {
        val d = try s.toDouble
          catch { case _: NumberFormatException =>
            syntaxErr(s"malformed numeric literal: $s") }
        p += 1; Lit(d)
      }
      else {
        // validate before advancing so syntaxErr points at the literal
        val v = try s.toLong
          catch { case _: NumberFormatException =>
            syntaxErr(s"integer literal out of 64-bit range: $s") }
        p += 1
        if (v >= Int.MinValue && v <= Int.MaxValue) Lit(v.toInt) else Lit(v)
      }
    case StrLit(s, _) => p += 1; Lit(s)
    case Kw("TRUE", _, _)  => p += 1; Lit(true)
    case Kw("FALSE", _, _) => p += 1; Lit(false)
    case Kw("NULL", _, _)  => p += 1; Lit(null)
    case Kw("CASE", _, _)  => p += 1; parseCase()
    case Kw("NOT", _, _)   => p += 1; Not(parseNot())
    case Kw(k, _, _) if Set("ANY", "ALL", "NONE", "SINGLE")(k) && extensions &&
        (peek1 match { case Punct("(", _) => true; case _ => false }) =>
      p += 2 // kw + '('
      parseQuantifier(k.toLowerCase(java.util.Locale.ROOT))
    case Kw("EXISTS", _, _) if extensions &&
        (peek1 match {
          case Punct("(", _) | Punct("{", _) => true; case _ => false }) =>
      peek1 match {
        case Punct("{", _) =>
          // subquery form: EXISTS { [MATCH] pat[, pat…] [WHERE pred] }
          p += 2 // EXISTS + '{'
          tryKw("MATCH")
          val m0 = pcMark()
          val pats = Vector.newBuilder[PatternPart]
          pats += parsePatternPart()
          while (tryPunct(",")) pats += parsePatternPart()
          val mapConj = pcDrain(m0)
          val w = if (tryKw("WHERE")) Some(parseExpr()) else None
          eatPunct("}")
          ExistsPat(pats.result(), andAll(w, mapConj))
        case _ =>
          p += 2 // EXISTS + '('
          // `EXISTS((…)…)` opens a node pattern → pattern predicate;
          // `EXISTS(expr)` is openCypher's property test → IS NOT NULL
          if (isPunct("(")) {
            val m0 = pcMark()
            val part = parsePatternPart()
            eatPunct(")")
            ExistsPat(Seq(part), andAll(None, pcDrain(m0)))
          } else {
            val e = parseExpr()
            eatPunct(")")
            IsNull(e, not = true)
          }
      }
    case Kw(k, _, _) if Set("FILTER", "EXTRACT", "ANY", "NONE", "SINGLE",
        "EXISTS")(k) =>
      notSupported(s"$k(...) predicate/comprehension" +
        (if (Set("ANY", "NONE", "SINGLE", "EXISTS")(k))
           " (supported with extensions enabled)" else ""))
    case Punct("(", _) =>
      // bare pattern predicate `(a)-[:R]->(b)` in a boolean position
      // (round 13; Neo4j's EXISTS-less existential idiom, extension):
      // backtracking attempt — a parenthesized pattern with ≥ 1 rel
      // desugars to the EXISTS machinery; anything else (including a
      // plain `(expr)`) rolls back to the ordinary grouped expression
      if (extensions) {
        val save = p
        val m0 = pcMark()
        val pmSave = pmN
        def rollback(): None.type = { p = save; pcDrain(m0); pmN = pmSave; None }
        val attempt: Option[Expr] =
          try {
            val part = parsePatternPart()
            if (part.rels.isEmpty) rollback()
            else Some(ExistsPat(Seq(part), andAll(None, pcDrain(m0))))
          } catch { case _: CypherException => rollback() }
        attempt match {
          case Some(e) => return e
          case None =>
        }
      }
      p += 1
      val e = parseExpr()
      eatPunct(")")
      e
    case Punct("[", _) =>
      p += 1
      // `[v IN …]` is a list comprehension, not a literal (openCypher
      // resolves the ambiguity the same way)
      (cur, peek1) match {
        case (Ident(_, _), Kw("IN", _, _)) =>
          if (!extensions)
            notSupported("list comprehension [x IN …] " +
              "(supported with extensions enabled)")
          val v = ident()
          eatKw("IN")
          val listE = parseExpr()
          val whereE = if (tryKw("WHERE")) Some(parseExpr()) else None
          val projE = if (tryPunct("|")) Some(parseExpr()) else None
          eatPunct("]")
          return ListComp(v, listE, whereE, projE)
        case _ =>
      }
      // `[(a)-[:R]->(b) … | proj]` is a pattern comprehension; `[(` can
      // also open a parenthesized first list element, so attempt the
      // pattern parse and backtrack unless it yields ≥1 relationship
      if (extensions && isPunct("(")) {
        val save = p
        val m0 = pcMark()
        // backtracking must also roll back any property-map conjuncts
        // (and synthesized aliases) the failed attempt buffered
        val pmSave = pmN
        def rollback(): None.type = { p = save; pcDrain(m0); pmN = pmSave; None }
        val attempt: Option[PatternComp] =
          try {
            val part = parsePatternPart()
            if (part.rels.isEmpty) rollback()
            else {
              val mapConj = pcDrain(m0)
              val w = if (tryKw("WHERE")) Some(parseExpr()) else None
              eatPunct("|")
              val pe = parseExpr()
              eatPunct("]")
              Some(PatternComp(Seq(part), andAll(w, mapConj), pe))
            }
          } catch { case _: CypherException => rollback() }
        attempt match {
          case Some(pc) => return pc
          case None =>
        }
      }
      val items = Vector.newBuilder[Expr]
      if (!isPunct("]")) {
        items += parseExpr()
        while (tryPunct(",")) {
          if (isPunct("..")) notSupported("range literal")
          items += parseExpr()
        }
      }
      if (isPunct("..")) notSupported("range literal")
      eatPunct("]")
      ListLit(items.result())
    case Punct("{", _) if extensions =>
      p += 1
      val fields = Vector.newBuilder[(String, Expr)]
      def one(): Unit = {
        val k = cur match {
          case Ident(s, _)  => p += 1; s
          case StrLit(s, _) => p += 1; s
          case Kw(s, _, _)  => p += 1; s.toLowerCase(java.util.Locale.ROOT)
          case _ => syntaxErr("expected a map key")
        }
        eatPunct(":")
        fields += (k -> parseExpr())
      }
      if (!isPunct("}")) { one(); while (tryPunct(",")) one() }
      eatPunct("}")
      val fs = fields.result()
      if (fs.isEmpty) syntaxErr("empty map literal")
      val dup = fs.groupBy(_._1).collectFirst { case (k, vs) if vs.size > 1 => k }
      dup.foreach(k => syntaxErr(s"duplicate map key '$k'"))
      MapLit(fs)
    case Punct("{", _) =>
      notSupported("map literal (supported with extensions enabled)")
    case Param(pname, _) =>
      if (!extensions)
        notSupported("query parameters $param " +
          "(supported with extensions enabled)")
      p += 1
      params.get(pname) match {
        case Some(v) => paramLit(v)
        case None => throw new CypherBindingException(
          s"unknown query parameter $$$pname — bind it in the params map")
      }
    case Ident(id, _) =>
      peek1 match {
        // COUNT { [MATCH] pattern [WHERE pred] } — Cypher 5 COUNT
        // subquery (extension), desugared to size() of a 1-per-match
        // pattern comprehension: the comprehension machinery already
        // implements the per-binding correlated counting (zero matches
        // → empty list → 0), so COUNT{} adds surface, not a new plan
        case Punct("{", _)
            if id.toLowerCase(java.util.Locale.ROOT) == "count" =>
          if (!extensions)
            notSupported("COUNT { pattern } (supported with extensions enabled)")
          p += 2 // count + '{'
          tryKw("MATCH")
          val m0 = pcMark()
          // comma-separated pattern parts (round 13): one conjunction
          // over shared bindings, exactly a multi-pattern MATCH
          val partsB = Vector.newBuilder[PatternPart]
          partsB += parsePatternPart()
          while (tryPunct(",")) partsB += parsePatternPart()
          val mapConj = pcDrain(m0)
          val w = if (tryKw("WHERE")) Some(parseExpr()) else None
          eatPunct("}")
          Func("size",
            Seq(PatternComp(partsB.result(), andAll(w, mapConj), Lit(1L))))
        // COLLECT { [MATCH] pattern [WHERE pred] RETURN expr } —
        // Cypher 5's COLLECT subquery (round 12, extension): one list
        // per outer row, desugared onto the pattern-comprehension
        // machinery (the COUNT{} shape with a caller projection);
        // single pattern part, single RETURN item, no ORDER BY/LIMIT
        // (per-row ordering has no flat lowering)
        case Punct("{", _)
            if id.toLowerCase(java.util.Locale.ROOT) == "collect" =>
          if (!extensions)
            notSupported(
              "COLLECT { subquery } (supported with extensions enabled)")
          p += 2 // collect + '{'
          tryKw("MATCH")
          val m0 = pcMark()
          // comma-separated pattern parts (round 13), like COUNT{}
          val partsB = Vector.newBuilder[PatternPart]
          partsB += parsePatternPart()
          while (tryPunct(",")) partsB += parsePatternPart()
          val part = partsB.result()
          val mapConj = pcDrain(m0)
          val w = if (tryKw("WHERE")) Some(parseExpr()) else None
          eatKw("RETURN")
          // round 13: DISTINCT / ORDER BY / SKIP / LIMIT lift — the
          // full Neo4j COLLECT subquery tail, lowered onto a per-key
          // window rank filter before the collect
          val dist = tryKw("DISTINCT")
          val proj = parseExpr()
          if (isPunct(","))
            notSupported("multiple RETURN items inside COLLECT { } " +
              "(one expression per list)")
          val ordering = if (isKw("ORDER")) {
            p += 1; eatKw("BY")
            val ss = Vector.newBuilder[SortItem]
            def one2(): SortItem = {
              val e = parseExpr()
              val desc = if (tryKw("DESC") || tryKw("DESCENDING")) true
                else { tryKw("ASC"); tryKw("ASCENDING"); false }
              SortItem(e, desc)
            }
            ss += one2()
            while (tryPunct(",")) ss += one2()
            ss.result()
          } else Vector.empty
          def countLit2(what: String): Long = cur match {
            case NumLit(s2, false, _) =>
              val v = try s2.toLong
                catch { case _: NumberFormatException =>
                  syntaxErr(s"$what literal out of range: $s2") }
              if (v < 0 || v > Int.MaxValue)
                syntaxErr(s"$what must be in [0, ${Int.MaxValue}], got $s2")
              p += 1
              v
            case _ => syntaxErr(s"$what expects an integer literal")
          }
          val skipN =
            if (tryKw("SKIP")) Some(countLit2("SKIP")) else None
          val limitN =
            if (tryKw("LIMIT")) Some(countLit2("LIMIT")) else None
          if ((skipN.nonEmpty || limitN.nonEmpty) && ordering.isEmpty)
            notSupported("SKIP/LIMIT inside COLLECT { } without ORDER " +
              "BY — an unordered capped list is nondeterministic")
          if (dist && ordering.exists(_.expr != proj))
            notSupported("ORDER BY inside COLLECT { DISTINCT } must " +
              "order by the RETURN expression itself (the list is " +
              "deduplicated on that value before ordering)")
          eatPunct("}")
          PatternComp(part, andAll(w, mapConj), proj, ordering, dist,
            skipN, limitN)
        // map projection `n {.prop, key: expr, var, .*}` (round 13;
        // Neo4j's everyday RETURN idiom, extension — the reference has
        // no map support at all, CypherVisitor.cs:2040-2044)
        case Punct("{", _) =>
          if (!extensions)
            notSupported("map projection n { ... } " +
              "(supported with extensions enabled)")
          p += 2 // ident + '{'
          val items = Vector.newBuilder[(String, Expr)]
          var star = false
          def one(): Unit = {
            if (tryPunct(".")) {
              if (tryPunct("*")) star = true
              else { val pr = name(); items += (pr -> Ref(id, Some(pr))) }
            } else {
              val bareSelector = cur match {
                case Ident(_, _) => peek1 match {
                  case Punct(":", _) => false
                  case _ => true
                }
                case _ => false
              }
              if (bareSelector) {
                // variable selector `v` ≡ `v: v`
                val v = ident()
                items += (v -> Ref(v, None))
              } else {
                val k = cur match {
                  case Ident(s, _)  => p += 1; s
                  case StrLit(s, _) => p += 1; s
                  case Kw(s, _, _)  =>
                    p += 1; s.toLowerCase(java.util.Locale.ROOT)
                  case _ => syntaxErr(
                    "expected a map projection item (.prop, key: " +
                    "expr, variable, or .*)")
                }
                eatPunct(":")
                items += (k -> parseExpr())
              }
            }
          }
          if (!isPunct("}")) { one(); while (tryPunct(",")) one() }
          eatPunct("}")
          val fs = items.result()
          val dup = fs.groupBy(_._1)
            .collectFirst { case (k, vs) if vs.size > 1 => k }
          dup.foreach(k => syntaxErr(s"duplicate map projection key '$k'"))
          if (fs.isEmpty && !star)
            syntaxErr(s"empty map projection '$id { }'")
          MapProjection(id, fs, star)
        case Punct("(", _) => parseCall(id)
        // label predicate `n:Label[:Label2]` as a boolean expression
        // (round 13; Neo4j's everyday WHERE idiom, extension)
        case Punct(":", _) =>
          if (!extensions)
            notSupported("label predicate n:Label in an expression " +
              "(supported with extensions enabled)")
          p += 1 // the ident
          val ls = Vector.newBuilder[String]
          while (tryPunct(":")) ls += name()
          val labels = ls.result()
          if (labels.isEmpty)
            syntaxErr("expected a label after ':'")
          HasLabel(id, labels)
        case Punct(".", _) =>
          p += 2
          val prop = name()
          // namespaced functions `date.truncate(…)` / `duration.…` and
          // (round 14) TWO-segment namespaces `vector.similarity.…` —
          // a second `.seg(` is consumed only when the full qualified
          // name is registered, otherwise the dots stay field access
          val qn0 = id.toLowerCase(java.util.Locale.ROOT) + "." +
            prop.toLowerCase(java.util.Locale.ROOT)
          val qnOpt: Option[String] =
            if (isPunct("(")) Some(qn0)
            else if (isPunct(".")) {
              val save = p
              p += 1
              val seg = cur match {
                case Ident(nm, _) => p += 1; Some(nm)
                case _            => None
              }
              if (seg.isDefined && isPunct("(")) {
                val q2 = qn0 + "." +
                  seg.get.toLowerCase(java.util.Locale.ROOT)
                if (Parser.NamespacedFns(q2)) Some(q2)
                else { p = save; None }
              } else { p = save; None }
            } else None
          qnOpt match {
            case Some(qn) =>
              if (!Parser.NamespacedFns(qn))
                notSupported(s"function $qn(...) (supported: " +
                  Parser.NamespacedFns.toSeq.sorted.mkString(", ") + ")")
              if (!extensions)
                notSupported(
                  s"$qn(...) (supported with extensions enabled)")
              p += 1 // '('
              val args = Vector.newBuilder[Expr]
              if (!isPunct(")")) {
                args += parseExpr()
                while (tryPunct(",")) args += parseExpr()
              }
              eatPunct(")")
              Func(qn, args.result())
            case None => Ref(id, Some(prop))
          }
          // deeper `.comp` chains (temporal components, nested map
          // fields) are generic postfix dot access now — parsePostfix
        case _ => p += 1; Ref(id, None)
      }
    // callable forms of infix keywords: contains(x, y), not(x) —
    // the reference registers them as ordinary functions (Function.cs)
    case Kw(k, raw, _) if (k == "CONTAINS" || k == "NOT") &&
        (peek1 match { case Punct("(", _) => true; case _ => false }) =>
      parseCall(raw)
    case t => syntaxErr(s"Unexpected token $t in expression")
  }

  /** `kind(v IN list WHERE pred)` — openCypher requires the WHERE. */
  private def parseQuantifier(kind: String): Expr = {
    val v = ident()
    eatKw("IN")
    val listE = parseExpr()
    eatKw("WHERE")
    val predE = parseExpr()
    eatPunct(")")
    QuantPred(kind, v, listE, predE)
  }

  private def parseCall(name: String): Expr = {
    p += 2 // ident + '('
    val lname = name.toLowerCase(java.util.Locale.ROOT)
    if (lname == "reduce") {
      // reduce(acc = init, v IN list | step) — comprehension-style
      // argument list, not ordinary positional args
      if (!extensions)
        notSupported("reduce(...) (supported with extensions enabled)")
      val acc = ident()
      eatPunct("=")
      val init = parseExpr()
      eatPunct(",")
      val v = ident()
      eatKw("IN")
      val listE = parseExpr()
      eatPunct("|")
      val step = parseExpr()
      eatPunct(")")
      return ReduceExpr(acc, init, v, listE, step)
    }
    if (isPunct("*")) {
      if (lname == "count") {
        // count(*) — extension (the reference rejects it,
        // CypherVisitor.cs aggregation argument handling): arg-less
        // Agg, compiled as count(1) over the group
        if (!extensions)
          notSupported("COUNT(*) (supported with extensions enabled)")
        p += 1
        eatPunct(")")
        return Agg("count", distinct = false, arg = None)
      }
      else syntaxErr("Unexpected *")
    }
    // Cypher 5 trim specifier (round 13, extension):
    // trim([BOTH|LEADING|TRAILING] [ch] FROM input) — backtracks to
    // the plain-argument parse when no FROM materializes (so a column
    // named `both` still works)
    if (lname == "trim" && extensions) {
      val save = p
      val spec = cur match {
        case Ident(s, _) if Set("both", "leading", "trailing")(
            s.toLowerCase(java.util.Locale.ROOT)) =>
          p += 1; s.toLowerCase(java.util.Locale.ROOT)
        case _ => "both"
      }
      def isFrom = cur match {
        case Ident(s, _) => s.equalsIgnoreCase("FROM"); case _ => false
      }
      val attempt: Option[Expr] =
        try {
          val ch = if (isFrom) None else Some(parseExpr())
          if (isFrom) {
            p += 1
            val input = parseExpr()
            eatPunct(")")
            Some(Func(s"__trim_$spec", ch.toSeq :+ input))
          } else None
        } catch { case _: CypherException => None }
      attempt match {
        case Some(e) => return e
        case None => p = save
      }
    }
    val distinct = tryKw("DISTINCT")
    val args = Vector.newBuilder[Expr]
    if (!isPunct(")")) {
      args += parseExpr()
      while (tryPunct(",")) args += parseExpr()
    }
    eatPunct(")")
    val as = args.result()
    if (lname == "collect") {
      // extension (reference roadmap README.md:57): list aggregate
      if (!extensions)
        notSupported("collect() aggregate (supported with extensions enabled)")
      if (as.size != 1)
        syntaxErr("collect expects exactly one argument")
      checkNoNestedAgg(as.head, name)
      return Agg("collect", distinct, Some(as.head))
    }
    if (aggNames(lname)) {
      // reference parity: DISTINCT composes only with count()
      // (SQLRenderer emits COUNT(DISTINCT …) alone); the extended
      // surface adds the SQL-standard set — sum/avg/stdev dedup the
      // value per group first, min/max are no-ops over a set
      if (distinct && lname != "count") {
        if (!extensions)
          notSupported("DISTINCT inside aggregate is only allowed for " +
            "count() (DISTINCT sum/avg/min/max/stdev/stdevp supported " +
            "with extensions enabled)")
        if (!Set("sum", "avg", "min", "max", "stdev", "stdevp")(lname))
          notSupported(s"DISTINCT inside $name() — supported for " +
            "count, sum, avg, min, max, stdev, stdevp and collect")
      }
      lname match {
        case "percentilecont" | "percentiledisc" =>
          if (as.size != 2)
            syntaxErr(s"$name expects (expression, percentile)")
          val pct = as(1) match {
            case Lit(d: Double) => d
            case Lit(i: Int)    => i.toDouble
            case Lit(l: Long)   => l.toDouble
            case _ => syntaxErr(s"$name percentile must be a numeric literal")
          }
          if (pct < 0.0 || pct > 1.0)
            syntaxErr(s"$name percentile must be in [0, 1], got $pct")
          checkNoNestedAgg(as.head, name)
          Agg(lname, distinct, Some(as.head), Some(pct))
        case _ =>
          if (as.size != 1)
            notSupported(s"aggregation $name with ${as.size} arguments")
          checkNoNestedAgg(as.head, name)
          Agg(lname, distinct, Some(as.head))
      }
    } else {
      if (distinct) syntaxErr("DISTINCT only valid inside aggregates")
      Func(lname, as)
    }
  }

  private def checkNoNestedAgg(e: Expr, outer: String): Unit = e match {
    case Agg(n, _, _, _) =>
      notSupported(s"nested aggregate $n inside $outer")
    case Bin(_, l, r) => checkNoNestedAgg(l, outer); checkNoNestedAgg(r, outer)
    case Not(x) => checkNoNestedAgg(x, outer)
    case Neg(x) => checkNoNestedAgg(x, outer)
    case IsNull(x, _) => checkNoNestedAgg(x, outer)
    case Func(_, args) => args.foreach(checkNoNestedAgg(_, outer))
    case ListLit(items) => items.foreach(checkNoNestedAgg(_, outer))
    case DotAccess(x, _) => checkNoNestedAgg(x, outer)
    case MapLit(fs) => fs.foreach(f => checkNoNestedAgg(f._2, outer))
    case MapProjection(_, fs, _) =>
      fs.foreach(f => checkNoNestedAgg(f._2, outer))
    case TypeIs(x, _, _) => checkNoNestedAgg(x, outer)
    case CaseExpr(ws, o) =>
      ws.foreach { case (c, v) =>
        checkNoNestedAgg(c, outer); checkNoNestedAgg(v, outer) }
      o.foreach(checkNoNestedAgg(_, outer))
    case ListComp(_, l, w, m) =>
      checkNoNestedAgg(l, outer)
      w.foreach(checkNoNestedAgg(_, outer))
      m.foreach(checkNoNestedAgg(_, outer))
    case QuantPred(_, _, l, pr) =>
      checkNoNestedAgg(l, outer); checkNoNestedAgg(pr, outer)
    case ReduceExpr(_, i, _, l, s) =>
      checkNoNestedAgg(i, outer); checkNoNestedAgg(l, outer)
      checkNoNestedAgg(s, outer)
    case ListIndex(l, f, t, _) =>
      checkNoNestedAgg(l, outer)
      f.foreach(checkNoNestedAgg(_, outer))
      t.foreach(checkNoNestedAgg(_, outer))
    case _ =>
  }

  /** Searched CASE (reference rejects `CASE <expr> WHEN`,
   *  CypherVisitor.cs:1776-1781; parity keeps that rejection). With
   *  extensions enabled, the simple form `CASE x WHEN v THEN …`
   *  desugars to the searched form over `x = v` comparisons — Cypher's
   *  simple CASE is equality-matched, so a null operand matches no
   *  branch and falls to ELSE/null, exactly what the desugar yields. */
  private def parseCase(): Expr = {
    val operand: Option[Expr] =
      if (isKw("WHEN")) None
      else if (!extensions)
        notSupported("CASE <expr> WHEN — only searched CASE is supported" +
          " (simple form supported with extensions enabled)")
      else Some(parseExpr())
    // extended simple CASE (round 13; Cypher 5): a WHEN alternative
    // may be a bare value (equality), a comparison applied to the
    // operand (`WHEN > 3`, `WHEN <> 'x'`), a null test (`WHEN IS
    // [NOT] NULL`), a string predicate (`WHEN STARTS/ENDS WITH …`,
    // `WHEN CONTAINS …`, `WHEN =~ …`) or a membership (`WHEN IN …`);
    // comma-separated alternatives OR-join
    def whenAlt(x: Expr): Expr = cur match {
      case Punct(op @ ("=" | "<>" | "!=" | "<" | "<=" | ">" | ">="), _) =>
        p += 1
        val bop = op match {
          case "=" => BinOp.Eq; case "<>" | "!=" => BinOp.Neq
          case "<" => BinOp.Lt; case "<=" => BinOp.Le
          case ">" => BinOp.Gt; case _    => BinOp.Ge
        }
        Bin(bop, x, parseAddSub())
      case Punct("=~", _) => p += 1; Bin(BinOp.Regex, x, parseAddSub())
      case Kw("IS", _, _) =>
        p += 1; val not = tryKw("NOT"); eatKw("NULL"); IsNull(x, not)
      case Kw("STARTS", _, _) =>
        p += 1; eatKw("WITH"); Func("startswith", Seq(x, parseAddSub()))
      case Kw("ENDS", _, _) =>
        p += 1; eatKw("WITH"); Func("endswith", Seq(x, parseAddSub()))
      case Kw("CONTAINS", _, _) =>
        p += 1; Func("contains", Seq(x, parseAddSub()))
      case Kw("IN", _, _) => p += 1; Bin(BinOp.In, x, parseAddSub())
      // bare-value alternative: a FULL expression (Neo4j's fallback
      // grammar — `WHEN a OR b THEN` compares x against (a OR b));
      // THEN/comma terminate it naturally (keywords and ',' are not
      // expression continuations)
      case _ => Bin(BinOp.Eq, x, parseExpr())
    }
    val whens = Vector.newBuilder[(Expr, Expr)]
    while (tryKw("WHEN")) {
      val cond = operand match {
        case Some(x) =>
          val vs = Vector.newBuilder[Expr]
          vs += whenAlt(x)
          while (tryPunct(",")) vs += whenAlt(x)
          vs.result().reduce(Bin(BinOp.Or, _, _))
        case None => parseExpr()
      }
      eatKw("THEN")
      whens += ((cond, parseExpr()))
    }
    val e = if (tryKw("ELSE")) Some(parseExpr()) else None
    eatKw("END")
    CaseExpr(whens.result(), e)
  }
}

object Parser {
  /** Unrolling cap for `[*lo..hi]` — keeps the UNION ALL fan-out and the
   *  longest join chain bounded (8 hops = 8 joins per branch). */
  val MaxVarHops = 8

  /** Sentinel `hi` marking an unbounded variable-length `[*]`/`[*1..]` —
   *  lowered by [[Compiler]] to reachable-pair semantics via an
   *  iterate-to-fixpoint BFS (never unrolled). */
  val Unbounded: Int = Int.MaxValue

  /** Component names legal after a property in `x.prop.<component>`
   *  (temporal accessors, extension) — lowered to the matching
   *  function; dayofweek is ISO (1 = Monday). */
  /** Schema procedures (round 13, extension): lowercase name →
   *  canonical yield columns, in declared order. Each is a
   *  compile-time literal frame over the graph schema (see the
   *  compiler's ProcRows expansion). */
  val Procedures: Map[String, Seq[String]] = Map(
    "db.labels" -> Seq("label"),
    "db.relationshiptypes" -> Seq("relationshipType"),
    "db.propertykeys" -> Seq("propertyKey"),
    "db.schema.nodetypeproperties" ->
      Seq("nodeType", "propertyName", "propertyTypes", "mandatory"),
    "db.schema.reltypeproperties" ->
      Seq("relType", "propertyName", "propertyTypes", "mandatory"))

  val TemporalComponents: Set[String] = Set(
    "year", "quarter", "month", "week", "day", "dayofweek",
    "hour", "minute", "second",
    // epoch accessors (round 12; Neo4j datetime.epochMillis/
    // epochSeconds) — BIGINT, unlike the INT calendar components
    "epochmillis", "epochseconds")

  /** Component accessors legal on a time-of-day value (round 13;
   *  time()/localtime() lower to day-time intervals). */
  val TimeComponents: Set[String] = Set(
    "hour", "minute", "second", "millisecond")

  /** Type names legal in `IS [NOT] :: TYPE` (round 13). */
  val TypeNames: Set[String] = Set(
    "INTEGER", "FLOAT", "STRING", "BOOLEAN", "DATE", "DATETIME",
    "LOCALDATETIME", "TIMESTAMP", "DURATION", "TIME", "LOCALTIME",
    "LIST", "MAP", "ANY")

  /** Namespaced temporal functions (round 12, extensions):
   *  `date.truncate(unit, d)`, `datetime.truncate(unit, ts)`,
   *  `duration.between(a, b)` — parsed as qualified calls, compiled
   *  by the matching Func name. */
  val NamespacedFns: Set[String] = Set(
    "date.truncate", "datetime.truncate", "duration.between",
    "duration.inseconds", "duration.indays", "duration.inmonths",
    // round 14: Neo4j 5 GenAI vector similarity (two-segment)
    "vector.similarity.cosine", "vector.similarity.euclidean")

  def parse(query: String): Query =
    new Parser(Lexer.tokenize(query)).parseQuery()

  def parse(query: String, extensions: Boolean,
            params: Map[String, Any]): Query =
    new Parser(Lexer.tokenize(query), extensions, params).parseQuery()
}
