package graft.cypher

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: the front-end must reject garbage with a typed
  * exception — never an NPE, StackOverflow, or infinite loop. */
class ParserRobustnessSpec extends AnyFunSuite {

  /** Deterministic generator sampling (scalatestplus bridge not on the
    * offline classpath — drive scalacheck's Gen directly). */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private def attempt(q: String): Unit =
    try { Parser.parse(q); () }
    catch { case _: CypherException => () } // typed rejection is fine

  test("arbitrary strings never escape the typed exception hierarchy") {
    samples(Gen.asciiPrintableStr, 300).foreach(attempt)
    val tokenSoup = Gen.listOf(Gen.oneOf(
      "MATCH", "(", ")", "-", "[", "]", "->", "WHERE", "RETURN", "WITH",
      "a", ":A", "'x'", "1", ",", ".", "=", "AND")).map(_.mkString(" "))
    samples(tokenSoup, 300).foreach(attempt)
  }

  test("malformed path/shortestPath syntax stays inside typed errors") {
    def attemptExt(q: String): Unit =
      try { Parser.parse(q, extensions = true, Map.empty); () }
      catch { case _: CypherException => () }
    val bad = Seq(
      "MATCH p = RETURN 1 AS x",
      "MATCH p = q = (a:A) RETURN 1 AS x",
      "MATCH p = shortestPath( RETURN 1 AS x",
      "MATCH p = shortestPath() RETURN 1 AS x",
      "MATCH p = shortestPath((a:A) RETURN 1 AS x",
      "MATCH shortestPath((a:A)-[*1..2]->(b:B) RETURN 1 AS x",
      "MATCH p = shortestPath(shortestPath((a:A)-[*1..2]->(b:B))) RETURN 1",
      "MATCH p = (a:A)-[*..]->(b:B) RETURN length(p) AS l",
      "MATCH = (a:A) RETURN 1 AS x",
      "MATCH p == (a:A) RETURN 1 AS x",
      "MATCH __p = (a:A) RETURN 1 AS x")
    bad.foreach(attemptExt)
    // fuzzed prefixes around the new productions
    val gen = Gen.listOf(Gen.oneOf(
      "p", "=", "shortestPath", "(", ")", "MATCH", "[*1..2]", "-", "->",
      "a", ":A", "RETURN", "length", ",")).map(_.mkString(" "))
    samples(gen, 300).foreach(attemptExt)
    // round-14 surface soup: selectors, clause sugar, namespaced
    // calls, IS NORMALIZED — garbage mixes must stay typed
    val gen14 = Gen.listOf(Gen.oneOf(
      "SHORTEST", "ANY", "ALL", "GROUPS", "2", "LET", "FILTER",
      "OFFSET", "NULLS", "FIRST", "LAST", "IS", "NORMALIZED", "NFD",
      "vector", ".", "similarity", "cosine", "(", ")", "=", "MATCH",
      "RETURN", "p", "a", "[*1..2]", "-", "->", ":A", ","))
      .map(_.mkString(" "))
    samples(gen14, 400).foreach(attemptExt)
  }

  test("string literals round-trip through the lexer") {
    val strGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '.', ',', '!', '?', '-')))
      .map(_.mkString)
    samples(strGen, 200).foreach { s =>
      val toks = Lexer.tokenize(s"RETURN '${s}' AS x")
      val lit = toks.collectFirst { case Lexer.StrLit(v, _) => v }
      assert(lit.contains(s))
    }
  }

  test("numeric literals round-trip") {
    samples(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2), 200).foreach { n =>
      val q = Parser.parse(s"MATCH (a:A) WHERE a.x = $n RETURN a.x AS v")
      // negatives parse as Neg(Lit(abs)) — unary minus is a function,
      // matching the reference (CypherVisitor.cs:209-252); assert the
      // exact AST node, not a substring
      val lit = q match {
        case ast.SingleQuery(parts) =>
          parts.head.matches.head.where.get match {
            case ast.Bin(ast.BinOp.Eq, _, rhs) => rhs
            case other => fail(s"unexpected where shape: $other")
          }
        case other => fail(s"unexpected query shape: $other")
      }
      val expectLit: Any =
        if (math.abs(n) <= Int.MaxValue) math.abs(n).toInt else math.abs(n)
      if (n < 0) assert(lit == ast.Neg(ast.Lit(expectLit)))
      else assert(lit == ast.Lit(expectLit))
    }
  }

  test("deeply nested parentheses do not blow the stack") {
    val depth = 500
    val expr = "(" * depth + "1" + ")" * depth
    attempt(s"MATCH (a:A) WHERE a.x = $expr RETURN a.x AS v")
  }

  test("round-7 surface fuzz: property maps, multi-label, pattern WHERE, unbounded stars") {
    def attemptExt(q: String): Unit =
      try { Parser.parse(q, extensions = true, Map.empty); () }
      catch { case _: CypherException => () }
    val bad = Seq(
      "MATCH (a {name) RETURN 1 AS x",
      "MATCH (a {name: }) RETURN 1 AS x",
      "MATCH (a {name: 'x', name: 'y'}) RETURN 1 AS x",
      "MATCH (a {: 'x'}) RETURN 1 AS x",
      "MATCH (a { RETURN 1 AS x",
      "MATCH ({})-[{}]->({}) RETURN 1 AS x",
      "MATCH (a:A:B:C:D:) RETURN 1 AS x",
      "MATCH (a:A::B) RETURN 1 AS x",
      "MATCH (a:A WHERE) RETURN 1 AS x",
      "MATCH (a:A WHERE WHERE a.x) RETURN 1 AS x",
      "MATCH (a)-[r:T WHERE r.x {y: 1}]->(b) RETURN 1 AS x",
      "MATCH (a)-[:T* {x: 1}]->(b) RETURN 1 AS x",
      "MATCH (a)-[:T*1.. WHERE 1=1]->(b) RETURN 1 AS x",
      "MATCH (a)-[:T*..]->(b) RETURN 1 AS x",
      "MATCH (a)-[*9..]->(b) RETURN 1 AS x",
      "MATCH (__pm0 {x: 1}) RETURN 1 AS x")
    bad.foreach(attemptExt)
    bad.foreach(attempt) // parity mode must also stay typed
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf(
      "MATCH", "(", ")", "{", "}", ":", "a", ":A", ":B", "WHERE",
      "name", "'x'", "1", ",", "-", "->", "[", "]", "*", "..",
      "RETURN", "AS", "x")).map(_.mkString(" "))
    samples(gen, 400).foreach(attemptExt)
    samples(gen, 400).foreach(attempt)
  }

  test("round-8 surface fuzz: MERGE, label/rel alternation, CALL paging") {
    def attemptExt(q: String): Unit =
      try { Parser.parse(q, extensions = true, Map.empty); () }
      catch { case _: CypherException => () }
    val bad = Seq(
      "MERGE",
      "MERGE (",
      "MERGE (n)",
      "MERGE (n:L)",
      "MERGE (n:L {)",
      "MERGE (n:L {id})",
      "MERGE (n:L {id: })",
      "MERGE (n:L {id: 1, x: 2})",
      "MERGE (n:L {id: 1}) ON",
      "MERGE (n:L {id: 1}) ON SET",
      "MERGE (n:L {id: 1}) ON MATCH",
      "MERGE (n:L {id: 1}) ON MATCH SET",
      "MERGE (n:L {id: 1}) ON MATCH SET n",
      "MERGE (n:L {id: 1}) ON MATCH SET n.x",
      "MERGE (n:L {id: 1}) ON MATCH SET n.x =",
      "MERGE (n:L {id: 1}) ON MATCH SET m.x = 1",
      "MERGE (n:L {id: 1}) ON MATCH SET n.x = 1 ON MATCH SET n.y = 2",
      "MERGE (n:L {id: 1}) ON CREATE SET n.x = 1 ON CREATE SET n.y = 2",
      "MERGE (__n:L {id: 1})",
      "MERGE (n:L {id: 1}) RETURN 1 AS x",
      "MERGE (n:L {id: 1}) UNION MATCH (m:L) RETURN m.x AS x",
      "MATCH (a:A|) RETURN 1 AS x",
      "MATCH (a:A| ) RETURN 1 AS x",
      "MATCH (a:A|B:C) RETURN 1 AS x",
      "MATCH (a:A:B|C) RETURN 1 AS x",
      "MATCH (a:|B) RETURN 1 AS x",
      "MATCH (a)-[r:|B]->(b) RETURN 1 AS x",
      "MATCH (a)-[r:A|]->(b) RETURN 1 AS x",
      "MATCH (a)-[r:A|B* ]->(b) RETURN 1 AS x",
      "MATCH (a) CALL { WITH a MATCH (a)-[:R]->(b) " +
        "WITH b LIMIT RETURN count(b) AS c } RETURN c",
      "MATCH (a) CALL { MERGE (z:L {id: 1}) } RETURN 1 AS x")
    bad.foreach(attemptExt)
    bad.foreach(attempt) // parity mode must also stay typed
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf(
      "MERGE", "ON", "MATCH", "CREATE", "SET", "(", ")", "{", "}",
      ":", "|", "n", ":L", "id", "=", "1", ",", ".", "x",
      "WITH", "LIMIT", "ORDER", "BY", "DISTINCT", "CALL",
      "RETURN", "AS")).map(_.mkString(" "))
    samples(gen, 400).foreach(attemptExt)
    samples(gen, 400).foreach(attempt)
  }

  test("round-9 surface fuzz: terminal SET/DELETE, unbounded shortestPath") {
    def attemptExt(q: String): Unit =
      try { Parser.parse(q, extensions = true, Map.empty); () }
      catch { case _: CypherException => () }
    val bad = Seq(
      "SET",
      "SET n",
      "SET n.x",
      "SET n.x =",
      "SET n.x = 1",                      // no preceding MATCH
      "MATCH (n:L) SET",
      "MATCH (n:L) SET n",
      "MATCH (n:L) SET n.",
      "MATCH (n:L) SET n.x",
      "MATCH (n:L) SET n.x =",
      "MATCH (n:L) SET n.x = ,",
      "MATCH (n:L) SET n.x = 1,",
      "MATCH (n:L) SET n.x = 1, m",
      "MATCH (n:L) SET n.x = 1, m.y = 2",
      "MATCH (n:L) SET n:Label",
      "MATCH (n:L) SET n = {x: 1}",
      "MATCH (n:L) SET n += {x: 1}",
      "MATCH (n:L) SET n.x = 1 RETURN n.x AS x",
      "MATCH (n:L) SET n.x = 1 WITH n RETURN n.x AS x",
      "MATCH (n:L) SET __z.x = 1",
      "DELETE",
      "DELETE n",
      "DETACH",
      "DETACH n",
      "DETACH DELETE",
      "MATCH (n:L) DELETE",
      "MATCH (n:L) DETACH",
      "MATCH (n:L) DETACH MATCH (m:L) RETURN 1 AS x",
      "MATCH (n:L) DELETE n,",
      "MATCH (n:L) DELETE n, m",
      "MATCH (n:L) DELETE n RETURN 1 AS x",
      "MATCH (n:L) DETACH DELETE n UNION MATCH (m:L) DETACH DELETE m",
      "MATCH (n:L) CALL { MATCH (m:L) DELETE m } RETURN 1 AS x",
      "MATCH p = shortestPath((a)-[*]->(b)) RETURN length(p) AS l",
      "MATCH p = shortestPath((a)-[:T*]->(b)-[:S]->(c)) RETURN length(p) AS l",
      "MATCH p = shortestPath((a)-[:T*]-(b)) RETURN length(p) AS l",
      "MATCH p = allShortestPaths((a)-[:T*]->(b)) RETURN length(p) AS l",
      "MATCH p = shortestPath((a)-[:T*2..]->(b)) RETURN length(p) AS l",
      "MATCH __rd1 = shortestPath((a)-[:T*]->(b)) RETURN 1 AS x",
      "MATCH (a)-[__rd1:T*]->(b) RETURN 1 AS x")
    bad.foreach(attemptExt)
    bad.foreach(attempt) // parity mode must also stay typed
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf(
      "SET", "DELETE", "DETACH", "MATCH", "shortestPath",
      "allShortestPaths", "(", ")", "[", "]", "*", "..", "-", "->",
      "=", ",", ".", ":T", "n", "p", "x", "1", "WHERE", "length",
      "RETURN", "AS", "WITH")).map(_.mkString(" "))
    samples(gen, 400).foreach(attemptExt)
    samples(gen, 400).foreach(attempt)
  }

  test("round-10 surface fuzz: rel CREATE/MERGE, hop preds, [*0..], " +
      "read-backs, standalone clauses") {
    def attemptExt(q: String): Unit =
      try { Parser.parse(q, extensions = true, Map.empty); () }
      catch { case _: CypherException => () }
    val bad = Seq(
      // relationship CREATE/MERGE shapes, truncated and mangled
      "CREATE (a)-",
      "CREATE (a)-[",
      "CREATE (a)-[:T",
      "CREATE (a)-[:T]",
      "CREATE (a)-[:T]-",
      "CREATE (a)-[:T]->",
      "CREATE (a)-[:T]->(",
      "CREATE (a)-[:T]->(b",
      "MATCH (a:L), (b:L) CREATE (a)-[:T]-(b)",
      "MATCH (a:L), (b:L) CREATE (a)-[:T|S]->(b)",
      "MATCH (a:L), (b:L) CREATE (a)-[:T*2]->(b)",
      "MATCH (a:L), (b:L) CREATE (a)-[:T]->(b)-[:S]->(c)",
      "MATCH (a:L), (b:L) CREATE (a)-[:T]->(b), (b)-[:S]->(a)",
      "MATCH (a:L), (b:L) CREATE (__x)-[:T]->(b)",
      "MERGE (a)-",
      "MERGE (a)-[r:T {x: 1}]->(b)",
      "MERGE (a)-[:T]->(b) ON CREATE SET r.x = 1",
      "MERGE (a)-[r:T]->(b) ON",
      "MERGE (a)-[r:T]->(b) ON MATCH",
      "MERGE (a)-[r:T]->(b) ON MATCH SET",
      "MERGE (a)-[r:T]->(b) ON MATCH SET q.x = 1",
      "MERGE (a)-[r:T]->(b) ON MATCH SET r.x = 1 ON MATCH SET r.y = 2",
      "MERGE (a)-[r:T]-(b)",
      // per-hop predicates and zero-length ranges
      "MATCH (a)-[:T* {]->(b) RETURN 1 AS x",
      "MATCH (a)-[:T* {x}]->(b) RETURN 1 AS x",
      "MATCH (a)-[:T* WHERE]->(b) RETURN 1 AS x",
      "MATCH (a)-[r:T|S* WHERE r.x > 0]->(b) RETURN 1 AS x",
      "MATCH (a)-[:T*0..2]->(b) RETURN 1 AS x",
      "MATCH (a)-[:T*0..0]->(b) RETURN 1 AS x",
      "MATCH (a)-[r:T*0..]->(b) RETURN r AS x",
      // read-back RETURN placements
      "CREATE (n:L {id: 1}) RETURN",
      "CREATE (n:L {id: 1}) RETURN n.id AS i WITH i RETURN i",
      "MATCH (n:L) DELETE n RETURN n.id AS i MATCH (m:L) RETURN 1 AS y",
      "MERGE (n:L {id: 1}) RETURN n.id AS i UNION RETURN 1 AS i",
      // standalone clause edges
      "RETURN",
      "WITH",
      "UNWIND",
      "UNWIND [1,2]",
      "UNWIND [1,2] AS",
      "WITH 1 AS x WITH",
      "RETURN * ",
      "UNWIND [1,2] AS x UNWIND x AS y RETURN")
    bad.foreach(attemptExt)
    bad.foreach(attempt) // parity mode must also stay typed
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf(
      "CREATE", "MERGE", "DELETE", "RETURN", "WITH", "UNWIND", "ON",
      "SET", "(", ")", "[", "]", "{", "}", "*", "..", "0", "-", "->",
      "<-", ":T", "|", "WHERE", "a", "b", "r", "=", ",", ".", "x",
      "1", "AS")).map(_.mkString(" "))
    samples(gen, 400).foreach(attemptExt)
    samples(gen, 400).foreach(attempt)
  }

  test("round-11 surface fuzz: id-map endpoints, update chains, [*0..k]") {
    def attemptExt(q: String): Unit =
      try { Parser.parse(q, extensions = true, Map.empty); () }
      catch { case _: CypherException => () }
    val bad = Seq(
      // id-map endpoints, truncated and mangled
      "MERGE (a:L {)-[r:T]->(b:L {id: 1})",
      "MERGE (a:L {id})-[r:T]->(b:L {id: 1})",
      "MERGE (a:L {id:})-[r:T]->(b:L {id: 1})",
      "MERGE (a:L {id: 1, x: 2})-[r:T]->(b:L {id: 1})",
      "MERGE (a:L {id: 1})-[r:T]->(b:L)",
      "MERGE (a:L {id: 1})-[r:T]->(b:L {)",
      "MERGE (a:L {id: 1})-[a:T]->(b:L {id: 2})",
      "MERGE (a:L {id: 1})-[r:T]->(a:L {id: 2})",
      "MERGE (a:L {id: 1})-[r:T]-(b:L {id: 2})",
      "CREATE (a:L {id: 1, x: 2})-[:T]->(b:L {id: 1})",
      "CREATE (a:L {id: 1})-[:T]->(b:L)",
      "CREATE (a:L {id: 1})-[:T]->(b:L {id: 2})-[:S]->(c:L {id: 3})",
      "CREATE (__a:L {id: 1})-[:T]->(b:L {id: 2})",
      // update chains, truncated and doubled
      "MATCH (n:L) SET n.x = 1 WITH",
      "MATCH (n:L) SET n.x = 1 WITH n",
      "MATCH (n:L) SET n.x = 1 WITH n MATCH",
      "MATCH (n:L) SET n.x = 1 WITH n SET n.y = 2",
      "MATCH (n:L) SET n.x = 1 WITH n DELETE n",
      "MATCH (n:L) SET n.x = 1 WITH n MERGE (m:L {id: 1})",
      "MERGE (n:L {id: 1}) WITH n CREATE (m:L {id: 2})",
      "MERGE (n:L {id: 1}) WITH n MATCH (m:L) SET m.x = 1 RETURN 1 AS y",
      "MATCH (n:L) DELETE n WITH n UNION MATCH (m:L) RETURN 1 AS y",
      "MATCH (n:L) DETACH DELETE n WITH",
      "CREATE (n:L {id: 1}) WITH n WITH n RETURN",
      "MATCH (n:L) SET n.x = 1 MATCH (m:L) RETURN 1 AS y",
      "MERGE (n:L {id: 1}) MATCH (m:L) RETURN 1 AS y",
      // bounded zero-length edges
      "MATCH (a)-[:T*0..0]->(b:L) RETURN 1 AS x",
      "MATCH (a:A)-[:T*0..1]->(b:B) RETURN 1 AS x",
      "MATCH (a:A|B)-[:T*0..2]->(b) RETURN 1 AS x",
      "MATCH p = shortestPath((a:L)-[:T*0..3]->(b)) RETURN length(p) AS l",
      "MATCH (a)-[:T*0..99]->(b) RETURN 1 AS x")
    bad.foreach(attemptExt)
    bad.foreach(attempt) // parity mode must also stay typed
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf(
      "MERGE", "CREATE", "SET", "DELETE", "WITH", "MATCH", "RETURN",
      "ON", "(", ")", "[", "]", "{", "}", ":L", "id", ":", "*", "..",
      "0", "2", "-", "->", "<-", ":T", "a", "b", "n", "r", "=", ",",
      ".", "x", "1", "AS")).map(_.mkString(" "))
    samples(gen, 400).foreach(attemptExt)
    samples(gen, 400).foreach(attempt)
  }

  test("round-12 surface fuzz: FOREACH, namespaced fns, path accessors") {
    def attemptExt(q: String): Unit =
      try { Parser.parse(q, extensions = true, Map.empty); () }
      catch { case _: CypherException => () }
    val bad = Seq(
      "FOREACH",
      "FOREACH (",
      "FOREACH (x",
      "FOREACH (x IN",
      "FOREACH (x IN [1]",
      "FOREACH (x IN [1] |",
      "FOREACH (x IN [1] | RETURN x)",
      "MATCH (n:L) FOREACH (x IN [1] | SET n.p = x",
      "MATCH (n:L) FOREACH (x IN [1] | SET n.p = x))",
      "MATCH (n:L) FOREACH (x IN [1] | SET n.p = x) RETURN 1 AS y",
      "MATCH (n:L) FOREACH (x IN [1] | FOREACH (y IN [2] |))",
      "RETURN date.truncate AS x",
      "RETURN date.truncate( AS x",
      "RETURN date.truncate('month' AS x",
      "RETURN date.nope(1) AS x",
      "RETURN duration.between(1) AS x",
      "RETURN datetime({}) AS x",
      "RETURN datetime({year}) AS x",
      "RETURN date({year: 1, hour: 2}) AS x",
      "MATCH p = (a:L)-[:T*1..2]->(b) RETURN nodes(p",
      "MATCH p = (a:L)-[:T*1..2]->(b) RETURN nodes(p, q) AS x",
      "MATCH p = (a:L)-[:T*1..2]->(b) RETURN nodes(1) AS x",
      "MATCH p = (a:L)-[:T*1..2]->(b) WITH p AS q RETURN 1 AS x",
      "MERGE (a)-[r:T {]->(b)",
      "MERGE (a)-[r:T {k}]->(b)",
      "MERGE (a)-[r:T {k: }]->(b)",
      "MATCH (n:L) SET n.p = 1 MERGE",
      "MATCH (n:L) SET n.p = 1 MERGE (m:L {id: 1}) SET",
      "CALL { MATCH (n:L) RETURN 1 AS x UNION",
      "CALL { MATCH (n:L) RETURN 1 AS x UNION ALL }")
    bad.foreach(attemptExt)
    bad.foreach(q =>
      try { Parser.parse(q); () } catch { case _: CypherException => () })
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf(
      "FOREACH", "IN", "|", "nodes", "relationships", "date", "datetime",
      "duration", "truncate", "between", "(", ")", "{", "}", "[", "]",
      "p", "=", "MATCH", "RETURN", "SET", "MERGE", "UNION", "CALL",
      "'month'", "year", ":", "1", ",", ".", "x", "AS")).map(_.mkString(" "))
    samples(gen, 400).foreach(attemptExt)
    samples(gen, 400).foreach(q =>
      try { Parser.parse(q); () } catch { case _: CypherException => () })
  }

  test("round-15 surface fuzz: rel-list variables, group variables, " +
      "unbounded selectors") {
    def attemptExt(q: String): Unit =
      try { Parser.parse(q, extensions = true, Map.empty); () }
      catch { case _: CypherException => () }
    val bad = Seq(
      "MATCH (a)-[rs:*1..2]->(b) RETURN rs",
      "MATCH (a)-[rs:T*1..]->(b) RETURN size(rs) AS n",
      "MATCH (a)-[rs:T*]->(b) RETURN size(rs) AS n",
      "MATCH (a)-[rs:T*1..2]->(b)-[rs:T*1..2]->(c) RETURN 1 AS x",
      "MATCH (rs)-[rs:T*1..2]->(b) RETURN 1 AS x",
      "MATCH (a)-[__rl:T*1..2]->(b) RETURN 1 AS x",
      "MATCH (a) ((x)-[r:T]->(y))+ (b) RETURN size(r) AS n",
      "MATCH (a) ((x)-[r:T]->(y))* (b) RETURN size(r) AS n",
      "MATCH (a) ((x)-[r:T]->(y)){1,2 (b) RETURN 1 AS x",
      "MATCH p = SHORTEST 2 (a)-[:T*]->(b) RETURN length(p",
      "MATCH p = SHORTEST 2 GROUPS (a)-[rs:T*]->(b) RETURN rs",
      "MATCH (p) CALL (p) { MATCH (p)-[:T]->(m) RETURN count(m) AS n " +
        "UNION",
      "MATCH (p) LET a = 1, a = 2 RETURN a",
      "MATCH (p) LET a = 1, b = RETURN b",
      "MATCH (p) LET = 1 RETURN 1 AS x")
    bad.foreach(attemptExt)
    bad.foreach(q =>
      try { Parser.parse(q); () } catch { case _: CypherException => () })
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf(
      "rs", "[", "]", "*", "1..2", ":T", "SHORTEST", "GROUPS", "ANY",
      "2", "(", ")", "{", "}", "LET", "=", ",", "size", "reduce",
      "ALL", "IN", "|", "MATCH", "RETURN", "CALL", "UNION", "count",
      "-", "->", "p", "a", "AS", ".")).map(_.mkString(" "))
    samples(gen, 400).foreach(attemptExt)
    samples(gen, 400).foreach(q =>
      try { Parser.parse(q); () } catch { case _: CypherException => () })
  }

  test("round-16 surface fuzz: multi-variable SET/REMOVE, unanchored " +
      "selectors, zero-hop k-levels") {
    def attemptExt(q: String): Unit =
      try { Parser.parse(q, extensions = true, Map.empty); () }
      catch { case _: CypherException => () }
    val bad = Seq(
      "MATCH (a)-[r:T]->(b) SET a.p = 1, b.q =",
      "MATCH (a)-[r:T]->(b) SET a.p = 1, , b.q = 2",
      "MATCH (a)-[r:T]->(b) SET a.p = 1, b = {q: 2}",
      "MATCH (a)-[r:T]->(b) SET a = {p: 1}, b.q = 2",
      "MATCH (a)-[r:T]->(b) SET a.p = 1, r += {q",
      "MATCH (a)-[r:T]->(b) SET a.p = 1, r.q = 2, a.p = 3",
      "MATCH (a)-[r:T]->(b) REMOVE a.p, r.",
      "MATCH (a)-[r:T]->(b) REMOVE a.p, , r.q",
      "MATCH (a)-[r:T]->(b) REMOVE a.p, r:Label RETURN 1 AS x",
      "MATCH p = SHORTEST 2 (a)-[:T*0..]->(b) RETURN length(p",
      "MATCH p = SHORTEST 2 (a)-[:T*0..]->(b:Other) RETURN 1 AS x",
      "MATCH p = ANY 2 (a)-[:T*]->(b) RETURN nodes(p",
      "MATCH p = SHORTEST 2 GROUPS (a)-[:T*]->(b) RETURN nodes(p)",
      "MATCH p = SHORTEST 0 (a)-[:T*]->(b) RETURN length(p) AS l")
    bad.foreach(attemptExt)
    bad.foreach(q =>
      try { Parser.parse(q); () } catch { case _: CypherException => () })
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf(
      "SET", "REMOVE", ",", ".", "=", "+=", "{", "}", "a", "r", "b",
      "p", "q", "1", "2", "SHORTEST", "ANY", "GROUPS", "*", "0..",
      "[", "]", ":T", "(", ")", "-", "->", "nodes", "relationships",
      "MATCH", "RETURN", "AS", "length", "reduce", "|", "IN"))
      .map(_.mkString(" "))
    samples(gen, 400).foreach(attemptExt)
    samples(gen, 400).foreach(q =>
      try { Parser.parse(q); () } catch { case _: CypherException => () })
  }

  test("round-17 surface fuzz: plain unbounded named paths, " +
      "var-length type alternation") {
    def attemptExt(q: String): Unit =
      try { Parser.parse(q, extensions = true, Map.empty); () }
      catch { case _: CypherException => () }
    val bad = Seq(
      "MATCH p = (a)-[:T*]->(b) RETURN length(p",
      "MATCH p = (a)-[:T*]->(b)-[:S]->(c) RETURN length(p) AS l",
      "MATCH p = (a)-[*]->(b) RETURN length(p) AS l",
      "MATCH p = (a)-[:T*0..]->(b RETURN length(p) AS l",
      "MATCH p = (a)-[:T*]-(b) RETURN nodes(p) AS n",
      "MATCH (a)-[:A|B*]->(b RETURN 1 AS x",
      "MATCH (a)-[:A|B|*]->(b) RETURN 1 AS x",
      "MATCH (a)-[:A||B*]->(b) RETURN 1 AS x",
      "MATCH (a)-[:A|B*1..]->(b) WHERE RETURN 1 AS x",
      "MATCH (a)-[rs:A|B* {k: 1}]->(b) RETURN 1 AS x",
      "MATCH (a)-[rs:A|B*1..2 WHERE rs.x > 0]->(b) RETURN 1 AS x",
      "MATCH p = (a)-[:A|B*]->(b) RETURN relationships(p",
      "MATCH p = shortestPath((a)-[:A|B*]->(b)-[:C]->(c)) " +
        "RETURN length(p) AS l",
      "MATCH (a)-[:T*2..]->(b RETURN a.x AS x",
      "MATCH (a)-[:T*2..1]->(b) RETURN a.x AS x",
      "MATCH p = (a)-[:T*]-(b) RETURN length(p) AS l",
      "MATCH (a)-[:T*2..]-(b) RETURN a.x AS x",
      "MATCH p = shortestPath((a)-[:T*]-(b) RETURN length(p) AS l")
    bad.foreach(attemptExt)
    bad.foreach(q =>
      try { Parser.parse(q); () } catch { case _: CypherException => () })
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf(
      "MATCH", "p", "=", "(", ")", "[", "]", "-", "->", "<-", ":A",
      ":B", "|", "*", "0..", "1..", "2..", "..2", "a", "b", "rs", "nodes",
      "relationships", "length", "reduce", "IN", "RETURN", "AS",
      "WHERE", "shortestPath", "SHORTEST", "GROUPS", ",", "."))
      .map(_.mkString(" "))
    samples(gen, 400).foreach(attemptExt)
    samples(gen, 400).foreach(q =>
      try { Parser.parse(q); () } catch { case _: CypherException => () })
  }
}
