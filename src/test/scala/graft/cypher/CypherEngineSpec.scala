package graft.cypher

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end engine tests over the movie fixture, shape-matched to the
 *  reference's e2e corpus (reference: tests/SQLRenderer.Test/
 *  SQLRendererTest.cs). */
class CypherEngineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  lazy val session = new CypherSession(spark, MovieFixture.catalog(spark))

  private def rows(q: String): Seq[Row] = session.run(q).collect().toSeq

  test("sanity join + filter (ref SQLRendererTest.cs:362-372)") {
    val r = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |WHERE p.Name = 'Tom Hanks'
        |RETURN p.Name AS Name, m.Title AS Title""".stripMargin)
    assert(r.map(_.getString(1)).sorted ==
      Seq("Apollo 13", "Sleepless in Seattle", "You've Got Mail"))
    assert(r.forall(_.getString(0) == "Tom Hanks"))
  }

  test("edge direction: reversed arrow") {
    val r = rows(
      """MATCH (m:Movie)<-[a:ACTED_IN]-(p:Person)
        |WHERE m.Title = 'Apollo 13'
        |RETURN p.Name AS Name""".stripMargin)
    assert(r.map(_.getString(0)).sorted == Seq("Kevin Bacon", "Tom Hanks"))
  }

  test("undirected relationship resolves against schema") {
    val r = rows(
      """MATCH (m:Movie)-[a:ACTED_IN]-(p:Person)
        |WHERE m.Title = 'Apollo 13' RETURN p.Name AS Name""".stripMargin)
    assert(r.map(_.getString(0)).sorted == Seq("Kevin Bacon", "Tom Hanks"))
  }

  test("implicit relationship inequality (ref :374-388)") {
    // co-actors in the same movie: the two ACTED_IN vars must bind
    // different edge rows
    val r = rows(
      """MATCH (p1:Person)-[a1:ACTED_IN]->(m:Movie)<-[a2:ACTED_IN]-(p2:Person)
        |WHERE p1.Name = 'Tom Hanks'
        |RETURN p2.Name AS CoActor, m.Title AS Title""".stripMargin)
    assert(!r.exists(_.getString(0) == "Tom Hanks"))
    assert(r.map(_.getString(0)).toSet ==
      Set("Meg Ryan", "Kevin Bacon"))
  }

  test("OPTIONAL MATCH yields nulls and nullable schema (ref :430-463)") {
    val df = session.run(
      """MATCH (m:Movie)
        |OPTIONAL MATCH (p:Person)-[r:REVIEWED]->(m)
        |RETURN m.Title AS Title, r.Rating AS Rating""".stripMargin)
    val r = df.collect().toSeq
    // Apollo 13 has no review → null rating
    assert(r.exists(x => x.getString(0) == "Apollo 13" && x.isNullAt(1)))
    assert(df.schema("Rating").nullable)
  }

  test("OPTIONAL MATCH with WHERE filters before the left join") {
    val r = rows(
      """MATCH (m:Movie)
        |OPTIONAL MATCH (p:Person)-[r:REVIEWED]->(m) WHERE r.Rating > 90
        |RETURN m.Title AS Title, p.Name AS Reviewer""".stripMargin)
    assert(r.size == 3)
    assert(r.count(_.isNullAt(1)) == 2)  // only m1 has a >90 review
  }

  test("aggregation: implicit group by + count entity (ref :642-669)") {
    val r = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |RETURN p.Name AS Name, count(m) AS Movies""".stripMargin)
    val m = r.map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(m == Map("Tom Hanks" -> 3L, "Meg Ryan" -> 2L, "Kevin Bacon" -> 1L))
  }

  test("count(entity) > comparison as value (ref :443-450)") {
    val r = rows(
      """MATCH (p:Person)-[d:DIRECTED]->(m:Movie)
        |RETURN p.Name AS Name, count(m) > 0 AS IsDirector""".stripMargin)
    assert(r == Seq(Row("Rob Reiner", true)))
  }

  test("global aggregation (all-aggregate projection)") {
    val r = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |RETURN count(a) AS N, min(m.Released) AS First""".stripMargin)
    assert(r == Seq(Row(6L, 1993)))
  }

  test("DISTINCT projection (ref :488-552)") {
    val r = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |RETURN DISTINCT m.Released AS Year""".stripMargin)
    assert(r.map(_.getInt(0)).sorted == Seq(1993, 1995, 1998))
  }

  test("WITH pipeline + aliasing + entity swap (ref :406-415)") {
    val r = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |WITH m AS p2, p AS m2
        |RETURN m2.Name AS Name, p2.Title AS Title""".stripMargin)
    assert(r.size == 6)
    assert(r.exists(x => x.getString(0) == "Tom Hanks"
      && x.getString(1) == "Apollo 13"))
  }

  test("WITH masks non-projected variables") {
    val e = intercept[CypherException] {
      session.run(
        """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
          |WITH p
          |RETURN m.Title AS T""".stripMargin)
    }
    assert(e.getMessage.contains("'m'") ||
      e.getMessage.matches(".*\\bm\\b.*"))
  }

  test("ORDER BY + LIMIT (ref :777-843)") {
    val r = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |RETURN DISTINCT m.Title AS Title, m.Released AS Year
        |ORDER BY Year DESC LIMIT 2""".stripMargin)
    assert(r.map(_.getString(0)) == Seq("You've Got Mail", "Apollo 13"))
  }

  test("ORDER BY over unprojected field of still-visible entity") {
    val r = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |WITH p, m ORDER BY m.Released DESC LIMIT 1
        |RETURN m.Title AS Title""".stripMargin)
    assert(r.map(_.getString(0)) == Seq("You've Got Mail"))
  }

  test("CASE expression (ref :390-428)") {
    val r = rows(
      """MATCH (m:Movie)
        |RETURN m.Title AS Title,
        |  CASE WHEN m.Released < 1995 THEN 'old' ELSE 'new' END AS Age""".stripMargin)
    val m = r.map(x => x.getString(0) -> x.getString(1)).toMap
    assert(m("Sleepless in Seattle") == "old" && m("Apollo 13") == "new")
  }

  test("operators: IN, %, ^, XOR (ref :599-613)") {
    val r = rows(
      """MATCH (m:Movie) WHERE m.Released IN [1993, 1998]
        |RETURN m.Title AS T, m.Released % 10 AS D,
        |       m.Released ^ 2 AS Sq,
        |       (m.Released > 1995) XOR (m.Released < 1997) AS X""".stripMargin)
    assert(r.size == 2)
    val byTitle = r.map(x => x.getString(0) ->
      (x.getInt(1), x.getDouble(2), x.getBoolean(3))).toMap
    assert(byTitle("Sleepless in Seattle") == ((3, 1993.0 * 1993.0, true)))
    assert(byTitle("You've Got Mail") == ((8, 1998.0 * 1998.0, true)))
  }

  test("string functions (ref :615-640)") {
    val r = rows(
      """MATCH (p:Person) WHERE p.Name STARTS WITH 'Tom'
        |RETURN toUpper(p.Name) AS U, size(p.Name) AS L,
        |       left(p.Name, 3) AS L3""".stripMargin)
    assert(r == Seq(Row("TOM HANKS", 9, "Tom")))
  }

  test("string + number concatenation") {
    val r = rows(
      """MATCH (m:Movie) WHERE m.Title = 'Apollo 13'
        |RETURN m.Title + ' (' + m.Released + ')' AS S""".stripMargin)
    assert(r == Seq(Row("Apollo 13 (1995)")))
  }

  test("regex =~ is a full match") {
    val r = rows(
      """MATCH (p:Person) WHERE p.Name =~ 'Tom.*'
        |RETURN p.Name AS N""".stripMargin)
    assert(r.map(_.getString(0)) == Seq("Tom Hanks"))
    val none = rows(
      "MATCH (p:Person) WHERE p.Name =~ 'om.*' RETURN p.Name AS N")
    assert(none.isEmpty)
  }

  test("UNION and UNION ALL (fixed vs reference parser bug, SURVEY §2.1)") {
    val all = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie) WHERE m.Title = 'Apollo 13'
        |RETURN p.Name AS Name
        |UNION ALL
        |MATCH (p:Person)-[r:REVIEWED]->(m:Movie) RETURN p.Name AS Name""".stripMargin)
    assert(all.size == 4)
    val dedup = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie) RETURN p.Name AS Name
        |UNION
        |MATCH (p:Person)-[r:REVIEWED]->(m:Movie) RETURN p.Name AS Name""".stripMargin)
    assert(dedup.size == 4)  // 3 actors + 1 reviewer
  }

  test("stdev / avg / sum typing (ref :642-705)") {
    val df = session.run(
      """MATCH (p:Person)-[r:REVIEWED]->(m:Movie)
        |RETURN p.Name AS N, avg(r.Rating) AS A, stdev(r.Rating) AS S,
        |       sum(r.Rating) AS T""".stripMargin)
    val r = df.collect()
    assert(r.length == 1)
    assert(r(0).getDouble(1) == 90.0)
    assert(math.abs(r(0).getDouble(2) - 7.0710678) < 1e-5)
    assert(r(0).getLong(3) == 180L)
    assert(df.schema("A").dataType.typeName == "double")
  }

  test("count(DISTINCT entity)") {
    val r = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |RETURN count(DISTINCT m) AS Movies""".stripMargin)
    assert(r == Seq(Row(3L)))
  }

  test("parity: standalone RETURN/WITH/UNWIND stay rejected") {
    intercept[CypherNotSupportedException](rows("RETURN 1 AS x"))
    intercept[CypherNotSupportedException](rows(
      "WITH 1 AS a RETURN a"))
  }

  test("parity: first clause cannot be OPTIONAL MATCH") {
    intercept[CypherNotSupportedException](rows(
      "OPTIONAL MATCH (p:Person) RETURN p.Name AS N"))
  }

  test("parity: MATCH cannot directly follow OPTIONAL MATCH") {
    intercept[CypherNotSupportedException](rows(
      """MATCH (p:Person) OPTIONAL MATCH (p)-[:FOLLOWS]->(q:Person)
        |MATCH (q)-[:ACTED_IN]->(m:Movie)
        |RETURN m.Title AS T""".stripMargin))
  }

  test("parity: DISTINCT inside aggregate only for count()") {
    // the reference's SQLRenderer emits COUNT(DISTINCT …) alone; the
    // extended surface lifts this (CypherExtensionsSpec), parity keeps it
    intercept[CypherNotSupportedException](rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |RETURN sum(DISTINCT m.Released) AS S""".stripMargin))
  }

  test("label inference from edge schema") {
    val r = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m)
        |WHERE p.Name = 'Kevin Bacon' RETURN m.Title AS T""".stripMargin)
    assert(r.map(_.getString(0)) == Seq("Apollo 13"))
  }

  test("label inference across WITH parts") {
    val r = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie) WITH p, m
        |MATCH (p)-[a2:ACTED_IN]->(m2:Movie) WHERE m2.Title <> m.Title
        |RETURN DISTINCT p.Name AS N""".stripMargin)
    assert(r.map(_.getString(0)).sorted == Seq("Meg Ryan", "Tom Hanks"))
  }

  test("cross join of disjoint patterns") {
    val r = rows(
      """MATCH (p:Person), (m:Movie)
        |WHERE p.Name = 'Tom Hanks'
        |RETURN p.Name AS N, m.Title AS T""".stripMargin)
    assert(r.size == 3)
  }

  test("post-WITH WHERE (HAVING semantics)") {
    val r = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |WITH p.Name AS Name, count(m) AS Movies WHERE Movies > 1
        |RETURN Name, Movies""".stripMargin)
    assert(r.map(_.getString(0)).sorted == Seq("Meg Ryan", "Tom Hanks"))
  }

  // ----- rejection parity (SURVEY.md §2.6) -----------------------------

  private def rejected(q: String): Unit =
    intercept[CypherException] { session.run(q) }

  test("chained OPTIONAL MATCH (ref :453-486)") {
    val r = rows(
      """MATCH (p:Person)
        |OPTIONAL MATCH (p)-[a:ACTED_IN]->(m:Movie)
        |OPTIONAL MATCH (p)-[rv:REVIEWED]->(m2:Movie)
        |RETURN p.Name AS Name, count(m) AS Acted, count(m2) AS Reviewed
        |ORDER BY Name""".stripMargin)
    val byName = r.map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(byName("Tom Hanks") == ((3L, 0L)))
    assert(byName("Jessica Thompson") == ((0L, 2L)))
    assert(byName("Rob Reiner") == ((0L, 0L)))
  }

  test("edge direction negative: arrow against schema direction rejected (ref :707-775)") {
    val e = intercept[CypherBindingException](rows(
      """MATCH (m:Movie)-[a:ACTED_IN]->(p:Person)
        |RETURN p.Name AS Name""".stripMargin))
    assert(e.getMessage.contains("ACTED_IN"))
  }

  test("WHERE inside MATCH part vs WHERE after WITH (ref :845-894)") {
    val inMatch = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |WHERE m.Released > 1994
        |RETURN p.Name AS Name, m.Title AS Title ORDER BY Name, Title""".stripMargin)
    val afterWith = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |WITH p, m
        |WHERE m.Released > 1994
        |RETURN p.Name AS Name, m.Title AS Title ORDER BY Name, Title""".stripMargin)
    assert(inMatch.map(_.toSeq) == afterWith.map(_.toSeq))
    assert(inMatch.nonEmpty)
  }

  test("IS NULL over optional side (anti-join shape)") {
    val r = rows(
      """MATCH (p:Person)
        |OPTIONAL MATCH (p)-[a:ACTED_IN]->(m:Movie)
        |WITH p, m
        |WHERE m.Title IS NULL
        |RETURN p.Name AS Name ORDER BY Name""".stripMargin)
    assert(r.map(_.getString(0)) ==
      Seq("Jessica Thompson", "Rob Reiner"))
  }

  test("left/right string functions (ref :615-640)") {
    val r = rows(
      """MATCH (p:Person) WHERE p.Name = 'Tom Hanks'
        |RETURN left(p.Name, 3) AS L, right(p.Name, 5) AS R""".stripMargin)
    assert(r.head.getString(0) == "Tom" && r.head.getString(1) == "Hanks")
  }

  test("nullability flips after OPTIONAL MATCH (ref LogicalPlannerTest.cs:161-166)") {
    val df = session.run(
      """MATCH (p:Person)-[r1:REVIEWED]->(m:Movie)
        |OPTIONAL MATCH (p2:Person)-[r2:REVIEWED]->(m)
        |WHERE p2.Born IS NOT NULL
        |RETURN r1.Rating AS Rating1, r2.Rating AS Rating2""".stripMargin)
    val s = df.schema
    assert(s("Rating2").nullable)
  }

  test("edge verb shared across label pairs resolves by endpoint triple (ref EdgeSchema.cs:13-16)") {
    import spark.implicits._
    val schema = GraphSchema(
      nodes = Seq(NodeDef("A", "id", Seq("name"), "a"),
        NodeDef("B", "id", Seq("title"), "b")),
      edges = Seq(
        EdgeDef("LINKS", "A", "B", "src", "dst", Seq.empty, "a_links_b"),
        EdgeDef("LINKS", "A", "A", "src", "dst", Seq.empty, "a_links_a")))
    val tables = Map(
      "a" -> Seq((1L, "a1"), (2L, "a2")).toDF("id", "name"),
      "b" -> Seq((10L, "b1")).toDF("id", "title"),
      "a_links_b" -> Seq((1L, 10L)).toDF("src", "dst"),
      "a_links_a" -> Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"))
    val s = new CypherSession(spark, new GraphCatalog(schema, tables(_)))
    val ab = s.run(
      "MATCH (x:A)-[:LINKS]->(y:B) RETURN x.name AS n, y.title AS t").collect()
    assert(ab.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a1", "b1")))
    val aa = s.run(
      "MATCH (x:A)-[:LINKS]->(y:A) RETURN x.name AS n, y.name AS m ORDER BY n")
      .collect()
    assert(aa.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a1", "a2"), ("a2", "a1")))
  }

  test("MATCH after WITH joins on the piped entity (ref LogicalPlan.cs:706-743)") {
    val r = rows(
      """MATCH (f:Person)-[fo:FOLLOWS]->(p:Person)
        |WITH f, p
        |MATCH (p)-[a:ACTED_IN]->(m:Movie)
        |RETURN f.Name AS Follower, p.Name AS Star, count(m) AS Movies
        |ORDER BY Follower, Star""".stripMargin)
    assert(r.map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq ==
      Seq(("Jessica Thompson", "Meg Ryan", 2L),
        ("Jessica Thompson", "Tom Hanks", 3L),
        ("Tom Hanks", "Meg Ryan", 2L)))
  }

  test("string literal escapes survive lexing into predicates") {
    val r = rows(
      """MATCH (p:Person) WHERE p.Name = 'Tom\'s' OR p.Name = "Tom Hanks"
        |RETURN p.Name AS Name""".stripMargin)
    assert(r.map(_.getString(0)) == Seq("Tom Hanks"))
  }

  test("plan shape: scan-merge keeps a 3-hop pattern at 3 parquet scans") {
    assume(new java.io.File("/root/testdata/sf0.001/nation.parquet").exists())
    val df = graft.TpchGraph.session(spark, "/root/testdata/sf0.001").run(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)-[:IN_REGION]->(r:Region)
        |RETURN n.n_name AS nation, count(c) AS n ORDER BY nation""".stripMargin)
    val physical = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(physical).length
    assert(scans == 3, s"expected 3 scans, plan had $scans:\n$physical")
  }

  test("WITH ORDER BY LIMIT WHERE clause order (ref SQLRendererTest.cs:529-539)") {
    val r = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |WITH p, m ORDER BY m.Released DESC LIMIT 3 WHERE p.Name <> 'Kevin Bacon'
        |RETURN p.Name AS Name, m.Title AS Title ORDER BY Name, Title""".stripMargin)
    // top-3 by release: You've Got Mail (p1, p2), Apollo 13 (p1 or p3) —
    // after dropping Kevin Bacon rows
    assert(r.nonEmpty && r.forall(_.getString(0) != "Kevin Bacon"))
    assert(r.map(_.getString(1)).forall(
      Set("You've Got Mail", "Apollo 13").contains))
  }

  test("typed errors for review-found holes (rel reuse, collisions, EOF, limits)") {
    // rel alias reused across chained MATCH clauses in one part
    intercept[CypherException](rows(
      """MATCH (a:Person)-[r:ACTED_IN]->(m:Movie)
        |MATCH (b:Person)-[r:ACTED_IN]->(m2:Movie)
        |RETURN count(r) AS n""".stripMargin))
    // same alias for node and relationship
    intercept[CypherException](rows(
      "MATCH (a:Person)-[a:ACTED_IN]->(m:Movie) RETURN count(a) AS n"))
    // truncated input must not escape as IndexOutOfBounds
    intercept[CypherException](Parser.parse("MATCH"))
    intercept[CypherException](Parser.parse("MATCH (a:Person),"))
    // out-of-range literals
    intercept[CypherException](Parser.parse(
      "MATCH (a:A) RETURN a.x AS v LIMIT 5000000000"))
    intercept[CypherException](Parser.parse(
      "MATCH (a:A) WHERE a.x = 99999999999999999999999 RETURN a.x AS v"))
    // reserved internal alias namespace
    intercept[CypherException](rows(
      "MATCH (p:Person) RETURN p.Name AS __item_0"))
  }

  test("toBoolean / unary plus / cast-failure nulls") {
    val r = rows(
      """MATCH (p:Person) WHERE p.Name = 'Tom Hanks'
        |RETURN toBoolean('true') AS t, toBoolean('nope') AS bad,
        |       toInteger('12') AS i, toInteger('xyz') AS badint,
        |       toInteger('5000000000') AS big""".stripMargin)
    val row = r.head
    assert(row.getBoolean(0))
    assert(row.isNullAt(1)) // Cypher: failed cast → null
    assert(row.getLong(2) == 12L) // toInteger is 64-bit in openCypher
    assert(row.isNullAt(3))
    assert(row.getLong(4) == 5000000000L)
  }

  test("after WITH DISTINCT or aggregation only explicit projections are referencable (ref :554-596)") {
    // WHERE over an unprojected field after DISTINCT → binding error
    intercept[CypherException](rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |WITH DISTINCT m.Title AS Title
        |WHERE p.Name = 'Tom Hanks'
        |RETURN Title""".stripMargin))
    // ORDER BY over an unprojected field after aggregation → binding error
    intercept[CypherException](rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |WITH p, count(m) AS n ORDER BY m.Title
        |RETURN p.Name AS Name, n""".stripMargin))
    // the positive counterpart: non-DISTINCT WITH may reference
    // unprojected fields of still-visible entities
    val ok = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |WITH m
        |WHERE m.Released > 1994
        |RETURN DISTINCT m.Title AS Title ORDER BY Title""".stripMargin)
    assert(ok.nonEmpty)
  }

  test("UNION with mismatched columns is a typed binding error") {
    intercept[CypherException](rows(
      """MATCH (p:Person) RETURN p.Name AS a
        |UNION
        |MATCH (m:Movie) RETURN m.Title AS b""".stripMargin))
  }

  test("malformed literals and nested-list aggregates rejected with typed errors") {
    intercept[CypherException](Parser.parse(
      "MATCH (a:A) RETURN 1e AS x"))
    intercept[CypherException](Parser.parse(
      "MATCH (a:A) RETURN sum([count(a.x), 1]) AS s"))
    intercept[CypherException](Parser.parse(
      "MATCH (a:A) RETURN percentileCont(a.x, 1.5) AS p"))
  }

  test("statically illegal operand types raise Cypher-typed errors, not Catalyst ones") {
    // arithmetic over strings (other than +'s concat rule)
    val e1 = intercept[CypherException](rows(
      "MATCH (p:Person) RETURN p.Name - 1 AS x"))
    assert(e1.getMessage.contains("Type error"))
    // boolean in arithmetic
    intercept[CypherTypeException](rows(
      "MATCH (m:Movie) RETURN (m.Released > 1990) + 1 AS x"))
    // AND over non-boolean
    intercept[CypherTypeException](rows(
      "MATCH (m:Movie) RETURN m.Released AND true AS x"))
    // comparing boolean with numeric
    intercept[CypherTypeException](rows(
      "MATCH (m:Movie) WHERE (m.Released > 1990) > 5 RETURN m.Title AS t"))
    // regex over non-string
    intercept[CypherTypeException](rows(
      "MATCH (m:Movie) WHERE m.Released =~ '19.*' RETURN m.Title AS t"))
    // string aggregate where numeric required
    intercept[CypherTypeException](rows(
      "MATCH (p:Person) RETURN sum(p.Name) AS s"))
    // string function over numeric
    intercept[CypherTypeException](rows(
      "MATCH (m:Movie) RETURN toUpper(m.Released) AS u"))
    // CASE boolean×numeric is REJECTED: the reference's branch unifier
    // (Plus coercion row, QueryExpressionCaseExpression.cs:88-117) maps
    // (bool, int) to default(Type) and throws BEFORE the SQL matrix's
    // Bit→Int Cast is ever consulted
    intercept[CypherTypeException](rows(
      """MATCH (m:Movie) WHERE m.Title = 'Apollo 13'
        |RETURN CASE WHEN m.Released > 1990 THEN true ELSE 5 END AS x""".stripMargin))
    // boolean×string merges to string (Plus(bool,string)=string)
    val bs = rows(
      """MATCH (m:Movie) WHERE m.Title = 'Apollo 13'
        |RETURN CASE WHEN m.Released > 1990 THEN true ELSE 'no' END AS x""".stripMargin)
    assert(bs.head.getString(0) == "true")
    // temporal×numeric branches are Invalid in unifier AND matrix
    intercept[CypherTypeException](rows(
      """MATCH (m:Movie)
        |RETURN CASE WHEN m.Released > 1990 THEN date('1995-01-01')
        |       ELSE 5 END AS x""".stripMargin))
    // legal coercions still compile: string + number concat, int/int div
    assert(rows("MATCH (m:Movie) RETURN m.Title + 1 AS t LIMIT 1").nonEmpty)
    assert(rows("MATCH (m:Movie) RETURN m.Released / 10 AS d LIMIT 1").nonEmpty)
  }

  test("UNION with mismatched column TYPES is a typed binding error") {
    val e = intercept[CypherBindingException](rows(
      """MATCH (p:Person) RETURN p.Name AS v
        |UNION
        |MATCH (m:Movie) RETURN m.Released AS v""".stripMargin))
    assert(e.getMessage.contains("type mismatch"))
    // ...but a NULL branch unifies with anything (Cypher-legal)
    val ok = rows(
      """MATCH (p:Person) WHERE p.Name = 'Tom Hanks' RETURN null AS v
        |UNION
        |MATCH (m:Movie) RETURN m.Released AS v""".stripMargin)
    assert(ok.nonEmpty)
  }

  test("temporal conversions/merges: datetime over a temporal, CASE widens date→timestamp") {
    // datetime() over an already-temporal expression is an identity/
    // widening conversion, not a type error
    val d = session.run(
      """MATCH (m:Movie) WHERE m.Title = 'Apollo 13'
        |RETURN datetime(date('1995-06-30')) AS dt""".stripMargin)
    import org.apache.spark.sql.types._
    assert(d.schema("dt").dataType == TimestampType)
    // date-first CASE must not truncate the timestamp branch
    val c = session.run(
      """MATCH (m:Movie) WHERE m.Title = 'Apollo 13'
        |RETURN CASE WHEN m.Released < 1990 THEN date('2020-01-01')
        |       ELSE datetime('2020-06-15T12:30:00') END AS x""".stripMargin)
    assert(c.schema("x").dataType == TimestampType)
    assert(c.head().getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2020-06-15 12:30:00"))
  }

  test("percentileDisc: exact SQL-standard semantics, no collect_list in plan") {
    // Released years per person over ACTED_IN — grouped discrete median.
    val df = session.run(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |RETURN p.Name AS Name, percentileDisc(m.Released, 0.5) AS med
        |ORDER BY Name""".stripMargin)
    // smallest value with cume_dist >= 0.5: Tom Hanks acted in
    // Apollo 13 (1995), Sleepless in Seattle (1993), You've Got Mail
    // (1998) -> sorted (1993, 1995, 1998), median = 1995
    val hanks = df.collect().find(_.getString(0) == "Tom Hanks").get
    assert(hanks.getDouble(1) == 1995.0)
    // scale guard: the plan must use the engine percentile aggregate,
    // not a per-group collect_list materialization
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("percentile_disc"))
    assert(!plan.toLowerCase.contains("collect_list"))
  }

  test("datetime/date literals are typed at compile time; malformed → syntax error") {
    // typed literal comparison compiles and evaluates (Movie.Released is
    // int — use a projected literal instead)
    val df = session.run(
      """MATCH (m:Movie) WHERE m.Title = 'Apollo 13'
        |RETURN datetime('1995-06-30T12:00:00') AS dt, date('1995-06-30') AS d""".stripMargin)
    import org.apache.spark.sql.types._
    assert(df.schema("dt").dataType == TimestampType)
    assert(df.schema("d").dataType == DateType)
    val r = df.head()
    assert(r.getTimestamp(0) ==
      java.sql.Timestamp.valueOf("1995-06-30 12:00:00"))
    assert(r.getDate(1).toString == "1995-06-30")
    // bare-date datetime form = midnight
    val r2 = session.run(
      """MATCH (m:Movie) WHERE m.Title = 'Apollo 13'
        |RETURN datetime('1995-06-30') AS dt""".stripMargin).head()
    assert(r2.getTimestamp(0) == java.sql.Timestamp.valueOf("1995-06-30 00:00:00"))
    // malformed literals are compile-time Cypher errors, not runtime nulls
    intercept[CypherSyntaxException](rows(
      "MATCH (m:Movie) RETURN datetime('1995-13-45T99:00:00') AS x"))
    intercept[CypherSyntaxException](rows(
      "MATCH (m:Movie) RETURN date('not-a-date') AS x"))
    // type pass knows the constructors: datetime over a number is illegal
    intercept[CypherTypeException](rows(
      "MATCH (m:Movie) RETURN datetime(m.Released) AS x"))
  }

  test("integer division is exact above 2^53") {
    import spark.implicits._
    val schema = GraphSchema(
      nodes = Seq(NodeDef("K", "id", Seq("big"), "k")), edges = Seq.empty)
    val tables = Map("k" -> Seq((1L, 9007199254740993L)).toDF("id", "big"))
    val s = new CypherSession(spark, new GraphCatalog(schema, tables(_)))
    val r = s.run("MATCH (k:K) RETURN k.big / 1 AS v").head()
    assert(r.getLong(0) == 9007199254740993L) // double round-trip would be ...992
  }

  test("rejections match the reference's unsupported surface") {
    rejected("CREATE (n:Person) RETURN n.Name AS N")
    rejected("MATCH (p:Person) SET p.Name = 'x' RETURN p.Name AS N")
    rejected("MERGE (n:Person {id: 99}) ON CREATE SET n.Name = 'x'")
    rejected("UNWIND [1,2] AS x RETURN x")
    rejected("MATCH (p:Person {Name: 'Tom Hanks'}) RETURN p.Name AS N")
    rejected("MATCH (p:Person WHERE p.Born > 1950) RETURN p.Name AS N")
    rejected("MATCH (p:Person:Actor) RETURN p.Name AS N")
    rejected("MATCH (p:Person)-[a:ACTED_IN*1..3]->(m:Movie) RETURN p.Name AS N")
    rejected("MATCH (p:Person) RETURN p")
    rejected("MATCH x = (p:Person)-[a:ACTED_IN]->(m:Movie) RETURN p.Name AS N")
    rejected("MATCH (p:Person)-[f:FOLLOWS]-(q:Person) RETURN p.Name AS N")
    rejected("RETURN 1 AS x")
    rejected("MATCH (p:Person) RETURN count(*) AS n")
    rejected("MATCH (p:Person) RETURN p.Name AS N SKIP 2")
    rejected("MATCH (p:Person) WHERE p.Name = $name RETURN p.Name AS N")
    rejected("MATCH (p:Person) RETURN sum(count(p.Born)) AS n")
    rejected("MATCH (a) RETURN a.Name AS N")  // label not inferable
    rejected("OPTIONAL MATCH (p:Person) RETURN p.Name AS N")
    rejected( // simple CASE (CypherVisitor.cs:1776-1781) — extension-only
      "MATCH (p:Person) RETURN CASE p.Born WHEN 1956 THEN 'x' ELSE 'y' END AS C")
    // list surface (comprehension / quantifier / reduce / index) —
    // extension-only; §2.6 keeps the reference's rejections
    rejected("MATCH (p:Person) RETURN [k IN [1,2] | k] AS X")
    rejected("MATCH (p:Person) RETURN any(k IN [1,2] WHERE k > 1) AS X")
    rejected("MATCH (p:Person) RETURN reduce(s = 0, k IN [1,2] | s + k) AS X")
    rejected("MATCH (p:Person) RETURN split(p.Name, ' ')[0] AS X")
  }
}
