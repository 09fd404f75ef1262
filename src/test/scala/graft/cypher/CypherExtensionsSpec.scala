package graft.cypher

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/**
 * The flagged extension surface — SKIP, `$param` parameters,
 * UNWIND + collect(), bounded variable-length `[*lo..hi]` — none of
 * which the reference supports (no oC_Skip visitor,
 * CypherVisitor.cs:2076-2086; UNWIND/collect on its roadmap
 * README.md:57; var-length rejected CypherVisitor.cs:2035-2039).
 * Parity mode (the default session) must keep rejecting all of them —
 * covered by CypherEngineSpec's rejection test; here the EXTENDED
 * session accepts and computes them.
 */
class CypherExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  lazy val session = new CypherSession(spark, MovieFixture.catalog(spark)).extended

  private def rows(q: String): Seq[Row] = session.run(q).collect().toSeq
  private def rows(q: String, params: Map[String, Any]): Seq[Row] =
    session.run(q, params).collect().toSeq

  // ----------------------------------------------------------- SKIP

  test("SKIP pages after ORDER BY, composes with LIMIT") {
    val all = rows(
      "MATCH (p:Person) RETURN p.Name AS N ORDER BY N")
      .map(_.getString(0))
    val page = rows(
      "MATCH (p:Person) RETURN p.Name AS N ORDER BY N SKIP 2 LIMIT 2")
      .map(_.getString(0))
    assert(page == all.slice(2, 4))
    // SKIP past the end → empty, not an error
    assert(rows("MATCH (p:Person) RETURN p.Name AS N ORDER BY N SKIP 99")
      .isEmpty)
  }

  test("SKIP without ORDER BY drops some rows (Cypher: unspecified which)") {
    val r = rows("MATCH (p:Person) RETURN p.Name AS N SKIP 3")
    assert(r.size == 2) // 5 people - 3
  }

  test("SKIP on an aggregating projection") {
    val r = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |RETURN m.Title AS T, count(p.id) AS C
        |ORDER BY C DESC, T SKIP 1 LIMIT 1""".stripMargin)
    // every movie has 2 actors; total order is alphabetical
    assert(r.map(x => (x.getString(0), x.getLong(1))) ==
      Seq(("Sleepless in Seattle", 2L)))
  }

  test("SKIP literal contract matches LIMIT's (int32, non-negative)") {
    intercept[CypherSyntaxException](rows(
      "MATCH (p:Person) RETURN p.Name AS N SKIP -1"))
    intercept[CypherSyntaxException](rows(
      "MATCH (p:Person) RETURN p.Name AS N SKIP 4294967296"))
    intercept[CypherSyntaxException](rows(
      "MATCH (p:Person) RETURN p.Name AS N SKIP x"))
  }

  // ----------------------------------------------------- parameters

  test("$param binds typed literals: string, int, double, boolean, list") {
    val r = rows(
      """MATCH (p:Person) WHERE p.Name = $who RETURN p.Born AS B""",
      Map("who" -> "Tom Hanks"))
    assert(r.map(_.getInt(0)) == Seq(1956))
    val r2 = rows(
      """MATCH (p:Person) WHERE p.Born > $year RETURN p.Name AS N ORDER BY N""",
      Map("year" -> 1957))
    assert(r2.map(_.getString(0)) == Seq("Kevin Bacon", "Meg Ryan"))
    val r3 = rows(
      """MATCH (p:Person) WHERE p.Name IN $names RETURN p.Born AS B ORDER BY B""",
      Map("names" -> Seq("Tom Hanks", "Meg Ryan")))
    assert(r3.map(_.getInt(0)) == Seq(1956, 1961))
  }

  test("$param participates in static typing and expressions") {
    val r = rows(
      """MATCH (p:Person) WHERE p.Born IS NOT NULL
        |RETURN p.Name AS N, p.Born + $off AS B ORDER BY N LIMIT 1""".stripMargin,
      Map("off" -> 10))
    assert(r.head.getInt(1) == 1968) // Kevin Bacon, 1958 + 10
  }

  test("unknown $param is a binding error naming the parameter") {
    val e = intercept[CypherBindingException](rows(
      "MATCH (p:Person) WHERE p.Name = $nope RETURN p.Name AS N"))
    assert(e.getMessage.contains("$nope"))
  }

  test("parity session still rejects $param even when params are passed") {
    val parity = new CypherSession(spark, MovieFixture.catalog(spark))
    intercept[CypherNotSupportedException](
      parity.run("MATCH (p:Person) WHERE p.Name = $who RETURN p.Name AS N",
        Map("who" -> "Tom Hanks")))
  }

  // ------------------------------------------------ UNWIND + collect

  test("collect() then UNWIND round-trips the rows") {
    val direct = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |RETURN m.Title AS T, p.Name AS N ORDER BY T, N""".stripMargin)
      .map(x => (x.getString(0), x.getString(1)))
    val roundTrip = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |WITH m.Title AS T, collect(p.Name) AS names
        |UNWIND names AS N
        |RETURN T, N ORDER BY T, N""".stripMargin)
      .map(x => (x.getString(0), x.getString(1)))
    assert(roundTrip == direct)
  }

  test("collect(DISTINCT x) dedups within the group") {
    val r = rows(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |WITH p.Name AS N, collect(DISTINCT m.Released) AS ys
        |WHERE N = 'Tom Hanks'
        |UNWIND ys AS y
        |RETURN y ORDER BY y""".stripMargin)
    assert(r.map(_.getInt(0)) == Seq(1993, 1995, 1998))
  }

  test("UNWIND a list literal multiplies rows") {
    val r = rows(
      """MATCH (p:Person) WHERE p.Name = 'Tom Hanks'
        |UNWIND [1, 2, 3] AS k
        |RETURN p.Name AS N, k ORDER BY k""".stripMargin)
    assert(r.map(x => (x.getString(0), x.getInt(1))) ==
      Seq(("Tom Hanks", 1), ("Tom Hanks", 2), ("Tom Hanks", 3)))
  }

  test("UNWIND of an empty collect yields no rows (not nulls)") {
    val r = rows(
      """MATCH (p:Person) WHERE p.Name = 'NoSuch'
        |WITH collect(p.Name) AS names
        |UNWIND names AS n RETURN n""".stripMargin)
    assert(r.isEmpty)
  }

  test("UNWIND rejections: non-list input, rebound alias, MATCH after") {
    intercept[CypherTypeException](rows(
      "MATCH (p:Person) UNWIND p.Name AS x RETURN x"))
    intercept[CypherBindingException](rows(
      "MATCH (p:Person) UNWIND [1,2] AS p RETURN p"))
    intercept[CypherNotSupportedException](rows(
      "MATCH (p:Person) UNWIND [1,2] AS x MATCH (m:Movie) RETURN x"))
    intercept[CypherNotSupportedException](rows(
      "UNWIND [1,2] AS x RETURN x")) // still no standalone UNWIND
  }

  test("count(DISTINCT ...) parity intact; collect forbids nesting") {
    intercept[CypherNotSupportedException](rows(
      "MATCH (p:Person) RETURN collect(count(p.id)) AS xs"))
  }

  // --------------------------------------------- variable-length paths

  test("[*1..2] unions both path lengths (FOLLOWS chain)") {
    // follows: p5->p1, p5->p2, p1->p2. From Jessica (p5):
    // length 1 → Tom Hanks, Meg Ryan; length 2 → p5->p1->p2 = Meg Ryan.
    val r = rows(
      """MATCH (a:Person)-[:FOLLOWS*1..2]->(b:Person)
        |WHERE a.Name = 'Jessica Thompson'
        |RETURN b.Name AS N ORDER BY N""".stripMargin)
    assert(r.map(_.getString(0)) ==
      Seq("Meg Ryan", "Meg Ryan", "Tom Hanks"))
  }

  test("[*2] is exactly two hops") {
    val r = rows(
      """MATCH (a:Person)-[:FOLLOWS*2]->(b:Person)
        |RETURN a.Name AS A, b.Name AS B""".stripMargin)
    assert(r.map(x => (x.getString(0), x.getString(1))) ==
      Seq(("Jessica Thompson", "Meg Ryan")))
  }

  test("aggregation runs over the unioned match set, not per length") {
    val r = rows(
      """MATCH (a:Person)-[:FOLLOWS*1..2]->(b:Person)
        |RETURN b.Name AS N, count(a.id) AS C ORDER BY N""".stripMargin)
    // targets: p1 (from p5), p2 (from p5, p1, and p5 via p1)
    assert(r.map(x => (x.getString(0), x.getLong(1))) ==
      Seq(("Meg Ryan", 3L), ("Tom Hanks", 1L)))
  }

  test("lengths that cannot resolve against the schema contribute nothing") {
    // Person-[*1..2]->Movie: length 1 can be ACTED_IN/REVIEWED/DIRECTED
    // (ambiguous without a verb → that branch is a binding error and is
    // dropped); with the verb given, length 2 has no Movie->Movie edge
    // so only length 1 survives.
    val r = rows(
      """MATCH (p:Person)-[:ACTED_IN*1..2]->(m:Movie)
        |WHERE p.Name = 'Tom Hanks' RETURN m.Title AS T ORDER BY T""".stripMargin)
    assert(r.map(_.getString(0)) ==
      Seq("Apollo 13", "Sleepless in Seattle", "You've Got Mail"))
  }

  test("no length resolves → the binding error surfaces") {
    intercept[CypherBindingException](rows(
      "MATCH (m:Movie)-[:FOLLOWS*1..2]->(p:Person) RETURN p.Name AS N"))
  }

  test("per-path relationship uniqueness holds within an unrolled length") {
    // p5->p1->p2 is fine (distinct edges); no path may reuse one edge —
    // with only 3 edges, [*3] must produce nothing (no 3-edge trail)
    val r = rows(
      """MATCH (a:Person)-[:FOLLOWS*3]->(b:Person)
        |RETURN a.Name AS A, b.Name AS B""".stripMargin)
    assert(r.isEmpty)
  }

  test("var-length rejections: named rel, unbounded, zero, over-cap") {
    intercept[CypherNotSupportedException](rows(
      "MATCH (a:Person)-[f:FOLLOWS*1..2]->(b:Person) RETURN a.Name AS N"))
    intercept[CypherNotSupportedException](rows(
      "MATCH (a:Person)-[:FOLLOWS*]->(b:Person) RETURN a.Name AS N"))
    intercept[CypherNotSupportedException](rows(
      "MATCH (a:Person)-[:FOLLOWS*1..]->(b:Person) RETURN a.Name AS N"))
    intercept[CypherNotSupportedException](rows(
      "MATCH (a:Person)-[:FOLLOWS*0..2]->(b:Person) RETURN a.Name AS N"))
    intercept[CypherNotSupportedException](rows(
      "MATCH (a:Person)-[:FOLLOWS*1..9]->(b:Person) RETURN a.Name AS N"))
  }

  test("unlabeled endpoint whose label varies by length is rejected") {
    // (p5)-[*1..2]-> x : length 1 x could be Person (FOLLOWS); length 2
    // interior Person then x Person or Movie — if any branch disagrees
    // on x's label the union is refused with a clear message
    val e = intercept[CypherException](rows(
      """MATCH (a:Person)-[*1..2]->(x)
        |WHERE a.Name = 'Jessica Thompson'
        |RETURN x.Name AS N""".stripMargin))
    assert(e.getMessage.toLowerCase.contains("label") ||
      e.getMessage.toLowerCase.contains("ambiguous"))
  }
}
