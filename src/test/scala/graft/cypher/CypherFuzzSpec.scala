package graft.cypher

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/**
 * Query-level differential fuzzer (round 12): generates seed-pinned
 * random Cypher queries over the movie fixture — 1-3 typed hops walked
 * along the schema's edge catalog, optional WHERE, plain/DISTINCT or
 * implicitly-grouped aggregate projections, optional total ORDER BY +
 * LIMIT — and mirrors each to hand-built Spark SQL over temp views of
 * the SAME fixture tables. The two results must agree as multisets.
 *
 * This is the query-level face of ParserRobustnessSpec: the parser
 * fuzz proves no crash, this proves no WRONG ANSWER on planner
 * compositions no hand-written oracle covers (join order × direction ×
 * relationship-uniqueness inequality × grouping). Failures print the
 * seed, index, and both query texts for one-line reproduction.
 */
class CypherFuzzSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val Seed = 20260815
  private val N = 220

  // one generated query: the cypher text and its SQL mirror
  private final case class Gen(cypher: String, sql: String)

  // --- schema facts the generator walks -------------------------------
  // (verb, fromLabel, toLabel, table)
  private val edges = Seq(
    ("ACTED_IN", "Person", "Movie", "acted_in"),
    ("REVIEWED", "Person", "Movie", "reviewed"),
    ("DIRECTED", "Person", "Movie", "directed"),
    ("FOLLOWS", "Person", "Person", "follows"),
    ("KNOWS", "Person", "Person", "knows"))
  private val nodeTable = Map("Person" -> "person", "Movie" -> "movie")
  // label → (prop, isNumeric, isNullable)
  private val props = Map(
    "Person" -> Seq(("Name", false, false), ("Born", true, true)),
    "Movie" -> Seq(("Title", false, false), ("Tagline", false, true),
      ("Released", true, false)))

  /** Var-length arm: `(a:Person)-[:V*1..h]->(b:L)` over a self-type or
    * Person→Movie verb, mirrored as a UNION ALL of fixed-hop chains
    * with Cypher's all-pairs same-verb uniqueness inequality per
    * length. Projections/predicates touch ENDPOINTS only (interior
    * aliases differ per length). */
  private def genVarLen(rnd: Random): Gen = {
    val e = Seq(("FOLLOWS", "Person", "Person", "follows"),
      ("KNOWS", "Person", "Person", "knows"))(rnd.nextInt(2))
    val h = 2 + rnd.nextInt(2) // *1..2 or *1..3
    val endLbl = e._3
    // endpoint predicate (numeric, total) with probability 1/2
    val pred =
      if (rnd.nextBoolean()) {
        val v = 1950 + rnd.nextInt(16)
        Some((s"a.Born >= $v", v))
      } else None
    val aggMode = rnd.nextBoolean()
    val (retCy, retSqlSel, groupSql) =
      if (aggMode) ("a.Name AS nm, count(*) AS c",
        "SELECT nm, count(*) AS c", " GROUP BY nm")
      else ("a.Name AS nm, b.Name AS bn",
        "SELECT nm, bn", "")
    val cy = s"MATCH (a:Person)-[:${e._1}*1..$h]->(b:$endLbl)" +
      pred.map(p => s" WHERE ${p._1}").getOrElse("") +
      s" RETURN $retCy"
    // one SELECT per length: chain of L edge copies, all-pairs
    // inequality, endpoint columns aliased uniformly
    val lens = (1 to h).map { len =>
      val joins = new StringBuilder(s"${nodeTable("Person")} a")
      (1 to len).foreach { j =>
        val prev = if (j == 1) "a" else s"m${j - 1}"
        joins.append(s" JOIN ${e._4} e$j ON e$j._vertexId = $prev.id")
        val nn = if (j == len) "b" else s"m$j"
        joins.append(
          s" JOIN ${nodeTable(endLbl)} $nn ON $nn.id = e$j._sink")
      }
      val ineq = for {
        i <- 1 to len; j <- (i + 1) to len
      } yield s"NOT (e$i._vertexId = e$j._vertexId AND " +
        s"e$i._sink = e$j._sink)"
      val w = (ineq ++ pred.map(_._1).toSeq).mkString(" AND ")
      s"SELECT a.Name AS nm, b.Name AS bn FROM ${joins.result()}" +
        (if (w.nonEmpty) s" WHERE $w" else "")
    }
    Gen(cy, s"$retSqlSel FROM (${lens.mkString(" UNION ALL ")}) u" +
      groupSql)
  }

  private def genOne(rnd: Random): Gen = {
    if (rnd.nextInt(100) < 20) return genVarLen(rnd)
    // ---- pattern: a 1-3 hop walk over the edge catalog --------------
    val hops = 1 + rnd.nextInt(3)
    var label = "Person" // every edge touches Person; Movie is a sink
    val nodeAliases = scala.collection.mutable.ArrayBuffer(("n0", label))
    val relAliases = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String, Boolean)] // (alias, table, verb, out)
    val patSb = new StringBuilder(s"(n0:$label)")
    val joinSb = new StringBuilder(s"${nodeTable(label)} n0")
    (1 to hops).foreach { i =>
      val cands = edges.filter(e => e._2 == label || e._3 == label)
      val e = cands(rnd.nextInt(cands.size))
      // walking "out" needs current = fromLabel; self-type edges pick
      // a direction at random
      val out =
        if (e._2 == label && e._3 == label) rnd.nextBoolean()
        else e._2 == label
      val next = if (out) e._3 else e._2
      val na = s"n$i"; val ra = s"r$i"
      patSb.append(
        if (out) s"-[$ra:${e._1}]->($na:$next)"
        else s"<-[$ra:${e._1}]-($na:$next)")
      val prev = s"n${i - 1}"
      // edge row: _vertexId = source node id, _sink = sink node id.
      // Join the edge against the ALREADY-BOUND prev alias first, then
      // bind the new node on the edge's other end — walking "in" means
      // prev is the edge's sink and the new node its source.
      if (out) {
        joinSb.append(s" JOIN ${e._4} $ra ON $ra._vertexId = $prev.id")
        joinSb.append(
          s" JOIN ${nodeTable(next)} $na ON $na.id = $ra._sink")
      } else {
        joinSb.append(s" JOIN ${e._4} $ra ON $ra._sink = $prev.id")
        joinSb.append(
          s" JOIN ${nodeTable(next)} $na ON $na.id = $ra._vertexId")
      }
      nodeAliases += ((na, next))
      relAliases += ((ra, e._4, e._1, out))
      label = next
    }
    // Cypher relationship-uniqueness: same-verb rel pairs are distinct
    val ineq = for {
      i <- relAliases.indices; j <- (i + 1) until relAliases.size
      if relAliases(i)._3 == relAliases(j)._3
    } yield {
      val a = relAliases(i)._1; val b = relAliases(j)._1
      s"NOT ($a._vertexId = $b._vertexId AND $a._sink = $b._sink)"
    }

    // ---- WHERE --------------------------------------------------------
    def onePred(): (String, String) = {
      val (na, lbl) = nodeAliases(rnd.nextInt(nodeAliases.size))
      val (p, numeric, nullable) = props(lbl)(rnd.nextInt(props(lbl).size))
      rnd.nextInt(4) match {
        case 0 if numeric =>
          val op = Seq(">", ">=", "<", "<=", "=", "<>")(rnd.nextInt(6))
          val v = if (p == "Born") 1950 + rnd.nextInt(16)
                  else 1992 + rnd.nextInt(8)
          (s"$na.$p $op $v", s"$na.$p $op $v")
        case 1 if nullable =>
          val not = if (rnd.nextBoolean()) " NOT" else ""
          (s"$na.$p IS$not NULL", s"$na.$p IS$not NULL")
        case 2 if !numeric =>
          val c = Seq("T", "M", "K", "J", "S")(rnd.nextInt(5))
          (s"$na.$p STARTS WITH '$c'", s"$na.$p LIKE '$c%'")
        case _ if numeric =>
          val v = if (p == "Born") 1950 + rnd.nextInt(16)
                  else 1992 + rnd.nextInt(8)
          (s"$na.$p >= $v", s"$na.$p >= $v")
        case _ =>
          (s"$na.$p IS NOT NULL", s"$na.$p IS NOT NULL")
      }
    }
    val nPreds = rnd.nextInt(3) // 0, 1 or 2
    val preds = Seq.fill(nPreds)(onePred())
    val conj = if (rnd.nextBoolean()) " AND " else " OR "
    val cyWhereCore =
      if (preds.isEmpty) "" else preds.map(_._1).mkString(conj)
    val sqlWhereCore =
      if (preds.isEmpty) "" else
        "(" + preds.map(_._2).mkString(conj) + ")"
    val sqlWhereAll = (ineq ++ Option(sqlWhereCore).filter(_.nonEmpty))
      .mkString(" AND ")

    // ---- projection ----------------------------------------------------
    def pickProp(): (String, String, Boolean) = {
      val (na, lbl) = nodeAliases(rnd.nextInt(nodeAliases.size))
      val (p, numeric, _) = props(lbl)(rnd.nextInt(props(lbl).size))
      (na, p, numeric)
    }
    val aggMode = rnd.nextBoolean()
    var plainCols: Seq[String] = Seq.empty // sortable output aliases
    val (retCy, retSql, groupSql) = if (!aggMode) {
      val k = 1 + rnd.nextInt(3)
      val items = (0 until k).map { i =>
        val (na, p, _) = pickProp()
        (s"$na.$p AS c$i", s"$na.$p AS c$i")
      }
      val distinct = rnd.nextBoolean()
      val d1 = if (distinct) "DISTINCT " else ""
      if (!distinct) plainCols = (0 until k).map(i => s"c$i")
      (d1 + items.map(_._1).mkString(", "),
        d1 + items.map(_._2).mkString(", "), "")
    } else {
      val nKeys = rnd.nextInt(2) // 0 or 1 group keys
      val keys = (0 until nKeys).map { i =>
        val (na, p, _) = pickProp()
        (s"$na.$p AS g$i", s"$na.$p AS g$i", s"$na.$p")
      }
      val nAggs = 1 + rnd.nextInt(2)
      val aggs = (0 until nAggs).map { i =>
        val (na, p, numeric) = pickProp()
        rnd.nextInt(5) match {
          case 0 => (s"count(*) AS a$i", s"count(*) AS a$i")
          case 1 => (s"count($na.$p) AS a$i", s"count($na.$p) AS a$i")
          case 2 if numeric =>
            (s"sum($na.$p) AS a$i", s"sum($na.$p) AS a$i")
          case 3 if numeric =>
            (s"round(avg($na.$p), 6) AS a$i",
              s"round(avg($na.$p), 6) AS a$i")
          case _ =>
            val f = if (rnd.nextBoolean()) "min" else "max"
            (s"$f($na.$p) AS a$i", s"$f($na.$p) AS a$i")
        }
      }
      ((keys.map(_._1) ++ aggs.map(_._1)).mkString(", "),
        (keys.map(_._2) ++ aggs.map(_._2)).mkString(", "),
        if (keys.isEmpty) "" else
          " GROUP BY " + keys.map(_._3).mkString(", "))
    }

    // ---- OPTIONAL MATCH arm (round 12): one optional hop off the
    // last node; its WHERE rides the SQL LEFT JOIN's ON (the pre-join
    // contract). The optional side is (edge JOIN node [WHERE pred]) as
    // a unit subselect, so an unmatched edge nulls the whole side.
    val optArm = rnd.nextInt(100) < 35
    val (optCy, optSql, optProps) = if (!optArm) ("", "", Seq.empty)
    else {
      val cands = edges.filter(e => e._2 == label || e._3 == label)
      val e = cands(rnd.nextInt(cands.size))
      val out =
        if (e._2 == label && e._3 == label) rnd.nextBoolean()
        else e._2 == label
      val next = if (out) e._3 else e._2
      val prev = s"n${hops}"
      val pat =
        if (out) s"($prev)-[ro:${e._1}]->(no:$next)"
        else s"($prev)<-[ro:${e._1}]-(no:$next)"
      // optional-side predicate on the NEW node (numeric, total)
      val (wp, wNum, _) = props(next).filter(_._2) match {
        case Seq() => ("", false, "")
        case ps =>
          val (p2, _, _) = ps(rnd.nextInt(ps.size))
          val v = if (p2 == "Born") 1950 + rnd.nextInt(16)
                  else 1992 + rnd.nextInt(8)
          (s"no.$p2 >= $v", true, p2)
      }
      val usePred = wNum && rnd.nextBoolean()
      val cyTxt = s" OPTIONAL MATCH $pat" +
        (if (usePred) s" WHERE $wp" else "")
      val exposed = props(next).map(_._1)
      val sub = "SELECT ro._vertexId AS ro_src, ro._sink AS ro_snk" +
        exposed.map(p2 => s", no.$p2 AS opt_$p2").mkString +
        s" FROM ${e._4} ro JOIN ${nodeTable(next)} no ON no.id = " +
        (if (out) "ro._sink" else "ro._vertexId") +
        (if (usePred) s" WHERE ${wp.replace("no.", "no.")}" else "")
      val onKey = if (out) "opt.ro_src" else "opt.ro_snk"
      val sqlTxt = s" LEFT JOIN ($sub) opt ON $onKey = $prev.id"
      (cyTxt, sqlTxt, exposed)
    }

    val cy = new StringBuilder(s"MATCH ${patSb.result()}")
    if (cyWhereCore.nonEmpty) cy.append(s" WHERE $cyWhereCore")
    cy.append(optCy)
    // project at least one optional-side prop when the arm is active
    val (retCy2, retSql2) = if (!optArm) (retCy, retSql) else {
      val p2 = optProps(rnd.nextInt(optProps.size))
      if (retCy.contains("count(") || retCy.contains("sum(") ||
          retCy.contains("min(") || retCy.contains("max(") ||
          retCy.contains("avg("))
        (s"count(no.$p2) AS oc, " + retCy,
          s"count(opt_$p2) AS oc, " + retSql)
      else if (retCy.startsWith("DISTINCT "))
        ("DISTINCT " + s"no.$p2 AS oc, " +
            retCy.stripPrefix("DISTINCT "),
          "DISTINCT " + s"opt_$p2 AS oc, " +
            retSql.stripPrefix("DISTINCT "))
      else
        (s"no.$p2 AS oc, " + retCy, s"opt_$p2 AS oc, " + retSql)
    }
    cy.append(s" RETURN $retCy2")
    val sql = new StringBuilder(
      s"SELECT $retSql2 FROM ${joinSb.result()}$optSql")
    if (sqlWhereAll.nonEmpty) sql.append(s" WHERE $sqlWhereAll")
    sql.append(groupSql)
    // ---- ORDER BY all + LIMIT arm (plain non-DISTINCT projections
    // only): a total VALUE order makes the limited multiset
    // deterministic on both sides
    if (!optArm && plainCols.nonEmpty && rnd.nextInt(100) < 30) {
      val k = 1 + rnd.nextInt(6)
      cy.append(s" ORDER BY ${plainCols.mkString(", ")} LIMIT $k")
      sql.append(s" ORDER BY ${plainCols.mkString(", ")} LIMIT $k")
    }
    Gen(cy.result(), sql.result())
  }

  /** Updating-query arm (round 13): terminal SET / DELETE / MERGE
    * shapes whose result is the target table's NEW SNAPSHOT, mirrored
    * as plain SQL over the SAME fixture views — CASE for updates,
    * NOT-matched filters for deletes, UNION ALL for created rows.
    * Every query recompiles from the immutable fixture, so each
    * generated query is its own state replay. Null predicate values
    * follow Cypher's no-match contract (coalesce(pred, false)). */
  private def genUpdating(rnd: Random): Gen = rnd.nextInt(6) match {
    case 0 => // SET node prop: matched rows read OLD values
      val v = 1950 + rnd.nextInt(16)
      val d = 1 + rnd.nextInt(5)
      Gen(s"MATCH (p:Person) WHERE p.Born >= $v SET p.Born = p.Born + $d",
        s"SELECT id, Name, CASE WHEN coalesce(Born >= $v, false) " +
        s"THEN Born + $d ELSE Born END AS Born FROM person")
    case 1 => // SET edge prop through the pattern (pair-keyed)
      val v = 2005 + rnd.nextInt(12)
      val d = 1 + rnd.nextInt(4)
      Gen(s"MATCH (a:Person)-[k:KNOWS]->(b:Person) " +
        s"WHERE k.Since >= $v SET k.Since = k.Since + $d",
        s"SELECT _vertexId, _sink, CASE WHEN coalesce(Since >= $v, " +
        s"false) THEN Since + $d ELSE Since END AS Since FROM knows")
    case 2 => // DELETE node: snapshot minus matched rows
      val v = 1950 + rnd.nextInt(16)
      Gen(s"MATCH (p:Person) WHERE p.Born >= $v DETACH DELETE p",
        s"SELECT id, Name, Born FROM person " +
        s"WHERE NOT coalesce(Born >= $v, false)")
    case 3 => // DELETE edge matched through an endpoint predicate
      val v = 1950 + rnd.nextInt(16)
      Gen(s"MATCH (a:Person)-[k:KNOWS]->(b:Person) " +
        s"WHERE a.Born >= $v DELETE k",
        s"SELECT k._vertexId, k._sink, k.Since FROM knows k " +
        s"WHERE NOT EXISTS (SELECT 1 FROM person a " +
        s"WHERE a.id = k._vertexId AND coalesce(a.Born >= $v, false))")
    case 4 => // MERGE matched branch: ON MATCH SET over fed ids
      val v = 1950 + rnd.nextInt(16)
      val d = 1900 + rnd.nextInt(50)
      Gen(s"MATCH (p:Person) WHERE p.Born >= $v WITH p.id AS k " +
        s"MERGE (q:Person {id: k}) ON MATCH SET q.Born = $d",
        s"SELECT id, Name, CASE WHEN coalesce(Born >= $v, false) " +
        s"THEN $d ELSE Born END AS Born FROM person")
    case _ => // MERGE created branch: absent ids insert stamped rows
      val v = 1992 + rnd.nextInt(8)
      Gen(s"MATCH (m:Movie) WHERE m.Released >= $v WITH m.Title AS t " +
        s"MERGE (q:Person {id: t}) ON CREATE SET q.Name = t",
        s"SELECT id, Name, Born FROM person UNION ALL " +
        s"SELECT Title AS id, Title AS Name, CAST(NULL AS INT) AS Born " +
        s"FROM movie WHERE Released >= $v")
  }

  /** Round-13 surface arm: label predicates, || concatenation,
    * IN over range(), multi-value simple CASE — each mirrored with
    * plain SQL equivalents over the fixture views. */
  private def genSurface13(rnd: Random): Gen = {
    val e = edges(rnd.nextInt(edges.size))
    val endLbl = e._3
    val endProp = if (endLbl == "Movie") "Title" else "Name"
    // WHERE arm: IN range / label predicate / none
    val (wCy, wSql) = rnd.nextInt(3) match {
      case 0 =>
        val lo = 1950 + rnd.nextInt(8); val hi = lo + rnd.nextInt(10)
        (s" WHERE a.Born IN range($lo, $hi)",
          s" WHERE a.Born BETWEEN $lo AND $hi")
      case 1 =>
        val (lbl, born) =
          if (rnd.nextBoolean()) ("Boomer", 1956) else ("Sixties", 1961)
        (s" WHERE a:$lbl", s" WHERE coalesce(a.Born = $born, false)")
      case _ => ("", "")
    }
    // projection items: concat, label-pred boolean, multi-value CASE
    val items = Vector.newBuilder[(String, String)]
    items += ((s"a.Name || '~' || b.$endProp AS cc",
      s"a.Name || '~' || b.$endProp AS cc"))
    if (rnd.nextBoolean())
      items += (("a:Boomer AS lp", "(a.Born = 1956) AS lp"))
    if (rnd.nextBoolean()) {
      val v1 = "Tom Hanks"; val v2 = "Meg Ryan"
      items += ((s"CASE a.Name WHEN '$v1', '$v2' THEN 1 ELSE 0 END AS k",
        s"CASE WHEN a.Name IN ('$v1', '$v2') THEN 1 ELSE 0 END AS k"))
    }
    val its = items.result()
    val joinOn =
      s"${e._4} r ON r._vertexId = a.id JOIN ${nodeTable(endLbl)} b " +
      "ON b.id = r._sink"
    Gen(
      s"MATCH (a:Person)-[:${e._1}]->(b:$endLbl)$wCy " +
        s"RETURN ${its.map(_._1).mkString(", ")}",
      s"SELECT ${its.map(_._2).mkString(", ")} FROM person a JOIN " +
        joinOn + wSql)
  }

  /** Late-round-13 surface arm: generic dot access on computed maps,
    * elementId(), multi-pattern COUNT{}, 2-hop quantified-group chains
    * (with optional interior sub-label), and CALL db.labels() — each
    * vs a hand-built SQL / VALUES mirror. */
  private def genSurface13b(rnd: Random): Gen = rnd.nextInt(6) match {
    case 4 => // label negation + != inequality + entity subscript
      val (neg, negSql) =
        if (rnd.nextBoolean()) ("Boomer", "(a.Born IS NULL OR NOT (a.Born = 1956))")
        else ("Sixties", "(a.Born IS NULL OR NOT (a.Born = 1961))")
      val yr = 1950 + rnd.nextInt(15)
      Gen(
        s"MATCH (a:Person&!$neg) WHERE a.Born != $yr " +
          "RETURN a['Name'] AS nm",
        s"SELECT a.Name AS nm FROM person a WHERE $negSql " +
          s"AND a.Born <> $yr")
    case 5 => // extended simple CASE + trim specifier
      val cut = 1955 + rnd.nextInt(8)
      val ch = Seq("T", "n", "a")(rnd.nextInt(3))
      Gen(
        s"MATCH (a:Person) RETURN " +
          s"CASE a.Born WHEN IS NULL THEN 'u' WHEN < $cut THEN 'lo' " +
          "ELSE 'hi' END AS era, " +
          s"trim(LEADING '$ch' FROM a.Name) AS tn",
        s"SELECT CASE WHEN a.Born IS NULL THEN 'u' " +
          s"WHEN a.Born < $cut THEN 'lo' ELSE 'hi' END AS era, " +
          s"ltrim('$ch', a.Name) AS tn FROM person a") // SQL arg order: (trimStr, str)
    case 0 => // dot access chains + properties() + elementId
      val e = edges(rnd.nextInt(edges.size))
      val endLbl = e._3
      val endProp = if (endLbl == "Movie") "Title" else "Name"
      Gen(
        s"MATCH (a:Person)-[:${e._1}]->(b:$endLbl) RETURN " +
          s"{w: {n: a.Name}}.w.n AS dn, properties(b).$endProp AS pp, " +
          "elementId(a) AS eid",
        s"SELECT a.Name AS dn, b.$endProp AS pp, " +
          "'Person:' || a.id AS eid " +
          s"FROM person a JOIN ${e._4} r ON r._vertexId = a.id " +
          s"JOIN ${nodeTable(endLbl)} b ON b.id = r._sink")
    case 1 => // multi-pattern COUNT{}: shared m across two parts
      val v = Seq(("ACTED_IN", "acted_in"),
        ("DIRECTED", "directed"))(rnd.nextInt(2))
      Gen(
        s"MATCH (p:Person) RETURN p.Name AS nm, COUNT { " +
          s"(p)-[:${v._1}]->(m:Movie), " +
          "(:Person {Name: 'Jessica Thompson'})-[:REVIEWED]->(m) } AS n",
        "SELECT p.Name AS nm, coalesce((SELECT count(*) " +
          s"FROM ${v._2} r JOIN reviewed rv ON rv._sink = r._sink " +
          "JOIN person j ON j.id = rv._vertexId " +
          "WHERE j.Name = 'Jessica Thompson' " +
          "AND r._vertexId = p.id), 0) AS n FROM person p")
    case 2 => // 2-hop quantified group chain, optional interior label
      val v = Seq(("KNOWS", "knows"), ("FOLLOWS", "follows"))(
        rnd.nextInt(2))
      val (lbl, sqlW) = rnd.nextInt(3) match {
        case 0 => (":Boomer", " WHERE y.Born = 1956")
        case 1 => (":Sixties", " WHERE y.Born = 1961")
        case _ => ("", "")
      }
      Gen(
        s"MATCH (a:Person) ((x)-[:${v._1}]->(y$lbl)-[:${v._1}]->(z))" +
          "{1,1} (b:Person) RETURN a.Name AS an, b.Name AS bn",
        "SELECT a.Name AS an, b.Name AS bn FROM person a " +
          s"JOIN ${v._2} r1 ON r1._vertexId = a.id " +
          "JOIN person y ON y.id = r1._sink " +
          s"JOIN ${v._2} r2 ON r2._vertexId = y.id " +
          s"JOIN person b ON b.id = r2._sink$sqlW")
    case _ => // CALL db.labels(): static frame vs the VALUES mirror
      val c = Seq("o", "e", "i", "s")(rnd.nextInt(4))
      Gen(
        s"CALL db.labels() YIELD label WHERE label CONTAINS '$c' " +
          "RETURN label",
        "SELECT label FROM (VALUES ('Boomer'), ('Movie'), " +
          "('NinetiesClassic'), ('Person'), ('Sixties')) t(label) " +
          s"WHERE label LIKE '%$c%'")
  }

  /** Round-14 surface arm: dynamic subscripts, named-timezone
    * temporals, IS NULL over alternation branches, correlated CALL
    * UNION, per-edge QPP uniqueness, full-expression CASE
    * alternatives — each vs a Spark SQL mirror. */
  private def genSurface14(rnd: Random): Gen = rnd.nextInt(8) match {
    case 6 => // LET + FILTER + OFFSET + NULLS LAST pipeline
      val d = 1 + rnd.nextInt(5)
      val cut = 1994 + rnd.nextInt(4)
      val off = rnd.nextInt(3)
      Gen(
        s"MATCH (a:Person)-[:ACTED_IN]->(m:Movie) LET yr = " +
          s"m.Released + $d FILTER yr > $cut RETURN a.Name AS nm, yr " +
          s"ORDER BY yr NULLS LAST, nm OFFSET $off LIMIT 3",
        s"SELECT a.Name AS nm, m.Released + $d AS yr FROM person a " +
          "JOIN acted_in r ON r._vertexId = a.id " +
          s"JOIN movie m ON m.id = r._sink WHERE m.Released + $d > $cut " +
          s"ORDER BY yr, nm LIMIT 3 OFFSET $off")
    case 7 => // SHORTEST 2 over bounded KNOWS vs ranked path union
      val src = Seq("Tom Hanks", "Meg Ryan", "Kevin Bacon")(rnd.nextInt(3))
      Gen(
        s"MATCH p = SHORTEST 2 (a:Person)-[:KNOWS*1..3]->(b:Person) " +
          s"WHERE a.Name = '$src' RETURN b.Name AS bn, length(p) AS l",
        "WITH k AS (SELECT _vertexId s, _sink d FROM knows), " +
          "p1 AS (SELECT s, d, 1 AS l FROM k), " +
          "p2 AS (SELECT a.s, b.d, 2 AS l FROM k a JOIN k b " +
          "ON b.s = a.d AND NOT(a.s = b.s AND a.d = b.d)), " +
          "p3 AS (SELECT a.s, c.d, 3 AS l FROM k a " +
          "JOIN k b ON b.s = a.d JOIN k c ON c.s = b.d " +
          "WHERE NOT(a.s = b.s AND a.d = b.d) " +
          "AND NOT(a.s = c.s AND a.d = c.d) " +
          "AND NOT(b.s = c.s AND b.d = c.d)), " +
          "u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2 " +
          "UNION ALL SELECT * FROM p3), " +
          "r AS (SELECT s, d, l, row_number() OVER (PARTITION BY s, d " +
          "ORDER BY l) rk FROM u) " +
          "SELECT pb.Name AS bn, CAST(l AS BIGINT) AS l " +
          "FROM r JOIN person pa ON pa.id = r.s " +
          "JOIN person pb ON pb.id = r.d " +
          s"WHERE rk <= 2 AND pa.Name = '$src'")
    case 0 => // dynamic map subscript, data-driven key + null arm
      val lo = rnd.nextInt(100); val hi = 100 + rnd.nextInt(100)
      val yr = Seq(1956, 1961)(rnd.nextInt(2))
      Gen(
        s"MATCH (a:Person) WITH a, {lo: $lo, hi: $hi} AS m RETURN " +
          s"a.Name AS nm, m[CASE WHEN a.Born = $yr THEN 'hi' " +
          "WHEN a.Born IS NULL THEN 'nope' ELSE 'lo' END] AS v",
        s"SELECT a.Name AS nm, CASE WHEN a.Born = $yr THEN $hi " +
          s"WHEN a.Born IS NULL THEN NULL ELSE $lo END AS v " +
          "FROM person a")
    case 1 => // named-timezone datetime literal + map form across DST
      val d = 8 + rnd.nextInt(5)   // Mar 8-12 2024; DST begins Mar 10
      val h = Seq(0, 1, 3, 4, 5)(rnd.nextInt(5)) // skip the 02:xx gap
      val zone = Seq("America/New_York", "Europe/Berlin",
        "Asia/Tokyo")(rnd.nextInt(3))
      Gen(
        f"RETURN datetime('2024-03-$d%02dT$h%02d:30:00[$zone]') AS t1, " +
          s"datetime({year: 2024, month: 3, day: $d, hour: $h, " +
          s"minute: 30, timezone: '$zone'}) AS t2",
        f"SELECT to_utc_timestamp(timestamp'2024-03-$d%02d " +
          f"$h%02d:30:00', '$zone') AS t1, " +
          f"to_utc_timestamp(timestamp'2024-03-$d%02d $h%02d:30:00', " +
          f"'$zone') AS t2")
    case 2 => // IS [NOT] NULL over a one-branch-only property
      val not = rnd.nextBoolean()
      val (p, cy, sq) =
        if (rnd.nextBoolean()) ("Rating", "r.Rating", "r.Rating")
        else ("Roles", "r.Roles", "r.Roles")
      val ratingSide = p == "Rating"
      val uni =
        if (ratingSide)
          "SELECT _vertexId, _sink, NULL AS Rating FROM acted_in " +
            "UNION ALL SELECT _vertexId, _sink, Rating FROM reviewed"
        else
          "SELECT _vertexId, _sink, Roles FROM acted_in " +
            "UNION ALL SELECT _vertexId, _sink, NULL AS Roles " +
            "FROM reviewed"
      Gen(
        s"MATCH (a:Person)-[r:ACTED_IN|REVIEWED]->(m:Movie) " +
          s"WHERE $cy IS ${if (not) "NOT " else ""}NULL " +
          "RETURN a.Name AS nm, m.Title AS t",
        s"SELECT a.Name AS nm, m.Title AS t FROM person a " +
          s"JOIN ($uni) r ON r._vertexId = a.id " +
          "JOIN movie m ON m.id = r._sink " +
          s"WHERE $sq IS ${if (not) "NOT " else ""}NULL")
    case 3 => // correlated CALL UNION over two distinct verbs
      val vs = rnd.shuffle(Seq(("ACTED_IN", "acted_in"),
        ("REVIEWED", "reviewed"), ("DIRECTED", "directed"))).take(2)
      Gen(
        s"MATCH (p:Person) CALL (p) { " +
          s"MATCH (p)-[:${vs(0)._1}]->(m:Movie) RETURN m.Title AS t " +
          s"UNION MATCH (p)-[:${vs(1)._1}]->(m:Movie) " +
          "RETURN m.Title AS t } RETURN p.Name AS nm, t",
        "SELECT p.Name AS nm, u.t FROM person p JOIN (" +
          s"SELECT r._vertexId, m.Title AS t FROM ${vs(0)._2} r " +
          "JOIN movie m ON m.id = r._sink " +
          s"UNION SELECT r._vertexId, m.Title FROM ${vs(1)._2} r " +
          "JOIN movie m ON m.id = r._sink) u ON u._vertexId = p.id")
    case 4 => // per-edge uniqueness in an out-in QPP meet
      val v = Seq(("KNOWS", "knows"), ("FOLLOWS", "follows"),
        ("ACTED_IN", "acted_in"))(rnd.nextInt(3))
      Gen(
        s"MATCH (a:Person) ((x)-[:${v._1}]->(y)<-[:${v._1}]-(z)){1,1} " +
          "(b:Person) RETURN a.Name AS an, b.Name AS bn",
        "SELECT a.Name AS an, b.Name AS bn FROM person a " +
          s"JOIN ${v._2} r1 ON r1._vertexId = a.id " +
          s"JOIN ${v._2} r2 ON r2._sink = r1._sink " +
          "JOIN person b ON b.id = r2._vertexId " +
          "WHERE NOT (r1._vertexId = r2._vertexId " +
          "AND r1._sink = r2._sink)")
    case _ => // full-expression bare-value CASE alternatives
      val y1 = Seq(1956, 1958, 1961)(rnd.nextInt(3))
      val y2 = Seq(1956, 1958, 1961)(rnd.nextInt(3))
      Gen(
        s"MATCH (a:Person) RETURN a.Name AS nm, " +
          s"CASE true WHEN a.Born = $y1 OR a.Born = $y2 THEN 'in' " +
          "ELSE 'out' END AS b",
        s"SELECT a.Name AS nm, CASE WHEN " +
          s"(true = (a.Born = $y1 OR a.Born = $y2)) THEN 'in' " +
          "ELSE 'out' END AS b FROM person a")
  }

  /** Round-15 surface arm: rel-list variables (size/reduce/lambda),
    * QPP group variables, SHORTEST k over UNBOUNDED ranges vs an
    * explicit ranked path union, aggregating CALL UNION branches,
    * sequential LET + property-only dynamic subscripts, and OPTIONAL
    * alternation IS NULL — each vs a Spark SQL mirror. */
  private def genSurface15(rnd: Random): Gen = rnd.nextInt(7) match {
    case 0 => // rel-list size + reduce over branch lengths
      val src = Seq("Tom Hanks", "Meg Ryan", "Kevin Bacon",
        "Rob Reiner", "Jessica Thompson")(rnd.nextInt(5))
      Gen(
        s"MATCH (a:Person)-[rs:KNOWS*1..2]->(b:Person) " +
          s"WHERE a.Name = '$src' RETURN b.Name AS bn, size(rs) AS n, " +
          "reduce(s = 0, r IN rs | s + r.Since) AS tot",
        "SELECT b.Name AS bn, 1 AS n, CAST(k1.Since AS BIGINT) AS tot " +
          "FROM person a JOIN knows k1 ON k1._vertexId = a.id " +
          s"JOIN person b ON b.id = k1._sink WHERE a.Name = '$src' " +
          "UNION ALL " +
          "SELECT b.Name, 2, CAST(k1.Since AS BIGINT) + k2.Since " +
          "FROM person a JOIN knows k1 ON k1._vertexId = a.id " +
          "JOIN knows k2 ON k2._vertexId = k1._sink " +
          "AND NOT (k1._vertexId = k2._vertexId AND k1._sink = k2._sink) " +
          s"JOIN person b ON b.id = k2._sink WHERE a.Name = '$src'")
    case 1 => // ALL lambda over the rel list filters whole branches
      val y = 2000 + rnd.nextInt(18)
      Gen(
        s"MATCH (a:Person)-[rs:KNOWS*1..2]->(b:Person) " +
          s"WHERE ALL(r IN rs WHERE r.Since >= $y) " +
          "RETURN a.Name AS an, b.Name AS bn, size(rs) AS n",
        "SELECT a.Name AS an, b.Name AS bn, 1 AS n " +
          "FROM person a JOIN knows k1 ON k1._vertexId = a.id " +
          s"JOIN person b ON b.id = k1._sink WHERE k1.Since >= $y " +
          "UNION ALL " +
          "SELECT a.Name, b.Name, 2 " +
          "FROM person a JOIN knows k1 ON k1._vertexId = a.id " +
          "JOIN knows k2 ON k2._vertexId = k1._sink " +
          "AND NOT (k1._vertexId = k2._vertexId AND k1._sink = k2._sink) " +
          "JOIN person b ON b.id = k2._sink " +
          s"WHERE k1.Since >= $y AND k2.Since >= $y")
    case 2 => // QPP group variable: per-path repetition list
      val (pred, sqlW1, sqlW2) =
        if (rnd.nextBoolean()) {
          val y = 2005 + rnd.nextInt(12)
          (s" WHERE j.Since >= $y", s" WHERE k1.Since >= $y",
            s" WHERE k1.Since >= $y AND k2.Since >= $y")
        } else ("", "", "")
      Gen(
        s"MATCH (a:Person) ((x)-[j:KNOWS]->(y)$pred){1,2} (b:Person) " +
          "RETURN a.Name AS an, b.Name AS bn, [h IN j | h.Since] AS ys",
        "SELECT a.Name AS an, b.Name AS bn, array(k1.Since) AS ys " +
          "FROM person a JOIN knows k1 ON k1._vertexId = a.id " +
          s"JOIN person b ON b.id = k1._sink$sqlW1 " +
          "UNION ALL " +
          "SELECT a.Name, b.Name, array(k1.Since, k2.Since) " +
          "FROM person a JOIN knows k1 ON k1._vertexId = a.id " +
          "JOIN knows k2 ON k2._vertexId = k1._sink " +
          "AND NOT (k1._vertexId = k2._vertexId AND k1._sink = k2._sink) " +
          s"JOIN person b ON b.id = k2._sink$sqlW2")
    case 3 => // SHORTEST k / ANY k / k GROUPS over an UNBOUNDED range
      val src = Seq("Tom Hanks", "Meg Ryan", "Kevin Bacon")(rnd.nextInt(3))
      val (kw, rankFn) = Seq(
        ("SHORTEST 2", "row_number"), ("ANY 2", "row_number"),
        ("SHORTEST 2 GROUPS", "dense_rank"))(rnd.nextInt(3))
      Gen(
        s"MATCH p = $kw (a:Person)-[:KNOWS*]->(b:Person) " +
          s"WHERE a.Name = '$src' RETURN b.Name AS bn, length(p) AS l",
        "WITH k AS (SELECT _vertexId s, _sink d FROM knows), " +
          "p1 AS (SELECT s, d, 1 AS l FROM k), " +
          "p2 AS (SELECT a.s, b.d, 2 AS l FROM k a JOIN k b " +
          "ON b.s = a.d AND NOT(a.s = b.s AND a.d = b.d)), " +
          "p3 AS (SELECT a.s, c.d, 3 AS l FROM k a " +
          "JOIN k b ON b.s = a.d JOIN k c ON c.s = b.d " +
          "WHERE NOT(a.s = b.s AND a.d = b.d) " +
          "AND NOT(a.s = c.s AND a.d = c.d) " +
          "AND NOT(b.s = c.s AND b.d = c.d)), " +
          "u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2 " +
          "UNION ALL SELECT * FROM p3), " +
          s"r AS (SELECT s, d, l, $rankFn() OVER (PARTITION BY s, d " +
          "ORDER BY l) rk FROM u) " +
          "SELECT pb.Name AS bn, CAST(l AS BIGINT) AS l " +
          "FROM r JOIN person pa ON pa.id = r.s " +
          "JOIN person pb ON pb.id = r.d " +
          s"WHERE rk <= 2 AND pa.Name = '$src'")
    case 4 => // aggregating CALL UNION branches: per-branch zero-fill
      val vs = rnd.shuffle(Seq(("ACTED_IN", "acted_in"),
        ("REVIEWED", "reviewed"), ("DIRECTED", "directed"))).take(2)
      Gen(
        s"MATCH (p:Person) CALL (p) { " +
          s"MATCH (p)-[:${vs(0)._1}]->(m:Movie) RETURN count(m) AS n " +
          s"UNION MATCH (p)-[:${vs(1)._1}]->(m:Movie) " +
          "RETURN count(m) AS n } RETURN p.Name AS nm, n",
        s"WITH b1 AS (SELECT p.id AS pid, count(r._sink) AS n " +
          s"FROM person p LEFT JOIN ${vs(0)._2} r " +
          "ON r._vertexId = p.id GROUP BY p.id), " +
          "b2 AS (SELECT p.id AS pid, count(r._sink) AS n " +
          s"FROM person p LEFT JOIN ${vs(1)._2} r " +
          "ON r._vertexId = p.id GROUP BY p.id), " +
          "u AS (SELECT * FROM b1 UNION SELECT * FROM b2) " +
          "SELECT p.Name AS nm, u.n FROM person p JOIN u ON u.pid = p.id")
    case 5 => // sequential LET + property-only dynamic subscript
      val d = 1 + rnd.nextInt(9)
      val yr = Seq(1956, 1961)(rnd.nextInt(2))
      Gen(
        s"MATCH (x:Person)-[k:KNOWS]->(y:Person) " +
          s"LET a = k.Since + $d, b = a * 2 " +
          "RETURN y.Name AS yn, b, " +
          s"k[CASE WHEN y.Born = $yr THEN 'Since' ELSE '_sink' END] AS v",
        s"SELECT y.Name AS yn, (k.Since + $d) * 2 AS b, " +
          s"CASE WHEN y.Born = $yr THEN k.Since ELSE NULL END AS v " +
          "FROM knows k JOIN person x ON x.id = k._vertexId " +
          "JOIN person y ON y.id = k._sink")
    case _ => // OPTIONAL MATCH alternation IS [NOT] NULL (null-fill)
      val not = rnd.nextBoolean()
      // REVIEWED rows all carry ratings; ACTED_IN lacks the column —
      // IS NULL counts acted rows, IS NOT NULL counts reviewed rows
      val t = if (not) "reviewed" else "acted_in"
      Gen(
        s"MATCH (p:Person) OPTIONAL MATCH " +
          "(p)-[r:ACTED_IN|REVIEWED]->(m:Movie) " +
          s"WHERE r.Rating IS ${if (not) "NOT " else ""}NULL " +
          "RETURN p.Name AS nm, count(m) AS c",
        "SELECT p.Name AS nm, (SELECT count(*) FROM " +
          s"$t r WHERE r._vertexId = p.id) AS c FROM person p")
  }

  /** Round-16 surface: multi-variable SET/REMOVE, unanchored and
    * witness-bearing k > 1 selectors, [*0..] k-levels, grouped
    * CALL-UNION aggregation. KNOWS is a DAG, so the bounded
    * p1/p2/p3 walk mirrors enumerate the k-level DP's walks exactly
    * (no node revisits exist to diverge on). */
  private def genSurface16(rnd: Random): Gen = rnd.nextInt(7) match {
    case 0 => // multi-variable SET: one clause per variable, RETURN
      // reads both updates
      val d = 1 + rnd.nextInt(50)
      Gen(
        s"MATCH (p:Person)-[r:REVIEWED]->(m:Movie) " +
          s"SET p.Born = 1900 + $d, r.Rating = r.Rating + $d " +
          "RETURN p.Name AS nm, p.Born AS b, r.Rating AS rt, " +
          "m.Title AS t",
        s"SELECT p.Name AS nm, 1900 + $d AS b, r.Rating + $d AS rt, " +
          "m.Title AS t FROM person p " +
          "JOIN reviewed r ON r._vertexId = p.id " +
          "JOIN movie m ON m.id = r._sink")
    case 1 => // multi-variable REMOVE: null writes per variable
      Gen(
        "MATCH (p:Person)-[r:REVIEWED]->(m:Movie) " +
          "REMOVE p.Born, r.Summary " +
          "RETURN p.Name AS nm, p.Born AS b, r.Summary AS s",
        "SELECT p.Name AS nm, CAST(NULL AS INT) AS b, " +
          "CAST(NULL AS STRING) AS s FROM person p " +
          "JOIN reviewed r ON r._vertexId = p.id")
    case 2 => // UNANCHORED k > 1 selector: the full pair table
      val (kw, rankFn) = Seq(
        ("SHORTEST 2", "row_number"), ("ANY 2", "row_number"),
        ("SHORTEST 2 GROUPS", "dense_rank"))(rnd.nextInt(3))
      Gen(
        s"MATCH p = $kw (a:Person)-[:KNOWS*]->(b:Person) " +
          "RETURN a.Name AS an, b.Name AS bn, length(p) AS l",
        "WITH k AS (SELECT _vertexId s, _sink d FROM knows), " +
          "p1 AS (SELECT s, d, 1 AS l FROM k), " +
          "p2 AS (SELECT a.s, b.d, 2 AS l FROM k a JOIN k b " +
          "ON b.s = a.d), " +
          "p3 AS (SELECT a.s, c.d, 3 AS l FROM k a " +
          "JOIN k b ON b.s = a.d JOIN k c ON c.s = b.d), " +
          "u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2 " +
          "UNION ALL SELECT * FROM p3), " +
          s"r AS (SELECT s, d, l, $rankFn() OVER (PARTITION BY s, d " +
          "ORDER BY l) rk FROM u) " +
          "SELECT pa.Name AS an, pb.Name AS bn, CAST(l AS BIGINT) AS l " +
          "FROM r JOIN person pa ON pa.id = r.s " +
          "JOIN person pb ON pb.id = r.d WHERE rk <= 2")
    case 3 => // witness accessors under a k > 1 selector: per-path
      // id strings from nodes(p)
      val src = Seq("Tom Hanks", "Meg Ryan", "Kevin Bacon")(rnd.nextInt(3))
      val (kw, rankFn) = Seq(("SHORTEST 2", "row_number"),
        ("SHORTEST 2 GROUPS", "dense_rank"))(rnd.nextInt(2))
      Gen(
        s"MATCH p = $kw (a:Person)-[:KNOWS*]->(b:Person) " +
          s"WHERE a.Name = '$src' RETURN b.Name AS bn, " +
          "reduce(s = '', n IN nodes(p) | s + '|' + n.id) AS path",
        "WITH k AS (SELECT _vertexId s, _sink d FROM knows), " +
          "p1 AS (SELECT s, d, 1 AS l, '|' || s || '|' || d AS path " +
          "FROM k), " +
          "p2 AS (SELECT a.s, b.d, 2 AS l, " +
          "'|' || a.s || '|' || a.d || '|' || b.d FROM k a " +
          "JOIN k b ON b.s = a.d), " +
          "p3 AS (SELECT a.s, c.d, 3 AS l, " +
          "'|' || a.s || '|' || a.d || '|' || b.d || '|' || c.d " +
          "FROM k a JOIN k b ON b.s = a.d JOIN k c ON c.s = b.d), " +
          "u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2 " +
          "UNION ALL SELECT * FROM p3), " +
          s"r AS (SELECT s, d, l, path, $rankFn() OVER " +
          "(PARTITION BY s, d ORDER BY l) rk FROM u) " +
          "SELECT pb.Name AS bn, path " +
          "FROM r JOIN person pa ON pa.id = r.s " +
          "JOIN person pb ON pb.id = r.d " +
          s"WHERE rk <= 2 AND pa.Name = '$src'")
    case 4 => // [*0..] + k: the identity row enters as level 0
      val src = Seq("Tom Hanks", "Meg Ryan", "Kevin Bacon",
        "Rob Reiner")(rnd.nextInt(4))
      Gen(
        s"MATCH p = SHORTEST 2 (a:Person)-[:KNOWS*0..]->(b:Person) " +
          s"WHERE a.Name = '$src' " +
          "RETURN b.Name AS bn, length(p) AS l",
        "WITH k AS (SELECT _vertexId s, _sink d FROM knows), " +
          "p0 AS (SELECT id AS s, id AS d, 0 AS l FROM person), " +
          "p1 AS (SELECT s, d, 1 AS l FROM k), " +
          "p2 AS (SELECT a.s, b.d, 2 AS l FROM k a JOIN k b " +
          "ON b.s = a.d), " +
          "p3 AS (SELECT a.s, c.d, 3 AS l FROM k a " +
          "JOIN k b ON b.s = a.d JOIN k c ON c.s = b.d), " +
          "u AS (SELECT * FROM p0 UNION ALL SELECT * FROM p1 " +
          "UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3), " +
          "r AS (SELECT s, d, l, row_number() OVER (PARTITION BY s, d " +
          "ORDER BY l) rk FROM u) " +
          "SELECT pb.Name AS bn, CAST(l AS BIGINT) AS l " +
          "FROM r JOIN person pa ON pa.id = r.s " +
          "JOIN person pb ON pb.id = r.d " +
          s"WHERE rk <= 2 AND pa.Name = '$src'")
    case 5 => // GROUPED aggregating CALL-UNION branch: no zero-fill,
      // zero-match invocations contribute nothing (ADVICE-r15 #2)
      val vs = rnd.shuffle(Seq(("ACTED_IN", "acted_in"),
        ("REVIEWED", "reviewed"), ("DIRECTED", "directed"))).take(2)
      Gen(
        s"MATCH (p:Person) CALL (p) { " +
          s"MATCH (p)-[:${vs(0)._1}]->(m:Movie) " +
          "RETURN m.Released AS y, count(m) AS c " +
          s"UNION ALL MATCH (p)-[:${vs(1)._1}]->(m:Movie) " +
          "RETURN m.Released AS y, count(m) AS c } " +
          "RETURN p.Name AS nm, y, c",
        s"WITH b1 AS (SELECT r._vertexId AS pid, m.Released AS y, " +
          s"count(*) AS c FROM ${vs(0)._2} r " +
          "JOIN movie m ON m.id = r._sink GROUP BY 1, 2), " +
          "b2 AS (SELECT r._vertexId AS pid, m.Released AS y, " +
          s"count(*) AS c FROM ${vs(1)._2} r " +
          "JOIN movie m ON m.id = r._sink GROUP BY 1, 2), " +
          "u AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2) " +
          "SELECT p.Name AS nm, u.y, u.c FROM person p " +
          "JOIN u ON u.pid = p.id")
    case _ => // mixed SET then REMOVE chain over distinct tables
      val d = 1 + rnd.nextInt(40)
      Gen(
        s"MATCH (p:Person)-[r:REVIEWED]->(m:Movie) " +
          s"SET p.Born = 1900 + $d " +
          "REMOVE r.Summary " +
          "RETURN p.Born AS b, r.Summary AS s, m.Title AS t",
        s"SELECT 1900 + $d AS b, CAST(NULL AS STRING) AS s, " +
          "m.Title AS t FROM reviewed r " +
          "JOIN movie m ON m.id = r._sink")
  }

  /** Round-17 surface arm: plain named-path enumeration over
    * unbounded ranges (the untrimmed k-level walk — anchored,
    * unanchored, [*0..], witness trails) and var-length type
    * alternation with per-hop verb mixing (bounded chains, the merged
    * null-filled hop namespace, unbounded shortestPath/enumeration
    * over the pooled edge frame). */
  private def genSurface17(rnd: Random): Gen = {
    // shared mirrors: KNOWS walks (depth 3) and FOLLOWS∪KNOWS walks
    // (depth 4 — p5→p1→p2→p3→p4)
    val kCte =
      "k AS (SELECT _vertexId s, _sink d FROM knows), " +
      "p1 AS (SELECT s, d, 1 AS l FROM k), " +
      "p2 AS (SELECT a.s, b.d, 2 AS l FROM k a JOIN k b ON b.s = a.d), " +
      "p3 AS (SELECT a.s, c.d, 3 AS l FROM k a " +
      "JOIN k b ON b.s = a.d JOIN k c ON c.s = b.d), " +
      "w AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2 " +
      "UNION ALL SELECT * FROM p3)"
    val uCte =
      "u AS (SELECT _vertexId s, _sink d FROM follows " +
      "UNION ALL SELECT _vertexId, _sink FROM knows), " +
      "q1 AS (SELECT s, d, 1 AS l FROM u), " +
      "q2 AS (SELECT a.s, b.d, 2 AS l FROM u a JOIN u b ON b.s = a.d), " +
      "q3 AS (SELECT a.s, c.d, 3 AS l FROM u a " +
      "JOIN u b ON b.s = a.d JOIN u c ON c.s = b.d), " +
      "q4 AS (SELECT a.s, e.d, 4 AS l FROM u a " +
      "JOIN u b ON b.s = a.d JOIN u c ON c.s = b.d " +
      "JOIN u e ON e.s = c.d), " +
      "w AS (SELECT * FROM q1 UNION ALL SELECT * FROM q2 " +
      "UNION ALL SELECT * FROM q3 UNION ALL SELECT * FROM q4)"
    rnd.nextInt(12) match {
      case 10 => // COUNT{} over an unbounded range: reachable-pair
        // counts per outer row, zero-filled
        Gen(
          "MATCH (p:Person) " +
            "RETURN p.Name AS nm, " +
            "COUNT { (p)-[:KNOWS*]->(q:Person) } AS c",
          s"WITH $kCte, " +
            "c AS (SELECT s, COUNT(DISTINCT d) AS c FROM w GROUP BY s) " +
            "SELECT p.Name AS nm, CAST(coalesce(c.c, 0) AS INT) AS c " +
            "FROM person p LEFT JOIN c ON c.s = p.id")
      case 11 => // QPP {2,}: pairs with a chain of length >= 2
        Gen(
          "MATCH (a:Person) ((x)-[:KNOWS]->(y)){2,} (b:Person) " +
            "RETURN a.Name AS an, b.Name AS bn",
          s"WITH $kCte " +
            "SELECT DISTINCT pa.Name AS an, pb.Name AS bn " +
            "FROM w JOIN person pa ON pa.id = w.s " +
            "JOIN person pb ON pb.id = w.d WHERE w.l >= 2")
      case 7 => // [*2..] bare pairs: some walk of length >= 2
        Gen(
          "MATCH (a:Person)-[:KNOWS*2..]->(b:Person) " +
            "RETURN a.Name AS an, b.Name AS bn",
          s"WITH $kCte " +
            "SELECT DISTINCT pa.Name AS an, pb.Name AS bn " +
            "FROM w JOIN person pa ON pa.id = w.s " +
            "JOIN person pb ON pb.id = w.d WHERE w.l >= 2")
      case 8 => // shortestPath over [*2..]: minimal length >= bound
        val src = Seq("Tom Hanks", "Meg Ryan")(rnd.nextInt(2))
        Gen(
          "MATCH p = shortestPath(" +
            "(a:Person)-[:KNOWS*2..]->(b:Person)) " +
            s"WHERE a.Name = '$src' " +
            "RETURN b.Name AS bn, length(p) AS l",
          s"WITH $kCte, " +
            "m AS (SELECT s, d, CAST(min(l) AS BIGINT) AS l FROM w " +
            "WHERE l >= 2 GROUP BY s, d) " +
            "SELECT pb.Name AS bn, l " +
            "FROM m JOIN person pa ON pa.id = m.s " +
            "JOIN person pb ON pb.id = m.d " +
            s"WHERE pa.Name = '$src'")
      case 9 => // undirected shortestPath over the symmetrized frame
        val src = Seq("Rob Reiner", "Kevin Bacon")(rnd.nextInt(2))
        Gen(
          "MATCH p = shortestPath(" +
            "(a:Person)-[:KNOWS*]-(b:Person)) " +
            s"WHERE a.Name = '$src' " +
            "RETURN b.Name AS bn, length(p) AS l",
          "WITH k0 AS (SELECT _vertexId s, _sink d FROM knows), " +
            "k AS (SELECT s, d FROM k0 UNION SELECT d, s FROM k0), " +
            "p1 AS (SELECT s, d, 1 AS l FROM k), " +
            "p2 AS (SELECT a.s, b.d, 2 AS l FROM k a " +
            "JOIN k b ON b.s = a.d), " +
            "p3 AS (SELECT a.s, c.d, 3 AS l FROM k a " +
            "JOIN k b ON b.s = a.d JOIN k c ON c.s = b.d), " +
            "w AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2 " +
            "UNION ALL SELECT * FROM p3), " +
            "m AS (SELECT s, d, CAST(min(l) AS BIGINT) AS l FROM w " +
            "WHERE s <> d GROUP BY s, d) " +
            "SELECT pb.Name AS bn, l " +
            "FROM m JOIN person pa ON pa.id = m.s " +
            "JOIN person pb ON pb.id = m.d " +
            s"WHERE pa.Name = '$src'")
      case 0 => // anchored plain enumeration: one row per walk
        val src = Seq("Tom Hanks", "Meg Ryan", "Kevin Bacon",
          "Rob Reiner")(rnd.nextInt(4))
        Gen(
          s"MATCH p = (a:Person)-[:KNOWS*]->(b:Person) " +
            s"WHERE a.Name = '$src' " +
            "RETURN b.Name AS bn, length(p) AS l",
          s"WITH $kCte " +
            "SELECT pb.Name AS bn, CAST(l AS BIGINT) AS l " +
            "FROM w JOIN person pa ON pa.id = w.s " +
            "JOIN person pb ON pb.id = w.d " +
            s"WHERE pa.Name = '$src'")
      case 1 => // unanchored enumeration with witness trails
        Gen(
          "MATCH p = (a:Person)-[:KNOWS*]->(b:Person) " +
            "RETURN a.Name AS an, b.Name AS bn, " +
            "reduce(s = '', n IN nodes(p) | s + '|' + n.id) AS path",
          "WITH k AS (SELECT _vertexId s, _sink d FROM knows), " +
            "p1 AS (SELECT s, d, '|' || s || '|' || d AS path FROM k), " +
            "p2 AS (SELECT a.s, b.d, " +
            "'|' || a.s || '|' || a.d || '|' || b.d FROM k a " +
            "JOIN k b ON b.s = a.d), " +
            "p3 AS (SELECT a.s, c.d, " +
            "'|' || a.s || '|' || a.d || '|' || b.d || '|' || c.d " +
            "FROM k a JOIN k b ON b.s = a.d JOIN k c ON c.s = b.d), " +
            "w AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2 " +
            "UNION ALL SELECT * FROM p3) " +
            "SELECT pa.Name AS an, pb.Name AS bn, path " +
            "FROM w JOIN person pa ON pa.id = w.s " +
            "JOIN person pb ON pb.id = w.d")
      case 2 => // [*0..] enumeration: the identity walk joins in
        val src = Seq("Tom Hanks", "Meg Ryan",
          "Rob Reiner")(rnd.nextInt(3))
        Gen(
          s"MATCH p = (a:Person)-[:KNOWS*0..]->(b:Person) " +
            s"WHERE a.Name = '$src' " +
            "RETURN b.Name AS bn, length(p) AS l",
          s"WITH $kCte, " +
            "z AS (SELECT id AS s, id AS d, 0 AS l FROM person " +
            "UNION ALL SELECT * FROM w) " +
            "SELECT pb.Name AS bn, CAST(l AS BIGINT) AS l " +
            "FROM z JOIN person pa ON pa.id = z.s " +
            "JOIN person pb ON pb.id = z.d " +
            s"WHERE pa.Name = '$src'")
      case 3 => // bounded alternation: hops mix verbs
        val h = 1 + rnd.nextInt(2)
        val hop =
          if (h == 1) "SELECT s, d FROM u"
          else "SELECT a.s, b.d FROM u a JOIN u b ON b.s = a.d"
        Gen(
          s"MATCH (a:Person)-[:FOLLOWS|KNOWS*$h..$h]->(b:Person) " +
            "RETURN a.Name AS an, b.Name AS bn",
          "WITH u AS (SELECT _vertexId s, _sink d FROM follows " +
            "UNION ALL SELECT _vertexId, _sink FROM knows), " +
            s"hh AS ($hop) " +
            "SELECT pa.Name AS an, pb.Name AS bn " +
            "FROM hh JOIN person pa ON pa.id = hh.s " +
            "JOIN person pb ON pb.id = hh.d")
      case 4 => // alternation rel-list: merged null-filled namespace
        Gen(
          "MATCH (a:Person)-[rs:FOLLOWS|KNOWS*2..2]->(b:Person) " +
            "RETURN a.Name AS an, b.Name AS bn, " +
            "reduce(s = '', r IN rs | s + '|' + toString(" +
            "coalesce(r.Since, 0))) AS ss",
          "WITH u AS (SELECT _vertexId s, _sink d, " +
            "CAST(NULL AS INT) AS Since FROM follows " +
            "UNION ALL SELECT _vertexId, _sink, Since FROM knows) " +
            "SELECT pa.Name AS an, pb.Name AS bn, " +
            "'|' || CAST(coalesce(a.Since, 0) AS STRING) || " +
            "'|' || CAST(coalesce(b.Since, 0) AS STRING) AS ss " +
            "FROM u a JOIN u b ON b.s = a.d " +
            "JOIN person pa ON pa.id = a.s " +
            "JOIN person pb ON pb.id = b.d")
      case 5 => // alternation unbounded shortestPath: min over the
        // pooled walks (a mixed chain may be the only route)
        val src = Seq("Tom Hanks", "Jessica Thompson")(rnd.nextInt(2))
        Gen(
          "MATCH p = shortestPath(" +
            "(a:Person)-[:FOLLOWS|KNOWS*1..]->(b:Person)) " +
            s"WHERE a.Name = '$src' " +
            "RETURN b.Name AS bn, length(p) AS l",
          s"WITH $uCte, " +
            "m AS (SELECT s, d, CAST(min(l) AS BIGINT) AS l FROM w " +
            "GROUP BY s, d) " +
            "SELECT pb.Name AS bn, l " +
            "FROM m JOIN person pa ON pa.id = m.s " +
            "JOIN person pb ON pb.id = m.d " +
            s"WHERE pa.Name = '$src'")
      case _ => // alternation plain enumeration over the pooled DAG
        Gen(
          "MATCH p = (a:Person)-[:FOLLOWS|KNOWS*]->(b:Person) " +
            "WHERE a.Name = 'Jessica Thompson' " +
            "RETURN b.Name AS bn, length(p) AS l",
          s"WITH $uCte " +
            "SELECT pb.Name AS bn, CAST(l AS BIGINT) AS l " +
            "FROM w JOIN person pa ON pa.id = w.s " +
            "JOIN person pb ON pb.id = w.d " +
            "WHERE pa.Name = 'Jessica Thompson'")
    }
  }

  /** Multiset of rows as normalized strings (doubles are pre-rounded
    * by the generator; nulls print as a sentinel). */
  private def norm(df: DataFrame): Seq[String] =
    df.collect().toSeq.map { r: Row =>
      (0 until r.length).map { i =>
        if (r.isNullAt(i)) "~null~" else r.get(i).toString
      }.mkString("|")
    }.sorted

  test(s"$N seed-pinned random queries agree with their SQL mirrors") {
    val catalog = MovieFixture.catalog(spark)
    val session = new CypherSession(spark, catalog).extended
    nodeTable.foreach { case (lbl, view) =>
      catalog.nodeDf(lbl).createOrReplaceTempView(view)
    }
    edges.map(_._4).distinct.foreach { t =>
      val e = catalog.graph.edges.find(_.table == t).get
      catalog.edgeDf(e).createOrReplaceTempView(t)
    }
    val rnd = new Random(Seed)
    var checked = 0
    (0 until N).foreach { i =>
      val g = genOne(rnd)
      val got =
        try norm(session.run(g.cypher))
        catch {
          case e: Throwable => fail(
            s"seed=$Seed i=$i cypher failed: ${e.getMessage}\n" +
            s"CYPHER: ${g.cypher}\nSQL:    ${g.sql}")
        }
      val exp =
        try norm(spark.sql(g.sql))
        catch {
          case e: Throwable => fail(
            s"seed=$Seed i=$i sql mirror failed: ${e.getMessage}\n" +
            s"CYPHER: ${g.cypher}\nSQL:    ${g.sql}")
        }
      assert(got == exp,
        s"\nseed=$Seed i=$i DIVERGED (${got.size} vs ${exp.size} rows)" +
        s"\nCYPHER: ${g.cypher}\nSQL:    ${g.sql}" +
        s"\ngot:      ${got.take(8).mkString(" ; ")}" +
        s"\nexpected: ${exp.take(8).mkString(" ; ")}")
      checked += 1
    }
    assert(checked == N)
  }

  test("60 seed-pinned round-13-surface queries agree with mirrors") {
    val catalog = MovieFixture.catalog(spark)
    val session = new CypherSession(spark, catalog).extended
    nodeTable.foreach { case (lbl, view) =>
      catalog.nodeDf(lbl).createOrReplaceTempView(view)
    }
    edges.map(_._4).distinct.foreach { t =>
      val e = catalog.graph.edges.find(_.table == t).get
      catalog.edgeDf(e).createOrReplaceTempView(t)
    }
    val rnd = new Random(Seed + 2)
    (0 until 60).foreach { i =>
      val g = genSurface13(rnd)
      val got =
        try norm(session.run(g.cypher))
        catch { case e: Throwable => fail(
          s"seed=${Seed + 2} i=$i cypher failed: ${e.getMessage}\n" +
          s"CYPHER: ${g.cypher}\nSQL:    ${g.sql}") }
      val exp =
        try norm(spark.sql(g.sql))
        catch { case e: Throwable => fail(
          s"seed=${Seed + 2} i=$i sql mirror failed: ${e.getMessage}\n" +
          s"CYPHER: ${g.cypher}\nSQL:    ${g.sql}") }
      assert(got == exp,
        s"\nseed=${Seed + 2} i=$i DIVERGED " +
        s"(${got.size} vs ${exp.size} rows)" +
        s"\nCYPHER: ${g.cypher}\nSQL:    ${g.sql}" +
        s"\ngot:      ${got.take(8).mkString(" ; ")}" +
        s"\nexpected: ${exp.take(8).mkString(" ; ")}")
    }
  }

  test("80 seed-pinned late-round-13 surface queries agree with mirrors") {
    val catalog = MovieFixture.catalog(spark)
    val session = new CypherSession(spark, catalog).extended
    nodeTable.foreach { case (lbl, view) =>
      catalog.nodeDf(lbl).createOrReplaceTempView(view)
    }
    edges.map(_._4).distinct.foreach { t =>
      val e = catalog.graph.edges.find(_.table == t).get
      catalog.edgeDf(e).createOrReplaceTempView(t)
    }
    val rnd = new Random(Seed + 3)
    (0 until 80).foreach { i =>
      val g = genSurface13b(rnd)
      val got =
        try norm(session.run(g.cypher))
        catch { case e: Throwable => fail(
          s"seed=${Seed + 3} i=$i cypher failed: ${e.getMessage}\n" +
          s"CYPHER: ${g.cypher}\nSQL:    ${g.sql}") }
      val exp =
        try norm(spark.sql(g.sql))
        catch { case e: Throwable => fail(
          s"seed=${Seed + 3} i=$i sql mirror failed: ${e.getMessage}\n" +
          s"CYPHER: ${g.cypher}\nSQL:    ${g.sql}") }
      assert(got == exp,
        s"\nseed=${Seed + 3} i=$i DIVERGED " +
        s"(${got.size} vs ${exp.size} rows)" +
        s"\nCYPHER: ${g.cypher}\nSQL:    ${g.sql}" +
        s"\ngot:      ${got.take(8).mkString(" ; ")}" +
        s"\nexpected: ${exp.take(8).mkString(" ; ")}")
    }
  }

  test("60 seed-pinned round-14-surface queries agree with mirrors") {
    val catalog = MovieFixture.catalog(spark)
    val session = new CypherSession(spark, catalog).extended
    nodeTable.foreach { case (lbl, view) =>
      catalog.nodeDf(lbl).createOrReplaceTempView(view)
    }
    edges.map(_._4).distinct.foreach { t =>
      val e = catalog.graph.edges.find(_.table == t).get
      catalog.edgeDf(e).createOrReplaceTempView(t)
    }
    val rnd = new Random(Seed + 4)
    (0 until 60).foreach { i =>
      val g = genSurface14(rnd)
      val got =
        try norm(session.run(g.cypher))
        catch { case e: Throwable => fail(
          s"seed=${Seed + 4} i=$i cypher failed: ${e.getMessage}\n" +
          s"CYPHER: ${g.cypher}\nSQL:    ${g.sql}") }
      val exp =
        try norm(spark.sql(g.sql))
        catch { case e: Throwable => fail(
          s"seed=${Seed + 4} i=$i sql mirror failed: ${e.getMessage}\n" +
          s"CYPHER: ${g.cypher}\nSQL:    ${g.sql}") }
      assert(got == exp,
        s"\nseed=${Seed + 4} i=$i DIVERGED " +
        s"(${got.size} vs ${exp.size} rows)" +
        s"\nCYPHER: ${g.cypher}\nSQL:    ${g.sql}" +
        s"\ngot:      ${got.take(8).mkString(" ; ")}" +
        s"\nexpected: ${exp.take(8).mkString(" ; ")}")
    }
  }

  test("60 seed-pinned round-15-surface queries agree with mirrors") {
    val catalog = MovieFixture.catalog(spark)
    val session = new CypherSession(spark, catalog).extended
    nodeTable.foreach { case (lbl, view) =>
      catalog.nodeDf(lbl).createOrReplaceTempView(view)
    }
    edges.map(_._4).distinct.foreach { t =>
      val e = catalog.graph.edges.find(_.table == t).get
      catalog.edgeDf(e).createOrReplaceTempView(t)
    }
    val rnd = new Random(Seed + 5)
    (0 until 60).foreach { i =>
      val g = genSurface15(rnd)
      val got =
        try norm(session.run(g.cypher))
        catch { case e: Throwable => fail(
          s"seed=${Seed + 5} i=$i cypher failed: ${e.getMessage}\n" +
          s"CYPHER: ${g.cypher}\nSQL:    ${g.sql}") }
      val exp =
        try norm(spark.sql(g.sql))
        catch { case e: Throwable => fail(
          s"seed=${Seed + 5} i=$i sql mirror failed: ${e.getMessage}\n" +
          s"CYPHER: ${g.cypher}\nSQL:    ${g.sql}") }
      assert(got == exp,
        s"\nseed=${Seed + 5} i=$i DIVERGED " +
        s"(${got.size} vs ${exp.size} rows)" +
        s"\nCYPHER: ${g.cypher}\nSQL:    ${g.sql}" +
        s"\ngot:      ${got.take(8).mkString(" ; ")}" +
        s"\nexpected: ${exp.take(8).mkString(" ; ")}")
    }
  }

  test("60 seed-pinned round-16-surface queries agree with mirrors") {
    val catalog = MovieFixture.catalog(spark)
    val session = new CypherSession(spark, catalog).extended
    nodeTable.foreach { case (lbl, view) =>
      catalog.nodeDf(lbl).createOrReplaceTempView(view)
    }
    edges.map(_._4).distinct.foreach { t =>
      val e = catalog.graph.edges.find(_.table == t).get
      catalog.edgeDf(e).createOrReplaceTempView(t)
    }
    val rnd = new Random(Seed + 6)
    (0 until 60).foreach { i =>
      val g = genSurface16(rnd)
      val got =
        try norm(session.run(g.cypher))
        catch { case e: Throwable => fail(
          s"seed=${Seed + 6} i=$i cypher failed: ${e.getMessage}\n" +
          s"CYPHER: ${g.cypher}\nSQL:    ${g.sql}") }
      val exp =
        try norm(spark.sql(g.sql))
        catch { case e: Throwable => fail(
          s"seed=${Seed + 6} i=$i sql mirror failed: ${e.getMessage}\n" +
          s"CYPHER: ${g.cypher}\nSQL:    ${g.sql}") }
      assert(got == exp,
        s"\nseed=${Seed + 6} i=$i DIVERGED " +
        s"(${got.size} vs ${exp.size} rows)" +
        s"\nCYPHER: ${g.cypher}\nSQL:    ${g.sql}" +
        s"\ngot:      ${got.take(8).mkString(" ; ")}" +
        s"\nexpected: ${exp.take(8).mkString(" ; ")}")
    }
  }

  test("60 seed-pinned round-17-surface queries agree with mirrors") {
    val catalog = MovieFixture.catalog(spark)
    val session = new CypherSession(spark, catalog).extended
    nodeTable.foreach { case (lbl, view) =>
      catalog.nodeDf(lbl).createOrReplaceTempView(view)
    }
    edges.map(_._4).distinct.foreach { t =>
      val e = catalog.graph.edges.find(_.table == t).get
      catalog.edgeDf(e).createOrReplaceTempView(t)
    }
    val rnd = new Random(Seed + 7)
    (0 until 60).foreach { i =>
      val g = genSurface17(rnd)
      val got =
        try norm(session.run(g.cypher))
        catch { case e: Throwable => fail(
          s"seed=${Seed + 7} i=$i cypher failed: ${e.getMessage}\n" +
          s"CYPHER: ${g.cypher}\nSQL:    ${g.sql}") }
      val exp =
        try norm(spark.sql(g.sql))
        catch { case e: Throwable => fail(
          s"seed=${Seed + 7} i=$i sql mirror failed: ${e.getMessage}\n" +
          s"CYPHER: ${g.cypher}\nSQL:    ${g.sql}") }
      assert(got == exp,
        s"\nseed=${Seed + 7} i=$i DIVERGED " +
        s"(${got.size} vs ${exp.size} rows)" +
        s"\nCYPHER: ${g.cypher}\nSQL:    ${g.sql}" +
        s"\ngot:      ${got.take(8).mkString(" ; ")}" +
        s"\nexpected: ${exp.take(8).mkString(" ; ")}")
    }
  }

  test("45 seed-pinned updating queries agree with their snapshot mirrors") {
    val catalog = MovieFixture.catalog(spark)
    val session = new CypherSession(spark, catalog).extended
    nodeTable.foreach { case (lbl, view) =>
      catalog.nodeDf(lbl).createOrReplaceTempView(view)
    }
    edges.map(_._4).distinct.foreach { t =>
      val e = catalog.graph.edges.find(_.table == t).get
      catalog.edgeDf(e).createOrReplaceTempView(t)
    }
    val rnd = new Random(Seed + 1)
    var checked = 0
    (0 until 45).foreach { i =>
      val g = genUpdating(rnd)
      val got =
        try norm(session.run(g.cypher))
        catch {
          case e: Throwable => fail(
            s"seed=${Seed + 1} i=$i updating cypher failed: " +
            s"${e.getMessage}\nCYPHER: ${g.cypher}\nSQL:    ${g.sql}")
        }
      val exp =
        try norm(spark.sql(g.sql))
        catch {
          case e: Throwable => fail(
            s"seed=${Seed + 1} i=$i sql mirror failed: " +
            s"${e.getMessage}\nCYPHER: ${g.cypher}\nSQL:    ${g.sql}")
        }
      assert(got == exp,
        s"\nseed=${Seed + 1} i=$i DIVERGED " +
        s"(${got.size} vs ${exp.size} rows)" +
        s"\nCYPHER: ${g.cypher}\nSQL:    ${g.sql}" +
        s"\ngot:      ${got.take(8).mkString(" ; ")}" +
        s"\nexpected: ${exp.take(8).mkString(" ; ")}")
      checked += 1
    }
    assert(checked == 45)
  }
}
