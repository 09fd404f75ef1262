package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._

/**
 * Driver contract (SURVEY.md §7): one entry per implemented operator
 * from SURVEY.md §2 plus the training-data-pipeline extensions, each
 * with a DuckDB oracle over the same parquet tables where the semantics
 * are SQL-expressible.
 *
 * Determinism rules used throughout (the driver hash-compares values):
 *  - every query ends in a total ORDER BY on a unique key set, in both
 *    the Spark result and the oracle SQL;
 *  - double aggregates are `round(...)`-ed identically on both sides
 *    (per-row double arithmetic is IEEE-identical across engines and
 *    needs no rounding; only reduction order varies);
 *  - column names are aliased identically on both sides.
 */
object SparkEntry {

  /** Flagship: 3-hop graph pattern + aggregation via the Cypher engine. */
  def entry(spark: SparkSession): DataFrame =
    TpchGraph.session(spark, "/root/testdata/sf0.001").run(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)-[:IN_REGION]->(r:Region)
        |RETURN r.r_name AS region, n.n_name AS nation, count(c) AS n_customers
        |ORDER BY region, nation""".stripMargin)

  // ---------------------------------------------------------------- helpers

  private def cy(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => TpchGraph.session(s, dir).run(q)

  /** Extension-surface queries (SKIP / $param / UNWIND / collect /
    * var-length) run on the extended session. */
  private def cyx(q: String, params: Map[String, Any] = Map.empty)
      : (SparkSession, String) => DataFrame =
    (s, dir) => TpchGraph.session(s, dir).extended.run(q, params)

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.cypher.GraphCatalog.cachedParquet(s, s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    graft.cypher.GraphCatalog.cachedParquet(s, s"$dir/embeddings.parquet")
  /** events.ts may be parquet TIMESTAMP(NANOS) (older generator runs) or
    * TIMESTAMP(MICROS) without UTC adjustment (→ TIMESTAMP_NTZ). Spark has
    * no nanos type, so with the legacy conf a nanos column surfaces as
    * long — truncate it to micros (matching DuckDB's own ns→us
    * truncation). An NTZ column is cast to the session-zoned type: the
    * session timezone is pinned to UTC everywhere (Verify/Bench/tests), so
    * the cast preserves the instant and keeps unix_millis/unix_micros
    * (which require TIMESTAMP) usable downstream. */
  private def evts(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** (name, spark query, optional DuckDB oracle). */
  private type Spec = (String, (SparkSession, String) => DataFrame, Option[String])

  // =========================================================== Cypher parity

  private val cypherSpecs: Seq[Spec] = Seq(
    // --- DataSourceOperator: leaf scan + filter + projection
    ("q01_node_scan", cy(
      """MATCH (p:Part) WHERE p.p_size > 40
        |RETURN p.p_partkey AS partkey, p.p_name AS name,
        |       p.p_retailprice AS price
        |ORDER BY partkey""".stripMargin),
      Some("""SELECT p_partkey AS partkey, p_name AS name,
             |       p_retailprice AS price
             |FROM part WHERE p_size > 40 ORDER BY partkey""".stripMargin)),

    // --- JoinOperator: inner equi-join on graph keys
    ("q02_join_filter", cy(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WHERE o.o_totalprice > 300000.0
        |RETURN c.c_name AS cname, o.o_orderkey AS okey,
        |       o.o_totalprice AS price
        |ORDER BY okey""".stripMargin),
      Some("""SELECT c_name AS cname, o_orderkey AS okey,
             |       o_totalprice AS price
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |WHERE o_totalprice > 300000.0 ORDER BY okey""".stripMargin)),

    // --- chained joins (3-hop) + implicit GROUP BY aggregation
    ("q03_multihop_agg", cy(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)-[:IN_REGION]->(r:Region)
        |WHERE r.r_name = 'ASIA'
        |RETURN n.n_name AS nation, count(c) AS n_customers
        |ORDER BY nation""".stripMargin),
      Some("""SELECT n_name AS nation, count(c_custkey) AS n_customers
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY nation""".stripMargin)),

    // --- OPTIONAL MATCH with WHERE (filter-before-left-join fork)
    ("q04_optional_match", cy(
      """MATCH (n:Nation)
        |OPTIONAL MATCH (c:Customer)-[:FROM_NATION]->(n)
        |WHERE c.c_acctbal > 9000.0
        |RETURN n.n_name AS nation, count(c) AS n_rich
        |ORDER BY nation""".stripMargin),
      Some("""SELECT n_name AS nation, count(c_custkey) AS n_rich
             |FROM nation LEFT JOIN customer
             |  ON c_nationkey = n_nationkey AND c_acctbal > 9000.0
             |GROUP BY n_name ORDER BY nation""".stripMargin)),

    // --- implicit GROUP BY with multiple aggregates (TPC-H Q1 shape)
    ("q05_lineitem_agg", cy(
      """MATCH (o:Order)-[l:CONTAINS]->(p:Part)
        |RETURN l.l_returnflag AS rf, l.l_linestatus AS ls,
        |       sum(l.l_quantity) AS sum_qty,
        |       round(sum(l.l_extendedprice), 2) AS sum_price,
        |       round(avg(l.l_discount), 6) AS avg_disc,
        |       count(l) AS n_items
        |ORDER BY rf, ls""".stripMargin),
      Some("""SELECT l_returnflag AS rf, l_linestatus AS ls,
             |       sum(l_quantity) AS sum_qty,
             |       round(sum(l_extendedprice), 2) AS sum_price,
             |       round(avg(l_discount), 6) AS avg_disc,
             |       count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN part ON l_partkey = p_partkey
             |GROUP BY rf, ls ORDER BY rf, ls""".stripMargin)),

    // --- global aggregation (no grouping keys)
    ("q06_global_agg", cy(
      """MATCH (o:Order)
        |RETURN count(o) AS n_orders,
        |       round(avg(o.o_totalprice), 4) AS avg_price,
        |       min(o.o_orderdate) AS first_date,
        |       max(o.o_orderdate) AS last_date""".stripMargin),
      Some("""SELECT count(*) AS n_orders,
             |       round(avg(o_totalprice), 4) AS avg_price,
             |       min(o_orderdate) AS first_date,
             |       max(o_orderdate) AS last_date
             |FROM orders""".stripMargin)),

    // --- DISTINCT projection
    ("q07_distinct", cy(
      """MATCH (c:Customer) RETURN DISTINCT c.c_mktsegment AS segment
        |ORDER BY segment""".stripMargin),
      Some("SELECT DISTINCT c_mktsegment AS segment FROM customer ORDER BY segment")),

    // --- ORDER BY + LIMIT (top-K → TakeOrderedAndProject physically)
    ("q08_topk", cy(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |RETURN c.c_name AS cname, o.o_totalprice AS price
        |ORDER BY price DESC, cname LIMIT 10""".stripMargin),
      Some("""SELECT c_name AS cname, o_totalprice AS price
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |ORDER BY price DESC, cname LIMIT 10""".stripMargin)),

    // --- searched CASE as a grouping key
    ("q09_case", cy(
      """MATCH (o:Order)
        |RETURN CASE WHEN o.o_totalprice >= 300000.0 THEN 'large'
        |            WHEN o.o_totalprice >= 150000.0 THEN 'medium'
        |            ELSE 'small' END AS bucket,
        |       count(o) AS n
        |ORDER BY bucket""".stripMargin),
      Some("""SELECT CASE WHEN o_totalprice >= 300000.0 THEN 'large'
             |            WHEN o_totalprice >= 150000.0 THEN 'medium'
             |            ELSE 'small' END AS bucket,
             |       count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // --- UNION (dedup) across two single queries
    ("q10_union",
      (s, dir) => TpchGraph.session(s, dir).run(
        """MATCH (c:Customer) WHERE c.c_mktsegment = 'BUILDING'
          |RETURN c.c_name AS name
          |UNION
          |MATCH (s:Supplier) RETURN s.s_name AS name""".stripMargin)
        .orderBy("name"),
      Some("""SELECT name FROM (
             |  SELECT c_name AS name FROM customer WHERE c_mktsegment = 'BUILDING'
             |  UNION
             |  SELECT s_name AS name FROM supplier)
             |ORDER BY name""".stripMargin)),

    // --- UNION ALL (bag semantics)
    ("q11_union_all",
      (s, dir) => TpchGraph.session(s, dir).run(
        """MATCH (n:Nation) RETURN n.n_name AS name
          |UNION ALL
          |MATCH (r:Region) RETURN r.r_name AS name""".stripMargin)
        .orderBy("name"),
      Some("""SELECT name FROM (
             |  SELECT n_name AS name FROM nation
             |  UNION ALL
             |  SELECT r_name AS name FROM region)
             |ORDER BY name""".stripMargin)),

    // --- WITH + aggregation + post-WITH WHERE (HAVING semantics)
    ("q12_with_having", cy(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WITH c, count(o) AS n_orders
        |WHERE n_orders >= 15
        |RETURN c.c_name AS cname, n_orders
        |ORDER BY n_orders DESC, cname""".stripMargin),
      Some("""SELECT c_name AS cname, count(*) AS n_orders
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey, c_name, c_acctbal, c_mktsegment
             |HAVING count(*) >= 15
             |ORDER BY n_orders DESC, cname""".stripMargin)),

    // --- WITH entity aliasing (rename) + STARTS WITH
    ("q13_entity_alias", cy(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |WITH n AS m, c AS person
        |WHERE m.n_name STARTS WITH 'NATION_1'
        |RETURN m.n_name AS nation, count(person) AS n_cust
        |ORDER BY nation""".stripMargin),
      Some("""SELECT n_name AS nation, count(*) AS n_cust
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE n_name LIKE 'NATION\_1%' ESCAPE '\'
             |GROUP BY n_name ORDER BY nation""".stripMargin)),

    // --- string function surface
    ("q14_string_funcs", cy(
      """MATCH (n:Nation)
        |RETURN toLower(n.n_name) AS lname, left(n.n_name, 3) AS prefix,
        |       toLong(size(n.n_name)) AS name_len
        |ORDER BY lname""".stripMargin),
      Some("""SELECT lower(n_name) AS lname, left(n_name, 3) AS prefix,
             |       length(n_name) AS name_len
             |FROM nation ORDER BY lname""".stripMargin)),

    // --- IN list + regex full-match
    ("q15_in_regex", cy(
      """MATCH (n:Nation)
        |WHERE n.n_name IN ['NATION_2', 'NATION_5', 'NOPE'] OR n.n_name =~ '.*_1[0-2]'
        |RETURN n.n_name AS name ORDER BY name""".stripMargin),
      Some("""SELECT n_name AS name FROM nation
             |WHERE n_name IN ('NATION_2', 'NATION_5', 'NOPE')
             |   OR regexp_full_match(n_name, '.*_1[0-2]')
             |ORDER BY name""".stripMargin)),

    // --- arithmetic operators incl. %
    ("q16_arith", cy(
      """MATCH (o:Order)-[l:CONTAINS]->(p:Part)
        |WHERE l.l_linenumber % 2 = 1 AND l.l_quantity > 45.0
        |RETURN l.l_orderkey AS okey, l.l_linenumber AS lnum,
        |       l.l_extendedprice * (1.0 - l.l_discount) * (1.0 + l.l_tax)
        |         AS charged
        |ORDER BY okey, lnum, charged""".stripMargin),
      Some("""SELECT l_orderkey AS okey, l_linenumber AS lnum,
             |       l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
             |         AS charged
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN part ON l_partkey = p_partkey
             |WHERE l_linenumber % 2 = 1 AND l_quantity > 45.0
             |ORDER BY okey, lnum, charged""".stripMargin)),

    // --- boolean-valued projection + XOR
    ("q17_bool_xor", cy(
      """MATCH (c:Customer)
        |RETURN c.c_name AS cname, c.c_acctbal > 5000.0 AS rich,
        |       (c.c_acctbal > 5000.0) XOR (c.c_mktsegment = 'BUILDING') AS flag
        |ORDER BY cname""".stripMargin),
      Some("""SELECT c_name AS cname, c_acctbal > 5000.0 AS rich,
             |       ((c_acctbal > 5000.0) <> (c_mktsegment = 'BUILDING')) AS flag
             |FROM customer ORDER BY cname""".stripMargin)),

    // --- count(DISTINCT entity) via the entity id key
    ("q18_count_distinct", cy(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)-[l:CONTAINS]->(p:Part)
        |WHERE p.p_size <= 5
        |RETURN c.c_mktsegment AS segment, count(DISTINCT c) AS n_cust,
        |       count(l) AS n_items
        |ORDER BY segment""".stripMargin),
      Some("""SELECT c_mktsegment AS segment,
             |       count(DISTINCT c_custkey) AS n_cust, count(*) AS n_items
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN part ON l_partkey = p_partkey
             |WHERE p_size <= 5
             |GROUP BY c_mktsegment ORDER BY segment""".stripMargin)),

    // --- stdev + percentileCont (finishing what the reference stubs)
    ("q19_stats", cy(
      """MATCH (o:Order)-[l:CONTAINS]->(p:Part)
        |RETURN l.l_returnflag AS rf,
        |       round(stdev(l.l_quantity), 4) AS sd_qty,
        |       round(percentileCont(l.l_quantity, 0.5), 1) AS med_qty,
        |       percentileDisc(l.l_quantity, 0.5) AS med_disc,
        |       first(l.l_quantity) AS first_qty,
        |       last(l.l_quantity) AS last_qty
        |ORDER BY rf""".stripMargin),
      Some("""SELECT l_returnflag AS rf,
             |       round(stddev_samp(l_quantity), 4) AS sd_qty,
             |       round(quantile_cont(l_quantity, 0.5), 1) AS med_qty,
             |       quantile_disc(l_quantity, 0.5) AS med_disc,
             |       min(l_quantity) AS first_qty,
             |       max(l_quantity) AS last_qty
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN part ON l_partkey = p_partkey
             |GROUP BY rf ORDER BY rf""".stripMargin)),

    // --- implicit relationship-uniqueness (Cypher edge-isomorphism)
    ("q20_rel_uniqueness", cy(
      """MATCH (c1:Customer)-[e1:FROM_NATION]->(n:Nation)<-[e2:FROM_NATION]-(c2:Customer)
        |WHERE n.n_name = 'NATION_7'
        |RETURN n.n_name AS nation, count(e1) AS n_pairs""".stripMargin),
      Some("""SELECT n_name AS nation, count(*) AS n_pairs
             |FROM customer c1
             |JOIN nation ON c1.c_nationkey = n_nationkey
             |JOIN customer c2 ON c2.c_nationkey = n_nationkey
             |WHERE n_name = 'NATION_7' AND c1.c_custkey <> c2.c_custkey
             |GROUP BY n_name""".stripMargin)),

    // --- cross join of disjoint patterns
    ("q21_cross", cy(
      """MATCH (r:Region), (r2:Region)
        |WHERE r.r_regionkey < r2.r_regionkey
        |RETURN r.r_name AS a, r2.r_name AS b
        |ORDER BY a, b""".stripMargin),
      Some("""SELECT r1.r_name AS a, r2.r_name AS b
             |FROM region r1, region r2
             |WHERE r1.r_regionkey < r2.r_regionkey
             |ORDER BY a, b""".stripMargin)),

    // --- supplier-side edges (SUPPLIED_BY via lineitem, LOCATED_IN) with
    //     edge-property aggregation
    ("q25_supplier_side", cy(
      """MATCH (o:Order)-[sb:SUPPLIED_BY]->(s:Supplier)-[:LOCATED_IN]->(n:Nation)
        |WHERE n.n_name = 'NATION_3'
        |RETURN s.s_name AS sname, count(sb) AS n_items,
        |       round(sum(sb.l_extendedprice), 2) AS revenue
        |ORDER BY sname""".stripMargin),
      Some("""SELECT s_name AS sname, count(*) AS n_items,
             |       round(sum(l_extendedprice), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |WHERE n_name = 'NATION_3'
             |GROUP BY s_name ORDER BY sname""".stripMargin)),

    // --- IS NULL anti-join over OPTIONAL MATCH (nations with no rich
    //     customers), WHERE after entity-projecting WITH
    ("q23_null_antijoin", cy(
      """MATCH (n:Nation)
        |OPTIONAL MATCH (c:Customer)-[:FROM_NATION]->(n)
        |WHERE c.c_acctbal > 9900.0
        |WITH n, c
        |WHERE c.c_custkey IS NULL
        |RETURN n.n_name AS nation ORDER BY nation""".stripMargin),
      Some("""SELECT n_name AS nation
             |FROM nation LEFT JOIN customer
             |  ON c_nationkey = n_nationkey AND c_acctbal > 9900.0
             |WHERE c_custkey IS NULL ORDER BY nation""".stripMargin)),

    // --- callable string predicates + casts + unary ops + CASE-free IS NOT NULL
    ("q24_string_more", cy(
      """MATCH (p:Part)
        |WHERE contains(p.p_name, 'widget') AND p.p_type ENDS WITH 'OMY'
        |  AND p.p_brand IS NOT NULL
        |RETURN p.p_partkey AS partkey, toUpper(trim(p.p_name)) AS uname,
        |       toFloat(p.p_size) / 2.0 AS half_size,
        |       abs(p.p_size - 25) AS dist25,
        |       toString(p.p_size) + '!' AS size_str,
        |       p.p_size ^ 2 AS size_sq
        |ORDER BY partkey""".stripMargin),
      Some("""SELECT p_partkey AS partkey, upper(trim(p_name)) AS uname,
             |       CAST(p_size AS DOUBLE) / 2.0 AS half_size,
             |       abs(p_size - 25) AS dist25,
             |       CAST(p_size AS VARCHAR) || '!' AS size_str,
             |       pow(p_size, 2) AS size_sq
             |FROM part
             |WHERE contains(p_name, 'widget') AND ends_with(p_type, 'OMY')
             |  AND p_brand IS NOT NULL
             |ORDER BY partkey""".stripMargin)),

    // --- timestamp comparison + date part extraction (extension funcs)
    ("q22_dates", cy(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WHERE o.o_orderdate >= '1997-01-01' AND o.o_orderdate < '1998-01-01'
        |RETURN toLong(year(o.o_orderdate)) AS yr,
        |       toLong(month(o.o_orderdate)) AS mo, count(o) AS n
        |ORDER BY yr, mo""".stripMargin),
      Some("""SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             |       count(*) AS n
             |FROM orders JOIN customer ON c_custkey = o_custkey
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY yr, mo ORDER BY yr, mo""".stripMargin)),

    // --- typed temporal literals: datetime()/date() constructors yield
    //     TIMESTAMP/DATE literals at compile time, so the comparison
    //     below is native timestamp ordering — no string coercion
    //     (q22 exercises the string-coercion path; this the typed one)
    ("q26_datetime_lit", cy(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WHERE o.o_orderdate >= datetime('1997-01-01T00:00:00')
        |  AND o.o_orderdate < datetime('1998-01-01')
        |  AND date(o.o_orderdate) <> date('1997-06-15')
        |RETURN toLong(year(o.o_orderdate)) AS yr,
        |       toLong(month(o.o_orderdate)) AS mo, count(o) AS n
        |ORDER BY yr, mo""".stripMargin),
      Some("""SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             |       count(*) AS n
             |FROM orders JOIN customer ON c_custkey = o_custkey
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |  AND CAST(o_orderdate AS DATE) <> DATE '1997-06-15'
             |GROUP BY yr, mo ORDER BY yr, mo""".stripMargin)),

    // ---- flagged EXTENSIONS beyond the reference surface (run on the
    //      .extended session; the default session keeps rejection
    //      parity — VERDICT r4 tasks 4, 5, 7) ------------------------

    // SKIP paging: ORDER BY (total order) → SKIP → LIMIT, lowered to
    // Limit(n, Offset(s, Sort)) — no per-page global re-sort
    ("q27_skip_paging", cyx(
      """MATCH (c:Customer)
        |RETURN c.c_name AS name, c.c_acctbal AS bal
        |ORDER BY bal DESC, name SKIP 10 LIMIT 5""".stripMargin),
      Some("""SELECT c_name AS name, c_acctbal AS bal FROM customer
             |ORDER BY bal DESC, name LIMIT 5 OFFSET 10""".stripMargin)),

    // $param query parameters: typed literal binding at parse time, so
    // the compiled plan is identical to the inline-literal query's
    // (pushdown included)
    ("q28_params", cyx(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |WHERE c.c_acctbal > $minbal AND c.c_mktsegment = $seg
        |RETURN n.n_name AS nation, count(c.c_custkey) AS cnt
        |ORDER BY nation""".stripMargin,
      Map("minbal" -> 5000.0, "seg" -> "BUILDING")),
      Some("""SELECT n_name AS nation, count(c_custkey) AS cnt
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_acctbal > 5000.0 AND c_mktsegment = 'BUILDING'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // collect() under the implicit GROUP BY, then UNWIND (explode) —
    // the round trip is the identity on the underlying rows, which is
    // exactly what the oracle checks
    ("q29_collect_unwind", cyx(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |WHERE c.c_acctbal > 9000.0
        |WITH n.n_name AS nation, collect(c.c_name) AS names
        |UNWIND names AS name
        |RETURN nation, name ORDER BY nation, name""".stripMargin),
      Some("""SELECT n_name AS nation, c_name AS name
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_acctbal > 9000.0 ORDER BY 1, 2""".stripMargin)),

    // bounded variable-length [*1..2]: length 1 (no Customer→Region
    // edge) is dropped at compile time; length 2 unrolls to
    // FROM_NATION + IN_REGION with the interior Nation inferred —
    // aggregation runs over the unioned match set
    ("q30_varlen_hops", cyx(
      """MATCH (c:Customer)-[*1..2]->(r:Region)
        |RETURN r.r_name AS region, count(c.c_custkey) AS customers
        |ORDER BY region""".stripMargin),
      Some("""SELECT r_name AS region, count(c_custkey) AS customers
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |              JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // standard-library extension functions: coalesce over OPTIONAL
    // MATCH nulls, 0-based substring, literal-delimiter split +
    // last-element accessor (the type-resolved last(), not the
    // last→max aggregate), replace, sign, sqrt — every value checked
    ("q31_stdlib_funcs", cyx(
      """MATCH (c:Customer) OPTIONAL MATCH (c)-[p:PLACED]->(o:Order)
        |WITH c.c_name AS name, c.c_acctbal AS bal,
        |     min(o.o_orderstatus) AS st
        |RETURN name,
        |       substring(name, 0, 8) AS pfx,
        |       last(split(name, '#')) AS num,
        |       replace(name, 'Customer#', 'C') AS cname,
        |       coalesce(st, 'NONE') AS status,
        |       sign(bal) AS sgn,
        |       round(sqrt(abs(bal)), 6) AS rt
        |ORDER BY name""".stripMargin),
      Some("""WITH b AS (
             |  SELECT c_name AS name, c_acctbal AS bal,
             |         min(o_orderstatus) AS st
             |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
             |  GROUP BY 1, 2)
             |SELECT name,
             |       substring(name, 1, 8) AS pfx,
             |       split_part(name, '#', 2) AS num,
             |       replace(name, 'Customer#', 'C') AS cname,
             |       coalesce(st, 'NONE') AS status,
             |       CAST(sign(bal) AS INTEGER) AS sgn,
             |       round(sqrt(abs(bal)), 6) AS rt
             |FROM b ORDER BY name""".stripMargin)),

    // simple CASE (equality-desugar) × range()/UNWIND cross product —
    // sequence() is end-inclusive like Cypher's range()
    ("q32_simple_case_range", cyx(
      """MATCH (n:Nation)
        |UNWIND range(1, 3) AS k
        |RETURN n.n_name AS nation, k,
        |       CASE n.n_nationkey % 2 WHEN 0 THEN 'even' ELSE 'odd' END
        |         AS parity
        |ORDER BY nation, k""".stripMargin),
      Some("""SELECT n_name AS nation, k,
             |       CASE WHEN n_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END
             |         AS parity
             |FROM nation
             |CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS k) t
             |ORDER BY 1, 2""".stripMargin)),

    // list surface: comprehension (filter+|), quantifier, reduce() fold,
    // 0-based / negative indexing — scalarized outputs so the dtype-
    // sensitive gate compares ints/strings/bools, not nested lists.
    // reduce over range(0, nk) is the triangular number nk*(nk+1)/2,
    // which the SQL mirrors in closed form; the comprehension/quantifier
    // mirror via DuckDB list lambdas
    ("q33_list_surface", cyx(
      """MATCH (c:Customer)
        |WITH c.c_name AS name, c.c_nationkey AS nk,
        |     split(c.c_name, '#') AS parts
        |RETURN name,
        |       parts[0] AS word0,
        |       parts[-1] AS num,
        |       size([x IN parts WHERE size(x) >= 8]) AS long_parts,
        |       reduce(s = 0, k IN range(0, nk) | s + k) AS tri,
        |       any(x IN parts WHERE x STARTS WITH 'Cust') AS hascust
        |ORDER BY name""".stripMargin),
      Some("""WITH b AS (SELECT c_name AS name, c_nationkey AS nk,
             |                  string_split(c_name, '#') AS parts
             |           FROM customer)
             |SELECT name,
             |       parts[1] AS word0,
             |       parts[len(parts)] AS num,
             |       CAST(len(list_filter(parts, x -> length(x) >= 8))
             |            AS INTEGER) AS long_parts,
             |       CAST(nk * (nk + 1) // 2 AS INTEGER) AS tri,
             |       len(list_filter(parts, x -> starts_with(x, 'Cust'))) > 0
             |         AS hascust
             |FROM b ORDER BY name""".stripMargin)),

    // EXISTS pattern predicate (extension): lowers to a left-semi join
    // whose probe side carries only the correlation key (c_custkey) —
    // at scale the outer row never widens and the probe can broadcast
    ("q34_exists_semi", cyx(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |WHERE EXISTS((c)-[:PLACED]->(:Order)) AND c.c_mktsegment = 'BUILDING'
        |RETURN n.n_name AS nation, count(c) AS n_buyers
        |ORDER BY nation""".stripMargin),
      Some("""SELECT n_name AS nation, count(*) AS n_buyers
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // NOT EXISTS subquery form with inner WHERE → left-anti join (the
    // q23 anti-join shape without the OPTIONAL MATCH + IS NULL detour);
    // the inner predicate filters the probe BEFORE the anti join
    ("q35_not_exists_anti", cyx(
      """MATCH (c:Customer)
        |WHERE NOT EXISTS { (c)-[:PLACED]->(o:Order)
        |                   WHERE o.o_totalprice > 350000 }
        |RETURN c.c_custkey AS custkey, c.c_name AS name
        |ORDER BY custkey""".stripMargin),
      Some("""SELECT c_custkey AS custkey, c_name AS name
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_totalprice > 350000)
             |ORDER BY 1""".stripMargin)),

    // count(*) + entity introspection (extension): labels/type fold to
    // literals at compile time (static schema), id() reads the node's
    // key column — the whole projection stays in codegen
    ("q36_introspection", cyx(
      """MATCH (c:Customer)-[p:PLACED]->(o:Order)
        |WHERE o.o_totalprice > 400000
        |RETURN labels(c)[0] AS lbl, type(p) AS rel, count(*) AS n,
        |       min(id(c)) AS min_cust
        |ORDER BY lbl""".stripMargin),
      Some("""SELECT 'Customer' AS lbl, 'PLACED' AS rel, count(*) AS n,
             |       min(o_custkey) AS min_cust
             |FROM orders WHERE o_totalprice > 400000
             |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    // WITH * / RETURN * (extension): star expands to the named scope
    // (alphabetical) ahead of explicit items; chaining WITH * keeps
    // entities flowing without re-listing them
    ("q37_with_star", cyx(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |WITH * WHERE c.c_acctbal > 9990
        |WITH *, c.c_acctbal AS bal
        |RETURN n.n_name AS nation, c.c_name AS name, bal
        |ORDER BY nation, name""".stripMargin),
      Some("""SELECT n_name AS nation, c_name AS name, c_acctbal AS bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_acctbal > 9990
             |ORDER BY 1, 2""".stripMargin)),

    // duration() interval arithmetic (extension): the typed ANSI
    // interval literal rides Spark's native date arithmetic inside the
    // pushed-down filter — no string math, stays codegen'd
    ("q38_duration_arith", cyx(
      """MATCH (o:Order)-[l:CONTAINS]->(p:Part)
        |WHERE l.l_shipdate < o.o_orderdate + duration('P10D')
        |RETURN count(*) AS n_fast""".stripMargin),
      Some("""SELECT count(*) AS n_fast
             |FROM lineitem
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN part ON p_partkey = l_partkey
             |WHERE l_shipdate < o_orderdate + INTERVAL 10 DAY""".stripMargin)),

    // pattern comprehension (extension): group-collect + left join on
    // the correlation key; scalarized via size() because collect order
    // is unspecified (the oracle mirrors with a correlated COUNT)
    ("q39_pattern_comp", cyx(
      """MATCH (n:Nation)
        |RETURN n.n_name AS nation,
        |       size([(c:Customer)-[:FROM_NATION]->(n)
        |              WHERE c.c_acctbal > 9000 | c.c_custkey]) AS rich
        |ORDER BY nation""".stripMargin),
      Some("""SELECT n_name AS nation,
             |       CAST((SELECT count(*) FROM customer
             |             WHERE c_nationkey = n_nationkey
             |               AND c_acctbal > 9000) AS INTEGER) AS rich
             |FROM nation ORDER BY 1""".stripMargin)),

    // map literal (extension): named struct construction + dot access
    // back out of it — scalarized outputs for the dtype-sensitive gate
    ("q40_map_literal", cyx(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |WHERE c.c_acctbal > 9990
        |WITH {cust: c.c_name, nat: n.n_name, bal: c.c_acctbal} AS m
        |RETURN m.cust AS cust, m.nat AS nat, m.bal * 2 AS bal2
        |ORDER BY cust""".stripMargin),
      Some("""SELECT c_name AS cust, n_name AS nat, c_acctbal * 2 AS bal2
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_acctbal > 9990 ORDER BY 1""".stripMargin)),

    // CALL subqueries (extension): correlated per-invocation aggregation
    // (imports threaded as grouping keys, left join + count/sum zero
    // fills) and an uncorrelated CALL (runs once, cross-joins)
    ("q41_call_subquery", cyx(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |WHERE c.c_acctbal > 9980
        |CALL { WITH c MATCH (c)-[:PLACED]->(o:Order)
        |       RETURN count(o) AS n_orders, sum(o.o_totalprice) AS spend }
        |CALL { MATCH (r:Region) RETURN count(r) AS n_regions }
        |RETURN n.n_name AS nation, c.c_name AS name, n_orders,
        |       round(spend, 2) AS spend, n_regions
        |ORDER BY nation, name""".stripMargin),
      Some("""SELECT n_name AS nation, c_name AS name,
             |  (SELECT count(*) FROM orders
             |   WHERE o_custkey = c_custkey) AS n_orders,
             |  round(coalesce((SELECT sum(o_totalprice) FROM orders
             |                  WHERE o_custkey = c_custkey), 0), 2) AS spend,
             |  (SELECT count(*) FROM region) AS n_regions
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_acctbal > 9980
             |ORDER BY 1, 2""".stripMargin)),

    // per-invocation ORDER BY + LIMIT in a correlated CALL → window
    // rank filter partitioned by the import key (WindowGroupLimit:
    // partial top-k per partition before the shuffle)
    ("q42_call_topk", cyx(
      """MATCH (c:Customer) WHERE c.c_acctbal > 9990
        |CALL { WITH c MATCH (c)-[:PLACED]->(o:Order)
        |       RETURN o.o_orderkey AS okey, o.o_totalprice AS price
        |       ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2 }
        |RETURN c.c_name AS name, okey, price
        |ORDER BY name, price DESC, okey""".stripMargin),
      Some("""WITH ranked AS (
             |  SELECT c_name, o_orderkey, o_totalprice,
             |         row_number() OVER (PARTITION BY c_custkey
             |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM customer JOIN orders ON o_custkey = c_custkey
             |  WHERE c_acctbal > 9990)
             |SELECT c_name AS name, o_orderkey AS okey,
             |       o_totalprice AS price
             |FROM ranked WHERE rn <= 2
             |ORDER BY 1, 3 DESC, 2""".stripMargin)),

    // --- CALL paging completions (round 8): per-invocation paging on
    //     an INTERMEDIATE WITH (top-2 priciest orders per customer,
    //     aggregated downstream — the paging happens inside the
    //     subquery pipeline), and DISTINCT + LIMIT on the RETURN
    //     (2 cheapest distinct order-price kilobuckets per customer) —
    //     both previously typed rejections
    ("q60_call_paging", cyx(
      """MATCH (c:Customer) WHERE c.c_acctbal > 9990
        |CALL { WITH c MATCH (c)-[:PLACED]->(o:Order)
        |       WITH o ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
        |       RETURN count(o) AS n_top,
        |              round(sum(o.o_totalprice), 2) AS top2_total }
        |CALL { WITH c MATCH (c)-[:PLACED]->(o:Order)
        |       RETURN DISTINCT floor(o.o_totalprice / 1000.0) AS price_pt
        |       ORDER BY price_pt LIMIT 2 }
        |RETURN c.c_name AS name, n_top, top2_total, price_pt
        |ORDER BY name, price_pt""".stripMargin),
      Some("""WITH ranked AS (
             |  SELECT c_custkey, c_name, o_totalprice,
             |         row_number() OVER (PARTITION BY c_custkey
             |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM customer JOIN orders ON o_custkey = c_custkey
             |  WHERE c_acctbal > 9990),
             |agg AS (
             |  SELECT c_custkey, c_name,
             |         count(*) AS n_top,
             |         round(sum(o_totalprice), 2) AS top2_total
             |  FROM ranked WHERE rn <= 2 GROUP BY 1, 2),
             |pts AS (
             |  SELECT c_custkey, price_pt FROM (
             |    SELECT c_custkey, price_pt,
             |           row_number() OVER (PARTITION BY c_custkey
             |             ORDER BY price_pt) AS rn
             |    FROM (SELECT DISTINCT c_custkey,
             |            CAST(floor(o_totalprice / 1000.0) AS BIGINT)
             |              AS price_pt
             |          FROM customer JOIN orders ON o_custkey = c_custkey
             |          WHERE c_acctbal > 9990))
             |  WHERE rn <= 2)
             |SELECT a.c_name AS name, a.n_top, a.top2_total, p.price_pt
             |FROM agg a JOIN pts p ON p.c_custkey = a.c_custkey
             |ORDER BY name, price_pt""".stripMargin)),

    // --- cross-table label alternation `(n:A|B)` (round 8): the
    //     alternatives live in DIFFERENT tables, so the pattern
    //     branch-unions per owning node — union property namespace
    //     null-filled per branch, entity identity over the synthesized
    //     "label:id" tag so count(DISTINCT e) never conflates the
    //     overlapping c_custkey / s_suppkey ranges — and the anonymous
    //     edge alternation prunes the branches whose edge cannot
    //     resolve (Customer×LOCATED_IN, Supplier×FROM_NATION)
    ("q61_cross_label_alternation", cyx(
      """MATCH (e:Customer|Supplier)-[:FROM_NATION|LOCATED_IN]->(n:Nation)
        |RETURN n.n_name AS nation, count(e) AS n_ent,
        |       count(DISTINCT e) AS nd,
        |       count(e.c_name) AS n_cust, count(e.s_name) AS n_supp,
        |       round(sum(coalesce(e.c_acctbal, e.s_acctbal)), 2) AS bal
        |ORDER BY nation""".stripMargin),
      Some("""WITH u AS (
             |  SELECT 'Customer:' || CAST(c_custkey AS VARCHAR) AS nid,
             |         c_name AS cname, CAST(NULL AS VARCHAR) AS sname,
             |         c_acctbal AS bal, c_nationkey AS nk FROM customer
             |  UNION ALL
             |  SELECT 'Supplier:' || CAST(s_suppkey AS VARCHAR), NULL,
             |         s_name, s_acctbal, s_nationkey FROM supplier)
             |SELECT n_name AS nation, count(*) AS n_ent,
             |       count(DISTINCT nid) AS nd,
             |       count(cname) AS n_cust, count(sname) AS n_supp,
             |       round(sum(bal), 2) AS bal
             |FROM u JOIN nation ON nk = n_nationkey
             |GROUP BY 1 ORDER BY nation""".stripMargin)),

    // --- OPTIONAL MATCH over a branch-unioned pattern (round-8 fix):
    //     Cypher is left ⟕ (B1 ∪ B2) — a customer whose orders are all
    //     non-urgent matches the PLACED branch, so the PLACED_URGENT
    //     branch must NOT add a spurious null row; a customer with no
    //     orders at all gets exactly ONE null row. The DuckDB mirror is
    //     literally a LEFT JOIN against the branches' UNION ALL.
    ("q62_optional_branch_union", cyx(
      """MATCH (c:Customer) WHERE c.c_custkey <= 50
        |OPTIONAL MATCH (c)-[r:PLACED|PLACED_URGENT]->(o:Order)
        |RETURN c.c_custkey AS ck, count(*) AS rows_,
        |       count(o.o_orderkey) AS n_o,
        |       count(r.o_orderpriority) AS n_urgent_tag
        |ORDER BY ck""".stripMargin),
      Some("""WITH u AS (
             |  SELECT o_custkey, o_orderkey,
             |         CAST(NULL AS VARCHAR) AS pri FROM orders
             |  UNION ALL
             |  SELECT o_custkey, o_orderkey, o_orderpriority FROM orders
             |  WHERE o_orderpriority = '1-URGENT')
             |SELECT c_custkey AS ck, count(*) AS rows_,
             |       count(o_orderkey) AS n_o, count(pri) AS n_urgent_tag
             |FROM customer LEFT JOIN u ON o_custkey = c_custkey
             |WHERE c_custkey <= 50
             |GROUP BY 1 ORDER BY ck""".stripMargin)),

    // --- terminal SET on a node (round 9; parity keeps the rejection,
    //     reference read-only by design CypherVisitor.cs:486-489): the
    //     result is the NEW Customer snapshot — matched rows take the
    //     assignments (rhs reads the OLD c plus the WITH scope),
    //     untouched rows anti-join through. applyChangeFeed's update
    //     branch: winner-dedup feed, one anti-join, union.
    ("q63_set_snapshot",
      (s, dir) => cyx(
        """MATCH (c:Customer)-[:PLACED]->(o:Order)
          |WHERE o.o_totalprice > 150000.0
          |WITH c, count(o) AS big
          |SET c.c_name = c.c_name + '_' + toString(big),
          |    c.c_acctbal = c.c_acctbal + 100.0""".stripMargin)
        .apply(s, dir).orderBy("c_custkey"),
      Some("""WITH f AS (
             |  SELECT c_custkey AS k, count(*) AS big
             |  FROM customer JOIN orders ON o_custkey = c_custkey
             |  WHERE o_totalprice > 150000.0
             |  GROUP BY c_custkey)
             |SELECT c_custkey,
             |  CASE WHEN f.k IS NOT NULL
             |       THEN c_name || '_' || CAST(big AS VARCHAR)
             |       ELSE c_name END AS c_name,
             |  CASE WHEN f.k IS NOT NULL THEN c_acctbal + 100.0
             |       ELSE c_acctbal END AS c_acctbal,
             |  c_mktsegment, c_nationkey
             |FROM customer LEFT JOIN f ON f.k = c_custkey
             |ORDER BY c_custkey""".stripMargin)),

    // --- terminal SET on a relationship (round 9): keys by the
    //     (src, snk) pair; the assignment casts to the stored column
    //     type (string literal → date here)
    ("q66_set_rel_snapshot",
      (s, dir) => cyx(
        """MATCH (c:Customer)-[r:PLACED]->(o:Order:UrgentOrder)
          |WHERE o.o_totalprice > 150000.0
          |SET r.o_orderdate = '1999-01-01'""".stripMargin)
        .apply(s, dir).orderBy("o_orderkey"),
      Some("""SELECT o_custkey, o_orderkey,
             |  CASE WHEN o_orderpriority = '1-URGENT'
             |            AND o_totalprice > 150000.0
             |       THEN DATE '1999-01-01' ELSE o_orderdate
             |  END AS o_orderdate
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // --- terminal DELETE on a relationship (round 9): the new edge
    //     snapshot anti-joins the matched (src, snk) pairs out — one
    //     distinct + one broadcast-able anti-join, the snapshot is
    //     never widened
    ("q64_delete_edges",
      (s, dir) => cyx(
        """MATCH (c:Customer)-[r:PLACED]->(o:Order)
          |WHERE o.o_orderkey > 1000
          |DELETE r""".stripMargin)
        .apply(s, dir).orderBy("o_orderkey"),
      Some("""SELECT o_custkey, o_orderkey, o_orderdate
             |FROM orders WHERE o_orderkey <= 1000
             |ORDER BY o_orderkey""".stripMargin)),

    // --- terminal DETACH DELETE on a node (round 9): matched ids drop
    //     from the node snapshot; companion edge snapshots are separate
    //     frames (relationship DELETE queries). Plain node DELETE stays
    //     a typed rejection (dangling-edge check is data-dependent).
    ("q65_detach_delete",
      (s, dir) => cyx(
        """MATCH (n:Nation)<-[:FROM_NATION]-(c:Customer)
          |WITH n, avg(c.c_acctbal) AS ab
          |WHERE ab < 4500.0
          |DETACH DELETE n""".stripMargin)
        .apply(s, dir).orderBy("n_nationkey"),
      Some("""SELECT n_nationkey, n_name FROM nation
             |WHERE n_nationkey NOT IN (
             |  SELECT c_nationkey FROM customer
             |  GROUP BY c_nationkey HAVING avg(c_acctbal) < 4500.0)
             |ORDER BY n_nationkey""".stripMargin)),

    // --- named paths (extension; reference rejects, CypherVisitor.cs:
    //     998-1002): two path variables bound in one MATCH, length()
    //     arithmetic over both, and a WHERE over a path length (the
    //     per-branch var-length lengths are pinned by unit tests on the
    //     movie graph — this schema's DAG gives each pattern one
    //     resolvable length)
    ("q43_named_path", cyx(
      """MATCH p = (c:Customer)-[:FROM_NATION]->(n:Nation),
        |      q = (s:Supplier)-[:LOCATED_IN]->(n)
        |WHERE length(p) = 1 AND c.c_acctbal > 9000.0
        |RETURN n.n_name AS nation, length(p) + length(q) AS hops,
        |       count(c.c_custkey) AS pairs
        |ORDER BY nation""".stripMargin),
      Some("""SELECT n.n_name AS nation, CAST(2 AS BIGINT) AS hops,
             |       count(c.c_custkey) AS pairs
             |FROM customer c
             |JOIN nation n ON n.n_nationkey = c.c_nationkey
             |JOIN supplier s ON s.s_nationkey = n.n_nationkey
             |WHERE c.c_acctbal > 9000.0
             |GROUP BY 1 ORDER BY nation""".stripMargin)),

    // --- shortestPath (extension; the reference has no shortest-path
    //     support): one row per (order, supplier) binding — the
    //     SUPPLIED_BY edge table is lineitem, so a plain MATCH yields
    //     one row per lineitem; shortestPath collapses same-length
    //     paths per binding (the len-2 branch has no resolution here)
    ("q44_shortest_path", cyx(
      """MATCH p = shortestPath((o:Order)-[:SUPPLIED_BY*1..2]->(s:Supplier))
        |RETURN s.s_name AS sname, length(p) AS hops,
        |       count(o.o_orderkey) AS n_orders
        |ORDER BY sname""".stripMargin),
      Some("""SELECT s_name AS sname, CAST(1 AS BIGINT) AS hops,
             |       count(*) AS n_orders
             |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) j
             |JOIN supplier ON s_suppkey = l_suppkey
             |GROUP BY 1, 2 ORDER BY sname""".stripMargin)),

    // --- allShortestPaths (extension): q44's twin WITHOUT the
    //     one-per-binding collapse — parallel SUPPLIED_BY edges (one
    //     per lineitem) are distinct minimal paths, so the path count
    //     is the raw lineitem count, not the DISTINCT pair count
    ("q45_all_shortest", cyx(
      """MATCH p = allShortestPaths((o:Order)-[:SUPPLIED_BY*1..2]->(s:Supplier))
        |RETURN s.s_name AS sname, length(p) AS hops,
        |       count(o.o_orderkey) AS n_paths
        |ORDER BY sname""".stripMargin),
      Some("""SELECT s_name AS sname, CAST(1 AS BIGINT) AS hops,
             |       count(*) AS n_paths
             |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
             |GROUP BY 1, 2 ORDER BY sname""".stripMargin)),

    // --- COUNT { pattern } subquery expression (Cypher 5, extension):
    //     per-supplier supply-edge count, zero-match suppliers report 0
    //     (desugars to size() of a 1-per-match pattern comprehension)
    ("q48_count_subquery", cyx(
      """MATCH (s:Supplier)
        |RETURN s.s_name AS sname,
        |       COUNT { (o:Order)-[:SUPPLIED_BY]->(s) } AS n_supply
        |ORDER BY sname""".stripMargin),
      Some("""SELECT s_name AS sname,
             |       CAST(coalesce(c.n, 0) AS INTEGER) AS n_supply
             |FROM supplier LEFT JOIN (
             |  SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1) c
             |  ON c.l_suppkey = s_suppkey
             |ORDER BY sname""".stripMargin)),

    // --- EXISTS { } as a projection EXPRESSION (boolean-valued
    //     existential; desugars to size(comprehension) > 0, while the
    //     WHERE position keeps its semi-join lowering)
    ("q49_exists_expr", cyx(
      """MATCH (c:Customer)
        |RETURN c.c_name AS cname,
        |       CASE WHEN EXISTS { (c)-[:PLACED]->(o:Order) }
        |            THEN 1 ELSE 0 END AS has_orders
        |ORDER BY cname LIMIT 50""".stripMargin),
      Some("""SELECT c_name AS cname,
             |  CAST(CASE WHEN EXISTS (SELECT 1 FROM orders
             |                         WHERE o_custkey = c_custkey)
             |       THEN 1 ELSE 0 END AS BIGINT) AS has_orders
             |FROM customer ORDER BY cname LIMIT 50""".stripMargin)),

    // --- inline property maps (extension; the reference rejects them,
    //     CypherVisitor.cs:1094-1097,1173-1176): an ANONYMOUS node map
    //     ({n_name: …} desugars onto a parser-synthesized alias), a
    //     BOUND relationship map [l:CONTAINS {l_returnflag: …}], both
    //     lowered to WHERE conjuncts at parse time
    ("q50_property_maps", cyx(
      """MATCH (c:Customer)-[:FROM_NATION]->({n_name: 'NATION_5'}),
        |      (c)-[:PLACED]->(o:Order)
        |        -[l:CONTAINS {l_returnflag: 'R'}]->(p:Part)
        |RETURN c.c_name AS cname, count(p) AS n_items,
        |       round(sum(l.l_extendedprice), 2) AS revenue
        |ORDER BY cname""".stripMargin),
      Some("""SELECT c_name AS cname, count(p_partkey) AS n_items,
             |       round(sum(l_extendedprice), 2) AS revenue
             |FROM customer
             |JOIN nation ON n_nationkey = c_nationkey
             |           AND n_name = 'NATION_5'
             |JOIN orders ON o_custkey = c_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |             AND l_returnflag = 'R'
             |JOIN part ON p_partkey = l_partkey
             |GROUP BY 1 ORDER BY cname""".stripMargin)),

    // --- multi-label patterns (extension; reference rejects,
    //     CypherVisitor.cs:1119-1127): label-set intersection via
    //     schema-declared sub-labels — same table, one discriminator
    //     WHERE conjunct each, no second scan
    ("q51_multi_label", cyx(
      """MATCH (c:Customer:BuildingCustomer)
        |        -[:PLACED]->(o:Order:UrgentOrder)
        |RETURN c.c_mktsegment AS seg, count(o) AS n_urgent,
        |       round(sum(o.o_totalprice), 2) AS total""".stripMargin),
      Some("""SELECT c_mktsegment AS seg, count(o_orderkey) AS n_urgent,
             |       round(sum(o_totalprice), 2) AS total
             |FROM customer JOIN orders ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderpriority = '1-URGENT'
             |GROUP BY 1""".stripMargin)),

    // --- unbounded variable-length [*1..] (extension; reference
    //     rejects all var-length, CypherVisitor.cs:2035-2039):
    //     reachable-pair semantics via iterate-to-fixpoint BFS over the
    //     NEXT_IN_REGION self-type chain — mirrored by a DuckDB
    //     recursive CTE (UNION-distinct = the same pair semantics)
    ("q52_unbounded_reach", cyx(
      """MATCH (a:Nation)-[:NEXT_IN_REGION*1..]->(b:Nation)
        |RETURN a.n_name AS src_name, b.n_name AS dst_name
        |ORDER BY src_name, dst_name""".stripMargin),
      Some("""WITH RECURSIVE chain AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation),
             |reach AS (
             |  SELECT src, dst FROM chain WHERE dst IS NOT NULL
             |  UNION
             |  SELECT r.src, c.dst FROM reach r
             |  JOIN chain c ON c.src = r.dst WHERE c.dst IS NOT NULL)
             |SELECT a.n_name AS src_name, b.n_name AS dst_name
             |FROM reach
             |JOIN nation a ON a.n_nationkey = reach.src
             |JOIN nation b ON b.n_nationkey = reach.dst
             |ORDER BY src_name, dst_name""".stripMargin)),

    // --- shortestPath over an UNBOUNDED range (round 9): min-distance
    //     per pair IS the reach BFS's first-discovery round, so the
    //     lowering adds a __dist column and binds length(p) to it — no
    //     per-path enumeration anywhere. Mirrored by the q52 recursive
    //     CTE carrying a hop counter, min() per pair.
    ("q67_unbounded_shortest", cyx(
      """MATCH p = shortestPath((a:Nation)-[:NEXT_IN_REGION*1..]->(b:Nation))
        |RETURN a.n_name AS src_name, b.n_name AS dst_name,
        |       length(p) AS hops
        |ORDER BY src_name, dst_name""".stripMargin),
      Some("""WITH RECURSIVE chain AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation),
             |reach AS (
             |  SELECT src, dst, 1 AS d FROM chain WHERE dst IS NOT NULL
             |  UNION
             |  SELECT r.src, c.dst, r.d + 1 FROM reach r
             |  JOIN chain c ON c.src = r.dst WHERE c.dst IS NOT NULL)
             |SELECT a.n_name AS src_name, b.n_name AS dst_name,
             |       CAST(min(reach.d) AS BIGINT) AS hops
             |FROM reach
             |JOIN nation a ON a.n_nationkey = reach.src
             |JOIN nation b ON b.n_nationkey = reach.dst
             |GROUP BY 1, 2
             |ORDER BY src_name, dst_name""".stripMargin)),

    // --- anchored unbounded shortestPath (round 9): the inline
    //     property map anchors the source, so the BFS frontier seeds
    //     from ONE node (q56's anchoring) and the dist column rides the
    //     cone; WHERE over length(p) composes in the same clause
    ("q68_anchored_shortest", cyx(
      """MATCH p = shortestPath(
        |  (a:Nation {n_nationkey: 0})-[:NEXT_IN_REGION*1..]->(b:Nation))
        |WHERE length(p) >= 2
        |RETURN b.n_name AS dst_name, length(p) AS hops
        |ORDER BY dst_name""".stripMargin),
      Some("""WITH RECURSIVE chain AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation),
             |reach AS (
             |  SELECT src, dst, 1 AS d FROM chain
             |  WHERE dst IS NOT NULL AND src = 0
             |  UNION
             |  SELECT r.src, c.dst, r.d + 1 FROM reach r
             |  JOIN chain c ON c.src = r.dst WHERE c.dst IS NOT NULL)
             |SELECT b.n_name AS dst_name, CAST(min(reach.d) AS BIGINT) AS hops
             |FROM reach JOIN nation b ON b.n_nationkey = reach.dst
             |GROUP BY 1 HAVING min(reach.d) >= 2
             |ORDER BY dst_name""".stripMargin)),

    // --- terminal CREATE (round 10; completes the update triad over
    //     the reference's read-only boundary CypherVisitor.cs:486-489;
    //     parity keeps the rejection): unconditional append — one
    //     fresh Customer row per feed row, the map binds the id plus
    //     any declared properties, unassigned properties null. NO
    //     match branch / winner-dedup / anti-join (INSERT semantics:
    //     id uniqueness is the caller's contract), so the plan is
    //     append-only — the snapshot is never joined or shuffled
    ("q69_create_snapshot",
      (s, dir) => cyx(
        """MATCH (sup:Supplier) WHERE sup.s_acctbal > 9000.0
          |WITH sup.s_suppkey AS sk, sup.s_acctbal AS ab
          |CREATE (c:Customer {c_custkey: sk + 1000000,
          |                    c_name: 'NEW_' + toString(sk),
          |                    c_acctbal: ab})""".stripMargin)
        .apply(s, dir).orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
             |       c_nationkey
             |FROM customer
             |UNION ALL
             |SELECT s_suppkey + 1000000 AS c_custkey,
             |       'NEW_' || CAST(s_suppkey AS VARCHAR) AS c_name,
             |       s_acctbal AS c_acctbal,
             |       CAST(NULL AS VARCHAR) AS c_mktsegment,
             |       CAST(NULL AS BIGINT) AS c_nationkey
             |FROM supplier WHERE s_acctbal > 9000.0
             |ORDER BY c_custkey""".stripMargin)),

    // --- anchored allShortestPaths over an unbounded range (round
    //     10): the reach BFS carries the shortest-path count σ
    //     (Brandes' forward pass — a per-round groupBy-sum on slim
    //     rows, no per-path state) and each (src, dst) pair row
    //     multiplies σ-fold, giving one row per minimal path; the
    //     oracle enumerates minimal walks with a UNION ALL recursive
    //     CTE over the branching jump DAG
    ("q72_all_shortest", cyx(
      """MATCH p = allShortestPaths(
        |  (a:Nation {n_nationkey: 0})-[:JUMPS_TO*1..]->(b:Nation))
        |RETURN b.n_name AS dst_name, length(p) AS hops
        |ORDER BY dst_name, hops""".stripMargin),
      Some("""WITH RECURSIVE e AS (
             |  SELECT src, dst FROM (
             |    SELECT n_nationkey AS src,
             |           lead(n_nationkey, 1) OVER
             |             (PARTITION BY n_regionkey
             |              ORDER BY n_nationkey) AS dst
             |    FROM nation
             |    UNION ALL
             |    SELECT n_nationkey AS src,
             |           lead(n_nationkey, 2) OVER
             |             (PARTITION BY n_regionkey
             |              ORDER BY n_nationkey) AS dst
             |    FROM nation)
             |  WHERE dst IS NOT NULL),
             |walks AS (
             |  SELECT src, dst, 1 AS d FROM e WHERE src = 0
             |  UNION ALL
             |  SELECT w.src, e.dst, w.d + 1
             |  FROM walks w JOIN e ON e.src = w.dst),
             |mins AS (
             |  SELECT src, dst, min(d) AS md FROM walks GROUP BY 1, 2)
             |SELECT b.n_name AS dst_name, CAST(w.d AS BIGINT) AS hops
             |FROM walks w
             |JOIN mins m ON m.src = w.src AND m.dst = w.dst AND w.d = m.md
             |JOIN nation b ON b.n_nationkey = w.dst
             |ORDER BY dst_name, hops""".stripMargin)),

    // --- shortestPath over an unbounded range inside OPTIONAL MATCH
    //     (round 10): the reach frame compiles standalone and LEFT
    //     joins once — the q62 branch-union discipline — so the
    //     path-length column null-fills on unmatched rows (Cypher's
    //     null-on-miss contract for free); the clause WHERE filters
    //     the optional side BEFORE the join
    ("q73_optional_shortest", cyx(
      """MATCH (a:Nation) WHERE a.n_nationkey <= 12
        |OPTIONAL MATCH p = shortestPath(
        |  (a)-[:NEXT_IN_REGION*1..]->(b:Nation))
        |WHERE length(p) >= 2
        |RETURN a.n_name AS src_name, b.n_name AS dst_name,
        |       length(p) AS hops
        |ORDER BY src_name, dst_name""".stripMargin),
      Some("""WITH RECURSIVE chain AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation),
             |reach AS (
             |  SELECT src, dst, 1 AS d FROM chain WHERE dst IS NOT NULL
             |  UNION
             |  SELECT r.src, c.dst, r.d + 1 FROM reach r
             |  JOIN chain c ON c.src = r.dst WHERE c.dst IS NOT NULL),
             |sp AS (
             |  SELECT src, dst, CAST(min(d) AS BIGINT) AS md
             |  FROM reach GROUP BY 1, 2 HAVING min(d) >= 2)
             |SELECT a.n_name AS src_name, b.n_name AS dst_name,
             |       sp.md AS hops
             |FROM nation a
             |LEFT JOIN sp ON sp.src = a.n_nationkey
             |LEFT JOIN nation b ON b.n_nationkey = sp.dst
             |WHERE a.n_nationkey <= 12
             |ORDER BY src_name, dst_name""".stripMargin)),

    // --- heterogeneous unbounded chain (round 10): the FEEDS verb
    //     spans Customer→Order and Order→Part, so the BFS runs over a
    //     union of both edge frames with `label:id` tagged namespaces
    //     (colliding raw ids can never conflate) and the result
    //     filters to the pattern's endpoint labels, tags stripped —
    //     count(b) counts the deduped reachable pairs
    ("q74_hetero_reach", cyx(
      """MATCH (a:Customer)-[:FEEDS*1..]->(b:Part)
        |WHERE a.c_custkey <= 5
        |RETURN a.c_custkey AS ck, count(b) AS n_parts
        |ORDER BY ck""".stripMargin),
      Some("""SELECT o_custkey AS ck,
             |       count(DISTINCT l_partkey) AS n_parts
             |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE o_custkey <= 5
             |GROUP BY 1 ORDER BY ck""".stripMargin)),

    // --- mid-query SET … RETURN (round 10): the RETURN reads the
    //     UPDATED entity per row (rhs reads the OLD value;
    //     simultaneous-assignment semantics) — the result is the
    //     projection, not the snapshot union, and the plan is
    //     map-only on top of the match
    ("q75_set_return", cyx(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WHERE o.o_totalprice > 200000.0
        |SET c.c_acctbal = c.c_acctbal + 100.0
        |RETURN c.c_custkey AS ck, round(c.c_acctbal, 2) AS bal,
        |       count(o) AS n_big
        |ORDER BY ck""".stripMargin),
      Some("""SELECT c_custkey AS ck,
             |       round(c_acctbal + 100.0, 2) AS bal,
             |       count(*) AS n_big
             |FROM customer JOIN orders ON o_custkey = c_custkey
             |WHERE o_totalprice > 200000.0
             |GROUP BY 1, 2 ORDER BY ck""".stripMargin)),

    // --- per-hop predicate on an unbounded var-length (round 10):
    //     [j:JUMPS_TO* WHERE j.jump_span = 1] filters EVERY traversed
    //     edge — lowered to one map-side `where` on the edge frame
    //     BEFORE the BFS (HopPred synthetic verb), so anchoring,
    //     shortestPath and the closure guard compose unchanged;
    //     restricted to the unit chain, the min distance from nation
    //     0 is exactly the within-region rank
    ("q80_hop_pred", cyx(
      """MATCH p = shortestPath(
        |  (a:Nation {n_nationkey: 0})
        |  -[j:JUMPS_TO* WHERE j.jump_span = 1]->(b:Nation))
        |RETURN b.n_name AS dst_name, length(p) AS hops
        |ORDER BY dst_name""".stripMargin),
      Some("""WITH s AS (
             |  SELECT n_nationkey, n_name,
             |         row_number() OVER (ORDER BY n_nationkey) - 1
             |           AS rk
             |  FROM nation
             |  WHERE n_regionkey =
             |    (SELECT n_regionkey FROM nation WHERE n_nationkey = 0))
             |SELECT n_name AS dst_name, rk AS hops FROM s WHERE rk > 0
             |ORDER BY dst_name""".stripMargin)),

    // --- DELETE … RETURN (round 10): the RETURN reads the DELETED
    //     rows' PRE-delete values — "show what this deletes" as one
    //     query; map-only on the match, the snapshot is never
    //     anti-joined
    ("q83_delete_return", cyx(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |WHERE n.n_name = 'FRANCE'
        |DETACH DELETE c
        |RETURN count(c.c_custkey) AS n_del,
        |       round(sum(c.c_acctbal), 2) AS bal_del""".stripMargin),
      Some("""SELECT count(*) AS n_del,
             |       round(sum(c_acctbal), 2) AS bal_del
             |FROM customer JOIN nation ON n_nationkey = c_nationkey
             |WHERE n_name = 'FRANCE'""".stripMargin)),

    // --- standalone RETURN / UNWIND (round 10): no MATCH — one
    //     literal row (SQL's SELECT-without-FROM), UNWIND generating
    //     rows from a literal list; parity keeps the rejections
    ("q84_standalone_return", cyx(
      """UNWIND [1, 2, 3, 4, 5] AS x
        |WITH x WHERE x % 2 = 1
        |RETURN x, x * x AS sq, toString(x) + '!' AS s
        |ORDER BY x""".stripMargin),
      Some("""SELECT x, x * x AS sq, CAST(x AS VARCHAR) || '!' AS s
             |FROM (SELECT unnest(generate_series(1, 5)) AS x) t
             |WHERE x % 2 = 1
             |ORDER BY x""".stripMargin)),

    // --- MATCH after UNWIND (round 10): an implicit `WITH *` splices
    //     the clauses into separate parts — Neo4j's free chaining,
    //     per-row join semantics (the generated rows multiply into
    //     the following MATCH)
    ("q85_unwind_match", cyx(
      """UNWIND [1, 2] AS k
        |MATCH (n:Nation) WHERE n.n_nationkey < 3
        |RETURN k, n.n_name AS nm, n.n_nationkey + k AS nk
        |ORDER BY k, nm""".stripMargin),
      Some("""SELECT k, n_name AS nm, n_nationkey + k AS nk
             |FROM (SELECT unnest(generate_series(1, 2)) AS k) t
             |CROSS JOIN nation WHERE n_nationkey < 3
             |ORDER BY k, nm""".stripMargin)),

    // --- first-clause OPTIONAL MATCH (round 10): seeded with ONE
    //     literal row, so zero matches leave exactly one all-null
    //     row (Neo4j's contract) — count(*) sees the row,
    //     count(column) does not
    ("q86_first_optional", cyx(
      """OPTIONAL MATCH (n:Nation) WHERE n.n_name = 'NOWHERE'
        |RETURN count(*) AS c, count(n.n_nationkey) AS ck""".stripMargin),
      Some("""SELECT count(*) AS c, count(n_nationkey) AS ck
             |FROM (VALUES (1)) one(x)
             |LEFT JOIN nation ON n_name = 'NOWHERE'""".stripMargin)),

    // --- MATCH directly after OPTIONAL MATCH (round 10): Neo4j keeps
    //     the piped rows and inner-joins the new pattern per row —
    //     null bindings from a missed optional never equi-join, so
    //     those rows drop (LEFT JOIN then INNER JOIN in SQL)
    ("q87_match_after_optional", cyx(
      """MATCH (n:Nation) WHERE n.n_nationkey < 10
        |OPTIONAL MATCH (c:Customer)-[:FROM_NATION]->(n)
        |WHERE c.c_acctbal > 9900
        |MATCH (c)-[:PLACED]->(o:Order)
        |RETURN n.n_name AS nation, count(*) AS cnt
        |ORDER BY nation""".stripMargin),
      Some("""SELECT n_name AS nation, count(*) AS cnt
             |FROM nation
             |LEFT JOIN customer
             |  ON c_nationkey = n_nationkey AND c_acctbal > 9900
             |JOIN orders ON o_custkey = c_custkey
             |WHERE n_nationkey < 10
             |GROUP BY n_name ORDER BY nation""".stripMargin)),

    // --- startNode()/endNode() (round 10): key-valued endpoint
    //     accessors on a bound relationship — the id() convention; no
    //     join, the endpoint keys already ride the edge row
    ("q88_start_end_node", cyx(
      """MATCH (c:Customer)-[r:PLACED]->(o:Order)
        |WHERE o.o_totalprice > 400000
        |RETURN startNode(r) AS src, endNode(r) AS dst
        |ORDER BY src, dst""".stripMargin),
      Some("""SELECT o_custkey AS src, o_orderkey AS dst
             |FROM orders WHERE o_totalprice > 400000
             |ORDER BY src, dst""".stripMargin)),

    // --- endpoint-creating relationship MERGE (round 11): id-map
    //     endpoints — MERGE (a:L {id: e})-[r:T]->(b:L2 {id: e2}) —
    //     key the edge per feed row without a preceding MATCH binding
    //     them (the standard Neo4j ingest idiom). Even order keys
    //     reuse the order's real customer (edge pair EXISTS → ON
    //     MATCH; node read-back sees the stored row), odd keys mint a
    //     ghost customer id (pair absent → ON CREATE; read-back sees
    //     id-only, name null)
    ("q89_merge_rel_ingest", cyx(
      """MATCH (c0:Customer)-[:PLACED]->(o:Order)
        |WHERE o.o_orderkey <= 6
        |MERGE (c:Customer {c_custkey:
        |    CASE WHEN o.o_orderkey % 2 = 0 THEN c0.c_custkey
        |         ELSE 900000 + o.o_orderkey END})
        |  -[g:PLACED]->(o2:Order {o_orderkey: o.o_orderkey})
        |ON MATCH SET g.o_orderdate = '1990-01-01'
        |ON CREATE SET g.o_orderdate = '2000-01-01'
        |RETURN c.c_custkey AS ck, c.c_name AS nm, o2.o_orderkey AS ok,
        |       g.o_orderdate AS odt
        |ORDER BY ck, ok""".stripMargin),
      Some("""WITH feed AS (
             |  SELECT DISTINCT
             |    CASE WHEN o_orderkey % 2 = 0 THEN o_custkey
             |         ELSE 900000 + o_orderkey END AS ck,
             |    o_orderkey AS ok
             |  FROM orders WHERE o_orderkey <= 6)
             |SELECT f.ck AS ck, c.c_name AS nm, f.ok AS ok,
             |  CASE WHEN e.o_orderkey IS NOT NULL
             |       THEN TIMESTAMP '1990-01-01 00:00:00'
             |       ELSE TIMESTAMP '2000-01-01 00:00:00' END AS odt
             |FROM feed f
             |LEFT JOIN orders e ON e.o_custkey = f.ck
             |  AND e.o_orderkey = f.ok
             |LEFT JOIN customer c ON c.c_custkey = f.ck
             |ORDER BY ck, ok""".stripMargin)),

    // --- MATCH-less relationship MERGE (round 11): the whole query is
    //     the MERGE — one literal feed row, both endpoints id-mapped;
    //     the absent (7, 999999) pair inserts from ON CREATE and the
    //     untouched edge snapshot anti-joins through
    ("q90_merge_rel_matchless",
      (s, dir) => cyx(
        """MERGE (a:Customer {c_custkey: 7})
          |  -[g:PLACED]->(b:Order {o_orderkey: 999999})
          |ON MATCH SET g.o_orderdate = '1990-01-01'
          |ON CREATE SET g.o_orderdate = '2001-02-03'""".stripMargin)
        .apply(s, dir).orderBy("o_custkey", "o_orderkey", "o_orderdate"),
      Some("""SELECT o_custkey, o_orderkey, o_orderdate FROM orders
             |UNION ALL
             |SELECT CAST(7 AS BIGINT), CAST(999999 AS BIGINT),
             |       TIMESTAMP '2001-02-03 00:00:00'
             |ORDER BY o_custkey, o_orderkey, o_orderdate""".stripMargin)),

    // --- relationship CREATE with id-map endpoints (round 11): the
    //     appended edge keys per feed row from the inline id maps —
    //     no bound endpoints, the CREATE twin of q89's ingest idiom
    ("q97_create_rel_idmap",
      (s, dir) => cyx(
        """MATCH (o:Order) WHERE o.o_orderkey <= 5
          |CREATE (c:Customer {c_custkey: 800000 + o.o_orderkey})
          |  -[:PLACED {o_orderdate: '2005-05-05'}]
          |  ->(o2:Order {o_orderkey: o.o_orderkey})""".stripMargin)
        .apply(s, dir).orderBy("o_custkey", "o_orderkey", "o_orderdate"),
      Some("""SELECT o_custkey, o_orderkey, o_orderdate FROM orders
             |UNION ALL
             |SELECT 800000 + o_orderkey, o_orderkey,
             |       TIMESTAMP '2005-05-05 00:00:00'
             |FROM orders WHERE o_orderkey <= 5
             |ORDER BY o_custkey, o_orderkey, o_orderdate""".stripMargin)),

    // --- MERGE … WITH chain (round 11): the post-merge read-back
    //     frame (q77's view) continues the pipeline — a WITH masks,
    //     a post-WITH WHERE filters, and the RETURN aggregates over
    //     the query's own upsert
    ("q94_merge_chain", cyx(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WHERE o.o_totalprice > 300000.0
        |WITH c.c_custkey + (o.o_orderkey % 2) * 1000000 AS k
        |MERGE (cu:Customer {c_custkey: k})
        |ON MATCH SET cu.c_acctbal = cu.c_acctbal + 1.0
        |ON CREATE SET cu.c_name = 'GHOST', cu.c_acctbal = 0.0
        |WITH cu.c_name AS nm, cu.c_acctbal AS bal
        |WHERE bal > 0.0
        |RETURN count(*) AS n, round(sum(bal), 2) AS total""".stripMargin),
      Some("""WITH feed AS (
             |  SELECT DISTINCT o_custkey + (o_orderkey % 2) * 1000000
             |    AS k
             |  FROM orders WHERE o_totalprice > 300000.0),
             |rb AS (
             |  SELECT CASE WHEN c.c_custkey IS NOT NULL
             |              THEN c.c_acctbal + 1.0 ELSE 0.0 END AS bal
             |  FROM feed f LEFT JOIN customer c ON c.c_custkey = f.k)
             |SELECT count(*) AS n, round(sum(bal), 2) AS total
             |FROM rb WHERE bal > 0.0""".stripMargin)),

    // --- CREATE … WITH chain (round 11): created rows continue into
    //     a downstream MATCH (cross join against the matched nation)
    ("q95_create_chain", cyx(
      """MATCH (c:Customer) WHERE c.c_acctbal > 9900.0
        |CREATE (g:Customer {c_custkey: c.c_custkey + 1000000,
        |                    c_name: 'CLONE', c_acctbal: c.c_acctbal})
        |WITH g
        |MATCH (n:Nation) WHERE n.n_nationkey = 0
        |RETURN g.c_custkey AS ck, g.c_name AS nm,
        |       round(g.c_acctbal, 2) AS bal, n.n_name AS nn
        |ORDER BY ck""".stripMargin),
      Some("""SELECT c_custkey + 1000000 AS ck, 'CLONE' AS nm,
             |       round(c_acctbal, 2) AS bal,
             |       (SELECT n_name FROM nation WHERE n_nationkey = 0)
             |         AS nn
             |FROM customer WHERE c_acctbal > 9900.0
             |ORDER BY ck""".stripMargin)),

    // --- DELETE … WITH chain (round 11): the deleted rows' PRE-delete
    //     values join a downstream MATCH through the piped entity
    ("q96_delete_chain", cyx(
      """MATCH (c:Customer) WHERE c.c_acctbal < -900.0
        |DETACH DELETE c
        |WITH c
        |MATCH (c)-[:PLACED]->(o:Order)
        |RETURN c.c_custkey AS ck, count(o) AS n
        |ORDER BY ck""".stripMargin),
      Some("""SELECT c_custkey AS ck, count(o_orderkey) AS n
             |FROM customer JOIN orders ON o_custkey = c_custkey
             |WHERE c_acctbal < -900.0
             |GROUP BY 1 ORDER BY ck""".stripMargin)),

    // --- UNANCHORED allShortestPaths (round 11): no endpoint anchors,
    //     so the witness BFS seeds from EVERY source node and rides
    //     the maxClosureRows guard (plus the per-round σ extrema
    //     probe) — the full witness table over the JUMPS_TO diamond
    //     DAG, σ per pair via implicit grouping
    ("q93_all_shortest_unanchored", cyx(
      """MATCH p = allShortestPaths((a:Nation)-[:JUMPS_TO*1..]->(b:Nation))
        |RETURN a.n_nationkey AS src, b.n_nationkey AS dst,
        |       count(*) AS sigma, min(length(p)) AS hops
        |ORDER BY src, dst""".stripMargin),
      Some("""WITH RECURSIVE s AS (
             |  SELECT n_nationkey, n_regionkey, row_number() OVER (
             |    PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn
             |  FROM nation),
             |e AS (
             |  SELECT a.n_nationkey AS src, b.n_nationkey AS dst
             |  FROM s a JOIN s b ON a.n_regionkey = b.n_regionkey
             |    AND b.rn - a.rn IN (1, 2)),
             |walk(src, dst, hops) AS (
             |  SELECT src, dst, 1 FROM e
             |  UNION ALL
             |  SELECT w.src, e.dst, w.hops + 1 FROM walk w
             |  JOIN e ON e.src = w.dst),
             |m AS (SELECT src, dst, min(hops) AS mh FROM walk
             |      GROUP BY 1, 2)
             |SELECT w.src AS src, w.dst AS dst, count(*) AS sigma,
             |       CAST(m.mh AS BIGINT) AS hops
             |FROM walk w JOIN m ON m.src = w.src AND m.dst = w.dst
             |  AND w.hops = m.mh
             |GROUP BY w.src, w.dst, m.mh
             |ORDER BY src, dst""".stripMargin)),

    // --- bounded zero-length [*0..k] (round 11): the L = 0 branch
    //     joins the bounded union as a single hop over a synthetic
    //     identity edge (one (id, id) row per node of the endpoint
    //     label) — one row per PATH like every bounded branch, so the
    //     diamond DAG contributes multiplicities (rank+3 is reachable
    //     two ways in two hops)
    ("q92_zero_length_bounded", cyx(
      """MATCH p = (a:Nation {n_nationkey: 0})-[:JUMPS_TO*0..2]->(b:Nation)
        |RETURN b.n_nationkey AS dst, length(p) AS hops
        |ORDER BY dst, hops""".stripMargin),
      Some("""WITH s AS (
             |  SELECT n_nationkey, n_regionkey, row_number() OVER (
             |    PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn
             |  FROM nation),
             |e AS (
             |  SELECT a.n_nationkey AS src, b.n_nationkey AS dst
             |  FROM s a JOIN s b ON a.n_regionkey = b.n_regionkey
             |    AND b.rn - a.rn IN (1, 2)),
             |u AS (
             |  SELECT n_nationkey AS dst, 0 AS hops FROM nation
             |  WHERE n_nationkey = 0
             |  UNION ALL
             |  SELECT e.dst, 1 AS hops FROM e WHERE e.src = 0
             |  UNION ALL
             |  SELECT e2.dst, 2 AS hops FROM e e1
             |  JOIN e e2 ON e2.src = e1.dst WHERE e1.src = 0)
             |SELECT dst, CAST(hops AS BIGINT) AS hops FROM u
             |ORDER BY dst, hops""".stripMargin)),

    // --- update chaining (round 11): SET … WITH … MATCH … — the
    //     pipeline continues over the per-row UPDATED frame, so the
    //     downstream MATCH joins the piped entity with its written
    //     values; the snapshot itself is untouched (reads-own-writes
    //     flows only through the carried frame)
    ("q91_set_chain", cyx(
      """MATCH (c:Customer) WHERE c.c_acctbal < 0.0
        |SET c.c_acctbal = 0.0, c.c_mktsegment = 'DELINQUENT'
        |WITH c
        |MATCH (c)-[:PLACED]->(o:Order)
        |RETURN c.c_custkey AS ck, c.c_mktsegment AS seg,
        |       round(c.c_acctbal, 2) AS bal, count(o) AS n
        |ORDER BY ck""".stripMargin),
      Some("""SELECT c_custkey AS ck, 'DELINQUENT' AS seg,
             |  CAST(0.0 AS DOUBLE) AS bal, count(o_orderkey) AS n
             |FROM customer JOIN orders ON o_custkey = c_custkey
             |WHERE c_acctbal < 0.0
             |GROUP BY 1 ORDER BY ck""".stripMargin)),

    // --- DISTINCT aggregates beyond count (round 10): sum/avg dedup
    //     the value per group BEFORE the aggregate buffer (the
    //     isDistinct AggregateExpression flag — a partial distinct on
    //     (keys, value), map-side combinable); parity keeps the
    //     reference's count-only restriction
    ("q82_distinct_aggs", cyx(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WITH c.c_mktsegment AS seg, year(o.o_orderdate) AS yr
        |RETURN seg, count(DISTINCT yr) AS cy,
        |       sum(DISTINCT yr) AS sy,
        |       round(avg(DISTINCT yr), 4) AS ay,
        |       min(yr) AS mn, max(yr) AS mx
        |ORDER BY seg""".stripMargin),
      Some("""SELECT c_mktsegment AS seg,
             |  count(DISTINCT year(o_orderdate)) AS cy,
             |  CAST(sum(DISTINCT year(o_orderdate)) AS BIGINT) AS sy,
             |  round(avg(DISTINCT year(o_orderdate)), 4) AS ay,
             |  min(year(o_orderdate)) AS mn,
             |  max(year(o_orderdate)) AS mx
             |FROM customer JOIN orders ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY seg""".stripMargin)),

    // --- zero-length [*0..] (round 10): the REFLEXIVE closure — the
    //     reach frame gains one (id, id) row per node of the shared
    //     endpoint label at distance 0 (the empty path), cyclic
    //     (x, x) rows at d > 0 drop first; with +1/+2 jumps the min
    //     distance to within-region rank rk is ceil(rk / 2), and the
    //     anchor itself appears at 0
    ("q81_zero_length", cyx(
      """MATCH p = shortestPath(
        |  (a:Nation {n_nationkey: 0})-[:JUMPS_TO*0..]->(b:Nation))
        |RETURN b.n_name AS dst_name, length(p) AS hops
        |ORDER BY dst_name""".stripMargin),
      Some("""WITH s AS (
             |  SELECT n_nationkey, n_name,
             |         row_number() OVER (ORDER BY n_nationkey) - 1
             |           AS rk
             |  FROM nation
             |  WHERE n_regionkey =
             |    (SELECT n_regionkey FROM nation WHERE n_nationkey = 0))
             |SELECT n_name AS dst_name,
             |       CAST(ceil(rk / 2.0) AS BIGINT) AS hops
             |FROM s ORDER BY dst_name""".stripMargin)),

    // --- CREATE … RETURN (round 10): the RETURN reads ONLY the
    //     created rows — alias bound to the new entity's values,
    //     unassigned properties null; snapshot never read (map-only
    //     on the feed)
    ("q76_create_return", cyx(
      """MATCH (sup:Supplier) WHERE sup.s_acctbal > 9000.0
        |WITH sup.s_suppkey AS sk, sup.s_acctbal AS ab
        |CREATE (c:Customer {c_custkey: sk + 1000000,
        |                    c_name: 'NEW_' + toString(sk),
        |                    c_acctbal: ab})
        |RETURN c.c_custkey AS ck, c.c_name AS nm,
        |       round(c.c_acctbal, 2) AS bal, c.c_mktsegment AS seg
        |ORDER BY ck""".stripMargin),
      Some("""SELECT s_suppkey + 1000000 AS ck,
             |       'NEW_' || CAST(s_suppkey AS VARCHAR) AS nm,
             |       round(s_acctbal, 2) AS bal,
             |       CAST(NULL AS VARCHAR) AS seg
             |FROM supplier WHERE s_acctbal > 9000.0
             |ORDER BY ck""".stripMargin)),

    // --- MERGE … RETURN (round 10): the RETURN reads the RESULTING
    //     entity per winner-deduped feed key — matched keys see the
    //     ON MATCH update, absent keys the ON CREATE row; untouched
    //     snapshot rows never enter the result
    ("q77_merge_return", cyx(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WHERE o.o_totalprice > 300000.0
        |WITH c.c_custkey + (o.o_orderkey % 2) * 1000000 AS k
        |MERGE (cu:Customer {c_custkey: k})
        |ON MATCH SET cu.c_acctbal = cu.c_acctbal + 1.0
        |ON CREATE SET cu.c_name = 'GHOST', cu.c_acctbal = 0.0
        |RETURN cu.c_custkey AS ck, cu.c_name AS nm,
        |       round(cu.c_acctbal, 2) AS bal
        |ORDER BY ck""".stripMargin),
      Some("""WITH feed AS (
             |  SELECT DISTINCT o_custkey + (o_orderkey % 2) * 1000000
             |    AS k
             |  FROM orders WHERE o_totalprice > 300000.0)
             |SELECT f.k AS ck,
             |  CASE WHEN c.c_custkey IS NOT NULL
             |       THEN c.c_name ELSE 'GHOST' END AS nm,
             |  round(CASE WHEN c.c_custkey IS NOT NULL
             |             THEN c.c_acctbal + 1.0 ELSE 0.0 END, 2) AS bal
             |FROM feed f LEFT JOIN customer c ON c.c_custkey = f.k
             |ORDER BY ck""".stripMargin)),

    // --- relationship CREATE (round 10): the edge twin of q69 —
    //     appends one edge row per feed row to the verb's EDGE
    //     snapshot, endpoint keys from the bound nodes' ids, map
    //     props cast through the stored type (string → timestamp
    //     here); append-only, the snapshot is never joined
    ("q78_create_rel",
      (s, dir) => cyx(
        """MATCH (c:Customer) WHERE c.c_acctbal > 9900.0
          |MATCH (o:Order) WHERE o.o_orderkey <= 5
          |CREATE (c)-[:PLACED {o_orderdate: '1999-12-31'}]->(o)"""
          .stripMargin)
        .apply(s, dir).orderBy("o_custkey", "o_orderkey", "o_orderdate"),
      Some("""SELECT o_custkey, o_orderkey, o_orderdate FROM orders
             |UNION ALL
             |SELECT c_custkey AS o_custkey, o_orderkey,
             |       TIMESTAMP '1999-12-31 00:00:00' AS o_orderdate
             |FROM customer CROSS JOIN
             |  (SELECT o_orderkey FROM orders WHERE o_orderkey <= 5)
             |WHERE c_acctbal > 9900.0
             |ORDER BY o_custkey, o_orderkey, o_orderdate"""
             .stripMargin)),

    // --- relationship MERGE (round 10): edge upsert keyed by the
    //     (src, snk) pair — matched pairs take ON MATCH, absent pairs
    //     insert from ON CREATE, untouched edge rows anti-join
    //     through; feed winner-dedups per pair first
    ("q79_merge_rel",
      (s, dir) => cyx(
        """MATCH (c:Customer)-[:PLACED]->(o:Order)
          |WHERE o.o_totalprice > 450000.0
          |MATCH (o2:Order) WHERE o2.o_orderkey <= 5
          |MERGE (c)-[g:PLACED]->(o2)
          |ON MATCH SET g.o_orderdate = '1995-06-01'
          |ON CREATE SET g.o_orderdate = '1999-01-01'""".stripMargin)
        .apply(s, dir).orderBy("o_custkey", "o_orderkey"),
      Some("""WITH bigc AS (
             |  SELECT DISTINCT o_custkey AS ck FROM orders
             |  WHERE o_totalprice > 450000.0),
             |low AS (
             |  SELECT o_orderkey AS ok FROM orders WHERE o_orderkey <= 5),
             |feed AS (SELECT ck, ok FROM bigc CROSS JOIN low)
             |SELECT o.o_custkey, o.o_orderkey,
             |  CASE WHEN f.ck IS NOT NULL
             |       THEN TIMESTAMP '1995-06-01 00:00:00'
             |       ELSE o.o_orderdate END AS o_orderdate
             |FROM orders o LEFT JOIN feed f
             |  ON f.ck = o.o_custkey AND f.ok = o.o_orderkey
             |UNION ALL
             |SELECT f.ck AS o_custkey, f.ok AS o_orderkey,
             |       TIMESTAMP '1999-01-01 00:00:00' AS o_orderdate
             |FROM feed f LEFT JOIN orders o
             |  ON o.o_custkey = f.ck AND o.o_orderkey = f.ok
             |WHERE o.o_orderkey IS NULL
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // --- SET += map sugar (round 10): each key of the literal map
    //     desugars at parse time to an ordinary assignment — same
    //     compile path, winner-dedup, stored-type casts and
    //     declared-property checks as spelled-out SET; rhs reads the
    //     OLD entity
    ("q70_set_map_sugar",
      (s, dir) => cyx(
        """MATCH (c:Customer) WHERE c.c_acctbal < 0.0
          |SET c += {c_mktsegment: 'DELINQUENT', c_acctbal: 0.0}"""
          .stripMargin)
        .apply(s, dir).orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name,
             |  CASE WHEN c_acctbal < 0.0 THEN 0.0
             |       ELSE c_acctbal END AS c_acctbal,
             |  CASE WHEN c_acctbal < 0.0 THEN 'DELINQUENT'
             |       ELSE c_mktsegment END AS c_mktsegment,
             |  c_nationkey
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // --- EXISTS inside OPTIONAL MATCH WHERE (round 11): the
    //     clause-correlated conjunct (through o) semi-join-filters the
    //     optional side BEFORE the left join; the outer-correlated one
    //     (through c) value-lowers to a per-outer-row boolean riding
    //     the ON condition (false rows null-fill, never drop the
    //     customer) — both decompositions in one query
    ("q100_exists_in_optional", cyx(
      """MATCH (c:Customer) WHERE c.c_custkey <= 50
        |OPTIONAL MATCH (c)-[pl:PLACED]->(o:Order)
        |WHERE EXISTS((:Customer)-[:PLACED_URGENT]->(o))
        |  AND EXISTS((c)-[:PLACED_URGENT]->(:Order))
        |RETURN c.c_custkey AS ck, count(o) AS n_urgent
        |ORDER BY ck""".stripMargin),
      Some("""SELECT c.c_custkey AS ck, count(o.o_orderkey) AS n_urgent
             |FROM customer c
             |LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
             |           WHERE o_orderpriority = '1-URGENT') o
             |  ON o.o_custkey = c.c_custkey
             |WHERE c.c_custkey <= 50
             |GROUP BY 1 ORDER BY ck""".stripMargin)),

    // --- pattern comprehension in MATCH WHERE (round 11): the degree
    //     predicate size([(c)-[:PLACED]->(o) | ...]) lowers like a
    //     projection item — correlated collect per outer key,
    //     left-joined back, helper column dropped after the filter
    ("q101_patcomp_in_where", cyx(
      """MATCH (c:Customer)
        |WHERE size([(c)-[:PLACED]->(o:Order) | o.o_orderkey]) >= 25
        |RETURN count(*) AS n""".stripMargin),
      Some("""SELECT count(*) AS n FROM (
             |  SELECT o_custkey FROM orders
             |  GROUP BY 1 HAVING count(*) >= 25) t""".stripMargin)),

    // --- nodes(p)/relationships(p) path accessors (round 12; the
    //     reference has no paths at all — CypherVisitor.cs:998-1002):
    //     each bounded var-length branch materializes witness arrays
    //     of its hops' entity structs (a pure projection over the
    //     already-joined columns — no extra scan or shuffle), so the
    //     everyday Neo4j idiom `[n IN nodes(p) | n.prop]` and the
    //     whole higher-order-function surface compose. Mirrored by a
    //     depth-capped DuckDB recursive walk carrying the chain string.
    ("q102_path_accessors", cyx(
      """MATCH p = (a:Nation)-[:NEXT_IN_REGION*1..3]->(b:Nation)
        |RETURN a.n_name AS src_name, b.n_name AS dst_name,
        |       length(p) AS hops,
        |       reduce(s = '', n IN nodes(p) | s + '>' + n.n_name)
        |         AS chain,
        |       size(relationships(p)) AS nrels
        |ORDER BY src_name, dst_name, hops""".stripMargin),
      Some("""WITH RECURSIVE chain AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation),
             |walk AS (
             |  SELECT c.src, c.dst, 1 AS d,
             |         '>' || a.n_name || '>' || b.n_name AS chain
             |  FROM chain c
             |  JOIN nation a ON a.n_nationkey = c.src
             |  JOIN nation b ON b.n_nationkey = c.dst
             |  WHERE c.dst IS NOT NULL
             |  UNION ALL
             |  SELECT w.src, c.dst, w.d + 1, w.chain || '>' || b.n_name
             |  FROM walk w
             |  JOIN chain c ON c.src = w.dst
             |  JOIN nation b ON b.n_nationkey = c.dst
             |  WHERE c.dst IS NOT NULL AND w.d < 3)
             |SELECT a.n_name AS src_name, b.n_name AS dst_name,
             |       CAST(w.d AS BIGINT) AS hops, w.chain AS chain,
             |       CAST(w.d AS INTEGER) AS nrels
             |FROM walk w
             |JOIN nation a ON a.n_nationkey = w.src
             |JOIN nation b ON b.n_nationkey = w.dst
             |ORDER BY src_name, dst_name, hops""".stripMargin)),

    // --- temporal function surface (round 12): date.truncate /
    //     datetime.truncate (codegen'd date_trunc), duration.between
    //     (exact timestamp subtraction → day-time interval, consumed
    //     by temporal arithmetic since parquet carries no intervals),
    //     and the epochSeconds accessor — all mirrored by DuckDB
    //     date_trunc / INTERVAL arithmetic / epoch().
    ("q105_temporal_fns", cyx(
      """MATCH (c:Customer)-[p:PLACED]->(o:Order)
        |WHERE c.c_custkey <= 200
        |RETURN datetime(date.truncate('month', p.o_orderdate)) AS mon,
        |       count(*) AS n,
        |       min(o.o_orderdate.epochSeconds) AS es,
        |       max(o.o_orderdate + duration.between(
        |           datetime('2020-01-01T00:00:00'),
        |           datetime('2020-01-08T12:30:00'))) AS shifted
        |ORDER BY mon""".stripMargin),
      Some("""SELECT date_trunc('month', o_orderdate) AS mon,
             |       count(*) AS n,
             |       CAST(min(epoch(o_orderdate)) AS BIGINT) AS es,
             |       max(o_orderdate +
             |           INTERVAL '7 days 12 hours 30 minutes') AS shifted
             |FROM orders JOIN customer ON c_custkey = o_custkey
             |WHERE c_custkey <= 200
             |GROUP BY 1 ORDER BY mon""".stripMargin)),

    // --- relationship MERGE with a property-map match key (round 12;
    //     Neo4j matches on pair AND map): feed rows whose map value
    //     equals the edge's stored o_orderdate match their own edge
    //     (ok <= 100); the shifted-date rows (100 < ok <= 200) match
    //     nothing and create a SECOND edge row on the same pair with
    //     the map value stamped — both branches in one snapshot,
    //     mirrored by a plain UNION ALL in DuckDB.
    ("q104_merge_rel_map",
      (s, dir) => cyx(
        """MATCH (c:Customer)-[:PLACED]->(o:Order)
          |WHERE o.o_orderkey <= 200
          |MERGE (c)-[g:PLACED {o_orderdate:
          |    CASE WHEN o.o_orderkey <= 100 THEN o.o_orderdate
          |         ELSE datetime('2030-01-01') END}]->(o)"""
          .stripMargin)
        .apply(s, dir).orderBy("o_custkey", "o_orderkey", "o_orderdate"),
      Some("""SELECT o_custkey, o_orderkey, o_orderdate FROM orders
             |UNION ALL
             |SELECT o_custkey, o_orderkey,
             |       TIMESTAMP '2030-01-01 00:00:00' AS o_orderdate
             |FROM orders WHERE o_orderkey > 100 AND o_orderkey <= 200
             |ORDER BY o_custkey, o_orderkey, o_orderdate""".stripMargin)),

    // --- unbounded shortestPath WITNESSES (round 13): the reach BFS
    //     records one parent pointer per (seed, node) pair; a driver
    //     loop bounded by the max DISTANCE (never the path count)
    //     walks the pointers back into nodes(p) — here the chain walk
    //     from nation 0, each witness the unique chain prefix, its
    //     names folded to a string for the gate's row compare.
    ("q124_unbounded_witness", cyx(
      """MATCH p = shortestPath(
        |  (a:Nation {n_nationkey: 0})-[:NEXT_IN_REGION*]->(b:Nation))
        |RETURN b.n_name AS dst, length(p) AS hops,
        |       reduce(s = '', n IN nodes(p) | s + '|' + n.n_name)
        |         AS names
        |ORDER BY dst""".stripMargin),
      Some("""WITH s AS (
             |  SELECT n_nationkey, n_name,
             |         row_number() OVER (ORDER BY n_nationkey) - 1 AS rk
             |  FROM nation
             |  WHERE n_regionkey =
             |    (SELECT n_regionkey FROM nation WHERE n_nationkey = 0))
             |SELECT s.n_name AS dst, s.rk AS hops,
             |       (SELECT string_agg('|' || s2.n_name, ''
             |                          ORDER BY s2.rk)
             |        FROM s s2 WHERE s2.rk <= s.rk) AS names
             |FROM s WHERE s.rk > 0 ORDER BY dst""".stripMargin)),

    // --- SHORTEST k GROUPS selector (round 14): every path in the k
    //     shortest LENGTH groups per pair — dense rank over length,
    //     path multiplicity preserved (two distinct length-2 routes
    //     both emit). Mirrored with a recursive path enumeration and
    //     dense_rank.
    // --- SHORTEST k GROUPS over an UNBOUNDED range (round 15,
    //     VERDICT-r14 #2): anchored k-level σ DP over the JUMPS_TO
    //     jump DAG — per destination the 2 smallest distinct walk
    //     lengths, every path of those lengths kept (σ multiplicity).
    //     DuckDB mirror: recursive path enumeration + dense_rank.
    ("q161_shortest_groups_unbounded", cyx(
      """MATCH p = SHORTEST 2 GROUPS
        |  (a:Nation {n_nationkey: 0})-[:JUMPS_TO*]->(b:Nation)
        |RETURN b.n_nationkey AS bk, length(p) AS l
        |ORDER BY bk, l""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |walk(dst, hops) AS (
             |  SELECT 0, 0
             |  UNION ALL
             |  SELECT e.dst, w.hops + 1
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 10),
             |r AS (SELECT dst, hops,
             |        dense_rank() OVER (PARTITION BY dst
             |                           ORDER BY hops) AS rk
             |      FROM walk WHERE hops > 0)
             |SELECT dst AS bk, CAST(hops AS BIGINT) AS l
             |FROM r WHERE rk <= 2
             |ORDER BY bk, l""".stripMargin)),

    // --- SHORTEST k (row form) over an UNBOUNDED range (round 15):
    //     the k FIRST paths by length per pair — cumulative-σ capped
    //     at k; row_number mirror.
    ("q162_shortest_k_unbounded", cyx(
      """MATCH p = SHORTEST 2
        |  (a:Nation {n_nationkey: 0})-[:JUMPS_TO*]->(b:Nation)
        |RETURN b.n_nationkey AS bk, length(p) AS l
        |ORDER BY bk, l""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |walk(dst, hops) AS (
             |  SELECT 0, 0
             |  UNION ALL
             |  SELECT e.dst, w.hops + 1
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 10),
             |r AS (SELECT dst, hops,
             |        row_number() OVER (PARTITION BY dst
             |                           ORDER BY hops) AS rk
             |      FROM walk WHERE hops > 0)
             |SELECT dst AS bk, CAST(hops AS BIGINT) AS l
             |FROM r WHERE rk <= 2
             |ORDER BY bk, l""".stripMargin)),

    // --- rel-LIST variable (round 15, VERDICT-r14 #1): the everyday
    //     Neo4j spelling `(a)-[rs:R*1..3]->(b)` binds rs to the LIST
    //     of traversed relationship rows — projected (size), reduced
    //     (per-hop property sum) and lambda-read here, mirrored by a
    //     DuckDB recursive walk carrying hop count / span total /
    //     all-unit flag per path.
    ("q159_rel_list_var", cyx(
      """MATCH (a:Nation)-[rs:JUMPS_TO*1..3]->(b:Nation)
        |RETURN a.n_name AS src_name, b.n_name AS dst_name,
        |       size(rs) AS nrels,
        |       reduce(s = 0, r IN rs | s + r.jump_span) AS span_total,
        |       ALL(r IN rs WHERE r.jump_span = 1) AS unit_walk
        |ORDER BY src_name, dst_name, nrels, span_total, unit_walk"""
        .stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst,
             |         1 AS span
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey),
             |         2
             |  FROM nation),
             |e AS (SELECT * FROM nj WHERE dst IS NOT NULL),
             |walk AS (
             |  SELECT src, dst, 1 AS d, span AS tot, span = 1 AS unit
             |  FROM e
             |  UNION ALL
             |  SELECT w.src, e.dst, w.d + 1, w.tot + e.span,
             |         w.unit AND e.span = 1
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.d < 3)
             |SELECT a.n_name AS src_name, b.n_name AS dst_name,
             |       CAST(w.d AS INTEGER) AS nrels,
             |       CAST(w.tot AS BIGINT) AS span_total,
             |       w.unit AS unit_walk
             |FROM walk w
             |JOIN nation a ON a.n_nationkey = w.src
             |JOIN nation b ON b.n_nationkey = w.dst
             |ORDER BY src_name, dst_name, nrels, span_total, unit_walk"""
        .stripMargin)),

    // --- GQL group variable (round 15, VERDICT-r14 #8): a named rel
    //     of a single-relationship quantified group reads OUTSIDE the
    //     group as the per-path list of repetition relationships; the
    //     group WHERE reads the same name PER REPETITION. The span-1
    //     sub-DAG of JUMPS_TO is the unit chain — mirrored by the
    //     q102-style recursive walk over it.
    ("q160_qpp_group_var", cyx(
      """MATCH (a:Nation)
        |  ((x)-[j:JUMPS_TO]->(y) WHERE j.jump_span = 1){1,3}
        |  (b:Nation)
        |RETURN a.n_name AS src_name, b.n_name AS dst_name,
        |       size(j) AS nrels,
        |       reduce(s = 0, r IN j | s + r.jump_span) AS span_total
        |ORDER BY src_name, dst_name, nrels""".stripMargin),
      Some("""WITH RECURSIVE chain AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation),
             |c2 AS (SELECT * FROM chain WHERE dst IS NOT NULL),
             |walk AS (
             |  SELECT src, dst, 1 AS d FROM c2
             |  UNION ALL
             |  SELECT w.src, c.dst, w.d + 1
             |  FROM walk w JOIN c2 c ON c.src = w.dst
             |  WHERE w.d < 3)
             |SELECT a.n_name AS src_name, b.n_name AS dst_name,
             |       CAST(w.d AS INTEGER) AS nrels,
             |       CAST(w.d AS BIGINT) AS span_total
             |FROM walk w
             |JOIN nation a ON a.n_nationkey = w.src
             |JOIN nation b ON b.n_nationkey = w.dst
             |ORDER BY src_name, dst_name, nrels""".stripMargin)),

    ("q158_shortest_groups", cyx(
      """MATCH p = SHORTEST 2 GROUPS
        |  (a:Nation {n_nationkey: 0})-[:JUMPS_TO*1..3]->(b:Nation)
        |RETURN b.n_nationkey AS bk, length(p) AS l
        |ORDER BY bk, l""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |walk(dst, hops) AS (
             |  SELECT 0, 0
             |  UNION ALL
             |  SELECT e.dst, w.hops + 1
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 3),
             |r AS (SELECT dst, hops,
             |        dense_rank() OVER (PARTITION BY dst
             |                           ORDER BY hops) AS rk
             |      FROM walk WHERE hops > 0)
             |SELECT dst AS bk, CAST(hops AS BIGINT) AS l
             |FROM r WHERE rk <= 2
             |ORDER BY bk, l""".stripMargin)),

    // --- Cypher 2025 clause sugar (round 14): LET (≡ WITH *, e AS v),
    //     FILTER (≡ WITH * WHERE), OFFSET (≡ SKIP), and ORDER BY
    //     NULLS FIRST/LAST — one pipeline exercising all four
    ("q157_clause_sugar", cyx(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |LET bucket = CASE WHEN o.o_totalprice > 150000 THEN 'hi'
        |             ELSE 'lo' END
        |FILTER o.o_orderkey <= 4000
        |RETURN c.c_custkey AS ck, o.o_orderkey AS ok, bucket
        |ORDER BY bucket ASC NULLS LAST, ok OFFSET 5 LIMIT 50"""
        .stripMargin),
      Some("""SELECT c_custkey AS ck, o_orderkey AS ok,
             |  CASE WHEN o_totalprice > 150000 THEN 'hi' ELSE 'lo' END
             |    AS bucket
             |FROM orders JOIN customer ON c_custkey = o_custkey
             |WHERE o_orderkey <= 4000
             |ORDER BY bucket, ok OFFSET 5 LIMIT 50""".stripMargin)),

    // --- GQL path selectors (round 14; Cypher 5.21 `SHORTEST k`):
    //     the bounded branch union ranks per binding pair — the
    //     branching JUMPS_TO DAG yields DUPLICATE visible rows when
    //     two distinct paths share a length (both kept, exactly k
    //     rows per pair). The DuckDB mirror enumerates paths
    //     recursively and row_number-ranks by length per destination.
    ("q156_shortest_k", cyx(
      """MATCH p = SHORTEST 2 (a:Nation)-[:JUMPS_TO*1..3]->(b:Nation)
        |WHERE a.n_nationkey = 0
        |RETURN b.n_nationkey AS bk, length(p) AS l
        |ORDER BY bk, l""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |walk(src0, dst, hops) AS (
             |  SELECT 0, 0, 0
             |  UNION ALL
             |  SELECT w.src0, e.dst, w.hops + 1
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 3),
             |r AS (SELECT dst, hops,
             |        row_number() OVER (PARTITION BY dst
             |                           ORDER BY hops) AS rk
             |      FROM walk WHERE hops > 0)
             |SELECT dst AS bk, CAST(hops AS BIGINT) AS l
             |FROM r WHERE rk <= 2
             |ORDER BY bk, l""".stripMargin)),

    // --- round(x, d, mode) + normalize() (round 14; Neo4j rounding
    //     modes via scaled double arithmetic, unicode normalization
    //     via the static java.text.Normalizer kernel — ASCII inputs
    //     here, so DuckDB mirrors it as identity; the accent/ligature
    //     forms are unit-pinned)
    ("q155_round_modes", cyx(
      """MATCH (o:Order) WHERE o.o_orderkey <= 200
        |WITH o.o_orderkey AS ok, o.o_totalprice / 7.0 AS x
        |RETURN ok,
        |       round(x, 2, 'UP') AS up, round(x, 2, 'DOWN') AS dn,
        |       round(x, 2, 'CEILING') AS ce, round(x, 2, 'FLOOR') AS fl,
        |       round(x, 2, 'HALF_UP') AS hu,
        |       normalize(lpad(toString(ok), 4, '0')) AS nm
        |ORDER BY ok""".stripMargin),
      Some("""WITH b AS (SELECT o_orderkey AS ok, o_totalprice / 7.0 AS x
             |           FROM orders WHERE o_orderkey <= 200)
             |SELECT ok,
             |  ceil(x * 100) / 100.0 AS up,
             |  floor(x * 100) / 100.0 AS dn,
             |  ceil(x * 100) / 100.0 AS ce,
             |  floor(x * 100) / 100.0 AS fl,
             |  round(x * 100, 0) / 100.0 AS hu,
             |  lpad(CAST(ok AS VARCHAR), 4, '0') AS nm
             |FROM b ORDER BY ok""".stripMargin)),

    // --- Neo4j 2025 string pads + list casts + GenAI vector
    //     similarity (round 14): lpad/rpad/btrim, per-element
    //     toIntegerList with the null-on-failure contract, and the
    //     vector-index scoring formulas (cosine → (1+cos)/2,
    //     euclidean → 1/(1+d²)) driven by data — DuckDB mirrors the
    //     math with list_dot_product-free scalar arithmetic.
    ("q154_pads_vectors", cyx(
      """MATCH (o:Order) WHERE o.o_orderkey <= 100
        |WITH o, o.o_totalprice / 100000.0 AS x
        |RETURN o.o_orderkey AS ok,
        |       lpad(toString(o.o_orderkey), 8, '0') AS pad,
        |       btrim(lpad(o.o_orderstatus, 4, 'x'), 'x') AS st,
        |       toIntegerList([toString(o.o_orderkey), 'z'])[0] AS li0,
        |       size(toIntegerList([toString(o.o_orderkey), 'z'])) AS ln,
        |       round(vector.similarity.cosine([x, 1.0], [1.0, 2.0]), 6)
        |         AS cs,
        |       round(vector.similarity.euclidean([x, 1.0], [1.0, 2.0]),
        |             6) AS es
        |ORDER BY ok""".stripMargin),
      Some("""SELECT o_orderkey AS ok,
             |  lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS pad,
             |  trim(lpad(o_orderstatus, 4, 'x'), 'x') AS st,
             |  CAST(o_orderkey AS BIGINT) AS li0,
             |  CAST(2 AS INTEGER) AS ln,
             |  round((1 + (x + 2.0) /
             |    (sqrt(x * x + 1.0) * sqrt(5.0))) / 2, 6) AS cs,
             |  round(1.0 / (1.0 + (x - 1.0) * (x - 1.0) + 1.0), 6)
             |    AS es
             |FROM (SELECT *, o_totalprice / 100000.0 AS x FROM orders)
             |WHERE o_orderkey <= 100
             |ORDER BY ok""".stripMargin)),

    // --- allShortestPaths WITNESSES over an unbounded range
    //     (round 14): the BFS keeps ALL min-distance parents and the
    //     pointer walk enumerates every minimal path — on the
    //     branching JUMPS_TO DAG a nation 3 steps ahead has σ
    //     equal-length witnesses, each a distinct nodes(p) row. The
    //     DuckDB mirror enumerates walks recursively (the DAG bounds
    //     it) and keeps min-length rows per destination.
    ("q153_all_shortest_witness", cyx(
      """MATCH p = allShortestPaths(
        |  (a:Nation {n_nationkey: 0})-[:JUMPS_TO*1..]->(b:Nation))
        |RETURN b.n_nationkey AS bk, length(p) AS hops,
        |       reduce(s = '', n IN nodes(p) |
        |         s + '|' + toString(n.n_nationkey)) AS ids
        |ORDER BY bk, ids""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |walk(dst, hops, ids) AS (
             |  SELECT 0, 0, '|0'
             |  UNION ALL
             |  SELECT e.dst, w.hops + 1,
             |         w.ids || '|' || CAST(e.dst AS VARCHAR)
             |  FROM walk w JOIN e ON e.src = w.dst),
             |m AS (SELECT dst, min(hops) AS mh FROM walk
             |      WHERE hops > 0 GROUP BY 1)
             |SELECT w.dst AS bk, CAST(w.hops AS BIGINT) AS hops, w.ids
             |FROM walk w JOIN m ON w.dst = m.dst AND w.hops = m.mh
             |ORDER BY bk, ids""".stripMargin)),

    // --- unbounded shortestPath WITNESSES over the heterogeneous
    //     FEEDS chain (round 14): Customer→Order→Part under one verb —
    //     the tagged parent pointers carry the per-wave label, so
    //     nodes(p)/relationships(p) read merged-namespace elements
    //     (each hop joins back to its own table). The tie-break is the
    //     min tagged id: the witness order for each part is the
    //     customer's MINIMUM order containing it — mirrored exactly.
    // --- allShortestPaths witnesses over a HETEROGENEOUS chain
    //     (round 15, VERDICT-r14 #5): the tagged multi-parent BFS +
    //     σ-fold pointer walk — a part fed through TWO of customer
    //     1's orders yields TWO minimal witnesses, each hop resolving
    //     to its own def's columns. Mirror: one row per distinct
    //     (order, part) route.
    // --- hetero k-level WITNESSES (round 16, closing VERDICT-r15
    //     #2+#4's intersection): SHORTEST k GROUPS over the tagged
    //     FEEDS union with nodes(p) — each enumerated path's tagged
    //     ids resolve to their own tables; row multiplicity kept (no
    //     DISTINCT in the mirror — a duplicated lineitem pair is two
    //     paths).
    ("q173_hetero_klevel_witness", cyx(
      """MATCH p = SHORTEST 2 GROUPS
        |  (a:Customer)-[:FEEDS*]->(b:Part)
        |WHERE a.c_custkey = 1
        |RETURN b.p_partkey AS pk, length(p) AS hops,
        |       reduce(s = '', n IN nodes(p) | s + '|' + toString(
        |         coalesce(n.c_custkey, n.o_orderkey, n.p_partkey)))
        |         AS ids
        |ORDER BY pk, ids""".stripMargin),
      Some("""SELECT l.l_partkey AS pk, CAST(2 AS BIGINT) AS hops,
             |       '|1|' || CAST(l.l_orderkey AS VARCHAR) || '|' ||
             |         CAST(l.l_partkey AS VARCHAR) AS ids
             |FROM lineitem l JOIN orders o
             |  ON l.l_orderkey = o.o_orderkey
             |WHERE o.o_custkey = 1
             |ORDER BY pk, ids""".stripMargin)),

    // --- PLAIN named path over an unbounded range (round 17): ALL
    //     paths enumerated — the untrimmed k-level walk (exact trail
    //     semantics on a DAG), one row per walk with its own witness
    //     trail; previously a typed rejection.
    ("q174_path_enumeration", cyx(
      """MATCH p = (a:Nation {n_nationkey: 0})-[:JUMPS_TO*]->(b:Nation)
        |RETURN b.n_nationkey AS bk, length(p) AS hops,
        |       reduce(s = '', n IN nodes(p) |
        |         s + '|' + toString(n.n_nationkey)) AS trail
        |ORDER BY bk, hops, trail""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |walk(dst, hops, trail) AS (
             |  SELECT dst, 1, '|0|' || CAST(dst AS VARCHAR)
             |  FROM e WHERE src = 0
             |  UNION ALL
             |  SELECT e.dst, w.hops + 1,
             |         w.trail || '|' || CAST(e.dst AS VARCHAR)
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 30)
             |SELECT dst AS bk, CAST(hops AS BIGINT) AS hops, trail
             |FROM walk
             |ORDER BY bk, hops, trail""".stripMargin)),

    // --- plain [*0..] enumeration (round 17): the zero-hop identity
    //     row joins the walk set — one node, zero rels, length 0.
    ("q175_path_enum_zero_hop", cyx(
      """MATCH p = (a:Nation {n_nationkey: 0})-[:JUMPS_TO*0..]->(b:Nation)
        |RETURN b.n_nationkey AS bk, length(p) AS hops,
        |       size(nodes(p)) AS nn
        |ORDER BY bk, hops""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |walk(dst, hops) AS (
             |  SELECT dst, 1 FROM e WHERE src = 0
             |  UNION ALL
             |  SELECT e.dst, w.hops + 1
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 30)
             |SELECT dst AS bk, CAST(hops AS BIGINT) AS hops,
             |       CAST(hops + 1 AS INTEGER) AS nn
             |FROM walk
             |UNION ALL
             |SELECT 0 AS bk, CAST(0 AS BIGINT) AS hops,
             |       CAST(1 AS INTEGER) AS nn
             |ORDER BY bk, hops""".stripMargin)),

    // --- heterogeneous plain enumeration (round 17): the walk runs
    //     over FEEDS' tagged union frame (Customer→Order ∪
    //     Order→Part); every complete chain is its own row, parallel
    //     lineitem rows kept as multiplicity.
    ("q176_path_enum_hetero", cyx(
      """MATCH p = (c:Customer {c_custkey: 2})-[:FEEDS*]->(pt:Part)
        |RETURN pt.p_partkey AS pk, length(p) AS hops,
        |       reduce(s = '', n IN nodes(p) | s + '|' + toString(
        |         coalesce(n.c_custkey, n.o_orderkey, n.p_partkey)))
        |         AS ids
        |ORDER BY pk, ids""".stripMargin),
      Some("""SELECT l.l_partkey AS pk,
             |       CAST(2 AS BIGINT) AS hops,
             |       '|2' ||
             |       '|' || CAST(l.l_orderkey AS VARCHAR) ||
             |       '|' || CAST(l.l_partkey AS VARCHAR) AS ids
             |FROM lineitem l JOIN orders o
             |  ON l.l_orderkey = o.o_orderkey
             |WHERE o.o_custkey = 2
             |ORDER BY pk, ids""".stripMargin)),

    // --- var-length TYPE ALTERNATION mixes verbs per hop (round 17;
    //     the AltRel union-verb desugar): unbounded enumeration over
    //     NEXT_IN_REGION ∪ JUMPS_TO — the +1 successor edge exists
    //     under BOTH verbs, so every +1 hop doubles the walk count
    //     (parallel relationships are distinct paths).
    ("q177_alt_unbounded_mixed", cyx(
      """MATCH p = (a:Nation {n_nationkey: 0})
        |  -[:NEXT_IN_REGION|JUMPS_TO*]->(b:Nation)
        |RETURN b.n_nationkey AS bk, length(p) AS hops,
        |       reduce(s = '', n IN nodes(p) |
        |         s + '|' + toString(n.n_nationkey)) AS trail
        |ORDER BY bk, hops, trail""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |walk(dst, hops, trail) AS (
             |  SELECT dst, 1, '|0|' || CAST(dst AS VARCHAR)
             |  FROM e WHERE src = 0
             |  UNION ALL
             |  SELECT e.dst, w.hops + 1,
             |         w.trail || '|' || CAST(e.dst AS VARCHAR)
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 30)
             |SELECT dst AS bk, CAST(hops AS BIGINT) AS hops, trail
             |FROM walk
             |ORDER BY bk, hops, trail""".stripMargin)),

    // --- bounded mixed chains + the merged null-filled hop namespace
    //     (round 17): NEXT_IN_REGION hops read jump_span = null; the
    //     rel-list variable binds the union-frame hop structs.
    ("q178_alt_bounded_mixed", cyx(
      """MATCH (a:Nation)-[rs:NEXT_IN_REGION|JUMPS_TO*2..2]->(b:Nation)
        |WHERE a.n_nationkey = 0
        |RETURN b.n_nationkey AS bk,
        |       reduce(s = '', r IN rs | s + '|' + toString(
        |         coalesce(r.jump_span, 0))) AS spans
        |ORDER BY bk, spans""".stripMargin),
      Some("""WITH nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst,
             |         CAST(NULL AS INTEGER) AS span
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey),
             |         1
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey),
             |         2
             |  FROM nation),
             |e AS (SELECT src, dst, span FROM nj WHERE dst IS NOT NULL)
             |SELECT e2.dst AS bk,
             |       '|' || CAST(coalesce(e1.span, 0) AS VARCHAR) ||
             |       '|' || CAST(coalesce(e2.span, 0) AS VARCHAR) AS spans
             |FROM e e1 JOIN e e2 ON e2.src = e1.dst
             |WHERE e1.src = 0
             |ORDER BY bk, spans""".stripMargin)),

    // --- [*lo..] with lo > 1 (round 17; previously a parse
    //     rejection): BARE pairs — some path of length >= 3 exists,
    //     one row per pair, UNANCHORED through the level DP.
    ("q179_lower_bound_pairs", cyx(
      """MATCH (a:Nation)-[:JUMPS_TO*3..]->(b:Nation)
        |RETURN a.n_nationkey AS ak, b.n_nationkey AS bk
        |ORDER BY ak, bk""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |walk(src, dst, hops) AS (
             |  SELECT src, dst, 1 FROM e
             |  UNION ALL
             |  SELECT w.src, e.dst, w.hops + 1
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 30)
             |SELECT DISTINCT src AS ak, dst AS bk
             |FROM walk WHERE hops >= 3
             |ORDER BY ak, bk""".stripMargin)),

    // --- shortestPath over [*2..] (round 17): the minimal length at
    //     or above the bound — one-hop routes fall below it.
    ("q180_lower_bound_shortest", cyx(
      """MATCH p = shortestPath(
        |  (a:Nation {n_nationkey: 0})-[:JUMPS_TO*2..]->(b:Nation))
        |RETURN b.n_nationkey AS bk, length(p) AS hops
        |ORDER BY bk""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |walk(dst, hops) AS (
             |  SELECT dst, 1 FROM e WHERE src = 0
             |  UNION ALL
             |  SELECT e.dst, w.hops + 1
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 30)
             |SELECT dst AS bk, CAST(min(hops) AS BIGINT) AS hops
             |FROM walk WHERE hops >= 2
             |GROUP BY dst
             |ORDER BY bk""".stripMargin)),

    // --- plain enumeration over [*2..] (round 17): the walk kind
    //     respects the lower bound — one row per walk of length >= 2.
    ("q181_lower_bound_enum", cyx(
      """MATCH p = (a:Nation {n_nationkey: 0})-[:JUMPS_TO*2..]->(b:Nation)
        |RETURN b.n_nationkey AS bk, length(p) AS hops,
        |       reduce(s = '', n IN nodes(p) |
        |         s + '|' + toString(n.n_nationkey)) AS trail
        |ORDER BY bk, hops, trail""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |walk(dst, hops, trail) AS (
             |  SELECT dst, 1, '|0|' || CAST(dst AS VARCHAR)
             |  FROM e WHERE src = 0
             |  UNION ALL
             |  SELECT e.dst, w.hops + 1,
             |         w.trail || '|' || CAST(e.dst AS VARCHAR)
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 30)
             |SELECT dst AS bk, CAST(hops AS BIGINT) AS hops, trail
             |FROM walk WHERE hops >= 2
             |ORDER BY bk, hops, trail""".stripMargin)),

    // --- UNDIRECTED unbounded reach (round 17; previously typed):
    //     shortestPath over the symmetrized frame — the region sink
    //     reaches its predecessors against storage order.
    ("q182_undirected_shortest", cyx(
      """MATCH p = shortestPath(
        |  (a:Nation {n_nationkey: 4})-[:JUMPS_TO*]-(b:Nation))
        |RETURN b.n_nationkey AS bk, length(p) AS hops
        |ORDER BY bk""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e0 AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |e AS (SELECT src, dst FROM e0
             |      UNION SELECT dst, src FROM e0),
             |walk(dst, hops) AS (
             |  SELECT dst, 1 FROM e WHERE src = 4
             |  UNION
             |  SELECT e.dst, w.hops + 1
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 12)
             |SELECT dst AS bk, CAST(min(hops) AS BIGINT) AS hops
             |FROM walk WHERE dst <> 4
             |GROUP BY dst
             |ORDER BY bk""".stripMargin)),

    // --- undirected bare pairs, UNANCHORED: every within-region
    //     ordered pair (each region is one undirected component),
    //     (x, x) excluded.
    ("q183_undirected_pairs", cyx(
      """MATCH (a:Nation)-[:JUMPS_TO*]-(b:Nation)
        |RETURN a.n_nationkey AS ak, b.n_nationkey AS bk
        |ORDER BY ak, bk""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e0 AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |e AS (SELECT src, dst FROM e0
             |      UNION SELECT dst, src FROM e0),
             |walk(src, dst, hops) AS (
             |  SELECT src, dst, 1 FROM e
             |  UNION
             |  SELECT w.src, e.dst, w.hops + 1
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 12)
             |SELECT DISTINCT src AS ak, dst AS bk
             |FROM walk WHERE src <> dst
             |ORDER BY ak, bk""".stripMargin)),

    // --- QPP unbounded quantifier {2,} (round 17; previously typed):
    //     a predicated group with a lower bound > 1 — the HopPred-
    //     filtered unit-chain frame feeds the same [*2..] level-DP
    //     lowering.
    ("q184_qpp_unbounded_min", cyx(
      """MATCH (a:Nation)
        |  ((x)-[j:JUMPS_TO]->(y) WHERE j.jump_span = 1){2,} (b:Nation)
        |WHERE a.n_nationkey = 0
        |RETURN b.n_nationkey AS bk ORDER BY bk""".stripMargin),
      Some("""WITH RECURSIVE c AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation),
             |e AS (SELECT src, dst FROM c WHERE dst IS NOT NULL),
             |walk(dst, hops) AS (
             |  SELECT dst, 1 FROM e WHERE src = 0
             |  UNION ALL
             |  SELECT e.dst, w.hops + 1
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 30)
             |SELECT DISTINCT dst AS bk FROM walk WHERE hops >= 2
             |ORDER BY bk""".stripMargin)),

    // --- UNBOUNDED ranges inside COUNT{} (round 17; previously
    //     typed): the reach lowering — COUNT counts reachable PAIRS
    //     (the documented recursive-CTE contract), zero-match rows
    //     report 0.
    ("q185_count_unbounded", cyx(
      """MATCH (a:Nation)
        |RETURN a.n_nationkey AS ak,
        |       COUNT { (a)-[:JUMPS_TO*]->(b:Nation) } AS reach
        |ORDER BY ak""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |walk(src, dst) AS (
             |  SELECT src, dst FROM e
             |  UNION
             |  SELECT w.src, e.dst FROM walk w JOIN e ON e.src = w.dst),
             |c AS (SELECT src, count(DISTINCT dst) AS cnt FROM walk
             |      GROUP BY src)
             |SELECT n_nationkey AS ak,
             |       CAST(coalesce(cnt, 0) AS INTEGER) AS reach
             |FROM nation LEFT JOIN c ON c.src = n_nationkey
             |ORDER BY ak""".stripMargin)),

    // --- unbounded ranges inside pattern COMPREHENSIONS (round 17):
    //     one value per reachable pair, reduced to a scalar per the
    //     array-oracle convention.
    ("q186_comprehension_unbounded", cyx(
      """MATCH (a:Nation) WHERE a.n_nationkey <= 10
        |RETURN a.n_nationkey AS ak,
        |       reduce(s = 0, x IN
        |         [(a)-[:JUMPS_TO*]->(b:Nation) | b.n_nationkey] |
        |         s + x) AS rsum
        |ORDER BY ak""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |walk(src, dst) AS (
             |  SELECT src, dst FROM e
             |  UNION
             |  SELECT w.src, e.dst FROM walk w JOIN e ON e.src = w.dst),
             |c AS (SELECT src, sum(dst) AS s FROM
             |        (SELECT DISTINCT src, dst FROM walk)
             |      GROUP BY src)
             |SELECT n_nationkey AS ak,
             |       CAST(coalesce(s, 0) AS INTEGER) AS rsum
             |FROM nation LEFT JOIN c ON c.src = n_nationkey
             |WHERE n_nationkey <= 10
             |ORDER BY ak""".stripMargin)),

    ("q163_hetero_allshortest_witness", cyx(
      """MATCH p = allShortestPaths((a:Customer)-[:FEEDS*1..]->(b:Part))
        |WHERE a.c_custkey = 0
        |RETURN b.p_partkey AS pk, length(p) AS hops,
        |       reduce(s = '', n IN nodes(p) | s + '|' + toString(
        |         coalesce(n.c_custkey, n.o_orderkey, n.p_partkey)))
        |         AS ids
        |ORDER BY pk, ids""".stripMargin),
      Some("""SELECT DISTINCT l.l_partkey AS pk, CAST(2 AS BIGINT) AS hops,
             |       '|0|' || CAST(l.l_orderkey AS VARCHAR) || '|' ||
             |         CAST(l.l_partkey AS VARCHAR) AS ids
             |FROM lineitem l JOIN orders o
             |  ON l.l_orderkey = o.o_orderkey
             |WHERE o.o_custkey = 0
             |ORDER BY pk, ids""".stripMargin)),

    // --- [*0..] heterogeneous witnesses (round 15): same-label
    //     endpoints over the FEEDS label DAG bind the zero-hop
    //     IDENTITY row — one element null-filled to the merged
    //     namespace, an empty hop array (no Customer→…→Customer
    //     chain exists; the identity is the only match).
    ("q164_hetero_zero_hop_witness", cyx(
      """MATCH p = shortestPath((a:Customer)-[:FEEDS*0..]->(b:Customer))
        |WHERE a.c_custkey <= 5
        |RETURN a.c_custkey AS ck, b.c_custkey AS bk,
        |       length(p) AS hops, size(nodes(p)) AS nn,
        |       size(relationships(p)) AS nr,
        |       reduce(s = '', n IN nodes(p) | s + '|' + toString(
        |         coalesce(n.c_custkey, n.o_orderkey, n.p_partkey)))
        |         AS ids
        |ORDER BY ck""".stripMargin),
      Some("""SELECT c_custkey AS ck, c_custkey AS bk,
             |       CAST(0 AS BIGINT) AS hops, 1 AS nn, 0 AS nr,
             |       '|' || CAST(c_custkey AS VARCHAR) AS ids
             |FROM customer WHERE c_custkey <= 5
             |ORDER BY ck""".stripMargin)),

    ("q152_hetero_witness", cyx(
      """MATCH p = shortestPath((a:Customer)-[:FEEDS*1..]->(b:Part))
        |WHERE a.c_custkey = 1
        |RETURN b.p_partkey AS pk, length(p) AS hops,
        |       reduce(s = '', n IN nodes(p) | s + '|' + toString(
        |         coalesce(n.c_custkey, n.o_orderkey, n.p_partkey)))
        |         AS ids,
        |       reduce(s = '', r IN relationships(p) | s + '|' +
        |         toString(coalesce(r.o_orderkey, r.l_partkey))) AS rels
        |ORDER BY pk""".stripMargin),
      Some("""WITH v AS (
             |  SELECT l.l_partkey AS pk, min(l.l_orderkey) AS via
             |  FROM lineitem l JOIN orders o
             |    ON l.l_orderkey = o.o_orderkey
             |  WHERE o.o_custkey = 1
             |  GROUP BY 1)
             |SELECT pk, CAST(2 AS BIGINT) AS hops,
             |       '|1|' || CAST(via AS VARCHAR) || '|' ||
             |         CAST(pk AS VARCHAR) AS ids,
             |       '|' || CAST(via AS VARCHAR) || '|' ||
             |         CAST(pk AS VARCHAR) AS rels
             |FROM v ORDER BY pk""".stripMargin)),

    // --- correlated CALL { … UNION … } with an AGGREGATING branch
    //     (round 15, VERDICT-r14 #6): the aggregating branch
    //     zero-fills per invocation BEFORE the union (count → 0 on
    //     zero urgent orders), the plain branch contributes one row
    //     per match — mirrored by a LEFT-join count plus a UNION ALL.
    ("q165_call_union_agg_branch", cyx(
      """MATCH (c:Customer) WHERE c.c_custkey <= 30
        |CALL (c) {
        |  MATCH (c)-[:PLACED_URGENT]->(o:Order) RETURN count(o) AS v
        |  UNION ALL
        |  MATCH (c)-[:PLACED]->(o2:Order)
        |  WHERE o2.o_totalprice > 150000
        |  RETURN o2.o_orderkey AS v }
        |RETURN c.c_custkey AS ck, v ORDER BY ck, v""".stripMargin),
      Some("""WITH ks AS (
             |  SELECT c_custkey FROM customer WHERE c_custkey <= 30),
             |agg AS (
             |  SELECT k.c_custkey, count(o.o_orderkey) AS v
             |  FROM ks k LEFT JOIN orders o
             |    ON o.o_custkey = k.c_custkey
             |    AND o.o_orderpriority = '1-URGENT'
             |  GROUP BY 1),
             |plain AS (
             |  SELECT o_custkey AS c_custkey, o_orderkey AS v
             |  FROM orders JOIN ks ON o_custkey = ks.c_custkey
             |  WHERE o_totalprice > 150000)
             |SELECT c_custkey AS ck, v
             |FROM (SELECT * FROM agg UNION ALL SELECT * FROM plain) t
             |ORDER BY ck, v""".stripMargin)),

    // --- correlated CALL { … UNION … } (round 14): imports thread
    //     through each branch, the keyed branch outputs union (UNION
    //     dedupes per invocation — an urgent order that also clears
    //     the price bar appears once), then ONE join back to the
    //     outer rows
    ("q151_call_union_correlated", cyx(
      """MATCH (c:Customer) WHERE c.c_acctbal > 9900
        |CALL (c) {
        |  MATCH (c)-[:PLACED_URGENT]->(o:Order)
        |  RETURN o.o_orderkey AS ok
        |  UNION
        |  MATCH (c)-[:PLACED]->(o2:Order)
        |  WHERE o2.o_totalprice > 150000
        |  RETURN o2.o_orderkey AS ok }
        |RETURN c.c_name AS name, ok
        |ORDER BY name, ok""".stripMargin),
      Some("""WITH u AS (
             |  SELECT o_custkey, o_orderkey AS ok FROM orders
             |  WHERE o_orderpriority = '1-URGENT'
             |  UNION
             |  SELECT o_custkey, o_orderkey FROM orders
             |  WHERE o_totalprice > 150000)
             |SELECT c_name AS name, ok
             |FROM customer JOIN u ON o_custkey = c_custkey
             |WHERE c_acctbal > 9900
             |ORDER BY 1, 2""".stripMargin)),

    // --- named-timezone temporals (round 14; Neo4j
    //     datetime('…[America/New_York]') and datetime({…, timezone}) ):
    //     the zoned wall time converts to its stored UTC instant —
    //     literals at compile time via java.time, map components via
    //     to_utc_timestamp. The day rides a component expression
    //     crossing the 2024-03-10 US DST boundary; the DuckDB mirror
    //     composes timezone('UTC', timezone(zone, ts)) so it is
    //     session-TimeZone-independent.
    ("q150_named_timezone", cyx(
      """MATCH (n:Nation)
        |WITH n.n_nationkey AS k
        |RETURN k,
        |       datetime({year: 2024, month: 3, day: k % 28 + 1,
        |                 hour: 6, minute: 30,
        |                 timezone: 'America/New_York'}) AS t,
        |       datetime('2024-03-10T06:30:00[America/New_York]')
        |         AS lit_t
        |ORDER BY k""".stripMargin),
      Some("""SELECT n_nationkey AS k,
             |  timezone('UTC', timezone('America/New_York',
             |    make_timestamp(2024, 3, n_nationkey % 28 + 1,
             |                   6, 30, 0))) AS t,
             |  timezone('UTC', timezone('America/New_York',
             |    TIMESTAMP '2024-03-10 06:30:00')) AS lit_t
             |FROM nation ORDER BY k""".stripMargin)),

    // --- dynamic property / map subscript n[expr] (round 14; Neo4j's
    //     runtime key access): the static schema bounds the dispatch —
    //     a CASE chain over the declared columns, null on unknown key,
    //     one common result type (JUMPS_TO's columns are all integral).
    //     The key here is data-driven (parity of the source nation),
    //     and one arm yields a key no column matches (null row).
    ("q149_dynamic_subscript", cyx(
      """MATCH (a:Nation)-[j:JUMPS_TO]->(b:Nation)
        |WITH a, b, j, {lo: 1, hi: 9} AS m
        |RETURN a.n_nationkey AS ak, b.n_nationkey AS bk,
        |       j[CASE WHEN a.n_nationkey % 3 = 0 THEN 'jump_span'
        |              WHEN a.n_nationkey % 3 = 1 THEN 'src_nationkey'
        |              ELSE 'nope' END] AS v,
        |       m[CASE WHEN b.n_nationkey > 12 THEN 'hi'
        |              ELSE 'lo' END] AS mv
        |ORDER BY ak, bk, v""".stripMargin),
      Some("""WITH nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst,
             |         1 AS jump_span
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey),
             |         2 AS jump_span
             |  FROM nation)
             |SELECT src AS ak, dst AS bk,
             |       CASE WHEN src % 3 = 0 THEN jump_span
             |            WHEN src % 3 = 1 THEN src
             |            ELSE NULL END AS v,
             |       CASE WHEN dst > 12 THEN 9 ELSE 1 END AS mv
             |FROM nj WHERE dst IS NOT NULL
             |ORDER BY ak, bk, v""".stripMargin)),

    // --- IS NULL keeps the lacking branch under relationship-type
    //     alternation (round 14): PLACED carries no o_orderpriority —
    //     its branch null-fills the column in the [r:PLACED|
    //     PLACED_URGENT] union, and the mixed-presence WHERE conjunct
    //     defers past the union, so `r.o_orderpriority IS NULL` keeps
    //     every PLACED row and drops the PLACED_URGENT branch
    //     (openCypher's missing-property-is-null rule; previously the
    //     lacking branch dropped at its per-branch unknown-property
    //     rejection)
    ("q148_alt_isnull_branch", cyx(
      """MATCH (c:Customer)-[r:PLACED|PLACED_URGENT]->(o:Order)
        |WHERE o.o_orderkey <= 2000 AND r.o_orderpriority IS NULL
        |RETURN c.c_custkey AS ck, o.o_orderkey AS ok,
        |       r.o_orderdate AS od
        |ORDER BY ck, ok""".stripMargin),
      Some("""WITH u AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate,
             |         NULL AS pri FROM orders
             |  UNION ALL
             |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority
             |  FROM orders WHERE o_orderpriority = '1-URGENT')
             |SELECT c_custkey AS ck, o_orderkey AS ok,
             |       o_orderdate AS od
             |FROM u JOIN customer ON c_custkey = o_custkey
             |WHERE o_orderkey <= 2000 AND pri IS NULL
             |ORDER BY ck, ok""".stripMargin)),

    // --- per-edge relationship uniqueness through a composite QPP
    //     chain (round 14): the out-in group shares ONE edge
    //     definition across both hops — within a repetition the same
    //     JUMPS_TO row may not bind j AND k (no spurious x=z rows),
    //     and across the {1,2} repetitions no underlying edge repeats
    //     (Cypher's walk contract; the composite frame exports per-hop
    //     edge keys so the unroll's inequality applies per edge, not
    //     per composite row). The DuckDB mirror spells out the
    //     within-rep exclusion and all four cross-rep hop-pair
    //     exclusions explicitly.
    // --- multi-variable SET in one clause (round 16; VERDICT-r15
    //     #1): `SET c.x = …, l.y = …` desugars at parse into one
    //     clause per variable over the carried read-back frame (the
    //     multi-variable DELETE convention); the RETURN reads BOTH
    //     updated entities per row — mirrored by plain arithmetic on
    //     both sides in DuckDB.
    ("q168_multi_var_set", cyx(
      """MATCH (c:Customer)-[p:PLACED]->(o:Order)-[l:CONTAINS]->(pt:Part)
        |WHERE c.c_custkey <= 100
        |SET c.c_acctbal = c.c_acctbal + 10.0,
        |    l.l_quantity = l.l_quantity + 1.0
        |RETURN count(*) AS n, round(sum(c.c_acctbal), 2) AS bal,
        |       round(sum(l.l_quantity), 2) AS qty""".stripMargin),
      Some("""SELECT count(*) AS n,
             |       round(sum(c.c_acctbal + 10.0), 2) AS bal,
             |       round(sum(l.l_quantity + 1.0), 2) AS qty
             |FROM customer c
             |JOIN orders o ON o.o_custkey = c.c_custkey
             |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |WHERE c.c_custkey <= 100""".stripMargin)),

    // --- witness accessors under SHORTEST k GROUPS over an UNBOUNDED
    //     range (round 16; VERDICT-r15 #2): the k-level DP keeps
    //     per-level parent sets (distance × branching, never path
    //     count) and the σ-fold walk enumerates each kept level's
    //     paths — nodes(p)/relationships(p) read per enumerated path.
    //     Mirror: recursive path-string walk + dense_rank (GROUPS =
    //     every path of the k smallest lengths, so no tie-breaking
    //     enters the compare).
    ("q169_klevel_witness", cyx(
      """MATCH p = SHORTEST 2 GROUPS
        |  (a:Nation {n_nationkey: 0})-[:JUMPS_TO*]->(b:Nation)
        |RETURN b.n_nationkey AS bk, length(p) AS l,
        |       reduce(s = '', n IN nodes(p) |
        |         s + '|' + toString(n.n_nationkey)) AS path,
        |       reduce(s = 0, e IN relationships(p) | s + e.jump_span)
        |         AS span
        |ORDER BY bk, l, path""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst,
             |         1 AS span
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey),
             |         2 AS span
             |  FROM nation),
             |e AS (SELECT src, dst, span FROM nj WHERE dst IS NOT NULL),
             |walk(dst, hops, path, span) AS (
             |  SELECT 0, 0, '|0', 0
             |  UNION ALL
             |  SELECT e.dst, w.hops + 1,
             |         w.path || '|' || CAST(e.dst AS VARCHAR),
             |         w.span + e.span
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 12),
             |r AS (SELECT dst, hops, path, span,
             |        dense_rank() OVER (PARTITION BY dst
             |                           ORDER BY hops) AS rk
             |      FROM walk WHERE hops > 0)
             |SELECT dst AS bk, CAST(hops AS BIGINT) AS l, path,
             |       CAST(span AS BIGINT) AS span
             |FROM r WHERE rk <= 2
             |ORDER BY bk, l, path""".stripMargin)),

    // --- UNANCHORED k > 1 selector (round 16; VERDICT-r15 #3): every
    //     source seeds the σ DP under the same maxClosureRows guard —
    //     the full (src, dst) pair table with the k first paths by
    //     length each (ties emit identical (ak, bk, l) rows, so the
    //     row_number tie-break never shows in the compare).
    ("q170_klevel_unanchored", cyx(
      """MATCH p = SHORTEST 2 (a:Nation)-[:JUMPS_TO*]->(b:Nation)
        |RETURN a.n_nationkey AS ak, b.n_nationkey AS bk,
        |       length(p) AS l
        |ORDER BY ak, bk, l""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |walk(src, dst, hops) AS (
             |  SELECT src, dst, 1 FROM e
             |  UNION ALL
             |  SELECT w.src, e.dst, w.hops + 1
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 12),
             |r AS (SELECT src, dst, hops,
             |        row_number() OVER (PARTITION BY src, dst
             |                           ORDER BY hops) AS rk
             |      FROM walk)
             |SELECT src AS ak, dst AS bk, CAST(hops AS BIGINT) AS l
             |FROM r WHERE rk <= 2
             |ORDER BY ak, bk, l""".stripMargin)),

    // --- k > 1 over a HETEROGENEOUS chain (round 16; VERDICT-r15
    //     #4): the σ DP runs over the tagged (ordinal, id) union
    //     frame FEEDS builds (Customer→Order ∪ Order→Part) — the
    //     label DAG has exactly one Customer→Part level (L2), GROUPS
    //     keeps all σ chains of it (parallel lineitem rows included,
    //     the multiplicity seeding).
    ("q171_klevel_hetero", cyx(
      """MATCH p = SHORTEST 2 GROUPS
        |  (c:Customer {c_custkey: 1})-[:FEEDS*]->(pt:Part)
        |RETURN pt.p_partkey AS pk, length(p) AS l
        |ORDER BY pk""".stripMargin),
      Some("""SELECT l.l_partkey AS pk, CAST(2 AS BIGINT) AS l
             |FROM orders o
             |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |WHERE o.o_custkey = 1
             |ORDER BY pk""".stripMargin)),

    // --- k > 1 over [*0..] (round 16; VERDICT-r15 #4): the zero-hop
    //     identity row enters the k-trim as level 0 with σ = 1 —
    //     q162's pair table plus the (0, 0, 0) reflexive row.
    ("q172_klevel_zero_hop", cyx(
      """MATCH p = SHORTEST 2
        |  (a:Nation {n_nationkey: 0})-[:JUMPS_TO*0..]->(b:Nation)
        |RETURN b.n_nationkey AS bk, length(p) AS l
        |ORDER BY bk, l""".stripMargin),
      Some("""WITH RECURSIVE nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |walk(dst, hops) AS (
             |  SELECT 0, 0
             |  UNION ALL
             |  SELECT e.dst, w.hops + 1
             |  FROM walk w JOIN e ON e.src = w.dst
             |  WHERE w.hops < 12),
             |r AS (SELECT dst, hops,
             |        row_number() OVER (PARTITION BY dst
             |                           ORDER BY hops) AS rk
             |      FROM walk WHERE hops > 0)
             |SELECT dst AS bk, CAST(hops AS BIGINT) AS l
             |FROM r WHERE rk <= 2
             |UNION ALL
             |SELECT 0 AS bk, CAST(0 AS BIGINT) AS l
             |ORDER BY bk, l""".stripMargin)),

    // --- group NODE variables (round 15, late): x / y of a
    //     single-rel quantified group bind the per-repetition
    //     left/right node lists (GQL's full group-variable surface) —
    //     reduced to id sums over the span-1 unit chain; the L = 2
    //     arm's interior appears in BOTH lists (the juncture).
    ("q167_qpp_node_group_vars", cyx(
      """MATCH (a:Nation)
        |  ((x)-[j:JUMPS_TO]->(y) WHERE j.jump_span = 1){1,2}
        |  (b:Nation)
        |WHERE a.n_nationkey <= 10
        |RETURN a.n_nationkey AS ak, b.n_nationkey AS bk,
        |       reduce(s = 0, n IN x | s + n.n_nationkey) AS xsum,
        |       reduce(s = 0, n IN y | s + n.n_nationkey) AS ysum
        |ORDER BY ak, bk, xsum""".stripMargin),
      Some("""WITH chain AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation),
             |c2 AS (SELECT * FROM chain WHERE dst IS NOT NULL),
             |p1 AS (SELECT src AS ak, dst AS bk,
             |              src AS xsum, dst AS ysum FROM c2),
             |p2 AS (SELECT a.src AS ak, b.dst AS bk,
             |              a.src + a.dst AS xsum, a.dst + b.dst AS ysum
             |       FROM c2 a JOIN c2 b ON b.src = a.dst)
             |SELECT ak, bk, CAST(xsum AS BIGINT) AS xsum,
             |       CAST(ysum AS BIGINT) AS ysum
             |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
             |WHERE ak <= 10
             |ORDER BY ak, bk, xsum""".stripMargin)),

    // --- CHAIN group variables (round 15, late): each user-named hop
    //     of a multi-relationship group binds its own per-path list —
    //     the composite frame exports per-hop structs, the unroll
    //     collects them per repetition. Reduced to per-variable span
    //     sums over the q147 out-in meet (same walk-contract
    //     exclusions in the mirror).
    ("q166_chain_group_vars", cyx(
      """MATCH (a:Nation) ((x)-[j:JUMPS_TO]->(y)<-[k:JUMPS_TO]-(z)){1,2}
        |      (b:Nation)
        |RETURN a.n_nationkey AS ak, b.n_nationkey AS bk,
        |       reduce(s = 0, h IN j | s + h.jump_span) AS js,
        |       reduce(s = 0, h IN k | s + h.jump_span) AS ks
        |ORDER BY ak, bk, js, ks""".stripMargin),
      Some("""WITH nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst,
             |         1 AS span
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey),
             |         2
             |  FROM nation),
             |e AS (SELECT src, dst, span FROM nj WHERE dst IS NOT NULL),
             |r AS (SELECT a.src AS x, b.src AS z,
             |             a.src AS s1, a.dst AS d1,
             |             b.src AS s2, b.dst AS d2,
             |             a.span AS sp1, b.span AS sp2
             |      FROM e a JOIN e b ON a.dst = b.dst
             |      WHERE a.src <> b.src OR a.dst <> b.dst),
             |p1 AS (SELECT x AS ak, z AS bk, sp1 AS js, sp2 AS ks FROM r),
             |p2 AS (SELECT r1.x AS ak, r2.z AS bk,
             |              r1.sp1 + r2.sp1 AS js, r1.sp2 + r2.sp2 AS ks
             |       FROM r r1 JOIN r r2 ON r1.z = r2.x
             |       WHERE (r1.s1 <> r2.s1 OR r1.d1 <> r2.d1)
             |         AND (r1.s1 <> r2.s2 OR r1.d1 <> r2.d2)
             |         AND (r1.s2 <> r2.s1 OR r1.d2 <> r2.d1)
             |         AND (r1.s2 <> r2.s2 OR r1.d2 <> r2.d2))
             |SELECT ak, bk, CAST(js AS BIGINT) AS js,
             |       CAST(ks AS BIGINT) AS ks
             |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
             |ORDER BY ak, bk, js, ks""".stripMargin)),

    ("q147_qpp_edge_unique", cyx(
      """MATCH (a:Nation) ((x)-[j:JUMPS_TO]->(y)<-[k:JUMPS_TO]-(z)){1,2}
        |      (b:Nation)
        |RETURN a.n_nationkey AS ak, b.n_nationkey AS bk,
        |       count(*) AS n
        |ORDER BY ak, bk""".stripMargin),
      Some("""WITH nj AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey, 1) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation
             |  UNION ALL
             |  SELECT n_nationkey,
             |         lead(n_nationkey, 2) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey)
             |  FROM nation),
             |e AS (SELECT src, dst FROM nj WHERE dst IS NOT NULL),
             |r AS (SELECT a.src AS x, b.src AS z,
             |             a.src AS s1, a.dst AS d1,
             |             b.src AS s2, b.dst AS d2
             |      FROM e a JOIN e b ON a.dst = b.dst
             |      WHERE a.src <> b.src OR a.dst <> b.dst),
             |p1 AS (SELECT x AS ak, z AS bk FROM r),
             |p2 AS (SELECT r1.x AS ak, r2.z AS bk
             |       FROM r r1 JOIN r r2 ON r1.z = r2.x
             |       WHERE (r1.s1 <> r2.s1 OR r1.d1 <> r2.d1)
             |         AND (r1.s1 <> r2.s2 OR r1.d1 <> r2.d2)
             |         AND (r1.s2 <> r2.s1 OR r1.d2 <> r2.d1)
             |         AND (r1.s2 <> r2.s2 OR r1.d2 <> r2.d2))
             |SELECT ak, bk, count(*) AS n
             |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- valueType() + char_length aliases (round 13; Neo4j 5):
    //     static-type name with value-level NULL reporting
    ("q146_value_type", cyx(
      """MATCH (o:Order) WHERE o.o_orderkey <= 20
        |RETURN o.o_orderkey AS ok,
        |       valueType(o.o_orderkey) AS t1,
        |       valueType(o.o_orderstatus) AS t2,
        |       valueType(o.o_totalprice) AS t3,
        |       valueType(o.o_orderdate) AS t4,
        |       char_length(o.o_orderpriority) AS n
        |ORDER BY ok""".stripMargin),
      Some("""SELECT o_orderkey AS ok,
             |  'INTEGER' AS t1, 'STRING' AS t2, 'FLOAT' AS t3,
             |  'LOCALDATETIME' AS t4,
             |  CAST(length(o_orderpriority) AS INTEGER) AS n
             |FROM orders WHERE o_orderkey <= 20
             |ORDER BY ok""".stripMargin)),

    // --- OPTIONAL CALL (round 13; Neo4j 5.24): zero-row subquery
    //     invocations null-fill instead of dropping the outer row —
    //     LEFT-join semantics on the correlated join-back
    ("q145_optional_call", cyx(
      """MATCH (c:Customer) WHERE c.c_acctbal > 9900
        |OPTIONAL CALL (c) {
        |  MATCH (c)-[:PLACED_URGENT]->(o:Order)
        |  RETURN o.o_totalprice AS up }
        |RETURN c.c_name AS name, count(up) AS n_urgent,
        |       count(*) AS n_rows
        |ORDER BY name""".stripMargin),
      Some("""SELECT c_name AS name, count(o.o_orderkey) AS n_urgent,
             |       count(*) AS n_rows
             |FROM customer c LEFT JOIN (
             |  SELECT * FROM orders
             |  WHERE o_orderpriority = '1-URGENT') o
             |  ON o.o_custkey = c.c_custkey
             |WHERE c_acctbal > 9900
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- CALL (vars) scope clause + :% wildcard (round 13; Neo4j
    //     5.23's modern CALL subquery spelling; any-label wildcard =
    //     unconstrained, inference decides)
    ("q144_call_scope", cyx(
      """MATCH (c:Customer) WHERE c.c_acctbal > 9900
        |CALL (c) { MATCH (c)-[:PLACED]->(o:Order)
        |           RETURN count(*) AS n_orders }
        |MATCH (c)-[:FROM_NATION]->(x:%)
        |RETURN c.c_name AS name, n_orders, count(*) AS nat_rows
        |ORDER BY name""".stripMargin),
      Some("""SELECT c_name AS name,
             |  (SELECT count(*) FROM orders
             |   WHERE o_custkey = c_custkey) AS n_orders,
             |  CAST(1 AS BIGINT) AS nat_rows
             |FROM customer WHERE c_acctbal > 9900
             |ORDER BY 1""".stripMargin)),

    // --- extended simple CASE (round 13; Cypher 5 `WHEN IS NULL /
    //     WHEN < x / WHEN STARTS WITH …` operand predicates) + isNaN
    ("q143_case_extended", cyx(
      """MATCH (o:Order) WHERE o.o_orderkey <= 200
        |RETURN CASE o.o_totalprice
        |         WHEN < 50000.0 THEN 'small'
        |         WHEN < 150000.0 THEN 'mid'
        |         ELSE 'large' END AS bucket,
        |       CASE o.o_orderpriority
        |         WHEN STARTS WITH '1', STARTS WITH '2' THEN 'hot'
        |         ELSE 'cold' END AS heat,
        |       count(*) AS n
        |ORDER BY bucket, heat""".stripMargin),
      Some("""SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
             |            WHEN o_totalprice < 150000.0 THEN 'mid'
             |            ELSE 'large' END AS bucket,
             |       CASE WHEN o_orderpriority LIKE '1%'
             |              OR o_orderpriority LIKE '2%' THEN 'hot'
             |            ELSE 'cold' END AS heat,
             |       count(*) AS n
             |FROM orders WHERE o_orderkey <= 200
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- entity subscript n['key'] + trim specifiers (round 13;
    //     Neo4j dynamic property access with a static key; Cypher 5
    //     trim(BOTH/LEADING/TRAILING ch FROM s)): both in-row codegen
    ("q142_subscript_trim", cyx(
      """MATCH (c:Customer) WHERE c['c_acctbal'] > 9900
        |RETURN trim(LEADING 'C' FROM c['c_name']) AS tn,
        |       trim(BOTH 'r0' FROM c.c_name) AS bn
        |ORDER BY tn""".stripMargin),
      Some("""SELECT ltrim(c_name, 'C') AS tn,
             |       trim(c_name, 'r0') AS bn
             |FROM customer WHERE c_acctbal > 9900
             |ORDER BY 1""".stripMargin)),

    // --- Cypher 5 label expressions (round 13): `&` intersection,
    //     `!` negation (absent discriminator = not labeled), `!=`
    //     inequality — all static-schema lowerings pushed to the scan
    ("q141_label_expr", cyx(
      """MATCH (c:Customer&!BuildingCustomer)-[:FROM_NATION]->(n:Nation)
        |WHERE c.c_acctbal > 9900 AND c.c_nationkey != 3
        |RETURN c.c_name AS name, n.n_name AS nat
        |ORDER BY name""".stripMargin),
      Some("""SELECT c_name AS name, n_name AS nat
             |FROM customer JOIN nation ON n_nationkey = c_nationkey
             |WHERE c_acctbal > 9900
             |  AND (c_mktsegment IS NULL OR c_mktsegment <> 'BUILDING')
             |  AND c_nationkey <> 3
             |ORDER BY 1""".stripMargin)),

    // --- duration.inDays / inMonths (round 13; Neo4j's whole-unit
    //     duration constructors): truncated-toward-zero whole days /
    //     months as native Spark intervals, round-tripped through
    //     date arithmetic (base on the 1st aligns months_between with
    //     the calendar-month diff)
    ("q140_duration_units", cyx(
      """MATCH (o:Order) WHERE o.o_orderkey <= 60
        |WITH o, date('1995-01-01') AS base
        |RETURN o.o_orderkey AS ok,
        |       base + duration.inDays(base, o.o_orderdate) AS snapped,
        |       datetime(base + duration.inMonths(base,
        |                o.o_orderdate)) AS msnap
        |ORDER BY ok""".stripMargin),
      Some("""SELECT o_orderkey AS ok,
             |  CAST(DATE '1995-01-01' + to_days(CAST(
             |    datediff('day', DATE '1995-01-01', o_orderdate)
             |    AS INTEGER)) AS TIMESTAMP) AS snapped,
             |  CAST(DATE '1995-01-01' + to_months(CAST(
             |    datediff('month', DATE '1995-01-01', o_orderdate)
             |    AS INTEGER)) AS TIMESTAMP) AS msnap
             |FROM orders WHERE o_orderkey <= 60
             |ORDER BY ok""".stripMargin)),

    // --- QPP group-node sub-label (round 13): a declared sub-label on
    //     a group node lowers to its discriminator equality, pushed
    //     into the ONE filtered edge frame before the unroll
    ("q139_qpp_sublabel", cyx(
      """MATCH (a:Customer) ((x)-[:PLACED]->(y:UrgentOrder)){1,1}
        |(b:Order)
        |WHERE a.c_acctbal > 9900
        |RETURN a.c_name AS name, count(*) AS urgent
        |ORDER BY name""".stripMargin),
      Some("""SELECT c_name AS name, count(*) AS urgent
             |FROM customer JOIN orders ON o_custkey = c_custkey
             |WHERE c_acctbal > 9900
             |  AND o_orderpriority = '1-URGENT'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- multi-relationship quantified path pattern group (round 13;
    //     Cypher 5 `((a)-[:R]->(b)-[:S]->(c)){m,n}`): the chain
    //     composes into ONE synthetic (src, dst) edge frame —
    //     per-repetition predicates applied while composing — and the
    //     quantifier rides the ordinary [*lo..hi] unroll over the
    //     composite. {1,2} over a 2-hop unit-span group = paths of
    //     length 2 and 4 on the unit chain.
    ("q138_qpp_chain", cyx(
      """MATCH (a:Nation)
        |      ((x)-[j:JUMPS_TO]->(y)-[k:JUMPS_TO]->(z)
        |       WHERE j.jump_span = 1 AND k.jump_span = 1){1,2}
        |      (b:Nation)
        |RETURN a.n_nationkey AS ak, b.n_nationkey AS bk,
        |       count(*) AS n
        |ORDER BY ak, bk""".stripMargin),
      Some("""WITH chain AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation),
             |j AS (SELECT src, dst FROM chain WHERE dst IS NOT NULL),
             |h2 AS (SELECT a.src AS ak, b.dst AS bk
             |       FROM j a JOIN j b ON a.dst = b.src),
             |h4 AS (SELECT a.ak, b.bk
             |       FROM h2 a JOIN h2 b ON a.bk = b.ak)
             |SELECT ak, bk, count(*) AS n
             |FROM (SELECT * FROM h2 UNION ALL SELECT * FROM h4)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- multi-pattern COUNT { } subquery (round 13; Neo4j
    //     comma-separated pattern parts): the parts conjoin over
    //     shared bindings exactly like a multi-pattern MATCH — shared
    //     `o` joins the urgent subset back to PLACED, disjoint parts
    //     cross within the correlated row
    ("q137_count_multi_pattern", cyx(
      """MATCH (c:Customer)
        |WHERE c.c_acctbal > 9900
        |RETURN c.c_name AS name,
        |       COUNT { (c)-[:PLACED]->(o:Order),
        |               (c)-[:PLACED_URGENT]->(o) } AS urgent,
        |       COUNT { (c)-[:PLACED]->(o2:Order),
        |               (c)-[:FROM_NATION]->(n:Nation) } AS pairs
        |ORDER BY name""".stripMargin),
      Some("""SELECT c_name AS name,
             |  CAST((SELECT count(*) FROM orders
             |        WHERE o_custkey = c_custkey
             |          AND o_orderpriority = '1-URGENT') AS INTEGER)
             |    AS urgent,
             |  CAST((SELECT count(*) FROM orders, nation
             |        WHERE o_custkey = c_custkey
             |          AND n_nationkey = c_nationkey) AS INTEGER)
             |    AS pairs
             |FROM customer WHERE c_acctbal > 9900
             |ORDER BY 1""".stripMargin)),

    // --- CALL schema procedures (round 13; Neo4j db.labels /
    //     db.relationshipTypes / db.propertyKeys /
    //     db.schema.*TypeProperties): the graph schema is static
    //     config, so each procedure is a compile-time literal frame —
    //     one in-row explode, no scan, no shuffle. The VALUES mirror
    //     IS the honest oracle: it spells the declared schema the
    //     engine must faithfully report.
    ("q135_call_labels", cyx(
      """CALL db.labels() YIELD label
        |WHERE NOT label ENDS WITH 'Customer'
        |RETURN label ORDER BY label""".stripMargin),
      Some("""SELECT * FROM (VALUES ('Nation'), ('Order'), ('Part'),
             |  ('Region'), ('Supplier'), ('UrgentOrder')) t(label)
             |ORDER BY 1""".stripMargin)),

    ("q136_call_node_props", cyx(
      """CALL db.schema.nodeTypeProperties()
        |YIELD nodeType, propertyName, propertyTypes, mandatory
        |WHERE nodeType IN ['Customer', 'Order']
        |RETURN nodeType, propertyName, propertyTypes[0] AS tpe,
        |       mandatory
        |ORDER BY nodeType, propertyName""".stripMargin),
      Some("""SELECT * FROM (VALUES
             |  ('Customer', 'c_acctbal',      'Double',   FALSE),
             |  ('Customer', 'c_custkey',      'Long',     TRUE),
             |  ('Customer', 'c_mktsegment',   'String',   FALSE),
             |  ('Customer', 'c_name',         'String',   FALSE),
             |  ('Customer', 'c_nationkey',    'Long',     FALSE),
             |  ('Order',    'o_orderdate',    'DateTime', FALSE),
             |  ('Order',    'o_orderkey',     'Long',     TRUE),
             |  ('Order',    'o_orderpriority','String',   FALSE),
             |  ('Order',    'o_orderstatus',  'String',   FALSE),
             |  ('Order',    'o_totalprice',   'Double',   FALSE)
             |) t(nodeType, propertyName, tpe, mandatory)
             |ORDER BY 1, 2""".stripMargin)),

    // --- generic dot access expr.key (round 13; Neo4j nested-map /
    //     computed-value dot access): static dispatch on the inferred
    //     type — nested struct fields, properties(entity) reads,
    //     temporal components on map-carried values — all in-row
    //     codegen expressions, no new joins
    ("q134_dot_access", cyx(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WHERE c.c_acctbal > 9990
        |WITH {who: {name: c.c_name, bal: c.c_acctbal},
        |      when: o.o_orderdate} AS m,
        |     o
        |RETURN m.who.name AS name,
        |       toLong(m.when.year) AS yr,
        |       properties(o).o_totalprice AS tot,
        |       elementId(o) AS eid
        |ORDER BY name, yr, tot""".stripMargin),
      Some("""SELECT c_name AS name, year(o_orderdate) AS yr,
             |       o_totalprice AS tot,
             |       'Order:' || CAST(o_orderkey AS VARCHAR) AS eid
             |FROM customer JOIN orders ON o_custkey = c_custkey
             |WHERE c_acctbal > 9990
             |ORDER BY 1, 2, 3""".stripMargin)),

    // --- epoch-map datetime constructors (round 13; Neo4j
    //     datetime({epochSeconds/epochMillis: …})): the instant
    //     round-trips the epoch accessors; millis compose sub-second
    ("q133_epoch_ctor", cyx(
      """MATCH (o:Order) WHERE o.o_orderkey <= 50
        |WITH o, o.o_orderdate.epochSeconds AS es
        |RETURN o.o_orderkey AS ok,
        |       datetime({epochSeconds: es}) = o.o_orderdate AS rt,
        |       datetime({epochMillis: es * 1000 + 500}) AS shifted
        |ORDER BY ok""".stripMargin),
      Some("""SELECT o_orderkey AS ok, TRUE AS rt,
             |       o_orderdate + INTERVAL '500 milliseconds' AS shifted
             |FROM orders WHERE o_orderkey <= 50
             |ORDER BY ok""".stripMargin)),

    // --- IN over arbitrary list expressions (round 13; Neo4j `x IN
    //     range(…)` / `x IN split(…)`): lowered to in-row
    //     array_contains with Cypher's 3-valued null contract
    ("q132_in_list_expr", cyx(
      """MATCH (c:Customer)
        |WHERE c.c_nationkey IN range(0, 5) AND
        |      c.c_mktsegment IN split('BUILDING,MACHINERY', ',')
        |RETURN c.c_nationkey AS nk, count(*) AS n
        |ORDER BY nk""".stripMargin),
      Some("""SELECT c_nationkey AS nk, count(*) AS n
             |FROM customer
             |WHERE c_nationkey BETWEEN 0 AND 5
             |  AND c_mktsegment IN ('BUILDING', 'MACHINERY')
             |GROUP BY 1 ORDER BY nk""".stripMargin)),

    // --- IS :: type predicate + interval scaling (round 13; Cypher 5
    //     / GQL): the type check folds to a constant per expression
    //     against the static schema (null rows read true); duration *
    //     n lowers to Spark's native interval multiply and composes
    //     with temporal arithmetic.
    ("q131_type_pred_scale", cyx(
      """MATCH (o:Order) WHERE o.o_orderkey <= 50
        |RETURN o.o_orderkey AS ok,
        |       o.o_orderdate + duration('PT12H') * 3 AS shifted,
        |       o.o_totalprice IS :: FLOAT AS isf,
        |       o.o_orderstatus IS NOT :: INTEGER AS notint
        |ORDER BY ok""".stripMargin),
      Some("""SELECT o_orderkey AS ok,
             |       o_orderdate + INTERVAL '36' HOUR AS shifted,
             |       TRUE AS isf, TRUE AS notint
             |FROM orders WHERE o_orderkey <= 50
             |ORDER BY ok""".stripMargin)),

    // --- || concatenation (round 13; Cypher 5 / GQL): strings and
    //     lists, null-propagating, mirrored by DuckDB's own ||
    ("q130_pipe_concat", cyx(
      """MATCH (c:Customer) WHERE c.c_custkey <= 100
        |RETURN c.c_name || '/' || c.c_mktsegment AS tag,
        |       size(split(c.c_name, '0') || [c.c_mktsegment]) AS n
        |ORDER BY tag""".stripMargin),
      Some("""SELECT c_name || '/' || c_mktsegment AS tag,
             |       CAST(len(string_split(c_name, '0')) + 1 AS INTEGER)
             |         AS n
             |FROM customer WHERE c_custkey <= 100
             |ORDER BY tag""".stripMargin)),

    // --- map subscript m['key'] (round 13; literal keys read struct
    //     fields — static schema, so the lookup compiles to a plain
    //     column read, no runtime dispatch)
    ("q129_map_subscript", cyx(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |WHERE c.c_acctbal > 9990
        |WITH c {.c_name, .c_acctbal} AS m, n.n_name AS nat
        |RETURN m['c_name'] AS name, nat,
        |       m['c_acctbal'] * 2 AS db
        |ORDER BY name""".stripMargin),
      Some("""SELECT c_name AS name, n_name AS nat,
             |       c_acctbal * 2 AS db
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_acctbal > 9990 ORDER BY 1""".stripMargin)),

    // --- bare pattern predicate + multi-value simple CASE (round 13;
    //     two everyday Neo4j idioms): `WHERE (c)-[:R]->(:L {…})`
    //     desugars to the EXISTS semi-join machinery (backtracked
    //     against parenthesized arithmetic), and `CASE x WHEN a, b
    //     THEN` OR-joins the equality matches.
    ("q128_bare_pattern_pred", cyx(
      """MATCH (c:Customer)
        |WHERE (c)-[:PLACED]->(:Order {o_orderpriority: '1-URGENT'})
        |RETURN CASE c.c_mktsegment WHEN 'BUILDING', 'MACHINERY'
        |         THEN 'industrial' ELSE 'other' END AS seg,
        |       count(*) AS n
        |ORDER BY seg""".stripMargin),
      Some("""SELECT CASE WHEN c_mktsegment IN ('BUILDING', 'MACHINERY')
             |         THEN 'industrial' ELSE 'other' END AS seg,
             |       count(*) AS n
             |FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey
             |    AND o_orderpriority = '1-URGENT')
             |GROUP BY 1 ORDER BY seg""".stripMargin)),

    // --- label predicate n:Label as a boolean expression (round 13;
    //     Neo4j's everyday WHERE idiom): static-schema lowering — the
    //     node's own label folds true, a declared sub-label becomes
    //     its discriminator equality (pushed to the scan), a foreign
    //     label folds false; mirrored by plain predicates.
    ("q127_label_pred", cyx(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |WHERE c:BuildingCustomer AND NOT c:MachineryCustomer
        |RETURN n.n_name AS nation, count(*) AS n_bldg,
        |       count(CASE WHEN c:Customer THEN 1 END) AS n_all
        |ORDER BY nation""".stripMargin),
      Some("""SELECT n_name AS nation, count(*) AS n_bldg,
             |       count(*) AS n_all
             |FROM customer JOIN nation ON n_nationkey = c_nationkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY 1 ORDER BY nation""".stripMargin)),

    // --- bounded var-length inside COUNT{} / COLLECT{} (round 13):
    //     the subquery pattern expands into the ordinary per-length
    //     branch union (one slim frame per length, UNION ALL before
    //     the one collect) — COUNT counts PATHS over the branching
    //     jump DAG, COLLECT pages the ordered target list; DuckDB
    //     mirrors with an explicit 2-step self-join walk.
    ("q126_varlen_subquery", cyx(
      """MATCH (n:Nation)
        |RETURN n.n_nationkey AS nk,
        |       COUNT { (n)-[:JUMPS_TO*1..2]->(m:Nation) } AS paths2,
        |       reduce(s = '', k IN
        |         COLLECT { (n)-[:JUMPS_TO*1..2]->(m:Nation)
        |                   RETURN m.n_nationkey
        |                   ORDER BY m.n_nationkey LIMIT 2 } |
        |         s + '|' + toString(k)) AS tops
        |ORDER BY nk""".stripMargin),
      Some("""WITH s AS (
             |  SELECT n_nationkey AS k, n_regionkey AS rg,
             |         row_number() OVER (PARTITION BY n_regionkey
             |                            ORDER BY n_nationkey) AS rk
             |  FROM nation),
             |e AS (SELECT a.k AS src, b.k AS dst
             |      FROM s a JOIN s b ON b.rg = a.rg
             |        AND (b.rk = a.rk + 1 OR b.rk = a.rk + 2)),
             |p AS (SELECT src, dst FROM e
             |      UNION ALL
             |      SELECT e1.src, e2.dst FROM e e1
             |        JOIN e e2 ON e2.src = e1.dst),
             |r AS (SELECT src, dst, row_number() OVER (
             |        PARTITION BY src ORDER BY dst) AS rnk FROM p),
             |agg AS (SELECT src, count(*) AS n FROM p GROUP BY 1),
             |tops AS (SELECT src, string_agg('|' || CAST(dst AS VARCHAR),
             |                '' ORDER BY rnk) AS ks
             |         FROM r WHERE rnk <= 2 GROUP BY 1)
             |SELECT n.n_nationkey AS nk,
             |       CAST(coalesce(agg.n, 0) AS INTEGER) AS paths2,
             |       coalesce(tops.ks, '') AS tops
             |FROM nation n
             |LEFT JOIN agg ON agg.src = n.n_nationkey
             |LEFT JOIN tops ON tops.src = n.n_nationkey
             |ORDER BY nk""".stripMargin)),

    // --- relationships(p) on an unbounded shortestPath (round 13;
    //     completes the accessor pair): the witness hop pairs join
    //     the edge frame once and re-collect in hop order. Over the
    //     branching JUMPS_TO DAG the min-id parent tie-break makes
    //     the witness deterministic: even chain positions walk all
    //     +2 jumps, odd positions one +1 then +2s — DuckDB mirrors
    //     the spans with rank arithmetic (repeat()).
    ("q125_unbounded_rels", cyx(
      """MATCH p = shortestPath(
        |  (a:Nation {n_nationkey: 0})-[:JUMPS_TO*]->(b:Nation))
        |RETURN b.n_nationkey AS dst, length(p) AS hops,
        |       reduce(s = '', r IN relationships(p) |
        |              s + '|' + toString(r.jump_span)) AS spans
        |ORDER BY dst""".stripMargin),
      Some("""WITH s AS (
             |  SELECT n_nationkey,
             |         row_number() OVER (ORDER BY n_nationkey) - 1 AS rk
             |  FROM nation
             |  WHERE n_regionkey =
             |    (SELECT n_regionkey FROM nation WHERE n_nationkey = 0))
             |SELECT n_nationkey AS dst, (rk + 1) // 2 AS hops,
             |       CASE WHEN rk % 2 = 1
             |            THEN '|1' || repeat('|2', CAST((rk - 1) // 2
             |                                          AS INT))
             |            ELSE repeat('|2', CAST(rk // 2 AS INT))
             |       END AS spans
             |FROM s WHERE rk > 0 ORDER BY dst""".stripMargin)),

    // --- time-of-day types (round 13; Neo4j time/localtime): Spark
    //     has no TIME type, so both lower to DAY-TIME INTERVALS since
    //     midnight — comparisons and duration arithmetic stay native
    //     interval ops, components read date_part. Row-varying times
    //     come from the component-map constructor; DuckDB mirrors
    //     with real TIME values (make_time / extract / TIME literal
    //     comparison), value-checking the lowering end to end.
    ("q123_time_type", cyx(
      """MATCH (o:Order) WHERE o.o_orderkey <= 100
        |WITH o, time({hour: o.o_orderkey % 24,
        |              minute: o.o_orderkey % 60}) AS t
        |RETURN o.o_orderkey AS ok, t.hour AS h, t.minute AS m,
        |       t > time('12:00:00') AS pm,
        |       t = localtime({hour: o.o_orderkey % 24,
        |                      minute: o.o_orderkey % 60}) AS eq
        |ORDER BY ok""".stripMargin),
      Some("""SELECT o_orderkey AS ok,
             |  CAST(extract(hour FROM make_time(CAST(o_orderkey % 24
             |    AS BIGINT), CAST(o_orderkey % 60 AS BIGINT), 0))
             |    AS INTEGER) AS h,
             |  CAST(extract(minute FROM make_time(CAST(o_orderkey % 24
             |    AS BIGINT), CAST(o_orderkey % 60 AS BIGINT), 0))
             |    AS INTEGER) AS m,
             |  make_time(CAST(o_orderkey % 24 AS BIGINT),
             |            CAST(o_orderkey % 60 AS BIGINT), 0)
             |    > TIME '12:00:00' AS pm,
             |  TRUE AS eq
             |FROM orders WHERE o_orderkey <= 100
             |ORDER BY ok""".stripMargin)),

    // --- quantified path pattern (round 13; Cypher 5 / GQL): the
    //     group's REL predicate walks the unit chain only and the
    //     interior NODE predicate cuts every repetition whose target
    //     key is divisible by 3 — both lower to ONE filtered edge
    //     frame behind a synthetic verb, then the ordinary [*1..3]
    //     unroll; DuckDB mirrors the walk with three explicit
    //     self-joins over the filtered successor edges.
    ("q122_qpp", cyx(
      """MATCH (a:Nation) ((x)-[j:JUMPS_TO]->(y)
        |  WHERE j.jump_span = 1 AND y.n_nationkey % 3 <> 0){1,3}
        |(b:Nation)
        |RETURN a.n_nationkey AS src, b.n_nationkey AS dst
        |ORDER BY src, dst""".stripMargin),
      Some("""WITH s AS (
             |  SELECT n_nationkey AS k, n_regionkey AS rg,
             |         row_number() OVER (PARTITION BY n_regionkey
             |                            ORDER BY n_nationkey) AS rk
             |  FROM nation),
             |e AS (SELECT a.k AS src, b.k AS dst
             |      FROM s a JOIN s b ON b.rg = a.rg AND b.rk = a.rk + 1
             |      WHERE b.k % 3 <> 0)
             |SELECT src, dst FROM e
             |UNION ALL
             |SELECT e1.src, e2.dst FROM e e1 JOIN e e2 ON e2.src = e1.dst
             |UNION ALL
             |SELECT e1.src, e3.dst FROM e e1
             |  JOIN e e2 ON e2.src = e1.dst
             |  JOIN e e3 ON e3.src = e2.dst
             |ORDER BY src, dst""".stripMargin)),

    // --- path CREATE (round 13): a 2-edge path in ONE clause —
    //     desugared into per-edge creates chained over read-back
    //     frames (the q103 plumbing); the RETURN reads every binding
    //     of the whole path. PLACED appends into orders, CONTAINS
    //     into lineitem — distinct tables, so the one-snapshot guard
    //     holds per clause.
    ("q120_create_path",
      (s, dir) => cyx(
        """MATCH (c:Customer) WHERE c.c_custkey <= 5
          |MATCH (o:Order) WHERE o.o_orderkey = 1
          |MATCH (p:Part) WHERE p.p_partkey = 1
          |CREATE (c)-[r:PLACED {o_orderdate: datetime('2031-01-01')}]
          |->(o)-[l:CONTAINS {l_quantity: 7.0}]->(p)
          |RETURN c.c_custkey AS ck, r.o_orderdate AS d,
          |       l.l_quantity AS q
          |ORDER BY ck""".stripMargin).apply(s, dir),
      Some("""SELECT c_custkey AS ck,
             |       TIMESTAMP '2031-01-01 00:00:00' AS d,
             |       7.0 AS q
             |FROM customer WHERE c_custkey <= 5
             |ORDER BY ck""".stripMargin)),

    // --- multi-variable DELETE (round 13): DELETE l, o in one clause
    //     — one delete per backing table (lineitem then orders), the
    //     result is the INNERMOST clause's new snapshot: orders minus
    //     every matched order (an order matches only if it HAS
    //     lineitems — the EXISTS in the mirror).
    ("q121_delete_multi",
      (s, dir) => cyx(
        """MATCH (o:Order)-[l:CONTAINS]->(p:Part)
          |WHERE o.o_orderkey <= 50
          |DETACH DELETE l, o""".stripMargin).apply(s, dir)
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
             |       o_orderdate, o_orderpriority
             |FROM orders
             |WHERE NOT (o_orderkey <= 50 AND EXISTS (
             |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey))
             |ORDER BY o_orderkey""".stripMargin)),

    // --- COLLECT { } with ORDER BY / LIMIT (round 13; the full Neo4j
    //     subquery tail): per-customer top-3 order keys by price — the
    //     rank filter lowers to WindowGroupLimit before the collect,
    //     the list itself rides (rank, value) pairs + in-row sort.
    //     Lists reduce to strings on both sides (pandas cannot sort
    //     list columns in the gate's row-sorted compare).
    ("q119_collect_paged", cyx(
      """MATCH (c:Customer) WHERE c.c_custkey <= 100
        |WITH c, COLLECT { (c)-[:PLACED]->(o:Order)
        |                  RETURN o.o_orderkey
        |                  ORDER BY o.o_totalprice DESC, o.o_orderkey
        |                  LIMIT 3 } AS top3
        |RETURN c.c_custkey AS ck, size(top3) AS n,
        |       reduce(s = '', k IN top3 | s + '|' + toString(k)) AS keys
        |ORDER BY ck""".stripMargin),
      Some("""WITH ranked AS (
             |  SELECT o_custkey, o_orderkey, row_number() OVER (
             |    PARTITION BY o_custkey
             |    ORDER BY o_totalprice DESC, o_orderkey) AS rk
             |  FROM orders),
             |t AS (SELECT o_custkey,
             |        string_agg('|' || CAST(o_orderkey AS VARCHAR), ''
             |                   ORDER BY rk) AS ks,
             |        count(*) AS n
             |      FROM ranked WHERE rk <= 3 GROUP BY 1)
             |SELECT c_custkey AS ck, CAST(coalesce(n, 0) AS INTEGER) AS n,
             |       coalesce(ks, '') AS keys
             |FROM customer LEFT JOIN t ON o_custkey = c_custkey
             |WHERE c_custkey <= 100 ORDER BY ck""".stripMargin)),

    // --- node MERGE with a property-map match key (round 13; the
    //     node twin of q104's rel lift — Neo4j matches on id AND map):
    //     feed rows whose map value equals the node's stored c_name
    //     match their own row (ck <= 100, ON MATCH zeroes the
    //     balance); the 'synthetic'-name rows (100 < ck <= 200) match
    //     nothing and create a SECOND row under the same id with the
    //     map stamped (duplicate-id-lite, the multigraph-lite
    //     contract's node face) — both branches in one snapshot,
    //     mirrored by a plain UNION ALL in DuckDB.
    ("q118_merge_node_map",
      (s, dir) => cyx(
        """MATCH (c:Customer) WHERE c.c_custkey <= 200
          |WITH c.c_custkey AS ck,
          |     CASE WHEN c.c_custkey <= 100 THEN c.c_name
          |          ELSE 'synthetic' END AS nm
          |MERGE (n:Customer {c_custkey: ck, c_name: nm})
          |ON MATCH SET n.c_acctbal = 0.0""".stripMargin)
        .apply(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name,
             |       CASE WHEN c_custkey <= 100 THEN 0.0
             |            ELSE c_acctbal END AS c_acctbal
             |FROM customer
             |UNION ALL
             |SELECT c_custkey, 'synthetic' AS c_name,
             |       NULL AS c_acctbal
             |FROM customer WHERE c_custkey > 100 AND c_custkey <= 200
             |ORDER BY c_custkey, c_name""".stripMargin)),

    // --- map projection (round 13; Neo4j's everyday RETURN idiom,
    //     extension — the reference has no map support at all,
    //     CypherVisitor.cs:2040-2044): `c {.*, nat: …}` expands the
    //     declared properties plus a computed key into one in-row
    //     named_struct; the post-WITH WHERE and the RETURN dot-access
    //     read fields back out of it. Scalar fields mirror directly in
    //     DuckDB — the struct never leaves the plan.
    ("q117_map_projection", cyx(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |WITH c {.*, nat: n.n_name} AS m
        |WHERE m.c_acctbal > 9990
        |RETURN m.c_name AS name, m.nat AS nation, m.c_acctbal * 2 AS bal2
        |ORDER BY name""".stripMargin),
      Some("""SELECT c_name AS name, n_name AS nation,
             |       c_acctbal * 2 AS bal2
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_acctbal > 9990 ORDER BY 1""".stripMargin)),

    // --- SET n:SubLabel (round 12): label assignment through the
    //     discriminator model — matched rows take the sub-label's
    //     declared value, everything else passes through; REMOVE is
    //     the conditional null (unit-pinned). Mirrored by a CASE.
    ("q116_set_label",
      (s, dir) => cyx(
        """MATCH (c:Customer)
          |WHERE c.c_custkey < 100 AND c.c_mktsegment = 'AUTOMOBILE'
          |SET c:BuildingCustomer""".stripMargin)
        .apply(s, dir).orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_acctbal,
             |  CASE WHEN c_custkey < 100 AND c_mktsegment = 'AUTOMOBILE'
             |       THEN 'BUILDING' ELSE c_mktsegment END
             |    AS c_mktsegment,
             |  c_nationkey
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // --- COLLECT { … RETURN expr } subquery (round 12; Cypher 5):
    //     one list per outer row over the comprehension machinery —
    //     size() of the big-order list per customer, zero-match rows
    //     report 0; mirrored by a LEFT JOIN count.
    ("q115_collect_subquery", cyx(
      """MATCH (c:Customer) WHERE c.c_custkey <= 60
        |RETURN c.c_custkey AS ck,
        |       size(COLLECT { (c)-[:PLACED]->(o:Order)
        |                      WHERE o.o_totalprice > 100000.0
        |                      RETURN o.o_orderkey }) AS n_big
        |ORDER BY ck""".stripMargin),
      Some("""SELECT c_custkey AS ck,
             |       CAST(coalesce(b.n, 0) AS INTEGER) AS n_big
             |FROM customer LEFT JOIN (
             |  SELECT o_custkey, count(*) AS n FROM orders
             |  WHERE o_totalprice > 100000.0 GROUP BY 1) b
             |  ON b.o_custkey = c_custkey
             |WHERE c_custkey <= 60
             |ORDER BY ck""".stripMargin)),

    // --- labels(n) with sub-labels (round 12): rows matching a
    //     schema-declared sub-label discriminator report it after the
    //     primary — Neo4j's multi-label read face; mirrored by a CASE
    //     over the discriminator.
    ("q114_labels_sub", cyx(
      """MATCH (c:Customer) WHERE c.c_custkey <= 200
        |RETURN c.c_custkey AS ck, size(labels(c)) AS n_labels,
        |       labels(c)[1] AS sub
        |ORDER BY ck""".stripMargin),
      Some("""SELECT c_custkey AS ck,
             |  CAST(CASE WHEN c_mktsegment IN ('BUILDING', 'MACHINERY')
             |       THEN 2 ELSE 1 END AS INTEGER) AS n_labels,
             |  CASE WHEN c_mktsegment = 'BUILDING'
             |         THEN 'BuildingCustomer'
             |       WHEN c_mktsegment = 'MACHINERY'
             |         THEN 'MachineryCustomer' END AS sub
             |FROM customer WHERE c_custkey <= 200
             |ORDER BY ck""".stripMargin)),

    // --- stdlib fills (round 12): 1-arg round (HALF_UP), isEmpty over
    //     strings/lists, tail(list) — mirrored by DuckDB round /
    //     length = 0 / list slicing.
    ("q113_stdlib_fills", cyx(
      """MATCH (c:Customer) WHERE c.c_custkey <= 100
        |WITH c, split(c.c_name, '#') AS parts
        |RETURN c.c_custkey AS ck, round(c.c_acctbal) AS bal,
        |       isEmpty(c.c_mktsegment) AS seg_empty,
        |       size(tail(parts)) AS n_tail,
        |       head(tail(parts)) AS second
        |ORDER BY ck""".stripMargin),
      Some("""SELECT c_custkey AS ck,
             |       round(CAST(c_acctbal AS DOUBLE)) AS bal,
             |       (length(c_mktsegment) = 0) AS seg_empty,
             |       CAST(len(string_split(c_name, '#')) - 1 AS INTEGER)
             |         AS n_tail,
             |       string_split(c_name, '#')[2] AS second
             |FROM customer WHERE c_custkey <= 100
             |ORDER BY ck""".stripMargin)),

    // --- CALL { … UNION … } (round 12): an uncorrelated subquery may
    //     be a union — it runs ONCE and its deduped value rows
    //     cross-join the incoming rows (broadcast nested loop over
    //     slim columns); correlated unions stay typed.
    ("q112_call_union", cyx(
      """MATCH (r:Region) WHERE r.r_regionkey <= 1
        |CALL {
        |  MATCH (c:Customer) WHERE c.c_acctbal > 9990.0
        |  RETURN c.c_name AS nm
        |  UNION
        |  MATCH (s:Supplier) WHERE s.s_acctbal > 9900.0
        |  RETURN s.s_name AS nm
        |}
        |RETURN r.r_name AS region, count(*) AS n, min(nm) AS first_nm
        |ORDER BY region""".stripMargin),
      Some("""WITH u AS (
             |  SELECT c_name AS nm FROM customer WHERE c_acctbal > 9990.0
             |  UNION
             |  SELECT s_name FROM supplier WHERE s_acctbal > 9900.0)
             |SELECT r_name AS region, count(*) AS n, min(nm) AS first_nm
             |FROM region CROSS JOIN u WHERE r_regionkey <= 1
             |GROUP BY 1 ORDER BY region""".stripMargin)),

    // --- temporal MAP constructors (round 12; Neo4j date({year: …})):
    //     component expressions (columns compose) through make_date /
    //     make_timestamp, absent calendar fields defaulting to their
    //     floor — round-tripped from o_orderdate's own accessors and
    //     mirrored by DuckDB's make_date/make_timestamp.
    ("q111_temporal_ctor", cyx(
      """MATCH (o:Order) WHERE o.o_orderkey <= 50
        |RETURN o.o_orderkey AS ok,
        |       datetime({year: o.o_orderdate.year,
        |                 month: o.o_orderdate.month,
        |                 day: o.o_orderdate.day, hour: 12}) AS noon,
        |       toString(date({year: o.o_orderdate.year})) AS jan1
        |ORDER BY ok""".stripMargin),
      Some("""SELECT o_orderkey AS ok,
             |  make_timestamp(year(o_orderdate), month(o_orderdate),
             |    day(o_orderdate), 12, 0, 0) AS noon,
             |  CAST(make_date(CAST(year(o_orderdate) AS INT), 1, 1)
             |    AS VARCHAR) AS jan1
             |FROM orders WHERE o_orderkey <= 50
             |ORDER BY ok""".stripMargin)),

    // --- WITH p path projection (round 12): the path's length column
    //     and witness arrays thread through the WITH (post-WITH WHERE
    //     filters on length), and nodes(p) still reads the carried
    //     witnesses afterwards — mirrored by an explicit two-hop walk.
    ("q110_with_path", cyx(
      """MATCH p = (a:Nation)-[:JUMPS_TO*1..2]->(b:Nation)
        |WITH p, a, b WHERE length(p) = 2
        |RETURN a.n_name AS src_name, b.n_name AS dst_name,
        |       reduce(s = '', n IN nodes(p) | s + '>' + n.n_name)
        |         AS chain
        |ORDER BY src_name, dst_name, chain""".stripMargin),
      Some("""WITH s AS (
             |  SELECT n_nationkey, n_regionkey, row_number() OVER (
             |    PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn
             |  FROM nation),
             |e AS (
             |  SELECT a.n_nationkey AS src, b.n_nationkey AS dst
             |  FROM s a JOIN s b ON a.n_regionkey = b.n_regionkey
             |    AND b.rn - a.rn IN (1, 2)),
             |two AS (
             |  SELECT e1.src AS src, e1.dst AS mid, e2.dst AS dst
             |  FROM e e1 JOIN e e2 ON e2.src = e1.dst)
             |SELECT a.n_name AS src_name, b.n_name AS dst_name,
             |       '>' || a.n_name || '>' || m.n_name || '>' || b.n_name
             |         AS chain
             |FROM two
             |JOIN nation a ON a.n_nationkey = two.src
             |JOIN nation m ON m.n_nationkey = two.mid
             |JOIN nation b ON b.n_nationkey = two.dst
             |ORDER BY src_name, dst_name, chain""".stripMargin)),

    // --- collect(entity) (round 12): an array of the entity's
    //     property struct per group — UNWIND round-trips the rows, so
    //     the collect → unwind → filter → re-aggregate pipeline equals
    //     the plain join the mirror runs (order inside the collected
    //     array never observed).
    ("q109_collect_entity", cyx(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |WITH n, collect(c) AS cs
        |UNWIND cs AS c2
        |WITH n, c2 WHERE c2.c_acctbal > 9000.0
        |RETURN n.n_name AS nation, count(*) AS n_rich,
        |       round(sum(c2.c_acctbal), 2) AS bal
        |ORDER BY nation""".stripMargin),
      Some("""SELECT n.n_name AS nation, count(*) AS n_rich,
             |       round(sum(c.c_acctbal), 2) AS bal
             |FROM customer c JOIN nation n
             |  ON n.n_nationkey = c.c_nationkey
             |WHERE c.c_acctbal > 9000.0
             |GROUP BY 1 ORDER BY nation""".stripMargin)),

    // --- named path in OPTIONAL MATCH (round 12): per-branch lengths
    //     ride the optional branch union and null-fill through the one
    //     left join — count(length(p)) counts matched paths, sum
    //     aggregates over them, unmatched nations contribute the null
    //     row. Chain-tail nations (last in region) have zero paths.
    ("q108_optional_path", cyx(
      """MATCH (n:Nation)
        |OPTIONAL MATCH p = (n)-[:NEXT_IN_REGION*1..2]->(m:Nation)
        |RETURN n.n_name AS nation, count(length(p)) AS n_paths,
        |       coalesce(sum(length(p)), 0) AS tot
        |ORDER BY nation""".stripMargin),
      Some("""WITH s AS (
             |  SELECT n_nationkey, n_regionkey, row_number() OVER (
             |    PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn
             |  FROM nation),
             |d AS (
             |  SELECT a.n_nationkey AS src, b.rn - a.rn AS hops
             |  FROM s a JOIN s b ON a.n_regionkey = b.n_regionkey
             |    AND b.rn - a.rn IN (1, 2))
             |SELECT n.n_name AS nation, count(d.hops) AS n_paths,
             |       CAST(coalesce(sum(d.hops), 0) AS BIGINT) AS tot
             |FROM nation n LEFT JOIN d ON d.src = n.n_nationkey
             |GROUP BY 1 ORDER BY nation""".stripMargin)),

    // --- FOREACH ingest (round 12; the last rejected updating
    //     construct): `FOREACH (x IN list | <updating clause>)`
    //     desugars to UNWIND + the terminal clause — sound here
    //     because the snapshot result winner-dedups feed multiplicity;
    //     the oracle creates one synthetic nation per (element,
    //     matched-key) pair on top of the untouched snapshot.
    ("q107_foreach",
      (s, dir) => cyx(
        """MATCH (n:Nation) WHERE n.n_nationkey < 3
          |FOREACH (x IN [1000, 2000] |
          |  MERGE (m:Nation {n_nationkey: x + n.n_nationkey})
          |  ON CREATE SET m.n_name = 'SYN_' + toString(x + n.n_nationkey))"""
          .stripMargin)
        .apply(s, dir).orderBy("n_nationkey"),
      Some("""SELECT n_nationkey, n_name FROM nation
             |UNION ALL
             |SELECT x + k AS n_nationkey,
             |       'SYN_' || CAST(x + k AS VARCHAR) AS n_name
             |FROM (SELECT unnest([1000, 2000]) AS x)
             |CROSS JOIN (SELECT n_nationkey AS k FROM nation
             |            WHERE n_nationkey < 3)
             |ORDER BY n_nationkey""".stripMargin)),

    // --- nodes(p) over shortestPath (round 12): the everyday Neo4j
    //     combination — the reduction keeps the minimal length per
    //     (src, dst) binding AND that row's witness arrays (struct-min:
    //     length first, then the smallest (nodes, rels) arrays — a
    //     total, deterministic order the mirror reproduces with
    //     DuckDB's lexicographic min over the path's id LIST, exact
    //     because n_name is functionally dependent on n_nationkey).
    //     JUMPS_TO's +1/+2 diamonds make real ties at the minimum.
    ("q106_shortest_nodes", cyx(
      """MATCH p = shortestPath((a:Nation)-[:JUMPS_TO*1..3]->(b:Nation))
        |RETURN a.n_name AS src_name, b.n_name AS dst_name,
        |       length(p) AS hops,
        |       reduce(s = '', n IN nodes(p) | s + '>' + n.n_name)
        |         AS chain
        |ORDER BY src_name, dst_name""".stripMargin),
      Some("""WITH RECURSIVE s AS (
             |  SELECT n_nationkey, n_regionkey, row_number() OVER (
             |    PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn
             |  FROM nation),
             |e AS (
             |  SELECT a.n_nationkey AS src, b.n_nationkey AS dst
             |  FROM s a JOIN s b ON a.n_regionkey = b.n_regionkey
             |    AND b.rn - a.rn IN (1, 2)),
             |walk(src, dst, d, ids, chain) AS (
             |  SELECT e.src, e.dst, 1, [e.src, e.dst],
             |         '>' || a.n_name || '>' || b.n_name
             |  FROM e
             |  JOIN nation a ON a.n_nationkey = e.src
             |  JOIN nation b ON b.n_nationkey = e.dst
             |  UNION ALL
             |  SELECT w.src, e.dst, w.d + 1, list_append(w.ids, e.dst),
             |         w.chain || '>' || b.n_name
             |  FROM walk w
             |  JOIN e ON e.src = w.dst
             |  JOIN nation b ON b.n_nationkey = e.dst
             |  WHERE w.d < 3),
             |m AS (SELECT src, dst, min(d) AS md FROM walk GROUP BY 1, 2),
             |c AS (SELECT w.* FROM walk w
             |      JOIN m ON m.src = w.src AND m.dst = w.dst
             |        AND w.d = m.md),
             |best AS (SELECT src, dst, min(ids) AS bids
             |         FROM c GROUP BY 1, 2)
             |SELECT a.n_name AS src_name, b.n_name AS dst_name,
             |       CAST(c.d AS BIGINT) AS hops, c.chain AS chain
             |FROM c
             |JOIN best ON best.src = c.src AND best.dst = c.dst
             |  AND c.ids = best.bids
             |JOIN nation a ON a.n_nationkey = c.src
             |JOIN nation b ON b.n_nationkey = c.dst
             |ORDER BY src_name, dst_name""".stripMargin)),

    // --- multi-updating pipeline (round 12): SET then MERGE in ONE
    //     query — the MERGE's feed is the SET's read-back frame, so
    //     ON CREATE SET reads the query's own write (c_acctbal + 100);
    //     the negative merge key never exists, pinning the created
    //     branch. One snapshot per entity stays a typed rejection
    //     (unit-pinned); mirrored by plain arithmetic in DuckDB.
    ("q103_multi_update", cyx(
      """MATCH (c:Customer) WHERE c.c_custkey <= 50
        |SET c.c_acctbal = c.c_acctbal + 100.0
        |WITH c
        |MERGE (o:Order {o_orderkey: -1 - c.c_custkey})
        |ON CREATE SET o.o_totalprice = c.c_acctbal
        |RETURN count(*) AS n, round(sum(o.o_totalprice), 2) AS tot"""
        .stripMargin),
      Some("""SELECT count(*) AS n,
             |       round(sum(c_acctbal + 100.0), 2) AS tot
             |FROM customer WHERE c_custkey <= 50""".stripMargin)),

    // --- EXISTS under OR (round 11): no semi-join form exists for a
    //     disjunctive existential, so it lowers as a per-row VALUE
    //     through the correlated-comprehension machinery (size of a
    //     1-per-match list > 0, grouped per outer key, left-joined
    //     back) — the top-level-conjunct positions keep the cheaper
    //     semi-join
    ("q99_exists_under_or", cyx(
      """MATCH (c:Customer)
        |WHERE c.c_acctbal > 9990.0
        |   OR NOT EXISTS((c)-[:PLACED]->(:Order))
        |RETURN count(*) AS n, round(sum(c.c_acctbal), 2) AS bal"""
        .stripMargin),
      Some("""SELECT count(*) AS n, round(sum(c_acctbal), 2) AS bal
             |FROM customer
             |WHERE c_acctbal > 9990.0
             |   OR c_custkey NOT IN (SELECT o_custkey FROM orders)"""
             .stripMargin)),

    // --- filter-cascade funnel report (round 11): ordered quality
    //     stages over the corpus — sequential funnel counts plus each
    //     stage's UNIQUE rejections (rows it alone rejects — the
    //     stage's marginal value); one map-side flag projection + one
    //     aggregate, reshaped from the 1-row result
    ("p28_filter_cascade",
      (s, dir) => Pipeline.filterCascadeReport(docs(s, dir), Seq(
          "min_length" -> (length(col("text")) >= 200),
          "lang_en" -> (col("lang") === "en"),
          "source_web" -> (col("source") =!= "synthetic")))
        .select(col("stage_no"), col("stage"), col("n_in"), col("n_pass"),
          round(col("pass_rate"), 6).as("pass_rate"),
          col("n_unique_reject"),
          round(col("standalone_rate"), 6).as("standalone_rate"))
        .orderBy("stage_no"),
      Some("""WITH f AS (
             |  SELECT CASE WHEN length(text) >= 200 THEN 1 ELSE 0 END
             |           AS f1,
             |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS f2,
             |         CASE WHEN source <> 'synthetic' THEN 1 ELSE 0 END
             |           AS f3
             |  FROM documents),
             |a AS (SELECT count(*) AS in1,
             |        sum(f1) AS in2, sum(f1*f2) AS in3,
             |        sum(f1*f2*f3) AS pass3,
             |        sum(f1) AS s1, sum(f2) AS s2, sum(f3) AS s3,
             |        sum((1-f1)*f2*f3) AS u1,
             |        sum(f1*(1-f2)*f3) AS u2,
             |        sum(f1*f2*(1-f3)) AS u3
             |      FROM f)
             |SELECT 1 AS stage_no, 'min_length' AS stage,
             |       CAST(in1 AS BIGINT) AS n_in,
             |       CAST(in2 AS BIGINT) AS n_pass,
             |       round(CAST(in2 AS DOUBLE) / in1, 6) AS pass_rate,
             |       CAST(u1 AS BIGINT) AS n_unique_reject,
             |       round(CAST(s1 AS DOUBLE) / in1, 6) AS standalone_rate
             |FROM a
             |UNION ALL
             |SELECT 2, 'lang_en', CAST(in2 AS BIGINT),
             |       CAST(in3 AS BIGINT),
             |       round(CAST(in3 AS DOUBLE) / in2, 6),
             |       CAST(u2 AS BIGINT),
             |       round(CAST(s2 AS DOUBLE) / in1, 6) FROM a
             |UNION ALL
             |SELECT 3, 'source_web', CAST(in3 AS BIGINT),
             |       CAST(pass3 AS BIGINT),
             |       round(CAST(pass3 AS DOUBLE) / in3, 6),
             |       CAST(u3 AS BIGINT),
             |       round(CAST(s3 AS DOUBLE) / in1, 6) FROM a
             |ORDER BY stage_no""".stripMargin)),

    // --- SET = {map} full replacement (round 11): listed keys
    //     assign, every other declared non-id property nulls — the
    //     clause expands against the schema at compile time, so the
    //     nulling is explicit contract; same winner-dedup and
    //     snapshot-union path as spelled-out SET
    ("q98_set_full_replace",
      (s, dir) => cyx(
        """MATCH (c:Customer) WHERE c.c_acctbal < 0.0
          |SET c = {c_name: 'RESET', c_acctbal: 0.0}""".stripMargin)
        .apply(s, dir).orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  CASE WHEN c_acctbal < 0.0 THEN 'RESET'
             |       ELSE c_name END AS c_name,
             |  CASE WHEN c_acctbal < 0.0 THEN 0.0
             |       ELSE c_acctbal END AS c_acctbal,
             |  CASE WHEN c_acctbal < 0.0 THEN NULL
             |       ELSE c_mktsegment END AS c_mktsegment,
             |  CASE WHEN c_acctbal < 0.0 THEN NULL
             |       ELSE c_nationkey END AS c_nationkey
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // --- REMOVE sugar (round 10): REMOVE n.p parses into SET n.p =
    //     null (property removal IS a null write in a table-backed
    //     graph) — aggregated feed keys the nation snapshot
    ("q71_remove_prop",
      (s, dir) => cyx(
        """MATCH (n:Nation)<-[:FROM_NATION]-(c:Customer)
          |WITH n, count(c) AS nc
          |WHERE nc >= 40
          |REMOVE n.n_name""".stripMargin)
        .apply(s, dir).orderBy("n_nationkey"),
      Some("""WITH f AS (
             |  SELECT c_nationkey AS k FROM customer
             |  GROUP BY 1 HAVING count(*) >= 40)
             |SELECT n_nationkey,
             |  CASE WHEN f.k IS NOT NULL THEN NULL
             |       ELSE n_name END AS n_name
             |FROM nation LEFT JOIN f ON f.k = n_nationkey
             |ORDER BY n_nationkey""".stripMargin)),

    // --- Cypher 5 pattern predicates (extension): WHERE inside node
    //     and relationship patterns, desugared at parse to the
    //     enclosing MATCH's WHERE — plan-identical to the spelled-out
    //     form (predicates reach the scans as PushedFilters)
    ("q53_pattern_where", cyx(
      """MATCH (c:Customer WHERE c.c_acctbal > 5000.0)-[:PLACED]->
        |      (o:Order)-[l:CONTAINS WHERE l.l_quantity >= 45]->
        |      (p:Part WHERE p.p_size <= 10)
        |RETURN c.c_name AS cname, p.p_name AS pname,
        |       l.l_quantity AS qty
        |ORDER BY cname, pname, qty""".stripMargin),
      Some("""SELECT c_name AS cname, p_name AS pname, l_quantity AS qty
             |FROM customer
             |JOIN orders ON o_custkey = c_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN part ON p_partkey = l_partkey
             |WHERE c_acctbal > 5000.0 AND l_quantity >= 45
             |  AND p_size <= 10
             |ORDER BY cname, pname, qty""".stripMargin)),

    // --- var-length inside EXISTS (round 7; previously a typed
    //     rejection): the probe is the UNION of the bounded branches'
    //     correlation keys (semi-join), and an unbounded [*] routes
    //     through the reach lowering first — both exercised here
    ("q54_exists_varlength", cyx(
      """MATCH (a:Nation)
        |WHERE EXISTS((a)-[:NEXT_IN_REGION*2..3]->(b:Nation))
        |  AND EXISTS((a)-[:NEXT_IN_REGION*]->(c:Nation))
        |RETURN a.n_name AS name ORDER BY name""".stripMargin),
      Some("""WITH chain AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation),
             |two AS (SELECT DISTINCT c1.src FROM chain c1
             |        JOIN chain c2 ON c1.dst = c2.src
             |        WHERE c1.dst IS NOT NULL AND c2.dst IS NOT NULL)
             |SELECT n_name AS name FROM nation
             |JOIN two ON n_nationkey = two.src
             |ORDER BY name""".stripMargin)),

    // --- temporal component accessors (extension): `x.prop.year` etc.
    //     on columns, lowered to the component functions; dayOfWeek is
    //     ISO (1 = Monday), mirrored by DuckDB isodow
    ("q55_temporal_components", cyx(
      """MATCH (o:Order) WHERE o.o_orderkey <= 500
        |RETURN o.o_orderdate.year AS y, o.o_orderdate.quarter AS q,
        |       o.o_orderdate.month AS mo, o.o_orderdate.week AS w,
        |       o.o_orderdate.dayOfWeek AS dow,
        |       count(o) AS n, min(o.o_orderdate.day) AS min_day
        |ORDER BY y, q, mo, w, dow""".stripMargin),
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS y,
             |       CAST(quarter(o_orderdate) AS INT) AS q,
             |       CAST(month(o_orderdate) AS INT) AS mo,
             |       CAST(weekofyear(o_orderdate) AS INT) AS w,
             |       CAST(isodow(o_orderdate) AS INT) AS dow,
             |       count(o_orderkey) AS n,
             |       CAST(min(day(o_orderdate)) AS INT) AS min_day
             |FROM orders WHERE o_orderkey <= 500
             |GROUP BY 1, 2, 3, 4, 5
             |ORDER BY y, q, mo, w, dow""".stripMargin)),

    // --- anchored unbounded reach (round 8): a literal WHERE equality
    //     on the source endpoint seeds the reachability BFS from the
    //     ONE anchored nation, so only its successor cone is ever
    //     materialized (never the full closure — guard-proven in
    //     CypherExtensionsSpec); mirrored by a DuckDB recursive CTE
    //     whose base case is seeded the same way
    ("q56_anchored_reach", cyx(
      """MATCH (a:Nation)-[:NEXT_IN_REGION*1..]->(b:Nation)
        |WHERE a.n_name = 'NATION_2'
        |RETURN a.n_name AS src_name, b.n_name AS dst_name
        |ORDER BY dst_name""".stripMargin),
      Some("""WITH RECURSIVE chain AS (
             |  SELECT n_nationkey AS src,
             |         lead(n_nationkey) OVER (PARTITION BY n_regionkey
             |           ORDER BY n_nationkey) AS dst
             |  FROM nation),
             |reach AS (
             |  SELECT c.src, c.dst FROM chain c
             |  JOIN nation a ON a.n_nationkey = c.src
             |  WHERE c.dst IS NOT NULL AND a.n_name = 'NATION_2'
             |  UNION
             |  SELECT r.src, c.dst FROM reach r
             |  JOIN chain c ON c.src = r.dst WHERE c.dst IS NOT NULL)
             |SELECT a.n_name AS src_name, b.n_name AS dst_name
             |FROM reach
             |JOIN nation a ON a.n_nationkey = reach.src
             |JOIN nation b ON b.n_nationkey = reach.dst
             |ORDER BY dst_name""".stripMargin)),

    // --- terminal MERGE onto a snapshot (round 8; the ONLY updating
    //     clause lowered — reference is read-only by design,
    //     CypherVisitor.cs:486-489; parity keeps the rejection). The
    //     result is the NEW Nation snapshot: even nations (matched)
    //     get renamed via ON MATCH SET reading the OLD value, odd
    //     nations re-key to +100 (absent) and insert via ON CREATE
    //     SET; untouched rows pass through. applyChangeFeed's shape —
    //     winner-dedup feed, one anti-join, union.
    ("q57_merge_snapshot",
      (s, dir) => cyx(
        """MATCH (c:Customer)
          |WITH c.c_nationkey AS nk, count(c) AS n_cust
          |MERGE (n:Nation {n_nationkey:
          |         CASE WHEN nk % 2 = 0 THEN nk ELSE nk + 100 END})
          |ON MATCH SET n.n_name = n.n_name + '_SEEN'
          |ON CREATE SET n.n_name = 'NEW_' + toString(n_cust)""".stripMargin)
        .apply(s, dir).orderBy("n_nationkey"),
      Some("""WITH f AS (
             |  SELECT CASE WHEN c_nationkey % 2 = 0 THEN c_nationkey
             |              ELSE c_nationkey + 100 END AS k,
             |         count(*) AS n_cust
             |  FROM customer GROUP BY c_nationkey),
             |mt AS (SELECT n.n_nationkey, n.n_name || '_SEEN' AS n_name
             |       FROM nation n JOIN f ON f.k = n.n_nationkey),
             |cr AS (SELECT f.k AS n_nationkey,
             |              'NEW_' || CAST(f.n_cust AS VARCHAR) AS n_name
             |       FROM f LEFT JOIN nation n ON n.n_nationkey = f.k
             |       WHERE n.n_nationkey IS NULL),
             |ut AS (SELECT n_nationkey, n_name FROM nation
             |       WHERE n_nationkey NOT IN (SELECT k FROM f))
             |SELECT n_nationkey, n_name
             |FROM (SELECT * FROM ut UNION ALL SELECT * FROM mt
             |      UNION ALL SELECT * FROM cr)
             |ORDER BY n_nationkey""".stripMargin)),

    // --- node-label alternation `(n:A|B)` (round 8): union semantics
    //     over sub-labels of ONE owning node — lowers to an OR of
    //     discriminator conjuncts on a single scan (labels backed by
    //     different tables stay a typed rejection: their ids live in
    //     different namespaces)
    ("q58_label_alternation", cyx(
      """MATCH (c:BuildingCustomer|MachineryCustomer)-[:PLACED]->(o:Order)
        |RETURN c.c_mktsegment AS seg, count(o) AS n_orders,
        |       round(sum(o.o_totalprice), 2) AS total
        |ORDER BY seg""".stripMargin),
      Some("""SELECT c_mktsegment AS seg, count(o_orderkey) AS n_orders,
             |       round(sum(o_totalprice), 2) AS total
             |FROM customer JOIN orders ON o_custkey = c_custkey
             |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
             |GROUP BY 1 ORDER BY seg""".stripMargin)),

    // --- BOUND relationship-type alternation `[r:A|B]` (round 8):
    //     branch union over the UNION of the alternatives' property
    //     namespaces, null-filled per branch (missing-property-is-null)
    //     — urgent orders appear twice (once per verb), the
    //     PLACED branch with pri null, the PLACED_URGENT branch with it
    ("q59_rel_alternation", cyx(
      """MATCH (c:Customer)-[r:PLACED|PLACED_URGENT]->(o:Order)
        |WHERE o.o_orderkey <= 2000
        |RETURN c.c_custkey AS ck, o.o_orderkey AS ok,
        |       r.o_orderdate AS od, r.o_orderpriority AS pri
        |ORDER BY ck, ok, pri""".stripMargin),
      Some("""WITH u AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate,
             |         NULL AS pri FROM orders
             |  UNION ALL
             |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority
             |  FROM orders WHERE o_orderpriority = '1-URGENT')
             |SELECT c_custkey AS ck, o_orderkey AS ok,
             |       o_orderdate AS od, pri
             |FROM u JOIN customer ON c_custkey = o_custkey
             |WHERE o_orderkey <= 2000
             |ORDER BY ck, ok, pri NULLS FIRST""".stripMargin)),

    // --- trigonometric registry (openCypher stdlib: sin/cos/atan2/
    //     degrees/haversin...); trig inside aggregate args, per-part
    //     implicit grouping
    ("q46_trig", cyx(
      """MATCH (o:Order)-[l:CONTAINS]->(p:Part)
        |WHERE p.p_partkey <= 30
        |RETURN p.p_partkey AS pk,
        |       round(min(sin(l.l_quantity / 10.0)), 6) AS s,
        |       round(min(cos(l.l_quantity / 10.0)), 6) AS c,
        |       round(min(atan2(l.l_quantity, 10.0)), 6) AS a2,
        |       round(min(degrees(atan(l.l_quantity / 10.0))), 6) AS dg,
        |       round(min(haversin(l.l_quantity / 10.0)), 6) AS hv
        |ORDER BY pk""".stripMargin),
      Some("""SELECT l_partkey AS pk,
             |  round(min(sin(l_quantity / 10.0)), 6) AS s,
             |  round(min(cos(l_quantity / 10.0)), 6) AS c,
             |  round(min(atan2(l_quantity, 10.0)), 6) AS a2,
             |  round(min(degrees(atan(l_quantity / 10.0))), 6) AS dg,
             |  round(min((1 - cos(l_quantity / 10.0)) / 2), 6) AS hv
             |FROM lineitem WHERE l_partkey <= 30
             |GROUP BY 1 ORDER BY pk""".stripMargin)),

    // --- mid-pipeline WITH ... ORDER BY ... LIMIT paging: top-20
    //     customers by order count, then re-matched to their nations
    //     (the sorted intermediate truncation feeds further MATCHes)
    ("q47_with_paging", cyx(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WITH c, count(o) AS n_orders
        |ORDER BY n_orders DESC, c.c_custkey LIMIT 20
        |MATCH (c)-[:FROM_NATION]->(n:Nation)
        |RETURN n.n_name AS nation, count(c) AS top_buyers,
        |       sum(n_orders) AS orders
        |ORDER BY nation""".stripMargin),
      Some("""WITH t AS (
             |  SELECT c_custkey, count(*) AS n_orders
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1 ORDER BY n_orders DESC, c_custkey LIMIT 20)
             |SELECT n_name AS nation, count(*) AS top_buyers,
             |       CAST(sum(t.n_orders) AS BIGINT) AS orders
             |FROM t JOIN customer c ON c.c_custkey = t.c_custkey
             |JOIN nation ON n_nationkey = c_nationkey
             |GROUP BY 1 ORDER BY nation""".stripMargin)))

  // ================================================= training-data pipeline

  private val opsSpecs: Seq[Spec] = Seq(
    // --- exact dedup (hash-groupBy; bodies never shuffle)
    ("d01_dedup_exact",
      (s, dir) => Dedup.exact(docs(s, dir), "text", "doc_id").orderBy("doc_id"),
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS n_dups
             |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin)),

    // --- blocked all-pairs n-gram Jaccard near-dup (block = lang×source:
    //     the quadratic operator is only ever pointed at small blocks)
    ("d02_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(
          docs(s, dir).withColumn("blk",
            concat_ws("|", col("lang"), col("source"))),
          "text", "doc_id", blockCol = "blk", n = 3, threshold = 0.5)
        .orderBy("id_a", "id_b"),
      Some("""WITH sh AS (
             |  SELECT doc_id, lang, source,
             |         list_distinct([array_to_string(t[i:i+2], ' ')
             |                        for i in range(1, len(t) - 1)]) AS s
             |  FROM (SELECT doc_id, lang, source,
             |          CASE WHEN trim(text) = '' THEN []::VARCHAR[]
             |               ELSE string_split_regex(trim(text), '\s+') END AS t
             |        FROM documents))
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |       len(list_intersect(a.s, b.s))::DOUBLE /
             |         (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::DOUBLE
             |         AS jaccard
             |FROM sh a JOIN sh b
             |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
             |WHERE len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0
             |  AND len(list_intersect(a.s, b.s))::DOUBLE /
             |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::DOUBLE
             |        >= 0.5
             |ORDER BY id_a, id_b""".stripMargin)),

    // --- MinHash+LSH near-dup; candidates are exact-verified, and at
    //     threshold 0.8 with 32 bands × 4 rows the miss probability is
    //     < 1e-7, so the exact all-pairs oracle matches
    ("d03_minhash_lsh",
      (s, dir) => Dedup.minhashLshPairs(docs(s, dir), "text", "doc_id",
          n = 3, k = 128, bands = 32, threshold = 0.8)
        .orderBy("id_a", "id_b"),
      Some("""WITH sh AS (
             |  SELECT doc_id,
             |         list_distinct([array_to_string(t[i:i+2], ' ')
             |                        for i in range(1, len(t) - 1)]) AS s
             |  FROM (SELECT doc_id,
             |          CASE WHEN trim(text) = '' THEN []::VARCHAR[]
             |               ELSE string_split_regex(trim(text), '\s+') END AS t
             |        FROM documents))
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |       len(list_intersect(a.s, b.s))::DOUBLE /
             |         len(list_distinct(list_concat(a.s, b.s)))::DOUBLE AS jaccard
             |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |WHERE len(list_distinct(list_concat(a.s, b.s))) > 0
             |  AND len(list_intersect(a.s, b.s))::DOUBLE /
             |        len(list_distinct(list_concat(a.s, b.s)))::DOUBLE >= 0.8
             |ORDER BY id_a, id_b""".stripMargin)),

    // --- near-dup PAIRS → CLUSTERS: connected components over the d03
    //     pair graph (alternating large-star/small-star — no adjacency
    //     lists, edge-list-only shuffles), one row per clustered doc
    //     with its canonical keep-id and cluster size. Oracle: DuckDB
    //     recursive CTE propagating min-reachable-id over the same
    //     (exact all-pairs) edge set.
    ("d06_dup_clusters",
      (s, dir) => {
        val pairs = Dedup.minhashLshPairs(docs(s, dir), "text", "doc_id",
          n = 3, k = 128, bands = 32, threshold = 0.8)
        val cc = Dedup.connectedComponents(pairs)
        cc.select(col("id").as("doc_id"), col("component").as("cluster_id"))
          .withColumn("cluster_size",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("cluster_id"))))
          .orderBy("doc_id")
      },
      Some(dupClustersOracle)),

    // --- incremental component maintenance (round 16; VERDICT-r15
    //     #7): the d06 pair graph split into two deterministic
    //     halves — the first half builds the EXISTING assignment, the
    //     second merges in via componentsAgainst (touched components
    //     re-solve over their star edges + batch pairs; untouched
    //     rows pass through byte-exact). merged ≡ from-scratch over
    //     the union, so d06's recursive-CTE cluster map binds it.
    ("d32_components_incremental",
      (s, dir) => {
        val pairs = Dedup.minhashLshPairs(docs(s, dir), "text", "doc_id",
          n = 3, k = 128, bands = 32, threshold = 0.8)
          .localCheckpoint(false)
        val half1 = pairs.where(pmod(col("id_a") + col("id_b"),
          lit(2)) === 0)
        val half2 = pairs.where(pmod(col("id_a") + col("id_b"),
          lit(2)) === 1)
        val existing = Dedup.connectedComponents(half1)
        Dedup.componentsAgainst(existing, half2)
          .select(col("id").as("doc_id"),
            col("component").as("cluster_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $dupClusterCtes
             |SELECT doc_id, cluster_id FROM comp
             |ORDER BY doc_id""".stripMargin)),

    // --- RETRACTION-aware incremental components (round 17): the d06
    //     pair graph minus a deterministic fifth of its edges —
    //     componentsRetract repairs only the components the removals
    //     touch (real remaining edges re-solve; a split lands both
    //     halves; ids losing their last edge become singletons;
    //     untouched rows byte-exact).
    ("d35_components_retract",
      (s, dir) => {
        val pairs = Dedup.minhashLshPairs(docs(s, dir), "text", "doc_id",
          n = 3, k = 128, bands = 32, threshold = 0.8)
          .localCheckpoint(false)
        val removed = pairs.where(pmod(col("id_a") + col("id_b"),
          lit(5)) === 1)
        val existing = Dedup.connectedComponents(pairs)
        Dedup.componentsRetract(existing, pairs, removed)
          .select(col("id").as("doc_id"),
            col("component").as("cluster_id"))
          .orderBy("doc_id")
      },
      Some(componentsRetractOracle)),

    // --- STREAMING incremental components (round 17; the e57
    //     foreachBatch-accumulator shape over componentsAgainst): the
    //     d06 pair graph arrives in 3 deterministic micro-batches,
    //     each merged into the running assignment touched-components-
    //     only; the final assignment ≡ from-scratch over the union
    //     (so d06's recursive-CTE cluster map binds it).
    ("d36_stream_components",
      (s, dir) => {
        import s.implicits._
        val pairs = Dedup.minhashLshPairs(docs(s, dir), "text",
            "doc_id", n = 3, k = 128, bands = 32, threshold = 0.8)
          .select(col("id_a").cast("long"), col("id_b").cast("long"))
          .as[(Long, Long)].collect().sortBy(identity).toSeq
        var acc: DataFrame = null
        graft.streaming.Replay.runForeachBatch(s,
            graft.streaming.Replay.timeChunks(pairs, 3)) { (batch, _) =>
          val bp = batch.toDF("id_a", "id_b")
          if (!bp.isEmpty)
            acc = (if (acc == null) Dedup.connectedComponents(bp)
                   else Dedup.componentsAgainst(acc, bp))
              .localCheckpoint(true)
        }
        acc.select(col("id").as("doc_id"),
            col("component").as("cluster_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $dupClusterCtes
             |SELECT doc_id, cluster_id FROM comp
             |ORDER BY doc_id""".stripMargin)),

    // --- cluster-level near-dedup with a QUALITY keeper policy: same
    //     pair graph as d03/d06, keep the best-quality member per
    //     cluster (not the min id) — the retention rule a curation
    //     pipeline actually wants
    ("d08_dedup_keep_best",
      (s, dir) => {
        val d = docs(s, dir)
        val pairs = Dedup.minhashLshPairs(d, "text", "doc_id",
          n = 3, k = 128, bands = 32, threshold = 0.8)
        // the quality expression goes in as the pref itself, so the
        // featurizer runs only on cluster members, not the whole corpus
        Dedup.nearDeduplicateBy(d, pairs, "doc_id",
            Seq(TextOps.qualityScoreF(TextOps.features(col("text")),
              col("n_chars")).desc, col("doc_id").asc))
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id")
      },
      Some(keepBestOracle)),

    // --- leakage-safe train/test split: the split unit is the near-dup
    //     CLUSTER (root from the d03 pair graph), so near-duplicates of
    //     training docs can never land in test. Oracle: recursive-CTE
    //     cluster map + the same multiplicative-hash cut.
    ("p04_leakage_safe_split",
      (s, dir) => {
        val d = docs(s, dir)
        val pairs = Dedup.minhashLshPairs(d, "text", "doc_id",
          n = 3, k = 128, bands = 32, threshold = 0.8)
        Pipeline.leakageSafeSplit(d, pairs, "doc_id", testFraction = 0.2)
          .select(col("doc_id"), col("split"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $dupClusterCtes,
             |k AS (SELECT d.doc_id,
             |        coalesce(c.cluster_id, d.doc_id) AS key
             |      FROM documents d LEFT JOIN comp c USING (doc_id))
             |SELECT doc_id,
             |       CASE WHEN (key * 2654435761) % 1000000007
             |              < CAST(floor(0.2 * 1000000007) AS BIGINT)
             |            THEN 'test' ELSE 'train' END AS split
             |FROM k ORDER BY doc_id""".stripMargin)),

    // --- DSIR importance weights + derandomized Gumbel-top-n sample:
    //     log-likelihood ratio of each doc's token bag under the
    //     English-subset target vs the full-corpus distribution
    //     (exact-token oracle mode; production hashes into buckets).
    //     Weight AND selection flag value-checked per document.
    ("p05_dsir_weights",
      (s, dir) => {
        val d = docs(s, dir)
        val w = Pipeline.dsirWeights(d, d.where(col("lang") === "en"),
          "text", "doc_id")
        val sel = Pipeline.dsirSelect(w, "doc_id", n = 50)
          .select(col("doc_id"), lit(true).as("__sel"))
        w.join(sel, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            round(col("log_ratio"), 6).as("log_ratio"),
            coalesce(col("__sel"), lit(false)).as("selected"))
          .orderBy("doc_id")
      },
      Some(dsirOracle)),

    // --- corpus mixture plan + map-only application: per-language
    //     token availability vs a target share map, deterministic
    //     hash-cut sampling rates, and the applied per-group counts —
    //     the whole plan AND the sample it induces value-checked
    ("p06_mixture",
      (s, dir) => {
        val d = docs(s, dir)
        val plan = Pipeline.mixturePlan(d, "text", "lang",
          Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.15, "es" -> 0.1,
            "zh" -> 0.05), budgetTokens = 100000L)
        val applied = Pipeline.applyMixture(d, "doc_id", "lang", plan)
          .groupBy(col("lang")).agg(count(lit(1)).as("sampled_docs"))
        plan.join(applied, Seq("lang"), "left")
          .select(col("lang"), col("n_docs"), col("avail_tokens"),
            round(col("target_tokens"), 6).as("target_tokens"),
            round(col("rate"), 6).as("rate"), col("deficit"),
            coalesce(col("sampled_docs"), lit(0L)).as("sampled_docs"))
          .orderBy("lang")
      },
      Some("""WITH t AS (SELECT doc_id, lang,
             |    CASE WHEN trim(text)='' THEN []::VARCHAR[]
             |         ELSE string_split_regex(trim(text), '\s+') END AS tk
             |  FROM documents),
             |a AS (SELECT lang, count(*) AS n_docs,
             |        CAST(sum(len(tk)) AS BIGINT) AS avail_tokens
             |      FROM t GROUP BY 1),
             |p AS (SELECT lang, n_docs, avail_tokens,
             |        CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.2
             |               WHEN 'fr' THEN 0.15 WHEN 'es' THEN 0.1
             |               WHEN 'zh' THEN 0.05 ELSE 0.0 END AS DOUBLE)
             |          * 100000.0 AS target_tokens
             |      FROM a),
             |p2 AS (SELECT *,
             |         least(1.0, target_tokens / avail_tokens) AS rate,
             |         target_tokens > avail_tokens AS deficit FROM p),
             |s AS (SELECT t.lang, count(*) AS sampled_docs
             |      FROM t JOIN p2 ON t.lang = p2.lang
             |      WHERE (t.doc_id*2654435761)%1000000007
             |              < CAST(floor(rate*1000000007) AS BIGINT)
             |      GROUP BY 1)
             |SELECT p2.lang AS lang, n_docs, avail_tokens,
             |       round(target_tokens, 6) AS target_tokens,
             |       round(rate, 6) AS rate, deficit,
             |       coalesce(s.sampled_docs, 0) AS sampled_docs
             |FROM p2 LEFT JOIN s ON p2.lang = s.lang
             |ORDER BY p2.lang""".stripMargin)),

    // --- SimHash near-dup (xxhash64-based — no SQL oracle; rows-only +
    //     ScalaTest against planted near-dups)
    // oracle mode: the per-token hash is two fingerprint64 values packed
    // into 60 bits — plain modular arithmetic the DuckDB oracle
    // recomputes exactly, so the full (pairs, distance) output is
    // value-checked cross-engine. maxBucket is raised so no qualifying
    // pair is cap-dropped (the oracle is an uncapped all-pairs scan);
    // production corpora keep the default cap.
    ("d04_simhash",
      (s, dir) => Dedup.simhashPairs(docs(s, dir), "text", "doc_id",
          maxDist = 3, tokenHashes = mirrorTokenHash, maxBucket = 1 << 20)
        .orderBy("id_a", "id_b"),
      Some(simhashOracle)),

    // --- the PRODUCTION simhash path: native per-token xxhash64 (one
    //     compiled loop, no SQL-mirrorable arithmetic) and the default
    //     skew cap. The pair VALUES can't be value-checked cross-engine
    //     (DuckDB has no xxhash64), so the query emits a STRUCTURAL
    //     oracle instead — one row of invariants the match set must
    //     satisfy, each computable or pinnable in plain SQL:
    //       exact_pairs          C(n,2) over identical-text groups —
    //                            DuckDB recomputes it from `documents`;
    //       missing_exact_pairs  exact dups hash to IDENTICAL
    //                            fingerprints (dist 0), so simhash MUST
    //                            recall every one of them — pinned 0;
    //       dist_violations      emitted dist outside [0, maxDist] — 0;
    //       dup_rows / order_violations  pair-set canonicalization
    //                            (unique, id_a < id_b) — 0.
    //     The planted-pair value-level checks live in OpsSpec; the
    //     oracle-mode hash twin d04_simhash value-checks the full
    //     pipeline arithmetic cross-engine.
    ("d04_simhash_prod",
      (s, dir) => {
        val pairs = Dedup.simhashPairs(docs(s, dir), "text", "doc_id",
          maxDist = 3)
        val d = docs(s, dir).select(col("doc_id").cast("long").as("id"),
          col("text"))
        val exact = d.as("a").join(d.as("b"),
            col("a.text") === col("b.text") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            lit(1L).as("__e"))
        // one full-outer join = one pass over the prod pair pipeline
        exact.join(pairs, Seq("id_a", "id_b"), "full_outer").agg(
          coalesce(sum(col("__e")), lit(0L)).as("exact_pairs"),
          coalesce(sum(when(col("__e").isNotNull && col("dist").isNull, 1L)
            .otherwise(0L)), lit(0L)).as("missing_exact_pairs"),
          coalesce(sum(when(col("dist") < 0 || col("dist") > 3, 1L)
            .otherwise(0L)), lit(0L)).as("dist_violations"),
          (count(col("dist")) - countDistinct(when(col("dist").isNotNull,
            struct(col("id_a"), col("id_b"))))).as("dup_rows"),
          coalesce(sum(when(col("dist").isNotNull &&
            col("id_a") >= col("id_b"), 1L).otherwise(0L)), lit(0L))
            .as("order_violations"))
      },
      Some("""SELECT
             |  (SELECT CAST(coalesce(sum(n*(n-1)/2), 0) AS BIGINT)
             |   FROM (SELECT count(*) AS n FROM documents
             |         GROUP BY text HAVING count(*) >= 2) g) AS exact_pairs,
             |  CAST(0 AS BIGINT) AS missing_exact_pairs,
             |  CAST(0 AS BIGINT) AS dist_violations,
             |  CAST(0 AS BIGINT) AS dup_rows,
             |  CAST(0 AS BIGINT) AS order_violations""".stripMargin)),

    // --- embedding-cosine near-dup, blocked by label
    ("d05_embedding_dups",
      (s, dir) => Dedup.embeddingNearDupPairs(embs(s, dir), "embedding",
          "vec_id", blockCol = "label", threshold = 0.3)
        .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("id_a", "id_b"),
      Some("""WITH e AS (SELECT vec_id, label,
             |            CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |       round(list_dot_product(a.v, b.v) /
             |         (sqrt(list_dot_product(a.v, a.v)) *
             |          sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
             |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
             |WHERE list_dot_product(a.v, b.v) /
             |        (sqrt(list_dot_product(a.v, a.v)) *
             |         sqrt(list_dot_product(b.v, b.v))) >= 0.3
             |ORDER BY id_a, id_b""".stripMargin)),

    // --- exact brute-force cosine top-k ANN baseline
    ("s01_ann_topk",
      (s, dir) => Similarity.bruteForceTopK(embs(s, dir),
          embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id", k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("query_id", "rank"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings),
             |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |        list_dot_product(q.v, c.v) /
             |          (sqrt(list_dot_product(q.v, q.v)) *
             |           sqrt(list_dot_product(c.v, c.v))) AS cos_sim
             |      FROM e q, e c
             |      WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
             |r AS (SELECT *, row_number() OVER
             |        (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
             |        AS rank FROM s)
             |SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim
             |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // --- LSH-bucketed approximate ANN (scale path). The hyperplane
    //     components are SQL-mirrorable, so the DuckDB oracle computes
    //     the same buckets and the full approximate result is
    //     value-checked (plus the recall ScalaTest).
    ("s02_ann_lsh",
      (s, dir) => Similarity.lshTopK(embs(s, dir),
          embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
          k = 5, nPlanes = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("query_id", "rank"),
      Some(lshAnnOracle)),

    // --- LSH-bucketed RANGE search for a corpus-sized query set
    //     (round 8): equi-join pair generation on the s02 hyperplane
    //     buckets, threshold filter on exact cosine — the bucketed
    //     pair join mirrored verbatim in SQL (same deterministic
    //     plane family, full value oracle)
    ("s32_range_search_lsh",
      (s, dir) => Similarity.rangeSearchLsh(embs(s, dir),
          embs(s, dir).where(col("vec_id") < 200), "embedding", "vec_id",
          threshold = 0.3, nPlanes = 4)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("query_id", "neighbor_id"),
      Some(rangeLshOracle)),

    // --- IVF recall-tuning curve (round 8): recall@5 per nProbe
    //     against the brute-force truth — the s03 centroid/assignment
    //     arithmetic generalized over a probes list, the whole curve
    //     value-checked (the QA harness a production index is tuned
    //     with)
    ("s33_ivf_recall_curve",
      (s, dir) => Similarity.ivfRecallCurve(embs(s, dir),
          embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
          k = 5, nCentroids = 16, probes = Seq(1, 3, 6, 16))
        .select(col("n_probe"), round(col("recall"), 6).as("recall"))
        .orderBy("n_probe"),
      Some(ivfRecallOracle)),

    // --- IVF retrain advisory (round 11): the rebuild-vs-append
    //     decision for the persisted index family (s34/s35) — per-list
    //     centroid drift of the post-append corpus against the frozen
    //     build geometry (s13's monitor keyed by inverted list) plus
    //     recall at the operating point with the ORIGINAL centroids
    //     (s33's measurement at one probe count), thresholds folded
    //     into one recommendation row
    ("s36_ivf_retrain_advisory",
      (s, dir) => Similarity.ivfRetrainAdvisory(
          embs(s, dir).where(col("vec_id") % 4 =!= 0),
          embs(s, dir).where(col("vec_id") % 4 === 0),
          embs(s, dir).where(col("vec_id") < 8),
          "embedding", "vec_id", k = 5, nCentroids = 16, nProbe = 6)
        .select(col("n_built"), col("n_batch"),
          round(col("growth"), 6).as("growth"),
          round(col("recall_at_nprobe"), 6).as("recall_at_nprobe"),
          round(col("mean_drift_cos"), 6).as("mean_drift_cos"),
          round(col("min_drift_cos"), 6).as("min_drift_cos"),
          col("recommendation")),
      Some(ivfRetrainOracle)),

    // --- IVF ANN (centroid inverted lists, map-only assignment). The
    //     centroid sample order and assignment arithmetic are
    //     SQL-mirrorable → full value oracle (plus recall ScalaTest).
    ("s03_ann_ivf",
      (s, dir) => Similarity.ivfTopK(embs(s, dir),
          embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
          k = 5, nCentroids = 16, nProbe = 6)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("query_id", "rank"),
      Some(ivfAnnOracle)),

    // --- product-quantization ANN (FAISS IndexPQ shape): seed
    //     codebooks from the hash-ordered sample (no k-means → fully
    //     SQL-mirrorable), native one-loop encode, ADC scoring via
    //     reconstruction. Full value oracle on codes→distances→ranks.
    ("s08_ann_pq",
      (s, dir) => Similarity.pqTopK(embs(s, dir),
          embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
          k = 5, m = 8, ksub = 16)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("l2_dist"), 6).as("l2_dist"))
        .orderBy("query_id", "rank"),
      Some(pqAnnOracle)),

    // --- persisted PQ index, two-stage probe: the code-only columnar
    //     stage-1 scan shortlists by ADC distance (deterministic seed
    //     codebooks → SQL-mirrorable), stage 2 re-ranks the shortlist
    //     with exact cosine — both stages value-checked end to end.
    ("s09_ann_pq_index",
      (s, dir) => {
        val cb = Similarity.pqCodebooks(embs(s, dir), "embedding", "vec_id",
          m = 8, ksub = 16)
        val path = java.nio.file.Files.createTempDirectory("s09_pqidx").toString
        Similarity.writePqIndex(embs(s, dir), "embedding", "vec_id", cb, path,
          numFiles = 4)
        Similarity.pqProbeIndex(s.read.parquet(path),
            embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
            k = 5, cb, shortlist = 20)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cos_sim"), 6).as("cos_sim"))
          .orderBy("query_id", "rank")
      },
      Some(pqIndexOracle)),

    // --- incremental PQ append (round 12; the s35 shape for the PQ
    //     family): build the index from the even-id half, APPEND the
    //     odd-id half with the ORIGINAL codebooks (one map-only pass
    //     over the batch; frozen geometry), then run the two-stage
    //     probe. Old + new rows under one codebook set ⇒ the probe
    //     sees the full corpus and s09's oracle binds the appended
    //     index end to end.
    ("s37_pq_append",
      (s, dir) => {
        val all = embs(s, dir)
        val cb = Similarity.pqCodebooks(all, "embedding", "vec_id",
          m = 8, ksub = 16)
        val path = java.nio.file.Files.createTempDirectory("s37_pqidx").toString
        Similarity.writePqIndex(all.where(col("vec_id") % 2 === 0),
          "embedding", "vec_id", cb, path, numFiles = 2)
        Similarity.appendPqIndex(all.where(col("vec_id") % 2 === 1),
          "embedding", "vec_id", cb, path, numFiles = 2)
        Similarity.pqProbeIndex(s.read.parquet(path),
            all.where(col("vec_id") < 8), "embedding", "vec_id",
            k = 5, cb, shortlist = 20)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cos_sim"), 6).as("cos_sim"))
          .orderBy("query_id", "rank")
      },
      Some(pqIndexOracle)),

    // --- PQ retrain advisory (round 12; the s36 shape for the PQ
    //     family): rebuild-vs-append for the persisted PQ index —
    //     mean reconstruction error under the FROZEN build codebooks
    //     on built vs batch (PQ's native drift signal) plus recall at
    //     the operating two-stage point over built ∪ batch, thresholds
    //     folded into one recommendation row; fully SQL-mirrored
    //     (deterministic seed codebooks).
    ("s38_pq_retrain_advisory",
      (s, dir) => Similarity.pqRetrainAdvisory(
          embs(s, dir).where(col("vec_id") % 4 =!= 0),
          embs(s, dir).where(col("vec_id") % 4 === 0),
          embs(s, dir).where(col("vec_id") < 8),
          "embedding", "vec_id", k = 5, m = 8, ksub = 16, shortlist = 20)
        .select(col("n_built"), col("n_batch"),
          round(col("growth"), 6).as("growth"),
          round(col("recall_at_shortlist"), 6).as("recall_at_shortlist"),
          round(col("recon_err_built"), 6).as("recon_err_built"),
          round(col("recon_err_batch"), 6).as("recon_err_batch"),
          round(col("recon_drift"), 6).as("recon_drift"),
          col("recommendation")),
      Some(pqRetrainOracle)),

    // --- hard-negative mining: per query, the top-k most-similar rows
    //     with a DIFFERENT label (contrastive-training near-misses) —
    //     exact scan, full value oracle including the negative's label
    ("s10_hard_negatives",
      (s, dir) => Similarity.hardNegatives(embs(s, dir),
          embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
          "label", k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cos_sim"), 6).as("cos_sim"), col("neg_label"))
        .orderBy("query_id", "rank"),
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings),
             |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |        c.label AS neg_label,
             |        list_dot_product(q.v, c.v) /
             |          (sqrt(list_dot_product(q.v, q.v)) *
             |           sqrt(list_dot_product(c.v, c.v))) AS cos_sim
             |      FROM e q, e c
             |      WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
             |        AND c.label <> q.label),
             |r AS (SELECT *, row_number() OVER
             |        (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
             |        AS rank FROM s)
             |SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim,
             |       neg_label
             |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // --- per-label embedding centroids (class prototypes), exploded so
    //     every component is value-checked
    ("s07_group_centroids",
      (s, dir) => Similarity.groupCentroids(embs(s, dir), "embedding", "label")
        .select(col("label"), col("n_vectors"), posexplode(col("centroid")))
        .select(col("label"),
          col("pos").cast(org.apache.spark.sql.types.LongType).as("pos"),
          round(col("col"), 6).as("mean_val"), col("n_vectors"))
        .orderBy("label", "pos"),
      Some("""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings),
             |x AS (SELECT label, u.pos AS pos, u.val AS val FROM (
             |  SELECT label, unnest([{'pos': i - 1, 'val': v[i]}
             |                        for i in range(1, len(v) + 1)]) AS u
             |  FROM e))
             |SELECT label, pos, round(avg(val), 6) AS mean_val,
             |       count(*) AS n_vectors
             |FROM x GROUP BY 1, 2 ORDER BY label, pos""".stripMargin)),

    // --- int8 embedding quantization (exploded so every quantized
    //     component is value-checked; per-row IEEE math → no rounding)
    ("s04_quantize_i8",
      (s, dir) => Similarity.quantizeInt8(embs(s, dir), "embedding", "vec_id")
        .select(col("vec_id"), col("scale"), posexplode(col("qvec")))
        .select(col("vec_id"), col("scale"),
          col("pos").cast(org.apache.spark.sql.types.LongType).as("pos"),
          col("col").as("val"))
        .orderBy("vec_id", "pos"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings),
             |m AS (SELECT vec_id, v,
             |        list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
             |      FROM e),
             |q AS (SELECT vec_id, scale,
             |  [CAST(least(greatest(floor(v[i] / scale + 0.5), -127), 127)
             |        AS TINYINT)
             |   for i in range(1, len(v)+1)] AS qv
             |  FROM m WHERE scale > 0)
             |SELECT vec_id, scale, u.pos AS pos, u.val AS val FROM (
             |  SELECT vec_id, scale,
             |    unnest([{'pos': i-1, 'val': qv[i]}
             |            for i in range(1, len(qv)+1)]) AS u
             |  FROM q)
             |ORDER BY vec_id, pos""".stripMargin)),

    // --- quantized-cosine top-k: int8 corpus scan + native integer dot;
    //     scales cancel in the ratio so every score is exact cross-engine
    ("s05_ann_int8",
      (s, dir) => Similarity.int8TopK(embs(s, dir),
          embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id", k = 5)
        .orderBy("query_id", "rank"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings),
             |m AS (SELECT vec_id, v,
             |        list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
             |      FROM e),
             |qz AS (SELECT vec_id,
             |  CAST([least(greatest(floor(v[i]/scale + 0.5), -127), 127)
             |        for i in range(1, len(v)+1)] AS DOUBLE[]) AS qv
             |  FROM m WHERE scale > 0),
             |n AS (SELECT vec_id, qv, sqrt(list_dot_product(qv, qv)) AS nm
             |      FROM qz),
             |s AS (SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
             |        list_dot_product(c.qv, qq.qv) / (c.nm * qq.nm) AS cos_sim
             |      FROM n c JOIN n qq
             |        ON qq.vec_id < 8 AND c.vec_id <> qq.vec_id),
             |r AS (SELECT *, row_number() OVER
             |        (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
             |        AS rank FROM s)
             |SELECT query_id, neighbor_id, rank, cos_sim
             |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // --- two-stage search: int8 shortlist (20) → float-exact re-rank (5)
    ("s06_ann_int8_rerank",
      (s, dir) => Similarity.int8RerankTopK(embs(s, dir),
          embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
          k = 5, shortlist = 20)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("query_id", "rank"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings),
             |m AS (SELECT vec_id, v,
             |        list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
             |      FROM e),
             |qz AS (SELECT vec_id,
             |  CAST([least(greatest(floor(v[i]/scale + 0.5), -127), 127)
             |        for i in range(1, len(v)+1)] AS DOUBLE[]) AS qv
             |  FROM m WHERE scale > 0),
             |n AS (SELECT vec_id, qv, sqrt(list_dot_product(qv, qv)) AS nm
             |      FROM qz),
             |s1 AS (SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
             |        list_dot_product(c.qv, qq.qv) / (c.nm * qq.nm) AS qcos
             |      FROM n c JOIN n qq
             |        ON qq.vec_id < 8 AND c.vec_id <> qq.vec_id),
             |sl AS (SELECT query_id, neighbor_id FROM
             |        (SELECT *, row_number() OVER
             |          (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id)
             |          AS rk FROM s1) WHERE rk <= 20),
             |s2 AS (SELECT sl.query_id, sl.neighbor_id,
             |        list_dot_product(qf.v, cf.v) /
             |          (sqrt(list_dot_product(qf.v, qf.v)) *
             |           sqrt(list_dot_product(cf.v, cf.v))) AS cos_sim
             |       FROM sl
             |       JOIN e cf ON cf.vec_id = sl.neighbor_id
             |       JOIN e qf ON qf.vec_id = sl.query_id),
             |r2 AS (SELECT *, row_number() OVER
             |        (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
             |        AS rank FROM s2)
             |SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim
             |FROM r2 WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // --- token / subword / punctuation counts + rolling-hash fingerprint
    ("t01_text_stats",
      (s, dir) => docs(s, dir).select(col("doc_id"),
          TextOps.features(col("text")).as("__f"),
          TextOps.fingerprint(col("text")).as("fp"))
        .select(col("doc_id"),
          element_at(col("__f"), 1).as("n_tokens"),
          element_at(col("__f"), 2).as("n_subwords"),
          element_at(col("__f"), 3).as("n_punct"), col("fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CASE WHEN trim(text) = '' THEN 0
             |       ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
             |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
             |    AS n_subwords,
             |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
             |  CAST(CASE WHEN length(text) = 0 THEN 0 ELSE
             |    list_sum([ascii(text[i]) *
             |              ([1, 31, 961, 29791, 923521, 28629151, 887503681,
             |                27512614111])[(i - 1) % 8 + 1]
             |              for i in range(1, length(text) + 1)]) % 1000000007
             |  END AS BIGINT) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // --- language-ID heuristic + quality score
    ("t02_text_quality",
      (s, dir) => docs(s, dir).select(col("doc_id"),
          TextOps.features(col("text")).as("__f"), col("n_chars"))
        .select(col("doc_id"),
          TextOps.langIdF(col("__f")).as("lang_pred"),
          round(TextOps.qualityScoreF(col("__f"), col("n_chars")), 6)
            .as("quality"))
        .orderBy("doc_id"),
      Some(textQualityOracle)),

    // --- corpus token frequencies (explode + partial-agg; top-20)
    ("t05_vocab",
      (s, dir) => TextOps.tokenFrequencies(docs(s, dir), "text")
        .orderBy(col("n").desc, col("token")).limit(20),
      Some("""SELECT token, count(*) AS n
             |FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
             |      FROM documents WHERE trim(text) <> '')
             |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin)),

    // --- per-doc CORPUS-level duplicate n-gram fraction (cross-doc
    //     repetition signal; within-doc twins are t08)
    ("t17_dup_ngrams",
      (s, dir) => TextOps.dupNgramFraction(docs(s, dir), "text", "doc_id", n = 3)
        .orderBy("doc_id"),
      Some("""WITH sh AS (
             |  SELECT doc_id,
             |         list_distinct([array_to_string(t[i:i+2], ' ')
             |                        for i in range(1, len(t) - 1)]) AS s
             |  FROM (SELECT doc_id,
             |          CASE WHEN trim(text) = '' THEN []::VARCHAR[]
             |               ELSE string_split_regex(trim(text), '\s+') END AS t
             |        FROM documents)),
             |g AS (SELECT doc_id, unnest(s) AS gm FROM sh),
             |df2 AS (SELECT gm, count(*) AS dfq FROM g GROUP BY gm),
             |st AS (SELECT g.doc_id, count(*) AS n_grams,
             |         sum(CASE WHEN dfq >= 2 THEN 1 ELSE 0 END) AS dup
             |       FROM g JOIN df2 USING (gm) GROUP BY g.doc_id)
             |SELECT d.doc_id, coalesce(st.n_grams, 0) AS n_grams,
             |       coalesce(round(st.dup / st.n_grams, 6), 0.0)
             |         AS dup_gram_fraction
             |FROM documents d LEFT JOIN st USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // --- one-row corpus token-distribution report (total/type counts,
    //     TTR, Zipf-head coverage of the top-100 tokens)
    ("t16_token_stats",
      (s, dir) => TextOps.corpusTokenStats(docs(s, dir), "text", topK = 100),
      Some("""WITH f AS (
             |  SELECT token, count(*) AS n
             |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
             |        FROM documents WHERE trim(text) <> '')
             |  GROUP BY token),
             |tot AS (SELECT sum(n) AS n_tokens, count(*) AS n_types FROM f),
             |top AS (SELECT coalesce(sum(n), 0) AS topn
             |        FROM (SELECT n FROM f ORDER BY n DESC, token LIMIT 100))
             |SELECT CAST(n_tokens AS BIGINT) AS n_tokens, n_types,
             |       round(n_types / n_tokens, 6) AS type_token_ratio,
             |       round(topn / n_tokens, 6) AS top100_coverage
             |FROM tot, top""".stripMargin)),

    // --- token-budget packing (running-sum bin assignment per language)
    ("t06_pack",
      (s, dir) => Pipeline.packTokenBins(docs(s, dir), "lang", "doc_id",
          budget = 2048)
        .orderBy("lang", "doc_id"),
      Some("""SELECT lang, doc_id, n_tokens,
             |       CAST(floor((cum - n_tokens) / 2048) AS BIGINT) AS bin_id
             |FROM (
             |  SELECT lang, doc_id,
             |    CASE WHEN trim(text) = '' THEN 0
             |         ELSE len(string_split_regex(trim(text), '\s+')) END
             |      AS n_tokens,
             |    sum(CASE WHEN trim(text) = '' THEN 0
             |             ELSE len(string_split_regex(trim(text), '\s+')) END)
             |      OVER (PARTITION BY lang ORDER BY doc_id) AS cum
             |  FROM documents)
             |ORDER BY lang, doc_id""".stripMargin)),

    // --- repetition quality signals (Gopher-style): duplicate-line
    //     fraction + most-frequent-3-gram fraction; per-row IEEE
    //     divisions, no rounding
    ("t08_repetition",
      (s, dir) => docs(s, dir).select(col("doc_id"),
          TextOps.lineCount(col("text")).as("n_lines"),
          TextOps.dupLineFraction(col("text")).as("dup_line_frac"),
          TextOps.topNgramFraction(col("text"), 3).as("top3gram_frac"))
        .orderBy("doc_id"),
      Some(repetitionOracle)),

    // --- normalization + PII scrub. The corpus has no organic PII, so
    //     both engines synthesize an identical PII-bearing prefix
    //     (emails/phone/IP/SSN derived from doc_id) and the full
    //     scrubbed string is hash-compared — an exact cross-engine
    //     check of every regex in the chain.
    ("t09_normalize_pii",
      (s, dir) => docs(s, dir).select(col("doc_id"),
          TextOps.normalize(col("text")).as("norm"),
          TextOps.scrubPii(TextOps.normalize(concat(
            lit("Contact user"), col("doc_id").cast("string"),
            lit(" at u"), col("doc_id").cast("string"),
            lit("@mail.example.com or +1 555-0"),
            lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
            lit(" 1234, ip 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
            lit(".7, ssn 123-45-6789. "), col("text")))).as("scrubbed"))
        .orderBy("doc_id"),
      Some("""WITH pii AS (
             |  SELECT doc_id,
             |    'Contact user' || CAST(doc_id AS VARCHAR) ||
             |    ' at u' || CAST(doc_id AS VARCHAR) ||
             |    '@mail.example.com or +1 555-0' ||
             |    lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
             |    ' 1234, ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
             |    '.7, ssn 123-45-6789. ' || text AS p, text
             |  FROM documents),
             |n AS (
             |  SELECT doc_id,
             |    trim(regexp_replace(regexp_replace(lower(text),
             |      '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g')) AS norm,
             |    trim(regexp_replace(regexp_replace(lower(p),
             |      '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g')) AS np
             |  FROM pii)
             |SELECT doc_id, norm,
             |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(np,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
             |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
             |    '\+?[0-9][0-9\-\s()]{6,}[0-9]\b', '<PHONE>', 'g') AS scrubbed
             |FROM n ORDER BY doc_id""".stripMargin)),

    // --- unigram log-likelihood quality score (statistical-LM filter:
    //     corpus-rare tokens drag the mean down)
    ("t15_unigram_loglik",
      (s, dir) => TextOps.unigramLogLikelihood(docs(s, dir), "text", "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          round(col("avg_logprob"), 6).as("avg_logprob"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |    CASE WHEN trim(text)='' THEN []::VARCHAR[]
             |         ELSE string_split_regex(trim(text), '\s+') END AS tk
             |  FROM documents),
             |e AS (SELECT doc_id, unnest(tk) AS token FROM t),
             |f AS (SELECT token, count(*) AS c FROM e GROUP BY 1),
             |n AS (SELECT count(*) AS tot FROM e)
             |SELECT doc_id, count(*) AS n_tokens,
             |       round(avg(ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))), 6)
             |         AS avg_logprob
             |FROM e JOIN f USING (token) CROSS JOIN n
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // --- Stupid-Backoff bigram LM score vs the English reference
    //     subset (CCNet-style perplexity filter; backoff Laplace'd so
    //     OOV stays finite). Full per-doc value oracle.
    ("t18_bigram_loglik",
      (s, dir) => TextOps.bigramLogLikelihood(docs(s, dir),
          docs(s, dir).where(col("lang") === "en"), "text", "doc_id")
        .select(col("doc_id"), col("n_bigrams"),
          round(col("avg_logprob"), 6).as("avg_logprob"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, lang,
             |    CASE WHEN trim(text)='' THEN []::VARCHAR[]
             |         ELSE string_split_regex(trim(text), '\s+') END AS tk
             |  FROM documents),
             |ru AS (SELECT unnest(tk) AS w FROM t WHERE lang = 'en'),
             |uni AS (SELECT w, count(*) AS cu FROM ru GROUP BY 1),
             |g AS (SELECT sum(cu) AS n, count(*) AS v FROM uni),
             |rb AS (SELECT unnest([{'u': tk[i], 'v': tk[i+1]}
             |                      for i in range(1, len(tk))]) AS b
             |       FROM t WHERE lang = 'en'),
             |bi AS (SELECT b.u AS u, b.v AS v, count(*) AS cb
             |       FROM rb GROUP BY 1, 2),
             |tr AS (SELECT doc_id, unnest([{'u': tk[i], 'v': tk[i+1]}
             |                              for i in range(1, len(tk))]) AS b
             |       FROM t),
             |te AS (SELECT doc_id, b.u AS u, b.v AS v FROM tr),
             |sc AS (SELECT te.doc_id,
             |         CASE WHEN bi.cb IS NOT NULL
             |              THEN ln(CAST(bi.cb AS DOUBLE) / cuu.cu)
             |              ELSE ln(0.4 * (coalesce(cuv.cu, 0) + 1.0)
             |                      / (g.n + g.v)) END AS lp
             |       FROM te LEFT JOIN bi ON te.u = bi.u AND te.v = bi.v
             |       LEFT JOIN uni cuu ON cuu.w = te.u
             |       LEFT JOIN uni cuv ON cuv.w = te.v
             |       CROSS JOIN g)
             |SELECT doc_id, count(*) AS n_bigrams,
             |       round(avg(lp), 6) AS avg_logprob
             |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // --- corpus-wide duplicate-line scrub (C4-style): first occurrence
    //     by (doc_id, position) wins; lines under 10 chars always kept
    ("t14_line_dedup",
      (s, dir) => TextOps.dedupLinesAcrossCorpus(docs(s, dir), "text",
          "doc_id", minLineLen = 10)
        .orderBy("doc_id"),
      Some("""WITH l AS (
             |  SELECT doc_id, u.pos AS pos, u.line AS line FROM (
             |    SELECT doc_id,
             |      unnest([{'pos': i, 'line': ls[i]}
             |              for i in range(1, len(ls) + 1)]) AS u
             |    FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
             |          FROM documents))),
             |r AS (SELECT *, row_number() OVER
             |        (PARTITION BY line ORDER BY doc_id, pos) AS rk FROM l),
             |a AS (SELECT doc_id,
             |        string_agg(line, chr(10) ORDER BY pos) AS text_clean
             |      FROM r WHERE length(line) < 10 OR rk = 1
             |      GROUP BY doc_id)
             |SELECT d.doc_id, coalesce(a.text_clean, '') AS text_clean
             |FROM documents d LEFT JOIN a USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // --- gap-based sessionization (batch gaps-and-islands)
    ("t03_sessionize",
      (s, dir) => Sessionize.batch(evts(s, dir), gapMinutes = 30)
        .select(col("user_id"), col("session_id"), col("session_start"),
          col("session_end"), col("n_events"),
          round(col("sum_value"), 6).as("sum_value"))
        .orderBy("user_id", "session_id"),
      // exact mirror of Sessionize.batch: microsecond timestamps (Spark
      // truncates parquet nanos to micros) and a MILLISECOND gap test
      // (epoch_ms, not date_diff'seconds' — whole-second truncation
      // splits/merges differently on sub-second gaps); session_id and
      // sums cast to BIGINT because DuckDB widens integer sums to
      // HUGEINT, which the driver's hash sees as a different type.
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
             |e AS (
             |  SELECT *, lag(ts) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM e0),
             |f AS (SELECT *, CASE WHEN prev IS NULL
             |        OR epoch_ms(ts) - epoch_ms(prev) > 1800000
             |        THEN 1 ELSE 0 END AS ns FROM e),
             |g AS (SELECT *, CAST(sum(ns) OVER
             |        (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
             |        AS session_id
             |      FROM f)
             |SELECT user_id, session_id, min(ts) AS session_start,
             |       max(ts) AS session_end, count(*) AS n_events,
             |       round(sum(value), 6) AS sum_value
             |FROM g GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // --- tumbling-window rollup (batch twin of the streaming agg)
    ("t04_hourly_rollup",
      (s, dir) => Sessionize.hourlyRollup(evts(s, dir))
        .select(col("hour"), col("event_type"), col("n_events"),
          round(col("sum_value"), 6).as("sum_value"))
        .orderBy("hour", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
             |       count(*) AS n_events, round(sum(value), 6) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)),

    // --- as-of join: each click annotated with the user's most recent
    //     purchase at-or-before it (merge-scan shape: one shuffle on
    //     user_id + a running last() — no theta-join). Oracle: DuckDB's
    //     native ASOF LEFT JOIN, an independent implementation of the
    //     same semantics.
    ("e01_asof_join",
      (s, dir) => {
        val e = evts(s, dir)
        val clicks = e.where(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val purchases = e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"), col("value"))
          .groupBy("user_id", "pts").agg(max("value").as("pval"))
        AsOf.asofJoin(clicks, purchases, Seq("user_id"), "ts", "pts")
          .select(col("event_id"), col("user_id"), col("value"),
            col("pts"), col("pval"))
          .orderBy("event_id")
      },
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
             |c AS (SELECT event_id, user_id, ts, value
             |      FROM e0 WHERE event_type = 'click'),
             |p AS (SELECT user_id, ts AS pts, max(value) AS pval
             |      FROM e0 WHERE event_type = 'purchase'
             |      GROUP BY user_id, ts)
             |SELECT c.event_id, c.user_id, c.value, p.pts, p.pval
             |FROM c ASOF LEFT JOIN p
             |  ON c.user_id = p.user_id AND c.ts >= p.pts
             |ORDER BY c.event_id""".stripMargin)),

    // --- the same as-of join with a 2-hour lookback tolerance (kdb
    //     windowed aj / pandas merge_asof tolerance): a match older
    //     than the bound nulls out. Oracle: DuckDB ASOF then a CASE
    //     nullification — semantically identical because the
    //     latest-preceding row is unique.
    ("e08_asof_tolerance",
      (s, dir) => {
        val e = evts(s, dir)
        val clicks = e.where(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val purchases = e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"), col("value"))
          .groupBy("user_id", "pts").agg(max("value").as("pval"))
        AsOf.asofJoin(clicks, purchases, Seq("user_id"), "ts", "pts",
            toleranceSec = Some(7200L))
          .select(col("event_id"), col("user_id"), col("value"),
            col("pts"), col("pval"))
          .orderBy("event_id")
      },
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
             |c AS (SELECT event_id, user_id, ts, value
             |      FROM e0 WHERE event_type = 'click'),
             |p AS (SELECT user_id, ts AS pts, max(value) AS pval
             |      FROM e0 WHERE event_type = 'purchase'
             |      GROUP BY user_id, ts),
             |a AS (SELECT c.event_id, c.user_id, c.value, c.ts, p.pts, p.pval
             |      FROM c ASOF LEFT JOIN p
             |        ON c.user_id = p.user_id AND c.ts >= p.pts)
             |SELECT event_id, user_id, value,
             |       CASE WHEN ts - pts <= INTERVAL '7200' SECOND
             |            THEN pts END AS pts,
             |       CASE WHEN ts - pts <= INTERVAL '7200' SECOND
             |            THEN pval END AS pval
             |FROM a ORDER BY event_id""".stripMargin)),

    // --- bucketed range join: per error event, activity of the same
    //     user in the following 30 minutes (interval×point → equi-join
    //     on 30-min cells + exact filter; a bare BETWEEN predicate
    //     would nested-loop). Oracle: the naive range-predicate join.
    ("e02_range_join",
      (s, dir) => {
        val e = evts(s, dir)
        val errs = e.where(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts").as("st"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("en"))
        val acts = e.select(col("user_id"), col("ts").as("ats"),
          col("value").as("av"))
        AsOf.rangeJoin(errs, acts, Seq("user_id"), "st", "en", "ats",
            bucketWidthSec = 1800L)
          .groupBy("event_id")
          .agg(count(lit(1)).as("n_follow"),
            round(sum("av"), 6).as("sum_value"))
          .orderBy("event_id")
      },
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
             |er AS (SELECT event_id, user_id, ts
             |       FROM e0 WHERE event_type = 'error')
             |SELECT er.event_id, count(*) AS n_follow,
             |       round(sum(v.value), 6) AS sum_value
             |FROM er JOIN e0 v ON v.user_id = er.user_id
             |  AND v.ts >= er.ts AND v.ts < er.ts + INTERVAL 30 MINUTE
             |GROUP BY er.event_id ORDER BY er.event_id""".stripMargin)),

    // --- ordered funnel: first view → first click AFTER it → first
    //     purchase AFTER that, per user (conditional mins via k−1
    //     stage joins — O(1) aggregation state per user)
    ("e04_funnel",
      (s, dir) => Sessionize.funnel(evts(s, dir),
          Seq("view", "click", "purchase"))
        .orderBy("user_id"),
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
             |v AS (SELECT user_id, min(ts) AS view_ts
             |      FROM e0 WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT v.user_id, v.view_ts,
             |        min(CASE WHEN e.ts > v.view_ts THEN e.ts END) AS click_ts
             |      FROM v LEFT JOIN e0 e
             |        ON e.user_id = v.user_id AND e.event_type = 'click'
             |      GROUP BY 1, 2),
             |p AS (SELECT c.user_id, c.view_ts, c.click_ts,
             |        min(CASE WHEN e.ts > c.click_ts THEN e.ts END)
             |          AS purchase_ts
             |      FROM c LEFT JOIN e0 e
             |        ON e.user_id = c.user_id AND e.event_type = 'purchase'
             |      GROUP BY 1, 2, 3)
             |SELECT user_id, view_ts, click_ts, purchase_ts
             |FROM p ORDER BY user_id""".stripMargin)),

    // --- the same funnel with a per-step time bound: each stage must
    //     land within 360 minutes of the previous stage's resolved time
    //     (the standard product-funnel variant; conditional-min shape
    //     and O(1) per-user state unchanged)
    ("e06_funnel_bounded",
      (s, dir) => Sessionize.funnel(evts(s, dir),
          Seq("view", "click", "purchase"), maxStepGapMinutes = Some(360L))
        .orderBy("user_id"),
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
             |v AS (SELECT user_id, min(ts) AS view_ts
             |      FROM e0 WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT v.user_id, v.view_ts,
             |        min(CASE WHEN e.ts > v.view_ts
             |              AND e.ts <= v.view_ts + INTERVAL '360' MINUTE
             |            THEN e.ts END) AS click_ts
             |      FROM v LEFT JOIN e0 e
             |        ON e.user_id = v.user_id AND e.event_type = 'click'
             |      GROUP BY 1, 2),
             |p AS (SELECT c.user_id, c.view_ts, c.click_ts,
             |        min(CASE WHEN e.ts > c.click_ts
             |              AND e.ts <= c.click_ts + INTERVAL '360' MINUTE
             |            THEN e.ts END) AS purchase_ts
             |      FROM c LEFT JOIN e0 e
             |        ON e.user_id = c.user_id AND e.event_type = 'purchase'
             |      GROUP BY 1, 2, 3)
             |SELECT user_id, view_ts, click_ts, purchase_ts
             |FROM p ORDER BY user_id""".stripMargin)),

    // --- ROLLUP grouping-sets report: (event_type, day) + per-type
    //     subtotals + grand total in ONE Expand+aggregate pass (null
    //     group keys mark subtotal rows)
    ("e07_rollup",
      (s, dir) => Sessionize.rollupDaily(evts(s, dir))
        .select(col("event_type"), col("day"), col("n_events"),
          round(col("sum_value"), 6).as("sum_value"))
        .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first),
      Some("""WITH e0 AS (
             |  SELECT event_type,
             |         strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             |         value
             |  FROM events)
             |SELECT event_type, day, count(*) AS n_events,
             |       round(sum(value), 6) AS sum_value
             |FROM e0 GROUP BY ROLLUP(event_type, day)
             |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin)),

    // --- cohort retention triangle: first-activity-day cohorts ×
    //     distinct return-day offsets
    ("e05_retention",
      // cohort_day as an ISO string: Spark DATE→pandas object vs DuckDB
      // DATE→datetime64 would dtype-mismatch at the driver's comparator
      (s, dir) => Sessionize.retentionCohorts(evts(s, dir))
        .withColumn("cohort_day", col("cohort_day").cast("string"))
        .orderBy("cohort_day", "day_offset"),
      Some("""WITH e0 AS (
             |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
             |d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM e0),
             |f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
             |SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
             |       CAST(d.day - f.cohort_day AS BIGINT) AS day_offset,
             |       count(*) AS n_users
             |FROM d JOIN f USING (user_id)
             |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin)),

    // --- incremental ingestion dedup: new docs (id ≥ 250) against the
    //     existing corpus (id < 250) — batch self-dedup + key-only
    //     anti-join, corpus bodies never shuffle
    ("d07_dedup_incremental",
      (s, dir) => Dedup.dedupAgainst(
          docs(s, dir).where(col("doc_id") >= 250),
          docs(s, dir).where(col("doc_id") < 250),
          "text", "doc_id")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id"),
      Some("""WITH inc AS (SELECT * FROM documents WHERE doc_id >= 250),
             |ex AS (SELECT DISTINCT text FROM documents WHERE doc_id < 250),
             |k AS (SELECT min(doc_id) AS doc_id FROM inc GROUP BY text),
             |f AS (SELECT inc.* FROM inc JOIN k USING (doc_id))
             |SELECT doc_id, lang, source FROM f
             |WHERE text NOT IN (SELECT text FROM ex)
             |ORDER BY doc_id""".stripMargin)),

    // --- cross-corpus NEAR-dup: incoming batch (doc_id % 4 = 0) vs the
    //     existing corpus (rest), batch×corpus pairs only — the near-dup
    //     twin of d07. Same banding math as d03, so at threshold 0.8 the
    //     exact cross-side all-pairs oracle matches (miss prob < 1e-7)
    ("d09_neardup_incremental",
      (s, dir) => Dedup.minhashLshPairsAgainst(
          docs(s, dir).where(col("doc_id") % 4 === 0),
          docs(s, dir).where(col("doc_id") % 4 =!= 0),
          "text", "doc_id", n = 3, k = 128, bands = 32, threshold = 0.8)
        .orderBy("batch_id", "corpus_id"),
      Some(neardupAgainstOracle)),

    // --- persisted LSH near-dup index (round 16; the s34/s40 shape
    //     for dedup): the corpus's band rows + shingle sets persist
    //     band-partitioned, the batch probes against the PRECOMPUTED
    //     buckets and verifies against the STORED shingle sets — the
    //     corpus text is never re-read. Same hash family as d09 ⇒ the
    //     probe is value-identical, so d09's exact cross-side oracle
    //     binds the persisted path end to end.
    ("d33_lsh_persisted",
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("d33_lsh").toString
        Dedup.writeLshIndex(docs(s, dir).where(col("doc_id") % 4 =!= 0),
          "text", "doc_id", path, n = 3, k = 128, bands = 32)
        Dedup.lshProbeIndex(s, path,
            docs(s, dir).where(col("doc_id") % 4 === 0),
            "text", "doc_id", threshold = 0.8)
          .orderBy("batch_id", "corpus_id")
      },
      Some(neardupAgainstOracle)),

    // --- incremental LSH-index append (round 16): half the corpus
    //     builds the index, the other half APPENDS under the frozen
    //     (n, k, bands) — probes see old + new rows in one layout, so
    //     the same oracle binds the appended index too.
    // --- persisted SimHash index (round 17; the d33/s40 persisted-
    //     index shape for HAMMING near-dups): odd docs build the
    //     chunk-partitioned fingerprint index ONCE, even docs probe
    //     it — fingerprints ride the stored keys so the corpus text
    //     is never re-read; oracle-mode token hashes let DuckDB
    //     recompute identical fingerprints (the d04 arithmetic),
    //     maxBucket raised so the cap never drops a pair here.
    ("d37_simhash_persisted",
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("d37_sim").toString
        Dedup.writeSimhashIndex(
          docs(s, dir).where(col("doc_id") % 2 === 1),
          "text", "doc_id", path, maxDist = 3,
          tokenHashes = mirrorTokenHash)
        Dedup.simhashProbeIndex(s, path,
            docs(s, dir).where(col("doc_id") % 2 === 0),
            "text", "doc_id", tokenHashes = mirrorTokenHash,
            maxBucket = 1 << 20)
          .orderBy("batch_id", "index_id")
      },
      Some(simhashCrossOracle)),

    // --- incremental SimHash-index append (round 17): a quarter of
    //     the corpus builds, another quarter APPENDS under the frozen
    //     maxDist — probes see old + new rows in one layout, so the
    //     same cross-side oracle binds the appended index.
    ("d38_simhash_append",
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("d38_sim").toString
        Dedup.writeSimhashIndex(
          docs(s, dir).where(col("doc_id") % 4 === 1),
          "text", "doc_id", path, maxDist = 3,
          tokenHashes = mirrorTokenHash)
        Dedup.appendSimhashIndex(
          docs(s, dir).where(col("doc_id") % 4 === 3),
          "text", "doc_id", path, tokenHashes = mirrorTokenHash)
        Dedup.simhashProbeIndex(s, path,
            docs(s, dir).where(col("doc_id") % 2 === 0),
            "text", "doc_id", tokenHashes = mirrorTokenHash,
            maxBucket = 1 << 20)
          .orderBy("batch_id", "index_id")
      },
      Some(simhashCrossOracle)),

    ("d34_lsh_append",
      (s, dir) => {
        val corpus = docs(s, dir).where(col("doc_id") % 4 =!= 0)
        val path = java.nio.file.Files
          .createTempDirectory("d34_lsh").toString
        Dedup.writeLshIndex(corpus.where(col("doc_id") % 2 === 0),
          "text", "doc_id", path, n = 3, k = 128, bands = 32)
        Dedup.appendLshIndex(corpus.where(col("doc_id") % 2 =!= 0),
          "text", "doc_id", path)
        Dedup.lshProbeIndex(s, path,
            docs(s, dir).where(col("doc_id") % 4 === 0),
            "text", "doc_id", threshold = 0.8)
          .orderBy("batch_id", "corpus_id")
      },
      Some(neardupAgainstOracle)),

    // --- EXACT all-pairs near-dup via prefix filtering (PPJoin
    //     principle): provably complete, so the naive all-pairs oracle
    //     is an equality check, not a probabilistic one (contrast d03)
    ("d10_prefix_jaccard",
      (s, dir) => Dedup.prefixJaccardPairs(docs(s, dir), "text", "doc_id",
          n = 3, threshold = 0.7)
        .orderBy("id_a", "id_b"),
      Some("""WITH sh AS (
             |  SELECT doc_id,
             |         list_distinct([array_to_string(t[i:i+2], ' ')
             |                        for i in range(1, len(t) - 1)]) AS s
             |  FROM (SELECT doc_id,
             |          CASE WHEN trim(text) = '' THEN []::VARCHAR[]
             |               ELSE string_split_regex(trim(text), '\s+') END AS t
             |        FROM documents))
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |       len(list_intersect(a.s, b.s))::DOUBLE /
             |         len(list_distinct(list_concat(a.s, b.s)))::DOUBLE AS jaccard
             |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |WHERE len(list_distinct(list_concat(a.s, b.s))) > 0
             |  AND len(list_intersect(a.s, b.s))::DOUBLE /
             |        len(list_distinct(list_concat(a.s, b.s)))::DOUBLE >= 0.7
             |ORDER BY id_a, id_b""".stripMargin)),

    // --- SemDeDup-style SEMANTIC dedup: nearest-centroid clusters
    //     (deterministic hash-ordered seed → SQL-mirrorable), cosine
    //     near-dup pairs within clusters only, connected components,
    //     keep min id. Decision table fully value-checked: cluster,
    //     component root and kept flag per document.
    ("d11_semantic_dedup",
      (s, dir) => {
        val e = embs(s, dir)
        val cent = Similarity.seedCentroids(e, "embedding", "vec_id", 16)
        Similarity.semanticDedup(e, "embedding", "vec_id", cent,
            threshold = 0.3)
          .select(col("vec_id"),
            col("cluster").cast(org.apache.spark.sql.types.LongType)
              .as("cluster"),
            col("component"), col("kept"))
          .orderBy("vec_id")
      },
      Some(semanticDedupOracle)),

    // --- composed curation pipeline: quality gate → exact dedup →
    //     language ID → per-language token budget
    ("p01_curation",
      (s, dir) => Pipeline.curationReport(docs(s, dir), minQuality = 0.55)
        .orderBy("lang_pred"),
      Some(pipelineOracle)),

    // --- deterministic stratified sampling (exact-n per language; hash
    //     order is engine-portable → full value oracle)
    ("t07_stratified_sample",
      (s, dir) => Pipeline.stratifiedSample(docs(s, dir), "lang", "doc_id",
          perStratum = 25)
        .select(col("doc_id"), col("lang"))
        .orderBy("lang", "doc_id"),
      Some("""SELECT doc_id, lang FROM (
             |  SELECT doc_id, lang, row_number() OVER
             |    (PARTITION BY lang
             |     ORDER BY (doc_id*2654435761)%1000000007, doc_id) AS rk
             |  FROM documents) WHERE rk <= 25
             |ORDER BY lang, doc_id""".stripMargin)),

    // --- benchmark decontamination: corpus docs sharing >= 10% of their
    //     distinct 3-grams with the benchmark slice (doc_id < 20).
    //     Contamination ratio is per-row IEEE division — bit-identical
    //     across engines, no rounding needed.
    ("p02_decontaminate",
      (s, dir) => Pipeline.contaminationReport(
          docs(s, dir).where(col("doc_id") >= 20),
          docs(s, dir).where(col("doc_id") < 20),
          "text", "doc_id", n = 3, threshold = 0.1)
        .select(col("doc_id"),
          col("n_grams").cast(org.apache.spark.sql.types.LongType).as("n_grams"),
          col("n_hit"), col("contamination"))
        .orderBy("doc_id"),
      Some(decontOracle)),

    // --- Bloom-prefilter decontamination (round 9): p02's twin for
    //     benchmark gram sets too big to broadcast exactly — a
    //     fixed-size Bloom bitset prunes corpus grams MAP-SIDE before
    //     the exact verify join, so the output is IDENTICAL to p02
    //     (same oracle; false positives die in the verify join). Tiny
    //     numBits here deliberately forces a high fp rate to prove the
    //     verify join's exactness.
    ("p27_bloom_decontaminate",
      (s, dir) => Pipeline.contaminationReportBloom(
          docs(s, dir).where(col("doc_id") >= 20),
          docs(s, dir).where(col("doc_id") < 20),
          "text", "doc_id", n = 3, threshold = 0.1,
          expectedGrams = 4096, numBits = 1L << 14)
        .select(col("doc_id"),
          col("n_grams").cast(org.apache.spark.sql.types.LongType).as("n_grams"),
          col("n_hit"), col("contamination"))
        .orderBy("doc_id"),
      Some(decontOracle)),

    // --- decontamination FILTER (acting twin of p02): corpus minus the
    //     contaminated ids, one left-anti join — bodies stream through
    ("p03_decontaminated",
      (s, dir) => Pipeline.decontaminate(
          docs(s, dir).where(col("doc_id") >= 20),
          docs(s, dir).where(col("doc_id") < 20),
          "text", "doc_id", n = 3, threshold = 0.1)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id"),
      Some(decontFilterOracle)),

    // --- sliding-window token chunking (64-token chunks, 16 overlap →
    //     stride 48); map-only, short tail chunks kept
    ("t10_chunk",
      (s, dir) => Pipeline.chunkByTokens(docs(s, dir), "text", "doc_id",
          chunkSize = 64, overlap = 16)
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (SELECT doc_id,
             |    CASE WHEN trim(text)='' THEN []::VARCHAR[]
             |         ELSE string_split_regex(trim(text), '\s+') END AS tk
             |  FROM documents),
             |c AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1, 48)) AS s
             |      FROM t)
             |SELECT doc_id, CAST((s - 1) // 48 AS BIGINT) AS chunk_idx,
             |  CAST(len(tk[s:least(s + 63, len(tk))]) AS BIGINT) AS n_tokens,
             |  array_to_string(tk[s:least(s + 63, len(tk))], ' ') AS chunk
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // --- per-source quality quota: top-30 docs per source by the fused
    //     quality score (rank keys are the raw doubles — identical
    //     cross-engine per t02 — with doc_id tie-break)
    ("t11_source_quota",
      (s, dir) => Pipeline.topKPerGroup(
          docs(s, dir)
            .withColumn("__f", TextOps.features(col("text")))
            .withColumn("quality",
              TextOps.qualityScoreF(col("__f"), col("n_chars"))),
          Seq("source"), Seq(col("quality").desc, col("doc_id").asc), k = 30)
        .select(col("source"), col("doc_id"),
          round(col("quality"), 6).as("quality"), col("rank"))
        .orderBy("source", "rank"),
      Some(sourceQuotaOracle)),

    // --- per-language top-quartile quality gate (relative quota: group
    //     sizes differ, so a fixed k would over/under-select)
    ("t13_fraction_gate",
      (s, dir) => Pipeline.topFractionPerGroup(
          docs(s, dir)
            .withColumn("__f", TextOps.features(col("text")))
            .withColumn("quality",
              TextOps.qualityScoreF(col("__f"), col("n_chars"))),
          Seq("lang"), Seq(col("quality").desc, col("doc_id").asc),
          fraction = 0.25)
        .select(col("lang"), col("doc_id"),
          round(col("quality"), 6).as("quality"), col("rank"))
        .orderBy("lang", "rank"),
      Some(fractionGateOracle)),

    // --- JSON attribute-bag parsing (events.props): explicit-schema
    //     from_json, flatten, aggregate — no inference pass
    ("e03_json_props",
      (s, dir) => SemiStructured.parseJson(evts(s, dir), "props", "k BIGINT")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          round(avg(col("k")), 6).as("avg_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
             |  round(avg(CAST(props->>'k' AS BIGINT)), 6) AS avg_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // --- TF-IDF top-5 terms per document (rank key = score rounded to
    //     6 decimals so real ties compare equal on both engines, then
    //     df/token tie-break)
    ("t12_tfidf",
      (s, dir) => TextOps.tfidfTopTerms(docs(s, dir), "text", "doc_id", k = 5)
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          col("rank"), round(col("tfidf"), 6).as("tfidf"))
        .orderBy("doc_id", "rank"),
      Some("""WITH t AS (SELECT doc_id,
             |    CASE WHEN trim(text)='' THEN []::VARCHAR[]
             |         ELSE string_split_regex(trim(text), '\s+') END AS tk
             |  FROM documents),
             |d AS (SELECT doc_id, tk FROM t WHERE len(tk) > 0),
             |e AS (SELECT doc_id, unnest(tk) AS token FROM d),
             |tf AS (SELECT doc_id, token, count(*) AS tf FROM e GROUP BY 1, 2),
             |dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
             |nd AS (SELECT count(*) AS n FROM d),
             |s AS (SELECT doc_id, token, tf, df,
             |        tf * ln((n + 1.0) / (df + 1.0)) AS tfidf
             |      FROM tf JOIN dfq USING (token) CROSS JOIN nd),
             |r AS (SELECT *, row_number() OVER
             |        (PARTITION BY doc_id
             |         ORDER BY round(tfidf, 6) DESC, df ASC, token ASC)
             |        AS rank FROM s)
             |SELECT doc_id, token, tf, df, rank, round(tfidf, 6) AS tfidf
             |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin)),

    // --- per-event trailing 1-hour window stats per user (point-in-time
    //     features: RANGE frame on epoch millis, peers share a frame)
    ("e09_rolling_window",
      (s, dir) => Sessionize.rollingUserStats(evts(s, dir), windowMinutes = 60)
        .select(col("event_id"), col("user_id"), col("n_window"),
          round(col("sum_window"), 6).as("sum_window"))
        .orderBy("event_id"),
      Some("""WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
             |          FROM events)
             |SELECT event_id, user_id,
             |  CAST(count(*) OVER win AS BIGINT) AS n_window,
             |  round(sum(value) OVER win, 6) AS sum_window
             |FROM e
             |WINDOW win AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
             |  RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // --- corpus boilerplate-line scrub by document frequency: lines in
    //     >= 3 distinct docs drop EVERYWHERE (t14 keeps first; this is
    //     the nav-bar/footer killer, no window in the plan at all)
    ("t19_boilerplate",
      (s, dir) => TextOps.scrubBoilerplateLines(docs(s, dir), "text",
          "doc_id", minDocFreq = 3, minLineLen = 10)
        .orderBy("doc_id"),
      Some("""WITH l AS (
             |  SELECT doc_id, u.pos AS pos, u.line AS line FROM (
             |    SELECT doc_id,
             |      unnest([{'pos': i, 'line': ls[i]}
             |              for i in range(1, len(ls) + 1)]) AS u
             |    FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
             |          FROM documents))),
             |hot AS (SELECT line FROM (
             |    SELECT line, count(DISTINCT doc_id) AS dfq FROM l
             |    WHERE length(line) >= 10 GROUP BY line)
             |  WHERE dfq >= 3),
             |a AS (SELECT doc_id,
             |        string_agg(line, chr(10) ORDER BY pos) AS text_clean
             |      FROM l WHERE length(line) < 10
             |         OR line NOT IN (SELECT line FROM hot)
             |      GROUP BY doc_id)
             |SELECT d.doc_id, coalesce(a.text_clean, '') AS text_clean
             |FROM documents d LEFT JOIN a USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // --- Okapi BM25 top-10 docs per query (Lucene smoothed idf; rank
    //     key = score rounded to 6, doc_id tie-break — the t12 rule)
    ("s11_bm25",
      (s, dir) => {
        import s.implicits._
        val qs = Seq((0L, "hash join order"), (1L, "fast scan filter"),
          (2L, "stream window agg")).toDF("query_id", "qtext")
        Retrieval.bm25TopK(docs(s, dir), qs, "text", "doc_id",
            "query_id", "qtext", k = 10)
          .select(col("query_id"), col("doc_id"), col("rank"),
            round(col("score"), 6).as("score"))
          .orderBy("query_id", "rank")
      },
      Some(bm25Oracle)),

    // --- persisted BM25 postings index (round 16; VERDICT-r15 #6):
    //     (token, doc, tf, dl) postings PARTITIONED BY token hash
    //     bucket + a 1-row stats table; the probe pushes the query
    //     terms' buckets as a static partition isin (PartitionFilters
    //     prune unprobed bucket directories — plan-asserted in
    //     OpsSpec). Same tokenizer and scoring as s11 ⇒ the probe is
    //     VALUE-IDENTICAL to the in-memory path, so s11's oracle
    //     binds the persisted path end to end.
    ("s40_bm25_persisted",
      (s, dir) => {
        import s.implicits._
        val qs = Seq((0L, "hash join order"), (1L, "fast scan filter"),
          (2L, "stream window agg")).toDF("query_id", "qtext")
        val path = java.nio.file.Files
          .createTempDirectory("s40_bm25").toString
        Retrieval.writeBm25Index(docs(s, dir), "text", "doc_id", path,
          nBuckets = 32)
        Retrieval.bm25ProbeIndex(s, path, qs, "query_id", "qtext",
            k = 10)
          .select(col("query_id"), col("doc_id"), col("rank"),
            round(col("score"), 6).as("score"))
          .orderBy("query_id", "rank")
      },
      Some(bm25Oracle)),

    // --- incremental BM25 append (round 16): build from the even-id
    //     half, APPEND the odd-id half under the frozen tokenizer and
    //     bucket layout (untouched buckets' files untouched — asserted
    //     in OpsSpec); only the corpus scalars recompute as deltas, df
    //     derives from the postings at probe time. Old + new rows in
    //     one layout ⇒ s11's oracle binds the appended index too.
    ("s41_bm25_append",
      (s, dir) => {
        import s.implicits._
        val qs = Seq((0L, "hash join order"), (1L, "fast scan filter"),
          (2L, "stream window agg")).toDF("query_id", "qtext")
        val d = docs(s, dir)
        val path = java.nio.file.Files
          .createTempDirectory("s41_bm25").toString
        Retrieval.writeBm25Index(d.where(col("doc_id") % 2 === 0),
          "text", "doc_id", path, nBuckets = 32)
        Retrieval.appendBm25Index(d.where(col("doc_id") % 2 === 1),
          "text", "doc_id", path)
        Retrieval.bm25ProbeIndex(s, path, qs, "query_id", "qtext",
            k = 10)
          .select(col("query_id"), col("doc_id"), col("rank"),
            round(col("score"), 6).as("score"))
          .orderBy("query_id", "rank")
      },
      Some(bm25Oracle)),

    // --- oracle-mode Lloyd k-means (2 assign rounds, 1 centroid
    //     update; rounded argmin + rounded iterates pin every
    //     assignment cross-engine) — the verifiable twin of the native
    //     refineCentroids path
    ("s22_kmeans",
      (s, dir) => Similarity.kmeansAssign(embs(s, dir), "embedding",
          "vec_id", k = 8, iterations = 2)
        .orderBy("vec_id"),
      Some("""WITH x AS (SELECT vec_id,
             |    generate_subscripts(embedding, 1) AS i,
             |    CAST(unnest(embedding) AS DOUBLE) AS v
             |  FROM embeddings),
             |sd AS (SELECT vec_id,
             |         row_number() OVER (ORDER BY
             |           (vec_id * 2654435761) % 1000000007, vec_id) - 1 AS c
             |       FROM embeddings
             |       QUALIFY c < 8),
             |c0 AS (SELECT sd.c, x.i, x.v AS cv
             |       FROM sd JOIN x ON x.vec_id = sd.vec_id),
             |d1 AS (SELECT x.vec_id, c0.c, sum((x.v - c0.cv) ^ 2) AS d
             |       FROM x JOIN c0 ON x.i = c0.i GROUP BY 1, 2),
             |a1 AS (SELECT vec_id, c FROM (
             |         SELECT *, row_number() OVER (PARTITION BY vec_id
             |           ORDER BY round(d, 9), c) AS rk FROM d1)
             |       WHERE rk = 1),
             |c1 AS (SELECT a1.c, x.i, round(avg(x.v), 6) AS cv
             |       FROM a1 JOIN x USING (vec_id) GROUP BY 1, 2),
             |d2 AS (SELECT x.vec_id, c1.c, sum((x.v - c1.cv) ^ 2) AS d
             |       FROM x JOIN c1 ON x.i = c1.i GROUP BY 1, 2)
             |SELECT vec_id, c AS cluster, round(d, 6) AS dist FROM (
             |  SELECT *, row_number() OVER (PARTITION BY vec_id
             |    ORDER BY round(d, 9), c) AS rk FROM d2)
             |WHERE rk = 1 ORDER BY vec_id""".stripMargin)),

    // --- cluster-quality report over the k-means assignment
    //     (per-cluster size and distance profile — the eval gate after
    //     any clustering, composed on s22's pinned assignment)
    ("s23_cluster_quality",
      (s, dir) => Similarity.kmeansAssign(embs(s, dir), "embedding",
          "vec_id", k = 8, iterations = 2)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"),
          round(avg(col("dist")), 6).as("avg_dist"),
          max(col("dist")).as("max_dist"))
        .orderBy("cluster"),
      Some("""WITH x AS (SELECT vec_id,
             |    generate_subscripts(embedding, 1) AS i,
             |    CAST(unnest(embedding) AS DOUBLE) AS v
             |  FROM embeddings),
             |sd AS (SELECT vec_id,
             |         row_number() OVER (ORDER BY
             |           (vec_id * 2654435761) % 1000000007, vec_id) - 1 AS c
             |       FROM embeddings
             |       QUALIFY c < 8),
             |c0 AS (SELECT sd.c, x.i, x.v AS cv
             |       FROM sd JOIN x ON x.vec_id = sd.vec_id),
             |d1 AS (SELECT x.vec_id, c0.c, sum((x.v - c0.cv) ^ 2) AS d
             |       FROM x JOIN c0 ON x.i = c0.i GROUP BY 1, 2),
             |a1 AS (SELECT vec_id, c FROM (
             |         SELECT *, row_number() OVER (PARTITION BY vec_id
             |           ORDER BY round(d, 9), c) AS rk FROM d1)
             |       WHERE rk = 1),
             |c1 AS (SELECT a1.c, x.i, round(avg(x.v), 6) AS cv
             |       FROM a1 JOIN x USING (vec_id) GROUP BY 1, 2),
             |d2 AS (SELECT x.vec_id, c1.c, sum((x.v - c1.cv) ^ 2) AS d
             |       FROM x JOIN c1 ON x.i = c1.i GROUP BY 1, 2),
             |a2 AS (SELECT vec_id, c, round(d, 6) AS dist FROM (
             |         SELECT *, row_number() OVER (PARTITION BY vec_id
             |           ORDER BY round(d, 9), c) AS rk FROM d2)
             |       WHERE rk = 1)
             |SELECT c AS cluster, count(*) AS n,
             |       round(avg(dist), 6) AS avg_dist, max(dist) AS max_dist
             |FROM a2 GROUP BY 1 ORDER BY cluster""".stripMargin)),

    // --- Dirichlet query-likelihood retrieval (LM scoring; matched-
    //     postings decomposition — same join shape as BM25)
    ("s21_query_likelihood",
      (s, dir) => {
        import s.implicits._
        val qs = Seq((0L, "hash join order"), (1L, "fast scan filter"),
          (2L, "stream window agg")).toDF("query_id", "qtext")
        Retrieval.queryLikelihoodTopK(docs(s, dir), qs, "text", "doc_id",
            "query_id", "qtext", k = 10, mu = 1000.0)
          .select(col("query_id"), col("doc_id"), col("rank"),
            round(col("score"), 6).as("score"))
          .orderBy("query_id", "rank")
      },
      Some("""WITH q(query_id, qtext) AS (VALUES (0, 'hash join order'),
             |    (1, 'fast scan filter'), (2, 'stream window agg')),
             |qt AS (SELECT query_id,
             |         unnest(list_distinct(string_split_regex(trim(qtext),
             |           '\s+'))) AS token FROM q),
             |t AS (SELECT doc_id,
             |    CASE WHEN trim(text)='' THEN []::VARCHAR[]
             |         ELSE string_split_regex(trim(text), '\s+') END AS tk
             |  FROM documents),
             |e AS (SELECT doc_id, unnest(tk) AS token FROM t),
             |tf AS (SELECT doc_id, token, count(*) AS tf FROM e GROUP BY 1, 2),
             |cf AS (SELECT token, CAST(sum(tf) AS BIGINT) AS cf
             |       FROM tf GROUP BY 1),
             |dl AS (SELECT doc_id, count(*) AS dl FROM e GROUP BY 1),
             |g AS (SELECT CAST(sum(len(tk)) AS BIGINT) AS total_tokens FROM t),
             |nq AS (SELECT query_id, count(*) AS nq
             |       FROM qt JOIN cf USING (token) GROUP BY 1),
             |m AS (SELECT qt.query_id, tf.doc_id,
             |        sum(ln(1.0 + (CAST(tf.tf AS DOUBLE)
             |              * CAST(g.total_tokens AS DOUBLE))
             |            / (1000.0 * CAST(cf.cf AS DOUBLE)))) AS ms
             |      FROM qt JOIN tf USING (token) JOIN cf USING (token)
             |      CROSS JOIN g GROUP BY 1, 2),
             |sc AS (SELECT m.query_id, m.doc_id,
             |         m.ms + nq.nq * ln(1000.0
             |           / (CAST(dl.dl AS DOUBLE) + 1000.0)) AS score
             |       FROM m JOIN dl ON dl.doc_id = m.doc_id
             |       JOIN nq ON nq.query_id = m.query_id),
             |r AS (SELECT *, row_number() OVER
             |        (PARTITION BY query_id
             |         ORDER BY round(score, 6) DESC, doc_id) AS rank
             |      FROM sc)
             |SELECT query_id, doc_id, rank, round(score, 6) AS score
             |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // --- winnowing fingerprints (MOSS): window-min over modular token
    //     3-gram hashes — plain mod-1e9+7 arithmetic, full value oracle
    ("t20_winnow",
      (s, dir) => TextOps.winnowFingerprints(docs(s, dir), "text",
          "doc_id", n = 3, window = 4)
        .orderBy("doc_id", "fp"),
      Some(winnowOracle)),

    // --- winnow-fingerprint near-dup pairs (shared-passage detector).
    //     maxBucket raised in oracle mode (the SQL mirror is an
    //     uncapped all-pairs join, the d04 convention); production
    //     corpora keep the default cap.
    ("d12_winnow_dups",
      (s, dir) => Dedup.winnowDupPairs(docs(s, dir), "text", "doc_id",
          n = 3, window = 4, minShared = 2, maxBucket = 1 << 20)
        .orderBy("id_a", "id_b"),
      Some(winnowDupOracle)),

    // --- random-projection two-stage ANN: JL-projected cosine
    //     shortlist (same mirrorable hyperplane family as s02), exact
    //     re-rank — both stages value-checked like s06/s09
    ("s12_rp_rerank",
      (s, dir) => Similarity.rpRerankTopK(embs(s, dir),
          embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
          k = 5, dDims = 8, shortlist = 20)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("query_id", "rank"),
      Some(rpAnnOracle)),

    // --- temperature-scaled mixture (share ∝ avail^0.5): plan AND the
    //     sample it induces value-checked, like p06. pow(x, 0.5) is
    //     sqrt on both engines (fdlibm special case / correctly-rounded
    //     libm), so the shares are engine-exact.
    ("p07_temperature_mixture",
      (s, dir) => {
        val d = docs(s, dir)
        val plan = Pipeline.temperatureMixturePlan(d, "text", "lang",
          alpha = 0.5, budgetTokens = 100000L)
        val applied = Pipeline.applyMixture(d, "doc_id", "lang", plan)
          .groupBy(col("lang")).agg(count(lit(1)).as("sampled_docs"))
        plan.join(applied, Seq("lang"), "left")
          .select(col("lang"), col("n_docs"), col("avail_tokens"),
            round(col("share"), 6).as("share"),
            round(col("target_tokens"), 6).as("target_tokens"),
            round(col("rate"), 6).as("rate"), col("deficit"),
            coalesce(col("sampled_docs"), lit(0L)).as("sampled_docs"))
          .orderBy("lang")
      },
      Some(tempMixtureOracle)),

    // --- first-order Markov transition census over the event stream
    //     (p = exact-count division, per-row IEEE — no rounding needed)
    ("e10_transitions",
      (s, dir) => Sessionize.eventTransitions(evts(s, dir))
        .orderBy("from_type", "to_type"),
      Some("""WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
             |          FROM events),
             |s AS (SELECT event_type AS f,
             |        lead(event_type) OVER
             |          (PARTITION BY user_id ORDER BY ts, event_id) AS t
             |      FROM e),
             |c AS (SELECT f, t, count(*) AS n FROM s WHERE t IS NOT NULL
             |      GROUP BY 1, 2),
             |tot AS (SELECT f, CAST(sum(n) AS BIGINT) AS tn FROM c GROUP BY 1)
             |SELECT c.f AS from_type, c.t AS to_type, n AS n_transitions,
             |       CAST(n AS DOUBLE) / CAST(tn AS DOUBLE) AS p
             |FROM c JOIN tot USING (f)
             |ORDER BY from_type, to_type""".stripMargin)),

    // --- repetition-aware mixture application: deficit groups emit
    //     whole epochs + a hash-gated fractional epoch; every emitted
    //     (group, doc, copy) row value-checked
    ("p08_upsample",
      (s, dir) => {
        val d = docs(s, dir)
        val plan = Pipeline.mixturePlan(d, "text", "lang",
          Map("en" -> 0.2, "de" -> 0.2, "zh" -> 0.6), budgetTokens = 100000L)
        Pipeline.applyMixtureWithRepetition(d, "doc_id", "lang", plan)
          .orderBy("lang", "doc_id", "copy")
      },
      Some("""WITH t AS (SELECT doc_id, lang,
             |    CASE WHEN trim(text)='' THEN []::VARCHAR[]
             |         ELSE string_split_regex(trim(text), '\s+') END AS tk
             |  FROM documents),
             |a AS (SELECT lang, CAST(sum(len(tk)) AS BIGINT) AS avail
             |      FROM t GROUP BY 1),
             |p AS (SELECT lang,
             |        CAST(CASE lang WHEN 'en' THEN 0.2 WHEN 'de' THEN 0.2
             |               WHEN 'zh' THEN 0.6 ELSE 0.0 END AS DOUBLE)
             |          * 100000.0 AS target, avail FROM a),
             |r AS (SELECT lang, target / avail AS r FROM p),
             |d AS (SELECT t.doc_id, t.lang,
             |        CAST(floor(r) AS BIGINT)
             |        + CASE WHEN (t.doc_id*2654435761)%1000000007
             |               < CAST(floor((r - floor(r))*1000000007) AS BIGINT)
             |          THEN 1 ELSE 0 END AS n
             |      FROM t JOIN r USING (lang))
             |SELECT lang, doc_id, unnest(range(1, n + 1)) AS copy
             |FROM d WHERE n > 0 ORDER BY lang, doc_id, copy""".stripMargin)),

    // --- CCNet perplexity buckets: per-language tertiles of the t18
    //     bigram LM score via the exact engine percentile_disc; scores
    //     rounded to 6 BEFORE thresholding so both engines rank the
    //     identical multiset (thresholds + buckets cross-engine exact)
    ("t21_ppl_buckets",
      (s, dir) => {
        val d = docs(s, dir)
        TextOps.perplexityBuckets(d, d.where(col("lang") === "en"),
            "text", "doc_id", "lang")
          .orderBy("doc_id")
      },
      Some(pplBucketsOracle)),

    // --- SEMANTIC decontamination (embedding twin of p02): corpus rows
    //     whose max cosine vs any benchmark row (vec_id < 20) >= 0.5;
    //     max is order-independent so no rounding trick is needed for
    //     the aggregate itself — only the reported value rounds
    ("p09_semantic_decontam",
      (s, dir) => Similarity.semanticContaminationReport(
          embs(s, dir).where(col("vec_id") >= 20),
          embs(s, dir).where(col("vec_id") < 20),
          "embedding", "vec_id", threshold = 0.35)
        .select(col("vec_id"), round(col("max_sim"), 6).as("max_sim"))
        .orderBy("vec_id"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings),
             |b AS (SELECT vec_id, v FROM e WHERE vec_id < 20),
             |c AS (SELECT vec_id, v FROM e WHERE vec_id >= 20),
             |s AS (SELECT c.vec_id,
             |        max(list_dot_product(c.v, b.v) /
             |          (sqrt(list_dot_product(c.v, c.v)) *
             |           sqrt(list_dot_product(b.v, b.v)))) AS max_sim
             |      FROM c CROSS JOIN b GROUP BY c.vec_id)
             |SELECT vec_id, round(max_sim, 6) AS max_sim
             |FROM s WHERE max_sim >= 0.35 ORDER BY vec_id""".stripMargin)),

    // --- high-entropy secret-token scan: both engines inject an
    //     identical md5-derived key per document (the corpus has no
    //     organic secrets — the t09 synthesis convention), and the
    //     detector must flag exactly those; the sorted-character
    //     entropy sum makes the rounded value engine-exact
    ("t22_secret_scan",
      (s, dir) => TextOps.secretTokens(
          docs(s, dir).select(col("doc_id"),
            concat(lit("sk_"), md5(col("doc_id").cast("string")), lit(" "),
              col("text")).as("text")),
          "text", "doc_id", minLen = 12, minEntropy = 2.0)
        .orderBy("doc_id", "token"),
      Some("""WITH d AS (SELECT doc_id,
             |    'sk_' || md5(CAST(doc_id AS VARCHAR)) || ' ' || text AS text
             |  FROM documents),
             |t AS (SELECT doc_id,
             |    list_distinct(CASE WHEN trim(text)='' THEN []::VARCHAR[]
             |         ELSE string_split_regex(trim(text), '\s+') END) AS tk
             |  FROM d),
             |e AS (SELECT doc_id, unnest(tk) AS token FROM t),
             |f AS (SELECT doc_id, token FROM e WHERE length(token) >= 12),
             |h AS (SELECT doc_id, token,
             |        CAST(length(token) AS BIGINT) AS tok_len,
             |        round(ln(length(token))
             |          - list_sum(list_transform(
             |              list_sort(list_distinct(
             |                [token[i] for i in range(1, length(token)+1)])),
             |              c -> len(list_filter(
             |                     [token[i] for i in range(1, length(token)+1)],
             |                     x -> x = c))
             |                   * ln(len(list_filter(
             |                       [token[i] for i in range(1, length(token)+1)],
             |                       x -> x = c)))))
             |            / length(token), 6) AS entropy
             |      FROM f)
             |SELECT doc_id, token, tok_len, entropy
             |FROM h WHERE entropy >= 2.0
             |ORDER BY doc_id, token""".stripMargin)),

    // --- per-source doc-length quantile report (exact percentile_disc,
    //     integer values — engine-exact without rounding)
    ("t23_len_quantiles",
      (s, dir) => Pipeline.groupQuantiles(docs(s, dir), "source", "n_chars",
          Seq(0.1, 0.5, 0.9, 0.99))
        .orderBy("source", "p"),
      // quantile_disc requires CONSTANT p → one SELECT per p, unioned
      Some(Seq(0.1, 0.5, 0.9, 0.99).map(p =>
        s"""SELECT source, CAST($p AS DOUBLE) AS p,
           |       quantile_disc(n_chars, $p) AS q
           |FROM documents GROUP BY source""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY source, p"))),

    // --- embedding drift report: per-label centroid cosine between the
    //     even/odd halves of the corpus (snapshot monitoring); means differ
    //     in ulps by reduction order, the cosine rounds to 6
    ("s13_centroid_drift",
      (s, dir) => Similarity.centroidDrift(
          embs(s, dir).where(col("vec_id") % 2 === 0),
          embs(s, dir).where(col("vec_id") % 2 === 1),
          "embedding", "label")
        .select(col("label"), col("n_before"), col("n_after"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("label"),
      Some("""WITH e AS (SELECT vec_id, label,
             |            CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |x AS (SELECT vec_id, label, u.pos AS pos, u.val AS val FROM (
             |  SELECT vec_id, label,
             |         unnest([{'pos': i, 'val': v[i]}
             |                 for i in range(1, len(v) + 1)]) AS u
             |  FROM e)),
             |ca AS (SELECT label, list(m ORDER BY pos) AS c FROM (
             |    SELECT label, pos, avg(val) AS m FROM x
             |    WHERE vec_id % 2 = 0 GROUP BY 1, 2) GROUP BY label),
             |cb AS (SELECT label, list(m ORDER BY pos) AS c FROM (
             |    SELECT label, pos, avg(val) AS m FROM x
             |    WHERE vec_id % 2 = 1 GROUP BY 1, 2) GROUP BY label),
             |na AS (SELECT label, count(*) AS n_before FROM e
             |       WHERE vec_id % 2 = 0 GROUP BY 1),
             |nb AS (SELECT label, count(*) AS n_after FROM e
             |       WHERE vec_id % 2 = 1 GROUP BY 1)
             |SELECT na.label AS label, n_before, n_after,
             |       round(list_dot_product(ca.c, cb.c) /
             |         (sqrt(list_dot_product(ca.c, ca.c)) *
             |          sqrt(list_dot_product(cb.c, cb.c))), 6) AS cos_sim
             |FROM na JOIN nb USING (label)
             |JOIN ca USING (label) JOIN cb USING (label)
             |ORDER BY label""".stripMargin)),

    // --- asymmetric containment pairs (subset duplication): winnow
    //     candidates, exact |A∩B|/min(|A|,|B|) verify over shingle
    //     sets. Oracle mirrors candidates AND verification (string
    //     shingle sets equal hashed sets modulo ~2^-64 collisions, the
    //     d02 convention). maxBucket raised in oracle mode (d04 rule).
    ("d13_containment",
      (s, dir) => Dedup.containmentPairs(docs(s, dir), "text", "doc_id",
          n = 3, window = 4, minShared = 2, threshold = 0.5,
          maxBucket = 1 << 20)
        .select(col("id_a"), col("id_b"),
          round(col("containment"), 6).as("containment"))
        .orderBy("id_a", "id_b"),
      Some(containmentOracle)),

    // --- language-ID confidence margin (argmax + best/second marker
    //     hits; relative margin is a per-row exact division)
    ("t24_lang_margin",
      (s, dir) => TextOps.langIdReport(docs(s, dir), "text", "doc_id")
        .orderBy("doc_id"),
      Some(langMarginOracle)),

    // --- language-ID confusion matrix vs the labeled lang column (the
    //     eval harness for the heuristic: per-(label, prediction)
    //     counts + within-label share)
    ("t33_langid_eval",
      (s, dir) => {
        val p = docs(s, dir)
          .select(col("lang"),
            TextOps.langIdF(TextOps.features(col("text"))).as("pred"))
        val c = p.groupBy(col("lang"), col("pred"))
          .agg(count(lit(1)).as("n"))
        val t = c.groupBy(col("lang")).agg(sum(col("n")).as("__tot"))
        c.join(t, Seq("lang"))
          .select(col("lang"), col("pred"), col("n"),
            round(col("n").cast("double") / col("__tot"), 6).as("share"))
          .orderBy("lang", "pred")
      },
      Some(s"""WITH f AS ($sqlTextFeatures),
             |b AS (SELECT lang, $sqlBest AS best, f.* FROM f
             |      JOIN documents USING (doc_id)),
             |p AS (SELECT lang, $sqlLangCase AS pred FROM b),
             |c AS (SELECT lang, pred, count(*) AS n FROM p GROUP BY 1, 2),
             |t AS (SELECT lang, sum(n) AS tot FROM c GROUP BY 1)
             |SELECT c.lang, c.pred, c.n,
             |       round(CAST(c.n AS DOUBLE) / t.tot, 6) AS share
             |FROM c JOIN t ON t.lang = c.lang
             |ORDER BY c.lang, c.pred""".stripMargin)),

    // --- PMI collocations over the top-40 vocabulary head (document
    //     presence counts; pmi is a per-row ln of exact-count ratios)
    ("t25_pmi",
      (s, dir) => TextOps.topTokenPmi(docs(s, dir), "text", "doc_id",
          topK = 40, minPairCount = 20L)
        .select(col("tok_a"), col("tok_b"), col("n_ab"),
          round(col("pmi"), 6).as("pmi"))
        .orderBy("tok_a", "tok_b"),
      Some("""WITH t AS (SELECT doc_id,
             |    CASE WHEN trim(text)='' THEN []::VARCHAR[]
             |         ELSE string_split_regex(trim(text), '\s+') END AS tk
             |  FROM documents),
             |f AS (SELECT token, count(*) AS n
             |      FROM (SELECT unnest(tk) AS token FROM t) GROUP BY 1),
             |top AS (SELECT token FROM f ORDER BY n DESC, token LIMIT 40),
             |pres AS (SELECT DISTINCT doc_id, token
             |         FROM (SELECT doc_id, unnest(tk) AS token FROM t)
             |         WHERE token IN (SELECT token FROM top)),
             |n1 AS (SELECT token, count(*) AS na FROM pres GROUP BY 1),
             |nd AS (SELECT count(*) AS n FROM t WHERE len(tk) > 0),
             |pc AS (SELECT a.token AS tok_a, b.token AS tok_b,
             |         count(*) AS n_ab
             |       FROM pres a JOIN pres b
             |         ON a.doc_id = b.doc_id AND a.token < b.token
             |       GROUP BY 1, 2 HAVING count(*) >= 20)
             |SELECT tok_a, tok_b, n_ab,
             |       round(ln((CAST(n_ab AS DOUBLE) * CAST(nd.n AS DOUBLE)) /
             |         (CAST(x.na AS DOUBLE) * CAST(y.na AS DOUBLE))), 6) AS pmi
             |FROM pc JOIN n1 x ON x.token = pc.tok_a
             |JOIN n1 y ON y.token = pc.tok_b CROSS JOIN nd
             |ORDER BY tok_a, tok_b""".stripMargin)),

    // --- exact dedup over the CANONICAL normalization (case/whitespace
    //     variants collapse — the C4 convention; composition of
    //     normalize + exact, both already verified in isolation)
    ("d14_dedup_normalized",
      (s, dir) => Dedup.exact(
          docs(s, dir).withColumn("__norm", TextOps.normalize(col("text"))),
          "__norm", "doc_id")
        .orderBy("doc_id"),
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS n_dups
             |FROM (SELECT doc_id,
             |        trim(regexp_replace(regexp_replace(lower(text),
             |          '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
             |      FROM documents)
             |GROUP BY nt ORDER BY doc_id""".stripMargin)),

    // --- BPE-step pair census: adjacent character pairs within tokens,
    //     top-20 (what one merge step of tokenizer training maximizes)
    ("t26_bpe_pairs",
      (s, dir) => TextOps.bpePairCounts(docs(s, dir), "text", topK = 20)
        .orderBy(col("n").desc, col("pair")),
      Some("""WITH t AS (SELECT
             |    CASE WHEN trim(text)='' THEN []::VARCHAR[]
             |         ELSE string_split_regex(trim(text), '\s+') END AS tk
             |  FROM documents),
             |tok AS (SELECT unnest(tk) AS token FROM t),
             |p AS (SELECT unnest([token[i:i+1]
             |                     for i in range(1, length(token))]) AS pair
             |      FROM tok WHERE length(token) >= 2)
             |SELECT pair, count(*) AS n FROM p
             |GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""".stripMargin)),

    // --- end-to-end curation v2: corpus boilerplate scrub → quality
    //     gate ON THE SCRUBBED TEXT → canonical-normalized exact dedup
    //     → per-language report. Every stage individually oracled
    //     (t19, t02, d14); this query value-checks the COMPOSITION.
    ("p10_curation_v2",
      (s, dir) => {
        val d = docs(s, dir)
        val scrubbed = TextOps.scrubBoilerplateLines(d, "text", "doc_id",
            minDocFreq = 3, minLineLen = 10)
          .join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
        val gated = scrubbed
          .withColumn("__f", TextOps.features(col("text_clean")))
          .withColumn("quality",
            TextOps.qualityScoreF(col("__f"), length(col("text_clean"))))
          .where(col("quality") >= 0.4)
        val kept = Dedup.exact(
            gated.withColumn("__n", TextOps.normalize(col("text_clean"))),
            "__n", "doc_id")
          .select(col("doc_id"))
        gated.join(kept, Seq("doc_id"), "left_semi")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(TextOps.tokenCount(col("text_clean"))).as("n_tokens"),
            round(avg(col("quality")), 6).as("avg_quality"))
          .orderBy("lang")
      },
      Some(curationV2Oracle)),

    // --- inter-arrival gap quantiles per event type (rate-monitoring
    //     fingerprint; integer gaps + exact percentile_disc)
    ("e11_gap_quantiles",
      (s, dir) => Sessionize.interArrivalQuantiles(evts(s, dir),
          Seq(0.5, 0.9, 0.99))
        .orderBy("event_type", "p"),
      Some(Seq(0.5, 0.9, 0.99).map(p =>
        s"""SELECT event_type, CAST($p AS DOUBLE) AS p,
           |       quantile_disc(gap_ms, $p) AS q
           |FROM (SELECT event_type,
           |        epoch_ms(CAST(ts AS TIMESTAMP)) - lag(epoch_ms(CAST(ts AS TIMESTAMP)))
           |          OVER (PARTITION BY event_type
           |                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_ms
           |      FROM events)
           |WHERE gap_ms IS NOT NULL GROUP BY event_type""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY event_type, p"))),

    // --- recall@5 of the LSH path against the exact scan — the ANN QA
    //     canary, value-checked end to end (both paths already have
    //     full oracles; this checks the evaluation arithmetic too)
    ("s14_ann_recall",
      (s, dir) => Similarity.recallAtK(
          Similarity.lshTopK(embs(s, dir),
            embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
            k = 5, nPlanes = 4),
          Similarity.bruteForceTopK(embs(s, dir),
            embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
            k = 5),
          k = 5)
        .orderBy("query_id"),
      Some(annRecallOracle)),

    // --- JSON field-quality report (schema-drift canary): both engines
    //     corrupt every 10th payload identically (t09 synthesis rule),
    //     and declare a field ('tag') the producer never sends
    ("e12_json_quality",
      (s, dir) => SemiStructured.jsonFieldQuality(
          evts(s, dir).withColumn("props",
            when(pmod(col("event_id"), lit(10)) === 0,
              concat(lit("x"), col("props"))).otherwise(col("props"))),
          "props", "k BIGINT, tag STRING")
        .orderBy("field"),
      Some("""WITH p AS (SELECT props,
             |        TRY_CAST(CASE WHEN event_id % 10 = 0
             |          THEN 'x' || props ELSE props END AS JSON) AS j
             |       FROM events),
             |w AS (SELECT count(*) AS n,
             |        count(*) FILTER (props IS NOT NULL AND j IS NULL) AS c,
             |        count(*) FILTER (j->>'k' IS NOT NULL) AS pk,
             |        count(*) FILTER (j->>'tag' IS NOT NULL) AS pt
             |      FROM p)
             |SELECT '__corrupt' AS field, n AS n_rows, c AS n_present,
             |       CAST(c AS DOUBLE) / n AS present_rate FROM w
             |UNION ALL
             |SELECT 'k', n, pk, CAST(pk AS DOUBLE) / n FROM w
             |UNION ALL
             |SELECT 'tag', n, pt, CAST(pt AS DOUBLE) / n FROM w
             |ORDER BY field""".stripMargin)),

    // --- per-type winsorization at exact [p01, p99]: thresholds are
    //     existing values from the percentile_disc buffer, so the
    //     clipped column is bit-exact with NO rounding anywhere
    ("e13_winsorize",
      (s, dir) => Pipeline.winsorize(evts(s, dir), "event_type", "value",
          lo = 0.01, hi = 0.99)
        .select(col("event_id"), col("event_type"), col("value"),
          col("value_winsorized"))
        .orderBy("event_id"),
      Some("""WITH th AS (SELECT event_type,
             |        quantile_disc(value, 0.01) AS lo,
             |        quantile_disc(value, 0.99) AS hi
             |      FROM events GROUP BY 1)
             |SELECT event_id, e.event_type, value,
             |       least(greatest(value, lo), hi) AS value_winsorized
             |FROM events e JOIN th ON e.event_type = th.event_type
             |ORDER BY event_id""".stripMargin)),

    // --- approx-winsorize production twin (round 10): the GK-sketch
    //     thresholds at accuracy 10000 — every sf0.01 group is under
    //     the sketch's compression threshold, so the buffer holds all
    //     samples and the queried values are EXACT, hash-matching the
    //     e13 exact-twin oracle (at 100 TB the sketch compresses and
    //     the rank-error unit test bounds the drift instead)
    ("e60_winsorize_approx",
      (s, dir) => Pipeline.winsorizeApprox(evts(s, dir), "event_type",
          "value", lo = 0.01, hi = 0.99, accuracy = 10000)
        .select(col("event_id"), col("event_type"), col("value"),
          col("value_winsorized"))
        .orderBy("event_id"),
      Some("""WITH th AS (SELECT event_type,
             |        quantile_disc(value, 0.01) AS lo,
             |        quantile_disc(value, 0.99) AS hi
             |      FROM events GROUP BY 1)
             |SELECT event_id, e.event_type, value,
             |       least(greatest(value, lo), hi) AS value_winsorized
             |FROM events e JOIN th ON e.event_type = th.event_type
             |ORDER BY event_id""".stripMargin)),

    // --- Matryoshka two-stage ANN: 16-dim prefix cosine shortlist,
    //     full-dimension exact re-rank (the zero-compute compressor;
    //     both stages mirrored like s12/s09)
    ("s15_matryoshka",
      (s, dir) => Similarity.matryoshkaRerankTopK(embs(s, dir),
          embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
          k = 5, dPrefix = 16, shortlist = 20)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("query_id", "rank"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings),
             |pf AS (SELECT vec_id, v, v[1:16] AS p FROM e),
             |s1 AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |        CASE WHEN sqrt(list_dot_product(q.p, q.p)) = 0
             |               OR sqrt(list_dot_product(c.p, c.p)) = 0 THEN 0.0
             |          ELSE list_dot_product(q.p, c.p) /
             |            (sqrt(list_dot_product(q.p, q.p)) *
             |             sqrt(list_dot_product(c.p, c.p)))
             |        END AS pref_sim
             |      FROM pf q CROSS JOIN pf c
             |      WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
             |sl AS (SELECT query_id, neighbor_id FROM
             |        (SELECT *, row_number() OVER
             |           (PARTITION BY query_id
             |            ORDER BY pref_sim DESC, neighbor_id) AS r
             |         FROM s1) WHERE r <= 20),
             |ex AS (SELECT sl.query_id, sl.neighbor_id,
             |        list_dot_product(qe.v, ce.v) /
             |          (sqrt(list_dot_product(qe.v, qe.v)) *
             |           sqrt(list_dot_product(ce.v, ce.v))) AS cos_sim
             |      FROM sl JOIN e qe ON qe.vec_id = sl.query_id
             |      JOIN e ce ON ce.vec_id = sl.neighbor_id),
             |rk AS (SELECT *, row_number() OVER
             |        (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
             |        AS rank FROM ex)
             |SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim
             |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // --- top user journeys: first-3-event paths, top-20 by user count
    ("e14_top_paths",
      (s, dir) => Sessionize.topPaths(evts(s, dir), pathLen = 3, topK = 20)
        .orderBy(col("n_users").desc, col("path")),
      Some("""WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
             |          FROM events),
             |r AS (SELECT user_id, event_type, row_number() OVER
             |        (PARTITION BY user_id ORDER BY ts, event_id) AS rk
             |      FROM e),
             |p AS (SELECT user_id,
             |        string_agg(event_type, '>' ORDER BY rk) AS path
             |      FROM r WHERE rk <= 3 GROUP BY user_id)
             |SELECT path, count(*) AS n_users
             |FROM p GROUP BY path
             |ORDER BY n_users DESC, path LIMIT 20""".stripMargin)),

    // --- IVF-PQ composite (FAISS IVFADC): partition-pruned probe +
    //     code-only ADC shortlist + exact re-rank; both quantizers are
    //     the SQL-mirrorable seeds so the full composite value-checks
    ("s16_ann_ivfpq",
      (s, dir) => {
        val e = embs(s, dir)
        val cent = Similarity.seedCentroids(e, "embedding", "vec_id", 16)
        val cb = Similarity.pqCodebooks(e, "embedding", "vec_id",
          m = 8, ksub = 16)
        val path = java.nio.file.Files.createTempDirectory("s16_ivfpq").toString
        Similarity.writeIvfPqIndex(e, "embedding", "vec_id", cent, cb, path)
        Similarity.ivfPqProbeIndex(s.read.parquet(path),
            e.where(col("vec_id") < 8), "embedding", "vec_id",
            k = 5, cent, cb, nProbe = 6, shortlist = 20)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cos_sim"), 6).as("cos_sim"))
          .orderBy("query_id", "rank")
      },
      Some(ivfPqOracle)),

    // --- incremental IVF-PQ append (round 12; completes the
    //     maintenance matrix: IVF s35, PQ s37, composite here): build
    //     from the even half, append the odd half under the ORIGINAL
    //     centroids + codebooks, probe — old + new rows under one
    //     frozen geometry ⇒ s16's oracle binds the appended index.
    ("s39_ivfpq_append",
      (s, dir) => {
        val e = embs(s, dir)
        val cent = Similarity.seedCentroids(e, "embedding", "vec_id", 16)
        val cb = Similarity.pqCodebooks(e, "embedding", "vec_id",
          m = 8, ksub = 16)
        val path = java.nio.file.Files.createTempDirectory("s39_ivfpq").toString
        Similarity.writeIvfPqIndex(e.where(col("vec_id") % 2 === 0),
          "embedding", "vec_id", cent, cb, path)
        Similarity.appendIvfPqIndex(e.where(col("vec_id") % 2 === 1),
          "embedding", "vec_id", cent, cb, path)
        Similarity.ivfPqProbeIndex(s.read.parquet(path),
            e.where(col("vec_id") < 8), "embedding", "vec_id",
            k = 5, cent, cb, nProbe = 6, shortlist = 20)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cos_sim"), 6).as("cos_sim"))
          .orderBy("query_id", "rank")
      },
      Some(ivfPqOracle)),

    // --- corpus snapshot diff: both engines synthesize the identical
    //     "after" snapshot (every 11th doc removed, every 7th changed,
    //     every 13th re-added under a shifted id — t09 convention) and
    //     the diff must classify exactly those
    ("d15_snapshot_diff",
      (s, dir) => {
        val before = docs(s, dir).select(col("doc_id"), col("text"))
        val after = before.where(pmod(col("doc_id"), lit(11)) =!= 0)
          .select(col("doc_id"),
            when(pmod(col("doc_id"), lit(7)) === 0,
              concat(col("text"), lit(" v2"))).otherwise(col("text")).as("text"))
          .unionByName(before.where(pmod(col("doc_id"), lit(13)) === 0)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        Dedup.snapshotDiff(before, after, "text", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id, text FROM documents),
             |a AS (SELECT doc_id,
             |        CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
             |             ELSE text END AS text
             |      FROM documents WHERE doc_id % 11 <> 0
             |      UNION ALL
             |      SELECT doc_id + 100000, text FROM documents
             |      WHERE doc_id % 13 = 0),
             |j AS (SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
             |        CASE WHEN b.doc_id IS NULL THEN 'added'
             |             WHEN a.doc_id IS NULL THEN 'removed'
             |             WHEN a.text <> b.text THEN 'changed'
             |             ELSE 'unchanged' END AS status
             |      FROM b FULL JOIN a ON a.doc_id = b.doc_id)
             |SELECT doc_id, status FROM j WHERE status <> 'unchanged'
             |ORDER BY doc_id""".stripMargin)),

    // --- per-source duplication-rate triage (where dedup budget goes)
    ("t27_dup_rate",
      (s, dir) => Dedup.dupRateByGroup(docs(s, dir), "text", "source")
        .select(col("source"), col("n_docs"), col("n_distinct"),
          round(col("dup_rate"), 6).as("dup_rate"))
        .orderBy("source"),
      Some("""SELECT source, count(*) AS n_docs,
             |       count(DISTINCT text) AS n_distinct,
             |       round(1.0 - CAST(count(DISTINCT text) AS DOUBLE)
             |         / CAST(count(*) AS DOUBLE), 6) AS dup_rate
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // --- Zipf fit over the top-100 frequency head (corpus health
    //     one-liner; sums rounded at the report edge only)
    ("t28_zipf_fit",
      (s, dir) => TextOps.zipfFit(docs(s, dir), "text", topK = 100)
        .select(col("n_terms"), round(col("slope"), 6).as("slope"),
          round(col("intercept"), 6).as("intercept")),
      Some("""WITH f AS (SELECT token, count(*) AS n
             |  FROM (SELECT unnest(
             |          CASE WHEN trim(text)='' THEN []::VARCHAR[]
             |               ELSE string_split_regex(trim(text), '\s+') END)
             |          AS token
             |        FROM documents)
             |  GROUP BY token),
             |h AS (SELECT n, row_number() OVER
             |        (ORDER BY n DESC, token) AS r
             |      FROM (SELECT * FROM f ORDER BY n DESC, token LIMIT 100)),
             |p AS (SELECT ln(CAST(r AS DOUBLE)) AS x,
             |             ln(CAST(n AS DOUBLE)) AS y FROM h),
             |g AS (SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
             |             sum(x*y) AS sxy, sum(x*x) AS sxx FROM p)
             |SELECT k AS n_terms,
             |  round((k*sxy - sx*sy) / (k*sxx - sx*sx), 6) AS slope,
             |  round((sy - ((k*sxy - sx*sy) / (k*sxx - sx*sx)) * sx) / k, 6)
             |    AS intercept
             |FROM g""".stripMargin)),

    // --- weighted sampling without replacement (Efraimidis–Spirakis,
    //     hash-derived uniforms, rounded ranking key): 100 docs chosen
    //     with probability ∝ length — one TakeOrdered, no shuffle
    ("p11_weighted_sample",
      (s, dir) => Pipeline.weightedSample(
          docs(s, dir).select(col("doc_id"), col("lang"),
            (col("n_chars") + lit(1)).as("w")),
          "doc_id", "w", n = 100)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id"),
      Some("""WITH k AS (
             |  SELECT doc_id, lang,
             |    round(ln(((doc_id * 2654435761) % 1000000007 + 1)
             |            / 1000000007.0)
             |          / (n_chars + 1), 6) AS wkey
             |  FROM documents WHERE n_chars + 1 > 0),
             |t AS (SELECT * FROM k ORDER BY wkey DESC, doc_id LIMIT 100)
             |SELECT doc_id, lang FROM t ORDER BY doc_id""".stripMargin)),

    // --- interval×interval overlap join: 30-min error windows vs
    //     15-min purchase windows per user (bucketed equi-join, one
    //     cell per pair via the overlap-start-bucket condition);
    //     oracle is the naive theta join
    ("e18_interval_overlap",
      (s, dir) => {
        val e = evts(s, dir)
        val errs = e.where(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id"),
            col("ts").as("st"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("en"))
        val purch = e.where(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"),
            col("user_id"), col("ts").as("pst"),
            (col("ts") + expr("INTERVAL 15 MINUTES")).as("pen"))
        AsOf.intervalOverlapJoin(errs, purch, Seq("user_id"),
            "st", "en", "pst", "pen", bucketWidthSec = 1800)
          .select(col("err_id"), col("p_id"),
            expr("(unix_micros(least(en, pen)) - " +
              "unix_micros(greatest(st, pst))) div 1000000")
              .as("overlap_sec"))
          .orderBy("err_id", "p_id")
      },
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
             |a AS (SELECT event_id AS err_id, user_id, ts AS st,
             |             ts + INTERVAL 30 MINUTE AS en
             |      FROM e0 WHERE event_type = 'error'),
             |b AS (SELECT event_id AS p_id, user_id, ts AS pst,
             |             ts + INTERVAL 15 MINUTE AS pen
             |      FROM e0 WHERE event_type = 'purchase')
             |SELECT err_id, p_id,
             |       CAST(floor((epoch_ms(least(en, pen))
             |         - epoch_ms(greatest(st, pst))) / 1000.0) AS BIGINT)
             |         AS overlap_sec
             |FROM a JOIN b ON a.user_id = b.user_id
             |  AND st < pen AND pst < en
             |ORDER BY err_id, p_id""".stripMargin)),

    // --- per-event anomaly z-score vs the user's own strictly-prior
    //     60-min window (leakage-free frame; population sigma via the
    //     running-moment identity). z rounded to 6; the anomaly verdict
    //     stays null until 5 prior events exist
    ("e17_anomaly_zscores",
      (s, dir) => Sessionize.anomalyZScores(evts(s, dir),
          windowMinutes = 60, minPrior = 5, threshold = 3.0)
        .select(col("event_id"), col("user_id"), col("n_prior"),
          round(col("z"), 6).as("z"),
          // 1/0/null instead of true/false/null: nullable BOOLEAN parquet
          // round-trips as None vs DuckDB's NaN in the compare harness;
          // nullable BIGINT compares cleanly on both engines
          col("is_anomaly").cast("long").as("is_anomaly"))
        .orderBy("event_id"),
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
             |w AS (SELECT event_id, user_id, value, epoch_ms(ts) AS ms
             |      FROM e0),
             |s AS (SELECT *, count(*) OVER win AS n_prior,
             |        avg(value) OVER win AS mu,
             |        avg(value * value) OVER win AS m2
             |      FROM w
             |      WINDOW win AS (PARTITION BY user_id ORDER BY ms
             |        RANGE BETWEEN 3600000 PRECEDING AND 1 PRECEDING)),
             |z AS (SELECT event_id, user_id, n_prior,
             |        CASE WHEN n_prior >= 5
             |               AND sqrt(greatest(m2 - mu*mu, 0)) > 0
             |          THEN (value - mu) / sqrt(greatest(m2 - mu*mu, 0))
             |        END AS z
             |      FROM s)
             |SELECT event_id, user_id, n_prior, round(z, 6) AS z,
             |       CASE WHEN z IS NOT NULL
             |         THEN CAST(abs(round(z, 6)) > 3.0 AS BIGINT) END
             |         AS is_anomaly
             |FROM z ORDER BY event_id""".stripMargin)),

    // --- SCD2 dimension history from the event change log: per-user
    //     event_type episodes with [from, to) validity; consecutive
    //     same-state observations collapse into the open episode
    // --- STREAMING SCD2 twin (round 15, VERDICT-r14 #7): per-key
    //     open-episode state in flatMapGroupsWithState — closed
    //     episodes emit once, the open episode re-emits per trigger
    //     (Update mode); the replay reduces per (key, valid_from)
    //     (min(valid_to): the closed row when one exists) and must
    //     equal the batch scd2 mirror. Millisecond-truncated ts (the
    //     state carries epoch millis).
    ("e61_stream_scd2",
      (s, dir) => {
        import s.implicits._
        val ev = evts(s, dir).where(col("user_id") < 30)
          .select(col("user_id").as("key"),
            col("event_type").as("attr"),
            timestamp_millis(unix_millis(col("ts"))).as("ts"),
            col("event_id").as("tie"))
          .as[ChangeData.Scd2Obs].collect()
          .sortBy(o => (o.ts.getTime, o.tie)).toSeq
        graft.streaming.Replay.run(s,
            graft.streaming.Replay.timeChunks(ev, 3), "update") {
          ds => ChangeData.streamingScd2(ds).toDF()
        }
          .groupBy(col("key").as("user_id"),
            col("attr").as("event_type"), col("valid_from"))
          .agg(min(col("valid_to")).as("valid_to"))
          .withColumn("is_current", col("valid_to").isNull)
          .select(col("user_id"), col("event_type"), col("valid_from"),
            col("valid_to"), col("is_current"))
          .orderBy("user_id", "valid_from", "event_type")
      },
      Some("""WITH e0 AS (
             |  SELECT user_id, event_type, event_id,
             |    date_trunc('milliseconds', CAST(ts AS TIMESTAMP)) AS ts
             |  FROM events WHERE user_id < 30),
             |o AS (SELECT user_id, event_type, ts, event_id,
             |        lag(event_type) OVER w AS prev,
             |        lag(ts) OVER w AS pts
             |      FROM e0
             |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |k AS (SELECT user_id, event_type, ts, event_id FROM o
             |      WHERE pts IS NULL OR prev IS DISTINCT FROM event_type),
             |f AS (SELECT user_id, event_type, ts AS valid_from,
             |        lead(ts) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS valid_to
             |      FROM k)
             |SELECT user_id, event_type, valid_from, valid_to,
             |       valid_to IS NULL AS is_current
             |FROM f ORDER BY user_id, valid_from, event_type"""
        .stripMargin)),

    ("e19_scd2",
      (s, dir) => ChangeData.scd2(evts(s, dir), "user_id",
          Seq("event_type"), "ts", "event_id")
        .orderBy("user_id", "valid_from", "event_type"),
      Some("""WITH o AS (SELECT user_id, event_type, ts, event_id,
             |        lag(event_type) OVER w AS prev,
             |        lag(ts) OVER w AS pts
             |      FROM events
             |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |k AS (SELECT user_id, event_type, ts, event_id FROM o
             |      WHERE pts IS NULL OR prev IS DISTINCT FROM event_type),
             |f AS (SELECT user_id, event_type, ts AS valid_from,
             |        lead(ts) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS valid_to
             |      FROM k)
             |SELECT user_id, event_type, valid_from, valid_to,
             |       valid_to IS NULL AS is_current
             |FROM f ORDER BY user_id, valid_from, event_type""".stripMargin)),

    // --- trailing 6-hour distinct active users per event type at every
    //     hour boundary (contribute-forward explode over DEDUPED
    //     (type, user, hour) rows — raw events never multiply)
    ("e20_sliding_users",
      (s, dir) => Sessionize.slidingDistinctUsers(evts(s, dir),
          windowHours = 6)
        .orderBy("event_type", "hour"),
      Some("""WITH c AS (SELECT DISTINCT event_type, user_id,
             |        date_trunc('hour', ts) AS h
             |      FROM events),
             |m AS (SELECT max(h) AS maxh FROM c),
             |x AS (SELECT event_type, user_id,
             |        unnest(generate_series(h,
             |          least(h + INTERVAL 5 HOUR, maxh),
             |          INTERVAL 1 HOUR)) AS hour
             |      FROM c, m)
             |SELECT event_type, hour, count(DISTINCT user_id) AS n_users
             |FROM x GROUP BY 1, 2 ORDER BY event_type, hour""".stripMargin)),

    // --- Flesch reading-ease scoring (words = letter runs, sentences =
    //     terminal-punctuation runs, syllables = vowel-group runs; both
    //     denominators floored at 1) — single map stage over the scan
    ("t29_readability",
      (s, dir) => docs(s, dir).select(col("doc_id"),
          TextOps.wordCount(col("text")).as("words"),
          TextOps.sentenceCount(col("text")).as("sentences"),
          TextOps.syllableCount(col("text")).as("syllables"),
          round(TextOps.fleschScore(col("text")), 6).as("flesch"))
        .orderBy("doc_id"),
      Some("""WITH c AS (SELECT doc_id,
             |  length(regexp_extract_all(text, '[A-Za-z]+')) AS words,
             |  length(regexp_extract_all(text, '[.!?]+')) AS sentences,
             |  length(regexp_extract_all(lower(text), '[aeiouy]+'))
             |    AS syllables
             |  FROM documents)
             |SELECT doc_id, CAST(words AS BIGINT) AS words,
             |  CAST(sentences AS BIGINT) AS sentences,
             |  CAST(syllables AS BIGINT) AS syllables,
             |  round(206.835
             |    - 1.015 * (CAST(greatest(words, 1) AS DOUBLE)
             |               / greatest(sentences, 1))
             |    - 84.6 * (CAST(syllables AS DOUBLE) / greatest(words, 1)),
             |    6) AS flesch
             |FROM c ORDER BY doc_id""".stripMargin)),

    // --- code-vs-prose routing: symbol-char + indented-line density,
    //     thresholded; corpus mixes route code away from prose filters
    ("t30_code_detect",
      (s, dir) => docs(s, dir).select(col("doc_id"),
          round(TextOps.codeScore(col("text")), 6).as("code_score"),
          TextOps.isCode(col("text")).as("is_code"))
        .orderBy("doc_id"),
      Some("""WITH c AS (SELECT doc_id,
             |  length(regexp_extract_all(text, '[{}();=<>\[\]]')) AS sym,
             |  length(regexp_extract_all(text, '(?m)^(?:    |\t)'))
             |    AS ind,
             |  length(text) AS n
             |  FROM documents)
             |SELECT doc_id,
             |  round((sym * 2.0 + ind * 3.0) / (n + 1.0), 6) AS code_score,
             |  (sym * 2.0 + ind * 3.0) / (n + 1.0) > 0.06 AS is_code
             |FROM c ORDER BY doc_id""".stripMargin)),

    // --- funnel conversion summary: per-stage user counts and
    //     step/top conversion rates off the e04 funnel (one aggregation
    //     over the per-user output, exact-count divisions)
    ("e15_funnel_summary",
      (s, dir) => Sessionize.funnelSummary(
          Sessionize.funnel(evts(s, dir), Seq("view", "click", "purchase")),
          Seq("view", "click", "purchase"))
        .orderBy("stage_idx"),
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
             |v AS (SELECT user_id, min(ts) AS view_ts
             |      FROM e0 WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT v.user_id, v.view_ts,
             |        min(CASE WHEN e.ts > v.view_ts THEN e.ts END) AS click_ts
             |      FROM v LEFT JOIN e0 e
             |        ON e.user_id = v.user_id AND e.event_type = 'click'
             |      GROUP BY 1, 2),
             |p AS (SELECT c.user_id, c.view_ts, c.click_ts,
             |        min(CASE WHEN e.ts > c.click_ts THEN e.ts END)
             |          AS purchase_ts
             |      FROM c LEFT JOIN e0 e
             |        ON e.user_id = c.user_id AND e.event_type = 'purchase'
             |      GROUP BY 1, 2, 3),
             |g AS (SELECT count(view_ts) AS c0, count(click_ts) AS c1,
             |             count(purchase_ts) AS c2 FROM p)
             |SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
             |       c0 AS n_users,
             |       CAST(c0 AS DOUBLE)/c0 AS p_prev, CAST(c0 AS DOUBLE)/c0 AS p_top
             |FROM g
             |UNION ALL SELECT CAST(2 AS BIGINT), 'click', c1,
             |       CAST(c1 AS DOUBLE)/c0, CAST(c1 AS DOUBLE)/c0 FROM g
             |UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', c2,
             |       CAST(c2 AS DOUBLE)/c1, CAST(c2 AS DOUBLE)/c0 FROM g
             |ORDER BY stage_idx""".stripMargin)),

    // --- retention triangle normalized by cohort size (the e05 counts
    //     as rates; exact-count division, no rounding)
    ("e16_retention_rates",
      (s, dir) => Sessionize.retentionRates(evts(s, dir))
        .withColumn("cohort_day", col("cohort_day").cast("string"))
        .orderBy("cohort_day", "day_offset"),
      Some("""WITH e0 AS (
             |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
             |d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM e0),
             |f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1),
             |c AS (SELECT f.cohort_day,
             |        CAST(d.day - f.cohort_day AS BIGINT) AS day_offset,
             |        count(*) AS n_users
             |      FROM d JOIN f USING (user_id) GROUP BY 1, 2),
             |b AS (SELECT cohort_day, n_users AS base FROM c
             |      WHERE day_offset = 0)
             |SELECT CAST(c.cohort_day AS VARCHAR) AS cohort_day, day_offset,
             |       c.n_users,
             |       CAST(c.n_users AS DOUBLE) / CAST(b.base AS DOUBLE)
             |         AS retention
             |FROM c JOIN b USING (cohort_day)
             |ORDER BY cohort_day, day_offset""".stripMargin)),

    // --- near-dup cluster size profile: how much of the corpus sits in
    //     clusters of each size (the dedup-savings estimate) — composes
    //     the d06 components into a histogram
    ("d16_cluster_profile",
      (s, dir) => {
        val pairs = Dedup.minhashLshPairs(docs(s, dir), "text", "doc_id",
          n = 3, k = 128, bands = 32, threshold = 0.8)
        val cc = Dedup.connectedComponents(pairs)
        cc.groupBy(col("component"))
          .agg(count(lit(1)).as("cluster_size"))
          .groupBy(col("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"))
          .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
          .orderBy("cluster_size")
      },
      Some(clusterProfileOracle)),

    // --- binary payload audit (multimodal plumbing: content-hash dedup key)
    ("m01_payload_audit",
      (s, dir) => Multimodal.payloadAudit(
          docs(s, dir).select(col("doc_id"),
            encode(col("text"), "UTF-8").as("payload")),
          "payload", "doc_id")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, octet_length(encode(text)) AS byte_len,
             |       sha256(text) AS content_hash
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // --- decode-batch planning: payloads packed into ~8 KiB decode
    //     batches per source shard by running byte offset (start-offset
    //     binning, the t06 packing scheme on bytes)
    // --- reciprocal-rank fusion of a sparse (BM25, more-like-this on
    //     the document's own text) and a dense (exact cosine) run into
    //     one hybrid ranking — both runs AND the fusion arithmetic
    //     mirrored in SQL
    ("s17_rrf_fusion",
      (s, dir) => {
        val d = docs(s, dir)
        val sparse = Retrieval.bm25TopK(d,
            d.where(col("doc_id") < 8).select(col("doc_id"), col("text")),
            "text", "doc_id", "doc_id", "text", k = 10)
          .select(col("query_id"), col("doc_id"), col("rank"))
        val dense = Similarity.bruteForceTopK(embs(s, dir),
            embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
            k = 10)
          .select(col("query_id"), col("neighbor_id").as("doc_id"),
            col("rank"))
        Retrieval.rrfFuse(Seq(sparse, dense), k = 5)
          .orderBy("query_id", "rank")
      },
      Some(rrfFusionOracle)),

    // --- ranked-retrieval eval harness (MRR / nDCG@k against
    //     same-label qrels) — the relevance twin of s14's recall
    ("s18_retrieval_eval",
      (s, dir) => {
        val e = embs(s, dir)
        val run = Similarity.bruteForceTopK(e,
            e.where(col("vec_id") < 8), "embedding", "vec_id", k = 10)
          .select(col("query_id"), col("neighbor_id").as("doc_id"),
            col("rank"))
        val qrels = e.where(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("label"))
          .join(e.select(col("vec_id").as("doc_id"), col("label")),
            Seq("label"))
          .where(col("doc_id") =!= col("query_id"))
          .select(col("query_id"), col("doc_id"))
        Retrieval.retrievalMetrics(run, qrels, k = 10)
          .orderBy("query_id")
      },
      Some(retrievalEvalOracle)),

    // --- MMR diversified re-rank (λ = 0.7, 8 candidates → 3 picks):
    //     the greedy steps unroll into the SQL mirror, so every pick
    //     and every score is value-checked
    ("s19_mmr_rerank",
      (s, dir) => Similarity.mmrRerankTopK(embs(s, dir),
          embs(s, dir).where(col("vec_id") < 4), "embedding", "vec_id",
          k = 3, nCandidates = 8, lambda = 0.7)
        .orderBy("query_id", "step"),
      Some(mmrRerankOracle)),

    ("m02_decode_batches",
      (s, dir) => Multimodal.decodeBatchPlan(
          docs(s, dir).select(col("doc_id"), col("source"),
            encode(col("text"), "UTF-8").as("payload")),
          "payload", "doc_id", "source", maxBatchBytes = 8192)
        .orderBy("source", "doc_id"),
      Some("""WITH b AS (
             |  SELECT source, doc_id,
             |         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |         sum(octet_length(encode(text))) OVER
             |           (PARTITION BY source ORDER BY doc_id
             |            ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM documents)
             |SELECT source, doc_id, byte_len,
             |       CAST(floor((cum - byte_len) / 8192.0) AS BIGINT)
             |         AS batch_id
             |FROM b ORDER BY source, doc_id""".stripMargin)),

    // --- curation frontier: survivors per quality-threshold decile
    //     (one scoring pass, in-row threshold expansion)
    ("p16_curation_frontier",
      (s, dir) => Pipeline.curationFrontier(docs(s, dir))
        .orderBy("threshold"),
      Some(s"""WITH h AS (
             |  $sqlTextFeatures),
             |q AS (SELECT $sqlQuality AS q, n_tok FROM h),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS nd,
             |        CAST(sum(n_tok) AS BIGINT) AS nt FROM q),
             |x AS (SELECT i / 10.0 AS threshold, q.n_tok
             |      FROM q, unnest(range(1, 10)) AS u(i)
             |      WHERE q.q >= i / 10.0),
             |agg AS (SELECT threshold, count(*) AS n_docs,
             |          CAST(sum(n_tok) AS BIGINT) AS n_tokens
             |        FROM x GROUP BY threshold),
             |spine AS (SELECT i / 10.0 AS threshold
             |          FROM unnest(range(1, 10)) AS u(i))
             |SELECT s.threshold,
             |       coalesce(agg.n_docs, 0) AS n_docs,
             |       coalesce(agg.n_tokens, 0) AS n_tokens,
             |       round(CAST(coalesce(agg.n_docs, 0) AS DOUBLE) / t.nd, 6)
             |         AS doc_frac,
             |       round(CAST(coalesce(agg.n_tokens, 0) AS DOUBLE) / t.nt, 6)
             |         AS token_frac
             |FROM spine s LEFT JOIN agg USING (threshold) CROSS JOIN t
             |ORDER BY s.threshold""".stripMargin)),

    // --- deterministic training-shard layout: hash shard + in-shard
    //     position, one hash shuffle, NO global sort
    ("p12_shard_layout",
      (s, dir) => Pipeline.shardLayout(
          docs(s, dir).select(col("doc_id"), col("lang")), "doc_id", 8)
        .select(col("doc_id"), col("lang"), col("shard").cast("long").as("shard"),
          col("pos"))
        .orderBy("doc_id"),
      Some("""WITH h AS (
             |  SELECT doc_id, lang,
             |    (doc_id * 2654435761) % 1000000007 AS hh
             |  FROM documents)
             |SELECT doc_id, lang, CAST(hh % 8 AS BIGINT) AS shard,
             |  CAST(row_number() OVER (PARTITION BY hh % 8
             |    ORDER BY hh, doc_id) - 1 AS BIGINT) AS pos
             |FROM h ORDER BY doc_id""".stripMargin)),

    // --- sequence-length bucketed batch assembly with pad-waste ledger
    ("p13_length_buckets",
      (s, dir) => Pipeline.lengthBucketBatches(docs(s, dir), "doc_id",
          "text", boundaries = Seq(16, 32, 64, 128, 256, 512, 1024),
          batchSize = 16)
        .orderBy("bucket", "batch_id"),
      Some("""WITH k AS (
             |  SELECT doc_id,
             |    CASE WHEN trim(text) = '' THEN 0
             |         ELSE len(string_split_regex(trim(text), '\s+')) END
             |      AS n_tokens
             |  FROM documents),
             |b AS (SELECT doc_id, n_tokens,
             |    CAST(CASE WHEN n_tokens <= 16 THEN 16
             |         WHEN n_tokens <= 32 THEN 32
             |         WHEN n_tokens <= 64 THEN 64
             |         WHEN n_tokens <= 128 THEN 128
             |         WHEN n_tokens <= 256 THEN 256
             |         WHEN n_tokens <= 512 THEN 512
             |         WHEN n_tokens <= 1024 THEN 1024
             |         ELSE 2048 END AS BIGINT) AS bucket,
             |    (doc_id * 2654435761) % 1000000007 AS hh
             |  FROM k),
             |r AS (SELECT bucket, n_tokens,
             |    CAST(floor((row_number() OVER (PARTITION BY bucket
             |      ORDER BY hh, doc_id) - 1) / 16) AS BIGINT) AS batch_id
             |  FROM b)
             |SELECT bucket, batch_id, count(*) AS n_rows,
             |  CAST(max(n_tokens) AS BIGINT) AS max_tokens,
             |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
             |  CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT)
             |    AS pad_waste
             |FROM r GROUP BY 1, 2 ORDER BY bucket, batch_id""".stripMargin)),

    // --- incremental rollup maintenance: merge(rollup(history),
    //     rollup(delta)) vs the oracle's full recompute — proves the
    //     mergeable-state algebra the 100 TB metrics path relies on
    ("e21_merge_rollup",
      (s, dir) => {
        val e = evts(s, dir)
        val cut = lit("2024-01-25 00:00:00").cast("timestamp")
        val merged = Sessionize.mergeHourlyRollup(
          Sessionize.hourlyRollup(e.where(col("ts") < cut)),
          Sessionize.hourlyRollup(e.where(col("ts") >= cut)))
        merged.select(col("hour"), col("event_type"), col("n_events"),
            round(col("sum_value"), 6).as("sum_value"))
          .orderBy("hour", "event_type")
      },
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
             |       count(*) AS n_events, round(sum(value), 6) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)),

    // --- cross-source duplicate overlap matrix on 64-char prefix keys
    //     (shared boilerplate, the cross-crawl signal); in-row pair
    //     expansion from per-content source sets, no key self-join
    ("d17_source_overlap",
      (s, dir) => Dedup.sourceOverlap(docs(s, dir), "text", "source",
          prefixLen = 64)
        .orderBy("src_a", "src_b"),
      Some("""WITH k AS (
             |  SELECT DISTINCT source, md5(substr(text, 1, 64)) AS k
             |  FROM documents WHERE text IS NOT NULL),
             |s AS (SELECT source, count(*) AS n FROM k GROUP BY 1),
             |p AS (SELECT a.source AS src_a, b.source AS src_b,
             |             count(*) AS n_shared
             |      FROM k a JOIN k b ON a.k = b.k AND a.source < b.source
             |      GROUP BY 1, 2)
             |SELECT p.src_a, p.src_b, p.n_shared,
             |       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
             |       round(CAST(p.n_shared AS DOUBLE)
             |             / (sa.n + sb.n - p.n_shared), 6) AS jaccard
             |FROM p JOIN s sa ON sa.source = p.src_a
             |JOIN s sb ON sb.source = p.src_b
             |ORDER BY src_a, src_b""".stripMargin)),

    // --- exact heavy hitters with bounded sketch state (Misra-Gries
    //     candidates + broadcast-filtered exact recount); threshold-
    //     complete: every token over n/65 of the stream, no misses
    ("t31_heavy_hitters",
      (s, dir) => TextOps.heavyHitters(docs(s, dir), "text", capacity = 64)
        .orderBy("token"),
      Some("""WITH t AS (
             |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
             |  FROM documents WHERE trim(text) <> ''),
             |n AS (SELECT count(*) AS n FROM t)
             |SELECT token, count(*) AS cnt,
             |       CAST((SELECT n FROM n) AS BIGINT) AS n_total
             |FROM t GROUP BY 1
             |HAVING count(*) * 65 > (SELECT n FROM n)
             |ORDER BY token""".stripMargin)),

    // --- Z-order layout ledger: morton-interleaved (hour-of-day ×
    //     user bucket) sort, 1000-row files, min/max envelope per file
    //     (what footer-stats pruning would see after the rewrite)
    ("b01_zorder_layout",
      (s, dir) => {
        val e = evts(s, dir)
        Bucketing.zorderLayout(
            e.select(col("event_id"), hour(col("ts")).as("hod"),
              pmod(col("user_id"), lit(32)).cast("long").as("ub")),
            "hod", "ub", "event_id", bits = 5, rowsPerFile = 1000)
          .orderBy("file_id")
      },
      Some("""WITH e0 AS (
             |  SELECT event_id, EXTRACT(hour FROM ts) AS x,
             |         user_id % 32 AS y
             |  FROM events),
             |z AS (SELECT event_id, x, y,
             |    (x // 1) % 2 * 1 + (y // 1) % 2 * 2
             |  + (x // 2) % 2 * 4 + (y // 2) % 2 * 8
             |  + (x // 4) % 2 * 16 + (y // 4) % 2 * 32
             |  + (x // 8) % 2 * 64 + (y // 8) % 2 * 128
             |  + (x // 16) % 2 * 256 + (y // 16) % 2 * 512 AS zc
             |  FROM e0),
             |r AS (SELECT x, y,
             |    CAST(floor((row_number() OVER (ORDER BY zc, event_id) - 1)
             |      / 1000) AS BIGINT) AS file_id
             |  FROM z)
             |SELECT file_id, count(*) AS n_rows,
             |  CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
             |  CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
             |FROM r GROUP BY 1 ORDER BY file_id""".stripMargin)),

    // --- packed-sequence assembly map: t06's bins plus per-doc offsets
    //     (the block-diagonal attention-mask metadata, as rows)
    ("p15_pack_offsets",
      (s, dir) => Pipeline.packOffsets(docs(s, dir), "lang", "doc_id",
          budget = 2048)
        .orderBy("lang", "doc_id"),
      Some("""WITH b AS (
             |  SELECT lang, doc_id,
             |    CASE WHEN trim(text) = '' THEN 0
             |         ELSE len(string_split_regex(trim(text), '\s+')) END
             |      AS n_tokens,
             |    sum(CASE WHEN trim(text) = '' THEN 0
             |             ELSE len(string_split_regex(trim(text), '\s+')) END)
             |      OVER (PARTITION BY lang ORDER BY doc_id) AS cum
             |  FROM documents),
             |k AS (SELECT lang, doc_id, n_tokens,
             |        CAST(floor((cum - n_tokens) / 2048) AS BIGINT) AS bin_id
             |      FROM b)
             |SELECT lang, doc_id, bin_id,
             |       CAST(sum(n_tokens) OVER (PARTITION BY lang, bin_id
             |              ORDER BY doc_id) - n_tokens AS BIGINT) AS offset,
             |       n_tokens
             |FROM k ORDER BY lang, doc_id""".stripMargin)),

    // --- in-row token-entropy quality signal (no explode, no shuffle;
    //     low = repetitive boilerplate, high = hash-like noise)
    ("t32_token_entropy",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"),
          round(TextOps.tokenEntropy(col("text")), 6).as("entropy"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  round(CASE WHEN empty THEN 0.0 ELSE
             |    -list_sum(list_transform(list_distinct(tk),
             |      c -> (len(list_filter(tk, x -> x = c))
             |            / CAST(len(tk) AS DOUBLE))
             |        * ln(len(list_filter(tk, x -> x = c))
             |             / CAST(len(tk) AS DOUBLE)))) END, 6) AS entropy
             |FROM (SELECT doc_id, trim(text) = '' AS empty,
             |        string_split_regex(trim(text), '\s+') AS tk
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // --- blocked Levenshtein fuzzy pairs on 20-char prefixes; block =
    //     lang + first-2-chars (the standard ER blocking trade: a pair
    //     edited in its first 2 chars needs another blocking pass —
    //     loose lang-only blocking was 3.2M candidate pairs at sf0.1,
    //     this is ~107k); length-band prefilter before any DP
    ("d18_fuzzy_pairs",
      (s, dir) => Dedup.editDistancePairs(
          docs(s, dir).withColumn("blk",
            concat_ws(":", col("lang"), substring(col("text"), 1, 2))),
          "text", "doc_id", "blk", maxDist = 4, prefixLen = 20)
        .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
        .orderBy("id_a", "id_b"),
      Some("""WITH b AS (SELECT doc_id,
             |    lang || ':' || substr(text, 1, 2) AS blk,
             |    substr(text, 1, 20) AS p
             |  FROM documents WHERE text IS NOT NULL)
             |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
             |       levenshtein(a.p, c.p) AS dist
             |FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
             |WHERE abs(len(a.p) - len(c.p)) <= 4
             |  AND levenshtein(a.p, c.p) <= 4
             |ORDER BY id_a, id_b""".stripMargin)),

    // --- stride-scheduled source interleave: virtual time (i+1)/w_g
    //     per group, one global order at the target rates ('es'
    //     excluded — absent weights drop)
    ("p14_interleave",
      (s, dir) => Pipeline.interleaveSources(
          docs(s, dir).select(col("doc_id"), col("lang")), "doc_id", "lang",
          Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.1))
        .orderBy("order_pos"),
      Some("""WITH w(lang, w) AS (VALUES ('en', 0.5), ('de', 0.2),
             |    ('fr', 0.2), ('zh', 0.1)),
             |k AS (SELECT doc_id, d.lang, w.w,
             |        row_number() OVER (PARTITION BY d.lang
             |          ORDER BY (doc_id * 2654435761) % 1000000007, doc_id)
             |          / w.w AS vt
             |      FROM documents d JOIN w ON w.lang = d.lang)
             |SELECT doc_id, lang,
             |       CAST(row_number() OVER (ORDER BY vt, lang, doc_id) - 1
             |            AS BIGINT) AS order_pos
             |FROM k ORDER BY order_pos""".stripMargin)),

    // --- conversion-latency profile per funnel step (count, mean,
    //     exact median seconds; the SLA view of e04's funnel)
    ("e27_funnel_latency",
      (s, dir) => Sessionize.funnelLatency(evts(s, dir),
          Seq("view", "click", "purchase")),
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
             |v AS (SELECT user_id, min(ts) AS view_ts
             |      FROM e0 WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT v.user_id, v.view_ts,
             |        min(CASE WHEN e.ts > v.view_ts THEN e.ts END) AS click_ts
             |      FROM v LEFT JOIN e0 e
             |        ON e.user_id = v.user_id AND e.event_type = 'click'
             |      GROUP BY 1, 2),
             |p AS (SELECT c.user_id, c.view_ts, c.click_ts,
             |        min(CASE WHEN e.ts > c.click_ts THEN e.ts END)
             |          AS purchase_ts
             |      FROM c LEFT JOIN e0 e
             |        ON e.user_id = c.user_id AND e.event_type = 'purchase'
             |      GROUP BY 1, 2, 3),
             |s AS (
             |  SELECT 'view->click' AS step, 0 AS i,
             |         (epoch_us(click_ts) - epoch_us(view_ts)) / 1e6 AS sec
             |  FROM p WHERE click_ts IS NOT NULL
             |  UNION ALL
             |  SELECT 'click->purchase', 1,
             |         (epoch_us(purchase_ts) - epoch_us(click_ts)) / 1e6
             |  FROM p WHERE purchase_ts IS NOT NULL)
             |SELECT step, count(*) AS n_converted,
             |       round(avg(sec), 6) AS avg_sec,
             |       quantile_disc(sec, 0.5) AS p50_sec
             |FROM s GROUP BY step, i ORDER BY i""".stripMargin)),

    // --- FORWARD as-of: first purchase at/after each click (DuckDB
    //     ASOF with the comparison flipped); same merge-scan, reversed
    //     traversal
    ("e23_asof_forward",
      (s, dir) => {
        val e = evts(s, dir)
        val clicks = e.where(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val purchases = e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"), col("value"))
          .groupBy("user_id", "pts").agg(max("value").as("pval"))
        AsOf.asofJoin(clicks, purchases, Seq("user_id"), "ts", "pts",
            direction = "forward")
          .select(col("event_id"), col("user_id"), col("value"),
            col("pts"), col("pval"))
          .orderBy("event_id")
      },
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
             |c AS (SELECT event_id, user_id, ts, value
             |      FROM e0 WHERE event_type = 'click'),
             |p AS (SELECT user_id, ts AS pts, max(value) AS pval
             |      FROM e0 WHERE event_type = 'purchase'
             |      GROUP BY user_id, ts)
             |SELECT c.event_id, c.user_id, c.value, p.pts, p.pval
             |FROM c ASOF LEFT JOIN p
             |  ON c.user_id = p.user_id AND c.ts <= p.pts
             |ORDER BY c.event_id""".stripMargin)),

    // --- NEAREST as-of: closer of the preceding/following purchase,
    //     ties to the earlier row; oracle is the argmin theta form
    //     (fine at oracle scale; the engine stays merge-scan)
    ("e24_asof_nearest",
      (s, dir) => {
        val e = evts(s, dir)
        val clicks = e.where(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"), col("value"))
          .groupBy("user_id", "pts").agg(max("value").as("pval"))
        AsOf.asofJoin(clicks, purchases, Seq("user_id"), "ts", "pts",
            direction = "nearest")
          .select(col("event_id"), col("user_id"), col("pts"), col("pval"))
          .orderBy("event_id")
      },
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
             |c AS (SELECT event_id, user_id, ts
             |      FROM e0 WHERE event_type = 'click'),
             |p AS (SELECT user_id, ts AS pts, max(value) AS pval
             |      FROM e0 WHERE event_type = 'purchase'
             |      GROUP BY user_id, ts),
             |j AS (SELECT c.event_id, c.user_id, p.pts, p.pval,
             |        row_number() OVER (PARTITION BY c.event_id
             |          ORDER BY abs(epoch_us(c.ts) - epoch_us(p.pts)),
             |                   p.pts) AS rk
             |      FROM c JOIN p ON c.user_id = p.user_id)
             |SELECT c.event_id, c.user_id, j.pts, j.pval
             |FROM c LEFT JOIN (SELECT * FROM j WHERE rk = 1) j
             |  ON j.event_id = c.event_id
             |ORDER BY c.event_id""".stripMargin)),

    // --- last-touch attribution: each purchase credits the latest
    //     prior click within 2h (backward as-of + tolerance), campaign
    //     = click's k mod 4, unattributed bucket -1
    ("e25_attribution",
      (s, dir) => {
        val e = evts(s, dir)
        val purch = e.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val clicks = SemiStructured.parseJson(
            e.where(col("event_type") === "click"), "props", "k BIGINT")
          .select(col("user_id"), col("ts").as("cts"),
            pmod(col("k"), lit(4L)).as("campaign"))
          .groupBy("user_id", "cts").agg(max("campaign").as("campaign"))
        AsOf.asofJoin(purch, clicks, Seq("user_id"), "ts", "cts",
            toleranceSec = Some(7200L))
          .groupBy(coalesce(col("campaign"), lit(-1L)).as("campaign"))
          .agg(count(lit(1)).as("n_purchases"),
            round(sum(col("value")), 6).as("sum_value"))
          .orderBy("campaign")
      },
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
             |p AS (SELECT event_id, user_id, ts, value
             |      FROM e0 WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, ts AS cts,
             |        max(CAST(props->>'k' AS BIGINT) % 4) AS campaign
             |      FROM e0 WHERE event_type = 'click' GROUP BY 1, 2),
             |j AS (SELECT p.value, c.cts, c.campaign, p.ts
             |      FROM p ASOF LEFT JOIN c
             |        ON p.user_id = c.user_id AND p.ts >= c.cts),
             |a AS (SELECT CASE WHEN cts IS NOT NULL
             |          AND epoch_ms(ts) - epoch_ms(cts) <= 7200000
             |          THEN campaign ELSE -1 END AS campaign, value
             |      FROM j)
             |SELECT campaign, count(*) AS n_purchases,
             |       round(sum(value), 6) AS sum_value
             |FROM a GROUP BY 1 ORDER BY campaign""".stripMargin)),

    // --- linear multi-touch attribution: every click in the 2h window
    //     before a purchase shares its value equally (bucketed range
    //     join — no BNLJ; oracle is the naive theta form)
    ("e26_linear_attribution",
      (s, dir) => {
        val e = evts(s, dir)
        val purch = e.where(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"),
            (col("ts") - expr("INTERVAL 2 HOURS")).as("wst"),
            col("ts").as("wen"), col("value"))
        val clicks = SemiStructured.parseJson(
            e.where(col("event_type") === "click"), "props", "k BIGINT")
          .select(col("user_id"), col("ts").as("cts"),
            pmod(col("k"), lit(4L)).as("campaign"))
          .groupBy("user_id", "cts").agg(max("campaign").as("campaign"))
        val j = AsOf.rangeJoin(purch, clicks, Seq("user_id"),
          "wst", "wen", "cts", bucketWidthSec = 7200)
        val n = j.groupBy("p_id").agg(count(lit(1)).as("__n"))
        j.join(n, Seq("p_id"))
          .groupBy(col("campaign"))
          .agg(count(lit(1)).as("n_touches"),
            round(sum(col("value") / col("__n")), 6).as("attributed_value"))
          .orderBy("campaign")
      },
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
             |p AS (SELECT event_id AS pid, user_id, ts, value
             |      FROM e0 WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, ts AS cts,
             |        max(CAST(props->>'k' AS BIGINT) % 4) AS campaign
             |      FROM e0 WHERE event_type = 'click' GROUP BY 1, 2),
             |j AS (SELECT p.pid, p.value, c.campaign
             |      FROM p JOIN c ON p.user_id = c.user_id
             |        AND c.cts >= p.ts - INTERVAL 2 HOUR AND c.cts < p.ts),
             |n AS (SELECT pid, count(*) AS n FROM j GROUP BY 1)
             |SELECT campaign, count(*) AS n_touches,
             |       round(sum(value / n.n), 6) AS attributed_value
             |FROM j JOIN n USING (pid) GROUP BY 1
             |ORDER BY campaign""".stripMargin)),

    // --- byte-range chunk manifest for parallel range-read decode
    //     (metadata-only: computed from payload length, bytes unread)
    ("m03_chunk_manifest",
      (s, dir) => Multimodal.chunkManifest(
          docs(s, dir).select(col("doc_id"),
            encode(col("text"), "UTF-8").as("payload")),
          "payload", "doc_id", chunkBytes = 96)
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH b AS (
             |  SELECT doc_id,
             |         CAST(octet_length(encode(text)) AS BIGINT) AS n
             |  FROM documents),
             |c AS (SELECT doc_id, n,
             |        unnest(range(0, CAST(ceil(n / 96.0) AS BIGINT)))
             |          AS chunk_idx
             |      FROM b WHERE n > 0)
             |SELECT doc_id, chunk_idx, chunk_idx * 96 AS off,
             |       least(96, n - chunk_idx * 96) AS len
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // --- peak concurrent sessions per hour: the +1/-1 interval sweep
    //     as a distributed prefix sum (per-hour carry-in, so no ordered
    //     window ever sees more than one hour of deltas); oracle is the
    //     single global running sum
    ("e22_concurrency",
      (s, dir) => {
        val sess = Sessionize.batch(evts(s, dir), gapMinutes = 30)
        Sessionize.peakConcurrency(sess, "session_start", "session_end",
            "user_id")
          .orderBy("hour")
      },
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
             |e AS (
             |  SELECT *, lag(ts) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM e0),
             |f AS (SELECT *, CASE WHEN prev IS NULL
             |        OR epoch_ms(ts) - epoch_ms(prev) > 1800000
             |        THEN 1 ELSE 0 END AS ns FROM e),
             |g AS (SELECT *, sum(ns) OVER
             |        (PARTITION BY user_id ORDER BY ts, event_id)
             |        AS session_id
             |      FROM f),
             |sess AS (SELECT user_id, session_id, min(ts) AS st,
             |                max(ts) AS en
             |         FROM g GROUP BY 1, 2),
             |d AS (SELECT st AS ts, 1 AS delta FROM sess
             |      UNION ALL SELECT en, -1 FROM sess),
             |r AS (SELECT ts, delta,
             |        sum(delta) OVER (ORDER BY ts, delta DESC
             |          ROWS UNBOUNDED PRECEDING) AS run
             |      FROM d)
             |SELECT date_trunc('hour', ts) AS hour,
             |       CAST(max(run) AS BIGINT) AS peak_concurrent
             |FROM r GROUP BY 1 ORDER BY hour""".stripMargin)),

    // --- top-principal-component projection via 2 rounded power
    //     iterations (no covariance matrix; iterate pinned at 1e-6 so
    //     the SQL oracle reproduces the projection exactly)
    ("s20_pca_project",
      (s, dir) => Similarity.topPcProjection(embs(s, dir), "embedding",
          "vec_id", iterations = 2)
        .orderBy("vec_id"),
      Some("""WITH x AS (SELECT vec_id,
             |    generate_subscripts(embedding, 1) AS i,
             |    CAST(unnest(embedding) AS DOUBLE) AS v
             |  FROM embeddings),
             |mu AS (SELECT i, avg(v) AS m FROM x GROUP BY i),
             |xc AS (SELECT vec_id, x.i AS i, x.v - mu.m AS v
             |       FROM x JOIN mu ON x.i = mu.i),
             |d1 AS (SELECT vec_id, sum(v * 0.125) AS d FROM xc GROUP BY 1),
             |s1 AS (SELECT i, sum(xc.v * d1.d) AS s
             |       FROM xc JOIN d1 USING (vec_id) GROUP BY i),
             |v1 AS (SELECT i, round(s / (SELECT sqrt(sum(s * s)) FROM s1),
             |                       6) AS v
             |       FROM s1),
             |d2 AS (SELECT xc.vec_id, sum(xc.v * v1.v) AS d
             |       FROM xc JOIN v1 USING (i) GROUP BY 1),
             |s2 AS (SELECT i, sum(xc.v * d2.d) AS s
             |       FROM xc JOIN d2 USING (vec_id) GROUP BY i),
             |v2 AS (SELECT i, round(s / (SELECT sqrt(sum(s * s)) FROM s2),
             |                       6) AS v
             |       FROM s2)
             |SELECT xc.vec_id, round(sum(xc.v * v2.v), 6) AS pc1
             |FROM xc JOIN v2 USING (i) GROUP BY xc.vec_id
             |ORDER BY vec_id""".stripMargin)),

    // --- stationary distribution of the event-type Markov chain:
    //     per-user lead() transitions → row-stochastic P → 3 unrolled
    //     power-iteration rounds with L1 renormalization
    ("e28_markov_stationary",
      (s, dir) => Sessionize.markovStationary(evts(s, dir), iterations = 3)
        .select(col("event_type"), round(col("pi"), 6).as("pi"))
        .orderBy("event_type"),
      Some(markovOracle)),

    // --- Pareto / ABC value-concentration analysis over event types
    ("e29_abc_pareto",
      (s, dir) => Sessionize.paretoAbc(evts(s, dir))
        .select(col("event_type"), col("n_events"),
          round(col("total_value"), 6).as("total_value"),
          round(col("share"), 6).as("share"),
          round(col("cum_share"), 6).as("cum_share"), col("abc_class"))
        .orderBy("event_type"),
      Some("""WITH t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |            sum(value) AS tv FROM events GROUP BY 1),
             |g AS (SELECT sum(tv) AS g FROM t),
             |c AS (SELECT event_type, n_events, tv, tv / g.g AS share,
             |        sum(tv / g.g) OVER (ORDER BY tv DESC, event_type
             |          ROWS UNBOUNDED PRECEDING) AS cum
             |      FROM t CROSS JOIN g)
             |SELECT event_type, n_events, round(tv, 6) AS total_value,
             |       round(share, 6) AS share, round(cum, 6) AS cum_share,
             |       CASE WHEN round(cum, 9) <= 0.8 THEN 'A'
             |            WHEN round(cum, 9) <= 0.95 THEN 'B' ELSE 'C'
             |       END AS abc_class
             |FROM c ORDER BY event_type""".stripMargin)),

    // --- Gopher structural quality gate (per-rule metrics + pass)
    ("t34_gopher_rules",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), TextOps.gopherGate(col("text")).as("__g"))
        .select(col("doc_id"), col("__g.n_words").as("n_words"),
          round(col("__g.mean_word_len"), 6).as("mean_word_len"),
          round(col("__g.bullet_ratio"), 6).as("bullet_ratio"),
          round(col("__g.ellipsis_ratio"), 6).as("ellipsis_ratio"),
          round(col("__g.symbol_ratio"), 6).as("symbol_ratio"),
          round(col("__g.alpha_ratio"), 6).as("alpha_ratio"),
          col("__g.n_stop_distinct").as("n_stop_distinct"),
          col("__g.pass").as("pass"))
        .orderBy("doc_id"),
      Some(gopherOracle)),

    // --- encoding-damage fingerprint; the corpus is clean ASCII, so
    //     damage is INJECTED deterministically by doc_id residue (the
    //     same injection on both sides) to exercise every counter
    ("t35_mojibake",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0,
            regexp_replace(col("text"), "e", "Ã©"))
          .when(col("doc_id") % 11 === 3,
            regexp_replace(col("text"), "a", "�"))
          .when(col("doc_id") % 13 === 5,
            concat(col("text"), lit("\u0007"))).otherwise(col("text"))
            .as("__t"))
        .select(col("doc_id"), TextOps.mojibakeStats(col("__t")).as("__m"))
        .select(col("doc_id"), col("__m.n_replacement").as("n_replacement"),
          col("__m.n_ctrl").as("n_ctrl"),
          col("__m.n_mojibake").as("n_mojibake"),
          round(col("__m.nonascii_ratio"), 6).as("nonascii_ratio"),
          col("__m.suspect").as("suspect"))
        .orderBy("doc_id"),
      Some(mojibakeOracle)),

    // --- lexical diversity: TTR, hapax fraction, Yule's K per doc
    ("t36_lexical_diversity",
      (s, dir) => TextOps.lexicalDiversity(docs(s, dir), "text")
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          col("n_hapax"), round(col("ttr"), 6).as("ttr"),
          round(col("hapax_frac"), 6).as("hapax_frac"),
          round(col("yule_k"), 6).as("yule_k"))
        .orderBy("doc_id"),
      Some(lexicalDiversityOracle)),

    // --- curriculum phases: exact global quartile cutpoints of the
    //     Flesch score, map-side assignment, per-phase summary
    ("p17_curriculum",
      (s, dir) => {
        val scored = docs(s, dir)
          .withColumn("__d", TextOps.fleschScore(col("text")))
        Pipeline.curriculumAssign(scored, "__d", nPhases = 4)
          .groupBy(col("phase"))
          .agg(count(lit(1)).as("n_docs"),
            round(min(col("__d")), 6).as("min_score"),
            round(max(col("__d")), 6).as("max_score"))
          .orderBy("phase")
      },
      Some(curriculumOracle)),

    // --- water-filling token-budget allocation across languages
    //     (α=0.2 flattened shares, 1.2-epoch cap, 2 unrolled fill
    //     rounds — small languages cap, surplus flows to 'en')
    ("p18_token_budget",
      (s, dir) => Pipeline.tokenBudgetFill(docs(s, dir), "lang", "text",
          budget = 30000.0, alpha = 0.2, maxEpochs = 1.2, rounds = 2)
        .select(col("lang"), col("avail_tokens"),
          round(col("share"), 6).as("share"),
          round(col("alloc_tokens"), 6).as("alloc_tokens"),
          round(col("epochs"), 6).as("epochs"), col("capped"))
        .orderBy("lang"),
      Some(tokenBudgetOracle)),

    // --- cosine radius search (data-driven answer size; queries
    //     broadcast, corpus streams once, pure map-filter)
    ("s24_range_search",
      (s, dir) => Similarity.rangeSearch(embs(s, dir),
          embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
          threshold = 0.25)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("query_id", "neighbor_id"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings)
             |SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |       round(list_dot_product(q.v, c.v) /
             |         (sqrt(list_dot_product(q.v, q.v)) *
             |          sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
             |FROM e q, e c
             |WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
             |  AND list_dot_product(q.v, c.v) /
             |        (sqrt(list_dot_product(q.v, q.v)) *
             |         sqrt(list_dot_product(c.v, c.v))) >= 0.25
             |ORDER BY query_id, neighbor_id""".stripMargin)),

    // --- overlapping decode segments (Whisper-style win/hop schedule;
    //     fake 1 byte = 1 ms codec contract, metadata-only)
    ("m04_segment_plan",
      (s, dir) => Multimodal.segmentPlan(
          docs(s, dir).select(col("doc_id"),
            encode(col("text"), "UTF-8").as("payload")),
          "payload", "doc_id", winMs = 400L, hopMs = 250L)
        .orderBy("doc_id", "seg_idx"),
      Some("""WITH b AS (SELECT doc_id,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS dur
             |  FROM documents WHERE octet_length(encode(text)) > 0),
             |s AS (SELECT doc_id, dur,
             |    unnest(range(0, (dur - 1) // 250 + 1)) AS seg_idx FROM b)
             |SELECT doc_id, CAST(seg_idx AS BIGINT) AS seg_idx,
             |       CAST(seg_idx * 250 AS BIGINT) AS start_ms,
             |       CAST(least(seg_idx * 250 + 400, dur) AS BIGINT) AS end_ms
             |FROM s ORDER BY doc_id, seg_idx""".stripMargin)),

    // --- CDC merge: latest-wins upsert/delete change feed applied to
    //     the documents snapshot (updates, a later overriding update,
    //     deletes, and inserts — all derived deterministically)
    ("e30_cdc_merge",
      (s, dir) => {
        val d = docs(s, dir)
        val u1 = d.where(col("doc_id") % 10 === 1)
          .withColumn("lang", lit("xx"))
          .withColumn("op", lit("U")).withColumn("seq", lit(1L))
        val u2 = d.where(col("doc_id") % 20 === 1)
          .withColumn("lang", lit("yy"))
          .withColumn("op", lit("U")).withColumn("seq", lit(2L))
        val del = d.where(col("doc_id") % 10 === 2)
          .withColumn("op", lit("D")).withColumn("seq", lit(1L))
        val ins = d.where(col("doc_id") % 50 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("op", lit("U")).withColumn("seq", lit(1L))
        ChangeData.applyChangeFeed(d,
            u1.unionByName(u2).unionByName(del).unionByName(ins),
            "doc_id", "seq")
          .orderBy("doc_id")
      },
      Some("""WITH ch AS (
             |  SELECT doc_id, text, 'xx' AS lang, source, n_chars,
             |         'U' AS op, 1 AS seq
             |  FROM documents WHERE doc_id % 10 = 1
             |  UNION ALL
             |  SELECT doc_id, text, 'yy', source, n_chars, 'U', 2
             |  FROM documents WHERE doc_id % 20 = 1
             |  UNION ALL
             |  SELECT doc_id, text, lang, source, n_chars, 'D', 1
             |  FROM documents WHERE doc_id % 10 = 2
             |  UNION ALL
             |  SELECT doc_id + 1000000, text, lang, source, n_chars, 'U', 1
             |  FROM documents WHERE doc_id % 50 = 0),
             |w AS (SELECT * FROM
             |        (SELECT *, row_number() OVER
             |           (PARTITION BY doc_id ORDER BY seq DESC) AS r FROM ch)
             |      WHERE r = 1),
             |kept AS (SELECT d.* FROM documents d
             |         LEFT JOIN w ON d.doc_id = w.doc_id
             |         WHERE w.doc_id IS NULL)
             |SELECT doc_id, text, lang, source, n_chars FROM kept
             |UNION ALL
             |SELECT doc_id, text, lang, source, n_chars FROM w
             |WHERE op <> 'D'
             |ORDER BY doc_id""".stripMargin)),

    // --- one-sided CUSUM changepoints on daily counts per event type
    //     (the prefix-sum-minus-running-min formulation — both
    //     cumulative windows, no recursion)
    ("e31_cusum",
      (s, dir) => Sessionize.cusumChangepoints(evts(s, dir))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("n_events"),
          round(col("cusum"), 6).as("cusum"), col("alarm"))
        .orderBy("event_type", "day"),
      Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |            CAST(count(*) AS DOUBLE) AS n
             |           FROM events GROUP BY 1, 2),
             |st AS (SELECT event_type, avg(n) AS mu,
             |         coalesce(stddev_pop(n), 0) AS sd FROM d GROUP BY 1),
             |p AS (SELECT d.event_type, d.day, d.n, st.sd,
             |        sum(d.n - st.mu - 0.5 * st.sd) OVER
             |          (PARTITION BY d.event_type ORDER BY d.day
             |           ROWS UNBOUNDED PRECEDING) AS pp
             |      FROM d JOIN st USING (event_type)),
             |c AS (SELECT event_type, day, n, sd,
             |        pp - least(min(pp) OVER
             |          (PARTITION BY event_type ORDER BY day
             |           ROWS UNBOUNDED PRECEDING), 0) AS cusum
             |      FROM p)
             |SELECT event_type, CAST(day AS VARCHAR) AS day,
             |       CAST(n AS BIGINT) AS n_events,
             |       round(cusum, 6) AS cusum, cusum > 4.0 * sd AS alarm
             |FROM c ORDER BY event_type, day""".stripMargin)),

    // --- sign-bit (1-bit) quantized ANN: Hamming shortlist over sign
    //     bitmaps, exact-cosine rerank — the binary-quantization mode;
    //     every stage SQL-mirrorable
    ("s25_binary_hamming",
      (s, dir) => Similarity.binaryHammingTopK(embs(s, dir),
          embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
          k = 5, nCandidates = 32)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          col("hamming"), round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("query_id", "rank"),
      Some(binaryHammingOracle)),

    // --- curation attrition funnel: ordered quality gates, cumulative
    //     survivors (docs + tokens) from ONE corpus pass
    ("p19_attrition",
      (s, dir) => {
        val t = col("text")
        Pipeline.curationAttrition(docs(s, dir), TextOps.tokenCount(t), Seq(
            "min_tokens" -> (TextOps.tokenCount(t) >= 20),
            "lang_known" -> (TextOps.langId(t) =!= lit("und")),
            "quality" -> (TextOps.qualityScore(t, col("n_chars")) >= 0.45),
            "not_code" -> !TextOps.isCode(t)))
          .select(col("stage"), col("gate"), col("n_docs"), col("n_tokens"),
            round(col("doc_frac"), 6).as("doc_frac"),
            round(col("token_frac"), 6).as("token_frac"))
          .orderBy("stage")
      },
      Some(attritionOracle)),

    // --- median/MAD robust outlier scores per event type (Hampel
    //     z-scores; exact discrete medians both passes)
    ("e32_mad_outliers",
      (s, dir) => Pipeline.madOutliers(evts(s, dir), "event_type", "value")
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("robust_z"), 6).as("robust_z"), col("is_outlier"))
        .orderBy("event_id"),
      Some("""WITH m AS (SELECT event_type, quantile_disc(value, 0.5) AS med
             |           FROM events GROUP BY 1),
             |j AS (SELECT e.event_id, e.event_type, e.value, m.med
             |      FROM events e JOIN m USING (event_type)),
             |md AS (SELECT event_type,
             |         quantile_disc(abs(value - med), 0.5) AS mad
             |       FROM j GROUP BY 1),
             |x AS (SELECT j.event_id, j.event_type, j.value, j.med, md.mad
             |      FROM j JOIN md USING (event_type))
             |SELECT event_id, event_type, value,
             |  round(CASE WHEN mad = 0 THEN 0.0
             |        ELSE (value - med) / (1.4826 * mad) END, 6) AS robust_z,
             |  CASE WHEN mad = 0 THEN false
             |       ELSE abs((value - med) / (1.4826 * mad)) > 3.5
             |  END AS is_outlier
             |FROM x ORDER BY event_id""".stripMargin)),

    // --- bot detection by inter-event gap regularity (metronome CV)
    ("e33_bot_score",
      (s, dir) => Sessionize.botScores(evts(s, dir))
        .select(col("user_id"), col("n_events"),
          round(col("mean_gap_ms"), 6).as("mean_gap_ms"),
          round(col("gap_cv"), 6).as("gap_cv"), col("is_bot"))
        .orderBy("user_id"),
      Some("""WITH g AS (SELECT user_id, event_id,
             |    CAST(epoch_ms(ts) - lag(epoch_ms(ts)) OVER
             |      (PARTITION BY user_id ORDER BY ts, event_id)
             |      AS DOUBLE) AS gap
             |  FROM events),
             |a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |        avg(gap) AS mg, coalesce(stddev_pop(gap), 0) AS sd
             |      FROM g GROUP BY 1)
             |SELECT user_id, n_events, round(mg, 6) AS mean_gap_ms,
             |  round(CASE WHEN mg IS NULL OR mg = 0 THEN 0.0
             |        ELSE sd / mg END, 6) AS gap_cv,
             |  (n_events >= 20 AND
             |   (CASE WHEN mg IS NULL OR mg = 0 THEN 0.0
             |         ELSE sd / mg END) <= 0.5) AS is_bot
             |FROM a ORDER BY user_id""".stripMargin)),

    // --- per-dimension corpus standardization (z-scored embeddings,
    //     flattened rows; zero-variance dims → 0)
    ("s26_standardize",
      (s, dir) => Similarity.standardizeDims(embs(s, dir), "embedding",
          "vec_id")
        .where(col("vec_id") < 25)
        .select(col("vec_id"), col("dim"), round(col("z"), 6).as("z"))
        .orderBy("vec_id", "dim"),
      Some("""WITH x AS (SELECT vec_id,
             |    CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
             |    CAST(unnest(embedding) AS DOUBLE) AS v
             |  FROM embeddings),
             |st AS (SELECT dim, avg(v) AS mu,
             |         coalesce(stddev_pop(v), 0) AS sd FROM x GROUP BY 1)
             |SELECT x.vec_id, x.dim,
             |  round(CASE WHEN st.sd = 0 THEN 0.0
             |        ELSE (x.v - st.mu) / st.sd END, 6) AS z
             |FROM x JOIN st USING (dim) WHERE vec_id < 25
             |ORDER BY vec_id, dim""".stripMargin)),

    // --- equi-width length histogram with zero-filled bins
    ("t37_length_histogram",
      (s, dir) => Pipeline.histogram(docs(s, dir), "n_chars", nBins = 20)
        .select(col("bin"), round(col("bin_lo"), 6).as("bin_lo"),
          round(col("bin_hi"), 6).as("bin_hi"), col("n_rows"))
        .orderBy("bin"),
      Some("""WITH mm AS (SELECT CAST(min(n_chars) AS DOUBLE) AS lo,
             |             CAST(max(n_chars) AS DOUBLE) AS hi FROM documents),
             |b AS (SELECT CASE WHEN mm.hi = mm.lo THEN 0
             |        ELSE least(CAST(floor((n_chars - mm.lo) /
             |               ((mm.hi - mm.lo) / 20.0)) AS BIGINT), 19)
             |      END AS bin
             |      FROM documents CROSS JOIN mm),
             |c AS (SELECT bin, CAST(count(*) AS BIGINT) AS n FROM b
             |      GROUP BY 1),
             |g AS (SELECT unnest(range(0, 20)) AS bin)
             |SELECT g.bin AS bin,
             |  round(mm.lo + g.bin * (mm.hi - mm.lo) / 20.0, 6) AS bin_lo,
             |  round(mm.lo + (g.bin + 1) * (mm.hi - mm.lo) / 20.0, 6)
             |    AS bin_hi,
             |  coalesce(c.n, 0) AS n_rows
             |FROM g CROSS JOIN mm LEFT JOIN c ON g.bin = c.bin
             |ORDER BY bin""".stripMargin)),

    // --- skew-salted join: hot supplier keys spread over 8 salt
    //     sub-partitions; the result is pinned to the PLAIN join (the
    //     oracle) because salts affect placement, never matching
    ("b02_salted_join",
      (s, dir) => {
        val li = graft.cypher.GraphCatalog
          .cachedParquet(s, s"$dir/lineitem.parquet")
          .select(col("l_suppkey").as("suppkey"), col("l_extendedprice"),
            col("l_linenumber"))
        val sup = graft.cypher.GraphCatalog
          .cachedParquet(s, s"$dir/supplier.parquet")
          .select(col("s_suppkey").as("suppkey"), col("s_name"))
        Bucketing.saltedJoin(li, sup, "suppkey", salts = 8,
            saltExpr = col("l_linenumber"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice")), 2).as("revenue"))
          .orderBy("s_name")
      },
      Some("""SELECT s_name, CAST(count(*) AS BIGINT) AS n_items,
             |       round(sum(l_extendedprice), 2) AS revenue
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY 1 ORDER BY s_name""".stripMargin)),

    // --- bucketed co-location END-TO-END (round 10): write both
    //     sides bucketed+sorted on the join key (one shuffle each,
    //     once), then the repeated join is exchange-free by
    //     construction (zero-Exchange plan-asserted in BucketingSpec);
    //     the RESULT is oracled against the plain SQL join — layout
    //     changes the plan, never the answer
    // --- persisted IVF index probe (round 10): the corpus written
    //     PARTITIONED BY inverted-list id, probes pushed as a static
    //     partition-column isin (PartitionFilters prune unprobed list
    //     directories — plan-asserted in SimilaritySpec). Same
    //     centroids as s03 ⇒ the probe result is VALUE-IDENTICAL to
    //     the in-memory path, so s03's oracle binds the persisted
    //     path end to end.
    ("s34_ivf_persisted",
      (s, dir) => {
        val cent = Similarity.seedCentroids(embs(s, dir), "embedding",
          "vec_id", 16)
        val path = java.nio.file.Files.createTempDirectory("s34_ivf").toString
        Similarity.writeIvfIndex(embs(s, dir), "embedding", "vec_id",
          cent, path)
        Similarity.ivfProbeIndex(s.read.parquet(path),
            embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
            k = 5, cent, nProbe = 6)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cos_sim"), 6).as("cos_sim"))
          .orderBy("query_id", "rank")
      },
      Some(ivfAnnOracle)),

    // --- incremental IVF append (round 10): build the index from the
    //     even-id half, APPEND the odd-id half with the ORIGINAL
    //     centroids (one pass over the batch; untouched lists'
    //     files untouched — asserted in SimilaritySpec), then probe.
    //     Old + new rows under one geometry ⇒ the probe sees the full
    //     corpus and s03's oracle binds the appended index too.
    ("s35_ivf_append",
      (s, dir) => {
        val all = embs(s, dir)
        val cent = Similarity.seedCentroids(all, "embedding", "vec_id", 16)
        val path = java.nio.file.Files.createTempDirectory("s35_ivf").toString
        Similarity.writeIvfIndex(all.where(col("vec_id") % 2 === 0),
          "embedding", "vec_id", cent, path)
        Similarity.appendIvfIndex(all.where(col("vec_id") % 2 === 1),
          "embedding", "vec_id", cent, path)
        Similarity.ivfProbeIndex(s.read.parquet(path),
            all.where(col("vec_id") < 8), "embedding", "vec_id",
            k = 5, cent, nProbe = 6)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cos_sim"), 6).as("cos_sim"))
          .orderBy("query_id", "rank")
      },
      Some(ivfAnnOracle)),

    ("b04_bucketed_join",
      (s, dir) => {
        val c = graft.cypher.GraphCatalog
          .cachedParquet(s, s"$dir/customer.parquet")
          .select(col("c_custkey").as("custkey"), col("c_nationkey"))
        val o = graft.cypher.GraphCatalog
          .cachedParquet(s, s"$dir/orders.parquet")
          .select(col("o_custkey").as("custkey"), col("o_totalprice"))
        Bucketing.writeBucketed(c, "graft_b04_cust", "custkey", 8)
        Bucketing.writeBucketed(o, "graft_b04_ords", "custkey", 8)
        Bucketing.joinBucketed(s, "graft_b04_cust", "graft_b04_ords",
            "custkey")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
             |       round(sum(o_totalprice), 2) AS total
             |FROM customer JOIN orders ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY c_nationkey""".stripMargin)),

    // --- compaction round-trip ledger (round 10): rewrite the
    //     documents dataset into size-targeted, doc_id-sorted files,
    //     then prove the rewrite LOSSLESS through the oracle — row
    //     count, distinct ids, id envelope and total text volume all
    //     survive the rewrite byte-exactly (file counts are covered
    //     by MaintenanceSpec; they are layout, not data)
    ("b05_compaction_ledger",
      (s, dir) => {
        val out = s"/tmp/graft_b05_compact_${dir.replaceAll("[^0-9a-zA-Z]", "_")}"
        Maintenance.compactParquet(s, s"$dir/documents.parquet", out,
          targetFileBytes = 256L << 10, sortCols = Seq("doc_id"))
        s.read.parquet(out).agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          sum(length(col("text"))).as("text_chars"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |       min(doc_id) AS min_id, max(doc_id) AS max_id,
             |       CAST(sum(length(text)) AS BIGINT) AS text_chars
             |FROM documents""".stripMargin)),

    // --- JSONL sink/source round-trip (round 10): write the corpus
    //     as bounded JSONL shards, read it back with an explicit
    //     schema, and prove the round-trip lossless through the
    //     oracle (newlines/quotes ride JSON escaping)
    ("b06_jsonl_roundtrip",
      (s, dir) => {
        val p = s"/tmp/graft_b06_jsonl_${dir.replaceAll("[^0-9a-zA-Z]", "_")}"
        SemiStructured.writeJsonl(
          docs(s, dir).select(col("doc_id"), col("lang"), col("text")),
          p, shards = 4)
        SemiStructured.readJsonl(s, p,
            "doc_id BIGINT, lang STRING, text STRING")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("text_chars"),
            countDistinct(col("doc_id")).as("n_ids"))
          .orderBy("lang")
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(length(text)) AS BIGINT) AS text_chars,
             |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids
             |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin)),

    // --- CSV sink/source round-trip (round 10): RFC 4180 quoting
    //     carries embedded quotes/newlines; read back with an explicit
    //     schema + multiLine, proven lossless through the oracle (the
    //     b06 JSONL twin for the tabular-export edge)
    ("b07_csv_roundtrip",
      (s, dir) => {
        val p = s"/tmp/graft_b07_csv_${dir.replaceAll("[^0-9a-zA-Z]", "_")}"
        SemiStructured.writeCsv(
          docs(s, dir).select(col("doc_id"), col("lang"), col("text")),
          p, shards = 4)
        SemiStructured.readCsv(s, p, "doc_id BIGINT, lang STRING, text STRING")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("text_chars"),
            countDistinct(col("doc_id")).as("n_ids"))
          .orderBy("lang")
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(length(text)) AS BIGINT) AS text_chars,
             |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids
             |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin)),

    // --- zero-init bias-corrected EWMA over per-type daily counts
    //     (closed-form prefix formulation — one cumulative window)
    ("e34_ewma",
      (s, dir) => Sessionize.ewmaDaily(evts(s, dir), alpha = 0.3)
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_events"), round(col("ewma"), 6).as("ewma"))
        .orderBy("event_type", "day"),
      Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |            CAST(count(*) AS BIGINT) AS n
             |           FROM events GROUP BY 1, 2),
             |k AS (SELECT event_type, day, n,
             |        CAST(row_number() OVER (PARTITION BY event_type
             |          ORDER BY day) AS DOUBLE) AS k FROM d),
             |c AS (SELECT event_type, day, n, k,
             |        sum(0.3 * CAST(n AS DOUBLE) / pow(0.7, k)) OVER
             |          (PARTITION BY event_type ORDER BY day
             |           ROWS UNBOUNDED PRECEDING) AS cc
             |      FROM k)
             |SELECT event_type, CAST(day AS VARCHAR) AS day,
             |       n AS n_events,
             |       round(pow(0.7, k) * cc / (1.0 - pow(0.7, k)), 6) AS ewma
             |FROM c ORDER BY event_type, day""".stripMargin)),

    // --- ShortCircuitExists THROUGH the gate (round 8): the Catalyst
    //     rule registers on the live session and rewrites
    //     size(filter(xs, f)) > 0 to exists(xs, f) — the query's
    //     VALUES then ride the rewritten plan against the SQL mirror
    //     (the plan-shape assert lives in PlanRulesSpec)
    ("t44_shortcircuit_exists",
      (s, dir) => {
        GraftExtensions.register(s)
        val toks = TextOps.tokens(col("text"))
        docs(s, dir).select(col("lang"),
            (size(filter(toks, t => length(t) > 8)) > 0).as("has_long"))
          .groupBy("lang")
          .agg(count(when(col("has_long"), 1)).as("n_with_long"),
            count(lit(1)).as("n_docs"))
          .orderBy("lang")
      },
      Some("""WITH t AS (SELECT lang,
             |    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
             |         ELSE string_split_regex(trim(text), '\s+') END AS tk
             |  FROM documents)
             |SELECT lang,
             |  count(*) FILTER (len(list_filter(tk, x -> length(x) > 8)) > 0)
             |    AS n_with_long,
             |  count(*) AS n_docs
             |FROM t GROUP BY 1 ORDER BY lang""".stripMargin)),

    // --- dataset card: the datasheet metrics table from one pass
    ("p20_dataset_card",
      (s, dir) => Pipeline.datasetCard(docs(s, dir)).orderBy("metric"),
      Some(datasetCardOracle)),

    // --- vocabulary coverage curve: corpus-token share covered by the
    //     top-k vocabulary at k ∈ {5, 10, 20} (tokenizer sizing; the
    //     fixture vocabulary is small — scale cutoffs with the corpus)
    ("t43_vocab_coverage",
      (s, dir) => {
        val freq = TextOps.tokenFrequencies(docs(s, dir), "text")
        val tot = freq.agg(sum(col("n")).as("__t"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("token"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val ranked = freq
          .withColumn("__rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("n").desc, col("token"))))
          .withColumn("__cum", sum(col("n")).over(w))
        ranked.where(col("__rk").isin(5, 10, 20))
          .crossJoin(broadcast(tot))
          .select(col("__rk").cast("long").as("vocab_size"),
            col("__cum").as("tokens_covered"),
            round(col("__cum").cast("double") / col("__t"), 6)
              .as("coverage"))
          .orderBy("vocab_size")
      },
      Some("""WITH t AS (SELECT doc_id,
             |    CASE WHEN trim(text) = '' THEN []
             |         ELSE string_split_regex(trim(text), '\s+') END AS tk
             |  FROM documents),
             |f AS (SELECT unnest(tk) AS token FROM t),
             |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM f
             |      GROUP BY 1),
             |g AS (SELECT sum(n) AS tot FROM c),
             |r AS (SELECT n,
             |    CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT)
             |      AS rk,
             |    sum(n) OVER (ORDER BY n DESC, token
             |      ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM c)
             |SELECT rk AS vocab_size, CAST(cum AS BIGINT) AS tokens_covered,
             |       round(CAST(cum AS DOUBLE) / g.tot, 6) AS coverage
             |FROM r CROSS JOIN g WHERE rk IN (5, 10, 20)
             |ORDER BY vocab_size""".stripMargin)),

    // --- valve advisory as data: recommended quadratic-operator caps
    //     read off a measured graphCard of the (lang → doc) hub graph —
    //     the sqrt(2E) rule and the 64E closure bound, SQL-mirrored
    ("g23_valve_advisory",
      (s, dir) => {
        import s.implicits._
        val e = docs(s, dir).select(col("lang").as("src"),
          col("doc_id").cast("string").as("dst"))
        val adv = GraphOps.valveAdvisory(
          GraphOps.graphCard(e, "src", "dst"))
        Seq((adv.nNodes, adv.nEdges, adv.observedMaxDegree,
            adv.maxDegree.map(_.toLong), adv.sccMaxClosureRows))
          .toDF("n_nodes", "n_edges", "observed_max_degree",
            "max_degree_cap", "scc_max_closure_rows")
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT lang AS src, CAST(doc_id AS VARCHAR) AS dst
             |  FROM documents WHERE lang IS NOT NULL AND doc_id IS NOT NULL),
             |v AS (SELECT CAST(count(*) AS BIGINT) AS nv
             |      FROM (SELECT src AS n FROM e UNION SELECT dst FROM e)),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS ne FROM e),
             |d AS (SELECT CAST(max(c) AS BIGINT) AS maxd
             |      FROM (SELECT count(*) AS c FROM e GROUP BY src))
             |SELECT v.nv AS n_nodes, m.ne AS n_edges,
             |       d.maxd AS observed_max_degree,
             |       CASE WHEN d.maxd > CAST(ceil(sqrt(2 * m.ne)) AS BIGINT)
             |            THEN CAST(ceil(sqrt(2 * m.ne)) AS BIGINT)
             |       END AS max_degree_cap,
             |       greatest(64 * m.ne, 16 * v.nv) AS scc_max_closure_rows
             |FROM v, m, d""".stripMargin)),

    // --- hub concentration: Gini of the co-supply degree distribution
    ("g22_degree_gini",
      (s, dir) => {
        val e = coSupplyEdges(s, dir).distinct()
        val deg = e.select(col("s1").as("node"))
          .union(e.select(col("s2").as("node")))
          .groupBy("node").agg(count(lit(1)).cast("double").as("d"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("d"), col("node"))
        deg.withColumn("__r", row_number().over(w).cast("double"))
          .agg(count(lit(1)).as("n_nodes"), sum(col("d")).as("__sd"),
            sum(col("__r") * col("d")).as("__srd"))
          .select(col("n_nodes"),
            round(lit(2.0) * col("__srd") /
              (col("n_nodes") * col("__sd")) -
              (col("n_nodes") + lit(1.0)) / col("n_nodes"), 6)
              .as("degree_gini"))
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sid
             |            FROM lineitem WHERE l_quantity >= 49),
             |e AS (SELECT DISTINCT a.sid AS s1, b.sid AS s2
             |      FROM ps a JOIN ps b ON a.p = b.p AND a.sid < b.sid),
             |deg AS (SELECT node, CAST(count(*) AS DOUBLE) AS d FROM
             |          (SELECT s1 AS node FROM e
             |           UNION ALL SELECT s2 FROM e)
             |        GROUP BY 1),
             |r AS (SELECT d, CAST(row_number() OVER (ORDER BY d, node)
             |        AS DOUBLE) AS rk FROM deg),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(d) AS sd,
             |        sum(rk * d) AS srd FROM r)
             |SELECT n AS n_nodes,
             |       round(2.0 * srd / (n * sd) - (n + 1.0) / n, 6)
             |         AS degree_gini
             |FROM s""".stripMargin)),

    // --- class-imbalance weights: label shares + effective number of
    //     samples (Cui et al. 2019) and the normalized loss weights
    ("p26_class_weights",
      (s, dir) => {
        val beta = 0.99
        val per = embs(s, dir).groupBy(col("label"))
          .agg(count(lit(1)).as("n"))
          .withColumn("eff_n",
            (lit(1.0) - pow(lit(beta), col("n"))) / lit(1.0 - beta))
          .withColumn("__raw", lit(1.0) / col("eff_n"))
        val tot = per.agg(sum(col("n")).as("__tn"), sum(col("__raw")).as("__tw"))
        per.crossJoin(broadcast(tot))
          .select(col("label"), col("n"),
            round(col("n").cast("double") / col("__tn"), 6).as("frac"),
            round(col("eff_n"), 6).as("eff_n"),
            round(col("__raw") / col("__tw"), 6).as("weight"))
          .orderBy("label")
      },
      Some("""WITH per AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
             |        (1.0 - pow(0.99, count(*))) / 0.01 AS eff_n
             |      FROM embeddings GROUP BY 1),
             |t AS (SELECT sum(n) AS tn, sum(1.0 / eff_n) AS tw FROM per)
             |SELECT label, n, round(CAST(n AS DOUBLE) / t.tn, 6) AS frac,
             |       round(eff_n, 6) AS eff_n,
             |       round((1.0 / eff_n) / t.tw, 6) AS weight
             |FROM per CROSS JOIN t ORDER BY label""".stripMargin)),

    // --- rich-club coefficient: connectedness among top-degree nodes
    ("g21_rich_club",
      (s, dir) => {
        // coSupplyEdges emits one row per SHARED PART — dedupe to the
        // simple graph before degree/edge counting (the mirror's
        // DISTINCT)
        val e = coSupplyEdges(s, dir).distinct().localCheckpoint(false)
        val deg = e.select(col("s1").as("node"))
          .union(e.select(col("s2").as("node")))
          .groupBy("node").agg(count(lit(1)).as("d"))
        Seq(4L, 8L, 16L).map { k =>
          val rich = deg.where(col("d") > k).select("node")
          val nR = rich.agg(count(lit(1)).as("n_rich"))
          val eR = e.join(rich.withColumnRenamed("node", "s1"), Seq("s1"),
              "left_semi")
            .join(rich.withColumnRenamed("node", "s2"), Seq("s2"),
              "left_semi")
            .agg(count(lit(1)).as("e_rich"))
          nR.crossJoin(eR).select(lit(k).as("k"), col("n_rich"),
            col("e_rich"),
            round(when(col("n_rich") < 2, lit(0.0))
              .otherwise(col("e_rich").cast("double") * 2.0 /
                (col("n_rich").cast("double") * (col("n_rich") - 1L))), 6)
              .as("phi"))
        }.reduce(_ unionAll _).orderBy("k")
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sid
             |            FROM lineitem WHERE l_quantity >= 49),
             |e AS (SELECT DISTINCT a.sid AS s1, b.sid AS s2
             |      FROM ps a JOIN ps b ON a.p = b.p AND a.sid < b.sid),
             |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM
             |          (SELECT s1 AS node FROM e
             |           UNION ALL SELECT s2 FROM e)
             |        GROUP BY 1),
             |ks AS (SELECT unnest([4, 8, 16]) AS k),
             |r AS (SELECT ks.k, deg.node FROM ks JOIN deg ON deg.d > ks.k),
             |nr AS (SELECT k, CAST(count(*) AS BIGINT) AS n_rich FROM r
             |       GROUP BY 1),
             |er AS (SELECT r1.k, CAST(count(*) AS BIGINT) AS e_rich
             |       FROM e JOIN r r1 ON r1.node = e.s1
             |       JOIN r r2 ON r2.node = e.s2 AND r2.k = r1.k
             |       GROUP BY 1)
             |SELECT CAST(nr.k AS BIGINT) AS k, nr.n_rich,
             |       coalesce(er.e_rich, 0) AS e_rich,
             |       round(CASE WHEN nr.n_rich < 2 THEN 0.0
             |             ELSE CAST(coalesce(er.e_rich, 0) AS DOUBLE) * 2.0
             |                  / (CAST(nr.n_rich AS DOUBLE)
             |                     * (nr.n_rich - 1)) END, 6) AS phi
             |FROM nr LEFT JOIN er ON nr.k = er.k
             |ORDER BY k""".stripMargin)),

    // --- lag-k autocorrelation of daily counts per type (k = 1..7)
    ("e49_acf",
      (s, dir) => {
        val daily = evts(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).cast("double").as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day"))
        // window lags materialize FIRST (a generator and a window can't
        // share one projection), then the in-row lag explode
        val withLags = daily.select(col("event_type"), col("day"), col("n"),
          array((1 to 7).map(k => struct(lit(k.toLong).as("k"),
            lag(col("n"), k).over(w).as("prev"))): _*).as("__ls"))
        withLags
          .select(col("event_type"), col("n"), explode(col("__ls")).as("__l"))
          .select(col("event_type"), col("__l.k").as("lag_k"),
            col("n"), col("__l.prev").as("prev"))
          .where(col("prev").isNotNull)
          .groupBy(col("event_type"), col("lag_k"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("n")).as("__sx"), sum(col("prev")).as("__sy"),
            sum(col("n") * col("prev")).as("__sxy"),
            sum(col("n") * col("n")).as("__sxx"),
            sum(col("prev") * col("prev")).as("__syy"))
          .select(col("event_type"), col("lag_k"), col("n_pairs"),
            round((col("n_pairs") * col("__sxy") -
              col("__sx") * col("__sy")) /
              sqrt((col("n_pairs") * col("__sxx") -
                col("__sx") * col("__sx")) *
                (col("n_pairs") * col("__syy") -
                  col("__sy") * col("__sy"))), 6).as("acf"))
          .orderBy("event_type", "lag_k")
      },
      Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |            CAST(count(*) AS DOUBLE) AS n
             |           FROM events GROUP BY 1, 2),
             |ks AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS k),
             |l AS (SELECT d.event_type, ks.k, d.n,
             |        lag(d.n, ks.k) OVER (PARTITION BY d.event_type, ks.k
             |          ORDER BY d.day) AS prev
             |      FROM d CROSS JOIN ks),
             |s AS (SELECT event_type, k, CAST(count(*) AS BIGINT) AS np,
             |        sum(n) AS sx, sum(prev) AS sy, sum(n*prev) AS sxy,
             |        sum(n*n) AS sxx, sum(prev*prev) AS syy
             |      FROM l WHERE prev IS NOT NULL GROUP BY 1, 2)
             |SELECT event_type, CAST(k AS BIGINT) AS lag_k, np AS n_pairs,
             |  round((np * sxy - sx * sy) /
             |    sqrt((np * sxx - sx * sx) * (np * syy - sy * sy)), 6)
             |    AS acf
             |FROM s ORDER BY event_type, lag_k""".stripMargin)),

    // ================================================================
    // STREAMING-PATH ORACLES (e50-e53): each query RUNS the streaming
    // twin (flatMapGroupsWithState / watermarked windows) over a
    // deterministic in-order batch replay (graft.streaming.Replay) and
    // faces the same DuckDB gate as everything else — the
    // batch-equivalence contract each twin carries makes the replayed
    // final output exactly the batch answer. Event timestamps truncate
    // to MILLISECONDS before feeding (the state machines keep epoch-ms;
    // parquet carries micros) and the oracles mirror with
    // date_trunc('milliseconds', ...).
    // ================================================================

    // --- streaming sessionize (append mode, event-time timeout): two
    //     far-future sentinel batches (user -1) advance the watermark
    //     and fire the timeouts so every real session closes
    ("e50_stream_sessionize",
      (s, dir) => {
        import s.implicits._
        val ev = evts(s, dir).where(col("user_id") < 30)
          .select(col("event_id"),
            timestamp_millis(unix_millis(col("ts"))).as("ts"),
            col("user_id"), col("event_type"), col("value"))
          .as[Sessionize.Event].collect()
          .sortBy(e => (e.ts.getTime, e.event_id)).toSeq
        val maxMs = ev.map(_.ts.getTime).max
        val day = 86400000L
        val sentinels = Seq(
          Seq(Sessionize.Event(-1L, new java.sql.Timestamp(maxMs + 3 * day),
            -1L, "view", 0.0)),
          Seq(Sessionize.Event(-2L, new java.sql.Timestamp(maxMs + 6 * day),
            -1L, "view", 0.0)))
        graft.streaming.Replay.run(s,
            graft.streaming.Replay.timeChunks(ev, 3) ++ sentinels, "append") {
          ds => Sessionize.streaming(
            ds.withWatermark("ts", "10 minutes"), gapMinutes = 30).toDF()
        }
          .where(col("user_id") >= 0)
          .select(col("user_id"), col("session_start"), col("session_end"),
            col("n_events"), round(col("sum_value"), 6).as("sum_value"))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (date_trunc('milliseconds',
             |    CAST(ts AS TIMESTAMP)) AS ts)
             |  FROM events WHERE user_id < 30),
             |e AS (
             |  SELECT *, lag(ts) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM e0),
             |f AS (SELECT *, CASE WHEN prev IS NULL
             |        OR epoch_ms(ts) - epoch_ms(prev) > 1800000
             |        THEN 1 ELSE 0 END AS ns FROM e),
             |g AS (SELECT *, sum(ns) OVER
             |        (PARTITION BY user_id ORDER BY ts, event_id)
             |        AS session_id
             |      FROM f)
             |SELECT user_id, min(ts) AS session_start,
             |       max(ts) AS session_end, count(*) AS n_events,
             |       round(sum(value), 6) AS sum_value
             |FROM g GROUP BY user_id, session_id
             |ORDER BY user_id, session_start""".stripMargin)),

    // --- streaming funnel (update mode): per-user stage times are
    //     SET-ONCE under in-order replay, so the final state per user
    //     is the per-column min over its emissions
    ("e51_stream_funnel",
      (s, dir) => {
        import s.implicits._
        val ev = evts(s, dir).where(col("user_id") < 60)
          .select(col("event_id"),
            timestamp_millis(unix_millis(col("ts"))).as("ts"),
            col("user_id"), col("event_type"), col("value"))
          .as[Sessionize.Event].collect()
          .sortBy(e => (e.ts.getTime, e.event_id)).toSeq
        graft.streaming.Replay.run(s,
            graft.streaming.Replay.timeChunks(ev, 3), "update") {
          ds => Sessionize.streamingFunnel(ds,
            Seq("view", "click", "purchase"))
        }
          .groupBy(col("user_id"))
          .agg(min(col("view_ts")).as("view_ts"),
            min(col("click_ts")).as("click_ts"),
            min(col("purchase_ts")).as("purchase_ts"))
          .orderBy("user_id")
      },
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (date_trunc('milliseconds',
             |    CAST(ts AS TIMESTAMP)) AS ts)
             |  FROM events WHERE user_id < 60),
             |v AS (SELECT user_id, min(ts) AS view_ts
             |      FROM e0 WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT v.user_id, v.view_ts,
             |        min(CASE WHEN e.ts > v.view_ts THEN e.ts END) AS click_ts
             |      FROM v LEFT JOIN e0 e
             |        ON e.user_id = v.user_id AND e.event_type = 'click'
             |      GROUP BY 1, 2),
             |p AS (SELECT c.user_id, c.view_ts, c.click_ts,
             |        min(CASE WHEN e.ts > c.click_ts THEN e.ts END)
             |          AS purchase_ts
             |      FROM c LEFT JOIN e0 e
             |        ON e.user_id = c.user_id AND e.event_type = 'purchase'
             |      GROUP BY 1, 2, 3)
             |SELECT user_id, view_ts, click_ts, purchase_ts
             |FROM p ORDER BY user_id""".stripMargin)),

    // --- streaming CDC latest-wins (update mode): the sink's
    //     accumulated emissions reduce per key by the SAME
    //     (seq, op, payload) winner order the state machine applies
    ("e52_stream_cdc_latest",
      (s, dir) => {
        import s.implicits._
        val d = docs(s, dir).where(col("doc_id") < 2000)
        val feed = d.where(col("doc_id") % 10 === 1)
            .select(col("doc_id").as("key"), lit(1L).as("seq"),
              lit("U").as("op"), lit("xx").as("payload"))
          .unionByName(d.where(col("doc_id") % 20 === 1)
            .select(col("doc_id").as("key"), lit(2L).as("seq"),
              lit("U").as("op"), lit("yy").as("payload")))
          .unionByName(d.where(col("doc_id") % 10 === 2)
            .select(col("doc_id").as("key"), lit(1L).as("seq"),
              lit("D").as("op"), lit("").as("payload")))
          .as[ChangeData.Change].collect()
          .sortBy(c => (c.seq, c.key)).toSeq
        graft.streaming.Replay.run(s,
            feed.groupBy(_.seq).toSeq.sortBy(_._1).map(_._2), "update") {
          ds => ChangeData.streamingLatest(ds).toDF()
        }
          .groupBy(col("key"))
          .agg(max(struct(col("seq"), col("op"), col("payload"))).as("__w"))
          .select(col("key"), col("__w.seq").as("seq"),
            col("__w.op").as("op"), col("__w.payload").as("payload"))
          .orderBy("key")
      },
      Some("""WITH ch AS (
             |  SELECT doc_id AS key, 1 AS seq, 'U' AS op, 'xx' AS payload
             |  FROM documents WHERE doc_id % 10 = 1 AND doc_id < 2000
             |  UNION ALL
             |  SELECT doc_id, 2, 'U', 'yy'
             |  FROM documents WHERE doc_id % 20 = 1 AND doc_id < 2000
             |  UNION ALL
             |  SELECT doc_id, 1, 'D', ''
             |  FROM documents WHERE doc_id % 10 = 2 AND doc_id < 2000)
             |SELECT key, CAST(seq AS BIGINT) AS seq, op, payload FROM (
             |  SELECT *, row_number() OVER
             |    (PARTITION BY key ORDER BY seq DESC, op DESC, payload DESC)
             |    AS r
             |  FROM ch) WHERE r = 1
             |ORDER BY key""".stripMargin)),

    // --- streaming hourly rollup (append mode, watermarked tumbling
    //     windows): sentinel far-future events advance the watermark so
    //     every real window closes; the sentinel's own type filters out
    ("e53_stream_hourly_rollup",
      (s, dir) => {
        import s.implicits._
        val ev = evts(s, dir).where(col("user_id") < 200)
          .select(col("ts"), col("event_type"), col("value"))
          .as[(java.sql.Timestamp, String, Double)].collect()
          .sortBy(_._1.getTime).toSeq
        val maxMs = ev.map(_._1.getTime).max
        val day = 86400000L
        val sentinels = Seq(
          Seq((new java.sql.Timestamp(maxMs + 3 * day), "__flush", 0.0)),
          Seq((new java.sql.Timestamp(maxMs + 6 * day), "__flush", 0.0)))
        graft.streaming.Replay.run(s,
            graft.streaming.Replay.timeChunks(ev, 2) ++ sentinels, "append") {
          ds => Sessionize.streamingHourlyRollup(
            ds.toDF("ts", "event_type", "value"))
        }
          .where(col("event_type") =!= "__flush")
          .select(col("hour"), col("event_type"), col("n_events"),
            round(col("sum_value"), 6).as("sum_value"))
          .orderBy("hour", "event_type")
      },
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
             |       count(*) AS n_events, round(sum(value), 6) AS sum_value
             |FROM events WHERE user_id < 200
             |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)),

    // --- foreachBatch rollup maintenance through the gate (round 8):
    //     each micro-batch's hourlyRollup merges into the accumulated
    //     table via mergeHourlyRollup — the streaming face of the
    //     mergeable-state algebra (merge(rollup(A), rollup(B)) ≡
    //     rollup(A ∪ B)); the final table must equal the full batch
    //     recompute the oracle runs
    ("e57_foreachbatch_rollup",
      (s, dir) => {
        import s.implicits._
        val ev = evts(s, dir).where(col("user_id") < 200)
          .select(col("ts"), col("event_type"), col("value"))
          .as[(java.sql.Timestamp, String, Double)].collect()
          .sortBy(_._1.getTime).toSeq
        var acc: DataFrame = null
        graft.streaming.Replay.runForeachBatch(s,
            graft.streaming.Replay.timeChunks(ev, 3)) { (batch, _) =>
          val delta = Sessionize.hourlyRollup(
            batch.toDF("ts", "event_type", "value"))
          acc = (if (acc == null) delta
                 else Sessionize.mergeHourlyRollup(acc, delta))
            .localCheckpoint(true)
        }
        acc.select(col("hour"), col("event_type"), col("n_events"),
            round(col("sum_value"), 6).as("sum_value"))
          .orderBy("hour", "event_type")
      },
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
             |       count(*) AS n_events, round(sum(value), 6) AS sum_value
             |FROM events WHERE user_id < 200
             |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)),

    // --- EXACT sliding distinct users on a STREAM through the gate
    //     (round 8): chained stateful operators — streaming
    //     dropDuplicates on (window, type, user) then a windowed count
    //     of the survivors — reproduce the batch twin's exact values
    //     (the HLL production twin keeps fixed state; this is the
    //     checkable face). Far-future sentinels flush the final
    //     windows; windows past the corpus max hour are clamped to
    //     match the batch contract.
    ("e58_stream_sliding_users",
      (s, dir) => {
        import s.implicits._
        val ev = evts(s, dir).where(col("user_id") < 200)
          .select(col("ts"), col("event_type"), col("user_id"))
          .as[(java.sql.Timestamp, String, Long)].collect()
          .sortBy(_._1.getTime).toSeq
        val maxMs = ev.map(_._1.getTime).max
        val maxHour = new java.sql.Timestamp(maxMs - maxMs % 3600000L)
        val day = 86400000L
        val sentinels = Seq(
          Seq((new java.sql.Timestamp(maxMs + 3 * day), "__flush", -1L)),
          Seq((new java.sql.Timestamp(maxMs + 6 * day), "__flush", -1L)))
        graft.streaming.Replay.run(s,
            graft.streaming.Replay.timeChunks(ev, 2) ++ sentinels,
            "append") {
          ds => Sessionize.slidingDistinctUsersStreamExact(
            ds.toDF("ts", "event_type", "user_id"), windowHours = 6)
        }
          .where(col("event_type") =!= "__flush" &&
            col("hour") <= lit(maxHour))
          .select(col("event_type"), col("hour"), col("n_users"))
          .orderBy("event_type", "hour")
      },
      Some("""WITH c AS (SELECT DISTINCT event_type, user_id,
             |        date_trunc('hour', ts) AS h
             |      FROM events WHERE user_id < 200),
             |m AS (SELECT max(h) AS maxh FROM c),
             |x AS (SELECT event_type, user_id,
             |        unnest(generate_series(h,
             |          least(h + INTERVAL 5 HOUR, maxh),
             |          INTERVAL 1 HOUR)) AS hour
             |      FROM c, m)
             |SELECT event_type, hour, count(DISTINCT user_id) AS n_users
             |FROM x GROUP BY 1, 2 ORDER BY event_type, hour""".stripMargin)),

    // --- streaming stream-stream interval join through the gate: the
    //     click-attribution join replayed over TWO MemoryStreams whose
    //     watermarks advance in lockstep; far-future sentinels on both
    //     sides flush the final window, then filter out
    ("e54_stream_attribution",
      (s, dir) => {
        import s.implicits._
        val e = evts(s, dir).where(col("user_id") < 300)
        def side(t: String) = e.where(col("event_type") === t)
          .select(col("user_id"), col("ts"), col("event_id"))
          .as[(Long, java.sql.Timestamp, Long)].collect()
          .sortBy(x => (x._2.getTime, x._3)).toSeq
        val imps = side("view")
        val clks = side("click")
        // inner stream-stream joins emit a match the moment the later
        // side arrives — the watermark only bounds STATE — so no
        // sentinel flush batches are needed (append-mode aggregations
        // do need them; see e50/e53). Stream-stream triggers cost
        // ~1.7 s of planning each, so the replay splits into 2 batches
        // (exercising cross-batch matches) at oracle scale and 1 at
        // bench scale — deterministic given the input.
        val nChunks = if (imps.size + clks.size > 5000) 1 else 2
        val ia = graft.streaming.Replay.timeChunks(imps, nChunks)
        val ca = graft.streaming.Replay.timeChunks(clks, nChunks)
        graft.streaming.Replay.run2(s, ia, ca, "append") { (i, c) =>
          Sessionize.streamClickAttribution(
            i.toDF("user_id", "ts", "impression_id"),
            c.toDF("user_id", "ts", "click_id"),
            windowMinutes = 30L, watermarkMinutes = 10L)
        }
          .where(col("user_id") >= 0)
          .orderBy("impression_id", "click_id")
      },
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
             |  FROM events WHERE user_id < 300),
             |i AS (SELECT user_id, ts AS imp_ts, event_id AS impression_id
             |      FROM e0 WHERE event_type = 'view'),
             |c AS (SELECT user_id AS c_user, ts AS click_ts,
             |        event_id AS click_id
             |      FROM e0 WHERE event_type = 'click')
             |SELECT i.user_id, impression_id, click_id, imp_ts, click_ts,
             |       epoch_ms(click_ts) - epoch_ms(imp_ts) AS latency_ms
             |FROM i JOIN c ON i.user_id = c.c_user
             |  AND click_ts >= imp_ts
             |  AND click_ts <= imp_ts + INTERVAL '30' MINUTE
             |ORDER BY impression_id, click_id""".stripMargin)),

    // --- streaming trailing-window stats through the gate: per-user
    //     flatMapGroupsWithState window state; emissions happen on
    //     arrival (no sentinel flush); ms-keyed frames match the batch
    //     RANGE window exactly across chunk boundaries
    ("e55_stream_rolling",
      (s, dir) => {
        import s.implicits._
        val ev = evts(s, dir).where(col("user_id") < 60)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[Sessionize.Event].collect()
          .sortBy(e => (e.ts.getTime, e.event_id)).toSeq
        graft.streaming.Replay.run(s,
            graft.streaming.Replay.timeChunks(ev, 2), "append") {
          ds => Sessionize.streamingRollingUserStats(
            ds.withWatermark("ts", "10 minutes"), windowMinutes = 60).toDF()
        }
          .select(col("event_id"), col("user_id"), col("n_window"),
            round(col("sum_window"), 6).as("sum_window"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
             |          FROM events WHERE user_id < 60)
             |SELECT event_id, user_id,
             |  CAST(count(*) OVER win AS BIGINT) AS n_window,
             |  round(sum(value) OVER win, 6) AS sum_window
             |FROM e
             |WINDOW win AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
             |  RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // --- streaming anomaly z-scores through the gate: same state
    //     machine, strictly-prior-millisecond frames; z/verdict match
    //     the batch RANGE ... 1 PRECEDING contract
    ("e56_stream_anomaly",
      (s, dir) => {
        import s.implicits._
        val ev = evts(s, dir).where(col("user_id") < 60)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[Sessionize.Event].collect()
          .sortBy(e => (e.ts.getTime, e.event_id)).toSeq
        graft.streaming.Replay.run(s,
            graft.streaming.Replay.timeChunks(ev, 3), "append") {
          ds => Sessionize.streamingAnomalyZScores(
            ds.withWatermark("ts", "10 minutes"),
            windowMinutes = 60, minPrior = 5, threshold = 3.0).toDF()
        }
          .select(col("event_id"), col("user_id"), col("n_prior"),
            round(col("z"), 6).as("z"),
            col("is_anomaly").cast("long").as("is_anomaly"))
          .orderBy("event_id")
      },
      Some("""WITH e0 AS (
             |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
             |  FROM events WHERE user_id < 60),
             |w AS (SELECT event_id, user_id, value, epoch_ms(ts) AS ms
             |      FROM e0),
             |s AS (SELECT *, count(*) OVER win AS n_prior,
             |        avg(value) OVER win AS mu,
             |        avg(value * value) OVER win AS m2
             |      FROM w
             |      WINDOW win AS (PARTITION BY user_id ORDER BY ms
             |        RANGE BETWEEN 3600000 PRECEDING AND 1 PRECEDING)),
             |z AS (SELECT event_id, user_id, n_prior,
             |        CASE WHEN n_prior >= 5
             |               AND sqrt(greatest(m2 - mu*mu, 0)) > 0
             |          THEN (value - mu) / sqrt(greatest(m2 - mu*mu, 0))
             |        END AS z
             |      FROM s)
             |SELECT event_id, user_id, n_prior, round(z, 6) AS z,
             |       CASE WHEN z IS NOT NULL
             |         THEN CAST(abs(round(z, 6)) > 3.0 AS BIGINT) END
             |         AS is_anomaly
             |FROM z ORDER BY event_id""".stripMargin)),

    // --- local-maximum peak detection over daily series (strictly
    //     above the previous day, at least the next, and 1.2× the
    //     type mean; series edges never peak)
    ("e48_peaks",
      (s, dir) => {
        val daily = evts(s, dir)
          .groupBy(col("event_type"),
            date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n_events"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day"))
        val mu = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))
        daily
          .withColumn("__p", lag(col("n_events"), 1).over(w))
          .withColumn("__x", lead(col("n_events"), 1).over(w))
          .withColumn("__mu", avg(col("n_events")).over(mu))
          .select(col("event_type"), col("day"), col("n_events"),
            (col("__p").isNotNull && col("__x").isNotNull &&
              col("n_events") > col("__p") &&
              col("n_events") >= col("__x") &&
              col("n_events") >= lit(1.2) * col("__mu")).as("is_peak"))
          .orderBy("event_type", "day")
      },
      Some("""WITH d AS (SELECT event_type,
             |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2),
             |x AS (SELECT event_type, day, n,
             |    lag(n) OVER (PARTITION BY event_type ORDER BY day) AS p,
             |    lead(n) OVER (PARTITION BY event_type ORDER BY day) AS nx,
             |    avg(n) OVER (PARTITION BY event_type) AS mu
             |  FROM d)
             |SELECT event_type, day, n AS n_events,
             |  (p IS NOT NULL AND nx IS NOT NULL AND n > p AND n >= nx
             |   AND n >= 1.2 * mu) AS is_peak
             |FROM x ORDER BY event_type, day""".stripMargin)),

    // --- exact-duplicate embedding check (pipeline-bug detector;
    //     constant vectors injected by id residue on both sides)
    ("s31_exact_vector_dups",
      (s, dir) => {
        val injected = embs(s, dir).select(col("vec_id"),
          when(col("vec_id") % 50 === 1,
            array_repeat(lit(0.5f), 64))
            .otherwise(col("embedding")).as("embedding"))
        injected.groupBy(col("embedding"))
          .agg(count(lit(1)).as("n_copies"), min(col("vec_id")).as("keeper"))
          .where(col("n_copies") >= 2)
          .select(col("keeper"), col("n_copies"))
          .orderBy("keeper")
      },
      Some("""WITH i AS (SELECT vec_id,
             |    CASE WHEN vec_id % 50 = 1
             |           THEN [CAST(0.5 AS FLOAT) for x in range(1, 65)]
             |         ELSE embedding END AS v
             |  FROM embeddings)
             |SELECT min(vec_id) AS keeper,
             |       CAST(count(*) AS BIGINT) AS n_copies
             |FROM i GROUP BY v HAVING count(*) >= 2
             |ORDER BY keeper""".stripMargin)),

    // --- per-epoch deterministic shuffle order (each epoch a
    //     different reproducible permutation — the training-loader
    //     shuffling primitive; no RNG state, resumable anywhere)
    ("p25_epoch_order",
      (s, dir) => {
        val epochs = s.range(0, 2).select(col("id").as("epoch"))
        val h = graft.ops.Hashing.mulHash(
          col("doc_id") * lit(31L) + col("epoch"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("epoch")).orderBy(h, col("doc_id"))
        docs(s, dir).select(col("doc_id")).crossJoin(epochs)
          .withColumn("order_pos", row_number().over(w).cast("long") - 1L)
          .where(col("order_pos") < 20)
          .orderBy("epoch", "order_pos")
      },
      Some("""WITH e AS (SELECT unnest([0, 1]) AS epoch),
             |x AS (SELECT d.doc_id, e.epoch,
             |        CAST(row_number() OVER (PARTITION BY e.epoch
             |          ORDER BY ((d.doc_id*31 + e.epoch)*2654435761)
             |                     % 1000000007, d.doc_id) AS BIGINT) - 1
             |          AS order_pos
             |      FROM documents d CROSS JOIN e)
             |SELECT doc_id, CAST(epoch AS BIGINT) AS epoch, order_pos
             |FROM x WHERE order_pos < 20
             |ORDER BY epoch, order_pos""".stripMargin)),

    // --- user lifetime table: span, active days, intensity
    ("e47_user_lifetimes",
      (s, dir) => evts(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(to_date(col("ts"))).as("active_days"),
          datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))
            .cast("long").as("span_days"))
        .withColumn("events_per_active_day",
          round(col("n_events").cast("double") / col("active_days"), 6))
        .withColumn("activity_rate",
          round(col("active_days").cast("double") /
            (col("span_days") + 1L), 6))
        .orderBy("user_id"),
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
             |    AS active_days,
             |  CAST(datediff('day', min(CAST(ts AS DATE)),
             |    max(CAST(ts AS DATE))) AS BIGINT) AS span_days,
             |  round(CAST(count(*) AS DOUBLE)
             |        / count(DISTINCT CAST(ts AS DATE)), 6)
             |    AS events_per_active_day,
             |  round(CAST(count(DISTINCT CAST(ts AS DATE)) AS DOUBLE)
             |        / (datediff('day', min(CAST(ts AS DATE)),
             |           max(CAST(ts AS DATE))) + 1), 6) AS activity_rate
             |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin)),

    // --- dedup threshold-sweep ledger from ONE PPJoin pass
    // --- streaming exact dedup through the gate: the
    //     dropDuplicatesWithinWatermark path replayed in order; the
    //     projection is duplicate-invariant (text only), so whichever
    //     arrival survives, the value set is the distinct texts
    ("d21_stream_dedup",
      (s, dir) => {
        import s.implicits._
        val rows = docs(s, dir).where(col("doc_id") < 3000)
          .select(timestamp_millis(lit(1700000000000L) +
            col("doc_id") * 1000L).as("ts"), col("text"))
          .as[(java.sql.Timestamp, String)].collect()
          .sortBy(_._1.getTime).toSeq
        graft.streaming.Replay.run(s,
            graft.streaming.Replay.timeChunks(rows, 3), "append") {
          ds => Dedup.streamingDedup(ds.toDF("ts", "text"),
            "text", "ts", "3650 days")
        }
          .select(col("text")).orderBy("text")
      },
      Some("""SELECT DISTINCT text FROM documents WHERE doc_id < 3000
             |ORDER BY text""".stripMargin)),

    // --- STREAMING SimHash near-dup at ingest through the gate
    //     (round 8): the flatMapGroupsWithState Manku-bucket path
    //     replayed over 3 in-order chunks; oracle-mode token hash
    //     (the d04 mirror arithmetic) so DuckDB recomputes identical
    //     fingerprints. Match semantics with time-ordered replay are
    //     EXACTLY "all pairs within horizon at Hamming <= 3" — the
    //     pigeonhole guarantees every qualifying pair collides on >= 1
    //     chunk, the uncapped bucket never drops one, and in-order
    //     chunks mean the watermark can never GC an entry still inside
    //     a future doc's horizon. doc_id = the later arrival.
    ("d22_stream_simhash",
      (s, dir) => {
        import s.implicits._
        val rows = docs(s, dir).where(col("doc_id") < 2000)
          .select(timestamp_millis(lit(1700000000000L) +
              col("doc_id") * 1000L).as("ts"),
            col("doc_id").cast("long").as("doc_id"), col("text"))
          .as[(java.sql.Timestamp, Long, String)].collect()
          .sortBy(r => (r._1.getTime, r._2)).toSeq
        graft.streaming.Replay.run(s,
            graft.streaming.Replay.timeChunks(rows, 3), "append") {
          ds => Dedup.streamingSimhashMatches(
            ds.toDF("ts", "doc_id", "text"), "text", "doc_id", "ts",
            horizonMs = 600000L, maxDist = 3, maxBucket = 1 << 20,
            tokenHashes = mirrorTokenHash).toDF()
        }
          .dropDuplicates("doc_id", "matched_id")
          .select(col("doc_id"), col("matched_id"),
            col("dist").cast("long").as("dist"))
          .orderBy("doc_id", "matched_id")
      },
      Some(streamSimhashOracle)),

    // --- MinHash-LSH parameter planner (round 8): the S-curve
    //     operating points per (bands, rows) factorization of k —
    //     pure planner math, mirrored formula-for-formula in SQL
    //     (pow() last-ulp divergence absorbed by round 6)
    // --- EXACT substring dedup (round 12; Lee et al. span-level —
    //     the last VERDICT-r11 frontier family item): a 15-token
    //     passage of out-of-vocabulary tokens is injected at the END
    //     of every doc_id % 50 == 0 document behind a doc-unique
    //     sentinel token, so the longest common run between any two
    //     injected documents is EXACTLY the passage (it cannot extend
    //     left past the unique sentinel or right past the text end),
    //     while every OTHER cross-document run is destroyed by
    //     doc-id-suffixing the corpus tokens (the raw corpus carries
    //     PLANTED near-dup pairs with 80+-token natural runs — the
    //     d02/d03 fixtures — which no SQL oracle can re-derive).
    //     Candidates come from the winnow stage; the verify is the
    //     codegen'd longest-common-run DP. DuckDB mirrors the
    //     expected pairs with plain arithmetic.
    ("d27_substring_dedup",
      (s, dir) => {
        val passage = "zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 " +
          "zq10 zq11 zq12 zq13 zq14"
        val injected = docs(s, dir).withColumn("text",
          concat(
            array_join(transform(split(trim(col("text")), "\\s+"),
              t => concat(t, col("doc_id").cast("string"))), " "),
            when(col("doc_id") % 50 === 0,
              concat(lit(" uniq"), col("doc_id").cast("string"),
                lit(" " + passage))).otherwise(lit(""))))
        Dedup.substringDupSpans(injected, "text", "doc_id",
            minRun = 10, n = 3, window = 4, minShared = 2)
          .select(col("id_a"), col("id_b"), col("run_len"), col("span"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH inj AS (
             |  SELECT doc_id FROM documents WHERE doc_id % 50 = 0)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(15 AS INTEGER) AS run_len,
             |  'zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 zq10 zq11 ' ||
             |  'zq12 zq13 zq14' AS span
             |FROM inj a JOIN inj b ON a.doc_id < b.doc_id
             |ORDER BY id_a, id_b""".stripMargin)),

    // --- incremental substring dedup (round 12; the d07/d09 shape
    //     for the span family): batch (doc_id % 50 == 0) vs corpus
    //     (doc_id % 70 == 0), each side's tokens side+doc-suffixed so
    //     ONLY the injected passage is shared — every batch x corpus
    //     pair reports exactly the 15-token span; within-side pairs
    //     cannot form by construction.
    ("d28_substring_against",
      (s, dir) => {
        val passage = "zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 " +
          "zq10 zq11 zq12 zq13 zq14"
        def side(tag: String, keep: org.apache.spark.sql.Column) = docs(s, dir)
          .where(keep)
          .withColumn("text", concat(
            array_join(transform(split(trim(col("text")), "\\s+"),
              t => concat(t, lit(tag), col("doc_id").cast("string"))), " "),
            lit(" uniq" + tag), col("doc_id").cast("string"),
            lit(" " + passage)))
        Dedup.substringDupSpansAgainst(
            side("b", col("doc_id") % 50 === 0),
            side("c", col("doc_id") % 70 === 0),
            "text", "doc_id", minRun = 10, n = 3, window = 4,
            minShared = 2)
          .select(col("batch_id"), col("corpus_id"), col("run_len"),
            col("span"))
          .orderBy("batch_id", "corpus_id")
      },
      Some("""WITH b AS (SELECT doc_id FROM documents WHERE doc_id % 50 = 0),
             |c AS (SELECT doc_id FROM documents WHERE doc_id % 70 = 0)
             |SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
             |  CAST(15 AS INTEGER) AS run_len,
             |  'zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 zq10 zq11 ' ||
             |  'zq12 zq13 zq14' AS span
             |FROM b CROSS JOIN c
             |ORDER BY batch_id, corpus_id""".stripMargin)),

    // --- span REMOVAL (round 13; Lee et al. §4.1's actual deliverable
    //     — d27 reports the duplicated spans, this emits the corpus
    //     with them excised): the d27 fixture (15-token passage behind
    //     a doc-unique sentinel at the END of every doc_id % 50 == 0
    //     document, all corpus tokens doc-id-suffixed), then
    //     Dedup.dedupSpans keep-first. Expected corpus: the MINIMUM
    //     injected doc_id keeps its passage (it is id_a in every pair
    //     it joins), every other injected doc loses exactly the
    //     passage (interval union of its pair reports — one interval)
    //     and reflows to base + sentinel, and every untouched doc is
    //     BYTE-EXACT — DuckDB rebuilds all three shapes with string
    //     arithmetic
    ("d29_span_removal",
      (s, dir) => {
        val passage = "zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 " +
          "zq10 zq11 zq12 zq13 zq14"
        val injected = docs(s, dir).withColumn("text",
          concat(
            array_join(transform(split(trim(col("text")), "\\s+"),
              t => concat(t, col("doc_id").cast("string"))), " "),
            when(col("doc_id") % 50 === 0,
              concat(lit(" uniq"), col("doc_id").cast("string"),
                lit(" " + passage))).otherwise(lit(""))))
        Dedup.dedupSpans(injected, "text", "doc_id",
            minRun = 10, n = 3, window = 4, minShared = 2)
          .select(col("doc_id"), col("text"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    array_to_string(list_transform(
             |      regexp_split_to_array(trim(text), '\s+'),
             |      x -> x || CAST(doc_id AS VARCHAR)), ' ') AS base
             |  FROM documents),
             |k AS (SELECT min(doc_id) AS keeper FROM documents
             |      WHERE doc_id % 50 = 0)
             |SELECT doc_id,
             |  CASE WHEN doc_id % 50 <> 0 THEN base
             |       WHEN doc_id = (SELECT keeper FROM k)
             |         THEN base || ' uniq' || CAST(doc_id AS VARCHAR) ||
             |              ' zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9' ||
             |              ' zq10 zq11 zq12 zq13 zq14'
             |       ELSE base || ' uniq' || CAST(doc_id AS VARCHAR)
             |  END AS text
             |FROM t ORDER BY doc_id""".stripMargin)),

    // --- incremental span removal (round 13; the d28 composition):
    //     batch docs (doc_id % 50 == 0) each share exactly the
    //     injected passage with every corpus doc (doc_id % 70 == 0);
    //     removal cuts from the BATCH side only, so every batch doc
    //     reflows to its suffixed base + sentinel
    ("d30_span_removal_incr",
      (s, dir) => {
        val passage = "zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 " +
          "zq10 zq11 zq12 zq13 zq14"
        def side(tag: String, keep: org.apache.spark.sql.Column) = docs(s, dir)
          .where(keep)
          .withColumn("text", concat(
            array_join(transform(split(trim(col("text")), "\\s+"),
              t => concat(t, lit(tag), col("doc_id").cast("string"))), " "),
            lit(" uniq" + tag), col("doc_id").cast("string"),
            lit(" " + passage)))
        val batch = side("b", col("doc_id") % 50 === 0)
        val corpus = side("c", col("doc_id") % 70 === 0)
        val spans = Dedup.substringDupSpansAgainst(batch, corpus,
          "text", "doc_id", minRun = 10, n = 3, window = 4,
          minShared = 2)
        Dedup.removeDupSpansAgainst(batch, spans, "text", "doc_id")
          .select(col("doc_id"), col("text"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  array_to_string(list_transform(
             |    regexp_split_to_array(trim(text), '\s+'),
             |    x -> x || 'b' || CAST(doc_id AS VARCHAR)), ' ')
             |  || ' uniqb' || CAST(doc_id AS VARCHAR) AS text
             |FROM documents WHERE doc_id % 50 = 0
             |ORDER BY doc_id""".stripMargin)),

    // --- STREAMING span-dedup ingest twin (round 14): the d30 shape
    //     through streaming/Replay — batch docs arrive as a 3-chunk
    //     stream next to the STATIC corpus; every arriving doc shares
    //     exactly the injected passage with every corpus doc, so each
    //     reflows to its suffixed base + sentinel with ONE merged cut
    //     interval (all corpus pairs report the same trailing span).
    //     The corpus fingerprint index materializes once and every
    //     micro-batch reuses it; no state crosses triggers.
    ("d31_stream_span_cuts",
      (s, dir) => {
        import s.implicits._
        val passage = "zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 " +
          "zq10 zq11 zq12 zq13 zq14"
        def side(tag: String, keep: org.apache.spark.sql.Column) =
          docs(s, dir).where(keep)
            .withColumn("text", concat(
              array_join(transform(split(trim(col("text")), "\\s+"),
                t => concat(t, lit(tag), col("doc_id").cast("string"))),
                " "),
              lit(" uniq" + tag), col("doc_id").cast("string"),
              lit(" " + passage)))
        val corpus = side("c", col("doc_id") % 70 === 0)
        val rows = side("b", col("doc_id") % 50 === 0)
          .select(col("doc_id").cast("long").as("doc_id"), col("text"))
          .as[(Long, String)].collect().sortBy(_._1).toSeq
        // 2 chunks (multi-trigger, so the corpus-index-reuse path is
        // exercised) × 8 state partitions: the per-doc DP work in the
        // regroup wants parallelism more than fewer state commits
        val chunk = math.max(1, rows.size / 2 + 1)
        graft.streaming.Replay.run(s, rows.grouped(chunk).toSeq,
            "append", partitions = 8) { ds =>
          Dedup.streamingSpanCutsAgainst(ds.toDF("doc_id", "text"),
            corpus, "text", "doc_id", minRun = 10, n = 3,
            window = 4).toDF()
        }
          .select(col("doc_id"), col("text"), col("n_spans"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  array_to_string(list_transform(
             |    regexp_split_to_array(trim(text), '\s+'),
             |    x -> x || 'b' || CAST(doc_id AS VARCHAR)), ' ')
             |  || ' uniqb' || CAST(doc_id AS VARCHAR) AS text,
             |  CAST(1 AS INTEGER) AS n_spans
             |FROM documents WHERE doc_id % 50 = 0
             |ORDER BY doc_id""".stripMargin)),

    ("d26_lsh_plan",
      (s, dir) => {
        import s.implicits._
        Dedup.lshPlan(64, targetJaccard = 0.8).toDF()
          .select(col("bands"), col("rows").as("n_rows"),
            round(col("curveThreshold"), 6).as("curve_threshold"),
            round(col("pAtTarget"), 6).as("p_at_target"),
            round(col("pBelow"), 6).as("p_below"))
          .orderBy("bands")
      },
      Some("""WITH f AS (SELECT CAST(unnest([1,2,4,8,16,32,64]) AS BIGINT)
             |             AS n_rows)
             |SELECT CAST(64 / n_rows AS INT) AS bands, n_rows,
             |  round(pow(1.0 / (64 / n_rows), 1.0 / n_rows), 6)
             |    AS curve_threshold,
             |  round(1 - pow(1 - pow(0.8, n_rows), 64 / n_rows), 6)
             |    AS p_at_target,
             |  round(1 - pow(1 - pow(0.6, n_rows), 64 / n_rows), 6)
             |    AS p_below
             |FROM f ORDER BY bands""".stripMargin)),

    // --- per-source MinHash union sketches → estimated pairwise
    //     shingle Jaccard (round 8): the elementwise-min mergeable
    //     reduction with the d23 oracle-mode shingle hash — DuckDB
    //     recomputes the 64-slot union sketch per source EXACTLY, so
    //     the full 20×19/2 similarity matrix is value-checked
    ("d24_source_sketch",
      (s, dir) => Dedup.sourceSimilaritySketch(docs(s, dir), "text",
          "source", k = 64, shingleN = 3,
          shingles = (t, n) => sort_array(array_distinct(
            graft.functions.NativeExpressions.modNgramHashes(
              graft.ops.TextOps.tokens(t), n))))
        .orderBy("src_a", "src_b"),
      Some(sourceSketchOracle)),

    // --- STREAMING MinHash-LSH near-dup at ingest through the gate
    //     (round 8): band-bucket state + signature-agreement verify
    //     replayed in order; oracle-mode shingle hash (the mod-ngram
    //     arithmetic of p02's mirror, values < 2^30 so every a*h+b
    //     stays in signed 64-bit on both engines) and the inlined
    //     mhCoeffs(64) literals let DuckDB recompute the signatures
    //     EXACTLY. At threshold 0.8 >= (k-bands+1)/k = 49/64, est >=
    //     threshold pigeonholes >= 1 fully-agreeing band, so the match
    //     set is exactly "pairs within horizon with agreement >= 52/64"
    //     — no LSH-probability caveat at all.
    ("d23_stream_minhash",
      (s, dir) => {
        import s.implicits._
        val rows = docs(s, dir).where(col("doc_id") < 2000)
          .select(timestamp_millis(lit(1700000000000L) +
              col("doc_id") * 1000L).as("ts"),
            col("doc_id").cast("long").as("doc_id"), col("text"))
          .as[(java.sql.Timestamp, Long, String)].collect()
          .sortBy(r => (r._1.getTime, r._2)).toSeq
        graft.streaming.Replay.run(s,
            graft.streaming.Replay.timeChunks(rows, 3), "append") {
          ds => Dedup.streamingMinhashMatches(
            ds.toDF("ts", "doc_id", "text"), "text", "doc_id", "ts",
            horizonMs = 600000L, n = 3, k = 64, bands = 16,
            threshold = 0.8, maxBucket = 1 << 20,
            shingles = (t, n) => sort_array(array_distinct(
              graft.functions.NativeExpressions.modNgramHashes(
                graft.ops.TextOps.tokens(t), n)))).toDF()
        }
          .dropDuplicates("doc_id", "matched_id")
          .select(col("doc_id"), col("matched_id"),
            round(col("est_jaccard"), 6).as("est_jaccard"))
          .orderBy("doc_id", "matched_id")
      },
      Some(streamMinhashOracle)),

    ("d20_threshold_sweep",
      (s, dir) => Dedup.thresholdSweep(docs(s, dir), "text", "doc_id",
          n = 3)
        .orderBy("threshold"),
      Some("""WITH sh AS (
             |  SELECT doc_id,
             |         list_distinct([array_to_string(t[i:i+2], ' ')
             |                        for i in range(1, len(t) - 1)]) AS s
             |  FROM (SELECT doc_id,
             |          CASE WHEN trim(text) = '' THEN []::VARCHAR[]
             |               ELSE string_split_regex(trim(text), '\s+') END
             |            AS t
             |        FROM documents)),
             |j AS (SELECT len(list_intersect(a.s, b.s))::DOUBLE /
             |        len(list_distinct(list_concat(a.s, b.s)))::DOUBLE AS jc
             |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |      WHERE len(list_distinct(list_concat(a.s, b.s))) > 0
             |        AND len(list_intersect(a.s, b.s))::DOUBLE /
             |          len(list_distinct(list_concat(a.s, b.s)))::DOUBLE
             |          >= 0.5),
             |t AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS threshold)
             |SELECT t.threshold AS threshold,
             |       CAST(count(j.jc) AS BIGINT) AS n_pairs
             |FROM t LEFT JOIN j ON j.jc >= t.threshold
             |GROUP BY 1 ORDER BY threshold""".stripMargin)),

    // --- OOD sweep: distance-to-own-centroid z-scores per embedding
    ("s30_ood_scores",
      (s, dir) => Similarity.oodScores(embs(s, dir), "embedding",
          "vec_id", "label")
        .where(col("vec_id") < 100)
        .select(col("vec_id"), col("label"),
          round(col("dist2"), 6).as("dist2"), round(col("z"), 6).as("z"),
          col("is_ood"))
        .orderBy("vec_id"),
      Some("""WITH x AS (SELECT vec_id, label,
             |    CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
             |    CAST(unnest(embedding) AS DOUBLE) AS v
             |  FROM embeddings),
             |c AS (SELECT label, i, avg(v) AS mu FROM x GROUP BY 1, 2),
             |d AS (SELECT x.vec_id, x.label,
             |        sum((x.v - c.mu) * (x.v - c.mu)) AS dist2
             |      FROM x JOIN c ON c.label = x.label AND c.i = x.i
             |      GROUP BY 1, 2),
             |st AS (SELECT label, avg(dist2) AS dm,
             |         coalesce(stddev_pop(dist2), 0) AS ds FROM d GROUP BY 1)
             |SELECT d.vec_id, d.label, round(d.dist2, 6) AS dist2,
             |  round(CASE WHEN st.ds = 0 THEN 0.0
             |        ELSE (d.dist2 - st.dm) / st.ds END, 6) AS z,
             |  (CASE WHEN st.ds = 0 THEN 0.0
             |        ELSE (d.dist2 - st.dm) / st.ds END) > 2.5 AS is_ood
             |FROM d JOIN st USING (label)
             |WHERE d.vec_id < 100 ORDER BY vec_id""".stripMargin)),

    // --- writing-system census (CJK injected for zh docs — the
    //     corpus is romanized ASCII; same injection in the mirror)
    ("t42_script_census",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"),
          when(col("lang") === "zh",
            regexp_replace(col("text"), "[aeiou]", "中"))
            .otherwise(col("text")).as("__t"))
        .select(col("doc_id"), TextOps.scriptCensus(col("__t")).as("__s"))
        .select(col("doc_id"), col("__s.n_cjk").as("n_cjk"),
          col("__s.n_latin").as("n_latin"),
          round(col("__s.cjk_frac"), 6).as("cjk_frac"),
          round(col("__s.latin_frac"), 6).as("latin_frac"),
          col("__s.dominant").as("dominant"))
        .orderBy("doc_id"),
      Some("""WITH x AS (SELECT d.doc_id,
             |    CASE WHEN d.lang = 'zh'
             |           THEN regexp_replace(d.text, '[aeiou]', '中', 'g')
             |         ELSE d.text END AS t
             |  FROM documents d),
             |m AS (SELECT doc_id,
             |    CAST(len(regexp_extract_all(t, '[\x{4E00}-\x{9FFF}]'))
             |      AS BIGINT) AS cjk,
             |    CAST(len(regexp_extract_all(t, '[A-Za-z]')) AS BIGINT)
             |      AS lat,
             |    CAST(len(regexp_extract_all(t, '[\x{0400}-\x{04FF}]'))
             |      AS BIGINT) AS cyr,
             |    length(t) AS n
             |  FROM x)
             |SELECT doc_id, cjk AS n_cjk, lat AS n_latin,
             |  round(CASE WHEN n = 0 THEN 0.0
             |        ELSE CAST(cjk AS DOUBLE) / n END, 6) AS cjk_frac,
             |  round(CASE WHEN n = 0 THEN 0.0
             |        ELSE CAST(lat AS DOUBLE) / n END, 6) AS latin_frac,
             |  CASE WHEN cjk = 0 AND lat = 0 AND cyr = 0 THEN 'none'
             |       WHEN cjk >= lat AND cjk >= cyr THEN 'cjk'
             |       WHEN lat >= cyr THEN 'latin'
             |       ELSE 'cyrillic' END AS dominant
             |FROM m ORDER BY doc_id""".stripMargin)),

    // --- entropy rate of the event-type Markov chain (bits/step)
    ("e46_markov_entropy",
      (s, dir) => Sessionize.markovEntropyRate(evts(s, dir), iterations = 3)
        .select(col("n_states"),
          round(col("entropy_rate_bits"), 6).as("entropy_rate_bits")),
      Some(markovEntropyOracle)),

    // --- per-modality QA sample sheet (hash-order top-3 per class)
    // --- payload near-dup without decoding (round 13): hex-gram
    //     SimHash fingerprints + the Manku blocked pair join
    //     (Dedup.fingerprintPairs) — payload bytes never shuffle. The
    //     fingerprint isn't SQL-recomputable (native gram hashes), so
    //     the oracle is STRUCTURAL, d04_prod's shape: identical
    //     payloads hash identically, so every exact pair MUST surface
    //     at dist 0; dist bounds and pair canonicalization pinned.
    ("m08_payload_neardup",
      (s, dir) => {
        val d = docs(s, dir).select(
          col("doc_id").cast("long").as("id"),
          encode(col("text"), "UTF-8").as("payload"), col("text"))
        val pairs = Multimodal.payloadNearDups(d, "id", "payload",
          maxDist = 3, maxBucket = 1 << 20)
        val exact = d.as("a").join(d.as("b"),
            col("a.text") === col("b.text") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            lit(1L).as("__e"))
        exact.join(pairs, Seq("id_a", "id_b"), "full_outer").agg(
          coalesce(sum(col("__e")), lit(0L)).as("exact_pairs"),
          coalesce(sum(when(col("__e").isNotNull && col("dist").isNull,
            1L).otherwise(0L)), lit(0L)).as("missing_exact_pairs"),
          coalesce(sum(when(col("__e").isNotNull && col("dist") =!= 0L,
            1L).otherwise(0L)), lit(0L)).as("exact_dist_violations"),
          coalesce(sum(when(col("dist") < 0 || col("dist") > 3, 1L)
            .otherwise(0L)), lit(0L)).as("dist_violations"),
          coalesce(sum(when(col("dist").isNotNull &&
            col("id_a") >= col("id_b"), 1L).otherwise(0L)), lit(0L))
            .as("order_violations"))
      },
      Some("""SELECT
             |  (SELECT CAST(coalesce(sum(n*(n-1)/2), 0) AS BIGINT)
             |   FROM (SELECT count(*) AS n FROM documents
             |         GROUP BY text HAVING count(*) >= 2) g)
             |    AS exact_pairs,
             |  CAST(0 AS BIGINT) AS missing_exact_pairs,
             |  CAST(0 AS BIGINT) AS exact_dist_violations,
             |  CAST(0 AS BIGINT) AS dist_violations,
             |  CAST(0 AS BIGINT) AS order_violations""".stripMargin)),

    ("m07_qa_sample",
      (s, dir) => {
        val png = lit(Array[Byte](0x89.toByte, 'P', 'N', 'G'))
        val jpg = lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
          0xe0.toByte))
        val riff = lit("RIFF".getBytes("US-ASCII"))
        val payload = when(col("doc_id") % 4 === 0,
            concat(png, encode(col("text"), "UTF-8")))
          .when(col("doc_id") % 4 === 1,
            concat(jpg, encode(col("text"), "UTF-8")))
          .when(col("doc_id") % 4 === 2,
            concat(riff, encode(col("text"), "UTF-8")))
          .otherwise(encode(col("text"), "UTF-8"))
        val magic = base64(substring(col("payload"), 1, 4))
        val pngB64 = java.util.Base64.getEncoder.encodeToString(
          Array[Byte](0x89.toByte, 'P', 'N', 'G'))
        val jpgB64 = java.util.Base64.getEncoder.encodeToString(
          Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte))
        val riffB64 = java.util.Base64.getEncoder.encodeToString(
          "RIFF".getBytes("US-ASCII"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("modality"))
          .orderBy(graft.ops.Hashing.mulHash(col("doc_id")), col("doc_id"))
        docs(s, dir).select(col("doc_id"), payload.as("payload"))
          .select(col("doc_id"),
            when(magic === pngB64, lit("image/png"))
              .when(magic === jpgB64, lit("image/jpeg"))
              .when(magic === riffB64, lit("audio/riff"))
              .otherwise(lit("text/plain")).as("modality"),
            length(col("payload")).cast("long").as("byte_len"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= 3)
          .orderBy("modality", "rank")
      },
      Some("""WITH p AS (SELECT doc_id,
             |    CASE WHEN doc_id % 4 = 0
             |           THEN '\x89PNG'::BLOB || encode(text)
             |         WHEN doc_id % 4 = 1
             |           THEN '\xFF\xD8\xFF\xE0'::BLOB || encode(text)
             |         WHEN doc_id % 4 = 2
             |           THEN 'RIFF'::BLOB || encode(text)
             |         ELSE encode(text) END AS pl
             |  FROM documents),
             |r AS (SELECT doc_id, CASE
             |        WHEN left(hex(pl), 8) = '89504E47' THEN 'image/png'
             |        WHEN left(hex(pl), 8) = 'FFD8FFE0' THEN 'image/jpeg'
             |        WHEN left(hex(pl), 8) = '52494646' THEN 'audio/riff'
             |        ELSE 'text/plain' END AS modality,
             |        CAST(octet_length(pl) AS BIGINT) AS byte_len
             |      FROM p),
             |k AS (SELECT *, CAST(row_number() OVER (PARTITION BY modality
             |        ORDER BY (doc_id*2654435761)%1000000007, doc_id)
             |        AS BIGINT) AS rank
             |      FROM r)
             |SELECT doc_id, modality, byte_len, rank
             |FROM k WHERE rank <= 3 ORDER BY modality, rank""".stripMargin)),

    // --- behavioral diversity: per-user Shannon entropy over types
    ("e45_behavior_entropy",
      (s, dir) => Sessionize.behaviorEntropy(evts(s, dir))
        .select(col("user_id"), col("n_events"), col("n_types"),
          round(col("entropy_bits"), 6).as("entropy_bits"))
        .orderBy("user_id"),
      Some("""WITH c AS (SELECT user_id, event_type,
             |            CAST(count(*) AS BIGINT) AS c
             |           FROM events GROUP BY 1, 2),
             |u AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
             |        CAST(count(*) AS BIGINT) AS n_types,
             |        sum(c * ln(CAST(c AS DOUBLE))) AS sclc
             |      FROM c GROUP BY 1)
             |SELECT user_id, n_events, n_types,
             |  round((ln(CAST(n_events AS DOUBLE)) - sclc / n_events)
             |        / ln(2.0), 6) AS entropy_bits
             |FROM u ORDER BY user_id""".stripMargin)),

    // --- metric sanity: per-source Pearson + Spearman between doc
    //     length and quality score
    ("t41_len_quality_corr",
      (s, dir) => {
        val scored = docs(s, dir).select(col("source"), col("doc_id"),
          col("n_chars"),
          TextOps.qualityScore(col("text"), col("n_chars")).as("__q"))
        Pipeline.groupCorrelation(scored, "source", "n_chars", "__q",
            "doc_id")
          .select(col("source"), col("n_rows"),
            round(col("pearson"), 6).as("pearson"),
            round(col("spearman"), 6).as("spearman"))
          .orderBy("source")
      },
      Some(lenQualityCorrOracle)),

    // --- leakage provenance: contaminated docs per source (where the
    //     benchmark overlap actually comes from)
    ("t40_contamination_by_source",
      (s, dir) => {
        val d = docs(s, dir)
        val rep = Pipeline.contaminationReport(
          d.where(col("doc_id") >= 20), d.where(col("doc_id") < 20),
          "text", "doc_id", n = 3, threshold = 0.1)
        val bySrc = rep.join(d.select(col("doc_id"), col("source")),
            Seq("doc_id"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_contaminated"),
            round(avg(col("contamination")), 6).as("avg_contamination"))
        val totals = d.where(col("doc_id") >= 20)
          .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        totals.join(bySrc, Seq("source"), "left")
          .select(col("source"), col("n_docs"),
            coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
            coalesce(col("avg_contamination"), lit(0.0))
              .as("avg_contamination"),
            round(coalesce(col("n_contaminated"), lit(0L)).cast("double") /
              col("n_docs"), 6).as("contaminated_frac"))
          .orderBy("source")
      },
      Some(contaminationBySourceOracle)),

    // --- exact payload dedup ledger by content hash (copies + bytes
    //     reclaimable; keeper = smallest id)
    ("m06_payload_dedup",
      (s, dir) => Multimodal.payloadAudit(
          // the corpus has no exact text dups — inject two boilerplate
          // payload classes by id residue (same CASE in the oracle) so
          // the ledger's grouping/keeper/bytes math is exercised
          docs(s, dir).select(col("doc_id"),
            encode(when(col("doc_id") % 5 === 4,
                lit("CANONICAL BOILERPLATE PAYLOAD v1"))
              .when(col("doc_id") % 11 === 7,
                lit("TRACKING PIXEL STUB"))
              .otherwise(col("text")), "UTF-8").as("payload")),
          "payload", "doc_id")
        .groupBy(col("content_hash"), col("byte_len"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
        .where(col("n_copies") >= 2)
        .select(col("keeper"), col("n_copies"), col("byte_len"),
          ((col("n_copies") - 1) * col("byte_len")).as("bytes_saved"),
          col("content_hash"))
        .orderBy("keeper"),
      Some("""WITH p AS (SELECT doc_id,
             |    CASE WHEN doc_id % 5 = 4
             |           THEN 'CANONICAL BOILERPLATE PAYLOAD v1'
             |         WHEN doc_id % 11 = 7 THEN 'TRACKING PIXEL STUB'
             |         ELSE text END AS t
             |  FROM documents)
             |SELECT min(doc_id) AS keeper,
             |       CAST(count(*) AS BIGINT) AS n_copies,
             |       CAST(octet_length(encode(min(t))) AS BIGINT)
             |         AS byte_len,
             |       CAST((count(*) - 1) * octet_length(encode(min(t)))
             |         AS BIGINT) AS bytes_saved,
             |       sha256(min(t)) AS content_hash
             |FROM p GROUP BY t HAVING count(*) >= 2
             |ORDER BY keeper""".stripMargin)),

    // --- pooled retention half-life (log-linear decay fit)
    ("e44_retention_halflife",
      (s, dir) => Sessionize.retentionHalfLife(evts(s, dir))
        .select(col("n_points"), round(col("slope"), 6).as("slope"),
          round(col("intercept"), 6).as("intercept"),
          round(col("half_life_days"), 6).as("half_life_days")),
      Some("""WITH d AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day
             |           FROM events),
             |f AS (SELECT u, min(day) AS d0 FROM d GROUP BY 1),
             |b AS (SELECT CAST(count(*) AS DOUBLE) AS base FROM f),
             |k AS (SELECT datediff('day', f.d0, d.day) AS k FROM d
             |      JOIN f ON d.u = f.u
             |      WHERE datediff('day', f.d0, d.day) >= 1),
             |p AS (SELECT CAST(k.k AS DOUBLE) AS x,
             |        ln(CAST(count(*) AS DOUBLE) / b.base) AS y
             |      FROM k CROSS JOIN b GROUP BY k.k, b.base),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
             |        sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx FROM p),
             |fit AS (SELECT n,
             |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
             |    (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
             |      AS intercept
             |  FROM s)
             |SELECT n AS n_points, round(slope, 6) AS slope,
             |       round(intercept, 6) AS intercept,
             |       round(CASE WHEN slope >= 0 THEN 0.0
             |             ELSE -ln(2.0) / slope END, 6) AS half_life_days
             |FROM fit""".stripMargin)),

    // --- leave-one-out source valuation on mean quality
    ("p24_loo_value",
      (s, dir) => Pipeline.sourceLooValue(docs(s, dir))
        .select(col("source"), col("n_docs"),
          round(col("avg_quality"), 6).as("avg_quality"),
          round(col("loo_delta"), 6).as("loo_delta"))
        .orderBy("source"),
      Some(looValueOracle)),

    // --- week-over-week change per event type (ISO-Monday weeks)
    ("e43_wow_change",
      (s, dir) => {
        val weekly = evts(s, dir)
          .groupBy(col("event_type"),
            date_format(date_trunc("week", col("ts")), "yyyy-MM-dd")
              .as("week"))
          .agg(count(lit(1)).as("n_events"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("week"))
        weekly.withColumn("prev_n", lag(col("n_events"), 1).over(w))
          .withColumn("pct_change",
            round((col("n_events") - col("prev_n")).cast("double") /
              col("prev_n"), 6))
          .orderBy("event_type", "week")
      },
      Some("""WITH w AS (SELECT event_type,
             |    strftime(date_trunc('week', CAST(ts AS TIMESTAMP)),
             |             '%Y-%m-%d') AS week,
             |    CAST(count(*) AS BIGINT) AS n_events
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, week, n_events,
             |  lag(n_events) OVER (PARTITION BY event_type ORDER BY week)
             |    AS prev_n,
             |  round(CAST(n_events - lag(n_events) OVER
             |          (PARTITION BY event_type ORDER BY week) AS DOUBLE)
             |        / lag(n_events) OVER
             |          (PARTITION BY event_type ORDER BY week), 6)
             |    AS pct_change
             |FROM w ORDER BY event_type, week""".stripMargin)),

    // --- deterministic 80/10/10 split matrix by hash decile,
    //     stratification report per language
    ("p23_split_matrix",
      (s, dir) => {
        val h = graft.ops.Hashing.mulHash(col("doc_id")) % 10
        val split = when(h < 8, lit("train"))
          .when(h === 8, lit("val")).otherwise(lit("test"))
        val counts = docs(s, dir).select(col("lang"), split.as("split"))
          .groupBy("lang", "split").agg(count(lit(1)).as("n_docs"))
        val totals = counts.groupBy("lang").agg(sum("n_docs").as("__t"))
        counts.join(broadcast(totals), Seq("lang"))
          .select(col("lang"), col("split"), col("n_docs"),
            round(col("n_docs").cast("double") / col("__t"), 6).as("frac"))
          .orderBy("lang", "split")
      },
      Some("""WITH s AS (SELECT lang,
             |    CASE WHEN (doc_id*2654435761)%1000000007 % 10 < 8
             |           THEN 'train'
             |         WHEN (doc_id*2654435761)%1000000007 % 10 = 8
             |           THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM documents),
             |c AS (SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs
             |      FROM s GROUP BY 1, 2),
             |t AS (SELECT lang, sum(n_docs) AS t FROM c GROUP BY 1)
             |SELECT c.lang AS lang, c.split AS split, c.n_docs AS n_docs,
             |       round(CAST(c.n_docs AS DOUBLE) / t.t, 6) AS frac
             |FROM c JOIN t ON c.lang = t.lang
             |ORDER BY c.lang, c.split""".stripMargin)),

    // --- partition-column advisory (round 11): for each candidate
    //     column, what partitionBy would produce — directory count,
    //     skew, estimated files at the target, small-file share —
    //     plus a verdict; the pre-write sibling of b03's pruning sim
    ("b08_partition_advisory",
      (s, dir) => Bucketing.partitionPlanAdvisory(
          graft.cypher.GraphCatalog.cachedParquet(s, s"$dir/orders.parquet"),
          Seq("o_orderpriority", "o_orderstatus", "o_custkey"),
          targetRowsPerFile = 1000L, maxPartitions = 1000L)
        .select(col("part_col"), col("n_partitions"), col("rows_total"),
          round(col("mean_rows"), 6).as("mean_rows"), col("max_rows"),
          round(col("skew"), 6).as("skew"), col("est_files"),
          round(col("small_file_share"), 6).as("small_file_share"),
          col("verdict"))
        .orderBy("part_col"),
      Some("""WITH g AS (
             |  SELECT 'o_orderpriority' AS part_col,
             |         o_orderpriority::VARCHAR AS k, count(*) AS n
             |  FROM orders GROUP BY 1, 2
             |  UNION ALL
             |  SELECT 'o_orderstatus', o_orderstatus::VARCHAR, count(*)
             |  FROM orders GROUP BY 1, 2
             |  UNION ALL
             |  SELECT 'o_custkey', o_custkey::VARCHAR, count(*)
             |  FROM orders GROUP BY 1, 2),
             |a AS (
             |  SELECT part_col, count(*) AS np,
             |         CAST(sum(n) AS BIGINT) AS rt,
             |         CAST(max(n) AS BIGINT) AS mx,
             |         CAST(sum(CAST(ceil(CAST(n AS DOUBLE) / 1000)
             |           AS BIGINT)) AS BIGINT) AS ef,
             |         sum(CASE WHEN n < 250 THEN 1 ELSE 0 END) AS sm
             |  FROM g GROUP BY 1)
             |SELECT part_col, np AS n_partitions, rt AS rows_total,
             |       round(CAST(rt AS DOUBLE) / np, 6) AS mean_rows,
             |       mx AS max_rows,
             |       round(CAST(mx AS DOUBLE) * np / rt, 6) AS skew,
             |       ef AS est_files,
             |       round(CAST(sm AS DOUBLE) / np, 6)
             |         AS small_file_share,
             |       CASE WHEN np > 1000 THEN 'too_many_partitions'
             |            WHEN np < 4 THEN 'too_coarse'
             |            WHEN CAST(mx AS DOUBLE) * np / rt > 10.0
             |              THEN 'skewed'
             |            ELSE 'ok' END AS verdict
             |FROM a ORDER BY part_col""".stripMargin)),

    // --- file-skipping simulation: the b01 Z-order ledger against the
    //     hot predicate box (hours 9–12, user buckets 0–7)
    ("b03_pruning_sim",
      (s, dir) => {
        val e = evts(s, dir)
        val ledger = Bucketing.zorderLayout(
          e.select(col("event_id"), hour(col("ts")).as("hod"),
            pmod(col("user_id"), lit(32)).cast("long").as("ub")),
          "hod", "ub", "event_id", bits = 5, rowsPerFile = 1000)
        Bucketing.pruningSim(ledger, xLo = 9L, xHi = 12L, yLo = 0L, yHi = 7L)
          .select(col("n_files"), col("n_scanned"), col("n_pruned"),
            col("rows_total"), col("rows_scanned"),
            round(col("file_scan_frac"), 6).as("file_scan_frac"),
            round(col("row_scan_frac"), 6).as("row_scan_frac"))
      },
      Some("""WITH e0 AS (
             |  SELECT event_id, EXTRACT(hour FROM ts) AS x,
             |         user_id % 32 AS y
             |  FROM events),
             |z AS (SELECT event_id, x, y,
             |    (x // 1) % 2 * 1 + (y // 1) % 2 * 2
             |  + (x // 2) % 2 * 4 + (y // 2) % 2 * 8
             |  + (x // 4) % 2 * 16 + (y // 4) % 2 * 32
             |  + (x // 8) % 2 * 64 + (y // 8) % 2 * 128
             |  + (x // 16) % 2 * 256 + (y // 16) % 2 * 512 AS zc
             |  FROM e0),
             |r AS (SELECT x, y,
             |    CAST(floor((row_number() OVER (ORDER BY zc, event_id) - 1)
             |      / 1000) AS BIGINT) AS file_id
             |  FROM z),
             |l AS (SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
             |    min(x) AS min_x, max(x) AS max_x,
             |    min(y) AS min_y, max(y) AS max_y
             |  FROM r GROUP BY 1),
             |c AS (SELECT n_rows,
             |    NOT (max_x < 9 OR min_x > 12 OR max_y < 0 OR min_y > 7)
             |      AS scanned
             |  FROM l)
             |SELECT CAST(count(*) AS BIGINT) AS n_files,
             |  CAST(sum(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_scanned,
             |  CAST(sum(CASE WHEN scanned THEN 0 ELSE 1 END) AS BIGINT)
             |    AS n_pruned,
             |  CAST(sum(n_rows) AS BIGINT) AS rows_total,
             |  CAST(sum(CASE WHEN scanned THEN n_rows ELSE 0 END) AS BIGINT)
             |    AS rows_scanned,
             |  round(CAST(sum(CASE WHEN scanned THEN 1 ELSE 0 END) AS DOUBLE)
             |        / count(*), 6) AS file_scan_frac,
             |  round(CAST(sum(CASE WHEN scanned THEN n_rows ELSE 0 END)
             |          AS DOUBLE) / sum(n_rows), 6) AS row_scan_frac
             |FROM c""".stripMargin)),

    // --- Jaro–Winkler name matching (native codegen kernel) over
    //     distinct part names, first-character blocking
    ("d19_jaro_pairs",
      (s, dir) => Dedup.jaroWinklerPairs(
          graft.cypher.GraphCatalog.cachedParquet(s, s"$dir/part.parquet"),
          "p_name", threshold = 0.85, blockChars = 1)
        .select(col("name_a"), col("name_b"), round(col("jw"), 6).as("jw"))
        .orderBy("name_a", "name_b"),
      Some("""WITH n AS (SELECT DISTINCT p_name AS name FROM part)
             |SELECT a.name AS name_a, b.name AS name_b,
             |       round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
             |FROM n a JOIN n b
             |  ON left(a.name, 1) = left(b.name, 1) AND a.name < b.name
             |WHERE jaro_winkler_similarity(a.name, b.name) >= 0.85
             |ORDER BY name_a, name_b""".stripMargin)),

    // --- bad-record quarantine routing: deterministic corruption
    //     injection, parse-or-quarantine split (the ingest guard)
    ("e39_parse_quarantine",
      (s, dir) => {
        val p2 = when(col("event_id") % 13 === 5,
          concat(lit("{"), col("props"))).otherwise(col("props"))
        // PERMISSIVE from_json yields a struct of nulls on corrupt
        // input — the quarantine rule is "the REQUIRED field parsed",
        // which also routes schema-drift rows (valid JSON, missing k)
        val parsed = from_json(p2, "k INT", Map.empty[String, String])
        evts(s, dir).select(
            when(parsed.isNull || parsed.getField("k").isNull,
              lit("quarantined"))
              .otherwise(lit("parsed")).as("status"))
          .groupBy("status").agg(count(lit(1)).as("n_rows"))
          .orderBy("status")
      },
      Some("""WITH x AS (SELECT CASE WHEN event_id % 13 = 5
             |            THEN '{' || props ELSE props END AS p2
             |           FROM events)
             |SELECT CASE WHEN json_valid(p2)
             |              AND json_extract(p2, '$.k') IS NOT NULL
             |            THEN 'parsed'
             |       ELSE 'quarantined' END AS status,
             |       CAST(count(*) AS BIGINT) AS n_rows
             |FROM x GROUP BY 1 ORDER BY status""".stripMargin)),

    // --- the e39 parse-quarantine split on a REAL STREAM (round 8):
    //     the stateless from_json route runs inside the streaming
    //     query (per-row status), the replay's accumulated rows
    //     aggregate after — ingest-time quarantine counters
    ("e59_stream_quarantine",
      (s, dir) => {
        import s.implicits._
        val rows = evts(s, dir).where(col("user_id") < 500)
          .select(col("ts"), col("event_id"), col("props"))
          .as[(java.sql.Timestamp, Long, String)].collect()
          .sortBy(r => (r._1.getTime, r._2)).toSeq
        graft.streaming.Replay.run(s,
            graft.streaming.Replay.timeChunks(rows, 3), "append") { ds =>
          val df = ds.toDF("ts", "event_id", "props")
          val p2 = when(col("event_id") % 13 === 5,
            concat(lit("{"), col("props"))).otherwise(col("props"))
          val parsed = from_json(p2, "k INT", Map.empty[String, String])
          df.select(
            when(parsed.isNull || parsed.getField("k").isNull,
              lit("quarantined")).otherwise(lit("parsed")).as("status"))
        }
          .groupBy("status").agg(count(lit(1)).as("n_rows"))
          .orderBy("status")
      },
      Some("""WITH x AS (SELECT CASE WHEN event_id % 13 = 5
             |            THEN '{' || props ELSE props END AS p2
             |           FROM events WHERE user_id < 500)
             |SELECT CASE WHEN json_valid(p2)
             |              AND json_extract(p2, '$.k') IS NOT NULL
             |            THEN 'parsed'
             |       ELSE 'quarantined' END AS status,
             |       CAST(count(*) AS BIGINT) AS n_rows
             |FROM x GROUP BY 1 ORDER BY status""".stripMargin)),

    // --- CUBE aggregation over (event_type, day-of-week)
    ("e40_cube",
      (s, dir) => evts(s, dir)
        .select(col("event_type"), dayofweek(col("ts")).cast("long").as("dow"),
          col("value"))
        .cube(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sv"))
        .orderBy(col("event_type").asc_nulls_first, col("dow").asc_nulls_first),
      Some("""SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
             |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS sv
             |FROM events
             |GROUP BY CUBE (event_type, dow)
             |ORDER BY event_type NULLS FIRST, dow NULLS FIRST""".stripMargin)),

    // --- wide PIVOT: per-day event-type count matrix (fixed columns)
    ("e41_pivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val wide = evts(s, dir)
          .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
            col("event_type"))
          .groupBy("day").pivot("event_type", types).agg(count(lit(1)))
        wide.select(col("day") +: types.map(t =>
            coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy("day")
      },
      Some("""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS click,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS error,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS purchase,
             |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS signup,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS view
             |FROM events GROUP BY 1 ORDER BY day""".stripMargin)),

    // --- UNPIVOT round trip: melt the e41 matrix back to long form —
    //     pinned equal to the plain (day, type) aggregate
    ("e42_unpivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val wide = evts(s, dir)
          .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
            col("event_type"))
          .groupBy("day").pivot("event_type", types).agg(count(lit(1)))
        wide.select(col("day") +: types.map(t =>
            coalesce(col(t), lit(0L)).as(t)): _*)
          .unpivot(Array(col("day")), types.map(col).toArray,
            "event_type", "n")
          .where(col("n") > 0)
          .orderBy("day", "event_type")
      },
      Some("""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             |       event_type, CAST(count(*) AS BIGINT) AS n
             |FROM events GROUP BY 1, 2
             |ORDER BY day, event_type""".stripMargin)),

    // --- eval-integrity canary: plant the benchmark, require the
    //     decontamination stage to catch its own plants
    ("p22_canary_recall",
      (s, dir) => {
        val d = docs(s, dir)
        Pipeline.canaryRecall(d.where(col("doc_id") >= 10),
            d.where(col("doc_id") < 10), "text", "doc_id",
            n = 3, threshold = 0.5)
          .select(col("n_planted"), col("n_caught"), col("n_incidental"),
            round(col("recall"), 6).as("recall"))
      },
      Some(canaryOracle)),

    // --- deterministic random-walk corpus (DeepWalk-style sequences,
    //     hash-argmin next-hop, 3 hops from the %10 sources)
    ("g20_walk_corpus",
      (s, dir) => {
        val srcs = coSupplyEdges(s, dir)
          .select(col("s1").as("s")).union(
            coSupplyEdges(s, dir).select(col("s2").as("s")))
          .distinct().where(col("s") % 10 === 0)
        GraphOps.deterministicWalks(coSupplyEdges(s, dir), "s1", "s2",
            srcs, steps = 3)
          .orderBy("start", "step")
      },
      Some(walkOracle)),

    // --- n-gram novelty vs earlier corpus (memorization/freshness)
    ("t38_novelty",
      (s, dir) => TextOps.ngramNovelty(docs(s, dir), "text", "doc_id", n = 5)
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          round(col("novelty"), 6).as("novelty"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id,
             |    CASE WHEN trim(text) = '' THEN []
             |         ELSE string_split_regex(trim(text), '\\s+') END AS tk
             |  FROM documents),
             |th AS (SELECT doc_id, list_transform(tk, t -> ${sqlFp("t", w31)})
             |         AS th
             |  FROM t),
             |g AS (SELECT doc_id,
             |    CASE WHEN len(th) < 5 THEN []::BIGINT[]
             |         ELSE list_distinct([
             |    ((((((((th[i]*131 + th[i+1]) % 1000000007) * 131
             |        + th[i+2]) % 1000000007) * 131
             |        + th[i+3]) % 1000000007) * 131
             |        + th[i+4]) % 1000000007)
             |    for i in range(1, len(th) - 3)])
             |    END AS gs
             |  FROM th),
             |x AS (SELECT doc_id, unnest(gs) AS gram FROM g),
             |f AS (SELECT gram, min(doc_id) AS fd FROM x GROUP BY 1),
             |nv AS (SELECT x.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             |         CAST(sum(CASE WHEN f.fd = x.doc_id THEN 1 ELSE 0 END)
             |           AS BIGINT) AS n_novel
             |       FROM x JOIN f USING (gram) GROUP BY 1)
             |SELECT g.doc_id AS doc_id,
             |       coalesce(n_grams, 0) AS n_grams,
             |       coalesce(n_novel, 0) AS n_novel,
             |       round(CASE WHEN coalesce(n_grams, 0) = 0 THEN 1.0
             |             ELSE CAST(n_novel AS DOUBLE) / n_grams END, 6)
             |         AS novelty
             |FROM g LEFT JOIN nv ON g.doc_id = nv.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // --- filtered vector search: same-label + id-residue metadata
    //     predicate applied BEFORE the bounded top-k
    ("s29_filtered_ann",
      (s, dir) => Similarity.filteredTopK(embs(s, dir),
          embs(s, dir).where(col("vec_id") < 8), "embedding", "vec_id",
          metaCols = Seq("label"), k = 5,
          predicate = col("c_label") === col("q_label") &&
            col("neighbor_id") % 3 =!= 0)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("query_id", "rank"),
      Some("""WITH e AS (SELECT vec_id, label,
             |            CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |        list_dot_product(q.v, c.v) /
             |          (sqrt(list_dot_product(q.v, q.v)) *
             |           sqrt(list_dot_product(c.v, c.v))) AS cos_sim
             |      FROM e q, e c
             |      WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
             |        AND c.label = q.label AND c.vec_id % 3 <> 0),
             |r AS (SELECT *, row_number() OVER
             |        (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
             |        AS rank FROM s)
             |SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim
             |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // --- Gini value-concentration coefficient per event type
    ("e38_gini",
      (s, dir) => Sessionize.giniByType(evts(s, dir))
        .select(col("event_type"), col("n_users"),
          round(col("gini"), 6).as("gini"))
        .orderBy("event_type"),
      Some("""WITH pu AS (SELECT event_type, user_id AS u,
             |             round(sum(value), 6) AS v
             |            FROM events GROUP BY 1, 2),
             |r AS (SELECT event_type, v,
             |        CAST(row_number() OVER (PARTITION BY event_type
             |          ORDER BY v, u) AS DOUBLE) AS rk
             |      FROM pu),
             |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
             |        sum(v) AS sv, sum(rk * v) AS srv FROM r GROUP BY 1)
             |SELECT event_type, n_users,
             |       round(CASE WHEN sv = 0 THEN 0.0
             |             ELSE 2.0 * srv / (n_users * sv)
             |                  - (n_users + 1.0) / n_users END, 6) AS gini
             |FROM g ORDER BY event_type""".stripMargin)),

    // --- farthest-point (k-center greedy) diversity selection, 5
    //     picks, 9-dp distance determinism contract
    ("s28_farthest_points",
      (s, dir) => Similarity.farthestPoints(embs(s, dir), "embedding",
          "vec_id", k = 5)
        .orderBy("sel_idx"),
      Some(farthestOracle)),

    // --- RFM segmentation: exact quintile cutpoints, inverted recency
    ("e37_rfm",
      (s, dir) => Sessionize.rfmSegments(evts(s, dir))
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary"), col("r_score"), col("f_score"), col("m_score"),
          col("segment"))
        .orderBy("user_id"),
      Some(rfmOracle)),

    // --- budget-bounded tokenizer-training sample in hash order
    ("p21_tokenizer_sample",
      (s, dir) => Pipeline.tokenizerSample(docs(s, dir), "text", "doc_id",
          tokenBudget = 5000L)
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |    CASE WHEN trim(text) = '' THEN 0
             |         ELSE len(string_split_regex(trim(text), '\s+'))
             |    END AS n
             |  FROM documents),
             |o AS (SELECT doc_id, n,
             |    sum(n) OVER (ORDER BY (doc_id*2654435761)%1000000007,
             |      doc_id ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM t)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             |       CAST(cum AS BIGINT) AS cum_tokens
             |FROM o WHERE cum - n < 5000 ORDER BY doc_id""".stripMargin)),

    // --- modality router on magic bytes (PNG/JPEG/RIFF prefixes
    //     injected deterministically by doc_id residue)
    ("m05_modality_route",
      (s, dir) => {
        val png = lit(Array[Byte](0x89.toByte, 'P', 'N', 'G'))
        val jfif = lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
          0xe0.toByte))
        val exif = lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
          0xe1.toByte))
        val riff = lit("RIFF".getBytes("US-ASCII"))
        // doc_id % 4 == 1 are JPEGs; the % 8 == 5 half carry the EXIF
        // (FF D8 FF E1) marker — both must route image/jpeg
        val payload = when(col("doc_id") % 4 === 0,
            concat(png, encode(col("text"), "UTF-8")))
          .when(col("doc_id") % 8 === 1,
            concat(jfif, encode(col("text"), "UTF-8")))
          .when(col("doc_id") % 8 === 5,
            concat(exif, encode(col("text"), "UTF-8")))
          .when(col("doc_id") % 4 === 2,
            concat(riff, encode(col("text"), "UTF-8")))
          .otherwise(encode(col("text"), "UTF-8"))
        Multimodal.modalityRoute(
            docs(s, dir).select(col("doc_id"), payload.as("payload")),
            "payload")
          .select(col("modality"), col("n_payloads"), col("total_bytes"),
            round(col("avg_bytes"), 6).as("avg_bytes"))
          .orderBy("modality")
      },
      Some("""WITH p AS (SELECT doc_id,
             |    CASE WHEN doc_id % 4 = 0
             |           THEN '\x89PNG'::BLOB || encode(text)
             |         WHEN doc_id % 8 = 1
             |           THEN '\xFF\xD8\xFF\xE0'::BLOB || encode(text)
             |         WHEN doc_id % 8 = 5
             |           THEN '\xFF\xD8\xFF\xE1'::BLOB || encode(text)
             |         WHEN doc_id % 4 = 2
             |           THEN 'RIFF'::BLOB || encode(text)
             |         ELSE encode(text) END AS pl
             |  FROM documents),
             |r AS (SELECT CASE
             |        WHEN left(hex(pl), 8) = '89504E47' THEN 'image/png'
             |        WHEN left(hex(pl), 6) = 'FFD8FF' THEN 'image/jpeg'
             |        WHEN left(hex(pl), 8) = '52494646' THEN 'audio/riff'
             |        ELSE 'text/plain' END AS modality,
             |        octet_length(pl) AS n
             |      FROM p)
             |SELECT modality, CAST(count(*) AS BIGINT) AS n_payloads,
             |       CAST(sum(n) AS BIGINT) AS total_bytes,
             |       round(avg(CAST(n AS DOUBLE)), 6) AS avg_bytes
             |FROM r GROUP BY 1 ORDER BY modality""".stripMargin)),

    // --- RM1 pseudo-relevance-feedback expansion terms off the s11
    //     BM25 run (top-10 feedback docs, top-5 terms, query terms
    //     excluded)
    ("s27_prf_terms",
      (s, dir) => {
        import s.implicits._
        val qs = Seq((0L, "hash join order"), (1L, "fast scan filter"),
          (2L, "stream window agg")).toDF("query_id", "qtext")
        Retrieval.prfExpansionTerms(docs(s, dir), qs, "text", "doc_id",
            "query_id", "qtext", kDocs = 10, mTerms = 5)
          .select(col("query_id"), col("term"), col("rank"),
            round(col("weight"), 6).as("weight"))
          .orderBy("query_id", "rank")
      },
      Some(prfOracle)),

    // --- hour-of-day seasonality strength (one-way ANOVA R² of
    //     hourly counts vs hour-of-day means) + peak hour
    ("e35_seasonality",
      (s, dir) => Sessionize.seasonalityR2(evts(s, dir))
        .select(col("event_type"), col("n_hours"),
          round(col("seasonality_r2"), 6).as("seasonality_r2"),
          col("peak_hour"))
        .orderBy("event_type"),
      Some("""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hh,
             |            CAST(count(*) AS DOUBLE) AS n
             |           FROM events GROUP BY 1, 2),
             |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
             |        avg(n) AS mu FROM h GROUP BY 1),
             |sst AS (SELECT h.event_type,
             |          sum((h.n - t.mu) * (h.n - t.mu)) AS sst
             |        FROM h JOIN t USING (event_type) GROUP BY 1),
             |bh AS (SELECT event_type,
             |         CAST(hour(hh) AS BIGINT) AS hod,
             |         CAST(count(*) AS BIGINT) AS nh, avg(n) AS mh
             |       FROM h GROUP BY 1, 2),
             |ssb AS (SELECT bh.event_type,
             |          sum(bh.nh * (bh.mh - t.mu) * (bh.mh - t.mu)) AS ssb
             |        FROM bh JOIN t USING (event_type) GROUP BY 1),
             |pk AS (SELECT event_type, hod AS peak_hour FROM
             |         (SELECT event_type, hod, row_number() OVER
             |            (PARTITION BY event_type
             |             ORDER BY round(mh, 6) DESC, hod) AS r FROM bh)
             |       WHERE r = 1)
             |SELECT t.event_type, t.n_hours,
             |       round(CASE WHEN sst.sst = 0 THEN 0.0
             |             ELSE ssb.ssb / sst.sst END, 6) AS seasonality_r2,
             |       pk.peak_hour
             |FROM t JOIN sst USING (event_type) JOIN ssb USING (event_type)
             |JOIN pk USING (event_type)
             |ORDER BY event_type""".stripMargin)),

    // --- level-1 association rules over (user, day) event baskets
    ("e36_assoc_rules",
      (s, dir) => Sessionize.assocRules(evts(s, dir))
        .select(col("ante"), col("cons"), col("n_ab"),
          round(col("support"), 6).as("support"),
          round(col("confidence"), 6).as("confidence"),
          round(col("lift"), 6).as("lift"))
        .orderBy("ante", "cons"),
      Some("""WITH it AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d,
             |             event_type AS item FROM events),
             |nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM
             |         (SELECT DISTINCT u, d FROM it)),
             |ia AS (SELECT item, CAST(count(*) AS BIGINT) AS na
             |       FROM it GROUP BY 1),
             |pr AS (SELECT a.item AS x, b.item AS y,
             |         CAST(count(*) AS BIGINT) AS n_ab
             |       FROM it a JOIN it b
             |         ON a.u = b.u AND a.d = b.d AND a.item < b.item
             |       GROUP BY 1, 2),
             |bi AS (SELECT x AS ante, y AS cons, n_ab FROM pr
             |       UNION ALL SELECT y, x, n_ab FROM pr)
             |SELECT bi.ante, bi.cons, bi.n_ab,
             |       round(CAST(bi.n_ab AS DOUBLE) / nb.nb, 6) AS support,
             |       round(CAST(bi.n_ab AS DOUBLE) / ja.na, 6) AS confidence,
             |       round(CAST(nb.nb AS DOUBLE) * bi.n_ab
             |             / (CAST(ja.na AS DOUBLE) * jc.na), 6) AS lift
             |FROM bi CROSS JOIN nb
             |JOIN ia ja ON ja.item = bi.ante
             |JOIN ia jc ON jc.item = bi.cons
             |ORDER BY ante, cons""".stripMargin)),

    // --- graph card for the directed nation trade graph (size,
    //     density, degree shape, reciprocity as metric rows)
    ("g19_graph_card",
      (s, dir) => {
        def t(n: String) = graft.cypher.GraphCatalog
          .cachedParquet(s, s"$dir/$n.parquet")
        val e = t("lineitem").join(t("orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(t("customer"), col("o_custkey") === col("c_custkey"))
          .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
          .where(col("l_quantity") >= 50 && col("l_discount") >= 0.1)
          .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        GraphOps.graphCard(e, "src", "dst").orderBy("metric")
      },
      Some("""WITH e AS (SELECT DISTINCT c.c_nationkey AS src,
             |             s.s_nationkey AS dst
             |           FROM lineitem l
             |           JOIN orders o ON l.l_orderkey = o.o_orderkey
             |           JOIN customer c ON o.o_custkey = c.c_custkey
             |           JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |           WHERE l.l_quantity >= 50 AND l.l_discount >= 0.1
             |             AND c.c_nationkey <> s.s_nationkey),
             |v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM
             |        (SELECT DISTINCT node FROM (SELECT src AS node FROM e
             |         UNION ALL SELECT dst FROM e))),
             |en AS (SELECT CAST(count(*) AS BIGINT) AS e FROM e),
             |od AS (SELECT max(d) AS mx, avg(d) AS av FROM
             |         (SELECT src, CAST(count(*) AS DOUBLE) AS d
             |          FROM e GROUP BY 1)),
             |rc AS (SELECT CAST(count(*) AS BIGINT) AS r FROM e a
             |       WHERE EXISTS (SELECT 1 FROM e b
             |         WHERE b.src = a.dst AND b.dst = a.src))
             |SELECT * FROM (
             |SELECT 'n_nodes' AS metric, CAST(v.v AS DOUBLE) AS value FROM v
             |UNION ALL SELECT 'n_edges', CAST(en.e AS DOUBLE) FROM en
             |UNION ALL SELECT 'density',
             |  round(CAST(en.e AS DOUBLE) / (CAST(v.v AS DOUBLE) * (v.v - 1)),
             |        6) FROM en CROSS JOIN v
             |UNION ALL SELECT 'avg_out_degree', round(od.av, 6) FROM od
             |UNION ALL SELECT 'max_out_degree', CAST(od.mx AS DOUBLE) FROM od
             |UNION ALL SELECT 'reciprocity',
             |  round(CAST(rc.r AS DOUBLE) / en.e, 6) FROM rc CROSS JOIN en)
             |ORDER BY metric""".stripMargin)),

    // --- bounded-doubling SCC over the directed nation trade graph
    //     (customer-nation → supplier-nation flows; 3 doubling rounds
    //     = 8-hop closure, exact at this diameter; min-label components)
    ("g18_scc",
      (s, dir) => {
        def t(n: String) = graft.cypher.GraphCatalog
          .cachedParquet(s, s"$dir/$n.parquet")
        val e = t("lineitem").join(t("orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(t("customer"), col("o_custkey") === col("c_custkey"))
          .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
          .where(col("l_quantity") >= 50 && col("l_discount") >= 0.1 &&
            col("c_nationkey") =!= col("s_nationkey"))
          .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        GraphOps.sccBounded(e, "src", "dst", rounds = 3)
          .orderBy("node")
      },
      Some(sccOracle)))

  /** DuckDB mirror of p20: the same quality/token formulas, one
    * aggregate, metric rows unioned. */
  private lazy val datasetCardOracle: String =
    s"""WITH h AS (
       |  $sqlTextFeatures),
       |q0 AS (SELECT doc_id, text, n_chars, n_tok,
       |        $sqlQuality AS qual FROM h),
       |q AS (SELECT q0.*, d.lang, d.source
       |      FROM q0 JOIN documents d ON q0.doc_id = d.doc_id)
       |SELECT * FROM (
       |SELECT 'n_docs' AS metric, CAST(count(*) AS DOUBLE) AS value FROM q
       |UNION ALL SELECT 'n_tokens', CAST(sum(n_tok) AS DOUBLE) FROM q
       |UNION ALL SELECT 'n_sources', CAST(count(DISTINCT source) AS DOUBLE)
       |  FROM q
       |UNION ALL SELECT 'n_langs', CAST(count(DISTINCT lang) AS DOUBLE) FROM q
       |UNION ALL SELECT 'exact_dup_rate',
       |  round(1.0 - CAST(count(DISTINCT text) AS DOUBLE) / count(*), 6)
       |  FROM q
       |UNION ALL SELECT 'mean_quality', round(avg(qual), 6) FROM q
       |UNION ALL SELECT 'p50_tokens', CAST(quantile_disc(n_tok, 0.5)
       |  AS DOUBLE) FROM q
       |UNION ALL SELECT 'p95_tokens', CAST(quantile_disc(n_tok, 0.95)
       |  AS DOUBLE) FROM q
       |UNION ALL SELECT 'mean_chars', round(avg(CAST(n_chars AS DOUBLE)), 6)
       |  FROM q)
       |ORDER BY metric""".stripMargin

  /** DuckDB mirror of g18: same derived edge set, three closure
    * doublings (UNION dedupes), mutual-reach min labeling. */
  private lazy val sccOracle: String = {
    def dbl(k: Int): String =
      s"""r$k AS (SELECT src, dst FROM r${k - 1}
         |      UNION
         |      SELECT a.src, b.dst FROM r${k - 1} a
         |      JOIN r${k - 1} b ON a.dst = b.src)""".stripMargin
    s"""WITH e AS (SELECT DISTINCT c.c_nationkey AS src,
       |             s.s_nationkey AS dst
       |           FROM lineitem l
       |           JOIN orders o ON l.l_orderkey = o.o_orderkey
       |           JOIN customer c ON o.o_custkey = c.c_custkey
       |           JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |           WHERE l.l_quantity >= 50 AND l.l_discount >= 0.1
       |             AND c.c_nationkey <> s.s_nationkey),
       |r0 AS (SELECT src, dst FROM e),
       |${dbl(1)},
       |${dbl(2)},
       |${dbl(3)},
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |mut AS (SELECT a.src AS v, a.dst AS w FROM r3 a
       |        JOIN r3 b ON a.src = b.dst AND a.dst = b.src),
       |m AS (SELECT v, min(w) AS mw FROM mut GROUP BY 1)
       |SELECT n.node AS node,
       |       least(n.node, coalesce(m.mw, n.node)) AS component
       |FROM nodes n LEFT JOIN m ON n.node = m.v
       |ORDER BY node""".stripMargin
  }

  /** DuckDB mirror of s25: per-pair sign-mismatch count via an index
    * filter, (hamming, id)-ordered shortlist, exact-cosine rerank. */
  private lazy val binaryHammingOracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |           FROM embeddings),
      |h AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |        len(list_filter(range(1, len(q.v) + 1),
      |          i -> (q.v[i] > 0) <> (c.v[i] > 0))) AS hamming,
      |        list_dot_product(q.v, c.v) /
      |          (sqrt(list_dot_product(q.v, q.v)) *
      |           sqrt(list_dot_product(c.v, c.v))) AS cos_sim
      |      FROM e q, e c WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
      |sl AS (SELECT * FROM
      |         (SELECT *, row_number() OVER
      |            (PARTITION BY query_id ORDER BY hamming, neighbor_id)
      |            AS r FROM h)
      |       WHERE r <= 32),
      |rr AS (SELECT query_id, neighbor_id, hamming, cos_sim,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY cos_sim DESC, neighbor_id) AS rank
      |       FROM sl)
      |SELECT query_id, neighbor_id, rank,
      |       CAST(hamming AS BIGINT) AS hamming,
      |       round(cos_sim, 6) AS cos_sim
      |FROM rr WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** DuckDB mirror of p19: the shared text-feature CTE + lang argmax +
    * quality + code-score formulas, cumulative gate conjunctions,
    * stages unioned from the 1-row counter aggregate. */
  private lazy val attritionOracle: String = {
    val gates = Seq("g1", "g2", "g3", "g4")
    val cum = gates.indices.map(i => gates.take(i + 1).mkString(" AND "))
    val aggs = ("CAST(count(*) AS BIGINT) AS d0, " +
      "CAST(sum(n_tok) AS BIGINT) AS t0") +: cum.zipWithIndex.map {
      case (c, i) =>
        s"""CAST(sum(CASE WHEN $c THEN 1 ELSE 0 END) AS BIGINT) AS d${i + 1},
           |   CAST(sum(CASE WHEN $c THEN n_tok ELSE 0 END) AS BIGINT)
           |     AS t${i + 1}""".stripMargin
    }
    val names = Seq("raw", "min_tokens", "lang_known", "quality", "not_code")
    val rows = names.zipWithIndex.map { case (n, i) =>
      s"""SELECT CAST($i AS BIGINT) AS stage, '$n' AS gate,
         |  d$i AS n_docs, t$i AS n_tokens,
         |  round(CAST(d$i AS DOUBLE) / d0, 6) AS doc_frac,
         |  round(CAST(t$i AS DOUBLE) / t0, 6) AS token_frac FROM a""".stripMargin
    }
    s"""WITH h AS (
       |  $sqlTextFeatures),
       |l AS (SELECT *, $sqlBest AS best FROM h),
       |g AS (SELECT n_tok,
       |    n_tok >= 20 AS g1,
       |    ($sqlLangCase) <> 'und' AS g2,
       |    ($sqlQuality) >= 0.45 AS g3,
       |    (length(regexp_extract_all(text, '[{}();=<>\\[\\]]')) * 2.0
       |     + length(regexp_extract_all(text, '(?m)^(?:    |\\t)')) * 3.0)
       |      / (length(text) + 1.0) <= 0.06 AS g4
       |  FROM l),
       |a AS (SELECT ${aggs.mkString(",\n   ")} FROM g)
       |SELECT * FROM (
       |${rows.mkString("\nUNION ALL\n")})
       |ORDER BY stage""".stripMargin
  }

  // ---- shared DuckDB mirrors of the TextOps formulas (lock-step with
  //      the Scala implementations; asserted by t02/p01 oracle matches)

  /** CTE computing per-doc marker hits / token / stopword / punct counts. */
  private lazy val sqlTextFeatures: String = {
    val hitExprs = TextOps.LangMarkers.map { case (l, pat) =>
      s"len(regexp_extract_all(lower(text), '$pat')) AS h_$l"
    }.mkString(",\n    ")
    s"""SELECT doc_id, text, n_chars,
       |    $hitExprs,
       |    CASE WHEN trim(text) = '' THEN 0
       |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok,
       |    len(regexp_extract_all(text, '(?i)\\b(the|a|an|and|of|to|in|is)\\b'))
       |      AS n_stop,
       |    len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
       |  FROM documents""".stripMargin
  }

  private lazy val sqlBest: String =
    "greatest(" + TextOps.LangMarkers.map("h_" + _._1).mkString(", ") + ")"

  private lazy val sqlLangCase: String = {
    val chain = TextOps.LangMarkers.map { case (l, _) =>
      s"WHEN h_$l = best THEN '$l'"
    }.mkString(" ")
    s"CASE WHEN best = 0 THEN 'und' $chain ELSE 'und' END"
  }

  private lazy val sqlQuality: String =
    """least(n_chars / 400.0, 1.0) * 0.5 +
      |    least((CASE WHEN n_tok = 0 THEN 0.0
      |                ELSE CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) END)
      |          * 4.0, 1.0) * 0.3 +
      |    (1.0 - least((CASE WHEN n_chars = 0 THEN 0.0
      |                       ELSE CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)
      |                  END) * 10.0, 1.0)) * 0.2""".stripMargin

  /** DuckDB mirror of e28: per-user lead() transitions → row-stochastic
    * P → three unrolled power-iteration rounds, L1-renormalized. */
  private lazy val markovOracle: String = {
    def round(k: Int): String =
      s"""m$k AS (SELECT p.t AS ty, sum(pi${k - 1}.pi * p.p) AS m
         |       FROM p JOIN pi${k - 1} ON pi${k - 1}.ty = p.f GROUP BY 1),
         |s$k AS (SELECT sum(m) AS s FROM m$k),
         |pi$k AS (SELECT ty.ty, coalesce(m$k.m, 0) / (SELECT s FROM s$k) AS pi
         |        FROM ty LEFT JOIN m$k ON ty.ty = m$k.ty)""".stripMargin
    s"""WITH nx AS (SELECT event_type AS f,
       |        lead(event_type) OVER
       |          (PARTITION BY user_id ORDER BY ts, event_id) AS t
       |      FROM events),
       |tr AS (SELECT f, t, count(*) AS n FROM nx
       |       WHERE t IS NOT NULL GROUP BY 1, 2),
       |tt AS (SELECT f, sum(n) AS tn FROM tr GROUP BY 1),
       |p AS (SELECT tr.f, tr.t, CAST(tr.n AS DOUBLE) / tt.tn AS p
       |      FROM tr JOIN tt ON tr.f = tt.f),
       |ty AS (SELECT DISTINCT ty FROM
       |        (SELECT f AS ty FROM p UNION ALL SELECT t FROM p)),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ty),
       |pi0 AS (SELECT ty, 1.0 / (SELECT n FROM nn) AS pi FROM ty),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT ty AS event_type, round(pi, 6) AS pi FROM pi3
       |ORDER BY event_type""".stripMargin
  }

  /** DuckDB mirror of t34's Gopher rules (lock-step with
    * TextOps.gopherGate; the stopword list is the fixed 8-word set). */
  private lazy val gopherOracle: String = {
    val stops = Seq("the", "a", "an", "and", "of", "to", "in", "is")
    val ns = stops.map(s =>
      s"(CASE WHEN regexp_matches(lower(text), '\\b$s\\b') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH c AS (SELECT doc_id, text,
       |    regexp_extract_all(text, '[A-Za-z]+') AS words,
       |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
       |         ELSE string_split_regex(trim(text), '\\s+') END AS toks,
       |    string_split(text, chr(10)) AS ls
       |  FROM documents),
       |m AS (SELECT doc_id,
       |    CAST(len(words) AS BIGINT) AS n_words,
       |    CASE WHEN len(words) = 0 THEN 0.0
       |         ELSE CAST(list_sum(list_transform(words, x -> length(x)))
       |                AS DOUBLE) / len(words) END AS mwl,
       |    CAST(len(list_filter(ls, l -> regexp_matches(trim(l), '^[-*•]')))
       |      AS DOUBLE) / len(ls) AS br,
       |    CAST(len(list_filter(ls,
       |           l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$$')))
       |      AS DOUBLE) / len(ls) AS er,
       |    CASE WHEN len(words) = 0 THEN 0.0
       |         ELSE CAST(len(regexp_extract_all(text, '[#…]')) AS DOUBLE)
       |                / len(words) END AS sr,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |         ELSE CAST(len(list_filter(toks,
       |                t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
       |                / len(toks) END AS ar,
       |    CAST($ns AS BIGINT) AS ns
       |  FROM c)
       |SELECT doc_id, n_words, round(mwl, 6) AS mean_word_len,
       |  round(br, 6) AS bullet_ratio, round(er, 6) AS ellipsis_ratio,
       |  round(sr, 6) AS symbol_ratio, round(ar, 6) AS alpha_ratio,
       |  ns AS n_stop_distinct,
       |  (n_words BETWEEN 10 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
       |   AND br <= 0.9 AND er <= 0.3 AND sr <= 0.1 AND ar >= 0.8
       |   AND ns >= 2) AS pass
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** DuckDB mirror of t35 (same injection CASE, then the same artifact
    * counters; DuckDB regexp_replace needs the explicit 'g' flag to
    * match Spark's replace-all). */
  private lazy val mojibakeOracle: String =
    """WITH x AS (SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN regexp_replace(text, 'e', 'Ã©', 'g')
      |         WHEN doc_id % 11 = 3 THEN regexp_replace(text, 'a', '�', 'g')
      |         WHEN doc_id % 13 = 5 THEN text || chr(7)
      |         ELSE text END AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t, '�')) AS BIGINT) AS n_replacement,
      |  CAST(len(regexp_extract_all(t,
      |    '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS BIGINT) AS n_ctrl,
      |  CAST(len(regexp_extract_all(t, 'â€[™œ“¦]|Ã[©¨¤¶¼±]')) AS BIGINT)
      |    AS n_mojibake,
      |  round(CASE WHEN length(t) = 0 THEN 0.0
      |        ELSE CAST(len(regexp_extract_all(t, '[^\x00-\x7F]')) AS DOUBLE)
      |               / length(t) END, 6) AS nonascii_ratio,
      |  (len(regexp_extract_all(t, '�')) > 0
      |   OR len(regexp_extract_all(t, '[\x00-\x08\x0B\x0C\x0E-\x1F]')) > 0
      |   OR len(regexp_extract_all(t, 'â€[™œ“¦]|Ã[©¨¤¶¼±]')) > 0) AS suspect
      |FROM x ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of t36: unnest whitespace tokens, per-(doc, token)
    * histogram, five counters + TTR / hapax / Yule's K. */
  private lazy val lexicalDiversityOracle: String =
    """WITH t AS (SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS tk
      |  FROM documents),
      |x AS (SELECT doc_id, unnest(tk) AS tok FROM t),
      |f AS (SELECT doc_id, tok, count(*) AS c FROM x GROUP BY 1, 2),
      |p AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |        CAST(count(*) AS BIGINT) AS n_types,
      |        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |          AS n_hapax,
      |        CAST(sum(c * c) AS BIGINT) AS ss
      |      FROM f GROUP BY 1)
      |SELECT d.doc_id AS doc_id, coalesce(n_tokens, 0) AS n_tokens,
      |  coalesce(n_types, 0) AS n_types, coalesce(n_hapax, 0) AS n_hapax,
      |  round(CASE WHEN coalesce(n_tokens, 0) = 0 THEN 0.0
      |        ELSE CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) END, 6)
      |    AS ttr,
      |  round(CASE WHEN coalesce(n_types, 0) = 0 THEN 0.0
      |        ELSE CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE) END, 6)
      |    AS hapax_frac,
      |  round(CASE WHEN coalesce(n_tokens, 0) = 0 THEN 0.0
      |        ELSE 10000.0 * CAST(ss - n_tokens AS DOUBLE)
      |               / CAST(n_tokens * n_tokens AS DOUBLE) END, 6) AS yule_k
      |FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
      |ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of p17: the t29 Flesch formula, exact discrete
    * quartile cutpoints, score > cutpoint phase assignment. */
  private lazy val curriculumOracle: String =
    """WITH c AS (SELECT doc_id,
      |  length(regexp_extract_all(text, '[A-Za-z]+')) AS words,
      |  length(regexp_extract_all(text, '[.!?]+')) AS sentences,
      |  length(regexp_extract_all(lower(text), '[aeiouy]+')) AS syllables
      |  FROM documents),
      |f AS (SELECT doc_id, 206.835
      |    - 1.015 * (CAST(greatest(words, 1) AS DOUBLE)
      |               / greatest(sentences, 1))
      |    - 84.6 * (CAST(syllables AS DOUBLE) / greatest(words, 1)) AS d
      |  FROM c),
      |q AS (SELECT quantile_disc(d, 0.25) AS c0, quantile_disc(d, 0.5) AS c1,
      |        quantile_disc(d, 0.75) AS c2 FROM f),
      |a AS (SELECT d,
      |        (CASE WHEN d > q.c0 THEN 1 ELSE 0 END
      |         + CASE WHEN d > q.c1 THEN 1 ELSE 0 END
      |         + CASE WHEN d > q.c2 THEN 1 ELSE 0 END) AS phase
      |      FROM f CROSS JOIN q)
      |SELECT CAST(phase AS BIGINT) AS phase,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       round(min(d), 6) AS min_score, round(max(d), 6) AS max_score
      |FROM a GROUP BY 1 ORDER BY 1""".stripMargin

  /** DuckDB mirror of p18: α=0.2 shares, 1.2·avail caps, two unrolled
    * water-fill rounds (leftover ∝ share among uncapped). */
  private lazy val tokenBudgetOracle: String = {
    def fill(k: Int): String =
      s"""t$k AS (SELECT 30000.0 - sum(alloc) AS lft,
         |        sum(CASE WHEN alloc < cap THEN share ELSE 0.0 END) AS mass
         |      FROM a${k - 1}),
         |a$k AS (SELECT lang, avail, share, cap,
         |        CASE WHEN t$k.mass > 0 AND alloc < cap
         |             THEN least(alloc + t$k.lft * share / t$k.mass, cap)
         |             ELSE alloc END AS alloc
         |       FROM a${k - 1} CROSS JOIN t$k)""".stripMargin
    s"""WITH av AS (SELECT lang,
       |    CAST(sum(CASE WHEN trim(text) = '' THEN 0
       |             ELSE len(string_split_regex(trim(text), '\\s+')) END)
       |      AS BIGINT) AS avail
       |  FROM documents GROUP BY 1),
       |z AS (SELECT sum(pow(CAST(avail AS DOUBLE), 0.2)) AS z FROM av),
       |s0 AS (SELECT lang, avail,
       |        pow(CAST(avail AS DOUBLE), 0.2) / z.z AS share,
       |        CAST(avail AS DOUBLE) * 1.2 AS cap FROM av CROSS JOIN z),
       |a0 AS (SELECT *, least(share * 30000.0, cap) AS alloc FROM s0),
       |${fill(1)},
       |${fill(2)}
       |SELECT lang, avail AS avail_tokens, round(share, 6) AS share,
       |       round(alloc, 6) AS alloc_tokens,
       |       round(alloc / CAST(avail AS DOUBLE), 6) AS epochs,
       |       alloc >= cap AS capped
       |FROM a2 ORDER BY lang""".stripMargin
  }

  /** DuckDB mirror of [[TextOps.langId]] + [[TextOps.qualityScore]]. */
  private lazy val textQualityOracle: String =
    s"""WITH h AS (
       |  $sqlTextFeatures),
       |b AS (SELECT *, $sqlBest AS best FROM h)
       |SELECT doc_id,
       |  $sqlLangCase AS lang_pred,
       |  round($sqlQuality, 6) AS quality
       |FROM b ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of [[graft.ops.Pipeline.curationReport]]. */
  private lazy val pipelineOracle: String =
    s"""WITH h AS (
       |  $sqlTextFeatures),
       |q AS (SELECT *, $sqlQuality AS quality FROM h),
       |f AS (SELECT * FROM q WHERE quality >= 0.55),
       |k AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY text),
       |r AS (SELECT f.* FROM f JOIN k USING (doc_id)),
       |b AS (SELECT *, $sqlBest AS best FROM r)
       |SELECT $sqlLangCase AS lang_pred,
       |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
       |FROM b GROUP BY 1 ORDER BY lang_pred""".stripMargin

  // ---- SQL-mirrorable hashes for the approximate operators (d04/s02/
  //      s03): plain modular arithmetic both engines compute identically,
  //      giving the approximate paths full value-level oracles.

  /** 60-bit per-token hash: two independent position-weighted rolling
    * hashes (bases 31 and 37, each mod 1e9+7 < 2^30) packed as
    * hi·2^30 + lo — ONE native UTF-8 walk per token on the Spark side
    * ([[graft.functions.NativeExpressions.fp60]]); the DuckDB twin is
    * the same nested list comprehension as t01's, per base. */
  private val mirrorTokenHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    toks => graft.functions.NativeExpressions.tokenHashes60(toks)

  /** DuckDB fragment: position-weighted rolling hash of expression `e`
    * with the given power weights (mirror of
    * [[graft.functions.NativeExpressions.fp64]]/fp60, proven by t01). */
  private def sqlFp(e: String, weights: String): String =
    s"""CAST(list_sum([ascii(($e)[i]) *
       |      ([$weights])[(i-1)%8+1]
       |      for i in range(1, length($e)+1)]) % 1000000007 AS BIGINT)""".stripMargin

  // defs, not vals: the spec list is built during object init and forces
  // simhashOracle before later vals would be assigned
  private def w31 = "1,31,961,29791,923521,28629151,887503681,27512614111"
  private def w37 = "1,37,1369,50653,1874161,69343957,2565726409,94931877133"

  /** DuckDB mirror of d06: the d03 exact all-pairs edge set (LSH miss
    * probability < 1e-7 at τ=0.8, same argument as d03), then connected
    * components via a recursive CTE that propagates every reachable id
    * and keeps the minimum — exactly the min-id-root semantics of
    * [[graft.ops.Dedup.connectedComponents]]. */
  private def dupClusterShPr: String =
    """sh AS (
      |  SELECT doc_id,
      |         list_distinct([array_to_string(t[i:i+2], ' ')
      |                        for i in range(1, len(t) - 1)]) AS s
      |  FROM (SELECT doc_id,
      |          CASE WHEN trim(text) = '' THEN []::VARCHAR[]
      |               ELSE string_split_regex(trim(text), '\s+') END AS t
      |        FROM documents)),
      |pr AS (
      |  SELECT a.doc_id AS ida, b.doc_id AS idb
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE len(list_distinct(list_concat(a.s, b.s))) > 0
      |    AND len(list_intersect(a.s, b.s))::DOUBLE /
      |          len(list_distinct(list_concat(a.s, b.s)))::DOUBLE >= 0.8)""".stripMargin

  private def dupClusterCtes: String =
    s"""$dupClusterShPr,
      |edges AS (SELECT ida AS u, idb AS v FROM pr
      |          UNION SELECT idb, ida FROM pr),
      |walk(u, c) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
      |  UNION
      |  SELECT e.v, w.c FROM walk w JOIN edges e ON e.u = w.u),
      |comp AS (SELECT u AS doc_id, min(c) AS cluster_id FROM walk GROUP BY u)""".stripMargin

  /** DuckDB mirror of d35: the d06 pair graph minus a deterministic
    * retracted subset, components over the SURVIVING edges, plus the
    * singleton convention for ids whose every edge was retracted. */
  private lazy val componentsRetractOracle: String =
    s"""WITH RECURSIVE $dupClusterShPr,
      |kept AS (SELECT * FROM pr WHERE (ida + idb) % 5 <> 1),
      |edges AS (SELECT ida AS u, idb AS v FROM kept
      |          UNION SELECT idb, ida FROM kept),
      |walk(u, c) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
      |  UNION
      |  SELECT e.v, w.c FROM walk w JOIN edges e ON e.u = w.u),
      |comp AS (SELECT u AS doc_id, min(c) AS cluster_id FROM walk
      |         GROUP BY u),
      |allids AS (SELECT DISTINCT ida AS doc_id FROM pr
      |           UNION SELECT idb FROM pr),
      |single AS (SELECT doc_id, doc_id AS cluster_id FROM allids
      |           WHERE doc_id NOT IN (SELECT doc_id FROM comp))
      |SELECT doc_id, cluster_id FROM comp
      |UNION ALL
      |SELECT doc_id, cluster_id FROM single
      |ORDER BY doc_id""".stripMargin

  private lazy val dupClustersOracle: String =
    s"""WITH RECURSIVE $dupClusterCtes
      |SELECT doc_id, cluster_id,
      |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
      |FROM comp ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of d16: the d06 component machinery collapsed to a
    * size histogram (clustered docs only — singletons never enter the
    * edge set on either engine). */
  private lazy val clusterProfileOracle: String =
    s"""WITH RECURSIVE $dupClusterCtes,
      |cs AS (SELECT cluster_id, count(*) AS cluster_size FROM comp
      |       GROUP BY 1)
      |SELECT cluster_size, count(*) AS n_clusters,
      |       cluster_size * count(*) AS n_docs
      |FROM cs GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  /** DuckDB mirror of d08: same cluster graph, keep the best-quality
    * member per cluster (quality desc, doc_id tie-break), corpus minus
    * the rest. */
  private lazy val keepBestOracle: String =
    s"""WITH RECURSIVE $dupClusterCtes,
      |h AS (
      |  $sqlTextFeatures),
      |q AS (SELECT doc_id, $sqlQuality AS quality FROM h),
      |m AS (SELECT comp.doc_id, comp.cluster_id, q.quality
      |      FROM comp JOIN q USING (doc_id)),
      |r AS (SELECT *, row_number() OVER
      |        (PARTITION BY cluster_id
      |         ORDER BY quality DESC, doc_id) AS rk FROM m),
      |dropids AS (SELECT doc_id FROM r WHERE rk > 1)
      |SELECT doc_id, lang FROM documents
      |WHERE doc_id NOT IN (SELECT doc_id FROM dropids)
      |ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of d04: per-token 60-bit hashes → 64-bit SimHash
    * (bits ≥ 60 provably zero → vote loop over 60 bits) → all-pairs
    * Hamming ≤ 3. All-pairs is the UNCAPPED ground truth the blocked
    * Spark plan must reproduce exactly (d04 raises maxBucket so the cap
    * never drops a qualifying pair at oracle scale). */
  private lazy val simhashOracle: String =
    s"""WITH t AS (SELECT doc_id,
       |    CASE WHEN trim(text)='' THEN []
       |         ELSE string_split_regex(trim(text),'\\s+') END AS toks
       |  FROM documents),
       |h AS (SELECT doc_id, list_transform(toks, t ->
       |    ${sqlFp("t", w31)} * 1073741824 + ${sqlFp("t", w37)}) AS th
       |  FROM t),
       |f AS (SELECT doc_id, CAST(coalesce(list_sum(
       |    [CASE WHEN 2*len(list_filter(th, x -> (x >> j) & 1 = 1)) > len(th)
       |          THEN (1::BIGINT << j) ELSE 0 END
       |     for j in range(0, 60)]), 0) AS BIGINT) AS fp
       |  FROM h)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS dist
       |FROM f a JOIN f b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  /** DuckDB mirror of d37/d38 (persisted SimHash index): the d04
    * fingerprint CTEs, cross-side pairs only — odd docs are the
    * index, even docs the probe batch. */
  private lazy val simhashCrossOracle: String =
    s"""WITH t AS (SELECT doc_id,
       |    CASE WHEN trim(text)='' THEN []
       |         ELSE string_split_regex(trim(text),'\\s+') END AS toks
       |  FROM documents),
       |h AS (SELECT doc_id, list_transform(toks, t ->
       |    ${sqlFp("t", w31)} * 1073741824 + ${sqlFp("t", w37)}) AS th
       |  FROM t),
       |f AS (SELECT doc_id, CAST(coalesce(list_sum(
       |    [CASE WHEN 2*len(list_filter(th, x -> (x >> j) & 1 = 1)) > len(th)
       |          THEN (1::BIGINT << j) ELSE 0 END
       |     for j in range(0, 60)]), 0) AS BIGINT) AS fp
       |  FROM h)
       |SELECT b.doc_id AS batch_id, a.doc_id AS index_id,
       |       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS dist
       |FROM f a JOIN f b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
       |WHERE bit_count(xor(a.fp, b.fp)) <= 3
       |ORDER BY batch_id, index_id""".stripMargin

  /** DuckDB mirror of d22 (streaming SimHash at ingest): the d04
    * fingerprint CTEs restricted to doc_id < 2000, paired under the
    * event-time horizon (ts = base + doc_id·1000 ms, horizon 600 s ⇒
    * id gap ≤ 600); doc_id = the later arrival. With time-ordered
    * replay, uncapped buckets and the chunk pigeonhole, the streaming
    * match set is exactly this pair set (see the d22 spec comment). */
  private lazy val streamSimhashOracle: String =
    s"""WITH t AS (SELECT doc_id,
       |    CASE WHEN trim(text)='' THEN []
       |         ELSE string_split_regex(trim(text),'\\s+') END AS toks
       |  FROM documents WHERE doc_id < 2000),
       |h AS (SELECT doc_id, list_transform(toks, t ->
       |    ${sqlFp("t", w31)} * 1073741824 + ${sqlFp("t", w37)}) AS th
       |  FROM t),
       |f AS (SELECT doc_id, CAST(coalesce(list_sum(
       |    [CASE WHEN 2*len(list_filter(th, x -> (x >> j) & 1 = 1)) > len(th)
       |          THEN (1::BIGINT << j) ELSE 0 END
       |     for j in range(0, 60)]), 0) AS BIGINT) AS fp
       |  FROM h)
       |SELECT b.doc_id AS doc_id, a.doc_id AS matched_id,
       |       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS dist
       |FROM f a JOIN f b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= 3
       |  AND (b.doc_id - a.doc_id) * 1000 <= 600000
       |ORDER BY doc_id, matched_id""".stripMargin

  /** DuckDB mirror of d23 (streaming MinHash-LSH at ingest): mod-ngram
    * shingle hashes (p22's arithmetic), the EXACT minhash signature per
    * doc from the inlined mhCoeffs(64) literals (hash < 2³⁰ keeps every
    * a·h+b inside signed 64-bit — no overflow divergence), pairs under
    * the horizon with slot agreement ≥ threshold. est ≥ 0.8 ≥
    * (k−bands+1)/k pigeonholes a fully-agreeing band, so band
    * candidacy adds no condition — the mirror is exact. */
  private lazy val streamMinhashOracle: String = {
    val cs = graft.ops.Dedup.mhCoeffs(64)
    val as = cs.map(_._1).mkString(",")
    val bs = cs.map(_._2).mkString(",")
    s"""WITH tk AS (SELECT doc_id,
       |    CASE WHEN trim(text)='' THEN []
       |         ELSE string_split_regex(trim(text),'\\s+') END AS toks
       |  FROM documents WHERE doc_id < 2000),
       |th AS (SELECT doc_id, list_transform(toks, t -> ${sqlFp("t", w31)})
       |         AS th
       |  FROM tk),
       |g AS (SELECT doc_id, CASE WHEN len(th) < 3 THEN []::BIGINT[]
       |    ELSE list_distinct([
       |    (((th[i]*131 + th[i+1]) % 1000000007) * 131 + th[i+2]) % 1000000007
       |    for i in range(1, len(th) - 1)]) END AS grams
       |  FROM th),
       |sg AS (SELECT doc_id,
       |    [coalesce(list_min(list_transform(grams, h ->
       |        (([$as])[i] * h + ([$bs])[i]) % 4294967311)), 4294967311)
       |     for i in range(1, 65)] AS sig
       |  FROM g)
       |SELECT b.doc_id AS doc_id, a.doc_id AS matched_id,
       |       round(CAST(list_sum([CASE WHEN a.sig[i] = b.sig[i]
       |                  THEN 1 ELSE 0 END for i in range(1, 65)])
       |             AS DOUBLE) / 64, 6) AS est_jaccard
       |FROM sg a JOIN sg b ON a.doc_id < b.doc_id
       |WHERE (b.doc_id - a.doc_id) * 1000 <= 600000
       |  AND CAST(list_sum([CASE WHEN a.sig[i] = b.sig[i]
       |        THEN 1 ELSE 0 END for i in range(1, 65)]) AS DOUBLE) / 64
       |      >= 0.8
       |ORDER BY doc_id, matched_id""".stripMargin
  }

  /** DuckDB mirror of d24: per-source elementwise-min union sketch
    * from the d23 mod-ngram/coefficient arithmetic (sources whose docs
    * all lack 3-grams keep the sentinel slots), pairwise slot
    * agreement / k. */
  private lazy val sourceSketchOracle: String = {
    val cs = graft.ops.Dedup.mhCoeffs(64)
    val as = cs.map(_._1).mkString(",")
    val bs = cs.map(_._2).mkString(",")
    s"""WITH tk AS (SELECT doc_id, source,
       |    CASE WHEN trim(text)='' THEN []
       |         ELSE string_split_regex(trim(text),'\\s+') END AS toks
       |  FROM documents WHERE text IS NOT NULL),
       |th AS (SELECT doc_id, source,
       |         list_transform(toks, t -> ${sqlFp("t", w31)}) AS th
       |  FROM tk),
       |g AS (SELECT doc_id, source, CASE WHEN len(th) < 3 THEN []::BIGINT[]
       |    ELSE list_distinct([
       |    (((th[i]*131 + th[i+1]) % 1000000007) * 131 + th[i+2]) % 1000000007
       |    for i in range(1, len(th) - 1)]) END AS grams
       |  FROM th),
       |u AS (SELECT source AS src, unnest(grams) AS h FROM g),
       |idx AS (SELECT unnest(range(1, 65)) AS i),
       |m AS (SELECT src, i,
       |        min((([$as])[i] * h + ([$bs])[i]) % 4294967311) AS mn
       |      FROM u CROSS JOIN idx GROUP BY 1, 2),
       |srcs AS (SELECT DISTINCT source AS src FROM documents
       |         WHERE text IS NOT NULL),
       |m2 AS (SELECT s.src, idx.i, coalesce(m.mn, 4294967311) AS mn
       |       FROM srcs s CROSS JOIN idx
       |       LEFT JOIN m ON m.src = s.src AND m.i = idx.i)
       |SELECT a.src AS src_a, b.src AS src_b,
       |       round(CAST(sum(CASE WHEN a.mn = b.mn THEN 1 ELSE 0 END)
       |             AS DOUBLE) / 64, 6) AS est_jaccard
       |FROM m2 a JOIN m2 b ON a.i = b.i AND a.src < b.src
       |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin
  }

  /** DuckDB mirror of [[graft.ops.Pipeline.contaminationReport]] at
    * n=3, threshold=0.1, benchmark = doc_id < 20: per-token 30-bit
    * fingerprints, (acc·131 + th) mod 1e9+7 n-gram combine — identical
    * arithmetic to the native ModNgramHashes expression. */
  private def decontCtes: String =
    s"""tk AS (SELECT doc_id,
       |    CASE WHEN trim(text)='' THEN []
       |         ELSE string_split_regex(trim(text),'\\s+') END AS toks
       |  FROM documents),
       |th AS (SELECT doc_id, list_transform(toks, t -> ${sqlFp("t", w31)}) AS th
       |  FROM tk),
       |g AS (SELECT doc_id, list_distinct([
       |    (((th[i]*131 + th[i+1]) % 1000000007) * 131 + th[i+2]) % 1000000007
       |    for i in range(1, len(th) - 1)]) AS grams
       |  FROM th WHERE len(th) >= 3),
       |b AS (SELECT DISTINCT unnest(grams) AS bg FROM g WHERE doc_id < 20),
       |c AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS cg
       |      FROM g WHERE doc_id >= 20),
       |h AS (SELECT doc_id, n_grams, count(*) AS n_hit
       |      FROM c JOIN b ON cg = bg GROUP BY 1, 2)""".stripMargin

  /** DuckDB mirror of p22: corpus (ids ≥ 10) + planted benchmark
    * copies at +900000, the p02 gram chain over that union, recall of
    * the plants at τ=0.5. */
  private lazy val canaryOracle: String =
    s"""WITH d2 AS (SELECT doc_id, text FROM documents WHERE doc_id >= 10
       |            UNION ALL
       |            SELECT doc_id + 900000, text FROM documents
       |            WHERE doc_id < 10
       |            UNION ALL
       |            SELECT doc_id, text FROM documents WHERE doc_id < 10),
       |tk AS (SELECT doc_id,
       |    CASE WHEN trim(text)='' THEN []
       |         ELSE string_split_regex(trim(text),'\\s+') END AS toks
       |  FROM d2),
       |th AS (SELECT doc_id, list_transform(toks, t -> ${sqlFp("t", w31)})
       |         AS th
       |  FROM tk),
       |g AS (SELECT doc_id, list_distinct([
       |    (((th[i]*131 + th[i+1]) % 1000000007) * 131 + th[i+2]) % 1000000007
       |    for i in range(1, len(th) - 1)]) AS grams
       |  FROM th WHERE len(th) >= 3),
       |b AS (SELECT DISTINCT unnest(grams) AS bg FROM g WHERE doc_id < 10),
       |c AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS cg
       |      FROM g WHERE doc_id >= 10),
       |h AS (SELECT doc_id, n_grams, count(*) AS n_hit
       |      FROM c JOIN b ON cg = bg GROUP BY 1, 2),
       |sel AS (SELECT doc_id FROM h
       |        WHERE CAST(n_hit AS DOUBLE)/n_grams >= 0.5),
       |np AS (SELECT CAST(count(*) AS BIGINT) AS n_planted FROM documents
       |       WHERE doc_id < 10)
       |SELECT np.n_planted,
       |  (SELECT CAST(count(*) AS BIGINT) FROM sel WHERE doc_id >= 900000)
       |    AS n_caught,
       |  (SELECT CAST(count(*) AS BIGINT) FROM sel
       |   WHERE doc_id < 900000) AS n_incidental,
       |  round(CAST((SELECT count(*) FROM sel WHERE doc_id >= 900000)
       |          AS DOUBLE) / np.n_planted, 6) AS recall
       |FROM np""".stripMargin

  /** DuckDB mirror of g20: three unrolled hash-argmin hops over the
    * symmetric co-supply edges from the %10 sources. */
  private lazy val walkOracle: String = {
    def hop(k: Int): String =
      s"""n$k AS (SELECT w.start, s.nbr,
         |        ((((w.node*1000003 + ${k * 31} + s.nbr) % 1000000007)
         |          * 654435747) % 1000000007) AS h
         |      FROM w${k - 1} w JOIN sym s ON s.node = w.node),
         |w$k AS (SELECT start, nbr AS node FROM
         |         (SELECT *, row_number() OVER
         |            (PARTITION BY start ORDER BY h, nbr) AS r FROM n$k)
         |       WHERE r = 1)""".stripMargin
    s"""WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sid
       |            FROM lineitem WHERE l_quantity >= 49),
       |e AS (SELECT DISTINCT a.sid AS lo, b.sid AS hi
       |      FROM ps a JOIN ps b ON a.p = b.p AND a.sid < b.sid),
       |sym AS (SELECT lo AS node, hi AS nbr FROM e
       |        UNION ALL SELECT hi, lo FROM e),
       |src AS (SELECT DISTINCT node AS start FROM sym
       |        WHERE node % 10 = 0),
       |w0 AS (SELECT start, start AS node FROM src),
       |${hop(1)},
       |${hop(2)},
       |${hop(3)}
       |SELECT start, step, node FROM (
       |  SELECT start, CAST(0 AS BIGINT) AS step, node FROM w0
       |  UNION ALL SELECT start, 1, node FROM w1
       |  UNION ALL SELECT start, 2, node FROM w2
       |  UNION ALL SELECT start, 3, node FROM w3)
       |ORDER BY start, step""".stripMargin
  }

  private lazy val decontOracle: String =
    s"""WITH $decontCtes
       |SELECT doc_id, n_grams, n_hit,
       |       CAST(n_hit AS DOUBLE)/n_grams AS contamination
       |FROM h WHERE CAST(n_hit AS DOUBLE)/n_grams >= 0.1
       |ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of p03: documents minus the p02 contaminated ids. */
  private lazy val decontFilterOracle: String =
    s"""WITH $decontCtes,
       |bad AS (SELECT doc_id FROM h
       |        WHERE CAST(n_hit AS DOUBLE)/n_grams >= 0.1)
       |SELECT doc_id, lang, source FROM documents
       |WHERE doc_id >= 20 AND doc_id NOT IN (SELECT doc_id FROM bad)
       |ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of t11: per-source top-30 by the t02 quality score
    * (raw-double rank keys — engine-identical per t02's oracle proof). */
  private lazy val sourceQuotaOracle: String =
    s"""WITH h AS (
       |  $sqlTextFeatures),
       |q AS (SELECT h.*, d.source FROM h JOIN documents d
       |        ON d.doc_id = h.doc_id),
       |qs AS (SELECT doc_id, source, $sqlQuality AS quality FROM q),
       |r AS (SELECT *, row_number() OVER
       |        (PARTITION BY source
       |         ORDER BY quality DESC, doc_id) AS rank FROM qs)
       |SELECT source, doc_id, round(quality, 6) AS quality, rank
       |FROM r WHERE rank <= 30 ORDER BY source, rank""".stripMargin

  /** DuckDB mirror of t13: per-language top quartile by quality (rank
    * and group count from the same window pass as the Spark side). */
  private lazy val fractionGateOracle: String =
    s"""WITH h AS (
       |  $sqlTextFeatures),
       |q AS (SELECT h.*, d.lang FROM h JOIN documents d
       |        ON d.doc_id = h.doc_id),
       |qs AS (SELECT doc_id, lang, $sqlQuality AS quality FROM q),
       |r AS (SELECT *, row_number() OVER
       |        (PARTITION BY lang
       |         ORDER BY quality DESC, doc_id) AS rank,
       |       count(*) OVER (PARTITION BY lang) AS gn FROM qs)
       |SELECT lang, doc_id, round(quality, 6) AS quality, rank
       |FROM r WHERE rank <= ceil(gn * 0.25) ORDER BY lang, rank""".stripMargin

  /** DuckDB mirror of t08: duplicate-line fraction + mode-3-gram
    * fraction (count of the modal gram / total grams — equals the
    * longest equal run in the sorted gram list the Spark side uses). */
  private lazy val repetitionOracle: String =
    s"""WITH t AS (SELECT doc_id, text,
       |    CASE WHEN trim(text)='' THEN []
       |         ELSE string_split_regex(trim(text),'\\s+') END AS toks
       |  FROM documents),
       |th AS (SELECT doc_id, text, list_transform(toks, t -> ${sqlFp("t", w31)}) AS th
       |  FROM t),
       |g AS (SELECT doc_id, text,
       |    CASE WHEN len(th) < 3 THEN []
       |    ELSE [ (((th[i]*131 + th[i+1]) % 1000000007) * 131 + th[i+2]) % 1000000007
       |           for i in range(1, len(th) - 1)] END AS grams FROM th),
       |l AS (SELECT doc_id, string_split_regex(text, '\\n') AS lines, grams FROM g)
       |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
       |  CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)/len(lines)
       |    AS dup_line_frac,
       |  CASE WHEN len(grams) = 0 THEN 0.0
       |       ELSE CAST(len(list_filter(grams,
       |              x -> x = list_aggregate(grams, 'mode'))) AS DOUBLE)
       |            / len(grams)
       |  END AS top3gram_frac
       |FROM l ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of [[Similarity.lshTopK]] at nPlanes=4, k=5: the
    * hyperplane component formula (affine mix + quadratic round) is
    * identical integer arithmetic, so bucket ids — and therefore the
    * whole approximate result — match. */
  /** DuckDB mirror of s31: the s02 hyperplane-bucket CTE, same-bucket
    * pairs for queries vec_id < 200, exact-cosine threshold 0.3. */
  private lazy val rangeLshOracle: String = {
    val m1 = "((((p*131)+i)*2654435761+9176)%1000003)"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |b AS (SELECT vec_id, v,
      |  CAST(list_sum([CASE WHEN
      |    list_sum([v[i] *
      |      (($m1 * ($m1 + 13)) % 1000003 / 1000003.0 - 0.5)
      |              for i in range(1, len(v)+1)]) >= 0
      |    THEN (1::BIGINT << p) ELSE 0 END for p in range(0, 4)]) AS BIGINT) AS bkt
      |  FROM e)
      |SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |       round(list_dot_product(q.v, c.v) /
      |         (sqrt(list_dot_product(q.v, q.v)) *
      |          sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
      |FROM b q JOIN b c ON q.bkt = c.bkt
      |WHERE q.vec_id < 200 AND c.vec_id <> q.vec_id
      |  AND list_dot_product(q.v, c.v) /
      |      (sqrt(list_dot_product(q.v, q.v)) *
      |       sqrt(list_dot_product(c.v, c.v))) >= 0.3
      |ORDER BY query_id, neighbor_id""".stripMargin
  }

  private lazy val lshAnnOracle: String = {
    val m1 = "((((p*131)+i)*2654435761+9176)%1000003)"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |b AS (SELECT vec_id, v,
      |  CAST(list_sum([CASE WHEN
      |    list_sum([v[i] *
      |      (($m1 * ($m1 + 13)) % 1000003 / 1000003.0 - 0.5)
      |              for i in range(1, len(v)+1)]) >= 0
      |    THEN (1::BIGINT << p) ELSE 0 END for p in range(0, 4)]) AS BIGINT) AS bkt
      |  FROM e),
      |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |        list_dot_product(q.v, c.v) /
      |          (sqrt(list_dot_product(q.v, q.v)) *
      |           sqrt(list_dot_product(c.v, c.v))) AS cos_sim
      |      FROM b q JOIN b c ON q.bkt = c.bkt
      |      WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
      |r AS (SELECT *, row_number() OVER
      |        (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
      |        AS rank FROM s)
      |SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB mirror of [[Similarity.ivfTopK]] at nCentroids=16, nProbe=6,
    * k=5: same centroid sample (multiplicative-hash order, id
    * tie-break), same normalized-dot assignment with index tie-break,
    * same probe set, same in-list exact cosine top-k. */
  /** DuckDB mirror of s08: same hash-ordered seed rows as codebooks,
    * same per-subspace `⟨s,s⟩ − 2⟨s,c⟩ + ⟨c,c⟩` encode with (distance,
    * index) tie-break, reconstruction by per-code concatenation, and
    * the same three-dot ADC distance with (distance, id) ranking —
    * every dot is a left-to-right double accumulation on both engines,
    * so codes, distances and ranks match bit-for-bit. */
  private lazy val pqAnnOracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |sd AS (SELECT v AS sv, row_number() OVER (ORDER BY h, vid) - 1 AS j
      |       FROM (SELECT v, (vec_id*2654435761)%1000000007 AS h,
      |                    vec_id AS vid
      |             FROM e ORDER BY h, vid LIMIT 16)),
      |cb AS (SELECT ss.s AS s, sd.j AS j,
      |              sv[ss.s*8+1 : ss.s*8+8] AS c
      |       FROM sd CROSS JOIN (SELECT unnest(range(0, 8)) AS s) ss),
      |cbc AS (SELECT s, j, c, list_dot_product(c, c) AS cc FROM cb),
      |dist AS (SELECT e.vec_id, b.s, b.j,
      |           list_dot_product(e.v[b.s*8+1 : b.s*8+8],
      |                            e.v[b.s*8+1 : b.s*8+8])
      |           - 2*list_dot_product(e.v[b.s*8+1 : b.s*8+8], b.c)
      |           + b.cc AS d
      |         FROM e CROSS JOIN cbc b),
      |code AS (SELECT vec_id, s, j FROM
      |          (SELECT vec_id, s, j, row_number() OVER
      |             (PARTITION BY vec_id, s ORDER BY d, j) AS r FROM dist)
      |         WHERE r = 1),
      |rec AS (SELECT code.vec_id, flatten(list(b.c ORDER BY code.s)) AS rv
      |        FROM code JOIN cbc b ON b.s = code.s AND b.j = code.j
      |        GROUP BY code.vec_id),
      |sc AS (SELECT q.vec_id AS query_id, r2.vec_id AS neighbor_id,
      |         list_dot_product(q.v, q.v) - 2*list_dot_product(q.v, r2.rv)
      |           + list_dot_product(r2.rv, r2.rv) AS d
      |       FROM e q CROSS JOIN rec r2
      |       WHERE q.vec_id < 8 AND r2.vec_id <> q.vec_id),
      |rk AS (SELECT *, row_number() OVER
      |         (PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
      |       FROM sc)
      |SELECT query_id, neighbor_id, rank, round(d, 6) AS l2_dist
      |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** DuckDB mirror of s09: the s08 encode/reconstruct pipeline feeding
    * a shortlist of 20 by ADC distance (d asc, id tie-break — exactly
    * `topKPerGroup` on the negated distance), then exact cosine over
    * the shortlist with (cos desc, id) ranking. Parquet round-trips
    * codes (ints) and vectors (floats) exactly, so both stages match
    * the in-memory arithmetic bit-for-bit. */
  private lazy val pqIndexOracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |sd AS (SELECT v AS sv, row_number() OVER (ORDER BY h, vid) - 1 AS j
      |       FROM (SELECT v, (vec_id*2654435761)%1000000007 AS h,
      |                    vec_id AS vid
      |             FROM e ORDER BY h, vid LIMIT 16)),
      |cb AS (SELECT ss.s AS s, sd.j AS j,
      |              sv[ss.s*8+1 : ss.s*8+8] AS c
      |       FROM sd CROSS JOIN (SELECT unnest(range(0, 8)) AS s) ss),
      |cbc AS (SELECT s, j, c, list_dot_product(c, c) AS cc FROM cb),
      |dist AS (SELECT e.vec_id, b.s, b.j,
      |           list_dot_product(e.v[b.s*8+1 : b.s*8+8],
      |                            e.v[b.s*8+1 : b.s*8+8])
      |           - 2*list_dot_product(e.v[b.s*8+1 : b.s*8+8], b.c)
      |           + b.cc AS d
      |         FROM e CROSS JOIN cbc b),
      |code AS (SELECT vec_id, s, j FROM
      |          (SELECT vec_id, s, j, row_number() OVER
      |             (PARTITION BY vec_id, s ORDER BY d, j) AS r FROM dist)
      |         WHERE r = 1),
      |rec AS (SELECT code.vec_id, flatten(list(b.c ORDER BY code.s)) AS rv
      |        FROM code JOIN cbc b ON b.s = code.s AND b.j = code.j
      |        GROUP BY code.vec_id),
      |sc AS (SELECT q.vec_id AS query_id, r2.vec_id AS neighbor_id,
      |         list_dot_product(q.v, q.v) - 2*list_dot_product(q.v, r2.rv)
      |           + list_dot_product(r2.rv, r2.rv) AS d
      |       FROM e q CROSS JOIN rec r2
      |       WHERE q.vec_id < 8 AND r2.vec_id <> q.vec_id),
      |sl AS (SELECT query_id, neighbor_id FROM
      |         (SELECT *, row_number() OVER
      |            (PARTITION BY query_id ORDER BY d, neighbor_id) AS r FROM sc)
      |       WHERE r <= 20),
      |ex AS (SELECT sl.query_id, sl.neighbor_id,
      |         list_dot_product(qe.v, ce.v) /
      |           (sqrt(list_dot_product(qe.v, qe.v)) *
      |            sqrt(list_dot_product(ce.v, ce.v))) AS cos_sim
      |       FROM sl JOIN e qe ON qe.vec_id = sl.query_id
      |       JOIN e ce ON ce.vec_id = sl.neighbor_id),
      |rk AS (SELECT *, row_number() OVER
      |         (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
      |         AS rank FROM ex)
      |SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim
      |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** DuckDB mirror of p05: same token split, Laplace-smoothed unigram
    * distributions over the union vocabulary (raw = all docs, target =
    * lang 'en'), per-doc Σ of log-probability deltas, and the same
    * derandomized Gumbel score `log_ratio − ln(−ln u)` with u from the
    * multiplicative id hash — rank and flag the global top 50. */
  private lazy val dsirOracle: String =
    """WITH t AS (SELECT doc_id, lang,
      |    CASE WHEN trim(text)='' THEN []::VARCHAR[]
      |         ELSE string_split_regex(trim(text), '\s+') END AS tk
      |  FROM documents),
      |e AS (SELECT doc_id, lang, unnest(tk) AS f FROM t),
      |cr AS (SELECT f, count(*) AS c FROM e GROUP BY 1),
      |ct AS (SELECT f, count(*) AS c FROM e WHERE lang = 'en' GROUP BY 1),
      |m AS (SELECT f, coalesce(cr.c, 0) AS crc, coalesce(ct.c, 0) AS ctc
      |      FROM cr FULL JOIN ct USING (f)),
      |g AS (SELECT sum(crc) AS tr, sum(ctc) AS tt, count(*) AS v FROM m),
      |dl AS (SELECT f, ln((ctc + 1.0) / (tt + v)) - ln((crc + 1.0) / (tr + v))
      |         AS delta
      |       FROM m CROSS JOIN g),
      |w AS (SELECT e.doc_id, count(*) AS n_tokens, sum(delta) AS log_ratio
      |      FROM e JOIN dl USING (f) GROUP BY 1),
      |s AS (SELECT *, log_ratio - ln(-ln(
      |        ((doc_id*2654435761)%1000000007 + 1) / 1000000008.0)) AS score
      |      FROM w),
      |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk
      |      FROM s)
      |SELECT doc_id, n_tokens, round(log_ratio, 6) AS log_ratio,
      |       (rk <= 50) AS selected
      |FROM r ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of d11: the s03 centroid seed + normalized-dot
    * assignment (s DESC, cidx tie-break), exact cosine pairs within a
    * cluster, then the d06-style recursive-CTE min-reachable-id
    * components and the kept = (component == id) decision. */
  private lazy val semanticDedupOracle: String =
    """WITH RECURSIVE
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |co AS (SELECT cv, row_number() OVER (ORDER BY h, vid) - 1 AS cidx
      |       FROM (SELECT v AS cv, (vec_id*2654435761)%1000000007 AS h,
      |                    vec_id AS vid
      |             FROM e ORDER BY h, vid LIMIT 16)),
      |cn AS (SELECT cidx, CASE WHEN sqrt(list_dot_product(cv, cv)) = 0 THEN cv
      |         ELSE list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
      |         END AS cv FROM co),
      |sc AS (SELECT e.vec_id, cn.cidx, list_dot_product(e.v, cn.cv) AS s
      |       FROM e CROSS JOIN cn),
      |asn AS (SELECT vec_id, cidx FROM
      |         (SELECT vec_id, cidx, row_number() OVER
      |            (PARTITION BY vec_id ORDER BY s DESC, cidx) AS r FROM sc)
      |        WHERE r = 1),
      |pr AS (SELECT x.vec_id AS ida, y.vec_id AS idb
      |       FROM asn x JOIN asn y ON x.cidx = y.cidx AND x.vec_id < y.vec_id
      |       JOIN e a ON a.vec_id = x.vec_id
      |       JOIN e b ON b.vec_id = y.vec_id
      |       WHERE list_dot_product(a.v, b.v) /
      |               (sqrt(list_dot_product(a.v, a.v)) *
      |                sqrt(list_dot_product(b.v, b.v))) >= 0.3),
      |edges AS (SELECT ida AS u, idb AS w FROM pr
      |          UNION SELECT idb, ida FROM pr),
      |walk(u, c) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
      |  UNION
      |  SELECT ed.w, wk.c FROM walk wk JOIN edges ed ON ed.u = wk.u),
      |comp AS (SELECT u AS vec_id, min(c) AS component FROM walk GROUP BY u)
      |SELECT a.vec_id, a.cidx AS cluster,
      |       coalesce(comp.component, a.vec_id) AS component,
      |       (coalesce(comp.component, a.vec_id) = a.vec_id) AS kept
      |FROM asn a LEFT JOIN comp USING (vec_id)
      |ORDER BY vec_id""".stripMargin

  /** DuckDB mirror of s33: the s03 centroid/assignment CTEs, query
    * centroid preferences ranked once, then per nProbe ∈ {1,3,6,16}
    * the probed-list top-5 joined against the brute top-5 → recall =
    * hits / (8 queries · 5). */
  private lazy val ivfRecallOracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |co AS (SELECT cv, row_number() OVER (ORDER BY h, vid) - 1 AS cidx
      |       FROM (SELECT v AS cv, (vec_id*2654435761)%1000000007 AS h,
      |                    vec_id AS vid
      |             FROM e ORDER BY h, vid LIMIT 16)),
      |cn AS (SELECT cidx, CASE WHEN sqrt(list_dot_product(cv, cv)) = 0 THEN cv
      |         ELSE list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
      |         END AS cv FROM co),
      |sc AS (SELECT e.vec_id, cn.cidx, list_dot_product(e.v, cn.cv) AS s
      |       FROM e CROSS JOIN cn),
      |asn AS (SELECT vec_id, cidx FROM
      |         (SELECT vec_id, cidx, row_number() OVER
      |            (PARTITION BY vec_id ORDER BY s DESC, cidx) AS r FROM sc)
      |        WHERE r = 1),
      |prall AS (SELECT vec_id, cidx, r FROM
      |           (SELECT vec_id, cidx, row_number() OVER
      |              (PARTITION BY vec_id ORDER BY s DESC, cidx) AS r
      |            FROM sc WHERE vec_id < 8)),
      |probes AS (SELECT unnest([1, 3, 6, 16]) AS np),
      |cand AS (SELECT p.np, q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |           list_dot_product(qe.v, ce.v) /
      |             (sqrt(list_dot_product(qe.v, qe.v)) *
      |              sqrt(list_dot_product(ce.v, ce.v))) AS cos_sim
      |         FROM probes p
      |         JOIN prall q ON q.r <= p.np
      |         JOIN asn c ON c.cidx = q.cidx
      |         JOIN e qe ON qe.vec_id = q.vec_id
      |         JOIN e ce ON ce.vec_id = c.vec_id
      |         WHERE c.vec_id <> q.vec_id),
      |approx AS (SELECT np, query_id, neighbor_id FROM
      |            (SELECT *, row_number() OVER
      |               (PARTITION BY np, query_id
      |                ORDER BY cos_sim DESC, neighbor_id) AS rk FROM cand)
      |           WHERE rk <= 5),
      |tru AS (SELECT query_id, neighbor_id FROM
      |          (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |             row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |               list_dot_product(q.v, c.v) /
      |                 (sqrt(list_dot_product(q.v, q.v)) *
      |                  sqrt(list_dot_product(c.v, c.v))) DESC, c.vec_id)
      |               AS rk
      |           FROM e q JOIN e c ON c.vec_id <> q.vec_id
      |           WHERE q.vec_id < 8)
      |        WHERE rk <= 5)
      |SELECT p.np AS n_probe,
      |       round(coalesce(h.hits, 0) / 40.0, 6) AS recall
      |FROM probes p LEFT JOIN
      |  (SELECT np, count(*) AS hits
      |   FROM approx JOIN tru USING (query_id, neighbor_id)
      |   GROUP BY np) h ON h.np = p.np
      |ORDER BY n_probe""".stripMargin

  /** DuckDB mirror of s36: centroids seeded from the BUILT subset
    * (vec_id % 4 <> 0) via the shared mulHash order, assignment over
    * the whole current corpus, per-list built-vs-current centroid
    * cosines (s13's arithmetic keyed by cidx, inner join = the
    * non-null lists), the s03/s33 probe arithmetic at nProbe 6 for
    * recall, and the same threshold CASE for the recommendation. */
  /** DuckDB mirror of s38: seed codebooks from the BUILT subset
    * (hash-ordered limit, the pqCodebooks convention), encode/
    * reconstruct every row under those frozen codebooks, average the
    * reconstruction error per side, run the s09 two-stage probe over
    * built ∪ batch, and fold the thresholds into the recommendation. */
  private lazy val pqRetrainOracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |b AS (SELECT vec_id, v FROM e WHERE vec_id % 4 <> 0),
      |sd AS (SELECT v AS sv, row_number() OVER (ORDER BY h, vid) - 1 AS j
      |       FROM (SELECT v, (vec_id*2654435761)%1000000007 AS h,
      |                    vec_id AS vid
      |             FROM b ORDER BY h, vid LIMIT 16)),
      |cb AS (SELECT ss.s AS s, sd.j AS j,
      |              sv[ss.s*8+1 : ss.s*8+8] AS c
      |       FROM sd CROSS JOIN (SELECT unnest(range(0, 8)) AS s) ss),
      |cbc AS (SELECT s, j, c, list_dot_product(c, c) AS cc FROM cb),
      |dist AS (SELECT e.vec_id, bb.s, bb.j,
      |           list_dot_product(e.v[bb.s*8+1 : bb.s*8+8],
      |                            e.v[bb.s*8+1 : bb.s*8+8])
      |           - 2*list_dot_product(e.v[bb.s*8+1 : bb.s*8+8], bb.c)
      |           + bb.cc AS d
      |         FROM e CROSS JOIN cbc bb),
      |code AS (SELECT vec_id, s, j FROM
      |          (SELECT vec_id, s, j, row_number() OVER
      |             (PARTITION BY vec_id, s ORDER BY d, j) AS r FROM dist)
      |         WHERE r = 1),
      |rec AS (SELECT code.vec_id, flatten(list(bb.c ORDER BY code.s)) AS rv
      |        FROM code JOIN cbc bb ON bb.s = code.s AND bb.j = code.j
      |        GROUP BY code.vec_id),
      |err AS (SELECT e.vec_id,
      |          list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, rec.rv)
      |            + list_dot_product(rec.rv, rec.rv) AS er
      |        FROM e JOIN rec USING (vec_id)),
      |eb AS (SELECT avg(er) AS recon_err_built FROM err
      |       WHERE vec_id % 4 <> 0),
      |ea AS (SELECT avg(er) AS recon_err_batch FROM err
      |       WHERE vec_id % 4 = 0),
      |s1 AS (SELECT q.vec_id AS query_id, r2.vec_id AS neighbor_id,
      |         list_dot_product(q.v, q.v) - 2*list_dot_product(q.v, r2.rv)
      |           + list_dot_product(r2.rv, r2.rv) AS d
      |       FROM e q CROSS JOIN rec r2
      |       WHERE q.vec_id < 8 AND r2.vec_id <> q.vec_id),
      |short AS (SELECT query_id, neighbor_id FROM
      |           (SELECT *, row_number() OVER
      |              (PARTITION BY query_id ORDER BY d, neighbor_id) AS rk
      |            FROM s1)
      |          WHERE rk <= 20),
      |s2 AS (SELECT sh.query_id, sh.neighbor_id,
      |         list_dot_product(qe.v, ce.v) /
      |           (sqrt(list_dot_product(qe.v, qe.v)) *
      |            sqrt(list_dot_product(ce.v, ce.v))) AS cos_sim
      |       FROM short sh
      |       JOIN e qe ON qe.vec_id = sh.query_id
      |       JOIN e ce ON ce.vec_id = sh.neighbor_id),
      |approx AS (SELECT query_id, neighbor_id FROM
      |            (SELECT *, row_number() OVER
      |               (PARTITION BY query_id
      |                ORDER BY cos_sim DESC, neighbor_id) AS rk FROM s2)
      |           WHERE rk <= 5),
      |tru AS (SELECT query_id, neighbor_id FROM
      |          (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |             row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |               list_dot_product(q.v, c.v) /
      |                 (sqrt(list_dot_product(q.v, q.v)) *
      |                  sqrt(list_dot_product(c.v, c.v))) DESC, c.vec_id)
      |               AS rk
      |           FROM e q JOIN e c ON c.vec_id <> q.vec_id
      |           WHERE q.vec_id < 8)
      |        WHERE rk <= 5),
      |hits AS (SELECT count(*) AS h
      |         FROM approx JOIN tru USING (query_id, neighbor_id)),
      |nq AS (SELECT count(*) AS tn FROM tru),
      |cnt AS (SELECT
      |          (SELECT count(*) FROM e WHERE vec_id % 4 <> 0) AS n_built,
      |          (SELECT count(*) FROM e WHERE vec_id % 4 = 0) AS n_batch)
      |SELECT cnt.n_built, cnt.n_batch,
      |       round(CAST(cnt.n_batch AS DOUBLE) / cnt.n_built, 6) AS growth,
      |       round(CAST(h AS DOUBLE) / nq.tn, 6)
      |         AS recall_at_shortlist,
      |       round(eb.recon_err_built, 6) AS recon_err_built,
      |       round(ea.recon_err_batch, 6) AS recon_err_batch,
      |       round(ea.recon_err_batch / eb.recon_err_built, 6)
      |         AS recon_drift,
      |       CASE WHEN CAST(h AS DOUBLE) / nq.tn < 0.9
      |              OR ea.recon_err_batch / eb.recon_err_built > 1.5
      |            THEN 'rebuild' ELSE 'append' END AS recommendation
      |FROM cnt, hits, nq, eb, ea""".stripMargin

  private lazy val ivfRetrainOracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |b AS (SELECT vec_id, v FROM e WHERE vec_id % 4 <> 0),
      |co AS (SELECT cv, row_number() OVER (ORDER BY h, vid) - 1 AS cidx
      |       FROM (SELECT v AS cv, (vec_id*2654435761)%1000000007 AS h,
      |                    vec_id AS vid
      |             FROM b ORDER BY h, vid LIMIT 16)),
      |cn AS (SELECT cidx, CASE WHEN sqrt(list_dot_product(cv, cv)) = 0 THEN cv
      |         ELSE list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
      |         END AS cv FROM co),
      |sc AS (SELECT e.vec_id, cn.cidx, list_dot_product(e.v, cn.cv) AS s
      |       FROM e CROSS JOIN cn),
      |asn AS (SELECT vec_id, cidx FROM
      |         (SELECT vec_id, cidx, row_number() OVER
      |            (PARTITION BY vec_id ORDER BY s DESC, cidx) AS r FROM sc)
      |        WHERE r = 1),
      |x AS (SELECT vec_id, u.pos AS pos, u.val AS val FROM (
      |  SELECT vec_id,
      |         unnest([{'pos': i, 'val': v[i]} for i in range(1, len(v) + 1)])
      |           AS u
      |  FROM e)),
      |xb AS (SELECT asn.cidx, x.pos, x.val FROM x JOIN asn USING (vec_id)
      |       WHERE x.vec_id % 4 <> 0),
      |xa AS (SELECT asn.cidx, x.pos, x.val FROM x JOIN asn USING (vec_id)),
      |ca AS (SELECT cidx, list(m ORDER BY pos) AS c FROM (
      |    SELECT cidx, pos, avg(val) AS m FROM xb GROUP BY 1, 2)
      |  GROUP BY cidx),
      |cc AS (SELECT cidx, list(m ORDER BY pos) AS c FROM (
      |    SELECT cidx, pos, avg(val) AS m FROM xa GROUP BY 1, 2)
      |  GROUP BY cidx),
      |nafter AS (SELECT cidx, count(*) AS n_after FROM asn GROUP BY 1),
      |dr AS (SELECT ca.cidx,
      |         list_dot_product(ca.c, cc.c) /
      |           (sqrt(list_dot_product(ca.c, ca.c)) *
      |            sqrt(list_dot_product(cc.c, cc.c))) AS cos_sim,
      |         nafter.n_after AS n_after
      |       FROM ca JOIN cc USING (cidx) JOIN nafter USING (cidx)),
      |ds AS (SELECT sum(cos_sim * n_after) / sum(n_after) AS mean_drift,
      |              min(cos_sim) AS min_drift FROM dr),
      |pr AS (SELECT vec_id, cidx FROM
      |         (SELECT vec_id, cidx, row_number() OVER
      |            (PARTITION BY vec_id ORDER BY s DESC, cidx) AS r
      |          FROM sc WHERE vec_id < 8)
      |        WHERE r <= 6),
      |s2 AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         list_dot_product(qe.v, ce.v) /
      |           (sqrt(list_dot_product(qe.v, qe.v)) *
      |            sqrt(list_dot_product(ce.v, ce.v))) AS cos_sim
      |       FROM pr q JOIN asn c ON q.cidx = c.cidx
      |       JOIN e qe ON qe.vec_id = q.vec_id
      |       JOIN e ce ON ce.vec_id = c.vec_id
      |       WHERE c.vec_id <> q.vec_id),
      |approx AS (SELECT query_id, neighbor_id FROM
      |            (SELECT *, row_number() OVER
      |               (PARTITION BY query_id
      |                ORDER BY cos_sim DESC, neighbor_id) AS rk FROM s2)
      |           WHERE rk <= 5),
      |tru AS (SELECT query_id, neighbor_id FROM
      |          (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |             row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |               list_dot_product(q.v, c.v) /
      |                 (sqrt(list_dot_product(q.v, q.v)) *
      |                  sqrt(list_dot_product(c.v, c.v))) DESC, c.vec_id)
      |               AS rk
      |           FROM e q JOIN e c ON c.vec_id <> q.vec_id
      |           WHERE q.vec_id < 8)
      |        WHERE rk <= 5),
      |hits AS (SELECT count(*) AS h
      |         FROM approx JOIN tru USING (query_id, neighbor_id)),
      |nq AS (SELECT count(*) AS tn FROM tru),
      |cnt AS (SELECT
      |          (SELECT count(*) FROM e WHERE vec_id % 4 <> 0) AS n_built,
      |          (SELECT count(*) FROM e WHERE vec_id % 4 = 0) AS n_batch)
      |SELECT cnt.n_built, cnt.n_batch,
      |       round(CAST(cnt.n_batch AS DOUBLE) / cnt.n_built, 6) AS growth,
      |       round(CAST(h AS DOUBLE) / nq.tn, 6)
      |         AS recall_at_nprobe,
      |       round(ds.mean_drift, 6) AS mean_drift_cos,
      |       round(ds.min_drift, 6) AS min_drift_cos,
      |       CASE WHEN CAST(h AS DOUBLE) / nq.tn < 0.9
      |              OR ds.mean_drift < 0.95 THEN 'rebuild'
      |            ELSE 'append' END AS recommendation
      |FROM cnt, hits, nq, ds""".stripMargin

  private lazy val ivfAnnOracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |co AS (SELECT cv, row_number() OVER (ORDER BY h, vid) - 1 AS cidx
      |       FROM (SELECT v AS cv, (vec_id*2654435761)%1000000007 AS h,
      |                    vec_id AS vid
      |             FROM e ORDER BY h, vid LIMIT 16)),
      |cn AS (SELECT cidx, CASE WHEN sqrt(list_dot_product(cv, cv)) = 0 THEN cv
      |         ELSE list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
      |         END AS cv FROM co),
      |sc AS (SELECT e.vec_id, cn.cidx, list_dot_product(e.v, cn.cv) AS s
      |       FROM e CROSS JOIN cn),
      |asn AS (SELECT vec_id, cidx FROM
      |         (SELECT vec_id, cidx, row_number() OVER
      |            (PARTITION BY vec_id ORDER BY s DESC, cidx) AS r FROM sc)
      |        WHERE r = 1),
      |pr AS (SELECT vec_id, cidx FROM
      |         (SELECT vec_id, cidx, row_number() OVER
      |            (PARTITION BY vec_id ORDER BY s DESC, cidx) AS r
      |          FROM sc WHERE vec_id < 8)
      |        WHERE r <= 6),
      |s2 AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         list_dot_product(qe.v, ce.v) /
      |           (sqrt(list_dot_product(qe.v, qe.v)) *
      |            sqrt(list_dot_product(ce.v, ce.v))) AS cos_sim
      |       FROM pr q JOIN asn c ON q.cidx = c.cidx
      |       JOIN e qe ON qe.vec_id = q.vec_id
      |       JOIN e ce ON ce.vec_id = c.vec_id
      |       WHERE c.vec_id <> q.vec_id),
      |r AS (SELECT *, row_number() OVER
      |        (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
      |        AS rank FROM s2)
      |SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** DuckDB mirror of s11: same tokenize/tf/df/dl passes, the same
    * left-to-right BM25 term arithmetic (constants written identically
    * so both engines parse the same doubles), per-(query, doc) sum
    * rounded to 6 for the rank key — the t12 determinism rule. */
  /** Exact cross-side Jaccard oracle shared by d09 and the persisted
    * LSH index twins d33/d34 (same split, same threshold). */
  private lazy val neardupAgainstOracle: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |         list_distinct([array_to_string(t[i:i+2], ' ')
      |                        for i in range(1, len(t) - 1)]) AS s
      |  FROM (SELECT doc_id,
      |          CASE WHEN trim(text) = '' THEN []::VARCHAR[]
      |               ELSE string_split_regex(trim(text), '\s+') END AS t
      |        FROM documents))
      |SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
      |       len(list_intersect(b.s, c.s))::DOUBLE /
      |         len(list_distinct(list_concat(b.s, c.s)))::DOUBLE AS jaccard
      |FROM sh b JOIN sh c
      |  ON b.doc_id % 4 = 0 AND c.doc_id % 4 <> 0
      |WHERE len(list_distinct(list_concat(b.s, c.s))) > 0
      |  AND len(list_intersect(b.s, c.s))::DOUBLE /
      |        len(list_distinct(list_concat(b.s, c.s)))::DOUBLE >= 0.8
      |ORDER BY batch_id, corpus_id""".stripMargin

  private lazy val bm25Oracle: String =
    """WITH q(query_id, qtext) AS (VALUES (0, 'hash join order'),
      |    (1, 'fast scan filter'), (2, 'stream window agg')),
      |qt AS (SELECT query_id,
      |         unnest(list_distinct(string_split_regex(trim(qtext), '\s+')))
      |           AS token FROM q),
      |t AS (SELECT doc_id,
      |    CASE WHEN trim(text)='' THEN []::VARCHAR[]
      |         ELSE string_split_regex(trim(text), '\s+') END AS tk
      |  FROM documents),
      |e AS (SELECT doc_id, unnest(tk) AS token FROM t),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM e GROUP BY 1, 2),
      |dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      |dl AS (SELECT doc_id, count(*) AS dl FROM e GROUP BY 1),
      |g AS (SELECT count(*) AS n_docs,
      |        CAST(sum(len(tk)) AS BIGINT) AS total_tokens FROM t),
      |sc AS (SELECT qt.query_id, tf.doc_id,
      |         sum(ln(1.0 + (CAST(g.n_docs - dfq.df AS DOUBLE) + 0.5)
      |                      / (CAST(dfq.df AS DOUBLE) + 0.5)) *
      |             ((CAST(tf.tf AS DOUBLE) * 2.2) /
      |              (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 +
      |                (0.75 * CAST(dl.dl AS DOUBLE)) /
      |                (CAST(g.total_tokens AS DOUBLE)
      |                 / CAST(g.n_docs AS DOUBLE)))))) AS score
      |       FROM qt JOIN tf USING (token) JOIN dfq USING (token)
      |       JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN g
      |       GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER
      |        (PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id)
      |        AS rank FROM sc)
      |SELECT query_id, doc_id, rank, round(score, 6) AS score
      |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** DuckDB mirror of s28: hash-order seed, four unrolled greedy
    * rounds; per-pair distances round to 9 before the min/argmax, ties
    * to the smaller id — the kmeansAssign determinism contract. */
  private lazy val farthestOracle: String = {
    def dist(v: String, c: String) =
      s"""round(list_dot_product($v, $v) - 2 * list_dot_product($v, $c)
         |        + list_dot_product($c, $c), 9)""".stripMargin
    def rnd(k: Int): String =
      s"""d$k AS (SELECT d.vec_id, d.v,
         |        least(d.d, ${dist("d.v", "s.v")}) AS d
         |      FROM d${k - 1} d CROSS JOIN s${k - 1} s
         |      WHERE d.vec_id <> s.vec_id),
         |s$k AS (SELECT vec_id, v FROM
         |         (SELECT vec_id, v FROM d$k ORDER BY d DESC, vec_id
         |          LIMIT 1))""".stripMargin
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |s0 AS (SELECT vec_id, v FROM
       |        (SELECT vec_id, v FROM e
       |         ORDER BY (vec_id*2654435761)%1000000007, vec_id LIMIT 1)),
       |d1 AS (SELECT e.vec_id, e.v, ${dist("e.v", "s.v")} AS d
       |       FROM e CROSS JOIN s0 s WHERE e.vec_id <> s.vec_id),
       |s1 AS (SELECT vec_id, v FROM
       |        (SELECT vec_id, v FROM d1 ORDER BY d DESC, vec_id LIMIT 1)),
       |${rnd(2)},
       |${rnd(3)},
       |${rnd(4)}
       |SELECT * FROM (
       |  SELECT CAST(0 AS BIGINT) AS sel_idx,
       |         (SELECT vec_id FROM s0) AS vec_id
       |  UNION ALL SELECT 1, (SELECT vec_id FROM s1)
       |  UNION ALL SELECT 2, (SELECT vec_id FROM s2)
       |  UNION ALL SELECT 3, (SELECT vec_id FROM s3)
       |  UNION ALL SELECT 4, (SELECT vec_id FROM s4))
       |ORDER BY sel_idx""".stripMargin
  }

  /** DuckDB mirror of e46: the e28 chain CTEs + the π-weighted
    * −Σ π·P·log₂P contraction. */
  private lazy val markovEntropyOracle: String = {
    def round(k: Int): String =
      s"""m$k AS (SELECT p.t AS ty, sum(pi${k - 1}.pi * p.p) AS m
         |       FROM p JOIN pi${k - 1} ON pi${k - 1}.ty = p.f GROUP BY 1),
         |s$k AS (SELECT sum(m) AS s FROM m$k),
         |pi$k AS (SELECT ty.ty, coalesce(m$k.m, 0) / (SELECT s FROM s$k) AS pi
         |        FROM ty LEFT JOIN m$k ON ty.ty = m$k.ty)""".stripMargin
    s"""WITH nx AS (SELECT event_type AS f,
       |        lead(event_type) OVER
       |          (PARTITION BY user_id ORDER BY ts, event_id) AS t
       |      FROM events),
       |tr AS (SELECT f, t, count(*) AS n FROM nx
       |       WHERE t IS NOT NULL GROUP BY 1, 2),
       |tt AS (SELECT f, sum(n) AS tn FROM tr GROUP BY 1),
       |p AS (SELECT tr.f, tr.t, CAST(tr.n AS DOUBLE) / tt.tn AS p
       |      FROM tr JOIN tt ON tr.f = tt.f),
       |ty AS (SELECT DISTINCT ty FROM
       |        (SELECT f AS ty FROM p UNION ALL SELECT t FROM p)),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ty),
       |pi0 AS (SELECT ty, 1.0 / (SELECT n FROM nn) AS pi FROM ty),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT CAST(count(DISTINCT p.f) AS BIGINT) AS n_states,
       |       round(-sum(pi3.pi * p.p * ln(p.p)) / ln(2.0), 6)
       |         AS entropy_rate_bits
       |FROM p JOIN pi3 ON pi3.ty = p.f""".stripMargin
  }

  /** DuckDB mirror of t41: the same five-sum Pearson over raw values
    * and over (value, doc_id) row_number ranks. */
  private lazy val lenQualityCorrOracle: String =
    s"""WITH h AS (
       |  $sqlTextFeatures),
       |q0 AS (SELECT doc_id, n_chars, n_tok, n_stop, n_punct,
       |         $sqlQuality AS q FROM h),
       |b AS (SELECT d.source, q0.doc_id,
       |        CAST(q0.n_chars AS DOUBLE) AS x, q0.q AS y,
       |        CAST(row_number() OVER (PARTITION BY d.source
       |          ORDER BY q0.n_chars, q0.doc_id) AS DOUBLE) AS rx,
       |        CAST(row_number() OVER (PARTITION BY d.source
       |          ORDER BY q0.q, q0.doc_id) AS DOUBLE) AS ry
       |      FROM q0 JOIN documents d ON d.doc_id = q0.doc_id),
       |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
       |        sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
       |        sum(x*x) AS sxx, sum(y*y) AS syy,
       |        sum(rx) AS srx, sum(ry) AS sry, sum(rx*ry) AS srxy,
       |        sum(rx*rx) AS srxx, sum(ry*ry) AS sryy
       |      FROM b GROUP BY 1)
       |SELECT source, n AS n_rows,
       |  round((n * sxy - sx * sy) /
       |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS pearson,
       |  round((n * srxy - srx * sry) /
       |    sqrt((n * srxx - srx * srx) * (n * sryy - sry * sry)), 6)
       |    AS spearman
       |FROM s ORDER BY source""".stripMargin

  /** DuckDB mirror of t40: the p02 gram chain grouped up to sources
    * with zero-filled clean sources. */
  private lazy val contaminationBySourceOracle: String =
    s"""WITH $decontCtes,
       |bad AS (SELECT h.doc_id, CAST(h.n_hit AS DOUBLE)/h.n_grams AS c
       |        FROM h WHERE CAST(h.n_hit AS DOUBLE)/h.n_grams >= 0.1),
       |bs AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_cont,
       |         round(avg(bad.c), 6) AS avg_c
       |       FROM bad JOIN documents d ON d.doc_id = bad.doc_id
       |       GROUP BY 1),
       |t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |      FROM documents WHERE doc_id >= 20 GROUP BY 1)
       |SELECT t.source AS source, t.n_docs,
       |       coalesce(bs.n_cont, 0) AS n_contaminated,
       |       coalesce(bs.avg_c, 0.0) AS avg_contamination,
       |       round(CAST(coalesce(bs.n_cont, 0) AS DOUBLE) / t.n_docs, 6)
       |         AS contaminated_frac
       |FROM t LEFT JOIN bs ON t.source = bs.source
       |ORDER BY source""".stripMargin

  /** DuckDB mirror of p24: per-source quality sums, 1-row totals, the
    * additive LOO delta. */
  private lazy val looValueOracle: String =
    s"""WITH h AS (
       |  $sqlTextFeatures),
       |q0 AS (SELECT doc_id, n_chars, n_tok, n_stop, n_punct,
       |         $sqlQuality AS q FROM h),
       |q AS (SELECT q0.q, d.source FROM q0
       |      JOIN documents d ON d.doc_id = q0.doc_id),
       |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |          sum(q) AS sq FROM q GROUP BY 1),
       |tot AS (SELECT sum(n_docs) AS n, sum(sq) AS s FROM per)
       |SELECT source, n_docs, round(sq / n_docs, 6) AS avg_quality,
       |       round(CASE WHEN tot.n = per.n_docs THEN 0.0
       |             ELSE (tot.s / tot.n)
       |                  - (tot.s - per.sq) / (tot.n - per.n_docs)
       |             END, 6) AS loo_delta
       |FROM per CROSS JOIN tot ORDER BY source""".stripMargin

  /** DuckDB mirror of e37: per-user RFM triple (monetary rounded to 6
    * BEFORE scoring on both sides), 12 exact quintile cutpoints,
    * value-greater-than scoring with recency inverted. */
  private lazy val rfmOracle: String = {
    val ps = Seq(0.2, 0.4, 0.6, 0.8)
    def cuts(c: String) = ps.zipWithIndex.map { case (p, i) =>
      s"quantile_disc($c, $p) AS ${c.take(1)}$i" }.mkString(", ")
    def raw(c: String) = "1 + " + ps.indices.map(i =>
      s"(CASE WHEN $c > c.${c.take(1)}$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH rt AS (SELECT max(epoch_ms(ts)) AS ref FROM events),
       |u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS frequency,
       |        round(sum(value), 6) AS monetary,
       |        CAST(floor((rt.ref - max(epoch_ms(ts))) / 86400000)
       |          AS BIGINT) AS recency_days
       |      FROM events CROSS JOIN rt GROUP BY user_id, rt.ref),
       |c AS (SELECT ${cuts("recency_days")}, ${cuts("frequency")},
       |        ${cuts("monetary")} FROM u),
       |s AS (SELECT u.*,
       |        6 - (${raw("recency_days")}) AS rs,
       |        ${raw("frequency")} AS fs,
       |        ${raw("monetary")} AS ms
       |      FROM u CROSS JOIN c)
       |SELECT user_id, recency_days, frequency, monetary,
       |       CAST(rs AS BIGINT) AS r_score, CAST(fs AS BIGINT) AS f_score,
       |       CAST(ms AS BIGINT) AS m_score,
       |       CAST(rs * 100 + fs * 10 + ms AS BIGINT) AS segment
       |FROM s ORDER BY user_id""".stripMargin
  }

  /** DuckDB mirror of s27: the full s11 BM25 chain, top-10 feedback
    * docs, RM1 term weights Σ tf/dl with the query's own terms
    * anti-joined out, (round-6 weight, term) ranking. */
  private lazy val prfOracle: String =
    """WITH q(query_id, qtext) AS (VALUES (0, 'hash join order'),
      |    (1, 'fast scan filter'), (2, 'stream window agg')),
      |qt AS (SELECT query_id,
      |         unnest(list_distinct(string_split_regex(trim(qtext), '\s+')))
      |           AS token FROM q),
      |t AS (SELECT doc_id,
      |    CASE WHEN trim(text)='' THEN []::VARCHAR[]
      |         ELSE string_split_regex(trim(text), '\s+') END AS tk
      |  FROM documents),
      |e AS (SELECT doc_id, unnest(tk) AS token FROM t),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM e GROUP BY 1, 2),
      |dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      |dl AS (SELECT doc_id, count(*) AS dl FROM e GROUP BY 1),
      |g AS (SELECT count(*) AS n_docs,
      |        CAST(sum(len(tk)) AS BIGINT) AS total_tokens FROM t),
      |sc AS (SELECT qt.query_id, tf.doc_id,
      |         sum(ln(1.0 + (CAST(g.n_docs - dfq.df AS DOUBLE) + 0.5)
      |                      / (CAST(dfq.df AS DOUBLE) + 0.5)) *
      |             ((CAST(tf.tf AS DOUBLE) * 2.2) /
      |              (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 +
      |                (0.75 * CAST(dl.dl AS DOUBLE)) /
      |                (CAST(g.total_tokens AS DOUBLE)
      |                 / CAST(g.n_docs AS DOUBLE)))))) AS score
      |       FROM qt JOIN tf USING (token) JOIN dfq USING (token)
      |       JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN g
      |       GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER
      |        (PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id)
      |        AS rank FROM sc),
      |top AS (SELECT query_id, doc_id FROM r WHERE rank <= 10),
      |wgt AS (SELECT top.query_id, tf.token,
      |          sum(CAST(tf.tf AS DOUBLE) / CAST(dl.dl AS DOUBLE))
      |            AS weight
      |        FROM top JOIN tf ON tf.doc_id = top.doc_id
      |        JOIN dl ON dl.doc_id = top.doc_id
      |        GROUP BY 1, 2),
      |wx AS (SELECT wgt.* FROM wgt LEFT JOIN qt
      |         ON qt.query_id = wgt.query_id AND qt.token = wgt.token
      |       WHERE qt.token IS NULL),
      |rk AS (SELECT *, row_number() OVER
      |         (PARTITION BY query_id
      |          ORDER BY round(weight, 6) DESC, token) AS rank FROM wx)
      |SELECT query_id, token AS term, rank, round(weight, 6) AS weight
      |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** DuckDB mirror of s17: the s11 BM25 chain (queries = documents
    * 0..7 retrieving with their own text), the s01 dense cosine chain,
    * then the RRF sum with the same round-9 ranking key. */
  private lazy val rrfFusionOracle: String =
    """WITH qt AS (SELECT doc_id AS query_id,
      |    unnest(list_distinct(string_split_regex(trim(text), '\s+')))
      |      AS token FROM documents WHERE doc_id < 8),
      |t AS (SELECT doc_id,
      |    CASE WHEN trim(text)='' THEN []::VARCHAR[]
      |         ELSE string_split_regex(trim(text), '\s+') END AS tk
      |  FROM documents),
      |e AS (SELECT doc_id, unnest(tk) AS token FROM t),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM e GROUP BY 1, 2),
      |dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      |dl AS (SELECT doc_id, count(*) AS dl FROM e GROUP BY 1),
      |g AS (SELECT count(*) AS n_docs,
      |        CAST(sum(len(tk)) AS BIGINT) AS total_tokens FROM t),
      |sc AS (SELECT qt.query_id, tf.doc_id,
      |         sum(ln(1.0 + (CAST(g.n_docs - dfq.df AS DOUBLE) + 0.5)
      |                      / (CAST(dfq.df AS DOUBLE) + 0.5)) *
      |             ((CAST(tf.tf AS DOUBLE) * 2.2) /
      |              (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 +
      |                (0.75 * CAST(dl.dl AS DOUBLE)) /
      |                (CAST(g.total_tokens AS DOUBLE)
      |                 / CAST(g.n_docs AS DOUBLE)))))) AS score
      |       FROM qt JOIN tf USING (token) JOIN dfq USING (token)
      |       JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN g
      |       GROUP BY 1, 2),
      |sr AS (SELECT query_id, doc_id, row_number() OVER
      |        (PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id)
      |        AS rank FROM sc),
      |ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |       FROM embeddings),
      |ds AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
      |        list_dot_product(q.v, c.v) /
      |          (sqrt(list_dot_product(q.v, q.v)) *
      |           sqrt(list_dot_product(c.v, c.v))) AS cos_sim
      |      FROM ev q, ev c WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
      |dr AS (SELECT query_id, doc_id, row_number() OVER
      |        (PARTITION BY query_id ORDER BY cos_sim DESC, doc_id) AS rank
      |       FROM ds),
      |u AS (SELECT query_id, doc_id, CAST(1 AS DOUBLE)/(60 + rank) AS c
      |      FROM sr WHERE rank <= 10
      |      UNION ALL
      |      SELECT query_id, doc_id, CAST(1 AS DOUBLE)/(60 + rank)
      |      FROM dr WHERE rank <= 10),
      |f AS (SELECT query_id, doc_id, sum(c) AS rrf_score,
      |        count(*) AS n_runs FROM u GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |        ORDER BY round(rrf_score, 9) DESC, doc_id) AS rank FROM f)
      |SELECT query_id, doc_id, rank, round(rrf_score, 6) AS rrf_score,
      |       n_runs
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** DuckDB mirror of s18: exact-cosine run, same-label qrels, and the
    * MRR / binary-nDCG arithmetic with the per-row IDCG series. */
  private lazy val retrievalEvalOracle: String =
    """WITH ev AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      |       FROM embeddings),
      |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
      |        list_dot_product(q.v, c.v) /
      |          (sqrt(list_dot_product(q.v, q.v)) *
      |           sqrt(list_dot_product(c.v, c.v))) AS cos
      |      FROM ev q, ev c WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
      |run AS (SELECT query_id, doc_id, row_number() OVER
      |        (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rank
      |       FROM sc),
      |qr AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id
      |       FROM ev q JOIN ev c ON q.label = c.label
      |         AND c.vec_id <> q.vec_id
      |       WHERE q.vec_id < 8),
      |nr AS (SELECT query_id, count(*) AS n_rel FROM qr GROUP BY 1),
      |h AS (SELECT r.query_id, count(*) AS hits,
      |        max(CAST(1 AS DOUBLE)/r.rank) AS mrr_raw,
      |        sum(CAST(1 AS DOUBLE)/log2(r.rank + 1)) AS dcg
      |      FROM run r JOIN qr ON r.query_id = qr.query_id
      |        AND r.doc_id = qr.doc_id
      |      WHERE r.rank <= 10 GROUP BY 1),
      |qs AS (SELECT DISTINCT query_id FROM run)
      |SELECT qs.query_id, coalesce(n_rel, 0) AS n_rel,
      |       coalesce(hits, 0) AS hits,
      |       round(coalesce(mrr_raw, CAST(0 AS DOUBLE)), 6) AS mrr,
      |       round(CASE WHEN coalesce(n_rel, 0) = 0 THEN CAST(0 AS DOUBLE)
      |         ELSE coalesce(dcg, CAST(0 AS DOUBLE)) /
      |           list_sum(list_transform(range(1, least(n_rel, 10) + 1),
      |             x -> CAST(1 AS DOUBLE)/log2(x + 1))) END, 6) AS ndcg
      |FROM qs LEFT JOIN nr USING (query_id) LEFT JOIN h USING (query_id)
      |ORDER BY query_id""".stripMargin

  /** DuckDB mirror of s19: the s01 candidate chain capped at 8, then
    * the three greedy MMR steps unrolled (redundancy = max cosine to
    * the already-picked set; (1−λ) computed in DOUBLE exactly as the
    * engine does, so the penalty constant is bit-identical). */
  private lazy val mmrRerankOracle: String =
    """WITH ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |       FROM embeddings),
      |en AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM ev),
      |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
      |        list_dot_product(q.v, c.v)/(q.n*c.n) AS rel, c.v, c.n
      |      FROM en q, en c WHERE q.vec_id < 4 AND c.vec_id <> q.vec_id),
      |cand AS (SELECT query_id, doc_id, rel, v, n FROM
      |    (SELECT *, row_number() OVER (PARTITION BY query_id
      |       ORDER BY rel DESC, doc_id) AS rk FROM sc) WHERE rk <= 8),
      |p1 AS (SELECT query_id, doc_id, 0.7*rel AS mmr, v, n FROM
      |    (SELECT *, row_number() OVER (PARTITION BY query_id
      |       ORDER BY round(0.7*rel, 6) DESC, doc_id) AS rk FROM cand)
      |    WHERE rk = 1),
      |c2 AS (SELECT c.query_id, c.doc_id, c.rel, c.v, c.n,
      |        list_dot_product(c.v, p.v)/(c.n*p.n) AS red
      |      FROM cand c JOIN p1 p ON c.query_id = p.query_id
      |        AND c.doc_id <> p.doc_id),
      |p2 AS (SELECT query_id, doc_id,
      |        0.7*rel - (CAST(1 AS DOUBLE) - 0.7)*red AS mmr, v, n FROM
      |    (SELECT *, row_number() OVER (PARTITION BY query_id
      |       ORDER BY round(0.7*rel - (CAST(1 AS DOUBLE) - 0.7)*red, 6)
      |         DESC, doc_id) AS rk FROM c2) WHERE rk = 1),
      |sel2 AS (SELECT query_id, doc_id, v, n FROM p1
      |         UNION ALL SELECT query_id, doc_id, v, n FROM p2),
      |c3 AS (SELECT c.query_id, c.doc_id, c.rel,
      |        max(list_dot_product(c.v, s.v)/(c.n*s.n)) AS red
      |      FROM cand c JOIN sel2 s ON c.query_id = s.query_id
      |      WHERE NOT EXISTS (SELECT 1 FROM sel2 x
      |        WHERE x.query_id = c.query_id AND x.doc_id = c.doc_id)
      |      GROUP BY c.query_id, c.doc_id, c.rel),
      |p3 AS (SELECT query_id, doc_id,
      |        0.7*rel - (CAST(1 AS DOUBLE) - 0.7)*red AS mmr FROM
      |    (SELECT *, row_number() OVER (PARTITION BY query_id
      |       ORDER BY round(0.7*rel - (CAST(1 AS DOUBLE) - 0.7)*red, 6)
      |         DESC, doc_id) AS rk FROM c3) WHERE rk = 1)
      |SELECT query_id, doc_id, CAST(1 AS BIGINT) AS step,
      |       round(mmr, 6) AS mmr_score FROM p1
      |UNION ALL SELECT query_id, doc_id, 2, round(mmr, 6) FROM p2
      |UNION ALL SELECT query_id, doc_id, 3, round(mmr, 6) FROM p3
      |ORDER BY query_id, step""".stripMargin

  /** Shared winnowing CTE chain (t20/d12): fingerprint64 token hashes
    * (the t08 pairing), 131-chained modular 3-gram hashes, window-4
    * minima, distinct per doc. All integer arithmetic — exact. */
  private def winnowCtes: String =
    s"""t AS (SELECT doc_id,
       |    CASE WHEN trim(text)='' THEN []
       |         ELSE string_split_regex(trim(text),'\\s+') END AS toks
       |  FROM documents),
       |th AS (SELECT doc_id, list_transform(toks, t -> ${sqlFp("t", w31)}) AS th
       |  FROM t),
       |g AS (SELECT doc_id,
       |    CASE WHEN len(th) < 3 THEN []
       |    ELSE [ (((th[i]*131 + th[i+1]) % 1000000007) * 131 + th[i+2])
       |             % 1000000007
       |           for i in range(1, len(th) - 1)] END AS grams FROM th),
       |w AS (SELECT doc_id,
       |    list_distinct([ list_min(grams[i:i+3])
       |                    for i in range(1, greatest(1, len(grams) - 3) + 1)])
       |      AS fps
       |  FROM g WHERE len(grams) > 0)""".stripMargin

  /** DuckDB mirror of t20. */
  private lazy val winnowOracle: String =
    s"""WITH $winnowCtes
       |SELECT doc_id, unnest(fps) AS fp FROM w ORDER BY doc_id, fp""".stripMargin

  /** DuckDB mirror of d12: uncapped all-pairs self-join over the
    * exploded fingerprint sets, shared count >= 2. */
  private lazy val winnowDupOracle: String =
    s"""WITH $winnowCtes,
       |f AS (SELECT doc_id, unnest(fps) AS fp FROM w)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
       |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY id_a, id_b""".stripMargin

  /** DuckDB mirror of s12: the s02 hyperplane family as VALUE-level
    * projections (list_dot_product — the s08-proven accumulation),
    * projected-cosine shortlist of 20 with (sim desc, id) order, exact
    * cosine re-rank — both stages mirrored like s09. */
  private lazy val rpAnnOracle: String = {
    val m1 = "((((p*131)+i)*2654435761+9176)%1000003)"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |rp AS (SELECT vec_id,
      |  [ list_dot_product(v,
      |      [ ($m1 * ($m1 + 13)) % 1000003 / 1000003.0 - 0.5
      |        for i in range(1, len(v)+1) ])
      |    for p in range(0, 8) ] AS pv
      |  FROM e),
      |s1 AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |        CASE WHEN sqrt(list_dot_product(q.pv, q.pv)) = 0
      |               OR sqrt(list_dot_product(c.pv, c.pv)) = 0 THEN 0.0
      |          ELSE list_dot_product(q.pv, c.pv) /
      |            (sqrt(list_dot_product(q.pv, q.pv)) *
      |             sqrt(list_dot_product(c.pv, c.pv)))
      |        END AS proj_sim
      |      FROM rp q CROSS JOIN rp c
      |      WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
      |sl AS (SELECT query_id, neighbor_id FROM
      |        (SELECT *, row_number() OVER
      |           (PARTITION BY query_id ORDER BY proj_sim DESC, neighbor_id)
      |           AS r FROM s1) WHERE r <= 20),
      |ex AS (SELECT sl.query_id, sl.neighbor_id,
      |        list_dot_product(qe.v, ce.v) /
      |          (sqrt(list_dot_product(qe.v, qe.v)) *
      |           sqrt(list_dot_product(ce.v, ce.v))) AS cos_sim
      |      FROM sl JOIN e qe ON qe.vec_id = sl.query_id
      |      JOIN e ce ON ce.vec_id = sl.neighbor_id),
      |rk AS (SELECT *, row_number() OVER
      |        (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
      |        AS rank FROM ex)
      |SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim
      |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB mirror of d13: winnow-fingerprint candidates (the t20/d12
    * CTE chain, shared count >= 2), then exact containment over STRING
    * 3-gram shingle sets — equal to the hashed-set value modulo ~2^-64
    * collision odds (the d02 convention). */
  private lazy val containmentOracle: String =
    s"""WITH $winnowCtes,
       |f AS (SELECT doc_id, unnest(fps) AS fp FROM w),
       |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |         GROUP BY 1, 2 HAVING count(*) >= 2),
       |sh AS (SELECT doc_id,
       |         list_distinct([array_to_string(toks[i:i+2], ' ')
       |                        for i in range(1, len(toks) - 1)]) AS s
       |       FROM t),
       |v AS (SELECT id_a, id_b,
       |        CASE WHEN least(len(a.s), len(b.s)) = 0 THEN 0.0
       |             ELSE len(list_intersect(a.s, b.s))::DOUBLE /
       |                  least(len(a.s), len(b.s))::DOUBLE END AS containment
       |      FROM cand JOIN sh a ON a.doc_id = cand.id_a
       |      JOIN sh b ON b.doc_id = cand.id_b)
       |SELECT id_a, id_b, round(containment, 6) AS containment
       |FROM v WHERE containment >= 0.5 ORDER BY id_a, id_b""".stripMargin

  /** DuckDB mirror of t24: the sqlTextFeatures hit counts, best/second
    * via a sorted 4-list, relative margin as an exact division. */
  private lazy val langMarginOracle: String = {
    val hitList = "[" + TextOps.LangMarkers.map("h_" + _._1).mkString(", ") + "]"
    s"""WITH h AS (
       |  $sqlTextFeatures),
       |b AS (SELECT doc_id, $sqlBest AS best,
       |        list_sort($hitList)[${TextOps.LangMarkers.size - 1}] AS second,
       |        $hitList AS hl
       |      FROM h),
       |l AS (SELECT doc_id, best, second,
       |        ${sqlLangCase.replace("h_en", "hl[1]").replace("h_de", "hl[2]")
                  .replace("h_fr", "hl[3]").replace("h_es", "hl[4]")} AS lang_pred
       |      FROM b)
       |SELECT doc_id, lang_pred, CAST(best AS BIGINT) AS best_hits,
       |       CAST(second AS BIGINT) AS second_hits,
       |       CASE WHEN best = 0 THEN 0.0
       |            ELSE CAST(best - second AS DOUBLE) / CAST(best AS DOUBLE)
       |       END AS margin
       |FROM l ORDER BY doc_id""".stripMargin
  }

  /** DuckDB mirror of s16: the s03 centroid assignment + probe-list
    * CTEs composed with the s08/s09 encode/reconstruct chain —
    * candidates are probed-list members only, stage 1 is ADC L2² over
    * reconstructions with (d, id) order, stage 2 exact cosine. */
  private lazy val ivfPqOracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |co AS (SELECT cv, row_number() OVER (ORDER BY h, vid) - 1 AS cidx
      |       FROM (SELECT v AS cv, (vec_id*2654435761)%1000000007 AS h,
      |                    vec_id AS vid
      |             FROM e ORDER BY h, vid LIMIT 16)),
      |cn AS (SELECT cidx, CASE WHEN sqrt(list_dot_product(cv, cv)) = 0 THEN cv
      |         ELSE list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
      |         END AS cv FROM co),
      |sc AS (SELECT e.vec_id, cn.cidx, list_dot_product(e.v, cn.cv) AS s
      |       FROM e CROSS JOIN cn),
      |asn AS (SELECT vec_id, cidx FROM
      |         (SELECT vec_id, cidx, row_number() OVER
      |            (PARTITION BY vec_id ORDER BY s DESC, cidx) AS r FROM sc)
      |        WHERE r = 1),
      |pr AS (SELECT vec_id, cidx FROM
      |         (SELECT vec_id, cidx, row_number() OVER
      |            (PARTITION BY vec_id ORDER BY s DESC, cidx) AS r
      |          FROM sc WHERE vec_id < 8)
      |        WHERE r <= 6),
      |sd AS (SELECT v AS sv, row_number() OVER (ORDER BY h, vid) - 1 AS j
      |       FROM (SELECT v, (vec_id*2654435761)%1000000007 AS h,
      |                    vec_id AS vid
      |             FROM e ORDER BY h, vid LIMIT 16)),
      |cb AS (SELECT ss.s AS s, sd.j AS j,
      |              sv[ss.s*8+1 : ss.s*8+8] AS c
      |       FROM sd CROSS JOIN (SELECT unnest(range(0, 8)) AS s) ss),
      |cbc AS (SELECT s, j, c, list_dot_product(c, c) AS cc FROM cb),
      |dist AS (SELECT e.vec_id, b.s, b.j,
      |           list_dot_product(e.v[b.s*8+1 : b.s*8+8],
      |                            e.v[b.s*8+1 : b.s*8+8])
      |           - 2*list_dot_product(e.v[b.s*8+1 : b.s*8+8], b.c)
      |           + b.cc AS d
      |         FROM e CROSS JOIN cbc b),
      |code AS (SELECT vec_id, s, j FROM
      |          (SELECT vec_id, s, j, row_number() OVER
      |             (PARTITION BY vec_id, s ORDER BY d, j) AS r FROM dist)
      |         WHERE r = 1),
      |rec AS (SELECT code.vec_id, flatten(list(b.c ORDER BY code.s)) AS rv
      |        FROM code JOIN cbc b ON b.s = code.s AND b.j = code.j
      |        GROUP BY code.vec_id),
      |s2 AS (SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         list_dot_product(qe.v, qe.v)
      |           - 2*list_dot_product(qe.v, r2.rv)
      |           + list_dot_product(r2.rv, r2.rv) AS d
      |       FROM pr p JOIN asn c ON p.cidx = c.cidx
      |       JOIN e qe ON qe.vec_id = p.vec_id
      |       JOIN rec r2 ON r2.vec_id = c.vec_id
      |       WHERE c.vec_id <> p.vec_id),
      |sl AS (SELECT query_id, neighbor_id FROM
      |         (SELECT *, row_number() OVER
      |            (PARTITION BY query_id ORDER BY d, neighbor_id) AS r FROM s2)
      |       WHERE r <= 20),
      |ex AS (SELECT sl.query_id, sl.neighbor_id,
      |         list_dot_product(qe.v, ce.v) /
      |           (sqrt(list_dot_product(qe.v, qe.v)) *
      |            sqrt(list_dot_product(ce.v, ce.v))) AS cos_sim
      |       FROM sl JOIN e qe ON qe.vec_id = sl.query_id
      |       JOIN e ce ON ce.vec_id = sl.neighbor_id),
      |rk AS (SELECT *, row_number() OVER
      |         (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
      |         AS rank FROM ex)
      |SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim
      |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** DuckDB mirror of s14: the s01 exact and s02 LSH top-5 CTE chains
    * joined into per-query hit counts; recall is an exact-count
    * division. */
  private lazy val annRecallOracle: String = {
    val m1 = "((((p*131)+i)*2654435761+9176)%1000003)"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |b AS (SELECT vec_id, v,
      |  CAST(list_sum([CASE WHEN
      |    list_sum([v[i] *
      |      (($m1 * ($m1 + 13)) % 1000003 / 1000003.0 - 0.5)
      |              for i in range(1, len(v)+1)]) >= 0
      |    THEN (1::BIGINT << p) ELSE 0 END for p in range(0, 4)]) AS BIGINT) AS bkt
      |  FROM e),
      |sa AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |        list_dot_product(q.v, c.v) /
      |          (sqrt(list_dot_product(q.v, q.v)) *
      |           sqrt(list_dot_product(c.v, c.v))) AS cos_sim
      |      FROM b q JOIN b c ON q.bkt = c.bkt
      |      WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
      |ra AS (SELECT query_id, neighbor_id FROM
      |        (SELECT *, row_number() OVER
      |           (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
      |           AS rank FROM sa) WHERE rank <= 5),
      |se AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |        list_dot_product(q.v, c.v) /
      |          (sqrt(list_dot_product(q.v, q.v)) *
      |           sqrt(list_dot_product(c.v, c.v))) AS cos_sim
      |      FROM e q, e c
      |      WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
      |re AS (SELECT query_id, neighbor_id FROM
      |        (SELECT *, row_number() OVER
      |           (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
      |           AS rank FROM se) WHERE rank <= 5),
      |h AS (SELECT re.query_id, count(*) AS n_hits
      |      FROM re JOIN ra ON re.query_id = ra.query_id
      |        AND re.neighbor_id = ra.neighbor_id
      |      GROUP BY 1),
      |ne AS (SELECT query_id, count(*) AS n_exact FROM re GROUP BY 1)
      |SELECT ne.query_id, n_exact, coalesce(h.n_hits, 0) AS n_hits,
      |       CAST(coalesce(h.n_hits, 0) AS DOUBLE) / CAST(n_exact AS DOUBLE)
      |         AS recall
      |FROM ne LEFT JOIN h USING (query_id)
      |ORDER BY ne.query_id""".stripMargin
  }

  /** DuckDB mirror of p10: the t19 scrub CTEs feeding the t02 quality
    * formula over the SCRUBBED text (n_chars = its length), the d14
    * normalization dedup, and the per-language rollup. */
  private lazy val curationV2Oracle: String = {
    val hitExprs = TextOps.LangMarkers.map { case (l, pat) =>
      s"len(regexp_extract_all(lower(text), '$pat')) AS h_$l"
    }.mkString(",\n       |        ")
    s"""WITH l AS (
       |  SELECT doc_id, u.pos AS pos, u.line AS line FROM (
       |    SELECT doc_id,
       |      unnest([{'pos': i, 'line': ls[i]}
       |              for i in range(1, len(ls) + 1)]) AS u
       |    FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
       |          FROM documents))),
       |hot AS (SELECT line FROM (
       |    SELECT line, count(DISTINCT doc_id) AS dfq FROM l
       |    WHERE length(line) >= 10 GROUP BY line)
       |  WHERE dfq >= 3),
       |agg AS (SELECT doc_id,
       |        string_agg(line, chr(10) ORDER BY pos) AS text_clean
       |      FROM l WHERE length(line) < 10
       |         OR line NOT IN (SELECT line FROM hot)
       |      GROUP BY doc_id),
       |sc AS (SELECT d.doc_id, d.lang,
       |         coalesce(agg.text_clean, '') AS text
       |       FROM documents d LEFT JOIN agg USING (doc_id)),
       |h AS (SELECT doc_id, lang, text, length(text) AS n_chars,
       |        $hitExprs,
       |        CASE WHEN trim(text) = '' THEN 0
       |             ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok,
       |        len(regexp_extract_all(text,
       |          '(?i)\\b(the|a|an|and|of|to|in|is)\\b')) AS n_stop,
       |        len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
       |      FROM sc),
       |q AS (SELECT doc_id, lang, text, quality FROM (
       |        SELECT *, $sqlQuality AS quality FROM h)
       |      WHERE quality >= 0.4),
       |nr AS (SELECT *, trim(regexp_replace(regexp_replace(lower(text),
       |         '[\\x00-\\x1f\\x7f]', ' ', 'g'), '\\s+', ' ', 'g')) AS nt
       |       FROM q),
       |k AS (SELECT min(doc_id) AS doc_id FROM nr GROUP BY nt),
       |f AS (SELECT nr.* FROM nr JOIN k USING (doc_id))
       |SELECT lang, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN trim(text) = '' THEN 0
       |                ELSE len(string_split_regex(trim(text), '\\s+')) END)
       |            AS BIGINT) AS n_tokens,
       |       round(avg(quality), 6) AS avg_quality
       |FROM f GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** DuckDB mirror of t21: the t18 LM-score CTE chain, per-doc scores
    * rounded to 6, per-language tertile thresholds via quantile_disc
    * (same smallest-value-with-CDF>=p convention as the engine
    * PercentileDisc — verified over n=4..10), CASE bucketing. */
  private lazy val pplBucketsOracle: String =
    """WITH t AS (SELECT doc_id, lang,
      |    CASE WHEN trim(text)='' THEN []::VARCHAR[]
      |         ELSE string_split_regex(trim(text), '\s+') END AS tk
      |  FROM documents),
      |ru AS (SELECT unnest(tk) AS w FROM t WHERE lang = 'en'),
      |uni AS (SELECT w, count(*) AS cu FROM ru GROUP BY 1),
      |g AS (SELECT sum(cu) AS n, count(*) AS v FROM uni),
      |rb AS (SELECT unnest([{'u': tk[i], 'v': tk[i+1]}
      |                      for i in range(1, len(tk))]) AS b
      |       FROM t WHERE lang = 'en'),
      |bi AS (SELECT b.u AS u, b.v AS v, count(*) AS cb
      |       FROM rb GROUP BY 1, 2),
      |tr AS (SELECT doc_id, unnest([{'u': tk[i], 'v': tk[i+1]}
      |                              for i in range(1, len(tk))]) AS b
      |       FROM t),
      |te AS (SELECT doc_id, b.u AS u, b.v AS v FROM tr),
      |sc AS (SELECT te.doc_id,
      |         CASE WHEN bi.cb IS NOT NULL
      |              THEN ln(CAST(bi.cb AS DOUBLE) / cuu.cu)
      |              ELSE ln(0.4 * (coalesce(cuv.cu, 0) + 1.0)
      |                      / (g.n + g.v)) END AS lp
      |       FROM te LEFT JOIN bi ON te.u = bi.u AND te.v = bi.v
      |       LEFT JOIN uni cuu ON cuu.w = te.u
      |       LEFT JOIN uni cuv ON cuv.w = te.v
      |       CROSS JOIN g),
      |w AS (SELECT doc_id, count(*) AS n_bigrams,
      |        round(avg(lp), 6) AS s FROM sc GROUP BY doc_id),
      |j AS (SELECT w.doc_id, d.lang, n_bigrams, s
      |      FROM w JOIN documents d USING (doc_id)),
      |th AS (SELECT lang, quantile_disc(s, 1.0/3) AS t1,
      |              quantile_disc(s, 2.0/3) AS t2
      |       FROM j GROUP BY lang)
      |SELECT j.doc_id, j.lang, n_bigrams, s AS avg_logprob,
      |  CASE WHEN s <= t1 THEN 'tail'
      |       WHEN s <= t2 THEN 'middle' ELSE 'head' END AS bucket
      |FROM j JOIN th USING (lang) ORDER BY j.doc_id""".stripMargin

  /** DuckDB mirror of p07: sqrt weights (= pow(x, 0.5) on both
    * engines), share normalization, the p06 rate/deficit/hash-cut. */
  private lazy val tempMixtureOracle: String =
    """WITH t AS (SELECT doc_id, lang,
      |    CASE WHEN trim(text)='' THEN []::VARCHAR[]
      |         ELSE string_split_regex(trim(text), '\s+') END AS tk
      |  FROM documents),
      |a AS (SELECT lang, count(*) AS n_docs,
      |        CAST(sum(len(tk)) AS BIGINT) AS avail_tokens
      |      FROM t GROUP BY 1),
      |z AS (SELECT sum(sqrt(CAST(avail_tokens AS DOUBLE))) AS z FROM a),
      |p AS (SELECT lang, n_docs, avail_tokens,
      |        sqrt(CAST(avail_tokens AS DOUBLE)) / z.z AS share
      |      FROM a CROSS JOIN z),
      |p2 AS (SELECT *, share * 100000.0 AS target_tokens FROM p),
      |p3 AS (SELECT *,
      |         least(1.0, target_tokens / avail_tokens) AS rate,
      |         target_tokens > avail_tokens AS deficit FROM p2),
      |s AS (SELECT t.lang, count(*) AS sampled_docs
      |      FROM t JOIN p3 ON t.lang = p3.lang
      |      WHERE (t.doc_id*2654435761)%1000000007
      |              < CAST(floor(rate*1000000007) AS BIGINT)
      |      GROUP BY 1)
      |SELECT p3.lang AS lang, n_docs, avail_tokens,
      |       round(share, 6) AS share,
      |       round(target_tokens, 6) AS target_tokens,
      |       round(rate, 6) AS rate, deficit,
      |       coalesce(s.sampled_docs, 0) AS sampled_docs
      |FROM p3 LEFT JOIN s ON p3.lang = s.lang
      |ORDER BY p3.lang""".stripMargin

  // ======================================================= graph analytics

  /** Part→supplier bipartite "citation" graph off lineitem; supplier
    * ids are offset into their own namespace (part and supplier key
    * spaces overlap numerically). */
  private def psEdges(s: SparkSession, dir: String): DataFrame = {
    val li = graft.cypher.GraphCatalog.cachedParquet(s, s"$dir/lineitem.parquet")
    li.select(col("l_partkey").as("src"),
      (col("l_suppkey") + lit(1000000L)).as("dst")).distinct()
  }

  /** Undirected supplier co-supply graph: suppliers sharing a part at
    * l_quantity >= 49 (the filter keeps the derived pairing sparse),
    * canonical s1 < s2. Base graph for g03–g07. */
  private def coSupplyEdges(s: SparkSession, dir: String): DataFrame = {
    val li = graft.cypher.GraphCatalog.cachedParquet(s, s"$dir/lineitem.parquet")
    val ps = li.where(col("l_quantity") >= 49)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sid"))
      .distinct()
    ps.as("a").join(ps.as("b"), "p")
      .where(col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("s1"), col("b.sid").as("s2"))
  }

  /** DuckDB mirror of g24: Brandes σ/δ unrolled at maxHops = 3 over
    * the co-supply graph from the 3 smallest sources — forward levels
    * l0..l3 (σ = sum of predecessor σ, per-source frontier dedup),
    * then deepest-first δ accumulation b2/b1 and the level-1..2 sum
    * per node (deeper/source levels contribute 0, exactly the Spark
    * accumulator's frames). */
  private lazy val betweennessOracle: String = {
    def lvl(i: Int): String = {
      val seen = (0 until i).map(j =>
        s"""NOT EXISTS (SELECT 1 FROM l$j p$j
           |           WHERE p$j.s = l${i - 1}.s AND p$j.node = a.dst)"""
          .stripMargin).mkString("\n         AND ")
      s"""l$i AS MATERIALIZED (SELECT l${i - 1}.s, a.dst AS node,
         |         sum(l${i - 1}.sigma) AS sigma
         |       FROM l${i - 1} JOIN adj a ON a.src = l${i - 1}.node
         |       WHERE $seen
         |       GROUP BY 1, 2)""".stripMargin
    }
    def contrib(i: Int): String =
      s"""c$i AS MATERIALIZED (SELECT l$i.s, l$i.node, l$i.sigma,
         |         sum(l$i.sigma / b${i + 1}.sigma * (1 + b${i + 1}.delta))
         |           AS delta
         |       FROM l$i JOIN adj a ON a.src = l$i.node
         |       JOIN b${i + 1} ON b${i + 1}.s = l$i.s
         |                     AND b${i + 1}.node = a.dst
         |       GROUP BY 1, 2, 3),
         |b$i AS MATERIALIZED (SELECT l$i.s, l$i.node, l$i.sigma,
         |         coalesce(c$i.delta, 0.0) AS delta
         |       FROM l$i LEFT JOIN c$i ON c$i.s = l$i.s
         |                             AND c$i.node = l$i.node)""".stripMargin
    s"""WITH ps AS (SELECT DISTINCT l_partkey p, l_suppkey s
       |            FROM lineitem WHERE l_quantity >= 49),
       |e AS (SELECT DISTINCT a.s lo, b.s hi
       |      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
       |adj AS MATERIALIZED (SELECT lo AS src, hi AS dst FROM e
       |        UNION ALL SELECT hi, lo FROM e),
       |srcs AS (SELECT DISTINCT src AS node FROM adj
       |         ORDER BY node LIMIT 3),
       |l0 AS MATERIALIZED (SELECT node AS s, node, 1.0 AS sigma FROM srcs),
       |${lvl(1)},
       |${lvl(2)},
       |${lvl(3)},
       |b3 AS MATERIALIZED (SELECT s, node, sigma, 0.0 AS delta FROM l3),
       |${contrib(2)},
       |${contrib(1)},
       |acc AS (SELECT node, delta FROM b2
       |        UNION ALL SELECT node, delta FROM b1),
       |alln AS (SELECT DISTINCT src AS node FROM adj)
       |SELECT alln.node AS node,
       |       round(coalesce(sum(acc.delta), 0.0), 6) AS bc
       |FROM alln LEFT JOIN acc ON acc.node = alln.node
       |GROUP BY 1 ORDER BY alln.node""".stripMargin
  }

  /** DuckDB mirror of g25: the g05 peel round unrolled PAST the
    * measured fixpoint (4 effective peels at sf0.01, k = 17, 998-edge core; 6 unrolled — peeling
    * is monotone, so post-fixpoint rounds are provably no-ops and the
    * unroll equals the exact core). */
  private lazy val kcoreExactOracle: String = {
    val head =
      """WITH ps AS (SELECT DISTINCT l_partkey p, l_suppkey s
        |            FROM lineitem WHERE l_quantity >= 49),
        |e0 AS MATERIALIZED (SELECT DISTINCT a.s lo, b.s hi
        |       FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s)""".stripMargin
    val rounds = (1 to 6).map { i =>
      s"""d$i AS (SELECT node, count(*) d FROM
         |         (SELECT lo node FROM e${i - 1}
         |          UNION ALL SELECT hi FROM e${i - 1})
         |       GROUP BY 1),
         |k$i AS MATERIALIZED (SELECT node FROM d$i WHERE d >= 17),
         |e$i AS MATERIALIZED (SELECT lo, hi FROM e${i - 1}
         |       WHERE lo IN (SELECT node FROM k$i)
         |         AND hi IN (SELECT node FROM k$i))""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      "\nSELECT node, count(*) AS deg FROM" +
      "\n  (SELECT lo node FROM e6 UNION ALL SELECT hi FROM e6)" +
      "\nGROUP BY 1 ORDER BY node"
  }

  private val graphSpecs: Seq[Spec] = Seq(
    // --- sampled-source Brandes betweenness (round 8): forward σ
    //     waves + deepest-first δ accumulation from the 3 smallest
    //     nodes, maxHops 3; the oracle unrolls the exact σ/δ recursion
    //     level by level. δ sums are order-sensitive doubles — rounded
    //     to 6 on both sides (the g06 convention).
    ("g24_betweenness",
      (s, dir) => {
        val e = coSupplyEdges(s, dir)
        val sym = e.select(col("s1").as("src"), col("s2").as("dst"))
          .union(e.select(col("s2").as("src"), col("s1").as("dst")))
        val srcs = sym.select(col("src").as("node")).distinct()
          .orderBy("node").limit(3)
        GraphOps.betweennessSampled(e, "s1", "s2", srcs, maxHops = 3)
          .select(col("node"), round(col("bc"), 6).as("bc"))
          .orderBy("node")
      },
      Some(betweennessOracle)),

    // --- EXACT k-core (round 8): peel to the monotone fixpoint
    //     (k = 17 peels 4 effective rounds at sf0.01 to a nonempty
    //     998-edge core — a genuine iterate-to-convergence run, unlike
    //     g05's fixed 3 peels at k = 3)
    ("g25_kcore_exact",
      (s, dir) => GraphOps.kCoreExact(coSupplyEdges(s, dir), "s1", "s2",
          k = 17)
        .orderBy("node"),
      Some(kcoreExactOracle)),

    // --- weighted single-source shortest paths (round 11):
    //     distributed frontier relaxation (Bellman-Ford's shape) over
    //     the JUMPS_TO diamond DAG with jump-span-derived weights
    //     (+1 hop costs 3, +2 costs 5) — the cheapest route mixes hop
    //     counts, which a hop-count shortestPath cannot observe; the
    //     oracle min-aggregates a recursive walk's path costs (integer
    //     weights → exact double sums in both engines)
    ("g26_weighted_sssp",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val n = graft.cypher.GraphCatalog.cachedParquet(s,
          s"$dir/nation.parquet")
        val w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
        val e = n.select(col("n_nationkey").as("src"),
            lead("n_nationkey", 1).over(w).as("dst"), lit(3.0).as("wt"))
          .unionByName(n.select(col("n_nationkey").as("src"),
            lead("n_nationkey", 2).over(w).as("dst"), lit(5.0).as("wt")))
          .where(col("dst").isNotNull)
        GraphOps.weightedSssp(e, "src", "dst", "wt",
            n.where(col("n_nationkey") === 0).select("n_nationkey"))
          .orderBy("node")
      },
      Some("""WITH RECURSIVE s AS (
             |  SELECT n_nationkey, n_regionkey, row_number() OVER (
             |    PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn
             |  FROM nation),
             |e AS (
             |  SELECT a.n_nationkey AS src, b.n_nationkey AS dst,
             |         CASE WHEN b.rn - a.rn = 1 THEN 3 ELSE 5 END AS w
             |  FROM s a JOIN s b ON a.n_regionkey = b.n_regionkey
             |    AND b.rn - a.rn IN (1, 2)),
             |walk(dst, d) AS (
             |  SELECT n_nationkey, 0 FROM nation WHERE n_nationkey = 0
             |  UNION ALL
             |  SELECT e.dst, w.d + e.w FROM walk w
             |  JOIN e ON e.src = w.dst)
             |SELECT dst AS node, CAST(min(d) AS DOUBLE) AS dist
             |FROM walk GROUP BY 1 ORDER BY node""".stripMargin)),

    // --- weighted shortest-path TREE (round 11): g26 plus each
    //     settled node's predecessor on its cheapest route (sources
    //     null); equal-cost ties break on the smallest pred string —
    //     deterministic, so the oracle mirrors the tree exactly by
    //     min-ing preds over the min-cost walks
    ("g27_sssp_tree",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val n = graft.cypher.GraphCatalog.cachedParquet(s,
          s"$dir/nation.parquet")
        val w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
        val e = n.select(col("n_nationkey").as("src"),
            lead("n_nationkey", 1).over(w).as("dst"), lit(3.0).as("wt"))
          .unionByName(n.select(col("n_nationkey").as("src"),
            lead("n_nationkey", 2).over(w).as("dst"), lit(5.0).as("wt")))
          .where(col("dst").isNotNull)
        GraphOps.weightedSsspTree(e, "src", "dst", "wt",
            n.where(col("n_nationkey") === 0).select("n_nationkey"))
          .orderBy("node")
      },
      Some("""WITH RECURSIVE s AS (
             |  SELECT n_nationkey, n_regionkey, row_number() OVER (
             |    PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn
             |  FROM nation),
             |e AS (
             |  SELECT a.n_nationkey AS src, b.n_nationkey AS dst,
             |         CASE WHEN b.rn - a.rn = 1 THEN 3 ELSE 5 END AS w
             |  FROM s a JOIN s b ON a.n_regionkey = b.n_regionkey
             |    AND b.rn - a.rn IN (1, 2)),
             |walk(dst, d, pred) AS (
             |  SELECT n_nationkey, 0, CAST(NULL AS BIGINT)
             |  FROM nation WHERE n_nationkey = 0
             |  UNION ALL
             |  SELECT e.dst, w.d + e.w, CAST(e.src AS BIGINT)
             |  FROM walk w JOIN e ON e.src = w.dst),
             |m AS (SELECT dst, min(d) AS md FROM walk GROUP BY 1)
             |SELECT w.dst AS node, CAST(w.d AS DOUBLE) AS dist,
             |       min(w.pred) AS pred
             |FROM walk w JOIN m ON m.dst = w.dst AND w.d = m.md
             |GROUP BY 1, 2 ORDER BY node""".stripMargin)),

    // --- route expansion over the g27 tree (round 11): one row per
    //     hop of every node's cheapest route, source at pos 0 — the
    //     oracle rebuilds the tree then follows pred links recursively
    ("g28_sssp_routes",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val n = graft.cypher.GraphCatalog.cachedParquet(s,
          s"$dir/nation.parquet")
        val w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
        val e = n.select(col("n_nationkey").as("src"),
            lead("n_nationkey", 1).over(w).as("dst"), lit(3.0).as("wt"))
          .unionByName(n.select(col("n_nationkey").as("src"),
            lead("n_nationkey", 2).over(w).as("dst"), lit(5.0).as("wt")))
          .where(col("dst").isNotNull)
        val tree = GraphOps.weightedSsspTree(e, "src", "dst", "wt",
          n.where(col("n_nationkey") === 0).select("n_nationkey"))
        GraphOps.ssspRoutes(tree).orderBy("node", "pos")
      },
      Some("""WITH RECURSIVE s AS (
             |  SELECT n_nationkey, n_regionkey, row_number() OVER (
             |    PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn
             |  FROM nation),
             |e AS (
             |  SELECT a.n_nationkey AS src, b.n_nationkey AS dst,
             |         CASE WHEN b.rn - a.rn = 1 THEN 3 ELSE 5 END AS w
             |  FROM s a JOIN s b ON a.n_regionkey = b.n_regionkey
             |    AND b.rn - a.rn IN (1, 2)),
             |walk(dst, d, pred) AS (
             |  SELECT n_nationkey, 0, CAST(NULL AS BIGINT)
             |  FROM nation WHERE n_nationkey = 0
             |  UNION ALL
             |  SELECT e.dst, w.d + e.w, CAST(e.src AS BIGINT)
             |  FROM walk w JOIN e ON e.src = w.dst),
             |m AS (SELECT dst, min(d) AS md FROM walk GROUP BY 1),
             |tree AS (
             |  SELECT w.dst AS node, min(w.pred) AS pred
             |  FROM walk w JOIN m ON m.dst = w.dst AND w.d = m.md
             |  GROUP BY 1),
             |r(target, hop, back) AS (
             |  SELECT CAST(node AS VARCHAR), CAST(node AS VARCHAR), 0
             |  FROM tree
             |  UNION ALL
             |  SELECT r.target, CAST(t.pred AS VARCHAR), r.back + 1
             |  FROM r JOIN tree t ON CAST(t.node AS VARCHAR) = r.hop
             |  WHERE t.pred IS NOT NULL),
             |l AS (SELECT target, max(back) AS len FROM r GROUP BY 1)
             |SELECT r.target AS node, l.len - r.back AS pos, r.hop AS hop
             |FROM r JOIN l ON l.target = r.target
             |ORDER BY node, pos""".stripMargin)),
    // PageRank, 3 fixed iterations — the oracle unrolls the same three
    // rounds as chained CTEs; ranks rounded to 6 on both sides (sum
    // order differs between engines)
    ("g01_pagerank",
      (s, dir) => GraphOps.pageRank(psEdges(s, dir), "src", "dst",
          iterations = 3, damping = 0.85)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy("node"),
      Some("""WITH e AS (SELECT DISTINCT l_partkey AS src,
             |                  l_suppkey + 1000000 AS dst FROM lineitem),
             |nodes AS (SELECT DISTINCT node FROM
             |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
             |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
             |deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d
             |        FROM e GROUP BY 1),
             |pr0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS rank FROM nodes),
             |c1 AS (SELECT e.dst AS node, sum(p.rank/d.d) AS s FROM e
             |       JOIN pr0 p ON p.node = e.src JOIN deg d ON d.src = e.src
             |       GROUP BY 1),
             |pr1 AS (SELECT n.node,
             |          0.15/(SELECT n FROM nn) + 0.85*coalesce(c.s, 0) AS rank
             |        FROM nodes n LEFT JOIN c1 c ON n.node = c.node),
             |c2 AS (SELECT e.dst AS node, sum(p.rank/d.d) AS s FROM e
             |       JOIN pr1 p ON p.node = e.src JOIN deg d ON d.src = e.src
             |       GROUP BY 1),
             |pr2 AS (SELECT n.node,
             |          0.15/(SELECT n FROM nn) + 0.85*coalesce(c.s, 0) AS rank
             |        FROM nodes n LEFT JOIN c2 c ON n.node = c.node),
             |c3 AS (SELECT e.dst AS node, sum(p.rank/d.d) AS s FROM e
             |       JOIN pr2 p ON p.node = e.src JOIN deg d ON d.src = e.src
             |       GROUP BY 1),
             |pr3 AS (SELECT n.node,
             |          0.15/(SELECT n FROM nn) + 0.85*coalesce(c.s, 0) AS rank
             |        FROM nodes n LEFT JOIN c3 c ON n.node = c.node)
             |SELECT node, round(rank, 6) AS rank FROM pr3
             |ORDER BY node""".stripMargin)),

    // personalized PageRank, 3 fixed iterations, teleport set =
    // nodes ≡ 0 (mod 97) — the oracle unrolls the same rounds with the
    // teleport flag as a CASE column
    ("g08_personalized_pr",
      (s, dir) => {
        val e = psEdges(s, dir)
        val srcs = e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node"))).distinct()
          .where(col("node") % 97 === 0)
        GraphOps.personalizedPageRank(e, "src", "dst", srcs,
            iterations = 3, damping = 0.85)
          .select(col("node"), round(col("rank"), 6).as("rank"))
          .orderBy("node")
      },
      Some("""WITH e AS (SELECT DISTINCT l_partkey AS src,
             |                  l_suppkey + 1000000 AS dst FROM lineitem),
             |nodes AS (SELECT DISTINCT node, CASE WHEN node % 97 = 0
             |                 THEN 1.0 ELSE 0.0 END AS tele FROM
             |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
             |nn AS (SELECT sum(tele) AS n FROM nodes),
             |deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d
             |        FROM e GROUP BY 1),
             |pr0 AS (SELECT node, tele/(SELECT n FROM nn) AS rank FROM nodes),
             |c1 AS (SELECT e.dst AS node, sum(p.rank/d.d) AS s FROM e
             |       JOIN pr0 p ON p.node = e.src JOIN deg d ON d.src = e.src
             |       GROUP BY 1),
             |pr1 AS (SELECT n.node,
             |          0.15*n.tele/(SELECT n FROM nn)
             |            + 0.85*coalesce(c.s, 0) AS rank
             |        FROM nodes n LEFT JOIN c1 c ON n.node = c.node),
             |c2 AS (SELECT e.dst AS node, sum(p.rank/d.d) AS s FROM e
             |       JOIN pr1 p ON p.node = e.src JOIN deg d ON d.src = e.src
             |       GROUP BY 1),
             |pr2 AS (SELECT n.node,
             |          0.15*n.tele/(SELECT n FROM nn)
             |            + 0.85*coalesce(c.s, 0) AS rank
             |        FROM nodes n LEFT JOIN c2 c ON n.node = c.node),
             |c3 AS (SELECT e.dst AS node, sum(p.rank/d.d) AS s FROM e
             |       JOIN pr2 p ON p.node = e.src JOIN deg d ON d.src = e.src
             |       GROUP BY 1),
             |pr3 AS (SELECT n.node,
             |          0.15*n.tele/(SELECT n FROM nn)
             |            + 0.85*coalesce(c.s, 0) AS rank
             |        FROM nodes n LEFT JOIN c3 c ON n.node = c.node)
             |SELECT node, round(rank, 6) AS rank FROM pr3
             |ORDER BY node""".stripMargin)),

    // out/in degrees with zero-fill (bipartite: parts have in_deg 0,
    // suppliers out_deg 0)
    ("g02_degrees",
      (s, dir) => GraphOps.degrees(psEdges(s, dir), "src", "dst")
        .orderBy("node"),
      Some("""WITH e AS (SELECT DISTINCT l_partkey AS src,
             |                  l_suppkey + 1000000 AS dst FROM lineitem),
             |o AS (SELECT src AS node, count(*) AS out_deg FROM e GROUP BY 1),
             |i AS (SELECT dst AS node, count(*) AS in_deg FROM e GROUP BY 1)
             |SELECT coalesce(o.node, i.node) AS node,
             |       coalesce(out_deg, 0) AS out_deg,
             |       coalesce(in_deg, 0) AS in_deg
             |FROM o FULL OUTER JOIN i ON o.node = i.node
             |ORDER BY node""".stripMargin)),

    // exact triangle count over the high-quantity co-supply graph
    // (suppliers sharing a part at l_quantity >= 49 — the filter keeps
    // the derived pairing sparse; the count itself is the oriented
    // two-path semi-join closure)
    ("g03_triangles",
      (s, dir) => GraphOps.triangleCount(coSupplyEdges(s, dir), "s1", "s2"),
      Some("""WITH ps AS (SELECT DISTINCT l_partkey p, l_suppkey s
             |            FROM lineitem WHERE l_quantity >= 49),
             |e AS (SELECT DISTINCT a.s s1, b.s s2
             |      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s)
             |SELECT count(*) AS n_triangles
             |FROM e ab JOIN e bc ON ab.s2 = bc.s1
             |JOIN e ac ON ac.s1 = ab.s1 AND ac.s2 = bc.s2""".stripMargin)),

    // deterministic synchronous label propagation (2 rounds) over the
    // co-supply graph — the oracle unrolls both rounds with the same
    // (count desc, label asc) argmax via row_number
    ("g04_label_prop",
      (s, dir) => GraphOps.labelPropagation(coSupplyEdges(s, dir),
          "s1", "s2", rounds = 2)
        .orderBy("node"),
      Some("""WITH ps AS (SELECT DISTINCT l_partkey p, l_suppkey s
             |            FROM lineitem WHERE l_quantity >= 49),
             |e AS (SELECT DISTINCT a.s lo, b.s hi
             |      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
             |adj AS (SELECT lo AS node, hi AS nbr FROM e
             |        UNION ALL SELECT hi, lo FROM e),
             |l0 AS (SELECT DISTINCT node, node AS label FROM adj),
             |c1 AS (SELECT a.node, l.label, count(*) c FROM adj a
             |       JOIN l0 l ON l.node = a.nbr GROUP BY 1, 2),
             |r1 AS (SELECT node, label, row_number() OVER
             |         (PARTITION BY node ORDER BY c DESC, label ASC) rk
             |       FROM c1),
             |l1 AS (SELECT node, label FROM r1 WHERE rk = 1),
             |c2 AS (SELECT a.node, l.label, count(*) c FROM adj a
             |       JOIN l1 l ON l.node = a.nbr GROUP BY 1, 2),
             |r2 AS (SELECT node, label, row_number() OVER
             |         (PARTITION BY node ORDER BY c DESC, label ASC) rk
             |       FROM c2)
             |SELECT node, label FROM r2 WHERE rk = 1
             |ORDER BY node""".stripMargin)),

    // 3-core of the co-supply graph after 3 synchronous peels — the
    // oracle unrolls the identical peel rounds
    ("g05_kcore",
      (s, dir) => GraphOps.kCore(coSupplyEdges(s, dir), "s1", "s2",
          k = 3, peels = 3)
        .orderBy("node"),
      Some("""WITH ps AS (SELECT DISTINCT l_partkey p, l_suppkey s
             |            FROM lineitem WHERE l_quantity >= 49),
             |e0 AS (SELECT DISTINCT a.s lo, b.s hi
             |       FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
             |d1 AS (SELECT node, count(*) d FROM
             |         (SELECT lo node FROM e0 UNION ALL SELECT hi FROM e0)
             |       GROUP BY 1),
             |k1 AS (SELECT node FROM d1 WHERE d >= 3),
             |e1 AS (SELECT lo, hi FROM e0
             |       WHERE lo IN (SELECT node FROM k1)
             |         AND hi IN (SELECT node FROM k1)),
             |d2 AS (SELECT node, count(*) d FROM
             |         (SELECT lo node FROM e1 UNION ALL SELECT hi FROM e1)
             |       GROUP BY 1),
             |k2 AS (SELECT node FROM d2 WHERE d >= 3),
             |e2 AS (SELECT lo, hi FROM e1
             |       WHERE lo IN (SELECT node FROM k2)
             |         AND hi IN (SELECT node FROM k2)),
             |d3 AS (SELECT node, count(*) d FROM
             |         (SELECT lo node FROM e2 UNION ALL SELECT hi FROM e2)
             |       GROUP BY 1),
             |k3 AS (SELECT node FROM d3 WHERE d >= 3),
             |e3 AS (SELECT lo, hi FROM e2
             |       WHERE lo IN (SELECT node FROM k3)
             |         AND hi IN (SELECT node FROM k3))
             |SELECT node, count(*) AS deg FROM
             |  (SELECT lo node FROM e3 UNION ALL SELECT hi FROM e3)
             |GROUP BY 1 ORDER BY node""".stripMargin)),

    // common-neighbor link prediction (Jaccard + Adamic–Adar) with the
    // degree-50 middle cap applied identically on both sides; scores
    // rounded to 6 (sum order differs between engines)
    ("g06_link_predict",
      (s, dir) => GraphOps.commonNeighborScores(coSupplyEdges(s, dir),
          "s1", "s2", maxDegree = Some(50))
        .select(col("u"), col("v"), col("cn"),
          round(col("jaccard"), 6).as("jaccard"),
          round(col("adamic_adar"), 6).as("adamic_adar"))
        .orderBy("u", "v"),
      Some("""WITH ps AS (SELECT DISTINCT l_partkey p, l_suppkey s
             |            FROM lineitem WHERE l_quantity >= 49),
             |e AS (SELECT DISTINCT a.s lo, b.s hi
             |      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
             |adj AS (SELECT lo AS node, hi AS nbr FROM e
             |        UNION ALL SELECT hi, lo FROM e),
             |deg AS (SELECT node, count(*) deg FROM adj GROUP BY 1),
             |wd AS (SELECT m.node w, m.nbr u, ln(d.deg) lnd
             |       FROM adj m JOIN deg d ON d.node = m.node
             |       WHERE d.deg <= 50),
             |pairs AS (SELECT x.u u, y.u v, count(*) cn,
             |                 sum(1.0 / x.lnd) aa
             |          FROM wd x JOIN wd y ON x.w = y.w AND x.u < y.u
             |          GROUP BY 1, 2)
             |SELECT p.u, p.v, p.cn,
             |       round(CAST(p.cn AS DOUBLE) /
             |             (du.deg + dv.deg - p.cn), 6) AS jaccard,
             |       round(p.aa, 6) AS adamic_adar
             |FROM pairs p JOIN deg du ON du.node = p.u
             |JOIN deg dv ON dv.node = p.v
             |ORDER BY p.u, p.v""".stripMargin)),

    // multi-source BFS hop distances (≤3) from the 3 smallest nodes of
    // the co-supply graph, both directions; the oracle is DuckDB's
    // recursive CTE with per-level dedup (UNION) and a min(dist) final
    ("g07_bfs_hops",
      (s, dir) => {
        val e = coSupplyEdges(s, dir)
        val sym = e.select(col("s1").as("src"), col("s2").as("dst"))
          .union(e.select(col("s2").as("src"), col("s1").as("dst")))
        val srcs = sym.select(col("src").as("node")).distinct()
          .orderBy("node").limit(3)
        GraphOps.bfsDistances(sym, "src", "dst", srcs, maxHops = 3)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE
             |ps AS (SELECT DISTINCT l_partkey p, l_suppkey s
             |       FROM lineitem WHERE l_quantity >= 49),
             |e AS (SELECT DISTINCT a.s lo, b.s hi
             |      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
             |adj AS (SELECT lo AS src, hi AS dst FROM e
             |        UNION ALL SELECT hi, lo FROM e),
             |srcs AS (SELECT DISTINCT src AS node FROM adj
             |         ORDER BY node LIMIT 3),
             |walk(node, dist) AS (
             |  SELECT node, 0 FROM srcs
             |  UNION
             |  SELECT a.dst, w.dist + 1 FROM walk w
             |  JOIN adj a ON a.src = w.node WHERE w.dist < 3)
             |SELECT node, CAST(min(dist) AS BIGINT) AS dist
             |FROM walk GROUP BY 1 ORDER BY node""".stripMargin)),

    // local clustering coefficient over the co-supply graph: per-node
    // triangle incidence (in-row 3-corner explode of the oriented
    // enumeration) over deg-choose-2
    ("g09_clustering_coeff",
      (s, dir) => GraphOps.clusteringCoefficient(coSupplyEdges(s, dir),
          "s1", "s2")
        .orderBy("node"),
      Some("""WITH ps AS (SELECT DISTINCT l_partkey p, l_suppkey s
             |            FROM lineitem WHERE l_quantity >= 49),
             |e AS (SELECT DISTINCT a.s lo, b.s hi
             |      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
             |adj AS (SELECT lo AS node, hi AS nbr FROM e
             |        UNION ALL SELECT hi, lo FROM e),
             |deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY 1),
             |tri AS (SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
             |        FROM e ab JOIN e bc ON ab.hi = bc.lo
             |        JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi),
             |pn AS (SELECT node, count(*) AS n_tri FROM (
             |         SELECT a AS node FROM tri
             |         UNION ALL SELECT b FROM tri
             |         UNION ALL SELECT c FROM tri)
             |       GROUP BY 1)
             |SELECT d.node, d.deg,
             |       coalesce(pn.n_tri, 0) AS n_tri,
             |       round(CASE WHEN d.deg < 2 THEN 0.0
             |             ELSE 2.0 * coalesce(pn.n_tri, 0)
             |                  / (d.deg * (d.deg - 1)) END, 6) AS coeff
             |FROM deg d LEFT JOIN pn ON pn.node = d.node
             |ORDER BY d.node""".stripMargin)),

    // 4-truss surviving edges after 2 peels of the co-supply graph
    // (edge-level cohesion; oracle = 2 unrolled support/filter rounds)
    ("g12_ktruss",
      (s, dir) => GraphOps.kTruss(coSupplyEdges(s, dir), "s1", "s2",
          k = 4, rounds = 2)
        .orderBy("lo", "hi"),
      Some("""WITH ps AS (SELECT DISTINCT l_partkey p, l_suppkey s
             |            FROM lineitem WHERE l_quantity >= 49),
             |e0 AS (SELECT DISTINCT a.s lo, b.s hi
             |       FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
             |t1 AS (SELECT ab.lo a, ab.hi b, bc.hi c
             |       FROM e0 ab JOIN e0 bc ON ab.hi = bc.lo
             |       JOIN e0 ac ON ac.lo = ab.lo AND ac.hi = bc.hi),
             |s1 AS (SELECT lo, hi, count(*) sup FROM (
             |         SELECT a lo, b hi FROM t1
             |         UNION ALL SELECT b, c FROM t1
             |         UNION ALL SELECT a, c FROM t1)
             |       GROUP BY 1, 2),
             |e1 AS (SELECT e0.lo, e0.hi FROM e0
             |       JOIN s1 ON s1.lo = e0.lo AND s1.hi = e0.hi
             |       WHERE s1.sup >= 2),
             |t2 AS (SELECT ab.lo a, ab.hi b, bc.hi c
             |       FROM e1 ab JOIN e1 bc ON ab.hi = bc.lo
             |       JOIN e1 ac ON ac.lo = ab.lo AND ac.hi = bc.hi),
             |s2 AS (SELECT lo, hi, count(*) sup FROM (
             |         SELECT a lo, b hi FROM t2
             |         UNION ALL SELECT b, c FROM t2
             |         UNION ALL SELECT a, c FROM t2)
             |       GROUP BY 1, 2)
             |SELECT e1.lo, e1.hi FROM e1
             |JOIN s2 ON s2.lo = e1.lo AND s2.hi = e1.hi
             |WHERE s2.sup >= 2
             |ORDER BY e1.lo, e1.hi""".stripMargin)),

    // degree assortativity of the co-supply graph (hub-mixing sign —
    // the second half of the graph health check)
    ("g16_assortativity",
      (s, dir) => GraphOps.degreeAssortativity(coSupplyEdges(s, dir),
          "s1", "s2"),
      Some("""WITH ps AS (SELECT DISTINCT l_partkey p, l_suppkey s
             |            FROM lineitem WHERE l_quantity >= 49),
             |e AS (SELECT DISTINCT a.s lo, b.s hi
             |      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
             |adj AS (SELECT lo AS node, hi AS nbr FROM e
             |        UNION ALL SELECT hi, lo FROM e),
             |deg AS (SELECT node, count(*) AS d FROM adj GROUP BY 1),
             |pr AS (SELECT CAST(dx.d AS DOUBLE) AS x,
             |              CAST(dy.d AS DOUBLE) AS y
             |       FROM adj JOIN deg dx ON dx.node = adj.node
             |       JOIN deg dy ON dy.node = adj.nbr),
             |g AS (SELECT count(*) AS n_pairs, sum(x) AS sx, sum(y) AS sy,
             |        sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
             |      FROM pr)
             |SELECT n_pairs,
             |  round((n_pairs*sxy - sx*sy)
             |        / sqrt((n_pairs*sxx - sx*sx) * (n_pairs*syy - sy*sy)),
             |        6) AS assortativity
             |FROM g""".stripMargin)),

    // degree distribution + power-law fit of the co-supply graph (the
    // hub health check run before quadratic operators)
    ("g15_degree_dist",
      (s, dir) => GraphOps.degreeDistribution(coSupplyEdges(s, dir),
          "s1", "s2"),
      Some("""WITH ps AS (SELECT DISTINCT l_partkey p, l_suppkey s
             |            FROM lineitem WHERE l_quantity >= 49),
             |e AS (SELECT DISTINCT a.s lo, b.s hi
             |      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
             |adj AS (SELECT lo AS node, hi AS nbr FROM e
             |        UNION ALL SELECT hi, lo FROM e),
             |deg AS (SELECT node, count(*) AS d FROM adj GROUP BY 1),
             |h AS (SELECT d, count(*) AS c FROM deg GROUP BY 1),
             |p AS (SELECT ln(CAST(d AS DOUBLE)) AS x,
             |             ln(CAST(c AS DOUBLE)) AS y, d, c FROM h),
             |g AS (SELECT CAST(sum(c) AS BIGINT) AS n_nodes,
             |        count(*) AS n_degrees, CAST(max(d) AS BIGINT) AS max_degree,
             |        sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
             |        sum(x*x) AS sxx
             |      FROM p)
             |SELECT n_nodes, n_degrees, max_degree,
             |  round((n_degrees*sxy - sx*sy) / (n_degrees*sxx - sx*sx), 6)
             |    AS slope,
             |  round((sy - ((n_degrees*sxy - sx*sy)
             |               / (n_degrees*sxx - sx*sx)) * sx)
             |        / n_degrees, 6) AS intercept
             |FROM g""".stripMargin)),

    // weighted PageRank over the symmetrized co-supply projection:
    // contributions distribute by co-occurrence weight (3 rounds)
    ("g13_weighted_pr",
      (s, dir) => {
        val li = graft.cypher.GraphCatalog.cachedParquet(s,
          s"$dir/lineitem.parquet")
        val proj = GraphOps.bipartiteProject(
          li.where(col("l_quantity") >= 48)
            .select(col("l_partkey").as("p"), col("l_suppkey").as("sid")),
          "p", "sid", maxPivotDegree = Some(8), minWeight = 2)
        val sym = proj.select(col("u").as("src"), col("v").as("dst"),
            col("weight"))
          .unionAll(proj.select(col("v").as("src"), col("u").as("dst"),
            col("weight")))
        GraphOps.pageRankWeighted(sym, "src", "dst", "weight",
            iterations = 3, damping = 0.85)
          .select(col("node"), round(col("rank"), 6).as("rank"))
          .orderBy("node")
      },
      Some("""WITH pr0_ AS (SELECT DISTINCT l_partkey p, l_suppkey s
             |              FROM lineitem WHERE l_quantity >= 48),
             |pd AS (SELECT p, count(*) d FROM pr0_ GROUP BY 1),
             |k AS (SELECT pr0_.p, pr0_.s FROM pr0_
             |      JOIN pd ON pd.p = pr0_.p AND pd.d <= 8),
             |pj AS (SELECT a.s u, b.s v, CAST(count(*) AS DOUBLE) w
             |       FROM k a JOIN k b ON a.p = b.p AND a.s < b.s
             |       GROUP BY 1, 2 HAVING count(*) >= 2),
             |e AS (SELECT u AS src, v AS dst, w FROM pj
             |      UNION ALL SELECT v, u, w FROM pj),
             |nodes AS (SELECT DISTINCT node FROM
             |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
             |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
             |ow AS (SELECT src, sum(w) AS ow FROM e GROUP BY 1),
             |pr0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS rank FROM nodes),
             |c1 AS (SELECT e.dst AS node, sum(p.rank*e.w/o.ow) AS s FROM e
             |       JOIN pr0 p ON p.node = e.src JOIN ow o ON o.src = e.src
             |       GROUP BY 1),
             |pr1 AS (SELECT n.node,
             |          0.15/(SELECT n FROM nn) + 0.85*coalesce(c.s, 0) AS rank
             |        FROM nodes n LEFT JOIN c1 c ON n.node = c.node),
             |c2 AS (SELECT e.dst AS node, sum(p.rank*e.w/o.ow) AS s FROM e
             |       JOIN pr1 p ON p.node = e.src JOIN ow o ON o.src = e.src
             |       GROUP BY 1),
             |pr2 AS (SELECT n.node,
             |          0.15/(SELECT n FROM nn) + 0.85*coalesce(c.s, 0) AS rank
             |        FROM nodes n LEFT JOIN c2 c ON n.node = c.node),
             |c3 AS (SELECT e.dst AS node, sum(p.rank*e.w/o.ow) AS s FROM e
             |       JOIN pr2 p ON p.node = e.src JOIN ow o ON o.src = e.src
             |       GROUP BY 1),
             |pr3 AS (SELECT n.node,
             |          0.15/(SELECT n FROM nn) + 0.85*coalesce(c.s, 0) AS rank
             |        FROM nodes n LEFT JOIN c3 c ON n.node = c.node)
             |SELECT node, round(rank, 6) AS rank FROM pr3
             |ORDER BY node""".stripMargin)),

    // harmonic centrality of the 3 smallest co-supply nodes (sampled-
    // sources form; per-source BFS waves ≤ 3 hops)
    ("g14_harmonic",
      (s, dir) => {
        val e = coSupplyEdges(s, dir)
        val srcs = e.select(col("s1").as("node"))
          .union(e.select(col("s2").as("node"))).distinct()
          .orderBy("node").limit(3)
        GraphOps.harmonicCentrality(e, "s1", "s2", srcs, maxHops = 3)
          .orderBy("src")
      },
      Some("""WITH RECURSIVE
             |ps AS (SELECT DISTINCT l_partkey p, l_suppkey s
             |       FROM lineitem WHERE l_quantity >= 49),
             |e AS (SELECT DISTINCT a.s lo, b.s hi
             |      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
             |adj AS (SELECT lo AS src, hi AS dst FROM e
             |        UNION ALL SELECT hi, lo FROM e),
             |srcs AS (SELECT DISTINCT src AS node FROM adj
             |         ORDER BY node LIMIT 3),
             |walk(s0, node, dist) AS (
             |  SELECT node, node, 0 FROM srcs
             |  UNION
             |  SELECT w.s0, a.dst, w.dist + 1 FROM walk w
             |  JOIN adj a ON a.src = w.node WHERE w.dist < 3),
             |d AS (SELECT s0, node, min(dist) AS dist FROM walk
             |      GROUP BY 1, 2)
             |SELECT s0 AS src, count(*) AS n_reached,
             |       round(sum(1.0 / dist), 6) AS harmonic
             |FROM d WHERE dist > 0 GROUP BY 1 ORDER BY src""".stripMargin)),

    // weighted bipartite projection part→supplier with the hub valve
    // and a weight floor (the formalized co-X graph constructor)
    ("g10_bipartite_project",
      (s, dir) => {
        val li = graft.cypher.GraphCatalog.cachedParquet(s,
          s"$dir/lineitem.parquet")
        GraphOps.bipartiteProject(
            li.where(col("l_quantity") >= 48)
              .select(col("l_partkey").as("p"), col("l_suppkey").as("sid")),
            "p", "sid", maxPivotDegree = Some(8), minWeight = 2)
          .orderBy("u", "v")
      },
      Some("""WITH pr AS (SELECT DISTINCT l_partkey p, l_suppkey s
             |            FROM lineitem WHERE l_quantity >= 48),
             |pd AS (SELECT p, count(*) d FROM pr GROUP BY 1),
             |k AS (SELECT pr.p, pr.s FROM pr
             |      JOIN pd ON pd.p = pr.p AND pd.d <= 8)
             |SELECT a.s AS u, b.s AS v, count(*) AS weight
             |FROM k a JOIN k b ON a.p = b.p AND a.s < b.s
             |GROUP BY 1, 2 HAVING count(*) >= 2
             |ORDER BY u, v""".stripMargin)),

    // Newman modularity of the 2-round label-prop communities over the
    // co-supply graph (the quality gate after community detection)
    ("g11_modularity",
      (s, dir) => {
        val e = coSupplyEdges(s, dir)
        val comm = GraphOps.labelPropagation(e, "s1", "s2", rounds = 2)
        GraphOps.modularity(e, "s1", "s2", comm)
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey p, l_suppkey s
             |            FROM lineitem WHERE l_quantity >= 49),
             |e AS (SELECT DISTINCT a.s lo, b.s hi
             |      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
             |adj AS (SELECT lo AS node, hi AS nbr FROM e
             |        UNION ALL SELECT hi, lo FROM e),
             |l0 AS (SELECT DISTINCT node, node AS label FROM adj),
             |c1 AS (SELECT a.node, l.label, count(*) c FROM adj a
             |       JOIN l0 l ON l.node = a.nbr GROUP BY 1, 2),
             |r1 AS (SELECT node, label, row_number() OVER
             |         (PARTITION BY node ORDER BY c DESC, label ASC) rk
             |       FROM c1),
             |l1 AS (SELECT node, label FROM r1 WHERE rk = 1),
             |c2 AS (SELECT a.node, l.label, count(*) c FROM adj a
             |       JOIN l1 l ON l.node = a.nbr GROUP BY 1, 2),
             |r2 AS (SELECT node, label, row_number() OVER
             |         (PARTITION BY node ORDER BY c DESC, label ASC) rk
             |       FROM c2),
             |l2 AS (SELECT node, label FROM r2 WHERE rk = 1),
             |deg AS (SELECT node, count(*) d FROM adj GROUP BY 1),
             |m AS (SELECT CAST(count(*) AS DOUBLE) m FROM e),
             |intra AS (SELECT la.label, count(*) li
             |          FROM e JOIN l2 la ON la.node = e.lo
             |          JOIN l2 lb ON lb.node = e.hi AND la.label = lb.label
             |          GROUP BY 1),
             |dc AS (SELECT l2.label, sum(d.d) dc
             |       FROM l2 JOIN deg d ON d.node = l2.node GROUP BY 1)
             |SELECT round(sum(coalesce(intra.li, 0) / m.m
             |         - pow(dc.dc / (2.0 * m.m), 2)), 6) AS modularity,
             |       count(*) AS n_communities,
             |       CAST(max(m.m) AS BIGINT) AS m_edges
             |FROM dc LEFT JOIN intra ON intra.label = dc.label
             |CROSS JOIN m""".stripMargin)),

    // HITS hubs/authorities, 2 fixed L1-normalized iterations on the
    // part→supplier bipartite graph (authority mass on suppliers, hub
    // mass on parts — the expected bipartite split); oracle unrolls
    // both half-steps per round
    ("g17_hits",
      (s, dir) => GraphOps.hits(psEdges(s, dir), "src", "dst",
          iterations = 2)
        .select(col("node"), round(col("auth"), 6).as("auth"),
          round(col("hub"), 6).as("hub"))
        .orderBy("node"),
      Some(hitsOracle)))

  /** DuckDB mirror of g17: two unrolled HITS rounds, each an in-edge
    * sum (auth) and an out-edge sum (hub) with L1 totals. */
  private lazy val hitsOracle: String = {
    def round(k: Int): String =
      s"""ar$k AS (SELECT e.dst AS node, sum(h.hub) AS a FROM e
         |        JOIN h${k - 1} h ON h.node = e.src GROUP BY 1),
         |at$k AS (SELECT sum(a) AS t FROM ar$k),
         |a$k AS (SELECT n.node, coalesce(ar$k.a, 0) / (SELECT t FROM at$k)
         |          AS auth
         |        FROM nodes n LEFT JOIN ar$k ON ar$k.node = n.node),
         |hr$k AS (SELECT e.src AS node, sum(a.auth) AS h FROM e
         |        JOIN a$k a ON a.node = e.dst GROUP BY 1),
         |ht$k AS (SELECT sum(h) AS t FROM hr$k),
         |h$k AS (SELECT n.node, coalesce(hr$k.h, 0) / (SELECT t FROM ht$k)
         |          AS hub
         |        FROM nodes n LEFT JOIN hr$k ON hr$k.node = n.node)""".stripMargin
    s"""WITH e AS (SELECT DISTINCT l_partkey AS src,
       |                  l_suppkey + 1000000 AS dst FROM lineitem),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |h0 AS (SELECT node, 1.0 AS hub FROM nodes),
       |${round(1)},
       |${round(2)}
       |SELECT a2.node AS node, round(a2.auth, 6) AS auth,
       |       round(h2.hub, 6) AS hub
       |FROM a2 JOIN h2 ON a2.node = h2.node ORDER BY node""".stripMargin
  }

  private val baseSpecs: Seq[Spec] = cypherSpecs ++ opsSpecs ++ graphSpecs

  /** Runs `fn` with the reach driver fast path disabled for the BUILD
    * (the loops run eagerly inside it), restoring the conf after. */
  private def distTwin(fn: (SparkSession, String) => DataFrame)
      : (SparkSession, String) => DataFrame = (s, dir) => {
    val key = "spark.graft.reach.driverRows" // Reach.DriverRowsConf
    val prev = s.conf.getOption(key)
    s.conf.set(key, "0")
    try fn(s, dir)
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** Distributed-loop twins (optimization round 17; VERDICT-r16 #5):
    * three representative reach queries FORCED onto the distributed
    * BFS / σ-DP / pointer-walk (driverRows = 0), so the 100 TB code
    * path keeps driver-visible bench numbers every round instead of
    * being performance-invisible under the driver fast-path gate at
    * bench scale. Each twin reuses its source query's fn and ORACLE
    * verbatim — driver ≡ distributed row equality is the documented
    * (and unit-pinned) contract, so the oracle gate now re-proves it
    * on real data every round. */
  private val distTwins: Seq[Spec] = Seq(
    "q124_unbounded_witness" -> "q187_dist_unbounded_witness",
    "q173_hetero_klevel_witness" -> "q188_dist_hetero_klevel_witness",
    "q163_hetero_allshortest_witness" -> "q189_dist_allshortest_witness"
  ).map { case (src, name) =>
    val (_, fn, sql) = baseSpecs.find(_._1 == src).getOrElse(
      throw new IllegalStateException(s"distTwin source missing: $src"))
    (name, distTwin(fn), sql)
  }

  private val specs: Seq[Spec] = baseSpecs ++ distTwins

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(s => s._1 -> s._2).toMap

  def oracleSql: Map[String, String] =
    specs.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
