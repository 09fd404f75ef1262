package graft

import graft.cypher._

/**
 * Property-graph schema over the driver's TPC-H-ish parquet tables
 * (/root/repo/FIXTURES.md §2). Node tables are used as-is; edge entities
 * are views over the same tables — the reference's pattern, where an
 * edge is any table exposing a source-id and a sink-id column
 * (reference: EdgeSchema.cs:9-43).
 */
object TpchGraph {
  val schema: GraphSchema = GraphSchema(
    nodes = Seq(
      NodeDef("Region", "r_regionkey", Seq("r_name"), "region"),
      NodeDef("Nation", "n_nationkey", Seq("n_name"), "nation"),
      NodeDef("Customer", "c_custkey",
        Seq("c_name", "c_acctbal", "c_mktsegment", "c_nationkey"), "customer",
        // secondary labels (extension): same table, one discriminator —
        // `(c:Customer:BuildingCustomer)` lowers to c_mktsegment = …
        subLabels = Map(
          "BuildingCustomer" -> ("c_mktsegment", "BUILDING"),
          "MachineryCustomer" -> ("c_mktsegment", "MACHINERY"))),
      NodeDef("Supplier", "s_suppkey", Seq("s_name", "s_acctbal"), "supplier"),
      NodeDef("Part", "p_partkey",
        Seq("p_name", "p_brand", "p_type", "p_size", "p_retailprice"), "part"),
      NodeDef("Order", "o_orderkey",
        Seq("o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
        "orders",
        subLabels = Map("UrgentOrder" -> ("o_orderpriority", "1-URGENT")))),
    edges = Seq(
      EdgeDef("IN_REGION", "Nation", "Region",
        "n_nationkey", "n_regionkey", Seq.empty, "nation"),
      EdgeDef("FROM_NATION", "Customer", "Nation",
        "c_custkey", "c_nationkey", Seq.empty, "customer"),
      EdgeDef("LOCATED_IN", "Supplier", "Nation",
        "s_suppkey", "s_nationkey", Seq.empty, "supplier"),
      EdgeDef("PLACED", "Customer", "Order",
        "o_custkey", "o_orderkey", Seq("o_orderdate"), "orders"),
      // second Customer→Order verb sharing PLACED's endpoints (the
      // urgent subset, with one extra property) — backs the bound
      // relationship-type alternation extension `[r:PLACED|
      // PLACED_URGENT]`: union property namespace, null-filled.
      // NOTE: with two verbs on the same endpoint pair, a VERB-LESS
      // relationship pattern between Customer and Order
      // (`(c:Customer)-->(o:Order)`) is now ambiguous and raises the
      // standard "ambiguous relationship" binding error — name the
      // verb (every in-repo query does)
      EdgeDef("PLACED_URGENT", "Customer", "Order",
        "o_custkey", "o_orderkey", Seq("o_orderdate", "o_orderpriority"),
        "orders_urgent"),
      EdgeDef("CONTAINS", "Order", "Part",
        "l_orderkey", "l_partkey",
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate", "l_linenumber",
          "l_suppkey"),
        "lineitem"),
      EdgeDef("SUPPLIED_BY", "Order", "Supplier",
        "l_orderkey", "l_suppkey",
        Seq("l_quantity", "l_extendedprice"), "lineitem"),
      // self-type edge (Nation → Nation): successor nation inside the
      // same region, derived deterministically from the nation table —
      // the chain graph behind the unbounded [*1..] reachability
      // extension (a DuckDB recursive CTE mirrors it exactly)
      EdgeDef("NEXT_IN_REGION", "Nation", "Nation",
        "src_nationkey", "dst_nationkey", Seq.empty, "nation_chain"),
      // second self-type Nation edge with BRANCHING: each nation jumps
      // to its +1 AND +2 successors within the region (a diamond-rich
      // DAG — distinct shortest-path counts follow a Fibonacci-like
      // recurrence), backing the anchored allShortestPaths witness
      // lowering; a DuckDB UNION ALL recursive walk mirrors it exactly
      // (the DAG terminates the recursion)
      // jump_span (round 10): 1 for the +1 successor edge, 2 for the
      // +2 — backs the per-hop predicate extension ([j:JUMPS_TO*
      // WHERE j.jump_span = 1] walks the unit chain only)
      EdgeDef("JUMPS_TO", "Nation", "Nation",
        "src_nationkey", "dst_nationkey", Seq("jump_span"), "nation_jump"),
      // heterogeneous verb (round 10): ONE verb spanning two label
      // pairs — Customer→Order (orders) and Order→Part (lineitem) —
      // the label DAG behind the label-stratified unbounded-chain
      // extension `(a:Customer)-[:FEEDS*1..]->(b:Part)`
      EdgeDef("FEEDS", "Customer", "Order",
        "o_custkey", "o_orderkey", Seq.empty, "orders"),
      EdgeDef("FEEDS", "Order", "Part",
        "l_orderkey", "l_partkey", Seq.empty, "lineitem")))

  def session(spark: org.apache.spark.sql.SparkSession, dir: String): CypherSession = {
    // live-session registration (idempotent): the graft_* SQL surface
    // plus ShortCircuitExists, so EXISTS-as-expression lowerings run
    // as short-circuit `exists` even when the host session wasn't
    // built with spark.sql.extensions
    GraftExtensions.register(spark)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val base: String => org.apache.spark.sql.DataFrame =
      t => GraphCatalog.cachedParquet(spark, s"$dir/$t.parquet")
    val loader: String => org.apache.spark.sql.DataFrame = {
      case "orders_urgent" =>
        base("orders").where(col("o_orderpriority") === "1-URGENT")
      case "nation_chain" =>
        val w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
        base("nation").select(
            col("n_nationkey").as("src_nationkey"),
            lead("n_nationkey", 1).over(w).as("dst_nationkey"))
          .where(col("dst_nationkey").isNotNull)
      case "nation_jump" =>
        val w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
        val n = base("nation")
        n.select(col("n_nationkey").as("src_nationkey"),
            lead("n_nationkey", 1).over(w).as("dst_nationkey"),
            lit(1).as("jump_span"))
          .unionByName(n.select(col("n_nationkey").as("src_nationkey"),
            lead("n_nationkey", 2).over(w).as("dst_nationkey"),
            lit(2).as("jump_span")))
          .where(col("dst_nationkey").isNotNull)
      case t => base(t)
    }
    new CypherSession(spark, new GraphCatalog(schema, loader))
  }
}
