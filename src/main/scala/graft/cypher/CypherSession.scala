package graft.cypher

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Public API: run an openCypher query against a property graph defined
 * over DataFrames (reference: examples/simple — parse → plan → render;
 * here parse → analyze → compile straight to a DataFrame, executed by
 * Catalyst/Tungsten).
 *
 * {{{
 * val session = CypherSession(spark, schema, "/data/sf0.01")
 * session.run("MATCH (c:Customer)-[:PLACED]->(o:Order) RETURN ...")
 * }}}
 */
final class CypherSession(val spark: SparkSession, val catalog: GraphCatalog) {
  def run(query: String): DataFrame =
    Compiler.compile(Parser.parse(query), catalog)

  /** Parse + analyze without building the plan — for error checks. */
  def parse(query: String): ast.Query = Parser.parse(query)
}

object CypherSession {
  def apply(spark: SparkSession, schema: GraphSchema, dir: String): CypherSession =
    new CypherSession(spark, GraphCatalog.parquet(schema, spark, dir))

  def apply(spark: SparkSession, catalog: GraphCatalog): CypherSession =
    new CypherSession(spark, catalog)
}
