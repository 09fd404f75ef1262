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
final class CypherSession(val spark: SparkSession, val catalog: GraphCatalog,
                          val extensions: Boolean = false) {
  def run(query: String): DataFrame = run(query, Map.empty[String, Any])

  /** Run with `$param` bindings (requires [[extended]] mode — parameter
   *  syntax, like SKIP/UNWIND/collect/var-length, is a flagged
   *  extension the reference's grammar rejects). */
  def run(query: String, params: Map[String, Any]): DataFrame =
    Compiler.compile(Parser.parse(query, extensions, params), catalog)

  /** Same session with the extension surface enabled: SKIP, `$param`,
   *  UNWIND + collect(), bounded variable-length `[*lo..hi]`. The
   *  default session keeps reference-rejection parity (SURVEY.md §2.6). */
  def extended: CypherSession =
    if (extensions) this else new CypherSession(spark, catalog, true)

  /** Parse + analyze without building the plan — for error checks. */
  def parse(query: String): ast.Query =
    Parser.parse(query, extensions, Map.empty)
}

object CypherSession {
  def apply(spark: SparkSession, schema: GraphSchema, dir: String): CypherSession =
    new CypherSession(spark, GraphCatalog.parquet(schema, spark, dir))

  def apply(spark: SparkSession, catalog: GraphCatalog): CypherSession =
    new CypherSession(spark, catalog)
}
