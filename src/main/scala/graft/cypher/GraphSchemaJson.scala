package graft.cypher

import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Loader for the reference's JSON graph-schema format, so an existing
 * user's schema files work unchanged (reference:
 * tests/LogicalPlanner.Test/TestData/MovieGraph.json — `Nodes` with
 * `IdProperty`/`Properties`, `Edges` with `FromNode`/`ToNode`/
 * `SourceIdProperty`/`SinkIdProperty`, optional `TableDescriptors`
 * binding entity ids to table names, SQLTableDescriptor.cs:8-13).
 *
 * .NET `PropertyType` strings are accepted and ignored — Spark derives
 * column types from the backing parquet/view schemas.
 */
object GraphSchemaJson {

  def parse(json: String): GraphSchema = {
    val root =
      try JsonMethods.parse(json)
      catch { case e: Exception =>
        throw new CypherBindingException(
          s"graph schema JSON is not valid JSON: ${e.getMessage}")
      }

    def str(v: JValue, field: String): String = v \ field match {
      case JString(s) => s
      case _ => throw new CypherBindingException(
        s"graph schema JSON: missing string field '$field'")
    }
    def propName(v: JValue, field: String): String =
      str(v \ field, "PropertyName")
    def propList(v: JValue): Seq[String] = v \ "Properties" match {
      case JArray(items) => items.map(str(_, "PropertyName"))
      case _ => Seq.empty
    }

    // entity id → table name (strip [dbo].[X] decoration to X)
    val tables: Map[String, String] = root \ "TableDescriptors" match {
      case JArray(items) => items.map { d =>
        val raw = str(d, "TableOrViewName")
        val clean = raw.split('.').last.stripPrefix("[").stripSuffix("]")
        str(d, "EntityId") -> clean
      }.toMap
      case _ => Map.empty
    }

    val nodes = (root \ "Nodes": @unchecked) match {
      case JArray(items) => items.map { n =>
        val id = str(n, "Id")
        NodeDef(
          label = str(n, "Name"),
          idColumn = propName(n, "IdProperty"),
          properties = propList(n),
          table = tables.getOrElse(id, id))
      }
      case _ => throw new CypherBindingException(
        "graph schema JSON: missing 'Nodes' array")
    }

    val edges = (root \ "Edges": @unchecked) match {
      case JArray(items) => items.map { e =>
        val from = str(e, "FromNode")
        val to = str(e, "ToNode")
        val verb = str(e, "Name")
        // edge entity id is the (from, verb, to) triple
        // (reference: EdgeSchema.cs:13-16 — "{from}@{verb}@{to}")
        val id = (e \ "Id") match {
          case JString(s) => s
          case _ => s"$from@$verb@$to"
        }
        EdgeDef(
          verb = verb,
          fromLabel = from,
          toLabel = to,
          srcIdColumn = propName(e, "SourceIdProperty"),
          sinkIdColumn = propName(e, "SinkIdProperty"),
          properties = propList(e),
          table = tables.getOrElse(id, id))
      }
      case _ => Seq.empty
    }

    GraphSchema(nodes, edges)
  }

  def loadFile(path: String): GraphSchema =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
}
