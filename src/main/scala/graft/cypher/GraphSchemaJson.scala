package graft.cypher

import org.apache.spark.sql.types._
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
 * .NET `PropertyType` strings (reference: EntityProperty.cs:13-29;
 * SQL type map SQLRenderer.cs:55-73) are mapped to Spark types and
 * validated against the backing parquet at bind time — a declared/
 * stored divergence raises a typed binding error like the reference's.
 * Unknown .NET type names are ignored (permissive, like an absent
 * declaration).
 */
object GraphSchemaJson {

  /** .NET type name → Spark type (reference SQL map SQLRenderer.cs:
    * 55-73). `System.Nullable&#96;1[X]` unwraps to X — parquet columns
    * are nullable by default. Guid maps to string (its storage form in
    * parquet-backed graphs); unsigned types map like their signed
    * widths, as in the reference's SqlDbType table. */
  private[cypher] def dotNetType(name: String): Option[DataType] = {
    val inner =
      if (name.startsWith("System.Nullable`1[") && name.endsWith("]"))
        name.stripPrefix("System.Nullable`1[").stripSuffix("]")
      else name
    inner match {
      case "System.String"                   => Some(StringType)
      case "System.Int32" | "System.UInt32"  => Some(IntegerType)
      case "System.Int16" | "System.UInt16"  => Some(ShortType)
      case "System.Int64" | "System.UInt64"  => Some(LongType)
      case "System.Double"                   => Some(DoubleType)
      case "System.Single"                   => Some(FloatType)
      case "System.Boolean"                  => Some(BooleanType)
      case "System.DateTime"                 => Some(TimestampType)
      case "System.Byte" | "System.SByte"    => Some(ByteType)
      case "System.Byte[]"                   => Some(BinaryType)
      case "System.Decimal"                  => Some(DecimalType.SYSTEM_DEFAULT)
      case "System.Guid"                     => Some(StringType)
      case _                                 => None
    }
  }

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
    def propType(v: JValue): Option[(String, DataType)] = v match {
      case o: JObject => (o \ "PropertyType") match {
        case JString(t) => dotNetType(t).map(str(o, "PropertyName") -> _)
        case _ => None
      }
      case _ => None
    }
    /** Declared types of the id propert(ies) + regular properties. */
    def propTypes(v: JValue, idFields: String*): Map[String, DataType] = {
      val ids = idFields.flatMap(f => propType(v \ f))
      val regs = v \ "Properties" match {
        case JArray(items) => items.flatMap(propType)
        case _ => Seq.empty
      }
      (ids ++ regs).toMap
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
          table = tables.getOrElse(id, id),
          propertyTypes = propTypes(n, "IdProperty"))
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
          table = tables.getOrElse(id, id),
          propertyTypes = propTypes(e, "SourceIdProperty", "SinkIdProperty"))
      }
      case _ => Seq.empty
    }

    GraphSchema(nodes, edges)
  }

  def loadFile(path: String): GraphSchema =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
}
