package graft.cypher

import org.scalatest.funsuite.AnyFunSuite

class GraphSchemaJsonSpec extends AnyFunSuite {

  test("parses the reference's own MovieGraph.json unchanged") {
    val path = "/root/reference/tests/SQLRenderer.Test/TestData/MovieGraph.json"
    assume(new java.io.File(path).exists())
    val s = GraphSchemaJson.loadFile(path)
    assert(s.nodes.map(_.label).toSet == Set("Person", "Movie"))
    assert(s.node("Person").idColumn == "id")
    assert(s.node("Person").properties == Seq("Name", "Born"))
    // table binding comes from TableDescriptors, [dbo].[X] → X
    assert(s.node("Person").table == "Person")
    val acted = s.edge("Person", "ACTED_IN", "Movie").get
    assert(acted.srcIdColumn == "_vertexId" && acted.sinkIdColumn == "_sink")
    assert(acted.table == "ActedIn")
    assert(s.edge("Person", "FOLLOWS", "Person").isDefined)
    assert(s.edges.size == 6)
  }

  test("malformed schema JSON raises typed errors") {
    intercept[CypherBindingException](GraphSchemaJson.parse("not json at all"))
    intercept[CypherBindingException](GraphSchemaJson.parse("{}"))
    intercept[CypherBindingException](GraphSchemaJson.parse(
      """{"Nodes": [{"Id": "N"}]}""")) // missing Name/IdProperty
  }

  test("declared .NET property types map to Spark types (MovieGraph round-trip)") {
    val path = "/root/reference/tests/SQLRenderer.Test/TestData/MovieGraph.json"
    assume(new java.io.File(path).exists())
    val s = GraphSchemaJson.loadFile(path)
    import org.apache.spark.sql.types._
    val p = s.node("Person")
    assert(p.propertyTypes("id") == StringType)
    assert(p.propertyTypes("Name") == StringType)
    assert(p.propertyTypes("Born") == IntegerType) // Nullable`1[Int32] unwraps
    val m = s.node("Movie")
    assert(m.propertyTypes("Released") == IntegerType)
    val acted = s.edge("Person", "ACTED_IN", "Movie").get
    assert(acted.propertyTypes("_vertexId") == StringType)
    // full .NET map incl. the types MovieGraph doesn't use
    assert(GraphSchemaJson.dotNetType("System.Decimal")
      .exists(_.isInstanceOf[DecimalType]))
    assert(GraphSchemaJson.dotNetType("System.Guid").contains(StringType))
    assert(GraphSchemaJson.dotNetType("System.Byte[]").contains(BinaryType))
    assert(GraphSchemaJson.dotNetType("System.DateTime").contains(TimestampType))
    assert(GraphSchemaJson.dotNetType("Custom.Unknown").isEmpty)
  }

  test("declared/stored type divergence raises a typed binding error at bind") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.types._
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val backing = Seq((1L, 2.5)).toDF("id", "amount") // amount stored DOUBLE
    val schema = GraphSchema(nodes = Seq(NodeDef("N", "id", Seq("amount"), "n",
      propertyTypes = Map("id" -> LongType,
        "amount" -> DecimalType.SYSTEM_DEFAULT))), // declared DECIMAL
      edges = Seq.empty)
    val cat = new GraphCatalog(schema, Map("n" -> backing))
    val e = intercept[CypherBindingException](cat.nodeDf("N"))
    assert(e.getMessage.contains("amount") && e.getMessage.contains("decimal"))
    // matching declaration binds fine
    val okSchema = GraphSchema(nodes = Seq(NodeDef("N", "id", Seq("amount"), "n",
      propertyTypes = Map("id" -> LongType, "amount" -> DoubleType))),
      edges = Seq.empty)
    assert(new GraphCatalog(okSchema, Map("n" -> backing))
      .nodeDf("N").count() == 1)
    // declared property absent from the backing table
    val missing = GraphSchema(nodes = Seq(NodeDef("N", "id", Seq("ghost"), "n",
      propertyTypes = Map("ghost" -> StringType))), edges = Seq.empty)
    val e2 = intercept[CypherBindingException](
      new GraphCatalog(missing, Map("n" -> backing)).nodeDf("N"))
    assert(e2.getMessage.contains("ghost"))
  }

  test("minimal schema without TableDescriptors falls back to entity ids") {
    val json =
      """{"Nodes": [{"Id": "N", "Name": "N",
        |  "IdProperty": {"PropertyName": "id", "PropertyType": "System.Int64"},
        |  "Properties": [{"PropertyName": "x", "PropertyType": "System.String"}]}],
        | "Edges": [{"Name": "E", "FromNode": "N", "ToNode": "N",
        |  "SourceIdProperty": {"PropertyName": "s", "PropertyType": "System.Int64"},
        |  "SinkIdProperty": {"PropertyName": "t", "PropertyType": "System.Int64"}}]}
        |""".stripMargin
    val s = GraphSchemaJson.parse(json)
    assert(s.node("N").table == "N")
    assert(s.edge("N", "E", "N").get.table == "N@E@N")
    assert(s.edge("N", "E", "N").get.properties.isEmpty)
  }
}
