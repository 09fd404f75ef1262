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
