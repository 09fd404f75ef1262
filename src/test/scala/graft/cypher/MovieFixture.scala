package graft.cypher

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tiny movie graph — a subset of the Neo4j movie dataset the reference
 *  e2e suite loads (reference: tests/SQLRenderer.Test/TestData/
 *  MovieDBSQLCmds.sql, schema MovieGraph.json:1-150). */
object MovieFixture {
  val schema: GraphSchema = GraphSchema(
    nodes = Seq(
      NodeDef("Person", "id", Seq("Name", "Born"), "person",
        subLabels = Map("Boomer" -> ("Born", 1956),
          "Sixties" -> ("Born", 1961))),
      NodeDef("Movie", "id", Seq("Title", "Tagline", "Released"), "movie",
        subLabels = Map("NinetiesClassic" -> ("Released", 1993)))),
    edges = Seq(
      EdgeDef("ACTED_IN", "Person", "Movie", "_vertexId", "_sink",
        Seq("Roles"), "acted_in"),
      EdgeDef("REVIEWED", "Person", "Movie", "_vertexId", "_sink",
        Seq("Summary", "Rating"), "reviewed"),
      EdgeDef("DIRECTED", "Person", "Movie", "_vertexId", "_sink",
        Seq.empty, "directed"),
      EdgeDef("FOLLOWS", "Person", "Person", "_vertexId", "_sink",
        Seq.empty, "follows"),
      // property-bearing self-type edge (round 10): backs per-hop
      // predicate tests on var-length rels — the 1999 shortcut
      // p1→p4 disappears under `Since >= 2010`, flipping the
      // shortest p1→p4 distance from 1 to 3
      EdgeDef("KNOWS", "Person", "Person", "_vertexId", "_sink",
        Seq("Since"), "knows")))

  def catalog(spark: SparkSession): GraphCatalog = {
    import spark.implicits._
    val person: DataFrame = Seq(
      ("p1", "Tom Hanks", Some(1956)),
      ("p2", "Meg Ryan", Some(1961)),
      ("p3", "Kevin Bacon", Some(1958)),
      ("p4", "Rob Reiner", None: Option[Int]),
      ("p5", "Jessica Thompson", None: Option[Int])
    ).toDF("id", "Name", "Born")
    val movie: DataFrame = Seq(
      ("m1", "Sleepless in Seattle", Some("What if someone you never met..."), 1993),
      ("m2", "Apollo 13", Some("Houston, we have a problem."), 1995),
      ("m3", "You've Got Mail", None: Option[String], 1998)
    ).toDF("id", "Title", "Tagline", "Released")
    val actedIn: DataFrame = Seq(
      ("p1", "m1", "Sam Baldwin"),
      ("p1", "m2", "Jim Lovell"),
      ("p1", "m3", "Joe Fox"),
      ("p2", "m1", "Annie Reed"),
      ("p2", "m3", "Kathleen Kelly"),
      ("p3", "m2", "Jack Swigert")
    ).toDF("_vertexId", "_sink", "Roles")
    val reviewed: DataFrame = Seq(
      ("p5", "m1", "Loved it", 95),
      ("p5", "m3", "Fun", 85)
    ).toDF("_vertexId", "_sink", "Summary", "Rating")
    val directed: DataFrame = Seq(
      ("p4", "m1")
    ).toDF("_vertexId", "_sink")
    val follows: DataFrame = Seq(
      ("p5", "p1"), ("p5", "p2"), ("p1", "p2")
    ).toDF("_vertexId", "_sink")
    val knows: DataFrame = Seq(
      ("p1", "p2", 2010), ("p2", "p3", 2015), ("p3", "p4", 2020),
      ("p1", "p4", 1999)
    ).toDF("_vertexId", "_sink", "Since")
    val tables = Map(
      "person" -> person, "movie" -> movie, "acted_in" -> actedIn,
      "reviewed" -> reviewed, "directed" -> directed, "follows" -> follows,
      "knows" -> knows)
    new GraphCatalog(schema, tables(_))
  }
}
