package graft.examples

import org.apache.spark.sql.SparkSession

import graft.cypher._

/**
 * End-to-end drive of the reference-format JSON schema loader: loads
 * the reference's own MovieGraph.json, materializes a tiny movie graph
 * as parquet, and runs Cypher over it.
 */
object JsonSchemaDemo {
  def main(args: Array[String]): Unit = {
    val jsonPath = args.headOption.getOrElse(
      "/root/reference/tests/SQLRenderer.Test/TestData/MovieGraph.json")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("moviegraph").toString
    Seq(("p1", "Tom Hanks", 1956), ("p2", "Meg Ryan", 1961),
      ("p3", "Rob Reiner", 1947))
      .toDF("id", "Name", "Born")
      .write.mode("overwrite").parquet(s"$dir/Person.parquet")
    Seq(("m1", "Sleepless in Seattle", "tag1", 1993),
      ("m2", "Apollo 13", "tag2", 1995))
      .toDF("id", "Title", "Tagline", "Released")
      .write.mode("overwrite").parquet(s"$dir/Movie.parquet")
    Seq(("p1", "m1", "Sam"), ("p1", "m2", "Jim"), ("p2", "m1", "Annie"))
      .toDF("_vertexId", "_sink", "Roles")
      .write.mode("overwrite").parquet(s"$dir/ActedIn.parquet")
    Seq.empty[(String, String, String, Int)]
      .toDF("_vertexId", "_sink", "Summary", "Rating")
      .write.mode("overwrite").parquet(s"$dir/Reviewed.parquet")
    Seq(("p3", "m1")).toDF("_vertexId", "_sink")
      .write.mode("overwrite").parquet(s"$dir/Directed.parquet")
    Seq.empty[(String, String)].toDF("_vertexId", "_sink")
      .write.mode("overwrite").parquet(s"$dir/Produced.parquet")
    Seq.empty[(String, String)].toDF("_vertexId", "_sink")
      .write.mode("overwrite").parquet(s"$dir/Wrote.parquet")
    Seq(("p2", "p1")).toDF("_vertexId", "_sink")
      .write.mode("overwrite").parquet(s"$dir/Follows.parquet")

    val schema = GraphSchemaJson.loadFile(jsonPath)
    println(s"Loaded schema: ${schema.nodes.size} nodes, ${schema.edges.size} edges")
    val session = CypherSession(spark, schema, dir)
    Seq(
      """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
        |WHERE p.Name = 'Tom Hanks'
        |RETURN p.Name AS Name, m.Title AS Title ORDER BY Title""".stripMargin,
      """MATCH (p:Person)
        |OPTIONAL MATCH (p)-[a:ACTED_IN]->(m:Movie)
        |RETURN p.Name AS Name, count(m) AS Movies ORDER BY Name""".stripMargin
    ).foreach { q =>
      println(s"=== $q")
      session.run(q).show(false)
    }
    spark.stop()
  }
}
