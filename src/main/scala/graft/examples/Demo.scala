package graft.examples

import org.apache.spark.sql.SparkSession
import graft.TpchGraph

/** Example entry point (reference: examples/simple) — runs openCypher
 *  queries against the TPC-H property graph and prints results.
 *  Usage: runMain graft.examples.Demo [sfDir] ["cypher query"] */
object Demo {
  def main(args: Array[String]): Unit = {
    // `-x` anywhere in args → extension session (SKIP/$param/UNWIND/
    // var-length/list surface); default stays reference-parity
    val (flags, rest) = args.partition(_ == "-x")
    val extended = flags.nonEmpty
    val dir = rest.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = TpchGraph.session(spark, dir)
    val session = if (extended) base.extended else base
    val queries: Seq[String] =
      if (rest.length > 1) rest.drop(1).toSeq
      else Seq(
        """MATCH (c:Customer)-[p:PLACED]->(o:Order)
          |WHERE c.c_mktsegment = 'BUILDING'
          |RETURN c.c_name AS Name, o.o_totalprice AS Total
          |ORDER BY Total DESC LIMIT 5""".stripMargin,
        """MATCH (n:Nation)
          |OPTIONAL MATCH (c:Customer)-[:FROM_NATION]->(n)
          |RETURN n.n_name AS Nation, count(c) AS Customers
          |ORDER BY Customers DESC LIMIT 5""".stripMargin,
        """MATCH (c:Customer)-[:PLACED]->(o:Order)-[l:CONTAINS]->(p:Part)
          |RETURN c.c_mktsegment AS Segment, count(o) AS Orders,
          |       sum(l.l_extendedprice) AS Revenue
          |ORDER BY Revenue DESC""".stripMargin)
    queries.foreach { q =>
      println(s"\n=== $q")
      val df = session.run(q)
      df.show(20, truncate = false)
    }
    spark.stop()
  }
}
