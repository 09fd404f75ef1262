package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for slow-query triage (local tool, not part of
  * the driver contract). Usage: runMain graft.examples.Prof <sfDir> */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.count()
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val ref = d.where(col("lang") === "en")
    time("fps")(graft.ops.TextOps.winnowFingerprints(d, "text", "doc_id", 3, 4).count())
    time("d12 pairs uncapped")(graft.ops.Dedup.winnowDupPairs(d, "text", "doc_id", 3, 4, 2, 1 << 20).count())
    time("t18")(graft.ops.TextOps.bigramLogLikelihood(d, ref, "text", "doc_id").count())
    time("t21")(graft.ops.TextOps.perplexityBuckets(d, ref, "text", "doc_id", "lang").count())
    time("t18 2nd")(graft.ops.TextOps.bigramLogLikelihood(d, ref, "text", "doc_id").count())
    time("t21 2nd")(graft.ops.TextOps.perplexityBuckets(d, ref, "text", "doc_id", "lang").count())
    spark.stop()
  }
}
