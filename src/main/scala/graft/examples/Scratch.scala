package graft.examples

import org.apache.spark.sql.SparkSession

/** Scratch triage: replay partition-count sweep (local tool). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val names = Seq("e58_stream_sliding_users", "d31_stream_span_cuts",
      "d36_stream_components", "d23_stream_minhash",
      "e50_stream_sessionize", "d21_stream_dedup")
    def sweep(tag: String): Unit = names.foreach { name =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $tag $name: min=${ts.min}%.2f s (${
        ts.map(t => f"$t%.2f").mkString(",")})")
    }
    sweep("p4-warmup")
    sweep("p4")
    spark.conf.set("spark.graft.replay.partitions", "2")
    sweep("p2")
    spark.conf.set("spark.graft.replay.partitions", "1")
    sweep("p1")
    spark.conf.unset("spark.graft.replay.partitions")
    sweep("p4-again")
    spark.stop()
  }
}
