package graft.examples

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries — the
  * plan-quality audit loop (pushdown / pruning / join strategy). */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val which = if (args.length > 1) args(1) else "q02_join_filter,q05_lineitem_agg,d03_minhash_lsh,s01_ann_topk"
    which.split(",").foreach { name =>
      println(s"===== $name =====")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
