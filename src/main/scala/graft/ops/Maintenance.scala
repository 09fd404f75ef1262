package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dataset maintenance: the unglamorous operations a long-lived corpus
 * store needs between pipeline runs.
 *
 * Small files are the silent killer of a 100 TB parquet lake: every
 * incremental append (d07/d09-style daily batches) lands a few files,
 * and after a year the listing alone dominates query planning while
 * row-group-sized reads degrade to per-file seeks. Compaction rewrites
 * a dataset into target-sized files; the footprint report is the
 * monitoring half that tells you when to run it.
 */
object Maintenance {

  /** (file count, total bytes) of a parquet dataset — one FileSystem
   *  listing, no Spark job. */
  def parquetFootprint(spark: SparkSession, path: String): (Long, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var files = 0L
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) { files += 1; bytes += f.getLen }
    }
    (files, bytes)
  }

  /**
   * Rewrite a parquet dataset into ⌈bytes / targetFileBytes⌉ files.
   * One full read + one round-robin repartition + one write — the
   * repartition is the only shuffle and carries exactly the dataset
   * once (unavoidable: compaction IS a rewrite). Returns the file
   * count written.
   *
   * `sortCols` optionally sorts within each output file so parquet
   * min/max row-group statistics become selective for later range
   * filters on those columns (zone-map effect) — at 100 TB this is
   * the difference between scanning every row group and skipping most
   * of them for a `quality >= x` or time-range read.
   */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
                     targetFileBytes: Long = 512L << 20,
                     sortCols: Seq[String] = Nil): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val (_, bytes) = parquetFootprint(spark, inPath)
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inPath).repartition(n)
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(col): _*)
    sorted.write.mode("overwrite").parquet(outPath)
    n
  }

  /**
   * Partition-skew report: rows per physical partition of `df` AS
   * CURRENTLY PARTITIONED, plus the skew ratio (max/avg) — the
   * diagnostic run before blaming an operator for a straggler. One
   * narrow map (spark_partition_id) + a partial-aggregated count;
   * returns (partition_id, n_rows) with the summary in
   * [[partitionSkewSummary]].
   */
  def partitionSkewReport(df: DataFrame): DataFrame =
    df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("n_rows"))

  /** One-row summary of [[partitionSkewReport]]: n_partitions, total,
    * max, avg, skew = max/avg. */
  def partitionSkewSummary(df: DataFrame): DataFrame =
    partitionSkewReport(df)
      .agg(count(lit(1)).as("n_partitions"), sum("n_rows").as("total_rows"),
        max("n_rows").as("max_rows"),
        (sum("n_rows").cast("double") / count(lit(1))).as("avg_rows"))
      .withColumn("skew", col("max_rows") / col("avg_rows"))
}
