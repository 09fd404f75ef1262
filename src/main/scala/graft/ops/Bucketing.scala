package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table co-location: pre-shuffle a corpus ONCE at write time
 * so every later equi-join or aggregation on the bucket key runs with
 * NO exchange on that side.
 *
 * The 100 TB pattern this encodes: a curation pipeline joins features,
 * scores, dedup verdicts, and chunk maps back to the corpus by doc id
 * over and over. Shuffling 100 TB per join is the dominant cost;
 * bucketing both sides identically (same key, same bucket count) turns
 * each of those joins into a zipped per-bucket merge — Catalyst plans
 * SortMergeJoin with ZERO Exchange nodes (plan-asserted in OpsSpec),
 * and `sortBy` makes each bucket file pre-sorted so even the Sort can
 * be elided when buckets land as single files.
 *
 * Spark-first notes: bucket metadata lives in the session catalog, so
 * this surface uses `saveAsTable` (managed tables) rather than bare
 * parquet paths — path-based parquet cannot carry bucket info. Bucket
 * count is a real tuning knob at scale: #buckets ≈ corpus size /
 * target-partition-size, and BOTH sides must agree (Spark joins
 * compatible bucket counts where one divides the other).
 */
object Bucketing {

  /**
   * Write `df` as a managed parquet table bucketed (and per-bucket
   * sorted) by `keyCol`. One full shuffle now; none on every later
   * join/groupBy keyed on `keyCol`.
   *
   * The `repartition` on the key aligns task boundaries with bucket
   * hashing so each bucket is produced by one task — single file per
   * bucket (keeps the sortBy metadata usable and file counts bounded
   * at #buckets, not #tasks × #buckets).
   */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    nBuckets: Int): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(keyCol))
      .write.mode("overwrite")
      .bucketBy(nBuckets, keyCol).sortBy(keyCol)
      .format("parquet").saveAsTable(table)
  }

  /** Inner-join two identically bucketed tables on the bucket key —
   *  exchange-free by construction when both were written with
   *  [[writeBucketed]] and the same bucket count. */
  def joinBucketed(spark: SparkSession, tableA: String, tableB: String,
                   keyCol: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), Seq(keyCol))
}
