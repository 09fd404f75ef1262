package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    val spark = df.sparkSession
    // A REGISTERED table is replaced by `mode("overwrite")` itself —
    // never pre-dropped, so a failed write cannot lose the previous
    // table. The cleanup below covers only the orphan case: a
    // managed-table location left by a previous JVM whose catalog
    // entry is gone (saveAsTable would throw LOCATION_ALREADY_EXISTS);
    // with no registered table there is nothing to lose but stale
    // bytes. The location comes from the catalog's identifier mapping
    // (database-aware), not a string concat on warehouse.dir.
    val (locUri, registered) =
      org.apache.spark.sql.GraftSqlBridge.managedTableStatus(spark, table)
    if (!registered) {
      val loc = new org.apache.hadoop.fs.Path(locUri)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
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

  /**
   * Morton (Z-order) code of two non-negative integer dimensions,
   * `bits` bits each: interleaves the bits so that sorting by the code
   * clusters rows that are close in BOTH dimensions — the multi-column
   * data-layout trick (Delta OPTIMIZE ZORDER, Iceberg sort orders)
   * that makes min/max file pruning effective on two predicates at
   * once, where a lexicographic sort only prunes the leading column.
   * Built from plain shift/mask arithmetic (codegen-resident, and
   * reproducible in any SQL engine — the oracle mirrors it with
   * integer division).
   *
   * Dimensions must be non-negative: arithmetic shiftright and signed
   * `%` would silently emit a wrong (mis-clustering) code for negative
   * inputs, so they fail loudly at runtime instead. Null inputs yield
   * a null code (null-propagating like any arithmetic).
   */
  def mortonCode(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    val code = (0 until bits).map { i =>
      val xb = (shiftright(xl, i) % 2) * lit(1L << (2 * i))
      val yb = (shiftright(yl, i) % 2) * lit(1L << (2 * i + 1))
      xb + yb
    }.reduce(_ + _)
    when(xl.isNull || yl.isNull, lit(null).cast("long"))
      .when(xl < 0 || yl < 0,
        raise_error(lit("graft.Bucketing.mortonCode: negative dimension " +
          "(dimensions must be non-negative integers)")))
      .otherwise(code)
  }

  /**
   * Z-order file layout plan + its pruning ledger: sort rows by
   * [[mortonCode]] over the two dimensions (id tie-break), cut files
   * of `rowsPerFile`, and report each file's min/max envelope per
   * dimension — exactly the footer statistics a scan would prune
   * against. Output: (file_id, n_rows, min_x, max_x, min_y, max_y).
   * Feeding the envelopes to a predicate count answers "how many files
   * does query X touch" BEFORE committing the rewrite.
   *
   * Scale shape: the sort is a range exchange on the morton key — the
   * one-time write-amplification every layout optimization pays, after
   * which reads prune instead of scan. The ledger itself is one
   * partial-aggregated groupBy over slim (file, x, y) rows.
   */
  def zorderLayout(df: DataFrame, xCol: String, yCol: String, idCol: String,
                   bits: Int, rowsPerFile: Int): DataFrame = {
    require(rowsPerFile >= 1, s"rowsPerFile must be >= 1: $rowsPerFile")
    val code = mortonCode(col(xCol), col(yCol), bits)
    // exact global positions via a single-partition window: right for
    // the oracle-checked ledger at bench scale; the production write
    // path gets the identical file boundaries from
    // repartitionByRange(__z) + per-partition cuts (no global window),
    // as writeCurated does for its sort
    val w = Window.orderBy(col("__z"), col(idCol))
    df.select(col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"),
        col(idCol), code.as("__z"))
      .withColumn("file_id",
        ((row_number().over(w).cast("long") - 1L) / rowsPerFile).cast("long"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))
  }

  /**
   * Skew-salted equi-join: when one join key carries a disproportionate
   * share of the fact side (the classic hot-key straggler), split that
   * key's rows across `salts` sub-partitions via a deterministic
   * per-row salt and replicate the (small) dim side once per salt —
   * the join runs on (key, salt) and the hot key's work spreads over
   * `salts` tasks instead of pinning one. Result set is EXACTLY the
   * plain join's (salt values never affect matching, only placement),
   * which is what the property test and the oracle pin.
   *
   * `saltExpr` must be deterministic per fact row (a row-content hash
   * or any existing column — NOT rand()); the dim replication is an
   * in-row sequence explode, `salts`× the dim only. Use when AQE's
   * skew handling can't see the skew (e.g., pre-shuffle bucketing or
   * a first-stage join); prefer AQE where it applies.
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
                 salts: Int, saltExpr: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1: $salts")
    val f = fact.withColumn("__salt", pmod(saltExpr, lit(salts)).cast("int"))
    val d = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    f.join(d, Seq(keyCol, "__salt")).drop("__salt")
  }

  /**
   * Partition-column advisory (round 11): for each CANDIDATE column,
   * what `partitionBy(col)` would actually produce — partition count,
   * mean/max rows per partition, the skew ratio, the estimated file
   * count at `targetRowsPerFile`, and the share of partitions that
   * would land as small files (< target/4 rows) — plus a verdict:
   * `too_many_partitions` (> maxPartitions directories — metadata
   * pressure swamps pruning wins), `too_coarse` (< minPartitions —
   * pruning can't skip anything), `skewed` (max/mean > skewRatio —
   * one directory holds the table), else `ok`. The pre-write sibling
   * of [[pruningSim]]: run it BEFORE committing a layout, not after.
   *
   * Scale: one partial-agg groupBy per candidate (k passes over the
   * column, k small by construction) feeding a partitions-sized
   * second aggregate; candidates' report rows union. Nothing
   * corpus-sized shuffles beyond the per-candidate key counts; null
   * partition values count as one directory (Hive's __HIVE_DEFAULT
   * behavior).
   */
  def partitionPlanAdvisory(df: DataFrame, candidates: Seq[String],
      targetRowsPerFile: Long, maxPartitions: Long = 10000L,
      minPartitions: Long = 4L, skewRatio: Double = 10.0): DataFrame = {
    require(candidates.nonEmpty, "partitionPlanAdvisory: no candidates")
    require(targetRowsPerFile >= 1,
      s"targetRowsPerFile must be >= 1: $targetRowsPerFile")
    candidates.map { c =>
      val perPart = df.groupBy(col(c)).agg(count(lit(1)).as("__n"))
      perPart.agg(
          count(lit(1)).as("n_partitions"),
          sum(col("__n")).as("rows_total"),
          max(col("__n")).as("max_rows"),
          sum(ceil(col("__n").cast("double") / targetRowsPerFile)
            .cast("long")).as("est_files"),
          sum(when(col("__n") < targetRowsPerFile / 4L, 1L)
            .otherwise(0L)).as("__small"))
        .select(lit(c).as("part_col"), col("n_partitions"),
          col("rows_total"),
          (col("rows_total").cast("double") / col("n_partitions"))
            .as("mean_rows"),
          col("max_rows"),
          (col("max_rows").cast("double") *
            col("n_partitions") / col("rows_total")).as("skew"),
          col("est_files"),
          (col("__small").cast("double") / col("n_partitions"))
            .as("small_file_share"))
        .withColumn("verdict",
          when(col("n_partitions") > maxPartitions,
            lit("too_many_partitions"))
          .when(col("n_partitions") < minPartitions, lit("too_coarse"))
          .when(col("skew") > skewRatio, lit("skewed"))
          .otherwise(lit("ok")))
    }.reduce(_ unionByName _)
  }

  /**
   * File-skipping simulation over a layout ledger: given per-file
   * min/max envelopes ([[zorderLayout]]'s output \u2014 or any manifest
   * with column statistics) and a rectangular predicate box, classify
   * each file PRUNED (envelope disjoint from the box \u2014 a reader
   * skips it on statistics alone) or SCANNED, and report the I/O
   * fraction the layout saves. The quantitative "was the Z-order
   * worth it" readout: run it before and after re-layout and compare
   * scan fractions for the workload's hot predicates.
   *
   * Ledger-sized input \u2014 one map + 1-row aggregate. Output one row:
   * (n_files, n_scanned, n_pruned, rows_total, rows_scanned,
   * file_scan_frac, row_scan_frac).
   */
  def pruningSim(ledger: DataFrame, xLo: Long, xHi: Long,
                 yLo: Long, yHi: Long): DataFrame = {
    require(xLo <= xHi && yLo <= yHi, "empty predicate box")
    val overlaps = !(col("max_x") < xLo || col("min_x") > xHi ||
      col("max_y") < yLo || col("min_y") > yHi)
    ledger.select(col("n_rows"), overlaps.as("__scan"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("__scan"), 1L).otherwise(0L)).as("n_scanned"),
        sum(when(!col("__scan"), 1L).otherwise(0L)).as("n_pruned"),
        sum(col("n_rows")).as("rows_total"),
        sum(when(col("__scan"), col("n_rows")).otherwise(0L))
          .as("rows_scanned"))
      .select(col("n_files"), col("n_scanned"), col("n_pruned"),
        col("rows_total"), col("rows_scanned"),
        (col("n_scanned").cast("double") / col("n_files"))
          .as("file_scan_frac"),
        (col("rows_scanned").cast("double") / col("rows_total"))
          .as("row_scan_frac"))
  }
}
