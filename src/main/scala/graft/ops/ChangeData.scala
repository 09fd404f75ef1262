package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Change-log → dimension-history builders (the warehouse-side
 * companions of [[Dedup.snapshotDiff]]): turn an append-only stream of
 * observed states into the slowly-changing-dimension shapes training
 * pipelines join against (point-in-time feature lookups, leakage-free
 * "as of" enrichment with [[AsOf.asofJoin]]).
 */
object ChangeData {

  /**
   * Type-2 slowly-changing-dimension history from a change log: one
   * row per (key, state episode) with `valid_from` / `valid_to`
   * half-open validity `[from, to)` and `is_current` on the open
   * episode. Consecutive rows of a key whose tracked attributes are
   * all unchanged (null-safe compare) collapse into the earlier
   * episode — re-observing the same state extends it, it does not
   * split it.
   *
   * Rows of a key are ordered by (`tsCol`, `tieCol`); the tie column
   * (any unique event id) makes the episode sequence deterministic
   * when observations share a timestamp.
   *
   * Scale shape: exactly one shuffle on the key (both windows and the
   * change filter share the same partitioning — Catalyst plans a
   * single Exchange), state never leaves its partition, and output is
   * bounded by the number of actual state CHANGES, not observations.
   * At 100 TB, partition the change log by key on write so the window
   * shuffle is the only movement.
   */
  def scd2(changes: DataFrame, keyCol: String, attrCols: Seq[String],
           tsCol: String, tieCol: String): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    // a row opens a new episode iff it is the key's first observation
    // or ANY tracked attribute differs from the previous observation
    val opens = attrCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _) || lag(col(tsCol), 1).over(w).isNull
    val kept = changes
      .select((keyCol +: attrCols :+ tsCol :+ tieCol).map(col): _*)
      .withColumn("__opens", opens)
      .where(col("__opens"))
    val w2 = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    kept.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCol +: attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
