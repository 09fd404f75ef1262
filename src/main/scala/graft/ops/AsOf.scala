package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators Spark's DataFrame API lacks as primitives:
 * as-of join (latest right row at-or-before each left row) and
 * interval×point range join. Both are built as EQUI-join/window shapes
 * so Catalyst picks hash/sort-merge physical plans — the naive
 * formulations (a `l.ts >= r.ts` theta-join, or `ts BETWEEN start AND
 * end`) degenerate to BroadcastNestedLoopJoin at scale.
 */
object AsOf {

  /**
   * As-of (backward) left join: for each left row, the single most
   * recent right row with `rightTs` &lt;= `leftTs` on the same `keys`
   * (DuckDB `ASOF LEFT JOIN` / kdb `aj` semantics). Right rows must be
   * unique per (keys, rightTs) for deterministic output — pre-aggregate
   * if not.
   *
   * Shape: union both sides tagged by origin, ONE shuffle on `keys`,
   * then a running `last(ignoreNulls)` over (ts, side) order carries the
   * latest right payload into each left row — a merge-scan with O(1)
   * state per key. A theta-join (`l.ts >= r.ts` + argmax) would be a
   * nested-loop plan AND re-shuffle per stage; this is one exchange and
   * one sort, and skewed keys degrade linearly, not quadratically.
   *
   * Output: every left column, then every non-key right column
   * (including `rightTs`), null when no right row precedes. Non-key
   * column names must not collide across the sides.
   *
   * `toleranceSec` bounds the lookback (kdb `aj` with a window /
   * pandas `merge_asof(tolerance=...)`): a match older than the
   * tolerance nulls out. The merge-scan shape is unchanged — the
   * latest-preceding right row is unique, so the bound is a post-scan
   * conditional on the carried payload, not a different join.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               toleranceSec: Option[Long] = None,
               direction: String = "backward"): DataFrame = {
    require(toleranceSec.forall(_ > 0),
      s"toleranceSec must be positive: $toleranceSec")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest: $direction")
    val rPay = right.columns.filterNot(keys.contains)
    val clash = rPay.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"asofJoin column collision: ${clash.mkString(", ")}")
    require(rPay.contains(rightTs), s"rightTs $rightTs must be a non-key right column")

    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rStruct = struct(rPay.map(col).toIndexedSeq: _*)
    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ats"), lit(1).as("__side"),
        lStruct.as("__l"),
        lit(null).cast(right.select(rPay.map(col).toIndexedSeq: _*).schema).as("__r")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ats"), lit(0).as("__side"),
        lit(null).cast(left.schema).as("__l"), rStruct.as("__r")): _*)
    val both = l2.unionByName(r2)

    // side 0 (right) sorts before side 1 (left) at equal ts in EITHER
    // traversal direction → the match is inclusive (rightTs == leftTs
    // qualifies), like DuckDB ASOF. backward scans time ascending and
    // carries the latest preceding right row; forward scans descending
    // and carries the earliest following one; nearest evaluates both
    // carries over the SAME exchange (one shuffle, two sorted passes)
    // and keeps the closer, ties to the earlier (backward) row.
    def carry(asc: Boolean): Column = {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(if (asc) col("__ats").asc else col("__ats").desc,
          col("__side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col("__r"), ignoreNulls = true).over(w)
    }
    def within(c: Column, tol: Long): Column = {
      val gap = abs(unix_micros(col("__ats")) -
        unix_micros(c.getField(rightTs)))
      when(gap <= tol * 1000000L, c)
    }
    val carried = direction match {
      case "backward" => both.withColumn("__c", carry(asc = true))
      case "forward"  => both.withColumn("__c", carry(asc = false))
      case "nearest" =>
        val gapOf = (c: Column) => abs(unix_micros(col("__ats")) -
          unix_micros(c.getField(rightTs)))
        both.withColumn("__cb", carry(asc = true))
          .withColumn("__cf", carry(asc = false))
          .withColumn("__c",
            when(col("__cf").isNull, col("__cb"))
              .when(col("__cb").isNull, col("__cf"))
              .when(gapOf(col("__cf")) < gapOf(col("__cb")), col("__cf"))
              .otherwise(col("__cb")))
          .drop("__cb", "__cf")
    }
    val filtered = carried.where(col("__side") === 1)
    val bounded = toleranceSec.foldLeft(filtered) { (df, tol) =>
      df.withColumn("__c", within(col("__c"), tol))
    }
    bounded.select((left.columns.map(n => col("__l").getField(n).as(n)) ++
      rPay.map(n => col("__c").getField(n).as(n))).toIndexedSeq: _*)
  }

  /**
   * Interval×point range join: right rows whose `tsCol` falls in the
   * half-open interval [`startCol`, `endCol`) of a left row, matched on
   * `keys`. Catalyst has no equi-join shape for a bare range predicate
   * and would pick BroadcastNestedLoopJoin; this implementation buckets
   * time into `bucketWidthSec`-wide cells, explodes each left interval
   * to the cells it covers (pick the width near the typical interval
   * length so that's 1-2 cells), maps each right row to its ONE cell,
   * and hash-joins on (keys, cell) before the exact range filter — the
   * standard binning rewrite that keeps 100 TB of events out of a
   * nested loop.
   *
   * Output: left columns then non-key right columns; names must not
   * collide. Empty intervals (start >= end) match nothing.
   */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                startCol: String, endCol: String, tsCol: String,
                bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    val clash = right.columns.filterNot(keys.contains).toSet
      .intersect(left.columns.toSet)
    require(clash.isEmpty, s"rangeJoin column collision: ${clash.mkString(", ")}")
    val w = bucketWidthSec * 1000000L
    // integer `div` (not double /): exact cell ids at any epoch value
    val lb = left
      .where(col(startCol) < col(endCol))
      .withColumn("__bkt", explode(sequence(
        expr(s"unix_micros($startCol) div ${w}L"),
        expr(s"(unix_micros($endCol) - 1) div ${w}L"))))
    val rb = right.withColumn("__bkt", expr(s"unix_micros($tsCol) div ${w}L"))
    // a right row lives in exactly ONE cell, so each (left, right) pair
    // joins at most once — no post-join distinct needed
    lb.join(rb, keys :+ "__bkt")
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bkt")
  }

  /**
   * Interval×interval overlap join: all (left, right) pairs whose
   * half-open intervals `[lStart, lEnd) ∩ [rStart, rEnd) ≠ ∅` on the
   * same keys — incident correlation, session-vs-outage attribution,
   * schedule conflicts.
   *
   * Scale shape extends [[rangeJoin]]'s time-chunk equi-join: BOTH
   * sides explode to the bucket cells they cover, the join is an
   * equi-join on (keys, cell) — never a theta join, so Catalyst plans
   * a hash/sort-merge join, not BNLJ — and the overlap predicate
   * filters inside the cell. A pair can share several cells; the
   * `cell == bucket(overlap start)` condition keeps exactly the one
   * cell containing max(lStart, rStart) (covered by both sides of any
   * overlapping pair by construction), so no post-join distinct and
   * no row multiplication. Row fan-out is interval length / bucket
   * width — size `bucketWidthSec` to the TYPICAL interval as in
   * [[rangeJoin]].
   */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          keys: Seq[String],
                          lStartCol: String, lEndCol: String,
                          rStartCol: String, rEndCol: String,
                          bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    val clash = right.columns.filterNot(keys.contains).toSet
      .intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"intervalOverlapJoin column collision: ${clash.mkString(", ")}")
    val w = bucketWidthSec * 1000000L
    val lb = left
      .where(col(lStartCol) < col(lEndCol))
      .withColumn("__bkt", explode(sequence(
        expr(s"unix_micros($lStartCol) div ${w}L"),
        expr(s"(unix_micros($lEndCol) - 1) div ${w}L"))))
    val rb = right
      .where(col(rStartCol) < col(rEndCol))
      .withColumn("__bkt", explode(sequence(
        expr(s"unix_micros($rStartCol) div ${w}L"),
        expr(s"(unix_micros($rEndCol) - 1) div ${w}L"))))
    lb.join(rb, keys :+ "__bkt")
      .where(col(lStartCol) < col(rEndCol) &&
        col(rStartCol) < col(lEndCol) &&
        col("__bkt") === expr(
          s"greatest(unix_micros($lStartCol), unix_micros($rStartCol)) div ${w}L"))
      .drop("__bkt")
  }
}
