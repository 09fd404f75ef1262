package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared deterministic hashing helpers for sampling/ordering. */
object Hashing {

  private val M = 1000000007L
  // 2654435761 mod M — reduced up front so the product below stays
  // < 2^60 for ANY 64-bit id
  private val C = 654435747L

  /**
   * Overflow-safe multiplicative id hash `(id · 2654435761) mod 1e9+7`,
   * computed as `((id mod M) · (C mod M)) mod M` — identical values
   * (modular arithmetic), but no 64-bit wraparound: a raw
   * `id * 2654435761` overflows Long for ids above ~3.4e9, which under
   * Spark's default ANSI mode is a runtime ArithmeticException and with
   * ANSI off silently skews the hash sign/distribution. The DuckDB
   * oracles keep the plain `(id*2654435761)%1000000007` form, which is
   * value-equal at oracle scales (DuckDB raises on overflow rather than
   * wrapping, so the forms can only ever agree or fail loudly).
   */
  def mulHash(id: Column): Column =
    (pmod(id.cast(LongType), lit(M)) * lit(C)) % lit(M)
}
