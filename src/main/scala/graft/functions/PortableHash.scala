package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing used by the dedup / fingerprint /
  * DP operators so every hashed result can be cross-checked by an external
  * SQL oracle (DuckDB computes the identical value via
  * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`).
  *
  * 60 bits (15 hex chars of md5) keeps the value positive in a signed long
  * on every engine. Spark's own `hash()`/`xxhash64` are faster but
  * implementation-defined; use them when portability doesn't matter.
  *
  * Scale: md5 is a codegen'd native expression — per-row CPU only, no
  * shuffle, stays inside WholeStageCodegen.
  */
object PortableHash {
  /** Mersenne prime 2^31-1: modulus for the universal-hash family. */
  val P: Long = 2147483647L

  /** 60-bit portable hash of any column (cast to string first). */
  def phash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** phash reduced into the [0, P) universal-hash domain. */
  def phashMod(c: Column): Column = pmod(phash(c), lit(P))

  /** Portable uniform in (0,1): (phash % 1e6 + 0.5) / 1e6 — never exactly
    * 0 or 1, so inverse-CDF transforms are total. */
  def puniform(c: Column): Column =
    (pmod(phash(c), lit(1000000L)) + lit(0.5)) / lit(1000000.0)
}
