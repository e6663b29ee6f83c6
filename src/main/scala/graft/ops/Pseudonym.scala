package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed deterministic pseudonymization — the privacy-engineering step
  * between raw identifiers and analysis tables: replace identifier
  * columns with a keyed hash so the SAME input always maps to the SAME
  * pseudonym. Joins, group-bys, and distinct counts survive unchanged
  * (referential integrity across every table sharing the key), while
  * the raw identifier never appears downstream; rotating the key
  * unlinks all history at once.
  *
  * This is pseudonymization (GDPR art. 4(5) sense), NOT encryption or
  * anonymization: whoever holds the key can re-derive pseudonyms from
  * known identifiers (dictionary attack), and k-anonymity/DP concerns
  * about the REMAINING columns are untouched — compose with
  * [[KAnonymity]] / [[DifferentialPrivacy]] for those. The 60-bit hash
  * makes accidental collisions ~n²/2⁶¹ — negligible below ~10⁸ distinct
  * identifiers; use a longer HMAC in deployments past that.
  *
  * Scale: a pure codegen'd projection — zero shuffle, zero state. */
object Pseudonym {

  /** Replace each of `cols` with phash(key | value), as a long. Null
    * identifiers stay null (concat_ws would silently hash them to the
    * salt alone — a cross-record collision on "unknown"). */
  def pseudonymize(df: DataFrame, cols: Seq[String], key: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize: no columns given")
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(col(c).isNotNull,
        graft.functions.PortableHash.phash(
          concat_ws("|", lit(key), col(c).cast("string")))))
    }
  }
}
