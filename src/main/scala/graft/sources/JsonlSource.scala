package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the de-facto interchange format for training
  * corpora (one JSON document per line). Spark's json reader/writer
  * handles it natively; the points of discipline here:
  *
  *  - ALWAYS pin the schema on read. Schema inference samples the data
  *    (an extra pass over 100 TB) and can widen/narrow types between
  *    runs; a pinned StructType makes reads one-pass and stable.
  *  - JSONL is line-splittable, so a 100 TB directory parallelizes by
  *    byte ranges like CSV; compressed variants should use a splittable
  *    codec or many files.
  *  - Corrupt lines land in the permissive-mode corrupt-record column
  *    instead of failing the job; callers filter/quarantine them.
  */
object JsonlSource {

  val CorruptCol = "_corrupt_record"

  /** Write one JSON object per line (overwrite). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read with a pinned schema; malformed lines are kept in
    * [[CorruptCol]] (add it to the schema to inspect them). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
}
