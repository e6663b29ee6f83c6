package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingestion with the reference's exact semantics (SURVEY §2.1 S1):
  * externally-declared schema (never inferSchema — reference hard-codes
  * the column list), `'?'` → null (`na_values='?'`), and leading-space
  * stripping (the `sep=', '` regex separator at naive-suppresion.py:14 is
  * comma + skipinitialspace in disguise).
  *
  * Scale: a declared schema keeps the read single-pass (inference would
  * scan twice); CSV scans parallelize per file split. Column pruning
  * reaches the parser (Spark's CSV reader parses only projected columns);
  * prefer converting to parquet at the lake boundary regardless.
  */
object CsvSource {

  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("nullValue", "?")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .csv(path)

  /** Write with the matching conventions so a round-trip is lossless
    * (S5 — the sink the reference lacks). */
  def write(df: DataFrame, path: String, header: Boolean = false): Unit =
    df.write
      .mode("overwrite")
      .option("header", header.toString)
      .option("nullValue", "?")
      .csv(path)
}
