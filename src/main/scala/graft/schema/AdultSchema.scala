package graft.schema

import graft.sources.CsvSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The UCI Adult census schema — the reference's only dataset, declared
  * exactly as its hard-coded column list (naive-suppresion.py:7-11,
  * identical at t-closeness.py:9-13, clustering-anon.py:12-16). Types are
  * EXPLICIT (never inferSchema — SURVEY §1): ints for the numeric columns,
  * nullable strings elsewhere; '?' parses to null via CsvSource.
  */
object AdultSchema {

  val schema: StructType = StructType(Seq(
    StructField("age", IntegerType),
    StructField("workclass", StringType),
    StructField("fnlwgt", IntegerType),
    StructField("education", StringType),
    StructField("education_num", IntegerType),
    StructField("marital_status", StringType),
    StructField("occupation", StringType),
    StructField("relationship", StringType),
    StructField("race", StringType),
    StructField("sex", StringType),
    StructField("capital_gain", IntegerType),
    StructField("capital_loss", IntegerType),
    StructField("hours_per_week", IntegerType),
    StructField("native_country", StringType),
    StructField("income", StringType)))

  /** The 10-column QI set of E1/E3 (naive-suppresion.py:29,
    * t-closeness.py:26). */
  val quasiIdentifiers: Seq[String] = Seq(
    "age", "workclass", "education", "marital_status", "occupation",
    "race", "sex", "native_country", "capital_gain", "capital_loss")

  /** The archived audit's 8-QI subset (Archived/data-anonymity.py:28-37). */
  val auditQuasiIdentifiers: Seq[String] =
    quasiIdentifiers.filterNot(Set("capital_gain", "capital_loss"))

  val sensitiveAttribute = "income"

  /** S1+S2: declared-schema CSV load with '?'→null and leading-space
    * stripping, then the reference's unconditional null-row drop. */
  def load(spark: SparkSession, path: String): DataFrame =
    CsvSource.read(spark, path, schema).na.drop("any")
}
