package graft

import graft.ops.KAnonymity
import graft.queries.{AnonymityQueries, CurationQueries, MlQueries, RelationalQueries, StatsQueries, TextQueries, VectorEventQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-area registries; every entry that is
  * SQL-expressible has a DuckDB oracle in `oracleSql` with identical column
  * names and ordering.
  */
object SparkEntry {

  /** Flagship: the reference's E1 pipeline shape (k-anonymity suppression
    * then group-size audit) on sf0.001 orders. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    KAnonymity.groupSizes(
      KAnonymity.suppress(o, Seq("o_orderstatus", "o_orderpriority"), 3),
      Seq("o_orderstatus", "o_orderpriority"))
  }

  private val registries: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracles),
      (AnonymityQueries.queries, AnonymityQueries.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (VectorEventQueries.queries, VectorEventQueries.oracles),
      (MlQueries.queries, MlQueries.oracles),
      (StatsQueries.queries, StatsQueries.oracles),
      (CurationQueries.queries, CurationQueries.oracles))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    registries.map(_._2).reduce(_ ++ _)
}
