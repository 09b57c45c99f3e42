package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.aggPricingSummary(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Joins.queries ++ ops.Windows.queries ++
      ops.Functions.queries ++ ops.TimeSeries.queries ++ ops.Forecast.queries ++
      ops.TextDedup.queries ++ ops.Streaming.queries ++ ops.Extensions.queries ++
      ops.Scale.queries ++ ops.Pipeline.queries ++ ops.Bpe.queries ++
      ops.Graph.queries ++ ops.Curation.queries ++ ops.Lifecycle.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.Joins.oracle ++ ops.Windows.oracle ++
      ops.Functions.oracle ++ ops.TimeSeries.oracle ++ ops.Forecast.oracle ++
      ops.TextDedup.oracle ++ ops.Streaming.oracle ++ ops.Extensions.oracle ++
      ops.Scale.oracle ++ ops.Pipeline.oracle ++ ops.Bpe.oracle ++
      ops.Graph.oracle ++ ops.Curation.oracle ++ ops.Lifecycle.oracle
}
