package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-domain registries; each entry is
  * one implemented operator from SURVEY.md §2b, and each
  * oracle-expressible one carries its DuckDB-SQL twin in `oracleSql`.
  */
object SparkEntry {

  private def registry: Seq[Q] =
    graft.queries.RelationalQueries.all ++
      graft.queries.FlagshipQueries.all ++
      graft.queries.JoinQueries.all ++
      graft.queries.AggregateQueries.all ++
      graft.queries.WindowQueries.all ++
      graft.queries.SortSetQueries.all ++
      graft.queries.FunctionQueries.all ++
      graft.queries.SourceQueries.all ++
      graft.queries.StreamingQueries.all ++
      graft.queries.TextQueries.all ++
      graft.queries.SimilarityQueries.all ++
      graft.queries.MultimodalQueries.all ++
      graft.queries.PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.RelationalQueries.q1PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val r = registry
    // A duplicate name would last-win through toMap, silently dropping
    // a query from Bench/Verify/ScaleSpot while the oracle compare
    // still passes on the shrunken key set — fail loudly instead.
    val dups = r.groupBy(_.name).collect { case (n, qs) if qs.length > 1 => n }
    require(dups.isEmpty, s"duplicate query names in the registry: ${dups.mkString(", ")}")
    r.map(q => q.name -> q.fn).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
