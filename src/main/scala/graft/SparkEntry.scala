package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every operator pack's named queries; `oracleSql`
  * carries the DuckDB-equivalent SQL for each hash-compared entry. Column
  * names/aliases match between the Spark result and the oracle, every
  * oracle-checked query ends in a total ORDER BY, and float aggregates use
  * the exact-decimal construction (see graft.ops.Tables) so results are
  * bit-identical across engines.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q03TopOrders(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.RelationalExt.queries ++ ops.Events.queries ++
      ops.Dedup.queries ++ ops.Similarity.queries ++ ops.TextAnalysis.queries ++
      ops.Multimodal.queries ++ ops.HubQueries.queries ++ ops.Pipeline.queries ++
      ops.JoinShapes.queries ++ ops.Corpus.queries ++ ops.SqlSurface.queries ++
      ops.Layout.queries ++ ops.Winnow.queries ++ ops.Checks.queries ++
      ops.FuzzyJoin.queries ++ ops.Graph.queries ++ ops.BpeTrain.queries ++
      ops.EmbedStats.queries ++ ops.Sketches.queries ++ ops.SemiStructured.queries ++
      ops.HtmlExtract.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.RelationalExt.oracle ++ ops.Events.oracle ++
      ops.Dedup.oracle ++ ops.Similarity.oracle ++ ops.TextAnalysis.oracle ++
      ops.Multimodal.oracle ++ ops.HubQueries.oracle ++ ops.Pipeline.oracle ++
      ops.JoinShapes.oracle ++ ops.Corpus.oracle ++ ops.SqlSurface.oracle ++
      ops.Layout.oracle ++ ops.Winnow.oracle ++ ops.Checks.oracle ++
      ops.FuzzyJoin.oracle ++ ops.Graph.oracle ++ ops.BpeTrain.oracle ++
      ops.EmbedStats.oracle ++ ops.Sketches.oracle ++ ops.SemiStructured.oracle ++
      ops.HtmlExtract.oracle
}
