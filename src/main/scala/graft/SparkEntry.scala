package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The corpus-cleaning pipeline is the engine's signature composition:
    * quality filter -> exact dedup -> near-dup removal -> stats.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.CorpusPipeline.p01_corpus_clean(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.Relational2.queries ++
      operators.Relational3.queries ++ operators.Relational4.queries ++
      operators.Relational5.queries ++ operators.Relational6.queries ++
      operators.Relational7.queries ++ operators.Relational8.queries ++
      operators.Relational9.queries ++
      operators.Relational10.queries ++ operators.Relational11.queries ++
      operators.Relational12.queries ++ operators.Relational13.queries ++
      operators.Relational14.queries ++
      operators.Dedup.queries ++ operators.Dedup2.queries ++ operators.Dedup3.queries ++
      operators.Dedup4.queries ++ operators.Dedup5.queries ++
      operators.Similarity.queries ++ operators.Similarity2.queries ++
      operators.Similarity3.queries ++
      operators.TextAnalysis.queries ++ operators.TextAnalysis2.queries ++
      operators.TextAnalysis3.queries ++ operators.TextAnalysis4.queries ++
      operators.TextAnalysis5.queries ++ operators.TextAnalysis6.queries ++
      operators.TextAnalysis7.queries ++ operators.TextAnalysis8.queries ++
      operators.TextAnalysis9.queries ++ operators.TextAnalysis10.queries ++
      operators.TextAnalysis11.queries ++ operators.TextAnalysis12.queries ++
      operators.Graph.queries ++ operators.Graph2.queries ++
      operators.Multimodal2.queries ++ operators.Multimodal3.queries ++
      operators.Events.queries ++ operators.Events2.queries ++
      operators.Events3.queries ++ operators.Events4.queries ++
      operators.Events5.queries ++ operators.Events6.queries ++
      operators.Events7.queries ++ operators.Events8.queries ++
      operators.Events9.queries ++
      operators.CorpusPipeline.queries ++ operators.Quality.queries ++
      operators.Quality2.queries ++ operators.Quality3.queries ++
      operators.Quality4.queries ++ operators.MLPrep.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.Relational2.oracles ++
      operators.Relational3.oracles ++ operators.Relational4.oracles ++
      operators.Relational5.oracles ++ operators.Relational6.oracles ++
      operators.Relational7.oracles ++ operators.Relational8.oracles ++
      operators.Relational9.oracles ++
      operators.Relational10.oracles ++ operators.Relational11.oracles ++
      operators.Relational12.oracles ++ operators.Relational13.oracles ++
      operators.Relational14.oracles ++
      operators.Dedup.oracles ++ operators.Dedup2.oracles ++ operators.Dedup3.oracles ++
      operators.Dedup4.oracles ++ operators.Dedup5.oracles ++
      operators.Similarity.oracles ++ operators.Similarity2.oracles ++
      operators.Similarity3.oracles ++
      operators.TextAnalysis.oracles ++ operators.TextAnalysis2.oracles ++
      operators.TextAnalysis3.oracles ++ operators.TextAnalysis4.oracles ++
      operators.TextAnalysis5.oracles ++ operators.TextAnalysis6.oracles ++
      operators.TextAnalysis7.oracles ++ operators.TextAnalysis8.oracles ++
      operators.TextAnalysis9.oracles ++ operators.TextAnalysis10.oracles ++
      operators.TextAnalysis11.oracles ++ operators.TextAnalysis12.oracles ++
      operators.Graph.oracles ++ operators.Graph2.oracles ++
      operators.Multimodal2.oracles ++ operators.Multimodal3.oracles ++
      operators.Events.oracles ++ operators.Events2.oracles ++
      operators.Events3.oracles ++ operators.Events4.oracles ++
      operators.Events5.oracles ++ operators.Events6.oracles ++
      operators.Events7.oracles ++ operators.Events8.oracles ++
      operators.Events9.oracles ++
      operators.CorpusPipeline.oracles ++ operators.Quality.oracles ++
      operators.Quality2.oracles ++ operators.Quality3.oracles ++
      operators.Quality4.oracles ++ operators.MLPrep.oracles
}
