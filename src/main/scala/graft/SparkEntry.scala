package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Bpe, Dedup, Events, Multimodal, Pipeline, Sampling, Similarity, TextAnalysis}
import graft.queries.{CoreQueries, ExtendedQueries, MutationQueries, StreamQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The multi-way join + agg is the reference's headline analytics
    * pattern (reference README.md:48). */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q11MultiJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data pipeline operators (dedup, similarity, text analysis,
    * multimodal, events). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ ExtendedQueries.all ++ MutationQueries.all ++ StreamQueries.all ++ Dedup.queries ++ Similarity.queries ++
      TextAnalysis.queries ++ Multimodal.queries ++ Events.queries ++ Pipeline.queries ++
      Sampling.queries ++ Bpe.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ ExtendedQueries.oracles ++ MutationQueries.oracles ++ StreamQueries.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      TextAnalysis.oracles ++ Multimodal.oracles ++ Events.oracles ++ Pipeline.oracles ++
      Sampling.oracles ++ Bpe.oracles
}
