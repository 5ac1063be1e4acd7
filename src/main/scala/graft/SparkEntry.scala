package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's `QueryDef`s into the
  * queries/oracleSql maps the driver consumes.
  */
object SparkEntry {

  /** All engine capabilities, one QueryDef per SURVEY.md §2 row. */
  def allDefs: Seq[QueryDef] =
    operators.Relational.defs ++ operators.CryptoQueries.defs ++
      operators.Dedup.defs ++ operators.TextAnalysis.defs ++
      operators.Similarity.defs ++ operators.Multimodal.defs ++
      operators.SemiStructured.defs ++ operators.Corpus.defs ++
      operators.Behavioral.defs ++
      operators.ScaleOps.defs ++ operators.Advanced.defs ++
      operators.RobustStats.defs ++
      operators.Maintenance.defs ++ streaming.Streaming.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_multijoin")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
