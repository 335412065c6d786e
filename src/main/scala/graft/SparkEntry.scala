package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a named
  * query; `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * correctness gate (column names are aligned on both sides — the compare
  * sorts columns by name before hashing).
  */
object SparkEntry {

  private val modules: Seq[Q] =
    operators.Relational.all ++
      operators.RelationalSql.all ++
      operators.Scalars.all ++
      operators.Scalars2.all ++
      operators.TimeWindows.all ++
      operators.DedupOps.all ++
      operators.SimilarityOps.all ++
      operators.TextOps.all ++
      operators.Multimodal.all ++
      operators.LookupJoin.all ++
      operators.SkewOps.all ++
      cep.CepOps.all ++
      streaming.StreamingOps.all ++
      streaming.StatefulOps.all ++
      dsl.DslOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.qAggQ1.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
