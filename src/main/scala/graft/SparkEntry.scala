package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{PipelineQueries, RelationalQueries, SlurmQueries}

/** Driver contract — see SURVEY.md §2 for the inventory behind each
  * query key and §5 for the oracle mechanics. */
object SparkEntry {

  /** Flagship: the full sacct→typed-slurm-table ingest (SURVEY §2.2 #15)
    * on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SlurmQueries.queries("s15_sacct_ingest")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SlurmQueries.queries ++ RelationalQueries.queries ++ PipelineQueries.queries

  /** DuckDB-equivalent SQL for every query — since r6 every key is
    * hash-gated: the xxhash64-seeded paths (d02/d03/d04/d11) carry
    * in-plan verdict columns pinned to their oracle-proven polynomial
    * twins (d24/d27/d53/d23), the d13/d41/d42 pattern, so DuckDB
    * replays the oracle-computable columns plus literal-true verdicts
    * and any divergence breaks the hash. */
  def oracleSql: Map[String, String] =
    (SlurmQueries.oracles ++ RelationalQueries.oracles ++ PipelineQueries.oracles)
      .view.mapValues(graft.functions.OracleSql.fixRounds).toMap
}
