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

  /** DuckDB-equivalent SQL for every SQL-expressible query; keys absent
    * here (d02/d03/d04/d11/d13) run under the driver's rows-only check —
    * xxhash64-seeded LSH/sketch paths and the driver-side k-means state,
    * whose exact outputs DuckDB cannot replay (the polynomial twins
    * d24/d27 and d23 oracle-prove the same algorithms). */
  def oracleSql: Map[String, String] =
    (SlurmQueries.oracles ++ RelationalQueries.oracles ++ PipelineQueries.oracles)
      .view.mapValues(graft.functions.OracleSql.fixRounds).toMap
}
