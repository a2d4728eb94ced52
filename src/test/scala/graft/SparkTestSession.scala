package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object SparkTestSession {
  lazy val get: SparkSession = Tables.session("graft-test", "4")
}
