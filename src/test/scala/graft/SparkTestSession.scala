package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object SparkTestSession {
  lazy val get: SparkSession = Tables.session("graft-test", "4")

  /** All test scratch lives under target/test-tmp — wiped by `sbt
    * clean`, ignored by git, never in /tmp (a long host session used
    * to accumulate graft_* dirs there across suite runs). */
  private lazy val base: java.nio.file.Path = {
    val p = java.nio.file.Paths.get("target", "test-tmp")
    java.nio.file.Files.createDirectories(p)
    p
  }
  def tmpDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(base, prefix)
  def tmpFile(prefix: String, suffix: String): java.nio.file.Path =
    java.nio.file.Files.createTempFile(base, prefix, suffix)
  def tmpIoFile(prefix: String, suffix: String): java.io.File =
    tmpFile(prefix, suffix).toFile
}
