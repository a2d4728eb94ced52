package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction for partition-dir parquet warehouses.
  *
  * Incremental loads accrete files: every
  * [[graft.slurm.SlurmWarehouse.resumeAppend]] / HistoryCollector
  * batch writes ≥ 1 file into each day partition it touches, so a
  * year of daily loads leaves O(days × batches) files. At 100 TB the
  * bottleneck this creates is not data volume but FILE COUNT — driver
  * memory for scan file listings, a scheduler task per file, parquet
  * footer reads per file — the classic small-files wall. The fix is a
  * periodic layout-only rewrite: bin-pack each partition back to
  * ⌈bytes / targetBytes⌉ files, restoring the within-partition sort
  * the write layout promises (min/max page pruning works only when
  * each file covers a tight sort range; accreted batch files overlap).
  *
  * Query results are unchanged by construction (same rows, same
  * schema — spec-pinned); only the file layout changes. Each
  * partition compacts independently (the loop is per-partition;
  * each rewrite is a distributed job), and the swap is
  * rename-based: new files land in a temp dir, the old dir moves
  * aside, the temp dir moves in, the old dir is deleted — a crash
  * leaves either the old or the new layout live, never a mix and
  * never a hole. A compaction scheduled off-peak (the reference's
  * sqlite VACUUM analog, slurm2sql.py's load loop has no equivalent
  * because SQLite is one file) keeps steady-state scans at
  * target-size files forever.
  */
object Compaction {

  /** One partition's before/after file counts. */
  final case class Stats(partition: String, filesBefore: Int,
                         filesAfter: Int, bytes: Long)

  /** Compact every `partCol=value` directory under `tableDir` whose
    * file count exceeds `minFiles`, rewriting it as
    * max(1, ⌈bytes / targetBytes⌉) files sorted by `sortCols`.
    * Returns per-partition stats for the partitions rewritten. */
  def compact(spark: SparkSession, tableDir: String, partCol: String,
              sortCols: Seq[String], targetBytes: Long = 128L << 20,
              minFiles: Int = 4): Seq[Stats] = {
    val root = new Path(tableDir)
    // per-path FS resolution: FileSystem.get(conf) binds to
    // fs.defaultFS, which is the WRONG filesystem for a file:/// or
    // s3a:// warehouse on an hdfs-default cluster
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    // crash recovery BEFORE compacting: a .compact_bak_* dir whose
    // visible partition is missing means a previous run died between
    // rename(dir→bak) and rename(tmp→dir) — every reader ignores
    // dot-dirs, so without this restore the partition is silently
    // invisible until the same partition happens to recompact. Restore
    // completes the documented either-old-or-new invariant. Orphan tmp
    // dirs are partial writes: always safe to drop.
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath).foreach { d =>
      if (d.getName.startsWith(".compact_bak_")) {
        val visible = new Path(root, d.getName.stripPrefix(".compact_bak_"))
        if (!fs.exists(visible)) {
          if (!fs.rename(d, visible))
            sys.error(s"compact: cannot restore $d to $visible")
        } else
          // the swap completed but the JVM died before the cleanup
          // delete: the bak is a full dead copy of the partition —
          // drop it now rather than waiting for the partition to
          // happen to recompact
          fs.delete(d, true)
      } else if (d.getName.startsWith(".compact_tmp_")) fs.delete(d, true)
    }
    val parts = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith(partCol + "="))
    parts.toSeq.flatMap { dir =>
      val files = fs.listStatus(dir).filter(s => s.isFile &&
        !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
      val bytes = files.map(_.getLen).sum
      if (files.length <= minFiles) None
      else {
        val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        val tmp = new Path(root, s".compact_tmp_${dir.getName}")
        val bak = new Path(root, s".compact_bak_${dir.getName}")
        fs.delete(tmp, true); fs.delete(bak, true)
        // repartitionByRange, NOT round-robin repartition: the write
        // layout (SlurmWarehouse range-partitions on its sort keys)
        // gives each file a disjoint key span so min/max footer stats
        // prune whole files; a round-robin rewrite would make every
        // file span the full key range and a point-filter scan would
        // read all n files instead of ~1.
        val keyed =
          if (sortCols.isEmpty) spark.read.parquet(dir.toString).repartition(n)
          else spark.read.parquet(dir.toString)
            .repartitionByRange(n, sortCols.map(col): _*)
        keyed
          .sortWithinPartitions(sortCols.map(col): _*)
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        // drop the _SUCCESS marker so the dir looks like any other
        // partition dir to a recursive lister
        fs.delete(new Path(tmp, "_SUCCESS"), false)
        // range partitions with no rows write no file, so the actual
        // file count can be < n (tiny partitions, few distinct keys) —
        // report what landed, not what was requested
        val written = fs.listStatus(tmp).count(s => s.isFile &&
          !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
        // rename-based swap: old aside, new in, old gone
        if (!fs.rename(dir, bak))
          sys.error(s"compact: cannot move $dir aside")
        if (!fs.rename(tmp, dir)) {
          fs.rename(bak, dir) // roll back — old layout stays live
          sys.error(s"compact: cannot move $tmp into place")
        }
        fs.delete(bak, true)
        Some(Stats(dir.getName, files.length, written, bytes))
      }
    }
  }
}
