package graft.sinks

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/**
 * Driver-side parquet footer reads — row counts without a Spark job.
 *
 * Every incremental store used to finish `applyBatch` with
 * `spark.read.parquet(justWritten).count()` purely to return the row count: one more
 * full job (schema inference + scan task + result collection) per micro-batch, on
 * data whose exact row count the parquet FOOTERS already carry. At a 3–12-batch
 * bench query that is 3–12 pure-overhead jobs (guide §1.2: don't compute things you
 * throw away; §5: the driver should do almost no data work — an O(#files) footer
 * read is metadata, not data). Recursion covers partitioned layouts
 * (`cell=<k>/part-*.parquet`); `_*`/`.*` sidecar files are skipped.
 */
object ParquetMeta {

  /** Sum of footer row counts of every data file under `dir`. A MISSING directory
    * throws (ADVICE r13 #5): every caller invokes this right after a successful
    * write, so an absent path means the write silently produced nothing (or the
    * paths diverged) — reporting 0 rows applied would hide a broken batch. */
  def rowCount(conf: Configuration, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) throw new IllegalStateException(
      s"ParquetMeta.rowCount: $dir does not exist — callers count rows of a " +
        "just-written store wave, so an absent path is a failed or misrouted write")
    def walk(d: Path): Long =
      fs.listStatus(d).iterator.map { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) 0L
        else if (st.isDirectory) walk(st.getPath)
        else {
          val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
          try r.getRecordCount finally r.close()
        }
      }.sum
    walk(p)
  }
}
