package graft.sinks

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Crash-safe tmp→store swap for append-only parquet stores compacted in place
 * (the [[graft.streaming.IncrementalCC]] label store, the [[graft.streaming.GroupingSetsMv]]
 * version store — any "per-batch part files + underscore markers" directory).
 *
 * Protocol (single-writer discipline, as documented on the stores):
 *   1. the caller writes the full rewrite under `<store>/_compact_tmp` (a Spark
 *      parquet write — `_SUCCESS` lands last);
 *   2. [[commitSwap]] records a `_MANIFEST` inside the tmp: the rename plan
 *      (tmp file → unique target name) plus the EXACT pre-existing data files to
 *      delete;
 *   3. the manifest executes rename-first: new files move to their unique targets,
 *      THEN the listed old files are deleted, then the tmp is dropped.
 *
 * Every crash point replays safely through [[finishSwap]] (run on every store read):
 *   - no manifest yet → nothing destructive has happened (the manifest is written
 *     only after the tmp parquet completes) → discard the tmp; old data intact;
 *   - crash mid-rename → rename is atomic, so each entry's src and dst never both
 *     exist; re-execution skips done entries (src gone) and finishes the rest;
 *   - crash mid-delete → deletes are by explicit manifest name, idempotent, and can
 *     never hit this swap's own new files (targets are unique per swap — part-file
 *     names carry a fresh write UUID);
 *   - crash before the final tmp drop with everything else done (the ADVICE r9 #1
 *     window: a tmp holding only `_SUCCESS`) → the manifest (or the legacy
 *     zero-parquet rule below) replays as no-ops and the tmp is dropped — the store
 *     is NEVER emptied.
 *
 * Legacy (pre-manifest) tmps — a crash under the old delete-old-then-rename-in
 * ordering, then an upgrade — are disambiguated conservatively: a complete tmp
 * (`_SUCCESS`) that still HOLDS parquet files is the old mid-swap window and the tmp
 * is the authoritative full rewrite (finish old-style); a complete tmp with ZERO
 * parquet files means the swap already finished and only the tmp drop was lost —
 * delete the tmp only, never the data files.
 */
object AtomicSwap {
  val TmpName = "_compact_tmp"
  val ManifestName = "_MANIFEST"

  /** The store's current top-level data files (non-underscore, non-dot). */
  def dataFileNames(fs: FileSystem, store: Path): Seq[String] =
    fs.listStatus(store).toSeq.collect {
      case s if s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".") => s.getPath.getName
    }

  /** Step 2+3: given a COMPLETE rewrite under `<store>/_compact_tmp`, record the
    * swap manifest and execute it. */
  def commitSwap(fs: FileSystem, store: Path): Unit = {
    val tmp = new Path(store, TmpName)
    val olds = dataFileNames(fs, store)
    val news = fs.listStatus(tmp).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).sorted
      .zipWithIndex.map { case (n, i) => (n, s"compact-$i-$n") }
    val body = (news.map { case (src, dst) => s"MV $src $dst" } ++
      olds.map(n => s"RM $n")).mkString("", "\n", "\n")
    val out = fs.create(new Path(tmp, ManifestName), true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    finishSwap(fs, store)
  }

  /** Recovery + completion: execute (or re-execute) whatever swap state the store's
    * tmp dir is in. No-op when no tmp exists. Safe to run on every read. */
  def finishSwap(fs: FileSystem, store: Path): Unit = {
    val tmp = new Path(store, TmpName)
    if (!fs.exists(tmp)) return
    val mf = new Path(tmp, ManifestName)
    if (fs.exists(mf)) {
      val lines = readLines(fs, mf)
      lines.collect { case l if l.startsWith("MV ") =>
        val Array(src, dst) = l.drop(3).split(" ", 2)
        val s = new Path(tmp, src)
        if (fs.exists(s)) fs.rename(s, new Path(store, dst)): Unit
      }
      lines.collect { case l if l.startsWith("RM ") =>
        val f = new Path(store, l.drop(3))
        if (fs.exists(f)) fs.delete(f, false): Unit
      }
      fs.delete(tmp, true): Unit
    } else if (fs.exists(new Path(tmp, "_SUCCESS"))) {
      val parquets = fs.listStatus(tmp)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      if (parquets.isEmpty) {
        // already-finished legacy swap: only the tmp drop was lost. Deleting data
        // files here was the ADVICE r9 #1 silent-empty bug — drop the tmp ONLY.
        fs.delete(tmp, true): Unit
      } else {
        // legacy mid-swap: the tmp holds the authoritative full rewrite
        dataFileNames(fs, store).foreach(n => fs.delete(new Path(store, n), false))
        parquets.sortBy(_.getPath.getName).zipWithIndex.foreach { case (s, i) =>
          fs.rename(s.getPath, new Path(store, s"compact-$i-${s.getPath.getName}")): Unit
        }
        fs.delete(tmp, true): Unit
      }
    } else fs.delete(tmp, true): Unit
  }

  private def readLines(fs: FileSystem, f: Path): Seq[String] = {
    val in = fs.open(f)
    try {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
      Iterator.continually(r.readLine()).takeWhile(_ != null).filter(_.nonEmpty).toList
    } finally in.close()
  }
}
