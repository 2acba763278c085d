package graft.sinks

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/**
 * K6: run-artifact lifecycle for the MySQL schema-history file (`schema_history.jsonl`).
 * The reference uploads/downloads it through the platform artifact store and hard-errors
 * when it is missing or older than 14 days on a non-initial run
 * (`ex_mysql_cdc/src/component.py:307-323,515-521`; `db_common/artefacts.py:27-83`).
 * Here the store is a directory (in production: object storage) — same contract.
 */
class ArtifactStore(storeDir: String, maxAgeDays: Int = ArtifactStore.DefaultMaxAgeDays) {

  private def target(name: String): Path = Paths.get(storeDir, name)

  /** Upload after a successful run. */
  def save(localFile: String, name: String): Unit = {
    Files.createDirectories(Paths.get(storeDir))
    Files.copy(Paths.get(localFile), target(name), StandardCopyOption.REPLACE_EXISTING)
  }

  /**
   * Restore before a run. On a non-initial run a missing or expired artifact is a hard
   * error — resuming a binlog stream without its schema history corrupts decoding
   * (`ex_mysql_cdc/src/component.py:318-323`).
   */
  def restore(name: String, localFile: String, isInitialRun: Boolean): Boolean = {
    val t = target(name)
    if (!Files.exists(t)) {
      if (isInitialRun) false
      else throw new IllegalStateException(
        s"artifact $name not found and this is not an initial run")
    } else {
      val ageMs = System.currentTimeMillis() - Files.getLastModifiedTime(t).toMillis
      if (ageMs > maxAgeDays.toLong * 24 * 3600 * 1000) {
        if (isInitialRun) false
        else throw new IllegalStateException(
          s"artifact $name is older than $maxAgeDays days; a new initial snapshot is required")
      } else {
        Files.createDirectories(Paths.get(localFile).toAbsolutePath.getParent)
        Files.copy(t, Paths.get(localFile), StandardCopyOption.REPLACE_EXISTING)
        true
      }
    }
  }
}

object ArtifactStore {
  /** Platform artifact retention window (reference error contract). */
  val DefaultMaxAgeDays = 14
}
