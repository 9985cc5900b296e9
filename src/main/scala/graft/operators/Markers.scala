package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Commit-marker tokens for the persisted-artifact lifecycle (r15,
  * ADVICE r14): every index commit writes a MONOTONIC UNIQUE token into
  * its `_DONE` marker's CONTENTS, and every commit-state memo keys off
  * that token instead of the marker's modification time. Mtime keying
  * is unsound on filesystems with coarse timestamp granularity (1 s on
  * several object-store/HDFS-compat layers): two mutations landing in
  * one tick leave a stale memoized row/match count that silently
  * mis-prices probe widths and brute-vs-probed branches. The token is
  * `nanotime_counter_uuid` — unique across processes (UUID), ordered
  * within one (nanotime+counter) — so any recreate changes the key even
  * when the clock does not move.
  *
  * Legacy markers (written empty before r15) fall back to the mtime in
  * [[token]], so an existing deployment's indexes stay readable and
  * upgrade to token keying at their next mutation.
  */
object Markers {
  private val ctr = new java.util.concurrent.atomic.AtomicLong()

  private def freshToken(): String =
    s"${System.nanoTime()}_${ctr.incrementAndGet()}_${java.util.UUID.randomUUID()}"

  /** Create (or recreate) the commit marker at `p` bearing a fresh
    * unique token — the one write every build/extend/compact/forget/
    * retrain commit path runs. Overwrites: the marker's job is to
    * CHANGE on every commit.
    */
  def commit(fs: FileSystem, p: Path): Unit = {
    val out = fs.create(p, true)
    try out.write(freshToken().getBytes("UTF-8")) finally out.close()
  }

  /** The marker's commit token: its contents when non-empty (r15+
    * markers), the mtime for legacy empty markers, `"absent"` when the
    * marker does not exist — three disjoint ranges, so a memo keyed on
    * this can never confuse the states.
    */
  def token(fs: FileSystem, p: Path): String =
    if (!fs.exists(p)) "absent"
    else {
      val st = fs.getFileStatus(p)
      if (st.getLen == 0) s"mtime:${st.getModificationTime}"
      else {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      }
    }
}
