package graft.ops

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared machinery for offline derived artifacts (IVF quantizer centroids,
  * dedup cluster assignments): content-fingerprinted, atomically published
  * parquet directories under target/.
  *
  * Staleness: the artifact directory name embeds a fingerprint of the files
  * backing its input table (path + length + mtime of every part file), so a
  * regenerated corpus — even one with the same row count — maps to a different
  * artifact path and triggers a rebuild. This is the 100 TB shape too: file
  * metadata is available from one namenode/liststatus round-trip, whereas any
  * content hash would cost a full scan per staleness check.
  *
  * Atomicity: builders write to a dot-prefixed temp dir and publish with a
  * filesystem rename, so a concurrent reader either sees the complete artifact
  * or none at all; losers of a publish race discard their temp dir and read
  * the winner's (builds are deterministic, so the content is identical).
  */
object Artifacts {

  /** Conf-backed root for every derived-artifact directory (IVF centroids,
    * CSV/ORC round-trips, cluster assignments, stream scratch + outputs,
    * the materialized repo). Default keeps the historical location; a
    * deployment relocates ALL artifact state with one conf, no code edit. */
  def root(s: SparkSession): String =
    s.conf.get("graft.artifacts.dir", "/root/repo/target")

  /** Fingerprint of the files backing `inputPath` (file or directory):
    * 63-bit value built from two differently-seeded MurmurHash3 passes over
    * the sorted (path, length, mtime) triples — a single 32-bit hash would
    * give a regenerated corpus a non-negligible birthday chance of colliding
    * with a prior fingerprint and silently reusing a stale artifact. Kept
    * non-negative so the value is path-safe. */
  def fingerprint(s: SparkSession, inputPath: String): Long = {
    val p = new Path(inputPath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    // Recurse on the FileStatus objects listStatus already returned instead
    // of re-statting each child path (ADVICE r18): the old walk paid 2×
    // metadata RPCs per entry and had a TOCTOU window — a part file deleted
    // between the list and the stat threw FileNotFoundException, and since
    // r18 this walk runs on EVERY base-table read (Tables memo), not just
    // PlanCache installs. Statuses from one listing are self-consistent.
    def walk(st: org.apache.hadoop.fs.FileStatus): Seq[String] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).sortBy(_.getPath.toString).toSeq.flatMap(walk)
      else Seq(s"${st.getPath}:${st.getLen}:${st.getModificationTime}")
    val listing = walk(fs.getFileStatus(p)).mkString("\n")
    val hi = scala.util.hashing.MurmurHash3.stringHash(listing).toLong & 0x7fffffffL
    val lo = scala.util.hashing.MurmurHash3.stringHash(listing, 0x5f3759df).toLong & 0xffffffffL
    (hi << 32) | lo
  }

  /** Run `body` under the cross-session file lock `.lock_<name>` in
    * `baseDir`; returns true iff body ran (false = acquisition timed out —
    * callers must re-check their postcondition, never proceed unlocked).
    *
    * Create-if-absent must be atomic for the lock to mean anything: on
    * file:// URIs Hadoop's local FS does a non-atomic exists-then-open, so
    * java.nio createFile (O_EXCL) is used there and fs.create(
    * overwrite=false) (atomic) on HDFS-like stores. A lock older than 60 s
    * is a crashed holder; it is broken by an atomic RENAME to a unique name
    * (only one breaker wins — delete-after-check would let two waiters each
    * "break" and double-hold). Every non-acquire path sleeps AND consumes
    * budget, so a persistent staleness misread (e.g. clock skew vs the
    * fileserver) cannot hot-spin breaking live locks without timing out.
    * Used for artifact publishes here and by operators that materialize
    * shared derived files (q72's generation snapshots, q74's bucketed
    * tables). */
  def withCrossSessionLock(s: SparkSession, baseDir: String, name: String)
      (body: => Unit): Boolean = {
    val base = new Path(baseDir)
    val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
    try fs.mkdirs(base) catch { case _: Exception => () }
    val lock = new Path(base, s".lock_$name")
    val token = UUID.randomUUID().toString
    def tryAcquire(): Boolean =
      try {
        val uri = fs.makeQualified(lock).toUri
        if (uri.getScheme == "file") {
          val p = java.nio.file.Paths.get(uri.getPath)
          java.nio.file.Files.createFile(p) // O_EXCL — atomic on local FS
          java.nio.file.Files.write(p, token.getBytes("UTF-8"))
        } else {
          val out = fs.create(lock, false) // atomic create on HDFS-like stores
          out.write(token.getBytes("UTF-8")); out.close()
        }
        true
      } catch { case _: Exception => false }
    def lockToken(): Option[String] =
      try {
        val in = fs.open(lock)
        try {
          val bytes = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](128)
          var n = in.read(buf)
          while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
          Some(bytes.toString("UTF-8"))
        } finally in.close()
      } catch { case _: Exception => None }
    // release only a lock we still own: if a waiter (wrongly or rightly)
    // broke ours and another session acquired, the token differs and we must
    // not delete theirs — deleting blind cascades into multi-hold
    def release(): Unit =
      try { if (lockToken().contains(token)) fs.delete(lock, false) }
      catch { case _: Exception => () }
    var held = false
    var waited = 0
    while (!held && waited < 360) { // 180 s budget > the 60 s stale threshold
      held = tryAcquire()
      if (!held) {
        try {
          val stale =
            System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime > 60000
          if (stale) {
            // break by atomic rename: only one breaker wins
            val broken = new Path(base, s".lock_broken_${UUID.randomUUID().toString.take(8)}")
            if (fs.rename(lock, broken)) fs.delete(broken, false)
          }
        } catch { case _: Exception => () } // lock vanished / transient FS error: retry
        Thread.sleep(500); waited += 1
      }
    }
    if (held) {
      try { body; true }
      finally release()
    } else false
  }

  /** Read the artifact for `fp` under `baseDir`, building and publishing it
    * first if absent. Tolerates an empty build result (the published dir holds
    * a schema-only parquet part). Unreadable or half-published artifacts are
    * deleted and rebuilt (bounded retries) rather than hard-failing every
    * later run; day-old artifacts for older fingerprints and day-old crashed
    * temp dirs are cleaned up best-effort after a successful publish. */
  def loadOrBuild(s: SparkSession, baseDir: String, fp: Long)(build: => DataFrame): DataFrame =
    publishOnce(s, baseDir, fp)(
      tmp => build.write.mode("overwrite").parquet(tmp))(
      p => s.read.parquet(p))

  /** Format-agnostic core of [[loadOrBuild]]: ensure the export for `fp`
    * exists under `baseDir` and return `readFrom` of the published dir.
    * `writeTo` materializes the export into a temp dir with ANY Spark sink
    * format (its FileOutputCommitter `_SUCCESS` doubles as the publish
    * marker); `readFrom` opens a published dir (carrying whatever reader
    * options the format needs). Used directly by the export roundtrips
    * (q32 CSV, q43 ORC) so their write cost is paid once per input
    * fingerprint and steady-state invocations are pure reads. */
  def publishOnce(s: SparkSession, baseDir: String, fp: Long)
      (writeTo: String => Unit)(readFrom: String => DataFrame): DataFrame = {
    val base = new Path(baseDir)
    val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
    val dest = new Path(base, s"fp_$fp")
    val marker = new Path(dest, "_SUCCESS")
    def read(): Option[DataFrame] =
      if (!fs.exists(marker)) None
      else
        try {
          val df = readFrom(dest.toString)
          df.schema // force footer/schema resolution so corruption surfaces here
          Some(df)
        } catch {
          // Do NOT delete here: this path runs without the publish lock, so a
          // transient FS error on a valid artifact — or a read racing another
          // session's scan — must not destroy the directory out from under
          // in-flight jobs. Corrupt publishes are cleared under the lock in
          // the publish step below, where no concurrent rename can interleave.
          case _: Exception => None
        }
    var attempt = 0
    var result: Option[DataFrame] = read()
    while (result.isEmpty && attempt < 3) {
      attempt += 1
      val tmp = new Path(base, s".tmp_${fp}_${UUID.randomUUID().toString.take(8)}")
      writeTo(tmp.toString)
      // The build runs OUTSIDE the lock (deterministic content, so concurrent
      // builds are merely redundant); only the tiny check-delete-rename
      // window is serialized, which is what makes "reader sees the complete
      // artifact or none" hold. If acquisition times out the publish is
      // SKIPPED, never run unlocked — this loop re-reads and fails loudly
      // after bounded attempts.
      val published = withCrossSessionLock(s, baseDir, fp.toString) {
        // Re-read under the lock: a marker with readable data means another
        // session won — keep theirs. Readers do NOT take this lock, so a
        // delete here can still strand another session's in-flight scan;
        // before declaring a marked dest corrupt, retry the read once after
        // a pause so a transient FS error (stale handle, listing hiccup) on
        // a VALID artifact doesn't destroy it — only a marker whose data is
        // unreadable repeatedly, under mutual exclusion with every
        // publisher, is treated as a corrupt publish and cleared. A dest
        // without _SUCCESS is always garbage (publishes arrive whole via
        // rename, marker included) — clear it so rename replaces it instead
        // of nesting tmp inside it (Hadoop rename-into-dir).
        def readableUnderLock(): Boolean =
          read().isDefined || { Thread.sleep(1000); read().isDefined }
        if (fs.exists(marker) && readableUnderLock()) fs.delete(tmp, true)
        else {
          if (fs.exists(dest)) fs.delete(dest, true)
          if (!fs.rename(tmp, dest)) fs.delete(tmp, true)
        }
      }
      if (!published) fs.delete(tmp, true) // lock timeout: defer to the holder
      result = read()
    }
    val df = result.getOrElse(sys.error(
      s"could not publish or read artifact $dest after $attempt attempts"))
    try {
      val dayAgo = System.currentTimeMillis() - 24L * 3600 * 1000
      fs.listStatus(base).foreach { st =>
        val n = st.getPath.getName
        // Age-gate stale-fingerprint dirs like dead temp dirs: a concurrent
        // session may still be scanning an older-fingerprint artifact (its
        // input dir was regenerated after that session planned its read), so
        // deleting a fresh fp_* mid-job would fail its in-flight action. A
        // day-old one has no live readers.
        val staleFp = n.startsWith("fp_") && n != dest.getName &&
          st.getModificationTime < dayAgo
        val deadTmp = (n.startsWith(".tmp_") || n.startsWith(".lock_")) &&
          st.getModificationTime < dayAgo
        if (staleFp || deadTmp) fs.delete(st.getPath, true)
      }
    } catch { case _: Exception => () } // cleanup is advisory only
    df
  }
}
