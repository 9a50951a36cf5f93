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

  /** The newest committed manifest, if the store has one. */
  def currentManifest(fs: FileSystem, dir: Path): Option[(Long, Seq[String])] = {
    val versions = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(ManifestPrefix))
      .flatMap(n => n.stripPrefix(ManifestPrefix).toLongOption)
    if (versions.isEmpty) None
    else {
      val v = versions.max
      val in = fs.open(new Path(dir, f"$ManifestPrefix$v%08d"))
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some((v, txt.split('\n').toSeq.filter(_.nonEmpty)))
    }
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

  /** Commit manifest version `ver` naming `files`. Atomic for readers:
    * content is fully written to a dot-hidden scratch file first, then
    * renamed into the versioned name — rename-to-fresh-target is atomic
    * on local filesystems and HDFS. Returns false (committing nothing)
    * if `ver` already exists — the optimistic-concurrency signal for
    * racing appends.
    */
  def tryCommitManifest(fs: FileSystem, dir: Path, ver: Long,
      files: Seq[String]): Boolean = {
    val target = new Path(dir, f"$ManifestPrefix$ver%08d")
    if (fs.exists(target)) return false
    val staged = new Path(dir,
      s".manifest-inprogress-$ver-${java.util.UUID.randomUUID()}")
    val out = fs.create(staged, false)
    try out.write((files.distinct.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.rename(staged, target)) true
    else { fs.delete(staged, false); false }
  }

  /** Run an append-mode `write` into `path` and, if the store is
    * manifested, extend the manifest with the files the write added
    * (before/after listing diff — exact for this writer's own files;
    * retried commit under racing appends). A legacy (manifest-less)
    * store is left legacy: the raw listing already serves the new files.
    * A crash between the data write and the manifest commit leaves the
    * new parts unreferenced — never served, swept by the next
    * compaction — so the caller's retry story is simply "re-append on
    * failure", with no double-count.
    */
  def appendRecorded(spark: SparkSession, path: String)(
      write: => Unit): Unit = {
    val (fs, p) = fsFor(spark, path)
    val manifested = fs.exists(p) && currentManifest(fs, p).isDefined
    val before = if (manifested) rawDataFiles(fs, p).toSet else Set.empty[String]
    write
    if (manifested) {
      val added = (rawDataFiles(fs, p).toSet -- before).toSeq.sorted
      if (added.nonEmpty) {
        var committed = false
        var attempts = 0
        while (!committed) {
          attempts += 1
          if (attempts > 50)
            throw new java.io.IOException(
              s"appendRecorded: could not commit a manifest for $path " +
                "after 50 attempts (manifest versions kept advancing)")
          val (ver, cur) = currentManifest(fs, p).getOrElse((0L, Seq.empty))
          committed = tryCommitManifest(fs, p, ver + 1, cur ++ added)
        }
      }
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
