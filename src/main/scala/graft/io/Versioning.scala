package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest

/** Content-addressed dataset versioning — the in-engine equivalent of the
  * reference's DVC layer (`/root/reference/.dvc/config:1-6`: one local
  * workspace, two S3 remotes; `data_engineering.yml` steps 5/7/9:
  * `dvc pull` → run job → `dvc add` → `dvc push`).
  *
  * Scheme (same as DVC's):
  *   - `add(rel)` hashes the artifact (md5, streamed — never loaded whole),
  *     copies its bytes into a local content-addressed cache
  *     `<workspace>/.graft-cache/md5/ab/cdef…`, and writes a tiny pointer
  *     file `<rel>.ptr` next to the artifact. The pointer, not the data, is
  *     what source control would track (the reference commits `*.csv.dvc`).
  *   - A DIRECTORY artifact (a partitioned Parquet dataset — the scale
  *     sink) is addressed by a manifest blob: one `md5 size relpath` line
  *     per file, sorted by relpath; the manifest's own md5 (suffixed
  *     `.dir`, as DVC does) names the directory version. Renaming /
  *     re-partitioning with identical bytes changes the manifest, not the
  *     file blobs — dedup across versions is per-file, so a daily append to
  *     a 100 TB dataset pushes only the new partitions' objects.
  *   - `push(rel, remote)` copies any cache objects the remote lacks
  *     (content-addressed ⇒ idempotent, and an unchanged artifact pushes
  *     nothing — the reference's `git commit || "No changes"`).
  *   - `pull(rel, remote)` materializes the workspace artifact from the
  *     pointer via cache-then-remote, returning false when the pointer or
  *     blob is absent (the workflow's `dvc pull … || echo "No data found"`
  *     tolerate-missing semantics, `data_engineering.yml` step 5).
  *
  * Driver-side control plane by design: hashing is per-file streamed I/O,
  * the pointer/manifest are O(files), and at cluster scale the same
  * pull/add/push calls run against a Hadoop-FS remote with the per-file
  * hashing distributed (one map job) — the protocol does not change.
  */
object Versioning {
  final case class Pointer(md5: String, size: Long, isDir: Boolean)

  sealed trait Status
  case object UpToDate extends Status
  case object Modified extends Status // workspace bytes differ from pointer
  case object Missing extends Status // pointer exists, artifact gone
  case object Untracked extends Status // no pointer
}

class Versioning(workspaceDir: String) {
  import Versioning._

  private val workspace = Paths.get(workspaceDir)
  private val cacheDir = workspace.resolve(".graft-cache")

  // ---- pointer files ------------------------------------------------------

  private def pointerPath(rel: String): Path = workspace.resolve(rel + ".ptr")

  private def writePointer(rel: String, p: Pointer): Unit = {
    // "fmt" versions the HASH FORMAT, not the pointer syntax (see
    // [[manifestLines]]): a verify/pull mismatch against a pointer whose
    // fmt predates the current manifestFormat is then diagnosable as a
    // format upgrade rather than data corruption. Readers ignore unknown
    // keys, so fmt-less (pre-r10) pointers still parse.
    val json =
      s"""{\n  "dir": ${p.isDir},\n  "fmt": $manifestFormat,\n  "md5": "${p.md5}",\n  "size": ${p.size}\n}"""
    Option(pointerPath(rel).getParent).foreach(Files.createDirectories(_))
    Files.writeString(pointerPath(rel), json)
  }

  def readPointer(rel: String): Option[Pointer] = {
    val pp = pointerPath(rel)
    if (!Files.exists(pp)) None else Some(parsePointer(pp))
  }

  /** Single place that understands the pointer JSON — local and remote
    * pointers must never grow divergent parsers. */
  private def parsePointer(path: Path): Pointer = {
    val m = graft.Monitoring.parseFlatJson(Files.readString(path))
    Pointer(m("md5").stripPrefix("\"").stripSuffix("\""), m("size").toLong,
      m("dir") == "true")
  }

  // ---- content addressing -------------------------------------------------

  private def md5File(p: Path): String = {
    val md = MessageDigest.getInstance("MD5")
    val in = Files.newInputStream(p)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  private def objectPath(base: Path, md5: String): Path =
    base.resolve("md5").resolve(md5.substring(0, 2)).resolve(md5.substring(2))

  private def storeObject(base: Path, md5: String, src: Path): Unit = {
    val dst = objectPath(base, md5)
    if (!Files.exists(dst)) {
      Files.createDirectories(dst.getParent)
      val tmp = dst.resolveSibling("." + dst.getFileName + ".tmp")
      Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** Directory-manifest HASH FORMAT version, recorded in every pointer
    * this build writes.
    *   - fmt 1 (pre-r10, implicit — old pointers carry no fmt field):
    *     excluded only files whose LEAF name was hidden/underscore.
    *   - fmt 2: excludes files under ANY hidden/underscore path segment
    *     (`_temporary/.../part-*.parquet` from a crashed Spark write).
    * A fmt-1 DIR pointer whose artifact contained such files hashes
    * differently under fmt 2 — `status` reports Modified and `push`/`pull`
    * round-trips mismatch until the artifact is re-`add`ed (re-push is
    * cheap: content addressing re-uploads nothing but the manifest).
    * File pointers and dir artifacts without such files are unaffected.
    */
  private val manifestFormat = 2

  /** Sorted `md5 size relpath` manifest for a directory artifact. Hidden
    * files (Spark `_SUCCESS`, `.crc`) are data-irrelevant and excluded so
    * two writes of identical data hash identically.
    */
  private def manifestLines(dir: Path): Seq[(String, Long, String)] = {
    val walker = Files.walk(dir)
    val files =
      try {
        import scala.jdk.CollectionConverters._
        walker.iterator().asScala
          .filter(Files.isRegularFile(_))
          .filterNot { f =>
            // every RELATIVE segment, not just the leaf: a crashed Spark
            // write leaves _temporary/.../part-*.parquet whose leaf name
            // looks like data — hashing in-flight temp files would break
            // the "identical data hashes identically" invariant
            val segs = dir.relativize(f).iterator()
            var hidden = false
            while (segs.hasNext && !hidden) {
              val n = segs.next().toString
              hidden = n.startsWith(".") || n.startsWith("_")
            }
            hidden
          }
          .toVector
      } finally walker.close()
    files
      .map(f => (md5File(f), Files.size(f), dir.relativize(f).toString))
      .sortBy(_._3)
  }

  private def renderManifest(lines: Seq[(String, Long, String)]): String =
    lines.map { case (h, s, r) => s"$h $s $r" }.mkString("", "\n", "\n")

  private def md5String(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ---- dvc add / push / pull / status -------------------------------------

  /** Hash the artifact, populate the local cache, write the pointer.
    * Idempotent: unchanged bytes produce the identical pointer. Equivalent
    * of `dvc add data/engineered_data.csv` (`data_engineering.yml` step 7).
    */
  def add(rel: String): Pointer = {
    val art = workspace.resolve(rel)
    require(Files.exists(art), s"cannot add missing artifact $rel")
    val ptr =
      if (Files.isDirectory(art)) {
        val lines = manifestLines(art)
        lines.foreach { case (h, _, r) => storeObject(cacheDir, h, art.resolve(r)) }
        val manifest = renderManifest(lines)
        val dirMd5 = md5String(manifest) + ".dir"
        val tmp = Files.createTempFile(Files.createDirectories(cacheDir), "manifest", ".tmp")
        Files.writeString(tmp, manifest)
        storeObject(cacheDir, dirMd5, tmp)
        Files.delete(tmp)
        Pointer(dirMd5, lines.map(_._2).sum, isDir = true)
      } else {
        val h = md5File(art)
        storeObject(cacheDir, h, art)
        Pointer(h, Files.size(art), isDir = false)
      }
    writePointer(rel, ptr)
    ptr
  }

  /** Copy the pointer + any objects the remote lacks. Content addressing
    * makes re-push of unchanged data a no-op (`dvc push -r s3_engineered`).
    */
  def push(rel: String, remoteDir: String): Unit = {
    val remote = Paths.get(remoteDir)
    val ptr = readPointer(rel).getOrElse(
      throw new IllegalStateException(s"push of untracked artifact $rel"))
    if (ptr.isDir) {
      val manifest = objectPath(cacheDir, ptr.md5)
      Files.readString(manifest).linesIterator.filter(_.nonEmpty).foreach { line =>
        val h = line.split(" ", 3)(0)
        storeObject(remote, h, objectPath(cacheDir, h))
      }
      storeObject(remote, ptr.md5, manifest)
    } else storeObject(remote, ptr.md5, objectPath(cacheDir, ptr.md5))
    val rp = remote.resolve("ptr").resolve(rel + ".ptr")
    Files.createDirectories(rp.getParent)
    Files.copy(pointerPath(rel), rp, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Materialize `rel` in the workspace from the remote (falling back to
    * local cache for objects already present). Returns false — workspace
    * untouched — when the remote has no pointer or is missing blobs: the
    * workflow runs every step through `|| echo "No data found"` and lets
    * the job handle absence (Store.readCsvOrEmpty).
    */
  def pull(rel: String, remoteDir: String): Boolean = {
    val remote = Paths.get(remoteDir)
    val rp = remote.resolve("ptr").resolve(rel + ".ptr")
    if (!Files.exists(rp)) return false
    val ptr = parsePointer(rp)

    // fetch one object into the local cache, preferring what's cached
    def fetch(h: String): Option[Path] = {
      val local = objectPath(cacheDir, h)
      if (Files.exists(local)) Some(local)
      else {
        val r = objectPath(remote, h)
        if (!Files.exists(r)) None
        else { storeObject(cacheDir, h, r); Some(local) }
      }
    }

    val art = workspace.resolve(rel)
    if (ptr.isDir) {
      val manifest = fetch(ptr.md5).getOrElse(return false)
      val entries = Files.readString(manifest).linesIterator.filter(_.nonEmpty).map { line =>
        val Array(h, _, r) = line.split(" ", 3)
        (h, r)
      }.toVector
      val blobs = entries.map { case (h, r) => (fetch(h), r) }
      if (blobs.exists(_._1.isEmpty)) return false // incomplete remote: leave workspace as-is
      // stage fully, then swap — a reader never sees a half-pulled dataset
      val tmp = art.resolveSibling("." + art.getFileName + ".pulltmp")
      deleteRecursively(tmp)
      // created unconditionally: an EMPTY manifest (a dir artifact whose
      // only files were hidden/underscore metadata) must still stage a
      // valid empty dir — without this the old workspace copy was deleted
      // and the swap then crashed on a missing staging dir
      Files.createDirectories(tmp)
      blobs.foreach { case (src, r) =>
        val dst = tmp.resolve(r)
        Files.createDirectories(dst.getParent)
        Files.copy(src.get, dst, StandardCopyOption.REPLACE_EXISTING)
      }
      deleteRecursively(art)
      Files.move(tmp, art)
    } else {
      val src = fetch(ptr.md5).getOrElse(return false)
      Option(art.getParent).foreach(Files.createDirectories(_))
      val tmp = art.resolveSibling("." + art.getFileName + ".pulltmp")
      Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, art, StandardCopyOption.REPLACE_EXISTING)
    }
    writePointer(rel, ptr)
    true
  }

  /** Workspace-vs-pointer drift — `dvc status` for one artifact. */
  def status(rel: String): Status = {
    val art = workspace.resolve(rel)
    readPointer(rel) match {
      case None => Untracked
      case Some(_) if !Files.exists(art) => Missing
      case Some(ptr) =>
        val current =
          if (Files.isDirectory(art)) md5String(renderManifest(manifestLines(art))) + ".dir"
          else md5File(art)
        if (current == ptr.md5) UpToDate else Modified
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walker = Files.walk(p)
      val all = try walker.iterator().asScala.toVector finally walker.close()
      all.reverse.foreach(Files.deleteIfExists(_))
    }
}
