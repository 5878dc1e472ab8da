package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path}

/** File-movement control plane — one Hadoop-FS implementation replacing the
  * reference's four parallel copies of list/move logic
  * (`/root/reference/src/extract/extract.py:26-40` S3 listing,
  * `/root/reference/src/move/move.py:7-65` local moves, `:68-105` dir moves,
  * `:110-163` S3→S3 moves). A Hadoop `Path` abstracts the scheme, so
  * `file:///…` and `s3a://bucket/…` both work here unchanged.
  *
  * Fixed on purpose: the reference's `move_files_locally` re-stamps the
  * destination inside its per-file loop, nesting a fresh timestamp directory
  * around every file after the first (`move.py:35-38`). Here the caller names
  * one destination directory (typically `…/{runId}`) per batch.
  */
final class ArchiveService(hadoopConf: Configuration) {

  private def fs(p: Path) = p.getFileSystem(hadoopConf)

  /** S7: list the plain files directly under `dir` (no recursion, directories
    * skipped — the reference drops "directory keys" the same way,
    * `extract.py:33-39`). Returns full URIs, sorted for determinism.
    */
  def list(dir: String): Seq[String] = {
    val p = new Path(dir)
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).filter(_.isFile).map(_.getPath.toString).sorted.toSeq
  }

  /** S9/S10/C2/C7: move `files` into `destDir` (created as needed), keeping
    * base names. Same-FS moves are renames (O(1) on posix/HDFS); cross-FS falls
    * back to copy+delete like the reference's S3 copy_object+delete_object.
    * Returns the destination paths.
    */
  def moveInto(files: Seq[String], destDir: String): Seq[String] = {
    if (files.isEmpty) return Seq.empty
    val dest = new Path(destDir)
    val destFs = fs(dest)
    destFs.mkdirs(dest)
    files.map { file =>
      val src = new Path(file)
      val srcFs = fs(src)
      val target = new Path(dest, src.getName)
      val renamed = srcFs.getUri == destFs.getUri && srcFs.rename(src, target)
      if (!renamed) {
        if (!FileUtil.copy(srcFs, src, destFs, target, true, true, hadoopConf))
          throw new java.io.IOException(s"move failed: $file -> $target")
      }
      target.toString
    }
  }
}
