package graft.io

import java.nio.file.Files
import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` filesystem whose permission writes stay inside the JVM.
  *
  * Without the Hadoop native library (absent from plain Spark distributions,
  * including this container), `RawLocalFileSystem.setPermission` falls back
  * to `Shell.execCommand` — a fork/exec of `/bin/chmod` PER created file and
  * PER created directory. A dynamic-partitioned parquet write of ~2000
  * partition directories pays ~6000 forks of a multi-GB JVM; measured on the
  * q32/q33 profile (ProfileQ33 + thread-stack sampling): 259 CPU-seconds for
  * a 600k-row write whose unpartitioned twin costs 1.8 s — with
  * `ProcessImpl.forkAndExec` under `RawLocalFileSystem.setPermission` as the
  * top sampled frame. Fork cost also grows with JVM heap (page-table copy),
  * which is exactly why the two sink queries crept between rounds with no
  * code change: the suite's resident heap grew.
  *
  * This subclass routes `setPermission` through
  * `java.nio.file.Files.setPosixFilePermissions` — same chmod semantics, no
  * fork. Registered via `spark.hadoop.fs.file.impl` in
  * [[graft.core.SessionFactory]]; it only affects `file://` URIs, so cluster
  * deployments (HDFS / S3A, which never fork for permissions) are untouched,
  * and checksum behavior is unchanged (`LocalFileSystem` still wraps the raw
  * FS in `ChecksumFileSystem`).
  */
final class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)

final class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit =
    try {
      Files.setPosixFilePermissions(
        pathToFile(p).toPath, NioRawLocalFileSystem.toPosix(permission))
    } catch {
      // non-POSIX store or security manager: fall back to Hadoop's own path
      case _: UnsupportedOperationException | _: SecurityException =>
        super.setPermission(p, permission)
    }
}

object NioRawLocalFileSystem {
  /** FsPermission's low 9 bits → NIO enum set (sticky/setuid bits are not
    * expressible via NIO and are dropped — Hadoop's shell fallback on local
    * FS never sets them for data files either).
    */
  private[io] def toPosix(permission: FsPermission): java.util.Set[PosixFilePermission] = {
    val bits = permission.toShort.toInt
    val out = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    val order = Seq(
      OWNER_READ, OWNER_WRITE, OWNER_EXECUTE,
      GROUP_READ, GROUP_WRITE, GROUP_EXECUTE,
      OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE)
    order.zipWithIndex.foreach { case (perm, i) =>
      if ((bits & (1 << (8 - i))) != 0) out.add(perm)
    }
    out
  }
}
