package graft.util

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem with an in-process `setPermission` (r21).
  *
  * Without the Hadoop native library (not shipped in this image — and
  * absent from many production containers), `RawLocalFileSystem
  * .setPermission` FORKS a `chmod` process for every file it creates:
  * stack-sampling the fleet verbs (guide §7.3) showed
  * `Shell.runCommand <- RawLocalFileSystem.setPermission <-
  * LocalFSFileOutputStream.<init>` on every staged data file, manifest
  * version, sidecar and checkpoint write — a process fork (~5-15 ms)
  * per created file, dozens per fleet verb. Hadoop's own fast path for
  * this is NativeIO; this class supplies the equivalent via
  * `java.nio.file.Files.setPosixFilePermissions` (one syscall), falling
  * back to the shell path on any filesystem that can't do POSIX
  * permissions. Registered by [[GraftSession.defaults]] as
  * `fs.file.impl`; checksum behaviour is unchanged (we still extend
  * [[LocalFileSystem]], the checksummed wrapper).
  */
final class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    try {
      val bits = permission.toShort.toInt
      val order = Array(
        OWNER_READ, OWNER_WRITE, OWNER_EXECUTE,
        GROUP_READ, GROUP_WRITE, GROUP_EXECUTE,
        OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE)
      val perms = new java.util.HashSet[PosixFilePermission]()
      var i = 0
      while (i < 9) {
        if (((bits >> (8 - i)) & 1) == 1) perms.add(order(i))
        i += 1
      }
      java.nio.file.Files.setPosixFilePermissions(
        pathToFile(p).toPath, perms)
      ()
    } catch {
      case _: UnsupportedOperationException |
           _: java.io.IOException =>
        super.setPermission(p, permission)
    }
  }
}

final class NioLocalFileSystem
    extends LocalFileSystem(new NioRawLocalFileSystem)
