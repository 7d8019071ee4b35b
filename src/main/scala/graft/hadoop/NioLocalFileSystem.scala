package graft.hadoop

import java.nio.file.attribute.PosixFilePermission

import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem whose permission ops go through java.nio instead of a
  * forked `chmod`.
  *
  * Without libhadoop (NativeIO), Hadoop's RawLocalFileSystem implements
  * `setPermission` by shelling out — and every parquet file CREATE calls
  * it for the parent mkdirs, so a dynamic-partition write forks one
  * process per partition directory per task. Thread dumps showed
  * `Shell.runCommand` dominating write stages: process forks cost
  * ~200 ms in this environment and serialize, making small partitioned
  * writes 4× slower than the data itself warrants. The JDK has had the
  * same capability in-process since Java 7
  * (`Files.setPosixFilePermissions`); this subclass routes there.
  *
  * Wired via `spark.hadoop.fs.file.impl` in [[graft.GraftSession]].
  * Checksum shadow files are also dropped (raw FS) — parquet already
  * checksums per page, and GraftSession disabled them anyway. On a real
  * cluster the data lives on HDFS/object stores and none of this class
  * is in the path.
  */
class NioLocalFileSystem extends RawLocalFileSystem {

  override def setPermission(p: org.apache.hadoop.fs.Path,
      permission: FsPermission): Unit = {
    val file = pathToFile(p).toPath
    val bits = permission.toShort
    // PosixFilePermission.values() orders OWNER_READ..OTHERS_EXECUTE to
    // match permission bits 8 (0400) down to 0 (0001)
    val all = PosixFilePermission.values()
    val set = new java.util.HashSet[PosixFilePermission]()
    var i = 0
    while (i < 9) {
      if ((bits & (1 << (8 - i))) != 0) set.add(all(i))
      i += 1
    }
    java.nio.file.Files.setPosixFilePermissions(file, set)
  }
}
