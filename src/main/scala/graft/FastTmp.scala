package graft

/** Point scratch space at tmpfs when available.
  *
  * Everything ephemeral this engine writes — temporary streaming checkpoints
  * (offset/commit logs + state-store deltas, fsync'd per micro-batch),
  * shuffle files, and the per-JVM engine-fixture warehouse — defaults to
  * `java.io.tmpdir` (= `/tmp`, disk-backed here). On a box with a tmpfs at
  * `/dev/shm` these are pure fixed-cost I/O with no durability requirement,
  * so redirect them to memory. A production cluster makes the same choice
  * explicitly (local SSD/ramdisk for `spark.local.dir`, object store only
  * for durable checkpoints).
  */
object FastTmp {

  /** The scratch root actually chosen (tmpfs when possible, else default). */
  lazy val dir: String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    try {
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) {
        val d = java.nio.file.Files.createTempDirectory(shm, "graft-tmp-")
        d.toFile.deleteOnExit()
        System.setProperty("java.io.tmpdir", d.toString)
        d.toString
      } else System.getProperty("java.io.tmpdir")
    } catch { case _: Exception => System.getProperty("java.io.tmpdir") }
  }
}
