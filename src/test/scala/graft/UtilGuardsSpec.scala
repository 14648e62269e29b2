package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the r21/r22 session-level optimizations: tmpfs scratch
  * must fall back to disk when `/dev/shm` lacks capacity headroom
  * (r21 verdict #2 — spilling INTO a tiny RAM mount converts disk
  * pressure into ENOSPC), concurrent same-name checkpoint scratch must
  * not share a directory (ADVICE r21), and the interned executor-shared
  * Hadoop conf must fail loudly on mutation (ADVICE r21). No Spark
  * session needed — these are pure JVM contracts. */
class UtilGuardsSpec extends AnyFunSuite {

  private def withShmFloor[T](bytes: Long)(f: => T): T = {
    val key = "graft.scratch.shmMinBytes"
    val prev = System.getProperty(key)
    System.setProperty(key, bytes.toString)
    try f
    finally if (prev == null) System.clearProperty(key)
            else System.setProperty(key, prev)
  }

  test("ephemeralDir falls back to java.io.tmpdir when /dev/shm lacks headroom") {
    // an impossible floor models the 64 MB container tmpfs: the RAM
    // mount exists and is writable, but using it would be wrong
    val p = withShmFloor(Long.MaxValue) {
      graft.util.Scratch.ephemeralDir("guard_floor")
    }
    assert(!p.startsWith("/dev/shm"),
      s"capacity floor ignored: $p landed on tmpfs")
    assert(p.startsWith(System.getProperty("java.io.tmpdir", "/tmp")))
  }

  test("ephemeralDir prefers /dev/shm when writable with headroom") {
    val shm = java.nio.file.Paths.get("/dev/shm")
    assume(java.nio.file.Files.isWritable(shm) &&
      shm.toFile.getUsableSpace > (64L << 20))
    // floor below the measured free space: tmpfs must win
    val p = withShmFloor(1L << 20) {
      graft.util.Scratch.ephemeralDir("guard_ok")
    }
    assert(p.startsWith("/dev/shm"), s"expected tmpfs, got $p")
  }

  test("unique ephemeralDirs never collide for one name") {
    val a = graft.util.Scratch.ephemeralDir("guard_unique", unique = true)
    val b = graft.util.Scratch.ephemeralDir("guard_unique", unique = true)
    assert(a != b, s"two invocations shared scratch: $a")
  }

  test("interned executor-side Hadoop conf is sealed: reads fine, writes throw") {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("graft.test.key", "v1")
    val wrapper = new graft.util.SerializableHadoopConf(conf)
    def roundtrip(w: graft.util.SerializableHadoopConf)
        : graft.util.SerializableHadoopConf = {
      val buf = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(buf)
      oos.writeObject(w); oos.close()
      new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(buf.toByteArray))
        .readObject().asInstanceOf[graft.util.SerializableHadoopConf]
    }
    val task = roundtrip(wrapper)
    assert(task.value.get("graft.test.key") == "v1")
    // the shared instance rejects every mutator loudly
    intercept[UnsupportedOperationException] {
      task.value.set("graft.test.key", "v2")
    }
    intercept[UnsupportedOperationException] { task.value.unset("x") }
    // same content interns to the SAME instance (the r21 win this
    // seal protects: a thousand tasks share one parsed conf)
    assert(roundtrip(wrapper).value eq task.value)
    // driver-side staleness sentinel: an entry added after first
    // serialization reaches later task binaries (no silent drop)
    conf.set("graft.test.added", "later")
    assert(roundtrip(wrapper).value.get("graft.test.added") == "later")
  }
}
