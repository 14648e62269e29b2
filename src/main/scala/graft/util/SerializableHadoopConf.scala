package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop `Configuration`, so executor
  * tasks can resolve filesystems from the SESSION's conf (object-store
  * credentials, `fs.defaultFS` overrides, any `spark.hadoop.*` setting)
  * instead of a bare `new Configuration()` that silently drops them —
  * on a real cluster the two can resolve a scheme-less path to
  * DIFFERENT filesystems. `Configuration` itself is `Writable` but not
  * `Serializable`; this adapter bridges the two, the same shape Spark
  * uses internally for its own file sinks.
  *
  * Deserialization INTERNS per JVM (r21, guide §1/§4 "measure first"):
  * this wrapper rides inside DSv2 reader/writer factories, which live
  * in the task binary — so EVERY task deserialized its own full
  * Configuration copy. Stack-sampling the fleet-verb queries showed
  * `WritableUtils.readCompressedByteArray` (Configuration.readFields)
  * as the hottest non-idle frame in the whole run (~10% of total CPU
  * at 32 local cores). Now the payload is written once with a content
  * key, and `readObject` resolves the key against a JVM-local cache,
  * parsing the entries only on first sight — a thousand tasks on one
  * executor share ONE Configuration instance, exactly the sharing
  * contract of Spark's own broadcast Hadoop conf.
  *
  * READ-ONLY CONTRACT, enforced (r22, ADVICE r21): the interned
  * instance is shared by every task on the executor, so a task-side
  * mutation would leak into all of them. Deserialized values are a
  * [[SerializableHadoopConf.SealedConfiguration]] whose mutators throw
  * after construction — a violating caller fails loudly instead of
  * corrupting its neighbors. Driver-side, the cached serialized form
  * is re-validated against the conf's entry count on every
  * `writeObject`, so the common mutation shape (an entry added after
  * first serialization) refreshes the payload instead of being
  * silently dropped.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  // serialized form, computed once per wrapper: a DSv2 factory's
  // wrapper is re-serialized for every STAGE's task binary, and
  // Configuration.write itself showed up in the profile. `size` is the
  // staleness sentinel: a conf mutated after first serialization (an
  // added/removed entry) re-encodes instead of shipping stale bytes.
  // An in-place value REWRITE of an existing key still evades this
  // (size unchanged) — the sealed task-side twin plus this guard cover
  // the realistic shapes without paying a full re-encode per stage.
  @transient private var cached: (Int, String, Array[Byte]) = _

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    if (cached == null || cached._1 != value.size()) {
      val buf = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(buf)
      value.write(dos)
      dos.flush()
      val bytes = buf.toByteArray
      cached = (value.size(),
        SerializableHadoopConf.contentKey(bytes), bytes)
    }
    val (_, key, bytes) = cached
    out.writeUTF(key)
    out.writeInt(bytes.length)
    out.write(bytes)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    val key = in.readUTF()
    val n = in.readInt()
    val bytes = new Array[Byte](n)
    in.readFully(bytes)
    value = SerializableHadoopConf.intern(key, bytes)
  }
}

object SerializableHadoopConf {
  // content-keyed intern pool; tiny in practice (one session conf per
  // app, a handful under tests). Cleared wholesale past a generous cap
  // so a pathological caller can't grow it without bound.
  private val pool =
    new java.util.concurrent.ConcurrentHashMap[String, Configuration]()

  /** A `Configuration` that throws on mutation once sealed — the
    * interned, executor-shared instance. Construction-time population
    * (`readFields` sets entries internally) happens before `seal()`. */
  private[util] final class SealedConfiguration
      extends Configuration(false) {
    @volatile private var sealedNow = false
    private[util] def seal(): Unit = sealedNow = true
    private def guard(op: String): Unit =
      if (sealedNow) throw new UnsupportedOperationException(
        s"$op on an interned executor-shared Hadoop Configuration " +
          "(SerializableHadoopConf): this instance is shared by every " +
          "task in the JVM — copy it (new Configuration(conf)) to " +
          "mutate")
    override def set(name: String, value: String, source: String): Unit = {
      guard(s"set($name)"); super.set(name, value, source)
    }
    override def unset(name: String): Unit = {
      guard(s"unset($name)"); super.unset(name)
    }
    override def clear(): Unit = { guard("clear()"); super.clear() }
    override def addResource(name: String): Unit = {
      guard("addResource"); super.addResource(name)
    }
    override def addResource(url: java.net.URL): Unit = {
      guard("addResource"); super.addResource(url)
    }
    override def addResource(p: org.apache.hadoop.fs.Path): Unit = {
      guard("addResource"); super.addResource(p)
    }
    override def addResource(in: java.io.InputStream): Unit = {
      guard("addResource"); super.addResource(in)
    }
    override def setClassLoader(cl: ClassLoader): Unit = {
      guard("setClassLoader"); super.setClassLoader(cl)
    }
  }

  private def contentKey(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    java.util.Base64.getEncoder.encodeToString(d)
  }

  private def intern(key: String, bytes: Array[Byte]): Configuration = {
    if (pool.size > 64) pool.clear()
    pool.computeIfAbsent(key, _ => {
      val c = new SealedConfiguration
      c.readFields(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      c.seal()
      c
    })
  }
}
