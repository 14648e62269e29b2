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
  * uses internally for its own file sinks. Broadcast it once per job
  * (the conf is a few KB of key/value pairs) rather than capturing it
  * per-task.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
