package graft.util

import org.apache.spark.sql.SparkSession

/** Build-once/query-many scratch staging keyed by a fixture file's
  * generation — the ONE spelling of the pattern the IVF index, the
  * fingerprint store, the catalog root, the streaming-source fleet,
  * and the SQL-verb golden clones all follow: a (path, length, mtime)
  * fingerprint of the driving fixture invalidates the staged copy when
  * the fixture is rewritten in place, and `build` runs at most once
  * per (fixture generation, prefix) per JVM. Keys hash through MD5, so
  * two distinct generations cannot collide the way a 32-bit hashCode
  * could. Production stages nothing — the staged artifact stands in
  * for a table that would simply exist. */
object GoldenFixture {

  private val slots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Scratch dir for `prefix`, built by `build(dir)` on first use per
    * generation of `fixtureFile`. */
  def dir(s: SparkSession, fixtureFile: String, prefix: String)
      (build: String => Unit): String = {
    val p = new org.apache.hadoop.fs.Path(fixtureFile)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val st = fs.getFileStatus(p)
    val key = s"$fixtureFile@${st.getLen}@${st.getModificationTime}@$prefix"
    slots.computeIfAbsent(key, _ => {
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).take(6)
        .map(b => f"$b%02x").mkString
      val root = Scratch.dir(s"${prefix}_$tag")
      build(root)
      root
    })
  }
}
