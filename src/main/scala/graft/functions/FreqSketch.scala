package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a `TypedImperativeAggregate`
  * (SURVEY.md §2.K row): one pass, O(k) state, mergeable partials — the
  * classic way to find frequent items over 100 TB without a full
  * group-by. Guarantees: every item with true frequency > n/(k+1)
  * survives, and each reported count undercounts by at most n/(k+1);
  * when the column has ≤ k distinct values no decrement ever fires and
  * the counts are EXACT — which is what makes the registry query
  * oracle-checkable against a plain GROUP BY.
  *
  * Output is a deterministic scalar string "item:count|item:count"
  * sorted by item (the repo-wide no-raw-arrays discipline).
  */
case class FreqSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "freq_sketch(col, k) requires k > 0")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  private def add(buf: mutable.HashMap[String, Long], item: String,
      weight: Long): Unit = {
    val cur = buf.getOrElse(item, 0L)
    if (cur > 0L || buf.size < k) {
      buf.update(item, cur + weight)
    } else {
      // Misra–Gries decrement step: charge the new item against every
      // tracked one; only the overflowing weight is lost
      val dec = weight
      val keys = buf.keys.toSeq // snapshot: no mutation under live iterator
      val dead = mutable.ArrayBuffer.empty[String]
      keys.foreach { key =>
        val v = buf(key) - dec
        if (v <= 0L) dead += key else buf.update(key, v)
      }
      dead.foreach(buf.remove)
      // if decrementing freed slots and the item's residual weight is
      // positive relative to the charge, it would re-enter on the next
      // occurrence; classic MG drops it here
    }
  }

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, cnt) =>
      buf.update(item, buf.getOrElse(item, 0L) + cnt)
    }
    if (buf.size > k) {
      // standard MG merge compaction: subtract the (k+1)-th largest
      // count and drop non-positives — preserves the error bound
      val counts = buf.values.toArray.sorted(Ordering[Long].reverse)
      val dec = counts(k)
      val dead = buf.collect { case (key, v) if v - dec <= 0L => key }.toSeq
      buf.keysIterator.toSeq.foreach { key =>
        val v = buf(key) - dec
        if (v > 0L) buf.update(key, v)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    UTF8String.fromString(
      buf.toSeq.sortBy(_._1).map { case (i, c) => s"$i:$c" }.mkString("|"))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, cnt) => out.writeUTF(item); out.writeLong(cnt) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketch =
    copy(child = newChild)

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"
}

object FreqSketch {
  /** Register `freq_sketch(col, k)`; the analyzer wraps the returned
    * AggregateFunction in an AggregateExpression. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "freq_sketch",
      { args: Seq[Expression] =>
        require(args.length == 2,
          "freq_sketch(col, k) takes a column and a literal k")
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"freq_sketch k must be an integer literal, got $other")
        }
        FreqSketch(args.head, k)
      },
      "scala_udf")
}
