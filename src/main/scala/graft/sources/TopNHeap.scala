package graft.sources

/** Shared bounded-heap machinery for pushed TopN — one implementation
  * of "keep the n best (keys, row) pairs under the pushed ordering" so
  * the avro and xlsx connectors can never disagree on direction, null
  * placement, or tie-break semantics (the comparator is
  * `FleetFilters.cmp`, the same ordering the filter and skip paths
  * use). Rows are whatever spelling the caller wants to emit later;
  * keys are carrier values (`String`/boxed numerics/temporals). */
private[sources] object TopNHeap {

  /** Lexicographic "a sorts before b" over the pushed orders;
    * negative = a wins. */
  def cmpKeys(orders: Seq[TopNOrder], a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < orders.length) {
      val o = orders(i)
      val (x, y) = (a(i), b(i))
      val c =
        if (x == null && y == null) 0
        else if (x == null) { if (o.nullsFirst) -1 else 1 }
        else if (y == null) { if (o.nullsFirst) 1 else -1 }
        else {
          val base = FleetFilters.cmp(x, y)
          if (o.asc) base else -base
        }
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** An n-bounded heap: root = worst kept pair, evicted first. */
  final class Bounded(orders: Seq[TopNOrder], n: Int) {
    private val heap = new java.util.PriorityQueue[(Array[Any], Array[Any])](
      math.max(1, n),
      (p1: (Array[Any], Array[Any]), p2: (Array[Any], Array[Any])) =>
        -cmpKeys(orders, p1._1, p2._1))

    /** `row` is by-name so evicted offers never materialize it. */
    def offer(keys: Array[Any], row: => Array[Any]): Unit = {
      if (heap.size < n) heap.add((keys, row))
      else if (cmpKeys(orders, keys, heap.peek()._1) < 0) {
        heap.poll(); heap.add((keys, row))
      }
    }

    /** The kept rows (order unspecified — the partial contract: Spark's
      * final sort orders the merged partials). */
    def drain(): Iterator[Array[Any]] = {
      val kept = new scala.collection.mutable.ArrayBuffer[Array[Any]](heap.size)
      while (!heap.isEmpty) kept += heap.poll()._2
      kept.iterator
    }
  }
}
