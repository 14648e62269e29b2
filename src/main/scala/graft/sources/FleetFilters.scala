package graft.sources

import org.apache.spark.sql.types._

/** Record-level evaluation of pushed V1 filters for the fleet
  * connectors (graft-avro, graft-xlsx): rows failing a pushed predicate are dropped BEFORE the
  * InternalRow is built, so they never enter Catalyst at all.
  *
  * Scope is deliberately narrow so semantics stay exact:
  *  - comparisons/IN on integral, floating, string, boolean, timestamp,
  *    and date columns (binary stays residual). Temporal literals
  *    arrive as instant-carrying objects (`java.sql.Timestamp`/
  *    `Instant`, `java.sql.Date`/`LocalDate`) and are normalized to
  *    the SAME epoch-µs / epoch-day integers the fleet writers record
  *    (`Avro.toAvroValue`'s logical-type carriers) — zone-free on both
  *    sides, so the comparison is exact under any session conf;
  *  - IsNull/IsNotNull on any column;
  *  - And/Or compositions of the above. NOT is rejected: the
  *    evaluator collapses SQL UNKNOWN to false at the leaves, which
  *    is sound under the monotone And/Or but NOT under negation. */
private[graft] object FleetFilters {
  import org.apache.spark.sql.sources._

  private def evaluable(schema: StructType, col: String): Boolean =
    schema.find(_.name == col).exists(_.dataType match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType |
           FloatType | StringType | BooleanType | TimestampType |
           DateType => true
      case _ => false
    })

  private def stringCol(schema: StructType, col: String): Boolean =
    schema.find(_.name == col).exists(_.dataType == StringType)

  // Catalyst matches string predicates on UTF-8 BYTES; the evaluator
  // uses java.lang.String on the DECODED value. For well-formed
  // strings the two agree (UTF-8 is self-synchronizing, so byte-level
  // prefix/suffix/substring occurrences align to code points); a row
  // value is always well-formed (it came from a UTF-8 decode), so only
  // the LITERAL needs the guard — an unpaired surrogate in the pattern
  // stays residual for Spark.
  private def wellFormed(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c)) {
        if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1)))
          return false
        i += 2
      } else if (Character.isLowSurrogate(c)) return false
      else i += 1
    }
    true
  }

  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(c, v) => v != null && evaluable(schema, c)
    case GreaterThan(c, v) => v != null && evaluable(schema, c)
    case GreaterThanOrEqual(c, v) => v != null && evaluable(schema, c)
    case LessThan(c, v) => v != null && evaluable(schema, c)
    case LessThanOrEqual(c, v) => v != null && evaluable(schema, c)
    case In(c, vs) =>
      vs != null && vs.nonEmpty && vs.forall(_ != null) &&
        evaluable(schema, c)
    case StringStartsWith(c, p) =>
      p != null && wellFormed(p) && stringCol(schema, c)
    case StringEndsWith(c, p) =>
      p != null && wellFormed(p) && stringCol(schema, c)
    case StringContains(c, p) =>
      p != null && wellFormed(p) && stringCol(schema, c)
    case IsNull(c) => schema.exists(_.name == c)
    case IsNotNull(c) => schema.exists(_.name == c)
    case And(l, r) => supported(schema, l) && supported(schema, r)
    case Or(l, r) => supported(schema, l) && supported(schema, r)
    case _ => false
  }

  /** The exact code-point successor of prefix `p`: every string
    * starting with `p` lies in `[p, prefixSuccessor(p))` under
    * code-point order — the standard prefix-range trick the StartsWith
    * skip/always proofs use. None when the last code point has no
    * successor (U+10FFFF) or `p` is empty. */
  private[graft] def prefixSuccessor(p: String): Option[String] = {
    if (p.isEmpty) return None
    val lastStart =
      if (p.length >= 2 && Character.isLowSurrogate(p.charAt(p.length - 1)) &&
          Character.isHighSurrogate(p.charAt(p.length - 2))) p.length - 2
      else p.length - 1
    val cp = p.codePointAt(lastStart)
    if (cp >= Character.MAX_CODE_POINT) None
    else Some(p.substring(0, lastStart) +
      new String(Character.toChars(cp + 1)))
  }

  private def integral(n: Number): Boolean = n match {
    case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
         _: java.lang.Byte => true
    case _ => false
  }

  // Catalyst orders strings by unsigned UTF-8 bytes (UTF8String.compareTo),
  // which is Unicode CODE-POINT order; java.lang.String.compareTo is UTF-16
  // code-unit order and disagrees whenever exactly one side starts a
  // supplementary-plane char (its surrogates 0xD800..0xDBFF sort BELOW
  // U+E000..U+FFFF, code points sort ABOVE). Compare by code point so
  // absorbed range predicates select exactly the rows Spark would.
  private[graft] def compareByCodePoint(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  // Temporal values normalize to the logical-type carrier integers the
  // fleet writers record: timestamps → epoch-µs (the exact formula of
  // Avro.toAvroValue / AvroFleetReaderFactory.toCatalyst — instant
  // math, zone-free), dates → epoch-day. A bare integral Number is the
  // carrier itself (sidecar JSON reads stats back as Long). Units can
  // never mix: both sides of one comparison come from one column.
  private[graft] def temporalLong(x: Any): Option[Long] = x match {
    case t: java.sql.Timestamp =>
      Some(t.getTime * 1000L + (t.getNanos % 1000000) / 1000)
    case i: java.time.Instant =>
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        (i.getNano / 1000).toLong))
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case ld: java.time.LocalDate => Some(ld.toEpochDay)
    case n: Number if integral(n) => Some(n.longValue())
    case _ => None
  }

  private def isTemporal(x: Any): Boolean = x match {
    case _: java.sql.Timestamp | _: java.time.Instant |
         _: java.sql.Date | _: java.time.LocalDate => true
    case _ => false
  }

  // shared with FleetStats so the planning-time skip decision and the
  // record-level filter decision can never use different orderings
  private[graft] def cmp(x: Any, v: Any): Int = (x, v) match {
    case (a: String, b: String) => compareByCodePoint(a, b)
    case (a: java.lang.Boolean, b: java.lang.Boolean) => a.compareTo(b)
    case (a, b) if isTemporal(a) || isTemporal(b) =>
      (temporalLong(a), temporalLong(b)) match {
        case (Some(ta), Some(tb)) => java.lang.Long.compare(ta, tb)
        case _ => throw new IllegalStateException(
          s"unpushable temporal comparison: ${x.getClass} vs ${v.getClass}")
      }
    case (a: Number, b: Number) =>
      if (integral(a) && integral(b))
        java.lang.Long.compare(a.longValue(), b.longValue())
      else java.lang.Double.compare(a.doubleValue(), b.doubleValue())
    case _ => throw new IllegalStateException(
      s"unpushable comparison: ${x.getClass} vs ${v.getClass}")
  }

  /** SQL semantics with UNKNOWN collapsed to false (sound for the
    * accepted monotone filter algebra — see scaladoc above). */
  def eval(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(c, v) => val x = get(c); x != null && cmp(x, v) == 0
    case GreaterThan(c, v) => val x = get(c); x != null && cmp(x, v) > 0
    case GreaterThanOrEqual(c, v) =>
      val x = get(c); x != null && cmp(x, v) >= 0
    case LessThan(c, v) => val x = get(c); x != null && cmp(x, v) < 0
    case LessThanOrEqual(c, v) =>
      val x = get(c); x != null && cmp(x, v) <= 0
    case In(c, vs) => val x = get(c); x != null && vs.exists(cmp(x, _) == 0)
    case StringStartsWith(c, p) => get(c) match {
      case s: String => s.startsWith(p); case _ => false }
    case StringEndsWith(c, p) => get(c) match {
      case s: String => s.endsWith(p); case _ => false }
    case StringContains(c, p) => get(c) match {
      case s: String => s.contains(p); case _ => false }
    case IsNull(c) => get(c) == null
    case IsNotNull(c) => get(c) != null
    case And(l, r) => eval(l, get) && eval(r, get)
    case Or(l, r) => eval(l, get) || eval(r, get)
    case other => throw new IllegalStateException(s"unpushed filter: $other")
  }
}

