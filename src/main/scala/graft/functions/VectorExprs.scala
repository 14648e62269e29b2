package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: dot product of two ArrayType(DoubleType)
  * columns (SURVEY.md §7.4 stretch, triggered: the higher-order-function
  * cosine — aggregate(zip_with(...)) — is interpreted, not codegen'd,
  * and measured ~25µs/pair; this expression generates a tight primitive
  * loop inside whole-stage codegen instead).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // a NULL array element makes the whole product NULL (SQL semantics),
  // so the result can be null even for non-null array inputs
  override def nullable: Boolean = true

  private def mayHaveNullElems: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })

  // ExpectsInputTypes is private[sql], but checkInputDataTypes is not:
  // without this, a SQL call like dot_product(array(1,2), array(3,4))
  // (int arrays) would have ArrayData.getDouble reinterpret 4-byte
  // elements as doubles and return silently wrong numbers
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two array<double> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    if (mayHaveNullElems) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getDouble(i) * y.getDouble(i); i += 1
      }
    } else {
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // emit the per-element null check only when the static type allows
      // null elements — the common all-doubles case keeps the tight loop
      val guard = if (mayHaveNullElems)
        s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guard
         |  ${ev.value}Acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |if (!${ev.isNull}) { ${ev.value} = ${ev.value}Acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: sign-random-projection fingerprint of an
  * ArrayType(DoubleType) vector — bit b of the result is the sign of
  * ⟨v, r_b⟩ for the deterministic ±1 hyperplane r_b whose component d
  * is the splitmix64 parity of ((b << 32) | d) (RNG-free: fingerprints
  * are reproducible across runs, engines, and cluster sizes, and the
  * seed is collision-free for ANY embedding width — no dimension cap).
  *
  * This collapses the explode → broadcast-plane-join → two-aggregate
  * SRP pipeline (O(n·d·bits) rows through a shuffle) into one O(d·bits)
  * per-row loop inside whole-stage codegen — fingerprinting runs at
  * scan speed with zero shuffles, which is the 100 TB posture for the
  * embedding near-dup family. */
case class SrpFingerprint(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_fingerprint"
  override def nullable: Boolean = true

  private def mayHaveNullElems: Boolean = left.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  private def nBitsValue: Option[Int] =
    if (right.foldable) Option(right.eval()).collect { case i: Int => i }
    else None

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(DoubleType, _) => nBitsValue match {
      case Some(b) if b >= 1 && b <= 64 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "srp_fingerprint nBits must be a literal int in [1, 64], got " +
          right.sql)
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_fingerprint requires array<double>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any, nb: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val bits = nb.asInstanceOf[Int]
    val n = v.numElements()
    var fp = 0L
    var b = 0
    while (b < bits) {
      var s = 0.0
      var d = 0
      while (d < n) {
        if (mayHaveNullElems && v.isNullAt(d)) return null
        s += v.getDouble(d) * (if (SrpFingerprint.sign(b, d)) 1.0 else -1.0)
        d += 1
      }
      if (s > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val fp = ctx.freshName("fp")
      // the splitmix64 parity, inlined as a private method of the
      // generated class (must stay arithmetic-identical to
      // SrpFingerprint.sign — pinned by the eval-vs-codegen test)
      val signFn = ctx.addNewFunction("srpSign",
        s"""
           |private boolean srpSign(int b, int d) {
           |  long z = (((long) b << 32) | (long) d) + 0x9E3779B97F4A7C15L;
           |  z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L;
           |  z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL;
           |  z = z ^ (z >>> 31);
           |  return (z & 1L) == 1L;
           |}
         """.stripMargin)
      val guard = if (mayHaveNullElems)
        s"if ($x.isNullAt($d)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $x.numElements();
         |long $fp = 0L;
         |for (int $b = 0; $b < $y; $b++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $guard
         |    $s += $x.getDouble($d) * ($signFn($b, $d) ? 1.0 : -1.0);
         |  }
         |  if (${ev.isNull}) break;
         |  if ($s > 0) $fp |= 1L << $b;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $fp; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SrpFingerprint =
    copy(left = newLeft, right = newRight)
}

object SrpFingerprint {
  /** Deterministic ±1 hyperplane component: splitmix64 parity of
    * ((bit << 32) | dim). The single source of truth the interpreted
    * eval uses and the generated Java mirrors. */
  def sign(b: Int, d: Int): Boolean = {
    var z = ((b.toLong << 32) | d.toLong) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z & 1L) == 1L
  }
}

object VectorExprs {
  /** Register the native expressions in the session's function registry
    * so plans can use them via expr("dot_product(a, b)") /
    * expr("srp_fingerprint(v, 64)"). Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      { args: Seq[Expression] =>
        require(args.length == 2, "dot_product(a, b) takes two arguments")
        DotProduct(args.head, args(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "srp_fingerprint",
      { args: Seq[Expression] =>
        require(args.length == 2,
          "srp_fingerprint(vec, nBits) takes two arguments")
        SrpFingerprint(args.head, args(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "chunk_spans",
      { args: Seq[Expression] =>
        require(args.length == 3,
          "chunk_spans(text, chunkTokens, stride) takes three arguments")
        ChunkSpans(args.head, args(1), args(2))
      },
      "scala_udf")
  }
}
