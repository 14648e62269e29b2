package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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

object VectorExprs {
  /** Register `dot_product` in the session's function registry so plans
    * can use it via expr("dot_product(a, b)"). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      { args: Seq[Expression] =>
        require(args.length == 2, "dot_product(a, b) takes two arguments")
        DotProduct(args.head, args(1))
      },
      "scala_udf")
}
