package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{ChunkSpans, DotProduct, FreqSketch, SrpFingerprint}

/** Session extensions (SURVEY.md §2.K): installs the engine's native
  * expressions into every session built with
  * `spark.sql.extensions=graft.GraftExtensions` (Verify/Bench set this),
  * making them available to SQL (`SELECT dot_product(a, b)`) as well as
  * the DataFrame API — the idiomatic Spark packaging for a library's
  * Catalyst additions. `graft.functions.VectorExprs.register` remains
  * as a per-session fallback for externally built sessions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      { args: Seq[Expression] =>
        require(args.length == 2, "dot_product(a, b) takes two arguments")
        DotProduct(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("srp_fingerprint"),
      new ExpressionInfo(classOf[SrpFingerprint].getName, "srp_fingerprint"),
      { args: Seq[Expression] =>
        require(args.length == 2,
          "srp_fingerprint(vec, nBits) takes two arguments")
        SrpFingerprint(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("chunk_spans"),
      new ExpressionInfo(classOf[ChunkSpans].getName, "chunk_spans"),
      { args: Seq[Expression] =>
        require(args.length == 3,
          "chunk_spans(text, chunkTokens, stride) takes three arguments")
        ChunkSpans(args.head, args(1), args(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("freq_sketch"),
      new ExpressionInfo(classOf[FreqSketch].getName, "freq_sketch"),
      { args: Seq[Expression] =>
        require(args.length == 2,
          "freq_sketch(col, k) takes a column and a literal k")
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"freq_sketch k must be an integer literal, got $other")
        }
        FreqSketch(args.head, k)
      }))
  }
}
