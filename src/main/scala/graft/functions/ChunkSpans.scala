package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst `Generator` (SURVEY.md §2.K's last stretch row —
  * the true-UDTF mechanism): `chunk_spans(text, chunkTokens, stride)`
  * emits one row per training chunk of a document —
  * `(chunk_id, start_tok, n_tok, chunk)` — with EXACTLY the semantics
  * of the composed form in `TextOps.qTextChunks`
  * (split-on-single-space tokens, starts at stride multiples below
  * the token count, chunk = `chunkTokens` tokens re-joined).
  *
  * Why a Generator when explode+slice already works: the composed
  * plan materializes the full word ARRAY per document, an index
  * sequence, and a sliced copy per chunk — three array allocations of
  * the document's size before any chunk text exists. This generator
  * walks the document's UTF-8 BYTES once (0x20 never occurs inside a
  * multi-byte UTF-8 sequence, so space positions are a byte scan),
  * records token boundaries as integer offsets, and emits each chunk
  * as ONE byte-range slice of a single per-document copy — because
  * tokens are split on single spaces, re-joining a token range with
  * spaces IS the original byte span. Rows stream lazily through
  * `GenerateExec`; nothing per-document is retained past its last
  * chunk. */
case class ChunkSpans(child: Expression, chunkTokens: Expression,
    stride: Expression)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, chunkTokens, stride)

  override def prettyName: String = "chunk_spans"

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("start_tok", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType &&
        chunkTokens.dataType == IntegerType &&
        stride.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "chunk_spans(text, chunkTokens, stride) requires " +
        s"(string, int, int), got (${child.dataType.sql}, " +
        s"${chunkTokens.dataType.sql}, ${stride.dataType.sql})")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input).asInstanceOf[UTF8String]
    val ckv = chunkTokens.eval(input)
    val sdv = stride.eval(input)
    if (t == null || ckv == null || sdv == null) return Iterator.empty
    val ck = ckv.asInstanceOf[Int]
    val sd = sdv.asInstanceOf[Int]
    require(ck > 0 && sd > 0,
      s"chunk_spans needs positive chunkTokens/stride, got $ck/$sd")
    // one private copy per document: emitted chunks alias its bytes,
    // so they must not share a buffer the scan may recycle
    val raw = t.getBytes
    val bytes = java.util.Arrays.copyOf(raw, raw.length)
    var spaces = new Array[Int](8)
    var nSpaces = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) {
        if (nSpaces == spaces.length)
          spaces = java.util.Arrays.copyOf(spaces, spaces.length * 2)
        spaces(nSpaces) = i
        nSpaces += 1
      }
      i += 1
    }
    val boundaries = spaces
    val nTokens = nSpaces + 1 // split-on-" " semantics: empties count
    new Iterator[InternalRow] {
      private var start = 0
      override def hasNext: Boolean = start < nTokens
      override def next(): InternalRow = {
        val lastTok = math.min(start + ck, nTokens) - 1
        val byteFrom = if (start == 0) 0 else boundaries(start - 1) + 1
        val byteTo =
          if (lastTok == nTokens - 1) bytes.length else boundaries(lastTok)
        val row = new GenericInternalRow(Array[Any](
          (start / sd).toLong, start.toLong, (lastTok - start + 1).toLong,
          UTF8String.fromBytes(bytes, byteFrom, byteTo - byteFrom)))
        start += sd
        row
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkSpans =
    copy(child = newChildren(0), chunkTokens = newChildren(1),
      stride = newChildren(2))
}
