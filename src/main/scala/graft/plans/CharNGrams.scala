package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-grams as a native Catalyst expression — the char-level
  * sibling of [[WordNGrams]], and necessary for the same reason at a
  * sharper degree: the composed form `transform(sequence(1, L−n+1),
  * i -> substr(s, i, n))` re-evaluates its INPUT expression inside
  * every lambda frame, so feeding it a normalized string (a regex
  * replace) costs O(L) regex work × L positions = O(L²) per document
  * — measured 16 s for a 1.5 M-trigram corpus that this expression
  * handles at scan speed. One substring() walk per row, codegen'd via
  * a static call.
  *
  * Windows are CODEPOINT-aligned (UTF8String.substring counts chars,
  * not bytes), matching DuckDB's `s[i:i+n-1]` slicing on multibyte
  * text. Empty array under n chars.
  */
case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    CharNGramsUtil.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CharNGramsUtil.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGramsUtil {
  /** Sliding `n`-codepoint windows; empty when fewer than `n`.
    *
    * NOT `s.substring(i, i+n)` per window: UTF8String.substring walks
    * bytes from position 0 to locate codepoint `i` every call (UTF-8
    * offsets aren't random-access), which makes the loop O(L²) in
    * byte-scans per document — for the multi-KB docs the LM scorers
    * (c46/c60) feed through here that quadratic constant dominated the
    * query. One O(L) walk records every codepoint's byte offset, then
    * each window wraps the shared byte array zero-copy. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val bLen = bytes.length
    // codepoint start offsets (+ terminal); ASCII-or-worse sizing
    val starts = new Array[Int](bLen + 1)
    var nc = 0
    var off = 0
    while (off < bLen) {
      starts(nc) = off
      // malformed leading byte still advances ≥1, and the window end
      // clamps to the byte length, so a bad sequence can't loop or
      // overrun. The clamp is a DELIBERATE divergence from
      // UTF8String.substring on one input class: a truncated multibyte
      // sequence at the end of the buffer makes substring's until-walk
      // overshoot numBytes, and its copyMemory then READS PAST THE
      // BUFFER, appending whatever heap bytes follow (observed: a 0x00
      // suffix on the final windows). Identical output on all valid
      // UTF-8 and on malformed sequences anywhere but the tail;
      // PropertySpec pins both the equivalence and the clamp.
      off += math.max(1, UTF8String.numBytesForFirstByte(bytes(off)))
      nc += 1
    }
    starts(nc) = bLen
    val num = nc - (n - 1)
    if (num <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](num)
    var i = 0
    while (i < num) {
      val a = starts(i)
      out(i) = UTF8String.fromBytes(bytes, a, math.min(starts(i + n), bLen) - a)
      i += 1
    }
    new GenericArrayData(out)
  }
}
