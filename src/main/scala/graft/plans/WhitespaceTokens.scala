package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenization as a native Catalyst expression — byte-exact
  * with `regexp_extract_all(s, '\\S+', 0)`, the tokenizer under every
  * text operator in the library ([[graft.functions.Fns.tokens]]).
  *
  * Why not the regex built-in: RegExpExtractAll converts the
  * UTF8String to a Java String (one UTF-16 transcode + copy per row)
  * and runs the java.util.regex machinery per token. Java's `\S` is
  * simply "not one of the six ASCII whitespace chars [ \t\n\x0B\f\r]"
  * (Pattern's \s is ASCII-only without UNICODE_CHARACTER_CLASS), and
  * in UTF-8 a multibyte sequence never contains an ASCII byte — so the
  * token boundaries are computable with one byte scan, and each token
  * wraps the shared byte array zero-copy. Same output on every VALID
  * UTF-8 input, including non-ASCII text and Unicode spaces (which \S
  * treats as token chars, as does this). On MALFORMED UTF-8 the two
  * deliberately diverge in token content (boundaries still match):
  * RegExpExtractAll's transcode replaces invalid sequences with
  * U+FFFD, while this scan preserves the original bytes — the better
  * behavior for dedup/fingerprint consumers, and the one PropertySpec
  * pins (same convention as [[CharNGrams]]).
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens expects string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WhitespaceTokensUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WhitespaceTokensUtil.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)
}

object WhitespaceTokensUtil {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // count runs first: exact-sized output array, no growable buffer
    var n = 0
    var i = 0
    var in = false
    while (i < len) {
      val ws = isWs(bytes(i))
      if (!ws && !in) n += 1
      in = !ws
      i += 1
    }
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    var k = 0
    i = 0
    while (i < len) {
      if (!isWs(bytes(i))) {
        val start = i
        while (i < len && !isWs(bytes(i))) i += 1
        out(k) = UTF8String.fromBytes(bytes, start, i - start)
        k += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }
}
