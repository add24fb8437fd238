package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 32-bit SimHash of a token array in one pass.
  *
  * Per token: one md5; per fingerprint bit i (0..31): vote +1 if hex
  * digit i of the md5 is odd, else −1; bit set iff the summed vote is
  * strictly positive. Identical values to the explode → 32×sum →
  * pack aggregation ([[graft.operators.Dedup.simHash32]] uses this
  * expression; the DuckDB oracle mirrors the aggregation form — same
  * numbers). Turning the aggregate into a projection removes the
  * token-explode shuffle entirely: fingerprinting is scan-speed.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash32Util.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHash32Util.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32Util {
  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val sums = new Array[Int](32)
    var t = 0
    while (t < n) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(toks.getUTF8String(t).getBytes)
      // hex digit i of the digest: high nibble of byte i/2 when i even,
      // low nibble when i odd; odd digit == low bit of the nibble.
      var i = 0
      while (i < 32) {
        val nibble =
          if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xf
          else d(i >> 1) & 0xf
        sums(i) += (if ((nibble & 1) == 1) 1 else -1)
        i += 1
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 32) {
      if (sums(i) > 0) fp |= 1L << i
      i += 1
    }
    fp
  }
}
