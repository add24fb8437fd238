package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array in one pass.
  *
  * Per token: one md5; per fingerprint bit i (0..63): the vote source
  * is bit (i mod 4) of hex digit (i div 4) of the digest — the first
  * 64 digest bits, read nibble-by-nibble so the DuckDB oracle can
  * mirror it from `md5(tok)`'s hex string with substr+strpos. Vote +1
  * when the bit is set, −1 otherwise; fingerprint bit set iff the
  * summed vote is strictly positive.
  *
  * 64 bits (upgraded from 32 in r9, after the sf1 sweep measured the
  * pairing cost): [[graft.operators.Dedup.simHashPairs]] bands the
  * fingerprint for the hamming-≤3 join, and the band join's cost is
  * Σ bucket² per band. Band-key space is what bounds buckets —
  * 4 bands × 8 bits gave 256 buckets/band, so buckets grow as N/256
  * and the join as N²/16384·4; 4 bands × 16 bits gives 65 536, a
  * 256× lower collision coefficient at the same pigeonhole-exact
  * hamming ≤ 3 guarantee (Manku et al., WWW'07 use the same 64-bit
  * shape for web-scale near-dup detection).
  *
  * Turning the 64-sum aggregate into a projection removes the
  * token-explode shuffle entirely: fingerprinting is scan-speed.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Util.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHash64Util.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64Util {
  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val sums = new Array[Int](64)
    val md = Md5.get() // digest() resets it, so one instance serves the loop
    var t = 0
    while (t < n) {
      val d = md.digest(toks.getUTF8String(t).getBytes)
      var i = 0
      while (i < 64) {
        // hex digit j of the digest string: high nibble of byte j/2
        // when j even, low nibble when j odd (hex rendering order)
        val j = i >> 2
        val nibble =
          if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xf
          else d(j >> 1) & 0xf
        sums(i) += (if (((nibble >> (i & 3)) & 1) == 1) 1 else -1)
        i += 1
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (sums(i) > 0) fp |= 1L << i
      i += 1
    }
    fp
  }
}
