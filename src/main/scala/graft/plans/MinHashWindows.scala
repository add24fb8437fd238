package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All 8 MinHash components of a shingle set in one pass.
  *
  * Component j is the minimum over shingles of an 8-hex-char window of
  * md5(s) (j<4) or md5(s || "#") (j≥4) — identical values to
  * [[graft.functions.Fns.minHash]], which the DuckDB oracle mirrors.
  * The composed form hashes every shingle twice per *component* (two
  * interpreted transform+array_min passes × 8); here each shingle is
  * hashed exactly twice total and the 8 running minima update in the
  * same loop. Returns array<string> [h0..h7]; null/empty input →
  * empty result handled by the caller's filter.
  */
case class MinHashWindows(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_windows"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_windows expects array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashWindowsUtil.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MinHashWindowsUtil.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashWindows =
    copy(child = newChild)
}

object MinHashWindowsUtil {
  private val Salt = "#".getBytes("UTF-8")

  private def md5hex(bytes: Array[Byte], salted: Boolean): String = {
    val md = Md5.get()
    md.update(bytes)
    if (salted) md.update(Salt)
    Md5.hex(md.digest())
  }

  /** [h0..h7]: running minima of the 4 windows of each of 2 digests. */
  def compute(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[String](8)
    var i = 0
    while (i < n) {
      val bytes = shingles.getUTF8String(i).getBytes
      val m1 = md5hex(bytes, salted = false)
      val m2 = md5hex(bytes, salted = true)
      var j = 0
      while (j < 4) {
        val w1 = m1.substring(j * 8, j * 8 + 8)
        if (mins(j) == null || w1 < mins(j)) mins(j) = w1
        val w2 = m2.substring(j * 8, j * 8 + 8)
        if (mins(j + 4) == null || w2 < mins(j + 4)) mins(j + 4) = w2
        j += 1
      }
      i += 1
    }
    if (n == 0) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(mins.map(UTF8String.fromString(_): Any))
  }
}
