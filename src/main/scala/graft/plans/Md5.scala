package graft.plans

/** Thread-local reusable MD5 digest for hot-path expressions.
  *
  * `MessageDigest.getInstance` walks the JCA provider list and
  * allocates on every call; the token-level hash loops here
  * ([[SimHash64Util]]: one digest per token, [[MinHashWindowsUtil]]:
  * two per shingle, [[BottomKByHash]]: one per row) would otherwise
  * pay that per hash. Tasks are single-threaded per partition, so a
  * thread-local instance is safe; `digest()` resets the instance
  * after each use, and [[get]] resets defensively anyway in case a
  * caller aborted mid-update.
  */
private[graft] object Md5 {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def get(): java.security.MessageDigest = {
    val md = tl.get()
    md.reset()
    md
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Lowercase hex of a digest, loop-rendered (no per-byte format). */
  def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
