package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r9 wire-latency fix: small request/reply RPCs over the
  * network warehouse must not wait out Nagle + delayed-ACK. Before
  * `setTcpNoDelay` on the SERVER's accepted sockets (the client side
  * alone is not enough — replies stall in the server's send buffer),
  * each RPC measured ~47 ms on loopback (the classic 40 ms delayed-ACK
  * stall); after, ~3 ms. The per-RPC stall multiplied across every
  * schema probe, ALTER, and INSERT batch — a17's two warehouse drains
  * went 13.4 s → 5.8 s and a15b 3.2 s → 1.8 s at sf0.1 when it was
  * removed. Threshold 25 ms/RPC: ~7× above the fixed cost, ~2× below
  * the stall it guards against, so a reintroduced Nagle stall fails
  * even on a loaded host. */
class NetLatencySpec extends AnyFunSuite {

  test("warm-connection RPC round trips stay in the no-Nagle regime") {
    val wh = new graft.sources.NetWarehouse("netlat")
    try {
      graft.sources.GraftNetDriver.ensureRegistered()
      val c = java.sql.DriverManager.getConnection(wh.url)
      try {
        c.createStatement().execute("CREATE TABLE netlat_t (x INT)")
        // warm-up (JIT + server thread)
        (0 until 5).foreach { i =>
          val ps = c.prepareStatement("INSERT INTO netlat_t VALUES (?)")
          ps.setInt(1, i); ps.executeUpdate(); ps.close()
        }
        // median of per-RPC times, retried once: a GC pause or a
        // contended host inflates the MEAN of a wall-clock window, but
        // a Nagle/delayed-ACK stall inflates EVERY round trip — the
        // median separates the two, and one retry absorbs a whole
        // unlucky window without weakening the regression signal
        def medianPerRpcMs(n: Int): Double = {
          val ts = (0 until n).map { i =>
            val t0 = System.nanoTime()
            val ps = c.prepareStatement("INSERT INTO netlat_t VALUES (?)")
            ps.setInt(1, i); ps.executeUpdate(); ps.close()
            (System.nanoTime() - t0) / 1e6
          }.sorted
          ts(n / 2)
        }
        val first = medianPerRpcMs(40)
        val perRpcMs = if (first < 25.0) first else medianPerRpcMs(40)
        info(f"median per-RPC round trip: $perRpcMs%.2f ms")
        assert(perRpcMs < 25.0,
          f"median RPC at $perRpcMs%.2f ms (twice) — delayed-ACK stall " +
            "is back? (check setTcpNoDelay on BOTH the client socket " +
            "and the server's accepted sockets)")
      } finally c.close()
    } finally wh.close()
  }
}
