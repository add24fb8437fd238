package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.sql.{Connection, DatabaseMetaData, DriverManager, ResultSet,
  SQLException}

import scala.collection.mutable

import org.apache.spark.sql.jdbc.JdbcDialects

/** A network-served SQL warehouse for the cluster-smoke topology: a
  * TCP server fronting embedded Derby, consumed through the genuine
  * `java.sql` SPI by [[GraftNetDriver]]. Each client connection gets
  * its OWN Derby connection on its own thread, so Spark's JDBC writer
  * tasks — one INSERT-batch connection per partition, opened inside
  * executor JVMs — run truly parallel against one catalog, which is
  * exactly the property `jdbc:derby:memory:` could not give real
  * executors (r7 cluster smoke, docs/SCALE.md). Binds loopback (the
  * local-cluster harness is single-host); a multi-host deployment
  * would bind a routable address — the URL is still the only seam.
  *
  * Like [[QueueBroker]]: zero-egress, zero new dependencies, and the
  * Spark side touches only public network APIs — no shared-memory
  * shortcut (the data plane crosses the wire as framed batches).
  */
final class NetWarehouse(dbName: String) extends AutoCloseable {
  import GraftNet.NullParam

  private val derbyUrl = s"jdbc:derby:memory:$dbName"
  // fresh catalog per warehouse: drop any leftover db, then create
  try { DriverManager.getConnection(s"$derbyUrl;drop=true").close(); () }
  catch { case _: SQLException => () } // drop "fails" when absent
  DriverManager.getConnection(s"$derbyUrl;create=true").close()
  NetWarehouse.registerClientSide()

  private val server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
  @volatile private var running = true

  def host: String = InetAddress.getLoopbackAddress.getHostAddress
  def port: Int = server.getLocalPort
  def url: String = s"${GraftNet.UrlPrefix}$host:$port/$dbName"

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        // without this, every small reply waits out Nagle + delayed-ACK
        // (~40 ms per RPC measured on loopback — the client side alone
        // is not enough, replies stall in the server's send buffer)
        sock.setTcpNoDelay(true)
        val t = new Thread(() => serve(sock))
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () } // closed during accept
    }
  }, s"net-warehouse-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  private def setParams(ps: java.sql.PreparedStatement,
                        params: Array[AnyRef]): Unit =
    params.zipWithIndex.foreach {
      case (NullParam(t), i) => ps.setNull(i + 1, t)
      case (null, i) => ps.setNull(i + 1, java.sql.Types.VARCHAR)
      case (v, i) => ps.setObject(i + 1, v)
    }

  /** Pull the whole result across as serializable cells (one message,
    * not one RPC per cell); LOB handles become values. */
  private def materialize(rs: ResultSet): Array[AnyRef] = {
    val md = rs.getMetaData
    val n = md.getColumnCount
    val schema = Array.tabulate(n) { i =>
      val c = i + 1
      Array[AnyRef](md.getColumnLabel(c), Int.box(md.getColumnType(c)),
        md.getColumnTypeName(c), Int.box(md.getPrecision(c)),
        Int.box(md.getScale(c)), Int.box(md.isNullable(c)),
        Boolean.box(md.isSigned(c)))
    }
    val rows = mutable.ArrayBuffer[Array[AnyRef]]()
    while (rs.next()) rows += Array.tabulate[AnyRef](n) { i =>
      rs.getObject(i + 1) match {
        case c: java.sql.Clob => c.getSubString(1, c.length().toInt)
        case b: java.sql.Blob => b.getBytes(1, b.length().toInt)
        case v => v
      }
    }
    Array[AnyRef](schema, rows.toArray)
  }

  private def serve(sock: Socket): Unit = {
    // Setup can fail (db dropped while a connection races in); the socket
    // must close on ANY path, so acquire everything inside the try.
    var conn: Connection = null
    try {
      conn = DriverManager.getConnection(derbyUrl)
      val ois = new ObjectInputStream(sock.getInputStream)
      val oos = new ObjectOutputStream(sock.getOutputStream)
      oos.flush()
      var open = true
      while (open) {
        val msg = ois.readObject().asInstanceOf[Array[AnyRef]]
        val reply: Array[AnyRef] =
          try {
            val result: AnyRef = msg(0).asInstanceOf[String] match {
              case "query" =>
                val sql = msg(1).asInstanceOf[String]
                val params = msg(2).asInstanceOf[Array[AnyRef]]
                val ps = conn.prepareStatement(sql)
                try { setParams(ps, params); materialize(ps.executeQuery()) }
                finally ps.close()
              case "update" =>
                val sql = msg(1).asInstanceOf[String]
                val params = msg(2).asInstanceOf[Array[AnyRef]]
                if (params.isEmpty) {
                  val st = conn.createStatement()
                  try Int.box(st.executeUpdate(sql)) finally st.close()
                } else {
                  val ps = conn.prepareStatement(sql)
                  try { setParams(ps, params); Int.box(ps.executeUpdate()) }
                  finally ps.close()
                }
              case "batch" =>
                val sql = msg(1).asInstanceOf[String]
                val rows = msg(2).asInstanceOf[Array[Array[AnyRef]]]
                val ps = conn.prepareStatement(sql)
                try {
                  rows.foreach { r => setParams(ps, r); ps.addBatch() }
                  ps.executeBatch()
                } finally ps.close()
              case "conn" =>
                GraftNet.reflectCall(classOf[Connection], conn,
                  msg(1).asInstanceOf[String], msg(2).asInstanceOf[Array[AnyRef]])
              case "meta" =>
                GraftNet.reflectCall(classOf[DatabaseMetaData], conn.getMetaData,
                  msg(1).asInstanceOf[String], msg(2).asInstanceOf[Array[AnyRef]])
              case "close" =>
                open = false
                null
              case other => throw new SQLException(s"unknown command $other")
            }
            result match {
              case _: ResultSet => Array[AnyRef]("err",
                "graftnet: method returning ResultSet not supported", null)
              case v => Array[AnyRef]("ok", v)
            }
          } catch {
            case e: Throwable =>
              val state = e match {
                case s: SQLException => s.getSQLState
                case _ => null
              }
              Array[AnyRef]("err",
                s"${e.getClass.getSimpleName}: ${e.getMessage}", state)
          }
        oos.writeObject(reply)
        oos.reset()
        oos.flush()
      }
    } catch { case _: Exception => () } // client went away / setup failed
    finally {
      if (conn != null) {
        try { if (!conn.getAutoCommit) conn.rollback() } catch { case _: Exception => () }
        try conn.close() catch { case _: Exception => () }
      }
      try sock.close() catch { case _: Exception => () }
    }
  }

  override def close(): Unit = {
    running = false
    try server.close() catch { case _: Exception => () }
    try { DriverManager.getConnection(s"$derbyUrl;drop=true").close(); () }
    catch { case _: SQLException => () } // drop reports via exception
  }
}

object NetWarehouse {
  @volatile private var clientSideDone = false
  /** Driver-JVM-side wiring, once: the JDBC driver in DriverManager
    * (executors instead load it via Spark's DriverRegistry from the
    * `driver` property) and the Derby-typed dialect in Spark's
    * dialect registry. */
  private[sources] def registerClientSide(): Unit = synchronized {
    if (!clientSideDone) {
      GraftNetDriver.ensureRegistered()
      JdbcDialects.registerDialect(GraftNetDialect)
      clientSideDone = true
    }
  }
}
