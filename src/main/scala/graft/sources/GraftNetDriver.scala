package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.lang.reflect.{InvocationHandler, Method, Proxy => JProxy}
import java.net.Socket
import java.sql.{Connection, DatabaseMetaData, Driver, DriverPropertyInfo,
  PreparedStatement, ResultSet, ResultSetMetaData, SQLException,
  SQLFeatureNotSupportedException}
import java.util.Properties

import scala.collection.mutable

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcType}
import org.apache.spark.sql.types._

/** `jdbc:graftnet://host:port/db` — a REAL network JDBC driver for the
  * [[NetWarehouse]] SQL server (driver-hosted TCP front of embedded
  * Derby). Why it exists: the container ships no network-served
  * database (no derbynet/derbyclient, zero egress), so the
  * executor-parallel half of [[JdbcEventSink]] — Spark's JDBC writer
  * opening one INSERT-batch connection per partition task, and
  * JDBCRDD reads from executor JVMs — could previously only run
  * against `jdbc:derby:memory:`, a one-JVM engine invisible to real
  * executors (the r7 cluster-smoke FAIL). This driver is the honest
  * stand-in: executors speak genuine `java.sql` through real sockets
  * to a catalog served elsewhere, exactly the ClickHouse/Postgres
  * topology, with zero new dependencies.
  *
  * Shape: the client implements the `java.sql` interfaces as
  * dynamic proxies. Data-plane calls are LOCAL (prepared-statement
  * parameters and batches buffer client-side and cross the wire once
  * per executeBatch/executeQuery; result sets materialize once and
  * serve getters locally — no per-cell round trips). Everything else
  * (setAutoCommit, commit, isolation, DatabaseMetaData capability
  * probes) forwards reflectively, so the surface tracks whatever the
  * JDBC consumer calls rather than a hand-enumerated subset.
  * Protocol: length-framed Java serialization, one synchronous
  * request/response per JDBC Connection socket
  * (reference: clickhouse-batch-client.class.ts:1-60 — the reference
  * equally reaches its warehouse over a network client API).
  */
object GraftNet {
  val UrlPrefix = "jdbc:graftnet://"

  /** Typed NULL parameter marker (client buffers `setNull(i, t)`;
    * the server replays it as a real `setNull`). */
  case class NullParam(sqlType: Int) extends Serializable

  private[sources] def parseHostPort(url: String): (String, Int) = {
    require(url.startsWith(UrlPrefix), s"not a graftnet url: $url")
    val rest = url.stripPrefix(UrlPrefix)
    val hostPort = rest.takeWhile(_ != '/')
    val Array(h, p) = hostPort.split(":", 2)
    (h, p.toInt)
  }

  /** Method lookup on the declared INTERFACE (impl classes may be
    * non-public; interface methods are always invocable), matching
    * boxed argument types. */
  private[sources] def reflectCall(iface: Class[_], target: AnyRef,
                                   name: String, args: Array[AnyRef]): AnyRef = {
    val n = if (args == null) 0 else args.length
    val boxed: Class[_] => Class[_] = {
      case java.lang.Integer.TYPE => classOf[java.lang.Integer]
      case java.lang.Long.TYPE => classOf[java.lang.Long]
      case java.lang.Boolean.TYPE => classOf[java.lang.Boolean]
      case java.lang.Double.TYPE => classOf[java.lang.Double]
      case java.lang.Float.TYPE => classOf[java.lang.Float]
      case java.lang.Short.TYPE => classOf[java.lang.Short]
      case java.lang.Byte.TYPE => classOf[java.lang.Byte]
      case java.lang.Character.TYPE => classOf[java.lang.Character]
      case c => c
    }
    val m = iface.getMethods
      .filter(m => m.getName == name && m.getParameterCount == n)
      .find(_.getParameterTypes.zipWithIndex.forall { case (pt, i) =>
        args(i) == null || boxed(pt).isInstance(args(i)) })
      .getOrElse(throw new SQLException(
        s"graftnet: no method $name/$n on ${iface.getName}"))
    try m.invoke(target, (if (args == null) Array.empty[AnyRef] else args): _*)
    catch {
      // unwrap so the server reply carries the real SQLState
      case e: java.lang.reflect.InvocationTargetException => e.getCause match {
        case sq: SQLException => throw sq
        case c => throw new SQLException(s"$name: ${c.getMessage}")
      }
    }
  }
}

/** The `java.sql.Driver` SPI entry point. Spark's DriverRegistry
  * instantiates this BY CLASS NAME on every executor JVM (pass
  * `driver=graft.sources.GraftNetDriver` in the JDBC properties), so
  * it needs nothing but the app jar on the classpath. */
class GraftNetDriver extends Driver {
  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null else new GraftNetClient(url).connection
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(GraftNet.UrlPrefix)
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    throw new SQLFeatureNotSupportedException("graftnet")
}

object GraftNetDriver {
  private lazy val once: Unit = {
    java.sql.DriverManager.registerDriver(new GraftNetDriver); ()
  }
  /** Driver-side DriverManager registration (executors go through
    * Spark's DriverRegistry instead). Idempotent. */
  def ensureRegistered(): Unit = once
}

/** Spark dialect for graftnet URLs: Derby-compatible DDL types (the
  * default dialect's TEXT/BIT(1) are not valid Derby). Registered by
  * [[NetWarehouse]]; serializable so executor closures carry it. */
case object GraftNetDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.startsWith(GraftNet.UrlPrefix)
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType =>
      Some(JdbcType("VARCHAR(32672)", java.sql.Types.VARCHAR))
    case BooleanType => Some(JdbcType("BOOLEAN", java.sql.Types.BOOLEAN))
    case ShortType | ByteType =>
      Some(JdbcType("SMALLINT", java.sql.Types.SMALLINT))
    case d: DecimalType => // Derby max precision is 31
      Some(JdbcType(s"DECIMAL(${math.min(d.precision, 31)},${math.min(d.scale, 30)})",
        java.sql.Types.DECIMAL))
    case _ => None // BIGINT/INTEGER/DOUBLE/REAL/TIMESTAMP/DATE: common mapping is Derby-valid
  }
  // Derby's missing-object SQLStates (table 42Y07/42X05, index X0X05) —
  // without this, Spark's tableExists classifies "table absent" as a
  // hard failure and the CREATE path never runs
  override def isObjectNotFoundException(e: java.sql.SQLException): Boolean =
    Seq("42Y07", "42X05", "X0X05").exists(s => s.equalsIgnoreCase(e.getSQLState))
}

/** One JDBC Connection = one TCP socket to the [[NetWarehouse]].
  * All `java.sql` objects are reflective proxies over this client. */
private[sources] final class GraftNetClient(url: String) {
  import GraftNet._

  private val (host, port) = parseHostPort(url)
  private val sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  private val oos = new ObjectOutputStream(sock.getOutputStream)
  oos.flush()
  private val ois = new ObjectInputStream(sock.getInputStream)
  @volatile private var closed = false

  private def rpc(parts: AnyRef*): AnyRef = synchronized {
    oos.writeObject(parts.toArray)
    oos.reset() // drop handle table: messages are independent
    oos.flush()
    ois.readObject().asInstanceOf[Array[AnyRef]] match {
      case Array("ok", v) => v
      case Array("err", msg: String, state) =>
        // SQLState crosses the wire so consumers (e.g. Spark's
        // isObjectNotFoundException) can classify the failure
        throw new SQLException(msg, state.asInstanceOf[String])
      case other => throw new SQLException(s"graftnet: bad reply $other")
    }
  }

  private def proxy[T](iface: Class[_])(
      h: (AnyRef, Method, Array[AnyRef]) => AnyRef): T =
    JProxy.newProxyInstance(getClass.getClassLoader, Array[Class[_]](iface),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "toString" => s"graftnet-proxy(${iface.getSimpleName})"
            case "hashCode" => Int.box(System.identityHashCode(p))
            case "equals" => Boolean.box(p eq args(0))
            case _ => h(p, m, args)
          }
      }).asInstanceOf[T]

  lazy val connection: Connection = proxy(classOf[Connection]) { (_, m, args) =>
    m.getName match {
      case "createStatement" => statement(None)
      case "prepareStatement" => statement(Some(args(0).asInstanceOf[String]))
      case "getMetaData" => metaData
      case "close" =>
        if (!closed) {
          closed = true
          try rpc("close") catch { case _: Exception => () }
          try sock.close() catch { case _: Exception => () }
        }
        null
      case "isClosed" => Boolean.box(closed)
      case "getWarnings" => null
      case "clearWarnings" | "setClientInfo" | "setNetworkTimeout" => null
      case "isValid" => Boolean.box(!closed)
      case "isWrapperFor" => Boolean.box(false)
      case "unwrap" => throw new SQLException("graftnet: unwrap unsupported")
      // everything else (setAutoCommit/getAutoCommit/commit/rollback/
      // set+getTransactionIsolation/...) runs on the server connection
      case other => rpc("conn", other,
        if (args == null) Array.empty[AnyRef] else args)
    }
  }

  private lazy val metaData: DatabaseMetaData =
    proxy(classOf[DatabaseMetaData]) { (_, m, args) =>
      m.getName match {
        case "getConnection" => connection
        case other => rpc("meta", other,
          if (args == null) Array.empty[AnyRef] else args)
      }
    }

  /** One proxy serves both Statement and PreparedStatement (the
    * interface extends it); parameters and batches buffer locally. */
  private def statement(sql: Option[String]): PreparedStatement = {
    val params = mutable.Map[Int, AnyRef]()
    val batch = mutable.ArrayBuffer[Array[AnyRef]]()
    var lastUpdate = -1
    def denseParams: Array[AnyRef] = {
      val n = if (params.isEmpty) 0 else params.keys.max
      Array.tabulate(n)(i => params.getOrElse(i + 1, null))
    }
    proxy(classOf[PreparedStatement]) { (p, m, args) =>
      m.getName match {
        case "executeQuery" =>
          val (q, pa) =
            if (args != null && args.length == 1)
              (args(0).asInstanceOf[String], Array.empty[AnyRef])
            else (sql.get, denseParams)
          resultSet(rpc("query", q, pa).asInstanceOf[Array[AnyRef]])
        case "executeUpdate" | "execute" | "executeLargeUpdate" =>
          val (q, pa) =
            if (args != null && args.nonEmpty)
              (args(0).asInstanceOf[String], Array.empty[AnyRef])
            else (sql.get, denseParams)
          lastUpdate = rpc("update", q, pa).asInstanceOf[java.lang.Integer].intValue
          m.getName match {
            case "execute" => Boolean.box(false)
            case "executeLargeUpdate" => Long.box(lastUpdate.toLong)
            case _ => Int.box(lastUpdate)
          }
        case "getUpdateCount" => Int.box(lastUpdate)
        case "getLargeUpdateCount" => Long.box(lastUpdate.toLong)
        case "addBatch" => batch += denseParams; null
        case "clearBatch" => batch.clear(); null
        case "executeBatch" =>
          val r = rpc("batch", sql.get, batch.toArray).asInstanceOf[Array[Int]]
          batch.clear()
          r
        case "setNull" =>
          params(args(0).asInstanceOf[Integer].intValue) =
            NullParam(args(1).asInstanceOf[Integer].intValue)
          null
        case "clearParameters" => params.clear(); null
        // single-int knobs and lifecycle — client-side no-ops
        case "setQueryTimeout" | "setFetchSize" | "setMaxRows" |
             "setFetchDirection" | "setEscapeProcessing" | "setPoolable" |
             "setLargeMaxRows" | "close" | "cancel" | "clearWarnings" => null
        case n if n.startsWith("set") && args != null && args.length >= 2 &&
            args(0).isInstanceOf[java.lang.Integer] =>
          // setLong/setString/setBoolean/setObject/... buffer locally;
          // extra args (target type, Calendar) are replayed server-side
          // by setObject on the materialized value
          params(args(0).asInstanceOf[Integer].intValue) = args(1)
          null
        case "isClosed" => Boolean.box(false)
        case "getWarnings" => null
        case "getConnection" => connection
        case "getMoreResults" => Boolean.box(false)
        case "getResultSet" | "getMetaData" | "getGeneratedKeys" => null
        case "isWrapperFor" => Boolean.box(false)
        case other =>
          throw new SQLFeatureNotSupportedException(s"graftnet statement: $other")
      }
    }
  }

  /** Materialized result set: `(schema, rows)` arrive once; getters
    * serve local cells. Schema per column:
    * (label, sqlType, typeName, precision, scale, nullable, signed). */
  private def resultSet(qr: Array[AnyRef]): ResultSet = {
    val schema = qr(0).asInstanceOf[Array[Array[AnyRef]]]
    val rows = qr(1).asInstanceOf[Array[Array[AnyRef]]]
    var idx = -1
    var nullFlag = false
    def colIdx(a: AnyRef): Int = a match {
      case i: java.lang.Integer => i.intValue
      case s: String =>
        val i = schema.indexWhere(_(0) == s)
        if (i < 0) throw new SQLException(s"graftnet: no column $s")
        i + 1
    }
    def cell(args: Array[AnyRef]): AnyRef = {
      val v = rows(idx)(colIdx(args(0)) - 1)
      nullFlag = v == null
      v
    }
    lazy val rsmd: ResultSetMetaData =
      proxy(classOf[ResultSetMetaData]) { (_, m, args) =>
        def col = schema(args(0).asInstanceOf[Integer].intValue - 1)
        m.getName match {
          case "getColumnCount" => Int.box(schema.length)
          case "getColumnName" | "getColumnLabel" => col(0)
          case "getColumnType" => col(1)
          case "getColumnTypeName" => col(2)
          case "getPrecision" => col(3)
          case "getScale" => col(4)
          case "isNullable" => col(5)
          case "isSigned" => col(6)
          case "getCatalogName" | "getSchemaName" | "getTableName" => ""
          case "getColumnClassName" => "java.lang.Object"
          case "getColumnDisplaySize" => Int.box(0)
          case "isAutoIncrement" | "isCurrency" | "isReadOnly" |
               "isWritable" | "isDefinitelyWritable" | "isSearchable" =>
            Boolean.box(false)
          case "isCaseSensitive" => Boolean.box(true)
          case other =>
            throw new SQLFeatureNotSupportedException(s"graftnet rsmd: $other")
        }
      }
    proxy(classOf[ResultSet]) { (_, m, args) =>
      m.getName match {
        case "next" => idx += 1; Boolean.box(idx < rows.length)
        case "wasNull" => Boolean.box(nullFlag)
        case "getMetaData" => rsmd
        case "close" => null
        case "isClosed" => Boolean.box(false)
        case "findColumn" => Int.box(colIdx(args(0)))
        case "getObject" => cell(args)
        case "getLong" =>
          val v = cell(args)
          Long.box(if (v == null) 0L else v.asInstanceOf[Number].longValue)
        case "getInt" =>
          val v = cell(args)
          Int.box(if (v == null) 0 else v.asInstanceOf[Number].intValue)
        case "getShort" =>
          val v = cell(args)
          Short.box(if (v == null) 0 else v.asInstanceOf[Number].shortValue)
        case "getByte" =>
          val v = cell(args)
          Byte.box(if (v == null) 0 else v.asInstanceOf[Number].byteValue)
        case "getDouble" =>
          val v = cell(args)
          Double.box(if (v == null) 0d else v.asInstanceOf[Number].doubleValue)
        case "getFloat" =>
          val v = cell(args)
          Float.box(if (v == null) 0f else v.asInstanceOf[Number].floatValue)
        case "getBoolean" =>
          val v = cell(args)
          Boolean.box(v != null && v.asInstanceOf[java.lang.Boolean].booleanValue)
        case "getString" =>
          val v = cell(args)
          if (v == null) null else v.toString
        case "getBigDecimal" => cell(args)
        case "getTimestamp" => cell(args)
        case "getDate" => cell(args)
        case "getTime" => cell(args)
        case "getBytes" => cell(args)
        case "setFetchSize" | "setFetchDirection" => null
        case "getType" => Int.box(ResultSet.TYPE_FORWARD_ONLY)
        case "isWrapperFor" => Boolean.box(false)
        case other =>
          throw new SQLFeatureNotSupportedException(s"graftnet rs: $other")
      }
    }
  }
}
