package graft

import java.sql.{DriverManager, SQLException}

import org.apache.spark.sql.functions._
import graft.sources.{GraftNetDriver, JdbcEventSink, NetWarehouse}

/** The networked warehouse seam ([[graft.sources.NetWarehouse]] +
  * [[graft.sources.GraftNetDriver]]): the SAME
  * `JdbcEventSink.evolveAppend` flow that runs against embedded Derby
  * must behave identically when every byte crosses a real TCP socket
  * through the `java.sql` SPI — including the failure classification
  * (SQLStates over the wire) Spark's CREATE path depends on. */
class NetWarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("evolveAppend over the wire == evolveAppend embedded") {
    val wh = new NetWarehouse("graft_nw_spec1")
    val embUrl = "jdbc:derby:memory:graft_nw_emb1"
    try { DriverManager.getConnection(s"$embUrl;drop=true").close(); () }
    catch { case _: SQLException => () }
    DriverManager.getConnection(s"$embUrl;create=true").close()
    try {
      val b1 = Seq((1L, 10L), (2L, 20L)).toDF("id", "cents")
        .repartition(3) // >1 partition → >1 writer connection
      val b2 = Seq((3L, "usd_30", true), (4L, "usd_40", false))
        .toDF("id", "cents", "flag") // widen + add in one batch
      for (url <- Seq(wh.url, embUrl)) {
        JdbcEventSink.evolveAppend(spark, b1, url, "t")
        JdbcEventSink.evolveAppend(spark, b2, url, "t")
      }
      val over = JdbcEventSink.readTable(spark, wh.url, "t")
        .orderBy("id").collect().map(_.toSeq).toSeq
      val emb = JdbcEventSink.readTable(spark, embUrl, "t")
        .orderBy("id").collect().map(_.toSeq).toSeq
      assert(over == emb)
      assert(over.map(_.head) == Seq(1L, 2L, 3L, 4L))
      // widened column really is string; old rows NULL in the added col
      assert(over(0)(1) == "10" && over(2)(1) == "usd_30")
      assert(over(0)(2) == null && over(2)(2) == true)
    } finally {
      wh.close()
      try { DriverManager.getConnection(s"$embUrl;drop=true").close(); () }
      catch { case _: SQLException => () }
    }
  }

  test("missing-table probe classifies as absent (SQLState over the wire)") {
    val wh = new NetWarehouse("graft_nw_spec2")
    try {
      // tableSchema must see "absent", not a hard failure — this is
      // the path Spark's tableExists takes before CREATE
      assert(JdbcEventSink.tableSchema(spark, wh.url, "nope").isEmpty)
      GraftNetDriver.ensureRegistered()
      val c = DriverManager.getConnection(wh.url)
      try {
        val e = intercept[SQLException] {
          c.createStatement().executeQuery("SELECT * FROM nope")
        }
        assert(e.getSQLState == "42X05", s"state was ${e.getSQLState}")
      } finally c.close()
    } finally wh.close()
  }

  test("typed nulls, booleans, and batches survive the protocol") {
    val wh = new NetWarehouse("graft_nw_spec3")
    try {
      GraftNetDriver.ensureRegistered()
      val c = DriverManager.getConnection(wh.url)
      try {
        c.createStatement().executeUpdate(
          "CREATE TABLE p (i BIGINT, s VARCHAR(20), b BOOLEAN)")
        val ps = c.prepareStatement("INSERT INTO p VALUES (?, ?, ?)")
        ps.setLong(1, 7L); ps.setString(2, "x"); ps.setBoolean(3, true)
        ps.addBatch()
        ps.setLong(1, 8L); ps.setNull(2, java.sql.Types.VARCHAR)
        ps.setNull(3, java.sql.Types.BOOLEAN)
        ps.addBatch()
        assert(ps.executeBatch().toSeq == Seq(1, 1))
        val rs = c.createStatement()
          .executeQuery("SELECT i, s, b FROM p ORDER BY i")
        assert(rs.next())
        assert(rs.getLong(1) == 7L && !rs.wasNull())
        assert(rs.getString(2) == "x" && rs.getBoolean(3))
        assert(rs.next())
        assert(rs.getLong(1) == 8L)
        assert(rs.getString(2) == null && rs.wasNull())
        assert(!rs.getBoolean(3) && rs.wasNull())
        assert(!rs.next())
        val md = rs.getMetaData
        assert(md.getColumnCount == 3 && md.getColumnName(1) == "I")
        // control-plane reflective forwarding
        assert(c.getMetaData.supportsTransactions())
        c.setAutoCommit(false)
        assert(!c.getAutoCommit)
        c.rollback()
        c.setAutoCommit(true)
      } finally c.close()
    } finally wh.close()
  }
}
