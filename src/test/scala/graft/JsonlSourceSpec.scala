package graft

import org.apache.spark.sql.functions._
import graft.operators.EventFlattener
import graft.sources.Tables

/** JSON-lines ingestion — the reference's wire format (one JSON job per
  * line from the queue) through the same flatten path. */
class JsonlSourceSpec extends SparkSpec {

  test("jsonl events read, flatten, and route like parquet events") {
    val dir = tmpDir("jsonl")
    val lines = Seq(
      """{"event_id":1,"event_type":"click","user_id":5,"props":{"k":1,"tags":["a","b"]}}""",
      """{"event_id":2,"event_type":"view","user_id":6,"props":{"k":2,"tags":["c"]}}""",
      """{"event_id":3,"event_type":"click","user_id":5,"props":{"k":3}}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/events.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))

    val raw = Tables.eventsFromJsonl(spark, s"$dir/events.jsonl")
    assert(raw.count() == 3)
    // spark.read.json parses the nested body already; flatten the
    // struct column via its JSON round-trip (the string-body path)
    val stringBody = raw.select(col("event_id"), col("event_type"),
      to_json(col("props")).as("body"))
    val flat = EventFlattener.flatten(stringBody, "body",
      keep = Seq("event_id", "event_type"),
      opts = EventFlattener.Options(detectDates = false))
    assert(flat.columns.toSet == Set("event_id", "event_type", "k", "tags_0", "tags_1"))
    val r1 = flat.orderBy("event_id").collect()(0)
    assert(r1.getAs[String]("tags_1") == "b")
    val byType = flat.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("click" -> 2L, "view" -> 1L))
  }
}
