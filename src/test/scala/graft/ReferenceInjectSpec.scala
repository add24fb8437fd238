package graft

import org.apache.spark.sql.functions._
import graft.operators.{ChTypes, EventFlattener}

/** Replay of the reference's OWN test payloads
  * (reference: src/test/inject.ts — two `event_session` jobs) through
  * graft's flatten/infer path, asserting the outcomes the reference's
  * flattener + type inference produce for exactly these shapes. */
class ReferenceInjectSpec extends SparkSpec {
  import spark.implicits._

  // inject.ts job 1 (toto commented out there) + job 2; `truc: new
  // Date()` JSON-serializes to the ISO-Z form, pinned here.
  private val job1 =
    """{"event_type":"event_session","zozo":"yolo","bibi":"bonjour",
       "mais":23,"truc":"2026-08-12T07:00:00.000Z","zaza":"2024-12-01",
       "yolo":"2034 12 01","momo":"02/02/2045"}""".replaceAll("\n\\s*", "")
  private val job2 =
    """{"event_type":"event_session","objectMoche":{"profond":1,"dest":true},
       "manger":["dupain"],"ba cest un":"test","toto":true,"zozo":"yolo",
       "bibi":false,"mais":23,"truc":"2026-08-12T07:05:00.000Z",
       "zaza":"2024-12-01","yolo":"2034 12 01","momo":"02/02/2045"}"""
      .replaceAll("\n\\s*", "")

  private lazy val flat = EventFlattener.flatten(
    Seq((1L, job1), (2L, job2)).toDF("job_id", "body"), "body",
    keep = Seq("job_id"))

  test("reference payloads flatten to the reference's column set") {
    // snake_case keys, parent_child nesting, indexed array, reserved
    // event_type dropped (batch-client:190-273)
    assert(flat.columns.toSet == Set("job_id",
      "zozo", "bibi", "mais", "truc", "zaza", "yolo", "momo",
      "object_moche_profond", "object_moche_dest", "manger_0",
      "ba_cest_un", "toto"))
  }

  test("date-ish strings promote exactly as the reference's isDateString does") {
    val types = flat.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("zaza") == "timestamp")  // ISO date
    assert(types("momo") == "timestamp")  // US slash date (dayjs-valid)
    assert(types("truc") == "timestamp")  // JSON.stringify(new Date())
    assert(types("yolo") == "string")     // "2034 12 01": regex prefix fails
    val r = flat.orderBy("job_id").collect()(0)
    assert(r.getAs[java.sql.Timestamp]("momo").toString.startsWith("2045-02-02"))
    assert(r.getAs[java.sql.Timestamp]("truc").toString.startsWith("2026-08-12"))
  }

  test("mixed/boolean/int columns infer the reference's ClickHouse types") {
    val kv = Seq(
      "mais" -> "23", "mais" -> "23",
      "toto" -> "true",
      "bibi" -> "bonjour", "bibi" -> "false", // mixed -> String
      "zaza" -> "2024-12-01", "zaza" -> "2024-12-01",
      "truc" -> "2026-08-12T07:00:00.000Z",
      "yolo" -> "2034 12 01",
      "momo" -> "02/02/2045"
    ).toDF("key", "value")
    val types = ChTypes.inferFromStrings(kv).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(types == Map(
      "mais" -> "Int64", "toto" -> "UInt8", "bibi" -> "String",
      "zaza" -> "DateTime64(6)", "truc" -> "DateTime64(6)",
      "momo" -> "DateTime64(6)", "yolo" -> "String"))
  }

  test("typed values survive: nested record fields, array item, space key") {
    val r2 = flat.orderBy("job_id").collect()(1)
    assert(r2.getAs[Long]("object_moche_profond") == 1L)
    assert(r2.getAs[Boolean]("object_moche_dest"))
    assert(r2.getAs[String]("manger_0") == "dupain")
    assert(r2.getAs[String]("ba_cest_un") == "test")
    assert(r2.getAs[Boolean]("toto"))
    // job 1 lacks toto/objectMoche/manger: null-padded
    val r1 = flat.orderBy("job_id").collect()(0)
    assert(r1.isNullAt(r1.fieldIndex("toto")))
    assert(r1.isNullAt(r1.fieldIndex("manger_0")))
  }
}
