package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark re-expression of the reference's event "preparation" pipeline
  * (reference: src/clickhouse-batch-client.class.ts:190-448).
  *
  * The reference walks every row in JS, building one flattened record
  * at a time: keys snake_cased, nested records split into
  * `parent_child` columns, arrays split into `key_0, key_1, …` indexed
  * columns, reserved bookkeeping keys dropped, and column types
  * inferred from the first value's string form.
  *
  * Here all of that is **plan-time work + one codegen'd projection**:
  *  - structure comes from Spark's distributed JSON schema inference
  *    (sampled at scale via [[Options.sampleFraction]]);
  *  - the flatten itself is a single `from_json` + `getField`/
  *    `element_at` projection — no per-row driver logic, fully
  *    columnar, works identically on 100 TB;
  *  - date-string detection (reference: src/utils.ts isDateString) is
  *    an aggregate over the column, not a peek at the first row, so it
  *    is deterministic under parallelism.
  */
object EventFlattener {

  /** Mirrors the reference's env knobs SPLIT_RECORDS_AS_COLUMNS /
    * SPLIT_ARRAY_ITEMS_AS_COLUMNS (reference: src/main.ts:147-150). */
  case class Options(
      splitRecords: Boolean = true,
      splitArrays: Boolean = true,
      maxArrayItems: Int = 16,
      detectDates: Boolean = true,
      sampleFraction: Double = 1.0,
      reserved: Set[String] = defaultReserved)

  /** reference: src/clickhouse-batch-client.class.ts:196-205 */
  val defaultReserved: Set[String] = Set(
    "event_type", "__is_single_retry", "__single_retry_attempts",
    "__is_from_old_queue", "__bulker_full_attempts", "__received_at")

  /** lodash.snakecase-ish: camelCase boundaries + non-alphanumeric
    * separators → lower snake_case. */
  def snakeCase(s: String): String =
    s.replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
      .split("[^A-Za-z0-9]+").filter(_.nonEmpty).mkString("_").toLowerCase

  /** Date-string shapes the flattener promotes to timestamps:
    * ISO date / datetime (incl. the `...T...Z` / offset forms
    * JSON.stringify(new Date()) emits — the reference's own test
    * injects exactly that shape and its isDateString accepts it), or
    * US slash dates (dayjs-parseable forms the reference's regex
    * `^([0-9]{2}([0-9]{2})?(\/|-))+` accepts). */
  val DateRe: String =
    "^\\d{4}-\\d{2}-\\d{2}([T ]\\d{2}:\\d{2}(:\\d{2}(\\.\\d{1,6})?)?(Z|[+-]\\d{2}:\\d{2})?)?$" +
      "|^\\d{2}/\\d{2}/\\d{4}$"

  /** Distributed JSON structure inference over a string column. */
  def inferStructure(df: DataFrame, jsonCol: String, opts: Options = Options()): StructType = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(jsonCol)).na.drop().as[String]
    val sampled = if (opts.sampleFraction < 1.0) ds.sample(opts.sampleFraction, 42L) else ds
    spark.read.json(sampled).schema
  }

  /** Flatten `jsonCol` into typed top-level columns, keeping `keep`
    * passthrough columns. One inference pass + one stats pass (array
    * max-lengths, date-likeness) + one projection. */
  def flatten(df: DataFrame, jsonCol: String, keep: Seq[String] = Nil,
              opts: Options = Options()): DataFrame = {
    val schema = inferStructure(df, jsonCol, opts)
    flattenWithSchema(df, jsonCol, schema, keep, opts)
  }

  def flattenWithSchema(df: DataFrame, jsonCol: String, schema: StructType,
                        keep: Seq[String] = Nil, opts: Options = Options()): DataFrame = {
    val parsed = from_json(col(jsonCol), schema)
    val withParsed = df.withColumn("__graft_json", parsed)
    val root = col("__graft_json")

    // First pass over the *schema*: leaf plan with unresolved array widths.
    val arrayPaths = collectArrayPaths("", schema)

    // Data-driven facts — per-array max length and per-string-leaf
    // date-likeness — gathered in ONE aggregate action over one scan
    // (each agg pass re-parses the JSON column; don't pay it twice).
    val arrayAggs =
      if (!opts.splitArrays) Nil
      else arrayPaths.map { case (path, c) => max(size(c(root))).as(s"len:$path") }

    // Array widths must resolve before leaves exist, but date detection
    // needs the leaf plan — build leaves in two stages around one agg:
    // stage 1 derives the string-leaf columns from a zero-width plan
    // (widths only gate array-indexed leaves, whose dates we detect per
    // item anyway from the same leaf expression shapes).
    val probeLeaves = leafColumns("", root, schema, opts,
        arrayPaths.map { case (p, _) => p -> opts.maxArrayItems }.toMap)
      .filterNot { case (name, _, _) => opts.reserved.map(snakeCase).contains(name) }
    val stringLeaves = probeLeaves.collect { case (n, c, StringType) => (n, c) }
    val dateAggs =
      if (!opts.detectDates) Nil
      else stringLeaves.map { case (n, c) =>
        (bool_and(c.isNull || c.rlike(DateRe)) && max(c.isNotNull)).as(s"date:$n")
      }

    val allAggs = arrayAggs ++ dateAggs
    val statsRow =
      if (allAggs.isEmpty) null
      else withParsed.agg(allAggs.head, allAggs.tail: _*).collect()(0)

    val maxLens: Map[String, Int] =
      if (arrayAggs.isEmpty) Map.empty
      else arrayPaths.zipWithIndex.map { case ((path, _), i) =>
        path -> (if (statsRow.isNullAt(i)) 0 else statsRow.getInt(i))
      }.toMap

    val dateCols: Set[String] =
      if (dateAggs.isEmpty) Set.empty
      else {
        val off = arrayAggs.length
        stringLeaves.zipWithIndex.collect {
          case ((n, _), i) if !statsRow.isNullAt(off + i) && statsRow.getBoolean(off + i) => n
        }.toSet
      }

    val leaves0 = leafColumns("", root, schema, opts, maxLens)
      .filterNot { case (name, _, _) => opts.reserved.map(snakeCase).contains(name) }

    val projected = leaves0.map {
      case (n, c, StringType) if dateCols(n) =>
        coalesce(try_to_timestamp(c), try_to_timestamp(c, lit("MM/dd/yyyy"))).as(n)
      case (n, c, _) => c.as(n)
    }
    withParsed.select(keep.map(col) ++ projected: _*)
  }

  /** Struct-path descent to every array column (arrays nested inside
    * arrays fall back to JSON strings, as the reference stringifies
    * anything deeper than record-in-array). */
  private def collectArrayPaths(prefix: String, dt: DataType,
                                path: Column => Column = identity): Seq[(String, Column => Column)] =
    dt match {
      case st: StructType => st.fields.toSeq.flatMap { f =>
        val p = if (prefix.isEmpty) snakeCase(f.name) else s"${prefix}_${snakeCase(f.name)}"
        collectArrayPaths(p, f.dataType, root => path(root).getField(f.name))
      }
      case ArrayType(et, _) =>
        val here = Seq(prefix -> path)
        et match {
          case st: StructType => here // struct-in-array fields counted via parent length
          case _ => here
        }
      case _ => Nil
    }

  /** Leaf projection plan: (snake_name, column, leafType). */
  private def leafColumns(prefix: String, c: Column, dt: DataType,
                          opts: Options, maxLens: Map[String, Int]): Seq[(String, Column, DataType)] =
    dt match {
      case st: StructType if opts.splitRecords || prefix.isEmpty =>
        st.fields.toSeq.flatMap { f =>
          val p = if (prefix.isEmpty) snakeCase(f.name) else s"${prefix}_${snakeCase(f.name)}"
          leafColumns(p, c.getField(f.name), f.dataType, opts, maxLens)
        }
      case _: StructType =>
        Seq((prefix, to_json(c), StringType))
      case ArrayType(et, _) if opts.splitArrays && isFlattenableElement(et, opts) =>
        val n = math.min(maxLens.getOrElse(prefix, 0), opts.maxArrayItems)
        (0 until n).flatMap { i =>
          val item = try_element_at(c, lit(i + 1))
          et match {
            case st: StructType if opts.splitRecords =>
              st.fields.toSeq.flatMap { f =>
                leafColumns(s"${prefix}_${i}_${snakeCase(f.name)}",
                  item.getField(f.name), f.dataType, opts, maxLens)
              }
            case st: StructType =>
              Seq((s"${prefix}_$i", to_json(item), StringType))
            case _ =>
              Seq((s"${prefix}_$i", item, et))
          }
        }
      case _: ArrayType =>
        Seq((prefix, to_json(c), StringType))
      case other =>
        Seq((prefix, c, other))
    }

  /** Arrays of atomics or of flat records are split; deeper nesting is
    * stringified (reference behavior for anything it can't split). */
  private def isFlattenableElement(et: DataType, opts: Options): Boolean = et match {
    case st: StructType => st.fields.forall(f => f.dataType match {
      case _: StructType | _: ArrayType => false
      case _ => true
    })
    case _: ArrayType => false
    case _ => true
  }

  /** Metadata enrichment (reference: batch-client:280-288). The
    * reference stamps a random UUID `message_id`; at 100 TB a
    * content-derived md5 is strictly better — deterministic replays
    * dedup instead of double-inserting. */
  def withMetadata(df: DataFrame, receivedAt: Column, sentAt: Column,
                   idCols: Seq[Column]): DataFrame =
    df.withColumn("received_at", receivedAt)
      .withColumn("sent_at", sentAt)
      .withColumn("message_id", md5(concat_ws("#", idCols: _*)))

  /** The pluggable row transform hook (reference: src/transform.ts).
    * Default mirrors the reference: add `timestamp := received_at`. */
  type RowTransform = DataFrame => DataFrame
  val defaultTransform: RowTransform =
    df => df.withColumn("timestamp", col("received_at"))
}
