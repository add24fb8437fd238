package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the query set
  * against a single scan of the corpus (queries are small by
  * construction; the corpus side never shuffles).
  *
  * Scale path: random-hyperplane LSH — each vector gets a small bucket
  * signature; search touches only bucket-mates. Hyperplanes are derived
  * from md5 so every executor (and every round) regenerates the exact
  * same planes with no state to ship.
  */
object Similarity {

  /** Brute-force cosine top-k: every query vector against the corpus.
    * One broadcast join + one window; deterministic tie-break on id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     roundScale: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        Fns.cosine(col("qv"), col("cv"), roundScale).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 hyperplanes from md5 — plane j, dimension i.
    * private[graft] so the oracle generator can inline the same
    * constants into its SQL mirror. */
  private[graft] def planeSign(j: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$i".getBytes("UTF-8"))
    if ((d(0) & 1) == 1) 1.0 else -1.0
  }

  /** Corpus-derived plane count: the smallest p with an expected
    * bucket size ≤ `target` (N/2^p ≤ target), floored at 8 (the
    * shipped-scale value — the floor holds for N ≤ 256·target, i.e.
    * 16,384 vectors at the default target 64, so driver-scale results
    * are bit-identical to the fixed-8 era) and capped
    * at 30 (2^30 buckets ≈ 69 B vectors at target 64). Pure integer
    * arithmetic — bitlen((N−1) div target) — so the oracle mirrors
    * compute the IDENTICAL count with
    * `least(30, greatest(8, length(bin((count(*)-1)//target))))`
    * (DuckDB `bin` is the positional binary form; no float log2 whose
    * rounding could diverge between engines at a boundary). This is
    * the LSH analogue of [[sqrtStride]]: bucket count grows WITH the
    * corpus, so expected bucket size stays in (target/2, target] and
    * bucket-join work stays O(N·target) — linear per decade, the
    * sub-N^1.5 member of the ANN family (the centroid path's
    * assignment cost is inherently N·K; hashing is O(planes)). */
  def autoPlanes(n: Long, target: Long = 64L): Int = {
    val x = math.max(0L, (n - 1L) / math.max(1L, target))
    math.min(30, math.max(8, 64 - java.lang.Long.numberOfLeadingZeros(x)))
  }

  /** LSH bucket signature: sign bit per hyperplane, packed to a long. */
  def lshBucket(vec: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { j =>
      val plane = array((0 until dim).map(i => lit(planeSign(j, i))): _*)
      when(Fns.dotD(vec, plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF (inverted-file) ANN. Centroids are a deterministic id-stride
    * sample of the corpus (training-free; swap in k-means centroids at
    * will — the plumbing is identical). Assignment is relational: one
    * broadcast of the K centroids against a single corpus scan, with
    * the O(N·K) candidate expansion collapsed MAP-SIDE by a partial
    * aggregate — only N rows ever cross the exchange. Search probes
    * only the query's cell, so scoring touches ~corpus/K candidates
    * per query. */
  /** Nearest-centroid assignment: broadcast the K centroids, then
    * argmax cosine per vector as the [[graft.plans.ArgMaxByScore]]
    * typed aggregate — (cosine desc, cent_id asc), so ties break to
    * the smallest cent_id, identical to the rank-window semantics
    * this replaces. The partial aggregate combines each vector's K
    * candidates before the shuffle: N rows cross the exchange, not
    * N·K — AND (r12) nothing candidate-sized is sorted either: the
    * retired `max(struct(..., v))` form carried the vector inside a
    * struct, which has no mutable aggregation buffer, so Catalyst
    * planned a SortAggregate whose map side SORTED the N·K·dim
    * cross-join expansion (~46 GB spilled at N=200k, K=448, dim=64 —
    * the superlinear term the r12 served-ANN probe caught). The typed
    * aggregate hash-combines with O(1) state per vector. `df` must
    * already have `id` and a double-array `vec`. */
  private def assignCells(df: DataFrame, cents: DataFrame, id: String,
                          vec: String, roundScale: Int): DataFrame =
    df.crossJoin(broadcast(cents))
      // cosine computes in this CODEGEN'D projection (fused with the
      // join); a typed aggregate evals its child expressions
      // interpreted per row, which at N·K candidate rows would hand
      // the hot arithmetic to the interpreter
      .select(col(id), col(vec), col("cent_id"),
        Fns.cosine(col(vec), col("centv"), roundScale).as("__cos"))
      .groupBy(col(id))
      .agg(Fns.argMaxByScore(col("__cos"), col("cent_id"), col(vec))
        .as("__best"))
      .select(col(id), col("__best.payload").as(vec),
        col("__best.key").as("cell"))

  /** Scale-aware centroid stride: ⌊√N⌋ for an N-vector corpus, so the
    * centroid count K = N/stride ≈ √N. That is the balance point
    * between the O(N·K) assignment pass and the O(Σ|cell|²) ≈ O(N²/K)
    * within-cell pair work (knnGraph/semDedup) — both land at O(N^1.5)
    * — and the standard IVF sizing rule (faiss's nlist ≈ √N). A FIXED
    * stride pins K ∝ N (assignment goes quadratic) or, worse, lets
    * verbatim-duplicated corpora collapse all ties onto the original
    * centroids so cells grow unboundedly. Engine-portable: JVM
    * Math.sqrt and DuckDB sqrt are both correctly-rounded IEEE-754, so
    * `greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT))` computes the
    * identical stride in the oracle mirrors. */
  def sqrtStride(n: Long): Long =
    math.max(1L, math.sqrt(n.toDouble).toLong)

  /** Deterministic id-stride seed centroids. stride ≤ 0 (the scale-safe
    * default across this object) derives [[sqrtStride]] from the corpus
    * count — one count job, metadata-only on raw parquet scans. */
  def seedCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                    stride: Long): DataFrame = {
    val s = if (stride > 0) stride else sqrtStride(corpus.count())
    val cents = corpus.filter(col(idCol) % s === 0)
      .select(col(idCol).as("cent_id"), col(vecCol).cast("array<double>").as("centv"))
    require(!cents.isEmpty,
      s"no centroids: no corpus id is divisible by stride=$s — " +
        "lower the stride (an empty centroid set would make every result empty)")
    cents
  }

  /** One Lloyd refinement: assign every vector to its nearest centroid,
    * recompute each cell's centroid as the per-dimension mean. Sums run
    * in decimal (order-independent), so refined centroids are
    * deterministic across partitionings and replays — the property
    * k-means on floats usually loses. Cells keep their seed cent_id;
    * empty cells disappear (standard Lloyd). */
  def refineCentroids(corpus: DataFrame, cents: DataFrame, idCol: String,
                      vecCol: String, roundScale: Int = 4): DataFrame = {
    val v = corpus.select(col(idCol).as("__vid"),
      col(vecCol).cast("array<double>").as("__v"))
    refineFromAssigned(assignCells(v, cents, "__vid", "__v", roundScale), "__v")
  }

  /** The Lloyd mean step alone, over an ALREADY-ASSIGNED corpus —
    * what [[refineIndex]] reuses so a served index's refinement never
    * recomputes the O(N·K) assignment its seed index already paid.
    * `assigned` must carry (`cell`, vecCol) with FIXED-dimension
    * vectors.
    *
    * Shape: ONE groupBy(cell) carrying the
    * [[graft.plans.VectorSumDecimal]] aggregate — O(dim) state per
    * cell, map-side combined, N rows through the single exchange. The
    * r10 form posexploded N·dim rows through TWO shuffles
    * (groupBy(cell,pos) then a collect_list re-assembly); at 1 B × 64
    * dims that is 64 B exploded rows vs N here. Values are
    * bit-identical: the aggregate converts each element exactly as
    * CAST(x AS DECIMAL(28,12)) and decimal addition is
    * order-independent, so mean = sum.cast(double)/count matches the
    * exploded form and the DuckDB mirror digit for digit. */
  private def refineFromAssigned(assigned: DataFrame, vecCol: String): DataFrame =
    assigned.groupBy(col("cell"))
      .agg(Fns.vecSumDec(col(vecCol)).as("__s"), count(lit(1)).as("__n"))
      .select(col("cell").as("cent_id"),
        transform(col("__s"), s => s.cast("double") / col("__n")).as("centv"))

  /** A BUILT (served) ANN index: the centroids and the corpus→cell
    * assignment, both persisted, so Q searches pay the O(N·K)
    * assignment ONCE instead of per call. This is the faiss
    * build-once/serve-many split: [[ivfTopK]]'s per-call form is the
    * right shape for a one-shot audit, but a retrieval service that
    * rebuilds the index per query sits on the N^1.5 line the r10
    * sf10 probe measured (12-14.6×/decade with build vs 2.8-6×
    * bounded search). At cluster scale the same two frames would be
    * WRITTEN once (parquet, partitioned by `cell`) and every search
    * becomes a cell-pruned scan; persist() is the single-app form of
    * that contract.
    *
    * `assigned` carries (`corpus_id`, `cv`, `cell`) — the exact
    * frames [[searchIndex]] joins, so served results are
    * structurally identical to the per-call path (ServedAnnSpec
    * asserts row equality; driver row c104 oracle-checks it). */
  final case class AnnIndex private[operators] (
      cents: DataFrame, assigned: DataFrame,
      idCol: String, vecCol: String, roundScale: Int) {
    /** Release the index's pinned frames (owner's responsibility —
      * a served index outlives any one query by design). */
    def release(): Unit = { cents.unpersist(); assigned.unpersist() }
  }

  private val IdxLevel = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** Build a served IVF index: seed centroids (id-stride, K ≈ √N for
    * stride ≤ 0), assign every corpus vector once, optionally run
    * `iters` Lloyd refinements (each = one mean step + one
    * reassignment, both from the PREVIOUS persisted assignment — the
    * seed assignment is never recomputed). Math is identical to
    * [[ivfTopK]] / [[ivfTopKTrained]], so a served search returns
    * bit-identical rows to the per-call form. */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 stride: Long = 0, iters: Int = 0,
                 roundScale: Int = 4): AnnIndex = {
    val cents = seedCentroids(corpus, idCol, vecCol, stride).persist(IdxLevel)
    val v = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val assigned = assignCells(v, cents, "corpus_id", "cv", roundScale)
      .persist(IdxLevel)
    // Materialize NOW: persist is lazy, and "build" must mean built —
    // a served index whose first search pays the O(N·K) assignment is
    // the per-call path with extra steps. This also populates the
    // cents cache (the broadcast collects it), so release()/refinement
    // eviction can never race an un-populated cache and silently push
    // the assignment back into every search's lineage (the r11
    // unpersist-before-materialize defect).
    assigned.foreach(_ => ())
    val seed = AnnIndex(cents, assigned, idCol, vecCol, roundScale)
    if (iters <= 0) seed
    else {
      // refineIndex materializes each step's frames, so the seed's are
      // safe to release here — nothing recomputes them later.
      val refined = refineIndex(corpus, seed, iters)
      seed.release() // only the final centroids + assignment serve
      refined
    }
  }

  /** Derive a REFINED index from an existing one: `iters` Lloyd steps,
    * each reusing the previous index's persisted assignment for the
    * mean step (the input index's frames are left untouched — callers
    * that keep both, e.g. c65b's ivf vs ivf_trained audit, share the
    * seed assignment instead of each paying it). */
  def refineIndex(corpus: DataFrame, index: AnnIndex, iters: Int = 1): AnnIndex = {
    val v = corpus.select(col(index.idCol).as("corpus_id"),
      col(index.vecCol).cast("array<double>").as("cv"))
    (0 until iters).foldLeft(index) { (prev, i) =>
      val cents = refineFromAssigned(prev.assigned, "cv").persist(IdxLevel)
      val assigned = assignCells(v, cents, "corpus_id", "cv",
        index.roundScale).persist(IdxLevel)
      // Materialize this step's frames BEFORE evicting the previous
      // step's: unpersisting a frame the new lineage still references
      // while the new cache is un-populated (persist is lazy) would
      // recompute the evicted assignment inside every later action —
      // exactly the amortization this index exists to avoid. The one
      // action below populates both caches (assigned's broadcast
      // collects cents).
      assigned.foreach(_ => ())
      if (i > 0) { prev.cents.unpersist(); prev.assigned.unpersist() }
      AnnIndex(cents, assigned, index.idCol, index.vecCol, index.roundScale)
    }
  }

  /** Append NEW vectors into a served index's EXISTING cells: assign
    * only the appended rows (|batch|·K — the build's O(N·K) is never
    * re-paid; the centroids are fixed) and union them into the served
    * assignment. This is the streaming-maintenance half of the
    * build-once/serve-many contract: a retrieval service ingests new
    * corpus vectors between searches without rebuilding, then runs
    * [[refineServed]] periodically as its compaction (a19's pattern
    * applied to the ANN family — appends are cheap and slightly
    * degrade cell quality; compaction restores it). Equality contract:
    * after any sequence of appends, [[searchIndex]] returns exactly
    * what a one-shot assignment of the full corpus to the SAME
    * centroids would (append order and batching never matter — driver
    * row c106 pins it against the one-shot oracle).
    *
    * At cluster scale the same move is an APPEND of new cell-keyed
    * rows to the index's cell-partitioned parquet table; the union
    * here is the single-app form. The input index's assignment is
    * released (its cache would double-hold every pre-append row); its
    * centroids are SHARED by the returned index — release() only the
    * final index in an append chain. */
  def appendToIndex(index: AnnIndex, added: DataFrame): AnnIndex = {
    val v = added.select(col(index.idCol).as("corpus_id"),
      col(index.vecCol).cast("array<double>").as("cv"))
    val assigned = index.assigned
      .unionAll(assignCells(v, index.cents, "corpus_id", "cv", index.roundScale))
      .persist(IdxLevel)
    assigned.foreach(_ => ()) // materialize before evicting the input's frame
    index.assigned.unpersist()
    AnnIndex(index.cents, assigned, index.idCol, index.vecCol, index.roundScale)
  }

  /** Compaction for a maintained index: `iters` Lloyd refinements
    * derived from the index's OWN assigned frame (which carries every
    * vector, appends included — no external corpus handle needed).
    * The input index's frames are left untouched, same contract as
    * [[refineIndex]]. */
  def refineServed(index: AnnIndex, iters: Int = 1): AnnIndex =
    refineIndex(index.assigned.select(col("corpus_id").as(index.idCol),
      col("cv").as(index.vecCol)), index, iters)

  /** Search a served index: assign ONLY the queries to their cells
    * (|q|·K work), then probe the pre-assigned corpus — the O(N·K)
    * term is gone from the query path. Output schema and tie rules
    * match [[ivfTopK]] exactly. */
  def searchIndex(index: AnnIndex, queries: DataFrame, k: Int): DataFrame = {
    val q = assignCells(
      queries.select(col(index.idCol).as("query_id"),
        col(index.vecCol).cast("array<double>").as("qv")),
      index.cents, "query_id", "qv", index.roundScale)
    val scored = index.assigned.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), col("cell"),
        Fns.cosine(col("qv"), col("cv"), index.roundScale).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Public view of the assignment kernel: every corpus vector's
    * nearest seed centroid (same stride/tie rules as [[ivfTopK]]).
    * The occupancy diagnostics (c72) read this — cell balance is
    * what decides whether the IVF probe cost is really ~N/K. Shape
    * inherits assignCells: broadcast centroids, map-side argmax
    * combine, N rows through the one exchange. */
  def cellAssignments(corpus: DataFrame, idCol: String, vecCol: String,
                      stride: Long = 0, roundScale: Int = 4): DataFrame = {
    val v = corpus.select(col(idCol).as("__aid"),
      col(vecCol).cast("array<double>").as("__av"))
    assignCells(v, seedCentroids(corpus, idCol, vecCol, stride),
        "__aid", "__av", roundScale)
      .select(col("__aid").as(idCol), col("cell"))
  }

  /** Home cell + the `probes` nearest cells per vector, in ONE pass
    * with both aggregates map-side combined: the max-of-struct argmax
    * (home, carries the vector) and the bounded
    * [[graft.plans.TopNByScore]] (probe list, O(probes) state). N rows
    * cross the exchange regardless of K or probes — the property the
    * r5 assignCells fix bought, preserved for multi-probe. */
  private def assignProbes(df: DataFrame, cents: DataFrame, id: String,
                           vec: String, probes: Int, roundScale: Int): DataFrame =
    df.crossJoin(broadcast(cents))
      // codegen'd cosine shared by BOTH typed aggregates (see
      // assignCells — typed aggregates interpret their children)
      .select(col(id), col(vec), col("cent_id"),
        Fns.cosine(col(vec), col("centv"), roundScale).as("__cos"))
      .groupBy(col(id))
      .agg(
        Fns.argMaxByScore(col("__cos"), col("cent_id"), col(vec)).as("__best"),
        Fns.topNByScore(col("__cos"), col("cent_id"), probes).as("__pc"))
      .select(col(id), col("__best.payload").as(vec),
        col("__best.key").as("cell"),
        expr("transform(__pc, p -> p.key)").as("probe_cells"))

  /** Within-cell kNN GRAPH: assign every vector to its IVF cell, then
    * take each vector's k nearest among the vectors HOMED in any of
    * its `probes` nearest cells — the neighbor graph that graph-ANN
    * builds (HNSW/NSG base layers) and graph-based dedup/clustering
    * start from. probes=1 is the classic within-cell graph; probes=2
    * recovers pairs that straddle a cell boundary (the faiss nprobe
    * dial), at probes× candidate cost. A (src,dst) pair appears at
    * most once: dst is indexed under its ONE home cell.
    *
    * Unlike [[ivfTopK]] (built for a SMALL query set, which
    * broadcasts), the all-corpus graph must not broadcast anything
    * corpus-sized: both sides of the cell join shuffle on `cell`,
    * candidate fan-out is probes·Σ|cell|² — the c72 cell-balance audit
    * is what keeps that near probes·N²/K.
    *
    * The per-src top-k is the bounded [[graft.plans.TopNByScore]]
    * aggregate, NOT a rank window: a window must SORT the full
    * candidate fan-out before ranking (the r10 sf10 probe measured
    * that local sort spilling >50 GB at 186M candidate pairs — a 100 TB
    * killer), while the aggregate hashes candidates into O(k) state
    * per src map-side, so nothing candidate-sized is ever sorted or
    * shuffled. Tie order is identical by construction (score desc,
    * key asc). Each edge's `cell` — dst's ONE home cell, so a pair
    * appears at most once — re-attaches via an N·k ⋈ N equi-join
    * AFTER the top-k, never on the candidate set. */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
               stride: Long = 0, roundScale: Int = 4,
               probes: Int = 1): DataFrame = {
    val v = corpus.select(col(idCol).as("__kid"),
      col(vecCol).cast("array<double>").as("__kv"))
    val a = assignProbes(v, seedCentroids(corpus, idCol, vecCol, stride),
      "__kid", "__kv", probes, roundScale)
    knnGraphFromAssigned(a, k, probes, roundScale)
  }

  /** The graph build AFTER the assignment: the query side probes the
    * first `probes` entries of `probe_cells` (the list is (cos desc,
    * cent_id asc)-ordered, so the prefix of a longer probe list is
    * exactly the shorter list — what [[knnGraphSweep]] relies on). */
  private def knnGraphFromAssigned(a: DataFrame, k: Int, probes: Int,
                                   roundScale: Int): DataFrame = {
    require(k >= 1 && k <= 8,
      "knnGraph keeps O(k) aggregate state; raise TopNByScore's cap past 8")
    val l = a.select(
      explode(slice(col("probe_cells"), 1, probes)).as("cell"),
      col("__kid").as("src"), col("__kv").as("sv"))
    val r = a.select(col("cell"), col("__kid").as("dst"), col("__kv").as("dv"))
    val top = l.join(r, Seq("cell")).filter(col("src") =!= col("dst"))
      // codegen'd cosine BEFORE the typed aggregate (which would eval
      // it interpreted, per candidate pair — the probes·Σ|cell|²
      // fan-out is the hottest loop in the graph build)
      .select(col("src"),
        Fns.cosine(col("sv"), col("dv"), roundScale).as("__cos"),
        col("dst"))
      .groupBy(col("src"))
      .agg(Fns.topNByScore(col("__cos"), col("dst"), k).as("__top"))
      .select(col("src"), posexplode(col("__top")).as(Seq("__pos", "__p")))
      .select(col("src"), col("__p.key").as("dst"),
        col("__p.score").as("cosine_sim"),
        (col("__pos") + 1).cast("int").as("rank"))
    top.join(a.select(col("__kid").as("dst"), col("cell")), Seq("dst"))
      .select(col("src"), col("dst"), col("cell"), col("cosine_sim"),
        col("rank"))
  }

  /** kNN graphs for SEVERAL probe dials from ONE assignment pass —
    * what a probe-dial audit (c102) needs. The assignment is the
    * O(N·K) term and is identical across dials (a p-probe list's
    * prefix IS the (p−1)-probe list: TopNByScore orders (score desc,
    * key asc), the same rule the single-dial path uses), so computing
    * it once and slicing per dial returns bit-identical edges to
    * per-dial [[knnGraph]] calls at 1/|dials| of the assignment cost.
    * Returns the per-dial edge frames plus the persisted assignment —
    * the CALLER releases it once its result is materialized (the
    * bm25TopDocs self-release contract). */
  def knnGraphSweep(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int, probesList: Seq[Int], stride: Long = 0,
                    roundScale: Int = 4): (Map[Int, DataFrame], DataFrame) = {
    require(probesList.nonEmpty)
    val v = corpus.select(col(idCol).as("__kid"),
      col(vecCol).cast("array<double>").as("__kv"))
    val a = assignProbes(v, seedCentroids(corpus, idCol, vecCol, stride),
        "__kid", "__kv", probesList.max, roundScale)
      .persist(IdxLevel)
    (probesList.map(p =>
      p -> knnGraphFromAssigned(a, k, p, roundScale)).toMap, a)
  }

  /** IVF with optional Lloyd-refined centroids (iters=0 ≡ ivfTopK). */
  def ivfTopKTrained(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int, stride: Long = 0,
                     iters: Int = 2, roundScale: Int = 4): DataFrame = {
    var cents = seedCentroids(corpus, idCol, vecCol, stride)
    (0 until iters).foreach { _ =>
      cents = refineCentroids(corpus, cents, idCol, vecCol, roundScale)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    ivfWithCents(corpus, queries, cents, idCol, vecCol, k, roundScale)
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, stride: Long = 0,
              roundScale: Int = 4): DataFrame =
    ivfWithCents(corpus, queries,
      seedCentroids(corpus, idCol, vecCol, stride), idCol, vecCol, k, roundScale)

  private def ivfWithCents(corpus: DataFrame, queries: DataFrame,
                           cents: DataFrame, idCol: String, vecCol: String,
                           k: Int, roundScale: Int): DataFrame = {
    def prep(df: DataFrame, id: String, out: String): DataFrame =
      assignCells(df.select(col(idCol).as(id),
        col(vecCol).cast("array<double>").as(out)), cents, id, out, roundScale)
    val c = prep(corpus, "corpus_id", "cv")
    val q = prep(queries, "query_id", "qv")
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), col("cell"),
        Fns.cosine(col("qv"), col("cv"), roundScale).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: candidates share a bucket; top-k within bucket.
    * Misses across bucket boundaries are the approximation. planes ≤ 0
    * (the scale-safe default) derives [[autoPlanes]] from the corpus
    * count — bucket count grows with N, expected bucket size stays
    * ~64, and per-query candidate work stays CONSTANT (the fixed-8
    * form's N/256 candidates per query grew linearly, the same
    * pinned-dial disease the fixed IVF stride had). One count job,
    * same price seedCentroids already pays.
    *
    * `probes` > 1 is MULTI-PROBE LSH (Lv et al. 2007, "Multi-probe
    * LSH: efficient indexing for high-dimensional similarity
    * search"): a vector's most likely miss is across the hyperplane
    * it sits closest to, so each query ALSO probes the buckets
    * reached by flipping its (probes−1) lowest-|margin| sign bits —
    * recall of near-boundary neighbors rises at probes× candidate
    * cost per QUERY while the corpus side (one bucket per vector,
    * never re-hashed) is untouched, keeping the flat-per-decade
    * scaling. Probe buckets are distinct single-bit flips and every
    * corpus vector lives in exactly one bucket, so no candidate pair
    * is scored twice. Margin ties break to the lowest plane index,
    * exactly as the SQL mirror's (|dot|, j) struct sort. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 0, dim: Int = 64,
              roundScale: Int = 4, probes: Int = 1): DataFrame = {
    val p = if (planes > 0) planes else autoPlanes(corpus.count())
    require(probes >= 1 && probes <= p,
      s"probes must be in [1, planes=$p] — each probe flips one distinct plane")
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), p, dim))
    val q0 = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), p, dim))
    val q =
      if (probes <= 1) q0.withColumn("pbucket", col("bucket"))
      else {
        val margins = (0 until p).map { j =>
          val plane = array((0 until dim).map(i => lit(planeSign(j, i))): _*)
          struct(abs(Fns.dotD(col("qv"), plane)).as("m"), lit(j).as("j"))
        }
        val flips = (0 until probes - 1).map(i =>
          expr(s"bucket ^ shiftleft(1L, __margins[$i].j)"))
        q0.withColumn("__margins", array_sort(array(margins: _*)))
          .withColumn("pbucket", explode(array(col("bucket") +: flips: _*)))
          .drop("__margins")
      }
    val scored = c.join(
        broadcast(q.select(col("query_id"), col("qv"), col("pbucket"))),
        col("bucket") === col("pbucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), col("bucket"),
        Fns.cosine(col("qv"), col("cv"), roundScale).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): semantic near-dup
    * removal over an embedding column — cluster the embedding space,
    * then compare vectors pairwise ONLY within their cluster. The
    * quadratic term collapses from corpus² to Σ cell² ≈ corpus²/K,
    * which is the entire reason the method runs at web scale; the
    * trade (cross-cluster dups are missed) is the published algorithm,
    * not a shortcut.
    *
    * Keep rule: a vector is a duplicate iff a LOWER-id cluster-mate
    * sits at cosine ≥ `threshold` (the paper keeps the vector farthest
    * from the centroid; any deterministic representative preserves the
    * guarantee and min-id matches this library's other dedup ops).
    *
    * Output: one row per vector — `(id, cell, cell_size, n_dup_of,
    * is_dup)`. Plan shape: one broadcast centroid assignment (O(N·K)),
    * one shuffle on `cell` for the within-cell join, one key window
    * for cell sizes riding the same partitioning. */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
               stride: Long, threshold: Double,
               roundScale: Int = 4): DataFrame = {
    val cents = seedCentroids(corpus, idCol, vecCol, stride)
    val v = corpus.select(col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("v"))
    val assigned = assignCells(v, cents, "vid", "v", roundScale)
    val dups = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vid") > col("b.vid"))
      .filter(Fns.cosine(col("a.v"), col("b.v"), roundScale) >= threshold)
      .groupBy(col("a.vid").as("vid"))
      .agg(count(lit(1)).as("n_dup_of"))
    val cellW = Window.partitionBy(col("cell"))
    assigned
      .withColumn("cell_size", count(lit(1)).over(cellW))
      .join(dups, Seq("vid"), "left")
      .select(col("vid").as(idCol), col("cell"), col("cell_size"),
        coalesce(col("n_dup_of"), lit(0L)).as("n_dup_of"),
        (coalesce(col("n_dup_of"), lit(0L)) > 0).cast("long").as("is_dup"))
  }
}
