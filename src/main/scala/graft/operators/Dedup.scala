package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.Fns

/** Deduplication family for training-data pipelines.
  *
  * Scale shape: the exact variant is one hash-groupBy (one shuffle).
  * The near-dup variants never cross-join the corpus — MinHash+LSH
  * banding bounds candidate generation to bucket-mates, so the join is
  * |buckets| sized, not |corpus|². The exact-Jaccard verify runs only
  * on surviving candidates. That's the 100 TB path; the n-gram-Jaccard
  * operator below is the exact (audit) variant and says so.
  *
  * Caching contract: the LSH operators persist small fixed-width
  * intermediates (shingle sets, band keys, fingerprints) their
  * self-joins would otherwise recompute — the MLlib MinHashLSH trade.
  * The cache lives until Spark evicts it; a long-lived session running
  * these repeatedly should `spark.catalog.clearCache()` between corpus
  * passes (the handles are operator-internal by design — the output
  * DataFrame is lazy, so the operator cannot know when to unpersist).
  */
object Dedup {

  /** Exact dedup: canonicalize → md5 → group. Returns one row per
    * distinct content with the kept (min) id and multiplicity.
    * Null-text rows have no content to compare and are excluded — a
    * null md5 key would otherwise collapse ALL null rows into one
    * "duplicate" group. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), md5(Fns.normText(col(textCol))).as("fp_md5"))
      .groupBy(col("fp_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Pipeline form of exact dedup: the corpus with only the kept (min
    * id per canonical content) row of each duplicate group. One hash
    * shuffle; no join back — the winner is decided inside the window.
    * Null-text rows pass through untouched (they are not duplicates of
    * each other). */
  def dropExactDups(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(Fns.normText(col(textCol)))).orderBy(col(idCol))
    val nonNull = docs.filter(col(textCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    nonNull.unionByName(docs.filter(col(textCol).isNull))
  }

  /** Pipeline form of near-dedup: remove every doc that appears as the
    * larger id of a verified near-dup pair. Single pass over the pair
    * set (a left-anti join); transitive chains collapse toward their
    * smallest id but A~B~C with A̸~C keeps only A — the standard
    * one-round approximation of connected components, which is what
    * large-scale dedup pipelines ship (full CC needs iterative joins).
    */
  def dropNearDups(docs: DataFrame, pairs: DataFrame, idCol: String): DataFrame =
    docs.join(pairs.select(col("id2").as("__drop")),
        col(idCol) === col("__drop"), "left_anti")

  /** EXACT pairwise Jaccard ≥ threshold via prefix filtering (the
    * AllPairs/PPJoin family — Bayardo et al., WWW 2007; a public
    * algorithm): any pair with J(A,B) ≥ t must share a shingle within
    * the first |S|−⌈t·|S|⌉+1 shingles of each set under ONE global
    * total order, so candidates join only on those prefixes. Ordering
    * the prefix by ascending document frequency puts the RAREST
    * shingles first — the high-df shingles whose buckets explode a
    * naive shingle self-join quadratically are exactly the ones the
    * prefix drops. Verification is per-candidate `array_intersect`,
    * so exact work scales with candidate count, not corpus².
    * Same output as the naive all-pairs join, structurally cheaper —
    * still the audit-grade exact variant next to [[minHashLsh]]. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    // consumed by the df count, the prefix join, and the verify joins
    val sets = shingleSets(docs, idCol, textCol, n)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ex = sets.select(col("doc_id"), size(col("shs")).as("sz"),
      explode(col("shs")).as("sh"))
    val dfreq = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
    // prefix length floor((1−t)·|S|)+1; the 1e-9 nudge keeps the IEEE
    // floor from undershooting an exact integer product — a longer
    // prefix only adds candidates, never loses a true pair
    val prefix = ex.join(dfreq, "sh")
      .withColumn("rk", row_number().over(wDoc))
      .filter(col("rk") <=
        floor((lit(1.0) - threshold) * col("sz") + lit(1e-9)) + 1)
      .select(col("doc_id"), col("sz"), col("sh"))
    // size filter (also AllPairs): J ≥ t ⇒ |A∩B| ≥ t·|A∪B| ≥ t·max,
    // and min ≥ |A∩B| — so size-incompatible pairs can't qualify
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.sz"), col("b.sz")) >=
            lit(threshold) * greatest(col("a.sz"), col("b.sz")) - lit(1e-9))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    val inter = size(array_intersect(col("shs1"), col("shs2")))
    cand
      .join(sets.select(col("doc_id").as("id1"), col("shs").as("shs1")), "id1")
      .join(sets.select(col("doc_id").as("id2"), col("shs").as("shs2")), "id2")
      .select(col("id1"), col("id2"),
        round(inter / (size(col("shs1")) + size(col("shs2")) - inter), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Distinct-shingle sets per doc (docs with ≥1 shingle). */
  private def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        array_distinct(Fns.wordNGrams(Fns.tokens(col(textCol)), n)).as("shs"))
      .filter(size(col("shs")) > 0)

  /** MinHash signature columns h0..h{k-1} per doc. The per-shingle md5
    * arrays are hoisted into their own projection (referenced by every
    * component, so CollapseProject keeps them materialized once per row
    * instead of re-hashing per component — HOFs are interpreted, no
    * codegen CSE rescues the naive form). */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int): DataFrame =
    signaturesFromSets(shingleSets(docs, idCol, textCol, n), k)

  private def signaturesFromSets(sets: DataFrame, k: Int): DataFrame = {
    require(k <= 8, "window scheme yields 8 components")
    val hs = graft.plans.Cols.column(
      graft.plans.MinHashWindows(graft.plans.Cols.expression(col("shs"))))
    sets.select(col("doc_id"), hs.as("hs"))
      .select(col("doc_id") +:
        (0 until k).map(j => element_at(col("hs"), j + 1).as(s"h$j")): _*)
  }

  /** MinHash + LSH banding near-dup pairs, verified with exact Jaccard.
    * k hashes in `bands` bands of k/bands rows; docs sharing any band
    * key become candidates; candidates are verified ≥ threshold.
    *
    * The verify is PER-CANDIDATE (shingle-set intersect on the pair),
    * never a corpus-wide shingle self-join — candidate count is what
    * LSH banding bounded, so that's the only thing exact work may
    * scale with. This is the 100 TB property the operator exists for. */
  def minHashLsh(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 5, k: Int = 8, bands: Int = 4,
                 threshold: Double = 0.7): DataFrame =
    minHashCandidates(docs, idCol, textCol, n, k, bands)
      .filter(col("jaccard") >= threshold)

  /** The LSH candidate set WITH each pair's exact Jaccard, unfiltered —
    * what [[minHashLsh]] thresholds, and what a precision audit needs
    * whole (candidates that verify BELOW threshold are exactly the
    * banding's false positives). Same plan: banded self-join bounds
    * the candidates, verify is per-candidate. */
  def minHashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 5, k: Int = 8, bands: Int = 4): DataFrame = {
    require(bands >= 1 && bands <= k && k % bands == 0,
      s"bands ($bands) must divide k ($k); bands > k would make every " +
        "band key constant and the band join a full cross join")
    val rows = k / bands
    // Both the band self-join and the verify join consume these twice;
    // persisting them materializes the interpreted shingle/md5 work
    // once (the same cache MLlib's MinHashLSH does — at corpus scale
    // this is a bounded, columnar materialization, not a luxury).
    val sets = shingleSets(docs, idCol, textCol, n)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = bandedOf(signaturesFromSets(sets, k), k, bands)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    val inter = size(array_intersect(col("shs1"), col("shs2")))
    cand
      .join(sets.select(col("doc_id").as("id1"), col("shs").as("shs1")), "id1")
      .join(sets.select(col("doc_id").as("id2"), col("shs").as("shs2")), "id2")
      .select(col("id1"), col("id2"),
        round(inter / (size(col("shs1")) + size(col("shs2")) - inter), 6).as("jaccard"))
  }

  /** (doc_id, band, bk) rows from a signature table — the LSH join's
    * actual key space. */
  private def bandedOf(sig: DataFrame, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        Fns.bandKey((0 until rows).map(r => col(s"h${b * rows + r}"))).as("bk"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bk").as("bk"))
  }

  /** Public band-bucket view: each doc's (band, bk) LSH keys — what
    * the candidate self-join joins on. The load audit (c75) reads
    * this: bucket occupancy is the banding join's skew exposure, and
    * Σ s·(s−1)/2 over buckets is the exact candidate-pair count the
    * join will emit. Same plan as the [[minHashCandidates]] interior. */
  def bandBuckets(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 5, k: Int = 8, bands: Int = 4): DataFrame = {
    require(bands >= 1 && bands <= k && k % bands == 0,
      s"bands ($bands) must divide k ($k)")
    bandedOf(minHashSignatures(docs, idCol, textCol, n, k), k, bands)
  }

  /** Cross-corpus near-dup flags — which NEW docs near-duplicate an
    * EXISTING reference corpus (the continuous-ingestion shape:
    * yesterday's training set is immutable, today's crawl batch must
    * dedup against it without re-pairing the reference with itself).
    *
    * The band join crosses new×ref ONLY — never within-new or
    * within-ref — so incremental cost scales with the batch, not the
    * accumulated corpus: the reference side contributes its banded
    * keys (a bounded-width table that an ingestion pipeline would
    * precompute once and keep), and the exact verify is per-candidate,
    * the same contract as [[minHashCandidates]]. Returns one row per
    * new doc: (idCol, is_dup 0/1). */
  def crossCorpusFlags(newDocs: DataFrame, refDocs: DataFrame,
                       idCol: String, textCol: String,
                       n: Int = 5, k: Int = 8, bands: Int = 4,
                       threshold: Double = 0.5): DataFrame =
    flagsAgainstIndex(newDocs, idCol,
      buildCorpusIndex(newDocs, idCol, textCol, n, k, bands),
      buildCorpusIndex(refDocs, idCol, textCol, n, k, bands),
      threshold)

  /** Precomputed LSH index for one corpus side: shingle sets + banded
    * keys. This is the bounded-width table a continuous-ingestion
    * pipeline computes ONCE per corpus release and reuses across every
    * incoming batch (graft.streaming.StreamingIngest holds one for its
    * reference corpus). Lifetime is the caller's: `persist()` before
    * reuse, `unpersist()` when the corpus release is retired — the
    * deterministic-release answer to the lazy-output caching contract
    * in the object doc above. */
  final case class CorpusIndex(sets: DataFrame, banded: DataFrame) {
    def persist(): CorpusIndex = {
      sets.persist(StorageLevel.MEMORY_AND_DISK)
      banded.persist(StorageLevel.MEMORY_AND_DISK)
      this
    }
    def unpersist(): Unit = { sets.unpersist(); banded.unpersist(); () }
  }

  /** Build the [[CorpusIndex]] for one corpus (unpersisted — both
    * members are projection-only plans; persist only when reusing the
    * index across batches). */
  def buildCorpusIndex(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 5, k: Int = 8,
                       bands: Int = 4): CorpusIndex = {
    require(bands >= 1 && bands <= k && k % bands == 0,
      s"bands ($bands) must divide k ($k)")
    val sets = shingleSets(docs, idCol, textCol, n)
    CorpusIndex(sets, bandedOf(signaturesFromSets(sets, k), k, bands))
  }

  /** Flag `newDocs` against a reference [[CorpusIndex]] using the new
    * side's own index. The band join crosses new×ref only; exact
    * verify per candidate; one (idCol, is_dup 0/1) row per new doc.
    * Holds NO caches of its own — with both indexes projection-only,
    * each side's text is scanned at most twice (band keys + verify),
    * and a caller that persists the indexes pays one scan each. */
  def flagsAgainstIndex(newDocs: DataFrame, idCol: String,
                        newIdx: CorpusIndex, refIdx: CorpusIndex,
                        threshold: Double = 0.5): DataFrame = {
    val cand = newIdx.banded.as("a").join(refIdx.banded.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk"))
      .select(col("a.doc_id").as("new_id"), col("b.doc_id").as("ref_id"))
      .distinct()
    val inter = size(array_intersect(col("shs1"), col("shs2")))
    val flagged = cand
      .join(newIdx.sets.select(col("doc_id").as("new_id"), col("shs").as("shs1")),
        "new_id")
      .join(refIdx.sets.select(col("doc_id").as("ref_id"), col("shs").as("shs2")),
        "ref_id")
      .select(col("new_id"),
        round(inter / (size(col("shs1")) + size(col("shs2")) - inter), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id")).distinct()
    newDocs.select(col(idCol))
      .join(flagged.withColumnRenamed("new_id", idCol)
        .withColumn("__f", lit(1L)), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__f"), lit(0L)).as("is_dup"))
  }

  /** Winnowing fingerprint selection (MOSS-style, Schleimer et al.
    * 2003): hash every k-gram, slide a w-window over the hash
    * sequence, keep each window's minimum — guaranteeing any shared
    * run of ≥ w+k−1 tokens yields at least one shared fingerprint,
    * with ~2/(w+1) of positions selected. The overlap-detection
    * scheme for long shared SPANS (plagiarism/boilerplate), where
    * MinHash answers whole-document similarity.
    *
    * Returns distinct (doc_id, fp) rows. Docs with fewer than w
    * k-gram hashes select all of them (the degenerate window).
    * Selection is a projection + generator — no shuffle; hashes are
    * 8-hex-char md5 windows so the oracle mirrors them exactly. */
  def winnowingFingerprints(docs: DataFrame, idCol: String, textCol: String,
                            k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    // hash + sliding-window min in ONE codegen'd pass (r13,
    // graft.plans.WinnowingFps): the composed transform/slice/
    // array_min form ran interpreted — per gram a lambda frame for
    // the md5, per window another frame plus a slice copy; values
    // and order are identical (DedupSpec pins the equality)
    docs
      .select(col(idCol).as("doc_id"),
        Fns.wordNGrams(Fns.tokens(col(textCol)), k).as("gs"))
      .filter(size(col("gs")) > 0)
      .select(col("doc_id"),
        explode(array_distinct(Fns.winnowingFps(col("gs"), w))).as("fp"))
  }

  /** SimHash fingerprint (64-bit: one ±1 vote per bit of the md5's
    * first 64 bits, summed over all tokens, sign → bit). Near-identical
    * texts land within small hamming distance; pairing is then a band
    * join on 16-bit bands, never a cross join. Width is the scale dial:
    * the band join costs Σ bucket² per band, so the band-key space must
    * outgrow the corpus — 8-bit bands (the 32-bit fingerprint's) give
    * 256 buckets and the r9 sf1 sweep measured the pairing going
    * superlinear (1.05 s → 55 s for 10× docs); 16-bit bands give
    * 65 536, a 256× lower collision coefficient, same pigeonhole-exact
    * hamming ≤ 3 (the Manku WWW'07 64-bit shape).
    *
    * One projection via [[graft.plans.SimHash64]] — no token explode,
    * no 64-sum aggregate, no shuffle: fingerprinting is scan-speed.
    * Docs with zero tokens are excluded (the aggregation form had no
    * group for them). */
  def simHash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Fns.tokens(col(textCol))
    docs.filter(size(toks) > 0)
      .select(col(idCol).as("doc_id"),
        graft.plans.Cols.column(graft.plans.SimHash64(
          graft.plans.Cols.expression(toks))).as("simhash64"))
  }

  /** SimHash near-dup pairs within `maxHamming`, found by a 16-bit-band
    * self-join (4 bands of 16 bits over the 64-bit fingerprint).
    * Pigeonhole: hamming ≤ 3 over 4 bands forces at least one identical
    * band, so the band join is EXACT for maxHamming ≤ 3 — same pairs as
    * a cross join, at |bucket|-sized cost (and bucket sizes are what
    * the 64-bit width bounds; see [[simHash64]]). */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band join is only exact for hamming <= 3")
    val fp = simHash64(docs, idCol, textCol)
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash64"), 16 * b).bitwiseAND(65535L).as("bk"))
    }
    val banded = fp.select(col("doc_id"), col("simhash64"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("simhash64"),
        col("bb.band").as("band"), col("bb.bk").as("bk"))
      .persist(StorageLevel.MEMORY_AND_DISK) // self-joined below
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        bit_count(col("a.simhash64").bitwiseXOR(col("b.simhash64"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Cross-document duplicate-line fraction (the RefinedWeb /
    * MassiveText line-dedup signal): a document whose lines mostly
    * appear elsewhere in the corpus is boilerplate or a near-copy even
    * when no single whole-doc pair crosses a Jaccard threshold.
    *
    * "Lines" are non-overlapping `lineTokens`-token windows (the
    * corpus has no layout newlines; a real deployment would split on
    * them — same plan shape either way). One bounded explode
    * (~n_tokens/lineTokens rows per doc) → one hash shuffle for the
    * per-line occurrence count → per-doc rollup. Work is linear in
    * corpus token count; nothing is ever corpus². */
  def lineDupStats(docs: DataFrame, idCol: String, textCol: String,
                   lineTokens: Int = 10): DataFrame = {
    val lines = Chunker
      .chunkTokens(docs, idCol, textCol, size = lineTokens, stride = lineTokens)
      .select(col(idCol), md5(concat_ws(" ", col("chunk_tokens"))).as("__h"))
    val occ = Window.partitionBy(col("__h"))
    lines
      .withColumn("__n_occ", count(lit(1)).over(occ))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__n_occ") > 1, 1L).otherwise(0L)).as("n_dup_lines"))
      .withColumn("dup_line_ratio_micro",
        floor(col("n_dup_lines") * lit(1000000.0) / col("n_lines")).cast("long"))
  }

  /** Boilerplate line REMOVAL (the destructive step [[lineDupStats]]
    * only measures — RefinedWeb §3.2 / CCNet both ship it): drop every
    * line whose exact text occurs more than `maxOcc` times across the
    * corpus (headers, footers, cookie banners), reconstitute each
    * document from its surviving lines in original order.
    *
    * Same plan spine as the stats pass — bounded line explode → ONE
    * hash shuffle on the line key for occurrence counts — plus a
    * per-doc rollup that rebuilds the text: surviving (line_id, text)
    * pairs are collected, sorted by position, and joined. The rebuilt
    * doc rides the SAME aggregate as the counts (no second pass); the
    * collect is per-document and bounded by document length, never by
    * corpus size.
    *
    * Output: `(id, n_lines, n_lines_kept, scrubbed_text)` — docs whose
    * every line is boilerplate survive with empty text (the caller's
    * quality gate drops them; scrub and gate are separate decisions). */
  def lineScrub(docs: DataFrame, idCol: String, textCol: String,
                lineTokens: Int = 10, maxOcc: Long = 1): DataFrame = {
    val lines = Chunker
      .chunkTokens(docs, idCol, textCol, size = lineTokens, stride = lineTokens)
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", col("chunk_tokens")).as("__line"))
    val occ = Window.partitionBy(col("__line"))
    lines
      .withColumn("__n_occ", count(lit(1)).over(occ))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__n_occ") <= maxOcc, 1L).otherwise(0L))
          .as("n_lines_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("__n_occ") <= maxOcc,
              struct(col("chunk_id"), col("__line"))))),
            p => p.getField("__line")),
          " ").as("scrubbed_text"))
  }

  /** Exact-substring duplication signal (the ES-dedup statistic of
    * Lee et al. 2021, "Deduplicating Training Data Makes Language
    * Models Better"): the fraction of a document's SLIDING
    * `windowTokens`-token windows that occur again anywhere in the
    * corpus. Where [[lineDupStats]] tiles the doc (stride = size),
    * this slides (stride 1), so a duplicated span is caught at every
    * alignment — the paper's suffix-array criterion restated as
    * "window repeats somewhere".
    *
    * Scale shape: the explode is bounded (one row per token, ~n_tokens
    * rows/doc), then ONE hash shuffle for the per-window occurrence
    * count and a per-doc rollup — linear in corpus tokens, never
    * corpus². (A suffix array answers the same question with lower
    * constants but doesn't distribute as one relational pass; at
    * 100 TB this is the shape you can actually run.) Docs shorter
    * than one window carry no windows and drop from the output. */
  def substringDupStats(docs: DataFrame, idCol: String, textCol: String,
                        windowTokens: Int = 10): DataFrame = {
    val wins = docs
      .select(col(idCol),
        explode(graft.functions.Fns.wordNGrams(
          graft.functions.Fns.tokens(col(textCol)), windowTokens)).as("__w"))
      .select(col(idCol), md5(col("__w")).as("__h"))
    val occ = Window.partitionBy(col("__h"))
    wins
      .withColumn("__n_occ", count(lit(1)).over(occ))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("__n_occ") > 1, 1L).otherwise(0L)).as("n_dup_windows"))
      .withColumn("dup_window_ratio_micro",
        floor(col("n_dup_windows") * lit(1000000.0) / col("n_windows")).cast("long"))
  }

  /** Exact-substring duplication REMOVAL — the destructive step of
    * ES-dedup (Lee et al. 2021) that [[substringDupStats]] only
    * measures, at sliding-window granularity: every token covered by
    * a `windowTokens`-token window that occurs more than once in the
    * corpus is CUT, and the document is rebuilt from the surviving
    * tokens in order. The paper removes the duplicated spans
    * themselves (suffix-array spans); the union of duplicated windows
    * is the same span set restated window-wise, so misaligned copies
    * are cut at every alignment.
    *
    * Plan shape: the c30 spine (bounded window explode → ONE hash
    * shuffle on the window text for occurrence counts), an explode of
    * duplicated windows into covered positions (≤ windowTokens rows
    * per duplicated window, then distinct), one (id, pos) join
    * against the token list, and the same ordered in-aggregate
    * rebuild as [[lineScrub]]. Linear in corpus tokens ×
    * windowTokens; nothing is corpus².
    *
    * Docs shorter than one window carry no duplicated windows — every
    * token survives. Empty docs drop (no token rows). */
  def substringScrub(docs: DataFrame, idCol: String, textCol: String,
                     windowTokens: Int = 10): DataFrame = {
    val toks = docs.select(col(idCol),
      graft.functions.Fns.tokens(col(textCol)).as("__tk"))
    val wins = toks.select(col(idCol),
      posexplode(graft.functions.Fns.wordNGrams(col("__tk"), windowTokens))
        .as(Seq("__wpos", "__w")))
    val occ = Window.partitionBy(col("__w"))
    val covered = wins
      .withColumn("__n_occ", count(lit(1)).over(occ))
      .filter(col("__n_occ") > 1)
      .select(col(idCol),
        explode(sequence(col("__wpos"),
          col("__wpos") + lit(windowTokens - 1))).as("__pos"))
      .distinct()
      .withColumn("__dup", lit(1))
    toks.select(col(idCol), posexplode(col("__tk")).as(Seq("__pos", "__tok")))
      .join(covered, Seq(idCol, "__pos"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__dup").isNull, 1L).otherwise(0L)).as("n_tokens_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("__dup").isNull,
              struct(col("__pos"), col("__tok"))))),
            p => p.getField("__tok")),
          " ").as("scrubbed_text"))
  }

  /** Embedding-cosine near-dup pairs over an explicit sample predicate.
    * Exact (audit) variant — the scale path is [[Similarity.lshBuckets]]
    * bucketing; this one cross-pairs only the sampled subset and is
    * labeled as such. */
  def embeddingNearDups(vecs: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, roundScale: Int = 4): DataFrame = {
    val v = vecs.select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("v"))
    v.as("a").join(v.as("b"), col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id1"), col("b.vid").as("id2"),
        Fns.cosine(col("a.v"), col("b.v"), roundScale).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }

  /** Connected components over an undirected near-dup pair list — the
    * clustering step that turns pairwise matches into dedup groups
    * (keep min-id per component, drop the rest). Returns one row per
    * node that appears in a pair: `(node, component)` with component =
    * min node id in its component.
    *
    * Algorithm: neighbor-min label propagation to fixpoint — each
    * round joins labels to edges and takes min(self, neighbors), so a
    * round is one shuffle join + one groupBy over the PAIR list (edge
    * count ~ duplicate density, orders of magnitude below corpus
    * size). Rounds needed = eccentricity of each component's min node;
    * near-dup clusters are shallow (dups of a common source), so this
    * converges in a handful of rounds. `localCheckpoint` truncates the
    * growing lineage each round (iterative DataFrame joins otherwise
    * re-plan the whole history). For adversarially long path graphs at
    * extreme scale the two-phase large-star/small-star variant
    * (Kiveris et al., "Connected Components in MapReduce") drops
    * rounds to O(log n); this operator asserts convergence within
    * `maxIter` instead of silently emitting partial components.
    *
    * Adaptive small-side path: duplicate-pair sets are usually orders
    * of magnitude smaller than the corpus, so when the (long-keyed)
    * edge list fits `localThreshold` the components are solved as
    * driver-side union-find in one pass — the same small-side trade as
    * Spark's broadcast-join threshold, with identical output. The
    * iterative path remains for edge lists that don't fit. */
  def connectedComponents(pairs: DataFrame, col1: String, col2: String,
                          maxIter: Int = 20,
                          localThreshold: Long = 1L << 20): DataFrame = {
    val edges = pairs.select(col(col1).as("src"), col(col2).as("dst"))
      .unionAll(pairs.select(col(col2).as("src"), col(col1).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK) // re-joined every round
    val longKeys = pairs.schema(col1).dataType == org.apache.spark.sql.types.LongType &&
      pairs.schema(col2).dataType == org.apache.spark.sql.types.LongType
    if (longKeys && edges.count() <= localThreshold) {
      val spark = pairs.sparkSession
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.collect().foreach { row =>
        val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
        if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
      }
      val nodes = parent.keySet ++ parent.values
      edges.unpersist()
      import spark.implicits._
      return nodes.toSeq.map(n => (n, find(n)))
        .toDF("node", "component")
    }
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("component").as("dst_comp")),
          "dst")
        .groupBy(col("src")).agg(min(col("dst_comp")).as("nbr_comp"))
      // carry the changed flag inside the checkpointed frame: the
      // convergence probe then scans cached partitions instead of
      // re-running the round's join (two jobs per round, not three)
      val next = labels
        .join(nbrMin.select(col("src").as("node"), col("nbr_comp")), Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_comp"), col("component")))
            .as("component"),
          (col("nbr_comp") < col("component")).as("_changed"))
        .localCheckpoint()
      converged = next.filter(col("_changed")).isEmpty
      labels = next.drop("_changed")
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    labels
  }
}
