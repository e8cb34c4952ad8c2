package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Hashing, TextOps, VectorOps}

/** Near-duplicate detection family for document corpora (SURVEY.md §2
  * "LLM-data-pipeline: deduplication").
  *
  * Scale architecture (§4): per-document signatures (shingle sets,
  * minhash sigs, simhash words) are computed MAP-SIDE in one scan;
  * candidate generation shuffles only small (key, doc_id) pairs —
  * band keys for MinHash-LSH, 16-bit chunks for SimHash, shingles for
  * the exact-Jaccard join; exact verification runs only on candidate
  * pairs. Nothing here ever broadcasts or collects the corpus.
  */
object Dedup {

  /** Exact duplicate groups by text hash: one row per distinct
    * content hash with its cardinality and the kept (min) doc id. */
  def exactGroups(docs: DataFrame, id: String, text: String): DataFrame =
    docs.groupBy(TextOps.exactHash(col(text)).as("h"))
      .agg(count(lit(1)).as("n_docs"), min(col(id)).as("keep_doc"))

  /** Per-doc distinct k-shingle sets (map-side). */
  def withShingles(docs: DataFrame, id: String, text: String, k: Int): DataFrame =
    docs.select(col(id), Hashing.shingles(col(text), k).as("sh"))

  /** Distinct content hashes of a corpus — the persisted artifact an
    * incremental pipeline maintains across batches (recompute it only
    * when bootstrapping; afterwards, append each batch's kept hashes). */
  def baseHashes(docs: DataFrame, text: String): DataFrame =
    docs.select(TextOps.exactHash(col(text)).as("h")).distinct()

  /** Incremental exact dedup — the corpus-maintenance pattern: a new
    * batch arrives against an already-deduped base, represented ONLY
    * by its persisted hash set (`baseHash`, single column `h` — see
    * `baseHashes`). An incoming doc survives iff its content hash
    * matches no base hash (anti-join — shuffle- or broadcast-sided by
    * AQE depending on base size) AND it is the first (min-id) holder
    * of its hash within the increment. Base TEXT is never touched:
    * each increment costs one scan of the batch plus the hash-set
    * join. */
  def incrementalKeep(baseHash: DataFrame, incoming: DataFrame,
      id: String, text: String): DataFrame = {
    val ih = incoming.select(col(id), TextOps.exactHash(col(text)).as("h"))
    ih.join(baseHash.select(col(baseHash.columns.head).as("h")), Seq("h"), "left_anti")
      .groupBy("h").agg(min(col(id)).as(id))
  }

  /** Bloom-prefiltered incremental dedup — `incrementalKeep` with the
    * 100 TB refinement: the base hash set is summarized as a Bloom
    * filter (built once per maintenance cycle with one treeAggregate
    * pass — `expectedItems` sizes it without a count action; a
    * persisted base knows its cardinality from metadata) and shipped
    * to every task. Incoming docs whose hash the filter rejects are
    * PROVABLY absent from the base (no false negatives) and skip the
    * anti-join entirely; only the ~fpp false-positive sliver plus the
    * true duplicates pay the join. On a mostly-novel batch this drops
    * the anti-join's probe side by ~(1-fpp) — the shuffle that
    * dominates when the base is billions of hashes. Output is
    * bit-identical to `incrementalKeep` (the exact join resolves every
    * maybe), so both share one oracle. */
  def incrementalKeepBloom(baseHash: DataFrame, incoming: DataFrame,
      id: String, text: String, expectedItems: Long,
      fpp: Double = 0.01): DataFrame =
    incrementalKeepWithBloom(
      baseHash.stat.bloomFilter(baseHash.columns.head,
        math.max(expectedItems, 1L), fpp),
      baseHash, incoming, id, text)

  /** [[incrementalKeepBloom]] with a PREBUILT filter — the production
    * entry: the Bloom over the base hash set is a maintenance-cycle
    * artifact persisted beside the base (rebuilt when the base
    * compacts, not per batch), so steady-state increments pay zero
    * filter-construction cost. */
  def incrementalKeepWithBloom(
      bloom: org.apache.spark.util.sketch.BloomFilter,
      baseHash: DataFrame, incoming: DataFrame,
      id: String, text: String): DataFrame = {
    val hcol = baseHash.columns.head
    val b = incoming.sparkSession.sparkContext.broadcast(bloom)
    // native codegen'd probe over the broadcast filter — no ScalaUDF
    // interpreter barrier in the scan stage (PlanAuditSpec pins it)
    def might(c: org.apache.spark.sql.Column) =
      graft.functions.expressions.SketchProbes.bloomMightContain(c, b)
    val ih = incoming.select(col(id), TextOps.exactHash(col(text)).as("h"))
    val definitelyNew = ih.filter(!might(col("h")))
    val maybe = ih.filter(might(col("h")))
      .join(baseHash.select(col(hcol).as("h")), Seq("h"), "left_anti")
    definitelyNew.unionByName(maybe)
      .groupBy("h").agg(min(col(id)).as(id))
  }

  /** All pairs with shingle-set Jaccard >= minJ (rounded to 6 dp for
    * engine-stable thresholding).
    *
    * Prefix filtering (PPJoin family, Xiao et al., WWW'08): order each
    * doc's shingles RAREST-FIRST (ascending global document frequency)
    * and index only the first n - ceil(minJ*n) + 1 — two sets with
    * J >= minJ MUST share a token inside both prefixes. Because
    * prefixes hold the rarest tokens, the candidate join's fan-out per
    * key is minimal (ordering by anything else — e.g. a hash — puts
    * globally hot tokens in every prefix and goes quadratic). Costs
    * one extra df-count aggregation + join over the shingle stream;
    * exact Jaccard verifies candidates from the full arrays. Output is
    * identical to the naive all-shingles join (which the DuckDB oracle
    * uses). */
  def ngramJaccardPairs(docs: DataFrame, id: String, text: String,
      k: Int, minJ: Double): DataFrame =
    ngramJaccardPairsFromShingles(persisted(withShingles(spread(docs), id, text, k)),
      id, minJ)

  /** Shingling is the CPU-heavy stage (split + windowed slices per
    * doc); materializing the persisted shingle frame runs it inside
    * the input's scan stage, whose task count equals the input's
    * split count. Repartition the (cheap) raw text first so the
    * expensive compute always runs at full parallelism — the driver's
    * test parquet has a single row group, and at 100 TB a skewed or
    * under-split source gets the same guard for one small shuffle of
    * raw text. */
  private def spread(docs: DataFrame): DataFrame =
    docs.repartition(docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt)

  /** The shingle frame is scanned three times downstream (prefix
    * ranking, verify side a, verify side b) — materialize it once
    * instead of re-splitting/re-shingling the corpus per scan. At
    * 100 TB the analogue is writing the signature table out once and
    * reusing it; locally MEMORY_AND_DISK caching is the same move.
    * Registered with CacheScope so the harness unpersists it once the
    * query's action completes (cache hygiene — a bench/service session
    * must not accumulate dead cached partitions). */
  private def persisted(sh: DataFrame): DataFrame =
    graft.CacheScope.track(sh)

  /** Pair generation over a precomputed (id, sh) shingle frame —
    * shared by the threshold join and keep-list materialization so the
    * expensive shingling runs once. */
  def ngramJaccardPairsFromShingles(sh: DataFrame, id: String, minJ: Double): DataFrame = {
    // Candidate generation runs on 8-byte xxhash64 token ids, not the
    // shingle strings: every downstream shuffle/sort/aggregate keys on
    // fixed-width longs (the strings average tens of bytes). The
    // prefix-filter guarantee holds under ANY consistent total order
    // of any token relabeling: a genuinely shared shingle always maps
    // to a shared hash id, and a (astronomically rare, ~V²/2⁶⁴) hash
    // collision can only MERGE two tokens — adding candidates, never
    // hiding a true pair — while exactness of the OUTPUT is owned by
    // the verify join below, which intersects the real string arrays.
    val ex = sh.select(col(id), size(col("sh")).as("n"),
      explode(col("sh")).as("s0"))
      .select(col(id), col("n"), xxhash64(col("s0")).as("s"))
    // Document frequencies ride as ESTIMATES from one broadcast
    // Count-Min sketch instead of an exact groupBy: prefix-filter
    // COMPLETENESS holds under ANY consistent global total order of
    // tokens (the theorem never uses rarity), and the CM estimate is
    // deterministic (fixed seed, exact-merge counters) so (est_df, s)
    // IS such an order. Rarity quality only shapes posting-list
    // sizes, and CM errors are one-sided (+eps·N overcounts on a few
    // tokens — a slightly longer posting list, never a lost pair).
    // This deletes the exact-df aggregation shuffle AND the
    // shingle-stream⋈dfreq shuffle join: the sketch is built in one
    // map-side tree-merged pass and probed inside the scan stage.
    val cms = ex.stat.countMinSketch(col("s"), 1e-4, 0.99, 42)
    val cmB = sh.sparkSession.sparkContext.broadcast(cms)
    // prefix = rarest floor((1-t)*n)+1 tokens of each doc, under the
    // global (df, s) total order — computed MAP-SIDE over the cached
    // per-doc shingle array by ONE compiled expression
    // (graft_prefix_tokens: hash, broadcast-CM df, primitive
    // (df, hash) sort, slice). The cached frame already holds the
    // complete token set per doc, so re-deriving it by exploding and
    // re-aggregating (groupBy(id, n) + collect_list + sort) paid a
    // full O(docs × shingles) exchange for information that never
    // left the row — the expression removes that exchange and its
    // scheduling wave outright (guide §2.4). A declarative HOF chain
    // (transform + array_sort + slice) computed the same thing but
    // ArrayTransform/ArraySort evaluate INTERPRETED per element —
    // measured at sf1 that interpretation cost more than the removed
    // exchange; the compiled loop keeps both wins (guide §1.2 order:
    // algorithm first, then per-task work).
    val ranked = sh
      .select(col(id), size(col("sh")).as("n"),
        explode(graft.functions.expressions.PrefixTokens
          .of(col("sh"), cmB, minJ)).as("s"))
    // candidate pairs: group prefix postings by shingle and expand the
    // per-shingle doc list map-side — one shuffle where the a/b
    // self-join shuffled the (re-evaluated) prefix stream twice. The
    // per-key fan-out bound is unchanged: prefixes hold the rarest
    // tokens, so posting lists stay short (that IS the PPJoin filter).
    // The length filter (J >= t ⇒ min(n)/max(n) >= t) prunes
    // size-incompatible pairs before they ever reach the verify join;
    // the 1e-6 slack keeps pairs whose 6-dp ROUNDED J lands on t.
    val cand = ranked.groupBy("s")
      .agg(collect_list(struct(col(id), col("n"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col(s"a.$id") < col(s"b.$id") &&
        least(col("a.n"), col("b.n")) >=
          (lit(minJ) - lit(1e-6)) * greatest(col("a.n"), col("b.n")))
      .select(col(s"a.$id").as("doc_a"), col("a.n").as("na"),
        col(s"b.$id").as("doc_b"), col("b.n").as("nb"))
      .distinct()
    val sa = sh.toDF("doc_a", "sh_a")
    val sb = sh.toDF("doc_b", "sh_b")
    // The explode(array(...)) wrapper is a Generate barrier: without
    // it, CollapseProject + filter pushdown inline the intersection
    // into every consumer and the (hash-set-building) array_intersect
    // runs ~4x per candidate; behind the barrier it runs once.
    cand.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
        explode(array(size(array_intersect(col("sh_a"), col("sh_b")))
          .cast("double"))).as("inter"))
      .withColumn("j", VectorOps.roundAt(
        col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("j") >= minJ)
      .select("doc_a", "doc_b", "j")
  }

  /** MinHash+LSH near-dup pairs: k-entry signatures, `bands`×`rows`
    * banding for candidates, exact Jaccard verify at minJ. Same
    * output contract as ngramJaccardPairs but candidate generation
    * shuffles O(docs × bands) band keys instead of O(total shingles).
    */
  def minhashLshPairs(docs: DataFrame, id: String, text: String, k: Int,
      sigLen: Int, bands: Int, minJ: Double): DataFrame = {
    require(sigLen % bands == 0, "bands must divide signature length")
    val sh = persisted(withShingles(spread(docs), id, text, k))
    val sig = Hashing.minhashSignatures(sh, id, "sh", sigLen)
      .withColumn("bk", Hashing.bandKeys(col("sig"), bands, sigLen / bands))
    val cand = Hashing.lshCandidates(sig.select(col(id), col("bk")), id, "bk")
    // exact verify on candidates only
    val sa = sh.toDF("doc_a", "sh_a")
    val sb = sh.toDF("doc_b", "sh_b")
    cand.join(sa, cand(s"${id}_a") === sa("doc_a"))
      .join(sb, cand(s"${id}_b") === sb("doc_b"))
      .withColumn("j", VectorOps.roundAt(Hashing.jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("j") >= minJ)
      .select(col("doc_a"), col("doc_b"), col("j"))
  }

  /** Incremental NEAR-dup maintenance — the LSH twin of
    * `incrementalKeep`: a new batch is deduplicated against an
    * already-deduped base WITHOUT recomputing the base. At scale the
    * base is represented by its persisted artifacts — the band-key
    * table (id, band, key) and the shingle table — maintained
    * append-only across batches; each increment computes signatures
    * for the BATCH only, probes the base index with one equi-join on
    * the band key, and exact-verifies the candidate sliver. Batch
    * cost is O(batch + matches), never O(base). (Here both sides
    * derive inline because the fixture has no persisted index; the
    * join shape is identical.) A batch doc survives iff no base doc
    * reaches `minJ` exact Jaccard against it.
    *
    * Inherent LSH escape probability: with the gate's parameters
    * (sigLen=64, bands=16 → r=4 rows/band), a pair at exactly
    * J = 0.8 collides in no band with probability
    * (1 − 0.8⁴)^16 ≈ 2.3e-4 — per NEAR-THRESHOLD pair, per band
    * choice, independent of the data. The oracle compares against
    * exact Jaccard, so a testdata regeneration landing a pair right
    * at the threshold can fail the gate with NO code bug at ~2e-4
    * probability; accepted (same exposure as dedup_minhash — the
    * sf0.01 corpus's near-dup pairs sit well above threshold, where
    * escape decays as (1−J⁴)^16: J=0.9 → 3e-9). Raising bands to 32
    * (r=2) would cut escapes but triple false candidates
    * (P_collide(0.5) jumps 0.06→0.66 per band); the 16-band point is
    * the measured sweet spot for verify cost. */
  /** Cross-set near-dup PAIRS (batch doc, base doc, j) — the
    * candidate+verify core of `minhashIncrementalKeep`, exposed so
    * incremental CLUSTER maintenance can consume the edges instead of
    * just the drop verdict. Same shape: batch band keys probe the
    * base band index with one equi-join, exact Jaccard verifies the
    * sliver. */
  def minhashIncrementalPairs(base: DataFrame, batch: DataFrame, id: String,
      text: String, k: Int, sigLen: Int, bands: Int, minJ: Double): DataFrame = {
    require(sigLen % bands == 0, "bands must divide signature length")
    val shB = persisted(withShingles(spread(base), id, text, k))
    minhashIncrementalPairsFromIndex(
      bandTableOf(shB, id, sigLen, bands), shB, batch, id, text,
      k, sigLen, bands, minJ)
  }

  /** Band-key table (id, band, key) of a corpus — the persisted index
    * artifact an incremental near-dup store maintains append-only
    * across batches (alongside the (id, sh) shingle table). Probe it
    * with `minhashIncrementalPairsFromIndex`. */
  def minhashBandIndex(docs: DataFrame, id: String, text: String, k: Int,
      sigLen: Int, bands: Int): DataFrame = {
    require(sigLen % bands == 0, "bands must divide signature length")
    bandTableOf(withShingles(spread(docs), id, text, k), id, sigLen, bands)
  }

  private def bandTableOf(sh: DataFrame, id: String, sigLen: Int,
      bands: Int): DataFrame =
    Hashing.minhashSignatures(sh, id, "sh", sigLen)
      .select(col(id),
        explode(Hashing.bandKeys(col("sig"), bands, sigLen / bands)).as("bk"))
      .select(col(id), col("bk.band").as("band"), col("bk.key").as("key"))

  /** `minhashIncrementalPairs` in its steady state: the base side
    * arrives as PERSISTED artifacts — the band index (id, band, key)
    * per `minhashBandIndex` and the (id, sh) shingle table — so each
    * increment computes signatures for the BATCH only and the base
    * text is never re-read. O(batch + matches), the shape a 100 TB
    * dedup store actually runs batch-over-batch. */
  def minhashIncrementalPairsFromIndex(baseBands: DataFrame,
      baseShingles: DataFrame, batch: DataFrame, id: String, text: String,
      k: Int, sigLen: Int, bands: Int, minJ: Double): DataFrame = {
    require(sigLen % bands == 0, "bands must divide signature length")
    val shN = persisted(withShingles(spread(batch), id, text, k))
    val cand = bandTableOf(shN, id, sigLen, bands).toDF("doc_n", "band", "key")
      .join(baseBands.toDF("doc_b", "band", "key"), Seq("band", "key"))
      .select("doc_n", "doc_b").distinct()
    cand
      .join(shN.toDF("doc_n", "sh_n"), Seq("doc_n"))
      .join(baseShingles.toDF("doc_b", "sh_b"), Seq("doc_b"))
      .withColumn("j",
        VectorOps.roundAt(Hashing.jaccard(col("sh_n"), col("sh_b")), 6))
      .filter(col("j") >= minJ)
      .select(col("doc_n"), col("doc_b"), col("j"))
  }

  /** Within-batch AND batch→base near-dup edges from ONE batch
    * signature pass — the edge set incremental CLUSTER maintenance
    * consumes. `minhashLshPairs(batch) ∪ minhashIncrementalPairsFromIndex`
    * computes the batch's shingles + 64-minhash signatures TWICE (once
    * per call); here the shingle frame and band table are shared: the
    * band table self-joins for the within-batch candidates and probes
    * the persisted base index for the cross candidates, and one
    * verify join (batch shingles ∪ base shingle table — id sets are
    * disjoint) exact-checks both candidate slivers together. */
  def minhashIncrementalEdgesFromIndex(baseBands: DataFrame,
      baseShingles: DataFrame, batch: DataFrame, id: String, text: String,
      k: Int, sigLen: Int, bands: Int, minJ: Double): DataFrame = {
    require(sigLen % bands == 0, "bands must divide signature length")
    val shN = persisted(withShingles(spread(batch), id, text, k))
    val bt = graft.CacheScope.track(bandTableOf(shN, id, sigLen, bands))
    val candBB = bt.toDF("doc_a", "band", "key")
      .join(bt.toDF("doc_b", "band", "key"), Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val candNB = bt.toDF("doc_a", "band", "key")
      .join(baseBands.toDF("doc_b", "band", "key"), Seq("band", "key"))
      .select("doc_a", "doc_b").distinct()
    val sa = shN.toDF("doc_a", "sh_a")
    val sb = shN.toDF("doc_b", "sh_b")
      .unionByName(baseShingles.toDF("doc_b", "sh_b"))
    candBB.union(candNB)
      .join(sa, Seq("doc_a"))
      .join(sb, Seq("doc_b"))
      .withColumn("j",
        VectorOps.roundAt(Hashing.jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("j") >= minJ)
      .select(col("doc_a"), col("doc_b"))
  }

  /** The dedup store's standard near-dup parameters — ONE definition
    * site for every maintainer of the persisted label/band artifacts
    * (ccBaseFor/ccFullFor and friends), so a retune cannot
    * desynchronize the "same artifact" claims across modules. */
  val StdShingleK = 3
  val StdSigLen = 64
  val StdBands = 16
  val StdMinJ = 0.8

  /** Full-corpus near-dup component labels at the standard parameters
    * — the label table a dedup store persists as its primary
    * artifact (cluster = component-minimum id). */
  def corpusLabels(docs: DataFrame, id: String, text: String): DataFrame =
    connectedComponents(docs.select(id),
      minhashLshPairs(docs, id, text, StdShingleK, StdSigLen, StdBands,
        StdMinJ).select("doc_a", "doc_b"))

  def minhashIncrementalKeep(base: DataFrame, batch: DataFrame, id: String,
      text: String, k: Int, sigLen: Int, bands: Int, minJ: Double): DataFrame = {
    val dropped = minhashIncrementalPairs(base, batch, id, text,
        k, sigLen, bands, minJ)
      .select(col("doc_n").as(id)).distinct()
    batch.select(col(id)).join(dropped, Seq(id), "left_anti")
  }

  /** Incremental connected-component maintenance — the batch-scale
    * analogue of `minhashIncrementalKeep` for CLUSTER labels: a new
    * batch's pairs merge into the PERSISTED component labels without
    * recomputing the base graph.
    *
    * The base is represented ONLY by its label table (id → cluster,
    * cluster = component-minimum id — `connectedComponents`' output
    * contract). Each new edge projects its endpoints onto SUPER-NODES
    * (a base doc by its label, a batch doc by itself); components of
    * the projected graph — bounded by 2·|newPairs|, driver union-find
    * territory — give every touched super-node its merged label
    * min(old labels ∪ batch ids touched). Because a base label IS its
    * component's minimum, the projected minimum is the true global
    * minimum of the merged component.
    *
    * Plan shape (the O(batch) contract): the base label table is
    * never shuffled — it is scanned twice, both times as the STREAMED
    * side of a broadcast join (endpoint-label resolve; relabel apply
    * with the tiny old→new map), and the projected-graph CC runs on
    * O(batch) rows. At 100 TB the label table is a bucketed index
    * artifact and both scans partition-prune; nothing here is
    * O(base-graph).
    *
    * Returns the FULL updated label table: batch docs labeled, base
    * docs relabeled where a merge lowered their component's minimum.
    * (Production would write only the delta — batch rows + the
    * old→new relabel map — into the label store; the full table here
    * is the oracle-comparable form.) */
  def clustersIncremental(baseLabels: DataFrame, batchIds: DataFrame,
      newPairs: DataFrame): DataFrame = {
    val idCol = batchIds.columns.head
    val lbl = baseLabels.toDF("id", "cluster")
    // checkpoint, not persist: the edge sliver is O(batch) rows but
    // its SUBTREE is the whole LSH candidate pipeline, and this frame
    // is referenced (via ends/lmap/proj/nodes/merged/relabel) ~20x by
    // the final union's logical plan — persist shares computation but
    // not lineage, so the analyzed tree blew up to ~32k nodes and
    // Catalyst re-analysis dominated the query (guide §7.3: large
    // plans are driver-side, single-threaded cost)
    val p = graft.CacheScope.trackCheckpoint(newPairs.toDF("a", "b"))
    // one scan of the base label table resolves every endpoint that
    // is a base doc (broadcast the small endpoint set)
    val ends = p.select(col("a").as("e"))
      .union(p.select(col("b").as("e"))).distinct()
    val lmap = graft.CacheScope.track(
      broadcast(ends).join(lbl, col("e") === col("id"))
        .select(col("e"), col("cluster").as("l")))
    // project pairs onto super-nodes (batch endpoints map to
    // themselves). O(batch) rows scanned by four downstream actions
    // (node set, CC probe+collect, relabel) — cache the projection,
    // not just the raw pairs, so the label joins run once.
    // same lineage-truncation rationale as `p`: proj is O(batch) rows
    // but feeds four downstream consumers (node set ×2, CC probe,
    // CC edges), each of which would re-embed the label-join subtree
    val proj = graft.CacheScope.trackCheckpoint(p
      .join(broadcast(lmap).withColumnRenamed("e", "a")
        .withColumnRenamed("l", "la"), Seq("a"), "left")
      .join(broadcast(lmap.withColumnRenamed("e", "b")
        .withColumnRenamed("l", "lb")), Seq("b"), "left")
      .select(coalesce(col("la"), col("a")).as("pa"),
        coalesce(col("lb"), col("b")).as("pb")))
    val nodes = proj.select(col("pa").as("n"))
      .union(proj.select(col("pb").as("n"))).distinct()
    // merged labels of the touched super-nodes (projected graph is
    // O(batch) — the driver union-find fast path)
    // O(touched super-nodes) rows, referenced by both the base
    // relabel and the batch labeling — checkpoint for the same reason
    val merged = graft.CacheScope.trackCheckpoint(
      connectedComponents(nodes, proj).toDF("n", "m"))
    // base relabels: only components whose merged minimum moved
    val relabel = merged.filter(col("n") =!= col("m"))
    val baseUpdated = lbl
      .join(broadcast(relabel).withColumnRenamed("n", "cluster"),
        Seq("cluster"), "left")
      .select(col("id").as(idCol),
        coalesce(col("m"), col("cluster")).as("cluster"))
    val batchLabeled = batchIds.select(col(idCol))
      .join(broadcast(merged).withColumnRenamed("n", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("m"), col(idCol)).as("cluster"))
    baseUpdated.union(batchLabeled)
  }

  /** SimHash signatures of a corpus: (id, sim) with sim the 64-bit
    * one-pass map-side signature. Split out from `simhashPairs` so a
    * signature table can be persisted and the band join replayed from
    * it (the oracle protocol for `dedup_simhash`). */
  def simhashSigs(docs: DataFrame, id: String, text: String): DataFrame =
    Hashing.simhashes(
      docs.select(col(id), split(lower(col(text)), " ").as("__ws")), id, "__ws")

  /** Banding + Hamming verify from a signature table (`id`, `sim`):
    * 4×16-bit band equi-join (pigeonhole-complete for Hamming <= 3),
    * Hamming filter BEFORE the distinct shuffle. Pure bit arithmetic
    * over the signatures — exactly replayable by any engine with
    * shift/xor/popcount, which is what the DuckDB oracle does. */
  def simhashPairsFromSigs(sigs: DataFrame, id: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding is only complete for distance <= 3")
    val bands = sigs.withColumn("bk", Hashing.simhashBands(col("sim")))
    val e = bands.select(col(id), col("sim"), explode(col("bk")).as("b"))
      .select(col(id), col("sim"), col("b.band").as("band"), col("b.key").as("key"))
    val l = e.toDF("doc_a", "sim_a", "band", "key")
    val r = e.toDF("doc_b", "sim_b", "band", "key")
    l.join(r, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        Hashing.hamming(col("sim_a"), col("sim_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming) // filter BEFORE the
      .distinct() // distinct-shuffle: most candidates are discards
  }

  /** SimHash near-dup pairs within `maxHamming` (<= 3 for the 4x16-bit
    * banding to be lossless by pigeonhole). */
  def simhashPairs(docs: DataFrame, id: String, text: String,
      maxHamming: Int): DataFrame =
    simhashPairsFromSigs(simhashSigs(docs, id, text), id, maxHamming)

  /** Benchmark decontamination — the training-data step that removes
    * documents overlapping an evaluation set (the public n-gram
    * protocol: GPT-3 appendix C / PaLM-style 13-gram matching; k is a
    * parameter). A document is contaminated when it shares ANY
    * k-shingle with any eval document. The eval side is tiny by
    * definition → its distinct shingles BROADCAST; contamination is
    * one broadcast semi-join on the exploded corpus shingles (no
    * shuffle of the corpus), and the result is the anti-set. */
  def decontaminate(docs: DataFrame, id: String, text: String,
      evalDocs: DataFrame, evalText: String, k: Int): DataFrame = {
    val evalGrams = withShingles(evalDocs, evalDocs.columns.head, evalText, k)
      .select(explode(col("sh")).as("__g")).distinct()
    val contaminated = withShingles(docs, id, text, k)
      .select(col(id), explode(col("sh")).as("__g"))
      .join(broadcast(evalGrams), Seq("__g"), "left_semi")
      .select(id).distinct()
    docs.join(contaminated, Seq(id), "left_anti")
  }

  /** Directional containment near-dup pairs: C(a→b) =
    * |Sa ∩ Sb| / |Sa| ≥ minC over distinct k-shingle sets — the
    * partial-copy detector (quotes, excerpts, boilerplate-wrapped
    * reposts) that symmetric Jaccard MISSES when |Sb| ≫ |Sa|: a short
    * doc fully contained in a long one has tiny Jaccard but
    * containment 1. Output is ordered (doc_a contained-in doc_b).
    *
    * Shape: shingle-hash equi-join on 8-byte xxhash64 token ids (the
    * shuffle keys on fixed-width longs; a hash collision can only ADD
    * a candidate pair whose containment the count then understates by
    * at most the collided token — ~V²/2⁶⁴, ignored like
    * ngramJaccardPairs), pair counts partial-agg'd, one size join,
    * threshold in rounded-6dp division. At 100 TB, block first (the
    * LSH band machinery) — the exact join is the verify stage, as in
    * the Jaccard family. */
  def containmentPairs(docs: DataFrame, id: String, text: String,
      k: Int, minC: Double): DataFrame = {
    val sh = persisted(withShingles(spread(docs), id, text, k))
    val ex = sh.select(col(id), size(col("sh")).as("n"),
      explode(col("sh")).as("s0"))
      .select(col(id), col("n"), xxhash64(col("s0")).as("s"))
    // Direct count-join: pair intersection counts aggregate straight
    // off the token equi-join (partial-agg'd on (a, b)) — no
    // per-candidate array materialization. NOTE (measured, round 8):
    // the PPJoin-style one-sided prefix filter (prefix(a) ⋈
    // full-postings(b), rarest-first) ran 9x SLOWER here — at
    // containment t = 0.6 the prefix bound is floor((1−t)·n)+1 ≈ 40%
    // of every doc, too weak to prune on a template-heavy corpus,
    // while adding the candidate distinct + per-pair array_intersect
    // verify. The 100 TB scale path is LSH-band blocking FIRST (the
    // dedup_minhash machinery), then this exact join on candidates.
    val a = ex.select(col(id).as("doc_a"), col("n").as("na"), col("s"))
    val b = ex.select(col(id).as("doc_b"), col("s"))
    a.join(b, Seq("s"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "na", "doc_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("containment", graft.functions.VectorOps.roundAt(
        col("inter").cast("double") / col("na"), 6))
      .filter(col("containment") >= minC)
      .select(col("doc_a"), col("doc_b"), col("containment"))
  }

  /** Fraction-thresholded benchmark decontamination — the production
    * refinement of [[decontaminate]] (the Llama-style "dirty
    * fraction" protocol): a document is dropped only when at least
    * `minOverlapPct`% of its DISTINCT k-shingles appear in the eval
    * set — one hot phrase must not nuke a long document, while an
    * eval passage embedded in a short doc still kills it. Same
    * distributed shape: eval shingles broadcast, the corpus never
    * shuffles except two partial-agg'd per-doc counts on the id key;
    * the threshold compares in pure integers (h·100 ≥ pct·n), so both
    * engines agree bit-exactly at the boundary. */
  def decontaminateOverlap(docs: DataFrame, id: String, text: String,
      evalDocs: DataFrame, evalText: String, k: Int,
      minOverlapPct: Int): DataFrame = {
    require(minOverlapPct >= 1 && minOverlapPct <= 100,
      s"minOverlapPct must be in [1,100], got $minOverlapPct")
    val evalGrams = withShingles(evalDocs, evalDocs.columns.head, evalText, k)
      .select(explode(col("sh")).as("__g")).distinct()
    val docGrams = withShingles(docs, id, text, k)
      .select(col(id), explode(col("sh")).as("__g"))
    val counts = docGrams.groupBy(id).agg(count(lit(1)).as("__n"))
    val hits = docGrams
      .join(broadcast(evalGrams), Seq("__g"), "left_semi")
      .groupBy(id).agg(count(lit(1)).as("__h"))
    val dirty = counts.join(hits, Seq(id))
      .filter(col("__h") * 100 >= lit(minOverlapPct.toLong) * col("__n"))
      .select(id)
    docs.join(dirty, Seq(id), "left_anti")
  }

  /** C4-style boilerplate-line removal: a line occurring in at least
    * `minDocs` DISTINCT documents is boilerplate (navigation,
    * footers, cookie banners) and is dropped from EVERY document;
    * surviving lines reassemble in original order. Distributed shape:
    * explode to (doc, pos, line), count distinct docs per normalized
    * line (partial-agg'd), anti-join the boilerplate set on the line
    * key, regroup sorted by position — two shuffles total, both on
    * line/doc keys, nothing driver-side. */
  def stripBoilerplateLines(docs: DataFrame, id: String, text: String,
      minDocs: Long, sep: String = "\n"): DataFrame =
    stripLines(docs, id, text,
      boilerplateLineSet(docs, id, text, minDocs, sep), sep)

  /** The boiler set a single task can hold as a plan literal —
    * normalized lines average tens of bytes, so 1M entries is tens of
    * MB, the same budget a broadcast hash relation gets. Above it the
    * strip falls back to the line-key anti-join. */
  private val MaxLiteralBoiler = 1 << 20

  /** The normalized boilerplate line set (column `__norm`): lines in
    * >= minDocs distinct docs. At scale this is a maintained corpus
    * STATISTIC (refreshed at ingest beside the corpus, like a hot-key
    * set) — dedup_lines' bench variant reads it persisted. */
  def boilerplateLineSet(docs: DataFrame, id: String, text: String,
      minDocs: Long, sep: String = "\n"): DataFrame =
    boilerFromLines(explodeLines(docs, id, text, sep), id, minDocs)

  private def boilerFromLines(lines: DataFrame, id: String,
      minDocs: Long): DataFrame =
    lines
      .filter(length(col("__norm")) > 0)
      .groupBy("__norm").agg(countDistinct(col(id)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("__norm")

  /** Drop every line in `boiler` from every doc, keep original order.
    * The >= minDocs filter makes boiler a statistic-sized set (the
    * distinct nav/footer/banner lines of the corpus — C4 broadcasts
    * the same set), so it ships to every task as a PLAN LITERAL and
    * the corpus strips in ONE map-side pass (graft_strip_lines): no
    * explode, no line-key join, no doc-key reassembly shuffle —
    * nothing about the corpus moves. The limit-probe (one action, at
    * most MaxLiteralBoiler+1 statistic rows on the driver — the
    * quantilesOf/hotKeysOf bounded-statistic discipline) falls back
    * to the broadcast line-key anti-join + doc-key regroup when the
    * set is too large to ride the plan. */
  private val stripProbeMemo = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
    Array[org.apache.spark.sql.Row]]()

  def stripLines(docs: DataFrame, id: String, text: String,
      boiler: DataFrame, sep: String = "\n"): DataFrame = {
    // NOTE: the limit-probe is an EAGER action at builder time (the
    // statistic is a bounded table property, the quantilesOf
    // discipline), MEMOIZED on the boiler plan's canonicalized form —
    // composing stripLines repeatedly (plan audits, query-map
    // rebuilds) runs the corpus-wide line aggregation once per
    // distinct boiler pipeline, not once per call. Same staleness
    // contract as every per-dataset memo: regenerated data behind an
    // identical plan needs a fresh JVM. Steady-state loops should
    // still collect the set once and call stripLinesLiteral. Column
    // resolved BY NAME: the fallback path joins on __norm, the
    // literal path must read the same column.
    val probe = stripProbeMemo.computeIfAbsent(
      boiler.queryExecution.analyzed.canonicalized,
      _ => boiler.limit(MaxLiteralBoiler + 1).collect())
    if (probe.length <= MaxLiteralBoiler)
      stripLinesLiteral(docs, id, text,
        probe.map(_.getAs[String]("__norm")).toSet, sep)
    else
      stripLineTable(explodeLines(docs, id, text, sep), id, text, boiler, sep)
  }

  /** The literal-set strip: one map-side pass, no corpus shuffle. A
    * steady-state caller that maintains the boiler statistic as a
    * memoized SET (the quantilesOf discipline) calls this directly and
    * pays zero extra actions per execution. */
  def stripLinesLiteral(docs: DataFrame, id: String, text: String,
      boiler: Set[String], sep: String = "\n"): DataFrame =
    // the 1-element explode is the documented Generate barrier: the
    // isNotNull filter would otherwise push below the projection and
    // re-inline the strip expression, evaluating it twice per doc
    docs
      .select(col(id), explode(array(graft.functions.expressions
        .StripLines.of(col(text), sep, boiler))).as(text))
      .filter(col(text).isNotNull)

  /** The DataFrame fallback strip: broadcast anti-join on the line
    * key, regroup on the doc key. Exercised directly by specs (and by
    * stripLines when the boiler set exceeds the literal budget). */
  def stripLineTable(lines: DataFrame, id: String, text: String,
      boiler: DataFrame, sep: String): DataFrame =
    lines
      .join(broadcast(boiler), Seq("__norm"), "left_anti")
      .groupBy(col(id))
      .agg(array_sort(collect_list(struct(col("pos"), col("line")))).as("__ls"))
      .select(col(id),
        concat_ws(sep, transform(col("__ls"), s => s.getField("line"))).as(text))

  private def explodeLines(docs: DataFrame, id: String, text: String,
      sep: String): DataFrame = docs
    .select(col(id), posexplode(split(col(text), java.util.regex.Pattern.quote(sep))))
    .toDF(id, "pos", "line")
    .withColumn("__norm", lower(trim(col("line"))))

  /** Corpus-wide paragraph-level exact dedup (the sub-document
    * variant of exact dedup used before training: a paragraph kept
    * only in the FIRST document containing it — lowest id — and
    * dropped everywhere else). Distributed shape: explode to
    * (doc, pos, para), key each paragraph by md5 so the shuffle
    * carries a 16-byte key instead of arbitrary-length text for the
    * window partitioning, min(doc) per key decides the keeper — one
    * hash shuffle total, constant per-key state.
    *
    * Returns (id, pos, para, keep) so callers can either reassemble
    * kept paragraphs in order or aggregate retention stats. */
  def paragraphDedup(docs: DataFrame, id: String, text: String,
      sep: String = "\n\n"): DataFrame = {
    val paras = docs
      .select(col(id), posexplode(split(col(text), java.util.regex.Pattern.quote(sep))))
      .toDF(id, "pos", "para")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(md5(col("para")))
    paras.withColumn("keep", col(id) === min(col(id)).over(w))
  }

  /** Connected components over near-dup pairs: every doc gets the
    * MINIMUM doc id reachable through pair edges as its cluster id —
    * the transitive-closure grouping LSH dedup needs when near-dup
    * is not an equivalence relation (a~b, b~c but not a~c).
    *
    * Iterative min-label propagation: each round, every node takes
    * the min of its own label and its neighbors' labels; fixpoint in
    * O(component diameter) rounds, detected by a changed-count that
    * hits zero. Each round is one shuffle join + partial-agg min —
    * nothing driver-side but the loop counter. (At billion-edge
    * scale the same loop is run with the large-star/small-star edge
    * rewriting [Kiveris et al., CC in MapReduce]; diameters of
    * near-dup graphs are tiny, so plain propagation is the right
    * default.) */
  def connectedComponents(ids: DataFrame, pairs: DataFrame,
      maxIter: Int = 25, driverEdgeLimit: Long = 1L << 20): DataFrame = {
    val idCol = ids.columns.head
    val ab = graft.CacheScope.track(pairs.toDF("a", "b"))
    // Small-graph fast path: a 0.8-threshold near-dup pair graph is
    // typically orders of magnitude smaller than the corpus, so when
    // the EDGE LIST (not the corpus) fits the driver, classic
    // union-find + one broadcast join beats N propagation rounds.
    // The corpus side stays distributed either way.
    // limit-probe: fetch at most limit+1 edges in ONE action — if we
    // got <= limit, that IS the complete edge list (a second count +
    // collect pair would re-run the whole candidate pipeline's final
    // stage); if we got limit+1, fall through to distributed
    // propagation and never materialize more than that on the driver
    val probe = ab.limit(
      math.min(driverEdgeLimit, Int.MaxValue - 1L).toInt + 1).collect()
    if (probe.length <= driverEdgeLimit) {
      val es = probe.map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val p = parent(c); parent(c) = r; c = p }
        r
      }
      es.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(if (ra < rb) rb else ra) = math.min(ra, rb)
      }
      // min id per component; only non-identity labels need shipping
      val members = es.flatMap { case (a, b) => Seq(a, b) }.distinct
      val minOfRoot = members.groupBy(find).map { case (r, ms) => r -> ms.min }
      val relabel = members.map(m => m -> minOfRoot(find(m)))
        .filter { case (m, l) => m != l }
      val spark = ids.sparkSession
      import spark.implicits._
      val lm = relabel.toSeq.toDF("id", "__cc")
      return ids.select(col(idCol).as("id"))
        .join(broadcast(lm), Seq("id"), "left")
        .select(col("id").as(idCol),
          coalesce(col("__cc"), col("id")).as("cluster"))
    }
    // undirected: propagate both ways
    val edges = graft.CacheScope.track(ab.union(ab.select(col("b"), col("a"))))
    var labels = graft.CacheScope.track(
      ids.select(col(idCol).as("id"), col(idCol).as("cluster")))
    var prevCkpt: DataFrame = null
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = labels.join(edges, col("id") === col("a"))
        .groupBy(col("b")).agg(min("cluster").as("nbr_min"))
      // change detection rides INSIDE the update plan (a label only
      // changes when a neighbor's min undercuts it), so each round is
      // ONE action — the sum both materializes the persisted labels
      // and returns the changed count; the old formulation paid a
      // second join + count job per round, a whole extra pass over
      // the labels at scale
      // localCheckpoint (eager) both materializes the round AND
      // truncates lineage — the join references `labels` twice, so an
      // un-truncated logical tree doubles per round and the analyzer
      // cost alone goes exponential on high-diameter graphs
      val next = labels.join(nbrMin, col("id") === col("b"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster")))
            .as("cluster"),
          (col("nbr_min").isNotNull && col("nbr_min") < col("cluster"))
            .as("__chg"))
        .localCheckpoint(true)
      changed = next.agg(coalesce(sum(when(col("__chg"), 1L).otherwise(0L)),
        lit(0L))).head.getLong(0)
      // round N's checkpoint blocks are dead once round N+1 has
      // materialized from them — unpersist eagerly instead of letting
      // maxIter rounds of checkpoint storage pile up on executors
      if (prevCkpt != null) unpersistCheckpoint(prevCkpt)
      prevCkpt = next
      labels = next.select(col("id"), col("cluster"))
      i += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("id").as(idCol), col("cluster"))
  }

  /** Release the cached blocks behind a `localCheckpoint(true)`d frame
    * whose data no other live plan references. localCheckpoint swaps
    * the logical plan for a LogicalRDD over a persisted RDD; the RDD
    * outlives the round otherwise (until GC), so iterative algorithms
    * must drop round N's blocks once round N+1 is materialized. */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Connected components via alternating large-star / small-star
    * edge rewriting (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC 2014) — the billion-edge upgrade of
    * `connectedComponents`' min-label propagation: propagation needs
    * O(component diameter) rounds (a 1e6-node chain pays 1e6
    * shuffles), star rewriting converges in O(log n) rounds on ANY
    * graph shape by re-rooting edges at neighborhood minima:
    *
    *  - large-star(u): every neighbor v > u re-attaches to
    *    m = min(Γ(u) ∪ u);
    *  - small-star(u): every neighbor v <= u re-attaches to m.
    *
    * Each phase is one shuffle (group neighborhoods by node, one
    * map-side emit); convergence — the edge set reaching its star-
    * graph fixpoint — is detected by an order-invariant fingerprint
    * (count + xxhash sum + extrema, one tiny action per round).
    * Output contract matches `connectedComponents`: every id labeled
    * with its component's MINIMUM id (equivalence proven in
    * DedupClustersSpec on chain/star/random graphs). */
  def connectedComponentsStar(ids: DataFrame, pairs: DataFrame,
      maxIter: Int = 25): DataFrame = {
    val idCol = ids.columns.head
    var edges = graft.CacheScope.track(
      pairs.toDF("a", "b").filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct())

    def neighborhoods(e: DataFrame): DataFrame =
      e.union(e.select(col("b").as("a"), col("a").as("b")))

    // re-root one phase. Large-star at u emits (v, m) for neighbors
    // v > u only — every edge is re-rooted exactly once, from its
    // smaller endpoint. Small-star at u emits (v, m) for v <= u AND
    // (u, m): u itself re-attaches (Kiveris Alg. 2 reduces over
    // N⁻(u) ∪ {u}) — without it a two-node star collapses to a
    // self-loop and the component evaporates.
    def phase(e: DataFrame, large: Boolean): DataFrame = {
      val nb = neighborhoods(e)
      // min(a) over the group IS a (the key) — and unlike first() it
      // is deterministic, so exchange reuse stays eligible
      val mins = nb.groupBy("a")
        .agg(least(min(col("b")), min(col("a"))).as("m"))
      val rerooted = nb.join(mins, "a")
        .filter(if (large) col("b") > col("a") else col("b") <= col("a"))
        .select(least(col("b"), col("m")).as("a"),
          greatest(col("b"), col("m")).as("b"))
      val self = if (large) rerooted
        else rerooted.union(mins.select(least(col("a"), col("m")).as("a"),
          greatest(col("a"), col("m")).as("b")))
      self.filter(col("a") =!= col("b")).distinct()
    }

    def fingerprint(e: DataFrame): (Long, Long, Long, Long) = {
      // bit_xor: order-invariant and overflow-free under ANSI (a sum
      // of 64-bit hashes overflows); count + extrema break the rare
      // xor-cancelling pair patterns
      val r = e.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("a"), col("b"))), lit(0L)),
        coalesce(min(col("a")), lit(0L)), coalesce(max(col("b")), lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }

    var fp = fingerprint(edges)
    var stable = false
    var prevCkpt: DataFrame = null
    var i = 0
    while (!stable && i < maxIter) {
      // cache the large-star frame (the small-star plan references it
      // four times — neighborhood union branches, the mins aggregate,
      // the re-root join), then TRUNCATE lineage at the round
      // boundary: each phase's plan embeds its input ~4 times, so
      // without truncation the LOGICAL tree grows 4^rounds and the
      // analyzer itself goes exponential long before any data moves
      // (persist caches data, not lineage). localCheckpoint swaps the
      // plan for the materialized blocks; at cluster scale with
      // preemptible executors, a reliable checkpoint dir does the
      // same with durability.
      val ls = graft.CacheScope.track(phase(edges, large = true))
      val next = phase(ls, large = false).localCheckpoint(true)
      val nfp = fingerprint(next)
      // round N's checkpoint is dead once round N+1 materialized
      if (prevCkpt != null) unpersistCheckpoint(prevCkpt)
      prevCkpt = next
      stable = nfp == fp
      fp = nfp
      edges = next
      i += 1
    }
    require(stable, s"connectedComponentsStar did not converge in $maxIter rounds")
    // converged: every edge is (component-min root, member)
    val labels = edges.groupBy(col("b").as("id")).agg(min(col("a")).as("__cc"))
    ids.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("__cc"), col("id")).as("cluster"))
  }

  /** Substring-level exact dedup: the MAXIMAL word-token spans of
    * length >= k that occur in at least two distinct documents — the
    * span-granular operator behind "deduplicating training data"
    * pipelines (duplicated passages inside otherwise-unique docs,
    * which doc- and paragraph-level dedup both miss).
    *
    * Distributed formulation (no suffix array needed for fixed
    * minimum length k): positional k-shingle hashes are computed
    * MAP-SIDE per doc; one shuffle keyed by shingle hash marks each
    * occurrence as cross-doc-duplicated (min-doc != max-doc over the
    * hash group — a window, so occurrences keep their positions and
    * no join-back is paid); one shuffle keyed by doc merges runs of
    * consecutive duplicated positions into maximal spans
    * (gaps-and-islands: pos - row_number is constant within a run,
    * and the run [p, p+m] of duplicated k-shingles is exactly the
    * maximal duplicated span [p, p+m+k-1] of words). The final
    * per-(doc, island) aggregate reuses the doc partitioning — no
    * third exchange. Within-doc-only repeats are NOT spans (cross-doc
    * semantics); hash granularity means a 2^-64 collision could merge
    * tokens, caught by the oracle gate if it ever fired.
    *
    * Output: (id, span_start, span_end, span_words) — word indices,
    * end inclusive. */
  def substringSpans(docs: DataFrame, id: String, text: String,
      k: Int): DataFrame = {
    require(k >= 2, s"minimum span length must be >= 2 words, got $k")
    // positional shingle hashes via the native one-pass expression
    // (docs shorter than k words yield an empty array and vanish at
    // the explode); the declarative transform/slice/concat chain it
    // replaces re-assembled O(k) words per position, interpreted
    val occ = docs.select(col(id),
      posexplode(call_function("graft_pos_shingles", col(text), lit(k)))
        .as(Seq("pos", "h")))
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val dup = occ
      .withColumn("__dup",
        min(col(id)).over(byHash) =!= max(col(id)).over(byHash))
      .filter(col("__dup"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(id).orderBy("pos")
    dup
      .withColumn("__isl", col("pos") - row_number().over(byDoc))
      .groupBy(col(id), col("__isl"))
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(k) - 1).as("span_end"),
        (max("pos") - min("pos") + lit(k)).as("span_words"))
      .drop("__isl")
  }

  /** Variable-length MAXIMAL duplicated spans — the longest-match
    * semantics of exact-substring training-data dedup (Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models
    * Better": their ExactSubstr reports maximal verbatim-repeated
    * token spans via a suffix array; reference counterpart of
    * `substringSpans`' fixed-k islands). Distributed reformulation
    * without a global suffix array, via suffix-ordered shingle
    * CHAINS: every occurrence of a duplicated k-shingle is ALIGNED
    * against the corpus-first occurrence of the same content (the
    * partner: min (doc, pos) over the hash group; the first
    * occurrence itself aligns against the second), and consecutive
    * positions whose alignments advance in lockstep — same partner
    * doc, same diagonal (partnerPos − pos) — chain into one span.
    * Every k-window of a chained span equals the partner's window
    * pairwise, so the WHOLE span is verbatim duplicated at the
    * partner offset: spans are exact (no false positives, unlike the
    * every-window-duplicated-somewhere relaxation), variable-length,
    * and maximal relative to the first-occurrence partner choice —
    * a window whose content first occurs in some third location
    * splits the chain (the conservative direction). Within-doc
    * repeats count (Lee et al. semantics), unlike substringSpans'
    * cross-doc-only rule.
    *
    * Scale shape: positional shingles map-side (native expression);
    * ONE hash-keyed exchange feeds the (first-occurrence, count)
    * aggregate, the join-back, and the second-minimum aggregate (the
    * groupBy after the co-partitioned join reuses the h
    * partitioning); chaining is a per-(doc, partnerDoc, diagonal)
    * window — partitions bounded by doc length, never global.
    * Skew-safe where it matters: partner stats are bounded aggregates
    * (two structs + a count per hash), so a million-occurrence
    * boilerplate shingle costs O(1) aggregate state, not a
    * per-occurrence window.
    *
    * Output: (id, span_start, span_end, span_words, src_doc,
    * src_start) — word indices, end inclusive, spans of >= minWords
    * words; src_* locate the partner copy. */
  def maximalSpans(docs: DataFrame, id: String, text: String,
      k: Int, minWords: Int): DataFrame = {
    require(k >= 2, s"seed shingle length must be >= 2 words, got $k")
    require(minWords >= k, s"minWords ($minWords) must be >= k ($k)")
    val occ = docs.select(col(id),
        posexplode(call_function("graft_pos_shingles", col(text), lit(k)))
          .as(Seq("pos", "h")))
      .withColumn("s", struct(col(id).as("d"), col("pos").as("p")))
    val firsts = occ.groupBy("h")
      .agg(min("s").as("m1"), count(lit(1)).as("n"))
      .filter(col("n") >= 2)
    val j1 = occ.join(firsts, "h")
    // n >= 2 and s unique per occurrence guarantee m2 exists per h
    val seconds = j1.filter(col("s") =!= col("m1"))
      .groupBy("h").agg(min("s").as("m2"))
    val aligned = j1.join(seconds, "h")
      .select(col(id), col("pos"),
        when(col("s") === col("m1"), col("m2")).otherwise(col("m1")).as("pt"))
      .select(col(id), col("pos"), col("pt.d").as("src"),
        (col("pt.p") - col("pos")).as("diag"))
    val byChain = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id), col("src"), col("diag")).orderBy("pos")
    aligned
      .withColumn("__isl", col("pos") - row_number().over(byChain))
      .groupBy(col(id), col("src"), col("diag"), col("__isl"))
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(k) - 1).as("span_end"),
        (max("pos") - min("pos") + lit(k)).as("span_words"))
      .filter(col("span_words") >= minWords)
      .select(col(id), col("span_start"), col("span_end"),
        col("span_words"), col("src").as("src_doc"),
        (col("span_start") + col("diag")).as("src_start"))
  }

  /** Content-defined chunking (the FastCDC/rsync idea at word
    * granularity): a word ENDS a chunk when its 32-bit content hash
    * is 0 mod `mask` — boundaries depend only on LOCAL content, so a
    * shared passage chunks identically in every document regardless
    * of surrounding edits, which is exactly what fixed-width
    * substring windows lose under insertion shift. Expected chunk
    * length = `mask` words.
    *
    * Distributed shape: word hashing + boundary flags are map-side;
    * the chunk-group id is a per-DOC prefix sum (window partitioned
    * by doc — never global); chunk assembly reuses the doc
    * partitioning. Word hash = first 8 md5 hex digits as an integer —
    * deliberately md5, not xxhash, so the oracle replays the exact
    * boundary rule.
    *
    * Output: (id, grp, h) — one row per chunk, h = md5 of the
    * space-joined chunk text. */
  def cdcChunks(docs: DataFrame, id: String, text: String,
      mask: Int): DataFrame =
    cdcChunkText(docs, id, text, mask).select(col(id), col("grp"),
      md5(col("__ct")).as("h"))

  /** (id, grp, __ct): chunk texts in order, chunked MAP-SIDE by the
    * one-pass graft_cdc_chunks expression — the window formulation
    * this replaces paid a word-level explode + per-doc window shuffle
    * + (doc, grp) regroup for a per-row computation. */
  private def cdcChunkText(docs: DataFrame, id: String, text: String,
      mask: Int): DataFrame = {
    require(mask >= 2, s"mask must be >= 2, got $mask")
    docs.select(col(id), posexplode(
        graft.functions.expressions.CdcChunkArray.of(col(text), mask)))
      .toDF(id, "grp", "__ct")
  }

  /** Chunk-level dedup report over content-defined chunks: chunks
    * appearing in >= minDocs DISTINCT documents, with occurrence
    * count and the keeper (minimum id). The chunk-hash groupBy is the
    * only corpus-wide shuffle — 16-byte keys, never chunk text. */
  def cdcDupChunks(docs: DataFrame, id: String, text: String,
      mask: Int, minDocs: Long): DataFrame =
    cdcChunks(docs, id, text, mask)
      .groupBy("h")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col(id)).as("n_docs"),
        min(col(id)).as("keep_doc"))
      .filter(col("n_docs") >= minDocs)

  /** Chunk-level scrub — the REMOVAL stage on top of [[cdcChunks]]
    * (all but one copy of each cross-doc-duplicated chunk deleted;
    * the earliest doc keeps its copy). Rule: a chunk survives iff its
    * owner is the MINIMUM doc id over the chunk hash — resolved with
    * a window over the hash key on the (id, grp, h) table (16-byte
    * keys; chunk TEXT never rides the hash shuffle), then a semi-join
    * back to the doc-partitioned chunk-text table. Output per doc:
    * original/kept chunk counts and md5 of the space-joined kept
    * text (docs losing every chunk keep a row with n_kept=0 and the
    * empty-string md5 — the scrub REWRITES the corpus, it does not
    * drop docs). */
  def cdcScrub(docs: DataFrame, id: String, text: String,
      mask: Int): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val chunks = graft.CacheScope.track(
      cdcChunkText(docs, id, text, mask).withColumn("h", md5(col("__ct"))))
    // keep flags resolved on the key-only projection (the h-shuffle
    // never carries chunk text), then ONE (id, grp) join back and ONE
    // per-doc aggregation: counts + conditional ordered reassembly
    // (collect_list skips the nulls of dropped chunks; concat_ws over
    // an empty array is "", so an all-dropped doc yields md5("")
    // without a special case)
    val flags = chunks.select(col(id), col("grp"),
      (min(col(id)).over(W.partitionBy("h")) === col(id)).as("__keep"))
    chunks
      .join(flags, Seq(id, "grp"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        array_sort(collect_list(when(col("__keep"),
          struct(col("grp"), col("__ct"))))).as("__cl"))
      .select(col(id), col("n_chunks"), col("n_kept"),
        md5(concat_ws(" ", transform(col("__cl"), x => x.getField("__ct"))))
          .as("kept_md5"))
  }

  /** Substring-level scrub — the REMOVAL stage on top of
    * `substringSpans` (the public exact-substring dedup recipe:
    * find duplicated spans, then delete all but one copy). Rule,
    * deterministic and SQL-replayable: a word position is scrubbed
    * when it is covered by a cross-doc duplicated k-shingle whose
    * keeper (the minimum doc id over that shingle hash) is a
    * DIFFERENT document — the earliest document keeps its copy,
    * every later copy loses the covered words. Output per doc:
    * original word count, kept word count, and the md5 of the
    * scrubbed text (the fingerprint stands in for shipping the
    * rewritten corpus through the correctness gate).
    *
    * Scale shape: shingle hashing is the one-pass native expression
    * in the scan stage; the keeper resolution is a window over the
    * HASH key (high cardinality — partition-parallel); covered
    * positions explode by at most k per scrubbed occurrence; the
    * rewrite is an anti join on (doc, position) plus one per-doc
    * aggregation. No stage keys on anything lower-cardinality than
    * the corpus itself. */
  def substringScrub(docs: DataFrame, id: String, text: String,
      k: Int): DataFrame = {
    require(k >= 2, s"minimum span length must be >= 2 words, got $k")
    val occ = docs.select(col(id),
      posexplode(call_function("graft_pos_shingles", col(text), lit(k)))
        .as(Seq("pos", "h")))
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val covered = occ
      .withColumn("__keeper", min(col(id)).over(byHash))
      .filter(col("__keeper") < col(id))
      .select(col(id),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("wpos"))
      .distinct()
    val words = docs.select(col(id),
      posexplode(split(col(text), " ")).as(Seq("wpos", "w")))
    val kept = words.join(covered, Seq(id, "wpos"), "left_anti")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_kept"),
        // ordered reassembly without a sort shuffle: per-doc buffer,
        // struct sort by position, then re-join — bounded by doc
        // length, the same per-doc assumption the rest of the corpus
        // family makes
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("wpos"), col("w")))),
          s => s.getField("w")))).as("fp"))
    docs.select(col(id), size(split(col(text), " ")).as("n_words"))
      .join(kept, Seq(id), "left")
      .select(col(id), col("n_words"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("fp"), md5(lit(""))).as("fp"))
  }

  /** Multi-probe IVF cell assignments: (id, cell) with one row per
    * (vector, probed cell) — each vector lands in its `nProbe`
    * nearest of the trained centroids, so boundary-spanning near-dup
    * pairs still share a block. This is the VECTOR-DERIVED blocking
    * key for `embCosPairsFromCells` (a real corpus has no label
    * column to block on; the cells come from the embedding geometry
    * alone). Assignment is one codegen'd map-side pass
    * (graft_nearest_cells) with the centroids riding as a plan
    * literal; the output is the persistable assignment artifact — at
    * scale it is written once beside the corpus and reused by every
    * dedup/ANN consumer. */
  def cellAssignments(embs: DataFrame, id: String, vec: String,
      centers: Array[Array[Double]], nProbe: Int): DataFrame =
    embs.select(col(id),
      explode(call_function("graft_nearest_cells", col(vec),
        typedLit(centers.map(_.toSeq).toSeq), lit(nProbe))).as("cell"))

  /** Embedding-cosine near-dup pairs from a persisted (id, cell)
    * assignment table: candidates are DISTINCT id pairs sharing any
    * cell (one shuffle on the cell key — bounded blocks, never the
    * corpus²), verified by exact cosine on the vectors joined back by
    * id. Cosine rounded to 6 dp before thresholding for engine-stable
    * boundaries. Recall vs brute force is a measured property of
    * (nCells, nProbe) pinned in DedupAnnSpec — near-dup thresholds
    * (cos ≥ 0.9) sit far inside cells, where multi-probe recall ≈ 1;
    * the fixture's deliberately loose 0.4 exercises the boundary
    * case. */
  def embCosPairsFromCells(cells: DataFrame, embs: DataFrame, id: String,
      vec: String, minCos: Double): DataFrame = {
    // Vectors ride THROUGH the cell self-join: one join keyed by cell
    // (at scale: the IVF cell-partitioned at-rest layout — vectors
    // co-located by cell, the same shape ann/IvfPq stores), cosine +
    // threshold evaluated INSIDE the join's codegen stage, and only
    // the tiny surviving pair set pays a distinct (a pair sharing
    // several probed cells computes its cosine once per shared cell —
    // identical value, deduped after the filter). The previous
    // formulation distinct-shuffled MILLIONS of candidate id pairs
    // and then joined the vectors back twice — three shuffles of the
    // candidate volume versus none here.
    val normed = embs.select(col(id).as("__id"), col(vec).as("__v"))
      .withColumn("__nrm", sqrt(VectorOps.dotFast(col("__v"), col("__v"))))
    val withVec = cells.toDF("__id", "cell").join(normed, Seq("__id"))
    val a = withVec.select(col("cell"), col("__id").as("id_a"),
      col("__v").as("v_a"), col("__nrm").as("nrm_a"))
    val b = withVec.select(col("cell"), col("__id").as("id_b"),
      col("__v").as("v_b"), col("__nrm").as("nrm_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", VectorOps.roundAt(
        VectorOps.dotFast(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")), 6))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
      .distinct()
  }

  /** Embedding-cosine near-dup pairs, blocked by a coarse key (label,
    * LSH bucket, …) so the self-join never goes quadratic in the
    * corpus — only within blocks. Cosine rounded to 6 dp before
    * thresholding for engine-stable boundaries. */
  def embCosPairs(embs: DataFrame, id: String, vec: String,
      blockKey: String, minCos: Double): DataFrame = {
    // Norms are computed ONCE per vector before the self-join — per
    // pair only the dot product remains (3x fewer vector passes, and
    // at scale the normed side can be written once and reused).
    val normed = embs.select(col(id), col(vec), col(blockKey))
      .withColumn("nrm", sqrt(VectorOps.dotFast(col(vec), col(vec))))
    val a = normed.select(col(blockKey), col(id).as("id_a"),
      col(vec).as("v_a"), col("nrm").as("nrm_a"))
    val b = normed.select(col(blockKey), col(id).as("id_b"),
      col(vec).as("v_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq(blockKey))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", VectorOps.roundAt(
        VectorOps.dotFast(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")), 6))
      .filter(col("cos") >= minCos)
      .select(col(blockKey), col("id_a"), col("id_b"), col("cos"))
  }
}
