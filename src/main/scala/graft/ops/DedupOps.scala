package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/**
 * Document-deduplication operators for training-data pipelines: exact, MinHash+LSH,
 * SimHash, n-gram Jaccard. Designed for the 100 TB shape:
 *
 *  - exact dedup groups on a 128-bit content hash, never the full text (shuffle carries
 *    16 bytes + id per row, not documents);
 *  - near-dup candidate generation is always *blocked* (LSH bands / SimHash chunks /
 *    shared-shingle inverted index) so the pairwise verify never goes O(n²);
 *  - all fingerprints are native one-pass expressions ([[graft.functions.TextExpressions]]).
 */
object DedupOps {

  /**
   * LSH banding derived from the target threshold by the standard `(1/b)^(1/r)` rule
   * (Leskovec/Rajaraman/Ullman, MMDS §3.4.3): pick the largest rows-per-band `r` (a divisor
   * of `k`) whose S-curve midpoint `(1/b)^(1/r)` stays at or below the threshold, so pairs
   * AT the threshold sit on the high-recall side of the curve. Fewer rows/more bands ⇒
   * higher recall but more candidates; a fixed `bands=16` (r=4, midpoint 0.5) detects a
   * jaccard≈0.2 pair with only ~2.5% probability — the ADVICE r2 fragility this fixes.
   */
  def lshBandsFor(k: Int, threshold: Double): Int = {
    val divisors = (1 to k).filter(k % _ == 0) // candidate r values, ascending
    val r = divisors.takeWhile(r => math.pow(1.0 / (k / r), 1.0 / r) <= threshold)
      .lastOption.getOrElse(1)
    k / r
  }

  /**
   * Exact deduplication: group by md5(text); survivor = lowest id. One shuffle with map-side
   * partial aggregation; the text column itself is dropped before the exchange.
   */
  def exactDupes(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.select(md5(col(textCol)).as("text_md5"), col(idCol))
      .groupBy("text_md5")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /**
   * MinHash + LSH near-duplicate pairs.
   *
   * shingle(n) → minhash(k) → band into `bands` buckets → self-join per (band, bandHash)
   * bucket → estimate Jaccard from signature agreement → keep pairs ≥ `threshold`.
   * The join key (bandIdx, bandHash) is the classic LSH blocking: at scale this is a
   * shuffle-on-band-hash join whose fan-out is bounded by bucket size, not corpus size.
   */
  def minhashLshPairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 0, // 0 = derive from threshold via lshBandsFor
      threshold: Double = 0.4): DataFrame = {
    val nBands = if (bands > 0) bands else lshBandsFor(k, threshold)
    val sigs = df.select(
      col(idCol).as("id"),
      TextFunctions.minhashLong(
        TextFunctions.shingleHashes(TextFunctions.tokens(col(textCol)), shingleN), k).as("sig"))
    // Candidate generation joins only (band, band_hash, id) — 24-byte rows — never the
    // 8*k-byte signatures. Signatures are attached once per *distinct* candidate pair.
    // At 100 TB the banding join shuffle is O(events), the signature join O(candidates).
    val banded = sigs
      .select(col("id"),
        posexplode(TextFunctions.bandHashesFast(col("sig"), nBands)).as(Seq("band", "band_hash")))
    // repartition on the join key: parallelizes the bucket join even when the input is a
    // single parquet file, and is the exchange a shuffle join needs at scale anyway
    val a = banded.select(col("band"), col("band_hash"), col("id").as("id_a"))
      .repartition(col("band"), col("band_hash"))
    val b = banded.select(col("band"), col("band_hash"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    candidates
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), _ === _), x => x)).cast("double") / k)
          .as("jaccard_est"))
      .filter(col("jaccard_est") >= threshold)
  }

  /**
   * MinHash-LSH candidate generation + EXACT verification: bands block the corpus into
   * candidate buckets exactly like [[minhashLshPairs]], but surviving pairs are verified
   * with the true distinct-shingle Jaccard (`array_intersect` on the two shingle-hash sets,
   * fetched only for candidate pairs) instead of the signature estimate. This is the
   * verifiable production shape: the sketch does the blocking (never O(n²)), the exact
   * measure does the accept/reject — so the output is *identical* to the full exact-Jaccard
   * pair list whenever banding recall holds, and a silent banding bug shows up as missing
   * rows, not as a skewed estimate. Banding defaults to [[lshBandsFor]] so recall tracks
   * the requested threshold (at t=0.2, k=64 that is r=2/b=32: per-pair detect probability
   * 1-(1-s²)³² ≈ 0.73 at s=0.2 and ≈ 1-1e-7 at s=0.5 — versus ~2.5% at s=0.2 under the
   * old fixed b=16). Shingle arrays cross the exchange only for candidate pairs.
   */
  def minhashLshVerifiedPairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 0, // 0 = derive from threshold via lshBandsFor
      threshold: Double = 0.4): DataFrame = {
    val nBands = if (bands > 0) bands else lshBandsFor(k, threshold)
    val base = df.select(col(idCol).as("id"),
      TextFunctions.shingleHashes(TextFunctions.tokens(col(textCol)), shingleN).as("shl"))
    val withSig = base.select(col("id"),
      array_distinct(col("shl")).as("sh"),
      TextFunctions.minhashLong(col("shl"), k).as("sig"))
    val banded = withSig
      .select(col("id"),
        posexplode(TextFunctions.bandHashesFast(col("sig"), nBands)).as(Seq("band", "band_hash")))
    val a = banded.select(col("band"), col("band_hash"), col("id").as("id_a"))
      .repartition(col("band"), col("band_hash"))
    val b = banded.select(col("band"), col("band_hash"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val sets = withSig.select(col("id"), col("sh"), size(col("sh")).as("n"))
    val jac = col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter"))
    candidates
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a"), col("n").as("n_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b"), col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"), col("n_a"), col("n_b"))
      .filter(jac >= threshold)
      .select(col("id_a"), col("id_b"), round(jac, 6).as("jaccard"))
  }

  /**
   * Fingerprint-blocked near-duplicate PAIRS over any per-document fingerprint stream —
   * the consumer of MOSS winnowing output (Schleimer et al. 2003 §4: rank pairs by how
   * many selected fingerprints they share; winnowing's guarantee makes any shared token
   * run of >= w+n-1 tokens contribute at least one shared fingerprint, so long verbatim
   * overlaps CANNOT be missed — the locality property bottom-k sketches lack).
   *
   * Input: one row per (doc, fingerprint), fingerprints already distinct per doc.
   * Shape at 100 TB: document-frequency cap first (a fingerprint shared by > `dfCap`
   * docs is boilerplate — joining through it creates df² pair candidates for evidence
   * that contributes 1 to a count; the same stop-key discipline as the inverted-index
   * Jaccard path), then a self-equi-join on the fingerprint (shuffles 16-byte id/fp
   * rows only), count shared per pair, keep pairs with >= `minShared`. Overlap score =
   * n_shared / min(|A|,|B|) over the POST-cap fingerprint sets (both sides of the
   * ratio see the same universe, so boilerplate removal can't push it above 1).
   */
  def fingerprintPairs(
      fps: DataFrame,
      idCol: String = "doc_id",
      fpCol: String = "fp",
      minShared: Int = 2,
      dfCap: Int = 20): DataFrame = {
    val dfCounts = fps.groupBy(col(fpCol)).agg(count(lit(1)).as("__df"))
    val keep = fps.join(dfCounts.filter(col("__df") <= dfCap), Seq(fpCol))
      .select(col(idCol), col(fpCol))
    val sizes = keep.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val a = keep.select(col(fpCol), col(idCol).as("id_a")).repartition(col(fpCol))
    val b = keep.select(col(fpCol), col(idCol).as("id_b"))
    a.join(b, Seq(fpCol))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_shared"),
        round(col("n_shared").cast("double") / least(col("n_a"), col("n_b")), 6)
          .as("overlap"))
  }

  /**
   * Cross-corpus near-duplicate DECONTAMINATION (the GPT-3 appendix-C step): find every
   * document in `train` whose exact distinct-shingle Jaccard with ANY `ref` document
   * (held-out benchmark / eval split) reaches `threshold`, returning the best-matching
   * ref doc as evidence — the rows a pipeline subtracts before training. Exact-match
   * screens ([[graft.ops.SampleOps.contamination]]) miss paraphrased/trimmed leaks; this
   * is the near-dup form over TWO corpora.
   *
   * Same blocked shape as [[minhashLshVerifiedPairs]] but the banded bucket join is
   * train×ref (no self-pairs to suppress): candidates are (train, ref) id pairs sharing
   * an LSH band bucket, verified with the true shingle-set Jaccard fetched per candidate.
   * At 100 TB × a benchmark inventory the banding shuffle is O(rows) 24-byte tuples and
   * the verify join is O(candidates) — the ref side is usually tiny but nothing here
   * requires it (both sides stream through the same exchange).
   *
   * Best-match selection is a deterministic `min(struct(-jaccard₆, ref_id))` per train
   * doc: highest rounded Jaccard wins, ties to the smallest ref id — an ordering a SQL
   * oracle replays exactly. Output: (doc_id, match_id, jaccard), one row per
   * contaminated train doc.
   */
  def crossNearDup(
      train: DataFrame,
      ref: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 0, // 0 = derive from threshold via lshBandsFor
      threshold: Double = 0.4): DataFrame = {
    val nBands = if (bands > 0) bands else lshBandsFor(k, threshold)
    def sigTable(df: DataFrame): DataFrame = df.select(
      col(idCol).as("id"),
      TextFunctions.shingleHashes(TextFunctions.tokens(col(textCol)), shingleN).as("shl"))
      .select(col("id"), array_distinct(col("shl")).as("sh"),
        TextFunctions.minhashLong(col("shl"), k).as("sig"))
    def banded(sigs: DataFrame): DataFrame = sigs.select(col("id"),
      posexplode(TextFunctions.bandHashesFast(col("sig"), nBands)).as(Seq("band", "band_hash")))
    val trainSig = sigTable(train)
    val refSig = sigTable(ref)
    val candidates = banded(trainSig)
      .select(col("band"), col("band_hash"), col("id").as("id_a"))
      .repartition(col("band"), col("band_hash"))
      .join(banded(refSig).select(col("band"), col("band_hash"), col("id").as("id_b")),
        Seq("band", "band_hash"))
      .select("id_a", "id_b").distinct()
    val jac = col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter"))
    val verified = candidates
      .join(trainSig.select(col("id").as("id_a"), col("sh").as("sh_a"), size(col("sh")).as("n_a")), "id_a")
      .join(refSig.select(col("id").as("id_b"), col("sh").as("sh_b"), size(col("sh")).as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"), col("n_a"), col("n_b"))
      .filter(jac >= threshold)
      .select(col("id_a"), col("id_b"), round(jac, 6).as("j"))
    verified
      .groupBy(col("id_a").as(idCol))
      .agg(min(struct((-col("j")).as("nj"), col("id_b").as("ref"))).as("best"))
      .select(col(idCol), col("best.ref").as("match_id"), (-col("best.nj")).as("jaccard"))
  }

  /**
   * SimHash near-duplicates: 64-bit fingerprint, blocked by its four 16-bit chunks
   * (any pair within Hamming distance 3 shares at least one intact chunk — pigeonhole),
   * verified with `bit_count(a^b) <= maxHamming`. Both phases are codegen'd built-ins.
   */
  def simhashPairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      TextFunctions.simhash(TextFunctions.tokens(col(textCol))).as("sim"))
    val chunked = sigs.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(i => shiftrightunsigned(col("sim"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "chunk_val")))
    val a = chunked.select(col("chunk"), col("chunk_val"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = chunked.select(col("chunk"), col("chunk_val"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), TextFunctions.hamming(col("sim_a"), col("sim_b")).as("hamming"))
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * Duplicate clusters from a pair list: connected components by iterative min-label
   * propagation (each node adopts the smallest id reachable through its neighbors;
   * converges in O(diameter) rounds, each one shuffle — near-dup graphs have tiny
   * diameters, so this terminates in a handful of rounds even at corpus scale).
   * Returns (id, cluster_id) where cluster_id = min doc id of the component — the
   * canonical survivor a pipeline keeps.
   */
  def duplicateClusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct().cache()
    // lineage must truncate each round — the plan otherwise embeds the previous round's
    // plan twice (labels feeds both join inputs) and grows 2^rounds. With a checkpoint dir
    // configured (`sc.setCheckpointDir`, the cluster deployment) rounds checkpoint
    // RELIABLY and the iteration survives executor loss; local mode falls back to
    // localCheckpoint (fast, non-fault-tolerant).
    val reliable = pairs.sparkSession.sparkContext.getCheckpointDir.isDefined
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst2"), col("dst") === col("dst2"))
        .groupBy(col("src")).agg(min(col("cluster_id")).as("nmin"))
      val updated = truncate(labels
        .join(neighborMin, labels("id") === neighborMin("src"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id"))).as("cluster_id"),
          (col("nmin") < col("cluster_id")).as("changed")))
      converged = updated.filter(col("changed")).limit(1).count() == 0
      labels = updated.drop("changed")
      i += 1
    }
    edges.unpersist()
    labels
  }

  /**
   * Exact n-gram Jaccard over candidate pairs that share at least one shingle hash
   * (inverted-index blocking). The verify compares distinct-shingle-hash arrays with
   * `array_intersect` — set semantics, order-free.
   */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 3,
      threshold: Double = 0.5,
      /** Skew guard for the inverted-index join: a shingle occurring in `d` documents
        * generates d² candidate rows, so one boilerplate shingle shared by 1% of a
        * billion-doc corpus would alone emit 10¹⁴ pairs. Capping document frequency
        * drops stop-shingles from the index, so both candidacy and the intersection
        * count come from sub-cap shingles — the reported jaccard is then a LOWER BOUND
        * and pairs whose overlap is pure boilerplate drop out (the point of the cap).
        * None = no cap, bit-exact with the naive oracle. */
      maxDocFrequency: Option[Long] = None): DataFrame = {
    // Count-based exact Jaccard: |A∩B| is computed by COUNTING shared shingle hashes in the
    // inverted-index self-join — the shuffle carries (hash, id) pairs and the aggregation
    // (id_a, id_b) counters; the shingle sets themselves never cross the exchange. Set sizes
    // are joined back from the tiny per-doc summary. jaccard = inter / (|A| + |B| - inter).
    val sh = df.select(col(idCol).as("id"),
      array_distinct(
        TextFunctions.shingleHashes(TextFunctions.tokens(col(textCol)), shingleN)).as("sh"))
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val inv0 = sh.select(col("id"), explode(col("sh")).as("h"))
    val inv = maxDocFrequency.fold(inv0) { cap =>
      val hot = inv0.groupBy("h").agg(count(lit(1)).as("df")).filter(col("df") > cap)
        .select("h")
      inv0.join(broadcast(hot), Seq("h"), "left_anti")
    }
    val a = inv.select(col("h"), col("id").as("id_a")).repartition(col("h"))
    val b = inv.select(col("h"), col("id").as("id_b"))
    val jac = col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter"))
    a.join(b, Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .filter(jac >= threshold)
      .select(col("id_a"), col("id_b"), round(jac, 6).as("jaccard"))
  }

  /**
   * PPJoin-style prefix-filtered exact Jaccard pairs (Xiao, Wang, Lin, Yu 2008,
   * "Efficient similarity joins for near duplicate detection"): with each shingle set
   * SORTED in one global canonical order, Jaccard(A,B) ≥ t forces A and B to share a
   * token within their first |X| − ⌈t·|X|⌉ + 1 tokens (else the best-case overlap
   * already falls short) — so the inverted index holds PREFIXES only, cutting the d²
   * candidate blowup at its source instead of dropping hot shingles after the fact
   * (the `maxDocFrequency` cap of [[ngramJaccardPairs]], whose result is a lower
   * bound; this variant stays EXACT). Candidates then verify with a full
   * `array_intersect` — the only stage where whole sets cross an exchange, and it is
   * candidate-bounded. Higher thresholds shrink prefixes (t = 0.8 indexes ~20% of each
   * set); the canonical order here is ascending hash — swapping in ascending global
   * frequency (classic PPJoin) further rarifies prefixes without touching correctness.
   *
   * Output is identical to [[ngramJaccardPairs]] (same oracle replays both).
   */
  def ngramJaccardPrefix(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0)
    val sh = df.select(col(idCol).as("id"),
      array_sort(array_distinct(
        TextFunctions.shingleHashes(TextFunctions.tokens(col(textCol)), shingleN))).as("sh"))
    val pref = sh.select(col("id"), col("sh"), size(col("sh")).as("n"),
      expr(s"slice(sh, 1, greatest(size(sh) - cast(ceil($threshold * size(sh)) as int) + 1, 0))")
        .as("pref"))
    val inv = pref.select(col("id"), explode(col("pref")).as("h"))
    val cand = inv.select(col("h"), col("id").as("id_a")).repartition(col("h"))
      .join(inv.select(col("h"), col("id").as("id_b")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val jac = col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter"))
    cand
      .join(pref.select(col("id").as("id_a"), col("sh").as("__sha"), col("n").as("n_a")), "id_a")
      .join(pref.select(col("id").as("id_b"), col("sh").as("__shb"), col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
        size(array_intersect(col("__sha"), col("__shb"))).as("inter"))
      .filter(jac >= threshold)
      .select(col("id_a"), col("id_b"), round(jac, 6).as("jaccard"))
  }

  /**
   * Character-level edit-distance VERIFICATION of candidate near-dup pairs — the final
   * precision stage after set-similarity blocking: shingle Jaccard is order-insensitive
   * (it can't tell a reshuffled document from an edited one), while normalized
   * Levenshtein certifies actual textual closeness. `edit_sim = 1 − dist/max(len)`,
   * computed by the codegen'd built-in (dynamic-programming kernel, no UDF) and
   * identical in any engine — integers until one rounded division.
   *
   * Scale shape: the O(len_a·len_b) DP — and the ONE place where payloads join — is
   * paid strictly per CANDIDATE pair, so total cost is bounded by the blocking stage's
   * output (df-capped/banded upstream), never |corpus|². The texts reach the pair set
   * through two id-keyed joins; at 100 TB each is a shuffle-hash join on the id.
   */
  def editVerifiedPairs(df: DataFrame, pairs: DataFrame, minSim: Double = 0.2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(textCol).as("__ta"))
    val b = df.select(col(idCol).as("id_b"), col(textCol).as("__tb"))
    pairs.select(col("id_a"), col("id_b"))
      .join(a, "id_a").join(b, "id_b")
      .withColumn("edit_dist", levenshtein(col("__ta"), col("__tb")).cast("long"))
      .withColumn("edit_sim", round(lit(1.0) - col("edit_dist").cast("double") /
        greatest(length(col("__ta")), length(col("__tb"))), 6))
      .filter(col("edit_sim") >= minSim)
      .select(col("id_a"), col("id_b"), col("edit_dist"), col("edit_sim"))
  }

  /**
   * Directional n-gram containment pairs — doc-in-doc / quote detection. Containment
   * C(A⊆B) = |A∩B|/|A| sits near 1 when A is substantially reproduced inside B even
   * when symmetric Jaccard is tiny (|B| ≫ |A|) — the asymmetric near-dup signal that
   * catches subset/quotation documents Jaccard-threshold dedup misses. Same count-based
   * inverted-index shape as [[ngramJaccardPairs]] (shingle hashes shuffle, texts never;
   * same boilerplate skew cap applies); a pair surfaces when EITHER direction reaches
   * `threshold`, with both directions reported.
   */
  def ngramContainmentPairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxDocFrequency: Option[Long] = None): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(
        TextFunctions.shingleHashes(TextFunctions.tokens(col(textCol)), shingleN)).as("sh"))
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val inv0 = sh.select(col("id"), explode(col("sh")).as("h"))
    val inv = maxDocFrequency.fold(inv0) { cap =>
      val hot = inv0.groupBy("h").agg(count(lit(1)).as("df")).filter(col("df") > cap)
        .select("h")
      inv0.join(broadcast(hot), Seq("h"), "left_anti")
    }
    val a = inv.select(col("h"), col("id").as("id_a")).repartition(col("h"))
    val b = inv.select(col("h"), col("id").as("id_b"))
    val contA = col("inter").cast("double") / col("n_a")
    val contB = col("inter").cast("double") / col("n_b")
    a.join(b, Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .filter(contA >= threshold || contB >= threshold)
      .select(col("id_a"), col("id_b"), col("inter").cast("long").as("inter"),
        round(contA, 6).as("containment_a"), round(contB, 6).as("containment_b"))
  }

  /**
   * Incremental exact dedup for continuous ingestion: admit a new batch's documents only
   * if (a) the content digest is absent from the existing corpus index and (b) the row is
   * the batch-internal survivor (min id per digest). This is the shape that keeps dedup
   * O(batch) instead of O(corpus) per run at 100 TB: the corpus is represented by its
   * digest index (16-byte md5 + id — ~1/4000th of the text), the batch collapses to
   * digests before any join, and the anti-join probes the index without ever rereading or
   * reshuffling corpus text. Persist the index bucketed by `content_md5`
   * ([[graft.sinks.Bucketing.writeBucketed]]) and the probe side alone shuffles — the
   * index side of the sort-merge anti-join reads co-located buckets exchange-free.
   * The updated index is `admitted ∪ index` (append the admitted digests to the bucketed
   * index table; no rewrite).
   *
   * @param index existing corpus index with a `content_md5` column
   * @return admitted rows: (idCol, content_md5), min id per novel digest
   */
  def incrementalDedup(batch: DataFrame, index: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    batch.select(col(idCol), md5(col(textCol)).as("content_md5"))
      .groupBy("content_md5").agg(min(col(idCol)).as(idCol))
      .join(index.select("content_md5"), Seq("content_md5"), "left_anti")
      .select(col(idCol), col("content_md5"))

  /** MinHash signatures for a corpus — the compact (id, 64-long sig) representation a
    * near-dup index persists instead of text (~512 bytes/doc regardless of doc size). */
  def minhashSigs(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      shingleN: Int = 3, k: Int = 64): DataFrame =
    df.select(col(idCol).as("id"),
      TextFunctions.minhashLong(
        TextFunctions.shingleHashes(TextFunctions.tokens(col(textCol)), shingleN), k).as("sig"))

  /**
   * Incremental NEAR-dup admission (the LSH analog of [[incrementalDedup]]): a new batch
   * is screened against the signature index of everything already ingested, in O(batch)
   * work — the corpus never re-shingles, re-hashes or re-pairs. Banding blocks the probe
   * exactly like [[minhashLshPairs]]: the cross join carries (band, band_hash, id) rows
   * only, signatures attach once per distinct candidate, and the accept/reject measure is
   * signature agreement ≥ threshold. Index bands are a cheap narrow projection of the
   * compact sig table (persist them bucketed by (band, band_hash) to skip even that map
   * at scale). Intra-batch near-dups are rejected greedily (the larger id of each
   * detected pair loses — deterministic, possibly over-rejecting along chains, the
   * standard C4-style compromise; run [[duplicateClusters]] offline for exact
   * per-component survivors).
   *
   * @param indexSigs (id, sig) of the ingested corpus, as produced by [[minhashSigs]];
   *                  append each admitted batch's output to it
   * @return admitted (id, sig) rows
   */
  def nearDupAdmission(batch: DataFrame, indexSigs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", shingleN: Int = 3, k: Int = 64, bands: Int = 0,
      threshold: Double = 0.4): DataFrame =
    nearDupAdmissionSigs(minhashSigs(batch, textCol, idCol, shingleN, k), indexSigs,
      k, bands, threshold)

  /**
   * Signature-level core of [[nearDupAdmission]]: everything below the shingle/minhash
   * step needs only (id, sig) — callers that already hold (or persisted) the batch
   * signatures pass them here, so text is tokenized and hashed exactly once per batch
   * (the streaming path [[graft.streaming.IngestDedup.applyBatchNear]] caches `batchSigs`
   * for this reason; both the index probe and the intra-batch self-join then reuse the
   * materialized signatures instead of re-deriving them from text).
   */
  def nearDupAdmissionSigs(batchSigs: DataFrame, indexSigs: DataFrame, k: Int = 64,
      bands: Int = 0, threshold: Double = 0.4): DataFrame = {
    val nBands = if (bands > 0) bands else lshBandsFor(k, threshold)
    def bandsOf(sigs: DataFrame): DataFrame = sigs.select(col("id"),
      posexplode(TextFunctions.bandHashesFast(col("sig"), nBands)).as(Seq("band", "band_hash")))
    val est = (sa: Column, sb: Column) =>
      size(filter(zip_with(sa, sb, _ === _), x => x)).cast("double") / k
    val batchBands = bandsOf(batchSigs)
    val idxBands = bandsOf(indexSigs).select(col("band"), col("band_hash"), col("id").as("ing_id"))
    val candidates = batchBands.repartition(col("band"), col("band_hash"))
      .join(idxBands, Seq("band", "band_hash"))
      .select(col("id"), col("ing_id")).distinct()
    val rejectedByIndex = candidates
      .join(batchSigs, "id")
      .join(indexSigs.select(col("id").as("ing_id"), col("sig").as("ing_sig")), "ing_id")
      .filter(est(col("sig"), col("ing_sig")) >= threshold)
      .select("id").distinct()
    // intra-batch pairs from the SAME signature table (no re-hash of text): banded
    // self-join, estimate verify, greedy larger-id rejection
    val intraCandidates = batchBands.select(col("band"), col("band_hash"), col("id").as("id_a"))
      .repartition(col("band"), col("band_hash"))
      .join(batchBands.select(col("band"), col("band_hash"), col("id").as("id_b")),
        Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val rejectedIntra = intraCandidates
      .join(batchSigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(batchSigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .filter(est(col("sig_a"), col("sig_b")) >= threshold)
      .select(col("id_b").as("id")).distinct() // id_b > id_a: min id of each pair survives
    batchSigs.join(rejectedByIndex.union(rejectedIntra).distinct(), Seq("id"), "left_anti")
  }

  /**
   * Corpus snapshot diff (dataset versioning): added / removed / changed documents
   * between two releases, compared by content digest. Each side collapses to
   * (id, 16-byte md5) BEFORE the full-outer join, so snapshot text never shuffles; with
   * both releases persisted bucketed by id ([[graft.sinks.Bucketing.writeBucketed]]) the
   * diff is exchange-free. Unchanged rows are dropped in the same plan — the output is
   * the (small) changeset a release pipeline audits or ships as a delta.
   */
  def snapshotDiff(before: DataFrame, after: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    before.select(col(idCol), md5(col(textCol)).as("md5_before"))
      .join(after.select(col(idCol), md5(col(textCol)).as("md5_after")), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("md5_before").isNull, "added")
          .when(col("md5_after").isNull, "removed")
          .when(col("md5_before") =!= col("md5_after"), "changed")
          .otherwise("unchanged").as("change"),
        col("md5_before"), col("md5_after"))
      .filter(col("change") =!= "unchanged")

  /**
   * KMV (bottom-k) sketch overlap between two corpora — the constant-size estimator for
   * "how much does my training data overlap that benchmark / that other snapshot" when
   * the exact distinct-shingle join ([[graft.ops.SampleOps.contaminationScreen]]-style)
   * is too heavy to run routinely (Beyer et al. 2007, "On synopses for distinct-value
   * estimation under multiset operations"; the theta-sketch set algebra generalizes it).
   *
   * Each side reduces to its k smallest DISTINCT 60-bit shingle hashes — a collectible
   * model artifact like the ANN codebooks (k longs, not data) — and the union sketch
   * U = bottom-k(A ∪ B) estimates `jaccard ≈ |U ∩ A ∩ B| / |U|`. Both sketches build
   * in ONE job: the sides union under a flag, distinct over (side, hash) is the single
   * exchange (9-byte rows after map-side combine), and a bounded-heap top-k aggregate
   * ([[graft.functions.TopKFunctions.topKByScore]]) folds each side to k longs — no
   * per-side re-scan, no TakeOrdered over the distinct set. Sketches of immutable
   * corpora should be persisted and reused — the compare itself is then free.
   *
   * Beyond Jaccard, the union sketch also yields the DIRECTIONAL containment estimates
   * (`|A∩B| / |B| ≈ n_shared / |U ∩ B|` and mirrored) — the contamination question
   * ("what fraction of benchmark B appears in training set A") that a symmetric
   * Jaccard hides when the corpora differ by orders of magnitude.
   *
   * Uses [[graft.ops.TextOps.md5Hash60]], so a SQL engine reproduces every output
   * column bit-for-bit (integer hashes; the divisions are exactly-rounded IEEE in
   * both engines). Returns a single row: (k, n_a, n_b, a_kth_min, b_kth_min, n_union,
   * n_in_a, n_in_b, n_shared, est_jaccard, est_containment_a, est_containment_b).
   */
  def kmvOverlap(a: DataFrame, b: DataFrame, k: Int = 256, shingleN: Int = 3,
      textCol: String = "text"): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    // per-row bottom-k FIRST (native one-pass Md5ShingleBottomK): the corpus bottom-k is
    // necessarily inside every row's own bottom-k, so each doc contributes <= k hashes to
    // the distinct exchange instead of its full shingle stream — exact, and the same
    // md5-60 values the oracle computes from shingle strings
    def hashes(df: DataFrame, side: Boolean): DataFrame =
      df.select(lit(side).as("is_a"), explode(
        TextFunctions.md5ShingleBottomK(
          TextFunctions.tokens(col(textCol)), shingleN, k)).as("h"))
    // constant score + hash tiebreak = exact bottom-k by hash under the aggregate's
    // (score DESC, tiebreak ASC) order — no double-rounding of 60-bit hashes
    val sketches = hashes(a, side = true).unionByName(hashes(b, side = false))
      .distinct()
      .groupBy("is_a")
      .agg(graft.functions.TopKFunctions.topKByScore(
        lit(0.0), col("h"), struct(col("h")), k).as("sk"))
      .collect()
      .map(r => r.getBoolean(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)).toArray.sorted).toMap
    val hA = sketches.getOrElse(true, Array.empty[Long])
    val hB = sketches.getOrElse(false, Array.empty[Long])
    val union = (hA ++ hB).distinct.sorted.take(k)
    val setA = hA.toSet
    val setB = hB.toSet
    val nInA = union.count(setA)
    val nInB = union.count(setB)
    val nShared = union.count(h => setA(h) && setB(h))
    def ratio(num: Int, den: Int): Double = if (den == 0) 0.0 else num.toDouble / den
    Seq((k.toLong, hA.length.toLong, hB.length.toLong,
      if (hA.isEmpty) -1L else hA.last, if (hB.isEmpty) -1L else hB.last,
      union.length.toLong, nInA.toLong, nInB.toLong, nShared.toLong,
      ratio(nShared, union.length), ratio(nShared, nInA), ratio(nShared, nInB)))
      .toDF("k", "n_a", "n_b", "a_kth_min", "b_kth_min", "n_union", "n_in_a", "n_in_b",
        "n_shared", "est_jaccard", "est_containment_a", "est_containment_b")
  }

  /**
   * Line-level boilerplate removal (the C4 recipe: drop every line that occurs in more
   * than `maxDocs` distinct documents — navigation chrome, cookie banners, copyright
   * footers). Two passes, both cheap at 100 TB:
   *
   *  1. frequency count: lines collapse to md5 digests BEFORE the exchange, so the
   *     aggregation shuffles 16-byte hashes + doc ids, never text;
   *  2. rebuild: the frequent set (boilerplate is small by nature — lines repeated across
   *     >maxDocs documents) folds to a single array and is broadcast back onto the corpus,
   *     so the rebuild is a pure map over the scan: document text never crosses an
   *     exchange, and there is no per-line join or re-group to reassemble documents.
   *
   * Returns (idCol, n_lines, n_kept, clean_md5) where clean_md5 digests the surviving
   * lines joined by \n in their original order (md5("") for fully-boilerplate docs).
   */
  def lineDedup(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      maxDocs: Int = 2): DataFrame = {
    val lines = split(col(textCol), "\n")
    val freq = df.select(col(idCol), explode(lines).as("line"))
      .groupBy(md5(col("line")).as("h"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .where(col("nd") > maxDocs)
      .agg(collect_list(col("h")).as("freqs"))
    val kept = filter(lines, l => !array_contains(col("freqs"), md5(l)))
    df.crossJoin(broadcast(freq))
      .select(col(idCol),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        md5(concat_ws("\n", kept)).as("clean_md5"))
  }

  /**
   * C4-style per-source boilerplate removal (Raffel et al. 2020 §2.2 applied at the
   * source granularity): a line is boilerplate iff it occurs in more than `maxDocs`
   * DISTINCT documents of the SAME source (nav bars, footers, cookie banners are
   * source-templated — a line legitimately shared across different sources is content,
   * not chrome, so the global [[lineDedup]] rule would over-strip).
   *
   * Scale: the frequency pass shuffles (source, line-md5) pairs — never text — and the
   * per-source boilerplate sets are tiny (template lines per site), so they broadcast
   * back as one array per source; the strip itself is a narrow map. At 100 TB this is
   * one digest-sized exchange + a broadcast hash join on `source`.
   */
  def boilerplateStrip(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      srcCol: String = "source", maxDocs: Int = 2): DataFrame = {
    val lines = split(col(textCol), "\n")
    val freq = df.select(col(srcCol), col(idCol), explode(lines).as("line"))
      .groupBy(col(srcCol), md5(col("line")).as("h"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .where(col("nd") > maxDocs)
      .groupBy(col(srcCol))
      .agg(collect_list(col("h")).as("__bp"))
    val bp = coalesce(col("__bp"), array().cast("array<string>"))
    val kept = filter(lines, l => !array_contains(bp, md5(l)))
    df.join(broadcast(freq), Seq(srcCol), "left")
      .select(col(idCol), col(srcCol),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        md5(concat_ws("\n", kept)).as("clean_md5"))
  }

  /**
   * Exact duplicated-span detection (the ExactSubstr idea of Lee et al. 2022,
   * "Deduplicating Training Data Makes Language Models Better", re-expressed for Spark):
   * a span is duplicated when the same `k`-token window appears in more than one document.
   * Maximal duplicated substrings of ≥ `k` tokens surface as *runs* of consecutive
   * duplicated windows, so per-doc we report the window counts plus the longest run
   * (a run of `r` windows covers a shared span of `r + k - 1` tokens).
   *
   * 100 TB shape — the suffix-array of the reference papers is replaced by pure
   * shuffle-friendly relational algebra:
   *
   *  - windows are hashed to 64 bits immediately after tokenization, so every exchange
   *    carries `(hash, doc_id, win_idx)` — 20-byte rows, never window text;
   *  - the duplicated-hash set is one hash-partitioned `countDistinct(doc_id) > 1`
   *    aggregation (map-side combined) — no inverted-index materialization;
   *  - run detection is the classic gaps-and-islands window over `(doc, win_idx)`:
   *    one exchange on `doc_id`, state bounded by a doc's own window count.
   *
   * Returns (idCol, n_windows, n_dup_windows, max_dup_run) for EVERY input document
   * (docs shorter than `k` tokens report zeros).
   *
   * Approximation bound: duplicate detection compares 64-bit window hashes, not window
   * text — two DISTINCT windows colliding on XXH64 would count as duplicates. Expected
   * spurious pairs over W distinct windows ≈ W²/2⁶⁵: negligible through ~10⁸ windows,
   * and at 10¹⁰+ windows (the 100 TB regime) a handful of expected collisions makes
   * this a tightly-bounded approximation rather than exact ExactSubstr semantics. Where
   * exactness matters, verify candidate runs against token text the way
   * [[minhashLshVerifiedPairs]] re-checks its candidates.
   */
  def spanDedupStats(df: DataFrame, k: Int = 12, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // windows come pre-hashed from the one-pass native ShingleHashes (token hashes
    // computed once, k-window hash = XXH64 chain) — the string-building HOF variant
    // interpreted at ~10× the cost and shipped window text into the first projection
    val wins = df.select(col(idCol), posexplode(
      TextFunctions.shingleHashes(TextFunctions.tokens(col(textCol)), k)).as(Seq("win_idx", "h")))
    val dupH = wins.groupBy("h").agg(countDistinct(col(idCol)).as("nd"))
      .where(col("nd") > 1).select(col("h"), lit(true).as("is_dup"))
    val marked = wins.join(dupH, Seq("h"), "left")
      .select(col(idCol), col("win_idx"), coalesce(col("is_dup"), lit(false)).as("is_dup"))
    // gaps-and-islands: consecutive duplicated win_idx values share (win_idx - rank);
    // non-dup rows take grp = -1 so ONE two-level aggregation yields window counts,
    // dup counts, and the longest run together (no stats-vs-runs branch re-evaluation)
    val byDup = Window.partitionBy(col(idCol), col("is_dup")).orderBy(col("win_idx"))
    val perRun = marked
      .withColumn("grp",
        when(col("is_dup"), col("win_idx") - row_number().over(byDup)).otherwise(lit(-1L)))
      .groupBy(col(idCol), col("is_dup"), col("grp")).agg(count(lit(1)).as("c"))
    val stats = perRun.groupBy(idCol).agg(
      sum(col("c")).as("n_windows"),
      sum(when(col("is_dup"), col("c")).otherwise(0L)).as("n_dup_windows"),
      max(when(col("is_dup"), col("c")).otherwise(0L)).as("max_dup_run"))
    df.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("max_dup_run"), lit(0L)).as("max_dup_run"))
  }

  /**
   * Exact-substring SPAN REMOVAL at the Lee et al. 2022 grain (k = 50 tokens by
   * default) — the big sibling of [[spanDedupStats]]: not just per-doc duplication
   * stats but the REMOVAL decision itself. A k-token window is duplicated when its
   * digest occurs at more than one (doc, position) — occurrences, not distinct docs,
   * so within-doc repeats count, as in the paper. Every duplicated occurrence except
   * ONE canonical keeper (the lexicographic minimum (doc_id, win_idx) — deterministic,
   * replay-stable) is a LOSER, and a doc's loser windows merge (overlap or adjacency)
   * into removal intervals: exactly the token spans a Lee-et-al pass cuts while
   * leaving one copy of every duplicated span in the corpus.
   *
   * Suffix-FREE 100 TB shape — the published implementations build a corpus-wide
   * suffix array (Lee et al. 2022 §4; a global sort of every suffix); here the same
   * decision is shuffle-friendly relational algebra on digests:
   *   - ONE tokenize scan; windows digest through the [[TextFunctions.shingleHashes]]
   *     XXH64 rolling chain (`kernel = true`, the library default — no window string
   *     ever materializes) or the md5-60 string twin (`kernel = false`, the oracle
   *     form — the winnowing/decontaminate pairing);
   *   - occurrence rows are (h, doc, idx) — ~20 bytes, never text;
   *   - keeper election is ONE hash-partitioned aggregation per digest
   *     (count + min(struct(doc, idx)), map-side combined) — block-local work plus
   *     one exchange on the digest, no global order anywhere;
   *   - interval merge is the gaps-and-islands cummax window per doc — one exchange
   *     on doc_id, state bounded by a doc's own window count (block-local sort with
   *     boundary stitching via the running max, never a corpus sort).
   *
   * Collision bound: as [[spanDedupStats]] — 64-bit digests make this a tightly
   * bounded approximation of exact ExactSubstr semantics past ~10⁹ distinct windows;
   * where exactness matters, re-verify candidate spans against token text.
   *
   * @return (idCol, n_tokens, n_windows, n_loser_windows, n_dup_spans,
   *         n_removed_tokens) for EVERY input doc (short docs report zeros)
   */
  def spanRemoveStats(df: DataFrame, k: Int = 50, textCol: String = "text",
      idCol: String = "doc_id", kernel: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tokens materialize in a pre-Generate projection (CollapseProject keeps the
    // tokenizer single-evaluation — the bm25 idiom); posexplode_outer keeps short
    // docs so n_tokens/n_windows never need a second corpus scan
    val toksDf = df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
    val hashes =
      if (kernel) TextFunctions.shingleHashes(col("__toks"), k)
      else transform(TextFunctions.shingles(col("__toks"), k),
        s => graft.ops.TextOps.md5Hash60(s))
    // the occurrence table feeds THREE consumers (keeper election, loser probe, the
    // per-doc base counts) — localCheckpoint once so the tokenize+digest scan runs
    // once, not three times; at scale the checkpointed rows are ~20 bytes per corpus
    // token (~2% of corpus bytes on executor-local disk) vs three full CPU passes
    val wins = toksDf.select(col(idCol),
      coalesce(size(col("__toks")), lit(0)).cast("long").as("n_tokens"),
      posexplode_outer(hashes))
      .select(col(idCol), col("n_tokens"),
        col("pos").cast("long").as("idx"), col("col").as("h"))
      .localCheckpoint(true)
    val dup = wins.filter(col("h").isNotNull)
      .groupBy(col("h"))
      .agg(count(lit(1)).as("occ"),
        min(struct(col(idCol).as("kd"), col("idx").as("ki"))).as("kp"))
      .filter(col("occ") > 1)
      .select(col("h"), col("kp.kd").as("kd"), col("kp.ki").as("ki"))
    val losers = wins.join(dup, Seq("h"))
      .filter(!(col(idCol) === col("kd") && col("idx") === col("ki")))
      .select(col(idCol), col("idx"))
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("idx"))
    val grouped = losers
      .withColumn("__prev_end",
        max(col("idx") + lit(k - 1)).over(wDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__g", sum(
        when(col("__prev_end").isNull || col("idx") > col("__prev_end") + 1, 1L)
          .otherwise(0L)).over(wDoc.rowsBetween(Window.unboundedPreceding, 0)))
    val spans = grouped.groupBy(col(idCol), col("__g"))
      .agg((max(col("idx")) - min(col("idx")) + lit(k.toLong)).as("removed"),
        count(lit(1)).as("__nl"))
    val perDocSpans = spans.groupBy(col(idCol)).agg(
      sum(col("__nl")).cast("long").as("n_loser_windows"),
      count(lit(1)).as("n_dup_spans"),
      sum(col("removed")).cast("long").as("n_removed_tokens"))
    wins.groupBy(col(idCol)).agg(
        max(col("n_tokens")).as("n_tokens"), count(col("h")).as("n_windows"))
      .join(perDocSpans, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("n_windows"),
        coalesce(col("n_loser_windows"), lit(0L)).as("n_loser_windows"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("n_removed_tokens"), lit(0L)).as("n_removed_tokens"))
  }

  /** Distinct k-token window hashes of a corpus — the persisted index artifact for
    * [[spanAdmission]] (8 bytes per distinct window; append each admitted batch's
    * hashes, bucket by `h` so the probe join is exchange-free at scale). */
  def windowHashes(df: DataFrame, k: Int = 12, textCol: String = "text"): DataFrame =
    df.select(explode(
      TextFunctions.shingleHashes(TextFunctions.tokens(col(textCol)), k)).as("h")).distinct()

  /**
   * Incremental SPAN-dedup admission — the ExactSubstr analog of [[incrementalDedup]]
   * (exact) and [[nearDupAdmission]] (MinHash), completing the incremental-ingest family:
   * a new document is rejected when more than `maxSharedFrac` of its k-token windows
   * already exist in the ingested corpus (it is mostly stitched from already-seen spans —
   * the memorization-risk shape doc-level hashes can't see, because no single prior doc
   * need be similar).
   *
   * O(batch): the corpus never re-tokenizes — the batch's window hashes semi-join the
   * persisted index (multiplicity-safe: a left-semi probe counts each batch window once
   * no matter how the index side is stored). Window counts come from a separate narrow
   * map so nothing batch-sized shuffles twice. The admit decision compares the UNROUNDED
   * fraction (the reported `shared_frac` rounds to 6 dp for display/oracle parity — at
   * ≥10⁶ windows a doc just over the threshold would otherwise round back onto it).
   *
   * @param indexHashes window-hash index with column `h`, as produced by [[windowHashes]]
   * @return (idCol, n_windows, n_shared, shared_frac, admitted) for every batch doc;
   *         docs shorter than `k` tokens have no windows and are always admitted
   */
  def spanAdmission(batch: DataFrame, indexHashes: DataFrame, k: Int = 12,
      maxSharedFrac: Double = 0.5, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val nw = batch.select(col(idCol),
      size(TextFunctions.shingleHashes(TextFunctions.tokens(col(textCol)), k))
        .cast("long").as("n_windows"))
    val wins = batch.select(col(idCol), explode(
      TextFunctions.shingleHashes(TextFunctions.tokens(col(textCol)), k)).as("h"))
    val shared = wins.join(indexHashes.select("h"), Seq("h"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
    val frac = col("n_shared") / col("n_windows").cast("double")
    nw.join(shared, Seq(idCol), "left")
      .select(col(idCol), col("n_windows"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("shared_frac",
        when(col("n_windows") > 0, round(frac, 6)).otherwise(0.0))
      .withColumn("admitted",
        when(col("n_windows") > 0, frac <= maxSharedFrac).otherwise(lit(true)))
  }

  /**
   * Quality-aware canonical selection over duplicate clusters: instead of the min-id
   * survivor [[duplicateClusters]] pins, keep the member that maximizes `scoreCol`
   * (ties break to the smallest id) — the "keep the longest / highest-quality copy"
   * policy real corpus pipelines use, where near-dup clusters mix truncated and
   * complete versions of a page. One row per cluster member with its cluster, the
   * winning id, and a `kept` flag.
   *
   * Scale shape: the argmax is a single `max(struct(score, -id))` hash aggregate
   * (no per-cluster sort window), and the winner table joins back on `cluster_id` —
   * the same key the aggregate just partitioned by, so AQE reuses the exchange. The
   * winner table scales with cluster count, so it is NOT broadcast.
   */
  def keepBest(clusters: DataFrame, docs: DataFrame, scoreCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val scored = clusters.join(
      docs.select(col(idCol).as("id"), col(scoreCol).as("__s")), "id")
    val best = scored.groupBy(col("cluster_id"))
      .agg(max(struct(col("__s").as("s"), (-col("id")).as("nid"))).as("__b"))
      .select(col("cluster_id"), (-col("__b.nid")).as("keep_id"))
    scored.join(best, "cluster_id")
      .select(col("id").as(idCol), col("cluster_id"), col("keep_id"),
        (col("id") === col("keep_id")).as("kept"))
  }
}
