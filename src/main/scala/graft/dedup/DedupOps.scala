package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators over a document table — the north-star family a
  * training-data pipeline runs before anything else (SURVEY.md §7.4).
  *
  * Four tiers, cheapest-first, all bucketed (never all-pairs):
  *
  *  1. '''Exact''' ([[exactDuplicates]]) — group by normalized-content md5.
  *     One hash-shuffle; at 100 TB this is the classic map-side-combinable
  *     aggregation.
  *  2. '''MinHash + LSH''' ([[minhashCandidatePairs]]) — 3-token shingles →
  *     32 affine min-hashes → 8 bands × 4 rows. Collision probability at
  *     Jaccard J is 1-(1-J⁴)⁸ (S-curve centered ≈ 0.59), so true near-dups
  *     (J≳0.8) are found with ~certainty while random pairs (J≲0.1) are
  *     suppressed ~J⁴. Candidate generation joins on (band, band-key) —
  *     work scales with bucket occupancy, never |docs|².
  *  3. '''SimHash''' ([[simhash]]) — 32-bit sign-of-weighted-bits signature
  *     computed per-row with higher-order array functions: NO explode, NO
  *     shuffle; hamming-close signatures are near-dups.
  *  4. '''Exact n-gram Jaccard''' ([[jaccardPairs]]) — the verifier for tiers
  *     2/3: inverted-index join on shingles, |A∩B| by count, J from per-doc
  *     set sizes. At scale, cap shingle document-frequency before the join
  *     (hot shingles contribute candidates quadratically but almost never
  *     evidence J≥0.5 — a df-cap bounds the blow-up with bounded recall loss).
  *
  * All hash math is engine-portable: x = first 8/15 hex digits of md5 (fits
  * BIGINT identically in Spark `conv` and DuckDB `'0x…'::BIGINT`), affine
  * hashes (a·x+b) mod p with a < 2³¹, x < 2³², p = 4294967311 — the product
  * stays below 2⁶³, so signed-64 arithmetic never overflows in either engine.
  */
object DedupOps {

  /** Smallest prime > 2³² — the classic MinHash modulus. */
  val HashPrime: Long = 4294967311L

  val NumHashes = 32
  val BandRows  = 4
  val NumBands  = 8 // NumHashes / BandRows

  val ShingleSize = 3

  /** Deterministic affine coefficients (aᵢ, bᵢ), LCG-derived. aᵢ < 2³¹−1
    * keeps aᵢ·x below 2⁶³ − 2³³ for x < 2³², and bᵢ < p ≈ 2³² fits in the
    * remaining ≈1.07·10¹⁰ headroom — ranges enforced by the
    * [[TextHashKernel]] constructor.
    */
  val hashCoeffs: Seq[(Long, Long)] = (0 until NumHashes).map { i =>
    val a = (1103515245L * (i + 1) + 12345L)  % 2147483647L
    val b = (69069L * (i + 1) + 1234567L)     % HashPrime
    (a, b)
  }

  /** Shared compiled kernel for the md5/simhash/minhash/shingle hot loops —
    * same math as the interpreted higher-order formulations (see
    * [[TextHashKernel]] for the bit-identical contract; DedupOpsSpec asserts
    * it against the interpreted expressions on real data).
    */
  private val kernel = new TextHashKernel(
    hashCoeffs.map(_._1).toArray,
    hashCoeffs.map(_._2).toArray,
    HashPrime,
    ShingleSize
  )

  private def bridged(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)
  private def exprOf(c: Column) = org.apache.spark.sql.GraftColumnBridge.expression(c)

  private def simhashCol(toks: Column): Column  = bridged(SimHash32(exprOf(toks), kernel))
  private def minhashCol(toks: Column): Column  = bridged(MinHashSig(exprOf(toks), kernel))
  private def shinglesCol(toks: Column): Column = bridged(ShingleArray(exprOf(toks), kernel))

  /** Per-row shingle array over a token-array column (all occurrences,
    * duplicates preserved) — the compiled kernel behind [[shingleDF]],
    * exposed for per-row consumers (e.g. TextOps.repetition) that must keep
    * sub-shingle-length docs in their output.
    */
  private[graft] def shingleArray(toks: Column): Column = shinglesCol(toks)

  // --- shared shingle machinery --------------------------------------------

  /** Raw (doc_id, shingle) occurrences: lowercased whitespace tokens joined
    * in sliding windows of [[ShingleSize]]. Docs shorter than one shingle
    * drop out (mirrored by the oracle's empty-range semantics). NOT
    * per-doc-deduplicated: downstream consumers dedup inside their own
    * aggregate (collect_set / duplicate-insensitive min), which costs one
    * less exchange than a standalone distinct.
    */
  def shingleDF(docs0: DataFrame): DataFrame = {
    val docs = graft.Tables.widen(docs0)
    val toks = split(graft.text.TextOps.lowerSimple(col("text")), " ")
    docs.select(col("doc_id"), explode(shinglesCol(toks)).as("shingle"))
  }

  private[graft] val oracleShingleCte =
    """toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
      |sh AS (SELECT DISTINCT doc_id, s FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ts)-1), i -> concat(ts[i], ' ', ts[i+1], ' ', ts[i+2]))) AS s
      |  FROM toks))""".stripMargin

  // --- tier 1: exact --------------------------------------------------------

  /** Exact-duplicate groups by normalized content: (fingerprint, kept doc,
    * copy count). `keep_doc_id = min(doc_id)` is the canonical survivor; a
    * caller dedups by semi-joining on it.
    */
  def exactDuplicates(docs0: DataFrame): DataFrame = {
    val docs = graft.Tables.widen(docs0)
    val norm = graft.text.TextOps.lowerSimple(regexp_replace(col("text"), "\\s+", " "))
    docs
      .select(col("doc_id"), md5(norm.cast("binary")).as("fp_md5"))
      .groupBy(col("fp_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")
  }

  def oracleExactDuplicates: String =
    """SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp_md5,
      |  min(doc_id) AS keep_doc_id, count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keep_doc_id""".stripMargin

  // --- tier 2: MinHash + LSH ------------------------------------------------

  /** Per-doc MinHash signature (s0..s31), computed entirely PER ROW by the
    * native [[MinHashSig]] kernel: no shingle explode, no per-doc shuffle —
    * signature generation is an embarrassingly parallel map pass (the old
    * explode + 32-min groupBy formulation shuffled every shingle occurrence).
    * Docs shorter than one shingle drop out, as before. Duplicate shingle
    * occurrences need no pre-distinct: min is duplicate-insensitive.
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val toks = split(graft.text.TextOps.lowerSimple(col("text")), " ")
    val sigCols = (0 until NumHashes).map(i => element_at(col("__sig"), i + 1).as(s"s$i"))
    graft.Tables.widen(docs)
      .select(col("doc_id"), toks.as("__toks"))
      .where(size(col("__toks")) >= ShingleSize)
      .select(col("doc_id"), minhashCol(col("__toks")).as("__sig"))
      .select(col("doc_id") +: sigCols: _*)
  }

  /** LSH candidate near-dup pairs: band the signature, bucket by (band, key),
    * and explode each bucket's member list into ordered pairs. `stack` emits
    * all 8 band rows in one pass, and the bucket-grouping formulation
    * computes the signature aggregate ONCE (a band self-join would recompute
    * the whole upstream per join side). Bucket member lists are small by
    * construction (LSH spreads non-dups), so the per-bucket pair explosion is
    * bounded; at 100 TB add a bucket-size cap before exploding.
    */
  /** (doc_id, band, key) rows of a signature table — ONE definition of the
    * band layout, shared by the batch and incremental pair generators (a
    * divergence between them would silently break the
    * `previous ∪ incremental = full` contract).
    */
  private def bandedKeys(sig: DataFrame): DataFrame = {
    val stackArgs = (0 until NumBands)
      .map { j =>
        val ks = (0 until BandRows).map(r => s"s${j * BandRows + r}").mkString(", ")
        s"$j, concat_ws(':', $ks)"
      }
      .mkString(", ")
    sig.selectExpr("doc_id", s"stack($NumBands, $stackArgs) AS (band, key)")
  }

  def minhashCandidatePairs(docs: DataFrame): DataFrame = {
    val bands = bandedKeys(minhashSignatures(docs))
    bands
      .groupBy(col("band"), col("key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .where(col("doc_a") < col("doc_b"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** Incremental LSH candidate pairs: dedup a NEW slice against the stored
    * signature history without re-finding history-vs-history pairs (those
    * were emitted by earlier runs). This is the daily-ingest shape at
    * 100 TB: signatures are per-row ([[minhashSignatures]]) and thus
    * trivially incremental — persist them once per slice, then each run
    * bands only `newSigs` against `history ∪ new` and keeps pairs with at
    * least one new member. Work scales with |new| × bucket occupancy, never
    * with |history|²; the history side is touched only through the band
    * join.
    *
    * Contract (spec-asserted): `previousPairs ∪ incremental = full-batch
    * pairs over history ∪ new`.
    *
    * @param historySigs stored signature table (doc_id, s0..s31) — the
    *   output schema of [[minhashSignatures]]
    * @param newSigs the new slice's signatures, same schema
    */
  def incrementalMinhashPairs(historySigs: DataFrame, newSigs: DataFrame): DataFrame = {
    val newBands = bandedKeys(newSigs)
    val allBands = bandedKeys(historySigs.unionByName(newSigs))
    newBands
      .select(col("band"), col("key"), col("doc_id").as("new_doc"))
      .join(allBands, Seq("band", "key"))
      .where(col("doc_id") =!= col("new_doc"))
      .select(
        least(col("doc_id"), col("new_doc")).as("doc_a"),
        greatest(col("doc_id"), col("new_doc")).as("doc_b")
      )
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** The CTE chain computing minhash LSH candidate pairs, shared by the
    * pairs oracle and the clusters oracle (which embeds it under WITH
    * RECURSIVE).
    */
  private def oracleMinhashPairsCtes: String = {
    val sigCols = hashCoeffs.zipWithIndex
      .map { case ((a, b), i) => s"min(($a*x + $b) % $HashPrime) AS s$i" }
      .mkString(", ")
    val bands = (0 until NumBands)
      .map { j =>
        val ks = (0 until BandRows).map(r => s"s${j * BandRows + r}").mkString(", ")
        s"SELECT doc_id, $j AS band, concat_ws(':', $ks) AS key FROM sig"
      }
      .mkString("\nUNION ALL\n")
    s"""$oracleShingleCte,
       |hx AS (SELECT doc_id, CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) AS x FROM sh),
       |sig AS (SELECT doc_id, $sigCols FROM hx GROUP BY doc_id),
       |bands AS ($bands),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin
  }

  def oracleMinhashCandidatePairs: String =
    s"""WITH $oracleMinhashPairsCtes
       |SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""".stripMargin

  /** DuckDB twin of the declared incremental run: the full pair set
    * restricted to pairs touching the new slice (doc_id ≥ splitAt) — exactly
    * what [[incrementalMinhashPairs]] must produce when history is the
    * docs below the split.
    */
  def oracleIncrementalMinhashPairs(splitAt: Long): String =
    s"""WITH $oracleMinhashPairsCtes
       |SELECT doc_a, doc_b FROM pairs
       |WHERE doc_a >= $splitAt OR doc_b >= $splitAt
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Edit-distance verification of the LSH candidate pairs — the exact-ish
    * confirmation tier a near-dup pipeline runs AFTER banding (MinHash says
    * "probably similar"; Levenshtein on a bounded prefix says how similar,
    * in characters). Distance is computed on the first `prefixLen` chars of
    * each side: Levenshtein is O(len²) per pair, so the scale contract is
    * that per-pair cost is a CONSTANT (prefixLen²), never corpus-dependent —
    * the same bounding trick production near-dup verifiers use. Candidate
    * volume is the banded pair set (bucketed join, never all-pairs), and the
    * two text lookups are hash joins on the doc-id key.
    *
    * Both engines implement textbook Wagner–Fischer over unicode codepoints;
    * the corpus is ASCII, so the distances agree exactly.
    */
  def editDistancePairs(docs: DataFrame, prefixLen: Int = 200): DataFrame = {
    val texts = graft.Tables.widen(docs)
      .select(col("doc_id"), substring(col("text"), 1, prefixLen).as("prefix"))
    minhashCandidatePairs(docs)
      .join(texts.select(col("doc_id").as("doc_a"), col("prefix").as("pa")), Seq("doc_a"))
      .join(texts.select(col("doc_id").as("doc_b"), col("prefix").as("pb")), Seq("doc_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        levenshtein(col("pa"), col("pb")).cast("long").as("edit_dist")
      )
      .orderBy("doc_a", "doc_b")
  }

  /** DuckDB twin of [[editDistancePairs]]: the shared pairs CTE chain plus
    * two doc-id joins and `levenshtein` over the same prefixes.
    */
  def oracleEditDistancePairs(prefixLen: Int = 200): String =
    s"""WITH $oracleMinhashPairsCtes
       |SELECT p.doc_a, p.doc_b,
       |  CAST(levenshtein(substr(a.text, 1, $prefixLen), substr(b.text, 1, $prefixLen)) AS BIGINT) AS edit_dist
       |FROM pairs p
       |JOIN documents a ON a.doc_id = p.doc_a
       |JOIN documents b ON b.doc_id = p.doc_b
       |ORDER BY p.doc_a, p.doc_b""".stripMargin

  /** The full CTE chain from documents to a `cl(doc_id, cluster_id)`
    * relation (min-reachable-label connected components over the minhash
    * candidate pairs; UNION dedups the recursive frontier, so the fixpoint
    * terminates). Must be placed under `WITH RECURSIVE`. Shared by the
    * clusters oracle and the curation-composition oracle.
    */
  private[graft] def oracleClusterCtes: String =
    s"""$oracleMinhashPairsCtes,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |reach(id, lab) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
       |cl AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id)""".stripMargin

  /** DuckDB twin of [[DedupClusters.dedupClusters]]. Every doc appears;
    * singletons label themselves.
    */
  def oracleDedupClusters: String =
    s"""WITH RECURSIVE $oracleClusterCtes
       |SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""".stripMargin

  /** Cluster-size histogram over the CC labels — the dedup REPORT a corpus
    * release reads (how much of the corpus sits in dup clusters of which
    * size; singletons = unique docs). Two nested tiny aggregates off the
    * cached label table: the first carries |clusters| rows, the second
    * |distinct sizes| — nothing here rescans documents or reruns the
    * fixpoint.
    */
  def clusterSizes(labels: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    labels
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
      .orderBy("cluster_size")

  /** DuckDB twin of [[clusterSizes]], nesting the recursive cluster CTEs. */
  def oracleClusterSizes: String =
    s"""WITH RECURSIVE $oracleClusterCtes,
       |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM cl GROUP BY cluster_id)
       |SELECT cluster_size, count(*) AS n_clusters,
       |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs
       |FROM sizes GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  /** Cross-source duplication matrix off the CC labels — WHERE the dup
    * pressure comes from: for every source pair (including the diagonal),
    * the number of same-cluster doc pairs drawn one from each source. The
    * mirror-site / re-crawl diagnostic a corpus release reads next to
    * [[clusterSizes]].
    *
    * Counted in closed form, never by enumerating pairs: per (cluster,
    * source) counts first (one small join + aggregate off the cached label
    * table), then Σ over clusters of n_a·n_b (a<b) resp. n·(n−1)/2 on the
    * diagonal — the join input is |clusters|·|sources| rows, so the pair
    * count is exact at any scale without a pair exchange.
    */
  def crossSourceDups(labels: org.apache.spark.sql.DataFrame, docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val perSource = labels
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("cluster_id"), col("source"))
      .agg(count(lit(1)).as("n"))
    val a = perSource
      .select(col("cluster_id"), col("source").as("source_a"), col("n").as("na"))
    val b = perSource
      .select(col("cluster_id"), col("source").as("source_b"), col("n").as("nb"))
    a.join(b, "cluster_id")
      .where(col("source_a") <= col("source_b"))
      .select(
        col("source_a"), col("source_b"),
        when(col("source_a") === col("source_b"), expr("na * (na - 1) div 2"))
          .otherwise(col("na") * col("nb")).as("pairs")
      )
      .groupBy("source_a", "source_b")
      .agg(sum(col("pairs")).as("n_dup_pairs"))
      .where(col("n_dup_pairs") > 0)
      .orderBy("source_a", "source_b")
  }

  /** DuckDB twin of [[crossSourceDups]], nesting the recursive cluster CTEs. */
  def oracleCrossSourceDups: String =
    s"""WITH RECURSIVE $oracleClusterCtes,
       |src AS (
       |  SELECT cluster_id, source, count(*) AS n
       |  FROM cl JOIN documents USING (doc_id)
       |  GROUP BY cluster_id, source)
       |SELECT a.source AS source_a, b.source AS source_b,
       |  CAST(sum(CASE WHEN a.source = b.source THEN a.n * (a.n - 1) // 2
       |                ELSE a.n * b.n END) AS BIGINT) AS n_dup_pairs
       |FROM src a JOIN src b ON a.cluster_id = b.cluster_id AND a.source <= b.source
       |GROUP BY source_a, source_b
       |HAVING sum(CASE WHEN a.source = b.source THEN a.n * (a.n - 1) // 2
       |           ELSE a.n * b.n END) > 0
       |ORDER BY source_a, source_b""".stripMargin

  // --- tier 3: SimHash ------------------------------------------------------

  /** 32-bit SimHash per document, computed entirely per-row by the native
    * [[SimHash32]] kernel (a compiled token-hash + bit-count loop; the old
    * nested interpreted `aggregate(sequence(0,31), … aggregate(ths, …))`
    * walked an expression tree 32 × |tokens| times per doc) — zero shuffle,
    * embarrassingly parallel at any scale. Bit j is 1 iff the sum over token
    * occurrences of ±1 (per token-hash bit j) is positive.
    */
  def simhash(docs: DataFrame): DataFrame =
    graft.Tables.widen(docs)
      .select(col("doc_id"), expr(s"filter(split(${graft.text.TextOps.LowerTextSql}, ' '), t -> t != '')").as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), simhashCol(col("toks")).as("simhash"))
      .orderBy("doc_id")

  def oracleSimhash: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), t -> t != '')) AS t
      |  FROM documents),
      |th AS (SELECT doc_id, CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) AS x FROM toks),
      |w AS (
      |  SELECT doc_id, j, sum(CASE WHEN (x // CAST(pow(2, j) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS wj
      |  FROM th CROSS JOIN (SELECT unnest(range(0, 32)) AS j)
      |  GROUP BY doc_id, j)
      |SELECT doc_id,
      |  CAST(sum(CASE WHEN wj > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
      |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Disjoint bit-bands covering all 32 signature bits, one more band than
    * the hamming radius: ≤ maxHamming flipped bits touch at most maxHamming
    * of the maxHamming+1 bands, so every qualifying pair shares at least one
    * band EXACTLY (the pigeonhole that makes the bucketed join complete at
    * any radius; the r2 formulation hard-coded 4 byte-bands, which silently
    * loses pairs for maxHamming ≥ 4). Returns (bitOffset, bitWidth) per band;
    * at the declared maxHamming=3 this is exactly the four 8-bit bytes.
    */
  def simhashBandLayout(maxHamming: Int): Seq[(Int, Int)] = {
    require(maxHamming >= 0 && maxHamming < 32, s"maxHamming must be in [0, 32) (got $maxHamming)")
    val bands = maxHamming + 1
    val width = 32 / bands
    val rem   = 32 % bands // first `rem` bands are one bit wider
    (0 until bands).scanLeft((0, 0)) { case ((off, w), k) =>
      (off + w, if (k < rem) width + 1 else width)
    }.tail
  }

  /** SimHash near-dup pairs: hamming(simhash) ≤ maxHamming, found WITHOUT an
    * all-pairs scan via the band pigeonhole (see [[simhashBandLayout]]) —
    * banding on (band index, band value) and exploding bucket pairs reaches
    * every qualifying pair, then the exact hamming filter prunes the rest.
    * Same bucketed-pair shape as the MinHash tier. Wider radii mean narrower
    * bands and denser buckets — the recall/cost dial.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig    = simhash(docs)
    val layout = simhashBandLayout(maxHamming)
    val bandArgs = layout.zipWithIndex
      .map { case ((off, w), k) => s"$k, (simhash >> $off) & ${(1L << w) - 1}" }
      .mkString(", ")
    val bands = sig.selectExpr(
      "doc_id",
      "simhash",
      s"stack(${layout.size}, $bandArgs) AS (band, byteval)"
    )
    bands
      .groupBy(col("band"), col("byteval"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("members"))
      .where(size(col("members")) > 1)
      .select(explode(col("members")).as("a"), col("members"))
      .select(col("a"), explode(col("members")).as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("long").as("hamming")
      )
      .where(col("hamming") <= maxHamming)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  def oracleSimhashPairs(maxHamming: Int = 3): String = {
    val simCte = oracleSimhash.replace("ORDER BY doc_id", "")
    val bands = simhashBandLayout(maxHamming).zipWithIndex
      .map { case ((off, w), k) =>
        s"SELECT doc_id, simhash, $k AS band, (simhash >> $off) & ${(1L << w) - 1} AS byteval FROM sig"
      }
      .mkString("\nUNION ALL\n")
    s"""WITH sig AS ($simCte),
       |bands AS ($bands)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.byteval = b.byteval AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // --- tier 4: exact n-gram Jaccard ----------------------------------------

  /** Exact 3-shingle Jaccard over pairs sharing at least one shingle
    * (inverted-index join — never |docs|²), thresholded. Intersection by
    * count, union by |A|+|B|−|A∩B|; the division is exact-int → IEEE double,
    * bit-identical across engines.
    *
    * @param maxShingleDf optional document-frequency cap: shingles appearing
    *   in more than this many docs are dropped before the pair join (the
    *   100 TB hot-key guard — one boilerplate phrase in 10⁶ docs makes the
    *   posting-list pair explosion quadratic in that posting). BOTH settings
    *   are declared queries since r5: `jaccard_pairs_documents` uncapped
    *   (exact semantics) and `jaccard_capped_documents` with a cap chosen
    *   where the sf0.01 df distribution makes the filter bite, so the guard
    *   itself is hash-checked.
    */
  def jaccardPairs(
      docs: DataFrame,
      threshold: Double = 0.5,
      maxShingleDf: Option[Int] = None
  ): DataFrame =
    jaccardPairsFromPostings(shinglePostings(docs), threshold, maxShingleDf)

  /** Deduplicated shingle posting lists — the ONE expensive exchange every
    * Jaccard-tier query derives from. Exposed so a caller running several
    * configurations of [[jaccardPairsFromPostings]] over the same corpus
    * (e.g. the capped and uncapped declared twins, or a threshold sweep) can
    * persist this frame once and share the shuffle instead of re-scanning
    * and re-aggregating the shingle stream per query (VERDICT r5 ask #3 —
    * at 100 TB the shingle exchange dominates; the per-configuration work
    * downstream of it is posting-local).
    */
  def shinglePostings(docs: DataFrame): DataFrame =
    shingleDF(docs)
      .groupBy(col("shingle"))
      .agg(collect_set(col("doc_id")).as("ids"))

  /** The pair/score stage of [[jaccardPairs]], parameterized over a postings
    * frame built by [[shinglePostings]] (possibly persisted by the caller).
    */
  def jaccardPairsFromPostings(
      postings0: DataFrame,
      threshold: Double = 0.5,
      maxShingleDf: Option[Int] = None
  ): DataFrame = {
    // inverted-index pair generation: one exchange builds deduplicated
    // posting lists (collect_set — no standalone distinct needed); ordered
    // pairs explode per bucket. Doc set-sizes derive from the SAME posting
    // aggregate (membership count), so the expensive shingle exchange is
    // shared (ReuseExchange — or a caller-side persist via
    // [[shinglePostings]]) rather than recomputed for a separate per-doc
    // aggregation. The df-cap filters the posting lists themselves, keeping
    // capped sizes and capped intersections consistent.
    // collect_set order is nondeterministic but irrelevant: pairs are ordered
    // by the a<b filter and aggregated by key, sizes are counts — no
    // sort_array needed (saves a per-posting sort)
    val postings = maxShingleDf match {
      case Some(cap) => postings0.where(size(col("ids")) <= cap)
      case None      => postings0
    }
    val sizes = postings
      .select(explode(col("ids")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"))
    val inter = postings
      .where(size(col("ids")) > 1)
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(
        col("doc_a"),
        col("doc_b"),
        (col("i").cast("double") / (col("sa.n") + col("sb.n") - col("i"))).as("jaccard")
      )
      .where(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** Per-document duplicated-shingle density — the doc-level signal of the
    * exact-substring dedup family (the published "what fraction of this
    * document's n-grams appear elsewhere in the corpus" score that drives
    * span-level dedup decisions): for each doc, its distinct-shingle count,
    * how many of those shingles occur in ≥1 OTHER document, and the ratio.
    *
    * Derives from the SAME persisted [[shinglePostings]] exchange as both
    * Jaccard twins — a third consumer of the one expensive aggregate. The
    * per-doc rollup is a map-side-combinable groupBy on doc_id; posting-list
    * width never matters because only `size(ids)` crosses the explode.
    *
    * 100 TB note: this uses the UNCAPPED postings (declared semantics need
    * every shingle's true df), sharing the hot-shingle posting-row caveat of
    * the uncapped Jaccard twin. The exact-with-cap deployment trick: a
    * shingle with df > cap is duplicated BY DEFINITION, so a capped postings
    * frame that keeps (shingle, df>cap) flags instead of full hot lists
    * yields the identical n_dup/n_shingles counts with bounded rows — the
    * flag contributes `dup=1` per (doc, hot shingle) occurrence without ever
    * materializing the list.
    */
  def dupShingleStats(postings: DataFrame): DataFrame =
    postings
      .select(explode(col("ids")).as("doc_id"), (size(col("ids")) > 1).cast("long").as("dup"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), sum(col("dup")).as("n_dup_shingles"))
      .select(
        col("doc_id"),
        col("n_shingles"),
        col("n_dup_shingles"),
        round(col("n_dup_shingles").cast("double") / col("n_shingles"), 6).as("dup_ratio")
      )
      .orderBy("doc_id")

  /** DuckDB twin of [[dupShingleStats]]: shingle document frequency over the
    * distinct (doc, shingle) relation, rolled up per doc. Docs shorter than
    * one shingle drop out on both sides.
    */
  def oracleDupShingleStats: String =
    s"""WITH $oracleShingleCte,
       |df AS (SELECT s, count(*) AS c FROM sh GROUP BY s)
       |SELECT sh.doc_id, count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN df.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_shingles,
       |  round(CAST(sum(CASE WHEN df.c > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS dup_ratio
       |FROM sh JOIN df ON sh.s = df.s
       |GROUP BY sh.doc_id ORDER BY doc_id""".stripMargin

  /** Banding quality report — precision/recall of the MinHash-LSH candidate
    * pairs against the exact-Jaccard ground truth at `threshold`, the number
    * a pipeline owner reads before trusting the banded tier at full scale
    * (the ANN-side twin is [[graft.similarity.SimilarityOps.ivfRecall]]).
    * One row: |truth|, |candidates|, |hits|, recall = hits/truth (what the
    * bands missed), precision = hits/candidates (how much exact-verify work
    * the bands force downstream).
    *
    * Scale shape: both pair sets come from their existing bucketed
    * generators (inverted-index join and band join — never |docs|²); the
    * hit count is an equi-join on (doc_a, doc_b); the three totals are
    * 1-row aggregates crossJoined broadcast-style (the repo's bounded
    * crossJoin convention). Counts are exact longs; ratios are rounded
    * quotients of exact longs.
    */
  def minhashRecall(
      docs: DataFrame,
      threshold: Double = 0.5,
      postings: Option[DataFrame] = None
  ): DataFrame = {
    // the exact-Jaccard truth tier derives from a caller-shared postings
    // frame when one exists (r19 — the jaccard-twin pattern, VERDICT r5 #3:
    // the shingle exchange is the dominant stage and identical across the
    // Jaccard-tier queries; recomputing it per query measured ~1 s of pure
    // duplicate work per bench pass)
    val truth = postings.map(jaccardPairsFromPostings(_, threshold))
      .getOrElse(jaccardPairs(docs, threshold))
      .select(col("doc_a"), col("doc_b"))
    val cand = minhashCandidatePairs(docs).select(col("doc_a"), col("doc_b"))
    // ONE full-outer join + ONE aggregate produce all three counts (r19):
    // the former three separate aggregates referenced `truth` and `cand`
    // twice each, and Spark executes duplicated subtrees independently — the
    // whole shingle/signature pipeline ran twice per side. Pair keys are
    // unique on both sides (groupBy/distinct outputs), so full-outer rows
    // are 1:1 and the counts are identical by construction.
    val joined = truth.withColumn("t", lit(1))
      .join(cand.withColumn("c", lit(1)), Seq("doc_a", "doc_b"), "full_outer")
    joined
      .agg(
        count(col("t")).as("n_truth"),
        count(col("c")).as("n_cand"),
        count(when(col("t").isNotNull && col("c").isNotNull, lit(1))).as("n_hit"))
      .select(
        col("n_truth"),
        col("n_cand"),
        col("n_hit"),
        // empty truth/candidate sets (degenerate corpus) → NULL ratio on
        // both engines, not an ANSI divide-by-zero / NaN divergence
        when(col("n_truth") > 0,
          round(col("n_hit").cast("double") / col("n_truth"), 6)).as("recall_r"),
        when(col("n_cand") > 0,
          round(col("n_hit").cast("double") / col("n_cand"), 6)).as("precision_r")
      )
  }

  /** DuckDB twin of [[minhashRecall]]: the minhash pair CTEs and the exact
    * Jaccard chain share ONE shingle CTE (`sh`), then the same counts.
    */
  def oracleMinhashRecall(threshold: Double = 0.5): String =
    s"""WITH $oracleMinhashPairsCtes,
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
       |    FROM inter
       |    JOIN sizes sa ON sa.doc_id = doc_a
       |    JOIN sizes sb ON sb.doc_id = doc_b)
       |  WHERE jaccard >= $threshold),
       |hit AS (
       |  SELECT count(*) AS n_hit FROM truth t
       |  JOIN pairs p ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b)
       |SELECT
       |  CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
       |  CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_cand,
       |  CAST(n_hit AS BIGINT) AS n_hit,
       |  CASE WHEN (SELECT count(*) FROM truth) > 0
       |       THEN round(CAST(n_hit AS DOUBLE) / (SELECT count(*) FROM truth), 6) END AS recall_r,
       |  CASE WHEN (SELECT count(*) FROM pairs) > 0
       |       THEN round(CAST(n_hit AS DOUBLE) / (SELECT count(*) FROM pairs), 6) END AS precision_r
       |FROM hit""".stripMargin

  def oracleJaccardPairs(threshold: Double = 0.5): String =
    s"""WITH $oracleShingleCte,
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
       |  FROM inter
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b)
       |WHERE jaccard >= $threshold ORDER BY doc_a, doc_b""".stripMargin

  /** DuckDB twin of the CAPPED declared form — identical hot-shingle filter
    * to the Spark side: document frequency measured on the distinct postings,
    * shingles with df > cap dropped BEFORE both the per-doc set sizes and the
    * pair intersections (so capped sizes and capped intersections stay
    * consistent, exactly as `jaccardPairs` filters the posting lists
    * themselves). Mirrors [[Contamination.oracleContaminatedPairsCapped]].
    */
  def oracleJaccardPairsCapped(threshold: Double = 0.5, maxShingleDf: Int = 2): String =
    s"""WITH $oracleShingleCte,
       |cold AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $maxShingleDf),
       |shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN cold ON sh.s = cold.s),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
       |  FROM inter
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b)
       |WHERE jaccard >= $threshold ORDER BY doc_a, doc_b""".stripMargin
}
