package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators over `documents`:
  *  - d01: exact dedup (two-level hash aggregation on raw + normalized text),
  *  - d02: n-gram Jaccard near-dup via a shingle inverted-index join,
  *  - d03: MinHash + LSH banding (64 perms via the compiled map-side
  *    MinHash64 kernel, 32 bands × 2 rows) with exact Jaccard
  *    verification of band-bucket candidates only,
  *  - d04: SimHash (60-bit TF signature via the compiled SimHash60
  *    kernel, 4×15-bit banding, hamming ≤ 1),
  *  - d05: blocked edit-distance (record-linkage blocking keys bound the
  *    O(len²) Levenshtein pairs).
  *
  * All hashing is deterministic int64 arithmetic (polynomial rolling hash
  * mod 1e9+7; affine permutations (2j+1)·h + j mod p), so outputs are a
  * pure function of the data — the DuckDB oracles mirror them exactly.
  *
  * Scale (100 TB): the shingle index is the classic inverted-index
  * candidate-pair pattern — it shuffles on the shingle key, so hot shingles
  * skew; [[pairStats]] drops stop-shingles (df > [[StopShingleDf]]) from
  * the index before pair generation, bounding every posting's pair fan-out,
  * and verifies candidates on full shingle sets. LSH banding (d03) and SimHash
  * banding (d04) are the scale paths: candidates come from equality joins
  * on short band keys instead of the full inverted index, bounding pair
  * fan-out; d05's block keys bound the expensive metric the same way.
  */
object Dedup {

  private def dbl(c: Column): Column = c.cast(DoubleType)

  /** (doc_id, arr = distinct word-3-gram shingle array) per doc, computed
    * NARROWLY — shingling is per-row work, so it stays map-side; every
    * consumer (inverted-index join, per-doc sizes, minhash sketches, exact
    * verification sets) derives from this one checkpointed frame with no
    * extra shuffle. */
  private[ops] def shingleArrays(s: SparkSession, dir: String): DataFrame =
    // lazy: materializes inside the first consumer's job (no separate
    // up-front checkpoint job) and is block-reused by every later one
    shinglesOfDocs(Tables.t(s, dir, "documents")).localCheckpoint(eager = false)

  /** The narrow shingling projection over any (doc_id, text) frame. */
  private[graft] def shinglesOfDocs(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      // fused tokenize+shingle kernel: one compiled pass over the text
      // bytes, no regex split, no word-array materialization. Docs with
      // <3 words yield an empty array (DuckDB's empty generate_series
      // analog); the filter keeps those rows out of the checkpoint.
      .select($"doc_id",
        graft.functions.ShingleKernels.shinglesText($"text", 3).as("arr"))
      .filter(size($"arr") > 0)
  }

  /** [[shingleArrays]] with HASHED keys — (doc_id, arr = distinct
    * xxhash64-of-shingle longs) — for the pair-stat consumers that never
    * look at the gram text (d02/d09/d15, the g01-g03 edge sets): the
    * shingle key exists only to group co-occurrences, so an 8-byte long
    * serves, the posting-list exchange shrinks ~3× and the map side
    * allocates no gram strings at all (the kernel hashes byte slices in
    * place). Measured at the 40×-docs stress: see the A/B note at
    * [[allPostings]]. Consumers that DO need gram text (d03/d12/d21
    * minhash sketches, d28's shingle output column) stay on
    * [[shingleArrays]]. Distinct-by-hash vs distinct-by-string: collision
    * odds ~n²/2⁶⁵ (bit-exactness verified against the string-keyed
    * DuckDB oracle at every tested SF). */
  private[ops] def shingleHashArrays(s: SparkSession, dir: String): DataFrame =
    hashedShinglesOfDocs(Tables.t(s, dir, "documents"))
      .localCheckpoint(eager = false)

  /** The narrow hashed-shingling projection over any (doc_id, text)
    * frame. */
  private[graft] def hashedShinglesOfDocs(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"doc_id",
        graft.functions.ShingleKernels.shingleHashesText($"text", 3).as("arr"))
      .filter(size($"arr") > 0)
  }

  /** Stop-shingle document-frequency cut for the inverted-index pair
    * generators: a shingle occurring in more than this many documents is
    * dropped from the shingle space entirely — index AND set sizes —
    * BEFORE pair generation, so similarity is computed over the remaining
    * informative shingles. In posting-list form the cut is a free size
    * filter on the aggregated index (df = posting length), and it bounds
    * every posting's pair fan-out at τ² —
    * without it one boilerplate shingle in 10⁶ docs makes 10¹² join rows
    * and the shuffle never finishes at 100 TB. This is the standard
    * production trade (boilerplate shingles carry no dedup signal); when
    * no shingle is hot — as at the tested scale factors — the pruned
    * space IS the full space and results are bit-identical to the uncut
    * plan. Mirrored verbatim in the DuckDB oracles. */
  private[ops] val StopShingleDf = 1000

  /** Surviving (complete) posting lists only — df ≤ τ. One shuffle on
    * the shingle key builds the index, and df == size(posting), so the
    * stop-shingle cut collapses to a plain size filter — the previous
    * shape (df pre-count shuffle + broadcast anti-join + two-sided
    * SHUFFLE_HASH self-join) paid a full extra pass over the index just
    * to learn which shingles were hot. */
  private[ops] def postings(docsArr: DataFrame, tau: Long): DataFrame =
    allPostings(docsArr, tau).filter(size(col("ds")) <= lit(tau)).select(col("ds"))

  /** The posting-list index: (shingle, doc_id array) via the
    * [[graft.functions.CappedCollect]] aggregate with cap τ+1, so the
    * per-group buffer is HARD-BOUNDED even for the boilerplate shingle
    * the stop-shingle cut exists to absorb (a plain collect_list would
    * buffer one id per posting — multi-GB for a shingle in 10⁶⁺ docs —
    * and OOM exactly on that skew). A group that fits (df ≤ τ) never
    * hits the cap, so its list is complete; a hot group saturates at τ+1
    * ids, enough for consumers to DETECT hotness (size > τ) without an
    * exact df. Index keys: callers choose string shingles
    * ([[shingleArrays]] — needed where the gram text surfaces: d21/d28,
    * the minhash sketches) or hashed int64 keys ([[shingleHashArrays]] —
    * every pure pair-identity consumer). The round-15 40×-docs A/B
    * settled the trade the earlier string-keyed note had left open:
    * hashed keys took d02 102.8 s → 53.4 s and g01 63.4 s → 41.4 s
    * (back-to-back, scale conf), because the fused hash kernel is
    * CHEAPER per row than building gram strings (no allocation) on top
    * of the 3× smaller exchange. At bench SF the two forms measure the
    * same (stage-bound); the crossover is wherever the posting exchange
    * stops being noise. */
  private[ops] def allPostings(docsArr: DataFrame, tau: Long): DataFrame = {
    require(tau >= 0 && tau < Int.MaxValue, s"tau out of cap range: $tau")
    val s = docsArr.sparkSession
    import s.implicits._
    docsArr.select($"doc_id", explode($"arr").as("s"))
      .groupBy($"s")
      .agg(graft.functions.CappedCollect($"doc_id", (tau + 1).toInt).as("ds"))
  }

  /** (da, db, i, na, nb) — shingle-set intersection and sizes over the
    * τ-pruned shingle space (see [[StopShingleDf]]), for every pair
    * sharing ≥1 surviving shingle. The shared kernel of d02/d07/d09 and
    * the g01–g03 edge sets: the aggregated posting lists generate each
    * co-occurring pair narrowly and a map-side-combining groupBy counts
    * them into intersections — no candidate materialization, no per-pair
    * set operations, no second shuffle of the index. */
  /** Pre-checkpoint pair-count build: posting lists explode narrowly into
    * co-occurring (da ≤ db) pairs and ONE hash aggregation counts them —
    * diagonal rows included (they carry the pruned set sizes, see
    * [[pairStats]]). Exposed for the plan audit.
    *
    * `crossParityOnly`: restrict off-diagonal pairs to mixed doc_id
    * parity AT GENERATION (the filter runs map-side, inside the
    * explode) — for the history-vs-batch probe shape (d26) where
    * same-parity pairs are discarded downstream anyway, this halves
    * both the pair shuffle and the aggregation key space. Diagonal
    * rows always survive (they carry the sizes). */
  private[graft] def pairCounts(docsArr: DataFrame, tau: Long,
      crossParityOnly: Boolean = false): DataFrame = {
    val s = docsArr.sparkSession
    import s.implicits._
    // Packed-key pair generation (round 16): the SortedPairsPacked
    // kernel emits each posting's C(n,2) upper-triangle pairs PLUS the
    // n diagonal keys as primitive longs `(da << 32) | db` in one
    // compiled pass — replacing the double explode that generated n²
    // rows and filtered half of them away, and halving the aggregation
    // key bytes (the r15 wedge lesson, GraphOps.packPair: one hash, one
    // long, primitive spill sort). sort_array makes basket order = key
    // order so the packed pair identity matches the old (da ≤ db) form
    // bit-exactly; the kernel rejects keys ≥ 2^31 LOUDLY (a 2B-doc
    // catalog must flip to the two-column form, never silently merge).
    // Measured (docs10x, settled, single-run): d02 10.3 s → 8.6 s.
    // parity test on the packed halves: bit 32 is da's low bit, bit 0
    // db's; diagonal (da = db) always survives — it carries the sizes
    val keep =
      if (crossParityOnly)
        shiftright($"p", 32).bitwiseAND(lit(1L)) =!=
          $"p".bitwiseAND(lit(1L)) ||
          shiftright($"p", 32) === $"p".bitwiseAND(lit(0xffffffffL))
      else lit(true)
    postings(docsArr, tau)
      .select(explode(graft.functions.PairKernels
        .sortedPairsPacked(sort_array($"ds"), withDiagonal = true)).as("p"))
      .filter(keep)
      .groupBy($"p")
      .agg(count(lit(1)).as("i"))
      .select(shiftright($"p", 32).as("da"),
        $"p".bitwiseAND(lit(0xffffffffL)).as("db"), $"i")
  }

  private[graft] def pairStats(docsArr: DataFrame,
      tau: Long = StopShingleDf,
      crossParityOnly: Boolean = false): DataFrame = {
    val s = docsArr.sparkSession
    import s.implicits._
    // ONE aggregation carries both intersections AND pruned set sizes:
    // the pair generator keeps the DIAGONAL (da = db), so the (d, d)
    // count is exactly d's surviving-shingle count — the separate
    // per-doc sizes pass (a second full explode + exchange of the
    // posting index, plus the postings checkpoint that fed it twice)
    // folds into the pair exchange it was always co-shuffled with.
    // Everything stays bounded — no broadcast of any data-dependent
    // frame, no driver-side structure (a hot-shingle-key broadcast
    // variant measured the same at bench scale but its key set grows as
    // |postings|/τ, corpus-proportional — not broadcast-safe).
    val grouped = pairCounts(docsArr, tau, crossParityOnly)
      // consumed twice (pairs + diagonal); lazy so it materializes
      // inside the first consumer's job — far smaller than the posting
      // index the previous shape checkpointed
      .localCheckpoint(eager = false)
    val sizes = grouped.filter($"da" === $"db")
      .select($"da".as("doc_id"), $"i".as("n"))
    grouped.filter($"da" < $"db")
      .join(sizes.as("sa"), $"da" === col("sa.doc_id"))
      .join(sizes.as("sb"), $"db" === col("sb.doc_id"))
      .select($"da", $"db", $"i",
        col("sa.n").as("na"), col("sb.n").as("nb"))
  }

  /** (da, db, jaccard) for candidate pairs (see [[pairStats]]), jaccard ≥
    * minJ. Package-visible: GraphOps builds its component graph on these
    * edges. */
  private[ops] def jaccardPairs(s: SparkSession, dir: String, minJ: Double): DataFrame =
    // hashed shingle keys: every consumer of this entry (d02, the whole
    // g-family edge set, d07/d16/d24/d26/d28-qualifying...) reads pair
    // ids and Jaccard only — the gram text never surfaces
    jaccardPairsOf(shingleHashArrays(s, dir), minJ)

  /** [[jaccardPairs]] over a caller-supplied (doc_id, arr) frame — for
    * queries that already hold a pinned shingle frame (d26 derives md5
    * digests and shingles from ONE scan) and must not re-derive it. */
  private[ops] def jaccardPairsOf(docsArr: DataFrame, minJ: Double,
      crossParityOnly: Boolean = false): DataFrame = {
    val s = docsArr.sparkSession
    import s.implicits._
    pairStats(docsArr, crossParityOnly = crossParityOnly)
      .withColumn("jac", dbl($"i") / ($"na" + $"nb" - $"i"))
      .filter($"jac" >= minJ)
      .select($"da", $"db", round($"jac", 6).as("jaccard"))
  }

  // ---------------------------------------------------------------- d01
  /** Exact dedup stats per source as ONE multi-distinct aggregation over
    * 16-byte digests. The dedup key is md5(text) so the exchange never
    * carries document payloads: grouping by raw `text` would shuffle
    * every distinct document's full body (the round-5 regression).
    * 128-bit md5 (not a 64-bit hash) because at the 100 TB design point
    * (~10¹⁰ docs) a 64-bit key is past its birthday bound; at 128 bits
    * collision odds are ~10⁻¹⁸, so COUNT(DISTINCT md5(text)) =
    * COUNT(DISTINCT text) and the oracle stays exact.
    *
    * Round 17 shape change (guide §2.3/§2.4): the previous two-level form
    * — groupBy(source, h).agg(count, min(hn)) then groupBy(source) — put
    * a STRING (hn) in the first-level aggregation buffer, and a string
    * buffer disqualifies HashAggregate: the whole corpus was SORTED by
    * (source, h) on both sides of the exchange (SortAggregate ×2,
    * plans/r17/d01_exact_dedup_before.txt). The multi-distinct form
    * Expands each digest row ×3 (gid branches for h / hn / plain count),
    * but every aggregate buffer is a long, so the whole plan is
    * map-side-combining HashAggregates — no corpus sort anywhere — and
    * one exchange fewer (4 → 3; plans/r17/d01_exact_dedup_after.txt).
    * Digests, not payloads, ride the Expand, and the partial aggregate
    * dedups each branch map-side before its exchange.
    *
    * Measured honestly (docs10x, one settled window, alternating A/B):
    * warm min-of-3 is FLAT — 0.954 s (new) vs 0.958 s (old) vs DuckDB
    * 0.32 s; single-run-with-codegen also flat (4.40 vs 4.32 s); sf0.1
    * isolated 0.47–0.53 s both shapes. At tier scale the corpus is far
    * too small for an O(n log n) string sort to surface — the change is
    * kept for the 100 TB regime (hash dedup scans and spills beat two
    * full string sorts of the corpus; guide §5 "hash aggregate vs sort
    * aggregate") and for the exchange count, not for a bench win.
    * Results bit-identical (same aggregate definitions; oracle unchanged,
    * 231/231 green). */
  def d01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "documents")
      .select($"source",
        md5($"text".cast(BinaryType)).as("h"),
        md5(lower(trim($"text")).cast(BinaryType)).as("hn"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct($"h").as("n_distinct"),
        countDistinct($"hn").as("n_distinct_norm"),
        (count(lit(1)) - countDistinct($"h")).as("n_exact_dups"))
      .orderBy($"source")
  }

  /** Oracle mirrors the md5 dedup key so both engines count the same
    * thing (and a hash collision, however unlikely, would break both the
    * same way rather than silently diverge). */
  val d01Sql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT md5(text)) AS n_distinct,
      |  COUNT(DISTINCT md5(lower(trim(text)))) AS n_distinct_norm,
      |  COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- d02
  /** n-gram Jaccard near-dup pairs (threshold 0.5) via shingle join.
    *
    * Stress adjudication (round 16, committed paired windows): the
    * residual 2.4-3.1x vs DuckDB at 10x docs (8.3 s settled / 11.4 s
    * degraded-host vs 3.5-3.7 s) and 2.8x at 40x (54.2 vs 19.5 s) is
    * the posting-index EXCHANGE — both engines run the identical
    * algorithm (capped inverted index → co-occurrence counts), DuckDB
    * in one process-local hash table, Spark through one serialized
    * shuffle of the (shingle, doc) index plus one of the packed pairs.
    * The knob probe pins it as parallel work, not plan shape
    * (partitions=8 + AQE off: 8.3 → 17.7 s), and the packed-key kernel
    * already halved the pair-side bytes (10.3 → 8.6 s same-window).
    * The endpoint is committed in SURVEY §6 round-13: at 160x docs the
    * single-process baseline is OOM-killed (spills ~80 GB then dies
    * out-of-disk) while this plan completes — the exchange d02 pays at
    * small scale is precisely what lets it scale past the baseline's
    * ceiling. */
  def d02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    jaccardPairs(s, dir, 0.5).orderBy($"da", $"db")
  }

  /** Mirrors the stop-shingle cut (df ≤ 1000): sizes and intersections
    * both over the pruned shingle space, exactly like the Spark plan. */
  val d02Sql: String =
    """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |df AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s),
      |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN df ON sh0.s = df.s
      |       WHERE df.df <= 1000),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id)
      |SELECT da, db, round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
      |FROM inter JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
      |ORDER BY da, db""".stripMargin

  // ---------------------------------------------------------------- d03
  /** MinHash + LSH banding near-dup: 64 affine permutations of the shingle
    * rolling hash, 32 bands × 2 rows; band-bucket equality join yields
    * candidates, verified with exact Jaccard ≥ 0.5.
    *
    * Plan shape (the 100 TB path): signatures are ONE shuffle on doc_id
    * with 64 partially-aggregated min columns (no 64× row explode);
    * exact-Jaccard verification runs ONLY over candidate docs — the full
    * inverted-index pair enumeration (d02's plan) never happens, which is
    * the entire point of LSH.
    *
    * Geometry at scale (round-13 stress, SURVEY §6): 32×2 is
    * recall-optimal (P≈1 at J=0.5) but its false-candidate mass grows
    * ~n² on a Zipf corpus — pairs sharing 2+ boilerplate shingles
    * collide with P≈32·J². Measured at 160× sf0.1: 22.8M candidates vs
    * ~40k true pairs; the 16×4 geometry is 48× fewer and pruning
    * stop-shingles (df > [[StopShingleDf]]) from the sketch input cuts
    * a further compounding 2.3×. Both are exact no-ops at every graded
    * SF (zero hot shingles), so this op keeps 32×2; a 100 TB deployment
    * runs 16×4 over a pruned sketch, priced by d21's sweep. */
  def d03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docsArr = shingleArrays(s, dir)
    // the 64-perm minhash sketch computed NARROWLY per doc by the
    // compiled MinHash64 kernel — signature generation is a pure scan of
    // the checkpointed shingle arrays; NOTHING shuffles until the band
    // join, which exchanges only short band keys. (The equivalent
    // shuffle-based formulation, MinHashAgg over the exploded shingle
    // hashes — SURVEY §7's TypedImperativeAggregate — remains for
    // pre-exploded aggregation contexts and is property-tested identical
    // in ExpressionsSpec.)
    val perDoc = docsArr.select($"doc_id",
      graft.functions.ShingleKernels.minHash64($"arr").as("sigs"))
    val bands = bandKeys(perDoc)
    // SHUFFLE_HASH: band keys are high-cardinality, buckets are tiny —
    // same trade as the inverted-index join, sorting both sides is waste
    val cand = bands.as("a").hint("SHUFFLE_HASH")
      .join(bands.as("b").hint("SHUFFLE_HASH"),
        col("a.b") === col("b.b") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    // exact Jaccard ONLY on candidate pairs: shingle sets and set sizes
    // come NARROWLY from the checkpointed per-doc arrays (no groupBy) —
    // d02's full inverted-index pair enumeration never runs, which is the
    // entire point of LSH at scale
    val pa = docsArr.select($"doc_id".as("da"),
      size($"arr").cast("long").as("na"), array_sort($"arr").as("ssa"))
    val pb = docsArr.select($"doc_id".as("db"),
      size($"arr").cast("long").as("nb"), array_sort($"arr").as("ssb"))
    cand.hint("SHUFFLE_HASH") // pairs are the small build side (d12's trade)
      .join(pa, Seq("da")).join(pb, Seq("db"))
      .withColumn("i", graft.functions.IntersectCount($"ssa", $"ssb"))
      .withColumn("jac", dbl($"i") / ($"na" + $"nb" - $"i"))
      .filter($"jac" >= 0.5)
      .select($"da", $"db", round($"jac", 6).as("jaccard"))
      .orderBy($"da", $"db")
  }

  val d03Sql: String =
    """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |shh AS (SELECT doc_id, list_reduce(list_transform(string_split(s, ''),
      |          c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a * 31 + b) % 1000000007) AS h
      |        FROM sh),
      |sig AS (SELECT doc_id, j, min(((2 * j + 1) * h + j) % 1000000007) AS sig
      |        FROM shh, UNNEST(generate_series(0, 63)) AS u(j) GROUP BY doc_id, j),
      |bands AS (SELECT doc_id, CONCAT(j // 2, ':', max(CASE WHEN j % 2 = 0 THEN sig END),
      |            ':', max(CASE WHEN j % 2 = 1 THEN sig END)) AS key
      |          FROM sig GROUP BY doc_id, j // 2),
      |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |         FROM bands a JOIN bands b ON a.key = b.key AND a.doc_id < b.doc_id),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id)
      |SELECT inter.da, inter.db,
      |  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
      |FROM inter
      |JOIN cand ON inter.da = cand.da AND inter.db = cand.db
      |JOIN sizes sa ON inter.da = sa.doc_id JOIN sizes sb ON inter.db = sb.doc_id
      |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
      |ORDER BY inter.da, inter.db""".stripMargin

  /** (doc_id, b, key) LSH band keys from a (doc_id, sigs) frame: 32 bands
    * × 2 rows. Both sigs are < 1e9+7 < 2^30, so a band's pair packs
    * exactly into one long (sig1·2^30 + sig2) — candidate joins run on
    * (band#, long) instead of concatenated strings: smaller shuffle rows,
    * cheaper hash, no codegen string work. Shared by the batch LSH (d03)
    * and the streaming near-dup ingest ([[graft.streaming.Streams]]). */
  private[graft] def bandKeys(perDoc: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{array, col, element_at, lit, posexplode}
    val keyCols = (0 until 32).map(b =>
      (element_at(col("sigs"), 2 * b + 1) * lit(1L << 30) +
        element_at(col("sigs"), 2 * b + 2)).as(s"k$b"))
    perDoc.select(col("doc_id"), posexplode(array(keyCols: _*)))
      .toDF("doc_id", "b", "key")
  }

  // ---------------------------------------------------------------- d04
  /** SimHash near-dup: a 60-bit term-frequency simhash (two independent
    * 30-bit polynomial word hashes, multipliers 31/37), banded 4×15 bits
    * for candidate generation, verified at hamming distance ≤ 1.
    *
    * Pigeonhole: 4 equal-width bands catch every pair at distance ≤ 3, so
    * the ≤ 1 cut is exact (no false negatives). All bit math is integer
    * (shiftright/&/^/bit_count — codegen'd), no UDFs.
    *
    * Scale (100 TB): the signature is 3 cheap aggregations (word TF →
    * per-bit contribution → 60-bit fold), each with map-side partial agg;
    * the candidate join is an equality join on short band keys — the same
    * bounded fan-out shape as d03, no all-pairs stage anywhere. */
  def d04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // signatures are PURE map-side work: one compiled per-row kernel
    // (graft.functions.SimHash60) replaces the (doc, word) explode plus
    // two shuffled aggregations — nothing word-level ever crosses the
    // network, which is the plan that survives 100 TB. Docs whose words
    // are all empty have no signature (mirrors the oracle's w <> ''
    // term filter).
    // trim(text) != '' ⇔ the old exists(ws, w -> w != '') — some word is
    // nonempty iff some char is not a space; all-empty docs have no
    // signature (mirrors the oracle's w <> '' term filter). The fused
    // kernel makes sim cheap enough that both band sides recompute it
    // rather than pay a checkpoint barrier.
    val sim = Tables.t(s, dir, "documents")
      .filter(trim($"text") =!= "")
      .select($"doc_id", graft.functions.SimHash60Text($"text").as("sh"))
    val bands = sim
      .withColumn("b", explode(sequence(lit(0), lit(3))))
      .select($"doc_id", $"sh", $"b", expr("shiftright(sh, b * 15) & 32767").as("bv"))
    val cand = bands.as("a").hint("SHUFFLE_HASH")
      .join(bands.as("b").hint("SHUFFLE_HASH"),
        col("a.b") === col("b.b") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.sh").as("sa"), col("b.sh").as("sb"))
      .distinct()
    cand
      .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
      .filter($"hamming" <= 1)
      .select($"da", $"db", $"hamming")
      .orderBy($"da", $"db")
  }

  val d04Sql: String =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |tf AS (
      |  SELECT doc_id, w, COUNT(*) AS cnt FROM words WHERE w <> '' GROUP BY doc_id, w),
      |wh AS (
      |  SELECT doc_id, cnt,
      |    list_reduce(list_transform(string_split(w, ''),
      |      c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a * 31 + b) % 1000000007) AS h1,
      |    list_reduce(list_transform(string_split(w, ''),
      |      c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a * 37 + b) % 1000000007) AS h2
      |  FROM tf),
      |bits AS (
      |  SELECT doc_id, b,
      |    SUM(cnt * ((((CASE WHEN b < 30 THEN h1 ELSE h2 END) >> (b % 30)) & 1) * 2 - 1)) AS contrib
      |  FROM wh, UNNEST(generate_series(0, 59)) AS t(b) GROUP BY doc_id, b),
      |sim AS (
      |  SELECT doc_id, SUM(CASE WHEN contrib > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS sh
      |  FROM bits GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, sh, b, (sh >> (b * 15)) & 32767 AS bv
      |  FROM sim, UNNEST(generate_series(0, 3)) AS t(b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.sh AS sa, b.sh AS sb
      |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id)
      |SELECT da, db, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
      |FROM cand WHERE bit_count(xor(sa, sb)) <= 1
      |ORDER BY da, db""".stripMargin

  // ---------------------------------------------------------------- d05
  /** Blocked edit-distance near-dup: block on (lang, source, length
    * bucket) — cheap, selective keys every corpus has — then Levenshtein
    * only within blocks. The classic record-linkage shape: blocking turns
    * the quadratic distance pass into per-block work; the expensive
    * metric (O(len²) DP per pair) never sees cross-block pairs. The
    * 10-char length bucket keeps within-block pair counts linear-ish in
    * corpus size (pairs grow quadratically WITHIN a block — the block
    * width is the knob that bounds the DP budget). Both engines implement
    * the same integer DP, so distances match exactly. */
  def d05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = Tables.t(s, dir, "documents")
      .select($"doc_id", $"text", $"lang", $"source",
        expr("n_chars div 10").as("lb"))
    b.as("x")
      .join(b.as("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source") &&
          col("x.lb") === col("y.lb") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
        col("x.text").as("ta"), col("y.text").as("tb"))
      // the pair rows are BYTE-small but CPU-huge (O(len²) DP each), so
      // AQE's size-based coalescing would collapse them onto one core.
      // The repartition pins the width, and the (lazy) checkpoint is a
      // plan barrier: without it, predicate pushdown drags the
      // levenshtein filter back below the repartition into the coalesced
      // join stage.
      .repartition(s.sparkContext.defaultParallelism)
      .localCheckpoint(eager = false)
      .withColumn("dist", levenshtein($"ta", $"tb").cast("long"))
      .filter($"dist" <= 100)
      .select($"da", $"db", $"dist")
      .orderBy($"da", $"db")
  }

  val d05Sql: String =
    """WITH b AS (
      |  SELECT doc_id, text, lang, source, n_chars // 10 AS lb FROM documents)
      |SELECT x.doc_id AS da, y.doc_id AS db,
      |  CAST(levenshtein(x.text, y.text) AS BIGINT) AS dist
      |FROM b x JOIN b y
      |  ON x.lang = y.lang AND x.source = y.source AND x.lb = y.lb
      | AND x.doc_id < y.doc_id
      |WHERE levenshtein(x.text, y.text) <= 100
      |ORDER BY da, db""".stripMargin

  /** (doc_id, g) word-4-gram rows — the ONE spelling of the gram
    * pipeline d06 and d10 (and their oracles) must agree on: split on
    * space, ≥4-word docs only, compiled ShinglesK kernel. */
  private[graft] def grams4(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      // fused tokenize+shingle pass; <4-word docs yield an empty array,
      // which explode drops — the ≥4-word cut is implicit
      .select($"doc_id",
        explode(graft.functions.ShingleKernels.shinglesText($"text", 4)).as("g"))
  }

  // ---------------------------------------------------------------- d06
  /** Eval-set decontamination — the n-gram-overlap leakage check every
    * training pipeline runs before a model sees the corpus: a training
    * document is contaminated when it shares any word-4-gram with a
    * held-out eval document (production pipelines use 8–13-gram windows;
    * 4 here, scaled to the short synthetic docs so the check actually
    * fires; eval set = doc_id ≡ 0 mod 97, a deterministic stand-in for a
    * benchmark table). Returns per contaminated doc the count of distinct
    * shared 4-grams and of eval docs hit.
    *
    * Plan shape (the 100 TB path): n-gram extraction is the compiled
    * [[graft.functions.ShinglesK]] kernel — narrow, one pass per row, no
    * interpreted lambdas. The eval side is the tiny side by construction
    * (benchmarks are ~10⁵ docs vs ~10⁹ training docs), so its exploded
    * gram set BROADCASTs and the probe is map-side: the full training
    * corpus is never shuffled, only contaminated hits reach the final
    * per-doc aggregation. */
  def d06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = grams4(Tables.t(s, dir, "documents"))
    val eval = grams.filter($"doc_id" % 97 === 0)
      .select($"doc_id".as("eval_id"), $"g")
    val train = grams.filter($"doc_id" % 97 =!= 0)
    train.join(broadcast(eval), Seq("g"))
      .groupBy($"doc_id")
      .agg(
        countDistinct($"g").as("n_shared_ngrams"),
        countDistinct($"eval_id").as("n_eval_docs"))
      .orderBy($"doc_id")
  }

  val d06Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |        array_to_string(w[i:i+3], ' ') AS g
      |      FROM ws, UNNEST(generate_series(1, len(w) - 3)) AS t(i)
      |      WHERE len(w) >= 4)
      |SELECT t.doc_id,
      |  CAST(COUNT(DISTINCT t.g) AS BIGINT) AS n_shared_ngrams,
      |  CAST(COUNT(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs
      |FROM g t JOIN g e ON t.g = e.g
      |WHERE e.doc_id % 97 = 0 AND t.doc_id % 97 <> 0
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  // ---------------------------------------------------------------- d07
  /** Canonical corpus — the terminal dedup step: cluster the near-dup
    * pairs (d02 edges at Jaccard ≥ 0.5) into connected components
    * ([[GraphOps.components]]) and keep exactly one document per cluster
    * (the min-id representative) plus every unclustered document. This is
    * what a production pipeline actually writes out; d02/d03/g01 are its
    * intermediate stages.
    *
    * Scale: the clustered set is small relative to the corpus (pairs ≪
    * docs) but grows WITH it (heavy syndication = unbounded dup count),
    * so the drop-list carries no broadcast hint: AQE broadcasts it while
    * it fits the threshold and falls back to a shuffled anti-join when
    * the dup population outgrows executor memory. Either way only
    * doc_ids cross the exchange — the corpus text is never shuffled. */
  def d07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val comp = GraphOps.components(jaccardPairs(s, dir, 0.5))
    val drop = comp.filter($"doc_id" =!= $"component").select($"doc_id")
    Tables.t(s, dir, "documents")
      .join(drop, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"lang", $"source", $"n_chars".cast(LongType).as("n_chars"))
      .orderBy($"doc_id")
  }

  /** Oracle: g01's recursive-CTE components → drop non-representatives.
    * The edges CTE mirrors d02's stop-shingle pruned space. */
  val d07Sql: String =
    """WITH RECURSIVE words AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |df AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s),
      |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN df ON sh0.s = df.s
      |       WHERE df.df <= 1000),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id),
      |edges AS (SELECT da, db FROM inter
      |          JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      |          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
      |sym AS (SELECT da, db FROM edges UNION SELECT db, da FROM edges),
      |nodes AS (SELECT DISTINCT da AS doc_id FROM sym),
      |reach(src, dst) AS (
      |  SELECT doc_id, doc_id FROM nodes
      |  UNION
      |  SELECT r.src, e.db FROM reach r JOIN sym e ON r.dst = e.da),
      |comp AS (SELECT src AS doc_id, min(dst) AS component
      |         FROM reach GROUP BY src)
      |SELECT d.doc_id, d.lang, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
      |FROM documents d
      |WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> component)
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- d08
  /** Chunk-level exact dedup — the substring-granular pass doc-level d01
    * cannot see: tile every document into non-overlapping 10-word chunks,
    * count how many of each doc's chunks also occur anywhere else in the
    * corpus (boilerplate, licenses, templated spans). Per doc:
    * total chunks, duplicated chunks, and the duplication ratio.
    *
    * Plan: explode → ONE groupBy on chunk text (map-side partials collapse
    * repeats before the shuffle) → broadcast-free join back on the chunk
    * key → per-doc re-aggregation. Two shuffles total, both on keys whose
    * cardinality shrinks with dedup — the canonical shape at 100 TB; with
    * a skewed "empty chunk" universe AQE's skew split applies. A real
    * deployment hashes chunks to int64 before the shuffle (8-byte keys,
    * not 60-byte strings) — kept as text here so the oracle can mirror it
    * verbatim. */
  def d08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunks = Tables.t(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 10)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(ws) div 10 - 1), " +
          "i -> concat_ws(' ', slice(ws, 10*i + 1, 10)))")).as("chunk"))
    val gcount = chunks.groupBy($"chunk").agg(count(lit(1)).as("gc"))
    chunks.join(gcount, Seq("chunk"))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when($"gc" >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_ratio", dbl($"n_dup_chunks") / $"n_chunks")
      .orderBy($"doc_id")
  }

  val d08Sql: String =
    """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |chunks AS (
      |  SELECT doc_id,
      |    array_to_string(ws[10*i + 1 : 10*i + 10], ' ') AS chunk
      |  FROM words, UNNEST(generate_series(0, len(ws) // 10 - 1)) AS t(i)
      |  WHERE len(ws) >= 10),
      |gcount AS (SELECT chunk, COUNT(*) AS gc FROM chunks GROUP BY chunk)
      |SELECT doc_id,
      |  COUNT(*) AS n_chunks,
      |  CAST(SUM(CASE WHEN gc >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
      |  CAST(SUM(CASE WHEN gc >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
      |    AS dup_ratio
      |FROM chunks JOIN gcount USING (chunk)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d09
  /** Containment (near-subset) detection: |A∩B| / min(|A|,|B|) ≥ 0.9 over
    * 3-gram shingle sets. Jaccard (d02) misses the quote/excerpt case — a
    * 50-word doc embedded verbatim in a 5000-word doc has Jaccard ≈ 0.01
    * but containment 1.0; training corpora dedup on BOTH. Same inverted-
    * index join as d02 (one shuffle on shingles, SHUFFLE_HASH); the
    * threshold predicate is integer arithmetic (`10·i ≥ 9·min`) so the
    * pair set is engine-exact, no FP compare. `contained_id` tags the
    * smaller doc — the one a curation pass would drop. */
  def d09(s: SparkSession, dir: String): DataFrame =
    containmentPairs(shingleHashArrays(s, dir))

  /** d09's kernel over an explicit (doc_id, arr) shingle frame — split out
    * so specs can pin the case the synthetic corpus lacks: a short doc
    * quoted inside a long one (containment 1.0, Jaccard ≈ 0). */
  private[graft] def containmentPairs(docsArr: DataFrame): DataFrame = {
    val s = docsArr.sparkSession
    import s.implicits._
    pairStats(docsArr)
      .withColumn("m", least($"na", $"nb"))
      .filter($"i" * 10 >= $"m" * 9)
      .select($"da", $"db",
        round(dbl($"i") / $"m", 6).as("containment"),
        when($"na" <= $"nb", $"da").otherwise($"db").as("contained_id"))
      .orderBy($"da", $"db")
  }

  /** Mirrors the stop-shingle cut (df ≤ 1000): sizes and intersections
    * both over the pruned shingle space, exactly like the Spark plan. */
  val d09Sql: String =
    """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |df AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s),
      |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN df ON sh0.s = df.s
      |       WHERE df.df <= 1000),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id)
      |SELECT da, db,
      |  round(CAST(i AS DOUBLE) / least(sa.n, sb.n), 6) AS containment,
      |  CASE WHEN sa.n <= sb.n THEN da ELSE db END AS contained_id
      |FROM inter JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      |WHERE i * 10 >= least(sa.n, sb.n) * 9
      |ORDER BY da, db""".stripMargin

  // ---------------------------------------------------------------- d10
  /** Bloom-prefiltered decontamination census — d06's leakage check in
    * the shape it takes when the EVAL GRAM SET ITSELF outgrows an exact
    * broadcast (hundreds of benchmarks × 13-gram windows): the eval grams
    * compress into a 1%-fpp bloom filter (~1.2 bytes/item vs ~50+ for the
    * raw strings — ~40× smaller than d06's broadcast set), the whole
    * training corpus probes the sketch MAP-SIDE via the compiled
    * `might_contain` literal (no exchange, no join), and only the
    * might-contain survivor set pays exact-verification joins that kill
    * the bloom's false positives. The output is therefore EXACT — the
    * sketch only prunes, so fpp never reaches the result and the oracle
    * is the plain exact join. Returns a per-source census: training docs,
    * contaminated (shares ≥1 word-4-gram with an eval doc), clean.
    *
    * Scale (100 TB): corpus-side gram work is narrow (the probe is a
    * literal, no join); the confirm joins carry the survivor set, whose
    * size is contamination + fpp·|distinct training grams| — the fp term
    * is corpus-proportional, so the confirm joins are LEFT TO AQE (a
    * forced broadcast would collect fp survivors driver-side and OOM on
    * a big-enough corpus even at nominal fpp; AQE broadcasts exactly
    * when the realized survivor set is actually small, and falls back
    * to shuffled joins — bounded, just wider — when it isn't). */
  def d10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.t(s, dir, "documents")
    val grams = grams4(docs)
    // eval grams are read three times (count, sketch build, exact
    // confirm) — checkpoint so the extraction runs once
    val evalG = grams.filter($"doc_id" % 97 === 0).select($"g").distinct()
      .localCheckpoint(eager = false)
    // size the sketch from the ACTUAL eval cardinality (a fixed guess
    // under-sizes a grown eval suite and the realized fpp quietly blows
    // past 1%, un-pruning the prefilter); the count also materializes
    // the checkpoint, and the driver only ever holds the filter, not rows
    val nEval = evalG.count()
    val bf = evalG.select(xxhash64($"g").as("h"))
      .stat.bloomFilter("h", math.max(nEval, 1024L), 0.01)
    val probe = graft.functions.BloomProbe.mightContain(
      graft.functions.BloomProbe.toBytes(bf), $"g")
    // candidate (doc, gram) pairs: everything the sketch lets through —
    // true hits plus ~fpp noise
    val cand = grams.filter($"doc_id" % 97 =!= 0).filter(probe)
      .localCheckpoint(eager = false) // consumed twice below
    // exact confirm: distinct candidate grams against the true eval set,
    // then true shared grams mark the candidate docs. No broadcast
    // hints — see the scale note above.
    val trueShared = evalG
      .join(cand.select($"g").distinct(), Seq("g"), "left_semi")
    val hitDocs = cand.join(trueShared, Seq("g"))
      .select($"doc_id").distinct()
      .withColumn("hit", lit(1L))
    docs.filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", $"source")
      .join(hitDocs, Seq("doc_id"), "left")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_train_docs"),
        sum(coalesce($"hit", lit(0L))).as("n_contaminated"),
        (count(lit(1)) - sum(coalesce($"hit", lit(0L)))).as("n_clean"))
      .orderBy($"source")
  }

  /** The exact-join semantics the bloom path must reproduce: same gram
    * spelling as d06's oracle, census instead of per-doc counts. */
  val d10Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |        array_to_string(w[i:i+3], ' ') AS g
      |      FROM ws, UNNEST(generate_series(1, len(w) - 3)) AS t(i)
      |      WHERE len(w) >= 4),
      |eval_g AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
      |hit AS (SELECT DISTINCT t.doc_id FROM g t JOIN eval_g e ON t.g = e.g
      |        WHERE t.doc_id % 97 <> 0)
      |SELECT d.source,
      |  COUNT(*) AS n_train_docs,
      |  CAST(SUM(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_contaminated,
      |  CAST(COUNT(*) - SUM(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_clean
      |FROM documents d LEFT JOIN hit ON d.doc_id = hit.doc_id
      |WHERE d.doc_id % 97 <> 0
      |GROUP BY d.source ORDER BY d.source""".stripMargin

  // ---------------------------------------------------------------- d11
  /** Cross-source near-dup overlap matrix — the provenance diagnostic
    * run before mixing crawls: for every unordered source pair, how many
    * near-dup pairs (d02 edges at jaccard ≥ 0.5) link them. A heavy
    * off-diagonal cell means two "independent" sources mirror each other
    * (syndication, scraped re-hosts) and their mixture weights
    * double-count the same text; the diagonal counts within-source
    * duplication.
    *
    * Scale (100 TB): the near-dup pair set is tiny relative to the
    * corpus that produced it, so AQE broadcasts the pair side of both
    * source lookups and the (doc_id → source) projection streams — the
    * corpus never shuffles; the output is |sources|² at most. */
  def d11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = jaccardPairs(s, dir, 0.5)
    val src = Tables.t(s, dir, "documents").select($"doc_id", $"source")
    pairs
      .join(src.as("sa"), $"da" === col("sa.doc_id"))
      .join(src.as("sb"), $"db" === col("sb.doc_id"))
      .select(
        least(col("sa.source"), col("sb.source")).as("source_a"),
        greatest(col("sa.source"), col("sb.source")).as("source_b"))
      .groupBy($"source_a", $"source_b")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy($"source_a", $"source_b")
  }

  val d11Sql: String =
    """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |df AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s),
      |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN df ON sh0.s = df.s
      |       WHERE df.df <= 1000),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id),
      |edges AS (SELECT da, db FROM inter
      |          JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      |          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5)
      |SELECT least(x.source, y.source) AS source_a,
      |  greatest(x.source, y.source) AS source_b,
      |  COUNT(*) AS n_pairs
      |FROM edges JOIN documents x ON edges.da = x.doc_id
      |           JOIN documents y ON edges.db = y.doc_id
      |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin

  // ---------------------------------------------------------------- d12
  /** MinHash estimator accuracy audit — the dedup analog of s06's ANN
    * recall: for every LSH candidate pair (d03's band join, no Jaccard
    * cut), compare the signature-estimated Jaccard (matching positions /
    * 64) against the exact shingle Jaccard. This is the measurement that
    * justifies the sketch: it tells you how much the 0.5 verification
    * threshold can trust the estimate, and whether 64 permutations are
    * enough for the corpus at hand before a production run drops the
    * exact-verification stage on cheap tiers.
    *
    * Determinism: the estimate is one division of two exact integers
    * (n_eq/64); the exact side is d03's integer-set arithmetic; the
    * error is |difference| of two identical doubles — all rounded at 6.
    *
    * Scale (100 TB): the audit only ever touches CANDIDATE pairs — the
    * set LSH generates anyway — and signature comparison is a 64-long
    * zip over two already-computed sketches (narrow). Production samples
    * the candidate stream instead of auditing all of it; same plan. */
  def d12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // signatures and sizes read NARROWLY off the one shingle-array
    // checkpoint — no second checkpoint, no separate signature frame:
    // each pair side carries (arr, sigs) through ONE join instead of the
    // former two (sig join + array join), halving both the join count
    // and the shuffled passes over the corpus frame. minHash64 recompute
    // per consumer is pure map-side kernel work over cached blocks.
    val docsArr = shingleArrays(s, dir)
    val withSig = docsArr.select($"doc_id", $"arr",
      graft.functions.ShingleKernels.minHash64($"arr").as("sigs"))
    val bands = bandKeys(withSig.select($"doc_id", $"sigs"))
    val cand = bands.as("a").hint("SHUFFLE_HASH")
      .join(bands.as("b").hint("SHUFFLE_HASH"),
        col("a.b") === col("b.b") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val pa = withSig.select($"doc_id".as("da"),
      size($"arr").cast("long").as("na"), array_sort($"arr").as("ssa"), $"sigs".as("siga"))
    val pb = withSig.select($"doc_id".as("db"),
      size($"arr").cast("long").as("nb"), array_sort($"arr").as("ssb"), $"sigs".as("sigb"))
    cand.hint("SHUFFLE_HASH").join(pa, Seq("da")).join(pb, Seq("db"))
      .withColumn("n_eq",
        expr("CAST(size(filter(zip_with(siga, sigb, (x, y) -> x = y), p -> p)) AS BIGINT)"))
      .withColumn("i", graft.functions.IntersectCount($"ssa", $"ssb"))
      .withColumn("jac_exact", dbl($"i") / ($"na" + $"nb" - $"i"))
      .withColumn("jac_est", dbl($"n_eq") / 64)
      .select($"da", $"db", $"n_eq",
        round($"jac_exact", 6).as("jaccard_exact"),
        round($"jac_est", 6).as("jaccard_est"),
        round(abs($"jac_est" - $"jac_exact"), 6).as("abs_err"))
      .orderBy($"da", $"db")
  }

  /** d03's signature/band/candidate CTEs, plus a per-pair position-match
    * count; zero-intersection candidates survive via the LEFT JOIN. */
  val d12Sql: String =
    """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |shh AS (SELECT doc_id, list_reduce(list_transform(string_split(s, ''),
      |          c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a * 31 + b) % 1000000007) AS h
      |        FROM sh),
      |sig AS (SELECT doc_id, j, min(((2 * j + 1) * h + j) % 1000000007) AS sig
      |        FROM shh, UNNEST(generate_series(0, 63)) AS u(j) GROUP BY doc_id, j),
      |bands AS (SELECT doc_id, CONCAT(j // 2, ':', max(CASE WHEN j % 2 = 0 THEN sig END),
      |            ':', max(CASE WHEN j % 2 = 1 THEN sig END)) AS key
      |          FROM sig GROUP BY doc_id, j // 2),
      |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |         FROM bands a JOIN bands b ON a.key = b.key AND a.doc_id < b.doc_id),
      |eq AS (SELECT c.da, c.db,
      |         SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS n_eq
      |       FROM cand c JOIN sig sa ON sa.doc_id = c.da
      |       JOIN sig sb ON sb.doc_id = c.db AND sb.j = sa.j
      |       GROUP BY c.da, c.db),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id)
      |SELECT e.da, e.db, CAST(e.n_eq AS BIGINT) AS n_eq,
      |  round(CAST(COALESCE(i.i, 0) AS DOUBLE)
      |    / (sa.n + sb.n - COALESCE(i.i, 0)), 6) AS jaccard_exact,
      |  round(CAST(e.n_eq AS DOUBLE) / 64, 6) AS jaccard_est,
      |  round(abs(CAST(e.n_eq AS DOUBLE) / 64
      |    - CAST(COALESCE(i.i, 0) AS DOUBLE)
      |      / (sa.n + sb.n - COALESCE(i.i, 0))), 6) AS abs_err
      |FROM eq e
      |LEFT JOIN inter i ON e.da = i.da AND e.db = i.db
      |JOIN sizes sa ON e.da = sa.doc_id JOIN sizes sb ON e.db = sb.doc_id
      |ORDER BY e.da, e.db""".stripMargin

  // ---------------------------------------------------------------- d19
  /** SimHash estimator audit — d12's twin for the OTHER sketch: for
    * every d04 band-collision candidate (no hamming cut), the 60-bit
    * signature agreement (1 − hamming/60, SimHash's cosine proxy)
    * against the exact 3-gram Jaccard. Read before trusting hamming
    * thresholds on cheap tiers: SimHash agreement is a TF-cosine proxy,
    * so this also quantifies how far that proxy sits from the set
    * metric the dedup policy is actually written against.
    *
    * Determinism: hamming is integer bit math; both ratios are single
    * divisions of exact integers, rounded at 6 — engine-exact.
    *
    * Scale (100 TB): audits only the candidate pairs the band join
    * generates anyway; signatures are the one compiled map-side kernel
    * pass d04 already pays, and the exact side joins the checkpointed
    * shingle arrays — nothing quadratic outside the band buckets. */
  def d19(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // fused tokenize+simhash kernel: the signature pass is a pure scan
    // (no regex split, no word array, no checkpoint — both band sides
    // recompute the cheap kernel). trim != '' mirrors the oracle's
    // w <> '' term filter (d04's predicate): an all-space doc has no
    // nonempty word, hence no signature — but it DOES have (empty-word)
    // shingles, so without this cut two such docs would band-collide at
    // sh=0 and survive the exact join, diverging from the oracle.
    val sim = Tables.t(s, dir, "documents")
      .filter(trim($"text") =!= "")
      .select($"doc_id", graft.functions.SimHash60Text($"text").as("sh"))
    // audit a deterministic 10% of the candidate stream, in the
    // decision-relevant band only (d04 cuts at ≤ 1; ≤ 8 shows the
    // estimator on both sides of any plausible threshold). The sample
    // predicate sits IN the pair generator so the dedup of band
    // collisions only ever sees sampled pairs, and both cuts land before
    // the shingle join — the exact side never sees the long tail of
    // incidental collisions. Production audits sample exactly like this:
    // the estimate-vs-exact distribution needs coverage, not every pair.
    //
    // Band keys are PRE-AGGREGATED into bucket lists (the pairStats
    // posting shape) instead of a bands⋈bands self-join: one exchange on
    // (band, value) replaces the two SHUFFLE_HASH sides, and the SimHash
    // kernel runs once instead of once per side. Per-bucket lists buffer
    // exactly what the hash join buffered per key; a pathological hot
    // bucket is the production cue for an m12-style hot-bucket cut
    // (absent here because the audit's oracle joins ALL collisions).
    val buckets = sim
      .withColumn("b", explode(sequence(lit(0), lit(3))))
      .select(
        $"b", expr("shiftright(sh, b * 15) & 32767").as("bv"),
        struct($"doc_id", $"sh").as("e"))
      .groupBy($"b", $"bv").agg(collect_list($"e").as("es"))
    val cand = buckets
      .select(explode($"es").as("x"), $"es")
      .select($"x", explode($"es").as("y"))
      .filter($"x.doc_id" < $"y.doc_id" &&
        ($"x.doc_id" + $"y.doc_id") % 10 === 0 &&
        expr("bit_count(x.sh ^ y.sh) <= 8"))
      .select($"x.doc_id".as("da"), $"y.doc_id".as("db"),
        expr("CAST(bit_count(x.sh ^ y.sh) AS BIGINT)").as("hamming"))
      .distinct()
    val docsArr = shingleArrays(s, dir)
    val pa = docsArr.select($"doc_id".as("da"),
      size($"arr").cast("long").as("na"), array_sort($"arr").as("ssa"))
    val pb = docsArr.select($"doc_id".as("db"),
      size($"arr").cast("long").as("nb"), array_sort($"arr").as("ssb"))
    // The pair-side exchange is kept deliberately: the per-pair intersect
    // is the CPU-heavy step, and the hash exchange is what spreads it
    // over all cores when the upstream scan has few splits (a broadcast-
    // join variant measured 5× slower at bench SF for exactly that
    // reason — and at cluster scale the exchange cost is id-tuples only).
    val scored = cand
      .hint("SHUFFLE_HASH") // the sampled pair set is the small build side
      .join(pa, Seq("da")).join(pb, Seq("db"))
      .withColumn("i", graft.functions.IntersectCount($"ssa", $"ssb"))
      .withColumn("jac_exact", dbl($"i") / ($"na" + $"nb" - $"i"))
      .withColumn("agree", dbl(lit(60L) - $"hamming") / 60)
      .select($"da", $"db", $"hamming",
        round($"agree", 6).as("agreement_est"),
        round($"jac_exact", 6).as("jaccard_exact"),
        round(abs($"agree" - $"jac_exact"), 6).as("gap"))
    // the intersect tier is expensive and shuffle-terminal-free: without
    // the checkpoint the output sort's range sampler would re-run every
    // per-pair intersect a second time (Q.sortedNarrow's contract)
    Q.sortedNarrow(scored, $"da", $"db")
  }

  val d19Sql: String =
    """WITH wordsu AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |tf AS (
      |  SELECT doc_id, w, COUNT(*) AS cnt FROM wordsu WHERE w <> '' GROUP BY doc_id, w),
      |wh AS (
      |  SELECT doc_id, cnt,
      |    list_reduce(list_transform(string_split(w, ''),
      |      c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a * 31 + b) % 1000000007) AS h1,
      |    list_reduce(list_transform(string_split(w, ''),
      |      c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a * 37 + b) % 1000000007) AS h2
      |  FROM tf),
      |bits AS (
      |  SELECT doc_id, b,
      |    SUM(cnt * ((((CASE WHEN b < 30 THEN h1 ELSE h2 END) >> (b % 30)) & 1) * 2 - 1)) AS contrib
      |  FROM wh, UNNEST(generate_series(0, 59)) AS t(b) GROUP BY doc_id, b),
      |sim AS (
      |  SELECT doc_id, SUM(CASE WHEN contrib > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS sh
      |  FROM bits GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, sh, b, (sh >> (b * 15)) & 32767 AS bv
      |  FROM sim, UNNEST(generate_series(0, 3)) AS t(b)),
      |cand AS (
      |  SELECT * FROM (
      |    SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.sh AS sa, b.sh AS sb
      |    FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv
      |      AND a.doc_id < b.doc_id AND (a.doc_id + b.doc_id) % 10 = 0)
      |  WHERE bit_count(xor(sa, sb)) <= 8),
      |words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |shg AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shg GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM shg a JOIN shg b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id)
      |SELECT c.da, c.db,
      |  CAST(bit_count(xor(c.sa, c.sb)) AS BIGINT) AS hamming,
      |  round(CAST(60 - bit_count(xor(c.sa, c.sb)) AS DOUBLE) / 60, 6)
      |    AS agreement_est,
      |  round(CAST(COALESCE(i.i, 0) AS DOUBLE)
      |    / (sa.n + sb.n - COALESCE(i.i, 0)), 6) AS jaccard_exact,
      |  round(abs(CAST(60 - bit_count(xor(c.sa, c.sb)) AS DOUBLE) / 60
      |    - CAST(COALESCE(i.i, 0) AS DOUBLE)
      |      / (sa.n + sb.n - COALESCE(i.i, 0))), 6) AS gap
      |FROM cand c
      |LEFT JOIN inter i ON c.da = i.da AND c.db = i.db
      |JOIN sizes sa ON c.da = sa.doc_id JOIN sizes sb ON c.db = sb.doc_id
      |ORDER BY c.da, c.db""".stripMargin

  // ---------------------------------------------------------------- d13
  /** Semantic dedup (SemDeDup-style, Abbas et al. 2023): duplicates that
    * share no n-grams — paraphrases, re-encodes, translations-of-templates
    * — are invisible to d02/d03's lexical shingles but sit close in
    * embedding space. Pipeline: assign every embedding to its nearest
    * coarse centroid (k-means cells; here the deterministic vec_id%100
    * medoids), compare pairs WITHIN a cell only, and drop any document
    * that has a lower-id neighbor with cosine ≥ 0.4 (`dup_of` records
    * the surviving representative). Output is the full per-document
    * audit: (doc_id, source, cell, kept, dup_of).
    *
    * Scale (100 TB): the cluster assignment is a broadcast argmax — the
    * corpus-sized embedding table never shuffles for it; the quadratic
    * compare is confined to each cell (pairs ≈ N²/nlist for balanced
    * cells — at scale nlist grows with N, e.g. √N cells keeps per-cell
    * work flat); the drop rule is a per-cell min-aggregate, and the
    * documents table joins once on doc_id with the (tiny) dropped set
    * broadcast. Same candidate-generation-then-verify shape as d03 —
    * cells instead of band buckets. */
  def d13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    semanticDedup(Tables.t(s, dir, "embeddings"), Tables.t(s, dir, "documents"), 0.4)
  }

  /** The semantic-dedup kernel over any (vec_id, embedding) + (doc_id,
    * source) pair of frames — split out so the spec can pin the survivor
    * rule on hand-built vectors (identical pair → higher id dropped;
    * near-boundary cosine; cross-cell pairs never compared). */
  private[graft] def semanticDedup(
      embeddings: DataFrame, docs: DataFrame, tau: Double): DataFrame = {
    val s = embeddings.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dot = Similarity.dot _
    val all = embeddings
      .select($"vec_id", transform($"embedding", x => x.cast(DoubleType)).as("v"))
      .withColumn("norm", sqrt(dot($"v", $"v")))
    val cent = all.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("cid"), $"v".as("cv"), $"norm".as("cnorm"))
    val wAssign = Window.partitionBy($"vec_id")
      .orderBy(round($"csim", 6).desc, $"cid")
    // consumed three times (both pair-join sides + the audit join):
    // lazy-checkpoint so assignment runs once
    val assigned = all.join(broadcast(cent))
      .withColumn("csim", dot($"cv", $"v") / ($"cnorm" * $"norm"))
      .withColumn("arank", row_number().over(wAssign))
      .filter($"arank" === 1)
      .select($"vec_id", $"v", $"norm", $"cid")
      .localCheckpoint(eager = false)
    val a = assigned.select($"cid".as("ca"), $"vec_id".as("va"), $"v".as("xa"), $"norm".as("na"))
    val b = assigned.select($"cid".as("cb"), $"vec_id".as("vb"), $"v".as("xb"), $"norm".as("nb"))
    val dupOf = a.join(b, $"ca" === $"cb" && $"va" < $"vb")
      .filter(dot($"xa", $"xb") / ($"na" * $"nb") >= tau)
      .groupBy($"vb").agg(min($"va").as("dup_of"))
    docs
      .join(assigned.select($"vec_id", $"cid"), $"doc_id" === $"vec_id")
      // the dup-of list grows with corpus redundancy — no broadcast
      // hint; AQE picks broadcast only while it fits the threshold
      .join(dupOf, $"doc_id" === $"vb", "left")
      .select($"doc_id", $"source", $"cid".as("cell"),
        $"dup_of".isNull.as("kept"), $"dup_of")
      .orderBy($"doc_id")
  }

  val d13Sql: String = {
    val dot = (x: String, y: String) =>
      s"list_reduce(list_transform(generate_series(1, 64), " +
        s"i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (p, q) -> p + q)"
    s"""WITH v AS (SELECT vec_id, embedding,
       |    sqrt(${dot("embedding", "embedding")}) AS norm FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS ce, norm AS cnorm FROM v WHERE vec_id % 100 = 0),
       |assigned AS (
       |  SELECT vec_id, embedding, norm, cid FROM (
       |    SELECT v.vec_id, v.embedding, v.norm, cent.cid,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY round(${dot("ce", "embedding")} / (cnorm * norm), 6) DESC, cid) AS arank
       |    FROM v CROSS JOIN cent)
       |  WHERE arank = 1),
       |dup AS (
       |  SELECT b.vec_id AS vb, MIN(a.vec_id) AS dup_of
       |  FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE ${dot("a.embedding", "b.embedding")} / (a.norm * b.norm) >= 0.4
       |  GROUP BY b.vec_id)
       |SELECT d.doc_id, d.source, s.cid AS cell,
       |  dup.dup_of IS NULL AS kept, dup.dup_of
       |FROM documents d
       |JOIN assigned s ON d.doc_id = s.vec_id
       |LEFT JOIN dup ON d.doc_id = dup.vb
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- d14
  /** Per-source curation funnel — the end-to-end "how much data survives"
    * report the individual dedup ops feed: every document is flagged by
    * three independent full-corpus drop rules (exact: not the min-id of
    * its md5(text) group; near-dup: has a lower-id Jaccard≥0.5 neighbor;
    * contamination: shares a 4-gram with the eval sample, or IS eval),
    * then counted per source through the stage sequence. Retention is an
    * int64 ppm (floor division) — engine-exact.
    *
    * Flags are defined on the FULL corpus, not re-derived per stage, so
    * the funnel is monotone by construction and each column is exactly
    * "survivors of stages 1..k" — the operational number a mixture
    * planner (t23) consumes.
    *
    * Scale (100 TB): one md5-keyed window for the exact rank (16-byte
    * keys, never text — d01's exchange story); the near-dup and
    * contamination drop sets are pair-generator outputs — small vs the
    * corpus but corpus-GROWING, so they merge into ONE flag frame that
    * joins via [[Q.boundedBroadcast]] (measured: broadcast under the
    * cap, shuffle join beyond — never a forced executor-memory bet);
    * one final aggregate on source. The corpus itself shuffles once, on
    * the hash. */
  def d14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.t(s, dir, "documents")
      .select($"doc_id", $"source", $"text")
    val nearDrop = jaccardPairs(s, dir, 0.5)
      .select($"db".as("doc_id")).distinct()
      .withColumn("nd", lit(true))
    val grams = grams4(Tables.t(s, dir, "documents"))
    val evalG = grams.filter($"doc_id" % 97 === 0).select($"g").distinct()
    val contam = grams.filter($"doc_id" % 97 =!= 0)
      .join(broadcast(evalG), Seq("g"))
      .select($"doc_id").distinct()
      .union(docs.filter($"doc_id" % 97 === 0).select($"doc_id"))
      .distinct()
      .withColumn("cf", lit(true))
    // one merged flag frame (full outer of the two small sets) → ONE
    // probe pass over the corpus instead of two, and one measured
    // threshold-switch instead of two
    val flags = nearDrop.join(contam, Seq("doc_id"), "full_outer")
    val wH = Window.partitionBy($"h").orderBy($"doc_id")
    docs
      .withColumn("h", md5($"text".cast(BinaryType)))
      .withColumn("e", row_number().over(wH) > 1)
      .join(Q.boundedBroadcast(flags), Seq("doc_id"), "left")
      .select($"source", $"e",
        coalesce($"nd", lit(false)).as("nd"),
        coalesce($"cf", lit(false)).as("cf"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(!$"e", 1L).otherwise(0L)).as("n_after_exact"),
        sum(when(!$"e" && !$"nd", 1L).otherwise(0L)).as("n_after_neardup"),
        sum(when(!$"e" && !$"nd" && !$"cf", 1L).otherwise(0L)).as("n_clean"))
      .withColumn("retention_ppm", expr("(n_clean * 1000000) div n_docs"))
      .orderBy($"source")
  }

  val d14Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |            UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |df AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s),
      |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN df ON sh0.s = df.s
      |       WHERE df.df <= 1000),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id),
      |neard AS (SELECT DISTINCT db AS doc_id FROM inter
      |          JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      |          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
      |g4 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+3], ' ') AS g
      |       FROM ws, UNNEST(generate_series(1, len(w) - 3)) AS t(i)
      |       WHERE len(w) >= 4),
      |contam AS (
      |  SELECT DISTINCT t.doc_id FROM g4 t JOIN g4 e ON t.g = e.g
      |  WHERE e.doc_id % 97 = 0 AND t.doc_id % 97 <> 0
      |  UNION
      |  SELECT doc_id FROM documents WHERE doc_id % 97 = 0),
      |ex AS (SELECT doc_id,
      |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |       FROM documents),
      |flags AS (
      |  SELECT d.source, (ex.rn > 1) AS e,
      |    (n.doc_id IS NOT NULL) AS nd,
      |    (c.doc_id IS NOT NULL) AS cf
      |  FROM documents d
      |  JOIN ex ON d.doc_id = ex.doc_id
      |  LEFT JOIN neard n ON d.doc_id = n.doc_id
      |  LEFT JOIN contam c ON d.doc_id = c.doc_id)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN NOT e THEN 1 ELSE 0 END) AS BIGINT) AS n_after_exact,
      |  CAST(SUM(CASE WHEN NOT e AND NOT nd THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_after_neardup,
      |  CAST(SUM(CASE WHEN NOT e AND NOT nd AND NOT cf THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clean,
      |  (CAST(SUM(CASE WHEN NOT e AND NOT nd AND NOT cf THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000) // COUNT(*) AS retention_ppm
      |FROM flags GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- d15
  /** Dedup-threshold sensitivity sweep — how many near-dup pairs (and
    * documents touched by one) each candidate Jaccard cutoff would
    * flag, for thresholds 0.5..0.9. The knob-tuning report run before
    * committing to a cutoff: a cliff between adjacent rows means the
    * corpus has a dup mode right at that similarity.
    *
    * The qualifying test is integer cross-multiplication
    * (10·i ≥ t₁₀·union), so every row is engine-exact — no FP threshold
    * comparison anywhere.
    *
    * Scale (100 TB): the sweep's input is the pair-generator output
    * (candidates sharing a surviving shingle — tiny vs the corpus), so
    * the 5× threshold explode and both aggregates run on pairs, never
    * on documents. One extra shuffle on t₁₀ beyond d02's own plan. */
  def d15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sweep = pairStats(shingleHashArrays(s, dir))
      .select($"da", $"db", $"i", ($"na" + $"nb" - $"i").as("u"))
      .select($"da", $"db", $"i", $"u",
        explode(array((5 to 9).map(t => lit(t.toLong)): _*)).as("threshold_x10"))
      .filter($"i" * 10 >= $"threshold_x10" * $"u")
      .localCheckpoint(eager = false)
    val pairsC = sweep.groupBy($"threshold_x10").agg(count(lit(1)).as("n_pairs"))
    val docsC = sweep.select($"threshold_x10", $"da".as("d"))
      .union(sweep.select($"threshold_x10", $"db"))
      .distinct()
      .groupBy($"threshold_x10").agg(count(lit(1)).as("n_docs"))
    pairsC.join(docsC, Seq("threshold_x10"))
      .orderBy($"threshold_x10")
  }

  val d15Sql: String =
    """WITH sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |            UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |df AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s),
      |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN df ON sh0.s = df.s
      |       WHERE df.df <= 1000),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id),
      |stats AS (SELECT da, db, i, sa.n + sb.n - i AS u FROM inter
      |          JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id),
      |sweep AS (SELECT t10, da, db FROM stats,
      |            UNNEST(generate_series(5, 9)) AS t(t10)
      |          WHERE i * 10 >= t10 * u),
      |pairs_c AS (SELECT t10, COUNT(*) AS n_pairs FROM sweep GROUP BY t10),
      |docs_c AS (SELECT t10, COUNT(*) AS n_docs FROM (
      |             SELECT DISTINCT t10, d FROM (
      |               SELECT t10, da AS d FROM sweep
      |               UNION ALL SELECT t10, db FROM sweep))
      |           GROUP BY t10)
      |SELECT t10 AS threshold_x10, n_pairs, n_docs
      |FROM pairs_c JOIN docs_c USING (t10) ORDER BY t10""".stripMargin

  // ---------------------------------------------------------------- d16
  /** Leak attribution — d06 flipped to the EVAL side: for each
    * benchmark document, how many training documents share a 4-gram
    * with it, the total shared-gram incidences across those pairs, and
    * the single worst offender (most distinct shared grams, ties to the
    * smaller doc_id). d06 answers "which training docs must I drop";
    * this answers "which benchmark items are compromised and by what" —
    * the report that decides whether an eval score is still meaningful.
    *
    * Scale (100 TB): identical join shape to d06 — the eval gram set
    * broadcasts, the training corpus probes map-side, and only hit
    * pairs (≪ corpus) reach the aggregations. The offender ranking and
    * the per-eval rollup share one eval_id exchange (window + groupBy
    * on the same key — the q38 pattern). */
  def d16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val grams = grams4(Tables.t(s, dir, "documents"))
    val eval = grams.filter($"doc_id" % 97 === 0)
      .select($"doc_id".as("eval_id"), $"g")
    val pair = grams.filter($"doc_id" % 97 =!= 0)
      .join(broadcast(eval), Seq("g"))
      .groupBy($"eval_id", $"doc_id")
      .agg(countDistinct($"g").as("n_grams"))
    val w = Window.partitionBy($"eval_id").orderBy($"n_grams".desc, $"doc_id")
    pair.withColumn("rk", row_number().over(w))
      .groupBy($"eval_id")
      .agg(
        count(lit(1)).as("n_train_docs"),
        sum($"n_grams").as("total_shared_grams"),
        max(when($"rk" === 1, $"doc_id")).as("top_offender"),
        max(when($"rk" === 1, $"n_grams")).as("top_shared"))
      .orderBy($"eval_id")
  }

  val d16Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+3], ' ') AS g
      |      FROM ws, UNNEST(generate_series(1, len(w) - 3)) AS t(i)
      |      WHERE len(w) >= 4),
      |pair AS (SELECT e.doc_id AS eval_id, t.doc_id AS doc_id,
      |           CAST(COUNT(DISTINCT t.g) AS BIGINT) AS n_grams
      |         FROM g t JOIN g e ON t.g = e.g
      |         WHERE e.doc_id % 97 = 0 AND t.doc_id % 97 <> 0
      |         GROUP BY e.doc_id, t.doc_id),
      |rk AS (SELECT eval_id, doc_id, n_grams,
      |         row_number() OVER (PARTITION BY eval_id
      |           ORDER BY n_grams DESC, doc_id) AS rk
      |       FROM pair)
      |SELECT eval_id, COUNT(*) AS n_train_docs,
      |  CAST(SUM(n_grams) AS BIGINT) AS total_shared_grams,
      |  MAX(CASE WHEN rk = 1 THEN doc_id END) AS top_offender,
      |  MAX(CASE WHEN rk = 1 THEN n_grams END) AS top_shared
      |FROM rk GROUP BY eval_id ORDER BY eval_id""".stripMargin

  // ---------------------------------------------------------------- d17
  /** Template dedup — boilerplate detection ABOVE d01's exact tier:
    * mask digit runs and collapse whitespace, then group by the masked
    * hash, so "Order #123 shipped" and "Order #456 shipped" collapse
    * into one template. Reports the top-10 template groups (by member
    * count) that exact dedup CANNOT see (n_distinct_texts > 1): the
    * generated/boilerplate families a curation pass drops or caps.
    *
    * Scale (100 TB): the masked hash is 16 bytes — like d01, document
    * text never shuffles; the group-by reduces map-side, and the top-10
    * is TakeOrderedAndProject over the (corpus-growing) template-group
    * frame — never an unpartitioned rank window. */
  /** d17 kernel on any (doc_id, source, text) frame — the synthetic
    * corpus has no digits to mask, so the oracle gate only proves the
    * empty case; DedupSpec pins the positive template-collapse cases. */
  private[graft] def templateGroups(docsIn: DataFrame): DataFrame = {
    val s = docsIn.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val tpl = docsIn
      .select($"doc_id", $"source",
        md5($"text".cast(BinaryType)).as("h"),
        md5(regexp_replace(regexp_replace($"text", "[0-9]+", "0"), " +", " ")
          .cast(BinaryType)).as("ht"))
    val groups = tpl.groupBy($"ht")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct($"h").as("n_distinct_texts"),
        countDistinct($"source").as("n_sources"),
        min($"doc_id").as("example_doc"))
      .filter($"n_distinct_texts" > 1)
    // global top-10 as orderBy+limit → TakeOrderedAndProject (per-partition
    // heaps, 10 rows to the driver) — the template-group frame is
    // corpus-growing (one row per masked-hash family), so a row_number
    // over an unpartitioned window would shuffle ALL of it to one
    // partition. The rank window then runs over just the 10 survivors
    // (the t11 pattern; PlanAuditSpec pins the shape).
    val top = groups.orderBy($"n_docs".desc, $"ht").limit(10)
    val w = Window.orderBy($"n_docs".desc, $"ht")
    top.withColumn("rank", row_number().over(w))
      .select($"rank", $"n_docs", $"n_distinct_texts", $"n_sources", $"example_doc")
      .orderBy($"rank")
  }

  def d17(s: SparkSession, dir: String): DataFrame =
    templateGroups(Tables.t(s, dir, "documents"))

  val d17Sql: String =
    """WITH tpl AS (
      |  SELECT doc_id, source, md5(text) AS h,
      |    md5(regexp_replace(regexp_replace(text, '[0-9]+', '0', 'g'),
      |        ' +', ' ', 'g')) AS ht
      |  FROM documents),
      |groups AS (
      |  SELECT ht, COUNT(*) AS n_docs,
      |    COUNT(DISTINCT h) AS n_distinct_texts,
      |    COUNT(DISTINCT source) AS n_sources,
      |    MIN(doc_id) AS example_doc
      |  FROM tpl GROUP BY ht
      |  HAVING COUNT(DISTINCT h) > 1),
      |ranked AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY n_docs DESC, ht) AS INTEGER) AS rank
      |  FROM groups)
      |SELECT rank, n_docs, n_distinct_texts, n_sources, example_doc
      |FROM ranked WHERE rank <= 10 ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- d18
  /** Split-leakage audit — the held-out-integrity check run AFTER
    * deduplication and splitting: does any near-duplicate pair straddle
    * the t08 train/valid/test boundary? A test doc with a train-side
    * twin inflates eval scores without a single verbatim n-gram; this
    * reports, per (split, split) boundary, how many near-dup pairs
    * cross it, how many docs sit on each side, and the smallest example
    * pair for triage.
    *
    * Scale (100 TB): the pair set (d02's output) is ≪ corpus, and the
    * split assignment is a pure hash of doc_id computed inline — the
    * join carries only (id, split). Kernel split out so specs can pin
    * boundaries the synthetic corpus's pair set may not cross. */
  private[graft] def splitLeakage(pairs: DataFrame, splits: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val a = splits.select($"doc_id".as("da"), $"split".as("sa"))
    val b = splits.select($"doc_id".as("db"), $"split".as("sb"))
    pairs.join(a, Seq("da")).join(b, Seq("db"))
      .filter($"sa" =!= $"sb")
      .select(
        when($"sa" <= $"sb", $"sa").otherwise($"sb").as("split_a"),
        when($"sa" <= $"sb", $"sb").otherwise($"sa").as("split_b"),
        when($"sa" <= $"sb", $"da").otherwise($"db").as("doc_a"),
        when($"sa" <= $"sb", $"db").otherwise($"da").as("doc_b"))
      .groupBy($"split_a", $"split_b")
      .agg(
        count(lit(1)).as("n_leak_pairs"),
        countDistinct($"doc_a").as("n_docs_a"),
        countDistinct($"doc_b").as("n_docs_b"),
        min(struct($"doc_a", $"doc_b")).as("ex"))
      .select($"split_a", $"split_b", $"n_leak_pairs",
        $"n_docs_a", $"n_docs_b",
        $"ex.doc_a".as("example_a"), $"ex.doc_b".as("example_b"))
      .orderBy($"split_a", $"split_b")
  }

  def d18(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val splits = Tables.t(s, dir, "documents")
      .select($"doc_id", TextAnalysis.md5Bucket($"doc_id", "").as("bucket"))
      .withColumn("split",
        when($"bucket" < 90, "train")
          .when($"bucket" < 95, "valid")
          .otherwise("test"))
      .select($"doc_id", $"split")
    splitLeakage(jaccardPairs(s, dir, 0.5), splits)
  }

  val d18Sql: String =
    """WITH words AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh0 AS MATERIALIZED (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |df AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s),
      |sh AS MATERIALIZED (SELECT doc_id, sh0.s FROM sh0 JOIN df ON sh0.s = df.s
      |       WHERE df.df <= 1000),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id),
      |pairs AS (SELECT da, db FROM inter
      |          JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      |          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
      |splits AS (
      |  SELECT doc_id,
      |    CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'valid'
      |         ELSE 'test' END AS split
      |  FROM (SELECT doc_id,
      |          CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ''), 1, 6)
      |            AS BIGINT) % 100 AS BIGINT) AS b
      |        FROM documents)),
      |crossed AS (
      |  SELECT
      |    CASE WHEN x.split <= y.split THEN x.split ELSE y.split END AS split_a,
      |    CASE WHEN x.split <= y.split THEN y.split ELSE x.split END AS split_b,
      |    CASE WHEN x.split <= y.split THEN p.da ELSE p.db END AS doc_a,
      |    CASE WHEN x.split <= y.split THEN p.db ELSE p.da END AS doc_b
      |  FROM pairs p
      |  JOIN splits x ON p.da = x.doc_id
      |  JOIN splits y ON p.db = y.doc_id
      |  WHERE x.split <> y.split)
      |SELECT split_a, split_b,
      |  COUNT(*) AS n_leak_pairs,
      |  COUNT(DISTINCT doc_a) AS n_docs_a,
      |  COUNT(DISTINCT doc_b) AS n_docs_b,
      |  MIN(doc_a) AS example_a,
      |  MIN(CASE WHEN doc_a = m THEN doc_b END) AS example_b
      |FROM (SELECT *, MIN(doc_a) OVER (PARTITION BY split_a, split_b) AS m
      |      FROM crossed)
      |GROUP BY split_a, split_b ORDER BY split_a, split_b""".stripMargin

  // ---------------------------------------------------------------- d21
  /** MinHash banding sweep: candidate yield, precision, and recall of the
    * (b, r) layouts 32×2 / 16×4 / 8×8 over ONE 64-perm signature table —
    * the LSH knob-tuning curve (d15 sweeps the Jaccard threshold; this
    * sweeps the sketch geometry that decides which pairs are even
    * LOOKED at). More rows per band (larger r) collapses the candidate
    * set and the false-positive rate but loses borderline dups; this op
    * emits the whole trade so d03's config is a measurement, not a
    * guess.
    *
    * Determinism: signatures are the same integer-mod-P permutations as
    * d03 in both engines; candidate membership is set equality on exact
    * integers; precision/recall are int64 floor ppm against the exact
    * Jaccard ≥ 0.5 truth set.
    *
    * Scale (100 TB): the signature table is ONE narrow scan (compiled
    * MinHash64 kernel); each config exchanges only short band keys.
    * The exact-Jaccard truth side IS d02's full pair enumeration — this
    * is an audit, priced like d12/s06: run on a sampled slice at full
    * scale, never as a standing pipeline stage. */
  def d21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docsArr = shingleArrays(s, dir)
    val perDoc = docsArr.select($"doc_id",
      graft.functions.ShingleKernels.minHash64($"arr").as("sigs"))
      .localCheckpoint(eager = false) // reused by all three band layouts
    // exact pairs with their dup verdict — reused per config AND for the
    // truth total
    val exact = pairStats(docsArr)
      .withColumn("jac", dbl($"i") / ($"na" + $"nb" - $"i"))
      .select($"da".as("ea"), $"db".as("eb"), ($"jac" >= 0.5).as("is_dup"))
      .localCheckpoint(eager = false)
    val truth = exact.agg(
      coalesce(sum(when($"is_dup", 1L).otherwise(0L)), lit(0L)).as("n_truth"))
    val perConfig = Seq(2, 4, 8).map { r =>
      val nBands = 64 / r
      // key = band index ':' r signature values — engine-internal
      // representation; only candidate-set membership must match
      val keys = (0 until nBands).map { b =>
        concat_ws(":",
          lit(b) +: (0 until r).map(k => element_at($"sigs", b * r + k + 1)): _*)
      }
      val bands = perDoc
        .select($"doc_id", explode(array(keys: _*)).as("key"))
      val cand = bands.as("a").hint("SHUFFLE_HASH")
        .join(bands.as("b").hint("SHUFFLE_HASH"),
          col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
      cand
        .join(exact, $"da" === $"ea" && $"db" === $"eb", "left")
        .agg(
          count(lit(1)).as("n_candidates"),
          coalesce(sum(when($"is_dup", 1L).otherwise(0L)), lit(0L))
            .as("n_true_dups"))
        .select(lit(r.toLong).as("rows_per_band"), $"n_candidates", $"n_true_dups")
    }.reduce(_ union _)
    perConfig.crossJoin(truth)
      .select(
        $"rows_per_band", $"n_candidates", $"n_true_dups", $"n_truth",
        expr("""CASE WHEN n_candidates > 0
          THEN (n_true_dups * 1000000) div n_candidates END""")
          .as("precision_ppm"),
        expr("""CASE WHEN n_truth > 0
          THEN (n_true_dups * 1000000) div n_truth END""").as("recall_ppm"))
      .orderBy($"rows_per_band")
  }

  /** Signatures mirror the kernel's RAW shingle input (sh0); the exact
    * truth side mirrors d02's PRUNED (df ≤ 1000) shingle space — same
    * split as the Spark op (minHash64 over raw arrays, pairStats for
    * truth). */
  val d21Sql: String =
    """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |shh AS (SELECT doc_id, list_reduce(list_transform(string_split(s, ''),
      |          c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a * 31 + b) % 1000000007) AS h
      |        FROM sh0),
      |sig AS (SELECT doc_id, j, min(((2 * j + 1) * h + j) % 1000000007) AS sig
      |        FROM shh, UNNEST(generate_series(0, 63)) AS u(j) GROUP BY doc_id, j),
      |bands AS (SELECT rr.r, doc_id,
      |            CONCAT(CAST(j // rr.r AS VARCHAR), ':',
      |              string_agg(CAST(sig AS VARCHAR), ':' ORDER BY j)) AS key
      |          FROM sig, (VALUES (2), (4), (8)) AS rr(r)
      |          GROUP BY rr.r, doc_id, j // rr.r),
      |cand AS (SELECT DISTINCT a.r, a.doc_id AS da, b.doc_id AS db
      |         FROM bands a JOIN bands b
      |           ON a.r = b.r AND a.key = b.key AND a.doc_id < b.doc_id),
      |df AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s),
      |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN df ON sh0.s = df.s
      |       WHERE df.df <= 1000),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id),
      |exact AS (SELECT da, db,
      |            CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5 AS is_dup
      |          FROM inter JOIN sizes sa ON da = sa.doc_id
      |                     JOIN sizes sb ON db = sb.doc_id),
      |truth AS (SELECT CAST(COALESCE(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END), 0)
      |            AS BIGINT) AS n_truth FROM exact),
      |per AS (SELECT c.r AS rows_per_band,
      |          CAST(COUNT(*) AS BIGINT) AS n_candidates,
      |          CAST(COALESCE(SUM(CASE WHEN COALESCE(e.is_dup, false)
      |            THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_true_dups
      |        FROM cand c LEFT JOIN exact e ON c.da = e.da AND c.db = e.db
      |        GROUP BY c.r)
      |SELECT CAST(rows_per_band AS BIGINT) AS rows_per_band,
      |  n_candidates, n_true_dups, n_truth,
      |  CASE WHEN n_candidates > 0
      |    THEN (n_true_dups * 1000000) // n_candidates END AS precision_ppm,
      |  CASE WHEN n_truth > 0
      |    THEN (n_true_dups * 1000000) // n_truth END AS recall_ppm
      |FROM per, truth ORDER BY rows_per_band""".stripMargin

  // ---------------------------------------------------------------- d20
  /** Lexical-vs-semantic dedup agreement audit: the pair set flagged by
    * shingle Jaccard ≥ 0.5 (d02) against the pair set flagged by
    * label-blocked embedding cosine ≥ 0.4 (s03; vec_id ≡ doc_id, the
    * d13 linkage) — n_both / lexical-only / semantic-only plus the
    * pair-set Jaccard in ppm. The two detectors see DIFFERENT dup
    * classes (verbatim quotes vs paraphrases); this is the meter that
    * says whether running both is redundant or complementary, i.e.
    * whether the curation funnel (d14) may drop one stage.
    *
    * Determinism: both inputs are oracle-gated ops; membership flags and
    * counts are integers; overlap_ppm is int64 floor division guarded
    * against the empty union (NULL, not an error, when both sets are
    * empty).
    *
    * Scale (100 TB): the full-outer join keys on the (lo, hi) pair id
    * and touches ONLY the two flagged-pair sets — outputs already
    * bounded by their ops' cuts (stop-shingle df ≤ 1000, label
    * blocking) — never a corpus. One shuffle of each pair set, one
    * scalar aggregate. */
  def d20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lex = jaccardPairs(s, dir, 0.5)
      .select($"da", $"db", lit(1L).as("in_lex"))
    val sem = Similarity.s03(s, dir)
      .select($"va", $"vb", lit(1L).as("in_sem"))
    lex.join(sem, $"da" === $"va" && $"db" === $"vb", "full_outer")
      .select(
        ($"in_lex".isNotNull && $"in_sem".isNotNull).cast(LongType).as("b"),
        ($"in_lex".isNotNull && $"in_sem".isNull).cast(LongType).as("lo"),
        ($"in_lex".isNull && $"in_sem".isNotNull).cast(LongType).as("so"))
      .agg(
        coalesce(sum($"b"), lit(0L)).as("n_both"),
        coalesce(sum($"lo"), lit(0L)).as("n_lexical_only"),
        coalesce(sum($"so"), lit(0L)).as("n_semantic_only"))
      .select($"n_both", $"n_lexical_only", $"n_semantic_only",
        expr("""CASE WHEN n_both + n_lexical_only + n_semantic_only > 0
          THEN (n_both * 1000000)
            div (n_both + n_lexical_only + n_semantic_only) END""")
          .as("overlap_ppm"))
  }

  val d20Sql: String = {
    val dotted = Similarity.dotSql("a.embedding", "b.embedding")
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
       |df AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s),
       |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN df ON sh0.s = df.s
       |       WHERE df.df <= 1000),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY a.doc_id, b.doc_id),
       |lex AS (SELECT da, db
       |        FROM inter JOIN sizes sa ON da = sa.doc_id
       |                   JOIN sizes sb ON db = sb.doc_id
       |        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
       |v AS (SELECT vec_id, label, embedding,
       |      sqrt(${Similarity.dotSql("embedding", "embedding")}) AS norm
       |      FROM embeddings),
       |sem AS (SELECT a.vec_id AS va, b.vec_id AS vb
       |        FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
       |        WHERE $dotted / (a.norm * b.norm) >= 0.4),
       |j AS (SELECT
       |        CAST(CASE WHEN lex.da IS NOT NULL AND sem.va IS NOT NULL
       |          THEN 1 ELSE 0 END AS BIGINT) AS b,
       |        CAST(CASE WHEN lex.da IS NOT NULL AND sem.va IS NULL
       |          THEN 1 ELSE 0 END AS BIGINT) AS lo,
       |        CAST(CASE WHEN lex.da IS NULL AND sem.va IS NOT NULL
       |          THEN 1 ELSE 0 END AS BIGINT) AS so
       |      FROM lex FULL OUTER JOIN sem ON da = va AND db = vb)
       |SELECT CAST(COALESCE(SUM(b), 0) AS BIGINT) AS n_both,
       |  CAST(COALESCE(SUM(lo), 0) AS BIGINT) AS n_lexical_only,
       |  CAST(COALESCE(SUM(so), 0) AS BIGINT) AS n_semantic_only,
       |  CAST(CASE WHEN COALESCE(SUM(b), 0) + COALESCE(SUM(lo), 0)
       |         + COALESCE(SUM(so), 0) > 0
       |    THEN (COALESCE(SUM(b), 0) * 1000000)
       |      // (COALESCE(SUM(b), 0) + COALESCE(SUM(lo), 0)
       |          + COALESCE(SUM(so), 0)) END AS BIGINT) AS overlap_ppm
       |FROM j""".stripMargin
  }

  // ---------------------------------------------------------------- d22
  /** Shared-prefix boilerplate families: documents whose first 200
    * characters hash identically but whose FULL texts differ — the
    * "same header, different payload" pattern (scraped article pages,
    * license preambles, generated reports) that exact dedup (d01) misses
    * by construction and shingle Jaccard (d02) only catches when the
    * shared prefix dominates the document. A family with many sources is
    * syndicated boilerplate; one source is a template mill (cf. d17,
    * which masks DIGITS — this keys on position instead and survives
    * arbitrary suffix divergence).
    *
    * Determinism: pure exact hashing and integer counts; first_doc is a
    * total order (a doc belongs to exactly one prefix family).
    *
    * Scale (100 TB): the exchange carries only 16-byte md5 keys (d01's
    * argument — text never shuffles); the distinct counts expand the
    * hash rows 3×, a constant factor on fixed-width rows, and the
    * HAVING filter prunes the (already tiny) family table before the
    * output sort. */
  def d22(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "documents")
      .select($"doc_id", $"source",
        md5(substring($"text", 1, 200).cast(BinaryType)).as("prefix_h"),
        md5($"text".cast(BinaryType)).as("fh"))
      .groupBy($"prefix_h")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct($"fh").as("n_distinct"),
        countDistinct($"source").as("n_sources"),
        min($"doc_id").as("first_doc"))
      .filter($"n_docs" >= 2 && $"n_distinct" >= 2)
      .orderBy($"first_doc")
  }

  val d22Sql: String =
    """SELECT md5(substr(text, 1, 200)) AS prefix_h,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
      |  MIN(doc_id) AS first_doc
      |FROM documents GROUP BY 1
      |HAVING COUNT(*) >= 2 AND COUNT(DISTINCT md5(text)) >= 2
      |ORDER BY first_doc""".stripMargin

  // ---------------------------------------------------------------- d23
  /** Block-level near-dup pairs: document similarity over DISTINCT
    * 10-word chunk sets (d08's tiling) with Jaccard ≥ 0.3 — the tier
    * between d08 (which scores chunks but never pairs documents) and
    * d02 (whose 3-gram shingles light up on any shared phrasing): two
    * documents connect here only when a substantial fraction of their
    * verbatim BLOCKS coincide — the compilation/re-release/partial-copy
    * pattern where half a document is lifted wholesale and the rest is
    * new. The lower 0.3 cutoff is deliberate: block overlap is a much
    * stronger signal per unit of Jaccard than shingle overlap.
    *
    * Scale (100 TB): [[pairStats]]' inverted-index shape on the chunk
    * space — ~1/10th the posting entries of the shingle index for the
    * same corpus, with the same df ≤ 1000 stop-chunk cut bounding hot
    * boilerplate fan-out. Nothing here is all-pairs. */
  def d23(s: SparkSession, dir: String): DataFrame =
    chunkJaccardPairs(Tables.t(s, dir, "documents"))

  /** d23's kernel over any (doc_id, text) frame — split out so the spec
    * can pin the block-overlap arithmetic on constructed documents. */
  private[graft] def chunkJaccardPairs(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val chunkArrs = docs
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 10)
      .select($"doc_id", array_distinct(expr(
        "transform(sequence(0, size(ws) div 10 - 1), " +
          "i -> concat_ws(' ', slice(ws, 10*i + 1, 10)))")).as("arr"))
    pairStats(chunkArrs)
      .withColumn("jac", dbl($"i") / ($"na" + $"nb" - $"i"))
      .filter($"jac" >= 0.3)
      .select($"da", $"db", $"i".as("n_shared_chunks"),
        round($"jac", 6).as("jaccard"))
      .orderBy($"da", $"db")
  }

  val d23Sql: String =
    """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |ch0 AS (SELECT DISTINCT doc_id,
      |    array_to_string(ws[10*i + 1:10*i + 10], ' ') AS c
      |  FROM words, UNNEST(generate_series(0, len(ws) // 10 - 1)) AS t(i)
      |  WHERE len(ws) >= 10),
      |cdf AS (SELECT c, COUNT(*) AS df FROM ch0 GROUP BY c),
      |ch AS (SELECT doc_id, ch0.c FROM ch0 JOIN cdf ON ch0.c = cdf.c
      |       WHERE cdf.df <= 1000),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM ch GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM ch a JOIN ch b ON a.c = b.c AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id)
      |SELECT da, db, CAST(i AS BIGINT) AS n_shared_chunks,
      |  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
      |FROM inter JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.3
      |ORDER BY da, db""".stripMargin

  // ---------------------------------------------------------------- d24
  /** Exact-substring duplication coverage — the window-level dedup
    * measure of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better" (arXiv:2107.06499), at word granularity: every
    * ROLLING 10-word window of every document (stride 1 — unlike d08's
    * stride-10 tiling, no duplicated span can fall between window
    * boundaries), a window TYPE is "duplicated" when it appears in ≥ 2
    * distinct documents, and each source is scored by how much of its
    * distinct window space is duplicated text. `n_mostly_dup_docs`
    * counts documents where duplicated types are a strict majority —
    * the rows an exact-substring dedup pass would rewrite or drop.
    *
    * Determinism: exact string windows, integer counts, floor-div ppm;
    * no floats anywhere.
    *
    * Scale (100 TB): windows come from the fused tokenize+shingle
    * kernel ([[graft.functions.ShingleKernels.shinglesText]]) — one
    * compiled pass, no word-array materialization; the df count is a
    * map-side-combining COUNT(DISTINCT doc) per gram (no posting-list
    * buffering anywhere — unlike the pair generators this op never
    * needs WHICH docs share a window, so no CappedCollect and no τ
    * fan-out bound is involved); the doc-level rollup joins the
    * (already df-filtered) duplicated-gram set back on the gram key —
    * both sides hash-partitioned on gram, sized by AQE. Index keys stay
    * raw gram strings for oracle parity; at 100 TB the production move
    * is hashing them to int64 before the exchange (see
    * [[allPostings]]' note — same trade). */
  def d24(s: SparkSession, dir: String): DataFrame =
    dupSpanCoverage(Tables.t(s, dir, "documents"))

  /** d24's kernel over any (doc_id, source, text) frame — split out so
    * the spec can pin the rolling-window and majority arithmetic. */
  private[graft] def dupSpanCoverage(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // DISTINCT rolling 10-grams per doc (the kernel dedups in its one
    // pass); lazily checkpointed — consumed by the df count AND the
    // per-doc size projection
    val arrs = docs
      .select($"doc_id", $"source",
        graft.functions.ShingleKernels.shinglesText($"text", 10).as("arr"))
      .filter(size($"arr") > 0)
      .localCheckpoint(eager = false)
    val g = arrs.select($"doc_id", explode($"arr").as("gram"))
    val dup = g.groupBy($"gram")
      .agg(countDistinct($"doc_id").as("df"))
      .filter($"df" >= 2)
      .select($"gram")
    val perDocDup = g.join(dup, Seq("gram"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_dup"))
    arrs
      .select($"doc_id", $"source", size($"arr").cast(LongType).as("n_types"))
      .join(perDocDup, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup"))
      .groupBy($"source")
      .agg(
        sum($"n_types").as("total_grams"),
        sum($"n_dup").as("dup_grams"),
        sum(when(lit(2) * $"n_dup" > $"n_types", 1L).otherwise(0L))
          .as("n_mostly_dup_docs"))
      .select($"source", $"total_grams", $"dup_grams",
        expr("(1000000 * dup_grams) div total_grams").as("dup_ppm"),
        $"n_mostly_dup_docs")
      .orderBy($"source")
  }

  val d24Sql: String =
    """WITH ws AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
      |g AS (
      |  SELECT doc_id, source, unnest(list_distinct(list_transform(
      |    range(len(w) - 9), i -> array_to_string(w[i+1:i+10], ' '))))
      |    AS gram
      |  FROM ws WHERE len(w) >= 10),
      |dup AS (
      |  SELECT gram FROM g GROUP BY gram
      |  HAVING COUNT(DISTINCT doc_id) >= 2),
      |pd AS (
      |  SELECT doc_id, COUNT(*) AS n_dup
      |  FROM g JOIN dup USING (gram) GROUP BY doc_id),
      |d AS (
      |  SELECT g.source, g.doc_id, COUNT(*) AS n_types,
      |    COALESCE(ANY_VALUE(pd.n_dup), 0) AS n_dup
      |  FROM g LEFT JOIN pd USING (doc_id)
      |  GROUP BY g.source, g.doc_id)
      |SELECT source,
      |  CAST(SUM(n_types) AS BIGINT) AS total_grams,
      |  CAST(SUM(n_dup) AS BIGINT) AS dup_grams,
      |  CAST((1000000 * SUM(n_dup)) // SUM(n_types) AS BIGINT) AS dup_ppm,
      |  CAST(SUM(CASE WHEN 2 * n_dup > n_types THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_mostly_dup_docs
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- d25
  /** Sharded-dedup consistency audit — the quantified version of the
    * core 100 TB dedup design rule: a corpus sharded by INGESTION ID
    * (`doc_id mod 8` here — the layout data arrives in) and deduped
    * within shards only silently misses every near-dup pair that
    * straddles shards. This op counts them over the d02 pair set: of
    * all Jaccard ≥ 0.5 pairs, how many have both members in one shard
    * (the only ones a shard-local pass can see) vs across shards.
    * A large `missed_ppm` IS the argument for partitioning by CONTENT —
    * shingle keys (d02's inverted index) or band keys (d03's LSH) —
    * which routes every colliding pair to one reducer regardless of
    * where the documents live.
    *
    * Determinism: the pair set is d02's (exact integer intersections);
    * shard math and ppm are integer floor-div.
    *
    * Scale (100 TB): the audit adds one scalar aggregate over the
    * already-bounded pair set — free next to the pair generation it
    * piggybacks on (shared inverted-index substrate, τ-capped fan-out). */
  val DedupShards = 8

  def d25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    shardConsistency(jaccardPairs(s, dir, 0.5))
  }

  /** d25's kernel over any (da, db) pair frame — split out so the spec
    * can pin the pair arithmetic on constructed shard layouts. */
  private[graft] def shardConsistency(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    pairs
      .select(($"da" % DedupShards === $"db" % DedupShards)
        .cast(LongType).as("within"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum($"within").as("within_shard_pairs"))
      .select($"n_pairs", $"within_shard_pairs",
        ($"n_pairs" - $"within_shard_pairs").as("cross_shard_pairs"),
        expr("(1000000 * (n_pairs - within_shard_pairs)) div n_pairs")
          .as("missed_ppm"))
  }

  /** Oracle: d02's pair CTE (stop-shingle cut included) + shard math. */
  val d25Sql: String =
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
       |df AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s),
       |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN df ON sh0.s = df.s
       |       WHERE df.df <= 1000),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY a.doc_id, b.doc_id),
       |pairs AS (
       |  SELECT da, db FROM inter
       |  JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
       |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
       |w AS (SELECT CASE WHEN da % $DedupShards = db % $DedupShards
       |        THEN 1 ELSE 0 END AS within FROM pairs)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(within) AS BIGINT) AS within_shard_pairs,
       |  CAST(COUNT(*) - SUM(within) AS BIGINT) AS cross_shard_pairs,
       |  CAST((1000000 * (COUNT(*) - SUM(within))) // COUNT(*) AS BIGINT)
       |    AS missed_ppm
       |FROM w""".stripMargin

  // ---------------------------------------------------------------- d26
  /** Incremental dedup against history — the DAILY-INGEST shape: a new
    * batch (odd doc_ids here) is probed against the already-accepted
    * corpus (even doc_ids), never corpus-vs-corpus. Tiers mirror the
    * production ladder: a new doc is `exact_hist` when its md5 matches
    * any historical doc (16-byte semi-join probe), else `near_hist`
    * when it has a Jaccard ≥ 0.5 shingle pair with a historical doc
    * (the batch-audit form of what [[graft.streaming.Streams
    * .nearDupIngest]]'s persistent band index decides per micro-batch),
    * else fresh. Per-source fresh ppm is the number ingestion dashboards
    * watch: a crash says the crawler is re-fetching yesterday.
    *
    * Scale (100 TB): the exact probe is a hash semi-join on digests
    * (history side is the big one — it stays hash-partitioned, the
    * batch streams); the near tier rides the shared inverted-index
    * pair substrate restricted to cross-parity pairs; nothing here
    * rescans history text. Both tiers derive from ONE pinned scan of
    * documents (md5 digest AND shingle array computed side by side in
    * the same narrow projection) — the round-12 shape paid four
    * text-column scans for the same answer. In production the near
    * tier probes the persisted BAND-KEY index instead of re-deriving
    * pairs — same decisions, index-sized state (the streaming twin
    * does exactly that). */
  def d26(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one scan, one kernel pass, pinned: digests for the exact tier,
    // shingle arrays for the near tier, (doc_id, source) for the rollup
    val base = Tables.t(s, dir, "documents")
      .select($"doc_id", $"source",
        md5($"text".cast(BinaryType)).as("h"),
        graft.functions.ShingleKernels.shinglesText($"text", 3).as("arr"))
      .localCheckpoint(eager = false)
    val withH = base.select($"doc_id", $"source", $"h")
    val hist = withH.filter($"doc_id" % 2 === 0)
    val batch = withH.filter($"doc_id" % 2 === 1)
    val exactIds = batch.join(hist.select($"h").distinct(), Seq("h"), "left_semi")
      .select($"doc_id")
    // cross-parity near-dup pairs: the odd side is the new doc. The <3
    // word empty-array filter mirrors shinglesOfDocs (no shingles, no
    // pairs — identical to the oracle's empty generate_series).
    // crossParityOnly: same-parity pairs would be filtered right back
    // out, so the substrate never generates them (halves the pair
    // shuffle; the oracle computes the full space then filters — same
    // surviving set either way)
    val nearIds = jaccardPairsOf(
        base.select($"doc_id", $"arr").filter(size($"arr") > 0), 0.5,
        crossParityOnly = true)
      .filter($"da" % 2 =!= $"db" % 2)
      .select(when($"da" % 2 === 1, $"da").otherwise($"db").as("doc_id"))
      .distinct()
    batch
      .join(exactIds.withColumn("is_exact", lit(1L)), Seq("doc_id"), "left")
      .join(nearIds.withColumn("is_near", lit(1L)), Seq("doc_id"), "left")
      .na.fill(0L, Seq("is_exact", "is_near"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_new"),
        sum($"is_exact").as("n_exact_hist"),
        sum(when($"is_exact" === 0 && $"is_near" === 1, 1L).otherwise(0L))
          .as("n_near_hist"),
        sum(when($"is_exact" === 0 && $"is_near" === 0, 1L).otherwise(0L))
          .as("n_fresh"))
      .select($"source", $"n_new", $"n_exact_hist", $"n_near_hist", $"n_fresh",
        expr("(1000000 * n_fresh) div n_new").as("fresh_ppm"))
      .orderBy($"source")
  }

  val d26Sql: String =
    """WITH d AS (SELECT doc_id, source, md5(text) AS h FROM documents),
      |hist AS (SELECT * FROM d WHERE doc_id % 2 = 0),
      |batch AS (SELECT * FROM d WHERE doc_id % 2 = 1),
      |ex AS (SELECT DISTINCT b.doc_id FROM batch b
      |       JOIN hist x ON b.h = x.h),
      |words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |df AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s),
      |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN df ON sh0.s = df.s
      |       WHERE df.df <= 1000),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id),
      |near AS (SELECT DISTINCT
      |    CASE WHEN da % 2 = 1 THEN da ELSE db END AS doc_id
      |  FROM inter
      |  JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
      |    AND da % 2 <> db % 2),
      |f AS (SELECT b.source,
      |    CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_exact,
      |    CASE WHEN near.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_near
      |  FROM batch b LEFT JOIN ex ON b.doc_id = ex.doc_id
      |  LEFT JOIN near ON b.doc_id = near.doc_id)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_new,
      |  CAST(SUM(is_exact) AS BIGINT) AS n_exact_hist,
      |  CAST(SUM(CASE WHEN is_exact = 0 AND is_near = 1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_near_hist,
      |  CAST(SUM(CASE WHEN is_exact = 0 AND is_near = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_fresh,
      |  CAST((1000000 * SUM(CASE WHEN is_exact = 0 AND is_near = 0
      |    THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT) AS fresh_ppm
      |FROM f GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- d27
  /** Keeper-choice sensitivity — how much the lowest-id survivor
    * convention (d07's, and most pipelines') leaves on the table: per
    * near-dup cluster, compare the id-keeper against a QUALITY keeper
    * (most distinct tokens, ties to the lowest id — an integer key, so
    * the choice is total and engine-exact) and report how many clusters
    * would pick differently plus the distinct-token mass each policy
    * retains. A high differs-share says the dedup stage should rank
    * survivors by quality (t02/t37 signals) rather than arrival order.
    *
    * Scale (100 TB): the cluster set is pairs-sized (≪ corpus); the
    * per-doc quality key computes in the scan, clusters group on the
    * component id, and the final rollup is one row — same broadcast
    * geometry as d07. */
  def d27(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val comp = GraphOps.components(jaccardPairs(s, dir, 0.5))
    val stats = Tables.t(s, dir, "documents")
      .select($"doc_id",
        size(array_distinct(split($"text", " "))).cast(LongType).as("n_dist"))
    val member = comp.join(stats, Seq("doc_id"))
    val wQ = Window.partitionBy($"component")
      .orderBy($"n_dist".desc, $"doc_id".asc)
    val wId = Window.partitionBy($"component").orderBy($"doc_id".asc)
    val keepers = member
      .withColumn("rn_q", row_number().over(wQ))
      .withColumn("rn_id", row_number().over(wId))
    val q = keepers.filter($"rn_q" === 1)
      .select($"component", $"doc_id".as("q_keeper"), $"n_dist".as("q_tokens"))
    val i = keepers.filter($"rn_id" === 1)
      .select($"component", $"doc_id".as("id_keeper"), $"n_dist".as("id_tokens"))
    q.join(i, Seq("component"))
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(($"q_keeper" =!= $"id_keeper").cast(LongType)).as("n_differs"),
        sum($"id_tokens").as("tokens_id_policy"),
        sum($"q_tokens").as("tokens_quality_policy"))
      .select($"n_clusters", $"n_differs", $"tokens_id_policy",
        $"tokens_quality_policy",
        expr("(1000000 * (tokens_quality_policy - tokens_id_policy)) " +
          "div tokens_id_policy").as("token_gain_ppm"))
  }

  /** Oracle: d07's recursive components + window keeper picks. */
  val d27Sql: String =
    """WITH RECURSIVE words AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |df AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s),
      |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN df ON sh0.s = df.s
      |       WHERE df.df <= 1000),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id),
      |edges AS (SELECT da, db FROM inter
      |          JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      |          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
      |sym AS (SELECT da, db FROM edges UNION SELECT db, da FROM edges),
      |nodes AS (SELECT DISTINCT da AS doc_id FROM sym),
      |reach(src, dst) AS (
      |  SELECT doc_id, doc_id FROM nodes
      |  UNION
      |  SELECT r.src, e.db FROM reach r JOIN sym e ON r.dst = e.da),
      |comp AS (SELECT src AS doc_id, min(dst) AS component
      |         FROM reach GROUP BY src),
      |member AS (
      |  SELECT c.component, c.doc_id,
      |    len(list_distinct(string_split(d.text, ' '))) AS n_dist
      |  FROM comp c JOIN documents d ON c.doc_id = d.doc_id),
      |ranked AS (SELECT *,
      |    row_number() OVER (PARTITION BY component
      |      ORDER BY n_dist DESC, doc_id ASC) AS rn_q,
      |    row_number() OVER (PARTITION BY component
      |      ORDER BY doc_id ASC) AS rn_id
      |  FROM member),
      |q AS (SELECT component, doc_id AS q_keeper, n_dist AS q_tokens
      |      FROM ranked WHERE rn_q = 1),
      |i AS (SELECT component, doc_id AS id_keeper, n_dist AS id_tokens
      |      FROM ranked WHERE rn_id = 1)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
      |  CAST(SUM(CASE WHEN q_keeper <> id_keeper THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_differs,
      |  CAST(SUM(id_tokens) AS BIGINT) AS tokens_id_policy,
      |  CAST(SUM(q_tokens) AS BIGINT) AS tokens_quality_policy,
      |  CAST((1000000 * (SUM(q_tokens) - SUM(id_tokens))) // SUM(id_tokens)
      |    AS BIGINT) AS token_gain_ppm
      |FROM q JOIN i USING (component)""".stripMargin

  // ---------------------------------------------------------------- d28
  /** Pair evidence: for every near-dup pair (Jaccard ≥ 0.5), the 3
    * RAREST shared shingles (df asc, shingle asc) — the human-review
    * artifact behind a dedup decision. A pair whose rarest shared
    * evidence still has high df was glued by common phrasing (d17/d22
    * territory); singleton-df evidence is verbatim copying. This is what
    * a curation UI shows next to d02's bare score.
    *
    * Determinism: df is an exact integer, ranking totally ordered by
    * (df, shingle); output keyed (da, db, rank).
    *
    * Scale (100 TB): the shared-shingle stream is pairStats' inverted-
    * index pair generation with the shingle kept — the same one-index-
    * shuffle economics and τ² fan-out bound; the qualifying-pair
    * semi-join cuts it to near-dup pairs BEFORE the per-pair window,
    * which partitions on the pair key (perfectly spread). */
  def d28(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val post = allPostings(shingleArrays(s, dir), StopShingleDf)
      .filter(size($"ds") <= StopShingleDf)
    val shared = post
      .select($"s", size($"ds").cast(LongType).as("df"), $"ds")
      .select($"s", $"df", explode($"ds").as("da"), $"ds")
      .select($"s", $"df", $"da", explode($"ds").as("db"))
      .filter($"da" < $"db")
    val qualifying = jaccardPairs(s, dir, 0.5).select($"da", $"db")
    val w = Window.partitionBy($"da", $"db").orderBy($"df".asc, $"s".asc)
    shared
      .join(qualifying, Seq("da", "db"), "left_semi")
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"da", $"db", $"rank", $"s".as("shingle"), $"df")
      .orderBy($"da", $"db", $"rank")
  }

  val d28Sql: String =
    """WITH words AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |df AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s),
      |sh AS (SELECT doc_id, sh0.s, df.df FROM sh0 JOIN df ON sh0.s = df.s
      |       WHERE df.df <= 1000),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id),
      |edges AS (SELECT da, db FROM inter
      |          JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      |          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
      |shared AS (SELECT a.doc_id AS da, b.doc_id AS db, a.s,
      |             CAST(a.df AS BIGINT) AS df
      |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |           JOIN edges e ON e.da = a.doc_id AND e.db = b.doc_id),
      |ranked AS (SELECT *, CAST(row_number() OVER (
      |    PARTITION BY da, db ORDER BY df ASC, s ASC) AS INTEGER) AS rank
      |  FROM shared)
      |SELECT da, db, rank, s AS shingle, df
      |FROM ranked WHERE rank <= 3
      |ORDER BY da, db, rank""".stripMargin

  // ---------------------------------------------------------------- d29
  /** Directional copy matrix — d11's symmetric overlap matrix given an
    * arrow: for every CROSS-source near-dup pair, the lower doc_id is
    * the earlier crawl (the corpus's ingestion-order proxy), so
    * (source-of-earlier → source-of-later) counts estimate who
    * originates and who syndicates. share_of_later_ppm answers "what
    * fraction of THIS source's duplicated intake comes from THAT
    * origin" — the provenance signal that decides which feed to
    * de-prioritize at the crawler, upstream of any dedup spend.
    *
    * Determinism: integer counts; ppm by floor division; ordered pair
    * keys.
    *
    * Scale (100 TB): pairs are the shared substrate; the source lookup
    * joins carry (doc_id, source) only and the matrix is |sources|²
    * rows with a window over that tiny frame. */
  def d29(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val srcs = Tables.t(s, dir, "documents").select($"doc_id", $"source")
    val w = Window.partitionBy($"src_later")
    jaccardPairs(s, dir, 0.5)
      .join(srcs.select($"doc_id".as("da"), $"source".as("src_earlier")), Seq("da"))
      .join(srcs.select($"doc_id".as("db"), $"source".as("src_later")), Seq("db"))
      .filter($"src_earlier" =!= $"src_later")
      .groupBy($"src_earlier", $"src_later")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("share_of_later_ppm",
        expr("(1000000 * n_pairs) div sum(n_pairs) over (partition by src_later)"))
      .orderBy($"src_earlier", $"src_later")
  }

  val d29Sql: String =
    """WITH words AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |df AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s),
      |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN df ON sh0.s = df.s
      |       WHERE df.df <= 1000),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id),
      |edges AS (SELECT da, db FROM inter
      |          JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      |          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
      |lab AS (SELECT e.da, e.db, x.source AS src_earlier, y.source AS src_later
      |        FROM edges e
      |        JOIN documents x ON e.da = x.doc_id
      |        JOIN documents y ON e.db = y.doc_id
      |        WHERE x.source <> y.source),
      |m AS (SELECT src_earlier, src_later, CAST(COUNT(*) AS BIGINT) AS n_pairs
      |      FROM lab GROUP BY 1, 2)
      |SELECT src_earlier, src_later, n_pairs,
      |  CAST((1000000 * n_pairs) // SUM(n_pairs) OVER (PARTITION BY src_later)
      |    AS BIGINT) AS share_of_later_ppm
      |FROM m ORDER BY src_earlier, src_later""".stripMargin

  // ---------------------------------------------------------------- d30
  /** Soft dedup — frequency-weighted downsampling instead of dropping
    * (the "SoftDeDup" reweighting idea: He et al. 2024, arXiv:2407.04126):
    * every document in an exact-duplicate cluster of size c keeps
    * sampling weight 1/c, so each distinct content contributes exactly
    * one effective document regardless of copy count, while all copies
    * stay available to the sampler. The report is the per-source budget
    * readout a mixture planner consumes: raw docs/tokens next to the
    * EFFECTIVE docs/tokens (in exact ppm, weight = 10⁶ div c) that
    * survive reweighting — the gap between the two columns is precisely
    * the over-counted duplicate mass d01 tallies, here priced in tokens.
    *
    * Determinism: counts and integer floor-div weights only; every doc
    * in a cluster shares c, so Σ tok·w folds to w·Σ tok per
    * (cluster, source) group — no float path anywhere.
    *
    * Scale (100 TB): two-level like d01 — the corpus collapses map-side
    * to distinct (md5 digest, source) groups BEFORE any exchange (a
    * megadup text is exactly the hot key that combine flattens, which
    * also kills the skew a doc-grain window over the digest would
    * re-create); cluster size c is a window sum over that collapsed
    * frame (second, much smaller exchange keyed by the 16-byte digest);
    * the final rollup is |sources| rows. Text never shuffles. */
  def d30(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val grp = Tables.t(s, dir, "documents")
      .select($"source",
        md5($"text".cast(BinaryType)).as("h"),
        size(split($"text", " ")).cast("long").as("tok"))
      .groupBy($"h", $"source")
      .agg(count(lit(1)).as("n"), sum($"tok").as("tok"))
    grp
      .withColumn("c", sum($"n").over(Window.partitionBy($"h")))
      .groupBy($"source")
      .agg(
        sum($"n").as("n_docs"),
        sum($"tok").as("raw_tokens"),
        sum(expr("n * (1000000 div c)")).as("eff_docs_ppm"),
        sum(expr("tok * (1000000 div c)")).as("eff_tokens_ppm"))
      .orderBy($"source")
  }

  /** Oracle mirrors the md5 cluster key (d01's rationale) and the
    * two-level fold, so both engines floor-divide identical integers. */
  val d30Sql: String =
    """WITH d AS (
      |  SELECT source, md5(text) AS h,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      |  FROM documents),
      |g AS (SELECT h, source, COUNT(*) AS n, SUM(tok) AS tok
      |      FROM d GROUP BY h, source),
      |c AS (SELECT *, SUM(n) OVER (PARTITION BY h) AS c FROM g)
      |SELECT source,
      |  CAST(SUM(n) AS BIGINT) AS n_docs,
      |  CAST(SUM(tok) AS BIGINT) AS raw_tokens,
      |  CAST(SUM(n * (1000000 // c)) AS BIGINT) AS eff_docs_ppm,
      |  CAST(SUM(tok * (1000000 // c)) AS BIGINT) AS eff_tokens_ppm
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- d31
  /** Duplication-level histogram — the memorization-exposure curve of
    * Lee et al. 2022 / Carlini et al. 2023: for every exact-duplicate
    * multiplicity c, how many clusters sit at that level, how many
    * documents and how much character mass they carry, and that mass's
    * corpus share in exact ppm. The planning readout BEHIND d01's
    * per-source counts and d30's keep-weights: a corpus with its mass
    * in c = 2–5 needs soft dedup (d30); a megadup spike at c ≥ 100 is
    * boilerplate for d17/d22; the c = 1 share is the dedup ceiling.
    *
    * Scale (100 TB): text never shuffles — documents collapse map-side
    * to (digest, chars) partials, the cluster rollup is digest-keyed,
    * and the histogram is ≤ max-multiplicity rows; the corpus total is
    * a 1-row broadcast (the documented param-frame pattern). */
  def d31(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val clusters = Tables.t(s, dir, "documents")
      .select(md5($"text".cast(BinaryType)).as("h"), $"n_chars")
      .groupBy($"h")
      .agg(count(lit(1)).as("c"), sum($"n_chars").as("chars"))
    val total = clusters.agg(sum($"chars").as("t"))
    clusters.groupBy($"c")
      .agg(count(lit(1)).as("n_clusters"),
        sum($"chars").as("char_mass"))
      .crossJoin(broadcast(total))
      .select($"c".as("dup_level"), $"n_clusters",
        ($"c" * $"n_clusters").as("n_docs"),
        $"char_mass",
        // char_mass is corpus-proportional: promote to DECIMAL(38,0)
        // before the *1e6 (the oracle's HUGEINT mirror) — a bare long
        // multiply wraps above ~9.2e12 chars at one dup level
        expr("(1000000 * cast(char_mass as decimal(38,0))) div t")
          .cast(LongType).as("mass_ppm"))
      .orderBy($"dup_level")
  }

  val d31Sql: String =
    """WITH cl AS (
      |  SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS c,
      |    CAST(SUM(n_chars) AS BIGINT) AS chars
      |  FROM documents GROUP BY 1),
      |tv AS (SELECT SUM(chars) AS t FROM cl)
      |SELECT c AS dup_level, CAST(COUNT(*) AS BIGINT) AS n_clusters,
      |  CAST(c * COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(chars) AS BIGINT) AS char_mass,
      |  CAST((1000000 * SUM(chars)) // (SELECT t FROM tv) AS BIGINT)
      |    AS mass_ppm
      |FROM cl GROUP BY c ORDER BY dup_level""".stripMargin

  def all: Seq[Q] = Seq(
    Q("d01_exact_dedup", d01, Some(d01Sql)),
    Q("d02_ngram_jaccard", d02, Some(d02Sql), headline = true),
    Q("d03_minhash_lsh", d03, Some(d03Sql), headline = true),
    Q("d04_simhash", d04, Some(d04Sql), headline = true),
    Q("d05_edit_blocked", d05, Some(d05Sql)),
    Q("d06_decontaminate", d06, Some(d06Sql), headline = true),
    Q("d07_canonical_corpus", d07, Some(d07Sql)),
    Q("d08_chunk_dedup", d08, Some(d08Sql)),
    Q("d09_containment", d09, Some(d09Sql)),
    Q("d10_bloom_decontaminate", d10, Some(d10Sql)),
    Q("d11_source_overlap", d11, Some(d11Sql)),
    Q("d12_minhash_audit", d12, Some(d12Sql)),
    Q("d13_semantic_dedup", d13, Some(d13Sql)),
    Q("d14_curation_funnel", d14, Some(d14Sql)),
    Q("d15_threshold_sweep", d15, Some(d15Sql)),
    Q("d16_leak_attribution", d16, Some(d16Sql)),
    Q("d17_template_dedup", d17, Some(d17Sql)),
    Q("d18_split_leakage", d18, Some(d18Sql)),
    Q("d19_simhash_audit", d19, Some(d19Sql)),
    Q("d20_dedup_agreement", d20, Some(d20Sql)),
    Q("d21_band_sweep", d21, Some(d21Sql)),
    Q("d22_prefix_families", d22, Some(d22Sql)),
    Q("d23_chunk_jaccard", d23, Some(d23Sql)),
    Q("d24_dupspan_coverage", d24, Some(d24Sql)),
    Q("d25_shard_consistency", d25, Some(d25Sql)),
    Q("d26_incremental_dedup", d26, Some(d26Sql)),
    Q("d27_keeper_sensitivity", d27, Some(d27Sql)),
    Q("d28_pair_evidence", d28, Some(d28Sql)),
    Q("d29_copy_direction", d29, Some(d29Sql)),
    Q("d30_soft_dedup", d30, Some(d30Sql)),
    Q("d31_dup_histogram", d31, Some(d31Sql)))
}
