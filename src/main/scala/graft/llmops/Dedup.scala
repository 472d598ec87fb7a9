package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}
import graft.functions.expressions.HashExpressions

/** Deduplication operators for training-data pipelines over a `documents`
  * table `(doc_id long, text string, ...)`.
  *
  * Scale notes (100 TB discipline):
  *  - exact dedup = one hash aggregation (map-side partial combine).
  *  - MinHash-LSH = narrow per-row signature compute, one explode-shuffle on
  *    band keys, candidate verification only within buckets — never the
  *    O(n^2) cross join.
  *  - groupWithin (same-source pairwise) is for bounded group sizes only;
  *    the LSH path is the unbounded-scale route.
  */
object Dedup {

  /** Exact dedup: keep the lowest doc_id per normalized-text fingerprint.
    * Returns (fingerprint, keep_id, dup_count).
    */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(Text.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** The surviving unique documents after exact dedup. */
  def exactSurvivors(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.join(
      exactGroups(docs, idCol, textCol).select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi")

  /** MinHash+LSH near-duplicate candidate pairs with exact-Jaccard
    * verification. Output: (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard >= threshold, deduplicated across bands.
    *
    * shingleK=3 word shingles; numHashes = numBands * rowsPerBand.
    */
  def minhashLshPairs(
      docs: DataFrame,
      threshold: Double,
      numBands: Int = 8,
      rowsPerBand: Int = 4,
      shingleK: Int = 3,
      maxBucketSize: Int = 5000,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // sorted shingle sets: MinHashBands is order-insensitive, and the
    // verification stage needs sorted input for the merge-scan Jaccard.
    // `sh` feeds three consumers (banding + both sides of the verification
    // join) but is deliberately NOT cached: a `.cache()` held by a returned
    // lazy DataFrame can never be unpersisted safely and leaks executor
    // memory across a long-lived session — and at 100 TB the shingle
    // intermediate doesn't fit in cluster memory anyway. Recomputing the
    // narrow scan+shingle stage per consumer is the scale-correct trade.
    val sh = docs
      .select(col(idCol).as("id"),
        Text.shingles(col(textCol), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
    // one native-expression pass per row computes all band keys (the band
    // index is folded into the band hash, so joining on `bh` alone is safe);
    // only (id, bh) pairs enter the shuffle — never the shingle arrays
    val bandsAll = sh.select(col("id"),
      explode(HashExpressions.minhash_bands(col("sh"), numBands, rowsPerBand)).as("bh"))
    // skew guard: a degenerate band key shared by B docs would emit B^2/2
    // candidate pairs from one reducer; buckets above maxBucketSize are
    // dropped (their members still pair through their other bands). The
    // cap costs one count aggregation over (id, bh) rows. Measured note:
    // the count-filter + self-join form beats a bucketized object-agg
    // collect here — bandsAll is cheap native compute, so re-evaluating it
    // per join side costs less than a non-codegen collect aggregate (the
    // inverse trade of exactSetJaccardPairs, whose prefix pipeline is
    // expensive — see the groupBy form there).
    val smallBuckets = bandsAll.groupBy(col("bh")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucketSize).select(col("bh"))
    val bands = bandsAll.join(smallBuckets, Seq("bh"))
    val candidates = bands.as("l").join(bands.as("r"),
        col("l.bh") === col("r.bh") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", round(HashExpressions.jaccard_sorted(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit signatures, candidates = equal signature
    * bands (4 x 16-bit), verified by Hamming distance <= maxHamming.
    *
    * For maxHamming <= 3 this is EXACT over the signature space — PROVIDED
    * no band bucket exceeds `maxBucketSize`: 3 flipped bits can touch at
    * most 3 of the 4 bands (pigeonhole), so every qualifying pair shares at
    * least one band — banding is a complete candidate generator, not an
    * approximation. The skew guard drops over-full buckets, and a pair
    * whose ONLY shared band was dropped is lost; run
    * [[simhashOverflowBands]] (same one aggregation the guard already
    * pays) to check whether the guard tripped — an empty result certifies
    * the exactness claim at this corpus + cap.
    */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int = 3,
      maxBucketSize: Int = 5000,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sigs = docs
      .select(col(idCol).as("id"),
        HashExpressions.simhash64(Text.tokens(col(textCol))).as("sig"))
      .withColumn("band", explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("i"), call_function("shiftright", col("sig"), (b * 16).cast("int"))
          .bitwiseAND(0xffffL).as("v")))))
      .select(col("id"), col("sig"), col("band"))
    // skew guard (same shape as minhashLshPairs): a degenerate band value
    // shared by B docs emits B^2/2 candidates from one reducer. Over-full
    // buckets are dropped — members still pair through their other bands
    // (though a bucket this hot usually means near-identical docs that the
    // exact-dedup pass should have removed first).
    val smallBands = sigs.groupBy(col("band")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucketSize).select(col("band"))
    val banded = sigs.join(smallBands, Seq("band"))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        Vectors.hamming64(col("l.sig"), col("r.sig")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** The band buckets [[simhashPairs]]'s skew guard would DROP at this
    * `maxBucketSize`: (band struct, member count), empty when the guard is
    * a no-op. A pipeline that relies on the maxHamming<=3 exactness
    * guarantee should assert this is empty (or route the over-full buckets'
    * members through exact dedup first — a bucket that hot is usually
    * near-identical text the fingerprint pass removes anyway).
    */
  def simhashOverflowBands(
      docs: DataFrame,
      maxBucketSize: Int = 5000,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(HashExpressions.simhash64(Text.tokens(col(textCol))).as("sig"))
      .withColumn("band", explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("i"), call_function("shiftright", col("sig"), (b * 16).cast("int"))
          .bitwiseAND(0xffffL).as("v")))))
      .groupBy(col("band")).agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > maxBucketSize)

  /** Exact n-gram (word-set) Jaccard pairs within bounded groups (e.g. the
    * same `source`): pairwise inside each group only. SQL-oracle friendly.
    */
  def jaccardPairsWithin(
      docs: DataFrame,
      groupCol: String,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxBucketSize: Int = 4096): DataFrame =
    exactSetJaccardPairs(
      docs.select(col(groupCol).as("g"), col(idCol).as("id"),
        sort_array(array_distinct(Text.tokens(col(textCol)))).as("ts")),
      threshold, maxBucketSize)

  /** EXACT fuzzy JOIN between two different tables (record linkage:
    * vendor list x catalog, incoming batch x corpus): every (left, right)
    * pair whose token-set jaccard clears `threshold`, with no false
    * negatives. Output `(left_id, right_id, jaccard)`.
    *
    * Rides the certified [[exactSetJaccardPairs]] kernel rather than a
    * bespoke A-x-B prefix join: ids are side-tagged into one keyspace
    * (left -> 2*id, right -> 2*id+1 — ids must be non-negative longs
    * below 2^62), both tables union into one set table, and only
    * cross-side survivors are kept. Within-side candidates cost some
    * wasted verification, but the blocking pipeline (rarity prefixes,
    * skew chunk-split, size-ratio bound) is shared and stays certified
    * by one spec + oracle instead of two diverging copies.
    */
  def jaccardJoin(
      left: DataFrame,
      right: DataFrame,
      threshold: Double,
      leftId: String = "doc_id",
      leftText: String = "text",
      rightId: String = "doc_id",
      rightText: String = "text",
      maxBucketSize: Int = 4096): DataFrame = {
    def side(df: DataFrame, id: String, text: String, tag: Long) =
      df.select(lit("__join").as("g"),
        (col(id).cast("long") * 2 + tag).as("id"),
        sort_array(array_distinct(Text.tokens(col(text)))).as("ts"))
    val sets = side(left, leftId, leftText, 0L)
      .unionByName(side(right, rightId, rightText, 1L))
    val leftEnc = when(pmod(col("id_a"), lit(2L)) === 0, col("id_a")).otherwise(col("id_b"))
    val rightEnc = when(pmod(col("id_a"), lit(2L)) === 1, col("id_a")).otherwise(col("id_b"))
    // decode with integer arithmetic: Column./ is DOUBLE division, which
    // loses exactness above ~2^52 — shiftright floors the non-negative
    // encodings exactly for the full declared id range (left = 2*id,
    // right = 2*id + 1: both decode as enc >> 1)
    exactSetJaccardPairs(sets, threshold, maxBucketSize)
      .filter(pmod(col("id_a"), lit(2L)) =!= pmod(col("id_b"), lit(2L)))
      .select(shiftright(leftEnc.cast("long"), 1).as("left_id"),
        shiftright(rightEnc.cast("long"), 1).as("right_id"), col("jaccard"))
  }

  /** EXACT set-similarity self-join over `(g, id, ts sorted-distinct
    * array<string>)`, AllPairs/PPJoin style:
    *  1. order every set's elements by global rarity (freq asc);
    *  2. a pair with jaccard >= t MUST share an element among each side's
    *     first (|s| - ceil(t*|s|) + 1) rarest elements — candidates are
    *     generated by joining only those short, rare prefixes;
    *  3. verify candidates with the merge-scan JaccardSorted.
    * Guaranteed superset of the true pairs (t' below t covers the 6dp
    * rounding boundary), so the result set is identical to all-pairs —
    * without ever building the all-pairs join. Also the exact ground truth
    * the MinHash recall gate compares against (same algorithm, shingle
    * sets, one global group).
    *
    * Skew guard (exactness-preserving, unlike the DROP caps in the minhash
    * and simhash paths): a degenerate rare-token bucket of B near-dup
    * survivors owes B^2/2 candidate pairs — that output is owed by
    * exactness and cannot be dropped, but it must not materialize one
    * B-element array and stream B^2 rows from ONE task. Buckets past
    * `maxBucketSize` are hash-split into s = ceil(B / maxBucketSize)
    * chunks and each row is replicated to its s chunk-pair reducers
    * ((c,c) diagonal plus every (min(c,k), max(c,k))), so the same B^2/2
    * pairs stream from s(s+1)/2 tasks of at most ~maxBucketSize^2 pairs
    * each — per-task work and memory stay capped at any B. Normal buckets
    * (s=1) take the exact single-group path. The chunk count derives from
    * the per-(g, tok) TOKEN count — a tight upper bound on the prefix
    * bucket (prefix rows are a filtered subset of token rows) computed by
    * one cheap aggregation over the exploded tokens, keeping only
    * over-full buckets and broadcast to the prefix rows: no shuffle of
    * the big side, no second evaluation of the freq-join/window prefix
    * pipeline. Sizing from the GLOBAL token frequency instead would be
    * quadratic in it — a globally-frequent token that is locally rare
    * (many groups) would replicate every one of its prefix rows
    * ceil(f/cap) times for buckets that needed no split at all.
    *
    * The set table feeds prefix extraction + both sides of verification
    * but is not cached — see the note in [[minhashLshPairs]].
    */
  def exactSetJaccardPairs(sets: DataFrame, threshold: Double,
      maxBucketSize: Int = 4096): DataFrame = {
    val toks = sets.withColumn("sz", size(col("ts")).cast("long"))
    val tPrime = math.max(0.0, threshold - 0.01)
    val exploded = toks.select(col("g"), col("id"), col("sz"), explode(col("ts")).as("tok"))
    val freq = exploded.groupBy(col("tok")).agg(count(lit(1)).as("__f"))
    val wDoc = Window.partitionBy(col("id")).orderBy(col("__f").asc, col("tok").asc)
    val prefixes = exploded.join(freq, Seq("tok"))
      .withColumn("__pos", row_number().over(wDoc))
      .filter(col("__pos") <= col("sz") - ceil(lit(tPrime) * col("sz")) + 1)
      .select(col("g"), col("id"), col("tok"), col("__f"))
    val ratioNum = math.max(0L, (tPrime * 1000).toLong)
    // candidate generation by bucket AGGREGATION, not a prefix self-join:
    // a self-join evaluates the whole explode→freq→window prefix pipeline
    // once per side (nothing is cached — see [[minhashLshPairs]]); one
    // groupBy + local double-explode pair generation halves that work.
    // PPJoin's construction keeps buckets small in the typical case
    // (prefixes hold each set's RAREST tokens), and the chunk split above
    // the cap bounds the degenerate case — see the scaladoc skew note.
    // over-full buckets only: one hash-agg over the exploded tokens (no
    // freq join, no window — far cheaper than the prefix pipeline), at
    // most |tokens|/maxBucketSize rows out, broadcast so the prefix side
    // never shuffles. __n >= the (g, tok) prefix-bucket size, so s sized
    // from it still bounds every reducer at ~maxBucketSize rows; a bucket
    // absent here fits under the cap by construction and takes s=1.
    val overFull = exploded.groupBy(col("g"), col("tok"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucketSize)
    val chunked = prefixes
      .join(broadcast(overFull), Seq("g", "tok"), "left")
      .withColumn("__s", when(col("__n").isNull, lit(1))
        .otherwise(ceil(col("__n") / lit(maxBucketSize.toDouble)).cast("int")))
      .drop("__n")
      .withColumn("__c", pmod(xxhash64(col("id")), col("__s")).cast("int"))
    // a row in chunk c serves reducer (ci, cj) = (min(c,k), max(c,k)) for
    // every chunk k: as the A side when c <= k, the B side when c >= k
    // (both on its own diagonal) — so each cross-chunk pair meets at
    // exactly one reducer and each within-chunk pair at its diagonal
    val entries = chunked.select(col("g"), col("tok"), col("id"),
        explode(transform(sequence(lit(0), col("__s") - 1), k => struct(
          least(col("__c"), k).as("ci"), greatest(col("__c"), k).as("cj"),
          (k >= col("__c")).as("isA"), (k <= col("__c")).as("isB")))).as("e"))
      .select(col("g"), col("tok"), col("id"),
        col("e.ci").as("ci"), col("e.cj").as("cj"),
        col("e.isA").as("isA"), col("e.isB").as("isB"))
    val candidates = entries.groupBy(col("g"), col("tok"), col("ci"), col("cj"))
      .agg(collect_list(when(col("isA"), col("id"))).as("aIds"),
        collect_list(when(col("isB"), col("id"))).as("bIds"))
      .select(col("ci"), col("cj"), explode(col("aIds")).as("x"), col("bIds"))
      .select(col("ci"), col("cj"), col("x"), explode(col("bIds")).as("y"))
      // diagonal: pair within one list, ordered; off-diagonal: full cross
      // of two disjoint chunks, canonicalized below
      .filter(col("ci") < col("cj") || col("x") < col("y"))
      .select(least(col("x"), col("y")).as("id_a"),
        greatest(col("x"), col("y")).as("id_b"))
      .distinct()
    candidates
      .join(toks.select(col("id").as("id_a"), col("ts").as("ts_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(toks.select(col("id").as("id_b"), col("ts").as("ts_b"), col("sz").as("sz_b")), Seq("id_b"))
      .filter(col("sz_a") * 1000 >= col("sz_b") * ratioNum &&
        col("sz_b") * 1000 >= col("sz_a") * ratioNum) // size-ratio bound
      .select(col("id_a"), col("id_b"),
        round(HashExpressions.jaccard_sorted(col("ts_a"), col("ts_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** EXACT edit-distance near-duplicate pairs: (id_a, id_b, dist) with
    * id_a < id_b and levenshtein(norm_a, norm_b) <= k over whitespace-
    * normalized lowercase text. No false negatives — candidate
    * generation is the fixed-position chunk-signature scheme (the
    * pigeonhole at the heart of PassJoin, Li et al., ICDE'11, simplified
    * to absolute offsets):
    *
    *  - SIGNATURES: the first k+1 width-`w` chunks of each doc at fixed
    *    offsets 0, w, 2w, ... k edits each corrupt at most one of those
    *    chunks, so any doc long enough to have k+1 of them (len > k*w)
    *    keeps at least one chunk edit-free.
    *  - PROBES: substrings of width `w` at offsets i*w + d for i<=k,
    *    |d|<=k. An edit-free chunk of `a` survives in `b` shifted by the
    *    net insert-delete balance before it, which is within ±k — so it
    *    equals one of b's probes at the same chunk index.
    *
    * Both constants: k+1 signatures and at most (k+1)(2k+1) probes per
    * doc regardless of length — the candidate join is a plain equi-join
    * on (chunk_index, xxhash64(chunk)) with the |len| band residual, and
    * hash collisions are false POSITIVES only, killed by the final
    * early-exit levenshtein(_, _, k) verification. Docs too short for
    * k+1 chunks (len <= k*w + k, so either side of a qualifying pair)
    * pair separately through [[graft.operators.RangeJoin.bandJoin]] on
    * length — short strings verify in O(k * len), so the band block is
    * enough. Reference anchor: the reference dedups only by exact key
    * (kv/lsm/compact.go:893-911 version dedup); this is the similarity
    * extension surface.
    *
    * Scale notes: one narrow pass per side for signatures/probes, one
    * equi-join shuffle keyed on 64-bit hashes, verification only on
    * candidates. A pathologically common chunk (e.g. a boilerplate
    * header at offset 0) is the skew hazard — the candidate join is AQE
    * skew-eligible, and `maxBucketSize` surfaces offending buckets via
    * raise_error rather than silently exploding a reducer.
    */
  def editDistancePairs(
      docs: DataFrame,
      k: Int = 5,
      w: Int = 8,
      maxBucketSize: Long = 1L << 22,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1 && w >= 1, "editDistancePairs: k and w must be >= 1")
    val base = docs.select(col(idCol).as("id"),
        Text.normalize(col(textCol)).as("t"))
      .withColumn("len", length(col("t")).cast("long"))
    // The signature guarantee needs k+1 FULL-WIDTH chunks, i.e.
    // len >= (k+1)*w. A pair whose shorter side is below that has its
    // longer side within shorter+k < (k+1)*w + k — so routing everything
    // below shortMax through the length-band path covers exactly the
    // pairs the chunk path can't certify.
    val longMin = (k.toLong + 1) * w
    val shortMax = longMin + k - 1
    val sigs = base.filter(col("len") >= longMin)
      .select(col("id").as("sid"), col("len").as("slen"),
        posexplode(expr(s"transform(sequence(0, $k), i -> substring(t, i*$w + 1, $w))"))
          .as(Seq("ci", "chunk")))
      .select(col("sid"), col("slen"), col("ci"),
        xxhash64(col("chunk")).as("h"))
    val probes = base.select(col("id").as("pid"), col("len").as("plen"),
        col("t"), explode(expr(
          s"""filter(flatten(transform(sequence(0, $k), i ->
             transform(sequence(-$k, $k), d ->
               named_struct('ci', i, 'st', i*$w + d)))), s -> s.st >= 0)"""))
          .as("pc"))
      .select(col("pid"), col("plen"), col("pc.ci").as("ci"),
        expr(s"substring(t, pc.st + 1, $w)").as("chunk"))
      .filter(length(col("chunk")) === w) // an edit-free chunk survives as
      // w REAL characters of the partner, so truncated end-of-string
      // probes can never be the guaranteed match
      .select(col("pid"), col("plen"), col("ci"),
        xxhash64(col("chunk")).as("h"))
    // loud skew guard, PPJoin-style: the over-full key list is tiny and
    // broadcast; the probe stream itself never takes an extra shuffle
    val guarded =
      if (maxBucketSize > 0) {
        val overFull = probes.groupBy(col("ci"), col("h"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucketSize)
        probes.join(broadcast(overFull), Seq("ci", "h"), "left")
          .select(col("pid"), col("ci"), col("h"),
            // guard rides the kept plen column so it can't be pruned
            when(col("__n").isNotNull, raise_error(concat(
              lit(s"editDistancePairs: probe bucket over $maxBucketSize at chunk index "),
              col("ci"), lit(" — raise maxBucketSize or widen w"))))
              .otherwise(col("plen")).as("plen"))
      } else probes
    val longCands = sigs.join(guarded, Seq("ci", "h"))
      .filter(col("sid") =!= col("pid") &&
        abs(col("slen") - col("plen")) <= k)
      .select(least(col("sid"), col("pid")).as("id_a"),
        greatest(col("sid"), col("pid")).as("id_b"))
    val shorts = base.filter(col("len") <= shortMax)
    val shortCands = graft.operators.RangeJoin.bandJoin(
        shorts.select(col("id").as("la"), col("len").as("lena")),
        shorts.select(col("id").as("rb"), col("len").as("lenb")),
        delta = k.toLong, lCol = "lena", rCol = "lenb")
      .filter(col("la") < col("rb"))
      .select(col("la").as("id_a"), col("rb").as("id_b"))
    val texts = base.select(col("id"), col("t"))
    longCands.union(shortCands).distinct()
      .join(texts.select(col("id").as("id_a"), col("t").as("ta")), Seq("id_a"))
      .join(texts.select(col("id").as("id_b"), col("t").as("tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ta"), col("tb"), k).as("dist"))
      .filter(col("dist") >= 0 && col("dist") <= k)
  }

  /** Near-duplicate CLUSTERING: connected components over the exact
    * jaccard pair graph; every document maps to the lowest doc id in its
    * near-dup cluster (itself when it has no duplicates). This is the
    * operator a dedup pipeline actually ends with — keep one canonical
    * doc per cluster.
    */
  def jaccardClusters(
      docs: DataFrame,
      groupCol: String,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val pairs = jaccardPairsWithin(docs, groupCol, threshold, idCol, textCol)
      .select(col("id_a"), col("id_b"))
    val labels = graft.graph.GraphOps.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .withColumnRenamed("vertex", idCol)
    docs.select(col(idCol))
      .join(labels, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("canonical_id"))
  }

  /** Edit-distance near-dup CLUSTERING: connected components over the
    * exact [[editDistancePairs]] graph; every document maps to the
    * lowest doc id in its cluster (itself when it has no near-dups) —
    * the typo/near-exact companion to [[jaccardClusters]]'s token-set
    * families.
    */
  def editDistanceClusters(
      docs: DataFrame,
      k: Int = 5,
      w: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val pairs = editDistancePairs(docs, k, w, idCol = idCol, textCol = textCol)
      .select(col("id_a"), col("id_b"))
    val labels = graft.graph.GraphOps.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .withColumnRenamed("vertex", idCol)
    docs.select(col(idCol))
      .join(labels, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("canonical_id"))
  }

  /** Embedding near-dup pairs: cosine >= threshold among LSH-candidate
    * pairs. The SCALE path (`bucketBits > 0`, the default): each vector
    * gets a `bucketBits`-bit random-hyperplane bucket (the SQL-replicable
    * Knuth family, so an external oracle can recompute the exact same
    * grid); candidates are pairs whose buckets differ in AT MOST ONE bit —
    * implemented as a 1-bit multi-probe explode on the left side joined on
    * bucket equality, so the shuffle key is a scalar long and the join
    * never goes all-pairs. Each qualifying pair matches exactly one probe
    * (the probe values `b0, b0^1, b0^2, ...` are distinct), so no
    * dedup pass is needed.
    *
    * The declared pair set is thus exactly
    *   `{(a, b) : hamming(bucket_a, bucket_b) <= 1 AND cosine >= t}`
    * — deterministic and oracle-checkable, with recall < 1 vs the true
    * pair set by LSH construction (multi-probe recovers splits across one
    * hyperplane; see DedupSpec's recall floor).
    *
    * `bucketBits = 0` is the exact all-pairs baseline: O(n^2) cross join,
    * TEST SCALE ONLY — it exists to measure the bucketed path's recall in
    * specs, never as a declared query plan.
    */
  /** Per-document duplicated-span statistics — the cross-document
    * substring-duplication signal (the practical form of exact substring
    * dedup over token n-grams): for each doc, how many of its DISTINCT
    * `width`-token spans also appear in at least one OTHER document, and
    * the fraction that number is of the doc's spans. High `dup_frac`
    * marks boilerplate and templated text that pairwise whole-doc dedup
    * (minhash/jaccard) misses because the surrounding text differs.
    * Returns `(<idCol>, n_spans, n_dup_spans, dup_frac)` for EVERY input
    * doc. A doc shorter than `width` contributes its WHOLE text as one
    * span (WordShingles' short-doc fallback — identical short docs still
    * register as duplicated); an empty doc has 0 spans and dup_frac 0.0.
    * dup_frac is 6dp-rounded so the number is engine-portable.
    *
    * Scale shape: one shingle explode (sorted-distinct per doc, so span
    * multiplicity inside one doc never inflates the signal), one
    * hash-agg by span for the per-span doc count, one join back on the
    * span key, one hash-agg by doc — all key-partitioned shuffles of the
    * span stream, no window over unbounded groups, no broadcast of
    * corpus-sized state.
    */
  def dupSpanStats(
      docs: DataFrame,
      width: Int = 6,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(width > 0, "dupSpanStats: width must be positive")
    val sh = docs.select(col(idCol), explode(Text.shingles(col(textCol), width)).as("sh"))
    // WordShingles is distinct-per-doc, so this count = #docs containing
    val perSpan = sh.groupBy(col("sh")).agg(count(lit(1)).as("__nd"))
    val perDoc = sh.join(perSpan, Seq("sh"))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_spans"),
        coalesce(sum(when(col("__nd") >= 2, 1L).otherwise(0L)), lit(0L)).as("n_dup_spans"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
      .withColumn("dup_frac",
        when(col("n_spans") === 0, lit(0.0))
          .otherwise(round(col("n_dup_spans") / col("n_spans"), 6)))
  }

  /** EXACT repeated-span REMOVAL with global keep-first — the
    * "deduplicating training data" substring pass ([[dupSpanStats]] only
    * measures; this one edits): every `width`-token span that occurs
    * anywhere else in the corpus is cut from all but its globally-first
    * occurrence (minimum `(doc, position)` — a total order, so any
    * partitioning elects the same survivor), overlapping duplicate spans
    * merging into one removed range positionally. Output per doc:
    * `(idCol, n_tokens, n_removed, text_deduped)` over whitespace tokens
    * of the normalized text. Docs shorter than `width` carry no spans and
    * pass through untouched — whole-doc dedup ([[exactSurvivors]]) is the
    * tool for those, not a substring pass.
    *
    * Scale shape — five keyed shuffles, each bounded by the token stream,
    * no corpus-sized broadcast and no window over unbounded groups:
    * (1) positioned spans hash-agg by a 128-bit span HASH pair — 16
    * bytes of shuffle key per position instead of the width-token span
    * string (map-side combine keeps a billion-fold boilerplate span to
    * one row per map task);
    * (2) occurrence→first join back on the span-hash key — build side is
    * ONE row per span, so a hyper-repeated span skews but never explodes
    * (AQE skew-split applies); (3) removed token positions distinct on
    * `(doc, i)` — duplicate-span overlap collapses here, bounding
    * downstream work by doc length regardless of how many spans cover a
    * token; (4) the anti-join of the positioned token stream against the
    * removed set on `(doc, i)`; (5) the per-doc reassembly agg (per-group
    * state = the doc's own surviving tokens, the same bound as
    * [[dedupUnitsAndReassemble]]).
    */
  def removeDupSpans(
      docs: DataFrame,
      width: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(width > 0, "removeDupSpans: width must be positive")
    val base = docs.select(col(idCol),
      filter(graft.functions.Text.tokens(col(textCol)), t => t =!= "").as("__toks"))
    val withN = base.withColumn("__nt", size(col("__toks")))
    // positioned spans: p in [0, nt-width], span = tokens p..p+width-1
    // the span's shuffle identity is a 128-bit hash PAIR of the token
    // slice, not the width-token string: the string key shipped ~width x
    // the token stream through the two keyed shuffles below (the r9
    // bench's #1 cost), while the hash pair is 16 bytes per position with
    // identical grouping semantics. Independence matters: Spark's
    // multi-arg xxhash64 CHAINS the accumulator, so a trailing salt
    // (hash(slice, 1L) = hashLong(1L, h1)) would be a pure function of
    // h1 — any h1 collision collides the pair, leaving only 64 bits.
    // Salting FIRST (hash(1L, slice)) perturbs the initial state before
    // the slice folds in, so h2 varies independently of h1 on h1-equal
    // inputs; the effective pair resistance is ~2^128 (~n^2/2^129 at
    // 10^13 corpus spans — and the output never needs the span text,
    // only positions)
    val spans = withN
      .filter(col("__nt") >= width)
      .select(col(idCol), explode(transform(
        sequence(lit(0), col("__nt") - width),
        p => struct(p.as("p"),
          xxhash64(slice(col("__toks"), p + 1, lit(width))).as("h1"),
          xxhash64(lit(1L), slice(col("__toks"), p + 1, lit(width))).as("h2")))).as("__s"))
      .select(col(idCol), col("__s.p").as("p"),
        col("__s.h1").as("h1"), col("__s.h2").as("h2"))
    // ONE shuffle of the span stream, reused by both consumers: the
    // stream is explicitly hash-partitioned on the span-hash pair, the
    // first-occurrence aggregate rides that partitioning exchange-free,
    // and the occurrence→first join is co-partitioned on both sides
    // (the agg output inherits the same partitioning), so Spark's
    // ReuseExchange serves both from a single shuffle write. The
    // previous shape evaluated the whole tokenize+span-hash pipeline
    // TWICE (agg once, join probe once) and shuffled it twice. No new
    // skew exposure: the join probe already shipped every occurrence of
    // a hyper-repeated span to one reducer — the map-side combine the
    // agg loses here never protected the join side. The build side is
    // prefiltered to spans with >= 2 occurrences (most spans are unique,
    // so the join's build input shrinks to the duplicated minority;
    // inner join + the filter commute, same dupOcc set).
    val spansP = spans.repartition(col("h1"), col("h2"))
    val firstOcc = spansP.groupBy(col("h1"), col("h2")).agg(
      min(struct(col(idCol), col("p"))).as("__first"),
      count(lit(1)).as("__nocc"))
    val dupOcc = spansP.join(firstOcc.filter(col("__nocc") >= 2), Seq("h1", "h2"))
      .filter(!(col(idCol) === col(s"__first.$idCol") && col("p") === col("__first.p")))
      .select(col(idCol), col("p"))
    val removed = dupOcc
      .select(col(idCol), explode(sequence(col("p"), col("p") + (width - 1))).as("i"))
      .distinct()
    val toks = withN.select(col(idCol),
      posexplode(col("__toks")).as(Seq("i", "tok")))
    val kept = toks.join(removed, Seq(idCol, "i"), "left_anti")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("__n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("i"), col("tok")))),
          s => s.getField("tok")), " ").as("text_deduped"))
    withN.select(col(idCol), col("__nt").cast("long").as("n_tokens"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_deduped"), lit("")).as("text_deduped"))
  }

  /** Split docs into positioned units (paragraphs/lines) on a regex
    * delimiter: `(<idCol>, pos, unit)` with pos 0-based over the doc's
    * non-empty trimmed segments. The unit table feeds
    * [[unitDedupKeepFirst]] / [[paragraphDedup]]. Narrow (split +
    * posexplode), no shuffle.
    */
  def splitUnits(docs: DataFrame, delimRe: String = "\\n+",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), posexplode_outer(
        filter(transform(split(col(textCol), delimRe), u => trim(u)),
          u => u =!= "")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("col").as("unit"))
      .filter(col("unit").isNotNull)

  /** Corpus-wide keep-first unit dedup (the C4/RefinedWeb line-dedup
    * rule): each distinct unit string survives only at its globally-first
    * occurrence — minimum `(<idCol>, pos)` lexicographic. Input is a unit
    * table from [[splitUnits]] (or any `(id, pos, unit)` rows); output is
    * the surviving rows, same schema.
    *
    * Scale shape: ONE hash aggregation keyed by the unit string —
    * `min(struct(id, pos))` with the winning row riding in the struct, so
    * there is no join-back and no window over unit groups. Partial
    * (map-side) aggregation makes it skew-safe: a boilerplate paragraph
    * repeated a billion times combines to one row per map task before the
    * shuffle, exactly the hazard that kills the
    * `row_number() over (partition by unit)` formulation.
    */
  def unitDedupKeepFirst(units: DataFrame, idCol: String = "doc_id",
      posCol: String = "pos", unitCol: String = "unit"): DataFrame =
    units
      .groupBy(col(unitCol))
      .agg(min(struct(col(idCol), col(posCol))).as("__w"))
      .select(col(s"__w.$idCol").as(idCol), col(s"__w.$posCol").as(posCol),
        col(unitCol))

  /** Whole-pipeline paragraph dedup: split on `delimRe`, drop every
    * paragraph already seen earlier in the corpus (keep-first), reassemble
    * each doc from its survivors in original order. Returns
    * `(<idCol>, n_units, n_kept, text_deduped)` for every input doc —
    * a doc whose every paragraph lost dedups to the empty string.
    *
    * Reassembly sorts each doc's surviving units by position inside an
    * `array_sort(collect_list(struct(pos, unit)))` — per-doc bounded
    * state, deterministic across engines (no collect_list order reliance).
    */
  def paragraphDedup(docs: DataFrame, delimRe: String = "\\n+",
      joinSep: String = "\n", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    dedupUnitsAndReassemble(docs.select(col(idCol)),
      splitUnits(docs, delimRe, idCol, textCol), joinSep, idCol)

  /** Keep-first dedup + per-doc reassembly over an externally-built unit
    * table (chunker output, line splitter, …) — [[paragraphDedup]]'s body,
    * reusable when the unit definition is not a regex split. `ids` fixes
    * the output domain: every id appears, even with zero surviving units.
    */
  def dedupUnitsAndReassemble(ids: DataFrame, units: DataFrame,
      joinSep: String = "\n", idCol: String = "doc_id"): DataFrame = {
    val kept = unitDedupKeepFirst(units, idCol, "pos", "unit")
    val perDoc = units.groupBy(col(idCol)).agg(count(lit(1)).as("n_units"))
    val rebuilt = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("unit")))),
          w => w.getField("unit")),
        joinSep).as("text_deduped"))
    ids
      .join(perDoc, Seq(idCol), "left")
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_units"), lit(0L)).as("n_units"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_deduped"), lit("")).as("text_deduped"))
  }

  /** CCNet-style boilerplate DETECTION: the set of units (paragraphs /
    * lines / chunks) occurring in at least
    * `max(minDocs, ceil(minDocFrac * n_docs))` DISTINCT documents —
    * navigation chrome, cookie banners, templated headers. This is the
    * FIT half of boilerplate removal: the returned `(unit, doc_freq)`
    * frame is a static model a streaming cleaner can anti-join
    * statelessly.
    *
    * Scale shape: the doc-frequency aggregate is TWO-LEVEL — first
    * `groupBy(unit, id)` (map-side combine collapses a document's
    * repeats of its own unit before any shuffle), then `groupBy(unit)`
    * counts rows — the skew-safe form of count(distinct) per unit. The
    * result is inherently SMALL when the threshold is fraction-based:
    * each surviving unit costs ≥ minDocFrac·n_docs corpus occurrences,
    * so the set is bounded by unitsPerDoc / minDocFrac regardless of
    * corpus size — always broadcastable. `ids` fixes the document
    * domain (one row per doc, the [[dedupUnitsAndReassemble]]
    * contract); the doc count rides the plan as a one-row broadcast so
    * the whole fit stays lazy.
    */
  def boilerplateUnits(ids: DataFrame, units: DataFrame,
      minDocFrac: Double = 0.005, minDocs: Int = 2,
      idCol: String = "doc_id"): DataFrame = {
    require(minDocFrac >= 0.0 && minDocFrac <= 1.0,
      s"boilerplateUnits: minDocFrac must be in [0, 1], got $minDocFrac")
    require(minDocs >= 2,
      "boilerplateUnits: minDocs must be >= 2 — a threshold of 1 would " +
        s"mark EVERY unit boilerplate and empty the corpus, got $minDocs")
    val nd = ids.agg(count(lit(1)).as("__nd"))
    units
      .groupBy(col("unit"), col(idCol)).agg(lit(1).as("__one"))
      .groupBy(col("unit")).agg(count(lit(1)).as("doc_freq"))
      .crossJoin(broadcast(nd))
      .filter(col("doc_freq") >=
        greatest(lit(minDocs.toLong), ceil(lit(minDocFrac) * col("__nd"))))
      .select(col("unit"), col("doc_freq"))
  }

  /** CCNet-style boilerplate REMOVAL: units in the
    * [[boilerplateUnits]] set are removed from EVERY document — unlike
    * the keep-first dedup family ([[unitDedupKeepFirst]]), which
    * preserves the first occurrence: a cookie banner's first sighting
    * is as worthless as its billionth. Returns
    * `(<idCol>, n_units, n_kept, text_cleaned)` for every input doc —
    * a doc that was ALL boilerplate cleans to the empty string rather
    * than vanishing.
    *
    * The apply is a broadcast LEFT-ANTI join of the unit stream against
    * the bounded boilerplate set, then the standard per-doc ordered
    * reassembly (array_sort over bounded per-doc state, deterministic
    * across engines).
    */
  def removeBoilerplate(ids: DataFrame, units: DataFrame,
      minDocFrac: Double = 0.005, minDocs: Int = 2,
      joinSep: String = "\n", idCol: String = "doc_id"): DataFrame = {
    val bp = boilerplateUnits(ids, units, minDocFrac, minDocs, idCol)
    val kept = units.join(broadcast(bp.select(col("unit"))),
      Seq("unit"), "left_anti")
    val perDoc = units.groupBy(col(idCol)).agg(count(lit(1)).as("n_units"))
    val rebuilt = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("unit")))),
          w => w.getField("unit")),
        joinSep).as("text_cleaned"))
    ids
      .join(perDoc, Seq(idCol), "left")
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_units"), lit(0L)).as("n_units"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_cleaned"), lit("")).as("text_cleaned"))
  }

  def embeddingPairs(
      emb: DataFrame,
      threshold: Double,
      bucketBits: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    if (bucketBits > 0) {
      val withB = base.withColumn("b0",
        Vectors.hyperplaneBucket(col("v"), bucketBits, knuth = true))
      val probes = Seq(col("b0")) ++
        (0 until bucketBits).map(i => col("b0").bitwiseXOR(lit(1L << i)))
      val probed = withB.withColumn("b", explode(array(probes: _*)))
      probed.as("l").join(withB.as("r"),
          col("l.b") === col("r.b0") && col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
          Vectors.cosine(col("l.v"), col("r.v")).as("cos"))
        .filter(col("cos") >= threshold)
        .select(col("id_a"), col("id_b"))
    } else {
      base.as("l").join(base.as("r"), col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
          Vectors.cosine(col("l.v"), col("r.v")).as("cos"))
        .filter(col("cos") >= threshold)
        .select(col("id_a"), col("id_b"))
    }
  }

  /** K-means cell assignment for [[semanticPairs]]/[[semanticDedup]]:
    * fit on a bounded sample (identical to a full fit below
    * `fitSampleRows` — the [[Similarity.ivfTopK]] scale split), assign
    * every row through the narrow codegen'd nearest-centroid kernel, and
    * attach each row's cosine to its OWN centroid (the keep-rule signal)
    * via a broadcast join against the tiny centroid table. Output:
    * `(cell, id, v, ccos)`.
    */
  private def semanticAssign(
      emb: DataFrame,
      numCells: Int,
      idCol: String,
      vecCol: String,
      seed: Long,
      fitSampleRows: Long): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    val total = base.count()
    val fitInput =
      if (fitSampleRows > 0 && total > fitSampleRows)
        base.sample(withReplacement = false, fitSampleRows.toDouble / total, seed)
      else base
    val model = new KMeans().setK(numCells).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(fitInput.withColumn("fv", array_to_vector(col("v").cast("array<double>"))))
    val centroidArr = model.clusterCenters.map(_.toArray)
    val centroids = centroidArr.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq.toDF("cell", "centroid")
    base
      .withColumn("cell", graft.functions.expressions.VectorExpressions
        .nearest_centroid(col("v"), centroidArr))
      .join(broadcast(centroids), Seq("cell"))
      .withColumn("ccos", Vectors.cosine(col("v"), col("centroid")))
      .drop("centroid")
  }

  /** All pairs within one k-means cell with cosine >= `threshold` — the
    * candidate stage of SemDeDup. Within-cell exhaustion is the
    * SEMANTICS (the paper compares every pair that shares a cell), so an
    * over-full cell cannot be sampled away; instead it is chunk-split
    * with the same exactness-preserving construction as
    * [[exactSetJaccardPairs]]'s bucket guard: rows of a cell with
    * n > `maxCellSize` hash into s = ceil(n/maxCellSize) chunks, the A
    * side of each row serves reducers `(c, k) | k >= c` and the B side
    * `(k, c) | k <= c`, so every unordered pair meets at EXACTLY ONE
    * `(cell, ci, cj)` reducer (the lower chunk on the left) — the same
    * pair set as the plain self-join, with per-reducer work capped at
    * ~maxCellSize² at any cell size. Cell sizes come from one cheap
    * broadcast aggregation; under-cap cells take s = 1 and degenerate to
    * the plain within-cell join.
    */
  private def withinCellPairs(
      assigned: DataFrame, threshold: Double, maxCellSize: Int): DataFrame = {
    val overFull = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxCellSize)
    val chunked = assigned
      .join(broadcast(overFull), Seq("cell"), "left")
      .withColumn("__s", when(col("__n").isNull, lit(1))
        .otherwise(ceil(col("__n") / lit(maxCellSize.toDouble)).cast("int")))
      .drop("__n")
      .withColumn("__c", pmod(xxhash64(col("id")), col("__s")).cast("int"))
    val aSide = chunked.select(col("cell"), col("__c").as("ci"),
      explode(sequence(col("__c"), col("__s") - 1)).as("cj"),
      col("id").as("id_l"), col("v").as("v_l"))
    val bSide = chunked.select(col("cell"),
      explode(sequence(lit(0), col("__c"))).as("ci"), col("__c").as("cj"),
      col("id").as("id_r"), col("v").as("v_r"))
    aSide.join(bSide, Seq("cell", "ci", "cj"))
      .filter(col("ci") < col("cj") || col("id_l") < col("id_r"))
      .withColumn("cos", Vectors.cosine(col("v_l"), col("v_r")))
      .filter(col("cos") >= threshold)
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"),
        round(col("cos"), 6).as("cos"))
  }

  /** SemDeDup candidate pairs (Abbas et al., arXiv:2303.09540): pairs
    * that share a k-means cell AND have cosine >= `threshold`. This is
    * the declared (deterministic, spec-checkable) pair set of
    * [[semanticDedup]]; recall vs the true cosine-threshold pair graph
    * is what the cell partition trades for never going O(n²) — measured
    * by the `dedup_semantic_recall` gate.
    */
  def semanticPairs(
      emb: DataFrame,
      threshold: Double,
      numCells: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L,
      fitSampleRows: Long = 262144L,
      maxCellSize: Int = 4096): DataFrame =
    withinCellPairs(
      semanticAssign(emb, numCells, idCol, vecCol, seed, fitSampleRows),
      threshold, maxCellSize)
      .select(col("id_a"), col("id_b"))

  /** SemDeDup (Abbas et al., arXiv:2303.09540 — "semantic deduplication"
    * for web-scale training data): k-means partitions the embedding
    * space into `numCells` cells; within each cell, pairs with cosine >=
    * `threshold` form duplicate clusters (connected components); each
    * cluster keeps ONE representative — the member with the LOWEST
    * cosine to its cell centroid (the paper's best-performing keep rule:
    * prefer the least-prototypical example), ties broken by lowest id.
    *
    * Returns every input row: `(<idCol>, cluster_id, keep, cell,
    * centroid_sim)` — `cluster_id` is the lowest id in the row's
    * duplicate cluster (itself for singletons), `keep` marks the
    * survivor. Filter `keep` for the deduped corpus.
    *
    * Scale shape: bounded-sample fit + narrow assignment (no shuffle),
    * one broadcast-sized cell-count aggregation, the chunk-split
    * within-cell pair join (per-reducer work capped — see
    * [[semanticPairs]]), GraphX connected components over the pair graph
    * (pairs only — the overwhelmingly-singleton rest never enters the
    * graph), and one hash-agg + join-back keyed by cluster for the keep
    * rule. At 100 TB, size `numCells` ∝ corpus/targetCellSize (the paper
    * runs 110k cells over LAION); nothing here is O(n²) in any cell.
    */
  def semanticDedup(
      emb: DataFrame,
      threshold: Double,
      numCells: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L,
      fitSampleRows: Long = 262144L,
      maxCellSize: Int = 4096): DataFrame = {
    val assigned = semanticAssign(emb, numCells, idCol, vecCol, seed, fitSampleRows)
    val pairs = withinCellPairs(assigned, threshold, maxCellSize)
    val labels = graft.graph.GraphOps.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .withColumnRenamed("vertex", "id")
    val withCluster = assigned.join(labels, Seq("id"), "left")
      .withColumn("cluster_id", coalesce(col("component"), col("id")))
    val winners = withCluster.groupBy(col("cluster_id"))
      .agg(min(struct(col("ccos"), col("id"))).as("__w"))
      .select(col("cluster_id"), col("__w.id").as("__keep_id"))
    withCluster.join(winners, Seq("cluster_id"))
      .select(col("id").as(idCol), col("cluster_id"),
        (col("id") === col("__keep_id")).as("keep"),
        col("cell"), round(col("ccos"), 6).as("centroid_sim"))
  }
}
