package graft.operators

/** Declared scale parameters of the SimHash banded near-dup family — shared
  * by the batch path ([[DedupOps.qSimhashBanded]]) and the streaming twin
  * ([[graft.streaming.NearDupStream]]), which must agree bit-for-bit on the
  * banding or the "incremental form of the batch join" claim is vacuous.
  *
  * Why this is a SCHEME and not two constants: the r15 100x growth rung
  * caught 4-bit bands (≈23k buckets) saturating at ~500k docs — once every
  * bucket is populated, per-bucket population grows with N and the
  * in-bucket quadratic compare turns the whole operator super-linear (282x
  * wall on 100x input). The width IS the saturation knob, so it must be a
  * declared, validated parameter with its pigeonhole guarantee derived
  * from the chunk count, not a pair of magic numbers duplicated across the
  * batch and stream operators (ADVICE/verdict r17).
  *
  * Pigeonhole contract (chunk-PAIR banding): split a `bits`-wide signature
  * into n = bits/chunkBits chunks; hamming distance hd damages at most hd
  * chunks, so hd <= n - 2 leaves at least TWO chunks intact — the pair
  * co-buckets on the 2*chunkBits-bit value of an intact chunk pair.
  * [[Scheme.maxHd]] = n - 2 is therefore the largest hd the scheme finds
  * with NO false negatives.
  *
  * Saturation arithmetic: each doc posts once per chunk pair, and the
  * candidate count the banded equi-join produces is sum over buckets of
  * pop^2 — under a uniform value spread that is ~ N^2 * C(n,2) / B with
  * bucket space B = C(n,2) * 2^(2*chunkBits), i.e. quadratic in N with
  * 1/2^(2*chunkBits) as the only damping. The operator is linear in
  * practice while per-bucket populations stay small; once the value space
  * fills, every added doc collides. Per-width facts on the 56-bit
  * signature:
  *   - chunkBits=7 (DEFAULT): n=8,  maxHd=6,  B = 28 * 2^14 ≈ 459k —
  *     MEASURED linear through 5M docs (r17 1000x rung, 314 s batch);
  *     the same pigeonhole math that bit r15 says it re-saturates a
  *     couple of decades past that
  *   - chunkBits=4: n=14, maxHd=12, B = 91 * 2^8 ≈ 23k — MEASURED
  *     saturating at ~500k docs (the r15 282x finding); correct at any N,
  *     scale-valid only for small corpora
  *   - chunkBits=14: n=4, maxHd=2,  B = 6 * 2^28 ≈ 1.6e9 — huge space but
  *     the guarantee drops below the hd<=6 product contract: REJECTED at
  *     hdMax=6 by [[Scheme.requireCovers]]
  * More headroom at hd<=6 needs a WIDER signature (bits is declared here
  * for exactly that — a 64-bit hash at chunkBits=8 gives n=8, maxHd=6,
  * B = 28 * 2^16 ≈ 1.8M, 4x the default) or chunk-TRIPLE banding; both are
  * scheme changes, not code rewrites.
  *
  * Past-wide decision memo (r20, the BandSaturation follow-up): the probe
  * measured candidates/doc DOUBLING with N for both pair schemes — wide
  * buys a 2x corpus step at equal cost, not immunity — so the next step
  * is k=3 banding (`bandSize`). The arithmetic, with candidates/doc ~
  * N * C(n,k) / 2^(k*chunkBits) (each doc posts C(n,k) entries; a
  * colliding posting needs k chunks equal):
  *   - (64,8)-TRIPLE, the obvious candidate: n=8 chunks, so maxHd =
  *     8 - 3 = 5 — REJECTED by requireCovers(6). hd=6 can damage 6 of 8
  *     chunks leaving only 2 intact, and no intact triple exists: the
  *     56 * 2^24 ≈ 9.4e8 bucket space is unreachable without breaking
  *     the product contract. (The chunk-triple idea as originally noted
  *     fails AT THIS WIDTH; it needs >= 9 chunks for hd <= 6.)
  *   - (63,7)-TRIPLE ([[Triple]]): mask the 64-bit producer to 63 bits =
  *     9 chunks of 7; maxHd = 9 - 3 = 6 — the contract holds. B =
  *     C(9,3) * 2^21 ≈ 1.76e8 buckets (~96x wide-pair); candidates/doc =
  *     N * 84 / 2^21 = N/24966 vs wide-pair's N/2340 and default's
  *     N/585: ~10.7x fewer candidates than wide at the same N — one full
  *     corpus DECADE of headroom per the same doubling law — for 3x the
  *     posting/shuffle volume (84 vs 28 postings/doc, 1.5x the posting
  *     bytes per entry is avoided by packing v into one long).
  *   - Widening past 64 bits loses to both: the signature no longer fits
  *     one BIGINT, so producer, state rows, and the oracle encoding all
  *     go two-column for a 2x (not 10x) knee shift per 8 bits added.
  * Verdict: [[Triple]] is the instantiated past-wide scheme (batch path;
  * the streaming twin's state key is (i, j, v)-shaped and would key by
  * (band mask, v) — a mechanical extension, not done until a deployment
  * needs an INCREMENTAL corpus past wide's knee). Beyond triple, the same
  * doubling law eventually wins again (~2.4e9 docs at the measured 2136
  * cand/doc knee cost); at that corpus size exact-dedup-first plus
  * per-shard banding is the production posture, not a fourth chunk.
  *
  * Producer contract: `bits` <= 56 signatures come from md5-derived
  * 56-bit token hashes (14 hex chars — a full 16 would overflow a signed
  * BIGINT parse in DuckDB); 56 < `bits` <= 64 selects the WIDE producer
  * (r19): the full 16 hex chars assembled as two 32-bit halves
  * (`FlinkFunctions.md5Hash64`), which the oracle reproduces bit-for-bit
  * by parsing UBIGINT and folding to the signed two's-complement BIGINT
  * through HUGEINT — the encoding that unblocked the 64-bit width the
  * r18 verdict ordered (4x the default's bucket space at the same hd <= 6
  * guarantee). bits < producerBits masks the signature to its low `bits`
  * bits in BOTH engines (hamming distance is then measured on the masked
  * signature, consistently); bits == producerBits adds no plan node.
  */
object SimhashBanding {

  final case class Scheme(bits: Int, chunkBits: Int, bandSize: Int = 2) {
    require(bits >= 8 && bits <= 64,
      s"signature width $bits outside the md5 producer contract [8, 64]")
    require(chunkBits >= 1 && bits % chunkBits == 0,
      s"chunkBits=$chunkBits must tile the $bits-bit signature exactly")

    /** Which token-hash producer feeds this width: the legacy 14-hex-char
      * 56-bit hash, or the full-16-hex 64-bit hash (r19). */
    val producerBits: Int = if (bits <= 56) 56 else 64

    val nChunks: Int = bits / chunkBits
    require(bandSize >= 2, s"banding needs chunk groups of >= 2, got $bandSize")
    require(nChunks >= bandSize + 1,
      s"chunk-$bandSize banding needs >= ${bandSize + 1} chunks, got " +
        s"$nChunks ($bits/$chunkBits)")
    require(nChunks <= 30, s"intact-chunk bitmask must fit an Int, got $nChunks chunks")
    require(bandSize * chunkBits <= 62,
      s"band value ${bandSize}x$chunkBits bits must fit a positive long")

    /** Largest hamming distance guaranteed to co-bucket (no false
      * negatives): hd damages at most hd chunks, so hd <= n - bandSize
      * leaves at least one intact chunk `bandSize`-subset. */
    val maxHd: Int = nChunks - bandSize

    val chunkMask: Long = (1L << chunkBits) - 1L
    // 1L << 64 wraps to 1 in JVM shift semantics — the full-width mask is
    // all-ones, special-cased rather than computed off the wrap
    val sigMask: Long = if (bits == 64) -1L else (1L << bits) - 1L
    val nChunkPairs: Int = nChunks * (nChunks - 1) / 2

    /** The chunk-index subsets this scheme bands on (ascending indices,
      * lexicographic combo order) — C(nChunks, bandSize) of them. */
    def bandCombos: IndexedSeq[IndexedSeq[Int]] =
      (0 until nChunks).combinations(bandSize).map(_.toIndexedSeq).toIndexedSeq

    val nBands: Int = bandCombos.size

    /** Bucket space — the saturation knob (see object doc). */
    val buckets: Long = nBands.toLong * (1L << (bandSize * chunkBits))

    /** Guard a query's hd contract against the scheme's guarantee. */
    def requireCovers(hdMax: Int): Unit =
      require(hdMax <= maxHd,
        s"scheme $this guarantees only hd <= $maxHd (n=$nChunks chunks); " +
          s"a query filtering hd <= $hdMax would silently drop pairs")

    def chunkPairs: IndexedSeq[(Int, Int)] =
      for { i <- 0 until nChunks; j <- i + 1 until nChunks } yield (i, j)

    /** SQL: array of (i, j, v) postings — one per chunk pair — over a
      * (pre-masked) `simhash` column; v is the 2*chunkBits-bit pair value.
      * Pair-shaped (the streaming twin keys state by (i, j, v)); schemes
      * with bandSize > 2 band through [[bandEntriesExpr]]. */
    def pairEntriesExpr: String = {
      require(bandSize == 2,
        s"pair postings are undefined for bandSize=$bandSize — use bandEntriesExpr")
      chunkPairs.map { case (i, j) =>
        s"named_struct('i', $i, 'j', $j, 'v', " +
          s"shiftleft(shiftright(simhash, ${i * chunkBits}) & $chunkMask, $chunkBits) + " +
          s"(shiftright(simhash, ${j * chunkBits}) & $chunkMask))"
      }.mkString(", ")
    }

    /** SQL: array of (b, bm, v) postings — one per chunk `bandSize`-subset —
      * over a (pre-masked) `simhash` column. `b` is the subset's chunk
      * bitmask; `bm` is the constant filled mask of every bit at or below
      * the subset's highest chunk index, so the emit-once rule is the
      * single-evaluation identity `(m & bm) = b` ("the intact mask has no
      * other set bit at or below b's highest bit" — given b ⊆ m that makes
      * b exactly the lexicographically-first intact subset); `v` packs the
      * subset's chunk values ascending-index-first into
      * bandSize*chunkBits bits. */
    def bandEntriesExpr: String = bandCombos.map { combo =>
      val mask = combo.map(1 << _).sum
      val filled = (1 << (combo.max + 1)) - 1
      val v = combo.zipWithIndex.map { case (c, idx) =>
        val sh = (bandSize - 1 - idx) * chunkBits
        if (sh == 0) s"(shiftright(simhash, ${c * chunkBits}) & $chunkMask)"
        else s"shiftleft(shiftright(simhash, ${c * chunkBits}) & $chunkMask, $sh)"
      }.mkString(" + ")
      s"named_struct('b', $mask, 'bm', $filled, 'v', $v)"
    }.mkString(", ")

    /** SQL: intact-chunk bitmask of an XOR column — bit c set iff chunk c
      * of the two signatures is identical. Drives the emit-once
      * first-intact-pair rule (`m & -m` twice) in the batch join. */
    def intactMaskExpr(xCol: String): String = (0 until nChunks)
      .map(c => s"IF((shiftright($xCol, ${chunkBits * c}) & $chunkMask) = 0, ${1 << c}, 0)")
      .mkString(" + ")

    /** JVM twin of [[intactMaskExpr]] for the streaming processor. */
    def intactMask(x: Long): Int = {
      var m = 0
      var c = 0
      while (c < nChunks) {
        if (((x >>> (chunkBits * c)) & chunkMask) == 0L) m |= 1 << c
        c += 1
      }
      m
    }
  }

  /** 56-bit signature, 7-bit chunks: 8 chunks, hd <= 6 guaranteed, 459k
    * buckets — the width the r15 100x rung forced and the r17 1000x rung
    * measured linear at 5M docs. */
  val Default: Scheme = Scheme(56, 7)

  /** 64-bit signature, 8-bit chunks: 8 chunks, hd <= 6 guaranteed, 28 x
    * 2^16 ≈ 1.8M buckets — 4x the default's space, the next decade of
    * headroom the r18 verdict ordered (the default re-saturates a couple
    * of decades past 5M docs; this scheme's knee is 4x further out at the
    * SAME pigeonhole guarantee). Costs one extra md5 hex char per token
    * hash and the wide oracle encoding; nothing else changes — the point
    * of the scheme being declared. q_simhash_banded_wide runs it. */
  val Wide: Scheme = Scheme(64, 8)

  /** 63-bit signature (64-bit producer masked), 7-bit chunks, TRIPLE
    * banding: 9 chunks, hd <= 6 guaranteed (9 - 3), C(9,3) = 84 bands x
    * 2^21 values ≈ 1.76e8 buckets — ~96x wide-pair's space, ~10.7x fewer
    * candidates/doc at equal N, for 3x the posting volume (see the
    * past-wide decision memo in the object doc; (64,8)-triple is REJECTED
    * there: 8 chunks guarantee only hd <= 5 under triples).
    * q_simhash_banded_triple runs it (batch path). */
  val Triple: Scheme = Scheme(63, 7, 3)
}
