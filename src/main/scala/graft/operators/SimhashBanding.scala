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

  final case class Scheme(bits: Int, chunkBits: Int) {
    require(bits >= 8 && bits <= 64,
      s"signature width $bits outside the md5 producer contract [8, 64]")
    require(chunkBits >= 1 && bits % chunkBits == 0,
      s"chunkBits=$chunkBits must tile the $bits-bit signature exactly")

    /** Which token-hash producer feeds this width: the legacy 14-hex-char
      * 56-bit hash, or the full-16-hex 64-bit hash (r19). */
    val producerBits: Int = if (bits <= 56) 56 else 64

    val nChunks: Int = bits / chunkBits
    require(nChunks >= 3,
      s"chunk-pair banding needs >= 3 chunks, got $nChunks ($bits/$chunkBits)")
    require(nChunks <= 30, s"intact-chunk bitmask must fit an Int, got $nChunks chunks")

    /** Largest hamming distance guaranteed to co-bucket (no false negatives). */
    val maxHd: Int = nChunks - 2

    val chunkMask: Long = (1L << chunkBits) - 1L
    // 1L << 64 wraps to 1 in JVM shift semantics — the full-width mask is
    // all-ones, special-cased rather than computed off the wrap
    val sigMask: Long = if (bits == 64) -1L else (1L << bits) - 1L
    val nChunkPairs: Int = nChunks * (nChunks - 1) / 2

    /** Bucket space — the saturation knob (see object doc). */
    val buckets: Long = nChunkPairs.toLong * (1L << (2 * chunkBits))

    /** Guard a query's hd contract against the scheme's guarantee. */
    def requireCovers(hdMax: Int): Unit =
      require(hdMax <= maxHd,
        s"scheme $this guarantees only hd <= $maxHd (n=$nChunks chunks); " +
          s"a query filtering hd <= $hdMax would silently drop pairs")

    def chunkPairs: IndexedSeq[(Int, Int)] =
      for { i <- 0 until nChunks; j <- i + 1 until nChunks } yield (i, j)

    /** SQL: array of (i, j, v) postings — one per chunk pair — over a
      * (pre-masked) `simhash` column; v is the 2*chunkBits-bit pair value. */
    def pairEntriesExpr: String = chunkPairs.map { case (i, j) =>
      s"named_struct('i', $i, 'j', $j, 'v', " +
        s"shiftleft(shiftright(simhash, ${i * chunkBits}) & $chunkMask, $chunkBits) + " +
        s"(shiftright(simhash, ${j * chunkBits}) & $chunkMask))"
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
}
