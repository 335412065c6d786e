package graft

import graft.operators.{DedupOps, SimhashBanding}
import graft.streaming.{NearDupStream, StreamingOps, TwsOps}

/** The banding geometry is a DECLARED scale parameter (verdict r17 #4):
  * validate the scheme algebra, pin that batch and stream twins agree at a
  * NON-default width (so the width is genuinely threaded through both
  * engines, not decorative), and pin that schemes too narrow for the hd<=6
  * product contract are rejected at build time. */
class SimhashBandingSpec extends GraftSpec {

  test("default scheme is the r15-forced width: 8 chunks, hd<=6, 459k buckets") {
    val d = SimhashBanding.Default
    assert(d.bits == 56 && d.chunkBits == 7)
    assert(d.nChunks == 8)
    assert(d.maxHd == 6)
    assert(d.nChunkPairs == 28)
    assert(d.buckets == 28L * (1L << 14)) // 458,752
  }

  test("scheme validation: non-tiling, too-few-chunks, and hd-coverage rejects") {
    intercept[IllegalArgumentException](SimhashBanding.Scheme(56, 5)) // 56 % 5 != 0
    intercept[IllegalArgumentException](SimhashBanding.Scheme(56, 28)) // 2 chunks
    intercept[IllegalArgumentException](SimhashBanding.Scheme(72, 8)) // > any md5 producer
    // (56, 14): 4 chunks guarantee only hd<=2 — must refuse an hd<=6 query
    val wide = SimhashBanding.Scheme(56, 14)
    assert(wide.maxHd == 2)
    intercept[IllegalArgumentException](wide.requireCovers(6))
  }

  test("wide scheme (64,8): same 8-chunk hd<=6 guarantee, 4x the bucket space, 64-bit producer") {
    val w = SimhashBanding.Wide
    assert(w.bits == 64 && w.chunkBits == 8)
    assert(w.nChunks == 8 && w.maxHd == 6 && w.nChunkPairs == 28)
    assert(w.buckets == 28L * (1L << 16)) // 1,835,008 = 4x the default
    assert(w.producerBits == 64)
    assert(w.sigMask == -1L) // all 64 bits — computed mask would wrap to 0
    assert(SimhashBanding.Default.producerBits == 56)
  }

  test("stream and batch twins agree at the wide scheme (64,8)") {
    // the r19 width: both engines must thread the 64-bit producer (two
    // 32-bit conv halves) and the full-width no-mask path identically
    val batch = DedupOps.simhashBandedPairs(spark, sfDir, SimhashBanding.Wide, 6)
      .collect().map(_.toSeq).toSeq
    val stream = TwsOps.withRocksDb(spark) {
      import org.apache.spark.sql.functions.col
      val out = NearDupStream.pairs(spark,
        StreamingOps.streamTable(spark, sfDir, "documents"), SimhashBanding.Wide, 6)
      StreamingOps.runToMemory(spark, out, "append", "graft_banding_wide")
        .orderBy(col("doc_a"), col("doc_b"))
        .collect().map(_.toSeq).toSeq
    }
    assert(batch.nonEmpty, "fixture has no near-dup pairs at the wide scheme — vacuous parity")
    assert(stream == batch)
  }

  test("batch banded pairs at a non-default width (56,4) find the same hd<=6 set") {
    // 14 chunks of 4 bits guarantee hd<=12 > 6, so the pair SET must equal
    // the default scheme's — only the bucketing route differs
    val narrow = SimhashBanding.Scheme(56, 4)
    assert(narrow.maxHd == 12)
    val defaultPairs = DedupOps
      .simhashBandedPairs(spark, sfDir, SimhashBanding.Default, 6)
      .collect().map(_.toSeq).toSeq
    val narrowPairs = DedupOps
      .simhashBandedPairs(spark, sfDir, narrow, 6)
      .collect().map(_.toSeq).toSeq
    assert(defaultPairs.nonEmpty, "fixture has no near-dup pairs — vacuous parity")
    assert(narrowPairs == defaultPairs)
  }

  test("stream and batch twins agree at a non-default width (56,4)") {
    val narrow = SimhashBanding.Scheme(56, 4)
    val batch = DedupOps.simhashBandedPairs(spark, sfDir, narrow, 6)
      .collect().map(_.toSeq).toSeq
    val stream = TwsOps.withRocksDb(spark) {
      import org.apache.spark.sql.functions.col
      val out = NearDupStream.pairs(spark,
        StreamingOps.streamTable(spark, sfDir, "documents"), narrow, 6)
      StreamingOps.runToMemory(spark, out, "append", "graft_banding_narrow")
        .orderBy(col("doc_a"), col("doc_b"))
        .collect().map(_.toSeq).toSeq
    }
    assert(batch.nonEmpty, "fixture has no near-dup pairs — vacuous parity")
    assert(stream == batch)
  }

  test("masked-signature width (48,6) agrees across twins and hd uses masked bits") {
    // bits < 56: both engines band AND measure hd on the low-48-bit
    // signature; 8 chunks of 6 keep the hd<=6 guarantee
    val masked = SimhashBanding.Scheme(48, 6)
    assert(masked.maxHd == 6)
    val batch = DedupOps.simhashBandedPairs(spark, sfDir, masked, 6)
      .collect().map(_.toSeq).toSeq
    val stream = TwsOps.withRocksDb(spark) {
      import org.apache.spark.sql.functions.col
      val out = NearDupStream.pairs(spark,
        StreamingOps.streamTable(spark, sfDir, "documents"), masked, 6)
      StreamingOps.runToMemory(spark, out, "append", "graft_banding_masked")
        .orderBy(col("doc_a"), col("doc_b"))
        .collect().map(_.toSeq).toSeq
    }
    assert(batch.nonEmpty)
    assert(stream == batch)
    // the masked hd can only shrink, so the masked pair set is a superset
    // of the full-width set on the same corpus
    val full = DedupOps.simhashBandedPairs(spark, sfDir, SimhashBanding.Default, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val maskedSet = batch.map(s => (s(0).asInstanceOf[Long], s(1).asInstanceOf[Long])).toSet
    assert(full.subsetOf(maskedSet))
  }

  test("triple scheme (63,7,3): 9 chunks, hd<=6, 84 bands; (64,8)-triple rejected at hd<=6") {
    val t = SimhashBanding.Triple
    assert(t.bits == 63 && t.chunkBits == 7 && t.bandSize == 3)
    assert(t.nChunks == 9 && t.maxHd == 6)
    assert(t.nBands == 84) // C(9,3)
    assert(t.buckets == 84L * (1L << 21)) // ~1.76e8, ~96x wide-pair
    assert(t.producerBits == 64 && t.sigMask == (1L << 63) - 1)
    // the decision memo's rejected candidate: 8 chunks guarantee only
    // hd<=5 under triple banding — the hd<=6 contract must refuse it
    val naive = SimhashBanding.Scheme(64, 8, 3)
    assert(naive.maxHd == 5)
    intercept[IllegalArgumentException](naive.requireCovers(6))
    // pair-shaped postings are undefined for k>2 schemes
    intercept[IllegalArgumentException](t.pairEntriesExpr)
  }

  test("triple banded pairs equal brute force hd<=6 on the masked 63-bit signature") {
    import org.apache.spark.sql.functions.{col, expr}
    // brute-force ground truth over the fixture (O(n^2) is fine at test SF):
    // proves the k-subset banding finds EVERY hd<=6 pair (pigeonhole, no
    // false negatives) and emits each exactly once (list equality, not set)
    val sh = DedupOps.simhashWideM(spark, sfDir)
      .withColumn("simhash", expr(s"simhash & ${SimhashBanding.Triple.sigMask}"))
    val brute = sh.as("a")
      .join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("cast(bit_count(a.simhash ^ b.simhash) as int)").as("hd"))
      .filter(col("hd") <= 6)
      .orderBy(col("doc_a"), col("doc_b"))
      .collect().map(_.toSeq).toSeq
    val banded = DedupOps
      .simhashBandedPairs(spark, sfDir, SimhashBanding.Triple, 6)
      .collect().map(_.toSeq).toSeq
    assert(brute.nonEmpty, "fixture has no near-dup pairs at 63 bits — vacuous")
    assert(banded == brute)
  }
}
