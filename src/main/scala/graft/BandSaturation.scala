package graft

import graft.operators.{DedupOps, SimhashBanding}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scheme-saturation probe (r18 verdict order #2's evidence half): measure
  * the banded near-dup join's cost curve at corpus sizes PAST the default
  * scheme's comfort zone, for the default (56,7) and wide (64,8) schemes
  * side by side.
  *
  * Why synthetic signatures: the knee sits past 5M documents, and the full
  * text pipeline at 20M+ docs is hours of tokenize+md5 in this container —
  * but saturation is a property of the SIGNATURE distribution alone
  * (bucket populations), not of the text. Uniform random signatures are
  * the DISPERSION-OPTIMAL case (any real corpus clusters more, so its
  * in-bucket quadratic term is at least this large — this probe is a
  * LOWER bound on real cost), and the r15/r17 trees' Caesar+suffix
  * decorrelation makes their signatures near-uniform anyway. The join
  * under test is the production plan itself
  * ([[DedupOps.bandedPairsOverSignatures]] — same postings explode, same
  * first-intact-pair emit-once), fed xxhash64-derived signatures.
  *
  * Two measurements per (scheme, N):
  *  - `candidates` — EXACT in-bucket pair count Σ_buckets C(pop, 2),
  *    computed by one partial-aggregated groupBy (never enumerated): the
  *    analytic saturation curve. Linear regime: candidates grows ~N;
  *    saturated: ~N^2/buckets.
  *  - `join_sec` — wall time of the real banded join (checksum-consumed),
  *    which pays ~candidates of codegen'd compare work: the operational
  *    curve the gate cares about.
  *
  * Expected shape (uniform): candidates = C(n,2) * N^2 / (2 * 2^(2*cb))
  * per the Scheme doc — the wide scheme's 4x bucket space divides the
  * quadratic term by 4, i.e. its knee sits 4x further out in N at equal
  * cost. Output: a markdown table + one JSON line for BENCH_NOTES.
  */
object BandSaturation {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ns: Seq[Long] = sys.env.getOrElse("SPARK_GRAFT_BAND_NS",
      "2500000,5000000,10000000,20000000")
      .split(",").map(_.trim.toLong).toSeq
    // SPARK_GRAFT_BAND_SCHEMES picks the slice (r20 adds the chunk-triple
    // scheme from the SimhashBanding past-wide decision memo)
    val allSchemes = Map("default" -> SimhashBanding.Default,
      "wide" -> SimhashBanding.Wide, "triple" -> SimhashBanding.Triple)
    val schemes = sys.env.getOrElse("SPARK_GRAFT_BAND_SCHEMES", "default,wide")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      .map(tag => tag -> allSchemes(tag))

    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    println("| scheme | N | candidates | cand/N | join s |")
    println("|---|---|---|---|---|")
    val cells = Seq.newBuilder[String]
    for (n <- ns; (tag, scheme) <- schemes) {
      // deterministic near-uniform signatures at the scheme's producer
      // width (mask to 56 exactly like md5Hash56's value range)
      val mask = if (scheme.producerBits == 64) "" else
        s" & ${(1L << scheme.producerBits) - 1}"
      val sig = spark.range(n).select(col("id").as("doc_id"),
        expr(s"xxhash64(id, 7)$mask").as("simhash"))
      // exact Σ C(pop,2) over band buckets — partial agg, never a join
      // (pair schemes keep the committed (i,j,v) posting shape; bandSize>2
      // posts (band-mask, v) like the production k-subset join)
      val postings =
        if (scheme.bandSize == 2) sig.select(
            explode(expr(s"array(${scheme.pairEntriesExpr})")).as("ch"))
          .groupBy(col("ch.i"), col("ch.j"), col("ch.v"))
        else sig.select(
            explode(expr(s"array(${scheme.bandEntriesExpr})")).as("ch"))
          .groupBy(col("ch.b"), col("ch.v"))
      val candidates = postings
        .agg(count(lit(1)).as("pop"))
        .agg(sum(expr("pop * (pop - 1) / 2")).cast("long")).head().getLong(0)
      // wall of the production join, checksum-consumed (uniform signatures
      // emit ~no pairs, so this isolates candidate-enumeration cost)
      val t0 = System.nanoTime()
      val out = DedupOps.bandedPairsOverSignatures(sig, scheme, 6)
      val nOut = out.select(xxhash64(col("doc_a"), col("doc_b"), col("hd")).as("h"))
        .agg(expr("bit_xor(h)"), expr("count(1)")).head().getLong(1)
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"| $tag | $n | $candidates | ${fmt(candidates.toDouble / n)} | ${fmt(sec)} |")
      cells += s"""{"scheme":"$tag","n":$n,"candidates":$candidates,""" +
        s""""pairs_out":$nOut,"join_sec":${fmt(sec)}}"""
    }
    println(s"""{"metric":"band_saturation","rows":[${cells.result().mkString(",")}]}""")
    spark.stop()
  }
}
