package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up synthesizer: replicates an sf-dir `factor`x with
  * shifted keys, producing the next rung of scale evidence (sf0.1 -> ~sf1)
  * in scratch — the read-only fixture tree cannot carry a driver-generated
  * sf1 (TESTDATA.md), so the growth gate builds its own.
  *
  * Design: each replica is a self-contained shard of the key space — every
  * join key (orderkey/custkey/partkey/suppkey, user_id, doc_id, vec_id)
  * shifts by `rep * KeyShift`, so intra-replica join cardinalities are
  * exactly the source's and totals grow linearly. Content columns are
  * perturbed where identical copies would CHANGE the workload's complexity
  * class rather than its size:
  *
  *  - `documents.text` is Caesar-rotated per replica (letters shifted by
  *    `rep`): ten verbatim copies of every document would be cross-replica
  *    near-duplicates, blowing LSH bucket sizes up 10x and their pair
  *    enumeration 100x — a quadratic artifact of the synthesizer, not of
  *    the operator under test. Rotation preserves length, token structure,
  *    and the per-replica near-dup clusters the dedup operators hunt.
  *  - `embeddings.embedding` is rotated by `rep` positions (norm-preserving;
  *    rotated high-dim vectors decorrelate), and `label` — the IVF coarse
  *    cell — re-keys per replica: an IVF index retrained on a 10x corpus has
  *    ~10x cells with stable per-cell population, which is exactly the
  *    contract that keeps within-cell search linear at scale.
  *  - `region`/`nation` stay verbatim: dimension tables do not grow with
  *    fact data.
  *
  * Timestamps are untouched, so time-window density grows 10x per window —
  * the realistic shape of "same retention window, 10x traffic".
  */
object ScaleData {

  /** Per-replica key shift — comfortably above any fixture key. */
  val KeyShift = 100000000L

  // ---- zipf skew mode (r18 verdict order #1) -------------------------
  //
  // Every uniform tree certifies shuffles under the one condition real
  // 100 TB corpora never grant: evenly spread keys. `skew = true` remaps a
  // deterministic fraction of each fact table's SHUFFLE-KEY column through
  // a zipf(1) rank draw over the existing key space, so the skewed tree
  // has globally hot keys (hottest ~ pHot * ln2/ln(H) of all rows, rank r
  // gets 1/r of that) while every remapped value stays a valid key — the
  // same queries run unmodified. Draw: rank = floor(H^u) for u uniform in
  // [0,1) gives P(rank=r) ∝ 1/r exactly (log-uniform), one expression, no
  // rejection loop. Hash-gated per row off the row's own identity column,
  // so the remap is deterministic and replica-independent.
  //
  // Per-column hotness is calibrated to the failure mode under test, not
  // uniform: the unsalted lineitem⋈supplier join needs a partition past
  // AQE's skew-split thresholds (>256 MB and >5x median — l_suppkey gets
  // ~3% of 600M rows on rank 1), while the stream-stream join's output
  // grows QUADRATICALLY in per-key density inside the time window
  // (legitimate join semantics, not an engine defect), so user_id gets a
  // milder ~0.6% head that keeps the hot user's output contribution
  // bounded. Dimension-side keys are never remapped — fact-side FK skew
  // joins N-to-1 against unique build keys, which is the AQE-splittable
  // shape; remapping both sides would make the OUTPUT quadratic in the
  // hot-key mass, a data property no engine fixes.
  //
  // Documents get boilerplate-template skew instead of key skew: near-dup
  // hot buckets come from duplicated CONTENT. Multiplicity is bounded
  // (~300 copies of the hottest template at the 1000x tree) because a
  // real pipeline exact-dedups before near-dup — unbounded exact
  // duplicates would not reach the banded join — and because the
  // in-bucket compare (and the pair OUTPUT) is inherently quadratic in
  // per-bucket multiplicity.

  private def zipfRemap(idCol: org.apache.spark.sql.Column,
      orig: org.apache.spark.sql.Column, salt: String,
      pHotPer100k: Int, h: Int, minKey: Long, kSrc: Long, factor: Int)
      : org.apache.spark.sql.Column = {
    val gate =
      pmod(xxhash64(idCol, lit(salt + ":gate")), lit(100000L)) < lit(pHotPer100k.toLong)
    val u = (pmod(xxhash64(idCol, lit(salt + ":rank")), lit(1000000L))
      .cast("double") + lit(0.5)) / lit(1000000.0)
    val rank = floor(pow(lit(h.toDouble), u)).cast("long") // zipf(1) over [1, h]
    // rank -> the rank-th key of the GLOBAL (replicated) key space:
    // consecutive ranks walk the source keys, then spill into the next
    // replica's shifted copy; the replica index wraps modulo `factor` so a
    // rank space larger than kSrc * factor (the sf0.01 smoke tree: h=1024
    // suppliers > 100 keys x 10 replicas) folds back onto REAL keys
    // instead of minting orphans that silently miss the join
    val hot = lit(minKey) + pmod(rank - 1L, lit(kSrc)) +
      pmod(floor((rank - 1L).cast("double") / lit(kSrc.toDouble)).cast("long"),
        lit(factor.toLong)) * lit(KeyShift)
    when(gate, hot).otherwise(orig)
  }

  /** Bounded-multiplicity boilerplate template for hot documents (reads
    * the staged `__zrank` column): every token embeds the rank, so
    * different templates share ZERO tokens (fingerprints decorrelate)
    * while copies are byte-identical — hd=0 near-dup clusters that land
    * all C(n,2) of their banding buckets. */
  private def docTemplate: org.apache.spark.sql.Column = expr(
    "concat_ws(' ', transform(sequence(1, 80), " +
      "i -> concat('tpl', cast(__zrank as string), 'w', cast(pmod(i * 31 + __zrank, 97) as string))))")

  private def withRep(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("rep", explode(sequence(lit(0), lit(factor - 1))))

  private def shiftKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    keys.foldLeft(df)((d, k) =>
      d.withColumn(k, col(k) + col("rep").cast("long") * KeyShift))

  /** Lower-case Caesar rotation by `rep` (letters only; digits, punctuation
    * and casing-free fixture text pass through). */
  private def caesar(c: org.apache.spark.sql.Column,
      rep: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val abc = "abcdefghijklmnopqrstuvwxyz"
    // translate() needs a literal mapping, so dispatch on rep with a chain
    (1 until 26).foldLeft(c) { (acc, r) =>
      when(rep % 26 === r, translate(c, abc, abc.substring(r) + abc.substring(0, r)))
        .otherwise(acc)
    }
  }

  /** Synthesize `factor`x of `srcDir` into `outDir` (skipped when a prior
    * run's completion marker is present — the synthesized tree is
    * deterministic, so reuse is exact). `skew = true` additionally remaps
    * the fact tables' shuffle-key columns through the zipf draw (see the
    * mode doc above) — callers give a skewed tree its own outDir. */
  def synthesize(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int = 10, skew: Boolean = false): Unit = {
    // the skew marker carries a RECIPE version: a tree built under an
    // older zipf recipe must re-synthesize, not be silently reused as if
    // it matched the current column set (v2 added the l_orderkey remap)
    val marker = new java.io.File(
      s"$outDir/_GRAFT_SCALE_OK_$factor" + (if (skew) "_zipf_v2" else ""))
    if (marker.exists()) return
    // Fact tables are written as MANY splittable files, not the source's
    // single partition: explode-replication keeps the source's partitioning,
    // and at factor 1000 that is one 1.7 GB file whose ~130 MB-compressed
    // row groups are the split FLOOR — maxPartitionBytes cannot cut below a
    // row group, so every scan gets 13 tasks of 11.7M rows and each
    // map-side sort builds a multi-GB sorter (measured: q_topn's partial
    // WindowGroupLimit sort pinned one core for 20+ min in a degenerate
    // grow-spill-TimSort loop). A 1000-executor cluster stores 150M rows
    // as hundreds of files; match that layout. Hash-repartitioned, not
    // round-robin: deterministic file contents for exact reuse.
    val nFiles = math.max(16, factor / 4)
    def write(name: String, df: DataFrame): Unit =
      if (!df.columns.contains("rep")) // dimension: verbatim, single file
        df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      else {
        val out = df.drop("rep")
        out.repartition(nFiles, col(out.columns.head))
          .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      }

    for (dim <- Seq("region", "nation"))
      write(dim, Tables.t(spark, srcDir, dim))

    // dense key spans of the dimension/entity tables the skewed FK columns
    // draw from (metadata-sized aggs; the fixture key spaces are dense by
    // construction, so min..max IS the valid-key set)
    def span(table: String, key: String): (Long, Long) = {
      val r = Tables.t(spark, srcDir, table)
        .agg(min(col(key).cast("long")), max(col(key).cast("long"))).head()
      (r.getLong(0), r.getLong(1) - r.getLong(0) + 1L)
    }

    write("customer", shiftKeys(
      withRep(Tables.t(spark, srcDir, "customer"), factor), Seq("c_custkey")))
    write("supplier", shiftKeys(
      withRep(Tables.t(spark, srcDir, "supplier"), factor), Seq("s_suppkey")))
    write("part", shiftKeys(
      withRep(Tables.t(spark, srcDir, "part"), factor), Seq("p_partkey")))

    val orders0 = shiftKeys(
      withRep(Tables.t(spark, srcDir, "orders"), factor),
      Seq("o_orderkey", "o_custkey"))
    write("orders", if (!skew) orders0 else {
      // hot customers: rank 1 ~ 1.25% of all orders (0.15 * ln2/ln4096) —
      // the per-group TopN/rank skew case (q_topn's WindowGroupLimit must
      // bound it map-side)
      val (ck0, nCk) = span("customer", "c_custkey")
      orders0.withColumn("o_custkey", zipfRemap(col("o_orderkey"),
        col("o_custkey"), "o_custkey", pHotPer100k = 15000, h = 4096,
        minKey = ck0, kSrc = nCk, factor = factor))
    })

    val lineitem0 = shiftKeys(
      withRep(Tables.t(spark, srcDir, "lineitem"), factor),
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    write("lineitem", if (!skew) lineitem0 else {
      // hot suppliers: rank 1 ~ 3% of all lineitems (0.30 * ln2/ln1024) —
      // a real straggler for q_salted_join to scatter and for the
      // unsalted twin's plan to mitigate (measured outcome at the 1000x
      // tree: AQE runtime stats demote the join to a BROADCAST of the
      // projected 2-column supplier side, which is skew-IMMUNE — the
      // hot key never shuffles; the skew-split assertion therefore
      // accepts either mitigation, and the split itself is proven on the
      // big x big probe below)
      val (sk0, nSk) = span("supplier", "s_suppkey")
      // hot ORDERS: rank 1 ~ 2.5% of all lineitems (0.15 * ln2/ln64) on
      // one l_orderkey — the BIG x BIG join skew case (orders is fact-
      // sized, no broadcast escape), consumed by ScaleGrowth's
      // skew-split probe which requires AQE's split to fire. Remapped
      // values stay real o_orderkeys (dense fixture space), so the
      // N-to-1 join semantics hold.
      val (ok0, nOk) = span("orders", "o_orderkey")
      lineitem0
        .withColumn("l_suppkey", zipfRemap(
          col("l_orderkey") * 8L + col("l_linenumber").cast("long"),
          col("l_suppkey"), "l_suppkey", pHotPer100k = 30000, h = 1024,
          minKey = sk0, kSrc = nSk, factor = factor))
        .withColumn("l_orderkey", zipfRemap(
          col("l_orderkey") * 8L + col("l_linenumber").cast("long"),
          col("l_orderkey"), "l_orderkey", pHotPer100k = 15000, h = 64,
          minKey = ok0, kSrc = nOk, factor = factor))
    })

    val events0 = shiftKeys(
      withRep(Tables.t(spark, srcDir, "events"), factor),
      Seq("event_id", "user_id"))
    write("events", if (!skew) events0 else {
      // hot users: rank 1 ~ 0.6% of all events (0.10 * ln2/ln65536) —
      // keyed-state skew for the stream-stream and changelog joins. Kept
      // an order milder than l_suppkey: a stream-stream join's OUTPUT
      // grows quadratically in per-key density inside the time window
      // (join semantics, not engine cost), so the head is sized to stress
      // the state store without drowning the measurement in legitimate
      // output rows
      val (uk0, nUk) = span("events", "user_id")
      events0.withColumn("user_id", zipfRemap(col("event_id"),
        col("user_id"), "user_id", pHotPer100k = 10000, h = 65536,
        minKey = uk0, kSrc = nUk, factor = factor))
    })

    // Caesar rotation cycles at 26; past it (factor > 26) every TOKEN gets
    // a replica-unique base-36 suffix. A replica-tag word alone (the
    // previous scheme) is not enough at the 1000x rung: two replicas
    // sharing a rotation then differ by ONE token out of ~100, which keeps
    // their SimHash within hd<=6 and their shingle Jaccard near 1 — every
    // 26th replica stays a NEAR-duplicate and the near-dup operators pick
    // up a pair count QUADRATIC in factor (~93M artifact pairs at 1000x, a
    // synthesizer artifact, not a workload property). Suffixing every
    // token leaves same-rotation replicas sharing ZERO tokens (fingerprints
    // decorrelate, shingle overlap is empty) while preserving within-replica
    // token-equality structure exactly — the clusters the dedup operators
    // hunt. n_chars is recomputed to stay the fixture's invariant
    // (n_chars == length(text)); for rep < 26 and factor <= 26 the scheme
    // is byte-identical to prior rounds' trees.
    val documents0 = shiftKeys(
      withRep(Tables.t(spark, srcDir, "documents"), factor), Seq("doc_id"))
      .withColumn("text", when(col("rep") < 26, caesar(col("text"), col("rep")))
        .otherwise(regexp_replace(caesar(col("text"), col("rep")),
          lit("(\\S+)"),
          concat(lit("$1g"), lower(conv(col("rep").cast("string"), 10, 36))))))
    val documents1 = if (!skew) documents0 else {
      // boilerplate-template skew: ~0.072% of docs (gated per replica off
      // the shifted doc_id) get a zipf-ranked template text — at the 1000x
      // tree (5M docs) the hottest template has ~300 byte-identical
      // copies, rank r ~ 300/r. Hot BUCKETS for the banded near-dup twins
      // (each template cluster lands all 28 of its chunk-pair buckets)
      // and hot fingerprints for exact dedup, with the multiplicity
      // bounded for the reason in the mode doc: exact-dup mass beyond
      // this dies in exact dedup before any real near-dup pass, and both
      // the in-bucket compare and the legitimate pair OUTPUT are
      // quadratic in multiplicity.
      val gate =
        pmod(xxhash64(col("doc_id"), lit("doc-tpl:gate")), lit(100000L)) < lit(72L)
      val u = (pmod(xxhash64(col("doc_id"), lit("doc-tpl:rank")), lit(1000000L))
        .cast("double") + lit(0.5)) / lit(1000000.0)
      documents0
        .withColumn("__zrank", floor(pow(lit(4096.0), u)).cast("long"))
        .withColumn("text", when(gate, docTemplate).otherwise(col("text")))
        .drop("__zrank")
    }
    write("documents", documents1
      .withColumn("n_chars", length(col("text")).cast("long")))

    // vector rotation cycles at the dimension; rotate by rep mod dim and
    // rely on the per-replica re-celled label for cell separation. The
    // re-key offset must clear every source label or cells silently
    // collide across replicas (breaking the "cell count scales with
    // corpus" property the growth gate relies on) — derive it from the
    // actual max label instead of assuming labels < 1000.
    val srcEmb = Tables.t(spark, srcDir, "embeddings")
    val labelShift = math.max(1000L,
      srcEmb.agg(max(col("label").cast("long"))).head().getLong(0) + 1L)
    // the re-keyed label stays INT to match the source schema; make the
    // overflow mode explicit rather than an ANSI cast abort mid-synthesis
    // (largest shifted value is maxLabel + (factor-1)*labelShift < factor*shift)
    require(factor.toLong * labelShift < Int.MaxValue,
      s"re-keyed label would overflow INT: factor=$factor labelShift=$labelShift")
    val emb = shiftKeys(withRep(srcEmb, factor), Seq("vec_id"))
      .withColumn("label",
        (col("label") + col("rep") * lit(labelShift)).cast("int"))
      .withColumn("rot", pmod(col("rep"), size(col("embedding"))))
      .withColumn("embedding", when(col("rot") === 0, col("embedding"))
        .otherwise(concat(
          slice(col("embedding"), col("rot") + 1,
            size(col("embedding")) - col("rot")),
          slice(col("embedding"), lit(1), col("rot")))))
      .drop("rot")
    write("embeddings", emb)

    marker.getParentFile.mkdirs()
    java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
  }
}
