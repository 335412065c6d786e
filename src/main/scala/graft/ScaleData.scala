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
    * deterministic, so reuse is exact). */
  def synthesize(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int = 10): Unit = {
    val marker = new java.io.File(s"$outDir/_GRAFT_SCALE_OK_$factor")
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

    write("customer", shiftKeys(
      withRep(Tables.t(spark, srcDir, "customer"), factor), Seq("c_custkey")))
    write("supplier", shiftKeys(
      withRep(Tables.t(spark, srcDir, "supplier"), factor), Seq("s_suppkey")))
    write("part", shiftKeys(
      withRep(Tables.t(spark, srcDir, "part"), factor), Seq("p_partkey")))
    write("orders", shiftKeys(
      withRep(Tables.t(spark, srcDir, "orders"), factor),
      Seq("o_orderkey", "o_custkey")))
    write("lineitem", shiftKeys(
      withRep(Tables.t(spark, srcDir, "lineitem"), factor),
      Seq("l_orderkey", "l_partkey", "l_suppkey")))
    write("events", shiftKeys(
      withRep(Tables.t(spark, srcDir, "events"), factor),
      Seq("event_id", "user_id")))

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
    write("documents", shiftKeys(
      withRep(Tables.t(spark, srcDir, "documents"), factor), Seq("doc_id"))
      .withColumn("text", when(col("rep") < 26, caesar(col("text"), col("rep")))
        .otherwise(regexp_replace(caesar(col("text"), col("rep")),
          lit("(\\S+)"),
          concat(lit("$1g"), lower(conv(col("rep").cast("string"), 10, 36))))))
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
