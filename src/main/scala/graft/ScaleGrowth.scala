package graft

import org.apache.spark.sql.SparkSession

/** The 10x growth-curve gate — the rung of 100x-scale evidence after plan
  * audits: run the most scale-sensitive queries at the bench SF and at a
  * synthesized 10x of it ([[ScaleData]]), and flag any query whose
  * wall-time grows more than `MaxGrowth` (~1.5x the 10x input growth —
  * shuffle-linear tolerance). A super-linear query is a found bug (the r11
  * appendValue cliff was exactly this shape); a linear table is the
  * evidence that the plans survive a scale-up, not just pass at sf0.01.
  *
  * Output: a markdown growth table (for BENCH_NOTES.md) plus one JSON line.
  * Queries dominated by fixed startup (t10 under MinWall) are reported but
  * not flagged — a 1.2 s streaming query is micro-batch bootstrap, not data.
  */
object ScaleGrowth {

  /** Input growth factor (SPARK_GRAFT_GROWTH_FACTOR overrides; 100 gives
    * the second rung, sf0.1 -> ~sf10). */
  val Factor: Int =
    sys.env.getOrElse("SPARK_GRAFT_GROWTH_FACTOR", "10").toInt
  val MaxGrowth: Double = 1.5 * Factor // shuffle-linear tolerance
  val MinWall = 2.0    // flag floor: below this, fixed startup dominates

  /** SPARK_GRAFT_GROWTH_SKEW=zipf: synthesize (and time against) the
    * ZIPF-SKEWED tree instead of the uniform one (ScaleData skew mode) —
    * the r18 verdict's order #1: every uniform tree certifies shuffles
    * under the one condition real 100 TB corpora never grant. The skewed
    * tree gets its own scratch dir and marker; the baseline side of the
    * table is still the uniform srcDir, so read a skew run's growth column
    * against the UNIFORM tree's committed numbers at the same factor (the
    * skew cost is the delta between those runs — BENCH_NOTES carries the
    * side-by-side). */
  val SkewMode: Option[String] = sys.env.get("SPARK_GRAFT_GROWTH_SKEW")
    .map(_.trim.toLowerCase).filter(_.nonEmpty)
  require(SkewMode.forall(_ == "zipf"),
    s"unknown SPARK_GRAFT_GROWTH_SKEW mode: ${SkewMode.get} (only 'zipf')")

  /** Queries whose SKEWED-tree plan must show AQE's skew-join split
    * actually firing (`skew=true` on the sort-merge join): the unsalted
    * twin exists for exactly this assertion — the salted variant handles
    * the same hot key by construction, AQE must handle the naive plan. */
  val expectAqeSkewSplit: Set[String] = Set("q_unsalted_join")

  /** The scale-sensitive set: streaming state families, shuffling joins,
    * dedup/LSH/IVF, window/rank, CEP, and the heaviest TPC-DS shapes. */
  val queries: Seq[String] = Seq(
    // scan + agg + join (q_unsalted_join sits in the DEFAULT list so a
    // plain SPARK_GRAFT_GROWTH_SKEW=zipf run cannot silently skip the AQE
    // skew-mitigation assertion the rung exists to enforce — ADVICE r19)
    "q_agg_q1", "q_join_topn", "q_broadcast_join_agg", "q_salted_join",
    "q_unsalted_join",
    "q_split_count_distinct", "q_topn", "q_over_rows",
    "q_interval_join", "q_asof_join",
    // TPC-DS heavy shapes
    "q_tpcds_q14_shape", "q_tpcds_q23_shape", "q_tpcds_q28_shape",
    "q_tpcds_q47_shape",
    // streaming state (the bucketed twin is the skew-safe stream-stream
    // join plan — the un-bucketed original stays listed as the control)
    "q_stream_tumble", "q_stream_over", "q_stream_outer_join",
    "q_stream_outer_join_bucketed", "q_stream_interval_join_bucketed",
    "q_changelog_agg", "q_count_window", "q_tws_topn", "q_tws_dedup",
    // dedup / LSH / similarity
    "q_dedup_exact", "q_line_dedup", "q_bloom_dedup", "q_minhash_lsh",
    "q_simhash_banded", "q_ann_ivf", "q_cosine_topk_bucketed",
    "q_semantic_dedup",
    // CEP over the event stream
    "q_cep_next")

  /** Optional subset override (comma-separated names) — the 100x rung runs
    * the heavier slice rather than all 29. */
  def selected: Seq[String] =
    sys.env.get("SPARK_GRAFT_GROWTH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(queries)

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches the posture every committed BENCH_NOTES growth table
    // actually ran under (local[16]) — keep doc and default in agreement
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // The 1000x rung needs shuffle partitions sized to the DATA, not the
    // core count: 600M-row joins at 16 partitions put ~1.5 GB in each
    // partition's hash/sort buffers. Production sizing rule (brief):
    // partitions ~ input bytes / maxPartitionBytes; AQE coalesces the
    // excess at the small rungs, so over-provisioning is free there.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val bigDir = Tables.scratch(s"sf-growth/x$Factor-" +
      SkewMode.map(_ + "-").getOrElse("") +
      srcDir.replaceAll("[^a-zA-Z0-9]", "_"))
    // Split size is the OTHER data-sizing knob (brief: "size
    // spark.sql.files.maxPartitionBytes so partitions fit in executor
    // memory at the target SF"). History: the r17 1000x q_topn stall
    // (map-side WindowGroupLimit sort pinning a core 26 min) was FIXED by
    // the synthesizer's file LAYOUT change — facts now write
    // max(16, factor/4) hash-partitioned files, so row groups (not this
    // knob) bound the split size — and the recorded passing 1000x run used
    // the 128m default. This env var is the opt-in escape hatch for a
    // future tree whose layout can't be rewritten (drop to 32m to keep
    // each map-side sort in-memory).
    val maxPartitionBytes =
      sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_STATE_PROVIDER=rocksdb pins the off-heap RocksDB state
    // store session-wide — the production posture for 10M+ rows of keyed
    // state, where the default in-heap HDFS-backed store needs a 48g heap
    // (r15 BENCH_NOTES). TwS queries already self-select RocksDB; this
    // makes the mapGroupsWithState/stream-join families run it too.
    val spark = (sys.env.get("SPARK_GRAFT_STATE_PROVIDER") match {
      case Some("rocksdb") => builder.config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      case _ => builder
    }).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_STREAM_SINK=parquet: append-mode streaming queries write
    // a distributed file sink instead of the driver-side memory sink —
    // without it, a per-row streaming output at the 100x tree (10M rows)
    // measures the DRIVER HEAP, not the operator (see StreamingOps.SinkKey)
    sys.env.get("SPARK_GRAFT_STREAM_SINK")
      .foreach(v => spark.conf.set(graft.streaming.StreamingOps.SinkKey, v))

    val unknown = selected.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    ScaleGrowth.synthesizeAndReport(spark, srcDir, bigDir)
    // the big x big split probe needs a tree big enough to cross even the
    // container-scaled thresholds; 100x and up qualify
    if (SkewMode.isDefined && Factor >= 100) skewSplitProbe(spark, bigDir)
    sys.env.get("SPARK_GRAFT_ORDERED_PROBE")
      .foreach(mf => orderedFeedProbe(spark, bigDir, mf))
    spark.stop()
  }

  /** EVERY query is timed through a checksum aggregate over every output
    * column — xxhash64 forces each expression to evaluate, the single
    * scalar agg adds no shuffle of substance, and nothing materializes
    * driver-side beyond one row.
    *
    * History of why this is unconditional: r15 caught `count()` pruning
    * map-only projections (the timing measured scan + row-count); the fix
    * was a name list of checksum-timed queries. r18 caught the SECOND
    * instance of the same caveat one operator family over: under count(),
    * ColumnPruning drops an UNCONSUMED Window node entirely (probed:
    * q_over_rows' counted plan has no Window at all), so every
    * pure-window-projection growth number was a bare scan timing. A name
    * list per pruning-susceptible operator family loses by induction —
    * checksum everything instead. (Queries whose ranks/filters consume the
    * window — q_topn — were never affected; their numbers stand.) */
  private def time(spark: SparkSession, name: String, dir: String): Double =
    timeAndCount(spark, name, dir)._1

  /** Also returns the OUTPUT row count (free — same single-row aggregate):
    * skew runs need it, because a hot key can legitimately grow a join's
    * output quadratically in per-key density and the wall number is only
    * interpretable next to the cardinality it produced. */
  private def timeAndCount(spark: SparkSession, name: String,
      dir: String): (Double, Long) = {
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, dir)
    import org.apache.spark.sql.functions.{col, expr, xxhash64}
    // bit_xor: order-independent and cannot overflow (sum of row hashes
    // trips ANSI long-overflow within a few million rows)
    val row = df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
      .agg(expr("bit_xor(h)"), expr("count(1)")).collect()(0)
    ((System.nanoTime() - t0) / 1e9, row.getLong(1))
  }

  /** Post-timing plan audit for [[expectAqeSkewSplit]] on a skewed tree:
    * re-run the checksum action and require the FINAL adaptive plan to
    * carry a SKEW-IMMUNE join shape — either AQE's skew-split sort-merge
    * join (`skew=true`) or a BroadcastHashJoin (measured outcome at the
    * 1000x zipf tree: AQE's runtime stats demote the join to a broadcast
    * of the projected 2-column supplier side, under which the hot key
    * never shuffles at all — strictly better than splitting). A plain
    * unsplit SMJ on the tree built to trigger mitigation still fails the
    * rung loudly — that IS the silent straggler. The split itself is
    * proven where broadcast is impossible: [[skewSplitProbe]]. */
  private def assertSkewHandled(spark: SparkSession, name: String, dir: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    import org.apache.spark.sql.functions.{col, expr, xxhash64}
    val c = df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
      .agg(expr("bit_xor(h)"))
    c.collect()
    val p = c.queryExecution.executedPlan.toString
    if (p.contains("skew=true")) "skew-split"
    else if (p.contains("BroadcastHashJoin")) "broadcast"
    else "UNMITIGATED"
  }

  /** The BIG x BIG skew-split case — lineitem ⋈ orders on the zipf tree's
    * hot l_orderkey (~2.5% of 600M rows on one key at 1000x): the orders
    * side is fact-sized, so AQE has no broadcast escape and the ONLY
    * mitigation is the skew-join split. Runs with container-scaled split
    * thresholds (8 MB hot-partition floor / 4 MB advisory instead of
    * the 256/64 MB defaults, scoped to this probe): AQE's thresholds are
    * ABSOLUTE bytes sized for production executors, and this 16-core
    * container's whole shuffle is what one executor handles in
    * production — the 5x-median RELATIVE criterion is untouched, which
    * is the one that detects skew. Asserts `skew=true` in the final
    * adaptive plan and reports wall + rows. */
  private def skewSplitProbe(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.{col, count, expr, lit, xxhash64}
    // 512 partitions pins PRODUCTION granularity for the relative 5x-median
    // criterion: a 2.5%-of-table hot key is 13x a 1/512 median but only
    // 1.6x a 1/64 one — at coarse granularity AQE correctly says "nothing
    // here is skewed relative to these huge partitions", which is the
    // container lying about the cluster, not the detector failing.
    val scoped = Seq(
      "spark.sql.shuffle.partitions" -> "512",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4MB")
    val saved = scoped.map { case (k, _) => k -> spark.conf.getOption(k) }
    scoped.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val t0 = System.nanoTime()
      val l = Tables.t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val o = Tables.t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), expr("sum(l_extendedprice)").as("rev"))
      val c = j.select(xxhash64(col("o_orderpriority"), col("cnt"), col("rev")).as("h"))
        .agg(expr("bit_xor(h)"), expr("count(1)"))
      c.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val p = c.queryExecution.executedPlan.toString
      val fired = p.contains("skew=true")
      println(f"[growth] skew_split_probe lineitem_x_orders sec=$sec%.2f " +
        s"aqe_skew_split=$fired")
      require(fired,
        "lineitem x orders on the zipf tree did not trigger AQE's skew-join " +
          "split — the big x big case has no other mitigation")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Mitigation (a) for the r19 stream-stream-join skew finding, measured:
    * replay the SAME events feed TIME-ORDERED across many files with
    * `maxFilesPerTrigger` bounding each micro-batch, so the watermark
    * advances and evicts join state between batches — per-key live state
    * is then bounded by the join interval plus one batch's time span,
    * independent of key heat. This is a DEPLOYMENT posture (how a
    * production pipeline feeds the join: time-ordered Kafka topics /
    * bounded triggers), not a plan change; the plan-level fix is the
    * bucketed twin. The probe stages events range-partitioned by ts
    * (equal timestamps co-locate, so batch k+1 is strictly later than
    * batch k — nothing is ever late under the 0s watermark), stamps file
    * mtimes in range order (the file-stream source orders by modification
    * time), times q_stream_outer_join over the ordered feed, and requires
    * the output checksum to equal the batch-computed emission rule
    * (matched pairs + unmatched purchases whose window closed under the
    * final combined watermark — the committed oracle, mirrored in Spark).
    * Enable with SPARK_GRAFT_ORDERED_PROBE=<maxFilesPerTrigger>. */
  private def orderedFeedProbe(spark: SparkSession, dir: String,
      maxFiles: String): Unit = {
    import org.apache.spark.sql.functions._
    val nFiles = 64
    val ord = Tables.scratch("sf-growth/ordered-" +
      new java.io.File(dir).getName)
    val marker = new java.io.File(s"$ord/_ORDERED_OK_$nFiles")
    if (!marker.exists) {
      Tables.t(spark, dir, "events")
        .repartitionByRange(nFiles, col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(s"$ord/events.parquet")
      val parts = new java.io.File(s"$ord/events.parquet").listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      // range partition i writes part-0000i: lexical order IS time order;
      // stamp mtimes to match, 2s apart (the source sorts by mtime in ms)
      val base = System.currentTimeMillis() - parts.length * 2000L
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(base + i * 2000L) }
      marker.createNewFile()
    }
    // expected output: the oracle's emission rule computed in batch (ms
    // precision exactly as the committed DuckDB oracle states it)
    def side(t: String, a: String) = Tables.t(spark, dir, "events")
      .filter(col("event_type") === t)
      .select(col("event_id").as(s"${a}_id"), col("user_id").as(s"${a}_uid"),
        col("ts").as(s"${a}_ts"))
    val p = side("purchase", "p")
    val c = side("click", "c")
    val wmMs = math.min(
      p.agg(max(expr("unix_micros(p_ts) DIV 1000"))).collect()(0).getLong(0),
      c.agg(max(expr("unix_micros(c_ts) DIV 1000"))).collect()(0).getLong(0))
    val onExpr = "p_uid = c_uid AND c_ts >= p_ts AND " +
      "c_ts <= p_ts + INTERVAL 10 MINUTES"
    val matched = p.join(c, expr(onExpr)).select(col("p_id"), col("c_id"))
    val unmatchedClosed = p.join(c, expr(onExpr), "left_anti")
      .filter(expr(s"unix_micros(p_ts) DIV 1000 + 600000 <= ${wmMs}L"))
      .select(col("p_id"), lit(null).cast("long").as("c_id"))
    val exp = matched.unionAll(unmatchedClosed)
      .select(xxhash64(col("p_id"), col("c_id")).as("h"))
      .agg(expr("bit_xor(h)"), expr("count(1)")).collect()(0)

    val scoped = Seq(
      graft.streaming.StreamingOps.MaxFilesKey -> maxFiles,
      graft.streaming.StreamingOps.SinkKey -> "parquet")
    val saved = scoped.map { case (k, _) => k -> spark.conf.getOption(k) }
    scoped.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries("q_stream_outer_join")(spark, ord)
      val got = df.select(xxhash64(col("p_id"), col("c_id")).as("h"))
        .agg(expr("bit_xor(h)"), expr("count(1)")).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[growth] ordered_feed_probe q_stream_outer_join " +
        f"sec=$sec%.2f rows=${got.getLong(1)} maxFilesPerTrigger=$maxFiles " +
        s"match=${got == exp}")
      require(got.getLong(1) == exp.getLong(1) && got.getLong(0) == exp.getLong(0),
        s"ordered replay diverged from the emission rule: got $got expected $exp")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  def synthesizeAndReport(spark: SparkSession, srcDir: String,
      bigDir: String): Unit = {
    val tSynth0 = System.nanoTime()
    ScaleData.synthesize(spark, srcDir, bigDir, Factor, skew = SkewMode.isDefined)
    val synthSec = (System.nanoTime() - tSynth0) / 1e9

    // warm both trees (parquet listing + JVM/codegen first-touch), then the
    // same family warm-ups Bench uses so first-touch state-store/codegen
    // costs don't land on an arbitrary gate query
    for (d <- Seq(srcDir, bigDir); t <- Tables.names)
      Tables.t(spark, d, t).count()
    def warm(name: String, dir: String): Unit =
      try { SparkEntry.queries(name)(spark, dir).count(); () }
      catch { case _: Throwable => () }
    val tiny = "/root/testdata/sf0.001"
    val cepDir =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(tiny))) tiny
      else srcDir
    Seq("q_cep_next", "q_stream_outer_join", "q_changelog_agg",
      "q_stream_over", "q_tws_topn", "q_minhash_lsh", "q_simhash")
      .foreach(warm(_, cepDir))
    // CDC feeds are INPUT staging — the topic a deployment already has —
    // not the replay pipeline under test: pre-stage them (disk-cached per
    // tree) so a q_cdc_* gate row times the consumer (gzip decode + keyed
    // upsert across micro-batches), not to_json+gzip of half a billion
    // feed lines inside the first timed invocation (r21, verdict item 9)
    if (selected.exists(_.startsWith("q_cdc"))) {
      val t0 = System.nanoTime()
      for (d <- Seq(srcDir, bigDir)) {
        sources.CdcFormats.writeDebeziumFeedPhased(spark, d)
        sources.CdcFormats.writeDebeziumFeedReplayed(spark, d)
        sources.CdcFormats.writeDebeziumFeed(spark, d)
      }
      println(f"[growth] cdc_feed_staging sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }

    val rows = selected.map { name =>
      val t1 = time(spark, name, srcDir)
      val (t10a, bigRows) = timeAndCount(spark, name, bigDir)
      // incremental line per query: a crash mid-slice (disk-full spill,
      // OOM) must not lose the numbers already measured
      println(f"[growth] $name base=$t1%.2f x$Factor=$t10a%.2f rows=$bigRows")
      // one drift re-run for anything over the line — a load spike doesn't
      // repeat, a complexity-class problem does
      val t10 =
        if (t10a > MaxGrowth * t1 && t10a > MinWall)
          math.min(t10a, time(spark, name, bigDir))
        else t10a
      if (SkewMode.isDefined && expectAqeSkewSplit.contains(name)) {
        val how = assertSkewHandled(spark, name, bigDir)
        println(s"[growth] $name skew_mitigation=$how")
        // small trees stay under every absolute threshold — report
        // without failing there; the full rungs must prove mitigation
        require(how != "UNMITIGATED" || Factor < 100,
          s"$name on the zipf tree planned an unmitigated shuffle join — " +
            "the rung exists to prove a skew-immune shape fires")
      }
      (name, t1, t10)
    }
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    println(s"\n| query | base s | ${Factor}x s | growth | verdict |")
    println(s"|---|---|---|---|---|")
    val flagged = Seq.newBuilder[String]
    rows.sortBy { case (_, t1, t10) => -(t10 / math.max(t1, 0.05)) }
      .foreach { case (name, t1, t10) =>
        val g = t10 / math.max(t1, 0.05)
        val verdict =
          if (t10 < MinWall) "fixed-cost"
          else if (g <= MaxGrowth) "linear-ok"
          else { flagged += name; "SUPER-LINEAR" }
        println(s"| $name | ${fmt(t1)} | ${fmt(t10)} | ${fmt(g)}x | $verdict |")
      }
    val flaggedJson = flagged.result().map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val total1 = rows.map(_._2).sum
    val total10 = rows.map(_._3).sum
    println(s"""{"metric":"growth${Factor}x","synth_sec":${fmt(synthSec)},""" +
      s""""total_base":${fmt(total1)},"total_big":${fmt(total10)},""" +
      s""""overall_growth":${fmt(total10 / total1)},"factor":$Factor,""" +
      s""""n_queries":${rows.size},"super_linear":$flaggedJson,""" +
      s""""max_growth":$MaxGrowth,"skew":"${SkewMode.getOrElse("uniform")}",""" +
      s""""src":"$srcDir"}""")
  }
}
