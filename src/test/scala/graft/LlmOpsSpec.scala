package graft

import org.apache.spark.sql.functions._

class LlmOpsSpec extends GraftSpec {

  test("cosine top-k: every query has exactly 3 ranked neighbors, sim in [-1,1]") {
    val rows = operators.SimilarityOps.qCosineTopK.run(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length == 3))
    rows.foreach { r =>
      val sim = r.getDouble(2)
      assert(sim >= -1.000001 && sim <= 1.000001)
    }
    // ranks ordered by sim desc within each query
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(sorted.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
    }
  }

  test("bucketed top-k is a subset-ranking of same-label candidates") {
    val e = Tables.t(spark, sfDir, "embeddings")
    val labels = e.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    operators.SimilarityOps.qCosineTopKBucketed.run(spark, sfDir).collect().foreach { r =>
      assert(labels(r.getLong(0)) == labels(r.getLong(1)), "neighbor crossed bucket")
    }
  }

  test("exact dedup fingerprints are one per distinct normalized text") {
    val docs = Tables.t(spark, sfDir, "documents")
    val distinctTexts = docs
      .select(trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("t"))
      .distinct().count()
    assert(operators.DedupOps.qDedupExact.run(spark, sfDir).count() == distinctTexts)
  }

  test("ngram jaccard pairs are symmetric-free (a < b) and within (0,1]") {
    operators.DedupOps.qNgramJaccard.run(spark, sfDir).collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0)
    }
  }

  test("minhash LSH candidates cover all high-jaccard pairs (recall check)") {
    val jac = operators.DedupOps.qNgramJaccard.run(spark, sfDir).collect()
      .filter(_.getDouble(2) >= 0.9).map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = operators.DedupOps.qMinhashLsh.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = jac -- cand
    assert(missed.isEmpty, s"LSH missed near-identical pairs: $missed")
  }

  test("simhash of identical texts is identical") {
    val fps = operators.DedupOps.qSimhash.run(spark, sfDir)
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("t"))
    val joined = fps.join(docs, "doc_id")
      .groupBy("t").agg(countDistinct("simhash").as("n")).collect()
    joined.foreach(r => assert(r.getLong(1) == 1L))
  }

  test("banded simhash finds exactly the same hd<=6 pairs as the full self-join") {
    val full = operators.DedupOps.qSimhashPairs.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = operators.DedupOps.qSimhashBanded.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == full, s"missing=${full -- banded} extra=${banded -- full}")
  }

  test("lang_id scores are deterministic and pred is one of the four langs") {
    val rows = operators.TextOps.qLangId.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("pred")).toSet.subsetOf(Set("en", "de", "es", "fr")))
  }

  test("quality score within [0,1] and token counts positive") {
    operators.TextOps.qQualityScore.run(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Int]("n_tok") > 0)
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0, s"quality $q out of range")
    }
  }

  test("PII mask: every entity family masked, placeholders present, no residue") {
    val rows = operators.TextOps.qPiiMask.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val masked = r.getAs[String]("masked")
      // the synthetic appendix guarantees at least one of each family
      assert(r.getAs[Int]("n_email") >= 1)
      assert(r.getAs[Int]("n_ip") >= 1)
      assert(r.getAs[Int]("n_phone") >= 1)
      assert(masked.contains("[EMAIL]") && masked.contains("[IP]") &&
        masked.contains("[PHONE]"))
      // nothing PII-shaped survives the pass
      assert(!masked.contains("@example.com"), s"email residue: $masked")
      assert(!"\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b".r
        .findFirstIn(masked).isDefined, s"IP residue")
      assert(!"\\+\\d{2}-\\d{3}-\\d{4}".r.findFirstIn(masked).isDefined,
        s"phone residue")
    }
    // a clean text passes through byte-identical (masking is surgical)
    val sparkS = spark
    import sparkS.implicits._
    val clean = Seq((1L, "no personal data in this sentence")).toDF("doc_id", "text")
    val out = clean.select(
      regexp_replace($"text",
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]").as("m"))
      .collect().head.getString(0)
    assert(out == "no personal data in this sentence")
  }

  test("line dedup: kept spans globally unique, order preserved, non-vacuous") {
    val rows = operators.TextOps.qLineDedup.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every 5-token chunk across all cleaned texts appears exactly once
    val allChunks = rows.flatMap { r =>
      val c = r.getAs[String]("cleaned")
      if (c.isEmpty) Array.empty[String]
      else c.split(" ").grouped(5).map(_.mkString(" ")).toArray
    }
    assert(allChunks.length == allChunks.distinct.length,
      "a duplicate span survived the scrub")
    // the scrub is non-vacuous and never invents content
    assert(rows.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_chunks")))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_chunks"))
      if (r.getAs[Long]("n_kept") == 0) assert(r.getAs[String]("cleaned").isEmpty)
    }
  }

  test("bloom prefilter: no false negatives, real pruning, exact after confirm") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.graft.BloomFunctions
    import org.apache.spark.sql.functions._
    val corpus = (0 until 1000).map(i => s"member-$i").toDF("v")
    val bloom = corpus
      .agg(BloomFunctions.bloomFilterAgg($"v", 1000L).as("bf"))
      .head().getAs[Array[Byte]](0)
    val probes = ((0 until 1000).map(i => s"member-$i") ++
      (0 until 10000).map(i => s"absent-$i")).toDF("v")
    val passed = probes
      .filter(BloomFunctions.mightContain(lit(bloom), $"v"))
      .as[String].collect().toSet
    // NO false negatives: every true member passes the prefilter
    (0 until 1000).foreach(i => assert(passed.contains(s"member-$i")))
    // real pruning: default FP rate (3%) keeps the absent side mostly out
    val fps = passed.count(_.startsWith("absent-"))
    assert(fps < 1000, s"$fps false positives out of 10000 absents")
    // the confirm join makes the composition exact despite FPs
    val exact = probes.filter(BloomFunctions.mightContain(lit(bloom), $"v"))
      .join(corpus, Seq("v"), "left_semi").as[String].collect().toSet
    assert(exact == (0 until 1000).map(i => s"member-$i").toSet)
  }

  test("quality repetition survives single-token documents (sequence(1,0) guard)") {
    val sparkS = spark
    import sparkS.implicits._
    Seq((1L, "hello", "en", "web", 5L), (2L, "two words", "en", "web", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .createOrReplaceTempView("rep_docs")
    // run the same expression pipeline against the tiny view via a clone of
    // the operator's plan: a 1-token doc must yield a row, not a crash
    val out = spark.table("rep_docs")
      .withColumn("words", split($"text", " "))
      .withColumn("bigrams", org.apache.spark.sql.functions.expr(
        "CASE WHEN size(words) < 2 THEN array() " +
          "ELSE transform(sequence(1, size(words) - 1), " +
          "i -> concat_ws(' ', element_at(words, i), element_at(words, i + 1))) END"))
      .select($"doc_id", org.apache.spark.sql.functions.size($"bigrams").as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 1), out)
  }

  test("URL canonicalizer: stripping a LEADING tracking param keeps the kept query comparable") {
    val sparkS = spark
    import sparkS.implicits._
    val urls = Seq("http://h.example.com/p?utm_a=1&q=2", "http://h.example.com/p?q=2")
      .toDF("url")
    val canon = urls
      .withColumn("u", regexp_replace($"url", "#.*$", ""))
      .withColumn("u", regexp_replace($"u", "[?&](utm_[^&#=]*|fbclid)=[^&#]*", ""))
      .withColumn("u", regexp_replace($"u", "^([^?]*)&", "$1?"))
      .withColumn("u", regexp_replace($"u", "[?&]$", ""))
      .select("u").collect().map(_.getString(0)).toSet
    assert(canon == Set("http://h.example.com/p?q=2"),
      s"identical logical URLs canonicalized differently: $canon")
  }
}
