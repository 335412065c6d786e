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
}
