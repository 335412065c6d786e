package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float], dim 64 in the fixtures).
  *
  * Baseline: brute-force cosine top-k — a cross join whose inner product runs
  * entirely inside codegen'd higher-order functions (zip_with + aggregate),
  * no UDFs. Scale path: bucketed search (qCosineTopKBucketed) — restrict the
  * candidate set to a coarse partition (here the pre-assigned `label`,
  * standing in for an IVF cell id), turning the O(N^2) cross join into
  * sum of per-bucket squares; at 100 TB this is the difference between
  * infeasible and a routine co-partitioned join on the cell id.
  *
  * Ranking is by the ROUNDED (6 dp) similarity with neighbor-id tiebreak, so
  * ulp differences between engines cannot flip ranks in the oracle compare.
  */
object SimilarityOps {

  import org.apache.spark.sql.graft.VectorFunctions.dotProduct

  private def withNorm(df: DataFrame, idAs: String, vecAs: String): DataFrame =
    df.select(
      col("vec_id").as(idAs),
      col("embedding").as(vecAs),
      col("label").as(s"${idAs}_label"))
      // norm computed once per row via the native codegen'd dot product;
      // float elements widen exactly to double, matching the oracle's
      // CAST(embedding AS DOUBLE[]) semantics bit-for-bit
      .withColumn(s"${vecAs}_norm", sqrt(dotProduct(col(vecAs), col(vecAs))))

  private def cosine(a: String, b: String): org.apache.spark.sql.Column =
    dotProduct(col(a), col(b)) / (col(s"${a}_norm") * col(s"${b}_norm"))

  /** Brute-force cosine top-3 per query vector (self excluded). Ranking via
    * the bounded TopKAggregator: partial aggregation keeps only 3 leaders per
    * query per map task, so the exchange carries leaderboards instead of the
    * full N^2 similarity relation (the window formulation shuffles it all). */
  val qCosineTopK: Q = Q(
    "q_cosine_topk",
    (s, dir) => {
      import s.implicits._
      val e = Tables.t(s, dir, "embeddings")
      val qs = withNorm(e, "qid", "qv")
      val cs = withNorm(e, "cid", "cv")
      val topk = udaf(new TopKAggregator(3),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaLong))
      qs.crossJoin(cs)
        .filter($"qid" =!= $"cid")
        .select($"qid", $"cid", round(cosine("qv", "cv"), 6).as("sim"))
        .groupBy($"qid")
        .agg(topk($"sim", $"cid").as("top"))
        .select($"qid", posexplode($"top"))
        .select($"qid", col("col._2").as("cid"), col("col._1").as("sim"),
          ($"pos" + 1).cast("int").as("rn"))
        .orderBy($"qid", $"rn")
    },
    Some("""SELECT qid, cid, sim, rn FROM (
           |  SELECT a.vec_id AS qid, b.vec_id AS cid,
           |         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
           |                                      CAST(b.embedding AS DOUBLE[])), 6) AS sim,
           |         CAST(row_number() OVER (
           |           PARTITION BY a.vec_id
           |           ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
           |                                                 CAST(b.embedding AS DOUBLE[])), 6) DESC,
           |                    b.vec_id) AS INTEGER) AS rn
           |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
           |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin))

  /** Bucketed (IVF-style) cosine top-3: candidates restricted to the query's
    * coarse cell (label). The join is an equi-join on the cell id — shuffle
    * co-partitioned, no cross product across cells. */
  val qCosineTopKBucketed: Q = Q(
    "q_cosine_topk_bucketed",
    (s, dir) => {
      import s.implicits._
      val e = Tables.t(s, dir, "embeddings")
      val qs = withNorm(e, "qid", "qv")
      val cs = withNorm(e, "cid", "cv")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"sim".desc, $"cid")
      qs.join(cs, $"qid_label" === $"cid_label" && $"qid" =!= $"cid")
        .select($"qid", $"cid", round(cosine("qv", "cv"), 6).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .orderBy($"qid", $"rn")
    },
    Some("""SELECT qid, cid, sim, rn FROM (
           |  SELECT a.vec_id AS qid, b.vec_id AS cid,
           |         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
           |                                      CAST(b.embedding AS DOUBLE[])), 6) AS sim,
           |         CAST(row_number() OVER (
           |           PARTITION BY a.vec_id
           |           ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
           |                                                 CAST(b.embedding AS DOUBLE[])), 6) DESC,
           |                    b.vec_id) AS INTEGER) AS rn
           |  FROM embeddings a JOIN embeddings b
           |    ON a.label = b.label AND a.vec_id <> b.vec_id)
           |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin))

  /** Embedding-cosine near-duplicate pairs: sim >= 0.95 within a bucket. */
  val qEmbedNearDup: Q = Q(
    "q_embed_near_dup",
    (s, dir) => {
      import s.implicits._
      val e = Tables.t(s, dir, "embeddings")
      val qs = withNorm(e, "qid", "qv")
      val cs = withNorm(e, "cid", "cv")
      qs.join(cs, $"qid_label" === $"cid_label" && $"qid" < $"cid")
        .withColumn("sim", round(cosine("qv", "cv"), 6))
        .filter($"sim" >= 0.95)
        .select($"qid".as("vec_a"), $"cid".as("vec_b"), $"sim")
        .orderBy($"vec_a", $"vec_b")
    },
    Some("""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
           |                                    CAST(b.embedding AS DOUBLE[])), 6) AS sim
           |FROM embeddings a JOIN embeddings b
           |  ON a.label = b.label AND a.vec_id < b.vec_id
           |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
           |                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.95
           |ORDER BY vec_a, vec_b""".stripMargin))

  val all: Seq[Q] = Seq(qCosineTopK, qCosineTopKBucketed, qEmbedNearDup)
}
