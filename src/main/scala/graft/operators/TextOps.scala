package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language-ID (stopword
  * heuristic), quality scoring, token counting, document fingerprinting.
  * All pure expression pipelines (codegen'd, no UDFs), each with an exact
  * DuckDB oracle.
  */
object TextOps {

  /** The C4-family 5-token span expression over a `toks` array column —
    * ONE definition shared by the span-dedup operators (q_line_dedup here,
    * the Bloom-prefiltered q_bloom_dedup in DedupOps): a chunk-size or
    * boundary change must move both operators together or their span
    * definitions silently diverge. */
  private[graft] val chunk5Expr: String =
    """transform(sequence(0, cast(ceil(size(toks) / 5.0) as int) - 1),
      |  i -> array_join(slice(toks, i * 5 + 1, 5), ' '))""".stripMargin

  private val stop = Map(
    "en" -> Seq("the", "and", "of", "a", "is", "to", "in"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "una", "por", "como"))

  private def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  /** Language-ID: count stopword occurrences per language over lowercased
    * whitespace tokens; deterministic priority order en > de > es > fr on
    * ties. (The fixture texts are synthetic English-vocabulary, so the point
    * is deterministic scoring, not accuracy.) */
  val qLangId: Q = Q(
    "q_lang_id",
    (s, dir) => {
      import s.implicits._
      val score = stop.map { case (l, ws) =>
        l -> expr(s"size(filter(toks, x -> x IN (${inList(ws)})))")
      }
      Tables.t(s, dir, "documents")
        .withColumn("toks", split(lower($"text"), " "))
        .select(
          $"doc_id", $"lang",
          score("en").as("s_en"), score("de").as("s_de"),
          score("fr").as("s_fr"), score("es").as("s_es"))
        .withColumn("pred",
          when($"s_en" >= $"s_de" && $"s_en" >= $"s_es" && $"s_en" >= $"s_fr", "en")
            .when($"s_de" >= $"s_es" && $"s_de" >= $"s_fr", "de")
            .when($"s_es" >= $"s_fr", "es")
            .otherwise("fr"))
        .withColumn("hit", $"pred" === $"lang")
        .orderBy($"doc_id")
    },
    Some(s"""WITH t AS (
            |  SELECT doc_id, lang, string_split(lower(text), ' ') AS toks FROM documents),
            |sc AS (
            |  SELECT doc_id, lang,
            |    CAST(len(list_filter(toks, x -> x IN (${inList(stop("en"))}))) AS INTEGER) AS s_en,
            |    CAST(len(list_filter(toks, x -> x IN (${inList(stop("de"))}))) AS INTEGER) AS s_de,
            |    CAST(len(list_filter(toks, x -> x IN (${inList(stop("fr"))}))) AS INTEGER) AS s_fr,
            |    CAST(len(list_filter(toks, x -> x IN (${inList(stop("es"))}))) AS INTEGER) AS s_es
            |  FROM t)
            |SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
            |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
            |       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
            |       WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred,
            |  (CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
            |        WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
            |        WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END) = lang AS hit
            |FROM sc ORDER BY doc_id""".stripMargin))

  /** Quality scoring: token count, mean token length, punctuation count,
    * stopword ratio, and a blended [0,1] quality score. */
  val qQualityScore: Q = Q(
    "q_quality_score",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "documents")
        .withColumn("toks", split(trim(regexp_replace($"text", "\\s+", " ")), " "))
        .withColumn("n_tok", size($"toks"))
        .withColumn("n_char", length($"text"))
        .withColumn("letters", length(regexp_replace($"text", "\\s", "")))
        .withColumn("punct", length(regexp_replace($"text", "[a-zA-Z0-9\\s]", "")))
        .withColumn("n_stop",
          expr("size(filter(toks, x -> x IN ('the', 'and', 'of', 'a', 'is', 'to', 'in')))"))
        .select(
          $"doc_id", $"n_tok", $"n_char",
          round($"letters" / $"n_tok", 6).as("avg_tok_len"),
          $"punct",
          round($"n_stop" / $"n_tok", 6).as("stop_ratio"),
          round(
            lit(0.4) * least($"n_tok" / 100.0, lit(1.0)) +
              lit(0.3) * (lit(1.0) - $"punct" / $"n_char") +
              lit(0.3) * least(lit(5.0) * $"n_stop" / $"n_tok", lit(1.0)), 6)
            .as("quality"))
        .orderBy($"doc_id")
    },
    Some("""WITH x AS (
           |  SELECT doc_id,
           |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS toks,
           |    CAST(length(text) AS INTEGER) AS n_char,
           |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS INTEGER) AS letters,
           |    CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS INTEGER) AS punct,
           |    CAST(len(list_filter(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
           |         x -> x IN ('the', 'and', 'of', 'a', 'is', 'to', 'in'))) AS INTEGER) AS n_stop
           |  FROM documents)
           |SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tok, n_char,
           |  round(letters / CAST(len(toks) AS INTEGER), 6) AS avg_tok_len,
           |  punct,
           |  round(n_stop / CAST(len(toks) AS INTEGER), 6) AS stop_ratio,
           |  round(0.4 * least(len(toks) / 100.0, 1.0)
           |      + 0.3 * (1.0 - punct / n_char)
           |      + 0.3 * least(5.0 * n_stop / len(toks), 1.0), 6) AS quality
           |FROM x ORDER BY doc_id""".stripMargin))

  /** Token counting: whitespace tokens, unique tokens, and a BPE-ish regex
    * tokenization (letter runs / digit runs / single punctuation). */
  val qTokenCount: Q = Q(
    "q_token_count",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "documents")
        .withColumn("toks", split(trim(regexp_replace($"text", "\\s+", " ")), " "))
        .select(
          $"doc_id",
          size($"toks").as("n_tokens"),
          size(array_distinct($"toks")).as("n_unique"),
          length($"text").as("n_chars_calc"),
          size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)")).as("n_bpeish"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
           |  CAST(len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS INTEGER) AS n_tokens,
           |  CAST(len(list_distinct(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))) AS INTEGER) AS n_unique,
           |  CAST(length(text) AS INTEGER) AS n_chars_calc,
           |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS n_bpeish
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Positional document fingerprint: xor-fold of md5-derived 31-bit token
    * hashes weighted by position (cross-engine-stable stand-in for a rolling
    * hash; reference analogue: content-defined chunking fingerprints). */
  val qFingerprint: Q = Q(
    "q_doc_fingerprint",
    (s, dir) => {
      import s.implicits._
      // per-row fold (no explode/shuffle): xor of position-weighted token
      // hashes, identical math to the oracle's unnest formulation
      Tables.t(s, dir, "documents")
        .select($"doc_id",
          split(trim(regexp_replace(lower($"text"), "\\s+", " ")), " ").as("toks"))
        .select($"doc_id",
          expr("""aggregate(
                 |  transform(sequence(0, size(toks) - 1), i ->
                 |    (cast(conv(substring(md5(toks[i]), 1, 8), 16, 10) as bigint) % 2147483647)
                 |    * ((i % 61) + 1)),
                 |  0L, (acc, x) -> acc ^ x)""".stripMargin).as("fp"),
          size($"toks").cast("long").as("n_tokens"))
        .orderBy($"doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id,
           |         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
           |  FROM documents),
           |x AS (
           |  SELECT doc_id,
           |    unnest(list_transform(range(1, len(toks) + 1),
           |      i -> (CAST(('0x' || substr(md5(toks[i]), 1, 8)) AS BIGINT) % 2147483647)
           |           * (((i - 1) % 61) + 1))) AS v
           |  FROM t)
           |SELECT doc_id, bit_xor(v) AS fp, count(*) AS n_tokens
           |FROM x GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Deterministic stratified train/val/test split — the assignment a
    * training-data pipeline must be able to REPRODUCE run-over-run and
    * engine-over-engine: split = fixed md5-derived hash of doc_id mod 100
    * (80/10/10), never a random() (nondeterministic, partition-order
    * dependent, and irreproducible across engines). Stratification check =
    * per (lang, source, split) counts + char mass; at 100 TB the same
    * expression tags each row in-place with zero shuffles — the groupBy
    * here is only the audit view. */
  val qStratifiedSplit: Q = Q(
    "q_stratified_split",
    (s, dir) => {
      import s.implicits._
      val bucket = graft.functions.FlinkFunctions
        .md5Hash31($"doc_id".cast("string")) % 100
      Tables.t(s, dir, "documents")
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy($"lang", $"source", $"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"))
        .orderBy($"lang", $"source", $"split")
    },
    Some("""SELECT lang, source, split, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS chars
           |FROM (
           |  SELECT lang, source, n_chars,
           |         CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
           |              ELSE 'test' END AS split
           |  FROM (SELECT lang, source, n_chars,
           |          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           |            % 2147483647 % 100 AS h
           |        FROM documents))
           |GROUP BY lang, source, split ORDER BY lang, source, split""".stripMargin))

  /** Benchmark decontamination: flag training docs sharing word-3-grams with
    * a probe set (in production: the eval benchmarks' n-grams; here: the
    * corpus' own top-5 shingles so the probes deterministically hit). The
    * 100 TB shape is exactly this plan — the probe set is tiny and
    * BROADCAST, the shingle relation is linear in the corpus and reuses the
    * session-materialized signature store shared with the dedup family. */
  val qContamination: Q = Q(
    "q_contamination",
    (s, dir) => {
      import s.implicits._
      val sh = DedupOps.shinglesM(s, dir) // the ONE shared shingle relation
      val probes = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
        .orderBy($"df".desc, $"sh").limit(5).select($"sh")
      sh.join(broadcast(probes), "sh")
        .groupBy($"doc_id").agg(count(lit(1)).as("n_hits"))
        .orderBy($"doc_id")
    },
    Some(s"""WITH ${DedupOps.shinglesSql},
            |probes AS (
            |  SELECT sh FROM (
            |    SELECT sh, count(*) AS df FROM sh_rel
            |    GROUP BY sh ORDER BY df DESC, sh LIMIT 5))
            |SELECT doc_id, count(*) AS n_hits
            |FROM sh_rel JOIN probes USING (sh)
            |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** End-to-end training-data pipeline in ONE declarative plan: length
    * filter → exact dedup (keep lowest doc_id per content fingerprint) →
    * deterministic stratified split → per-(lang, split) corpus stats. The
    * point is composability: the stages fuse into a single Catalyst plan
    * (one dedup shuffle + one agg shuffle), which is how the operators are
    * meant to be used at 100 TB — not as separate materialized passes. */
  val qPipelineE2e: Q = Q(
    "q_pipeline_e2e",
    (s, dir) => {
      import s.implicits._
      val norm = trim(regexp_replace(lower($"text"), "\\s+", " "))
      val bucket = graft.functions.FlinkFunctions
        .md5Hash31($"doc_id".cast("string")) % 100
      Tables.t(s, dir, "documents")
        .withColumn("n_tok", size(split(norm, " ")))
        .filter($"n_tok" >= 20)
        .withColumn("fp", md5(norm))
        .groupBy($"fp")
        .agg(min_by(struct($"doc_id", $"lang", $"n_chars"), $"doc_id").as("keep"))
        .select($"keep.doc_id", $"keep.lang", $"keep.n_chars")
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"))
        .orderBy($"lang", $"split")
    },
    Some("""WITH filtered AS (
           |  SELECT doc_id, lang, n_chars,
           |         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
           |  FROM documents
           |  WHERE len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) >= 20),
           |deduped AS (
           |  SELECT arg_min(doc_id, doc_id) AS doc_id,
           |         arg_min(lang, doc_id) AS lang,
           |         arg_min(n_chars, doc_id) AS n_chars
           |  FROM filtered GROUP BY fp)
           |SELECT lang,
           |       CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
           |            ELSE 'test' END AS split,
           |       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
           |FROM (SELECT lang, n_chars,
           |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           |          % 2147483647 % 100 AS h
           |      FROM deduped)
           |GROUP BY lang, split ORDER BY lang, split""".stripMargin))

  /** Gopher-style REPETITION quality metrics (Rae et al. 2021 §A1.1, the
    * standard pre-training repetition filters): per document, the fraction
    * of tokens taken by the single most frequent word and the fraction of
    * duplicate 2-grams. Pure per-row higher-order functions — no shuffle,
    * no explode; at 100 TB this runs as a narrow projection over the corpus
    * scan (HOF lambdas evaluate interpreted inside the projection — the
    * cost stays per-row and embarrassingly parallel), which is exactly how
    * repetition filtering is deployed. */
  val qQualityRepetition: Q = Q(
    "q_quality_repetition",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "documents")
        .withColumn("words", split($"text", " "))
        .withColumn("bigrams", expr(
          // guard the single-token document: sequence(1, 0) is the
          // DESCENDING [1, 0] in Spark and element_at(words, 0) always
          // throws — an empty bigram list matches DuckDB's empty range(1,1)
          "CASE WHEN size(words) < 2 THEN array() " +
            "ELSE transform(sequence(1, size(words) - 1), " +
            "i -> concat_ws(' ', element_at(words, i), element_at(words, i + 1))) END"))
        .select($"doc_id",
          round(expr(
            "array_max(transform(array_distinct(words), " +
              "w -> size(filter(words, x -> x = w)))) / size(words)"), 6)
            .as("top_word_frac"),
          round(expr("1.0 - size(array_distinct(bigrams)) / size(bigrams)"), 6)
            .as("dup_bigram_frac"))
        .orderBy($"doc_id")
    },
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
           |b AS (SELECT doc_id, words,
           |             list_transform(range(1, len(words)),
           |                            i -> words[i] || ' ' || words[i+1]) AS bigrams
           |      FROM w)
           |SELECT doc_id,
           |       round(list_max(list_transform(list_distinct(words),
           |             w -> len(list_filter(words, x -> x = w)))) * 1.0
           |             / len(words), 6) AS top_word_frac,
           |       round(1.0 - len(list_distinct(bigrams)) * 1.0 / len(bigrams), 6)
           |         AS dup_bigram_frac
           |FROM b ORDER BY doc_id""".stripMargin))

  /** Per-source quota capping (the CCNet/RefinedWeb per-domain cap that
    * keeps one domain from dominating the corpus): keep at most K docs per
    * source, deterministically (lowest doc_id first), and report what the
    * cap kept vs dropped. One shuffle on source; at 100 TB the rank is a
    * WindowGroupLimit — partial top-K before the exchange, no full sort. */
  val qDomainQuota: Q = Q(
    "q_domain_quota",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val k = 10
      val ranked = Tables.t(s, dir, "documents")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"source").orderBy($"doc_id")))
      ranked.groupBy($"source")
        .agg(count(lit(1)).as("n_total"),
          sum(when($"rn" <= k, 1).otherwise(0)).as("n_kept"),
          max(when($"rn" <= k, $"doc_id")).as("max_kept_doc"))
        .orderBy($"source")
    },
    Some("""SELECT source, count(*) AS n_total,
           |       CAST(sum(CASE WHEN rn <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |       max(CASE WHEN rn <= 10 THEN doc_id END) AS max_kept_doc
           |FROM (SELECT source, doc_id,
           |             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
           |      FROM documents)
           |GROUP BY source ORDER BY source""".stripMargin))

  /** Balanced mixture resampling (the corpus-mixture rebalancing step of a
    * pre-training pipeline): downsample every language class to the size of
    * the SMALLEST class, deterministically (doc_id rank — reproducible
    * mixtures, no sampling nondeterminism). The class-size lookup is a
    * #langs-row aggregate collected on the driver — metadata-sized at any
    * corpus scale (like the IVF centroid table), while the resample itself
    * is one rank shuffle. */
  val qMixtureResample: Q = Q(
    "q_mixture_resample",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.t(s, dir, "documents")
      val minClass = docs.groupBy($"lang").count()
        .agg(min("count")).first().getLong(0)
      docs.withColumn("rn",
          row_number().over(Window.partitionBy($"lang").orderBy($"doc_id")))
        .filter($"rn" <= minClass)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_kept"), sum($"doc_id").as("id_checksum"))
        .orderBy($"lang")
    },
    Some("""WITH m AS (SELECT min(cnt) AS k FROM (
           |  SELECT lang, count(*) AS cnt FROM documents GROUP BY lang)),
           |r AS (SELECT lang, doc_id,
           |             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
           |      FROM documents)
           |SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_checksum
           |FROM r, m WHERE rn <= m.k GROUP BY lang ORDER BY lang""".stripMargin))

  /** GPT-style sequence PACKING (concat-and-chunk): within each source,
    * documents are concatenated in doc_id order and the token stream is cut
    * into fixed-length training sequences (seqLen=256). Reports, per source,
    * how many chunks the corpus packs into and how many documents straddle a
    * chunk boundary (the attention-contamination metric packing audits care
    * about). One window sort per source — the 100 TB shape, since packing is
    * per-shard by construction and sources are the natural shards; no
    * driver-side loop, no second pass over the text. */
  val qSequencePack: Q = Q(
    "q_sequence_pack",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val seqLen = 256
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.t(s, dir, "documents")
        .withColumn("n_tok",
          size(split(trim(regexp_replace($"text", "\\s+", " ")), " ")).cast("long"))
        .withColumn("cum_before", coalesce(sum($"n_tok").over(w), lit(0L)))
        .withColumn("chunk_first", floor($"cum_before" / seqLen))
        .withColumn("chunk_last", floor(($"cum_before" + $"n_tok" - 1) / seqLen))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").as("total_tokens"),
          (max($"chunk_last") + 1).as("n_chunks"),
          sum(when($"chunk_first" =!= $"chunk_last", 1L).otherwise(0L))
            .as("n_boundary_docs"))
        .orderBy($"source")
    },
    Some("""WITH t AS (
           |  SELECT source, doc_id,
           |         CAST(len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tok
           |  FROM documents),
           |c AS (
           |  SELECT source, n_tok,
           |         CAST(COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
           |  FROM t)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           |       CAST(max((cum_before + n_tok - 1) // 256) + 1 AS BIGINT) AS n_chunks,
           |       CAST(sum(CASE WHEN cum_before // 256 <> (cum_before + n_tok - 1) // 256
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs
           |FROM c GROUP BY source ORDER BY source""".stripMargin))

  /** Deterministic quality-weighted importance sampling (the DSIR/CCNet-style
    * "sample the corpus proportionally to a quality weight" step, made
    * REPRODUCIBLE): acceptance probability p = min(5·stopwords/tokens, 1),
    * uniform draw u = hash(doc_id)/M with a fixed multiplicative hash — so
    * the same doc is kept in every run on every engine. The keep decision is
    * evaluated in EXACT integer arithmetic (u < p ⟺ x·n_tok < 5·n_stop·M),
    * so no float rounding can flip a row between engines. Pure per-row
    * projection + one audit agg — zero extra shuffles at 100 TB. */
  val qImportanceSample: Q = Q(
    "q_importance_sample",
    (s, dir) => {
      import s.implicits._
      val M = 1000003L // prime modulus for the unit-interval draw
      Tables.t(s, dir, "documents")
        .withColumn("toks", split(trim(regexp_replace($"text", "\\s+", " ")), " "))
        .withColumn("n_tok", size($"toks").cast("long"))
        .withColumn("n_stop", expr(
          "cast(size(filter(toks, x -> x IN ('the','and','of','a','is','to','in'))) as bigint)"))
        .withColumn("x", ($"doc_id" % M) * 2654435761L % M)
        .withColumn("keep",
          lit(5) * $"n_stop" >= $"n_tok" || $"x" * $"n_tok" < lit(5) * $"n_stop" * M)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_total"),
          sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
          sum(when($"keep", $"doc_id")).as("kept_checksum"))
        .orderBy($"lang")
    },
    Some("""WITH d AS (
           |  SELECT lang, doc_id,
           |    CAST(len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tok,
           |    CAST(len(list_filter(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
           |         x -> x IN ('the','and','of','a','is','to','in'))) AS BIGINT) AS n_stop,
           |    ((doc_id % 1000003) * 2654435761) % 1000003 AS x
           |  FROM documents)
           |SELECT lang, count(*) AS n_total,
           |  CAST(sum(CASE WHEN 5 * n_stop >= n_tok
           |                  OR x * n_tok < 5 * n_stop * 1000003
           |                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |  CAST(sum(CASE WHEN 5 * n_stop >= n_tok
           |                  OR x * n_tok < 5 * n_stop * 1000003
           |                THEN doc_id END) AS BIGINT) AS kept_checksum
           |FROM d GROUP BY lang ORDER BY lang""".stripMargin))

  /** Intra-corpus duplicate-SPAN measurement (the audit behind exact
    * substring dedup, Lee et al. 2022 "Deduplicating Training Data Makes
    * Language Models Better"): per document, how many of its word-3-gram
    * shingles also occur in ANOTHER document, and the duplicated fraction.
    * Unlike q_contamination (overlap vs a tiny external probe set) this
    * measures corpus-internal duplication: shingle document-frequency is one
    * linear aggregate over the session-materialized shingle relation shared
    * with the dedup family, the flagging join is a semi join on the shingle
    * key, and nothing is quadratic — the 100 TB plan is exactly this one. */
  val qDupSpanFrac: Q = Q(
    "q_dup_span_frac",
    (s, dir) => {
      import s.implicits._
      val sh = DedupOps.shinglesM(s, dir) // the ONE shared shingle relation
      // shingles() is distinct per (doc_id, sh), so count(*) per sh is the
      // document frequency
      val dupSh = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
        .filter($"df" > 1).select($"sh")
      val nDup = sh.join(dupSh, Seq("sh"), "left_semi")
        .groupBy($"doc_id").agg(count(lit(1)).as("n_dup"))
      sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
        .join(nDup, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_dup"))
        .select($"doc_id", $"n_sh", $"n_dup",
          round($"n_dup" / $"n_sh", 6).as("dup_frac"))
        .orderBy($"doc_id")
    },
    Some(s"""WITH ${DedupOps.shinglesSql},
            |dupsh AS (SELECT sh FROM sh_rel GROUP BY sh HAVING count(*) > 1),
            |tot AS (SELECT doc_id, count(*) AS n_sh FROM sh_rel GROUP BY doc_id),
            |dup AS (SELECT doc_id, count(*) AS n_dup
            |        FROM sh_rel JOIN dupsh USING (sh) GROUP BY doc_id)
            |SELECT t.doc_id, t.n_sh, COALESCE(d.n_dup, 0) AS n_dup,
            |       round(COALESCE(d.n_dup, 0) * 1.0 / t.n_sh, 6) AS dup_frac
            |FROM tot t LEFT JOIN dup d USING (doc_id) ORDER BY t.doc_id""".stripMargin))

  /** Token-distribution DRIFT between the train and val splits (the
    * data-mixing QA step: a reproducible split should have near-identical
    * token distributions; a KL spike means the split correlates with
    * content). Deterministic end-to-end: the split is the same md5 bucket
    * as q_stratified_split, the vocabulary is the global top-100 tokens
    * with a total tie-break order, probabilities are Laplace-smoothed
    * ratios of exact integer counts, and the 100-term KL sum is rounded to
    * 6 (float noise ~1e-14 ≪ the rounding grain). One explode+count
    * shuffle, linear in corpus tokens; the vocab join is a 100-row
    * broadcast — the 100 TB plan unchanged. */
  val qTokenDrift: Q = Q(
    "q_token_drift",
    (s, dir) => {
      import s.implicits._
      val bucket = graft.functions.FlinkFunctions
        .md5Hash31($"doc_id".cast("string")) % 100
      val toks = Tables.t(s, dir, "documents")
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .filter($"split".isin("train", "val"))
        .select($"split", explode(split(lower($"text"), " ")).as("tok"))
      val counts = toks.groupBy($"split", $"tok").agg(count(lit(1)).as("c"))
      val vocab = counts.groupBy($"tok").agg(sum($"c").as("n"))
        .orderBy($"n".desc, $"tok").limit(100).select($"tok")
      val tot = counts.groupBy($"split").agg(sum($"c").as("n_split"))
      // vocab × {train, val} grid WITHOUT a cross join (explode of a
      // 2-literal array — the sweep forbids NLJ shapes, and rightly so);
      // the grid guarantees a smoothed p for tokens absent from one split
      val grid = vocab
        .withColumn("split", explode(array(lit("train"), lit("val"))))
      val sm = grid.join(counts, Seq("tok", "split"), "left")
        .join(tot, Seq("split"))
        .select($"split", $"tok",
          ((coalesce($"c", lit(0L)) + 1).cast("double") / ($"n_split" + 100))
            .as("p"))
      val train = sm.filter($"split" === "train").select($"tok", $"p".as("pt"))
      val valp = sm.filter($"split" === "val").select($"tok", $"p".as("pv"))
      train.join(valp, "tok")
        .agg(round(sum($"pt" * log($"pt" / $"pv")), 6).as("kl_train_val"),
          count(lit(1)).as("vocab_size"))
    },
    Some("""WITH toks AS (
           |  SELECT CASE WHEN h < 80 THEN 'train' ELSE 'val' END AS split,
           |         unnest(string_split(lower(text), ' ')) AS tok
           |  FROM (SELECT text,
           |          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           |            % 2147483647 % 100 AS h
           |        FROM documents)
           |  WHERE h < 90),
           |counts AS (SELECT split, tok, count(*) AS c FROM toks GROUP BY 1, 2),
           |vocab AS (SELECT tok FROM (
           |  SELECT tok, sum(c) AS n FROM counts GROUP BY tok
           |  ORDER BY n DESC, tok LIMIT 100)),
           |tot AS (SELECT split, sum(c) AS n_split FROM counts GROUP BY split),
           |sm AS (
           |  SELECT t.split, v.tok,
           |         (COALESCE(c.c, 0) + 1) * 1.0 / (t.n_split + 100) AS p
           |  FROM vocab v CROSS JOIN tot t
           |  LEFT JOIN counts c ON c.tok = v.tok AND c.split = t.split)
           |SELECT round(sum(a.p * ln(a.p / b.p)), 6) AS kl_train_val,
           |       count(*) AS vocab_size
           |FROM sm a JOIN sm b ON a.tok = b.tok
           |WHERE a.split = 'train' AND b.split = 'val'""".stripMargin))

  /** Per-document unigram negative log-likelihood — the honest proxy for
    * the CCNet perplexity filter (production scores docs under a KenLM
    * n-gram model; the unigram corpus model keeps the pipeline shape, the
    * filtering math, and engine-reproducibility, and the proxy status is
    * disclosed here rather than faked): p(token) = Laplace-smoothed corpus
    * unigram frequency, score = mean −ln p over the doc's tokens. The
    * frequency table is vocab-sized (BROADCAST — at 100 TB the model rides
    * to the executors exactly like the KenLM binary would), the (N, V)
    * normalizer is a metadata-sized driver scalar, and scoring is one
    * explode + broadcast join + per-doc aggregate — no extra shuffle over
    * the corpus. */
  val qUnigramLogprob: Q = Q(
    "q_unigram_logprob",
    (s, dir) => {
      import s.implicits._
      val toks = Tables.t(s, dir, "documents")
        .select($"doc_id", explode(split(lower($"text"), " ")).as("tok"))
      val freq = toks.groupBy($"tok").agg(count(lit(1)).as("c"))
      val head = toks.agg(count(lit(1)), countDistinct($"tok")).head()
      val norm = head.getLong(0) + head.getLong(1) // N + V
      toks.join(broadcast(freq), "tok")
        .withColumn("nll_tok", -log(($"c" + 1).cast("double") / norm))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tok"), round(avg($"nll_tok"), 6).as("nll"))
        .orderBy($"doc_id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
           |  FROM documents),
           |freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
           |nv AS (SELECT count(*) AS n, count(DISTINCT tok) AS v FROM toks)
           |SELECT t.doc_id, count(*) AS n_tok,
           |       round(avg(-ln((f.c + 1) * 1.0 / (nv.n + nv.v))), 6) AS nll
           |FROM toks t JOIN freq f USING (tok) CROSS JOIN nv
           |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin))

  /** PII scrubbing — the redaction pass every production corpus pipeline
    * runs before training (C4 strips lines by badword list; CCNet/Dolma/
    * RefinedWeb mask emails, phone numbers, and IP addresses with typed
    * placeholder tokens): per-row regexp masking with per-doc entity counts.
    * The patterns use only RE2-and-Java-common syntax (no lookaround, no
    * backreferences) so Spark and DuckDB mask IDENTICALLY and the oracle
    * compares the full masked text, not just the counts. The fixture texts
    * contain no PII, so each row gets a deterministic doc_id-derived
    * email/IP/phone appended before masking — the masking itself is what's
    * under test. 100 TB posture: a map-only expression pass (codegen'd, no
    * shuffle, no UDF); masking order is fixed email→IP→phone so overlapping
    * pattern families rewrite deterministically. */
  val qPiiMask: Q = Q(
    "q_pii_mask",
    (s, dir) => {
      import s.implicits._
      val emailR = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipR = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phoneR = "\\+\\d{2}-\\d{3}-\\d{4}"
      val withPii = Tables.t(s, dir, "documents").select(
        $"doc_id",
        concat($"text",
          lit(" contact user"), $"doc_id".cast("string"), lit("@example.com"),
          lit(" from 10.0."), ($"doc_id" % 256).cast("string"), lit(".7"),
          lit(" call +01-555-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0")).as("text"))
      withPii.select(
        $"doc_id",
        regexp_count($"text", lit(emailR)).as("n_email"),
        regexp_count($"text", lit(ipR)).as("n_ip"),
        regexp_count($"text", lit(phoneR)).as("n_phone"),
        regexp_replace(
          regexp_replace(
            regexp_replace($"text", emailR, "[EMAIL]"),
            ipR, "[IP]"),
          phoneR, "[PHONE]").as("masked"))
        .orderBy($"doc_id")
    },
    Some("""WITH x AS (
           |  SELECT doc_id,
           |         text || ' contact user' || doc_id || '@example.com'
           |              || ' from 10.0.' || (doc_id % 256) || '.7'
           |              || ' call +01-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
           |           AS text
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
           |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ip,
           |  CAST(len(regexp_extract_all(text, '\+\d{2}-\d{3}-\d{4}')) AS INTEGER) AS n_phone,
           |  regexp_replace(
           |    regexp_replace(
           |      regexp_replace(text,
           |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
           |    '\+\d{2}-\d{3}-\d{4}', '[PHONE]', 'g') AS masked
           |FROM x ORDER BY doc_id""".stripMargin))

  /** Corpus-level span dedup with document REASSEMBLY — C4's "discard all
    * but one of any three-sentence span occurring more than once" (Raffel
    * et al. 2020 §2.2), the step that actually REWRITES documents rather
    * than just measuring duplication (`q_dup_span_frac` is the audit; this
    * is the scrub). The fixture texts have no sentence boundaries, so the
    * span unit is a fixed non-overlapping 5-token chunk. Keep-first is
    * GLOBAL and deterministic: first occurrence = minimum (doc_id, pos),
    * encoded as one BIGINT so the dedup is a plain min-aggregate.
    *
    * 100 TB posture: chunking is a per-row expression (no explode until the
    * chunk relation); keep-first is groupBy(chunk).min — PARTIAL-AGGREGATED
    * map-side, unlike a row_number window over chunk which shuffles every
    * row and collapses hot chunks onto one task; reassembly is one co-keyed
    * groupBy(doc_id) with an order-fixing array_sort, so arrival order
    * cannot leak. Two shuffles total, both linear. Empty-after-dedup
    * documents survive as empty strings (left join + coalesce), preserving
    * corpus row identity. */
  val qLineDedup: Q = Q(
    "q_line_dedup",
    (s, dir) => {
      import s.implicits._
      val chunks = Tables.t(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("toks"))
        .select($"doc_id", posexplode(expr(chunk5Expr)))
        .withColumnRenamed("col", "chunk")
        // lexicographic (doc_id, pos) struct, NOT a packed long: the r18
        // 1000x rung caught `doc_id * 2^32 + pos` overflowing — key-shifted
        // ids reach ~1e11 there and ANY bit split bets on both ranges at
        // once (the r15 star-CC fingerprint lesson, second occurrence).
        // min(struct) is the same total order with no arithmetic, valid for
        // arbitrary 64-bit ids; it still partial-aggregates map-side (as a
        // sort aggregate — structs have no mutable hash-agg buffer)
        .withColumn("ord", struct($"doc_id", $"pos"))
      val firstOrd = chunks.groupBy($"chunk").agg(min($"ord").as("min_ord"))
      val kept = chunks.join(firstOrd, "chunk").where($"ord" === $"min_ord")
      val docStats = chunks.groupBy($"doc_id").agg(count(lit(1)).as("n_chunks"))
      val rebuilt = kept.groupBy($"doc_id").agg(
        count(lit(1)).as("n_kept"),
        array_join(expr("transform(array_sort(collect_list(struct(pos, chunk))), x -> x.chunk)"),
          " ").as("cleaned"))
      docStats.join(rebuilt, Seq("doc_id"), "left")
        .select($"doc_id", $"n_chunks",
          coalesce($"n_kept", lit(0L)).as("n_kept"),
          coalesce($"cleaned", lit("")).as("cleaned"))
        .orderBy($"doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |c AS (
           |  SELECT doc_id,
           |         unnest(list_transform(range(0, CAST(ceil(len(toks) / 5.0) AS INT)),
           |           i -> {'pos': i, 'chunk': array_to_string(toks[i*5+1:i*5+5], ' ')})) AS u
           |  FROM t),
           |chunks AS (
           |  SELECT doc_id, u.pos AS pos, u.chunk AS chunk,
           |         {'doc_id': doc_id, 'pos': u.pos} AS ord
           |  FROM c),
           |first_ord AS (SELECT chunk, min(ord) AS min_ord FROM chunks GROUP BY chunk),
           |kept AS (
           |  SELECT chunks.* FROM chunks JOIN first_ord USING (chunk)
           |  WHERE ord = min_ord),
           |stats AS (SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY doc_id),
           |rebuilt AS (
           |  SELECT doc_id, count(*) AS n_kept,
           |         string_agg(chunk, ' ' ORDER BY pos) AS cleaned
           |  FROM kept GROUP BY doc_id)
           |SELECT s.doc_id, s.n_chunks,
           |       coalesce(r.n_kept, 0) AS n_kept,
           |       coalesce(r.cleaned, '') AS cleaned
           |FROM stats s LEFT JOIN rebuilt r USING (doc_id)
           |ORDER BY s.doc_id""".stripMargin))

  /** q_url_dedup: URL canonicalization + dedup — the crawl-corpus staple
    * (every web-scale pipeline dedups fetched documents by canonical URL
    * before any content-level pass; cf. CCNet/C4 preprocessing). The
    * fixture has no URL column, so deterministic VARIANT urls are derived
    * per document (scheme/host case, www prefix, trailing slash, utm_*
    * tracking params, fragments — the real-world noise classes), then
    * canonicalized with native regexps: drop fragment, strip utm_ and
    * fbclid params (keeping any other query), lowercase scheme+host, drop www.,
    * strip the trailing slash. Dedup keeps the smallest doc_id per
    * canonical URL. Map-only canonicalization + ONE hash shuffle — at
    * 100 TB this is the cheapest dedup pass there is, which is why
    * pipelines run it first. Oracle: the canonical form reconstructed
    * directly from the generating columns. */
  val qUrlDedup: Q = Q(
    "q_url_dedup",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.t(s, dir, "documents")
      val varied = docs.select($"doc_id", concat(
        when($"doc_id" % 2 === 0, lit("HTTP://WWW.")).otherwise(lit("http://")),
        when($"doc_id" % 2 === 0, upper($"source")).otherwise($"source"),
        lit(".Example.COM/articles/"), ($"doc_id" % 40).cast("string"),
        when($"doc_id" % 3 === 0, lit("/")).otherwise(lit("")),
        when($"doc_id" % 5 === 0, lit("?utm_source=feed&utm_campaign=x"))
          .otherwise(lit("")),
        when($"doc_id" % 7 === 0, lit("#section-2")).otherwise(lit("")))
        .as("url"))
      val canon = varied
        .withColumn("u", regexp_replace($"url", "#.*$", ""))
        .withColumn("u",
          regexp_replace($"u", "[?&](utm_[^&#=]*|fbclid)=[^&#]*", ""))
        // stripping a LEADING tracking param eats the '?': promote the
        // first remaining '&' back to '?' so ...?utm_a=1&q=2 and ...?q=2
        // canonicalize identically ("keeping any other query" contract)
        .withColumn("u", regexp_replace($"u", "^([^?]*)&", "$1?"))
        .withColumn("u", regexp_replace($"u", "[?&]$", ""))
        .withColumn("host", lower(regexp_extract($"u", "^(?i)https?://([^/?#]*)", 1)))
        .withColumn("host", regexp_replace($"host", "^www\\.", ""))
        .withColumn("rest",
          regexp_replace(regexp_extract($"u", "^(?i)https?://[^/?#]*(.*)$", 1), "/$", ""))
        .withColumn("canonical_url", concat(lit("http://"), $"host", $"rest"))
      canon.groupBy("canonical_url")
        .agg(min($"doc_id").as("keeper"),
          count(lit(1)).as("n_variants"))
        .orderBy("canonical_url")
    },
    Some("""SELECT 'http://' || source || '.example.com/articles/'
           |         || CAST(doc_id % 40 AS VARCHAR) AS canonical_url,
           |       CAST(min(doc_id) AS BIGINT) AS keeper,
           |       CAST(count(*) AS BIGINT) AS n_variants
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Deterministic training-shard export — the last pipeline stage before
    * the trainer reads: every doc assigned to a shard by a REPRODUCIBLE
    * md5-derived hash (never random(): partition-order dependent and
    * irreproducible engine-over-engine), globally shuffled by a second
    * independent hash (the "deterministic shuffle" a training run must be
    * able to replay), written one file per shard, and AUDITED from the
    * written files — per-shard doc counts, char mass, and the first/last
    * docs in shard order, so a re-export is bit-reproducible. At 100 TB
    * the same plan holds: one hash shuffle to co-locate shards (tasks =
    * shards; raise the shard count, not the pattern), sortWithinPartitions
    * is a per-task spillable sort, and no driver materialization. */
  val qShardExport: Q = Q(
    "q_shard_export",
    (s, dir) => {
      import s.implicits._
      val h = graft.functions.FlinkFunctions.md5Hash31($"doc_id".cast("string"))
      val ord = graft.functions.FlinkFunctions
        .md5Hash31(concat($"doc_id".cast("string"), lit(":perm1")))
      val out = Tables.scratch(
        s"shard-export-${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
      Tables.t(s, dir, "documents")
        .select($"doc_id", $"n_chars", (h % 8).as("shard"), ord.as("ord"))
        .repartition(8, $"shard")
        .sortWithinPartitions($"shard", $"ord")
        .write.mode("overwrite").partitionBy("shard").parquet(out)
      s.read.parquet(out)
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").as("chars"),
          min_by($"doc_id", $"ord").as("first_doc"),
          max_by($"doc_id", $"ord").as("last_doc"))
        .orderBy($"shard")
    },
    Some("""SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS chars,
           |       arg_min(doc_id, ord) AS first_doc,
           |       arg_max(doc_id, ord) AS last_doc
           |FROM (
           |  SELECT doc_id, n_chars,
           |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           |      % 2147483647 % 8 AS shard,
           |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':perm1'), 1, 8)) AS BIGINT)
           |      % 2147483647 AS ord
           |  FROM documents)
           |GROUP BY shard ORDER BY shard""".stripMargin))

  val all: Seq[Q] = Seq(qLangId, qQualityScore, qTokenCount, qFingerprint,
    qStratifiedSplit, qContamination, qPipelineE2e, qQualityRepetition,
    qDomainQuota, qMixtureResample, qSequencePack, qImportanceSample,
    qDupSpanFrac, qTokenDrift, qUnigramLogprob, qPiiMask, qLineDedup,
    qUrlDedup, qShardExport)
}
