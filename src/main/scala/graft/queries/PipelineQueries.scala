package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.Tables.r4
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis, Tokenizer}
import CoreQueries.Q

/** Training-data pipeline operators over the documents/embeddings
  * fixtures: deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash),
  * similarity search (brute-force + LSH ANN), text analysis and
  * multimodal plumbing. Oracle-checked in DuckDB where the semantics are
  * SQL-expressible; the rest are covered by PipelineSpec.
  */
object PipelineQueries {

  /** ANN method tuning shared by the single-probe entries AND the
    * multi-probe recall row ([[annRecallEntry]]). The recall oracle's
    * SQL unrolls these values as literals, so the constants are the
    * drift guard: retuning a method here moves BOTH the published
    * method query and the recall row's Spark side — a recall oracle
    * left on the old configuration then hash-mismatches (red) instead
    * of silently grading a configuration no other query runs. */
  private object AnnParams {
    val LshPlanes = 4
    val IvfNlist = 8
    val IvfNprobe = 2
    val KmIters = 2
    val PqM = 8
    val PqNcent = 16
    val PqIters = 2
  }

  /** Shared oracle prefix: DuckDB replay of the deterministic
    * hyperplane-LSH buckets (splitmix64 plane components), ending in
    * a `buckets(vec_id, bucket)` CTE — used by the single-query LSH
    * ANN oracle and the k-NN join oracle. */
  private val lshBucketCtes: String =
    """WITH emb AS (
             |  SELECT vec_id, embedding::DOUBLE[] AS v, len(embedding)::BIGINT AS n FROM embeddings
             |), t0 AS (
             |  SELECT vec_id, p.range AS p, unnest(range(0, n)) AS i, v, n
             |  FROM emb, range(0,4) p
             |), t AS (
             |  SELECT vec_id, p, i, v[i + 1] AS x,
             |    ((p * n + i)::UBIGINT + 11400714819323198485::UBIGINT) AS z0
             |  FROM t0
             |), a1 AS (
             |  SELECT vec_id, p, i, x, xor(z0, z0 >> 30) AS a FROM t
             |), m1 AS (
             |  SELECT vec_id, p, i, x,
             |    ((((a & 4294967295::UBIGINT) * (13787848793156543929::UBIGINT & 4294967295::UBIGINT))::HUGEINT
             |      + ((((a & 4294967295::UBIGINT) * (13787848793156543929::UBIGINT >> 32)
             |           + (a >> 32) * (13787848793156543929::UBIGINT & 4294967295::UBIGINT)) & 4294967295::UBIGINT))::HUGEINT
             |        * 4294967296::HUGEINT)
             |     % 18446744073709551616::HUGEINT)::UBIGINT AS z1
             |  FROM a1
             |), a2 AS (
             |  SELECT vec_id, p, i, x, xor(z1, z1 >> 27) AS a FROM m1
             |), m2 AS (
             |  SELECT vec_id, p, i, x,
             |    ((((a & 4294967295::UBIGINT) * (10723151780598845931::UBIGINT & 4294967295::UBIGINT))::HUGEINT
             |      + ((((a & 4294967295::UBIGINT) * (10723151780598845931::UBIGINT >> 32)
             |           + (a >> 32) * (10723151780598845931::UBIGINT & 4294967295::UBIGINT)) & 4294967295::UBIGINT))::HUGEINT
             |        * 4294967296::HUGEINT)
             |     % 18446744073709551616::HUGEINT)::UBIGINT AS z2
             |  FROM a2
             |), m3 AS (
             |  SELECT vec_id, p, i, x, xor(z2, z2 >> 31) AS zf FROM m2
             |), comps AS (
             |  SELECT vec_id, p, i, x,
             |    CASE WHEN zf >= 9223372036854775808::UBIGINT
             |         THEN (zf::HUGEINT - 18446744073709551616::HUGEINT)::DOUBLE
             |         ELSE zf::DOUBLE END / 9223372036854775807.0 AS c
             |  FROM m3
             |), dots AS (
             |  SELECT vec_id, p, sum(x * c) AS dotv FROM comps GROUP BY vec_id, p
             |), buckets AS (
             |  SELECT vec_id, sum(CASE WHEN dotv >= 0 THEN (1::BIGINT << p) ELSE 0::BIGINT END)::BIGINT AS bucket
             |  FROM dots GROUP BY vec_id
             |)""".stripMargin


  /** Shared DuckDB replay of the hashed-BoW classifier's 3-round
    * gradient-descent weight trajectory (md5 feature hashing, bias as
    * the always-on pseudo-feature at bucket 64, round-6 updates,
    * lr=5.0, label lang='en') — ends in `g3(b, w)`, the final weight
    * table. Used by the scoring oracle (pl_quality_classifier) AND the
    * evaluation oracle (pl_classifier_eval) so the two can never train
    * different models. */
  private val clfTrajectoryCtes: String =
    """WITH tok AS (
      |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
      |    unnest(string_split(trim(text), ' ')) AS t
      |  FROM documents
      |), tok2 AS (SELECT * FROM tok WHERE t != ''),
      |bkt AS (
      |  SELECT doc_id, y,
      |    ('0x' || substr(md5(t), 1, 8))::BIGINT % 64 AS b
      |  FROM tok2
      |), cnt AS (
      |  SELECT doc_id, y, b, count(*) AS c FROM bkt GROUP BY doc_id, y, b
      |), nt AS (
      |  SELECT doc_id, sum(c) AS ntok FROM cnt GROUP BY doc_id
      |), feat AS (
      |  SELECT c.doc_id, c.y, c.b,
      |    CAST(c.c AS DOUBLE) / CAST(nt.ntok AS DOUBLE) AS x
      |  FROM cnt c JOIN nt USING (doc_id)
      |  UNION ALL
      |  SELECT DISTINCT doc_id, y, 64 AS b, 1.0 AS x FROM cnt
      |), nd AS (SELECT count(DISTINCT doc_id) AS n FROM feat),
      |g1 AS (
      |  SELECT b, round(-(5.0 * (sum((0.5 - y) * x) / nd.n)), 6) AS w
      |  FROM feat, nd GROUP BY b, nd.n
      |), m2 AS (
      |  SELECT f.doc_id, f.y, sum(f.x * g1.w) AS m
      |  FROM feat f JOIN g1 USING (b) GROUP BY f.doc_id, f.y
      |), p2 AS (
      |  SELECT doc_id, y, 1.0 / (1.0 + exp(-m)) AS p FROM m2
      |), g2 AS (
      |  SELECT f.b,
      |    round(any_value(g1.w) - 5.0 * (sum((p2.p - f.y) * f.x) / any_value(nd.n)), 6) AS w
      |  FROM feat f JOIN p2 USING (doc_id) JOIN g1 ON g1.b = f.b, nd
      |  GROUP BY f.b
      |), m3 AS (
      |  SELECT f.doc_id, f.y, sum(f.x * g2.w) AS m
      |  FROM feat f JOIN g2 USING (b) GROUP BY f.doc_id, f.y
      |), p3 AS (
      |  SELECT doc_id, y, 1.0 / (1.0 + exp(-m)) AS p FROM m3
      |), g3 AS (
      |  SELECT f.b,
      |    round(any_value(g2.w) - 5.0 * (sum((p3.p - f.y) * f.x) / any_value(nd.n)), 6) AS w
      |  FROM feat f JOIN p3 USING (doc_id) JOIN g2 ON g2.b = f.b, nd
      |  GROUP BY f.b
      |)""".stripMargin

  /** Shared DuckDB replay of the perceptual average-hash
    * ([[graft.functions.VectorExpressions.AvgHash64]]) over the
    * documents payload bytes, ending at `ph(doc_id, phash)` — used by
    * pl_multimodal_phash and pl_multimodal_phash_pairs so the hash and
    * the pair miner can never drift apart. Bit 63 is emitted as the
    * signed minimum instead of `1 << 63` (DuckDB checks shift
    * overflow); the sum is exact in HUGEINT, cast back to BIGINT. */
  private val phashCtes: String =
    """WITH b AS (
      |  SELECT doc_id, hex(text::BLOB) AS hx, octet_length(text::BLOB) AS len
      |  FROM documents
      |), e AS (
      |  SELECT doc_id, unnest(range(0, 64)) AS i, hx, len FROM b
      |), g AS (
      |  SELECT doc_id, i,
      |    (CASE WHEN 3*i   < len THEN ('0x' || substr(hx, 6*i+1, 2))::BIGINT ELSE 0 END
      |   + CASE WHEN 3*i+1 < len THEN ('0x' || substr(hx, 6*i+3, 2))::BIGINT ELSE 0 END
      |   + CASE WHEN 3*i+2 < len THEN ('0x' || substr(hx, 6*i+5, 2))::BIGINT ELSE 0 END) AS s
      |  FROM e
      |), tot AS (SELECT doc_id, sum(s) AS total FROM g GROUP BY doc_id),
      |ph AS (
      |  SELECT g.doc_id,
      |    CAST(sum(CASE WHEN g.s * 64 >= t.total THEN
      |      CASE WHEN g.i = 63 THEN -9223372036854775808
      |           ELSE (1::BIGINT << CAST(g.i AS INTEGER)) END
      |      ELSE 0 END) AS BIGINT) AS phash
      |  FROM g JOIN tot t USING (doc_id) GROUP BY g.doc_id
      |)""".stripMargin

  /** Shared oracle prefix for the substring-dedup rows: tokenize,
    * hash all OVERLAPPING 10-grams, keep start positions of grams whose
    * md5 occurs >= 2 times corpus-wide — ends in `dg(doc_id, p)`.
    * Mirrors Dedup.repeatedGramStarts(k=10, minOcc=2). */
  private val repeatedGramCtes: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
      |), g AS (
      |  SELECT doc_id, p, md5(array_to_string(t[(p+1):(p+10)], ' ')) AS h
      |  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 9)) AS p
      |        FROM tok WHERE len(t) >= 10)
      |), dup AS (
      |  SELECT h FROM g GROUP BY h HAVING count(*) >= 2
      |), dg AS (
      |  SELECT doc_id, p FROM g SEMI JOIN dup USING (h)
      |)""".stripMargin

  private val base: Map[String, Q] = Map(
    // exact dedup: one shuffle on content hash
    "pl_dedup_exact" -> Q(
      (s, d) => Dedup.exactDuplicates(Tables(s, d, "documents"), "doc_id", "text")
        .orderBy("content_hash"),
      Some("""SELECT md5(text) AS content_hash, count(*) AS n_dups, min(doc_id) AS keep_id
             |FROM documents GROUP BY md5(text) HAVING count(*) > 1
             |ORDER BY content_hash""".stripMargin)),

    // exact pairwise 3-gram Jaccard via shingle inverted index
    "pl_dedup_jaccard" -> Q(
      (s, d) => Dedup.ngramJaccardPairs(Tables(s, d, "documents"), "doc_id", "text", 3, 0.5)
        .orderBy("id_a", "id_b"),
      Some(jaccardOracle)),

    // MinHash(128) + LSH(32 bands × 4) candidates verified with exact
    // Jaccard — same oracle as the exhaustive version: every true pair in
    // this corpus has j ≥ 0.89, where the deterministic band-collision
    // miss probability is ≈ (1-0.89⁴)³² < 2e-14: LSH recall is exact.
    "pl_dedup_minhash" -> Q(
      (s, d) => Dedup.minHashLshPairs(Tables(s, d, "documents"), "doc_id", "text",
        shingleN = 3, bands = 32, rowsPerBand = 4, threshold = 0.5)
        .orderBy("id_a", "id_b"),
      Some(jaccardOracle)),

    // end-to-end dedup application: corpus minus exact dups (keep min id)
    "pl_dedup_apply_exact" -> Q(
      (s, d) => Dedup.dropExactDuplicates(Tables(s, d, "documents"), "doc_id", "text")
        .select("doc_id", "n_chars").orderBy("doc_id"),
      Some("""SELECT doc_id, n_chars FROM documents
             |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
             |ORDER BY doc_id""".stripMargin)),

    // incremental (delta) dedup: pairs touching the odd-id "increment"
    // only — even×even (the already-deduped "existing corpus") is pruned
    // from the candidate join by construction. Same LSH-recall argument
    // as pl_dedup_minhash, so the exact-jaccard oracle filtered to
    // not-both-existing matches exactly.
    "pl_dedup_minhash_incr" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        Dedup.minHashLshPairsIncremental(
            docs.filter(col("doc_id") % 2 === 0),
            docs.filter(col("doc_id") % 2 === 1),
            "doc_id", "text", 3, 32, 4, 0.5)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(trim(text), ' ')) - 1, 2)),
             |    i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' '))) AS s
             |  FROM documents
             |), inv AS (
             |  SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh
             |)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  round(count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)), 4) AS jaccard
             |FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |WHERE NOT (a.doc_id % 2 = 0 AND b.doc_id % 2 = 0)
             |GROUP BY a.doc_id, b.doc_id
             |HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.5
             |ORDER BY id_a, id_b""".stripMargin)),

    // ship-the-index path: the same delta mine against a PREBUILT
    // MinHash band/shingle artifact — the corpus is a table read, not a
    // signature recompute; output identical to the incremental miner
    // (same oracle), so the artifact path can never drift
    "pl_dedup_index_ship" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val index = Dedup.buildMinHashIndex(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", 3, 32, 4)
        Dedup.minHashLshPairsWithIndex(index,
            docs.filter(col("doc_id") % 2 === 1),
            "doc_id", "text", 3, 32, 4, 0.5)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(trim(text), ' ')) - 1, 2)),
             |    i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' '))) AS s
             |  FROM documents
             |), inv AS (
             |  SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh
             |)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  round(count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)), 4) AS jaccard
             |FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |WHERE NOT (a.doc_id % 2 = 0 AND b.doc_id % 2 = 0)
             |GROUP BY a.doc_id, b.doc_id
             |HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.5
             |ORDER BY id_a, id_b""".stripMargin)),

    // applying the delta dedup: the increment minus docs that duplicate
    // the existing corpus or a smaller-id increment doc — the existing
    // side is never modified (rolling-pipeline stability)
    "pl_dedup_apply_incr" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        Dedup.dropIncrementNearDuplicates(
            docs.filter(col("doc_id") % 2 === 0),
            docs.filter(col("doc_id") % 2 === 1),
            "doc_id", "text")
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(trim(text), ' ')) - 1, 2)),
             |    i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' '))) AS s
             |  FROM documents
             |), inv AS (
             |  SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh
             |), pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |  WHERE NOT (a.doc_id % 2 = 0 AND b.doc_id % 2 = 0)
             |  GROUP BY a.doc_id, b.doc_id
             |  HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.5
             |), rm AS (
             |  SELECT id_b AS doc_id FROM pairs WHERE id_b % 2 = 1
             |  UNION
             |  SELECT id_a FROM pairs WHERE id_a % 2 = 1 AND id_b % 2 = 0
             |)
             |SELECT doc_id FROM documents
             |WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM rm)
             |ORDER BY doc_id""".stripMargin)),

    // end-to-end near-dedup application: corpus minus the greater id of
    // every verified near-dup pair (same pair oracle as pl_dedup_jaccard)
    "pl_dedup_apply_near" -> Q(
      (s, d) => Dedup.dropNearDuplicates(Tables(s, d, "documents"), "doc_id", "text")
        .select("doc_id").orderBy("doc_id"),
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(trim(text), ' ')) - 1, 2)),
             |    i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' '))) AS s
             |  FROM documents
             |), inv AS (
             |  SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh
             |), pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |  GROUP BY a.doc_id, b.doc_id
             |  HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.5
             |)
             |SELECT doc_id FROM documents
             |WHERE doc_id NOT IN (SELECT greatest(id_a, id_b) FROM pairs)
             |ORDER BY doc_id""".stripMargin)),

    // SimHash near-dup pairs (hamming ≤ 7). The fingerprint's feature
    // hash is the first 60 bits of MD5 (VectorExpressions.WordShingleMd5)
    // precisely so DuckDB can recompute the identical simhash: bits
    // 60-63 of the majority vote are always 0 (every feature < 2^60),
    // and the block-combination candidate generation is exact by
    // pigeonhole for any blocks > maxHamming, so the all-pairs oracle
    // below matches exactly. blocks=9 exercises the corpus-scale path
    // (two-chunk keys, 2^14-wide buckets instead of 2^8).
    "pl_dedup_simhash" -> Q(
      (s, d) => Dedup.simHashPairs(Tables(s, d, "documents"), "doc_id", "text", 7, blocks = 9)
        .orderBy("id_a", "id_b"),
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(trim(text), ' ')), 2)),
             |    i -> array_to_string(string_split(trim(text), ' ')[i:i+1], ' '))) AS grams
             |  FROM documents
             |), hx AS (
             |  SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS x
             |  FROM (SELECT doc_id, unnest(grams) AS g FROM sh)
             |), bits AS (
             |  SELECT doc_id, b,
             |    CASE WHEN 2 * sum((x >> b) & 1) >= count(*) THEN (1::BIGINT << b) ELSE 0::BIGINT END AS bit
             |  FROM hx CROSS JOIN range(0, 60) AS r(b)
             |  GROUP BY doc_id, b
             |), sim AS (
             |  SELECT doc_id, sum(bit)::BIGINT AS s FROM bits GROUP BY doc_id
             |)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  bit_count(xor(a.s, b.s))::INT AS hamming
             |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.s, b.s)) <= 7
             |ORDER BY id_a, id_b""".stripMargin)),

    // ship-the-simhash-index: even doc_ids are the stored (id, sim)
    // fingerprint artifact, odd ids the increment — only the increment
    // is fingerprinted and only increment-touching pairs mine (the
    // hamming-family mirror of pl_dedup_index_ship / the winnow ship).
    // Oracle: the exhaustive fingerprint pair scan minus corpus-corpus
    // pairs.
    "pl_dedup_simhash_ship" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val index = Dedup.simHashIndex(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        Dedup.simHashPairsDelta(index,
            docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
            maxHamming = 7, blocks = 9)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(trim(text), ' ')), 2)),
             |    i -> array_to_string(string_split(trim(text), ' ')[i:i+1], ' '))) AS grams
             |  FROM documents
             |), hx AS (
             |  SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS x
             |  FROM (SELECT doc_id, unnest(grams) AS g FROM sh)
             |), bits AS (
             |  SELECT doc_id, b,
             |    CASE WHEN 2 * sum((x >> b) & 1) >= count(*) THEN (1::BIGINT << b) ELSE 0::BIGINT END AS bit
             |  FROM hx CROSS JOIN range(0, 60) AS r(b)
             |  GROUP BY doc_id, b
             |), sim AS (
             |  SELECT doc_id, sum(bit)::BIGINT AS s FROM bits GROUP BY doc_id
             |)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  bit_count(xor(a.s, b.s))::INT AS hamming
             |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.s, b.s)) <= 7
             |  AND NOT (a.doc_id % 2 = 0 AND b.doc_id % 2 = 0)
             |ORDER BY id_a, id_b""".stripMargin)),

    // per-document text stats (token count, chars, order-insensitive
    // fingerprint)
    "pl_text_stats" -> Q(
      (s, d) => {
        val t = Tables(s, d, "documents")
        t.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.charCount(col("text")).as("n_chars"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, len(string_split(trim(text), ' ')) AS n_tokens,
             |  length(text) AS n_chars,
             |  md5(array_to_string(list_sort(list_distinct(
             |    list_filter(string_split(lower(trim(text)), ' '), t -> t != ''))), ' ')) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // quality metrics fully oracle-gated (ASCII corpus: \p{Punct} and
    // [[:punct:]] agree); language-ID stays spec-covered (argmax over
    // per-language stopword lists isn't worth replicating in SQL)
    "pl_text_quality" -> Q(
      (s, d) => {
        val t = col("text")
        Tables(s, d, "documents").select(col("doc_id"),
          round(TextAnalysis.punctRatio(t), 4).as("punct_ratio"),
          round(TextAnalysis.meanWordLen(t), 4).as("mean_word_len"),
          round(TextAnalysis.stopwordRatio(t), 4).as("stopword_ratio"),
          TextAnalysis.qualityScore(t).as("quality"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  round((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
             |    / greatest(length(text), 1), 4) AS punct_ratio,
             |  round(list_avg(list_transform(string_split(trim(text), ' '), t -> length(t))), 4) AS mean_word_len,
             |  round(len(list_intersect(list_distinct(string_split(lower(trim(text)), ' ')),
             |      ['the','a','of','and','to','in','is','it','that','for']))::DOUBLE
             |    / greatest(len(list_distinct(string_split(lower(trim(text)), ' '))), 1), 4) AS stopword_ratio,
             |  round(((CASE WHEN length(text) BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)
             |    + (CASE WHEN (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
             |        / greatest(length(text), 1) < 0.2 THEN 1.0 ELSE 0.0 END)
             |    + (CASE WHEN list_avg(list_transform(string_split(trim(text), ' '), t -> length(t)))
             |        BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 3.0, 4) AS quality
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // full per-document stats frame incl. language ID. The argmax over
    // per-language stopword hits is replayed in SQL: Spark's
    // array_max(array(struct(hits, lang))) breaks hit ties by the LARGER
    // language code, so the CASE tests languages in descending
    // lexicographic order (zh > fr > es > en > de).
    "pl_text_docstats" -> Q(
      (s, d) => TextAnalysis.documentStats(Tables(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH base AS (
             |  SELECT doc_id, text,
             |    string_split(trim(text), ' ') AS toks,
             |    list_distinct(string_split(lower(trim(text)), ' ')) AS ltoks
             |  FROM documents
             |), hits AS (
             |  SELECT doc_id, text, toks, ltoks,
             |    len(list_intersect(ltoks, ['the','a','of','and','to','in','is','it','that','for'])) AS h_en,
             |    len(list_intersect(ltoks, ['der','die','das','und','ist','ein','zu','mit','von','nicht'])) AS h_de,
             |    len(list_intersect(ltoks, ['le','la','les','et','est','un','une','de','que','pas'])) AS h_fr,
             |    len(list_intersect(ltoks, ['el','la','los','y','es','un','una','de','que','no'])) AS h_es,
             |    len(list_intersect(ltoks, ['的','是','了','在','我','有','和','就','不','人'])) AS h_zh
             |  FROM base
             |)
             |SELECT doc_id,
             |  len(toks)::BIGINT AS n_tokens,
             |  length(text)::BIGINT AS n_chars,
             |  round((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
             |    / greatest(length(text), 1), 4) AS punct_ratio,
             |  round(list_avg(list_transform(toks, t -> length(t))), 4) AS mean_word_len,
             |  round(h_en::DOUBLE / greatest(len(ltoks), 1), 4) AS stopword_ratio,
             |  round(((CASE WHEN length(text) BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)
             |    + (CASE WHEN (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
             |        / greatest(length(text), 1) < 0.2 THEN 1.0 ELSE 0.0 END)
             |    + (CASE WHEN list_avg(list_transform(toks, t -> length(t)))
             |        BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 3.0, 4) AS quality,
             |  CASE WHEN greatest(h_en, h_de, h_fr, h_es, h_zh) = 0 THEN 'und'
             |       WHEN h_zh = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'zh'
             |       WHEN h_fr = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'fr'
             |       WHEN h_es = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'es'
             |       WHEN h_en = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'en'
             |       ELSE 'de' END AS lang_guess,
             |  md5(array_to_string(list_sort(list_filter(ltoks, t -> t != '')), ' ')) AS fingerprint
             |FROM hits ORDER BY doc_id""".stripMargin)),

    // Gopher-style repetition screens: duplicate-word fraction + top
    // word-bigram character mass (compiled TopNgramStats kernel; ties
    // break to the lexicographically smallest bigram in both engines)
    "pl_text_repetition" -> Q(
      (s, d) => TextAnalysis.repetitionStats(Tables(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, text, string_split(trim(text), ' ') AS ws FROM documents
             |), bi AS (
             |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg
             |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM toks)
             |), top AS (
             |  SELECT doc_id, bg, c FROM (
             |    SELECT doc_id, bg, count(*) AS c,
             |      row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, bg) AS rn
             |    FROM bi GROUP BY doc_id, bg) WHERE rn = 1
             |)
             |SELECT t.doc_id,
             |  round(1.0 - len(list_distinct(t.ws))::DOUBLE / greatest(len(t.ws), 1), 4) AS dup_word_frac,
             |  p.bg AS top_bigram,
             |  p.c::BIGINT AS top_bigram_n,
             |  round(p.c * length(p.bg)::DOUBLE / greatest(length(t.text), 1), 4) AS top_bigram_frac
             |FROM toks t LEFT JOIN top p USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // per-vector nearest neighbor within its label block (bulk near-dup
    // mining shape; float values only ORDER, never compared)
    "pl_emb_nn" -> Q(
      (s, d) => Similarity.nearestNeighborWithinBlock(
        Tables(s, d, "embeddings"), "vec_id", "embedding", "label").orderBy("id"),
      Some("""WITH pairs AS (
             |  SELECT a.vec_id AS id, b.vec_id AS id_b,
             |    list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
             |  FROM embeddings a JOIN embeddings b
             |    ON a.label = b.label AND a.vec_id != b.vec_id)
             |SELECT id, id_b AS neighbor_id FROM (
             |  SELECT id, id_b, row_number() OVER (PARTITION BY id ORDER BY cos DESC, id_b) AS rn
             |  FROM pairs) WHERE rn = 1 ORDER BY id""".stripMargin)),

    // embedding-cosine near-dup pairs within label blocks (float math is
    // identical element-order double accumulation in both engines, so
    // the threshold filter is deterministic)
    "pl_emb_cosine_pairs" -> Q(
      (s, d) => Dedup.embeddingCosinePairs(
          Tables(s, d, "embeddings"), "vec_id", "embedding", "label", 0.25)
        .orderBy("id_a", "id_b"),
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
             |FROM embeddings a JOIN embeddings b
             |  ON a.label = b.label AND a.vec_id < b.vec_id
             |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.25
             |ORDER BY id_a, id_b""".stripMargin)),

    // brute-force cosine top-20 against the vec_id=0 embedding
    "pl_emb_topk" -> Q(
      (s, d) => {
        val s2 = s
        val emb = Tables(s2, d, "embeddings")
        val q = emb.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0)
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 20)
      },
      Some("""SELECT b.vec_id,
             |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
             |FROM embeddings a, embeddings b WHERE a.vec_id = 0
             |ORDER BY cos DESC, b.vec_id LIMIT 20""".stripMargin)),

    // LSH-bucketed ANN. The hyperplane components are deterministic
    // splitmix64 (VectorExpressions.HyperplaneBucket), so DuckDB can
    // recompute the exact bucket: the oracle replays the splitmix64
    // finalizer with 32-bit-limb mod-2^64 multiplication (HUGEINT alone
    // would overflow at 2^64×2^64).
    "pl_emb_ann_lsh" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val q = emb.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0)
        Similarity.lshTopK(emb, "vec_id", "embedding", q, 10,
          nPlanes = AnnParams.LshPlanes)
      },
      Some(lshBucketCtes + "\n" + """             |SELECT e.vec_id, round(list_cosine_similarity(q.v, e.v), 4) AS cos
             |FROM emb e
             |JOIN buckets b ON e.vec_id = b.vec_id
             |JOIN buckets qb ON qb.vec_id = 0
             |JOIN emb q ON q.vec_id = 0
             |WHERE b.bucket = qb.bucket
             |ORDER BY cos DESC, e.vec_id
             |LIMIT 10""".stripMargin)),

    // IVF ANN: deterministic md5-sampled centroids (nlist=8), nearest-
    // centroid cell assignment, probe the 2 cells nearest the query.
    // Fully engine-reproducible, so the oracle replays the whole index
    // k-means-refined IVF: distributed Lloyd iterations on the seed
    // centroids (spec asserts determinism, true-cosine scores, and
    // recall >= the seeded variant). The refined centroid trajectory
    // depends on float mean rounding DuckDB can't replay bit-exactly →
    // rows-only check, like the bloom filter.
    // k-NN JOIN: every query row gets its top-k bucket-mates by true
    // cosine — co-partitioned LSH equi-join, no cross join. The oracle
    // replays buckets via the shared splitmix64 CTEs.
    "pl_emb_knn_join" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Similarity.knnJoin(emb.filter(col("vec_id") < 50), "vec_id",
            emb, "vec_id", "embedding", k = 3, nPlanes = 4)
          .orderBy("query_id", "neighbor_id")
      },
      Some(lshBucketCtes + "\n" +
        """|, pairs AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    round(list_cosine_similarity(qv.v, cv.v), 4) AS cos
           |  FROM buckets q
           |  JOIN buckets c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
           |  JOIN emb qv ON qv.vec_id = q.vec_id
           |  JOIN emb cv ON cv.vec_id = c.vec_id
           |  WHERE q.vec_id < 50
           |)
           |SELECT query_id, neighbor_id, cos FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |    ORDER BY cos DESC, neighbor_id) AS rk
           |  FROM pairs) WHERE rk <= 3
           |ORDER BY query_id, neighbor_id""".stripMargin)),

    // IVF-PQ: coarse cells prune compute, PQ codes prune memory, true
    // cosines rescore the shortlist — the production FAISS composition
    // the oracle replays seeded-IVF probe selection AND the per-subspace
    // PQ Lloyd trajectory on the probed slice (seeds, two iterations of
    // argmin-encode + rounded means, ADC table, shortlist, rescore)
    "pl_emb_ann_ivfpq" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val q = emb.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0)
        Similarity.ivfPqTopK(emb, "vec_id", "embedding", q, k = 10,
          nlist = AnnParams.IvfNlist, nprobe = AnnParams.IvfNprobe,
          m = AnnParams.PqM, ncent = AnnParams.PqNcent,
          trainIters = AnnParams.PqIters)
      },
      Some(pqLloydOracle(
        """WITH emb0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |cent AS (
          |  SELECT vec_id AS cid, v AS c FROM emb0
          |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
          |),
          |assign AS (
          |  SELECT vec_id, v, cid FROM (
          |    SELECT e.vec_id, e.v, c.cid,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.cid) AS rn
          |    FROM emb0 e CROSS JOIN cent c) WHERE rn = 1
          |),
          |probe AS (
          |  SELECT cid FROM (
          |    SELECT c.cid, row_number() OVER (
          |      ORDER BY list_cosine_similarity(c.c, q0.v) DESC, c.cid) AS rn
          |    FROM cent c, emb0 q0 WHERE q0.vec_id = 0) WHERE rn <= 2
          |),
          |emb AS (SELECT a.vec_id, a.v FROM assign a JOIN probe p ON a.cid = p.cid),
          |q AS (SELECT v FROM emb0 WHERE vec_id = 0),
          |""".stripMargin))),

    // PQ ANN: md5-seeded codebooks, scan-stage compiled-dot encoding,
    // literal ADC table lookup, true-cosine rescore of the shortlist.
    // The ADC table is driver-computed float arithmetic DuckDB can't
    // replay bit-for-bit → rows-only; recall/rescore guarantees in spec
    // the oracle replays the FULL PQ lifecycle: md5-seeded codebooks
    // over unit vectors, two per-subspace Lloyd iterations (argmin
    // encode, per-(s,c,j) means rounded to 6 dp, empty cells keep their
    // book), the per-query ADC table, the order-stable shortlist cut,
    // and the true-cosine rescore — every float computed in the same
    // element order as the compiled kernels
    "pl_emb_ann_pq" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val q = emb.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0)
        Similarity.pqTopK(emb, "vec_id", "embedding", q, k = 10,
          m = AnnParams.PqM, ncent = AnnParams.PqNcent,
          trainIters = AnnParams.PqIters)
      },
      Some(pqLloydOracle(
        """WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |q AS (SELECT v FROM emb WHERE vec_id = 0),
          |""".stripMargin))),

    // the oracle replays the WHOLE k-means trajectory: md5 seeds →
    // normalize+round(6) → two unrolled Lloyd iterations (argmax-cosine
    // assign, per-(cell,dim) means, renormalize+round, empty cells keep
    // their centroid) → probe → top-k. The 6-dp centroid rounding each
    // round is what makes the float trajectory engine-stable enough to
    // hash (sum-order noise ~1e-13 vs the 5e-7 rounding boundary)
    "pl_emb_ann_ivf_kmeans" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val q = emb.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0)
        Similarity.ivfTopKKMeans(emb, "vec_id", "embedding", q,
          k = 10, nlist = AnnParams.IvfNlist, nprobe = AnnParams.IvfNprobe,
          iters = AnnParams.KmIters)
      },
      Some("""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT v FROM emb WHERE vec_id = 0),
             |dims AS (SELECT unnest(range(0, len(v))) AS i FROM q),
             |seed AS (
             |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS idx, v
             |  FROM emb ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
             |),
             |seed_n AS (
             |  SELECT idx, v, sqrt(list_aggregate(list_transform(v, y -> y * y), 'sum')) AS nrm
             |  FROM seed
             |),
             |cent0 AS (SELECT idx, list_transform(v, x -> round(x / nrm, 6)) AS c FROM seed_n),
             |assign0 AS (
             |  SELECT vec_id, v, idx AS cell FROM (
             |    SELECT e.vec_id, e.v, c.idx,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.idx) AS rn
             |    FROM emb e CROSS JOIN cent0 c) WHERE rn = 1
             |),
             |means1 AS (
             |  SELECT cell, i AS pos, avg(x) AS m FROM (
             |    SELECT a.cell, d.i, a.v[d.i + 1] AS x FROM assign0 a CROSS JOIN dims d
             |  ) GROUP BY cell, i
             |),
             |c1raw AS (
             |  SELECT cell AS idx, list(m ORDER BY pos) AS mv FROM means1 GROUP BY cell
             |),
             |c1n AS (
             |  SELECT idx, mv, sqrt(list_aggregate(list_transform(mv, y -> y * y), 'sum')) AS nrm
             |  FROM c1raw
             |),
             |cent1 AS (
             |  SELECT c0.idx,
             |    COALESCE((SELECT list_transform(r.mv, x -> round(x / r.nrm, 6))
             |              FROM c1n r WHERE r.idx = c0.idx), c0.c) AS c
             |  FROM cent0 c0
             |),
             |assign1 AS (
             |  SELECT vec_id, v, idx AS cell FROM (
             |    SELECT e.vec_id, e.v, c.idx,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.idx) AS rn
             |    FROM emb e CROSS JOIN cent1 c) WHERE rn = 1
             |),
             |means2 AS (
             |  SELECT cell, i AS pos, avg(x) AS m FROM (
             |    SELECT a.cell, d.i, a.v[d.i + 1] AS x FROM assign1 a CROSS JOIN dims d
             |  ) GROUP BY cell, i
             |),
             |c2raw AS (
             |  SELECT cell AS idx, list(m ORDER BY pos) AS mv FROM means2 GROUP BY cell
             |),
             |c2n AS (
             |  SELECT idx, mv, sqrt(list_aggregate(list_transform(mv, y -> y * y), 'sum')) AS nrm
             |  FROM c2raw
             |),
             |cent2 AS (
             |  SELECT c1.idx,
             |    COALESCE((SELECT list_transform(r.mv, x -> round(x / r.nrm, 6))
             |              FROM c2n r WHERE r.idx = c1.idx), c1.c) AS c
             |  FROM cent1 c1
             |),
             |probe AS (
             |  SELECT idx FROM (
             |    SELECT c.idx, row_number() OVER (
             |      ORDER BY list_cosine_similarity(c.c, q.v) DESC, c.idx) AS rn
             |    FROM cent2 c, q) WHERE rn <= 2
             |),
             |assign2 AS (
             |  SELECT vec_id, v, idx AS cell FROM (
             |    SELECT e.vec_id, e.v, c.idx,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.idx) AS rn
             |    FROM emb e CROSS JOIN cent2 c) WHERE rn = 1
             |)
             |SELECT a.vec_id, round(list_cosine_similarity(a.v, q.v), 4) AS cos
             |FROM assign2 a JOIN probe p ON a.cell = p.idx, q
             |ORDER BY cos DESC, a.vec_id LIMIT 10""".stripMargin)),

    // ship-the-ANN-index: centroids + pre-assigned corpus round-trip
    // through parquet; the search reads ONLY the probed cells of the
    // stored assignments — same oracle as pl_emb_ann_ivf, so any drift
    // in the artifact path turns this row red while the direct row
    // stays green
    "pl_emb_ann_index_ship" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val q = emb.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0)
        val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding",
          nlist = AnnParams.IvfNlist)
        val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
        // centroids are nlist rows by construction — one file (guide
        // §6 output sizing); assignments stay corpus-partitioned
        idx.centroids.coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/centroids")
        idx.assignments.write.mode("overwrite").parquet(s"$dir/assignments")
        val stored = Similarity.IvfIndex(
          s.read.parquet(s"$dir/centroids"),
          s.read.parquet(s"$dir/assignments"))
        Similarity.ivfTopKFromIndex(stored, q, k = 10,
            nprobe = AnnParams.IvfNprobe)
          .withColumnRenamed("id", "vec_id")
      },
      Some("""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cent AS (
             |  SELECT vec_id AS cid, v AS c FROM emb
             |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
             |),
             |assign AS (
             |  SELECT vec_id, v, cid FROM (
             |    SELECT e.vec_id, e.v, c.cid,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.cid) AS rn
             |    FROM emb e CROSS JOIN cent c) WHERE rn = 1
             |),
             |probe AS (
             |  SELECT cid FROM (
             |    SELECT c.cid, row_number() OVER (
             |      ORDER BY list_cosine_similarity(c.c, q.v) DESC, c.cid) AS rn
             |    FROM cent c, emb q WHERE q.vec_id = 0) WHERE rn <= 2
             |)
             |SELECT a.vec_id, round(list_cosine_similarity(a.v, q.v), 4) AS cos
             |FROM assign a JOIN probe p ON a.cid = p.cid, emb q
             |WHERE q.vec_id = 0
             |ORDER BY cos DESC, a.vec_id LIMIT 10""".stripMargin)),

    "pl_emb_ann_ivf" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val q = emb.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0)
        Similarity.ivfTopK(emb, "vec_id", "embedding", q, k = 10,
          nlist = AnnParams.IvfNlist, nprobe = AnnParams.IvfNprobe)
      },
      Some("""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cent AS (
             |  SELECT vec_id AS cid, v AS c FROM emb
             |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
             |),
             |assign AS (
             |  SELECT vec_id, v, cid FROM (
             |    SELECT e.vec_id, e.v, c.cid,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.cid) AS rn
             |    FROM emb e CROSS JOIN cent c) WHERE rn = 1
             |),
             |probe AS (
             |  SELECT cid FROM (
             |    SELECT c.cid, row_number() OVER (
             |      ORDER BY list_cosine_similarity(c.c, q.v) DESC, c.cid) AS rn
             |    FROM cent c, emb q WHERE q.vec_id = 0) WHERE rn <= 2
             |)
             |SELECT a.vec_id, round(list_cosine_similarity(a.v, q.v), 4) AS cos
             |FROM assign a JOIN probe p ON a.cid = p.cid, emb q
             |WHERE q.vec_id = 0
             |ORDER BY cos DESC, a.vec_id LIMIT 10""".stripMargin)),

    // as-of join: each click gets the latest prior signup value per user
    // (tagged-union + window composition, no range-join explosion)
    "pl_asof_join" -> Q(
      (s, d) => {
        val ev = Tables(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val signups = ev.filter(col("event_type") === "signup")
          .select("user_id", "ts", "value")
        graft.operators.EventOps.asofJoin(clicks, signups, "user_id", "ts", "ts", "value")
          .select(col("event_id"), col("user_id"), round(col("asof_value"), 4).as("asof_value"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, l.user_id, round(r.value, 4) AS asof_value
             |FROM (SELECT * FROM events WHERE event_type='click') l
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='signup') r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts
             |ORDER BY l.event_id""".stripMargin)),

    // ordered conversion funnel: earliest strictly-increasing
    // signup -> click -> purchase chain per user, one shuffle
    "pl_funnel" -> Q(
      (s, d) => graft.operators.EventOps.funnel(
          Tables(s, d, "events"), "user_id", "ts", "event_type",
          Seq("signup", "click", "purchase"))
        .orderBy("user_id"),
      Some("""WITH t1 AS (
             |  SELECT user_id, min(ts) AS ts1 FROM events
             |  WHERE event_type = 'signup' GROUP BY user_id
             |), t2 AS (
             |  SELECT e.user_id, min(e.ts) AS ts2 FROM events e
             |  JOIN t1 ON e.user_id = t1.user_id
             |  WHERE e.event_type = 'click' AND e.ts > t1.ts1
             |  GROUP BY e.user_id
             |), t3 AS (
             |  SELECT e.user_id, min(e.ts) AS ts3 FROM events e
             |  JOIN t2 ON e.user_id = t2.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
             |  GROUP BY e.user_id
             |)
             |SELECT u.user_id, t1.ts1, t2.ts2, t3.ts3,
             |  (CASE WHEN ts1 IS NULL THEN 0 ELSE 1 END
             |   + CASE WHEN ts2 IS NULL THEN 0 ELSE 1 END
             |   + CASE WHEN ts3 IS NULL THEN 0 ELSE 1 END) AS steps_completed
             |FROM (SELECT DISTINCT user_id FROM events) u
             |LEFT JOIN t1 ON u.user_id = t1.user_id
             |LEFT JOIN t2 ON u.user_id = t2.user_id
             |LEFT JOIN t3 ON u.user_id = t3.user_id
             |ORDER BY u.user_id""".stripMargin)),

    // weekly cohort retention: users bucketed by first-activity week,
    // counted in each later week they return (Monday-truncated weeks,
    // integer-exact week arithmetic)
    "pl_cohort_retention" -> Q(
      (s, d) => graft.operators.EventOps.cohortRetention(
          Tables(s, d, "events"), "user_id", "ts")
        .orderBy("cohort_week", "weeks_since"),
      Some("""WITH w AS (
             |  SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS wk
             |  FROM events
             |), c AS (
             |  SELECT user_id, min(wk) AS cohort_week FROM w GROUP BY user_id
             |)
             |SELECT c.cohort_week,
             |  date_diff('day', c.cohort_week, w.wk) // 7 AS weeks_since,
             |  count(DISTINCT w.user_id) AS n_users
             |FROM w JOIN c USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // gap-based sessionization (30-minute inactivity gap)
    "pl_sessionize" -> Q(
      (s, d) => graft.operators.EventOps.gapSessionIds(
          Tables(s, d, "events"), "user_id", "ts", 30)
        .select("event_id", "user_id", "session_id")
        .orderBy("event_id"),
      Some("""WITH g AS (
             |  SELECT event_id, user_id, ts,
             |    CASE WHEN epoch(ts)::BIGINT - epoch(lag(ts)
             |      OVER (PARTITION BY user_id ORDER BY ts))::BIGINT > 1800
             |      THEN 1 ELSE 0 END AS brk
             |  FROM events)
             |SELECT event_id, user_id,
             |  CAST(1 + sum(brk) OVER (PARTITION BY user_id ORDER BY ts
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |FROM g ORDER BY event_id""".stripMargin)),

    // near-dup cluster canonicalization: connected components over the
    // LSH-verified pair graph (min reachable id per doc); oracle is the
    // transitive closure via a recursive CTE over the same pairs
    "pl_dedup_clusters" -> Q(
      (s, d) => Dedup.nearDupClusters(
          Dedup.minHashLshPairs(Tables(s, d, "documents"), "doc_id", "text",
            shingleN = 3, bands = 32, rowsPerBand = 4, threshold = 0.5))
        .orderBy("doc_id"),
      Some("""WITH RECURSIVE sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(trim(text), ' ')) - 1, 2)),
             |    i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' '))) AS s
             |  FROM documents
             |), inv AS (
             |  SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh
             |), pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |  GROUP BY a.doc_id, b.doc_id
             |  HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.5
             |), edges AS (
             |  SELECT id_a AS a, id_b AS b FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs
             |), reach(a, b) AS (
             |  SELECT a, b FROM edges
             |  UNION
             |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
             |)
             |SELECT a AS doc_id, least(a, min(b)) AS cluster_id
             |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin)),

    // deterministic per-source quota sample (md5-ordered, reproducible
    // in any engine — the stratified downsampling screen)
    // dedup quality analytics: the near-dup cluster SIZE distribution
    // (how much of the corpus sits in 2-dup, 3-dup, … families) — the
    // number that decides whether near-dedup is worth its cost
    "pl_dedup_cluster_sizes" -> Q(
      (s, d) => Dedup.nearDupClusters(
          Dedup.minHashLshPairs(Tables(s, d, "documents"), "doc_id", "text",
            shingleN = 3, bands = 32, rowsPerBand = 4, threshold = 0.5))
        .groupBy("cluster_id").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
        .orderBy("sz"),
      Some("""WITH RECURSIVE sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(trim(text), ' ')) - 1, 2)),
             |    i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' '))) AS s
             |  FROM documents
             |), inv AS (
             |  SELECT doc_id, len(s) AS sz0, unnest(s) AS g FROM sh
             |), pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |  GROUP BY a.doc_id, b.doc_id
             |  HAVING count(*)::DOUBLE / (any_value(a.sz0) + any_value(b.sz0) - count(*)) >= 0.5
             |), edges AS (
             |  SELECT id_a AS a, id_b AS b FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs
             |), reach(a, b) AS (
             |  SELECT a, b FROM edges
             |  UNION
             |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
             |), clusters AS (
             |  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
             |  FROM reach GROUP BY a
             |)
             |SELECT sz, count(*) AS n_clusters FROM (
             |  SELECT cluster_id, count(*) AS sz FROM clusters GROUP BY cluster_id)
             |GROUP BY sz ORDER BY sz""".stripMargin)),

    "pl_sample_quota" -> Q(
      (s, d) => graft.operators.Curation.quotaSample(
          Tables(s, d, "documents"), "source", "doc_id", 50)
        .select("doc_id", "source").orderBy("doc_id"),
      Some("""SELECT doc_id, source FROM (
             |  SELECT doc_id, source, row_number() OVER (
             |    PARTITION BY source
             |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |  FROM documents) WHERE rk <= 50 ORDER BY doc_id""".stripMargin)),

    // benchmark decontamination: corpus docs sharing >= 5 word 3-gram
    // shingles with the "benchmark" slice (doc_id % 10 == 0)
    "pl_decontaminate" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        graft.operators.Curation.contaminated(
            docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
            docs.filter(col("doc_id") % 10 === 0), "text",
            n = 3, minShared = 5)
          .orderBy("doc_id")
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(trim(text), ' ')) - 1, 2)),
             |    i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' '))) AS s
             |  FROM documents
             |), bench AS (
             |  SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 10 = 0
             |), corp AS (
             |  SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 10 != 0
             |)
             |SELECT c.doc_id, count(*) AS shared_shingles
             |FROM corp c JOIN bench b ON c.g = b.g
             |GROUP BY c.doc_id HAVING count(*) >= 5
             |ORDER BY doc_id""".stripMargin)),

    // exact term-frequency keyword search: integer scoring, fully
    // oracle-replayable; top-k via TakeOrderedAndProject (no global sort)
    "pl_search_tf" -> Q(
      (s, d) => graft.operators.Search.keywordTopK(
        Tables(s, d, "documents"), "doc_id", "text",
        Seq("spark", "window", "hash"), 20),
      Some("""SELECT doc_id, score FROM (
             |  SELECT doc_id, CAST(
             |    len(list_filter(string_split(trim(text), ' '), w -> w = 'spark')) +
             |    len(list_filter(string_split(trim(text), ' '), w -> w = 'window')) +
             |    len(list_filter(string_split(trim(text), ' '), w -> w = 'hash'))
             |    AS BIGINT) AS score
             |  FROM documents)
             |WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // BM25 ranked retrieval: the oracle replays the WHOLE formula —
    // same doubles, same fold order (idf = ln((n-df+0.5)/(df+0.5)+1),
    // constants forced to DOUBLE before arithmetic so DuckDB's decimal
    // literals can't change the bits), rounded to 6 on both sides
    "pl_search_bm25" -> Q(
      (s, d) => graft.operators.Search.bm25TopK(
        Tables(s, d, "documents"), "doc_id", "text",
        Seq("spark", "window", "hash"), 20),
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t,
             |    CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS dl
             |  FROM documents
             |), stats AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n,
             |    sum(dl) / count(*) AS avgdl,
             |    CAST(sum(CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             |    CAST(sum(CASE WHEN list_contains(t, 'window') THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             |    CAST(sum(CASE WHEN list_contains(t, 'hash') THEN 1 ELSE 0 END) AS DOUBLE) AS df2
             |  FROM tok
             |), scored AS (
             |  SELECT doc_id, round(
             |    ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
             |      * (CAST(len(list_filter(t, w -> w = 'spark')) AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
             |      / (CAST(len(list_filter(t, w -> w = 'spark')) AS DOUBLE)
             |         + CAST(1.2 AS DOUBLE) * ((1 - CAST(0.75 AS DOUBLE)) + CAST(0.75 AS DOUBLE) * dl / avgdl))
             |    + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
             |      * (CAST(len(list_filter(t, w -> w = 'window')) AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
             |      / (CAST(len(list_filter(t, w -> w = 'window')) AS DOUBLE)
             |         + CAST(1.2 AS DOUBLE) * ((1 - CAST(0.75 AS DOUBLE)) + CAST(0.75 AS DOUBLE) * dl / avgdl))
             |    + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
             |      * (CAST(len(list_filter(t, w -> w = 'hash')) AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
             |      / (CAST(len(list_filter(t, w -> w = 'hash')) AS DOUBLE)
             |         + CAST(1.2 AS DOUBLE) * ((1 - CAST(0.75 AS DOUBLE)) + CAST(0.75 AS DOUBLE) * dl / avgdl))
             |    , 6) AS score
             |  FROM tok, stats
             |)
             |SELECT doc_id, score FROM scored WHERE score > 0
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // hybrid retrieval (RRF, Cormack et al. 2009): BM25 keyword ranks
    // fused with no-model semantic ranks (hashed-embedding cosine to
    // doc 0's vector) by sum of 1/(60+rank) — the lexical+semantic
    // union a curation pipeline runs when either signal alone misses.
    // Both rank lists and the fixed-order two-term fusion replay
    // engine-exactly (integer ranks, per-row sum only).
    "pl_search_hybrid_rrf" -> Q(
      (s, d) => graft.operators.Search.hybridTopKRrf(
          Tables(s, d, "documents"), "doc_id", "text",
          Seq("spark", "window", "hash"), probeId = 0L, kEach = 50, k = 10)
        .orderBy(col("rrf").desc, col("doc_id")),
      Some(hashedEmbedCtes + """, evec AS (
             |  SELECT c.doc_id,
             |    list(round(c.sv::DOUBLE / n.nrm, 6) + 0.0 ORDER BY c.d) AS e
             |  FROM ecomp c JOIN enrm n USING (doc_id) GROUP BY c.doc_id
             |), eq AS (SELECT e FROM evec WHERE doc_id = 0),
             |semtop AS (
             |  SELECT v.doc_id, round(list_cosine_similarity(v.e, q.e), 4) AS cos
             |  FROM evec v, eq q ORDER BY cos DESC, v.doc_id LIMIT 50
             |), sem AS (
             |  SELECT doc_id,
             |    row_number() OVER (ORDER BY cos DESC, doc_id) AS sem_rank
             |  FROM semtop
             |), btok AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t,
             |    CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS dl
             |  FROM documents
             |), bstats AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n,
             |    sum(dl) / count(*) AS avgdl,
             |    CAST(sum(CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             |    CAST(sum(CASE WHEN list_contains(t, 'window') THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             |    CAST(sum(CASE WHEN list_contains(t, 'hash') THEN 1 ELSE 0 END) AS DOUBLE) AS df2
             |  FROM btok
             |), bscored AS (
             |  SELECT doc_id, round(
             |    ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
             |      * (CAST(len(list_filter(t, w -> w = 'spark')) AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
             |      / (CAST(len(list_filter(t, w -> w = 'spark')) AS DOUBLE)
             |         + CAST(1.2 AS DOUBLE) * ((1 - CAST(0.75 AS DOUBLE)) + CAST(0.75 AS DOUBLE) * dl / avgdl))
             |    + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
             |      * (CAST(len(list_filter(t, w -> w = 'window')) AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
             |      / (CAST(len(list_filter(t, w -> w = 'window')) AS DOUBLE)
             |         + CAST(1.2 AS DOUBLE) * ((1 - CAST(0.75 AS DOUBLE)) + CAST(0.75 AS DOUBLE) * dl / avgdl))
             |    + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
             |      * (CAST(len(list_filter(t, w -> w = 'hash')) AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
             |      / (CAST(len(list_filter(t, w -> w = 'hash')) AS DOUBLE)
             |         + CAST(1.2 AS DOUBLE) * ((1 - CAST(0.75 AS DOUBLE)) + CAST(0.75 AS DOUBLE) * dl / avgdl))
             |    , 6) AS score
             |  FROM btok, bstats
             |), lextop AS (
             |  SELECT doc_id, score FROM bscored WHERE score > 0
             |  ORDER BY score DESC, doc_id LIMIT 50
             |), lex AS (
             |  SELECT doc_id,
             |    row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
             |  FROM lextop
             |)
             |SELECT doc_id, l.lex_rank, s.sem_rank,
             |  round(COALESCE(CAST(1 AS DOUBLE) / CAST(60 + l.lex_rank AS DOUBLE), 0)
             |      + COALESCE(CAST(1 AS DOUBLE) / CAST(60 + s.sem_rank AS DOUBLE), 0), 6) AS rrf
             |FROM lex l FULL JOIN sem s USING (doc_id)
             |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)),

    // sketch profiling: HLL distinct + quantile sketches per source.
    // The sketch VALUES are Spark-internal, but the CONTRACT hashes:
    // exact n_docs/n_tokens (DuckDB replays), plus Spark-side booleans
    // placing the HLL estimate within ±5% of exact and each quantile
    // estimate inside its exact interpolated-quantile bracket — a
    // drifting sketch flips a hashed column
    "pl_profile_sketch" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val prof = graft.operators.Profiling.corpusProfile(docs, "source", "text")
        val exact = docs.select(col("source"),
            TextAnalysis.tokenCount(col("text")).as("tk"),
            TextAnalysis.fingerprint(col("text")).as("fp"))
          .groupBy("source")
          .agg(countDistinct(col("fp")).as("d_exact"),
            expr("percentile(tk, array(0.45D, 0.55D, 0.85D, 0.95D, 0.97D))").as("qb"),
            max(col("tk")).as("qmax"))
        prof.join(exact, Seq("source"))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            (col("approx_distinct") >= col("d_exact") * 0.95 &&
             col("approx_distinct") <= col("d_exact") * 1.05).as("dist_ok"),
            (element_at(col("tok_quantiles"), 1) >= element_at(col("qb"), 1) &&
             element_at(col("tok_quantiles"), 1) <= element_at(col("qb"), 2)).as("p50_ok"),
            (element_at(col("tok_quantiles"), 2) >= element_at(col("qb"), 3) &&
             element_at(col("tok_quantiles"), 2) <= element_at(col("qb"), 4)).as("p90_ok"),
            (element_at(col("tok_quantiles"), 3) >= element_at(col("qb"), 5) &&
             element_at(col("tok_quantiles"), 3) <= col("qmax")).as("p99_ok"))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens,
             |  true AS dist_ok, true AS p50_ok, true AS p90_ok, true AS p99_ok
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // exact vocabulary head: partial-aggregated token counts into a
    // top-k heap; the exact companion to the sketch profile
    "pl_profile_top_tokens" -> Q(
      (s, d) => graft.operators.Profiling.topTokens(
        Tables(s, d, "documents"), "text", 30),
      Some("""SELECT token, count(*) AS freq
             |FROM (SELECT unnest(string_split(trim(text), ' ')) AS token
             |      FROM documents)
             |WHERE token != ''
             |GROUP BY token ORDER BY freq DESC, token LIMIT 30""".stripMargin)),

    // embedding-diversity sampling: nearest md5-seeded centroid cell,
    // md5-ordered per-cell quota — the oracle replays the full
    // quantizer (same CTEs as pl_emb_ann_ivf)
    "pl_sample_diverse" -> Q(
      (s, d) => graft.operators.Similarity.diversitySample(
          Tables(s, d, "embeddings"), "vec_id", "embedding",
          nlist = 8, perCell = 5)
        .orderBy("vec_id"),
      Some("""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cent AS (
             |  SELECT vec_id AS cid, v AS c FROM emb
             |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
             |),
             |assign AS (
             |  SELECT vec_id, cid FROM (
             |    SELECT e.vec_id, c.cid,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.cid) AS rn
             |    FROM emb e CROSS JOIN cent c) WHERE rn = 1
             |)
             |SELECT vec_id, cell FROM (
             |  SELECT vec_id, cid AS cell, row_number() OVER (
             |    PARTITION BY cid
             |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
             |  FROM assign) WHERE rk <= 5
             |ORDER BY vec_id""".stripMargin)),

    // exact one-pass table profile, unpivoted to a row per column
    "pl_profile_exact" -> Q(
      (s, d) => graft.operators.Profiling.tableProfile(
          Tables(s, d, "documents"), Seq("doc_id", "source"))
        .orderBy("column"),
      Some("""SELECT 'doc_id' AS "column", count(*) AS n_rows,
             |  count(*) - count(doc_id) AS n_nulls,
             |  count(DISTINCT doc_id) AS n_distinct,
             |  CAST(min(doc_id) AS VARCHAR) AS min_s,
             |  CAST(max(doc_id) AS VARCHAR) AS max_s
             |FROM documents
             |UNION ALL
             |SELECT 'source', count(*), count(*) - count(source),
             |  count(DISTINCT source),
             |  CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
             |FROM documents
             |ORDER BY "column"""".stripMargin)),

    // exact interpolated quantiles: Spark percentile and DuckDB
    // quantile_cont share the p·(n−1) linear-interpolation definition
    "pl_profile_quantiles" -> Q(
      (s, d) => Tables(s, d, "documents")
        .select(TextAnalysis.tokenCount(col("text")).as("t"))
        .agg(expr("percentile(t, array(0.5D, 0.9D, 0.99D))").as("qs"))
        .select(r4(element_at(col("qs"), 1)).as("p50"),
          r4(element_at(col("qs"), 2)).as("p90"),
          r4(element_at(col("qs"), 3)).as("p99")),
      Some("""SELECT
             |  round(quantile_cont(t, 0.5), 4) AS p50,
             |  round(quantile_cont(t, 0.9), 4) AS p90,
             |  round(quantile_cont(t, 0.99), 4) AS p99
             |FROM (SELECT CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS t
             |      FROM documents)""".stripMargin)),

    // exact token-count histogram: integer-div buckets, engine-stable
    "pl_profile_histogram" -> Q(
      (s, d) => graft.operators.Profiling.histogram(
        Tables(s, d, "documents"),
        TextAnalysis.tokenCount(col("text")), width = 10),
      Some("""SELECT CAST(len(string_split(trim(text), ' ')) AS BIGINT) // 10
             |    AS bucket, count(*) AS n
             |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // KMV bottom-k source-overlap matrix: deterministic md5 sketches,
    // so the oracle replays the sketch VALUES, not just estimates
    "pl_profile_source_overlap" -> Q(
      (s, d) => graft.operators.Profiling.sourceOverlapKmv(
          Tables(s, d, "documents"), "source", "text", k = 16)
        .orderBy("source_a", "source_b"),
      Some("""WITH h AS (
             |  SELECT DISTINCT source AS src, md5(text) AS hv FROM documents
             |), sig AS (
             |  SELECT src, list_sort(list(hv)) AS sg FROM (
             |    SELECT src, hv,
             |      row_number() OVER (PARTITION BY src ORDER BY hv) AS rk
             |    FROM h) WHERE rk <= 16 GROUP BY src
             |), pairs AS (
             |  SELECT a.src AS source_a, b.src AS source_b,
             |    list_sort(list_distinct(list_concat(a.sg, b.sg)))[1:16] AS m,
             |    a.sg AS sa, b.sg AS sb
             |  FROM sig a JOIN sig b ON a.src < b.src
             |)
             |SELECT source_a, source_b,
             |  round(CAST(len(list_intersect(list_intersect(m, sa), sb)) AS DOUBLE)
             |    / least(16, len(m)), 4) AS jaccard_est
             |FROM pairs ORDER BY source_a, source_b""".stripMargin)),

    // mergeable HLL sketch lifecycle: per-source sketches unioned to a
    // global distinct estimate without re-reading the corpus. The
    // estimate itself is Spark-internal sketch state, but the CONTRACT
    // is oracle-checkable: DuckDB computes the exact distinct count and
    // the ±5% window; Spark additionally asserts its merged estimate
    // lands inside it — a drifting estimator hash-mismatches on the
    // boolean
    "pl_profile_distinct_merge" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        // hll_sketch_estimate returns LongType
        val est = graft.operators.Profiling.unionDistinct(
            graft.operators.Profiling.distinctSketches(docs, "source", "text"))
          .head().getLong(0).toDouble
        docs.agg(countDistinct(col("text")).as("n_exact"))
          .select(col("n_exact"),
            floor(col("n_exact") * 0.95).cast(LongType).as("est_lo"),
            ceil(col("n_exact") * 1.05).cast(LongType).as("est_hi"),
            (lit(est) >= floor(col("n_exact") * 0.95) &&
             lit(est) <= ceil(col("n_exact") * 1.05)).as("est_in_bounds"))
      },
      Some("""SELECT count(DISTINCT text) AS n_exact,
             |  CAST(floor(count(DISTINCT text) * CAST(0.95 AS DOUBLE)) AS BIGINT) AS est_lo,
             |  CAST(ceil(count(DISTINCT text) * CAST(1.05 AS DOUBLE)) AS BIGINT) AS est_hi,
             |  true AS est_in_bounds
             |FROM documents""".stripMargin)),

    // mergeable count-min frequent-items lifecycle: per-source sketches
    // merged to one global sketch, queried for the exact top-20 tokens.
    // CONTRACT oracle: DuckDB replays the exact top-20 counts; Spark
    // additionally asserts each estimate obeys the CMS guarantee
    // (never undercounts, overcounts <= 3·ε·N) as a hashed boolean
    "pl_profile_freq_sketch" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val cms = graft.operators.Profiling.mergeTokenSketches(
          graft.operators.Profiling.tokenFrequencySketch(docs, "source", "text"))
        val top = graft.operators.Profiling.topTokens(docs, "text", 20)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        val n = docs.agg(coalesce(
          sum(TextAnalysis.tokenCount(col("text"))), lit(0L))).head().getLong(0)
        val slack = 3L * math.ceil(0.001 * n).toLong + 10L
        val rows = top.map { case (t, exact) =>
          val est = graft.operators.Profiling.estimateTokenCount(cms, t)
          (t, exact, est >= exact && est <= exact + slack)
        }.toSeq
        import s.implicits._
        rows.toDF("token", "n_exact", "est_ok")
          .orderBy(col("n_exact").desc, col("token"))
      },
      Some("""SELECT token, count(*) AS n_exact, true AS est_ok
             |FROM (SELECT unnest(string_split(trim(text), ' ')) AS token
             |      FROM documents)
             |WHERE token != ''
             |GROUP BY token ORDER BY n_exact DESC, token LIMIT 20""".stripMargin)),

    // corpus snapshot diff: old = docs minus the %7 slice, new = docs
    // minus the %11 slice with the %5 slice's text edited — the oracle
    // derives added/removed/changed INDEPENDENTLY from the modular
    // conditions, so the full-outer hash-compare plumbing is what's
    // under test
    "pl_corpus_diff" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
        val newSnap = docs.filter(col("doc_id") % 11 =!= 0)
          .withColumn("text", when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
        graft.operators.Curation.corpusDiff(oldSnap, newSnap, "doc_id", "text")
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id, status FROM (
             |  SELECT doc_id, CASE
             |    WHEN doc_id % 7 = 0 AND doc_id % 11 != 0 THEN 'added'
             |    WHEN doc_id % 11 = 0 AND doc_id % 7 != 0 THEN 'removed'
             |    WHEN doc_id % 5 = 0 AND doc_id % 7 != 0 AND doc_id % 11 != 0 THEN 'changed'
             |    ELSE 'unchanged' END AS status
             |  FROM documents)
             |WHERE status != 'unchanged' ORDER BY id""".stripMargin)),

    // graded contamination: per-doc shared-shingle fraction vs the
    // benchmark slice; LEFT join so zero-overlap docs keep a 0.0 score
    "pl_contamination_frac" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        graft.operators.Curation.contaminationFraction(
            docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
            docs.filter(col("doc_id") % 10 === 0), "text", n = 3)
          .orderBy("doc_id")
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(trim(text), ' ')) - 1, 2)),
             |    i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' '))) AS s
             |  FROM documents
             |), bench AS (
             |  SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 10 = 0
             |), corp AS (
             |  SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 10 != 0
             |)
             |SELECT c.doc_id, count(*) AS n_shingles, count(b.g) AS n_shared,
             |  round(CAST(count(b.g) AS DOUBLE) / count(*), 4) AS contamination
             |FROM corp c LEFT JOIN bench b ON c.g = b.g
             |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin)),

    // √-temperature mixture sampling: integer-arithmetic per-source
    // rates (engine-stable), md5-of-id keep decision; target = ⅓ of the
    // corpus token mass so rates are nontrivial at every SF
    "pl_sample_temperature" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val total = docs.agg(coalesce(
          sum(TextAnalysis.tokenCount(col("text"))), lit(0L))).head().getLong(0)
        graft.operators.Curation.temperatureSample(
            docs, "source", "doc_id", "text", total / 3)
          .select("doc_id", "source").orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS t
             |  FROM documents
             |), src AS (
             |  SELECT source, sum(t) AS n,
             |    CAST(floor(sqrt(CAST(sum(t) AS DOUBLE))) AS BIGINT) AS w
             |  FROM tok GROUP BY source
             |), r AS (
             |  SELECT source, least(1000,
             |    (1000 * ((SELECT sum(t) FROM tok) // 3) * CAST(w AS HUGEINT))
             |      // (CAST(sum(w) OVER () AS HUGEINT) * n)) AS permill
             |  FROM src
             |)
             |SELECT t.doc_id, t.source FROM tok t JOIN r USING (source)
             |WHERE ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000
             |  < r.permill
             |ORDER BY t.doc_id""".stripMargin)),

    // Bloom-filter decontamination: the blocklist compacts to a scan-
    // stage might_contain probe — zero corpus shuffle at any scale. The
    // filter's exact false-positive SET depends on Spark's internal
    // bloom hashing, which DuckDB cannot replay — but the CONTRACT is
    // oracle-checkable: zero false negatives (no blocklisted id
    // survives) and over-removal bounded by ~3×fpp. DuckDB supplies the
    // exact kept count; a broken filter flips a hashed column.
    "pl_decontaminate_bloom" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val blocklist = docs.filter(col("doc_id") % 10 === 0).select("doc_id")
        val kept = graft.operators.Curation.decontaminateBloom(
            docs, "doc_id", blocklist, "doc_id",
            expectedItems = 100000L, fpp = 0.01)
          .select("doc_id")
        val nFalseNeg = kept.join(blocklist, Seq("doc_id"), "left_semi")
          .agg(count(lit(1)).as("n_false_neg"))
        val nKeptBloom = kept.agg(count(lit(1)).as("__n_bloom"))
        val nKeptExact = docs.filter(col("doc_id") % 10 =!= 0)
          .agg(count(lit(1)).as("n_kept_exact"))
        nFalseNeg.crossJoin(nKeptBloom).crossJoin(nKeptExact)
          .select(col("n_false_neg"), col("n_kept_exact"),
            (col("n_kept_exact") - col("__n_bloom") <=
              ceil(col("n_kept_exact") * lit(0.03)) + lit(2L)).as("over_drop_ok"))
      },
      Some("""SELECT CAST(0 AS BIGINT) AS n_false_neg,
             |  count(*) AS n_kept_exact,
             |  true AS over_drop_ok
             |FROM documents WHERE doc_id % 10 != 0""".stripMargin)),

    // deterministic shuffle-and-shard: md5-bucket shard + in-shard
    // md5-rank position — globally shuffled, byte-reproducible output
    "pl_shuffle_shard" -> Q(
      (s, d) => graft.operators.Curation.shuffleShards(
          Tables(s, d, "documents"), "doc_id", 8)
        .select("doc_id", "shard", "pos").orderBy("doc_id"),
      Some("""WITH h AS (
             |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hv,
             |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
             |      AS INTEGER) AS shard
             |  FROM documents)
             |SELECT doc_id, shard,
             |  row_number() OVER (PARTITION BY shard ORDER BY hv, doc_id) AS pos
             |FROM h ORDER BY doc_id""".stripMargin)),

    // curriculum-ordered shards: within-shard position runs easy->hard
    // by token-count percentile stage, md5-decorrelated inside each
    // stage — the byte-reproducible curriculum a training reader
    // streams directly (Bengio et al. 2009 ordering, shuffleShards
    // reproducibility)
    "pl_curriculum_shard" -> Q(
      (s, d) => graft.operators.Curation.curriculumShards(
          Tables(s, d, "documents"), "doc_id",
          TextAnalysis.tokenCount(col("text")), shards = 8, stages = 4)
        .orderBy("doc_id"),
      Some("""WITH cd AS (
             |  SELECT doc_id,
             |    CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS d
             |  FROM documents
             |), cth AS (
             |  SELECT list_transform(quantile_cont(d,
             |    [CAST(1 AS DOUBLE)/4, CAST(2 AS DOUBLE)/4, CAST(3 AS DOUBLE)/4]),
             |    t -> round(t, 4)) AS th
             |  FROM cd
             |), cst AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(th, t -> d > t)) AS BIGINT) AS stage,
             |    md5(CAST(doc_id AS VARCHAR)) AS hv,
             |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
             |      AS INTEGER) AS shard
             |  FROM cd, cth
             |)
             |SELECT doc_id, stage, shard,
             |  row_number() OVER (PARTITION BY shard ORDER BY stage, hv, doc_id) AS pos
             |FROM cst ORDER BY doc_id""".stripMargin)),

    // normalized exact dedup: hash the CANONICAL form — catches the
    // case/spacing/unicode-form variants a raw-byte hash misses
    "pl_dedup_exact_normalized" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        Dedup.exactDuplicates(
            docs.withColumn("__norm",
              TextAnalysis.normalizeText(concat(col("text"),
                when(col("doc_id") % 2 === 0, lit("  X")).otherwise(lit(" x"))))),
            "doc_id", "__norm")
          .orderBy("content_hash")
      },
      Some("""SELECT md5(norm) AS content_hash, count(*) AS n_dups,
             |  min(doc_id) AS keep_id
             |FROM (SELECT doc_id, trim(regexp_replace(lower(nfc_normalize(
             |        text || (CASE WHEN doc_id % 2 = 0 THEN '  X' ELSE ' x' END))),
             |        '\s+', ' ', 'g')) AS norm
             |      FROM documents)
             |GROUP BY md5(norm) HAVING count(*) > 1
             |ORDER BY content_hash""".stripMargin)),

    // canonical normalization: NFC + lowercase + whitespace collapse —
    // the pre-hashing step; a PII-style suffix adds case/space variety
    "pl_text_normalize" -> Q(
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.normalizeText(
            concat(col("text"), lit("  TRAILING   Mixed CASEé "))).as("norm"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  trim(regexp_replace(lower(nfc_normalize(
             |    text || '  TRAILING   Mixed CASE' || chr(233) || ' ')),
             |    '\s+', ' ', 'g')) AS norm
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // unigram-LM quality score: corpus-fit token logprobs, per-doc mean
    // (CCNet-style perplexity proxy). Full DuckDB replay: same ln()
    // inputs (exact integer counts), same division shape; the residual
    // risk is double-sum order inside the per-doc mean, ~1e-13 against
    // a round-4 boundary — the same accepted class as every r4 query
    "pl_text_lm_quality" -> Q(
      (s, d) => graft.operators.TextAnalysis.unigramQualityScore(
          Tables(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t
             |  FROM documents
             |), tok2 AS (
             |  SELECT doc_id, t FROM tok WHERE t != ''
             |), counts AS (
             |  SELECT t, count(*) AS n FROM tok2 GROUP BY t
             |), tot AS (
             |  SELECT CAST(sum(n) AS BIGINT) AS total FROM counts
             |), lm AS (
             |  SELECT t, ln(CAST(n AS DOUBLE) / total) AS logp
             |  FROM counts, tot ORDER BY n DESC, t LIMIT 65536
             |)
             |SELECT doc_id,
             |  round(avg(coalesce(lm.logp,
             |    ln(1.0 / (SELECT total FROM tot)))), 4) AS logprob,
             |  count(*) AS n_tokens
             |FROM tok2 LEFT JOIN lm USING (t)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // boilerplate-span removal: spans shared by >=2 docs (the exact-dup
    // families in the fixture) are cut, survivors reassembled in order
    "pl_boilerplate_spans" -> Q(
      (s, d) => graft.operators.Curation.dropBoilerplateSpans(
          Tables(s, d, "documents"), "doc_id", "text",
          spanTokens = 8, minDocs = 2)
        .orderBy("doc_id"),
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
             |), spans AS (
             |  SELECT doc_id, pos, array_to_string(t[(pos*8+1):((pos+1)*8)], ' ') AS s
             |  FROM (SELECT doc_id, t,
             |          unnest(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT))) AS pos
             |        FROM tok)
             |), bad AS (
             |  SELECT s FROM spans GROUP BY s HAVING count(DISTINCT doc_id) >= 2
             |), kept AS (
             |  SELECT doc_id, pos, s FROM spans ANTI JOIN bad USING (s)
             |)
             |SELECT doc_id,
             |  array_to_string(list(s ORDER BY pos), ' ') AS clean_text
             |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // curation funnel report: survivor counts per screen (quality →
    // exact dedup → boilerplate) — pipeline observability, oracle-exact
    "pl_curate_report" -> Q(
      (s, d) => graft.operators.Curation.curationReport(
          Tables(s, d, "documents"), "doc_id", "text",
          minTokens = 10, spanTokens = 8, minDocs = 2)
        .orderBy("stage"),
      Some("""WITH quality AS (
             |  SELECT doc_id, text FROM documents
             |  WHERE len(string_split(trim(text), ' ')) >= 10
             |), dedup AS (
             |  SELECT doc_id, text FROM (
             |    SELECT doc_id, text, row_number() OVER (
             |      PARTITION BY md5(text) ORDER BY doc_id) AS rk
             |    FROM quality) WHERE rk = 1
             |), tokz AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM dedup
             |), spans AS (
             |  SELECT doc_id, pos, array_to_string(t[(pos*8+1):((pos+1)*8)], ' ') AS s
             |  FROM (SELECT doc_id, t,
             |          unnest(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT))) AS pos
             |        FROM tokz)
             |), bad AS (
             |  SELECT s FROM spans GROUP BY s HAVING count(DISTINCT doc_id) >= 2
             |), boiler AS (
             |  SELECT DISTINCT doc_id FROM spans ANTI JOIN bad USING (s)
             |)
             |SELECT '0_input' AS stage, count(*) AS n FROM documents
             |UNION ALL SELECT '1_quality', count(*) FROM quality
             |UNION ALL SELECT '2_dedup', count(*) FROM dedup
             |UNION ALL SELECT '3_boilerplate', count(*) FROM boiler
             |ORDER BY stage""".stripMargin)),

    // end-to-end curation v2: boilerplate removal → √-temperature
    // mixture (target = ½ the CLEANED token mass) → shuffle-shard.
    // Every stage is engine-stable, so the ORACLE REPLAYS THE WHOLE
    // CHAIN — the strongest gate in the suite
    "pl_curate_pipeline2" -> Q(
      (s, d) => graft.operators.Curation.curateV2(
          Tables(s, d, "documents"), "doc_id", "text", "source",
          spanTokens = 8, minDocs = 2, targetNum = 1, targetDen = 2,
          shards = 4)
        .select("doc_id", "source", "shard", "pos").orderBy("doc_id"),
      Some("""WITH tokz AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
             |), spans AS (
             |  SELECT doc_id, pos, array_to_string(t[(pos*8+1):((pos+1)*8)], ' ') AS s
             |  FROM (SELECT doc_id, t,
             |          unnest(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT))) AS pos
             |        FROM tokz)
             |), bad AS (
             |  SELECT s FROM spans GROUP BY s HAVING count(DISTINCT doc_id) >= 2
             |), kept_spans AS (
             |  SELECT doc_id, pos, s FROM spans ANTI JOIN bad USING (s)
             |), clean AS (
             |  SELECT doc_id,
             |    array_to_string(list(s ORDER BY pos), ' ') AS clean_text
             |  FROM kept_spans GROUP BY doc_id
             |), tok AS (
             |  SELECT c.doc_id, d.source,
             |    CAST(len(string_split(trim(clean_text), ' ')) AS BIGINT) AS t
             |  FROM clean c JOIN documents d USING (doc_id)
             |), src AS (
             |  SELECT source, sum(t) AS n,
             |    CAST(floor(sqrt(CAST(sum(t) AS DOUBLE))) AS BIGINT) AS w
             |  FROM tok GROUP BY source
             |), r AS (
             |  SELECT source, least(1000,
             |    (1000 * ((SELECT sum(t) FROM tok) // 2) * CAST(w AS HUGEINT))
             |      // (CAST(sum(w) OVER () AS HUGEINT) * n)) AS permill
             |  FROM src
             |), kept AS (
             |  SELECT t.doc_id, t.source FROM tok t JOIN r USING (source)
             |  WHERE ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8))::BIGINT
             |    % 1000 < r.permill
             |)
             |SELECT doc_id, source,
             |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4
             |    AS INTEGER) AS shard,
             |  row_number() OVER (
             |    PARTITION BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4
             |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos
             |FROM kept ORDER BY doc_id""".stripMargin)),

    // per-doc drop attribution: FIRST stage of the quality→dedup→quota
    // cascade that drops each document, or 'kept' — the lineage audit;
    // stage ranks replay the pl_curate_pipeline cascade exactly
    "pl_drop_reasons" -> Q(
      (s, d) => graft.operators.Curation.dropReasons(
          Tables(s, d, "documents"), "doc_id", "text", "source",
          minQuality = 0.6667, quotaK = 15)
        .orderBy("doc_id"),
      Some("""WITH q AS (
             |  SELECT doc_id, source, text,
             |    round(((CASE WHEN length(text) BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
             |          / greatest(length(text), 1) < 0.2 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN list_avg(list_transform(string_split(trim(text), ' '), t -> length(t)))
             |          BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 3.0, 4) AS quality
             |  FROM documents
             |), qf AS (
             |  SELECT * FROM q WHERE quality >= 0.6667
             |), dd AS (
             |  SELECT doc_id, source,
             |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dr
             |  FROM qf
             |), qt AS (
             |  SELECT doc_id, row_number() OVER (
             |    PARTITION BY source
             |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS qr
             |  FROM dd WHERE dr = 1
             |)
             |SELECT q.doc_id, q.source,
             |  CASE WHEN q.quality < 0.6667 THEN 'quality'
             |       WHEN d.dr > 1 THEN 'dedup'
             |       WHEN t.qr > 15 THEN 'quota'
             |       ELSE 'kept' END AS stage
             |FROM q
             |LEFT JOIN (SELECT doc_id, dr FROM dd) d ON d.doc_id = q.doc_id
             |LEFT JOIN qt t ON t.doc_id = q.doc_id
             |ORDER BY q.doc_id""".stripMargin)),

    // per-source rank normalization of the quality score: "top X% of
    // every source" composes fairly where an absolute threshold keeps
    // all of one source and none of another (raw score centers shift
    // with each source's token statistics)
    "pl_quality_rank_norm" -> Q(
      (s, d) => TextAnalysis.rankNormalize(
          Tables(s, d, "documents"), "doc_id", "source",
          TextAnalysis.qualityScore(col("text")))
        .orderBy("doc_id"),
      Some("""WITH q AS (
             |  SELECT doc_id, source,
             |    round(((CASE WHEN length(text) BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
             |          / greatest(length(text), 1) < 0.2 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN list_avg(list_transform(string_split(trim(text), ' '), t -> length(t)))
             |          BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 3.0, 4) AS score
             |  FROM documents
             |), nn AS (
             |  SELECT source, count(*) AS n FROM documents GROUP BY source
             |), r AS (
             |  SELECT doc_id, source, score, row_number() OVER (
             |    PARTITION BY source ORDER BY score ASC, doc_id) AS r
             |  FROM q
             |)
             |SELECT r.doc_id, r.source, r.score,
             |  CASE WHEN nn.n = 1 THEN 1.0
             |       ELSE round(CAST(r.r - 1 AS DOUBLE) / (nn.n - 1), 6) END AS src_pct
             |FROM r JOIN nn USING (source) ORDER BY doc_id""".stripMargin)),

    // curation v3: classifier-gated funnel (train in-engine, keep docs
    // scoring >= the corpus MEAN — integer-exact relative gate — then
    // exact-dedup, √-temperature to half the token mass, shard); the
    // oracle replays the whole chain incl. the 3-round GD trajectory
    "pl_curate_pipeline3" -> Q(
      (s, d) => graft.operators.Curation.curateV3(
          Tables(s, d, "documents"), "doc_id", "text", "source",
          (col("lang") === "en").cast(DoubleType),
          targetNum = 1, targetDen = 2, shards = 4)
        .select("doc_id", "source", "shard", "pos").orderBy("doc_id"),
      Some(clfTrajectoryCtes + """, ms AS (
             |  SELECT bk.doc_id,
             |    (SELECT w FROM g3 WHERE b = 64) + sum(g3.w) / count(*) AS m
             |  FROM bkt bk JOIN g3 USING (b) GROUP BY bk.doc_id
             |), sc AS (
             |  SELECT doc_id,
             |    CAST(round(round(1.0 / (1.0 + exp(-m)), 4) * 10000, 0) AS BIGINT) AS si
             |  FROM ms
             |), st AS (SELECT sum(si) AS tot, count(*) AS n FROM sc),
             |gate AS (SELECT doc_id FROM sc, st WHERE si * st.n >= st.tot),
             |gd AS (
             |  SELECT d.doc_id, d.source, d.text
             |  FROM documents d SEMI JOIN gate USING (doc_id)
             |), dd AS (
             |  SELECT doc_id, source, text FROM (
             |    SELECT doc_id, source, text,
             |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
             |    FROM gd) WHERE rk = 1
             |), v3t AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS t FROM dd
             |), v3src AS (
             |  SELECT source, sum(t) AS n,
             |    CAST(floor(sqrt(CAST(sum(t) AS DOUBLE))) AS BIGINT) AS w
             |  FROM v3t GROUP BY source
             |), v3r AS (
             |  SELECT source, least(1000,
             |    (1000 * ((SELECT sum(t) FROM v3t) // 2) * CAST(w AS HUGEINT))
             |      // (CAST(sum(w) OVER () AS HUGEINT) * n)) AS permill
             |  FROM v3src
             |), v3kept AS (
             |  SELECT t.doc_id, t.source FROM v3t t JOIN v3r r USING (source)
             |  WHERE ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8))::BIGINT
             |    % 1000 < r.permill
             |)
             |SELECT doc_id, source,
             |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4
             |    AS INTEGER) AS shard,
             |  row_number() OVER (
             |    PARTITION BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4
             |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos
             |FROM v3kept ORDER BY doc_id""".stripMargin)),

    // PII redaction: a known PII suffix is appended so the redaction is
    // exercised on every row; both engines apply identical regexes
    "pl_pii_redact" -> Q(
      (s, d) => {
        val pii = lit(" contact bob.smith@example.com at 192.168.0.1 or 555-123-4567")
        val aug = concat(col("text"), pii)
        Tables(s, d, "documents").select(col("doc_id"),
          md5(graft.operators.Curation.redactPii(aug).cast(BinaryType)).as("redacted_md5"),
          graft.operators.Curation.piiFlags(aug).getField("has_email").as("has_email"),
          graft.operators.Curation.piiFlags(aug).getField("has_ip").as("has_ip"),
          graft.operators.Curation.piiFlags(aug).getField("has_phone").as("has_phone"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  md5(regexp_replace(regexp_replace(regexp_replace(
             |    text || ' contact bob.smith@example.com at 192.168.0.1 or 555-123-4567',
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
             |    '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b', '<PHONE>', 'g')) AS redacted_md5,
             |  regexp_matches(text || ' contact bob.smith@example.com at 192.168.0.1 or 555-123-4567',
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') AS has_email,
             |  regexp_matches(text || ' contact bob.smith@example.com at 192.168.0.1 or 555-123-4567',
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b') AS has_ip,
             |  regexp_matches(text || ' contact bob.smith@example.com at 192.168.0.1 or 555-123-4567',
             |    '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b') AS has_phone
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // end-to-end curation composite: quality screen → exact dedup
    // (keep min id) → per-source quota — the standard pre-training
    // funnel, composed from the individual operators so the whole chain
    // is one declarative plan (Catalyst fuses the screens into the scan;
    // the only shuffles are the dedup group and the quota window)
    "pl_curate_pipeline" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val qual = docs.filter(TextAnalysis.qualityScore(col("text")) >= 0.6667)
        val deduped = Dedup.dropExactDuplicates(qual, "doc_id", "text")
        graft.operators.Curation.quotaSample(deduped, "source", "doc_id", 15)
          .select("doc_id", "source").orderBy("doc_id")
      },
      Some("""WITH q AS (
             |  SELECT doc_id, source, text,
             |    round(((CASE WHEN length(text) BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
             |          / greatest(length(text), 1) < 0.2 THEN 1.0 ELSE 0.0 END)
             |      + (CASE WHEN list_avg(list_transform(string_split(trim(text), ' '), t -> length(t)))
             |          BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 3.0, 4) AS quality
             |  FROM documents
             |), qf AS (
             |  SELECT * FROM q WHERE quality >= 0.6667
             |), dd AS (
             |  SELECT * FROM qf WHERE doc_id IN (SELECT min(doc_id) FROM qf GROUP BY md5(text))
             |)
             |SELECT doc_id, source FROM (
             |  SELECT doc_id, source, row_number() OVER (
             |    PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |  FROM dd) WHERE rk <= 15 ORDER BY doc_id""".stripMargin)),

    // deterministic 80/10/10 split assignment (md5-bucket per-mill cuts)
    "pl_data_split" -> Q(
      (s, d) => Tables(s, d, "documents").select(col("doc_id"),
          graft.operators.Curation.splitAssign(col("doc_id"),
            Seq("train" -> 800, "val" -> 100, "test" -> 100)).as("split"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val' ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS b
             |  FROM documents) ORDER BY doc_id""".stripMargin)),

    // cross-split leakage audit: near-dup pairs straddling train/val/test
    // (split labels are pure md5 of the pair's own ids — zero extra joins)
    "pl_split_leakage" -> Q(
      (s, d) => graft.operators.Curation.splitLeakage(
          Tables(s, d, "documents"), "doc_id", "text",
          Seq("train" -> 800, "val" -> 100, "test" -> 100),
          shingleN = 3, threshold = 0.5)
        .orderBy("split_a", "split_b"),
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(trim(text), ' ')) - 1, 2)),
             |    i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' '))) AS s
             |  FROM documents
             |), inv AS (
             |  SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh
             |), pr AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    round(count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)), 4) AS jaccard
             |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |  GROUP BY a.doc_id, b.doc_id
             |  HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.5
             |), lab AS (
             |  SELECT jaccard,
             |    CASE WHEN ('0x' || substr(md5(CAST(id_a AS VARCHAR)), 1, 8))::BIGINT % 1000 < 800 THEN 'train'
             |         WHEN ('0x' || substr(md5(CAST(id_a AS VARCHAR)), 1, 8))::BIGINT % 1000 < 900 THEN 'val'
             |         ELSE 'test' END AS sa,
             |    CASE WHEN ('0x' || substr(md5(CAST(id_b AS VARCHAR)), 1, 8))::BIGINT % 1000 < 800 THEN 'train'
             |         WHEN ('0x' || substr(md5(CAST(id_b AS VARCHAR)), 1, 8))::BIGINT % 1000 < 900 THEN 'val'
             |         ELSE 'test' END AS sb
             |  FROM pr
             |)
             |SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
             |  count(*) AS n_pairs, round(avg(jaccard), 4) AS avg_jaccard
             |FROM lab GROUP BY 1, 2 ORDER BY split_a, split_b""".stripMargin)),

    // token-budget mixture planner: α-temperature allocation per source
    // (α=0.5), 100k-token budget — rates/epochs for the sampling stages
    "pl_mixture_plan" -> Q(
      (s, d) => graft.operators.Curation.mixturePlan(
          Tables(s, d, "documents"), "source", "text",
          budgetTokens = 100000L, alpha = 0.5)
        .orderBy("source"),
      Some(mixturePlanCtes + """
             |SELECT source, n_docs, avail_tokens, share,
             |  CAST(floor(100000 * share) AS BIGINT) AS alloc_tokens,
             |  round(CAST(floor(100000 * share) AS DOUBLE) / avail_tokens, 6) AS sample_rate,
             |  CAST(ceil(CAST(floor(100000 * share) AS DOUBLE) / avail_tokens) AS BIGINT) AS epochs
             |FROM sh ORDER BY source""".stripMargin)),

    // mixture REALIZATION: expand the plan's per-source sample_rate
    // into an actual epoch-expanded corpus — floor(rate) guaranteed
    // copies per doc + one md5-drawn fractional copy in millionths
    // (the plan's own 6-dp resolution, salt "mix"). The oracle replays
    // the identical plan CTEs, so plan and realization cannot drift.
    "pl_mixture_realize" -> Q(
      (s, d) => graft.operators.Curation.realizeMixture(
          Tables(s, d, "documents"), "source", "doc_id", "text",
          budgetTokens = 100000L, alpha = 0.5)
        .orderBy("doc_id", "epoch"),
      Some(mixturePlanCtes + """, pln AS (
             |  SELECT source,
             |    round(CAST(floor(100000 * share) AS DOUBLE) / avail_tokens, 6) AS rate
             |  FROM sh
             |), ex AS (
             |  SELECT d.doc_id, d.source,
             |    CAST(floor(rate) AS BIGINT) AS fl,
             |    CAST(round((rate - floor(rate)) * 1000000) AS BIGINT) AS fppm,
             |    ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'mix'), 1, 8))::BIGINT % 1000000 AS draw
             |  FROM documents d JOIN pln USING (source)
             |), ncp AS (
             |  SELECT doc_id, source,
             |    fl + CASE WHEN draw < fppm THEN 1 ELSE 0 END AS n
             |  FROM ex
             |)
             |SELECT doc_id, source, CAST(unnest(range(0, n)) AS BIGINT) AS epoch
             |FROM ncp WHERE n > 0 ORDER BY doc_id, epoch""".stripMargin)),

    // token-window chunking (32-token windows, 8-token overlap)
    "pl_text_chunks" -> Q(
      (s, d) => graft.operators.Curation.chunkDocuments(
          Tables(s, d, "documents"), "doc_id", "text", size = 32, overlap = 8)
        .orderBy("doc_id", "chunk_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
             |), n AS (
             |  SELECT doc_id, ws,
             |    greatest(1, ceil((len(ws) - 8)::DOUBLE / 24)::BIGINT) AS nc
             |  FROM toks
             |)
             |SELECT doc_id, i AS chunk_id,
             |  array_to_string(ws[i*24+1 : i*24+32], ' ') AS chunk_text,
             |  len(ws[i*24+1 : i*24+32])::BIGINT AS chunk_tokens
             |FROM (SELECT doc_id, ws, unnest(range(0, nc)) AS i FROM n)
             |ORDER BY doc_id, chunk_id""".stripMargin)),

    // greedy sequence packing (512-token budget): distributed prefix
    // sum over id order; oracle is the equivalent global running sum.
    // DuckDB's sum() over BIGINT widens to HUGEINT, hence the casts.
    "pl_seq_pack" -> Q(
      (s, d) => graft.operators.Curation.packSequences(
          Tables(s, d, "documents"), "doc_id", "text", budget = 512)
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, len(string_split(trim(text), ' '))::BIGINT AS n_tokens
             |  FROM documents
             |), s AS (
             |  SELECT doc_id, n_tokens,
             |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
             |  FROM t
             |)
             |SELECT doc_id, n_tokens,
             |  (strt // 512)::BIGINT AS seq_id,
             |  (strt % 512)::BIGINT AS seq_offset
             |FROM s ORDER BY doc_id""".stripMargin)),

    // semantic-dedup apply: drop the higher id of every embedding-space
    // near-dup pair (cosine >= 0.25 within label blocks)
    "pl_emb_dedup_apply" -> Q(
      (s, d) => Dedup.dropEmbeddingNearDuplicates(
          Tables(s, d, "embeddings"), "vec_id", "embedding", "label", 0.25)
        .select("vec_id", "label").orderBy("vec_id"),
      Some("""SELECT vec_id, label FROM embeddings WHERE vec_id NOT IN (
             |  SELECT b.vec_id FROM embeddings a JOIN embeddings b
             |    ON a.label = b.label AND a.vec_id < b.vec_id
             |  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.25)
             |ORDER BY vec_id""".stripMargin)),

    // incremental semantic dedup: a delta batch (vec_id%5==0) against
    // the immutable corpus — drop delta vectors near an existing OR a
    // lower-id delta vector; LSH-bucket blocked, existing×existing
    // never paired; oracle replays the bucket chain (lshBucketCtes)
    "pl_emb_dedup_incr" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Dedup.dropIncrementEmbeddingNearDuplicates(
            emb.filter(col("vec_id") % 5 =!= 0),
            emb.filter(col("vec_id") % 5 === 0),
            "vec_id", "embedding", threshold = 0.25, nPlanes = 4)
          .select("vec_id", "label").orderBy("vec_id")
      },
      Some(lshBucketCtes + """,
             |inc AS (
             |  SELECT e.vec_id, e.v, b.bucket FROM emb e JOIN buckets b USING (vec_id)
             |  WHERE e.vec_id % 5 = 0
             |), ex AS (
             |  SELECT e.vec_id, e.v, b.bucket FROM emb e JOIN buckets b USING (vec_id)
             |  WHERE e.vec_id % 5 != 0
             |), rm AS (
             |  SELECT i.vec_id FROM inc i JOIN ex x ON i.bucket = x.bucket
             |  WHERE list_cosine_similarity(i.v, x.v) >= 0.25
             |  UNION
             |  SELECT a.vec_id FROM inc a JOIN inc b2
             |    ON a.bucket = b2.bucket AND a.vec_id > b2.vec_id
             |  WHERE list_cosine_similarity(a.v, b2.v) >= 0.25
             |)
             |SELECT e.vec_id, e.label FROM embeddings e
             |WHERE e.vec_id % 5 = 0 AND e.vec_id NOT IN (SELECT vec_id FROM rm)
             |ORDER BY vec_id""".stripMargin)),

    // deterministic hashed-projection document embedding (Achlioptas
    // sparse random projection over md5-hashed token tf): the
    // embed-raw-text-without-a-model primitive that feeds semdedup /
    // ANN / diversity when no embedding column exists. Long form
    // (doc_id, d, v) so the driver compares scalars.
    "pl_text_embed" -> Q(
      (s, d) => graft.operators.TextAnalysis.hashedEmbedding(
          Tables(s, d, "documents"), "doc_id", "text", buckets = 64, dim = 16)
        .select(col("doc_id"), posexplode(col("embedding")))
        .select(col("doc_id"), col("pos").cast(LongType).as("d"), col("col").as("v"))
        .orderBy("doc_id", "d"),
      Some(hashedEmbedCtes + """
             |SELECT c.doc_id, c.d::BIGINT AS d,
             |  round(c.sv::DOUBLE / n.nrm, 6) + 0.0 AS v
             |FROM ecomp c JOIN enrm n USING (doc_id)
             |ORDER BY doc_id, d""".stripMargin)),

    // semantic benchmark decontamination: corpus docs whose hashed
    // embedding is cosine >= 0.9 to any benchmark doc (doc_id%10==0
    // slice) — the paraphrase-level complement of pl_decontaminate's
    // shingle overlap. Embeddings are per-doc, so the oracle embeds the
    // whole table once and slices.
    "pl_decontaminate_semantic" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        graft.operators.Curation.contaminatedSemantic(
            docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
            docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
            threshold = 0.9)
          .orderBy("doc_id")
      },
      Some(hashedEmbedCtes + """, evs AS (
             |  SELECT c.doc_id,
             |    list(round(c.sv::DOUBLE / n.nrm, 6) + 0.0 ORDER BY c.d) AS e
             |  FROM ecomp c JOIN enrm n USING (doc_id) GROUP BY c.doc_id
             |)
             |SELECT c.doc_id,
             |  max(round(list_cosine_similarity(c.e, b.e), 4)) AS max_cos
             |FROM (SELECT * FROM evs WHERE doc_id % 10 != 0) c,
             |     (SELECT * FROM evs WHERE doc_id % 10 = 0) b
             |WHERE round(list_cosine_similarity(c.e, b.e), 4) >= 0.9
             |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin)),

    // end-to-end NO-MODEL semantic retrieval: hashed-projection embed
    // the corpus, take doc 0's vector as the probe, brute-force cosine
    // top-10 — the whole text->embedding->search chain in one
    // cross-engine-gated row
    "pl_text_semantic_topk" -> Q(
      (s, d) => {
        val emb = graft.operators.TextAnalysis.hashedEmbedding(
          Tables(s, d, "documents"), "doc_id", "text", buckets = 64, dim = 16)
        // probe vector from embedding only doc 0 (value-identical:
        // per-doc embeddings are independent) instead of a full corpus
        // embed pass for one row
        val q = graft.operators.TextAnalysis.hashedEmbedding(
            Tables(s, d, "documents").filter(col("doc_id") === 0),
            "doc_id", "text", buckets = 64, dim = 16)
          .select("embedding").head().getSeq[Double](0)
        Similarity.bruteForceTopKBatch(emb, "doc_id", "embedding",
            Seq((0L, q)), k = 10)
          .select(col("doc_id"), col("cos"))
          .orderBy(col("cos").desc, col("doc_id"))
      },
      Some(hashedEmbedCtes + """, evec AS (
             |  SELECT c.doc_id,
             |    list(round(c.sv::DOUBLE / n.nrm, 6) + 0.0 ORDER BY c.d) AS e
             |  FROM ecomp c JOIN enrm n USING (doc_id) GROUP BY c.doc_id
             |), eq AS (SELECT e FROM evec WHERE doc_id = 0)
             |SELECT v.doc_id, round(list_cosine_similarity(v.e, q.e), 4) AS cos
             |FROM evec v, eq q
             |ORDER BY cos DESC, v.doc_id LIMIT 10""".stripMargin)),

    // bigram-LM perplexity (one order up from pl_text_lm_quality,
    // toward the CCNet/KenLM filter): P(b|a)=c(a,b)/c_ctx(a), top-64k
    // table, unseen floored at ln(1/total), per-doc mean + exp(-mean)
    "pl_text_bigram_ppl" -> Q(
      (s, d) => graft.operators.TextAnalysis.bigramQualityScore(
          Tables(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(bigramPplCtes + """
             |SELECT doc_id, round(m, 4) AS logprob, round(exp(-m), 4) AS ppl,
             |  n_bigrams
             |FROM bscored ORDER BY doc_id""".stripMargin)),

    // CCNet head/middle/tail perplexity buckets (Wenzek et al. 2019):
    // per-language tertile thresholds over the bigram-LM perplexity,
    // bucket assigned by threshold comparison (NO per-language sort).
    // The oracle replays the identical LM trajectory (shared CTEs with
    // pl_text_bigram_ppl) then DuckDB's quantile_cont, which shares
    // Spark percentile's p·(n−1) interpolation definition.
    "pl_text_ppl_buckets" -> Q(
      (s, d) => graft.operators.TextAnalysis.perplexityBuckets(
          Tables(s, d, "documents"), "doc_id", "text", "lang")
        .orderBy("doc_id"),
      Some(bigramPplCtes + """, wl AS (
             |  SELECT s.doc_id, d.lang, round(exp(-s.m), 4) AS ppl
             |  FROM bscored s JOIN documents d USING (doc_id)
             |), bth AS (
             |  SELECT lang,
             |    round(quantile_cont(ppl, CAST(1 AS DOUBLE)/3), 4) AS t1,
             |    round(quantile_cont(ppl, CAST(2 AS DOUBLE)/3), 4) AS t2
             |  FROM wl GROUP BY lang
             |)
             |SELECT w.doc_id, w.lang, w.ppl,
             |  CASE WHEN w.ppl <= t1 THEN 'head'
             |       WHEN w.ppl <= t2 THEN 'middle'
             |       ELSE 'tail' END AS bucket
             |FROM wl w JOIN bth USING (lang) ORDER BY doc_id""".stripMargin)),

    // hard-negative mining for contrastive training: for 20 md5-sampled
    // anchors, the 5 most cosine-similar vectors with a DIFFERENT label
    "pl_emb_hard_negatives" -> Q(
      (s, d) => Similarity.hardNegatives(
          Tables(s, d, "embeddings"), "vec_id", "embedding", "label",
          nProbes = 20, k = 5)
        .orderBy("probe_id", "rank"),
      Some("""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
             |anch AS (
             |  SELECT vec_id AS probe_id, v AS pv, label AS probe_label FROM emb
             |  ORDER BY md5(CAST(vec_id AS VARCHAR) || 'probe'), vec_id LIMIT 20
             |)
             |SELECT probe_id, rank, vec_id, neg_label, cos FROM (
             |  SELECT a.probe_id, e.vec_id, e.label AS neg_label,
             |    round(list_cosine_similarity(e.v, a.pv), 4) AS cos,
             |    row_number() OVER (PARTITION BY a.probe_id
             |      ORDER BY round(list_cosine_similarity(e.v, a.pv), 4) DESC, e.vec_id)
             |      AS rank
             |  FROM anch a JOIN emb e ON e.label != a.probe_label
             |) WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin)),

    // contrastive triplets: per md5-sampled anchor, the nearest SAME-
    // label vector (positive) x its 5 hardest different-label vectors —
    // training pairs FOR an embedding model, mined in-engine
    "pl_emb_triplets" -> Q(
      (s, d) => Similarity.contrastiveTriplets(
          Tables(s, d, "embeddings"), "vec_id", "embedding", "label",
          nProbes = 20, kNeg = 5)
        .orderBy("probe_id", "neg_rank"),
      Some("""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
             |anch AS (
             |  SELECT vec_id AS probe_id, v AS pv, label AS probe_label FROM emb
             |  ORDER BY md5(CAST(vec_id AS VARCHAR) || 'probe'), vec_id LIMIT 20
             |), sc AS (
             |  SELECT a.probe_id, a.probe_label, e.vec_id AS cand_id,
             |    e.label AS cand_label,
             |    round(list_cosine_similarity(e.v, a.pv), 4) AS cos
             |  FROM anch a JOIN emb e ON e.vec_id != a.probe_id
             |), pos AS (
             |  SELECT probe_id, cand_id AS pos_id, cos AS pos_cos FROM (
             |    SELECT probe_id, cand_id, cos, row_number() OVER (
             |      PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS r
             |    FROM sc WHERE cand_label = probe_label) WHERE r = 1
             |), neg AS (
             |  SELECT probe_id, r AS neg_rank, cand_id AS neg_id, cos AS neg_cos FROM (
             |    SELECT probe_id, cand_id, cos, row_number() OVER (
             |      PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS r
             |    FROM sc WHERE cand_label != probe_label) WHERE r <= 5
             |)
             |SELECT p.probe_id, p.pos_id, p.pos_cos, n.neg_rank, n.neg_id, n.neg_cos
             |FROM pos p JOIN neg n USING (probe_id)
             |ORDER BY probe_id, neg_rank""".stripMargin)),

    // BPE tokenizer fitting (Sennrich et al. 2016): 6 merge rounds
    // learned over the word-TYPE frequency table (one corpus scan, then
    // vocab-sized rounds, one row to the driver per round). The oracle
    // unrolls the identical trajectory: pair-count -> top-1 (count
    // desc, pair asc) -> boundary-safe literal replace, per round —
    // integer counts and literal string surgery only, so it hashes.
    "pl_bpe_merges" -> Q(
      (s, d) => {
        val (merges, _) = Tokenizer.bpeTrain(
          Tables(s, d, "documents"), "text", rounds = 6)
        Tokenizer.bpeMergeTable(s, merges)
          .select(col("merge_rank").cast(LongType).as("merge_rank"),
            col("left").as("left_sym"), col("right").as("right_sym"),
            col("merged"), col("pair_count"))
          .orderBy("merge_rank")
      },
      Some(bpeCtes(6) + bpeMergesSelect(6))),

    // applying the fitted vocab back to the corpus: per-doc BPE token
    // count and chars-per-token compression (the number a tokenizer
    // consumer actually budgets by)
    "pl_bpe_encode" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val (_, vocab) = Tokenizer.bpeTrain(docs, "text", rounds = 6)
        Tokenizer.bpeEncodeStats(docs, "doc_id", "text", vocab)
          .orderBy("doc_id")
      },
      Some(bpeCtes(6) + bpeEncodeSelect(6))),

    // sequence packing by the FITTED tokenizer's counts: BPE encode the
    // corpus (6 merges), pack 512-token training sequences over the BPE
    // token counts — the "make batches with the real tokenizer" step
    "pl_bpe_pack" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val (_, vocab) = Tokenizer.bpeTrain(docs, "text", rounds = 6)
        val counts = Tokenizer.bpeEncodeStats(docs, "doc_id", "text", vocab)
          .select("doc_id", "n_tokens")
        graft.operators.Curation.packSequencesByCount(
            counts, "doc_id", "n_tokens", budget = 512)
          .orderBy("doc_id")
      },
      Some(bpeCtes(6) + """,
bdoc AS (
  SELECT t.doc_id, sum(len(string_split(trim(f.seq), '  ')))::BIGINT AS n_tokens
  FROM btoks t JOIN bseqs_6 f ON t.w = f.w GROUP BY t.doc_id
), bst AS (
  SELECT doc_id, n_tokens,
    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
  FROM bdoc
)
SELECT doc_id, n_tokens, (strt // 512)::BIGINT AS seq_id,
  (strt % 512)::BIGINT AS seq_offset
FROM bst ORDER BY doc_id""")),

    // SemDeDup (Abbas et al. 2023): semantic dedup scoped to LEARNED
    // k-means clusters — no label needed, the cluster id bounds the
    // pair stage. The oracle replays the full 2-iteration spherical
    // k-means trajectory (identical chain to pl_emb_ann_ivf_kmeans:
    // md5 seeds -> normalize+round(6) -> argmax-cosine assign ->
    // per-(cell,dim) means -> renormalize; empty cells keep their
    // centroid), then drops the higher id of every within-cluster pair
    // with cosine >= 0.25.
    "pl_emb_semdedup" -> Q(
      (s, d) => Dedup.semDeDup(
          Tables(s, d, "embeddings"), "vec_id", "embedding",
          nlist = AnnParams.IvfNlist, iters = AnnParams.KmIters, threshold = 0.25)
        .select(col("vec_id"), col("cell").cast(LongType).as("cell"), col("label"))
        .orderBy("vec_id"),
      Some(kmTrajCtes + """,
             |sd_pairs AS (
             |  SELECT b.vec_id AS rm FROM assign2 a JOIN assign2 b
             |    ON a.cell = b.cell AND a.vec_id < b.vec_id
             |  WHERE list_cosine_similarity(a.v, b.v) >= 0.25
             |)
             |SELECT e.vec_id, a.cell, e.label
             |FROM embeddings e JOIN assign2 a ON a.vec_id = e.vec_id
             |WHERE e.vec_id NOT IN (SELECT rm FROM sd_pairs)
             |ORDER BY e.vec_id""".stripMargin)),

    // embedding-diversity sampling over LEARNED k-means cells (the
    // pl_sample_diverse upgrade: trained cells instead of md5 seeds) —
    // md5-ordered quota of 10 per cell, the balanced topic-mix sampler
    "pl_sample_diverse_kmeans" -> Q(
      (s, d) => Similarity.diversitySampleKMeans(
          Tables(s, d, "embeddings"), "vec_id", "embedding",
          nlist = AnnParams.IvfNlist, iters = AnnParams.KmIters, perCell = 10)
        .orderBy("vec_id"),
      Some(kmTrajCtes + """
             |SELECT vec_id, cell FROM (
             |  SELECT vec_id, cell, row_number() OVER (PARTITION BY cell
             |    ORDER BY md5(CAST(vec_id AS VARCHAR) || 'div'), vec_id) AS rk
             |  FROM assign2) WHERE rk <= 10 ORDER BY vec_id""".stripMargin)),

    // per-cluster corpus profile on the same learned clustering: size,
    // dominant label, and purity — the triage view a curator reads
    // before deciding per-cluster sampling/filtering rates
    "pl_cluster_profile" -> Q(
      (s, d) => Similarity.clusterProfile(
          Tables(s, d, "embeddings"), "vec_id", "embedding", "label",
          nlist = AnnParams.IvfNlist, iters = AnnParams.KmIters)
        .orderBy("cell"),
      Some(kmTrajCtes + """,
             |csizes AS (SELECT cell, CAST(count(*) AS BIGINT) AS size FROM assign2 GROUP BY cell),
             |clab AS (
             |  SELECT a.cell, e.label, count(*) AS n FROM assign2 a
             |  JOIN embeddings e ON e.vec_id = a.vec_id GROUP BY a.cell, e.label
             |),
             |cdom AS (
             |  SELECT cell, label AS dom_label, n AS dom_n FROM (
             |    SELECT cell, label, n, row_number() OVER (
             |      PARTITION BY cell ORDER BY n DESC, label) AS rn FROM clab)
             |  WHERE rn = 1
             |)
             |SELECT s.cell, s.size, d.dom_label,
             |  round(CAST(d.dom_n AS DOUBLE) / s.size, 4) AS purity
             |FROM csizes s JOIN cdom d USING (cell) ORDER BY s.cell""".stripMargin)),

    // matryoshka-style dimension ablation: exact recall@10 of prefix-
    // truncated embeddings (8/16/32 of 64 dims) vs the full vectors —
    // the measurement that licenses searching a prefix at a fraction
    // of the memory/flops
    "pl_emb_dim_ablation" -> Q(
      (s, d) => Similarity.dimAblation(
          Tables(s, d, "embeddings"), "vec_id", "embedding",
          nProbes = 20, k = 10, dims = Seq(8, 16, 32))
        .orderBy("dim"),
      Some("""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |anch AS (
             |  SELECT vec_id AS probe_id, v AS pv FROM emb
             |  ORDER BY md5(CAST(vec_id AS VARCHAR) || 'probe'), vec_id LIMIT 20
             |), ftk AS (
             |  SELECT probe_id, vec_id FROM (
             |    SELECT a.probe_id, e.vec_id, row_number() OVER (
             |      PARTITION BY a.probe_id
             |      ORDER BY round(list_cosine_similarity(e.v, a.pv), 4) DESC, e.vec_id) AS r
             |    FROM anch a CROSS JOIN emb e) WHERE r <= 10
             |), dtk AS (
             |  SELECT dim, probe_id, vec_id FROM (
             |    SELECT dd.d AS dim, a.probe_id, e.vec_id, row_number() OVER (
             |      PARTITION BY dd.d, a.probe_id
             |      ORDER BY round(list_cosine_similarity(e.v[1:dd.d], a.pv[1:dd.d]), 4)
             |        DESC, e.vec_id) AS r
             |    FROM (VALUES (8), (16), (32)) dd(d), anch a, emb e) WHERE r <= 10
             |), hits AS (
             |  SELECT t.dim, t.probe_id, count(f.vec_id) AS h
             |  FROM dtk t LEFT JOIN ftk f
             |    ON f.probe_id = t.probe_id AND f.vec_id = t.vec_id
             |  GROUP BY t.dim, t.probe_id
             |)
             |SELECT CAST(dim AS BIGINT) AS dim,
             |  round(CAST(sum(h) AS DOUBLE) / (10 * 20), 4) AS mean_recall,
             |  round(CAST(min(h) AS DOUBLE) / 10, 4) AS min_recall
             |FROM hits GROUP BY dim ORDER BY dim""".stripMargin)),

    // prototype-distance pruning (Sorscher et al. 2022): keep the 70%
    // LEAST prototypical members of each learned k-means cell (cosine
    // to assigned centroid, ascending) — easy redundant examples go,
    // boundary examples stay; shares the k-means trajectory oracle
    "pl_emb_prototype_prune" -> Q(
      (s, d) => Similarity.prototypePrune(
          Tables(s, d, "embeddings"), "vec_id", "embedding",
          nlist = AnnParams.IvfNlist, iters = AnnParams.KmIters,
          keepPermill = 700)
        .orderBy("vec_id"),
      Some(kmTrajCtes + """,
             |ps AS (
             |  SELECT a.vec_id, a.cell,
             |    round(list_cosine_similarity(a.v, c.c), 6) AS proto_cos
             |  FROM assign2 a JOIN cent2 c ON c.idx = a.cell
             |), psz AS (
             |  SELECT cell, count(*) AS n FROM ps GROUP BY cell
             |), prk AS (
             |  SELECT p.vec_id, p.cell, p.proto_cos, s.n,
             |    row_number() OVER (PARTITION BY p.cell
             |      ORDER BY p.proto_cos ASC, p.vec_id) AS r
             |  FROM ps p JOIN psz s USING (cell)
             |)
             |SELECT vec_id, cell, proto_cos FROM prk
             |WHERE r <= greatest(1, (n * 700) // 1000)
             |ORDER BY vec_id""".stripMargin)),

    // deterministic mixture-rate sampling: md5-bucket rates per source
    // (src0 kept whole, src1 half, src2 nearly dropped, rest at 250 permill)
    "pl_sample_rate" -> Q(
      (s, d) => graft.operators.Curation.rateSample(
          Tables(s, d, "documents"), "source", "doc_id",
          Map("src0" -> 1000, "src1" -> 500, "src2" -> 50), defaultPermill = 250)
        .select("doc_id", "source").orderBy("doc_id"),
      Some("""SELECT doc_id, source FROM (
             |  SELECT doc_id, source,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS b
             |  FROM documents)
             |WHERE b < (CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 500
             |           WHEN 'src2' THEN 50 ELSE 250 END)
             |ORDER BY doc_id""".stripMargin)),

    // multimodal plumbing: binary payload column (text bytes stand in
    // for media), stub decode via mapPartitions. The stub kernel is
    // md5-derived, so DuckDB replays the full decode — the PLUMBING
    // (mapPartitions, schema, partitioning) is what's under test; the
    // kernel is an honest stand-in for absent codecs
    "pl_multimodal_decode" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
          .select(col("doc_id"), col("text").cast(BinaryType).as("media"))
        Multimodal.decodeImages(docs, "doc_id", "media")
          .select("doc_id", "width", "height").orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  (('0x' || substr(md5(text), 1, 8))::BIGINT % 1920 + 1)::INT AS width,
             |  (('0x' || substr(md5(text), 9, 8))::BIGINT % 1080 + 1)::INT AS height
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "pl_multimodal_features" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
          .select(col("doc_id"), col("text").cast(BinaryType).as("media"))
        Multimodal.extractFeatures(docs, "doc_id", "media", dim = 8)
          .select(col("doc_id"),
            round(element_at(col("features"), 1).cast(DoubleType), 4).as("f0"),
            size(col("features")).as("dim"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  round((('0x' || substr(md5('0:' || text), 1, 8))::BIGINT::DOUBLE
             |    / 4294967296)::FLOAT::DOUBLE, 4) AS f0,
             |  8 AS dim
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // audio plumbing: the payload interpreted as PCM-16LE — the byte
    // math is REAL (no codec), computed by one kernel in the scan
    // stage; DuckDB replays it from the hex dump with the same
    // accumulate order, so rms/zcr hash cross-engine
    "pl_multimodal_audio" -> Q(
      (s, d) => Multimodal.audioStats(
          Tables(s, d, "documents")
            .select(col("doc_id"), col("text").cast(BinaryType).as("media")),
          "doc_id", "media", rateHz = 16000)
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id, text::BLOB AS p FROM documents),
             |h AS (SELECT doc_id, octet_length(p) // 2 AS n, hex(p) AS hx FROM b),
             |w AS (
             |  SELECT doc_id, n, list_transform(range(0, n), i ->
             |    ('0x' || substr(hx, 4 * i + 3, 2) || substr(hx, 4 * i + 1, 2))::INTEGER
             |    - CASE WHEN ('0x' || substr(hx, 4 * i + 3, 2) || substr(hx, 4 * i + 1, 2))::INTEGER >= 32768
             |           THEN 65536 ELSE 0 END) AS sm
             |  FROM h
             |)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
             |  CAST((n * 1000) // 16000 AS BIGINT) AS duration_ms,
             |  round(CASE WHEN n = 0 THEN 0.0 ELSE
             |    sqrt(list_aggregate(list_transform(sm, x -> CAST(x AS DOUBLE) * x), 'sum') / n)
             |  END, 4) AS rms,
             |  round(CASE WHEN n < 2 THEN 0.0 ELSE
             |    CAST(len(list_filter(range(1, n), i -> (sm[i + 1] >= 0) != (sm[i] >= 0))) AS DOUBLE) / (n - 1)
             |  END, 4) AS zcr
             |FROM w ORDER BY doc_id""".stripMargin)),

    // perceptual average-hash of media payloads (one compiled kernel
    // pass; run on resizeImages(8,8) rasters in production — here the
    // payload bytes stand in, same stub convention as audio/frames)
    "pl_multimodal_phash" -> Q(
      (s, d) => Multimodal.perceptualHash(
          Tables(s, d, "documents")
            .select(col("doc_id"), col("text").cast(BinaryType).as("media")),
          "doc_id", "media")
        .orderBy("doc_id"),
      Some(phashCtes +
        """
          |SELECT doc_id, phash FROM ph ORDER BY doc_id""".stripMargin)),

    // perceptual near-dup image pairs: hamming <= 3 over the aHash via
    // the exact-recall block banding (shared with text SimHash); the
    // oracle verifies against the EXHAUSTIVE pair scan, so banding
    // recall is proven exact, not assumed
    "pl_multimodal_phash_pairs" -> Q(
      (s, d) => Multimodal.phashPairs(
          Tables(s, d, "documents")
            .select(col("doc_id"), col("text").cast(BinaryType).as("media")),
          "doc_id", "media", maxHamming = 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast(LongType).as("hamming"))
        .orderBy("id_a", "id_b"),
      Some(phashCtes +
        """
          |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
          |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
          |WHERE bit_count(xor(a.phash, b.phash)) <= 3
          |ORDER BY id_a, id_b""".stripMargin)),

    // video-frame sampling plumbing: n evenly spaced byte-slices of the
    // payload (stub frames, real timeline spacing + explode shape);
    // frames compared as hex so multi-byte boundaries can't break a
    // text round-trip (DuckDB's md5 is VARCHAR-only)
    "pl_multimodal_frames" -> Q(
      (s, d) => Multimodal.sampleFrames(
          Tables(s, d, "documents")
            .select(col("doc_id"), col("text").cast(BinaryType).as("media")),
          "doc_id", "media", n = 4)
        .select(col("doc_id"), col("frame_idx"),
          hex(col("frame_bytes")).as("frame_hex"))
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH b AS (SELECT doc_id, hex(text::BLOB) AS hx,
             |  octet_length(text::BLOB) AS ln FROM documents)
             |SELECT doc_id, CAST(g.i AS INT) AS frame_idx,
             |  substr(hx, CAST(2 * ((greatest(ln - 8, 0) * g.i) // 3) + 1 AS INT), 16) AS frame_hex
             |FROM b, (SELECT unnest(range(0, 4)) AS i) g
             |ORDER BY doc_id, frame_idx""".stripMargin)),

    // DSIR importance resampling: unigram-LM likelihood ratio
    // (target = src0-2) + deterministic md5-Gumbel top-100 draw.
    // vocab=16 < the corpus's 31 distinct tokens, so BOTH the
    // top-vocab LM cut and the out-of-vocabulary floor path are
    // exercised by the oracle
    "pl_dsir_sample" -> Q(
      (s, d) => graft.operators.Curation.importanceResample(
          Tables(s, d, "documents"), "doc_id", "text",
          col("source").isin("src0", "src1", "src2"), n = 100, vocab = 16)
        .orderBy("doc_id"),
      Some("""WITH tok AS (
             |  SELECT doc_id, source IN ('src0','src1','src2') AS tgt,
             |    unnest(string_split(trim(text), ' ')) AS t
             |  FROM documents
             |), tok2 AS (
             |  SELECT * FROM tok WHERE t != ''
             |), counts AS (
             |  SELECT t, count(*) AS n_raw,
             |    count(*) FILTER (WHERE tgt) AS n_tgt
             |  FROM tok2 GROUP BY t
             |), tot AS (
             |  SELECT CAST(sum(n_raw) AS BIGINT) AS tr,
             |    CAST(sum(n_tgt) AS BIGINT) AS tt FROM counts
             |), lm AS (
             |  SELECT t, ln((n_tgt + 1.0) / (tt + 16)) - ln((n_raw + 1.0) / (tr + 16)) AS lr
             |  FROM counts, tot ORDER BY n_raw DESC, t LIMIT 16
             |), scored AS (
             |  SELECT doc_id, round(sum(coalesce(lm.lr,
             |    (SELECT ln((tr + 16.0) / (tt + 16.0)) FROM tot))), 6) AS log_weight
             |  FROM tok2 LEFT JOIN lm USING (t) GROUP BY doc_id
             |), drawn AS (
             |  SELECT doc_id, log_weight,
             |    round(log_weight - ln(-ln(
             |      ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000) + 0.5)
             |        / 1000.0)), 6) AS score
             |  FROM scored
             |  ORDER BY score DESC, doc_id LIMIT 100
             |)
             |SELECT doc_id, log_weight, score FROM drawn
             |ORDER BY doc_id""".stripMargin)),

    // in-engine quality classifier: hashed-BoW logistic regression
    // (64 buckets, 3 full-batch GD rounds, lr=5.0, label lang='en'),
    // scored on the training frame; the oracle replays the exact
    // 3-round weight trajectory (round-6 updates, k-means discipline)
    "pl_quality_classifier" -> Q(
      (s, d) => TextAnalysis.trainAndScoreClassifier(
          Tables(s, d, "documents"), "doc_id", "text",
          (col("lang") === "en").cast(DoubleType),
          buckets = 64, iters = 3, lr = 5.0)
        .orderBy("doc_id"),
      Some(clfTrajectoryCtes + """, ms AS (
             |  SELECT bk.doc_id,
             |    (SELECT w FROM g3 WHERE b = 64) + sum(g3.w) / count(*) AS m
             |  FROM bkt bk JOIN g3 USING (b) GROUP BY bk.doc_id
             |)
             |SELECT doc_id, round(1.0 / (1.0 + exp(-m)), 4) AS score
             |FROM ms ORDER BY doc_id""".stripMargin)),

    // operating-point sweep over the trained classifier score: docs and
    // token mass retained at each gate threshold — ONE conditional
    // aggregate pass, |thresholds|-row unpivot (the curve read before
    // setting the pl_curate_pipeline3 gate)
    "pl_threshold_sweep" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val scored = TextAnalysis.trainAndScoreClassifier(docs, "doc_id", "text",
          (col("lang") === "en").cast(DoubleType), buckets = 64, iters = 3, lr = 5.0)
        val withTok = scored.join(
          docs.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tok")),
          "doc_id")
        TextAnalysis.thresholdSweep(withTok, "score", "n_tok",
          thresholds = (1 to 9).map(_ / 10.0)).orderBy("threshold")
      },
      Some(clfTrajectoryCtes + """, ms AS (
             |  SELECT bk.doc_id,
             |    (SELECT w FROM g3 WHERE b = 64) + sum(g3.w) / count(*) AS m
             |  FROM bkt bk JOIN g3 USING (b) GROUP BY bk.doc_id
             |), sc AS (
             |  SELECT doc_id, round(1.0 / (1.0 + exp(-m)), 4) AS p FROM ms
             |), tkc AS (
             |  SELECT doc_id, len(string_split(trim(text), ' '))::BIGINT AS n_tok
             |  FROM documents
             |), th AS (
             |  SELECT unnest([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS threshold
             |)
             |SELECT th.threshold,
             |  CAST(count(CASE WHEN s.p >= th.threshold THEN 1 END) AS BIGINT) AS docs_kept,
             |  CAST(coalesce(sum(CASE WHEN s.p >= th.threshold THEN t.n_tok END), 0) AS BIGINT) AS tokens_kept,
             |  CAST(count(*) AS BIGINT) AS docs_total,
             |  CAST(sum(t.n_tok) AS BIGINT) AS tokens_total,
             |  round(CAST(count(CASE WHEN s.p >= th.threshold THEN 1 END) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) + 0.0 AS frac_docs,
             |  round(CAST(coalesce(sum(CASE WHEN s.p >= th.threshold THEN t.n_tok END), 0) AS DOUBLE)
             |    / CAST(sum(t.n_tok) AS DOUBLE), 6) + 0.0 AS frac_tokens
             |FROM sc s JOIN tkc t USING (doc_id), th
             |GROUP BY th.threshold ORDER BY threshold""".stripMargin)),

    // ship-the-classifier: train once, round-trip the (slot, weight)
    // model table through parquet, score from the LOADED model — same
    // oracle as pl_quality_classifier, so a drift anywhere in the
    // artifact path turns this row red while the direct row stays green
    "pl_classifier_ship" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val (w, b) = TextAnalysis.trainClassifier(docs, "doc_id", "text",
          (col("lang") === "en").cast(DoubleType),
          buckets = 64, iters = 3, lr = 5.0)
        val dir = java.nio.file.Files.createTempDirectory("clf_ship").toString
        TextAnalysis.classifierToTable(s, w, b)
          .write.mode("overwrite").parquet(dir)
        val (w2, b2) = TextAnalysis.classifierFromTable(s.read.parquet(dir))
        TextAnalysis.scoreClassifier(docs, "doc_id", "text", w2, b2)
          .orderBy("doc_id")
      },
      Some(clfTrajectoryCtes + """, ms AS (
             |  SELECT bk.doc_id,
             |    (SELECT w FROM g3 WHERE b = 64) + sum(g3.w) / count(*) AS m
             |  FROM bkt bk JOIN g3 USING (b) GROUP BY bk.doc_id
             |)
             |SELECT doc_id, round(1.0 / (1.0 + exp(-m)), 4) AS score
             |FROM ms ORDER BY doc_id""".stripMargin)),

    // held-out evaluation of the SAME trained model (shared trajectory
    // CTEs): confusion counts + exact-ratio metrics in one bounded row
    "pl_classifier_eval" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val label = (col("lang") === "en").cast(DoubleType)
        val (w, b) = TextAnalysis.trainClassifier(
          docs, "doc_id", "text", label, buckets = 64, iters = 3, lr = 5.0)
        TextAnalysis.evaluateClassifier(docs, "doc_id", "text", label, w, b)
      },
      Some(clfTrajectoryCtes + """, msy AS (
             |  SELECT bk.doc_id, any_value(bk.y) AS y,
             |    (SELECT w FROM g3 WHERE b = 64) + sum(g3.w) / count(*) AS m
             |  FROM bkt bk JOIN g3 USING (b) GROUP BY bk.doc_id
             |), sc AS (
             |  SELECT y, round(1.0 / (1.0 + exp(-m)), 4) AS p FROM msy
             |), cf AS (
             |  SELECT count(*) AS n,
             |    CAST(sum(CASE WHEN p >= 0.5 AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             |    CAST(sum(CASE WHEN p >= 0.5 AND y != 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             |    CAST(sum(CASE WHEN p < 0.5 AND y != 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
             |    CAST(sum(CASE WHEN p < 0.5 AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
             |  FROM sc
             |)
             |SELECT n, tp, fp, tn, fn,
             |  round(CAST(tp + tn AS DOUBLE) / CAST(n AS DOUBLE), 4) AS accuracy,
             |  round(CASE WHEN tp + fp = 0 THEN 0.0
             |    ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END, 4) AS prec,
             |  round(CASE WHEN tp + fn = 0 THEN 0.0
             |    ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END, 4) AS recall,
             |  round(CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
             |    ELSE CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) END, 4) AS f1
             |FROM cf""".stripMargin)),

    // calibration curve for the SAME trained model (shared trajectory
    // CTEs): per-score-bin doc count, mean score, and observed positive
    // rate — pos_rate ≈ mean_score per bin is what licenses using the
    // score as a keep/drop threshold or sampling weight. 1000 bins:
    // this weakly-separating fixture model concentrates its scores in a
    // ~0.004-wide band, so decile/centile bins collapse to one row
    // while per-mill bins resolve the curve
    "pl_classifier_calibration" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val label = (col("lang") === "en").cast(DoubleType)
        val (w, b) = TextAnalysis.trainClassifier(
          docs, "doc_id", "text", label, buckets = 64, iters = 3, lr = 5.0)
        TextAnalysis.calibrationCurve(docs, "doc_id", "text", label, w, b,
          bins = 1000)
      },
      Some(clfTrajectoryCtes + """, msy AS (
             |  SELECT bk.doc_id, any_value(bk.y) AS y,
             |    (SELECT w FROM g3 WHERE b = 64) + sum(g3.w) / count(*) AS m
             |  FROM bkt bk JOIN g3 USING (b) GROUP BY bk.doc_id
             |), scd AS (
             |  SELECT y, round(1.0 / (1.0 + exp(-m)), 4) AS p FROM msy
             |)
             |SELECT CAST(least(floor(p * 1000), 999) AS BIGINT) AS bin,
             |  count(*) AS n_docs,
             |  round(avg(p), 4) AS mean_score,
             |  round(avg(y), 4) AS pos_rate
             |FROM scd GROUP BY bin ORDER BY bin""".stripMargin)),

    // substring-level exact dedup (suffix-array semantics declaratively:
    // overlapping 10-gram hashes, corpus-wide occurrence count >= 2,
    // gaps-and-islands merge to maximal spans) — Dedup.repeatedSpans
    "pl_substring_spans" -> Q(
      (s, d) => Dedup.repeatedSpans(Tables(s, d, "documents"), "doc_id", "text",
          k = 10, minOcc = 2)
        .orderBy("doc_id", "span_start"),
      Some(repeatedGramCtes +
        """, isl AS (
          |  SELECT doc_id, p, CASE WHEN p > coalesce(max(p) OVER (
          |      PARTITION BY doc_id ORDER BY p
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -11) + 10
          |    THEN 1 ELSE 0 END AS brk
          |  FROM dg
          |), grp AS (
          |  SELECT doc_id, p, sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid
          |  FROM isl
          |), spans AS (
          |  SELECT doc_id, min(p) AS span_start, max(p) + 9 AS span_end
          |  FROM grp GROUP BY doc_id, gid
          |)
          |SELECT s.doc_id, s.span_start, s.span_end,
          |  array_to_string(t.t[(s.span_start+1):(s.span_end+1)], ' ') AS span_text
          |FROM spans s JOIN tok t USING (doc_id)
          |ORDER BY doc_id, span_start""".stripMargin)),

    // remove every maximal repeated span, reassemble survivors —
    // Dedup.dropRepeatedSpans (conservative all-occurrences variant)
    "pl_dedup_substring" -> Q(
      (s, d) => Dedup.dropRepeatedSpans(Tables(s, d, "documents"), "doc_id", "text",
          k = 10, minOcc = 2)
        .orderBy("doc_id"),
      Some(repeatedGramCtes +
        """, covered AS (
          |  SELECT DISTINCT dg.doc_id, dg.p + r.range AS pos
          |  FROM dg, range(0, 10) r
          |), tokpos AS (
          |  SELECT doc_id, pos, t[pos+1] AS w
          |  FROM (SELECT doc_id, t, unnest(range(0, len(t))) AS pos FROM tok)
          |), kept AS (
          |  SELECT doc_id, pos, w FROM tokpos ANTI JOIN covered USING (doc_id, pos)
          |)
          |SELECT doc_id, array_to_string(list(w ORDER BY pos), ' ') AS clean_text
          |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // keep-first substring dedup: the globally first occurrence of each
    // duplicated gram survives (Lee et al. policy) — N verbatim copies
    // keep exactly one full copy
    "pl_dedup_substring_keepfirst" -> Q(
      (s, d) => Dedup.dropRepeatedSpansKeepFirst(Tables(s, d, "documents"),
          "doc_id", "text", k = 10, minOcc = 2)
        .orderBy("doc_id"),
      Some(repeatedGramCtes +
        """, occ AS (
          |  SELECT doc_id, p,
          |    row_number() OVER (PARTITION BY h ORDER BY doc_id, p) AS rn
          |  FROM g SEMI JOIN dup USING (h)
          |), rem AS (
          |  SELECT doc_id, p FROM occ WHERE rn > 1
          |), covered AS (
          |  SELECT DISTINCT rem.doc_id, rem.p + r.range AS pos
          |  FROM rem, range(0, 10) r
          |), tokpos AS (
          |  SELECT doc_id, pos, t[pos+1] AS w
          |  FROM (SELECT doc_id, t, unnest(range(0, len(t))) AS pos FROM tok)
          |), kept AS (
          |  SELECT doc_id, pos, w FROM tokpos ANTI JOIN covered USING (doc_id, pos)
          |)
          |SELECT doc_id, array_to_string(list(w ORDER BY pos), ' ') AS clean_text
          |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // per-source duplication profile: token mass inside repeated spans —
    // the observability row a curation run reads before paying for removal
    "pl_substring_profile" -> Q(
      (s, d) => Dedup.repeatedSpanProfile(Tables(s, d, "documents"),
          "doc_id", "text", "source", k = 10, minOcc = 2)
        .orderBy("source"),
      Some(repeatedGramCtes +
        """, covered AS (
          |  SELECT DISTINCT dg.doc_id, dg.p + r.range AS pos
          |  FROM dg, range(0, 10) r
          |), perdoc AS (
          |  SELECT doc_id, count(*) AS dup_toks FROM covered GROUP BY doc_id
          |), src AS (
          |  SELECT doc_id, source, len(string_split(trim(text), ' ')) AS toks
          |  FROM documents
          |)
          |SELECT source, count(*) AS n_docs,
          |  CAST(sum(toks) AS BIGINT) AS total_tokens,
          |  CAST(coalesce(sum(dup_toks), 0) AS BIGINT) AS dup_tokens,
          |  count(dup_toks) AS affected_docs,
          |  round(CAST(coalesce(sum(dup_toks), 0) AS DOUBLE) / sum(toks), 6) AS dup_frac
          |FROM src LEFT JOIN perdoc USING (doc_id)
          |GROUP BY source ORDER BY source""".stripMargin)),

    // winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003): sliding-
    // window min of word 8-gram hashes, rightmost-min tie rule realized
    // by one packed integer key — full (pos, hash) replay on a doc slice
    "pl_fingerprint_winnow" -> Q(
      (s, d) => TextAnalysis.winnowFingerprints(
          Tables(s, d, "documents").filter(col("doc_id") < 50),
          "doc_id", "text", k = 8, w = 4)
        .orderBy("doc_id", "fp_pos"),
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t
             |  FROM documents WHERE doc_id < 50
             |), g AS (
             |  SELECT doc_id, p,
             |    ('0x' || substr(md5(array_to_string(t[(p+1):(p+8)], ' ')), 1, 10))::BIGINT AS h
             |  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 7)) AS p
             |        FROM tok WHERE len(t) >= 8)
             |), kk AS (
             |  SELECT doc_id, p, h * 2097152 + (2097151 - p) AS kv FROM g
             |), rm AS (
             |  SELECT doc_id, p,
             |    min(kv) OVER (PARTITION BY doc_id ORDER BY p
             |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS m,
             |    max(p) OVER (PARTITION BY doc_id) AS lastp
             |  FROM kk
             |), sel AS (
             |  SELECT DISTINCT doc_id, m FROM rm WHERE p >= 3 OR p = lastp
             |)
             |SELECT doc_id, (2097151 - (m % 2097152)) AS fp_pos,
             |  (m // 2097152) AS fp_hash
             |FROM sel ORDER BY doc_id, fp_pos""".stripMargin)),

    // MOSS-style copy report: doc pairs sharing >= 3 winnowed
    // fingerprints (over-common fingerprints cut at df <= 20 — candidate
    // volume tracks true overlap, not boilerplate frequency)
    "pl_winnow_overlap" -> Q(
      (s, d) => TextAnalysis.winnowOverlapPairs(Tables(s, d, "documents"),
          "doc_id", "text", k = 8, w = 4, minShared = 3, maxDf = 20)
        .orderBy("id_a", "id_b"),
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
             |), g AS (
             |  SELECT doc_id, p,
             |    ('0x' || substr(md5(array_to_string(t[(p+1):(p+8)], ' ')), 1, 10))::BIGINT AS h
             |  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 7)) AS p
             |        FROM tok WHERE len(t) >= 8)
             |), kk AS (
             |  SELECT doc_id, p, h * 2097152 + (2097151 - p) AS kv FROM g
             |), rm AS (
             |  SELECT doc_id, p,
             |    min(kv) OVER (PARTITION BY doc_id ORDER BY p
             |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS m,
             |    max(p) OVER (PARTITION BY doc_id) AS lastp
             |  FROM kk
             |), fp AS (
             |  SELECT DISTINCT doc_id, (m // 2097152) AS h
             |  FROM rm WHERE p >= 3 OR p = lastp
             |), rare AS (
             |  SELECT h FROM fp GROUP BY h HAVING count(*) <= 20
             |), idx AS (
             |  SELECT doc_id, h FROM fp SEMI JOIN rare USING (h)
             |)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
             |FROM idx a JOIN idx b ON a.h = b.h AND a.doc_id < b.doc_id
             |GROUP BY 1, 2 HAVING count(*) >= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    // matched-region bounds per overlapping pair: min/max positions of
    // the shared fingerprints on each side — the extent report a
    // MOSS-style tool renders next to the pair list
    "pl_winnow_regions" -> Q(
      (s, d) => TextAnalysis.winnowMatchedRegions(Tables(s, d, "documents"),
          "doc_id", "text", k = 8, w = 4, minShared = 3, maxDf = 20)
        .orderBy("id_a", "id_b"),
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
             |), g AS (
             |  SELECT doc_id, p,
             |    ('0x' || substr(md5(array_to_string(t[(p+1):(p+8)], ' ')), 1, 10))::BIGINT AS h
             |  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 7)) AS p
             |        FROM tok WHERE len(t) >= 8)
             |), kk AS (
             |  SELECT doc_id, p, h * 2097152 + (2097151 - p) AS kv FROM g
             |), rm AS (
             |  SELECT doc_id, p,
             |    min(kv) OVER (PARTITION BY doc_id ORDER BY p
             |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS m,
             |    max(p) OVER (PARTITION BY doc_id) AS lastp
             |  FROM kk
             |), fp AS (
             |  SELECT DISTINCT doc_id, (2097151 - (m % 2097152)) AS fpp,
             |    (m // 2097152) AS h
             |  FROM rm WHERE p >= 3 OR p = lastp
             |), rare AS (
             |  SELECT h FROM (SELECT DISTINCT doc_id, h FROM fp)
             |  GROUP BY h HAVING count(*) <= 20
             |), idx AS (
             |  SELECT doc_id, fpp, h FROM fp SEMI JOIN rare USING (h)
             |)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  count(DISTINCT a.h) AS n_shared,
             |  min(a.fpp) AS a_start, max(a.fpp) AS a_end,
             |  min(b.fpp) AS b_start, max(b.fpp) AS b_end
             |FROM idx a JOIN idx b ON a.h = b.h AND a.doc_id < b.doc_id
             |GROUP BY 1, 2 HAVING count(DISTINCT a.h) >= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    // directed containment (quote/excerpt detection): >= 80% of the
    // subject doc's winnowed fingerprints present in the other doc —
    // asymmetric, unlike the overlap report; denominator is pre-cut
    "pl_winnow_containment" -> Q(
      (s, d) => TextAnalysis.winnowContainmentPairs(Tables(s, d, "documents"),
          "doc_id", "text", k = 8, w = 4, minPermill = 800, maxDf = 20)
        .orderBy("id_sub", "id_super"),
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
             |), g AS (
             |  SELECT doc_id, p,
             |    ('0x' || substr(md5(array_to_string(t[(p+1):(p+8)], ' ')), 1, 10))::BIGINT AS h
             |  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 7)) AS p
             |        FROM tok WHERE len(t) >= 8)
             |), kk AS (
             |  SELECT doc_id, p, h * 2097152 + (2097151 - p) AS kv FROM g
             |), rm AS (
             |  SELECT doc_id, p,
             |    min(kv) OVER (PARTITION BY doc_id ORDER BY p
             |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS m,
             |    max(p) OVER (PARTITION BY doc_id) AS lastp
             |  FROM kk
             |), fp AS (
             |  SELECT DISTINCT doc_id, (m // 2097152) AS h
             |  FROM rm WHERE p >= 3 OR p = lastp
             |), nfp AS (
             |  SELECT doc_id, count(*) AS nfp FROM fp GROUP BY doc_id
             |), rare AS (
             |  SELECT h FROM fp GROUP BY h HAVING count(*) <= 20
             |), idx AS (
             |  SELECT doc_id, h FROM fp SEMI JOIN rare USING (h)
             |), pr AS (
             |  SELECT a.doc_id AS id_sub, b.doc_id AS id_super, count(*) AS n_shared
             |  FROM idx a JOIN idx b ON a.h = b.h AND a.doc_id != b.doc_id
             |  GROUP BY 1, 2
             |)
             |SELECT p.id_sub, p.id_super, p.n_shared,
             |  round(CAST(p.n_shared AS DOUBLE) / f.nfp, 4) AS containment
             |FROM pr p JOIN nfp f ON f.doc_id = p.id_sub
             |WHERE p.n_shared * 1000 >= 800 * f.nfp
             |ORDER BY id_sub, id_super""".stripMargin)),

    // ship-the-winnow-index: even doc_ids are the stored corpus
    // (fingerprinted ONCE via the persistable (id, fp_pos, fp_hash)
    // artifact), odd doc_ids the delta — mine only delta-touching
    // overlap pairs against the index; the corpus text is never
    // re-fingerprinted. Oracle: the full-corpus overlap report minus
    // corpus-corpus pairs (df cut over the combined set, exactly what
    // the delta path computes).
    "pl_winnow_index_ship" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val indexFps = TextAnalysis.winnowFingerprints(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", k = 8, w = 4)
        TextAnalysis.winnowOverlapPairsDelta(indexFps,
            docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
            k = 8, w = 4, minShared = 3, maxDf = 20)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
             |), g AS (
             |  SELECT doc_id, p,
             |    ('0x' || substr(md5(array_to_string(t[(p+1):(p+8)], ' ')), 1, 10))::BIGINT AS h
             |  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 7)) AS p
             |        FROM tok WHERE len(t) >= 8)
             |), kk AS (
             |  SELECT doc_id, p, h * 2097152 + (2097151 - p) AS kv FROM g
             |), rm AS (
             |  SELECT doc_id, p,
             |    min(kv) OVER (PARTITION BY doc_id ORDER BY p
             |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS m,
             |    max(p) OVER (PARTITION BY doc_id) AS lastp
             |  FROM kk
             |), fp AS (
             |  SELECT DISTINCT doc_id, (m // 2097152) AS h
             |  FROM rm WHERE p >= 3 OR p = lastp
             |), rare AS (
             |  SELECT h FROM fp GROUP BY h HAVING count(*) <= 20
             |), idx AS (
             |  SELECT doc_id, h FROM fp SEMI JOIN rare USING (h)
             |)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
             |FROM idx a JOIN idx b ON a.h = b.h AND a.doc_id < b.doc_id
             |WHERE NOT (a.doc_id % 2 = 0 AND b.doc_id % 2 = 0)
             |GROUP BY 1, 2 HAVING count(*) >= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    // priority-aware near-dedup: per near-dup cluster keep the best-
    // priority member (prefer-English rule here; prefer-curated-source
    // in production) — the cross-source resolution real pipelines apply
    "pl_dedup_apply_priority" -> Q(
      (s, d) => Dedup.dropNearDuplicatesByPriority(
          Tables(s, d, "documents"), "doc_id", "text",
          priority = when(col("lang") === "en", 0)
            .when(col("lang") === "es", 1).otherwise(2),
          shingleN = 3, bands = 32, rowsPerBand = 4, threshold = 0.5)
        .select("doc_id", "source", "lang").orderBy("doc_id"),
      Some("""WITH RECURSIVE sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(trim(text), ' ')) - 1, 2)),
             |    i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' '))) AS s
             |  FROM documents
             |), inv AS (
             |  SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh
             |), pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |  GROUP BY a.doc_id, b.doc_id
             |  HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.5
             |), edges AS (
             |  SELECT id_a AS a, id_b AS b FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs
             |), reach(a, b) AS (
             |  SELECT a, b FROM edges
             |  UNION
             |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
             |), clusters AS (
             |  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
             |  FROM reach GROUP BY a
             |), pr AS (
             |  SELECT doc_id, source, lang,
             |    CASE WHEN lang = 'en' THEN 0 WHEN lang = 'es' THEN 1 ELSE 2 END AS prio
             |  FROM documents
             |), ranked AS (
             |  SELECT p.doc_id,
             |    row_number() OVER (PARTITION BY c.cluster_id
             |      ORDER BY p.prio, p.doc_id) AS rk
             |  FROM pr p JOIN clusters c USING (doc_id)
             |), rm AS (
             |  SELECT doc_id FROM ranked WHERE rk > 1
             |)
             |SELECT doc_id, source, lang FROM pr ANTI JOIN rm USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // dedup-aware split: the split hash reads the near-dup CLUSTER id,
    // so a doc and its near-duplicates land in the SAME split by
    // construction (zero pl_split_leakage-style straddle); singleton
    // docs hash their own id, identical to the plain splitAssign
    "pl_split_dedup_aware" -> Q(
      (s, d) => graft.operators.Curation.dedupAwareSplit(
          Tables(s, d, "documents"), "doc_id", "text",
          Seq("train" -> 900, "eval" -> 100),
          shingleN = 3, bands = 32, rowsPerBand = 4, threshold = 0.5)
        .orderBy("doc_id"),
      Some("""WITH RECURSIVE sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(trim(text), ' ')) - 1, 2)),
             |    i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' '))) AS s
             |  FROM documents
             |), inv AS (
             |  SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh
             |), pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |  GROUP BY a.doc_id, b.doc_id
             |  HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.5
             |), edges AS (
             |  SELECT id_a AS a, id_b AS b FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs
             |), reach(a, b) AS (
             |  SELECT a, b FROM edges
             |  UNION
             |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
             |), clusters AS (
             |  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
             |  FROM reach GROUP BY a
             |), assigned AS (
             |  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
             |  FROM documents d LEFT JOIN clusters c USING (doc_id)
             |)
             |SELECT doc_id, cluster_id,
             |  CASE WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))::BIGINT
             |            % 1000 < 900
             |       THEN 'train' ELSE 'eval' END AS split
             |FROM assigned ORDER BY doc_id""".stripMargin)),

    // distribution-drift monitor (PSI shape): token-count histograms of
    // the src0-9 slice vs the src10-19 slice, per-bin shares + PSI term
    // (per-bin, not summed — no float-summation-order sensitivity;
    // one-sided bins carry NULL terms with counts still visible)
    "pl_dist_drift" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        graft.operators.Profiling.distributionDrift(
            docs.filter(length(col("source")) === 4),
            docs.filter(length(col("source")) === 5),
            TextAnalysis.tokenCount(col("text")), width = 10)
          .orderBy("bucket")
      },
      Some("""WITH v AS (
             |  SELECT CASE WHEN length(source) = 4 THEN 0 ELSE 1 END AS side,
             |    len(string_split(trim(text), ' '))::BIGINT AS v
             |  FROM documents
             |), ho AS (
             |  SELECT v // 10 AS bucket, count(*) AS n_old FROM v
             |  WHERE side = 0 GROUP BY v // 10
             |), hn AS (
             |  SELECT v // 10 AS bucket, count(*) AS n_new FROM v
             |  WHERE side = 1 GROUP BY v // 10
             |), j AS (
             |  SELECT coalesce(ho.bucket, hn.bucket) AS bucket,
             |    coalesce(n_old, 0)::BIGINT AS n_old,
             |    coalesce(n_new, 0)::BIGINT AS n_new
             |  FROM ho FULL OUTER JOIN hn ON ho.bucket = hn.bucket
             |), t AS (
             |  SELECT sum(n_old)::BIGINT AS t_o, sum(n_new)::BIGINT AS t_n FROM j
             |)
             |SELECT j.bucket, j.n_old, j.n_new,
             |  round(CAST(j.n_old AS DOUBLE) / t.t_o, 6) AS p,
             |  round(CAST(j.n_new AS DOUBLE) / t.t_n, 6) AS q,
             |  CASE WHEN j.n_old > 0 AND j.n_new > 0 THEN
             |    round((CAST(j.n_old AS DOUBLE) / t.t_o - CAST(j.n_new AS DOUBLE) / t.t_n)
             |      * ln(CAST(j.n_old AS DOUBLE) * t.t_n / (CAST(j.n_new AS DOUBLE) * t.t_o)), 6)
             |  END AS psi_term
             |FROM j, t ORDER BY bucket""".stripMargin)),

    // Per-token KL contributions of each source vs the corpus mixture:
    // the tokens DRIVING a distribution shift (what pl_dist_drift
    // reports only in aggregate); integer-exact operands, one
    // (source, token) shuffle, per-source top-k window
    "pl_token_divergence" -> Q(
      (s, d) => graft.operators.Profiling.tokenDivergence(
          Tables(s, d, "documents"), "source", "text", topK = 15)
        .orderBy("source", "rk"),
      Some("""WITH tdtk AS (
             |  SELECT source, unnest(string_split(trim(text), ' ')) AS t FROM documents
             |), tdsrc AS (
             |  SELECT source, t, count(*) AS c_s FROM tdtk WHERE t != '' GROUP BY source, t
             |), tdstot AS (
             |  SELECT source, sum(c_s)::BIGINT AS t_s FROM tdsrc GROUP BY source
             |), tdcorp AS (
             |  SELECT t, sum(c_s)::BIGINT AS c FROM tdsrc GROUP BY t
             |), tdtot AS (
             |  SELECT sum(c_s)::BIGINT AS tt FROM tdsrc
             |), tdkl AS (
             |  SELECT b.source, b.t, b.c_s,
             |    (CAST(b.c_s AS DOUBLE) / CAST(s.t_s AS DOUBLE)) *
             |      ln((CAST(b.c_s AS DOUBLE) * CAST(x.tt AS DOUBLE)) /
             |         (CAST(c.c AS DOUBLE) * CAST(s.t_s AS DOUBLE))) AS kl
             |  FROM tdsrc b JOIN tdstot s USING (source) JOIN tdcorp c USING (t), tdtot x
             |)
             |SELECT source, rk, t AS token, c_s AS n_tok,
             |  round(kl, 6) + 0.0 AS kl_contrib
             |FROM (SELECT *, row_number() OVER (
             |        PARTITION BY source ORDER BY kl DESC, t) AS rk FROM tdkl)
             |WHERE rk <= 15 ORDER BY source, rk""".stripMargin)),

    // Heaps'-law vocabulary growth per source: new distinct tokens per
    // rank decile + cumulative vocab — the "does this source contain
    // new content or templates" corpus screen
    "pl_vocab_growth" -> Q(
      (s, d) => graft.operators.Profiling.vocabGrowth(
          Tables(s, d, "documents"), "doc_id", "source", "text", buckets = 10)
        .orderBy("source", "bucket"),
      Some("""WITH ranked AS (
             |  SELECT doc_id, source, text, row_number() OVER (
             |    PARTITION BY source
             |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
             |  FROM documents
             |), nn AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
             |tk AS (
             |  SELECT source, r, unnest(string_split(trim(text), ' ')) AS t
             |  FROM ranked
             |), fr AS (
             |  SELECT source, t, min(r) AS fr FROM tk WHERE t != ''
             |  GROUP BY source, t
             |), bk AS (
             |  SELECT f.source, ((f.fr - 1) * 10) // nn.n AS bucket,
             |    count(*) AS new_tokens
             |  FROM fr f JOIN nn USING (source)
             |  GROUP BY f.source, ((f.fr - 1) * 10) // nn.n
             |)
             |SELECT source, CAST(bucket AS BIGINT) AS bucket, new_tokens,
             |  CAST(sum(new_tokens) OVER (
             |    PARTITION BY source ORDER BY bucket) AS BIGINT) AS cum_vocab
             |FROM bk ORDER BY source, bucket""".stripMargin)),

    // robust length-outlier screen: per-source median/MAD flag at
    // k=1.5 (mean/σ would be dragged by the very outliers it hunts)
    "pl_stats_outliers" -> Q(
      (s, d) => graft.operators.Profiling.madOutliers(
          Tables(s, d, "documents"), "doc_id", "source",
          TextAnalysis.tokenCount(col("text")), k = 1.5)
        .select(col("doc_id"), col("source"), col("v").cast(LongType).as("n_tok"),
          col("med"), col("mad"))
        .orderBy("doc_id"),
      Some("""WITH v AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS v
             |  FROM documents
             |), m AS (
             |  SELECT source, quantile_cont(v, 0.5) AS med FROM v GROUP BY source
             |), dv AS (
             |  SELECT v.doc_id, v.source, v.v, m.med, abs(v.v - m.med) AS dev
             |  FROM v JOIN m USING (source)
             |), md AS (
             |  SELECT source, quantile_cont(dev, 0.5) AS mad FROM dv GROUP BY source
             |)
             |SELECT doc_id, source, CAST(v AS BIGINT) AS n_tok,
             |  round(med, 4) AS med, round(mad, 4) AS mad
             |FROM dv JOIN md USING (source)
             |WHERE dev > 1.5 * mad ORDER BY doc_id""".stripMargin)),

    // screen-ablation report: per quality screen, docs failing it and
    // docs failing ONLY it (is each screen doing unique work?) — all
    // four screens in integer arithmetic so any engine replays exactly
    "pl_screen_ablation" -> Q(
      (s, d) => {
        val toks = split(trim(col("text")), "\\s+")
        val ntok = size(toks)
        val nonspace = length(regexp_replace(col("text"), " ", ""))
        graft.operators.Curation.screenAblation(Tables(s, d, "documents"), Seq(
          "len" -> (ntok >= 30 && ntok <= 1000),
          "wordlen" -> (nonspace * 2 < ntok * 9),
          "dup" -> (size(array_distinct(toks)) * 20 >= ntok * 9),
          "stop" -> (size(filter(toks,
            t => t.isin("the", "a", "of", "to", "in"))) * 20 >= ntok)))
          .orderBy("screen")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, len(tk) AS ntok, ns,
             |    len(list_distinct(tk)) AS nd,
             |    len(list_filter(tk, x -> x IN ('the','a','of','to','in'))) AS stop
             |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS tk,
             |          len(replace(text, ' ', '')) AS ns FROM documents)
             |), f AS (
             |  SELECT doc_id,
             |    CASE WHEN ntok BETWEEN 30 AND 1000 THEN 0 ELSE 1 END AS f_len,
             |    CASE WHEN ns * 2 < ntok * 9 THEN 0 ELSE 1 END AS f_wordlen,
             |    CASE WHEN nd * 20 >= ntok * 9 THEN 0 ELSE 1 END AS f_dup,
             |    CASE WHEN stop * 20 >= ntok THEN 0 ELSE 1 END AS f_stop
             |  FROM m
             |), g AS (
             |  SELECT doc_id, f_len, f_wordlen, f_dup, f_stop,
             |    f_len + f_wordlen + f_dup + f_stop AS nf FROM f
             |)
             |SELECT screen, CAST(n_fail AS BIGINT) AS n_fail,
             |  CAST(n_unique_fail AS BIGINT) AS n_unique_fail FROM (
             |  SELECT 'len' AS screen, sum(f_len) AS n_fail,
             |    sum(CASE WHEN f_len = 1 AND nf = 1 THEN 1 ELSE 0 END) AS n_unique_fail FROM g
             |  UNION ALL
             |  SELECT 'wordlen', sum(f_wordlen),
             |    sum(CASE WHEN f_wordlen = 1 AND nf = 1 THEN 1 ELSE 0 END) FROM g
             |  UNION ALL
             |  SELECT 'dup', sum(f_dup),
             |    sum(CASE WHEN f_dup = 1 AND nf = 1 THEN 1 ELSE 0 END) FROM g
             |  UNION ALL
             |  SELECT 'stop', sum(f_stop),
             |    sum(CASE WHEN f_stop = 1 AND nf = 1 THEN 1 ELSE 0 END) FROM g
             |  UNION ALL
             |  SELECT '__any__', sum(CASE WHEN nf > 0 THEN 1 ELSE 0 END),
             |    sum(CASE WHEN nf > 0 THEN 1 ELSE 0 END) FROM g
             |) ORDER BY screen""".stripMargin)),
  )

  /** Multi-probe recall@10 of every ANN method against the exact
    * brute-force top-10 (r9 verdict #3): the r8 single-probe row
    * saturated at 1.0 on large corpora because one query vector's
    * near-duplicates ARE its exact top-10 — a metric that discriminates
    * nothing. This row samples `nProbes` probe ids deterministically
    * (salted md5 order — DECORRELATED from the quantizer seed order,
    * though a row can still land in both the seed set and the probe
    * set), computes the exact top-10 for ALL probes in ONE corpus
    * scan ([[Similarity.bruteForceTopKBatch]], collected to a bounded
    * probes×10 pair list), runs each method's BATCH variant (index
    * trained once, probes broadcast), and emits per-method mean/min
    * recall. The oracle replays the probe draw, the exact ground truth,
    * and all five method pipelines (LSH buckets, seeded IVF, the
    * k-means trajectory, the PQ Lloyd chain via [[pqTrainCtes]]) over
    * the same probe set. Mean recall is computed as
    * sum(hits)/(10·probes) — integer arithmetic until one final
    * division, so the 4-dp rounding cannot sit on a float-noise
    * boundary. */
  private val annRecallEntry: (String, Q) = {
    val nProbes = 50
    val fn: CoreQueries.QFn = (s, d) => {
      val emb = Tables(s, d, "embeddings")
      val probes = Similarity.probeRows(emb, "vec_id", "embedding", nProbes)
      // ONE exact scan for every probe, collected to a bounded
      // nProbes×10 literal frame: joining the lazy exact plan into all
      // five method branches would re-run the brute-force scan per method
      // the exact leg stays single-task on the fixture (VERDICT r16 #7
      // tried in r17 and REVERTED: fanning the one batch out added ~13
      // core-s of task/JIT overhead for ~0.7 core-s of cosine work,
      // wall flat-to-worse — see bruteForceTopKBatch's scaladoc)
      val exactPairs = Similarity
        .bruteForceTopKBatch(emb, "vec_id", "embedding", probes, 10)
        .select(col("probe_id"), col("vec_id").cast(LongType).as("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val spark = s
      import spark.implicits._
      val exactDf = exactPairs.toDF("probe_id", "vec_id")
      val probeIdsDf = probes.map(_._1).toDF("probe_id")
      // train each index ONCE across the methods that share it: the
      // seeded quantizer serves ivf + ivfpq, the PQ codebooks serve
      // pq + ivfpq — without the hoist the recall row (the suite's
      // heavy tail) paid the seed fetch and the 2-iter Lloyd chain twice
      import AnnParams._
      val seeded = Some(Similarity.ivfSeedIndex(emb, "vec_id", "embedding", IvfNlist))
      val trained = Some(Similarity.pqTrain(emb, "vec_id", "embedding", PqM, PqNcent, PqIters))
      // guide §2.6 (overlap independent jobs): each method's
      // CONSTRUCTION runs its own training collects (k-means rounds,
      // codebook fits) as sequential driver round-trips; the five
      // branches share no mutable state (seeded quantizer and PQ
      // codebooks are hoisted above), so building them from a small
      // thread pool lets one branch's jobs backfill another's driver
      // latency. Results are unchanged — each branch is deterministic
      // in its inputs, and the final union orders by method name.
      // retention floor (ADVICE r16 medium): the branches retain ~6
      // viaPersisted frames concurrently; with other session frames
      // already retained, the default LRU cap could evict a frame an
      // in-flight branch has not yet consumed — raise the threshold
      // for the concurrent section so no mid-build eviction can fire
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration.Duration
      val methods: Seq[(String, org.apache.spark.sql.DataFrame)] =
          graft.operators.Dedup.withRetentionFloor(16) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      val methodFs: Seq[(String, Future[org.apache.spark.sql.DataFrame])] = Seq(
        "ivf" -> Future(Similarity.ivfTopKBatch(emb, "vec_id", "embedding", probes, 10,
          nlist = IvfNlist, nprobe = IvfNprobe, seeded = seeded)),
        "ivf_kmeans" -> Future(Similarity.ivfTopKKMeansBatch(emb, "vec_id", "embedding",
          probes, 10, nlist = IvfNlist, nprobe = IvfNprobe, iters = KmIters)),
        "ivfpq" -> Future(Similarity.ivfPqTopKBatch(emb, "vec_id", "embedding", probes, 10,
          nlist = IvfNlist, nprobe = IvfNprobe, m = PqM, ncent = PqNcent,
          trainIters = PqIters, seeded = seeded, trained = trained)),
        "lsh" -> Future(Similarity.lshTopKBatch(emb, "vec_id", "embedding", probes, 10,
          nPlanes = LshPlanes)),
        "pq" -> Future(Similarity.pqTopKBatch(emb, "vec_id", "embedding", probes, 10,
          m = PqM, ncent = PqNcent, trainIters = PqIters, trained = trained)))
      // bounded await (ADVICE r16 medium): a wedged branch must fail
      // with a diagnostic naming the method, not hang the whole run on
      // a non-daemon pool. 30 min is ~2 orders over the sf0.1 cost and
      // generous at sf10; the bound exists for the pathological case.
      try methodFs.map { case (n, f) =>
        n -> (try Await.result(f, Duration(30, java.util.concurrent.TimeUnit.MINUTES))
          catch { case _: java.util.concurrent.TimeoutException =>
            throw new IllegalStateException(
              s"pl_emb_ann_recall: method '$n' construction exceeded 30 min") })
      }
      finally pool.shutdown()
      }
      methods.map { case (name, res) =>
        val hits = res
          .select(col("probe_id"), col("vec_id").cast(LongType).as("vec_id"))
          .join(exactDf, Seq("probe_id", "vec_id"))
          .groupBy("probe_id").agg(count(lit(1)).as("n_hits"))
        // LEFT join from the probe list: a probe with zero hits must
        // count as 0, not vanish from the mean
        probeIdsDf.join(hits, Seq("probe_id"), "left")
          .select(coalesce(col("n_hits"), lit(0L)).as("n_hits"))
          .agg(count(lit(1)).as("np"), sum("n_hits").as("tot"),
            min("n_hits").as("mn"))
          .select(lit(name).as("method"), col("np").cast(LongType).as("n_probes"),
            lit(10L).as("k"),
            round(col("tot") / (lit(10.0) * col("np")), 4).as("mean_recall"),
            round(col("mn") / lit(10.0), 4).as("min_recall"))
      }.reduce(_.unionAll(_)).orderBy("method")
    }
    // The k-means trajectory CTEs below repeat the pl_emb_ann_ivf_kmeans
    // oracle's chain (renamed kmm*/km* to avoid colliding with the PQ
    // chain's means1/means2) — both are 2-iteration unrolls gated by the
    // same hash check, so a drift turns one of the two rows red.
    val sql =
      lshBucketCtes + s""",
probes AS (
  SELECT vec_id AS probe_id, v AS pv FROM emb
  ORDER BY md5(CAST(vec_id AS VARCHAR) || 'probe'), vec_id LIMIT $nProbes
),
exact AS (
  SELECT probe_id, vec_id FROM (
    SELECT p.probe_id, e.vec_id,
      row_number() OVER (PARTITION BY p.probe_id
        ORDER BY round(list_cosine_similarity(p.pv, e.v), 4) DESC, e.vec_id) AS rn
    FROM probes p CROSS JOIN emb e) WHERE rn <= 10
),
lsh10 AS (
  SELECT probe_id, vec_id FROM (
    SELECT p.probe_id, e.vec_id,
      row_number() OVER (PARTITION BY p.probe_id
        ORDER BY round(list_cosine_similarity(p.pv, e.v), 4) DESC, e.vec_id) AS rn
    FROM probes p
    JOIN buckets pb ON pb.vec_id = p.probe_id
    JOIN buckets cb ON cb.bucket = pb.bucket
    JOIN emb e ON e.vec_id = cb.vec_id) WHERE rn <= 10
),
cent AS (
  SELECT vec_id AS cid, v AS c FROM emb
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.cid) AS rn
    FROM emb e CROSS JOIN cent c) WHERE rn = 1
),
pcells AS (
  SELECT probe_id, cid FROM (
    SELECT p.probe_id, c.cid,
      row_number() OVER (PARTITION BY p.probe_id
        ORDER BY list_cosine_similarity(c.c, p.pv) DESC, c.cid) AS rn
    FROM probes p CROSS JOIN cent c) WHERE rn <= 2
),
ivf10 AS (
  SELECT probe_id, vec_id FROM (
    SELECT pc.probe_id, a.vec_id,
      row_number() OVER (PARTITION BY pc.probe_id
        ORDER BY round(list_cosine_similarity(a.v, p.pv), 4) DESC, a.vec_id) AS rn
    FROM pcells pc
    JOIN probes p ON p.probe_id = pc.probe_id
    JOIN assign a ON a.cid = pc.cid) WHERE rn <= 10
),
dims AS (SELECT unnest(range(0, len(v))) AS i
         FROM (SELECT v FROM emb ORDER BY vec_id LIMIT 1)),
seed AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS idx, v
  FROM emb ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
),
seed_n AS (
  SELECT idx, v, sqrt(list_aggregate(list_transform(v, y -> y * y), 'sum')) AS nrm
  FROM seed
),
cent0 AS (SELECT idx, list_transform(v, x -> round(x / nrm, 6)) AS c FROM seed_n),
assign0 AS (
  SELECT vec_id, v, idx AS cell FROM (
    SELECT e.vec_id, e.v, c.idx,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.idx) AS rn
    FROM emb e CROSS JOIN cent0 c) WHERE rn = 1
),
kmm1 AS (
  SELECT cell, i AS pos, avg(x) AS m FROM (
    SELECT a.cell, d.i, a.v[d.i + 1] AS x FROM assign0 a CROSS JOIN dims d
  ) GROUP BY cell, i
),
c1raw AS (
  SELECT cell AS idx, list(m ORDER BY pos) AS mv FROM kmm1 GROUP BY cell
),
c1n AS (
  SELECT idx, mv, sqrt(list_aggregate(list_transform(mv, y -> y * y), 'sum')) AS nrm
  FROM c1raw
),
cent1 AS (
  SELECT c0.idx,
    COALESCE((SELECT list_transform(r.mv, x -> round(x / r.nrm, 6))
              FROM c1n r WHERE r.idx = c0.idx), c0.c) AS c
  FROM cent0 c0
),
assign1 AS (
  SELECT vec_id, v, idx AS cell FROM (
    SELECT e.vec_id, e.v, c.idx,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.idx) AS rn
    FROM emb e CROSS JOIN cent1 c) WHERE rn = 1
),
kmm2 AS (
  SELECT cell, i AS pos, avg(x) AS m FROM (
    SELECT a.cell, d.i, a.v[d.i + 1] AS x FROM assign1 a CROSS JOIN dims d
  ) GROUP BY cell, i
),
c2raw AS (
  SELECT cell AS idx, list(m ORDER BY pos) AS mv FROM kmm2 GROUP BY cell
),
c2n AS (
  SELECT idx, mv, sqrt(list_aggregate(list_transform(mv, y -> y * y), 'sum')) AS nrm
  FROM c2raw
),
cent2 AS (
  SELECT c1.idx,
    COALESCE((SELECT list_transform(r.mv, x -> round(x / r.nrm, 6))
              FROM c2n r WHERE r.idx = c1.idx), c1.c) AS c
  FROM cent1 c1
),
kpcells AS (
  SELECT probe_id, idx FROM (
    SELECT p.probe_id, c.idx,
      row_number() OVER (PARTITION BY p.probe_id
        ORDER BY list_cosine_similarity(c.c, p.pv) DESC, c.idx) AS rn
    FROM probes p CROSS JOIN cent2 c) WHERE rn <= 2
),
kassign AS (
  SELECT vec_id, v, idx AS cell FROM (
    SELECT e.vec_id, e.v, c.idx,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.idx) AS rn
    FROM emb e CROSS JOIN cent2 c) WHERE rn = 1
),
km10 AS (
  SELECT probe_id, vec_id FROM (
    SELECT kp.probe_id, a.vec_id,
      row_number() OVER (PARTITION BY kp.probe_id
        ORDER BY round(list_cosine_similarity(a.v, p.pv), 4) DESC, a.vec_id) AS rn
    FROM kpcells kp
    JOIN probes p ON p.probe_id = kp.probe_id
    JOIN kassign a ON a.cell = kp.idx) WHERE rn <= 10
),""" + pqTrainCtes("(SELECT v FROM emb ORDER BY vec_id LIMIT 1)") + s""",
pn AS (SELECT probe_id, pv,
  sqrt(list_aggregate(list_transform(pv, y -> y * y), 'sum')) AS nrm FROM probes),
pun AS (SELECT probe_id, list_transform(pv, x -> x / nrm) AS u FROM pn),
dtabm AS (
  SELECT pu.probe_id, b.s, b.c, list_aggregate(list_transform(range(1, p.sub + 1),
    j -> (pu.u[b.s * p.sub + j] - b.bl[j]) * (pu.u[b.s * p.sub + j] - b.bl[j])), 'sum') AS dist
  FROM books2 b CROSS JOIN par p CROSS JOIN pun pu
),
approxm AS (
  SELECT probe_id, vec_id, round(list_aggregate(list(dist ORDER BY s), 'sum'), 9) AS a FROM (
    SELECT d.probe_id, e.vec_id, e.s, d.dist
    FROM encf e JOIN dtabm d ON d.s = e.s AND d.c = e.code
  ) GROUP BY probe_id, vec_id
),
shortm AS (
  SELECT probe_id, vec_id FROM (
    SELECT probe_id, vec_id,
      row_number() OVER (PARTITION BY probe_id ORDER BY a, vec_id) AS rn
    FROM approxm) WHERE rn <= 80
),
pq10 AS (
  SELECT probe_id, vec_id FROM (
    SELECT sh.probe_id, sh.vec_id,
      row_number() OVER (PARTITION BY sh.probe_id
        ORDER BY round(list_cosine_similarity(e.v, p.pv), 4) DESC, sh.vec_id) AS rn
    FROM shortm sh
    JOIN emb e ON e.vec_id = sh.vec_id
    JOIN probes p ON p.probe_id = sh.probe_id) WHERE rn <= 10
),
ipshort AS (
  SELECT probe_id, vec_id FROM (
    SELECT am.probe_id, am.vec_id,
      row_number() OVER (PARTITION BY am.probe_id ORDER BY am.a, am.vec_id) AS rn
    FROM approxm am
    JOIN assign a2 ON a2.vec_id = am.vec_id
    JOIN pcells pc ON pc.probe_id = am.probe_id AND pc.cid = a2.cid
  ) WHERE rn <= 80
),
ivfpq10 AS (
  SELECT probe_id, vec_id FROM (
    SELECT sh.probe_id, sh.vec_id,
      row_number() OVER (PARTITION BY sh.probe_id
        ORDER BY round(list_cosine_similarity(e.v, p.pv), 4) DESC, sh.vec_id) AS rn
    FROM ipshort sh
    JOIN emb e ON e.vec_id = sh.vec_id
    JOIN probes p ON p.probe_id = sh.probe_id) WHERE rn <= 10
),
r_lsh AS (
  SELECT p.probe_id, count(h.vec_id) AS n_hits FROM probes p
  LEFT JOIN (SELECT t.probe_id, t.vec_id FROM lsh10 t
             JOIN exact x ON x.probe_id = t.probe_id AND x.vec_id = t.vec_id) h
    ON h.probe_id = p.probe_id
  GROUP BY p.probe_id
),
r_ivf AS (
  SELECT p.probe_id, count(h.vec_id) AS n_hits FROM probes p
  LEFT JOIN (SELECT t.probe_id, t.vec_id FROM ivf10 t
             JOIN exact x ON x.probe_id = t.probe_id AND x.vec_id = t.vec_id) h
    ON h.probe_id = p.probe_id
  GROUP BY p.probe_id
),
r_km AS (
  SELECT p.probe_id, count(h.vec_id) AS n_hits FROM probes p
  LEFT JOIN (SELECT t.probe_id, t.vec_id FROM km10 t
             JOIN exact x ON x.probe_id = t.probe_id AND x.vec_id = t.vec_id) h
    ON h.probe_id = p.probe_id
  GROUP BY p.probe_id
),
r_pq AS (
  SELECT p.probe_id, count(h.vec_id) AS n_hits FROM probes p
  LEFT JOIN (SELECT t.probe_id, t.vec_id FROM pq10 t
             JOIN exact x ON x.probe_id = t.probe_id AND x.vec_id = t.vec_id) h
    ON h.probe_id = p.probe_id
  GROUP BY p.probe_id
),
r_ivfpq AS (
  SELECT p.probe_id, count(h.vec_id) AS n_hits FROM probes p
  LEFT JOIN (SELECT t.probe_id, t.vec_id FROM ivfpq10 t
             JOIN exact x ON x.probe_id = t.probe_id AND x.vec_id = t.vec_id) h
    ON h.probe_id = p.probe_id
  GROUP BY p.probe_id
)
SELECT method, n_probes, k, mean_recall, min_recall FROM (
  SELECT 'lsh' AS method, count(*) AS n_probes, CAST(10 AS BIGINT) AS k,
    round(sum(n_hits) / (CAST(10.0 AS DOUBLE) * count(*)), 4) AS mean_recall,
    round(min(n_hits) / CAST(10.0 AS DOUBLE), 4) AS min_recall FROM r_lsh
  UNION ALL
  SELECT 'ivf', count(*), CAST(10 AS BIGINT),
    round(sum(n_hits) / (CAST(10.0 AS DOUBLE) * count(*)), 4),
    round(min(n_hits) / CAST(10.0 AS DOUBLE), 4) FROM r_ivf
  UNION ALL
  SELECT 'ivf_kmeans', count(*), CAST(10 AS BIGINT),
    round(sum(n_hits) / (CAST(10.0 AS DOUBLE) * count(*)), 4),
    round(min(n_hits) / CAST(10.0 AS DOUBLE), 4) FROM r_km
  UNION ALL
  SELECT 'pq', count(*), CAST(10 AS BIGINT),
    round(sum(n_hits) / (CAST(10.0 AS DOUBLE) * count(*)), 4),
    round(min(n_hits) / CAST(10.0 AS DOUBLE), 4) FROM r_pq
  UNION ALL
  SELECT 'ivfpq', count(*), CAST(10 AS BIGINT),
    round(sum(n_hits) / (CAST(10.0 AS DOUBLE) * count(*)), 4),
    round(min(n_hits) / CAST(10.0 AS DOUBLE), 4) FROM r_ivfpq
) ORDER BY method"""
    "pl_emb_ann_recall" -> Q(fn, Some(sql))
  }

  val all: Map[String, Q] = base + annRecallEntry


  /** Shared DuckDB replay of the α=0.5 / 100k-token mixture plan over
    * `documents`, ending at `sh(source, n_docs, avail_tokens, share)` —
    * used by pl_mixture_plan and pl_mixture_realize so the realization
    * expands EXACTLY the rates the plan row publishes. */
  private lazy val mixturePlanCtes: String =
    """WITH per AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS avail_tokens
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT sum(pow(CAST(avail_tokens AS DOUBLE), 0.5)) AS t FROM per
      |), sh AS (
      |  SELECT source, n_docs, avail_tokens,
      |    round(pow(CAST(avail_tokens AS DOUBLE), 0.5) / t, 6) AS share
      |  FROM per, tot
      |)""".stripMargin

  /** Shared DuckDB replay of the bigram-LM fit over `documents`
    * (P(b|a) = c(a,b)/c_ctx(a), top-64k table, unseen floored at
    * ln(1/total)), ending at `bscored(doc_id, m, n_bigrams)` — used by
    * pl_text_bigram_ppl and pl_text_ppl_buckets so the bucket
    * thresholds are computed over EXACTLY the perplexities the scorer
    * row publishes. */
  private lazy val bigramPplCtes: String =
    """WITH btk AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents
      |), bpr AS (
      |  SELECT doc_id, a, b FROM (
      |    SELECT doc_id, ts[i] AS a, ts[i + 1] AS b FROM (
      |      SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM btk))
      |  WHERE a != '' AND b != ''
      |), bc AS (SELECT a, b, count(*) AS n FROM bpr GROUP BY a, b),
      |ctx AS (SELECT a, sum(n) AS nc FROM bc GROUP BY a),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM bc),
      |bi AS (
      |  SELECT t.a, t.b, ln(CAST(t.n AS DOUBLE) / ctx.nc) AS logp
      |  FROM (SELECT a, b, n FROM bc ORDER BY n DESC, a, b LIMIT 65536) t
      |  JOIN ctx USING (a)
      |), bscored AS (
      |  SELECT p.doc_id,
      |    avg(coalesce(bi.logp, ln(1.0 / (SELECT total FROM tot)))) AS m,
      |    count(*) AS n_bigrams
      |  FROM bpr p LEFT JOIN bi ON p.a = bi.a AND p.b = bi.b
      |  GROUP BY p.doc_id
      |)""".stripMargin

  /** Shared DuckDB replay of the 2-iteration spherical k-means
    * trajectory over `embeddings` (the same chain as the
    * pl_emb_ann_ivf_kmeans oracle, without its probe/query CTEs),
    * ending at `assign2(vec_id, v, cell)` — used by pl_emb_semdedup
    * and pl_cluster_profile so the two rows can never drift apart. */
  private lazy val kmTrajCtes: String =
    s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |dims AS (SELECT unnest(range(0, len(v))) AS i FROM (SELECT v FROM emb WHERE vec_id = 0)),
       |seed AS (
       |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS idx, v
       |  FROM emb ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT ${AnnParams.IvfNlist}
       |),
       |seed_n AS (
       |  SELECT idx, v, sqrt(list_aggregate(list_transform(v, y -> y * y), 'sum')) AS nrm
       |  FROM seed
       |),
       |cent0 AS (SELECT idx, list_transform(v, x -> round(x / nrm, 6)) AS c FROM seed_n),
       |assign0 AS (
       |  SELECT vec_id, v, idx AS cell FROM (
       |    SELECT e.vec_id, e.v, c.idx,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.idx) AS rn
       |    FROM emb e CROSS JOIN cent0 c) WHERE rn = 1
       |),
       |sd_means1 AS (
       |  SELECT cell, i AS pos, avg(x) AS m FROM (
       |    SELECT a.cell, d.i, a.v[d.i + 1] AS x FROM assign0 a CROSS JOIN dims d
       |  ) GROUP BY cell, i
       |),
       |c1raw AS (
       |  SELECT cell AS idx, list(m ORDER BY pos) AS mv FROM sd_means1 GROUP BY cell
       |),
       |c1n AS (
       |  SELECT idx, mv, sqrt(list_aggregate(list_transform(mv, y -> y * y), 'sum')) AS nrm
       |  FROM c1raw
       |),
       |cent1 AS (
       |  SELECT c0.idx,
       |    COALESCE((SELECT list_transform(r.mv, x -> round(x / r.nrm, 6))
       |              FROM c1n r WHERE r.idx = c0.idx), c0.c) AS c
       |  FROM cent0 c0
       |),
       |assign1 AS (
       |  SELECT vec_id, v, idx AS cell FROM (
       |    SELECT e.vec_id, e.v, c.idx,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.idx) AS rn
       |    FROM emb e CROSS JOIN cent1 c) WHERE rn = 1
       |),
       |sd_means2 AS (
       |  SELECT cell, i AS pos, avg(x) AS m FROM (
       |    SELECT a.cell, d.i, a.v[d.i + 1] AS x FROM assign1 a CROSS JOIN dims d
       |  ) GROUP BY cell, i
       |),
       |c2raw AS (
       |  SELECT cell AS idx, list(m ORDER BY pos) AS mv FROM sd_means2 GROUP BY cell
       |),
       |c2n AS (
       |  SELECT idx, mv, sqrt(list_aggregate(list_transform(mv, y -> y * y), 'sum')) AS nrm
       |  FROM c2raw
       |),
       |cent2 AS (
       |  SELECT c1.idx,
       |    COALESCE((SELECT list_transform(r.mv, x -> round(x / r.nrm, 6))
       |              FROM c2n r WHERE r.idx = c1.idx), c1.c) AS c
       |  FROM cent1 c1
       |),
       |assign2 AS (
       |  SELECT vec_id, v, idx AS cell FROM (
       |    SELECT e.vec_id, e.v, c.idx,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.idx) AS rn
       |    FROM emb e CROSS JOIN cent2 c) WHERE rn = 1
       |)""".stripMargin

  /** Shared DuckDB replay of [[graft.operators.TextAnalysis
    * .hashedEmbedding]] over `documents` (md5 token buckets -> ±1 md5
    * sign projection; tf normalization cancels under L2, so component
    * numerators are INTEGER-exact), ending at `ecomp(doc_id, d, sv)` +
    * `enrm(doc_id, nrm)` — used by pl_text_embed,
    * pl_text_semantic_topk, and pl_decontaminate_semantic so the
    * embedding chain can never drift between rows. */
  private lazy val hashedEmbedCtes: String =
    """WITH etk AS (
      |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents
      |), ecnt AS (
      |  SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT % 64 AS b,
      |    count(*) AS c
      |  FROM etk WHERE t != '' GROUP BY doc_id, b
      |), sgn AS (
      |  SELECT b, d,
      |    CASE WHEN ('0x' || substr(md5(b::VARCHAR || ':' || d::VARCHAR), 1, 1))::BIGINT < 8
      |         THEN 1::BIGINT ELSE -1::BIGINT END AS sign
      |  FROM (SELECT unnest(range(0, 64)) AS b), (SELECT unnest(range(0, 16)) AS d)
      |), ecomp AS (
      |  SELECT t.doc_id, s.d, sum(t.c * s.sign)::BIGINT AS sv
      |  FROM ecnt t JOIN sgn s USING (b) GROUP BY t.doc_id, s.d
      |), enrm AS (
      |  SELECT doc_id, sqrt(sum(sv * sv)::DOUBLE) AS nrm FROM ecomp GROUP BY doc_id
      |)""".stripMargin

  /** DuckDB replay of [[graft.operators.Tokenizer]]'s BPE fit: the
    * word-type table once (btoks/bwt/bseqs_0), then `rounds` unrolled
    * (pair-count -> top-1 by count desc, pair asc -> boundary-safe
    * literal replace) CTE blocks ending at bseqs_`rounds`. Symbol
    * sequences use the same two-space separator / one-space sentinel
    * encoding as the engine, so DuckDB's left-to-right non-overlapping
    * `replace` replays the merge exactly. */
  private def bpeCtes(rounds: Int): String = {
    val sb = new StringBuilder(
      """WITH btoks AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents
        |), bwt AS (
        |  SELECT w, count(*) AS n FROM btoks WHERE w != '' GROUP BY w
        |), bseqs_0 AS (
        |  SELECT w, n, ' ' || array_to_string(
        |    list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)), '  ') || ' ' AS seq
        |  FROM bwt
        |)""".stripMargin)
    for (r <- 1 to rounds) sb ++= s""",
bpairs_$r AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS p, sum(n) AS cnt FROM (
    SELECT string_split(trim(seq), '  ') AS ws, n,
           unnest(range(1, len(string_split(trim(seq), '  ')))) AS i
    FROM bseqs_${r - 1})
  GROUP BY p
),
btop_$r AS (SELECT p, cnt FROM bpairs_$r ORDER BY cnt DESC, p LIMIT 1),
bseqs_$r AS (
  SELECT w, n, replace(seq,
    ' ' || string_split(p, ' ')[1] || '  ' || string_split(p, ' ')[2] || ' ',
    ' ' || replace(p, ' ', '') || ' ') AS seq
  FROM bseqs_${r - 1}, btop_$r
)"""
    sb.toString
  }

  private def bpeMergesSelect(rounds: Int): String =
    (1 to rounds).map(r =>
      s"SELECT $r::BIGINT AS merge_rank, string_split(p, ' ')[1] AS left_sym," +
      s" string_split(p, ' ')[2] AS right_sym, replace(p, ' ', '') AS merged," +
      s" cnt::BIGINT AS pair_count FROM btop_$r")
      .mkString("\nSELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY merge_rank")

  private def bpeEncodeSelect(rounds: Int): String =
    s"""
SELECT t.doc_id,
  sum(len(string_split(trim(f.seq), '  ')))::BIGINT AS n_tokens,
  sum(len(f.w))::BIGINT AS n_chars,
  round(sum(len(f.w))::DOUBLE / sum(len(string_split(trim(f.seq), '  '))), 4)
    AS chars_per_token
FROM btoks t JOIN bseqs_$rounds f ON t.w = f.w
GROUP BY t.doc_id ORDER BY t.doc_id"""

  /** Shared DuckDB replay of the per-subspace PQ Lloyd trajectory
    * (seeds → books0 → two argmin-encode/rounded-means iterations →
    * ADC table → s-ordered shortlist sum → rescore). `prefix` supplies
    * the `emb(vec_id, v)` and `q(v)` CTEs — the full corpus for
    * pl_emb_ann_pq, the probed IVF slice for pl_emb_ann_ivfpq — so the
    * chain can never drift between the two oracles. */
  private def pqLloydOracle(prefix: String): String =
    prefix + pqTrainCtes("q") + """,
qn AS (SELECT v, sqrt(list_aggregate(list_transform(v, y -> y * y), 'sum')) AS nrm FROM q),
qu AS (SELECT list_transform(v, x -> x / nrm) AS u FROM qn),
dtab AS (
  SELECT b.s, b.c, list_aggregate(list_transform(range(1, p.sub + 1),
    j -> (qu.u[b.s * p.sub + j] - b.bl[j]) * (qu.u[b.s * p.sub + j] - b.bl[j])), 'sum') AS dist
  FROM books2 b CROSS JOIN par p CROSS JOIN qu
),
approx AS (
  SELECT vec_id, list_aggregate(list(dist ORDER BY s), 'sum') AS a FROM (
    SELECT e.vec_id, e.s, d.dist FROM encf e JOIN dtab d ON d.s = e.s AND d.c = e.code
  ) GROUP BY vec_id
),
short AS (SELECT vec_id FROM approx ORDER BY a, vec_id LIMIT 80)
SELECT sh.vec_id, round(list_cosine_similarity(e.v, q.v), 4) AS cos
FROM short sh JOIN emb e ON e.vec_id = sh.vec_id, q
ORDER BY cos DESC, sh.vec_id LIMIT 10"""

  /** The probe-INDEPENDENT half of the PQ replay: unit vectors, md5
    * seeds, two Lloyd iterations, final codebooks (`books2`) and the
    * corpus encode (`encf`). `parSrc` names the one-row relation whose
    * `v` fixes the dimensionality — `q` for the single-probe oracles,
    * a deterministic corpus row for the multi-probe recall oracle
    * (which has no single `q`). One definition so the trajectories
    * cannot drift between the three oracles that replay them. */
  private def pqTrainCtes(parSrc: String): String =
    s"""
par AS (SELECT len(v) // 8 AS sub FROM $parSrc),
nr AS (SELECT vec_id, v, sqrt(list_aggregate(list_transform(v, y -> y * y), 'sum')) AS nrm FROM emb),
un AS (SELECT vec_id, v, list_transform(v, x -> x / nrm) AS u FROM nr),
seeds AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS sc, u
  FROM un ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
),
nseeds AS (SELECT count(*) AS n FROM seeds),
sgrid AS (SELECT unnest(range(0, 8)) AS s),
cgrid AS (SELECT unnest(range(0, 16)) AS c),
books0 AS (
  SELECT g.s, g2.c, se.u[g.s * p.sub + 1 : g.s * p.sub + p.sub] AS bl
  FROM sgrid g CROSS JOIN cgrid g2 CROSS JOIN par p CROSS JOIN nseeds ns
  JOIN seeds se ON se.sc = g2.c % ns.n
),
enc0 AS (
  SELECT vec_id, s, c AS code FROM (
    SELECT r.vec_id, b.s, b.c,
      row_number() OVER (PARTITION BY r.vec_id, b.s ORDER BY
        list_aggregate(list_transform(range(1, p.sub + 1),
          j -> (r.u[b.s * p.sub + j] - b.bl[j]) * (r.u[b.s * p.sub + j] - b.bl[j])), 'sum') ASC,
        b.c) AS rn
    FROM un r CROSS JOIN books0 b CROSS JOIN par p) WHERE rn = 1
),
jgrid AS (SELECT unnest(range(0, (SELECT sub FROM par))) AS j),
means1 AS (
  SELECT e.s, e.code AS c, jg.j, avg(r.u[e.s * p.sub + jg.j + 1]) AS mu
  FROM enc0 e JOIN un r ON r.vec_id = e.vec_id
  CROSS JOIN jgrid jg CROSS JOIN par p
  GROUP BY e.s, e.code, jg.j
),
books1 AS (
  SELECT b.s, b.c,
    COALESCE((SELECT list(round(m.mu, 6) ORDER BY m.j) FROM means1 m
              WHERE m.s = b.s AND m.c = b.c), b.bl) AS bl
  FROM books0 b
),
enc1 AS (
  SELECT vec_id, s, c AS code FROM (
    SELECT r.vec_id, b.s, b.c,
      row_number() OVER (PARTITION BY r.vec_id, b.s ORDER BY
        list_aggregate(list_transform(range(1, p.sub + 1),
          j -> (r.u[b.s * p.sub + j] - b.bl[j]) * (r.u[b.s * p.sub + j] - b.bl[j])), 'sum') ASC,
        b.c) AS rn
    FROM un r CROSS JOIN books1 b CROSS JOIN par p) WHERE rn = 1
),
means2 AS (
  SELECT e.s, e.code AS c, jg.j, avg(r.u[e.s * p.sub + jg.j + 1]) AS mu
  FROM enc1 e JOIN un r ON r.vec_id = e.vec_id
  CROSS JOIN jgrid jg CROSS JOIN par p
  GROUP BY e.s, e.code, jg.j
),
books2 AS (
  SELECT b.s, b.c,
    COALESCE((SELECT list(round(m.mu, 6) ORDER BY m.j) FROM means2 m
              WHERE m.s = b.s AND m.c = b.c), b.bl) AS bl
  FROM books1 b
),
encf AS (
  SELECT vec_id, s, c AS code FROM (
    SELECT r.vec_id, b.s, b.c,
      row_number() OVER (PARTITION BY r.vec_id, b.s ORDER BY
        list_aggregate(list_transform(range(1, p.sub + 1),
          j -> (r.u[b.s * p.sub + j] - b.bl[j]) * (r.u[b.s * p.sub + j] - b.bl[j])), 'sum') ASC,
        b.c) AS rn
    FROM un r CROSS JOIN books2 b CROSS JOIN par p) WHERE rn = 1
)"""

  // NOTE: must be a def — `all` above references it during object init.
  private def jaccardOracle =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, greatest(len(string_split(trim(text), ' ')) - 1, 2)),
      |    i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' '))) AS s
      |  FROM documents
      |), inv AS (
      |  SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh
      |)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  round(count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)), 4) AS jaccard
      |FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      |GROUP BY a.doc_id, b.doc_id
      |HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin
}
