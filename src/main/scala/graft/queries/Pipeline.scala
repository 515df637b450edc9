package graft.queries

import graft.{GateQuery, Tables}
import graft.functions.TextFunctions
import graft.operators.{Classify, Clustering, Components, CorpusStats, Curate, Decontaminate, Dedup, Itemsets, Layout, Linalg, MergeUpsert, Packing, Pq, Prep, Relevance, Sampling, ShardExport, Similarity, Tokenize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline queries (SURVEY.md §2.D) with DuckDB
  * oracles. The oracle SQL re-expresses the identical algorithm in
  * portable SQL (same md5 hash family, same fold order for doubles).
  */
object Pipeline {

  /** Shared oracle CTE: distinct n-word shingles per document. */
  private def shingleCte(n: Int, src: String = "documents"): String = {
    val concat = (1 to n).map(k => s"ws[i+${k - 1}]").mkString(" || ' ' || ")
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM $src),
       |idx AS (SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws)-${n - 1}, 0))) AS i FROM w),
       |sh AS (SELECT DISTINCT doc_id, $concat AS shingle FROM idx),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)""".stripMargin
  }

  /** Mirror of jaccardPairs' exact semantics INCLUDING the posting-
    * list cap: candidates come from the df-capped inverted index
    * (shingles in more than `cap` docs carry no Jaccard signal and
    * would make the self-join quadratic), but n_inter/jaccard are
    * computed over the FULL shingle sets of surviving candidates — so
    * oracle and operator agree on any corpus, boilerplate-heavy ones
    * included.
    */
  private def jaccardInterCte(cap: Int = 1000): String = {
    // cap <= 0: the UNCAPPED candidate set (pairs sharing any
    // shingle) — the right oracle blocking for the LOSSLESS r13
    // operators, where any superset defines the same thresholded
    // result; cap > 0 replays the legacy df-capped contract the
    // calibration audit still pins.
    val candSql =
      if (cap <= 0)
        """cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
          |         FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),""".stripMargin
      else
        s"""rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= $cap),
           |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           |         FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           |         WHERE a.shingle IN (SELECT shingle FROM rare)),""".stripMargin
    s"""$candSql
       |inter AS (
       |  SELECT c.d1, c.d2, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.d1
       |  JOIN sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** D1 — exact dedup by content hash. */
  val qDedupExact: GateQuery = GateQuery(
    "q_dedup_exact",
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS survivor_id,
      |  COUNT(*) AS n_copies, MIN(len(text)) AS doc_len
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY content_hash""".stripMargin) { (s, dir) =>
    Dedup.exact(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("content_hash")
  }

  /** D1 apply-step — the surviving corpus after exact dedup. */
  val qDedupSurvivors: GateQuery = GateQuery(
    "q_dedup_survivors",
    """SELECT doc_id, lang, n_chars
      |FROM documents d
      |WHERE doc_id = (SELECT MIN(doc_id) FROM documents d2 WHERE md5(d2.text) = md5(d.text))
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Dedup.dropExactDuplicates(Tables(s, dir, "documents"), "doc_id", "text")
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  /** D4 — exact 3-gram Jaccard near-dup pairs (threshold 0.6),
    * LOSSLESS since r13: jaccardPairs routes through the D68
    * prefix+positional machinery, so the oracle's candidate CTE is
    * the simple UNCAPPED share-a-shingle superset (any superset
    * blocking defines the same thresholded result) — and pairs whose
    * only shared shingles are corpus-hot are now found.
    */
  val qDedupJaccard: GateQuery = GateQuery(
    "q_dedup_jaccard",
    s"""WITH ${shingleCte(3)},
       |${jaccardInterCte(0)}
       |SELECT d1, d2, n_inter,
       |  CAST(n_inter AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_inter AS DOUBLE) AS jaccard
       |FROM inter
       |JOIN sizes s1 ON s1.doc_id = d1
       |JOIN sizes s2 ON s2.doc_id = d2
       |WHERE CAST(n_inter AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_inter AS DOUBLE) >= 0.6
       |ORDER BY d1, d2""".stripMargin,
    bench = false, slow = true) { (s, dir) =>
    Dedup.jaccardPairs(Tables(s, dir, "documents"), "doc_id", "text", 3, 0.6)
      .orderBy("d1", "d2")
  }

  /** D4b — LOSSLESS prefix-filtered all-pairs Jaccard (SSJoin/PPJoin
    * family): rarest-first shingle order, prefix length
    * |S| − ceil(0.6·|S|) + 1, integer size filter 5·min ≥ 3·max, exact
    * verification. Same output contract as q_dedup_jaccard but with
    * recall guaranteed — a pair sharing ONLY boilerplate shingles
    * survives here and is lost to the df-cap there. Both CTEs use
    * pure integer arithmetic for prefix length and the threshold
    * test, so the engines agree exactly.
    */
  val qDedupPrefix: GateQuery = GateQuery(
    "q_dedup_prefix",
    s"""WITH ${shingleCte(3)},
       |dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1),
       |ranked AS (
       |  SELECT s.doc_id, s.shingle, z.n_sh,
       |    row_number() OVER (PARTITION BY s.doc_id ORDER BY d.df, s.shingle) AS rn
       |  FROM sh s
       |  JOIN dfreq d ON d.shingle = s.shingle
       |  JOIN sizes z ON z.doc_id = s.doc_id),
       |pref AS (SELECT doc_id, shingle, n_sh FROM ranked
       |  WHERE rn <= n_sh - CAST((n_sh * 3 + 4) // 5 AS BIGINT) + 1),
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM pref a JOIN pref b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  WHERE least(a.n_sh, b.n_sh) * 5 >= greatest(a.n_sh, b.n_sh) * 3),
       |inter AS (SELECT c.d1, c.d2, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.d1
       |  JOIN sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
       |  GROUP BY 1, 2)
       |SELECT d1, d2, n_inter,
       |  CAST(n_inter AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_inter AS DOUBLE) AS jaccard
       |FROM inter
       |JOIN sizes s1 ON s1.doc_id = d1
       |JOIN sizes s2 ON s2.doc_id = d2
       |WHERE n_inter * 5 >= (s1.n_sh + s2.n_sh - n_inter) * 3
       |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    Dedup.prefixFilteredPairs(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, tNum = 3, tDen = 5)
      .orderBy("d1", "d2")
  }

  /** D61 — asymmetric containment near-dup (doc-inside-doc), LOSSLESS
    * since round 13: the blocking is the D68 prefix+positional
    * machinery in asymmetric form (prefix on the smaller side, FULL
    * index on the other — see containmentPairs' proof sketch), so
    * every pair with containment ≥ 60% is found; the old df-capped
    * blocking lost pairs sharing only hot shingles. Because the
    * filter chain is lossless for the containment predicate, the
    * oracle's candidate CTE needs NO filter replay — any superset
    * blocking defines the same result, and "pairs sharing ≥ 1
    * shingle" (containment > 0 requires one) is the simplest.
    */
  val qDedupContainment: GateQuery = GateQuery(
    "q_dedup_containment",
    s"""WITH ${shingleCte(3)},
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |         FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
       |inter AS (
       |  SELECT c.d1, c.d2, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.d1
       |  JOIN sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
       |  GROUP BY c.d1, c.d2)
       |SELECT d1, d2, CAST(n_inter AS BIGINT) AS n_inter,
       |  CAST(least(s1.n_sh, s2.n_sh) AS BIGINT) AS n_small,
       |  CAST((n_inter * 100) // least(s1.n_sh, s2.n_sh) AS BIGINT) AS cont_pct
       |FROM inter
       |JOIN sizes s1 ON s1.doc_id = d1
       |JOIN sizes s2 ON s2.doc_id = d2
       |WHERE n_inter * 100 >= least(s1.n_sh, s2.n_sh) * 60
       |ORDER BY d1, d2""".stripMargin,
    bench = false, slow = true) { (s, dir) =>
    Dedup.containmentPairs(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, thresholdPct = 60)
      .withColumn("n_inter", col("n_inter").cast("long"))
      .orderBy("d1", "d2")
  }

  /** D62 — edit-distance near-dup: Levenshtein ≤ 20% of the longer
    * doc, the character-level last-mile verifier (shingle metrics
    * blur small in-place edits). Round 13: candidates come from the
    * D68 prefix+positional block at Jaccard 3/5 instead of the
    * df-capped index — the cap proposed 1.13M pairs at sf0.1 of
    * which 256 passed, all with measured shingle Jaccard ≥ 0.78, so
    * the 3/5 block keeps every passing pair at a fraction of the
    * O(len·k) verify volume (31 s → ~8 s). The blocking threshold is
    * part of D62's candidate contract, so the oracle replays the
    * prefix selection, the size filter, AND the positional bound
    * exactly (they are lossless for Jaccard ≥ 3/5, not for the
    * levenshtein predicate, so unlike q_dedup_prefix they must be
    * replayed).
    */
  val qDedupEditdist: GateQuery = GateQuery(
    "q_dedup_editdist",
    s"""WITH ${shingleCte(3)},
       |dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1),
       |ranked AS (
       |  SELECT s.doc_id, s.shingle, z.n_sh,
       |    row_number() OVER (PARTITION BY s.doc_id ORDER BY d.df, s.shingle) AS rn
       |  FROM sh s
       |  JOIN dfreq d ON d.shingle = s.shingle
       |  JOIN sizes z ON z.doc_id = s.doc_id),
       |pref AS (SELECT doc_id, shingle, n_sh, rn FROM ranked
       |  WHERE rn <= n_sh - CAST((n_sh * 3 + 4) // 5 AS BIGINT) + 1),
       |cand0 AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
       |    MIN(a.rn) AS i, MIN(b.rn) AS j, MIN(a.n_sh) AS n1, MIN(b.n_sh) AS n2
       |  FROM pref a JOIN pref b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  WHERE least(a.n_sh, b.n_sh) * 5 >= greatest(a.n_sh, b.n_sh) * 3
       |  GROUP BY 1, 2),
       |cand AS (SELECT d1, d2 FROM cand0
       |  WHERE (1 + least(n1 - i, n2 - j)) * 8 >= (n1 + n2) * 3)
       |SELECT c.d1, c.d2,
       |  CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist,
       |  CAST(greatest(len(ta.text), len(tb.text)) AS BIGINT) AS max_len
       |FROM cand c
       |JOIN documents ta ON ta.doc_id = c.d1
       |JOIN documents tb ON tb.doc_id = c.d2
       |WHERE levenshtein(ta.text, tb.text) * 100 <= greatest(len(ta.text), len(tb.text)) * 20
       |ORDER BY d1, d2""".stripMargin,
    bench = false, slow = true) { (s, dir) =>
    Dedup.editDistancePairs(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, maxDistPct = 20)
      .orderBy("d1", "d2")
  }

  /** D2 — MinHash(12)+LSH(4 bands × 3) near-dup pairs, verified. */
  val qDedupMinhash: GateQuery = GateQuery(
    "q_dedup_minhash",
    s"""WITH ${shingleCte(3)},
       |seeds AS (SELECT unnest(generate_series(0, 11)) AS i),
       |-- Kirsch-Mitzenmacher: h_i = (h1 + i*h2) mod 2^48 from the two
       |-- 48-bit halves of ONE md5 per shingle (mirrors Dedup.minhashLsh)
       |hs AS (SELECT doc_id,
       |         ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h1,
       |         ('0x' || substr(md5(shingle), 17, 12))::BIGINT AS h2
       |       FROM sh),
       |mh AS (SELECT doc_id, i, MIN((h1 + i * h2) % 281474976710656) AS h
       |       FROM hs CROSS JOIN seeds GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, i // 3 AS band,
       |            md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY i)) AS band_sig
       |          FROM mh GROUP BY doc_id, i // 3),
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
       |inter AS (
       |  SELECT c.d1, c.d2, COUNT(*) AS n_inter
       |  FROM cand c JOIN sh x ON x.doc_id = c.d1 JOIN sh y
       |    ON y.doc_id = c.d2 AND y.shingle = x.shingle
       |  GROUP BY c.d1, c.d2)
       |SELECT i.d1, i.d2,
       |  CAST(n_inter AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_inter AS DOUBLE) AS jaccard
       |FROM inter i
       |JOIN sizes s1 ON s1.doc_id = i.d1
       |JOIN sizes s2 ON s2.doc_id = i.d2
       |WHERE CAST(n_inter AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_inter AS DOUBLE) >= 0.6
       |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    Dedup.minhashLsh(Tables(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, numHashes = 12, numBands = 4, threshold = 0.6)
      .orderBy("d1", "d2")
  }

  /** D108 — signature-estimate error audit: per banding candidate
    * pair, matching-component count, the minhash Jaccard estimate,
    * the exact Jaccard, and the signed error (all integer ppm). The
    * oracle replays the full KM signature pipeline for BOTH docs, the
    * component-equality count, the exact intersection, and both ppm
    * floors.
    */
  val qSigEstimate: GateQuery = GateQuery(
    "q_sig_estimate",
    s"""WITH ${shingleCte(3)},
       |seeds AS (SELECT unnest(generate_series(0, 11)) AS i),
       |hs AS (SELECT doc_id,
       |         ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h1,
       |         ('0x' || substr(md5(shingle), 17, 12))::BIGINT AS h2
       |       FROM sh),
       |mh AS (SELECT doc_id, i, MIN((h1 + i * h2) % 281474976710656) AS h
       |       FROM hs CROSS JOIN seeds GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, CAST(i // 3 AS BIGINT) AS band,
       |            md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY i)) AS band_sig
       |          FROM mh GROUP BY doc_id, band),
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
       |m AS (
       |  SELECT c.d1, c.d2,
       |    CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT) AS n_match
       |  FROM cand c
       |  JOIN mh a ON a.doc_id = c.d1
       |  JOIN mh b ON b.doc_id = c.d2 AND b.i = a.i
       |  GROUP BY c.d1, c.d2),
       |inter AS (
       |  SELECT c.d1, c.d2, COUNT(*) AS n_inter
       |  FROM cand c JOIN sh x ON x.doc_id = c.d1 JOIN sh y
       |    ON y.doc_id = c.d2 AND y.shingle = x.shingle
       |  GROUP BY c.d1, c.d2)
       |SELECT m.d1, m.d2, m.n_match,
       |  CAST(m.n_match * 1000000 // 12 AS BIGINT) AS est_ppm,
       |  CAST(COALESCE(i.n_inter, 0) * 1000000 // (s1.n_sh + s2.n_sh - COALESCE(i.n_inter, 0)) AS BIGINT) AS jaccard_ppm,
       |  CAST(m.n_match * 1000000 // 12 - COALESCE(i.n_inter, 0) * 1000000 // (s1.n_sh + s2.n_sh - COALESCE(i.n_inter, 0)) AS BIGINT) AS err_ppm
       |FROM m
       |LEFT JOIN inter i ON i.d1 = m.d1 AND i.d2 = m.d2
       |JOIN sizes s1 ON s1.doc_id = m.d1
       |JOIN sizes s2 ON s2.doc_id = m.d2
       |ORDER BY m.d1, m.d2""".stripMargin) { (s, dir) =>
    Dedup.signatureEstimateAudit(Tables(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, numHashes = 12, numBands = 4)
      .orderBy("d1", "d2")
  }

  /** D132 — ROUGE-2 overlap metrics in-engine (Lin ACL'04, set
    * variant): each odd doc scored as a CANDIDATE against the
    * preceding even doc as REFERENCE — recall/precision/F1 over
    * distinct bigrams, integer ppm with zero-denominator guards. The
    * oracle re-derives both bigram sets, the overlap join, and every
    * guarded floor.
    */
  val qRouge: GateQuery = GateQuery(
    "q_rouge",
    """WITH p AS (
      |  SELECT c.doc_id AS cand_id, r.doc_id AS ref_id,
      |         c.text AS cand, r.text AS ref
      |  FROM documents c JOIN documents r ON r.doc_id = c.doc_id - 1
      |  WHERE c.doc_id % 2 = 1),
      |cg AS (SELECT DISTINCT cand_id,
      |         md5(array_to_string(string_split(cand, ' ')[CAST(s.i AS INT):CAST(s.i + 1 AS INT)], ' ')) AS g
      |       FROM p, LATERAL unnest(generate_series(1, len(string_split(cand, ' ')) - 1)) s(i)),
      |rg AS (SELECT DISTINCT ref_id,
      |         md5(array_to_string(string_split(ref, ' ')[CAST(s.i AS INT):CAST(s.i + 1 AS INT)], ' ')) AS g
      |       FROM p, LATERAL unnest(generate_series(1, len(string_split(ref, ' ')) - 1)) s(i)),
      |cc AS (SELECT cand_id, COUNT(*) AS n_cand FROM cg GROUP BY 1),
      |cr AS (SELECT ref_id, COUNT(*) AS n_ref FROM rg GROUP BY 1),
      |ov AS (SELECT p.cand_id, COUNT(*) AS n_overlap
      |       FROM p JOIN cg ON cg.cand_id = p.cand_id
      |              JOIN rg ON rg.ref_id = p.ref_id AND rg.g = cg.g
      |       GROUP BY 1),
      |base AS (
      |  SELECT p.cand_id, p.ref_id,
      |    CAST(COALESCE(cc.n_cand, 0) AS BIGINT) AS n_cand,
      |    CAST(COALESCE(cr.n_ref, 0) AS BIGINT) AS n_ref,
      |    CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap
      |  FROM p LEFT JOIN cc ON cc.cand_id = p.cand_id
      |         LEFT JOIN cr ON cr.ref_id = p.ref_id
      |         LEFT JOIN ov ON ov.cand_id = p.cand_id),
      |pr AS (
      |  SELECT *,
      |    CASE WHEN n_ref > 0 THEN CAST(n_overlap * 1000000 // n_ref AS BIGINT) ELSE 0 END AS recall_ppm,
      |    CASE WHEN n_cand > 0 THEN CAST(n_overlap * 1000000 // n_cand AS BIGINT) ELSE 0 END AS prec_ppm
      |  FROM base)
      |SELECT cand_id, ref_id, n_cand, n_ref, n_overlap, recall_ppm, prec_ppm,
      |  CASE WHEN recall_ppm + prec_ppm > 0 THEN CAST(2 * prec_ppm * recall_ppm // (prec_ppm + recall_ppm) AS BIGINT) ELSE CAST(0 AS BIGINT) END AS f1_ppm
      |FROM pr
      |ORDER BY cand_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val pairs = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").as("cand_id"), col("text").as("cand"))
      .join(docs.select((col("doc_id") + 1).as("cand_id"),
        col("doc_id").as("ref_id"), col("text").as("ref")), "cand_id")
    Relevance.rougeN(pairs, "cand", "ref", Seq("cand_id", "ref_id"), n = 2)
      .orderBy("cand_id")
  }

  /** D131 — containment ESTIMATE from signatures, audited against
    * exact: Ĉ = Î/min(n1,n2) with Î = Ĵ·(n1+n2)/(1+Ĵ) from the stored
    * signature estimate — what lets a signatures-only mirror rank
    * quote-style containment candidates before paying verification.
    * The oracle replays the full chain (signatures, banding
    * candidates, match counts, the set identity in the same integer
    * floors, and the exact intersection reference).
    */
  val qContEstimate: GateQuery = GateQuery(
    "q_cont_estimate",
    s"""WITH ${shingleCte(3)},
       |seeds AS (SELECT unnest(generate_series(0, 11)) AS i),
       |hs AS (SELECT doc_id,
       |         ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h1,
       |         ('0x' || substr(md5(shingle), 17, 12))::BIGINT AS h2
       |       FROM sh),
       |mh AS (SELECT doc_id, i, MIN((h1 + i * h2) % 281474976710656) AS h
       |       FROM hs CROSS JOIN seeds GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, CAST(i // 3 AS BIGINT) AS band,
       |            md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY i)) AS band_sig
       |          FROM mh GROUP BY doc_id, band),
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
       |m AS (
       |  SELECT c.d1, c.d2,
       |    CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT) AS n_match
       |  FROM cand c
       |  JOIN mh a ON a.doc_id = c.d1
       |  JOIN mh b ON b.doc_id = c.d2 AND b.i = a.i
       |  GROUP BY c.d1, c.d2),
       |inter AS (
       |  SELECT c.d1, c.d2, COUNT(*) AS n_inter
       |  FROM cand c JOIN sh x ON x.doc_id = c.d1 JOIN sh y
       |    ON y.doc_id = c.d2 AND y.shingle = x.shingle
       |  GROUP BY c.d1, c.d2),
       |base AS (
       |  SELECT m.d1, m.d2,
       |    CAST(s1.n_sh AS BIGINT) AS n1, CAST(s2.n_sh AS BIGINT) AS n2,
       |    CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS ni,
       |    CAST(m.n_match * 1000000 // 12 AS BIGINT) AS est_ppm
       |  FROM m
       |  LEFT JOIN inter i ON i.d1 = m.d1 AND i.d2 = m.d2
       |  JOIN sizes s1 ON s1.doc_id = m.d1
       |  JOIN sizes s2 ON s2.doc_id = m.d2),
       |est AS (
       |  SELECT d1, d2, n1, n2, ni,
       |    CAST(CAST(est_ppm * (n1 + n2) // (1000000 + est_ppm) AS BIGINT) * 1000000 // LEAST(n1, n2) AS BIGINT) AS cont_est_ppm,
       |    CAST(ni * 1000000 // LEAST(n1, n2) AS BIGINT) AS cont_ppm
       |  FROM base)
       |SELECT d1, d2, n1, n2, cont_est_ppm, cont_ppm,
       |  CAST(cont_est_ppm - cont_ppm AS BIGINT) AS cont_err_ppm
       |FROM est
       |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    Dedup.containmentEstimateAudit(Tables(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, numHashes = 12, numBands = 4)
      .orderBy("d1", "d2")
  }

  /** D109 — banding-plan chooser: every divisor plan (r×b = 12) of
    * the signature budget scored on the corpus's own df-capped
    * candidate-pair population via the signature Jaccard estimate —
    * expected recall at threshold 0.6, expected false-candidate rate,
    * expected collision volume, and the argmax plan. The oracle
    * replays the blocked candidates, the 12-component match count,
    * and all six plans' s-curves with EXPLICIT integer
    * multiplications (every intermediate ≤ 12^12, Long-exact — no
    * pow to disagree over), then the same separation argmax.
    */
  val qBandingPlan: GateQuery = GateQuery(
    "q_banding_plan",
    s"""WITH ${shingleCte(3)},
       |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |         FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |         WHERE a.shingle IN (SELECT shingle FROM rare)),
       |seeds AS (SELECT unnest(generate_series(0, 11)) AS i),
       |hs AS (SELECT doc_id,
       |         ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h1,
       |         ('0x' || substr(md5(shingle), 17, 12))::BIGINT AS h2
       |       FROM sh),
       |mh AS (SELECT doc_id, i, MIN((h1 + i * h2) % 281474976710656) AS h
       |       FROM hs CROSS JOIN seeds GROUP BY doc_id, i),
       |m AS (
       |  SELECT c.d1, c.d2,
       |    CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT) AS nm,
       |    CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) * 1000000 // 12 >= 600000 AS BOOLEAN) AS wanted
       |  FROM cand c
       |  JOIN mh a ON a.doc_id = c.d1
       |  JOIN mh b ON b.doc_id = c.d2 AND b.i = a.i
       |  GROUP BY c.d1, c.d2),
       |pp AS (
       |  SELECT wanted, 1 AS r, 12 AS b,
       |    CAST((8916100448256 - (12-nm)*(12-nm)*(12-nm)*(12-nm)*(12-nm)*(12-nm)*(12-nm)*(12-nm)*(12-nm)*(12-nm)*(12-nm)*(12-nm)) * 1000000 // 8916100448256 AS BIGINT) AS ppm
       |  FROM m
       |  UNION ALL SELECT wanted, 2, 6,
       |    CAST((8916100448256 - (144-nm*nm)*(144-nm*nm)*(144-nm*nm)*(144-nm*nm)*(144-nm*nm)*(144-nm*nm)) * 1000000 // 8916100448256 AS BIGINT) FROM m
       |  UNION ALL SELECT wanted, 3, 4,
       |    CAST((8916100448256 - (1728-nm*nm*nm)*(1728-nm*nm*nm)*(1728-nm*nm*nm)*(1728-nm*nm*nm)) * 1000000 // 8916100448256 AS BIGINT) FROM m
       |  UNION ALL SELECT wanted, 4, 3,
       |    CAST((8916100448256 - (20736-nm*nm*nm*nm)*(20736-nm*nm*nm*nm)*(20736-nm*nm*nm*nm)) * 1000000 // 8916100448256 AS BIGINT) FROM m
       |  UNION ALL SELECT wanted, 6, 2,
       |    CAST((8916100448256 - (2985984-nm*nm*nm*nm*nm*nm)*(2985984-nm*nm*nm*nm*nm*nm)) * 1000000 // 8916100448256 AS BIGINT) FROM m
       |  UNION ALL SELECT wanted, 12, 1,
       |    CAST(nm*nm*nm*nm*nm*nm*nm*nm*nm*nm*nm*nm * 1000000 // 8916100448256 AS BIGINT) FROM m),
       |agg AS (
       |  SELECT r AS rows_per_band, b AS bands,
       |    SUM(CASE WHEN wanted THEN 1 ELSE 0 END) AS n_wanted,
       |    SUM(CASE WHEN wanted THEN 0 ELSE 1 END) AS n_unwanted,
       |    SUM(CASE WHEN wanted THEN ppm ELSE 0 END) AS sw,
       |    SUM(CASE WHEN wanted THEN 0 ELSE ppm END) AS su
       |  FROM pp GROUP BY r, b),
       |fin AS (
       |  SELECT rows_per_band, bands,
       |    CAST(n_wanted AS BIGINT) AS n_wanted,
       |    CAST(n_unwanted AS BIGINT) AS n_unwanted,
       |    CAST(sw // greatest(n_wanted, 1) AS BIGINT) AS catch_ppm,
       |    CAST(su // greatest(n_unwanted, 1) AS BIGINT) AS false_ppm,
       |    CAST(sw + su AS BIGINT) AS exp_collide_ppm
       |  FROM agg)
       |SELECT rows_per_band, bands, n_wanted, n_unwanted, catch_ppm,
       |  false_ppm, exp_collide_ppm,
       |  ROW_NUMBER() OVER (ORDER BY catch_ppm - false_ppm DESC, rows_per_band) = 1 AS chosen
       |FROM fin
       |ORDER BY rows_per_band""".stripMargin) { (s, dir) =>
    Dedup.bandingPlanAudit(Tables(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, numHashes = 12, thresholdPpm = 600000L)
      .orderBy("rows_per_band")
  }

  /** D58 — incremental near-dup against the PERSISTED signature
    * index: evens are indexed, odds probe, and every (new, corpus)
    * band collision must match the oracle replaying the full KM
    * signature pipeline for both sides — a signature mis-stored,
    * mis-read, or recomputed with different params all break it.
    */
  val qNearDupIncremental: GateQuery = GateQuery(
    "q_neardup_incremental",
    s"""WITH ${shingleCte(3)},
       |seeds AS (SELECT unnest(generate_series(0, 11)) AS i),
       |hs AS (SELECT doc_id,
       |         ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h1,
       |         ('0x' || substr(md5(shingle), 17, 12))::BIGINT AS h2
       |       FROM sh),
       |mh AS (SELECT doc_id, i, MIN((h1 + i * h2) % 281474976710656) AS h
       |       FROM hs CROSS JOIN seeds GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, CAST(i // 3 AS BIGINT) AS band,
       |            md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY i)) AS band_sig
       |          FROM mh GROUP BY doc_id, band)
       |SELECT DISTINCT b.doc_id AS d_new, a.doc_id AS d_corpus
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.band_sig = b.band_sig
       |WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
       |ORDER BY d_new, d_corpus""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val idx = java.nio.file.Files.createTempDirectory("graft_sigidx").toString
    Dedup.writeSignatureIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", idx, shingleN = 3, numHashes = 12, numBands = 4)
    Dedup.incrementalNearDup(s, idx, docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text")
      .orderBy("d_new", "d_corpus")
  }

  /** D58b — incremental near-dup with OPT-IN exact verification: when
    * corpus text is co-located, banding candidates re-verify with
    * exact Jaccard at the one-shot threshold, so the result equals
    * one-shot minhashLsh on corpus ∪ batch restricted to cross pairs.
    * The oracle replays signatures for BOTH sides AND the exact
    * intersection/threshold — a probe that skipped verification (kept
    * a banding false positive) or re-shingled with the wrong stored n
    * both break the hash.
    */
  val qNearDupIncrVerified: GateQuery = GateQuery.slowTier(
    "q_neardup_incr_verified",
    s"""WITH ${shingleCte(3)},
       |seeds AS (SELECT unnest(generate_series(0, 11)) AS i),
       |hs AS (SELECT doc_id,
       |         ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h1,
       |         ('0x' || substr(md5(shingle), 17, 12))::BIGINT AS h2
       |       FROM sh),
       |mh AS (SELECT doc_id, i, MIN((h1 + i * h2) % 281474976710656) AS h
       |       FROM hs CROSS JOIN seeds GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, CAST(i // 3 AS BIGINT) AS band,
       |            md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY i)) AS band_sig
       |          FROM mh GROUP BY doc_id, band),
       |cand AS (SELECT DISTINCT b.doc_id AS d_new, a.doc_id AS d_corpus
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.band_sig = b.band_sig
       |         WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1),
       |inter AS (
       |  SELECT c.d_new, c.d_corpus, COUNT(*) AS n_inter
       |  FROM cand c JOIN sh x ON x.doc_id = c.d_new
       |  JOIN sh y ON y.doc_id = c.d_corpus AND y.shingle = x.shingle
       |  GROUP BY 1, 2)
       |SELECT i.d_new, i.d_corpus,
       |  CAST(n_inter AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_inter AS DOUBLE) AS jaccard
       |FROM inter i
       |JOIN sizes s1 ON s1.doc_id = i.d_new
       |JOIN sizes s2 ON s2.doc_id = i.d_corpus
       |WHERE CAST(n_inter AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_inter AS DOUBLE) >= 0.6
       |ORDER BY d_new, d_corpus""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    // one signature index per (JVM, sf-dir) — like ivfIndexDir, so a
    // timed bench rep probes the index instead of rebuilding it (and
    // no temp dir leaks per rep)
    val idx = sigIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_sig_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Dedup.writeSignatureIndex(corpus, "doc_id", "text", out,
        shingleN = 3, numHashes = 12, numBands = 4)
      out
    })
    Dedup.incrementalNearDupVerified(s, idx,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        corpusText = corpus, threshold = 0.6)
      .orderBy("d_new", "d_corpus")
  }

  /** One on-disk signature index per (JVM, sf-dir), built lazily —
    * the probe gate measures probing, not index construction.
    */
  private val sigIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One DELETED-state signature index per (JVM, sf-dir): built over
    * all evens, then quarter-0 REMOVED via the tombstone path — the
    * order-dependent state q_neardup_remove probes. Separate from
    * sigIndexCache: removal mutates, and the other gates pin the
    * undeleted state.
    */
  private val sigRemoveIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** D58c — DELETE maintenance of the persisted signature index (the
    * index family's "out" story): the index holds ALL even docs, then
    * the quarter-0 docs are REMOVED (tombstone append); odd docs
    * probing afterwards must see exactly a from-scratch index over
    * the survivors (quarter-2) — which is what the oracle replays. A
    * tombstone not honored by the probe (stale positives from deleted
    * docs, the failure delete maintenance exists to kill) or one that
    * over-deletes both break the hash.
    */
  val qNearDupRemove: GateQuery = GateQuery(
    "q_neardup_remove",
    s"""WITH ${shingleCte(3)},
       |seeds AS (SELECT unnest(generate_series(0, 11)) AS i),
       |hs AS (SELECT doc_id,
       |         ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h1,
       |         ('0x' || substr(md5(shingle), 17, 12))::BIGINT AS h2
       |       FROM sh),
       |mh AS (SELECT doc_id, i, MIN((h1 + i * h2) % 281474976710656) AS h
       |       FROM hs CROSS JOIN seeds GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, CAST(i // 3 AS BIGINT) AS band,
       |            md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY i)) AS band_sig
       |          FROM mh GROUP BY doc_id, band)
       |SELECT DISTINCT b.doc_id AS d_new, a.doc_id AS d_corpus
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.band_sig = b.band_sig
       |WHERE a.doc_id % 4 = 2 AND b.doc_id % 2 = 1
       |ORDER BY d_new, d_corpus""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val idx = sigRemoveIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_sig_rm_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Dedup.writeSignatureIndex(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", out, shingleN = 3, numHashes = 12, numBands = 4)
      Dedup.removeDocsFromSignatureIndex(s, out,
        docs.filter(col("doc_id") % 4 === 0).select("doc_id"), "doc_id")
      out
    })
    Dedup.incrementalNearDup(s, idx, docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text")
      .orderBy("d_new", "d_corpus")
  }

  private val sigCompactIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** D58d — the signature index's COMPACT path under the driver
    * oracle (q_neardup_remove pins the tombstone-masked steady state;
    * this pins the FOLD): build evens, remove quarter-0, compact —
    * physical survivor rewrite, tombstones dropped — then probe. The
    * same oracle as the remove gate: if compaction dropped a survivor
    * row, kept a tombstoned one, or lost the params, the hash breaks.
    */
  val qNearDupCompact: GateQuery = GateQuery(
    "q_neardup_compact", qNearDupRemove.oracle.get) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val idx = sigCompactIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_sig_cp_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Dedup.writeSignatureIndex(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", out, shingleN = 3, numHashes = 12, numBands = 4)
      Dedup.removeDocsFromSignatureIndex(s, out,
        docs.filter(col("doc_id") % 4 === 0).select("doc_id"), "doc_id")
      Dedup.compactSignatureIndex(s, out)
      out
    })
    Dedup.incrementalNearDup(s, idx, docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text")
      .orderBy("d_new", "d_corpus")
  }

  /** One verified jaccard pair table (threshold 0.6) per (JVM, sf-dir),
    * persisted to temp parquet — the q_dedup_jaccard gate times the
    * pair computation itself; the gates that BUILD ON the pairs
    * (clustering, leakage-safe splits, survivor election) read the
    * cached table so each times its own increment instead of
    * re-measuring the same candidate verification three more times
    * (the sigIndexCache/ivfIndexDir bench-economics precedent).
    */
  private val jaccardPairsCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val p = jaccardPairsCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_jpairs_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Dedup.jaccardPairs(Tables(s, dir, "documents"), "doc_id", "text", 3, 0.6)
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(p)
  }

  /** D102 — LSH banding calibration: per Jaccard decile of the
    * exact-verified candidate pairs, empirical band-collision ppm
    * vs the analytic s-curve 1−(1−j³)⁴ in fixed point (explicit
    * multiplications, no pow; per-pair floor(prob·10⁶) so no double
    * sum-order). The oracle replays BOTH pipelines — exact
    * verification AND the KM signature banding — plus the decile
    * bucketing and both ppm reductions. Sampling IS engaged
    * (samplePairMod = 2: a seeded md5 draw over (d1, d2) halves the
    * exact-verify side BEFORE the shingle-set join — the audit's
    * dominant cost at 100 TB — and the oracle re-applies the
    * identical draw), so the O(sample) path is the one under test.
    */
  val qLshCalibration: GateQuery = GateQuery(
    "q_lsh_calibration",
    s"""WITH ${shingleCte(3)},
       |${jaccardInterCte()},
       |ex AS (SELECT i.d1, i.d2,
       |         CAST(n_inter AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_inter AS DOUBLE) AS j
       |       FROM inter i
       |       JOIN sizes s1 ON s1.doc_id = i.d1
       |       JOIN sizes s2 ON s2.doc_id = i.d2
       |       WHERE ${hashModSql(42L, "i.d1", "i.d2")} % 2 = 0),
       |seeds AS (SELECT unnest(generate_series(0, 11)) AS i),
       |hs AS (SELECT doc_id,
       |         ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h1,
       |         ('0x' || substr(md5(shingle), 17, 12))::BIGINT AS h2
       |       FROM sh),
       |mh AS (SELECT doc_id, i, MIN((h1 + i * h2) % 281474976710656) AS h
       |       FROM hs CROSS JOIN seeds GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, i // 3 AS band,
       |            md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY i)) AS band_sig
       |          FROM mh GROUP BY doc_id, i // 3),
       |coll AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
       |p AS (SELECT ex.d1, ex.d2,
       |        CASE WHEN coll.d1 IS NOT NULL THEN 1 ELSE 0 END AS hit,
       |        CAST(FLOOR((1 - (1-j*j*j)*(1-j*j*j)*(1-j*j*j)*(1-j*j*j)) * 1000000) AS BIGINT) AS prob_ppm,
       |        CAST(LEAST(FLOOR(j * 10), 9) AS INT) AS decile
       |      FROM ex LEFT JOIN coll ON coll.d1 = ex.d1 AND coll.d2 = ex.d2)
       |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(hit) AS BIGINT) AS n_collided,
       |  CAST(SUM(hit) * 1000000 // COUNT(*) AS BIGINT) AS collide_ppm,
       |  CAST(SUM(prob_ppm) // COUNT(*) AS BIGINT) AS expected_ppm
       |FROM p GROUP BY decile
       |ORDER BY decile""".stripMargin,
    bench = false, slow = true) { (s, dir) =>
    Dedup.lshCalibration(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, numHashes = 12, numBands = 4, samplePairMod = 2)
      .orderBy("decile")
  }

  /** D104 — vocabulary-retention audit: the distinct-3-gram fraction
    * that survives exact dedup — the information-loss number that
    * belongs beside every dedup's byte-savings number. The oracle
    * replays the survivor election, both distinct counts, and the
    * integral ppm.
    */
  /** D127 — distinctive terms per source (domain-signature
    * extraction): per-source df rate vs corpus df rate as an integer
    * lift ppm, top 5 per source with deterministic ties. The oracle
    * replays both censuses and the integral lift — a df counted at
    * token rather than document granularity shifts every lift.
    */
  val qDistinctiveTerms: GateQuery = GateQuery(
    "q_distinctive_terms",
    """WITH p AS (SELECT DISTINCT source AS grp, doc_id, w FROM (
      |        SELECT source, doc_id, unnest(string_split(text, ' ')) AS w
      |        FROM documents)),
      |gd AS (SELECT grp, w, COUNT(*) AS df_g FROM p GROUP BY 1, 2),
      |cd AS (SELECT w, COUNT(*) AS df_c FROM (SELECT DISTINCT doc_id, w FROM p)
      |       GROUP BY 1),
      |gn AS (SELECT source AS grp, COUNT(*) AS n_g FROM documents GROUP BY 1),
      |na AS (SELECT COUNT(*) AS n FROM documents),
      |s AS (SELECT gd.grp, gd.w, CAST(gd.df_g AS BIGINT) AS df_g,
      |        CAST(cd.df_c AS BIGINT) AS df_c,
      |        CAST(gd.df_g * (SELECT n FROM na) * 1000000 // (gn.n_g * cd.df_c) AS BIGINT) AS lift_ppm
      |      FROM gd JOIN cd USING (w) JOIN gn USING (grp)),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY grp
      |        ORDER BY lift_ppm DESC, w) AS rank FROM s)
      |SELECT grp, CAST(rank AS INT) AS rank, w, df_g, df_c, lift_ppm
      |FROM r WHERE rank <= 5
      |ORDER BY grp, rank""".stripMargin) { (s, dir) =>
    CorpusStats.distinctiveTerms(Tables(s, dir, "documents"),
        "doc_id", "text", "source", k = 5)
      .orderBy("grp", "rank")
  }

  /** D128 — deterministic exact-k-per-stratum selection (balanced
    * eval sets): rank by the seeded portable shuffle key within each
    * language, keep the first 20. The oracle is the direct per-
    * stratum ROW_NUMBER over the same md5 key; the operator goes
    * through the two-phase bucket-rank composition and must land on
    * identical members AND ranks.
    */
  val qStratifiedTopK: GateQuery = GateQuery(
    "q_stratified_topk",
    """WITH x AS (SELECT doc_id, lang,
      |    ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS score
      |  FROM documents),
      |r AS (SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score, doc_id) AS rank
      |  FROM x)
      |SELECT doc_id, lang AS grp, CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 20
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Prep.stratifiedTopK(Tables(s, dir, "documents"),
        "doc_id", "lang", seed = 7L, k = 20)
      .orderBy("doc_id")
  }

  /** D126 — per-source score calibration by rank normalization: each
    * doc's n_chars percentile (ppm) WITHIN its source, the step that
    * makes per-source quality scores comparable before mixing. The
    * oracle is the direct per-source ROW_NUMBER; the operator must
    * reproduce it through the two-phase (bucket rank + offset)
    * composition — an off-by-one in either phase shifts every
    * percentile.
    */
  val qRankCalibrate: GateQuery = GateQuery(
    "q_rank_calibrate",
    """WITH r AS (SELECT doc_id, source, n_chars AS score,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rank,
      |    COUNT(*) OVER (PARTITION BY source) AS n_grp
      |  FROM documents)
      |SELECT doc_id, source AS grp, CAST(score AS BIGINT) AS score,
      |  CAST(rank AS BIGINT) AS rank, CAST(n_grp AS BIGINT) AS n_grp,
      |  CAST((rank - 1) * 1000000 // n_grp AS BIGINT) AS pct_ppm
      |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Prep.rankCalibrate(Tables(s, dir, "documents"),
        "doc_id", "n_chars", "source", bucketWidth = 64L)
      .orderBy("doc_id")
  }

  /** D125 — vocabulary-pruning apply: tokens under a RELATIVE df
    * floor (10% of docs) rewrite to `<unk>`, corpus reassembled in
    * order. The gate hashes the reconstructed text, so the df census,
    * the keep decision, and order-preserving reassembly are all
    * pinned; the fixture's injected rare token (df ≈ 5% of docs) is
    * what makes n_unk non-zero at every scale.
    */
  val qPruneVocab: GateQuery = GateQuery(
    "q_prune_vocab",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |n AS (SELECT COUNT(*) AS nd FROM documents),
      |x AS (SELECT doc_id, toks[CAST(s.i AS INT)] AS tok, CAST(s.i AS INT) AS pos
      |      FROM t, LATERAL unnest(generate_series(1, len(toks))) s(i)),
      |keep AS (SELECT tok FROM (
      |           SELECT tok, COUNT(DISTINCT doc_id) AS df FROM x GROUP BY tok)
      |         WHERE df * 100 >= 10 * (SELECT nd FROM n)),
      |y AS (SELECT doc_id, pos,
      |        CASE WHEN tok IN (SELECT tok FROM keep) THEN tok ELSE '<unk>' END AS t2,
      |        CASE WHEN tok IN (SELECT tok FROM keep) THEN 0 ELSE 1 END AS unk
      |      FROM x)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
      |  CAST(SUM(unk) AS BIGINT) AS n_unk,
      |  string_agg(t2, ' ' ORDER BY pos) AS text_pruned
      |FROM y GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    CorpusStats.pruneRareTokens(Tables(s, dir, "documents"),
        "doc_id", "text", minDfPct = 10)
      .orderBy("doc_id")
  }

  val qVocabRetention: GateQuery = GateQuery(
    "q_vocab_retention",
    s"""WITH ${shingleCte(3)},
       |surv AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |t AS (SELECT COUNT(DISTINCT shingle) AS n_total FROM sh),
       |k AS (SELECT COUNT(DISTINCT shingle) AS n_kept FROM sh
       |      WHERE doc_id IN (SELECT doc_id FROM surv))
       |SELECT CAST(t.n_total AS BIGINT) AS n_total,
       |  CAST(k.n_kept AS BIGINT) AS n_kept,
       |  CAST(k.n_kept * 1000000 // t.n_total AS BIGINT) AS retention_ppm
       |FROM t, k""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val survivors = docs.groupBy(md5(col("text").cast("binary")))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    CorpusStats.vocabRetention(docs, "doc_id", "text", survivors, n = 3)
  }

  /** D3 — 16-bit SimHash fingerprint per document. */
  val qDedupSimhash: GateQuery = {
    val hexVal = (k: Int) => s"(strpos('0123456789abcdef', substr(md5(w), $k, 1)) - 1)"
    val bitTerms = (0 until 16).map { b =>
      s"(CASE WHEN SUM(CASE WHEN (th >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN ${1 << b} ELSE 0 END)"
    }.mkString(" + ")
    GateQuery(
      "q_dedup_simhash",
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |h AS (SELECT doc_id,
         |  ${hexVal(1)} * 4096 + ${hexVal(2)} * 256 + ${hexVal(3)} * 16 + ${hexVal(4)} AS th
         |  FROM w)
         |SELECT doc_id, $bitTerms AS simhash
         |FROM h GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.simhashFingerprints(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }
  }

  private val embCte =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |        sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
      |      FROM e)""".stripMargin

  private def duckDot(a: String, b: String) =
    s"list_aggregate(list_transform(generate_series(1, 64), i -> $a[i] * $b[i]), 'sum')"

  /** D5 — embedding near-dup: sign-bucket LSH prefilter + exact cosine. */
  val qNearDupEmbedding: GateQuery = {
    val bucket = (v: String) => (0 until 4).map { i =>
      s"(CASE WHEN $v[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")
    GateQuery(
      "q_neardup_embedding",
      s"""WITH $embCte,
         |b AS (SELECT vec_id, v, nrm, ${bucket("v")} AS bucket FROM n)
         |SELECT a.vec_id AS id1, b2.vec_id AS id2
         |FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
         |WHERE ${duckDot("a.v", "b2.v")} / (a.nrm * b2.nrm) > 0.3
         |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      Dedup.embeddingNearDup(Tables(s, dir, "embeddings"), "vec_id", "embedding",
          bucketBits = 4, threshold = 0.3)
        .orderBy("id1", "id2")
    }
  }

  /** D6 — brute-force cosine top-3 for query vectors vec_id < 5. */
  val qKnnBruteForce: GateQuery = GateQuery(
    "q_knn_bruteforce",
    s"""WITH $embCte,
       |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |        ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
       |      FROM n q JOIN n c ON c.vec_id <> q.vec_id
       |      WHERE q.vec_id < 5),
       |r AS (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM p)
       |SELECT qid, cid, rk FROM r WHERE rk <= 3
       |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    Similarity.knnBruteForce(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 3)
      .orderBy("qid", "rk")
  }

  /** D120 — retrieval-quality metrics in-engine: per query (every
    * 25th vector), MRR / recall@20 / precision@20 of the brute-force
    * cosine ranking against a pseudo-class truth set (vec_id mod 10
    * — deterministic, and dense enough that hits actually occur).
    * All three metrics are integer ppm; the oracle replays ranking,
    * truth, first-hit rank, and all three divisions — a ranking
    * off-by-one or a mis-capped recall denominator breaks the hash.
    */
  val qRetrievalEval: GateQuery = GateQuery(
    "q_retrieval_eval",
    s"""WITH $embCte,
       |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |        ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
       |      FROM n q JOIN n c ON c.vec_id <> q.vec_id
       |      WHERE q.vec_id % 25 = 0),
       |r AS (SELECT qid, cid,
       |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
       |      FROM p),
       |t AS (SELECT qid, cid, rk FROM r WHERE rk <= 20),
       |rel AS (SELECT q.vec_id AS qid, c.vec_id AS cid
       |        FROM n q JOIN n c
       |          ON c.vec_id <> q.vec_id AND c.vec_id % 10 = q.vec_id % 10
       |        WHERE q.vec_id % 25 = 0),
       |nr AS (SELECT qid, COUNT(*) AS n_rel FROM rel GROUP BY qid),
       |h AS (SELECT t.qid, MIN(t.rk) AS first_rk, COUNT(*) AS hits
       |      FROM t JOIN rel ON rel.qid = t.qid AND rel.cid = t.cid
       |      GROUP BY t.qid)
       |SELECT nr.qid, CAST(nr.n_rel AS BIGINT) AS n_rel,
       |  CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits_k,
       |  CAST(COALESCE(CAST(1000000 // h.first_rk AS BIGINT), 0) AS BIGINT) AS rr_ppm,
       |  CAST(COALESCE(h.hits, 0) * 1000000 // least(20, nr.n_rel) AS BIGINT) AS recall_ppm,
       |  CAST(COALESCE(h.hits, 0) * 1000000 // 20 AS BIGINT) AS prec_ppm
       |FROM nr LEFT JOIN h ON h.qid = nr.qid
       |ORDER BY nr.qid""".stripMargin) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    val ranked = Similarity.knnBruteForce(emb,
      emb.filter(col("vec_id") % 25 === 0), "vec_id", "embedding", k = 20)
    val ids = emb.select(col("vec_id"))
    val truth = ids.filter(col("vec_id") % 25 === 0).select(col("vec_id").as("qid"))
      .join(ids.select(col("vec_id").as("cid")),
        col("cid") =!= col("qid") && col("cid") % 10 === col("qid") % 10)
    graft.operators.Relevance.retrievalMetrics(ranked, truth, k = 20)
      .orderBy("qid")
  }

  /** D93 — hard-negative mining: same exact-scan shape as
    * q_knn_bruteforce but ranked INSIDE the informative band
    * (sim < 0.3 — at this corpus each anchor's top neighbors sit
    * above 0.3, so the ceiling genuinely excludes the would-be
    * positives and the result differs from plain kNN). sim rides in
    * the output, pinning the double fold-order arithmetic.
    */
  val qHardNegatives: GateQuery = GateQuery(
    "q_hard_negatives",
    s"""WITH $embCte,
       |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |        ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
       |      FROM n q JOIN n c ON c.vec_id <> q.vec_id
       |      WHERE q.vec_id < 5),
       |b AS (SELECT qid, cid, sim FROM p WHERE sim < 0.3),
       |r AS (SELECT qid, cid, sim,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM b)
       |SELECT qid, cid, sim, rk FROM r WHERE rk <= 5
       |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 5, ceiling = 0.3)
      .orderBy("qid", "rk")
  }

  /** D7 — bucketed (IVF-style) ANN: same queries, 4-bit sign buckets. */
  val qKnnLsh: GateQuery = {
    val bucket = (v: String) => (0 until 4).map { i =>
      s"(CASE WHEN $v[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")
    GateQuery(
      "q_knn_lsh",
      s"""WITH $embCte,
         |b AS (SELECT vec_id, v, nrm, ${bucket("v")} AS bucket FROM n),
         |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |        ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
         |      FROM b q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
         |      WHERE q.vec_id < 5),
         |r AS (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM p)
         |SELECT qid, cid, rk FROM r WHERE rk <= 3
         |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.knnLshBucketed(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 3, 4)
        .orderBy("qid", "rk")
    }
  }

  /** D121 — MULTI-PROBE sign-bucket ANN: the query scans its bucket
    * plus every Hamming-1 neighbor (one sign flip — where
    * near-boundary neighbors land), the query-time recall/latency
    * knob on an untouched bucketed layout. Full replay: the oracle
    * restates the probe set as xor(bucket_q, bucket_c) ∈ {0,1,2,4,8}
    * — a probe missed or an extra bucket scanned changes the
    * candidate set and breaks the hash.
    */
  val qKnnMultiProbe: GateQuery = {
    val bucket = (v: String) => (0 until 4).map { i =>
      s"(CASE WHEN $v[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")
    GateQuery(
      "q_knn_multiprobe",
      s"""WITH $embCte,
         |b AS (SELECT vec_id, v, nrm, ${bucket("v")} AS bucket FROM n),
         |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |        ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
         |      FROM b q JOIN b c
         |        ON xor(CAST(c.bucket AS BIGINT), CAST(q.bucket AS BIGINT)) IN (0, 1, 2, 4, 8)
         |        AND c.vec_id <> q.vec_id
         |      WHERE q.vec_id < 5),
         |r AS (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM p)
         |SELECT qid, cid, rk FROM r WHERE rk <= 5
         |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.knnLshMultiProbe(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, bits = 4)
        .orderBy("qid", "rk")
    }
  }

  /** D7 partial probe — HASH-MATCHED via the ANN recall contract (the
    * sketch-gate move): an 8/16-probe search is approximate by design,
    * so the gate measures its recall against the exact brute-force
    * top-k computed in the same plan and asserts the floor the
    * operator promises (≥0.55 aggregate recall@3, the SimilaritySpec
    * bound; measured 0.87–0.93 at 8/16 across sf0.001–sf0.1). The
    * quantizer draw is seed-deterministic, so the oracle's TRUE is
    * stable — and a quantizer regression that tanks recall FAILS the
    * driver gate, not just a spec.
    */
  val qKnnIvf: GateQuery = GateQuery(
    "q_knn_ivf",
    """SELECT COUNT(DISTINCT vec_id) AS n_queries, 3 AS k, TRUE AS recall_ok
      |FROM embeddings WHERE vec_id < 5""".stripMargin) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val ivf = Similarity.knnIvf(emb, q, "vec_id", "embedding",
        k = 3, nLists = 16, nProbe = 8)
      .select("qid", "cid")
    val exact = Similarity.knnBruteForce(emb, q, "vec_id", "embedding", 3)
      .select("qid", "cid")
    val hits = exact.join(ivf, Seq("qid", "cid"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    q.agg(countDistinct(col("vec_id")).as("n_queries"))
      .crossJoin(hits)
      .select(col("n_queries"), lit(3).as("k"),
        (col("n_hits").cast("double") / (col("n_queries") * 3).cast("double") >= 0.55)
          .as("recall_ok"))
  }

  /** D7b — IVF at FULL probe (nProbe == nLists) must equal exact
    * brute-force top-k: every cell is searched, so the learned
    * quantizer can only route, never drop, a candidate. That makes the
    * whole IVF machinery — codegen cell assignment, probe explode,
    * bucket join, ranking — hash-checkable against the same
    * window-over-cosine oracle as D6, even though the quantizer itself
    * is a model no SQL engine can restate. (Partial-probe recall stays
    * spec-asserted in SimilaritySpec; q_knn_ivf keeps the perf shape.)
    */
  val qKnnIvfFull: GateQuery = GateQuery(
    "q_knn_ivf_full",
    s"""WITH $embCte,
       |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |        ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
       |      FROM n q JOIN n c ON c.vec_id <> q.vec_id
       |      WHERE q.vec_id < 5),
       |r AS (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM p)
       |SELECT qid, cid, rk FROM r WHERE rk <= 3
       |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    Similarity.knnIvf(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 3, nLists = 16, nProbe = 16)
      .select("qid", "cid", "rk")
      .orderBy("qid", "rk")
  }

  /** One on-disk IVF index per (JVM, sf-dir), built lazily — gates
    * re-running in the same process probe the already-written layout.
    */
  private val ivfIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ivfIndexDir(s: org.apache.spark.sql.SparkSession, dir: String): String =
    ivfIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Similarity.writeIvfIndex(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        nLists = 16, dir = out)
      out
    })

  /** Full-probe-equals-brute-force oracle shared by the persisted-IVF
    * gates: with nProbe == nLists the quantizer can only route, never
    * drop, a candidate, so the window-over-cosine top-k applies.
    */
  private val ivfFullProbeOracle: String =
    s"""WITH $embCte,
       |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |        ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
       |      FROM n q JOIN n c ON c.vec_id <> q.vec_id
       |      WHERE q.vec_id < 5),
       |r AS (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM p)
       |SELECT qid, cid, rk FROM r WHERE rk <= 3
       |ORDER BY qid, rk""".stripMargin

  /** D7++ — the PERSISTED IVF index probed at full width must also
    * equal brute force: cell routing moves to a parquet partition
    * filter (directory pruning, zero corpus shuffle — IvfIndexSpec
    * asserts the 4/16-partition read), and with nProbe == nLists the
    * result is exact, so the same window-over-cosine oracle applies.
    * This upgrades the on-disk index from spec-only to driver-proven.
    * bench=false: its wall-clock muddled index-write and probe cost
    * into one number — the split q_knn_ivf_write / q_knn_ivf_probe
    * gates below carry the attributable timings.
    */
  val qKnnIvfIndexed: GateQuery = GateQuery(
    "q_knn_ivf_indexed", ivfFullProbeOracle, bench = false, slow = true) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    Similarity.knnIvfIndexed(s, ivfIndexDir(s, dir),
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3, nProbe = 16)
      .select("qid", "cid", "rk")
      .orderBy("qid", "rk")
  }

  /** D7++ (append phase) — incremental index maintenance: the index is
    * built from HALF the corpus, the other half is APPENDED against the
    * stored centroids (no retrain, no rewrite), and the full-width
    * probe must still equal brute force over the whole corpus — rows
    * lost, duplicated, or routed inconsistently by the append all break
    * the hash. bench=false: write+append+probe in one wall-clock would
    * muddle the attributable split gates.
    */
  val qKnnIvfAppend: GateQuery = GateQuery(
    "q_knn_ivf_append", ivfFullProbeOracle, bench = false, slow = true) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    val out = java.nio.file.Files.createTempDirectory("graft_ivf_append").toString
    Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", nLists = 16, dir = out)
    Similarity.appendIvfIndex(s, out, emb.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding")
    Similarity.knnIvfIndexed(s, out, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 3, nProbe = 16)
      .select("qid", "cid", "rk")
      .orderBy("qid", "rk")
  }

  private val ivfRemoveIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** D7++ (delete phase) — the on-disk IVF index's "out" story: the
    * full corpus is indexed, the quarter-0 vectors are REMOVED by a
    * touched-cell-only partition rewrite (the D52 discipline — cells
    * without deleted ids are never read or written; emptied cell dirs
    * are dropped explicitly), and the full-width probe must equal
    * brute force over the SURVIVORS — rows resurrected from a stale
    * cell file, survivors lost by the rewrite, or an emptied cell's
    * leftover files all break the hash.
    */
  val qKnnIvfRemove: GateQuery = GateQuery(
    "q_knn_ivf_remove",
    s"""WITH $embCte,
       |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |        ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
       |      FROM n q JOIN n c ON c.vec_id <> q.vec_id AND c.vec_id % 4 <> 0
       |      WHERE q.vec_id < 5),
       |r AS (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM p)
       |SELECT qid, cid, rk FROM r WHERE rk <= 3
       |ORDER BY qid, rk""".stripMargin,
    bench = false, slow = true) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    val idx = ivfRemoveIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_rm_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Similarity.writeIvfIndex(emb, "vec_id", "embedding", nLists = 16, dir = out)
      Similarity.removeDocsFromIvfIndex(s, out,
        emb.filter(col("vec_id") % 4 === 0).select("vec_id"), "vec_id")
      out
    })
    Similarity.knnIvfIndexed(s, idx, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 3, nProbe = 16)
      .select("qid", "cid", "rk")
      .orderBy("qid", "rk")
  }

  /** D7++ (write phase) — TIMED index build to a fresh directory every
    * call: train the quantizer, lay the corpus out partitioned by
    * cell, write the centroid side table. The gate result re-reads the
    * written corpus and counts it — hash-green iff every embedding row
    * landed in the index, and the bench number is pure write cost
    * (the probe phase is its own gate, so a regression in either
    * shows up attributed instead of averaged).
    */
  val qKnnIvfWrite: GateQuery = GateQuery(
    "q_knn_ivf_write",
    "SELECT COUNT(*) AS n_rows FROM embeddings") { (s, dir) =>
    val out = java.nio.file.Files.createTempDirectory("graft_ivf_write").toString
    Similarity.writeIvfIndex(Tables(s, dir, "embeddings"), "vec_id", "embedding",
      nLists = 16, dir = out)
    s.read.parquet(s"$out/corpus").agg(count(lit(1)).as("n_rows"))
  }

  /** D7++ (probe phase) — same correctness contract as
    * q_knn_ivf_indexed but against the per-JVM cached index, so after
    * the first call its wall-clock is the scale-relevant number alone:
    * partition-pruned read of the probed cells + broadcast join + rank.
    * Bench runs gates repeatedly and keeps the minimum, which makes
    * this the steady-state probe latency.
    */
  val qKnnIvfProbe: GateQuery = GateQuery(
    "q_knn_ivf_probe", ivfFullProbeOracle) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    Similarity.knnIvfIndexed(s, ivfIndexDir(s, dir),
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3, nProbe = 16)
      .select("qid", "cid", "rk")
      .orderBy("qid", "rk")
  }

  /** D7 partial probe, HASH-GREEN (upgrades q_knn_ivf's recall-floor
    * contract): an 8-of-16-probe search result is a pure function of
    * (query set, written index), and the index is ON DISK — so the
    * oracle reads the engine-written corpus layout and centroid side
    * table via read_parquet (the heap-gate move) and REPLAYS the
    * whole probe in SQL: per-query centroid distances on unit vectors
    * (same sequential fold, ties to the lowest cell), top-8 cells,
    * then exact cosine top-3 over the probed cells' members using the
    * index's own stored norms. Hash-green only if cell routing, probe
    * selection, AND the scoring arithmetic agree bit-for-bit with the
    * distributed run.
    */
  val qKnnIvfPartial: GateQuery = {
    // pid-scoped fixed dir (see ivfIndexDir); '*' spans the one sf
    // this JVM verifies
    val idxGlob =
      s"${System.getProperty("java.io.tmpdir")}/graft_ivf_idx_${ProcessHandle.current().pid()}/{SF_BASE}"
    GateQuery(
      "q_knn_ivf_partial",
      s"""WITH $embCte,
         |cents AS (SELECT cell, centroid FROM read_parquet('$idxGlob/centroids/*.parquet')),
         |corpus AS (SELECT cid, cv, cn, cell
         |           FROM read_parquet('$idxGlob/corpus/*/*.parquet', hive_partitioning=1)),
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
         |qc AS (SELECT q.qid, c.cell,
         |         list_aggregate(list_transform(generate_series(1, 64),
         |           i -> (q.qv[i] / q.qn - c.centroid[i]) * (q.qv[i] / q.qn - c.centroid[i])), 'sum') AS d
         |       FROM q, cents c),
         |probe AS (SELECT qid, cell FROM (
         |    SELECT qid, cell, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d, cell) AS prk FROM qc)
         |  WHERE prk <= 8),
         |p AS (SELECT q.qid, c.cid,
         |        ${duckDot("q.qv", "c.cv")} / (q.qn * c.cn) AS sim
         |      FROM probe pr JOIN q ON q.qid = pr.qid
         |        JOIN corpus c ON c.cell = pr.cell
         |      WHERE c.cid <> q.qid),
         |r AS (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM p)
         |SELECT qid, cid, rk FROM r WHERE rk <= 3
         |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.knnIvfIndexed(s, ivfIndexDir(s, dir),
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3, nProbe = 8)
        .select("qid", "cid", "rk")
        .orderBy("qid", "rk")
    }
  }

  /** One PQ index per (JVM, sf-dir), built lazily (the ivfIndexDir
    * move): gates re-running in this process search the written
    * codebook + code table.
    */
  private val pqIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def pqIndexDir(s: org.apache.spark.sql.SparkSession, dir: String): String =
    pqIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_pq_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Pq.writeIndex(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        m = 8, ksub = 16, dir = out)
      out
    })

  /** D88 — product-quantization ANN (Jégou et al. TPAMI'11), HASH-GREEN
    * end to end: the oracle reads the engine-written CODEBOOK via
    * read_parquet and independently replays the whole pipeline in SQL —
    * grid quantization (floor(x·256), exact in IEEE doubles), per-
    * subspace argmin encoding of every corpus vector (ties → lowest
    * code — so the stored code table is cross-checked against a
    * re-encode, the q_heap_dsv2 move), the per-query asymmetric
    * distance table, and the BIGINT ADC ranking with its exact `adist`
    * values. A wrong centroid, code, lookup entry, or tie-break
    * anywhere shifts a row and breaks the hash.
    */
  val qPqSearch: GateQuery = {
    val idxGlob =
      s"${System.getProperty("java.io.tmpdir")}/graft_pq_idx_${ProcessHandle.current().pid()}/{SF_BASE}"
    GateQuery(
      "q_pq_search",
      s"""WITH cb AS (SELECT sub, code, centroid FROM read_parquet('$idxGlob/codebook/*.parquet')),
         |v8 AS (SELECT vec_id, list_transform(embedding,
         |         x -> CAST(floor(CAST(x AS DOUBLE) * 256) AS BIGINT)) AS qv
         |       FROM embeddings),
         |dists AS (SELECT v.vec_id, c.sub, c.code,
         |    CAST(list_aggregate(list_transform(generate_series(1, 8),
         |      j -> (v.qv[c.sub * 8 + j] - c.centroid[j]) * (v.qv[c.sub * 8 + j] - c.centroid[j])),
         |      'sum') AS BIGINT) AS d2
         |  FROM v8 v, cb c),
         |codes AS (SELECT vec_id, sub, code FROM (
         |    SELECT vec_id, sub, code,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rk
         |    FROM dists) WHERE rk = 1),
         |dtab AS (SELECT vec_id AS qid, sub, code, d2 FROM dists WHERE vec_id < 5),
         |scored AS (SELECT dt.qid, c.vec_id AS cid, CAST(SUM(dt.d2) AS BIGINT) AS adist
         |  FROM codes c JOIN dtab dt ON dt.sub = c.sub AND dt.code = c.code
         |  WHERE c.vec_id <> dt.qid GROUP BY 1, 2),
         |r AS (SELECT qid, cid, adist,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, cid) AS rk FROM scored)
         |SELECT qid, cid, adist, rk FROM r WHERE rk <= 3
         |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Pq.search(s, pqIndexDir(s, dir), emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 3)
        .orderBy("qid", "rk")
    }
  }

  /** Shared replay of the flat-PQ ADC pipeline (the q_pq_search CTEs
    * through the ranked ADC result `r`), parameterized by shortlist
    * depth — reused by the re-rank and recall gates below.
    */
  /** DuckDB replay of Sampling.hashMod(seed, keys*): the same
    * length-prefixed token string, md5, 48-bit hex prefix as BIGINT —
    * so a seeded 1-in-mod draw made by the engine is re-derived by the
    * oracle key-for-key (keys here are non-null ids; the Spark side's
    * NULL token never arises).
    */
  private def hashModSql(seed: Long, keys: String*): String = {
    val toks = keys.map(k =>
      s"CAST(LENGTH(CAST($k AS VARCHAR)) AS VARCHAR) || ':' || CAST($k AS VARCHAR)")
    s"(('0x' || substr(md5('$seed-' || ${toks.mkString(" || '-' || ")}), 1, 12))::BIGINT)"
  }

  private def pqAdcCtes(idxGlob: String, qPred: String = "vec_id < 5",
      corpusPred: String = "TRUE"): String =
    s"""cb AS (SELECT sub, code, centroid FROM read_parquet('$idxGlob/codebook/*.parquet')),
       |v8 AS (SELECT vec_id, list_transform(embedding,
       |         x -> CAST(floor(CAST(x AS DOUBLE) * 256) AS BIGINT)) AS qv
       |       FROM embeddings),
       |dists AS (SELECT v.vec_id, c.sub, c.code,
       |    CAST(list_aggregate(list_transform(generate_series(1, 8),
       |      j -> (v.qv[c.sub * 8 + j] - c.centroid[j]) * (v.qv[c.sub * 8 + j] - c.centroid[j])),
       |      'sum') AS BIGINT) AS d2
       |  FROM v8 v, cb c),
       |codes AS (SELECT vec_id, sub, code FROM (
       |    SELECT vec_id, sub, code,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rk
       |    FROM dists) WHERE rk = 1 AND ($corpusPred)),
       |dtab AS (SELECT vec_id AS qid, sub, code, d2 FROM dists WHERE $qPred),
       |scored AS (SELECT dt.qid, c.vec_id AS cid, CAST(SUM(dt.d2) AS BIGINT) AS adist
       |  FROM codes c JOIN dtab dt ON dt.sub = c.sub AND dt.code = c.code
       |  WHERE c.vec_id <> dt.qid GROUP BY 1, 2),
       |r AS (SELECT qid, cid, adist,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, cid) AS rk FROM scored)""".stripMargin

  private val exactDist64 =
    """CAST(list_aggregate(list_transform(generate_series(1, 64),
      |      i -> (q.qv[i] - c.qv[i]) * (q.qv[i] - c.qv[i])), 'sum') AS BIGINT)""".stripMargin

  /** D96 — two-stage ANN (ADC shortlist=10 → exact re-rank → k=3):
    * the oracle replays the full ADC pipeline, the shortlist cut, the
    * exact grid-L2 re-scoring of shortlist pairs, and the re-ranked
    * cut — a shortlist that leaked, a re-rank on compressed codes
    * instead of raw vectors, or a tie mis-break all shift rows.
    */
  val qPqRerank: GateQuery = {
    val idxGlob =
      s"${System.getProperty("java.io.tmpdir")}/graft_pq_idx_${ProcessHandle.current().pid()}/{SF_BASE}"
    GateQuery(
      "q_pq_rerank",
      s"""WITH ${pqAdcCtes(idxGlob)},
         |sl AS (SELECT qid, cid FROM r WHERE rk <= 10),
         |ex AS (SELECT s.qid, s.cid, $exactDist64 AS edist
         |  FROM sl s JOIN v8 q ON q.vec_id = s.qid JOIN v8 c ON c.vec_id = s.cid),
         |rr AS (SELECT qid, cid, edist,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY edist, cid) AS rk FROM ex)
         |SELECT qid, cid, edist, rk FROM rr WHERE rk <= 3
         |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Pq.searchRerank(s, pqIndexDir(s, dir), emb.filter(col("vec_id") < 5),
          emb, "vec_id", "embedding", k = 3, shortlist = 10)
        .orderBy("qid", "rk")
    }
  }

  /** D97 — in-engine recall@5 audit of the PQ index: exact grid-L2
    * ground truth per query vs the ADC top-5, hit count and integer
    * recall. The oracle recomputes BOTH rankings and the join — an
    * inflated recall (hits counted against the wrong ground truth, or
    * approx rows double-counted) breaks the hash. Sampling IS engaged
    * here (queryMod = 2 over a 10-id pool → the seeded draw keeps
    * vec_ids 1,3,5,9): the oracle re-derives the identical md5 draw,
    * so the sampled audit path — the one a 100 TB corpus would run —
    * is the one under test, not just full-census mode.
    */
  val qAnnRecall: GateQuery = {
    val idxGlob =
      s"${System.getProperty("java.io.tmpdir")}/graft_pq_idx_${ProcessHandle.current().pid()}/{SF_BASE}"
    def qPred(id: String) = s"$id < 10 AND ${hashModSql(42L, id)} % 2 = 0"
    GateQuery(
      "q_ann_recall",
      s"""WITH ${pqAdcCtes(idxGlob, qPred("vec_id"))},
         |exd AS (SELECT q.vec_id AS qid, c.vec_id AS cid, $exactDist64 AS edist
         |  FROM v8 q JOIN v8 c ON c.vec_id <> q.vec_id
         |  WHERE ${qPred("q.vec_id")}),
         |ex AS (SELECT qid, cid FROM (
         |    SELECT qid, cid,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY edist, cid) AS rk
         |    FROM exd) WHERE rk <= 5),
         |ap AS (SELECT qid, cid FROM r WHERE rk <= 5)
         |SELECT e.qid AS qid, CAST(COUNT(*) AS BIGINT) AS n_exact,
         |  CAST(SUM(CASE WHEN ap.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |  CAST(SUM(CASE WHEN ap.cid IS NOT NULL THEN 1 ELSE 0 END) * 100 // COUNT(*) AS BIGINT) AS recall_pct
         |FROM ex e LEFT JOIN ap ON ap.qid = e.qid AND ap.cid = e.cid
         |GROUP BY e.qid
         |ORDER BY e.qid""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Pq.recallAudit(s, pqIndexDir(s, dir), emb.filter(col("vec_id") < 10),
          emb, "vec_id", "embedding", k = 5, queryMod = 2)
        .orderBy("qid")
    }
  }

  private val ivfPqIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ivfPqIndexDir(s: org.apache.spark.sql.SparkSession, dir: String): String =
    ivfPqIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Pq.writeIvfPqIndex(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        nLists = 8, m = 8, ksub = 16, dir = out)
      out
    })

  /** D92 — IVF-PQ composed index (coarse cells + PQ-coded RESIDUALS,
    * partitioned by cell), probed at nProbe=3 of 8: the oracle reads
    * the engine-written coarse centroids + sub-codebooks and replays
    * EVERYTHING in SQL — corpus cell routing, integer residuals,
    * per-subspace encoding (cross-checking the stored code table),
    * query probe selection, the per-probed-cell residual distance
    * tables, and the BIGINT ADC ranking over probed members only.
    * The scale contract (partition-pruned read of the compressed code
    * table) is asserted in PqSpec.
    */
  /** Shared IVF-PQ replay oracle, parameterized by the index
    * directory glob: it reads the written coarse + codebook tables and
    * replays the whole pipeline over the full embeddings corpus — so
    * the SAME SQL adjudicates a freshly built index and an appended
    * one (the oracle never cares HOW rows entered the code table; a
    * row lost, duplicated, or mis-encoded by either path breaks it).
    */
  private def ivfPqOracleSql(idxGlob: String, corpusPred: String = "TRUE"): String = {
    val sqd64 = (v: String, c: String) =>
      s"""CAST(list_aggregate(list_transform(generate_series(1, 64),
         |      i -> ($v[i] - $c[i]) * ($v[i] - $c[i])), 'sum') AS BIGINT)""".stripMargin
    val sqd8 = (rv: String, b: String) =>
      s"""CAST(list_aggregate(list_transform(generate_series(1, 8),
         |      j -> ($rv[$b.sub * 8 + j] - $b.centroid[j]) * ($rv[$b.sub * 8 + j] - $b.centroid[j])),
         |      'sum') AS BIGINT)""".stripMargin
    s"""WITH coarse AS (SELECT cell, centroid FROM read_parquet('$idxGlob/coarse/*.parquet')),
         |cb AS (SELECT sub, code, centroid FROM read_parquet('$idxGlob/codebook/*.parquet')),
         |v8 AS (SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 256) AS BIGINT)) AS qv FROM embeddings),
         |cd AS (SELECT v.vec_id, c.cell, ${sqd64("v.qv", "c.centroid")} AS d
         |  FROM v8 v, coarse c),
         |route AS (SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rk
         |    FROM cd) WHERE rk = 1),
         |res AS (SELECT v.vec_id, r.cell,
         |    list_transform(generate_series(1, 64), i -> v.qv[i] - c.centroid[i]) AS rv
         |  FROM v8 v JOIN route r ON r.vec_id = v.vec_id
         |  JOIN coarse c ON c.cell = r.cell),
         |encd AS (SELECT r.vec_id, r.cell, b.sub, b.code, ${sqd8("r.rv", "b")} AS d2
         |  FROM res r, cb b),
         |codes AS (SELECT vec_id, cell, sub, code FROM (
         |    SELECT vec_id, cell, sub, code,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rk
         |    FROM encd) WHERE rk = 1 AND ($corpusPred)),
         |qprobe AS (SELECT vec_id AS qid, cell FROM (
         |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rk
         |    FROM cd WHERE vec_id < 5) WHERE rk <= 3),
         |qres AS (SELECT p.qid, p.cell,
         |    list_transform(generate_series(1, 64), i -> v.qv[i] - c.centroid[i]) AS rv
         |  FROM qprobe p JOIN v8 v ON v.vec_id = p.qid
         |  JOIN coarse c ON c.cell = p.cell),
         |dtab AS (SELECT r.qid, r.cell, b.sub, b.code, ${sqd8("r.rv", "b")} AS d2
         |  FROM qres r, cb b),
         |scored AS (SELECT dt.qid, c.vec_id AS cid, CAST(SUM(dt.d2) AS BIGINT) AS adist
         |  FROM codes c
         |  JOIN dtab dt ON dt.cell = c.cell AND dt.sub = c.sub AND dt.code = c.code
         |  WHERE c.vec_id <> dt.qid GROUP BY 1, 2),
         |r AS (SELECT qid, cid, adist,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, cid) AS rk FROM scored)
         |SELECT qid, cid, adist, rk FROM r WHERE rk <= 3
         |ORDER BY qid, rk""".stripMargin
  }

  val qIvfPqSearch: GateQuery = GateQuery(
    "q_ivfpq_search",
    ivfPqOracleSql(
      s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_idx_${ProcessHandle.current().pid()}/{SF_BASE}")) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    Pq.searchIvfPq(s, ivfPqIndexDir(s, dir), emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 3, nProbe = 3)
      .orderBy("qid", "rk")
  }

  /** D92 (append phase) — incremental maintenance of the compressed
    * index: built from the even half, the odd half APPENDED against
    * the stored coarse/codebook tables (no retrain, no rewrite, only
    * the new rows' cell directories touched), then probed. The shared
    * replay oracle reads the appended index's models and re-derives
    * the expected result over the WHOLE corpus — rows lost, routed, or
    * encoded inconsistently by the append all break the hash.
    * bench=false: write+append+probe in one wall-clock would muddle
    * the attributable numbers (the q_knn_ivf_append precedent).
    */
  val qIvfPqAppend: GateQuery = {
    val tag = s"graft_ivfpq_app_${ProcessHandle.current().pid()}"
    GateQuery(
      "q_ivfpq_append",
      ivfPqOracleSql(s"${System.getProperty("java.io.tmpdir")}/$tag/{SF_BASE}"),
      bench = false, slow = true) { (s, dir) =>
      val out = s"${System.getProperty("java.io.tmpdir")}/$tag/${new java.io.File(dir).getName}"
      val emb = Tables(s, dir, "embeddings")
      Pq.writeIvfPqIndex(emb.filter(col("vec_id") % 2 === 0), "vec_id",
        "embedding", nLists = 8, m = 8, ksub = 16, dir = out)
      Pq.appendIvfPqIndex(s, out, emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding")
      Pq.searchIvfPq(s, out, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 3, nProbe = 3)
        .orderBy("qid", "rk")
    }
  }

  private val pqRemoveIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** D88b — DELETE from the flat PQ index: the full corpus encoded,
    * quarter-0 removed (staged codes rewrite, codebook untouched —
    * removal never retrains), ADC search == the replay over survivor
    * codes only. A stale code row (deleted vec still ranked) or a
    * survivor lost by the rewrite both break the hash.
    */
  val qPqRemove: GateQuery = {
    val tag = s"graft_pq_rm_idx_${ProcessHandle.current().pid()}"
    GateQuery(
      "q_pq_remove",
      s"""WITH ${pqAdcCtes(
        s"${System.getProperty("java.io.tmpdir")}/$tag/{SF_BASE}",
        corpusPred = "vec_id % 4 <> 0")}
         |SELECT qid, cid, adist, rk FROM r WHERE rk <= 3
         |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val idx = pqRemoveIndexCache.computeIfAbsent(dir, _ => {
        val out = s"${System.getProperty("java.io.tmpdir")}/$tag/${new java.io.File(dir).getName}"
        Pq.writeIndex(emb, "vec_id", "embedding", m = 8, ksub = 16, dir = out)
        Pq.removeDocsFromIndex(s, out,
          emb.filter(col("vec_id") % 4 === 0).select("vec_id"), "vec_id")
        out
      })
      Pq.search(s, idx, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3)
        .orderBy("qid", "rk")
    }
  }

  private val ivfPqRemoveIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** D92b — DELETE from the IVF-PQ index: full corpus indexed,
    * quarter-0 removed by the touched-cell-only partition rewrite
    * (emptied cell dirs dropped; coarse/codebook untouched), probe ==
    * the replay over survivor codes. bench=false: build+remove+probe
    * in one wall-clock (the q_ivfpq_append precedent).
    */
  val qIvfPqRemove: GateQuery = {
    val tag = s"graft_ivfpq_rm_idx_${ProcessHandle.current().pid()}"
    GateQuery(
      "q_ivfpq_remove",
      ivfPqOracleSql(s"${System.getProperty("java.io.tmpdir")}/$tag/{SF_BASE}",
        corpusPred = "vec_id % 4 <> 0"),
      bench = false, slow = true) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val idx = ivfPqRemoveIndexCache.computeIfAbsent(dir, _ => {
        val out = s"${System.getProperty("java.io.tmpdir")}/$tag/${new java.io.File(dir).getName}"
        Pq.writeIvfPqIndex(emb, "vec_id", "embedding",
          nLists = 8, m = 8, ksub = 16, dir = out)
        Pq.removeDocsFromIvfPqIndex(s, out,
          emb.filter(col("vec_id") % 4 === 0).select("vec_id"), "vec_id")
        out
      })
      Pq.searchIvfPq(s, idx, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 3, nProbe = 3)
        .orderBy("qid", "rk")
    }
  }

  /** D88 (write phase) — TIMED codebook train + full-corpus encode to a
    * fresh directory each call (the q_knn_ivf_write split): the gate
    * re-reads the written code table and counts rows + the distinct
    * code alphabet actually used, so the bench number is pure index
    * build and the hash breaks if any row is dropped or a code lands
    * outside [0, ksub).
    */
  val qPqWrite: GateQuery = GateQuery(
    "q_pq_write",
    "SELECT COUNT(*) AS n_rows FROM embeddings") { (s, dir) =>
    val out = java.nio.file.Files.createTempDirectory("graft_pq_write").toString
    Pq.writeIndex(Tables(s, dir, "embeddings"), "vec_id", "embedding",
      m = 8, ksub = 16, dir = out)
    s.read.parquet(s"$out/codes")
      .filter(size(col("codes")) === 8 &&
        forall(col("codes"), c => c >= 0 && c < 16))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** D13 — vector norms and dims (sequential-fold double parity). */
  val qEmbeddingNorm: GateQuery = GateQuery(
    "q_embedding_norm",
    s"""WITH $embCte
       |SELECT vec_id, len(v) AS dim, nrm AS l2_norm
       |FROM n
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    import graft.functions.VectorFunctions._
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .select(col("vec_id"), size(col("v")).as("dim"), l2Norm(col("v")).as("l2_norm"))
      .orderBy("vec_id")
  }

  /** D10 — token counting: whitespace + BPE-ish regex pieces. */
  val qTokenCount: GateQuery = GateQuery(
    "q_token_count",
    """SELECT lang,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_ws_tokens,
      |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+'))) AS BIGINT) AS n_bpe_pieces,
      |  COUNT(*) AS n_docs
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .groupBy("lang")
      .agg(
        sum(size(TextFunctions.tokens(col("text")))).as("n_ws_tokens"),
        sum(size(TextFunctions.roughBpePieces(col("text")))).as("n_bpe_pieces"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")
  }

  /** D9 — quality signals (exact-integer ratios → portable doubles). */
  val qQualityScore: GateQuery = GateQuery(
    "q_quality_score",
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in'))) AS n_stop,
      |  len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct,
      |  CAST(len(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len,
      |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in'))) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
      |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in'))) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE)
      |    - CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) / CAST(len(text) AS DOUBLE)
      |    + CAST(least(len(string_split(text, ' ')), 100) AS DOUBLE) / 100.0 AS quality_score
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val sig = TextFunctions.qualitySignals(col("text"))
    Tables(s, dir, "documents")
      .select(col("doc_id") +: sig.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")
  }

  /** D8 — marker-set language ID. */
  val qLangId: GateQuery = GateQuery(
    "q_lang_id",
    """WITH s AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and'))) AS en_s,
      |    len(list_filter(string_split(text, ' '), w -> w IN ('spark','agg','hash','query','scan'))) AS code_s,
      |    len(list_filter(string_split(text, ' '), w -> w IN ('table','row','column','value'))) AS data_s
      |  FROM documents)
      |SELECT doc_id, CASE
      |  WHEN en_s >= code_s AND en_s >= data_s AND en_s > 0 THEN 'en'
      |  WHEN code_s >= data_s AND code_s > 0 THEN 'code'
      |  WHEN data_s > 0 THEN 'data'
      |  ELSE 'unknown' END AS lang_pred
      |FROM s
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")
  }

  /** D85 — label-quality audit: confusion matrix between the DECLARED
    * lang column and the D8 classifier's prediction, with per-cell
    * counts and the declared-label agreement rate in ppm — the first
    * check against a mislabeled upstream corpus (a declared-vs-
    * predicted disagreement cluster is either a classifier gap or a
    * poisoned label source; both need the matrix, not an accuracy
    * scalar). One scan + one (declared, predicted) aggregate + a
    * broadcast of per-declared totals.
    */
  val qLangConfusion: GateQuery = GateQuery(
    "q_lang_confusion",
    """WITH s AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and'))) AS en_s,
      |    len(list_filter(string_split(text, ' '), w -> w IN ('spark','agg','hash','query','scan'))) AS code_s,
      |    len(list_filter(string_split(text, ' '), w -> w IN ('table','row','column','value'))) AS data_s
      |  FROM documents),
      |p AS (
      |  SELECT lang, CASE
      |    WHEN en_s >= code_s AND en_s >= data_s AND en_s > 0 THEN 'en'
      |    WHEN code_s >= data_s AND code_s > 0 THEN 'code'
      |    WHEN data_s > 0 THEN 'data'
      |    ELSE 'unknown' END AS lang_pred
      |  FROM s),
      |m AS (SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
      |      FROM p GROUP BY 1, 2),
      |t AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS tot FROM m GROUP BY 1)
      |SELECT m.lang, m.lang_pred, m.n,
      |  CAST(m.n * 1000000 // t.tot AS BIGINT) AS cell_ppm
      |FROM m JOIN t USING (lang)
      |ORDER BY lang, lang_pred""".stripMargin) { (s, dir) =>
    val m = Tables(s, dir, "documents")
      .select(col("lang"), TextFunctions.langId(col("text")).as("lang_pred"))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
    val t = m.groupBy("lang").agg(sum("n").as("tot"))
    m.join(broadcast(t), "lang")
      .select(col("lang"), col("lang_pred"), col("n"),
        expr("n * 1000000 div tot").as("cell_ppm"))
      .orderBy("lang", "lang_pred")
  }

  /** D86 — image near-dup clusters: ≥3-of-4 aHash band agreement →
    * transitive closure → min-id cluster per image doc. The oracle
    * recomputes pixels, bands, the band-count pair rule, AND the
    * closure — identical images (the 768-id content period) must
    * land in one cluster. bench=false (recursive-CTE oracle).
    */
  val qImageClusters: GateQuery = GateQuery(
    "q_image_clusters",
    """WITH RECURSIVE img AS (
      |  SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |rp AS (
      |  SELECT i.doc_id, gy.y * 8 + gx.x AS idx,
      |    CAST((i.doc_id + 7 * ((gx.x * i.w) // 8) + 13 * ((gy.y * i.h) // 8)) % 256 AS BIGINT) AS p
      |  FROM img i, generate_series(0, 7) gx(x), generate_series(0, 7) gy(y)),
      |m AS (SELECT doc_id, CAST(SUM(p) // 64 AS BIGINT) AS mean FROM rp GROUP BY 1),
      |bands AS (
      |  SELECT rp.doc_id, CAST(rp.idx // 16 AS BIGINT) AS band,
      |    CAST(SUM(CASE WHEN rp.p > m.mean THEN 1 << (rp.idx % 16) ELSE 0 END) AS BIGINT) AS v
      |  FROM rp JOIN m USING (doc_id) GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      |e AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
      |reach(a, b) AS (
      |  SELECT a, b FROM e
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
      |SELECT i.doc_id,
      |  LEAST(i.doc_id, COALESCE(MIN(r.b), i.doc_id)) AS cluster_id
      |FROM img i LEFT JOIN reach r ON r.a = i.doc_id
      |GROUP BY i.doc_id
      |ORDER BY i.doc_id""".stripMargin,
    bench = false, slow = true) { (s, dir) =>
    graft.multimodal.Multimodal.imageClusters(Tables(s, dir, "documents"))
      .orderBy("doc_id")
  }

  /** D11 — 5-gram min-hash document fingerprint. */
  val qFingerprint: GateQuery = GateQuery(
    "q_fingerprint",
    s"""WITH ${shingleCte(5)}
       |SELECT doc_id, MIN(md5(shingle)) AS fingerprint
       |FROM sh GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ws"))
      .select(col("doc_id"), TextFunctions.fingerprintFromWords(col("ws"), 5).as("fingerprint"))
      .orderBy("doc_id")
  }

  /** D2+ cluster step — connected components over the minhash-LSH
    * near-dup pairs: every doc labeled with the min doc_id of its
    * component (the dedup survivor-election step). Oracle: recursive
    * transitive closure over the same verified pair set.
    */
  val qDedupClusters: GateQuery = GateQuery(
    "q_dedup_clusters",
    s"""WITH RECURSIVE ${shingleCte(3)},
       |${jaccardInterCte(0)},
       |pairs AS (
       |  SELECT d1, d2 FROM inter
       |  JOIN sizes s1 ON s1.doc_id = d1
       |  JOIN sizes s2 ON s2.doc_id = d2
       |  WHERE CAST(n_inter AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_inter AS DOUBLE) >= 0.6),
       |e AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
       |SELECT d.doc_id,
       |  LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS cluster_id
       |FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
       |GROUP BY d.doc_id
       |ORDER BY d.doc_id""".stripMargin,
    bench = false, slow = true) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    // exact-jaccard pairs (same set LSH verifies at threshold 0.6),
    // cached per (JVM, sf-dir) so this gate times the clustering
    val pairs = cachedJaccardPairs(s, dir)
    Components.clusterDocuments(docs, "doc_id", pairs)
      .orderBy("doc_id")
  }

  /** D105 — leakage-safe splits: train/val/test assignment hashed on
    * the near-dup CLUSTER id, so near-duplicates cannot straddle
    * train/test (the eval-contamination hole a per-doc hash split
    * leaves open). Oracle replays clustering (recursive reach CTE,
    * same as q_dedup_clusters) AND the md5-prefix split rule on the
    * cluster id — a doc inheriting the wrong cluster or the hash
    * applied to the doc id instead of the cluster id breaks the hash.
    */
  val qSplitLeakageSafe: GateQuery = GateQuery(
    "q_split_leakage_safe",
    s"""WITH RECURSIVE ${shingleCte(3)},
       |${jaccardInterCte(0)},
       |pairs AS (
       |  SELECT d1, d2 FROM inter
       |  JOIN sizes s1 ON s1.doc_id = d1
       |  JOIN sizes s2 ON s2.doc_id = d2
       |  WHERE CAST(n_inter AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_inter AS DOUBLE) >= 0.6),
       |e AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
       |cl AS (
       |  SELECT d.doc_id,
       |    LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS cluster_id
       |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
       |  GROUP BY d.doc_id)
       |SELECT doc_id, cluster_id,
       |  CASE WHEN substring(md5('7:' || CAST(cluster_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
       |       WHEN substring(md5('7:' || CAST(cluster_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM cl
       |ORDER BY doc_id""".stripMargin,
    bench = false, slow = true) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val pairs = cachedJaccardPairs(s, dir)
    Prep.splitAssignClustered(docs.select("doc_id"), "doc_id", pairs, seed = 7L)
      .select("doc_id", "cluster_id", "split")
      .orderBy("doc_id")
  }

  /** D107 — quality-elected cluster survivors: per near-dup cluster,
    * the member with the best quality score survives (id as the
    * deterministic tie) — production dedup keeps the BEST member, not
    * the min id. Oracle replays clustering, the quality formula, and
    * the election as ROW_NUMBER(score DESC, id ASC) = 1.
    */
  val qSurvivorQuality: GateQuery = GateQuery(
    "q_survivor_quality",
    s"""WITH RECURSIVE ${shingleCte(3)},
       |${jaccardInterCte(0)},
       |pairs AS (
       |  SELECT d1, d2 FROM inter
       |  JOIN sizes s1 ON s1.doc_id = d1
       |  JOIN sizes s2 ON s2.doc_id = d2
       |  WHERE CAST(n_inter AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_inter AS DOUBLE) >= 0.6),
       |e AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
       |cl AS (
       |  SELECT d.doc_id,
       |    LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS cluster_id
       |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
       |  GROUP BY d.doc_id),
       |q AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in'))) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE)
       |      - CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) / CAST(len(text) AS DOUBLE)
       |      + CAST(least(len(string_split(text, ' ')), 100) AS DOUBLE) / 100.0 AS quality_score
       |  FROM documents),
       |ranked AS (
       |  SELECT cl.cluster_id, cl.doc_id, q.quality_score,
       |    COUNT(*) OVER (PARTITION BY cl.cluster_id) AS n_members,
       |    ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
       |                       ORDER BY q.quality_score DESC, cl.doc_id) AS rn
       |  FROM cl JOIN q ON q.doc_id = cl.doc_id)
       |SELECT cluster_id, doc_id, quality_score, n_members
       |FROM ranked WHERE rn = 1
       |ORDER BY cluster_id""".stripMargin,
    bench = false, slow = true) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val pairs = cachedJaccardPairs(s, dir)
    Curate.electSurvivorsByQuality(docs, "doc_id", "text", pairs)
      .orderBy("cluster_id")
  }

  /** D-composition — the full curation flow (exact dedup → near-dup
    * cluster survivors → quality gate) hash-matched against the same
    * composition in SQL.
    */
  val qCurate: GateQuery = GateQuery(
    "q_curate",
    s"""WITH RECURSIVE
       |exact AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |d AS (SELECT * FROM documents WHERE doc_id IN (SELECT doc_id FROM exact)),
       |${shingleCte(3, "d")},
       |${jaccardInterCte(0)},
       |pairs AS (
       |  SELECT d1, d2 FROM inter
       |  JOIN sizes s1 ON s1.doc_id = d1
       |  JOIN sizes s2 ON s2.doc_id = d2
       |  WHERE CAST(n_inter AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_inter AS DOUBLE) >= 0.6),
       |e AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
       |surv AS (
       |  SELECT d.doc_id FROM d LEFT JOIN reach r ON r.a = d.doc_id
       |  GROUP BY d.doc_id
       |  HAVING LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) = d.doc_id)
       |SELECT doc_id,
       |  len(string_split(text, ' ')) AS n_tokens,
       |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in'))) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE)
       |    - CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) / CAST(len(text) AS DOUBLE)
       |    + CAST(least(len(string_split(text, ' ')), 100) AS DOUBLE) / 100.0 AS quality_score
       |FROM d
       |WHERE doc_id IN (SELECT doc_id FROM surv)
       |  AND len(string_split(text, ' ')) >= 10
       |ORDER BY doc_id""".stripMargin,
    bench = false, slow = true) { (s, dir) =>
    Curate.curate(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** D18 — repetition scoring: duplicate 3-gram fraction per document
    * (the boilerplate/looping-text filter from the LM-data-quality
    * literature; docs above a threshold get dropped at curation time).
    */
  val qRepetition: GateQuery = GateQuery(
    "q_repetition",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |t AS (SELECT doc_id, greatest(len(ws) - 2, 0) AS n_ngrams FROM w),
      |idx AS (SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws)-2, 0))) AS i FROM w),
      |d AS (SELECT doc_id, COUNT(DISTINCT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS n_distinct
      |      FROM idx GROUP BY doc_id)
      |SELECT t.doc_id AS doc_id, t.n_ngrams, COALESCE(d.n_distinct, 0) AS n_distinct,
      |  CASE WHEN t.n_ngrams > 0
      |       THEN 1.0 - CAST(COALESCE(d.n_distinct, 0) AS DOUBLE) / CAST(t.n_ngrams AS DOUBLE)
      |       ELSE 0.0 END AS dup_ngram_ratio
      |FROM t LEFT JOIN d ON d.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    val sig = TextFunctions.repetitionSignals(col("ws"), 3)
    Tables(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ws"))
      .select(col("doc_id") +: sig.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")
  }

  /** D19 — PII redaction: emails and digit runs to typed placeholders,
    * with match counts (what a redaction pass reports at scale).
    */
  val qPiiRedact: GateQuery = GateQuery(
    "q_pii_redact",
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(text, '${TextFunctions.emailRe}', '<EMAIL>', 'g'),
       |                 '${TextFunctions.numberRe}', '<NUM>', 'g') AS redacted,
       |  len(regexp_extract_all(text, '${TextFunctions.numberRe}')) AS n_nums
       |FROM documents
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.redactPii(col("text")).as("redacted"),
        size(regexp_extract_all(col("text"), lit(TextFunctions.numberRe), lit(0))).as("n_nums"))
      .orderBy("doc_id")
  }

  /** D12 — multimodal binary-column plumbing. Metadata aggregates are
    * exact; the feature-extraction pass is pinned by the sketch-
    * contract move (q_approx_distinct): the oracle asserts the
    * Dataset round-trip preserved row count and dim and that every
    * norm obeys its [0, sqrt(dim)) bound — TRUE only if the
    * mapPartitions feature pass really covered every payload.
    */
  val qMultimodalMeta: GateQuery = GateQuery(
    "q_multimodal_meta",
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |            WHEN doc_id % 3 = 1 THEN 'audio'
      |            ELSE 'video' END AS modality,
      |  COUNT(*) AS n,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  AVG(doc_id % 640 + 32) AS avg_width,
      |  CAST(16 AS INT) AS min_dim,
      |  CAST(16 AS INT) AS max_dim,
      |  TRUE AS norms_valid
      |FROM documents
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    graft.multimodal.Multimodal.modalitySummary(s, Tables(s, dir, "documents"))
  }

  /** D12b — the media-table metadata layer alone (modality mapping,
    * payload bytes, typed meta struct) IS SQL-expressible — hash-
    * matched so the binary-column schema conventions stay pinned.
    */
  val qMediaMeta: GateQuery = GateQuery(
    "q_media_meta",
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |            WHEN doc_id % 3 = 1 THEN 'audio'
      |            ELSE 'video' END AS modality,
      |  COUNT(*) AS n,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  AVG(doc_id % 640 + 32) AS avg_width,
      |  CAST(MAX(CASE WHEN doc_id % 3 = 2 THEN doc_id % 30 + 1 ELSE 1 END) AS INT) AS max_frames
      |FROM documents
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    graft.multimodal.Multimodal.mediaTable(Tables(s, dir, "documents"), "doc_id", "text")
      .groupBy("modality")
      .agg(count(lit(1)).as("n"),
        sum(length(col("data"))).as("total_bytes"),
        avg(col("meta.width")).as("avg_width"),
        max(col("meta.nFrames")).as("max_frames"))
      .orderBy("modality")
  }

  /** D12c — frame sampling: one row per sampled frame of each video
    * payload (the explode shape). The stub codec decides frame BYTES,
    * but frame COUNTS are pure metadata math — oracle-checkable.
    */
  val qFrameSample: GateQuery = GateQuery(
    "q_frame_sample",
    """SELECT CAST(SUM(LEAST(4, doc_id % 30 + 1)) AS BIGINT) AS n_frames,
      |  COUNT(*) AS n_videos
      |FROM documents
      |WHERE doc_id % 3 = 2""".stripMargin) { (s, dir) =>
    val media = graft.multimodal.Multimodal.mediaTable(
      Tables(s, dir, "documents"), "doc_id", "text")
    graft.multimodal.Multimodal.sampleFrames(media, maxFrames = 4).toDF()
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("doc_id")).as("n_videos"))
  }

  /** D12d — REAL image decode: each image doc becomes a genuine PNG
    * (ImageIO-encoded, pixel = (doc_id + 7x + 13y) mod 256), is
    * decoded back through `javax.imageio`, then nearest-neighbor
    * resized to 8×6 on the decoded raster. The gate emits decoded
    * width/height/channels and both pixel checksums; the oracle
    * recomputes every value from the formula alone (lateral
    * generate_series over pixel coordinates) — it can only hash-match
    * if the codec roundtrip is lossless and the resize index map
    * (src = dst·srcDim/dstDim, integer division) is exact.
    */
  val qImageDecode: GateQuery = GateQuery(
    "q_image_decode",
    """WITH img AS (
      |  SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  -- fixed series + bound filter: DuckDB's generate_series takes
      |  -- no correlated (lateral) arguments; w <= 31, h <= 23 by
      |  -- construction
      |  SELECT i.doc_id,
      |    CAST(SUM((i.doc_id + 7 * gx.x + 13 * gy.y) % 256) AS BIGINT) AS pixel_sum
      |  FROM img i, generate_series(0, 30) gx(x), generate_series(0, 22) gy(y)
      |  WHERE gx.x < i.w AND gy.y < i.h
      |  GROUP BY 1),
      |rs AS (
      |  SELECT i.doc_id,
      |    CAST(SUM((i.doc_id + 7 * ((gx.x * i.w) // 8) + 13 * ((gy.y * i.h) // 6)) % 256) AS BIGINT) AS resized_sum
      |  FROM img i, generate_series(0, 7) gx(x), generate_series(0, 5) gy(y)
      |  GROUP BY 1)
      |SELECT i.doc_id, CAST(i.w AS INT) AS width, CAST(i.h AS INT) AS height,
      |  1 AS channels, px.pixel_sum, rs.resized_sum
      |FROM img i JOIN px USING (doc_id) JOIN rs USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.multimodal.Multimodal.imageDecodeTable(Tables(s, dir, "documents")).toDF()
      .orderBy("doc_id")
  }

  /** D12e — REAL audio decode: each audio doc becomes a genuine WAV
    * clip (encoded through `javax.sound.sampled`, sample =
    * ((doc_id + 37i) mod 65536) − 32768, n = doc_id % 200 + 50), is
    * decoded back through AudioSystem, then nearest-neighbor resampled
    * to 40 samples on the decoded PCM. The gate emits the decoded
    * format fields and both sample checksums; the oracle recomputes
    * every value from the formula alone — it can only hash-match if
    * the WAV roundtrip is lossless and the resample index map
    * (src = dst·n/40, integer division) is exact.
    */
  val qAudioDecode: GateQuery = GateQuery(
    "q_audio_decode",
    """WITH aud AS (
      |  SELECT doc_id, doc_id % 200 + 50 AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |s1 AS (
      |  -- fixed series + bound filter (n <= 249 by construction)
      |  SELECT a.doc_id,
      |    CAST(SUM((a.doc_id + 37 * g.i) % 65536 - 32768) AS BIGINT) AS sample_sum
      |  FROM aud a, generate_series(0, 248) g(i)
      |  WHERE g.i < a.n
      |  GROUP BY 1),
      |s2 AS (
      |  SELECT a.doc_id,
      |    CAST(SUM((a.doc_id + 37 * ((g.i * a.n) // 40)) % 65536 - 32768) AS BIGINT) AS resampled_sum
      |  FROM aud a, generate_series(0, 39) g(i)
      |  GROUP BY 1)
      |SELECT a.doc_id, 16000 AS sample_rate, 1 AS channels,
      |  CAST(a.n AS INT) AS n_samples, s1.sample_sum, s2.resampled_sum
      |FROM aud a JOIN s1 USING (doc_id) JOIN s2 USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.multimodal.Multimodal.audioDecodeTable(Tables(s, dir, "documents")).toDF()
      .orderBy("doc_id")
  }

  /** D72 — audio near-dup fingerprint over REALLY decoded PCM: decode
    * the WAV, nearest-resample to 256 samples, 64 windows × 4 samples
    * of |sample| energy, strict>floor-mean bits packed into four
    * 16-bit LSH bands, plus the band-collision candidate degree. The
    * oracle recomputes resample map, energies, threshold, bit packing,
    * AND the band join from the formula alone — the D43 aHash oracle
    * shape applied to audio.
    */
  val qAudioFprint: GateQuery = GateQuery(
    "q_audio_fprint",
    """WITH aud AS (
      |  SELECT doc_id, doc_id % 200 + 50 AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |rs AS (
      |  SELECT a.doc_id, g.i AS idx,
      |    abs(CAST((a.doc_id + 37 * ((g.i * a.n) // 256)) % 65536 - 32768 AS BIGINT)) AS e
      |  FROM aud a, generate_series(0, 255) g(i)),
      |win AS (SELECT doc_id, CAST(idx // 4 AS BIGINT) AS w, SUM(e) AS energy
      |        FROM rs GROUP BY 1, 2),
      |m AS (SELECT doc_id, CAST(SUM(energy) // 64 AS BIGINT) AS mean
      |      FROM win GROUP BY 1),
      |bands AS (
      |  SELECT win.doc_id, CAST(win.w // 16 AS BIGINT) AS band,
      |    CAST(SUM(CASE WHEN win.energy > m.mean THEN 1 << (win.w % 16) ELSE 0 END) AS BIGINT) AS v
      |  FROM win JOIN m USING (doc_id) GROUP BY 1, 2),
      |deg AS (
      |  SELECT a.doc_id, COUNT(DISTINCT b.doc_id) AS n_cand
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.v = b.v AND a.doc_id <> b.doc_id
      |  GROUP BY 1),
      |pb AS (
      |  SELECT doc_id,
      |    MAX(CASE WHEN band = 0 THEN v END) AS b0,
      |    MAX(CASE WHEN band = 1 THEN v END) AS b1,
      |    MAX(CASE WHEN band = 2 THEN v END) AS b2,
      |    MAX(CASE WHEN band = 3 THEN v END) AS b3
      |  FROM bands GROUP BY 1)
      |SELECT pb.doc_id, CAST(pb.b0 AS INT) AS b0, CAST(pb.b1 AS INT) AS b1,
      |  CAST(pb.b2 AS INT) AS b2, CAST(pb.b3 AS INT) AS b3,
      |  CAST(COALESCE(deg.n_cand, 0) AS BIGINT) AS n_cand
      |FROM pb LEFT JOIN deg USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.multimodal.Multimodal.audioFingerprintCandidates(Tables(s, dir, "documents"))
      .orderBy("doc_id")
  }

  /** D76 — rendezvous (HRW) consistent shard assignment: argmax of
    * md5("seed:shard:id") over shards. The oracle replays all N
    * hashes and the (hash DESC, shard DESC) argmax per doc — the
    * same total order as array_max over (hash, shard) structs.
    */
  val qRendezvous: GateQuery = GateQuery(
    "q_rendezvous",
    """SELECT doc_id, shard FROM (
      |  SELECT d.doc_id, CAST(t.s AS INT) AS shard,
      |    ROW_NUMBER() OVER (PARTITION BY d.doc_id
      |      ORDER BY md5('23:' || CAST(t.s AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) DESC,
      |               t.s DESC) AS rn
      |  FROM documents d, generate_series(0, 7) t(s))
      |WHERE rn = 1
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.operators.ShardExport.rendezvousAssign(
        Tables(s, dir, "documents"), "doc_id", seed = 23L, nShards = 8)
      .orderBy("doc_id")
  }

  /** D12f — REAL video decode: each video doc becomes a genuine GVID
    * container (length-prefixed REAL PNG frames, frame-f pixel =
    * (doc_id + 101f + 7x + 13y) mod 256), is genuinely demuxed,
    * uniform-sampled to ≤4 frames (src = i·n/k, integer division —
    * the audio resampler's index map), and every sampled frame is
    * decoded back through ImageIO to its pixel checksum. The oracle
    * recomputes which source frames the sampler must have picked AND
    * each frame's exact sum from the formula alone — hash-green only
    * if demux, frame selection, and the per-frame codec roundtrip are
    * all bit-exact. Closes the last stubbed modality of D12.
    */
  val qVideoFrames: GateQuery = GateQuery(
    "q_video_frames",
    """WITH vid AS (
      |  SELECT doc_id, doc_id % 16 + 8 AS w, doc_id % 12 + 8 AS h,
      |         doc_id % 30 + 1 AS nf
      |  FROM documents WHERE doc_id % 3 = 2),
      |fr AS (
      |  SELECT v.doc_id, v.w, v.h, g.i AS frame_idx,
      |    CAST((g.i * v.nf) // LEAST(4, v.nf) AS INT) AS src_frame
      |  FROM vid v, generate_series(0, 3) g(i)
      |  WHERE g.i < LEAST(4, v.nf)),
      |px AS (
      |  -- fixed series + bound filter: w <= 23, h <= 19 by construction
      |  SELECT f.doc_id, f.frame_idx, f.src_frame,
      |    CAST(SUM((f.doc_id + 101 * f.src_frame + 7 * gx.x + 13 * gy.y) % 256) AS BIGINT) AS pixel_sum
      |  FROM fr f, generate_series(0, 22) gx(x), generate_series(0, 18) gy(y)
      |  WHERE gx.x < f.w AND gy.y < f.h
      |  GROUP BY 1, 2, 3)
      |SELECT p.doc_id, CAST(p.frame_idx AS INT) AS frame_idx, p.src_frame,
      |  CAST(v.w AS INT) AS width, CAST(v.h AS INT) AS height, p.pixel_sum
      |FROM px p JOIN vid v USING (doc_id)
      |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
    graft.multimodal.Multimodal.videoFrameTable(Tables(s, dir, "documents")).toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** D20 — benchmark decontamination: training docs sharing any
    * distinct 3-gram with the benchmark split (doc_id % 97 == 0 plays
    * the eval set). The benchmark shingle set is broadcast — zero
    * corpus shuffle.
    */
  val qDecontaminate: GateQuery = GateQuery(
    "q_decontaminate",
    s"""WITH ${shingleCte(3)},
       |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
       |SELECT s.doc_id, COUNT(*) AS n_overlap
       |FROM sh s JOIN bench b ON s.shingle = b.shingle
       |WHERE s.doc_id % 97 <> 0
       |GROUP BY s.doc_id
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    Decontaminate.overlap(docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", 3)
      .orderBy("doc_id")
  }

  /** D106 — split-contamination audit: per val/test doc, the distinct
    * 3-gram overlap with the TRAIN split under the plain per-doc hash
    * split (D29's md5 rule, seed 7) — the leakage number D105's
    * clustered split exists to drive to the near-dup floor. Oracle
    * replays shingling, the split CASE, the train distinct-shingle
    * reduction, and the ppm floor.
    */
  val qSplitContamination: GateQuery = GateQuery(
    "q_split_contamination",
    s"""WITH ${shingleCte(3)},
       |spl AS (SELECT doc_id,
       |  CASE WHEN substring(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
       |       WHEN substring(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
       |       ELSE 'test' END AS split
       |  FROM documents),
       |tr AS (SELECT DISTINCT sh.shingle FROM sh JOIN spl USING (doc_id)
       |       WHERE spl.split = 'train'),
       |ev AS (SELECT sh.doc_id, spl.split, sh.shingle
       |       FROM sh JOIN spl USING (doc_id) WHERE spl.split <> 'train'),
       |tot AS (SELECT doc_id, split, COUNT(*) AS n_shingles FROM ev GROUP BY 1, 2),
       |ov AS (SELECT ev.doc_id, COUNT(*) AS n_overlap
       |       FROM ev JOIN tr ON tr.shingle = ev.shingle GROUP BY 1)
       |SELECT t.doc_id, t.split, t.n_shingles,
       |  COALESCE(o.n_overlap, 0) AS n_overlap,
       |  CAST(COALESCE(o.n_overlap, 0) * 1000000 // t.n_shingles AS BIGINT) AS leak_ppm
       |FROM tot t LEFT JOIN ov o USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val splits = Prep.splitAssign(docs.select("doc_id"), "doc_id", seed = 7L)
    Decontaminate.splitContamination(docs, splits, "doc_id", "text", 3)
      .orderBy("doc_id")
  }

  /** D27 — BM25 relevance (query-targeted corpus selection): the
    * term-saturation component in PURE INTEGER arithmetic — with
    * k1 = 6/5, b = 3/4 the factor is rational, and multiplying
    * through by 10·T makes floor(1e6·22·tf·T / (10·T·tf + 3·T +
    * 9·len·N)) bit-identical on every engine. The transcendental idf
    * weight is spec-pinned via Relevance.bm25 (df itself is integer
    * and q_rarity-style exact).
    */
  val qBm25: GateQuery = GateQuery(
    "q_bm25",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS len FROM documents),
      |st AS (SELECT (SELECT COUNT(*) FROM toks) AS t_total,
      |              (SELECT COUNT(*) FROM documents) AS n_docs),
      |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks
      |       WHERE w IN ('join', 'scan', 'window') GROUP BY doc_id, w)
      |SELECT tf.doc_id, CAST(dl.len AS BIGINT) AS n_tokens, COUNT(*) AS n_matched,
      |  CAST(SUM((1000000 * 22 * tf.tf * st.t_total) // (10 * st.t_total * tf.tf + 3 * st.t_total + 9 * dl.len * st.n_docs)) AS BIGINT) AS sat_score
      |FROM tf JOIN dl USING (doc_id), st
      |GROUP BY tf.doc_id, dl.len
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Relevance.bm25SaturationExact(Tables(s, dir, "documents"), "doc_id", "text",
        Seq("join", "scan", "window"))
      .orderBy("doc_id")
  }

  /** D101 — pseudo-relevance-feedback search (RM3 shape): BM25 once,
    * mine the top-10 results for rarity-normalized expansion terms
    * (floor(1e6·fb_tf/corpus_tf), top 5 by weight then term), BM25
    * again with the expansion set, final = 2·orig + exp. The oracle
    * replays BOTH scoring passes, the feedback cut, the expansion
    * term selection (via dynamic IN, no literal list), and the
    * integer mix — a stopword leaking into the expansion set or a
    * drifted second-pass score rewrites many rows.
    */
  val qPrfSearch: GateQuery = GateQuery(
    "q_prf_search",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS len FROM documents),
      |st AS (SELECT (SELECT COUNT(*) FROM toks) AS t_total,
      |              (SELECT COUNT(*) FROM documents) AS n_docs),
      |tf0 AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks
      |        WHERE w IN ('join', 'scan', 'window') GROUP BY doc_id, w),
      |s0 AS (SELECT tf0.doc_id,
      |         CAST(SUM((1000000 * 22 * tf0.tf * st.t_total) // (10 * st.t_total * tf0.tf + 3 * st.t_total + 9 * dl.len * st.n_docs)) AS BIGINT) AS sat
      |       FROM tf0 JOIN dl USING (doc_id), st
      |       GROUP BY tf0.doc_id),
      |fb AS (SELECT doc_id FROM (
      |         SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sat DESC, doc_id) AS rk
      |         FROM s0) WHERE rk <= 10),
      |fbt AS (SELECT w, COUNT(*) AS fb_tf FROM toks
      |        WHERE doc_id IN (SELECT doc_id FROM fb)
      |          AND w NOT IN ('join', 'scan', 'window') AND w <> ''
      |        GROUP BY w),
      |ctf AS (SELECT toks.w, COUNT(*) AS c_tf FROM toks
      |        WHERE toks.w IN (SELECT w FROM fbt) GROUP BY toks.w),
      |expw AS (SELECT fbt.w, CAST(fbt.fb_tf * 1000000 // ctf.c_tf AS BIGINT) AS weight
      |         FROM fbt JOIN ctf ON ctf.w = fbt.w),
      |expt AS (SELECT w FROM (
      |           SELECT w, ROW_NUMBER() OVER (ORDER BY weight DESC, w) AS rk
      |           FROM expw) WHERE rk <= 5),
      |tf1 AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks
      |        WHERE w IN (SELECT w FROM expt) GROUP BY doc_id, w),
      |s1 AS (SELECT tf1.doc_id,
      |         CAST(SUM((1000000 * 22 * tf1.tf * st.t_total) // (10 * st.t_total * tf1.tf + 3 * st.t_total + 9 * dl.len * st.n_docs)) AS BIGINT) AS sat
      |       FROM tf1 JOIN dl USING (doc_id), st
      |       GROUP BY tf1.doc_id)
      |SELECT COALESCE(s0.doc_id, s1.doc_id) AS doc_id,
      |  CAST(COALESCE(s0.sat, 0) AS BIGINT) AS orig_sat,
      |  CAST(COALESCE(s1.sat, 0) AS BIGINT) AS exp_sat,
      |  CAST(COALESCE(s0.sat, 0) * 2 + COALESCE(s1.sat, 0) AS BIGINT) AS final_sat
      |FROM s0 FULL OUTER JOIN s1 ON s1.doc_id = s0.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Relevance.prfExpandedSearch(Tables(s, dir, "documents"), "doc_id", "text",
        Seq("join", "scan", "window"), fbDocs = 10, fbTerms = 5)
      .orderBy("doc_id")
  }

  /** D103 — dimension-truncation recall audit (matryoshka): exact
    * top-5 on the 16- and 32-dim prefixes vs full 64-dim exact top-5,
    * integer recall per (query, dim). The oracle recomputes all three
    * rankings from prefix-slice folds and the hit joins — a truncated
    * distance read off the wrong slice or hits counted against the
    * wrong ground truth break the hash. Sampling IS engaged (the same
    * seeded queryMod = 2 draw as q_ann_recall, replayed by the
    * oracle), exercising the O(sample) audit path a 100 TB corpus
    * needs — each audited query is one corpus pass.
    */
  val qTruncRecall: GateQuery = {
    def dist(d: Int) =
      s"""CAST(list_aggregate(list_transform(generate_series(1, $d),
         |      i -> (q.qv[i] - c.qv[i]) * (q.qv[i] - c.qv[i])), 'sum') AS BIGINT)""".stripMargin
    def tk(dc: String, name: String) =
      s"""$name AS (SELECT qid, cid FROM (
         |  SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY $dc, cid) AS rk
         |  FROM p) WHERE rk <= 5)""".stripMargin
    def audit(d: Int) =
      s"""a$d AS (SELECT t.qid, CAST($d AS INT) AS dim,
         |  CAST(SUM(CASE WHEN f.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |FROM t$d t LEFT JOIN fr f ON f.qid = t.qid AND f.cid = t.cid
         |GROUP BY t.qid)""".stripMargin
    GateQuery(
      "q_trunc_recall",
      s"""WITH v8 AS (SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 256) AS BIGINT)) AS qv
         |  FROM embeddings),
         |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    ${dist(64)} AS df, ${dist(16)} AS d16, ${dist(32)} AS d32
         |  FROM v8 q JOIN v8 c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 10 AND ${hashModSql(42L, "q.vec_id")} % 2 = 0),
         |${tk("df", "fr")},
         |${tk("d16", "t16")},
         |${tk("d32", "t32")},
         |${audit(16)},
         |${audit(32)}
         |SELECT qid, dim, n_hit, CAST(n_hit * 100 // 5 AS BIGINT) AS recall_pct
         |FROM (SELECT * FROM a16 UNION ALL SELECT * FROM a32)
         |ORDER BY qid, dim""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.truncationRecallAudit(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, dims = Seq(16, 32), queryMod = 2)
        .orderBy("qid", "dim")
    }
  }

  /** D100 — hybrid retrieval via reciprocal-rank fusion: the BM25
    * text top-50 and the exact-cosine vector top-50 (query = vec 0,
    * doc_id ≡ vec_id by testdata contract) fuse as
    * Σ floor(10^6/(60+rank)) — the calibration-free merge hybrid
    * search actually ships. The oracle replays BOTH retrievers, both
    * rank windows, the fixed-point fusion, and the fused ranking — a
    * list mis-ranked, a missing single-list doc, or a float fusion
    * all break the hash.
    */
  val qHybridRrf: GateQuery = GateQuery(
    "q_hybrid_rrf",
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS len FROM documents),
       |st AS (SELECT (SELECT COUNT(*) FROM toks) AS t_total,
       |              (SELECT COUNT(*) FROM documents) AS n_docs),
       |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks
       |       WHERE w IN ('join', 'scan', 'window') GROUP BY doc_id, w),
       |ts AS (SELECT tf.doc_id,
       |         CAST(SUM((1000000 * 22 * tf.tf * st.t_total) // (10 * st.t_total * tf.tf + 3 * st.t_total + 9 * dl.len * st.n_docs)) AS BIGINT) AS sat
       |       FROM tf JOIN dl USING (doc_id), st
       |       GROUP BY tf.doc_id),
       |tr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sat DESC, doc_id) AS rank FROM ts),
       |trk AS (SELECT doc_id, rank FROM tr WHERE rank <= 50),
       |$embCte,
       |vs AS (SELECT c.vec_id AS doc_id,
       |         ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
       |       FROM n q JOIN n c ON c.vec_id <> q.vec_id
       |       WHERE q.vec_id = 0),
       |vr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS rank FROM vs),
       |vrk AS (SELECT doc_id, rank FROM vr WHERE rank <= 50),
       |f AS (SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id,
       |        CAST(CASE WHEN t.rank IS NOT NULL THEN 1 ELSE 0 END
       |           + CASE WHEN v.rank IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS n_lists,
       |        CAST(COALESCE(1000000 // (60 + t.rank), 0) + COALESCE(1000000 // (60 + v.rank), 0) AS BIGINT) AS rrf_micro
       |      FROM trk t FULL OUTER JOIN vrk v ON v.doc_id = t.doc_id)
       |SELECT doc_id, n_lists, rrf_micro, rank FROM (
       |  SELECT doc_id, n_lists, rrf_micro,
       |    CAST(ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id) AS INT) AS rank
       |  FROM f)
       |WHERE rank <= 20
       |ORDER BY rank""".stripMargin) { (s, dir) =>
    val wT = org.apache.spark.sql.expressions.Window
      .orderBy(col("sat_score").desc, col("doc_id"))
    val textList = Relevance.bm25SaturationExact(
        Tables(s, dir, "documents"), "doc_id", "text",
        Seq("join", "scan", "window"))
      // rank window runs over query-term-MATCHED docs only (the tf
      // filter bounds it), not the corpus
      .withColumn("rank", row_number().over(wT))
      .filter(col("rank") <= 50)
      .select("doc_id", "rank")
    val emb = Tables(s, dir, "embeddings")
    val vecList = Similarity.knnBruteForce(emb, emb.filter(col("vec_id") === 0),
        "vec_id", "embedding", k = 50)
      .select(col("cid").as("doc_id"), col("rk").as("rank"))
    Relevance.rrfFuse(Seq(textList, vecList), "doc_id", topK = 20)
      .orderBy("rank")
  }

  /** D55 — persisted inverted-index search: build the index, query
    * THROUGH it, and the scores must equal the from-scratch
    * integer-exact BM25 — same oracle as q_bm25, so a routing bug
    * (posting in the wrong bucket), a stale stats row, or a pruned-out
    * posting all break the hash. TextIndexSpec separately pins that
    * the probe reads ONLY the query terms' buckets.
    */
  val qTextSearch: GateQuery = GateQuery(
    "q_text_search",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS len FROM documents),
      |st AS (SELECT (SELECT COUNT(*) FROM toks) AS t_total,
      |              (SELECT COUNT(*) FROM documents) AS n_docs),
      |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks
      |       WHERE w IN ('join', 'scan', 'window') GROUP BY doc_id, w)
      |SELECT tf.doc_id, CAST(dl.len AS BIGINT) AS n_tokens, COUNT(*) AS n_matched,
      |  CAST(SUM((1000000 * 22 * tf.tf * st.t_total) // (10 * st.t_total * tf.tf + 3 * st.t_total + 9 * dl.len * st.n_docs)) AS BIGINT) AS sat_score
      |FROM tf JOIN dl USING (doc_id), st
      |GROUP BY tf.doc_id, dl.len
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import graft.operators.TextIndex
    val idx = java.nio.file.Files.createTempDirectory("graft_textidx").toString
    TextIndex.writeIndex(Tables(s, dir, "documents"), "doc_id", "text", idx)
    TextIndex.searchSaturationExact(s, idx, Seq("join", "scan", "window"))
      .orderBy("doc_id")
  }

  /** D55+ (append phase) — the index is built from HALF the corpus,
    * the other half is APPENDED against the stored bucket modulus and
    * stats (no rebuild), and the search must still equal from-scratch
    * BM25 over the WHOLE corpus — postings lost, double-counted, or
    * mis-bucketed by the append, or a stale stats row, all break the
    * hash. Same oracle as q_bm25/q_text_search.
    */
  val qTextSearchAppend: GateQuery = GateQuery(
    "q_text_search_append",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS len FROM documents),
      |st AS (SELECT (SELECT COUNT(*) FROM toks) AS t_total,
      |              (SELECT COUNT(*) FROM documents) AS n_docs),
      |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks
      |       WHERE w IN ('join', 'scan', 'window') GROUP BY doc_id, w)
      |SELECT tf.doc_id, CAST(dl.len AS BIGINT) AS n_tokens, COUNT(*) AS n_matched,
      |  CAST(SUM((1000000 * 22 * tf.tf * st.t_total) // (10 * st.t_total * tf.tf + 3 * st.t_total + 9 * dl.len * st.n_docs)) AS BIGINT) AS sat_score
      |FROM tf JOIN dl USING (doc_id), st
      |GROUP BY tf.doc_id, dl.len
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import graft.operators.TextIndex
    val docs = Tables(s, dir, "documents")
    val idx = java.nio.file.Files.createTempDirectory("graft_textidx_app").toString
    TextIndex.writeIndex(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
    TextIndex.appendIndex(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", idx)
    TextIndex.searchSaturationExact(s, idx, Seq("join", "scan", "window"))
      .orderBy("doc_id")
  }

  private val textRemoveIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** D55c — DELETE maintenance of the persisted inverted text index:
    * the FULL corpus is indexed, quarter-0 is removed (tombstones
    * record (doc_id, len) so the probe can derive survivor-exact
    * corpus scalars), and the search must equal from-scratch BM25
    * over the survivors — the oracle computes t_total/n_docs over
    * doc_id % 4 <> 0 only, so a probe that keeps scoring deleted
    * postings OR keeps using the pre-delete idf/avgdl scalars breaks
    * the hash.
    */
  val qTextSearchRemove: GateQuery = GateQuery(
    "q_text_search_remove",
    """WITH surv AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0),
      |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM surv),
      |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS len FROM surv),
      |st AS (SELECT (SELECT COUNT(*) FROM toks) AS t_total,
      |              (SELECT COUNT(*) FROM surv) AS n_docs),
      |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks
      |       WHERE w IN ('join', 'scan', 'window') GROUP BY doc_id, w)
      |SELECT tf.doc_id, CAST(dl.len AS BIGINT) AS n_tokens, COUNT(*) AS n_matched,
      |  CAST(SUM((1000000 * 22 * tf.tf * st.t_total) // (10 * st.t_total * tf.tf + 3 * st.t_total + 9 * dl.len * st.n_docs)) AS BIGINT) AS sat_score
      |FROM tf JOIN dl USING (doc_id), st
      |GROUP BY tf.doc_id, dl.len
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import graft.operators.TextIndex
    val docs = Tables(s, dir, "documents")
    val idx = textRemoveIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_text_rm_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      TextIndex.writeIndex(docs, "doc_id", "text", out)
      TextIndex.removeDocs(s, out,
        docs.filter(col("doc_id") % 4 === 0).select("doc_id"), "doc_id")
      out
    })
    TextIndex.searchSaturationExact(s, idx, Seq("join", "scan", "window"))
      .orderBy("doc_id")
  }

  /** D55 COMPACT phase (r14 — the fold the crash-safe rewrite
    * publishes): build the index over the WHOLE corpus, delete the
    * `doc_id % 4 = 0` quarter, then compactIndex — staged survivor
    * rewrite + atomic rename, stats RECOMPUTED from survivors at
    * generation+1, tombstones dropped. The oracle is the identical
    * survivor BM25 as q_text_search_remove: if the fold dropped a
    * survivor posting, kept a tombstoned one, republished a stale
    * staging, or got the recomputed idf/avgdl scalars wrong, the
    * hash breaks. Paired with the remove gate it pins that the
    * tombstone-masked view and the physically-folded layout score
    * IDENTICALLY — the delete is invisible to callers at every
    * lifecycle stage.
    */
  private val textCompactIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  val qTextSearchCompact: GateQuery = GateQuery(
    "q_text_search_compact", qTextSearchRemove.oracle.get) { (s, dir) =>
    import graft.operators.TextIndex
    val docs = Tables(s, dir, "documents")
    val idx = textCompactIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_text_cp_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      TextIndex.writeIndex(docs, "doc_id", "text", out)
      TextIndex.removeDocs(s, out,
        docs.filter(col("doc_id") % 4 === 0).select("doc_id"), "doc_id")
      TextIndex.compactIndex(s, out)
      out
    })
    TextIndex.searchSaturationExact(s, idx, Seq("join", "scan", "window"))
      .orderBy("doc_id")
  }

  /** D56 — token-distribution drift between the even- and odd-id
    * halves of the corpus: per-token ppm rates on each side and the
    * L1 gap, tokens with ≥5 total occurrences. The oracle retallies
    * both sides and replays the integer `div` rates.
    */
  val qTokenDrift: GateQuery = GateQuery(
    "q_token_drift",
    """WITH tok AS (
      |  SELECT doc_id % 2 = 0 AS side, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |c AS (
      |  SELECT w,
      |    CAST(SUM(CASE WHEN side THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
      |    CAST(SUM(CASE WHEN side THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
      |  FROM tok GROUP BY w),
      |t AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS ta,
      |             CAST(SUM(cnt_b) AS BIGINT) AS tb FROM c)
      |SELECT w, cnt_a, cnt_b,
      |  CAST((cnt_a * 1000000) // ta AS BIGINT) AS rate_a_ppm,
      |  CAST((cnt_b * 1000000) // tb AS BIGINT) AS rate_b_ppm,
      |  CAST(abs((cnt_a * 1000000) // ta - (cnt_b * 1000000) // tb) AS BIGINT)
      |    AS drift_ppm
      |FROM c, t WHERE cnt_a + cnt_b >= 5
      |ORDER BY w""".stripMargin) { (s, dir) =>
    graft.operators.CorpusStats.tokenDrift(
        Tables(s, dir, "documents"), "text", col("doc_id") % 2 === 0,
        minCount = 5L)
      .orderBy("w")
  }

  /** D28 — corpus k-means clustering (k=4, 2 Lloyd iterations) over
    * integer-quantized embeddings (floor(x·256) — exact on every
    * engine). Init = the 4 smallest vec_ids; assignment ties break to
    * the lowest cluster; centroid update is truncating BIGINT
    * division. The oracle replays both iterations verbatim as
    * unrolled CTEs — hash-green only if assignments, per-dimension
    * centroid sums, AND the division semantics agree bit-for-bit.
    * A cluster left empty keeps its previous centroid on BOTH sides:
    * the c1/c2 CTEs LEFT JOIN the fresh means onto the previous
    * centroid set and COALESCE, mirroring Clustering.kmeansQuantized's
    * carry-forward rule (which ClusteringSpec pins) instead of
    * silently dropping the cluster from the next assignment round.
    */
  val qKmeans: GateQuery = GateQuery(
    "q_kmeans",
    """WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 256) AS BIGINT)) AS q
      |  FROM embeddings),
      |c0 AS (SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cl, q AS c
      |       FROM q ORDER BY vec_id LIMIT 4),
      |d1 AS (SELECT v.vec_id, c.cl,
      |         list_aggregate(list_transform(generate_series(1, 64),
      |           i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i])), 'sum') AS dist
      |       FROM q v CROSS JOIN c0 c),
      |a1 AS (SELECT vec_id, cl FROM (
      |         SELECT vec_id, cl,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
      |         FROM d1) WHERE rk = 1),
      |s1 AS (SELECT a1.cl, g.i, CAST(SUM(v.q[g.i]) AS BIGINT) AS s, COUNT(*) AS n
      |       FROM a1 JOIN q v USING (vec_id), generate_series(1, 64) g(i)
      |       GROUP BY a1.cl, g.i),
      |n1 AS (SELECT cl, list(CAST(s // n AS BIGINT) ORDER BY i) AS c FROM s1 GROUP BY cl),
      |c1 AS (SELECT c0.cl AS cl, COALESCE(n1.c, c0.c) AS c
      |       FROM c0 LEFT JOIN n1 ON n1.cl = c0.cl),
      |d2 AS (SELECT v.vec_id, c.cl,
      |         list_aggregate(list_transform(generate_series(1, 64),
      |           i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i])), 'sum') AS dist
      |       FROM q v CROSS JOIN c1 c),
      |a2 AS (SELECT vec_id, cl FROM (
      |         SELECT vec_id, cl,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
      |         FROM d2) WHERE rk = 1),
      |s2 AS (SELECT a2.cl, g.i, CAST(SUM(v.q[g.i]) AS BIGINT) AS s, COUNT(*) AS n
      |       FROM a2 JOIN q v USING (vec_id), generate_series(1, 64) g(i)
      |       GROUP BY a2.cl, g.i),
      |n2 AS (SELECT cl, list(CAST(s // n AS BIGINT) ORDER BY i) AS c FROM s2 GROUP BY cl),
      |c2 AS (SELECT c1.cl AS cl, COALESCE(n2.c, c1.c) AS c
      |       FROM c1 LEFT JOIN n2 ON n2.cl = c1.cl),
      |d3 AS (SELECT v.vec_id, c.cl,
      |         list_aggregate(list_transform(generate_series(1, 64),
      |           i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i])), 'sum') AS dist
      |       FROM q v CROSS JOIN c2 c),
      |a3 AS (SELECT vec_id, cl FROM (
      |         SELECT vec_id, cl,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
      |         FROM d3) WHERE rk = 1)
      |SELECT vec_id, CAST(cl AS INT) AS cluster
      |FROM a3
      |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    Clustering.kmeansQuantized(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        k = 4, iters = 2, dim = 64)
      .orderBy("vec_id")
  }

  /** D136 — centroid-refresh churn audit (the decision gate between
    * an E66 refresh and a D7+ IVF rebuild): the (old cluster, new
    * cluster) transition matrix over the corpus, where old = the
    * current centroids (seed, k lowest vec_ids) and new = one exact
    * Lloyd refresh of them. Off-diagonal mass is the rebuild bill —
    * each moved vector is a cell-partition rewrite at index scale.
    * The oracle replays BOTH assignments (same CTEs as q_kmeans's
    * first iteration, then a second argmin against the refreshed
    * centroids) and the transition counts; a drifted component, a
    * broken tie, or a wrong COALESCE for an emptied cluster shifts a
    * cell of the matrix and breaks the hash.
    */
  val qCentroidChurn: GateQuery = GateQuery(
    "q_centroid_churn",
    """WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 256) AS BIGINT)) AS q
      |  FROM embeddings),
      |c0 AS (SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cl, q AS c
      |       FROM q ORDER BY vec_id LIMIT 4),
      |d1 AS (SELECT v.vec_id, c.cl,
      |         list_aggregate(list_transform(generate_series(1, 64),
      |           i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i])), 'sum') AS dist
      |       FROM q v CROSS JOIN c0 c),
      |a1 AS (SELECT vec_id, cl FROM (
      |         SELECT vec_id, cl,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
      |         FROM d1) WHERE rk = 1),
      |s1 AS (SELECT a1.cl, g.i, CAST(SUM(v.q[g.i]) AS BIGINT) AS s, COUNT(*) AS n
      |       FROM a1 JOIN q v USING (vec_id), generate_series(1, 64) g(i)
      |       GROUP BY a1.cl, g.i),
      |n1 AS (SELECT cl, list(CAST(s // n AS BIGINT) ORDER BY i) AS c FROM s1 GROUP BY cl),
      |c1 AS (SELECT c0.cl AS cl, COALESCE(n1.c, c0.c) AS c
      |       FROM c0 LEFT JOIN n1 ON n1.cl = c0.cl),
      |d2 AS (SELECT v.vec_id, c.cl,
      |         list_aggregate(list_transform(generate_series(1, 64),
      |           i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i])), 'sum') AS dist
      |       FROM q v CROSS JOIN c1 c),
      |a2 AS (SELECT vec_id, cl FROM (
      |         SELECT vec_id, cl,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
      |         FROM d2) WHERE rk = 1)
      |SELECT CAST(a1.cl AS INT) AS from_cluster, CAST(a2.cl AS INT) AS to_cluster,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM a1 JOIN a2 USING (vec_id)
      |GROUP BY 1, 2
      |ORDER BY from_cluster, to_cluster""".stripMargin) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings").select("vec_id", "embedding")
    val before = Clustering.centroidsOf(emb, "vec_id", "embedding",
      k = 4, iters = 0, dim = 64)
    val after = Clustering.centroidsOf(emb, "vec_id", "embedding",
      k = 4, iters = 1, dim = 64)
    Clustering.centroidChurn(emb, "vec_id", "embedding", before, after)
      .orderBy("from_cluster", "to_cluster")
  }

  /** D38 — SemDeDup: the oracle replays the ENTIRE composition — the 2
    * unrolled integer-exact Lloyd iterations (same CTEs as q_kmeans),
    * the within-cluster pairwise cosine at threshold 0.3, and the
    * keep-lowest-id survivor rule. A divergence in clustering silently
    * changes which pairs are compared, so the survivor hash only
    * matches if assignment AND similarity agree end to end.
    */
  val qSemanticDedup: GateQuery = GateQuery(
    "q_semantic_dedup",
    s"""WITH $embCte,
      |q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 256) AS BIGINT)) AS q
      |  FROM embeddings),
      |c0 AS (SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cl, q AS c
      |       FROM q ORDER BY vec_id LIMIT 4),
      |d1 AS (SELECT v.vec_id, c.cl,
      |         list_aggregate(list_transform(generate_series(1, 64),
      |           i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i])), 'sum') AS dist
      |       FROM q v CROSS JOIN c0 c),
      |a1 AS (SELECT vec_id, cl FROM (
      |         SELECT vec_id, cl,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
      |         FROM d1) WHERE rk = 1),
      |s1 AS (SELECT a1.cl, g.i, CAST(SUM(v.q[g.i]) AS BIGINT) AS s, COUNT(*) AS n
      |       FROM a1 JOIN q v USING (vec_id), generate_series(1, 64) g(i)
      |       GROUP BY a1.cl, g.i),
      |n1 AS (SELECT cl, list(CAST(s // n AS BIGINT) ORDER BY i) AS c FROM s1 GROUP BY cl),
      |c1 AS (SELECT c0.cl AS cl, COALESCE(n1.c, c0.c) AS c
      |       FROM c0 LEFT JOIN n1 ON n1.cl = c0.cl),
      |d2 AS (SELECT v.vec_id, c.cl,
      |         list_aggregate(list_transform(generate_series(1, 64),
      |           i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i])), 'sum') AS dist
      |       FROM q v CROSS JOIN c1 c),
      |a2 AS (SELECT vec_id, cl FROM (
      |         SELECT vec_id, cl,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
      |         FROM d2) WHERE rk = 1),
      |s2 AS (SELECT a2.cl, g.i, CAST(SUM(v.q[g.i]) AS BIGINT) AS s, COUNT(*) AS n
      |       FROM a2 JOIN q v USING (vec_id), generate_series(1, 64) g(i)
      |       GROUP BY a2.cl, g.i),
      |n2 AS (SELECT cl, list(CAST(s // n AS BIGINT) ORDER BY i) AS c FROM s2 GROUP BY cl),
      |c2 AS (SELECT c1.cl AS cl, COALESCE(n2.c, c1.c) AS c
      |       FROM c1 LEFT JOIN n2 ON n2.cl = c1.cl),
      |d3 AS (SELECT v.vec_id, c.cl,
      |         list_aggregate(list_transform(generate_series(1, 64),
      |           i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i])), 'sum') AS dist
      |       FROM q v CROSS JOIN c2 c),
      |a3 AS (SELECT vec_id, cl FROM (
      |         SELECT vec_id, cl,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
      |         FROM d3) WHERE rk = 1),
      |dropped AS (
      |  SELECT DISTINCT y.vec_id
      |  FROM a3 x JOIN a3 y ON x.cl = y.cl AND x.vec_id < y.vec_id
      |  JOIN n nx ON nx.vec_id = x.vec_id
      |  JOIN n ny ON ny.vec_id = y.vec_id
      |  WHERE ${duckDot("nx.v", "ny.v")} / (nx.nrm * ny.nrm) > 0.3)
      |SELECT a3.vec_id, CAST(a3.cl AS INT) AS cluster
      |FROM a3
      |WHERE a3.vec_id NOT IN (SELECT vec_id FROM dropped)
      |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    Dedup.semanticDedup(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        k = 4, iters = 2, dim = 64, threshold = 0.3)
      .orderBy("vec_id")
  }

  /** D29a — deterministic corpus shuffle with MATERIALIZED positions:
    * the training-order permutation as a pure function of (seed,
    * doc_id) via the portable md5 key. The operator computes the
    * global position WITHOUT a single-partition window (256-way
    * bucket-parallel rank + tiny bucket-offset cumsum); the oracle
    * states the same permutation as one ROW_NUMBER — hash-green iff
    * the two-phase distributed position arithmetic is exactly the
    * global one.
    */
  val qShuffleDet: GateQuery = GateQuery(
    "q_shuffle_det",
    """WITH k AS (
      |  SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      |  FROM documents)
      |SELECT doc_id, shuffle_key,
      |  CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
      |FROM k
      |ORDER BY pos""".stripMargin) { (s, dir) =>
    Prep.shuffleDeterministic(
        Tables(s, dir, "documents").select("doc_id"), "doc_id", seed = 7L)
      .select("doc_id", "shuffle_key", "pos")
      .orderBy("pos")
  }

  /** D29b — hash-based train/val/test assignment: a pure projection on
    * the md5 hex prefix (~90/5/5 at 'e6'/'f3'), so membership is
    * engine- and scale-invariant — the property that keeps eval splits
    * stable when the corpus is rebuilt. Verified per-row, not just as
    * counts.
    */
  val qSplitAssign: GateQuery = GateQuery(
    "q_split_assign",
    """SELECT doc_id,
      |  CASE WHEN substring(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
      |       WHEN substring(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Prep.splitAssign(Tables(s, dir, "documents").select("doc_id"), "doc_id", seed = 7L)
      .select("doc_id", "split")
      .orderBy("doc_id")
  }

  /** D119 — stratified k-fold assignment (k=5 over lang strata): the
    * oracle replays the seeded md5 rank and the mod-k fold rule, so a
    * drifted shuffle key, a wrong tiebreak, or an off-by-one in the
    * rank base reassigns folds and breaks the hash. Exact per-stratum
    * balance (±1) is implied by the construction the hash pins.
    */
  val qKFold: GateQuery = GateQuery(
    "q_kfold",
    """SELECT doc_id, lang,
      |  CAST((ROW_NUMBER() OVER (PARTITION BY lang
      |    ORDER BY md5('11:' || CAST(doc_id AS VARCHAR)), doc_id) - 1) % 5 AS INT) AS fold
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Sampling.stratifiedKFold(Tables(s, dir, "documents"), "doc_id", "lang",
        k = 5, seed = 11L)
      .select("doc_id", "lang", "fold")
      .orderBy("doc_id")
  }

  /** D30 — context-window chunking (window 32, stride 24): the
    * long-document → training-window explode, a pure projection (no
    * shuffle). first/last tokens pin CONTENT alignment — the oracle
    * re-derives them by list indexing, so an off-by-one in either
    * engine's start/length arithmetic breaks the hash.
    */
  val qChunkDocs: GateQuery = GateQuery(
    "q_chunk_docs",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |         len(string_split(text, ' ')) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, g.i AS chunk_idx, g.i * 24 AS start_tok,
      |         LEAST(32, n - g.i * 24) AS n_tok, toks
      |  FROM t, generate_series(0, 15) g(i)
      |  WHERE g.i <= CAST((n - 1) // 24 AS BIGINT))
      |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
      |  CAST(start_tok AS INT) AS start_tok, CAST(n_tok AS INT) AS n_tok,
      |  toks[CAST(start_tok + 1 AS INT)] AS first_tok,
      |  toks[CAST(start_tok + n_tok AS INT)] AS last_tok
      |FROM c
      |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
    Prep.chunkDocs(Tables(s, dir, "documents"), "doc_id", "text",
        window = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx")
  }

  /** D32 — int8 embedding quantization (4× ANN-corpus storage cut):
    * per-vector max-abs scale, q = floor(x·127/scale). Every step is
    * IEEE-identical across engines, so the oracle recomputes the
    * quantized stream and the gate hash-matches its integer digests
    * (sum/min/max per vector) plus the double scale.
    */
  val qEmbedQuant: GateQuery = GateQuery(
    "q_embed_quant",
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |           FROM embeddings),
       |s AS (SELECT vec_id, v,
       |        list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
       |      FROM e),
       |q AS (SELECT vec_id, scale,
       |        CASE WHEN scale = 0
       |             THEN list_transform(v, x -> CAST(0 AS BIGINT))
       |             ELSE list_transform(v, x -> CAST(floor(x * 127 / scale) AS BIGINT))
       |        END AS qv
       |      FROM s)
       |SELECT vec_id, scale,
       |  CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
       |  CAST(list_aggregate(qv, 'min') AS BIGINT) AS q_min,
       |  CAST(list_aggregate(qv, 'max') AS BIGINT) AS q_max
       |FROM q
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    Prep.quantizeInt8(Tables(s, dir, "embeddings"), "vec_id", "embedding")
      .select(col("vec_id"), col("scale"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"))
      .orderBy("vec_id")
  }

  /** D31 — Count-Min heavy-hitter estimation: the mergeable frequency
    * sketch that replaces an exact token groupBy when the vocabulary
    * won't materialize. Partial sketches merge associatively across
    * partitions (one pass, width·depth counters each). Per marker the
    * gate emits the EXACT count (hash-verified) plus the CMS bound
    * contract `exact ≤ est ≤ exact + eps·N` — seed-deterministic, so
    * the contract column is stable (the q_approx_distinct move).
    */
  val qHeavyHitters: GateQuery = GateQuery(
    "q_heavy_hitters",
    """WITH m(token) AS (SELECT unnest(['join', 'scan', 'the'])),
      |toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |t AS (SELECT w, COUNT(*) AS c FROM toks
      |      WHERE w IN ('join', 'scan', 'the') GROUP BY w)
      |SELECT m.token, CAST(COALESCE(t.c, 0) AS BIGINT) AS true_count,
      |  TRUE AS estimate_ok
      |FROM m LEFT JOIN t ON t.w = m.token
      |ORDER BY token""".stripMargin) { (s, dir) =>
    graft.operators.CorpusStats.heavyHitterCheck(
        Tables(s, dir, "documents"), "text", Seq("join", "scan", "the"))
      .orderBy("token")
  }

  /** D135 — CountSketch (Charikar et al. 2002), the SIGNED companion
    * to D31's Count-Min: unbiased estimates whose error scales with
    * the token distribution's L2 norm, and the AMS inner-product
    * structure CM lacks. The whole pipeline is integer md5 arithmetic
    * (deterministic buckets/signs, Long counter sums, odd-depth exact
    * median), so the oracle replays grid construction AND every
    * marker's median estimate VALUE-exactly — no tolerance boolean.
    * An absent marker estimates from whatever collision noise its
    * cells carry, which the oracle reproduces too.
    */
  val qCountSketch: GateQuery = GateQuery(
    "q_count_sketch",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |rs AS (SELECT unnest(generate_series(0, 4)) AS r),
      |cells AS (SELECT r,
      |    ('0x' || substr(md5(w || '#' || CAST(r AS VARCHAR) || 'b'), 1, 12))::BIGINT % 256 AS bucket,
      |    CASE WHEN ('0x' || substr(md5(w || '#' || CAST(r AS VARCHAR) || 's'), 1, 12))::BIGINT % 2 = 0
      |         THEN -1 ELSE 1 END AS sign
      |  FROM toks CROSS JOIN rs),
      |grid AS (SELECT r, bucket, CAST(SUM(sign) AS BIGINT) AS c
      |         FROM cells GROUP BY r, bucket),
      |m(token) AS (SELECT unnest(['join', 'scan', 'the', 'zz_absent_marker'])),
      |probes AS (SELECT token, r,
      |    ('0x' || substr(md5(token || '#' || CAST(r AS VARCHAR) || 'b'), 1, 12))::BIGINT % 256 AS bucket,
      |    CASE WHEN ('0x' || substr(md5(token || '#' || CAST(r AS VARCHAR) || 's'), 1, 12))::BIGINT % 2 = 0
      |         THEN -1 ELSE 1 END AS sign
      |  FROM m CROSS JOIN rs),
      |sv AS (SELECT p.token, COALESCE(g.c, 0) * p.sign AS sv
      |       FROM probes p LEFT JOIN grid g ON g.r = p.r AND g.bucket = p.bucket),
      |med AS (SELECT token, sv, row_number() OVER (PARTITION BY token ORDER BY sv) AS rn
      |        FROM sv),
      |ex AS (SELECT w AS token, CAST(COUNT(*) AS BIGINT) AS true_count FROM toks
      |       WHERE w IN ('join', 'scan', 'the', 'zz_absent_marker') GROUP BY w)
      |SELECT m.token, CAST(COALESCE(ex.true_count, 0) AS BIGINT) AS true_count,
      |  CAST(med.sv AS BIGINT) AS cs_est
      |FROM m JOIN med ON med.token = m.token AND med.rn = 3
      |LEFT JOIN ex ON ex.token = m.token
      |ORDER BY m.token""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.functions.broadcast
    val markers = Seq("join", "scan", "the", "zz_absent_marker")
    val toks = Tables(s, dir, "documents")
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
    val grid = graft.operators.Sketches.countSketchGrid(toks, "w", 256, 5)
    val est = graft.operators.Sketches.countSketchEstimates(grid, markers, 256, 5)
    val exact = toks.filter(col("w").isin(markers: _*))
      .groupBy(col("w").as("token")).agg(count(lit(1)).as("true_count"))
    import s.implicits._
    // hints on the BUILD sides: the left (preserved) side of a left
    // outer join cannot broadcast, so the hint belongs on the
    // marker-bounded aggregates
    markers.toDF("token")
      .join(broadcast(exact), Seq("token"), "left")
      .join(broadcast(est), Seq("token"))
      .select(col("token"), coalesce(col("true_count"), lit(0L)).as("true_count"),
        col("cs_est"))
      .orderBy("token")
  }

  /** D135b — AMS inner product from two CountSketch grids (Alon,
    * Matias & Szegedy STOC'96; CountSketch rows ARE tug-of-war
    * atoms): the shared-vocabulary mass Σ f(w)·g(w) between two
    * corpus slices, estimated from two kilobyte grids instead of a
    * vocabulary join — the cross-slice overlap statistic CM and KMV
    * cannot give. Fully integer md5 arithmetic again, so the oracle
    * replays BOTH grids, the per-row bucket products, the median, and
    * the exact inner product.
    */
  val qCsInner: GateQuery = GateQuery(
    "q_cs_inner",
    """WITH ta AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents WHERE doc_id % 2 = 0),
      |tb AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents WHERE doc_id % 2 = 1),
      |rs AS (SELECT unnest(generate_series(0, 4)) AS r),
      |ca AS (SELECT r,
      |    ('0x' || substr(md5(w || '#' || CAST(r AS VARCHAR) || 'b'), 1, 12))::BIGINT % 256 AS bucket,
      |    CASE WHEN ('0x' || substr(md5(w || '#' || CAST(r AS VARCHAR) || 's'), 1, 12))::BIGINT % 2 = 0
      |         THEN -1 ELSE 1 END AS sign
      |  FROM ta CROSS JOIN rs),
      |ga AS (SELECT r, bucket, CAST(SUM(sign) AS BIGINT) AS c FROM ca GROUP BY r, bucket),
      |cb AS (SELECT r,
      |    ('0x' || substr(md5(w || '#' || CAST(r AS VARCHAR) || 'b'), 1, 12))::BIGINT % 256 AS bucket,
      |    CASE WHEN ('0x' || substr(md5(w || '#' || CAST(r AS VARCHAR) || 's'), 1, 12))::BIGINT % 2 = 0
      |         THEN -1 ELSE 1 END AS sign
      |  FROM tb CROSS JOIN rs),
      |gb AS (SELECT r, bucket, CAST(SUM(sign) AS BIGINT) AS c FROM cb GROUP BY r, bucket),
      |prod AS (SELECT ga.r, CAST(SUM(ga.c * gb.c) AS BIGINT) AS ip
      |         FROM ga JOIN gb ON gb.r = ga.r AND gb.bucket = ga.bucket GROUP BY ga.r),
      |allr AS (SELECT rs.r, CAST(COALESCE(prod.ip, 0) AS BIGINT) AS ip
      |         FROM rs LEFT JOIN prod ON prod.r = rs.r),
      |med AS (SELECT ip, row_number() OVER (ORDER BY ip) AS rn FROM allr),
      |xa AS (SELECT w, COUNT(*) AS n FROM ta GROUP BY w),
      |xb AS (SELECT w, COUNT(*) AS n FROM tb GROUP BY w),
      |ex AS (SELECT CAST(COALESCE(SUM(xa.n * xb.n), 0) AS BIGINT) AS exact_inner
      |       FROM xa JOIN xb ON xb.w = xa.w)
      |SELECT ex.exact_inner, CAST(med.ip AS BIGINT) AS inner_est
      |FROM ex, med WHERE med.rn = 3""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.functions.broadcast
    val docs = Tables(s, dir, "documents")
    def toks(side: Int) = docs.filter(pmod(col("doc_id"), lit(2)) === side)
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
    val ga = graft.operators.Sketches.countSketchGrid(toks(0), "w", 256, 5)
    val gb = graft.operators.Sketches.countSketchGrid(toks(1), "w", 256, 5)
    val est = graft.operators.Sketches.countSketchInner(ga, gb, 5)
    val xa = toks(0).groupBy("w").agg(count(lit(1)).as("na"))
    val xb = toks(1).groupBy("w").agg(count(lit(1)).as("nb"))
    val ex = xa.join(xb, "w")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("exact_inner"))
    ex.crossJoin(broadcast(est))
      .select(col("exact_inner"), col("inner_est"))
  }

  /** D135c — CountSketch heavy-hitter TOP-K (the algorithm of
    * Charikar et al. 2002 §1, CS + candidate heap, batched — closing
    * the D31/D111/D135 frequency family's estimate→extract loop): the
    * vocabulary is scored by CS median against the broadcast kilobyte
    * grid, the top k by (estimate DESC, token ASC) survive, and the
    * bounded survivor set is exactly recounted. All integer md5
    * arithmetic, so the oracle replays grid, scores, ranking,
    * tie-breaks AND exact counts value-exactly — and rides D111's
    * exact-heavy-hitter shape as the semantic cross-check: every
    * true_count here is what the plain GROUP BY would say.
    */
  val qCsTopK: GateQuery = GateQuery(
    "q_cs_topk",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |rs AS (SELECT unnest(generate_series(0, 4)) AS r),
      |cells AS (SELECT r,
      |    ('0x' || substr(md5(w || '#' || CAST(r AS VARCHAR) || 'b'), 1, 12))::BIGINT % 256 AS bucket,
      |    CASE WHEN ('0x' || substr(md5(w || '#' || CAST(r AS VARCHAR) || 's'), 1, 12))::BIGINT % 2 = 0
      |         THEN -1 ELSE 1 END AS sign
      |  FROM toks CROSS JOIN rs),
      |grid AS (SELECT r, bucket, CAST(SUM(sign) AS BIGINT) AS c
      |         FROM cells GROUP BY r, bucket),
      |vocab AS (SELECT DISTINCT w FROM toks),
      |probes AS (SELECT w, r,
      |    ('0x' || substr(md5(w || '#' || CAST(r AS VARCHAR) || 'b'), 1, 12))::BIGINT % 256 AS bucket,
      |    CASE WHEN ('0x' || substr(md5(w || '#' || CAST(r AS VARCHAR) || 's'), 1, 12))::BIGINT % 2 = 0
      |         THEN -1 ELSE 1 END AS sign
      |  FROM vocab CROSS JOIN rs),
      |sv AS (SELECT p.w, COALESCE(g.c, 0) * p.sign AS sv
      |       FROM probes p LEFT JOIN grid g ON g.r = p.r AND g.bucket = p.bucket),
      |med AS (SELECT w, sv, row_number() OVER (PARTITION BY w ORDER BY sv) AS rn
      |        FROM sv),
      |est AS (SELECT w, CAST(sv AS BIGINT) AS cs_est FROM med WHERE rn = 3),
      |cand AS (SELECT * FROM (
      |    SELECT w, cs_est,
      |      CAST(row_number() OVER (ORDER BY cs_est DESC, w) AS INTEGER) AS rank
      |    FROM est) WHERE rank <= 8),
      |ex AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS true_count FROM toks
      |       WHERE w IN (SELECT w FROM cand) GROUP BY w)
      |SELECT cand.w AS token, cand.cs_est,
      |  CAST(COALESCE(ex.true_count, 0) AS BIGINT) AS true_count, cand.rank
      |FROM cand LEFT JOIN ex ON ex.w = cand.w
      |ORDER BY rank""".stripMargin) { (s, dir) =>
    graft.operators.Sketches.countSketchTopK(
        Tables(s, dir, "documents")
          .select(explode(TextFunctions.tokens(col("text"))).as("w")),
        "w", 256, 5, 8)
      .orderBy("rank")
  }

  /** D111 — two-pass EXACT heavy hitters: sketch-filtered candidate
    * occurrences, exactly counted — the result must equal a plain
    * GROUP BY HAVING (the oracle IS that plain form; a sketch that
    * dropped a true heavy hitter, a filter that passed per-occurrence
    * inconsistently, or a final threshold off by one all break the
    * hash). Threshold = 0.1% of the token stream, re-derived by both
    * engines.
    */
  val qHeavyExact: GateQuery = GateQuery(
    "q_heavy_exact",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |thr AS (SELECT CAST(COUNT(*) // 1000 AS BIGINT) AS mc FROM toks)
      |SELECT w AS token, COUNT(*) AS n
      |FROM toks GROUP BY w
      |HAVING COUNT(*) >= (SELECT mc FROM thr)
      |ORDER BY token""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val total = docs.agg(
      sum(size(TextFunctions.tokens(col("text"))))).collect()(0).getLong(0)
    graft.operators.CorpusStats.exactHeavyHitters(docs, "text",
        minCount = total / 1000)
      .orderBy("token")
  }

  /** D57 — persisted mergeable HLL sketches: built per shard, merged
    * from the sketch TABLE at query time. The oracle replays the
    * exact distinct; the sketch estimate rides as a contract boolean
    * (the q_heavy_hitters pattern — drift flips it, hash breaks).
    */
  val qHllDistinct: GateQuery = GateQuery(
    "q_hll_distinct",
    """SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact,
      |  TRUE AS estimate_ok
      |FROM documents""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
      .select((col("doc_id") % 8).as("shard"),
        md5(col("text").cast("binary")).as("h"))
    val out = java.nio.file.Files.createTempDirectory("graft_hll").toString
    graft.operators.Sketches.cardinalityCheck(docs, "h", "shard", s"$out/sk")
  }

  /** D134 — KMV (bottom-k) distinct sketch per event_type over
    * user_id: unlike HLL (D57, tolerance-boolean gate by necessity —
    * DataSketches bytes are insertion-order-sensitive), the KMV
    * sketch is a pure function of the value set, so the ESTIMATE
    * itself is pinned bit-for-bit: the oracle recomputes the k
    * smallest 48-bit md5 hashes per group and replays the
    * (k−1)·2^48 div h_(k) estimator in integer arithmetic. Groups
    * under k distinct users report exactly.
    */
  // k = 64: small enough that the verification SFs actually ENGAGE
  // the kth-minimum estimator (sf0.01 has ~150 distinct users per
  // type — k=256 would reduce every group to the exact-count branch
  // and the gate would never exercise the division), large enough
  // that sf0.001 still covers the exact branch
  private val kmvK = 64
  private val kmvSketchSql =
    s"""dh AS (SELECT DISTINCT event_type AS g,
       |        ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
       |      FROM events),
       |rk AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
       |       FROM dh)""".stripMargin

  val qKmvDistinct: GateQuery = GateQuery(
    "q_kmv_distinct",
    s"""WITH $kmvSketchSql,
       |sk AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_sk, MAX(h) AS kth
       |       FROM rk WHERE rn <= $kmvK GROUP BY g),
       |ex AS (SELECT event_type AS g, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
       |       FROM events GROUP BY 1)
       |SELECT sk.g AS event_type, ex.n_exact, sk.n_sk,
       |  CAST(CASE WHEN sk.n_sk < $kmvK THEN sk.n_sk
       |       ELSE CAST((${(kmvK - 1).toLong * (1L << 48)} // GREATEST(sk.kth, 1)) AS BIGINT) END AS BIGINT) AS kmv_est
       |FROM sk JOIN ex ON ex.g = sk.g
       |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events")
    val sk = graft.operators.Sketches.kmvSketch(ev, "event_type", "user_id", kmvK)
    val exact = ev.groupBy(col("event_type").as("g"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    graft.operators.Sketches.kmvEstimate(sk, kmvK)
      .join(exact, "g")
      .select(col("g").as("event_type"), col("n_exact"), col("n_sk"), col("kmv_est"))
      .orderBy("event_type")
  }

  /** D134 set-operation phase — the capability HLL lacks: per
    * event_type PAIR, union and intersection distinct-user estimates
    * from the sketches alone (k smallest of the merged sketches;
    * Beyer et al.'s n_both·est_union div k ratio estimator), next to
    * the exact values so the error is measured in-engine, never
    * asserted. Cost is |pairs|·k sketch rows — the corpus is touched
    * once, at sketch-build time.
    */
  val qKmvSetops: GateQuery = GateQuery(
    "q_kmv_setops",
    s"""WITH $kmvSketchSql,
       |sk AS (SELECT g, h FROM rk WHERE rn <= $kmvK),
       |gs AS (SELECT DISTINCT g FROM sk),
       |pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
       |m AS (SELECT p.ga, p.gb, s.h, COUNT(DISTINCT s.g) AS n_src
       |      FROM pairs p JOIN sk s ON s.g = p.ga OR s.g = p.gb
       |      GROUP BY p.ga, p.gb, s.h),
       |mr AS (SELECT ga, gb, h, n_src,
       |         row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn FROM m),
       |u AS (SELECT ga, gb, CAST(COUNT(*) AS BIGINT) AS n_u, MAX(h) AS kth,
       |        CAST(SUM(CASE WHEN n_src = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_both
       |      FROM mr WHERE rn <= $kmvK GROUP BY ga, gb),
       |est AS (SELECT ga, gb, n_u, n_both,
       |          CAST(CASE WHEN n_u < $kmvK THEN n_u
       |               ELSE CAST((${(kmvK - 1).toLong * (1L << 48)} // GREATEST(kth, 1)) AS BIGINT) END AS BIGINT) AS est_union
       |        FROM u),
       |tu AS (SELECT DISTINCT event_type AS g, user_id FROM events),
       |xi AS (SELECT p.ga, p.gb, CAST(COUNT(*) AS BIGINT) AS exact_inter
       |       FROM pairs p JOIN tu a ON a.g = p.ga JOIN tu b ON b.g = p.gb AND b.user_id = a.user_id
       |       GROUP BY p.ga, p.gb),
       |xn AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM tu GROUP BY g)
       |SELECT est.ga AS type_a, est.gb AS type_b, est.n_u, est.n_both, est.est_union,
       |  CAST(CASE WHEN est.n_u < $kmvK THEN est.n_both
       |       ELSE CAST((est.est_union // $kmvK) * est.n_both AS BIGINT)
       |            + CAST(((est.est_union % $kmvK) * est.n_both) // $kmvK AS BIGINT) END AS BIGINT) AS est_inter,
       |  CAST(na.n + nb.n - COALESCE(xi.exact_inter, 0) AS BIGINT) AS exact_union,
       |  CAST(COALESCE(xi.exact_inter, 0) AS BIGINT) AS exact_inter
       |FROM est
       |JOIN xn na ON na.g = est.ga JOIN xn nb ON nb.g = est.gb
       |LEFT JOIN xi ON xi.ga = est.ga AND xi.gb = est.gb
       |ORDER BY type_a, type_b""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events")
    val sk = graft.operators.Sketches.kmvSketch(ev, "event_type", "user_id", kmvK)
    val est = graft.operators.Sketches.kmvSetEstimates(sk, kmvK)
    val tu = ev.select(col("event_type").as("g"), col("user_id")).distinct()
      .localCheckpoint()
    val xn = tu.groupBy("g").agg(count(lit(1)).as("n"))
    val xi = tu.as("a").join(tu.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("ga"), col("b.g").as("gb"))
      .agg(count(lit(1)).as("exact_inter"))
    est
      .join(xn.select(col("g").as("ga"), col("n").as("na")), "ga")
      .join(xn.select(col("g").as("gb"), col("n").as("nb")), "gb")
      .join(xi, Seq("ga", "gb"), "left")
      .select(col("ga").as("type_a"), col("gb").as("type_b"),
        col("n_u"), col("n_both"), col("est_union"), col("est_inter"),
        (col("na") + col("nb") - coalesce(col("exact_inter"), lit(0L))).as("exact_union"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
      .orderBy("type_a", "type_b")
  }

  /** D134 persisted-shard phase — the D57 shard-table discipline with
    * EXACT estimates: three per-shard bottom-k writes (the third an
    * APPEND after the first estimate could already have been served),
    * then the all-shards AND a two-shard-subset estimate from the
    * sketch table alone. The oracle recomputes both straight from the
    * raw corpus, so the gate pins the bottom-k-of-union merge
    * identity: a shard row lost, duplicated, or merged at the wrong k
    * shifts an estimate.
    */
  private val kmvShardDirCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  val qKmvShards: GateQuery = GateQuery(
    "q_kmv_shards",
    s"""WITH dh AS (SELECT DISTINCT event_type AS g, user_id % 3 AS shard,
       |        ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
       |      FROM events),
       |rka AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
       |        FROM (SELECT DISTINCT g, h FROM dh)),
       |ska AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_all, MAX(h) AS kth
       |        FROM rka WHERE rn <= $kmvK GROUP BY g),
       |rks AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
       |        FROM (SELECT DISTINCT g, h FROM dh WHERE shard < 2)),
       |sks AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_01, MAX(h) AS kth
       |        FROM rks WHERE rn <= $kmvK GROUP BY g)
       |SELECT ska.g AS event_type,
       |  CAST(CASE WHEN ska.n_all < $kmvK THEN ska.n_all
       |       ELSE CAST((${(kmvK - 1).toLong * (1L << 48)} // GREATEST(ska.kth, 1)) AS BIGINT) END AS BIGINT) AS est_all,
       |  CAST(CASE WHEN sks.n_01 < $kmvK THEN sks.n_01
       |       ELSE CAST((${(kmvK - 1).toLong * (1L << 48)} // GREATEST(sks.kth, 1)) AS BIGINT) END AS BIGINT) AS est_01
       |FROM ska JOIN sks ON sks.g = ska.g
       |ORDER BY event_type""".stripMargin) { (s, dir) =>
    import graft.operators.Sketches
    val table = kmvShardDirCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_kmv_shards_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      val ev = Tables(s, dir, "events")
      for (sh <- 0 to 2)
        Sketches.writeKmvShard(ev.filter(col("user_id") % 3 === sh),
          "event_type", "user_id", kmvK, out, sh.toString)
      out
    })
    Sketches.kmvEstimateFromShards(s, table)
      .select(col("g"), col("kmv_est").as("est_all"))
      .join(Sketches.kmvEstimateFromShards(s, table, Some(Seq("0", "1")))
        .select(col("g"), col("kmv_est").as("est_01")), "g")
      .select(col("g").as("event_type"), col("est_all"), col("est_01"))
      .orderBy("event_type")
  }

  /** D65 — persisted mergeable histogram sketch for quantiles: per-
    * shard (shard, bin, cnt) rows written to disk (two separate
    * appends prove merge-associativity on the COMMITTED table), then
    * p50/p90/p99 of n_chars answered from the sketch alone. Exact at
    * bin resolution — the oracle replays bins + ceiling-rank cumsum
    * over the raw table, which equals the sketch answer by algebra.
    */
  val qQuantileSketch: GateQuery = GateQuery(
    "q_quantile_sketch",
    """WITH b AS (SELECT CAST(n_chars // 64 AS BIGINT) AS bin, COUNT(*) AS cnt
      |           FROM documents GROUP BY 1),
      |c AS (SELECT bin, cnt, SUM(cnt) OVER (ORDER BY bin) AS cum FROM b),
      |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM b),
      |p AS (SELECT unnest([50, 90, 99]) AS pct)
      |SELECT CAST(pct AS BIGINT) AS pct, CAST(MIN(bin) AS BIGINT) AS bin,
      |  CAST(MIN(bin) * 64 AS BIGINT) AS lo,
      |  CAST((MIN(bin) + 1) * 64 AS BIGINT) AS hi, total
      |FROM p CROSS JOIN t
      |JOIN c ON c.cum >= CAST((pct * total + 99) // 100 AS BIGINT)
      |GROUP BY pct, total
      |ORDER BY pct""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
      .select((col("doc_id") % 8).as("shard"), col("n_chars"))
    val out = java.nio.file.Files.createTempDirectory("graft_histsk").toString
    // two appends = two independent shard batches on disk
    graft.operators.Sketches.writeHistogramSketch(
      docs.filter(col("shard") < 4), "n_chars", "shard", s"$out/sk", 64L)
    graft.operators.Sketches.writeHistogramSketch(
      docs.filter(col("shard") >= 4), "n_chars", "shard", s"$out/sk", 64L)
    graft.operators.Sketches.quantilesFromSketch(s, s"$out/sk", 64L, Seq(50, 90, 99))
      .orderBy("pct")
  }

  /** D26 — corpus-rarity profile: document frequencies from one
    * corpus pass, joined back per document. Integer outputs only
    * (sum/min of dfs, distinct counts) — exact on every engine.
    */
  val qRarity: GateQuery = GateQuery(
    "q_rarity",
    """WITH w AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
      |           FROM documents),
      |df AS (SELECT w, COUNT(*) AS df FROM w GROUP BY w)
      |SELECT doc_id, COUNT(*) AS n_distinct_words,
      |  CAST(SUM(df) AS BIGINT) AS sum_df, MIN(df) AS min_df
      |FROM w JOIN df USING (w)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.operators.CorpusStats
      .rarityScores(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** D24 — incremental dedup: the odd-id half of the corpus arrives
    * as a new batch and is curated against the even-id half's hash
    * index — corpus-known content dropped, then keep-first within the
    * batch. The anti-join touches only fixed-width hashes.
    */
  val qDedupIncremental: GateQuery = GateQuery(
    "q_dedup_incremental",
    """WITH cor AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
      |b AS (SELECT doc_id, lang, md5(text) AS content_hash
      |      FROM documents WHERE doc_id % 2 = 1),
      |s AS (SELECT doc_id, lang, content_hash FROM b
      |      WHERE content_hash NOT IN (SELECT h FROM cor)
      |        AND doc_id = (SELECT MIN(b2.doc_id) FROM b b2
      |                      WHERE b2.content_hash = b.content_hash))
      |SELECT doc_id, lang, content_hash FROM s
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    Dedup.incremental(
        docs.filter(col("doc_id") % 2 === 1).select("doc_id", "lang", "text"),
        Dedup.corpusHashIndex(docs.filter(col("doc_id") % 2 === 0), "text"),
        "doc_id", "text")
      .select("doc_id", "lang", "content_hash")
      .orderBy("doc_id")
  }

  /** D51 — Bloom-prefiltered incremental dedup: same semantics as
    * q_dedup_incremental on a different corpus/batch split (thirds,
    * so both gates stay independently diagnostic). The oracle replays
    * the EXACT contract — the bloom is an internal prefilter whose
    * false positives are removed by exact verification and whose
    * false negatives cannot occur, so it must never show in the
    * result.
    */
  val qDedupBloom: GateQuery = GateQuery(
    "q_dedup_bloom",
    """WITH cor AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 3 = 0),
      |b AS (SELECT doc_id, lang, md5(text) AS content_hash
      |      FROM documents WHERE doc_id % 3 <> 0),
      |s AS (SELECT doc_id, lang, content_hash FROM b
      |      WHERE content_hash NOT IN (SELECT h FROM cor)
      |        AND doc_id = (SELECT MIN(b2.doc_id) FROM b b2
      |                      WHERE b2.content_hash = b.content_hash))
      |SELECT doc_id, lang, content_hash FROM s
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    // expectedItems sized to the corpus: the filter bytes ride the
    // probe plan as a literal, so a defaulted 1M-item filter (~900 KB)
    // would tax codegen for a 500-hash index
    Dedup.bloomIncremental(
        docs.filter(col("doc_id") % 3 =!= 0).select("doc_id", "lang", "text"),
        Dedup.corpusHashIndex(docs.filter(col("doc_id") % 3 === 0), "text"),
        "doc_id", "text", expectedItems = 10000L)
      .select("doc_id", "lang", "content_hash")
      .orderBy("doc_id")
  }

  private val mergeBaseDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  /** D52 — keyed MERGE (upsert) into a shard-partitioned parquet
    * table: updates (uppercased text for every doc_id % 3 == 0) and
    * inserts (doc_id + 10M clones of every doc_id % 5 == 2) land via
    * MergeUpsert.upsertPartitioned, then the gate reads the COMMITTED
    * table back — so the hash pins replace-by-key, insert, survivor
    * base rows, AND the dynamic-overwrite commit itself. The oracle
    * replays the merge relationally (batch ∪ base-not-in-batch).
    */
  val qMergeUpsert: GateQuery = GateQuery(
    "q_merge_upsert",
    """WITH base AS (SELECT doc_id, doc_id % 8 AS shard, text FROM documents),
      |batch AS (
      |  SELECT doc_id, doc_id % 8 AS shard, upper(text) AS text
      |  FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id + 10000000, (doc_id + 10000000) % 8, text
      |  FROM documents WHERE doc_id % 5 = 2),
      |m AS (
      |  SELECT * FROM batch
      |  UNION ALL
      |  SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM batch))
      |SELECT doc_id, CAST(shard AS BIGINT) AS shard, md5(text) AS content_hash
      |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"), col("text"))
    // base laid out compact (one file per shard), staged ONCE per
    // source dir — the gate measures the upsert, not the setup write.
    // Re-running the gate upserts the same batch onto the merged
    // table, which is idempotent by construction (MergeUpsertSpec
    // pins replay), so bench reps after the first time the upsert
    // alone and Verify's single run is unaffected.
    val path = mergeBaseDirs.getOrElseUpdate(dir, {
      val p = java.nio.file.Files.createTempDirectory("graft_merge").toString
      docs.repartition(8, col("shard"))
        .write.mode("overwrite").partitionBy("shard").parquet(p)
      p
    })
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .withColumn("text", upper(col("text")))
      .unionByName(docs.filter(col("doc_id") % 5 === 2)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          ((col("doc_id") + 10000000L) % 8).as("shard"), col("text")))
    MergeUpsert.upsertPartitioned(s, path, batch, "doc_id", "shard")
    s.read.parquet(path)
      .select(col("doc_id"), col("shard").cast("long").as("shard"),
        md5(col("text").cast("binary")).as("content_hash"))
      .orderBy("doc_id")
  }

  /** D53 — small-file compaction: the gate writes the corpus
    * deliberately fragmented (~25 files per shard), compacts, and
    * reads the COMMITTED table back — the hash pins content
    * invariance through the rewrite, and CompactSpec pins the layout
    * effects (1 file per shard, untouched shards byte-for-byte).
    * The oracle is the corpus itself: compaction must be invisible.
    */
  val qCompact: GateQuery = GateQuery(
    "q_compact",
    """SELECT doc_id, CAST(doc_id % 4 AS BIGINT) AS shard,
      |  md5(text) AS content_hash
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), (col("doc_id") % 4).as("shard"), col("text"))
    val path = java.nio.file.Files.createTempDirectory("graft_compact").toString
    docs.repartition(25).write.mode("overwrite").partitionBy("shard").parquet(path)
    graft.operators.Compact.compactPartitions(s, path, "shard")
    s.read.parquet(path)
      .select(col("doc_id"), col("shard").cast("long").as("shard"),
        md5(col("text").cast("binary")).as("content_hash"))
      .orderBy("doc_id")
  }

  /** D54 — snapshot versioning / time travel: three committed epochs
    * (append evens, append odds, delete-rewrite dropping doc_id % 7
    * == 0) and the gate reads ALL THREE versions back through their
    * manifests — the hash pins per-version membership exactly, so a
    * commit that leaked files across versions, a replace that failed
    * to isolate history, or a reader that fell back to directory
    * listing all break it.
    */
  val qTimeTravel: GateQuery = GateQuery(
    "q_time_travel",
    """WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      |v2 AS (SELECT doc_id, text FROM documents),
      |v3 AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0)
      |SELECT 1 AS version, doc_id, md5(text) AS content_hash FROM v1
      |UNION ALL SELECT 2, doc_id, md5(text) FROM v2
      |UNION ALL SELECT 3, doc_id, md5(text) FROM v3
      |ORDER BY version, doc_id""".stripMargin) { (s, dir) =>
    import graft.operators.Snapshots
    val docs = Tables(s, dir, "documents").select("doc_id", "text")
    val table = java.nio.file.Files.createTempDirectory("graft_tt").toString
    Snapshots.commitAppend(s, table, docs.filter(col("doc_id") % 2 === 0))
    Snapshots.commitAppend(s, table, docs.filter(col("doc_id") % 2 === 1))
    Snapshots.commitReplace(s, table,
      Snapshots.read(s, table).filter(col("doc_id") % 7 =!= 0))
    Seq(1, 2, 3).map { v =>
      Snapshots.read(s, table, Some(v))
        .select(lit(v).as("version"), col("doc_id"),
          md5(col("text").cast("binary")).as("content_hash"))
    }.reduce(_ unionByName _).orderBy("version", "doc_id")
  }

  /** D54b — snapshot RETENTION under the driver oracle (vacuum was
    * spec-only): three commits, then `vacuum(keepVersions = 2)` —
    * versions 2 and 3 must still read back byte-identical (a kept
    * version's files must survive even when an expired manifest also
    * referenced them — the orphan-safety rule), version 1's manifest
    * must be GONE (time travel shrinks to the window), and the
    * remaining manifest count is pinned. The meta row encodes the
    * expired-read refusal and survivor census as literals the oracle
    * states outright.
    */
  val qSnapshotVacuum: GateQuery = GateQuery(
    "q_snapshot_vacuum",
    """WITH v2 AS (SELECT doc_id, text FROM documents),
      |v3 AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0)
      |SELECT * FROM (
      |  SELECT 2 AS version, doc_id, md5(text) AS content_hash FROM v2
      |  UNION ALL SELECT 3, doc_id, md5(text) FROM v3
      |  UNION ALL SELECT 0, 2, 'v1_unreadable_2_manifests_remain')
      |ORDER BY version, doc_id""".stripMargin) { (s, dir) =>
    import graft.operators.Snapshots
    val docs = Tables(s, dir, "documents").select("doc_id", "text")
    val table = java.nio.file.Files.createTempDirectory("graft_ttv").toString
    Snapshots.commitAppend(s, table, docs.filter(col("doc_id") % 2 === 0))
    Snapshots.commitAppend(s, table, docs.filter(col("doc_id") % 2 === 1))
    Snapshots.commitReplace(s, table,
      Snapshots.read(s, table).filter(col("doc_id") % 7 =!= 0))
    Snapshots.vacuum(table, keepVersions = 2)
    val v1Refused =
      try { Snapshots.read(s, table, Some(1)); false }
      catch { case _: IllegalArgumentException => true }
    val remaining = java.nio.file.Files.list(
        java.nio.file.Paths.get(table, "_manifests")).count()
    val meta = s.range(1).select(lit(0).as("version"), lit(remaining).as("doc_id"),
      lit(if (v1Refused) s"v1_unreadable_${remaining}_manifests_remain"
          else "v1_still_readable").as("content_hash"))
    Seq(2, 3).map { v =>
      Snapshots.read(s, table, Some(v))
        .select(lit(v).as("version"), col("doc_id"),
          md5(col("text").cast("binary")).as("content_hash"))
    }.reduce(_ unionByName _).unionByName(meta)
      .orderBy("version", "doc_id")
  }

  /** D133 — temperature-scaled mixture weights at T = 2 (weights
    * derived FROM the corpus, unlike D110's caller targets): the
    * oracle re-tallies per-language token counts, replays the
    * floor(sqrt()) weight (IEEE sqrt is correctly rounded on both
    * engines — the one fractional power that replays), the
    * budget·w div Σw allocation, and the integer epoch factor.
    */
  val qTemperatureMix: GateQuery = GateQuery(
    "q_temperature_mix",
    """WITH per AS (
      |  SELECT lang AS domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |w AS (SELECT domain, n_docs, n_tokens,
      |        CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS weight
      |      FROM per),
      |t AS (SELECT CAST(SUM(weight) AS BIGINT) AS tw FROM w)
      |SELECT domain, n_docs, n_tokens, weight,
      |  CASE WHEN t.tw = 0 THEN 0
      |       ELSE CAST((1000000 * weight) // t.tw AS BIGINT) END AS alloc_tokens,
      |  CASE WHEN n_tokens = 0 THEN 0
      |       ELSE CAST((CASE WHEN t.tw = 0 THEN 0 ELSE CAST((1000000 * weight) // t.tw AS BIGINT) END) * 100 // n_tokens AS BIGINT)
      |       END AS epochs_x100
      |FROM w, t
      |ORDER BY domain""".stripMargin) { (s, dir) =>
    Sampling.temperatureMixture(Tables(s, dir, "documents"),
        "lang", "text", budgetTokens = 1000000L)
      .orderBy("domain")
  }

  /** D21 — deterministic proportional stratified sample: 20% of every
    * source, floor semantics, pure-integer keep test (no float
    * fraction to diverge between engines).
    */
  val qStratifiedSample: GateQuery = GateQuery(
    "q_stratified_sample",
    """WITH t AS (
      |  SELECT source, doc_id,
      |    -- mirror of Sampling.hashRank: length-prefixed tokens, NULL -> 'N'
      |    CASE WHEN doc_id IS NULL THEN 'N'
      |         ELSE CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR) END AS tok
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5('42' || '-' || tok), doc_id) AS sample_rk,
      |    COUNT(*) OVER (PARTITION BY source) AS n
      |  FROM t)
      |SELECT source, doc_id, sample_rk
      |FROM r WHERE sample_rk * 100 <= n * 20
      |ORDER BY source, sample_rk""".stripMargin) { (s, dir) =>
    Sampling.stratified(
        Tables(s, dir, "documents").select("source", "doc_id"),
        strataCols = Seq("source"), keyCols = Seq("doc_id"), pct = 20, seed = 42L)
      .orderBy("source", "sample_rk")
  }

  /** D22 — domain-mixture resampling toward a target epoch count per
    * language (zh 2.0×, es 1.5×, fr 2.25×, de 1.0×, rest 0.5×).
    * Fractional epochs select docs by a 24-bit hash uniform compared
    * against an EXACT integer threshold (quarter-step epochs only).
    */
  val qDomainMix: GateQuery = GateQuery(
    "q_domain_mix",
    s"""WITH hx AS (
       |  SELECT doc_id, lang,
       |    md5('42' || '-' || CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS h
       |  FROM documents),
       |u AS (
       |  SELECT doc_id, lang,
       |    (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576 +
       |    (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536 +
       |    (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096 +
       |    (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 256 +
       |    (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16 +
       |    (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) AS u24
       |  FROM hx)
       |SELECT doc_id, lang,
       |  CAST(CASE WHEN lang = 'zh' THEN 2
       |       WHEN lang = 'es' THEN 1 + (CASE WHEN u24 < 8388608 THEN 1 ELSE 0 END)
       |       WHEN lang = 'fr' THEN 2 + (CASE WHEN u24 < 4194304 THEN 1 ELSE 0 END)
       |       WHEN lang = 'de' THEN 1
       |       ELSE (CASE WHEN u24 < 8388608 THEN 1 ELSE 0 END) END AS INT) AS n_copies
       |FROM u
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Sampling.domainMix(
        Tables(s, dir, "documents").select("doc_id", "lang"),
        domainCol = "lang", keyCols = Seq("doc_id"),
        epochs = Map("zh" -> 2.0, "es" -> 1.5, "fr" -> 2.25, "de" -> 1.0),
        defaultEpochs = 0.5, seed = 42L)
      .orderBy("doc_id")
  }

  /** D112 — per-domain top-fraction quality selection: keep the best
    * 60% of every language bucket by an integer-exact quality score
    * (stopword density ppm − punctuation density ppm + capped length
    * bonus — the D9 formula in integer form, so ranking is
    * bit-identical across engines). The oracle replays the score, the
    * per-domain ROW_NUMBER with the id tiebreak, and the floored
    * threshold — an off-by-one at any bucket boundary breaks the hash.
    */
  val qQualityTopFrac: GateQuery = GateQuery(
    "q_quality_topfrac",
    """WITH q AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in'))) * 1000000 // len(string_split(text, ' ')) AS BIGINT)
      |      - CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) * 1000000 // len(text) AS BIGINT)
      |      + CAST(least(len(string_split(text, ' ')), 100) * 10000 AS BIGINT) AS iq
      |  FROM documents),
      |r AS (SELECT doc_id, lang, iq,
      |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY iq DESC, doc_id) AS rk,
      |        COUNT(*) OVER (PARTITION BY lang) AS n
      |      FROM q)
      |SELECT doc_id, lang, iq FROM r
      |WHERE rk <= CAST(n * 60 // 100 AS BIGINT)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val ws = TextFunctions.tokens(col("text"))
    val scored = Tables(s, dir, "documents").select(col("doc_id"), col("lang"),
      (expr(s"size(filter(split(coalesce(text, ''), ' '), w -> w IN ('the','a','of','and','to','in'))) * 1000000L div size(split(coalesce(text, ''), ' '))") -
        expr("regexp_count(text, '[^a-z0-9 ]') * 1000000L div length(text)") +
        least(size(ws), lit(100)) * lit(10000L)).as("iq"))
    Sampling.selectTopFraction(scored, "lang", "iq", "doc_id", keepPct = 60)
      .orderBy("doc_id")
  }

  /** D116 — equi-depth quantile bucket assignment (length deciles
    * here; quality deciles in production) WITHOUT a corpus-wide
    * window: boundaries from one percentile_disc aggregate (the
    * q_percentile_disc cross-engine pairing), broadcast back, bucket
    * assigned by an in-row array filter — `ntile(10) OVER (ORDER BY
    * v)` would funnel 100 TB through one window partition. The oracle
    * re-derives the nine boundaries with quantile_disc and replays
    * the strictly-greater assignment rule, so a drifted boundary or
    * an off-by-one at a tie breaks the hash. Per-bucket tallies ride
    * along to pin the equi-depth property itself.
    */
  val qQuantileBuckets: GateQuery = GateQuery(
    "q_quantile_buckets",
    """WITH b AS (
      |  SELECT quantile_disc(n_chars, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs
      |  FROM documents),
      |a AS (
      |  SELECT d.doc_id, d.n_chars,
      |    CAST(1 + len(list_filter(b.bs, x -> d.n_chars > x)) AS INT) AS bucket
      |  FROM documents d CROSS JOIN b)
      |SELECT doc_id, n_chars, bucket,
      |  CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS bucket_n
      |FROM a
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val assigned = graft.operators.Prep.quantileBuckets(
      Tables(s, dir, "documents").select("doc_id", "n_chars"),
      "doc_id", "n_chars", nBuckets = 10)
    val sizes = assigned.groupBy("bucket").agg(count(lit(1)).as("bucket_n"))
    assigned.join(broadcast(sizes), "bucket")
      .select("doc_id", "n_chars", "bucket", "bucket_n")
      .orderBy("doc_id")
  }

  /** D110 — token-budget mixture allocator: per-source epochs/
    * allocation for a 1.6×-corpus token budget under a 8/6/3-percent
    * weight tiering, epochs capped at 2.5. The budget is itself
    * derived from the corpus (total tokens · 16 div 10), so both
    * engines re-derive every input; the oracle replays the domain
    * token census, the weight tiering from the source name, and all
    * four integer plan columns. The testdata exercises all three
    * regimes (capped, multi-epoch uncapped, sub-epoch downsample).
    */
  val qTokenBudget: GateQuery = GateQuery(
    "q_token_budget",
    """WITH tok AS (
      |  SELECT source AS domain, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(SUM(len(string_split(text, ' '))) * 16 // 10 AS BIGINT) AS budget
      |        FROM documents),
      |w AS (
      |  SELECT domain, n_docs, n_tokens,
      |    CAST(CASE WHEN CAST(substr(domain, 4) AS INT) < 5 THEN 8
      |              WHEN CAST(substr(domain, 4) AS INT) < 10 THEN 6
      |              ELSE 3 END AS BIGINT) AS weight_pct
      |  FROM tok),
      |plan AS (
      |  SELECT domain, n_docs, n_tokens, weight_pct,
      |    CAST((SELECT budget FROM tot) * weight_pct // 100 AS BIGINT) AS target_tokens
      |  FROM w),
      |ep AS (
      |  SELECT *, CAST(least(target_tokens * 100 // n_tokens, 250) AS BIGINT) AS epochs_x100
      |  FROM plan),
      |al AS (
      |  SELECT *, CAST(epochs_x100 * n_tokens // 100 AS BIGINT) AS alloc_tokens FROM ep)
      |SELECT domain, n_docs, n_tokens, weight_pct, target_tokens, epochs_x100,
      |  alloc_tokens,
      |  CAST(greatest(target_tokens - alloc_tokens, 0) AS BIGINT) AS shortfall_tokens
      |FROM al
      |ORDER BY domain""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val total = docs.agg(
      sum(size(TextFunctions.tokens(col("text"))))).collect()(0).getLong(0)
    val weights = (0 until 20)
      .map(i => s"src$i" -> (if (i < 5) 8 else if (i < 10) 6 else 3)).toMap
    Sampling.tokenBudgetAllocation(docs, "source", "text", weights,
        budgetTokens = total * 16 / 10, maxEpochsX100 = 250L)
      .orderBy("domain")
  }

  /** D23 — sequence packing (concat-and-chunk into 512-token context
    * windows, 8 deterministic shards): bin-level fill report.
    */
  val qPackBins: GateQuery = GateQuery(
    "q_pack_bins",
    """WITH t AS (
      |  SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
      |    len(string_split(text, ' ')) AS n_tokens
      |  FROM documents),
      |o AS (
      |  SELECT shard, doc_id, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
      |  FROM t),
      |b AS (SELECT shard, doc_id, n_tokens,
      |        CAST((end_off - n_tokens) // 512 AS BIGINT) AS bin FROM o)
      |SELECT shard, bin, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM b GROUP BY shard, bin
      |ORDER BY shard, bin""".stripMargin) { (s, dir) =>
    Packing.packBins(Tables(s, dir, "documents"), "doc_id", "text",
        ctxLen = 512, shards = 8)
      .orderBy("shard", "bin")
  }

  /** D117 — SFT loss-mask spans over the packed layout: per context
    * window, where loss is ACTIVE (completion tokens) vs masked
    * (prompt tokens), one row per (document, window) completion-span
    * intersection. The oracle replays the shard-parallel running-sum
    * layout, the `n div 2` prompt split, the window explode, and the
    * clamp arithmetic — any off-by-one shifts a span boundary and
    * breaks the hash.
    */
  val qSftMasks: GateQuery = GateQuery(
    "q_sft_masks",
    """WITH t AS (
      |  SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents),
      |o AS (
      |  SELECT shard, doc_id, n,
      |    SUM(n) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
      |  FROM t WHERE n >= 1),
      |c AS (SELECT shard, doc_id,
      |        end_off - n + CAST(n // 2 AS BIGINT) AS cs,
      |        end_off AS ce
      |      FROM o),
      |wx AS (SELECT shard, doc_id, cs, ce,
      |         unnest(generate_series(CAST(cs // 256 AS BIGINT), CAST((ce - 1) // 256 AS BIGINT))) AS win
      |       FROM c)
      |SELECT shard, CAST(win AS BIGINT) AS win, doc_id,
      |  CAST(greatest(cs, win * 256) - win * 256 AS BIGINT) AS start_in_win,
      |  CAST(least(ce, (win + 1) * 256) - greatest(cs, win * 256) AS BIGINT) AS mask_len
      |FROM wx
      |ORDER BY shard, win, doc_id""".stripMargin) { (s, dir) =>
    Packing.sftPackMasks(Tables(s, dir, "documents"), "doc_id", "text",
        ctxLen = 256, shards = 8)
      .orderBy("shard", "win", "doc_id")
  }

  /** D118 — deterministic span-corruption layout (T5/BART denoising
    * targets): seeded md5 draw opens 7-token spans at ~15% of
    * positions, overlaps merge into islands. The oracle replays the
    * draw, the span arithmetic, and the gaps-and-islands merge — a
    * drifted draw string, an off-by-one span end, or an island split
    * at the wrong gap all break the hash.
    */
  val qSpanCorruption: GateQuery = GateQuery(
    "q_span_corruption",
    """WITH t AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents WHERE len(string_split(text, ' ')) >= 1),
      |c AS (
      |  SELECT doc_id, n, CAST(s.i AS BIGINT) AS s,
      |    least(CAST(s.i AS BIGINT) + 7, n) AS e
      |  FROM t, LATERAL unnest(generate_series(0, n - 1)) s(i)
      |  WHERE ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR) || ':' || CAST(s.i AS VARCHAR)), 1, 12))::BIGINT % 100 < 15),
      |m AS (
      |  SELECT doc_id, n, s, e,
      |    max(e) OVER (PARTITION BY doc_id ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM c),
      |isl AS (
      |  SELECT doc_id, n, s, e,
      |    SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS island
      |  FROM m)
      |SELECT doc_id, n AS n_tok, CAST(island - 1 AS BIGINT) AS span_idx,
      |  CAST(MIN(s) AS BIGINT) AS start_tok,
      |  CAST(MAX(e) - MIN(s) AS BIGINT) AS len
      |FROM isl GROUP BY doc_id, n, island
      |ORDER BY doc_id, span_idx""".stripMargin) { (s, dir) =>
    graft.operators.Prep.spanCorruption(Tables(s, dir, "documents"),
        "doc_id", "text", ratePct = 15, spanLen = 7, seed = 42L)
      .orderBy("doc_id", "span_idx")
  }

  /** D16+ — the FULL curation DAG as one gate: exact dedup →
    * decontamination (bench = doc_id % 97 == 0) → quality gate →
    * domain mixture → sequence packing of the copies. The oracle
    * chains the already-proven per-stage derivations into one CTE
    * pipeline; output is the bin-level fill report of the corpus in
    * training order.
    */
  val qCurateFull: GateQuery = GateQuery(
    "q_curate_full",
    s"""WITH ${shingleCte(3)},
       |tr AS (SELECT * FROM documents WHERE doc_id % 97 <> 0),
       |surv AS (SELECT MIN(doc_id) AS doc_id FROM tr GROUP BY md5(text)),
       |d AS (SELECT * FROM tr WHERE doc_id IN (SELECT doc_id FROM surv)),
       |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
       |contam AS (SELECT DISTINCT s.doc_id FROM sh s
       |           JOIN bench b ON s.shingle = b.shingle
       |           WHERE s.doc_id IN (SELECT doc_id FROM d)),
       |q AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
       |      FROM d
       |      WHERE doc_id NOT IN (SELECT doc_id FROM contam)
       |        AND len(string_split(text, ' ')) >= 10),
       |hx AS (SELECT doc_id,
       |         md5('42' || '-' || CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS h
       |       FROM q),
       |u AS (SELECT doc_id,
       |        (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576 +
       |        (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536 +
       |        (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096 +
       |        (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 256 +
       |        (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16 +
       |        (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) AS u24
       |      FROM hx),
       |mixed AS (SELECT q.doc_id, q.lang, q.n_tokens,
       |            CASE WHEN q.lang = 'zh' THEN 2
       |                 WHEN q.lang = 'es' THEN 1 + (CASE WHEN u.u24 < 8388608 THEN 1 ELSE 0 END)
       |                 WHEN q.lang = 'fr' THEN 2 + (CASE WHEN u.u24 < 4194304 THEN 1 ELSE 0 END)
       |                 WHEN q.lang = 'de' THEN 1
       |                 ELSE (CASE WHEN u.u24 < 8388608 THEN 1 ELSE 0 END) END AS n_copies
       |          FROM q JOIN u ON u.doc_id = q.doc_id),
       |copies AS (SELECT m.doc_id, m.n_tokens, s.i AS copy_idx
       |           FROM mixed m
       |           JOIN (SELECT unnest(generate_series(1, 3)) AS i) s ON s.i <= m.n_copies),
       |o AS (SELECT doc_id, n_tokens, copy_idx, CAST(doc_id % 8 AS INT) AS shard,
       |        SUM(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id, copy_idx
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
       |      FROM copies)
       |SELECT shard, CAST((end_off - n_tokens) // 512 AS BIGINT) AS bin,
       |  COUNT(*) AS n_items, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM o GROUP BY shard, bin
       |ORDER BY shard, bin""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    Curate.fullPipeline(
        train = docs.filter(col("doc_id") % 97 =!= 0),
        bench = docs.filter(col("doc_id") % 97 === 0),
        idCol = "doc_id", textCol = "text", domainCol = "lang",
        epochs = Map("zh" -> 2.0, "es" -> 1.5, "fr" -> 2.25, "de" -> 1.0),
        defaultEpochs = 0.5, minTokens = 10, shingleN = 3,
        ctxLen = 512, shards = 8)
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_items"), sum("n_tokens").as("bin_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("shard", "bin")
  }

  /** D33 — signed random projection (hyperplane LSH, Charikar 2002)
    * over int8-quantized embeddings: 64 floats → 16 exact-integer
    * sums p_j = Σ sign(j,i)·q_i. Both engines RE-DERIVE the ±1 matrix
    * from md5("5:j:i") (first hex digit < '8' ⇒ +1), so the hash
    * match proves sign derivation, quantization, and the projection
    * sums all agree bit-for-bit. Long (vec_id, dim_idx, p) output —
    * every projected component verified, not a digest.
    */
  val qSrpProject: GateQuery = GateQuery(
    "q_srp_project",
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |s AS (SELECT vec_id, v,
      |        list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
      |      FROM e),
      |q AS (SELECT vec_id,
      |        CASE WHEN scale = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
      |             ELSE list_transform(v, x -> CAST(floor(x * 127 / scale) AS BIGINT))
      |        END AS qv
      |      FROM s),
      |sg AS (SELECT j, list_transform(generate_series(0, 63), i ->
      |         CASE WHEN substring(md5('5:' || CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1) < '8'
      |              THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END) AS sv
      |       FROM generate_series(0, 15) t(j))
      |SELECT q.vec_id, CAST(sg.j AS INT) AS dim_idx,
      |  CAST(list_aggregate(list_transform(generate_series(1, 64), i -> qv[i] * sv[i]), 'sum') AS BIGINT) AS p
      |FROM q CROSS JOIN sg
      |ORDER BY vec_id, dim_idx""".stripMargin) { (s, dir) =>
    Prep.projectSigned(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        outDim = 16, dim = 64, seed = 5L)
      .select(col("vec_id"), posexplode(col("proj")))
      .select(col("vec_id"), col("pos").cast("int").as("dim_idx"),
        col("col").as("p"))
      .orderBy("vec_id", "dim_idx")
  }

  /** D34 — cross-document duplicated n-gram spans (Lee et al. 2022
    * substring dedup at 5-gram granularity): per doc, the number of
    * 5-gram starts whose gram appears verbatim in ANOTHER document,
    * the tokens those spans cover, and the earliest duplicated start.
    * The oracle re-derives grams by list slicing — an off-by-one in
    * either engine's start arithmetic breaks first_dup/covered_tok.
    */
  val qDupSpans: GateQuery = GateQuery(
    "q_dup_spans",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks,
      |             len(string_split(text,' ')) AS n
      |           FROM documents),
      |-- per-row series (no fixed cap): docs of ANY token length get
      |-- every gram start (same LATERAL shape as the q_winnow oracle).
      |g AS (SELECT doc_id, CAST(s.i AS INT) AS start,
      |        md5(array_to_string(toks[CAST(s.i+1 AS INT):CAST(s.i+5 AS INT)], ' ')) AS gh
      |      FROM t, LATERAL unnest(generate_series(0, n - 5)) s(i)),
      |dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
      |ds AS (SELECT doc_id, start FROM g WHERE gh IN (SELECT gh FROM dup)),
      |agg AS (SELECT doc_id, COUNT(*) AS dup_ngrams, MIN(start) AS first_dup
      |        FROM ds GROUP BY doc_id),
      |cov AS (SELECT ds.doc_id, COUNT(DISTINCT ds.start + c.d) AS covered_tok
      |        FROM ds, generate_series(0, 4) c(d)
      |        GROUP BY ds.doc_id)
      |SELECT t.doc_id, CAST(t.n AS INT) AS n_tok,
      |  CAST(COALESCE(agg.dup_ngrams, 0) AS BIGINT) AS dup_ngrams,
      |  CAST(COALESCE(cov.covered_tok, 0) AS BIGINT) AS covered_tok,
      |  CAST(COALESCE(agg.first_dup, -1) AS INT) AS first_dup
      |FROM t LEFT JOIN agg USING(doc_id) LEFT JOIN cov USING(doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Dedup.duplicatedSpans(Tables(s, dir, "documents"), "doc_id", "text", n = 5)
      .orderBy("doc_id")
  }

  /** One on-disk dup-gram index per (JVM, sf-dir), built lazily from
    * the quarter-0 docs and extended via appendGramIndex with the
    * quarter-2 docs — so the probe gate measures probing (and the
    * append path is under the oracle: if append dropped or duplicated
    * grams, odd-doc reports change and the hash breaks).
    */
  private val gramIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** D113 — ingest-time duplicated-span guard against the PERSISTED
    * gram index: odd docs probe the even docs' distinct 5-gram hashes
    * (built quarter-0 first, quarter-2 appended) and report the D34
    * span numbers vs the corpus — corpus text never rescanned. The
    * oracle re-derives the even-doc gram set and replays the per-doc
    * rollup; within-batch-only repeats must NOT flag.
    */
  val qDupSpansIncr: GateQuery = GateQuery(
    "q_dup_spans_incr",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks,
      |             len(string_split(text,' ')) AS n
      |           FROM documents),
      |g AS (SELECT doc_id, CAST(s.i AS INT) AS start,
      |        md5(array_to_string(toks[CAST(s.i+1 AS INT):CAST(s.i+5 AS INT)], ' ')) AS gh
      |      FROM t, LATERAL unnest(generate_series(0, n - 5)) s(i)),
      |idx AS (SELECT DISTINCT gh FROM g WHERE doc_id % 2 = 0),
      |ds AS (SELECT doc_id, start FROM g
      |       WHERE doc_id % 2 = 1 AND gh IN (SELECT gh FROM idx)),
      |agg AS (SELECT doc_id, COUNT(*) AS dup_ngrams, MIN(start) AS first_dup
      |        FROM ds GROUP BY doc_id),
      |cov AS (SELECT ds.doc_id, COUNT(DISTINCT ds.start + c.d) AS covered_tok
      |        FROM ds, generate_series(0, 4) c(d)
      |        GROUP BY ds.doc_id)
      |SELECT t.doc_id, CAST(t.n AS INT) AS n_tok,
      |  CAST(COALESCE(agg.dup_ngrams, 0) AS BIGINT) AS dup_ngrams,
      |  CAST(COALESCE(cov.covered_tok, 0) AS BIGINT) AS covered_tok,
      |  CAST(COALESCE(agg.first_dup, -1) AS INT) AS first_dup
      |FROM t LEFT JOIN agg USING(doc_id) LEFT JOIN cov USING(doc_id)
      |WHERE t.doc_id % 2 = 1
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val idx = gramIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_gram_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Dedup.writeGramIndex(docs.filter(col("doc_id") % 4 === 0),
        "doc_id", "text", n = 5, out)
      Dedup.appendGramIndex(s, out, docs.filter(col("doc_id") % 4 === 2),
        "doc_id", "text")
      out
    })
    Dedup.incrementalDuplicatedSpans(s, idx,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** One persisted Bloom sketch index per (JVM, sf-dir), over the
    * same even-doc corpus as the exact gram index — the probe gate
    * measures probing.
    */
  private val bloomIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** D115 — Bloom-sketched tier of the D113 ingest-time span guard,
    * proven by its RECALL CONTRACT (the q_knn_ivf_partial pattern):
    * odd docs probe BOTH tiers over the same even-doc corpus; the
    * gate emits the exact-tier span report (under the same DuckDB
    * replay as q_dup_spans_incr) plus per doc the count of exact
    * dup-gram starts the sketch failed to flag — the oracle pins that
    * count to LITERAL ZERO, which is exactly the Bloom
    * no-false-negative guarantee. A sketch built over different grams
    * (wrong n, wrong truncation, lost bucket) breaks the hash.
    */
  val qDupSpansSketch: GateQuery = GateQuery(
    "q_dup_spans_sketch",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks,
      |             len(string_split(text,' ')) AS n
      |           FROM documents),
      |g AS (SELECT doc_id, CAST(s.i AS INT) AS start,
      |        md5(array_to_string(toks[CAST(s.i+1 AS INT):CAST(s.i+5 AS INT)], ' ')) AS gh
      |      FROM t, LATERAL unnest(generate_series(0, n - 5)) s(i)),
      |idx AS (SELECT DISTINCT gh FROM g WHERE doc_id % 2 = 0),
      |ds AS (SELECT doc_id, start FROM g
      |       WHERE doc_id % 2 = 1 AND gh IN (SELECT gh FROM idx)),
      |agg AS (SELECT doc_id, COUNT(*) AS dup_ngrams, MIN(start) AS first_dup
      |        FROM ds GROUP BY doc_id),
      |cov AS (SELECT ds.doc_id, COUNT(DISTINCT ds.start + c.d) AS covered_tok
      |        FROM ds, generate_series(0, 4) c(d)
      |        GROUP BY ds.doc_id)
      |SELECT t.doc_id, CAST(t.n AS INT) AS n_tok,
      |  CAST(COALESCE(agg.dup_ngrams, 0) AS BIGINT) AS dup_ngrams,
      |  CAST(COALESCE(cov.covered_tok, 0) AS BIGINT) AS covered_tok,
      |  CAST(COALESCE(agg.first_dup, -1) AS INT) AS first_dup,
      |  CAST(0 AS BIGINT) AS missed_by_sketch
      |FROM t LEFT JOIN agg USING(doc_id) LEFT JOIN cov USING(doc_id)
      |WHERE t.doc_id % 2 = 1
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val even = docs.filter(col("doc_id") % 2 === 0)
    val exactIdx = gramIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_gram_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Dedup.writeGramIndex(docs.filter(col("doc_id") % 4 === 0),
        "doc_id", "text", n = 5, out)
      Dedup.appendGramIndex(s, out, docs.filter(col("doc_id") % 4 === 2),
        "doc_id", "text")
      out
    })
    val sketchIdx = bloomIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_gram_bloom_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Dedup.writeGramBloomIndex(even, "doc_id", "text", n = 5, out,
        numBuckets = 16, fppPpm = 10000L)
      out
    })
    Dedup.sketchGuardRecallAudit(s, exactIdx, sketchIdx,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** D114 — content-defined chunking + cross-doc duplicate-chunk
    * census (w=3 window, modulus 16 ≈ 16-token chunks): the oracle
    * replays the boundary test (6-hex-digit window hash mod 16), the
    * cut/slice arithmetic, chunk md5s, and the ≥2-distinct-docs
    * census — an off-by-one anywhere in the slicing shifts chunk
    * identities corpus-wide and breaks the hash.
    */
  val qCdcChunks: GateQuery = GateQuery(
    "q_cdc_chunks",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks,
      |             CAST(len(string_split(text,' ')) AS BIGINT) AS n
      |           FROM documents),
      |b AS (SELECT doc_id, toks, n,
      |        list_filter(generate_series(2, n-2),
      |          i -> ('0x' || substr(md5(array_to_string(toks[CAST(i-1 AS INT):CAST(i+1 AS INT)], ' ')), 1, 6))::BIGINT % 16 = 0) AS bpos
      |      FROM t),
      |c AS (SELECT doc_id, toks, n, [CAST(-1 AS BIGINT)] || bpos || [n-1] AS cuts FROM b),
      |ck AS (SELECT doc_id, n,
      |         cuts[CAST(k.k+1 AS INT)] - cuts[CAST(k.k AS INT)] AS chunk_len,
      |         md5(array_to_string(toks[CAST(cuts[CAST(k.k AS INT)]+2 AS INT):CAST(cuts[CAST(k.k+1 AS INT)]+1 AS INT)], ' ')) AS ch
      |       FROM c, LATERAL unnest(generate_series(1, len(cuts)-1)) k(k)),
      |ckv AS (SELECT * FROM ck WHERE chunk_len > 0),
      |dup AS (SELECT ch FROM ckv GROUP BY ch HAVING COUNT(DISTINCT doc_id) >= 2),
      |fl AS (SELECT doc_id, COUNT(*) AS nd, CAST(SUM(chunk_len) AS BIGINT) AS dt
      |       FROM ckv WHERE ch IN (SELECT ch FROM dup) GROUP BY doc_id),
      |tot AS (SELECT doc_id, MAX(n) AS n_tok, COUNT(*) AS n_chunks
      |        FROM ckv GROUP BY doc_id)
      |SELECT tot.doc_id, tot.n_tok, tot.n_chunks,
      |  CAST(COALESCE(fl.nd, 0) AS BIGINT) AS n_dup_chunks,
      |  CAST(COALESCE(fl.dt, 0) AS BIGINT) AS dup_tokens
      |FROM tot LEFT JOIN fl USING(doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Dedup.cdcDuplicateCensus(Tables(s, dir, "documents"), "doc_id", "text",
        w = 3, modulus = 16)
      .orderBy("doc_id")
  }

  /** D39 — duplicated-span removal (the apply side of Lee et al. 2022
    * exact-substring dedup): every cross-doc duplicated 5-gram keeps
    * exactly its canonical occurrence (lowest doc_id, then start);
    * tokens under every other occurrence are cut and the documents
    * reassembled. The gate emits the RECONSTRUCTED text, so the hash
    * pins the full pipeline — gram derivation, canonical choice,
    * token-index coverage, and order-preserving reassembly; a single
    * off-by-one or a wrong canonical silently shifts some doc's text.
    */
  val qDedupSpansRemove: GateQuery = GateQuery(
    "q_dedup_spans_remove",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks,
      |             len(string_split(text,' ')) AS n
      |           FROM documents),
      |-- per-row series (no fixed cap): docs of ANY token length get
      |-- every gram start (same LATERAL shape as the q_winnow oracle).
      |g AS (SELECT doc_id, CAST(s.i AS INT) AS start,
      |        md5(array_to_string(toks[CAST(s.i+1 AS INT):CAST(s.i+5 AS INT)], ' ')) AS gh
      |      FROM t, LATERAL unnest(generate_series(0, n - 5)) s(i)),
      |dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
      |occ AS (SELECT doc_id, start, gh FROM g WHERE gh IN (SELECT gh FROM dup)),
      |c1 AS (SELECT gh, MIN(doc_id) AS cdoc FROM occ GROUP BY gh),
      |canon AS (SELECT o.gh, c1.cdoc, MIN(o.start) AS cstart
      |          FROM occ o JOIN c1 ON o.gh = c1.gh AND o.doc_id = c1.cdoc
      |          GROUP BY o.gh, c1.cdoc),
      |cut AS (SELECT DISTINCT o.doc_id, o.start + d.d AS tok_idx
      |        FROM occ o JOIN canon c ON o.gh = c.gh, generate_series(0, 4) d(d)
      |        WHERE NOT (o.doc_id = c.cdoc AND o.start = c.cstart)),
      |kept AS (SELECT t.doc_id, s.i AS idx, toks[CAST(s.i + 1 AS INT)] AS tok
      |         FROM t, LATERAL unnest(generate_series(0, n - 1)) s(i)
      |         WHERE NOT EXISTS (
      |           SELECT 1 FROM cut
      |           WHERE cut.doc_id = t.doc_id AND cut.tok_idx = s.i)),
      |r AS (SELECT doc_id, COUNT(*) AS n_kept,
      |        string_agg(tok, ' ' ORDER BY idx) AS text_kept
      |      FROM kept GROUP BY doc_id)
      |SELECT t.doc_id, CAST(t.n AS INT) AS n_tok,
      |  CAST(t.n - COALESCE(r.n_kept, 0) AS BIGINT) AS removed_tok,
      |  COALESCE(r.text_kept, '') AS text_kept
      |FROM t LEFT JOIN r USING(doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Dedup.removeDuplicatedSpans(Tables(s, dir, "documents"), "doc_id", "text",
        n = 5)
      .orderBy("doc_id")
  }

  /** D94 — winnowing fingerprint selection (Schleimer et al.
    * SIGMOD'03 / MOSS): per window of w=4 consecutive 4-gram hashes,
    * pick the minimum with ties to the RIGHTMOST position; distinct
    * picks aggregate to per-doc count, first/last position, and an
    * order-pinned digest of the selected hashes. The oracle replays
    * hashing, the windowed (hash ASC, start DESC) argmin via a
    * string-encoded key (md5 is fixed 32 hex chars, 999−start a fixed
    * 3-digit suffix, so string MIN == the struct order), the
    * full-window validity rule, AND the digest — a wrong tie-break or
    * an off-by-one window bound shifts some doc's digest.
    */
  val qWinnow: GateQuery = GateQuery(
    "q_winnow",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks,
      |             len(string_split(text,' ')) AS n
      |           FROM documents),
      |-- per-row series (no fixed cap): docs of ANY token length get
      |-- every gram start. The descending-start tie-break is encoded
      |-- as lpad(9999-start, 4), valid for docs up to 10003 tokens;
      |-- beyond that the oracle (not the engine) needs a wider pad.
      |g AS (SELECT doc_id, CAST(u.i AS INT) AS start, CAST(t.n - 3 AS INT) AS ng,
      |        md5(array_to_string(toks[CAST(u.i+1 AS INT):CAST(u.i+4 AS INT)], ' ')) AS gh
      |      FROM t, LATERAL unnest(generate_series(0, n - 4)) u(i)),
      |p AS (SELECT doc_id, start, ng,
      |        MIN(gh || lpad(CAST(9999 - start AS VARCHAR), 4, '0'))
      |          OVER (PARTITION BY doc_id ORDER BY start
      |                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS pick
      |      FROM g),
      |sel AS (SELECT DISTINCT doc_id,
      |          CAST(9999 - CAST(substring(pick, 33, 4) AS INT) AS INT) AS sel_start,
      |          substring(pick, 1, 32) AS gh
      |        FROM p WHERE start <= ng - 4),
      |a AS (SELECT doc_id, COUNT(*) AS n_fp, MIN(sel_start) AS first_fp,
      |        MAX(sel_start) AS last_fp,
      |        md5(string_agg(gh, ',' ORDER BY sel_start)) AS digest
      |      FROM sel GROUP BY 1)
      |SELECT t.doc_id, CAST(t.n AS INT) AS n_tok,
      |  CAST(COALESCE(a.n_fp, 0) AS BIGINT) AS n_fp,
      |  CAST(COALESCE(a.first_fp, -1) AS INT) AS first_fp,
      |  CAST(COALESCE(a.last_fp, -1) AS INT) AS last_fp,
      |  COALESCE(a.digest, '') AS digest
      |FROM t LEFT JOIN a USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Dedup.winnow(Tables(s, dir, "documents"), "doc_id", "text", k = 4, w = 4)
      .orderBy("doc_id")
  }

  /** D122 — persisted winnow-fingerprint index + probe, the MIDDLE
    * tier of the span-guard family (every-gram D113 ↔ Bloom D115):
    * the corpus stores only SELECTED fingerprints (~2/(w+1) of the
    * gram stream, positions preserved), and winnowing's guarantee —
    * any shared substring ≥ w+k−1 yields a common selected
    * fingerprint — survives the size cut. Odd docs probe the even
    * docs' fingerprint set; the oracle replays the full selection
    * (the q_winnow CTE), the index restriction, and the per-doc
    * hit rollup with integer-ppm fraction.
    */
  val qWinnowIncr: GateQuery = GateQuery(
    "q_winnow_incr",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks,
      |             len(string_split(text,' ')) AS n
      |           FROM documents),
      |g AS (SELECT doc_id, CAST(u.i AS INT) AS start, CAST(t.n - 3 AS INT) AS ng,
      |        md5(array_to_string(toks[CAST(u.i+1 AS INT):CAST(u.i+4 AS INT)], ' ')) AS gh
      |      FROM t, LATERAL unnest(generate_series(0, n - 4)) u(i)),
      |p AS (SELECT doc_id, start, ng,
      |        MIN(gh || lpad(CAST(9999 - start AS VARCHAR), 4, '0'))
      |          OVER (PARTITION BY doc_id ORDER BY start
      |                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS pick
      |      FROM g),
      |sel AS (SELECT DISTINCT doc_id,
      |          CAST(9999 - CAST(substring(pick, 33, 4) AS INT) AS INT) AS sel_start,
      |          substring(pick, 1, 32) AS gh
      |        FROM p WHERE start <= ng - 4),
      |idx AS (SELECT DISTINCT gh FROM sel WHERE doc_id % 2 = 0),
      |per AS (SELECT doc_id, COUNT(*) AS n_fp FROM sel
      |        WHERE doc_id % 2 = 1 GROUP BY doc_id),
      |h AS (SELECT s.doc_id, COUNT(*) AS n_hit, MIN(s.sel_start) AS first_hit
      |      FROM sel s JOIN idx ON idx.gh = s.gh
      |      WHERE s.doc_id % 2 = 1 GROUP BY s.doc_id)
      |SELECT t.doc_id, CAST(t.n AS INT) AS n_tok,
      |  CAST(COALESCE(per.n_fp, 0) AS BIGINT) AS n_fp,
      |  CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
      |  CAST(COALESCE(h.n_hit * 1000000 // per.n_fp, 0) AS BIGINT) AS hit_ppm,
      |  CAST(COALESCE(h.first_hit, -1) AS INT) AS first_hit
      |FROM t LEFT JOIN per USING (doc_id) LEFT JOIN h USING (doc_id)
      |WHERE t.doc_id % 2 = 1
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val idx = winnowIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_winnow_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Dedup.writeWinnowIndex(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", k = 4, w = 4, out)
      out
    })
    Dedup.probeWinnowIndex(s, idx, docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text")
      .orderBy("doc_id")
  }

  private val winnowIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** D122b — APPEND path of the winnow middle tier, proven
    * order-dependently (the D113 q_dup_spans_incr pattern): the
    * fingerprint index is seeded from quarter-0 docs and EXTENDED
    * with quarter-2 via `appendWinnowIndex`; the probe over odd docs
    * must then equal a from-scratch build over ALL even docs — which
    * is exactly what the oracle replays. A fingerprint lost or
    * duplicated by the anti-join append shifts n_hit/hit_ppm and
    * breaks the hash.
    */
  val qWinnowAppend: GateQuery = GateQuery(
    "q_winnow_append",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks,
      |             len(string_split(text,' ')) AS n
      |           FROM documents),
      |g AS (SELECT doc_id, CAST(u.i AS INT) AS start, CAST(t.n - 3 AS INT) AS ng,
      |        md5(array_to_string(toks[CAST(u.i+1 AS INT):CAST(u.i+4 AS INT)], ' ')) AS gh
      |      FROM t, LATERAL unnest(generate_series(0, n - 4)) u(i)),
      |p AS (SELECT doc_id, start, ng,
      |        MIN(gh || lpad(CAST(9999 - start AS VARCHAR), 4, '0'))
      |          OVER (PARTITION BY doc_id ORDER BY start
      |                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS pick
      |      FROM g),
      |sel AS (SELECT DISTINCT doc_id,
      |          CAST(9999 - CAST(substring(pick, 33, 4) AS INT) AS INT) AS sel_start,
      |          substring(pick, 1, 32) AS gh
      |        FROM p WHERE start <= ng - 4),
      |idx AS (SELECT DISTINCT gh FROM sel WHERE doc_id % 2 = 0),
      |per AS (SELECT doc_id, COUNT(*) AS n_fp FROM sel
      |        WHERE doc_id % 2 = 1 GROUP BY doc_id),
      |h AS (SELECT s.doc_id, COUNT(*) AS n_hit, MIN(s.sel_start) AS first_hit
      |      FROM sel s JOIN idx ON idx.gh = s.gh
      |      WHERE s.doc_id % 2 = 1 GROUP BY s.doc_id)
      |SELECT t.doc_id, CAST(t.n AS INT) AS n_tok,
      |  CAST(COALESCE(per.n_fp, 0) AS BIGINT) AS n_fp,
      |  CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
      |  CAST(COALESCE(h.n_hit * 1000000 // per.n_fp, 0) AS BIGINT) AS hit_ppm,
      |  CAST(COALESCE(h.first_hit, -1) AS INT) AS first_hit
      |FROM t LEFT JOIN per USING (doc_id) LEFT JOIN h USING (doc_id)
      |WHERE t.doc_id % 2 = 1
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val idx = winnowAppendIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_winnow_appidx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Dedup.writeWinnowIndex(docs.filter(col("doc_id") % 4 === 0),
        "doc_id", "text", k = 4, w = 4, out)
      Dedup.appendWinnowIndex(s, out, docs.filter(col("doc_id") % 4 === 2),
        "doc_id", "text")
      out
    })
    Dedup.probeWinnowIndex(s, idx, docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text")
      .orderBy("doc_id")
  }

  private val winnowAppendIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val winnowRemoveIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** D122c — DELETE maintenance of the winnow middle tier: all evens
    * indexed (attributed (doc_id, gh) rows), quarter-0 removed by
    * tombstone, odds probe — must equal a from-scratch build over the
    * quarter-2 survivors (the oracle's replay). Attribution is the
    * pinned property here too: a fingerprint selected by BOTH a
    * deleted and a surviving doc must keep hitting.
    */
  val qWinnowRemove: GateQuery = GateQuery(
    "q_winnow_remove",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks,
      |             len(string_split(text,' ')) AS n
      |           FROM documents),
      |g AS (SELECT doc_id, CAST(u.i AS INT) AS start, CAST(t.n - 3 AS INT) AS ng,
      |        md5(array_to_string(toks[CAST(u.i+1 AS INT):CAST(u.i+4 AS INT)], ' ')) AS gh
      |      FROM t, LATERAL unnest(generate_series(0, n - 4)) u(i)),
      |p AS (SELECT doc_id, start, ng,
      |        MIN(gh || lpad(CAST(9999 - start AS VARCHAR), 4, '0'))
      |          OVER (PARTITION BY doc_id ORDER BY start
      |                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS pick
      |      FROM g),
      |sel AS (SELECT DISTINCT doc_id,
      |          CAST(9999 - CAST(substring(pick, 33, 4) AS INT) AS INT) AS sel_start,
      |          substring(pick, 1, 32) AS gh
      |        FROM p WHERE start <= ng - 4),
      |idx AS (SELECT DISTINCT gh FROM sel WHERE doc_id % 4 = 2),
      |per AS (SELECT doc_id, COUNT(*) AS n_fp FROM sel
      |        WHERE doc_id % 2 = 1 GROUP BY doc_id),
      |h AS (SELECT s.doc_id, COUNT(*) AS n_hit, MIN(s.sel_start) AS first_hit
      |      FROM sel s JOIN idx ON idx.gh = s.gh
      |      WHERE s.doc_id % 2 = 1 GROUP BY s.doc_id)
      |SELECT t.doc_id, CAST(t.n AS INT) AS n_tok,
      |  CAST(COALESCE(per.n_fp, 0) AS BIGINT) AS n_fp,
      |  CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
      |  CAST(COALESCE(h.n_hit * 1000000 // per.n_fp, 0) AS BIGINT) AS hit_ppm,
      |  CAST(COALESCE(h.first_hit, -1) AS INT) AS first_hit
      |FROM t LEFT JOIN per USING (doc_id) LEFT JOIN h USING (doc_id)
      |WHERE t.doc_id % 2 = 1
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val idx = winnowRemoveIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_winnow_rm_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Dedup.writeWinnowIndex(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", k = 4, w = 4, out)
      Dedup.removeDocsFromWinnowIndex(s, out,
        docs.filter(col("doc_id") % 4 === 0).select("doc_id"), "doc_id")
      out
    })
    Dedup.probeWinnowIndex(s, idx, docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text")
      .orderBy("doc_id")
  }

  private val simhashIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** D123 — persisted simhash index + banded Hamming probe (Manku et
    * al. WWW'07), order-dependently: the index is seeded from
    * quarter-0 docs and EXTENDED with quarter-2; odd docs probe at
    * Hamming ≤ 3. The oracle replays the 48-bit md5 simhash bit by
    * bit, the 4 × 12-bit band split, the band-equality candidate
    * join, and the popcount verify — a vote tie broken differently, a
    * band boundary off by a bit, or a lost append row all break the
    * hash. The pigeonhole losslessness (≤3 flips can't touch all 4
    * bands) is pinned separately in IndexMaintenanceSpec against
    * brute force.
    */
  val qSimhashIncr: GateQuery = {
    val bitTerms = (0 until 48).map { b =>
      s"(CASE WHEN SUM(CASE WHEN (th >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")
    GateQuery(
      "q_simhash_incr",
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 12))::BIGINT AS th FROM w),
         |s AS (SELECT doc_id, $bitTerms AS sh FROM h GROUP BY doc_id),
         |b AS (SELECT doc_id, sh, CAST(g.b AS INT) AS band,
         |        (sh >> CAST(12 * g.b AS INT)) & 4095 AS nib
         |      FROM s, generate_series(0, 3) g(b)),
         |cand AS (SELECT DISTINCT n.doc_id AS d_new, c.doc_id AS d_corpus,
         |           n.sh AS sn, c.sh AS sc
         |         FROM b n JOIN b c ON n.band = c.band AND n.nib = c.nib
         |         WHERE n.doc_id % 2 = 1 AND c.doc_id % 2 = 0)
         |SELECT d_new, d_corpus, CAST(bit_count(xor(sn, sc)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(sn, sc)) <= 3
         |ORDER BY d_new, d_corpus""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val idx = simhashIndexCache.computeIfAbsent(dir, _ => {
        val out = s"${System.getProperty("java.io.tmpdir")}/graft_simhash_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
        Dedup.writeSimhashIndex(docs.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", out)
        Dedup.appendSimhashIndex(s, out, docs.filter(col("doc_id") % 4 === 2),
          "doc_id", "text")
        out
      })
      Dedup.incrementalSimhashDup(s, idx,
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", maxHamming = 3)
        .orderBy("d_new", "d_corpus")
    }
  }

  private val simhashRemoveIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** D123b — DELETE maintenance of the persisted simhash index: all
    * evens indexed, quarter-0 removed by tombstone, odds probe at
    * Hamming ≤ 3 — the result must equal a from-scratch index over
    * the surviving quarter-2 docs, which the oracle replays bit by
    * bit (same 48-bit md5 simhash + band + popcount replay as
    * q_simhash_incr, corpus side restricted to the survivors).
    */
  val qSimhashRemove: GateQuery = {
    val bitTerms = (0 until 48).map { b =>
      s"(CASE WHEN SUM(CASE WHEN (th >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")
    GateQuery(
      "q_simhash_remove",
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 12))::BIGINT AS th FROM w),
         |s AS (SELECT doc_id, $bitTerms AS sh FROM h GROUP BY doc_id),
         |b AS (SELECT doc_id, sh, CAST(g.b AS INT) AS band,
         |        (sh >> CAST(12 * g.b AS INT)) & 4095 AS nib
         |      FROM s, generate_series(0, 3) g(b)),
         |cand AS (SELECT DISTINCT n.doc_id AS d_new, c.doc_id AS d_corpus,
         |           n.sh AS sn, c.sh AS sc
         |         FROM b n JOIN b c ON n.band = c.band AND n.nib = c.nib
         |         WHERE n.doc_id % 2 = 1 AND c.doc_id % 4 = 2)
         |SELECT d_new, d_corpus, CAST(bit_count(xor(sn, sc)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(sn, sc)) <= 3
         |ORDER BY d_new, d_corpus""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val idx = simhashRemoveIndexCache.computeIfAbsent(dir, _ => {
        val out = s"${System.getProperty("java.io.tmpdir")}/graft_simhash_rm_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
        Dedup.writeSimhashIndex(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", out)
        Dedup.removeDocsFromSimhashIndex(s, out,
          docs.filter(col("doc_id") % 4 === 0).select("doc_id"), "doc_id")
        out
      })
      Dedup.incrementalSimhashDup(s, idx,
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", maxHamming = 3)
        .orderBy("d_new", "d_corpus")
    }
  }

  private val gramRemoveIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** D113b — DELETE maintenance of the persisted gram index, COMPACT
    * path included: the index holds all even docs' attributed
    * (doc_id, gh) rows, quarter-0 is removed AND the tombstones are
    * folded by `compactGramIndex` (staged rewrite + atomic rename),
    * then odd docs probe. The result must equal a from-scratch index
    * over the surviving quarter-2 docs — the oracle replays exactly
    * that. The attribution property is what the gate really pins: a
    * gram SHARED between a deleted quarter-0 doc and a surviving
    * quarter-2 doc must KEEP flagging (a bare distinct-gram delete
    * would over-delete it and under-report spans).
    */
  val qGramIndexRemove: GateQuery = GateQuery(
    "q_gram_index_remove",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks,
      |             len(string_split(text,' ')) AS n
      |           FROM documents),
      |g AS (SELECT doc_id, CAST(s.i AS INT) AS start,
      |        md5(array_to_string(toks[CAST(s.i+1 AS INT):CAST(s.i+5 AS INT)], ' ')) AS gh
      |      FROM t, LATERAL unnest(generate_series(0, n - 5)) s(i)),
      |idx AS (SELECT DISTINCT gh FROM g WHERE doc_id % 4 = 2),
      |ds AS (SELECT doc_id, start FROM g
      |       WHERE doc_id % 2 = 1 AND gh IN (SELECT gh FROM idx)),
      |agg AS (SELECT doc_id, COUNT(*) AS dup_ngrams, MIN(start) AS first_dup
      |        FROM ds GROUP BY doc_id),
      |cov AS (SELECT ds.doc_id, COUNT(DISTINCT ds.start + c.d) AS covered_tok
      |        FROM ds, generate_series(0, 4) c(d)
      |        GROUP BY ds.doc_id)
      |SELECT t.doc_id, CAST(t.n AS INT) AS n_tok,
      |  CAST(COALESCE(agg.dup_ngrams, 0) AS BIGINT) AS dup_ngrams,
      |  CAST(COALESCE(cov.covered_tok, 0) AS BIGINT) AS covered_tok,
      |  CAST(COALESCE(agg.first_dup, -1) AS INT) AS first_dup
      |FROM t LEFT JOIN agg USING(doc_id) LEFT JOIN cov USING(doc_id)
      |WHERE t.doc_id % 2 = 1
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val idx = gramRemoveIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_gram_rm_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Dedup.writeGramIndex(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", n = 5, out)
      Dedup.removeDocsFromGramIndex(s, out,
        docs.filter(col("doc_id") % 4 === 0).select("doc_id"), "doc_id")
      Dedup.compactGramIndex(s, out)
      out
    })
    Dedup.incrementalDuplicatedSpans(s, idx,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** D115b — APPEND path of the Bloom sketch tier, proven by the same
    * recall contract as q_dup_spans_sketch: the sketch is seeded from
    * quarter-0 docs and OR-merge-EXTENDED with quarter-2 via
    * `appendGramBloomIndex`; odd docs then probe both the exact index
    * (built over all evens) and the grown sketch. The oracle pins
    * missed_by_sketch to literal zero — a dropped bucket, a lost seed
    * bit, or a stale cached broadcast after the append all surface as
    * a non-zero miss and break the hash.
    */
  val qBloomAppend: GateQuery = GateQuery(
    "q_bloom_append",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks,
      |             len(string_split(text,' ')) AS n
      |           FROM documents),
      |g AS (SELECT doc_id, CAST(s.i AS INT) AS start,
      |        md5(array_to_string(toks[CAST(s.i+1 AS INT):CAST(s.i+5 AS INT)], ' ')) AS gh
      |      FROM t, LATERAL unnest(generate_series(0, n - 5)) s(i)),
      |idx AS (SELECT DISTINCT gh FROM g WHERE doc_id % 2 = 0),
      |ds AS (SELECT doc_id, start FROM g
      |       WHERE doc_id % 2 = 1 AND gh IN (SELECT gh FROM idx)),
      |agg AS (SELECT doc_id, COUNT(*) AS dup_ngrams, MIN(start) AS first_dup
      |        FROM ds GROUP BY doc_id),
      |cov AS (SELECT ds.doc_id, COUNT(DISTINCT ds.start + c.d) AS covered_tok
      |        FROM ds, generate_series(0, 4) c(d)
      |        GROUP BY ds.doc_id)
      |SELECT t.doc_id, CAST(t.n AS INT) AS n_tok,
      |  CAST(COALESCE(agg.dup_ngrams, 0) AS BIGINT) AS dup_ngrams,
      |  CAST(COALESCE(cov.covered_tok, 0) AS BIGINT) AS covered_tok,
      |  CAST(COALESCE(agg.first_dup, -1) AS INT) AS first_dup,
      |  CAST(0 AS BIGINT) AS missed_by_sketch
      |FROM t LEFT JOIN agg USING(doc_id) LEFT JOIN cov USING(doc_id)
      |WHERE t.doc_id % 2 = 1
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val exactIdx = gramIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_gram_idx_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Dedup.writeGramIndex(docs.filter(col("doc_id") % 4 === 0),
        "doc_id", "text", n = 5, out)
      Dedup.appendGramIndex(s, out, docs.filter(col("doc_id") % 4 === 2),
        "doc_id", "text")
      out
    })
    val sketchIdx = bloomAppendIndexCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_gram_bloom_app_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Dedup.writeGramBloomIndex(docs.filter(col("doc_id") % 4 === 0),
        "doc_id", "text", n = 5, out, numBuckets = 16, fppPpm = 10000L)
      Dedup.appendGramBloomIndex(s, out, docs.filter(col("doc_id") % 4 === 2),
        "doc_id", "text")
      out
    })
    Dedup.sketchGuardRecallAudit(s, exactIdx, sketchIdx,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      .orderBy("doc_id")
  }

  private val bloomAppendIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** D40 — seed-vs-corpus quality classification (the CCNet/fastText
    * filter shape): a balanced-prior token-posterior model trained on
    * the weak seed label lang='en', scored over every document as the
    * summed fixed-point posterior of its token occurrences, with the
    * mean-posterior>1/2 decision as an integer compare. The oracle
    * retrains the model AND rescores — a wrong count, smoothing term,
    * or floor shifts some document's score.
    */
  val qSeedClassify: GateQuery = GateQuery(
    "q_seed_classify",
    """WITH o AS (
      |  SELECT doc_id, lang = 'en' AS pos,
      |         unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |occ AS (SELECT * FROM o WHERE w <> ''),
      |v AS (SELECT w,
      |        SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS cpos,
      |        SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS cneg
      |      FROM occ GROUP BY w),
      |m AS (SELECT w,
      |        CAST((cpos + 1) * 1000000 // (cpos + cneg + 2) AS BIGINT) AS s
      |      FROM v),
      |d AS (SELECT occ.doc_id, COUNT(*) AS n_tok, SUM(m.s) AS score
      |      FROM occ JOIN m USING(w) GROUP BY occ.doc_id)
      |SELECT doc.doc_id,
      |  CAST(COALESCE(d.n_tok, 0) AS BIGINT) AS n_tok,
      |  CAST(COALESCE(d.score, 0) AS BIGINT) AS score,
      |  (2 * COALESCE(d.score, 0) > 1000000 * COALESCE(d.n_tok, 0)) AS pred
      |FROM documents doc LEFT JOIN d ON doc.doc_id = d.doc_id
      |ORDER BY doc.doc_id""".stripMargin) { (s, dir) =>
    Classify.seedPosteriorScore(Tables(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
      .orderBy("doc_id")
  }

  /** D41 — inter-source overlap audit: distinct shared shingles and
    * fixed-point containment per source pair — the cross-dataset
    * overlap check run before mixing corpora. The oracle rebuilds the
    * distinct (source, shingle) table and the pair matrix itself, so
    * a wrong shingle, a lost DISTINCT, or a flipped pair order all
    * shift the hash.
    */
  val qSourceOverlap: GateQuery = GateQuery(
    "q_source_overlap",
    s"""WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
       |idx AS (SELECT source, ws, unnest(generate_series(1, greatest(len(ws)-2, 0))) AS i FROM w),
       |sh AS (SELECT DISTINCT source, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle FROM idx),
       |per AS (SELECT source, COUNT(*) AS n_sh FROM sh GROUP BY source),
       |pairs AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
       |          GROUP BY 1, 2)
       |SELECT p.src_a, p.src_b, CAST(p.n_shared AS BIGINT) AS n_shared,
       |  CAST(pa.n_sh AS BIGINT) AS n_a, CAST(pb.n_sh AS BIGINT) AS n_b,
       |  CAST(p.n_shared * 1000000 // least(pa.n_sh, pb.n_sh) AS BIGINT) AS containment_ppm
       |FROM pairs p
       |JOIN per pa ON pa.source = p.src_a
       |JOIN per pb ON pb.source = p.src_b
       |ORDER BY src_a, src_b""".stripMargin) { (s, dir) =>
    CorpusStats.sourceOverlap(Tables(s, dir, "documents"), "text", "source", 3)
      .orderBy("src_a", "src_b")
  }

  /** D42 — Z-order layout audit over (l_partkey, l_suppkey): Morton
    * key + fixed-width bins + per-bin zone-map bounds. The oracle
    * replays the bit interleave term-for-term, so a wrong bit
    * position, shift, or bin width shifts the hash.
    */
  val qZorder: GateQuery = {
    val terms = (0 until 16).map(i =>
      s"(((CAST(l_partkey AS BIGINT) >> $i) & 1) << ${2 * i}) + " +
        s"(((CAST(l_suppkey AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
    GateQuery(
      "q_zorder",
      s"""WITH z AS (
         |  SELECT CAST(l_partkey AS BIGINT) AS a, CAST(l_suppkey AS BIGINT) AS b,
         |         CAST($terms AS BIGINT) AS zv
         |  FROM lineitem)
         |SELECT CAST(zv >> 24 AS BIGINT) AS zbin, COUNT(*) AS n,
         |  MIN(a) AS min_a, MAX(a) AS max_a, MIN(b) AS min_b, MAX(b) AS max_b
         |FROM z GROUP BY 1
         |ORDER BY zbin""".stripMargin) { (s, dir) =>
      Prep.zorderLayout(Tables(s, dir, "lineitem"), "l_partkey", "l_suppkey",
          bits = 16, binShift = 24)
        .orderBy("zbin")
    }
  }

  /** One two-layout lineitem write per (JVM, sf-dir), built lazily —
    * the audit gate re-running in the same process reads the already-
    * written files, so its steady-state bench number is the audit scan
    * alone (the q_knn_ivf_probe convention).
    */
  private val layoutCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def layoutDir(s: org.apache.spark.sql.SparkSession, dir: String): String =
    layoutCache.computeIfAbsent(dir, _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_layout_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Layout.writeLayouts(
        Tables(s, dir, "lineitem").select("l_orderkey", "l_shipdate", "l_quantity"),
        dateCol = "l_shipdate", keyCol = "l_orderkey", nFiles = 8, dir = out)
      out
    })

  /** D95 — physical-layout file-skipping audit: the same lineitem rows
    * written hash-distributed AND range-clustered on l_shipdate, then
    * each layout audited against a one-year (1997) predicate from its own
    * per-file zone maps (min/max of the predicate column). The oracle
    * reads the engine-written files via read_parquet(filename=true)
    * and replays zone derivation, the skip rule (max < lo OR min ≥ hi),
    * and the row accounting — hash-green only if the clustered write
    * actually produced tight zones AND the classification agrees
    * file-for-file. At 100 TB this audit is how you KNOW a layout
    * serves the workload before relying on pruning.
    */
  val qPruneAudit: GateQuery = {
    // {SF_BASE} is substituted by Verify at dump time — the glob must
    // scope to the CURRENT sf-dir's layout subtree, matching what the
    // engine side reads; a bare * would aggregate every sf-dir this
    // JVM ever laid out
    val layoutGlob =
      s"${System.getProperty("java.io.tmpdir")}/graft_layout_${ProcessHandle.current().pid()}/{SF_BASE}"
    def side(name: String) =
      s"""${name}_f AS (
         |  SELECT filename, MIN(l_shipdate) AS mn, MAX(l_shipdate) AS mx,
         |    COUNT(*) AS n
         |  FROM read_parquet('$layoutGlob/$name/*.parquet', filename=true)
         |  GROUP BY 1),
         |${name}_a AS (
         |  SELECT '$name' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
         |    CAST(SUM(CASE WHEN mx < DATE '1997-01-01' OR mn >= DATE '1998-01-01'
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_skip,
         |    CAST(SUM(CASE WHEN mx < DATE '1997-01-01' OR mn >= DATE '1998-01-01'
         |                  THEN n ELSE 0 END) AS BIGINT) AS rows_skip,
         |    CAST(SUM(CASE WHEN mx < DATE '1997-01-01' OR mn >= DATE '1998-01-01'
         |                  THEN 0 ELSE n END) AS BIGINT) AS rows_scan
         |  FROM ${name}_f)""".stripMargin
    GateQuery(
      "q_prune_audit",
      s"""WITH ${side("hashed")},
         |${side("clustered")}
         |SELECT * FROM hashed_a
         |UNION ALL SELECT * FROM clustered_a
         |ORDER BY layout""".stripMargin) { (s, dir) =>
      Layout.pruneAuditBoth(s, layoutDir(s, dir),
          dateCol = "l_shipdate", lo = "1997-01-01", hi = "1998-01-01")
        .orderBy("layout")
    }
  }

  /** D43 — image perceptual hash (aHash) near-dup over REALLY decoded
    * PNGs: 8×8 nearest-resize, strict-greater-than-floor-mean bits,
    * four 16-bit bands, LSH band-match candidate degree. The oracle
    * never sees the bytes: it replays decoded pixels by formula
    * (lossless PNG + integer resize map), the mean, every bit, the
    * band packing, AND the band join.
    */
  val qImagePhash: GateQuery = GateQuery(
    "q_image_phash",
    """WITH img AS (
      |  SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |rp AS (
      |  SELECT i.doc_id, gy.y * 8 + gx.x AS idx,
      |    CAST((i.doc_id + 7 * ((gx.x * i.w) // 8) + 13 * ((gy.y * i.h) // 8)) % 256 AS BIGINT) AS p
      |  FROM img i, generate_series(0, 7) gx(x), generate_series(0, 7) gy(y)),
      |m AS (SELECT doc_id, CAST(SUM(p) // 64 AS BIGINT) AS mean FROM rp GROUP BY 1),
      |bands AS (
      |  SELECT rp.doc_id, CAST(rp.idx // 16 AS BIGINT) AS band,
      |    CAST(SUM(CASE WHEN rp.p > m.mean THEN 1 << (rp.idx % 16) ELSE 0 END) AS BIGINT) AS v
      |  FROM rp JOIN m USING (doc_id) GROUP BY 1, 2),
      |deg AS (
      |  SELECT a.doc_id, COUNT(DISTINCT b.doc_id) AS n_cand
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.v = b.v AND a.doc_id <> b.doc_id
      |  GROUP BY 1),
      |pb AS (
      |  SELECT doc_id,
      |    MAX(CASE WHEN band = 0 THEN v END) AS b0,
      |    MAX(CASE WHEN band = 1 THEN v END) AS b1,
      |    MAX(CASE WHEN band = 2 THEN v END) AS b2,
      |    MAX(CASE WHEN band = 3 THEN v END) AS b3
      |  FROM bands GROUP BY 1)
      |SELECT pb.doc_id, CAST(pb.b0 AS INT) AS b0, CAST(pb.b1 AS INT) AS b1,
      |  CAST(pb.b2 AS INT) AS b2, CAST(pb.b3 AS INT) AS b3,
      |  CAST(COALESCE(deg.n_cand, 0) AS BIGINT) AS n_cand
      |FROM pb LEFT JOIN deg USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.multimodal.Multimodal.imagePhashCandidates(Tables(s, dir, "documents"))
      .orderBy("doc_id")
  }

  /** D44 — DSIR-style importance weighting: smoothed target (seed =
    * lang='en') vs raw bigram models, fixed-point score difference.
    * The oracle retrains BOTH models and rescores — a wrong count,
    * smoothing term, vocabulary size, or floor shifts some weight.
    */
  val qImportanceWeight: GateQuery = GateQuery(
    "q_importance_weight",
    """WITH t AS (SELECT doc_id, lang = 'en' AS seed,
      |             string_split(text, ' ') AS t,
      |             len(string_split(text, ' ')) AS m
      |           FROM documents),
      |p AS (SELECT doc_id, seed, t[g.i] AS w1, t[g.i + 1] AS w2
      |      FROM t, generate_series(1, 255) g(i) WHERE g.i <= m - 1),
      |b AS (SELECT w1, w2, COUNT(*) AS cb_r,
      |        SUM(CASE WHEN seed THEN 1 ELSE 0 END) AS cb_t
      |      FROM p GROUP BY 1, 2),
      |u AS (SELECT w1, CAST(SUM(cb_r) AS BIGINT) AS cu_r,
      |        CAST(SUM(cb_t) AS BIGINT) AS cu_t
      |      FROM b GROUP BY 1),
      |vb AS (SELECT COUNT(DISTINCT w2) AS v FROM b),
      |mdl AS (SELECT b.w1, b.w2,
      |          CAST(((b.cb_t + 1) * 1000000) // (u.cu_t + vb.v) AS BIGINT) AS lp_t,
      |          CAST(((b.cb_r + 1) * 1000000) // (u.cu_r + vb.v) AS BIGINT) AS lp_r
      |        FROM b JOIN u USING (w1), vb)
      |SELECT p.doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM(m.lp_t) AS BIGINT) AS score_t,
      |  CAST(SUM(m.lp_r) AS BIGINT) AS score_r,
      |  CAST(SUM(m.lp_t) - SUM(m.lp_r) AS BIGINT) AS weight
      |FROM p JOIN mdl m ON p.w1 = m.w1 AND p.w2 = m.w2
      |GROUP BY p.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    CorpusStats.importanceWeights(Tables(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
      .orderBy("doc_id")
  }

  /** D99 — stupid-backoff trigram LM scoring (Brants et al. 2007):
    * seed-trained (lang='en') trigram model scores every document;
    * unseen trigrams back off to 0.4× the bigram score, bigram misses
    * score 0 — all in fixed point. The oracle retrains BOTH models
    * and rescores with the same truncating-div branches — a wrong
    * context rollup, backoff factor, or miss branch shifts some
    * document's score or kind counts.
    */
  val qBackoffLm: GateQuery = GateQuery(
    "q_backoff_lm",
    """WITH t AS (SELECT doc_id, lang = 'en' AS seed,
      |             string_split(text, ' ') AS t,
      |             len(string_split(text, ' ')) AS m
      |           FROM documents),
      |tri AS (SELECT doc_id, seed, t[u.i] AS w1, t[u.i+1] AS w2, t[u.i+2] AS w3
      |        FROM t, LATERAL unnest(generate_series(1, m - 2)) u(i)),
      |c3 AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM tri WHERE seed GROUP BY 1, 2, 3),
      |c2 AS (SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c2 FROM c3 GROUP BY 1, 2),
      |tm AS (SELECT c3.w1, c3.w2, c3.w3,
      |         CAST(c3.c3 * 1000000 // c2.c2 AS BIGINT) AS lp3
      |       FROM c3 JOIN c2 USING (w1, w2)),
      |cb AS (SELECT w2, w3, COUNT(*) AS cb FROM tri WHERE seed GROUP BY 1, 2),
      |cu AS (SELECT w2, CAST(SUM(cb) AS BIGINT) AS cu FROM cb GROUP BY 1),
      |bm AS (SELECT cb.w2, cb.w3,
      |         CAST((2 * (cb.cb * 1000000 // cu.cu)) // 5 AS BIGINT) AS lp2
      |       FROM cb JOIN cu USING (w2)),
      |sc AS (SELECT tri.doc_id,
      |         COALESCE(tm.lp3, bm.lp2, 0) AS lp,
      |         CASE WHEN tm.lp3 IS NOT NULL THEN 0
      |              WHEN bm.lp2 IS NOT NULL THEN 1 ELSE 2 END AS kind
      |       FROM tri
      |       LEFT JOIN tm ON tm.w1 = tri.w1 AND tm.w2 = tri.w2 AND tm.w3 = tri.w3
      |       LEFT JOIN bm ON bm.w2 = tri.w2 AND bm.w3 = tri.w3)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
      |  CAST(SUM(CASE WHEN kind = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff,
      |  CAST(SUM(CASE WHEN kind = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_miss,
      |  CAST(SUM(lp) AS BIGINT) AS score
      |FROM sc GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    CorpusStats.stupidBackoffScore(Tables(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
      .orderBy("doc_id")
  }

  /** D45 — canonical-form dedup: case/punctuation/whitespace-blind
    * duplicate groups. The oracle restates the normalization chain in
    * the same portable regexes, so a wrong strip set, collapse rule,
    * or trim shifts the hash.
    */
  val qDedupCanonical: GateQuery = GateQuery(
    "q_dedup_canonical",
    """WITH c AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS canon
      |  FROM documents)
      |SELECT md5(canon) AS canon_hash, MIN(doc_id) AS survivor_id,
      |  COUNT(*) AS n_copies, CAST(MIN(len(canon)) AS INT) AS canon_len
      |FROM c GROUP BY 1
      |ORDER BY canon_hash""".stripMargin) { (s, dir) =>
    Dedup.canonicalDedup(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("canon_hash")
  }

  /** D46 — padding-efficiency audit: token-length buckets with the
    * batch-to-max padding waste per bucket. Pure integer replay.
    */
  val qPadAudit: GateQuery = GateQuery(
    "q_pad_audit",
    """WITH t AS (SELECT len(string_split(text, ' ')) AS n_tok FROM documents)
      |SELECT CAST(n_tok // 16 AS BIGINT) AS bucket, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS sum_tok, CAST(MAX(n_tok) AS INT) AS max_tok,
      |  CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT) AS pad_waste
      |FROM t GROUP BY 1
      |ORDER BY bucket""".stripMargin) { (s, dir) =>
    Packing.paddingAudit(Tables(s, dir, "documents"), "text", 16)
      .orderBy("bucket")
  }

  /** D47 — curriculum interleave ordering over quality (n_chars):
    * global rank, equal rank-tiers, round-robin curriculum key. The
    * oracle derives every position from one window row_number with
    * the same integer formulas — a wrong rank, tier cut, or interleave
    * stride shifts the hash.
    */
  val qCurriculum: GateQuery = GateQuery(
    "q_curriculum",
    """WITH r AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS score,
      |    CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rank,
      |    COUNT(*) OVER () AS n
      |  FROM documents),
      |t AS (SELECT doc_id, score, rank, n,
      |        CAST(((rank - 1) * 10) // n AS BIGINT) AS tier
      |      FROM r),
      |p AS (SELECT doc_id, score, rank, tier,
      |        CAST(rank - 1 - (tier * n + 9) // 10 AS BIGINT) AS pos_in_tier
      |      FROM t)
      |SELECT doc_id, score, rank, tier, pos_in_tier,
      |  CAST(pos_in_tier * 10 + tier AS BIGINT) AS curriculum_key
      |FROM p
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Prep.curriculumOrder(Tables(s, dir, "documents"), "doc_id", "n_chars")
      .orderBy("doc_id")
  }

  /** D48 — deterministic weighted Bernoulli downsampling (keep
    * probability ∝ weight): seeded md5 uniform vs integer threshold.
    * The oracle recomputes max weight, threshold, the 48-bit uniform,
    * and the keep decision for every row.
    */
  val qWeightedSample: GateQuery = GateQuery(
    "q_weighted_sample",
    """WITH w AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS weight FROM documents),
      |mx AS (SELECT MAX(weight) AS maxw FROM w)
      |SELECT w.doc_id, w.weight,
      |  CAST((w.weight * 1048576) // mx.maxw AS BIGINT) AS threshold,
      |  (('0x' || substr(md5('11:' || CAST(w.doc_id AS VARCHAR)), 1, 12))::BIGINT % 1048576)
      |    < CAST((w.weight * 1048576) // mx.maxw AS BIGINT) AS kept
      |FROM w, mx
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Prep.weightedSample(Tables(s, dir, "documents"), "doc_id", "n_chars", seed = 11)
      .orderBy("doc_id")
  }

  /** D49 — integer-exact Gram matrix over int8-quantized embeddings
    * (upper triangle). The oracle replays quantization AND every
    * pairwise product sum — a wrong scale, floor, or index shifts
    * some cell.
    */
  val qGramMatrix: GateQuery = GateQuery(
    "q_gram_matrix",
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |           FROM embeddings),
       |sc AS (SELECT vec_id, v,
       |        list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
       |      FROM e),
       |q AS (SELECT vec_id,
       |        CASE WHEN scale = 0
       |             THEN list_transform(v, x -> CAST(0 AS BIGINT))
       |             ELSE list_transform(v, x -> CAST(floor(x * 127 / scale) AS BIGINT))
       |        END AS qv
       |      FROM sc)
       |SELECT CAST(gi.i - 1 AS INT) AS i, CAST(gj.j - 1 AS INT) AS j,
       |  CAST(SUM(qv[gi.i] * qv[gj.j]) AS BIGINT) AS s
       |FROM q, generate_series(1, 64) gi(i), generate_series(1, 64) gj(j)
       |WHERE gj.j >= gi.i
       |GROUP BY 1, 2
       |ORDER BY i, j""".stripMargin) { (s, dir) =>
    graft.operators.Linalg.gramInt8(Tables(s, dir, "embeddings"), "vec_id", "embedding")
      .orderBy("i", "j")
  }

  /** D77 — top principal direction by integer power iteration over
    * the quantized Gram: the oracle rebuilds the Gram, expands the
    * triangle symmetrically, and unrolls every v←G·v round with the
    * max-|component| integral renorm. A wrong Gram cell, expansion,
    * sum, or renorm shifts some component.
    */
  /** DuckDB replay of the greedy MMR selection, rounds unrolled as
    * CTEs (the powerOracle pattern): quantize, pool = relevance
    * top-poolK, then per round the argmax of (100−λ)·rel − λ·max-sim
    * over the remaining pool with (score desc, id asc) ties.
    */
  private def mmrOracle(poolK: Int, selectK: Int, lambdaPct: Int): String = {
    def dot(a: String, b: String): String =
      s"CAST(list_aggregate(list_transform(generate_series(1, 64), i -> $a[CAST(i AS INT)] * $b[CAST(i AS INT)]), 'sum') AS BIGINT)"
    val head =
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |sc AS (SELECT vec_id, v,
         |        list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
         |      FROM e),
         |q AS (SELECT vec_id,
         |        CASE WHEN scale = 0
         |             THEN list_transform(v, x -> CAST(0 AS BIGINT))
         |             ELSE list_transform(v, x -> CAST(floor(x * 127 / scale) AS BIGINT))
         |        END AS qv
         |      FROM sc),
         |qq AS (SELECT qv FROM q WHERE vec_id = (SELECT MIN(vec_id) FROM q)),
         |pool AS (SELECT q.vec_id, q.qv, ${dot("q.qv", "qq.qv")} AS rel
         |         FROM q CROSS JOIN qq
         |         WHERE q.vec_id <> (SELECT MIN(vec_id) FROM q)
         |         ORDER BY rel DESC, q.vec_id LIMIT $poolK),
         |s1 AS (SELECT vec_id, qv, rel, CAST(0 AS BIGINT) AS ms,
         |         CAST(${100 - lambdaPct} * rel AS BIGINT) AS score
         |       FROM pool ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
    val rounds = (2 to selectK).map { r =>
      val sels = (1 until r).map(i => s"s$i")
      val crosses = sels.map(s => s"CROSS JOIN $s").mkString(" ")
      val notIn = sels.map(s => s"p.vec_id <> $s.vec_id").mkString(" AND ")
      val msTerms = sels.map(s => dot("p.qv", s"$s.qv")).mkString(", ")
      val ms = if (sels.size == 1) msTerms else s"GREATEST($msTerms)"
      s"""c$r AS (SELECT p.vec_id, p.qv, p.rel, CAST($ms AS BIGINT) AS ms
         |  FROM pool p $crosses WHERE $notIn),
         |s$r AS (SELECT vec_id, qv, rel, ms,
         |    CAST(${100 - lambdaPct} * rel - $lambdaPct * ms AS BIGINT) AS score
         |  FROM c$r ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
    }
    val unions = (1 to selectK).map(r =>
      s"SELECT $r AS rank, vec_id, rel, ms AS max_sim, score FROM s$r")
      .mkString("\nUNION ALL ")
    (head +: rounds).mkString(",\n") +
      s"\nSELECT CAST(rank AS INT) AS rank, vec_id, rel, max_sim, score FROM (\n$unions)\nORDER BY rank"
  }

  /** D130 — MMR diversified re-ranking (Carbonell & Goldstein
    * SIGIR'98): relevance top-8 pool to the lowest-id query vector,
    * then 4 greedy rounds of (100−30)·rel − 30·max-sim in exact
    * integers. The oracle unrolls every round — a tie broken
    * differently, a stale max-sim, or a pool boundary off by one
    * changes a selection and breaks the hash.
    */
  val qMmr: GateQuery = GateQuery(
    "q_mmr", mmrOracle(poolK = 8, selectK = 4, lambdaPct = 30)) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    val queryId = emb.agg(min(col("vec_id"))).head().getLong(0)
    Relevance.mmrDiversify(emb, "vec_id", "embedding",
        queryId, poolK = 8, selectK = 4, lambdaPct = 30)
      .orderBy("rank")
  }

  private def powerOracle(iters: Int): String = {
    val head =
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |sc AS (SELECT vec_id, v,
        |        list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
        |      FROM e),
        |q AS (SELECT vec_id,
        |        CASE WHEN scale = 0
        |             THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |             ELSE list_transform(v, x -> CAST(floor(x * 127 / scale) AS BIGINT))
        |        END AS qv
        |      FROM sc),
        |g AS (SELECT CAST(gi.i - 1 AS INT) AS i, CAST(gj.j - 1 AS INT) AS j,
        |        CAST(SUM(qv[gi.i] * qv[gj.j]) AS BIGINT) AS s
        |      FROM q, generate_series(1, 64) gi(i), generate_series(1, 64) gj(j)
        |      WHERE gj.j >= gi.i
        |      GROUP BY 1, 2),
        |fg AS MATERIALIZED (
        |  SELECT i, j, s FROM g
        |  UNION ALL SELECT j AS i, i AS j, s FROM g WHERE i <> j),
        |v0 AS (SELECT CAST(t.i AS INT) AS j, CAST(10000 AS BIGINT) AS v
        |       FROM generate_series(0, 63) t(i))""".stripMargin
    val rs = (1 to iters).map { r =>
      s"""w$r AS (SELECT f.i, CAST(SUM(f.s * v${r - 1}.v) AS BIGINT) AS w
         |  FROM fg f JOIN v${r - 1} ON v${r - 1}.j = f.j GROUP BY 1),
         |v$r AS (SELECT w$r.i AS j,
         |  CAST(w$r.w * 10000 // (SELECT MAX(abs(w)) FROM w$r) AS BIGINT) AS v
         |  FROM w$r)""".stripMargin
    }
    val tail =
      s"""SELECT j AS dim_idx, v FROM v$iters
         |ORDER BY dim_idx""".stripMargin
    (head +: rs).mkString(",\n") + "\n" + tail
  }

  val qPowerIteration: GateQuery = GateQuery(
    "q_power_iteration", powerOracle(iters = 3)) { (s, dir) =>
    Linalg.powerIteration(
      Linalg.gramInt8(Tables(s, dir, "embeddings"), "vec_id", "embedding"),
      dim = 64, iters = 3)
  }

  /** D129 — "all-but-the-top" post-processing: every vector's
    * dominant-direction projection removed, in the exact integer form
    * r = q·(u·u) − u·(q·u). The oracle replays the ENTIRE chain —
    * quantization, Gram, 3 power-iteration rounds, then the per-
    * vector dot and residual stats — so a drifted direction anywhere
    * upstream shifts every residual.
    */
  val qRemoveTop: GateQuery = GateQuery(
    "q_remove_top",
    // powerOracle joins its last CTE to the final SELECT with a bare
    // newline, so the spliced continuation must re-open the WITH list
    // with a leading comma
    powerOracle(iters = 3).replace(
      "SELECT j AS dim_idx, v FROM v3\nORDER BY dim_idx",
      """,ul AS (SELECT list(v ORDER BY j) AS ul FROM v3),
        |uu AS (SELECT CAST(SUM(v * v) AS BIGINT) AS uu FROM v3),
        |d AS (SELECT q.vec_id,
        |        CAST(SUM(q.qv[CAST(u.j + 1 AS INT)] * u.v) AS BIGINT) AS dot
        |      FROM q, v3 u GROUP BY 1),
        |rr AS (SELECT q.vec_id, d.dot,
        |         list_transform(generate_series(1, 64),
        |           i -> q.qv[CAST(i AS INT)] * uu.uu - ul.ul[CAST(i AS INT)] * d.dot) AS r
        |       FROM q JOIN d USING (vec_id) CROSS JOIN uu CROSS JOIN ul)
        |SELECT vec_id, dot,
        |  CAST(list_aggregate(r, 'sum') AS BIGINT) AS r_sum,
        |  CAST(list_aggregate(r, 'min') AS BIGINT) AS r_min,
        |  CAST(list_aggregate(r, 'max') AS BIGINT) AS r_max
        |FROM rr
        |ORDER BY vec_id""".stripMargin)) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    val u = Linalg.powerIteration(
        Linalg.gramInt8(emb, "vec_id", "embedding"), dim = 64, iters = 3)
      .orderBy("dim_idx").collect().map(_.getLong(1)) // dim-bounded
    Linalg.removeTopDirection(emb, "vec_id", "embedding", u)
      .orderBy("vec_id")
  }

  /** D79 — changelog derivation: before = documents, after = the same
    * table with %7 keys deleted, %5 texts rewritten, and %11 keys
    * re-inserted under shifted ids. The oracle replays the diff as a
    * value-compare full outer join — equal to the engine's
    * hash-compare because md5 equality over length-prefixed fields is
    * value equality.
    */
  val qChangelog: GateQuery = GateQuery(
    "q_changelog",
    """WITH b AS (SELECT doc_id, text FROM documents),
      |a AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |  WHERE doc_id % 11 = 0)
      |SELECT op, doc_id FROM (
      |  SELECT CASE WHEN b.doc_id IS NULL THEN 'I'
      |              WHEN a.doc_id IS NULL THEN 'D'
      |              WHEN b.text <> a.text THEN 'U' END AS op,
      |    COALESCE(b.doc_id, a.doc_id) AS doc_id
      |  FROM b FULL OUTER JOIN a ON a.doc_id = b.doc_id)
      |WHERE op IS NOT NULL
      |ORDER BY doc_id, op""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents").select("doc_id", "text")
    val after = docs.filter(col("doc_id") % 7 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .unionByName(docs.filter(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000))
    MergeUpsert.changelog(docs, after, "doc_id", Seq("text"))
      .orderBy("doc_id", "op")
  }

  /** D79b — changelog with after-images: same diff as q_changelog but
    * each I/U row carries the NEW text (NULL for D). The oracle's
    * value-compare full outer join reads the after-image straight off
    * the preserved side, so a value mis-attached — wrong key, stale
    * side, dropped NULL-on-delete — breaks the hash.
    */
  val qChangelogValues: GateQuery = GateQuery(
    "q_changelog_values",
    """WITH b AS (SELECT doc_id, text FROM documents),
      |a AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |  WHERE doc_id % 11 = 0)
      |SELECT op, doc_id, text FROM (
      |  SELECT CASE WHEN b.doc_id IS NULL THEN 'I'
      |              WHEN a.doc_id IS NULL THEN 'D'
      |              WHEN b.text <> a.text THEN 'U' END AS op,
      |    COALESCE(b.doc_id, a.doc_id) AS doc_id,
      |    a.text AS text
      |  FROM b FULL OUTER JOIN a ON a.doc_id = b.doc_id)
      |WHERE op IS NOT NULL
      |ORDER BY doc_id, op""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents").select("doc_id", "text")
    val after = docs.filter(col("doc_id") % 7 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .unionByName(docs.filter(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000))
    MergeUpsert.changelogWithValues(docs, after, "doc_id", Seq("text"))
      .orderBy("doc_id", "op")
  }

  /** D98 — incremental aggregate-view maintenance: the (lang, count,
    * sum(n_chars)) rollup of a mutated corpus is produced by applying
    * the CDC delta to the BEFORE rollup — deletes retract, updates
    * retract-then-add ACROSS group moves (%5 rows change lang, so
    * their old group must shrink and a brand-new group appear),
    * inserts add. The oracle is a FULL re-aggregation of the after
    * state: hash-green iff incremental maintenance is exactly
    * equivalent to recomputation — a missed retraction, a
    * double-count, or a dead group kept alive all break it.
    */
  val qIncrAgg: GateQuery = GateQuery(
    "q_incr_agg",
    """WITH a AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN lang || '_mv' ELSE lang END AS lang,
      |    CASE WHEN doc_id % 3 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, lang, n_chars FROM documents
      |  WHERE doc_id % 11 = 0)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_val
      |FROM a GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, dir) =>
    val before = Tables(s, dir, "documents").select("doc_id", "lang", "n_chars")
    val after = before.filter(col("doc_id") % 7 =!= 0)
      .withColumn("lang",
        when(col("doc_id") % 5 === 0, concat(col("lang"), lit("_mv")))
          .otherwise(col("lang")))
      .withColumn("n_chars",
        when(col("doc_id") % 3 === 0, col("n_chars") + 1000L)
          .otherwise(col("n_chars")))
      .unionByName(before.filter(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000))
    val baseAgg = before.groupBy("lang")
      .agg(count(lit(1)).as("n_rows"), sum("n_chars").as("sum_val"))
    MergeUpsert.maintainGroupSums(baseAgg, before, after,
        "doc_id", "lang", "n_chars")
      .orderBy("lang")
  }

  /** D98b — incremental MIN/MAX view maintenance: extrema are not
    * retractable, so groups whose current extremum was retracted
    * (deleted %7 rows and %5 group-movers include per-lang minima and
    * maxima) rescan — pruned to dirty groups only — while clean
    * groups merge additions monotonically. The oracle fully
    * re-aggregates the after state: a group refreshed when it needed
    * no rescan is invisible, but a group NOT rescanned when its
    * extremum died keeps a stale min/max and breaks the hash.
    */
  val qIncrMinmax: GateQuery = GateQuery(
    "q_incr_minmax",
    """WITH a AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN lang || '_mv' ELSE lang END AS lang,
      |    CASE WHEN doc_id % 3 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, lang, n_chars FROM documents
      |  WHERE doc_id % 11 = 0)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(MIN(n_chars) AS BIGINT) AS min_val,
      |  CAST(MAX(n_chars) AS BIGINT) AS max_val
      |FROM a GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, dir) =>
    val before = Tables(s, dir, "documents").select("doc_id", "lang", "n_chars")
    val after = before.filter(col("doc_id") % 7 =!= 0)
      .withColumn("lang",
        when(col("doc_id") % 5 === 0, concat(col("lang"), lit("_mv")))
          .otherwise(col("lang")))
      .withColumn("n_chars",
        when(col("doc_id") % 3 === 0, col("n_chars") + 1000L)
          .otherwise(col("n_chars")))
      .unionByName(before.filter(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000))
    val baseAgg = before.groupBy("lang")
      .agg(count(lit(1)).as("n_rows"), min("n_chars").as("min_val"),
        max("n_chars").as("max_val"))
    MergeUpsert.maintainGroupMinMax(baseAgg, before, after,
        "doc_id", "lang", "n_chars")
      .orderBy("lang")
  }

  /** D80 — sorted-neighborhood near-dup candidates: canonical-key
    * global order, window-4 neighbor pairs, exact verification at
    * Jaccard ≥ 3/5 (the q_dedup_jaccard/prefix output contract). The
    * oracle replays the canonicalization, the GLOBAL ROW_NUMBER, the
    * window pairing, and the exact verification.
    */
  val qDedupSortedNbr: GateQuery = GateQuery(
    "q_dedup_sortednbr",
    s"""WITH ${shingleCte(3)},
       |ck AS (
       |  SELECT doc_id,
       |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS ck
       |  FROM documents),
       |p AS (SELECT doc_id, ck,
       |        ROW_NUMBER() OVER (ORDER BY ck, doc_id) AS pos
       |      FROM ck),
       |cand AS (
       |  SELECT LEAST(a.doc_id, b.doc_id) AS d1,
       |         GREATEST(a.doc_id, b.doc_id) AS d2
       |  FROM p a JOIN p b ON b.pos BETWEEN a.pos + 1 AND a.pos + 4),
       |inter AS (SELECT c.d1, c.d2, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.d1
       |  JOIN sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
       |  GROUP BY 1, 2)
       |SELECT d1, d2, n_inter,
       |  CAST(n_inter AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_inter AS DOUBLE) AS jaccard
       |FROM inter
       |JOIN sizes s1 ON s1.doc_id = d1
       |JOIN sizes s2 ON s2.doc_id = d2
       |WHERE n_inter * 5 >= (s1.n_sh + s2.n_sh - n_inter) * 3
       |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    Dedup.sortedNeighborhoodPairs(Tables(s, dir, "documents"), "doc_id", "text",
        window = 4, n = 3, tNum = 3, tDen = 5)
      .orderBy("d1", "d2")
  }

  /** D81 — deterministic negative sampling: 3 draws per anchor over
    * the md5-shuffled position table. The oracle replays the shuffle
    * order, the hex12 draw, the mod, and the position join — a wrong
    * position table or draw slice scrambles every negative.
    */
  val qNegativeSample: GateQuery = GateQuery(
    "q_negative_sample",
    """WITH p AS (
      |  SELECT doc_id, md5('29:' || CAST(doc_id AS VARCHAR)) AS sk
      |  FROM documents),
      |pos AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sk, doc_id) AS pos
      |        FROM p),
      |d AS (
      |  SELECT a.doc_id AS anchor_id, CAST(t.i AS INT) AS i,
      |    CAST(('0x' || substr(md5('29:' || CAST(a.doc_id AS VARCHAR)
      |      || ':' || CAST(t.i AS VARCHAR)), 1, 12))::BIGINT
      |      % (SELECT COUNT(*) FROM documents) + 1 AS BIGINT) AS pos
      |  FROM documents a, generate_series(1, 3) t(i))
      |SELECT d.anchor_id, d.i, pos.doc_id AS negative_id
      |FROM d JOIN pos USING (pos)
      |ORDER BY anchor_id, i""".stripMargin) { (s, dir) =>
    Sampling.negativeSample(Tables(s, dir, "documents"), "doc_id",
        k = 3, seed = 29L)
      .select(col("anchor_id"), col("i"), col("negative_id"))
      .orderBy("anchor_id", "i")
  }

  /** D82 — greedy coverage selection, 5 rounds: the oracle unrolls
    * every round — gain recount against the growing covered set,
    * (gain DESC, id ASC) argmax, coverage union. One wrong round
    * cascades into every later pick.
    */
  private def coverageOracle(k: Int): String = {
    val head =
      s"""WITH ${shingleCte(3)},
         |c0 AS (SELECT shingle FROM sh WHERE false)""".stripMargin
    val rs = (1 to k).map { r =>
      s"""g$r AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain
         |  FROM sh WHERE shingle NOT IN (SELECT shingle FROM c${r - 1})
         |  GROUP BY 1),
         |b$r AS (SELECT CAST($r AS INT) AS round, doc_id, gain
         |  FROM g$r ORDER BY gain DESC, doc_id ASC LIMIT 1),
         |c$r AS MATERIALIZED (SELECT shingle FROM c${r - 1}
         |  UNION
         |  SELECT sh.shingle FROM sh JOIN b$r USING (doc_id))""".stripMargin
    }
    val tail =
      s"""SELECT round, doc_id, gain FROM (
         |  ${(1 to k).map(r => s"SELECT * FROM b$r").mkString(" UNION ALL ")})
         |ORDER BY round""".stripMargin
    (head +: rs).mkString(",\n") + "\n" + tail
  }

  val qGreedyCoverage: GateQuery = GateQuery(
    "q_greedy_coverage", coverageOracle(k = 5)) { (s, dir) =>
    Dedup.greedyCoverage(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, k = 5)
      .orderBy("round")
  }

  /** D83 — bag-of-words dedup: the oracle replays canonicalization,
    * list sort, and the hash — permutations of the same words MUST
    * collapse, which pins the sort itself.
    */
  val qDedupBag: GateQuery = GateQuery(
    "q_dedup_bag",
    """WITH c AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS canon
      |  FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_sort(string_split(canon, ' ')), ' ')) AS bag_hash,
      |    CAST(len(string_split(canon, ' ')) AS INT) AS n_tok
      |  FROM c)
      |SELECT bag_hash, MIN(doc_id) AS survivor_id, COUNT(*) AS n_copies,
      |  CAST(MIN(n_tok) AS INT) AS n_tok
      |FROM b GROUP BY 1
      |ORDER BY bag_hash""".stripMargin) { (s, dir) =>
    Dedup.bagDedup(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("bag_hash")
  }

  /** D50 — video perceptual hashing: real demux, real per-frame
    * decode, per-sampled-frame aHash bands, (frame position, band)
    * candidate degree. The oracle replays frame selection, resized
    * pixels, mean, bit packing, AND the collision join — without
    * ever seeing the container bytes.
    */
  val qVideoPhash: GateQuery = GateQuery(
    "q_video_phash",
    """WITH vid AS (
      |  SELECT doc_id, doc_id % 16 + 8 AS w, doc_id % 12 + 8 AS h,
      |         doc_id % 30 + 1 AS nf
      |  FROM documents WHERE doc_id % 3 = 2),
      |fr AS (
      |  SELECT v.doc_id, v.w, v.h, g.i AS frame_idx,
      |    CAST((g.i * v.nf) // LEAST(4, v.nf) AS INT) AS src_frame
      |  FROM vid v, generate_series(0, 3) g(i)
      |  WHERE g.i < LEAST(4, v.nf)),
      |rp AS (
      |  SELECT f.doc_id, f.frame_idx, f.src_frame, gy.y * 8 + gx.x AS idx,
      |    CAST((f.doc_id + 101 * f.src_frame + 7 * ((gx.x * f.w) // 8) + 13 * ((gy.y * f.h) // 8)) % 256 AS BIGINT) AS p
      |  FROM fr f, generate_series(0, 7) gx(x), generate_series(0, 7) gy(y)),
      |m AS (SELECT doc_id, frame_idx, CAST(SUM(p) // 64 AS BIGINT) AS mean
      |      FROM rp GROUP BY 1, 2),
      |bands AS (
      |  SELECT rp.doc_id, rp.frame_idx, rp.src_frame, CAST(rp.idx // 16 AS BIGINT) AS band,
      |    CAST(SUM(CASE WHEN rp.p > m.mean THEN 1 << (rp.idx % 16) ELSE 0 END) AS BIGINT) AS v
      |  FROM rp JOIN m USING (doc_id, frame_idx) GROUP BY 1, 2, 3, 4),
      |deg AS (
      |  SELECT a.doc_id, a.frame_idx, COUNT(DISTINCT b.doc_id) AS n_cand
      |  FROM bands a JOIN bands b
      |    ON a.frame_idx = b.frame_idx AND a.band = b.band AND a.v = b.v
      |   AND a.doc_id <> b.doc_id
      |  GROUP BY 1, 2),
      |pb AS (
      |  SELECT doc_id, frame_idx, MIN(src_frame) AS src_frame,
      |    MAX(CASE WHEN band = 0 THEN v END) AS b0,
      |    MAX(CASE WHEN band = 1 THEN v END) AS b1,
      |    MAX(CASE WHEN band = 2 THEN v END) AS b2,
      |    MAX(CASE WHEN band = 3 THEN v END) AS b3
      |  FROM bands GROUP BY 1, 2)
      |SELECT pb.doc_id, CAST(pb.frame_idx AS INT) AS frame_idx,
      |  CAST(pb.src_frame AS INT) AS src_frame,
      |  CAST(pb.b0 AS INT) AS b0, CAST(pb.b1 AS INT) AS b1,
      |  CAST(pb.b2 AS INT) AS b2, CAST(pb.b3 AS INT) AS b3,
      |  CAST(COALESCE(deg.n_cand, 0) AS BIGINT) AS n_cand
      |FROM pb LEFT JOIN deg USING (doc_id, frame_idx)
      |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
    graft.multimodal.Multimodal.videoPhashCandidates(Tables(s, dir, "documents"))
      .orderBy("doc_id", "frame_idx")
  }

  /** D51 — per-source dataset card: volume, token budget, exact-dup
    * rate, length profile. One aggregate, fully replayed by the
    * oracle.
    */
  val qSourceReport: GateQuery = GateQuery(
    "q_source_report",
    """SELECT source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT md5(text)) AS n_unique,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |  CAST(MIN(len(string_split(text, ' '))) AS INT) AS min_tokens,
      |  CAST(MAX(len(string_split(text, ' '))) AS INT) AS max_tokens,
      |  CAST(SUM(len(text)) AS BIGINT) AS total_chars,
      |  CAST((COUNT(*) - COUNT(DISTINCT md5(text))) * 1000000 // COUNT(*) AS BIGINT) AS dup_ppm
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin) { (s, dir) =>
    CorpusStats.sourceReport(Tables(s, dir, "documents"), "text", "source")
      .orderBy("source")
  }

  /** D35 — the first 5 BPE merge rounds (Sennrich et al. 2016) over
    * the documents corpus. The oracle replays every round: vocab in
    * the double-space symbol representation, adjacent-pair counts,
    * argmax with the (cnt DESC, lhs, rhs) tiebreak, and the SAME plain
    * leftmost `replace` merge application — DuckDB's replace and the
    * JVM's scan identically, which the representation was chosen for
    * (a single-space form would consume the shared delimiter between
    * adjacent merge sites in BOTH engines and silently undercount).
    * A wrong pair count, tiebreak, or merge application in any round
    * derails every later round, so the 5-row hash match pins the whole
    * training loop.
    */
  private def bpeOracle(rounds: Int): String = {
    val head =
      """WITH v0 AS (
        |  SELECT ' ' || rtrim(regexp_replace(w, '(.)', '\1  ', 'g')) || ' ' AS s,
        |    COUNT(*) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY 1)""".stripMargin
    val stages = (1 to rounds).map { r =>
      s"""p$r AS (SELECT sym[g.i] AS lhs, sym[g.i + 1] AS rhs,
         |    CAST(SUM(n) AS BIGINT) AS cnt
         |  FROM (SELECT string_split(trim(s), '  ') AS sym, n FROM v${r - 1}),
         |    generate_series(1, 255) g(i)
         |  WHERE g.i <= len(sym) - 1
         |  GROUP BY 1, 2),
         |b$r AS (SELECT lhs, rhs, cnt FROM p$r
         |  ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |v$r AS (SELECT replace(v.s, ' ' || b.lhs || '  ' || b.rhs || ' ',
         |    ' ' || b.lhs || b.rhs || ' ') AS s, v.n
         |  FROM v${r - 1} v CROSS JOIN b$r b)""".stripMargin
    }
    val tail = (1 to rounds)
      .map(r => s"SELECT CAST($r AS INT) AS round, lhs, rhs, cnt FROM b$r")
      .mkString("", "\nUNION ALL\n", "\nORDER BY round")
    (head +: stages).mkString(",\n") + "\n" + tail
  }

  val qBpeMerges: GateQuery = GateQuery(
    "q_bpe_merges", bpeOracle(5)) { (s, dir) =>
    Tokenize.bpeMerges(Tables(s, dir, "documents"), "text", rounds = 5)
      .orderBy("round")
  }

  /** D36 — BPE encoding: every document tokenized with the 5 learned
    * merges, per-doc (n_words, n_tokens). The oracle re-derives the
    * merge sequence (same CTEs as q_bpe_merges) and applies the same
    * nested replace chain in round order — so the hash match pins
    * training AND application end-to-end: a wrong merge, a wrong
    * application order, or a boundary-crossing merge all shift some
    * document's token count.
    */
  private def bpeEncodeOracle(rounds: Int): String = {
    val head =
      """WITH v0 AS (
        |  SELECT ' ' || rtrim(regexp_replace(w, '(.)', '\1  ', 'g')) || ' ' AS s,
        |    COUNT(*) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY 1)""".stripMargin
    val stages = (1 to rounds).map { r =>
      s"""p$r AS (SELECT sym[g.i] AS lhs, sym[g.i + 1] AS rhs,
         |    CAST(SUM(n) AS BIGINT) AS cnt
         |  FROM (SELECT string_split(trim(s), '  ') AS sym, n FROM v${r - 1}),
         |    generate_series(1, 255) g(i)
         |  WHERE g.i <= len(sym) - 1
         |  GROUP BY 1, 2),
         |b$r AS (SELECT lhs, rhs, cnt FROM p$r
         |  ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |v$r AS (SELECT replace(v.s, ' ' || b.lhs || '  ' || b.rhs || ' ',
         |    ' ' || b.lhs || b.rhs || ' ') AS s, v.n
         |  FROM v${r - 1} v CROSS JOIN b$r b)""".stripMargin
    }
    val chain = (1 to rounds).foldLeft("dw.s") { (acc, r) =>
      s"replace($acc, ' ' || b$r.lhs || '  ' || b$r.rhs || ' ', ' ' || b$r.lhs || b$r.rhs || ' ')"
    }
    val joins = (1 to rounds).map(r => s"CROSS JOIN b$r").mkString(" ")
    val tail =
      s"""dw AS (
         |  SELECT doc_id, ' ' || rtrim(regexp_replace(w, '(.)', '\\1  ', 'g')) || ' ' AS s
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE w <> ''),
         |enc AS (SELECT dw.doc_id, $chain AS e FROM dw $joins)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(len(string_split(trim(e), '  '))) AS BIGINT) AS n_tokens
         |FROM enc GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin
    (head +: stages).mkString(",\n") + ",\n" + tail
  }

  /** D37 — bigram LM likelihood scoring (the CCNet/RefinedWeb
    * perplexity-filter shape): each doc's integer-scaled
    * Σ floor(cb·10^6/cu) over its adjacent word pairs, model = MLE
    * bigram counts over the corpus itself. Integer `div` end to end —
    * a float log would not hash-match; the monotone per-pair transform
    * preserves exactly the ranking a filter needs.
    */
  val qBigramLm: GateQuery = GateQuery(
    "q_bigram_lm",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t,
      |             len(string_split(text, ' ')) AS m
      |           FROM documents),
      |p AS (SELECT doc_id, t[g.i] AS w1, t[g.i + 1] AS w2
      |      FROM t, generate_series(1, 255) g(i) WHERE g.i <= m - 1),
      |b AS (SELECT w1, w2, COUNT(*) AS cb FROM p GROUP BY 1, 2),
      |u AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu FROM b GROUP BY 1),
      |mdl AS (SELECT b.w1, b.w2, CAST((b.cb * 1000000) // u.cu AS BIGINT) AS lp
      |        FROM b JOIN u USING (w1))
      |SELECT p.doc_id, COUNT(*) AS n_bigrams, CAST(SUM(m.lp) AS BIGINT) AS score
      |FROM p JOIN mdl m ON p.w1 = m.w1 AND p.w2 = m.w2
      |GROUP BY p.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    CorpusStats.bigramLikelihood(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** D64 — PMI collocation extraction: adjacent pairs whose lift
    * P(ab)/(P(a)·P(b)) on the bigram-position space beats k/100,
    * tested as the exact product comparison 100·c(ab)·N ≥ k·c_l·c_r
    * (DECIMAL on the Spark side, HUGEINT in DuckDB — same integers).
    * Output is raw counts; the float PMI is a client-side log.
    */
  val qCollocations: GateQuery = GateQuery(
    "q_collocations",
    """WITH t AS (SELECT string_split(text, ' ') AS t,
      |             len(string_split(text, ' ')) AS m
      |           FROM documents),
      |p AS (SELECT t[g.i] AS w1, t[g.i + 1] AS w2
      |      FROM t, generate_series(1, 255) g(i) WHERE g.i <= m - 1),
      |big AS (SELECT w1, w2, COUNT(*) AS n_pair FROM p GROUP BY 1, 2),
      |l AS (SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS n_left FROM big GROUP BY 1),
      |r AS (SELECT w2, CAST(SUM(n_pair) AS BIGINT) AS n_right FROM big GROUP BY 1),
      |nb AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS n_bigrams FROM big)
      |SELECT big.w1, big.w2, CAST(n_pair AS BIGINT) AS n_pair,
      |  n_left, n_right, n_bigrams
      |FROM big JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN nb
      |WHERE n_pair >= 3
      |  AND CAST(n_pair * 100 AS HUGEINT) * n_bigrams
      |      >= CAST(n_left AS HUGEINT) * 150 * n_right
      |ORDER BY w1, w2""".stripMargin) { (s, dir) =>
    CorpusStats.collocations(Tables(s, dir, "documents"), "text",
        minPair = 3L, liftC100 = 150L)
      .orderBy("w1", "w2")
  }

  val qBpeEncode: GateQuery = GateQuery(
    "q_bpe_encode", bpeEncodeOracle(5)) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val merges = Tokenize.bpeMerges(docs, "text", rounds = 5)
      .orderBy("round").collect() // k driver rows — the learned tokenizer
      .map(r => (r.getString(1), r.getString(2))).toSeq
    Tokenize.bpeEncode(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
  }

  /** D60 — training-shard export with an auditable manifest: md5
    * shard assignment, within-shard (shuffle key, doc_id) order,
    * shard-partitioned parquet write, manifest built from the
    * COMMITTED read-back. The oracle replays assignment, order, token
    * counts, and the order-sensitive per-shard fingerprint — so the
    * hash pins the full export contract, not just row membership.
    */
  val qShardExport: GateQuery = GateQuery(
    "q_shard_export",
    """WITH r AS (
      |  SELECT doc_id, md5('17:' || CAST(doc_id AS VARCHAR)) AS skey,
      |    md5(text) AS content_hash,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |s AS (
      |  SELECT CAST(('0x' || substr(skey, 1, 12))::BIGINT % 8 AS INTEGER) AS shard,
      |    skey, doc_id, content_hash, n_tokens
      |  FROM r)
      |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  md5(string_agg(content_hash, ',' ORDER BY skey, doc_id)) AS shard_sig
      |FROM s GROUP BY shard
      |ORDER BY shard""".stripMargin) { (s, dir) =>
    val path = java.nio.file.Files.createTempDirectory("graft_shards").toString
    ShardExport.exportShards(s, Tables(s, dir, "documents"),
        "doc_id", "text", seed = 17, nShards = 8, outDir = path)
      .orderBy("shard")
  }

  /** D90 — k-center coreset selection (Gonzalez farthest-point): 6
    * greedy rounds over the quantized embeddings. The oracle unrolls
    * every round — seed, running-min update against the picked
    * center's own vector, (mind DESC, vec_id ASC) argmax — so one
    * wrong distance, tie-break, or update anywhere derails every later
    * pick (the q_kmeans/q_greedy_coverage replay discipline). The
    * picked DISTANCES are in the output: the covering-radius
    * arithmetic is pinned, not just the id sequence.
    */
  val qKcenter: GateQuery = {
    val dist = (a: String, b: String) =>
      s"""CAST(list_aggregate(list_transform(generate_series(1, 64),
         |  i -> ($a.q[i] - $b.q[i]) * ($a.q[i] - $b.q[i])), 'sum') AS BIGINT)""".stripMargin
    val k = 6
    val rounds = (2 to k).map { r =>
      s"""p$r AS (SELECT vec_id, q, mind FROM m${r - 1}
         |  ORDER BY mind DESC, vec_id LIMIT 1),
         |m$r AS (SELECT m.vec_id, m.q, least(m.mind, ${dist("m", "p")}) AS mind
         |  FROM m${r - 1} m, p$r p)""".stripMargin
    }.mkString(",\n")
    val tail = (2 to k).map(r =>
      s"SELECT $r AS round, vec_id, mind AS dist FROM p$r").mkString("\nUNION ALL ")
    GateQuery(
      "q_kcenter",
      s"""WITH v8 AS (SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 256) AS BIGINT)) AS q
         |  FROM embeddings),
         |seed AS (SELECT vec_id, q FROM v8 ORDER BY vec_id LIMIT 1),
         |m1 AS (SELECT v.vec_id, v.q, ${dist("v", "s")} AS mind FROM v8 v, seed s),
         |$rounds
         |SELECT 1 AS round, (SELECT vec_id FROM seed) AS vec_id,
         |  CAST(0 AS BIGINT) AS dist
         |UNION ALL $tail
         |ORDER BY round""".stripMargin) { (s, dir) =>
      Clustering.kCenter(Tables(s, dir, "embeddings"), "vec_id", "embedding",
          k = 6)
        .orderBy("round")
    }
  }

  /** D89 — frequent-itemset mining (Apriori): token pairs jointly
    * present in ≥60% of documents, members each in ≥50% — the
    * boilerplate-template detector. Thresholds are exact rationals
    * against the corpus doc count, so the oracle replays pass 1, the
    * apriori prune, and pass 2 exactly; the support COUNTS are in the
    * output, so an off-by-one anywhere breaks the hash.
    */
  val qFreqItemsets: GateQuery = GateQuery(
    "q_freq_itemsets",
    """WITH n AS (SELECT COUNT(*) AS nd FROM documents),
      |items AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS item
      |          FROM documents),
      |it AS (SELECT doc_id, item FROM items WHERE item <> ''),
      |f1 AS (SELECT item FROM it GROUP BY item
      |       HAVING COUNT(*) * 2 >= (SELECT nd FROM n)),
      |fi AS (SELECT i.doc_id, i.item FROM it i JOIN f1 ON f1.item = i.item)
      |SELECT a.item AS item1, b.item AS item2, COUNT(*) AS support
      |FROM fi a JOIN fi b ON a.doc_id = b.doc_id AND a.item < b.item
      |GROUP BY 1, 2
      |HAVING COUNT(*) * 5 >= (SELECT nd FROM n) * 3
      |ORDER BY item1, item2""".stripMargin) { (s, dir) =>
    Itemsets.frequentPairs(Tables(s, dir, "documents"), "doc_id", "text",
        itemNum = 1, itemDen = 2, pairNum = 3, pairDen = 5)
      .orderBy("item1", "item2")
  }

  val all: Seq[GateQuery] = Seq(
    qDedupExact, qDedupSurvivors, qDedupJaccard, qDedupMinhash, qSigEstimate, qContEstimate, qBandingPlan, qDedupSimhash, qLshCalibration, qVocabRetention, qPruneVocab, qRankCalibrate, qDistinctiveTerms, qStratifiedTopK,
    qNearDupIncremental, qNearDupIncrVerified, qNearDupRemove, qNearDupCompact, qSimhashRemove,
    qGramIndexRemove, qWinnowRemove, qTextSearchRemove, qTextSearchCompact, qKnnIvfRemove,
    qDedupClusters, qSplitLeakageSafe, qSurvivorQuality, qCurate, qCurateFull,
    qNearDupEmbedding, qKnnBruteForce, qRetrievalEval, qTruncRecall, qHardNegatives, qKnnLsh, qKnnMultiProbe, qKnnIvf, qKnnIvfFull,
    qKnnIvfIndexed, qKnnIvfWrite, qKnnIvfProbe, qKnnIvfPartial, qKnnIvfAppend,
    qPqSearch, qPqWrite, qPqRemove, qPqRerank, qAnnRecall, qIvfPqSearch, qIvfPqAppend, qIvfPqRemove, qEmbeddingNorm,
    qTokenCount, qQualityScore, qLangId, qFingerprint, qRepetition,
    qPiiRedact, qMultimodalMeta, qMediaMeta, qFrameSample, qImageDecode,
    qAudioDecode, qAudioFprint, qVideoFrames,
    qDecontaminate, qSplitContamination, qStratifiedSample, qKFold, qDomainMix, qTokenBudget, qTemperatureMix, qQualityTopFrac, qQuantileBuckets, qPackBins, qSftMasks, qSpanCorruption, qDedupIncremental,
    qDedupBloom, qMergeUpsert, qCompact, qTimeTravel, qSnapshotVacuum, qTextSearch, qTextSearchAppend, qTokenDrift, qHllDistinct, qKmvDistinct, qKmvSetops, qKmvShards,
    qRarity, qBm25, qHybridRrf, qPrfSearch, qRouge, qKmeans, qCentroidChurn, qShuffleDet, qSplitAssign, qChunkDocs, qHeavyHitters, qHeavyExact, qCountSketch, qCsInner, qCsTopK,
    qEmbedQuant, qSrpProject, qDupSpans, qDupSpansIncr, qDupSpansSketch, qBloomAppend, qCdcChunks, qDedupSpansRemove, qWinnow, qWinnowIncr, qWinnowAppend, qSimhashIncr, qSeedClassify,
    qSourceOverlap, qZorder, qPruneAudit, qImagePhash, qImportanceWeight, qBackoffLm, qDedupCanonical,
    qPadAudit, qCurriculum, qWeightedSample, qGramMatrix, qVideoPhash,
    qSourceReport, qBpeMerges, qBpeEncode, qBigramLm, qSemanticDedup,
    qShardExport, qDedupContainment, qDedupEditdist, qCollocations,
    qQuantileSketch, qDedupPrefix, qRendezvous, qPowerIteration, qRemoveTop, qMmr, qChangelog, qChangelogValues, qIncrAgg, qIncrMinmax,
    qDedupSortedNbr, qNegativeSample, qGreedyCoverage, qDedupBag,
    qLangConfusion, qImageClusters, qFreqItemsets, qKcenter)
}
