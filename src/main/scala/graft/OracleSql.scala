package graft

import graft.plans.CwMinHash

/** DuckDB oracle SQL for the SQL-replayable sketch family (the r13
  * flips): the same two-poly 60-bit shingle fingerprints, Carter–Wegman
  * MinHash permutations, poly band-key folds, bucket caps and
  * est-Jaccard verify the engine computes (SketchDedup), re-expressed
  * as DuckDB CTEs. The CW coefficient lists are RENDERED from
  * [[graft.plans.CwMinHash]]'s arrays — the engine and the oracle share
  * one source of truth, so the st_cms-style "change BOTH sides"
  * hand-copy hazard does not exist here.
  *
  * Replay-exactness notes (the contract the fragments maintain):
  *  - shingles rebuild as contiguous byte ranges (array_to_string with
  *    single spaces round-trips multi-space runs through empty tokens,
  *    exactly like ShinglePolyHashes' byte-range tokenizer);
  *  - docs under n tokens produce an EMPTY fingerprint list on both
  *    sides; their CW slots coalesce to the sentinel p (the engine's
  *    degenerate all-sentinel signature), so short-doc pairing
  *    replays too;
  *  - est-Jaccard thresholds compare on the integer matching-slot
  *    count (m ≥ k·threshold), never on a rounded double;
  *  - m/k est values are exact binary doubles, so round() at the
  *    output boundary is deterministic and engine-equal. */
object OracleSql {

  private val P = 1000000007L

  /** Two-poly 60-bit fingerprints of word 3-grams over a token list
    * `t` (the ShinglePolyHashes twin; `distinct` for SimHash's one-
    * vote-per-distinct-shingle rule, not needed under min).
    *
    * ASCII-CORPUS ASSUMPTION (r14 ADVICE): this twin folds DuckDB
    * `ascii(ch)` CODE POINTS per character, while the engine's
    * polyHash60 folds raw UTF-8 BYTES (& 0xff) — the two coincide
    * exactly on ASCII text (code point == single byte) and diverge on
    * any multi-byte character. Every surface replayed through this
    * expression reads either base64-armored payloads (pure ASCII by
    * construction) or the synthetic `documents.text` corpus, which the
    * generator emits as ASCII; HsAsciiSpec gates the assumption per
    * round. A non-ASCII corpus needs a byte-level DuckDB fold
    * (encode() → blob bytes) before these oracles are trusted. */
  private def hsExpr(distinct: Boolean): String = {
    val core =
      """list_transform(range(1, len(t) - 1), i ->
        (list_reduce(list_prepend(7::BIGINT,
           list_transform(string_split(array_to_string(t[i:i+2], ' '), ''),
             ch -> CAST(ascii(ch) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007) << 30)
        | list_reduce(list_prepend(7::BIGINT,
           list_transform(string_split(array_to_string(t[i:i+2], ' '), ''),
             ch -> CAST(ascii(ch) AS BIGINT))),
           (acc, c) -> (acc * 131 + c) % 998244353))"""
    if (distinct) s"list_distinct($core)" else core
  }

  /** CW MinHash signature list over a fingerprint list `hs`: slot j =
    * min of (A_j·x₀ + B_j·x₁ + C_j) mod p, sentinel p when empty. */
  private def cwSigExpr(k: Int): String = {
    val (a, b, c) = (CwMinHash.sqlList(CwMinHash.cwA, k),
      CwMinHash.sqlList(CwMinHash.cwB, k),
      CwMinHash.sqlList(CwMinHash.cwC, k))
    s"""list_transform(range(1, ${k + 1}), j ->
       coalesce(list_min(list_transform(hs, x ->
         (($a)[j] * (x % 1073741824)
          + ($b)[j] * (x // 1073741824)
          + ($c)[j]) % $P)), $P))"""
  }

  /** Poly band-key list over a signature list `sg`: band jb = fold of
    * its r slots with (acc·131 + s) mod p seeded 7+jb. */
  private def bandKeysExpr(k: Int, bands: Int): String = {
    val r = k / bands
    s"""list_transform(range(0, $bands), jb ->
       list_reduce(list_prepend(7 + jb,
           sg[(jb*$r + 1)::INT : (jb*$r + $r)::INT]),
         (acc, s) -> (acc * 131 + s) % $P))"""
  }

  /** CTE chain `{pre}_d → {pre}_h → {pre}_s → {pre}_b` computing
    * (id, sg, bks) per document of `src` (which must expose `$idCol`
    * and `text`). */
  private def sigChain(src: String, pre: String, idCol: String,
                       k: Int, bands: Int): String =
    s"""${pre}_d AS (SELECT $idCol AS doc_id, string_split(text, ' ') AS t
           FROM $src WHERE text IS NOT NULL),
       ${pre}_h AS (SELECT doc_id, ${hsExpr(distinct = false)} AS hs
           FROM ${pre}_d),
       ${pre}_s AS (SELECT doc_id, ${cwSigExpr(k)} AS sg FROM ${pre}_h),
       ${pre}_b AS (SELECT doc_id, sg, ${bandKeysExpr(k, bands)} AS bks
           FROM ${pre}_s)"""

  /** Banded-row explode of a `{pre}_b` frame: (doc_id, sg, band, bkey). */
  private def bandExplode(pre: String): String =
    s"""${pre}_e AS (SELECT doc_id, sg, CAST(jb AS INT) AS band,
           bks[(jb + 1)::INT] AS bkey
         FROM ${pre}_b CROSS JOIN (SELECT unnest(range(0, 8)) AS jb) rj)"""

  /** minhashLshPairs replay (k=32, bands=8, cap=64, threshold 0.5 ⟺
    * m ≥ 16): CTEs ending in `mh_pairs(d1, d2, est_jaccard)`. */
  private val minhashPairCtes: String =
    s"""${sigChain("documents", "mh", "doc_id", 32, 8)},
       ${bandExplode("mh")},
       mh_z AS (SELECT band, bkey, count(*) AS n FROM mh_e GROUP BY 1, 2),
       mh_u AS (SELECT mh_e.* FROM mh_e JOIN mh_z USING (band, bkey)
         WHERE n <= 64),
       mh_p AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
           a.sg AS s1, b.sg AS s2
         FROM mh_u a JOIN mh_u b ON a.band = b.band AND a.bkey = b.bkey
           AND a.doc_id < b.doc_id),
       mh_pairs AS (SELECT d1, d2,
           round(len(list_filter(range(1, 33), i -> s1[i] = s2[i]))
             / 32.0, 6) AS est_jaccard
         FROM mh_p
         WHERE len(list_filter(range(1, 33), i -> s1[i] = s2[i])) >= 16)"""

  val ddMinhashLsh: String =
    s"""WITH $minhashPairCtes
       SELECT d1, d2, est_jaccard FROM mh_pairs"""

  /** dupClusters over the LSH pair set: the dd_cluster recursive
    * min-label CC, seeded by mh_pairs instead of exact pairs. */
  val ddClusterLsh: String =
    s"""WITH RECURSIVE $minhashPairCtes,
       edges AS (SELECT d1 AS a, d2 AS b FROM mh_pairs
                 UNION ALL SELECT d2, d1 FROM mh_pairs),
       reach(a, b) AS (
         SELECT a, b FROM edges
         UNION
         SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       SELECT a AS doc_id, least(a, min(b)) AS cluster_id
       FROM reach GROUP BY a"""

  /** lshEval replay: truth = exact n-gram Jaccard ≥ 0.5 (the
    * dd_ngram_jaccard CTEs at threshold 0.5), retrieved = mh_pairs;
    * precision/recall/f1 as exact half-up e4 integers (m·10⁴ grids
    * reach .5 when counts are powers of two, so engine round() is
    * banned here — SparkEntry's engine side spells the same integer
    * divisions). */
  val ddLshEval: String =
    s"""WITH $minhashPairCtes,
       toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id, s FROM (
         SELECT doc_id, unnest(list_transform(range(1, len(t)-1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
         FROM toks WHERE len(t) >= 3)),
       hotsh AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 1000),
       shk AS (SELECT doc_id, s FROM sh ANTI JOIN hotsh USING (s)),
       sz AS (SELECT doc_id, count(*) AS n_sh FROM shk GROUP BY doc_id),
       p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
             FROM shk a JOIN shk b ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
       tr AS (SELECT d1, d2
         FROM p JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
         WHERE round(shared / (x.n_sh + y.n_sh - shared), 6) >= 0.5),
       c AS (SELECT
         (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_true,
         (SELECT CAST(count(*) AS BIGINT) FROM mh_pairs) AS n_retrieved,
         (SELECT CAST(count(*) AS BIGINT)
            FROM tr JOIN mh_pairs USING (d1, d2)) AS n_tp),
       e AS (SELECT n_true, n_retrieved, n_tp,
         (20000 * n_tp + n_retrieved) // (2 * nullif(n_retrieved, 0)) AS p_e4,
         (20000 * n_tp + n_true) // (2 * nullif(n_true, 0)) AS r_e4
         FROM c)
       SELECT n_true, n_retrieved, n_tp,
         CAST(p_e4 AS DOUBLE) / 10000 AS "precision",
         CAST(r_e4 AS DOUBLE) / 10000 AS recall,
         CAST((4 * p_e4 * r_e4 + (p_e4 + r_e4))
           // (2 * nullif(p_e4 + r_e4, 0)) AS DOUBLE) / 10000 AS f1
       FROM e"""

  /** contrastivePairs replay: positives = mh_pairs both directions,
    * negatives = distinct anchors × the md5-ordered poolK pool minus
    * self minus positives. */
  val pipePairs: String =
    s"""WITH $minhashPairCtes,
       pos1 AS (SELECT d1 AS anchor, d2 AS other FROM mh_pairs),
       pos AS (SELECT anchor, other FROM pos1
               UNION SELECT other, anchor FROM pos1),
       pool AS (SELECT doc_id AS other FROM documents
                ORDER BY md5('pool:' || doc_id::VARCHAR), doc_id LIMIT 8),
       anch AS (SELECT DISTINCT anchor FROM pos),
       neg AS (SELECT a.anchor, p.other
         FROM anch a CROSS JOIN pool p
         WHERE a.anchor <> p.other
           AND NOT EXISTS (SELECT 1 FROM pos q
                           WHERE q.anchor = a.anchor AND q.other = p.other))
       SELECT anchor, other, 1 AS label FROM pos
       UNION ALL SELECT anchor, other, 0 AS label FROM neg"""

  /** incrementalDedupLsh replay: the dd_incremental fp layer (md5
    * canonical-text fingerprints), then banded CW matching of the
    * surviving batch against the full old-corpus index (no cap on the
    * incremental path), est ≥ 0.5 ⟺ m ≥ 16. */
  val ddIncrementalLsh: String =
    s"""WITH newd AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
       oldd AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
       nf AS (SELECT doc_id, n_chars, text,
           md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS fp,
           row_number() OVER (
             PARTITION BY md5(lower(trim(regexp_replace(text, ' +', ' ', 'g'))))
             ORDER BY doc_id) AS rn
         FROM newd),
       ofp AS (SELECT DISTINCT md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS fp
               FROM oldd),
       cand AS (SELECT doc_id, n_chars, text FROM nf
                WHERE rn = 1 AND fp NOT IN (SELECT fp FROM ofp)),
       ${sigChain("cand", "cn", "doc_id", 32, 8)},
       ${sigChain("oldd", "od", "doc_id", 32, 8)},
       ${bandExplode("cn")},
       ${bandExplode("od")},
       mt AS (SELECT DISTINCT n.doc_id
         FROM cn_e n JOIN od_e o ON n.band = o.band AND n.bkey = o.bkey
         WHERE len(list_filter(range(1, 33), i -> n.sg[i] = o.sg[i])) >= 16)
       SELECT doc_id, n_chars FROM cand
       WHERE doc_id NOT IN (SELECT doc_id FROM mt)"""

  /** sourceJaccard replay: merged (min of mins) CW signatures per
    * source group — the group slot is the min over the UNION of the
    * group's fingerprints; matching-slot fraction per pair. m/64 is an
    * exact binary double, so round(·, 4) is engine-equal. */
  val txSourceJaccard: String = {
    val (a, b, c) = (CwMinHash.sqlList(CwMinHash.cwA, 64),
      CwMinHash.sqlList(CwMinHash.cwB, 64),
      CwMinHash.sqlList(CwMinHash.cwC, 64))
    s"""WITH d AS (SELECT source, string_split(text, ' ') AS t
           FROM documents WHERE text IS NOT NULL),
       h AS (SELECT source, ${hsExpr(distinct = false)} AS hs FROM d),
       ux AS (SELECT source, unnest(hs) AS x FROM h),
       js AS (SELECT unnest(range(1, 65)) AS j),
       grp AS (SELECT DISTINCT source FROM d),
       slots AS (SELECT g.source, js.j,
           coalesce(min((($a)[js.j] * (x % 1073741824)
             + ($b)[js.j] * (x // 1073741824)
             + ($c)[js.j]) % $P), $P) AS h
         FROM grp g CROSS JOIN js
         LEFT JOIN ux ON ux.source = g.source
         GROUP BY 1, 2)
       SELECT a.source AS ga, b.source AS gb,
         round(sum(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) / 64.0, 4)
           AS est_jaccard
       FROM slots a JOIN slots b ON a.j = b.j AND a.source < b.source
       GROUP BY 1, 2"""
  }

  /** simhashPairs replay over a sketch CTE `$skCte(idAlias, sim)`:
    * identical-sketch collapse (intra pairs at hamming 0), 4×16-bit
    * chunk banding over DISTINCT sketches with the bucket cap REPLAYED
    * (buckets over `cap` distinct sketches drop from that chunk; a
    * sketch pair survives if ANY agreeing chunk is under cap — the
    * capBuckets/bandJoinFirstAgree semantics), hamming ≤ `maxHamming`
    * verify, then member expansion ordered (least, greatest). */
  def simhashPairSelect(skCte: String, idCol: String, d1: String,
                        d2: String, cap: Int, maxHamming: Int,
                        hammingType: String): String =
    s"""sh_ds AS (SELECT DISTINCT sim FROM $skCte),
       sh_ch AS (SELECT sim, CAST(jb AS INT) AS chunk,
           (sim >> (jb * 16)) & 65535 AS cv
         FROM sh_ds CROSS JOIN (SELECT unnest(range(0, 4)) AS jb) rj),
       sh_z AS (SELECT chunk, cv, count(*) AS n FROM sh_ch GROUP BY 1, 2),
       sh_u AS (SELECT sh_ch.* FROM sh_ch JOIN sh_z USING (chunk, cv)
         WHERE n <= $cap),
       sh_sp AS (SELECT DISTINCT a.sim AS sa, b.sim AS sb
         FROM sh_u a JOIN sh_u b ON a.chunk = b.chunk AND a.cv = b.cv
           AND a.sim < b.sim
         WHERE bit_count(xor(a.sim, b.sim)) <= $maxHamming)
       SELECT a.$idCol AS $d1, b.$idCol AS $d2,
         CAST(0 AS $hammingType) AS hamming
       FROM $skCte a JOIN $skCte b
         ON a.sim = b.sim AND a.$idCol < b.$idCol
       UNION ALL
       SELECT least(x.$idCol, y.$idCol) AS $d1,
         greatest(x.$idCol, y.$idCol) AS $d2,
         CAST(bit_count(xor(sh_sp.sa, sh_sp.sb)) AS $hammingType) AS hamming
       FROM sh_sp JOIN $skCte x ON x.sim = sh_sp.sa
         JOIN $skCte y ON y.sim = sh_sp.sb"""

  /** mm_phash replay (r12 flip, r13: the bucket cap is now REPLAYED
    * instead of assumed un-hit — a truncated bucket changes both sides
    * identically, closing the "at oracle scale" comment-shaped
    * assumption): base64-armored payload shingles → two-poly 60-bit
    * SimHash per media, then the same capped banded pairing as
    * dd_simhash at BIGINT hamming. */
  val mmPhash: String =
    s"""WITH media AS (SELECT doc_id AS media_id,
         regexp_replace(to_base64(encode(text)), '(.{4})', '${"\\1"} ', 'g')
           AS txt
       FROM documents),
       tok AS (SELECT media_id, string_split(txt, ' ') AS t FROM media),
       hx AS (SELECT media_id, ${hsExpr(distinct = true)} AS hs FROM tok),
       sk AS (SELECT media_id,
           CAST(list_sum(list_transform(range(0, 60), b ->
             CASE WHEN 2 * list_sum(list_transform(hs, h -> (h >> b) & 1))
                    > len(hs)
               THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS sim
         FROM hx),
       ${simhashPairSelect("sk", "media_id", "m1", "m2", 4096, 3, "BIGINT")}"""

  // ------------------------------------------------------------------
  // Hyperplane-LSH embedding family (r13 flips): the sign of a plane
  // dot decides bucket membership, and the engine computes every dot
  // as a STRICT left-to-right double fold (DotProduct / LshImpl loops)
  // — which DuckDB replays BIT-EXACTLY via list_reduce (products
  // rounded individually, then sequential adds from 0.0; verified
  // equal to the JVM loop on the real embeddings). So bucket ids,
  // candidate sets and the verify cosines all replay with NO rounding
  // convention at the sign boundary. Plane literals are rendered from
  // SimilaritySearch.seededPlanes' own doubles (shortest round-trip
  // repr — both parsers recover identical bits).
  // ------------------------------------------------------------------

  private def planeLit(planes: Seq[Seq[Double]]): String =
    planes.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")

  /** Strict left-to-right double dot of two float vectors (CAST each
    * element), starting from 0.0 — the DotProduct loop verbatim. */
  private def dotVV(a: String, b: String, dim: Int): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       list_transform(range(1, ${dim + 1}), i ->
         CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       (acc, x) -> acc + x)"""

  /** Same fold against an already-double plane list expression. */
  private def dotVP(vec: String, plane: String, dim: Int): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       list_transform(range(1, ${dim + 1}), i ->
         CAST($vec[i] AS DOUBLE) * ($plane)[i])),
       (acc, x) -> acc + x)"""

  /** Per-table sign-bit bucket id over 4 planes at flat-list offset
    * `tExpr`·4 (LshImpl.hyperplaneBuckets / hyperplaneBucket). */
  private def bucketExpr(tExpr: String, dim: Int): String =
    s"""CAST(list_sum(list_transform(range(0, 4), j ->
       CASE WHEN ${dotVP("embedding",
        s"p[CAST(($tExpr) * 4 + j + 1 AS INT)]", dim)} >= 0
         THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT)"""

  /** Engine cosine replay: dot(a,b) / (‖a‖·‖b‖), every factor the same
    * op sequence as VectorFunctions.cosine. */
  private def cosExpr(a: String, b: String, dim: Int): String =
    s"""round(${dotVV(a, b, dim)} /
       (sqrt(${dotVV(a, a, dim)}) * sqrt(${dotVV(b, b, dim)})), 4)"""

  private def lshBucketed(nTables: Int, dim: Int): String =
    s"""b AS (SELECT vec_id, embedding, CAST(t AS INT) AS tbl,
         ${bucketExpr("t", dim)} AS bucket
       FROM embeddings CROSS JOIN pl
         CROSS JOIN (SELECT unnest(range(0, $nTables)) AS t) tb)"""

  /** ann_lsh replay: single-table bucket of every vector, probe = the
    * query's bucket only, exact-cosine top-k. */
  val annLsh: String = {
    val pl = planeLit(operators.SimilaritySearch.seededPlanes(4, 64))
    s"""WITH pl AS (SELECT $pl AS p),
       ${lshBucketed(1, 64)},
       q AS (SELECT embedding AS qe, bucket AS qb FROM b WHERE vec_id = 0)
       SELECT b.vec_id, ${cosExpr("b.embedding", "q.qe", 64)} AS cos,
         b.bucket
       FROM b, q WHERE b.bucket = q.qb AND b.vec_id <> 0
       ORDER BY cos DESC, b.vec_id LIMIT 10"""
  }

  /** ann_lsh_multiprobe replay: the query's bucket plus its 4
    * Hamming-1 neighbors (one sign bit flipped). */
  val annLshMultiprobe: String = {
    val pl = planeLit(operators.SimilaritySearch.seededPlanes(4, 64))
    s"""WITH pl AS (SELECT $pl AS p),
       ${lshBucketed(1, 64)},
       q AS (SELECT embedding AS qe, bucket AS qb FROM b WHERE vec_id = 0)
       SELECT b.vec_id, ${cosExpr("b.embedding", "q.qe", 64)} AS cos,
         b.bucket
       FROM b, q
       WHERE b.vec_id <> 0 AND (b.bucket = q.qb
         OR b.bucket = xor(q.qb, 1) OR b.bucket = xor(q.qb, 2)
         OR b.bucket = xor(q.qb, 4) OR b.bucket = xor(q.qb, 8))
       ORDER BY cos DESC, b.vec_id LIMIT 10"""
  }

  /** dd_embed_neardup_lsh replay: 16-table banding, DISTINCT candidate
    * pairs on (table, bucket), exact-cosine verify ≥ threshold. */
  val ddEmbedNeardupLsh: String = {
    val pl = planeLit(operators.SimilaritySearch.seededPlanes(64, 64))
    s"""WITH pl AS (SELECT $pl AS p),
       ${lshBucketed(16, 64)},
       cand AS (SELECT DISTINCT a.vec_id AS v1, c.vec_id AS v2
         FROM b a JOIN b c ON a.tbl = c.tbl AND a.bucket = c.bucket
           AND a.vec_id < c.vec_id),
       n AS (SELECT vec_id, embedding,
           sqrt(${dotVV("embedding", "embedding", 64)}) AS nrm
         FROM embeddings),
       s AS (SELECT v1, v2,
           round(${dotVV("x.embedding", "y.embedding", 64)}
             / (x.nrm * y.nrm), 4) AS cos
         FROM cand JOIN n x ON v1 = x.vec_id JOIN n y ON v2 = y.vec_id)
       SELECT v1, v2, cos FROM s WHERE cos >= 0.3"""
  }

  /** pipe_decon_embed_lsh replay: 16-table banded candidates (probe =
    * vec_id % 50 = 0 side), then the exact surface's LATTICE verify
    * (floor(x·1000+0.5) integer dot — order-independent) and per-probe
    * rollup; candidate-less probes survive with null max_cos. */
  val pipeDeconEmbedLsh: String = {
    val pl = planeLit(operators.SimilaritySearch.seededPlanes(64, 64))
    s"""WITH pl AS (SELECT $pl AS p),
       ${lshBucketed(16, 64)},
       cand AS (SELECT DISTINCT pb.vec_id AS probe_id, cb.vec_id
         FROM b pb JOIN b cb ON pb.tbl = cb.tbl AND pb.bucket = cb.bucket
         WHERE pb.vec_id % 50 = 0 AND cb.vec_id % 50 <> 0),
       vv AS (SELECT vec_id,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT))
             AS q
         FROM embeddings),
       v AS (SELECT vec_id, q,
           list_aggregate(list_transform(q, y -> y*y), 'sum') AS ssq
         FROM vv),
       d AS (SELECT probe_id, cand.vec_id,
           round(CAST(list_aggregate(list_transform(list_zip(pv.q, cv.q),
             s -> s[1] * s[2]), 'sum') AS DOUBLE)
             / (sqrt(pv.ssq) * sqrt(cv.ssq)), 4) AS cos
         FROM cand JOIN v pv ON cand.probe_id = pv.vec_id
           JOIN v cv ON cand.vec_id = cv.vec_id),
       mx AS (SELECT probe_id, max(cos) AS max_cos,
           CAST(sum(CASE WHEN cos >= 0.9 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_flagged
         FROM d GROUP BY 1),
       best AS (SELECT m.probe_id, m.max_cos,
           min(d.vec_id) AS nearest_id, m.n_flagged
         FROM mx m JOIN d ON d.probe_id = m.probe_id
           AND d.cos = m.max_cos
         GROUP BY 1, 2, 4)
       SELECT pr.vec_id AS probe_id, best.max_cos, best.nearest_id,
         coalesce(best.n_flagged, 0::BIGINT) AS n_flagged
       FROM (SELECT vec_id FROM embeddings WHERE vec_id % 50 = 0) pr
       LEFT JOIN best ON best.probe_id = pr.vec_id"""
  }

  /** dd_simhash replay: poly60 sketches over the documents corpus +
    * the capped banded pairing (cap 4096, hamming ≤ 3). */
  val ddSimhash: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
           FROM documents WHERE text IS NOT NULL),
       hx AS (SELECT doc_id, ${hsExpr(distinct = true)} AS hs FROM d),
       sk AS (SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 60), b ->
             CASE WHEN 2 * list_sum(list_transform(hs, h -> (h >> b) & 1))
                    > len(hs)
               THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS sim
         FROM hx),
       ${simhashPairSelect("sk", "doc_id", "d1", "d2", 4096, 3, "INTEGER")}"""

  /** gr_percolation twin, r14 rework: per-τ connected components via
    * ROUND-UNROLLED hook + pointer-jump min-label propagation (the
    * Shiloach–Vishkin shape dupClusters runs distributed) instead of
    * the all-PAIRS reachability closure — the old `reach` CTE
    * materializes O(n²) rows inside the giant component (≈64M pairs at
    * sf0.05, the ~40-minute long pole of the whole second-seed gate;
    * this form runs in seconds). Each round takes, per node, the min
    * of its label, its neighbors' labels (hook) and its label's label
    * (jump). ROUND BUDGETS ARE MEASURED, NOT THEORETICAL (r14: the
    * "jump halves chains" intuition fails on geometric chain graphs —
    * the label must first ENTER a chain by hooking before jumps
    * compress it, so rounds track graph DIAMETER): the sp_* spatial
    * epsilon graphs need 49/54 rounds at sf0.05/sf0.1, the dense
    * co-purchase percolation graphs ≤ 24; [[CcRoundsDefault]] = 128
    * and [[PercRounds]] = 48 carry ≥2× margin over the worst measured
    * case. NON-CONVERGENCE IS LOUD, not silent: the final select
    * cross-joins a lab_R ≠ lab_{R-1} mismatch count and requires 0,
    * so an unconverged run returns zero rows and fails the driver's
    * row compare (this guard is what caught the 24-round budget the
    * first formulation shipped with). */
  val PercRounds = 48
  val CcRoundsDefault = 128

  /** Generic hook+jump CC rounds over a symmetric `edgesCte(a, b)`:
    * renders `{pre}0..{pre}N` label CTEs plus a convergence-guarded
    * `{pre}cc(node, cluster_id)` — same algorithm and loud-fail
    * contract as [[grPercolation]] (zero rows downstream when
    * lab_N ≠ lab_{N-1}), for the non-τ closures (sp_cluster,
    * sp_dbscan; their epsilon graphs are the measured worst case —
    * see the round-budget note above). Labels cover exactly the
    * nodes with ≥1 edge, and
    * cluster_id = component min INCLUDING self — identical to the old
    * `least(a, min(b))`-over-reach convention. */
  def ccRounds(pre: String, edgesCte: String,
               rounds: Int = CcRoundsDefault): String = {
    val chain = (1 to rounds).map { k =>
      val p = s"$pre${k - 1}"
      s"""$pre$k AS MATERIALIZED (SELECT x.node,
         least(x.l, coalesce(nb.ml, x.l), coalesce(pj.l, x.l)) AS l
         FROM $p x
         LEFT JOIN (SELECT e.a AS node, min(b.l) AS ml
           FROM $edgesCte e JOIN $p b ON e.b = b.node
           GROUP BY 1) nb ON x.node = nb.node
         LEFT JOIN $p pj ON x.l = pj.node)"""
    }.mkString(",\n         ")
    s"""${pre}0 AS MATERIALIZED (SELECT a AS node, least(a, min(b)) AS l
           FROM $edgesCte GROUP BY 1),
         $chain,
         ${pre}conv AS (SELECT count(*) AS n
           FROM $pre$rounds x JOIN $pre${rounds - 1} y
             ON x.node = y.node AND x.l <> y.l),
         ${pre}cc AS (SELECT node, l AS cluster_id FROM $pre$rounds
           CROSS JOIN ${pre}conv WHERE ${pre}conv.n = 0)"""
  }

  val grPercolation: String = {
    val rounds = (1 to PercRounds).map { k =>
      val p = s"lab${k - 1}"
      s"""lab$k AS MATERIALIZED (SELECT a.tau, a.node,
         least(a.l, coalesce(nb.ml, a.l), coalesce(pj.l, a.l)) AS l
         FROM $p a
         LEFT JOIN (SELECT e.tau, e.u AS node, min(b.l) AS ml
           FROM sym e JOIN $p b ON e.tau = b.tau AND e.v = b.node
           GROUP BY 1, 2) nb ON a.tau = nb.tau AND a.node = nb.node
         LEFT JOIN $p pj ON a.tau = pj.tau AND a.l = pj.node)"""
    }.mkString(",\n         ")
    s"""WITH wpairs AS (SELECT o_custkey AS a,
             CAST(l_suppkey + 1000000000 AS BIGINT) AS b,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS w
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           GROUP BY 1, 2),
         canon AS MATERIALIZED (SELECT least(a, b) AS s, greatest(a, b) AS t,
             max(w) AS w
           FROM wpairs WHERE a <> b GROUP BY 1, 2),
         taus AS (SELECT CAST(tau AS BIGINT) AS tau
           FROM (VALUES (1), (2), (3), (4)) tt(tau)),
         sym AS MATERIALIZED (SELECT tau, s AS u, t AS v FROM canon
             JOIN taus ON w >= tau
           UNION ALL SELECT tau, t, s FROM canon JOIN taus ON w >= tau),
         lab0 AS MATERIALIZED (SELECT tau, u AS node, least(u, min(v)) AS l
           FROM sym GROUP BY 1, 2),
         $rounds,
         conv AS (SELECT count(*) AS n_unconverged
           FROM lab$PercRounds x JOIN lab${PercRounds - 1} y
             ON x.tau = y.tau AND x.node = y.node AND x.l <> y.l),
         lab AS (SELECT tau, node, l AS cluster_id FROM lab$PercRounds),
         cs AS (SELECT tau, cluster_id,
             CAST(count(*) AS BIGINT) AS sz
           FROM lab GROUP BY 1, 2),
         per AS (SELECT tau, CAST(sum(sz) AS BIGINT) AS n_nodes,
             CAST(count(*) AS BIGINT) AS n_components,
             CAST(max(sz) AS BIGINT) AS giant
           FROM cs GROUP BY 1),
         ec AS (SELECT tau, CAST(count(*) AS BIGINT) AS n_edges
           FROM canon JOIN taus ON w >= tau GROUP BY 1)
         SELECT taus.tau,
           coalesce(n_nodes, 0) AS n_nodes,
           coalesce(n_edges, 0) AS n_edges,
           coalesce(n_components, 0) AS n_components,
           round(giant / CAST(n_nodes AS DOUBLE), 6) AS giant_share
         FROM taus LEFT JOIN per USING (tau) LEFT JOIN ec USING (tau)
         CROSS JOIN conv WHERE conv.n_unconverged = 0"""
  }
}
