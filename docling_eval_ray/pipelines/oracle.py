"""DuckDB oracle SQL for every SQL-expressible query in ``relational``.

Invariants shared with the Ray implementations (see relational.py header):
identical column names, identical rounding of float aggregates, int64
counts, window keys as ISO strings, exact integer timedelta comparisons.

The span-pipeline oracles (census, timings, markdown, flagship spans,
OCR, reading order) all derive from ONE shared recursive chunk-walk CTE
(`_chunk_walk`) and ONE shared span-synthesis CTE (`_SPANS_CTE`) — the
SQL formalization of sources/interleaved.py's chunk_plan +
synth_spans_for_doc + flagship extraction. A change to the walk or the
kind mapping is made once and every oracle follows.
"""

from __future__ import annotations

from ..stages.knn import HARD_NEG_K, KNN_K, KNN_QUERY, NEAR_DUP_THRESHOLD
from .relational import BLACKLISTED_DOC_IDS, SESSION_GAP_S


def _chunk_walk(doc_filter: str = "") -> str:
    """WITH RECURSIVE prefix: documents → (doc_id, words) → chunk walk
    → per-para (r, chunk). ``doc_filter`` is appended to the documents
    scan (e.g. the status filter ``WHERE doc_id %% 10 <> 3``)."""
    return r"""
        WITH RECURSIVE doc AS (
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                        ELSE regexp_split_to_array(trim(text), '\s+')
                   END AS w
            FROM documents """ + doc_filter + r"""
        ),
        doc2 AS (SELECT doc_id, w, len(w) AS n_words FROM doc),
        chunk AS (
            SELECT doc_id, n_words, 3 AS i, 0 AS para FROM doc2
            UNION ALL
            SELECT doc_id, n_words, i + 4 + (doc_id + 3 * para) % 6, para + 1
            FROM chunk WHERE i < n_words
        ),
        piece AS (
            SELECT c.doc_id, c.para,
                   (c.doc_id * 31 + c.para * 7) % 10 AS r,
                   array_to_string(
                       d.w[c.i + 1 : c.i + 4 + (c.doc_id + 3 * c.para) % 6],
                       ' '
                   ) AS chunk
            FROM chunk c JOIN doc2 d USING (doc_id) WHERE c.i < c.n_words
        )"""


#: extracted span synthesis over the chunk walk: r==3 stripped, r==2
#: emits picture+caption, windowed cumulative counts become offsets
_SPANS_CTE = r""",
        counted AS (
            SELECT doc_id, para, r, chunk,
                   COALESCE(SUM(CASE WHEN r = 3 THEN 0
                                     WHEN r = 2 THEN 2 ELSE 1 END)
                       OVER (PARTITION BY doc_id ORDER BY para
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS prior
            FROM piece
        ),
        spans AS (
            SELECT doc_id, 0 AS off, 'title' AS kind,
                   CASE WHEN n_words = 0 THEN 'untitled'
                        ELSE array_to_string(w[1:3], ' ') END AS text,
                   '' AS media_ref
            FROM doc2
            UNION ALL
            SELECT doc_id, 1 + prior,
                   CASE r WHEN 0 THEN 'section_header'
                          WHEN 1 THEN 'list_item'
                          WHEN 2 THEN 'picture' ELSE 'text' END,
                   CASE WHEN r = 2 THEN '' ELSE chunk END,
                   CASE WHEN r = 2
                        THEN 'pic/' || CAST(doc_id AS VARCHAR)
                             || '/' || CAST(para AS VARCHAR)
                        ELSE '' END
            FROM counted WHERE r <> 3
            UNION ALL
            SELECT doc_id, 2 + prior, 'caption', chunk, ''
            FROM counted WHERE r = 2
        )"""

#: markdown projection of a span CTE named `{src}`: text-bearing spans
#: in offset order with title/section/list prefixes, joined with \n\n
def _md_cte(name: str, src: str) -> str:
    return f""",
        {name} AS (
            SELECT doc_id, string_agg(
                CASE kind WHEN 'title' THEN '# ' || text
                          WHEN 'section_header' THEN '## ' || text
                          WHEN 'list_item' THEN '- ' || text
                          ELSE text END, chr(10) || chr(10)
                ORDER BY off) AS md
            FROM {src} WHERE length(text) > 0 GROUP BY doc_id
        )"""


#: eval_records mutation over the span CTE: L = span count, mode =
#: doc_id%10; mode 0 drops off L//2, mode 1 swaps L//3<->L//3+1,
#: mode 2 appends ' xq' at off L//2 (failure rows pre-filtered by the
#: chunk-walk doc_filter)
_MUTATION_CTE = r""",
        sized AS (
            SELECT s.*, cnt.L, s.doc_id % 10 AS mode
            FROM spans s
            JOIN (SELECT doc_id, count(*) AS L FROM spans GROUP BY doc_id)
                cnt USING (doc_id)
        ),
        pred AS (
            SELECT doc_id, kind, media_ref,
                   CASE WHEN mode = 2 AND off = L // 2 THEN text || ' xq'
                        ELSE text END AS text,
                   CASE WHEN mode = 1 AND L > 2 AND off = L // 3
                            THEN off + 1
                        WHEN mode = 1 AND L > 2 AND off = L // 3 + 1
                            THEN off - 1
                        ELSE off END AS off
            FROM sized
            WHERE NOT (mode = 0 AND L > 2 AND off = L // 2)
        )"""

_STATUS_FILTER = "WHERE doc_id % 10 <> 3"

#: shared exact near-dup fragment: 3-shingle sets → pairwise
#: intersection counts (toks/sh/sizes/inter) — the SQL replica of
#: stages/dedup.py:ngram_jaccard_pairs(k=3). Every near-dup-graph
#: oracle (pairs, clusters, pagerank, degree histogram, k-core)
#: interpolates THIS text so the shingle construction and the 0.1
#: threshold live in exactly one place.
_NEARDUP_INTER_CTE = r"""toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
                        ELSE w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] END AS s
            FROM toks,
                 UNNEST(range(CASE WHEN len(w) < 3 THEN 1
                                   ELSE len(w) - 2 END)) AS t(i)
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )"""

#: …extended to the symmetric edge list of the near-dup graph
_NEARDUP_EDGES_CTE = _NEARDUP_INTER_CTE + """,
        pairs AS (
            SELECT ia AS a, ib AS b
            FROM inter
            JOIN sizes na ON na.doc_id = ia
            JOIN sizes nb ON nb.doc_id = ib
            WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.1
        ),
        edges AS (
            SELECT a AS s, b AS t FROM pairs
            UNION
            SELECT b, a FROM pairs
        )"""

ORACLE_SQL: dict[str, str] = {
    # --- dedup / similarity (training-data ops) ---
    "ngram_jaccard_pairs": f"""
        WITH {_NEARDUP_INTER_CTE}
        SELECT ia AS doc_id_a, ib AS doc_id_b,
               round_even(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) AS jaccard
        FROM inter
        JOIN sizes na ON na.doc_id = ia
        JOIN sizes nb ON nb.doc_id = ib
        WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.1
    """,
    # connected components over the exact near-dup graph: recursive
    # reachability (walk(s,l): node s can reach label l), component id =
    # min reachable doc id — mirrors the Ray min-label propagation
    "near_dup_clusters": f"""
        WITH RECURSIVE {_NEARDUP_EDGES_CTE},
        walk(s, l) AS (
            SELECT s, s FROM (SELECT DISTINCT s FROM edges) nodes
            UNION
            SELECT e.s, w.l FROM edges e JOIN walk w ON e.t = w.s
        )
        SELECT s AS doc_id, min(l) AS cluster_id FROM walk GROUP BY s
    """,
    # same reachability oracle as near_dup_clusters: the star algorithm
    # must produce IDENTICAL components
    "near_dup_clusters_star": f"""
        WITH RECURSIVE {_NEARDUP_EDGES_CTE},
        walk(s, l) AS (
            SELECT s, s FROM (SELECT DISTINCT s FROM edges) nodes
            UNION
            SELECT e.s, w.l FROM edges e JOIN walk w ON e.t = w.s
        )
        SELECT s AS doc_id, min(l) AS cluster_id FROM walk GROUP BY s
    """,
    # exact 8-token-window duplication census (substring-dedup primitive,
    # Lee et al. 2022): per doc, total windows and windows whose exact
    # text recurs in >=2 distinct docs
    "substring_dup_stats": """
        WITH toks AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '\\s+') AS w
            FROM documents
        ),
        wins AS (
            SELECT doc_id,
                   array_to_string(list_slice(w, i, i + 7), ' ') AS wtext
            FROM toks, UNNEST(generate_series(1, len(w) - 7)) AS g(i)
        ),
        df AS (
            SELECT wtext, count(DISTINCT doc_id) AS nd
            FROM wins GROUP BY wtext
        )
        SELECT w.doc_id,
               CAST(count(*) AS BIGINT) AS n_windows,
               CAST(coalesce(sum(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END),
                             0) AS BIGINT) AS n_dup_windows
        FROM wins w JOIN df d USING (wtext)
        GROUP BY w.doc_id
    """,
    # ExactSubstr excision (Lee et al. 2022): duplicated windows survive
    # only in the window's min doc_id; cleaned text = kept tokens joined
    "dedup_substrings_excise": """
        WITH toks AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '\\s+') AS w
            FROM documents
        ),
        wins AS (
            SELECT doc_id, i,
                   array_to_string(list_slice(w, i, i + 7), ' ') AS wtext
            FROM toks, UNNEST(generate_series(1, len(w) - 7)) AS g(i)
        ),
        keepers AS (
            SELECT wtext, min(doc_id) AS keeper
            FROM wins GROUP BY wtext
            HAVING count(DISTINCT doc_id) >= 2
        ),
        rem AS (
            SELECT DISTINCT w.doc_id, u.p
            FROM wins w
            JOIN keepers k USING (wtext),
                 UNNEST(generate_series(w.i, w.i + 7)) AS u(p)
            WHERE w.doc_id != k.keeper
        ),
        tok_rows AS (
            SELECT doc_id, unnest(w) AS tok,
                   unnest(generate_series(1, len(w))) AS p
            FROM toks
        )
        SELECT t.doc_id,
               coalesce(string_agg(t.tok, ' ' ORDER BY t.p)
                        FILTER (WHERE r.p IS NULL), '') AS clean_text,
               CAST(count(r.p) AS BIGINT) AS n_removed
        FROM tok_rows t
        LEFT JOIN rem r ON r.doc_id = t.doc_id AND r.p = t.p
        GROUP BY t.doc_id
    """,
    # FineWeb-style percentile pruning: integer score (share of tokens
    # in the [3,12]-length band, floor %), threshold = quantile_disc
    "quality_percentile_filter": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
            FROM documents
        ),
        scores AS (
            SELECT doc_id,
                   (100 * count(*) FILTER (WHERE len(tok) BETWEEN 3 AND 12))
                       // count(*) AS score
            FROM toks GROUP BY doc_id
        ),
        thr AS (SELECT quantile_disc(score, 0.25) AS t FROM scores)
        SELECT s.doc_id, CAST(s.score AS BIGINT) AS score
        FROM scores s, thr WHERE s.score >= thr.t
    """,
    "token_frequency_topk": """
        SELECT tok AS token, count(*) AS n
        FROM documents,
             UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t(tok)
        GROUP BY tok
        ORDER BY count(*) DESC, tok
        LIMIT 25
    """,
    "deterministic_sample": """
        SELECT doc_id, lang
        FROM documents
        WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) % 100 < 10
    """,
    "embedding_knn": f"""
        SELECT vec_id,
               round_even(list_cosine_similarity(
                   CAST(embedding AS DOUBLE[]), {KNN_QUERY!r}), 6) AS sim
        FROM embeddings
        ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                        {KNN_QUERY!r}) DESC, vec_id
        LIMIT {KNN_K}
    """,
    "embedding_near_dups": f"""
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
               round_even(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])), 6) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
              >= {NEAR_DUP_THRESHOLD}
    """,
    # hard negatives order by the ROUNDED sim (both sides) so BLAS-vs-
    # SQL last-ulp summation differences cannot reorder the top-k
    "knn_hard_negatives": f"""
        WITH sims AS (
            SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
                   round_even(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) AS sim
            FROM embeddings a JOIN embeddings b ON a.label <> b.label
        ),
        r AS (
            SELECT vec_id, neighbor_id, sim,
                   row_number() OVER (
                       PARTITION BY vec_id
                       ORDER BY sim DESC, neighbor_id) AS nr
            FROM sims
        )
        SELECT vec_id, neighbor_id, sim,
               CAST(nr AS BIGINT) AS neighbor_rank
        FROM r WHERE nr <= {HARD_NEG_K}
    """,
    # SQ8: the quantization grid (per-dim min/max), the floor/clip
    # encode and the midpoint decode are replicated with the SAME
    # operation order as stages/knn.py:sq8_knn, so encode/decode are
    # bit-identical; only the final dot/norm summation order differs
    # (rounded 6dp, the established tolerance)
    "sq8_knn": f"""
        WITH vals AS (
            SELECT vec_id,
                   unnest(CAST(embedding AS DOUBLE[])) AS v,
                   generate_subscripts(embedding, 1) AS d
            FROM embeddings
        ),
        dims AS (SELECT d, min(v) AS mn, max(v) AS mx FROM vals GROUP BY d),
        deq AS (
            SELECT vec_id,
                   CASE WHEN mx = mn THEN mn
                        ELSE mn + (least(255.0, greatest(0.0,
                             floor((v - mn) / (mx - mn) * 255.0))) + 0.5)
                             * (mx - mn) / 256.0 END AS xv
            FROM vals JOIN dims USING (d)
        ),
        scored AS (
            SELECT vec_id,
                   round_even(0.125 * sum(xv) / sqrt(sum(xv * xv)), 6)
                       AS sim_sq
            FROM deq GROUP BY vec_id
        )
        SELECT vec_id, sim_sq FROM scored
        ORDER BY sim_sq DESC, vec_id
        LIMIT {KNN_K}
    """,
    # random-hyperplane LSH near-dups: the md5-parity hyperplane matrix
    # is REBUILT in SQL (hp CTE) so candidate banding is bit-identical
    # to stages/knn.py:lsh_hyperplanes; exact cosine verify on top
    "embedding_near_dups_lsh": f"""
        WITH dims AS (
            SELECT vec_id,
                   unnest(CAST(embedding AS DOUBLE[])) AS val,
                   unnest(generate_series(0, len(embedding) - 1)) AS d
            FROM embeddings
        ),
        hp AS (
            SELECT b, d,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(b AS VARCHAR)
                            || '-' || CAST(d AS VARCHAR)), 1, 8))
                            AS UBIGINT) % 2 = 0
                        THEN 1.0 ELSE -1.0 END AS h
            FROM generate_series(0, 127) AS gb(b),
                 generate_series(0, 63) AS gd(d)
        ),
        bits AS (
            -- round_even(..., 6) before the sign test, mirroring the
            -- np.round in stages/knn.py:bandify: keeps near-zero
            -- projections from flipping band bits on FP noise
            SELECT dims.vec_id, hp.b,
                   CASE WHEN round_even(sum(dims.val * hp.h), 6) > 0
                        THEN 1 ELSE 0 END AS bit
            FROM dims JOIN hp USING (d)
            GROUP BY dims.vec_id, hp.b
        ),
        bands AS (
            SELECT vec_id, b // 8 AS band,
                   CAST(sum(bit * (1 << (b % 8))) AS BIGINT) AS bval
            FROM bits GROUP BY vec_id, b // 8
        ),
        cand AS (
            SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
            FROM bands a JOIN bands b USING (band, bval)
            WHERE a.vec_id < b.vec_id
        )
        SELECT ia AS vec_id_a, ib AS vec_id_b,
               round_even(list_cosine_similarity(
                   CAST(ea.embedding AS DOUBLE[]),
                   CAST(eb.embedding AS DOUBLE[])), 6) AS sim
        FROM cand
        JOIN embeddings ea ON ea.vec_id = cand.ia
        JOIN embeddings eb ON eb.vec_id = cand.ib
        WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                     CAST(eb.embedding AS DOUBLE[]))
              >= {NEAR_DUP_THRESHOLD}
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round_even(sum(l_quantity), 2)                                   AS sum_qty,
               round_even(sum(l_extendedprice), 2)                              AS sum_base_price,
               round_even(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
               round_even(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               count(*)                                                    AS count_order,
               round_even(sum(l_quantity) / count(*), 4)                        AS avg_qty,
               round_even(sum(l_extendedprice) / count(*), 4)                   AS avg_price,
               round_even(sum(l_discount) / count(*), 4)                        AS avg_disc
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_revenue_orders": """
        SELECT l_orderkey,
               round_even(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        GROUP BY l_orderkey
        ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, l_orderkey
        LIMIT 10
    """,
    "documents_slice": """
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE doc_id >= 100 AND doc_id < 200
    """,
    "orders_by_segment": """
        SELECT c_mktsegment,
               round_even(sum(o_totalprice), 2) AS sum_totalprice,
               count(*)                    AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "revenue_by_nation": """
        SELECT n_name,
               round_even(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "top2_orders_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders
        QUALIFY row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey
        ) <= 2
    """,
    "documents_blacklist_filter": f"""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE doc_id NOT IN {BLACKLISTED_DOC_IDS!r}
    """,
    "distinct_segments": """
        SELECT DISTINCT c_mktsegment FROM customer
    """,
    "documents_stats": """
        SELECT count(*)                        AS n_docs,
               round_even(avg(n_chars), 4)          AS mean_chars,
               round_even(stddev_samp(n_chars), 4)  AS std_chars,
               min(n_chars)                    AS min_chars,
               max(n_chars)                    AS max_chars
        FROM documents
    """,
    "n_chars_histogram": """
        SELECT CAST(floor(n_chars / 50.0) AS BIGINT) AS bin,
               count(*)                              AS n
        FROM documents
        GROUP BY 1
    """,
    "lang_source_census": """
        SELECT lang, source, count(*) AS n
        FROM documents
        GROUP BY lang, source
    """,
    "document_fingerprints": """
        SELECT doc_id, md5(text) AS fingerprint FROM documents
    """,
    "dedup_exact": """
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    """,
    "token_counts": """
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    """,
    "quality_scores": """
        SELECT doc_id, n_chars,
               round_even(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
                     / CAST(n_chars AS DOUBLE), 6) AS alpha_ratio
        FROM documents
    """,
    "supplier_balance_by_region": """
        SELECT r_name,
               count(*)                          AS n_suppliers,
               round_even(sum(s_acctbal), 2)     AS sum_bal,
               round_even(min(s_acctbal), 2)     AS min_bal,
               round_even(max(s_acctbal), 2)     AS max_bal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "part_size_stats": """
        SELECT p_brand,
               p_size >= 25                       AS is_large,
               count(*)                           AS n_parts,
               round_even(sum(p_retailprice), 2)  AS sum_price
        FROM part
        GROUP BY 1, 2
    """,
    "shipping_priority": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               round_even(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-15'
          AND l_shipdate  > TIMESTAMP '1998-06-15'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, o_orderkey
        LIMIT 10
    """,
    "events_error_rate": """
        SELECT user_id,
               count(*) AS n_events,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_errors,
               round_even(
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*), 6) AS error_rate
        FROM events
        GROUP BY user_id
    """,
    "text_edit_distance": """
        SELECT doc_id,
               CAST(levenshtein(text, replace(text, 'data', 'info'))
                    AS BIGINT) AS edit_dist
        FROM documents
    """,
    "rejection_counts": """
        SELECT CASE WHEN doc_id % 10 = 3 THEN 'failure'
                    ELSE 'success' END AS status,
               count(*) AS n
        FROM documents
        GROUP BY 1
    """,
    "events_hourly": """
        SELECT event_type,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               count(*)               AS n_events,
               round_even(sum(value), 2)   AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "user_sessions": f"""
        SELECT user_id,
               CAST(sum(CASE WHEN prev_ts IS NULL
                              OR date_diff('microsecond', prev_ts, ts)
                                 > {SESSION_GAP_S} * 1000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
            FROM events
        ) t
        GROUP BY user_id
    """,
}


# layout evaluator: the synthesized geometry has an analytic expected
# value — every box is 40x10 on a 100x100 page; mutated docs shift all
# prediction boxes by (2,2), giving IoU = (38*8)/(2*400-38*8) = 0.612903
# for every (pred, own-gt) pair and 0 elsewhere, so each per-class AP is
# exactly 1 at the three IoU thresholds <= 0.6 and 0 at the seven above:
# image_map = 0.3 shifted, 1.0 identical. Any regression in the greedy
# matching, IoU kernel or AP interpolation breaks this hash.
ORACLE_SQL["evaluate_layout"] = """
    SELECT printf('doc-%06d', doc_id) AS doc_id,
           CASE WHEN doc_id % 10 IN (0, 1, 2) THEN 0.3
                ELSE 1.0 END AS image_map
    FROM documents
    WHERE doc_id % 10 <> 3
"""

# ---------------------------------------------------------------------------
# span-pipeline oracles, composed from the shared fragments
# ---------------------------------------------------------------------------

ORACLE_SQL["span_kind_census"] = _chunk_walk() + _SPANS_CTE + """
        SELECT kind, count(*) AS n FROM spans GROUP BY kind
    """

ORACLE_SQL["flagship_spans_flat"] = _chunk_walk() + _SPANS_CTE + """
        SELECT printf('doc-%06d', doc_id) AS doc_id,
               CAST(off AS BIGINT) AS "offset", kind, text, media_ref
        FROM spans
    """

# the raw-HTML extraction path reproduces the flagship span stream
# exactly (shared chunk_plan synthesis; asserted in tests) — same oracle
ORACLE_SQL["html_spans_flat"] = ORACLE_SQL["flagship_spans_flat"]
# the skew-aware extraction path must reproduce the identical stream
ORACLE_SQL["skew_spans_flat"] = ORACLE_SQL["flagship_spans_flat"]

ORACLE_SQL["markdown_export"] = (
    _chunk_walk() + _SPANS_CTE + _md_cte("gt_md", "spans") + """
        SELECT printf('doc-%06d', doc_id) AS doc_id,
               COALESCE(md, '') AS markdown
        FROM doc2 LEFT JOIN gt_md USING (doc_id)
    """
)

ORACLE_SQL["evaluate_timings"] = (
    _chunk_walk(_STATUS_FILTER) + _SPANS_CTE + """,
        timed AS (
            SELECT doc_id, count(*) AS n_spans,
                   round_even(0.01 * count(*) + 0.005 * (doc_id % 7), 6)
                       AS sec_per_doc
            FROM spans GROUP BY doc_id
        )
        SELECT printf('doc-%06d', doc_id) AS doc_id,
               sec_per_doc,
               round_even(sec_per_doc / (1 + n_spans // 12), 6)
                   AS sec_per_page
        FROM timed
    """
)

ORACLE_SQL["evaluate_ocr"] = (
    _chunk_walk(_STATUS_FILTER) + _SPANS_CTE + _MUTATION_CTE
    + _md_cte("gt_md", "sized") + _md_cte("pred_md", "pred") + """,
        scored AS (
            SELECT g.doc_id,
                   CASE WHEN COALESCE(g.md, '') = ''
                          OR COALESCE(p.md, '') = '' THEN 1.0
                        ELSE LEAST(1.0,
                                   CAST(levenshtein(p.md, g.md) AS DOUBLE)
                                   / length(g.md)) END AS c
            FROM gt_md g LEFT JOIN pred_md p USING (doc_id)
        )
        SELECT printf('doc-%06d', doc_id) AS doc_id,
               round_even(c, 6) AS cer,
               round_even(1.0 - c, 6) AS char_accuracy
        FROM scored
    """
)

# reading-order: alignment = positional occurrence matching on the FULL
# span identity (kind, text, media_ref) — the SQL form of the Ray deque
# keyed the same way (evaluate.py) — with pred offsets renumbered after
# deletion and unmatched gt spans falling back to their own position;
# ARD_norm = 1 − Σ|pred−gt|/L²
ORACLE_SQL["evaluate_reading_order"] = (
    _chunk_walk(_STATUS_FILTER) + _SPANS_CTE + _MUTATION_CTE + """,
        pred2 AS (
            SELECT doc_id, kind, text, media_ref,
                   row_number() OVER (PARTITION BY doc_id ORDER BY off)
                       - 1 AS off
            FROM pred
        ),
        gt_k AS (
            SELECT doc_id, kind, text, media_ref, off, L,
                   row_number() OVER (
                       PARTITION BY doc_id, kind, text, media_ref
                       ORDER BY off) AS occ
            FROM sized
        ),
        pred_k AS (
            SELECT doc_id, kind, text, media_ref, off,
                   row_number() OVER (
                       PARTITION BY doc_id, kind, text, media_ref
                       ORDER BY off) AS occ
            FROM pred2
        ),
        aligned AS (
            SELECT g.doc_id, g.L,
                   ABS(COALESCE(p.off, g.off) - g.off) AS dist
            FROM gt_k g
            LEFT JOIN pred_k p
              ON g.doc_id = p.doc_id AND g.kind = p.kind
             AND g.text = p.text AND g.media_ref = p.media_ref
             AND g.occ = p.occ
        )
        SELECT printf('doc-%06d', doc_id) AS doc_id,
               round_even(
                   1.0 - CAST(SUM(dist) AS DOUBLE) / (MAX(L) * MAX(L)), 6
               ) AS ard_norm
        FROM aligned GROUP BY doc_id
    """
)

# token-SET precision/recall/F1 over the gt/pred markdown projections:
# tokenizer = the Ray side's \w+|[^\w\s] regex, set ops via
# list_distinct + list_intersect; empty-side conventions mirror
# functions/textmetrics.set_prf (both empty → 1.0, one empty → 0.0)
ORACLE_SQL["markdown_token_prf"] = (
    _chunk_walk(_STATUS_FILTER) + _SPANS_CTE + _MUTATION_CTE
    + _md_cte("gt_md", "sized") + _md_cte("pred_md", "pred") + r""",
        tok AS (
            SELECT g.doc_id,
                   list_distinct(regexp_extract_all(
                       COALESCE(g.md, ''),
                       '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\r\f\v]')) AS ts,
                   list_distinct(regexp_extract_all(
                       COALESCE(p.md, ''),
                       '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\r\f\v]')) AS ps
            FROM gt_md g LEFT JOIN pred_md p USING (doc_id)
        ),
        sizes AS (
            SELECT doc_id, len(ts) AS nt, len(ps) AS npred,
                   len(list_intersect(ts, ps)) AS ni
            FROM tok
        ),
        pr AS (
            SELECT doc_id,
                   CASE WHEN nt = 0 AND npred = 0 THEN 1.0
                        WHEN npred = 0 THEN 0.0
                        ELSE CAST(ni AS DOUBLE) / npred END AS p,
                   CASE WHEN nt = 0 AND npred = 0 THEN 1.0
                        WHEN nt = 0 THEN 0.0
                        ELSE CAST(ni AS DOUBLE) / nt END AS r
            FROM sizes
        )
        SELECT printf('doc-%06d', doc_id) AS doc_id,
               round_even(p, 6) AS "precision",
               round_even(r, 6) AS recall,
               round_even(CASE WHEN p + r = 0 THEN 0.0
                               ELSE 2 * p * r / (p + r) END, 6) AS f1
        FROM pr
    """
)


# exact quantiles of a numeric column: DuckDB quantile_disc (nearest
# rank, index = ceil(q*n)-1) pins the rank convention the Ray streaming
# rank scan implements
ORACLE_SQL["n_chars_quantiles"] = """
    SELECT unnest([0.25, 0.5, 0.75]) AS q,
           unnest(quantile_disc(n_chars, [0.25, 0.5, 0.75])) AS value
    FROM documents
"""


ORACLE_SQL["lang_chars_quantiles"] = """
    SELECT lang,
           unnest([0.25, 0.5, 0.75]) AS q,
           unnest(quantile_disc(n_chars, [0.25, 0.5, 0.75])) AS value
    FROM documents
    GROUP BY lang
"""


# native ANTI JOIN (not NOT IN): pins the null-key convention the Ray
# semi_anti_join implements — a NULL key never matches, it does not
# empty the result
ORACLE_SQL["orders_without_lineitems"] = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ANTI JOIN lineitem ON o_orderkey = l_orderkey
"""

# leakage-safe split: near-dup components share a split by
# construction — the cluster map CTE composes the recursive
# reachability walk with the md5-mod split arithmetic
ORACLE_SQL["leakage_safe_split"] = f"""
    WITH RECURSIVE {_NEARDUP_EDGES_CTE},
    walk(s, l) AS (
        SELECT s, s FROM (SELECT DISTINCT s FROM edges) nodes
        UNION
        SELECT e.s, w.l FROM edges e JOIN walk w ON e.t = w.s
    ),
    cmap AS (SELECT s AS doc_id, min(l) AS cluster_id FROM walk GROUP BY s)
    SELECT CAST(
               CAST(('0x' || substr(md5(CAST(
                   COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 8))
                   AS UBIGINT) % 10 AS BIGINT) AS split,
           count(*) AS n_docs
    FROM documents d LEFT JOIN cmap c USING (doc_id)
    GROUP BY 1
"""

# the Bloom-prefiltered plan computes the SAME rows (one-sided error:
# misses are definite absences; passes re-verified by the exact join)
ORACLE_SQL["orders_without_lineitems_bloom"] = \
    ORACLE_SQL["orders_without_lineitems"]


# as-of join: DuckDB's native ASOF LEFT JOIN pins the semantics (most
# recent right row at-or-before the left timestamp, per key)
ORACLE_SQL["events_asof_last_error"] = """
    SELECT c.event_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           COALESCE(strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f'), '')
               AS last_error_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id AND c.ts >= e.ts
"""


# range join: the same literal bands as a VALUES table, joined on
# interval containment
from .relational import SIZE_BANDS as _BANDS

_BAND_VALUES = ", ".join(f"({lo}, {hi}, '{nm}')" for lo, hi, nm in _BANDS)
ORACLE_SQL["documents_size_bands"] = f"""
    SELECT d.doc_id, d.n_chars, b.band
    FROM documents d
    JOIN (VALUES {_BAND_VALUES}) AS b(lo, hi, band)
      ON d.n_chars >= b.lo AND d.n_chars < b.hi
"""


# ---------------------------------------------------------------------------
# corpus-hygiene ops (pipelines/corpus_ops.py): repetition quality,
# decontamination, TF-IDF, heavy hitters, stratified sampling, simhash,
# language ID, hopping windows, centroid assignment — all sharing the
# whitespace-token unnest CTE
# ---------------------------------------------------------------------------

#: (doc_id, tok, ord) token stream — SQL replica of text.split()
_TOKS_CTE = r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
               generate_subscripts(
                   regexp_split_to_array(trim(text), '\s+'), 1) AS ord
        FROM documents
    )"""

ORACLE_SQL["quality_repetition"] = _TOKS_CTE + r""",
    percount AS (
        SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
    ),
    stats AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*)               AS nd,
               max(c)                 AS mx
        FROM percount GROUP BY doc_id
    ),
    bg AS (
        SELECT a.doc_id, a.tok || ' ' || b.tok AS g
        FROM toks a JOIN toks b
          ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
    ),
    bgm AS (
        SELECT doc_id, max(c) AS top_bg
        FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
        GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_tokens,
           round_even(1.0 - CAST(s.nd AS DOUBLE) / s.n_tokens, 6)
               AS dup_token_frac,
           round_even(CAST(s.mx AS DOUBLE) / s.n_tokens, 6)
               AS top_token_frac,
           round_even(CASE WHEN s.n_tokens > 1
                           THEN CAST(COALESCE(m.top_bg, 0) AS DOUBLE)
                                / (s.n_tokens - 1)
                           ELSE 0.0 END, 6) AS top_bigram_frac
    FROM stats s LEFT JOIN bgm m USING (doc_id)
"""

from .corpus_ops import BENCH_MAX_DOC_ID as _BENCH_MAX

ORACLE_SQL["decontaminate_ngrams"] = r"""
    WITH base AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id, array_to_string(a[i : i + 7], ' ') AS g
        FROM (SELECT doc_id, a,
                     unnest(generate_series(1, len(a) - 7)) AS i
              FROM base)
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < """ + str(
        _BENCH_MAX) + r"""),
    hits AS (
        SELECT d.doc_id, count(*) AS c
        FROM grams d JOIN bench USING (g)
        GROUP BY d.doc_id
    )
    SELECT b.doc_id,
           CAST(COALESCE(h.c, 0) AS BIGINT) AS n_contaminated,
           CAST(COALESCE(h.c, 0) > 0 AS BIGINT) AS contaminated
    FROM base b LEFT JOIN hits h USING (doc_id)
"""

# the Bloom tier's exact-verify join (stages/bloom.py:decontaminate_bloom)
# makes its output deterministic and identical to the exact op: misses
# short-circuit (one-sided error), passes are re-verified against the
# literal gram table — so the SAME SQL is the oracle for both tiers.
ORACLE_SQL["decontaminate_bloom"] = ORACLE_SQL["decontaminate_ngrams"]

from .corpus_ops import TFIDF_K as _TFIDF_K

ORACLE_SQL["tfidf_topk"] = _TOKS_CTE + r""",
    tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, sum(c) AS n FROM tc GROUP BY doc_id),
    df AS (SELECT tok, count(*) AS df FROM tc GROUP BY tok),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
    scored AS (
        SELECT t.doc_id, t.tok,
               (CAST(t.c AS DOUBLE) / CAST(d.n AS DOUBLE))
               * (nn.nd / CAST(f.df AS DOUBLE)) AS s
        FROM tc t
        JOIN dl d USING (doc_id)
        JOIN df f USING (tok)
        CROSS JOIN nn
    )
    SELECT doc_id, tok AS token, CAST(rn AS BIGINT) AS rank,
           round_even(s, 6) AS tfidf
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY s DESC, tok
        ) AS rn FROM scored
    )
    WHERE rn <= """ + str(_TFIDF_K) + "\n"

from .corpus_ops import HH_THETA as _HH_THETA

ORACLE_SQL["token_heavy_hitters"] = _TOKS_CTE + f"""
    SELECT tok AS token, count(*) AS n
    FROM toks
    GROUP BY tok
    HAVING count(*) * {_HH_THETA} > (SELECT count(*) FROM toks)
"""

from .corpus_ops import STRATA_DEFAULT_RATE as _STRATA_DEF
from .corpus_ops import STRATA_RATES as _STRATA

_STRATA_CASE = " ".join(
    f"WHEN '{lg}' THEN {rate}" for lg, rate in _STRATA.items()
)
ORACLE_SQL["stratified_sample"] = f"""
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) % 100
          < CASE lang {_STRATA_CASE} ELSE {_STRATA_DEF} END
"""

# SimHash: bit-vote replica — token hash = top 8 bytes of md5, per-bit
# majority over token multiset, reassembled via HUGEINT shifts
#: shared SimHash bit-vote fragment (token hash = top 8 bytes of md5,
#: per-bit majority over the token multiset, HUGEINT reassembly) —
#: used by the fingerprint census AND the Hamming-pair detector
_SIMHASH_FP_CTE = r"""
    toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ),
    th AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT) AS h
        FROM toks
    ),
    bits AS (
        SELECT doc_id, g.b,
               sum(CASE WHEN (h >> g.b) & 1 = 1 THEN 1 ELSE 0 END) AS ones,
               count(*) AS n
        FROM th CROSS JOIN generate_series(0, 63) AS g(b)
        GROUP BY doc_id, g.b
    ),
    fp AS (
        SELECT doc_id,
               sum(CASE WHEN ones * 2 > n
                        THEN (CAST(1 AS HUGEINT) << b)
                        ELSE CAST(0 AS HUGEINT) END) AS v
        FROM bits GROUP BY doc_id
    )
"""

ORACLE_SQL["simhash_fingerprints"] = f"""
    WITH {_SIMHASH_FP_CTE}
    SELECT d.doc_id,
           lpad(lower(hex(CAST(COALESCE(f.v, 0) AS UBIGINT))), 16, '0')
               AS simhash
    FROM documents d LEFT JOIN fp f USING (doc_id)
"""

# SimHash Hamming-ball pairs: the banded Ray plan is EXACT (pigeonhole
# over max_hamming+1 disjoint bands), so the oracle is the brute-force
# self-join over the same fingerprints
ORACLE_SQL["simhash_near_dups"] = f"""
    WITH {_SIMHASH_FP_CTE},
    fps AS (
        SELECT d.doc_id, CAST(COALESCE(f.v, 0) AS UBIGINT) AS v
        FROM documents d LEFT JOIN fp f USING (doc_id)
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CAST(bit_count(xor(a.v, b.v)) AS BIGINT) AS hamming
    FROM fps a JOIN fps b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.v, b.v)) <= 3
"""

# language ID: stopword-rate argmax with first-max tie-break in profile
# order (en, es, de, fr) and the CJK charset gate — the SQL replica of
# stages/textstats.py:LangId.classify
from ..stages.textstats import _PROFILES as _LANG_PROFILES


def _lang_rate_arm(lang: str) -> str:
    toks = ", ".join(f"'{t}'" for t in sorted(_LANG_PROFILES[lang]))
    return (f"sum(CASE WHEN tok IN ({toks}) THEN 1 ELSE 0 END)"
            f" / CAST(count(*) AS DOUBLE) AS r_{lang}")


ORACLE_SQL["language_id"] = r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                   AS tok
        FROM documents WHERE trim(text) <> ''
    ),
    rates AS (
        SELECT doc_id,
               """ + ",\n               ".join(
    _lang_rate_arm(lg) for lg in _LANG_PROFILES
) + r"""
        FROM toks GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN regexp_matches(substr(d.text, 1, 512), '[一-鿿]')
                    THEN 'zh'
                WHEN r.doc_id IS NULL
                  OR greatest(r.r_en, r.r_es, r.r_de, r.r_fr) = 0
                    THEN 'und'
                WHEN r.r_en = greatest(r.r_en, r.r_es, r.r_de, r.r_fr)
                    THEN 'en'
                WHEN r.r_es = greatest(r.r_en, r.r_es, r.r_de, r.r_fr)
                    THEN 'es'
                WHEN r.r_de = greatest(r.r_en, r.r_es, r.r_de, r.r_fr)
                    THEN 'de'
                ELSE 'fr'
           END AS lang_pred
    FROM documents d LEFT JOIN rates r USING (doc_id)
"""

ORACLE_SQL["events_hopping"] = """
    SELECT event_type,
           strftime(time_bucket(INTERVAL '30 minutes', ts)
                    - g.k * INTERVAL '30 minutes',
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*)                  AS n_events,
           round_even(sum(value), 2) AS sum_value
    FROM events CROSS JOIN generate_series(0, 1) AS g(k)
    GROUP BY 1, 2
"""


def _centroid_assign_sql() -> str:
    """UNION-of-centroid-arms nearest-assignment; literals via repr so
    the SQL doubles equal the numpy centroid matrix exactly."""
    from .corpus_ops import N_CENTROIDS, cluster_centroids

    cents = cluster_centroids()
    arms = []
    for ci in range(N_CENTROIDS):
        lit = "[" + ", ".join(repr(v) for v in cents[ci]) + "]"
        arms.append(
            f"SELECT vec_id, {ci} AS c, list_cosine_similarity("
            f"CAST(embedding AS DOUBLE[]), {lit}) AS s FROM embeddings"
        )
    union = " UNION ALL ".join(arms)
    return f"""
    SELECT vec_id, CAST(c AS BIGINT) AS cluster, round_even(s, 6) AS sim
    FROM ({union})
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c) = 1
"""


ORACLE_SQL["embedding_cluster_assign"] = _centroid_assign_sql()


def _minhash_sql() -> str:
    """Full SQL replica of ``minhash_near_dups`` (LSH candidates +
    exact verification): rebuilds the 128-perm signatures from the SAME
    deterministic (a, b) parameters embedded as literals, bands by
    4-row min-vector equality (≡ the band-hash grouping, modulo a
    negligible 64-bit hash collision), then verifies candidate pairs
    with exact distinct-shingle Jaccard and the same rounded-threshold
    filter."""
    from ..stages.dedup import MinHasher

    mh = MinHasher()  # default num_perm=128, bands=32, k=3, seed=42
    rows = ", ".join(
        f"({i}, {int(a)}, {int(b)})"
        for i, (a, b) in enumerate(zip(mh._a, mh._b))
    )
    r = mh._rows
    return r"""
    WITH base AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id, g FROM (
            SELECT doc_id, array_to_string(a, ' ') AS g
            FROM base WHERE len(a) < 3
            UNION ALL
            SELECT doc_id, array_to_string(a[i : i + 2], ' ')
            FROM (SELECT doc_id, a,
                         unnest(generate_series(1, len(a) - 2)) AS i
                  FROM base WHERE len(a) >= 3)
        )
    ),
    x AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(g), 1, 16)) AS UBIGINT)
                   % 2147483647 AS x
        FROM grams
    ),
    perm AS (
        SELECT i, CAST(pa AS UBIGINT) AS pa, CAST(pb AS UBIGINT) AS pb
        FROM (VALUES """ + rows + r""") AS p(i, pa, pb)
    ),
    sig AS (
        SELECT doc_id, p.i, min((p.pa * x.x + p.pb) % 2147483647) AS m
        FROM x CROSS JOIN perm p GROUP BY doc_id, p.i
    ),
    bands AS (
        SELECT doc_id, i // """ + str(r) + r""" AS band,
               string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bkey
        FROM sig GROUP BY doc_id, i // """ + str(r) + r"""
    ),
    cand AS (
        SELECT DISTINCT lo.doc_id AS da, hi.doc_id AS db
        FROM bands lo JOIN bands hi
          ON lo.band = hi.band AND lo.bkey = hi.bkey
         AND lo.doc_id < hi.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
        SELECT c.da, c.db, count(*) AS nc
        FROM cand c
        JOIN grams ga ON ga.doc_id = c.da
        JOIN grams gb ON gb.doc_id = c.db AND gb.g = ga.g
        GROUP BY c.da, c.db
    )
    SELECT i.da AS doc_id_a, i.db AS doc_id_b,
           round_even(CAST(i.nc AS DOUBLE) / (sa.n + sb.n - i.nc), 6)
               AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.da
    JOIN sizes sb ON sb.doc_id = i.db
    WHERE round_even(CAST(i.nc AS DOUBLE) / (sa.n + sb.n - i.nc), 6) >= 0.5
"""


ORACLE_SQL["minhash_near_dups"] = _minhash_sql()


def _winnow_sql() -> str:
    """SQL replica of ``textstats.document_winnow``: the k-gram
    polynomial rolling hash (base B, mod 2^64) is rebuilt per window
    start as ONE inlined 16-term HUGEINT expression (power-of-B
    constants precomputed mod 2^64 as literals), then winnowed with a
    ROWS-window min. Short-document branches mirror the kernel: n <
    KGRAM → single byte-sum fingerprint; fewer than WINDOW hashes → the
    hashes themselves. Text is ASCII in this corpus, so
    unicode(substr(text, i, 1)) == the utf-8 byte the kernel hashes."""
    from ..stages.textstats import _BASE, _KGRAM, _WINDOW

    B, K, W, M = int(_BASE), _KGRAM, _WINDOW, 1 << 64
    terms = " + ".join(
        f"CAST(unicode(substr(text, s + {t}, 1)) AS HUGEINT)"
        f" * CAST('{pow(B, K - 1 - t, M)}' AS HUGEINT)"
        for t in range(K)
    )
    return r"""
    WITH docs AS (SELECT doc_id, text, length(text) AS n FROM documents),
    h AS (
        SELECT doc_id, s,
               CAST((""" + terms + r""")
                    % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT)
                   AS h
        FROM (SELECT doc_id, text,
                     unnest(generate_series(1, length(text) - """ + str(
        K - 1) + r""")) AS s
              FROM docs WHERE n >= """ + str(K) + r""")
    ),
    wm AS (
        SELECT doc_id, s, h,
               min(h) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN CURRENT ROW AND """ + str(
        W - 1) + r""" FOLLOWING) AS m,
               count(*) OVER (PARTITION BY doc_id) AS ln
        FROM h
    ),
    fp_long AS (
        SELECT DISTINCT doc_id, m AS fp FROM wm
        WHERE ln >= """ + str(W) + r""" AND s <= ln - """ + str(
        W - 1) + r"""
    ),
    fp_short AS (
        SELECT DISTINCT doc_id, h AS fp FROM wm WHERE ln < """ + str(
        W) + r"""
    ),
    fp_tiny AS (
        SELECT doc_id, CAST(sum(unicode(substr(text, i, 1))) AS UBIGINT)
                   AS fp
        FROM (SELECT doc_id, text,
                     unnest(generate_series(1, length(text))) AS i
              FROM docs WHERE n > 0 AND n < """ + str(K) + r""")
        GROUP BY doc_id
    ),
    allfp AS (
        SELECT * FROM fp_long UNION ALL
        SELECT * FROM fp_short UNION ALL
        SELECT * FROM fp_tiny
    ),
    agg AS (
        SELECT doc_id, count(*) AS nf, min(fp) AS mn FROM allfp
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(a.nf, 0) AS BIGINT) AS n_fingerprints,
           CASE WHEN a.doc_id IS NULL THEN ''
                ELSE lpad(lower(hex(a.mn)), 16, '0') END AS min_fingerprint
    FROM documents d LEFT JOIN agg a USING (doc_id)
"""


ORACLE_SQL["document_winnow"] = _winnow_sql()


from .corpus_ops import PACK_BUCKET as _PACK_BUCKET
from .corpus_ops import PACK_CAP as _PACK_CAP
from .corpus_ops import PACK_SEQ_STRIDE as _PACK_STRIDE

# sequence packing: the greedy per-bucket walk is a recursive CTE over
# doc_id-ordered rows (≤ PACK_BUCKET recursion depth per bucket) — the
# SQL formalization of corpus_ops._greedy_pack
ORACLE_SQL["pack_sequences"] = r"""
    WITH RECURSIVE counts AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens,
               doc_id // """ + str(_PACK_BUCKET) + r""" AS bucket
        FROM documents
    ),
    ordered AS (
        SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id)
                      AS rn
        FROM counts
    ),
    walk AS (
        SELECT bucket, rn, doc_id, n_tokens,
               CAST(0 AS BIGINT) AS seq,
               CAST(0 AS BIGINT) AS st,
               n_tokens AS cur
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.bucket, o.rn, o.doc_id, o.n_tokens,
               CASE WHEN w.cur + o.n_tokens > """ + str(_PACK_CAP) + r"""
                    THEN w.seq + 1 ELSE w.seq END,
               CASE WHEN w.cur + o.n_tokens > """ + str(_PACK_CAP) + r"""
                    THEN CAST(0 AS BIGINT) ELSE w.cur END,
               CASE WHEN w.cur + o.n_tokens > """ + str(_PACK_CAP) + r"""
                    THEN o.n_tokens ELSE w.cur + o.n_tokens END
        FROM walk w JOIN ordered o
          ON o.bucket = w.bucket AND o.rn = w.rn + 1
    )
    SELECT doc_id, n_tokens,
           bucket * """ + str(_PACK_STRIDE) + r""" + seq AS seq_id,
           st AS seq_offset
    FROM walk
"""


def _kmeans_cte() -> str:
    """2-iteration Lloyd replica CTE chain (ends at the final assignment
    ``a2``): literal starting centroids, cosine argmax assignment
    (first-max tie-break via cluster order), per-dim AVG centroid update
    rebuilt with list(m ORDER BY d), empty clusters keeping their
    previous centroid via COALESCE. Shared by the ``kmeans_assign`` and
    ``semdedup_prune`` oracles."""
    from .corpus_ops import KMEANS_ITERS, N_CENTROIDS, cluster_centroids

    cents = cluster_centroids()

    def lit(row):
        return "[" + ", ".join(repr(v) for v in row) + "]"

    cent0 = " UNION ALL ".join(
        f"SELECT {c} AS cluster, {lit(cents[c])} AS cv"
        for c in range(N_CENTROIDS)
    )

    def assign(cent_cte, out):
        return f"""
    {out}_s AS (
        SELECT e.vec_id, c.cluster,
               list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv)
                   AS s
        FROM embeddings e CROSS JOIN {cent_cte} c
    ),
    {out} AS (
        SELECT vec_id, cluster, s FROM {out}_s
        QUALIFY row_number() OVER (
            PARTITION BY vec_id ORDER BY s DESC, cluster) = 1
    )"""

    def update(assign_cte, prev_cent, out):
        return f"""
    {out}_u AS (
        SELECT a.cluster, d.d, avg(d.v) AS m
        FROM (SELECT vec_id,
                     unnest(CAST(embedding AS DOUBLE[])) AS v,
                     generate_subscripts(embedding, 1) AS d
              FROM embeddings) d
        JOIN {assign_cte} a USING (vec_id)
        GROUP BY a.cluster, d.d
    ),
    {out} AS (
        SELECT p.cluster, COALESCE(u.cv, p.cv) AS cv
        FROM {prev_cent} p
        LEFT JOIN (SELECT cluster, list(m ORDER BY d) AS cv
                   FROM {out}_u GROUP BY cluster) u USING (cluster)
    )"""

    assert KMEANS_ITERS == 2, "SQL replica is written for 2 iterations"
    return (
        "WITH cent0 AS (" + cent0 + "),"
        + assign("cent0", "a0") + ","
        + update("a0", "cent0", "cent1") + ","
        + assign("cent1", "a1") + ","
        + update("a1", "cent1", "cent2") + ","
        + assign("cent2", "a2")
    )


def _kmeans_sql() -> str:
    """Final per-vector assignment over the shared Lloyd CTE chain."""
    return (
        _kmeans_cte()
        + """
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
           round_even(s, 6) AS sim
    FROM a2
"""
    )


def _semdedup_sql() -> str:
    """SemDeDup replica: same Lloyd chain to the final assignment
    ``a2``, then the star-graph keep rule — a vector is pruned iff some
    LOWER vec_id in the SAME cluster has round_even(cosine, 6) > tau
    (the correlated EXISTS scans every lower vector, pruned or not,
    exactly like the Ray side's lower-triangle mask)."""
    from .corpus_ops import SEMDEDUP_TAU

    return (
        _kmeans_cte()
        + f"""
    SELECT x.vec_id, CAST(x.cluster AS BIGINT) AS cluster,
           CAST(CASE WHEN EXISTS (
               SELECT 1
               FROM a2 y JOIN embeddings ey ON ey.vec_id = y.vec_id
               WHERE y.cluster = x.cluster AND y.vec_id < x.vec_id
                 AND round_even(list_cosine_similarity(
                         CAST(ex.embedding AS DOUBLE[]),
                         CAST(ey.embedding AS DOUBLE[])), 6)
                     > {SEMDEDUP_TAU!r}
           ) THEN 0 ELSE 1 END AS BIGINT) AS kept
    FROM a2 x JOIN embeddings ex ON ex.vec_id = x.vec_id
"""
    )


ORACLE_SQL["kmeans_assign"] = _kmeans_sql()
ORACLE_SQL["semdedup_prune"] = _semdedup_sql()


def _dsir_sql() -> str:
    """DSIR replica: adjacent-token bigrams (the _TOKS_CTE token
    definition + ord-join), md5-prefix bucket hash (the documented
    ``md5_prefix32`` SQL twin), add-1-smoothed target/raw bucket
    models, per-bucket micro-log ratio quantized to INT64 with
    ``round_even`` (matching numpy's half-even ``np.round``), then an
    exact integer per-doc sum — summation order cannot matter."""
    from .corpus_ops import DSIR_BUCKETS, DSIR_TARGET_LANG

    b, lang = DSIR_BUCKETS, DSIR_TARGET_LANG
    return (
        _TOKS_CTE
        + f""",
    big AS (
        SELECT a.doc_id,
               CAST(CAST(('0x' || substr(md5(a.tok || ' ' || b.tok), 1, 8))
                         AS UBIGINT) % {b} AS BIGINT) AS bucket
        FROM toks a JOIN toks b
          ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
    ),
    raw AS (SELECT bucket, count(*) AS c FROM big GROUP BY 1),
    tgt AS (SELECT bucket, count(*) AS c
            FROM big JOIN documents USING (doc_id)
            WHERE lang = '{lang}' GROUP BY 1),
    tot AS (SELECT (SELECT COALESCE(sum(c), 0) FROM tgt) AS t,
                   (SELECT COALESCE(sum(c), 0) FROM raw) AS r),
    sv AS (
        SELECT g.bucket,
               CAST(round_even(1000000.0 * (
                   ln((COALESCE(t.c, 0) + 1.0) / (tot.t + {b}))
                 - ln((COALESCE(r.c, 0) + 1.0) / (tot.r + {b}))), 0)
                    AS BIGINT) AS s
        FROM (SELECT unnest(range({b})) AS bucket) g
        LEFT JOIN tgt t USING (bucket)
        LEFT JOIN raw r USING (bucket)
        CROSS JOIN tot
    ),
    sc AS (SELECT big.doc_id, sum(sv.s) AS score, count(*) AS nb
           FROM big JOIN sv USING (bucket) GROUP BY 1)
    SELECT d.doc_id,
           CAST(COALESCE(sc.score, 0) AS BIGINT) AS score_micro,
           CAST(COALESCE(sc.nb, 0) AS BIGINT) AS n_bigrams
    FROM documents d LEFT JOIN sc USING (doc_id)
"""
    )


ORACLE_SQL["dsir_weights"] = _dsir_sql()


# raw interleaved span synthesis (sources/interleaved.py:synth_spans_for_doc
# BEFORE extraction): page_header/title … page_footer, r==3 nav
# boilerplate, r==4-even whitespace-noisy paragraphs — over the shared
# chunk walk
_RAW_SPANS_CTE = r""",
    counted_raw AS (
        SELECT doc_id, para, r, chunk,
               COALESCE(SUM(CASE WHEN r = 2 THEN 2 ELSE 1 END)
                   OVER (PARTITION BY doc_id ORDER BY para
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS prior
        FROM piece
    ),
    totals AS (
        SELECT d.doc_id,
               COALESCE(sum(CASE WHEN p.r = 2 THEN 2 ELSE 1 END), 0) AS tot
        FROM doc2 d LEFT JOIN piece p USING (doc_id)
        GROUP BY d.doc_id
    ),
    rawspans AS (
        SELECT doc_id, 0 AS off, 'page_header' AS kind,
               'corpus-' || CAST(doc_id % 7 AS VARCHAR)
                   || ' · internal use only' AS text,
               '' AS media_ref
        FROM doc2
        UNION ALL
        SELECT doc_id, 1, 'title',
               CASE WHEN n_words = 0 THEN 'untitled'
                    ELSE array_to_string(w[1:3], ' ') END, ''
        FROM doc2
        UNION ALL
        SELECT doc_id, 2 + prior,
               CASE r WHEN 0 THEN 'section_header'
                      WHEN 1 THEN 'list_item'
                      WHEN 2 THEN 'picture' ELSE 'text' END,
               CASE WHEN r = 2 THEN ''
                    WHEN r = 3 THEN 'home | ' || array_to_string(
                        regexp_split_to_array(chunk, ' ')[1:4], ' | ')
                        || ' | contact'
                    WHEN r = 4 AND para % 2 = 0 THEN
                        CASE WHEN len(regexp_split_to_array(chunk, ' ')) >= 3
                             THEN '  ' || regexp_split_to_array(chunk, ' ')[1]
                                  || '   '
                                  || regexp_split_to_array(chunk, ' ')[2]
                                  || '   '
                                  || array_to_string(
                                      regexp_split_to_array(chunk, ' ')[3:],
                                      ' ') || ' '
                             WHEN len(regexp_split_to_array(chunk, ' ')) = 2
                             THEN '  ' || regexp_split_to_array(chunk, ' ')[1]
                                  || '   '
                                  || regexp_split_to_array(chunk, ' ')[2]
                                  || ' '
                             ELSE '  ' || chunk || ' ' END
                    ELSE chunk END,
               CASE WHEN r = 2 THEN 'pic/' || CAST(doc_id AS VARCHAR)
                        || '/' || CAST(para AS VARCHAR)
                    ELSE '' END
        FROM counted_raw
        UNION ALL
        SELECT doc_id, 3 + prior, 'caption', chunk, ''
        FROM counted_raw WHERE r = 2
        UNION ALL
        SELECT doc_id, 2 + tot, 'page_footer',
               'page 1 of 1 — doc ' || CAST(doc_id AS VARCHAR), ''
        FROM totals
    )"""

# S9 slicer: window starts range(0, max(1, n-overlap), stride) with
# stride = slice_length - overlap = 6; offsets renumbered per window
ORACLE_SQL["sliced_spans_flat"] = _chunk_walk() + _RAW_SPANS_CTE + r""",
    ns AS (SELECT doc_id, count(*) AS n FROM rawspans GROUP BY doc_id),
    starts AS (
        SELECT doc_id,
               unnest(generate_series(0, greatest(1, n - 2) - 1, 6)) AS s0,
               generate_subscripts(
                   generate_series(0, greatest(1, n - 2) - 1, 6), 1) - 1 AS k
        FROM ns
    )
    SELECT 'doc-' || printf('%06d', st.doc_id) || '#'
               || CAST(st.k AS VARCHAR) AS slice_id,
           r.kind, r.text, r.media_ref,
           CAST(r.off - st.s0 AS BIGINT) AS "offset"
    FROM starts st
    JOIN rawspans r
      ON r.doc_id = st.doc_id AND r.off >= st.s0 AND r.off < st.s0 + 8
"""


from .corpus_ops import SAMPLE_PER_STRATUM as _SAMPLE_N

# exact-size per-stratum sample: n smallest md5-prefix hashes per lang
# (md5 prefix < 2^32 so the unsigned SQL sort order == the int64 Python
# sort order)
ORACLE_SQL["fixed_size_sample"] = f"""
    SELECT doc_id, lang
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY lang
        ORDER BY CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT), doc_id
    ) <= {_SAMPLE_N}
"""


# ---------------------------------------------------------------------------
# content-cleaning ops (pipelines/cleaning.py): PII redaction,
# segment-level dedup, unigram-LM perplexity — plus the running-total
# window aggregate (relational.py events_running_total)
# ---------------------------------------------------------------------------

# cumulative window per user, frame ordered by (ts, event_id); the Ray
# side's per-group pandas cumsum is the same sequential association
ORACLE_SQL["events_running_total"] = r"""
    SELECT user_id, event_id,
           CAST(row_number() OVER w AS BIGINT) AS row_num,
           round_even(sum(value) OVER w, 2) AS running_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING)
"""

# PII synthesis replica of cleaning._synth_pii (deterministic from
# doc_id, same CASE gating), then RE2 count + chained global replace in
# the same fixed order (email -> ip -> phone)
ORACLE_SQL["pii_redact"] = r"""
    WITH p AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 3 <> 0
                       THEN ' contact u' || doc_id || '@mail'
                            || (doc_id % 7) || '.com'
                       ELSE '' END
               || CASE WHEN doc_id % 4 <> 0
                       THEN ' from 10.' || (doc_id % 256) || '.'
                            || ((doc_id * 7) % 256) || '.'
                            || (doc_id % 100)
                       ELSE '' END
               || CASE WHEN doc_id % 5 <> 0
                       THEN ' call 555-' || (1000 + doc_id % 9000)
                       ELSE '' END AS ptext
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(ptext,
               '[a-z0-9]+@[a-z0-9]+\.com')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(ptext,
               '\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT)
               AS n_ips,
           CAST(len(regexp_extract_all(ptext,
               '555-[0-9]{4}')) AS BIGINT) AS n_phones,
           regexp_replace(
               regexp_replace(
                   regexp_replace(ptext,
                       '[a-z0-9]+@[a-z0-9]+\.com', '[EMAIL]', 'g'),
                   '\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                   '[IP]', 'g'),
               '555-[0-9]{4}', '[PHONE]', 'g') AS redacted
    FROM p
"""

# CCNet-style segment dedup: width-8 token chunks, corpus-wide first
# occurrence wins (doc_id then chunk index), per-doc reassembly in
# chunk order; same `['']`-on-empty tokenization convention as _TOKS_CTE
ORACLE_SQL["dedup_paragraphs"] = _TOKS_CTE + r""",
    chunks AS (
        SELECT doc_id, CAST((ord - 1) // 8 AS BIGINT) AS cidx,
               string_agg(tok, ' ' ORDER BY ord) AS ctext
        FROM toks GROUP BY 1, 2
    ),
    marked AS (
        SELECT doc_id, cidx, ctext,
               row_number() OVER (
                   PARTITION BY ctext ORDER BY doc_id, cidx) AS rn
        FROM chunks
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN ctext END, ' '
                               ORDER BY cidx), '') AS kept_text
    FROM marked GROUP BY doc_id
"""

# unigram LM trained on the corpus itself; per-doc mean -log2(p) and
# 2^H, rounded 6dp (sum-association differences are ~1e-13, far below
# the rounding grid — same tolerance argument as quality_repetition)
ORACLE_SQL["lm_perplexity"] = _TOKS_CTE + r""",
    cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS s FROM cnt),
    per AS (
        SELECT t.doc_id,
               -log2(CAST(c.c AS DOUBLE) / (SELECT s FROM tot)) AS nll
        FROM toks t JOIN cnt c ON t.tok = c.tok
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round_even(avg(nll), 6) AS cross_entropy,
           round_even(pow(2.0, avg(nll)), 6) AS perplexity
    FROM per GROUP BY doc_id
"""

# CCNet terciles: rank within lang by the ROUNDED cross-entropy (the
# same 6dp grid as lm_perplexity — both sides order identically), then
# the exact NTILE-free tercile ((rn-1)*3) // n
ORACLE_SQL["perplexity_buckets"] = _TOKS_CTE + r""",
    cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS s FROM cnt),
    per AS (
        SELECT t.doc_id,
               -log2(CAST(c.c AS DOUBLE) / (SELECT s FROM tot)) AS nll
        FROM toks t JOIN cnt c ON t.tok = c.tok
    ),
    ppl AS (
        SELECT doc_id,
               round_even(avg(nll), 6) AS ce,
               round_even(pow(2.0, avg(nll)), 6) AS perplexity
        FROM per GROUP BY doc_id
    ),
    j AS (
        SELECT d.doc_id, d.lang, p.perplexity, p.ce
        FROM documents d JOIN ppl p ON d.doc_id = p.doc_id
    ),
    r AS (
        SELECT doc_id, lang, perplexity,
               row_number() OVER (
                   PARTITION BY lang ORDER BY ce, doc_id) AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM j
    )
    SELECT doc_id, lang, perplexity,
           CASE ((rn - 1) * 3) // n
               WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail'
           END AS ppl_bucket
    FROM r
"""


# ---------------------------------------------------------------------------
# outer-join + window-function-v2 family (relational.py): Q13-style
# left-join histogram, full-outer activity matrix, sliding mean,
# NTILE ranking, ROLLUP census
# ---------------------------------------------------------------------------

ORACLE_SQL["customer_order_counts"] = """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey,
               CAST(count(o.o_custkey) AS BIGINT) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    ) GROUP BY c_count
"""

ORACLE_SQL["user_hour_activity"] = """
    WITH c AS (
        SELECT user_id,
               strftime(date_trunc('hour', ts),
                        '%Y-%m-%d %H:%M:%S') AS hour,
               CAST(count(*) AS BIGINT) AS n_clicks
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    e AS (
        SELECT user_id,
               strftime(date_trunc('hour', ts),
                        '%Y-%m-%d %H:%M:%S') AS hour,
               CAST(count(*) AS BIGINT) AS n_errors
        FROM events WHERE event_type = 'error' GROUP BY 1, 2
    )
    SELECT COALESCE(c.user_id, e.user_id) AS user_id,
           COALESCE(c.hour, e.hour) AS hour,
           COALESCE(c.n_clicks, 0) AS n_clicks,
           COALESCE(e.n_errors, 0) AS n_errors
    FROM c FULL JOIN e ON c.user_id = e.user_id AND c.hour = e.hour
"""

# frame-order association note: the Ray side sums (v[i-2]+v[i-1])+v[i];
# 4dp rounding sits ~10 orders above any segment-tree re-association
ORACLE_SQL["events_rolling_mean"] = """
    SELECT user_id, event_id,
           round_even(avg(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS rolling_mean
    FROM events
"""

ORACLE_SQL["ntile_quartiles"] = """
    SELECT doc_id, lang,
           CAST(ntile(4) OVER (
               PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT)
               AS quartile
    FROM documents
"""

ORACLE_SQL["lang_census_rollup"] = """
    SELECT COALESCE(lang, 'ALL') AS lang,
           COALESCE(source, 'ALL') AS source,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY ROLLUP(lang, source)
"""


# ---------------------------------------------------------------------------
# pivot / normalization / canonical-dedup family
# ---------------------------------------------------------------------------

ORACLE_SQL["event_type_pivot"] = """
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_view
    FROM events GROUP BY user_id
"""

# both engines filter on the ROUNDED z, so float drift in the moment
# computation (sum-of-squares here vs Welford there) cannot flip
# membership; sd is the population stddev
ORACLE_SQL["zscore_outliers"] = """
    WITH s AS (
        SELECT lang, avg(CAST(n_chars AS DOUBLE)) AS mu,
               stddev_pop(CAST(n_chars AS DOUBLE)) AS sd
        FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang,
           round_even((d.n_chars - s.mu) / s.sd, 4) AS z
    FROM documents d JOIN s USING (lang)
    WHERE abs(round_even((d.n_chars - s.mu) / s.sd, 4)) > 2
"""

# canonical-keep filter over the SAME component walk as
# near_dup_clusters: drop docs whose component has a smaller member
_NDC_SQL = ORACLE_SQL["near_dup_clusters"]

# per-language token top-k with deterministic ties
ORACLE_SQL["top_tokens_per_lang"] = r"""
    WITH counts AS (
        SELECT lang, tok AS token, count(*) AS n
        FROM documents,
             UNNEST(regexp_split_to_array(trim(text), '\s+')) AS t(tok)
        GROUP BY lang, tok
    ),
    ranked AS (
        SELECT lang, token, n,
               row_number() OVER (
                   PARTITION BY lang ORDER BY n DESC, token
               ) AS rnk
        FROM counts
    )
    SELECT lang, token, n, rnk FROM ranked WHERE rnk <= 5
"""

# centroid-pair cosine: centroids rounded to 6 before the cosine on
# both sides (see stages/knn.py:centroid_similarity)
ORACLE_SQL["centroid_similarity"] = """
    WITH c AS (
        SELECT label, g.b AS dim,
               round_even(avg(embedding[g.b + 1]), 6) AS v
        FROM embeddings CROSS JOIN generate_series(0, 63) AS g(b)
        GROUP BY label, g.b
    )
    SELECT CAST(a.label AS BIGINT) AS label_a,
           CAST(b.label AS BIGINT) AS label_b,
           round_even(
               sum(a.v * b.v)
               / (sqrt((SELECT sum(x.v * x.v) FROM c x
                        WHERE x.label = a.label))
                  * sqrt((SELECT sum(y.v * y.v) FROM c y
                          WHERE y.label = b.label))), 6) AS cos
    FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
    GROUP BY a.label, b.label
"""

# sliding-window chunking with overlap (size 8, stride 4)
ORACLE_SQL["chunk_with_overlap"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents
    )
    SELECT doc_id,
           g.i AS chunk_idx,
           array_to_string(w[g.i * 4 + 1 : g.i * 4 + 8], ' ') AS chunk_text,
           CAST(least(8, len(w) - g.i * 4) AS BIGINT) AS n_tokens
    FROM toks,
         UNNEST(range(CAST(ceil(len(w) / 4.0) AS BIGINT))) AS g(i)
"""

# per-user trailing-1h RANGE window (peers included)
ORACLE_SQL["events_value_1h_range_sum"] = """
    SELECT event_id,
           round_even(sum(value) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ), 6) AS sum_1h
    FROM events
"""

# one-pass data-quality profile — SQL generated from the SAME spec the
# Ray side profiles (relational.PROFILE_SPEC), so column/metric
# coverage cannot drift between the two sides
from .relational import PROFILE_SPEC as _PROFILE_SPEC


def _profile_arm(col: str, kind: str) -> str:
    expr = f"CAST(length({col}) AS BIGINT)" if kind == "str" else col
    return f"""
    SELECT '{col}' AS col_name, 'null_count' AS metric,
           CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               AS value FROM documents
    UNION ALL SELECT '{col}', 'min', CAST(min({expr}) AS DOUBLE)
        FROM documents
    UNION ALL SELECT '{col}', 'max', CAST(max({expr}) AS DOUBLE)
        FROM documents
    UNION ALL SELECT '{col}', 'mean',
        round_even(CAST(sum({expr}) AS DOUBLE)
                   / count({expr}), 6) FROM documents"""


ORACLE_SQL["table_profile"] = "\n    UNION ALL".join(
    _profile_arm(c, k) for c, k in sorted(_PROFILE_SPEC)
)

# TPC-H Q18 shape: top large-quantity orders with customer
ORACLE_SQL["large_quantity_orders"] = """
    WITH totals AS (
        SELECT l_orderkey AS o_orderkey,
               sum(l_quantity) AS tq
        FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
    )
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_totalprice,
           round_even(tq, 2) AS total_qty
    FROM orders
    JOIN totals USING (o_orderkey)
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
"""

# HF-snapshot round-trip: the census matches the original table iff
# the hub-layout export + shard-checked read lost nothing
ORACLE_SQL["hf_snapshot_roundtrip"] = """
    SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
"""

# Efraimidis–Spirakis weighted sample: key = −ln(u)/w, u hash-derived,
# k smallest keys win; keys round to 9 on both sides before ranking
ORACLE_SQL["weighted_sample_topk"] = """
    WITH h AS (
        SELECT doc_id, n_chars,
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS UBIGINT) + 1) / 4294967296.0 AS u
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars,
           round_even(-ln(u) / n_chars, 9) AS sample_key
    FROM h
    ORDER BY round_even(-ln(u) / n_chars, 9), doc_id
    LIMIT 100
"""

# per-label cosine medoid via the Σcos(a,b) = â·Σb̂ identity — the
# normalized-sum matrix rounds to 6 before the dot on BOTH sides
# (stages/knn.py:embedding_label_medoid float discipline); ties at the
# rounded score break to the smallest vec_id
ORACLE_SQL["embedding_label_medoid"] = """
    WITH e AS (
        SELECT vec_id, CAST(label AS BIGINT) AS label,
               CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    u AS (
        SELECT vec_id, label, g.i AS dim,
               v[g.i + 1]
                   / sqrt(list_sum(list_transform(v, x -> x * x))) AS nv
        FROM e, UNNEST(range(len(v))) AS g(i)
    ),
    s AS (
        SELECT label, dim, round_even(sum(nv), 6) AS sv
        FROM u GROUP BY label, dim
    ),
    score AS (
        SELECT u.vec_id, u.label,
               round_even(sum(u.nv * s.sv), 6) AS sc
        FROM u JOIN s ON s.label = u.label AND s.dim = u.dim
        GROUP BY u.vec_id, u.label
    ),
    r AS (
        SELECT label, vec_id AS medoid_vec_id, sc AS score,
               row_number() OVER (
                   PARTITION BY label ORDER BY sc DESC, vec_id
               ) AS rn
        FROM score
    )
    SELECT label, medoid_vec_id, score FROM r WHERE rn = 1
"""

# subset-duplicate detector: max-containment |A∩B|/min(|A|,|B|) over
# the shared shingle-intersection fragment
ORACLE_SQL["ngram_containment_pairs"] = f"""
    WITH {_NEARDUP_INTER_CTE}
    SELECT ia AS doc_id_a, ib AS doc_id_b,
           round_even(CAST(c AS DOUBLE) / least(na.n, nb.n), 6)
               AS containment
    FROM inter
    JOIN sizes na ON na.doc_id = ia
    JOIN sizes nb ON nb.doc_id = ib
    WHERE CAST(c AS DOUBLE) / least(na.n, nb.n) >= 0.5
"""

# near-dup graph degree histogram (shared edge SQL)
ORACLE_SQL["neardup_degree_histogram"] = f"""
    WITH {_NEARDUP_EDGES_CTE},
    deg AS (SELECT s, count(*) AS degree FROM edges GROUP BY s)
    SELECT degree, count(*) AS n_docs FROM deg GROUP BY degree
"""

# language-pair KL over the shared vocabulary (renormalized)
ORACLE_SQL["lang_unigram_kl"] = r"""
    WITH c AS (
        SELECT lang, tok AS token, count(*) AS n
        FROM documents,
             UNNEST(regexp_split_to_array(trim(text), '\s+')) AS t(tok)
        GROUP BY lang, tok
    ),
    p AS (
        SELECT a.lang AS lang_a, b.lang AS lang_b,
               CAST(a.n AS DOUBLE) AS na, CAST(b.n AS DOUBLE) AS nb
        FROM c a JOIN c b ON a.token = b.token AND a.lang <> b.lang
    ),
    tot AS (
        SELECT lang_a, lang_b, sum(na) AS sa, sum(nb) AS sb
        FROM p GROUP BY 1, 2
    )
    SELECT p.lang_a, p.lang_b,
           round_even(sum((na / sa) * ln((na / sa) / (nb / sb))), 6) AS kl
    FROM p JOIN tot USING (lang_a, lang_b)
    GROUP BY 1, 2
"""

# k-core peeling, 3 fixed rounds (chained per-round CTEs over the
# shared edge SQL; the neardup_pagerank oracle discipline)
ORACLE_SQL["neardup_kcore"] = f"""
    WITH {_NEARDUP_EDGES_CTE},
    d0 AS (SELECT s, count(*) AS d FROM edges GROUP BY s),
    k0 AS (SELECT s FROM d0 WHERE d >= 2),
    e1 AS (
        SELECT e.s, e.t FROM edges e
        JOIN k0 a ON e.s = a.s
        JOIN k0 b ON e.t = b.s
    ),
    d1 AS (SELECT s, count(*) AS d FROM e1 GROUP BY s),
    k1 AS (SELECT s FROM d1 WHERE d >= 2),
    e2 AS (
        SELECT e.s, e.t FROM e1 e
        JOIN k1 a ON e.s = a.s
        JOIN k1 b ON e.t = b.s
    ),
    d2 AS (SELECT s, count(*) AS d FROM e2 GROUP BY s),
    k2 AS (SELECT s FROM d2 WHERE d >= 2),
    e3 AS (
        SELECT e.s, e.t FROM e2 e
        JOIN k2 a ON e.s = a.s
        JOIN k2 b ON e.t = b.s
    ),
    d3 AS (SELECT s, count(*) AS d FROM e3 GROUP BY s)
    SELECT s AS doc_id, d AS degree FROM d3
"""

# skyline / pareto front: brute-force NOT EXISTS dominance self-join
ORACLE_SQL["parts_pareto_front"] = """
    SELECT p_partkey, p_retailprice, p_size
    FROM part b
    WHERE NOT EXISTS (
        SELECT 1 FROM part a
        WHERE a.p_retailprice <= b.p_retailprice
          AND a.p_size >= b.p_size
          AND (a.p_retailprice < b.p_retailprice
               OR a.p_size > b.p_size)
    )
"""

# PageRank over the near-dup graph: fixed 3-iteration power method,
# chained per-iteration CTEs over the SAME pair SQL as
# near_dup_clusters; ranks rounded to 9 each iteration on both sides
# (see stages/dedup.py:neardup_pagerank float discipline)
ORACLE_SQL["neardup_pagerank"] = f"""
    WITH {_NEARDUP_EDGES_CTE},
        deg AS (SELECT s, count(*) AS d FROM edges GROUP BY s),
        nn AS (SELECT count(*) AS c FROM deg),
        w AS (
            SELECT e.s, e.t, 1.0 / d.d AS w
            FROM edges e JOIN deg d ON d.s = e.s
        ),
        pr0 AS (
            SELECT s AS node,
                   round_even(1.0 / (SELECT c FROM nn), 9) AS pr
            FROM deg
        ),
        pr1 AS (
            SELECT w.t AS node,
                   round_even((1.0 - 0.85) / (SELECT c FROM nn)
                              + 0.85 * sum(p.pr * w.w), 9) AS pr
            FROM w JOIN pr0 p ON p.node = w.s
            GROUP BY w.t
        ),
        pr2 AS (
            SELECT w.t AS node,
                   round_even((1.0 - 0.85) / (SELECT c FROM nn)
                              + 0.85 * sum(p.pr * w.w), 9) AS pr
            FROM w JOIN pr1 p ON p.node = w.s
            GROUP BY w.t
        ),
        pr3 AS (
            SELECT w.t AS node,
                   round_even((1.0 - 0.85) / (SELECT c FROM nn)
                              + 0.85 * sum(p.pr * w.w), 9) AS pr
            FROM w JOIN pr2 p ON p.node = w.s
            GROUP BY w.t
        )
    SELECT node AS doc_id, round_even(pr, 6) AS pagerank FROM pr3
"""

_NDC_CTE = _NDC_SQL[: _NDC_SQL.rindex("SELECT")]  # shared WITH RECURSIVE prefix
ORACLE_SQL["dedup_keep_canonical"] = _NDC_CTE + """
    SELECT d.doc_id, d.lang FROM documents d
    WHERE d.doc_id NOT IN (
        SELECT s FROM walk GROUP BY s HAVING min(l) <> s
    )
"""


# ---------------------------------------------------------------------------
# regex-extraction + embedding feature family
# ---------------------------------------------------------------------------

# same deterministic PII synthesis as pii_redact; one email per doc max,
# exploded to (doc_id, email) rows
ORACLE_SQL["pii_extract_emails"] = r"""
    WITH p AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 3 <> 0
                       THEN ' contact u' || doc_id || '@mail'
                            || (doc_id % 7) || '.com'
                       ELSE '' END
               || CASE WHEN doc_id % 4 <> 0
                       THEN ' from 10.' || (doc_id % 256) || '.'
                            || ((doc_id * 7) % 256) || '.'
                            || (doc_id % 100)
                       ELSE '' END
               || CASE WHEN doc_id % 5 <> 0
                       THEN ' call 555-' || (1000 + doc_id % 9000)
                       ELSE '' END AS ptext
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(ptext, '[a-z0-9]+@[a-z0-9]+\.com') AS email
    FROM p
    WHERE regexp_matches(ptext, '[a-z0-9]+@[a-z0-9]+\.com')
"""

ORACLE_SQL["embedding_norms"] = """
    SELECT vec_id,
           round_even(sqrt(list_sum(list_transform(
               CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm
    FROM embeddings
"""

ORACLE_SQL["label_centroids"] = """
    WITH ex AS (
        SELECT CAST(label AS BIGINT) AS label,
               unnest(CAST(embedding AS DOUBLE[])) AS x,
               CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim
        FROM embeddings
    )
    SELECT label, dim, round_even(sum(x) / count(*), 6) AS centroid
    FROM ex GROUP BY label, dim
"""


# ---------------------------------------------------------------------------
# segmentation / quality-gate / window-v3 family
# ---------------------------------------------------------------------------

# unnest + generate_subscripts expand in lockstep in DuckDB (same
# pattern as label_centroids); '. ' is a literal split on both engines
ORACLE_SQL["sentences_exploded"] = """
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' scan '), 1) - 1
                AS BIGINT) AS sent_idx,
           unnest(string_split(text, ' scan ')) AS sentence
    FROM documents
"""

# constants mirror pipelines/cleaning.py GOPHER_*; mean_wl compared on
# the 4dp-rounded value on BOTH engines so drift cannot flip `keep`
ORACLE_SQL["gopher_quality_filter"] = r"""
    WITH q AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text, ' '), '\s+'))
                    AS BIGINT) AS n_words,
               length(regexp_replace(text, '\s', '', 'g')) AS n_chars_ns,
               CAST(regexp_matches(text, '\bthe\b') AS BIGINT)
               + CAST(regexp_matches(text, '\bscan\b') AS BIGINT)
               + CAST(regexp_matches(text, '\bjoin\b') AS BIGINT)
               + CAST(regexp_matches(text, '\bmerge\b') AS BIGINT)
               + CAST(regexp_matches(text, '\bwindow\b') AS BIGINT)
                   AS stop_hits
        FROM documents
    ), m AS (
        SELECT doc_id, n_words, stop_hits,
               round_even(CAST(n_chars_ns AS DOUBLE) / n_words, 4)
                   AS mean_wl
        FROM q
    )
    SELECT doc_id, n_words, mean_wl, stop_hits,
           CAST(n_words BETWEEN 20 AND 80
                AND mean_wl BETWEEN 3.0 AND 10.0
                AND stop_hits >= 2 AS BIGINT) AS keep
    FROM m
"""

ORACLE_SQL["events_interarrival"] = """
    SELECT user_id, event_id,
           date_diff('microsecond',
                     lag(ts) OVER w, ts) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    QUALIFY lag(ts) OVER w IS NOT NULL
"""

ORACLE_SQL["events_cube"] = """
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(hr, -1) AS hr,
           CAST(count(*) AS BIGINT) AS n
    FROM (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr FROM events)
    GROUP BY CUBE (event_type, hr)
"""


# greatest-per-group + broadcast range join
ORACLE_SQL["latest_event_per_user"] = """
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""

# window table mirrors pipelines/relational.py RANGE_WINDOWS
ORACLE_SQL["events_in_windows"] = """
    WITH w AS (
        SELECT CAST(i AS BIGINT) AS window_id,
               TIMESTAMP '2024-01-01' + INTERVAL (3 * i) DAY AS ws,
               TIMESTAMP '2024-01-01' + INTERVAL (3 * i + 5) DAY AS we
        FROM generate_series(0, 9) AS t(i)
    )
    SELECT w.window_id, CAST(count(*) AS BIGINT) AS n_events,
           round_even(sum(e.value), 2) AS sum_value
    FROM events e JOIN w ON e.ts >= w.ws AND e.ts < w.we
    GROUP BY w.window_id
"""


# the shuffle-tier interval join computes the SAME rows (time-bucket
# co-partition; every pair meets exactly once in the event's bucket)
ORACLE_SQL["events_in_windows_distributed"] = \
    ORACLE_SQL["events_in_windows"]


# grouped regression slope from explicitly-rounded sufficient sums
# (NOT regr_slope — its internal accumulator orders floats differently)
ORACLE_SQL["brand_price_size_slope"] = """
    SELECT p_brand,
           round_even(
               CASE WHEN n * sxx - sx * sx <> 0
                    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
               END, 6) AS slope
    FROM (
        SELECT p_brand,
               CAST(count(*) AS DOUBLE) AS n,
               sum(CAST(p_size AS DOUBLE)) AS sx,
               round_even(sum(p_retailprice), 6) AS sy,
               round_even(sum(p_retailprice * p_size), 6) AS sxy,
               sum(CAST(p_size AS DOUBLE) * p_size) AS sxx
        FROM part GROUP BY p_brand
    )
"""


# stream debounce: LAG gap over (user, type) in (ts, event_id) order
ORACLE_SQL["events_debounce"] = """
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts
    FROM (
        SELECT event_id, user_id, event_type, ts,
               ts - lag(ts) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id
               ) AS gap
        FROM events
    )
    WHERE gap IS NULL OR gap > INTERVAL 300 SECOND
"""


# per-source quota cap (bounded top-N per group)
ORACLE_SQL["source_quota_cap"] = """
    SELECT doc_id, source
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY source ORDER BY doc_id) <= 10
"""


# semi-join / grouped count-distinct / correlation family
ORACLE_SQL["order_priority_counts"] = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_discount > 0.08)
    GROUP BY o_orderpriority
"""

ORACLE_SQL["suppliers_per_part"] = """
    SELECT l_partkey AS partkey,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
    FROM lineitem GROUP BY l_partkey
"""

# corr() is sample correlation; the (n-1) factors cancel, so raw-moment
# Pearson is algebraically identical — 6dp absorbs the float drift
ORACLE_SQL["lineitem_discount_corr"] = """
    SELECT round_even(corr(l_discount, l_extendedprice), 6)
               AS corr_disc_price
    FROM lineitem
"""


# ---------------------------------------------------------------------------
# training_data_pipeline — end-to-end composition of proven fragments:
# gopher quality gate → md5 dedup (min doc_id among quality passers) →
# benchmark 8-gram decontamination (winners drop, dupes don't
# resurrect) → greedy sequence packing (recursive-CTE walk)
# ---------------------------------------------------------------------------

from .corpus_ops import (  # noqa: E402
    BENCH_MAX_DOC_ID as _TDP_BENCH,
    DECON_NGRAM as _TDP_N,
    PACK_BUCKET as _TDP_BUCKET,
    PACK_CAP as _TDP_CAP,
    PACK_SEQ_STRIDE as _TDP_STRIDE,
)

ORACLE_SQL["training_data_pipeline"] = r"""
    WITH RECURSIVE base AS (
        SELECT doc_id, text,
               regexp_split_to_array(trim(text, ' '), '\s+') AS arr,
               CAST(len(regexp_split_to_array(trim(text, ' '), '\s+'))
                    AS BIGINT) AS n_tokens,
               length(regexp_replace(text, '\s', '', 'g')) AS n_chars_ns,
               CAST(regexp_matches(text, '\bthe\b') AS BIGINT)
               + CAST(regexp_matches(text, '\bscan\b') AS BIGINT)
               + CAST(regexp_matches(text, '\bjoin\b') AS BIGINT)
               + CAST(regexp_matches(text, '\bmerge\b') AS BIGINT)
               + CAST(regexp_matches(text, '\bwindow\b') AS BIGINT)
                   AS stop_hits
        FROM documents
    ),
    quality AS (
        SELECT doc_id, text, n_tokens FROM (
            SELECT doc_id, text, n_tokens, stop_hits,
                   round_even(CAST(n_chars_ns AS DOUBLE) / n_tokens, 4)
                       AS mean_wl
            FROM base)
        WHERE n_tokens BETWEEN 20 AND 80
          AND mean_wl BETWEEN 3.0 AND 10.0
          AND stop_hits >= 2
    ),
    winners AS (
        SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(arr[i : i + __NM1__], ' ') AS g
        FROM (SELECT doc_id, arr,
                     unnest(generate_series(1, len(arr) - __NM1__)) AS i
              FROM base)
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < __BENCH__),
    contaminated AS (
        SELECT DISTINCT d.doc_id FROM grams d JOIN bench USING (g)
    ),
    survivors AS (
        SELECT q.doc_id, q.n_tokens,
               q.doc_id // __BUCKET__ AS bucket
        FROM quality q JOIN winners w ON q.doc_id = w.doc_id
        WHERE q.doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    ordered AS (
        SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id)
                      AS rn
        FROM survivors
    ),
    walk AS (
        SELECT bucket, rn, doc_id, n_tokens,
               CAST(0 AS BIGINT) AS seq,
               CAST(0 AS BIGINT) AS st,
               n_tokens AS cur
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.bucket, o.rn, o.doc_id, o.n_tokens,
               CASE WHEN w.cur + o.n_tokens > __CAP__
                    THEN w.seq + 1 ELSE w.seq END,
               CASE WHEN w.cur + o.n_tokens > __CAP__
                    THEN CAST(0 AS BIGINT) ELSE w.cur END,
               CASE WHEN w.cur + o.n_tokens > __CAP__
                    THEN o.n_tokens ELSE w.cur + o.n_tokens END
        FROM walk w JOIN ordered o
          ON o.bucket = w.bucket AND o.rn = w.rn + 1
    )
    SELECT doc_id, n_tokens,
           bucket * __STRIDE__ + seq AS seq_id,
           st AS seq_offset
    FROM walk
""".replace("__NM1__", str(_TDP_N - 1)) \
   .replace("__BENCH__", str(_TDP_BENCH)) \
   .replace("__BUCKET__", str(_TDP_BUCKET)) \
   .replace("__CAP__", str(_TDP_CAP)) \
   .replace("__STRIDE__", str(_TDP_STRIDE))


# exact global count-distinct over the whitespace token stream
ORACLE_SQL["exact_token_vocabulary"] = r"""
    SELECT CAST(count(DISTINCT tok) AS BIGINT) AS n_tokens_distinct
    FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
          FROM documents)
"""


# JSON payload extraction (events.props = {"k": N})
ORACLE_SQL["events_props_stats"] = """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round_even(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 4)
               AS mean_k
    FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# funnel / cohort / collocation family
# ---------------------------------------------------------------------------

ORACLE_SQL["funnel_conversion"] = """
    WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s1.t
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s2.t
           GROUP BY e.user_id)
    SELECT step, CAST(n_users AS BIGINT) AS n_users
    FROM (VALUES ('1_view',     (SELECT count(*) FROM s1)),
                 ('2_click',    (SELECT count(*) FROM s2)),
                 ('3_purchase', (SELECT count(*) FROM s3)))
         AS v(step, n_users)
"""

ORACLE_SQL["cohort_retention"] = """
    WITH firsts AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d0
        FROM events GROUP BY user_id
    )
    SELECT CAST(d0 AS VARCHAR) AS cohort_day,
           CAST(date_diff('day', d0, CAST(e.ts AS DATE)) AS BIGINT)
               AS day_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN firsts USING (user_id)
    GROUP BY d0, date_diff('day', d0, CAST(e.ts AS DATE))
"""

# PMI mirrors the Ray float path exactly: every operand cast to DOUBLE,
# identical division/multiplication tree, ln + round_even(6) (the
# lm_perplexity log-parity precedent).
ORACLE_SQL["token_pmi_bigrams"] = r"""
    WITH base AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS a
        FROM documents
    ),
    big AS (
        SELECT a[i] AS w1, a[i + 1] AS w2,
               CAST(count(*) AS BIGINT) AS n
        FROM (SELECT a, unnest(generate_series(1, len(a) - 1)) AS i
              FROM base)
        GROUP BY 1, 2
    ),
    uni AS (
        SELECT w, CAST(count(*) AS DOUBLE) AS c
        FROM (SELECT unnest(a) AS w FROM base)
        GROUP BY w
    ),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS nt FROM uni),
    bt  AS (SELECT CAST(sum(n) AS DOUBLE) AS nb FROM big)
    SELECT b.w1, b.w2, b.n,
           round_even(ln((CAST(b.n AS DOUBLE) / bt.nb)
                         / ((u1.c / tot.nt) * (u2.c / tot.nt))), 6) AS pmi
    FROM big b
    JOIN uni u1 ON b.w1 = u1.w
    JOIN uni u2 ON b.w2 = u2.w
    CROSS JOIN tot CROSS JOIN bt
    ORDER BY b.n DESC, b.w1, b.w2
    LIMIT 50
"""


ORACLE_SQL["top_event_type_per_user"] = """
    SELECT user_id, event_type AS top_event_type, CAST(n AS BIGINT) AS n
    FROM (SELECT user_id, event_type, count(*) AS n
          FROM events GROUP BY user_id, event_type)
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY n DESC, event_type) = 1
"""

ORACLE_SQL["viewers_never_purchased"] = """
    SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
"""


# BM25 mirrors the Ray float path: every operand DOUBLE, identical
# expression tree (0.25 = 1-b exact in binary; k1+1 summed the same way)
ORACLE_SQL["bm25_scores"] = _TOKS_CTE + r""",
    dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
           FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                     CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                         AS avgdl
              FROM dl),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
           FROM toks WHERE tok IN ('scan', 'join', 'merge')
           GROUP BY doc_id, tok),
    df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok)
    SELECT tf.doc_id,
           round_even(sum(
               ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * ((tf.tf * (1.2 + 1.0))
                  / (tf.tf + 1.2 * ((1.0 - 0.75)
                                    + 0.75 * dl.dl / stats.avgdl)))
           ), 6) AS bm25
    FROM tf
    JOIN df USING (tok)
    JOIN dl USING (doc_id)
    CROSS JOIN stats
    GROUP BY tf.doc_id
"""

ORACLE_SQL["token_fuzzy_pairs"] = r"""
    WITH v AS (
        SELECT DISTINCT unnest(regexp_split_to_array(trim(text), '\s+'))
            AS w
        FROM documents
    )
    SELECT a.w AS w1, b.w AS w2,
           CAST(levenshtein(a.w, b.w) AS BIGINT) AS d
    FROM v a, v b
    WHERE a.w < b.w AND levenshtein(a.w, b.w) <= 2
"""


ORACLE_SQL["user_event_sequences"] = """
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS seq,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
"""


ORACLE_SQL["event_transitions"] = """
    WITH w AS (
        SELECT event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev
        FROM events
    )
    SELECT prev AS prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n
    FROM w WHERE prev IS NOT NULL
    GROUP BY 1, 2
"""


ORACLE_SQL["orderkey_islands"] = """
    WITH f AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'),
    w AS (
        SELECT o_orderkey,
               o_orderkey - row_number() OVER (ORDER BY o_orderkey) AS g
        FROM f
    )
    SELECT min(o_orderkey) AS start_key, max(o_orderkey) AS end_key,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM w GROUP BY g
"""


ORACLE_SQL["dataset_split_assign"] = """
    WITH h AS (
        SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) % 100 AS b, lang
        FROM documents
    )
    SELECT CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
           lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM h GROUP BY 1, 2
"""


ORACLE_SQL["lang_mixture_weights"] = """
    WITH c AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang
    ),
    p AS (
        SELECT lang, n_docs,
               pow(n_docs / (SELECT sum(n_docs) FROM c), 0.3) AS pw
        FROM c
    )
    SELECT lang, n_docs,
           round_even(pw / (SELECT sum(pw) FROM p), 6) AS weight
    FROM p
"""


ORACLE_SQL["order_percent_rank"] = """
    SELECT o_orderkey,
           CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                AS BIGINT) AS rn,
           round_even(percent_rank() OVER
                      (ORDER BY o_totalprice, o_orderkey), 6) AS pr
    FROM orders
"""


ORACLE_SQL["promo_revenue_share"] = """
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           round_even(
               100.0 * sum(CASE WHEN p_type = 'PROMO'
                                THEN l_extendedprice * (1 - l_discount)
                                ELSE 0 END)
               / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
"""


ORACLE_SQL["priority_line_counts"] = """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_linestatus
"""


ORACLE_SQL["mixture_resample_census"] = """
    WITH c AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang
    ),
    p AS (
        SELECT lang, pow(n_docs / (SELECT sum(n_docs) FROM c), 0.3) AS pw
        FROM c
    ),
    w AS (
        SELECT lang,
               round_even(pw / (SELECT sum(pw) FROM p), 6) AS weight
        FROM p
    ),
    t AS (
        SELECT lang,
               CAST(round_even(
                   round_even(weight / (SELECT max(weight) FROM w), 6)
                   * 1000000, 0) AS BIGINT) AS lim
        FROM w
    ),
    h AS (
        SELECT d.lang,
               CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
                                        || '#mix'), 1, 8))
                    AS UBIGINT) % 1000000 AS hv,
               t.lim
        FROM documents d JOIN t ON d.lang = t.lang
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_kept
    FROM h WHERE hv < lim GROUP BY lang
"""


ORACLE_SQL["top_suppliers_by_revenue"] = """
    WITH s AS (
        SELECT l_suppkey,
               round_even(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey, total_revenue FROM s
    WHERE total_revenue = (SELECT max(total_revenue) FROM s)
"""


ORACLE_SQL["important_parts_stock"] = """
    WITH s AS (
        SELECT l_partkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, total_qty FROM s
    WHERE total_qty > (SELECT sum(total_qty) FROM s) * 0.0008
"""


ORACLE_SQL["lineitem_quantity_ranks"] = """
    SELECT DISTINCT l_quantity,
           CAST(rank() OVER (ORDER BY l_quantity) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (ORDER BY l_quantity) AS BIGINT) AS drnk
    FROM lineitem
"""


ORACLE_SQL["lineitem_measures_unpivot"] = """
    SELECT l_returnflag, 'quantity' AS measure,
           round_even(avg(l_quantity), 4) AS avg_value
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 'extendedprice',
           round_even(avg(l_extendedprice), 4)
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 'discount',
           round_even(avg(l_discount), 4)
    FROM lineitem GROUP BY l_returnflag
"""


ORACLE_SQL["orders_price_percentiles"] = """
    SELECT CAST(0.25 AS DOUBLE) AS p,
           round_even(percentile_cont(0.25)
                      WITHIN GROUP (ORDER BY o_totalprice), 4) AS value
    FROM orders
    UNION ALL
    SELECT CAST(0.5 AS DOUBLE),
           round_even(percentile_cont(0.5)
                      WITHIN GROUP (ORDER BY o_totalprice), 4)
    FROM orders
    UNION ALL
    SELECT CAST(0.75 AS DOUBLE),
           round_even(percentile_cont(0.75)
                      WITHIN GROUP (ORDER BY o_totalprice), 4)
    FROM orders
    UNION ALL
    SELECT CAST(0.9 AS DOUBLE),
           round_even(percentile_cont(0.9)
                      WITHIN GROUP (ORDER BY o_totalprice), 4)
    FROM orders
"""


ORACLE_SQL["region_kind_census"] = """
    WITH a AS (
        SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) % 3 AS arch
        FROM documents
    ),
    k AS (
        SELECT 'text' AS kind FROM a WHERE arch = 0
        UNION ALL SELECT 'text' FROM a WHERE arch = 0
        UNION ALL SELECT 'text' FROM a WHERE arch = 1
        UNION ALL SELECT 'table' FROM a WHERE arch = 1
        UNION ALL SELECT 'figure' FROM a WHERE arch = 2
        UNION ALL SELECT 'text' FROM a WHERE arch = 2
    )
    SELECT kind, CAST(count(*) AS BIGINT) AS n_regions
    FROM k GROUP BY kind
"""


ORACLE_SQL["q6_forecast_revenue"] = """
    SELECT round_even(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


ORACLE_SQL["customer_order_flags"] = """
    SELECT o_custkey,
           CAST(max(CASE WHEN o_orderpriority = '1-URGENT'
                         THEN 1 ELSE 0 END) AS BIGINT) AS has_urgent,
           CAST(min(CASE WHEN o_orderstatus = 'F'
                         THEN 1 ELSE 0 END) AS BIGINT) AS all_finished,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
"""


ORACLE_SQL["price_quantity_regression"] = """
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
               sum(l_quantity * l_extendedprice) AS sxy,
               sum(l_quantity * l_quantity) AS sxx
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           round_even((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
               AS slope,
           round_even((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx)
                       * sx) / n, 4) AS intercept
    FROM m
"""


ORACLE_SQL["cheapest_parts_per_brand"] = """
    SELECT p_partkey, p_brand, p_retailprice FROM (
        SELECT p_partkey, p_brand, p_retailprice,
               min(p_retailprice) OVER (PARTITION BY p_brand) AS mn
        FROM part
    ) WHERE p_retailprice = mn
"""


ORACLE_SQL["flag_price_median"] = """
    SELECT l_returnflag,
           round_even(percentile_cont(0.5)
                      WITHIN GROUP (ORDER BY l_extendedprice), 4)
               AS median_price
    FROM lineitem GROUP BY l_returnflag
"""


ORACLE_SQL["daily_active_users"] = """
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS dau
    FROM events GROUP BY 1
"""


ORACLE_SQL["orders_weekday_census"] = """
    SELECT CAST(isodow(o_orderdate) AS BIGINT) AS isodow,
           CAST(count(*) AS BIGINT) AS n_orders,
           round_even(sum(o_totalprice) / count(*), 4) AS avg_price
    FROM orders GROUP BY 1
"""


ORACLE_SQL["customer_segment_share"] = """
    WITH c AS (
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
        FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n_customers,
           round_even(n_customers / (SELECT sum(n_customers) FROM c), 6)
               AS share
    FROM c
"""


ORACLE_SQL["events_rolling_median"] = """
    SELECT event_id,
           round_even(median(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ), 4) AS rolling_median
    FROM events
"""


ORACLE_SQL["part_cooccurrence"] = """
    WITH d AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM d a JOIN d b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 2
"""


ORACLE_SQL["part_cooccurrence_lift"] = """
    WITH d AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pcnt AS (
        SELECT l_partkey, count(*) AS n FROM d GROUP BY l_partkey
    ),
    tot AS (SELECT count(DISTINCT l_orderkey) AS n FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM d a JOIN d b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 2
    )
    SELECT p.part_a, p.part_b, p.n_orders,
           round_even(CAST(p.n_orders AS DOUBLE) * tot.n
                      / (pa.n * pb.n), 6) AS lift
    FROM pairs p
    JOIN pcnt pa ON pa.l_partkey = p.part_a
    JOIN pcnt pb ON pb.l_partkey = p.part_b
    CROSS JOIN tot
"""


ORACLE_SQL["orderkey_set_compare"] = """
    WITH o AS (SELECT DISTINCT o_orderkey AS k FROM orders),
    l AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
    j AS (
        SELECT CASE WHEN o.k IS NOT NULL AND l.k IS NOT NULL THEN 'both'
                    WHEN o.k IS NOT NULL THEN 'orders_only'
                    ELSE 'lineitem_only' END AS presence
        FROM o FULL OUTER JOIN l ON o.k = l.k
    )
    SELECT presence, CAST(count(*) AS BIGINT) AS n_keys
    FROM j GROUP BY presence
"""


ORACLE_SQL["daily_revenue_change"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, sum(value) AS rev
        FROM events GROUP BY 1
    )
    SELECT day, round_even(rev, 2) AS revenue,
           round_even(100.0 * (rev - lag(rev) OVER (ORDER BY day))
                      / lag(rev) OVER (ORDER BY day), 4) AS pct_change
    FROM d
"""


ORACLE_SQL["customer_spend_quartiles"] = """
    WITH s AS (
        SELECT o_custkey,
               round_even(sum(o_totalprice), 2) AS total_spend
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, total_spend,
           CAST(ntile(4) OVER (ORDER BY total_spend, o_custkey)
                AS BIGINT) AS quartile
    FROM s
"""


ORACLE_SQL["events_zscore_by_type"] = """
    WITH m AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n,
               sum(value) AS sv, sum(value * value) AS svv
        FROM events GROUP BY event_type
    ),
    v AS (
        SELECT event_type, sv / n AS mu,
               round_even(svv / n - (sv / n) * (sv / n), 6) AS var
        FROM m
    )
    SELECT e.event_id, e.event_type,
           round_even((e.value - v.mu) / sqrt(v.var), 4) AS z
    FROM events e JOIN v ON e.event_type = v.event_type
    WHERE v.var > 0
"""


ORACLE_SQL["suppliers_above_region_avg"] = """
    WITH s AS (
        SELECT s_suppkey, CAST(n_regionkey AS BIGINT) AS region, s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
    ),
    a AS (SELECT region,
                 round_even(sum(s_acctbal) / count(*), 6) AS avg_bal
          FROM s GROUP BY region)
    SELECT s.s_suppkey, s.region, s.s_acctbal
    FROM s JOIN a ON s.region = a.region
    WHERE s.s_acctbal > a.avg_bal
"""


ORACLE_SQL["events_value_mad"] = """
    WITH m AS (
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           round_even(percentile_cont(0.5)
                      WITHIN GROUP (ORDER BY abs(e.value - m.med)), 4)
               AS mad
    FROM events e JOIN m ON e.event_type = m.event_type
    GROUP BY e.event_type
"""


ORACLE_SQL["cooccurrence_triangles"] = """
    WITH d AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    e AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM d a JOIN d b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e1.part_b = e2.part_a
    JOIN e e3 ON e3.part_a = e1.part_a AND e3.part_b = e2.part_b
"""


ORACLE_SQL["trailing2d_active_users"] = """
    WITH p AS (
        SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id
        FROM events
    ),
    days AS (SELECT DISTINCT day FROM p)
    SELECT d.day, CAST(count(DISTINCT p.user_id) AS BIGINT) AS wau
    FROM days d
    JOIN p ON p.day = d.day
          OR p.day = strftime(CAST(d.day AS DATE) - INTERVAL 1 DAY,
                              '%Y-%m-%d')
    GROUP BY d.day
"""


ORACLE_SQL["lang_token_entropy"] = """
    WITH c AS (
        SELECT lang, tok AS token, CAST(count(*) AS BIGINT) AS n
        FROM (
            SELECT lang,
                   unnest(regexp_split_to_array(trim(text, ' '),
                                                '\\s+')) AS tok
            FROM documents
        ) GROUP BY 1, 2
    )
    SELECT lang,
           round_even(sum(-(n / t) * log2(n / t)), 4) AS entropy_bits
    FROM (
        SELECT lang, n,
               CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE) AS t
        FROM c
    ) GROUP BY lang
"""


ORACLE_SQL["doc_length_gini"] = """
    WITH r AS (
        SELECT CAST(n_chars AS DOUBLE) AS x,
               CAST(row_number() OVER (ORDER BY n_chars, doc_id)
                    AS DOUBLE) AS rn
        FROM documents
    )
    SELECT round_even(
        2.0 * sum(rn * x) / (count(*) * sum(x))
        - (count(*) + 1.0) / count(*), 6) AS gini
    FROM r
"""


ORACLE_SQL["longest_order_streak"] = """
    WITH d AS (
        SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS day
        FROM orders
    ),
    w AS (
        SELECT o_custkey,
               day - CAST(row_number() OVER (
                   PARTITION BY o_custkey ORDER BY day
               ) AS INTEGER) AS g
        FROM d
    ),
    runs AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS len
        FROM w GROUP BY o_custkey, g
    )
    SELECT o_custkey, max(len) AS longest_streak
    FROM runs GROUP BY o_custkey
"""


ORACLE_SQL["lineitem_corr_matrix"] = """
    WITH m AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               sum(l_quantity) AS sq, sum(l_extendedprice) AS sp,
               sum(l_discount) AS sd,
               sum(l_quantity * l_quantity) AS sqq,
               sum(l_extendedprice * l_extendedprice) AS spp,
               sum(l_discount * l_discount) AS sdd,
               sum(l_quantity * l_extendedprice) AS sqp,
               sum(l_quantity * l_discount) AS sqd,
               sum(l_extendedprice * l_discount) AS spd
        FROM lineitem
    )
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           round_even((n * sqp - sq * sp)
               / sqrt((n * sqq - sq * sq) * (n * spp - sp * sp)), 6)
               AS corr
    FROM m
    UNION ALL
    SELECT 'l_quantity', 'l_discount',
           round_even((n * sqd - sq * sd)
               / sqrt((n * sqq - sq * sq) * (n * sdd - sd * sd)), 6)
    FROM m
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount',
           round_even((n * spd - sp * sd)
               / sqrt((n * spp - sp * sp) * (n * sdd - sd * sd)), 6)
    FROM m
"""


ORACLE_SQL["daily_big_purchases_spine"] = """
    WITH b AS (
        SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
        FROM b
    ),
    agg AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS n_big,
               round_even(sum(value), 2) AS revenue
        FROM events
        WHERE event_type = 'purchase' AND value >= 95
        GROUP BY 1
    )
    SELECT strftime(spine.d, '%Y-%m-%d') AS day,
           COALESCE(agg.n_big, 0) AS n_big,
           COALESCE(agg.revenue, 0.0) AS revenue
    FROM spine LEFT JOIN agg ON strftime(spine.d, '%Y-%m-%d') = agg.day
"""


ORACLE_SQL["top_decile_revenue_share"] = """
    WITH s AS (
        SELECT o_custkey,
               round_even(sum(o_totalprice), 2) AS total_spend
        FROM orders GROUP BY o_custkey
    ),
    t AS (
        SELECT total_spend,
               ntile(10) OVER (ORDER BY total_spend, o_custkey) AS tile
        FROM s
    )
    SELECT round_even(
        sum(CASE WHEN tile = 10 THEN total_spend ELSE 0 END)
        / sum(total_spend), 6) AS top_decile_share
    FROM t
"""


# --------------------------------------------------------------------------
# Raw-fixture GT-builder oracles (VERDICT r4 ask #3): the SQL re-derives
# each builder's semantics from the COMMITTED raw fixture files
# (read_json_auto / read_text over absolute paths), so the formerly
# rows-only builder checks become hash-matched. The pdf oracle encodes
# the fixture PLAN (tools/make_pdf_fixture.py literals) and re-implements
# the size-rank/margin classifier — the Ray side parses the actual PDF
# bytes, making the compare a true end-to-end check of the text layer.
# --------------------------------------------------------------------------

from ..sources.docvqa import SAMPLE_JSONL as _DOCVQA_JSONL
from ..sources.dpbench import SAMPLE_DIR as _DPBENCH_DIR
from ..sources.funsd import SAMPLE_DIR as _FUNSD_DIR

ORACLE_SQL["funsd_gt_flat"] = f"""
    WITH files AS (
        SELECT regexp_extract(filename, '([^/\\\\]+)\\.json$', 1) AS doc_id,
               form
        FROM read_json_auto('{_FUNSD_DIR}/*.json',
                            filename = true, union_by_name = true)
    ),
    items AS (
        SELECT doc_id,
               unnest(form) AS item,
               generate_subscripts(form, 1) AS ord
        FROM files
    ),
    flat AS (
        SELECT doc_id, ord,
               item.id AS id,
               coalesce(item.label, 'other') AS label,
               coalesce(item.text, '') AS text,
               item.linking AS linking,
               item.words AS words
        FROM items
    ),
    kept AS (
        SELECT *,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1
                    AS BIGINT) AS off
        FROM flat
        WHERE (linking IS NOT NULL AND len(linking) > 0)
           OR label NOT IN ('header', 'other')
    ),
    word_counts AS (
        SELECT k.doc_id, count(*) AS n_words
        FROM kept k, unnest(k.words) AS u(w)
        WHERE w.text IS NOT NULL AND w.box IS NOT NULL
        GROUP BY k.doc_id
    ),
    all_links AS (
        SELECT DISTINCT f.doc_id,
               CAST(pair[1] AS BIGINT) AS s, CAST(pair[2] AS BIGINT) AS t
        FROM flat f, unnest(f.linking) AS u(pair)
        WHERE len(pair) = 2
    ),
    links_kept AS (
        SELECT l.* FROM all_links l
        JOIN kept a ON a.doc_id = l.doc_id AND a.id = l.s
        JOIN kept b ON b.doc_id = l.doc_id AND b.id = l.t
    ),
    deg AS (
        SELECT k.doc_id, k.id, k.off, k.text,
               (SELECT count(*) FROM links_kept l
                WHERE l.doc_id = k.doc_id AND l.s = k.id) AS outdeg,
               (SELECT count(*) FROM links_kept l
                WHERE l.doc_id = k.doc_id AND l.t = k.id) AS indeg
        FROM kept k
    ),
    labeled AS (
        SELECT d.*,
               CASE WHEN d.outdeg = 0 THEN 'value'
                    WHEN d.indeg = 0 THEN 'key'
                    WHEN NOT EXISTS (
                        SELECT 1 FROM links_kept l
                        JOIN deg d2 ON d2.doc_id = l.doc_id AND d2.id = l.t
                        WHERE l.doc_id = d.doc_id AND l.s = d.id
                          AND d2.outdeg > 0)
                    THEN 'key'
                    ELSE 'unspecified' END AS kind
        FROM deg d
    ),
    counters AS (
        SELECT k.doc_id,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST((SELECT count(*) FROM links_kept l
                     WHERE l.doc_id = k.doc_id) AS BIGINT) AS n_links,
               CAST(coalesce((SELECT n_words FROM word_counts w
                              WHERE w.doc_id = k.doc_id), 0) AS BIGINT)
                   AS n_words
        FROM kept k GROUP BY k.doc_id
    )
    SELECT l.doc_id, l.off AS "offset", l.kind, l.text,
           c.n_cells, c.n_links, c.n_words
    FROM labeled l JOIN counters c ON c.doc_id = l.doc_id
"""

ORACLE_SQL["dpbench_gt_flat"] = f"""
    WITH manifest AS (
        SELECT content::JSON AS j
        FROM read_text('{_DPBENCH_DIR}/dataset/reference.json')
    ),
    docs AS (
        SELECT regexp_replace(fname, '\\.pdf$', '') AS doc_id,
               json_extract(j, '$."' || fname || '"') AS annots
        FROM manifest, unnest(json_keys(j)) AS u(fname)
    ),
    elems AS (
        SELECT doc_id,
               CAST(i AS BIGINT) AS idx,
               json_extract(annots, '$.elements[' || i || ']') AS elem
        FROM docs,
             unnest(generate_series(0,
                 CAST(json_array_length(annots, '$.elements') AS BIGINT) - 1))
             AS s(i)
    ),
    parsed AS (
        SELECT doc_id, idx,
               json_extract_string(elem, '$.category') AS cat,
               coalesce(json_extract_string(elem, '$.content.text'), '')
                   AS raw,
               coalesce(json_extract_string(elem, '$.content.html'), '')
                   AS html,
               list_transform(
                   generate_series(0,
                       CAST(json_array_length(elem, '$.coordinates')
                            AS BIGINT) - 1),
                   i -> CAST(json_extract(elem,
                                 '$.coordinates[' || i || '].x')
                             AS DOUBLE)) AS xs,
               list_transform(
                   generate_series(0,
                       CAST(json_array_length(elem, '$.coordinates')
                            AS BIGINT) - 1),
                   i -> CAST(json_extract(elem,
                                 '$.coordinates[' || i || '].y')
                             AS DOUBLE)) AS ys
        FROM elems
    ),
    kinds AS (
        SELECT doc_id, idx,
               list_min(xs) * 612.0 AS l, list_min(ys) * 792.0 AS t,
               list_max(xs) * 612.0 AS r, list_max(ys) * 792.0 AS b,
               CASE cat
                   WHEN 'Header' THEN 'page_header'
                   WHEN 'Footer' THEN 'page_footer'
                   WHEN 'Paragraph' THEN 'text'
                   WHEN 'List' THEN 'list_item'
                   WHEN 'Caption' THEN 'caption'
                   WHEN 'Equation' THEN 'formula'
                   WHEN 'Footnote' THEN 'footnote'
                   WHEN 'Heading1' THEN 'section_header'
                   WHEN 'Figure' THEN 'picture'
                   WHEN 'Chart' THEN 'picture'
                   WHEN 'Table' THEN 'table'
                   WHEN 'Index' THEN 'document_index'
               END AS kind,
               CASE
                   WHEN cat IN ('Figure', 'Chart') THEN ''
                   WHEN cat = 'Table' THEN array_to_string(
                       regexp_extract_all(html,
                           '<t[dh][^>]*>([^<]*)</t[dh]>', 1), ' ')
                   WHEN cat = 'Index' THEN array_to_string(
                       list_transform(
                           str_split(raw, chr(10)),
                           r -> array_to_string(
                                   list_slice(str_split(r, ' '), 1,
                                              len(str_split(r, ' ')) - 1),
                                   ' ')
                                || ' ' ||
                                str_split(r, ' ')[len(str_split(r, ' '))]),
                       ' ')
                   ELSE replace(raw, chr(10), ' ')
               END AS text,
               CASE WHEN cat IN ('Figure', 'Chart')
                    THEN 'img:' || doc_id || ':' || CAST(idx AS VARCHAR)
                    ELSE '' END AS media_ref,
               CAST(cat IN ('Table', 'Index') AS BIGINT) AS is_table,
               CAST(cat IN ('Figure', 'Chart') AS BIGINT) AS is_picture
        FROM parsed
    ),
    counters AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_elements,
               CAST(sum(is_table) AS BIGINT) AS n_tables,
               CAST(sum(is_picture) AS BIGINT) AS n_pictures
        FROM kinds GROUP BY doc_id
    )
    SELECT k.doc_id, k.idx AS "offset", k.kind, k.text, k.media_ref,
           round_even(k.l, 6) AS l, round_even(k.t, 6) AS t,
           round_even(k.r, 6) AS r, round_even(k.b, 6) AS b,
           c.n_elements, c.n_tables, c.n_pictures
    FROM kinds k
    JOIN counters c ON c.doc_id = k.doc_id
"""

ORACLE_SQL["docvqa_gt_flat"] = f"""
    WITH qa AS (
        SELECT doc_id, CAST(question_id AS BIGINT) AS question_id,
               question, answers
        FROM read_json_auto('{_DOCVQA_JSONL}',
                            format = 'newline_delimited')
    ),
    based AS (
        SELECT *,
               CAST(coalesce(sum(1 + len(answers)) OVER (
                   PARTITION BY doc_id ORDER BY question_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS base
        FROM qa
    ),
    counters AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_questions,
               CAST(sum(1 + len(answers)) AS BIGINT) AS n_cells
        FROM qa GROUP BY doc_id
    ),
    spans AS (
        SELECT doc_id, base AS "offset", 'key' AS kind, question AS text
        FROM based
        UNION ALL
        SELECT b.doc_id,
               b.base + CAST(s.i AS BIGINT) AS "offset",
               'value' AS kind,
               b.answers[CAST(s.i AS BIGINT)] AS text
        FROM based b,
             unnest(generate_series(1, len(b.answers))) AS s(i)
    )
    SELECT s.doc_id, s."offset", s.kind, s.text, c.n_questions, c.n_cells
    FROM spans s JOIN counters c ON c.doc_id = s.doc_id
"""

# fixture PLAN literals = tools/make_pdf_fixture.py; the classifier CASE
# mirrors sources/pdf.py:_classify (footer < 6% page height, header >
# 94%, size >= 1.25x page median -> title on the very first first-page
# op else section_header)
ORACLE_SQL["pdf_gt_flat"] = r"""
    WITH plan(doc, page_no, page_w, page_h, ord, x, y, size, text) AS (
        VALUES
        ('report', 1, 612.0, 792.0, 1, 72.0, 740.0, 20.0,
         'Quarterly Extraction Report'),
        ('report', 1, 612.0, 792.0, 2, 72.0, 708.0, 14.0, '1. Overview'),
        ('report', 1, 612.0, 792.0, 3, 72.0, 688.0, 11.0,
         'This document exercises the from-scratch PDF text layer.'),
        ('report', 1, 612.0, 792.0, 4, 72.0, 672.0, 11.0,
         'Escapes: (parens), back\slash, and a tab' || chr(9) || 'stop.'),
        ('report', 1, 612.0, 792.0, 5, 72.0, 640.0, 14.0, '2. Findings'),
        ('report', 1, 612.0, 792.0, 6, 72.0, 620.0, 11.0,
         'Throughput grew 24 percent quarter over quarter.'),
        ('report', 1, 612.0, 792.0, 7, 72.0, 40.0, 8.0, 'page 1 of 2'),
        ('report', 2, 612.0, 792.0, 1, 72.0, 740.0, 14.0, '3. Appendix'),
        ('report', 2, 612.0, 792.0, 2, 72.0, 720.0, 11.0,
         'Second page body line one.'),
        ('report', 2, 612.0, 792.0, 3, 72.0, 704.0, 11.0,
         'Second page body line two.'),
        ('report', 2, 612.0, 792.0, 4, 72.0, 40.0, 8.0, 'page 2 of 2'),
        ('memo', 1, 595.0, 842.0, 1, 50.0, 800.0, 16.0, 'Memo: fixtures'),
        ('memo', 1, 595.0, 842.0, 2, 50.0, 770.0, 10.0,
         'Uncompressed content stream variant.'),
        ('memo', 1, 595.0, 842.0, 3, 50.0, 754.0, 10.0,
         'Latin-1 bytes: café, naïve, Ångström.')
    ),
    med AS (
        SELECT doc, page_no,
               list_sort(list(size))[CAST(count(*) // 2 AS BIGINT) + 1]
                   AS median
        FROM plan GROUP BY doc, page_no
    ),
    classified AS (
        SELECT p.*,
               CAST(row_number() OVER (PARTITION BY p.doc, p.page_no
                                       ORDER BY p.ord) - 1 AS BIGINT)
                   AS off,
               CASE
                   WHEN p.y < p.page_h * 0.06 THEN 'page_footer'
                   WHEN p.y > p.page_h * 0.94 THEN 'page_header'
                   WHEN m.median > 0 AND p.size >= m.median * 1.25 THEN
                       CASE WHEN p.page_no = 1 AND p.ord = 1
                            THEN 'title' ELSE 'section_header' END
                   ELSE 'text'
               END AS kind
        FROM plan p JOIN med m ON m.doc = p.doc AND m.page_no = p.page_no
    ),
    counters AS (
        SELECT doc, page_no,
               CAST(count(*) AS BIGINT) AS n_elements,
               CAST(sum(CAST(kind IN ('title', 'section_header')
                             AS INTEGER)) AS BIGINT) AS n_headers
        FROM classified GROUP BY doc, page_no
    )
    SELECT c.doc || '#' || CAST(c.page_no AS VARCHAR) AS doc_id,
           c.off AS "offset", c.kind, c.text,
           round_even(c.x, 6) AS l,
           round_even(c.page_h - c.y - c.size, 6) AS t,
           round_even(c.x + 0.5 * c.size * length(c.text), 6) AS r,
           round_even(c.page_h - c.y, 6) AS b,
           c.page_w, c.page_h, k.n_elements, k.n_headers
    FROM classified c
    JOIN counters k ON k.doc = c.doc AND k.page_no = c.page_no
"""


# Round-5 second wave of GT-builder oracles: xfund (funsd semantics
# under the multi-document wrapper), doclaynet (category map, blacklist
# + bad-category skip, origin flip, list-group census), omnidocbench
# (manifest↔image glob join, dispatch, poly scaling) and otsl (token
# grid geometry + strict anchor↔text zip).

from ..sources.doclaynet import SAMPLE_DIR as _DOCLAYNET_DIR
from ..sources.funsd import XFUND_SAMPLE_DIR as _XFUND_DIR
from ..sources.omnidocbench import SAMPLE_DIR as _OMNIDOC_DIR
from ..sources.otsl_tables import SAMPLE_JSONL as _OTSL_JSONL

ORACLE_SQL["xfund_gt_flat"] = f"""
    WITH files AS (
        SELECT documents
        FROM read_json_auto('{_XFUND_DIR}/*.json', union_by_name = true)
    ),
    docs AS (
        SELECT CAST(d.id AS VARCHAR) AS doc_id,
               CASE WHEN strpos(CAST(d.id AS VARCHAR), '_') > 0
                    THEN split_part(CAST(d.id AS VARCHAR), '_', 1)
                    ELSE '' END AS lang,
               d.document AS items
        FROM files, unnest(documents) AS u(d)
    ),
    items AS (
        SELECT doc_id, lang,
               unnest(items) AS item,
               generate_subscripts(items, 1) AS ord
        FROM docs
    ),
    flat AS (
        SELECT doc_id, lang, ord,
               item.id AS id,
               coalesce(item.label, 'other') AS label,
               coalesce(item.text, '') AS text,
               item.linking AS linking,
               item.words AS words
        FROM items
    ),
    kept AS (
        SELECT *,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ord)
                    - 1 AS BIGINT) AS off
        FROM flat
        WHERE (linking IS NOT NULL AND len(linking) > 0)
           OR label NOT IN ('header', 'other')
    ),
    word_counts AS (
        SELECT k.doc_id, count(*) AS n_words
        FROM kept k, unnest(k.words) AS u(w)
        WHERE w.text IS NOT NULL AND w.box IS NOT NULL
        GROUP BY k.doc_id
    ),
    all_links AS (
        SELECT DISTINCT f.doc_id,
               CAST(pair[1] AS BIGINT) AS s, CAST(pair[2] AS BIGINT) AS t
        FROM flat f, unnest(f.linking) AS u(pair)
        WHERE len(pair) = 2
    ),
    links_kept AS (
        SELECT l.* FROM all_links l
        JOIN kept a ON a.doc_id = l.doc_id AND a.id = l.s
        JOIN kept b ON b.doc_id = l.doc_id AND b.id = l.t
    ),
    deg AS (
        SELECT k.doc_id, k.lang, k.id, k.off, k.text,
               (SELECT count(*) FROM links_kept l
                WHERE l.doc_id = k.doc_id AND l.s = k.id) AS outdeg,
               (SELECT count(*) FROM links_kept l
                WHERE l.doc_id = k.doc_id AND l.t = k.id) AS indeg
        FROM kept k
    ),
    labeled AS (
        SELECT d.*,
               CASE WHEN d.outdeg = 0 THEN 'value'
                    WHEN d.indeg = 0 THEN 'key'
                    WHEN NOT EXISTS (
                        SELECT 1 FROM links_kept l
                        JOIN deg d2 ON d2.doc_id = l.doc_id
                                   AND d2.id = l.t
                        WHERE l.doc_id = d.doc_id AND l.s = d.id
                          AND d2.outdeg > 0)
                    THEN 'key'
                    ELSE 'unspecified' END AS kind
        FROM deg d
    ),
    counters AS (
        SELECT k.doc_id,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST((SELECT count(*) FROM links_kept l
                     WHERE l.doc_id = k.doc_id) AS BIGINT) AS n_links,
               CAST(coalesce((SELECT n_words FROM word_counts w
                              WHERE w.doc_id = k.doc_id), 0) AS BIGINT)
                   AS n_words
        FROM kept k GROUP BY k.doc_id
    )
    SELECT l.doc_id, l.lang, l.off AS "offset", l.kind, l.text,
           c.n_cells, c.n_links, c.n_words
    FROM labeled l JOIN counters c ON c.doc_id = l.doc_id
"""

ORACLE_SQL["doclaynet_gt_flat"] = f"""
    WITH files AS (
        SELECT metadata, image, category_id, bboxes, pdf_cells
        FROM read_json_auto('{_DOCLAYNET_DIR}/*.json',
                            union_by_name = true)
        WHERE metadata.page_hash NOT IN ('page-blacklisted-0001')
          AND len(list_filter(category_id,
                  c -> CAST(c AS BIGINT) < 1 OR CAST(c AS BIGINT) > 11))
              = 0
    ),
    sub AS (
        SELECT metadata.page_hash AS doc_id,
               CAST(image.height AS DOUBLE) AS height,
               category_id, bboxes, pdf_cells,
               generate_subscripts(category_id, 1) AS i
        FROM files
    ),
    elems AS (
        SELECT doc_id, height,
               CAST(category_id[i] AS BIGINT) AS cid,
               bboxes[i] AS box,
               pdf_cells[i] AS cells,
               CAST(i AS BIGINT) - 1 AS idx
        FROM sub
    ),
    labeled AS (
        SELECT doc_id, idx, height,
               CASE cid WHEN 1 THEN 'caption' WHEN 2 THEN 'footnote'
                    WHEN 3 THEN 'formula' WHEN 4 THEN 'list_item'
                    WHEN 5 THEN 'page_footer' WHEN 6 THEN 'page_header'
                    WHEN 7 THEN 'picture' WHEN 8 THEN 'section_header'
                    WHEN 9 THEN 'table' WHEN 10 THEN 'text'
                    WHEN 11 THEN 'title' END AS kind,
               CAST(box[1] AS DOUBLE) AS bl,
               CAST(box[2] AS DOUBLE) AS bt,
               CAST(box[3] AS DOUBLE) AS bw,
               CAST(box[4] AS DOUBLE) AS bh,
               coalesce(array_to_string(
                   list_transform(cells, c -> c.text), ' '), '')
                   AS content
        FROM elems
    ),
    spans AS (
        SELECT doc_id, idx, kind,
               CASE WHEN kind = 'picture' THEN '' ELSE content END
                   AS text,
               CASE WHEN kind = 'picture'
                    THEN 'img/' || doc_id || '/' || CAST(idx AS VARCHAR)
                    ELSE '' END AS media_ref,
               round_even(bl, 6) AS l,
               round_even(height - bt, 6) AS t,
               round_even(bl + bw, 6) AS r,
               round_even(height - (bt + bh), 6) AS b,
               CAST(kind = 'list_item' AS INTEGER) AS is_li
        FROM labeled
    ),
    counters AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_elements,
               CAST(sum(CASE WHEN is_li = 1 AND coalesce(lag_li, 0) = 0
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_list_groups
        FROM (
            SELECT doc_id, is_li,
                   lag(is_li) OVER (PARTITION BY doc_id ORDER BY idx)
                       AS lag_li
            FROM spans
        ) GROUP BY doc_id
    )
    SELECT s.doc_id, s.idx AS "offset", s.kind, s.text, s.media_ref,
           s.l, s.t, s.r, s.b, c.n_elements, c.n_list_groups
    FROM spans s JOIN counters c ON c.doc_id = s.doc_id
"""

_POLY_XS = ("list_transform(generate_series(1, len(poly), 2), "
            "j -> CAST(poly[j] AS DOUBLE))")
_POLY_YS = ("list_transform(generate_series(2, len(poly), 2), "
            "j -> CAST(poly[j] AS DOUBLE))")

ORACLE_SQL["omnidocbench_gt_flat"] = f"""
    WITH manifest AS (
        SELECT page_info, layout_dets
        FROM read_json_auto('{_OMNIDOC_DIR}/OmniDocBench.json',
                            union_by_name = true)
    ),
    imgs AS (
        SELECT regexp_extract(file, '([^/\\\\]+)$', 1) AS image
        FROM glob('{_OMNIDOC_DIR}/images/*.jpg')
    ),
    pages AS (
        SELECT m.page_info.image_path AS doc_id,
               CAST(m.page_info.width AS DOUBLE) AS gt_w,
               CAST(m.page_info.height AS DOUBLE) AS gt_h,
               m.layout_dets AS dets
        FROM manifest m JOIN imgs i ON i.image = m.page_info.image_path
    ),
    sub AS (
        SELECT doc_id, gt_w, gt_h, dets,
               generate_subscripts(dets, 1) AS i
        FROM pages
    ),
    elems AS (
        SELECT doc_id, gt_w, gt_h,
               CAST(i AS BIGINT) - 1 AS elem_idx,
               dets[i].category_type AS cat,
               dets[i].text AS rawtext,
               dets[i].html AS html,
               dets[i].poly AS poly
        FROM sub
    ),
    mapped AS (
        SELECT *,
               CASE cat
                   WHEN 'title' THEN 'section_header'
                   WHEN 'text_block' THEN 'text'
                   WHEN 'text_mask' THEN 'text'
                   WHEN 'table_mask' THEN 'text'
                   WHEN 'code_txt' THEN 'text'
                   WHEN 'abandon' THEN 'text'
                   WHEN 'need_mask' THEN 'text'
                   WHEN 'reference' THEN 'text'
                   WHEN 'table_caption' THEN 'caption'
                   WHEN 'figure_caption' THEN 'caption'
                   WHEN 'equation_caption' THEN 'caption'
                   WHEN 'table_footnote' THEN 'footnote'
                   WHEN 'figure_footnote' THEN 'footnote'
                   WHEN 'page_footnote' THEN 'footnote'
                   WHEN 'equation_isolated' THEN 'formula'
                   WHEN 'header' THEN 'page_header'
                   WHEN 'footer' THEN 'page_footer'
                   WHEN 'page_number' THEN 'page_footer'
                   WHEN 'figure' THEN 'picture'
                   WHEN 'table' THEN 'table'
               END AS kind
        FROM elems
    ),
    emitted AS (
        SELECT *,
               CAST(row_number() OVER (PARTITION BY doc_id
                                       ORDER BY elem_idx) - 1 AS BIGINT)
                   AS off
        FROM mapped WHERE kind IS NOT NULL
    ),
    spans AS (
        SELECT doc_id, off, kind,
               CASE WHEN kind = 'picture' THEN ''
                    WHEN cat = 'table' THEN coalesce(array_to_string(
                        regexp_extract_all(coalesce(html, ''),
                            '<t[dh][^>]*>([^<]*)</t[dh]>', 1), ' '), '')
                    ELSE coalesce(rawtext,
                        '&lt;omitted text for ' || cat || '&gt;') END
                   AS text,
               CASE WHEN kind = 'picture'
                    THEN 'img:' || doc_id || ':' || CAST(off AS VARCHAR)
                    ELSE '' END AS media_ref,
               round_even(list_min({_POLY_XS}) * 612.0 / gt_w, 6) AS l,
               round_even(list_min({_POLY_YS}) * 792.0 / gt_h, 6) AS t,
               round_even(list_max({_POLY_XS}) * 612.0 / gt_w, 6) AS r,
               round_even(list_max({_POLY_YS}) * 792.0 / gt_h, 6) AS b
        FROM emitted
    ),
    counters AS (
        SELECT doc_id,
               CAST(count(*) FILTER (kind IS NOT NULL) AS BIGINT)
                   AS n_elements,
               CAST(count(*) FILTER (cat = 'table') AS BIGINT)
                   AS n_tables,
               CAST(count(*) FILTER (cat = 'figure') AS BIGINT)
                   AS n_figures,
               CAST(count(*) FILTER (kind IS NULL) AS BIGINT)
                   AS n_unknown
        FROM mapped GROUP BY doc_id
    )
    SELECT s.doc_id, s.off AS "offset", s.kind, s.text, s.media_ref,
           s.l, s.t, s.r, s.b,
           c.n_elements, c.n_tables, c.n_figures, c.n_unknown
    FROM spans s JOIN counters c ON c.doc_id = s.doc_id
"""

ORACLE_SQL["otsl_gt_flat"] = f"""
    WITH recs AS (
        SELECT doc_id, otsl, cell_texts
        FROM read_json_auto('{_OTSL_JSONL}',
                            format = 'newline_delimited')
    ),
    toks AS (
        SELECT doc_id, str_split(otsl, ' ') AS tokens FROM recs
    ),
    tok AS (
        SELECT doc_id,
               tokens[i] AS tok,
               CAST(i AS BIGINT) AS pos
        FROM (SELECT doc_id, tokens,
                     generate_subscripts(tokens, 1) AS i FROM toks)
    ),
    rowed AS (
        SELECT doc_id, tok, pos,
               CAST(coalesce(sum(CASE WHEN tok = 'nl' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS BIGINT) AS rowno
        FROM tok
    ),
    geom AS (
        SELECT doc_id,
               CAST(count(DISTINCT rowno) AS BIGINT) AS n_rows,
               CAST(max(cnt) AS BIGINT) AS n_cols
        FROM (
            SELECT doc_id, rowno, count(*) AS cnt
            FROM rowed WHERE tok <> 'nl'
            GROUP BY doc_id, rowno
        ) GROUP BY doc_id
    ),
    content AS (
        SELECT doc_id, tok, pos,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                    - 1 AS BIGINT) AS cidx
        FROM rowed WHERE tok IN ('fcel', 'ched', 'rhed')
    ),
    valid AS (
        SELECT r.doc_id, r.cell_texts, g.n_rows, g.n_cols
        FROM recs r
        JOIN geom g ON g.doc_id = r.doc_id
        WHERE len(r.cell_texts) = (
            SELECT count(*) FROM content c WHERE c.doc_id = r.doc_id
        )
    )
    SELECT v.doc_id, CAST(0 AS BIGINT) AS "offset",
           'table' AS kind, '' AS text,
           'otsl/' || v.doc_id AS media_ref,
           v.n_rows, v.n_cols
    FROM valid v
    UNION ALL
    SELECT v.doc_id, c.cidx + 1 AS "offset",
           'text' AS kind,
           v.cell_texts[c.cidx + 1] AS text,
           '' AS media_ref,
           v.n_rows, v.n_cols
    FROM valid v JOIN content c ON c.doc_id = v.doc_id
"""


from ..sources.pixparse import SAMPLE_DIR as _PIXPARSE_DIR

ORACLE_SQL["pixparse_gt_flat"] = f"""
    WITH gts AS (
        SELECT regexp_extract(filename,
                   '([^/\\\\]+)/ground_truth\\.json$', 1) AS doc_id,
               pages
        FROM read_json(
            '{_PIXPARSE_DIR}/*/ground_truth.json',
            filename = true, ignore_errors = true,
            columns = {{pages: 'STRUCT(text VARCHAR[], bbox DOUBLE[][],
                               score DOUBLE[])[]'}})
        WHERE pages IS NOT NULL
    ),
    imgs AS (
        SELECT regexp_extract(filename,
                   '([^/\\\\]+)/original\\.tif$', 1) AS doc_id,
               CAST(size AS BIGINT) AS image_bytes
        FROM read_blob('{_PIXPARSE_DIR}/*/original.tif')
    ),
    docs AS (
        SELECT g.doc_id, g.pages, i.image_bytes
        FROM gts g JOIN imgs i ON i.doc_id = g.doc_id
    ),
    paged AS (
        SELECT doc_id, image_bytes, pages,
               generate_subscripts(pages, 1) AS p
        FROM docs
    ),
    worded AS (
        SELECT doc_id, image_bytes, p,
               pages[p].text AS texts,
               pages[p].bbox AS bboxes,
               pages[p].score AS scores,
               generate_subscripts(pages[p].text, 1) AS w
        FROM paged
    ),
    words AS (
        SELECT doc_id, image_bytes, p, w,
               texts[w] AS text,
               bboxes[w] AS bbox,
               scores[w] AS score,
               CAST(row_number() OVER (PARTITION BY doc_id
                    ORDER BY p, w) - 1 AS BIGINT) AS off
        FROM worded
    ),
    counters AS (
        SELECT doc_id,
               CAST(count(DISTINCT p) AS BIGINT) AS n_pages,
               CAST(count(*) AS BIGINT) AS n_words
        FROM words GROUP BY doc_id
    )
    SELECT wd.doc_id, wd.off AS "offset", 'word' AS kind, wd.text,
           round_even(CAST(wd.bbox[1] AS DOUBLE), 6) AS l,
           round_even(CAST(wd.bbox[2] AS DOUBLE), 6) AS t,
           round_even(CAST(wd.bbox[1] + wd.bbox[3] AS DOUBLE), 6) AS r,
           round_even(CAST(wd.bbox[2] + wd.bbox[4] AS DOUBLE), 6) AS b,
           round_even(CAST(wd.score AS DOUBLE), 6) AS score,
           'img/' || wd.doc_id || '/page1' AS media_ref,
           wd.image_bytes,
           c.n_pages, c.n_words
    FROM words wd JOIN counters c ON c.doc_id = wd.doc_id
"""


from ..sources.doclaynet_v2 import SAMPLE_DIR as _V2_DIR

ORACLE_SQL["doclaynet_v2_gt_flat"] = f"""
WITH files AS (
    SELECT page_hash, image, labels, segments, boxes
    FROM read_json_auto(
        '{_V2_DIR}/*.json',
        union_by_name = true)
    WHERE labels IS NOT NULL AND segments IS NOT NULL
      AND boxes IS NOT NULL AND image IS NOT NULL
),
sub AS (
    SELECT page_hash AS doc_id,
           CAST(image.height AS DOUBLE) AS height,
           labels, segments, boxes,
           generate_subscripts(labels, 1) AS i
    FROM files
),
elems AS (
    SELECT doc_id, height,
           CAST(i AS BIGINT) - 1 AS idx,
           lower(replace(replace(labels[i], '-', '_'), ' ', '_'))
               AS norm,
           coalesce(segments[i].text, '') AS segtext,
           segments[i].data.otsl_seq AS otsl_seq,
           boxes[i] AS box
    FROM sub
),
kinds AS (
    SELECT *,
           CASE WHEN norm IN ('caption','footnote','formula','list_item',
               'page_footer','page_header','picture','section_header',
               'table','text','title','document_index','form',
               'key_value_region','checkbox_selected',
               'checkbox_unselected','code','paragraph')
                THEN norm ELSE 'text' END AS kind,
           CAST(norm NOT IN ('caption','footnote','formula','list_item',
               'page_footer','page_header','picture','section_header',
               'table','text','title','document_index','form',
               'key_value_region','checkbox_selected',
               'checkbox_unselected','code','paragraph') AS INTEGER)
               AS is_fallback
    FROM elems
),
tabbed AS (
    SELECT *,
           CASE WHEN kind IN ('table', 'document_index')
                THEN CAST(count(*) FILTER (
                        kind IN ('table', 'document_index'))
                     OVER (PARTITION BY doc_id ORDER BY idx
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS BIGINT)
                ELSE NULL END AS table_idx,
           CASE WHEN kind IN ('table', 'document_index') THEN
               CASE WHEN otsl_seq IS NOT NULL AND len(otsl_seq) > 0
                    THEN CAST(len(list_filter(otsl_seq,
                              t -> t = '<nl>')) AS BIGINT)
                    ELSE CAST(1 AS BIGINT) END
           END AS t_rows,
           CASE WHEN kind IN ('table', 'document_index') THEN
               CASE WHEN otsl_seq IS NOT NULL AND len(otsl_seq) > 0
                    THEN CAST(list_max(list_transform(
                             str_split(array_to_string(otsl_seq, ' '),
                                       '<nl>'),
                             r -> len(list_filter(str_split(trim(r),
                                      ' '), x -> x <> '')))) AS BIGINT)
                    ELSE CAST(1 AS BIGINT) END
           END AS t_cols
    FROM kinds
),
spans AS (
    SELECT doc_id, idx, kind,
           CASE WHEN kind = 'picture' THEN ''
                WHEN kind IN ('form', 'key_value_region') THEN ''
                ELSE segtext END AS text,
           CASE WHEN kind = 'picture'
                THEN 'img/' || doc_id || '/' || CAST(idx AS VARCHAR)
                WHEN kind IN ('table', 'document_index')
                THEN 'table/' || doc_id || '/'
                     || CAST(table_idx AS VARCHAR)
                ELSE '' END AS media_ref,
           round_even(CAST(box[1] AS DOUBLE), 6) AS l,
           round_even(height - CAST(box[2] AS DOUBLE), 6) AS t,
           round_even(CAST(box[3] AS DOUBLE), 6) AS r,
           round_even(height - CAST(box[4] AS DOUBLE), 6) AS b,
           coalesce(t_rows, -1) AS t_rows,
           coalesce(t_cols, -1) AS t_cols,
           CAST(kind = 'list_item' AS INTEGER) AS is_li,
           is_fallback,
           CAST(kind IN ('form', 'key_value_region') AS INTEGER)
               AS is_group
    FROM tabbed
),
counters AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_elements,
           CAST(sum(CASE WHEN is_li = 1 AND coalesce(lag_li, 0) = 0
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_list_groups,
           CAST(sum(is_group) AS BIGINT) AS n_groups,
           CAST(sum(is_fallback) AS BIGINT) AS n_fallback_labels
    FROM (
        SELECT doc_id, is_li, is_group, is_fallback,
               lag(is_li) OVER (PARTITION BY doc_id ORDER BY idx)
                   AS lag_li
        FROM spans
    ) GROUP BY doc_id
)
SELECT s.doc_id, s.idx AS "offset", s.kind, s.text, s.media_ref,
       s.l, s.t, s.r, s.b, s.t_rows, s.t_cols,
       c.n_elements, c.n_list_groups, c.n_groups, c.n_fallback_labels
FROM spans s JOIN counters c ON c.doc_id = s.doc_id
"""


def _pq_knn_sql() -> str:
    """SQL replica of stages/knn.py:pq_knn (written for PQ_ITERS == 1):
    the rational lattice init, BOTH assignment rounds (argmin of the
    identically-rounded squared L2 per subspace, lowest-code ties), the
    mean codebook update with empty codes keeping their init row
    (COALESCE ≡ ``new = books.copy()``), the ADC lookup table and the
    final rounded-distance top-k."""
    from ..stages.knn import KNN_K, PQ_DSUB, PQ_ITERS, PQ_K, PQ_M

    assert PQ_ITERS == 1, "SQL replica is written for 1 update round"

    def dist_assign(cent, tag):
        return f"""
    d{tag} AS (
        SELECT s.vec_id, s.m, c.c,
               round_even(sum((s.v - c.cv) * (s.v - c.cv)), 6) AS d2
        FROM sub s JOIN {cent} c ON c.m = s.m AND c.j = s.j
        GROUP BY s.vec_id, s.m, c.c
    ),
    a{tag} AS (
        SELECT vec_id, m, c AS code FROM d{tag}
        QUALIFY row_number() OVER (
            PARTITION BY vec_id, m ORDER BY d2, c) = 1
    )"""

    return f"""
    WITH vals AS (
        SELECT vec_id,
               unnest(CAST(embedding AS DOUBLE[])) AS v,
               generate_subscripts(embedding, 1) - 1 AS gd
        FROM embeddings
    ),
    sub AS (
        SELECT vec_id, gd // {PQ_DSUB} AS m, gd % {PQ_DSUB} AS j, v
        FROM vals
    ),
    cent0 AS (
        SELECT tm.m, tc.c, tj.j,
               (((3 * tc.c + 5 * (tm.m * {PQ_DSUB} + tj.j)) % 13) - 6)
                   / 6.0 AS cv
        FROM range({PQ_M}) tm(m), range({PQ_K}) tc(c),
             range({PQ_DSUB}) tj(j)
    ),{dist_assign("cent0", 0)},
    u1 AS (
        SELECT a.m, a.code, s.j, avg(s.v) AS cv
        FROM sub s JOIN a0 a ON a.vec_id = s.vec_id AND a.m = s.m
        GROUP BY a.m, a.code, s.j
    ),
    cent1 AS (
        SELECT c0.m, c0.c, c0.j, COALESCE(u.cv, c0.cv) AS cv
        FROM cent0 c0 LEFT JOIN u1 u
          ON u.m = c0.m AND u.code = c0.c AND u.j = c0.j
    ),{dist_assign("cent1", 1)},
    qd AS (
        SELECT m, c, sum((0.125 - cv) * (0.125 - cv)) AS qd2
        FROM cent1 GROUP BY m, c
    ),
    adc AS (
        SELECT a.vec_id, round_even(sum(q.qd2), 6) AS adc_dist
        FROM a1 a JOIN qd q ON q.m = a.m AND q.c = a.code
        GROUP BY a.vec_id
    )
    SELECT vec_id, adc_dist FROM adc
    ORDER BY adc_dist, vec_id LIMIT {KNN_K}
"""


ORACLE_SQL["pq_knn"] = _pq_knn_sql()


# Zipf fit: identical closed-form regression on both sides (the lone
# driver-side step is output-sized: ZIPF_TOPK points)
from ..pipelines.corpus_ops import ZIPF_TOPK as _ZIPF_K

ORACLE_SQL["zipf_fit"] = _TOKS_CTE + f""",
    cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    top AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r
        FROM cnt ORDER BY c DESC, tok LIMIT {_ZIPF_K}
    ),
    pts AS (
        SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
        FROM top
    ),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM pts
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM cnt) AS n_types,
           round_even((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
               AS zipf_slope,
           round_even((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                       * sx) / n, 6) AS zipf_intercept
    FROM s
"""

# shingle novelty: lead()-built n-grams, DISTINCT per doc, min-doc_id
# ownership — same two exchanges the Ray plan makes
from ..pipelines.corpus_ops import NOVELTY_N as _NOV_N

_NOV_SHINGLE = " || ' ' || ".join(
    ["tok"] + [f"lead(tok, {i}) OVER w" for i in range(1, _NOV_N)]
)
ORACLE_SQL["ngram_novelty"] = _TOKS_CTE + f""",
    sh AS (
        SELECT doc_id, {_NOV_SHINGLE} AS s
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
    ),
    shv AS (SELECT DISTINCT doc_id, s FROM sh WHERE s IS NOT NULL),
    own AS (SELECT s, min(doc_id) AS owner FROM shv GROUP BY s),
    agg AS (
        SELECT v.doc_id,
               CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(sum(CASE WHEN o.owner = v.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel
        FROM shv v JOIN own o USING (s) GROUP BY v.doc_id
    )
    SELECT doc_id, n_shingles, n_novel,
           round_even(CAST(n_novel AS DOUBLE) / n_shingles, 6) AS novelty
    FROM agg
"""


# char-entropy quality banding: per-doc byte==char entropy (ASCII
# corpus; documented divergence on multi-byte text), banded on the
# ROUNDED value exactly as corpus_ops.char_entropy_quality does
from ..pipelines.corpus_ops import ENTROPY_HIGH as _ENT_HI
from ..pipelines.corpus_ops import ENTROPY_LOW as _ENT_LO

ORACLE_SQL["char_entropy_quality"] = f"""
    WITH ch AS (
        SELECT doc_id, lang,
               substr(text, unnest(generate_series(1, length(text))), 1)
                   AS ch
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, ch, CAST(count(*) AS DOUBLE) AS n
        FROM ch GROUP BY 1, 2, 3
    ),
    h AS (
        SELECT doc_id, lang,
               round_even(sum(-(n / t) * log2(n / t)), 6) AS ent
        FROM (
            SELECT doc_id, lang, n,
                   CAST(sum(n) OVER (PARTITION BY doc_id) AS DOUBLE) AS t
            FROM c
        ) GROUP BY 1, 2
    )
    SELECT lang,
           CASE WHEN ent < {_ENT_LO} THEN 'low'
                WHEN ent < {_ENT_HI} THEN 'mid'
                ELSE 'high' END AS band,
           CAST(count(*) AS BIGINT) AS n_docs,
           round_even(sum(ent) / count(*), 4) AS mean_entropy
    FROM h GROUP BY 1, 2
"""


# SQ8 recall@k: exact + dequantized scans over the same rational query
# panel stages/knn.py:_recall_query_panel builds; both tiers rank by
# the ROUNDED sim with vec_id tiebreak (the established convention)
from ..stages.knn import SQ8_RECALL_Q as _SQ8_RQ

ORACLE_SQL["sq8_recall_at_k"] = f"""
    WITH qr AS (
        SELECT i AS query_id, d,
               (CAST((3 * i + 5 * d) % 13 AS DOUBLE) - 6) / 6 AS qv
        FROM range({_SQ8_RQ}) t(i), range(64) t2(d)
    ),
    qn AS (
        SELECT query_id, d,
               qv / sqrt(sum(qv * qv) OVER (PARTITION BY query_id)) AS qv
        FROM qr
    ),
    vals AS (
        SELECT vec_id,
               unnest(CAST(embedding AS DOUBLE[])) AS v,
               generate_subscripts(embedding, 1) - 1 AS d
        FROM embeddings
    ),
    dims AS (SELECT d, min(v) AS mn, max(v) AS mx FROM vals GROUP BY d),
    nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nv FROM vals GROUP BY vec_id),
    exd AS (
        SELECT q.query_id, v.vec_id, sum(v.v * q.qv) AS dot
        FROM vals v JOIN qn q USING (d) GROUP BY 1, 2
    ),
    ext AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round_even(dot / nv, 6) DESC, vec_id) AS rn
            FROM exd JOIN nrm USING (vec_id)
        ) WHERE rn <= {KNN_K}
    ),
    deq AS (
        SELECT vec_id, d,
               CASE WHEN mx = mn THEN mn
                    ELSE mn + (least(255.0, greatest(0.0,
                         floor((v - mn) / (mx - mn) * 255.0))) + 0.5)
                         * (mx - mn) / 256.0 END AS xv
        FROM vals JOIN dims USING (d)
    ),
    sqn AS (SELECT vec_id, sqrt(sum(xv * xv)) AS nv FROM deq GROUP BY vec_id),
    sqd AS (
        SELECT q.query_id, x.vec_id, sum(x.xv * q.qv) AS dot
        FROM deq x JOIN qn q USING (d) GROUP BY 1, 2
    ),
    sqt AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round_even(dot / nv, 6) DESC, vec_id) AS rn
            FROM sqd JOIN sqn USING (vec_id)
        ) WHERE rn <= {KNN_K}
    ),
    ov AS (
        SELECT query_id, CAST(count(*) AS BIGINT) AS n_overlap
        FROM ext JOIN sqt USING (query_id, vec_id) GROUP BY 1
    )
    SELECT i AS query_id,
           coalesce(n_overlap, 0) AS n_overlap,
           round_even(CAST(coalesce(n_overlap, 0) AS DOUBLE) / {KNN_K}, 4)
               AS recall
    FROM range({_SQ8_RQ}) t(i) LEFT JOIN ov ON ov.query_id = i
"""


# MMR diverse top-k: the greedy argmax is unrolled into MMR_K-1 chained
# CTEs (s1..sK carry the picked list; sc{t} scores the remaining pool
# against it) — same rounded arithmetic and vec_id tiebreaks as
# stages/knn.py:mmr_diverse_topk, incl. the MMR_MU-as-literal rule
from ..stages.knn import MMR_K as _MMR_K
from ..stages.knn import MMR_LAMBDA as _MMR_L
from ..stages.knn import MMR_MU as _MMR_M
from ..stages.knn import MMR_POOL as _MMR_P


def _mmr_sql() -> str:
    steps = []
    for t in range(2, _MMR_K + 1):
        steps.append(f"""
    sc{t} AS (
        SELECT c.vec_id,
               round_even({_MMR_L} * min(c.sim) - {_MMR_M} * max(p.s), 6)
                   AS mmr
        FROM cand c CROSS JOIN s{t - 1} prev
        JOIN pair p ON p.i = c.vec_id
                   AND list_contains(prev.picked, p.j)
        WHERE NOT list_contains(prev.picked, c.vec_id)
        GROUP BY c.vec_id
    ),
    s{t} AS (
        SELECT list_append(prev.picked,
                           (SELECT vec_id FROM sc{t}
                            ORDER BY mmr DESC, vec_id LIMIT 1)) AS picked
        FROM s{t - 1} prev
    )""")
    return f"""
    WITH cand AS (
        SELECT vec_id,
               round_even(list_cosine_similarity(
                   CAST(embedding AS DOUBLE[]), {KNN_QUERY!r}), 6) AS sim,
               CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings
        ORDER BY sim DESC, vec_id
        LIMIT {_MMR_P}
    ),
    pair AS (
        SELECT a.vec_id AS i, b.vec_id AS j,
               round_even(list_cosine_similarity(a.emb, b.emb), 6) AS s
        FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),
    s1 AS (
        SELECT list_value(vec_id) AS picked FROM cand
        ORDER BY sim DESC, vec_id LIMIT 1
    ),{",".join(steps)},
    sel AS (
        SELECT CAST(generate_subscripts(picked, 1) AS BIGINT) AS mmr_rank,
               unnest(picked) AS vec_id
        FROM s{_MMR_K}
    )
    SELECT sel.mmr_rank, sel.vec_id, c.sim
    FROM sel JOIN cand c USING (vec_id)
"""


ORACLE_SQL["mmr_diverse_topk"] = _mmr_sql()


def _minhash_calib_sql() -> str:
    """SQL replica of ``minhash_jaccard_calibration``: same 128-perm
    signature rebuild as the minhash_near_dups oracle (shared (a, b)
    literals), candidates by band min-vector equality, the SAME
    deterministic md5("{a}-{b}") ORDER BY ... LIMIT sample, then
    integer per-pair quantities (matches, 1e6 fixed-point exact
    Jaccard) so the bin means are accumulation-order-proof."""
    from ..stages.dedup import MHC_PAIR_CAP, MinHasher

    mh = MinHasher()  # num_perm=128, bands=32, k=3, seed=42
    rows = ", ".join(
        f"({i}, {int(a)}, {int(b)})"
        for i, (a, b) in enumerate(zip(mh._a, mh._b))
    )
    r = mh._rows
    return r"""
    WITH base AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id, g FROM (
            SELECT doc_id, array_to_string(a, ' ') AS g
            FROM base WHERE len(a) < 3
            UNION ALL
            SELECT doc_id, array_to_string(a[i : i + 2], ' ')
            FROM (SELECT doc_id, a,
                         unnest(generate_series(1, len(a) - 2)) AS i
                  FROM base WHERE len(a) >= 3)
        )
    ),
    x AS (
        SELECT DISTINCT doc_id,
               CAST(('0x' || substr(md5(g), 1, 16)) AS UBIGINT) AS x64
        FROM grams
    ),
    perm AS (
        SELECT i, CAST(pa AS UBIGINT) AS pa, CAST(pb AS UBIGINT) AS pb
        FROM (VALUES """ + rows + r""") AS p(i, pa, pb)
    ),
    sig AS (
        SELECT doc_id, p.i,
               min((p.pa * (x.x64 % 2147483647) + p.pb) % 2147483647) AS m
        FROM x CROSS JOIN perm p GROUP BY doc_id, p.i
    ),
    bands AS (
        SELECT doc_id, i // """ + str(r) + r""" AS band,
               string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bkey
        FROM sig GROUP BY doc_id, i // """ + str(r) + r"""
    ),
    cand0 AS (
        SELECT DISTINCT lo.doc_id AS da, hi.doc_id AS db
        FROM bands lo JOIN bands hi
          ON lo.band = hi.band AND lo.bkey = hi.bkey
         AND lo.doc_id < hi.doc_id
    ),
    cand AS (
        SELECT da, db FROM cand0
        ORDER BY md5(CAST(da AS VARCHAR) || '-' || CAST(db AS VARCHAR))
        LIMIT """ + str(MHC_PAIR_CAP) + r"""
    ),
    sizes AS (SELECT doc_id, count(*) AS nsz FROM x GROUP BY doc_id),
    inter AS (
        SELECT c.da, c.db, count(*) AS nc
        FROM cand c
        JOIN x ga ON ga.doc_id = c.da
        JOIN x gb ON gb.doc_id = c.db AND gb.x64 = ga.x64
        GROUP BY c.da, c.db
    ),
    est AS (
        SELECT c.da, c.db,
               sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS matches
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.da
        JOIN sig sb ON sb.doc_id = c.db AND sb.i = sa.i
        GROUP BY c.da, c.db
    ),
    pairs AS (
        SELECT e.matches,
               CAST(round_even(CAST(coalesce(i.nc, 0) AS DOUBLE)
                    / (sa.nsz + sb.nsz - coalesce(i.nc, 0)) * 1000000.0,
                    0) AS BIGINT) AS e6
        FROM est e
        LEFT JOIN inter i ON i.da = e.da AND i.db = e.db
        JOIN sizes sa ON sa.doc_id = e.da
        JOIN sizes sb ON sb.doc_id = e.db
    ),
    binned AS (
        SELECT least(e6 // 100000, 9) AS bin, matches, e6,
               abs(matches * 1000000 - e6 * 128) AS err
        FROM pairs
    )
    SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_pairs,
           round_even(CAST(sum(matches) AS DOUBLE)
                      / (128.0 * count(*)), 6) AS mean_est,
           round_even(CAST(sum(e6) AS DOUBLE)
                      / (count(*) * 1000000.0), 6) AS mean_exact,
           round_even(CAST(sum(err) AS DOUBLE)
                      / (count(*) * 128 * 1000000.0), 6) AS mean_abs_err
    FROM binned GROUP BY bin ORDER BY bin
"""


ORACLE_SQL["minhash_jaccard_calibration"] = _minhash_calib_sql()


ORACLE_SQL["quality_classifier_score"] = r"""
    WITH base AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
        FROM documents
    ),
    uni AS (SELECT doc_id, unnest(a) AS tok FROM base),
    big AS (
        SELECT doc_id, a[i] || ' ' || a[i + 1] AS tok
        FROM (SELECT doc_id, a,
                     unnest(generate_series(1, len(a) - 1)) AS i
              FROM base WHERE len(a) >= 2)
    ),
    feats AS (
        SELECT doc_id, tok FROM uni
        UNION ALL
        SELECT doc_id, tok FROM big
    ),
    -- bucket = md5_prefix32(tok) % 1024; w = md5_prefix32('w-'||bucket)
    -- % 2001 - 1000 — the same deterministic stand-in lattice as
    -- cleaning._QC_W (fastText hashing trick, integer weights)
    scored AS (
        SELECT doc_id,
               CAST(CAST(('0x' || substr(md5('w-' || CAST(
                        CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT)
                        % 1024 AS VARCHAR)), 1, 8)) AS UBIGINT)
                    % 2001 AS BIGINT) - 1000 AS w
        FROM feats
    ),
    per_doc AS (
        SELECT doc_id, count(*) AS n_feats,
               CAST(sum(w) AS BIGINT) AS w_sum
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_feats, w_sum,
           round_even(CAST(w_sum AS DOUBLE) / (1000.0 * n_feats), 6)
               AS logit,
           CAST(CASE WHEN w_sum >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM per_doc
"""


ORACLE_SQL["truncation_loss"] = r"""
    WITH t AS (
        SELECT lang,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
        FROM documents
    ),
    c AS (SELECT unnest([64, 128, 256, 512]) AS ctx_len)
    SELECT lang, CAST(ctx_len AS BIGINT) AS ctx_len,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN n_tok > ctx_len THEN 1 ELSE 0 END)
                AS BIGINT) AS n_truncated,
           CAST(sum(greatest(n_tok - ctx_len, 0)) AS BIGINT)
               AS tokens_lost,
           CAST(sum(n_tok) AS BIGINT) AS tokens_total,
           round_even(CAST(sum(greatest(n_tok - ctx_len, 0)) AS DOUBLE)
                      / CAST(sum(n_tok) AS BIGINT), 6) AS loss_frac
    FROM t CROSS JOIN c
    GROUP BY lang, ctx_len
"""


# bigram stupid-backoff LM (Brants et al. 2007), trained on the
# even-doc_id half and scored corpus-wide; CASE arms mirror
# cleaning._backoff_nll term for term (1/T unseen floor, 0.4 discount)
ORACLE_SQL["lm_perplexity_bigram"] = _TOKS_CTE + r""",
    seq AS (
        SELECT doc_id, ord, tok,
               lag(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS prev
        FROM toks
    ),
    uni AS (
        SELECT tok, count(*) AS c FROM toks
        WHERE doc_id % 2 = 0 GROUP BY tok
    ),
    big AS (
        SELECT prev AS p, tok AS w, count(*) AS c
        FROM seq WHERE doc_id % 2 = 0 AND prev IS NOT NULL
        GROUP BY prev, tok
    ),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS s FROM uni),
    per AS (
        SELECT s.doc_id,
               CASE
                 WHEN s.prev IS NULL THEN
                   -log2(CASE WHEN uc.c IS NULL
                              THEN 1.0 / (SELECT s FROM tot)
                              ELSE CAST(uc.c AS DOUBLE)
                                   / (SELECT s FROM tot) END)
                 WHEN bc.c IS NOT NULL THEN
                   -log2(CAST(bc.c AS DOUBLE) / pc2.c)
                 ELSE
                   -log2(0.4 * CASE WHEN uc.c IS NULL
                                    THEN 1.0 / (SELECT s FROM tot)
                                    ELSE CAST(uc.c AS DOUBLE)
                                         / (SELECT s FROM tot) END)
               END AS nll
        FROM seq s
        LEFT JOIN uni uc ON uc.tok = s.tok
        LEFT JOIN big bc ON bc.p = s.prev AND bc.w = s.tok
        LEFT JOIN uni pc2 ON pc2.tok = s.prev
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round_even(avg(nll), 6) AS cross_entropy,
           round_even(pow(2.0, avg(nll)), 6) AS perplexity
    FROM per GROUP BY doc_id
"""


# two-sample KS per source vs rest: integer ECDF numerators (cum·n_rest
# − cum_rest·n_src), one double division at the end — exact both sides
ORACLE_SQL["source_drift_ks"] = r"""
    WITH c AS (
        SELECT source, n_chars, count(*) AS c
        FROM documents GROUP BY 1, 2
    ),
    grid AS (
        SELECT s.source, v.n_chars
        FROM (SELECT DISTINCT source FROM documents) s
        CROSS JOIN (SELECT DISTINCT n_chars FROM documents) v
    ),
    f AS (
        SELECT g.source, g.n_chars, coalesce(c.c, 0) AS c
        FROM grid g LEFT JOIN c USING (source, n_chars)
    ),
    cum AS (
        SELECT source, n_chars,
               sum(c) OVER (PARTITION BY source ORDER BY n_chars) AS cs
        FROM f
    ),
    tot AS (SELECT source, sum(c) AS ns FROM c GROUP BY source),
    alln AS (SELECT sum(c) AS na FROM c),
    cumall AS (
        SELECT n_chars, sum(c) OVER (ORDER BY n_chars) AS ca
        FROM (SELECT n_chars, sum(c) AS c FROM c GROUP BY n_chars)
    ),
    ks AS (
        SELECT cum.source, t.ns,
               max(abs(cum.cs * ((SELECT na FROM alln) - t.ns)
                       - (ca.ca - cum.cs) * t.ns)) AS num
        FROM cum
        JOIN tot t USING (source)
        JOIN cumall ca USING (n_chars)
        GROUP BY cum.source, t.ns
    )
    SELECT source,
           CAST(ns AS BIGINT) AS n_source,
           CAST((SELECT na FROM alln) - ns AS BIGINT) AS n_rest,
           round_even(CAST(num AS DOUBLE)
                      / (ns * ((SELECT na FROM alln) - ns)), 6) AS ks_stat
    FROM ks
"""


# Cohen's κ between the Gopher gate and the hashed classifier: both
# raters rebuilt from their own oracle fragments, integer contingency,
# algebraically-cleared single divisions (see cleaning.filter_agreement_kappa)
ORACLE_SQL["filter_agreement_kappa"] = r"""
    WITH g AS (
        SELECT doc_id,
               CAST(n_words BETWEEN 20 AND 80
                    AND round_even(CAST(n_chars_ns AS DOUBLE) / n_words, 4)
                        BETWEEN 3.0 AND 10.0
                    AND stop_hits >= 2 AS BIGINT) AS kg
        FROM (
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text, ' '), '\s+'))
                        AS BIGINT) AS n_words,
                   length(regexp_replace(text, '\s', '', 'g'))
                       AS n_chars_ns,
                   CAST(regexp_matches(text, '\bthe\b') AS BIGINT)
                   + CAST(regexp_matches(text, '\bscan\b') AS BIGINT)
                   + CAST(regexp_matches(text, '\bjoin\b') AS BIGINT)
                   + CAST(regexp_matches(text, '\bmerge\b') AS BIGINT)
                   + CAST(regexp_matches(text, '\bwindow\b') AS BIGINT)
                       AS stop_hits
            FROM documents
        )
    ),
    base AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
        FROM documents
    ),
    feats AS (
        SELECT doc_id, unnest(a) AS tok FROM base
        UNION ALL
        SELECT doc_id, a[i] || ' ' || a[i + 1] AS tok
        FROM (SELECT doc_id, a,
                     unnest(generate_series(1, len(a) - 1)) AS i
              FROM base WHERE len(a) >= 2)
    ),
    q AS (
        SELECT doc_id,
               CAST(CASE WHEN sum(
                   CAST(CAST(('0x' || substr(md5('w-' || CAST(
                        CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT)
                        % 1024 AS VARCHAR)), 1, 8)) AS UBIGINT)
                        % 2001 AS BIGINT) - 1000) >= 0
                    THEN 1 ELSE 0 END AS BIGINT) AS kc
        FROM feats GROUP BY doc_id
    ),
    cont AS (
        SELECT
            CAST(sum(CASE WHEN kg = 1 AND kc = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n11,
            CAST(sum(CASE WHEN kg = 1 AND kc = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n10,
            CAST(sum(CASE WHEN kg = 0 AND kc = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n01,
            CAST(sum(CASE WHEN kg = 0 AND kc = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n00
        FROM g JOIN q USING (doc_id)
    )
    SELECT n11, n10, n01, n00,
           round_even(CAST(n11 + n00 AS DOUBLE)
                      / (n11 + n10 + n01 + n00), 6) AS po,
           round_even(CAST((n11 + n10) * (n11 + n01)
                           + (n01 + n00) * (n10 + n00) AS DOUBLE)
                      / ((n11 + n10 + n01 + n00)
                         * (n11 + n10 + n01 + n00)), 6) AS pe,
           CASE WHEN (n11 + n10 + n01 + n00) * (n11 + n10 + n01 + n00)
                     - ((n11 + n10) * (n11 + n01)
                        + (n01 + n00) * (n10 + n00)) = 0
                THEN 0.0
                ELSE round_even(
                    CAST((n11 + n10 + n01 + n00) * (n11 + n00)
                         - ((n11 + n10) * (n11 + n01)
                            + (n01 + n00) * (n10 + n00)) AS DOUBLE)
                    / ((n11 + n10 + n01 + n00)
                       * (n11 + n10 + n01 + n00)
                       - ((n11 + n10) * (n11 + n01)
                          + (n01 + n00) * (n10 + n00))), 6)
           END AS kappa
    FROM cont
"""


# subsampling CI: identical md5 membership coin, replicate means as
# single int/int divisions, band = 2nd smallest / 2nd largest
ORACLE_SQL["subsample_ci_mean"] = """
    WITH r AS (SELECT unnest(generate_series(0, 63)) AS b),
    m AS (
        SELECT r.b, CAST(sum(d.n_chars) AS BIGINT) AS s, count(*) AS c
        FROM documents d CROSS JOIN r
        WHERE CAST(('0x' || substr(md5(
                  CAST(d.doc_id AS VARCHAR) || '-'
                  || CAST(r.b AS VARCHAR)), 1, 8)) AS UBIGINT) % 2 = 0
        GROUP BY r.b
    ),
    means AS (SELECT b, CAST(s AS DOUBLE) / c AS mu FROM m),
    ranked AS (
        SELECT mu, row_number() OVER (ORDER BY mu, b) AS rk FROM means
    )
    SELECT (SELECT count(*) FROM documents) AS n_docs,
           round_even((SELECT CAST(sum(n_chars) AS DOUBLE) / count(*)
                       FROM documents), 6) AS mean_full,
           (SELECT count(*) FROM means) AS n_reps,
           round_even((SELECT mu FROM ranked WHERE rk = 2), 6) AS ci_lo,
           round_even((SELECT mu FROM ranked
                       WHERE rk = (SELECT count(*) FROM means) - 1), 6)
               AS ci_hi
"""


# delete propagation: requests (doc_id % 97 = 0) plus every cluster-mate
# in the SAME component walk the near-dup family shares (_NDC_CTE)
ORACLE_SQL["forget_propagation"] = _NDC_CTE + """,
    clus AS (SELECT s AS doc_id, min(l) AS cid FROM walk GROUP BY s),
    affected AS (
        SELECT DISTINCT cid FROM clus WHERE doc_id % 97 = 0
    )
    SELECT doc_id, 'direct' AS reason FROM documents
    WHERE doc_id % 97 = 0
    UNION ALL
    SELECT c.doc_id, 'clone' AS reason
    FROM clus c JOIN affected a USING (cid)
    WHERE c.doc_id % 97 <> 0
"""


# information gain of lang/source on the Gopher keep label: integer
# counts, log2 drift absorbed by the 6dp grid (lm_perplexity argument)
ORACLE_SQL["feature_information_gain"] = r"""
    WITH lab AS (
        SELECT lang, source,
               CAST(n_words BETWEEN 20 AND 80
                    AND round_even(CAST(n_chars_ns AS DOUBLE) / n_words, 4)
                        BETWEEN 3.0 AND 10.0
                    AND stop_hits >= 2 AS BIGINT) AS kg
        FROM (
            SELECT lang, source,
                   CAST(len(regexp_split_to_array(trim(text, ' '), '\s+'))
                        AS BIGINT) AS n_words,
                   length(regexp_replace(text, '\s', '', 'g'))
                       AS n_chars_ns,
                   CAST(regexp_matches(text, '\bthe\b') AS BIGINT)
                   + CAST(regexp_matches(text, '\bscan\b') AS BIGINT)
                   + CAST(regexp_matches(text, '\bjoin\b') AS BIGINT)
                   + CAST(regexp_matches(text, '\bmerge\b') AS BIGINT)
                   + CAST(regexp_matches(text, '\bwindow\b') AS BIGINT)
                       AS stop_hits
            FROM documents
        )
    ),
    c AS (
        SELECT 'lang' AS feature, lang AS val, kg, count(*) AS n
        FROM lab GROUP BY 1, 2, 3
        UNION ALL
        SELECT 'source', source, kg, count(*) FROM lab GROUP BY 1, 2, 3
    ),
    v AS (SELECT feature, val, sum(n) AS nv FROM c GROUP BY 1, 2),
    hv AS (
        SELECT c.feature, c.val, any_value(v.nv) AS nv,
               -sum((CAST(c.n AS DOUBLE) / v.nv)
                    * log2(CAST(c.n AS DOUBLE) / v.nv)) AS h
        FROM c JOIN v USING (feature, val)
        GROUP BY c.feature, c.val
    ),
    tot AS (SELECT count(*) AS n FROM lab),
    marg AS (SELECT kg, count(*) AS n FROM lab GROUP BY kg),
    hk AS (
        SELECT -sum((CAST(n AS DOUBLE) / (SELECT n FROM tot))
                    * log2(CAST(n AS DOUBLE) / (SELECT n FROM tot))) AS h
        FROM marg
    )
    SELECT feature,
           CAST(count(*) AS BIGINT) AS n_values,
           round_even((SELECT h FROM hk), 6) AS h_label,
           round_even((SELECT h FROM hk)
                      - sum((CAST(nv AS DOUBLE) / (SELECT n FROM tot))
                            * h), 6) AS info_gain
    FROM hv GROUP BY feature
"""


def _rrf_sql() -> str:
    """RRF over the exact-cosine and SQ8 top-k rankings: both rankings
    re-derived on ROUNDED sims with vec_id tiebreaks (rank order is
    FP-drift-proof), fixed two-term score sum (exact term first), 0
    for a missing rank."""
    from ..stages.knn import KNN_K, KNN_QUERY, RRF_K0

    return f"""
    WITH ex AS (
        SELECT vec_id,
               round_even(list_cosine_similarity(
                   CAST(embedding AS DOUBLE[]), {KNN_QUERY!r}), 6) AS sim
        FROM embeddings
    ),
    exr AS (
        SELECT vec_id,
               row_number() OVER (ORDER BY sim DESC, vec_id) AS r
        FROM ex QUALIFY r <= {KNN_K}
    ),
    vals AS (
        SELECT vec_id,
               unnest(CAST(embedding AS DOUBLE[])) AS v,
               generate_subscripts(embedding, 1) AS d
        FROM embeddings
    ),
    dims AS (SELECT d, min(v) AS mn, max(v) AS mx FROM vals GROUP BY d),
    deq AS (
        SELECT vec_id,
               CASE WHEN mx = mn THEN mn
                    ELSE mn + (least(255.0, greatest(0.0,
                         floor((v - mn) / (mx - mn) * 255.0))) + 0.5)
                         * (mx - mn) / 256.0 END AS xv
        FROM vals JOIN dims USING (d)
    ),
    sq AS (
        SELECT vec_id,
               round_even(0.125 * sum(xv) / sqrt(sum(xv * xv)), 6)
                   AS sim_sq
        FROM deq GROUP BY vec_id
    ),
    sqr AS (
        SELECT vec_id,
               row_number() OVER (ORDER BY sim_sq DESC, vec_id) AS r
        FROM sq QUALIFY r <= {KNN_K}
    ),
    u AS (
        SELECT vec_id, e.r AS ra, s.r AS rb
        FROM exr e FULL JOIN sqr s USING (vec_id)
    ),
    sel AS (
        SELECT vec_id,
               CAST(coalesce(ra, 0) AS BIGINT) AS rank_exact,
               CAST(coalesce(rb, 0) AS BIGINT) AS rank_sq,
               round_even(coalesce(1.0 / ({RRF_K0} + ra), 0.0)
                          + coalesce(1.0 / ({RRF_K0} + rb), 0.0), 6)
                   AS rrf_score
        FROM u
    )
    SELECT row_number() OVER (ORDER BY rrf_score DESC, vec_id)
               AS fused_rank,
           vec_id, rank_exact, rank_sq, rrf_score
    FROM sel
"""


ORACLE_SQL["rrf_fusion"] = _rrf_sql()


def _token_count_min_sql() -> str:
    """Full Count-Min replica: the lattice is rebuilt over ALL tokens
    (linearity means collisions from any token matter), row hashes are
    disjoint 8-hex md5 slices exactly as in ``stages/sketches.py``,
    and the estimate is the min over rows — all integer arithmetic, so
    the hash match is exact by construction."""
    from ..stages.sketches import CMS_D, CMS_TOPK, CMS_W

    rows = ", ".join(str(d) for d in range(CMS_D))
    return f"""
    WITH cnt AS (
        SELECT tok, count(*) AS n
        FROM documents,
             UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t(tok)
        GROUP BY tok
    ),
    lattice AS (
        SELECT d,
               CAST(('0x' || substr(md5(tok), 1 + 8 * d, 8)) AS UBIGINT)
                   % {CMS_W} AS b,
               sum(n) AS c
        FROM cnt, UNNEST([{rows}]) AS r(d)
        GROUP BY d, b
    ),
    top AS (SELECT tok, n FROM cnt ORDER BY n DESC, tok LIMIT {CMS_TOPK}),
    tb AS (
        SELECT tok, n, d,
               CAST(('0x' || substr(md5(tok), 1 + 8 * d, 8)) AS UBIGINT)
                   % {CMS_W} AS b
        FROM top, UNNEST([{rows}]) AS r(d)
    )
    SELECT tb.tok AS token,
           CAST(any_value(tb.n) AS BIGINT) AS n_exact,
           CAST(min(l.c) AS BIGINT) AS n_cms,
           CAST(min(l.c) - any_value(tb.n) AS BIGINT) AS overcount
    FROM tb JOIN lattice l ON l.d = tb.d AND l.b = tb.b
    GROUP BY tb.tok
"""


ORACLE_SQL["token_count_min"] = _token_count_min_sql()


ORACLE_SQL["dedup_inflation_by_source"] = r"""
    WITH g AS (
        SELECT doc_id, source, lang, n_chars,
               min(doc_id) OVER (PARTITION BY md5(text)) AS winner
        FROM documents
    )
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE doc_id = winner) AS BIGINT)
               AS n_kept,
           CAST(count(*) FILTER (WHERE doc_id <> winner) AS BIGINT)
               AS n_dropped,
           CAST(sum(n_chars) AS BIGINT) AS chars_total,
           CAST(coalesce(sum(n_chars) FILTER (WHERE doc_id <> winner), 0)
                AS BIGINT) AS chars_dropped,
           round_even(CAST(count(*) FILTER (WHERE doc_id <> winner)
                           AS DOUBLE) / count(*), 6) AS dup_ratio
    FROM g GROUP BY source, lang
"""


# reliability diagram of the hashed-linear classifier vs the Gopher
# label: the per_doc CTE replicates cleaning._qc_frame, lab replicates
# _gopher_table, bin assignment is pure integer arithmetic
ORACLE_SQL["classifier_reliability_bins"] = r"""
    WITH base AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
        FROM documents
    ),
    uni AS (SELECT doc_id, unnest(a) AS tok FROM base),
    big AS (
        SELECT doc_id, a[i] || ' ' || a[i + 1] AS tok
        FROM (SELECT doc_id, a,
                     unnest(generate_series(1, len(a) - 1)) AS i
              FROM base WHERE len(a) >= 2)
    ),
    feats AS (
        SELECT doc_id, tok FROM uni
        UNION ALL
        SELECT doc_id, tok FROM big
    ),
    scored AS (
        SELECT doc_id,
               CAST(CAST(('0x' || substr(md5('w-' || CAST(
                        CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT)
                        % 1024 AS VARCHAR)), 1, 8)) AS UBIGINT)
                    % 2001 AS BIGINT) - 1000 AS w
        FROM feats
    ),
    per_doc AS (
        SELECT doc_id, count(*) AS n_feats,
               CAST(sum(w) AS BIGINT) AS w_sum
        FROM scored GROUP BY doc_id
    ),
    lab AS (
        SELECT doc_id,
               CAST(n_words BETWEEN 20 AND 80
                    AND round_even(CAST(n_chars_ns AS DOUBLE) / n_words, 4)
                        BETWEEN 3.0 AND 10.0
                    AND stop_hits >= 2 AS BIGINT) AS kg
        FROM (
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text, ' '), '\s+'))
                        AS BIGINT) AS n_words,
                   length(regexp_replace(text, '\s', '', 'g'))
                       AS n_chars_ns,
                   CAST(regexp_matches(text, '\bthe\b') AS BIGINT)
                   + CAST(regexp_matches(text, '\bscan\b') AS BIGINT)
                   + CAST(regexp_matches(text, '\bjoin\b') AS BIGINT)
                   + CAST(regexp_matches(text, '\bmerge\b') AS BIGINT)
                   + CAST(regexp_matches(text, '\bwindow\b') AS BIGINT)
                       AS stop_hits
            FROM documents
        )
    ),
    j AS (
        SELECT least(9, (5 * p.w_sum + 5000 * p.n_feats)
                        // (1000 * p.n_feats)) AS bin,
               CASE WHEN p.w_sum >= 0 THEN 1 ELSE 0 END AS pk,
               l.kg, p.w_sum
        FROM per_doc p JOIN lab l USING (doc_id)
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(pk) AS BIGINT) AS n_pred_keep,
           CAST(sum(kg) AS BIGINT) AS n_pos,
           CAST(sum(w_sum) AS BIGINT) AS w_sum_total,
           round_even(CAST(sum(kg) AS DOUBLE) / count(*), 6) AS pos_rate
    FROM j GROUP BY bin
"""


ORACLE_SQL["k_anonymity_census"] = """
    WITH qi AS (
        SELECT lang, source, n_chars // 256 AS band, count(*) AS k
        FROM documents GROUP BY lang, source, band
    )
    SELECT CAST(k AS BIGINT) AS class_size,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(k * count(*) AS BIGINT) AS n_docs
    FROM qi GROUP BY k
"""


def _split_contamination_sql() -> str:
    """Split rule = dataset_split_assign's md5 arithmetic; shingles =
    distinct per-doc DECON_NGRAM-gram strings (same join semantics as
    the Ray bucket pass)."""
    from ..pipelines.corpus_ops import DECON_NGRAM, SPLIT_EDGES

    terms = " || ' ' || ".join(f"a[i + {j}]" for j in range(DECON_NGRAM))
    return f"""
    WITH h AS (
        SELECT doc_id, text,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) % 100 AS b
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               CASE WHEN b < {SPLIT_EDGES[0]} THEN 'train'
                    WHEN b < {SPLIT_EDGES[1]} THEN 'val'
                    ELSE 'test' END AS split,
               text
        FROM h
    ),
    toks AS (
        SELECT doc_id, split,
               regexp_split_to_array(trim(text), '\\s+') AS a
        FROM s
    ),
    sh AS (
        SELECT DISTINCT doc_id, split, {terms} AS g
        FROM (SELECT doc_id, split, a,
                     unnest(generate_series(1, len(a) - {DECON_NGRAM} + 1))
                         AS i
              FROM toks WHERE len(a) >= {DECON_NGRAM})
    ),
    tr AS (SELECT DISTINCT g FROM sh WHERE split = 'train'),
    hits AS (
        SELECT sh.doc_id, sh.split, count(*) AS n_hit
        FROM sh JOIN tr USING (g) WHERE sh.split <> 'train'
        GROUP BY sh.doc_id, sh.split
    ),
    per_split AS (
        SELECT split, count(*) AS n_contaminated,
               sum(n_hit) AS shingle_hits
        FROM hits GROUP BY split
    ),
    census AS (
        SELECT split, count(*) AS n_docs FROM s
        WHERE split <> 'train' GROUP BY split
    )
    SELECT c.split, CAST(c.n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(p.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           CAST(coalesce(p.shingle_hits, 0) AS BIGINT) AS shingle_hits,
           round_even(CAST(coalesce(p.n_contaminated, 0) AS DOUBLE)
                      / c.n_docs, 6) AS contamination_rate
    FROM census c LEFT JOIN per_split p USING (split)
"""


ORACLE_SQL["split_contamination_audit"] = _split_contamination_sql()


# pairwise audience overlap: per-user bitmask (sum of DISTINCT powers
# == bitwise OR), pairwise counts read off the mask column — the same
# census-not-self-join shape as the Ray side
ORACLE_SQL["event_type_user_overlap"] = """
    WITH t AS (
        SELECT event_type,
               dense_rank() OVER (ORDER BY event_type) - 1 AS idx
        FROM (SELECT DISTINCT event_type FROM events)
    ),
    m AS (
        SELECT e.user_id,
               CAST(sum(DISTINCT (1 << t.idx)) AS BIGINT) AS mask
        FROM events e JOIN t USING (event_type)
        GROUP BY e.user_id
    ),
    pairs AS (
        SELECT a.event_type AS type_a, a.idx AS ia,
               b.event_type AS type_b, b.idx AS ib
        FROM t a JOIN t b ON a.event_type < b.event_type
    ),
    agg AS (
        SELECT p.type_a, p.type_b,
               CAST(count(*) FILTER (WHERE (m.mask >> p.ia) & 1 = 1)
                    AS BIGINT) AS n_a,
               CAST(count(*) FILTER (WHERE (m.mask >> p.ib) & 1 = 1)
                    AS BIGINT) AS n_b,
               CAST(count(*) FILTER (WHERE (m.mask >> p.ia) & 1 = 1
                                       AND (m.mask >> p.ib) & 1 = 1)
                    AS BIGINT) AS n_both
        FROM pairs p CROSS JOIN m
        GROUP BY p.type_a, p.type_b
    )
    SELECT type_a, type_b, n_a, n_b, n_both,
           n_a + n_b - n_both AS n_union,
           round_even(CAST(n_both AS DOUBLE) / (n_a + n_b - n_both), 6)
               AS jaccard
    FROM agg
"""


# Pearson between ce-cents and the integer quality score: census form,
# exact HUGEINT moments, ONE double division + sqrt at the end ordered
# identically to the Python driver arithmetic
ORACLE_SQL["quality_perplexity_corr"] = _TOKS_CTE + r""",
    cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS s FROM cnt),
    per AS (
        SELECT t.doc_id,
               -log2(CAST(c.c AS DOUBLE) / (SELECT s FROM tot)) AS nll
        FROM toks t JOIN cnt c ON t.tok = c.tok
    ),
    x AS (
        SELECT doc_id,
               CAST(round_even(round_even(avg(nll), 6) * 100, 0)
                    AS BIGINT) AS cents
        FROM per GROUP BY doc_id
    ),
    y AS (
        SELECT doc_id,
               (100 * count(*) FILTER (WHERE len(tok) BETWEEN 3 AND 12))
                   // count(*) AS score
        FROM toks GROUP BY doc_id
    ),
    cells AS (
        SELECT cents, score, count(*) AS n
        FROM x JOIN y USING (doc_id) GROUP BY cents, score
    ),
    s AS (
        SELECT sum(n) AS n, count(*) AS n_cells,
               sum(n * cents) AS sx, sum(n * score) AS sy,
               sum(n * cents * score) AS sxy,
               sum(n * cents * cents) AS sxx,
               sum(n * score * score) AS syy
        FROM cells
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(n_cells AS BIGINT) AS n_cells,
           round_even(
               CASE WHEN (n * sxx - sx * sx) = 0
                      OR (n * syy - sy * sy) = 0 THEN 0.0
                    ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                         / sqrt(CAST((n * sxx - sx * sx)
                                     * (n * syy - sy * sy) AS DOUBLE))
               END, 6) AS r_pearson
    FROM s
"""


def _vocab_coverage_sql() -> str:
    from .corpus_ops import COVERAGE_NS

    ns = ", ".join(str(n) for n in COVERAGE_NS)
    return f"""
    WITH cnt AS (
        SELECT tok, count(*) AS n
        FROM documents,
             UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t(tok)
        GROUP BY tok
    ),
    r AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rk
        FROM cnt
    ),
    tot AS (SELECT sum(n) AS t, count(*) AS v FROM cnt),
    ns AS (SELECT unnest([{ns}]) AS top_n)
    SELECT CAST(ns.top_n AS BIGINT) AS top_n,
           CAST(least(ns.top_n, (SELECT v FROM tot)) AS BIGINT)
               AS vocab_size,
           CAST(coalesce(sum(r.n), 0) AS BIGINT) AS covered,
           CAST((SELECT t FROM tot) AS BIGINT) AS total,
           round_even(CAST(coalesce(sum(r.n), 0) AS DOUBLE)
                      / (SELECT t FROM tot), 6) AS coverage
    FROM ns LEFT JOIN r ON r.rk <= ns.top_n
    GROUP BY ns.top_n
"""


ORACLE_SQL["vocab_coverage_curve"] = _vocab_coverage_sql()


ORACLE_SQL["incremental_dedup_ingest"] = """
    WITH d AS (
        SELECT doc_id, md5(text) AS fp,
               doc_id % 10 = 9 AS is_new
        FROM documents
    ),
    g AS (
        SELECT doc_id, is_new,
               bool_or(NOT is_new) OVER (PARTITION BY fp) AS has_old,
               min(CASE WHEN is_new THEN doc_id END)
                   OVER (PARTITION BY fp) AS first_new
        FROM d
    )
    SELECT doc_id,
           CASE WHEN has_old THEN 'dup_old'
                WHEN doc_id = first_new THEN 'ingest'
                ELSE 'dup_new' END AS verdict
    FROM g WHERE is_new
"""


ORACLE_SQL["shard_skew_report"] = """
    WITH u AS (
        SELECT 'doc_id' AS part_key,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) % 32 AS shard
        FROM documents
        UNION ALL
        SELECT 'lang',
               CAST(('0x' || substr(md5(lang), 1, 8)) AS UBIGINT) % 32
        FROM documents
        UNION ALL
        SELECT 'source',
               CAST(('0x' || substr(md5(source), 1, 8)) AS UBIGINT) % 32
        FROM documents
    ),
    c AS (SELECT part_key, shard, count(*) AS n FROM u GROUP BY 1, 2)
    SELECT part_key,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS shards_used,
           CAST(max(n) AS BIGINT) AS max_shard_rows,
           round_even(CAST(max(n) AS DOUBLE) * 32 / sum(n), 6) AS skew
    FROM c GROUP BY part_key
"""


def _cluster_purity_sql() -> str:
    """Majority-label share per Lloyd cluster over the shared k-means
    CTE chain (ties break to the smaller label, as in the Ray driver
    sweep)."""
    return _kmeans_cte() + """,
    lab AS (
        SELECT a2.cluster, e.label
        FROM a2 JOIN embeddings e USING (vec_id)
    ),
    c AS (SELECT cluster, label, count(*) AS n FROM lab GROUP BY 1, 2),
    r AS (
        SELECT cluster, label, n,
               row_number() OVER (PARTITION BY cluster
                                  ORDER BY n DESC, label) AS rk,
               sum(n) OVER (PARTITION BY cluster) AS tot,
               count(*) OVER (PARTITION BY cluster) AS nl
        FROM c
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           CAST(tot AS BIGINT) AS n_vecs,
           CAST(nl AS BIGINT) AS n_labels,
           CAST(label AS BIGINT) AS top_label,
           CAST(n AS BIGINT) AS n_top,
           round_even(CAST(n AS DOUBLE) / tot, 6) AS purity
    FROM r WHERE rk = 1
"""


ORACLE_SQL["cluster_label_purity"] = _cluster_purity_sql()


def _clustering_ari_sql() -> str:
    """Cleared integer-rational ARI over the shared k-means CTE chain
    + label contingency census; HUGEINT-exact until the one division."""
    return _kmeans_cte() + """,
    lab AS (
        SELECT a2.cluster, e.label
        FROM a2 JOIN embeddings e USING (vec_id)
    ),
    c AS (SELECT cluster, label, count(*) AS n FROM lab GROUP BY 1, 2),
    sums AS (
        SELECT sum(n) AS n_vecs, sum(n * (n - 1)) AS sij FROM c
    ),
    ra AS (
        SELECT sum(a * (a - 1)) AS sa
        FROM (SELECT sum(n) AS a FROM c GROUP BY cluster)
    ),
    cb AS (
        SELECT sum(b * (b - 1)) AS sb
        FROM (SELECT sum(n) AS b FROM c GROUP BY label)
    ),
    f AS (
        SELECT n_vecs, sij, sa, sb, n_vecs * (n_vecs - 1) AS n2
        FROM sums, ra, cb
    )
    SELECT CAST(n_vecs AS BIGINT) AS n_vecs,
           CAST(sij // 2 AS BIGINT) AS sum_pairs_cells,
           CAST(sa // 2 AS BIGINT) AS sum_pairs_rows,
           CAST(sb // 2 AS BIGINT) AS sum_pairs_cols,
           round_even(
               CASE WHEN n2 * (sa + sb) // 2 - sa * sb = 0 THEN 0.0
                    ELSE CAST(n2 * sij - sa * sb AS DOUBLE)
                         / CAST(n2 * (sa + sb) // 2 - sa * sb AS DOUBLE)
               END, 6) AS ari
    FROM f
"""


ORACLE_SQL["clustering_ari"] = _clustering_ari_sql()


def _bloom_cal_sql() -> str:
    """Full Bloom rebuild: md5 top/bottom-half lanes, Kirsch-
    Mitzenmacher double hashing with numpy's mod-2^64 wraparound
    replicated in HUGEINT, membership = all K probe positions present
    in the benchmark bit set."""
    from ..pipelines.corpus_ops import BENCH_MAX_DOC_ID, DECON_NGRAM
    from ..stages.bloom import BLOOM_CAL_K, BLOOM_CAL_M

    terms = " || ' ' || ".join(f"a[i + {j}]" for j in range(DECON_NGRAM))
    return f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS a
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id, {terms} AS g
        FROM (SELECT doc_id, a,
                     unnest(generate_series(1, len(a) - {DECON_NGRAM} + 1))
                         AS i
              FROM toks WHERE len(a) >= {DECON_NGRAM})
    ),
    bench AS (SELECT DISTINCT g FROM grams
              WHERE doc_id < {BENCH_MAX_DOC_ID}),
    probes AS (SELECT DISTINCT g FROM grams),
    h AS (
        SELECT g,
               CAST(('0x' || substr(md5(g), 1, 16)) AS UBIGINT) AS h1,
               CAST(('0x' || substr(md5(g), 17, 16)) AS UBIGINT) | 1 AS h2
        FROM probes
    ),
    pos AS (
        SELECT g,
               CAST(((CAST(h1 AS HUGEINT)
                      + i.i * CAST(h2 AS HUGEINT))
                     % 18446744073709551616) % {BLOOM_CAL_M} AS BIGINT)
                   AS p
        FROM h, (SELECT unnest(generate_series(0, {BLOOM_CAL_K - 1}))
                     AS i) i
    ),
    bits AS (
        SELECT DISTINCT p.p FROM pos p JOIN bench b USING (g)
    ),
    ph AS (
        SELECT pos.g,
               count(DISTINCT pos.p) AS np,
               count(DISTINCT bits.p) AS nm
        FROM pos LEFT JOIN bits ON pos.p = bits.p
        GROUP BY pos.g
    ),
    v AS (
        SELECT ph.g, (ph.nm = ph.np) AS bloom_pos,
               (b.g IS NOT NULL) AS true_pos
        FROM ph LEFT JOIN bench b USING (g)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(count(*) FILTER (WHERE true_pos) AS BIGINT) AS n_true_pos,
           CAST(count(*) FILTER (WHERE bloom_pos) AS BIGINT)
               AS n_bloom_pos,
           CAST(count(*) FILTER (WHERE bloom_pos AND NOT true_pos)
                AS BIGINT) AS n_false_pos,
           round_even(CASE
               WHEN count(*) - count(*) FILTER (WHERE true_pos) = 0
                   THEN 0.0
               ELSE CAST(count(*) FILTER (WHERE bloom_pos
                                            AND NOT true_pos) AS DOUBLE)
                    / (count(*) - count(*) FILTER (WHERE true_pos))
           END, 6) AS fp_rate
    FROM v
"""


ORACLE_SQL["bloom_fp_calibration"] = _bloom_cal_sql()


# confusion census of the stopword-profile classifier vs the true lang
# column — the pred CTE is the language_id oracle verbatim
ORACLE_SQL["langid_confusion"] = f"""
    WITH pred AS ({ORACLE_SQL["language_id"]})
    SELECT d.lang AS lang_true, p.lang_pred,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY 1, 2
"""


ORACLE_SQL["theil_sen_slope"] = """
    WITH p AS (
        SELECT p_brand, p_partkey, p_size, p_retailprice FROM part
    ),
    pr AS (
        SELECT a.p_brand,
               (b.p_retailprice - a.p_retailprice)
                   / (b.p_size - a.p_size) AS slope
        FROM p a JOIN p b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        WHERE a.p_size <> b.p_size
    ),
    c AS (SELECT p_brand, count(*) AS n_parts FROM p GROUP BY 1)
    SELECT c.p_brand,
           CAST(c.n_parts AS BIGINT) AS n_parts,
           CAST(count(pr.slope) AS BIGINT) AS n_pairs,
           round_even(median(pr.slope), 6) AS theil_slope
    FROM c LEFT JOIN pr USING (p_brand)
    GROUP BY c.p_brand, c.n_parts
"""


ORACLE_SQL["daily_volume_cusum"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    o AS (
        SELECT day, n,
               sum(n) OVER (ORDER BY day) AS cum,
               row_number() OVER (ORDER BY day) AS rk,
               (SELECT count(*) FROM d) AS dd,
               (SELECT sum(n) FROM d) AS nn
        FROM d
    )
    SELECT day,
           CAST(n AS BIGINT) AS n_events,
           CAST(cum AS BIGINT) AS cum_events,
           CAST(abs(dd * cum - rk * nn) AS BIGINT) AS cusum_stat,
           round_even(CAST(abs(dd * cum - rk * nn) AS DOUBLE)
                      / (dd * nn), 6) AS norm_stat
    FROM o
"""


ORACLE_SQL["curriculum_stage_assign"] = r"""
    WITH s AS (
        SELECT doc_id,
               (100 * count(*) FILTER (WHERE len(tok) BETWEEN 3 AND 12))
                   // count(*) AS score
        FROM documents,
             UNNEST(regexp_split_to_array(trim(text), '\s+')) AS t(tok)
        GROUP BY doc_id
    ),
    r AS (
        SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rn,
               count(*) OVER () AS n
        FROM s
    )
    SELECT doc_id, CAST(score AS BIGINT) AS score,
           CAST(((rn - 1) * 4) // n AS BIGINT) AS stage
    FROM r
"""


ORACLE_SQL["token_ttr_by_source"] = r"""
    WITH toks AS (
        SELECT source,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    c AS (SELECT source, tok, count(*) AS n FROM toks GROUP BY 1, 2)
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           round_even(CAST(count(*) AS DOUBLE) / sum(n), 6) AS ttr
    FROM c GROUP BY source
"""


def _pack_efficiency_sql() -> str:
    """Padding-efficiency summary composed over the pack_sequences
    replica (a sequence is identified by its unique offset-0 member)."""
    from .corpus_ops import PACK_CAP

    return f"""
    WITH packed AS ({ORACLE_SQL["pack_sequences"]})
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE seq_offset = 0) AS BIGINT)
               AS n_seqs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
           CAST(count(*) FILTER (WHERE seq_offset = 0) * {PACK_CAP}
                AS BIGINT) AS capacity_total,
           CAST(count(*) FILTER (WHERE n_tokens > {PACK_CAP}) AS BIGINT)
               AS n_oversized,
           round_even(CAST(sum(n_tokens) AS DOUBLE)
                      / (count(*) FILTER (WHERE seq_offset = 0)
                         * {PACK_CAP}), 6) AS fill_rate
    FROM packed
"""


ORACLE_SQL["pack_efficiency_report"] = _pack_efficiency_sql()


def _embedding_outlier_sql() -> str:
    """Diagonal Mahalanobis with the moment sums rounded at 6dp before
    μ/σ² derivation (identical op order to the Ray driver) and the
    ranking keyed on the rounded score + vec_id."""
    from ..stages.knn import OUTLIER_TOPK

    return f"""
    WITH vals AS (
        SELECT vec_id,
               unnest(CAST(embedding AS DOUBLE[])) AS v,
               generate_subscripts(embedding, 1) - 1 AS d
        FROM embeddings
    ),
    mom AS (
        SELECT d, count(*) AS n,
               round_even(sum(v), 6) AS sx,
               round_even(sum(v * v), 6) AS sxx
        FROM vals GROUP BY d
    ),
    stats AS (
        SELECT d, sx / n AS mu,
               CASE WHEN sxx / n - (sx / n) * (sx / n) <= 0 THEN 1.0
                    ELSE sxx / n - (sx / n) * (sx / n) END AS var
        FROM mom
    ),
    scores AS (
        SELECT vec_id,
               round_even(sum((v - mu) * (v - mu) / var), 6) AS score
        FROM vals JOIN stats USING (d)
        GROUP BY vec_id
    )
    SELECT row_number() OVER (ORDER BY score DESC, vec_id)
               AS outlier_rank,
           vec_id, score
    FROM scores
    QUALIFY outlier_rank <= {OUTLIER_TOPK}
"""


ORACLE_SQL["embedding_outlier_scores"] = _embedding_outlier_sql()


def _epoch_shuffle_sql() -> str:
    from .corpus_ops import SHUFFLE_EPOCHS

    return f"""
    WITH e AS (
        SELECT doc_id, epoch,
               CAST(('0x' || substr(md5('e' || CAST(epoch AS VARCHAR)
                     || '-' || CAST(doc_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) AS h
        FROM documents,
             UNNEST(generate_series(0, {SHUFFLE_EPOCHS - 1})) AS t(epoch)
    )
    SELECT doc_id, CAST(epoch AS BIGINT) AS epoch,
           CAST(row_number() OVER (PARTITION BY epoch
                                   ORDER BY h, doc_id) AS BIGINT)
               AS position
    FROM e
"""


ORACLE_SQL["epoch_shuffle_order"] = _epoch_shuffle_sql()


def _hll_est_sql(group_cols: str, src: str, alpha: float) -> str:
    """Shared HLL estimate fragment: register rebuild (md5 top half,
    idx = h >> 52, rest = (h·2^12) mod 2^64, rank from bin()-length
    leading zeros), raw = α·m²/Σ2^-reg with zero registers contributing
    1.0 each, and the standard small-range linear-counting branch —
    the exact arithmetic of stages/sketches.py:HyperLogLog.estimate
    (summation-order and libm last-ulp drift absorbed by the 1dp
    output rounding)."""
    g = group_cols + ", " if group_cols else ""
    gb = f"GROUP BY {group_cols}" if group_cols else ""
    return f"""
    reg AS (
        SELECT {g}hv // 4503599627370496 AS idx,
               CAST((CAST(hv AS HUGEINT) * 4096)
                    % 18446744073709551616 AS UBIGINT) AS rest
        FROM {src}
    ),
    rk AS (
        SELECT {g}idx,
               max(CASE WHEN rest = 0 THEN 54
                        ELSE 64 - length(bin(rest)) + 1 END) AS r
        FROM reg GROUP BY {g}idx
    ),
    s AS (
        SELECT {g}count(*) AS used,
               sum(power(2.0, -r)) AS s_used
        FROM rk {gb}
    ),
    est AS (
        SELECT {g}used,
               CAST({alpha!r} AS DOUBLE) * 4096.0 * 4096.0
                   / ((4096 - used) * 1.0 + s_used) AS raw
        FROM s
    ),
    final_est AS (
        SELECT {g}
               CASE WHEN raw <= 2.5 * 4096.0 AND used < 4096
                    THEN 4096.0 * ln(4096.0 / (4096 - used))
                    ELSE raw END AS est
        FROM est
    )
"""


_HLL_ALPHA = 0.7213 / (1 + 1.079 / 4096)

ORACLE_SQL["daily_active_users_hll"] = (
    """
    WITH u AS (
        SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id
        FROM events
    ),
    h AS (
        SELECT day,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
                    AS UBIGINT) AS hv
        FROM u
    ),
"""
    + _hll_est_sql("day", "h", _HLL_ALPHA)
    + """
    SELECT day, round_even(est, 1) AS dau_approx FROM final_est
"""
)

# str.split() tokenization (runs of whitespace, empties dropped) — the
# approx_token_vocabulary explode's semantics, not the trim+\s+ one
ORACLE_SQL["approx_token_vocabulary"] = (
    r"""
    WITH toks AS (
        SELECT DISTINCT tok
        FROM documents,
             UNNEST(regexp_split_to_array(text, '\s+')) AS t(tok)
        WHERE tok <> ''
    ),
    h AS (
        SELECT CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT) AS hv
        FROM toks
    ),
"""
    + _hll_est_sql("", "h", _HLL_ALPHA)
    + """
    SELECT round_even(est, 1) AS approx_distinct_tokens FROM final_est
"""
)
