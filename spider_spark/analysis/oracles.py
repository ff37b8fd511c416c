"""DuckDB oracle SQL for the analysis operators.

Each function returns ANSI-ish DuckDB SQL computing byte-for-byte the same
result as the corresponding Spark pipeline in analysis/dedup.py and
analysis/similarity.py. This works because every hash is md5-derived
(functions/hashing.py: Spark conv-over-hex == DuckDB md5_number_lower
masks) and all integer arithmetic is kept inside exact signed-64-bit range
on both engines. The SQL is generated from the SAME parameters
(minhash_params seed, SRP planes seed) used by the Spark side, so constants
can never drift apart.
"""

from __future__ import annotations

import numpy as np

from spider_spark.functions.hashing import (
    MERSENNE61,
    md5_u32_duckdb,
    minhash_params,
)

# shared tokenizer (Python str.split semantics: lower, split on \s+, drop empties)
_TOKS = (
    "list_filter(regexp_split_to_array(lower(coalesce({col}, '')), '\\s+'), "
    "x -> x <> '')"
)


def minhash_sig_cte(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_w: int = 2,
    seed: int = 7,
    prefix: str = "",
) -> str:
    """CTE chain ending in ``{prefix}sig(doc_id, sig)`` — minhash
    signatures. ``prefix`` namespaces the CTEs so two corpora (e.g.
    incremental_dedup's new vs old) can carry signatures in one WITH."""
    w = shingle_w
    p = prefix
    a_s, b_s = minhash_params(num_hashes, seed)
    toks = _TOKS.format(col=text_col)
    h32 = md5_u32_duckdb(f"array_to_string(t[i+1:i+{w}], ' ')", 8)
    sig_items = ",\n         ".join(
        f"list_min(list_transform(h, x -> ({a} * x + {b}) % {MERSENNE61}))"
        for a, b in zip(a_s, b_s)
    )
    return f"""
    {p}toks AS (
      SELECT {id_col} AS doc_id, {toks} AS t FROM {table}
    ), {p}padded AS (
      SELECT doc_id,
             CASE WHEN len(t) >= {w} THEN t
                  ELSE list_concat(t, list_transform(range({w} - len(t)), x -> ''))
             END AS t
      FROM {p}toks
    ), {p}hashes AS (
      SELECT doc_id,
             list_transform(range(0, len(t) - {w} + 1), i -> {h32}) AS h
      FROM {p}padded
    ), {p}sig AS (
      SELECT doc_id, [{sig_items}] AS sig FROM {p}hashes
    )"""


def minhash_lsh_sql(
    table: str = "documents",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_w: int = 2,
) -> str:
    """Full minhash-LSH candidate pairs: (id_l, id_r, n_bands_hit)."""
    band_selects = _band_bucket_selects("sig", num_hashes, bands)
    return f"""
    WITH {minhash_sig_cte(table, num_hashes=num_hashes, shingle_w=shingle_w)},
    buckets AS (
      {band_selects}
    )
    SELECT l.doc_id AS id_l, r.doc_id AS id_r, count(*) AS n_bands_hit
    FROM buckets l
    JOIN buckets r ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
    GROUP BY 1, 2
    """


def _band_bucket_selects(
    sig_table: str, num_hashes: int, bands: int
) -> str:
    """UNION ALL of per-band (doc_id, band, bh) selects over a sig CTE."""
    rpb = num_hashes // bands
    return "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {b} AS band, substring(md5("
        + " || ',' || ".join(
            f"CAST(sig[{b * rpb + i + 1}] AS VARCHAR)" for i in range(rpb)
        )
        + f"), 1, 16) AS bh FROM {sig_table}"
        for b in range(bands)
    )


def incremental_dedup_sql(
    new_sql: str,
    old_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_w: int = 2,
) -> str:
    """Replica of analysis/dedup.incremental_dedup: per new doc a status
    in (exact_dup_of_old, near_dup_of_old, new) + best near match. Near
    candidates are computed over ALL new docs and masked by the exact
    check in the final CASE — output-identical to the engine's
    exact-first pruning (exact rows ignore their near match either
    way). Best-match tie-break = (hits DESC, match_id DESC), DuckDB
    row_number mirroring Spark's max(struct(hits, match_id))."""
    fp = (
        f"md5(lower(trim(regexp_replace({text_col}, '\\s+', ' ', 'g'))))"
    )
    nsig = minhash_sig_cte(
        f"({new_sql})", text_col, id_col, num_hashes, shingle_w, prefix="n_"
    )
    osig = minhash_sig_cte(
        f"({old_sql})", text_col, id_col, num_hashes, shingle_w, prefix="o_"
    )
    return f"""
    WITH {nsig}, {osig},
    nb AS (
      {_band_bucket_selects("n_sig", num_hashes, bands)}
    ), ob AS (
      {_band_bucket_selects("o_sig", num_hashes, bands)}
    ), nearbest AS (
      SELECT doc_id, match_id, hits FROM (
        SELECT nb.doc_id, ob.doc_id AS match_id,
               count(*)::BIGINT AS hits,
               row_number() OVER (PARTITION BY nb.doc_id
                   ORDER BY count(*) DESC, ob.doc_id DESC) AS _rn
        FROM nb JOIN ob ON nb.band = ob.band AND nb.bh = ob.bh
        GROUP BY nb.doc_id, ob.doc_id)
      WHERE _rn = 1
    ), nfp AS (
      SELECT {id_col} AS doc_id, {fp} AS fp FROM ({new_sql})
    ), ofp AS (
      SELECT DISTINCT {fp} AS fp FROM ({old_sql})
    )
    SELECT f.doc_id,
           CASE WHEN f.fp IN (SELECT fp FROM ofp) THEN 'exact_dup_of_old'
                WHEN nr.match_id IS NOT NULL THEN 'near_dup_of_old'
                ELSE 'new' END AS status,
           CASE WHEN f.fp IN (SELECT fp FROM ofp) THEN NULL
                ELSE nr.match_id END AS match_id,
           CASE WHEN f.fp IN (SELECT fp FROM ofp) THEN NULL
                ELSE nr.hits END AS n_bands_hit
    FROM nfp f LEFT JOIN nearbest nr ON nr.doc_id = f.doc_id
    """


def reps_subquery(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """Parenthesized-subquery 'table' of exact-fingerprint representatives
    (min id per normalized-text md5 group) with group sizes — the DuckDB
    mirror of analysis/dedup.exact_representatives. Usable wherever the
    other generators take a ``table`` argument."""
    return f"""(
      SELECT {id_col} AS doc_id, {text_col} AS text, fp, n_exact FROM (
        SELECT {id_col}, {text_col},
               md5(lower(trim(regexp_replace({text_col}, '\\s+', ' ', 'g')))) AS fp,
               min({id_col}) OVER (PARTITION BY
                 md5(lower(trim(regexp_replace({text_col}, '\\s+', ' ', 'g'))))) AS rep,
               count(*) OVER (PARTITION BY
                 md5(lower(trim(regexp_replace({text_col}, '\\s+', ' ', 'g'))))) AS n_exact
        FROM {table})
      WHERE {id_col} = rep) """


def minhash_lsh_pregroup_sql(
    table: str = "documents",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_w: int = 2,
) -> str:
    """Pre-grouped minhash-LSH: (id_l, id_r, n_bands_hit, n_exact_l,
    n_exact_r) over exact-fingerprint representatives."""
    lsh = minhash_lsh_sql(
        reps_subquery(table) + "reps", num_hashes, bands, shingle_w
    ).strip()
    return f"""
    WITH cand AS ({lsh})
    SELECT c.id_l, c.id_r, c.n_bands_hit,
           sl.n_exact AS n_exact_l, sr.n_exact AS n_exact_r
    FROM cand c
    JOIN {reps_subquery(table)} sl ON sl.doc_id = c.id_l
    JOIN {reps_subquery(table)} sr ON sr.doc_id = c.id_r
    """


def simhash_sig_cte(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """CTE chain ending in ``sigs(doc_id, sh_lo, sh_hi)``."""
    toks = _TOKS.format(col=text_col)
    lo = md5_u32_duckdb("tok", 8)
    hi = md5_u32_duckdb("tok", 12)
    vote_items = ",\n             ".join(
        f"sum(CASE WHEN ({half} >> {b}) & 1 = 1 THEN c ELSE -c END) AS _v{n}{b}"
        for half, n in (("lo", "l"), ("hi", "h"))
        for b in range(32)
    )
    pack = lambda n: " + ".join(
        f"(CASE WHEN _v{n}{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(32)
    )
    return f"""
    toks AS (
      SELECT {id_col} AS doc_id, unnest({toks}) AS tok FROM {table}
    ), tc AS (
      SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
    ), th AS (
      SELECT doc_id, c, {lo} AS lo, {hi} AS hi FROM tc
    ), votes AS (
      SELECT doc_id,
             {vote_items}
      FROM th GROUP BY doc_id
    ), sigs0 AS (
      SELECT doc_id, {pack('l')} AS sh_lo, {pack('h')} AS sh_hi FROM votes
    ), sigs AS (
      SELECT d.{id_col} AS doc_id,
             coalesce(s.sh_lo, 0) AS sh_lo, coalesce(s.sh_hi, 0) AS sh_hi
      FROM {table} d LEFT JOIN sigs0 s ON d.{id_col} = s.doc_id
    )"""


def simhash_pairs_sql(table: str = "documents", max_hamming: int = 8) -> str:
    """Simhash near-dup pairs: (id_l, id_r, hamming). Banding comes from
    the SAME simhash_bands spec the Spark operator uses (max_hamming+1
    disjoint slices — pigeonhole-complete for the given bound)."""
    from spider_spark.analysis.dedup import _band_expr_sql, simhash_bands

    bands = simhash_bands(max_hamming)
    cases = " ".join(
        f"WHEN {i} THEN {_band_expr_sql(s, w)}"
        for i, (s, w) in enumerate(bands[:-1])
    )
    last = _band_expr_sql(*bands[-1])
    qids = ",".join(str(i) for i in range(len(bands)))
    return f"""
    WITH {simhash_sig_cte(table)},
    quarters AS (
      SELECT doc_id, sh_lo, sh_hi, q.q AS q,
             CASE q.q {cases}
                      ELSE {last} END AS qv
      FROM sigs CROSS JOIN (SELECT unnest([{qids}]) AS q) q
    ), pairs AS (
      SELECT DISTINCT l.doc_id AS id_l, r.doc_id AS id_r,
             l.sh_lo AS lo_l, l.sh_hi AS hi_l,
             r.sh_lo AS lo_r, r.sh_hi AS hi_r
      FROM quarters l
      JOIN quarters r ON l.q = r.q AND l.qv = r.qv AND l.doc_id < r.doc_id
    )
    SELECT id_l, id_r, hamming FROM (
      SELECT id_l, id_r,
             CAST(bit_count(xor(lo_l, lo_r)) + bit_count(xor(hi_l, hi_r))
                  AS INTEGER) AS hamming
      FROM pairs)
    WHERE hamming <= {max_hamming}
    """


def ngram_jaccard_sql(
    table: str = "documents",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_w: int = 2,
    n: int = 2,
) -> str:
    """Jaccard verification over the minhash-LSH candidate pairs:
    (id_l, id_r, n_bands_hit, jaccard). Gram tokenization mirrors the
    Spark side exactly (coalesce+trim+split, NOT empty-filtered; null
    text yields no grams on both engines)."""
    lsh = minhash_lsh_sql(table, num_hashes, bands, shingle_w).strip()
    return f"""
    WITH cand AS ({lsh}),
    grams AS (
      SELECT doc_id,
             CASE WHEN len(t) >= {n}
                  THEN list_distinct(list_transform(range(0, len(t) - {n} + 1),
                       i -> array_to_string(t[i+1:i+{n}], ' ')))
                  ELSE [] END AS g
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(coalesce(text, ''))),
                                         '\\s+') AS t
            FROM {table})
    )
    SELECT c.id_l, c.id_r, c.n_bands_hit,
           round(CAST(len(list_filter(gl.g, x -> list_contains(gr.g, x))) AS DOUBLE)
                 / (len(gl.g) + len(gr.g)
                    - len(list_filter(gl.g, x -> list_contains(gr.g, x)))),
                 6) AS jaccard
    FROM cand c
    JOIN grams gl ON gl.doc_id = c.id_l
    JOIN grams gr ON gr.doc_id = c.id_r
    """


# ------------------------------------------------------------------- SRP


def srp_bucket_expr(planes: np.ndarray, vec_expr: str = "e") -> str:
    """Bucket id from sign-random-projection planes, with the dot product
    expanded as an explicit left-to-right sum — the same association order
    as Spark's aggregate() fold, so the doubles agree bitwise."""
    bits = []
    for i, plane in enumerate(planes):
        dot = " + ".join(
            f"{vec_expr}[{j + 1}] * ({float(x)!r})" for j, x in enumerate(plane)
        )
        bits.append(f"(CASE WHEN (0.0 + {dot}) >= 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def srp_bucket_cte(planes: np.ndarray, table: str = "embeddings") -> str:
    """CTE ``b(vec_id, e, srp_bucket)`` over an embeddings table."""
    return f"""
    v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {table}
    ), b AS (
      SELECT vec_id, e, {srp_bucket_expr(planes)} AS srp_bucket FROM v
    )"""


def srp_histogram_sql(planes: np.ndarray, table: str = "embeddings") -> str:
    return f"""
    WITH {srp_bucket_cte(planes, table)}
    SELECT srp_bucket, count(*) AS n_vecs FROM b GROUP BY 1
    """


def embedding_lsh_sql(
    planes: np.ndarray, threshold: float, table: str = "embeddings"
) -> str:
    """SRP-bucketed near-dup pairs: (id_a, id_b, cos_sim)."""
    return f"""
    WITH {srp_bucket_cte(planes, table)}
    SELECT id_a, id_b, cos_sim FROM (
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
             CASE WHEN list_dot_product(a.e, a.e) = 0
                    OR list_dot_product(b2.e, b2.e) = 0 THEN 0.0
                  ELSE round(list_cosine_similarity(a.e, b2.e), 4)
             END AS cos_sim
      FROM b a JOIN b b2
        ON a.srp_bucket = b2.srp_bucket AND a.vec_id < b2.vec_id)
    WHERE cos_sim >= {threshold}
    """


def _ivf_cos_exprs(centroids: np.ndarray, vec_expr: str = "e") -> list[str]:
    """Cosine-vs-centroid expressions with dot and norm expanded as
    explicit left-to-right sums (bitwise-identical doubles to Spark's
    aggregate() folds); centroid norms are Python literals shared with
    the Spark side."""
    nv = (
        "sqrt(0.0 + "
        + " + ".join(
            f"{vec_expr}[{j + 1}] * {vec_expr}[{j + 1}]"
            for j in range(centroids.shape[1])
        )
        + ")"
    )
    out = []
    for c in centroids:
        dot = "0.0 + " + " + ".join(
            f"{vec_expr}[{j + 1}] * ({float(x)!r})" for j, x in enumerate(c)
        )
        nc = float(np.sqrt(np.sum(c * c)))
        # zero-norm guard mirrors similarity._centroid_cosines: a zero
        # vector scores 0.0 vs every centroid -> cell 0 deterministically
        out.append(
            f"(CASE WHEN {nv} > 0 THEN (({dot}) / ({nv} * {nc!r}))"
            f" ELSE 0.0 END)"
        )
    return out


def ivf_cell_cte(centroids: np.ndarray, table: str = "embeddings") -> str:
    """CTE ``cells(vec_id, e, ivf_cell)`` — 0-based argmax-cosine cell,
    first index on ties, matching analysis/similarity.with_ivf_cell."""
    lst = "[" + ", ".join(_ivf_cos_exprs(centroids)) + "]"
    return f"""
    v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {table}
    ), scored AS (
      SELECT vec_id, e, {lst} AS cs FROM v
    ), cells AS (
      SELECT vec_id, e,
             CAST(list_indexof(cs, list_aggregate(cs, 'max')) - 1 AS INTEGER)
               AS ivf_cell
      FROM scored
    )"""


def ann_topk_ivf_sql(
    centroids: np.ndarray,
    nprobe: int = 2,
    k: int = 10,
    query_vec_id: int = 0,
    table: str = "embeddings",
) -> str:
    """IVF top-k: (vec_id, cos_sim as %.4f string) inside the query's
    nprobe closest cells. The probe set is derived IN SQL from the same
    expanded cosine list the cells use (descending cosine, index
    ascending on ties) — the exact rule of similarity.ivf_probe_cells, on
    bitwise-identical doubles, so both engines prune identically."""
    return f"""
    WITH {ivf_cell_cte(centroids, table)},
    probe AS (
      SELECT i - 1 AS cell FROM (
        SELECT unnest(range(1, len(cs) + 1)) AS i, cs
        FROM scored WHERE vec_id = {query_vec_id})
      ORDER BY cs[i] DESC, i
      LIMIT {nprobe}
    )
    SELECT vec_id, printf('%.4f', cos_r) AS cos_sim FROM (
      SELECT vec_id,
             CASE WHEN list_dot_product(e, e) = 0 THEN 0.0
                  ELSE round(list_cosine_similarity(e,
                 (SELECT e FROM v WHERE vec_id = {query_vec_id})), 4)
             END AS cos_r
      FROM cells
      WHERE ivf_cell IN (SELECT cell FROM probe)
      ORDER BY cos_r DESC, vec_id
      LIMIT {k})
    """


def ivf_histogram_sql(centroids: np.ndarray, table: str = "embeddings") -> str:
    """Cell occupancy histogram — pins the full assignment operator."""
    return f"""
    WITH {ivf_cell_cte(centroids, table)}
    SELECT ivf_cell, count(*) AS n_vecs FROM cells GROUP BY 1
    """


def ivf_means_sql(centroids: np.ndarray, table: str = "embeddings") -> str:
    """The Lloyd-step aggregation of similarity.ivf_cell_means: per-(cell,
    dimension) mean of member vectors, reported as milli-units (round to
    integer after ×1000 — double summation order differs between engines
    by ~1e-13, far below the 5e-4 rounding boundary)."""
    dim = centroids.shape[1]
    return f"""
    WITH {ivf_cell_cte(centroids, table)}
    SELECT ivf_cell, i - 1 AS pos,
           CAST(round(avg(e[i]) * 1000) AS BIGINT) AS m_milli
    FROM cells, (SELECT unnest(range(1, {dim + 1})) AS i)
    GROUP BY 1, 2
    """


def ann_topk_lsh_sql(
    planes: np.ndarray, k: int = 10, query_vec_id: int = 0,
    table: str = "embeddings",
) -> str:
    """Bucket-pruned approximate top-k: (vec_id, cos_sim as %.4f string)."""
    return f"""
    WITH {srp_bucket_cte(planes, table)}
    SELECT vec_id, printf('%.4f', cos_r) AS cos_sim FROM (
      SELECT vec_id,
             CASE WHEN list_dot_product(e, e) = 0 THEN 0.0
                  ELSE round(list_cosine_similarity(e,
                 (SELECT e FROM b WHERE vec_id = {query_vec_id})), 4)
             END AS cos_r
      FROM b
      WHERE srp_bucket = (SELECT srp_bucket FROM b WHERE vec_id = {query_vec_id})
      ORDER BY cos_r DESC, vec_id
      LIMIT {k})
    """


def duplicate_clusters_sql(
    table: str = "documents",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_w: int = 2,
) -> str:
    """Independent replica of analysis/dedup.duplicate_clusters: the same
    pre-grouped LSH candidate pairs, closed transitively with a recursive
    CTE (enumerate every (node, reachable-id) pair, take the min — fine at
    oracle scale), members inheriting their representative's component via
    the fingerprint."""
    lsh = minhash_lsh_sql(
        reps_subquery(table) + "reps", num_hashes, bands, shingle_w
    ).strip()
    return f"""
    WITH RECURSIVE cand AS ({lsh}),
    edges AS (
      SELECT id_l AS a, id_r AS b FROM cand
      UNION
      SELECT id_r, id_l FROM cand
    ),
    reach(node, comp) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
    ),
    cc AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
    repmap AS (
      SELECT s.fp, coalesce(c.comp, s.doc_id) AS cluster_id
      FROM {reps_subquery(table)} s LEFT JOIN cc c ON c.node = s.doc_id
    ),
    members AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
      FROM {table}
    ),
    assigned AS (
      SELECT m.doc_id, r.cluster_id FROM members m JOIN repmap r ON m.fp = r.fp
    )
    SELECT a.doc_id, a.cluster_id, s.cluster_size
    FROM assigned a
    JOIN (SELECT cluster_id, count(*) AS cluster_size
          FROM assigned GROUP BY 1) s USING (cluster_id)
    """


def _stop_hits_sql(words) -> str:
    return " + ".join(
        f"CASE WHEN regexp_matches(lower(text), '\\b{w}\\b') "
        "THEN 1 ELSE 0 END"
        for w in words
    )


def clean_kept_subquery(
    table: str = "documents",
    min_ws_tokens: int = 5,
    max_punct_pct: int = 10,
) -> str:
    """Parenthesized-subquery of the gated corpus — the DuckDB mirror of
    analysis/pipeline.clean_corpus's ``kept`` stage (lang-ID gate,
    whitespace-token floor, integer punctuation ceiling). Stopword lists
    come from analysis/text.py so the two engines can't drift."""
    from spider_spark.analysis.text import DE_STOPS, EN_STOPS, ES_STOPS

    en, de, es = (_stop_hits_sql(w) for w in (EN_STOPS, DE_STOPS, ES_STOPS))
    return f"""(
      SELECT doc_id, text, lang_guess, bpe_tokens FROM (
        SELECT doc_id, text,
          CASE WHEN en >= de AND en >= es AND en > 0 THEN 'en'
               WHEN de >= es AND de > 0 THEN 'de'
               WHEN es > 0 THEN 'es'
               ELSE 'unknown' END AS lang_guess,
          len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS ws_tokens,
          len(regexp_extract_all(text,
              '[A-Za-z]{{1,4}}|[0-9]+|[^\\sA-Za-z0-9]'))::BIGINT AS bpe_tokens,
          length(text) AS n,
          length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS np
        FROM (SELECT doc_id, text,
                     ({en}) AS en, ({de}) AS de, ({es}) AS es
              FROM {table}))
      WHERE lang_guess <> 'unknown'
        AND ws_tokens >= {min_ws_tokens}
        AND (n - np) * 100 <= n * {max_punct_pct}) """


def clean_corpus_sql(
    table: str = "documents",
    min_ws_tokens: int = 5,
    max_punct_pct: int = 10,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_w: int = 2,
) -> str:
    """Replica of analysis/pipeline.clean_corpus: gate, then resolve
    near-dup clusters among the survivors (the full recursive-CTE
    closure as a derived table), keep canonical docs only."""
    kept = clean_kept_subquery(table, min_ws_tokens, max_punct_pct)
    dc = duplicate_clusters_sql(kept, num_hashes, bands, shingle_w)
    return f"""
    SELECT k.doc_id, k.lang_guess, k.bpe_tokens, dc.cluster_size
    FROM ({dc}) dc
    JOIN {kept} k ON k.doc_id = dc.doc_id
    WHERE dc.doc_id = dc.cluster_id
    """


# ----------------------------------------------- repetition / rule cleaning


def synth_multiline_cte(
    table: str = "documents", text_col: str = "text", words_per_line: int = 8
) -> str:
    """CTE chain ending in ``mdocs(doc_id, mtext)`` — the deterministic
    multi-line re-rendering of analysis/cleaning.synth_multiline (same
    closed-form line schedule: bare line every 3rd, '- ' bullet every 5th,
    boilerplate marker every 7th-offset-3). DuckDB list slices are 1-based
    inclusive, Spark ``slice`` is (1-based start, length) — both clamp at
    the array end, so the partial last line agrees."""
    w = words_per_line
    toks = _TOKS.format(col=text_col)
    return f"""
    mtoks AS (
      SELECT doc_id, {toks} AS t FROM {table}
    ), mdocs AS (
      SELECT doc_id, array_to_string(list_transform(
        range(0, CAST(ceil(len(t) / {w}.0) AS INT)),
        i -> CASE
          WHEN i % 7 = 3 THEN 'see our cookie policy for details.'
          ELSE concat(
            CASE WHEN i % 5 = 0 THEN '- ' ELSE '' END,
            array_to_string(t[i * {w} + 1 : i * {w} + {w}], ' '),
            CASE WHEN i % 3 = 2 THEN '' ELSE '.' END)
        END), chr(10)) AS mtext
      FROM mtoks
    )"""


def repetition_stats_sql(
    table: str = "documents",
    text_col: str = "text",
    ngram_n: int = 3,
) -> str:
    """Replica of analysis/cleaning.repetition_stats: duplicate word /
    n-gram / line fractions + count-based top-bigram occupancy."""
    n = ngram_n
    toks = _TOKS.format(col=text_col)
    return f"""
    WITH rt AS (
      SELECT doc_id, {toks} AS t,
             string_split({text_col}, chr(10)) AS ls
      FROM {table}
    ), rb AS (
      SELECT doc_id, t, len(t) AS n_words,
        CASE WHEN len(t) > 0
             THEN round((len(t) - len(list_distinct(t))) / len(t), 6)
             ELSE 0.0 END AS dup_word_frac,
        CASE WHEN len(g) > 0
             THEN round((len(g) - len(list_distinct(g))) / len(g), 6)
             ELSE 0.0 END AS dup_ngram_frac,
        CASE WHEN len(ls) > 0
             THEN round((len(ls) - len(list_distinct(ls))) / len(ls), 6)
             ELSE 0.0 END AS dup_line_frac
      FROM (SELECT doc_id, t, ls,
              CASE WHEN len(t) >= {n} THEN
                list_transform(range(0, len(t) - {n} + 1),
                  i -> array_to_string(t[i + 1 : i + {n}], ' '))
              ELSE [] END AS g
            FROM rt)
    ), rbg AS (
      SELECT doc_id, unnest(
        CASE WHEN len(t) >= 2 THEN
          list_transform(range(0, len(t) - 1),
            i -> t[i + 1] || ' ' || t[i + 2])
        ELSE [] END) AS bg
      FROM rt
    ), rcnt AS (
      SELECT doc_id, bg, count(*) AS c FROM rbg GROUP BY 1, 2
    ), rtop AS (
      SELECT doc_id, max(c) AS topc FROM rcnt GROUP BY 1
    )
    SELECT rb.doc_id, rb.n_words::BIGINT AS n_words,
           rb.dup_word_frac, rb.dup_ngram_frac, rb.dup_line_frac,
           round(CASE WHEN rb.n_words > 0
                 THEN coalesce(rtop.topc, 0) * 2 / rb.n_words
                 ELSE 0.0 END, 6) AS top_bigram_frac
    FROM rb LEFT JOIN rtop USING (doc_id)
    """


def gopher_filter_sql(
    source_sql: str,
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 100000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_per_10_words: int = 1,
    max_bullet_lines_pct: int = 90,
    max_ellipsis_lines_pct: int = 30,
    min_stop_hits: int = 1,
) -> str:
    """Replica of analysis/cleaning.gopher_filter over ``source_sql`` (a
    CTE/table name exposing doc_id + text_col); flags emitted as 0/1 ints
    (the Spark query casts its booleans identically)."""
    from spider_spark.analysis.text import EN_STOPS

    toks = _TOKS.format(col=text_col)
    stop_hits = " + ".join(
        f"CASE WHEN list_contains(t, '{w}') THEN 1 ELSE 0 END"
        for w in EN_STOPS
    )
    return f"""
    SELECT doc_id, len(t)::BIGINT AS n_words,
      (len(t) >= {min_words} AND len(t) <= {max_words})::INT AS f_words,
      ({min_mean_word_len} * len(t) <= sum_len
        AND sum_len <= {max_mean_word_len} * len(t))::INT AS f_word_len,
      (n_sym * 10 <= {max_symbol_per_10_words} * len(t))::INT AS f_symbols,
      (n_bullet * 100 <= {max_bullet_lines_pct} * len(ls))::INT AS f_bullets,
      (n_ellipsis * 100 <= {max_ellipsis_lines_pct} * len(ls))::INT
        AS f_ellipsis,
      (({stop_hits}) >= {min_stop_hits})::INT AS f_stops,
      ((len(t) >= {min_words} AND len(t) <= {max_words})
       AND ({min_mean_word_len} * len(t) <= sum_len
            AND sum_len <= {max_mean_word_len} * len(t))
       AND (n_sym * 10 <= {max_symbol_per_10_words} * len(t))
       AND (n_bullet * 100 <= {max_bullet_lines_pct} * len(ls))
       AND (n_ellipsis * 100 <= {max_ellipsis_lines_pct} * len(ls))
       AND (({stop_hits}) >= {min_stop_hits}))::INT AS keep
    FROM (
      SELECT doc_id, t, ls,
        coalesce(list_sum(list_transform(t, x -> length(x))), 0) AS sum_len,
        (len(string_split({text_col}, '#')) - 1
         + len(regexp_split_to_array({text_col}, '\\.\\.\\.')) - 1) AS n_sym,
        (len(list_filter(ls, x -> trim(x) LIKE '- %'))
         + len(list_filter(ls, x -> trim(x) LIKE '* %'))) AS n_bullet,
        len(list_filter(ls, x -> trim(x) LIKE '%...')) AS n_ellipsis
      FROM (SELECT doc_id, {toks} AS t,
                   string_split({text_col}, chr(10)) AS ls, {text_col}
            FROM {source_sql})
    )
    """


def c4_line_clean_sql(
    source_sql: str, text_col: str = "text", min_words: int = 3
) -> str:
    """Replica of analysis/cleaning.c4_line_clean over ``source_sql``."""
    from spider_spark.analysis.cleaning import C4_BOILERPLATE

    markers = " AND ".join(
        f"NOT contains(lower(trim(x)), '{m}')" for m in C4_BOILERPLATE
    )
    ok = (
        "x -> (trim(x) LIKE '%.' OR trim(x) LIKE '%!' OR trim(x) LIKE '%?' "
        "OR trim(x) LIKE '%\"') "
        f"AND len(regexp_split_to_array(trim(x), '\\s+')) >= {min_words} "
        f"AND {markers}"
    )
    return f"""
    SELECT doc_id,
           array_to_string(ks, chr(10)) AS clean_text,
           len(ls)::BIGINT AS n_lines,
           len(ks)::BIGINT AS n_lines_kept
    FROM (
      SELECT doc_id, ls, list_filter(ls, {ok}) AS ks
      FROM (SELECT doc_id, string_split({text_col}, chr(10)) AS ls
            FROM {source_sql})
    )
    """


# ------------------------------------------------------- host-graph PageRank


def transition_edges_cte(
    source_sql: str = "events",
    node_expr: str = "node",
    user_col: str = "user_id",
    order_cols: tuple = ("ts", "event_id"),
) -> str:
    """CTE chain ending in ``gedges(src, dst, weight)`` — the per-user
    consecutive-transition edge list of analysis/graph.transition_edges."""
    order = ", ".join(order_cols)
    return f"""
    gtr AS (
      SELECT {node_expr} AS dst,
             lag({node_expr}) OVER (
               PARTITION BY {user_col} ORDER BY {order}) AS src
      FROM {source_sql}
    ), gedges AS (
      SELECT src, dst, count(*)::BIGINT AS weight
      FROM gtr WHERE src IS NOT NULL AND src <> dst
      GROUP BY 1, 2
    )"""


def pagerank_int_sql(
    edges_cte: str,
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> str:
    """Unrolled replica of analysis/graph.pagerank_int over ``edges_cte``
    (a WITH-chain ending in gedges). Exactly ``iters`` CTE levels, every
    operation 64-bit integer, so equality with Spark is bit-exact."""
    base = (100 - damping_pct) * scale // 100
    levels = []
    prev = "gr0"
    levels.append(
        f"gr0 AS (SELECT node, {scale}::BIGINT AS r FROM gnodes)"
    )
    for i in range(1, iters + 1):
        levels.append(f"""gr{i} AS (
      SELECT n.node,
             ({base} + ({damping_pct} * coalesce(s.c, 0)) // 100)::BIGINT AS r
      FROM gnodes n LEFT JOIN (
        SELECT e.dst AS node,
               sum((r.r::HUGEINT * e.weight) // o.ow)::HUGEINT AS c
        FROM gedges e
        JOIN {prev} r ON r.node = e.src
        JOIN gout o ON o.src = e.src
        GROUP BY 1) s ON s.node = n.node
    )""")
        prev = f"gr{i}"
    chain = ",\n    ".join(levels)
    return f"""
    WITH {edges_cte},
    gnodes AS (
      SELECT src AS node FROM gedges UNION SELECT dst FROM gedges
    ),
    gout AS (SELECT src, sum(weight) AS ow FROM gedges GROUP BY 1),
    {chain}
    SELECT node, r FROM {prev}
    """


def hits_int_sql(
    edges_cte: str,
    iters: int = 5,
    scale: int = 1_000_000,
) -> str:
    """Unrolled replica of analysis/graph.hits_int over ``edges_cte`` (a
    WITH-chain ending in gedges). Max-normalized integer HITS — every
    level is pure BIGINT arithmetic, so equality with Spark is
    bit-exact. Iteration CTEs are MATERIALIZED: each level references
    its predecessor more than once (value select + scalar-max
    subquery), and DuckDB's default CTE inlining would re-evaluate the
    whole chain per reference — exponential in iters."""
    levels = [
        f"gs0 AS (SELECT node, {scale}::BIGINT AS hub, "
        f"{scale}::BIGINT AS auth FROM gnodes)"
    ]
    prev = "gs0"
    for i in range(1, iters + 1):
        levels.append(f"""ga{i} AS MATERIALIZED (
      SELECT e.dst AS node, sum(s.hub * e.weight) AS ar
      FROM gedges e JOIN {prev} s ON s.node = e.src
      GROUP BY 1
    ), gan{i} AS MATERIALIZED (
      SELECT node,
             ((ar::HUGEINT * {scale}) // (SELECT max(ar) FROM ga{i}))::BIGINT
               AS auth
      FROM ga{i}
    ), gh{i} AS MATERIALIZED (
      SELECT e.src AS node, sum(a.auth * e.weight) AS hr
      FROM gedges e JOIN gan{i} a ON a.node = e.dst
      GROUP BY 1
    ), ghn{i} AS MATERIALIZED (
      SELECT node,
             ((hr::HUGEINT * {scale}) // (SELECT max(hr) FROM gh{i}))::BIGINT
               AS hub
      FROM gh{i}
    ), gs{i} AS MATERIALIZED (
      SELECT n.node,
             coalesce(h.hub, 0)::BIGINT AS hub,
             coalesce(a.auth, 0)::BIGINT AS auth
      FROM gnodes n
      LEFT JOIN ghn{i} h ON h.node = n.node
      LEFT JOIN gan{i} a ON a.node = n.node
    )""")
        prev = f"gs{i}"
    chain = ",\n    ".join(levels)
    return f"""
    WITH {edges_cte},
    gnodes AS (
      SELECT src AS node FROM gedges UNION SELECT dst FROM gedges
    ),
    {chain}
    SELECT node, hub, auth FROM {prev}
    """


# ------------------------------------------------------------- PII scrubbing


def synth_pii_expr(text_col: str = "text", id_key: str = "doc_id") -> str:
    """SQL expression replicating analysis/cleaning.synth_pii's ptext."""
    h = f"({md5_u32_duckdb(f'CAST({id_key} AS VARCHAR)')} % 4)"
    t = f"coalesce({text_col}, '')"
    sid = f"CAST({id_key} AS VARCHAR)"
    email = f"' reach me at user' || {sid} || '@example.com'"
    pad = f"lpad({sid}, greatest(length({sid}), 3)::INTEGER, '0')"
    phone = f"' call +1-555-' || {pad}"
    return f"""CASE {h}
      WHEN 0 THEN {t} || {email}
      WHEN 1 THEN {t} || {phone}
      WHEN 2 THEN {t} || {email} || {phone}
      ELSE {t} END"""


def pii_scrub_sql(
    table: str = "documents", text_expr: str = "text", id_col: str = "doc_id"
) -> str:
    """Replica of analysis/cleaning.pii_scrub over ``text_expr``."""
    from spider_spark.analysis.cleaning import EMAIL_RE, PHONE_RE

    em, ph = EMAIL_RE.replace("'", "''"), PHONE_RE.replace("'", "''")
    return f"""
    SELECT {id_col} AS doc_id,
           len(regexp_extract_all(t, '{em}'))::BIGINT AS n_emails,
           len(regexp_extract_all(regexp_replace(t, '{em}', '[EMAIL]',
                          'g'), '{ph}'))::BIGINT AS n_phones,
           regexp_replace(regexp_replace(t, '{em}', '[EMAIL]', 'g'),
                          '{ph}', '[PHONE]', 'g') AS scrubbed
    FROM (SELECT {id_col}, coalesce({text_expr}, '') AS t FROM {table})
    """


# ----------------------------------------- decontamination / surprisal score


def gram_hashes_cte(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> str:
    """CTE chain ending in ``dgrams(doc_id, g)`` — distinct md5_u32 word
    n-gram hashes per doc, mirroring analysis/decontam.gram_hash_sets."""
    toks = _TOKS.format(col=text_col)
    h32 = md5_u32_duckdb(f"array_to_string(t[i+1:i+{n}], ' ')")
    return f"""
    dtoks AS (
      SELECT {id_col} AS doc_id, {toks} AS t FROM {table}
    ), dgrams AS (
      SELECT doc_id,
             CASE WHEN len(t) >= {n}
                  THEN list_distinct(list_transform(
                       range(0, len(t) - {n} + 1), i -> {h32}))
                  ELSE [] END AS g
      FROM dtoks
    )"""


def decontaminate_sql(
    table: str = "documents",
    text_col: str = "text",
    n: int = 3,
    bench_residue_mod: int = 25,
) -> str:
    """Replica of analysis/decontam.decontaminate with the benchmark set
    drawn from the same table by a deterministic doc_id residue class
    (md5_u32(doc_id) % mod == 0 — the closed-form fixture both engines
    compute; the corpus itself is the only input, per the no-external-data
    rule). Emits (doc_id, n_grams, n_hit_grams, contaminated::INT)."""
    h = md5_u32_duckdb("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH {gram_hashes_cte(table, text_col, n=n)},
    dblock AS (
      SELECT DISTINCT unnest(g) AS gram FROM dgrams
      WHERE {h} % {bench_residue_mod} = 0
    ),
    dhits AS (
      SELECT doc_id, count(*) AS n_hit
      FROM (SELECT doc_id, unnest(g) AS gram FROM dgrams) eg
      JOIN dblock USING (gram)
      GROUP BY 1
    )
    SELECT g.doc_id, len(g.g)::BIGINT AS n_grams,
           coalesce(h.n_hit, 0)::BIGINT AS n_hit_grams,
           (coalesce(h.n_hit, 0) > 0)::INT AS contaminated
    FROM dgrams g LEFT JOIN dhits h USING (doc_id)
    """


def surprisal_score_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """Replica of analysis/decontam.surprisal_score — integer floor-log2
    surprisal (length(bin(x)) - 1 agrees between Spark and DuckDB: both
    render minimal binary strings for positive int64)."""
    toks = _TOKS.format(col=text_col)
    return f"""
    WITH stoks AS (
      SELECT {id_col} AS doc_id, {toks} AS t FROM {table}
    ), socc AS (
      SELECT doc_id, unnest(t) AS token FROM stoks
    ), suni AS (
      SELECT token, count(*)::BIGINT AS c FROM socc GROUP BY 1
    ), stot AS (
      SELECT sum(c)::BIGINT AS n_total FROM suni
    ), ssc AS (
      SELECT token, (length(bin(n_total // c)) - 1)::BIGINT AS s
      FROM suni, stot
    ), spd AS (
      SELECT doc_id, count(*)::BIGINT AS n_tokens,
             sum(s)::BIGINT AS sum_surprisal
      FROM socc JOIN ssc USING (token) GROUP BY 1
    )
    SELECT d.doc_id, coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
           coalesce(p.sum_surprisal, 0)::BIGINT AS sum_surprisal,
           (CASE WHEN coalesce(p.n_tokens, 0) > 0
                 THEN (1000 * p.sum_surprisal) // p.n_tokens
                 ELSE 0 END)::BIGINT AS mean_surprisal_milli
    FROM (SELECT {id_col} AS doc_id FROM {table}) d
    LEFT JOIN spd p USING (doc_id)
    """


def bigram_lm_score_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """Replica of analysis/decontam.bigram_lm_score (self-trained,
    ref=None): add-one-smoothed bigram LM surprisal
    s = floor(log2((c1 + V) // (c12 + 1))), all-integer."""
    toks = _TOKS.format(col=text_col)
    return f"""
    WITH btoks AS (
      SELECT {id_col} AS doc_id, {toks} AS t FROM {table}
    ), bocc AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM btoks, unnest(range(1, len(t))) AS u(i)
    ), bbig AS (
      SELECT w1, w2, count(*)::BIGINT AS c12 FROM bocc GROUP BY 1, 2
    ), bpre AS (
      SELECT w1, sum(c12)::BIGINT AS c1 FROM bbig GROUP BY 1
    ), bv AS (
      SELECT count(*)::BIGINT AS v FROM bpre
    ), bsc AS (
      SELECT o.doc_id,
             (length(bin((p.c1 + bv.v) // (g.c12 + 1))) - 1)::BIGINT AS s
      FROM bocc o
      JOIN bbig g USING (w1, w2)
      JOIN bpre p USING (w1), bv
    ), bpd AS (
      SELECT doc_id, count(*)::BIGINT AS n_bigrams,
             sum(s)::BIGINT AS sum_surprisal
      FROM bsc GROUP BY 1
    )
    SELECT d.doc_id, coalesce(p.n_bigrams, 0)::BIGINT AS n_bigrams,
           coalesce(p.sum_surprisal, 0)::BIGINT AS sum_surprisal,
           (CASE WHEN coalesce(p.n_bigrams, 0) > 0
                 THEN (1000 * p.sum_surprisal) // p.n_bigrams
                 ELSE 0 END)::BIGINT AS mean_surprisal_milli
    FROM (SELECT {id_col} AS doc_id FROM {table}) d
    LEFT JOIN bpd p USING (doc_id)
    """


# ------------------------------------------------------- winnowing


def winnow_fps_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> str:
    """Replica of analysis/dedup.winnow_fingerprints: distinct per-window
    minima of md5-u32 token k-gram hashes."""
    toks = _TOKS.format(col=text_col)
    u32 = md5_u32_duckdb("array_to_string(t[i+1:i+{0}], chr(32))".format(k))
    u32_short = md5_u32_duckdb("array_to_string(t, chr(32))")
    return f"""
    SELECT DISTINCT doc_id, fp FROM (
      SELECT doc_id, unnest(fps) AS fp FROM (
        SELECT doc_id,
          CASE WHEN len(h) = 0 THEN CAST([] AS BIGINT[])
               WHEN len(h) <= {w} THEN [list_min(h)]
               ELSE list_distinct(list_transform(
                     range(0, len(h) - {w} + 1),
                     j -> list_min(h[j+1:j+{w}]))) END AS fps
        FROM (
          SELECT doc_id,
            CASE WHEN len(t) >= {k} THEN list_transform(
                   range(0, len(t) - {k} + 1), i -> {u32})
                 WHEN len(t) > 0 THEN [{u32_short}]
                 ELSE CAST([] AS BIGINT[]) END AS h
          FROM (SELECT {id_col} AS doc_id, {toks} AS t FROM {table})
        )
      )
    )
    """


# ------------------------------------------- duplicate-substring spans


def _dup_isl_subquery(
    table: str, text_col: str, id_col: str, k: int, min_doc_freq: int
) -> str:
    """Shared islands subquery: (doc_id, pos, island) for every position
    whose k-gram is duplicated across >= min_doc_freq docs."""
    toks = _TOKS.format(col=text_col)
    u32 = md5_u32_duckdb(f"array_to_string(t[i+1:i+{k}], chr(32))")
    return f"""
    (SELECT doc_id, pos,
            sum(CASE WHEN prev IS NULL OR pos > prev + {k} THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS island
     FROM (
       SELECT doc_id, pos,
              lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       FROM (
         SELECT doc_id, unnest(h) AS h, unnest(range(0, len(h))) AS pos
         FROM (
           SELECT doc_id,
             CASE WHEN len(t) >= {k} THEN list_transform(
                    range(0, len(t) - {k} + 1), i -> {u32})
                  ELSE CAST([] AS BIGINT[]) END AS h
           FROM (SELECT {id_col} AS doc_id, {toks} AS t FROM {table})
         )
       )
       WHERE h IN (
         SELECT h FROM (
           SELECT DISTINCT doc_id,
                  unnest(CASE WHEN len(t) >= {k} THEN list_transform(
                           range(0, len(t) - {k} + 1), i -> {u32})
                         ELSE CAST([] AS BIGINT[]) END) AS h
           FROM (SELECT {id_col} AS doc_id, {toks} AS t FROM {table})
         ) GROUP BY h HAVING count(*) >= {min_doc_freq})
     ))
    """


def dup_spans_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_doc_freq: int = 2,
) -> str:
    """Replica of analysis/dedup.duplicate_gram_spans (gaps-and-islands
    merge of positions covered by corpus-duplicated md5-u32 k-grams)."""
    isl = _dup_isl_subquery(table, text_col, id_col, k, min_doc_freq)
    return f"""
    SELECT doc_id,
           min(pos)::BIGINT AS span_start,
           (max(pos) + {k} - 1)::BIGINT AS span_end,
           (max(pos) - min(pos) + {k})::BIGINT AS span_len,
           count(*)::BIGINT AS n_grams
    FROM {isl} GROUP BY doc_id, island
    """


def dup_span_stats_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_doc_freq: int = 2,
) -> str:
    """Replica of analysis/dedup.dup_span_stats (per-doc duplicated-token
    totals; integer milli fraction)."""
    isl = _dup_isl_subquery(table, text_col, id_col, k, min_doc_freq)
    toks = _TOKS.format(col=text_col)
    return f"""
    SELECT d.doc_id,
           d.n_tokens,
           coalesce(s.dup_tokens, 0)::BIGINT AS dup_tokens,
           (CASE WHEN d.n_tokens > 0
                 THEN (1000 * coalesce(s.dup_tokens, 0)) // d.n_tokens
                 ELSE 0 END)::BIGINT AS dup_frac_milli
    FROM (SELECT {id_col} AS doc_id, len({toks})::BIGINT AS n_tokens
          FROM {table}) d
    LEFT JOIN (
      SELECT doc_id, sum(max_pos - min_pos + {k})::BIGINT AS dup_tokens
      FROM (SELECT doc_id, island, min(pos) AS min_pos, max(pos) AS max_pos
            FROM {isl} GROUP BY doc_id, island)
      GROUP BY doc_id
    ) s USING (doc_id)
    """


# ------------------------------------------------------- corpus search


def _pairs_subquery(table: str, text_col: str, id_col: str) -> str:
    toks = _TOKS.format(col=text_col)
    return (
        f"(SELECT doc_id, unnest(list_distinct(t)) AS token "
        f"FROM (SELECT {id_col} AS doc_id, {toks} AS t FROM {table}))"
    )


def inverted_postings_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
) -> str:
    """Replica of analysis/search.inverted_postings."""
    pairs = _pairs_subquery(table, text_col, id_col)
    cap = f"AND count(*) <= {max_df}" if max_df is not None else ""
    return f"""
    SELECT token, count(*)::BIGINT AS n_docs,
           list_sort(list(doc_id)) AS doc_ids
    FROM {pairs}
    GROUP BY token HAVING count(*) >= {min_df} {cap}
    """


def search_conjunctive_sql(
    table: str,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Replica of analysis/search.search_conjunctive."""
    uniq = sorted({t.lower() for t in terms})
    toks = _TOKS.format(col=text_col)
    lits = ", ".join(f"'{t}'" for t in uniq)
    return f"""
    SELECT doc_id FROM (
      SELECT {id_col} AS doc_id,
             len(list_intersect(list_distinct({toks}), [{lits}])) AS hits
      FROM {table})
    WHERE hits = {len(uniq)}
    """


def search_topk_sql(
    table: str,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Replica of analysis/search.search_topk (integer tf·idf; N is the
    corpus row count, computed in SQL — the Spark side passes the same
    value as a literal)."""
    uniq = sorted({t.lower() for t in terms})
    toks = _TOKS.format(col=text_col)
    lits = ", ".join(f"'{t}'" for t in uniq)
    return f"""
    WITH tf AS (
      SELECT doc_id, token, count(*)::BIGINT AS tf
      FROM (SELECT {id_col} AS doc_id, unnest(t) AS token
            FROM (SELECT {id_col}, {toks} AS t FROM {table}))
      WHERE token IN ({lits})
      GROUP BY doc_id, token
    ), wt AS (
      SELECT token,
             (length(bin(greatest(
                (SELECT count(*) FROM {table}) // count(*), 1))) - 1
             )::BIGINT AS w
      FROM tf GROUP BY token
    )
    SELECT doc_id, count(*)::BIGINT AS n_terms_hit,
           sum(tf.tf * wt.w)::BIGINT AS score
    FROM tf JOIN wt USING (token)
    GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT {k}
    """


def search_bm25_sql(
    table: str,
    terms: list[str],
    k: int = 10,
    k1_milli: int = 1200,
    b_milli: int = 750,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Replica of analysis/search.search_bm25 (fixed-point int64 BM25;
    N is the corpus row count, computed in SQL — the Spark side passes
    the same value as a literal)."""
    uniq = sorted({t.lower() for t in terms})
    toks = _TOKS.format(col=text_col)
    lits = ", ".join(f"'{t}'" for t in uniq)
    return f"""
    WITH bstats AS (
      SELECT greatest((1000 * sum(len(t))) // count(*), 1)::BIGINT AS avgdl_m
      FROM (SELECT {toks} AS t FROM {table})
    ), btf AS (
      SELECT doc_id, dl, token, count(*)::BIGINT AS tf
      FROM (SELECT {id_col} AS doc_id, len(t)::BIGINT AS dl,
                   unnest(t) AS token
            FROM (SELECT {id_col}, {toks} AS t FROM {table}))
      WHERE token IN ({lits})
      GROUP BY doc_id, dl, token
    ), bwt AS (
      SELECT token,
             (length(bin(greatest(
                (SELECT count(*) FROM {table}) // count(*), 1))) - 1
             )::BIGINT AS w
      FROM btf GROUP BY token
    ), bparts AS (
      SELECT doc_id, w,
             (tf * {1000 + k1_milli} * 1000) //
             (tf * 1000 + ({k1_milli} *
                (1000 - {b_milli} + ({b_milli} * dl * 1000) // avgdl_m)
             ) // 1000) AS part_m
      FROM btf JOIN bwt USING (token), bstats
    )
    SELECT doc_id, count(*)::BIGINT AS n_terms_hit,
           sum(w * part_m)::BIGINT AS score_milli
    FROM bparts
    GROUP BY doc_id
    ORDER BY score_milli DESC, doc_id LIMIT {k}
    """


# ------------------------------------------------------- token chunking


def chunk_tokens_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = 128,
    stride: int = 96,
) -> str:
    """Replica of analysis/packing.chunk_tokens (fixed-size overlapping
    token windows; integer boundary arithmetic)."""
    toks = _TOKS.format(col=text_col)
    return f"""
    SELECT doc_id,
           i::BIGINT AS chunk_id,
           len(t[i*{stride}+1 : i*{stride}+{chunk}])::BIGINT
             AS n_chunk_tokens,
           array_to_string(t[i*{stride}+1 : i*{stride}+{chunk}], ' ')
             AS chunk_text
    FROM (
      SELECT doc_id, t,
             unnest(range(0, 1 + (greatest(len(t) - {chunk}, 0)
                                  + {stride} - 1) // {stride})) AS i
      FROM (SELECT {id_col} AS doc_id, {toks} AS t FROM {table})
      WHERE len(t) > 0
    )
    """


# --------------------------------------------------- quantized ANN top-k


def ann_topk_quantized_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: int = 0,
    k: int = 10,
    frac_bits: int = 8,
) -> str:
    """Replica of analysis/similarity.ann_topk_quantized: integer
    fixed-point dot-product top-k, query = the row with id ``query_id``.
    No rounding anywhere — the scores are exact int64 on both engines."""
    s = float(1 << frac_bits)
    return f"""
    SELECT {id_col}, qscore FROM (
      SELECT e.{id_col},
             CAST(list_sum(list_transform(range(1, len(e.{vec_col}) + 1),
               i -> CAST(floor(CAST(e.{vec_col}[i] AS DOUBLE) * {s}) AS BIGINT)
                    * q.qv[i])) AS BIGINT) AS qscore
      FROM {table} e, (
        SELECT list_transform(CAST({vec_col} AS DOUBLE[]),
                 x -> CAST(floor(x * {s}) AS BIGINT)) AS qv
        FROM {table} WHERE {id_col} = {query_id}) q
    ) ORDER BY qscore DESC, {id_col} LIMIT {k}
    """


# ------------------------------------------------------- line dedup


def line_dedup_sql(
    source_sql: str, text_col: str = "text", max_doc_freq: int = 2
) -> str:
    """Replica of analysis/cleaning.line_dedup over ``source_sql`` (plain
    nested subqueries, composable after a WITH chain like c4_line_clean_sql)."""
    split = (
        f"SELECT doc_id, string_split(coalesce({text_col}, ''), chr(10)) "
        f"AS ls FROM {source_sql}"
    )
    lex = (
        f"SELECT doc_id, unnest(ls) AS line, "
        f"unnest(range(1, len(ls) + 1)) AS pos FROM ({split})"
    )
    return f"""
    SELECT d.doc_id,
           coalesce(a.ct, '') AS clean_text,
           len(d.ls)::BIGINT AS n_lines,
           coalesce(a.nk, 0)::BIGINT AS n_lines_kept
    FROM ({split}) d
    LEFT JOIN (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS ct,
             count(*)::BIGINT AS nk
      FROM ({lex})
      WHERE line NOT IN (
        SELECT line FROM (
          SELECT DISTINCT doc_id, line FROM ({lex}))
        GROUP BY line HAVING count(*) > {max_doc_freq})
      GROUP BY doc_id
    ) a USING (doc_id)
    """


# ------------------------------------------------------- sequence packing


def pack_sequences_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 256,
    n_shards: int = 8,
) -> str:
    """Replica of analysis/packing.pack_sequences — same integer cumsum /
    integer-division pack assignment."""
    toks = _TOKS.format(col=text_col)
    u32 = md5_u32_duckdb(f"CAST({id_col} AS VARCHAR)")
    return f"""
    SELECT doc_id, shard, n_tokens,
           CAST((cum - n_tokens) // {window} AS BIGINT) AS pack_id,
           CAST(row_number() OVER (
             PARTITION BY shard, (cum - n_tokens) // {window}
             ORDER BY doc_id) AS INT) AS pos_in_pack
    FROM (
      SELECT doc_id, shard, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id) AS cum
      FROM (
        SELECT {id_col} AS doc_id,
               len({toks})::BIGINT AS n_tokens,
               CAST({u32} % {n_shards} AS INT) AS shard
        FROM {table})
    )
    """


# ---------------------------------------- BPE pair counts / DSIR importance


def bpe_pair_counts_sql(
    table: str = "documents", text_col: str = "text", k: int = 50
) -> str:
    """Replica of analysis/tokenizer.bpe_pair_counts (no end-of-word
    marker): word-frequency-weighted adjacent character-pair counts,
    top-k by (cnt DESC, pair ASC) — the same total order, so the
    selected set is identical."""
    toks = _TOKS.format(col=text_col)
    return f"""
    WITH btoks AS (
      SELECT {toks} AS t FROM {table}
    ), bwords AS (
      SELECT unnest(t) AS w FROM btoks
    ), bwc AS (
      SELECT w, count(*)::BIGINT AS c FROM bwords GROUP BY 1
    ), bpairs AS (
      SELECT unnest(list_transform(range(1, length(w)),
               i -> substring(w, i, 1) || ' ' || substring(w, i + 1, 1)))
               AS pair,
             c
      FROM bwc WHERE length(w) >= 2
    )
    SELECT pair, sum(c)::BIGINT AS cnt FROM bpairs GROUP BY 1
    ORDER BY cnt DESC, pair LIMIT {k}
    """


def importance_score_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    target_residue_mod: int = 16,
) -> str:
    """Replica of analysis/importance.importance_score with the target
    corpus drawn from the same table by a deterministic doc_id residue
    class (md5_u32(doc_id) % mod == 0 — the closed-form fixture both
    engines compute). Features: hashed word {{1,2}}-gram occurrence
    buckets; integer floor-log2 score, sign-symmetric truncating mean."""
    toks = _TOKS.format(col=text_col)
    h32 = md5_u32_duckdb("gram")
    hid = md5_u32_duckdb(f"CAST({id_col} AS VARCHAR)")
    return f"""
    WITH itoks AS (
      SELECT {id_col} AS doc_id, {toks} AS t FROM {table}
    ), igrams AS (
      SELECT doc_id,
             list_concat(t,
               CASE WHEN len(t) >= 2
                    THEN list_transform(range(0, len(t) - 1),
                         i -> array_to_string(t[i+1:i+2], ' '))
                    ELSE [] END) AS g
      FROM itoks
    ), ifeat AS (
      SELECT doc_id, CAST({h32} % {n_buckets} AS BIGINT) AS bucket
      FROM (SELECT doc_id, unnest(g) AS gram FROM igrams)
    ), irawc AS (
      SELECT bucket, count(*)::BIGINT AS c_raw FROM ifeat GROUP BY 1
    ), itgtc AS (
      SELECT bucket, count(*)::BIGINT AS c_tgt FROM ifeat
      WHERE doc_id IN (
        SELECT {id_col} FROM {table} WHERE {hid} % {target_residue_mod} = 0)
      GROUP BY 1
    ), itot AS (
      SELECT (SELECT sum(c_raw) FROM irawc)::BIGINT AS n_raw,
             coalesce((SELECT sum(c_tgt) FROM itgtc), 0)::BIGINT AS n_tgt
    ), iscore AS (
      SELECT r.bucket,
             ((length(bin(greatest((t.n_raw + {n_buckets})
                   // (r.c_raw + 1), 1))) - 1)
              - (length(bin(greatest((t.n_tgt + {n_buckets})
                   // (coalesce(g.c_tgt, 0) + 1), 1))) - 1))::BIGINT AS s
      FROM irawc r LEFT JOIN itgtc g USING (bucket), itot t
    ), iperdoc AS (
      SELECT doc_id, count(*)::BIGINT AS n_feats,
             sum(s)::BIGINT AS log2_weight
      FROM ifeat JOIN iscore USING (bucket)
      GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(p.n_feats, 0)::BIGINT AS n_feats,
           coalesce(p.log2_weight, 0)::BIGINT AS log2_weight,
           (CASE WHEN coalesce(p.n_feats, 0) > 0 THEN
              CASE WHEN p.log2_weight >= 0
                   THEN (1000 * p.log2_weight) // p.n_feats
                   ELSE -((1000 * -p.log2_weight) // p.n_feats) END
            ELSE 0 END)::BIGINT AS mean_weight_milli
    FROM (SELECT {id_col} AS doc_id FROM {table}) d
    LEFT JOIN iperdoc p USING (doc_id)
    """


# ------------------------------------------------------------ SemDeDup


def semdedup_sql(
    centroids: np.ndarray,
    table: str = "embeddings",
    threshold_ppm: int = 900_000,
    frac_bits: int = 8,
) -> str:
    """Independent replica of analysis/similarity.semantic_dedup:
    argmax-cosine cells (shared float fold of ivf_cell_cte), fixed-point
    quantization, within-cell pairs under the exact HUGEINT threshold
    test (Spark side uses decimal(38,0) — both exact, so the pair set is
    identical), recursive-CTE transitive closure, min-id representative."""
    t = int(threshold_ppm)
    s = float(1 << frac_bits)
    dim = centroids.shape[1]
    dot = " + ".join(f"a.qv[{i + 1}] * b.qv[{i + 1}]" for i in range(dim))
    return f"""
    WITH RECURSIVE {ivf_cell_cte(centroids, table)},
    q AS (
      SELECT vec_id, ivf_cell,
             list_transform(e, x -> CAST(floor(x * {s}) AS BIGINT)) AS qv
      FROM cells
    ),
    n AS (
      SELECT vec_id, ivf_cell, qv,
             CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2
      FROM q
    ),
    pairs AS (
      SELECT a.vec_id AS id_l, b.vec_id AS id_r,
             CAST({dot} AS BIGINT) AS qdot, a.n2 AS nl, b.n2 AS nr
      FROM n a JOIN n b ON a.ivf_cell = b.ivf_cell AND a.vec_id < b.vec_id
    ),
    cand AS (
      SELECT id_l, id_r FROM pairs
      WHERE qdot > 0
        AND CAST(qdot AS HUGEINT) * qdot * 1000000000000
            >= CAST({t} AS HUGEINT) * {t} * nl * nr
    ),
    edges AS (
      SELECT id_l AS a, id_r AS b FROM cand
      UNION
      SELECT id_r, id_l FROM cand
    ),
    reach(node, comp) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
    ),
    cc AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
    SELECT s.vec_id,
           coalesce(c.comp, s.vec_id) AS cluster_id,
           coalesce(c.comp, s.vec_id) <> s.vec_id AS is_dup
    FROM {table} s LEFT JOIN cc c ON c.node = s.vec_id
    """
