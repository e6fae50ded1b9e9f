"""ANSI-SQL oracles (DuckDB-runnable) mirroring every engine query.

The driver runs each Spark query AND the matching SQL here over the
SAME parquet tables and compares row-count + schema + value hash. The
SQL below re-derives the transcript table and the edge table with the
exact expressions of graph/derive.py, then expresses each algorithm:

- closed-form ops (degree, triangles, clustering coefficient) as joins;
- iterative ops (PageRank, WCC, LPA, SSSP, k-core) as UNROLLED chains
  of CTEs — one CTE trio per superstep with the reference's exact
  update rule. Unrolling is valid because the derived graph's directed
  diameter is bounded by design: conversations are capped at
  TURNS_PER_CONV=16 turns (graph/derive.py), so reply chains are <=15
  hops and the longest directed path is <=16; WCC/SSSP fixpoints are
  reached well inside the unroll depths used here, and fixed-round
  algorithms (PageRank 10 supersteps, LPA 10 supersteps) unroll to
  exactly the reference round count.

Float columns are emitted as round(x, 6) on BOTH sides (Spark + SQL):
the per-vertex math is identical, but aggregation order differs between
engines, so raw doubles differ at ~1e-13 relative — rounding makes the
value-hash comparison robust while still asserting 6 significant
decimal digits. PageRank additionally scales by N (ranks are O(1/N))
so the rounded comparison asserts ~6 significant digits, not absolute
decimals on tiny values.
"""

from __future__ import annotations

ALPHA = 0.15
K_CORE_K = 3

# ---------------------------------------------------------------------------
# Base CTEs: events -> transcripts -> turns -> edges/nodes
# (must stay expression-identical to graph/derive.py)
# ---------------------------------------------------------------------------

BASE = """
events_seq AS MATERIALIZED (
  SELECT *,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS seq
  FROM events
),
transcripts AS MATERIALIZED (
  SELECT
    'conv_' || lpad(CAST(user_id AS VARCHAR), 6, '0') || '_' ||
      lpad(CAST(CAST(FLOOR(seq / 16) AS INTEGER) AS VARCHAR), 4, '0') AS conv_id,
    CAST(seq % 16 AS INTEGER) AS turn_idx,
    CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'assistant'
         WHEN 'signup' THEN 'system' WHEN 'purchase' THEN 'agent_0'
         ELSE 'agent_1' END AS role,
    CASE event_type WHEN 'click' THEN 'search' WHEN 'purchase' THEN 'sql'
         WHEN 'error' THEN 'code' ELSE NULL END AS tool,
    ts
  FROM events_seq
),
turns AS MATERIALIZED (
  SELECT conv_id, turn_idx, role, tool,
         conv_id || '#' || lpad(CAST(turn_idx AS VARCHAR), 2, '0') AS node
  FROM transcripts
),
reply_e AS (
  SELECT src, dst, 1.0 AS weight, 'reply' AS etype FROM (
    SELECT lag(node) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS src,
           node AS dst
    FROM turns
  ) WHERE src IS NOT NULL
),
mention_e AS (
  SELECT node AS src, 'tool:' || tool AS dst, 1.0 AS weight, 'mention' AS etype
  FROM turns WHERE tool IS NOT NULL
),
uses_e AS (
  SELECT 'role:' || role AS src, 'tool:' || tool AS dst,
         CAST(count(*) AS DOUBLE) AS weight, 'uses' AS etype
  FROM turns WHERE tool IS NOT NULL GROUP BY 1, 2
),
copart_e AS (
  SELECT 'role:' || r.role AS src, 'tool:' || t.tool AS dst,
         CAST(count(*) AS DOUBLE) AS weight, 'copart' AS etype
  FROM (SELECT DISTINCT conv_id, role FROM turns) r
  JOIN (SELECT DISTINCT conv_id, tool FROM turns WHERE tool IS NOT NULL) t
    ON r.conv_id = t.conv_id
  GROUP BY 1, 2
),
edges AS MATERIALIZED (
  SELECT * FROM reply_e UNION ALL SELECT * FROM mention_e
  UNION ALL SELECT * FROM uses_e UNION ALL SELECT * FROM copart_e
),
nodes AS MATERIALIZED (
  SELECT DISTINCT node AS id FROM turns
  UNION SELECT DISTINCT 'role:' || role FROM turns
  UNION SELECT DISTINCT 'tool:' || tool FROM turns WHERE tool IS NOT NULL
),
outdeg AS MATERIALIZED (
  SELECT n.id, coalesce(d.c, 0) AS outdeg
  FROM nodes n LEFT JOIN (SELECT src, count(*) AS c FROM edges GROUP BY src) d
    ON n.id = d.src
),
und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
  ) WHERE src <> dst
)
"""


def _with(extra: str, select: str) -> str:
    return f"WITH {BASE.strip()},\n{extra}\n{select}"


def transcript_derivation() -> str:
    return (
        f"WITH {BASE.strip()} "
        "SELECT conv_id, turn_idx, role, "
        "'t:' || conv_id || ':' || CAST(turn_idx AS VARCHAR) AS text, tool "
        "FROM transcripts"
    )


def edge_derivation() -> str:
    return f"WITH {BASE.strip()} SELECT src, dst, round(weight, 6) AS weight, etype FROM edges"


def nodes_query() -> str:
    return f"WITH {BASE.strip()} SELECT id FROM nodes"


def degree_centrality() -> str:
    return (
        f"WITH {BASE.strip()} "
        "SELECT id, CAST(outdeg AS DOUBLE) AS degree FROM outdeg"
    )


def degree_weighted() -> str:
    extra = """
wdeg AS (SELECT src, sum(coalesce(weight, 1.0)) AS w FROM edges GROUP BY src)
"""
    return _with(
        extra.strip(),
        "SELECT n.id, round(coalesce(d.w, 0.0), 6) AS degree "
        "FROM nodes n LEFT JOIN wdeg d ON n.id = d.src",
    )


def degree_in() -> str:
    """degree_centrality over the `input.edge_direction=IN` loader view
    (Graph.in_direction, ComputerOptions.java:147-156): the edge list is
    dst->src, so the out-degree of the view is the in-degree of the
    stored graph."""
    extra = "indeg AS (SELECT dst, count(*) AS d FROM edges GROUP BY dst)"
    return _with(
        extra,
        "SELECT n.id, CAST(coalesce(i.d, 0) AS DOUBLE) AS degree "
        "FROM nodes n LEFT JOIN indeg i ON n.id = i.dst",
    )


def _pagerank_parts(update_rounds: int, alpha: float) -> list[str]:
    """Shared unroll: s0 init + update_rounds rounds of
    PageRank.java:90-92 with previous-round aggregates; s{r} is the
    state after engine superstep r."""
    parts = [
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "s0 AS MATERIALIZED (SELECT id, outdeg, 1.0 / (SELECT n FROM nn) AS rank FROM outdeg)",
    ]
    for r in range(update_rounds):
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT sum(rank) AS cum, "
            f"sum(CASE WHEN outdeg = 0 THEN rank ELSE 0.0 END) AS dang FROM s{r})"
        )
        parts.append(
            f"m{r} AS MATERIALIZED (SELECT e.dst AS id, sum(s.rank / s.outdeg) AS msum "
            f"FROM s{r} s JOIN edges e ON s.id = e.src WHERE s.outdeg > 0 "
            f"GROUP BY e.dst)"
        )
        parts.append(
            f"s{r + 1} AS MATERIALIZED (SELECT s.id, s.outdeg, "
            f"((a.dang / (SELECT n FROM nn) + coalesce(m.msum, 0.0)) * {1.0 - alpha!r} "
            f"+ {alpha!r} / (SELECT n FROM nn)) / a.cum AS rank "
            f"FROM s{r} s CROSS JOIN a{r} a LEFT JOIN m{r} m ON s.id = m.id)"
        )
    return parts


def pagerank(supersteps: int = 10, alpha: float = ALPHA) -> str:
    """Unrolled reference PageRank: superstep 0 init + (supersteps-1)
    update rounds of PageRank.java:90-92 with previous-round aggregates."""
    parts = _pagerank_parts(supersteps - 1, alpha)
    final = supersteps - 1
    return _with(
        ",\n".join(parts),
        f"SELECT id, round(rank * (SELECT n FROM nn), 6) AS rank_x_n FROM s{final}",
    )


def pagerank_converged(
    l1_tol: float = 1e-6, max_steps: int = 40, alpha: float = ALPHA
) -> str:
    """Dynamic-halt PageRank — the reference's master halt rule
    (PageRank4Master.java:99-104: superstep > 1 AND l1 <= threshold)
    in pure SQL: unroll max_steps update rounds, compute every round's
    L1 against the previous state, and return the state at the FIRST
    superstep s >= 2 whose L1 meets the tolerance — exactly the
    superstep at which the engine's runner halts, so the selected state
    matches the engine's returned state vertex-for-vertex.

    max_steps bounds the unroll (the gate graph converges at ~20
    supersteps; the conversation-length cap keeps topology stable
    across scale factors). If no unrolled step converges the final
    select yields ZERO rows and the gate fails loudly on row count
    rather than silently comparing a wrong state."""
    parts = _pagerank_parts(max_steps - 1, alpha)
    l1_rows = " UNION ALL ".join(
        f"SELECT {k} AS step, (SELECT sum(abs(a.rank - b.rank)) "
        f"FROM s{k} a JOIN s{k - 1} b ON a.id = b.id) AS l1"
        for k in range(2, max_steps)
    )
    parts.append(f"l1s AS MATERIALIZED ({l1_rows})")
    parts.append(
        f"halt AS (SELECT min(step) AS hs FROM l1s WHERE l1 <= {l1_tol!r})"
    )
    all_states = " UNION ALL ".join(
        f"SELECT {k} AS step, id, rank FROM s{k}" for k in range(max_steps)
    )
    parts.append(f"allst AS ({all_states})")
    return _with(
        ",\n".join(parts),
        "SELECT id, round(rank * (SELECT n FROM nn), 6) AS rank_x_n "
        "FROM allst WHERE step = (SELECT hs FROM halt)",
    )


def wcc(rounds: int = 24) -> str:
    """Unrolled full min-relaxation. Same fixpoint as the reference's
    message passing (Wcc.java:47-72): comp*(v) = min over v and all
    directed ancestors u of min(u, out-nbrs(u)). `rounds` must exceed
    the longest directed path (<=16 by construction)."""
    parts = [
        "w0 AS MATERIALIZED (SELECT n.id, least(n.id, coalesce(mn.m, n.id)) AS comp "
        "FROM nodes n LEFT JOIN (SELECT src, min(dst) AS m FROM edges GROUP BY src) mn "
        "ON n.id = mn.src)"
    ]
    for r in range(rounds):
        parts.append(
            f"w{r + 1} AS MATERIALIZED (SELECT w.id, least(w.comp, coalesce(im.m, w.comp)) AS comp "
            f"FROM w{r} w LEFT JOIN ("
            f"SELECT e.dst AS id, min(s.comp) AS m FROM w{r} s "
            f"JOIN edges e ON s.id = e.src GROUP BY e.dst) im ON w.id = im.id)"
        )
    return _with(",\n".join(parts), f"SELECT id, comp FROM w{rounds}")


def wcc_undirected(rounds: int = 24) -> str:
    """Unrolled min-relaxation over the SYMMETRIZED edge set: comp*(v) =
    min id in v's weakly-connected component — the fixpoint
    algorithms/cc_fast.py reaches in O(log d) pointer-jumping rounds.
    One-hop relaxation here needs `rounds` >= the undirected diameter
    (hub vertices keep it far under 24 on the derived graph; the gate's
    hash comparison against the Spark fixpoint would flag any shortfall)."""
    parts = [
        "ue AS MATERIALIZED (SELECT src, dst FROM edges "
        "UNION ALL SELECT dst AS src, src AS dst FROM edges)",
        "u0 AS MATERIALIZED (SELECT n.id, least(n.id, coalesce(mn.m, n.id)) AS comp "
        "FROM nodes n LEFT JOIN (SELECT src, min(dst) AS m FROM ue GROUP BY src) mn "
        "ON n.id = mn.src)",
    ]
    for r in range(rounds):
        parts.append(
            f"u{r + 1} AS MATERIALIZED (SELECT u.id, least(u.comp, coalesce(im.m, u.comp)) AS comp "
            f"FROM u{r} u LEFT JOIN ("
            f"SELECT e.dst AS id, min(s.comp) AS m FROM u{r} s "
            f"JOIN ue e ON s.id = e.src GROUP BY e.dst) im ON u.id = im.id)"
        )
    return _with(",\n".join(parts), f"SELECT id, comp FROM u{rounds}")


def lpa(supersteps: int = 10) -> str:
    """Unrolled reference LPA (Lpa.java:50-101): superstep 0 broadcast +
    (supersteps-1) vote rounds; only message recipients vote and resend."""
    parts = ["l0 AS MATERIALIZED (SELECT id, id AS label, TRUE AS sent FROM nodes)"]
    for r in range(1, supersteps):
        parts.append(
            f"v{r} AS MATERIALIZED (SELECT e.dst AS id, s.label, count(*) AS freq "
            f"FROM l{r - 1} s JOIN edges e ON s.id = e.src WHERE s.sent "
            f"GROUP BY e.dst, s.label)"
        )
        parts.append(
            f"p{r} AS MATERIALIZED (SELECT id, label FROM ("
            f"SELECT id, label, row_number() OVER "
            f"(PARTITION BY id ORDER BY freq DESC, label ASC) AS rn FROM v{r}"
            f") WHERE rn = 1)"
        )
        parts.append(
            f"l{r} AS MATERIALIZED (SELECT l.id, coalesce(p.label, l.label) AS label, "
            f"p.label IS NOT NULL AS sent "
            f"FROM l{r - 1} l LEFT JOIN p{r} p ON l.id = p.id)"
        )
    return _with(",\n".join(parts), f"SELECT id, label FROM l{supersteps - 1}")


def triangle_count() -> str:
    extra = """
cand AS (
  SELECT e1.src AS v, e2.dst AS w
  FROM und e1 JOIN und e2 ON e1.dst = e2.src AND e2.dst < e2.src
),
tri AS (
  SELECT c.v, count(*) AS t
  FROM cand c JOIN und e3 ON c.v = e3.src AND c.w = e3.dst
  GROUP BY c.v
)
"""
    return _with(
        extra.strip(),
        "SELECT n.id, CAST(coalesce(t.t, 0) AS BIGINT) AS triangles "
        "FROM nodes n LEFT JOIN tri t ON n.id = t.v",
    )


def clustering_coefficient() -> str:
    extra = """
cand AS (
  SELECT e1.src AS v, e2.dst AS w
  FROM und e1 JOIN und e2 ON e1.dst = e2.src AND e2.dst < e2.src
),
tri AS (
  SELECT c.v, count(*) AS t
  FROM cand c JOIN und e3 ON c.v = e3.src AND c.w = e3.dst
  GROUP BY c.v
),
undeg AS (SELECT src AS id, count(*) AS deg FROM und GROUP BY src)
"""
    return _with(
        extra.strip(),
        "SELECT n.id, CAST(coalesce(t.t, 0) AS BIGINT) AS triangles, "
        "CAST(coalesce(d.deg, 0) AS BIGINT) AS degree, "
        "round(CASE WHEN coalesce(d.deg, 0) >= 2 "
        "THEN 2.0 * coalesce(t.t, 0) / (d.deg * (d.deg - 1)) ELSE 0.0 END, 6) "
        "AS coefficient "
        "FROM nodes n LEFT JOIN tri t ON n.id = t.v LEFT JOIN undeg d ON n.id = d.id",
    )


SSSP_SOURCE_SQL = "(SELECT min(id) FROM nodes WHERE id LIKE 'conv%')"


def sssp(rounds: int = 24) -> str:
    """Unrolled Bellman-Ford relaxation from the lexicographically first
    turn node; NULL = unreached, -1.0 in the output (Sssp.java:58)."""
    parts = [
        f"d0 AS MATERIALIZED (SELECT id, CASE WHEN id = {SSSP_SOURCE_SQL} THEN 0.0 END AS dist "
        f"FROM nodes)"
    ]
    for r in range(rounds):
        parts.append(
            f"d{r + 1} AS MATERIALIZED (SELECT d.id, "
            f"CASE WHEN im.m IS NOT NULL AND (d.dist IS NULL OR im.m < d.dist) "
            f"THEN im.m ELSE d.dist END AS dist "
            f"FROM d{r} d LEFT JOIN ("
            f"SELECT e.dst AS id, min(s.dist + coalesce(e.weight, 1.0)) AS m "
            f"FROM d{r} s JOIN edges e ON s.id = e.src WHERE s.dist IS NOT NULL "
            f"GROUP BY e.dst) im ON d.id = im.id)"
        )
    return _with(
        ",\n".join(parts),
        f"SELECT id, coalesce(round(dist, 6), -1.0) AS dist FROM d{rounds}",
    )


def kcore(rounds: int = 16, k: int = K_CORE_K) -> str:
    """Unrolled reference peel (KCore.java:55-92): core=outdeg; <k ->
    zero + notify out-targets; survivors decrement by deletion count."""
    parts = [
        f"k0 AS MATERIALIZED (SELECT id, CASE WHEN outdeg < {k} THEN 0 ELSE outdeg END AS core, "
        f"outdeg >= {k} AS alive, outdeg < {k} AS jd FROM outdeg)"
    ]
    for r in range(rounds):
        parts.append(
            f"k{r + 1} AS MATERIALIZED (SELECT kk.id, "
            f"CASE WHEN NOT kk.alive THEN kk.core "
            f"WHEN h.hits IS NOT NULL AND kk.core - h.hits < {k} THEN 0 "
            f"WHEN h.hits IS NOT NULL THEN kk.core - h.hits "
            f"ELSE kk.core END AS core, "
            f"kk.alive AND NOT (h.hits IS NOT NULL AND kk.core - h.hits < {k}) AS alive, "
            f"kk.alive AND h.hits IS NOT NULL AND kk.core - h.hits < {k} AS jd "
            f"FROM k{r} kk LEFT JOIN ("
            f"SELECT e.dst AS id, count(*) AS hits FROM k{r} s "
            f"JOIN edges e ON s.id = e.src WHERE s.jd GROUP BY e.dst) h "
            f"ON kk.id = h.id)"
        )
    return _with(
        ",\n".join(parts),
        f"SELECT id, CAST(core AS BIGINT) AS core FROM k{rounds}",
    )


# ---------------------------------------------------------------------------
# Training-data pipeline oracles (documents / embeddings tables)
# ---------------------------------------------------------------------------

_STOP_SQL = "('a','the','of','and','in','to','is')"


def token_stats() -> str:
    return (
        "SELECT doc_id, "
        "CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens, "
        "CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct_tokens, "
        "CAST(length(text) AS BIGINT) AS n_chars_measured "
        "FROM documents"
    )


def quality_score() -> str:
    t = "string_split(text,' ')"
    n = f"CAST(len({t}) AS DOUBLE)"
    distinct_ratio = f"len(list_distinct({t})) / {n}"
    stop_ratio = f"CAST(len(list_filter({t}, x -> x IN {_STOP_SQL})) AS DOUBLE) / {n}"
    score = (
        f"0.4 * least({n} / 50.0, 1.0) + 0.3 * ({distinct_ratio}) "
        f"+ 0.3 * (1.0 - ({stop_ratio}))"
    )
    return (
        f"SELECT doc_id, round({distinct_ratio}, 6) AS distinct_ratio, "
        f"round({stop_ratio}, 6) AS stopword_ratio, "
        f"round({score}, 6) AS quality FROM documents"
    )


def lang_id() -> str:
    t = "string_split(text,' ')"
    sr = f"CAST(len(list_filter({t}, x -> x IN {_STOP_SQL})) AS DOUBLE) / len({t})"
    return (
        f"SELECT doc_id, "
        f"CASE WHEN ({sr}) > 0.05 THEN 'en' ELSE 'unk' END AS predicted_lang, "
        f"round({sr}, 6) AS stopword_ratio FROM documents"
    )


def doc_fingerprint() -> str:
    t = "string_split(text,' ')"
    return (
        f"SELECT doc_id, md5(text) AS content_md5, "
        f"list_aggregate(list_transform({t}, x -> md5(x)), 'min') AS min_token_md5 "
        f"FROM documents"
    )


def dedup_exact() -> str:
    return (
        "SELECT doc_id, content_md5, "
        "min(doc_id) OVER (PARTITION BY content_md5) AS canonical_id, "
        "doc_id <> min(doc_id) OVER (PARTITION BY content_md5) AS is_duplicate "
        "FROM (SELECT doc_id, md5(text) AS content_md5 FROM documents)"
    )


# word-3gram shingles as a DuckDB list expression (independent formulation
# from the Spark positional self-join -- agreement is stronger evidence)
_SHINGLES = """
shingles AS MATERIALIZED (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(
      range(1, greatest(len(toks) - 1, 1)),
      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
    )) AS shingle
    FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents)
    WHERE len(toks) >= 3
  )
)
"""


def ngram_jaccard(threshold: float = 0.4) -> str:
    return f"""
WITH {_SHINGLES.strip()},
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS common
  FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.a, c.b,
       round(CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common), 6) AS jaccard
FROM common c JOIN sizes sa ON c.a = sa.doc_id JOIN sizes sb ON c.b = sb.doc_id
WHERE round(CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common), 6) >= {threshold}
"""


def dedup_clusters(threshold: float = 0.4, rounds: int = 24) -> str:
    """Near-dup cluster assignment: the ngram_jaccard pair CTE feeds an
    unrolled undirected min-relaxation over doc ids (same pattern as
    wcc_undirected) — canonical = min doc_id per pair-graph component,
    singletons self-canonical. `rounds` must cover the largest
    cluster's min-id eccentricity (24 matches wcc_undirected's bar —
    far above the <=4-hop clusters the synthetic corpora produce; a
    larger sf would need `rounds` raised with it); the gate hash
    against the Spark pointer-jumping fixpoint (pipeline/dedup.py
    dedup_clusters) flags any shortfall as a mismatch, never silently."""
    parts = [
        _SHINGLES.strip(),
        "sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id)",
        "common AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS common "
        "FROM shingles a JOIN shingles b ON a.shingle = b.shingle "
        "AND a.doc_id < b.doc_id GROUP BY 1, 2)",
        "pairs AS MATERIALIZED (SELECT c.a, c.b FROM common c "
        "JOIN sizes sa ON c.a = sa.doc_id JOIN sizes sb ON c.b = sb.doc_id "
        "WHERE round(CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common), 6) "
        f">= {threshold})",
        "up AS MATERIALIZED (SELECT a AS src, b AS dst FROM pairs "
        "UNION ALL SELECT b AS src, a AS dst FROM pairs)",
        "c0 AS MATERIALIZED (SELECT d.doc_id AS id, "
        "least(d.doc_id, coalesce(mn.m, d.doc_id)) AS comp "
        "FROM documents d LEFT JOIN "
        "(SELECT src, min(dst) AS m FROM up GROUP BY src) mn "
        "ON d.doc_id = mn.src)",
    ]
    for r in range(rounds):
        parts.append(
            f"c{r + 1} AS MATERIALIZED (SELECT u.id, "
            f"least(u.comp, coalesce(im.m, u.comp)) AS comp "
            f"FROM c{r} u LEFT JOIN ("
            f"SELECT e.dst AS id, min(s.comp) AS m FROM c{r} s "
            f"JOIN up e ON s.id = e.src GROUP BY e.dst) im ON u.id = im.id)"
        )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT id AS doc_id, comp AS canonical_id,
       count(*) OVER (PARTITION BY comp) AS cluster_size,
       id <> comp AS is_duplicate
FROM c{rounds}
"""
    )


# portable 60-bit hash: identical to Spark's
# conv(substr(md5(x),1,15),16,10) — used by minhash/simhash/walks oracles
_MD5LONG = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"
_MERSENNE = (1 << 31) - 1


def minhash_lsh(
    num_perm: int = 32, bands: int = 8, threshold: float = 0.4
) -> str:
    """Mirror of pipeline/dedup.py minhash_lsh_pairs: md5-based shingle
    hash -> fixed-seed universal-hash minima -> banded md5 buckets ->
    candidate self-join on (band, bucket) -> exact Jaccard restricted to
    candidates. Coefficients come from the same random.Random(42) stream
    as the Spark side."""
    from hugegraph_computer_spark.pipeline.dedup import minhash_coefficients

    coeffs = minhash_coefficients(num_perm)
    p = _MERSENNE
    rows_per_band = num_perm // bands
    mins = ", ".join(
        f"min((h * {a} + {b}) % {p}) AS s{i}" for i, (a, b) in enumerate(coeffs)
    )
    band_selects = []
    for bi in range(bands):
        slice_concat = " || ',' || ".join(
            f"CAST(s{bi * rows_per_band + j} AS VARCHAR)"
            for j in range(rows_per_band)
        )
        bucket = _MD5LONG.format(x=f"({slice_concat})")
        band_selects.append(
            f"SELECT doc_id, {bi} AS band, {bucket} AS bucket FROM sig"
        )
    bands_sql = " UNION ALL ".join(band_selects)
    h = _MD5LONG.format(x="shingle")
    return f"""
WITH {_SHINGLES.strip()},
hh AS MATERIALIZED (SELECT doc_id, {h} % {p} AS h FROM shingles),
sig AS MATERIALIZED (SELECT doc_id, {mins} FROM hh GROUP BY doc_id),
bandrows AS MATERIALIZED ({bands_sql}),
cand AS MATERIALIZED (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bandrows l JOIN bandrows r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
common AS (
  SELECT c.a, c.b, count(*) AS common
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.a
  JOIN shingles sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
  GROUP BY c.a, c.b
)
SELECT c.a, c.b,
       round(CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common), 6) AS jaccard
FROM common c JOIN sizes sa ON c.a = sa.doc_id JOIN sizes sb ON c.b = sb.doc_id
WHERE round(CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common), 6) >= {threshold}
"""


def simhash(bits: int = 32) -> str:
    """Mirror of pipeline/dedup.py simhash: per-bit majority vote over
    md5-long token hashes."""
    h = _MD5LONG.format(x="w")
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    recompose = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(bits)
    )
    return f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
hh AS (SELECT doc_id, {h} AS h FROM tok),
bs AS (SELECT doc_id, {bit_sums} FROM hh GROUP BY doc_id)
SELECT doc_id, CAST({recompose} AS BIGINT) AS simhash FROM bs
"""


_COS = (
    "list_sum(list_transform(range(1, len({a})+1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) "
    "/ (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) "
    "* sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))"
)


def ann_topk(n_queries: int = 5, k: int = 10) -> str:
    cos = _COS.format(a="q.qe", b="e.embedding")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, round({cos}, 4) AS cosine
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT *, row_number() OVER
    (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def ann_topk_ivf(
    n_queries: int = 5, k: int = 10, n_clusters: int = 4, dim: int = 64
) -> str:
    """Mirror of pipeline/similarity.py ann_topk_ivf: same fixed-seed
    centroids, same argmax-as-CASE assignment (list_sum fold order
    matches Spark's aggregate fold), probe = the query's own cell."""
    from hugegraph_computer_spark.pipeline.similarity import (
        _centroids,
        ivf_assign_case,
    )

    dots = []
    for c in _centroids(dim, n_clusters):
        lits = ", ".join(repr(float(x)) for x in c)
        dots.append(
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"j -> CAST(embedding[j] AS DOUBLE) * ([{lits}])[j]))"
        )
    assign = ivf_assign_case(dots) if n_clusters > 1 else "0"
    cos = _COS.format(a="q.qe", b="e.embedding")
    return f"""
WITH assigned AS MATERIALIZED (
  SELECT vec_id, embedding, {assign} AS cluster FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qe, cluster FROM assigned
      WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, round({cos}, 4) AS cosine
  FROM q JOIN assigned e ON q.cluster = e.cluster
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT *, row_number() OVER
    (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def cosine_neardup(threshold: float = 0.9) -> str:
    cos = _COS.format(a="l.embedding", b="r.embedding")
    return f"""
SELECT l.vec_id AS a, r.vec_id AS b, round({cos}, 4) AS cosine
FROM embeddings l CROSS JOIN embeddings r
WHERE l.vec_id < r.vec_id AND round({cos}, 4) >= {threshold}
"""


def cosine_neardup_lsh(
    threshold: float = 0.4, dim: int = 64, n_planes: int = 6
) -> str:
    """Mirror of pipeline/similarity.py cosine_neardup_pairs: candidates
    share the full random-hyperplane sign pattern (same fixed-seed
    planes as the Spark side), exact cosine verified inside buckets."""
    from hugegraph_computer_spark.pipeline.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes)
    bits = []
    for i, p in enumerate(planes):
        lits = ", ".join(repr(float(x)) for x in p)
        dot = (
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"j -> CAST(embedding[j] AS DOUBLE) * ([{lits}])[j]))"
        )
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
    bucket = " + ".join(bits)
    cos = _COS.format(a="l.embedding", b="r.embedding")
    return f"""
WITH bkt AS MATERIALIZED (
  SELECT vec_id, embedding, CAST({bucket} AS INTEGER) AS bucket FROM embeddings
)
SELECT l.vec_id AS a, r.vec_id AS b, round({cos}, 4) AS cosine
FROM bkt l JOIN bkt r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
WHERE round({cos}, 4) >= {threshold}
"""


# ---------------------------------------------------------------------------
# PPR / closeness / rings oracles
# ---------------------------------------------------------------------------

PPR_SOURCE = "role:user"


def ppr(supersteps: int = 10, alpha: float = 0.85, source: str = PPR_SOURCE) -> str:
    """Unrolled PersonalPageRank.java:96-144: recipients-ever-awake set,
    per-superstep cumulative normalization over computing vertices."""
    src = f"'{source}'"
    parts = [
        f"p0 AS MATERIALIZED (SELECT id, outdeg, "
        f"CASE WHEN id = {src} THEN 1.0 ELSE 0.0 END AS rank, "
        f"id = {src} AND outdeg > 0 AS awake, TRUE AS computed FROM outdeg)",
    ]
    for r in range(supersteps - 1):
        parts.append(
            f"pc{r} AS MATERIALIZED (SELECT sum(CASE WHEN computed THEN rank ELSE 0.0 END) AS c FROM p{r})"
        )
        parts.append(
            f"pm{r} AS MATERIALIZED (SELECT e.dst AS id, sum(s.rank / s.outdeg) AS m "
            f"FROM p{r} s JOIN edges e ON s.id = e.src "
            f"WHERE s.computed AND s.outdeg > 0 GROUP BY e.dst)"
        )
        parts.append(
            f"p{r + 1} AS MATERIALIZED (SELECT p.id, p.outdeg, "
            f"CASE WHEN p.awake OR m.m IS NOT NULL THEN "
            f"(coalesce(m.m, 0.0) * {alpha!r} + {1.0 - alpha!r} * "
            f"(CASE WHEN p.id = {src} THEN 1.0 ELSE 0.0 END)) / c.c "
            f"ELSE p.rank END AS rank, "
            f"p.awake OR m.m IS NOT NULL AS awake, "
            f"p.awake OR m.m IS NOT NULL AS computed "
            f"FROM p{r} p CROSS JOIN pc{r} c LEFT JOIN pm{r} m ON p.id = m.id)"
        )
    return _with(
        ",\n".join(parts),
        f"SELECT id, round(rank, 9) AS rank FROM p{supersteps - 1}",
    )


def ppr_topk(
    supersteps: int = 10,
    alpha: float = 0.85,
    source: str = PPR_SOURCE,
    k: int = 100,
) -> str:
    """PersonalPageRankListOutput mirror: top-k by (rounded rank desc,
    id), after dropping the source and its direct out-edge targets
    (ListOutput.java:52-57, TOP_N=100)."""
    inner = ppr(supersteps=supersteps, alpha=alpha, source=source)
    src = f"'{source}'"
    return (
        f"SELECT id, rank FROM ({inner}) "
        f"WHERE id <> {src} AND id NOT IN "
        f"(SELECT DISTINCT e.dst FROM ({edges_view()}) e WHERE e.src = {src}) "
        f"ORDER BY rank DESC, id LIMIT {k}"
    )


def edges_view() -> str:
    """The derived edge table as a standalone subquery (for composition
    outside the shared WITH block)."""
    return f"WITH {BASE.strip()} SELECT * FROM edges"


VPROPS = """
vprops AS (
  SELECT id,
    CASE WHEN id LIKE 'role:%' THEN 'role'
         WHEN id LIKE 'tool:%' THEN 'tool' ELSE 'turn' END AS label,
    CASE WHEN id LIKE 'role:%' OR id LIKE 'tool:%'
         THEN substr(id, 6) ELSE NULL END AS name,
    CASE WHEN id LIKE 'role:%' OR id LIKE 'tool:%'
         THEN NULL ELSE CAST(split_part(id, '#', 2) AS INTEGER) END AS turn_idx
  FROM nodes
)
"""


def subgraph_labeled() -> str:
    """Property-constrained SubGraphMatch mirror (QueryGraph.java
    vertex/edge describes with property_filter): early turns a
    (turn_idx <= 2) -reply-> b, b -mention-> t where t is the search or
    sql tool. Variable predicates run over the same vprops derivation
    as algorithms/subgraph.vertex_properties."""
    extra = (
        VPROPS.strip()
        + """,
va AS (SELECT id FROM vprops WHERE label = 'turn' AND turn_idx <= 2),
vt AS (SELECT id FROM vprops WHERE label = 'tool' AND name IN ('search', 'sql')),
e1 AS (SELECT DISTINCT src AS a, dst AS b FROM edges WHERE etype = 'reply'),
e2 AS (SELECT DISTINCT src AS b, dst AS t FROM edges
       WHERE etype = 'mention' AND weight >= 1.0)
"""
    )
    return _with(
        extra.strip(),
        "SELECT DISTINCT e1.a, e1.b, e2.t FROM e1 "
        "JOIN e2 ON e1.b = e2.b "
        "JOIN va ON e1.a = va.id JOIN vt ON e2.t = vt.id "
        "WHERE e1.a <> e1.b AND e1.a <> e2.t AND e1.b <> e2.t",
    )


def multimodal_png(n: int = 64) -> str:
    """Ground-truth oracle for the REAL PNG header decode: DuckDB
    cannot parse PNG bytes, but the synth generator's dimensions are
    arithmetic in media_id (pipeline/multimodal.synth_media: png rows
    are i % 3 == 0, width 64 + i%8, height 48 + i%5, grayscale-8), so
    the expected table needs no decoding. The Spark side must recover
    exactly these values from the actual IHDR bytes."""
    return (
        f"SELECT CAST(i AS BIGINT) AS media_id, 'image/png' AS mime, "
        f"CAST(64 + i % 8 AS INTEGER) AS width, "
        f"CAST(48 + i % 5 AS INTEGER) AS height, "
        f"CAST(8 AS INTEGER) AS bit_depth "
        f"FROM range(0, {n}) t(i) WHERE i % 3 = 0"
    )


def multimodal_wav(n: int = 64) -> str:
    """Ground-truth oracle for the REAL WAV chunk decode: DuckDB cannot
    parse RIFF bytes, but the synth generator's parameters are
    arithmetic in media_id (pipeline/multimodal.synth_media: wav rows
    are i % 3 == 1, sample_rate 8000 + 1000*(i%5), channels 1 + i%2,
    PCM-16, n_samples 40 + i%9), so the expected table needs no
    decoding. The Spark side must recover exactly these values from the
    actual fmt/data chunks."""
    return (
        f"SELECT CAST(i AS BIGINT) AS media_id, 'audio/wav' AS mime, "
        f"CAST(8000 + 1000 * (i % 5) AS INTEGER) AS sample_rate, "
        f"CAST(1 + i % 2 AS INTEGER) AS channels, "
        f"CAST(16 AS INTEGER) AS bits_per_sample, "
        f"CAST(40 + i % 9 AS BIGINT) AS n_samples, "
        f"round(1000.0 * (40 + i % 9) / (8000 + 1000 * (i % 5)), 6) AS duration_ms "
        f"FROM range(0, {n}) t(i) WHERE i % 3 = 1"
    )


def multimodal_avi(n: int = 64) -> str:
    """Ground-truth oracle for the REAL AVI decode: DuckDB cannot walk
    RIFF trees or average frame bytes, but the synth generator's
    parameters are arithmetic in media_id (pipeline/multimodal.
    synth_media: avi rows are i % 6 == 2, width 16 + i%8, height
    12 + i%5, n_frames 3 + i%4, fps from AVI_FPS_CHOICES by i%5) and
    every pixel of frame f, row y is (i + 7f + y) — the modulus never
    wraps in this range — so the per-frame means close to
    i + 7f + (h-1)/2. The Spark side must recover all of it from the
    actual avih/strf headers and the actual '00db' frame bytes."""
    fps = "list_extract([10,16,20,25,40], (i % 5) + 1)"
    return (
        f"SELECT CAST(i AS BIGINT) AS media_id, 'video/avi' AS mime, "
        f"CAST(16 + i % 8 AS INTEGER) AS width, "
        f"CAST(12 + i % 5 AS INTEGER) AS height, "
        f"CAST(3 + i % 4 AS INTEGER) AS n_frames, "
        f"CAST({fps} AS DOUBLE) AS fps, "
        f"round((3 + i % 4) * 1000.0 / {fps}, 6) AS duration_ms, "
        f"round(i + (11 + i % 5) / 2.0, 6) AS mean_luma_f0, "
        f"round(i + 7 * (2 + i % 4) / 2.0 + (11 + i % 5) / 2.0, 6) AS mean_luma_all "
        f"FROM range(0, {n}) t(i) WHERE i % 6 = 2"
    )


def degree_capped(n: int = 2) -> str:
    """degree_centrality over a graph with out-edges capped at n per
    vertex (input.limit_edges_in_one_vertex, ComputerOptions.java:
    186-194) — kept set is the first n by (etype, dst, weight) per
    src, mirroring Graph.limit_out_edges."""
    extra = f"""
capped AS (
  SELECT src, dst, weight, etype FROM (
    SELECT *, row_number() OVER (
      PARTITION BY src ORDER BY etype, dst, weight) AS rn
    FROM edges
  ) WHERE rn <= {n}
)
"""
    return _with(
        extra.strip(),
        "SELECT n.id, CAST(coalesce(d.c, 0) AS DOUBLE) AS degree "
        "FROM nodes n LEFT JOIN "
        "(SELECT src, count(*) AS c FROM capped GROUP BY src) d ON n.id = d.src",
    )


def closeness(rounds: int = 20, sample_rate: float | None = None) -> str:
    """Unrolled (vertex, start) min-distance relaxation; centrality =
    sum(1/d) (ClosenessCentralityOutput.java:50-56). sample_rate
    mirrors the Spark side's deterministic md5-hash START sample."""
    sample_pred = ""
    if sample_rate is not None:
        thresh = int(round(sample_rate * 1000))
        sample_pred = f"AND {_MD5LONG.format(x='src')} % 1000 < {thresh} "
    parts = [
        "c0 AS MATERIALIZED (SELECT dst AS id, src AS start, "
        f"min(coalesce(weight, 1.0)) AS dist FROM edges WHERE src <> dst "
        f"{sample_pred}"
        "GROUP BY dst, src)"
    ]
    for r in range(rounds):
        parts.append(
            f"c{r + 1} AS MATERIALIZED (SELECT id, start, min(dist) AS dist FROM ("
            f"SELECT id, start, dist FROM c{r} "
            f"UNION ALL "
            f"SELECT e.dst AS id, s.start, s.dist + coalesce(e.weight, 1.0) AS dist "
            f"FROM c{r} s JOIN edges e ON s.id = e.src "
            f"WHERE e.dst <> s.start AND e.dst <> s.id"
            f") GROUP BY id, start)"
        )
    return _with(
        ",\n".join(parts),
        f"SELECT n.id, CAST(coalesce(cnt, 0) AS BIGINT) AS n_reachable, "
        f"round(coalesce(cent, 0.0), 6) AS centrality "
        f"FROM nodes n LEFT JOIN (SELECT id, count(*) AS cnt, sum(1.0 / dist) AS cent "
        f"FROM c{rounds} GROUP BY id) c ON n.id = c.id",
    )


def rings_reply(edge_pred: str | None = None) -> str:
    """Rings over the reply+mirror subgraph: the bidirectional chains'
    only cycles are 2-cycles (revisit check forbids longer), one per
    undirected reply edge, anchored and recorded at the min endpoint
    (RingsDetection.java:76-92). edge_pred: optional extra SQL predicate
    over the directed reply edges BEFORE mirroring — the A13
    RingsDetectionWithFilter config string, applied identically on the
    Spark side via F.expr."""
    pred = f"AND ({edge_pred})" if edge_pred else ""
    extra = f"""
reply_und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE etype = 'reply' {pred}
)
"""
    return _with(
        extra.strip(),
        "SELECT a AS start, a || '->' || b || '->' || a AS ring FROM reply_und",
    )


def betweenness(rounds: int = 20, sample_rate: float | None = None) -> str:
    """Brandes identity over hop-shortest paths: sigma via unrolled BFS
    with path counts, then sum of sigma_s(v)*sigma_v(t)/sigma_s(t) —
    value-equivalent to the reference's accepted-sequence vote protocol
    (BetweennessCentrality.java:154-191) with sample_rate=1.

    sample_rate: restrict the SOURCE leg (sv/st) to the deterministic
    md5-hash sample — mirrors algorithms/betweenness.py
    source_sample_predicate / betweenness_brandes_sampled. The vt leg
    stays unrestricted (sigma_v(t) ranges over all mids)."""
    parts = [
        "de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges)",
        "f1 AS MATERIALIZED (SELECT src AS s, dst AS v, 1 AS dist, "
        "CAST(1 AS BIGINT) AS sigma FROM de WHERE src <> dst)",
        "r1 AS MATERIALIZED (SELECT * FROM f1)",
    ]
    for r in range(1, rounds):
        parts.append(
            f"f{r + 1} AS MATERIALIZED ("
            f"SELECT f.s, e.dst AS v, {r + 1} AS dist, sum(f.sigma) AS sigma "
            f"FROM f{r} f JOIN de e ON f.v = e.src "
            f"LEFT JOIN r{r} seen ON seen.s = f.s AND seen.v = e.dst "
            f"WHERE seen.s IS NULL AND e.dst <> f.s "
            f"GROUP BY f.s, e.dst)"
        )
        parts.append(
            f"r{r + 1} AS MATERIALIZED ("
            f"SELECT * FROM r{r} UNION ALL SELECT * FROM f{r + 1})"
        )
    sample_pred = ""
    if sample_rate is not None:
        thresh = int(round(sample_rate * 1000))
        sample_pred = (
            f"WHERE {_MD5LONG.format(x='sv.s')} % 1000 < {thresh} "
        )
    parts.append(
        f"bw AS (SELECT sv.v AS id, "
        f"sum(CAST(sv.sigma * vt.sigma AS DOUBLE) / st.sigma) AS b "
        f"FROM r{rounds} sv "
        f"JOIN r{rounds} vt ON vt.s = sv.v "
        f"JOIN r{rounds} st ON st.s = sv.s AND st.v = vt.v "
        f"AND st.dist = sv.dist + vt.dist "
        f"{sample_pred}"
        f"GROUP BY sv.v)"
    )
    return _with(
        ",\n".join(parts),
        "SELECT n.id, round(coalesce(bw.b, 0.0), 6) AS betweenness "
        "FROM nodes n LEFT JOIN bw ON n.id = bw.id",
    )


def links_reply() -> str:
    """Links walk from conversation-first turns along reply edges until
    the first tool-using turn (vertex end condition): on chains the
    recorded path per conversation is turns 0..first-tool-turn."""
    extra = """
firsttool AS (
  SELECT conv_id, min(turn_idx) AS ft FROM turns
  WHERE tool IS NOT NULL GROUP BY conv_id
)
"""
    node_expr = "conv_id || '#' || lpad(CAST(ft AS VARCHAR), 2, '0')"
    path_expr = (
        "array_to_string(list_transform(range(0, ft + 1), "
        "i -> conv_id || '#' || lpad(CAST(i AS VARCHAR), 2, '0')), '->')"
    )
    return _with(
        extra.strip(),
        f"SELECT {node_expr} AS id, {path_expr} AS path FROM firsttool",
    )


def subgraph_wedge() -> str:
    """Typed-edge wedge pattern: consecutive turns a-reply->b both
    mentioning the same tool t (the reference's SubGraphMatch as a
    3-way join)."""
    extra = """
rp AS (SELECT DISTINCT src AS a, dst AS b FROM edges WHERE etype = 'reply'),
m1 AS (SELECT DISTINCT src AS a, dst AS t FROM edges WHERE etype = 'mention'),
m2 AS (SELECT DISTINCT src AS b, dst AS t FROM edges WHERE etype = 'mention')
"""
    return _with(
        extra.strip(),
        "SELECT DISTINCT rp.a, rp.b, m1.t FROM rp "
        "JOIN m1 ON rp.a = m1.a JOIN m2 ON rp.b = m2.b AND m1.t = m2.t "
        "WHERE rp.a <> rp.b AND rp.a <> m1.t AND rp.b <> m1.t",
    )


def random_walks(walk_len: int = 6, walks_per_node: int = 1) -> str:
    """Deterministic hash-driven walks mirroring pipeline/walks.py:
    step t follows out-edge index md5int(cur || ':' || walk || ':t')
    % outdeg; `walk` is the per-start salt index."""
    md5int = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"
    parts = [
        "eidx AS MATERIALIZED (SELECT src, dst, "
        "row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx, "
        "count(*) OVER (PARTITION BY src) AS deg "
        "FROM (SELECT DISTINCT src, dst FROM edges))",
        f"wk0 AS MATERIALIZED (SELECT id AS start, "
        f"CAST(unnest(range(0, {walks_per_node})) AS INTEGER) AS walk, "
        f"id AS cur FROM nodes)",
    ]
    for t in range(1, walk_len):
        pick = md5int.format(x=f"w.cur || ':' || CAST(w.walk AS VARCHAR) || ':{t}'")
        parts.append(
            f"wk{t} AS MATERIALIZED (SELECT w.start, w.walk, e.dst AS cur "
            f"FROM wk{t - 1} w JOIN eidx e ON w.cur = e.src "
            f"AND e.idx = {pick} % e.deg)"
        )
    selects = " UNION ALL ".join(
        f"SELECT start, walk, {t} AS step, cur AS node FROM wk{t}"
        for t in range(walk_len)
    )
    return _with(",\n".join(parts), selects)


# ---------------------------------------------------------------------------
# Round-5 link-graph additions: HITS, Adamic-Adar, ANF exact + FM sketch
# ---------------------------------------------------------------------------


def hits(supersteps: int = 10) -> str:
    """Unrolled HITS power iteration (algorithms/hits.py): per round an
    in-gather (auth from hub), L2 normalization via a scalar subquery,
    an out-gather (hub from the NEW auth), L2 normalization — over the
    DISTINCT (src, dst) edge set, init auth = hub = 1.0."""
    parts = [
        "de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges)",
        "s0 AS (SELECT id, 1.0 AS auth, 1.0 AS hub FROM nodes)",
    ]
    for r in range(supersteps):
        parts.append(
            f"ar{r} AS MATERIALIZED (SELECT e.dst AS id, sum(s.hub) AS s "
            f"FROM s{r} s JOIN de e ON s.id = e.src GROUP BY e.dst)"
        )
        parts.append(f"an{r} AS (SELECT sqrt(sum(s * s)) AS nrm FROM ar{r})")
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT n.id, "
            f"coalesce(r.s, 0.0) / (SELECT nrm FROM an{r}) AS auth "
            f"FROM nodes n LEFT JOIN ar{r} r ON n.id = r.id)"
        )
        parts.append(
            f"hr{r} AS MATERIALIZED (SELECT e.src AS id, sum(a.auth) AS s "
            f"FROM a{r} a JOIN de e ON a.id = e.dst GROUP BY e.src)"
        )
        parts.append(f"hn{r} AS (SELECT sqrt(sum(s * s)) AS nrm FROM hr{r})")
        parts.append(
            f"s{r + 1} AS MATERIALIZED (SELECT a.id, a.auth, "
            f"coalesce(r.s, 0.0) / (SELECT nrm FROM hn{r}) AS hub "
            f"FROM a{r} a LEFT JOIN hr{r} r ON a.id = r.id)"
        )
    return _with(
        ",\n".join(parts),
        f"SELECT id, round(auth, 6) AS auth, round(hub, 6) AS hub "
        f"FROM s{supersteps}",
    )


def adamic_adar(max_degree: int = 32, k: int = 100) -> str:
    """Adamic-Adar top-k over non-adjacent pairs (algorithms/linkpred.py):
    pivots capped at undirected degree <= max_degree, score
    sum(1/ln(deg(z))), anti-joined against existing undirected edges,
    ordered by (round(score,6) DESC, u, w)."""
    extra = f"""
udeg AS MATERIALIZED (SELECT src AS id, count(*) AS d FROM und GROUP BY src),
mid AS (SELECT id, d FROM udeg WHERE d <= {max_degree}),
adj AS MATERIALIZED (
  SELECT m.id AS z, e.dst AS n, m.d
  FROM mid m JOIN und e ON m.id = e.src
),
cand AS (
  SELECT e1.n AS u, e2.n AS w, e1.d AS zd
  FROM adj e1 JOIN adj e2 ON e1.z = e2.z
  WHERE e1.n < e2.n
),
scored AS (
  SELECT u, w, count(*) AS common_neighbors, sum(1.0 / ln(zd)) AS aa
  FROM cand GROUP BY u, w
),
nonedge AS (
  SELECT s.* FROM scored s LEFT JOIN und e ON s.u = e.src AND s.w = e.dst
  WHERE e.src IS NULL
)
"""
    return _with(
        extra.strip(),
        f"SELECT u, w, common_neighbors, round(aa, 6) AS aa_score "
        f"FROM nonedge ORDER BY round(aa, 6) DESC, u, w LIMIT {k}",
    )


def anf_exact(hops: int = 3) -> str:
    """Exact h-hop reach counts on the reply-chain subgraph
    (algorithms/anf.py::anf_exact): per hop, grow the (v, reached) ball
    by one undirected step and dedup."""
    parts = [
        "re AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM edges WHERE etype = 'reply' "
        "UNION ALL SELECT dst AS src, src AS dst FROM edges "
        "WHERE etype = 'reply') WHERE src <> dst)",
        "b0 AS (SELECT id AS v, id AS u FROM nodes)",
    ]
    for h in range(1, hops + 1):
        parts.append(
            f"b{h} AS MATERIALIZED (SELECT DISTINCT v, u FROM ("
            f"SELECT v, u FROM b{h - 1} UNION ALL "
            f"SELECT p.v, e.dst AS u FROM b{h - 1} p JOIN re e ON p.u = e.src))"
        )
    counts = " UNION ALL ".join(
        f"SELECT v AS id, CAST({h} AS INTEGER) AS hops, count(*) AS reach "
        f"FROM b{h} GROUP BY v"
        for h in range(1, hops + 1)
    )
    return _with(",\n".join(parts), f"SELECT id, hops, reach FROM ({counts})")


def anf_sketch(hops: int = 3, k: int = 8) -> str:
    """Flajolet-Martin ANF sketch (algorithms/anf.py::anf_sketch). The
    register-seed and estimator SQL snippets are IMPORTED from the
    Spark implementation, so both engines evaluate the identical
    deterministic hash arithmetic; per hop, registers are bit_or-merged
    from undirected neighbors."""
    from hugegraph_computer_spark.algorithms.anf import (
        DUCK_MD5INT,
        _est_expr,
        _seed_exprs,
    )

    seeds = ", ".join(_seed_exprs(k, DUCK_MD5INT))
    parts = [
        f"fm0 AS MATERIALIZED (SELECT id, {seeds} FROM nodes)",
    ]
    for h in range(1, hops + 1):
        ors = ", ".join(f"bit_or(s.r{j}) AS m{j}" for j in range(k))
        merged = ", ".join(
            f"s.r{j} | coalesce(m.m{j}, CAST(0 AS BIGINT)) AS r{j}"
            for j in range(k)
        )
        parts.append(
            f"msg{h} AS MATERIALIZED (SELECT e.dst AS id, {ors} "
            f"FROM fm{h - 1} s JOIN und e ON s.id = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"fm{h} AS MATERIALIZED (SELECT s.id, {merged} "
            f"FROM fm{h - 1} s LEFT JOIN msg{h} m ON s.id = m.id)"
        )
    ests = " UNION ALL ".join(
        f"SELECT id, CAST({h} AS INTEGER) AS hops, {_est_expr(k)} FROM fm{h}"
        for h in range(1, hops + 1)
    )
    return _with(",\n".join(parts), f"SELECT id, hops, est FROM ({ests})")


def ktruss(k: int = 4, rounds: int = 12) -> str:
    """Unrolled k-truss peeling (algorithms/truss.py): each round
    re-enumerates ordered triangles (a<b<c, wedge join on the middle
    vertex + closing-edge membership) inside the surviving edge set and
    keeps edges with support >= k-2. The peel map is idempotent at its
    fixpoint, so unrolling MORE rounds than convergence needs is safe;
    `rounds` just needs to be >= the cascade depth (Spark converges
    dynamically and pytest pins the equality)."""
    parts = [
        "e0 AS MATERIALIZED (SELECT src AS u, dst AS v FROM und WHERE src < dst)"
    ]
    for r in range(rounds):
        parts.append(
            f"tr{r} AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c "
            f"FROM e{r} e1 JOIN e{r} e2 ON e1.v = e2.u "
            f"JOIN e{r} e3 ON e3.u = e1.u AND e3.v = e2.v)"
        )
        parts.append(
            f"e{r + 1} AS MATERIALIZED (SELECT u, v, count(*) AS support "
            f"FROM (SELECT a AS u, b AS v FROM tr{r} "
            f"UNION ALL SELECT b AS u, c AS v FROM tr{r} "
            f"UNION ALL SELECT a AS u, c AS v FROM tr{r}) "
            f"GROUP BY u, v HAVING count(*) >= {k - 2})"
        )
    return _with(
        ",\n".join(parts), f"SELECT u, v, support FROM e{rounds}"
    )


def stratified_sample(group_col: str = "lang", n: int = 20, tag: str = "sample") -> str:
    """Deterministic per-stratum downsample (pipeline/sampling.py): the
    md5-permutation rank template is shared with the Spark side."""
    from hugegraph_computer_spark.pipeline.sampling import DUCK_RANK_HASH

    h = DUCK_RANK_HASH.format(tag=tag)
    return (
        f"SELECT doc_id, {group_col}, rank FROM ("
        f"SELECT doc_id, {group_col}, CAST(row_number() OVER ("
        f"PARTITION BY {group_col} ORDER BY {h}, doc_id) AS INTEGER) AS rank "
        f"FROM documents) WHERE rank <= {n}"
    )
