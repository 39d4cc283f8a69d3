"""DuckDB oracle SQL for the pipeline operators (driver correctness gate).

Each builder mirrors the matching Spark operator exactly — same hash
constants (imported from text.py / similarity.py, single source of truth),
same rounding (6 decimals), same tie-breaks — over the pre-registered
`documents` / `embeddings` views.  Hash-dependent operators are checked in
their 'dict' mode (lexicographic shingle dictionary → engine-independent);
the xxhash production mode is covered by pytest equivalence tests instead.
"""

from __future__ import annotations

from neo4j_graph_algorithms_spark.pipeline.similarity import srp_hyperplanes
from neo4j_graph_algorithms_spark.pipeline.text import HASH_P, LANG_MARKERS, hash_params

# tokens CTE: identical to text.tokens_col (split on ' ', drop empties)
DOCS_CTE = """docs AS (
  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents)"""


def token_count_sql() -> str:
    return f"""WITH {DOCS_CTE}
SELECT doc_id, len(toks) AS n_tokens, length(text) AS n_chars FROM docs"""


def _score_expr(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return (
        f"CASE WHEN len(toks) > 0 THEN "
        f"len(list_filter(toks, t -> t IN ({markers}))) * 1.0 / len(toks) "
        f"ELSE 0.0 END"
    )


def language_id_sql(min_ratio: float = 0.01) -> str:
    langs = sorted(LANG_MARKERS)
    scores = ",\n  ".join(f"{_score_expr(lg)} AS score_{lg}" for lg in langs)
    best = "greatest(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN score_{lg} = best THEN '{lg}'" for lg in langs
    ) + " END"
    return f"""WITH {DOCS_CTE},
scored AS (SELECT doc_id, {scores} FROM docs),
ranked AS (SELECT doc_id, {best} AS best, * FROM scored)
SELECT doc_id,
       CASE WHEN best >= {min_ratio} THEN {pred} ELSE 'und' END AS lang_pred,
       round(best, 6) AS lang_score
FROM ranked"""


def quality_score_sql() -> str:
    all_markers = ", ".join(
        f"'{m}'" for m in sorted({m for ms in LANG_MARKERS.values() for m in ms})
    )
    return f"""WITH {DOCS_CTE},
m AS (
  SELECT doc_id,
         len(toks) AS n,
         CASE WHEN len(toks) > 0
              THEN (length(text) - (len(toks) - 1)) * 1.0 / len(toks)
              ELSE 0.0 END AS mean_len,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, t -> t IN ({all_markers}))) * 1.0 / len(toks)
              ELSE 0.0 END AS stop_ratio,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
           / greatest(length(text), 1) AS alpha_ratio
  FROM docs)
SELECT doc_id,
       n AS n_tokens,
       round(mean_len, 6) AS mean_token_len,
       round(stop_ratio, 6) AS stopword_ratio,
       round(alpha_ratio, 6) AS alpha_ratio,
       (CASE WHEN n >= 10 AND n <= 100000 THEN 0.25 ELSE 0.0 END
        + CASE WHEN mean_len >= 2.0 AND mean_len <= 12.0 THEN 0.25 ELSE 0.0 END
        + CASE WHEN stop_ratio >= 0.01 THEN 0.25 ELSE 0.0 END
        + CASE WHEN alpha_ratio >= 0.5 THEN 0.25 ELSE 0.0 END) AS quality
FROM m"""


TOKEN_DICT_CTES = """tokpos AS (
  SELECT doc_id, i, toks[i + 1] AS tok
  FROM docs, unnest(range(len(toks))) t(i)),
dict AS (
  SELECT tok, CAST(dense_rank() OVER (ORDER BY tok) AS BIGINT) AS tid
  FROM (SELECT DISTINCT unnest(toks) AS tok FROM docs))"""


def fingerprint_sql() -> str:
    return f"""WITH {DOCS_CTE},
{TOKEN_DICT_CTES},
seqs AS (
  SELECT doc_id, list(tid ORDER BY i) AS tids
  FROM tokpos JOIN dict USING (tok) GROUP BY doc_id)
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT), tids),
                   (acc, x) -> (acc * 31 + x) % {HASH_P}) AS fingerprint
FROM seqs"""


def exact_dedup_sql() -> str:
    return """WITH h AS (SELECT doc_id, sha256(text) AS h FROM documents),
c AS (SELECT h, min(doc_id) AS canonical_id FROM h GROUP BY h)
SELECT doc_id, canonical_id, doc_id <> canonical_id AS is_duplicate
FROM h JOIN c USING (h)"""


def _gram_ctes(n: int) -> str:
    """Distinct (doc_id, gram) word n-grams, mirroring _shingle_sets."""
    if n == 1:
        return f"""{DOCS_CTE},
gd AS (SELECT DISTINCT doc_id, unnest(toks) AS gram FROM docs)"""
    return f"""{DOCS_CTE},
gd AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i + 1 : i + {n}], ' ') AS gram
  FROM docs, unnest(range(greatest(len(toks) - {n} + 1, 0))) t(i))"""


_VERIFY_SQL = """sz AS (SELECT doc_id, count(*) AS sz FROM gd GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS ni
  FROM cands c
  JOIN gd ga ON ga.doc_id = c.a
  JOIN gd gb ON gb.doc_id = c.b AND gb.gram = ga.gram
  GROUP BY c.a, c.b),
verified AS (
  SELECT i.a, i.b, round(i.ni / (sa.sz + sb.sz - i.ni), 6) AS jaccard
  FROM inter i
  JOIN sz sa ON sa.doc_id = i.a
  JOIN sz sb ON sb.doc_id = i.b)"""


def ngram_jaccard_sql(n: int = 3, threshold: float = 0.8) -> str:
    return f"""WITH {_gram_ctes(n)},
cands AS (
  SELECT DISTINCT ga.doc_id AS a, gb.doc_id AS b
  FROM gd ga JOIN gd gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id),
{_VERIFY_SQL}
SELECT a, b, jaccard FROM verified WHERE jaccard >= {threshold}"""


def minhash_lsh_sql(
    num_hashes: int = 8, bands: int = 4, n: int = 3, threshold: float = 0.8
) -> str:
    mins = []
    for i in range(num_hashes):
        a, b = hash_params(i)
        mins.append(f"min((tid * {a} + {b}) % {HASH_P}) AS mh_{i}")
    rows = num_hashes // bands
    band_selects = []
    for bi in range(bands):
        cols = ", ".join(f"mh_{bi * rows + r}" for r in range(rows))
        band_selects.append(
            f"SELECT doc_id, concat_ws('_', {bi}, {cols}) AS bucket FROM sig"
        )
    banded = " UNION ALL ".join(band_selects)
    return f"""WITH {_gram_ctes(n)},
gramdict AS (
  SELECT gram, CAST(dense_rank() OVER (ORDER BY gram) AS BIGINT) AS tid
  FROM (SELECT DISTINCT gram FROM gd)),
gt AS (SELECT doc_id, tid FROM gd JOIN gramdict USING (gram)),
sig AS (SELECT doc_id, {', '.join(mins)} FROM gt GROUP BY doc_id),
banded AS ({banded}),
cands AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
{_VERIFY_SQL}
SELECT a, b, jaccard FROM verified WHERE jaccard >= {threshold}"""


def simhash_dedup_sql(bits: int = 32, max_hamming: int = 2) -> str:
    sums = []
    for j in range(bits):
        a, b = hash_params(j)
        sums.append(
            f"sum(CASE WHEN ((tid * {a} + {b}) % {HASH_P}) % 2 = 1 "
            f"THEN 1 ELSE -1 END) AS s_{j}"
        )
    fp = " + ".join(
        f"CASE WHEN s_{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END"
        for j in range(bits)
    )
    n_blocks = max_hamming + 1
    width = bits // n_blocks
    block_selects = []
    for bi in range(n_blocks):
        lo = bi * width
        w = width if bi < n_blocks - 1 else bits - lo
        mask = (1 << w) - 1
        block_selects.append(
            f"SELECT doc_id, simhash, concat_ws('_', {bi}, (simhash >> {lo}) & {mask}) AS bucket FROM sh"
        )
    blocked = " UNION ALL ".join(block_selects)
    return f"""WITH {DOCS_CTE},
toksets AS (SELECT DISTINCT doc_id, unnest(toks) AS tok FROM docs),
dict AS (
  SELECT tok, CAST(dense_rank() OVER (ORDER BY tok) AS BIGINT) AS tid
  FROM (SELECT DISTINCT tok FROM toksets)),
tt AS (SELECT doc_id, tid FROM toksets JOIN dict USING (tok)),
sums AS (SELECT doc_id, {', '.join(sums)} FROM tt GROUP BY doc_id),
sh AS (SELECT doc_id, {fp} AS simhash FROM sums),
blocked AS ({blocked}),
cands AS (
  SELECT DISTINCT x.doc_id AS a, x.simhash AS sh_a, y.doc_id AS b, y.simhash AS sh_b
  FROM blocked x JOIN blocked y ON x.bucket = y.bucket AND x.doc_id < y.doc_id)
SELECT a, b, bit_count(xor(sh_a, sh_b)) AS hamming
FROM cands WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}"""


EMB_NORM_CTE = """e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)"""


def cosine_topk_sql(k: int = 5, max_query_id: int = 8) -> str:
    return f"""WITH {EMB_NORM_CTE},
q AS (SELECT * FROM n WHERE vec_id < {max_query_id}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
  FROM n c, q WHERE q.vec_id <> c.vec_id),
ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= {k}"""


def cosine_pairs_sql(threshold: float = 0.5) -> str:
    return f"""WITH {EMB_NORM_CTE}
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= {threshold}"""


def _srp_pairs_ctes(
    threshold: float, n_planes: int, bands: int, dim: int, seed: int
) -> str:
    """CTE chain ending in `pairs AS ([a, b, cosine])` — the SRP-LSH
    candidate + exact-verify construction, shared by srp_lsh_sql and
    embedding_near_dedup_sql."""
    planes = srp_hyperplanes(dim, n_planes, seed)
    terms = []
    for i, p in enumerate(planes):
        lits = ", ".join(repr(x) for x in p)
        terms.append(
            f"CASE WHEN list_dot_product(v, [{lits}]::DOUBLE[]) >= 0 "
            f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        )
    sig = " + ".join(terms)
    width = n_planes // bands
    block_selects = []
    for bi in range(bands):
        mask = (1 << width) - 1
        block_selects.append(
            f"SELECT vec_id, concat_ws('_', {bi}, (srp_sig >> {bi * width}) & {mask}) AS bucket FROM sigs"
        )
    blocked = " UNION ALL ".join(block_selects)
    return f"""{EMB_NORM_CTE},
sigs AS (SELECT vec_id, {sig} AS srp_sig FROM e),
blocked AS ({blocked}),
cands AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM blocked x JOIN blocked y ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
pairs AS (
  SELECT c.a, c.b,
         round(list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm), 6) AS cosine
  FROM cands c JOIN n na ON na.vec_id = c.a JOIN n nb ON nb.vec_id = c.b
  WHERE round(list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm), 6) >= {threshold})"""


def srp_lsh_sql(
    threshold: float = 0.4,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> str:
    return f"""WITH {_srp_pairs_ctes(threshold, n_planes, bands, dim, seed)}
SELECT a, b, cosine FROM pairs"""


def embedding_near_dedup_sql(
    threshold: float = 0.4,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> str:
    """Twin of dedup.embedding_near_dedup: SRP-LSH near-dup pairs (same
    deterministic hyperplanes as the Spark side), connected components by a
    recursive-CTE transitive closure, representative = MIN member id —
    engine-independent because the pair set and the min-label fixpoint are
    both exact."""
    return f"""WITH RECURSIVE {_srp_pairs_ctes(threshold, n_planes, bands, dim, seed)},
und AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b AS x, a AS y FROM pairs),
reach AS (
  SELECT x, y FROM und
  UNION
  SELECT r.x, u.y FROM reach r JOIN und u ON r.y = u.x),
mins AS (SELECT x, min(y) AS mn FROM reach GROUP BY x)
SELECT e.vec_id,
       CAST(least(e.vec_id, coalesce(m.mn, e.vec_id)) AS BIGINT) AS rep_id,
       CAST(CASE WHEN coalesce(m.mn, e.vec_id) < e.vec_id THEN 1 ELSE 0 END AS INT)
         AS is_dup
FROM e LEFT JOIN mins m ON m.x = e.vec_id"""


def token_dictionary_sql() -> str:
    """[tok, tid] — lexicographic dense rank over the corpus vocabulary
    (the Spark side computes the same rank with the distributed two-phase
    ranking, functions/rank.py)."""
    return f"""WITH {DOCS_CTE}
SELECT tok, CAST(dense_rank() OVER (ORDER BY tok) AS BIGINT) AS tid
FROM (SELECT DISTINCT unnest(toks) AS tok FROM docs)"""


def _kmeans_assign_ctes(
    n_centroids: int,
    iterations: int,
    dim: int,
    quantize: int,
    emb_source: str = "SELECT vec_id, embedding FROM embeddings",
) -> list[str]:
    """CTE parts for the deterministic k-means coarse quantizer (centroids
    = lowest-id vectors, Lloyd iterations rounded to `quantize` decimals —
    the same quantization the Spark side applies in oracle mode so avg()
    summation order can't flip assignments), ending at `assign`
    [vec_id, cid] and `fdist` [vec_id, cid, d2].  Shared by ivf_search_sql
    and semantic_dedup_sql."""
    parts = [
        f"""emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM ({emb_source}) _src)""",
        f"""dims AS MATERIALIZED (
  SELECT vec_id, i AS dim, v[CAST(i AS INT) + 1] AS x
  FROM emb, range({dim}) t(i))""",
        f"""init AS (
  SELECT vec_id, v, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
  FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT {n_centroids}) ii)""",
        f"""c0 AS MATERIALIZED (
  SELECT cid, i AS dim, round(v[CAST(i AS INT) + 1], {quantize}) AS c
  FROM init, range({dim}) t(i))""",
    ]
    for it in range(1, iterations + 1):
        parts.append(
            f"""dist{it} AS MATERIALIZED (
  SELECT d.vec_id, c.cid, round(sum((d.x - c.c) * (d.x - c.c)), {quantize}) AS d2
  FROM dims d JOIN c{it - 1} c USING (dim) GROUP BY d.vec_id, c.cid),
a{it} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM dist{it}) x WHERE rn = 1),
c{it} AS MATERIALIZED (
  SELECT a.cid, d.dim, round(avg(d.x), {quantize}) AS c
  FROM a{it} a JOIN dims d USING (vec_id) GROUP BY a.cid, d.dim)"""
        )
    # final assignment against the last centroids
    parts.append(
        f"""fdist AS MATERIALIZED (
  SELECT d.vec_id, c.cid, round(sum((d.x - c.c) * (d.x - c.c)), {quantize}) AS d2
  FROM dims d JOIN c{iterations} c USING (dim) GROUP BY d.vec_id, c.cid),
assign AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM fdist) x WHERE rn = 1)"""
    )
    return parts


def ivf_search_sql(
    n_centroids: int = 4,
    iterations: int = 2,
    dim: int = 64,
    k: int = 5,
    n_probes: int = 2,
    max_query_id: int = 8,
    quantize: int = 6,
) -> str:
    """Full IVF twin: shared k-means CTEs + query cell probing + top-k."""
    parts = _kmeans_assign_ctes(n_centroids, iterations, dim, quantize)
    parts.append(
        f"""qcells AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM fdist WHERE vec_id < {max_query_id}) x WHERE rn <= {n_probes}),
nrm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb),
probe AS (
  SELECT q.query_id, a.vec_id AS neighbor_id
  FROM qcells q JOIN assign a ON a.cid = q.cid
  WHERE a.vec_id <> q.query_id),
scored AS (
  SELECT p.query_id, p.neighbor_id,
         round(list_dot_product(nq.v, nc.v) / (nq.nrm * nc.nrm), 6) AS cosine
  FROM probe p JOIN nrm nq ON nq.vec_id = p.query_id
  JOIN nrm nc ON nc.vec_id = p.neighbor_id)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored) x WHERE rank <= {k}"""
    )


def curate_sql(
    min_quality: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.8,
) -> str:
    """End-to-end curation stage counts (input → quality gate → exact dedup
    → LSH near-dup removal), mirroring pipeline/curate.curate in 'dict'
    hash mode.  One row: the four stage row-counts."""
    all_markers = ", ".join(
        f"'{m}'" for m in sorted({m for ms in LANG_MARKERS.values() for m in ms})
    )
    mins = []
    for i in range(num_hashes):
        a, b = hash_params(i)
        mins.append(f"min((tid * {a} + {b}) % {HASH_P}) AS mh_{i}")
    rows = num_hashes // bands
    band_selects = []
    for bi in range(bands):
        cols = ", ".join(f"mh_{bi * rows + r}" for r in range(rows))
        band_selects.append(
            f"SELECT doc_id, concat_ws('_', {bi}, {cols}) AS bucket FROM sig"
        )
    banded = " UNION ALL ".join(band_selects)
    grams = (
        f"""gd AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i + 1 : i + {n}], ' ') AS gram
  FROM d2 docs, unnest(range(greatest(len(toks) - {n} + 1, 0))) t(i))"""
        if n > 1
        else "gd AS (SELECT DISTINCT doc_id, unnest(toks) AS gram FROM d2 docs)"
    )
    return f"""WITH {DOCS_CTE},
q AS (
  SELECT doc_id, text, toks,
         len(toks) AS nt,
         CASE WHEN len(toks) > 0
              THEN (length(text) - (len(toks) - 1)) * 1.0 / len(toks) ELSE 0.0 END AS mean_len,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, t -> t IN ({all_markers}))) * 1.0 / len(toks)
              ELSE 0.0 END AS stop_ratio,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
           / greatest(length(text), 1) AS alpha_ratio
  FROM docs),
d1 AS (
  SELECT doc_id, text, toks FROM q
  WHERE (CASE WHEN nt >= 10 AND nt <= 100000 THEN 0.25 ELSE 0.0 END
       + CASE WHEN mean_len >= 2.0 AND mean_len <= 12.0 THEN 0.25 ELSE 0.0 END
       + CASE WHEN stop_ratio >= 0.01 THEN 0.25 ELSE 0.0 END
       + CASE WHEN alpha_ratio >= 0.5 THEN 0.25 ELSE 0.0 END) >= {min_quality}),
h AS (SELECT doc_id, text, toks, sha256(text) AS hh FROM d1),
canon AS (SELECT hh, min(doc_id) AS keep FROM h GROUP BY hh),
d2 AS (SELECT h.doc_id, h.text, h.toks FROM h JOIN canon c ON c.hh = h.hh AND c.keep = h.doc_id),
{grams},
gramdict AS (
  SELECT gram, CAST(dense_rank() OVER (ORDER BY gram) AS BIGINT) AS tid
  FROM (SELECT DISTINCT gram FROM gd)),
gt AS (SELECT doc_id, tid FROM gd JOIN gramdict USING (gram)),
sig AS (SELECT doc_id, {', '.join(mins)} FROM gt GROUP BY doc_id),
banded AS ({banded}),
cands AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
sz AS (SELECT doc_id, count(*) AS sz FROM gd GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS ni
  FROM cands c
  JOIN gd ga ON ga.doc_id = c.a
  JOIN gd gb ON gb.doc_id = c.b AND gb.gram = ga.gram
  GROUP BY c.a, c.b),
verified AS (
  SELECT i.a, i.b, round(i.ni / (sa.sz + sb.sz - i.ni), 6) AS jaccard
  FROM inter i JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b),
drop3 AS (SELECT DISTINCT b AS doc_id FROM verified WHERE jaccard >= {threshold}),
d3 AS (SELECT doc_id FROM d2 WHERE doc_id NOT IN (SELECT doc_id FROM drop3))
SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS input,
       (SELECT CAST(count(*) AS BIGINT) FROM d1) AS after_quality,
       (SELECT CAST(count(*) AS BIGINT) FROM d2) AS after_exact_dedup,
       (SELECT CAST(count(*) AS BIGINT) FROM d3) AS after_near_dedup"""


def multimodal_features_sql(n: int = 64, width: int = 8, height: int = 8) -> str:
    """Twin of multimodal.extract_features over synthesize_media's
    deterministic fake codec: pixel j of media m = (j*2654435761 + m*97) %
    251 — the whole decode+feature path regenerated as pure SQL (the Spark
    side runs the real Arrow-batched mapInPandas plumbing)."""
    npx = width * height
    return f"""WITH ids AS (SELECT CAST(i AS BIGINT) AS media_id FROM range({n}) t(i)),
px AS (
  SELECT media_id, (j * 2654435761 + media_id * 97) % 251 AS v
  FROM ids, range({npx}) tt(j))
SELECT media_id,
       CAST(floor(avg(v)) AS INT) AS mean_intensity,
       CAST(max(v) AS INT) AS max_intensity,
       CAST(floor(100.0 * sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) / {npx}) AS INT)
         AS nonzero_frac_pct
FROM px GROUP BY media_id"""


def png_features_sql(n: int = 64, width: int = 8, height: int = 8) -> str:
    """Twin of multimodal.extract_features over synthesize_png_media's REAL
    PNG payloads: pixel (y,x) of media m = (7x + 13y + 31m) % 256, so the
    SQL regenerates the grid by formula while the Spark side round-trips a
    genuine stdlib-zlib PNG encode (mixed scanline filters) + decode inside
    the Arrow-batched kernel.  width*height is a power of two, so the
    mean/percentage floats are IEEE-exact and parity is hash-exact."""
    npx = width * height
    return f"""WITH ids AS (SELECT CAST(i AS BIGINT) AS media_id FROM range({n}) t(i)),
px AS (
  SELECT media_id, (7 * x + 13 * y + 31 * media_id) % 256 AS v
  FROM ids, range({width}) tx(x), range({height}) ty(y))
SELECT media_id,
       CAST(floor(avg(v)) AS INT) AS mean_intensity,
       CAST(max(v) AS INT) AS max_intensity,
       CAST(floor(100.0 * sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) / {npx}) AS INT)
         AS nonzero_frac_pct
FROM px GROUP BY media_id"""


def jpeg_features_sql(n: int = 64, width: int = 16, height: int = 16) -> str:
    """Twin of multimodal.extract_features over synthesize_jpeg_media's
    REAL baseline-JPEG payloads: the fixture is BLOCK-CONSTANT — pixel
    (y,x) of media m = (17·(x//8) + 29·(y//8) + 31·m) % 256 — because a
    constant 8×8 block round-trips the lossy DCT codec exactly (DC
    quantizer 8; see pipeline/jpeg.py), so the SQL regenerates pixels by
    formula while Spark Huffman-decodes genuine JPEG streams in the
    Arrow-batched kernel.  width*height is a power of two, so the
    mean/percentage floats are IEEE-exact and parity is hash-exact."""
    npx = width * height
    return f"""WITH ids AS (SELECT CAST(i AS BIGINT) AS media_id FROM range({n}) t(i)),
px AS (
  SELECT media_id, (17 * (x // 8) + 29 * (y // 8) + 31 * media_id) % 256 AS v
  FROM ids, range({width}) tx(x), range({height}) ty(y))
SELECT media_id,
       CAST(floor(avg(v)) AS INT) AS mean_intensity,
       CAST(max(v) AS INT) AS max_intensity,
       CAST(floor(100.0 * sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) / {npx}) AS INT)
         AS nonzero_frac_pct
FROM px GROUP BY media_id"""


def jpeg_color_features_sql(n: int = 64, width: int = 32, height: int = 32) -> str:
    """Twin of multimodal.extract_features over synthesize_jpeg_color_media's
    REAL YCbCr 4:2:0 baseline-JPEG payloads.  The fixture is MCU-CONSTANT —
    one (Y, Cb, Cr) triple per 16×16 MCU (jpeg_color_planes) — so the lossy
    DCT codec and the replicate chroma upsampling both round-trip exactly,
    and the decoder's DOCUMENTED fixed-point YCbCr→RGB transform
    (pipeline/jpeg.py module docstring; floor((256·Y + c·Δ + 128)/256),
    division by 2^8 is IEEE-exact) is regenerated here as pure SQL while
    Spark Huffman-decodes genuine interleaved two-table JPEG streams in the
    Arrow-batched kernel.  Features aggregate over all 3 RGB channels."""
    npx3 = width * height * 3
    return f"""WITH ids AS (SELECT CAST(i AS BIGINT) AS media_id FROM range({n}) t(i)),
mcu AS (
  SELECT media_id,
         (17 * (x // 16) + 29 * (y // 16) + 31 * media_id) % 256 AS yv,
         (11 * (x // 16) +  7 * (y // 16) + 13 * media_id) % 256 AS cbv,
         ( 5 * (x // 16) + 23 * (y // 16) + 19 * media_id) % 256 AS crv
  FROM ids, range({width}) tx(x), range({height}) ty(y)),
rgb AS (
  SELECT media_id,
         GREATEST(0, LEAST(255, CAST(floor((256 * yv + 359 * (crv - 128) + 128) / 256.0) AS BIGINT))) AS r,
         GREATEST(0, LEAST(255, CAST(floor((256 * yv - 88 * (cbv - 128) - 183 * (crv - 128) + 128) / 256.0) AS BIGINT))) AS g,
         GREATEST(0, LEAST(255, CAST(floor((256 * yv + 454 * (cbv - 128) + 128) / 256.0) AS BIGINT))) AS b
  FROM mcu),
ch AS (
  SELECT media_id, r AS v FROM rgb
  UNION ALL SELECT media_id, g FROM rgb
  UNION ALL SELECT media_id, b FROM rgb)
SELECT media_id,
       CAST(floor(avg(v)) AS INT) AS mean_intensity,
       CAST(max(v) AS INT) AS max_intensity,
       CAST(floor(100.0 * sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) / {npx3}) AS INT)
         AS nonzero_frac_pct
FROM ch GROUP BY media_id"""


def audio_features_sql(n: int = 64, n_samples: int = 800, sample_rate: int = 8000) -> str:
    """Twin of multimodal.audio_features over synthesize_audio's REAL WAV
    payloads: sample t of media m = ((t*(m%17+3)) % 1024) - 512, so the SQL
    regenerates the waveform by formula while the Spark side round-trips
    the genuine stdlib-wave RIFF encode/decode.  All features are exact
    integers (sum-of-squares, sign-change count)."""
    return f"""WITH ids AS (SELECT CAST(i AS BIGINT) AS media_id FROM range({n}) t(i)),
s AS (
  SELECT media_id, CAST(j AS BIGINT) AS t,
         (CAST(j AS BIGINT) * (media_id % 17 + 3)) % 1024 - 512 AS v
  FROM ids, range({n_samples}) tt(j)),
sc AS (
  SELECT media_id, v,
         CASE WHEN (v >= 0) <> (lag(v) OVER (PARTITION BY media_id ORDER BY t) >= 0)
              THEN 1 ELSE 0 END AS zc
  FROM s)
SELECT media_id,
       CAST({n_samples} AS BIGINT) AS n_samples,
       CAST({sample_rate} AS INT) AS sample_rate,
       CAST({n_samples} * 1000 // {sample_rate} AS BIGINT) AS duration_ms,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq,
       CAST(SUM(zc) AS BIGINT) AS zero_crossings
FROM sc GROUP BY media_id"""


def subword_count_sql() -> str:
    """Twin of text.subword_count — the BPE-ish regex pre-tokenizer is the
    same RE2-compatible pattern in both engines."""
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return f"""WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '{pat}') AS toks FROM documents),
c AS (
  SELECT doc_id,
         len(toks) AS n_subwords,
         len(list_filter(toks, x -> regexp_full_match(x, '[A-Za-z]+'))) AS n_alpha_runs,
         len(list_filter(toks, x -> regexp_full_match(x, '[0-9]+'))) AS n_digit_runs
  FROM t)
SELECT doc_id, n_subwords, n_alpha_runs, n_digit_runs,
       n_subwords - n_alpha_runs - n_digit_runs AS n_punct
FROM c"""


def tf_idf_sql(top_k: int = 5) -> str:
    """Twin of text.tf_idf: smooth-idf TF-IDF, top-k per doc, rounded 6dp,
    ties broken (score DESC, tok ASC) — engine-independent."""
    return f"""WITH {DOCS_CTE},
tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       FROM (SELECT doc_id, unnest(toks) AS tok FROM docs) GROUP BY doc_id, tok),
dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM docs),
scored AS (
  SELECT doc_id, tok, tf,
         round(tf * (ln((1.0 + n.n) / (1.0 + df)) + 1.0), 6) AS score
  FROM tf JOIN dfreq USING (tok) CROSS JOIN n),
rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rk
       FROM scored)
SELECT doc_id, tok, tf, score FROM rk WHERE rk <= {top_k}"""


def bm25_sql(query: list[str], k1: float = 1.2, b: float = 0.75) -> str:
    """Twin of text.bm25.  Python-evaluated constants (k1+1, 1-b) are
    injected via repr so both engines parse the identical double; avgdl is
    an exact integer ratio on both sides."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query)
    return f"""WITH {DOCS_CTE},
dl AS (SELECT doc_id, len(toks) AS dl FROM docs),
stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       FROM (SELECT doc_id, unnest(toks) AS tok FROM docs)
       WHERE tok IN ({terms}) GROUP BY doc_id, tok),
dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT t.doc_id,
         ln(1.0 + (stats.n - df + 0.5) / (df + 0.5))
           * (t.tf * {k1 + 1.0!r})
           / (t.tf + {k1!r} * ({1.0 - b!r} + {b!r} * d.dl / stats.avgdl)) AS c
  FROM tf t JOIN dfreq USING (tok) JOIN dl d ON d.doc_id = t.doc_id
  CROSS JOIN stats)
SELECT doc_id, round(sum(c), 6) AS score, CAST(count(*) AS BIGINT) AS matched
FROM contrib GROUP BY doc_id"""


def minhash_groups_sql(
    num_hashes: int = 8, bands: int = 4, n: int = 3, threshold: float = 0.8
) -> str:
    """Twin of dedup.minhash_near_dup_groups: the full minhash_lsh_sql pair
    query (nested as a CTE), connected components by recursive transitive
    closure, representative = MIN member id — same shape as
    embedding_near_dedup_sql."""
    pair_query = minhash_lsh_sql(num_hashes, bands, n, threshold)
    return f"""WITH RECURSIVE pairs AS ({pair_query}),
und AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b AS x, a AS y FROM pairs),
reach AS (
  SELECT x, y FROM und
  UNION
  SELECT r.x, u.y FROM reach r JOIN und u ON r.y = u.x),
mins AS (SELECT x, min(y) AS mn FROM reach GROUP BY x)
SELECT d.doc_id,
       CAST(least(d.doc_id, coalesce(m.mn, d.doc_id)) AS BIGINT) AS rep_id,
       CAST(CASE WHEN coalesce(m.mn, d.doc_id) < d.doc_id THEN 1 ELSE 0 END AS INT)
         AS is_dup
FROM documents d LEFT JOIN mins m ON m.x = d.doc_id"""


def quantize_sql() -> str:
    """Twin of similarity.quantize_embeddings(exploded=True): symmetric
    int8 scalar quantization, scale = max|x|/127 (unrounded scale divides;
    the reported scale column is rounded to 9dp)."""
    return """WITH s AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS sc,
         embedding
  FROM embeddings),
e AS (
  SELECT vec_id, round(sc, 9) AS scale,
         CAST(i AS INTEGER) - 1 AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE)
                    / (CASE WHEN sc > 0 THEN sc ELSE 1.0 END), 0) AS INTEGER) AS q
  FROM s, unnest(range(1, len(embedding) + 1)) t(i))
SELECT vec_id, scale, dim, q FROM e"""


def repetition_ratio_sql(n: int = 3) -> str:
    """Within-doc duplicate n-gram fraction — twin of text.py:repetition_ratio."""
    return f"""WITH {DOCS_CTE},
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {n}
              THEN [array_to_string(toks[i + 1 : i + {n}], ' ')
                    FOR i IN range(len(toks) - {n} + 1)]
              ELSE [] END AS grams
  FROM docs)
SELECT doc_id,
       len(grams) AS n_grams,
       len(list_distinct(grams)) AS n_distinct,
       round(CASE WHEN len(grams) > 0
                  THEN 1.0 - len(list_distinct(grams)) * 1.0 / len(grams)
                  ELSE 0.0 END, 6) AS rep_ratio
FROM g"""


def decontaminate_sql(n: int = 3, threshold: float = 0.05, eval_mod: int = 97) -> str:
    """Benchmark n-gram-overlap contamination flags — twin of
    text.py:decontaminate (self-contained eval sample doc_id % eval_mod == 0)."""
    return f"""WITH {_gram_ctes(n)},
ev AS (SELECT DISTINCT gram FROM gd WHERE doc_id % {eval_mod} = 0),
hits AS (
  SELECT g.doc_id, count(*) AS n_grams, count(e.gram) AS n_hit
  FROM gd g LEFT JOIN ev e ON g.gram = e.gram
  WHERE g.doc_id % {eval_mod} <> 0
  GROUP BY g.doc_id)
SELECT doc_id, n_grams, n_hit,
       round(n_hit * 1.0 / n_grams, 6) AS overlap,
       n_hit * 1.0 / n_grams >= {threshold} AS contaminated
FROM hits"""


PII_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4_SQL = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
PII_PHONE_SQL = "\\+?\\d[\\d\\- ]{7,}\\d"


def pii_scrub_sql(inject: bool = True) -> str:
    """Staged regex PII scrub — twin of text.py:pii_scrub.  `inject=True`
    appends deterministic synthetic PII per doc (the testdata corpus has
    none) so the gate actually exercises the redaction regexes."""
    base = (
        """SELECT doc_id, text || ' reach user' || doc_id ||
       '@example.com or 10.0.' || (doc_id % 200) || '.7 tel +1 555-01' ||
       (doc_id % 90 + 10) || ' now' AS text FROM documents"""
        if inject
        else "SELECT doc_id, text FROM documents"
    )
    return f"""WITH d0 AS ({base}),
d1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{PII_EMAIL_SQL}')) AS n_email,
         regexp_replace(text, '{PII_EMAIL_SQL}', '<EMAIL>', 'g') AS t1
  FROM d0),
d2 AS (
  SELECT doc_id, n_email,
         len(regexp_extract_all(t1, '{PII_IPV4_SQL}')) AS n_ipv4,
         regexp_replace(t1, '{PII_IPV4_SQL}', '<IP>', 'g') AS t2
  FROM d1),
d3 AS (
  SELECT doc_id, n_email, n_ipv4,
         len(regexp_extract_all(t2, '{PII_PHONE_SQL}')) AS n_phone,
         regexp_replace(t2, '{PII_PHONE_SQL}', '<PHONE>', 'g') AS t3
  FROM d2)
SELECT doc_id, t3 AS text_clean, n_email, n_ipv4, n_phone FROM d3"""


def sessionize_sql(gap_minutes: float = 30.0) -> str:
    """Gap-based sessionization of the events table — twin of
    events.py:sessionize (full-precision ts ordering, second-truncated
    gap comparison)."""
    gap_s = repr(gap_minutes * 60.0)
    return f"""WITH e AS (
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep, value
  FROM events),
m AS (
  SELECT *,
         CASE WHEN ep - lag(ep) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR ep - lag(ep) OVER (PARTITION BY user_id ORDER BY ts, event_id) <= {gap_s}
              THEN 0 ELSE 1 END AS newsess
  FROM e),
s AS (
  SELECT *, sum(newsess) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM m)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       min(ep) AS t_start, max(ep) AS t_end,
       CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0
         AS total_value
FROM s GROUP BY user_id, session_id"""


def windowed_event_aggregate_sql(window_minutes: int = 60) -> str:
    """Tumbling-window per-type aggregate — twin of
    events.py:windowed_event_aggregate."""
    win_s = window_minutes * 60
    return f"""WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ep, event_type, value FROM events)
SELECT (ep // {win_s}) * {win_s} AS window_start, event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0
         AS total_value,
       round(max(value), 6) AS max_value
FROM e GROUP BY 1, 2"""


def source_mix_sql() -> str:
    """Corpus composition audit — twin of text.py:source_mix."""
    return f"""WITH {DOCS_CTE}
SELECT d2.source, d2.lang, count(*) AS n_docs,
       CAST(sum(length(docs.text)) AS BIGINT) AS total_chars,
       CAST(sum(len(docs.toks)) AS BIGINT) AS total_tokens
FROM docs JOIN documents d2 USING (doc_id)
GROUP BY d2.source, d2.lang"""


def value_percentiles_sql(percentiles: tuple[int, ...] = (50, 90, 99)) -> str:
    """Exact per-type value percentiles — twin of
    events.py:value_percentiles (integer-grid histogram, pure-BIGINT
    cumulative comparison)."""
    picks = ",\n       ".join(
        f"min(CASE WHEN cum * 100 >= n * {q} THEN v6 END) / 1000000.0 AS p{q}_value"
        for q in percentiles
    )
    return f"""WITH h AS (
  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS v6,
         count(*) AS cnt
  FROM events GROUP BY 1, 2),
c AS (
  SELECT event_type, v6, cnt,
         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY v6
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM h)
SELECT event_type, n,
       {picks}
FROM c GROUP BY event_type, n"""


def heavy_hitters_sql(k: int = 50) -> str:
    """Top-k users by event count — twin of streaming/topk.py (drained
    stream == this batch aggregate; same integer-scaled value sum as the
    windowed-aggregate oracle)."""
    return f"""WITH c AS (
  SELECT user_id, count(*) AS n_events,
         CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS v6
  FROM events GROUP BY user_id),
t AS (SELECT * FROM c ORDER BY n_events DESC, user_id LIMIT {k})
SELECT CAST(row_number() OVER (ORDER BY n_events DESC, user_id) AS INT) AS rank,
       user_id, n_events, v6 / 1000000.0 AS total_value
FROM t"""


def mixture_resample_sql(
    weights: dict[str, float],
    seed: int = 42,
    default_weight: float = 1.0,
) -> str:
    """Deterministic mixture resampling over documents — twin of
    sample.py:mixture_resample (same universal hash, same integer
    floor/threshold copy rule)."""
    from neo4j_graph_algorithms_spark.pipeline.sample import _copies

    a, b = hash_params(seed)
    case = []
    for key, w in sorted(weights.items()):
        base, thr = _copies(float(w))
        case.append(
            f"WHEN lang = '{key}' THEN {base} + CASE WHEN h < {thr} THEN 1 ELSE 0 END"
        )
    dbase, dthr = _copies(float(default_weight))
    case.append(f"ELSE {dbase} + CASE WHEN h < {dthr} THEN 1 ELSE 0 END")
    case_sql = "CASE " + " ".join(case) + " END"
    return f"""WITH base AS (
  SELECT doc_id, lang, ((doc_id % {HASH_P}) * {a} + {b}) % {HASH_P} AS h
  FROM documents),
n AS (SELECT doc_id, lang, {case_sql} AS n FROM base)
SELECT doc_id, lang, CAST(u.c - 1 AS INTEGER) AS copy
FROM n, unnest(generate_series(1, n.n)) AS u(c)
WHERE n >= 1"""


def semantic_dedup_sql(
    threshold: float = 0.8,
    n_centroids: int = 4,
    iterations: int = 2,
    dim: int = 64,
    quantize: int = 6,
    inject_below: int | None = None,
    inject_offset: int = 10000,
) -> str:
    """Twin of dedup.semantic_dedup: the shared deterministic k-means CTEs
    assign cells, cosine is scored within cells only, groups close via a
    recursive-CTE reachability fixpoint, representative = MIN member id —
    identical conventions to embedding_near_dedup_sql."""
    emb_source = "SELECT vec_id, embedding FROM embeddings"
    if inject_below is not None:
        # mirror of the gate's injected exact copies (vec_id+offset)
        emb_source += (
            f" UNION ALL SELECT vec_id + {inject_offset}, embedding"
            f" FROM embeddings WHERE vec_id < {inject_below}"
        )
    kmeans = ",\n".join(
        _kmeans_assign_ctes(n_centroids, iterations, dim, quantize, emb_source)
    )
    return f"""WITH RECURSIVE {kmeans},
nrm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb),
pairs AS (
  SELECT na.vec_id AS a, nb.vec_id AS b
  FROM assign aa JOIN assign ab ON aa.cid = ab.cid AND aa.vec_id < ab.vec_id
  JOIN nrm na ON na.vec_id = aa.vec_id
  JOIN nrm nb ON nb.vec_id = ab.vec_id
  WHERE round(list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm), 6) >= {threshold}),
und AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b AS x, a AS y FROM pairs),
reach AS (
  SELECT x, y FROM und
  UNION
  SELECT r.x, u.y FROM reach r JOIN und u ON r.y = u.x),
mins AS (SELECT x, min(y) AS mn FROM reach GROUP BY x)
SELECT e.vec_id,
       CAST(least(e.vec_id, coalesce(m.mn, e.vec_id)) AS BIGINT) AS rep_id,
       CAST(CASE WHEN coalesce(m.mn, e.vec_id) < e.vec_id THEN 1 ELSE 0 END AS INT)
         AS is_dup
FROM emb e LEFT JOIN mins m ON m.x = e.vec_id"""


def pack_sequences_sql(budget: int = 256) -> str:
    """Pack-and-chop over whitespace token counts in doc_id order — twin of
    pack.py:pack_sequences."""
    b = budget
    return f"""WITH {DOCS_CTE},
tc AS (SELECT doc_id, len(toks) AS n FROM docs WHERE len(toks) > 0),
pre AS (
  SELECT doc_id, n,
         CAST(sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n AS BIGINT)
           AS pre
  FROM tc),
ex AS (
  SELECT doc_id, n, pre, u.s AS seq_id
  FROM pre, unnest(generate_series(pre // {b}, (pre + n - 1) // {b})) u(s))
SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
       CAST(greatest(pre, seq_id * {b}) - pre AS BIGINT) AS doc_offset,
       CAST(greatest(pre, seq_id * {b}) - seq_id * {b} AS BIGINT) AS seq_offset,
       CAST(least(pre + n, seq_id * {b} + {b}) - greatest(pre, seq_id * {b}) AS BIGINT)
         AS n_tokens
FROM ex"""


def unigram_logprob_sql() -> str:
    """Corpus-MLE unigram mean log-prob per document — twin of
    text.py:unigram_logprob."""
    return f"""WITH {DOCS_CTE},
toks AS (SELECT doc_id, unnest(toks) AS tok FROM docs),
tot AS (SELECT count(*) * 1.0 AS t FROM toks),
model AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(ln(m.cnt / (SELECT t FROM tot))), 6) AS avg_logp
FROM toks JOIN model m USING (tok)
GROUP BY doc_id"""


def keep_best_sql(
    num_hashes: int = 8, bands: int = 4, n: int = 3, threshold: float = 0.8
) -> str:
    """Twin of dedup.keep_best_in_groups: minhash_groups_sql nested as a
    CTE, q4 = integer count of quality_score heuristics passed, winner per
    rep_id by (q4 DESC, doc_id ASC)."""
    groups_query = minhash_groups_sql(num_hashes, bands, n, threshold)
    all_markers = ", ".join(
        f"'{m}'" for m in sorted({m for ms in LANG_MARKERS.values() for m in ms})
    )
    return f"""WITH g AS ({groups_query}),
{DOCS_CTE},
m AS (
  SELECT doc_id,
         len(toks) AS n,
         CASE WHEN len(toks) > 0
              THEN (length(text) - (len(toks) - 1)) * 1.0 / len(toks)
              ELSE 0.0 END AS mean_len,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, t -> t IN ({all_markers}))) * 1.0 / len(toks)
              ELSE 0.0 END AS stop_ratio,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
           / greatest(length(text), 1) AS alpha_ratio
  FROM docs),
q AS (
  SELECT doc_id,
         CAST(CASE WHEN n >= 10 AND n <= 100000 THEN 1 ELSE 0 END
            + CASE WHEN mean_len >= 2.0 AND mean_len <= 12.0 THEN 1 ELSE 0 END
            + CASE WHEN stop_ratio >= 0.01 THEN 1 ELSE 0 END
            + CASE WHEN alpha_ratio >= 0.5 THEN 1 ELSE 0 END AS INT) AS q4
  FROM m),
r AS (
  SELECT g.doc_id, g.rep_id, q.q4,
         row_number() OVER (PARTITION BY g.rep_id
                            ORDER BY q.q4 DESC, g.doc_id ASC) AS rn
  FROM g JOIN q USING (doc_id))
SELECT doc_id, rep_id, q4,
       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INT) AS keep
FROM r"""


def video_features_sql(
    n: int = 48,
    width: int = 16,
    height: int = 16,
    n_frames: int = 6,
    every_n: int = 2,
) -> str:
    """Twin of multimodal.video_features over synthesize_video_media's REAL
    AVI/MJPG payloads: block-constant frames — pixel (y,x) of frame f of
    media m = (17·(x//8) + 29·(y//8) + 31·m + 41·f) % 256 — round-trip the
    lossy JPEG codec exactly, so the SQL regenerates sampled-frame pixels
    by formula while Spark walks genuine RIFF containers and Huffman-decodes
    genuine JPEG streams (pipeline/avi.py).  width*height is a power of two
    so floor(avg) is IEEE-exact; every output is an integer."""
    return f"""WITH ids AS (SELECT CAST(i AS BIGINT) AS media_id FROM range({n}) t(i)),
fs AS (SELECT CAST(f AS INT) AS f FROM range(0, {n_frames}, {every_n}) t(f)),
px AS (
  SELECT media_id, f,
         (17 * (x // 8) + 29 * (y // 8) + 31 * media_id + 41 * f) % 256 AS v
  FROM ids, fs, range({width}) tx(x), range({height}) ty(y)),
fm AS (
  SELECT media_id, f,
         CAST(floor(avg(v)) AS BIGINT) AS mean_v, max(v) AS max_v
  FROM px GROUP BY media_id, f)
SELECT media_id,
       CAST({n_frames} AS INT) AS n_frames,
       CAST({width} AS INT) AS width,
       CAST({height} AS INT) AS height,
       CAST(count(*) AS INT) AS sampled_frames,
       CAST(sum(mean_v) AS BIGINT) AS sum_mean_intensity,
       CAST(max(max_v) AS INT) AS max_intensity
FROM fm GROUP BY media_id"""


def hash_split_sql(fractions: dict[str, float] | None = None, seed: int = 7) -> str:
    """Twin of sample.hash_split: same universal hash, same integer
    interval bounds (sample.split_bounds is the shared source of truth)."""
    from neo4j_graph_algorithms_spark.pipeline.sample import split_bounds

    bounds = split_bounds(fractions)
    a, b = hash_params(seed)
    if len(bounds) == 1:
        split_expr = f"'{bounds[-1][0]}'"
    else:
        whens = " ".join(
            f"WHEN h < {hi} THEN '{name}'" for name, hi in bounds[:-1]
        )
        split_expr = f"CASE {whens} ELSE '{bounds[-1][0]}' END"
    return f"""WITH base AS (
  SELECT doc_id, ((doc_id % {HASH_P}) * {a} + {b}) % {HASH_P} AS h
  FROM documents)
SELECT doc_id, {split_expr} AS split FROM base"""


def bpe_train_sql(num_merges: int = 6) -> str:
    """Twin of bpe.bpe_train: the same k greedy merge rounds over the word
    histogram, each round's winner by (count DESC, left, right) and each
    merge applied via the identical anchored-string replace() (DuckDB's
    replace scans left-to-right non-overlapping, byte-for-byte the same
    greedy semantics as Spark's F.replace — probed in tests)."""
    S = "\x1f"
    parts = [
        DOCS_CTE,
        """wh AS (
  SELECT word, count(*) AS cnt
  FROM (SELECT unnest(toks) AS word FROM docs) GROUP BY word)""",
        f"""w0 AS MATERIALIZED (
  SELECT cnt, regexp_replace(word, '(?s)(.)', '{S}\\1{S}', 'g') AS s
  FROM wh WHERE length(word) > 0)""",
    ]
    for r in range(num_merges):
        parts.append(
            f"""p{r} AS MATERIALIZED (
  SELECT y.syms[i + 1] AS l, y.syms[i + 2] AS r2, sum(y.cnt) AS c
  FROM (SELECT cnt, string_split(s[2:-2], '{S}{S}') AS syms FROM w{r}) y,
       unnest(range(len(y.syms) - 1)) t(i)
  GROUP BY 1, 2),
top{r} AS MATERIALIZED (SELECT l, r2, c FROM p{r} ORDER BY c DESC, l ASC, r2 ASC LIMIT 1)"""
        )
        if r + 1 < num_merges:
            parts.append(
                f"""w{r + 1} AS MATERIALIZED (
  SELECT cnt,
         replace(s,
                 coalesce('{S}' || (SELECT l FROM top{r}) || '{S}{S}' ||
                   (SELECT r2 FROM top{r}) || '{S}', chr(0)),
                 coalesce('{S}' || (SELECT l FROM top{r}) ||
                   (SELECT r2 FROM top{r}) || '{S}', '')) AS s
  FROM w{r})"""
            )
    levels = " UNION ALL ".join(
        f"SELECT {r} AS merge_rank, l, r2, c FROM top{r}" for r in range(num_merges)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(merge_rank AS INT) AS merge_rank,
       l AS "left", r2 AS "right", CAST(c AS BIGINT) AS pair_count
FROM ({levels}) ORDER BY merge_rank"""
    )


def length_stats_sql(percentiles: tuple[int, ...] = (50, 90, 99)) -> str:
    """Twin of text.length_stats: histogram + cumulative count, discrete
    percentile by the pure-BIGINT 100*cum >= n*q rule."""
    pct_cols = ",\n       ".join(
        f"(SELECT min(n) FROM cum, tot WHERE cum.cum * 100 >= tot.n_docs * {q})"
        f" AS p{q}_tokens"
        for q in percentiles
    )
    return f"""WITH {DOCS_CTE},
lens AS (SELECT len(toks) AS n FROM docs),
hist AS (SELECT n, count(*) AS cnt FROM lens GROUP BY n),
cum AS (SELECT n, cnt, sum(cnt) OVER (ORDER BY n) AS cum FROM hist),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n_docs,
         CAST(min(n) AS BIGINT) AS min_tokens,
         CAST(max(n) AS BIGINT) AS max_tokens,
         CAST(sum(n * cnt) AS BIGINT) AS sum_tokens
  FROM hist)
SELECT n_docs, min_tokens, max_tokens, sum_tokens,
       {pct_cols}
FROM tot"""


def bpe_segment_sql(num_merges: int = 6) -> str:
    """Twin of bpe.bpe_segment over the TABLE LEARNED BY bpe_train(k) on
    the same corpus: replays the k merge rounds (same MATERIALIZED chain as
    bpe_train_sql, but carrying the word through), then counts per-document
    subwords by joining each document's words against the final
    segmentation."""
    S = "\x1f"
    parts = [
        DOCS_CTE,
        """wh AS (
  SELECT word, count(*) AS cnt
  FROM (SELECT unnest(toks) AS word FROM docs) GROUP BY word)""",
        f"""w0 AS MATERIALIZED (
  SELECT word, cnt, regexp_replace(word, '(?s)(.)', '{S}\\1{S}', 'g') AS s
  FROM wh WHERE length(word) > 0)""",
    ]
    for r in range(num_merges):
        parts.append(
            f"""p{r} AS MATERIALIZED (
  SELECT y.syms[i + 1] AS l, y.syms[i + 2] AS r2, sum(y.cnt) AS c
  FROM (SELECT cnt, string_split(s[2:-2], '{S}{S}') AS syms FROM w{r}) y,
       unnest(range(len(y.syms) - 1)) t(i)
  GROUP BY 1, 2),
top{r} AS MATERIALIZED (SELECT l, r2, c FROM p{r} ORDER BY c DESC, l ASC, r2 ASC LIMIT 1)"""
        )
        parts.append(
            f"""w{r + 1} AS MATERIALIZED (
  SELECT word, cnt,
         replace(s,
                 coalesce('{S}' || (SELECT l FROM top{r}) || '{S}{S}' ||
                   (SELECT r2 FROM top{r}) || '{S}', chr(0)),
                 coalesce('{S}' || (SELECT l FROM top{r}) ||
                   (SELECT r2 FROM top{r}) || '{S}', '')) AS s
  FROM w{r})"""
        )
    parts.append(
        f"""seg AS MATERIALIZED (
  SELECT word, len(string_split(s[2:-2], '{S}{S}')) AS n_sub
  FROM w{num_merges})"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(g.n_sub) AS BIGINT) AS n_subwords
FROM (SELECT doc_id, unnest(toks) AS word FROM docs) d
JOIN seg g USING (word)
GROUP BY d.doc_id"""
    )


def funnel_sql(steps: list[str], window_minutes: float = 24 * 60.0) -> str:
    """Ordered conversion funnel over events — twin of events.py:funnel
    (min-(ep,event_id) anchors, strictly-after tuple comparison, deadline
    from the step-0 epoch).  CTEs MATERIALIZED per the repo's multi-round
    chain rule."""
    win_s = int(round(window_minutes * 60.0))
    ctes = [
        """e AS MATERIALIZED (
  SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         event_id AS eid, event_type AS t
  FROM events)""",
        f"""s0 AS MATERIALIZED (
  SELECT u, ep, eid, ep AS ep0 FROM (
    SELECT u, ep, eid,
           row_number() OVER (PARTITION BY u ORDER BY ep, eid) AS rn
    FROM e WHERE t = '{steps[0]}') WHERE rn = 1)""",
    ]
    for i, step in enumerate(steps[1:], start=1):
        ctes.append(
            f"""s{i} AS MATERIALIZED (
  SELECT u, ep, eid, ep0 FROM (
    SELECT p.u, n.ep, n.eid, p.ep0,
           row_number() OVER (PARTITION BY p.u ORDER BY n.ep, n.eid) AS rn
    FROM s{i - 1} p JOIN e n ON n.u = p.u AND n.t = '{step}'
     AND (n.ep > p.ep OR (n.ep = p.ep AND n.eid > p.eid))
     AND n.ep <= p.ep0 + {win_s}) WHERE rn = 1)"""
        )
    selects = [
        f"SELECT CAST({i} AS INTEGER) AS step_idx, '{s}' AS step, "
        f"(SELECT count(*) FROM s{i}) AS n_users"
        for i, s in enumerate(steps)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def retention_sql(period_days: int = 1) -> str:
    """Cohort retention counts — twin of events.py:retention_cohorts."""
    period_s = period_days * 86400
    return f"""WITH b AS (
  SELECT user_id AS u,
         (CAST(floor(epoch(ts)) AS BIGINT) // {period_s}) * {period_s} AS p
  FROM events),
f AS (SELECT u, min(p) AS cohort_start FROM b GROUP BY u),
a AS (SELECT DISTINCT u, p FROM b)
SELECT cohort_start, (p - cohort_start) // {period_s} AS period_offset,
       count(*) AS n_users
FROM a JOIN f USING (u) GROUP BY 1, 2"""


def transitions_sql() -> str:
    """First-order event-type transition counts — twin of
    events.py:event_transitions (full-precision ts order, event_id ties)."""
    return """WITH o AS (
  SELECT event_type AS to_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS from_type
  FROM events)
SELECT from_type, to_type, count(*) AS n_pairs
FROM o WHERE from_type IS NOT NULL GROUP BY 1, 2"""


def chunk_sql(chunk_chars: int = 120, overlap: int = 30) -> str:
    """Sliding-window character chunking — twin of
    text.py:chunk_documents (same n_chunks = max(1, ceil((len-overlap)/
    stride)) contract, 1-based substr in both engines)."""
    stride = chunk_chars - overlap
    return f"""WITH d AS (
  SELECT doc_id, text,
         greatest(1, CAST(ceil((length(text) - {overlap}) * 1.0 / {stride})
                          AS INTEGER)) AS n_chunks
  FROM documents),
c AS (
  SELECT doc_id, text, unnest([i FOR i IN range(n_chunks)]) AS i FROM d)
SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
       CAST(i * {stride} AS INTEGER) AS chunk_start,
       substr(text, CAST(i * {stride} + 1 AS INTEGER), {chunk_chars}) AS chunk_text
FROM c"""


def top_ngrams_sql(n: int = 2, k: int = 50) -> str:
    """Corpus top-k word n-grams — twin of text.py:top_ngrams (count desc,
    ngram asc ties; same slice-based gram construction as
    repetition_ratio_sql)."""
    return f"""WITH {DOCS_CTE},
g AS (
  SELECT unnest(CASE WHEN len(toks) >= {n}
                     THEN [array_to_string(toks[i + 1 : i + {n}], ' ')
                           FOR i IN range(len(toks) - {n} + 1)]
                     ELSE [] END) AS ngram
  FROM docs),
c AS (SELECT ngram, count(*) AS n_count FROM g GROUP BY ngram)
SELECT ngram, n_count,
       CAST(row_number() OVER (ORDER BY n_count DESC, ngram ASC) AS INTEGER)
         AS rank
FROM c ORDER BY n_count DESC, ngram ASC LIMIT {k}"""


def gram_matrix_sql(scale: int = 1000) -> str:
    """Exact integer-scaled Gram matrix (upper triangle) — twin of
    similarity.py:gram_matrix.  SUM over BIGINT products is HUGEINT in
    DuckDB — CAST back to BIGINT before the divide (the audio_features
    HUGEINT hash-mismatch lesson, pipeline/oracles.py:audio_features_sql)."""
    denom = scale * scale
    return f"""WITH q AS (
  SELECT vec_id, CAST(i AS INTEGER) - 1 AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * {scale}) AS BIGINT) AS q
  FROM embeddings, unnest(range(1, len(embedding) + 1)) t(i))
SELECT a.dim AS i, b.dim AS j,
       round(CAST(SUM(a.q * b.q) AS BIGINT) / {denom}.0, 6) AS gram
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY 1, 2"""


def bigram_logprob_sql() -> str:
    """Mean MLE bigram log-prob per document — twin of
    text.py:bigram_logprob (ln terms rounded to 6dp FIRST, integer-scaled
    exact sum; head counts CAST from HUGEINT)."""
    return f"""WITH {DOCS_CTE},
g AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 2
                     THEN [array_to_string(toks[i + 1 : i + 2], ' ')
                           FOR i IN range(len(toks) - 1)]
                     ELSE [] END) AS gram
  FROM docs),
bi AS (SELECT gram, count(*) AS c2 FROM g GROUP BY gram),
heads AS (
  SELECT string_split(gram, ' ')[1] AS head,
         CAST(sum(c2) AS BIGINT) AS c1
  FROM bi GROUP BY 1),
scored AS (
  SELECT doc_id,
         CAST(round(round(ln(c2 * 1.0 / c1), 6) * 1000000) AS BIGINT) AS lp6
  FROM g JOIN bi USING (gram)
  JOIN heads ON string_split(g.gram, ' ')[1] = heads.head)
SELECT doc_id, count(*) AS n_bigrams,
       round(CAST(SUM(lp6) AS BIGINT) / (count(*) * 1000000.0), 6) AS avg_logp
FROM scored GROUP BY doc_id"""


def trigram_logprob_sql(
    l3: float = 0.6, l2: float = 0.3, l1: float = 0.1
) -> str:
    """Mean Jelinek-Mercer interpolated trigram log-prob per document —
    twin of text.py:trigram_logprob.  Same fixed left-associated
    interpolation expression, 6dp-first ln terms, integer-scaled sums."""
    return f"""WITH {DOCS_CTE},
g3 AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 3
                     THEN [array_to_string(toks[i + 1 : i + 3], ' ')
                           FOR i IN range(len(toks) - 2)]
                     ELSE [] END) AS gram
  FROM docs),
g2 AS (
  SELECT unnest(CASE WHEN len(toks) >= 2
                     THEN [array_to_string(toks[i + 1 : i + 2], ' ')
                           FOR i IN range(len(toks) - 1)]
                     ELSE [] END) AS gram
  FROM docs),
g1 AS (SELECT unnest(toks) AS tok FROM docs),
c3 AS (SELECT gram, count(*) AS c3 FROM g3 GROUP BY gram),
h3 AS (
  SELECT string_split(gram, ' ')[1] || ' ' || string_split(gram, ' ')[2] AS h,
         CAST(sum(c3) AS BIGINT) AS ch3
  FROM c3 GROUP BY 1),
c2 AS (SELECT gram, count(*) AS c2 FROM g2 GROUP BY gram),
h2 AS (
  SELECT string_split(gram, ' ')[1] AS h, CAST(sum(c2) AS BIGINT) AS ch2
  FROM c2 GROUP BY 1),
c1 AS (SELECT tok, count(*) AS c1 FROM g1 GROUP BY tok),
nt AS (SELECT count(*) AS n FROM g1),
scored AS (
  SELECT doc_id,
         CAST(round(round(ln({l3!r} * (c3.c3 * 1.0 / h3.ch3)
                             + {l2!r} * (c2.c2 * 1.0 / h2.ch2)
                             + {l1!r} * (c1.c1 * 1.0 / nt.n)), 6)
                    * 1000000) AS BIGINT) AS lp6
  FROM g3
  JOIN c3 ON c3.gram = g3.gram
  JOIN h3 ON h3.h = string_split(g3.gram, ' ')[1] || ' ' || string_split(g3.gram, ' ')[2]
  JOIN c2 ON c2.gram = string_split(g3.gram, ' ')[2] || ' ' || string_split(g3.gram, ' ')[3]
  JOIN h2 ON h2.h = string_split(g3.gram, ' ')[2]
  JOIN c1 ON c1.tok = string_split(g3.gram, ' ')[3]
  CROSS JOIN nt)
SELECT doc_id, count(*) AS n_trigrams,
       round(CAST(SUM(lp6) AS BIGINT) / (count(*) * 1000000.0), 6) AS avg_logp
FROM scored GROUP BY doc_id"""


def readability_sql() -> str:
    """Flesch Reading Ease per document — twin of text.py:readability
    (same vowel-run syllable heuristic, punctuation-run sentences floored
    at 1, fixed left-associated formula)."""
    return f"""WITH {DOCS_CTE},
c AS (
  SELECT doc_id,
         len(toks) AS n_words,
         greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
         list_sum(list_transform(toks,
           t -> greatest(1, len(regexp_extract_all(lower(t), '[aeiouy]+'))))) AS n_syllables
  FROM docs WHERE len(toks) >= 1)
SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
       CAST(n_sentences AS INTEGER) AS n_sentences,
       CAST(n_syllables AS INTEGER) AS n_syllables,
       round(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                     - 84.6 * (n_syllables * 1.0 / n_words), 6) AS flesch
FROM c"""


def token_entropy_sql() -> str:
    """Within-doc token Shannon entropy — twin of text.py:token_entropy
    (6dp-first terms, integer-scaled exact sums)."""
    return f"""WITH {DOCS_CTE},
t AS (SELECT doc_id, unnest(toks) AS tok FROM docs),
per AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok),
tot AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct
  FROM per GROUP BY doc_id),
s AS (
  SELECT per.doc_id, tot.n_tokens, tot.n_distinct,
         CAST(round(round(-((per.c * 1.0 / tot.n_tokens)
                           * ln(per.c * 1.0 / tot.n_tokens)), 6)
                    * 1000000) AS BIGINT) AS e6
  FROM per JOIN tot USING (doc_id))
SELECT doc_id, n_tokens, n_distinct,
       round(CAST(sum(e6) AS BIGINT) / 1000000.0, 6) AS entropy
FROM s GROUP BY doc_id, n_tokens, n_distinct"""


def burstiness_sql(min_gaps: int = 2) -> str:
    """Goh-Barabasi burstiness per user — twin of events.py:burstiness
    (second-truncated epoch gaps under (ts, event_id) order, exact BIGINT
    sums, identical mu/sigma/B expression shape)."""
    return f"""WITH e AS (
  SELECT user_id, event_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events),
g AS (
  SELECT user_id,
         ep - lag(ep) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM e),
a AS (
  SELECT user_id, count(*) AS n_gaps,
         CAST(sum(gap) AS BIGINT) AS s1,
         CAST(sum(gap * gap) AS BIGINT) AS s2
  FROM g WHERE gap IS NOT NULL GROUP BY user_id),
f AS (
  SELECT user_id, n_gaps,
         s1 * 1.0 / n_gaps AS mu,
         sqrt(greatest((s2 * 1.0 - (s1 * 1.0) * (s1 * 1.0) / n_gaps) / n_gaps, 0.0)) AS sd
  FROM a WHERE n_gaps >= {min_gaps})
SELECT user_id, n_gaps, round(mu, 6) AS mean_gap_s,
       CASE WHEN sd + mu > 0 THEN round((sd - mu) / (sd + mu), 6) END AS burstiness
FROM f"""


def stratified_take_sql(k: int, seed: int = 13) -> str:
    """Deterministic per-stratum fixed-size sample — twin of
    sample.py:stratified_take (same universal hash, hash-then-id order)."""
    a, b = hash_params(seed)
    return f"""WITH h AS (
  SELECT *, ((doc_id % {HASH_P}) * {a} + {b}) % {HASH_P} AS hh
  FROM documents),
r AS (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rn
  FROM h)
SELECT doc_id, text, lang, source, n_chars, CAST(rn AS INTEGER) AS sample_rank
FROM r WHERE rn <= {k}"""


def user_activity_sql() -> str:
    """Per-user RFM feature block — twin of
    events.py:user_activity_features (exact integer-scaled value sum,
    epoch-integer day grid)."""
    return """WITH e AS (
  SELECT user_id, event_type, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events)
SELECT user_id, count(*) AS n_events,
       count(DISTINCT event_type) AS n_types,
       count(DISTINCT ep // 86400) AS n_active_days,
       min(ep) AS first_ep, max(ep) AS last_ep,
       CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0
         AS total_value
FROM e GROUP BY user_id"""


def ann_recall_sql(
    n_centroids: int = 4,
    iterations: int = 2,
    dim: int = 64,
    k: int = 5,
    n_probes: int = 2,
    max_query_id: int = 8,
    quantize: int = 6,
) -> str:
    """Twin of pipeline/similarity.py:ann_recall evaluated over the exact
    cosine top-k (cosine_topk_sql) vs the IVF probe result (ivf_search_sql)
    with identical parameters — the two existing oracle chains nested as
    CTE bodies, joined on (query_id, neighbor_id), recall as BIGINT floor
    division (DuckDB `//` == Spark `div` for positive integers)."""
    exact = cosine_topk_sql(k=k, max_query_id=max_query_id)
    approx = ivf_search_sql(
        n_centroids=n_centroids,
        iterations=iterations,
        dim=dim,
        k=k,
        n_probes=n_probes,
        max_query_id=max_query_id,
        quantize=quantize,
    )
    return f"""WITH exact AS MATERIALIZED (
{exact}
), approx AS MATERIALIZED (
{approx}
),
ne AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id),
na AS (SELECT query_id, count(*) AS n_approx FROM approx GROUP BY query_id),
hits AS (
  SELECT e.query_id, count(*) AS hits
  FROM exact e JOIN approx a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY e.query_id)
SELECT ne.query_id, ne.n_exact,
       coalesce(na.n_approx, 0) AS n_approx,
       coalesce(h.hits, 0) AS hits,
       coalesce(h.hits, 0) * 1000000 // ne.n_exact AS recall_q6
FROM ne LEFT JOIN na ON na.query_id = ne.query_id
LEFT JOIN hits h ON h.query_id = ne.query_id"""


def collocations_sql(min_count: int = 5, per_head_k: int = 3) -> str:
    """Twin of text.py:collocations — identical adjacent-pair extraction
    (bigram_logprob_sql's list comprehension), bigram-position marginals,
    and floor-division lift in HUGEINT (DuckDB `//` == Spark decimal
    `div` for positive operands)."""
    return f"""WITH {DOCS_CTE},
g AS (
  SELECT unnest(CASE WHEN len(toks) >= 2
                     THEN [struct_pack(x := toks[i + 1], y := toks[i + 2])
                           FOR i IN range(len(toks) - 1)]
                     ELSE [] END) AS p
  FROM docs),
cxy AS (SELECT p.x AS x, p.y AS y, count(*) AS c_xy FROM g GROUP BY 1, 2),
heads AS (SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x FROM cxy GROUP BY x),
tails AS (SELECT y, CAST(sum(c_xy) AS BIGINT) AS c_y FROM cxy GROUP BY y),
n AS (SELECT CAST(sum(c_xy) AS BIGINT) AS _n FROM cxy),
scored AS (
  SELECT c.x, c.y, c.c_xy, h.c_x, t.c_y,
         CAST(CAST(c.c_xy AS HUGEINT) * n._n * 1000000
              // (CAST(h.c_x AS HUGEINT) * t.c_y) AS BIGINT) AS lift_q6
  FROM cxy c JOIN heads h USING (x) JOIN tails t USING (y) CROSS JOIN n
  WHERE c.c_xy >= {min_count})
SELECT x, y, c_xy, c_x, c_y, lift_q6, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY x ORDER BY lift_q6 DESC, y) AS rank
  FROM scored) z WHERE rank <= {per_head_k}"""


def pca_planted_sql() -> str:
    """Value twin of similarity.py:pca_project over the planted-spectrum
    table (sources/synth.py:planted_spectrum_embeddings): the 3-4-5
    rotation design has a CLOSED-FORM eigendecomposition (eigenvectors
    ±block columns, eigenvalues the planted Σc²), so the expected
    projection of every (row, component) pair is a literal — row (j, c)
    projects to ±c on the component ranked by λ_j and exactly 0 elsewhere,
    and every literal is a multiple of 0.05 (≥8 decimal digits away from
    any 1e-6 rounding boundary, so eigh float noise cannot move a value)."""
    from neo4j_graph_algorithms_spark.sources.synth import (
        planted_spectrum_expected,
    )

    values = ",\n".join(
        f"  ({vid}, {comp}, {value!r})"
        for vid, comp, value in planted_spectrum_expected()
    )
    return f"""SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(component AS INTEGER) AS component,
       CAST(value AS DOUBLE) AS value
FROM (VALUES
{values}
) AS t(vec_id, component, value)"""


def span_dedup_sql(n: int = 5, min_count: int = 2) -> str:
    """Exact duplicated-span removal — twin of dedup.py:span_dedup.  Pure
    integer/string relational plan (position grams → multiplicity counts →
    covered-position expansion → anti-join → ordered string_agg), so the two
    engines cannot disagree on any float boundary."""
    return f"""WITH {DOCS_CTE},
g AS (
  SELECT doc_id, i AS pos, array_to_string(toks[i + 1 : i + {n}], ' ') AS gram
  FROM docs, unnest(range(greatest(len(toks) - {n} + 1, 0))) t(i)),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= {min_count}),
cov AS (
  SELECT DISTINCT g.doc_id, g.pos + j AS pos
  FROM g JOIN dup USING (gram), unnest(range({n})) u(j)),
tok AS (
  SELECT doc_id, i AS pos, toks[i + 1] AS tok
  FROM docs, unnest(range(len(toks))) t(i)),
kept AS (
  SELECT t.doc_id, t.pos, t.tok FROM tok t
  WHERE NOT EXISTS (
    SELECT 1 FROM cov c WHERE c.doc_id = t.doc_id AND c.pos = t.pos)),
agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id)
SELECT d.doc_id, len(d.toks) AS n_tokens,
       len(d.toks) - coalesce(a.n_kept, 0) AS n_removed,
       coalesce(a.clean_text, '') AS clean_text
FROM docs d LEFT JOIN agg a USING (doc_id)"""


def asof_join_sql(left_type: str = "purchase", right_type: str = "click") -> str:
    """Per-user AS-OF join — twin of events.py:asof_join.  Written with the
    SAME union-tag + running last_value(IGNORE NULLS) construction instead
    of DuckDB's native ASOF JOIN, because the native form leaves ties among
    equal right timestamps unspecified; this way both engines share one
    deterministic ordering (ts, side, eid).  All integers (epoch_us)."""
    return f"""WITH tagged AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id AS eid, 0 AS side
  FROM events WHERE event_type = '{right_type}'
  UNION ALL
  SELECT user_id, epoch_us(ts) AS ts_us, event_id AS eid, 1 AS side
  FROM events WHERE event_type = '{left_type}'),
runs AS (
  SELECT user_id, ts_us, eid, side,
         last_value(CASE WHEN side = 0 THEN eid END IGNORE NULLS)
           OVER w AS matched_event_id,
         last_value(CASE WHEN side = 0 THEN ts_us END IGNORE NULLS)
           OVER w AS matched_ts_us
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, eid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT eid AS event_id, user_id, ts_us, matched_event_id, matched_ts_us,
       ts_us - matched_ts_us AS lag_us
FROM runs WHERE side = 1"""


def zipf_alpha_sql(fmin: int = 2) -> str:
    """Zipf-tail MLE over token frequencies — twin of text.py:zipf_alpha.
    Same 1e-6-grid integer log-term contract as oracles.degree_powerlaw_sql,
    expressions textually mirroring the Spark op order."""
    return f"""WITH {DOCS_CTE},
freq AS (
  SELECT tok, count(*) AS f
  FROM (SELECT unnest(toks) AS tok FROM docs) GROUP BY tok),
hist AS (SELECT f, count(*) AS cnt FROM freq WHERE f >= {fmin} GROUP BY f),
agg AS (
  SELECT sum(cnt) AS n_tail,
         sum(CAST(round(ln(f / ({fmin} - 0.5)) * 1000000.0, 0) AS BIGINT)
             * cnt) AS s_q6
  FROM hist)
SELECT CAST({fmin} AS BIGINT) AS fmin,
       CAST(n_tail AS BIGINT) AS n_tail,
       round(1.0 + n_tail * 1000000.0 / s_q6, 6) AS alpha_q6,
       round((1.0 + n_tail * 1000000.0 / s_q6 - 1.0) / sqrt(n_tail), 6)
         AS sigma_q6
FROM agg"""


def winnowing_sql(k: int = 4, window: int = 4) -> str:
    """MOSS winnowing fingerprints — twin of pipeline/text.winnow_fingerprints
    (dictionary mode).  Same rolling k-gram polynomial over tids, same
    packed (kh * 2^20 + (2^20-1-pos)) integer so one window-min realizes
    the rightmost-min robust tie-break."""
    cap = 1 << 20
    leads = "".join(
        f",\n         lead(tid, {j}) OVER w AS l{j}" for j in range(1, k)
    )
    kh = "tid"
    for j in range(1, k):
        kh = f"(({kh}) * 31 + l{j}) % {HASH_P}"
    full_kgram = f"WHERE l{k - 1} IS NOT NULL" if k > 1 else ""
    return f"""WITH {DOCS_CTE},
{TOKEN_DICT_CTES},
tp AS (
  SELECT t.doc_id, t.i, d.tid{leads}
  FROM tokpos t JOIN dict d USING (tok)
  WINDOW w AS (PARTITION BY t.doc_id ORDER BY t.i)),
kg AS (
  SELECT doc_id, i AS pos, {kh} AS kh
  FROM tp {full_kgram}),
mn AS (
  SELECT doc_id,
         min(kh * {cap} + ({cap} - 1 - pos))
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS mp,
         lead(kh, {window - 1}) OVER (PARTITION BY doc_id ORDER BY pos) AS full_w
  FROM kg)
SELECT DISTINCT doc_id,
       {cap} - 1 - (mp % {cap}) AS pos,
       mp // {cap} AS gram_hash
FROM mn WHERE full_w IS NOT NULL"""


def containment_sql(n: int = 3, threshold: float = 0.8) -> str:
    """Ordered-pair n-gram containment — twin of
    pipeline/dedup.ngram_containment_pairs (one integer division rounded
    6dp, threshold on the rounded value)."""
    return f"""WITH {_gram_ctes(n)},
sz AS (SELECT doc_id, count(*) AS sz FROM gd GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_inter
  FROM gd a JOIN gd b ON b.gram = a.gram AND b.doc_id <> a.doc_id
  GROUP BY 1, 2),
scored AS (
  SELECT i.a, i.b, round(CAST(i.n_inter AS DOUBLE) / sa.sz, 6) AS containment
  FROM inter i JOIN sz sa ON sa.doc_id = i.a)
SELECT a, b, containment FROM scored WHERE containment >= {threshold}"""
