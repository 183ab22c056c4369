"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query side is tiny and broadcast; the candidate scan is map-side
  (zip_with dot product in codegen'd JVM expressions), the only shuffle
  is the per-query top-k window.
- ``lsh_bucketed_topk`` / ``embedding_near_dup_pairs``: the scale path —
  random-hyperplane (sign-bit) LSH signatures, *banded* exactly like the
  MinHash LSH for text: EMB_PLANES sign bits split into EMB_BANDS bands;
  two vectors are candidates iff they agree on ≥1 whole band.  The join
  key (band_idx, band_val) has cardinality n_bands · 2^band_bits and
  is data-spread (random hyperplanes), so no constant-8-bucket skew
  magnet.  At corpus scale, pass ``n_vectors`` and the band width is
  DERIVED (``derive_lsh_params``: band_bits ≈ log2(n) − log2(target
  bucket rows)) with a measured bucket-balance invariant that fails
  loudly on a degenerate bucketing; the pinned test-scale constants
  (no ``n_vectors``) keep the oracle shape bit-stable.

Hyperplanes are deterministic ±1 vectors over ALL embedding dimensions
(an LCG expanded at import), embedded as literals in both the Spark
expressions and the DuckDB oracle — same constants, same sequential
left-fold order, so sign bits and cosines match bit-for-bit.

Float→double casts happen before any arithmetic and the fold order is the
sequential left fold in BOTH engines, so oracle values match bit-for-bit
(rounded to 6 decimals as a belt-and-braces guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ._persist import scratch_persist

N_QUERIES = 8       # vec_id < N_QUERIES form the query set
TOP_K = 5
EMB_DIM = 64        # testdata embeddings.parquet dimension
# Pinned TEST-SCALE LSH constants: the DuckDB oracles embed these, so they
# never move.  At corpus scale the band width is DERIVED from cardinality
# instead — see derive_lsh_params (VERDICT r3: a fixed 4-bit band makes the
# banded self-join degenerate toward N²/16 candidate pairs at 10^9 vectors).
EMB_PLANES = 16     # sign-bit hyperplanes
EMB_BANDS = 4       # bands of EMB_PLANES / EMB_BANDS bits each
EMB_BAND_BITS = EMB_PLANES // EMB_BANDS

# Scale parameterization: expected rows per (band_idx, band_val) bucket.
# band_bits ≈ log2(n_vectors) − log2(TARGET_BUCKET_ROWS), so candidate
# pairs per bucket stay ~TARGET² regardless of corpus size.
TARGET_BUCKET_ROWS = 256
# The packed signature is ONE signed BIGINT (weights 1<<p), so
# n_bands · band_bits ≤ 62 — enforced per-call from the caller's n_bands
# in derive_lsh_params.  With the default 4 bands that caps band_bits at
# 15 (60 planes — the same key width as the SimHash pigeonhole bands),
# i.e. ~2^15 · TARGET ≈ 8M vectors per band at nominal balance; past
# that the loud balance invariant below fires and the right tool is
# the IVF path (ivf_topk), whose list count scales as sqrt(n).
# balance invariant headroom: real embeddings are correlated, so buckets
# skew above the uniform expectation; 16× is generous for a healthy run
# and still orders of magnitude below a degenerate one
_BALANCE_HEADROOM = 16
# hard per-bucket cap inside the verify UDF itself: the pinned-constant
# path (n_vectors omitted) runs WITHOUT the derive_lsh_params balance
# probe, so a degenerate corpus (10^5 near-identical vectors sharing
# every band) must fail loudly in-task instead of grinding through
# m²/2 pairs; the parameterized path's invariant allows at most
# _BALANCE_HEADROOM·TARGET_BUCKET_ROWS = 4096 rows, well under this
_BUCKET_VERIFY_CAP = 8192


def derive_lsh_params(
    n_vectors: int,
    n_bands: int = EMB_BANDS,
    target_bucket_rows: int = TARGET_BUCKET_ROWS,
) -> dict[str, int]:
    """Corpus-size-derived banding: band_bits = max(pinned,
    ceil(log2(n/target))), capped by the 64-bit packed signature.
    Monotone in n_vectors — a 10× corpus always gets equal-or-wider
    bands (pinned small-scale constants are the floor, so tiny corpora
    keep the oracle-exact shape)."""
    import math

    need = math.ceil(math.log2(max(n_vectors / target_bucket_rows, 1.0)))
    band_bits = min(max(EMB_BAND_BITS, need), 62 // n_bands)
    return {
        "n_planes": n_bands * band_bits,
        "band_bits": band_bits,
        "n_bands": n_bands,
        "buckets_per_band": 1 << band_bits,
    }


def _hyperplanes(n_planes: int = EMB_PLANES, dim: int = EMB_DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix from a fixed LCG — identical
    constants on the Spark and DuckDB sides.  Sequential generation means
    the pinned 16-plane set is a strict PREFIX of any derived wider set."""
    state = 0x5DEECE66D
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(1 if (state >> 32) & 1 else -1)
        planes.append(row)
    return planes


_PLANES = _hyperplanes()


_DOT = (
    "aggregate(zip_with(qe, ce, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
)
_NORM = "sqrt(aggregate({col}, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))"




def _norm_col() -> F.Column:
    """The vector-norm fold, for hoisting BELOW a join: norms are
    per-vector quantities, but inlined into the cosine they re-run per
    PAIR — on low-precision candidate sets (the 0.42-τ band join yields
    ~1000 pairs per vector at sf0.1) that tripled the verify compute.
    Evaluating the identical fold once per vector keeps the value
    bit-for-bit equal to the oracle's inline form, and the join boundary
    stops CollapseProject from re-inlining it (CLAUDE.md trap)."""
    return F.expr(_NORM.format(col="embedding"))


def _with_cosine(pairs: DataFrame) -> DataFrame:
    """Score a pair frame carrying qe/ce and hoisted qnorm/cnorm.

    Stays a JVM HOF fold deliberately for its remaining consumers
    (cosine_topk's broadcast cross join, lsh_bucketed_topk's ~10³
    query-candidate pairs): shipping two 64-float vectors per pair
    through Arrow costs more than the interpreted fold saves at those
    pair counts (r4 A/B: warm walls 6.5→9.8 s when a per-pair pandas UDF
    replaced this on the old join-shaped embedding_near_dup_pairs).  The
    dense-pair case went the other way once the verify moved INTO the
    band buckets (vectors shipped per band-row, not per pair) — see
    embedding_near_dup_pairs, 3.1→0.95 s.  The signature stage
    (lsh_signatures) is one fold per VECTOR over the whole corpus, where
    numpy vectorization won 3×."""
    return pairs.withColumn(
        "cosine",
        F.round(F.expr(_DOT) / (F.col("qnorm") * F.col("cnorm")), 6),
    )


def cosine_topk(embeddings: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K) -> DataFrame:
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm_col().alias("qnorm"),
    )
    c = embeddings.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm_col().alias("cnorm"),
    )
    scored = _with_cosine(F.broadcast(q).crossJoin(c))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .orderBy("query_id", "rank")
    )


def _duck_cos(qe: str = "a.embedding", ce: str = "b.embedding") -> str:
    dot = (
        f"list_reduce(list_transform(range(1, len({qe}) + 1),"
        f" i -> CAST({qe}[i] AS DOUBLE) * CAST({ce}[i] AS DOUBLE)), (x, y) -> x + y)"
    )
    nq = (
        f"sqrt(list_reduce(list_transform({qe}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),"
        " (x, y) -> x + y))"
    )
    nc = (
        f"sqrt(list_reduce(list_transform({ce}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),"
        " (x, y) -> x + y))"
    )
    # DECIMAL cast reproduces Spark's HALF_UP double rounding semantics
    return f"CAST(round(CAST({dot} / ({nq} * {nc}) AS DECIMAL(28,12)), 6) AS DOUBLE)"


def cosine_topk_oracle_sql(n_queries: int = N_QUERIES, k: int = TOP_K) -> str:
    return f"""
WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_duck_cos()} AS cosine
  FROM embeddings a CROSS JOIN embeddings b
  WHERE a.vec_id < {n_queries} AND b.vec_id >= {n_queries}
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cosine
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
"""


# ------------------------------------------------------- LSH signature/bands
# Signature-computation lineage (each step same-window A/B-measured):
# r2 shipped 16 independent aggregate(zip_with(embedding, array(<64 double
# literals>), ...)) projections — 3.5 s at sf0.1, all plan analysis +
# Janino codegen of the 1k-literal tree; r3 collapsed it to a sign-mask
# expression fold (16 bigint literals, plans in ms) — 1.78 s, now
# execution-bound because HOF lambdas are interpreted; r4 vectorizes the
# identical fold in numpy inside mapInPandas — 0.61 s, bit-identical.
def lsh_signatures(
    embeddings: DataFrame, n_planes: int = EMB_PLANES, keep_embedding: bool = False
) -> DataFrame:
    """(vec_id, sig[, embedding]): n_planes-bit random-hyperplane signature
    — map-side, no shuffle, vectorized in numpy inside ``mapInPandas``.

    Spark HOF lambdas are interpreted, never codegen'd (CLAUDE.md), so the
    r3 sign-mask expression fold (_sig_expr_spark) was execution-bound:
    1.78 s for 2000×64 vectors at sf0.1 vs 0.61 s for this numpy form —
    same window, warm sessions, bit-identical output (0/2000 mismatches).
    Bit-exactness vs the DuckDB oracle holds because the fold ORDER is
    preserved: the loop accumulates dimension-by-dimension (acc += x_i ·
    ±1), each step one IEEE double add per (row, plane) exactly like the
    oracle's sequential list_reduce, and float32→float64 widening happens
    before any arithmetic on both sides.  (A single np.dot would use
    pairwise/SIMD summation — different rounding, sign flips near 0.)

    ``keep_embedding`` rides the vector along for consumers that need it
    downstream of the band shuffle (the bucket-local verify) — cheaper at
    every scale than a fetch-back join keyed per candidate PAIR, and never
    a broadcast of the full corpus."""
    import numpy as np
    import pandas as pd

    planes = np.array(_hyperplanes(n_planes), dtype=np.float64)  # (P, D)
    n_p, dim = planes.shape
    weights = (1 << np.arange(n_p, dtype=np.int64)).astype(np.int64)

    def batches(it):
        for pdf in it:
            if not len(pdf):
                out = {"vec_id": pdf["vec_id"], "sig": []}
                if keep_embedding:
                    out["embedding"] = pdf["embedding"]
                yield pd.DataFrame(out)
                continue
            e = np.stack(
                [np.asarray(v, dtype=np.float32) for v in pdf["embedding"]]
            ).astype(np.float64)
            acc = np.zeros((len(e), n_p), dtype=np.float64)
            for i in range(dim):
                # one sequential double add per (row, plane): ±1·x is an
                # exact sign flip, so this IS the oracle's left fold
                acc += e[:, i : i + 1] * planes[:, i]
            sig = (acc >= 0.0).astype(np.int64) @ weights
            out = {"vec_id": pdf["vec_id"], "sig": sig}
            if keep_embedding:
                out["embedding"] = pdf["embedding"]
            yield pd.DataFrame(out)

    schema = "vec_id long, sig long"
    if keep_embedding:
        schema += ", embedding array<float>"
    return embeddings.select("vec_id", "embedding").mapInPandas(
        batches, schema=schema
    )


def _banded(
    embeddings: DataFrame,
    band_bits: int = EMB_BAND_BITS,
    n_bands: int = EMB_BANDS,
    keep_embedding: bool = False,
) -> DataFrame:
    """(vec_id, band_idx, band_val[, embedding]) — one row per band per
    vector; the bucket key that replaces the cross product.  Key
    cardinality is n_bands · 2^band_bits; at corpus scale band_bits comes
    from derive_lsh_params so buckets stay ~TARGET_BUCKET_ROWS deep."""
    mask = (1 << band_bits) - 1
    band_args = ", ".join(
        f"{j}, shiftright(sig, {j * band_bits}) & {mask}" for j in range(n_bands)
    )
    cols = ["vec_id", f"stack({n_bands}, {band_args}) AS (band_idx, band_val)"]
    if keep_embedding:
        cols.append("embedding")
    return lsh_signatures(
        embeddings, n_planes=band_bits * n_bands, keep_embedding=keep_embedding
    ).selectExpr(*cols)


def _check_band_balance(
    banded: DataFrame,
    band_bits: int,
    target_bucket_rows: int = TARGET_BUCKET_ROWS,
) -> tuple[int, int]:
    """Loud-failure bucket invariant (VERDICT r3): one tiny agg job over
    the (persisted) banded frame.  A healthy parameterization keeps the
    deepest (band_idx, band_val) bucket within _BALANCE_HEADROOM × target;
    a mis-parameterized run (pinned 4-bit bands on a 10^9 corpus) raises
    HERE instead of shuffling ~N²/2^bits candidate pairs downstream.
    Returns (max_bucket_rows, n_buckets) for logging/tests."""
    row = (
        banded.groupBy("band_idx", "band_val")
        .count()
        .agg(F.max("count").alias("max_rows"), F.count("*").alias("n_buckets"))
        .collect()[0]
    )
    limit = _BALANCE_HEADROOM * target_bucket_rows
    if row["max_rows"] > limit:
        raise ValueError(
            f"LSH band buckets unbalanced: deepest bucket has {row['max_rows']} "
            f"rows (> {limit} = {_BALANCE_HEADROOM}×{target_bucket_rows}) across "
            f"{row['n_buckets']} buckets at band_bits={band_bits}; derive wider "
            f"bands via derive_lsh_params or switch to ivf_topk"
        )
    return row["max_rows"], row["n_buckets"]


def _duck_sig_ctes(src: str = "embeddings") -> str:
    """DuckDB CTEs ``dots, sig`` producing (vec_id, embedding, sig)."""
    dot_exprs = []
    for p, plane in enumerate(_PLANES):
        consts = "[" + ", ".join(str(c) for c in plane) + "]"
        dot_exprs.append(
            f"list_reduce(list_transform(range(1, {EMB_DIM} + 1),"
            f" i -> CAST(embedding[i] AS DOUBLE) * ({consts}[i])),"
            f" (x, y) -> x + y) AS d{p}"
        )
    dots = ",\n         ".join(dot_exprs)
    sig = " + ".join(
        f"(CASE WHEN d{p} >= 0 THEN {1 << p} ELSE 0 END)" for p in range(EMB_PLANES)
    )
    return f"""dots AS (
  SELECT vec_id, embedding,
         {dots}
  FROM {src}
), sig AS (
  SELECT vec_id, embedding, ({sig}) AS sig FROM dots
)"""


def _duck_banded_cte() -> str:
    bands = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, {j} AS band_idx,"
        f" (sig >> {j * EMB_BAND_BITS}) & {(1 << EMB_BAND_BITS) - 1} AS band_val FROM sig"
        for j in range(EMB_BANDS)
    )
    return f"banded AS (\n  {bands}\n)"


# testdata embeddings are well-spread (max pairwise cosine ≈ 0.51); 0.42
# yields a meaningful near-dup candidate set at every sf
NEAR_DUP_THRESHOLD = 0.42


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = NEAR_DUP_THRESHOLD,
    n_vectors: int | None = None,
    _pair_chunk: int = 1 << 20,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all banded-LSH candidate
    pairs (≥1 shared band of sign bits) with cosine ≥ τ.

    The pair space is pruned by the band bucketing before any dot
    product; candidate generation and the exact-cosine verify both happen
    bucket-locally.  Recall < 1 by construction (LSH); the oracle
    implements the identical bucketing, so values still match exactly.

    ``n_vectors`` is the scale path (VERDICT r3): pass the (approximate)
    corpus cardinality and the band width is DERIVED so buckets stay
    ~TARGET_BUCKET_ROWS deep, and a measured balance invariant raises on
    a degenerate bucketing before any pairwise work.  Omitted (the pinned
    oracle shape), the test-scale constants apply and no extra job runs.

    Plan shape (r4 rework, same-window warm A/B 3.1 s → 0.95 s at sf0.1,
    output exactly equal 262/262 rows): the vector RIDES the banded frame
    through the single bucket shuffle and candidate pairs are generated
    AND verified bucket-locally in one ``applyInPandas`` — pairs never
    exist as distributed rows until they survive the threshold.  The old
    shape (band self-join → distinct 465k pairs → two per-pair vector
    fetch-back joins → interpreted HOF fold per pair) shipped each
    embedding once per candidate PAIR; this ships it once per BAND
    (n_bands · N rows), strictly less traffic whenever buckets average
    >2·n_bands deep, and the 64-step fold runs vectorized in numpy over
    all of a bucket's pairs at once.  Rounding stays a JVM ``F.round``
    over the raw double (Arrow ships IEEE doubles bit-exactly), so oracle
    parity is inherited from the unchanged cosine/round semantics; the
    numpy fold accumulates dimension-at-a-time like the oracle's
    sequential list_reduce (one IEEE add per step — never np.dot, whose
    pairwise summation flips rounding near 0)."""
    import numpy as np
    import pandas as pd

    if n_vectors is None:
        params = {"band_bits": EMB_BAND_BITS, "n_bands": EMB_BANDS}
    else:
        params = derive_lsh_params(n_vectors)
        # balance probe as its own pass (signatures are cheap numpy); the
        # main path then streams the banded frame exactly once, unpersisted
        _check_band_balance(
            _banded(
                embeddings,
                band_bits=params["band_bits"],
                n_bands=params["n_bands"],
            ),
            params["band_bits"],
        )
    banded = _banded(
        embeddings,
        band_bits=params["band_bits"],
        n_bands=params["n_bands"],
        keep_embedding=True,
    )
    dim = EMB_DIM
    # keep every pair that could ROUND to >= threshold; the exact filter
    # happens after the JVM-side round below
    guard = threshold - 1e-6
    # bound per-chunk temporaries: the balance invariant caps buckets at
    # _BALANCE_HEADROOM·TARGET_BUCKET_ROWS rows (~8.4M pairs worst case);
    # 1M-pair chunks keep the per-dim gather temporaries at ~8 MB
    # (_pair_chunk is a test seam: tiny values force the multi-chunk path)
    chunk = _pair_chunk

    def pair_index_chunks(m: int):
        """(i<j) index pairs in row-major order, yielded in ~chunk-sized
        blocks WITHOUT ever materializing all m(m-1)/2 indices (triu on a
        degenerate 10^5-row bucket would allocate the full pair set
        before any chunking could help)."""
        ia_parts: list = []
        ib_parts: list = []
        count = 0
        for i in range(m - 1):
            ia_parts.append(np.full(m - 1 - i, i, dtype=np.int64))
            ib_parts.append(np.arange(i + 1, m, dtype=np.int64))
            count += m - 1 - i
            if count >= chunk:
                yield np.concatenate(ia_parts), np.concatenate(ib_parts)
                ia_parts, ib_parts, count = [], [], 0
        if count:
            yield np.concatenate(ia_parts), np.concatenate(ib_parts)

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "raw": pd.Series([], dtype="float64"),
            }
        )
        m = len(pdf)
        if m < 2:
            return empty
        if m > _BUCKET_VERIFY_CAP:
            raise ValueError(
                f"LSH band bucket holds {m} vectors (> {_BUCKET_VERIFY_CAP}): "
                "the corpus is too large or too self-similar for the pinned "
                "test-scale bands — pass n_vectors so derive_lsh_params picks "
                "wider bands (with the balance invariant), or use ivf_topk"
            )
        pdf = pdf.sort_values("vec_id")  # row-major (i<j) ⇒ vec_a < vec_b
        vid = pdf["vec_id"].to_numpy()
        e = np.stack(
            [np.asarray(v, dtype=np.float32) for v in pdf["embedding"]]
        ).astype(np.float64)
        nacc = np.zeros(m, dtype=np.float64)
        for d in range(dim):  # oracle's sequential norm fold
            nacc += e[:, d] * e[:, d]
        norm = np.sqrt(nacc)
        outs = []
        for ca, cb in pair_index_chunks(m):
            acc = np.zeros(len(ca), dtype=np.float64)
            for d in range(dim):  # oracle's sequential dot fold
                acc += e[ca, d] * e[cb, d]
            raw = acc / (norm[ca] * norm[cb])
            keep = raw >= guard
            if keep.any():
                outs.append(
                    pd.DataFrame(
                        {"vec_a": vid[ca[keep]], "vec_b": vid[cb[keep]], "raw": raw[keep]}
                    )
                )
        return pd.concat(outs, ignore_index=True) if outs else empty

    return (
        banded.groupBy("band_idx", "band_val")
        .applyInPandas(verify, schema="vec_a long, vec_b long, raw double")
        .withColumn("cosine", F.round(F.col("raw"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
        .distinct()  # a pair agreeing on 2+ bands verifies identically in each
        .orderBy("vec_a", "vec_b")
    )


def _emb_pairs_cte_body(threshold: float = NEAR_DUP_THRESHOLD) -> str:
    """DuckDB CTE list ``dots, sig, banded, cand, pairs`` reproducing
    ``embedding_near_dup_pairs`` — shared by the pair oracle and the
    embedding connected-components oracle."""
    return f"""{_duck_sig_ctes()},
{_duck_banded_cte()},
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.vec_id < b.vec_id
), pairs AS (
  SELECT c.vec_a, c.vec_b, {_duck_cos('x.embedding', 'y.embedding')} AS cosine
  FROM cand c
  JOIN embeddings x ON x.vec_id = c.vec_a
  JOIN embeddings y ON y.vec_id = c.vec_b
  WHERE {_duck_cos('x.embedding', 'y.embedding')} >= {threshold}
)"""


def embedding_near_dup_pairs_oracle_sql(threshold: float = NEAR_DUP_THRESHOLD) -> str:
    return f"""
WITH {_emb_pairs_cte_body(threshold)}
SELECT vec_a, vec_b, cosine FROM pairs ORDER BY vec_a, vec_b
"""


def lsh_bucketed_topk(
    embeddings: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_vectors: int | None = None,
) -> DataFrame:
    """ANN: banded-LSH candidates only — the band equi-join replaces the
    cross join (at scale: shuffle on a (band_idx, band_val) key whose
    cardinality grows with the derived band width, prunable and
    AQE-balanced).  Recall < 1 by construction; the oracle implements the
    identical bucketing, so values still match exactly.  ``n_vectors``
    derives the band width from corpus cardinality and arms the measured
    bucket-balance invariant (see embedding_near_dup_pairs)."""
    if n_vectors is None:
        params = {"band_bits": EMB_BAND_BITS, "n_bands": EMB_BANDS}
    else:
        params = derive_lsh_params(n_vectors)
    banded = scratch_persist(
        _banded(embeddings, band_bits=params["band_bits"], n_bands=params["n_bands"])
    )
    if n_vectors is not None:
        _check_band_balance(banded, params["band_bits"])
    q = banded.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "band_idx", "band_val"
    )
    c = banded.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), "band_idx", "band_val"
    )
    cand = (
        F.broadcast(q)
        .join(c, ["band_idx", "band_val"])
        .select("query_id", "neighbor_id")
        .distinct()
    )
    vq = embeddings.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm_col().alias("qnorm"),
    )
    vc = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm_col().alias("cnorm"),
    )
    scored = _with_cosine(cand.join(F.broadcast(vq), "query_id").join(vc, "neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .orderBy("query_id", "rank")
    )


def lsh_bucketed_topk_oracle_sql(n_queries: int = N_QUERIES, k: int = TOP_K) -> str:
    return f"""
WITH {_duck_sig_ctes()},
{_duck_banded_cte()},
cand AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
  WHERE a.vec_id < {n_queries} AND b.vec_id >= {n_queries}
), scored AS (
  SELECT c.query_id, c.neighbor_id, {_duck_cos('x.embedding', 'y.embedding')} AS cosine
  FROM cand c
  JOIN embeddings x ON x.vec_id = c.query_id
  JOIN embeddings y ON y.vec_id = c.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cosine
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
"""


# ------------------------------------------------------------------ IVF ANN
# The second scale path for ANN (complementing banded LSH): an IVF index.
# Coarse quantizer = IVF_CLUSTERS sampled centroid vectors (deterministic:
# the first candidate vec_ids — the classic "sample k points" init, no Lloyd
# iterations so the quantizer is SQL-expressible and bit-stable).  Every
# candidate vector is assigned to its argmax-cosine centroid (its inverted
# list); a query probes only its IVF_NPROBE nearest lists.  At 100 TB:
# IVF_CLUSTERS scales ~sqrt(n) (so inverted lists stay ~sqrt(n) long),
# centroids are a broadcast model artifact, assignment is one map-side
# scored pass + a partial-agg max (no n·K shuffle), and search is an
# equi-join on centroid_id — never a cross product over the corpus.
IVF_CLUSTERS = 8
IVF_NPROBE = 2


def _ivf_centroids(embeddings: DataFrame) -> DataFrame:
    """(centroid_id, ce): the sampled coarse quantizer — vec_ids
    [N_QUERIES, N_QUERIES + IVF_CLUSTERS), i.e. the first candidate
    vectors, so queries never seed the index they search."""
    return embeddings.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + IVF_CLUSTERS)
    ).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("ce"),
        _norm_col().alias("cnorm"),
    )


def ivf_assignments(embeddings: DataFrame) -> DataFrame:
    """(neighbor_id, centroid_id): each candidate's inverted-list key.

    Shape audit: candidates stream past the broadcast centroid table
    (map-side cosine per centroid), then ONE hash aggregation on
    neighbor_id with map-side partial max — the shuffle carries one row
    per candidate, not one per (candidate, centroid).  Ties break toward
    the lowest centroid_id via max(struct(cosine, -centroid_id))."""
    cands = embeddings.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("qe"),
        _norm_col().alias("qnorm"),
    )
    scored = _with_cosine(cands.crossJoin(F.broadcast(_ivf_centroids(embeddings))))
    return (
        scored.groupBy("neighbor_id")
        .agg(
            F.max(
                F.struct(
                    F.col("cosine"), (-F.col("centroid_id")).alias("neg_cid")
                )
            ).alias("best")
        )
        .select(
            "neighbor_id", (-F.col("best.neg_cid")).cast("long").alias("centroid_id")
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF ANN top-k: probe the nprobe nearest inverted lists per query,
    exact cosine + top-k inside the probed lists only.

    Recall < 1 by construction (a true neighbor assigned to an unprobed
    list is missed); the oracle implements the identical index, so values
    match exactly.  The probes frame (n_queries · nprobe rows, carrying
    the query vectors) is broadcast, so list candidates never shuffle to
    meet their queries — only the per-query top-k window moves data."""
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm_col().alias("qnorm"),
    )
    probe_scored = _with_cosine(q.crossJoin(F.broadcast(_ivf_centroids(embeddings))))
    pw = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("centroid_id"))
    probes = (
        probe_scored.withColumn("prk", F.row_number().over(pw))
        .filter(F.col("prk") <= nprobe)
        .select("query_id", "centroid_id", "qe", "qnorm")
    )
    lists = ivf_assignments(embeddings).join(
        embeddings.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("ce"),
            _norm_col().alias("cnorm"),
        ),
        "neighbor_id",
    )
    scored = _with_cosine(F.broadcast(probes).join(lists, "centroid_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .orderBy("query_id", "rank")
    )


def ivf_topk_oracle_sql(
    n_queries: int = N_QUERIES, k: int = TOP_K, nprobe: int = IVF_NPROBE
) -> str:
    lo, hi = n_queries, n_queries + IVF_CLUSTERS
    return f"""
WITH centroids AS (
  SELECT vec_id AS centroid_id, embedding AS cemb FROM embeddings
  WHERE vec_id >= {lo} AND vec_id < {hi}
), assign AS (
  SELECT neighbor_id, centroid_id FROM (
    SELECT b.vec_id AS neighbor_id, c.centroid_id,
           row_number() OVER (
             PARTITION BY b.vec_id
             ORDER BY {_duck_cos('b.embedding', 'c.cemb')} DESC, c.centroid_id ASC
           ) AS rk
    FROM embeddings b CROSS JOIN centroids c WHERE b.vec_id >= {n_queries}
  ) WHERE rk = 1
), probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT a.vec_id AS query_id, c.centroid_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY {_duck_cos('a.embedding', 'c.cemb')} DESC, c.centroid_id ASC
           ) AS prk
    FROM embeddings a CROSS JOIN centroids c WHERE a.vec_id < {n_queries}
  ) WHERE prk <= {nprobe}
), scored AS (
  SELECT p.query_id, s.neighbor_id, {_duck_cos('x.embedding', 'y.embedding')} AS cosine
  FROM probes p JOIN assign s ON p.centroid_id = s.centroid_id
  JOIN embeddings x ON x.vec_id = p.query_id
  JOIN embeddings y ON y.vec_id = s.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cosine
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
"""


# -------------------------------------------------- embedding dedup groups
def embedding_dedup_groups(
    embeddings: DataFrame,
    threshold: float | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Connected components over the embedding near-dup pair graph →
    (vec_id, canonical_vec_id) per vector in a near-dup cluster: the
    embedding-space twin of ``dedup.dedup_groups`` (same min-label
    propagation core, same scale shape — the frontier is only vectors
    appearing in some pair).

    Pass ``pairs`` (an ``embedding_near_dup_pairs`` frame, ideally
    persisted) to reuse an already-built graph instead of re-running the
    LSH band join — a pipeline computing both the pair list and the groups
    builds the graph once."""
    from .dedup import connected_components

    if pairs is not None and threshold is not None:
        raise ValueError(
            "pass either threshold or a prebuilt pairs frame, not both: a "
            "supplied pairs graph was built at its own threshold and would "
            "silently ignore this one"
        )
    if pairs is None:
        pairs = embedding_near_dup_pairs(
            embeddings, NEAR_DUP_THRESHOLD if threshold is None else threshold
        )
    pairs = pairs.select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    return connected_components(pairs).select(
        F.col("doc_id").alias("vec_id"),
        F.col("canonical_doc_id").alias("canonical_vec_id"),
    )


def embedding_dedup_groups_oracle_sql(threshold: float = NEAR_DUP_THRESHOLD) -> str:
    """Exact connected components in DuckDB over the same pair graph:
    recursive min-reachability (mirrors dedup.dedup_groups_oracle_sql)."""
    return f"""
WITH RECURSIVE {_emb_pairs_cte_body(threshold)},
edges AS (
  SELECT vec_a, vec_b FROM pairs
  UNION ALL
  SELECT vec_b AS vec_a, vec_a AS vec_b FROM pairs
),
reach(vec_id, r) AS (
  SELECT vec_a, vec_b FROM edges
  UNION
  SELECT e.vec_a, reach.r FROM edges e JOIN reach ON e.vec_b = reach.vec_id
)
SELECT vec_id, least(vec_id, min(r)) AS canonical_vec_id
FROM reach GROUP BY vec_id ORDER BY vec_id
"""


# ------------------------------------------------- int8 quantized ANN path
# At 100 TB the ANN working set is memory-bound: int8 symmetric
# quantization cuts vector bytes 4x.  Key property exploited here: with
# per-vector scales s = max|v|/127, the scales cancel out of cosine —
# cos(qa·sa, qb·sb) = Σqa·qb / (√Σqa² · √Σqb²) — so the quantized cosine
# is EXACT integer arithmetic up to one final division, bit-stable across
# engines with no float-fold ordering concerns.
QUANT_LEVELS = 127

# engine-neutral half-away-from-zero rounding (Spark round() and DuckDB
# round() differ in edge semantics; this form is identical everywhere)
_QROUND = (
    "CASE WHEN {x} >= 0 THEN floor({x} + 0.5D) ELSE -floor(-({x}) + 0.5D) END"
)


def quantized_embeddings(embeddings: DataFrame) -> DataFrame:
    """(vec_id, qemb: array<int>): symmetric per-vector int8 quantization
    (levels ±{QUANT_LEVELS}); zero vectors quantize to all-zero."""
    max_abs = "aggregate(embedding, 0D, (acc, v) -> greatest(acc, abs(cast(v as double))))"
    x = f"cast(v as double) * {QUANT_LEVELS} / ma"
    return embeddings.selectExpr("vec_id", f"{max_abs} AS ma", "embedding").selectExpr(
        "vec_id",
        "CASE WHEN ma = 0D THEN transform(embedding, v -> 0) "
        f"ELSE transform(embedding, v -> cast({_QROUND.format(x=x)} as int)) END AS qemb",
    )


def quantized_cosine_topk(
    embeddings: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """Exact top-k over int8-quantized vectors: integer dot products and
    norms (BIGINT-safe), one final rounded division.  Same plan shape as
    ``cosine_topk`` — broadcast query side, codegen'd scan, top-k window."""
    q = quantized_embeddings(embeddings)
    qs = q.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("qemb").alias("qa")
    )
    cs = q.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), F.col("qemb").alias("qb")
    )
    dot = "aggregate(zip_with(qa, qb, (x, y) -> cast(x as bigint) * y), 0L, (acc, v) -> acc + v)"
    nrm = "sqrt(aggregate({c}, 0L, (acc, v) -> acc + cast(v as bigint) * v))"
    scored = (
        F.broadcast(qs)
        .crossJoin(cs)
        .withColumn(
            "qcosine",
            F.round(
                F.expr(dot) / (F.expr(nrm.format(c="qa")) * F.expr(nrm.format(c="qb"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "qcosine")
        .orderBy("query_id", "rank")
    )


def _duck_qemb_cte() -> str:
    x = f"CAST(v AS DOUBLE) * {QUANT_LEVELS} / ma"
    qr = _QROUND.format(x=x).replace("0.5D", "0.5")
    return f"""qe AS (
  SELECT vec_id,
         list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS ma,
         embedding
  FROM embeddings
), quant AS (
  SELECT vec_id,
         CASE WHEN ma = 0 THEN list_transform(embedding, v -> 0)
              ELSE list_transform(embedding, v -> CAST({qr} AS INTEGER)) END AS qemb
  FROM qe
)"""


def quantized_cosine_topk_oracle_sql(
    n_queries: int = N_QUERIES, k: int = TOP_K
) -> str:
    dot = (
        "list_sum(list_transform(range(1, len(a.qemb) + 1),"
        " i -> CAST(a.qemb[i] AS BIGINT) * b.qemb[i]))"
    )
    nrm = "sqrt(list_sum(list_transform({c}.qemb, v -> CAST(v AS BIGINT) * v)))"
    qcos = (
        f"CAST(round(CAST({dot} / ({nrm.format(c='a')} * {nrm.format(c='b')})"
        " AS DECIMAL(28,12)), 6) AS DOUBLE)"
    )
    return f"""
WITH {_duck_qemb_cte()},
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {qcos} AS qcosine
  FROM quant a CROSS JOIN quant b
  WHERE a.vec_id < {n_queries} AND b.vec_id >= {n_queries}
), ranked AS (
  SELECT query_id, neighbor_id, qcosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY qcosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, qcosine
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
"""
