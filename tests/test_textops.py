"""Textops + relational-shell oracle tests: every queries() entry with an
oracle must match DuckDB value-for-value at sf0.001 (the driver runs the
same comparison at sf0.01 — tools/check_oracles.py mirrors it)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = "nan" if math.isnan(v) else f"{v:.10g}"
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            elif isinstance(v, (list, tuple)):
                v = str(list(v))
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return out


# Extraction-chained queries use pinned-constant oracles computed from the
# deterministic seed-42 sf0.01 corpus (the driver's comparison scale), so
# they must be checked at sf0.01 — everything else runs at sf0.001 for speed.
import __spark_entry__ as _entry_mod

SF_DIR_PINNED = _entry_mod.PINNED_SF_DIR
PINNED_SF01 = _entry_mod.PINNED_ORACLES


def _duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.fixture(scope="module")
def duck():
    con = _duck_con(SF_DIR)
    yield con
    con.close()


def _entry():
    import __spark_entry__ as e

    return e


ORACLE_QUERIES = sorted(_entry().oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    e = _entry()
    if name in PINNED_SF01:
        sdf = e.queries()[name](spark, SF_DIR_PINNED)
        con = _duck_con(SF_DIR_PINNED)
        try:
            res = con.sql(e.oracle_sql()[name])
            drows = res.fetchall()
            dcols = [d[0] for d in res.description]
        finally:
            con.close()
    else:
        sdf = e.queries()[name](spark, SF_DIR)
        res = duck.sql(e.oracle_sql()[name])
        drows = res.fetchall()
        dcols = [d[0] for d in res.description]
    srows = [tuple(r) for r in sdf.collect()]
    assert sorted(sdf.columns) == sorted(dcols)
    assert _normalize(srows, sdf.columns) == _normalize(drows, dcols)


def test_every_oracle_key_has_query():
    e = _entry()
    q = e.queries()
    for name in e.oracle_sql():
        assert name in q


# The wide per-article dump is the ONLY query allowed to be rows-only
# (500 rows × free text; its values are covered by extract_summary /
# extract_funnel digests).  Anything else added without an oracle twin
# fails here — the driver gate must stay value-checked by default.
ROWS_ONLY_OK = {"extract_articles"}


def test_every_query_has_oracle_unless_allowlisted():
    e = _entry()
    missing = set(e.queries()) - set(e.oracle_sql()) - ROWS_ONLY_OK
    assert not missing, f"queries without oracle twins: {sorted(missing)}"


def test_multimodal_plumbing(spark):
    """decode path: media table with binary payloads → feature rows."""
    from go_readability_spark.textops.multimodal import (
        MEDIA_SCHEMA,
        decode_media_features,
        media_from_articles,
    )
    from go_readability_spark.spark.corpus import fixture_documents
    from go_readability_spark.spark.extract import extract_articles

    arts = extract_articles(
        fixture_documents(spark).filter("doc_id = 'keep-images'")
    )
    media = media_from_articles(arts)
    mrows = media.collect()
    assert mrows and all(r.kind in ("img", "video", "audio", "source", "embed", "iframe") for r in mrows)

    payloads = spark.createDataFrame(
        [
            {
                "media_id": r.media_id,
                "doc_id": r.doc_id,
                "kind": r.kind,
                "media_ref": r.media_ref,
                "payload": (r.media_ref or "x").encode(),
                "content_type": "image/jpeg",
            }
            for r in mrows
        ],
        schema=MEDIA_SCHEMA,
    )
    feats = decode_media_features(payloads).collect()
    assert len(feats) == len(mrows)
    for f in feats:
        assert f.n_bytes > 0 and len(f.payload_sha1) == 40
        assert f.feature is not None and len(f.feature) == 8
        if f.kind == "img":
            assert f.width and f.height


def test_jaccard_pairs_across_length_bucket_boundary(spark):
    """Near-identical docs whose lengths straddle a 64-char bucket boundary
    must still pair: adjacent-bucket blocking, not exact equality (which
    silently dropped these)."""
    from pyspark.sql import functions as F

    from go_readability_spark.textops.dedup import ngram_jaccard_pairs

    # 30 distinct words: 10×2 chars + 20×3 chars + 29 spaces = 109 → bucket 1
    words = [f"w{i}" for i in range(30)]
    base = " ".join(words)
    assert len(base) // 64 == 1
    # replace the LAST word with a 22-char word → length 128 → bucket 2;
    # only the 3 trailing shingles change: J = 25/31 ≈ 0.806 ≥ 0.8
    edited = " ".join(words[:-1] + ["x" * 22])
    assert len(edited) // 64 == 2
    docs = spark.createDataFrame(
        [("docA", "en", base), ("docB", "en", edited)],
        "doc_id string, lang string, text string",
    )
    pairs = ngram_jaccard_pairs(docs).collect()
    assert [(p.doc_a, p.doc_b) for p in pairs] == [("docA", "docB")]
    assert pairs[0].jaccard >= 0.8


def _py_simhash(text: str) -> int:
    """Pure-Python mirror of simhash_docs (md5-prefix word hash, 60 bits)."""
    import hashlib

    from go_readability_spark.textops.dedup import SIMHASH_BITS, SIMHASH_HEX_CHARS

    sums = [0] * SIMHASH_BITS
    for t in text.split(" "):
        h = int(hashlib.md5(t.encode()).hexdigest()[:SIMHASH_HEX_CHARS], 16)
        for j in range(SIMHASH_BITS):
            sums[j] += 1 if (h >> j) & 1 else -1
    return sum(1 << j for j in range(SIMHASH_BITS) if sums[j] > 0)


def test_simhash_hamming_pairs_one_word_edit(spark):
    """A one-word edit of a long doc must pair with its original through the
    Hamming-band join (the property 16-bit exact-collision grouping lacked)."""
    from go_readability_spark.textops.dedup import (
        SIMHASH_MAX_HAMMING,
        simhash_near_dup_pairs,
    )

    words = [f"tok{i % 40}" for i in range(200)]
    base = " ".join(words)
    # deterministically pick an edit whose simhash lands within the default
    # Hamming budget (md5 is fixed, so this search is reproducible)
    base_fp = _py_simhash(base)
    edited = None
    for c in range(64):
        cand = " ".join(words[:100] + [f"edit{c}"] + words[101:])
        ham = bin(base_fp ^ _py_simhash(cand)).count("1")
        if 1 <= ham <= SIMHASH_MAX_HAMMING:
            edited, expect_ham = cand, ham
            break
    assert edited is not None
    docs = spark.createDataFrame(
        [("orig", base), ("edit", edited), ("other", "completely different unrelated words here now")],
        "doc_id string, text string",
    )
    pairs = simhash_near_dup_pairs(docs).collect()
    assert [(p.doc_a, p.doc_b, p.hamming) for p in pairs] == [("edit", "orig", expect_ham)]


def test_embedding_lsh_banded_keys_and_near_dup_recall(spark):
    """The banded hyperplane LSH must (a) spread candidates over a key
    space that grows with EMB_PLANES (not a constant 8 buckets), and
    (b) always pair a true near-duplicate vector (uniform positive scaling
    preserves every sign bit, so all bands match)."""
    from pyspark.sql import Row

    from go_readability_spark.textops.similarity import (
        EMB_BANDS,
        _banded,
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    keys = _banded(emb).select("band_idx", "band_val").distinct().count()
    assert keys > 8  # the round-1 design had exactly 8 buckets total
    assert keys <= EMB_BANDS * 16

    rows = [Row(vec_id=r.vec_id, embedding=r.embedding) for r in emb.limit(3).collect()]
    dup = Row(vec_id=10_000, embedding=[x * 1.01 for x in rows[0].embedding])
    small = spark.createDataFrame(rows + [dup], "vec_id long, embedding array<float>")
    pairs = embedding_near_dup_pairs(small, threshold=0.99).collect()
    assert (rows[0].vec_id, 10_000) in {(p.vec_a, p.vec_b) for p in pairs}


def test_dedup_groups_raises_when_not_converged(spark):
    from go_readability_spark.textops.dedup import dedup_groups

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_groups(docs, max_iters=0)


def test_dedup_groups_matches_union_find(spark):
    """Connected-components canonical assignment must equal an exact
    union-find over the same LSH pair graph (transitive closure)."""
    from go_readability_spark.textops.dedup import dedup_groups, lsh_candidate_pairs

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    pairs = [(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(docs).collect()]
    assert pairs, "fixture corpus should contain LSH candidate pairs"

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {d: find(d) for d in {x for p in pairs for x in p}}

    got = {r.doc_id: r.canonical_doc_id for r in dedup_groups(docs).collect()}
    assert got == expected


def test_ivf_topk_recall_and_index_coverage(spark):
    """IVF ANN sanity beyond the oracle: every candidate lands in exactly
    one inverted list, every query returns k hits, and recall against the
    exact brute-force top-k is well above chance (nprobe/IVF_CLUSTERS of
    the lists are probed)."""
    from collections import Counter

    from go_readability_spark.textops import similarity as S

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n_cands = emb.filter("vec_id >= %d" % S.N_QUERIES).count()
    assign = S.ivf_assignments(emb).collect()
    assert len(assign) == n_cands
    assert len({r.neighbor_id for r in assign}) == n_cands
    assert {r.centroid_id for r in assign} <= set(
        range(S.N_QUERIES, S.N_QUERIES + S.IVF_CLUSTERS)
    )

    exact = {(r.query_id, r.neighbor_id) for r in S.cosine_topk(emb).collect()}
    approx = S.ivf_topk(emb).collect()
    per_query = Counter(r.query_id for r in approx)
    assert all(per_query[q] == S.TOP_K for q in range(S.N_QUERIES))
    recall = len(exact & {(r.query_id, r.neighbor_id) for r in approx}) / len(exact)
    # The testdata embeddings are near-uniformly spread (max pairwise
    # cosine ~0.5), the worst case for IVF: expected recall ~= the probed
    # fraction nprobe/IVF_CLUSTERS = 0.25.  Require a margin above that
    # (clustered real embeddings do far better); measured 0.35 @ sf0.001.
    assert recall > S.IVF_NPROBE / S.IVF_CLUSTERS + 0.04, recall


def test_multimodal_resize_and_frame_sample(spark):
    """resize: binary-in/binary-out with clamped dims; frame-sample:
    deterministic in-batch fan-out of every-Nth frame for video/audio."""
    from go_readability_spark.textops.multimodal import (
        MEDIA_SCHEMA,
        _fake_decode,
        resize_media,
        sample_frames,
    )

    rows = [
        {"media_id": f"m{i}", "doc_id": "d", "kind": kind,
         "media_ref": None, "payload": f"payload-{i}".encode(),
         "content_type": None}
        for i, kind in enumerate(["img", "img", "video", "audio"])
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    resized = {r.media_id: r for r in resize_media(media, max_dim=100).collect()}
    assert len(resized) == 4
    for i, r in enumerate(rows):
        out = resized[r["media_id"]]
        assert bytes(out.payload) and bytes(out.payload) != r["payload"]
        if r["kind"] == "img":
            assert 1 <= out.width <= 100 and 1 <= out.height <= 100

    frames = sample_frames(media, every_n=2).collect()
    assert {f.media_id for f in frames} == {"m2", "m3"}  # video/audio only
    for mid in ("m2", "m3"):
        n_total = _fake_decode(dict((r["media_id"], r["payload"]) for r in rows)[mid],
                               "video")["n_frames"]
        got = sorted(f.frame_idx for f in frames if f.media_id == mid)
        assert got == list(range(0, n_total, 2))
    # determinism: same input → same frame bytes
    again = sample_frames(media, every_n=2).collect()
    assert sorted((f.media_id, f.frame_idx, bytes(f.frame_payload)) for f in frames) == \
           sorted((f.media_id, f.frame_idx, bytes(f.frame_payload)) for f in again)


def test_quantized_topk_fidelity(spark):
    """int8 quantization must preserve the exact top-k almost perfectly
    (measured 0.975 @ sf0.001, 1.0 @ sf0.1) and quantized values must stay
    within ±QUANT_LEVELS with the max |component| hitting the rail."""
    from go_readability_spark.textops import similarity as S

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    q = {r.vec_id: r.qemb for r in S.quantized_embeddings(emb).collect()}
    for vec in q.values():
        assert max(abs(v) for v in vec) == S.QUANT_LEVELS  # symmetric rail
    exact = {(r.query_id, r.neighbor_id) for r in S.cosine_topk(emb).collect()}
    quant = {(r.query_id, r.neighbor_id) for r in S.quantized_cosine_topk(emb).collect()}
    assert len(exact & quant) / len(exact) >= 0.9
