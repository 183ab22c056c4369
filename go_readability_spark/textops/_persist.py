"""Bounded persistence for intra-query scratch subtrees.

Several operators persist a subtree that both sides of a self-join read
(LSH bands, MinHash stacks, SimHash bands): without the persist the
expensive fingerprint pass runs twice, but a bare ``.persist()`` with no
owner leaks a MEMORY_AND_DISK frame per invocation for the life of the
application (the pattern ADVICE round 2 flagged for the entry-level frame
cache).  ``scratch_persist`` keeps at most ``_CAP`` live scratch frames
for the current application and unpersists the oldest on overflow —
an evicted frame that some still-held DataFrame references simply
recomputes (correctness unaffected).  Frames owned by a DIFFERENT
application get a best-effort unpersist on eviction: if that app is
stopped the call throws into the swallow (its JVM is gone, nothing to
free), but if it is still alive — two sessions in one process — the
blocks are actually released instead of leaking for its lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCRATCH: list[tuple[str, DataFrame]] = []
_CAP = 4


def scratch_persist(df: DataFrame) -> DataFrame:
    app = df.sparkSession.sparkContext.applicationId
    for a, f in _SCRATCH:
        if a != app:
            try:
                f.unpersist()
            except Exception:
                pass  # owning application already stopped
    _SCRATCH[:] = [(a, f) for a, f in _SCRATCH if a == app]
    while len(_SCRATCH) >= _CAP:
        _, old = _SCRATCH.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass  # already unpersisted / session torn down mid-eviction
    df = df.persist()
    _SCRATCH.append((app, df))
    return df


def spread_small(df: DataFrame) -> DataFrame:
    """Raise a too-coarse input to cluster parallelism before a
    compute-dense map stage.  A small parquet file scans as one split,
    serializing per-row compute onto one core regardless of cluster size —
    measured 2.4-2.7x at local[32] on SimHash (per-word md5 + 60 bit-sums
    over the full document text).  At real scale the scan already has
    >= defaultParallelism splits and this is a no-op, so a 10^12-row table
    is never forced through a gratuitous shuffle; when it does trigger,
    the shuffle moves only the small frame that caused it.

    Deliberately applied ONLY where the pre-shuffle per-row compute dwarfs
    the repartition + extra plan-analysis cost (SimHash): A/B at sf0.1
    showed every cheaper operator (minhash, shingle explodes, LSH top-k)
    REGRESSES 1.5-2x when spread, because their real work happens after
    the first shuffle anyway.  The embedding pair build was measured too
    and removed again: warm-session repeats (2.04s spread vs 1.87s
    unspread) showed its apparent first-run win was Janino codegen warmup,
    not serialized compute — A/B this helper with warm-session one-shots
    only.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
