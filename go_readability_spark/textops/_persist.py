"""Bounded persistence for intra-query scratch subtrees.

Several operators persist a subtree that both sides of a self-join read
(LSH bands, MinHash stacks, SimHash bands): without the persist the
expensive fingerprint pass runs twice, but a bare ``.persist()`` with no
owner leaks a MEMORY_AND_DISK frame per invocation for the life of the
application (the pattern ADVICE round 2 flagged for the entry-level frame
cache).  ``scratch_persist`` keeps one cache PER APPLICATION (ADVICE
round 3: a single shared list made two live sessions in one process
alternate-evict each other's entire scratch on every call — recompute
thrash), each capped at ``_CAP`` frames with oldest-first unpersist on
overflow; an evicted frame that some still-held DataFrame references
simply recomputes (correctness unaffected).  A cache whose owning
application has STOPPED is dropped wholesale the next time any session
calls in (unpersist on a dead app is a no-op — its JVM state is gone);
caches of other LIVE applications are never touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCRATCH: dict[str, list[DataFrame]] = {}
_CAP = 4


def _app_stopped(frames: list[DataFrame]) -> bool:
    try:
        return frames[0].sparkSession.sparkContext._jsc is None
    except Exception:
        return True  # session object torn down past usability


def scratch_persist(df: DataFrame) -> DataFrame:
    app = df.sparkSession.sparkContext.applicationId
    for a in [a for a in _SCRATCH if a != app]:
        if _app_stopped(_SCRATCH[a]):
            for f in _SCRATCH.pop(a):
                try:
                    f.unpersist()  # best-effort; normally a dead-JVM no-op
                except Exception:
                    pass
    bucket = _SCRATCH.setdefault(app, [])
    while len(bucket) >= _CAP:
        old = bucket.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass  # already unpersisted / session torn down mid-eviction
    df = df.persist()
    bucket.append(df)
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
