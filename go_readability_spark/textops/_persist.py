"""Bounded persistence for intra-query scratch subtrees.

Several operators persist a subtree that both sides of a self-join read
(LSH bands, MinHash stacks, SimHash bands): without the persist the
expensive fingerprint pass runs twice, but a bare ``.persist()`` with no
owner leaks a MEMORY_AND_DISK frame per invocation for the life of the
application (the pattern ADVICE round 2 flagged for the entry-level frame
cache).  ``scratch_persist`` keeps at most ``_CAP`` live scratch frames
for the current application and unpersists the oldest on overflow —
an evicted frame that some still-held DataFrame references simply
recomputes (correctness unaffected).  Frames owned by a stopped
application are dropped without an unpersist call (their JVM is gone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCRATCH: list[tuple[str, DataFrame]] = []
_CAP = 4


def scratch_persist(df: DataFrame) -> DataFrame:
    app = df.sparkSession.sparkContext.applicationId
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
