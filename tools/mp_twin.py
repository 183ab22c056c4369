"""Identical-work multiprocessing twin of the scaling harness.

Runs ``extract_one`` (the exact per-document work of the Spark extraction
path, including output span encoding) over the SAME materialized corpus
``tools/bench_scaling.py`` uses, under plain ``multiprocessing.Pool`` at
N and 4N processes — no Spark, no Arrow, no JVM.  Two uses:

* host-ceiling bracket: if the twin scales ~1.0 where Spark does not, the
  gap is pipeline, not host; if the twin degrades too, it is the host.
* pipeline-overhead attribution per level: Spark-rate / twin-rate at the
  SAME level.  Round-4 finding (BENCH/BASELINE.md): at local[4] Spark
  reads ~115% of the twin (the JVM scan/reassembly threads overlap onto
  spare host cores — local-mode's low level is secretly a 5-6-core run),
  at local[16] ~84% (Arrow ship-back + JVM/Python contention), so the
  N→4N ratio under-measures whenever 4N approaches the host size.

Usage::

    python tools/mp_twin.py [corpus_dir] [n=4]

corpus_dir defaults to the scaling harness's synth×27 cache for the
current corpus.py hash (build it by running tools/bench_scaling.py once).
"""

from __future__ import annotations

import hashlib
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_PAGES: list = []


def _default_corpus() -> str:
    tag = hashlib.md5(
        open(os.path.join(REPO, "go_readability_spark", "spark", "corpus.py"), "rb").read()
    ).hexdigest()[:8]
    return f"/tmp/bench_scaling_synth_27_sf0.1_{tag}"


def _work(args):
    lo, hi = args
    from go_readability_spark.kernel.options import Options
    from go_readability_spark.spark.extract import extract_one

    opts = Options()
    for i in range(lo, hi):
        doc_id, html = _PAGES[i]
        extract_one(doc_id, html, None, opts, False)
    return hi - lo


def _run(nproc: int) -> tuple[float, float]:
    total = len(_PAGES)
    chunk = max(1, total // (nproc * 8))
    tasks = [(i, min(i + chunk, total)) for i in range(0, total, chunk)]
    # _PAGES is shared copy-on-write, which only the fork start method
    # provides; under spawn/forkserver workers would see an empty list and
    # silently measure nothing — fail loudly off-Linux instead.
    with mp.get_context("fork").Pool(nproc) as pool:
        t0 = time.perf_counter()
        done = sum(pool.map(_work, tasks))
        dt = time.perf_counter() - t0
    return done / dt, dt


def main() -> None:
    global _PAGES
    corpus = sys.argv[1] if len(sys.argv) > 1 else _default_corpus()
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import duckdb

    t0 = time.perf_counter()
    _PAGES = duckdb.sql(
        f"""
        SELECT doc_id, string_agg(s.text, '' ORDER BY s.offset) AS html
        FROM (SELECT doc_id, unnest(spans) AS s
              FROM read_parquet('{corpus}/*.parquet'))
        GROUP BY doc_id
        """
    ).fetchall()
    print(
        f"corpus: {len(_PAGES)} docs reassembled in {time.perf_counter()-t0:.1f}s "
        f"({sum(len(h) for _, h in _PAGES)/1e6:.0f} MB)"
    )

    res: dict[int, list[float]] = {}
    for procs in (4 * n, n, 4 * n, n):  # interleaved, symmetric best-of-2
        rate, dt = _run(procs)
        res.setdefault(procs, []).append(rate)
        print(f"{procs}-way extract_one: {rate:.0f} docs/s ({dt:.1f}s)")
    eff = max(res[4 * n]) / (4 * max(res[n]))
    print(
        f"mp twin efficiency {n}->{4*n}: {eff:.3f} "
        f"(best {4*n}-way {max(res[4*n]):.0f}, best {n}-way {max(res[n]):.0f})"
    )


if __name__ == "__main__":
    main()
