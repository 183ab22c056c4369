"""Stateful streaming sessionization must agree with the oracle-checked
batch sessionizer: with all events in one micro-batch, the emitted closed
sessions are exactly the batch sessions minus each user's final
(still-open-in-state) session."""

import shutil
import tempfile

import pytest


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="grs_sess_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


class _FakeState:
    """Minimal GroupState stand-in for driving the sessionizer directly."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def test_out_of_order_event_does_not_shrink_session():
    """Cross-batch out-of-order arrival: stored end E, next batch delivers
    E-10min then E+25min.  The true gap is 25min < 30min, so the session
    must stay open; the old `cur_end = t` shrank the end to E-10min and
    spuriously split it."""
    import pandas as pd

    from go_readability_spark.streaming.sessions import _make_sessionizer

    MIN = 60 * 1_000_000
    E = 1_000_000_000_000
    fn = _make_sessionizer(idle_timeout_ms=60_000)

    state = _FakeState()
    list(fn((7,), iter([pd.DataFrame({"ts_us": [E - 5 * MIN, E]})]), state))
    assert state.get == (E - 5 * MIN, E, 2)

    out = list(
        fn((7,), iter([pd.DataFrame({"ts_us": [E - 10 * MIN, E + 25 * MIN]})]), state)
    )
    assert out == []  # no spurious gap close
    assert state.get == (E - 10 * MIN, E + 25 * MIN, 4)

    # a genuine >30min gap after the envelope end still closes the session
    out = list(fn((7,), iter([pd.DataFrame({"ts_us": [E + 60 * MIN]})]), state))
    closed = pd.concat(out)
    assert list(closed.closed_by) == ["gap"]
    assert list(closed.session_end_us) == [E + 25 * MIN]
    assert state.get == (E + 60 * MIN, E + 60 * MIN, 1)


def test_streaming_sessions_match_batch(spark, root):
    from go_readability_spark.plans.relational import sessionize_events
    from go_readability_spark.streaming.sessions import streaming_sessions

    sf_dir = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf_dir}/events.parquet").filter("user_id < 8")
    events.write.parquet(f"{root}/in")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1000)  # everything in one batch
        .parquet(f"{root}/in")
    )
    q = (
        streaming_sessions(stream, idle_timeout_ms=2000)
        .writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", f"{root}/ck")
        .trigger(availableNow=True)
        .start()
    )
    # availableNow + processing-time timeouts: timeout batches can keep the
    # query alive past the data drain — wait for the data batch (+ timeout
    # flushes), then stop explicitly
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT count(*) c FROM closed_sessions").collect()[0].c > 0:
            time.sleep(8)  # allow timeout flush batches to land
            break
        time.sleep(2)
    q.stop()
    closed = spark.sql("SELECT * FROM closed_sessions").collect()
    assert closed and set(r.closed_by for r in closed) <= {"gap", "timeout"}

    batch = {
        r.user_id: r
        for r in sessionize_events(spark, sf_dir).filter("user_id < 8").collect()
    }
    per_user: dict[int, list] = {}
    for r in closed:
        per_user.setdefault(r.user_id, []).append(r)
    for user_id, b in batch.items():
        rows = per_user.get(user_id, [])
        n_timeout = sum(1 for r in rows if r.closed_by == "timeout")
        # a user's final session stays in state unless the idle timeout
        # flushed it (the long availableNow drain can advance processing
        # time past the 1-minute timeout): gap-closed = n_sessions - 1,
        # plus at most one timeout-closed final session
        assert n_timeout <= 1, user_id
        assert len(rows) == b.n_sessions - 1 + n_timeout, user_id
        # event conservation: emitted events never exceed the user's total,
        # with equality exactly when the final session was flushed
        emitted = sum(r.n_events for r in rows)
        assert emitted == b.n_events if n_timeout else emitted < b.n_events
