"""Materialized state view (round-9 directive #3): per-micro-batch
MERGE-target maintenance equals the window-over-history ``state()``,
survives crash-replay exactly-once, rewrites only affected buckets, and
serves the qj-family query shapes identically to the derived form."""

from __future__ import annotations

import json
import os
import shutil
import uuid
from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from goose_spark.streaming.ledger import Ledger
from goose_spark.streaming.stateview import MaterializedState


def utcnow():
    return datetime.now(timezone.utc).replace(tzinfo=None)


@pytest.fixture()
def ledger(tmp_path):
    return Ledger(str(tmp_path / "ledger"))


def _rows(ids, status, queue="default"):
    now = utcnow()
    return [
        {
            "id": i,
            "queue": queue,
            "execute_fn": "noop",
            "args": "[]",
            "status": status,
            "priority": 0,
            "enqueued_at": now,
            "retry_count": 0,
            "max_retries": 27,
            "error": "boom" if status == "dead" else None,
        }
        for i in ids
    ]


def _run_stream(spark, ledger, view, ck):
    view.attach_stream(ledger.log_stream(spark), ck).awaitTermination()


def _state_tuples(df):
    return sorted(
        (r["id"], r["status"], r["seq"]) for r in df.collect()
    )


def test_materialized_equals_state_across_batches(spark, ledger, tmp_path):
    view = MaterializedState(str(tmp_path / "view"))
    ck = str(tmp_path / "ck")

    ids = [f"j{i}" for i in range(40)]
    ledger.append_rows(_rows(ids, "enqueued"))
    _run_stream(spark, ledger, view, ck)
    assert _state_tuples(view.read(spark)) == _state_tuples(ledger.state(spark))

    # transitions: some ids move on (newer seq must win), new ids appear
    ledger.append_rows(_rows(ids[:15], "executing"))
    ledger.append_rows(_rows(ids[:5], "succeeded") + _rows(["k1", "k2"], "enqueued"))
    _run_stream(spark, ledger, view, ck)
    got = _state_tuples(view.read(spark))
    assert got == _state_tuples(ledger.state(spark))
    by_id = {t[0]: t[1] for t in got}
    assert by_id["j0"] == "succeeded" and by_id["j10"] == "executing"
    assert by_id["j30"] == "enqueued" and by_id["k1"] == "enqueued"
    # one row per id — the view never accumulates history
    assert len(got) == 42


def test_crash_replay_is_exactly_once(spark, ledger, tmp_path):
    """Drop the checkpoint commit after a fold: Spark replays the
    micro-batch, the manifest's last_batch no-ops it — same rows, same
    manifest version (nothing re-applied)."""
    view = MaterializedState(str(tmp_path / "view"))
    ck = str(tmp_path / "ck")
    ledger.append_rows(_rows([f"j{i}" for i in range(10)], "enqueued"))
    _run_stream(spark, ledger, view, ck)
    with open(view.manifest_path) as fh:
        v1 = json.load(fh)["version"]
    before = _state_tuples(view.read(spark))

    shutil.rmtree(os.path.join(ck, "commits"))
    _run_stream(spark, ledger, view, ck)
    with open(view.manifest_path) as fh:
        m = json.load(fh)
    assert m["version"] == v1  # replayed batch short-circuited
    assert _state_tuples(view.read(spark)) == before

    # later real work still lands
    ledger.append_rows(_rows(["j0"], "executing"))
    _run_stream(spark, ledger, view, ck)
    assert _state_tuples(view.read(spark)) == _state_tuples(ledger.state(spark))


def test_upsert_touches_only_affected_buckets(spark, ledger, tmp_path):
    """A one-id batch replaces exactly one bucket file; every other
    bucket's file is byte-identical (same name — never rewritten)."""
    view = MaterializedState(str(tmp_path / "view"), n_buckets=8)
    ledger.append_rows(_rows([f"j{i}" for i in range(64)], "enqueued"))
    log = ledger.log(spark)
    view.upsert(spark, log, batch_id=0)
    with open(view.manifest_path) as fh:
        before = json.load(fh)["buckets"]
    assert len(before) > 1  # ids spread over several buckets

    ledger.append_rows(_rows(["j0"], "succeeded"))
    new_rows = ledger.log(spark).join(
        log.select("seq"), "seq", "left_anti"
    )
    res = view.upsert(spark, new_rows, batch_id=1)
    assert res == {"applied": True, "buckets": 1}
    with open(view.manifest_path) as fh:
        after = json.load(fh)["buckets"]
    changed = [b for b in before if before[b] != after.get(b)]
    assert len(changed) == 1
    # untouched bucket files still exist under their old names
    for b, f in before.items():
        if b not in changed:
            assert after[b] == f
            assert os.path.exists(os.path.join(view.files_dir, f))
    # vacuum clears the replaced file's debris only if a crash left any;
    # here cleanup already ran, so nothing to remove
    assert view.vacuum() == 0
    assert _state_tuples(view.read(spark)) == _state_tuples(ledger.state(spark))


def test_qj_shapes_agree_on_either_form(spark, ledger, tmp_path):
    """The console/dashboard query family (qj1 dashboard counts, qj2
    failed-filter) returns identical results against the derived
    ``state()`` and the materialized view."""
    view = MaterializedState(str(tmp_path / "view"))
    ck = str(tmp_path / "ck")
    ledger.append_rows(_rows([f"a{i}" for i in range(12)], "enqueued"))
    ledger.append_rows(_rows([f"a{i}" for i in range(4)], "dead"))
    ledger.append_rows(_rows(["b1", "b2"], "executing", queue="mail"))
    _run_stream(spark, ledger, view, ck)

    for name, frame in (("derived", ledger.state(spark)),
                        ("materialized", view.read(spark))):
        frame.createOrReplaceTempView(f"jobs_{name}")
    q1 = "SELECT status, COUNT(*) AS n FROM jobs_{} GROUP BY status ORDER BY status"
    q2 = ("SELECT id FROM jobs_{} WHERE queue = 'default' "
          "AND error IS NOT NULL ORDER BY id")
    for q in (q1, q2):
        a = [tuple(r) for r in spark.sql(q.format("derived")).collect()]
        b = [tuple(r) for r in spark.sql(q.format("materialized")).collect()]
        assert a == b and a  # equal and non-trivial


def test_console_api_runs_on_either_backend(spark, ledger, tmp_path):
    """Round-9 directive #2: the production console/API layer accepts
    the materialized view as its state backend. Every read surface the
    console uses (dashboard fan-out, queue listing/sizes, finds,
    pagination, dead top-k) hash-matches between a ledger-backed and a
    view-backed ``LedgerAPI``; a mutation issued through the view-backed
    API lands in the LEDGER (single-writer contract) and becomes visible
    in the view after the next maintenance fold."""
    from goose_spark.api import LedgerAPI
    from goose_spark.console import Console

    view = MaterializedState(str(tmp_path / "view"))
    ck = str(tmp_path / "ck")
    ledger.append_rows(_rows([f"a{i:02d}" for i in range(25)], "enqueued"))
    ledger.append_rows(_rows([f"d{i}" for i in range(6)], "dead"))
    ledger.append_rows(_rows(["m1", "m2", "m3"], "enqueued", queue="mail"))
    ledger.append_rows(_rows(["s1", "s2"], "scheduled"))
    _run_stream(spark, ledger, view, ck)

    derived = LedgerAPI(spark, ledger)
    mat = LedgerAPI(spark, ledger, state_view=view)

    # ---- read surfaces: identical on both backends -------------------
    assert mat.dashboard_counts() == derived.dashboard_counts()
    assert mat.list_queues() == derived.list_queues() == ["default", "mail"]
    assert mat.size("default") == derived.size("default") == 25
    assert mat.size(status="dead") == derived.size(status="dead") == 6
    assert mat.find_by_id("a07") == derived.find_by_id("a07")
    assert mat.page("default", page=2) == derived.page("default", page=2)
    assert [j["id"] for j in mat.peek_dead(3)] == [
        j["id"] for j in derived.peek_dead(3)
    ]

    # the console runs unchanged over the view-backed API (qj1/qj4/qj7
    # page shapes)
    for page in (Console(mat), Console(derived)):
        home = page.page_home()
        assert home["enqueued"] == 28 and home["dead"] == 6
        assert home["scheduled"] == 2
    assert (
        Console(mat).page_enqueued("default", page=1)
        == Console(derived).page_enqueued("default", page=1)
    )
    assert Console(mat).page_dead() == Console(derived).page_dead()

    # ---- mutation through the view-backed API -------------------------
    # replay appends to the LEDGER; the view lags until the next fold
    # (the documented single-writer contract), then converges.
    assert mat.replay_dead(2) == 2
    assert derived.size(status="dead") == 4      # ledger sees it now
    assert mat.size(status="dead") == 6          # view: one fold behind
    _run_stream(spark, ledger, view, ck)
    assert mat.size(status="dead") == 4
    assert mat.dashboard_counts() == derived.dashboard_counts()
    assert _state_tuples(view.read(spark)) == _state_tuples(ledger.state(spark))


def test_mutations_bypass_lagging_view(spark, ledger, tmp_path):
    """ADVICE r10 (medium): with state_view set, mutation methods must
    pick victim rows from the LEDGER, not the view's lagging snapshot.
    Two replay_dead calls within one fold interval must drain DIFFERENT
    dead jobs (view-victim selection would re-enqueue the same two
    twice); pop_dead after a delete must not return already-deleted
    jobs; prioritise_execution must supersede the CURRENT seq."""
    from goose_spark.api import LedgerAPI

    view = MaterializedState(str(tmp_path / "view"))
    ck = str(tmp_path / "ck")
    ledger.append_rows(_rows([f"d{i}" for i in range(6)], "dead"))
    ledger.append_rows(_rows(["e1", "e2"], "enqueued"))
    _run_stream(spark, ledger, view, ck)
    mat = LedgerAPI(spark, ledger, state_view=view)

    # two replays, no fold in between: 2 + 2 distinct jobs, 2 left dead
    assert mat.replay_dead(2) == 2
    assert mat.replay_dead(2) == 2
    derived = LedgerAPI(spark, ledger)
    assert derived.size(status="dead") == 2
    # all six ids exist exactly once in the ledger state (no dup enqueue)
    st = ledger.state(spark)
    ids = [r["id"] for r in st.filter(F.col("id").startswith("d")).collect()]
    assert sorted(ids) == [f"d{i}" for i in range(6)]

    # pop_dead twice within the same stale-view window: disjoint sets
    first = {j["id"] for j in mat.pop_dead(1)}
    second = {j["id"] for j in mat.pop_dead(1)}
    assert first and second and first.isdisjoint(second)

    # prioritise through the view-backed API supersedes the live seq:
    # the job must not execute twice (exactly one live enqueued copy)
    assert mat.prioritise_execution(["e1"]) == 1
    live = derived.state().filter(F.col("id") == "e1").collect()
    assert len(live) == 1 and live[0]["priority"] == 1  # PRIORITY_FRONT


def test_retention_keeps_previous_version_for_one_commit(spark, ledger, tmp_path):
    """Delta-style retention: the files a commit replaces stay on disk
    (manifest `retired`) until the NEXT commit, so a reader holding the
    previous manifest version finishes its scan; two commits later they
    are gone. vacuum() never removes retired files."""
    view = MaterializedState(str(tmp_path / "view"), n_buckets=4)
    ledger.append_rows(_rows(["j0", "j1", "j2", "j3"], "enqueued"))
    log0 = ledger.log(spark)
    view.upsert(spark, log0, batch_id=0)
    with open(view.manifest_path) as fh:
        m0 = json.load(fh)

    # a reader resolves the version-1 view NOW (plan pins m0's files)
    held = view.read(spark)
    assert held.count() == 4

    # commit 2 replaces some of m0's files — they must be retired, not
    # deleted, and the held reader must still complete
    ledger.append_rows(_rows(["j0", "j1", "j2", "j3"], "succeeded"))
    delta1 = ledger.log(spark).join(log0.select("seq"), "seq", "left_anti")
    view.upsert(spark, delta1, batch_id=1)
    with open(view.manifest_path) as fh:
        m1 = json.load(fh)
    replaced = [f for f in m0["buckets"].values() if f not in m1["buckets"].values()]
    assert replaced and sorted(m1["retired"]) == sorted(replaced)
    for f in replaced:
        assert os.path.exists(os.path.join(view.files_dir, f))
    assert held.count() == 4  # one version of lag is readable
    assert view.vacuum() == 0  # retired files are NOT debris

    # commit 3: the version-1 files (two commits old) are now deleted
    log1 = ledger.log(spark)
    ledger.append_rows(_rows(["j0"], "executing"))
    delta2 = ledger.log(spark).join(log1.select("seq"), "seq", "left_anti")
    view.upsert(spark, delta2, batch_id=2)
    for f in replaced:
        assert not os.path.exists(os.path.join(view.files_dir, f))
    assert _state_tuples(view.read(spark)) == _state_tuples(ledger.state(spark))
