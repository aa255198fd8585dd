"""Job-function registry — the engine's ``require-resolve``.

The reference resolves a qualified Clojure symbol to a function at
execution time (``src/goose/consumer.clj:5-7`` via
``src/goose/utils.clj:72-80``). Python has no safe equivalent of
resolving arbitrary dotted names for side-effectful execution, so jobs
reference keys in an explicit registry. Register with::

    @job_fn("app.jobs/send-email")
    def send_email(addr): ...

The registry module is imported on executors (it's plain package code),
so ``mapInPandas`` workers resolve the same table.
"""

from __future__ import annotations

import json
from typing import Callable

FN_REGISTRY: dict[str, Callable] = {}


def job_fn(name: str):
    def wrap(fn: Callable) -> Callable:
        FN_REGISTRY[name] = fn
        return fn

    return wrap


def resolve(name: str) -> Callable:
    """Resolve an execute_fn name to a callable.

    Two forms — mirroring goose's qualified-symbol require-resolve
    (``src/goose/utils.clj:72-80``):

    * registry key (``@job_fn``-registered) — works when the defining
      module is imported on the executor (package code always is);
    * module-qualified ``"pkg.mod:fn_name"`` — imported on demand, so
      user job modules resolve on executors exactly like goose worker
      processes ``require`` the job namespace. Cached after first use.
    """
    try:
        return FN_REGISTRY[name]
    except KeyError:
        pass
    if ":" in name:
        mod_name, attr = name.split(":", 1)
        import importlib

        fn = getattr(importlib.import_module(mod_name), attr)
        FN_REGISTRY[name] = fn
        return fn
    raise KeyError(
        f"execute_fn {name!r} not registered and not module-qualified "
        f"(known: {sorted(FN_REGISTRY)})"
    )


def execute(execute_fn: str, args_json: str | None):
    """Apply the registered fn to JSON-decoded args —
    ``(apply (require-resolve fn-sym) args)`` parity."""
    args = json.loads(args_json) if args_json else []
    return resolve(execute_fn)(*args)


# --- built-ins used by tests and the perf-parity load ---------------------

@job_fn("noop")
def noop(*args):
    return None


import os as _os
import tempfile as _tempfile

#: attempt counters live on the shared filesystem, NOT process memory —
#: executions land on arbitrary Python workers, so in-process state
#: would reset per worker and the job would never "recover".
#: GOOSE_SPARK_FLAKY_DIR isolates concurrent test/bench processes (in
#: local mode executor python workers inherit the driver's environment,
#: so setting it before SparkSession creation reaches the kernel too).
FLAKY_DIR = _os.environ.get(
    "GOOSE_SPARK_FLAKY_DIR",
    _os.path.join(_tempfile.gettempdir(), "goose-spark-flaky"),
)


def reset_flaky() -> None:
    import shutil

    shutil.rmtree(FLAKY_DIR, ignore_errors=True)


@job_fn("flaky")
def flaky(key: str, fail_times: int):
    """Fails the first ``fail_times`` invocations per key, then succeeds —
    mirrors the retry-chain integration test shape
    (test/goose/brokers/redis/integration_test.clj:106-154)."""
    d = _os.path.join(FLAKY_DIR, key)
    _os.makedirs(d, exist_ok=True)
    n = 0
    while True:
        try:
            _os.close(_os.open(_os.path.join(d, f"attempt-{n}"), _os.O_CREAT | _os.O_EXCL))
            break
        except FileExistsError:
            n += 1
    if n < fail_times:
        raise RuntimeError(f"induced failure {n + 1}/{fail_times} for {key}")
    return "ok"


@job_fn("always-fail")
def always_fail(*args):
    raise RuntimeError("this job always fails")


@job_fn("effect-once-append")
def effect_once_append(table_root: str, out_path: str, effect_id: str,
                       payload: str):
    """A deliberately NON-idempotent side effect (append a line) wrapped
    in the effect-once dedup table (streaming/effects.py): replayed
    micro-batches re-execute the job (at-least-once, SURVEY §7.4.3) but
    the appended line lands exactly once. The specimen job for the
    crash-replay effect-once test."""
    from goose_spark.streaming.effects import EffectOnceTable

    table = EffectOnceTable(table_root)

    def eff():
        with open(out_path, "a") as fh:
            fh.write(payload + "\n")

    return "applied" if table.run_once(effect_id, eff) else "skipped"


# --- recording handlers (test/bench support, like `flaky` above) ----------
# Handler fns must live in module code so executor Python workers resolve
# them (FN_REGISTRY is per-process; decorators in a test body only exist
# on the driver). The failing job's first arg carries the log path.

def _record(tag: str, job: dict, err: str) -> None:
    args = json.loads(job["args"]) if job.get("args") else []
    if args:
        with open(args[0], "a") as fh:
            fh.write(f"{tag} {job['id']} {err}\n")


@job_fn("record-error-handler")
def record_error_handler(job, err):
    _record("error", job, err)


@job_fn("record-death-handler")
def record_death_handler(job, err):
    _record("death", job, err)


@job_fn("raising-handler")
def raising_handler(job, err):
    """A handler that itself fails — executor-side handler exceptions
    must be swallowed, never corrupt the outcome row (retry.clj's
    log-and-continue handlers)."""
    raise RuntimeError("handler blew up")
