"""Enqueue-time spec gate — mirrors test/goose/specs_test.clj: every
malformed input must fail AT ENQUEUE with a SpecError, never surface
later as an execution-time retry→dead loop. Spark-free (the client is
producer-side), except the worker-handler construction check."""

from __future__ import annotations

import glob
import os
from datetime import datetime, timedelta, timezone

import pytest

from goose_spark.client import JobClient
from goose_spark.functions.registry import FN_REGISTRY, job_fn
from goose_spark.specs import SpecError
from goose_spark.streaming.ledger import Ledger


@pytest.fixture()
def client(tmp_path):
    return JobClient(str(tmp_path / "ledger"))


@job_fn("one-arity")
def _one_arity(x):
    return x


# --- :execute-fn-sym (specs.clj:20, specs_test.clj:54-57) ------------------

def test_unresolvable_fn_fails_at_enqueue_not_execution(client):
    """The headline e2e: a typo'd fn name raises immediately and writes
    NOTHING to the log — no retry→dead loop ever starts."""
    with pytest.raises(SpecError, match="not a registered job fn"):
        client.perform_async("noop-typo")
    assert glob.glob(os.path.join(client.ledger.log_dir, "*.parquet")) == []


def test_module_qualified_fn_resolves(client):
    client.perform_async("math:floor", 2.5)  # resolvable builtin


@pytest.mark.parametrize("bad", ["no_such_module:fn", "math:no_such_attr", "", None, 42])
def test_bad_fn_names_rejected(client, bad):
    with pytest.raises(SpecError):
        client.perform_async(bad)


def test_fn_gate_applies_to_all_perform_variants(client):
    now = datetime.now(timezone.utc).replace(tzinfo=None)
    with pytest.raises(SpecError):
        client.perform_at(now + timedelta(60), "nope-typo")
    with pytest.raises(SpecError):
        client.perform_in_sec(60, "nope-typo")
    with pytest.raises(SpecError):
        client.perform_every("c1", "* * * * *", "nope-typo")
    with pytest.raises(SpecError):
        client.perform_batch("nope-typo", [(1,), (2,)])


# --- ::args-serializable? (specs.clj:161-168, specs_test.clj:26-40) --------

def test_unserializable_args_rejected(client):
    with pytest.raises(SpecError, match="JSON-serializable"):
        client.perform_async("noop", object())
    with pytest.raises(SpecError, match="JSON-serializable"):
        client.perform_async("noop", {1, 2, 3})


def test_json_shaped_args_accepted(client):
    client.perform_async("noop", 1, "two", [3, 4], {"five": 6}, None, True)


# --- ::retry-opts (specs.clj:119-143) --------------------------------------

@pytest.mark.parametrize("bad", [-1, "3", 2.5, True, None])
def test_bad_max_retries_rejected(client, bad):
    with pytest.raises(SpecError, match="max_retries"):
        client.perform_async("noop", max_retries=bad)


def test_bad_retry_queue_rejected(client):
    with pytest.raises(SpecError, match="retry_queue"):
        client.perform_async("noop", retry_queue="dead-jobs")  # protected


def test_client_opts_validated_at_construction(tmp_path):
    with pytest.raises(ValueError):
        JobClient(str(tmp_path / "l"), queue="scheduled-jobs")  # protected
    with pytest.raises(SpecError):
        JobClient(str(tmp_path / "l"), max_retries=-2)


def test_unknown_job_option_rejected(client):
    with pytest.raises(SpecError, match="unknown job option"):
        client.perform_async("noop", bogus_opt=1)


# --- ::instant / :sec (specs.clj:170, specs_test.clj:60-64) ----------------

def test_non_datetime_instant_rejected(client):
    with pytest.raises(SpecError, match="datetime"):
        client.perform_at("22-July-2022", "noop")


def test_non_numeric_sec_rejected(client):
    with pytest.raises(SpecError, match="number"):
        client.perform_in_sec("5", "noop")


# --- ::cron-opts (specs.clj:101-107, specs_test.clj:66-70) -----------------

def test_cron_opts_rejections(client):
    with pytest.raises(SpecError, match="cron_name"):
        client.perform_every(None, "* * * * *", "noop")
    with pytest.raises(ValueError, match="cron schedule"):
        client.perform_every("c1", "invalid", "noop")
    with pytest.raises(SpecError, match="timezone"):
        client.perform_every("c1", "* * * * *", "noop", tz="invalid-zone-id")


# --- ::batch-opts / ::batch-args (specs.clj:109-117, test:72-83) -----------

def test_batch_opts_rejections(client):
    with pytest.raises(SpecError, match="callback_fn"):
        client.perform_batch("noop", [(1,)], callback_fn="unresolvable-cb")
    with pytest.raises(SpecError, match="cannot accept 2"):
        client.perform_batch("noop", [(1,)], callback_fn="one-arity")
    with pytest.raises(SpecError, match="linger_sec"):
        client.perform_batch("noop", [(1,)], callback_fn=None, linger_sec="100")
    with pytest.raises(SpecError, match="TUPLES"):
        client.perform_batch("noop", [1, 2])  # bare values, not arg tuples


def test_batch_accepts_generator_args(client):
    """The spec gate must not CONSUME its input: a generator args_coll
    survives validation and enqueues every job (regression: any() used
    to exhaust it, leaving zero rows and an IndexError)."""
    res = client.perform_batch("noop", ((i,) for i in range(3)))
    assert res["total"] == 3 and len(res["job_ids"]) == 3
    with pytest.raises(ValueError, match="at least one"):
        client.perform_batch("noop", (t for t in ()))  # empty generator


# --- instrument=False escape hatch (specs.clj:241-254) ---------------------

def test_unstrumented_client_skips_the_gate(tmp_path):
    client = JobClient(str(tmp_path / "ledger"), instrument=False)
    client.perform_async("noop-typo")  # old behavior: fails at execution
    assert len(glob.glob(os.path.join(client.ledger.log_dir, "*.parquet"))) == 1


# --- worker handler specs (specs.clj:124-128) ------------------------------

def test_worker_rejects_bad_handlers(tmp_path):
    from goose_spark.streaming.worker import Worker

    with pytest.raises(SpecError, match="error_handler"):
        Worker(None, str(tmp_path / "l1"), error_handler="unresolvable-h")
    with pytest.raises(SpecError, match="cannot accept 2"):
        Worker(None, str(tmp_path / "l2"), death_handler="one-arity")
    with pytest.raises(SpecError, match="skip_dead_queue"):
        Worker(None, str(tmp_path / "l3"), skip_dead_queue="yes")
    assert "one-arity" in FN_REGISTRY  # sanity: fixture fn registered
