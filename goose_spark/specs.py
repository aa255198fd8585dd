"""Enqueue-time validation — the engine's clojure.spec gate.

Goose validates at the door (``src/goose/specs.clj:195-307``): the
fn symbol must resolve to a function (``specs.clj:20``), args must
survive an encode→decode→encode round trip (``specs.clj:161-168``),
retry opts must have the right shape (``specs.clj:119-143``), cron and
batch opts likewise (``specs.clj:101-117``). Without the gate, a typo'd
fn name surfaces only at *execution* — as a retry→dead loop — instead
of as an immediate error in the calling code.

Instrumentation is togglable per client (``JobClient(instrument=...)``),
mirroring ``specs/instrument``/``unstrument`` (``specs.clj:241-254``);
unlike goose it defaults ON — the engine's checks are cheap Python
predicates, not spec conformance walks, so there is no 40% penalty to
dodge.
"""

from __future__ import annotations

import inspect
import json
from typing import Callable


class SpecError(ValueError):
    """A call did not conform to spec (goose's ex-info
    \"Call to %s did not conform to spec.\", specs.clj:258-261)."""


def validate_fn_name(name: str, *, arity: int | None = None, what: str = "execute_fn") -> None:
    """::fn-sym parity (specs.clj:20): the name must RESOLVE to a
    callable *now*, in the enqueuing process — via the @job_fn registry
    or the module-qualified ``"pkg.mod:fn"`` form — so a typo fails at
    enqueue, not as a retry→dead loop at execution. ``arity`` (goose
    checks u/arities, specs.clj:113-127) additionally requires the fn to
    accept that many positional args."""
    from goose_spark.functions.registry import FN_REGISTRY

    if not isinstance(name, str) or not name:
        raise SpecError(f"{what} must be a non-empty string, got {name!r}")
    fn: Callable | None = FN_REGISTRY.get(name)
    if fn is None and ":" in name:
        mod_name, attr = name.split(":", 1)
        import importlib

        try:
            fn = getattr(importlib.import_module(mod_name), attr)
        except (ImportError, AttributeError) as exc:
            raise SpecError(f"{what} {name!r} does not resolve: {exc}") from exc
    if fn is None:
        raise SpecError(
            f"{what} {name!r} is not a registered job fn and not "
            f"module-qualified ('pkg.mod:fn'); register it with "
            f"@job_fn({name!r}) before enqueueing (known: {sorted(FN_REGISTRY)[:20]})"
        )
    if not callable(fn):
        raise SpecError(f"{what} {name!r} resolves to a non-callable {type(fn).__name__}")
    if arity is not None:
        try:
            inspect.signature(fn).bind(*([None] * arity))
        except TypeError as exc:
            raise SpecError(
                f"{what} {name!r} cannot accept {arity} positional args "
                f"(signature {inspect.signature(fn)}): {exc}"
            ) from exc
        except ValueError:
            pass  # builtins without introspectable signatures: trust them


def validate_args(args: tuple) -> str:
    """::args-serializable? parity (specs.clj:161-168): args are valid
    iff encoding is *consistent* — encode(decode(encode(x))) ==
    encode(x). The engine's wire format is JSON, so tuples come back as
    lists and custom types must be pre-serialized by the caller, exactly
    like goose's custom-nippy-serializer escape hatch. Returns the
    encoded string so the caller encodes once.

    Scalar args (the overwhelmingly common case) trivially round-trip,
    so they skip the decode/re-encode pass — the gate costs one
    isinstance sweep, not 3× the serialization work (goose documents a
    40% enqueue cost for full spec conformance, specs.clj:245; this
    keeps the engine's gate cheap enough to leave on)."""
    if all(type(a) in (str, int, float, bool, type(None)) for a in args):
        return json.dumps(list(args))
    try:
        encoded = json.dumps(list(args))
        re_encoded = json.dumps(json.loads(encoded))
    except (TypeError, ValueError) as exc:
        raise SpecError(
            f"job args are not JSON-serializable: {exc}; serialize custom "
            f"data types to JSON-representable values before enqueueing"
        ) from exc
    if re_encoded != encoded:
        raise SpecError(
            "job args do not round-trip through JSON (encode(decode(x)) != "
            "encode(x)); pass values that are already JSON-shaped"
        )
    return encoded


def validate_retry_opts(max_retries, retry_queue, validate_queue: Callable[[str], None]) -> None:
    """::retry-opts parity (specs.clj:119-143): max-retries nat-int,
    retry-queue nilable valid queue."""
    if isinstance(max_retries, bool) or not isinstance(max_retries, int) or max_retries < 0:
        raise SpecError(f"max_retries must be a non-negative int, got {max_retries!r}")
    if retry_queue is not None:
        try:
            validate_queue(retry_queue)
        except ValueError as exc:
            raise SpecError(f"invalid retry_queue: {exc}") from exc


def validate_instant(run_at, what: str = "run_at") -> None:
    """::instant parity (specs.clj:170): perform-at takes an Instant."""
    import datetime as _dt

    if not isinstance(run_at, _dt.datetime):
        raise SpecError(f"{what} must be a datetime, got {type(run_at).__name__}")


def validate_timezone(tz: str) -> None:
    """::timezone parity (specs.clj:103): must be a known zone id."""
    import zoneinfo

    try:
        zoneinfo.ZoneInfo(tz)
    except (zoneinfo.ZoneInfoNotFoundError, ValueError, TypeError) as exc:
        raise SpecError(f"unknown timezone {tz!r}") from exc


def validate_batch_opts(callback_fn, linger_sec) -> None:
    """::batch-opts parity (specs.clj:109-117): callback resolves with
    arity 2 (called as callback(batch_id, status)), linger-sec nat-int."""
    if callback_fn is not None:
        validate_fn_name(callback_fn, arity=2, what="callback_fn")
    if isinstance(linger_sec, bool) or not isinstance(linger_sec, int) or linger_sec < 0:
        raise SpecError(f"linger_sec must be a non-negative int, got {linger_sec!r}")


def validate_worker_handlers(error_handler, death_handler, skip_dead_queue) -> None:
    """Worker-side handler specs (specs.clj:124-128): handler syms must
    resolve and accept (job, error); skip-dead-queue must be boolean."""
    if error_handler is not None:
        validate_fn_name(error_handler, arity=2, what="error_handler")
    if death_handler is not None:
        validate_fn_name(death_handler, arity=2, what="death_handler")
    if not isinstance(skip_dead_queue, bool):
        raise SpecError(f"skip_dead_queue must be a bool, got {skip_dead_queue!r}")
