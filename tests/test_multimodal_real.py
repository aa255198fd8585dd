"""Real-decoder gate (round-9 directive #8): when an imaging library is
present, the SAME ``extract_features`` kernel the oracle-checked mm1
plumbing uses must measure real image payloads correctly. Skips (does
not fail) where the container has no imaging lib — the self-healing
protobuf/transformWithState gate pattern: installing Pillow flips these
rows on with zero code change."""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL.Image", reason="imaging library not installed")

from goose_spark.operators.multimodal import (  # noqa: E402
    decode_image,
    extract_features,
    imaging_available,
    real_features,
)


def _png(width: int, height: int) -> bytes:
    img = PIL.new("RGB", (width, height), color=(width % 256, 0, 0))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_gate_reports_available():
    assert imaging_available()


def test_decode_roundtrip():
    img = decode_image(_png(20, 10))
    assert (img.width, img.height) == (20, 10)


def test_real_features_null_and_poison_policy():
    assert real_features(None) == (0, 0, 0)
    assert real_features(b"not an image") == (0, 0, 0)  # poisoned row, no raise


def test_kernel_measures_real_payloads(spark):
    dims = [(16, 8), (32, 4), (7, 7)]
    rows = [(i, _png(w, h)) for i, (w, h) in enumerate(dims)]
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["width"], r["height"], r["frames"], r["n_bytes"])
        for r in extract_features(d, features=real_features).collect()
    }
    for i, (w, h) in enumerate(dims):
        width, height, frames, n_bytes = got[i]
        assert (width, height, frames) == (w, h, 1)
        assert n_bytes == len(rows[i][1])
