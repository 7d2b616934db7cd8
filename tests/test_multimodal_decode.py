"""The REAL_DECODE codec branch: PIL-gated, skip-if-absent.

The environment does not ship Pillow, so `real_decode_px` is normally
unreachable (REAL_DECODE=False) and this module skips. The moment the
environment gains the dependency, the branch is exercised for real:
a synthetic PNG with known pixel values must round-trip to exact
greyscale stats, and the mapInPandas plumbing must produce the same
rows through the REAL_DECODE switch as a direct kernel call.
"""

from __future__ import annotations

import pytest

PIL = pytest.importorskip("PIL", reason="real codec path needs Pillow")

import io

import numpy as np
from PIL import Image

from systematic_review_classification_spark.operators import multimodal


def _png_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr.astype(np.uint8), mode="L").save(buf, format="PNG")
    return buf.getvalue()


def test_real_decode_px_greyscale_stats():
    arr = np.arange(48, dtype=np.uint8).reshape(6, 8)
    n_px, mean_px = multimodal.real_decode_px(_png_bytes(arr))
    assert n_px == 48
    assert mean_px == pytest.approx(arr.mean(), abs=1e-6)


def test_real_decode_px_rgb_converts_to_grey():
    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    rgb[..., 0] = 255  # pure red -> ITU-R 601 grey 76
    buf = io.BytesIO()
    Image.fromarray(rgb, mode="RGB").save(buf, format="PNG")
    n_px, mean_px = multimodal.real_decode_px(buf.getvalue())
    assert n_px == 16
    assert mean_px == pytest.approx(76.0, abs=1.0)


def test_decode_switch_routes_through_real_branch(spark):
    arr = np.full((3, 5), 7, dtype=np.uint8)
    rows = [(1, _png_bytes(arr)), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    out = {
        r["doc_id"]: (r["n_px"], r["mean_px"])
        for r in df.mapInPandas(
            multimodal.make_decoder(True), "doc_id long, n_px long, mean_px double"
        ).collect()
    }
    assert out[1] == (15, 7.0)
    assert out[2] == (None, None)
