"""Perceptual average-hash (multimodal.ahash_payload /
image_ahash): codec invariance across all four real decoders,
brightness sensitivity contracts, and quarantine semantics — the
per-payload core of mm_ahash_dedup, testable without Spark."""

from __future__ import annotations

import pytest

from avk_job_skill_analytics_spark.operators.jpegcodec import (
    build_jpeg_pixels,
)
from avk_job_skill_analytics_spark.operators.multimodal import (
    ahash_payload,
    build_bmp_pixels,
    build_png_pixels,
)
from avk_job_skill_analytics_spark.operators.webpcodec import (
    build_webp_pixels,
)


def _grey(cid):
    def fn(x, y):
        bx, by = x // 8, y // 8
        return ((13 + cid % 251) * (bx * bx + 3 * by)
                + (7 + cid % 241) * (by * by + 5 * bx)
                + (cid % 127) * bx * by + cid) % 256
    return fn


def _rgb(cid):
    g = _grey(cid)

    def fn(x, y):
        v = g(x, y)
        return (v, v, v)
    return fn


@pytest.mark.parametrize("cid", [0, 3, 7, 12, 29, 58])
def test_codec_invariance_all_four(cid):
    """The SAME block-constant content encoded as PNG, BMP, greyscale
    baseline JPEG, and lossless WebP must produce IDENTICAL hashes —
    the contract mm_ahash_dedup's cross-codec grouping rests on.
    (Block-constant + multiple-of-8 dims is what makes the JPEG
    decode bit-exact; the other three are lossless for any input.)"""
    w, h = 8 * (cid % 6 + 1), 8 * (cid % 5 + 1)
    payloads = {
        "png": build_png_pixels(w, h, _rgb(cid)),
        "bmp": build_bmp_pixels(w, h, _rgb(cid)),
        "jpeg": build_jpeg_pixels(w, h, _grey(cid), grey=True),
        "webp": build_webp_pixels(w, h, _rgb(cid)),
    }
    hashes = {}
    for fmt, p in payloads.items():
        got = ahash_payload(p)
        assert got is not None
        gfmt, gw, gh, hi, lo = got
        assert (gfmt, gw, gh) == (fmt, w, h)
        hashes[fmt] = (hi, lo)
    assert len(set(hashes.values())) == 1, hashes
    hi, lo = hashes["png"]
    assert 0 <= hi < 2**32 and 0 <= lo < 2**32


def test_brightness_invariance_and_structure_sensitivity():
    """aHash thresholds each cell against the image mean, so a
    uniform brightness shift (no wraparound) must NOT change the
    hash, while transposing the gradient structure MUST."""
    def base(x, y):
        v = 10 * (x // 8) + 3 * (y // 8)
        return (v, v, v)

    def brighter(x, y):
        r, g, b = base(x, y)
        return (r + 40, g + 40, b + 40)

    def transposed(x, y):
        v = 10 * (y // 8) + 3 * (x // 8)
        return (v, v, v)

    h0 = ahash_payload(build_png_pixels(32, 24, base))[3:]
    h1 = ahash_payload(build_png_pixels(32, 24, brighter))[3:]
    h2 = ahash_payload(build_png_pixels(32, 24, transposed))[3:]
    assert h0 == h1
    assert h0 != h2


def test_constant_image_hashes_to_zero():
    """A flat image has no cell above the mean: hash (0, 0) — the
    strict > in the bit rule, same as the SQL oracle's CASE."""
    p = build_bmp_pixels(16, 16, lambda x, y: (90, 90, 90))
    assert ahash_payload(p)[3:] == (0, 0)


def test_undecodable_quarantines():
    assert ahash_payload(b"not an image") is None
    assert ahash_payload(build_png_pixels(8, 8, lambda x, y:
                                          (1, 2, 3))[:20]) is None


def test_banded_near_pairs_lossless_and_deduped(spark):
    """Pigeonhole contract of ahash_near_pairs: <= 3 flips always
    leave a whole 16-bit band intact, so every such group pair MUST
    surface (even with the flips spread across three different
    bands); identical hashes collapse to ONE representative (exact
    mass rides as n_docs, never pair-expanded); a pair matching in
    several bands surfaces ONCE; distance-4 pairs are outside the
    threshold."""
    import pandas as pd

    from avk_job_skill_analytics_spark.operators.multimodal import (
        ahash_near_pairs,
    )

    base_hi, base_lo = 0x12345678, 0x9ABCDEF0
    rows = [
        (1, base_hi, base_lo),
        # 3 flips in 3 different bands (lo bit 0, lo bit 16, hi bit 0)
        (2, base_hi ^ 1, base_lo ^ 1 ^ (1 << 16)),
        # identical twin of doc 1: collapses into its group (n=2)
        (3, base_hi, base_lo),
        # 4 flips, one per band: correctly outside the threshold
        (4, base_hi ^ 1 ^ (1 << 16), base_lo ^ 1 ^ (1 << 16)),
        # unrelated
        (5, 0x0F0F0F0F, 0x33CC33CC),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "ahash_hi", "ahash_lo"])
    )
    got = {(r.doc_a, r.doc_b): (r.hamming, r.n_docs_a, r.n_docs_b)
           for r in ahash_near_pairs(df, max_hamming=3).collect()}
    # group {1,3} is represented by 1 with n_docs=2; no hamming-0 row
    assert got[(1, 2)] == (3, 2, 1)
    assert (1, 3) not in got and (2, 3) not in got
    assert (1, 4) not in got and (3, 4) not in got
    # doc 2 vs 4: differs only in hi bit 16 -> hamming 1, found
    assert got[(2, 4)] == (1, 1, 1)
    assert len(got) == 2


def test_pixel_knn_exact_l2_and_twin_nearest(spark):
    """cell_mean_vectors must floor-quantize decoded cell means to
    exact integers, and pixel_knn's zip_with fold must rank by exact
    squared-L2 with the (dist2, id) total order: a lightly edited
    twin outranks unrelated images, and an identical copy sits at
    distance 0."""
    import pandas as pd

    from avk_job_skill_analytics_spark.operators.multimodal import (
        cell_mean_vectors,
        pixel_knn,
    )
    from pyspark.sql import functions as F

    def base(x, y):
        v = (11 * (x // 8) + 29 * (y // 8)) % 256
        return (v, v, v)

    def edited(x, y):
        # shift exactly hash cell (0, 0): at 32x24 a cell is 4x3 px
        v, _, _ = base(x, y)
        if x < 4 and y < 3:
            v = (v + 40) % 256
        return (v, v, v)

    def far(x, y):
        v = (200 - 3 * (x // 8) * (y // 8)) % 256
        return (v, v, v)

    rows = [
        (1, build_png_pixels(32, 24, base)),
        (2, build_bmp_pixels(32, 24, base)),      # identical content
        (3, build_png_pixels(32, 24, edited)),    # one cell shifted
        (4, build_png_pixels(32, 24, far)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"])
    )
    vecs = cell_mean_vectors(df)
    out = pixel_knn(vecs, F.col("doc_id") == 1, k=3).collect()
    ranked = sorted(out, key=lambda r: r.rk)
    assert [r.neighbor_id for r in ranked] == [2, 3, 4]
    assert ranked[0].dist2 == 0       # cross-codec identical copy
    # one whole cell's mean shifted by +40 luma = +120 intensity
    assert ranked[1].dist2 == 120 * 120
