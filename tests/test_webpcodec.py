"""VP8L lossless-WebP codec (operators/webpcodec): bit-exact
round-trips through both prefix-code forms, hand-built bitstreams
exercising the decoder-only paths (LZ77 backrefs, color cache,
SUBTRACT_GREEN), header-walk agreement, and quarantine semantics."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from avk_job_skill_analytics_spark.operators.multimodal import (
    decode_pixels,
    parse_media_header,
)
from avk_job_skill_analytics_spark.operators.webpcodec import (
    _BitWriter,
    build_webp_pixels,
    decode_webp_pixels,
)


def _expected(w, h, fn):
    return bytes(v for y in range(h) for x in range(w) for v in fn(x, y))


@pytest.mark.parametrize("did", [0, 2, 4, 6, 8, 10, 12, 26])
def test_normal_code_roundtrip_exact(did):
    """Uniform 8-bit normal codes (code-length-coded): lossless, so
    the decode must be BIT-EXACT — this is what lets
    mm_webp_pixel_stats hash-replay in the SQL oracle."""
    w, h = did % 14 + 1, did % 10 + 1

    def fn(x, y):
        return ((3 * x + 5 * y + did) % 256, (7 * x + y + 2 * did) % 256,
                (x + 11 * y + 3 * did) % 256)

    dec = decode_webp_pixels(build_webp_pixels(w, h, fn))
    assert dec == (w, h, 3, _expected(w, h, fn))


@pytest.mark.parametrize("did", [1, 3, 5, 7, 9, 11, 25])
def test_simple_code_roundtrip_exact(did):
    """1-bit "simple" prefix codes (two values per channel)."""
    w, h = did % 12 + 1, did % 8 + 1

    def fn(x, y):
        p = (x + y + did) % 2
        return ((5 * did + 97 * p) % 256, (3 * did + 41 * p) % 256,
                (7 * did + 59 * p) % 256)

    dec = decode_webp_pixels(build_webp_pixels(w, h, fn, simple=True))
    assert dec == (w, h, 3, _expected(w, h, fn))


@given(
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_roundtrip_property_random_pixels(w, h, seed):
    """Any byte content round-trips through the normal-code path (the
    uniform 8-bit code covers all 256 values per channel), and the
    header walk agrees with the bitstream geometry."""
    def fn(x, y):
        v = (seed + 2654435761 * (y * 64 + x)) & 0xFFFFFFFF
        return (v & 255, (v >> 8) & 255, (v >> 16) & 255)

    payload = build_webp_pixels(w, h, fn)
    assert parse_media_header(payload) == (len(payload), w, h, "webp")
    assert decode_webp_pixels(payload) == (w, h, 3, _expected(w, h, fn))


def test_decode_pixels_dispatch():
    """multimodal.decode_pixels routes RIFF/WEBP payloads to the VP8L
    decoder (the raster ledger's fourth codec)."""
    p = build_webp_pixels(3, 2, lambda x, y: (x * 50, y * 80, 7))
    assert decode_pixels(p) == (
        3, 2, 3, _expected(3, 2, lambda x, y: (x * 50, y * 80, 7))
    )


def test_pillow_agrees_if_installed():
    """When Pillow happens to be present (NOT a dependency), the
    reference decoder must agree with ours byte-for-byte — external
    proof the emitted bitstream is genuine VP8L."""
    PIL_Image = pytest.importorskip("PIL.Image")
    from io import BytesIO

    def fn(x, y):
        return ((x * 31 + y * 17) % 256, (x + 3 * y) % 256, 200)

    payload = build_webp_pixels(5, 4, fn)
    im = PIL_Image.open(BytesIO(payload)).convert("RGB")
    assert (im.width, im.height) == (5, 4)
    assert im.tobytes() == _expected(5, 4, fn)


# ------------------------------------------------------------------
# hand-built bitstreams: decoder-only paths the encoder never emits


def _wrap(bw: _BitWriter) -> bytes:
    data = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(0, 1)   # alpha_is_used
    bw.bits(0, 3)   # version


def _simple1(bw: _BitWriter, sym: int) -> None:
    bw.bits(1, 1)
    bw.bits(0, 1)
    bw.bits(1, 1)
    bw.bits(sym, 8)


def test_lz77_backref_linear_distance():
    """Literal pixel then a length-3 backward reference at linear
    distance code 121 (= distance 1): the decoder must replicate the
    previous pixel. Green code is a hand-built normal code over
    {literal 42, length-code 258}."""
    bw = _BitWriter()
    _header(bw, 4, 1)
    bw.bits(0, 1)   # no transforms
    bw.bits(0, 1)   # no cache
    bw.bits(0, 1)   # no meta
    # green: normal; code-length code over {1: len1, 18: len1}
    bw.bits(0, 1)                # not simple
    bw.bits(0, 4)                # num_code_lengths = 4
    for ln in (0, 1, 0, 1):      # ORDER[0..3] = 17, 18, 0, 1
        bw.bits(ln, 3)
    bw.bits(0, 1)                # no max_symbol
    # cl canonical: symbol 1 -> code 0, symbol 18 -> code 1 (1 bit)
    bw.code(1, 1)                # 18-run: zeros 0..41
    bw.bits(42 - 11, 7)
    bw.code(0, 1)                # symbol 42: length 1
    bw.code(1, 1)                # 18-run 138: zeros 43..180
    bw.bits(138 - 11, 7)
    bw.code(1, 1)                # 18-run 77: zeros 181..257
    bw.bits(77 - 11, 7)
    bw.code(0, 1)                # symbol 258 (length code 2): length 1
    bw.code(1, 1)                # 18-run 21: zeros 259..279
    bw.bits(21 - 11, 7)
    _simple1(bw, 7)              # red
    _simple1(bw, 9)              # blue
    _simple1(bw, 255)            # alpha
    _simple1(bw, 13)             # distance: always prefix code 13
    # pixels: literal (green 42 -> code 0), then backref
    bw.code(0, 1)
    bw.code(1, 1)                # green 258 -> LZ77 length code 2 -> 3
    bw.bits(24, 5)               # dist code 13 + extra 24 -> 121 -> d=1
    dec = decode_webp_pixels(_wrap(bw))
    assert dec == (4, 1, 3, bytes((7, 42, 9)) * 4)


def test_short_2d_distance_codes_quarantine():
    """Distance codes <= 120 (the 2D-neighborhood map this module
    does not vendor) must quarantine, not mis-decode."""
    bw = _BitWriter()
    _header(bw, 4, 1)
    bw.bits(0, 1)
    bw.bits(0, 1)
    bw.bits(0, 1)
    bw.bits(0, 1)                # green: same normal code as above
    bw.bits(0, 4)
    for ln in (0, 1, 0, 1):
        bw.bits(ln, 3)
    bw.bits(0, 1)
    bw.code(1, 1)
    bw.bits(42 - 11, 7)
    bw.code(0, 1)
    bw.code(1, 1)
    bw.bits(138 - 11, 7)
    bw.code(1, 1)
    bw.bits(77 - 11, 7)
    bw.code(0, 1)
    bw.code(1, 1)
    bw.bits(21 - 11, 7)
    _simple1(bw, 7)
    _simple1(bw, 9)
    _simple1(bw, 255)
    _simple1(bw, 2)              # distance prefix code 2 -> dcode 3
    bw.code(0, 1)
    bw.code(1, 1)                # backref; dcode 3 <= 120 -> None
    assert decode_webp_pixels(_wrap(bw)) is None


def test_color_cache_roundtrip():
    """Literal pixel, then a color-cache hit re-emitting it: the
    cache slot is computed with the spec's 0x1E35A7BD hash."""
    r0, g0, b0 = 7, 42, 9
    argb = (255 << 24) | (r0 << 16) | (g0 << 8) | b0
    slot = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> 31  # cache_bits = 1
    cache_sym = 280 + slot
    bw = _BitWriter()
    _header(bw, 2, 1)
    bw.bits(0, 1)                # no transforms
    bw.bits(1, 1)                # color cache present
    bw.bits(1, 4)                # cache_bits = 1
    bw.bits(0, 1)                # no meta
    # green: normal over 282 symbols {42, cache_sym}; code-length
    # code over {0: len2, 1: len2, 18: len1}
    bw.bits(0, 1)
    bw.bits(0, 4)                # num_code_lengths = 4
    for ln in (0, 1, 2, 2):      # ORDER: 17->0, 18->1, 0->2, 1->2
        bw.bits(ln, 3)
    bw.bits(0, 1)                # no max_symbol
    cl = {18: (0, 1), 0: (2, 2), 1: (3, 2)}  # canonical
    bw.code(*cl[18])             # zeros 0..41
    bw.bits(42 - 11, 7)
    bw.code(*cl[1])              # symbol 42: length 1
    n_zeros = cache_sym - 43     # zeros 43..cache_sym-1 (237 or 238)
    bw.code(*cl[18])
    bw.bits(138 - 11, 7)
    bw.code(*cl[18])
    bw.bits((n_zeros - 138) - 11, 7)
    bw.code(*cl[1])              # cache_sym: length 1
    for _ in range(282 - cache_sym - 1):
        bw.code(*cl[0])          # trailing zero literals (0 or 1)
    _simple1(bw, r0)
    _simple1(bw, b0)
    _simple1(bw, 255)
    _simple1(bw, 0)              # distance (unused)
    bw.code(0, 1)                # literal: green 42 (code 0)
    bw.code(1, 1)                # cache hit (code 1)
    dec = decode_webp_pixels(_wrap(bw))
    assert dec == (2, 1, 3, bytes((r0, g0, b0)) * 2)


def test_subtract_green_inverse():
    """SUBTRACT_GREEN transform: the decoder must add green back to
    red and blue after entropy decoding."""
    bw = _BitWriter()
    _header(bw, 1, 1)
    bw.bits(1, 1)                # one transform present
    bw.bits(2, 2)                # type 2 = SUBTRACT_GREEN (no data)
    bw.bits(0, 1)                # end of transform list
    bw.bits(0, 1)                # no cache
    bw.bits(0, 1)                # no meta
    _simple1(bw, 42)             # green (one symbol: zero bits/px)
    _simple1(bw, 10)             # red (stored r' = r - g)
    _simple1(bw, 20)             # blue
    _simple1(bw, 255)            # alpha
    _simple1(bw, 0)              # distance
    dec = decode_webp_pixels(_wrap(bw))
    assert dec == (1, 1, 3, bytes((52, 42, 62)))


def test_other_transforms_quarantine():
    """Predictor / color / palette transforms are out of subset."""
    for ttype in (0, 1, 3):
        bw = _BitWriter()
        _header(bw, 2, 2)
        bw.bits(1, 1)
        bw.bits(ttype, 2)
        assert decode_webp_pixels(_wrap(bw)) is None


def test_quarantine_malformed():
    p = build_webp_pixels(3, 3, lambda x, y: (x, y, 7))
    assert decode_webp_pixels(p[:20]) is None        # truncated
    assert decode_webp_pixels(b"plain text") is None
    # lossy VP8 chunk: header parses, pixels quarantine
    lossy = (b"RIFF" + struct.pack("<I", 22) + b"WEBP" + b"VP8 "
             + struct.pack("<I", 10)
             + b"\x00\x00\x00\x9d\x01\x2a\x03\x00\x02\x00")
    assert parse_media_header(lossy) == (len(lossy), 3, 2, "webp")
    assert decode_webp_pixels(lossy) is None
    # incomplete (non-Kraft) code lengths quarantine
    bw = _BitWriter()
    _header(bw, 2, 1)
    bw.bits(0, 1)
    bw.bits(0, 1)
    bw.bits(0, 1)
    bw.bits(0, 1)                # green: normal
    bw.bits(0, 4)
    for ln in (0, 1, 0, 2):      # cl code {18: 1, 1: 2}: incomplete
        bw.bits(ln, 3)
    assert decode_webp_pixels(_wrap(bw)) is None


def test_simple_encoder_rejects_rich_channels():
    with pytest.raises(ValueError):
        build_webp_pixels(4, 4, lambda x, y: (x * 16, 0, 0), simple=True)
    with pytest.raises(ValueError):
        build_webp_pixels(0x4001, 1, lambda x, y: (0, 0, 0))


# Golden VP8L stream assembled BY HAND from RFC 9649 (bit-by-bit,
# sharing no code with operators/webpcodec — see derivation below),
# so the decoder is validated against an independently produced
# bitstream even where Pillow/libwebp is unavailable and the
# roundtrip tests would otherwise only ever exercise encoder and
# decoder together (a symmetric misinterpretation would pass both).
#
# Layout (all multi-bit fields LSB-first; prefix codes MSB-first):
#   RIFF/WEBP container, one VP8L chunk, signature 0x2F
#   width-1=3 (14b), height-1=1 (14b), alpha_used=0, version=0
#   transform list: SUBTRACT_GREEN only
#   color cache: cache_bits=2
#   GREEN: normal prefix code — 6-entry code-length code
#     (lengths: sym0=3, sym2=2, sym3=2, sym17=3, sym18=2), max_symbol
#     early stop, zero runs via codes 17 (3+3b) and 18 (11+7b), one
#     literal zero; green alphabet {0,10,20, 257 (LZ77 len-2),
#     281/283 (cache refs)} with lengths {2,3,3,3,3,3}
#   RED simple 2-symbol {30,100}; BLUE simple 2-symbol {40,200};
#   ALPHA simple 1-symbol {255}; DIST simple 1-symbol {13}
#   pixels: 2 literals, LZ77 copy (len 2, dist code 122 -> d=2 via
#     5 extra bits), 2 color-cache hits, 1 literal, 1 cache hit
# Every feature here (SUBTRACT_GREEN, color cache, LZ77 backrefs,
# repeat/zero codes, max_symbol) is OUTSIDE what build_webp_pixels
# emits, so this cannot be satisfied by encoder symmetry.
_GOLDEN_VP8L = bytes.fromhex(
    "524946462a000000574542505650384c1d0000002f034000005590699052"
    "236e6efb773586f31e644741ee7f1b3c34ef3c00"
)
# stored (a,r,g,b) pixels: px0=(255,100,10,200), px1=(255,30,20,40),
# px6=(255,100,0,200); sequence px0,px1,[LZ77: px0,px1],[cache: px0,
# px1],px6,[cache: px6]; output applies inverse SUBTRACT_GREEN
# (r+=g, b+=g mod 256) -> rows of RGB triples below, computed by hand
_GOLDEN_RGB = bytes.fromhex(
    "6e0ad232143c6e0ad232143c6e0ad232143c6400c86400c8"
)


def test_golden_spec_assembled_stream_decodes_exactly():
    """decode_webp_pixels must reproduce the hand-computed pixels of
    a spec-assembled stream it did not help create — the
    encoder-independent gate ADVICE r11 #2 asked for."""
    assert decode_pixels(_GOLDEN_VP8L) == (4, 2, 3, _GOLDEN_RGB)


def test_golden_stream_survives_container_padding():
    """The RIFF walk must reach VP8L behind a preceding chunk (the
    spec allows e.g. VP8X ahead of the bitstream chunk)."""
    import struct as _struct

    vp8l_off = _GOLDEN_VP8L.index(b"VP8L")
    extra = b"XTRA" + _struct.pack("<I", 3) + b"abc" + b"\x00"
    body = b"WEBP" + extra + _GOLDEN_VP8L[vp8l_off:]
    payload = b"RIFF" + _struct.pack("<I", len(body)) + body
    assert decode_pixels(payload) == (4, 2, 3, _GOLDEN_RGB)
