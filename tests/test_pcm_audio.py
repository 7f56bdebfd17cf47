"""WAV PCM16 codec (multimodal.build_wav_pcm / decode_wav_pcm) and
pcm_stats semantics: exact round-trips, interleave/byte-order
checks, zero-crossing rule, and quarantine for non-PCM16 WAVs."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from avk_job_skill_analytics_spark.operators.multimodal import (
    build_wav,
    build_wav_pcm,
    decode_wav_pcm,
    parse_media_header,
)


def test_roundtrip_exact_stereo():
    samples = [0, -1, 32767, -32768, 5, -5, 100, -100]
    p = build_wav_pcm(44100, 2, samples)
    assert parse_media_header(p) == (len(p), 44100, 2, "wav")
    assert decode_wav_pcm(p) == (44100, 2, tuple(samples))


@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    ch=st.integers(1, 3),
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(0, 40),
)
@settings(max_examples=40, deadline=None)
def test_roundtrip_property(rate, ch, seed, n):
    samples = [((seed + 40503 * i) % 65536) - 32768
               for i in range(n * ch)]
    assert decode_wav_pcm(build_wav_pcm(rate, ch, samples)) == (
        rate, ch, tuple(samples)
    )


def test_byte_order_is_little_endian():
    """Sample 1 must serialize as 01 00, not 00 01 — a big-endian
    writer/reader pair would round-trip but corrupt real WAVs."""
    p = build_wav_pcm(8000, 1, [1])
    assert p[-2:] == b"\x01\x00"
    assert decode_wav_pcm(p)[2] == (1,)


def test_quarantine_non_pcm16():
    # empty-data canonical WAV still decodes (0 samples)
    assert decode_wav_pcm(build_wav(8000, 1)) == (8000, 1, ())
    # 8-bit / float / compressed formats quarantine
    p = bytearray(build_wav_pcm(8000, 1, [1, 2]))
    p[34] = 8  # bits/sample 16 -> 8
    assert decode_wav_pcm(bytes(p)) is None
    p = bytearray(build_wav_pcm(8000, 1, [1, 2]))
    p[20] = 3  # format tag 1 (PCM) -> 3 (IEEE float)
    assert decode_wav_pcm(bytes(p)) is None
    # truncated data chunk
    assert decode_wav_pcm(build_wav_pcm(8000, 1, [1, 2, 3])[:-2]) is None
    # odd byte count vs stereo frame size
    bad = (b"RIFF" + struct.pack("<I", 38) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
           + b"data" + struct.pack("<I", 2) + b"\x01\x00")
    assert decode_wav_pcm(bad) is None
    assert decode_wav_pcm(b"not audio") is None


def test_pcm_stats_zero_crossing_rule(spark):
    """Strict sign flips only: zeros break a run (…, -1, 0, 1, …
    counts no crossing), and channels are deinterleaved before
    counting — an interleave bug would see spurious flips."""
    import pandas as pd

    from avk_job_skill_analytics_spark.operators.multimodal import (
        pcm_stats,
    )

    # mono: -1, 0, 1, -2, 2  -> crossings at (1,-2) and (-2,2) = 2
    mono = build_wav_pcm(8000, 1, [-1, 0, 1, -2, 2])
    # stereo: L = (1, 1, 1), R = (-1, -1, -1): 0 crossings per
    # channel, but the interleaved stream (1,-1,1,-1,1,-1) has 5
    stereo = build_wav_pcm(8000, 2, [1, -1, 1, -1, 1, -1])
    df = spark.createDataFrame(pd.DataFrame(
        [(1, mono), (2, stereo), (3, b"junk")],
        columns=["doc_id", "payload"],
    ))
    rows = {r.doc_id: r for r in pcm_stats(df).collect()}
    assert set(rows) == {1, 2}  # junk quarantined
    assert rows[1].n_zero_cross == 2
    assert rows[1].sum_abs == 6 and rows[1].peak == 2
    assert rows[2].n_zero_cross == 0
    assert rows[2].n_samples == 6 and rows[2].channels == 2


def test_audio_window_signatures_feed_clip_matches(spark):
    """The audio window-signature ledger must drive the SAME
    alignment operator as video: a stream re-emitting another's
    samples from a window boundary surfaces as one diagonal run;
    partial-window tails are dropped (full windows only)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from avk_job_skill_analytics_spark.operators.multimodal import (
        clip_matches,
        pcm_window_signatures,
    )

    def s(i):
        return ((37 * i * i + 11 * i) % 4001) - 2000

    a = build_wav_pcm(8000, 1, [s(i) for i in range(70)])     # 4 windows
    b = build_wav_pcm(8000, 1, [s(16 + i) for i in range(48)])  # 3
    c = build_wav_pcm(8000, 1, [1000 - 13 * i for i in range(40)])
    df = spark.createDataFrame(pd.DataFrame(
        [(1, a), (2, b), (3, c), (4, b"junk")],
        columns=["doc_id", "payload"],
    ))
    sigs = pcm_window_signatures(df, window=16)
    per_doc = {r.doc_id: r.cnt for r in
               sigs.groupBy("doc_id")
               .agg(F.count("sig").alias("cnt")).collect()}
    assert per_doc == {1: 4, 2: 3, 3: 2}  # 70//16=4, 48//16=3, junk gone
    out = clip_matches(sigs, min_run=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b, r.t_offset, r.n_matched,
            r.first_frame_a) == (1, 2, -1, 3, 1)
