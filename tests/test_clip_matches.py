"""Video copy detection (multimodal.video_frame_signatures +
clip_matches): exact signature semantics, diagonal-alignment
recovery of a planted clip copy, and the min_run noise gate."""

from __future__ import annotations

from avk_job_skill_analytics_spark.operators.multimodal import (
    build_y4m,
    clip_matches,
    decode_y4m,
    video_frame_signatures,
)


def _sig(yplane: bytes, w: int) -> int:
    return sum((1 + i % w + w * (i // w)) * v
               for i, v in enumerate(yplane))


def test_signature_is_position_weighted_exact():
    """The signature must distinguish planes with equal byte sums
    but different layouts (positional weighting), and match a
    straight recomputation from the decoded plane."""
    def fn(x, y, t):
        return ((x + 10 * y + t) % 256, 0, 0)

    payload = build_y4m(4, 3, 2, fn, chroma="mono")
    w, h, _c, frames = decode_y4m(payload)
    assert (w, h, len(frames)) == (4, 3, 2)
    a = bytes((1, 2, 0, 0))
    b = bytes((0, 0, 2, 1))  # same sum, different positions
    assert _sig(a, 2) != _sig(b, 2)
    assert _sig(frames[0][0], 4) == sum(
        (1 + x + 4 * y) * ((x + 10 * y) % 256)
        for y in range(3) for x in range(4)
    )


def test_planted_clip_recovered(spark):
    """Three videos: B re-emits A's frames 2..5 as its own 0..3
    (one diagonal of 4 matches at offset -2); C is unrelated. The
    alignment join must return exactly the (A, B) run."""
    import pandas as pd

    def content(x, y, t):
        return ((7 * x + 13 * y + 31 * t) % 256, 0, 0)

    def other(x, y, t):
        return ((5 * x + 3 * y + 11 * t + 97) % 256, 0, 0)

    rows = [
        (1, build_y4m(5, 4, 8, content, chroma="mono")),
        (2, build_y4m(5, 4, 4,
                      lambda x, y, t: content(x, y, t + 2),
                      chroma="mono")),
        (3, build_y4m(5, 4, 8, other, chroma="mono")),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"])
    )
    sigs = video_frame_signatures(df)
    assert sigs.count() == 8 + 4 + 8
    out = clip_matches(sigs, min_run=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b, r.t_offset, r.n_matched,
            r.first_frame_a) == (1, 2, -2, 4, 2)


def test_min_run_gates_single_frame_collisions(spark):
    """Two videos sharing exactly ONE frame (a stray collision) must
    not surface as a clip at min_run=2+."""
    import pandas as pd

    def va(x, y, t):
        return ((x + y + 50 * t) % 256, 0, 0)

    def vb(x, y, t):
        # frame 0 equals va's frame 1 (both = x+y+50); later frames
        # diverge (offset 123 per t)
        return ((x + y + 50 + 123 * t) % 256, 0, 0)

    df = spark.createDataFrame(pd.DataFrame(
        [(1, build_y4m(3, 3, 3, va, chroma="mono")),
         (2, build_y4m(3, 3, 3, vb, chroma="mono"))],
        columns=["doc_id", "payload"],
    ))
    sigs = video_frame_signatures(df)
    assert clip_matches(sigs, min_run=2).count() == 0
    one = clip_matches(sigs, min_run=1).collect()
    assert len(one) == 1 and one[0].n_matched == 1


def test_undecodable_payloads_drop(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(
        [(1, b"not a video"), (2, b"YUV4MPEG2 Wbad H2\n")],
        columns=["doc_id", "payload"],
    ))
    assert video_frame_signatures(df).count() == 0
