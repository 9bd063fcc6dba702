"""Audio constellation fingerprinting (operators/audio.py): gain
invariance, separability margins, malformed-payload rejection, the
Spark pipeline's exact pair set, and its plan shape (one Arrow pass,
reused exchange, no all-pairs join).

Reference parity note: the reference pipeline has no audio path; this
is the training-data extension tier next to image pHash dedup.
"""

from collections import Counter

import pytest

from etl_pipeline_for_retail_sales_data_spark.operators import audio


def _best_aligned(lma, lmb):
    ha = {}
    for h, t in lma:
        ha.setdefault(h, []).append(t)
    c = Counter()
    for h, t in lmb:
        for ta in ha.get(h, []):
            c[t - ta] += 1
    return max(c.values()) if c else 0


def test_landmarks_gain_invariant_and_count_pinned():
    """All four gain-shifted members of a group produce IDENTICAL
    landmark lists (argmax commutes with uniform spectral scaling), and
    the count matches the closed-form formula the oracle pins."""
    for g in [0, 9, 321]:
        lms = [audio.wav_landmarks(audio.synth_wav(g * 4 + m)) for m in range(4)]
        assert all(l == lms[0] for l in lms)
        assert len(lms[0]) == audio.landmark_count(32, 2) == 61


def test_synth_wav_tone_cache_bit_identical_to_grid_formula():
    """r11: synth_wav assembles frames from the bounded per-bin tone-row
    table — every WAV byte must equal the former one-shot grid broadcast
    (same scalar·array evaluation order, so the doubles cannot differ).
    Covers multiple groups, gains, and repeated calls (cache hits)."""
    import io
    import wave

    import numpy as np

    def grid_synth(doc_id, group_size=4, n_frames=32, frame_len=1024, framerate=8000):
        g = doc_id // group_size
        m = doc_id % group_size
        gain = 1.0 + 0.15 * m
        k = np.arange(frame_len)
        n_bins = frame_len // 2 - 32
        b = np.array([16 + audio._mix(g, t) % n_bins for t in range(n_frames)])
        tones = np.sin(2 * np.pi * b[:, None] * k[None, :] / frame_len)
        samples = np.round(6000.0 * gain * tones).astype(np.int16).reshape(-1)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(framerate)
            w.writeframes(samples.tobytes())
        return buf.getvalue()

    for doc_id in [0, 1, 3, 17, 997, 5001]:
        assert audio.synth_wav(doc_id) == grid_synth(doc_id), doc_id
        # second call exercises the warm-cache path
        assert audio.synth_wav(doc_id) == grid_synth(doc_id), doc_id


def test_cross_group_aligned_matches_stay_far_below_threshold():
    """The separability margin the pipeline's threshold rests on:
    in-group pairs score the full 61 aligned matches at offset 0;
    unrelated recordings share at most a few scattered landmarks
    (measured worst 1 over 7k pairs at default geometry — assert ≤ 5
    over a 40-group sample, generous like the pHash margins)."""
    lms = {g: audio.wav_landmarks(audio.synth_wav(g * 4)) for g in range(40)}
    worst = max(
        _best_aligned(lms[a], lms[b]) for a in range(40) for b in range(a + 1, 40)
    )
    assert worst <= 5
    assert _best_aligned(lms[0], audio.wav_landmarks(audio.synth_wav(1))) == 61


def test_wav_landmarks_rejections_and_degenerate():
    """Typed rejection for non-16-bit-mono payloads; a recording too
    short to frame yields no landmarks rather than crashing."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 64)
    with pytest.raises(ValueError, match="16-bit mono"):
        audio.wav_landmarks(buf.getvalue())

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x01\x00" * 100)  # < 2 frames at frame_len=1024
    assert audio.wav_landmarks(buf.getvalue()) == []


def test_spark_pipeline_exact_pairs_and_plan(spark, sf_smoke):
    """End to end on executors: the output is exactly the within-group
    pair enumeration, the Arrow signature stage runs ONCE (reused
    exchange), and there is no cartesian anywhere."""
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(48)
    out = audio.audio_fingerprint_candidates(docs)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    expected = {(a, b) for a in ids for b in ids if a < b and a // 4 == b // 4}
    assert got == expected and len(expected) > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("MapInPandas lm_batches") == 1
    assert "ReusedExchange" in final
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_posting_cap_bites(spark, sf_smoke):
    """With max_postings below the group size every in-group landmark
    key is dropped before the join — the hot-key guard must eliminate
    all pairs, proving it runs BEFORE fan-out, not after."""
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(16)
    out = audio.audio_fingerprint_candidates(docs, max_postings=3)
    assert out.count() == 0
