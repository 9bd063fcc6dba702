"""Real stdlib media codecs (BMP byte-layout parsing, WAV via the wave
module): roundtrip, malformed-payload rejection, and the Spark
end-to-end encode→decode path.

Reference parity note: the reference pipeline has no media handling at
all; this is the engine's training-data extension tier (multimodal
columns), with the container-feasible codecs done for real and the rest
documented as stubbed (operators/multimodal.py module docstring).
"""

import struct

import pytest

from etl_pipeline_for_retail_sales_data_spark.operators import multimodal as MM


def test_bmp_roundtrip_exact_geometry():
    for w, h in [(1, 1), (2, 3), (31, 23), (17, 1)]:
        payload = MM.encode_bmp(w, h)
        assert payload[:2] == b"BM"
        assert MM.parse_bmp(payload) == (w, h, 1)
        # declared size == actual size == header + padded rows
        pad = (4 - (w * 3) % 4) % 4
        assert len(payload) == 54 + (w * 3 + pad) * h


def test_bmp_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="not a BMP"):
        MM.parse_bmp(b"JFIF" + b"\x00" * 60)
    good = MM.encode_bmp(4, 4)
    with pytest.raises(ValueError, match="declares"):
        MM.parse_bmp(good[:-1])  # truncated: declared size disagrees
    # 8bpp header is unsupported by the 24-bit parser
    mutated = bytearray(good)
    struct.pack_into("<H", mutated, 28, 8)
    with pytest.raises(ValueError, match="unsupported"):
        MM.parse_bmp(bytes(mutated))


def test_wav_roundtrip_frames_and_rate():
    for frames in [1, 7, 500]:
        payload = MM.encode_wav(frames, framerate=8000)
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        assert MM.parse_wav(payload) == (1, 8000, frames)
        assert len(payload) == 44 + 2 * frames  # PCM header + int16 samples


def test_stdlib_decoder_sniffs_and_routes():
    assert MM.stdlib_decoder(MM.encode_bmp(5, 2)) == (5, 2, 1)
    assert MM.stdlib_decoder(MM.encode_wav(9)) == (1, 8000, 9)
    assert MM.stdlib_decoder(MM.encode_png(6, 4)) == (6, 4, 1)
    with pytest.raises(ValueError, match="unrecognized"):
        MM.stdlib_decoder(b"GIF89a\x00\x00")  # no GIF codec


def test_default_decoder_real_for_bmp_wav_png_stub_beyond():
    assert MM.default_decoder(MM.encode_bmp(3, 3)) == (3, 3, 1)
    assert MM.default_decoder(MM.encode_png(3, 3)) == (3, 3, 1)
    with pytest.raises(NotImplementedError):
        MM.default_decoder(b"GIF89a\x00\x00")  # GIF stays stubbed
    # a recognized-but-corrupt payload surfaces its parse error, it is
    # NOT misreported as a missing codec
    with pytest.raises(ValueError, match="missing IHDR"):
        MM.default_decoder(b"\x89PNG\r\n\x1a\n")


def test_png_roundtrip_all_filters_pixel_exact():
    """encode(filters='cycle') emits every scanline filter type; decode
    must CRC-verify, inflate, unfilter all five, and reproduce the
    generating pixels byte-for-byte."""
    for w, h in [(1, 1), (3, 2), (29, 19), (17, 11)]:
        for filters in ("none", "cycle"):
            p = MM.encode_png(w, h, filters=filters)
            assert p[:8] == b"\x89PNG\r\n\x1a\n"
            dw, dh, rgb = MM.decode_png_pixels(p)
            assert (dw, dh) == (w, h)
            assert rgb == b"".join(MM._png_pixels(w, h))
            assert MM.parse_png(p) == (w, h, 1)


def test_png_rejects_corruption():
    good = MM.encode_png(8, 8)
    # flipped byte inside IHDR data -> CRC mismatch
    bad = bytearray(good)
    bad[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        MM.parse_png(bytes(bad))
    # truncated chunk
    with pytest.raises(ValueError):
        MM.parse_png(good[:30])
    # unsupported shape: 16-bit depth in IHDR (with a VALID re-computed
    # CRC, so the depth check itself must fire)
    import struct as _s
    import zlib as _z

    ihdr = _s.pack(">IIBBBBB", 8, 8, 16, 2, 0, 0, 0)
    chunk = _s.pack(">I", len(ihdr)) + b"IHDR" + ihdr + _s.pack(
        ">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="unsupported PNG"):
        MM.parse_png(b"\x89PNG\r\n\x1a\n" + chunk + good[len(b"\x89PNG\r\n\x1a\n") + len(chunk):])


def _grad(w, h):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255) // max(w - 1, 1)
    g = (y * 255) // max(h - 1, 1)
    b = ((x + y) * 255) // max(w + h - 2, 1)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_jpeg_roundtrip_within_tolerance():
    """Baseline JPEG encode→decode: exact dims, bounded reconstruction
    error on smooth content, near-exact on flat color (DC-only blocks)."""
    import numpy as np

    from etl_pipeline_for_retail_sales_data_spark.operators import jpeg as J

    for w, h in [(8, 8), (16, 16), (29, 19), (9, 25), (64, 48)]:
        rgb = _grad(w, h)
        payload = J.encode_jpeg(rgb)
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        dw, dh, out = J.decode_jpeg_pixels(payload)
        assert (dw, dh) == (w, h)
        assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= 24
        assert J.parse_jpeg(payload) == (w, h, 1)

    flat = np.full((24, 16, 3), 120, dtype=np.uint8)
    _, _, out = J.decode_jpeg_pixels(J.encode_jpeg(flat))
    assert int(np.abs(out.astype(int) - 120).max()) == 0


def test_jpeg_subsampled_roundtrips():
    """4:2:0 (the camera/web default: 4 Y + Cb + Cr per 16x16 MCU,
    2x2-mean chroma) and 4:2:2 (broadcast convention: 2 Y + Cb + Cr per
    16x8 MCU, horizontal-only halving): the decoder's general MCU walk
    + per-axis nearest-neighbor chroma upsample recovers exact dims
    within the measured bounds (4:2:2 worst 28, 4:2:0 worst 38 — chroma
    detail legitimately drops; a broken MCU order or predictor
    sequencing blows up to full-range garbage). Flat color is exact
    even subsampled (constant chroma)."""
    import numpy as np

    from etl_pipeline_for_retail_sales_data_spark.operators import jpeg as J

    for sub, bound in (("422", 32), ("420", 44)):
        for w, h in [(16, 16), (29, 19), (33, 17), (9, 9), (64, 48)]:
            rgb = _grad(w, h)
            p = J.encode_jpeg(rgb, subsampling=sub)
            dw, dh, out = J.decode_jpeg_pixels(p)
            assert (dw, dh) == (w, h), (sub, w, h)
            assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= bound

        flat = np.full((24, 16, 3), 120, dtype=np.uint8)
        _, _, out = J.decode_jpeg_pixels(J.encode_jpeg(flat, subsampling=sub))
        assert int(np.abs(out.astype(int) - 120).max()) == 0
    with pytest.raises(ValueError, match="subsampling"):
        J.encode_jpeg(_grad(8, 8), subsampling="411")


def test_jpeg_byte_stuffing_exercised_and_rejections():
    """At least one encoded payload must contain a stuffed 0xFF 0x00 in
    its entropy segment (else the stuffing path is dead code), and the
    decoder rejects non-JPEG, truncated, and progressive streams with
    typed errors."""
    import numpy as np

    from etl_pipeline_for_retail_sales_data_spark.operators import jpeg as J

    stuffed = False
    for i in range(40):
        w, h = i % 25 + 8, (i * 3) % 17 + 8
        payload = J.encode_jpeg(_grad(w, h))
        scan = payload[payload.index(b"\xff\xda") : -2]
        if b"\xff\x00" in scan:
            stuffed = True
            break
    assert stuffed

    with pytest.raises(ValueError, match="no SOI"):
        J.decode_jpeg_pixels(b"\x89PNG\r\n\x1a\n")
    good = J.encode_jpeg(_grad(16, 16))
    with pytest.raises(ValueError):
        J.decode_jpeg_pixels(good[:100])  # truncated mid-tables
    # flip SOF0 -> SOF2 (progressive): typed scoping error, not garbage
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        J.decode_jpeg_pixels(prog)
    # stdlib_decoder sniffs JPEG by SOI magic now
    assert MM.stdlib_decoder(good) == (16, 16, 1)
    assert MM.default_decoder(good) == (16, 16, 1)


def test_jpeg_decoder_reads_tables_from_stream():
    """The decoder must honor the DHT/DQT carried by the stream, not
    assume the encoder's constants: doubling the luma quant table in
    the stream (and fixing nothing else) changes reconstruction in a
    way consistent with coarser quantization — decode still succeeds
    because the table rides the DQT segment."""
    import numpy as np

    from etl_pipeline_for_retail_sales_data_spark.operators import jpeg as J

    rgb = _grad(32, 32)
    payload = J.encode_jpeg(rgb)
    _, _, base = J.decode_jpeg_pixels(payload)
    # locate DQT body: marker FFDB, length, then table 0 in zigzag order
    i = payload.index(b"\xff\xdb")
    body_at = i + 5  # skip marker(2) + length(2) + Pq/Tq(1)
    doubled = bytearray(payload)
    for k in range(64):
        doubled[body_at + k] = min(255, doubled[body_at + k] * 2)
    _, _, coarse = J.decode_jpeg_pixels(bytes(doubled))
    # same shape, different (coarser) values: the stream table was used
    assert coarse.shape == base.shape
    assert int(np.abs(coarse.astype(int) - base.astype(int)).max()) > 0


def test_mp4_container_roundtrip_and_rejections():
    """ISO-BMFF skeleton: box framing, 16.16 track geometry, and the
    stts frame count survive the recursive parse; malformed inputs get
    typed rejections."""
    for w, h, n in [(640, 480, 300), (1920, 1080, 1), (16, 16, 7)]:
        p = MM.encode_mp4_skeleton(w, h, n)
        assert p[4:8] == b"ftyp"
        assert MM.parse_mp4(p) == (w, h, n)
        assert MM.stdlib_decoder(p) == (w, h, n)  # sniffed by ftyp
    with pytest.raises(ValueError, match="no ftyp"):
        MM.parse_mp4(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError, match="malformed MP4 box"):
        MM.parse_mp4(MM.encode_mp4_skeleton(8, 8, 2)[:60])
    # a container with no video track (ftyp only + empty moov)
    ftyp = MM._box(b"ftyp", b"isom\x00\x00\x02\x00isom")
    with pytest.raises(ValueError, match="no video track"):
        MM.parse_mp4(ftyp + MM._box(b"moov", b""))


def test_image_phash_separability_on_spark(spark, sf_smoke):
    """The pHash-over-decoded-PNG pipeline: every doc's perturbed twin
    classifies near-dup and every neighbor image classifies separated —
    and the plan is shuffle-free (per-row regeneration, no join)."""
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents")
    rep = MM.image_phash_report(docs)
    txt = rep._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in txt, txt
    rows = rep.collect()
    assert len(rows) == docs.count()
    assert all(r.self_near_dup and r.cross_separated for r in rows)


def test_image_phash_candidates_exact_pairs_and_plan(spark, sf_smoke):
    """The full image-dedup pipeline (decoded-pixel pHash → banding →
    Hamming verify) returns EXACTLY the within-group pair set — recall
    1 because brightness-only in-group deltas leave the 63 AC bits
    untouched — and the plan's only join is the band equi-join (no
    cartesian)."""
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents")
    got = {
        (r.id_a, r.id_b) for r in MM.image_phash_candidates(docs).collect()
    }
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    expected = {
        (a, b)
        for a in ids
        for b in ids
        if a < b and a // 4 == b // 4
    }
    assert got == expected and len(expected) > 0
    txt = MM.image_phash_candidates(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in txt and "BroadcastNestedLoopJoin" not in txt


def test_spark_encode_decode_real_end_to_end(spark, sf_smoke):
    """The registry query's path: executors build real BMP/WAV bytes and
    the decode pass parses them back; geometry must match the id-derived
    formulas for every row."""
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(40)
    out = MM.decode_media(MM.attach_real_media(docs), MM.stdlib_decoder).collect()
    assert len(out) == 40
    for r in out:
        i = r.doc_id
        if i % 2 == 0:
            assert (r.media_type, r.width, r.height, r.n_frames) == (
                "image/bmp", i % 31 + 1, (i * 7) % 23 + 1, 1,
            )
        else:
            assert (r.media_type, r.width, r.height, r.n_frames) == (
                "audio/wav", 1, 8000, i % 500 + 1,
            )


# ---------------------------------------------------------------------------
# H.264 I_PCM subset (operators/h264.py) + MP4 coded-sample containers
# ---------------------------------------------------------------------------


def _pcm_frames(n, w, h, seed, zeros=False):
    import numpy as np

    rng = np.random.default_rng(seed)
    lo = 0 if zeros else 1
    frames = []
    for _ in range(n):
        y = rng.integers(lo, 256, (h, w), dtype=np.uint8)
        if zeros:
            y[: min(3, h), :] = 0  # long zero runs -> emulation prevention
        cb = rng.integers(lo, 256, (h // 2, w // 2), dtype=np.uint8)
        cr = rng.integers(lo, 256, (h // 2, w // 2), dtype=np.uint8)
        frames.append((y, cb, cr))
    return frames


def test_expgolomb_roundtrip_edges():
    """ue/se codes across edge values, incl. the 0 -> single '1' bit
    form and multi-word values, survive a write->read cycle."""
    from etl_pipeline_for_retail_sales_data_spark.operators.h264 import (
        _BitReader,
        _BitWriter,
    )

    ue_vals = [0, 1, 2, 3, 7, 8, 255, 256, 12345, 2**20]
    se_vals = [0, 1, -1, 2, -2, 63, -64, 1000, -1000]
    w = _BitWriter()
    for v in ue_vals:
        w.ue(v)
    for v in se_vals:
        w.se(v)
    w.rbsp_trailing()
    r = _BitReader(w.getvalue())
    assert [r.ue() for _ in ue_vals] == ue_vals
    assert [r.se() for _ in se_vals] == se_vals


def test_emulation_prevention_property():
    """EBSP never contains 00 00 00/01/02 patterns and de-escaping is
    the exact inverse — the property a byte-stream parser relies on."""
    import numpy as np

    from etl_pipeline_for_retail_sales_data_spark.operators import h264

    rng = np.random.default_rng(11)
    for _ in range(300):
        rbsp = bytes(rng.integers(0, 4, int(rng.integers(1, 50))).astype(np.uint8))
        ebsp = h264.rbsp_to_ebsp(rbsp)
        assert h264.ebsp_to_rbsp(ebsp) == rbsp
        for i in range(len(ebsp) - 2):
            assert not (ebsp[i] == 0 and ebsp[i + 1] == 0 and ebsp[i + 2] < 3)


def test_h264_annexb_roundtrip_both_profiles():
    """Byte-exact plane recovery through the full Annex-B stream, and
    the decoder reports the profile the SPS itself carried."""
    import numpy as np

    from etl_pipeline_for_retail_sales_data_spark.operators import h264

    for profile, zeros in [(66, False), (100, True)]:
        frames = _pcm_frames(3, 48, 32, seed=profile, zeros=zeros)
        stream = h264.encode_h264(frames, profile)
        w, h, prof, dec = h264.decode_h264(stream)
        assert (w, h, prof, len(dec)) == (48, 32, profile, 3)
        for (a, b, c), (x, y, z) in zip(frames, dec):
            assert (
                np.array_equal(a, x)
                and np.array_equal(b, y)
                and np.array_equal(c, z)
            )


def test_h264_three_byte_start_codes_accepted():
    """B.1.1 allows 3-byte start codes; a foreign muxer may emit them.
    Rewrap the encoder's NALs with 00 00 01 and decode."""
    import numpy as np

    from etl_pipeline_for_retail_sales_data_spark.operators import h264

    frames = _pcm_frames(2, 32, 16, seed=5)
    nals = h264.split_annexb(h264.encode_h264(frames, 66))
    stream = b"".join(b"\x00\x00\x01" + n for n in nals)
    w, h, prof, dec = h264.decode_h264(stream)
    assert (w, h, len(dec)) == (32, 16, 2)
    assert np.array_equal(dec[1][0], frames[1][0])


def test_h264_baseline_rejects_zero_pcm_samples():
    """H.264 7.4.5: PCM sample value 0 is forbidden under Baseline —
    the encoder must refuse rather than emit a non-conforming stream."""
    from etl_pipeline_for_retail_sales_data_spark.operators import h264

    frames = _pcm_frames(1, 16, 16, seed=1, zeros=True)
    with pytest.raises(ValueError, match="forbidden under Baseline"):
        h264.encode_h264(frames, 66)


def test_h264_decoder_typed_rejections():
    """Out-of-subset constructs get NAMED errors: CABAC entropy mode,
    non-I slices, non-I_PCM macroblocks, geometry violations,
    truncation."""
    from etl_pipeline_for_retail_sales_data_spark.operators import h264

    frames = _pcm_frames(1, 16, 16, seed=2)
    good = h264.encode_h264(frames, 66)

    # CABAC PPS: entropy_coding_mode_flag=1
    w = h264._BitWriter()
    w.ue(0); w.ue(0); w.u(1, 1)
    w.rbsp_trailing()
    cabac_pps = b"\x00\x00\x00\x01" + h264.nal_unit(h264.NAL_PPS, 3, w.getvalue())
    with pytest.raises(ValueError, match="CABAC"):
        h264.decode_h264(good[: good.index(b"\x00\x00\x00\x01", 4)] + cabac_pps)

    # P-slice header (slice_type=0) under an IDR NAL
    w = h264._BitWriter()
    w.ue(0); w.ue(0)  # first_mb_in_slice, slice_type=P
    w.rbsp_trailing()
    pslice = b"\x00\x00\x00\x01" + h264.nal_unit(h264.NAL_SLICE_IDR, 3, w.getvalue())
    sps_pps = good[: good.index(bytes([0x65]), 4) - 4]  # up to first slice NAL
    with pytest.raises(ValueError, match="only I slices"):
        h264.decode_h264(sps_pps + pslice)

    # non-I_PCM macroblock: patch the first mb_type symbol region by
    # rebuilding a slice whose first symbol after the header is ue(0)
    w = h264._BitWriter()
    w.ue(0); w.ue(7); w.ue(0); w.u(4, 0); w.ue(0); w.u(1, 0); w.u(1, 0); w.se(0)
    w.ue(0)  # mb_type I_4x4 -> unsupported
    w.rbsp_trailing()
    intra = b"\x00\x00\x00\x01" + h264.nal_unit(h264.NAL_SLICE_IDR, 3, w.getvalue())
    with pytest.raises(ValueError, match="only I_PCM macroblocks"):
        h264.decode_h264(sps_pps + intra)

    # truncated PCM payload
    with pytest.raises(ValueError, match="truncated RBSP"):
        h264.decode_h264(good[:-40])

    # geometry must be MB-aligned
    bad = _pcm_frames(1, 16, 16, seed=3)
    y, cb, cr = bad[0]
    with pytest.raises(ValueError, match="multiples of 16"):
        h264.encode_h264([(y[:15, :], cb, cr)], 66)

    # no start codes at all
    with pytest.raises(ValueError, match="no start codes"):
        h264.decode_h264(b"\xff" * 20)


def test_mp4_h264_container_roundtrip_and_skeleton_rejection():
    """The full container path: avcC config, real stsz/stco sample
    tables, AVCC length prefixes — decode recovers every plane
    byte-exactly and cross-checks SPS geometry against tkhd; the
    manifest-only skeleton is rejected with a typed error, and
    parse_mp4 (the manifest surface) still reads the coded container."""
    import numpy as np

    frames = _pcm_frames(4, 64, 48, seed=9, zeros=True)
    p = MM.encode_mp4_h264(frames, profile_idc=100)
    assert MM.parse_mp4(p) == (64, 48, 4)
    w, h, prof, dec = MM.decode_mp4_frames(p)
    assert (w, h, prof, len(dec)) == (64, 48, 100, 4)
    for (a, b, c), (x, y, z) in zip(frames, dec):
        assert (
            np.array_equal(a, x) and np.array_equal(b, y) and np.array_equal(c, z)
        )
    with pytest.raises(ValueError, match="no avcC"):
        MM.decode_mp4_frames(MM.encode_mp4_skeleton(64, 48, 4))
    # truncation breaks box framing first — still a typed rejection
    with pytest.raises(ValueError, match="malformed MP4 box"):
        MM.decode_mp4_frames(p[:-200])
    # a lying chunk offset is caught by the sample-table bounds math
    i = p.index(b"stco")
    lying = p[: i + 12] + struct.pack(">I", len(p)) + p[i + 16 :]
    with pytest.raises(ValueError, match="past the end"):
        MM.decode_mp4_frames(lying)


def test_h264_spark_roundtrip_report(spark, sf_smoke):
    """The registry query's path on executors: every row must report
    byte-exact pixel recovery with the id-derived geometry/profile."""
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(24)
    out = MM.h264_roundtrip_report(docs).collect()
    assert len(out) == 24
    for r in out:
        i = r.doc_id
        assert r.pixels_match, f"doc {i} failed pixel roundtrip"
        assert r.width == (i % 4 + 1) * 16
        assert r.height == ((i // 4) % 3 + 1) * 16
        assert r.n_frames == i % 3 + 1
        assert r.profile_idc == (66 if i % 2 == 0 else 100)
        assert r.n_pixel_bytes == r.n_frames * r.width * r.height * 3 // 2


def test_h264_foreign_poc_type0_stream_decodes():
    """A conforming I_PCM stream from a FOREIGN encoder may use
    pic_order_cnt_type 0 (the common choice) and non-IDR I slices; the
    decoder must honor the SPS-declared POC fields in the slice header
    rather than assume its own encoder's type-2 shape."""
    import numpy as np

    from etl_pipeline_for_retail_sales_data_spark.operators import h264

    # SPS: baseline, poc_type 0 with log2_max_poc_lsb = 4
    w = h264._BitWriter()
    w.u(8, 66); w.u(8, 0); w.u(8, 40)
    w.ue(0)        # sps id
    w.ue(0)        # log2_max_frame_num_minus4
    w.ue(0)        # pic_order_cnt_type = 0
    w.ue(0)        # log2_max_pic_order_cnt_lsb_minus4
    w.ue(0)        # max_num_ref_frames
    w.u(1, 0)      # gaps allowed
    w.ue(0); w.ue(0)  # 1x1 macroblocks
    w.u(1, 1); w.u(1, 1); w.u(1, 0); w.u(1, 0)
    w.rbsp_trailing()
    sps = h264._nal(h264.NAL_SPS, 3, w.getvalue())
    pps = h264._nal(h264.NAL_PPS, 3, h264.encode_pps())

    y = np.full((16, 16), 7, dtype=np.uint8)
    cb = np.full((8, 8), 9, dtype=np.uint8)
    cr = np.full((8, 8), 11, dtype=np.uint8)
    w = h264._BitWriter()
    w.ue(0)        # first_mb_in_slice
    w.ue(7)        # slice_type I
    w.ue(0)        # pps id
    w.u(4, 1)      # frame_num
    w.u(4, 2)      # pic_order_cnt_lsb (poc_type 0!)
    # non-IDR, ref_idc=0 -> NO dec_ref_pic_marking
    w.se(0)        # slice_qp_delta
    w.ue(25)       # I_PCM
    w.align_zero()
    w.write_bytes(y.tobytes()); w.write_bytes(cb.tobytes()); w.write_bytes(cr.tobytes())
    w.rbsp_trailing()
    slice_nal = h264._nal(h264.NAL_SLICE_NON_IDR, 0, w.getvalue())

    width, height, prof, frames = h264.decode_h264(sps + pps + slice_nal)
    assert (width, height, prof, len(frames)) == (16, 16, 66, 1)
    assert np.array_equal(frames[0][0], y)
    assert np.array_equal(frames[0][2], cr)


def test_h264_property_random_frames_roundtrip():
    """Property: ANY uint8 4:2:0 content at any MB-aligned geometry
    survives encode->decode byte-exactly under both profiles (zeros
    included under High — the emulation-prevention stressor), through
    both the Annex-B stream and the full MP4 container."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import numpy as np

    from etl_pipeline_for_retail_sales_data_spark.operators import h264

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        st.integers(1, 4),   # width in MBs
        st.integers(1, 3),   # height in MBs
        st.integers(1, 3),   # frames
        st.integers(0, 2**31 - 1),  # content seed
        st.sampled_from([66, 100]),
    )
    def check(wmb, hmb, nf, seed, profile):
        rng = np.random.default_rng(seed)
        lo = 1 if profile == 66 else 0
        w, h = wmb * 16, hmb * 16
        frames = []
        for _ in range(nf):
            y = rng.integers(lo, 256, (h, w), dtype=np.uint8)
            cb = rng.integers(lo, 256, (h // 2, w // 2), dtype=np.uint8)
            cr = rng.integers(lo, 256, (h // 2, w // 2), dtype=np.uint8)
            if profile == 100 and rng.integers(0, 2):
                y[: h // 2, :] = 0  # long zero runs
            frames.append((y, cb, cr))
        dw, dh, prof, dec = h264.decode_h264(h264.encode_h264(frames, profile))
        assert (dw, dh, prof, len(dec)) == (w, h, profile, nf)
        for (a, b, c), (x, yy, z) in zip(frames, dec):
            assert (
                np.array_equal(a, x)
                and np.array_equal(b, yy)
                and np.array_equal(c, z)
            )
        mw, mh, mprof, mdec = MM.decode_mp4_frames(
            MM.encode_mp4_h264(frames, profile_idc=profile)
        )
        assert (mw, mh, mprof, len(mdec)) == (w, h, profile, nf)
        assert all(np.array_equal(a[0], x[0]) for a, x in zip(frames, mdec))

    check()
