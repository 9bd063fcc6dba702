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
    with pytest.raises(ValueError, match="unrecognized"):
        MM.stdlib_decoder(b"\x89PNG\r\n\x1a\n")


def test_default_decoder_real_for_bmp_wav_stub_beyond():
    assert MM.default_decoder(MM.encode_bmp(3, 3)) == (3, 3, 1)
    with pytest.raises(NotImplementedError):
        MM.default_decoder(b"\x89PNG\r\n\x1a\n")


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
