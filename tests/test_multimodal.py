"""Multimodal plumbing: schema contract, Arrow batch shape, real
decode determinism, frame sampling, stride downsampling."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMALL
from threat_detection_nosql_spark.operators import multimodal
from threat_detection_nosql_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(60)
    return multimodal.synth_media(docs).cache()


def test_media_schema(media):
    assert dict(media.dtypes) == {
        "doc_id": "bigint", "media_kind": "string", "blob": "binary"}
    kinds = {r.media_kind for r in media.select("media_kind").collect()}
    assert kinds == {"bmp", "ppm", "wav"}


def test_value_histogram_contract(media):
    hist = multimodal.media_value_histogram(media, bucket=32)
    rows = hist.collect()
    assert {r.doc_id for r in rows} == {r.doc_id for r in media.collect()}
    # per-doc counts must total the decoded payload size exactly
    by_doc: dict[int, int] = {}
    kind_of: dict[int, str] = {}
    for r in rows:
        by_doc[r.doc_id] = by_doc.get(r.doc_id, 0) + r.n_values
        kind_of[r.doc_id] = r.media_kind
    for m in media.collect():
        expect = (len(multimodal.decode_wav(bytes(m.blob))[0])
                  if m.media_kind == "wav" else
                  multimodal.decode_media(bytes(m.blob), m.media_kind).size)
        assert by_doc[m.doc_id] == expect
        assert kind_of[m.doc_id] == m.media_kind


def test_value_histogram_deterministic(media):
    a = sorted(multimodal.media_value_histogram(media).collect())
    b = sorted(multimodal.media_value_histogram(media).collect())
    assert a == b


def test_frame_sample_stride_and_stats(media):
    frames = multimodal.frame_sample(media, frame_len=16, every_n=4)
    rows = frames.collect()
    assert rows and all(r.frame_idx % 4 == 0 for r in rows)
    # spot-check one wav doc against a driver-side decode
    wav = next(m for m in media.collect() if m.media_kind == "wav")
    samples, _ = multimodal.decode_wav(bytes(wav.blob))
    s = samples.astype(np.int64)
    got = sorted((r for r in rows if r.doc_id == wav.doc_id),
                 key=lambda r: r.frame_idx)
    n_frames = (len(s) + 15) // 16
    assert [r.frame_idx for r in got] == list(range(0, n_frames, 4))
    for r in got:
        fr = s[r.frame_idx * 16:(r.frame_idx + 1) * 16]
        assert (r.n_samples, r.sample_sum, r.frame_peak) == (
            len(fr), int(fr.sum()), int(fr.max()))


def test_downsample_image_stats(media):
    small = multimodal.downsample_image_stats(media, stride=2)
    rows = {r.doc_id: r for r in small.collect()}
    imgs = [m for m in media.collect() if m.media_kind in ("bmp", "ppm")]
    assert set(rows) == {m.doc_id for m in imgs}
    for m in imgs[:10]:
        img = multimodal.decode_media(bytes(m.blob), m.media_kind)
        dec = img[::2, ::2].astype(np.int64)
        r = rows[m.doc_id]
        assert (r.out_h, r.out_w) == dec.shape[:2]
        assert [r.sum_c0, r.sum_c1, r.sum_c2] == [
            int(dec[:, :, k].sum()) for k in range(3)]


def test_decode_media_dispatch_and_codec_refusal():
    """Round 8 replaced the NotImplementedError stub with real
    lib-free codecs: decode_media dispatches bmp/ppm/wav/gif/png to
    byte-level parsers, round 11 added baseline JPEG (gray + 4:4:4
    color, tests/test_jpeg.py); only video formats still refuse."""
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    assert (multimodal.decode_media(
        multimodal.encode_bmp(img), "bmp") == img).all()
    assert (multimodal.decode_media(
        multimodal.encode_png(img), "png") == img).all()
    assert multimodal.decode_media(
        multimodal._synth_jpeg_blob(5), "jpeg").shape == (16, 32)
    with pytest.raises(ValueError, match="no lib-free decoder"):
        multimodal.decode_media(b"\x00\x00\x00\x18ftyp", "mp4")


def test_avi_mjpeg_roundtrip_and_alignment():
    """RIFF walk + per-frame JPEG decode: every frame bit-equal to
    the still decoder; planted corpus includes odd-length frame
    chunks so the word-alignment padding path runs."""
    from threat_detection_nosql_spark.operators import multimodal as M
    import numpy as np
    saw_odd = False
    for doc in range(8):
        stack = M.decode_avi_mjpeg(M._synth_avi_blob(doc))
        n, h, w = stack.shape
        assert (n, h, w) == (2 + doc % 4, 16, 8 * (2 + doc % 3))
        for f in range(n):
            frame = M.encode_jpeg_gray(w, 16,
                                       M._avi_planted_blocks(doc, f))
            saw_odd = saw_odd or len(frame) % 2 == 1
            assert (stack[f] == M.decode_jpeg_gray(frame)).all()
    assert saw_odd  # alignment padding was actually exercised


def test_avi_error_paths():
    from threat_detection_nosql_spark.operators import multimodal as M
    import pytest
    with pytest.raises(ValueError, match="RIFF"):
        M.decode_avi_mjpeg(b"nope" * 8)
    blob = bytearray(M._synth_avi_blob(1))
    i = bytes(blob).find(b"MJPG")
    blob[i:i + 4] = b"cvid"
    with pytest.raises(ValueError, match="handler"):
        M.decode_avi_mjpeg(bytes(blob))
    # decode_media dispatches avi and the stack shape is (n, h, w)
    stack = M.decode_media(M._synth_avi_blob(5), "avi")
    assert stack.ndim == 3 and stack.shape[1] == 16


def test_tiff_roundtrip_matrix():
    """TIFF: PackBits + uncompressed, II + MM byte order, 1-4 rows
    per strip — every combination decodes to the closed-form
    lattice."""
    from threat_detection_nosql_spark.operators import multimodal as M
    import numpy as np
    for doc in range(18):
        w, h, base = 8 + doc % 9, 6, doc % 151
        r, c = np.ogrid[0:h, 0:w]
        want = ((base + 3 * r + 5 * (c // 4) + (7 * r + c) % 3)
                % 251).astype(np.uint8)
        assert np.array_equal(
            M.decode_tiff_gray(M._synth_tiff_blob(doc)), want), doc
    # explicit matrix beyond the planted corpus
    img = (np.arange(7 * 11).reshape(7, 11) % 200).astype(np.uint8)
    for comp in ("packbits", "none"):
        for be in (False, True):
            for rps in (1, 3, 7, 100):
                blob = M.encode_tiff_gray(img, compression=comp,
                                          rows_per_strip=rps,
                                          big_endian=be)
                assert np.array_equal(M.decode_tiff_gray(blob), img)
    assert M.decode_media(M._synth_tiff_blob(4), "tiff").shape == (6, 12)


def test_tiff_error_paths():
    from threat_detection_nosql_spark.operators import multimodal as M
    import pytest
    with pytest.raises(ValueError, match="II/MM"):
        M.decode_tiff_gray(b"PK\x03\x04" * 4)
    # PackBits length mismatch is detected, not silently padded
    with pytest.raises(ValueError, match="length"):
        M._packbits_decode(b"\x00\xaa", 5)


def test_tiff_lzw_paths():
    """TIFF LZW (Compression 5): MSB-first codes, early change at
    510/1022/2046, early clear at 4094 — round-trips across width
    boundaries, table resets, and KwKwK chains; corpus now cycles
    packbits/none/lzw per doc with the same closed-form pixels."""
    import random
    import numpy as np
    from threat_detection_nosql_spark.operators import multimodal as M
    rng = random.Random(3)
    for n in (40, 500, 3000, 20000, 60000):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert M._tiff_lzw_decode(M._tiff_lzw_encode(data), n) == data
        run = bytes([7]) * n
        assert M._tiff_lzw_decode(M._tiff_lzw_encode(run), n) == run
    img = (np.arange(64 * 200).reshape(64, 200) * 7 % 251
           ).astype(np.uint8)
    blob = M.encode_tiff_gray(img, compression="lzw",
                              rows_per_strip=16)
    assert np.array_equal(M.decode_tiff_gray(blob), img)
    for doc in (2, 5, 8):   # lzw docs in the planted corpus
        assert doc % 3 == 2
        M.decode_tiff_gray(M._synth_tiff_blob(doc))


def test_sniff_media_kind_every_format():
    """Magic-byte sniffing identifies and decode_media_auto decodes
    every planted format without a kind label — including the
    RIFF disambiguation (WAV vs AVI) and TIFF's two byte orders."""
    import numpy as np
    import pytest
    from threat_detection_nosql_spark.operators import multimodal as M
    cases = [
        ("bmp", M._synth_blob(0)[1]),
        ("ppm", M._synth_blob(1)[1]),
        ("wav", M._synth_blob(2)[1]),
        ("gif", M._synth_gif_blob(3)),
        ("png", M._synth_png_blob(4)),
        ("jpeg", M._synth_jpeg_blob(5)),
        ("jpeg", M._synth_jpeg_progressive_blob(6)),
        ("tiff", M._synth_tiff_blob(7)),   # MM (doc 7 % 2 != 0 -> II)
        ("tiff", M._synth_tiff_blob(8)),
        ("avi", M._synth_avi_blob(9)),
    ]
    for want, blob in cases:
        assert M.sniff_media_kind(blob) == want
        out = M.decode_media_auto(blob)
        assert isinstance(out, (np.ndarray, tuple))
    with pytest.raises(ValueError, match="unrecognized"):
        M.sniff_media_kind(b"\x00\x01\x02\x03\x04\x05\x06\x07")
