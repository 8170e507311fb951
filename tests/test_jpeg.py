"""Baseline JPEG codec (operators/multimodal.py, round 11): marker
walk, canonical huffman, entropy coding, DC prediction, IDCT.

The registry oracle (queries/pipeline.jpeg_decode_stats) pins the
end-to-end sums; these tests pin the pieces independently — the
canonical-code builder against T.81's own Annex K table, byte
stuffing, marker tolerance, and the decoder's declared capability
boundary."""
from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from threat_detection_nosql_spark.operators import multimodal as M

# T.81 Annex K.3.1: luminance DC table — BITS and HUFFVAL straight
# from the spec (public document), used ONLY as an independent check
# of the canonical-code builder.
_K_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_K_DC_SYMS = list(range(12))


def test_canonical_codes_match_annex_k():
    """T.81 Annex C applied to the Annex K luminance DC table yields
    the well-known codes: cat 0 = '00' (2 bits), cat 1 = '010',
    cat 2 = '011', ..., cat 11 = 9 bits of 111111110."""
    codes = M.jpeg_canonical_codes(_K_DC_BITS, _K_DC_SYMS)
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[2] == (0b011, 3)
    assert codes[3] == (0b100, 3)
    assert codes[4] == (0b101, 3)
    assert codes[5] == (0b110, 3)
    assert codes[6] == (0b1110, 4)
    assert codes[7] == (0b11110, 5)
    assert codes[8] == (0b111110, 6)
    assert codes[9] == (0b1111110, 7)
    assert codes[10] == (0b11111110, 8)
    assert codes[11] == (0b111111110, 9)


def test_zigzag_is_the_standard_scan():
    zz = M.JPEG_ZIGZAG
    assert zz[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
    assert zz[63] == (7, 7)
    assert sorted(zz) == [(u, v) for u in range(8) for v in range(8)]


def test_roundtrip_matches_closed_form_across_docs():
    """decoder(encoder(lattice)) must equal the oracle's arithmetic
    EXACTLY (same basis doubles, same op order) — zero tolerance."""
    B0 = M.jpeg_basis(0, 0)
    B1 = M.jpeg_basis(0, 1)
    B3 = M.jpeg_basis(2, 0)
    for doc_id in (0, 1, 2, 7, 19, 100, 255, 499):
        w, h, blocks = M._jpeg_planted_blocks(doc_id)
        img = M.decode_jpeg_gray(M._synth_jpeg_blob(doc_id))
        assert img.shape == (h, w)
        for (br, bc), coefs in blocks.items():
            for y in range(8):
                for x in range(8):
                    v = 128.0
                    v = v + (coefs[0] * 16) * B0[y][x]
                    v = v + (coefs[1] * 11) * B1[y][x]
                    v = v + (coefs[3] * 14) * B3[y][x]
                    assert img[br * 8 + y, bc * 8 + x] == int(
                        math.floor(v + 0.5)), (doc_id, br, bc, y, x)


def test_dc_prediction_and_eob_paths():
    """A 3-block image: DC 5 → 0 → 5 exercises positive, negative and
    zero DC differences (category-0 code) and immediate EOB. DC-only
    blocks decode to constants 128 + dc·16/8."""
    blocks = {(0, 0): {0: 5}, (0, 1): {}, (0, 2): {0: 5}}
    img = M.decode_jpeg_gray(M.encode_jpeg_gray(24, 8, blocks))
    assert img.shape == (8, 24)
    assert (img[:, :8] == 138).all()
    assert (img[:, 8:16] == 128).all()   # empty block = dc 0
    assert (img[:, 16:] == 138).all()


def test_byte_stuffing_roundtrip():
    """0xFF bytes in the entropy segment must be stuffed with 0x00 on
    encode and unstuffed on decode — pinned at the bit layer and end
    to end."""
    bw = M._BitWriter()
    bw.put(0xFF, 8)
    bw.flush()
    assert bytes(bw.out) == b"\xff\x00"
    br = M._BitReader(b"\xff\x00", 0)
    assert br.bits(8) == 0xFF

    # end to end: DC diffs +31 (cat 5, bits 11111) / -31 (bits 00000)
    # across 8 blocks line up runs of 1-bits that cross byte edges
    blocks = {(0, c): {0: 31 if c % 2 == 0 else 0} for c in range(8)}
    blob = M.encode_jpeg_gray(64, 8, blocks)
    img = M.decode_jpeg_gray(blob)
    for c in range(8):
        want = 128 + (62 if c % 2 == 0 else 0)
        assert (img[:, c * 8:(c + 1) * 8] == want).all(), c


def test_marker_tolerance_app0_and_com():
    """A JFIF APP0 and a COM segment inserted after SOI must be
    skipped — real-world JPEGs always carry them."""
    blob = M._synth_jpeg_blob(3)
    app0 = (b"\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    patched = blob[:2] + app0 + com + blob[2:]
    assert (M.decode_jpeg_gray(patched)
            == M.decode_jpeg_gray(blob)).all()


def test_progressive_and_color_raise():
    blob = bytearray(M._synth_jpeg_blob(1))
    sof = bytes(blob).find(b"\xff\xc0")
    blob[sof + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError):
        M.decode_jpeg_gray(bytes(blob))
    with pytest.raises(ValueError):
        M.decode_media(b"\x00\x00", "mp4")


def test_decode_media_dispatches_jpeg():
    img = M.decode_media(M._synth_jpeg_blob(11), "jpeg")
    assert isinstance(img, np.ndarray) and img.shape[0] == 16


def test_spark_jpeg_stats_pipeline(spark):
    """The two-stage mapInPandas shape over real Arrow binary columns
    (plant → decode) on a small planted frame."""
    docs = spark.range(12).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r for r in
           M.jpeg_decode_stats(M.synth_jpeg_media(docs)).collect()}
    assert len(out) == 12
    for doc_id, r in out.items():
        w, h, blocks = M._jpeg_planted_blocks(doc_id)
        assert (r["width"], r["height"]) == (w, h)
        img = M.decode_jpeg_gray(M._synth_jpeg_blob(doc_id))
        assert r["sum_y"] == int(img.astype(np.int64).sum())


def test_color_roundtrip_matches_closed_form():
    """4:4:4 color: interleaved MCU decode + integer-plane YCbCr→RGB
    must equal the oracle arithmetic exactly (shared basis/JFIF
    doubles, shared op order) — zero tolerance."""
    B0, B1, B3 = M.jpeg_basis(0, 0), M.jpeg_basis(0, 1), M.jpeg_basis(2, 0)
    qs = [(16, 11, 14), (17, 18, 24), (17, 18, 24)]
    for doc_id in (0, 4, 10, 57, 111, 220):
        w, h, blocks3 = M._jpeg_color_planted_blocks(doc_id)
        img = M.decode_jpeg_color(M._synth_jpeg_color_blob(doc_id))
        assert img.shape == (h, w, 3)
        comp = np.zeros((3, h, w))
        for c in range(3):
            q0, q1, q3 = qs[c]
            for (br, bc), coefs in blocks3[c].items():
                for y in range(8):
                    for x in range(8):
                        v = 128.0
                        v = v + (coefs[0] * q0) * B0[y][x]
                        v = v + (coefs[1] * q1) * B1[y][x]
                        v = v + (coefs[3] * q3) * B3[y][x]
                        comp[c, br * 8 + y, bc * 8 + x] = min(
                            255, max(0, int(math.floor(v + 0.5))))
        y_, cb, cr = comp
        want = np.clip(np.floor(np.stack([
            y_ + M.JPEG_CR_R * (cr - 128.0),
            y_ - M.JPEG_CB_G * (cb - 128.0)
               - M.JPEG_CR_G * (cr - 128.0),
            y_ + M.JPEG_CB_B * (cb - 128.0)], axis=2) + 0.5),
            0, 255).astype(np.uint8)
        assert (img == want).all(), doc_id


def test_color_per_component_predictors_independent():
    """Y/Cb/Cr carry separate DC predictors: constant-DC blocks per
    component decode to the right per-plane constants."""
    blocks3 = [{(0, 0): {0: 8}, (0, 1): {0: 8}},
               {(0, 0): {0: -8}, (0, 1): {0: -8}},
               {(0, 0): {0: 0}, (0, 1): {0: 0}}]
    img = M.decode_jpeg_color(M.encode_jpeg_color(16, 8, blocks3))
    y, cb, cr = 128 + 16, 128 - 17, 128  # dc*Q[0]/8 per table
    want_r = int(math.floor(y + M.JPEG_CR_R * (cr - 128.0) + 0.5))
    want_b = int(math.floor(y + M.JPEG_CB_B * (cb - 128.0) + 0.5))
    assert (img[:, :, 0] == want_r).all()
    assert (img[:, :, 2] == want_b).all()


def test_420_subsampled_decode_and_upsampling():
    """4:2:0: four Y blocks + one Cb + one Cr per MCU, chroma
    replicated 2x2 — each 2x2 pixel quad shares its chroma sample, so
    B − Y (a pure Cb function) is constant within every quad."""
    for doc_id in (0, 1, 5):
        w, h, _ = M._jpeg_420_planted_blocks(doc_id)
        img = M.decode_jpeg_color(M._synth_jpeg_420_blob(doc_id))
        assert img.shape == (h, w, 3)
        b_minus = img[:, :, 2].astype(int)  # varies only via Y + Cb
        # reconstruct the chroma contribution: B - Y uses only Cb;
        # check quad-constancy of round(1.772*(Cb-128)) by comparing
        # the four quad corners' (B - Y) deltas
        y_, b_ = (img[:, :, i].astype(int) for i in (0, 2))
        # floor interplay makes B-Y differ by at most 1 within a quad
        for qy in range(0, h, 2):
            for qx in range(0, w, 2):
                d = (b_ - y_)[qy:qy + 2, qx:qx + 2]
                assert d.max() - d.min() <= 1, (doc_id, qy, qx)


def test_420_mcu_interleave_order():
    """A single 16x16 MCU with distinct DC per Y block: the decoded
    luma quadrants must land in raster order (Y00 Y01 Y10 Y11) — a
    swapped block order inside the MCU walk scrambles them."""
    y_blocks = {(0, 0): {0: 4}, (0, 1): {0: 8},
                (1, 0): {0: -4}, (1, 1): {0: -8}}
    blocks3 = [y_blocks, {(0, 0): {0: 0}}, {(0, 0): {0: 0}}]
    img = M.decode_jpeg_color(M.encode_jpeg_color(
        16, 16, blocks3, sampling=((2, 2), (1, 1), (1, 1))))
    g = img[:, :, 1]  # Cb=Cr=128 → G == Y exactly
    assert (g[:8, :8] == 128 + 8).all()
    assert (g[:8, 8:] == 128 + 16).all()
    assert (g[8:, :8] == 128 - 8).all()
    assert (g[8:, 8:] == 128 - 16).all()


def test_decode_jpeg_dispatches_by_component_count():
    assert M.decode_jpeg(M._synth_jpeg_blob(2)).ndim == 2
    assert M.decode_jpeg(M._synth_jpeg_color_blob(2)).ndim == 3


def test_restart_interval_roundtrip_all_intervals():
    """DRI/RSTn (r11 verdict ask #4): restart markers change the
    entropy bytes but never the pixels — every interval, including
    ri=1 (restart after every MCU), uneven tails, and mod-8 RST
    wraparound (wb=4 → 7 consecutive RSTs at ri=1), must decode
    bit-identical to the restart-free stream."""
    for doc_id in (0, 1, 2, 7, 11):
        w, h, blocks = M._jpeg_planted_blocks(doc_id)
        want = M.decode_jpeg_gray(M.encode_jpeg_gray(w, h, blocks))
        for ri in (1, 2, 3, 5, 100):
            blob = M.encode_jpeg_gray(w, h, blocks, restart_interval=ri)
            assert M._parse_jpeg_headers(blob)[7] == ri
            got = M.decode_jpeg_gray(blob)
            assert (got == want).all(), (doc_id, ri)


def test_restart_interval_color_and_420():
    for doc_id in (0, 3):
        w, h, b3 = M._jpeg_color_planted_blocks(doc_id)
        want = M.decode_jpeg_color(M.encode_jpeg_color(w, h, b3))
        got = M.decode_jpeg_color(
            M.encode_jpeg_color(w, h, b3, restart_interval=1))
        assert (got == want).all()
    w, h, b3 = M._jpeg_420_planted_blocks(1)  # 2 MCUs → 1 restart
    s = ((2, 2), (1, 1), (1, 1))
    want = M.decode_jpeg_color(M.encode_jpeg_color(w, h, b3, sampling=s))
    got = M.decode_jpeg_color(
        M.encode_jpeg_color(w, h, b3, sampling=s, restart_interval=1))
    assert (got == want).all()


def test_restart_predictor_reset_is_load_bearing():
    """A decoder that ignores the RST predictor reset reads the
    post-restart DC as a DIFFERENCE from the stale predictor — plant
    two blocks with distinct DCs and verify both decode right."""
    blocks = {(0, 0): {0: 9}, (0, 1): {0: 9}}  # same DC: diff would be 0
    blob = M.encode_jpeg_gray(16, 8, blocks, restart_interval=1)
    img = M.decode_jpeg_gray(blob)
    # both blocks carry DC=9 ABSOLUTE after the reset; without the
    # reset the second block would decode as 9 + 9 = 18 quant steps
    assert (img[:, :8] == img[:, 8:]).all()
    want = M.decode_jpeg_gray(M.encode_jpeg_gray(16, 8, blocks))
    assert (img == want).all()


def test_fill_bytes_and_standalone_markers_in_walk():
    """0xFF fill bytes before a marker and standalone TEM/RSTn markers
    before SOS are spec-legal (T.81 B.1.1) and must be skipped, not
    parsed as length-prefixed segments (r11 ADVICE)."""
    blob = M._synth_jpeg_blob(5)
    want = M.decode_jpeg_gray(blob)
    filled = blob[:2] + b"\xff\xff\xff" + blob[2:]
    assert (M.decode_jpeg_gray(filled) == want).all()
    tem = blob[:2] + b"\xff\x01" + blob[2:]
    assert (M.decode_jpeg_gray(tem) == want).all()
    rst_standalone = blob[:2] + b"\xff\xd3" + blob[2:]
    assert (M.decode_jpeg_gray(rst_standalone) == want).all()


def test_progressive_error_names_the_feature():
    blob = bytearray(M._synth_jpeg_blob(1))
    sof = bytes(blob).find(b"\xff\xc0")
    blob[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        M.decode_jpeg_gray(bytes(blob))
    blob[sof + 1] = 0xC9  # arithmetic sequential
    with pytest.raises(ValueError, match="non-baseline"):
        M.decode_jpeg_gray(bytes(blob))


def test_restart_out_of_sequence_raises():
    blob = bytearray(M.encode_jpeg_gray(
        *M._jpeg_planted_blocks(2)[:2],
        M._jpeg_planted_blocks(2)[2], restart_interval=1))
    # corrupt the first RST0 (0xFFD0) into RST5
    i = bytes(blob).find(b"\xff\xd0", 20)
    assert i > 0
    blob[i + 1] = 0xD5
    with pytest.raises(ValueError, match="restart marker"):
        M.decode_jpeg_gray(bytes(blob))


def test_sampled_digest_matches_bruteforce():
    """jpeg_sampled_digest's md5-position rule replayed in pure
    Python: r = int(md5(str(doc_id))[:6], 16) % 97, positions
    p % 97 == r over the flat raster — identical to the DuckDB
    derivation CAST('0x'||substr(md5(...),1,6) AS INT) % 97."""
    import hashlib
    for doc_id in (0, 5, 123):
        img = M.decode_jpeg_color(M._synth_jpeg_color_blob(doc_id))
        h, w, _ = img.shape
        r = int(hashlib.md5(
            str(doc_id).encode()).hexdigest()[:6], 16) % 97
        flat = img.reshape(-1, 3).astype(int)
        want = flat[[p for p in range(h * w) if p % 97 == r]]
        got = flat[np.arange(r, h * w, 97)]
        assert (got == want).all()
    import duckdb
    con = duckdb.connect()
    for doc_id in (0, 5, 123):
        sql_r = con.execute(
            "SELECT CAST(('0x' || substr(md5(CAST(? AS VARCHAR)), 1, 6))"
            " AS INT) % 97", [doc_id]).fetchone()[0]
        py_r = int(hashlib.md5(
            str(doc_id).encode()).hexdigest()[:6], 16) % 97
        assert sql_r == py_r


def test_sampled_digest_spark_kernel(spark):
    from threat_detection_nosql_spark.operators.multimodal import (
        jpeg_sampled_digest, synth_jpeg_color_media)
    import hashlib
    docs = spark.createDataFrame([(i,) for i in range(6)],
                                 "doc_id long")
    rows = {r["doc_id"]: r for r in
            jpeg_sampled_digest(synth_jpeg_color_media(docs)).collect()}
    for doc_id in range(6):
        img = M.decode_jpeg_color(
            M._synth_jpeg_color_blob(doc_id)).astype(int)
        h, w, _ = img.shape
        r = int(hashlib.md5(
            str(doc_id).encode()).hexdigest()[:6], 16) % 97
        sel = img.reshape(-1, 3)[np.arange(r, h * w, 97)]
        row = rows[doc_id]
        assert row["n_sampled"] == len(sel)
        assert (row["sum_r"], row["sum_g"], row["sum_b"]) == \
            tuple(int(sel[:, i].sum()) for i in range(3))


def test_progressive_matches_baseline_planted():
    """Progressive (SOF2) is a lossless reorganization: every planted
    doc decodes bit-identical to its baseline encoding, through the
    full scan script (DC first/refine, two AC bands first/refine)."""
    for doc in range(12):
        w, h, blocks = M._jpeg_planted_blocks(doc)
        base = M.decode_jpeg_gray(M.encode_jpeg_gray(w, h, blocks))
        prog = M.decode_jpeg_progressive(
            M.encode_jpeg_progressive(w, h, blocks))
        assert (base == prog).all(), doc
        # and decode_jpeg dispatches SOF2 automatically
        assert (M.decode_jpeg(
            M._synth_jpeg_progressive_blob(doc)) == base).all()


def test_progressive_randomized_parity():
    """Randomized coefficient lattices across Al in {1,2} and three
    spectral-band splits — exercises EOB-run accumulation/splitting,
    ZRL in first and refinement scans, woven correction bits, and
    band-boundary bookkeeping."""
    import random
    rng = random.Random(7)
    full = (M._JPEG_PROG_AC_BITS, M._JPEG_PROG_AC_SYMS)
    for _ in range(25):
        wb, hb = rng.randint(1, 5), rng.randint(1, 3)
        blocks = {}
        for br in range(hb):
            for bc in range(wb):
                coefs = {}
                if rng.random() < 0.85:
                    coefs[0] = rng.randint(-10, 10)
                for zz in rng.sample(range(1, 64), rng.randint(0, 6)):
                    coefs[zz] = rng.choice([-3, -2, -1, 1, 2, 3])
                blocks[(br, bc)] = coefs
        w, h = wb * 8, hb * 8
        base = M.decode_jpeg_gray(
            M.encode_jpeg_gray(w, h, blocks, ac_table=full))
        for al in (1, 2):
            for bands in (((1, 63),), ((1, 5), (6, 63)),
                          ((1, 2), (3, 20), (21, 63))):
                prog = M.decode_jpeg_progressive(M.encode_jpeg_progressive(
                    w, h, blocks, al=al, ac_bands=bands))
                assert (base == prog).all(), (al, bands)


def test_progressive_long_eob_runs():
    """A 160-block image with two lone coefficients: EOB runs exceed
    the 7-bit EOBn category and must split across multiple codes."""
    import numpy as np
    full = (M._JPEG_PROG_AC_BITS, M._JPEG_PROG_AC_SYMS)
    blocks = {(0, 0): {0: 5}, (3, 39): {9: 2}}
    base = M.decode_jpeg_gray(
        M.encode_jpeg_gray(320, 32, blocks, ac_table=full))
    prog = M.decode_jpeg_progressive(
        M.encode_jpeg_progressive(320, 32, blocks))
    assert np.array_equal(base, prog)


def test_progressive_color_matches_baseline():
    """Color progressive (interleaved DC scans + per-component AC
    scans) decodes bit-identical to the baseline color decoder for
    4:4:4 and 4:2:0 planted lattices."""
    for doc in (0, 1, 5):
        w, h, b3 = M._jpeg_color_planted_blocks(doc)
        base = M.decode_jpeg_color(M.encode_jpeg_color(w, h, b3))
        prog = M.decode_jpeg_progressive(
            M.encode_jpeg_progressive_color(w, h, b3))
        assert (base == prog).all(), ("444", doc)
        w, h, b3 = M._jpeg_420_planted_blocks(doc)
        s = ((2, 2), (1, 1), (1, 1))
        base = M.decode_jpeg_color(
            M.encode_jpeg_color(w, h, b3, sampling=s))
        prog = M.decode_jpeg_progressive(
            M.encode_jpeg_progressive_color(w, h, b3, sampling=s))
        assert (base == prog).all(), ("420", doc)


def test_progressive_color_randomized_parity():
    """Randomized coefficient grids across 4:4:4 / 4:2:0 / 4:2:2-ish
    samplings and Al in {1,2} — interleaved-DC MCU walk, subsampled
    AC grids, per-component EOB runs."""
    import random
    rng = random.Random(11)
    full = (M._JPEG_PROG_AC_BITS, M._JPEG_PROG_AC_SYMS)
    for _ in range(8):
        for sampling in (((1, 1),) * 3, ((2, 2), (1, 1), (1, 1)),
                         ((2, 1), (1, 1), (1, 1))):
            hmax = max(h for h, _ in sampling)
            vmax = max(v for _, v in sampling)
            mw, mh = rng.randint(1, 3), rng.randint(1, 2)
            w, h = mw * 8 * hmax, mh * 8 * vmax
            b3 = []
            for c, (h_i, v_i) in enumerate(sampling):
                grid = {}
                for br in range(mh * v_i):
                    for bc in range(mw * h_i):
                        coefs = {}
                        if rng.random() < 0.9:
                            coefs[0] = rng.randint(-10, 10)
                        for zz in rng.sample(range(1, 64),
                                             rng.randint(0, 5)):
                            coefs[zz] = rng.choice(
                                [-3, -2, -1, 1, 2, 3])
                        grid[(br, bc)] = coefs
                b3.append(grid)
            base = M.decode_jpeg_color(M.encode_jpeg_color(
                w, h, b3, sampling=sampling, ac_table=full))
            for al in (1, 2):
                prog = M.decode_jpeg_progressive(
                    M.encode_jpeg_progressive_color(
                        w, h, b3, sampling=sampling, al=al))
                assert (base == prog).all(), (sampling, al)


def test_progressive_with_restart_intervals():
    """DRI in progressive streams: every scan segments at the same
    interval, the RST counter restarts per scan, DC predictors and
    EOB runs never cross a boundary."""
    for doc in (0, 2, 7):
        w, h, blocks = M._jpeg_planted_blocks(doc)
        base = M.decode_jpeg_gray(M.encode_jpeg_gray(w, h, blocks))
        for ri in (1, 2, 3):
            prog = M.decode_jpeg_progressive(M.encode_jpeg_progressive(
                w, h, blocks, restart_interval=ri))
            assert (base == prog).all(), (doc, ri)
