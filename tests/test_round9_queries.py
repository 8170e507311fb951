"""Round-9 additions: t-SNE-substitute neighbor embedding."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_tsne_substitute_contracts_neighborhoods(spark):
    """The smoothing must (a) keep every user, (b) be deterministic at
    output rounding, and (c) contract local neighborhoods: mean 5-NN
    distance in the embedded plane is strictly smaller than in the
    PCA initialization (that contraction is the local-structure
    emphasis the substitute exists for)."""
    import math

    from threat_detection_nosql_spark.queries.ml_queries import (
        _TSNE_K, tsne_substitute_projection, user_pca_projection)

    init = {r.user: (r.pc1, r.pc2)
            for r in user_pca_projection(spark, SF).collect()}
    out = {r.user: (r.x, r.y)
           for r in tsne_substitute_projection(spark, SF).collect()}
    out2 = {r.user: (r.x, r.y)
            for r in tsne_substitute_projection(spark, SF).collect()}
    assert set(out) == set(init)
    assert all(abs(out[u][0] - out2[u][0]) < 1e-4
               and abs(out[u][1] - out2[u][1]) < 1e-4 for u in out)

    def mean_knn(coords):
        tot = 0.0
        for u, (x, y) in coords.items():
            ds = sorted(math.hypot(x - a, y - b)
                        for v, (a, b) in coords.items() if v != u)
            tot += sum(ds[:_TSNE_K]) / _TSNE_K
        return tot / len(coords)

    assert mean_knn(out) < mean_knn(init)


# -- GIF87a codec (the compressed-format path) -------------------------------

def test_gif_roundtrip_randomized():
    """Encoder/decoder round-trip across random sizes and palette
    cardinalities — crossing several LZW width boundaries — plus the
    degenerate constant raster (max run folding) and a 256-color noise
    image large enough to hit the 4096-entry table clear."""
    import numpy as np

    from threat_detection_nosql_spark.operators import multimodal as M

    rng = np.random.RandomState(0)
    for _ in range(25):
        h, w = rng.randint(1, 40), rng.randint(1, 40)
        n = rng.randint(2, 256)
        pal = rng.randint(0, 256, (n, 3)).astype(np.uint8)
        idx = rng.randint(0, n, (h, w)).astype(np.uint8)
        assert (M.decode_gif(M.encode_gif(idx, pal)) == pal[idx]).all()
    const = np.zeros((64, 64), np.uint8)
    pal8 = np.arange(24, dtype=np.uint8).reshape(8, 3)
    assert (M.decode_gif(M.encode_gif(const, pal8)) == pal8[const]).all()
    noise = rng.randint(0, 256, (120, 120)).astype(np.uint8)
    pal256 = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    assert (M.decode_gif(M.encode_gif(noise, pal256))
            == pal256[noise]).all()


def test_gif_decoder_width_schedule_is_decoder_side():
    """The decoder widens at 2^w - 1 (one entry before the encoder) —
    an image long enough to cross a width boundary desynchronizes if
    either side uses the other's rule. 600 pixels of 8-color gradient
    crosses the 4->5 and 5->6 boundaries."""
    import numpy as np

    from threat_detection_nosql_spark.operators import multimodal as M

    idx = (np.add.outer(np.arange(20), np.arange(30)) % 8).astype(np.uint8)
    pal = (np.arange(8)[:, None] * 16 + np.arange(3)[None, :] * 32 + 5
           ).astype(np.uint8)
    assert (M.decode_gif(M.encode_gif(idx, pal)) == pal[idx]).all()


def test_gif_decoder_refusals():
    import pytest as _pytest

    from threat_detection_nosql_spark.operators import multimodal as M

    with _pytest.raises(ValueError, match="bad magic"):
        M.decode_gif(b"NOTGIF" + b"\x00" * 20)
    with _pytest.raises(ValueError, match="truncated"):
        M._lzw_decode(b"", 3, 10)


# -- PNG codec (stdlib-zlib DEFLATE + scanline filters) ------------------------

def test_png_roundtrip_all_filters_and_sizes():
    import numpy as np

    from threat_detection_nosql_spark.operators.multimodal import (
        decode_png, encode_png)
    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (1, 7), (6, 1), (5, 5), (9, 3)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        for f in range(5):  # each filter alone, full image
            assert (decode_png(encode_png(
                img, row_filters=[f] * h)) == img).all(), (h, w, f)
        # the default mixed schedule (r % 5)
        assert (decode_png(encode_png(img)) == img).all()


def test_png_decoder_rejects_corruption():
    import numpy as np
    import pytest as pt

    from threat_detection_nosql_spark.operators.multimodal import (
        decode_png, encode_png)
    img = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    blob = bytearray(encode_png(img))
    with pt.raises(ValueError, match="bad signature"):
        decode_png(b"\x89PNG....")
    flipped = bytearray(blob)
    flipped[40] ^= 0xFF  # inside IDAT payload -> CRC must catch it
    with pt.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(flipped))
    with pt.raises(ValueError, match="unsupported PNG"):
        # rewrite IHDR color type to palette and fix its CRC
        import struct
        import zlib as z
        ihdr = bytearray(blob[8:8 + 25])
        ihdr[8 + 9] = 3  # color type byte inside IHDR data
        data = bytes(ihdr[8:8 + 13])
        patched = (blob[:8] + ihdr[:8] + data
                   + struct.pack(">I", z.crc32(b"IHDR" + data) & 0xFFFFFFFF)
                   + bytes(blob[8 + 25:]))
        decode_png(patched)


def test_png_paeth_spec_order():
    """Paeth ties resolve left -> up -> up-left per the spec."""
    from threat_detection_nosql_spark.operators.multimodal import _paeth
    assert _paeth(1, 1, 1) == 1          # all equal -> left
    assert _paeth(5, 5, 0) == 5          # pa == pb -> left
    assert _paeth(0, 4, 2) == 2          # pc=0 strictly smallest -> up-left
    assert _paeth(10, 0, 0) == 10        # p=10: pa=0 -> left
    assert _paeth(0, 10, 0) == 10        # p=10: pb=0 -> up
