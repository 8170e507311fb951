"""Multimodal plumbing: schema contract, Arrow batch shape, stubbed
decode determinism, frame sampling."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from threat_detection_nosql_spark.operators import multimodal
from threat_detection_nosql_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(60)
    return multimodal.attach_fake_media(docs).cache()


def test_media_schema(media):
    assert dict(media.dtypes) == {
        "doc_id": "bigint", "media_type": "string", "blob": "binary",
        "width": "int", "height": "int", "n_frames": "int"}


def test_feature_extraction_contract(media):
    feats = multimodal.extract_media_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:5]:
        assert r.feat_dim == 16 and len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-6  # normalized histogram


def test_feature_extraction_deterministic(media):
    a = sorted(multimodal.extract_media_features(media).collect(),
               key=lambda r: r.doc_id)
    b = sorted(multimodal.extract_media_features(media).collect(),
               key=lambda r: r.doc_id)
    assert [r.features for r in a] == [r.features for r in b]


def test_frame_sample_only_video(media):
    frames = multimodal.frame_sample(media, every_n=8)
    rows = frames.collect()
    assert rows and all(r.media_type == "video/mp4" for r in rows)
    assert all(r.frame_idx % 8 == 0 for r in rows)


def test_decode_media_dispatch_and_codec_refusal():
    """Round 8 replaced the NotImplementedError stub with real
    lib-free codecs: decode_media dispatches bmp/ppm/wav to byte-level
    parsers (round-trip tests in tests/test_round8_queries.py) and
    refuses codec formats the container cannot decode without
    Pillow/pyav."""
    import numpy as np

    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    assert (multimodal.decode_media(
        multimodal.encode_bmp(img), "bmp") == img).all()
    with pytest.raises(ValueError, match="no lib-free decoder"):
        multimodal.decode_media(b"\x89PNG", "png")
