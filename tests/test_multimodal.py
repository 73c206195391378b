"""Multimodal plumbing: binary payload schema, Arrow-batch extraction,
stubbed decode boundary."""

from __future__ import annotations

import hashlib

import pytest

from acled_spark.multimodal import (
    attach_payloads,
    decode_image,
    extract_features,
    fake_decode,
)
from acled_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


def test_payload_schema_and_metadata(spark):
    media = attach_payloads(load(spark, SF_DIR, "documents"))
    assert dict(media.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "meta": "struct<mime:string,n_bytes:bigint,source:string>",
    }
    row = media.orderBy("doc_id").first()
    assert row["meta"]["n_bytes"] == len(row["payload"])
    assert row["meta"]["mime"] == "text/plain"


def test_extract_features_matches_local_compute(spark):
    docs = load(spark, SF_DIR, "documents").limit(20)
    feats = {
        r["doc_id"]: r for r in extract_features(attach_payloads(docs)).collect()
    }
    for r in docs.collect():
        payload = r["text"].encode("utf-8")
        f = feats[r["doc_id"]]
        assert f["n_bytes"] == len(payload)
        assert f["digest"] == hashlib.md5(payload).hexdigest()
        assert (f["width"], f["height"]) == fake_decode(payload)


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError, match="media decode"):
        decode_image(b"\x89PNG...")


def test_resize_geometry_invariants(spark):
    """No upscale, aspect ratio preserved within integer rounding, and
    every output side fits max_side."""
    from acled_spark.multimodal import attach_payloads, fake_decode, resize_images

    docs = load(spark, SF_DIR, "documents").limit(50)
    media = attach_payloads(docs)
    out = resize_images(media, max_side=100).collect()
    assert len(out) == 50
    for r in out:
        assert max(r["out_width"], r["out_height"]) <= 100
        assert r["out_width"] >= 1 and r["out_height"] >= 1
        assert r["scale"] <= 1.0  # never upscale
        if r["scale"] == 1.0:
            assert (r["out_width"], r["out_height"]) == (r["width"], r["height"])
        # geometry must match the decoder's dims deterministically
        w, h = fake_decode(bytes(r["payload"]))
        assert (w, h) == (r["width"], r["height"])


def test_sample_frames_fanout_and_determinism(spark):
    from acled_spark.multimodal import (
        FRAME_BYTES,
        attach_payloads,
        sample_frames,
    )

    docs = load(spark, SF_DIR, "documents").limit(20)
    media = attach_payloads(docs)
    frames = sample_frames(media, every=3)
    rows = frames.collect()
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    expected = 0
    for p in payloads.values():
        n_frames = max(1, len(p) // FRAME_BYTES)
        expected += len(range(0, n_frames, 3))
    assert len(rows) == expected
    # frame bytes are exact payload slices (kept frames only)
    for r in rows[:40]:
        p = payloads[r["doc_id"]]
        idx = r["frame_idx"]
        assert idx % 3 == 0
        assert bytes(r["frame"]) == p[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]


def test_mm_feature_extract_self_certifies(spark):
    """digest_ok pins Arrow round-trip byte fidelity (md5 recomputed
    JVM-side == Python-side digest); decode_ok pins the decoder
    contract + metadata byte-count parity."""
    from acled_spark.registry import all_specs

    rows = all_specs()["mm_feature_extract"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    assert all(r["digest_ok"] for r in rows)
    assert all(r["decode_ok"] for r in rows)


def test_extract_features_rejects_colliding_passthrough(spark):
    import pytest

    from acled_spark.multimodal import attach_payloads, extract_features
    from acled_spark.tables import load
    from tests.conftest import SF_DIR

    media = attach_payloads(load(spark, SF_DIR, "documents"))
    with pytest.raises(ValueError, match="collide"):
        extract_features(media, passthrough=("n_bytes",))
    with pytest.raises(ValueError, match="collide"):
        # 'payload' crosses the Arrow boundary itself: selecting it twice
        # would crash in the worker, so the guard must catch it driver-side
        extract_features(media, passthrough=("payload",))


def test_attach_payloads_matches_documented_media_schema(spark):
    """MEDIA_SCHEMA is the documented media-frame contract — pin it to
    attach_payloads' actual output so the constant can't silently drift."""
    from pyspark.sql.types import _parse_datatype_string

    from acled_spark.multimodal import MEDIA_SCHEMA, attach_payloads

    docs = load(spark, SF_DIR, "documents").limit(3)
    got = attach_payloads(docs).schema
    want = _parse_datatype_string(MEDIA_SCHEMA)
    assert [
        (f.name, f.dataType.simpleString()) for f in got.fields
    ] == [(f.name, f.dataType.simpleString()) for f in want.fields]


def test_null_payloads_flag_instead_of_crashing(spark):
    """A NULL payload (unreadable file in a production binaryFile
    source) must yield a flagged/empty row, not a TypeError inside the
    Arrow worker."""
    from acled_spark.multimodal import (
        extract_features,
        resize_images,
        sample_frames,
    )

    media = spark.createDataFrame(
        [(1, bytearray(b"some real payload bytes")), (2, None)],
        "doc_id long, payload binary",
    )
    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert feats[1]["digest"] is not None and feats[1]["n_bytes"] > 0
    assert feats[2]["digest"] is None and feats[2]["n_bytes"] == 0
    assert feats[2]["width"] is None and feats[2]["height"] is None

    resized = {r["doc_id"]: r for r in resize_images(media).collect()}
    assert resized[1]["out_width"] >= 1
    assert resized[2]["payload"] is None and resized[2]["scale"] is None

    frames = sample_frames(media, every=2).collect()
    assert {r["doc_id"] for r in frames} == {1}  # null payload: no frames


def test_sample_frames_rejects_nonpositive_every(spark):
    import pytest as _pytest

    from acled_spark.multimodal import sample_frames

    media = spark.createDataFrame(
        [(1, bytearray(b"x" * 100))], "doc_id long, payload binary"
    )
    for bad in (0, -1):
        with _pytest.raises(ValueError, match="every"):
            sample_frames(media, every=bad)
