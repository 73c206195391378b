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
