"""Multimodal plumbing tests: binary columns through Arrow batches,
deterministic stub decode, and the NotImplementedError gate for real
codecs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tlmc_etl_spark.operators.multimodal import (
    decode_payload,
    extract_features,
    synthetic_media_from_documents,
)
from tlmc_etl_spark.sources.tables import load_table


def test_features_deterministic_and_unit_norm(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = synthetic_media_from_documents(docs)
    feats = extract_features(media).collect()
    assert len(feats) == 50
    by_id = {r["media_id"]: r for r in feats}
    for r in feats:
        v = np.array(r["feature"])
        assert v.shape == (16,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
        assert r["n_bytes"] > 0
    # rerun → identical features (stub is deterministic)
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    for mid, row in by_id.items():
        assert again[mid] == row["feature"]


def test_real_kinds_raise_not_implemented():
    with pytest.raises(NotImplementedError):
        decode_payload("image", b"\x89PNG")


def test_media_schema_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = synthetic_media_from_documents(docs)
    p = str(tmp_path / "media")
    media.write.parquet(p)
    back = spark.read.parquet(p)
    assert back.count() == 10
    row = back.filter(F.col("media_id") == "doc-0").first()
    assert row["kind"] == "synthetic"
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["content_type"] == "text/plain"
