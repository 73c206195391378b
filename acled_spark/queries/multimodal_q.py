"""Multimodal-column queries: binary payload metadata rollup (oracle-
checked) and the mapInPandas feature-extraction path (rows-only check —
the Python decode step is not SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from acled_spark.multimodal import attach_payloads, extract_features
from acled_spark.registry import query
from acled_spark.tables import load


@query(
    "mm_payload_metadata",
    oracle="""
    SELECT source,
           COUNT(*) AS n_media,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents GROUP BY source ORDER BY source
    """,
    tags=("multimodal", "extended"),
)
def mm_payload_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup over binary payloads — filters/aggregates on
    the meta struct never touch payload bytes (column pruning)."""
    media = attach_payloads(load(spark, sf_dir, "documents"))
    return (
        media.groupBy(F.col("meta.source").alias("source"))
        .agg(
            F.count("*").alias("n_media"),
            F.sum("meta.n_bytes").cast("long").alias("total_bytes"),
            F.max("meta.n_bytes").cast("long").alias("max_bytes"),
        )
        .orderBy("source")
    )


@query(
    "mm_feature_extract",
    oracle=None,  # Python decode step — rows-only check by design
    tags=("multimodal", "extended", "python"),
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature pass over payloads (deterministic fake
    decoder; swap in a real codec in production — see multimodal.py)."""
    media = attach_payloads(load(spark, sf_dir, "documents"))
    return extract_features(media).orderBy("doc_id").limit(100)
