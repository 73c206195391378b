"""The ACLED event-table schema — the engine's core data model.

Authoritative 31-column relational shape from the reference DDL
(``base_assets.py:161-195``); bronze parquet types from
``io_manager.py:36-53``; ingest cast list from ``base_assets.py:120-141``.

Two schemas:
- :data:`ACLED_RAW_SCHEMA` — all strings, as the flattened API JSON
  arrives (``utils.py:12-16``);
- :data:`ACLED_SCHEMA` — typed silver/bronze shape (date, ints, doubles,
  ms-precision timestamp).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# (name, typed Spark type); order follows the reference DDL.
_COLUMNS: list[tuple[str, object]] = [
    ("event_id_cnty", StringType()),      # PRIMARY KEY (base_assets.py:163)
    ("event_date", DateType()),
    ("year", IntegerType()),
    ("time_precision", IntegerType()),
    ("disorder_type", StringType()),
    ("event_type", StringType()),
    ("sub_event_type", StringType()),
    ("actor1", StringType()),
    ("assoc_actor_1", StringType()),
    ("inter1", StringType()),             # int codes stored as text (base_assets.py:124-126)
    ("actor2", StringType()),
    ("assoc_actor_2", StringType()),
    ("inter2", StringType()),
    ("interaction", StringType()),
    ("civilian_targeting", StringType()),
    ("iso", StringType()),
    ("region", StringType()),
    ("country", StringType()),
    ("admin1", StringType()),
    ("admin2", StringType()),
    ("admin3", StringType()),
    ("location", StringType()),
    ("latitude", DoubleType()),
    ("longitude", DoubleType()),
    ("geo_precision", IntegerType()),
    ("source", StringType()),
    ("source_scale", StringType()),
    ("notes", StringType()),
    ("fatalities", IntegerType()),
    ("tags", StringType()),
    ("event_timestamp", TimestampType()),  # epoch s * 1000 -> ms (base_assets.py:132-140)
]

ACLED_SCHEMA = StructType(
    [StructField(name, dtype, True) for name, dtype in _COLUMNS]
)

# Raw ingest shape: every field a string (flattened API JSON); the raw
# epoch-seconds column is named `timestamp` pre-derivation.
_RAW_NAMES = [name for name, _ in _COLUMNS if name != "event_timestamp"] + [
    "timestamp"
]
ACLED_RAW_SCHEMA = StructType(
    [StructField(name, StringType(), True) for name in _RAW_NAMES]
)

PRIMARY_KEY = "event_id_cnty"
PARTITION_COL = "event_date"

# Domain of event_type enforced by validation (acled_checks.py:426-429).
VALID_EVENT_TYPES = (
    "Violence against civilians",
    "Battles",
    "Explosions/Remote violence",
    "Riots",
    "Protests",
    "Strategic developments",
)

# Columns whose completeness is audited (acled_checks.py:644-655).
CRITICAL_COLUMNS = (
    "event_id_cnty",
    "event_date",
    "event_type",
    "country",
    "latitude",
    "longitude",
    "fatalities",
)
