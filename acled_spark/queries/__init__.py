"""Operator library — importing this package registers every query.

Modules map to SURVEY.md §2 sections:
    filters_q    §2.2 projections/filters/predicate DSL (P2-P6)
    joins        §2.3 joins + §2.7 set ops (J1-J6, SO1)
    aggregates   §2.4 aggregations (A1-A16)
    windows      §2.5 window functions (W1-W4)
    scalars      §2.8 scalar functions (F1-F11)
    dedup        extended: deduplication family
    cdc          extended: corpus snapshot diff (CDC)
    text         extended: text analysis family
    similarity   extended: similarity search
    mlq          §2.9 SQL-expressible ML feature ops
"""

from acled_spark.queries import (  # noqa: F401
    aggregates,
    cdc,
    dedup,
    filters_q,
    joins,
    mlq,
    multimodal_q,
    olap,
    packing,
    pipeline,
    scalars,
    sessions,
    similarity,
    sql_api,
    text,
    windows,
)
