"""YAML-driven check factory (ref base_checks.py:13-248 + checks.yaml).

The reference generates per-country check suites from a YAML config of
8 check types with params.  Same idea here: a YAML (or dict) config
compiles to a list of :class:`~acled_spark.checks.engine.Check`.

Config shape (mirrors checks.yaml's vocabulary):

```yaml
suites:
  acled_bronze:
    - type: non_empty            # blocking by default
    - type: required_columns
      columns: [event_id_cnty, event_date, ...]
    - type: value_range
      column: latitude
      lo: -90.0
      hi: 90.0
    - type: domain_membership
      column: event_type
      valid: [Battles, Protests, ...]
    - type: pk_unique
      columns: [event_id_cnty]
    - type: row_count_bounds
      lo: 1
      hi: 10000
    - type: completeness
      columns: [...]
      min_pct: 95.0
    - type: dominance
      column: event_type
      max_share_pct: 80.0
```
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from acled_spark.checks import engine

_BUILDERS = {
    "non_empty": engine.non_empty,
    "required_columns": engine.required_columns,
    "value_range": engine.value_range,
    "domain_membership": engine.domain_membership,
    "pk_unique": engine.pk_unique,
    "row_count_bounds": engine.row_count_bounds,
    "completeness": engine.completeness,
    "dominance": engine.dominance,
}


# "$NAME" values in a config resolve to the schema module's constants,
# so the YAML and acled_spark/schema.py cannot drift apart (they used to
# be two hand-maintained copies of the same lists).
def _schema_refs() -> dict[str, list]:
    from acled_spark import schema

    return {
        "$VALID_EVENT_TYPES": list(schema.VALID_EVENT_TYPES),
        "$CRITICAL_COLUMNS": list(schema.CRITICAL_COLUMNS),
    }


def build_suite(config: Sequence[dict]) -> list[engine.Check]:
    refs = _schema_refs()
    checks = []
    for i, entry in enumerate(config):
        if not isinstance(entry, dict):
            raise ValueError(
                f"suite entry #{i} must be a mapping with a 'type' key, "
                f"got {type(entry).__name__}: {entry!r}"
            )
        entry = dict(entry)
        ctype = entry.pop("type", None)
        if ctype is None:
            raise ValueError(
                f"suite entry #{i} has no 'type' key: {entry!r} "
                f"(valid types: {sorted(_BUILDERS)})"
            )
        if ctype not in _BUILDERS:
            raise ValueError(
                f"unknown check type {ctype!r} (valid: {sorted(_BUILDERS)})"
            )
        resolved = {}
        for k, v in entry.items():
            if isinstance(v, str) and v.startswith("$"):
                if v not in refs:
                    raise ValueError(
                        f"unknown schema reference {v!r} in suite entry #{i} "
                        f"(valid: {sorted(refs)})"
                    )
                v = refs[v]
            resolved[k] = v
        entry = resolved
        checks.append(_BUILDERS[ctype](**entry))
    return checks


def load_suites(path: str | None = None) -> dict[str, list[engine.Check]]:
    """Load every suite from a YAML config file."""
    import yaml

    if path is None:
        path = os.path.join(os.path.dirname(__file__), "checks.yaml")
    with open(path) as f:
        cfg = yaml.safe_load(f)
    # fail with the filename, not a bare TypeError/KeyError three frames
    # deep: safe_load returns None for an empty file and any scalar for
    # a non-mapping one (r10 hostile-input review)
    if not isinstance(cfg, dict) or "suites" not in cfg:
        raise ValueError(
            f"{path}: expected a mapping with a top-level 'suites' key, "
            f"got {type(cfg).__name__}"
        )
    suites = cfg["suites"]
    if not isinstance(suites, dict):
        raise ValueError(
            f"{path}: 'suites' must map suite names to entry lists, "
            f"got {type(suites).__name__}"
        )
    out = {}
    for name, entries in suites.items():
        # `suites:\n  name:\n` — the natural YAML spelling of an empty
        # suite — parses as None; a scalar would iterate as characters
        # and produce a misleading per-entry error (ADVICE r10)
        if entries is None:
            entries = []
        if not isinstance(entries, list):
            raise ValueError(
                f"{path}: suite {name!r} entries must be a list of "
                f"check mappings, got {type(entries).__name__}"
            )
        out[name] = build_suite(entries)
    return out
