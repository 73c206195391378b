"""Validation suite: parameterized checks + YAML factory.

See engine.py for check builders, factory.py for the YAML compiler,
checks.yaml for the shipped suites (bronze / silver / events).
"""

from acled_spark.checks.engine import (  # noqa: F401
    Check,
    CheckResult,
    ValidationError,
    completeness,
    dominance,
    domain_membership,
    non_empty,
    partition_date_match,
    pk_unique,
    required_columns,
    row_count_bounds,
    run_checks,
    value_range,
)
from acled_spark.checks.factory import build_suite, load_suites  # noqa: F401
