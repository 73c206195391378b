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
    a1_value_counts,
    a2_conditional_counts,
    a3_null_empty_audit,
    a4_daily_rollup,
    a5_topk_groups,
    a6_dim_rollup,
    a7_multi_measure_rollup,
    a8_weekly_rollup,
    a13_histogram,
    a16_percent_of_total,
)
from acled_spark.queries.filters_q import p6_threshold_topk
from acled_spark.queries.windows import w1_moving_avg_7d


@dataclass
class ReportKpis:
    """The §3.3 KPI block (ref report.py:122-147).

    Covers every number the reference's two PDF pages draw
    (report.py:149-523): the four page-1 metric cards, the completeness
    bars, the trend plot, the classification + top-groups bars, and the
    page-2 regional cards/rollup.
    """

    total_events: int
    total_value: float
    avg_daily_events: float
    data_quality_score: float
    top_groups: list[dict] = field(default_factory=list)
    category_shares: list[dict] = field(default_factory=list)
    daily_trend: list[dict] = field(default_factory=list)
    # page-1 'DATA COMPLETENESS ANALYSIS' bars (ref report.py:251-279)
    field_completeness: list[dict] = field(default_factory=list)
    # page-2 regional analysis (ref report.py:374-503)
    region_rollup: list[dict] = field(default_factory=list)
    active_regions: int = 0
    most_active_region: str = "N/A"


#: completeness-audited fields shared by BOTH reports' quality score
_AUDITED_FIELDS = ("text_nulls", "text_empty", "lang_nulls", "source_nulls")


def _quality_score(audit) -> float:
    """((kN - missing) / kN) * 100 over the audited fields
    (ref report.py:122-132) — one definition for both report KPI blocks."""
    n = audit["n_rows"]
    k = len(_AUDITED_FIELDS)
    if not n:
        # guard BEFORE touching the audited sums: an empty table's
        # F.sum() fields are NULL/None, and summing them raised the
        # TypeError this fallback exists to prevent (r8 lens)
        return 100.0
    missing = sum(audit[k_] for k_ in _AUDITED_FIELDS)
    return round(100.0 * (k * n - missing) / (k * n), 2)


def _rows(frame_rows, date_cols=()):
    """Collected Rows -> JSON-ready dicts (dates to isoformat)."""
    out = []
    for r in frame_rows:
        d = r.asDict()
        for c in date_cols:
            if d.get(c) is not None:
                d[c] = d[c].isoformat()
        out.append(d)
    return out


def _top_region_share(kpis) -> float:
    """Most-active region's share of total regional events (the page-2
    card previously displayed the quality score by mistake)."""
    total = sum(r["order_count"] for r in kpis.region_rollup)
    if not total:
        return 0.0
    return round(100.0 * kpis.region_rollup[0]["order_count"] / total, 1)


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
    n = audit["n_rows"]
    quality = _quality_score(audit)
    completeness = [
        {
            "field": k.replace("_nulls", "").replace("_empty", " (non-empty)"),
            "pct": round(100.0 * (n - audit[k]) / n, 2) if n else 100.0,
        }
        for k in _AUDITED_FIELDS
    ]

    regions = a6_dim_rollup(spark, sf_dir).collect()

    return ReportKpis(
        total_events=total_events,
        total_value=total_value,
        avg_daily_events=avg_daily,
        data_quality_score=quality,
        top_groups=[r.asDict() for r in top],
        category_shares=[r.asDict() for r in shares],
        daily_trend=_rows(trend, date_cols=("day",)),
        field_completeness=completeness,
        region_rollup=[r.asDict() for r in regions],
        active_regions=len(regions),
        most_active_region=(
            regions[0]["o_orderpriority"] if regions else "N/A"
        ),
    )


@dataclass
class MlReportKpis:
    """The ML-report metadata block (ref ml.py:768-898).

    The reference's 3-page ML PDF is fed by an 8-query block run against
    Postgres (ml.py:798-898): quality census, daily counts, top event
    types, admin rollup, presence census, dim-filtered rollup, weekly
    actuals, and a high-severity head — plus the trained model's metrics
    and scored-prediction error stats.  Each maps 1:1 onto an
    oracle-checked registry query; model/prediction numbers come from
    ml.train / ml.score when supplied.
    """

    # scalar summary (ref ml.py:905-918)
    total_events: int
    avg_daily_events: float
    data_quality_score: float
    # the 8-query block (small aggregated frames, collected)
    daily_trend: list[dict] = field(default_factory=list)
    top_event_types: list[dict] = field(default_factory=list)
    admin_rollup: list[dict] = field(default_factory=list)
    presence_census: dict = field(default_factory=dict)
    weekly_actuals: list[dict] = field(default_factory=list)
    high_value_head: list[dict] = field(default_factory=list)
    histogram: list[dict] = field(default_factory=list)
    # ML half (ref ml.py:930-940): model metrics + prediction errors
    model_metrics: dict = field(default_factory=dict)
    prediction_errors: dict = field(default_factory=dict)


def compute_ml_report_kpis(
    spark: SparkSession,
    sf_dir: str,
    model_metrics: dict | None = None,
    prediction_errors: dict | None = None,
) -> MlReportKpis:
    """Assemble the ML-report block from registry queries (ml.py:768-898).

    ``model_metrics`` is :class:`acled_spark.ml.train.TrainedModel.
    metrics`; ``prediction_errors`` is :func:`acled_spark.ml.score.
    error_analysis`'s summary dict — both optional so the data half of
    the report runs without a trained model on hand.
    """
    daily = a4_daily_rollup(spark, sf_dir).collect()
    audit = a3_null_empty_audit(spark, sf_dir).collect()[0]
    top_types = a1_value_counts(spark, sf_dir).limit(10).collect()
    admin = a7_multi_measure_rollup(spark, sf_dir).collect()
    presence = a2_conditional_counts(spark, sf_dir).collect()[0]
    weekly = a8_weekly_rollup(spark, sf_dir).collect()
    head = p6_threshold_topk(spark, sf_dir).collect()
    hist = a13_histogram(spark, sf_dir).collect()

    total_events = sum(r["event_count"] for r in daily)
    avg_daily = round(total_events / len(daily), 2) if daily else 0.0
    quality = _quality_score(audit)
    rows = _rows

    return MlReportKpis(
        total_events=total_events,
        avg_daily_events=avg_daily,
        data_quality_score=quality,
        daily_trend=rows(daily, date_cols=("day",)),
        top_event_types=rows(top_types),
        admin_rollup=rows(admin),
        presence_census=presence.asDict(),
        weekly_actuals=rows(weekly, date_cols=("week",)),
        high_value_head=rows(head),
        histogram=rows(hist),
        model_metrics=dict(model_metrics or {}),
        prediction_errors=dict(prediction_errors or {}),
    )


def render_ml_text(kpis: MlReportKpis, path: str) -> str:
    """The 3-page ML report as structured text (ref ml.py:930-1564's page
    layout: executive summary -> activity analysis -> ML performance)."""
    lines = [
        "=" * 60,
        "ML-ENHANCED INTELLIGENCE REPORT",
        "=" * 60,
        "",
        "-- Page 1: Executive summary --",
        f"Total events:        {kpis.total_events}",
        f"Avg events/day:      {kpis.avg_daily_events}",
        f"Data quality score:  {kpis.data_quality_score}%",
        "",
        "Top event types:",
    ]
    for row in kpis.top_event_types:
        lines.append(f"  {row['event_type']:<14} {row['cnt']:>8}")
    lines += ["", "-- Page 2: Activity analysis --", "Admin rollup:"]
    for row in kpis.admin_rollup:
        lines.append(
            f"  {row['nation']:<16} customers={row['customer_count']:>6} "
            f"balance={row['total_balance']}"
        )
    lines += ["", "Weekly actuals:"]
    for row in kpis.weekly_actuals:
        lines.append(
            f"  {row['week']}  n={row['event_count']:>6}  "
            f"avg={row['avg_value']}  total={row['total_value']}"
        )
    lines += ["", "High-severity head:"]
    for row in kpis.high_value_head:
        lines.append(
            f"  event {row['event_id']:>8}  {row['event_type']:<12} "
            f"value={row['value']}"
        )
    lines += ["", "Value histogram:"]
    for row in kpis.histogram:
        lines.append(f"  {row['bucket']:<12} {row['cnt']:>8}")
    lines += ["", "-- Page 3: ML performance --"]
    if kpis.model_metrics:
        for k, v in sorted(kpis.model_metrics.items()):
            lines.append(f"  model {k}: {v}")
    else:
        lines.append("  (no trained model supplied)")
    if kpis.prediction_errors:
        for k, v in sorted(kpis.prediction_errors.items()):
            lines.append(f"  scoring {k}: {v}")
    else:
        lines.append("  (no scored predictions supplied)")
    text = "\n".join(lines) + "\n"
    with open(path, "w") as f:
        f.write(text)
    return path


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
        "Data completeness analysis:",
    ]
    for row in kpis.field_completeness:
        lines.append(f"  {row['field']:<20} {row['pct']:>6}%")
    lines += ["", "Category shares:"]
    for row in kpis.category_shares:
        lines.append(
            f"  {row['event_type']:<12} {row['cnt']:>8}  {row['pct']:>6}%"
        )
    lines += ["", "Daily counts (7-day moving avg):"]
    for row in kpis.daily_trend:
        lines.append(f"  {row['day']}  {row['cnt']:>6}  ma7={row['ma7']}")
    lines += ["", "Top groups:"]
    for row in kpis.top_groups:
        lines.append(f"  user {row['user_id']:>6}: {row['cnt']} events")
    lines += [
        "",
        "-- Page 2: Regional analysis --",
        f"Active regions:      {kpis.active_regions}",
        f"Most active region:  {kpis.most_active_region}",
        "",
        "Region rollup:",
    ]
    for row in kpis.region_rollup:
        lines.append(
            f"  {row['o_orderpriority']:<16} {row['order_count']:>8}"
        )
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
    matplotlib.use("Agg")  # pragma: no cover
    import matplotlib.pyplot as plt  # pragma: no cover
    from matplotlib.backends.backend_pdf import PdfPages  # pragma: no cover

    def _metric_cards(fig, y, cards):  # pragma: no cover
        # the reference's 4-card metric strip (report.py:207-249)
        for i, (label, value) in enumerate(cards):
            ax = fig.add_axes([0.04 + i * 0.24, y, 0.21, 0.1])
            ax.axis("off")
            ax.add_patch(
                plt.Rectangle(
                    (0, 0), 1, 1, fill=True, color="#f0f0f0",
                    transform=ax.transAxes,
                )
            )
            ax.text(0.5, 0.62, str(value), fontsize=16, fontweight="bold",
                    ha="center", transform=ax.transAxes)
            ax.text(0.5, 0.24, label.upper(), fontsize=8, ha="center",
                    transform=ax.transAxes)

    with PdfPages(path) as pdf:  # pragma: no cover
        # ---- Page 1: executive summary (ref report.py:178-372) ----
        fig = plt.figure(figsize=(11, 8.5))
        fig.suptitle("ANALYTICS INTELLIGENCE REPORT", fontsize=18, y=0.97)
        _metric_cards(
            fig,
            0.78,
            [
                ("total events", kpis.total_events),
                ("total value", kpis.total_value),
                ("avg events/day", kpis.avg_daily_events),
                ("quality score", f"{kpis.data_quality_score}%"),
            ],
        )
        # completeness bars (ref report.py:251-279)
        ax1 = fig.add_axes([0.06, 0.44, 0.40, 0.26])
        fields = [r["field"] for r in kpis.field_completeness]
        pcts = [r["pct"] for r in kpis.field_completeness]
        ax1.barh(range(len(fields)), pcts, color="#4c72b0")
        ax1.set_yticks(range(len(fields)), fields, fontsize=8)
        ax1.set_xlim(0, 105)
        for i, v in enumerate(pcts):
            ax1.text(v + 1, i, f"{v:.1f}%", fontsize=7, va="center")
        ax1.set_title("DATA COMPLETENESS ANALYSIS", fontsize=9)
        # daily trend + rolling average (ref report.py:281-303)
        ax2 = fig.add_axes([0.55, 0.44, 0.40, 0.26])
        days = [r["day"] for r in kpis.daily_trend]
        ax2.plot(days, [r["cnt"] for r in kpis.daily_trend],
                 label="daily", alpha=0.6)
        ax2.plot(days, [r["ma7"] for r in kpis.daily_trend],
                 label="7-day avg", linewidth=2)
        ax2.legend(fontsize=7)
        ax2.tick_params(labelsize=6)
        ax2.set_title("DAILY ACTIVITY TRENDS", fontsize=9)
        # top-categories bar (ref report.py:305-331)
        ax3 = fig.add_axes([0.06, 0.08, 0.40, 0.26])
        cats = [r["event_type"] for r in kpis.category_shares]
        counts = [r["cnt"] for r in kpis.category_shares]
        ax3.barh(range(len(cats)), counts, color="#55a868")
        ax3.set_yticks(range(len(cats)), cats, fontsize=8)
        for i, v in enumerate(counts):
            ax3.text(v, i, f"{v:,}", fontsize=7, va="center")
        ax3.set_title("EVENT CLASSIFICATION", fontsize=9)
        # top groups bar (ref report.py:333-359)
        ax4 = fig.add_axes([0.55, 0.08, 0.40, 0.26])
        groups = [str(r["user_id"]) for r in kpis.top_groups]
        gcounts = [r["cnt"] for r in kpis.top_groups]
        ax4.barh(range(len(groups)), gcounts, color="#c44e52")
        ax4.set_yticks(range(len(groups)), groups, fontsize=8)
        ax4.set_title("TOP GROUPS (TOP 10)", fontsize=9)
        pdf.savefig(fig)
        plt.close(fig)

        # ---- Page 2: regional analysis (ref report.py:374-517) ----
        fig2 = plt.figure(figsize=(11, 8.5))
        fig2.suptitle("REGIONAL ANALYSIS", fontsize=18, y=0.97)
        _metric_cards(
            fig2,
            0.78,
            [
                ("regional events",
                 sum(r["order_count"] for r in kpis.region_rollup)),
                ("active regions", kpis.active_regions),
                ("most active", kpis.most_active_region),
                ("share of total",
                 f"{_top_region_share(kpis)}%"),
            ],
        )
        if kpis.region_rollup:
            axl = fig2.add_axes([0.08, 0.1, 0.84, 0.6])
            names = [r["o_orderpriority"] for r in kpis.region_rollup][:15]
            vals = [r["order_count"] for r in kpis.region_rollup][:15]
            axl.barh(range(len(names)), vals, color="#4c72b0")
            axl.set_yticks(range(len(names)), names, fontsize=8)
            for i, v in enumerate(vals):
                axl.text(v, i, f"{v:,}", fontsize=7, va="center")
            axl.set_title("TOP REGIONS BY EVENT COUNT", fontsize=9)
        else:
            axn = fig2.add_axes([0.1, 0.3, 0.8, 0.4])
            axn.text(0.5, 0.5, "No regional data available",
                     ha="center", fontsize=12)
            axn.axis("off")
        pdf.savefig(fig2)
        plt.close(fig2)
    return path


# --- regional choropleth (ref assets/report.py:552-651) ---------------------
# The reference renders a pygal Ukraine Regions PNG from an admin1 ->
# event-count rollup, passed through a literal name -> map-slug table
# (report.py:590-622) that silently drops regions the map doesn't know.
# Engine-side split, same as the PDF: the counts come from an
# oracle-checked registry query; rendering is driver-side presentation
# gated on the optional pygal dependency, with an always-available
# JSON artifact carrying the identical payload (so the capability is
# testable and diffable without the plotting stack).

# Name -> map-slug table (the reference's region_mapping analog,
# report.py:590-622) over the engine's 25-nation dimension (the
# testdata's NATION_0..NATION_24 domain, same cardinality as the
# reference's 25 mapped Ukraine regions).  Three names are deliberately
# absent, mirroring the reference's incomplete literal map: a name not
# in this table is DROPPED from the map payload and reported in the
# artifact's ``unmapped`` list — same semantics as the reference's
# ``if region in region_mapping`` filter.
REGION_SLUGS = {
    f"NATION_{i}": f"nation-{i}" for i in range(22)  # 22..24 unmapped
}


def compute_region_counts(spark: SparkSession, sf_dir: str) -> list[dict]:
    """Region -> customer-count rollup feeding the choropleth.

    Reuses the oracle-checked a7 rollup (the engine's analog of the
    reference's admin1 event-count map, ref report.py:558-566; the
    testdata's events table carries no region key, so the nation-keyed
    customer count is the measure and the artifact labels say so);
    only the 25-row dim aggregate is collected.
    """
    return [
        {"region": r["nation"], "count": r["customer_count"]}
        for r in a7_multi_measure_rollup(spark, sf_dir).collect()
    ]


def map_region_slugs(
    counts: list[dict], mapping: dict[str, str] | None = None
) -> tuple[dict[str, int], list[str]]:
    """Apply the name->slug table; returns (mapped payload, dropped names)."""
    table = REGION_SLUGS if mapping is None else mapping
    mapped = {
        table[c["region"]]: c["count"] for c in counts if c["region"] in table
    }
    unmapped = sorted(c["region"] for c in counts if c["region"] not in table)
    return mapped, unmapped


def render_heatmap_json(
    counts: list[dict], path: str, title: str = "Customer Distribution by Region"
) -> str:
    """Always-available choropleth artifact: the exact payload the PNG
    renderer would draw, plus the names the slug table dropped."""
    mapped, unmapped = map_region_slugs(counts)
    with open(path, "w") as fh:
        json.dump(
            {
                "title": title,
                "series": "Customer Count",
                "regions": mapped,
                "regions_with_data": len(mapped),
                "total_customers": sum(mapped.values()),
                "unmapped": unmapped,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    return path


def render_heatmap_png(
    counts: list[dict],
    path: str,
    title: str = "Customer Distribution by Region",
    map_cls=None,
) -> str:
    """pygal choropleth PNG (ref report.py:625-651), import-gated.

    ``map_cls`` defaults to the reference's Ukraine Regions map when
    the pygal_maps_ua plugin is present, else pygal's world map; pass
    an explicit class to target another pygal map plugin.
    """
    if map_cls is None:
        try:
            from pygal_maps_ua.maps import Regions as map_cls  # noqa: N813
        except ImportError:
            try:
                from pygal.maps.world import World as map_cls  # noqa: N813
            except ImportError as exc:
                raise ImportError(
                    "pygal (with a map plugin) is not available in this "
                    "environment; use render_heatmap_json for the same "
                    "payload, or install pygal + pygal_maps_ua/"
                    "pygal_maps_world for PNG output"
                ) from exc
    mapped, _ = map_region_slugs(counts)
    chart = map_cls(legend_at_bottom=True)
    chart.title = title
    chart.add("Customer Count", mapped)
    chart.render_to_png(path)
    return path
