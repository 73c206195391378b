"""Reporting layer: KPI assembly from the query library + artifact
rendering (text/JSON always; PDF cleanly gated)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from acled_spark.report import compute_kpis, render_json, render_pdf, render_text

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def kpis(spark):
    return compute_kpis(spark, SF_DIR)


def test_kpis_consistent(spark, kpis):
    from acled_spark.tables import load

    assert kpis.total_events == 1000  # sf0.001 events row count
    # INDEPENDENT oracle for the average (r7 test review: dividing the
    # struct's own fields restated the implementation — wrong grouping
    # would shift numerator and denominator in lockstep)
    n_days = (
        load(spark, SF_DIR, "events").select(F.to_date("ts")).distinct().count()
    )
    assert len(kpis.daily_trend) == n_days
    assert kpis.avg_daily_events == pytest.approx(1000 / n_days, abs=0.01)
    assert 0 < kpis.data_quality_score <= 100.0
    shares = sum(r["pct"] for r in kpis.category_shares)
    assert shares == pytest.approx(100.0, abs=0.1)
    assert len(kpis.top_groups) == 10


def test_render_text_and_json(tmp_path, kpis):
    txt = render_text(kpis, os.path.join(str(tmp_path), "report.txt"))
    body = open(txt).read()
    assert "ANALYTICS INTELLIGENCE REPORT" in body
    assert "Page 2: Regional analysis" in body
    assert str(kpis.total_events) in body

    js = render_json(kpis, os.path.join(str(tmp_path), "report.json"))
    loaded = json.load(open(js))
    assert loaded["total_events"] == kpis.total_events
    assert len(loaded["daily_trend"]) == len(kpis.daily_trend)


def test_render_pdf_gated(tmp_path, kpis):
    try:
        import matplotlib  # noqa: F401

        has_mpl = True
    except ImportError:
        has_mpl = False
    if has_mpl:
        out = render_pdf(kpis, os.path.join(str(tmp_path), "report.pdf"))
        assert os.path.getsize(out) > 0
    else:
        with pytest.raises(ImportError, match="matplotlib is not available"):
            render_pdf(kpis, os.path.join(str(tmp_path), "report.pdf"))


@pytest.fixture(scope="module")
def ml_kpis(spark):
    from acled_spark.report import compute_ml_report_kpis

    return compute_ml_report_kpis(
        spark,
        SF_DIR,
        model_metrics={"test_rmse": 1.23, "test_r2": 0.9},
        prediction_errors={"mae": 0.8, "rmse": 1.1},
    )


def test_ml_report_block_mirrors_reference_queries(ml_kpis):
    """Every frame of the reference's 8-query ML-report block
    (ml.py:798-898) is present and populated from registry queries."""
    k = ml_kpis
    assert k.total_events > 0
    assert 0 < k.data_quality_score <= 100
    assert k.daily_trend and {"day", "event_count", "total_value"} <= set(
        k.daily_trend[0]
    )
    assert k.top_event_types and len(k.top_event_types) <= 10
    assert k.admin_rollup and {"nation", "customer_count"} <= set(
        k.admin_rollup[0]
    )
    assert {"n_rows", "n_returned"} <= set(k.presence_census)
    assert k.weekly_actuals and {"week", "avg_value"} <= set(
        k.weekly_actuals[0]
    )
    assert len(k.high_value_head) <= 20
    assert k.histogram and {"bucket", "cnt"} <= set(k.histogram[0])
    # INDEPENDENT oracle (r7 test review: summing the struct's own
    # daily_trend restated report.py's derivation verbatim): the sf0.001
    # events table holds exactly 1000 rows
    assert k.total_events == 1000
    assert sum(r["event_count"] for r in k.daily_trend) == 1000
    assert k.model_metrics["test_r2"] == 0.9


def test_ml_report_runs_without_model(spark):
    from acled_spark.report import compute_ml_report_kpis

    k = compute_ml_report_kpis(spark, SF_DIR)
    assert k.model_metrics == {} and k.prediction_errors == {}


def test_render_ml_text_covers_all_pages(tmp_path, ml_kpis):
    from acled_spark.report import render_ml_text

    path = os.path.join(str(tmp_path), "ml_report.txt")
    render_ml_text(ml_kpis, path)
    text = open(path).read()
    for marker in (
        "Page 1: Executive summary",
        "Page 2: Activity analysis",
        "Page 3: ML performance",
        "Top event types:",
        "Admin rollup:",
        "Weekly actuals:",
        "High-severity head:",
        "Value histogram:",
        "model test_rmse: 1.23",
        "scoring mae: 0.8",
    ):
        assert marker in text, marker


def test_render_text_covers_reference_pdf_structure(tmp_path, kpis):
    """Every KPI block the reference's 2 PDF pages draw
    (report.py:149-523) appears in the text artifact: the 4 page-1
    metric cards, completeness bars, trend plot, classification and
    top-groups bars, and the page-2 regional cards + rollup."""
    path = os.path.join(str(tmp_path), "report.txt")
    render_text(kpis, path)
    text = open(path).read()
    for marker in (
        "Total events:",
        "Total value:",
        "Avg events/day:",
        "Data quality score:",
        "Data completeness analysis:",
        "Category shares:",
        "Daily counts (7-day moving avg):",
        "Top groups:",
        "Page 2: Regional analysis",
        "Active regions:",
        "Most active region:",
        "Region rollup:",
    ):
        assert marker in text, marker
    # completeness covers every audited field
    assert len(kpis.field_completeness) == 4
    assert all(0 <= r["pct"] <= 100 for r in kpis.field_completeness)
    assert kpis.active_regions == len(kpis.region_rollup)


# --- choropleth (VERDICT r2 #6; ref assets/report.py:552-651) ---------------


def test_heatmap_json_fallback_structure(spark, tmp_path):
    from acled_spark.report import compute_region_counts, render_heatmap_json

    counts = compute_region_counts(spark, SF_DIR)
    assert counts and all({"region", "count"} <= set(c) for c in counts)
    path = str(tmp_path / "heatmap.json")
    render_heatmap_json(counts, path)
    with open(path) as fh:
        payload = json.load(fh)
    assert payload["series"] == "Customer Count"
    # independent cardinality oracle (r7 test review: comparing the
    # payload's fields to each other restated render_heatmap_json's own
    # derivations): regions come from the mapped slice of counts
    from acled_spark.report import REGION_SLUGS as _slugs

    expected_regions = {
        _slugs[c["region"]] for c in counts if c["region"] in _slugs
    }
    assert set(payload["regions"]) == expected_regions
    assert payload["regions_with_data"] == len(expected_regions) > 0
    # the three deliberately-unmapped dimension values are reported
    assert payload["unmapped"] == ["NATION_22", "NATION_23", "NATION_24"]
    assert payload["total_customers"] == sum(
        c["count"] for c in counts if c["region"] in _slugs
    )  # against the INPUT counts, not the payload's own fields
    # every mapped slug is a known table value; counts survive mapping
    from acled_spark.report import REGION_SLUGS

    assert set(payload["regions"]) <= set(REGION_SLUGS.values())
    by_name = {c["region"]: c["count"] for c in counts}
    for name, slug in REGION_SLUGS.items():
        if name in by_name:
            assert payload["regions"][slug] == by_name[name]


def test_heatmap_unmapped_regions_dropped_and_reported(tmp_path):
    from acled_spark.report import map_region_slugs, render_heatmap_json

    counts = [
        {"region": "NATION_3", "count": 10},
        {"region": "ATLANTIS", "count": 99},  # not in the slug table
    ]
    mapped, unmapped = map_region_slugs(counts)
    assert mapped == {"nation-3": 10}
    assert unmapped == ["ATLANTIS"]
    path = str(tmp_path / "h.json")
    render_heatmap_json(counts, path)
    with open(path) as fh:
        payload = json.load(fh)
    assert payload["unmapped"] == ["ATLANTIS"]
    assert "ATLANTIS" not in payload["regions"]


def test_heatmap_png_gate_raises_without_pygal():
    from acled_spark.report import render_heatmap_png

    with pytest.raises(ImportError, match="pygal"):
        render_heatmap_png([{"region": "NATION_3", "count": 1}], "/tmp/x.png")


def test_heatmap_png_wiring_with_fake_map(tmp_path):
    """A recorder map class proves the render path: title, one series
    with the mapped payload, render_to_png at the requested path."""
    from acled_spark.report import render_heatmap_png

    calls = {}

    class FakeMap:
        def __init__(self, **kwargs):
            calls["kwargs"] = kwargs

        def __setattr__(self, name, value):
            calls.setdefault("attrs", {})[name] = value

        def add(self, series, payload):
            calls["series"] = series
            calls["payload"] = payload

        def render_to_png(self, path):
            calls["path"] = path

    out = str(tmp_path / "map.png")
    render_heatmap_png(
        [{"region": "NATION_3", "count": 7}, {"region": "NOWHERE", "count": 3}],
        out,
        map_cls=FakeMap,
    )
    assert calls["kwargs"] == {"legend_at_bottom": True}
    assert calls["series"] == "Customer Count"
    assert calls["payload"] == {"nation-3": 7}
    assert calls["path"] == out


def test_cli_report_writes_artifacts(spark, tmp_path):
    """python -m acled_spark report: text + JSON + heatmap JSON land in
    the output dir; gated renderers not requested, so no import errors."""
    from acled_spark.__main__ import main

    out = str(tmp_path / "artifacts")
    rc = main(["report", "--sf-dir", SF_DIR, "--out-dir", out])
    assert rc == 0
    report = json.load(open(os.path.join(out, "report.json")))
    heat = json.load(open(os.path.join(out, "heatmap.json")))
    assert report["total_events"] > 0
    assert heat["regions_with_data"] > 0
    assert os.path.getsize(os.path.join(out, "report.txt")) > 0


def test_quality_score_empty_table_is_100_not_typeerror(spark):
    """r8 lens: an empty documents table gives NULL audited sums, and
    summing them ran BEFORE the n==0 guard — the guard's own input
    crashed with TypeError instead of returning the 100.0 fallback."""
    from acled_spark.queries.aggregates import a3_null_empty_audit
    from acled_spark.report import _quality_score

    empty = spark.createDataFrame(
        [],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="empty_docs_")
    empty.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    audit = a3_null_empty_audit(spark, d).collect()[0]
    assert audit["n_rows"] == 0 and audit["text_nulls"] is None
    assert _quality_score(audit) == 100.0
