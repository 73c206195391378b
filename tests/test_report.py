"""Reporting layer: KPI assembly from the query library + artifact
rendering (text/JSON always; PDF cleanly gated)."""

from __future__ import annotations

import json
import os

import pytest

from acled_spark.report import compute_kpis, render_json, render_pdf, render_text

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def kpis(spark):
    return compute_kpis(spark, SF_DIR)


def test_kpis_consistent(spark, kpis):
    assert kpis.total_events == 1000  # sf0.001 events row count
    assert kpis.avg_daily_events == pytest.approx(
        kpis.total_events / len(kpis.daily_trend), abs=0.01
    )
    assert 0 < kpis.data_quality_score <= 100.0
    shares = sum(r["pct"] for r in kpis.category_shares)
    assert shares == pytest.approx(100.0, abs=0.1)
    assert len(kpis.top_groups) == 10


def test_render_text_and_json(tmp_path, kpis):
    txt = render_text(kpis, os.path.join(str(tmp_path), "report.txt"))
    body = open(txt).read()
    assert "ANALYTICS INTELLIGENCE REPORT" in body
    assert "Page 2: Trends" in body
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
