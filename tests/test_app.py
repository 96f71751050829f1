"""Dashboard shell (app.py — the reference's Streamlit surfaces,
src/app/main.py:219-487, as a text CLI over the serving projections)."""

from __future__ import annotations

import io

from market_analyze_data_stream_processing_spark.app import (
    ascii_chart,
    fmt_table,
    render_market_watch,
    run_dashboard,
)

SF = "/root/testdata/sf0.001"


def test_fmt_table_aligns_columns():
    out = fmt_table(["a", "long_header"], [["x", 1], ["yyyy", 22]])
    lines = out.splitlines()
    assert lines[0].startswith("a     long_header")
    assert set(lines[1]) == {"-", " "}
    assert len({line.index("l") for line in [lines[0]]}) == 1
    assert lines[2].startswith("x")


def test_ascii_chart_dimensions_markers_and_gaps():
    series = {
        "close": [1.0, 2.0, 3.0, 4.0, 5.0],
        "ma10": [None, None, 2.0, 3.0, 4.0],  # gated: leading gap stays a gap
    }
    out = ascii_chart(series, width=5, height=4)
    lines = out.splitlines()
    body = [ln for ln in lines if ln.startswith("|")]
    assert len(body) == 4  # requested height
    assert all(len(ln) <= 6 for ln in body)  # '|' + width
    assert any("*" in ln for ln in body)  # close marker
    assert any("." in ln for ln in body)  # ma overlay marker
    assert "* close" in lines[-1] and ". ma10" in lines[-1]
    # max/min labels frame the grid
    assert "5.00" in lines[0] and "1.00" in lines[-2]


def test_ascii_chart_empty_series():
    assert ascii_chart({"close": [None, None]}) == "(no data)"


def test_render_market_watch_arrows():
    rows = [
        dict(ticker="UP", price=10.0, delta_pct=1.5, currency="EUR",
             market_state="REGULAR", freshness="1m ago"),
        dict(ticker="DOWN", price=9.0, delta_pct=-2.0, currency="EUR",
             market_state="CLOSED", freshness="2h ago"),
        dict(ticker="FLAT", price=1.0, delta_pct=0.0, currency="EUR",
             market_state="REGULAR", freshness="9h ago"),
    ]
    out = render_market_watch(rows)
    assert "▲ +1.50%" in out and "▼ -2.00%" in out and "· +0.00%" in out


def test_dashboard_end_to_end_deterministic(spark):
    """Full shell over sf0.001: all three surfaces render, and the output
    is deterministic (fixed data ⇒ fixed 'now' ⇒ fixed freshness/scores)."""
    def render() -> str:
        buf = io.StringIO()
        run_dashboard(spark, SF, ask="what moved today?", out=buf)
        return buf.getvalue()

    one = render()
    assert "== MARKET WATCH ==" in one
    assert "EUR" in one and "ago" in one
    assert "sessions ==" in one and "* close" in one  # chart rendered
    assert "== RAG: what moved today? ==" in one
    assert "USER INTENT: REAL_TIME (Window: 24.0 hours)." in one
    assert "== SOURCES ==" in one
    # typed context blocks from the engine's formatter parity
    assert "[TECHNICAL ANALYSIS]" in one or "[MARKET HISTORY]" in one
    assert render() == one


def test_indicator_panel_renders_latest_snapshot(spark):
    """--indicators: latest-per-ticker RSI/%B/MACD/drawdown snapshot,
    deterministic and screen-sized."""
    import io

    from market_analyze_data_stream_processing_spark.app import run_dashboard

    buf = io.StringIO()
    run_dashboard(
        spark, "/root/testdata/sf0.001", ticker="click",
        indicators=True, out=buf,
    )
    text = buf.getvalue()
    assert "== INDICATORS ==" in text
    section = text.split("== INDICATORS ==")[1]
    lines = []
    for ln in section.splitlines():
        if ln.startswith("== "):  # next panel begins
            break
        if ln.strip():
            lines.append(ln)
    # header + separator + one row per ticker (5 event types)
    assert len(lines) == 7
    assert lines[0].split()[:3] == ["ticker", "close", "rsi14"]
    # drawdown column is a signed percentage; every data row has one
    assert all("%" in ln for ln in lines[2:])
    # deterministic across calls
    buf2 = io.StringIO()
    run_dashboard(
        spark, "/root/testdata/sf0.001", ticker="click",
        indicators=True, out=buf2,
    )
    assert buf2.getvalue() == text
