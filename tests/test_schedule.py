"""Cron schedule semantics (ecom.schedule): Vixie-cron field parsing, the
DOM/DOW OR quirk, Airflow data-interval + catchup behavior, and the
restart-safe Scheduler high-water mark. Pure datetime logic — only the final
end-to-end test touches Spark."""

from __future__ import annotations

import datetime as dt

import pytest

from ecom_snowflake_duckdb_migration_spark.ecom import orchestrate
from ecom_snowflake_duckdb_migration_spark.ecom.schedule import (
    Scheduler,
    due_intervals,
    next_fire,
    parse_cron,
    prev_fire,
)

D = dt.datetime


def test_parse_fields_and_aliases():
    s = parse_cron("@daily")
    assert (s.minutes, s.hours) == (frozenset({0}), frozenset({0}))
    assert not s.dom_restricted and not s.dow_restricted
    assert parse_cron("*/15 * * * *").minutes == frozenset({0, 15, 30, 45})
    assert parse_cron("30 4 1,15 * *").dom == frozenset({1, 15})
    assert parse_cron("0 0 * * 7").dow == frozenset({0})  # Sunday as 7
    assert parse_cron("0 0 * * 5-7").dow == frozenset({5, 6, 0})
    assert parse_cron("0 8-18/4 * * *").hours == frozenset({8, 12, 16})
    assert parse_cron("5/20 * * * *").minutes == frozenset({5, 25, 45})
    with pytest.raises(ValueError):
        parse_cron("0 0 * *")  # 4 fields
    with pytest.raises(ValueError):
        parse_cron("61 * * * *")


def test_next_fire_boundaries():
    daily = parse_cron("0 0 * * *")  # gen_latest_synth_dag.py:26
    assert next_fire(daily, D(2026, 1, 31, 23, 59)) == D(2026, 2, 1)
    assert next_fire(daily, D(2026, 2, 1)) == D(2026, 2, 2)  # strictly after
    feb29 = parse_cron("0 0 29 2 *")
    assert next_fire(feb29, D(2026, 1, 1)) == D(2028, 2, 29)  # leap-year skip
    assert prev_fire(feb29, D(2026, 1, 1)) == D(2024, 2, 29)
    monthly = parse_cron("@monthly")
    assert next_fire(monthly, D(2025, 12, 1)) == D(2026, 1, 1)


def test_dom_dow_or_quirk():
    """Restricted DOM *and* DOW fire on the union of both (Vixie/Airflow)."""
    s = parse_cron("0 0 13 * 5")
    assert s.day_matches(dt.date(2026, 2, 13))  # Friday the 13th: both match
    assert s.day_matches(dt.date(2026, 1, 13))  # Tuesday the 13th: DOM only
    assert s.day_matches(dt.date(2026, 2, 6))  # a Friday, not the 13th: DOW only
    assert not s.day_matches(dt.date(2026, 2, 12))  # Thursday the 12th
    # restricted-DOM-only and restricted-DOW-only stay AND-with-wildcard
    assert not parse_cron("0 0 13 * *").day_matches(dt.date(2026, 2, 6))
    assert not parse_cron("0 0 * * 5").day_matches(dt.date(2026, 2, 12))


def test_due_intervals_airflow_semantics():
    daily = parse_cron("@daily")
    start = D(2026, 1, 1)
    now = D(2026, 1, 5, 12, 0)
    # interval [Jan4, Jan5) fired at Jan5 00:00 <= now; [Jan5, Jan6) has not
    assert due_intervals(daily, start, now, catchup=True) == [
        D(2026, 1, 1), D(2026, 1, 2), D(2026, 1, 3), D(2026, 1, 4),
    ]
    assert due_intervals(daily, start, now, catchup=False) == [D(2026, 1, 4)]
    assert due_intervals(
        daily, start, now, last_execution=D(2026, 1, 2), catchup=True
    ) == [D(2026, 1, 3), D(2026, 1, 4)]
    # nothing due before the first interval completes
    assert due_intervals(daily, start, D(2026, 1, 1, 23, 59), catchup=True) == []


def test_scheduler_high_water_and_crash_resume(tmp_path, monkeypatch):
    root = str(tmp_path / "wh")
    ran: list[dt.date] = []
    fail_on: set[dt.date] = {dt.date(2026, 1, 3)}

    def fake_run(spark, warehouse_dir, day=None, **kw):
        if day in fail_on:
            raise RuntimeError("boom")
        ran.append(day)
        return day

    monkeypatch.setattr(orchestrate, "scheduled_run", fake_run)
    s = Scheduler(root, "@daily", start_date=D(2026, 1, 1), catchup=True)
    with pytest.raises(RuntimeError):
        s.run_pending(None, now=D(2026, 1, 5, 6, 0))
    # Jan 1 and 2 completed and were recorded; the crash left Jan 3 pending
    assert ran == [dt.date(2026, 1, 1), dt.date(2026, 1, 2)]
    assert s.last_execution() == D(2026, 1, 2)
    fail_on.clear()
    out = s.run_pending(None, now=D(2026, 1, 5, 6, 0))
    assert ran[2:] == [dt.date(2026, 1, 3), dt.date(2026, 1, 4)] and len(out) == 2
    # fully caught up -> no-op
    assert s.run_pending(None, now=D(2026, 1, 5, 6, 0)) == []
    # a fresh Scheduler instance resumes from the persisted mark
    s2 = Scheduler(root, "@daily", start_date=D(2026, 1, 1), catchup=True)
    assert s2.last_execution() == D(2026, 1, 4)
    assert s2.pending(now=D(2026, 1, 6, 0, 0)) == [D(2026, 1, 5)]


def test_scheduler_catchup_false_collapses_backlog(tmp_path, monkeypatch):
    ran = []
    monkeypatch.setattr(
        orchestrate, "scheduled_run",
        lambda spark, wd, day=None, **kw: ran.append(day) or day,
    )
    s = Scheduler(str(tmp_path / "wh"), "@daily", start_date=D(2026, 1, 1), catchup=False)
    s.run_pending(None, now=D(2026, 1, 10, 3, 0))
    assert ran == [dt.date(2026, 1, 9)]  # only the latest complete interval


def test_scheduler_end_to_end_daily_run(spark, tmp_path_factory):
    """One real due interval drives the full generate->ingest->transform->
    test pipeline with the reference DAG's schedule and execution-date
    semantics (day = interval start)."""
    root = str(tmp_path_factory.mktemp("sched_wh"))
    s = Scheduler(
        root, "0 0 * * *", start_date=D(2026, 1, 15), catchup=False, n_customers=40
    )
    results = s.run_pending(spark, now=D(2026, 1, 16, 0, 30))
    assert [r.day for r in results] == [dt.date(2026, 1, 15)]
    assert results[0].raw_counts["customers"] > 0
    assert not results[0].quality_errors
    assert s.pending(now=D(2026, 1, 16, 12, 0)) == []


def test_cron_fire_properties():
    """Property sweep: next_fire is strictly increasing and minimal;
    prev_fire(next_fire(t)) == next_fire(t); every fire matches the
    schedule's own field sets."""
    from hypothesis import given, settings, strategies as st

    exprs = st.sampled_from(
        ["0 0 * * *", "*/15 * * * *", "30 4 1,15 * *", "0 8-18/4 * * 1-5",
         "@weekly", "@monthly", "0 12 13 * 5"]
    )
    times = st.datetimes(
        min_value=D(2025, 1, 1), max_value=D(2027, 1, 1)
    ).map(lambda t: t.replace(second=0, microsecond=0))

    @settings(max_examples=200, deadline=None)
    @given(expr=exprs, t=times)
    def check(expr, t):
        s = parse_cron(expr)
        nxt = next_fire(s, t)
        assert nxt > t
        assert prev_fire(s, nxt) == nxt  # a fire time is its own prev
        assert next_fire(s, nxt) > nxt  # strictly increasing
        # minimality: no fire strictly between t and nxt
        assert prev_fire(s, nxt - dt.timedelta(minutes=1)) <= t
        assert nxt.minute in s.minutes and nxt.hour in s.hours
        assert s.day_matches(nxt.date())

    check()
