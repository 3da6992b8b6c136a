"""Smoke: entry() runs, flagship query has sane shape, lake reader
normalizes nano timestamps."""

from pyspark.sql import types as T

import __spark_entry__ as entry_mod
from open_bus_stride_etl_spark.sources.lake import load_table


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "orderkey" in df.columns and "region_name" in df.columns


def test_nano_timestamps_become_timestamps(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    row = ev.orderBy("event_id").first()
    assert row["ts"].year >= 2024


def test_queries_and_oracles_aligned():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 5


def test_query_and_oracle_column_names_match(spark, sf_dir):
    """The driver's value-hash sorts columns BY NAME before comparing, so
    a Spark result aliased differently from its oracle SQL hash-mismatches
    even with identical values. Guard the contract suite-side: for every
    query, the Spark schema's sorted column names must equal the DuckDB
    oracle's. Schemas only — nothing executes on the Spark side."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    mismatches = []
    for name, fn in entry_mod.queries().items():
        sql = entry_mod.oracle_sql().get(name)
        if sql is None:
            continue
        spark_cols = sorted(fn(spark, sf_dir).columns)
        duck_cols = sorted(r[0] for r in con.execute(f"DESCRIBE {sql}").fetchall())
        if spark_cols != duck_cols:
            mismatches.append((name, spark_cols, duck_cols))
    assert not mismatches, mismatches


def test_substantive_queries_fit_driver_window():
    """The external verifier checks only the FIRST registry.DRIVER_WINDOW
    registered queries. Every demoted (trivial-variant) query must sit in
    the tail, and everything substantive must fit inside the window —
    adding a query without demoting one fails here, not silently at
    verification time."""
    import __spark_entry__ as entry_mod
    from open_bus_stride_etl_spark.plans import registry

    names = list(entry_mod.queries())
    window = names[: registry.DRIVER_WINDOW]
    spilled = [n for n in window if n in registry._DEMOTE_LAST]
    overflow = [n for n in names[registry.DRIVER_WINDOW:] if n not in registry._DEMOTE_LAST]
    assert not overflow, (
        f"substantive queries past position {registry.DRIVER_WINDOW} "
        f"(driver-unverified): {overflow} — demote a redundant variant instead"
    )
    assert spilled == [], f"demoted queries inside the window: {spilled}"


def test_tail_coverage_ledger_is_complete():
    """Every demoted query must carry a COVERED_BY row naming the
    in-window query that redundantly exercises its operator family, and
    that covering query must actually be inside the driver window — the
    rotation ledger stays auditable instead of comment-archaeology."""
    import __spark_entry__ as entry_mod
    from open_bus_stride_etl_spark.plans import registry

    window = set(list(entry_mod.queries())[: registry.DRIVER_WINDOW])
    unmapped = [n for n in registry._DEMOTE_LAST if n not in registry.COVERED_BY]
    assert unmapped == [], f"tail queries without a coverage row: {unmapped}"
    bad_cover = {
        n: c for n, c in registry.COVERED_BY.items() if c not in window
    }
    assert bad_cover == {}, (
        f"coverage rows pointing outside the driver window: {bad_cover}"
    )


def test_bench_summary_line_under_400b():
    """The driver's tail capture truncated an 80-query single-line JSON
    in round 3 — bench.py's contract since then is that the FINAL line
    stays well under the capture window. Serialize the summary payload
    at worst-case field widths (every headline query 4-digit seconds,
    5-digit total, contended canary readings) and pin the byte bound so
    a field addition that would silently re-break the driver's capture
    fails here instead."""
    import json

    import bench

    worst_timings = {n: 9999.999 for n in bench.HEADLINE}
    payload = bench.summary_payload(
        total=99999.999,
        sf=100.0,
        n_queries=99,
        headline_timings=worst_timings,
        # canary readings CAN exceed 100 s under real contention (r7 saw
        # 27.88 s on an idle-box stretch; model a decade of slack) — the
        # modeled widths must be at least as wide as any real artifact
        canary={"pre": 999.99, "post": 999.99, "fast_ref": 4.6, "clean": False},
    )
    line = json.dumps(payload, separators=(",", ":"))
    assert len(line.encode()) < 400, f"{len(line.encode())} bytes: {line}"
    # additions-only contract: the five pre-r10 summary keys must never
    # leave the map (PERF's round-over-round common set), and the two
    # r10 scaling-probe rows must stay (VERDICT r9 #3)
    assert set(bench.HEADLINE) >= {
        "flat_export",
        "pricing_summary",
        "first_last_durations",
        "time_window_halfopen",
        "customers_with_open_orders",
        "stride_dag_convergence",
        "package_hourly_loop_invariance",
    }
    # contract fields all present on the summary line
    assert {"metric", "value", "unit", "sf", "n_queries", "queries", "canary"} <= set(payload)
