"""Static driver-contract guards — no Spark session needed.

The driver compares every queries() entry against oracle_sql() by
column NAME and value hash; a query registered without an oracle (or
vice versa) silently downgrades to a rows-only check, and a dangling
callable would crash the driver run.  Pin the registry invariants here
so a refactor can't drift them."""

from __future__ import annotations


def test_every_query_has_an_oracle_and_vice_versa():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(q) == set(o), (
        f"query/oracle drift: only-in-queries={sorted(set(q) - set(o))}, "
        f"only-in-oracles={sorted(set(o) - set(q))}"
    )
    assert len(q) >= 86
    for name, fn in q.items():
        assert callable(fn), name
        assert isinstance(o[name], str) and o[name].strip(), name


def test_oracle_sql_parses_under_duckdb():
    """Every oracle must at least PREPARE against empty tables of the
    driver schema — catches SQL typos without running Spark."""
    import duckdb

    import __spark_entry__ as e

    TABLES = [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]
    con = duckdb.connect()
    for t in TABLES:
        # LIMIT 0 reads parquet FOOTERS only — the real driver schema,
        # zero data, no Spark
        con.execute(
            f"CREATE TABLE {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet') LIMIT 0"
        )
    for name, sql in e.oracle_sql().items():
        try:
            con.execute(sql)
        except Exception as exc:  # pragma: no cover - assertion carrier
            raise AssertionError(f"oracle {name} failed: {exc}") from exc
