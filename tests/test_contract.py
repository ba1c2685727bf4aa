"""Driver-contract meta-tests: the queries()/oracle_sql() surface itself."""

import inspect

import __spark_entry__ as entrymod


def test_every_oracle_has_a_query():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # the oracle-checked majority: rows-only entries are the documented
    # exceptions (sketches, xxhash64-based, UDF-stage, streaming)
    assert len(oracles) >= 0.75 * len(qs)


def test_query_callables_have_driver_signature():
    for name, fn in entrymod.queries().items():
        params = inspect.signature(fn).parameters
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_oracle_sql_is_nonempty_text():
    for name, sql in entrymod.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_entry_uses_smallest_scale(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == [
        "user_id", "snapshot_ts", "value", "event_type",
    ]
