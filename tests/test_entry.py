from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # flagship = end-to-end area process: region-tagged daily buckets
    # with AGG_SCHEMA columns incl. enrichment-fed CO2/WTD means
    for col in ("region_id", "bucket", "TA_mean", "CO2_mean", "WTD_mean"):
        assert col in df.columns


def test_registry_contract(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 6
    # every oracle key has a query
    assert set(oracles) <= set(qs)


def test_flagship_values(spark, sf_dir):
    from cs_pipeline_spark.operators.relational import pricing_summary

    row = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in pricing_summary(spark, sf_dir).collect()
    }
    # every group's avg_disc must lie in the generated discount range
    for r in row.values():
        assert 0.0 <= r["avg_disc"] <= 0.11
        assert r["count_order"] > 0
