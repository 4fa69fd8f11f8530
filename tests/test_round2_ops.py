"""Round-2 wave: volume anomaly, diurnal profile, bipartite
projection, nearest-centroid classification."""

from __future__ import annotations

import pyspark.sql.functions as F

from cs_pipeline_spark.operators.aggregate import agg_seasonal_hod
from cs_pipeline_spark.operators.graph import graph_bipartite_project
from cs_pipeline_spark.operators.similarity import emb_centroid_classify
from cs_pipeline_spark.operators.filters import dq_volume_anomaly


def test_volume_anomaly_flags_are_z_consistent(spark, sf_dir):
    rows = dq_volume_anomaly(spark, sf_dir).collect()
    assert rows, "no daily volume rows"
    for r in rows:
        assert r.n_events > 0
        if r.z6 is None:
            # undefined baseline ⇒ never flagged
            assert r.is_anomaly is False
        else:
            # flag must agree with the reported (quantized) z-score:
            # quantization moves z by <1e-6, never across the 2.0 line
            # except within that epsilon of it
            assert r.is_anomaly == (abs(r.z6) > 2.0) or abs(abs(r.z6) - 2.0) < 1e-5


def test_volume_anomaly_first_days_have_no_baseline(spark, sf_dir):
    df = dq_volume_anomaly(spark, sf_dir)
    first = (
        df.groupBy("event_type")
        .agg(F.min("day").alias("d0"))
        .join(df, on=["event_type"])
        .filter(F.col("day") == F.col("d0"))
    )
    assert all(r.z6 is None for r in first.collect())


def test_seasonal_hod_shares_and_peak(spark, sf_dir):
    rows = agg_seasonal_hod(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.hod <= 23
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        assert abs(sum(r.share for r in rs) - 1.0) < 1e-9, t
        peaks = [r for r in rs if r.is_peak_hour]
        assert len(peaks) == 1, t
        assert peaks[0].n_events == max(r.n_events for r in rs), t


def test_bipartite_projection_bounds(spark, sf_dir):
    rows = graph_bipartite_project(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.source_a < r.source_b
        assert r.common_langs >= 1
        assert 0.0 < r.lang_jaccard <= 1.0


def test_centroid_classify_is_total_and_diagonal_heavy(spark, sf_dir):
    rows = emb_centroid_classify(spark, sf_dir).collect()
    assert rows
    from cs_pipeline_spark.tables import load

    n_vec = load(spark, "embeddings", sf_dir).count()
    assert sum(r.n_vecs for r in rows) == n_vec  # every vector classified
    diag = sum(r.n_vecs for r in rows if r.true_label == r.pred_label)
    # labels in the synthetic corpus correlate with embedding clusters:
    # the classifier must beat uniform-random assignment by a wide margin
    n_labels = len({r.true_label for r in rows})
    assert diag / n_vec > 1.5 / n_labels


def test_referential_audit_finds_real_orphans(spark, sf_dir):
    from cs_pipeline_spark.operators.filters import dq_referential

    rows = {r.rule: r for r in dq_referential(spark, sf_dir).collect()}
    # TPC-H integrity holds
    assert rows["lineitem.l_orderkey->orders"].n_orphans == 0
    assert rows["orders.o_custkey->customer"].n_orphans == 0
    # the deliberately-broken rule must trip
    assert rows["lineitem.l_partkey->supplier"].n_orphans > 0
    for r in rows.values():
        assert 0 <= r.n_orphans <= r.n_rows


def test_uniqueness_audit(spark, sf_dir):
    from cs_pipeline_spark.operators.filters import dq_uniqueness

    rows = {r.rule: r for r in dq_uniqueness(spark, sf_dir).collect()}
    for rid in ("documents.doc_id", "embeddings.vec_id", "events.event_id"):
        assert rows[rid].n_excess == 0, rid
    # title-prefix natural key collides by construction
    assert rows["documents.title_prefix"].n_excess > 0


def test_sliding_distinct_invariants(spark, sf_dir):
    from cs_pipeline_spark.operators.windows import win_sliding_distinct

    rows = win_sliding_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.dau <= r.wau7  # DAU can never exceed WAU
        assert 0.0 < r.stickiness <= 1.0


def test_emb_outlier_flags(spark, sf_dir):
    from cs_pipeline_spark.operators.similarity import emb_outlier_distance
    from cs_pipeline_spark.tables import load

    rows = emb_outlier_distance(spark, sf_dir).collect()
    n_vec = load(spark, "embeddings", sf_dir).count()
    assert len(rows) == n_vec  # audit is total
    flagged = [r for r in rows if r.is_outlier]
    # one-sided z>2 on roughly-normal distances: a few percent flagged,
    # never none, never a majority
    assert 0 < len(flagged) < n_vec / 4
    for r in rows:
        assert r.d2 >= 0
        if r.is_outlier:
            assert r.z6 > 2.0 - 1e-5


def test_quantiles_cont_brackets_disc(spark, sf_dir):
    from cs_pipeline_spark.operators.aggregate import (
        agg_quantiles_cont,
        agg_quantiles_disc,
    )

    cont = {r.event_type: r for r in agg_quantiles_cont(spark, sf_dir).collect()}
    disc = {r.event_type: r for r in agg_quantiles_disc(spark, sf_dir).collect()}
    for t, c in cont.items():
        # interpolated p50 sits within the discrete p25..p75 band
        assert disc[t].p25 <= c.p50_cont <= disc[t].p75
        assert c.p50_cont <= c.p90_cont


def test_train_assembly_funnel_monotone(spark, sf_dir):
    from cs_pipeline_spark.operators.training import train_assembly_e2e

    rows = {r.stage: r for r in train_assembly_e2e(spark, sf_dir).collect()}
    assert set(rows) == {"train_docs", "embedded", "chunks", "packed_bins", "batches"}
    # joins/filters only shrink; chunking only grows
    assert rows["embedded"].n_rows <= rows["train_docs"].n_rows
    assert rows["chunks"].n_rows >= rows["embedded"].n_rows
    assert rows["batches"].n_rows <= rows["packed_bins"].n_rows
    # token mass is preserved through the embed join report
    assert rows["embedded"].metric <= rows["train_docs"].metric
    # bins can only be filled up to the budget
    assert 0.0 < rows["packed_bins"].metric <= 1.0


def test_ts_regularize_spine_complete(spark, sf_dir):
    from cs_pipeline_spark.operators.windows import ts_regularize
    import pyspark.sql.functions as F

    df = ts_regularize(spark, sf_dir)
    # complete grid: every cell carries the identical number of hours
    per_cell = df.groupBy("latitude", "longitude").count()
    counts = {r["count"] for r in per_cell.collect()}
    assert len(counts) == 1
    # some gaps were filled, and filled rows carry the previous value
    assert df.filter("is_filled").count() > 0
    # after the first observation of a cell, no nulls remain
    n_null_tail = df.filter(
        F.col("t2m_filled").isNull() & ~F.col("is_filled")
    ).count()
    assert n_null_tail == 0


def test_zonal_stats_bounds(spark, sf_dir):
    from cs_pipeline_spark.operators.spatial import agg_zonal_stats

    rows = agg_zonal_stats(spark, sf_dir).collect()
    assert rows  # the fixture grid overlaps the polygons
    for r in rows:
        assert r.n_cells >= 1
        assert r.n_obs >= r.n_cells
        assert r.t2m_min <= r.t2m_mean <= r.t2m_max


def test_rolling_corr_in_range(spark, sf_dir):
    from cs_pipeline_spark.operators.windows import win_rolling_corr

    rows = win_rolling_corr(spark, sf_dir).collect()
    vals = [r.corr6 for r in rows if r.corr6 is not None]
    assert vals
    assert all(-1.0 - 1e-6 <= v <= 1.0 + 1e-6 for v in vals)


def test_bilinear_within_corner_envelope(spark, sf_dir):
    from cs_pipeline_spark.operators.spatial import f_regrid_bilinear

    rows = f_regrid_bilinear(spark, sf_dir).collect()
    # every station is interior to the fixture raster; the truncating-
    # division anchor bug dropped 3 of 25 (regression guard)
    assert len(rows) == 25
    # interpolation is a convex combination: result within raster range
    from cs_pipeline_spark.functions.era5_fixture import era5_events
    import pyspark.sql.functions as F

    mm = (
        era5_events(spark, sf_dir)
        .agg(F.min("t2m").alias("lo"), F.max("t2m").alias("hi"))
        .collect()[0]
    )
    for r in rows:
        assert mm.lo - 1e-6 <= r.t2m_bilinear <= mm.hi + 1e-6


def test_entropy_bounds(spark, sf_dir):
    import math

    from cs_pipeline_spark.operators.aggregate import agg_entropy

    rows = agg_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r.lang_entropy_bits <= math.log2(max(r.n_langs, 2)) + 1e-6


def test_hampel_flags_are_integer_consistent(spark, sf_dir):
    from cs_pipeline_spark.operators.windows import win_hampel_despike

    rows = win_hampel_despike(spark, sf_dir).collect()
    assert rows
    n_spike = sum(1 for r in rows if r.is_spike)
    # despiking flags a small minority, never none on noisy data
    assert 0 < n_spike < len(rows) / 4
    for r in rows:
        if r.is_spike:
            assert abs(r.value6 - r.roll_median) > 3 * r.roll_mad - 1e-9


def test_volume_anomaly_dead_feed_and_flat_baseline(spark, tmp_path):
    """A fully dead day must appear (zero-filled spine) and flag; a
    deviation off a zero-variance baseline must flag despite z being
    undefined."""
    import datetime as dt

    from cs_pipeline_spark.operators.filters import dq_volume_anomaly

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for day in range(16):
        if day == 10:
            continue  # feed dead on day 10
        n = 1440 if day == 12 else 144  # constant feed, 10x spike day 12
        for i in range(n):
            rows.append(
                (eid, base + dt.timedelta(days=day, seconds=i), 1, "steady", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    sf = str(tmp_path / "synth")
    df.write.parquet(f"{sf}/events.parquet")
    out = {r.day.date(): r for r in dq_volume_anomaly(spark, sf).collect()}
    dead = out[dt.date(2024, 1, 11)]
    assert dead.n_events == 0 and dead.is_anomaly  # dead feed flagged
    spike = out[dt.date(2024, 1, 13)]
    assert spike.n_events == 1440 and spike.is_anomaly
    # flat-baseline days with the expected count stay quiet
    quiet = out[dt.date(2024, 1, 9)]
    assert quiet.n_events == 144 and not quiet.is_anomaly


def test_jackknife_ci_contains_theta(spark, sf_dir):
    from cs_pipeline_spark.operators.aggregate import agg_jackknife_ci

    rows = agg_jackknife_ci(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.jk_se >= 0
        assert r.ci_lo <= r.theta <= r.ci_hi
        # SE of a mean over n samples shrinks like 1/sqrt(n): sanity cap
        assert r.jk_se < 100
