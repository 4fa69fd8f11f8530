"""Shape/content parity of the torch-facing batch export
(functions/torch_export.py) against the reference ERA5Dataset
__getitem__ contract (inference/carboninference/core.py:98-120)."""

import numpy as np
import pytest

from cs_pipeline_spark.functions.torch_export import (
    AUX_FEATURES,
    DEFAULT_PREDICTORS,
    batch_iterator,
    sample_tensor_df,
    to_torch,
)
from cs_pipeline_spark.operators.windows import WINDOW_SIZE


def test_batch_shapes_and_content(spark, sf_dir):
    df = sample_tensor_df(spark, sf_dir)
    batches = list(batch_iterator(df, batch_size=32))
    assert batches, "no full windows produced"
    total = sum(b["n"] for b in batches)
    assert total == df.count()
    nv, na = len(DEFAULT_PREDICTORS), len(AUX_FEATURES)
    for b in batches:
        assert b["pred"].shape == (b["n"], nv, WINDOW_SIZE)
        assert b["pred"].dtype == np.float32
        assert b["igbp"].shape == (b["n"], WINDOW_SIZE)
        # static label repeated across the window: constant per row
        assert (b["igbp"] == b["igbp"][:, :1]).all()
        assert b["aux"].shape == (b["n"], na, WINDOW_SIZE)
        assert b["timestamps"].shape == (b["n"], WINDOW_SIZE)
        assert b["predictors"] == list(DEFAULT_PREDICTORS)

    # content parity: recompute one sample's window from the frame
    from cs_pipeline_spark.functions.era5_fixture import era5_events

    rows = era5_events(spark, sf_dir).select(
        "event_id", "latitude", "longitude", *DEFAULT_PREDICTORS
    ).collect()
    by_cell = {}
    for r in sorted(rows, key=lambda r: r.event_id):
        by_cell.setdefault((r.latitude, r.longitude), []).append(r)
    b0 = batches[0]
    eid = int(b0["event_id"][0])
    target = next(r for r in rows if r.event_id == eid)
    series = by_cell[(target.latitude, target.longitude)]
    idx = next(i for i, r in enumerate(series) if r.event_id == eid)
    window = series[idx - WINDOW_SIZE + 1 : idx + 1]
    assert len(window) == WINDOW_SIZE
    for j, v in enumerate(DEFAULT_PREDICTORS):
        expect = np.array([getattr(r, v) for r in window], dtype=np.float32)
        assert (b0["pred"][0, j, :] == expect).all()


def test_to_torch_gated(spark, sf_dir):
    df = sample_tensor_df(spark, sf_dir)
    batch = next(batch_iterator(df, batch_size=8))
    try:
        import torch  # noqa: F401

        t = to_torch(batch)
        assert tuple(t["pred"].shape) == batch["pred"].shape
    except ImportError:
        with pytest.raises(ImportError):
            to_torch(batch)
