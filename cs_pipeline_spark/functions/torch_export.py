"""Torch-facing batch export for windowed inference samples.

The reference's ``ERA5Dataset.__getitem__``
(`inference/carboninference/core.py:98-120`) hands the model, per
(t, y, x) sample:

- ``pred_tensor``  — shape ``(n_vars, window_size)`` float32,
- ``igbp_tensor``  — shape ``(window_size,)`` (static label repeated),
- ``aux_tensor``   — shape ``(n_aux, window_size)`` time features,
- the window's timestamps and the variable-name lists.

``ml_sample_assembly`` (operators/windows.py) already hash-verifies
the assembly *semantics*; this module closes the tensor HANDOFF: the
assembled samples leave Spark as Arrow record batches and arrive as
numpy arrays with exactly those shapes, ready for
``torch.from_numpy`` / a DataLoader's ``collate_fn``. Torch itself is
optional — ``to_torch`` gates on the import; everything else is
numpy/Arrow only.

Scale: window assembly is the usual one-shuffle per-cell window; the
export path streams Arrow batches (``toArrow().to_batches`` locally;
swap in ``toLocalIterator``/``mapInArrow`` feeding a rank-local
DataLoader for multi-node training — the DataFrame side is identical).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cs_pipeline_spark.functions.era5_fixture import era5_events
from cs_pipeline_spark.operators.windows import WINDOW_SIZE, _igbp_grid

DEFAULT_PREDICTORS = ("t2m", "d2m", "sp", "tp")
AUX_FEATURES = ("doy", "tod")


def sample_tensor_df(
    spark: SparkSession,
    sf_dir: str,
    predictors: tuple[str, ...] = DEFAULT_PREDICTORS,
) -> DataFrame:
    """One row per complete (cell, t) sample with ARRAY columns holding
    the window slices: ``w_<var>`` (window_size floats, time-ascending),
    ``w_ts`` (epoch-us timestamps), ``igbp_code``, and ``w_<aux>``.

    The per-cell window is the single shuffle; the IGBP label joins
    broadcast from the static grid via the same nearest-snap
    ``ml_sample_assembly`` uses (reference core.py:61-71).
    """
    from cs_pipeline_spark.operators.joins import join_nearest_coord

    df = era5_events(spark, sf_dir)
    igbp = _igbp_grid(spark)
    snapped = join_nearest_coord(
        join_nearest_coord(
            df, igbp.select("ilat"), "latitude", "ilat", "snap_lat"
        ),
        igbp.select("ilon"),
        "longitude",
        "ilon",
        "snap_lon",
    ).join(
        F.broadcast(igbp),
        (F.col("snap_lat") == F.col("ilat"))
        & (F.col("snap_lon") == F.col("ilon")),
        "left",
    )
    w = (
        Window.partitionBy("latitude", "longitude")
        .orderBy("event_id")
        .rowsBetween(-(WINDOW_SIZE - 1), Window.currentRow)
    )
    aux_exprs = {
        "doy": F.dayofyear("valid_time").cast("float"),
        "tod": F.hour("valid_time").cast("float"),
    }
    out = snapped.select(
        "event_id",
        "latitude",
        "longitude",
        F.col("igbp_code").cast("float").alias("igbp_code"),
        F.collect_list(F.unix_micros("valid_time")).over(w).alias("w_ts"),
        *[
            F.collect_list(F.col(v).cast("float")).over(w).alias(f"w_{v}")
            for v in predictors
        ],
        *[
            F.collect_list(aux_exprs[a]).over(w).alias(f"w_{a}")
            for a in AUX_FEATURES
        ],
    )
    return out.filter(F.size("w_ts") == WINDOW_SIZE)


def batch_iterator(
    df: DataFrame,
    predictors: tuple[str, ...] = DEFAULT_PREDICTORS,
    batch_size: int = 64,
) -> Iterator[dict]:
    """Arrow-batched export: yields dicts of numpy arrays per batch —

    - ``pred``: float32 ``(B, n_vars, window_size)`` (the reference's
      ``da.to_array()`` orientation, core.py:106),
    - ``igbp``: float32 ``(B, window_size)`` (label repeated across the
      window, core.py:110-111),
    - ``aux``:  float32 ``(B, n_aux, window_size)`` (core.py:114-117),
    - ``timestamps``: int64 epoch-us ``(B, window_size)``,
    - ``event_id``: int64 ``(B,)``.
    """
    table = df.toArrow()
    for rb in table.to_batches(max_chunksize=batch_size):
        d = rb.to_pydict()
        n = rb.num_rows
        pred = np.stack(
            [
                np.array(d[f"w_{v}"], dtype=np.float32)
                for v in predictors
            ],
            axis=1,
        )  # (B, n_vars, ws)
        igbp = np.repeat(
            np.array(d["igbp_code"], dtype=np.float32)[:, None],
            WINDOW_SIZE,
            axis=1,
        )
        aux = np.stack(
            [
                np.array(d[f"w_{a}"], dtype=np.float32)
                for a in AUX_FEATURES
            ],
            axis=1,
        )
        yield {
            "pred": pred,
            "igbp": igbp,
            "aux": aux,
            "timestamps": np.array(d["w_ts"], dtype=np.int64),
            "event_id": np.array(d["event_id"], dtype=np.int64),
            "predictors": list(predictors),
            "aux_names": list(AUX_FEATURES),
            "n": n,
        }


def to_torch(batch: dict):
    """Convert an exported numpy batch to torch tensors (float32 for
    features, matching ``tr.tensor(...).float()`` in the reference).
    Gated on torch availability — the numpy contract above is complete
    without it."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch absent in CI
        raise ImportError(
            "torch is not installed; consume the numpy batches directly "
            "or install torch for tensor handoff"
        ) from e
    return {
        "pred": torch.from_numpy(batch["pred"]).float(),
        "igbp": torch.from_numpy(batch["igbp"]).float(),
        "aux": torch.from_numpy(batch["aux"]).float(),
        "timestamps": torch.from_numpy(batch["timestamps"]),
    }
