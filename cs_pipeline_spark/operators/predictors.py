"""Queries for the scalar predictor surface (SURVEY §2.3).

Each query derives the ERA5-shaped frame from ``events`` (see
``functions/era5_fixture.py``) and applies predictor formulas from the
single-source template registry (``functions/physics.py``). The oracle
embeds the *same* template strings, so both engines evaluate the same
IEEE expression tree; transcendental-based predictors are rounded to
6 dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs_pipeline_spark.functions.era5_fixture import era5_events, era5_sql
from cs_pipeline_spark.functions.physics import (
    FORMULAS,
    TRANSCENDENTAL,
    predictor_col,
    predictor_sql,
)
from cs_pipeline_spark.registry import register


def predictors_frame(
    spark: SparkSession,
    sf_dir: str,
    preds: list[str],
    keys: tuple[str, ...] = ("latitude", "longitude", "valid_time"),
) -> DataFrame:
    """ERA5 fixture + derived predictor columns (transcendental-based
    predictors rounded to 6 dp for hash stability)."""
    df = era5_events(spark, sf_dir)
    cols = [F.col("event_id"), *[F.col(k) for k in keys]]
    for p in preds:
        c = predictor_col(p)
        if p in TRANSCENDENTAL:
            c = F.round(c, 6)
        cols.append(c.alias(p))
    return df.select(*cols)


def predictors_cte(
    preds: list[str], keys: tuple[str, ...] = ("latitude", "longitude", "valid_time")
) -> str:
    """Oracle CTE mirroring :func:`predictors_frame` (named ``preds``)."""
    exprs = ", ".join(
        (
            f"ROUND({predictor_sql(p)}, 6)"
            if p in TRANSCENDENTAL
            else predictor_sql(p)
        )
        + f" AS {p}"
        for p in preds
    )
    keycols = ", ".join(keys)
    return f"preds AS (SELECT event_id, {keycols}, {exprs} FROM era5)"


def _make(preds: list[str]):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = era5_events(spark, sf_dir)
        cols = [F.col("event_id")]
        for p in preds:
            c = predictor_col(p)
            if p in TRANSCENDENTAL:
                c = F.round(c, 6)
            cols.append(c.alias(p))
        return df.select(*cols)

    exprs = ", ".join(
        (
            f"ROUND({predictor_sql(p)}, 6)"
            if p in TRANSCENDENTAL
            else predictor_sql(p)
        )
        + f" AS {p}"
        for p in preds
    )
    sql = era5_sql(f"SELECT event_id, {exprs} FROM era5")
    return fn, sql


_GROUPS: dict[str, tuple[list[str], str]] = {
    "f_unit_conversions": (
        ["TA", "PA", "SWC_1", "SWC_3", "SWC_5", "TS_1", "TS_3", "TS_5"],
        "Kelvin→°C, Pa→kPa, fraction→% (reference processing_utils.py:12-29)",
    ),
    "f_wind": (["WS", "WD"], "wind speed/direction (processing_utils.py:32-38)"),
    "f_humidity": (
        ["RH", "VPD"],
        "Magnus RH + Tetens VPD (processing_utils.py:41-66)",
    ),
    "f_radiation": (
        ["SW_IN", "SW_IN_POT", "SW_OUT", "LW_IN", "LW_OUT", "NETRAD", "PPFD_IN", "PPFD_OUT"],
        "radiation budget + PPFD (processing_utils.py:69-78,104-111)",
    ),
    "f_co2_wet": (["CO2"], "dry→wet CO₂ mole fraction (processing_utils.py:81-96)"),
    "f_soil_heat_flux": (["G", "H", "LE"], "G = NETRAD−H−LE (processing_utils.py:99-101)"),
    "f_identity": (
        ["P", "USTAR", "WTD"],
        "identity passthrough predictors (processor.py:44-45)",
    ),
}

for _name, (_preds, _doc) in _GROUPS.items():
    _fn, _sql = _make(_preds)
    register(_name, _sql, doc=_doc)(_fn)

# The full dispatcher: every predictor at once (reference
# processor.py:18-46 convert_ameriflux_to_era5). All ~30 expressions
# compile into one Project inside a single WholeStageCodegen stage.
_fn_all, _sql_all = _make(list(FORMULAS))
register(
    "convert_predictors",
    _sql_all,
    doc="full predictor dispatcher — 30 derived columns in one projection",
)(_fn_all)
