"""Scalar predictor formulas (SURVEY §2.3) as single-source templates.

The reference implements ~30 AmeriFlux predictors as vectorized numpy
functions (reference ``Processing/processing_utils.py:12-139``,
dispatcher ``Processing/processor.py:18-46``). Here each formula is ONE
SQL-syntax template, valid in both Spark SQL and DuckDB:

- Spark side: ``F.expr(template)`` — parses to the same Catalyst
  arithmetic AST that Column operators would build, so the whole
  pipeline stays inside WholeStageCodegen (no Python UDFs anywhere).
- Oracle side: the identical string is embedded in DuckDB SQL.

This single-sourcing guarantees the oracle computes the *same IEEE
expression tree*: +,-,*,/,% and SQRT/CASE are correctly rounded and
bit-identical across engines. EXP/ATAN2 are not correctly rounded
(≤1 ulp drift), so predictors using them (``TRANSCENDENTAL``) are
rounded to 6 dp at the correctness gate (engine output itself is
unrounded).

Deviation from reference (documented): wind speed uses
``SQRT(u*u+v*v)`` instead of ``np.hypot`` (reference
processing_utils.py:32-33) — identical to ≤1 ulp for ERA5-scale winds
and exactly reproducible in SQL, which hypot is not (DuckDB lacks it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cs_pipeline_spark.functions.constants import VARIABLES_FOR_PREDICTOR

# --- building blocks (SQL-syntax templates; {x} placeholders) ---


def _celsius(t: str) -> str:
    return f"({t} - 273.15)"


def _gamma(t_c: str) -> str:
    # Magnus coefficients a=17.625, b=243.04 (reference
    # processing_utils.py:41-50).
    return f"((17.625 * {t_c}) / (243.04 + {t_c}))"


def _rh(t2m: str, d2m: str) -> str:
    return f"(100.0 * EXP({_gamma(_celsius(d2m))} - {_gamma(_celsius(t2m))}))"


def _es_kpa(t_c: str) -> str:
    # Tetens with the reference's 0 °C branch (processing_utils.py:60-66).
    a = f"(CASE WHEN {t_c} >= 0 THEN 17.27 ELSE 21.875 END)"
    b = f"(CASE WHEN {t_c} >= 0 THEN 237.3 ELSE 265.5 END)"
    return f"(0.61078 * EXP({a} * {t_c} / ({t_c} + {b})))"


def _vpd_hpa(t2m: str, d2m: str) -> str:
    # es_kPa·(1−RH/100) → hPa (processing_utils.py:53-57).
    return f"(({_es_kpa(_celsius(t2m))} * (1.0 - {_rh(t2m, d2m)} / 100.0)) * 10.0)"


def _co2_wet(t2m: str, d2m: str, sp: str, xco2: str) -> str:
    # dry→wet CO₂ mole fraction (processing_utils.py:81-96).
    xh2o_wet = f"(({_rh(t2m, d2m)} / 100.0) * ({_es_kpa(_celsius(t2m))} * 1000.0) / {sp})"
    xh2o_dry = f"({xh2o_wet} / (1.0 - {xh2o_wet}))"
    n_tot = f"(0.7808 + 0.2095 + 0.0093 + {xco2} / 1000000.0 + {xh2o_dry})"
    return f"({xco2} / {n_tot})"


def _netrad(sw: str, lw: str, nlw: str, fal: str) -> str:
    # SW_IN + LW_IN − SW_OUT − LW_OUT (processing_utils.py:77-78).
    return f"({sw} + {lw} - ({sw} * {fal}) - ({nlw} - {lw}))"


# Predictor → (input shortname columns, SQL template over them).
# Input order mirrors VARIABLES_FOR_PREDICTOR (constants.py).
FORMULAS: dict[str, tuple[list[str], str]] = {
    "TA": (["t2m"], "({t2m} - 273.15)"),
    "P": (["tp"], "{tp}"),
    "RH": (["t2m", "d2m"], _rh("{t2m}", "{d2m}")),
    "VPD": (["t2m", "d2m"], _vpd_hpa("{t2m}", "{d2m}")),
    "PA": (["sp"], "({sp} / 1000.0)"),
    "CO2": (
        ["t2m", "d2m", "sp", "xco2"],
        _co2_wet("{t2m}", "{d2m}", "{sp}", "{xco2}"),
    ),
    "SW_IN": (["avg_sdswrf"], "{avg_sdswrf}"),
    "SW_IN_POT": (["avg_sdswrfcs"], "{avg_sdswrfcs}"),
    "SW_OUT": (["avg_sdswrf", "fal"], "({avg_sdswrf} * {fal})"),
    "LW_IN": (["avg_sdlwrf"], "{avg_sdlwrf}"),
    "LW_OUT": (["avg_sdlwrf", "avg_snlwrf"], "({avg_snlwrf} - {avg_sdlwrf})"),
    "NETRAD": (
        ["avg_sdswrf", "avg_sdlwrf", "avg_snlwrf", "fal"],
        _netrad("{avg_sdswrf}", "{avg_sdlwrf}", "{avg_snlwrf}", "{fal}"),
    ),
    "WS": (["u10", "v10"], "SQRT({u10} * {u10} + {v10} * {v10})"),
    "WD": (["u10", "v10"], "((DEGREES(ATAN2({u10}, {v10})) + 360.0) % 360.0)"),
    "USTAR": (["zust"], "{zust}"),
    "SWC_1": (["swvl1"], "({swvl1} * 100.0)"),
    "SWC_2": (["swvl1"], "({swvl1} * 100.0)"),
    "SWC_3": (["swvl2"], "({swvl2} * 100.0)"),
    "SWC_4": (["swvl2"], "({swvl2} * 100.0)"),
    "SWC_5": (["swvl3"], "({swvl3} * 100.0)"),
    "TS_1": (["stl1"], "({stl1} - 273.15)"),
    "TS_2": (["stl1"], "({stl1} - 273.15)"),
    "TS_3": (["stl2"], "({stl2} - 273.15)"),
    "TS_4": (["stl2"], "({stl2} - 273.15)"),
    "TS_5": (["stl3"], "({stl3} - 273.15)"),
    "G": (
        ["avg_ishf", "avg_slhtf", "avg_sdswrf", "avg_sdlwrf", "avg_snlwrf", "fal"],
        f"({_netrad('{avg_sdswrf}', '{avg_sdlwrf}', '{avg_snlwrf}', '{fal}')}"
        " - {avg_ishf} - {avg_slhtf})",
    ),
    "H": (["avg_ishf"], "{avg_ishf}"),
    "LE": (["avg_slhtf"], "{avg_slhtf}"),
    "PPFD_IN": (["avg_sdswrf"], "(1.741 * {avg_sdswrf} + 1.45)"),
    "PPFD_OUT": (["avg_sdswrf", "fal"], "(1.741 * {avg_sdswrf} * {fal} + 1.45)"),
    "WTD": (["wtd"], "{wtd}"),
}

# Predictors whose formula contains EXP/ATAN2 (≤1 ulp engine drift):
# round to 6 dp when hash-comparing.
TRANSCENDENTAL = {"RH", "VPD", "WD", "CO2"}

assert set(FORMULAS) == set(VARIABLES_FOR_PREDICTOR)


def predictor_sql(pred: str, cols: dict[str, str] | None = None) -> str:
    """SQL expression for a predictor; ``cols`` remaps input columns."""
    inputs, tpl = FORMULAS[pred]
    mapping = {c: (cols or {}).get(c, c) for c in inputs}
    return tpl.format(**mapping)


def predictor_col(pred: str, cols: dict[str, str] | None = None) -> Column:
    """The same expression as a Spark Column (native Catalyst AST)."""
    return F.expr(predictor_sql(pred, cols))


def derive_predictors(df, predictors: list[str] | None = None):
    """Dispatcher: add one column per predictor (reference
    processor.py:18-46 ``convert_ameriflux_to_era5``).

    Purely declarative — all 30 expressions land in a single Project
    node inside one WholeStageCodegen stage; Catalyst's common
    subexpression elimination dedups the shared RH/es subtrees.
    """
    preds = predictors or list(FORMULAS)
    return df.withColumns({p: predictor_col(p) for p in preds})
