"""Cross-engine portability probe for shared fold-coefficient literals.

Every EWMA/Wilder/adstock fold in this repo is a STRING shared verbatim
between the Spark query (``F.expr``/``aggregate``) and the DuckDB oracle
(``list_reduce``).  The fold is bit-identical across engines only if
every decimal literal inside it parses to the same IEEE-754 double in
both parsers.  Two hazards, both hit in past rounds:

* a literal DIVISION (``1.0 / 14.0``) types DECIMAL in Spark but DOUBLE
  in DuckDB (round-10 window_rsi red row);
* a 17-digit ``repr()`` literal whose digit-string numerator exceeds
  2^53 is double-rounded by DuckDB one ulp off the Python/Spark parse
  (round-11 window_keltner red row: ``repr(2/21)``).

The repo rule, asserted here: every literal in a shared fold string is
at most 15 significant digits (which round-trips exactly in any correct
IEEE-754 parser), and — belt-and-braces — ``duckdb.execute`` of the
literal bit-equals ``float()`` of it.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from concurrent_etl_go_spark.operators import finance, finance2, forecast
from concurrent_etl_go_spark.operators import timeseries2, timeseries3

#: every shared fold / coefficient string in the repo (module, name).
_FOLD_STRINGS = [
    ("finance", finance._FOLD12),
    ("finance", finance._FOLD26),
    ("finance", finance._FOLD9),
    ("finance", finance._FOLD_RSI),
    ("finance2", finance2._FOLD_ATR),
    ("finance2", finance2._FOLD_ADSTOCK),
    ("timeseries2", timeseries2._CR_FOLD),
    ("timeseries3", timeseries3._FOLD_E20),
    ("timeseries3", timeseries3._FOLD_A10),
    ("forecast", forecast._FOLD),
]

_DEC = re.compile(r"\d+\.\d+(?:[eE][-+]?\d+)?")


def _literals() -> list[tuple[str, str]]:
    out = []
    for mod, s in _FOLD_STRINGS:
        for lit in _DEC.findall(s):
            out.append((mod, lit))
    return sorted(set(out))


def test_folds_contain_no_division() -> None:
    # A '/' inside a shared fold string divides under DIFFERENT typing
    # rules on the two engines (Spark DECIMAL vs DuckDB DOUBLE).
    for mod, s in _FOLD_STRINGS:
        assert "/" not in s, f"{mod}: shared fold contains a division: {s}"


@pytest.mark.parametrize("mod,lit", _literals())
def test_literal_at_most_15_significant_digits(mod: str, lit: str) -> None:
    digits = re.sub(r"[eE][-+]?\d+$", "", lit).replace(".", "").lstrip("0")
    assert len(digits) <= 15, (
        f"{mod}: literal {lit} has {len(digits)} significant digits; "
        ">15 digits risks DuckDB double-rounding (numerator > 2^53)"
    )


@pytest.mark.parametrize("mod,lit", _literals())
def test_literal_parses_bit_equal_in_duckdb(mod: str, lit: str) -> None:
    py = float(lit)
    dk_cast = duckdb.execute(f"SELECT CAST({lit} AS DOUBLE)").fetchone()[0]
    dk_mul = duckdb.execute(f"SELECT {lit} * 1.0e0").fetchone()[0]
    assert dk_cast == py and dk_cast.hex() == py.hex(), (
        f"{mod}: DuckDB CAST({lit}) = {dk_cast.hex()} != Python "
        f"{py.hex()}"
    )
    assert dk_mul == py, f"{mod}: DuckDB {lit}*1.0e0 off the Python parse"


def test_known_bad_literal_is_detected() -> None:
    # Negative control: the exact literal that broke window_keltner in
    # round 11 — repr(2/21) — must FAIL the bit-equality probe, proving
    # the probe can actually see the hazard.
    bad = repr(2.0 / 21.0)  # '0.09523809523809523', 17 digits
    dk = duckdb.execute(f"SELECT CAST({bad} AS DOUBLE)").fetchone()[0]
    assert dk != float(bad), (
        "expected DuckDB to double-round the 17-digit 2/21 literal; if "
        "this ever passes, the probe's premise changed — re-audit"
    )
