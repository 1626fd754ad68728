"""Registry output-contract regressions (round-9 verdict #1).

The driver's correctness gate hashes cell VALUES after its own
canonicalization, which distinguishes ``Decimal('6.104830')`` (Spark
DecimalType via toPandas) from the float ``6.10483`` DuckDB's pandas
bridge produces — so a key whose output schema carries DecimalType
hash-fails on any trailing-zero cell even when every value is
bit-identical to the oracle (q_token_chi2 / q_ndcg, rounds 8-9).

Two guards:
- the parity gate asserts no registered key's output schema contains
  DecimalType (tests/test_parity.py::test_parity);
- here, the replica's canonicalizer must CATCH a planted
  trailing-zero decimal instead of collapsing it to float — the
  harness may be stricter than the driver, never blinder.
"""

from __future__ import annotations

import decimal

from oracle_harness import _canon


def test_canon_distinguishes_decimal_from_float():
    """A Decimal cell must never canon-equal the float the oracle
    side would produce — this is exactly the class the driver gate
    flagged red in rounds 8-9 while the old float()-collapsing
    replica stayed green."""
    d = decimal.Decimal("6.104830")
    f = 6.10483
    assert _canon(d) != _canon(f)
    # and two decimals differing only in trailing-zero scale are
    # distinct too (Decimal('1.5') vs Decimal('1.50') hash apart in
    # the driver's str-repr canonicalization)
    assert _canon(decimal.Decimal("1.5")) != _canon(decimal.Decimal("1.50"))
    # same exact string form still matches itself
    assert _canon(decimal.Decimal("1.50")) == _canon(decimal.Decimal("1.50"))


def test_canon_float_unchanged():
    assert _canon(6.10483) == _canon(6.10483)
    assert _canon(float("nan")) == "f:nan"
