"""Engine-exact driver-side rounding.

Spark's ``round(double, d)`` is ``BigDecimal.valueOf(x)`` — i.e. the
SHORTEST decimal representation (``Double.toString``, = Python ``repr``) —
quantized HALF_UP; DuckDB's ``round`` agrees on every value this engine has
oracle-checked. Python's built-in ``round`` is HALF_EVEN on the raw binary
value, which diverges on exact decimal-repr halves (e.g. 1.2431875 → Spark
1.243188, Python 1.243187). Every driver-side gather that rounds a score
for output must use this helper so all three engines agree bit-for-bit."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

_Q6 = Decimal("0.000001")


def round_half_up6(x: float) -> float:
    """round(x, 6) with Spark/DuckDB semantics (shortest-repr HALF_UP)."""
    return float(Decimal(repr(float(x))).quantize(_Q6, rounding=ROUND_HALF_UP))
