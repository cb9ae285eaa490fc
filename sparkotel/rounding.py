"""Python twin of Spark's ``F.round(col, 6)`` — the ONE canonical copy.

Used by both the golden-fixture oracles (``sparkotel/golden.py``) and
the Arrow repetition kernel (``sparkotel/functions/text.py``); keeping
a single implementation means a rounding-boundary fix cannot silently
break the engines' value-identity.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal


def round_half_up6(v: float) -> float:
    """Spark ``F.round(col, 6)`` = ``BigDecimal.valueOf(double)`` (which
    goes through ``Double.toString`` — the SHORTEST decimal repr, not the
    exact binary expansion) then ``setScale(6, HALF_UP)``.  Python's
    ``repr(float)`` is the same shortest-round-trip decimal, so
    ``Decimal(repr(v))`` mirrors it; ``Decimal(v)`` would take the exact
    binary value and round boundary scores the other way (e.g. the
    double nearest 0.1234565 is exactly 0.12345649999… → 0.123456,
    where Spark emits 0.123457)."""
    v = float(v)  # numpy 2.x reprs its scalars as 'np.float64(…)' — coerce
    if math.isnan(v):
        return v
    return float(
        Decimal(repr(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )
