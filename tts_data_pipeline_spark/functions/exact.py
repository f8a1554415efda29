"""Cross-engine-exact aggregate helpers.

``ROUND(AVG(x), dp)`` is NOT reproducible across engines when x is
discrete decimal data: the mean of 2-dp values lands exactly on a
half-ulp-of-dp boundary with probability ~1/n per group, and there Spark
(which rounds the double's shortest DECIMAL representation, HALF_UP on
"2.525") and DuckDB/C (which round the BINARY value, 2.52499…) disagree.
Observed live: ``w11_gap_fill_ffill`` matched at sf0.001 and broke at
sf0.01.

The fix is fixed-point: scale each value to an exact integer unit
(cents for 2-dp money), SUM exactly (order-independent integer math),
and apply ONE shared rounding rule — ``floor(x + 0.5)`` — to the final
scaled mean.  Both engines then evaluate identical double expressions on
identical exact inputs.  Use for means of discrete-decimal columns
(money, counts, ratios of counts); keep plain round-and-pray only for
genuinely continuous aggregates (log-probs, norms) where boundary hits
are measure-zero.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mean_fixed(col: Column, dp: int = 2, in_dp: int = 2) -> Column:
    """Exact mean of ``in_dp``-decimal data, rounded half-up to ``dp``.

    Aggregate expression: use inside ``.agg(...)``.  Mirrored in SQL by
    :func:`mean_fixed_sql`.
    """
    si = 10**in_dp
    so = 10**dp
    r = so // si if so >= si else None
    units = F.round(col * si, 0).cast("bigint") if in_dp else col.cast("bigint")
    if r is not None:
        scaled = F.sum(units) * float(r) / F.count(F.lit(1))
    else:  # dp < in_dp: divide the ratio out (still exact doubles)
        scaled = F.sum(units) / float(si // so) / F.count(F.lit(1))
    return F.floor(scaled + 0.5) / float(so)


def mean_fixed_sql(expr: str, dp: int = 2, in_dp: int = 2) -> str:
    """DuckDB mirror of :func:`mean_fixed` — identical op order."""
    si = 10**in_dp
    so = 10**dp
    units = (
        f"CAST(ROUND(({expr}) * {si}, 0) AS BIGINT)"
        if in_dp
        else f"CAST({expr} AS BIGINT)"
    )
    if so >= si:
        scaled = f"SUM({units}) * {so // si}.0 / COUNT(*)"
    else:
        scaled = f"SUM({units}) / {si // so}.0 / COUNT(*)"
    return f"FLOOR({scaled} + 0.5) / {so}.0"


def money_units(col: Column, dp: int = 2) -> Column:
    """Exact integer units from a dp-decimal double (cents for money)."""
    return F.round(col * (10**dp), 0).cast("bigint")


def sum_units_round(units: Column, unit_dp: int, out_dp: int = 2) -> Column:
    """SUM of exact integer units → out_dp-decimal double, shared
    ``floor(x+0.5)`` rule.  Aggregate expression.

    The revenue family (``price * (1 - disc)``, ``* (1 + tax)``) is where
    the ROUND(SUM(double)) trap bites hardest: products of 2-dp decimals
    are exact 4/6-dp decimals, so the group sum lands EXACTLY on a 2-dp
    half-boundary for ~1% of groups (measured: 183 of 14 743 per-order
    revenue sums at sf0.01) — and there the two engines' independently
    accumulated doubles pick sides at random.  Integer units make the sum
    exact and order-independent; the one float op left is a division both
    engines perform on the same integer."""
    div = 10 ** (unit_dp - out_dp)
    return F.floor(F.sum(units) * 1.0 / div + F.lit(0.5)) / float(10**out_dp)
