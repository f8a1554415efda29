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
