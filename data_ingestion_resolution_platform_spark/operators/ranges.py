"""Range (interval) join: match rows to [lo, hi) intervals.

The reference's band/threshold semantics (e.g. severity banding of
numeric fields) need value-in-interval matching, which plain equi-join
cannot express. Two physical strategies, chosen by the caller:

- **broadcast** (``bucket_width=None``): right side is small (a band
  dimension); broadcast nested-loop theta join. O(|L| x |R|) work but
  |R| is tiny and the scan of L stays partition-parallel — the correct
  plan for a handful of bands at any |L|.
- **bucketed** (``bucket_width=W``): both sides may be large. Each left
  row maps to ONE bucket ``floor(value / W)``; each interval explodes
  into the buckets it covers (``sequence(floor(lo/W), floor(hi/W))``).
  The join becomes a hash equi-join on the bucket id followed by the
  exact interval filter — shuffle is O(|L| + |R| x spans) and never
  all-pairs. Pick W near the median interval width so spans stay O(1);
  skewed buckets (a hot band) are split by AQE skew-join handling.

Interval convention is half-open ``lo <= v < hi`` (matches the
oracle's ``v >= lo AND v < hi``). NULL values/bounds never match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float | None = None,
    small_right: bool = False,
) -> DataFrame:
    """Inner-join ``left`` rows to ``right`` intervals containing them.

    Returns left columns + right columns; rows with NULL value or NULL
    bounds are dropped (no interval contains them).
    """
    l = left.filter(F.col(value_col).isNotNull())
    r = right.filter(F.col(lo_col).isNotNull() & F.col(hi_col).isNotNull())
    contained = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))

    if bucket_width is None:
        # tiny right side: broadcast nested-loop; left scan stays parallel
        return l.join(F.broadcast(r), contained, "inner")

    w = float(bucket_width)
    lb = l.withColumn("_rj_bucket", F.floor(F.col(value_col) / w))
    rb = r.withColumn(
        "_rj_bucket",
        F.explode(F.sequence(F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w))),
    )
    # ``small_right``: the exploded interval side fits in a broadcast —
    # BroadcastHashJoin on the bucket id means the (possibly 100 TB)
    # probe side NEVER shuffles; this is the bucketed strategy's fast
    # path whenever the interval table is dimension-sized.
    if small_right:
        return (
            lb.join(F.broadcast(rb), "_rj_bucket", "inner")
            .filter(contained)
            .drop("_rj_bucket")
        )
    # both sides large: pin the build side to the exploded-intervals
    # frame — with a local interval relation Catalyst has no stats for
    # it and may elect to broadcast the *probe* side instead (measured
    # BuildLeft on the events scan) — harmless on a laptop, fatal when
    # the probe side is the 100 TB table. shuffle_hash keeps it a
    # bucket-partitioned hash join built on the interval side at every
    # scale.
    return (
        lb.join(rb.hint("shuffle_hash"), "_rj_bucket", "inner")
        .filter(contained)
        .drop("_rj_bucket")
    )
