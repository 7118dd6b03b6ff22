"""Beyond-reference join shapes: as-of join and range join.

The reference has exactly one join shape (left equi-join on one key,
``DPF/processors/processor.py:197``); a training-data pipeline at scale
also needs temporal joins — "latest fact at or before this event" — and
interval containment joins. Both are implemented shuffle-minimally:

- ``asof_join``: the union-window formulation. Instead of a pair-
  exploding inequality join, left and right rows are unioned into one
  stream per key and the match is a ``last(value, ignorenulls=True)``
  running window — exactly ONE shuffle (on the key), zero pair
  explosion, linear in |left| + |right|. This is the only as-of shape
  that survives 100 TB; a naive ``l.ts >= r.ts`` theta-join is
  quadratic per key.
- ``range_join``: point-in-interval join. Small interval table →
  broadcast BETWEEN join (Catalyst turns it into a broadcast
  nested-loop over a tiny side — fine). Big interval table →
  bin-and-equijoin: both sides are mapped onto fixed-width buckets
  (intervals exploding to every bucket they overlap), the join becomes
  an equi-join on bucket id (shuffle-hash / AQE-skew-splittable), and
  the exact BETWEEN predicate filters residuals after the match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the single right row with the largest
    ``right_ts <= left_ts`` (direction='backward'; 'forward' = smallest
    ``right_ts >= left_ts``) within the same key group.

    Right rows must be unique per (key, ts) — pre-aggregate the right
    side if they are not (the match would otherwise be ambiguous).
    Right payload columns come back with their own names; if a payload
    name collides with a left column it is suffixed ``_right``
    (pandas ``merge_asof`` convention). The matched timestamp is
    exposed as ``matched_ts``. ``tolerance`` (a Column interval/numeric
    delta) null-outs matches farther than the bound.

    All payload values are taken from the SAME matched right row: the
    whole right row is packed into one struct that is non-null only on
    right-side rows, and a single ``last(struct, ignorenulls=True)``
    carries it forward — a NULL payload field in the matched row stays
    NULL (it is never back-filled from an older right row), matching
    pandas ``merge_asof`` and DuckDB ``ASOF JOIN``.

    Plan shape: union(left, right) → one shuffle on the key → running
    ``last(.., ignorenulls)`` window → filter left rows. No pair
    explosion; key skew is the only hazard (AQE-splittable).
    """
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    payload = [c for c in right.columns if c not in {*keys, rts}]
    # suffix colliding payload names, re-suffixing until unique against
    # the left columns AND every other output name (left may itself
    # contain e.g. both v and v_right)
    taken = set(left.columns) | {"matched_ts"}
    out_names: dict[str, str] = {}
    for c in payload:
        name = c
        while name in taken or (name != c and name in payload):
            name = f"{name}_right"
        taken.add(name)
        out_names[c] = name

    # One struct holding the matched right row (ts + all payload).
    # Non-null only on right-side rows, so last(ignorenulls) can never
    # mix fields from different right rows.
    rmatch = F.struct(
        F.col(rts).alias("_rts"), *[F.col(c).alias(c) for c in payload]
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias("_ts"),
        F.lit(0).alias("_side"),
        rmatch.alias("_rmatch"),
    )
    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tag.schema["_rmatch"].dataType).alias("_rmatch"),
        F.struct(*left.columns).alias("_lrow"),
    )
    r_tag = r_tag.withColumn(
        "_lrow", F.lit(None).cast(l_tag.schema["_lrow"].dataType)
    )
    merged = l_tag.unionByName(r_tag)

    asc = direction == "backward"
    order = (
        [F.asc("_ts"), F.asc("_side")] if asc else [F.desc("_ts"), F.asc("_side")]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.select(
        "*",
        F.last("_rmatch", ignorenulls=True).over(w).alias("_m"),
    ).filter(F.col("_side") == 1)

    if tolerance is not None:
        delta = (
            F.col("_ts") - F.col("_m._rts")
            if asc
            else F.col("_m._rts") - F.col("_ts")
        )
        in_tol = F.col("_m").isNotNull() & (delta <= tolerance)
        matched = matched.withColumn("_m", F.when(in_tol, F.col("_m")))

    out = matched.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        F.col("_m._rts").alias("matched_ts"),
        *[F.col(f"_m.{c}").alias(out_names[c]) for c in payload],
    )
    if how == "inner":
        out = out.filter(F.col("matched_ts").isNotNull())
    return out


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    tolerance: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the right row NEAREST in time in
    EITHER direction within the key group (|right_ts - left_ts|
    minimal; exact tie -> the earlier right row). The bidirectional
    sibling of :func:`asof_join` — "closest reading to this event",
    not "latest reading before it".

    Same contract as asof_join: right rows unique per (key, ts),
    payload suffixed on collision, matched timestamp exposed as
    ``matched_ts``, ``tolerance`` null-outs matches farther than the
    bound, ``how='inner'`` drops unmatched left rows.

    Plan shape: the SAME single union + shuffle + sort as asof_join —
    the backward candidate is ``last(struct, ignorenulls)`` over
    (unbounded preceding, current) and the forward candidate is
    ``first(struct, ignorenulls)`` over (current, unbounded
    following); both windows share one partitioning and one sort, so
    Catalyst plans ONE exchange and ONE sort for the pair. Still zero
    pair explosion, linear in |left| + |right|.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    payload = [c for c in right.columns if c not in {*keys, rts}]
    taken = set(left.columns) | {"matched_ts"}
    out_names: dict[str, str] = {}
    for c in payload:
        name = c
        while name in taken or (name != c and name in payload):
            name = f"{name}_right"
        taken.add(name)
        out_names[c] = name

    rmatch = F.struct(
        F.col(rts).alias("_rts"), *[F.col(c).alias(c) for c in payload]
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias("_ts"),
        F.lit(0).alias("_side"),
        rmatch.alias("_rmatch"),
    )
    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tag.schema["_rmatch"].dataType).alias("_rmatch"),
        F.struct(*left.columns).alias("_lrow"),
    )
    r_tag = r_tag.withColumn(
        "_lrow", F.lit(None).cast(l_tag.schema["_lrow"].dataType)
    )
    merged = l_tag.unionByName(r_tag)

    # right rows sort before left rows at equal ts, so an equal-ts
    # right row is seen by the BACKWARD window (diff 0); the forward
    # window then never needs it.
    base = Window.partitionBy(*keys).orderBy(F.asc("_ts"), F.asc("_side"))
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    matched = merged.select(
        "*",
        F.last("_rmatch", ignorenulls=True).over(wb).alias("_mb"),
        F.first("_rmatch", ignorenulls=True).over(wf).alias("_mf"),
    ).filter(F.col("_side") == 1)

    db = F.col("_ts") - F.col("_mb._rts")
    df_ = F.col("_mf._rts") - F.col("_ts")
    chosen = (
        F.when(F.col("_mb").isNull(), F.col("_mf"))
        .when(F.col("_mf").isNull(), F.col("_mb"))
        .when(df_ < db, F.col("_mf"))
        .otherwise(F.col("_mb"))  # tie -> backward = earlier right row
    )
    matched = matched.withColumn("_m", chosen)
    if tolerance is not None:
        dist = F.greatest(
            F.col("_m._rts") - F.col("_ts"), F.col("_ts") - F.col("_m._rts")
        )
        in_tol = F.col("_m").isNotNull() & (dist <= tolerance)
        matched = matched.withColumn("_m", F.when(in_tol, F.col("_m")))

    out = matched.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        F.col("_m._rts").alias("matched_ts"),
        *[F.col(f"_m.{c}").alias(out_names[c]) for c in payload],
    )
    if how == "inner":
        out = out.filter(F.col("matched_ts").isNotNull())
    return out


def range_join(
    facts: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to every interval containing them
    (``lo <= point <= hi``, inclusive both ends).

    ``bucket_width=None``: broadcast the (small) interval table and let
    Catalyst run a broadcast nested-loop — the right plan when ranges
    fit in memory (band tables, SLA tiers, histogram bins).

    ``bucket_width=w``: the big-big path. Facts map to bucket
    ``floor(point / w)``; each interval explodes to the buckets it
    overlaps (``sequence(floor(lo/w), floor(hi/w))`` — narrow, bounded
    by interval span / w); the join is an equi-join on bucket followed
    by the exact BETWEEN filter. Shuffle volume is |facts| + Σ interval
    spans / w instead of |facts| × |ranges|.
    """
    between = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) <= F.col(hi_col)
    )
    if bucket_width is None:
        return facts.join(F.broadcast(ranges), on=between, how=how)

    w = float(bucket_width)
    f_b = facts.withColumn("_bucket", F.floor(F.col(point_col) / w))
    r_b = ranges.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w)
            )
        ),
    )
    if how != "inner":
        raise ValueError("bucketed range_join supports how='inner' only")
    return f_b.join(r_b, on="_bucket", how="inner").filter(between).drop("_bucket")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: hot keys are split across ``salt``
    reducers.

    The big (left) side gets a random salt in [0, salt); the small-to-
    medium (right) side is replicated ``salt`` times (explode of a
    literal sequence — narrow, xsalt row amplification). The join key
    becomes (key, _salt), so a key holding 30% of the rows spreads over
    ``salt`` tasks instead of hot-spotting one reducer.

    The result SET is independent of the salt values, so the operator
    stays oracle-checkable even though salting itself is random.

    AQE's skew-join splitting (on by default in session.py) handles
    most of this at runtime; explicit salting remains for the cases AQE
    can't re-plan — streaming joins, pathological single-key skew where
    even a split partition's build side is hot, and engines/stages
    where AQE is off. Supports inner and left joins (right-side
    replication makes right/full forms ambiguous).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)
    l_s = left.withColumn(
        "_salt", (F.rand(seed=0) * salt).cast("int")
    )
    r_s = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l_s.join(r_s, on=[*keys, "_salt"], how=how).drop("_salt")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bin_width: int = 3600,
    on: list[str] | None = None,
) -> DataFrame:
    """Interval × interval OVERLAP join (closed intervals, numeric
    bounds — epoch seconds for time): pairs where
    ``l_lo <= r_hi AND r_lo <= l_hi``, e.g. "which sessions overlap a
    campaign window". The third temporal-join shape next to asof
    (point-to-point) and range_join (point-in-interval).

    Scale shape — bin-and-equijoin with FIRST-COLLIDING-BIN emission
    (the same dedup move as the LSH banding tier): each interval
    explodes to the fixed-width bins it spans, the join is a plain
    equi-join on (``on`` keys +) bin — shuffle-hash, AQE-skew-
    splittable — and a pair that shares several bins is kept only in
    the FIRST bin both intervals occupy (``bin == max(floor(l_lo/w),
    floor(r_lo/w))``), so no global ``distinct()`` ever touches the
    pair volume. The exact overlap predicate filters residual
    same-bin non-overlaps after the match. Pick ``bin_width`` near the
    typical interval length: explosion factor is ~duration/width + 1
    per side.
    """
    w = int(bin_width)
    if w <= 0:
        raise ValueError("bin_width must be positive")
    keys = list(on or [])

    def binned(df: DataFrame, lo: str, hi: str) -> DataFrame:
        lo_b = F.floor(F.col(lo) / w).cast("long")
        hi_b = F.floor(F.col(hi) / w).cast("long")
        cols = [F.col(c) for c in df.columns]
        return df.select(
            *cols, F.explode(F.sequence(lo_b, hi_b)).alias("_bin")
        )

    l_pref = binned(left, l_lo, l_hi)
    r_pref = binned(right, r_lo, r_hi)
    joined = l_pref.join(r_pref, on=keys + ["_bin"])
    first_bin = F.greatest(
        F.floor(F.col(l_lo) / w).cast("long"),
        F.floor(F.col(r_lo) / w).cast("long"),
    )
    overlap = (F.col(l_lo) <= F.col(r_hi)) & (F.col(r_lo) <= F.col(l_hi))
    return (
        joined.filter(F.col("_bin") == first_bin)
        .filter(overlap)
        .drop("_bin")
    )
