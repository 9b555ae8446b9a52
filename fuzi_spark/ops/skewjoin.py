"""Salted (skew-replicated) equi-join — the explicit skew-handling
join the north rule calls for, packaged as a reusable operator.

The problem at 100 TB: a hash join shuffles both sides by the join
key, so a hot key (one domain with 10^9 docs, one event_type with
half the telemetry) lands on ONE reducer and the stage runs at the
speed of that straggler. AQE's skew-join split only kicks in for
sort-merge joins above its size thresholds and can't help when the
small side must broadcast-explode anyway.

The classic fix, made explicit and deterministic here:

- the BIG side gets a salt in [0, n_salts) that is a pure function of
  its row content (xxhash64 over caller-named spread columns — never
  rand(), so retried tasks and resumed runs salt identically and the
  operator composes with the repo's lineage/resume protocol);
- the SMALL side is replicated n_salts times (explode of a literal
  sequence — n_salts × |small| rows, the deliberate price);
- the join key becomes (key, salt), so the hot key's rows spread
  across n_salts reducers instead of one.

Row multiplicity is untouched: each original small row appears
exactly once per salt value, and a big row joins only the copy
carrying its own salt — so inner and left joins return EXACTLY the
plain-join result, which is what the `skew_join` oracle asserts
(DuckDB replays the unsalted join).

Scale shape: one exchange per side (same as the plain join), but the
big side's exchange is now keyed on (key, salt) — reducer fan-out of
the hottest key improves n_salts×. The salt column is a codegen'd
projection on the scan; the replicate is an explode of an n_salts
literal array, negligible for dimension-sized small sides. For
broadcast-sized small sides prefer F.broadcast(small) — salting is
the tool for the mid-size dim that is too big to broadcast yet small
enough to replicate n_salts×.

Reference parity note: no counterpart in the reference (Fuzi is a
single-process parse/query library); pipeline-brief scope — the
north rule's "explicitly salting skewed partitions" requirement as a
first-class operator (the extraction pipeline's giant-doc salt at
pipeline.py:89-99 is the same idea fused into its repartition).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_fz_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    spread_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Equi-join `big` ⋈ `small` on `on`, spreading each hot join key
    across `n_salts` reducers. Result is row-identical to
    big.join(small, on, how) for how ∈ {inner, left}.

    spread_cols: big-side columns the salt is hashed from; defaults to
    every big column NOT in the join key (joint-distinct rows spread
    evenly; full duplicates share a salt, which only matters if the
    skew IS duplicate full rows). The salt must not hash only the join
    key — that would map each key to one salt and spread nothing.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    keys = [on] if isinstance(on, str) else list(on)
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(
            f"salted_join: input already has a {_SALT!r} column — the "
            f"salt would silently collide with it; rename the input "
            f"column"
        )
    if spread_cols is None:
        spread_cols = [c for c in big.columns if c not in keys]
    if not spread_cols:
        raise ValueError(
            "no spread columns: big side has only the join key; "
            "name spread_cols explicitly"
        )
    b = big.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in spread_cols]), F.lit(n_salts)
        ).cast("int"),
    )
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("int"))
    return b.join(s, keys + [_SALT], how).drop(_SALT)
