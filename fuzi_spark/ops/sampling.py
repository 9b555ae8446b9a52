"""Deterministic hash-based sampling (the corpus-mixing primitive).

A training-data pipeline samples by CONTENT-STABLE hash, never by RNG:
the keep/drop decision for a document must be a pure function of its key
so that (a) re-runs, resumes, and cluster-size changes reproduce the
same sample bit-for-bit (Bernoulli `df.sample` depends on partition
layout), (b) downstream joins see a consistent universe, and (c) nested
rates compose — the 10% sample is a strict subset of the 50% sample,
so curriculum mixes can be re-weighted without re-sampling.

Mechanism: keep a row iff the first 8 hex chars of md5(salt ':' key)
are lexicographically below the rate threshold. md5 here is a UNIFORMITY
device, not a security one — any well-mixed hash works; md5 is chosen
because every engine agrees on its value (the DuckDB oracle recomputes
the identical predicate). The comparison stays on the hex STRING:
fixed-width lowercase hex compares in value order, and string-compare is
portable across engines with no 64-bit signedness traps.

Scale shape: a pure per-row predicate on the scan — no shuffle, no
state, no driver round-trip; stratified rates ride a literal
`create_map` (strata counts are small), so the whole operator
whole-stage-codegens into the scan's filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX_WIDTH = 8
_ONE = 1 << (4 * _HEX_WIDTH)


def hex_threshold(rate: float) -> str:
    """Rate in [0,1] → the 8-hex-char threshold the sampler compares
    against. rate >= 1.0 returns 'g' — lexicographically above every
    hex string, so everything passes (format(2^32,'x') would be 9 chars
    and compare WRONG against an 8-char prefix: 'f…' > '1…')."""
    if rate >= 1.0:
        return "g"
    q = max(0, int(rate * _ONE))
    return format(q, f"0{_HEX_WIDTH}x")


def _bucket(key_col: str, salt: str):
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string"))),
        1,
        _HEX_WIDTH,
    )


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = "fuzi"
) -> DataFrame:
    """Keep a deterministic `rate` fraction of rows, decided per key.

    Same key + same salt → same decision on any cluster, any partition
    layout, any Spark version. Different salts give independent samples
    of the same table; nested rates give nested samples."""
    return df.filter(_bucket(key_col, salt) < F.lit(hex_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
    salt: str = "fuzi",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the language/source/quality
    re-balancing step of a corpus mix (e.g. downsample en, keep all zh).

    `rates` maps stratum value → keep rate; strata absent from the map
    get `default_rate`. The per-row threshold is a literal map lookup,
    so the filter is still a single codegen'd scan predicate — no join,
    no shuffle. For thousands of strata pass a rates TABLE and broadcast
    -join it instead; at typical mix cardinality (languages, sources)
    the literal map is the cheaper plan."""
    mapping = F.create_map(
        *[
            lit
            for k, v in sorted(rates.items())
            for lit in (F.lit(k), F.lit(hex_threshold(v)))
        ]
    )
    thr = F.coalesce(
        mapping[F.col(stratum_col)], F.lit(hex_threshold(default_rate))
    )
    return df.filter(_bucket(key_col, salt) < thr)
