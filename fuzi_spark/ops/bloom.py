"""Bloom-filter membership gates for web-scale pipelines.

The use case: a "have we seen this key" decision (crawled-URL sets,
benchmark membership, licensing blocklists) where the SEEN SET is too
big to ship as an equality side but a fixed-size bit artifact with a
tunable false-positive rate is acceptable — the classic crawl-frontier
companion structure.

Design for cross-engine determinism: the k probe positions for a key
are pos_i = int(hex(md5("salt:i:key"))[0:15], 16) mod m_bits. md5 is a
UNIFORMITY device here (same rationale as ops/sampling.py), chosen
because Spark SQL, Python hashlib, and DuckDB all agree on the digest
of the same string — so the FILTER'S EXACT DECISION, false positives
included, can be replayed relationally by the driver's oracle (member
iff all k positions land in the set of positions inserted by the seen
keys).

Scale shape and its honest contract:
- the ARTIFACT is m_bits regardless of seen-set size; the build is one
  map-side explode of k metadata-width position rows per key, a
  distinct (positions collapse toward saturation — the collect is
  bounded by min(n·k, m_bits) rows), and a driver-side bitmap fill.
  Size m_bits for the seen-set you mean to encode: the standard FP
  formula (1 - e^{-kn/m})^k says m ≈ 10n bits for ~1% FP at k=4 —
  the knob is explicit, not hidden.
- membership is a broadcast of the m_bits/8-byte bitmap in an Arrow
  UDF closure: the probe corpus is SCANNED, never shuffled, and each
  batch pays k vectorized-loop md5s per row (hashlib C path), no JVM
  round-trips.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _position_cols(key, salt: str, k: int, m_bits: int):
    """The k JVM-side position expressions for a key column — the
    build side of the cross-engine position contract."""
    return [
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.lit(salt), F.lit(str(i)), key.cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(m_bits),
        )
        for i in range(k)
    ]


def _positions_py(key: str, salt: str, k: int, m_bits: int) -> list:
    """Python mirror of _position_cols — byte-identical md5 input
    strings, so build (JVM) and probe (hashlib) agree bit-for-bit."""
    return [
        int(
            hashlib.md5(f"{salt}:{i}:{key}".encode("utf-8")).hexdigest()[:15],
            16,
        )
        % m_bits
        for i in range(k)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    m_bits: int = 1 << 20,
    k: int = 4,
    salt: str = "bloom",
) -> np.ndarray:
    """Build the filter: returns a packed uint8 bitmap of m_bits bits
    (bit p of the filter is byte p//8, mask 1<<(p%8)). One map-side
    explode + distinct; the collect is bounded by min(n·k, m_bits)
    longs by construction."""
    if m_bits <= 0 or k <= 0:
        raise ValueError("bloom_build: m_bits and k must be positive")
    key = F.col(key_col)
    pos = (
        keys.select(
            F.explode(F.array(*_position_cols(key, salt, k, m_bits))).alias(
                "pos"
            )
        )
        .distinct()
        .collect()
    )
    bitmap = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    if pos:
        p = np.array([r["pos"] for r in pos], dtype=np.int64)
        np.bitwise_or.at(bitmap, p // 8, (1 << (p % 8)).astype(np.uint8))
    return bitmap


def bloom_probe_df(
    docs: DataFrame,
    bitmap: np.ndarray,
    key_col: str = "key",
    k: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Probe: docs + (n_set:int, seen:int) where n_set counts the
    key's positions that are set in the filter and seen = 1 iff all k
    are (the Bloom decision — no false negatives; false positives at
    the configured rate). Zero shuffles; the bitmap ships once per
    executor in the UDF closure."""
    m_bits = int(bitmap.shape[0]) * 8
    for reserved in ("n_set", "seen"):
        if reserved in docs.columns:
            raise ValueError(
                f"bloom_probe_df: input already has a {reserved!r} "
                f"column — the probe emits it; rename the input column"
            )
    # The build hashes the JVM cast('string') rendering of the key
    # (bloom_build / _position_cols). Probing the Python str() of the
    # Arrow-delivered value silently diverges for non-string keys: a
    # nullable int64 batch arrives as float64 ('5.0' vs '5'), booleans
    # as 'True' vs 'true', floats/timestamps format differently — and
    # mismatched renderings DROP matching rows. So the probe string is
    # ALSO produced JVM-side: cast('string') in a temp column, read
    # verbatim in the UDF, dropped on emit — build and probe hash
    # byte-identical strings for every key type by construction.
    skey = "_fz_bloom_key"
    while skey in docs.columns:
        skey += "_"
    cast_docs = docs.withColumn(skey, F.col(key_col).cast("string"))

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            n_set = np.zeros(n, dtype=np.int32)
            for row in range(n):
                key = pdf[skey].iloc[row]
                if key is None:
                    continue
                n_set[row] = sum(
                    1
                    for p in _positions_py(key, salt, k, m_bits)
                    if bitmap[p // 8] & (1 << (p % 8))
                )
            out = pdf.drop(columns=[skey])
            out["n_set"] = n_set
            out["seen"] = (n_set == k).astype(np.int32)
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    return cast_docs.mapInPandas(
        probe, schema=f"{schema}, n_set int, seen int"
    )


def bloom_seen_filter(
    docs: DataFrame,
    seen_keys: DataFrame,
    key_col: str = "key",
    seen_key_col: str = "key",
    m_bits: int = 1 << 20,
    k: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """One-call compose: build the filter from `seen_keys`, probe
    `docs` — the crawl-frontier 'already seen' gate with a bounded
    artifact instead of a corpus-sized anti-join side."""
    bitmap = bloom_build(seen_keys, seen_key_col, m_bits, k, salt)
    return bloom_probe_df(docs, bitmap, key_col, k, salt)


def bloom_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    m_bits: int = 1 << 17,
    k: int = 4,
    salt: str = "bloomjoin",
) -> DataFrame:
    """Bloom-prefiltered inner equi-join — the side-filter pattern for
    the mid-size dimension that is too large to BROADCAST-join but
    whose BITMAP is a few hundred KB: non-matching big-side rows are
    dropped map-side BEFORE the join shuffle, so the exchange carries
    ~|matches| + fp_rate·|big| rows instead of |big|. (Spark's own
    runtime row-level filters do this for some plans; this operator
    makes the decision explicit, deterministic, and available to any
    join the optimizer won't cover.)

    Result is row-identical to big.join(small, on, 'inner'): Bloom
    has NO false negatives (a matching row always passes), and false
    positives are eliminated by the real join that follows — the
    bitmap only decides how much useless data moves. The `bloom_join`
    oracle asserts exactly that equality.

    INNER-only by design: a left join must keep non-matching rows, so
    there is nothing for the prefilter to drop. The probe is the
    bloom_seen mapInPandas kernel (bitmap ships once per executor)."""
    keys = small.select(F.col(on).cast("string").alias("key")).distinct()
    bitmap = bloom_build(keys, "key", m_bits, k, salt)
    probed = bloom_probe_df(big, bitmap, key_col=on, k=k, salt=salt)
    pref = probed.filter(F.col("seen") == 1).drop("n_set", "seen")
    return pref.join(small, on, "inner")
