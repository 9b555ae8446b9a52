"""Deduplication operators over document tables.

Four families, ordered by cost:
- exact:        hash-groupBy on the content digest (pure JVM, one shuffle)
- minhash-LSH:  shingle → minhash signature → banded bucket join. The
                signature pipeline is EXPRESSED ENTIRELY IN CATALYST
                (sequence/transform/aggregate/xxhash64) — no Python in the
                hot path, so it whole-stage-codegens and scales linearly.
- simhash:      64-bit bit-vote fingerprint, Arrow-batched numpy UDF
- ngram-jaccard: exact verification of candidate pairs (JVM set ops)

At 100 TB the only all-pairs operation is the LSH bucket join; everything
else is map-side. Band buckets are salted implicitly by their hash; the
candidate-pair explosion is bounded by bucket size, and the final exact
verify is a array_intersect/array_union on the (much smaller) candidate
set.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import LongType

from .hof import bind

from .cache import scoped_persist

# NOTE on the hash family (round-2 fix): the classic (a*h + b) mod p
# "universal" family is UNUSABLE here — keeping a*h inside int64 forces
# a < 2^30, and then a*h + b (< 2^62) never wraps mod p = 2^61-1, so the
# map is MONOTONE in h: the 64 "permutations" are nearly the same
# permutation and band slots are strongly correlated (measured: planted
# pairs at Jaccard 0.96 missed ALL 8 bands — 9 of 16 slots flipped, the
# same 9 slots for every document). Per-slot xxhash64(h, slot) gives
# independent well-mixed permutations with no overflow, entirely JVM-side.


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate collapse: keep min id per distinct content.
    Digest with sha2 so the shuffle key is 32 bytes, not the document."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("digest"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("dup_count"),
        )
        .select(id_col, "dup_count")
    )


def word_shingles(text_col: str, n: int = 3):
    """n-word shingles as an array column (JVM-side), as the JOINED
    STRINGS — the bit-exact surface `ngram_jaccard(hashed=False)` and
    human debugging read. The hot dedup paths use `shingle_hashes`
    below, which never materializes these strings.

    The token array is bound once per row (ops.hof.bind): referencing
    the split() directly inside the per-shingle lambda would re-tokenize
    the whole document for EVERY shingle (higher-order lambdas evaluate
    interpreted, no CSE) — O(L^2) on long documents."""

    def mk(tokens):
        k = F.greatest(F.size(tokens) - (n - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
        )

    return bind(F.split(F.col(text_col), " "), mk)


def shingle_hashes(text_col: str, n: int = 3):
    """Distinct 31-bit hashes of the n-word shingles, as an array column.
    Entirely JVM-side; the document string never leaves the projection.

    Hot-path formulation (round 3): hash each TOKEN once, then each
    shingle hash is xxhash64 over the n consecutive token hashes —
    3 array probes + one fixed-arity hash per shingle. The previous
    per-shingle `slice + concat_ws + xxhash64(string)` re-materialized
    every shingle as a string inside an interpreted lambda and was the
    single largest cost of the whole minhash pipeline (measured 3.9 s of
    dedup_minhash's 4.3 s at sf0.1; this cut the operator ~2×). Short
    docs (< n tokens) keep the one-truncated-shingle semantics: F.get
    past the end is null and xxhash64 skips null inputs, so the single
    shingle hashes exactly the tokens that exist. Values differ from the
    string formulation (different family, same distribution); every
    consumer is planted-invariant, so only the family's quality matters,
    not its values."""

    def mk(th):
        k = F.greatest(F.size(th) - (n - 1), F.lit(1))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.pmod(
                    F.xxhash64(*[F.get(th, i - 1 + j) for j in range(n)]),
                    F.lit(1 << 31),
                ),
            )
        )

    token_hashes = F.transform(
        F.split(F.col(text_col), " "), lambda t: F.xxhash64(t)
    )
    return bind(token_hashes, mk)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    shingles_col: Optional[str] = None,
) -> DataFrame:
    """MinHash signature per document as n_hashes columns (mh0..mhN).

    Shuffle-free AND single-pass: ONE `aggregate` over the shingle-hash
    array keeps a running array of per-slot minima — for each shingle h,
    `zip_with(acc, seeds, (a, s) -> least(a, xxhash64(h, s)))`. The
    round-2 formulation (`array_min(transform(...))` per slot) traversed
    and re-materialized the whole shingle array n_hashes times; this one
    touches each shingle once and allocates only the 64-slot accumulator
    per step. Values are identical: same per-slot xxhash64(h, seed_i)
    family (int32 seed literals, long shingle hashes), same minima. (The
    even older explode→groupBy(min×64) formulation shuffled every shingle
    row; at 10^12 docs that shuffle IS the job.) Per-slot xxhash64
    re-hashing gives independent permutations — see the module note on
    why the linear (a*h+b) family silently correlated the slots.

    shingles_col: name of a precomputed array<long> shingle-hash column —
    callers that also filter or verify on shingles compute them ONCE
    (ideally persisted) instead of re-deriving from text here."""
    hashed = df.select(
        F.col(id_col),
        (
            F.col(shingles_col)
            if shingles_col
            else shingle_hashes(text_col, shingle_n)
        ).alias("_sh"),
    )

    # int32 literals on purpose: xxhash64(long, int) must hash the same
    # typed values as the round-2 per-slot formulation did
    seeds = F.array(*[F.lit(seed * 1_000_003 + i) for i in range(n_hashes)])
    long_max = (1 << 63) - 1

    def _step(acc, h):
        return F.zip_with(
            acc, seeds, lambda a, s: F.least(a, F.xxhash64(h, s))
        )

    sig = F.aggregate(
        F.col("_sh"),
        F.array_repeat(F.lit(long_max), n_hashes),
        _step,
    )
    # empty shingle array → NULL slots (what array_min over an empty
    # transform returned), never a LONG_MAX sentinel leaking into bands
    sig = F.when(F.size(F.col("_sh")) > 0, sig)
    out = hashed.select(F.col(id_col), sig.alias("_sig"))
    return out.select(
        id_col,
        *[F.element_at("_sig", i + 1).alias(f"mh{i}") for i in range(n_hashes)],
    )


def minhash_signatures_oph(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    shingles_col: Optional[str] = None,
) -> DataFrame:
    """One-permutation-hashing MinHash (Li, Owen & Zhang 2012) with
    rotation densification (Shrivastava & Li 2014): ONE xxhash64 per
    shingle instead of n_hashes — the shingle's hash g both selects a
    bin (pmod(g, k)) and competes for that bin's minimum. Empty bins
    (short docs: with ~80 shingles over 64 bins, ~a third are empty)
    borrow the nearest non-empty bin to the right, circularly, found
    in log2(k) doubling rounds of zip_with-with-rotation — all
    Catalyst, zero Python, zero shuffles, same (id, mh0..mhN) output
    contract as minhash_signatures.

    Per-shingle hash work drops n_hashes× — but measured wall-time at
    sf0.1 is PARITY with the classic family (0.79 s vs 0.72 s steady),
    because both formulations are bound by the k-slot array rebuild
    inside the Catalyst aggregate, not by hashing. Stated so the
    option is chosen for the right reason: pick OPH when the hash
    budget itself matters (longer shingle arrays, wider signatures, or
    a cheaper accumulator substrate than Catalyst's); at this repo's
    defaults it is an equal-cost alternative family with a measured
    recall curve (RECALL_minhash_oph_r3.json — recall sits ABOVE the
    independent-band theory curve at mid-J because densified copied
    slots correlate bands; the flip side is more false-positive
    candidates for the verify stage, the usual recall/precision lever).

    The statistical trade, stated plainly: bin minima are drawn
    WITHOUT replacement from one permutation (slight negative slot
    correlation) and densified slots are copies, not independent draws
    — per-band collision probabilities sit near, not exactly at, J^r.
    Identical docs still produce identical signatures (exact-dup
    recovery is unconditional). Values are a DIFFERENT family than
    minhash_signatures — callers pick one family per corpus and stay
    with it."""
    hashed = df.select(
        F.col(id_col),
        (
            F.col(shingles_col)
            if shingles_col
            else shingle_hashes(text_col, shingle_n)
        ).alias("_sh"),
    )
    long_max = (1 << 63) - 1
    k = n_hashes

    # Expression-duplication discipline: every stage below lands in its
    # OWN projection and references the previous stage as a plain
    # column. The first formulation chained slice/concat/zip_with over
    # one expression tree — each densification round referenced `sig`
    # three times, so six rounds expanded the aggregate ~3^6× and the
    # operator measured 50× slower than the classic family it was
    # supposed to beat. Columns are evaluated once per row; inline
    # expression trees are not.
    pairs = F.transform(
        F.transform(F.col("_sh"), lambda h: F.xxhash64(h, F.lit(seed))),
        lambda g: F.struct(
            F.pmod(g, F.lit(k)).cast("int").alias("b"), g.alias("g")
        ),
    )
    staged = hashed.select(
        F.col(id_col), F.size("_sh").alias("_n"), pairs.alias("_pg")
    )

    def _step(acc, p):
        return F.transform(
            acc,
            lambda a, idx: F.when(
                idx == p.getField("b"), F.least(a, p.getField("g"))
            ).otherwise(a),
        )

    sig = F.aggregate(
        F.col("_pg"), F.array_repeat(F.lit(long_max), k), _step
    )
    cur = staged.select(F.col(id_col), "_n", sig.alias("_s"))
    # rotation densification in log2(k) doubling rounds: after round r
    # every slot sees the nearest non-MAX slot within 2^(r+1) to its
    # right (circular); one projection per round (see note above)
    step = 1
    while step < k:
        s = F.col("_s")
        rot = F.concat(F.slice(s, step + 1, k - step), F.slice(s, 1, step))
        dens = F.zip_with(
            s, rot, lambda a, b: F.when(a == long_max, b).otherwise(a)
        )
        cur = cur.select(F.col(id_col), "_n", dens.alias("_s"))
        step *= 2
    out = cur.select(
        F.col(id_col),
        F.when(F.col("_n") > 0, F.col("_s")).alias("_sig"),
    )
    return out.select(
        id_col,
        *[F.element_at("_sig", i + 1).alias(f"mh{i}") for i in range(n_hashes)],
    )


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    shingles_col: Optional[str] = None,
    method: str = "classic",
) -> DataFrame:
    """(id, band, bucket) LSH band keys — the shareable artifact behind
    minhash_lsh_candidates (batch self-join) AND the streaming
    near-dedup history manifest (streaming.near_novel): a document is a
    near-dup CANDIDATE of anything that shares one (band, bucket) key,
    so committed band keys are exactly the state an incremental dedup
    needs to carry forward. Construction is bit-identical to what
    minhash_lsh_candidates always banded (concat_ws of the band's slot
    minima → xxhash64), so batch and streaming agree on every key.
    Shingle-less docs (shorter than the shingle width) band as
    xxhash64('')-constant buckets — callers that must not collide them
    filter on shingle presence (see near_novel)."""
    rows_per_band = n_hashes // bands
    sig_fn = (
        minhash_signatures_oph if method == "oph" else minhash_signatures
    )
    sig = sig_fn(
        df, text_col, id_col, n_hashes, shingle_n, shingles_col=shingles_col
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh{b * rows_per_band + j}").cast("string")
                        for j in range(rows_per_band)
                    ],
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return sig.select(
        id_col, F.explode(F.array(*band_structs)).alias("bb")
    ).select(
        id_col,
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    shingles_col: Optional[str] = None,
    method: str = "classic",
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH.

    rows_per_band = n_hashes // bands; two docs collide if any band of
    their signatures hashes equal. Returns (id_a, id_b) with id_a < id_b,
    deduped across bands. method='oph' switches the signature family to
    one-permutation hashing (minhash_signatures_oph — one hash per
    shingle, the 100 TB operating point) at slightly noisier per-band
    collision probabilities."""
    banded = minhash_bands(
        df, text_col, id_col, n_hashes, bands, shingle_n,
        shingles_col=shingles_col, method=method,
    )
    # the signature table is tiny next to the corpus (n_docs × bands rows);
    # persist it so the self-join doesn't recompute the signature pipeline
    # for each side (prod: write signatures to a table once). Released by
    # the caller's cache_scope (see ops/cache.py).
    banded = scoped_persist(banded)
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return pairs


def ngram_jaccard(
    pairs: DataFrame, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    shingle_n: int = 3, hashed: bool = True, broadcast_pairs: bool = True,
    shingles_col: Optional[str] = None,
) -> DataFrame:
    """Exact Jaccard verification of candidate pairs (JVM set ops).

    With hashed=True (default, the scale path) shingles are verified as
    their 31-bit hashes (`shingle_hashes`), not the strings: set Jaccard is
    preserved w.h.p. (collision mass ~ S/2^31), the shuffled arrays are
    8-byte longs instead of full n-gram strings, and array_intersect/union
    compare longs — the join carries ~95% fewer bytes for typical prose,
    which at corpus scale is the difference between a spilling shuffle and
    an in-memory one. hashed=False keeps the literal shingle strings —
    bit-exact against an external SQL oracle.

    broadcast_pairs=True (default): the candidate pair set out of LSH is
    metadata-sized next to the corpus, so each shingle side is semi-joined
    against the broadcast pairs and the big arrays never shuffle. Pass
    False only when the pair set itself is too large to broadcast (then
    the pairs shuffle against both shingle sides)."""
    shingles = (
        F.col(shingles_col)
        if shingles_col
        else (
            shingle_hashes(text_col, shingle_n)
            if hashed
            else F.array_distinct(word_shingles(text_col, shingle_n))
        )
    )
    sh = scoped_persist(docs.select(F.col(id_col), shingles.alias("sh")))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    jaccard = (
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b"))
    ).alias("jaccard")
    if broadcast_pairs:
        # metadata-sized pair set: semi-join each shingle side against the
        # broadcast pairs (big arrays never shuffle), then join the two
        # pair-sized halves — AQE broadcasts one of them
        bp = F.broadcast(pairs.select("id_a", "id_b"))
        half_a = a.join(bp, "id_a")
        half_b = b.join(bp, "id_b").select("id_a", "id_b", "sh_b")
        return half_a.join(half_b, ["id_a", "id_b"]).select(
            "id_a", "id_b", jaccard
        )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jaccard)
    )


def ngram_containment(
    pairs: DataFrame, docs: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", shingle_n: int = 3, hashed: bool = True,
    broadcast_pairs: bool = True, shingles_col: Optional[str] = None,
) -> DataFrame:
    """Exact shingle CONTAINMENT of candidate pairs — the asymmetric
    companion to ngram_jaccard for SUBSET duplication: a quote page, an
    excerpt, an aggregator wrapping a full article. Jaccard punishes
    size mismatch (a full containment at 10× length ratio scores J ≈
    0.1 and sails past any dedup threshold); containment_a =
    |A∩B| / |A| is 1.0 whenever A's content is inside B regardless of
    B's size — Broder's (1997) resemblance-vs-containment distinction.

    Returns (id_a, id_b, containment_a, containment_b, containment =
    max of the two). Candidates come from the same LSH front end
    (minhash_lsh_candidates — banding fires on shared shingles, so
    high-containment smaller sides collide at good rates even when
    Jaccard is low). Join shapes identical to ngram_jaccard: hashed
    long shingles on the scale path, broadcast-pairs semi-joins so the
    shingle arrays never shuffle."""
    shingles = (
        F.col(shingles_col)
        if shingles_col
        else (
            shingle_hashes(text_col, shingle_n)
            if hashed
            else F.array_distinct(word_shingles(text_col, shingle_n))
        )
    )
    sh = scoped_persist(docs.select(F.col(id_col), shingles.alias("sh")))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")

    # an EMPTY shingle set (possible via a caller-supplied
    # shingles_col; the built-in shinglers emit >= 1 by construction)
    # scores an explicit 0.0 on its side — the bare division would
    # yield NULL, and NULL containment silently vanishes from every
    # threshold filter instead of ranking the pair lowest
    def _contain(inter_, size_col):
        return F.when(
            F.size(size_col) > 0, inter_ / F.size(size_col)
        ).otherwise(F.lit(0.0))

    c_a = _contain(inter, "sh_a").alias("containment_a")
    c_b = _contain(inter, "sh_b").alias("containment_b")
    cmax = F.greatest(
        _contain(inter, "sh_a"), _contain(inter, "sh_b")
    ).alias("containment")
    if broadcast_pairs:
        bp = F.broadcast(pairs.select("id_a", "id_b"))
        half_a = a.join(bp, "id_a")
        half_b = b.join(bp, "id_b").select("id_a", "id_b", "sh_b")
        return half_a.join(half_b, ["id_a", "id_b"]).select(
            "id_a", "id_b", c_a, c_b, cmax
        )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", c_a, c_b, cmax)
    )


def dedup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over the near-dup pair graph:
    (node_id, canonical_id) where canonical_id = min node id in the
    component — the step that turns pair lists (minhash/simhash/embedding
    output) into dedup groups a pipeline can act on (keep canonical,
    drop the rest).

    Iterative min-label propagation: each round, every node's label
    becomes the min of its own and its neighbors' labels; converges in
    O(component diameter) rounds. Spark-shape notes for 10^12 edges:
    - one shuffle join + one map-side-combinable min-agg per round —
      no all-pairs work, cost ∝ |edges| per round;
    - each round's labels are CHECKPOINTED (localCheckpoint — on a real
      cluster with executor churn use checkpoint() with a checkpoint
      dir), which truncates the logical plan. persist() alone is NOT
      enough: Catalyst re-analyzes the whole accumulated plan every
      round, and the exponentially growing tree OOMs the driver long
      before the data does — the classic iterative-algorithm trap;
    - near-dup components are shallow (dup clusters, not social graphs),
      so the loop exits after 2-4 rounds via an inexpensive
      any-label-changed probe.
    Raises RuntimeError if max_iter rounds don't converge (pathological
    graph or max_iter set too low) rather than returning wrong labels."""
    # Deterministic release of superseded checkpoints: localCheckpoint
    # TRUNCATES lineage, so its blocks ARE the data — a block set may only
    # be unpersisted once nothing future derives from it (i.e. after the
    # NEXT round's eager checkpoint has its own blocks). Without this,
    # every superseded label table stays pinned until JVM GC happens to
    # collect the py4j handle — at 10^12 nodes that is a node-table of
    # executor storage per round. The edge table is used by every round's
    # join and is released at return; the FINAL label table backs the
    # returned DataFrame and must stay.
    sc = pairs.sparkSession.sparkContext

    def _persist_ids():
        return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}

    def _release(ids):
        m = sc._jsc.getPersistentRDDs()
        for i in ids:
            h = m.get(i)
            if h is not None:
                h.unpersist(False)

    before = _persist_ids()
    sym = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    sym_ids = _persist_ids() - before
    before = _persist_ids()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    label_ids = _persist_ids() - before
    for _ in range(max_iter):
        # min label among each node's neighbors
        neigh = (
            sym.join(labels, sym["dst"] == labels["node"])
            .select(F.col("src").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nmin"))
        )
        before = _persist_ids()
        new_labels = (
            labels.select("node", F.col("label").alias("old_label"))
            .join(neigh, "node", "left")
            .select(
                "node",
                "old_label",
                F.least(
                    F.col("old_label"),
                    F.coalesce(F.col("nmin"), F.col("old_label")),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        new_ids = _persist_ids() - before
        changed = (
            new_labels.filter(F.col("label") != F.col("old_label"))
            .limit(1)
            .count()
        )
        # new_labels' eager checkpoint holds its own blocks now — the
        # superseded round's blocks have no future readers
        _release(label_ids)
        label_ids = new_ids
        labels = new_labels.select("node", "label")
        if changed == 0:
            _release(sym_ids)
            return labels.select(
                F.col("node").alias("node_id"),
                F.col("label").alias("canonical_id"),
            )
    raise RuntimeError(
        f"dedup_components did not converge within {max_iter} rounds"
    )


def token_hashes_col(text_col: str):
    """xxhash64 of each whitespace token, as an array<long> column (JVM).

    Empty/whitespace-only text must yield an EMPTY array, not [''] —
    split('', '\\s+') returns one empty token, which would give every
    blank doc the same simhash(xxhash64('')) and let them chunk-collide
    with real documents; bitvote64 maps the empty array to fingerprint 0
    (the pre-round-1 semantics for token-less docs)."""
    return F.transform(
        F.filter(
            F.split(F.trim(F.col(text_col)), "\\s+"),
            lambda t: t != "",
        ),
        lambda t: F.xxhash64(t),
    )


@pandas_udf(LongType())
def bitvote64(token_hashes: pd.Series) -> pd.Series:
    """SimHash bit-vote over precomputed token hashes — one numpy matrix
    op per row, no hashing in Python.

    Division of labor chosen by measurement: token hashing stays JVM-side
    (xxhash64 in a transform — tiny expression, codegen-cheap), only the
    64-bit majority vote crosses into numpy. The two rejected extremes:
    all-Python (per-token blake2b loop: 2.3× slower end-to-end) and
    all-Catalyst (64 separate array-aggregate votes: fast warm but the
    generated code is so large that cold codegen compile costs more than
    the query)."""
    out = np.zeros(len(token_hashes), dtype=np.int64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for i, arr in enumerate(token_hashes):
        if arr is None or len(arr) == 0:
            continue
        a = np.asarray(arr, dtype=np.int64).view(np.uint64)
        bits = (a[:, None] >> bit_idx) & np.uint64(1)  # (n_tokens, 64)
        majority = bits.sum(axis=0) * 2 > len(a)
        sim = (majority.astype(np.uint64) << bit_idx).sum(dtype=np.uint64)
        out[i] = np.int64(sim)
    return pd.Series(out)


def simhash_near_dups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, bucketed to avoid the
    all-pairs join: split the 64-bit hash into (max_hamming+1) chunks — by
    pigeonhole, any pair within max_hamming shares at least one exact chunk,
    so the join key is (chunk_idx, chunk_value)."""
    chunks = max_hamming + 1
    bits = 64 // chunks
    h = df.select(F.col(id_col), token_hashes_col(text_col).alias("_th")).select(
        id_col, bitvote64(F.col("_th")).alias("sh")
    )
    keyed = h.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("sh"), i * bits)
                        .bitwiseAND(F.lit((1 << bits) - 1))
                        .alias("key"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select(id_col, "sh", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    # avoid recomputing the hash UDF per join side; released by cache_scope
    keyed = scoped_persist(keyed)
    l, r = keyed.alias("l"), keyed.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Cross-document line dedup (the CCNet boilerplate pass): drop every
    line whose exact content appears in >= min_docs DISTINCT documents
    (headers, footers, nav chrome, cookie banners), keep the rest in
    original order.

    Returns one row per input doc:
    (id_col, clean_text, n_kept:long, n_removed:long) — a doc whose every
    line is boilerplate comes back with clean_text = '' and n_kept = 0,
    never dropped from the output.

    Scale shape for a 100 TB corpus:
    - lines are a flat posexplode (no shuffle), keyed by xxhash64(line)
      so the counting shuffle carries 8-byte digests, not line text;
    - boilerplate election is ONE map-side-combinable agg
      (count_distinct(doc) per digest >= min_docs). The surviving
      boilerplate set is heavy-hitters-only — metadata-sized next to the
      corpus — so it BROADCASTS back onto the line stream as a LEFT join
      carrying only a flag, and the corpus-grain side never shuffles for
      the filter;
    - reassembly is the one unavoidable doc-keyed shuffle. The flag join
      (rather than a left_anti) keeps removed lines in the stream, so a
      single groupBy(doc) yields kept text AND both counts — no third
      scan of the source for per-doc totals and no corpus-grain
      join-back (collect_list skips the nulls the when() leaves on
      boilerplate rows). Line-grain intermediates are deliberately NOT
      persisted: at corpus scale they are as large as the input, so the
      two passes (election, reassembly) re-scan the columnar, pruned
      source instead of pinning executor storage.
    """
    pat = re.escape(sep)
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), pat)).alias("pos", "line"),
    ).withColumn("dg", F.xxhash64("line"))
    boiler = (
        lines.groupBy("dg")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("dg", F.lit(True).alias("is_boiler"))
    )
    flagged = lines.join(F.broadcast(boiler), "dg", "left")
    kept_struct = F.when(
        F.col("is_boiler").isNull(), F.struct("pos", "line")
    )
    return flagged.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
        F.count(kept_struct).alias("n_kept"),
        F.count("is_boiler").alias("n_removed"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    shingle_n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any n-word
    shingle with an eval/benchmark corpus (the pre-training hygiene step
    that keeps test sets out of the training data).

    Returns one row per corpus doc:
    (id_col, n_contaminated:long, contaminated:int) — n_contaminated is
    the number of DISTINCT doc shingles that also occur in the benchmark.

    Scale shape: the benchmark side is eval-set-sized (millions of
    shingles at most), so its distinct digest set BROADCASTS; the corpus
    side is a flat explode of hashed shingles (no shuffle) filtered by
    the broadcast hash join, and the only shuffle is the per-doc hit
    count over the MATCHED rows — rare by construction in a clean corpus.
    The final join-back of the hit table onto the doc ids is
    metadata-sized (AQE broadcasts it)."""
    bench = (
        benchmark.select(
            F.explode(shingle_hashes(bench_text_col, shingle_n)).alias("dg")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(shingle_hashes(text_col, shingle_n)).alias("dg")
    )
    hits = (
        doc_grams.join(F.broadcast(bench), "dg")
        .groupBy(id_col)
        .agg(F.count("*").alias("_n"))
    )
    return (
        docs.select(F.col(id_col))
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_contaminated"),
            (F.coalesce(F.col("_n"), F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


def near_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    threshold: float = 0.7,
    n_hashes: int = 64,
    bands: int = 32,
    shingle_n: int = 3,
    method: str = "classic",
) -> DataFrame:
    """FUZZY benchmark decontamination: flag corpus docs that are
    near-duplicates of any eval/benchmark doc (n-gram Jaccard >=
    threshold), not just exact-shingle sharers (`decontaminate`). This
    is the Llama/GPT-3-style leakage gate — a test item that was
    lightly paraphrased or truncated upstream still shares most of its
    shingles, evades exact matching, and inflates the benchmark.

    Shape: MinHash band keys on BOTH corpora (minhash_bands — the same
    keys the streaming manifest and the self-join dedup use), candidate
    pairs from a (band, bucket) equi-join with the benchmark side
    BROADCAST (eval suites are metadata-sized next to the corpus), then
    EXACT hashed-shingle Jaccard verification of candidates only. The
    verify stage makes the output insensitive to spurious bucket
    collisions — a false candidate scores ~0 and never flags — so
    correctness rests on exact set arithmetic, with LSH only deciding
    how much work the verifier sees. Default bands=32 (2 rows/band)
    holds pair recall >= 1-4e-13 at J=0.77 and higher above it.

    Returns one row per corpus doc:
    (id_col, max_jaccard:double, contaminated:int).

    Scale: the corpus is scanned twice (band keys; shingle sets for the
    candidate subset — semi-joined against the broadcast candidate ids,
    so only suspects materialize shingles through the join). No
    corpus-side shuffle wider than the candidate set; the final
    join-back onto doc ids is a broadcast of the metadata-sized hit
    table."""
    bands_d = minhash_bands(
        docs, text_col, id_col, n_hashes, bands, shingle_n, method=method
    )
    bands_b = minhash_bands(
        benchmark, bench_text_col, bench_id_col, n_hashes, bands,
        shingle_n, method=method,
    )
    cand = (
        bands_d.join(F.broadcast(bands_b), ["band", "bucket"])
        .select(id_col, bench_id_col)
        .distinct()
    )
    cand = scoped_persist(cand)
    doc_sh = docs.select(
        F.col(id_col), shingle_hashes(text_col, shingle_n).alias("_sh_d")
    )
    ben_sh = benchmark.select(
        F.col(bench_id_col),
        shingle_hashes(bench_text_col, shingle_n).alias("_sh_b"),
    )
    jac = (
        F.size(F.array_intersect("_sh_d", "_sh_b"))
        / F.size(F.array_union("_sh_d", "_sh_b"))
    ).alias("_j")
    hits = (
        doc_sh.join(F.broadcast(cand), id_col)
        .join(F.broadcast(ben_sh), bench_id_col)
        .select(F.col(id_col), jac)
        .groupBy(id_col)
        .agg(F.max("_j").alias("_mj"))
    )
    return (
        docs.select(F.col(id_col))
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_mj"), F.lit(0.0)).alias("max_jaccard"),
            (F.coalesce(F.col("_mj"), F.lit(0.0)) >= F.lit(float(threshold)))
            .cast("int")
            .alias("contaminated"),
        )
    )


def dedup_representatives(
    groups: DataFrame,
    quality: Optional[DataFrame] = None,
    id_col: str = "node_id",
    group_col: str = "canonical_id",
    quality_col: str = "quality",
    broadcast_keepers: bool = True,
) -> DataFrame:
    """One keeper per duplicate group — the last step of a dedup pipeline
    (minhash/simhash/embedding pairs → dedup_components groups → keep one
    doc per group, drop the rest).

    Keeper rule: highest quality wins, ties break to the smallest id;
    with no quality table the smallest id wins outright (deterministic
    either way — a re-run keeps the same docs). Docs absent from the
    quality table rank below every scored doc (quality −inf), never above.

    Returns (id_col, group_col, keep:int) for every grouped doc.

    Scale shape (10^12 docs, group rows ≪ corpus): an optional join to
    attach quality, then ONE hash-agg shuffle keyed on the group — the
    keeper election is min(struct(−quality, id)), which partial-aggregates
    map-side — and the elected keepers (ONE row per group) broadcast back
    onto the group rows. The group-row side never shuffles twice and
    nothing corpus-sized moves at all."""
    g = groups.select(F.col(id_col), F.col(group_col))
    if quality is not None:
        g = g.join(
            quality.select(F.col(id_col), F.col(quality_col)), id_col, "left"
        )
        rank = -F.coalesce(
            F.col(quality_col).cast("double"), F.lit(float("-inf"))
        )
    else:
        rank = F.lit(0.0)
    keepers = (
        g.groupBy(group_col)
        .agg(
            F.min(
                F.struct(rank.alias("_nq"), F.col(id_col).alias("_id"))
            ).alias("_k")
        )
        .select(F.col(group_col), F.col("_k._id").alias("_keep_id"))
    )
    k = F.broadcast(keepers) if broadcast_keepers else keepers
    return (
        g.join(k, group_col)
        .withColumn("keep", (F.col(id_col) == F.col("_keep_id")).cast("int"))
        .select(id_col, group_col, "keep")
    )


def dedup_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    n_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    min_shingles: int = 1,
    quality: Optional[DataFrame] = None,
) -> DataFrame:
    """The complete near-dup dedup DAG in one call:

        LSH candidates → exact n-gram-Jaccard verify (≥ threshold) →
        connected components → keeper election → full keep/drop list.

    Returns one row PER INPUT DOC: (id_col, group_id, keep:int). Docs in
    no near-dup group are their own group with keep=1; grouped docs keep
    exactly one member (highest quality / smallest id —
    dedup_representatives rules).

    Composes the individually-scale-shaped operators without adding any
    new shuffle: signatures map-side, banded bucket self-join, broadcast
    -pairs verify on precomputed shingles (computed ONCE here and shared
    by the size filter, the signatures, and the verify), O(diameter)
    checkpointed label propagation, map-side keeper election + broadcast
    join-back, and a final left join of the group table onto the corpus
    ids (AQE broadcasts it when small). Wrap calls in ops.cache.cache_scope()
    to release the operator persists when done."""
    sh = scoped_persist(
        docs.select(
            F.col(id_col), shingle_hashes(text_col, shingle_n).alias("_sh")
        ).filter(F.size(F.col("_sh")) >= min_shingles)
    )
    cands = minhash_lsh_candidates(
        sh, id_col=id_col, n_hashes=n_hashes, bands=bands, shingles_col="_sh"
    )
    verified = ngram_jaccard(cands, sh, id_col=id_col, shingles_col="_sh").filter(
        F.col("jaccard") >= jaccard_threshold
    )
    groups = dedup_components(verified)
    reps = dedup_representatives(
        groups,
        quality.withColumnRenamed(id_col, "node_id") if quality is not None else None,
        id_col="node_id",
        group_col="canonical_id",
    )
    # NO forced broadcast here: the group table is one row per GROUPED
    # DOC — metadata-sized on typical corpora (AQE broadcasts it), but at
    # duplicate-heavy extremes it is a real table and the id-keyed
    # shuffle join is the correct shape
    ids = docs.select(F.col(id_col))
    joined = ids.join(reps.withColumnRenamed("node_id", id_col), id_col, "left")
    return joined.select(
        id_col,
        F.coalesce(F.col("canonical_id"), F.col(id_col)).alias("group_id"),
        F.coalesce(F.col("keep"), F.lit(1)).alias("keep"),
    )


def repeated_passages(
    docs: DataFrame,
    k: int = 20,
    stride: int = 10,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-repeated passage flagging: slide a k-token window every
    `stride` tokens, and count how many of a doc's windows also occur in
    >= min_docs DISTINCT documents — the passage-granular counterpart of
    `line_dedup` (licence blocks, syndicated intros, templated sections
    that don't align to line boundaries).

    Returns one row per doc:
    (id_col, n_windows:long, n_repeated:long, repeated_frac:double).
    Docs shorter than k tokens contribute one truncated window, so no
    doc divides by zero or vanishes.

    Scale shape (same as line_dedup): window digests are built in ONE
    codegen'd projection — each token hashed once, each window one
    fixed-arity xxhash64 over its k token hashes (F.get past the end is
    null and xxhash64 skips nulls, which truncates the final window
    instead of erroring); the election is a map-side-combinable
    count_distinct over 8-byte digests; the surviving repeated-passage
    set is heavy-hitters-only, so it BROADCASTS back as a flag join and
    the per-doc rollup is the one doc-keyed shuffle.
    """
    if k <= 0 or stride <= 0:
        raise ValueError(f"k and stride must be positive, got k={k} stride={stride}")

    def mk(th):
        n_win = F.greatest(
            F.floor((F.size(th) - k) / stride).cast("int") + 1, F.lit(1)
        )
        return F.transform(
            F.sequence(F.lit(0), n_win - 1),
            lambda w: F.xxhash64(
                *[F.get(th, w * stride + j) for j in range(k)]
            ),
        )

    token_hashes = F.transform(
        F.split(F.col(text_col), " "), lambda t: F.xxhash64(t)
    )
    wins = docs.select(
        F.col(id_col), F.explode(bind(token_hashes, mk)).alias("dg")
    )
    repeated = (
        wins.groupBy("dg")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("dg", F.lit(True).alias("is_rep"))
    )
    flagged = wins.join(F.broadcast(repeated), "dg", "left")
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_windows"),
        F.count("is_rep").alias("n_repeated"),
        (F.count("is_rep") / F.count("*")).alias("repeated_frac"),
    )


def remove_repeated_passages(
    docs: DataFrame,
    k: int = 20,
    stride: int = 10,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut corpus-repeated passages OUT of the text — the removal step
    of exact-substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): a window that occurs in >=
    min_docs distinct documents is removed from EVERY document, and the
    surviving tokens are reassembled in order. `repeated_passages`
    above is the measurement pass; this is the mutation.

    Returns one row per input doc: (id_col, text = cleaned,
    n_tokens:long = surviving tokens, n_removed:long). Overlapping
    flagged windows merge naturally (a token is cut if ANY flagged
    window covers it); a fully-templated doc cleans to ''. Tokens
    between windows (stride > k gaps) are never cut — only positions a
    flagged window actually covers.

    Scale shape: same election as repeated_passages (one codegen'd
    window-digest projection, map-side count_distinct, broadcast
    repeated set), then the per-doc cut lists — only docs that HIT a
    repeated passage, carrying window indices, not text — join back to
    the corpus doc-keyed; the rebuild is one codegen'd filter+join
    projection. The per-token cut test is exists() over the doc's cut
    list: O(tokens x flagged windows) per doc, worst-case quadratic
    only for a doc that is itself almost entirely repeated passages.
    """
    if k <= 0 or stride <= 0:
        raise ValueError(f"k and stride must be positive, got k={k} stride={stride}")

    def mk(th):
        n_win = F.greatest(
            F.floor((F.size(th) - k) / stride).cast("int") + 1, F.lit(1)
        )
        return F.transform(
            F.sequence(F.lit(0), n_win - 1),
            lambda w: F.xxhash64(
                *[F.get(th, w * stride + j) for j in range(k)]
            ),
        )

    token_hashes = F.transform(
        F.split(F.col(text_col), " "), lambda t: F.xxhash64(t)
    )
    wins = docs.select(
        F.col(id_col), F.posexplode(bind(token_hashes, mk)).alias("w", "dg")
    )
    repeated = (
        wins.groupBy("dg")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("dg")
    )
    cuts = (
        wins.join(F.broadcast(repeated), "dg")
        .groupBy(id_col)
        .agg(F.collect_list("w").alias("_cut_w"))
    )
    joined = docs.join(cuts, id_col, "left").withColumn(
        "_cut_w", F.coalesce(F.col("_cut_w"), F.array().cast("array<int>"))
    )

    def rebuild(tokens):
        kept = F.filter(
            tokens,
            lambda t, i: ~F.exists(
                F.col("_cut_w"),
                lambda w: (i >= w * stride) & (i < w * stride + k),
            ),
        )
        return F.struct(
            F.array_join(kept, " ").alias("clean"),
            F.size(kept).cast("long").alias("n_tokens"),
            (F.size(tokens) - F.size(kept)).cast("long").alias("n_removed"),
        )

    out = joined.withColumn(
        "_r", bind(F.split(F.col(text_col), " "), rebuild)
    )
    return out.select(
        id_col,
        F.col("_r.clean").alias(text_col),
        F.col("_r.n_tokens").alias("n_tokens"),
        F.col("_r.n_removed").alias("n_removed"),
    )


def edit_similarity_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    prefix_len: int = 2000,
) -> DataFrame:
    """Exact character-level edit-distance verification of candidate
    pairs — the precision stage behind an LSH/simhash recall stage
    (minhash_lsh_candidates / simhash_near_dups produce the (id_a,
    id_b) pairs; this scores them).

    edit_sim = 1 - levenshtein(a, b) / max(|a|, |b|) over the first
    `prefix_len` characters of each side, keep = edit_sim >= threshold.
    Both-empty pairs score 1.0 (identical). Everything is JVM Catalyst
    (`levenshtein` is a built-in, codegen'd) — zero Python.

    Scale shape: `pairs` is metadata-width BY CONTRACT (bounded by the
    candidate generator's banding/bucketing, the same contract as
    ngram_jaccard's verify stage), so both id-keyed joins broadcast the
    pair side under AQE and the corpus is scanned, never shuffled. The
    `prefix_len` cap bounds the O(|a|·|b|) DP per pair — the standard
    operating point for document-scale edit verification (full-text
    quadratic DP on two 1 MB docs is never the right call; raise the
    cap deliberately if the corpus is short-doc)."""
    a = docs.select(
        F.col(id_col).alias("id_a"),
        F.substring(F.col(text_col), 1, prefix_len).alias("_ta"),
    )
    b = docs.select(
        F.col(id_col).alias("id_b"),
        F.substring(F.col(text_col), 1, prefix_len).alias("_tb"),
    )
    j = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    dist = F.levenshtein(F.col("_ta"), F.col("_tb"))
    big = F.greatest(F.length("_ta"), F.length("_tb"))
    sim = F.when(big > 0, F.lit(1.0) - dist.cast("double") / big).otherwise(
        F.lit(1.0)
    )
    return j.select(
        "id_a",
        "id_b",
        dist.alias("edit_dist"),
        sim.alias("edit_sim"),
        (sim >= F.lit(float(threshold))).cast("int").alias("keep"),
    )


def normalize_code_col(text_col: str):
    """Formatting-invariant normal form for source code — the surface
    The Stack–style code dedup hashes instead of raw bytes, so files
    differing only in comments, blank lines, indentation, or trailing
    whitespace collapse to one group:

    1. strip /* */ block comments ((?s) non-greedy), // and # line
       comments (string-literal-aware stripping needs a tokenizer; the
       heuristic over-strips a # inside a string — documented, and the
       standard recipe accepts it);
    2. trim per-line edges, drop blank lines, collapse inner runs of
       whitespace to one space.

    Alpha-renaming (identifier-invariant dedup) is deliberately out of
    scope: it changes the semantics class from "same file reformatted"
    to "same algorithm", which the near-dup operators (minhash over the
    normal form) already cover. All patterns in the Java∩RE2 subset so
    the SQL oracle replays them verbatim."""
    t = F.col(text_col)
    t = F.regexp_replace(t, r"(?s)/\*.*?\*/", "")
    t = F.regexp_replace(t, r"(?m)//[^\n]*", "")
    t = F.regexp_replace(t, r"(?m)#[^\n]*", "")
    t = F.regexp_replace(t, r"(?m)^[ \t]+|[ \t]+$", "")
    t = F.regexp_replace(t, r"[ \t]+", " ")
    t = F.regexp_replace(t, r"\n{2,}", "\n")
    return F.regexp_replace(t, r"^\n+|\n+$", "")


def code_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup over the code normal form: keep min id per distinct
    NORMALIZED content. Same scale shape as exact_dedup — the shuffle
    key is the 32-byte sha2 of the normal form, computed in the same
    codegen'd projection as the normalization chain; map-side partial
    agg collapses local duplicates before the exchange."""
    return (
        df.groupBy(
            F.sha2(normalize_code_col(text_col), 256).alias("digest")
        )
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("dup_count"),
        )
        .select(id_col, "dup_count")
    )
