"""Scalar int8 embedding quantization (storage-side compression).

A 100 TB corpus with float32 embeddings carries 4 bytes/dim it mostly
does not need: per-vector max-abs scalar quantization (the FAISS
`SQ8`-family baseline, also what vector stores ship as "int8") stores
1 byte/dim plus one float scale — a 4x footprint cut on the largest
column in the lake — while keeping cosine fidelity ~0.999 for typical
embedding distributions.

    scale = max_i |v_i| / 127
    q_i   = round_half_up(v_i / scale)   in [-127, 127]
    v'_i  = q_i * scale

Everything is per-row projection over array columns (transform /
aggregate / zip_with higher-order functions) — zero shuffles, zero
Python, whole-stage codegen — i.e. the cheapest possible pass over
the biggest table you own. `quantize_report` emits the quality
telemetry (reconstruction cosine, MSE, saturation count) you gate the
rewrite on; `quantize_embeddings` emits the storable rows.

Determinism: round-half-up is spelled floor(x + 0.5) explicitly so
any SQL engine replays the integer codes bit-for-bit (bankers'
rounding differs between engines; floor does not).

Reference parity note: the reference (kylehughes/Fuzi) has no
embedding surface — pipeline-brief scope (embedding-lake storage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _round_half_up(col):
    return F.floor(col + F.lit(0.5)).cast("long")


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, scale:double, codes:array<int>) — the storable form.
    All-zero vectors get scale 0 and all-zero codes (lossless)."""
    v = _as_double(vec_col)
    scale = (
        F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
        / F.lit(127.0)
    ).alias("scale")
    codes = F.when(
        F.col("scale") > 0,
        F.transform(
            v,
            lambda x: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), _round_half_up(x / F.col("scale"))),
            ).cast("int"),
        ),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return (
        df.select(F.col(id_col), F.col(vec_col), scale)
        .withColumn("codes", codes)
        .drop(vec_col)
    )


def quantize_report(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector quantization quality: (id, scale, n_sat, code_sum,
    cos_recon, mse). `n_sat` counts codes at +/-127 (saturation),
    `code_sum` is an integer checksum of the code array, `cos_recon`
    the cosine between the original and the dequantized vector (NULL
    for zero vectors), `mse` the mean squared reconstruction error.

    Gate recipe: require min(cos_recon) above a floor (0.999 for
    retrieval embeddings) before rewriting the lake to int8.

    Plan shape: everything is computed inline in ONE projection chain
    over a single scan — no self-join back to the codes (an earlier
    draft joined quantize_embeddings against the source and paid two
    scans plus a broadcast join for what is per-row arithmetic)."""
    v = _as_double(vec_col)
    scale = (
        F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
        / F.lit(127.0)
    )
    joined = df.select(
        F.col(id_col), v.alias("_v"), scale.alias("scale")
    ).withColumn(
        "codes",
        F.when(
            F.col("scale") > 0,
            F.transform(
                F.col("_v"),
                lambda x: F.greatest(
                    F.lit(-127),
                    F.least(F.lit(127), _round_half_up(x / F.col("scale"))),
                ).cast("int"),
            ),
        ).otherwise(F.transform(F.col("_v"), lambda x: F.lit(0))),
    )
    recon = F.zip_with(
        F.col("codes"), F.col("_v"), lambda c, _: c * F.col("scale")
    )
    dot = F.aggregate(
        F.zip_with(F.col("_v"), recon, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.sqrt(
        F.aggregate(F.col("_v"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    n2 = F.sqrt(
        F.aggregate(recon, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    err2 = F.aggregate(
        F.zip_with(F.col("_v"), recon, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return joined.select(
        F.col(id_col),
        "scale",
        F.size(F.filter(F.col("codes"), lambda c: F.abs(c) == 127)).alias(
            "n_sat"
        ),
        F.aggregate(
            F.col("codes"), F.lit(0).cast("long"), lambda acc, c: acc + c
        ).alias("code_sum"),
        F.when((n1 > 0) & (n2 > 0), dot / (n1 * n2)).alias("cos_recon"),
        (err2 / F.size(F.col("_v"))).alias("mse"),
    )


def pq_codebook(m: int, k: int, sub_dim: int) -> list:
    """The deterministic demo codebook used by the oracle-checked query:
    centroid value c[s][j][d] = (-1.0, -0.25, 0.25, 1.0)[(s + 3*j + d) % 4]
    — exact binary fractions (no decimal-literal drift between engines),
    distinct centroids within every subspace (3*j walks all four phases).
    Production callers fit real codebooks with pq_train (below) and
    pass them in; the encoding contract is identical."""
    vals = (-1.0, -0.25, 0.25, 1.0)
    return [
        [[vals[(s + 3 * j + d) % 4] for d in range(sub_dim)] for j in range(k)]
        for s in range(m)
    ]


def pq_train(
    vectors: DataFrame,
    m: int,
    k: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 100_000,
    n_iter: int = 12,
    seed: int = 42,
    normalize: bool = False,
) -> list:
    """Fit REAL per-subspace PQ codebooks (k-means, squared L2) —
    the trainer `pq_encode`/`cosine_topk_ivfpq` consume. Returns
    [m][k][D/m] plain floats.

    Training is DRIVER-SIDE numpy over a bounded deterministic sample,
    on purpose: FAISS trains PQ on a sample too (codebooks are
    metadata, m·k·D/m floats — a k=256, D=64 book is 16 KB), and a
    distributed Lloyd (ops/cluster.kmeans_fit) would pay full-corpus
    scans per iteration to fit what a 100k-row sample already
    determines. The sample is the sample_rows smallest xxhash64(id,
    seed) rows — the same distributed TakeOrderedAndProject device as
    ivf_centroids (ops/similarity), bounded collect regardless of
    table size, deterministic across layouts.

    Per subspace: seeded random init from distinct sample rows, Lloyd
    with vectorized distance matrices, empty cells reseeded from the
    point farthest from its centroid (same convention as
    ivf_centroids). k is capped at the sample size. normalize=True
    L2-normalizes sample vectors BEFORE slicing into subspaces — the
    codebook for cosine search over normalized codes (FAISS cosine
    practice; see cosine_topk_ivfpq)."""
    import numpy as np

    if m < 1 or k < 1:
        raise ValueError(f"pq_train: m={m}, k={k} must be positive")
    rows = (
        vectors.select(
            F.col(vec_col),
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("_r"),
        )
        .orderBy(F.col("_r").asc())
        .limit(sample_rows)
        .select(vec_col)
        .collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    if X.ndim != 2 or len(X) == 0:
        raise ValueError("pq_train: no vectors to train on")
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    if normalize:
        X = X / np.maximum(
            np.linalg.norm(X, axis=1, keepdims=True), 1e-12
        )
    sub = dim // m
    k_eff = min(k, len(X))
    books = []
    for s in range(m):
        Xs = np.ascontiguousarray(X[:, s * sub:(s + 1) * sub])
        rng = np.random.RandomState(seed + 1000 * s)
        cents = Xs[rng.choice(len(Xs), size=k_eff, replace=False)]
        for _ in range(n_iter):
            d2 = (
                (Xs * Xs).sum(axis=1)[:, None]
                - 2.0 * (Xs @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            best = d2[np.arange(len(Xs)), a]
            far_order = np.argsort(-best)  # worst-fit points first
            far_i = 0
            new = np.zeros_like(cents)
            for c in range(k_eff):
                members = Xs[a == c]
                if len(members):
                    new[c] = members.mean(axis=0)
                else:
                    # reseed each empty cell from a DISTINCT worst-fit
                    # point (same convention as ivf_centroids, made
                    # collision-free for multiple empties)
                    new[c] = Xs[int(far_order[far_i % len(far_order)])]
                    far_i += 1
            if np.allclose(new, cents):
                cents = new
                break
            cents = new
        books.append([[float(x) for x in c] for c in cents])
    return books


def _pq_validate(codebooks: list) -> tuple:
    m = len(codebooks)
    if m == 0:
        raise ValueError("codebooks must name at least one subspace")
    k = len(codebooks[0])
    sub = len(codebooks[0][0])
    for s, cb in enumerate(codebooks):
        if len(cb) != k or any(len(c) != sub for c in cb):
            raise ValueError(
                f"ragged codebook: subspace {s} is {len(cb)}x"
                f"{ {len(c) for c in cb} }, expected {k}x{sub}"
            )
    return m, k, sub


def pq_encode(
    df: DataFrame,
    codebooks: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "auto",
) -> DataFrame:
    """Product quantization (Jegou et al. 2011, the FAISS `PQ` family):
    split the D-dim vector into m contiguous subspaces of D/m dims, code
    each subvector as the index of its nearest codebook centroid
    (squared L2), and store m small ints instead of D floats — at the
    classic m=D/8, k=256 operating point that is D bytes -> m bytes, a
    32x cut on the lake's largest column, and the representation IVF-PQ
    search scans.

    `codebooks` is [m][k][D/m] floats (see pq_codebook for the demo one;
    fit real ones with per-subspace k-means over a bounded sample).
    Returns (id, code_0..code_{m-1}:int, recon_err:double) where
    recon_err is the total squared quantization error — the telemetry a
    codebook refresh is gated on.

    Two physical strategies, same values:
    - method='expr' (default for m*k <= 512): every distance is an
      inlined codegen'd arithmetic chain over element_at probes — zero
      shuffle, zero Python, and exactly replayable by a SQL oracle.
      Argmin ties break to the LOWEST centroid index via a first-min
      CASE chain (spelled identically in the oracle), not float
      equality tricks.
    - method='arrow' (default above that): one numpy batched distance
      matrix per Arrow batch — (rows, m, k) in one einsum-shaped
      broadcast — because a k=256 expression tree (m*k=2048 distance
      chains) is real Catalyst/codegen pressure. Same codes; recon_err
      may differ in final ulps (summation order), which the 6-sig-fig
      oracle rounding absorbs. tests pin expr==arrow code equality.
    """
    m, k, sub = _pq_validate(codebooks)
    if method == "auto":
        # the expr path's first-min CASE chain is O(k^2) comparisons
        # per subspace with the dist subtrees duplicated into each —
        # tree size ~ m * k^2 * sub nodes. Gate on that product, not
        # m*k: a trained k=256 book through 'expr' is a
        # Catalyst-analysis OOM, not a slow plan.
        method = (
            "expr" if (k <= 16 and m * k * k * sub <= 4096) else "arrow"
        )
    if method == "arrow":
        return _pq_encode_arrow(df, codebooks, vec_col, id_col, m, k, sub)

    v = F.col(vec_col)
    out_cols = [F.col(id_col)]
    err_total = None
    for s in range(m):
        dists = []
        for j in range(k):
            terms = None
            for d in range(sub):
                x = F.element_at(v, s * sub + d + 1).cast("double")
                diff = x - F.lit(codebooks[s][j][d])
                t = diff * diff
                terms = t if terms is None else terms + t
            dists.append(terms)
        # first-min CASE chain: centroid j wins iff it beats every later
        # one (<=) — deterministic, oracle-replayable tie-break
        code = None
        for j in range(k - 1, -1, -1):
            if code is None:
                code = F.lit(k - 1)
                continue
            cond = None
            for j2 in range(j + 1, k):
                c = dists[j] <= dists[j2]
                cond = c if cond is None else cond & c
            code = F.when(cond, F.lit(j)).otherwise(code)
        out_cols.append(code.cast("int").alias(f"code_{s}"))
        err_s = F.least(*dists)
        err_total = err_s if err_total is None else err_total + err_s
    out_cols.append(err_total.alias("recon_err"))
    return df.select(*out_cols)


def _pq_encode_arrow(
    df: DataFrame, codebooks: list, vec_col: str, id_col: str,
    m: int, k: int, sub: int,
) -> DataFrame:
    import numpy as np

    cb = np.asarray(codebooks, dtype=np.float64)  # (m, k, sub)
    id_field = df.schema[id_col]
    code_fields = ", ".join(f"code_{s} int" for s in range(m))
    out_schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        f"{code_fields}, recon_err double"
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            X = np.array(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            ).reshape(len(pdf), m, sub)
            # (rows, m, k): ||x - c||^2 for every centroid of every subspace
            d2 = ((X[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
            codes = d2.argmin(axis=2)  # numpy argmin = first-min, same rule
            err = d2.min(axis=2).sum(axis=1)
            out = {id_col: pdf[id_col]}
            for s in range(m):
                out[f"code_{s}"] = codes[:, s].astype("int32")
            out["recon_err"] = err
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col).mapInPandas(encode, out_schema)
