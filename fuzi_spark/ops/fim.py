"""Fill-in-the-middle (FIM) training-example preparation (Bavarian et
al. 2022, arXiv:2207.14255 — the code-model infilling recipe).

FIM training rewrites a fraction of documents from `text` into
`<PRE> prefix <SUF> suffix <MID> middle` (PSM mode) so the model
learns to infill; the rest pass through unchanged. At corpus scale the
transform must be (a) a pure projection — no Python, no shuffle — and
(b) DETERMINISTIC: re-runs, resumes, and cluster-size changes must
produce byte-identical training rows (the sampling.py contract), so
both the apply/skip decision and the two split points derive from md5
of the document key, never an RNG.

Split-point derivation: two md5 draws u1, u2 in [0,1) (the 8-hex
bucket / 2^32 construction shared with dsir's Gumbel), scaled to char
positions; lo = min, hi = max, so prefix = text[0:lo), middle =
text[lo:hi), suffix = text[hi:]. Reassembling prefix+middle+suffix
always reproduces the source exactly (pinned) — the transform is
lossless reordering plus sentinels.

Reference parity note: no counterpart in the reference — pipeline-
brief scope (code/infilling training data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRE, SUF, MID = "<PRE>", "<SUF>", "<MID>"


def _unit(key, salt: str):
    """Deterministic uniform in [0,1): md5 8-hex of '<salt>:<key>'."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    return h / F.lit(4294967296.0)


def fim_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rate: float = 0.5,
    min_chars: int = 8,
) -> DataFrame:
    """Adds (fim_applied:boolean, fim_text:string). Documents selected
    by the deterministic `rate` gate (md5 of the id — content-stable)
    and long enough (`min_chars`) are rewritten PSM; everything else
    passes through with fim_applied = false and fim_text = text.

    Split points: lo/hi = ordered pair of two md5-uniform draws scaled
    over [0, len]; degenerate draws (lo == hi, empty middle) are valid
    FIM examples per the paper (the model must learn to emit an empty
    infill)."""
    key = F.col(id_col)
    n = F.length(F.col(text_col))
    apply_ = (_unit(key, "fim-gate") < F.lit(float(rate))) & (
        n >= F.lit(int(min_chars))
    )
    p1 = F.floor(_unit(key, "fim-a") * (n + 1).cast("double")).cast("int")
    p2 = F.floor(_unit(key, "fim-b") * (n + 1).cast("double")).cast("int")
    lo = F.least(p1, p2)
    hi = F.greatest(p1, p2)
    # substring is 1-based: prefix = [1, lo], middle = (lo, hi],
    # suffix = (hi, len]
    prefix = F.col(text_col).substr(F.lit(1), lo)
    middle = F.col(text_col).substr(lo + 1, hi - lo)
    suffix = F.col(text_col).substr(hi + 1, n - hi)
    psm = F.concat(
        F.lit(PRE), prefix, F.lit(SUF), suffix, F.lit(MID), middle
    )
    return df.withColumn("fim_applied", apply_).withColumn(
        "fim_text", F.when(apply_, psm).otherwise(F.col(text_col))
    )


def span_corruption(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    max_span: int = 3,
) -> DataFrame:
    """T5 span-corruption example prep (Raffel et al. 2020,
    arXiv:1910.10683): rewrite each document into the
    (inputs, targets) pair of the denoising objective — inputs is the
    token sequence with corrupted spans replaced by <extra_id_i>
    sentinels, targets the sentinel-prefixed corrupted spans in order.

    Deterministic-by-construction variant (the fim_split contract: no
    RNG, so re-runs/resumes/cluster-size changes are byte-identical):
    the token sequence is cut into fixed `window`-token windows and
    each window corrupts exactly ONE span — length 1..max_span and
    in-window offset both md5-derived from (doc id, window index).
    Corruption rate is mean_span/window (~10% at defaults, T5's 15%
    at window=13), and sentinels number one per window, matching T5's
    practice of bounding the sentinel vocabulary.

    Returns (id_col, inputs:string, targets:string, n_tokens:long,
    n_corrupted:long). Empty/blank docs emit empty strings and zero
    counts — never dropped.

    Scale shape: ONE codegen'd projection — tokenize, a transform over
    the window-index sequence (two md5 draws + three slices per
    window), flatten, concat_ws. No Python, no shuffle, no explode:
    the windows never leave their row.
    """
    w = int(window)
    if w < 2 or int(max_span) < 1 or int(max_span) >= w:
        raise ValueError(
            f"need window >= 2 and 0 < max_span < window, got "
            f"window={window} max_span={max_span}"
        )
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    n = F.size(toks)
    nwin = F.floor((n + F.lit(w - 1)) / F.lit(w)).cast("int")
    wins = F.when(nwin > 0, F.sequence(F.lit(0), nwin - 1)).otherwise(
        F.array().cast("array<int>")
    )
    key = F.col(id_col)

    def draw(salt, i):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(salt), key.cast("string"), i.cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        return h / F.lit(4294967296.0)

    def pieces(i, emit):
        ws = i * w
        wl = F.least(F.lit(w), n - ws)
        span = F.least(
            (F.floor(draw("t5len", i) * max_span) + 1).cast("int"), wl
        )
        off = F.floor(draw("t5off", i) * (wl - span + 1)).cast("int")
        sent = F.concat(F.lit("<extra_id_"), i.cast("string"), F.lit(">"))
        return emit(ws, wl, span, off, sent)

    def inp(ws, wl, span, off, sent):
        return F.concat(
            F.slice(toks, ws + 1, off),
            F.array(sent),
            F.slice(toks, ws + off + span + 1, wl - off - span),
        )

    def tgt(ws, wl, span, off, sent):
        return F.concat(F.array(sent), F.slice(toks, ws + off + 1, span))

    inputs = F.flatten(F.transform(wins, lambda i: pieces(i, inp)))
    targets = F.flatten(F.transform(wins, lambda i: pieces(i, tgt)))
    return df.select(
        F.col(id_col),
        F.concat_ws(" ", inputs).alias("inputs"),
        F.concat_ws(" ", targets).alias("targets"),
        n.cast("long").alias("n_tokens"),
        # each target piece is one sentinel + its span
        (F.size(targets) - nwin).cast("long").alias("n_corrupted"),
    )
