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
