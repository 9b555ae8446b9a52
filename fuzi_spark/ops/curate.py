"""One-call corpus curation: the hygiene DAG end-to-end.

A production pre-training pipeline chains its gates in a fixed order —
domain blocklist, URL-level dedup, language ID, quality rules, exact
content dedup, benchmark decontamination — and each stage sees only the
SURVIVORS of the previous one. The sequencing is semantic, not just
cost: an election stage (URL/exact dedup) must elect among documents
that passed the earlier gates, or a kept representative can itself be
one the earlier gates would have rejected while its discarded twin was
fine.

`curate` composes the individually-oracle-checked operators in that
order (ops/web.py, ops/textstats.py, ops/dedup.py) and emits one row
per INPUT doc with a first-failure reason code — the quality_filter
contract lifted to the whole pipeline.

Execution shape (round-3, second rework): ONE pass. Every stage is a
column expression over the same frame, and "sees only the survivors"
is encoded with precedence masks instead of anti-joins: a stage's
condition is AND-ed with "no earlier stage fired", and the two
election stages (URL/exact dedup) elect with a CONDITIONAL window-min
— `min(when(no_earlier_reject, id)) over (partition by key)` — which
is exactly "min id among survivors of the prior gates" without ever
materializing the survivor set. The first formulation chained lazy
filters (every stage's UDFs re-ran O(k) times); the second
materialized per-stage reject sets and anti-joined survivors forward,
which ran each stage's work once but still re-scanned the corpus once
per stage branch — k full input scans at 100 TB. This formulation
reads the corpus once for the whole row-local gate stack; the only
exchanges are the two election windows (hash by _canon, then by
content digest). Each OPTIONAL model-backed stage (LM perplexity, NB
classifier, decontamination) adds one more corpus scan of its own —
a column-pruned (id, text) branch feeding a map-side explode, whose
skinny per-doc score frame joins back by id. Those branches score ALL
docs rather than prior-stage survivors — a deliberate trade: scores
are row-local so verdicts are mask-invariant (precedence picks the
first fired reason), and scoring the full input keeps the branch
map-side, where scoping it to survivors would first materialize the
survivor id set and shuffle the corpus through a semi-join. When a
cheap-gate pass is expected to reject most of a corpus AND the model
stages dominate cost, run curate twice: a first pass with only the
cheap gates, write survivors, then a second pass with the model
stages — the two-pass composition is exactly the staged semantics.
Row-local stages likewise score all docs; a scan-wide vectorized
pass beats per-stage rescans long before 100 TB.

Stage order and reason codes:

    1. 'blocked_domain'     url host on the blocklist
    2. 'blocked_word'       text contains a blocked-wordlist token
                            (optional: pass blocked_words — the C4
                            content gate; runs early because it is a
                            pure scan predicate)
    3. 'script_spoof'       adjacent confusable-script letters —
                            homoglyph spam (optional: pass
                            reject_script_spoof=True; a pure scan
                            predicate, so it runs with the early
                            cheap gates)
    4. 'url_duplicate'      not the min-id for its canonical URL
    5. 'language'           lang_id(text) not in the allow list
    6. 'quality:<code>'     quality_filter rejection (code appended)
    7. 'compression:<code>' zlib-ratio extreme (optional: pass
                            zlib_bounds=(lo, hi); runs AFTER quality
                            so min_tokens has already pruned the
                            short docs whose zlib header skews the
                            ratio)
    8. 'perplexity'         LM perplexity above the cut (optional:
                            pass lm_model + max_perplexity)
    9. 'classifier'         learned NB quality gate assigns a label
                            other than nb_keep_label (optional: pass
                            nb_model from classify.train_nb)
    10. 'exact_duplicate'   not the min-id for its content digest
    11. 'contaminated'      shares an n-gram shingle with the eval set

Language runs BEFORE quality (the CCNet order): the quality rules are
Latin-script heuristics (Java \\w is ASCII), so a Cyrillic/CJK doc must
be routed by language, not mis-rejected as punctuation noise.

The single-pass plan persists nothing — there are no per-stage caches
to release, so curate composes into larger jobs with zero pinned
storage (the cache-hygiene contract the other operators meet via
ops.cache.cache_scope is met here by construction).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    url_col: Optional[str] = None,
    blocked_domains: Optional[DataFrame] = None,
    blocked_words: Optional[list[str]] = None,
    lang_allow: Optional[list[str]] = None,
    eval_set: Optional[DataFrame] = None,
    lm_model: Optional[tuple[DataFrame, DataFrame]] = None,
    max_perplexity: Optional[float] = None,
    nb_model: Optional[tuple[DataFrame, DataFrame]] = None,
    nb_keep_label: int = 0,
    min_tokens: int = 5,
    max_mean_token_len: float = 15.0,
    max_punct_ratio: float = 0.3,
    min_distinct_ratio: float = 0.2,
    shingle_n: int = 5,
    reject_script_spoof: bool = False,
    zlib_bounds: Optional[tuple[float, float]] = None,
) -> DataFrame:
    """Run the full hygiene DAG; see module docstring for stage order.

    Returns one row per input doc: (id_col, reject_reason:string,
    keep:int). Optional stages (blocklist, URL dedup, language, LM
    perplexity, decontamination) are skipped when their inputs are
    None. `lm_model` is the (unigrams, bigrams) pair from
    lm.train_bigram_lm — train it on a TRUSTED reference corpus, not
    on the corpus being curated (the CCNet contract); unscorable docs
    (<2 tokens) pass the LM stage, as in lm.perplexity_filter.
    `nb_model` is the (classes, token_lik) pair from classify.train_nb
    (same trusted-labels contract); docs the classifier assigns a
    label other than nb_keep_label reject with reason 'classifier'.
    """
    from .dedup import decontaminate
    from .textstats import lang_id, quality_filter
    from .web import canonicalize_url, host_of

    # (condition, reason) per stage, in precedence order. Conditions are
    # plain column expressions over the single accumulated frame `d`;
    # each election stage snapshots the OR of the earlier conditions as
    # its eligibility mask (= "survived every prior gate").
    stages: list[tuple] = []

    def fired_so_far():
        # NULL conditions mean "did not fire" (the staged formulation's
        # filter() semantics — a NULL predicate never rejects): coalesce
        # each to FALSE, or one NULL-scored doc (NULL text, unscorable
        # LM perplexity) would poison the whole OR to NULL and silently
        # disqualify the doc from the dedup elections.
        c = F.lit(False)
        for cond, _ in stages:
            c = c | F.coalesce(cond, F.lit(False))
        return c

    d = docs

    if url_col is not None and blocked_domains is not None:
        bl = (
            blocked_domains.select(F.lower(F.col("domain")).alias("_host"))
            .distinct()
            .withColumn("_bl_hit", F.lit(1))
        )
        d = d.withColumn("_host", host_of(url_col)).join(
            F.broadcast(bl), "_host", "left"
        )
        stages.append(
            (F.col("_bl_hit").isNotNull(), F.lit("blocked_domain"))
        )

    if blocked_words is not None:
        from .textstats import content_filter

        d = content_filter(d, blocked_words, text_col=text_col).drop(
            "keep", "reject_reason"
        )
        stages.append((F.col("n_blocked") > 0, F.lit("blocked_word")))

    if reject_script_spoof:
        from .textstats import script_mix

        d = script_mix(d, text_col=text_col)
        stages.append((F.col("script_spoof") == 1, F.lit("script_spoof")))

    if url_col is not None:
        # election among survivors of the prior gates: conditional
        # window-min — null ids (masked rows) are ignored by min().
        # NULL canonical URLs are NOT a duplicate group: partitionBy
        # groups all NULL keys together, and without the isNotNull
        # guard every distinct doc with a missing URL would lose the
        # election to the min-id one (a defect the staged formulation
        # shared; fixed here).
        d = d.withColumn("_canon", canonicalize_url(url_col))
        elig = ~fired_so_far() & F.col("_canon").isNotNull()
        m = F.min(F.when(elig, F.col(id_col))).over(
            Window.partitionBy("_canon")
        )
        stages.append(
            (elig & (F.col(id_col) != m), F.lit("url_duplicate"))
        )

    if lang_allow is not None:
        d = d.withColumn("_lang", lang_id(F.col(text_col)))
        stages.append(
            (~F.col("_lang").isin(*lang_allow), F.lit("language"))
        )

    # quality is always on: row-local first-failure code
    d = quality_filter(
        d,
        text_col,
        min_tokens=min_tokens,
        max_mean_token_len=max_mean_token_len,
        max_punct_ratio=max_punct_ratio,
        min_distinct_ratio=min_distinct_ratio,
    ).withColumnRenamed("reject_reason", "_q_reason").drop("keep")
    stages.append(
        (
            F.col("_q_reason").isNotNull(),
            F.concat(F.lit("quality:"), F.col("_q_reason")),
        )
    )

    if zlib_bounds is not None:
        from .textstats import compression_signals

        lo, hi = zlib_bounds
        d = compression_signals(
            d, text_col=text_col, min_ratio=lo, max_ratio=hi
        ).withColumnRenamed("reject_reason", "_z_reason").drop("keep")
        stages.append(
            (
                F.col("_z_reason").isNotNull(),
                F.concat(F.lit("compression:"), F.col("_z_reason")),
            )
        )

    if lm_model is not None and max_perplexity is not None:
        from .lm import lm_perplexity

        uni, bi = lm_model
        ppl = lm_perplexity(
            docs, uni, bi, text_col=text_col, id_col=id_col
        ).select(id_col, F.col("perplexity").alias("_ppl"))
        d = d.join(ppl, id_col, "left")
        stages.append(
            (F.col("_ppl") > float(max_perplexity), F.lit("perplexity"))
        )

    if nb_model is not None:
        from .classify import predict_nb

        classes, token_lik = nb_model
        pred = predict_nb(
            docs, classes, token_lik, text_col=text_col, id_col=id_col
        ).select(id_col, F.col("pred_label").alias("_nb_label"))
        d = d.join(pred, id_col, "left")
        stages.append(
            (
                F.col("_nb_label").isNotNull()
                & (F.col("_nb_label") != int(nb_keep_label)),
                F.lit("classifier"),
            )
        )

    # exact content dedup: election among survivors of ALL prior gates.
    # NULL text digests (sha2(NULL)=NULL) are not "identical content" —
    # same isNotNull guard rationale as the URL election above.
    d = d.withColumn("_dg", F.sha2(F.col(text_col), 256))
    elig2 = ~fired_so_far() & F.col("_dg").isNotNull()
    m2 = F.min(F.when(elig2, F.col(id_col))).over(Window.partitionBy("_dg"))
    stages.append(
        (elig2 & (F.col(id_col) != m2), F.lit("exact_duplicate"))
    )

    if eval_set is not None:
        contam = decontaminate(
            docs, eval_set, text_col=text_col, id_col=id_col,
            shingle_n=shingle_n,
        ).select(id_col, F.col("contaminated").alias("_contam"))
        d = d.join(contam, id_col, "left")
        stages.append((F.col("_contam") == 1, F.lit("contaminated")))

    reason = F.lit(None).cast("string")
    for cond, rsn in reversed(stages):
        reason = F.when(cond, rsn).otherwise(reason)
    return d.select(
        F.col(id_col),
        reason.alias("reject_reason"),
        reason.isNull().cast("int").alias("keep"),
    )
