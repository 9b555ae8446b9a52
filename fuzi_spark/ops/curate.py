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

Execution shape (round-3 rework): each stage MATERIALIZES its reject
set — (id, reason) rows, scoped_persist'd — and the next stage's input
is one anti-join of the survivors against that cached id set. The
first formulation chained lazy filters instead, which put every
stage's computation into every downstream branch's lineage: with k
stages the language-ID pandas UDF, the perplexity explode+model-join
subplan, and the election shuffles each re-ran O(k) times across the
reject branches and the final assembly (measured 5.6 s → the rework
targets the constituent-sum). Now each stage's own work executes
exactly once, the cached reject sets are metadata-width (id + short
reason), and the anti-joins broadcast under AQE whenever the reject
side is small — the common case. Elections (URL/exact dedup) use a
window-min over the group key instead of groupBy+self-join: one
exchange, no second derivation of the keyed projection.

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

Callers composing curate with other operators should wrap the action
in ops.cache.cache_scope() so the per-stage reject caches release on
exit; standalone use relies on session teardown, same contract as the
other operators.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cache import scoped_persist


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

    rejects: list[DataFrame] = []
    cur = docs

    def reject_stage(reject_rows: DataFrame, reason_col) -> DataFrame:
        """Materialize one stage's reject set — (id, reason), cached —
        append it to the union, and return the survivors: the stage
        input anti-joined against the cached ids. The stage's own
        computation lives only inside this materialization, so it
        executes once, not once per downstream branch."""
        r = scoped_persist(
            reject_rows.select(
                F.col(id_col), reason_col.alias("reject_reason")
            )
        )
        rejects.append(r)
        return cur.join(r.select(id_col), id_col, "left_anti")

    if url_col is not None and blocked_domains is not None:
        bl = (
            blocked_domains.select(F.lower(F.col("domain")).alias("_host"))
            .distinct()
        )
        h = cur.withColumn("_host", host_of(url_col))
        cur = reject_stage(
            h.join(F.broadcast(bl), "_host"), F.lit("blocked_domain")
        )

    if blocked_words is not None:
        from .textstats import content_filter

        cf = content_filter(cur, blocked_words, text_col=text_col)
        cur = reject_stage(
            cf.filter(F.col("n_blocked") > 0), F.lit("blocked_word")
        )

    if reject_script_spoof:
        from .textstats import script_mix

        sm = script_mix(cur, text_col=text_col)
        cur = reject_stage(
            sm.filter(F.col("script_spoof") == 1), F.lit("script_spoof")
        )

    if url_col is not None:
        c = cur.withColumn("_canon", canonicalize_url(url_col))
        win = F.min(id_col).over(Window.partitionBy("_canon"))
        cur = reject_stage(
            c.withColumn("_win", win).filter(F.col(id_col) != F.col("_win")),
            F.lit("url_duplicate"),
        )

    if lang_allow is not None:
        lg = cur.withColumn("_lang", lang_id(F.col(text_col)))
        cur = reject_stage(
            lg.filter(~F.col("_lang").isin(*lang_allow)), F.lit("language")
        )

    q = quality_filter(
        cur,
        text_col,
        min_tokens=min_tokens,
        max_mean_token_len=max_mean_token_len,
        max_punct_ratio=max_punct_ratio,
        min_distinct_ratio=min_distinct_ratio,
    )
    cur = reject_stage(
        q.filter(F.col("keep") == 0),
        F.concat(F.lit("quality:"), F.col("reject_reason")),
    )

    if zlib_bounds is not None:
        from .textstats import compression_signals

        lo, hi = zlib_bounds
        cs = compression_signals(
            cur, text_col=text_col, min_ratio=lo, max_ratio=hi
        )
        cur = reject_stage(
            cs.filter(F.col("keep") == 0),
            F.concat(F.lit("compression:"), F.col("reject_reason")),
        )

    if lm_model is not None and max_perplexity is not None:
        from .lm import lm_perplexity

        uni, bi = lm_model
        ppl = lm_perplexity(cur, uni, bi, text_col=text_col, id_col=id_col)
        cur = reject_stage(
            ppl.filter(F.col("perplexity") > float(max_perplexity)),
            F.lit("perplexity"),
        )

    if nb_model is not None:
        from .classify import predict_nb

        classes, token_lik = nb_model
        pred = predict_nb(
            cur, classes, token_lik, text_col=text_col, id_col=id_col
        )
        cur = reject_stage(
            pred.filter(F.col("pred_label") != int(nb_keep_label)),
            F.lit("classifier"),
        )

    d = cur.withColumn("_dg", F.sha2(F.col(text_col), 256))
    win = F.min(id_col).over(Window.partitionBy("_dg"))
    cur = reject_stage(
        d.withColumn("_win", win).filter(F.col(id_col) != F.col("_win")),
        F.lit("exact_duplicate"),
    )

    if eval_set is not None:
        c = decontaminate(
            cur, eval_set, text_col=text_col, id_col=id_col,
            shingle_n=shingle_n,
        )
        reject_stage(
            c.filter(F.col("contaminated") == 1), F.lit("contaminated")
        )

    ids = docs.select(F.col(id_col))
    if not rejects:
        return ids.select(
            id_col,
            F.lit(None).cast("string").alias("reject_reason"),
            F.lit(1).alias("keep"),
        )
    all_rejects = rejects[0]
    for r in rejects[1:]:
        all_rejects = all_rejects.unionByName(r)
    # stages run on survivors, so reject sets are disjoint by
    # construction — the union has at most one row per doc
    return (
        ids.join(all_rejects, id_col, "left")
        .withColumn("keep", F.col("reject_reason").isNull().cast("int"))
        .select(id_col, "reject_reason", "keep")
    )
