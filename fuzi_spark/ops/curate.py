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
contract lifted to the whole pipeline. No stage adds a shuffle beyond
the operator's own documented one; the reject tables carry (id, reason)
only — metadata width — and the final assembly is one left join of
their union onto the corpus ids (AQE broadcasts it when it fits).

Stage order and reason codes:

    1. 'blocked_domain'     url host on the blocklist
    2. 'url_duplicate'      not the min-id for its canonical URL
    3. 'language'           lang_id(text) not in the allow list
    4. 'quality:<code>'     quality_filter rejection (code appended)
    5. 'perplexity'         LM perplexity above the cut (optional:
                            pass lm_model + max_perplexity)
    6. 'exact_duplicate'    not the min-id for its content digest
    7. 'contaminated'       shares an n-gram shingle with the eval set

Language runs BEFORE quality (the CCNet order): the quality rules are
Latin-script heuristics (Java \\w is ASCII), so a Cyrillic/CJK doc must
be routed by language, not mis-rejected as punctuation noise.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    url_col: Optional[str] = None,
    blocked_domains: Optional[DataFrame] = None,
    lang_allow: Optional[list[str]] = None,
    eval_set: Optional[DataFrame] = None,
    lm_model: Optional[tuple[DataFrame, DataFrame]] = None,
    max_perplexity: Optional[float] = None,
    min_tokens: int = 5,
    max_mean_token_len: float = 15.0,
    max_punct_ratio: float = 0.3,
    min_distinct_ratio: float = 0.2,
    shingle_n: int = 5,
) -> DataFrame:
    """Run the full hygiene DAG; see module docstring for stage order.

    Returns one row per input doc: (id_col, reject_reason:string,
    keep:int). Optional stages (blocklist, URL dedup, language, LM
    perplexity, decontamination) are skipped when their inputs are
    None. `lm_model` is the (unigrams, bigrams) pair from
    lm.train_bigram_lm — train it on a TRUSTED reference corpus, not
    on the corpus being curated (the CCNet contract); unscorable docs
    (<2 tokens) pass the LM stage, as in lm.perplexity_filter.
    """
    from .dedup import decontaminate
    from .textstats import lang_id, quality_filter
    from .web import canonicalize_url, host_of

    rejects: list[DataFrame] = []
    cur = docs

    def reject(df: DataFrame, reason_col):
        rejects.append(
            df.select(F.col(id_col), reason_col.alias("reject_reason"))
        )

    if url_col is not None and blocked_domains is not None:
        bl = (
            blocked_domains.select(F.lower(F.col("domain")).alias("_host"))
            .distinct()
        )
        h = cur.withColumn("_host", host_of(url_col))
        reject(
            h.join(F.broadcast(bl), "_host"), F.lit("blocked_domain")
        )
        cur = h.join(F.broadcast(bl), "_host", "left_anti").drop("_host")

    if url_col is not None:
        c = cur.withColumn("_canon", canonicalize_url(url_col))
        winners = c.groupBy("_canon").agg(F.min(id_col).alias("_win"))
        j = c.join(winners, "_canon")
        reject(
            j.filter(F.col(id_col) != F.col("_win")), F.lit("url_duplicate")
        )
        cur = j.filter(F.col(id_col) == F.col("_win")).drop("_canon", "_win")

    if lang_allow is not None:
        lg = cur.withColumn("_lang", lang_id(F.col(text_col)))
        reject(
            lg.filter(~F.col("_lang").isin(*lang_allow)), F.lit("language")
        )
        cur = lg.filter(F.col("_lang").isin(*lang_allow)).drop("_lang")

    q = quality_filter(
        cur,
        text_col,
        min_tokens=min_tokens,
        max_mean_token_len=max_mean_token_len,
        max_punct_ratio=max_punct_ratio,
        min_distinct_ratio=min_distinct_ratio,
    )
    reject(
        q.filter(F.col("keep") == 0),
        F.concat(F.lit("quality:"), F.col("reject_reason")),
    )
    cur = q.filter(F.col("keep") == 1).select(*cur.columns)

    if lm_model is not None and max_perplexity is not None:
        from .lm import lm_perplexity

        uni, bi = lm_model
        ppl = lm_perplexity(cur, uni, bi, text_col=text_col, id_col=id_col)
        reject(
            ppl.filter(F.col("perplexity") > float(max_perplexity)),
            F.lit("perplexity"),
        )
        cur = cur.join(
            ppl.filter(F.col("perplexity") > float(max_perplexity)).select(
                F.col(id_col)
            ),
            id_col,
            "left_anti",
        )

    d = cur.withColumn("_dg", F.sha2(F.col(text_col), 256))
    winners = d.groupBy("_dg").agg(F.min(id_col).alias("_win"))
    j = d.join(winners, "_dg")
    reject(
        j.filter(F.col(id_col) != F.col("_win")), F.lit("exact_duplicate")
    )
    cur = j.filter(F.col(id_col) == F.col("_win")).drop("_dg", "_win")

    if eval_set is not None:
        c = decontaminate(
            cur, eval_set, text_col=text_col, id_col=id_col,
            shingle_n=shingle_n,
        )
        reject(c.filter(F.col("contaminated") == 1), F.lit("contaminated"))

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
