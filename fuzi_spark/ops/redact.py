"""PII redaction (the pre-release scrubbing pass of a training corpus).

Finds and masks personally-identifying spans — emails, IPv4 addresses,
international phone numbers — with typed placeholder tokens, and counts
each class so downstream quality gates can drop PII-dense documents
instead of merely masking them.

Design constraints, in order:
- PURE Catalyst: every match/replace is a JVM `regexp_count` /
  `regexp_replace` inside one codegen'd Project — at 10^12 docs this
  op must run at scan speed, so no Python ever touches the text.
- Engine-portable patterns: the patterns use only character classes,
  bounded quantifiers and word boundaries — the subset Java's regex
  and RE2 (the DuckDB oracle) interpret identically. No lookarounds,
  no backreferences (RE2 has neither).
- Deterministic masking: a fixed placeholder per class (never a hash
  of the match — that would leak entropy of the PII back into the
  corpus and make redacted text layout-dependent).

Replacement order is emails → IPv4 → phones: the email pattern is the
only one containing '@' so it cannot eat the others, and masking it
first guarantees digit-bearing local parts (user123@…) are gone before
the greedy phone pattern scans the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Each entry: (class name, pattern, placeholder). Patterns are in the
# Java∩RE2 common subset (see module docstring) — keep them that way.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\+[0-9]{7,15}\b",
        "<PHONE>",
    ),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mask PII spans and count them per class.

    Returns one row per input doc:
    (id_col, clean_text, n_email:long, n_ipv4:long, n_phone:long,
    n_pii:long). Each class is counted on the text AFTER the previous
    classes' replacements, so every count equals the number of that
    class's placeholders actually inserted — a phone-shaped local part
    inside an email is one email, never also a phone. Re-running on
    clean_text is a fixpoint: the placeholders contain no '@', dotted
    quads, or '+digits', so every count comes back 0 (pinned in tests).

    Scale shape: zero shuffles, zero Python — the whole chain is one
    whole-stage-codegen'd Project on the scan.
    """
    counts = []
    clean = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.regexp_count(clean, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        clean = F.regexp_replace(clean, pat, token)
    out = df.select(F.col(id_col), clean.alias("clean_text"), *counts)
    total = sum((F.col(f"n_{name}") for name, _, _ in PII_PATTERNS), F.lit(0))
    return out.withColumn("n_pii", total.cast("long"))


# Candidate card spans: 13-19 digits allowing single space/dash
# separators, word-bounded. Java∩RE2 subset like everything here.
CC_CANDIDATE = r"\b(?:[0-9][ -]?){12,18}[0-9]\b"


def _luhn_ok(digits):
    """Luhn checksum as a pure Catalyst predicate over a digit string:
    split to chars, double every second digit from the RIGHT (subtract
    9 past 9), sum mod 10 == 0; length gated to the 13-19 bank-card
    range. No Python, no UDF — the whole check codegens."""
    arr = F.split(digits, "")
    n = F.size(arr)
    terms = F.transform(
        arr,
        lambda d, idx: F.when(
            (n - idx) % 2 == 0,
            F.when(
                d.cast("int") * 2 > 9, d.cast("int") * 2 - 9
            ).otherwise(d.cast("int") * 2),
        ).otherwise(d.cast("int")),
    )
    s = F.aggregate(terms, F.lit(0), lambda a, v: a + v)
    return (n >= 13) & (n <= 19) & (s % 10 == 0)


def redact_credit_cards(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Credit-card detection + masking with LUHN VALIDATION — the PII
    class where a bare digit-pattern regex drowns in false positives
    (order ids, timestamps, phone numbers): a span is masked only if
    its digits pass the Luhn checksum, so the 1-in-10 random-number
    false-positive floor is all that remains of pattern noise.

    Returns (id, clean_text, n_cc_candidates:long, n_cc_valid:long).
    Valid spans are replaced LITERALLY (every occurrence) with <CC>;
    candidates that fail Luhn are left untouched — they are data, not
    PII. Zero shuffles, zero Python: candidate extraction, per-span
    Luhn, and the replacement fold are one codegen'd Project
    (aggregate over the valid-span array applying literal replace)."""
    cands = F.coalesce(
        F.regexp_extract_all(F.col(text_col), F.lit(CC_CANDIDATE), 0),
        F.array().cast("array<string>"),
    )
    valid = F.filter(
        cands, lambda c: _luhn_ok(F.regexp_replace(c, "[ -]", ""))
    )
    clean = F.aggregate(
        F.array_distinct(valid),
        F.col(text_col),
        lambda acc, c: F.replace(acc, c, F.lit("<CC>")),
    )
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(cands).cast("long").alias("n_cc_candidates"),
        F.size(valid).cast("long").alias("n_cc_valid"),
    )


def pseudonymize_emails(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Consistent pseudonymization: rewrite every email to a STABLE
    pseudonym — same identity, same replacement, across the whole
    corpus — instead of a flat <EMAIL> mask.

    Masking (redact_pii) destroys conversational structure: "alice@x
    replied to bob@y" becomes "<EMAIL> replied to <EMAIL>" and thread
    reconstruction, quote attribution, and speaker-consistency signals
    die with it. Pseudonymization keeps the structure while removing
    the identity: pseudonym(e) = 'user-' + md5(lower(e))[:10] +
    '@example.invalid' — deterministic (a corpus re-run or a second
    corpus maps the same address identically, so joins still line up),
    non-reversible short of brute force, and routed to the reserved
    .invalid TLD so scrubbed text can never generate real mail.
    lower() canonicalizes first: mail domains are case-insensitive and
    mixed-case duplicates of one address must not fork identities.

    Replacement is a fold of literal replace() over the doc's DISTINCT
    matches ordered by (length DESC, value ASC): a match that is a
    substring of a longer match (b@c.com inside ab@c.com) must be
    replaced AFTER the longer one or it corrupts it mid-string. The
    ordering key is the engine-portable string lpad(100000-len) ||
    value — ascending string sort in any engine, no struct-comparator
    semantics to align. (A pseudonym containing a later match is
    impossible short of the original text embedding a 'user-<10 hex>
    @example.invalid' address whose hex equals another match's md5 —
    and even then the oracle folds identically.)

    Returns (id, clean_text, n_emails:long total occurrences,
    n_identities:long distinct addresses). The email->pseudonym
    mapping is deliberately NOT emitted: the output is the scrubbed
    surface; re-linkage stays possible via the deterministic formula
    for holders of the original data, without this table re-leaking
    the addresses. Zero shuffles, zero Python — one codegen'd Project.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    matches = F.regexp_extract_all(txt, F.lit(PII_PATTERNS[0][1]), 0)
    idents = F.array_distinct(matches)
    ordered = F.transform(
        F.array_sort(
            F.transform(
                idents,
                lambda e: F.concat(
                    F.lpad(
                        (F.lit(100000) - F.length(e)).cast("string"),
                        6,
                        "0",
                    ),
                    e,
                ),
            )
        ),
        lambda k: F.substring(k, 7, 1000000),
    )

    def pseudo(e):
        return F.concat(
            F.lit("user-"),
            F.substring(F.md5(F.lower(e).cast("binary")), 1, 10),
            F.lit("@example.invalid"),
        )

    clean = F.aggregate(
        ordered, txt, lambda acc, e: F.replace(acc, e, pseudo(e))
    )
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(matches).cast("long").alias("n_emails"),
        # identities are counted CANONICAL (lowered) — A@B.com and
        # a@b.com are one identity (they already share a pseudonym);
        # `idents` stays raw because replace() is literal
        F.size(F.array_distinct(F.transform(matches, F.lower)))
        .cast("long")
        .alias("n_identities"),
    )
