"""Bind-once helper for higher-order-function lambdas.

Catalyst evaluates higher-order functions (transform / aggregate /
filter / zip_with) interpreted, per element, with NO common-subexpression
elimination inside the lambda body. A lambda that references a non-cheap
outer expression therefore re-evaluates it for EVERY array element:

    tokens = F.split(text, " ")                       # O(L)
    F.transform(F.sequence(1, k),
                lambda i: F.slice(tokens, i, n))      # split runs k times!

That turns an O(L) tokenize into O(L^2) per document — invisible on
short dev-scale rows, quadratic on the long documents a 100 TB corpus is
full of (PLANS.md §dedup_minhash / §repetition show the duplicated
`split(...)` inside `lambdafunction(...)` before this fix).

`bind(col, fn)` defeats it by routing the expression through a lambda
VARIABLE, which is evaluated once per row and referenced (not
re-computed) thereafter:

    bind(F.split(text, " "),
         lambda tokens: F.transform(..., lambda i: F.slice(tokens, i, n)))

Implementation: wrap the value in a one-element array, `transform` it
with `fn` (the lambda parameter is bound exactly once), and take the
single result back out. Costs one 1-element array allocation per row;
nested lambdas referencing the outer variable are plain
NamedLambdaVariable lookups.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(col: Column, fn: Callable[[Column], Column]) -> Column:
    """Evaluate `col` once per row and pass the bound value to `fn`.

    Use whenever a higher-order-function lambda inside `fn` would
    otherwise reference `col` per element. NULL-safe: if `col` is NULL
    the bound variable is NULL (the one-element array holds NULL, it is
    not an empty array)."""
    return F.element_at(F.transform(F.array(col), fn), 1)
