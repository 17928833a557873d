"""Expression combinators.

`let(bound, body)` — evaluate `bound` ONCE and reference it many times
inside `body`. Catalyst inlines column expressions into higher-order-
function lambdas (no common-subexpression elimination across lambda
boundaries), so an expression like

    transform(seq, i -> slice(split(text), i, n))

re-runs split(text) for every i — quadratic work. Binding it as a
lambda variable via a single-element array forces one evaluation:

    element_at(transform(array(split(text)), toks -> <body(toks)>), 1)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(bound: Column, body: Callable[[Column], Column]) -> Column:
    return F.element_at(F.transform(F.array(bound), body), 1)
