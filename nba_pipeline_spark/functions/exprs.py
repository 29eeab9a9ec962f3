"""Expression-level helpers shared by the function/operator builders.

``let`` is the load-bearing one: Column-builder functions in this
package accept arbitrary *computed* expressions (the normal call shape
is ``shingles(tokenize(text))``), and any builder that references its
argument more than once would otherwise embed that many COPIES of the
argument's expression tree — each evaluated independently per row, and
references inside higher-order-function lambdas evaluated per array
ELEMENT. There is no optimizer rescue for a tree the caller builds
with N copies; common-subexpression elimination does not reach into
lambda bodies.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``value`` to a single evaluation and build ``body`` over it.

    Implemented as ``element_at(transform(array(value), body), 1)``:
    the 1-element array wrapper makes ``value`` a lambda VARIABLE of the
    transform, so every reference inside ``body`` is a plain variable
    read — the input expression is evaluated exactly once per row, no
    matter how many times the body references it (including inside
    nested lambdas).

    Cost: one 1-element array allocation per row. Win: measured
    10.9 s → 0.6 s on a 5000-doc shingle scan at sf0.1 where the
    unbound form re-tokenized each document once per shingle slot.

    NULL semantics: a NULL ``value`` arrives in the body as a NULL
    lambda variable (``array(NULL)`` has one NULL element), so the body
    must be NULL-safe — same contract as receiving the raw column.
    """
    return F.element_at(F.transform(F.array(value), body), 1)
