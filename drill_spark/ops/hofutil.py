"""Higher-order-function plan-safety helpers.

The one exported idiom, :func:`bind_once`, is the repo's defense
against Catalyst re-evaluation of expensive per-row expressions.

Staging an expensive intermediate as an aliased projection column is
NOT a reliable defense: under some consumers CollapseProject /
column-pruning rewrites inline the alias into the body of a
downstream higher-order-function lambda, turning one O(len)
evaluation into O(len) evaluations of it. Measured r13 on the
language-ID operator composed with ``build_mixture``: a jstack of the
hung executor showed ``RegExpReplace.nullSafeEval`` (a fresh
``java.util.regex.Matcher`` per call) under ``ArrayTransform.eval`` —
the normalization expression re-ran per gram position, O(len^2) per
document, minutes instead of seconds at sf0.01.

A ``NamedLambdaVariable`` is a bound VALUE: no optimizer rule can
inline an expression into it, so routing an intermediate through a
single-element ``transform`` guarantees exactly one evaluation per
row no matter how the enclosing plan is rewritten.

Rules of thumb for per-row HOF pipelines:

- An expensive expression referenced inside a lambda BODY multiplies
  by the array length — always ``bind_once`` it first.
- Referencing a bound variable any number of times is free.
- An expensive expression referenced only as a whole-array INPUT to
  transform/filter/zip_with/aggregate costs at most one re-evaluation
  per reference (constant factor) — acceptable, but bind when nested.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(value: Column, fn) -> Column:
    """Evaluate ``value`` exactly once per row and hand it to ``fn``
    as a HOF lambda variable (see module docstring for why aliased
    columns are not a substitute)."""
    return F.element_at(F.transform(F.array(value), fn), 1)
