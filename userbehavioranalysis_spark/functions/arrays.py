"""Array explode without the InferFiltersFromGenerate pathology.

Catalyst's ``InferFiltersFromGenerate`` adds ``size(e) > 0 AND
isnotnull(e)`` below every non-outer ``Generate`` — where ``e`` is the
FULL generator expression.  When the exploded array is an expensive
computed expression (tokenize → shingle → hash chains here), that
filter is then pushed through the projection all the way into the scan
as an interpreted, row-at-a-time ``DataFilter`` that re-evaluates the
whole chain per row outside codegen.  Measured on the sf0.1 documents
table this made a 0.8 s explode take ~9 s — the silent dominant cost of
every shingle-based dedup operator.

The rule skips ``outer`` generates, so an outer generate plus a filter
on a GENERATED attribute keeps the plan clean: the filter sits ABOVE
the Generate and cannot be pushed into anything.  Filtering on the
``posexplode_outer`` POSITION column (null only for empty/null arrays,
never for null elements) makes the rewrite exactly equivalent to plain
``explode`` even when arrays contain null elements.

At 100 TB this matters more, not less: the cloned scan filter would
re-run the tokenizer chain over every row of every file, roughly
tripling scan CPU for zero pruning (empty-array rows are a rounding
error in a real corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exploded(df: DataFrame, array: Column | str, alias: str, *keep) -> DataFrame:
    """``df.select(*keep, explode(array) AS alias)`` minus the
    InferFiltersFromGenerate scan-filter cloning (see module docstring).

    ``keep`` entries may be column names or Column expressions; they are
    projected alongside the exploded column.
    """
    pos = f"__{alias}_pos"
    out = df.select(*keep, F.posexplode_outer(array).alias(pos, alias))
    # position is null ONLY for empty/null input arrays — unlike the
    # element column, which a null array ELEMENT would also null out
    return out.filter(F.col(pos).isNotNull()).drop(pos)
