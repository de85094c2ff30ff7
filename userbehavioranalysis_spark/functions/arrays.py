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

The rule skips ``outer`` generates, so the equivalent
``explode_outer + isnotnull(output)`` keeps the plan clean: the null
filter sits ABOVE the Generate on the generated attribute and cannot be
pushed into anything.  Semantics match ``explode`` exactly as long as
the array itself contains no null ELEMENTS (ours never do — shingles,
tokens, bands and signature lanes are all built non-null).

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
    out = df.select(*keep, F.explode_outer(array).alias(alias))
    return out.filter(F.col(alias).isNotNull())
