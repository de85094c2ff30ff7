"""Portable text primitives for the training-data pipeline operators.

Everything here is expressed as SQL expression strings usable with
``F.expr`` — pure Catalyst column expressions (whole-stage codegen, no
Python UDFs) — with a DuckDB twin for the oracle side.  The hash
primitive is engine-portable by construction: the top 15 hex digits of
md5 parsed as a 60-bit integer produce the identical value in Spark
(``conv``) and DuckDB (``'0x…'::BIGINT``), so minhash/simhash/LSH
results hash-match across engines.

At scale these all matter for the same reason: tokenization, shingling
and sketching stay inside whole-stage codegen over the scan — the first
shuffle in any dedup job happens *after* per-document reduction to a
small signature.
"""

from __future__ import annotations


def h64_spark(x: str) -> str:
    """60-bit portable hash of expression ``x`` (Spark SQL)."""
    return f"cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)"


def h64_duck(x: str) -> str:
    """Same hash, DuckDB SQL."""
    return f"('0x' || substr(md5({x}), 1, 15))::BIGINT"


TOKENS_SPARK = "split(trim(text), '\\\\s+')"
TOKENS_DUCK = "regexp_split_to_array(trim(text), '\\s+')"


def shingles_spark(k: int, tokens: str = "tokens") -> str:
    """Word k-gram shingle array (Spark SQL over a ``tokens`` column)."""
    if k == 1:
        return tokens
    return (
        f"if(size({tokens}) >= {k}, "
        f"transform(sequence(1, size({tokens}) - {k} + 1), "
        f"i -> array_join(slice({tokens}, i, {k}), ' ')), "
        f"cast(array() as array<string>))"
    )


def shingles_duck(k: int, tokens: str = "tokens") -> str:
    if k == 1:
        return tokens
    return (
        f"list_transform(range(1, len({tokens}) - {k} + 2), "
        f"i -> array_to_string({tokens}[i:i + {k} - 1], ' '))"
    )


def minhash_sig_spark(n_hashes: int, shingles: str = "shingles") -> str:
    """Array of ``n_hashes`` minhash values (Spark SQL).

    Seeded by suffixing the shingle with ``#<seed>`` before hashing —
    one pass over the shingle array per seed, all columnar.
    """
    mins = ", ".join(
        "array_min(transform({sh}, x -> {h}))".format(
            sh=shingles, h=h64_spark(f"concat(x, '#', {s})")
        )
        for s in range(n_hashes)
    )
    return f"array({mins})"


def minhash_sig_duck(n_hashes: int, shingles: str = "shingles") -> str:
    mins = ", ".join(
        "list_min(list_transform({sh}, x -> {h}))".format(
            sh=shingles, h=h64_duck(f"concat(x, '#', {s})")
        )
        for s in range(n_hashes)
    )
    return f"[{mins}]"


def simhash_spark(bits: int = 63, hashes: str = "word_hashes") -> str:
    """Simhash (``bits``-bit, sign-aggregated word hashes), Spark SQL.

    Fully columnar: for each bit position the +1/-1 votes of every word
    hash are folded with ``aggregate``; the winning bits assemble into
    one BIGINT.  63 bits keeps the sign bit clear.
    """
    vote = (
        f"aggregate({hashes}, 0, (acc, h) -> "
        f"acc + if((h div shiftleft(cast(1 as bigint), i)) % 2 = 1, 1, -1))"
    )
    return (
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), "
        f"(s, i) -> s + if(({vote}) > 0, shiftleft(cast(1 as bigint), i), cast(0 as bigint)))"
    )


def simhash_duck(bits: int = 63, hashes: str = "word_hashes") -> str:
    vote = (
        f"list_sum(list_transform({hashes}, h -> "
        f"CASE WHEN (h // (1::BIGINT << i)) % 2 = 1 THEN 1 ELSE -1 END))"
    )
    return (
        f"list_sum(list_transform(range(0, {bits}), i -> "
        f"CASE WHEN ({vote}) > 0 THEN 1::BIGINT << i ELSE 0::BIGINT END))"
    )
