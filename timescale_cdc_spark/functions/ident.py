"""SQL identifier quoting for generated expression strings.

Some operators build their expressions as ONE ``F.expr`` SQL string
(the py4j Column-tree construction cost is the fixed per-query
overhead — see operators/dedup.py). Anywhere a *caller-provided*
column name is interpolated into such a string it must be quoted, or
names needing escaping (spaces, hyphens, reserved words, dots) either
fail to parse or silently resolve to the wrong expression — e.g. an
unquoted ``a.b`` becomes a struct-field reference.
"""

from __future__ import annotations


def sql_ident(name: str) -> str:
    """Backtick-quote a column name for interpolation into Spark SQL
    text; embedded backticks are escaped by doubling (Spark's rule)."""
    escaped = name.replace("`", "``")
    return f"`{escaped}`"


def sql_qualified(alias: str, name: str) -> str:
    """An explicitly alias-qualified reference (``alias``.``name``)
    for interpolation into SQL text. Callers who mean a qualified
    reference build it HERE, so string-accepting operators like
    ``similarity.cosine`` can treat every un-backticked string as one
    plain (possibly dotted) column name instead of guessing whether a
    dot means qualification (ADVICE r13)."""
    return f"{sql_ident(alias)}.{sql_ident(name)}"
