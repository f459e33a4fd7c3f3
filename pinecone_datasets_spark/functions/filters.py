"""Pinecone metadata-filter → Spark Column compiler.

The reference *stores* filter expressions (``queries.filter``, JSON in the
Pinecone filter language — ``MAINTAINERS.md:102``) but never evaluates
them; evaluation happens in the external index. This module is the Layer-B
implementation: compile the filter JSON into a native Spark ``Column``
predicate over the ``metadata`` JSON-string column, so filters run inside
whole-stage codegen (no UDF) and participate in Catalyst optimization.

Supported operators (the full public Pinecone filter language):
``$eq $ne $gt $gte $lt $lte $in $nin $exists $and $or`` plus the implicit
forms ``{"field": value}`` (= $eq) and top-level multi-key AND.

Typing: metadata values live inside a JSON string, so comparisons extract
with ``get_json_object`` and cast based on the *literal*'s Python type —
numbers compare numerically (double), booleans as booleans, strings as
strings. ``$in``/``$nin`` build an OR/AND chain of typed equalities.
"""

from __future__ import annotations

import json
from functools import reduce
from typing import Any, Mapping, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

_OPS = {"$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin", "$exists"}


def _extract(metadata_col: Column, field: str) -> Column:
    # JSONPath field access; quoted to survive dots/special chars.
    return F.get_json_object(metadata_col, f"$['{field}']")


def _typed(raw: Column, value: Any) -> tuple[Column, Column]:
    """Cast the extracted JSON text and the literal to a comparable type.

    Comparison is type-sensitive (a string field never equals a numeric
    literal); a mismatched type yields NULL which downstream treats as
    "no match" ($eq) or "differs" ($ne). ``try_cast``, not ``cast``: under
    ANSI mode (Spark 4 default) a plain cast *throws* on mismatched text.
    Booleans get an explicit true/false mapping because Spark's
    string→boolean cast also accepts '1'/'0' (JSON number 1 must NOT
    equal literal ``true``).

    Known coercion corner (documented divergence): JSON text extraction
    cannot distinguish the number ``3`` from the string ``"3"`` — a
    string literal that looks numeric compares against the JSON text.
    """
    if isinstance(value, bool):
        mapped = (
            F.when(raw == "true", F.lit(True))
            .when(raw == "false", F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )
        return mapped, F.lit(value)
    if isinstance(value, (int, float)):
        return raw.try_cast("double"), F.lit(float(value))
    return raw, F.lit(value)


def _null_safe_eq(lhs: Column, rhs: Column) -> Column:
    """(lhs == rhs) with NULL (absent / type-mismatch) meaning False."""
    return F.coalesce(lhs == rhs, F.lit(False))


def _compile_leaf(metadata_col: Column, field: str, op: str, value: Any) -> Column:
    raw = _extract(metadata_col, field)
    if op == "$exists":
        present = raw.isNotNull()
        return present if value else ~present
    if op in ("$in", "$nin"):
        if not isinstance(value, (list, tuple)):
            raise ValueError(f"{op} expects a list, got {type(value).__name__}")
        if not value:
            # Pinecone: $in [] matches nothing; $nin [] matches everything
            # (for present fields).
            return F.lit(False) if op == "$in" else raw.isNotNull()
        eqs = []
        for v in value:
            lhs, rhs = _typed(raw, v)
            eqs.append(_null_safe_eq(lhs, rhs))
        any_eq = reduce(lambda a, b: a | b, eqs)
        return any_eq if op == "$in" else (raw.isNotNull() & ~any_eq)
    lhs, rhs = _typed(raw, value)
    if op == "$eq":
        return _null_safe_eq(lhs, rhs)
    if op == "$ne":
        # Matches when the field exists and differs — a type-mismatched
        # value differs by definition.
        return raw.isNotNull() & ~_null_safe_eq(lhs, rhs)
    if op == "$gt":
        return lhs > rhs
    if op == "$gte":
        return lhs >= rhs
    if op == "$lt":
        return lhs < rhs
    if op == "$lte":
        return lhs <= rhs
    raise ValueError(f"Unsupported filter operator: {op}")


def _compile_node(metadata_col: Column, node: Mapping[str, Any]) -> Column:
    if not isinstance(node, Mapping):
        raise ValueError(f"filter node must be an object, got {node!r}")
    clauses: list[Column] = []
    for key, value in node.items():
        if key == "$and":
            clauses.append(
                reduce(
                    lambda a, b: a & b,
                    [_compile_node(metadata_col, n) for n in value],
                )
            )
        elif key == "$or":
            clauses.append(
                reduce(
                    lambda a, b: a | b,
                    [_compile_node(metadata_col, n) for n in value],
                )
            )
        elif key.startswith("$"):
            raise ValueError(f"Unsupported top-level operator: {key}")
        elif isinstance(value, Mapping):
            sub = [
                _compile_leaf(metadata_col, key, op, v)
                for op, v in value.items()
                if op in _OPS
            ]
            unknown = [op for op in value if op not in _OPS]
            if unknown:
                raise ValueError(f"Unsupported filter operator(s): {unknown}")
            clauses.append(reduce(lambda a, b: a & b, sub))
        else:
            # Implicit $eq shorthand: {"field": value}.
            clauses.append(_compile_leaf(metadata_col, key, "$eq", value))
    if not clauses:
        return F.lit(True)
    return reduce(lambda a, b: a & b, clauses)


def compile_filter(
    filter_expr: Union[str, Mapping[str, Any], None],
    metadata_col: Union[str, Column] = "metadata",
) -> Column:
    """Compile a Pinecone filter (dict or JSON string) to a boolean Column.

    ``None`` / empty filter compiles to ``lit(True)`` (match everything).
    """
    if isinstance(metadata_col, str):
        metadata_col = F.col(metadata_col)
    if filter_expr is None:
        return F.lit(True)
    if isinstance(filter_expr, str):
        filter_expr = json.loads(filter_expr) if filter_expr.strip() else {}
    return _compile_node(metadata_col, filter_expr)
