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

Typing: metadata values live inside a JSON string, so the default mode
extracts with ``get_json_object`` and casts based on the *literal*'s
Python type — numbers compare numerically (double), booleans as booleans,
strings as strings. One coercion corner: text extraction cannot
distinguish the JSON number ``3`` from the JSON string ``"3"``.
``strict_types=True`` closes it by extracting through Spark 4's VARIANT
type and gating every comparison on the value's *actual* JSON type
(``schema_of_variant``) — exactly the Python-dict semantics the reference
ecosystem uses, at the cost of a ``parse_json`` per row.
"""

from __future__ import annotations

import json
from functools import reduce
from typing import Any, Mapping, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

_OPS = {"$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin", "$exists"}

_NUMERIC_VARIANT_TYPES = (
    "TINYINT", "SMALLINT", "INT", "BIGINT", "FLOAT", "DOUBLE",
)


def _extract(metadata_col: Column, field: str) -> Column:
    # JSONPath field access; quoted to survive dots/special chars.
    return F.get_json_object(metadata_col, f"$['{field}']")


def _extract_variant(metadata_col: Column, field: str) -> Column:
    """Field as a VARIANT value: SQL NULL when absent, variant-null when
    JSON null — the distinction the text path can't see."""
    return F.try_variant_get(
        F.try_parse_json(metadata_col), f"$['{field}']", "variant"
    )


def _variant_present(vf: Column) -> Column:
    # Pinecone treats JSON null as not-stored; $exists must agree.
    return vf.isNotNull() & ~F.is_variant_null(vf)


def _typed(raw: Column, value: Any) -> tuple[Column, Column]:
    """Cast the extracted JSON text and the literal to a comparable type.

    Comparison is type-sensitive (a string field never equals a numeric
    literal); a mismatched type yields NULL which downstream treats as
    "no match" ($eq) or "differs" ($ne). ``try_cast``, not ``cast``: under
    ANSI mode (Spark 4 default) a plain cast *throws* on mismatched text.
    Booleans get an explicit true/false mapping because Spark's
    string→boolean cast also accepts '1'/'0' (JSON number 1 must NOT
    equal literal ``true``).
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


def _typed_strict(vf: Column, value: Any) -> tuple[Column, Column]:
    """Variant-mode twin of ``_typed``: the comparison is NULL (no match)
    unless the stored value's JSON type matches the literal's Python
    type. ``schema_of_variant`` yields the per-row type name."""
    typ = F.schema_of_variant(vf)
    if isinstance(value, bool):
        lhs = F.when(typ == "BOOLEAN", F.try_variant_get(vf, "$", "boolean"))
        return lhs, F.lit(value)
    if isinstance(value, (int, float)):
        is_num = typ.isin(*_NUMERIC_VARIANT_TYPES) | typ.startswith("DECIMAL")
        lhs = F.when(is_num, F.try_variant_get(vf, "$", "double"))
        return lhs, F.lit(float(value))
    lhs = F.when(typ == "STRING", F.try_variant_get(vf, "$", "string"))
    return lhs, F.lit(value)


def _null_safe_eq(lhs: Column, rhs: Column) -> Column:
    """(lhs == rhs) with NULL (absent / type-mismatch) meaning False."""
    return F.coalesce(lhs == rhs, F.lit(False))


def _compile_leaf(
    metadata_col: Column, field: str, op: str, value: Any, strict: bool
) -> Column:
    if strict:
        raw = _extract_variant(metadata_col, field)
        present = _variant_present(raw)
        typed = _typed_strict
    else:
        raw = _extract(metadata_col, field)
        present = raw.isNotNull()
        typed = _typed
    if op == "$exists":
        return present if value else ~present
    if op in ("$in", "$nin"):
        if not isinstance(value, (list, tuple)):
            raise ValueError(f"{op} expects a list, got {type(value).__name__}")
        if not value:
            # Pinecone: $in [] matches nothing; $nin [] matches everything
            # (for present fields).
            return F.lit(False) if op == "$in" else present
        eqs = []
        for v in value:
            lhs, rhs = typed(raw, v)
            eqs.append(_null_safe_eq(lhs, rhs))
        any_eq = reduce(lambda a, b: a | b, eqs)
        return any_eq if op == "$in" else (present & ~any_eq)
    if (
        strict
        and op in ("$gt", "$gte", "$lt", "$lte")
        and (isinstance(value, bool) or not isinstance(value, (int, float)))
    ):
        # Pinecone defines ordering for numbers only; the interpreter twin
        # (operators/search.py:_eval_leaf) returns False here, and strict
        # mode agrees rather than falling back to lexicographic order.
        return F.lit(False)
    lhs, rhs = typed(raw, value)
    if op == "$eq":
        return _null_safe_eq(lhs, rhs)
    if op == "$ne":
        # Matches when the field exists and differs — a type-mismatched
        # value differs by definition.
        return present & ~_null_safe_eq(lhs, rhs)
    if op == "$gt":
        return lhs > rhs
    if op == "$gte":
        return lhs >= rhs
    if op == "$lt":
        return lhs < rhs
    if op == "$lte":
        return lhs <= rhs
    raise ValueError(f"Unsupported filter operator: {op}")


def _compile_node(
    metadata_col: Column, node: Mapping[str, Any], strict: bool
) -> Column:
    if not isinstance(node, Mapping):
        raise ValueError(f"filter node must be an object, got {node!r}")
    clauses: list[Column] = []
    for key, value in node.items():
        if key == "$and":
            clauses.append(
                reduce(
                    lambda a, b: a & b,
                    [_compile_node(metadata_col, n, strict) for n in value],
                )
            )
        elif key == "$or":
            clauses.append(
                reduce(
                    lambda a, b: a | b,
                    [_compile_node(metadata_col, n, strict) for n in value],
                )
            )
        elif key.startswith("$"):
            raise ValueError(f"Unsupported top-level operator: {key}")
        elif isinstance(value, Mapping):
            sub = [
                _compile_leaf(metadata_col, key, op, v, strict)
                for op, v in value.items()
                if op in _OPS
            ]
            unknown = [op for op in value if op not in _OPS]
            if unknown:
                raise ValueError(f"Unsupported filter operator(s): {unknown}")
            clauses.append(reduce(lambda a, b: a & b, sub))
        else:
            # Implicit $eq shorthand: {"field": value}.
            clauses.append(
                _compile_leaf(metadata_col, key, "$eq", value, strict)
            )
    if not clauses:
        return F.lit(True)
    return reduce(lambda a, b: a & b, clauses)


def compile_filter(
    filter_expr: Union[str, Mapping[str, Any], None],
    metadata_col: Union[str, Column] = "metadata",
    strict_types: bool = False,
) -> Column:
    """Compile a Pinecone filter (dict or JSON string) to a boolean Column.

    ``None`` / empty filter compiles to ``lit(True)`` (match everything).
    ``strict_types=True`` switches to VARIANT extraction: JSON value types
    must match the literal's Python type exactly (number 3 ≠ string "3",
    JSON null counts as absent) at the cost of a per-row parse_json.
    """
    if isinstance(metadata_col, str):
        metadata_col = F.col(metadata_col)
    if filter_expr is None:
        return F.lit(True)
    if isinstance(filter_expr, str):
        filter_expr = json.loads(filter_expr) if filter_expr.strip() else {}
    return _compile_node(metadata_col, filter_expr, strict_types)
