"""Dataset catalog metadata model.

Parity target: ``pinecone_datasets/dataset_metadata.py:7-48`` in the
reference (Pydantic models serialized as ``metadata.json``). This engine
uses plain dataclasses — metadata is driver-side catalog data, never a
distributed dataset — with the same field names, required/optional split,
and validation error behavior (missing ``name`` and friends raise).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from datetime import datetime
from typing import Any, Optional


class MetadataValidationError(ValueError):
    """Raised when a metadata payload fails validation (mirrors the
    pydantic.ValidationError surface of the reference)."""


# created_at format: reference dataset_metadata.py:18-19
_CREATED_AT_FMT = "%Y-%m-%d %H:%M:%S.%f"


def _now_str() -> str:
    return datetime.now().strftime(_CREATED_AT_FMT)


@dataclass
class DenseModelMetadata:
    """Reference: dataset_metadata.py:7-10 (name + dimension required)."""

    name: str
    dimension: int
    tokenizer: Optional[str] = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "DenseModelMetadata":
        if not isinstance(d, dict):
            raise MetadataValidationError("dense_model must be an object")
        missing = [k for k in ("name", "dimension") if k not in d or d[k] is None]
        if missing:
            raise MetadataValidationError(
                f"dense_model missing required field(s): {missing}"
            )
        return cls(
            name=str(d["name"]),
            dimension=int(d["dimension"]),
            tokenizer=d.get("tokenizer"),
        )


@dataclass
class SparseModelMetadata:
    """Reference: dataset_metadata.py:13-15 (class name typo there:
    ``SparseModelMetdata``; we keep the corrected spelling and alias it)."""

    name: Optional[str] = None
    tokenizer: Optional[str] = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "SparseModelMetadata":
        if not isinstance(d, dict):
            raise MetadataValidationError("sparse_model must be an object")
        return cls(name=d.get("name"), tokenizer=d.get("tokenizer"))


# Surface-parity alias for the reference's typo'd class name.
SparseModelMetdata = SparseModelMetadata


@dataclass
class DatasetMetadata:
    """Reference: dataset_metadata.py:22-48."""

    name: str
    created_at: str = field(default_factory=_now_str)
    documents: int = 0
    queries: int = 0
    source: Optional[str] = None
    license: Optional[str] = None
    bucket: Optional[str] = None
    task: Optional[str] = None
    dense_model: Optional[DenseModelMetadata] = None
    sparse_model: Optional[SparseModelMetadata] = None
    description: Optional[str] = None
    tags: Optional[list[str]] = None
    args: Optional[dict[str, Any]] = None

    def __post_init__(self) -> None:
        if not self.name or not isinstance(self.name, str):
            raise MetadataValidationError("DatasetMetadata: 'name' is required")
        if self.dense_model is None:
            raise MetadataValidationError(
                "DatasetMetadata: 'dense_model' is required"
            )

    # -- serialization ---------------------------------------------------
    def to_dict(self) -> dict[str, Any]:
        return asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), ensure_ascii=False)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "DatasetMetadata":
        if not isinstance(d, dict):
            raise MetadataValidationError("metadata must be a JSON object")
        required = ("name", "documents", "queries", "dense_model")
        missing = [k for k in required if k not in d or d[k] is None]
        if missing:
            raise MetadataValidationError(
                f"metadata missing required field(s): {missing}"
            )
        dense = DenseModelMetadata.from_dict(d["dense_model"])
        sparse = (
            SparseModelMetadata.from_dict(d["sparse_model"])
            if d.get("sparse_model") is not None
            else None
        )
        try:
            documents = int(d["documents"])
            queries = int(d["queries"])
        except (TypeError, ValueError) as e:
            raise MetadataValidationError(f"documents/queries must be ints: {e}")
        return cls(
            name=d["name"],
            created_at=d.get("created_at") or _now_str(),
            documents=documents,
            queries=queries,
            source=d.get("source"),
            license=d.get("license"),
            bucket=d.get("bucket"),
            task=d.get("task"),
            dense_model=dense,
            sparse_model=sparse,
            description=d.get("description"),
            tags=d.get("tags"),
            args=d.get("args"),
        )

    @classmethod
    def from_json(cls, s: str) -> "DatasetMetadata":
        try:
            d = json.loads(s)
        except json.JSONDecodeError as e:
            raise MetadataValidationError(f"invalid metadata JSON: {e}")
        return cls.from_dict(d)

    # -- reference surface parity (dataset_metadata.py empty()/is_empty())
    @classmethod
    def empty(cls) -> "DatasetMetadata":
        # Bypasses __post_init__ validation: the reference's empty() also
        # produces an otherwise-invalid sentinel object.
        obj = object.__new__(cls)
        obj.name = ""
        obj.created_at = _now_str()
        obj.documents = 0
        obj.queries = 0
        obj.source = None
        obj.license = None
        obj.bucket = None
        obj.task = None
        obj.dense_model = DenseModelMetadata(name="", dimension=0)
        obj.sparse_model = None
        obj.description = None
        obj.tags = None
        obj.args = None
        return obj

    def is_empty(self) -> bool:
        return self.name == "" and self.documents == 0 and self.queries == 0
