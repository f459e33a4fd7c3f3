"""Progress reporting (SURVEY.md §2.10 C9).

Parity target: reference ``tqdm.py:5-34`` — use tqdm when importable,
fall back to a no-op iterator wrapper otherwise. Only driver-side loops
(catalog scans, local iteration) are wrapped; distributed work reports
through the Spark UI / listeners, which is the right channel at scale.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Optional

try:  # pragma: no cover - environment-dependent
    from tqdm.auto import tqdm as _tqdm

    HAVE_TQDM = True
except ImportError:  # pragma: no cover
    HAVE_TQDM = False

    class _tqdm:  # type: ignore[no-redef]
        """No-op stand-in with the tqdm surface the reference uses."""

        def __init__(self, iterable: Optional[Iterable] = None, **kwargs: Any):
            self._iterable = iterable

        def __iter__(self) -> Iterator:
            return iter(self._iterable or [])

        def update(self, n: int = 1) -> None:
            pass

        def close(self) -> None:
            pass

        def __enter__(self) -> "_tqdm":
            return self

        def __exit__(self, *exc: Any) -> None:
            pass


def progress(iterable: Optional[Iterable] = None, **kwargs: Any):
    """tqdm(iterable) or a no-op wrapper when tqdm is absent."""
    return _tqdm(iterable, **kwargs)
