"""Driver-side retry with exponential backoff.

Parity target: reference ``retry.py:16-150`` (tenacity: 3 attempts, 2–10 s
exponential backoff, env-tunable, retryable-error classification). On Spark
the *data plane* already retries (``spark.task.maxFailures`` + object-store
connector retries), so this decorator only guards driver-side metadata I/O
(metadata.json reads/writes, catalog globs) — the same scope split SURVEY.md
§2.10 C7 calls for. Implemented without tenacity (not in this environment).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Callable, TypeVar

F = TypeVar("F", bound=Callable[..., Any])

# Env knobs use the REFERENCE's exact names (retry.py:34,42,50) so a
# user's existing environment keeps working; the round-1 invented names
# are honored as legacy aliases (checked second).
ENV_MAX_ATTEMPTS = "PINECONE_DATASETS_MAX_RETRY_ATTEMPTS"
ENV_MIN_WAIT = "PINECONE_DATASETS_MIN_RETRY_WAIT"
ENV_MAX_WAIT = "PINECONE_DATASETS_MAX_RETRY_WAIT"
ENV_DISABLE = "PINECONE_DATASETS_DISABLE_RETRY"

_LEGACY_MAX_ATTEMPTS = "PINECONE_DATASETS_RETRY_MAX_ATTEMPTS"
_LEGACY_BACKOFF_MIN = "PINECONE_DATASETS_RETRY_BACKOFF_MIN"
_LEGACY_BACKOFF_MAX = "PINECONE_DATASETS_RETRY_BACKOFF_MAX"


def _env_number(primary: str, legacy: str, default: float) -> float:
    for name in (primary, legacy):
        raw = os.environ.get(name)
        if raw is not None:
            try:
                return float(raw)
            except ValueError:
                # Reference behavior (retry.py:33-35): unparseable env
                # values fall back to the default, not an exception.
                continue
    return default

# Never retried: caller bugs / permanent failures (reference retry.py:55-111).
_NON_RETRYABLE = (
    FileNotFoundError,
    PermissionError,
    IsADirectoryError,
    NotADirectoryError,
    ValueError,
    TypeError,
    KeyError,
)

_RETRYABLE_MESSAGE_HINTS = (
    "connection",
    "timeout",
    "timed out",
    "temporarily unavailable",
    "reset by peer",
    "broken pipe",
    "503",
    "429",
)


def is_retryable(exc: BaseException) -> bool:
    if isinstance(exc, _NON_RETRYABLE):
        return False
    if isinstance(exc, (ConnectionError, TimeoutError, OSError)):
        return True
    msg = str(exc).lower()
    return any(h in msg for h in _RETRYABLE_MESSAGE_HINTS)


def with_retry(func: F) -> F:
    """Retry ``func`` on transient errors with exponential backoff."""

    @functools.wraps(func)
    def wrapper(*args: Any, **kwargs: Any) -> Any:
        if os.environ.get(ENV_DISABLE, "").lower() in ("1", "true", "yes"):
            return func(*args, **kwargs)
        # clamp to >= 1: attempts=0 (or negative) from the env var
        # previously skipped the loop and hit `raise last` with
        # last=None — a TypeError that never ran the function and never
        # mentioned the env var (r11 review)
        attempts = max(
            int(_env_number(ENV_MAX_ATTEMPTS, _LEGACY_MAX_ATTEMPTS, 3)), 1
        )
        backoff_min = _env_number(ENV_MIN_WAIT, _LEGACY_BACKOFF_MIN, 2.0)
        backoff_max = _env_number(ENV_MAX_WAIT, _LEGACY_BACKOFF_MAX, 10.0)
        last: BaseException | None = None
        for attempt in range(attempts):
            try:
                return func(*args, **kwargs)
            except BaseException as exc:  # noqa: BLE001 - classified below
                if not is_retryable(exc) or attempt == attempts - 1:
                    raise
                last = exc
                delay = min(backoff_min * (2**attempt), backoff_max)
                time.sleep(delay)
        raise last  # pragma: no cover - loop always returns or raises

    return wrapper  # type: ignore[return-value]
