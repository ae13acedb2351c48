"""Driver-side utilities.

Retry decorator mirrors the reference's transient-failure policy (reference
src/utils.py:19-41): retry driver-side I/O (filesystem, catalog) with
exponential backoff, but never retry file-content errors — those are
deterministic and re-raising them immediately preserves fail-fast semantics.
Spark task retries already cover executor-side transience.
"""

from __future__ import annotations

import functools
import logging
import time

from etl_file_loader_spark.exceptions import FileError

logger = logging.getLogger(__name__)


def retry(attempts: int = 3, backoff_seconds: float = 2.0):
    def decorator(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            last: Exception | None = None
            for attempt in range(1, attempts + 1):
                try:
                    return fn(*args, **kwargs)
                except FileError:
                    raise  # deterministic file errors never retry
                except Exception as e:  # noqa: BLE001 - transient driver I/O
                    last = e
                    if attempt == attempts:
                        raise
                    delay = backoff_seconds * (2 ** (attempt - 1))
                    logger.warning(
                        "%s failed (attempt %d/%d): %s; retrying in %.1fs",
                        fn.__name__, attempt, attempts, e, delay,
                    )
                    time.sleep(delay)
            raise last  # unreachable

        return wrapper

    return decorator
