"""Engine error taxonomy.

Mirrors the reference's exception contract (reference
src/exception/exceptions.py:6-125): file-level errors that abort one file's
pipeline but are "handled" (stakeholders notified, run continues) vs hard
errors. Names are kept close so a reference user can map their alerting.
"""

from __future__ import annotations


class FileLoaderError(Exception):
    """Base for all engine errors."""


class FileError(FileLoaderError):
    """Base for per-file, handled errors (reference: BaseFileErrorEmailException)."""

    def __init__(self, message: str, filename: str | None = None):
        self.filename = filename
        super().__init__(message)


class MissingHeaderError(FileError):
    """File has no/blank header row (reference read/csv.py:49-61)."""


class MissingColumnsError(FileError):
    """Required model columns absent from the file (reference read/base.py:42-64)."""

    def __init__(self, missing: list[str], filename: str | None = None):
        self.missing = sorted(missing)
        super().__init__(f"missing required columns: {self.missing}", filename)


class NoDataInFileError(FileError):
    """File parsed but contains zero records (reference read/json.py:83-97)."""


class GrainValidationError(FileError):
    """Grain (uniqueness key) duplicated in the staged data (reference audit/base.py:84-93)."""

    def __init__(self, grain: list[str], examples: list[dict], filename: str | None = None):
        self.grain = grain
        self.examples = examples
        super().__init__(f"duplicate grain {grain}; examples: {examples}", filename)


class AuditFailedError(FileError):
    """A custom audit column evaluated to 0 (reference audit/base.py:106-121)."""

    def __init__(self, failed_audits: list[str], filename: str | None = None):
        self.failed_audits = failed_audits
        super().__init__(f"failed audits: {failed_audits}", filename)


class ValidationThresholdExceededError(FileError):
    """error_rate >= validation_error_threshold (reference validator.py:149-169)."""

    def __init__(self, error_rate: float, threshold: float, samples: list[dict], filename: str | None = None):
        self.error_rate = error_rate
        self.threshold = threshold
        self.samples = samples
        super().__init__(
            f"validation error rate {error_rate:.2%} >= threshold {threshold:.2%}", filename
        )


class DuplicateFileError(FileError):
    """File already published to the target (reference runner.py:127-140)."""


class NoSourceMatchError(FileError):
    """No registered source pattern matches the filename (reference registry.py:21-53)."""


class MultipleSourceMatchError(FileError):
    """More than one source pattern matches the filename (reference registry.py:40-49)."""
