"""Filename -> SourceConfig dispatch (SURVEY §2.1 S13).

Reference: glob match of the lowered filename against each source's
``file_pattern``; 0 matches -> skip ("no source"), >1 -> error (reference
sources/registry.py:21-53, sources/base.py:31-38).
"""

from __future__ import annotations

from etl_file_loader_spark.config import SourceConfig
from etl_file_loader_spark.exceptions import MultipleSourceMatchError, NoSourceMatchError


class SourceRegistry:
    def __init__(self, sources: list[SourceConfig] | None = None):
        self.sources: list[SourceConfig] = list(sources or [])

    def register(self, source: SourceConfig) -> None:
        self.sources.append(source)

    def find_source_for_file(self, filename: str) -> SourceConfig:
        matches = [s for s in self.sources if s.matches(filename)]
        if not matches:
            raise NoSourceMatchError(f"no source pattern matches {filename!r}", filename)
        if len(matches) > 1:
            names = [s.name for s in matches]
            raise MultipleSourceMatchError(
                f"multiple sources match {filename!r}: {names}", filename
            )
        return matches[0]
