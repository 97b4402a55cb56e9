"""Deterministic synthetic sources (FIXTURES.md §B)."""

from .transcripts import (
    GeneratedData,
    generate_transcripts,
    reference_stats,
    spec_with_drift,
)

__all__ = [
    "GeneratedData",
    "generate_transcripts",
    "reference_stats",
    "spec_with_drift",
]
