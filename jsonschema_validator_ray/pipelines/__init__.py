"""End-to-end Ray Data validation pipelines."""

from .validate import ValidationResult, validate, run_partitioned, finalize

__all__ = ["ValidationResult", "validate", "run_partitioned", "finalize"]
