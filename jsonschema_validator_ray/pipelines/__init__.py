"""End-to-end Ray Data validation pipelines."""

from .validate import (ValidationResult, finalize, read_violations,
                       run_partitioned, validate)

__all__ = ["ValidationResult", "validate", "run_partitioned", "finalize",
           "read_violations"]
