"""Mergeable streaming sketches + drift tests.

The stateful generalization the north star requires on top of the reference's
(stateless, single-document) validators: HyperLogLog distinct counts, t-digest
quantiles, and categorical counters, each with commutative/idempotent-by-key
partial+final merge so failed actors or resumed partitions never double-count
(SURVEY.md §4.2 retries row).
"""

from .hll import HyperLogLog
from .tdigest import TDigest
from .drift import chi_square_test, ks_statistic_from_cdf
from .sketches import SketchState
from .cms import CountMinSketch

__all__ = [
    "HyperLogLog",
    "TDigest",
    "chi_square_test",
    "ks_statistic_from_cdf",
    "SketchState",
    "CountMinSketch",
]
