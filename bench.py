#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32) and
prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...extras}

--scaling: runs the headline transcript-validation pipeline twice in FRESH
processes (num_cpus=8 then 32) on the same input and reports throughput at
both plus scaling efficiency = (T8/T32)/4 (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# bench transcript corpus scale: tied to the sf of the testdata dir
_SF_CONVS = {"sf0.001": 3_000, "sf0.01": 30_000, "sf0.1": 8_000_000}

BENCH_QUERIES = [
    "pricing_summary_lineitem",
    "enum_check_events",
    "mono_check_events",
    "unique_check_events",
    "struct_check_events",
    "sample_events",
    "exact_dedup_documents",
    "token_count_documents",
    "simsearch_top5",
    "hll_distinct_events",
    "minhash_neardup_documents",
    "simhash_neardup_documents",
    "ngram_jaccard_neardup",
    "embedding_neardup",
    "shipping_priority",
    "running_total_orders",
]


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    from jsonschema_validator_ray.rayutil import \
        quiet_empty_partition_warnings

    quiet_empty_partition_warnings()
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    return ray


def _bench_transcripts(sf_dir: str) -> tuple:
    """Generate (cached) the bench transcript corpus for this sf."""
    from jsonschema_validator_ray.sources import (
        generate_transcripts, reference_stats, spec_with_drift)

    name = os.path.basename(os.path.normpath(sf_dir))
    n_convs = int(os.environ.get("GRAFT_BENCH_CONVS", 0)) or \
        _SF_CONVS.get(name, 30_000)
    out = f"/tmp/graft_transcripts/bench_{n_convs}"
    meta = os.path.join(out, "meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            m = json.load(f)
        files = sorted(os.path.join(out, p) for p in os.listdir(out)
                       if p.startswith("part-"))
        gen_turns = m["n_turns"]
    else:
        t0 = time.perf_counter()
        gen = generate_transcripts(out, n_convs=n_convs,
                                   n_files=max(8, n_convs // 40_000))
        print(f"# generated {gen.n_turns} turns in "
              f"{time.perf_counter()-t0:.0f}s", file=sys.stderr)
        files = gen.files
        gen_turns = gen.n_turns
    spec = spec_with_drift(reference_stats(min(n_convs, 20_000)))
    return files, spec, gen_turns, n_convs


def run_headline(num_cpus: int, sf_dir: str) -> dict:
    """The headline pipeline: full transcript constraint validation."""
    _init_ray(num_cpus)
    from jsonschema_validator_ray.pipelines import validate

    files, spec, n_turns, n_convs = _bench_transcripts(sf_dir)
    # warm-up: spin the worker pool + JIT caches on a small slice (a real
    # cluster has warm workers; fresh-process cold start is not throughput)
    validate(files[: max(2, len(files) // 16)], spec=spec, strategy="hashbucket")
    # best-of-2: this host shows ±30%-4x run-to-run noise from neighbors;
    # both walls are reported so the variance stays visible
    walls = []
    res = None
    for _ in range(2):
        t0 = time.perf_counter()
        res = validate(files, spec=spec, strategy="hashbucket")
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    return {
        "wall_s": round(wall, 3),
        "wall_s_runs": [round(w, 3) for w in walls],
        "n_turns": res.metrics["n_rows"],
        "turns_per_sec": round(res.metrics["n_rows"] / wall),
        "n_violations": res.metrics["n_violations"],
        "num_cpus": num_cpus,
        "n_convs": n_convs,
    }


def run_queries(sf_dir: str, reps: int | None = None
                ) -> tuple[dict, dict, int]:
    """Interleaved best-per-query protocol (VERDICT r3 #1): the full query
    list runs ``reps`` complete ROUNDS (round-robin, not back-to-back reps of
    one query), so every query samples ≥2 separated points of the host's
    noise window; the reported number is the best per query and ALL samples
    stay in the artifact. On this host identical runs vary 1.6-2.1×
    (BASELINE.md), which single-sample artifacts kept mistaking for
    regressions. Default 3 rounds (GRAFT_BENCH_REPS): the heavy near-dup
    queries' band straddles their ≤5 s bars in a 2-sample window."""
    import __ray_entry__ as entrymod

    if reps is None:
        reps = int(os.environ.get("GRAFT_BENCH_REPS", "3"))
    qs = entrymod.queries()
    samples: dict = {name: [] for name in BENCH_QUERIES}
    for _ in range(reps):
        for name in BENCH_QUERIES:
            t0 = time.perf_counter()
            qs[name](sf_dir)
            samples[name].append(round(time.perf_counter() - t0, 3))
    best = {name: min(v) for name, v in samples.items()}
    return best, samples, reps


def main():
    if "--_headline-child" in sys.argv:
        result = run_headline(NUM_CPUS, SF_DIR)
        print("CHILD_RESULT " + json.dumps(result))
        import ray
        ray.shutdown()
        return

    if "--extended" in sys.argv:
        # time EVERY queries() entry at $GRAFT_SF_DIR (one pass, wall per
        # query) — a coverage-wide perf snapshot. Separate mode so the
        # default artifact's 17-query total stays comparable across rounds.
        _init_ray(NUM_CPUS)
        import __ray_entry__ as entrymod

        qs = entrymod.queries()
        walls = {}
        for name, fn in qs.items():
            t0 = time.perf_counter()
            fn(SF_DIR)
            walls[name] = round(time.perf_counter() - t0, 3)
        print(json.dumps({
            "metric": "extended per-query wall (all gate queries, one rep)",
            "value": round(sum(walls.values()), 3), "unit": "sec",
            "queries": walls, "sf": SF_DIR, "num_cpus": NUM_CPUS,
        }))
        import ray
        ray.shutdown()
        return

    if "--scaling" in sys.argv:
        # ensure the corpus exists before timing children
        from jsonschema_validator_ray.sources import generate_transcripts  # noqa
        _bench_transcripts_nojit = _bench_transcripts(SF_DIR)
        pair = tuple(int(x) for x in
                     os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(","))
        # ALTERNATE the two levels across rounds and take the best per level:
        # on a noisy-neighbor host, measuring the levels minutes apart makes
        # the efficiency a ratio of two unrelated load snapshots (observed
        # 0.55-0.91 flapping on identical code); interleaving samples both
        # levels across the same window and best-per-level estimates capacity
        rounds = int(os.environ.get("GRAFT_SCALING_ROUNDS", "2"))
        results: dict = {c: [] for c in pair}
        for _ in range(rounds):
            for cpus in pair:
                env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus),
                           GRAFT_SF_DIR=SF_DIR)
                p = subprocess.run(
                    [sys.executable, __file__, "--_headline-child"],
                    env=env, capture_output=True, text=True)
                line = [ln for ln in p.stdout.splitlines()
                        if ln.startswith("CHILD_RESULT ")]
                if not line:
                    print(p.stdout[-2000:], file=sys.stderr)
                    print(p.stderr[-2000:], file=sys.stderr)
                    raise RuntimeError(f"scaling child (cpus={cpus}) failed")
                results[cpus].append(
                    json.loads(line[0][len("CHILD_RESULT "):]))
        lo, hi = pair
        best = {c: max(results[c], key=lambda r: r["turns_per_sec"])
                for c in pair}
        tp_lo = best[lo]["turns_per_sec"]
        tp_hi = best[hi]["turns_per_sec"]
        eff = (tp_hi / tp_lo) / (hi / lo)
        print(json.dumps({
            "metric": f"transcript validation scaling {lo}->{hi} cpus",
            "value": round(eff, 3), "unit": "efficiency",
            "sf": SF_DIR, "num_cpus": hi,
            f"turns_per_sec_{lo}cpus": tp_lo,
            f"turns_per_sec_{hi}cpus": tp_hi,
            f"wall_s_{lo}cpus": best[lo]["wall_s"],
            f"wall_s_{hi}cpus": best[hi]["wall_s"],
            f"all_turns_per_sec_{lo}cpus": [r["turns_per_sec"]
                                            for r in results[lo]],
            f"all_turns_per_sec_{hi}cpus": [r["turns_per_sec"]
                                            for r in results[hi]],
            "scaling_efficiency": round(eff, 3),
            "n_turns": best[hi]["n_turns"],
        }))
        return

    t_all = time.perf_counter()
    headline = run_headline(NUM_CPUS, SF_DIR)
    best, samples, reps = run_queries(SF_DIR)
    queries = dict(validate_transcripts=headline["wall_s"], **best)
    total = sum(queries.values())
    print(json.dumps({
        "metric": "validated turns/sec (constraint-eval throughput)",
        # value = SUM OF PER-QUERY BEST walls under the interleaved
        # best-per-query protocol (all samples in queries_all_runs) — directly
        # comparable to prior rounds' per-query sums, robust to the host's
        # measured 1.6-2.1× within-window noise
        "value": round(total, 3), "unit": "sec",
        "protocol": f"interleaved best-of-{reps} per query; value = sum of bests",
        "queries": queries,
        "queries_all_runs": dict(
            validate_transcripts=headline["wall_s_runs"], **samples),
        "wall_total_s": round(time.perf_counter() - t_all, 3),
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
        "turns_per_sec": headline["turns_per_sec"],
        "n_turns": headline["n_turns"],
        "n_violations": headline["n_violations"],
    }))
    import ray
    ray.shutdown()


if __name__ == "__main__":
    main()
