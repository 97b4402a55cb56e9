"""Deterministic synthetic transcript tables with enumerated injected
violations (FIXTURES.md §B).

Every cell is a PURE function of (conv_idx, pos) / the global row index, so
generation is chunkable (per file shard) yet byte-identical at any sharding —
the property the golden-violation corpus and resume tests rely on. No RNG
state is carried across rows; "randomness" is Knuth multiplicative hashing.

Arrow schema (BASELINE.json input_hint):
  conv_id:string  turn_idx:int32  role:string  text:string  tool:string
  ts:timestamp[us]
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..constraints.ir import ROLES, TOOL_DICTIONARY, TRANSCRIPT_SPEC

KNUTH = np.uint64(2654435761)
BASE_TS_US = np.int64(np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64))
CONV_STEP_US = 10_000_000   # 10 s between conversation starts
TURN_STEP_US = 1_000_000    # 1 s between turns
HOT_EVERY = 10_000          # one hot conversation per 10k convs (plus conv 1)
HOT_LEN = 8208              # ~1000x median, crosses the 4096 salt span
SALT_SPAN = 4096

_LOREM_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo"
).split()
_BASE_TEXT = " ".join(_LOREM_WORDS * 40)  # ~2.7k chars, sliced per row


def _h(x: np.ndarray, salt: int) -> np.ndarray:
    return (x.astype(np.uint64) * KNUTH + np.uint64(salt)) & np.uint64(0x7FFFFFFF)


def conv_len(conv_idx: np.ndarray) -> np.ndarray:
    """Turns per conversation: 2 + h%13 (median ~8), hot convs get HOT_LEN."""
    lens = 2 + (_h(conv_idx, 7) % 13).astype(np.int64)
    hot = (conv_idx % HOT_EVERY) == 1
    lens[hot] = HOT_LEN
    return lens


def _role_codes(pos: np.ndarray, drifted: bool) -> np.ndarray:
    """0=system 1=user 2=assistant 3=tool; pure in pos."""
    r = np.where(pos % 3 == 1, 1, np.where(pos % 3 == 2, 2, 3)).astype(np.int64)
    r[pos == 0] = 0
    if drifted:  # role-mix shift: user turns become assistant turns
        r[r == 1] = 2
    return r


def _text_len(g: np.ndarray, drifted: bool) -> np.ndarray:
    u = _h(g, 12345).astype(np.float64) / float(1 << 31)
    scale = 192.0 if drifted else 120.0
    return (8 + np.minimum(scale * -np.log1p(-u * 0.999), 2000.0)).astype(np.int64)


@dataclass
class GeneratedData:
    files: list = field(default_factory=list)
    golden_violations: pa.Table | None = None
    n_turns: int = 0
    n_convs: int = 0
    out_dir: str = ""


def _build_shard(conv_lo: int, conv_hi: int, shard_lens: np.ndarray, g0: int,
                 drifted: bool) -> dict:
    """Columnar arrays for conversations [conv_lo, conv_hi) — clean data.
    ``shard_lens`` covers exactly this range; ``g0`` is the global row index
    of its first row (so workers never need the global offsets array)."""
    n = int(shard_lens.sum())
    conv_idx = np.repeat(np.arange(conv_lo, conv_hi, dtype=np.int64), shard_lens)
    # pos within conversation via the arange-minus-offset trick
    starts = np.concatenate([[0], np.cumsum(shard_lens)])[:-1]
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, shard_lens)
    g = np.int64(g0) + np.arange(n, dtype=np.int64)  # global row index

    role_code = _role_codes(pos, drifted)
    tool_mask = (role_code == 3) | ((role_code == 2) & (_h(g, 99) % 5 == 0))
    tool_pick = (_h(conv_idx * 131 + pos, 55) % len(TOOL_DICTIONARY)).astype(np.int64)

    tl = _text_len(g, drifted)
    start = (_h(g, 131) % 997).astype(np.int64)
    return {
        "n": n, "g": g, "conv_idx": conv_idx, "pos": pos,
        "turn_idx": pos.copy(), "role_code": role_code,
        "tool_mask": tool_mask, "tool_pick": tool_pick,
        "text_len": tl, "text_start": start,
        # conversation starts wrap within ~116 days so ts stays inside the
        # spec's [2020, 2035) range at ANY corpus size (mono is per-conv, so
        # wrapping does not affect in-conversation ordering)
        "ts": (BASE_TS_US + (conv_idx % 1_000_000) * CONV_STEP_US
               + pos * TURN_STEP_US),
    }


def _materialize(shard: dict, *, null_tid, null_text, long_text, null_ts,
                 range_ts, bad_tool, bad_role1, bad_role2) -> pa.Table:
    """Apply row-level injection masks and build the Arrow table."""
    n = shard["n"]
    conv_id = pa.array([f"c{c:08d}" for c in shard["conv_idx"]], pa.string())

    turn_idx = pa.Array.from_pandas(shard["turn_idx"], mask=null_tid,
                                    type=pa.int32())

    roles = np.array(ROLES, dtype=object)[shard["role_code"]]
    roles[bad_role1] = "narrator"
    roles[bad_role2] = ""
    role = pa.array(roles.tolist(), pa.string())

    texts: list = [None] * n
    base = _BASE_TEXT
    tl = shard["text_len"]
    st = shard["text_start"]
    for i in range(n):
        texts[i] = base[st[i]:st[i] + tl[i]]
    long_payload = "x" * 33000
    for i in np.flatnonzero(long_text):
        texts[i] = long_payload
    for i in np.flatnonzero(null_text):
        texts[i] = None
    text = pa.array(texts, pa.string())

    tools: list = [None] * n
    for i in np.flatnonzero(shard["tool_mask"]):
        tools[i] = TOOL_DICTIONARY[shard["tool_pick"][i]]
    for i in np.flatnonzero(bad_tool):
        tools[i] = "bogus.tool"
    tool = pa.array(tools, pa.string())

    ts = shard["ts"].copy()
    ts[range_ts] = np.int64(np.datetime64("1999-01-01T00:00:00", "us").astype(np.int64))
    ts_arr = pa.Array.from_pandas(ts, mask=null_ts, type=pa.timestamp("us"))

    return pa.table({
        "conv_id": conv_id, "turn_idx": turn_idx, "role": role,
        "text": text, "tool": tool, "ts": ts_arr,
    })



def _special_convs_local(lo: int, hi: int, lens_slice: np.ndarray, inject: bool):
    """Pure per-range computation of the conv-level injection sets
    (``lens_slice`` covers [lo, hi))."""
    r = np.arange(lo, hi, dtype=np.int64)
    hot = set(r[(r % HOT_EVERY) == 1].tolist())
    if not inject:
        return set(), set(), hot
    swap = {int(c) for c in r[(r % 83) == 13]
            if lens_slice[c - lo] >= 4 and c not in hot}
    dup = {int(c) for c in r[(r % 101) == 17]
           if lens_slice[c - lo] >= 2 and c not in hot and c not in swap}
    return swap, dup, hot


def _generate_one_shard(args: tuple):
    """Build + inject + write ONE shard file (pure function of the plan —
    parallel workers produce byte-identical output to the sequential path)."""
    (s, lo, hi, lens_slice_bytes, g0, n_convs, drifted, inject,
     incoming_dups, out_dir) = args
    lens_slice = np.frombuffer(lens_slice_bytes, np.int64).copy()
    # local view of the global offsets for this range
    offs_local = np.int64(g0) + np.concatenate([[0], np.cumsum(lens_slice)])

    def lens_of(c):
        return int(lens_slice[c - lo])

    swap_convs, dup_convs, hot_convs = _special_convs_local(lo, hi, lens_slice,
                                                            inject)

    # resumable: shard content is pure, so an existing (atomically written)
    # file with a MATCHING plan token is correct — still recompute the
    # (cheap) golden rows, skip the expensive materialize+write below. The
    # token guards against silently reusing shards from a previous
    # generation into the same directory with different parameters.
    path = os.path.join(out_dir, f"part-{s:04d}.parquet")
    plan_token = (f"{lo}:{hi}:{g0}:{n_convs}:{int(drifted)}:{int(inject)}:"
                  f"{len(incoming_dups)}")

    shard = _build_shard(lo, hi, lens_slice, int(g0), drifted)
    n, g = shard["n"], shard["g"]
    conv_idx, pos = shard["conv_idx"], shard["pos"]
    dirty = np.zeros(n, bool)
    golden: list[tuple] = []

    if inject:
        for c in sorted(swap_convs | dup_convs | hot_convs):
            # conv c's rows are the contiguous span starting at offs_local[c-lo]
            start = int(offs_local[c - lo] - g0)
            cid = f"c{c:08d}"
            if c in swap_convs:
                p1, p2 = start + 1, start + 2
                shard["turn_idx"][p1], shard["turn_idx"][p2] = 2, 1
                dirty[p1] = dirty[p2] = True
                golden.append((cid, 2, "mono:turn_idx",
                               "Non-monotonic ts for turn order"))
            elif c in dup_convs:
                p1 = start + 1
                dirty[p1] = True
                golden.append((cid, int(pos[p1]),
                               "unique:(conv_id,turn_idx)", "Duplicate key"))
            elif c in hot_convs and lens_of(c) >= HOT_LEN:
                pa_, pb = start + SALT_SPAN - 1, start + SALT_SPAN
                shard["turn_idx"][pa_], shard["turn_idx"][pb] = \
                    SALT_SPAN, SALT_SPAN - 1
                dirty[pa_] = dirty[pb] = True
                golden.append((cid, SALT_SPAN, "mono:turn_idx",
                               "Non-monotonic ts for turn order"))

        def take(mask):
            m = mask & ~dirty
            dirty[m] = True
            return m

        null_tid = take(g % 997 == 3)
        bad_role1 = take(g % 1009 == 5)
        bad_role2 = take(g % 2017 == 7)
        null_text = take(g % 1013 == 11)
        long_text = take(g % 4999 == 13)
        null_ts = take(g % 1019 == 17)
        range_ts = take(g % 3001 == 19)
        bad_tool = take(g % 1021 == 23)

        for i in np.flatnonzero(null_tid):
            cid = f"c{conv_idx[i]:08d}"
            golden.append((cid, None, "required:turn_idx", "Required property is missing"))
            golden.append((cid, None, "type:turn_idx", "Invalid Type"))
        for i in np.flatnonzero(bad_role1 | bad_role2):
            golden.append((f"c{conv_idx[i]:08d}", int(pos[i]), "enum:role",
                           "Value not in enumeration"))
        for i in np.flatnonzero(null_text):
            cid = f"c{conv_idx[i]:08d}"
            golden.append((cid, int(pos[i]), "required:text", "Required property is missing"))
            golden.append((cid, int(pos[i]), "type:text", "Invalid Type"))
        for i in np.flatnonzero(long_text):
            golden.append((f"c{conv_idx[i]:08d}", int(pos[i]), "format:text",
                           "String length out of bounds"))
        for i in np.flatnonzero(null_ts):
            cid = f"c{conv_idx[i]:08d}"
            golden.append((cid, int(pos[i]), "required:ts", "Required property is missing"))
            golden.append((cid, int(pos[i]), "type:ts", "Invalid Type"))
        for i in np.flatnonzero(range_ts):
            cid = f"c{conv_idx[i]:08d}"
            golden.append((cid, int(pos[i]), "range:ts", "Value out of range"))
            # mono regression fires only if a PRECEDING row of the conversation
            # survives with non-null turn_idx AND non-null ts (the final
            # injection masks encode dirty-first-wins exactly; conv-level
            # injections keep tid/ts valid, so they never mask a predecessor)
            p = int(pos[i])
            conv_start = i - p  # conv rows are contiguous in the shard
            if p > 0 and bool(np.any(~(null_tid[conv_start:i]
                                       | null_ts[conv_start:i]))):
                golden.append((cid, p, "mono:turn_idx",
                               "Non-monotonic ts for turn order"))
        for i in np.flatnonzero(bad_tool):
            golden.append((f"c{conv_idx[i]:08d}", int(pos[i]), "ref:tool",
                           "Unresolved reference"))
    else:
        z = np.zeros(n, bool)
        null_tid = bad_role1 = bad_role2 = null_text = long_text = z
        null_ts = range_ts = bad_tool = z

    if os.path.exists(path):
        meta = pq.ParquetFile(path).metadata.metadata or {}
        if meta.get(b"graft_plan") == plan_token.encode():
            return s, path, golden, pq.ParquetFile(path).metadata.num_rows
        # stale shard from a different generation plan: fall through, rewrite

    tbl = _materialize(shard, null_tid=null_tid, null_text=null_text,
                       long_text=long_text, null_ts=null_ts, range_ts=range_ts,
                       bad_tool=bad_tool, bad_role1=bad_role1,
                       bad_role2=bad_role2)
    # rows duplicated INTO this shard from other shards' dup conversations
    if incoming_dups:
        add = []
        for c, p, len_c, g0_c in incoming_dups:
            shard1 = _build_shard(c, c + 1, np.array([len_c], np.int64),
                                  int(g0_c), drifted)
            one = _materialize(shard1, **{k: np.zeros(shard1["n"], bool) for k in
                                          ("null_tid", "null_text", "long_text",
                                           "null_ts", "range_ts", "bad_tool",
                                           "bad_role1", "bad_role2")})
            add.append(one.slice(p, 1))
        tbl = pa.concat_tables([tbl] + add)

    tmp = path + ".tmp"
    tbl = tbl.replace_schema_metadata({"graft_plan": plan_token})
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)  # atomic: a crashed run never leaves partial shards
    return s, path, golden, tbl.num_rows


def generate_transcripts(out_dir: str, n_convs: int = 600, n_files: int = 4,
                         inject: bool = True, drifted: bool = False,
                         workers: int = 0) -> GeneratedData:
    """Generate the transcripts table + (if inject) the golden violation corpus.

    Injection classes (disjoint by a first-wins dirty mask, conv-level first):
      conv-level: swapped turn_idx pair (mono), duplicated row across file
      boundary (unique), hot-conv swap across the 4096 salt boundary (mono);
      row-level by global index g:
        g%997==3 null turn_idx | g%1009==5 role narrator | g%2017==7 role ""
        g%1013==11 null text   | g%4999==13 oversized text
        g%1019==17 null ts     | g%3001==19 out-of-range ts (also mono if pos>0)
        g%1021==23 bogus tool
    """
    os.makedirs(out_dir, exist_ok=True)
    all_convs = np.arange(n_convs, dtype=np.int64)
    lens = conv_len(all_convs)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    n_total = int(offsets[-1])

    per_shard = max(1, (n_convs + n_files - 1) // n_files)
    shard_ranges = []
    for s in range(n_files):
        lo, hi = s * per_shard, min((s + 1) * per_shard, n_convs)
        if lo >= hi:
            break
        shard_ranges.append((s, lo, hi))
    n_shards = len(shard_ranges)

    # duplicated-row routing plan (pure): dup conv c's row at position 1 is
    # appended to the NEXT shard — crosses file boundaries
    incoming: dict[int, list] = {s: [] for s, _, _ in shard_ranges}
    if inject:
        for s, lo, hi in shard_ranges:
            _, dup, _ = _special_convs_local(lo, hi, lens[lo:hi], True)
            for c in sorted(dup):
                incoming[(s + 1) % n_shards].append(
                    (c, 1, int(lens[c]), int(offsets[c])))

    jobs = [(s, lo, hi, lens[lo:hi].tobytes(), int(offsets[lo]), n_convs,
             drifted, inject, incoming[s], out_dir)
            for s, lo, hi in shard_ranges]

    golden: list[tuple] = []
    out_files = []
    n_rows_written = 0
    if workers == 0:
        workers = min(os.cpu_count() or 4, n_shards) if n_shards > 4 else 1
    if workers > 1:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=workers) as pool:
            for s, path, g_rows, n_rows in pool.map(_generate_one_shard, jobs,
                                                    chunksize=1):
                out_files.append(path)
                golden.extend(g_rows)
                n_rows_written += n_rows
    else:
        for job in jobs:
            s, path, g_rows, n_rows = _generate_one_shard(job)
            out_files.append(path)
            golden.extend(g_rows)
            n_rows_written += n_rows
    out_files.sort()

    golden_tbl = pa.table({
        "conv_id": pa.array([x[0] for x in golden], pa.string()),
        "turn_idx": pa.array([x[1] for x in golden], pa.int32()),
        "constraint_id": pa.array([x[2] for x in golden], pa.string()),
        "message": pa.array([x[3] for x in golden], pa.string()),
    }).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending"),
                ("constraint_id", "ascending")])
    if inject:
        pq.write_table(golden_tbl, os.path.join(out_dir, "golden_violations.parquet"))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"n_convs": n_convs, "n_turns": n_rows_written,
                   "n_files": len(out_files), "inject": inject,
                   "drifted": drifted}, f)
    return GeneratedData(files=out_files, golden_violations=golden_tbl,
                         n_turns=n_total, n_convs=n_convs, out_dir=out_dir)


def reference_stats(n_convs: int = 2000) -> dict:
    """Drift reference from a CLEAN in-memory generation at fixed size:
    role relative frequencies + turn-length CDF points (t-digest)."""
    from ..state import SketchState

    lens = conv_len(np.arange(n_convs, dtype=np.int64))
    shard = _build_shard(0, n_convs, lens, 0, drifted=False)
    z = np.zeros(shard["n"], bool)
    tbl = _materialize(shard, null_tid=z, null_text=z, long_text=z, null_ts=z,
                       range_ts=z, bad_tool=z, bad_role1=z, bad_role2=z)
    s = SketchState()
    s.update_batch(tbl)
    total = sum(s.role_counts.values())
    rolefreq = {k: v / total for k, v in sorted(s.role_counts.items())}
    qs = np.linspace(0.02, 0.98, 25)
    edges = [s.turnlen.quantile(float(q)) for q in qs]
    cdf = [[float(e), float(s.turnlen.cdf(e))] for e in edges]
    return {"rolefreq": rolefreq, "turnlen_cdf": cdf}


def spec_with_drift(ref_stats: dict, *, min_pvalue: float = 1e-4,
                    max_ks: float = 0.12) -> dict:
    """TRANSCRIPT_SPEC + drift section bound to reference stats."""
    spec = json.loads(json.dumps(TRANSCRIPT_SPEC))
    spec["table"]["drift"] = {
        "rolefreq": {"column": "role", "reference": ref_stats["rolefreq"],
                     "min_pvalue": min_pvalue},
        "turnlen": {"column": "text", "reference_cdf": ref_stats["turnlen_cdf"],
                    "max_ks": max_ks},
    }
    return spec
