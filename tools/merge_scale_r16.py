#!/usr/bin/env python3
"""Merge the four pairs of scale-run logs into SCALE_r16.json.

Min-of-two protocol: every entry at BOTH scales is the per-entry minimum
of two full runs (Bench headline queries are themselves best-of-3 per
CBO arm inside each run; ops/scalecheck labels run once per full pass).
"""
import json
import sys


def last_json(path, metric):
    out = None
    for line in open(path, errors="replace"):
        line = line.strip()
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        if line.startswith("{") and f'"metric":"{metric}"' in line:
            try:
                out = json.loads(line)
            except json.JSONDecodeError:
                pass
    if out is None:
        raise SystemExit(f"no {metric} JSON line in {path}")
    return out


def min_merge(a, b):
    """Per-entry minimum of two records with the same shape."""
    if isinstance(a, dict) and isinstance(b, dict):
        return {k: min_merge(a[k], b[k]) if k in b else a[k] for k in a}
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if a < 0:
            return b
        if b < 0:
            return a
        return min(a, b)
    return a


def bench_total(rec):
    return sum(v for v in rec["queries"].values() if v >= 0)


def load_pair(prefix, metric):
    import os
    m = last_json(f"{prefix}_1.out", metric)
    for i in (2, 3):
        if os.path.exists(f"{prefix}_{i}.out"):
            m = min_merge(m, last_json(f"{prefix}_{i}.out", metric))
    if metric == "total":
        m["value"] = bench_total(m)
        m["total_sec"] = m["value"]
        if "cbo_ab" in m:
            m["cbo_ab"]["off_total"] = m["value"]
            m["cbo_ab"]["on_total"] = sum(
                v for v in m["cbo_ab"]["on_queries"].values() if v >= 0)
    return m


bench01 = load_pair("/tmp/bench_sf01_r16", "total")
bench1 = load_pair("/tmp/bench_sf1_r16", "total")
sc01 = load_pair("/tmp/sc_sf01_r16", "scalecheck")
sc1 = load_pair("/tmp/sc_sf1_r16", "scalecheck")

# (the sidecar_filtered_scan twin fix — fresh untagged plan built outside
# the timed region, FileScan required in the plan — is in ScaleCheck
# itself since the first record, so every pass now measures a genuine
# scan; the earlier pass-3-only override is obsolete.)

record = {
    "metric": "scale_check_x10",
    "protocol": (
        "RE-RECORDED at the round-16 FINAL OPTIMIZED HEAD (after the "
        "OPTIMIZATION_r16.md changes: packed-buffer text kernels, hashed "
        "gram/shingle equality keys, fused bigram/token generators, "
        "native exact embedding dot, kNN norm hoist) — supersedes the "
        "mid-round record taken before those changes. ScaleGen x10 "
        "key-shifted amplification of /root/testdata/sf0.1 -> "
        "/tmp/graft-sf1 (fixture regenerated this session, deterministic); "
        "graft.Bench + graft.ScaleCheck at both scales, local[32]; every "
        "entry at both scales is the per-entry minimum over THREE full "
        "runs — passes 1-2 after the text/embedding optimization commits, "
        "pass 3 at the final HEAD which additionally carries the native "
        "token-count map stages (q46/q103) and the q92 arithmetic count; "
        "probe code is otherwise identical across passes. Carried "
        "round-16 probes: cross-QUERY SnapshotCache "
        "behind every SQL resolution and stamped serve (serve-vs-scan "
        "twins, both through the cache); iceberg_sidecar_* = the "
        "365-tuple sidecar cycle on an ICEBERG table; "
        "minhash_fixed_dup_twin = q47's operator with dup pairs held "
        "CONSTANT while the corpus grows. The sidecar_filtered_scan twin "
        "builds a fresh untagged plan outside the timed region and "
        "requires FileScan in the plan (fix in ScaleCheck since the "
        "first record — every pass here measures a genuine scan). "
        "Bench headline remains a CBO off/on A/B (contract metric = the "
        "off arm; on arm in cbo_ab). "
        "Per-pass logs /tmp/{bench,sc}_sf{01,1}_r16_{1,2}.out"),
    "sf0_1": {"bench": bench01, "scalecheck": sc01},
    "sf1": {"bench": bench1, "scalecheck": sc1},
    "wallclock_ratio_10x_data": {
        k: round(sc1["queries"][k] / sc01["queries"][k], 3)
        for k in sc1["queries"] if sc01["queries"].get(k, 0) > 0
    },
    "headline_total_ratio": round(bench_total(bench1) / bench_total(bench01), 3),
}
with open("/root/repo/SCALE_r16.json", "w") as f:
    json.dump(record, f, indent=1)
print("headline sf0.1 (cbo off):", round(bench_total(bench01), 3),
      "cbo on:", bench01.get("cbo_ab", {}).get("on_total"))
print("headline x10 ratio:", record["headline_total_ratio"])
worst = sorted(record["wallclock_ratio_10x_data"].items(),
               key=lambda kv: -kv[1])[:8]
print("worst x10 ratios:", worst)
side = {k: v for k, v in record["wallclock_ratio_10x_data"].items()
        if "sidecar" in k}
print("sidecar ratios:", side)
