#!/usr/bin/env python3
"""Aggregate the min-of-two Bench + ScaleCheck runs at sf0.1 and the
ScaleGen x10 fixture into SCALE_r{N}.json (per-entry minimum, ratio map).

Usage: scale_record.py <round> <bench01_1> <bench01_2> <bench1_1> <bench1_2>
                        <sc01_1> <sc01_2> <sc1_1> <sc1_2>
"""
import json
import sys


def read_json_line(path, metric):
    with open(path, errors="replace") as f:
        for line in f:
            i = line.find('{"metric":"%s"' % metric)
            if i >= 0:
                return json.loads(line[i:])
    raise SystemExit(f"no {metric} JSON line in {path}")


def min_merge(a, b):
    """Per-entry minimum of two bench/scalecheck dicts (recursive over
    the nested demo blocks)."""
    out = {}
    for k, va in a.items():
        vb = b.get(k, va)
        if isinstance(va, dict):
            out[k] = min_merge(va, vb)
        elif isinstance(va, (int, float)) and isinstance(vb, (int, float)) and k != "sf":
            out[k] = min(va, vb)
        else:
            out[k] = va
    return out


def flat_queries(bench, sc):
    q = {}
    q.update(bench.get("queries", {}))
    for blk in ("skew_demo", "dv_demo", "iceberg_demo", "ops_demo"):
        q.update(bench.get(blk, {}))
    q.update(sc.get("queries", {}))
    return q


def main():
    rnd = sys.argv[1]
    paths = sys.argv[2:10]
    b01 = min_merge(read_json_line(paths[0], "total"), read_json_line(paths[1], "total"))
    b1 = min_merge(read_json_line(paths[2], "total"), read_json_line(paths[3], "total"))
    s01 = min_merge(read_json_line(paths[4], "scalecheck"), read_json_line(paths[5], "scalecheck"))
    s1 = min_merge(read_json_line(paths[6], "scalecheck"), read_json_line(paths[7], "scalecheck"))
    q01 = flat_queries(b01, s01)
    q1 = flat_queries(b1, s1)
    ratios = {k: round(q1[k] / q01[k], 3) for k in q01 if k in q1 and q01[k] > 0}
    out = {
        "metric": "scale_check_x10",
        "protocol": ("ScaleGen x10 key-shifted amplification of /root/testdata/sf0.1 -> "
                     "/tmp/graft-sf1; graft.Bench + graft.ScaleCheck at both scales, "
                     "local[32]; EVERY entry at BOTH scales is the per-entry minimum of "
                     "two full runs (per-pass logs /tmp/{bench,sc}_sf{01,1}_r13_{1,2}.out "
                     "in the round-%s session)" % rnd),
        "sf0_1": {"bench": b01, "scalecheck": s01},
        "sf1": {"bench": b1, "scalecheck": s1},
        "wallclock_ratio_10x_data": ratios,
        "headline_total_ratio": round(b1["value"] / b01["value"], 3),
    }
    dest = f"/root/repo/SCALE_r{rnd}.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(dest)
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
    print("headline_total_ratio:", out["headline_total_ratio"])
    print("worst ratios:", worst)


if __name__ == "__main__":
    main()
