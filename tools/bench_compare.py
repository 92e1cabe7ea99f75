#!/usr/bin/env python3
"""Cross-round bench comparison with noise rejection.

Usage: python3 tools/bench_compare.py <old> <new> [--ratio-flag 1.3]

<old>/<new> are either driver BENCH_r{N}.json files (with a "tail"
field holding the JSON line) or files containing the raw Bench stdout
line. When per-rep `samples` vectors are present (round 11+), the
comparison statistic is the TRIMMED MIN: drop the single worst rep,
take the min of the rest — one contaminated rep on a noisy shared host
can then neither inflate a query's number (min already resists that)
nor mask a regression behind a lucky outlier. Falls back to plain min
for pre-samples rounds.
"""
import json
import sys


def load(path):
    raw = open(path).read()
    if raw.lstrip().startswith("{") and '"tail"' in raw:
        try:
            raw = json.loads(raw)["tail"]
        except (json.JSONDecodeError, KeyError):
            pass
    if '{"metric"' in raw:
        line = '{"metric"' + raw.split('{"metric"', 1)[1].split("\n")[0].strip()
        return json.loads(line)
    # driver files truncate the tail mid-JSON (they begin at ',"unit"');
    # reattach a synthetic head
    i = raw.find('"unit"')
    if i < 0:
        raise SystemExit(f"{path}: no bench JSON line found")
    frag = raw[i:].split("\n")[0].strip().rstrip(",")
    return json.loads('{"metric":"total","value":0,' + frag)


def stat(bench, q):
    samples = bench.get("samples", {}).get(q)
    if samples and len(samples) >= 3:
        trimmed = sorted(samples)[:-1]  # drop the single worst rep
        return min(trimmed)
    return bench.get("queries", {}).get(q)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flag = 1.3
    if "--ratio-flag" in sys.argv:
        flag = float(sys.argv[sys.argv.index("--ratio-flag") + 1])
    old, new = load(args[0]), load(args[1])
    names = sorted(set(old.get("queries", {})) | set(new.get("queries", {})))
    regressions = []
    print(f"{'query':30s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for q in names:
        o, n = stat(old, q), stat(new, q)
        if o is None or o <= 0:
            print(f"{q:30s} {'-':>8s} {n:8.3f}     new")
        elif n is None or n <= 0:
            print(f"{q:30s} {o:8.3f} {'-':>8s}    GONE")
            regressions.append(q)
        else:
            r = n / o
            mark = " <<<" if r > flag else ""
            if r > flag:
                regressions.append(q)
            print(f"{q:30s} {o:8.3f} {n:8.3f} {r:6.2f}x{mark}")
    common_o = sum(v for q in names if (v := stat(old, q)) and stat(new, q))
    common_n = sum(v for q in names if stat(old, q) and (v := stat(new, q)))
    if common_o:
        print(f"\ncommon-set total: {common_o:.2f} -> {common_n:.2f} "
              f"({common_n / common_o:.2f}x)")
    print(f"regressions >{flag}x: {regressions or 'none'}")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
