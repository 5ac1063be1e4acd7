#!/usr/bin/env python3
"""Same-box bench A/B: compare two graft.Bench JSON artifacts per query.

Usage: tools/bench_ab.py <baseline.json> <candidate.json> [changed_keys_csv]

Prints the shared-set min-sum ratio EXCLUDING intentionally-changed
queries (pass them as the third arg), plus the biggest per-query
regressions/improvements by min and by cpu. The min-of-reps is the
load-insensitive wall signal; cpu is the load-insensitive compute
signal (see Bench.scala).
"""
import sys, json


def load(p):
    d = json.load(open(p))
    return d["stats"]


def main(base_p, cand_p, changed_csv=""):
    base, cand = load(base_p), load(cand_p)
    changed = set(x for x in changed_csv.split(",") if x)
    shared = sorted((set(base) & set(cand)) - changed)
    bs = sum(base[q]["min"] for q in shared)
    cs = sum(cand[q]["min"] for q in shared)
    bc = sum(base[q]["cpu"] for q in shared)
    cc = sum(cand[q]["cpu"] for q in shared)
    print(f"shared {len(shared)} queries (excluded {len(changed)} changed)")
    print(f"min-sum:  base {bs:7.1f}s  cand {cs:7.1f}s  ratio {cs / bs:.3f}")
    print(f"cpu-sum:  base {bc:7.1f}s  cand {cc:7.1f}s  ratio {cc / bc:.3f}")
    rows = []
    for q in shared:
        b, c = base[q], cand[q]
        if b["min"] > 0.3 or c["min"] > 0.3:
            rows.append((c["min"] - b["min"], q, b, c))
    rows.sort(reverse=True)
    print("\nbiggest regressions (candidate min - baseline min, >0.3s queries):")
    for dlt, q, b, c in rows[:8]:
        print(f"  {q:28s} {b['min']:6.2f} -> {c['min']:6.2f}  "
              f"(cpu {b['cpu']:6.2f} -> {c['cpu']:6.2f})")
    print("biggest improvements:")
    for dlt, q, b, c in rows[-8:]:
        print(f"  {q:28s} {b['min']:6.2f} -> {c['min']:6.2f}  "
              f"(cpu {b['cpu']:6.2f} -> {c['cpu']:6.2f})")
    if changed:
        print("\nchanged queries (excluded from the ratio):")
        for q in sorted(changed):
            if q in base and q in cand:
                print(f"  {q:28s} {base[q]['min']:6.2f} -> {cand[q]['min']:6.2f}")
            elif q in cand:
                print(f"  {q:28s}    new -> {cand[q]['min']:6.2f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "")
