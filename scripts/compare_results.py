"""Bit-identity audit between two results*.json artifacts.

Used for the round-5 transfer-pipeline changes (double-buffered uploads,
on-device chunk duplication, pipelined g sweep): the claim is that the
statistics are BIT-identical to the committed artifact — only wall time
and relay telemetry may differ.  Exits nonzero and prints the first
mismatch otherwise.

Usage: python scripts/compare_results.py results/results.json /tmp/new/results.json
"""

import json
import sys


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    a = json.load(open(a_path))
    b = json.load(open(b_path))

    bad = 0
    if a["g_emp"] != b["g_emp"]:
        for k in a["g_emp"]:
            if a["g_emp"][k] != b["g_emp"].get(k):
                print(f"g_emp[{k}]: {a['g_emp'][k]!r} != "
                      f"{b['g_emp'].get(k)!r}")
                bad += 1
    for case in a["stats"]:
        for alg in a["stats"][case]:
            for field in ("mean", "ci"):
                va = a["stats"][case][alg][field]
                vb = b["stats"].get(case, {}).get(alg, {}).get(field)
                if va != vb:
                    print(f"stats[{case}][{alg}][{field}]:")
                    for i, (x, y) in enumerate(zip(va, vb or [])):
                        if x != y:
                            print(f"  [{i}] {x!r} != {y!r}")
                    bad += 1
    if bad:
        print(f"MISMATCH: {bad} fields differ")
        sys.exit(1)
    print(f"BIT-IDENTICAL: g_emp + all case stats match "
          f"({a_path} vs {b_path}); walls {a.get('wall_s'):.1f}s vs "
          f"{b.get('wall_s'):.1f}s")


if __name__ == "__main__":
    main()
