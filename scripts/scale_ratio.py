"""Compare two bench.py JSON outputs (e.g. sf0.1 vs sf1) and emit the
scaling-ratio table for SCALE.md (round-5 scale probe)."""

from __future__ import annotations

import json
import sys


def main(small_path: str, big_path: str, mult: float = 10.0) -> None:
    small = json.loads(open(small_path).read().strip().splitlines()[-1])
    big = json.loads(open(big_path).read().strip().splitlines()[-1])

    def table(kind):
        rows = []
        for k, t_small in small.get(kind, {}).items():
            t_big = big.get(kind, {}).get(k)
            if t_big is None:
                continue
            rows.append((k, t_small, t_big, t_big / t_small if t_small else float("inf")))
        return rows

    out = {"mult": mult, "queries": {}, "extras": {}}
    print(f"| query | sf{small['sf']:g} s | sf{big['sf']:g} s | ratio | verdict |")
    print("|---|---|---|---|---|")
    for kind in ("queries", "extras"):
        for k, a, b, r in table(kind):
            if r <= 2.0:
                verdict = "flat (overhead-bound)"
            elif r < mult * 0.8:
                verdict = "sub-linear"
            elif r <= mult * 1.2:
                verdict = "near-linear"
            else:
                verdict = "SUPER-LINEAR"
            print(f"| {k} | {a:.3f} | {b:.3f} | {r:.1f}x | {verdict} |")
            out[kind][k] = {"small": a, "big": b, "ratio": round(r, 2)}
    ht = big["value"] / small["value"]
    print(f"| **headline total** | {small['value']:.3f} | {big['value']:.3f} | {ht:.1f}x | |")
    out["headline_total"] = {"small": small["value"], "big": big["value"], "ratio": round(ht, 2)}
    with open("SCALE_PROBE_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote SCALE_PROBE_r05.json", file=sys.stderr)


if __name__ == "__main__":
    main(*sys.argv[1:3], *(float(a) for a in sys.argv[3:4]))
