"""Compare two bench JSON files with noise-aware verdicts.

This VM's wall-clock is ±2× noisy under load (ROUND_NOTES perf
lessons; round 2's two "regressions" were phantom), so a per-query
delta is only flagged when it exceeds the noise band, and the verdict
tells you to RE-MEASURE STANDALONE before changing code.

    python tools/bench_compare.py BENCH_r02.json BENCH_r03.json [--band 2.0]
"""

from __future__ import annotations

import json
import sys


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    band = 2.0
    for a in sys.argv[1:]:
        if a.startswith("--band"):
            band = float(a.split("=", 1)[1]) if "=" in a else band
    def load(p):
        d = json.load(open(p))
        return d.get("parsed", d)  # driver BENCH_r*.json wraps under "parsed"

    old, new = (load(p) for p in args[:2])
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    print(f"{'query':<32} {'old':>7} {'new':>7} {'ratio':>6}  verdict")
    flagged = []
    for k in common:
        r = nq[k] / oq[k] if oq[k] > 0 else float("inf")
        if r > band:
            verdict = "SLOWER-THAN-NOISE — re-measure standalone before acting"
            flagged.append(k)
        elif r < 1 / band:
            verdict = "faster (or noise)"
        else:
            verdict = "within noise"
        print(f"{k:<32} {oq[k]:>7.2f} {nq[k]:>7.2f} {r:>6.2f}  {verdict}")
    for k in sorted(set(nq) - set(oq)):
        print(f"{k:<32} {'—':>7} {nq[k]:>7.2f} {'—':>6}  new")
    for k in sorted(set(oq) - set(nq)):
        print(f"{k:<32} {oq[k]:>7.2f} {'—':>7} {'—':>6}  removed")
    to, tn = sum(oq[k] for k in common), sum(nq[k] for k in common)
    print(f"\ncommon-set total: {to:.2f}s -> {tn:.2f}s ({tn / to:.2f}x)")
    if flagged:
        print(f"flagged (>{band}x): {', '.join(flagged)}")
    sys.exit(0)


if __name__ == "__main__":
    main()
