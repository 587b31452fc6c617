#!/usr/bin/env python3
"""Fit per-query scaling exponents from three graft.Bench passes
(dev tooling only — not part of the shipped library).

Usage: python3 tools/fit_scaling.py sf0.01.json sf0.1.json sf1.0.json

Each input is a copy of target/bench.json from a Bench run over the
scaling query set at that scale factor. Prints a markdown table with:
  - the measured min per scale
  - alpha_10x  = log10(t_sf1.0 / t_sf0.1)   (the headline exponent:
    the 0.01 point sits on the per-query fixed-overhead floor, so the
    top decade is the honest slope)
  - alpha_fit  = least-squares slope of log t vs log sf over all 3
    points (reported for transparency; biased DOWN by the floor)
"""
import json, math, sys

def main(paths):
    sfs = [0.01, 0.1, 1.0]
    runs = [json.load(open(p))["queries"] for p in paths]
    names = sorted(set(runs[0]) & set(runs[1]) & set(runs[2]))
    print("| query | sf0.01 s | sf0.1 s | sf1.0 s | alpha_10x | alpha_fit |")
    print("|---|---|---|---|---|---|")
    for n in names:
        ts = [r[n] for r in runs]
        a10 = math.log10(ts[2] / ts[1])
        xs = [math.log10(s) for s in sfs]
        ys = [math.log10(t) for t in ts]
        mx, my = sum(xs) / 3, sum(ys) / 3
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / \
            sum((x - mx) ** 2 for x in xs)
        print(f"| {n} | {ts[0]:.2f} | {ts[1]:.2f} | {ts[2]:.2f} "
              f"| {a10:.2f} | {slope:.2f} |")

if __name__ == "__main__":
    main(sys.argv[1:4])
