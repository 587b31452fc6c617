#!/usr/bin/env python3
"""Round-over-round regression adjudication (dev tooling only).

Compares a fresh multi-pass fold against a prior round's fold and the
prior driver pass, flagging queries whose NEW min (over N samples)
exceeds the old min by a threshold — the anti-noise discipline the
single-pass r15 artifact couldn't provide.

Usage: python3 tools/adjudicate.py <new_fold.json> <old_fold.json> [thresh=1.25]
"""
import json, sys

def main(new_path, old_path, thresh=1.25):
    new = json.load(open(new_path))
    old = json.load(open(old_path))
    nq, oq = new["queries"], old["queries"]
    regress, improve = [], []
    for k in sorted(set(nq) & set(oq)):
        # eps floors both sides: a 0.0 min (sub-ms query rounded down)
        # must neither divide-by-zero nor read as an infinite ratio
        eps = 1e-3
        r = max(nq[k], eps) / max(oq[k], eps)
        if nq[k] > 0.5 and r > thresh:
            regress.append((k, oq[k], nq[k], r, new.get("samples", {}).get(k)))
        elif oq[k] > 0.5 and 1 / r > thresh:
            improve.append((k, oq[k], nq[k], r))
    print(f"new total {new['value']}s ({new.get('passes')} passes) vs "
          f"old {old['value']}s ({old.get('passes')} passes)")
    print(f"\n{len(regress)} regressors >{thresh}x (new_min/old_min):")
    for k, o, n, r, ss in regress:
        print(f"  {k}: {o:.2f} -> {n:.2f} ({r:.2f}x) samples={ss}")
    print(f"\n{len(improve)} improvements >{thresh}x:")
    for k, o, n, r in improve:
        print(f"  {k}: {o:.2f} -> {n:.2f} ({r:.2f}x)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 1.25)
