#!/usr/bin/env python3
"""Fold one or more full graft.Bench passes into a bench artifact
(dev tooling only — not part of the shipped library).

The artifact of record (BENCH_r*.json) is the per-query MIN over many
full passes: single runs on a shared box swing ±25-45% from host noise,
and the min is the reproducible steady-state time (each pass is itself
per-query best-of-2 inside graft.Bench). `value` is the sum of mins,
`passes` counts folded passes.

Usage: python3 tools/fold_bench.py <artifact.json> <pass.json> [...]
(each pass file is a copy of target/bench.json after a run; the
artifact is updated in place and a summary of improved mins printed)
"""
import json, sys

def main(artifact: str, passes: list) -> None:
    art = json.load(open(artifact))
    q = dict(art["queries"])
    samples = dict(art.get("samples", {}))
    phases = dict(art.get("phases", {}))
    for p in passes:
        d = json.load(open(p))
        for k, v in d["queries"].items():
            q[k] = min(q[k], v) if k in q else v
        # accumulate EVERY in-sweep sample (not just the pass min): a
        # persistent slowdown must be visible as N agreeing samples,
        # not masked by min-folding (the g11 demand)
        dph = d.get("phases", {})
        for k, vs in d.get("samples", {}).items():
            old = samples.get(k, [])
            # phases[k][i] must describe samples[k][i]: when either side
            # (a pre-phases artifact, or a pass without phases for k)
            # lacks a list, pad with empty dicts to the sample count so
            # concatenation can't misalign the index correspondence
            if k in phases or k in dph:
                prior = phases.get(k, [])
                cur = dph.get(k, [])
                phases[k] = (prior + [{}] * (len(old) - len(prior)) +
                             cur + [{}] * (len(vs) - len(cur)))
            samples[k] = old + vs
        for k, ph in dph.items():  # phases with no samples list: rare,
            if k not in samples:   # but don't drop them
                phases[k] = phases.get(k, []) + ph
    improved = {k: (art["queries"][k], q[k]) for k in art["queries"]
                if q[k] < art["queries"][k] - 5e-4}
    new = {k: (None, q[k]) for k in q if k not in art["queries"]}
    art["queries"] = {k: round(v, 3) for k, v in sorted(q.items())}
    art["value"] = round(sum(q.values()), 3)
    art["nqueries"] = len(q)
    art["passes"] = art.get("passes", 1) + len(passes)
    # publish the full sample lists for the 25 most expensive queries,
    # plus phase breakdowns for the loop queries that record them
    top25 = sorted(q, key=lambda k: -q[k])[:25]
    art["samples"] = {k: samples[k] for k in sorted(top25) if k in samples}
    keep = set(top25) | {"g11_pagerank", "g12_concomp", "g13_label_prop"}
    art["phases"] = {k: phases[k] for k in sorted(keep) if k in phases}
    json.dump(art, open(artifact, "w"), separators=(",", ":"))
    print(f"total {art['value']}s over {art['nqueries']} queries, "
          f"{art['passes']} passes")
    for k, (a, b) in sorted({**improved, **new}.items()):
        print(f"  {k}: {'new' if a is None else f'{a:.3f}'} -> {b:.3f}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
