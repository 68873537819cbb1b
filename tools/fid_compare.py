"""Compare two fid_curve sweeps of the same run (e.g. gen vs ema families).

The EMA A/B (VERDICT r3 item 5): `tpu.ema_decay` exists so the ema_* snapshot
family can be scored against the live-weight gen_* family on the same run
with the same protocol (tools/fid_curve.py --prefix gen|ema). This tool turns
that comparison into one reproducible command: it refuses curves measured
under different protocols (n/styles/bootstrap — FID is strongly n-biased),
prints the per-iteration side-by-side table with the per-style spread, and
summarizes which family wins.

    python tools/fid_compare.py \
        --a <run_dir>/fid_curve_gen.json --b <run_dir>/fid_curve_ema.json

No reference analog (the reference has neither EMA nor FID tooling); this is
quality-workflow infrastructure for the build's own snapshot-selection story.
"""

from __future__ import annotations

import argparse
import json
import sys


def compare(doc_a: dict, doc_b: dict, name_a: str = "A", name_b: str = "B"):
    """Validate protocol compatibility and build the comparison summary.

    Returns a dict: rows (common iterations, both FIDs + delta), per-family
    best, win counts, and mean-FID-over-common-iterations. Raises ValueError
    on protocol mismatch.
    """
    for key in ("n", "styles", "bootstrap", "protocol"):
        if doc_a.get(key) != doc_b.get(key):
            raise ValueError(
                f"protocol mismatch on '{key}': "
                f"{doc_a.get(key)!r} vs {doc_b.get(key)!r} — curves are not "
                f"comparable (FID is n-biased; spreads/CIs method-bound)")
    rows_a = {r["iteration"]: r for r in doc_a["rows"]}
    rows_b = {r["iteration"]: r for r in doc_b["rows"]}
    common = sorted(set(rows_a) & set(rows_b))
    if not common:
        raise ValueError("no common iterations between the two curves")
    rows = []
    wins = {name_a: 0, name_b: 0}
    for it in common:
        fa, fb = rows_a[it]["fid"], rows_b[it]["fid"]
        rows.append({"iteration": it, name_a: fa, name_b: fb,
                     "delta": round(fb - fa, 3),
                     f"{name_a}_spread": rows_a[it].get("fid_spread"),
                     f"{name_b}_spread": rows_b[it].get("fid_spread")})
        wins[name_b if fb < fa else name_a] += 1
    mean_a = sum(rows_a[i]["fid"] for i in common) / len(common)
    mean_b = sum(rows_b[i]["fid"] for i in common) / len(common)
    return {
        "rows": rows,
        "wins": wins,
        "mean_fid": {name_a: round(mean_a, 3), name_b: round(mean_b, 3)},
        "best": {name_a: min(doc_a["rows"], key=lambda r: r["fid"]),
                 name_b: min(doc_b["rows"], key=lambda r: r["fid"])},
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--a", required=True, help="first fid_curve json")
    p.add_argument("--b", required=True, help="second fid_curve json")
    args = p.parse_args(argv)

    with open(args.a) as f:
        doc_a = json.load(f)
    with open(args.b) as f:
        doc_b = json.load(f)
    name_a = doc_a.get("prefix") or "A"
    name_b = doc_b.get("prefix") or "B"
    if name_a == name_b:
        name_a, name_b = name_a + "(a)", name_b + "(b)"
    try:
        cmp = compare(doc_a, doc_b, name_a, name_b)
    except ValueError as e:
        sys.exit(f"refused: {e}")

    print(f"| iteration | {name_a} FID (spread) | {name_b} FID (spread) "
          f"| {name_b}-{name_a} |")
    print("|---|---|---|---|")
    for r in cmp["rows"]:
        sa = r.get(f"{name_a}_spread")
        sb = r.get(f"{name_b}_spread")
        print(f"| {r['iteration']} | {r[name_a]}"
              f"{f' ({sa})' if sa is not None else ''} | {r[name_b]}"
              f"{f' ({sb})' if sb is not None else ''} | {r['delta']:+} |")
    n = len(cmp["rows"])
    print(f"\nwins: {name_a} {cmp['wins'][name_a]}/{n}, "
          f"{name_b} {cmp['wins'][name_b]}/{n}")
    print(f"mean FID over common iterations: "
          f"{name_a} {cmp['mean_fid'][name_a]}, "
          f"{name_b} {cmp['mean_fid'][name_b]}")
    ba, bb = cmp["best"][name_a], cmp["best"][name_b]
    print(f"best {name_a}: iter {ba['iteration']} FID {ba['fid']}; "
          f"best {name_b}: iter {bb['iteration']} FID {bb['fid']}")


if __name__ == "__main__":
    main()
