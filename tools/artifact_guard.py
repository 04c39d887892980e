#!/usr/bin/env python3
"""Round-close guard for the graded correctness artifact.

Round-8 lesson: CORRECTNESS_r08.json shipped as a literal `{}` and
nothing in the repo noticed — the round's graded correctness signal
silently vanished until the judge re-ran the sweep by hand. This guard
makes "no signal" loud:

  * finds the highest-numbered CORRECTNESS_r*.json in the repo root,
  * compares its entry count against the registry size (taken from the
    committed local mirror CORRECTNESS_local_r*.json, falling back to
    a --expect argument),
  * exits non-zero with a LOUD message when the graded artifact is
    empty or smaller than the registry.

Run it at round close (tools/round_close.sh does) and any time a new
graded artifact lands. A failure here does NOT mean queries are wrong —
it means the round's graded signal is missing and the local mirror is
the round's correctness record.
"""
import glob
import json
import os
import re
import sys


def latest(pattern):
    best, best_n = None, -1
    for p in glob.glob(pattern):
        m = re.search(r"_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    return best, best_n


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    expect = None
    for a in sys.argv[1:]:
        if a.startswith("--expect="):
            expect = int(a.split("=", 1)[1])

    mirror_path, mirror_n = latest(os.path.join(root, "CORRECTNESS_local_r*.json"))
    if mirror_path:
        mirror = json.load(open(mirror_path))
        n_mirror = len(mirror.get("queries", {}))
        n_mfail = mirror.get("n_fail", -1)
        print(f"local mirror  : {os.path.basename(mirror_path)} "
              f"({n_mirror} entries, {n_mfail} fail)")
        if expect is None:
            expect = n_mirror
    else:
        print("local mirror  : none committed yet")

    graded_path, graded_n = latest(os.path.join(root, "CORRECTNESS_r*.json"))
    if not graded_path:
        print("graded artifact: NONE FOUND — run the driver gate")
        return 1
    try:
        graded = json.load(open(graded_path))
    except Exception as e:
        print(f"graded artifact: {os.path.basename(graded_path)} UNPARSEABLE: {e}")
        return 1
    n_graded = len(graded) if isinstance(graded, dict) else 0
    print(f"graded artifact: {os.path.basename(graded_path)} ({n_graded} entries)")

    if n_graded == 0:
        print(f"\n*** GUARD FAIL: {os.path.basename(graded_path)} is EMPTY. "
              f"The round's graded correctness signal is missing (round-8 "
              f"failure mode). The committed local mirror is the round's "
              f"correctness record; re-run the driver gate if possible. ***")
        return 1
    if expect is not None and n_graded < expect:
        print(f"\n*** GUARD FAIL: graded artifact has {n_graded} entries but "
              f"the registry has {expect} queries — partial/truncated gate "
              f"run. ***")
        return 1
    bad = [k for k, v in graded.items()
           if isinstance(v, dict) and not (v.get("rows_match")
                                           and v.get("schema_match")
                                           and v.get("hash_match", True))]
    if bad:
        print(f"\nguard note: {len(bad)} graded entries not fully green: "
              f"{sorted(bad)[:10]}")
    print("\nguard OK: graded artifact present and registry-sized")
    return 0


if __name__ == "__main__":
    sys.exit(main())
