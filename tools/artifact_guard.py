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


def strip_scala_noise(src):
    """Remove comments and string literals from Scala source so the
    registry count below only ever sees CODE. A comment or log string
    mentioning the factory name must not inflate the count, and a
    commented-out registration must not keep counting (both would
    silently skew the close-freshness reference)."""
    out = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        nxt = src[i + 1] if i + 1 < n else ""
        if c == "/" and nxt == "/":               # line comment
            j = src.find("\n", i)
            i = n if j < 0 else j
        elif c == "/" and nxt == "*":             # block comment (nested)
            depth, i = 1, i + 2
            while i < n and depth:
                if src.startswith("/*", i):
                    depth, i = depth + 1, i + 2
                elif src.startswith("*/", i):
                    depth, i = depth - 1, i + 2
                else:
                    i += 1
        elif src.startswith('"""', i):            # triple-quoted string
            j = src.find('"""', i + 3)
            i = n if j < 0 else j + 3
            out.append('""')
        elif c == '"':                            # plain string
            i += 1
            while i < n and src[i] != '"':
                i += 2 if src[i] == "\\" else 1
            i += 1
            out.append('""')
        elif c == "'" and i + 2 < n and src[i + 1] == "\\":  # char escape
            j = src.find("'", i + 1)
            i = i + 3 if j < 0 else j + 1
        elif c == "'" and i + 2 < n and src[i + 2] == "'":   # plain char, e.g. '"'
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def registry_size(root):
    """Count registered queries straight from the Scala sources: every
    registry entry constructs its QueryDef through exactly one
    `QueryDef.withOracle` / `QueryDef.rowsOnly` factory call in an
    operator module (Registry.scala holds only the definitions). The
    pattern is anchored to CALL SITES (factory name followed by its
    argument list) over comment/string-stripped source. This is the
    close-freshness reference: a committed mirror or bench artifact
    with fewer entries than the source registry means the close ran
    BEFORE the registry froze (the round-9 failure: 9 operators landed
    after the close sweep and shipped unverified)."""
    pat = re.compile(r'QueryDef\.(withOracle|rowsOnly)\s*[({]')
    n = 0
    for path in glob.glob(os.path.join(root, "src/main/scala/**/*.scala"),
                          recursive=True):
        if os.path.basename(path) == "Registry.scala":
            continue
        code = strip_scala_noise(open(path, encoding="utf-8").read())
        n += len(pat.findall(code))
    return n


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    expect = None
    for a in sys.argv[1:]:
        if a.startswith("--expect="):
            expect = int(a.split("=", 1)[1])
    n_registry = registry_size(root)
    print(f"source registry: {n_registry} queries")

    stale = []

    # sf1d/sf10d union drift checks: SURVEY §7's FIRST (= current
    # round's) "N distinct queries sf1d-verified" / "N distinct queries
    # sf10d-run" figures must equal the computed unions of the committed
    # artifacts; superseded round sections keep their historical
    # numbers. (Both figures have drifted from hand-arithmetic once —
    # r13 sf1d 144 vs 143, r14 sf10d 143 vs 136.)
    survey_path = os.path.join(root, "SURVEY.md")
    survey_txt = (open(survey_path, encoding="utf-8").read()
                  if os.path.exists(survey_path) else "")
    for decade, claim_pat in (
            ("sf1d", r"(\d+)\s+distinct\s+queries\s+sf1d-verified"),
            ("sf10d", r"(\d+)\s+distinct\s+queries\s+sf10d-run")):
        qs = set()
        for p in glob.glob(os.path.join(root, "docs",
                                        f"CORRECTNESS_{decade}_*.json")):
            try:
                d = json.load(open(p))
            except Exception:
                continue
            qs |= {k for k, v in d.get("queries", {}).items()
                   if isinstance(v, dict) and v.get("status") == "pass"}
        if not qs:
            continue
        print(f"{decade} union".ljust(15) +
              f": {len(qs)} distinct passing queries across "
              f"docs/CORRECTNESS_{decade}_*.json")
        claims = re.findall(claim_pat, survey_txt)
        if claims and int(claims[0]) != len(qs):
            stale.append(f"SURVEY claims {claims[0]} distinct {decade} "
                         f"queries but the artifact union is {len(qs)} — "
                         f"recompute, don't hand-add")
    mirror_path, mirror_n = latest(os.path.join(root, "CORRECTNESS_local_r*.json"))
    if mirror_path:
        mirror = json.load(open(mirror_path))
        n_mirror = len(mirror.get("queries", {}))
        n_mfail = mirror.get("n_fail", -1)
        print(f"local mirror  : {os.path.basename(mirror_path)} "
              f"({n_mirror} entries, {n_mfail} fail)")
        if expect is None:
            expect = n_mirror
        if n_registry and n_mirror < n_registry:
            stale.append(f"mirror {os.path.basename(mirror_path)} has "
                         f"{n_mirror} entries < registry {n_registry}")
    else:
        print("local mirror  : none committed yet")

    bench_path, _ = latest(os.path.join(root, "docs", "bench_r*_full.json"))
    if bench_path:
        try:
            n_bench = len(json.load(open(bench_path)).get("queries", {}))
            print(f"bench snapshot : {os.path.basename(bench_path)} "
                  f"({n_bench} queries)")
            if n_registry and n_bench < n_registry:
                stale.append(f"bench {os.path.basename(bench_path)} has "
                             f"{n_bench} queries < registry {n_registry}")
        except Exception as e:
            stale.append(f"bench {os.path.basename(bench_path)} unparseable: {e}")

    if stale:
        print("\n*** GUARD FAIL (close-freshness): the registry grew after "
              "the round-close sweep — re-run tools/round_close.sh as the "
              "LAST act of the round. ***")
        for s in stale:
            print(f"  - {s}")
        return 1

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
        # A graded artifact from an EARLIER round than the local mirror
        # legitimately has fewer entries (the registry grew this round;
        # the driver re-grades at round end). Only a same-round deficit
        # is a truncated gate run.
        def round_of(p):
            m = re.search(r"_r(\d+)", os.path.basename(p) if p else "")
            return int(m.group(1)) if m else -1
        # The bypass must not also forgive a TRUNCATED earlier-round
        # gate run: the earlier artifact still has to be complete FOR
        # ITS OWN ROUND, i.e. match that round's committed local mirror
        # (each round's close commits CORRECTNESS_local_r{N}.json).
        def earlier_round_complete(gp, gn):
            rn = round_of(gp)
            for pat in (f"CORRECTNESS_local_r{rn:02d}.json",
                        f"CORRECTNESS_local_r{rn}.json"):
                mp = os.path.join(root, pat)
                if os.path.exists(mp):
                    try:
                        m = json.load(open(mp))
                        # local mirrors nest entries under "queries";
                        # graded artifacts are flat query dicts
                        return gn == len(m.get("queries", m))
                    except Exception:
                        return False
            return False  # no same-round mirror to attest completeness
        if (mirror_path and round_of(graded_path) < round_of(mirror_path)
                and earlier_round_complete(graded_path, n_graded)):
            print(f"\nguard note: graded artifact is round "
                  f"{round_of(graded_path)} ({n_graded} entries, complete "
                  f"for its own round); registry grew to {expect} this "
                  f"round — driver re-grades at round end (expected "
                  f"mid-round state)")
        else:
            print(f"\n*** GUARD FAIL: graded artifact has {n_graded} entries "
                  f"but the registry has {expect} queries — "
                  f"partial/truncated gate run. ***")
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
