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
        # matches both CORRECTNESS_r14.json and bench_r14_full.json —
        # the old `_r(\d+)\.json$` anchor silently never matched the
        # bench snapshots, making the bench-size check dead code
        m = re.search(r"_r(\d+)(?:_full)?\.json$", p)
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
    # Claims are matched inside the CURRENT round's §7 section — the one
    # with the highest round tag — not by first-match document order
    # (advisor r14: a reordered/appended historical section would make a
    # first-match guard validate a stale number). Fall back to the whole
    # document only when no §7 header parses.
    cur_txt = survey_txt
    headers = [(int(m.group(1)), m.start()) for m in re.finditer(
        r"^##\s*§7 Build status\s*[—-]+\s*round\s+(\d+)\s*$",
        survey_txt, re.MULTILINE)]
    if headers:
        rn, start = max(headers)
        nxt = re.search(r"^##\s", survey_txt[start + 1:], re.MULTILINE)
        end = start + 1 + nxt.start() if nxt else len(survey_txt)
        cur_txt = survey_txt[start:end]
        print(f"SURVEY §7 current-round section: round {rn} "
              f"({end - start} chars)")
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
        claims = re.findall(claim_pat, cur_txt)
        if claims and int(claims[0]) != len(qs):
            stale.append(f"SURVEY claims {claims[0]} distinct {decade} "
                         f"queries but the artifact union is {len(qs)} — "
                         f"recompute, don't hand-add")

    # Unsubstituted template placeholders (judge r15: the literal
    # '__SF10D_UNION__' shipped in the committed §7 text because
    # round_close's substitution never ran; the digit-requiring claim
    # regex above then silently matched nothing and skipped the check).
    # Any __UPPER_SNAKE__ token anywhere in SURVEY.md is a failed
    # template substitution, full stop.
    for m in re.finditer(r"__[A-Z][A-Z0-9_]*__", survey_txt):
        stale.append(f"SURVEY.md contains unsubstituted template "
                     f"placeholder '{m.group(0)}' — re-run the close "
                     f"substitution")

    # §7 quoted-figure lock (judge r14: the prose said "405 pass" while
    # the committed artifact and the union both said 412): every
    # "docs/<artifact>.json — **N pass, M fail**" quote in the CURRENT
    # round's §7 section must match that artifact's own n_pass/n_fail.
    for m in re.finditer(
            r"docs/(CORRECTNESS_[\w.]+\.json)[^*]*\*\*(\d+)\s+pass,\s*"
            r"(\d+)\s+fail\*\*", cur_txt):
        art, cp, cf = m.group(1), int(m.group(2)), int(m.group(3))
        ap = os.path.join(root, "docs", art)
        if not os.path.exists(ap):
            stale.append(f"SURVEY §7 quotes {art} but it is not committed")
            continue
        try:
            d = json.load(open(ap))
        except Exception as e:
            stale.append(f"SURVEY §7-quoted {art} unparseable: {e}")
            continue
        n_pass = d.get("n_pass")
        n_fail = d.get("n_fail")
        if n_pass is None:
            qd = d.get("queries", d)
            n_pass = sum(1 for v in qd.values()
                         if isinstance(v, dict) and v.get("status") == "pass")
            n_fail = sum(1 for v in qd.values()
                         if isinstance(v, dict) and v.get("status") == "fail")
        if (cp, cf) != (n_pass, n_fail):
            stale.append(f"SURVEY §7 quotes {art} as '{cp} pass, {cf} fail' "
                         f"but the artifact says {n_pass} pass, {n_fail} "
                         f"fail — fix the prose (mid-round figure drift)")
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

    bench_path, bench_n = latest(os.path.join(root, "docs", "bench_r*_full.json"))
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

    # Task-time regression gate (judge r14 #6). Re-calibrated r16: the
    # original trigger (task > 2x alone, prev > 50 ms) fires on pure
    # tenancy noise — across THREE same-code full bench runs on one
    # r16 sandbox, 33/412 queries exceeded 2x max/min task (even
    # >=1s-task queries hit 2.3x: graph_bipartite_projection read
    # 27/41/57 s on identical code; sub-100ms queries swing 2-8x), so
    # the old gate could fail a close whose code had not changed at
    # all. A REAL plan regression slows wall and task TOGETHER in the
    # same run; a machine hot-window inflates task duration far more
    # than min-of-2 wall. Rounds also compare across MACHINES (the r15
    # baseline ran on different hardware), so sub-quarter-second task
    # numbers shift 1.5-2x with zero code change. The gate therefore
    # flags only queries where task > 2x AND same-run wall > 1.5x AND
    # prev task > 250 ms — on the three same-code r16 runs this reads
    # 1/3/9 false trips at 100 ms vs 0/1/4 at 250 ms (quiet/medium/
    # loaded), with every surviving trip adjudicable by profile.
    # GUARD_TASK_WARN_ONLY=1 downgrades to a warning for mid-round runs
    # where a known rewrite legitimately trades task-time for wall.
    prev_bench = None
    for p in glob.glob(os.path.join(root, "docs", "bench_r*_full.json")):
        m = re.search(r"_r(\d+)_full\.json$", p)
        if m and int(m.group(1)) < bench_n:
            if prev_bench is None or int(m.group(1)) > prev_bench[1]:
                prev_bench = (p, int(m.group(1)))
    if bench_path and prev_bench:
        try:
            cur_b = json.load(open(bench_path))
            prev_b = json.load(open(prev_bench[0]))
            cur_t = cur_b.get("queries_task", {})
            prev_t = prev_b.get("queries_task", {})
            cur_w = cur_b.get("queries", {})
            prev_w = prev_b.get("queries", {})
        except Exception:
            cur_t, prev_t, cur_w, prev_w = {}, {}, {}, {}
        if cur_t and prev_t:
            # r17 (advisor): the wall-AND-task rule is fail-open when a
            # snapshot lacks the wall map — fail LOUDLY instead of
            # silently printing zero regressions.
            if not (cur_w and prev_w):
                stale.append(
                    f"task-time gate: 'queries' wall map missing from "
                    f"{'current' if not cur_w else 'previous'} bench "
                    f"snapshot — the wall-AND-task rule cannot evaluate; "
                    f"regenerate the snapshot with a full bench run")
            regress = sorted(
                (q, prev_t[q], cur_t[q]) for q in cur_t
                if q in prev_t and prev_t[q] > 0.25
                and (
                    # combined rule: a real plan regression moves task
                    # and same-run wall together
                    (cur_t[q] > 2.0 * prev_t[q]
                     and prev_w.get(q, 0) > 0
                     and cur_w.get(q, 0) > 1.5 * prev_w.get(q, float("inf")))
                    # r17 unconditional backstop (advisor): a >4x task
                    # jump fails regardless of wall — extra CPU absorbed
                    # by idle cores at bench SF is still a 4x cost at
                    # scale. Calibration: across the three same-code r16
                    # runs the worst same-code task swing on a >250 ms
                    # query was 2.3x.
                    or cur_t[q] > 4.0 * prev_t[q]))
            print(f"task-time gate : {os.path.basename(bench_path)} vs "
                  f"{os.path.basename(prev_bench[0])} — "
                  f"{len(regress)} regressions ((task>2x AND wall>1.5x) "
                  f"OR task>4x, prev task>250ms)")
            if regress:
                msg = "; ".join(f"{q} {a:.2f}s->{b:.2f}s"
                                for q, a, b in regress[:8])
                if os.environ.get("GUARD_TASK_WARN_ONLY") == "1":
                    print(f"  WARN (GUARD_TASK_WARN_ONLY=1): {msg}")
                else:
                    stale.append(f"task-time regressions vs r{prev_bench[1]}: "
                                 f"{msg}")
            # r17 family-sum gate (judge r16 #7): family task sums are
            # far stabler than per-query numbers (law of large numbers
            # over tenancy noise), so a >2x family-sum jump that the
            # per-query AND-rule can't see (a reintroduced scheduling-
            # overhead regression spread thinly) fails here. Family =
            # prefix up to the first underscore-delimited token.
            fams = {}
            for q in cur_t:
                if q in prev_t:
                    f = q.split("_", 1)[0]
                    a, b = fams.get(f, (0.0, 0.0))
                    fams[f] = (a + prev_t[q], b + cur_t[q])
            fam_regress = sorted(
                (f, a, b) for f, (a, b) in fams.items()
                if a > 1.0 and b > 2.0 * a)
            print(f"family-sum gate: {len(fam_regress)} family task-sum "
                  f"regressions (sum>2x, prev sum>1s) across "
                  f"{len(fams)} families")
            if fam_regress:
                msg = "; ".join(f"{f} {a:.1f}s->{b:.1f}s"
                                for f, a, b in fam_regress)
                if os.environ.get("GUARD_TASK_WARN_ONLY") == "1":
                    print(f"  WARN (GUARD_TASK_WARN_ONLY=1): {msg}")
                else:
                    stale.append(f"family task-sum regressions vs "
                                 f"r{prev_bench[1]}: {msg}")
        else:
            stale.append(
                "task-time gate: 'queries_task' missing from one of the "
                "two bench snapshots — the gate cannot evaluate; "
                "regenerate with a full bench run")

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
