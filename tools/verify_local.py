#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: verify_local.py <sfDir> <outDir>
  where <outDir> is what `sbt "runMain graft.Verify <sfDir> <outDir>"`
  produced (one parquet dir per query + oracle_sql.json).

For each query: run the oracle SQL in DuckDB with views over the same
parquet tables, load both results, sort columns by name, sort rows,
normalize values, and compare cell-by-cell.
"""
import sys, os, json, glob, time
import duckdb
import pandas as pd
import numpy as np
import pyarrow.parquet as pq
import pyarrow as pa
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        # Deliberately NOT converted to float: the driver's hash sees the
        # raw Decimal repr, which never equals DuckDB's float64 output.
        # Any Decimal reaching the output layer is a protocol violation
        # (round-1 lesson: 16 queries failed the driver hash this way).
        return "DECIMAL!" + str(v)
    if isinstance(v, float):
        if np.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, (np.floating,)):
        return repr(round(float(v), 9))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    cells = df.map(norm_cell)
    rows = sorted(["\x1f".join(r) for r in cells.itertuples(index=False)])
    return list(df.columns), rows


STREAM_BYTES = int(os.environ.get("GRAFT_STREAM_BYTES", 200 * 1024 * 1024))


def stream_compare(con, name, sql, pq_dir, files):
    """Corpus-sized-output compare, entirely inside DuckDB's streaming
    executor — no pandas materialization on either side (the r14 sf10d
    etl battery had to EXCLUDE etl_outlier_clamp/etl_scd2/
    etl_snapshot_diff because their ~60M-row outputs exceeded the
    cell-by-cell mirror; this path removes that harness limit).

    Both sides become DuckDB relations, every column is normalized by
    the SAME SQL expression (so only side-vs-side consistency matters,
    not agreement with the pandas normalizer), and each side is reduced
    to an order-independent multiset digest: row count + two
    independent sums of 64-bit row hashes (HUGEINT accumulation, exact
    at any row count)."""
    glob_sql = os.path.join(pq_dir, "*.parquet").replace("'", "''")
    got_rel = f"read_parquet('{glob_sql}')"
    want_rel = f"({sql})"

    def cols_types(rel_sql):
        rows = con.execute(f"DESCRIBE SELECT * FROM {rel_sql}").fetchall()
        return [(r[0], str(r[1]).upper()) for r in rows]

    got_ct, want_ct = cols_types(got_rel), cols_types(want_rel)
    if sorted(c for c, _ in got_ct) != sorted(c for c, _ in want_ct):
        return False, (f"columns differ spark={sorted(c for c, _ in got_ct)} "
                       f"duckdb={sorted(c for c, _ in want_ct)}")
    types = {}
    for c, t in got_ct + want_ct:
        # a column is float-normalized if EITHER side is floating —
        # mirrors norm_cell treating 3.0 and 3 as the same cell
        if t in ("DOUBLE", "FLOAT", "REAL") or types.get(c) == "f":
            types[c] = "f"
        else:
            types.setdefault(c, "o")

    def norm_expr(c, kind):
        q = '"' + c.replace('"', '""') + '"'
        if kind == "f":
            d = f"CAST({q} AS DOUBLE)"
            return (f"CASE WHEN {q} IS NULL OR isnan({d}) THEN 'NULL' "
                    f"WHEN {d} = floor({d}) AND abs({d}) < 1e15 "
                    f"THEN CAST(CAST({d} AS BIGINT) AS VARCHAR) "
                    f"ELSE CAST(round({d}, 9) AS VARCHAR) END")
        return f"COALESCE(CAST({q} AS VARCHAR), 'NULL')"

    exprs = ", ".join(norm_expr(c, types[c]) for c in sorted(types))
    digest = (f"SELECT count(*) AS n, "
              f"COALESCE(sum(CAST(hash(r) AS HUGEINT)), 0) AS h1, "
              f"COALESCE(sum(CAST(hash(r || '|2') AS HUGEINT)), 0) AS h2 "
              f"FROM (SELECT concat_ws(chr(31), {exprs}) AS r FROM %s)")
    got = con.execute(digest % got_rel).fetchone()
    want = con.execute(digest % want_rel).fetchone()
    if got[0] != want[0]:
        return False, f"rowcount spark={got[0]} duckdb={want[0]}"
    if got[1:] != want[1:]:
        return False, (f"multiset digest differs over {got[0]} rows "
                       f"(count equal — values diverge)")
    return True, f"{got[0]} rows digest-equivalent (streamed)"


def main(sf_dir, out_dir, json_out=None, only=None):
    results = {}
    durations = {}

    def record(name, status, msg, secs=None):
        results[name] = {"status": status, "detail": msg}
        if secs is not None:
            results[name]["oracle_sec"] = round(secs, 3)
            durations[name] = secs

    con = duckdb.connect()
    # parallel sweep workers set this so 6 concurrent DuckDB processes
    # don't each spawn nproc threads (6×32 threads on 32 cores thrashes:
    # measured load-average 153 during the round-14 full sf1d sweep)
    nthreads = os.environ.get("GRAFT_DUCKDB_THREADS")
    if nthreads:
        con.execute(f"SET threads TO {int(nthreads)}")
    # corpus-scale oracles (100x sweeps) need out-of-core execution: an
    # in-memory DuckDB has no temp_directory, so a big window/join
    # materialization OOM-kills the worker SILENTLY (observed twice in
    # the r15 sf10d ann sweep) instead of spilling
    tmpdir = os.environ.get("GRAFT_DUCKDB_TMP", "/tmp/duckdb_spill")
    os.makedirs(tmpdir, exist_ok=True)
    con.execute(f"SET temp_directory='{tmpdir}'")
    con.execute("SET max_temp_directory_size='%s'"
                % os.environ.get("GRAFT_DUCKDB_TMPCAP", "50GB"))
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    # Rows-only queries have no oracle entry but still go through the
    # driver's pandas row-sort — scan EVERY output dir for driver-hostile
    # column types (decimal repr mismatch, unsortable nested cells).
    for d in sorted(os.listdir(out_dir)):
        pq_dir = os.path.join(out_dir, d)
        if not os.path.isdir(pq_dir) or d in oracle:
            continue
        files = glob.glob(os.path.join(pq_dir, "*.parquet"))
        if not files:
            # a query dir with no parquet means the Spark job crashed
            # before writing output — that is a failure, not a skip
            print(f"FAIL {d} (rows-only): no parquet output at {pq_dir}")
            record(d, "fail", "rows-only: no parquet output")
            n_fail += 1
            continue
        schema = pq.read_schema(files[0])
        bad_cols = [f.name for f in schema
                    if pa.types.is_decimal(f.type) or pa.types.is_nested(f.type)]
        if bad_cols:
            print(f"FAIL {d} (rows-only): driver-hostile output columns "
                  f"{bad_cols} (decimal/nested)")
            record(d, "fail", f"rows-only: driver-hostile columns {bad_cols}")
            n_fail += 1
        else:
            print(f"PASS {d} (rows-only, schema scan)")
            record(d, "pass", "rows-only, schema scan")
            n_pass += 1
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        t_start = time.monotonic()
        pq_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pq_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {pq_dir}")
            record(name, "fail", "no spark output", secs=time.monotonic() - t_start)
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(pq_dir)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            record(name, "fail", f"cannot read spark output: {e}", secs=time.monotonic() - t_start)
            n_fail += 1
            continue
        # Driver-gate guard: DECIMAL / nested output columns fail the
        # driver's hash (Decimal repr mismatch) or crash its row sort
        # (unhashable ndarray). Reject them here so they can't ship.
        schema = pq.read_schema(files[0])
        bad_cols = [f.name for f in schema
                    if pa.types.is_decimal(f.type) or pa.types.is_nested(f.type)]
        if bad_cols:
            print(f"FAIL {name}: driver-hostile output columns {bad_cols} "
                  f"(decimal/nested) — cast to DOUBLE / scalars")
            record(name, "fail", f"driver-hostile columns {bad_cols}", secs=time.monotonic() - t_start)
            n_fail += 1
            continue
        # Corpus-sized outputs (full-table rewrites at 100×) stream the
        # compare inside DuckDB instead of materializing pandas frames;
        # the classic cell-by-cell path still runs at driver-gate scale,
        # so the two modes cross-check each other at sf0.01.
        if sum(os.path.getsize(x) for x in files) > STREAM_BYTES:
            try:
                ok, msg = stream_compare(con, name, sql, pq_dir, files)
            except Exception as e:
                ok, msg = False, f"stream compare error: {e}"
            dt = time.monotonic() - t_start
            if ok:
                print(f"PASS {name} ({msg}, {dt:.1f}s)")
                record(name, "pass", msg, secs=dt)
                n_pass += 1
            else:
                print(f"FAIL {name}: {msg}")
                record(name, "fail", msg, secs=dt)
                n_fail += 1
            continue
        try:
            rel = con.sql(sql)
            # Driver-gate guard (round-7 lesson, pipe_token_budget): a
            # DuckDB window sum over BIGINT yields HUGEINT; pandas
            # silently converts it to float64 so the value compare below
            # passes, but the driver's hash sees the type and fails.
            # Reject any non-standard integer oracle column here.
            bad_oracle = [c for c, t in zip(rel.columns, rel.types)
                          if str(t).upper() in ("HUGEINT", "UHUGEINT",
                                                "UBIGINT", "UINTEGER")]
            if bad_oracle:
                print(f"FAIL {name}: oracle columns {bad_oracle} have "
                      f"HUGEINT-class types — CAST them to BIGINT in the "
                      f"oracle SQL (driver hash mismatch)")
                record(name, "fail",
                       f"oracle columns {bad_oracle} HUGEINT-class",
                       secs=time.monotonic() - t_start)
                n_fail += 1
                continue
            want = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record(name, "fail", f"oracle SQL error: {e}", secs=time.monotonic() - t_start)
            n_fail += 1
            continue
        gc, gr = normalize(got)
        wc, wr = normalize(want)
        if gc != wc:
            print(f"FAIL {name}: columns differ spark={gc} duckdb={wc}")
            record(name, "fail", f"columns differ spark={gc} duckdb={wc}", secs=time.monotonic() - t_start)
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rowcount spark={len(gr)} duckdb={len(wr)}")
            record(name, "fail", f"rowcount spark={len(gr)} duckdb={len(wr)}",
                   secs=time.monotonic() - t_start)
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(gr, wr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; first:")
            print("  spark :", bad[0][0][:300].replace("\x1f", " | "))
            print("  duckdb:", bad[0][1][:300].replace("\x1f", " | "))
            record(name, "fail", f"{len(bad)}/{len(gr)} rows differ",
                   secs=time.monotonic() - t_start)
            n_fail += 1
        else:
            dt = time.monotonic() - t_start
            print(f"PASS {name} ({len(gr)} rows, {dt:.1f}s)")
            record(name, "pass", f"{len(gr)} rows hash-equivalent", secs=dt)
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if durations:
        worst = sorted(durations.items(), key=lambda kv: -kv[1])[:15]
        total = sum(durations.values())
        print(f"oracle sweep total {total:.0f}s; slowest:")
        for n, s in worst:
            print(f"  {s:7.1f}s  {n}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "queries": results}, f, indent=1, sort_keys=True)
        print(f"mirror artifact -> {json_out} ({len(results)} entries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    # optional 4th arg: comma-separated query names to profile a subset
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None, only))
