#!/usr/bin/env python3
"""Local mirror of the driver's t2 oracle compare (SURVEY.md §5.2).

Usage: python3 scripts/local_oracle_check.py <sfDir> <verifyOutDir>

For every query dumped by graft.Verify into <verifyOutDir>/<name>/, run the
matching oracle_sql.json entry in DuckDB over the parquet tables in <sfDir>
(views named region, nation, ... like the driver does), then compare:
  - column name sets (compare sorts columns by name, like the driver),
  - row counts,
  - cell-by-cell values in produced row order (NaN==NaN, None==None).

Results larger than GRAFT_MULTISET_THRESHOLD rows (default 200000 — the
scale-oracle arm, VERDICT r11 #2) switch to an exact MULTISET compare run
inside DuckDB (symmetric EXCEPT ALL, count of differing rows must be 0):
same value semantics (DuckDB's total order has NaN == NaN, NULL == NULL),
but row ORDER is not checked in that mode — fine for the deterministic
scale sweep, where both sides are order-normalized by their own ORDER BYs.

Exit 0 iff every oracle-declared query matches. Queries present in the dump
but absent from oracle_sql.json are reported as rows-only (driver's weaker
check) and only verified to have >0 rows.
"""
import json
import math
import os
import resource
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def split_ctes(sql):
    """Split a WITH-chain into [(name, body), ...] plus the final query.

    Used only in staged mode (GRAFT_STAGE_CTES=1, set by the scale-oracle
    arm): DuckDB's optimizer flattens a deep CTE pipeline into one join
    tree and at ×10 corpus scale picked join orders that never finished
    (the 8-round label propagation became a reorderable 9-way join);
    executing each CTE body verbatim as its own TEMP TABLE pins the
    left-deep evaluation the SQL spells. The scanner is quote-aware
    (handles '' escapes, "..." identifiers, and -- line comments); bodies
    are copied byte-for-byte, so staged results are the same SQL, same
    values. Staged-vs-normal equivalence is re-checked on every staged
    run by selftest_split() below (ADVICE r12) — a scanner bug fails the
    gate instead of silently mis-splitting.
    """
    s = sql.strip()
    if not s[:4].upper() == "WITH":
        return [], s
    i, ctes = 4, []
    while True:
        while s[i].isspace():
            i += 1
        if s[i] == '"':
            # double-quoted CTE name ("" escapes): store the inner text
            # so run_staged's "{name}" re-quoting round-trips it
            j = i + 1
            while True:
                if s[j] == '"':
                    if j + 1 < len(s) and s[j + 1] == '"':
                        j += 2
                        continue
                    break
                j += 1
            name = s[i + 1:j]
            j += 1
        else:
            j = i
            while s[j] not in " \t\n(":
                j += 1
            name = s[i:j]
        # optional column list: `name(col, ...) AS (body)` — capture it so
        # the staged table can re-alias via SELECT * FROM (body) AS t(cols)
        j2 = j
        while s[j2].isspace():
            j2 += 1
        collist = None
        if s[j2] == "(":
            depth, p = 0, j2
            while True:
                c = s[p]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
                p += 1
            collist = s[j2 + 1:p]
            j = p + 1
        k = s.index("(", j)
        depth, p = 0, k
        while True:
            c = s[p]
            if c == "'":
                p += 1
                while True:
                    if s[p] == "'":
                        if p + 1 < len(s) and s[p + 1] == "'":
                            p += 2
                            continue
                        break
                    p += 1
            elif c == '"':
                # double-quoted identifier ("" escapes a quote)
                p += 1
                while True:
                    if s[p] == '"':
                        if p + 1 < len(s) and s[p + 1] == '"':
                            p += 2
                            continue
                        break
                    p += 1
            elif c == "-" and p + 1 < len(s) and s[p + 1] == "-":
                # -- line comment: parens/quotes inside it are not syntax
                nl = s.find("\n", p)
                p = len(s) - 1 if nl < 0 else nl
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            p += 1
        body = s[k + 1:p]
        if collist is not None:
            body = f'SELECT * FROM ({body}) AS "{name}"({collist})'
        ctes.append((name, body))
        q = p + 1
        while s[q].isspace():
            q += 1
        if s[q] == ",":
            i = q + 1
        else:
            return ctes, s[q:]


def run_staged(con, sql, table):
    """Execute `sql` via the staged split into TEMP TABLE `table`."""
    ctes, final = split_ctes(sql)
    for cte_name, body in ctes:
        con.execute(f'CREATE OR REPLACE TEMP TABLE "{cte_name}" AS {body}')
    con.execute(f'CREATE OR REPLACE TEMP TABLE "{table}" AS {final}')
    for cte_name, _ in ctes:
        con.execute(f'DROP TABLE IF EXISTS "{cte_name}"')


def selftest_split():
    """Staged ≡ normal on WITH-chains exercising every scanner hazard:
    -- comments (with parens/quotes inside), double-quoted identifiers,
    '' escapes, column lists, parens in strings, nested subqueries.
    Runs on every staged invocation (< 0.1 s); a mis-split either throws
    or lands a value diff here before it can corrupt a real compare."""
    cases = [
        "WITH a AS (SELECT 1 AS x), b AS (SELECT x+1 AS y FROM a) "
        "SELECT * FROM b",
        # -- comment containing an unbalanced paren and a quote
        "WITH a AS (SELECT 1 AS x -- not a real ( or '\n"
        ", 2 AS y) SELECT x, y FROM a",
        # double-quoted identifier containing parens and a '' escape
        'WITH "odd (name)" AS (SELECT 1 AS "c (1)", \'it''s\' AS s) '
        'SELECT * FROM "odd (name)"',
        # column list + string literal with parens
        "WITH t(a, b) AS (SELECT 1, '(((' ) SELECT a, b FROM t",
        # nested subquery depth + chained CTE reference
        "WITH x AS (SELECT * FROM (SELECT 2 AS v) q), "
        "y AS (SELECT v*2 AS w FROM x) SELECT w FROM y, x",
    ]
    con = duckdb.connect()
    for i, sql in enumerate(cases):
        normal = con.execute(sql).fetchall()
        run_staged(con, sql, f"_st{i}")
        staged = con.execute(f'SELECT * FROM "_st{i}"').fetchall()
        if sorted(map(repr, normal)) != sorted(map(repr, staged)):
            print(f"[selftest] split_ctes case {i} staged != normal:\n  {sql}\n"
                  f"  normal={normal}\n  staged={staged}")
            sys.exit(2)
    con.close()


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest_split()
        print("[selftest] split_ctes staged == normal on all cases")
        return
    if os.environ.get("GRAFT_STAGE_CTES") == "1":
        selftest_split()
    sf_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    con = duckdb.connect()
    # scale-oracle posture: the ×k doc-family oracles build corpus-sized
    # intermediates — cap memory well under the box and let DuckDB spill
    # instead of riding the OOM killer. (preserve_insertion_order stays
    # at its default: the small-result path compares in produced row
    # order, which the parquet read and CTAS must keep honoring.)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '48GB')}'")
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.is_dir():
            # StressGen ×k corpora are Spark-written parquet DIRECTORIES
            # (the pristine fixtures are single files) — glob the parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    dumped = sorted(d.name for d in out_dir.iterdir() if d.is_dir())
    n_ok = n_bad = 0
    failures = []
    big = int(os.environ.get("GRAFT_MULTISET_THRESHOLD", "200000"))
    for name in dumped:
        t_q0 = time.monotonic()
        files = list((out_dir / name).glob("*.parquet"))
        if not files:
            failures.append((name, "no parquet produced (Spark query failed)"))
            n_bad += 1
            continue
        got_src = f"read_parquet({[str(f) for f in files]})"
        n_got = con.execute(f"SELECT count(*) FROM {got_src}").fetchone()[0]
        if name not in oracle:
            status = "ROWS-ONLY" if n_got > 0 else "EMPTY(!)"
            print(f"  [{status}] {name}: {n_got} rows, no oracle declared")
            if n_got == 0:
                failures.append((name, "no oracle and 0 rows"))
                n_bad += 1
            else:
                n_ok += 1
            continue
        try:
            if os.environ.get("GRAFT_STAGE_CTES") == "1":
                run_staged(con, oracle[name], "exp")
            else:
                con.execute(f"CREATE OR REPLACE TEMP TABLE exp AS {oracle[name]}")
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            n_bad += 1
            continue
        got_desc = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM {got_src}").fetchall()}
        exp_desc = {r[0]: r[1] for r in con.execute(
            "DESCRIBE SELECT * FROM exp").fetchall()}
        got_cols = sorted(got_desc)
        exp_cols = sorted(exp_desc)
        if got_cols != exp_cols:
            failures.append((name, f"columns differ: spark={got_cols} oracle={exp_cols}"))
            n_bad += 1
            continue
        n_exp = con.execute("SELECT count(*) FROM exp").fetchone()[0]
        if n_got != n_exp:
            failures.append((name, f"row counts differ: spark={n_got} oracle={n_exp}"))
            n_bad += 1
            continue
        if n_got > big:
            # dtype drift check mirrors the small path (ADVICE r12): the
            # EXCEPT ALL below implicitly coerces, so a HUGEINT-vs-BIGINT
            # sum drift would pass silently exactly at the scale this arm
            # targets — surface it loudly before the compare.
            for c in got_cols:
                if got_desc[c] != exp_desc[c]:
                    print(f"  [WARN] {name}: dtype {c}: spark={got_desc[c]}"
                          f" oracle={exp_desc[c]} (multiset compare coerces)")
            # exact multiset compare inside DuckDB: zero rows may differ
            # in either direction (row order unchecked in this mode)
            cols = ", ".join(f'"{c}"' for c in got_cols)
            diff = con.execute(
                f"SELECT count(*) FROM ("
                f" (SELECT {cols} FROM {got_src} EXCEPT ALL SELECT {cols} FROM exp)"
                f" UNION ALL"
                f" (SELECT {cols} FROM exp EXCEPT ALL SELECT {cols} FROM {got_src})"
                f")").fetchone()[0]
            if diff:
                failures.append((name, f"multiset compare: {diff} differing rows"))
                n_bad += 1
            else:
                print(f"  [OK] {name}: {n_got} rows multiset-equivalent"
                      f" (order unchecked, {time.monotonic() - t_q0:.1f}s oracle wall)")
                n_ok += 1
            continue
        got = con.execute(f"SELECT * FROM {got_src}").fetchdf()
        exp = con.execute("SELECT * FROM exp").fetchdf()
        # dtype drift (e.g. DuckDB HUGEINT sums vs Spark BIGINT) can pass
        # value equality here but may fail a stricter driver-side hash —
        # surface it loudly.
        for c in got_cols:
            if str(got[c].dtype) != str(exp[c].dtype):
                print(f"  [WARN] {name}: dtype {c}: spark={got[c].dtype} oracle={exp[c].dtype}")
        g = got[got_cols].values.tolist()
        e = exp[exp_cols].values.tolist()
        bad = None
        for i, (gr, er) in enumerate(zip(g, e)):
            for j, (gc, ec) in enumerate(zip(gr, er)):
                # pandas may surface ints as numpy types / floats; normalize
                gv = gc.item() if hasattr(gc, "item") else gc
                ev = ec.item() if hasattr(ec, "item") else ec
                if hasattr(gv, "tolist"):
                    gv = gv.tolist()
                if hasattr(ev, "tolist"):
                    ev = ev.tolist()
                if not cells_equal(gv, ev):
                    bad = (i, got_cols[j], gv, ev)
                    break
            if bad:
                break
        if bad:
            failures.append((name, f"row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}"))
            n_bad += 1
        else:
            print(f"  [OK] {name}: {len(got)} rows hash-equivalent"
                  f" ({time.monotonic() - t_q0:.1f}s oracle wall)")
            n_ok += 1

    missing = sorted(set(oracle) - set(dumped))
    for name in missing:
        failures.append((name, "oracle declared but no dump dir (query not in queries map?)"))
        n_bad += 1

    # the checker's own ceiling, for the scale-sweep record: peak RSS of
    # this process (DuckDB is in-process; ru_maxrss is KiB on Linux)
    peak_gib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1024 * 1024)
    print(f"\n{n_ok} ok, {n_bad} failed (checker peak RSS {peak_gib:.1f} GiB)")
    for name, why in failures:
        print(f"  [FAIL] {name}: {why}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
