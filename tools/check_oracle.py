#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare (order-insensitively, and
order-sensitively for information) with the parquet the Verify main dumped.

Usage: check_oracle.py [sfdir] [verify_outdir]
"""
import sys, json, glob, math, re
import duckdb
import pandas as pd
import numpy as np

PYUF = "--pyuf" in sys.argv
# --only=d03,s,t restricts to queries whose name starts with any prefix
# (for over-cap corpora where the refused baselines have no Spark output
# and their quadratic oracle SQL would grind DuckDB)
ONLY = [p for a in sys.argv if a.startswith("--only=")
        for p in a[len("--only="):].split(",") if p]
# --skip=d02,d05 excludes queries by name prefix (e.g. the capped
# baselines an over-cap corpus refuses on the ENGINE side — their
# quadratic oracle SQL must not run either)
SKIP = [p for a in sys.argv if a.startswith("--skip=")
        for p in a[len("--skip="):].split(",") if p]
# --stage=d03_minhash_lsh:sh+sig  materializes the named CTEs (in order)
# of that query into temp tables before evaluating the rest. Identical
# results — the same SQL text runs, just checkpointed mid-chain — but a
# far lower peak for string-heavy prefixes the planner re-evaluates per
# reference (the sf10 d03 shingle pipeline spilled >75 GB unstaged).
STAGE = {s.split(":")[0]: s.split(":")[1].split("+")
         for a in sys.argv if a.startswith("--stage=")
         for s in a[len("--stage="):].split(",") if ":" in s}
argv = [a for a in sys.argv if not a.startswith("--")]
SF = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
OUT = argv[2] if len(argv) > 2 else "/tmp/vout"


def unionfind_labels(edges, nodes):
    """Min-label connected components: same semantics as the recursive
    reach/labels CTE (every node labeled by the min id in its component)."""
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def rewrite_components(sql, con):
    """--pyuf: replace the recursive reach/labels CTE pair with labels
    computed by a reference union-find over the SAME edges CTE — the
    recursive-CTE form does not finish in reasonable time at 50k docs in
    DuckDB (the ORACLE is the sf1 bottleneck, not the engine). Verbatim
    everywhere else, so only the transitive-closure mechanism changes."""
    i = sql.find("bi AS (")
    col = "nd" if "reach(nd, lab)" in sql else "doc"
    labels_cte = (f"labels AS (SELECT {col}, min(lab) AS cluster_id "
                  f"FROM reach GROUP BY {col})")
    j = sql.find(labels_cte)
    assert i > 0 and j > i, "unrecognized components-oracle shape"
    prefix = sql[:i].rstrip()
    assert prefix.endswith(",")
    prefix_body = prefix[:-1].replace("WITH RECURSIVE", "WITH", 1)
    edges = con.sql(prefix_body + "\nSELECT doc_a, doc_b FROM edges").fetchall()
    m = re.search(r"reach\((?:doc|nd), lab\) AS \(\s*(SELECT [^\n]+)", sql)
    nodes = [r[0] for r in con.sql(prefix_body + "\n" + m.group(1)).fetchall()]
    lab = unionfind_labels(edges, nodes)
    con.register("pylabels", pd.DataFrame(
        {col: list(lab.keys()), "cluster_id": list(lab.values())}))
    return (sql[:i] + f"labels AS (SELECT {col}, cluster_id FROM pylabels)" +
            sql[j + len(labels_cte):]).replace("WITH RECURSIVE", "WITH", 1)
def stage_cte(sql, con, cte):
    """Materialize the WITH-chain prefix ending at CTE `cte` into a temp
    table and rewrite the remainder to read it. The staged SQL is the
    oracle's own text — only the evaluation is checkpointed.

    The rewrite substitutes ONLY table references (`FROM cte` / `JOIN
    cte`, optionally alias-suffixed) — a blind \\b-sub would also rename
    a column, alias, or string-literal occurrence of the same word and
    silently corrupt the oracle SQL. Any leftover bare reference after
    the sub (e.g. a comma-join `FROM a, cte` this scanner doesn't
    handle) fails the assertion instead of running wrong SQL."""
    m = re.search(rf"\b{cte} AS \(", sql)
    assert m, f"--stage: no CTE `{cte}` in oracle SQL"
    i = sql.index("(", m.start())
    depth, j, in_str = 0, i, False
    while True:
        c = sql[j]
        if c == "'":
            if in_str and sql[j + 1 : j + 2] == "'":
                j += 1          # doubled '' escape inside a literal
            else:
                in_str = not in_str
        elif not in_str:
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
        j += 1
    prefix = sql[:j + 1]
    assert prefix.lstrip().upper().startswith("WITH")
    con.sql(f"CREATE OR REPLACE TEMP TABLE {cte}__mat AS "
            f"{prefix} SELECT * FROM {cte}")
    rest = sql[j + 1:].lstrip()
    assert rest.startswith(","), f"--stage: `{cte}` must not be the last CTE"
    kw = "WITH RECURSIVE " if prefix.lstrip().upper().startswith("WITH RECURSIVE") \
        else "WITH "
    rest = kw + rest[1:].lstrip()
    # Rewrite table references alias-preservingly: `FROM cte` becomes
    # `FROM cte__mat cte` (the old name stays valid as an alias, so
    # qualified refs like `cte.col` keep resolving); `FROM cte x` becomes
    # `FROM cte__mat x`. A keyword after the name (WHERE/GROUP/JOIN/…)
    # is not an alias.
    kws = ("ON|USING|WHERE|GROUP|ORDER|JOIN|LEFT|RIGHT|INNER|CROSS|"
           "ANTI|SEMI|UNION|INTERSECT|EXCEPT|LIMIT|HAVING|"
           "FULL|ASOF|NATURAL|OUTER|WINDOW|QUALIFY|OFFSET|AS")
    # Prefix: `FROM name` / `JOIN name` with mandatory whitespace, or a
    # comma with OPTIONAL whitespace on both sides (r13 advisory: the old
    # `\b(FROM|JOIN|,)(\s+)` required a word char before the comma and
    # whitespace after it, so `unnest(...) , cte` and `a,cte` escaped the
    # rewrite AND the leftover assertion). `(?!\s*\.)` skips qualified
    # column refs like `SELECT a, cte.col` — not a table position.
    pat = (rf"(\b(?:FROM|JOIN)\s+|,\s*){cte}\b(?!\s*\.)"
           rf"(?:(\s+)(?!(?:{kws})\b)([A-Za-z_][A-Za-z0-9_]*))?")

    def _sub(m):
        pre, aws, alias = m.group(1), m.group(2), m.group(3)
        if alias:
            return f"{pre}{cte}__mat{aws}{alias}"
        return f"{pre}{cte}__mat {cte}"
    staged = re.sub(pat, _sub, rest, flags=re.IGNORECASE)
    # every remaining table-position reference must be gone; a bare
    # occurrence elsewhere (column name, string literal) is fine and was
    # not touched by construction (the pattern only matches table refs).
    # `,` covers comma-join position; the alias keyword list includes the
    # join-shaped words so `FROM x FULL JOIN y` never eats FULL as an
    # alias. Belt-and-braces: a staged CTE name that collides with a
    # registered base table would make any unrewritten leftover read the
    # base table SILENTLY instead of failing as an unresolved name — ban
    # the collision outright.
    assert cte.lower() not in TABLES, \
        f"--stage: CTE `{cte}` shadows a base table; rename the CTE"
    leftover = re.search(
        rf"(?:\b(?:FROM|JOIN)\s+|,\s*){cte}\b(?!\s*\.)", staged, re.IGNORECASE)
    assert not leftover, f"--stage: unrewritten reference to `{cte}`"
    return staged


TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
# Spill to an explicit scratch dir on the big volume (the default .tmp in
# cwd filled the disk during the sf10 d14 pass) and leave RAM headroom.
con.sql("SET temp_directory='/tmp/duck_oracle_tmp'")
con.sql("SET memory_limit='48GB'")
# Row order only matters below an ORDER BY, which every ordered oracle
# carries explicitly; dropping insertion-order preservation lets DuckDB
# stream large aggregations instead of buffering them.
con.sql("SET preserve_insertion_order=false")
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(oracle):
    if ONLY and not any(name.startswith(p) for p in ONLY):
        continue
    if SKIP and any(name.startswith(p) for p in SKIP):
        continue
    # Spark-output existence FIRST: a refused/failed engine query must
    # fail fast, not after hours of (possibly quadratic) oracle work
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no Spark output")
        n_fail += 1
        continue
    sql = oracle[name]
    try:
        # stage BEFORE the pyuf rewrite: rewrite_components EXECUTES the
        # edges prefix itself, so an unstaged string-heavy chain would
        # spill inside it (d08 at 500k docs ran /tmp out of disk)
        for cte in STAGE.get(name, []):
            sql = stage_cte(sql, con, cte)
        if PYUF and "RECURSIVE" in sql:
            sql = rewrite_components(sql, con)
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    finally:
        # staged temp tables are per-QUERY state: left in the connection
        # they accumulate across a 100-query sweep (tens of GB of spill
        # held until exit — the r12 sf10full sweep OOM'd on exactly this)
        for cte in STAGE.get(name, []):
            try:
                con.sql(f"DROP TABLE IF EXISTS {cte}__mat")
            except Exception:
                pass
    # Read the engine dump ORDER-PRESERVINGLY (pyarrow keeps file/row
    # order). Reading it through this connection reordered rows of
    # multi-row-group files: preserve_insertion_order=false lets DuckDB's
    # parallel parquet reader return row groups in any order, which made
    # the three multi-million-row mirrors (e01/e13/q25 at sf10full) look
    # "sorted-only" when the engine's ORDER BY (a unique key in all three)
    # was deterministic all along. The oracle side is unaffected — a
    # top-level ORDER BY is always honored in result order.
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                    ignore_index=True)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns differ: oracle={list(exp.columns)} spark={list(got.columns)}")
        n_fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: row counts differ: oracle={len(exp)} spark={len(got)}")
        n_fail += 1
        continue
    # exact compare in row order, then sorted. Two regimes:
    #  - ≤ HASHCMP_ROWS: the original astype(str) frame compare (exact,
    #    and FAIL diagnostics can print the differing rows).
    #  - above it: astype(str) materializes ~2 frames of Python strings
    #    (the 95M-row e01 mirror at sf100star burned >40 single-threaded
    #    CPU-minutes; 150M-row q25 would OOM) — switch to vectorized
    #    row hashing (pandas hash_pandas_object) after normalizing
    #    integer/float/datetime dtypes so physical-width differences
    #    (int32 vs int64, us vs ns) don't fail value-equal frames. A
    #    64-bit row-hash collision masking a real diff is ~2⁻⁶⁴·rows —
    #    the d17 caveat class, documented here.
    HASHCMP_ROWS = int(__import__("os").environ.get("GRAFT_HASHCMP_ROWS", 20_000_000))
    def canon(df):
        return df.fillna("\x00NULL").astype(str)
    def hashcanon(df):
        import datetime
        out = {}
        for c in df.columns:
            s = df[c]
            k = s.dtype.kind
            if k in "iu":
                s = s.astype("int64")
            elif k == "f":
                s = s.astype("float64")
            elif k == "M":
                s = s.astype("datetime64[us]")
            elif k == "O":
                # parquet DATE loads as datetime.date OBJECTS while
                # DuckDB's .df() gives datetime64 — same value, different
                # physical type; normalize dates to datetime64[us] and
                # any other object column to its string form
                nn = s.dropna()
                if len(nn) and isinstance(nn.iloc[0], datetime.date):
                    s = pd.to_datetime(s).astype("datetime64[us]")
                else:
                    s = s.astype(str)
            out[c] = s
        return pd.util.hash_pandas_object(pd.DataFrame(out), index=False)
    if len(exp) > HASHCMP_ROWS:
        he, hg = hashcanon(exp).to_numpy(), hashcanon(got).to_numpy()
        ordered_eq = bool((he == hg).all())
        import numpy as np
        sorted_eq = ordered_eq or bool((np.sort(he) == np.sort(hg)).all())
        se = sg = None
    else:
        ordered_eq = canon(exp).equals(canon(got))
        se = canon(exp).sort_values(by=list(exp.columns)).reset_index(drop=True)
        sg = canon(got).sort_values(by=list(got.columns)).reset_index(drop=True)
        sorted_eq = se.equals(sg)
    if sorted_eq:
        tag = "PASS" if ordered_eq else "PASS(sorted-only; row order differs)"
        if len(exp) > HASHCMP_ROWS:
            tag += "(hashcmp)"
        print(f"{tag} {name} ({len(exp)} rows)")
        n_pass += 1
    else:
        print(f"FAIL {name}: values differ")
        if se is not None:
            diff = (se != sg)
            bad = diff.any(axis=1)
            idx = se.index[bad][:5]
            for i in idx:
                print(f"  row {i}: oracle={se.loc[i].to_dict()}")
                print(f"          spark ={sg.loc[i].to_dict()}")
        n_fail += 1
print(f"\n{n_pass} pass / {n_fail} fail")
sys.exit(1 if n_fail else 0)
