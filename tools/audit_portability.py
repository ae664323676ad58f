#!/usr/bin/env python3
"""Portability audit (round-10, VERDICT #2): flag twins whose results depend
on engine-version-sensitive typing.

Class A — literal typing: rewrite every bare decimal literal `N.M` outside
string quotes as CAST(N.M AS DOUBLE) and compare the DuckDB result
bit-for-bit against the original. A mismatch means the twin's value depends
on how the engine types decimal literals (DECIMAL precision/scale rules
changed across DuckDB versions — the round-9 daily_revenue_ewma failure).

Class B — round-at-the-edge: any DOUBLE output column in the Spark dump
whose max |value| >= 1e8 while the twin rounds to 6 decimals sits at or past
IEEE-754's 15-significant-digit edge, where HALF_UP (Spark BigDecimal) and
an engine's float rounding can diverge on the 16th digit.

Usage: python3 tools/audit_portability.py <sfDir> <verifyOutDir>
"""
import sys, os, json, re, glob
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
sqls = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def connect():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con

def cast_literals(sql):
    """Wrap bare decimal literals outside single-quoted strings in CAST(.. AS DOUBLE)."""
    out, i, n = [], 0, len(sql)
    lit = re.compile(r'\d+\.\d+(?:[eE][+-]?\d+)?')
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j+1] == "'":
                        j += 2; continue
                    break
                j += 1
            out.append(sql[i:j+1]); i = j + 1; continue
        m = lit.match(sql, i)
        if m:
            # don't touch literals already inside a CAST(... AS DOUBLE) — harmless either way
            prev = sql[max(0,i-1):i]
            if prev.isalnum() or prev == '_' or prev == '.':
                out.append(sql[i]); i += 1; continue
            out.append(f"CAST({m.group(0)} AS DOUBLE)"); i = m.end(); continue
        out.append(c); i += 1
    return ''.join(out)

flagged_a, clean_a, errors = [], [], []
for name, sql in sorted(sqls.items()):
    if not re.search(r'\d+\.\d+', re.sub(r"'[^']*'", '', sql)):
        continue
    variant = cast_literals(sql)
    if variant == sql:
        continue
    con = connect()
    try:
        a = con.execute(sql).fetchall()
        b = con.execute(variant).fetchall()
        key = lambda r: tuple((x is None, str(x)) for x in r)
        if sorted(a, key=key) == sorted(b, key=key):
            clean_a.append(name)
        else:
            flagged_a.append(name)
    except Exception as e:
        errors.append((name, str(e)[:120]))
    finally:
        con.close()

print(f"Class A (literal typing): {len(clean_a)} clean, {len(flagged_a)} FLAGGED, {len(errors)} errors")
for n in flagged_a: print("  FLAG-A", n)
for n, e in errors: print("  ERR", n, e)

# Class B: columns produced by a top-level `round(expr, k) AS col` whose
# magnitude reaches the 15-significant-digit edge (>= 1e(15-k)). A pure
# mirrored CAST-double division with NO final round is NOT in this class —
# a single IEEE-754 division is nearest-even on every engine; the risk is
# decimal HALF_UP (Spark BigDecimal) vs float rounding diverging on the
# 16th digit, which only a round(x, k) rescale exposes.
print()
alias_re = re.compile(r'round\s*\([^()]*(?:\([^()]*\)[^()]*)*,\s*(\d+)\s*\)\s+AS\s+(\w+)', re.I)
flagged_b = []
for name, sql in sorted(sqls.items()):
    rounded_cols = {m.group(2).lower(): int(m.group(1)) for m in alias_re.finditer(sql)}
    if not rounded_cols:
        continue
    d = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(d, '*.parquet'))
    if not files:
        continue
    t = pq.read_table(files[0])
    for col in t.column_names:
        k = rounded_cols.get(col.lower())
        if k is None or str(t.schema.field(col).type) != 'double':
            continue
        vals = [v for v in t.column(col).to_pylist() if v is not None]
        if not vals:
            continue
        mx = max(abs(v) for v in vals)
        if mx >= 10 ** (15 - k):
            flagged_b.append((name, col, k, mx))
print(f"Class B (round(x,k) at >=1e(15-k) magnitude): {len(flagged_b)} flagged")
for n, c, k, m in flagged_b: print(f"  FLAG-B {n}.{c} round(.,{k}) max|v|={m:.3e}")
