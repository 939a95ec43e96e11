#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver:
for each query: load Spark's parquet output, run the oracle SQL in DuckDB
against the sf tables, sort columns by name, compare row count, schema,
and per-value hash.

Usage: python3 scripts/check_oracles.py <verifyOutDir> <sfDir>
"""
import sys, json, math, glob, os
import duckdb

def canon(rows, cols):
    """Rows as list of tuples ordered by sorted column name; values normalized."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

def norm_type(t):
    """Normalize DuckDB type names so parquet-read vs computed types compare."""
    t = t.upper()
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    return t

# Oracle output types the driver's typed-value hash cannot be trusted with:
# DuckDB widens uncast window/whole-column integer sums to HUGEINT (INT128)
# and exact arithmetic to DECIMAL — neither has a Spark parquet counterpart,
# so a values-equal result can still hash-mismatch (the r2/r3 q_sessionize
# failure). Every oracle must cast these away explicitly.
BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")

def type_audit(con, name, sql, pdir):
    """DESCRIBE oracle vs Spark parquet; return (violations, matrix_rows)."""
    bad, rows = [], []
    odesc = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    sdesc = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{pdir}/*.parquet'").fetchall()}
    for c in sorted(set(odesc) | set(sdesc)):
        ot, st = odesc.get(c, "-"), sdesc.get(c, "-")
        rows.append((name, c, st, ot))
        if any(b in ot.upper() for b in BANNED):
            bad.append(f"oracle column {c} is {ot} (banned: cast it)")
        elif ot != "-" and st != "-" and norm_type(ot) != norm_type(st):
            bad.append(f"column {c}: spark={st} oracle={ot}")
    return bad, rows

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # driver testdata ships single parquet FILES; ScaleUp (sf sweep)
        # writes Spark-style DIRECTORIES of part files — glob those
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = 0
    matrix = []
    for name, sql in sorted(oracles.items()):
        pdir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"MISSING  {name}: no spark output"); n_bad += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{pdir}/*.parquet'").fetchall()
            gcols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            ecols = [d[0] for d in con.description]
            tbad, trows = type_audit(con, name, sql, pdir)
            matrix.extend(trows)
        except Exception as e:
            print(f"ERROR    {name}: {e}"); n_bad += 1; continue
        if tbad:
            print(f"TYPES    {name}: " + "; ".join(tbad)); n_bad += 1; continue
        gc, gr = canon(got, gcols)
        ec, er = canon(exp, ecols)
        if gc != ec:
            print(f"SCHEMA   {name}: spark={gc} oracle={ec}"); n_bad += 1; continue
        if len(gr) != len(er):
            print(f"ROWS     {name}: spark={len(gr)} oracle={len(er)}"); n_bad += 1; continue
        if gr != er:
            diffs = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"VALUES   {name}: first diffs {diffs}"); n_bad += 1; continue
        print(f"OK       {name} ({len(gr)} rows)"); n_ok += 1
    with open(os.path.join(outdir, "types_matrix.tsv"), "w") as f:
        f.write("query\tcolumn\tspark_type\toracle_type\n")
        for r in matrix:
            f.write("\t".join(r) + "\n")
    print(f"\n{n_ok} ok, {n_bad} bad (type matrix: {outdir}/types_matrix.tsv)")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
