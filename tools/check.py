#!/usr/bin/env python3
"""Dev-only local approximation of the driver's correctness gate.

Runs DuckDB on outDir/oracle_sql.json over the same sf tables and compares
with the parquet dumps Verify wrote. NOT part of the shipped library.

Usage: python3 tools/check.py <outDir> <sfDir>
"""
import sys, json, glob, math
import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def float_neq(gv, ev):
    """Bit-faithful float inequality, mirroring the driver's hash compare.

    pandas `==` treats -0.0 == 0.0 as True, so it is structurally blind to
    signed-zero divergences the driver's value hash catches (round-5 t14).
    Compare the value AND the sign bit: equal nonzero values always share a
    sign, so the extra clause only bites on -0.0 vs +0.0; NaNs match NaNs
    regardless of payload/sign (both engines emit canonical quiet NaN).
    """
    ga = gv.to_numpy(dtype='float64')
    ea = ev.to_numpy(dtype='float64')
    nan_both = np.isnan(ga) & np.isnan(ea)
    val_eq = (ga == ea) | nan_both
    sgn_eq = (np.signbit(ga) == np.signbit(ea)) | nan_both
    return pd.Series(~(val_eq & sgn_eq), index=gv.index)


def selftest():
    """Planted-divergence test: the gate must fail on a -0.0 vs +0.0 pair."""
    neg = pd.Series([1.5, -0.0, np.nan])
    pos = pd.Series([1.5, 0.0, np.nan])
    assert float_neq(neg, pos).tolist() == [False, True, False], "signed zero must FAIL"
    assert float_neq(pos, neg).tolist() == [False, True, False], "symmetric"
    assert not float_neq(neg, neg.copy()).any(), "identical incl. -0.0/NaN must pass"
    assert float_neq(pd.Series([1.0]), pd.Series([1.0 + 1e-9])).tolist() == [True]
    print("selftest OK: signed-zero divergence fails, bit-identical passes")
    return 0


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); failures += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}"); failures += 1; continue
        got, exp = got[gc], exp[ec]
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); failures += 1; continue
        g = got.sort_values(gc, ignore_index=True)
        e = exp.sort_values(ec, ignore_index=True)
        bad = None
        # Mirror the driver's representation-sensitive hash compare: a value
        # match across dtype KINDS (e.g. spark int64 vs DuckDB HUGEINT
        # surfacing as float64/object) hash-mismatches at the driver, so it
        # must FAIL here too. Width differences within a kind (int32 vs
        # int64) are normalized by the driver — round-1 artifact shows
        # q7/s1/s2/s3 (int32 rank vs int64) hash-matching.
        dbad = None
        for c in gc:
            gd, ed = g[c].dtype, e[c].dtype
            gk = 'i' if gd.kind == 'u' else gd.kind
            ek = 'i' if ed.kind == 'u' else ed.kind
            if (gk in 'if' or ek in 'if') and gk != ek:
                dbad = (c, gd, ed); break
        if dbad:
            c, gd, ed = dbad
            print(f"FAIL {name}: col {c} dtype spark={gd} duckdb={ed} (driver hash is dtype-kind-sensitive)")
            failures += 1; continue
        for c in gc:
            gv, ev = g[c], e[c]
            if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
                neq = float_neq(gv, ev)
            else:
                try:
                    neq = ~((gv == ev) | (gv.isna() & ev.isna()))
                except Exception:
                    neq = gv.astype(str) != ev.astype(str)
            if neq.any():
                i = neq.idxmax()
                bad = (c, i, gv[i], ev[i]); break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} duckdb={b!r}"); failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    print(f"\n{len(oracle)-failures}/{len(oracle)} queries match")
    return 1 if failures else 0

if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
