#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB over the same sf dir, compare
row count / schema / values (columns sorted by name, rows sorted)."""
import sys, json, glob, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = {"error": "no parquet output"}
            continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracle:
            results[name] = {"rows": len(got), "check": "rows-only",
                             "ok": len(got) >= 0}
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = {"error": f"oracle failed: {e}"}
            continue
        r = {"rows_got": len(got), "rows_exp": len(exp)}
        g = got.reindex(sorted(got.columns), axis=1)
        e = exp.reindex(sorted(exp.columns), axis=1)
        r["schema_match"] = list(g.columns) == list(e.columns) and \
            all(str(a) == str(b) for a, b in zip(g.dtypes, e.dtypes))
        if list(g.columns) != list(e.columns):
            r["cols"] = {"got": list(g.columns), "exp": list(e.columns)}
        elif not r["schema_match"]:
            r["dtypes"] = {"got": [str(x) for x in g.dtypes],
                           "exp": [str(x) for x in e.dtypes]}
        if list(g.columns) == list(e.columns) and len(g) == len(e):
            gs = g.sort_values(by=list(g.columns), ignore_index=True)
            es = e.sort_values(by=list(e.columns), ignore_index=True)
            try:
                eq = gs.astype(str).equals(es.astype(str))
            except Exception as ex:
                eq = False
            r["hash_match"] = bool(eq)
            if not eq:
                diffs = []
                for c in g.columns:
                    a, b = gs[c].astype(str), es[c].astype(str)
                    bad = (a != b)
                    if bad.any():
                        i = bad.idxmax()
                        diffs.append(f"{c}[{i}]: got={a[i]} exp={b[i]} ({int(bad.sum())} diffs)")
                r["first_diffs"] = diffs[:4]
        else:
            r["hash_match"] = False
        r["ok"] = r.get("schema_match") and r.get("hash_match") and len(g) == len(e)
        results[name] = r
    n_ok = sum(1 for v in results.values() if v.get("ok"))
    for name, v in results.items():
        mark = "PASS" if v.get("ok") else ("rows" if v.get("check") == "rows-only" else "FAIL")
        print(f"{mark:5} {name}: {json.dumps({k: x for k, x in v.items() if k != 'ok'}, default=str)[:400]}")
    print(f"== {n_ok}/{len(results)} full-pass")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
