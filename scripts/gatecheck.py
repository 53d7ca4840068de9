#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs the first N registry queries (insertion order = _GATE_PRIORITY) at
sf0.01, executes each oracle SQL in DuckDB over the same parquet, and
compares row count, sorted column names, and an order-insensitive
dtype-tagged value multiset — the same contract CORRECTNESS_r*.json records.

Usage: python scripts/gatecheck.py [N|name1,name2,...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("PROTEUS_GATE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _norm(v):
    # Mirrors the driver gate's dtype-tagged normalization. Applied
    # IDENTICALLY to both sides (the oracle path uses fetchall(), which
    # yields native date/datetime/int/Decimal — no pandas coercion of DATE
    # to Timestamp, BIGINT-with-NULLs to float64, or LIST to ndarray).
    # NaN maps to ("float", "NaN") on both sides — distinct from NULL.
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", round(v, 6))
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def main() -> None:
    from proteus_engine_spark.queries import REGISTRY
    from proteus_engine_spark.session import get_session

    arg = sys.argv[1] if len(sys.argv) > 1 else "50"
    if arg.isdigit():
        names = list(REGISTRY)[: int(arg)]
    else:
        names = [n.strip() for n in arg.split(",") if n.strip()]

    spark = get_session(app_name="proteus-gatecheck")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results: dict[str, dict] = {}
    n_bad = 0
    for name in names:
        entry = REGISTRY.get(name)
        if entry is None:
            results[name] = {"err": "not registered"}
            n_bad += 1
            continue
        t0 = time.perf_counter()
        try:
            sdf = entry.fn(spark, SF_DIR)
            scols = sorted(sdf.columns)
            # key=repr: row tuples can mix None with tagged tuples/strings,
            # which are not mutually orderable — repr is.
            srows = sorted(
                (tuple(_norm(r[c]) for c in scols) for r in sdf.collect()), key=repr
            )
            if entry.oracle is None:
                results[name] = {
                    "rows": len(srows),
                    "mode": "rows_only",
                    "ok": True,
                    "sec": round(time.perf_counter() - t0, 2),
                }
                print(f"  {name}: rows_only {len(srows)} rows", flush=True)
                continue
            rel = con.sql(entry.oracle)
            dcols = rel.columns
            # The driver fetches oracle results via pandas, which coerces
            # DuckDB HUGEINT/UHUGEINT to float64 (2426 -> 2426.0) and then
            # hash-mismatches against the engine's ints even when values are
            # identical. fetchall() would hide that, so fail loudly here —
            # the fix is always CAST(... AS BIGINT) in the oracle SQL.
            hugeint_cols = [
                c
                for c, t in zip(dcols, rel.types)
                if "HUGEINT" in str(t).upper()
            ]
            if hugeint_cols:
                raise ValueError(
                    f"oracle emits HUGEINT column(s) {hugeint_cols}; the driver's "
                    "pandas fetch coerces these to float64 and the hash compare "
                    "fails — CAST the column(s) AS BIGINT in the oracle SQL"
                )
            # The driver's pandas canonicalizer sort_values()-es every
            # column; LIST/STRUCT/MAP cells are unhashable/unorderable and
            # it dies with TypeError BEFORE any comparison (r8 red:
            # embedding_preprocess with vec DOUBLE[]). Fail loudly on BOTH
            # sides here — gate outputs must be scalar columns (explode
            # nested values to long form).
            nested_ocols = [
                c
                for c, t in zip(dcols, rel.types)
                if any(k in str(t).upper() for k in ("[]", "STRUCT", "MAP", "LIST"))
            ]
            if nested_ocols:
                raise ValueError(
                    f"oracle emits LIST/STRUCT/MAP column(s) {nested_ocols}; the "
                    "driver's pandas canonicalizer cannot sort nested cells and "
                    "fails before comparing — explode to scalar columns"
                )
            nested_scols = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "struct", "map")
            ]
            if nested_scols:
                raise ValueError(
                    f"Spark gate output has nested column(s) {nested_scols}; the "
                    "driver's pandas canonicalizer cannot sort nested cells — "
                    "explode to scalar columns"
                )
            ocols = sorted(dcols)
            idx = [dcols.index(c) for c in ocols]
            orows = sorted(
                (tuple(_norm(row[i]) for i in idx) for row in rel.fetchall()), key=repr
            )
            rows_match = len(srows) == len(orows)
            schema_match = scols == ocols
            hash_match = srows == orows
            ok = rows_match and schema_match and hash_match
            results[name] = {
                "rows_match": rows_match,
                "schema_match": schema_match,
                "hash_match": hash_match,
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
                "ok": ok,
                "sec": round(time.perf_counter() - t0, 2),
            }
            if not ok:
                n_bad += 1
                diff = ""
                if schema_match and not hash_match:
                    sset, oset = set(srows), set(orows)
                    only_s = list(sset - oset)[:3]
                    only_o = list(oset - sset)[:3]
                    diff = f" spark-only={only_s} oracle-only={only_o}"
                print(
                    f"✗ {name}: rows={rows_match}({len(srows)}/{len(orows)}) "
                    f"schema={schema_match} hash={hash_match}{diff}",
                    flush=True,
                )
                if not schema_match:
                    print(f"    spark cols: {scols}\n    duck  cols: {ocols}", flush=True)
            else:
                print(f"✓ {name} ({len(srows)} rows, {results[name]['sec']}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            n_bad += 1
            results[name] = {"err": f"{type(e).__name__}: {e}"}
            print(f"✗ {name}: EXCEPTION {type(e).__name__}: {e}", flush=True)
            traceback.print_exc(limit=4)

    out = REPO / "gatecheck_local.json"
    out.write_text(json.dumps(results, indent=1, default=str))
    print(f"\n{len(names) - n_bad}/{len(names)} ok -> {out}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
