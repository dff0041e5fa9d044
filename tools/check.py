#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the parquet
tables in <sfDir>, and compares: column names (sorted), row count,
RESULT TYPES (Spark parquet schema vs DuckDB Arrow schema — the driver's
hash is type-sensitive, so a DuckDB HUGEINT sum vs a Spark BIGINT is a
red row even when every value matches), and values (rows sorted by all
columns). Exit 0 iff everything matches.

`--selftest` builds an un-cast-SUM fixture (DuckDB SUM(BIGINT) →
HUGEINT vs a Spark-style int64 parquet) and asserts the gate goes red.
"""
import json
import math
import sys
import tempfile
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def canon_type(t: pa.DataType) -> str:
    """Canonical type label: collapses representation-only differences
    (string vs large_string, dictionary encoding) but keeps the
    distinctions a value hash can see: int width, int vs decimal
    (DuckDB HUGEINT exports as decimal128(38,0)), DECIMAL precision
    AND scale (str(t) carries both — "1.500000" vs "1.5000000000"
    hash apart), and the TIMESTAMP unit + tz-awareness (an us vs ns
    epoch integer, or naive vs UTC-aware, renders differently). No
    registered query outputs timestamps/decimals today (the oracle
    determinism rules cast to BIGINT/INT/DOUBLE/STRING), so this
    strictness costs nothing now and catches the drift class the day
    one does."""
    if pa.types.is_dictionary(t):
        return canon_type(t.value_type)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]" + ("+tz" if t.tz else "")
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{canon_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def schema_map(schema: pa.Schema) -> dict:
    return {f.name: canon_type(f.type) for f in schema}


def spark_parquet_schema(pdir: Path) -> pa.Schema:
    files = sorted(pdir.glob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet part files under {pdir}")
    return pq.read_schema(files[0])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cmp_cell(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf  # exact: determinism is part of the contract
    return str(a) == str(b)


def selftest() -> None:
    """Red-test the type gate: a Spark-style int64 result vs a bare
    DuckDB SUM(BIGINT) (→ HUGEINT → decimal128(38,0)) must FAIL, and
    the CAST'd variant must PASS — the exact q42 bug class."""
    with tempfile.TemporaryDirectory() as tmp:
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1, 10),"
                    " (1, 20), (2, 5)) v(g, x)")
        spark_like = pa.table({"g": pa.array([1, 2], pa.int32()),
                               "sum_x": pa.array([30, 5], pa.int64())})
        pdir = Path(tmp) / "q"
        pdir.mkdir()
        pq.write_table(spark_like, pdir / "part-0.parquet")
        got_schema = schema_map(spark_parquet_schema(pdir))
        bare = con.execute(
            "SELECT g, SUM(CAST(x AS BIGINT)) AS sum_x FROM t GROUP BY g"
        ).arrow()
        cast = con.execute(
            "SELECT g, CAST(SUM(CAST(x AS BIGINT)) AS BIGINT) AS sum_x"
            " FROM t GROUP BY g").arrow()
        drift_bare = {c for c in got_schema
                      if got_schema[c] != schema_map(bare.schema).get(c)}
        drift_cast = {c for c in got_schema
                      if got_schema[c] != schema_map(cast.schema).get(c)}
        assert "sum_x" in drift_bare, \
            f"gate MISSED un-cast SUM drift: {schema_map(bare.schema)}"
        assert not drift_cast, f"gate false-positive on CAST'd SUM: {drift_cast}"

        # --- DECIMAL-scale drift: same precision, different scale must
        # go red (equal numeric values render "1.500000" vs
        # "1.5000000000" under a scale-faithful formatter) ---
        import decimal as _dec
        spark_dec = pa.table({"v": pa.array(
            [_dec.Decimal("1.500000")], pa.decimal128(18, 6))})
        ddir = Path(tmp) / "d"
        ddir.mkdir()
        pq.write_table(spark_dec, ddir / "part-0.parquet")
        dec_schema = schema_map(spark_parquet_schema(ddir))
        wide = con.execute(
            "SELECT CAST(1.5 AS DECIMAL(18,10)) AS v").arrow()
        same = con.execute(
            "SELECT CAST(1.5 AS DECIMAL(18,6)) AS v").arrow()
        assert dec_schema["v"] != schema_map(wide.schema)["v"], \
            f"gate MISSED decimal-scale drift: {dec_schema} vs " \
            f"{schema_map(wide.schema)}"
        assert dec_schema["v"] == schema_map(same.schema)["v"], \
            "gate false-positive on scale-matched DECIMAL"

        # --- TIMESTAMP-unit drift: a ns-unit Spark column vs DuckDB's
        # us export must go red (epoch integers differ by 1000x under
        # an integer hash), and tz-awareness must not be collapsed ---
        import datetime as _dt
        t0 = _dt.datetime(2026, 1, 1, 12, 0, 0)
        spark_ns = pa.table({"ts": pa.array([t0], pa.timestamp("ns"))})
        tdir = Path(tmp) / "ts"
        tdir.mkdir()
        pq.write_table(spark_ns, tdir / "part-0.parquet",
                       coerce_timestamps=None)
        ts_schema = schema_map(spark_parquet_schema(tdir))
        duck_us = con.execute(
            "SELECT TIMESTAMP '2026-01-01 12:00:00' AS ts").arrow()
        assert ts_schema["ts"] != schema_map(duck_us.schema)["ts"], \
            f"gate MISSED timestamp-unit drift: {ts_schema} vs " \
            f"{schema_map(duck_us.schema)}"
        spark_us = pa.table({"ts": pa.array([t0], pa.timestamp("us"))})
        udir = Path(tmp) / "tsu"
        udir.mkdir()
        pq.write_table(spark_us, udir / "part-0.parquet")
        assert schema_map(spark_parquet_schema(udir))["ts"] == \
            schema_map(duck_us.schema)["ts"], \
            "gate false-positive on unit-matched naive TIMESTAMP"
        tz_aware = con.execute(
            "SELECT TIMESTAMPTZ '2026-01-01 12:00:00+00' AS ts").arrow()
        assert schema_map(spark_parquet_schema(udir))["ts"] != \
            schema_map(tz_aware.schema)["ts"], \
            "gate MISSED tz-awareness drift"
    print("SELFTEST PASS: un-cast SUM, DECIMAL-scale, timestamp-unit, "
          "and tz-awareness drifts all go red; matched types stay green")


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = Path(out_dir) / name
        if not pdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got_schema = schema_map(spark_parquet_schema(pdir))
            want_tbl = con.execute(sql).arrow()
            want_schema = schema_map(want_tbl.schema)
            got = norm(pd.read_parquet(pdir))
            want = norm(want_tbl.to_pandas())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        type_drift = {c: (got_schema.get(c), want_schema.get(c))
                      for c in got.columns
                      if got_schema.get(c) != want_schema.get(c)}
        if type_drift:
            print(f"FAIL {name}: type drift (spark vs duckdb): {type_drift}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = None
        for col in got.columns:
            ga, wa = got[col].tolist(), want[col].tolist()
            for i, (a, b) in enumerate(zip(ga, wa)):
                if not cmp_cell(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"FAIL {name}: value mismatch col={col} row={i}: spark={a!r} duckdb={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # queries without oracle: rows-only note
    for p in sorted(Path(out_dir).iterdir()):
        if p.is_dir() and p.name not in oracle:
            print(f"NOTE {p.name}: no oracle (rows-only check)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
