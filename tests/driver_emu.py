"""Driver-emulation harness: run a queries() entry and its oracle_sql()
side-by-side on an sf dir and compare rows / schema / value-hash the way the
round driver plausibly does (sort columns by name, sort rows, hash values
WITH dtype sensitivity). Used ad-hoc while developing; not collected by
pytest (no test_ prefix).

Usage: python tests/driver_emu.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    sortable = [
        c for c in df.columns
        if not len(df) or not isinstance(df[c].iloc[0], (list, np.ndarray))
    ]
    if len(df) and sortable:
        df = df.sort_values(sortable, kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        h.update(c.encode())
        h.update(str(col.dtype).encode())
        if col.dtype == object:
            for v in col:
                h.update(repr(v).encode())
        else:
            h.update(np.ascontiguousarray(col.to_numpy()).tobytes())
    return h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    qs = entry.queries()
    sqls = entry.oracle_sql()
    if not names:
        names = [n for n in qs if n in sqls]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    for name in names:
        try:
            ray_df = canon(to_pandas(qs[name](sf_dir)))
            if name not in sqls:
                print(f"{name}: rows={len(ray_df)} (rows-only, no oracle)")
                continue
            ora_df = canon(con.execute(sqls[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            continue
        rows = len(ray_df) == len(ora_df)
        schema = list(ray_df.columns) == list(ora_df.columns)
        dtypes_eq = schema and all(
            str(ray_df[c].dtype) == str(ora_df[c].dtype) for c in ray_df.columns
        )
        hmatch = rows and schema and value_hash(ray_df) == value_hash(ora_df)
        flag = "OK " if (rows and schema and hmatch) else "BAD"
        print(
            f"{flag} {name}: rows={rows}({len(ray_df)}/{len(ora_df)}) "
            f"schema={schema} dtypes={dtypes_eq} hash={hmatch}"
        )
        if not hmatch and rows and schema:
            for c in ray_df.columns:
                if str(ray_df[c].dtype) != str(ora_df[c].dtype):
                    print(f"    dtype {c}: ray={ray_df[c].dtype} ora={ora_df[c].dtype}")
            if dtypes_eq:
                for c in ray_df.columns:
                    a, b = ray_df[c], ora_df[c]
                    if not a.equals(b):
                        neq = (a != b) & ~(a.isna() & b.isna())
                        print(f"    values {c}: {int(neq.sum())} mismatched rows")


if __name__ == "__main__":
    main()
