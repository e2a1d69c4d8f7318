"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side via DuckDB, compare row count + schema +
order-insensitive values (floats rounded like the driver hashes them).

Usage: python tools/check_gate.py [sf_dir] [--only name1,name2]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _worker_setup():
    """worker_process_setup_hook: mute Ray Data's per-block "Failed to hash
    the schemas" warning in every worker — see bench.py's twin for why."""
    import logging

    class _F(logging.Filter):
        def filter(self, record):
            return "Failed to hash the schemas" not in record.getMessage()

    logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").addFilter(_F())




def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: set[str] | None = None) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
            runtime_env={"worker_process_setup_hook": _worker_setup},
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            eng = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: engine raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        wall = time.monotonic() - t0
        if name not in oracles:
            print(f"ok-rows-only {name}: {len(eng)} rows ({wall:.1f}s)")
            continue
        try:
            ora = canon(con.execute(oracles[name]).df())
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if list(eng.columns) != list(ora.columns):
            print(f"FAIL {name}: columns {list(eng.columns)} vs {list(ora.columns)}")
            n_fail += 1
            continue
        if len(eng) != len(ora):
            print(f"FAIL {name}: rows {len(eng)} vs {len(ora)}")
            n_fail += 1
            continue
        if not eng.equals(ora):
            neq = (eng != ora).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(eng)} mismatched rows; first:")
            print(pd.concat([eng[neq].head(3), ora[neq].head(3)], keys=["eng", "ora"]))
            n_fail += 1
            continue
        print(f"OK   {name}: {len(eng)} rows match ({wall:.1f}s)")
    print(f"\n{len(qs) - n_fail}/{len(qs)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    sf = argv[0] if argv else "/root/testdata/sf0.001"
    raise SystemExit(main(sf, only))
