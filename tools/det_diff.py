#!/usr/bin/env python3
"""Order-insensitive determinism diff between two graft.Verify out dirs.

Usage: det_diff.py DIR_A DIR_B

For every query parquet in DIR_A: read both sides with DuckDB, sort
columns by name and rows by every value (NULLS FIRST), hash the rendered
rows, compare. Exit nonzero listing any query whose hash differs or that
is missing on either side. This is the partition-count determinism gate:
run Verify at SPARK_GRAFT_CPUS=3 and =32 into two dirs and diff — catches
spark_partition_id / accumulation-order / LIMIT-tie dependence.
"""
import duckdb
import os
import sys


def row_hash(con, pq_glob: str):
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{pq_glob}')").fetchall()]
    sel = ", ".join(f'"{c}"' for c in sorted(cols))
    # NULL-preserving render: concat_ws SKIPS nulls, so (NULL,'x') and
    # ('x',NULL) would hash identically — exactly the nullable-column
    # nondeterminism this gate exists to catch
    rend = ", ".join(
        f"coalesce(cast(\"{c}\" AS VARCHAR), chr(30) || 'NULL')"
        for c in sorted(cols))
    order = ", ".join(f'"{c}" NULLS FIRST' for c in sorted(cols))
    q = (f"SELECT md5(coalesce(string_agg(rw, chr(10) ORDER BY rw), '')), "
         f"count(*) FROM (SELECT concat_ws(chr(31), {rend}) rw "
         f"FROM (SELECT {sel} FROM read_parquet('{pq_glob}') "
         f"ORDER BY {order}))")
    h, n = con.execute(q).fetchone()
    return sorted(cols), h, n


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    names = sorted(d for d in os.listdir(a_dir)
                   if os.path.isdir(os.path.join(a_dir, d)))
    if not names:
        print(f"no query outputs under {a_dir}", file=sys.stderr)
        return 2
    con = duckdb.connect()
    bad = []
    for n in names:
        b_path = os.path.join(b_dir, n)
        if not os.path.isdir(b_path):
            bad.append((n, "missing in B"))
            continue
        # a half-written/empty query dir must report as a DIFF line, not
        # abort the whole comparison with a traceback
        try:
            ca, ha, na = row_hash(con, os.path.join(a_dir, n, "*.parquet"))
            cb, hb, nb = row_hash(con, os.path.join(b_dir, n, "*.parquet"))
        except Exception as e:  # noqa: BLE001 - per-query isolation
            bad.append((n, f"unreadable: {e}"))
            continue
        if ca != cb:
            bad.append((n, f"schema {ca} != {cb}"))
        elif na != nb:
            bad.append((n, f"rows {na} != {nb}"))
        elif ha != hb:
            bad.append((n, "hash mismatch"))
    extra = sorted(set(d for d in os.listdir(b_dir)
                       if os.path.isdir(os.path.join(b_dir, d)))
                   - set(names)) if os.path.isdir(b_dir) else []
    for n in extra:
        bad.append((n, "missing in A"))
    for n, why in bad:
        print(f"DIFF {n}: {why}")
    print(f"{len(names) - len([b for b in bad if 'missing in A' not in b[1]])}"
          f"/{len(names)} outputs hash-identical")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
