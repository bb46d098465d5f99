"""Dump `.explain("formatted")` for a list of registered queries into a
directory, one file per query, from a single Spark session.

Usage: python tools/explain_batch.py <out_dir> <suffix> <query> [query ...]
  suffix: appended to the filename, e.g. "before" -> <out_dir>/<query>_before.txt

Used to produce the plans/r12/ before/after evidence: run once from a
worktree checked out at the pre-round commit (suffix "before") and once
at HEAD (suffix "after").
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 1
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from _imdb_etl_spark.plans import REGISTRY
    from _imdb_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"explain_batch_{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in REGISTRY:
            print(f"SKIP {name}: not registered")
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = REGISTRY[name].spark(spark, sf_dir)
            buf = io.StringIO()
            stdout = sys.stdout
            sys.stdout = buf
            try:
                df.explain(mode="formatted")
            finally:
                sys.stdout = stdout
            with open(path, "w") as f:
                f.write(f"-- {name} ({suffix}) @ {sf_dir}\n")
                f.write(f"-- {REGISTRY[name].doc}\n\n")
                f.write(buf.getvalue())
            print(f"OK   {name} -> {path}")
        except Exception as exc:  # noqa: BLE001 - record and continue
            with open(path, "w") as f:
                f.write(f"-- {name} ({suffix}) FAILED TO BUILD: {exc}\n")
            print(f"FAIL {name}: {exc}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
