"""Dump ``explain("formatted")`` for bench/registry queries into
``plans/<tag>/<name>_<suffix>.txt`` so plan-shape claims in
OPTIMIZATION notes can be checked without running Spark.

Usage:
    python tools/capture_plans.py <tag> <suffix> [name1,name2,...]

With no name list, captures every headline query. The suffix is
typically ``before`` or ``after``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import contextlib  # noqa: E402
import io  # noqa: E402

from sqlpp_spark.ops import release_intermediates  # noqa: E402
from sqlpp_spark.queries import REGISTRY, _ensure_loaded, headline_queries  # noqa: E402
from sqlpp_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r19"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if len(sys.argv) > 3:
        _ensure_loaded()  # explicit names need the full registry loaded
        names = [s.strip() for s in sys.argv[3].split(",") if s.strip()]
        specs = {n: REGISTRY[n] for n in names}
    else:
        specs = headline_queries()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("sqlpp_spark_plans")
    for name, spec in specs.items():
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        df = None
        try:
            df = spec.builder(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # keep going; record the failure
            plan = f"ERROR capturing plan: {e}\n"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
        if df is not None:
            release_intermediates(df)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
