"""Capture .explain("formatted") output for registered queries.

Writes plans/<round>/<query>_<tag>.txt for each named query so the
optimization round's plan claims are auditable without running Spark.

Usage: python tools/capture_plans.py <tag> [query ...]
  tag: "before" or "after" (file suffix)
Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
             SPARK_GRAFT_PLAN_DIR (default r12)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from mapreduce_server_development_spark.session import get_spark

    queries = entrymod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown: {unknown}")
        return 2
    spark = get_spark(app_name="capture-plans")
    out_dir = REPO / "plans" / os.environ.get("SPARK_GRAFT_PLAN_DIR", "r12")
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {type(e).__name__}: {e}"
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
