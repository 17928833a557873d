"""Capture .explain("formatted") for headline queries into plans/r11/.

Usage: python scripts/plans_r11.py [before|after] [query ...]
Writes plans/r11/<query>_<tag>.txt for each named query (default: all
bench HEADLINE queries). SF dir from $SPARK_GRAFT_SF_DIR (default sf0.1
— the bench scale, so plan claims match the measured configuration).
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

# import from THIS script's repo root (works from a baseline worktree
# too — plans always land in /root/repo/plans/r11)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from neural_search_spark import registry  # noqa: E402
from neural_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plans-r11")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join("/root/repo", "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = registry.SPARK_QUERIES.get(name)
        if fn is None:
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, sf).explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
