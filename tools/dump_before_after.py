"""Dump .explain("formatted") for the bench headliners to
plans/r14/<query>_{before|after}.txt (the r14 optimization-round
evidence the judge diff-checks plan claims against).

Usage: python tools/dump_before_after.py {before|after} [sf_dir] [names...]
Defaults: sf_dir=/root/testdata/sf0.1, names=the frozen 22-headliner list.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    assert tag.startswith(("before", "after")), \
        "tag must start with before|after (e.g. before_100x)"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or HEADLINE

    from python_etl_rest_api_spark import registry
    from python_etl_rest_api_spark.session import get_spark

    spark = get_spark("dump_plans_r14")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    from contextlib import redirect_stdout
    import io
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
