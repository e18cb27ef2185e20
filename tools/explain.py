"""Dump the executed physical plan of any registered query. Usage:

    python tools/explain.py <query_name> [sf_dir]

Prints the formatted plan — the audit loop behind PLANS.md."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from music_database_spark.registry import load_all  # noqa: E402
from music_database_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        print("registered:", ", ".join(sorted(load_all())))
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spec = load_all()[name]
    spark = get_spark("explain")
    df = spec.build(spark, sf_dir)
    df.explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
