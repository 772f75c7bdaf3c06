"""One-off: find registered queries whose optimized logical plan has a
Window with an empty partitionSpec over a non-limited input."""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tlmc_etl_spark.session import get_spark
from tlmc_etl_spark.plans import QUERIES


def subtree_has_limit(node) -> bool:
    stack = [node]
    while stack:
        n = stack.pop()
        name = n.getClass().getSimpleName()
        if name in ("GlobalLimit", "LocalLimit"):
            return True
        ch = n.children()
        for i in range(ch.length()):
            stack.append(ch.apply(i))
    return False


def spec_is_global(node) -> bool:
    """Empty partitionSpec, or the bounded_one_partition pmod(key, 1)
    idiom — constant for every row, counted as global so it cannot be
    used to evade the lint."""
    import re

    spec = node.partitionSpec()
    if spec.isEmpty():
        return True
    exprs = [spec.apply(i).toString() for i in range(spec.length())]
    return all(re.match(r"^pmod\(.*, 1\)$", e) for e in exprs)


def global_windows(plan):
    out = []
    stack = [plan]
    while stack:
        n = stack.pop()
        name = n.getClass().getSimpleName()
        if name == "Window" and spec_is_global(n):
            bounded = subtree_has_limit(n.child())
            out.append((bounded, n.simpleString(200)))
        ch = n.children()
        for i in range(ch.length()):
            stack.append(ch.apply(i))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "8")
    spark = get_spark("lint-windows")
    spark.sparkContext.setLogLevel("ERROR")
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().optimizedPlan()
            wins = global_windows(plan)
            unbounded = [w for w in wins if not w[0]]
            if unbounded:
                print(f"LINT {name}: {len(unbounded)} unbounded global window(s)")
                for _, s in unbounded:
                    print(f"    {s[:160]}")
        except Exception as e:
            print(f"ERR {name}: {type(e).__name__}: {e}")
            traceback.print_exc(limit=2)


if __name__ == "__main__":
    main()
