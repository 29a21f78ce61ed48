"""Regenerate the golden value-hash snapshot (tests/golden_sf0.001.json).

Run after intentionally changing query semantics:
    python tools/freeze_golden.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_framework_spark.registry import all_queries  # noqa: E402
from flink_framework_spark.session import get_spark  # noqa: E402
from tests.harness import canonical_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
# excluded: trained-model queries whose exact outputs may shift with
# library versions / partitioning (covered by property tests instead)
SKIP = {"q_text_langid", "q_sim_topk_ivf"}
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "tests", "golden_sf0.001.json"
)


def main() -> None:
    spark = get_spark(app_name="freeze-golden")
    golden = {}
    for name, q in sorted(all_queries().items()):
        if name in SKIP:
            continue
        golden[name] = canonical_hash(q.fn(spark, SF_DIR).toPandas())
        print(name, golden[name]["sha256"][:12], golden[name]["rows"])
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
