"""Regenerate operators/plan_golden.json — the frozen golden fixture the
plan_* oracles compare against. Run after intentionally changing planner
rules; the diff IS the review artifact.

Asserts the rows are identical across sf0.001/0.01/0.1 first: the oracle
literals must be scale-factor-invariant (the gate runs at sf0.01 but the
fixture must not silently depend on that).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from relational_to_doc_oriented_nosql_migrator_spark.operators import planops  # noqa: E402


def build(sf_dir: str) -> dict[str, list[tuple]]:
    cats = planops._scenarios(sf_dir)
    return {
        "plan_topo_order": planops.topo_rows("tpch", cats["tpch"])
        + planops.topo_rows("northwind", cats["northwind"]),
        "plan_self_ref_detect": planops.selfref_rows("tpch", cats["tpch"])
        + planops.selfref_rows("northwind", cats["northwind"])
        + planops.selfref_rows("selfref", cats["selfref"]),
        "plan_embed_or_reference": [
            r for n, c in cats.items() for r in planops.decision_rows(n, c)
        ],
        "plan_one_way_embed": planops.one_way_rows("tpch", cats["tpch"])
        + planops.one_way_rows("northwind", cats["northwind"]),
        "plan_two_way_embed": planops.two_way_rows(
            "northwind", cats["northwind"]
        ),
        "plan_referencing": [
            r for n, c in cats.items() for r in planops.referencing_rows(n, c)
        ],
        "sink_http_response": planops.http_response_rows(cats["tpch"]),
    }


def main() -> None:
    base = os.environ.get("TESTDATA_ROOT", "/root/testdata")
    per_sf = {
        sf: build(os.path.join(base, sf))
        for sf in ("sf0.001", "sf0.01", "sf0.1")
    }
    ref = per_sf["sf0.01"]
    for sf, rows in per_sf.items():
        assert rows == ref, f"plan golden differs between sf0.01 and {sf}"

    out = os.path.join(
        os.path.dirname(__file__), "..",
        "relational_to_doc_oriented_nosql_migrator_spark", "operators",
        "plan_golden.json",
    )
    with open(out, "w") as f:
        json.dump(ref, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: " + ", ".join(f"{k}={len(v)}" for k, v in ref.items()))


if __name__ == "__main__":
    main()
