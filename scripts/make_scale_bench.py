"""Assemble SCALE_BENCH.json: bench.py runs at every scaled fixture.

The sweep records (SCALE_SWEEP*.json) prove the ANSWERS hold at scale;
this records what the SPARK side COSTS there — one bench.py subprocess
per fixture (fresh JVM each, so no cross-fixture cache bleed), medians
via bench.py's own two-pass min-of-medians machinery, assembled into
the one record SCALE.md quotes.

    python scripts/make_scale_bench.py \
        sf0.1=/root/testdata/sf0.1:1 16x=/tmp/sf_16x:16 \
        64x=/tmp/sf_64x:64 skew=/tmp/sf_skew01:1

Run on an otherwise idle box — the whole point of the record is
wall-clock multiples, and a concurrent sweep poisons every median.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT = ["sf0.1=/root/testdata/sf0.1:1", "16x=/tmp/sf_16x:16",
           "64x=/tmp/sf_64x:64", "skew=/tmp/sf_skew01:1"]


def main() -> None:
    specs = [a for a in sys.argv[1:] if "=" in a] or DEFAULT
    runs: dict[str, dict] = {}
    n_queries = None
    for spec in specs:
        label, rest = spec.split("=", 1)
        fixture, mult = rest.rsplit(":", 1)
        if not os.path.isdir(fixture):
            sys.exit(f"{label}: fixture dir {fixture!r} does not exist")
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=fixture)
        print(f"== bench.py @ {label} ({fixture}) ==", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py")],
            env=env, capture_output=True, text=True, cwd=HERE)
        if proc.returncode != 0:
            sys.exit(f"{label}: bench.py failed:\n{proc.stderr[-2000:]}")
        line = [l for l in proc.stdout.strip().splitlines()
                if l.startswith("{")][-1]
        out = json.loads(line)
        n_queries = len(out["queries"])
        runs[label] = {
            "fixture": fixture, "data_multiple": int(mult),
            "total_sec": out["value"], "total_min_sec": out["value_min"],
            "suspect": out["suspect"], "queries": out["queries"],
        }
        print(f"   total {out['value']} s (min {out['value_min']}), "
              f"suspect={out['suspect']}", flush=True)
    rec = {
        "date": datetime.date.today().isoformat(),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "note": (f"bench.py medians (two temporally-spaced passes, "
                 f"min-of-medians machinery) on an otherwise idle box; "
                 f"same {n_queries} bench queries per fixture via "
                 f"make_scaled_fixture.py with the representative "
                 f"row-group layout (~64 groups/table)"),
        "runs": runs,
    }
    evid = os.path.join(HERE, "evidence")
    os.makedirs(evid, exist_ok=True)
    with open(os.path.join(evid, "SCALE_BENCH.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote SCALE_BENCH.json")


if __name__ == "__main__":
    main()
