"""Re-write a fixture directory with ~N row groups per parquet file.

Every driver-generated fixture is a SINGLE-row-group file, so a
full-table scan decodes on one core no matter what
``files.maxPartitionBytes`` says — the measured 0.01→0.1 scaling
ratios for scan-bound queries conflate plan cost with single-thread
decode (SCALE.md measurement notes; VERDICT r4 #5).  This writes a
copy whose files carry ~N row groups each, so local[32] can decode in
parallel the way a real cluster reads thousands of row groups:

    python scripts/make_rowgrouped_fixture.py /tmp/sf0.1_rg8 8
    python scripts/bench_scaling.py 0.1=/tmp/sf0.1_rg8

pyarrow (not DuckDB COPY) on purpose: the copy must preserve physical
types EXACTLY — events.ts is TIMESTAMP(NANOS), which a DuckDB
round-trip would silently downcast to micros and break the
``sources.readers.load`` nanos path the dtype canary pins.
"""

from __future__ import annotations

import math
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf0.1_rg8"
    n_groups = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        rows_per_group = max(1, math.ceil(tbl.num_rows / n_groups))
        pq.write_table(tbl, f"{out}/{t}.parquet",
                       row_group_size=rows_per_group,
                       # preserve the source's physical timestamp unit
                       # (events.ts is nanos) instead of coercing
                       coerce_timestamps=None)
        meta = pq.ParquetFile(f"{out}/{t}.parquet").metadata
        print(f"{t}: {tbl.num_rows} rows, {meta.num_row_groups} row groups")


if __name__ == "__main__":
    main()
