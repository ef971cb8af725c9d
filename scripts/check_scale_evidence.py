"""Assert the repo's scale-correctness evidence is green AND quoted
fresh in SCALE.md — one command for the verify recipe instead of a
growing pile of inline snippets (r4 lesson: evidence records go stale
silently while the unit/oracle suites stay green).

Checks every SCALE_SWEEP*.json under evidence/ (the records moved off
the repo root in r7; SCALE.md carries the index):

- ``n_failed == 0`` (a recorded failure is a red build, full stop);
- SCALE.md cites the record by filename (so a new record can't land
  without the prose that says what it proves);
- the untagged SCALE_SWEEP.json (the authoritative 4x full sweep)
  keeps the exact "N of the M" claim SCALE.md quotes.

Exit 0 with a one-line summary per record, exit 1 with the reason
otherwise.
"""

from __future__ import annotations

import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVID = os.path.join(HERE, "evidence")


def _check_multiple_table(md: str, bench: dict) -> list[str]:
    """Cross-check the per-query multiples SCALE.md's 64×-multiple
    table quotes against the numbers SCALE_BENCH.json actually
    recorded (VERDICT r9 #5: two stale prose numbers survived every
    suite because the guard never parsed the tables).  Also flags a
    query quoted twice with different values — the exact duplicate-row
    class r9 shipped.  Tolerance ±0.15 absorbs display rounding."""
    import re

    probs: list[str] = []
    runs = bench.get("runs", {})
    base = runs.get("sf0.1", {}).get("queries", {})
    top = runs.get("64x", {}).get("queries", {})
    if not base or not top:
        return probs
    m = re.search(r"\| *64×-data multiple *\| *queries *\|(.*?)\n\n",
                  md, re.S)
    if not m:
        # ADVICE r10: a silent no-match would disengage this guard the
        # moment the table heading drifts — both runs exist, so the
        # table MUST be parseable
        probs.append(
            "SCALE.md 64x-multiple table not found (heading drifted or "
            "table not followed by a blank line) while SCALE_BENCH.json "
            "has both sf0.1 and 64x runs — the stale-prose guard is "
            "disengaged")
        return probs
    quoted: dict[str, list[float]] = {}
    for name, val in re.findall(r"([a-z][a-z0-9_]+) (\d+(?:\.\d+)?)",
                                m.group(1)):
        if name in top:
            quoted.setdefault(name, []).append(float(val))
    for name, vals in quoted.items():
        if len(set(vals)) > 1:
            probs.append(f"SCALE.md 64x table quotes {name} with "
                         f"conflicting multiples {sorted(set(vals))}")
        if base.get(name):
            actual = top[name] / base[name]
            for v in vals:
                if abs(v - actual) > 0.15:
                    probs.append(
                        f"SCALE.md 64x table quotes {name}={v} but "
                        f"SCALE_BENCH.json says {actual:.1f} "
                        f"({top[name]}/{base[name]})")
    print(f"SCALE.md 64x-multiple table: {len(quoted)} quoted queries "
          f"cross-checked against SCALE_BENCH.json")
    return probs


def main() -> None:
    md = open(os.path.join(HERE, "SCALE.md")).read()
    records = sorted(glob.glob(os.path.join(EVID, "SCALE_SWEEP*.json")))
    if not records:
        sys.exit("no SCALE_SWEEP*.json records found")
    bad = []
    # a record at the repo root is a write from pre-r7 tooling (or an
    # in-flight sweep started before the move).  It is an ERROR, not a
    # note: a stale root duplicate sharing its basename with the
    # evidence/ copy would otherwise pass the SCALE.md citation check
    # and count as green evidence (ADVICE r7) — and it is NOT added to
    # the checked record set.
    for s in sorted(glob.glob(os.path.join(HERE, "SCALE_SWEEP*.json"))):
        bad.append(f"{os.path.basename(s)}: sits at the repo root — "
                   f"move it under evidence/ (root strays are not "
                   f"counted as evidence)")
    for path in records:
        name = os.path.basename(path)
        rec = json.load(open(path))
        n_total = rec["n_ok"] + rec["n_failed"] + len(rec["skipped"])
        if rec["n_failed"]:
            bad.append(f"{name}: {rec['n_failed']} failed: {rec['failed']}")
        if f"`{name}`" not in md and name not in md:
            bad.append(f"{name}: not cited in SCALE.md")
        if name == "SCALE_SWEEP.json":
            claim = f"{rec['n_ok']} of the {n_total}"
            if claim not in md:
                bad.append(f"SCALE.md does not quote the last full sweep "
                           f"({claim})")
        print(f"{name}: {rec['n_ok']}/{n_total} ok "
              f"(subset={rec.get('subset', 'full')}, "
              f"fixture={rec['fixture']})")
    # the Spark-side throughput record (SCALE_BENCH.json, r6) is not a
    # sweep — no pass/fail — but the same staleness rule applies: if it
    # exists it must be cited in SCALE.md next to the numbers it backs
    tput = os.path.join(EVID, "SCALE_BENCH.json")
    if os.path.exists(tput):
        if "SCALE_BENCH.json" not in md:
            bad.append("SCALE_BENCH.json: not cited in SCALE.md")
        else:
            rec = json.load(open(tput))
            print(f"SCALE_BENCH.json: {len(rec['runs'])} fixture runs "
                  f"({', '.join(rec['runs'])})")
            bad += _check_multiple_table(md, rec)
    sbench = os.path.join(EVID, "STREAM_BENCH.json")
    if os.path.exists(sbench):
        rec = json.load(open(sbench))
        if not rec.get("streamed_equals_batch"):
            bad.append("STREAM_BENCH.json: streamed != batch (red record)")
        if "STREAM_BENCH.json" not in md:
            bad.append("STREAM_BENCH.json: not cited in SCALE.md")
        else:
            rocks = rec.get("scenarios_rocksdb")
            skew = rec.get("scenarios_skew")
            print(f"STREAM_BENCH.json: {rec['rows']} rows, "
                  f"{rec['rows_per_sec_wall']} rows/s wall, "
                  f"stream==batch {rec['streamed_equals_batch']}, "
                  f"rocksdb={'yes' if rocks else 'no'}, "
                  f"skew={'yes' if skew else 'no'}")
    # r7 artifacts under the same staleness rule: if they exist, SCALE.md
    # must cite them next to the numbers they back (content-level floors
    # are asserted by tests/test_recall_evidence.py for RECALL.json)
    recall = os.path.join(EVID, "RECALL.json")
    if os.path.exists(recall):
        rec = json.load(open(recall))
        if "RECALL.json" not in md:
            bad.append("RECALL.json: not cited in SCALE.md")
        else:
            print(f"RECALL.json: {len(rec['fixtures'])} fixtures, "
                  f"k={rec['k']}, {len(rec['ann_variants'])} ANN variants")
    ann = os.path.join(EVID, "ANN_SCALING.json")
    if os.path.exists(ann):
        rec = json.load(open(ann))
        if "ANN_SCALING.json" not in md:
            bad.append("ANN_SCALING.json: not cited in SCALE.md")
        else:
            legs = rec.get("legs", [])
            miss = [l["label"] for l in legs if not l.get("floor_reached")
                    and l["kind"] == "clustered"]
            if miss:
                bad.append(f"ANN_SCALING.json: clustered legs below the "
                           f"recall floor: {miss}")
            print(f"ANN_SCALING.json: {len(legs)} (fixture, k_cells) "
                  f"legs, floor {rec.get('recall_floor')}")
    # BENCH_CONSEC freshness (VERDICT r10 #7): the consecutive-pair
    # noise-band evidence must be regenerated every round — a prior
    # round's pair says nothing about this round's box or roster.  The
    # newest BENCH_CONSEC_r{N} must be at least as new as the newest
    # official BENCH_r{N} artifact.
    import re as _re

    def _rounds(pattern: str, where: str) -> list[int]:
        return sorted(
            int(m.group(1)) for p in glob.glob(os.path.join(where, pattern))
            if (m := _re.search(r"_r(\d+)\.json$", p)))
    consec = _rounds("BENCH_CONSEC_r*.json", EVID)
    official = _rounds("BENCH_r*.json", HERE)
    if official and not consec:
        bad.append("no BENCH_CONSEC_r*.json under evidence/ — run "
                   "scripts/bench_consec.py")
    elif consec and official and consec[-1] < official[-1]:
        bad.append(f"BENCH_CONSEC_r{consec[-1]:02d} is staler than "
                   f"BENCH_r{official[-1]:02d} — regenerate the "
                   f"consecutive pair for this round "
                   f"(scripts/bench_consec.py)")
    elif consec:
        print(f"BENCH_CONSEC: newest r{consec[-1]:02d} "
              f"(official bench newest r{official[-1] if official else 0:02d})")
    rocks = os.path.join(EVID, "ROCKSDB_COUNTJOIN.json")
    if os.path.exists(rocks):
        rec = json.load(open(rocks))
        if "ROCKSDB_COUNTJOIN.json" not in md:
            bad.append("ROCKSDB_COUNTJOIN.json: not cited in SCALE.md")
        else:
            runs = rec["runs"]
            print(f"ROCKSDB_COUNTJOIN.json: hdfs {runs['hdfs']['wall_s']}s "
                  f"vs rocksdb {runs['rocksdb']['wall_s']}s "
                  f"(changelog {runs['rocksdb_changelog']['wall_s']}s)")
    bbench = os.path.join(EVID, "BUCKET_BENCH.json")
    if os.path.exists(bbench):
        rec = json.load(open(bbench))
        if "BUCKET_BENCH.json" not in md:
            bad.append("BUCKET_BENCH.json: not cited in SCALE.md")
        else:
            print(f"BUCKET_BENCH.json: {rec['fixture']} "
                  f"{rec['join_sec_unbucketed']}s -> "
                  f"{rec['join_sec_bucketed']}s bucketed")
    pdec = os.path.join(EVID, "PACKING_DECOMP.json")
    if os.path.exists(pdec):
        rec = json.load(open(pdec))
        if "PACKING_DECOMP.json" not in md:
            bad.append("PACKING_DECOMP.json: not cited in SCALE.md")
        else:
            c = rec["conclusion"]
            if c["num_shards_moves_wall"]:
                bad.append("PACKING_DECOMP.json: num_shards moved the wall "
                           ">1.5x — SCALE.md's packing-note attribution "
                           "(regex, not window) no longer holds; re-derive")
            print(f"PACKING_DECOMP.json: tokenize {c['tokenize_frac_of_full']}"
                  f" / window {c['window_frac_of_full']} of full wall, "
                  f"32-split cpu inflation {c['split32_cpu_inflation']}x, "
                  f"tokenizer speedup {c.get('tokenizer_speedup', 'n/a')}x")
    if bad:
        sys.exit("STALE/RED scale evidence:\n  " + "\n  ".join(bad))
    print(f"scale evidence fresh: {len(records)} records, all green, "
          f"all cited in SCALE.md")


if __name__ == "__main__":
    main()
