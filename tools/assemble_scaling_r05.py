"""Assemble SCALING_r05.json from this round's measurement artifacts.

Round-5 protocol notes baked into the output: the loop-level stage
moved to the production fetch shape (loop_http) at a 200k-page world;
EVERY harness attempt is recorded (including the pre-fix baseline and a
steal-hit attempt whose own host control read 1.435 — pathological by
the control's own measure), alongside clean same-conditions component
A/Bs. Transparency over cherry-picking: the attempts are listed in
chronological order with their host controls.
"""

import json
import sys

ATTEMPTS = [
    ("attempt1_prefix_code", "/tmp/scaling_loop_http_r05.json",
     "PRE-fix code (AQE-coalesced wave partitions): the 0.397 baseline that triggered the stage-level profile"),
    ("attempt2_postfix_steal", "/tmp/scaling_loop_http_r05b.json",
     "post-fix, but a host-steal window (pair-2 control read 1.435 — impossible >1 speedup = host state shifting mid-pair); re-run per the integrity protocol"),
    ("attempt3_postfix", "/tmp/scaling_loop_http_r05c.json",
     "post-fix re-run: pairs 2-3 read 0.668/0.666 consistently; pair 1's hi run (138 s vs 79-88 s in later pairs) was cold/steal"),
    ("attempt4_postfix", "/tmp/scaling_loop_http_r05d.json",
     "post-fix confirmation run (2 pairs)"),
]


def main() -> None:
    out = {
        "round": 5,
        "protocol": (
            "interleaved local[2]/local[8] pairs (N and 4N cores), fresh JVM per run, "
            "median pair efficiency, pure-CPU host control per pair; loop stage = "
            "loop_http (fused HTTP ladder + parse — the PRODUCTION fetch shape; the "
            "legacy join-fetch loop broadcasts the wave to the driver per round, a "
            "synthetic-harness artifact) at SPARK_GRAFT_LOOP_PAGES=200000 "
            "(285k URLs seen + 182k docs; co-partitioned seen store active)"
        ),
        "loop_http_200k_attempts": {},
        "clean_component_measurements": {
            "crawl_only_AB_postfix": {
                "local2_wall_sec": 98.9,
                "local8_wall_sec": 48.8,
                "crawl_scaling_efficiency_4x": 0.507,
                "note": "same world/binary minutes apart, nothing else on the box; "
                        "local2 is compute-bound (wall ~= crawl CPU / 2), so the hi-level gap "
                        "is per-wave scheduler barriers (~1-2 s x 9 waves) that bigger waves amortize",
            },
            "fetch_parallelism_fix_AB_local8": {
                "before_crawl_wall_sec": 58.0,
                "after_crawl_wall_sec": 48.8,
                "before_crawl_efficiency": 0.44,
                "after_crawl_efficiency": 0.51,
                "find": "wave inherited an AQE-coalesced 1-2-partition delta checkpoint; a 70k-URL "
                        "fused-fetch stage ran as 2 tasks on local[8] (16 s busy on 2 cores, 6 idle); "
                        "fixed with an explicit numbered repartition of the slim wave before the UDF",
            },
            "seen_store_AB_200k_local8": {
                "store_auto_crawl_wall_sec": 68.6,
                "store_off_crawl_wall_sec": 114.5,
                "note": "chained anti-join vs naive seen reshuffle at 285k seen rows (est16 build)",
            },
            "est_routing_fix_AB_local8": {
                "est16_crawl_wall_sec": 68.8,
                "window_crawl_wall_sec": 58.0,
                "note": "EST_WAVE_BRANCHING 16->2: ranked set is post-anti-join new_urls "
                        "(<= ~1.3x prev wave), not raw link fan-out",
            },
        },
        "stage_gates_carryover_r4": {
            "parse": 0.915,
            "http_fetch_fused": 0.948,
            "note": "code for both stages unchanged in round 5 except the fetch sleep "
                    "sentinel (no hot-path effect)",
        },
    }
    for key, path, note in ATTEMPTS:
        try:
            d = json.load(open(path))["loop_http"]
        except Exception as e:
            out["loop_http_200k_attempts"][key] = {"error": str(e)}
            continue
        out["loop_http_200k_attempts"][key] = {
            "local2_runs": d["local2"]["runs"],
            "local8_runs": d["local8"]["runs"],
            "pair_efficiencies": d["pair_efficiencies"],
            "median_efficiency": d["scaling_efficiency_4x"],
            "host_controls": [c["control_eff"] for c in d["host_control_per_pair"]],
            "note": note,
        }
    json.dump(out, open("SCALING_r05.json", "w"), indent=2)
    print("wrote SCALING_r05.json")


if __name__ == "__main__":
    main()
