"""Clean-window collector for the north-rule N→4N scaling evidence.

The sandbox shares its host: neighbor load corrupts wall-clock
measurements (ambient single-thread throughput swings 40×). This
watcher loops until it has accumulated ``TARGET_ROUNDS`` *clean*
interleaved local[1]-vs-local[4] build rounds — a round is clean iff
the ambient probe before AND after it clears ``AMBIENT_MIN`` and the
1-min loadavg before it is quiet (no foreground job of ours running).
Results (all rounds, clean subset, medians, hw ceilings) stream to
``OUT`` as they arrive so a partial run is still evidence.

Usage: python scripts/scaling_watch.py [out.json]
State: /tmp/scaling_watch_state is "waiting" | "measuring" | "done"
(the interactive session checks it before launching heavy jobs).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py; main() is guarded)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/BENCH_r05_local.json"
STATE = "/tmp/scaling_watch_state"
TARGET_ROUNDS = int(os.environ.get("SCALING_WATCH_TARGET", "5"))
AMBIENT_MIN = 10.0      # sorts/s; healthy ≈ 20-40, storms < 1
LOAD_MAX = 2.0          # our own fg jobs push loadavg >> this
PAIR = (1, 4)
MAX_WALL = float(os.environ.get("SCALING_WATCH_MAX_S", 4 * 3600))


def _state(s: str) -> None:
    with open(STATE, "w") as f:
        f.write(s)


def _ambient(secs: float = 1.0) -> float:
    import numpy as np
    a = np.random.RandomState(0).randint(0, 1 << 40, 2_000_000)
    t0 = time.time()
    k = 0
    while time.time() - t0 < secs:
        np.sort(a)
        k += 1
    return round(k / (time.time() - t0), 1)


def _median(xs):
    srt = sorted(xs)
    m = len(srt) // 2
    return srt[m] if len(srt) % 2 else (srt[m - 1] + srt[m]) / 2


def main() -> None:
    n, n4 = PAIR
    partitions = 8 * bench.CPUS
    n_tasks = max(32, 4 * n4)
    rounds: list[dict] = []
    if os.path.exists(OUT):  # resume: keep rounds already collected,
        try:                 # re-grading them against current gates
            with open(OUT) as f:
                rounds = json.load(f).get("rounds", [])
            for r in rounds:
                if r.get("clean"):
                    r["clean"] = (
                        r.get("ambient_before", 0) >= AMBIENT_MIN
                        and r.get("ambient_after", 0) >= AMBIENT_MIN
                        and r.get("load_before", 99) <= LOAD_MAX
                        and r.get("load_after", 0) <= LOAD_MAX + n + n4)
        except Exception:
            pass
    t_start = time.time()
    while (sum(r["clean"] for r in rounds) < TARGET_ROUNDS
           and time.time() - t_start < MAX_WALL):
        amb0 = _ambient()
        load1 = os.getloadavg()[0]
        if amb0 < AMBIENT_MIN or load1 > LOAD_MAX:
            _state(f"waiting ambient={amb0} load={load1:.1f} "
                   f"clean={sum(r['clean'] for r in rounds)}")
            time.sleep(45)
            continue
        _state(f"measuring clean={sum(r['clean'] for r in rounds)}")
        # multicore probe: single-thread ambient is blind to neighbor
        # contention on the other vCPUs (round-5 finding, BENCH.md) —
        # record 4-way efficiency so readers can grade the window for
        # the 4-core side of the pair too (recorded, not gated: the
        # gates' thresholds were fixed before the r5 artifact)
        rnd = {"ambient_before": amb0, "load_before": round(load1, 2),
               "multicore_eff4_before": round(
                   bench._multicore_ambient(4, amb0), 2)}
        try:
            m1 = bench.build_at(n, partitions, f"w{n}", reps=1,
                                num_tasks=n_tasks)
            m4 = bench.build_at(n4, partitions, f"w{n4}", reps=1,
                                num_tasks=n_tasks)
        except Exception as e:  # session hiccup: log and move on
            rnd.update({"err": repr(e)[:300], "clean": False})
            rounds.append(rnd)
            continue
        amb1 = _ambient()
        load2 = os.getloadavg()[0]
        eff = (m4["docs_per_sec"] / m1["docs_per_sec"]) / (n4 / n)
        rnd.update({
            "ambient_after": amb1,
            "load_after": round(load2, 2),
            "docs": m1["docs"],
            "docs_per_sec_n": m1["docs_per_sec"],
            "docs_per_sec_4n": m4["docs_per_sec"],
            "build_sec_n": m1["build_sec"],
            "build_sec_4n": m4["build_sec"],
            "udf_task_sec_mean_n": m1["udf_task_sec_mean"],
            "udf_task_sec_mean_4n": m4["udf_task_sec_mean"],
            "efficiency": round(eff, 3),
            "clean": (amb0 >= AMBIENT_MIN and amb1 >= AMBIENT_MIN
                      and load2 < LOAD_MAX + n + n4),
        })
        if rnd["clean"]:  # hw ceiling sampled in the same clean window
            rnd.update(bench.hw_ceiling(n, n4))
        rounds.append(rnd)
        clean = [r["efficiency"] for r in rounds if r.get("clean")]
        allr = [r["efficiency"] for r in rounds if "efficiency" in r]
        hw_stream = [r["hw_stream_efficiency"] for r in rounds
                     if r.get("hw_stream_efficiency") is not None]
        with open(OUT, "w") as f:
            json.dump({
                "pair": {"n_cores": n, "4n_cores": n4,
                         "num_tasks": n_tasks,
                         "partitions": partitions,
                         "replicate": bench.REPLICATE},
                "target": 0.8,
                "efficiency_median_clean": (round(_median(clean), 3)
                                            if clean else None),
                "efficiency_median_all": (round(_median(allr), 3)
                                          if allr else None),
                "clean_rounds": len(clean),
                "hw_stream_efficiency": (round(max(hw_stream), 3)
                                         if hw_stream else None),
                "rounds": rounds,
                "note": ("clean = ambient single-thread probe >= "
                         f"{AMBIENT_MIN}/s before AND after the round "
                         "and 1-min loadavg quiet before+after it; "
                         "medians over the clean subset are the "
                         "headline; hw_stream_efficiency = box's own "
                         "pure-CPU stream-sort scaling ceiling, max "
                         "over per-clean-round samples (steal during "
                         "a sample can only lower it)"),
            }, f, indent=1)
    _state("done")


if __name__ == "__main__":
    main()
