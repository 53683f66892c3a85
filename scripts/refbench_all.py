"""Run the full reference-binary head-to-head suite and write REFBENCH.json.

Round-5 protocol (VERDICT r4 #3 + #5): every scene family including the
edge-sparse fill-in family, PLUS 300-400-frame long-run families with
multiple keyframe promotions (orbit + pan mixes) — ATE **and** RPE for
both systems (the reference's own acceptance protocol is both,
/root/reference/README.md:57), keyframe counts for both.

Each family runs scripts/refbench.py in a subprocess (CPU, f32); rows are
collected into REFBENCH.json at the repo root.

    timeout 7000 python scripts/refbench_all.py
"""
import datetime
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAMILIES = [
    # (family, n_frames)
    ("plane", 24),
    ("plane", 100),
    ("box", 24),
    ("column", 24),
    ("box_noisy", 24),
    ("fastpan", 30),
    ("sparse", 24),
    ("distorted", 24),
    # Long-run families: multi-promotion trajectories where drift and
    # keyframe cadence differentiate (reference keyframe machinery:
    # tracker.cpp:110-223).
    ("plane", 400),
    ("orbit", 300),
    ("panmix", 300),
]


def main():
    rows = []
    for family, n in FAMILIES:
        print(f"=== {family} n={n} ===", flush=True)
        lines = []
        for attempt in range(2):
            r = subprocess.run(
                [sys.executable,
                 os.path.join(HERE, "scripts", "refbench.py"),
                 str(n), family],
                capture_output=True, text=True, timeout=4000, cwd=HERE,
            )
            lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if lines:
                break
            # The reference's producer thread can starve under host
            # contention and hang past its timeout (observed: fastpan-30
            # timing out at 900 s, then finishing in 0.66 s on retry) —
            # one retry covers the transient.
            print(f"attempt {attempt + 1} failed, retrying: "
                  f"{r.stderr[-300:]}", flush=True)
        if not lines:
            print(f"FAILED: {r.stderr[-800:]}", flush=True)
            rows.append({"family": family, "n_frames": n,
                         "error": r.stderr[-300:]})
            continue
        row = json.loads(lines[-1])
        rows.append(row)
        rm = row.get("ref_metrics") or {}
        om = row.get("ours_metrics") or {}
        print(json.dumps({
            "family": family, "n": n,
            "ref_ate": rm.get("ate_m"), "ours_ate": om.get("ate_m"),
            "ref_rpe1": rm.get("rpe1_m"), "ours_rpe1": om.get("rpe1_m"),
            "ref_kfs": row.get("ref_keyframes"),
            "ours_kfs": row.get("ours_keyframes"),
        }), flush=True)

    wins = {"ate": 0, "rpe1": 0, "rpe30": 0, "contested": 0}
    for row in rows:
        rm = row.get("ref_metrics")
        om = row.get("ours_metrics")
        if not rm or not om:
            continue
        wins["contested"] += 1
        if om["ate_m"] <= rm["ate_m"]:
            wins["ate"] += 1
        if om["rpe1_m"] <= rm["rpe1_m"]:
            wins["rpe1"] += 1
        if om["rpe30_m"] <= rm["rpe30_m"]:
            wins["rpe30"] += 1
    out = {
        "metric": "reference_binary_headtohead_640x480",
        "date": str(datetime.date.today()),
        "protocol": (
            "scripts/build_reference.sh builds the reference's own sources "
            "(mechanical patches only; tracker/optimizer untouched; RELEASE "
            "-O3 -mavx2 -fopenmp).  scripts/refbench.py renders synthetic "
            "640x480 TUM-format datasets with exact ground truth and runs "
            "BOTH systems on the SAME pngs (ours: f32 CPU backend).  "
            "Metrics are the reference's own acceptance protocol "
            "(README.md:57): Horn-aligned ATE RMSE plus RPE at delta=1 "
            "frame and delta=30 frames (1 s at the 30 Hz timestamp "
            "convention), via revo_tpu.eval (TUM evaluate_ate/evaluate_rpe "
            "semantics).  Long families (300-400 frames, multi-promotion "
            "orbit/pan trajectories) exercise keyframe cadence and drift."
        ),
        "results": rows,
        "wins": wins,
    }
    path = os.path.join(HERE, "REFBENCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {wins}", flush=True)


if __name__ == "__main__":
    main()
