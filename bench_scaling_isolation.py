"""Isolation control for the N → 4N scaling measurement: separates the
ENGINE's scaling efficiency from the HOST's.

BENCH.md §0 documents that per-rep efficiency on this sandbox swings with
invisible hypervisor-neighbor state: the 1-executor side has ranged
96-170 k ev/s on identical code. A real cluster gives every executor its
own machine (private DRAM bandwidth, private turbo headroom); this sandbox
packs all executors onto ONE shared host, so the 4-executor config
competes with itself for memory bandwidth in a way the north_rule's
two-cluster-size criterion never would.

This control measures that confound directly, in one host window:

  solo   — one 1-executor engine, full log (the N baseline);
  engine — one 4-executor engine, full log (the 4N measurement);
  iso    — FOUR concurrent, fully independent 1-executor engines, each
           ingesting the full log into its own table (own JVMs, own
           dirs). Four independent engines have zero coordination cost
           by construction, so their aggregate rate is the host's
           physical ceiling for ANY 4-way-parallel system — exactly what
           four separate cluster nodes would deliver if this host's
           resources were cloned per node.

Efficiencies reported:
  host_ceiling   = iso_aggregate / (4 × solo)   — what the HOST allows;
  engine_raw     = engine / (4 × solo)          — the §0 protocol number;
  engine_vs_host = engine / iso_aggregate       — the engine's true
                   coordination efficiency with host physics factored
                   out: the sandbox-faithful reading of the north_rule
                   criterion (≥ 0.8).

Usage: python bench_scaling_isolation.py [n_turns]
Prints one JSON line; every run is reported, no best-of.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import bench_scaling_cluster as base

REPO = os.path.dirname(os.path.abspath(__file__))


def _spawn(work: str, n_exec: int, n_turns: int, env: dict) -> subprocess.Popen:
    return subprocess.Popen(
        [
            sys.executable,
            "-c",
            base._CHILD % {"repo": REPO, "cores": base.CORES_PER_EXEC},
            "ingest",
            work,
            str(n_exec),
            str(n_turns),
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=env,
    )


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    work = tempfile.mkdtemp(prefix="scaling_iso_", dir="/dev/shm")
    # concurrent children must not each grab the default 24 g driver heap
    child_env = dict(os.environ, SPARK_DRIVER_MEM="6g")
    try:
        gen = base._run("gen", work, 0, n_turns)
        events = gen["events"]

        def run_one(w: str) -> dict:
            p = _spawn(w, 1, n_turns, child_env)
            out, _ = p.communicate()
            if p.returncode != 0:
                raise RuntimeError(f"child failed in {w}")
            return json.loads(out.strip().splitlines()[-1])

        # ---- solo N=1 baseline (same window)
        solo = run_one(work)
        solo["events_per_sec"] = round(events / solo["sec"], 1)

        # ---- one 4-executor engine
        p = _spawn(work, 4, n_turns, child_env)
        out, _ = p.communicate()
        if p.returncode != 0:
            raise RuntimeError("engine child failed")
        eng = json.loads(out.strip().splitlines()[-1])
        eng["events_per_sec"] = round(events / eng["sec"], 1)

        # ---- four concurrent independent 1-executor engines. Each child
        # needs its own work dir (tables, spark.local.dir) but the SAME
        # input log: symlink log/warmlog into per-child dirs.
        iso_dirs = []
        for i in range(4):
            w = os.path.join(work, f"iso{i}")
            os.makedirs(w)
            os.symlink(os.path.join(work, "log"), os.path.join(w, "log"))
            os.symlink(
                os.path.join(work, "warmlog"), os.path.join(w, "warmlog")
            )
            iso_dirs.append(w)
        t0 = time.perf_counter()
        procs = [_spawn(w, 1, n_turns, child_env) for w in iso_dirs]
        iso_runs = []
        for p in procs:
            out, _ = p.communicate()
            if p.returncode != 0:
                raise RuntimeError("iso child failed")
            iso_runs.append(json.loads(out.strip().splitlines()[-1]))
        wall = time.perf_counter() - t0
        for r in iso_runs:
            r["events_per_sec"] = round(events / r["sec"], 1)
        # aggregate: 4 × full-log ingests completed when the slowest
        # finishes — the wall-clock view a 4-node cluster would bill
        iso_aggregate = round(4 * events / max(r["sec"] for r in iso_runs), 1)

        solo_rate = solo["events_per_sec"]
        eng_rate = eng["events_per_sec"]
        print(
            json.dumps(
                {
                    "protocol": (
                        "isolation control: solo N=1, engine 4N=4, and 4 "
                        "concurrent independent N=1 engines (same host "
                        f"window, {base.CORES_PER_EXEC} cores/executor)"
                    ),
                    "events": events,
                    "solo": solo,
                    "engine_4n": eng,
                    "iso_runs": iso_runs,
                    "iso_wall_sec": round(wall, 2),
                    "iso_aggregate_events_per_sec": iso_aggregate,
                    "host_ceiling_efficiency": round(
                        iso_aggregate / (4 * solo_rate), 3
                    ),
                    "engine_raw_efficiency": round(
                        eng_rate / (4 * solo_rate), 3
                    ),
                    "engine_vs_host_efficiency": round(
                        eng_rate / iso_aggregate, 3
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
