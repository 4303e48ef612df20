#!/usr/bin/env python
"""Core-pinned weak-scaling measurement (VERDICT r4 missing #1 / ask #3).

The r4 artifact (perf/scaling.out) ran 8 virtual devices on 2 physical
cores, so its 26.9%-of-linear number measured HOST OVERSUBSCRIPTION, not
communication.  This benchmark fixes the resource ratio: every process is
pinned to exactly one physical core and hosts exactly one device, and the
per-device work is constant (weak scaling), so

    efficiency = wall(1 proc, B) / wall(2 procs, B per device)

isolates what adding a second worker actually costs: Gloo collectives
(the three scalar statistics folds per solve — see
tests/test_sharded_batched.py::test_collective_traffic_is_scalar_folds,
which asserts the compiled program's collectives are ~16 bytes/device) and
lockstep skew.  The reference's analog measurement is its threadpool
speedup table (/root/reference/perf/profile_expansions.out:4-7).

Run (any host with >= 2 cores):
    PYTHONPATH=/root/repo python perf/benchmark_scaling_pinned.py
"""
import json
import os
import re
import socket
import subprocess
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

B_LOCAL = int(os.environ.get("SCALING_B_LOCAL", "64"))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(nprocs: int) -> dict:
    script = os.path.join(os.path.dirname(__file__), "scaling_pinned_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), str(nprocs), str(port), str(B_LOCAL)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(nprocs)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    walls, solved = [], 0
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        m = re.search(r"SCALING pid=\d+ wall_s=([\d.]+) solved=(\d+)", out)
        assert m, out[-2000:]
        walls.append(float(m.group(1)))
        solved = int(m.group(2))
    return dict(nprocs=nprocs, wall_s=max(walls), per_proc_walls=walls, solved=solved)


def main() -> None:
    one = _run(1)
    two = _run(2)
    eff = one["wall_s"] / two["wall_s"]
    print(json.dumps({
        "metric": "core_pinned_weak_scaling_efficiency_2proc",
        "value": round(eff * 100, 1),
        "unit": "%_of_linear",
        "B_local": B_LOCAL,
        "wall_1proc_s": round(one["wall_s"], 4),
        "wall_2proc_s": round(two["wall_s"], 4),
        "per_proc_walls_2proc": two["per_proc_walls"],
        "solved_1proc": one["solved"],
        "solved_2proc_global": two["solved"],
        "note": "1 core + 1 device per process (sched_setaffinity); weak "
                "scaling at fixed per-device batch; collectives are the "
                "three scalar statistics folds per solve",
    }, ), flush=True)


if __name__ == "__main__":
    main()
