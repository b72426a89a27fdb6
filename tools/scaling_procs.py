"""Cross-process scaling efficiency: N OS processes x 1 pinned core each.

The round-4 verdict's missing data point: the >=70% @ N>=2 scaling claim
had only (a) in-process virtual-mesh numbers, which beyond N=2 measure
2-core contention, and (b) a 2-process correctness test that says nothing
about efficiency. This harness runs the sharded multi-sequence step over
a REAL jax.distributed process boundary, one physical core per process
(taskset), and reports aggregate fps and efficiency vs the 1-process
1-core baseline.

Usage: python tools/scaling_procs.py [steps]
"""

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "scaling_procs_worker.py")


def run_world(nprocs: int, steps: int, port: int) -> float:
    procs = []
    for rank in range(nprocs):
        cmd = ["taskset", "-c", str(rank), sys.executable, WORKER,
               str(rank), str(nprocs), str(port), str(steps)]
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    fps = None
    for rank, p in enumerate(procs):
        out, err = p.communicate(timeout=900)
        if p.returncode != 0:
            print(err[-2000:], file=sys.stderr)
            raise RuntimeError(f"worker {rank} failed rc={p.returncode}")
        m = re.search(r"agg_fps=([0-9.]+)", out)
        if rank == 0 and m:
            fps = float(m.group(1))
    assert fps is not None
    return fps


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    fps1 = run_world(1, steps, 12421)
    fps2 = run_world(2, steps, 12423)
    eff = fps2 / (2 * fps1)
    print(json.dumps({
        "metric": "cross_process_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "fraction",
        "fps_1proc_1core": round(fps1, 3),
        "fps_2proc_2core": round(fps2, 3),
        "steps": steps,
        "note": "sharded step, one sequence per process, taskset-pinned "
                "one physical core per process, jax.distributed over "
                "127.0.0.1 (DCN analog)",
    }))


if __name__ == "__main__":
    main()
