"""Serialized TPU work queue, round-2 wrap-up batch B (one job at a time —
two concurrent TPU jobs contend on the tunnel and both look hung).

  1. opshape microbench rerun (fixed slope deltas) — layer-stacking data
  2. DVB-S2 n=16200 r=1/2 over its native 8PSK: waterfall artifact
  3. bench.py under the now-default paired flooding sweep
"""
import json
import subprocess
import sys
import time

sys.path.insert(0, ".")


def run(tag, cmd, timeout, env=None):
    t0 = time.time()
    print(f"=== {tag}: {' '.join(cmd)}", flush=True)
    if env:
        import os
        env = {**os.environ, **env}
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, env=env)
        print(p.stdout[-3000:], flush=True)
        if p.returncode != 0:
            print(f"--- {tag} FAILED rc={p.returncode}", flush=True)
            print(p.stderr[-2000:], flush=True)
    except subprocess.TimeoutExpired:
        print(f"--- {tag} TIMEOUT", flush=True)
    print(f"=== {tag} done in {time.time()-t0:.0f}s", flush=True)


def main():
    run("opshape", [sys.executable, "scripts/microbench_rot.py", "opshape"],
        3600)
    run("8psk-waterfall", [
        sys.executable, "-m", "ldpc_tpu.cli", "sweep",
        "--family", "dvbs2", "--n", "16200", "--rate", "1/2",
        "--modulation", "8psk",
        "--algorithm", "offset-min-sum", "--schedule", "layered",
        "--max-iter", "20", "--batch", "4096", "--superbatches", "4",
        "--ebn0", "2.8:5.2:0.4", "--max-frames", "131072",
        "--target-errors", "400", "--out", "results/dvbs2_16200_8psk",
        "--plot"], 5400)
    run("bench-paired-default", [sys.executable, "bench.py"], 3600)
    print(json.dumps({"queue": "done"}), flush=True)


if __name__ == "__main__":
    main()
