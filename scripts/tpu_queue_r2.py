"""Serialized TPU work queue for round 2 wrap-up (one process, one job at
a time — two concurrent TPU jobs contend on the tunnel and both look hung).

Jobs, in order of value:
  1. bench.py measurement (clip-fusion effect on the canonical 1.06 Gb/s)
  2. DVB-S2 16200 resident-ET waterfall artifact (results/dvbs2_16200_et)
  3. bit-width study artifact (results/bits_wifi648)

Each job is wrapped so one failure doesn't kill the rest.
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
    run("bench", [sys.executable, "bench.py"], 3600)
    run("et-waterfall", [
        sys.executable, "-m", "ldpc_tpu.cli", "sweep",
        "--family", "dvbs2", "--n", "16200", "--rate", "1/2",
        "--algorithm", "offset-min-sum", "--schedule", "layered",
        "--max-iter", "20", "--batch", "4096", "--superbatches", "4",
        "--ebn0", "1.4:3.0:0.4", "--max-frames", "131072",
        "--target-errors", "400", "--out", "results/dvbs2_16200_et",
        "--plot"], 5400)
    run("bits-study", [
        sys.executable, "scripts/make_bits_study.py",
        "--frames", "131072", "--batch", "16384",
        "--bits", "3", "4", "5", "6", "8",
        "--ebn0", "1.0", "1.5", "2.0", "2.5", "3.0"], 5400)
    # Regenerate the DVB-S2 n=64800 sweep THROUGH THE STREAM KERNEL: the
    # round-1 artifact was produced while the backend-label round-trip bug
    # routed CLI sweeps to the dense jnp decoder (3.5 Mb/s vs the stream
    # kernel's ~0.5 Gb/s) — same BER, ~150x the wall time.
    run("dvbs2-64800-sweep", [
        sys.executable, "-m", "ldpc_tpu.cli", "sweep",
        "--preset", "dvbs2-64800-r12",
        "--batch", "2048", "--superbatches", "4",
        "--ebn0", "1.0:2.25:0.25", "--max-frames", "65536",
        "--target-errors", "200", "--out", "results/dvbs2_r12_stream",
        "--plot"], 5400)
    # Perf experiments (decision data for the paired flooding sweep).
    run("diag-pair", [sys.executable, "scripts/diag_pair.py"], 3600)
    run("opshape", [sys.executable, "scripts/microbench_rot.py", "opshape"],
        3600)
    run("bench-paired", [sys.executable, "bench.py"], 3600,
        env={"LDPC_PAIR_LAYERS": "1"})
    print(json.dumps({"queue": "done"}), flush=True)


if __name__ == "__main__":
    main()
