"""Multi-process distributed test (SURVEY.md §4.2 'Distributed' row (c)):
2 jax.distributed processes x 2 fake CPU devices with a local TCP
coordinator must produce the same counters as a single process — only
counters cross the process boundary (SURVEY.md §2.4)."""
import os
import re
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # spawns real processes, binds ports


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    from ldpc_tpu.config import (ChannelConfig, CodeConfig, DecoderConfig,
                                 QuantConfig, RunConfig, SimConfig)
    from ldpc_tpu.sim import build_code, make_run_batch
    cfg = SimConfig(
        code=CodeConfig(family="toy", Z=8),
        channel=ChannelConfig(modulation="bpsk"),
        quant=QuantConfig(bits=8, scale=4.0, beta_lsb=0),
        decoder=DecoderConfig(algorithm="min-sum", schedule="flooding",
                              max_iter=6, early_term=True),
        run=RunConfig(batch=32, seed=11),
    )
    code = build_code(cfg)
    rb = make_run_batch(code, cfg, decoder_backend="jnp")
    return tuple(int(np.asarray(x))
                 for x in rb(jax.random.PRNGKey(5), np.float32(0.9)))


def test_two_process_counters_match_single():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    helper = os.path.join(os.path.dirname(__file__), "multihost_helper.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(helper))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, helper, coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, f"helper failed:\n{out}"
    counters = {}
    for out in outs:
        m = re.search(r"COUNTERS (\d) \(([^)]*)\)", out)
        assert m, out
        counters[int(m.group(1))] = tuple(
            int(x) for x in m.group(2).split(","))
    # Both processes see the same replicated (psum-reduced) counters...
    assert counters[0] == counters[1]
    # ...and they equal the single-process run with the same seed.
    assert counters[0] == _single_process_reference()


def test_cli_two_process_launch():
    """VERDICT round-1 item 7: one command per host launches an N-process
    sweep (--coordinator/--num-processes/--process-id wire
    parallel.init_distributed); only process 0 reports."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [subprocess.Popen(
        [sys.executable, "-m", "ldpc_tpu.cli", "sweep", "--platform", "cpu",
         "--family", "toy", "--Z", "8", "--batch", "64", "--ebn0", "2.0",
         "--max-frames", "128", "--target-errors", "5", "--max-iter", "6",
         "--decoder-backend", "jnp", "--coordinator", coord,
         "--num-processes", "2", "--process-id", str(pid), "--mesh", "2x2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"CLI process failed:\n{out}"
    assert "ebn0_db,frames" in outs[0]       # rank 0 reports CSV
    assert "ebn0_db,frames" not in outs[1]   # rank 1 stays quiet
