"""True multi-host training path: 2-process CPU cluster vs single-process.

Round-1 VERDICT gap #2: `jax.distributed.initialize` + per-process batch
assembly (`make_array_from_process_local_data` in train/step.shard_batch) +
cross-process uneven-data vote.  Two subprocesses (4 virtual CPU devices
each, gloo collectives) must reproduce the single-process (8-device) loss
trajectory exactly, and stop together when one host's shard runs dry.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_cluster(tmp_path, uneven, timeout=420):
    port = _free_port()
    outs, procs = [], []
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    for rank in range(2):
        out = tmp_path / f"losses_{rank}.json"
        outs.append(out)
        cmd = [sys.executable, WORKER, "--rank", str(rank), "--nprocs", "2",
               "--coordinator", f"127.0.0.1:{port}", "--out", str(out)]
        if uneven:
            cmd.append("--uneven")
        procs.append(subprocess.Popen(cmd, env=env, cwd=REPO,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker rc={p.returncode}\n{log[-4000:]}"
    return [json.load(open(o)) for o in outs]


@pytest.fixture(scope="module")
def single_process_losses():
    from tests.multihost_worker import run_training

    return run_training(rank=0, world=1)


def test_two_process_matches_single(tmp_path, single_process_losses):
    losses = _spawn_cluster(tmp_path, uneven=False)
    assert len(losses[0]) == len(single_process_losses) == 3
    # both ranks observe the identical replicated global loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)
    # and it matches the single-process trajectory (fp reduction order may
    # differ across device layouts)
    np.testing.assert_allclose(losses[0], single_process_losses,
                               rtol=1e-5, atol=2e-5)


def test_uneven_data_vote_stops_all_hosts(tmp_path, single_process_losses):
    """Rank 1 runs out one batch early; the vote must end the epoch for BOTH
    hosts after 2 steps (reference: cosyvoice_join monitored_barrier,
    utils/train_utils.py:234-252)."""
    losses = _spawn_cluster(tmp_path, uneven=True)
    assert len(losses[0]) == len(losses[1]) == 2
    np.testing.assert_allclose(losses[0], single_process_losses[:2],
                               rtol=1e-5, atol=2e-5)
