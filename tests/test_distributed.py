"""Real multi-process jax.distributed test: two local CPU processes
form one global mesh; psum stat reduction and data-parallel gradients
must match the single-process computation exactly (SURVEY.md §2.4
comm-backend row — previously only single-process virtual meshes were
exercised)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_psum(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out_prefix = str(tmp_path / "dist")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["KALDI_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "kaldi_tpu.parallel.distributed",
             coord, "2", str(pid), out_prefix],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=os.path.dirname(os.path.dirname(__file__))))
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, stdout, stderr))
    for rc, stdout, stderr in outs:
        assert rc == 0, stderr.decode()[-2000:]

    r0 = np.load(f"{out_prefix}.0.npz")
    r1 = np.load(f"{out_prefix}.1.npz")
    assert int(r0["ndev"]) == 4          # 2 processes × 2 devices
    # both processes agree on the reduced stats
    np.testing.assert_allclose(r0["total"], r1["total"], rtol=1e-6)
    # and they equal the single-process sum of the per-process stats
    expect = sum(np.random.default_rng(100 + pid).standard_normal(
        (4, 3)).astype(np.float32) for pid in range(2))
    np.testing.assert_allclose(r0["total"], expect, rtol=1e-5, atol=1e-6)
    # data-parallel gradient equals the full-batch gradient
    D = 8
    grng = np.random.default_rng(7)
    gb = grng.standard_normal((4 * 4, D)).astype(np.float32)
    gy = gb @ (np.arange(D) * 0.1)
    W = np.linspace(-1, 1, D).astype(np.float32)
    ref = 2 * gb.T @ (gb @ W - gy) / len(gy)
    np.testing.assert_allclose(r0["grad"], ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(r1["grad"], ref, rtol=1e-4, atol=1e-5)
