"""Multi-host / many-device exercises (VERDICT r1 #10, r2 #5).

These spawn subprocesses (the in-process suite runs on a fixed 8-device
virtual CPU mesh via conftest, so bigger meshes and multi-process
`jax.distributed` need their own interpreters):

  * 16-virtual-device dryrun of the FULL sharded PPO update
    (__graft_entry__.dryrun_multichip)
  * 2-process `jax.distributed.initialize` run: one global 8-device mesh
    spanning both processes, exact collective reduction + the go1plane task
    stepped with its env axis sharded across processes
    (tools/multihost_worker.py)
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(n_devices):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env.pop("PYTEST_CURRENT_TEST", None)
    return env


@pytest.mark.slow
def test_dryrun_16_devices():
    """Full sharded PPO update compiles + executes on a 16-device mesh."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "import __graft_entry__ as g; g.dryrun_multichip(16)\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_env(16),
        capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK on 16 devices" in out.stdout, out.stdout


@pytest.mark.slow
def test_two_process_jax_distributed():
    """2 processes x 4 devices: one global mesh, cross-process collectives,
    env axis sharded across processes."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, "tools/multihost_worker.py",
             "--pid", str(i), "--nprocs", "2", "--port", str(port)],
            cwd=REPO, env=_env(4), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            stdout, stderr = p.communicate(timeout=1500)
            outs.append((p.returncode, stdout, stderr))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (rc, stdout, stderr) in enumerate(outs):
        assert rc == 0, f"pid={i} rc={rc}\n{stderr[-2000:]}"
        assert f"MULTIHOST OK pid={i}" in stdout, stdout
