"""Multi-chip sharding correctness: the driver dryrun decodes a real golden
stream and re-runs one picture's luma filter chain (deblock with halo
exchange + SAO + ALF) and an MC job batch sharded over a virtual (gop,
tile) mesh, asserting bit-exactness vs the single-device decode."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_real_picture():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import __graft_entry__ as g;"
        "[g.dryrun_multichip(n) for n in (2, 8)];"
        "print('MULTICHIP_OK')"
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=600)
    assert "MULTICHIP_OK" in out.stdout, out.stdout + out.stderr
