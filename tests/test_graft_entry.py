"""The driver's entry points must work in a fresh process on this box
(1 real device): ``entry()`` compile-checks single-chip, and
``dryrun_multichip(8)`` must internally build a virtual 8-device CPU mesh.

Round-1 regression: dryrun_multichip assumed >=8 devices existed and crashed
on the 1-chip driver box (MULTICHIP_r01.json rc=1). These tests run both
functions in a subprocess that mimics the driver environment (no conftest
XLA_FLAGS inherited).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fresh_env():
    env = dict(os.environ)
    # Simulate the driver box: no virtual-device flags pre-set.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


def _run(code: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", code],
        env=_fresh_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )


def test_entry_jits_single_chip():
    proc = _run(
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "print('OK', out.shape)\n"
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "OK" in proc.stdout


def test_dryrun_multichip_on_one_device_box():
    proc = _run(
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import __graft_entry__ as g\n"
        "assert len(jax.devices()) < 8\n"
        "g.dryrun_multichip(8)\n"
        "print('DRYRUN OK')\n"
    )
    assert proc.returncode == 0, proc.stderr[-3000:] + proc.stdout[-2000:]
    assert "DRYRUN OK" in proc.stdout
