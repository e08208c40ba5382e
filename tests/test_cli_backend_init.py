"""Parser construction must not initialize the XLA backend.

jax.distributed.initialize raises once backends exist, and
run_sweep_sharded.py builds its parser BEFORE multihost.initialize — so any
backend touch at parser-build time breaks every multi-host sweep at startup
(advisor r2, high). Run in a subprocess: the test process itself has long
since initialized its backend.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CODE = """
import sys
sys.path.insert(0, {repo!r})
import jax

# same pattern as tests/conftest.py: backend init is lazy, so a config
# update after import still decides the platform
jax.config.update("jax_platforms", "cpu")
from pnpinversion_tpu.cli import setup_compile_cache, standard_argparser

parser = standard_argparser(["directinversion+p2p"])
setup_compile_cache()  # must decide cpu-vs-tpu without touching the backend

import jax._src.xla_bridge as xb

assert not xb.backends_are_initialized(), (
    "parser construction / setup_compile_cache initialized the XLA backend; "
    "jax.distributed.initialize would now raise")

# the cache config must still have landed for the cpu backend
assert jax.config.jax_compilation_cache_dir, "cpu compile cache not configured"
print("OK")
"""


def test_parser_does_not_initialize_backend():
    out = subprocess.run(
        [sys.executable, "-c", _CODE.format(repo=REPO)],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout
