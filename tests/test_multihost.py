"""Two-process multihost smoke test (SURVEY.md §5 communication-backend row).

Spawns two REAL processes over a loopback coordinator
(jax.distributed.initialize) and psums a scalar across them through a
global 'pairs' mesh — the DCN path that parallel/multihost.py wraps.
Skips cleanly when the jax build/platform does not support multi-process
CPU (the child reports why).
"""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); coord = sys.argv[2]

from rpe_tpu.parallel.multihost import initialize_distributed, global_pairs_mesh

try:
    active = initialize_distributed(coordinator_address=coord,
                                    num_processes=2, process_id=pid)
except Exception as e:  # unsupported build -> parent skips
    print(f"SKIP:{type(e).__name__}:{e}")
    sys.exit(0)
assert active

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental import multihost_utils

if jax.device_count() != 2 or jax.process_count() != 2:
    print(f"SKIP:devices={jax.device_count()} processes={jax.process_count()}")
    sys.exit(0)

mesh = global_pairs_mesh()
assert mesh.devices.size == 2

local = np.array([float(pid + 1)], dtype=np.float32)
garr = multihost_utils.host_local_array_to_global_array(local, mesh,
                                                        P("pairs"))
import functools
f = jax.jit(functools.partial(jax.shard_map, mesh=mesh, in_specs=(P("pairs"),),
                              out_specs=P())(
    lambda x: jax.lax.psum(jnp.sum(x), "pairs")))
tot = f(garr)
val = float(np.asarray(tot))
assert val == 3.0, val  # 1.0 (proc 0) + 2.0 (proc 1)
print(f"PSUM_OK:{val}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum_over_loopback():
    import os

    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    # one CPU device per process (conftest exports 8 for in-process tests)
    flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                     if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (flags +
                        " --xla_force_host_platform_device_count=1").strip()
    env["JAX_PLATFORMS"] = "cpu"

    procs = [subprocess.Popen(
        [sys.executable, "-c", CHILD, str(pid), coord],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(REPO)) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        if "SKIP:" in out:
            pytest.skip(f"multi-process CPU unsupported here: "
                        f"{out.strip().splitlines()[-1]}")
        assert p.returncode == 0, f"proc {pid} rc={p.returncode}\n{out}"
        assert "PSUM_OK:3.0" in out, f"proc {pid} output:\n{out}"
