"""2-process ``jax.distributed`` smoke test on CPU (localhost coordinator).

Exercises parallel/distributed.py beyond import: both processes bring up
the distributed runtime, see the global 2-device CPU topology, and run one
cross-process psum through a shard_map mesh -- the multi-host claim of
SURVEY.md section 2.4 as a test instead of a docstring.
"""

import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, "@ROOT@")
from lidar_object_detection_tpu.parallel import distributed

coord, pid = sys.argv[1], int(sys.argv[2])
distributed.initialize(coordinator_address=coord, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert distributed.is_primary() == (pid == 0)
assert len(jax.devices()) == 2, jax.devices()   # global view: 1 per host

# one real cross-process collective: psum of each host's process index
from jax.sharding import Mesh, PartitionSpec as P
mesh = Mesh(jax.devices(), ("hosts",))
@jax.jit
def _global_sum(x):
    return jax.shard_map(
        lambda v: jax.lax.psum(v, "hosts"),
        mesh=mesh, in_specs=P("hosts"), out_specs=P())(x)

import numpy as np
local = jnp.asarray([float(pid + 1)])
arr = jax.make_array_from_single_device_arrays(
    (2,), jax.NamedSharding(mesh, P("hosts")),
    [jax.device_put(local, jax.local_devices()[0])])
total = _global_sum(arr)
assert float(np.asarray(jax.device_get(total))[0]) == 3.0, total
print(f"DISTRIBUTED_OK pid={pid}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_psum(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("@ROOT@", ROOT))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)           # exactly 1 local CPU device each
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i)],
        env=env, cwd=ROOT, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"DISTRIBUTED_OK pid={i}" in out
