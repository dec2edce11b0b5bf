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


_FUSION_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "@ROOT@")
from lidar_object_detection_tpu.parallel import distributed

coord, pid = sys.argv[1], int(sys.argv[2])
distributed.initialize(coordinator_address=coord, num_processes=2,
                       process_id=pid)
assert len(jax.devices()) == 2

import dataclasses
from jax.sharding import NamedSharding, PartitionSpec as P
from lidar_object_detection_tpu.config import (FusionConfig,
                                               PipelineVersion, ShapeConfig)
from lidar_object_detection_tpu.fusion import (FusionParams, fuse_frame)
from lidar_object_detection_tpu.parallel import (make_mesh,
                                                 point_sharded_fuse_frame)

# deterministic synthetic frame, identical on both processes
small = ShapeConfig(max_points=2048, max_detections=32, max_boxes=8,
                    image_height=96, image_width=512)
cfg = dataclasses.replace(
    FusionConfig.for_version(PipelineVersion.CSV_EVAL), shapes=small)
params = FusionParams.from_config(cfg)
assert params.erosion_enabled

rng = np.random.default_rng(7)
pts = (rng.normal(size=(2048, 4)) * 10).astype(np.float32)
# a cluster that BOTH projects into the mask block (rows 20:60 ->
# y in [0, ~0.5] at z~8.75) AND lies inside the GT box below
pts[:128, 0] = rng.uniform(0.2, 1.8, 128)
pts[:128, 1] = rng.uniform(0.05, 0.45, 128)
pts[:128, 2] = rng.uniform(8.1, 9.4, 128)
pvalid = np.ones(2048, bool)
mask_bits = np.zeros((96, 512), np.uint32)
mask_bits[20:60, 100:400] = 1
det_valid = np.zeros(32, bool); det_valid[0] = True
corners = np.zeros((8, 8, 3), np.float32)
corners[0] = [[0, 0, 8], [2, 0, 8], [2, 4, 8], [0, 4, 8],
              [0, 0, 9.5], [2, 0, 9.5], [2, 4, 9.5], [0, 4, 9.5]]
box_valid = np.zeros(8, bool); box_valid[0] = True
eye = np.eye(4, dtype=np.float32)
intr = np.asarray([[200.0, 0, 256], [0, 200, 48], [0, 0, 1]], np.float32)

# single-device oracle (local, full arrays)
oracle = fuse_frame(jnp.asarray(pts), jnp.asarray(pvalid),
                    jnp.asarray(mask_bits), jnp.asarray(det_valid),
                    jnp.asarray(corners), jnp.asarray(box_valid),
                    jnp.asarray(eye), jnp.asarray(eye), jnp.asarray(intr),
                    params)
o_counts = np.asarray(oracle["counts"])
o_total = np.asarray(oracle["total_points"])

# distributed: point axis over the 2-device (1 per process) model axis
mesh = make_mesh(jax.devices(), model_parallel=2)

def gmake(arr, spec):
    arr = np.asarray(arr)
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sh,
                                        lambda idx: arr[idx])

g_pts = gmake(pts, P("model", None))
g_pv = gmake(pvalid, P("model"))
out = point_sharded_fuse_frame(
    mesh, g_pts, g_pv, gmake(mask_bits, P()), gmake(det_valid, P()),
    gmake(corners, P()), gmake(box_valid, P()), eye, eye, intr, params)
d_counts = np.asarray(jax.device_get(out["counts"]))
d_total = np.asarray(jax.device_get(out["total_points"]))
assert np.array_equal(d_counts, o_counts), (d_counts.sum(), o_counts.sum())
assert np.array_equal(d_total, o_total)
assert o_counts.sum() > 0, "degenerate frame: nothing counted"
print(f"FUSION_DIST_OK pid={pid} counted={int(o_counts.sum())}")
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


def test_two_process_point_sharded_fusion(tmp_path):
    """Cross-process point-sharded fusion (erosion-enabled csv_eval
    semantics) matches the single-device ``fuse_frame`` oracle exactly --
    the multi-HOST version of the dryrun's step 2a."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "fusion_worker.py"
    script.write_text(_FUSION_WORKER.replace("@ROOT@", ROOT))
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
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"FUSION_DIST_OK pid={i}" in out
