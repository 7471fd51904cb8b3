"""Multi-host (2-process jax.distributed) data-parallel training test.

Drives the per-host feed paths that only execute when
``jax.process_count() > 1``:

- ``Trainer.put_batch``'s ``make_array_from_process_local_data`` branch
  (train/trainer.py),
- a global-mesh train step whose gradient psum spans processes,

on two local CPU processes (4 virtual devices each) connected through a
local coordinator — the reference's distributed-tests-without-a-cluster
pattern (model_deploy_test.py:52-90). Runs each worker as a subprocess
because a JAX process can join a cluster only once.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.getcwd())  # repo root (the test sets cwd)
import numpy as np

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4").strip()
import jax
jax.config.update("jax_platforms", "cpu")

coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8  # global devices across both processes

import jax.numpy as jnp
import flax.linen as nn

from tensorflow_yolo2_tpu.config import LRScheduleConfig, OptimizerConfig
from tensorflow_yolo2_tpu.parallel.mesh import MeshConfig, make_mesh
from tensorflow_yolo2_tpu.train.trainer import Trainer, softmax_task


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(16, name="fc1")(x))
        return nn.Dense(3, name="logits")(x)


mesh = make_mesh(MeshConfig(data=8, model=1))
trainer = Trainer(TinyNet(), softmax_task(),
                  OptimizerConfig(name="sgd",
                                  schedule=LRScheduleConfig(
                                      learning_rate=0.1)),
                  mesh=mesh)

# global batch 16 = 2 processes x 8 local rows; every process builds the
# SAME deterministic global batch and passes only its local half through
# put_batch (the per-host feed: no host materializes foreign shards on
# device)
rng = np.random.RandomState(0)
g_images = rng.normal(0, 1, (16, 4, 4, 1)).astype(np.float32)
g_labels = rng.randint(0, 3, 16).astype(np.int32)
lo, hi = pid * 8, (pid + 1) * 8
state = trainer.create_state(jax.random.PRNGKey(0), g_images[:1])
images, labels = trainer.put_batch(g_images[lo:hi], g_labels[lo:hi])
assert images.shape == (16, 4, 4, 1)  # global logical shape
state, metrics = trainer.train_step(state, images, labels)
loss = float(np.asarray(metrics["loss"]))
gn = float(np.asarray(metrics["grad_norm"]))
print("RESULT " + json.dumps({"pid": pid, "loss": loss, "grad_norm": gn}))
"""


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    coord = f"localhost:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces CPU itself
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=os.path.dirname(
                             os.path.dirname(os.path.abspath(__file__))))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, out
        r = json.loads(line[-1][len("RESULT "):])
        results[r["pid"]] = r
    assert set(results) == {0, 1}
    # both processes computed the same global step
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["grad_norm"] == pytest.approx(
        results[1]["grad_norm"], rel=1e-6)
    assert results[0]["loss"] > 0
