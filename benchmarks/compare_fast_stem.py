"""A/B: standard folded detect-448 forward vs the s2d fast-stem forward."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax, jax.numpy as jnp, numpy as np
from tensorflow_yolo2_tpu.config import YoloConfig
from tensorflow_yolo2_tpu.models.darknet import Darknet19Detector
from tensorflow_yolo2_tpu.models.fast_stem import fast_detect_forward
from tensorflow_yolo2_tpu.models.fold import fold_params
from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache

enable_compilation_cache()
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SIZE, STEPS = 448, 15
yolo = YoloConfig(S=SIZE // 32)
model = Darknet19Detector(output_channels=yolo.cell_channels, dtype=jnp.bfloat16)
v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
folded = fold_params(v["params"], v["batch_stats"])
fmodel = Darknet19Detector(output_channels=yolo.cell_channels, fold_bn=True,
                           dtype=jnp.bfloat16)
std = jax.jit(lambda p, x: jnp.sum(fmodel.apply({"params": p}, x, train=False)))
fast = jax.jit(lambda p, x: jnp.sum(fast_detect_forward(p, x)))
x = jax.device_put(jnp.asarray(
    np.random.RandomState(0).uniform(-1, 1, (BATCH, SIZE, SIZE, 3)), jnp.float32))
for name, fn in (("standard", std), ("fast-s2d", fast)):
    np.asarray(fn(folded, x))  # compile+warm
    t0 = time.perf_counter()
    outs = [fn(folded, x) for _ in range(STEPS)]
    np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:10s} {dt*1e3:7.2f} ms/step  {BATCH/dt:7.0f} img/s")
