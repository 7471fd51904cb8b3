"""Remat option: the rematerialized train step must produce the same
update as the plain one (same math, less memory)."""

import jax
import numpy as np

from tensorflow_yolo2_tpu.config import (
    LRScheduleConfig,
    OptimizerConfig,
    YoloConfig,
)
from tensorflow_yolo2_tpu.models import Darknet19Detector
from tensorflow_yolo2_tpu.parallel import MeshConfig, make_mesh
from tensorflow_yolo2_tpu.train import Trainer
from tensorflow_yolo2_tpu.train.trainer import yolo_task

TINY = YoloConfig(S=2, B=2, num_class=4, image_size=64)


def test_remat_step_matches_plain(rng):
    mesh = make_mesh(MeshConfig(data=4, model=1))
    model = Darknet19Detector(output_channels=TINY.cell_channels)
    opt = OptimizerConfig(name="sgd",
                          schedule=LRScheduleConfig(learning_rate=1e-2))
    images = rng.normal(0, 1, (4, 64, 64, 3)).astype(np.float32)
    labels = np.zeros((4, 2, 2, 9), np.float32)
    labels[:, 0, 1, 0] = 1
    labels[:, 0, 1, 1:5] = (40, 12, 20, 16)
    labels[:, 0, 1, 5 + 2] = 1

    results = []
    for remat in (False, True):
        tr = Trainer(model, yolo_task(TINY), opt, mesh=mesh, donate=False,
                     remat=remat)
        state = tr.create_state(jax.random.PRNGKey(0), images[:1])
        di, dl = tr.put_batch(images, labels)
        state, m = tr.train_step(state, di, dl)
        results.append((float(np.asarray(m["loss"])),
                        np.asarray(state.params["backbone"]["conv1"]
                                   ["conv"]["kernel"])))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1],
                               rtol=1e-5, atol=1e-7)
