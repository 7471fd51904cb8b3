"""docs/WALKTHROUGH.md stays runnable: its python snippets, as a test.

The walkthrough is the counterpart of the reference's
slim_walkthrough.ipynb; this mirrors its code cells (first model from
the registry → data via the dataset/preprocessing factories → Trainer
python API → eval) so API drift breaks CI instead of the doc.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import synthetic


@pytest.mark.slow
def test_walkthrough_snippets(tmp_path, tmp_root):
    # "Your first model"
    from tensorflow_yolo2_tpu.models.registry import get_network, list_networks

    assert "inception_v1" in list_networks()
    model = get_network("cifarnet", num_classes=5)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    logits = model.apply(variables, jnp.zeros((2, 32, 32, 3)), train=False)
    assert logits.shape == (2, 5)

    # "Reading data" — factory + preprocessing_name
    fl = synthetic.make_flowers(str(tmp_path / "TF_flowers"), per_class=6)
    from tensorflow_yolo2_tpu.entries.datasets import get_dataset

    imdb = get_dataset("flowers", batch_size=4, data_path=fl,
                       image_size=32, preprocessing_name="inception_v1")
    images, labels = imdb.get()
    assert images.shape == (4, 32, 32, 3)
    assert imdb.num_class == 3

    # "Training a CNN" — the Trainer python API block
    from tensorflow_yolo2_tpu.config import LRScheduleConfig, OptimizerConfig
    from tensorflow_yolo2_tpu.parallel.mesh import make_mesh_for_batch
    from tensorflow_yolo2_tpu.train.trainer import Trainer, softmax_task

    trainer = Trainer(model, softmax_task(),
                      OptimizerConfig(name="adam",
                                      schedule=LRScheduleConfig(
                                          learning_rate=1e-3)),
                      mesh=make_mesh_for_batch(4))
    state = trainer.create_state(jax.random.PRNGKey(0), images[:1])
    losses = []
    for _ in range(3):
        ims, lbs = trainer.put_batch(*imdb.get())
        state, metrics = trainer.train_step(state, ims, lbs)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()

    # "Using pre-trained models" — the importer dispatch named in the doc
    from tensorflow_yolo2_tpu.compat.tf_import import import_checkpoint_for

    assert callable(import_checkpoint_for)
