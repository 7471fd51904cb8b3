"""Per-scope optimizer groups (train.optimizers.make_grouped_optimizer).

Capability of the reference's grouped multi-optimizer train op
(imagenet_train_inception_resnet.py:147-159): different optimizers/LRs on
different variable scopes, everything else frozen.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.config import LRScheduleConfig, OptimizerConfig
from tensorflow_yolo2_tpu.train.optimizers import make_grouped_optimizer
from tensorflow_yolo2_tpu.train.trainer import Trainer, softmax_task


class TwoScopeNet(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Dense(8, name="stem")(x)
        x = nn.relu(x)
        x = nn.Dense(8, name="mid")(x)
        x = nn.relu(x)
        return nn.Dense(4, name="head")(x)


def _sgd(lr):
    return OptimizerConfig(name="sgd",
                           schedule=LRScheduleConfig(learning_rate=lr))


def test_groups_update_only_their_scopes_with_their_lr():
    model = TwoScopeNet()
    x = np.random.RandomState(0).normal(0, 1, (4, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    tx = make_grouped_optimizer(
        [(("stem",), _sgd(1.0)), (("head",), _sgd(0.5))], params)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)

    # stem: -1.0 * grad; head: -0.5 * grad; mid (unlisted): frozen
    np.testing.assert_allclose(
        np.asarray(updates["stem"]["kernel"]), -1.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updates["head"]["kernel"]), -0.5, rtol=1e-6)
    assert not np.asarray(updates["mid"]["kernel"]).any()


def test_default_group_trains_the_rest():
    model = TwoScopeNet()
    x = np.random.RandomState(0).normal(0, 1, (4, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tx = make_grouped_optimizer([(("stem",), _sgd(1.0))], params,
                                default=_sgd(0.25))
    updates, _ = tx.update(
        jax.tree_util.tree_map(jnp.ones_like, params), tx.init(params),
        params)
    np.testing.assert_allclose(
        np.asarray(updates["mid"]["kernel"]), -0.25, rtol=1e-6)


def test_trainer_with_tx_factory_trains_only_grouped_scopes():
    model = TwoScopeNet()
    trainer = Trainer(
        model, softmax_task(),
        tx_factory=lambda params: make_grouped_optimizer(
            [(("stem",), _sgd(0.1)), (("head",), _sgd(0.1))], params))
    rng = np.random.RandomState(1)
    images = rng.normal(0, 1, (8, 6)).astype(np.float32)
    labels = rng.randint(0, 4, 8).astype(np.int32)
    state = trainer.create_state(jax.random.PRNGKey(0), images[:1])
    before = jax.device_get(state.params)
    images_d, labels_d = trainer.put_batch(images, labels)
    state, metrics = trainer.train_step(state, images_d, labels_d)
    after = jax.device_get(state.params)
    assert np.isfinite(float(np.asarray(metrics["loss"])))
    # frozen scope identical, trained scopes moved
    np.testing.assert_array_equal(before["mid"]["kernel"],
                                  after["mid"]["kernel"])
    assert not np.array_equal(before["stem"]["kernel"],
                              after["stem"]["kernel"])
    assert not np.array_equal(before["head"]["kernel"],
                              after["head"]["kernel"])
