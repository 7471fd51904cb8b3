"""Trainer tests on the virtual 8-device CPU mesh: sharding assertions
(the pjit analog of model_deploy_test.py's device-string checks), loss
descent, EMA, frozen scopes, optimizer swap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tensorflow_yolo2_tpu.config import (
    LRScheduleConfig,
    OptimizerConfig,
    YoloConfig,
)
from tensorflow_yolo2_tpu.models import Darknet19Detector
from tensorflow_yolo2_tpu.models.darknet import Darknet19Classifier
from tensorflow_yolo2_tpu.parallel import MeshConfig, make_mesh
from tensorflow_yolo2_tpu.train import Trainer
from tensorflow_yolo2_tpu.train.optimizers import (
    make_optimizer,
    make_schedule,
    trainable_mask,
)
from tensorflow_yolo2_tpu.train.trainer import softmax_task, yolo_task

TINY = YoloConfig(S=2, B=2, num_class=4, image_size=64)


def tiny_batch(rng, batch=8, cfg=TINY):
    images = rng.normal(0, 1, (batch, cfg.image_size, cfg.image_size, 3)
                        ).astype(np.float32)
    labels = np.zeros((batch, cfg.S, cfg.S, 5 + cfg.num_class), np.float32)
    labels[:, 0, 1, 0] = 1
    labels[:, 0, 1, 1:5] = (40, 12, 20, 16)
    labels[:, 0, 1, 5 + 2] = 1
    return images, labels


def test_yolo_train_step_descends(rng):
    mesh = make_mesh(MeshConfig(data=8, model=1))
    model = Darknet19Detector(output_channels=TINY.cell_channels)
    trainer = Trainer(model, yolo_task(TINY),
                      OptimizerConfig(name="adam",
                                      schedule=LRScheduleConfig(
                                          learning_rate=1e-3)),
                      mesh=mesh)
    images, labels = tiny_batch(rng)
    state = trainer.create_state(jax.random.PRNGKey(0), images[:1])
    images, labels = trainer.put_batch(images, labels)

    losses = []
    for _ in range(6):
        state, metrics = trainer.train_step(state, images, labels)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 6
    # gradient summary (slim train_image_classifier.py:489-503 capability)
    assert float(metrics["grad_norm"]) > 0


def test_batch_is_sharded_over_data_axis(rng):
    mesh = make_mesh(MeshConfig(data=4, model=2))
    model = Darknet19Detector(output_channels=TINY.cell_channels)
    trainer = Trainer(model, yolo_task(TINY), mesh=mesh)
    images, labels = tiny_batch(rng)
    di, dl = trainer.put_batch(images, labels)
    assert di.sharding.spec == P("data")
    assert len(di.sharding.device_set) == 8


def test_large_params_sharded_over_model_axis(rng):
    mesh = make_mesh(MeshConfig(data=4, model=2))
    model = Darknet19Detector(output_channels=TINY.cell_channels)
    trainer = Trainer(model, yolo_task(TINY), mesh=mesh)
    images, _ = tiny_batch(rng, batch=4)
    state = trainer.create_state(jax.random.PRNGKey(0), images[:1])
    # the 1024-out conv kernels must be TP-sharded on the last dim
    k = state.params["backbone"]["conv14"]["conv"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")
    # small biases replicate
    b = state.params["backbone"]["conv1"]["conv"]["bias"]
    assert b.sharding.spec == P()
    # optimizer slots follow the same policy
    leaves = jax.tree_util.tree_leaves(
        state.opt_state, is_leaf=lambda x: hasattr(x, "sharding"))
    assert any(getattr(l, "sharding", None) is not None and
               l.sharding.spec == P(None, None, None, "model")
               for l in leaves if hasattr(l, "shape") and len(l.shape) == 4)


def test_tp_train_step_runs(rng):
    mesh = make_mesh(MeshConfig(data=4, model=2))
    model = Darknet19Detector(output_channels=TINY.cell_channels)
    trainer = Trainer(model, yolo_task(TINY), mesh=mesh)
    images, labels = tiny_batch(rng)
    state = trainer.create_state(jax.random.PRNGKey(0), images[:1])
    images, labels = trainer.put_batch(images, labels)
    state, metrics = trainer.train_step(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))


def test_classification_task_and_eval(rng):
    mesh = make_mesh(MeshConfig(data=8, model=1))
    model = Darknet19Classifier(num_classes=3)
    trainer = Trainer(model, softmax_task(), mesh=mesh)
    images = rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32)
    labels = np.arange(8, dtype=np.int32) % 3
    state = trainer.create_state(jax.random.PRNGKey(1), images[:1])
    images_d, labels_d = trainer.put_batch(images, labels)
    state, m = trainer.train_step(state, images_d, labels_d)
    assert "accuracy" in m
    me = trainer.eval_step(state, images_d, labels_d)
    assert np.isfinite(float(me["loss"]))


def test_ema_params_track(rng):
    mesh = make_mesh(MeshConfig(data=8, model=1))
    model = Darknet19Classifier(num_classes=3)
    trainer = Trainer(model, softmax_task(),
                      OptimizerConfig(moving_average_decay=0.9), mesh=mesh)
    images = rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32)
    labels = np.zeros(8, np.int32)
    state = trainer.create_state(jax.random.PRNGKey(1), images[:1])
    assert state.ema_params is not None
    i, l = trainer.put_batch(images, labels)
    new_state, _ = trainer.train_step(state, i, l)
    p = new_state.params["conv19"]["conv"]["kernel"]
    e = new_state.ema_params["conv19"]["conv"]["kernel"]
    assert not np.allclose(p, e)  # EMA lags params


def test_trainable_scopes_freeze(rng):
    """slim --trainable_scopes: only listed scopes update (the capability
    behind imagenet_train_resnet.py:54-59)."""
    mesh = make_mesh(MeshConfig(data=8, model=1))
    model = Darknet19Classifier(num_classes=3)
    trainer = Trainer(
        model, softmax_task(),
        OptimizerConfig(trainable_scopes=("conv19",)), mesh=mesh)
    images = rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32)
    labels = np.zeros(8, np.int32)
    state = trainer.create_state(jax.random.PRNGKey(1), images[:1])
    before_frozen = np.asarray(
        state.params["backbone"]["conv1"]["conv"]["kernel"])
    before_head = np.asarray(state.params["conv19"]["conv"]["kernel"])
    i, l = trainer.put_batch(images, labels)
    state, _ = trainer.train_step(state, i, l)
    np.testing.assert_array_equal(
        state.params["backbone"]["conv1"]["conv"]["kernel"], before_frozen)
    assert not np.allclose(state.params["conv19"]["conv"]["kernel"],
                           before_head)


def test_trainable_mask_paths():
    params = {"backbone": {"conv1": {"kernel": np.zeros(2)}},
              "head": {"kernel": np.zeros(2)}}
    mask = trainable_mask(params, ("head",))
    assert mask["head"]["kernel"] is True
    assert mask["backbone"]["conv1"]["kernel"] is False


def test_schedules():
    fixed = make_schedule(LRScheduleConfig(kind="fixed", learning_rate=0.1))
    assert float(fixed(100)) == pytest.approx(0.1)
    exp = make_schedule(LRScheduleConfig(
        kind="exponential", learning_rate=0.1, decay_steps=10,
        decay_factor=0.5))
    assert float(exp(10)) == pytest.approx(0.05)
    poly = make_schedule(LRScheduleConfig(
        kind="polynomial", learning_rate=0.1, end_learning_rate=0.01,
        decay_steps=100, power=1.0))
    assert float(poly(100)) == pytest.approx(0.01)
    warm = make_schedule(LRScheduleConfig(
        kind="fixed", learning_rate=0.1, warmup_steps=10))
    assert float(warm(0)) == pytest.approx(0.0)
    assert float(warm(20)) == pytest.approx(0.1)


def test_schedule_offset_anchors_resumed_stage():
    """offset_steps re-anchors the schedule at the resumed step: a
    staged cosine run (ADVICE r4 — decay_steps = the stage's --iters,
    optax count restored cumulatively) must decay over THIS stage's
    delta instead of training the whole stage at the floor LR."""
    stage_iters = 100
    cos = make_schedule(LRScheduleConfig(
        kind="cosine", learning_rate=0.1, decay_steps=stage_iters,
        end_learning_rate=1e-3, offset_steps=400))
    ref = make_schedule(LRScheduleConfig(
        kind="cosine", learning_rate=0.1, decay_steps=stage_iters,
        end_learning_rate=1e-3))
    # resumed counts 400..500 behave exactly like fresh counts 0..100
    for local in (0, 25, 50, 100):
        assert float(cos(400 + local)) == pytest.approx(float(ref(local)))
    # stage start is the peak LR, not the floor
    assert float(cos(400)) == pytest.approx(0.1)
    # optimizer-swap resume (count re-init to 0 with offset ahead):
    # clamps to the schedule start — a fresh optimizer restarts its decay
    assert float(cos(0)) == pytest.approx(0.1)
    # exponential variant too
    exp = make_schedule(LRScheduleConfig(
        kind="exponential", learning_rate=0.1, decay_steps=10,
        decay_factor=0.5, offset_steps=50))
    assert float(exp(50)) == pytest.approx(0.1)
    assert float(exp(60)) == pytest.approx(0.05)


@pytest.mark.parametrize("name", ["adadelta", "adagrad", "adam", "adamw",
                                  "ftrl", "momentum", "sgd", "rmsprop",
                                  "lamb"])
def test_optimizer_family_builds_and_steps(name):
    cfg = OptimizerConfig(name=name, weight_decay=1e-4)
    params = {"w": jnp.ones((4, 4))}
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    grads = {"w": jnp.full((4, 4), 0.1)}
    updates, _ = tx.update(grads, opt_state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_grad_accumulation_applies_every_k(rng):
    """grad_accum_steps=2: params move only on every 2nd micro-step
    (optax.MultiSteps), giving effective batch = 2 x batch."""
    from tensorflow_yolo2_tpu.models.zoo import LeNet

    mesh = make_mesh(MeshConfig(data=8, model=1))
    trainer = Trainer(
        LeNet(num_classes=4), softmax_task(),
        OptimizerConfig(name="sgd", grad_accum_steps=2,
                        schedule=LRScheduleConfig(learning_rate=0.1)),
        mesh=mesh)
    images = rng.normal(0, 1, (8, 28, 28, 3)).astype(np.float32)
    labels = np.arange(8, dtype=np.int32) % 4
    state = trainer.create_state(jax.random.PRNGKey(0), images[:1])
    images_d, labels_d = trainer.put_batch(images, labels)

    def flat(params):
        return np.concatenate([np.asarray(x).ravel() for x in
                               jax.tree_util.tree_leaves(params)])

    p0 = flat(state.params)
    state, _ = trainer.train_step(state, images_d, labels_d)
    p1 = flat(state.params)
    np.testing.assert_array_equal(p0, p1)  # accumulating, no update yet
    state, _ = trainer.train_step(state, images_d, labels_d)
    p2 = flat(state.params)
    assert np.abs(p2 - p1).max() > 0  # update applied on the 2nd step


def test_trainable_scope_component_boundary():
    """'backbone/conv1' must not freeze-exempt sibling conv10..conv19."""
    params = {"backbone": {"conv1": {"kernel": np.zeros(2)},
                           "conv19": {"kernel": np.zeros(2)}},
              "conv1x": {"kernel": np.zeros(2)}}
    mask = trainable_mask(params, ("backbone/conv1",))
    assert mask["backbone"]["conv1"]["kernel"] is True
    assert mask["backbone"]["conv19"]["kernel"] is False
    assert mask["conv1x"]["kernel"] is False


def test_ema_decays_once_per_accumulated_update(rng):
    """With grad_accum_steps=2 and EMA, the decay applies once per real
    update, not once per micro-step."""
    from tensorflow_yolo2_tpu.models.zoo import LeNet

    mesh = make_mesh(MeshConfig(data=8, model=1))
    trainer = Trainer(
        LeNet(num_classes=4), softmax_task(),
        OptimizerConfig(name="sgd", grad_accum_steps=2,
                        moving_average_decay=0.5,
                        schedule=LRScheduleConfig(learning_rate=0.1)),
        mesh=mesh)
    images = rng.normal(0, 1, (8, 28, 28, 3)).astype(np.float32)
    labels = np.arange(8, dtype=np.int32) % 4
    state = trainer.create_state(jax.random.PRNGKey(0), images[:1])
    di, dl = trainer.put_batch(images, labels)

    k0 = np.asarray(state.params["fc4"]["kernel"])
    state, _ = trainer.train_step(state, di, dl)  # accumulate only
    np.testing.assert_array_equal(
        np.asarray(state.ema_params["fc4"]["kernel"]), k0)
    state, _ = trainer.train_step(state, di, dl)  # update applied
    p2 = np.asarray(state.params["fc4"]["kernel"])
    expect = 0.5 * k0 + 0.5 * p2
    np.testing.assert_allclose(
        np.asarray(state.ema_params["fc4"]["kernel"]), expect,
        rtol=1e-5, atol=1e-7)


def test_warm_start_resets_ema_to_warm_started_params(rng, tmp_root):
    """bootstrap_state with a warm-start tree (e.g. a TF import) must
    restart the EMA from the warm-started params — not leave the fresh
    random copy create_state made (an EMA eval would otherwise blend in
    random init for thousands of steps)."""
    from tensorflow_yolo2_tpu.entries import common
    from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager

    mesh = make_mesh(MeshConfig(data=8, model=1))
    model = Darknet19Classifier(num_classes=3)
    trainer = Trainer(model, softmax_task(),
                      OptimizerConfig(moving_average_decay=0.9), mesh=mesh)
    images = rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32)

    donor = model.init(jax.random.PRNGKey(7), jnp.asarray(images[:1]),
                       train=False)
    donor_params = jax.tree_util.tree_map(lambda x: x + 1.0,
                                          donor["params"])
    mgr = CheckpointManager("darknet19", "voc_2007", save_by_epoch=False)
    state, step = common.bootstrap_state(
        trainer, mgr, jax.random.PRNGKey(0), images[:1],
        warm_start_tree=(donor_params, donor.get("batch_stats", {})))
    assert step == 0
    k = state.params["conv19"]["conv"]["kernel"]
    e = state.ema_params["conv19"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(e), np.asarray(k))
    np.testing.assert_array_equal(
        np.asarray(k),
        np.asarray(donor_params["conv19"]["conv"]["kernel"]))
    # distinct buffers: one donated train step must not alias ema/params
    i, l = trainer.put_batch(images, np.zeros(8, np.int32))
    new_state, _ = trainer.train_step(state, i, l)
    assert np.isfinite(float(np.asarray(new_state.ema_params["conv19"]
                                        ["conv"]["kernel"]).sum()))


def test_optimizer_swap_restore_resets_ema(rng, tmp_root):
    """Resuming a no-EMA snapshot with an EMA-enabled optimizer takes the
    optimizer-swap restore path; the EMA slot must restart from the
    restored params, not keep its fresh-init copy."""
    from tensorflow_yolo2_tpu.entries import common
    from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager

    mesh = make_mesh(MeshConfig(data=8, model=1))
    model = Darknet19Classifier(num_classes=3)
    images = rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32)

    t1 = Trainer(model, softmax_task(), OptimizerConfig(name="sgd"),
                 mesh=mesh)
    s1 = t1.create_state(jax.random.PRNGKey(3), images[:1])
    mgr = CheckpointManager("darknet19", "voc_2007", save_by_epoch=False)
    mgr.save(5, jax.device_get(s1))

    t2 = Trainer(model, softmax_task(),
                 OptimizerConfig(name="adam", moving_average_decay=0.9),
                 mesh=mesh)
    info: dict = {}
    state, step = common.bootstrap_state(
        t2, mgr, jax.random.PRNGKey(0), images[:1], info=info)
    assert step == 5
    k = np.asarray(state.params["conv19"]["conv"]["kernel"])
    e = np.asarray(state.ema_params["conv19"]["conv"]["kernel"])
    np.testing.assert_array_equal(e, k)
    np.testing.assert_array_equal(
        k, np.asarray(s1.params["conv19"]["conv"]["kernel"]))
    # and the eval-side guard still knows no EMA tensors were restored
    assert info.get("ema_restored") == 0
