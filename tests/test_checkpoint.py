"""Checkpoint manager tests: resume / warm-start / exclusion / retention
(the reference's three restore modes, net_utils.py:64-219)."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.train.checkpoint import (
    CheckpointManager,
    merge_pytrees,
    warm_start_params,
)


def make_state(value: float):
    return {
        "params": {"backbone": {"conv1": {"kernel": jnp.full((3, 3), value)}},
                   "head": {"kernel": jnp.full((5,), value * 2)}},
        "step": jnp.asarray(int(value), jnp.int32),
    }


def test_save_restore_roundtrip(tmp_root):
    mgr = CheckpointManager("darknet19", "voc_2007", save_by_epoch=False)
    state = make_state(3.0)
    mgr.save(10, state)
    assert mgr.latest_step() == 10
    restored, step = mgr.restore(jax.tree_util.tree_map(jnp.zeros_like, state))
    assert step == 10
    np.testing.assert_array_equal(
        restored["params"]["backbone"]["conv1"]["kernel"], 3.0)


def test_latest_selection_and_retention(tmp_root):
    mgr = CheckpointManager("darknet19", "voc_2007", keep=2)
    for s in (1, 2, 3, 4):
        mgr.save(s, make_state(float(s)))
    assert mgr.latest_step() == 4
    assert mgr.all_steps() == [3, 4]  # retention pruned 1, 2


def test_epoch_vs_iter_namespaces(tmp_root):
    it = CheckpointManager("darknet19", "ilsvrc_2017_cls", save_by_epoch=False)
    ep = CheckpointManager("darknet19", "ilsvrc_2017_cls", save_by_epoch=True)
    it.save(100, make_state(1.0))
    ep.save(2, make_state(2.0))
    # interval namespaces don't collide (reference epoch/iter prefixes)
    assert it.latest_step() == 100
    assert ep.latest_step() == 2


def test_merge_pytrees_intersection_and_exclusion():
    init = make_state(0.0)
    donor = make_state(7.0)
    merged, n = merge_pytrees(init["params"], donor["params"],
                              exclude_scopes=("head",))
    np.testing.assert_array_equal(
        merged["backbone"]["conv1"]["kernel"], 7.0)
    np.testing.assert_array_equal(merged["head"]["kernel"], 0.0)  # excluded
    assert n == 1


def test_merge_skips_shape_mismatch():
    init = {"w": jnp.zeros((3,)), "v": jnp.zeros((2,))}
    donor = {"w": jnp.ones((4,)), "v": jnp.ones((2,))}
    merged, n = merge_pytrees(init, donor)
    np.testing.assert_array_equal(merged["w"], 0.0)  # shape mismatch → init
    np.testing.assert_array_equal(merged["v"], 1.0)
    assert n == 1


def test_full_train_state_roundtrip_with_masked_optimizer(tmp_root):
    """A real TrainState (multi_transform frozen scopes + EMA + Adam
    slots) must survive the Orbax save/restore used by run_train_loop."""
    import jax as _jax

    from tensorflow_yolo2_tpu.config import OptimizerConfig
    from tensorflow_yolo2_tpu.models.zoo import LeNet
    from tensorflow_yolo2_tpu.parallel.mesh import make_mesh_for_batch
    from tensorflow_yolo2_tpu.train.trainer import Trainer, softmax_task

    tr = Trainer(LeNet(num_classes=3), softmax_task(),
                 OptimizerConfig(name="adam", trainable_scopes=("fc4",),
                                 moving_average_decay=0.99),
                 mesh=make_mesh_for_batch(8))
    x = np.zeros((8, 28, 28, 3), np.float32)
    y = np.zeros(8, np.int32)
    state = tr.create_state(_jax.random.PRNGKey(0), x[:1])
    di, dl = tr.put_batch(x, y)
    state, _ = tr.train_step(state, di, dl)
    mgr = CheckpointManager("lenet", "roundtrip")
    mgr.save(1, _jax.device_get(state))
    fresh = tr.create_state(_jax.random.PRNGKey(1), x[:1])
    restored, step = mgr.restore(fresh)
    assert step == 1
    np.testing.assert_allclose(np.asarray(restored.params["fc4"]["kernel"]),
                               np.asarray(state.params["fc4"]["kernel"]))
    # training continues from the restored state
    restored = tr.shard_state(restored)
    _, m = tr.train_step(restored, di, dl)
    assert np.isfinite(float(np.asarray(m["loss"])))


def test_warm_start_from_other_run(tmp_root):
    """The imagenet→pascal warm-start path (net_utils.py:64-110): new run
    restores the intersection from another run's snapshot."""
    donor_mgr = CheckpointManager("darknet19", "ilsvrc_2017_cls")
    donor_mgr.save(88, make_state(5.0))
    init = make_state(0.0)["params"]
    merged, n = warm_start_params(init, donor_mgr.latest_path(),
                                  exclude_scopes=("head",))
    np.testing.assert_array_equal(merged["backbone"]["conv1"]["kernel"], 5.0)
    np.testing.assert_array_equal(merged["head"]["kernel"], 0.0)
    assert n == 1


def test_merge_pytrees_attribute_keyed_target():
    """A dataclass-structured (attribute-keyed) init tree must intersect
    a dict-keyed restore (what Orbax restore_raw returns): GetAttrKey
    path nodes render as plain names, and non-array leaves (step
    counters) pass through instead of crashing the merge."""
    import flax.struct

    class S(flax.struct.PyTreeNode):
        params: dict
        note: int = flax.struct.field(pytree_node=False, default=0)

    init = S(params={"w": jnp.zeros((2, 2)), "b": jnp.zeros((3,))})
    restored = {"params": {"w": np.ones((2, 2), np.float32),
                           "b": np.full((3,), 2.0, np.float32)}}
    merged, n = merge_pytrees(init, restored)
    assert n == 2
    np.testing.assert_array_equal(np.asarray(merged.params["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(merged.params["b"]), 2.0)


def test_merge_pytrees_scalar_leaves_pass_through():
    init = {"count": 7, "w": jnp.zeros((2,))}
    merged, n = merge_pytrees(init, {"count": 99,
                                     "w": np.ones((2,), np.float32)})
    assert n == 1
    assert merged["count"] == 7  # python scalar keeps its init value
    np.testing.assert_array_equal(np.asarray(merged["w"]), 1.0)
