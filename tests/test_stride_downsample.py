"""Pool-free stride-2 Darknet19 variant (the 448² train-perf lever):
same parameter tree as the parity model, same grid shapes, trains and
serves end-to-end through the CLI entries."""

import jax
import jax.numpy as jnp
import numpy as np

from tests import synthetic

from tensorflow_yolo2_tpu.models.darknet import (
    Darknet19Detector,
    Darknet19DetectorV2,
)


def test_param_tree_matches_pool_variant():
    """Stride-2 convs replace the pools at identical kernel shapes, so
    pool-trained warm-starts intersect 100%."""
    x = jnp.zeros((1, 64, 64, 3))
    shapes = []
    for ds in ("pool", "stride"):
        m = Darknet19Detector(output_channels=30, downsample=ds)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        shapes.append(jax.tree_util.tree_map(lambda a: a.shape, v))
    assert shapes[0] == shapes[1]


def test_grid_shapes_all_resolutions():
    m = Darknet19Detector(output_channels=30, downsample="stride")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
               train=False)
    for size in (64, 96, 128):
        out = m.apply(v, jnp.zeros((2, size, size, 3)), train=False)
        assert out.shape == (2, size // 32, size // 32, 30)


def test_v2_passthrough_stride_variant():
    m = Darknet19DetectorV2(output_channels=125, downsample="stride")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
               train=False)
    out = m.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 2, 2, 125)
    assert np.isfinite(np.asarray(out)).all()


def test_train_and_detect_stride_cli(tmp_root):
    """--downsample stride end-to-end: snapshots land in darknet19_sd and
    detect serves them (never the implicit v1 TF checkpoint)."""
    from tensorflow_yolo2_tpu.entries import (
        pascal_detect_darknet,
        pascal_train_darknet,
    )

    voc = synthetic.make_voc(str(tmp_root / "data" / "VOCdevkit"),
                             n_images=3)
    rc = pascal_train_darknet.main([
        "--downsample", "stride", "--iters", "2", "--batch-size", "2",
        "--num-workers", "1", "--save-every", "2", "--log-every", "1",
        "--data-path", voc, "--compute-dtype", "float32"])
    assert rc == 0
    assert (tmp_root / "ckpts" / "darknet19_sd" / "voc_2007" /
            "train_iter_2").exists()
    image = f"{voc}/JPEGImages/000000.jpg"
    out = str(tmp_root / "det_sd.png")
    rc = pascal_detect_darknet.main(
        [image, "--downsample", "stride", "--threshold", "0.05", "--nms",
         "--out", out])
    assert rc == 0
    import os
    assert os.path.exists(out)
