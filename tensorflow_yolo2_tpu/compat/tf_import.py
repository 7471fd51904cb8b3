"""TF1 checkpoint → Flax pytree weight importer.

Capability behind the reference's restore paths (net_utils.py:64-219) and
the parity requirement: released TF checkpoints (darknet19_pascal.ckpt,
darkent19_imagenet.ckpt, resnet_v1_50.ckpt) load into the Flax models so
box outputs match the TF graph to tolerance.

Name conventions handled:

- **darknet19 / darknet19_detection** (reference darknet.py): the convs
  use *unnamed* ``tf.Variable``s, so TF assigns sequential uniquified
  names inside the enclosing variable scope —
  ``<scope>/Variable`` (conv kernel), ``<scope>/Variable_1`` (bias),
  ``<scope>/Variable_2`` (next conv kernel) ... — and each
  ``tf.layers.batch_normalization`` gets
  ``<scope>/batch_normalization[_k]/{gamma,beta,moving_mean,
  moving_variance}``. The importer maps them positionally onto the Flax
  layer order (which mirrors the reference layer schedule exactly).
  The detection head's convs sit in named sub-scopes
  (``darknet19_detection/conv1..3, output`` — darknet.py:189-200).
- **slim resnet_v1_50**: fully named slim variables
  (``resnet_v1_50/block1/unit_1/bottleneck_v1/conv1/weights``,
  ``.../BatchNorm/gamma`` ...).

Layouts need no transposition: TF conv kernels are HWIO and dense kernels
are (in, out), identical to Flax.

TensorFlow is imported lazily and only used as a checkpoint *reader*; no
TF graph ever runs in the serving path.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from tensorflow_yolo2_tpu.models.darknet import _DARKNET19_SCHEDULE


def load_tf_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Read every tensor in a TF checkpoint (V1 or V2 format) by name."""
    from tensorflow.python.training import py_checkpoint_reader

    reader = py_checkpoint_reader.NewCheckpointReader(path)
    return {name: np.asarray(reader.get_tensor(name))
            for name in reader.get_variable_to_shape_map()}


# ---------------------------------------------------------------------------
# darknet19 (positional mapping)
# ---------------------------------------------------------------------------


def _bn_name(scope: str, index: int) -> str:
    suffix = "batch_normalization" if index == 0 \
        else f"batch_normalization_{index}"
    return f"{scope}/{suffix}"


def _take_conv_bn(var_map: Mapping[str, np.ndarray], scope: str,
                  var_index: int, bn_index: int):
    """One reference conv_bn_layer's variables → ConvBN param/stat dicts."""
    kname = f"{scope}/Variable" if var_index == 0 \
        else f"{scope}/Variable_{var_index}"
    bname = f"{scope}/Variable_{var_index + 1}"
    bn = _bn_name(scope, bn_index)
    params = {
        "conv": {"kernel": var_map[kname], "bias": var_map[bname]},
        "bn": {"scale": var_map[f"{bn}/gamma"],
               "bias": var_map[f"{bn}/beta"]},
    }
    stats = {"bn": {"mean": var_map[f"{bn}/moving_mean"],
                    "var": var_map[f"{bn}/moving_variance"]}}
    return params, stats


def _import_backbone(var_map: Mapping[str, np.ndarray], scope: str):
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    n_convs = sum(1 for item in _DARKNET19_SCHEDULE if item != "M")
    for i in range(n_convs):
        p, s = _take_conv_bn(var_map, scope, var_index=2 * i, bn_index=i)
        params[f"conv{i + 1}"] = p
        stats[f"conv{i + 1}"] = s
    return params, stats, n_convs


def import_darknet19_checkpoint(path: str, detection: bool = True,
                                backbone_scope: str = "darknet19",
                                head_scope: str = "darknet19_detection"):
    """Import a reference darknet19 (classifier or detector) checkpoint.

    Returns (params, batch_stats) for Darknet19Detector (``detection``)
    or Darknet19Classifier.
    """
    var_map = load_tf_checkpoint(path)
    bk_params, bk_stats, n_convs = _import_backbone(var_map, backbone_scope)

    if not detection:
        # the classifier's 19th conv lives in the same flat scope
        p, s = _take_conv_bn(var_map, backbone_scope,
                             var_index=2 * n_convs, bn_index=n_convs)
        params = {"backbone": bk_params, "conv19": p}
        stats = {"backbone": bk_stats, "conv19": s}
        return params, stats

    head_params: dict[str, Any] = {}
    head_stats: dict[str, Any] = {}
    for name in ("conv1", "conv2", "conv3", "output"):
        # each head conv sits in its own named sub-scope (darknet.py:189-200)
        p, s = _take_conv_bn(var_map, f"{head_scope}/{name}",
                             var_index=0, bn_index=0)
        head_params[name] = p
        head_stats[name] = s
    params = {"backbone": bk_params, "detection": head_params}
    stats = {"backbone": bk_stats, "detection": head_stats}
    return params, stats


# ---------------------------------------------------------------------------
# slim resnet_v1_50 (named mapping)
# ---------------------------------------------------------------------------

_R50_UNITS = (3, 4, 6, 3)


def _slim_bn(var_map: Mapping[str, np.ndarray], prefix: str):
    params = {"scale": var_map[f"{prefix}/BatchNorm/gamma"],
              "bias": var_map[f"{prefix}/BatchNorm/beta"]}
    stats = {"mean": var_map[f"{prefix}/BatchNorm/moving_mean"],
             "var": var_map[f"{prefix}/BatchNorm/moving_variance"]}
    return params, stats


def import_resnet50_checkpoint(path: str, scope: str = "resnet_v1_50"):
    """Import a slim resnet_v1_50 checkpoint → (params, batch_stats) for
    ResNet50V1 (feature-extractor part; the logits layer is imported when
    present)."""
    var_map = load_tf_checkpoint(path)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    params["conv1"] = {"kernel": var_map[f"{scope}/conv1/weights"]}
    bnp, bns = _slim_bn(var_map, f"{scope}/conv1")
    params["conv1_bn"] = {"bn": bnp}
    stats["conv1_bn"] = {"bn": bns}

    for bi, units in enumerate(_R50_UNITS, start=1):
        for ui in range(1, units + 1):
            src = f"{scope}/block{bi}/unit_{ui}/bottleneck_v1"
            dst = f"block{bi}_unit{ui}"
            p: dict[str, Any] = {}
            s: dict[str, Any] = {}
            for ci in (1, 2, 3):
                p[f"conv{ci}"] = {
                    "kernel": var_map[f"{src}/conv{ci}/weights"]}
                bnp, bns = _slim_bn(var_map, f"{src}/conv{ci}")
                p[f"bn{ci}"] = {"bn": bnp}
                s[f"bn{ci}"] = {"bn": bns}
            sc_key = f"{src}/shortcut/weights"
            if sc_key in var_map:
                p["shortcut_conv"] = {"kernel": var_map[sc_key]}
                bnp, bns = _slim_bn(var_map, f"{src}/shortcut")
                p["shortcut_bn"] = {"bn": bnp}
                s["shortcut_bn"] = {"bn": bns}
            params[dst] = p
            stats[dst] = s

    logits_key = f"{scope}/logits/weights"
    if logits_key in var_map:
        params["logits"] = {"kernel": var_map[logits_key],
                            "bias": var_map[f"{scope}/logits/biases"]}
    return params, stats


def import_resnet_detector_checkpoint(path: str, scope: str = "resnet_v1_50"):
    """Import the full pascal resnet detector (backbone + yolo_fc heads,
    pascal_train_resnet.py:41-50 / net_utils.py:177-199)."""
    var_map = load_tf_checkpoint(path)
    bk_params, bk_stats = import_resnet50_checkpoint(path, scope)
    params: dict[str, Any] = {"backbone": bk_params}
    stats = {"backbone": bk_stats}
    for fc in ("yolo_fc1", "yolo_fc2"):
        if f"{fc}/weights" in var_map:
            params[fc] = {"kernel": var_map[f"{fc}/weights"],
                          "bias": var_map[f"{fc}/biases"]}
    return params, stats
