"""Test harness: force an 8-device CPU platform before JAX initializes.

This is the "distributed-without-hardware" strategy from SURVEY.md §4 — the
pjit analog of the reference's device-placement-string tests
(model_deploy_test.py): shardings are asserted on a virtual CPU mesh.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Force CPU even when the ambient environment points JAX at a TPU
# (JAX_PLATFORMS=axon — the env var alone does not win against the axon
# plugin, the config update does): unit tests exercise sharding on 8
# virtual devices. TFY2_TEST_TPU=1 keeps the real backend so the
# @pytest.mark.tpu tests can compile Pallas kernels on the chip
# (scripts/run_tpu_tests.sh).
if os.environ.get("TFY2_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture()
def tmp_root(tmp_path, monkeypatch):
    """Point the framework's run-dir layout at a scratch directory."""
    monkeypatch.setenv("TFY2_ROOT", str(tmp_path))
    return tmp_path


@pytest.fixture()
def ilsvrc_dir(tmp_path):
    """Minimal synthetic ILSVRC CLS-LOC tree: 3 synsets × 4 train, 6 val."""
    import os as _os

    from tests import synthetic

    root = tmp_path / "ILSVRC"
    synsets = ["n01000001", "n01000002", "n01000003"]
    train_lines = []
    for si, syn in enumerate(synsets):
        for i in range(4):
            rel = f"{syn}/{syn}_{i}"
            synthetic.make_image(
                str(root / "Data" / "CLS-LOC" / "train" / (rel + ".JPEG")),
                64, 48, seed=si * 10 + i)
            train_lines.append(f"{rel} {len(train_lines) + 1}")
    _os.makedirs(root / "ImageSets" / "CLS-LOC", exist_ok=True)
    (root / "ImageSets" / "CLS-LOC" / "train_cls.txt").write_text(
        "\n".join(train_lines) + "\n")
    _os.makedirs(root / "Annotations" / "CLS-LOC" / "val", exist_ok=True)
    for i in range(6):
        syn = synsets[i % 3]
        name = f"ILSVRC2012_val_{i:08d}"
        synthetic.make_image(
            str(root / "Data" / "CLS-LOC" / "val" / (name + ".JPEG")),
            64, 48, seed=100 + i)
        (root / "Annotations" / "CLS-LOC" / "val" / (name + ".xml")
         ).write_text(
            f"<annotation><object><name>{syn}</name></object></annotation>")
    return str(root)
